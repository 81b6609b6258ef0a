package graft.pipeline

import scala.jdk.CollectionConverters._

import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

import graft.SparkSpec

/** Range-clustered compaction must be a pure LAYOUT change: same rows,
  * but each output file owning a disjoint range of the cluster key so
  * parquet footer stats let a range scan skip non-overlapping files'
  * row groups entirely.
  */
class StoreMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  test("compactClustered: disjoint per-file key ranges, rows unchanged") {
    val store = java.nio.file.Files
      .createTempDirectory("graft-cluster").toString + "/store"
    // 6 appends of interleaved keys: every file spans nearly the whole
    // key domain, so before compaction NO file is range-skippable
    for (r <- 0 until 6)
      (0 until 200).map(i => (i * 6 + r, s"v$r-$i")).toDF("id", "v")
        .coalesce(1).write.mode("append").parquet(store)

    val before = spark.read.parquet(store)
      .collect().map(_.toString).sorted

    // tiny target size forces multiple output files at this data volume
    val n = StoreMaintenance.compactClustered(
      spark, store, Seq("id"), targetBytes = 8 * 1024)
    assert(n >= 2, s"need >=2 files to prove disjointness, got $n")

    val after = spark.read.parquet(store)
      .collect().map(_.toString).sorted
    assert(after.sameElements(before), "clustering must not change rows")

    // per-file (min, max) of id from the parquet footers: ranges must be
    // pairwise disjoint — that disjointness IS the file-skipping property
    val conf = spark.sparkContext.hadoopConfiguration
    val ranges = new java.io.File(store).listFiles()
      .filter(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet"))
      .map { f =>
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getPath), conf))
        try {
          val stats = r.getFooter.getBlocks.asScala.flatMap { b =>
            b.getColumns.asScala
              .filter(_.getPath.toDotString == "id").map(_.getStatistics)
          }
          (stats.map(_.genericGetMin.asInstanceOf[Number].longValue).min,
            stats.map(_.genericGetMax.asInstanceOf[Number].longValue).max)
        } finally r.close()
      }.sortBy(_._1)
    assert(ranges.length == n)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 < lo2, s"overlapping file ranges: ${ranges.toSeq}")
      case _ =>
    }
  }

  test("partitioned compact: one file per partition directory, rows unchanged") {
    val store = java.nio.file.Files
      .createTempDirectory("graft-partcompact").toString + "/store"
    // 5 appends × 8 partition values: every append writes into every
    // partition dir, so before compaction each dir holds ~5 part files
    for (r <- 0 until 5)
      (0 until 80).map(i => (i % 8, s"v$r-$i")).toDF("pid", "v")
        .write.partitionBy("pid").mode("append").parquet(store)

    val before = spark.read.parquet(store)
      .collect().map(_.toString).sorted

    StoreMaintenance.compact(spark, store, targetBytes = 1024,
      partitionBy = Seq("pid"))

    val after = spark.read.parquet(store)
      .collect().map(_.toString).sorted
    assert(after.sameElements(before), "compaction must not change rows")

    // the shuffle clusters on the partition key, so each pid=N dir must
    // end up with EXACTLY one part file — a round-robin repartition
    // before the partitioned write would leave up to nFiles per dir
    val dirs = new java.io.File(store).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("pid="))
    assert(dirs.length == 8, s"expected 8 partition dirs, got ${dirs.length}")
    dirs.foreach { d =>
      val parts = d.listFiles().filter(f =>
        f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      assert(parts.length == 1,
        s"${d.getName}: expected 1 compacted file, got ${parts.length}")
    }
  }

  test("interrupted-compaction recovery: store restored from the aside dir") {
    val base = java.nio.file.Files.createTempDirectory("graft-recover")
    val store = s"$base/store"
    (1 to 100).map(i => (i, s"v$i")).toDF("id", "v").write.parquet(store)

    // simulate a kill INSIDE the swap window: old store moved aside,
    // replacement never moved in
    val aside = java.nio.file.Paths.get(s"$base/store__compact_old")
    java.nio.file.Files.move(java.nio.file.Paths.get(store), aside)
    assert(!new java.io.File(store).exists())

    StoreMaintenance.recoverInterruptedCompaction(store)
    assert(spark.read.parquet(store).count() == 100,
      "the aside copy must move back in")
    assert(!java.nio.file.Files.exists(aside))

    // idempotent on a healthy store; stale aside after a COMPLETED swap
    // is garbage-collected, never restored over live data
    (101 to 120).map(i => (i, s"v$i")).toDF("id", "v")
      .write.mode("append").parquet(store)
    java.nio.file.Files.createDirectories(aside)
    StoreMaintenance.recoverInterruptedCompaction(store)
    assert(spark.read.parquet(store).count() == 120)
    assert(!java.nio.file.Files.exists(aside))
  }

  test("committedPartCount ignores _temporary staging debris") {
    val base = java.nio.file.Files.createTempDirectory("graft-tmpdbg")
    val store = s"$base/store"
    // a killed first write leaves ONLY staged files under _temporary
    def stage(): Unit = {
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(s"$store/_temporary/0"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$store/_temporary/0/part-00000.parquet"),
        "staged")
    }
    stage()
    assert(StoreMaintenance.committedPartCount(store) == 0L,
      "staged-only dir must read as empty store")
    // clear the fake debris before a REAL append (Spark's committer owns
    // _temporary during the write), then re-plant it: committed parts
    // must count, staged ones must not
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$store/_temporary/0/part-00000.parquet"))
    (1 to 10).map(i => (i, i)).toDF("a", "b")
      .coalesce(1).write.mode("append").parquet(store)
    stage()
    assert(StoreMaintenance.committedPartCount(store) == 1L)
  }
}
