package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.pipeline.StoreMaintenance

class ZorderSpec extends SparkSpec {
  import spark.implicits._

  /** Reference bit-interleave, independent of the Column implementation. */
  private def mortonRef(a: Long, b: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }

  test("zorder_key matches the reference interleave; SQL mirror agrees") {
    val pts = for (a <- 0L until 32L; b <- 0L until 32L) yield (a, b)
    val df = pts.toDF("a", "b")
    val got = df.select(col("a"), col("b"),
        graft.functions.zorder_key(col("a"), col("b"), 5).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    pts.foreach { case (a, b) =>
      assert(got((a, b)) == mortonRef(a, b, 5), s"mismatch at ($a,$b)")
    }
    // the full 5-bit grid is a bijection onto [0, 1024)
    assert(got.values.toSet == (0L until 1024L).toSet)
    // the oracle-side SQL emits the same arithmetic (Spark SQL and DuckDB
    // share >>, &, <<, | semantics on non-negative BIGINTs)
    df.createOrReplaceTempView("zs_pts")
    val sqlGot = spark.sql(
      s"SELECT a, b, ${graft.functions.zorder_key_sql("a", "b", 5)} AS z FROM zs_pts")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(sqlGot == got, "zorder_key_sql drifted from zorder_key")
  }

  test("zorder_key_n: 2-D case is bit-identical to zorder_key; SQL mirror agrees") {
    val df = (for (a <- 0L until 32L; b <- 0L until 32L) yield (a, b))
      .toDF("a", "b")
    val drift = df.select(
        graft.functions.zorder_key(col("a"), col("b"), 5).as("z2"),
        graft.functions.zorder_key_n(Seq(col("a"), col("b")), 5).as("zn"))
      .filter(col("z2") =!= col("zn")).count()
    assert(drift == 0L)
    df.createOrReplaceTempView("zn_pts")
    val sqlDrift = spark.sql(
      s"""SELECT ${graft.functions.zorder_key_n_sql(Seq("a", "b"), 5)} AS zs,
         |${graft.functions.zorder_key_sql("a", "b", 5)} AS z2 FROM zn_pts
         |""".stripMargin).filter(col("zs") =!= col("z2")).count()
    assert(sqlDrift == 0L)
  }

  test("compactZOrderedN: a 3-D layout bounds ALL THREE dims per file") {
    val dir = java.nio.file.Files.createTempDirectory("graft-z3")
    try {
      val store = s"$dir/store"
      val rows = for (a <- 0L until 16L; b <- 0L until 16L; c <- 0L until 16L)
        yield (a, b, c)
      rows.toDF("a", "b", "c").repartition(8).write.parquet(store)
      // files must be smaller than one top-level octant (512 cells) or
      // the curve necessarily spans a full dimension within a file
      val n = StoreMaintenance.compactZOrderedN(spark, store,
        Seq("a", "b", "c"), bits = 4, targetBytes = 512)
      assert(n > 8, s"need files smaller than an octant, got $n")
      val back = spark.read.parquet(store)
      assert(back.count() == rows.size)
      val boxes = back
        .select(input_file_name().as("f"), col("a"), col("b"), col("c"))
        .groupBy("f")
        .agg((max("a") - min("a")).as("sa"), (max("b") - min("b")).as("sb"),
          (max("c") - min("c")).as("sc"))
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      // every dimension's MEDIAN span must be bounded away from full:
      // a linear sort would leave two of the three at span 15 everywhere
      def medianSpan(sel: ((Long, Long, Long)) => Long) = {
        val s = boxes.map(sel).sorted; s(s.length / 2)
      }
      assert(medianSpan(_._1) < 15 && medianSpan(_._2) < 15 &&
        medianSpan(_._3) < 15,
        s"3-D spans: ${medianSpan(_._1)}/${medianSpan(_._2)}/${medianSpan(_._3)}")
    } finally {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(java.nio.file.Files.walk(dir))(
        _.iterator().asScala.toSeq).reverse.foreach(java.nio.file.Files.delete)
    }
  }

  test("compactZOrdered: rows preserved; files bound BOTH dims, not just one") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toFile
    try {
    val store = s"${dir.getAbsolutePath}/store"
    // uniform 64×64 grid — worst case for linear clustering on `a`
    val rows = for (a <- 0L until 64L; b <- 0L until 64L)
      yield (a, b, s"payload-$a-$b")
    rows.toDF("a", "b", "payload").repartition(8)
      .write.parquet(store)
    // small target so the rewrite yields multiple files
    val n = StoreMaintenance.compactZOrdered(spark, store, "a", "b",
      bits = 6, targetBytes = 16 * 1024)
    assert(n > 1, s"expected a multi-file layout, got $n")
    val back = spark.read.parquet(store)
    assert(back.count() == rows.size, "compaction must preserve rows")
    assert(back.select("a", "b").distinct().count() == rows.size)
    // per-FILE bounding boxes: z-order keeps both spans near sqrt(cells),
    // linear clustering by `a` alone would leave span_b = 63 everywhere
    val boxes = back
      .select(input_file_name().as("f"), col("a"), col("b"))
      .groupBy("f")
      .agg((max("a") - min("a")).as("sa"), (max("b") - min("b")).as("sb"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(boxes.length.toLong == n)
    val medianSb = boxes.map(_._2).sorted.apply(boxes.length / 2)
    assert(medianSb < 63,
      s"median span_b $medianSb — z-order should bound the SECOND dimension")
    } finally {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(java.nio.file.Files.walk(dir.toPath))(
        _.iterator().asScala.toSeq).reverse
        .foreach(java.nio.file.Files.delete)
    }
  }

  /** Parquet footer (min, max) of two long columns for every part file —
    * the stats a planner prunes with.
    */
  private def footerBoxes(store: String, colA: String, colB: String)
      : Seq[((Long, Long), (Long, Long))] = {
    import scala.jdk.CollectionConverters._
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = spark.sparkContext.hadoopConfiguration
    new java.io.File(store).listFiles()
      .filter(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet")).toSeq
      .map { f =>
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getPath), conf))
        try {
          def mm(c: String): (Long, Long) = {
            val st = r.getFooter.getBlocks.asScala.flatMap(
              _.getColumns.asScala.filter(_.getPath.toDotString == c)
                .map(_.getStatistics))
            (st.map(_.genericGetMin.asInstanceOf[Number].longValue).min,
              st.map(_.genericGetMax.asInstanceOf[Number].longValue).max)
          }
          (mm(colA), mm(colB))
        } finally r.close()
      }
  }

  test("z-ordered store: a 2-D box query needs FEWER files than unclustered") {
    // the k6 gate proves the read path returns identical ANSWERS; this
    // proves the layout actually PRUNES — the files whose footer boxes
    // intersect the query box are exactly what a stats-based scan reads
    val dir = java.nio.file.Files.createTempDirectory("graft-zprune")
    try {
      val rows = for (a <- 0L until 128L; b <- 0L until 128L)
        yield (a, b, a * 1000 + b)
      val flat = s"$dir/flat"; val zed = s"$dir/zed"
      // identical data, two layouts: shuffled round-robin vs z-ordered
      rows.toDF("a", "b", "payload").repartition(16).write.parquet(flat)
      rows.toDF("a", "b", "payload").repartition(16).write.parquet(zed)
      val n = StoreMaintenance.compactZOrdered(spark, zed, "a", "b",
        bits = 6, targetBytes = 24 * 1024)
      assert(n > 4, s"need a multi-file z-layout to prove pruning, got $n")

      val (lo, hi) = (32L, 63L) // a quarter-domain box on both dims
      def needed(store: String): Int =
        footerBoxes(store, "a", "b").count { case ((la, ha), (lb, hb)) =>
          la <= hi && ha >= lo && lb <= hi && hb >= lo
        }
      val (nFlat, nZed) = (needed(flat), needed(zed))
      val totFlat = footerBoxes(flat, "a", "b").size
      assert(nFlat == totFlat,
        s"unclustered layout should prune nothing ($nFlat/$totFlat)")
      assert(nZed < nFlat,
        s"z-ordered layout must need fewer files: $nZed vs $nFlat")
      // and the pruned read answers identically to the full scan
      val q = (d: org.apache.spark.sql.DataFrame) => d
        .filter(col("a").between(lo, hi) && col("b").between(lo, hi))
        .agg(count(lit(1)), sum("payload")).collect().head.toString
      assert(q(spark.read.parquet(zed)) == q(rows.toDF("a", "b", "payload")))
    } finally {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(java.nio.file.Files.walk(dir))(
        _.iterator().asScala.toSeq).reverse
        .foreach(java.nio.file.Files.delete)
    }
  }
}
