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
}
