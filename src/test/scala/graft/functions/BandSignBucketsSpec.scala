package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.similarity.Similarity

/** Pins [[BandSignBuckets]] (the r16 fused banding expression) to the
  * exact semantics of the per-bit column pile it replaced:
  * `sum_j when(long_array_dot(qv, typedLit(row(t·bits+j))) > 0, 1<<j)
  * .otherwise(0)` — same buckets on real embeddings, short vectors,
  * null elements, and a null vector (which the old `otherwise(0)`
  * mapped to bucket 0 in every band, never to null).
  */
class BandSignBucketsSpec extends SparkSpec {

  private def oldForm(qv: org.apache.spark.sql.Column,
      rows: Array[Array[Long]], bands: Int, bits: Int) =
    array((0 until bands).map { t =>
      (0 until bits).map { j =>
        when(graft.functions.long_array_dot(qv,
            typedLit(rows(t * bits + j).toSeq)) > lit(0L),
          lit(1 << j)).otherwise(lit(0))
      }.reduce(_ + _)
    }: _*)

  test("fused buckets equal the per-bit expression pile on embeddings") {
    val bands = 24
    val bits = 9
    val rows = Similarity.rademacherMatrix(bands * bits, 64)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val qv = graft.functions.long_array_quantize(col("embedding"))
    val cmp = emb.select(
      graft.functions.band_sign_buckets(qv, rows, bands, bits).as("nu"),
      oldForm(qv, rows, bands, bits).as("old"))
    assert(cmp.filter(col("nu") =!= col("old")).isEmpty)
    // and not vacuous: buckets vary across the corpus
    assert(cmp.select(explode(col("nu"))).distinct().count() > 1)
  }

  test("short, null-element and null vectors mirror the old semantics") {
    val bands = 4
    val bits = 5
    val rows = Similarity.rademacherMatrix(bands * bits, 8)
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("qv",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType, containsNull = true))))
    val data = Seq[Seq[java.lang.Long]](
      Seq(1L, -2L, 3L, -4L, 5L, -6L, 7L, -8L).map(Long.box),
      Seq(5L, 5L).map(Long.box), // shorter than dims
      Seq(Long.box(1L), null, Long.box(-3L)), // null element counts 0
      Seq.empty, // empty array: every dot 0 -> bucket 0
      null // null vector: old otherwise(0) -> bucket 0 per band
    ).map(s => org.apache.spark.sql.Row(
      if (s == null) null else s.asJava))
    val df = spark.createDataFrame(data.asJava, schema)
    val cmp = df.select(
      graft.functions.band_sign_buckets(col("qv"), rows, bands, bits)
        .as("nu"),
      oldForm(col("qv"), rows, bands, bits).as("old"))
    val got = cmp.collect()
    got.foreach { r =>
      assert(!r.isNullAt(0), "fused output must never be null")
      assert(r.getSeq[Int](0) == r.getSeq[Int](1),
        s"mismatch: ${r.getSeq[Int](0)} vs ${r.getSeq[Int](1)}")
    }
  }
}
