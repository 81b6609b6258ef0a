package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

/** The s23 contract: the int8 code is a faithful half-away-from-zero
  * requantization of the exact milli-unit longs (checked element-wise
  * against an independent Scala reference, INCLUDING negatives — the
  * abs-form division exists precisely because Spark `div` and DuckDB
  * `//` disagree on negative numerators), the codes are true int8
  * range, and the audit emits one bounded recall row per sampled node.
  */
class Int8RecallSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("int8 codes match the half-away-from-zero reference, in [-127, 127]") {
    val emb = Tables.load(spark, dir, "embeddings")
    val rows = emb.select(Similarity.quantize(col("embedding")).as("qv"))
      .withColumn("cv", expr(
        """transform(qv, x -> CASE WHEN x >= 0
          |  THEN (x * 127 + 500) DIV 1000
          |  ELSE -((-x * 127 + 500) DIV 1000) END)""".stripMargin))
      .collect()
    assert(rows.nonEmpty)
    def ref(x: Long): Long =
      if (x >= 0) (x * 127 + 500) / 1000 else -((-x * 127 + 500) / 1000)
    var sawNegative = false
    rows.foreach { r =>
      val qv = r.getSeq[Long](0)
      val cv = r.getSeq[Long](1)
      qv.zip(cv).foreach { case (x, c) =>
        if (x < 0) sawNegative = true
        assert(c == ref(x), s"code mismatch for milli value $x: $c")
        assert(c >= -127 && c <= 127, s"code $c out of int8 range")
      }
    }
    assert(sawNegative,
      "the corpus must exercise the negative branch or the abs-form " +
        "division rationale is untested")
  }

  test("audit emits one bounded recall row per sampled node") {
    val emb = Tables.load(spark, dir, "embeddings")
    val out = Similarity.int8RecallAudit(emb, "vec_id", "embedding",
      k = 5, sampleMod = 20L).collect()
    val sampled = emb.filter(col("vec_id") % 20 === 0).count()
    assert(out.length == sampled,
      s"expected $sampled recall rows, got ${out.length}")
    out.foreach { r =>
      assert(r.getLong(1) == 5L, s"n_exact must be k: $r")
      val ppm = r.getLong(3)
      assert(ppm >= 0L && ppm <= 1000000L, s"recall out of range: $r")
    }
  }
}
