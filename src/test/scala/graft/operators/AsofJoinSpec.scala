package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("as-of semantics: latest at-or-before per key; null when none; keys isolated") {
    val left = Seq((1L, 100L, "p1"), (1L, 50L, "p2"), (1L, 10L, "p3"), (2L, 100L, "p4"))
      .toDF("k", "t", "name")
    val right = Seq((1L, 20L, "q20"), (1L, 50L, "q50"), (1L, 80L, "q80"), (2L, 200L, "q200"))
      .toDF("k", "t", "quote")
    val out = AsofJoin.asofJoin(left, right, Seq("k"), "t", "t", Seq("quote"))
      .orderBy("k", "t").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("t"), r.getAs[String]("asof_quote")))
    assert(out.toSeq == Seq(
      (1L, 10L, null),   // before any right row
      (1L, 50L, "q50"),  // exact tie matches (at-or-before)
      (1L, 100L, "q80"), // latest prior
      (2L, 100L, null))) // other key's rows invisible
  }

  test("dedupeRight keeps max tiebreak per (key, time)") {
    val right = Seq((1L, 10L, 7L), (1L, 10L, 9L), (1L, 20L, 1L)).toDF("k", "t", "id")
    val d = AsofJoin.dedupeRight(right, Seq("k"), "t", "id")
      .orderBy("t").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(d.toSeq == Seq((10L, 9L), (20L, 1L)))
  }

  test("one shuffle: the plan has no range/cartesian join") {
    val left = spark.range(100).select(col("id").as("k"), (col("id") * 10).as("t"))
    val right = spark.range(100).select(col("id").as("k"), (col("id") * 7).as("t"),
      col("id").as("v"))
    val out = AsofJoin.asofJoin(left, right, Seq("k"), "t", "t", Seq("v"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"))
    assert(out.count() == 100)
  }
}
