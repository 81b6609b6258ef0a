package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("binned range join == naive inequality join; no nested loop in plan") {
    val points = spark.range(0, 1000).select(col("id").as("pid"),
      ((col("id") * 37) % 5000).as("v"))
    val intervals = Seq((0L, 100L, 900L), (1L, 850L, 1200L), (2L, 4000L, 4099L),
      (3L, 6000L, 7000L)) // empty: beyond the value range
      .toDF("iid", "lo", "hi")

    val binned = RangeJoin.binned(points, intervals, "v", "lo", "hi", 250L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.join(intervals,
        col("v") >= col("lo") && col("v") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(binned == naive, s"binned ${binned.size} vs naive ${naive.size}")
    assert(binned.nonEmpty)
    // overlapping intervals both match points in [850, 900]
    assert(binned.exists(_._2 == 0L) && binned.exists(_._2 == 1L))
    assert(!binned.exists(_._2 == 3L))

    val plan = RangeJoin.binned(points, intervals, "v", "lo", "hi", 250L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      "binned form must be an equi-join")
  }
}
