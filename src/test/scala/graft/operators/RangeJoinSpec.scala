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

  test("overlap join == naive cross filter; multi-bin pairs emit exactly once") {
    val a = Seq((1L, 0L, 1000L), (2L, 500L, 600L), (3L, 5000L, 5100L))
      .toDF("aid", "lo1", "hi1")
    val b = Seq((10L, 900L, 2000L),  // overlaps 1 only
      (11L, 0L, 550L),               // overlaps 1 and 2
      (12L, 9000L, 9100L))           // overlaps nothing
      .toDF("bid", "lo2", "hi2")
    // binWidth 100 makes every overlap span MANY shared bins — the
    // emit-once rule must still yield one row per pair
    val got = RangeJoin.overlapBinned(a, b, "lo1", "hi1", "lo2", "hi2", 100L)
      .select("aid", "bid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.length == got.distinct.length, s"duplicate pair rows: $got")
    val naive = a.crossJoin(b)
      .filter(col("lo1") <= col("hi2") && col("lo2") <= col("hi1"))
      .select("aid", "bid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.toSet == naive && naive == Set((1L, 10L), (1L, 11L), (2L, 11L)))

    val plan = RangeJoin.overlapBinned(a, b, "lo1", "hi1", "lo2", "hi2", 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      "overlap form must be an equi-join on the bin")
  }
}
