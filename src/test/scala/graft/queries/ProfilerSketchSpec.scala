package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The a12 contract: the sketched profiler computes its 8-column
  * statistics in ONE aggregate with NO Expand (a9's exact
  * multi-distinct pays an 8-way expand — 8× the scan rows into partial
  * aggregation — which is exactly what the sketch variant exists to
  * avoid at 100 TB), the estimate is EXACT below the sketch size k,
  * and bounded against a9's exact distinct counts above it.
  */
class ProfilerSketchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("a12 plan has no Expand; a9's exact multi-distinct does") {
    val a12 = PipelineQueries.a12ColumnProfileSketch.fn(spark, dir)
    a12.collect()
    val p12 = a12.queryExecution.executedPlan.toString
    assert(!p12.contains("Expand"),
      s"the sketched profiler must not expand the scan:\n$p12")
    val a9 = PipelineQueries.a9ColumnProfile.fn(spark, dir)
    a9.collect()
    val p9 = a9.queryExecution.executedPlan.toString
    assert(p9.contains("Expand"),
      "the contrast baseline: exact multi-distinct rides Expand — if " +
        "Spark stops expanding, a9's scaladoc price note is stale")
  }

  test("a12 estimates: exact below k, bounded error vs a9 exacts above k") {
    val k = 256
    val exact = PipelineQueries.a9ColumnProfile.fn(spark, dir)
      .select(col("column_name"), col("n_distinct").as("nd_exact"))
    val est = PipelineQueries.a12ColumnProfileSketch.fn(spark, dir)
      .select(col("column_name"), col("n_distinct_est"))
    val joined = exact.join(est, "column_name").collect()
    assert(joined.length == 8)
    joined.foreach { r =>
      val (name, ex, es) =
        (r.getString(0), r.getLong(1), r.getLong(2))
      if (ex < k)
        assert(es == ex,
          s"$name: below k the sketch IS the distinct set ($es != $ex)")
      else {
        val relErrPct = math.abs(es - ex).toDouble * 100 / ex
        assert(relErrPct <= 20.0,
          s"$name: KMV(k=$k) estimate $es vs exact $ex = " +
            f"$relErrPct%.1f%% error (expected ~6%% std err)")
      }
    }
  }

  test("a12 statistics agree with a9 on the non-distinct columns") {
    val a9 = PipelineQueries.a9ColumnProfile.fn(spark, dir)
      .select("column_name", "n_nonnull", "min_v", "max_v", "n_rows")
    val a12 = PipelineQueries.a12ColumnProfileSketch.fn(spark, dir)
      .select("column_name", "n_nonnull", "min_v", "max_v", "n_rows")
    assert(a9.except(a12).isEmpty && a12.except(a9).isEmpty,
      "count/min/max/rows must be identical between the two profilers")
  }
}
