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

  test("neither profiler plan rides Expand; a9 is per-column union legs") {
    val a12 = PipelineQueries.a12ColumnProfileSketch.fn(spark, dir)
    a12.collect()
    val p12 = a12.queryExecution.executedPlan.toString
    assert(!p12.contains("Expand"),
      s"the sketched profiler must not expand the scan:\n$p12")
    // r16: a9's exact profiler no longer rides the 8-way Expand either —
    // it is a UNION of per-column single-distinct legs (each leg scans
    // ONE parquet-pruned column; no row multiplication before partial
    // aggregation). Pin both properties so a regression back to the
    // multi-distinct Expand shape is loud.
    val a9 = PipelineQueries.a9ColumnProfile.fn(spark, dir)
    a9.collect()
    val p9 = a9.queryExecution.executedPlan.toString
    assert(!p9.contains("Expand"),
      s"a9's union-leg restructure must not expand the scan:\n$p9")
    assert(p9.contains("Union"),
      s"a9 must be the per-column union-leg shape:\n$p9")
    assert("ReadSchema: struct<l_tax:double>".r
        .findFirstIn(p9).isDefined,
      s"each a9 leg must prune its scan to the one profiled column:\n$p9")
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

  test("a15 plan is pure hash aggregation: no Expand, no " +
      "ObjectHashAggregate") {
    val a15 = PipelineQueries.a15ColumnProfileHll.fn(spark, dir)
    a15.collect()
    val p = a15.queryExecution.executedPlan.toString
    assert(!p.contains("Expand"),
      s"the HLL profiler must not expand the scan:\n$p")
    assert(!p.contains("ObjectHashAggregate"),
      "the HLL profiler exists to stay in codegen'd HashAggregate — " +
        s"a12's typed-UDAF ObjectHashAggregate is the cost it replaces:\n$p")
    assert(p.contains("HashAggregate"),
      s"expected plain HashAggregate legs:\n$p")
  }

  test("a15 estimates: linear-counting regime near-exact, raw regime " +
      "bounded vs a9 exacts") {
    val exact = PipelineQueries.a9ColumnProfile.fn(spark, dir)
      .select(col("column_name"), col("n_distinct").as("nd_exact"))
    val est = PipelineQueries.a15ColumnProfileHll.fn(spark, dir)
      .select(col("column_name"), col("n_distinct_est"))
    val joined = exact.join(est, "column_name").collect()
    assert(joined.length == 8)
    joined.foreach { r =>
      val (name, ex, es) = (r.getString(0), r.getLong(1), r.getLong(2))
      // HLL(m=256) RSE ≈ 1.04/√256 = 6.5%; linear counting below the
      // cutoff is tighter still. 20% ≈ 3σ, plus an absolute-2 floor so
      // single-collision jitter on 10-distinct columns can't flake.
      val tol = math.max(2L, math.ceil(ex * 0.20).toLong)
      assert(math.abs(es - ex) <= tol,
        s"$name: HLL estimate $es vs exact $ex exceeds ±$tol")
    }
  }

  test("a15 statistics agree with a9 on the non-distinct columns") {
    val a9 = PipelineQueries.a9ColumnProfile.fn(spark, dir)
      .select("column_name", "n_nonnull", "min_v", "max_v", "n_rows")
    val a15 = PipelineQueries.a15ColumnProfileHll.fn(spark, dir)
      .select("column_name", "n_nonnull", "min_v", "max_v", "n_rows")
    assert(a9.except(a15).isEmpty && a15.except(a9).isEmpty,
      "count/min/max/rows must be identical between the two profilers")
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
