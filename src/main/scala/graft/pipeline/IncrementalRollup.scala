package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized-aggregate maintenance under a retractable
  * change feed — the O(Δ) answer to "keep a 100 TB table's rollup
  * current without rescanning it": additive aggregates (count, sum)
  * per group are updated from the change rows ALONE. Each feed row
  * carries its after-image (`group`, `value` — null for deletes) and
  * its before-image (`old_group`, `old_value` — null for inserts), the
  * Debezium/CDC convention, so an update retracts its old contribution
  * and asserts its new one without touching the base table — including
  * GROUP-MOVING updates, which a naive "add the delta to the row's
  * group" scheme corrupts.
  *
  * Additive deltas COMMUTE, so no per-key netting window is needed: a
  * consistent feed (each row's before-image is the state its change
  * replaced) folds under one hash aggregate in any order — the whole
  * maintenance pass is one scan of Δ, one bounded-by-group-cardinality
  * aggregate, and one group-equi merge join with the prior rollup.
  * Min/max are NOT maintainable this way (a retraction can expose an
  * unknown runner-up); that needs a re-aggregate over the affected
  * groups, deliberately out of scope here.
  */
object IncrementalRollup {

  /** Per-group signed delta from one feed slice: `(group, d_cnt,
    * d_sum)`. op ∈ I/U/D; rows with any other op are dropped (the
    * [[graft.operators.Merge.applyChanges]] malformed-feed stance).
    */
  def delta(changes: DataFrame, groupCol: String, valueCol: String,
      opCol: String = "op"): DataFrame = {
    val valid = changes.filter(col(opCol).isin("I", "U", "D"))
    // retractions: U and D remove the before-image's contribution
    val retract = valid.filter(col(opCol).isin("U", "D"))
      .select(col(s"old_$groupCol").as("g"),
        lit(-1L).as("d_cnt"), (-col(s"old_$valueCol")).as("d_sum"))
    // assertions: I and U add the after-image's contribution
    val assertNew = valid.filter(col(opCol).isin("I", "U"))
      .select(col(groupCol).as("g"),
        lit(1L).as("d_cnt"), col(valueCol).cast("long").as("d_sum"))
    retract.unionByName(assertNew)
      .groupBy(col("g"))
      .agg(sum(col("d_cnt")).as("d_cnt"), sum(col("d_sum")).as("d_sum"))
  }

  /** Merge a prior rollup `(g, cnt, sum)` with a feed's [[delta]]:
    * full-outer on the group key (a delta may create a brand-new group
    * or drain an existing one), summed with null-as-zero, groups
    * falling to cnt = 0 dropped. Both sides are one row per group —
    * bounded by group cardinality, never by data volume.
    */
  def maintain(rollup: DataFrame, changes: DataFrame, groupCol: String,
      valueCol: String, opCol: String = "op"): DataFrame = {
    val d = delta(changes, groupCol, valueCol, opCol)
    rollup.select(col(groupCol).as("g"), col("cnt"), col("sum"))
      .join(d, Seq("g"), "full_outer")
      .select(col("g").as(groupCol),
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("d_cnt"), lit(0L)))
          .as("cnt"),
        (coalesce(col("sum"), lit(0L)) + coalesce(col("d_sum"), lit(0L)))
          .as("sum"))
      .filter(col("cnt") > 0)
  }

  /** The one-shot rollup `(group, cnt, sum)` a maintained store must
    * stay equal to.
    */
  def recompute(base: DataFrame, groupCol: String,
      valueCol: String): DataFrame =
    base.groupBy(col(groupCol))
      .agg(count(lit(1)).as("cnt"), sum(col(valueCol).cast("long")).as("sum"))
}
