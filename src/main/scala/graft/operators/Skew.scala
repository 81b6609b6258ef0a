package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators for hot grouping/join keys at scale.
  *
  * AQE's skew-join handling covers sort-merge joins; these helpers cover
  * the remaining cases — hot AGGREGATION keys and broadcast-averse skewed
  * joins — by salting: spreading each hot key over `factor` synthetic
  * sub-keys so no single reducer owns a hot key's entire volume.
  *
  * Salting is only applied to operations where the re-combine is exact
  * (commutative-associative aggregates; equi-joins with a replicated
  * small side), so results are bit-identical to the unsalted plan.
  */
object Skew {

  /** Deterministic-enough salt in [0, factor): spreads rows regardless of
    * key value. Sums/counts are order-independent, so any spread yields
    * the same result.
    */
  private def salt(factor: Int): Column =
    pmod(monotonically_increasing_id(), lit(factor.toLong))

  /** Two-phase salted sum/count aggregation: partial aggregate on
    * (keys, salt) — splitting each hot key across `factor` reducers —
    * then final aggregate on keys. `aggs` maps output column name →
    * input column; each is summed in both phases (counts: pass a
    * `lit(1)` column).
    */
  def saltedSum(df: DataFrame, keys: Seq[String],
      aggs: Seq[(String, Column)], factor: Int = 16): DataFrame = {
    val partialAggs = aggs.map { case (n, c) => sum(c).as(s"__p_$n") }
    val partial = df
      .withColumn("__salt", salt(factor))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    val finalAggs = aggs.map { case (n, _) => sum(col(s"__p_$n")).as(n) }
    partial.groupBy(keys.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Salted equi-join: the big (skewed) side gets a salt column; the
    * small side is replicated `factor` times (explode over the salt
    * range) so every (key, salt) pair finds its match. Output rows are
    * exactly the plain join's rows.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      factor: Int = 16, joinType: String = "inner"): DataFrame = {
    // right/full outer would emit `factor` null-padded copies of every
    // unmatched small-side row (one per surviving replica) — the exact-
    // rows guarantee only holds where unmatched REPLICATED rows drop out
    require(Set("inner", "cross", "left", "leftouter", "leftsemi",
        "leftanti").contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin: '$joinType' preserves unmatched replicated rows — " +
        "the small side would duplicate; use the plain join for " +
        "right/full outer")
    val saltedBig = big.withColumn("__salt", salt(factor))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(factor.toLong - 1))))
    saltedBig.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
