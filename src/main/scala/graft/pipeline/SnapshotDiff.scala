package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot differencing for incremental corpus refreshes: given two
  * point-in-time snapshots of a keyed corpus, classify every key as
  * `added` / `removed` / `changed` / `unchanged` by comparing a content
  * fingerprint across a full outer join. This is the front door of every
  * incremental pipeline run — downstream stages (dedup index refresh,
  * re-embedding, shard rebuild) consume only the `added ∪ changed` slice
  * instead of re-processing the whole corpus.
  *
  * Scale: one shuffle on the key for the full outer join (AQE-splittable;
  * keys are unique per snapshot so there is no join skew by construction),
  * and the fingerprints are computed scan-side so the join carries two
  * fixed-width columns, not the document bodies. At 100 TB the snapshots
  * would be stores bucketed on the key, making the join co-located and
  * shuffle-free — see `StoreMaintenance` / the k7 bucketed-join gate.
  */
object SnapshotDiff {

  /** Per-key change row: (key, change) where change ∈ added | removed |
    * changed | unchanged. `fingerprint` must be a deterministic pure
    * column over each snapshot's row (e.g. `md5(text)`).
    */
  def diff(old: DataFrame, cur: DataFrame, key: String,
      fingerprint: org.apache.spark.sql.Column): DataFrame = {
    val o = old.select(col(key).as("k"), fingerprint.as("old_fp"))
    val c = cur.select(col(key).as("k"), fingerprint.as("cur_fp"))
    o.join(c, Seq("k"), "full_outer")
      .select(col("k").as(key),
        when(col("old_fp").isNull, lit("added"))
          .when(col("cur_fp").isNull, lit("removed"))
          .when(col("old_fp") === col("cur_fp"), lit("unchanged"))
          .otherwise(lit("changed")).as("change"))
  }
}
