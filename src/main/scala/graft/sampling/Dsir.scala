package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** DSIR-style data selection (Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling", NeurIPS): score every
  * raw document by how much more likely its hashed-bigram profile is
  * under a TARGET slice's n-gram distribution than under the raw
  * corpus's own — the standard cheap proxy for "looks like the data I
  * actually want to train on", used to pull target-like documents out
  * of a web-scale crawl without running a model over it.
  *
  * Fixed-point re-expression so a SQL oracle can replay it exactly:
  *   - features: bigrams hashed into `buckets` buckets via the repo's
  *     md5 convention (`conv(substr(md5(gram),1,15),16,10) % B` —
  *     60 bits, sign-safe, bit-identical in DuckDB);
  *   - both distributions are Laplace-smoothed over the OBSERVED
  *     bucket domain (raw-side buckets; a bucket no gram hashes into
  *     contributes to neither side);
  *   - per-bucket log-probabilities use the integer surprisal
  *     convention t20/t23/t25 established: `length(bin(T div c))`
  *     ≈ ⌈log₂(T/c)⌉ bits, so the log-ratio is the integer `sr − st`;
  *   - a document's importance weight is `Σ_b c_b · (sr_b − st_b)` —
  *     positive when its buckets are more probable under the target
  *     than under the raw corpus. Documents with <2 tokens have no
  *     bigrams and weight 0 (kept, not dropped).
  *
  * Scale shape: ONE tokenize+hash pass per corpus → per-(doc,bucket)
  * counts (the sufficient statistic, shared by both distribution fits
  * and the scoring join); the bucket tables are ≤`buckets` rows, so
  * the stats join back to per-doc counts broadcasts, and the weight is
  * one grouped sum. No corpus-axis pair space anywhere — cost is
  * linear in corpus tokens, exactly like the surprisal scorers.
  */
object Dsir {

  /** Per-document importance weight of `df`'s rows with the target
    * distribution fit on the rows where `targetFlag` holds. Output:
    * `(idCol, weight, n_bigrams)`, one row per input document.
    */
  def importanceWeights(df: DataFrame, idCol: String, textCol: String,
      targetFlag: Column, buckets: Int): DataFrame = {
    val pb = perDocBucketCounts(df, idCol, textCol, targetFlag, buckets)
      // both distribution fits AND the scoring join read it
      .localCheckpoint(eager = false)
    val raw = pb.groupBy(col("b")).agg(sum(col("c")).as("cr"))
    val tgt = pb.filter(col("__tgt"))
      .groupBy(col("b")).agg(sum(col("c")).as("ct"))
    val stats = raw.join(tgt, Seq("b"), "left")
      .select(col("b"), col("cr"), coalesce(col("ct"), lit(0L)).as("ct"))
    scoreAgainst(df.select(col(idCol)), pb, statsToSurprisals(stats), idCol)
  }

  /** The per-document sufficient statistic: `(idCol, __tgt, b, c)` —
    * hashed-bigram counts per (doc, bucket), with the target flag
    * carried. ONE tokenize+hash pass; everything else in DSIR (both
    * distribution fits and the scoring join) reads this frame. Counts
    * over disjoint doc sets union row-wise into the counts of their
    * union, which is what [[graft.streaming.DsirStream]] accretes.
    */
  def perDocBucketCounts(df: DataFrame, idCol: String, textCol: String,
      targetFlag: Column, buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val flagged = df.withColumn("__tgt", targetFlag)
    Dedup.positionalShingleRowsIndexed(flagged, idCol, textCol, 2,
        Seq("__tgt"))
      .withColumn("b",
        conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long")
          % lit(buckets.toLong))
      .groupBy(col(idCol), col("__tgt"), col("b"))
      .agg(count(lit(1)).as("c"))
  }

  /** Per-bucket integer surprisals from GLOBAL counts `(b, cr, ct)`:
    * Laplace smoothing over the observed (raw) bucket domain, then the
    * bit-length log convention. The shared tail of the one-shot
    * operator and the streaming store's current-state read.
    */
  def statsToSurprisals(counts: DataFrame): DataFrame = {
    val stats = counts.select(col("b"),
      (col("cr") + lit(1L)).as("cr1"), (col("ct") + lit(1L)).as("ct1"))
    val tot = stats.agg(sum(col("cr1")).as("tr"), sum(col("ct1")).as("tt"))
    stats.crossJoin(broadcast(tot))
      .select(col("b"),
        length(bin(expr("tr div cr1"))).cast("long").as("sr"),
        length(bin(expr("tt div ct1"))).cast("long").as("st"))
  }

  /** Score documents against fitted per-bucket surprisals: weight =
    * `Σ_b c_b · (sr_b − st_b)` over the buckets the fit OBSERVED,
    * gramless documents kept at 0. `ids` is the full document frame
    * (one row per doc to score).
    *
    * The surprisal join is a LEFT join and unmatched gram mass is
    * reported as `n_unseen`: through
    * [[graft.streaming.DsirStream.scoreAgainstStore]] a new document
    * can carry bigrams hashing into buckets the accreted store never
    * observed — an inner join silently dropped that mass from both
    * `weight` and `n_bigrams`, making a fully out-of-register doc
    * indistinguishable from a gramless one. Now `n_bigrams` is the
    * TOTAL gram count, `n_unseen` the out-of-register share (0 in any
    * one-shot fit, whose stats cover every observed bucket by
    * construction), and weight stays a sum over fitted buckets only.
    */
  def scoreAgainst(ids: DataFrame, pb: DataFrame, surps: DataFrame,
      idCol: String): DataFrame = {
    val w = pb.join(surps, Seq("b"), "left")
      .groupBy(col(idCol))
      .agg(
        sum(when(col("sr").isNotNull, col("c") * (col("sr") - col("st")))
          .otherwise(lit(0L))).as("w"),
        sum(col("c")).as("nb"),
        sum(when(col("sr").isNull, col("c")).otherwise(lit(0L))).as("nu"))
    ids.select(col(idCol))
      .join(w, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("w"), lit(0L)).as("weight"),
        coalesce(col("nb"), lit(0L)).as("n_bigrams"),
        coalesce(col("nu"), lit(0L)).as("n_unseen"))
  }
}
