package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Population-stability-index drift audit — the standard production
  * monitor for "did this feed's distribution move away from the rest
  * of the corpus": PSI(p, q) = Σ_b (p_b − q_b)·ln(p_b/q_b) over a
  * binned feature, ≥ 0, and 0 iff the two histograms agree exactly.
  * Used here per source against the complement of the corpus, so one
  * drifted ingest feed surfaces even when the global histogram barely
  * moves.
  *
  * Fixed-point re-expression (same conventions as the surprisal
  * family, so a SQL oracle replays it bit-for-bit):
  *   - bins are `length(bin(value + 1))` — log₂ bins, a deterministic
  *     binning that needs no trained edges and never produces an
  *     unbounded bin count (≤ 63 for any long);
  *   - proportions are Laplace-smoothed integer ppm over the OBSERVED
  *     bin domain B: `p = (c+1)·10⁶ div (n_g + |B|)` — both sides
  *     smoothed over the SAME domain, so a bin a source entirely
  *     misses still contributes its q-mass term;
  *   - the log is the signed integer bit-length
  *     `±length(bin(max(p,q) div min(p,q)))`, positive exactly when
  *     p > q, so every term `(p−q)·slog` is ≥ 0 except p = q (term 0).
  *
  * Scale shape: one scan → per-(group, bin) counts (the sufficient
  * statistic); everything after is arithmetic on frames bounded by
  * |groups|·|bins| ≤ 63·|groups| — linear in the per-source OUTPUT,
  * never in corpus rows. The complement's counts come from the global
  * per-bin totals (tc − c), so "source vs rest" costs one aggregation,
  * not |groups| anti-joins.
  */
object Drift {

  /** The sufficient statistic: per-(group, log₂-bin) counts of
    * `value`. Counts over disjoint row sets SUM cell-wise into the
    * counts of their union, so partial grids accrete losslessly — the
    * property [[graft.streaming.DriftStream]] builds its bounded-state
    * store on.
    */
  def binCounts(df: DataFrame, groupCol: String, value: Column)
      : DataFrame =
    df.select(col(groupCol).as("g"),
        length(bin(value.cast("long") + lit(1L))).cast("long").as("b"))
      .groupBy(col("g"), col("b"))
      .agg(count(lit(1)).as("c"))

  /** Per-group PSI of `value`'s log₂-binned distribution against the
    * complement of the corpus. Output: `(groupCol, n_docs, psi)` — psi
    * in ppm·bits, one row per group.
    */
  def psiByGroup(df: DataFrame, groupCol: String, value: Column)
      : DataFrame =
    psiFromCounts(binCounts(df, groupCol, value))
      .withColumnRenamed("g", groupCol)

  /** PSI resolution from a `(g, b, c)` count grid — the shared tail of
    * the one-shot audit and the streaming store's current-state read.
    */
  def psiFromCounts(counts: DataFrame): DataFrame = {
    // shared by the bin totals, the group totals, and the term join
    val cg = counts.select(col("g"), col("b"), col("c").cast("long").as("c"))
      .localCheckpoint(eager = false)
    val tot = cg.groupBy(col("b")).agg(sum(col("c")).as("tc"))
    val ng = cg.groupBy(col("g")).agg(sum(col("c")).as("n_g"))
    val grand = tot.agg(sum(col("tc")).as("n"),
      count(lit(1)).as("nbins"))
    // full group × observed-bin domain — a bin the group never hits
    // still carries complement mass and must contribute a term
    val dom = ng.crossJoin(tot).crossJoin(broadcast(grand))
    val terms = dom.join(cg, Seq("g", "b"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .withColumn("p", expr("(c + 1) * 1000000 div (n_g + nbins)"))
      .withColumn("q",
        expr("((tc - c) + 1) * 1000000 div ((n - n_g) + nbins)"))
      // greatest(·, 1) guards the divisor: smoothed ppm proportions
      // round to 0 once a group (or its complement) exceeds ~1e6 rows
      // while missing a bin — `x div 0` is NULL in non-ANSI Spark and
      // would silently DROP exactly the missing-bin drift terms PSI
      // exists to price. With the guard the zero side contributes its
      // full |log| of the other side (the saturated term), keeping
      // PSI ≥ 0 and = 0 iff the histograms agree at ppm resolution.
      .withColumn("slog", when(col("p") >= col("q"),
          length(bin(expr("p div greatest(q, 1L)"))).cast("long"))
        .otherwise(-length(bin(expr("q div greatest(p, 1L)"))).cast("long")))
      .withColumn("term", (col("p") - col("q")) * col("slog"))
    terms.groupBy(col("g"))
      .agg(max(col("n_g")).as("n_docs"), sum(col("term")).as("psi"))
      .select(col("g"), col("n_docs"), col("psi"))
  }
}
