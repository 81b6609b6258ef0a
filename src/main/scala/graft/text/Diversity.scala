package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group lexical-diversity census over a text column — the corpus
  * dashboard a mixture planner (t44/t49) reads before trusting a source:
  * a feed whose token distribution collapsed (boilerplate flood, scraper
  * loop) shows up as a diversity cliff long before exact dedup prices it.
  *
  * Metrics, all exact integers so the DuckDB oracle replays them
  * bit-for-bit:
  *   - `n_tokens` N, `vocab` V, type–token ratio `V·10⁶ div N`;
  *   - `simpson_ppm` — the Simpson concentration Σc(c−1)·10⁶ div N(N−1)
  *     (probability two tokens drawn without replacement coincide;
  *     1e6 = single-token degeneracy, 0 = all-distinct);
  *   - `top_share_ppm` — max count · 10⁶ div N (heaviest-token mass);
  *   - `mean_bits_milli` — mean per-token surprisal in milli-bits under
  *     the corpus's own unigram model, using the t20/t23/t25 dampened-log
  *     convention `length(bin(N div c))` so every engine ranks
  *     identically.
  *
  * Plan shape at 100 TB: ONE shuffle on (group, token) with map-side
  * combine; group totals are a second aggregation of that bounded frame
  * (|groups| rows, broadcast back); the final reduce is per-group over
  * vocabulary-sized partitions. No window, no expand, no corpus-axis
  * join. The c(c−1) and N(N−1) products are decimal(38,0)-widened —
  * at trillion-token groups the raw long products wrap (the t44 lesson).
  */
object Diversity {

  def tokenDiversity(df: DataFrame, groupCol: String, textCol: String)
      : DataFrame = {
    val counts = df
      .select(col(groupCol), explode(TextAnalysis.tokens(col(textCol)))
        .as("__tok"))
      .groupBy(col(groupCol), col("__tok"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(eager = false) // totals + final census share it
    val totals = counts.groupBy(col(groupCol))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("v"))
    counts.join(broadcast(totals), groupCol)
      .withColumn("surp", length(bin(expr("n div c"))).cast("long"))
      .groupBy(col(groupCol))
      .agg(
        first(col("n")).as("n_tokens"),
        first(col("v")).as("vocab"),
        max(col("c")).as("maxc"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * (c - 1)")).as("coin"),
        sum(col("c") * col("surp")).as("bits"))
      .select(
        col(groupCol),
        col("n_tokens"),
        col("vocab"),
        // div = IntegralDivide: exact truncating quotient on decimals,
        // returns BIGINT — never decimal-division scale rounding. The
        // ·10⁶ numerators are decimal-widened too: vocab/maxc reach the
        // group's token count, and 1e13 tokens × 1e6 wraps a long.
        expr("CAST(vocab AS DECIMAL(38,0)) * 1000000 div " +
          "greatest(n_tokens, 1L)").as("ttr_ppm"),
        expr("CAST(coin * 1000000 AS DECIMAL(38,0)) div " +
          "greatest(CAST(n_tokens AS DECIMAL(38,0)) * (n_tokens - 1), 1)")
          .as("simpson_ppm"),
        expr("CAST(maxc AS DECIMAL(38,0)) * 1000000 div " +
          "greatest(n_tokens, 1L)").as("top_share_ppm"),
        expr("bits * 1000 div greatest(n_tokens, 1L)")
          .as("mean_bits_milli"))
  }
}
