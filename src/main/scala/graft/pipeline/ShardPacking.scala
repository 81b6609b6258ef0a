package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget shard assignment for training-data export — the step
  * between a curated corpus and the trainer's data loader: concatenate
  * each stratum's token stream in a deterministic order and cut it into
  * fixed-budget shards.
  *
  * Semantics: within each stratum (e.g. language), documents are laid out
  * in `orderCol` order on a token-offset axis; a document is assigned to
  * the shard its FIRST token lands in (`shard_id = start_offset / budget`,
  * "next-fit by start offset"). This is the sequence-packing convention of
  * LLM training pipelines where the token stream is cut at exact budget
  * boundaries and a document may straddle a cut — the assignment records
  * which shard a document *begins* in, which is what the shuffle-and-pack
  * writer needs. It is deliberately NOT greedy first-fit bin packing:
  * greedy packing is order-dependent iterative state that cannot be
  * expressed as a window (and so cannot scale out or sit under a SQL
  * oracle), while offset packing is one cumulative sum — and wastes zero
  * tokens to fragmentation by construction.
  *
  * Scale: [[assign]]'s window partitions on the stratum column, so its
  * parallelism is bounded by stratum cardinality — fine for balanced
  * profiling dimensions, but a DOMINANT stratum (one language holding
  * half a 100 TB corpus) serializes on one reducer. [[assignBucketed]]
  * is the skew-proof form: a classic two-phase distributed prefix sum
  * over B order-contiguous buckets per stratum that produces BIT-
  * IDENTICAL offsets/shards while running the heavy window as B units
  * per stratum. Use it whenever a stratum can dominate.
  */
object ShardPacking {

  /** Per-document shard assignment: adds `start_off` (tokens before this
    * document within its stratum) and `shard_id` (= start_off / budget).
    */
  def assign(docs: DataFrame, stratum: String, order: String,
      tokens: Column, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy(col(stratum)).orderBy(col(order))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("tok", tokens)
      .withColumn("start_off", sum(col("tok")).over(w) - col("tok"))
      .withColumn("shard_id", (col("start_off") / budget).cast("bigint"))
  }

  /** Skew-proof [[assign]]: identical semantics (bit-identical
    * `start_off`/`shard_id` for every row), computed as a two-phase
    * distributed prefix sum so a dominant stratum no longer serializes
    * one reducer:
    *
    *   1. each stratum's ORDER AXIS is cut into ≤ `buckets` contiguous
    *      ranges of width `(max−min) DIV buckets + 1` (pure integer
    *      arithmetic off one tiny per-stratum min/max aggregate — order-
    *      monotone, so bucket blocks concatenate in order);
    *   2. the cumulative token sum runs per `(stratum, bucket)` — the
    *      heavy window, now `buckets`× more parallel on a skewed
    *      stratum;
    *   3. per-bucket token totals (one small hash aggregate, ≤ `buckets`
    *      rows per stratum) take an exclusive prefix sum over the bucket
    *      index — a window whose partitions are `buckets`-bounded, never
    *      corpus-bounded — and the bucket base offset joins back.
    *
    * `start_off = base + local` equals the single-window form exactly,
    * so the same oracle arithmetic gates both. Requires a NUMERIC
    * `order` column (the range cut is integer arithmetic on its values;
    * [[assign]] itself accepts any orderable type). Order-key clumping
    * only degrades parallelism, never correctness — an empty bucket
    * contributes a zero base.
    */
  def assignBucketed(docs: DataFrame, stratum: String, order: String,
      tokens: Column, budget: Long, buckets: Int): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(docs.schema(order).dataType.isInstanceOf[
        org.apache.spark.sql.types.NumericType],
      s"assignBucketed needs a numeric order column; '$order' is " +
        docs.schema(order).dataType + " — use assign, or map the key to " +
        "a numeric axis first")
    val rng = docs.groupBy(col(stratum))
      .agg(min(col(order)).as("__omin"), max(col(order)).as("__omax"))
      .withColumn("__w", expr(
        s"(cast(__omax as bigint) - cast(__omin as bigint)) div $buckets + 1"))
      .select(col(stratum), col("__omin"), col("__w"))
    val d = docs
      .withColumn("tok", tokens)
      .join(rng, Seq(stratum))
      .withColumn("__bkt", expr(
        s"(cast(`$order` as bigint) - cast(__omin as bigint)) div __w"))
    val wLocal = Window.partitionBy(col(stratum), col("__bkt"))
      .orderBy(col(order))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = d.withColumn("__loc", sum(col("tok")).over(wLocal) - col("tok"))
    val wBase = Window.partitionBy(col(stratum)).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bases = local.groupBy(col(stratum), col("__bkt"))
      .agg(sum(col("tok")).as("__btot"))
      .withColumn("__base", sum(col("__btot")).over(wBase) - col("__btot"))
      .select(col(stratum), col("__bkt"), col("__base"))
    local.join(bases, Seq(stratum, "__bkt"))
      .withColumn("start_off", col("__base") + col("__loc"))
      .withColumn("shard_id", (col("start_off") / budget).cast("bigint"))
      .drop("__bkt", "__omin", "__w", "__loc", "__base")
  }

  /** [[manifest]] computed over the skew-proof [[assignBucketed]] path —
    * identical output (same offset axis), dominant-stratum-safe plan.
    */
  def manifestBucketed(docs: DataFrame, stratum: String, order: String,
      tokens: Column, budget: Long, buckets: Int): DataFrame =
    assignBucketed(docs, stratum, order, tokens, budget, buckets)
      .groupBy(col(stratum), col("shard_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("tok")).as("tok_sum"),
        min(col(order)).as("first_doc"),
        max(col(order)).as("last_doc"))

  /** Materialize the packed layout: one directory per (stratum, shard)
    * and — because the pre-write shuffle keys on exactly the partition
    * columns — ONE file per shard, which is the contract a training
    * data-loader reads ("shard k of stratum s" = one sequential file).
    * The shuffle is the same hash exchange any grouped write pays; no
    * driver-side loop, no per-shard job. Read back with
    * `spark.read.parquet(path)` — `stratum`/`shard_id` return as
    * directory-partition columns.
    *
    * The assignment runs through the skew-proof [[assignBucketed]] when
    * the order column is numeric (the shard write is the LARGEST job a
    * training exporter runs, exactly where a dominant stratum must not
    * serialize one reducer); a non-numeric order key falls back to the
    * single-window [[assign]], whose output is bit-identical. `buckets`
    * bounds the extra base-offset window at ≤ buckets rows per stratum.
    */
  def writeShards(docs: DataFrame, stratum: String, order: String,
      tokens: Column, budget: Long, path: String, buckets: Int = 32): Unit =
    shardLayout(docs, stratum, order, tokens, budget, buckets)
      .repartition(col(stratum), col("shard_id"))
      .write.partitionBy(stratum, "shard_id").mode("overwrite").parquet(path)

  /** The frame [[writeShards]] lays out — split out so its plan shape
    * (bucketed prefix sum on a numeric order axis) is pinnable in specs.
    */
  private[graft] def shardLayout(docs: DataFrame, stratum: String,
      order: String, tokens: Column, budget: Long, buckets: Int): DataFrame =
    if (docs.schema(order).dataType.isInstanceOf[
        org.apache.spark.sql.types.NumericType])
      assignBucketed(docs, stratum, order, tokens, budget, buckets)
    else
      assign(docs, stratum, order, tokens, budget)

  /** Per-shard manifest: for each (stratum, shard_id) the document count,
    * token sum, and the first/last document on the shard — what a shard
    * writer needs to emit its file and what an auditor needs to verify
    * budget adherence (every shard except each stratum's last holds
    * exactly `budget` tokens on the offset axis; the straddle tokens of
    * a boundary-crossing document are accounted to the shard it starts
    * in, so `tok_sum` may exceed `budget` by at most one document).
    */
  def manifest(docs: DataFrame, stratum: String, order: String,
      tokens: Column, budget: Long): DataFrame =
    assign(docs, stratum, order, tokens, budget)
      .groupBy(col(stratum), col("shard_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("tok")).as("tok_sum"),
        min(col(order)).as("first_doc"),
        max(col(order)).as("last_doc"))

  /** Training-sequence emission coordinates — the GPT-style packed
    * stream: per stratum, documents concatenate in `order` into one
    * contiguous token stream chopped into fixed `seqLen` context
    * windows. Per document: its sequence index, its offset inside that
    * sequence, and `crossings` — how many sequence boundaries cut
    * through it (the document-fragmentation census that decides
    * whether a context length is acceptable for a corpus; a doc that
    * fits entirely inside one window has 0). Contiguous packing wastes
    * no tokens (only each stratum's final partial window), so there is
    * no padding column to report.
    *
    * The offset axis is [[assignBucketed]]'s skew-proof two-phase
    * prefix sum with `budget = seqLen` — the t41 machinery's second
    * consumer; a dominant stratum packs as `buckets` window units, not
    * one reducer.
    *
    * Output: `(stratum, order, n_tokens, start_off, seq_idx, seq_off,
    * crossings)`.
    */
  def sequencePack(docs: DataFrame, stratum: String, order: String,
      tokens: Column, seqLen: Long, buckets: Int): DataFrame =
    assignBucketed(docs, stratum, order, tokens, seqLen, buckets)
      .withColumn("seq_idx", expr(s"start_off div CAST($seqLen AS BIGINT)"))
      .withColumn("seq_off", col("start_off") % lit(seqLen))
      .withColumn("crossings", expr(
        s"CASE WHEN tok > 0 THEN (start_off + tok - 1) div $seqLen - seq_idx" +
          " ELSE CAST(0 AS BIGINT) END"))
      .select(col(stratum), col(order), col("tok").as("n_tokens"),
        col("start_off"), col("seq_idx"), col("seq_off"), col("crossings"))
}
