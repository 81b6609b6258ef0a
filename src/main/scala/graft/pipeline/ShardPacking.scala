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
  * Scale: the window partitions on the stratum column, so parallelism is
  * bounded by stratum cardinality — the right trade for bounded profiling
  * dimensions (language, source). For an unbounded or skewed stratum
  * domain, pre-bucket the stratum (`hash(stratum) % B`) and pack within
  * (bucket, stratum); the per-shard accounting below is unchanged.
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

  /** Materialize the packed layout: one directory per (stratum, shard)
    * and — because the pre-write shuffle keys on exactly the partition
    * columns — ONE file per shard, which is the contract a training
    * data-loader reads ("shard k of stratum s" = one sequential file).
    * The shuffle is the same hash exchange any grouped write pays; no
    * driver-side loop, no per-shard job. Read back with
    * `spark.read.parquet(path)` — `stratum`/`shard_id` return as
    * directory-partition columns.
    */
  def writeShards(docs: DataFrame, stratum: String, order: String,
      tokens: Column, budget: Long, path: String): Unit =
    assign(docs, stratum, order, tokens, budget)
      .repartition(col(stratum), col("shard_id"))
      .write.partitionBy(stratum, "shard_id").mode("overwrite").parquet(path)

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
}
