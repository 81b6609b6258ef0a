package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Streaming deduplication for document ingestion pipelines — the
  * continuous counterpart of [[graft.dedup.Dedup.exactDedup]]: a corpus
  * that arrives as a stream (crawl output landing in a directory) gets
  * deduplicated on content hash as it flows, emitting only first
  * occurrences.
  *
  * Scale posture: `dropDuplicatesWithinWatermark` keeps ONE state row per
  * distinct hash seen within the watermark horizon and evicts state as
  * event time advances — the plain `dropDuplicates` would grow state
  * forever on an unbounded stream. The state key is the 32-char md5, so
  * the shuffle and the state store are both keyed small and uniform
  * (content hashing is its own skew protection).
  */
object StreamingDedup {

  /** First occurrence per content hash within the watermark horizon.
    * `eventTimeCol` must be a timestamp column (the ingestion time of the
    * document); duplicates arriving more than `watermark` apart may
    * re-emit — the documented trade of bounded state for unbounded
    * streams.
    */
  def exactDedupStream(docs: DataFrame, textCol: String,
      eventTimeCol: String, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("content_hash", TextAnalysis.contentHash(col(textCol)))
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Store-backed streaming ingest dedup: each micro-batch keeps only
    * rows whose `keyCol` is NOT already in the parquet store at
    * `storePath`, then appends them — so duplicates are suppressed
    * across the WHOLE corpus lifetime, not a watermark horizon, and the
    * "state" is the store itself (restart-safe with zero stream state;
    * the checkpoint only tracks source progress).
    *
    * Per batch the membership probe is
    * [[graft.dedup.Dedup.bloomNewRows]]: one bloom build over the store
    * keys + an anti-join only for might-contain survivors. Batches also
    * self-dedup on `keyCol` first (first occurrence by `orderCols` min)
    * so a key arriving twice IN one batch inserts once.
    *
    * Exactly-once caveat, same as the reference's audit-probe pattern: a
    * crash between the store append and the checkpoint commit replays
    * the batch, and the store probe then filters the replayed rows out —
    * idempotent, because the probe reads what the failed attempt wrote.
    */
  def storeDedupSink(storePath: String, keyCol: String,
      orderCols: Seq[String], compactEveryBatches: Int = 0)(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    // materialize the deduped batch ONCE: bloomNewRows references its
    // incoming side twice (definite-new filter + candidate filter), so
    // without the barrier the source read and this dedup-window shuffle
    // would run twice per micro-batch
    val inBatch = batch.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .localCheckpoint()
    // restart safety: a kill inside the cadence compaction's swap window
    // leaves the store ABSENT (moved aside) — recover it BEFORE probing,
    // or the replayed batch would silently restart dedup history from
    // empty. And probe for COMMITTED parts, not directory existence: a
    // kill during the first append leaves a dir holding only
    // `_temporary`, which read.parquet can't even infer a schema from.
    graft.pipeline.StoreMaintenance.recoverInterruptedCompaction(storePath)
    val isFirst =
      graft.pipeline.StoreMaintenance.committedPartCount(storePath) == 0L
    val fresh =
      if (isFirst) inBatch
      else {
        val store = spark.read.parquet(storePath).select(col(keyCol))
        // footer count, uncached — the store grows every batch
        val est = graft.queries.Tables.rowCountAt(spark, storePath)
        graft.dedup.Dedup.bloomNewRows(store, inBatch, keyCol,
          math.max(est, 1L))
      }
    fresh.write.mode("append").parquet(storePath)
    // each batch appends its own small part files — on a cadence, fold
    // them back into size-targeted files. Safe here: micro-batches are
    // serial, so nothing reads the store while the swap runs
    if (compactEveryBatches > 0 && (batchId + 1) % compactEveryBatches == 0)
      graft.pipeline.StoreMaintenance.compact(spark, storePath)
  }
}
