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
}
