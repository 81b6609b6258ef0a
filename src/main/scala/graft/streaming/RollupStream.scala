package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.pipeline.IncrementalRollup

/** Streaming twin of the j12 incremental rollup
  * ([[graft.pipeline.IncrementalRollup]]): a retractable CDC feed
  * arrives in micro-batches, each batch is reduced to per-group SIGNED
  * delta partials (`d_cnt`, `d_sum` — before-images retract, after-
  * images assert) and appended; the current rollup resolves with one
  * grouped sum over the partial store, never re-reading earlier
  * batches. Deltas commute and are additive, so the resolved rollup is
  * IDENTICAL to a from-scratch recompute of the applied state no matter
  * where the batch boundaries fall — RollupStreamSpec pins streamed ≡
  * batch across splits.
  *
  * Replay idempotence: partials land as `batch_id=`-partitioned DYNAMIC
  * overwrites (the [[ChangeDataStream]] stance) — a redelivered batch
  * id replaces its own partition bit-for-bit.
  *
  * Scale: per-batch work is O(Δ) with one group-bounded aggregate; the
  * store grows one bounded row-set per group per batch and compacts by
  * the same grouped sum that resolves it.
  */
object RollupStream {

  /** The foreachBatch sink: this batch's signed per-group deltas. */
  def rollupSink(storePath: String, groupCol: String, valueCol: String)(
      batch: DataFrame, batchId: Long): Unit = {
    val out = IncrementalRollup.delta(batch, groupCol, valueCol)
      .withColumn("batch_id", lit(batchId))
    // per-write option, not a session-conf toggle: a concurrent overwrite
    // on the same session must not silently turn dynamic (the
    // ChangeDataStream form)
    out.write.option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").partitionBy("batch_id").parquet(storePath)
  }

  /** Resolve the current rollup from the partial store: one grouped
    * sum; groups whose net count drained to zero vanish (the
    * [[IncrementalRollup.maintain]] contract).
    */
  def currentRollup(spark: SparkSession, storePath: String,
      groupCol: String): DataFrame =
    spark.read.parquet(storePath)
      .groupBy(col("g").as(groupCol))
      .agg(sum(col("d_cnt")).as("cnt"), sum(col("d_sum")).as("sum"))
      .filter(col("cnt") > 0)

  /** Host: fold a file-landing CDC feed into the rollup store to
    * completion (AvailableNow). Feed rows carry op/group/value and
    * old_group/old_value (the Debezium before/after convention).
    */
  def runRollupStream(spark: SparkSession, inputGlob: String,
      schema: org.apache.spark.sql.types.StructType, workDir: String,
      groupCol: String, valueCol: String,
      maxFilesPerTrigger: Int = 1): Unit = {
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(inputGlob)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        rollupSink(s"$workDir/partials", groupCol, valueCol)(batch, batchId)
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$workDir/ckpt")
      .start()
    q.awaitTermination()
  }
}
