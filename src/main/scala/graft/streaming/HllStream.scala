package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sketch.Sketch

/** Streaming per-group cardinality via HyperLogLog registers — the t37
  * sketch as a continuously-maintained store: each micro-batch reduces
  * to its own `(group, bucket, r)` register frame (≤ 256 cells per
  * group, whatever the batch size) and appends; the current estimate
  * resolves from ONE grouped MAX over the partial store plus the shared
  * integer estimator arithmetic.
  *
  * Register merge is cell-wise MAX — idempotent AND commutative, the
  * strongest accretion algebra in the streaming layer: where the KMV
  * store (t26) needs the k-minima fold and the quantile grids
  * ([[QuantileStream]]) need exactly-once cell sums, a re-delivered or
  * even PARTIALLY re-delivered batch cannot move a max. The
  * `batch_id=` dynamic-overwrite replay guard is kept for store-size
  * hygiene only (a redelivery replaces rather than duplicates rows) —
  * correctness never depended on it. HllStreamSpec pins streamed ≡
  * one-shot [[Sketch.hllEstimateByGroup]] across batch splits and
  * under replay.
  */
object HllStream {

  /** The foreachBatch sink: this batch's register frame. */
  def hllSink(storePath: String, groupCol: String, valueCol: String)(
      batch: DataFrame, batchId: Long): Unit = {
    val out = Sketch.hllRegistersByGroup(batch, Seq(groupCol), valueCol)
      .withColumn("batch_id", lit(batchId))
    // per-write option, not a session-conf toggle: a concurrent overwrite
    // on the same session must not silently turn dynamic (the
    // ChangeDataStream form)
    out.write.option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").partitionBy("batch_id").parquet(storePath)
  }

  /** Current per-group distinct estimates from the partial store: one
    * grouped max to merge the registers, then the shared estimator.
    */
  def currentEstimates(spark: SparkSession, storePath: String,
      groupCol: String): DataFrame = {
    val merged = spark.read.parquet(storePath)
      .groupBy(col(groupCol), col("bucket")).agg(max(col("r")).as("r"))
    Sketch.hllEstimateFromRegisters(merged, Seq(groupCol))
  }

  /** Host: fold a file-landing stream into the register store to
    * completion (AvailableNow).
    */
  def runHllStream(spark: SparkSession, inputGlob: String,
      schema: org.apache.spark.sql.types.StructType, workDir: String,
      groupCol: String, valueCol: String,
      maxFilesPerTrigger: Int = 1): Unit = {
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(inputGlob)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        hllSink(s"$workDir/partials", groupCol, valueCol)(batch, batchId)
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$workDir/ckpt")
      .start()
    q.awaitTermination()
  }
}
