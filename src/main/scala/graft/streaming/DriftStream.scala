package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sketch.Drift

/** Streaming drift monitor with BOUNDED state — the t48 PSI audit as a
  * continuously-maintained store: each micro-batch reduces to its own
  * `(group, log₂-bin, count)` grid (≤ 63 cells per group, whatever the
  * batch size) and appends; the current per-source PSI-vs-rest
  * resolves from ONE grouped sum over the partial store plus the
  * shared [[Drift.psiFromCounts]] arithmetic. Count grids over
  * disjoint row sets sum cell-wise into the grid of their union, so
  * the accreted store is IDENTICAL to a one-shot binning of everything
  * — DriftStreamSpec pins streamed ≡ batch [[Drift.psiByGroup]] across
  * batch splits (the QuantileStream stance, for drift).
  *
  * This is the deployment shape a feed monitor actually needs: ingest
  * lands continuously, and "which source drifted" must be answerable
  * at any moment without rescanning history — the store is
  * |groups|·|bins| rows per batch, never corpus-sized.
  *
  * Replay idempotence: `batch_id=`-partitioned dynamic overwrites (the
  * [[ChangeDataStream]] stance), so a redelivered batch replaces its
  * own partition instead of double-counting.
  */
object DriftStream {

  /** The foreachBatch sink: this batch's (g, b, c) grid. */
  def driftSink(storePath: String, groupCol: String, valueCol: String)(
      batch: DataFrame, batchId: Long): Unit = {
    val out = Drift.binCounts(batch, groupCol, col(valueCol))
      .withColumn("batch_id", lit(batchId))
    // per-write option, not a session-conf toggle: a concurrent overwrite
    // on the same session must not silently turn dynamic (the
    // ChangeDataStream form)
    out.write.option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").partitionBy("batch_id").parquet(storePath)
  }

  /** Current per-group PSI vs rest from the partial store: one grouped
    * sum to merge the grids, then the shared resolution.
    */
  def currentPsi(spark: SparkSession, storePath: String,
      groupCol: String): DataFrame = {
    val merged = spark.read.parquet(storePath)
      .groupBy(col("g"), col("b")).agg(sum(col("c")).as("c"))
    Drift.psiFromCounts(merged).withColumnRenamed("g", groupCol)
  }

  /** Host: fold a file-landing stream into the grid store to
    * completion (AvailableNow).
    */
  def runDriftStream(spark: SparkSession, inputGlob: String,
      schema: org.apache.spark.sql.types.StructType, workDir: String,
      groupCol: String, valueCol: String,
      maxFilesPerTrigger: Int = 1): Unit = {
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(inputGlob)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        driftSink(s"$workDir/partials", groupCol, valueCol)(batch, batchId)
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$workDir/ckpt")
      .start()
    q.awaitTermination()
  }
}
