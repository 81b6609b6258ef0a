package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

import graft.sketch.KmvStore

/** Streaming host for the accreted [[graft.sketch.KmvStore]] (a17) —
  * the [[HllStoreStream]] pattern on the k-minima algebra: each
  * micro-batch reduces to its own per-group k smallest distinct
  * hashes and APPENDS through [[KmvStore.append]]; the current
  * estimate resolves from the store's distinct-union merge at read.
  *
  * Like the register store — and unlike the ledgered sinks — this
  * host needs NO replay guard: the k-minima of a union are a pure
  * function of the sides' k-minima and the distinct-union fold is
  * idempotent, so a redelivered micro-batch (restart between append
  * and checkpoint commit) changes no estimate. KmvStoreStreamSpec
  * gates streamed ≡ batch-built ≡ one-shot and replays the whole
  * stream against the same store to pin it.
  *
  * Scale posture: the sink ships ≤ |groups|·k longs per micro-batch
  * into one parquet append, independent of batch row count.
  */
object KmvStoreStream {

  /** The foreachBatch sink: sketch this batch with the store's own
    * stored parameters and append its minima.
    */
  def sink(storePath: String)(batch: DataFrame, batchId: Long): Unit =
    KmvStore.append(batch, storePath)

  /** Host: fold a file-landing stream into an EXISTING store (created
    * by [[KmvStore.write]] — the bootstrap fixes the parameters) to
    * completion (AvailableNow).
    */
  def run(spark: SparkSession, inputGlob: String,
      schema: org.apache.spark.sql.types.StructType, ckptDir: String,
      storePath: String, maxFilesPerTrigger: Int = 1): Unit = {
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(inputGlob)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(storePath)(batch, batchId)
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckptDir)
      .start()
    q.awaitTermination()
  }
}
