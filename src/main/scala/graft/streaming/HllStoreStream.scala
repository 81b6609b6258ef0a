package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

import graft.sketch.HllStore

/** Streaming host for the accreted [[graft.sketch.HllStore]] (a16) —
  * register grids at ingest, the NbStream/DecontamStream pattern: each
  * micro-batch folds to its own per-group 256-register grid and
  * APPENDS into the persisted store through [[HllStore.append]], so
  * the store the a16 oracle gates is maintained continuously instead
  * of batch-append only.
  *
  * No replay guard, by design: HllStore's merge algebra is cell-wise
  * MAX — idempotent and commutative — so a redelivered micro-batch
  * (restart between the append and the checkpoint commit, an
  * at-least-once source) changes no estimate. This is the one store
  * in the streaming layer whose sink needs NEITHER the `batch_id`
  * dynamic-overwrite guard ([[HllStream]], kept there for store-size
  * hygiene) nor an idempotence ledger: the algebra IS the guard.
  * HllStoreStreamSpec gates streamed ≡ batch-built ≡ one-shot, and
  * replays the whole stream against the same store to pin it.
  *
  * Scale posture: per micro-batch the sink ships ≤ |groups|·256
  * register cells into one parquet append — kilobytes per group,
  * independent of batch row count; the read side stays [[HllStore]]'s
  * single hash-aggregate merge.
  */
object HllStoreStream {

  /** The foreachBatch sink: sketch this batch with the store's own
    * stored parameters and append its grid.
    */
  def sink(storePath: String)(batch: DataFrame, batchId: Long): Unit =
    HllStore.append(batch, storePath)

  /** Host: fold a file-landing stream into an EXISTING store (created
    * by [[HllStore.write]] — the bootstrap fixes the parameters) to
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
