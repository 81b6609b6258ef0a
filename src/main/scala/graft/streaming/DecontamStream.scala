package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.similarity.Similarity

/** Streaming decontamination-at-ingest — the deployment shape of the
  * s21 exact asymmetric scan ([[Similarity.exactNearPairsAsym]]): the
  * eval/val vectors are FIXED and small by construction, so each
  * arriving corpus micro-batch is one linear broadcast-confirmed scan
  * (the batch never shuffles into a pair space, recall 10⁶ ppm by
  * construction), and the confirmed `(eval_id, corpus_id, dot_q)`
  * pairs append to a contamination ledger. Per-batch work is
  * O(|batch|·|eval|·dims) multiply-accumulates — the cost profile a
  * landing crawl can pay continuously, vs. the corpus-wide rescan a
  * batch detector would re-run per delivery.
  *
  * The ledger is keyed by the CORPUS side: "which newly-ingested
  * documents are too close to something in the benchmark" is the
  * question answered at any moment by [[contaminatedIds]] without
  * touching history — each batch's verdict is independent (the scan is
  * per-corpus-row), so the accreted ledger is IDENTICAL to a one-shot
  * s21 scan over everything ingested (DecontamStreamSpec pins
  * streamed ≡ batch across split choices).
  *
  * Replay idempotence: `batch_id=`-partitioned dynamic overwrites (the
  * [[ChangeDataStream]] stance) — a redelivered batch replaces its own
  * partition and nothing else.
  */
object DecontamStream {

  /** The foreachBatch sink: this batch's confirmed cross pairs against
    * the fixed eval frame, overwrite-partitioned by batch id.
    */
  def decontamSink(storePath: String, evalSide: DataFrame, idCol: String,
      vecCol: String, thresholdPpm: Long)(
      batch: DataFrame, batchId: Long): Unit = {
    val pairs = Similarity.exactNearPairsAsym(evalSide, batch, idCol,
        vecCol, thresholdPpm)
      .withColumn("batch_id", lit(batchId))
    // per-write option, NOT a session conf: `pairs` inherits the
    // (outer) session of the broadcast eval side, so a conf set on the
    // micro-batch clone would never reach this write — the overwrite
    // would silently turn STATIC and each batch would wipe the ledger.
    pairs.write.option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").partitionBy("batch_id").parquet(storePath)
  }

  /** All confirmed pairs accreted so far (deduplicated — a corpus row
    * redelivered in two distinct batches confirms twice).
    */
  def contaminationLedger(spark: SparkSession, storePath: String)
      : DataFrame =
    spark.read.parquet(storePath)
      .select(col("eval_id"), col("corpus_id"), col("dot_q"))
      .distinct()

  /** Distinct corpus ids the ledger has flagged — the prune list a
    * training-set build subtracts.
    */
  def contaminatedIds(spark: SparkSession, storePath: String): DataFrame =
    contaminationLedger(spark, storePath)
      .select(col("corpus_id")).distinct()

  /** Host: scan a file-landing stream against the eval set to
    * completion (AvailableNow).
    */
  def runDecontamStream(spark: SparkSession, inputGlob: String,
      schema: org.apache.spark.sql.types.StructType, workDir: String,
      evalSide: DataFrame, idCol: String, vecCol: String,
      thresholdPpm: Long, maxFilesPerTrigger: Int = 1): Unit = {
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(inputGlob)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        decontamSink(s"$workDir/ledger", evalSide, idCol, vecCol,
          thresholdPpm)(batch, batchId)
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$workDir/ckpt")
      .start()
    q.awaitTermination()
  }
}
