package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash-LSH near-dup index — the dedup counterpart of the
  * trained-IVF serving path (`Similarity.writeIvfIndex`): sign the
  * historical corpus ONCE, persist its banded form partitioned by a
  * band-signature hash bucket, and answer "which corpus documents is
  * this new batch near-duplicate to?" with a partition-pruned read
  * instead of re-signaturing 100 TB of history per incremental batch.
  *
  * Layout (self-describing, the `_centroids` sidecar stance):
  * {{{
  *   path/bands/bucket=<b>/...   (band_idx, band_sig, doc_id) — bucket =
  *                               pmod(xxhash64(band_sig), nBuckets), so a
  *                               probe batch's buckets are computable
  *                               scan-side and the read prunes to them
  *   path/sigs/...               (doc_id, sig) — for estimated-Jaccard
  *                               scoring of surviving candidates
  *   path/_meta/...              one row: (n, k, bands, rows_per_band,
  *                               n_buckets) — probes and appends MUST
  *                               reuse the exact parameters the index
  *                               was signed with; re-deriving different
  *                               ones silently empties the band join
  * }}}
  *
  * Scale posture: the banded store is `docs × bands` fixed-width rows;
  * probe cost is (probe bands) ⋈ (pruned buckets) — an equi-join AQE can
  * re-plan (broadcast for small batches), never all-pairs. The bucket
  * count bounds the driver-side probe-pruning list (≤ nBuckets ints).
  */
object LshIndex {

  private val BucketSeed = 42L

  private def bucketOf(bandSig: org.apache.spark.sql.Column, nBuckets: Int) =
    pmod(xxhash64(lit(BucketSeed), bandSig), lit(nBuckets)).cast("int")

  final case class Meta(n: Int, k: Int, bands: Int, rowsPerBand: Int,
      nBuckets: Int)

  def writeLshIndex(docs: DataFrame, idCol: String, textCol: String,
      path: String, n: Int = 3, k: Int = 16, bands: Int = 4,
      rowsPerBand: Int = 4, nBuckets: Int = 32): Unit = {
    require(bands * rowsPerBand <= k,
      s"banding $bands×$rowsPerBand needs k ≥ ${bands * rowsPerBand}, got $k")
    val spark = docs.sparkSession
    val sigs = Dedup.minhashSignatures(docs, idCol, textCol, n, k)
      .select(col(idCol).as("doc_id"), col("sig"))
      .localCheckpoint(eager = false) // feeds both writes; sign ONCE
    sigs.write.mode("overwrite").parquet(s"$path/sigs")
    // Cluster by bucket BEFORE the partitioned write (guide §6: file
    // sizing): each bucket directory is then written by one task — one
    // file per bucket per write — instead of (upstream tasks × buckets)
    // shards. Probes re-read bands/ EVERY run, so per-file open cost on
    // the read path is what this bounds. Column-form repartition: AQE
    // sizes the write tasks by bytes, so a corpus-scale build still
    // writes wide.
    Dedup.lshBands(sigs, "doc_id", "sig", bands, rowsPerBand)
      .withColumn("bucket", bucketOf(col("band_sig"), nBuckets))
      .repartition(col("bucket"))
      .write.partitionBy("bucket").mode("overwrite")
      .parquet(s"$path/bands")
    import spark.implicits._
    Seq((n, k, bands, rowsPerBand, nBuckets))
      .toDF("n", "k", "bands", "rows_per_band", "n_buckets").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_meta")
  }

  /** The parameters a persisted index was signed with (one row — bounded
    * driver pull).
    */
  def readMeta(spark: SparkSession, path: String): Meta = {
    val r = spark.read.parquet(s"$path/_meta").head()
    Meta(r.getAs[Int]("n"), r.getAs[Int]("k"), r.getAs[Int]("bands"),
      r.getAs[Int]("rows_per_band"), r.getAs[Int]("n_buckets"))
  }

  /** Incremental maintenance: sign ONLY the new batch with the index's
    * own stored parameters and append into the existing bucket
    * directories. Probe-identical to a full rebuild over old ∪ new —
    * signatures are a pure function of (text, n, k) and the parameters
    * are immutable once written.
    */
  def appendToLshIndex(docs: DataFrame, idCol: String, textCol: String,
      path: String): Unit = {
    val m = readMeta(docs.sparkSession, path)
    val sigs = Dedup.minhashSignatures(docs, idCol, textCol, m.n, m.k)
      .select(col(idCol).as("doc_id"), col("sig"))
      .localCheckpoint(eager = false)
    sigs.write.mode("append").parquet(s"$path/sigs")
    Dedup.lshBands(sigs, "doc_id", "sig", m.bands, m.rowsPerBand)
      .withColumn("bucket", bucketOf(col("band_sig"), m.nBuckets))
      .repartition(col("bucket")) // one file per bucket per append (§6)
      .write.partitionBy("bucket").mode("append")
      .parquet(s"$path/bands")
  }

  /** Reconcile the two halves of the index after an interrupted
    * [[appendToLshIndex]] (the s7-chaos stance applied here): the append
    * writes `sigs/` then `bands/`, so a crash between the two leaves
    * documents that are SCORABLE but UNDISCOVERABLE — their band rows
    * are missing, and every probe silently misses them (an inner join
    * can't warn). Repair re-derives the missing band rows FROM the
    * stored signatures (bands are a pure function of sig × meta, so
    * nothing is lost) and, for the reverse inconsistency (band rows
    * whose signature never committed — impossible under this module's
    * write order but cheap to heal), rewrites `bands/` without the
    * orphans via a crash-safe aside-swap. Idempotent; returns
    * (#docs re-banded, #orphan docs dropped). Long-lived ingest hosts
    * should call this on restart, the
    * `StoreMaintenance.recoverInterruptedCompaction` discipline.
    */
  def repairLshIndex(spark: SparkSession, path: String): (Long, Long) = {
    val m = readMeta(spark, path)
    val sigs = spark.read.parquet(s"$path/sigs")
    val bandIds = spark.read.parquet(s"$path/bands")
      .select(col("doc_id")).distinct()
    val missing = sigs.join(bandIds, Seq("doc_id"), "left_anti")
      .localCheckpoint(eager = true) // pin BEFORE appending below changes the input
    val nMissing = missing.count()
    if (nMissing > 0)
      Dedup.lshBands(missing, "doc_id", "sig", m.bands, m.rowsPerBand)
        .withColumn("bucket", bucketOf(col("band_sig"), m.nBuckets))
        .write.partitionBy("bucket").mode("append").parquet(s"$path/bands")
    val sigIds = sigs.select(col("doc_id")).distinct()
    val orphans = bandIds.join(sigIds, Seq("doc_id"), "left_anti")
    val nOrphans = orphans.count()
    if (nOrphans > 0) {
      val bands = spark.read.parquet(s"$path/bands")
      val clean = bands.join(sigIds, Seq("doc_id"), "left_semi")
        .localCheckpoint(eager = true) // fully read before the swap below
      val p = java.nio.file.Paths.get(s"$path/bands")
      val tmp = p.resolveSibling("bands__repair_tmp")
      val aside = p.resolveSibling("bands__repair_old")
      clean.write.partitionBy("bucket")
        .mode("overwrite").parquet(tmp.toString)
      java.nio.file.Files.move(p, aside,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      java.nio.file.Files.move(tmp, p,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      org.apache.hadoop.fs.FileUtil.fullyDelete(aside.toFile)
    }
    (nMissing, nOrphans)
  }

  /** Near-dup candidates of a probe batch against the persisted corpus:
    * (probe_id, corpus_id, est_matches) where est_matches is the exact
    * count of agreeing signature positions (estimated Jaccard × k). The
    * corpus side reads ONLY the bucket partitions the probe's own band
    * signatures hash into — for a batch of b docs that is ≤ b × bands
    * buckets out of nBuckets, a directory-pruned scan (the IVF
    * multi-probe stance). The pruning list is ≤ nBuckets ints collected
    * from the probe batch — bounded, never corpus-sized.
    */
  def probeLshIndex(spark: SparkSession, probes: DataFrame, idCol: String,
      textCol: String, path: String): DataFrame = {
    val m = readMeta(spark, path)
    val pSigs = Dedup.minhashSignatures(probes, idCol, textCol, m.n, m.k)
      .select(col(idCol).as("probe_id"), col("sig").as("psig"))
      .localCheckpoint(eager = false) // bands + scoring reuse one signing
    val pBands = Dedup.lshBands(pSigs, "probe_id", "psig",
        m.bands, m.rowsPerBand)
      .withColumn("bucket", bucketOf(col("band_sig"), m.nBuckets))
      .localCheckpoint(eager = false)
    val probeBuckets = pBands.select("bucket").distinct()
      .collect().map(_.getInt(0)).sorted // ≤ nBuckets — bounded
    val corpus = spark.read.parquet(s"$path/bands")
      .filter(col("bucket").isin(probeBuckets.toIndexedSeq.map(Integer.valueOf): _*))
    val cands = pBands
      .join(corpus, Seq("bucket", "band_idx", "band_sig"))
      .select(col("probe_id"), col("doc_id").as("corpus_id")).distinct()
    val cSigs = spark.read.parquet(s"$path/sigs")
      .select(col("doc_id").as("corpus_id"), col("sig").as("csig"))
    cands
      .join(pSigs, "probe_id")
      .join(cSigs, "corpus_id")
      .select(col("probe_id"), col("corpus_id"),
        size(filter(zip_with(col("psig"), col("csig"), (a, b) => a === b),
          x => x)).as("est_matches"))
  }
}
