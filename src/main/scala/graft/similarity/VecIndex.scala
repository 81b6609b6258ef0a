package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted banded vector index — the embedding twin of the MinHash
  * store (`graft.dedup.LshIndex`): quantize and band-bucket the
  * historical embedding corpus ONCE, persist it partitioned by a
  * (band, bucket) hash directory, and answer "which corpus embeddings
  * is this new batch semantically near?" with a directory-pruned read
  * plus an exact integer-cosine confirm — incremental SEMANTIC dedup
  * against 100 TB of history without re-scoring it per batch.
  *
  * Layout (self-describing, the `_meta` sidecar stance):
  * {{{
  *   path/vecs/...             (vec_id, qv) — quantized vectors for the
  *                             exact cosine confirm of candidates
  *   path/bands/dir=<d>/...    (vec_id, band, bucket) — dir =
  *                             pmod(xxhash64(band, bucket), nBuckets):
  *                             2^bits·bands cells hash into a bounded
  *                             directory count, so the layout survives
  *                             bits = 24 (16M cells/band) unchanged
  *   path/_meta/...            one row: (bands, bits_per_band,
  *                             n_buckets) — probes and appends MUST
  *                             reuse the parameters the index was
  *                             banded with
  * }}}
  *
  * Scale posture: the band store is `vectors × bands` fixed-width rows;
  * a probe reads ≤ nBuckets pruned directories (the pruning list is
  * collected from the probe batch — bounded, never corpus-sized), joins
  * band cells within Hamming ≤ 1 (the multi-probe flips run on the
  * PROBE side), and confirms candidates exactly. Recall inherits the
  * s16-measured banded curve (~0.9999 at the 0.9 dedup threshold).
  *
  * Write order is vecs/ then bands/ — a crash between the two leaves
  * vectors SCORABLE but UNDISCOVERABLE; [[repairVecIndex]] re-derives
  * the missing band rows from the stored vectors (bands are a pure
  * function of qv × meta, nothing is lost).
  */
object VecIndex {

  private val BucketSeed = 77L

  private def dirOf(band: Column, bucket: Column, nBuckets: Int): Column =
    pmod(xxhash64(lit(BucketSeed), band, bucket), lit(nBuckets)).cast("int")

  final case class Meta(bands: Int, bitsPerBand: Int, nBuckets: Int,
      codec: String)

  /** Codec-selected quantization of a raw embedding column: "milli"
    * stores exact milli-unit longs; "int8" stores the s23-audited
    * 1-byte codes ([[Similarity.int8FromMilli]]) — the measured 4×
    * storage cut for the dominant 100 TB vector asset. All in-memory
    * math (banding dots, cosine confirms) runs in long space either
    * way; the codec decides what the PARQUET files carry.
    */
  private def codecQuantize(df: DataFrame, idCol: String, vecCol: String,
      codec: String): DataFrame = {
    val q = df.select(col(idCol).as("vec_id"),
      Similarity.quantize(col(vecCol)).as("qv"))
    codec match {
      case "milli" => q
      case "int8" => q.select(col("vec_id"),
        Similarity.int8FromMilli("qv").as("qv"))
      case other => throw new IllegalArgumentException(
        s"unknown VecIndex codec '$other' (expected milli or int8)")
    }
  }

  /** Parquet encode/decode of the code vector: int8 codes persist as
    * array<tinyint> (1 byte per dim logically) and widen back to longs
    * at read so every scoring expression is codec-agnostic.
    */
  private def storeEncode(qv: Column, codec: String): Column =
    if (codec == "int8") transform(qv, x => x.cast("tinyint")) else qv
  private def loadVecs(spark: SparkSession, path: String,
      codec: String): DataFrame = {
    val v = spark.read.parquet(s"$path/vecs")
    if (codec == "int8")
      v.select(col("vec_id"),
        transform(col("qv"), x => x.cast("bigint")).as("qv"))
    else v
  }

  def writeVecIndex(df: DataFrame, idCol: String, vecCol: String,
      path: String, bands: Int = 8, bitsPerBand: Int = 8,
      nBuckets: Int = 64, codec: String = "milli"): Unit = {
    val spark = df.sparkSession
    val vecs = codecQuantize(df, idCol, vecCol, codec)
      .localCheckpoint(eager = false) // feeds both writes; quantize ONCE
    vecs.select(col("vec_id"), storeEncode(col("qv"), codec).as("qv"))
      .write.mode("overwrite").parquet(s"$path/vecs")
    Similarity.bandedSignBucketsQ(vecs, "vec_id", "qv", bands, bitsPerBand)
      .withColumn("dir", dirOf(col("band"), col("bucket"), nBuckets))
      .select(col("vec_id"), col("band"), col("bucket"), col("dir"))
      .write.partitionBy("dir").mode("overwrite").parquet(s"$path/bands")
    import spark.implicits._
    Seq((bands, bitsPerBand, nBuckets, codec))
      .toDF("bands", "bits_per_band", "n_buckets", "codec").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_meta")
  }

  /** The parameters a persisted index was banded with (one row — bounded
    * driver pull). Pre-codec indexes (no `codec` column) read as
    * "milli" — exactly what they stored.
    */
  def readMeta(spark: SparkSession, path: String): Meta = {
    val df = spark.read.parquet(s"$path/_meta")
    val r = df.head()
    Meta(r.getAs[Int]("bands"), r.getAs[Int]("bits_per_band"),
      r.getAs[Int]("n_buckets"),
      if (df.columns.contains("codec")) r.getAs[String]("codec")
      else "milli")
  }

  /** Incremental maintenance: quantize and band ONLY the new batch with
    * the index's own stored parameters and append into the existing
    * directories. Probe-identical to a full rebuild over old ∪ new —
    * buckets are a pure function of (vector, hyperplane family) and the
    * parameters are immutable once written.
    */
  def appendToVecIndex(df: DataFrame, idCol: String, vecCol: String,
      path: String): Unit = {
    val m = readMeta(df.sparkSession, path)
    val vecs = codecQuantize(df, idCol, vecCol, m.codec)
      .localCheckpoint(eager = false)
    vecs.select(col("vec_id"), storeEncode(col("qv"), m.codec).as("qv"))
      .write.mode("append").parquet(s"$path/vecs")
    Similarity.bandedSignBucketsQ(vecs, "vec_id", "qv", m.bands, m.bitsPerBand)
      .withColumn("dir", dirOf(col("band"), col("bucket"), m.nBuckets))
      .select(col("vec_id"), col("band"), col("bucket"), col("dir"))
      .write.partitionBy("dir").mode("append").parquet(s"$path/bands")
  }

  /** Reconcile the two halves after an interrupted [[appendToVecIndex]]
    * (the LshIndex.repair discipline): re-derive band rows for vectors
    * missing them, and drop band rows whose vector never committed via
    * a crash-safe aside-swap. Idempotent; returns
    * (#vectors re-banded, #orphan vectors dropped).
    */
  def repairVecIndex(spark: SparkSession, path: String): (Long, Long) = {
    val m = readMeta(spark, path)
    val vecs = loadVecs(spark, path, m.codec)
    val bandIds = spark.read.parquet(s"$path/bands")
      .select(col("vec_id")).distinct()
    val missing = vecs.join(bandIds, Seq("vec_id"), "left_anti")
      .localCheckpoint(eager = true) // pin BEFORE the append changes input
    val nMissing = missing.count()
    if (nMissing > 0)
      Similarity
        .bandedSignBucketsQ(missing, "vec_id", "qv", m.bands, m.bitsPerBand)
        .withColumn("dir", dirOf(col("band"), col("bucket"), m.nBuckets))
        .select(col("vec_id"), col("band"), col("bucket"), col("dir"))
        .write.partitionBy("dir").mode("append").parquet(s"$path/bands")
    val vecIds = vecs.select(col("vec_id")).distinct()
    val orphans = bandIds.join(vecIds, Seq("vec_id"), "left_anti")
    val nOrphans = orphans.count()
    if (nOrphans > 0) {
      val bands = spark.read.parquet(s"$path/bands")
      val clean = bands.join(vecIds, Seq("vec_id"), "left_semi")
        .localCheckpoint(eager = true) // fully read before the swap below
      val p = java.nio.file.Paths.get(s"$path/bands")
      val tmp = p.resolveSibling("bands__repair_tmp")
      val aside = p.resolveSibling("bands__repair_old")
      clean.write.partitionBy("dir").mode("overwrite").parquet(tmp.toString)
      java.nio.file.Files.move(p, aside,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      java.nio.file.Files.move(tmp, p,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      org.apache.hadoop.fs.FileUtil.fullyDelete(aside.toFile)
    }
    (nMissing, nOrphans)
  }

  /** Semantic near-dup candidates of a probe batch against the persisted
    * corpus: `(probe_id, corpus_id, dot_q)` for every corpus vector
    * sharing any band cell within Hamming ≤ 1 of the probe's (the 1-bit
    * multi-probe flips run on the probe side) AND passing the exact
    * integer cosine test at `thresholdPpm`. The corpus read prunes to
    * the probe batch's ≤ nBuckets hash directories; the confirm joins
    * the vector sidecar only for surviving candidates.
    *
    * Under the int8 codec BOTH confirm-join payloads stay 1 byte/dim:
    * probe codes re-narrow to `array<tinyint>` before the join (the
    * cast runs map-side, so the shuffle/broadcast frame is 8× under
    * the widened longs) and the corpus sidecar is read raw instead of
    * through [[loadVecs]]'s eager widening — the longs exist only
    * inside the post-join dot/norm expressions, which is where the
    * arithmetic needs them.
    */
  def probeVecIndex(spark: SparkSession, probes: DataFrame, idCol: String,
      vecCol: String, path: String, thresholdPpm: Long): DataFrame = {
    val m = readMeta(spark, path)
    val pq = codecQuantize(probes, idCol, vecCol, m.codec)
      .select(col("vec_id").as("probe_id"), col("qv").as("pqv"))
      .localCheckpoint(eager = false) // bands + confirm reuse one pass
    val pb = Similarity
      .bandedSignBucketsQ(pq, "probe_id", "pqv", m.bands, m.bitsPerBand)
    val pr = pb.select(col("probe_id"), col("band"),
        explode(array((0 to m.bitsPerBand).map(f =>
          if (f == 0) col("bucket")
          else col("bucket").bitwiseXOR(lit(1 << (f - 1)))): _*)).as("bucket"))
      .withColumn("dir", dirOf(col("band"), col("bucket"), m.nBuckets))
      .localCheckpoint(eager = false)
    val probeDirs = pr.select("dir").distinct()
      .collect().map(_.getInt(0)).sorted // ≤ nBuckets — bounded
    val corpus = spark.read.parquet(s"$path/bands")
      .filter(col("dir")
        .isin(probeDirs.toIndexedSeq.map(Integer.valueOf): _*))
    val cands = pr
      .join(corpus, Seq("dir", "band", "bucket"))
      .select(col("probe_id"), col("vec_id").as("corpus_id")).distinct()
    // narrow join payloads (tinyint under int8, pass-through otherwise)
    val pqn = pq.select(col("probe_id"),
      storeEncode(col("pqv"), m.codec).as("pqv"))
    val cvn = spark.read.parquet(s"$path/vecs")
      .select(col("vec_id").as("corpus_id"), col("qv"))
    def widen(c: Column): Column =
      if (m.codec == "int8") transform(c, x => x.cast("bigint")) else c
    val pw = widen(col("pqv"))
    val cw = widen(col("qv"))
    val dot = Similarity.dotQ(pw, cw)
    val lhs = (dot * dot).cast("decimal(38,0)") * lit(1000000L) * lit(1000000L)
    val rhs = (Similarity.normSqQ(pw) * Similarity.normSqQ(cw))
      .cast("decimal(38,0)") * lit(thresholdPpm) * lit(thresholdPpm)
    cands
      .join(pqn, "probe_id")
      .join(cvn, "corpus_id")
      .filter(col("probe_id") =!= col("corpus_id"))
      .filter(dot > 0 && lhs >= rhs)
      .select(col("probe_id"), col("corpus_id"), dot.as("dot_q"))
  }
}
