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
    // Cluster by dir BEFORE the partitioned write (guide §6): one file
    // per directory per write instead of (upstream tasks × dirs) shards —
    // probes re-read bands/ every run and pay per-file open cost.
    // Column-form repartition so AQE still sizes corpus-scale builds.
    Similarity.bandedSignBucketsQ(vecs, "vec_id", "qv", bands, bitsPerBand)
      .withColumn("dir", dirOf(col("band"), col("bucket"), nBuckets))
      .select(col("vec_id"), col("band"), col("bucket"), col("dir"))
      .repartition(col("dir"))
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
      .repartition(col("dir")) // one file per dir per append (§6)
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
    // EXPLICIT width after the candidate DISTINCT (r16): the deduped
    // (probe_id, corpus_id) exchange is sub-MB at gate scale, so
    // byte-sized AQE coalescing serialized the confirm stage behind it
    // (per-candidate 64-long dot + cosine gate: StageProfile s26
    // showed 0.57 s CPU in ONE task at the default floor). Keyed on
    // probe_id — what the consumers group/order by — with the width
    // from spark.sql.shuffle.partitions.
    val widthP = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val cands = pr
      .join(corpus, Seq("dir", "band", "bucket"))
      .select(col("probe_id"), col("vec_id").as("corpus_id")).distinct()
      .repartition(widthP, col("probe_id"))
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
    cands
      .join(pqn, "probe_id")
      .join(cvn, "corpus_id")
      .filter(col("probe_id") =!= col("corpus_id"))
      .filter(graft.functions.cosine_gate_ppm(dot,
        Similarity.normSqQ(pw), Similarity.normSqQ(cw), thresholdPpm))
      .select(col("probe_id"), col("corpus_id"), dot.as("dot_q"))
  }

  // ----------------------------------------------------- PQ shortlist tier

  final case class PqMeta(m: Int, kCodes: Int, kEff: Int, dims: Int,
      iterations: Int, trainMod: Long)

  /** Add the s29-justified PQ SHORTLIST tier to a persisted index: a
    * `codes/` sidecar of 1-byte-per-subspace product-quantization
    * codes next to the exact `vecs/`. Serving reads then score the
    * (large) banded candidate set against m bytes/vector instead of
    * the full code — at the gated m=16 point, 16 B instead of the
    * milli sidecar's 512 B (32×) or int8's 64 B (4×) — and touch the
    * exact tier only for the top-`shortlist` survivors per probe
    * ([[annProbeVecIndex]]). Codebooks train on the STORE's OWN
    * vectors with the s27/s28/s29 integer-Lloyd discipline
    * ([[Similarity.trainPqCodebooksQ]] — deterministic 1-in-trainMod
    * id sample, first-kCodes init, exact-L2 ties-to-smaller-code,
    * truncating mean), so sidecar codes are a pure function of
    * (vecs, params) — which is what lets a STORE-FREE oracle replay
    * the whole tier from raw embeddings.
    *
    * Layout: `codes/` (vec_id, codes array<tinyint>, code c stored as
    * c−128 so 256 codewords fit the signed byte); `_pq/` the
    * codebook rows (j, code, cw) + one `_pq_meta/` params row — both
    * kilobytes, the only driver pulls on the read path.
    */
  def writePqSidecar(spark: SparkSession, path: String, m: Int = 16,
      kCodes: Int = 256, iterations: Int = 2, trainMod: Long = 5L)
      : Unit = {
    val meta = readMeta(spark, path)
    val vecs = loadVecs(spark, path, meta.codec)
      .repartition(
        spark.conf.get("spark.sql.shuffle.partitions").toInt)
      .localCheckpoint(eager = false) // train + encode share one read
    val dims = vecs.select(size(col("qv"))).head().getInt(0)
    val sub = dims / m
    val books = Similarity.trainPqCodebooksQ(
      vecs.select(col("vec_id").as("__id"), col("qv").as("__qv")),
      m, kCodes, iterations, dims, trainMod)
    vecs.select(col("vec_id"),
        codesEncode(Similarity.pqEncodeExpr(col("qv"), books, sub))
          .as("codes"))
      .write.mode("overwrite").parquet(s"$path/codes")
    import spark.implicits._
    books.zipWithIndex
      .flatMap { case (book, j) => book.map { case (c, cw) => (j, c, cw) } }
      .toDF("j", "code", "cw").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_pq")
    Seq((m, kCodes, books.head.size, dims, iterations, trainMod))
      .toDF("m", "k_codes", "k_eff", "dims", "iterations", "train_mod")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/_pq_meta")
  }

  /** Codes persist 1 byte/subspace: code c ∈ [0, 255] stores as c−128. */
  private def codesEncode(codes: Column): Column =
    transform(codes, c => (c - lit(128)).cast("tinyint"))
  private def codesDecode(codes: Column): Column =
    transform(codes, c => (c.cast("int") + lit(128)))

  def readPqMeta(spark: SparkSession, path: String): PqMeta = {
    val r = spark.read.parquet(s"$path/_pq_meta").head()
    PqMeta(r.getAs[Int]("m"), r.getAs[Int]("k_codes"),
      r.getAs[Int]("k_eff"), r.getAs[Int]("dims"),
      r.getAs[Int]("iterations"), r.getAs[Long]("train_mod"))
  }

  /** The persisted codebooks, j-then-code ordered (≤ m·kCodes rows —
    * kilobytes, the bounded driver pull the flat-literal ADC needs).
    */
  private def readBooks(spark: SparkSession, path: String)
      : IndexedSeq[IndexedSeq[(Int, Seq[Long])]] =
    spark.read.parquet(s"$path/_pq")
      .orderBy(col("j"), col("code")).collect()
      .map(r => (r.getAs[Int]("j"), r.getAs[Int]("code"),
        r.getSeq[Long](r.fieldIndex("cw")).toSeq))
      .groupBy(_._1).toIndexedSeq.sortBy(_._1)
      .map(_._2.map(t => (t._2, t._3)).toIndexedSeq)

  /** Encode vectors that landed in `vecs/` after the sidecar was
    * written (an [[appendToVecIndex]] increment) with the FROZEN
    * stored codebooks — codes stay a pure function of (vecs, params),
    * so a refreshed sidecar is identical to one written after the
    * append. Idempotent; returns the number of vectors encoded.
    */
  def refreshPqSidecar(spark: SparkSession, path: String): Long = {
    val meta = readMeta(spark, path)
    val pm = readPqMeta(spark, path)
    val books = readBooks(spark, path)
    val coded = spark.read.parquet(s"$path/codes").select(col("vec_id"))
    val missing = loadVecs(spark, path, meta.codec)
      .join(coded, Seq("vec_id"), "left_anti")
      .localCheckpoint(eager = true) // pin before the append changes input
    val n = missing.count()
    if (n > 0)
      missing.select(col("vec_id"),
          codesEncode(Similarity.pqEncodeExpr(col("qv"), books,
            pm.dims / pm.m)).as("codes"))
        .write.mode("append").parquet(s"$path/codes")
    n
  }

  /** Top-k ANN through the store, the standard PQ serving shape —
    * banding DISCOVERS, the codes sidecar SHORTLISTS, the exact tier
    * RE-RANKS:
    *
    *  1. probe bands + 1-bit multi-probe prune the corpus read to
    *     ≤ nBuckets directories (the [[probeVecIndex]] discovery);
    *  2. every candidate is ADC-scored by the probe's full-precision
    *     code against the candidate's PQ RECONSTRUCTION — candidates
    *     join only the m-byte `codes/` sidecar; reconstruction is a
    *     scan-stage expression through the flat literal codebook (no
    *     codebook join), and the per-probe top-`shortlist` survives
    *     via the mergeable [[TopKAggregator]] (k-slot partials, never
    *     the candidate space through a window);
    *  3. ONLY shortlist rows join the exact `vecs/` tier for the
    *     integer-cosine re-rank.
    *
    * Returns the re-ranked shortlist: (query_id, rank, neighbor_id,
    * dot_q, cosine) with rank by EXACT cosine (desc, nulls last,
    * neighbor_id tie-break) — `rank <= k` is the caller's serving
    * answer; the full list is the shortlist-recall diagnostic (one
    * output serves both, the s27 reporting trick). At 100 TB the
    * candidate-scoring join — the term that dominates a probe — ships
    * m bytes/vector instead of the exact tier's full code.
    */
  def annProbeVecIndex(spark: SparkSession, probes: DataFrame,
      idCol: String, vecCol: String, path: String,
      shortlist: Int = 50): DataFrame = {
    val m = readMeta(spark, path)
    val books = readBooks(spark, path)
    val pq = codecQuantize(probes, idCol, vecCol, m.codec)
      .select(col("vec_id").as("query_id"), col("qv").as("pqv"))
      .localCheckpoint(eager = false) // bands + ADC + re-rank share it
    val pb = Similarity
      .bandedSignBucketsQ(pq, "query_id", "pqv", m.bands, m.bitsPerBand)
    val pr = pb.select(col("query_id"), col("band"),
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
    // EXPLICIT width after the candidate DISTINCT (r16) — the
    // probeVecIndex rationale: the ADC scoring stage (m codebook
    // lookups + dot per candidate) otherwise serializes behind the
    // byte-coalesced sub-MB candidate exchange. Keyed on query_id, the
    // key both downstream top-k groupBys need, so their ENSURE
    // exchanges are elided.
    val widthP = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val cands = pr
      .join(corpus, Seq("dir", "band", "bucket"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
      .distinct()
      .filter(col("query_id") =!= col("neighbor_id"))
      .repartition(widthP, col("query_id"))
    def widen(c: Column): Column =
      if (m.codec == "int8") transform(c, x => x.cast("bigint")) else c
    // ADC stage: candidates carry m bytes each; reconstruction and
    // scoring are scan-stage expressions after the join
    val codes = spark.read.parquet(s"$path/codes")
      .select(col("vec_id").as("neighbor_id"), col("codes"))
    val rv = Similarity.pqReconstructExpr(codesDecode(col("codes")), books)
    val pqvW = widen(col("pqv"))
    val adcDot = Similarity.dotQ(pqvW, rv)
    val adcCos = Similarity.cosineFromQ(adcDot,
      Similarity.normSqQ(pqvW), Similarity.normSqQ(rv))
    val topShort = udaf(TopKAggregator(shortlist))
    val short = cands
      .join(codes, "neighbor_id")
      .join(pq, "query_id")
      .select(col("query_id"), col("neighbor_id"),
        adcDot.as("__adot"), adcCos.as("__acos"))
      .groupBy(col("query_id"))
      .agg(topShort(col("neighbor_id"), col("__adot"), col("__acos"))
        .as("tk"))
      .select(col("query_id"), explode(col("tk")).as("c"))
      .select(col("query_id"), col("c.neighbor_id").as("neighbor_id"))
    // exact re-rank: ONLY shortlist rows touch the exact tier
    val exact = spark.read.parquet(s"$path/vecs")
      .select(col("vec_id").as("neighbor_id"), col("qv"))
    val qvW = widen(col("qv"))
    val exDot = Similarity.dotQ(pqvW, qvW)
    val exCos = Similarity.cosineFromQ(exDot,
      Similarity.normSqQ(pqvW), Similarity.normSqQ(qvW))
    val topK = udaf(TopKAggregator(shortlist)) // full re-ranked list out
    short
      .join(exact, "neighbor_id")
      .join(pq, "query_id")
      .select(col("query_id"), col("neighbor_id"),
        exDot.as("dot_q"), exCos.as("cosine"))
      .groupBy(col("query_id"))
      .agg(topK(col("neighbor_id"), col("dot_q"), col("cosine")).as("tk"))
      .select(col("query_id"), posexplode(col("tk")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("col.neighbor_id"), col("col.dot_q"), col("col.cosine"))
  }
}
