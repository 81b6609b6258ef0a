package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Persisted LSH index lifecycle (d14): probe-from-store ≡ banding
  * recomputed in memory, append keeps the index probe-identical to a
  * full rebuild, and the bucket layout actually PRUNES the probe read.
  */
class LshIndexSpec extends SparkSpec {
  import spark.implicits._

  // near-dup pairs by construction: base docs plus lightly-edited copies
  private def corpus = (1L to 40L).map { i =>
    val words = (0 until 12).map(w => s"w${(i * 7 + w * 3) % 23}")
    (i, words.mkString(" "))
  }.toDF("doc_id", "text")

  private def probes = (1L to 40L by 4).map { i =>
    val words = (0 until 12).map(w => s"w${(i * 7 + w * 3) % 23}")
    // one-word edit of corpus doc i — high estimated Jaccard survivor
    (1000L + i, (words.dropRight(1) :+ "wEDIT").mkString(" "))
  }.toDF("doc_id", "text")

  private def tempIndex(): String =
    java.nio.file.Files.createTempDirectory("graft-lshidx").toString + "/index"

  private def cleanup(path: String): Unit = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(path).getParent
    scala.util.Using.resource(java.nio.file.Files.walk(root))(
      _.iterator().asScala.toSeq).reverse.foreach(java.nio.file.Files.delete)
  }

  private def probeSet(path: String): Set[(Long, Long, Int)] =
    LshIndex.probeLshIndex(spark, probes, "doc_id", "text", path)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  /** in-memory reference: band probe ∪ corpus together, keep cross-set. */
  private def reference(corpusDf: org.apache.spark.sql.DataFrame)
      : Set[(Long, Long, Int)] = {
    val sigs = Dedup.minhashSignatures(
      corpusDf.unionByName(probes), "doc_id", "text", 3, 16)
    Dedup.lshCandidatePairs(sigs, "doc_id", "sig", 4, 4)
      .filter(col("id2") >= 1000L && col("id1") < 1000L)
      .select(col("id2"), col("id1"), col("est_matches"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  test("probe from store ≡ banding recomputed in memory; survivors exist") {
    val path = tempIndex()
    try {
      LshIndex.writeLshIndex(corpus, "doc_id", "text", path)
      val got = probeSet(path)
      assert(got.nonEmpty, "edit-distance-1 probes must band with sources")
      assert(got == reference(corpus))
    } finally cleanup(path)
  }

  test("append keeps the index probe-identical to a one-shot rebuild") {
    val a = tempIndex(); val b = tempIndex()
    try {
      LshIndex.writeLshIndex(
        corpus.filter(col("doc_id") <= 20), "doc_id", "text", a)
      LshIndex.appendToLshIndex(
        corpus.filter(col("doc_id") > 20), "doc_id", "text", a)
      LshIndex.writeLshIndex(corpus, "doc_id", "text", b)
      assert(probeSet(a) == probeSet(b))
      assert(probeSet(a) == reference(corpus))
    } finally { cleanup(a); cleanup(b) }
  }

  test("repair: crash between sigs and bands heals; probes recover the lost docs") {
    val path = tempIndex(); val ref = tempIndex()
    try {
      val half = corpus.filter(col("doc_id") <= 20)
      val rest = corpus.filter(col("doc_id") > 20)
      LshIndex.writeLshIndex(half, "doc_id", "text", path)
      // simulate appendToLshIndex crashing AFTER sigs/, BEFORE bands/
      val m = LshIndex.readMeta(spark, path)
      Dedup.minhashSignatures(rest, "doc_id", "text", m.n, m.k)
        .select(col("doc_id"), col("sig"))
        .write.mode("append").parquet(s"$path/sigs")
      LshIndex.writeLshIndex(corpus, "doc_id", "text", ref)
      assert(probeSet(path) != probeSet(ref),
        "the crashed append must be observably incomplete")
      val (rebanded, orphaned) = LshIndex.repairLshIndex(spark, path)
      assert(rebanded > 0 && orphaned == 0L, s"($rebanded, $orphaned)")
      assert(probeSet(path) == probeSet(ref),
        "repair must restore probe-equivalence to a full rebuild")
      assert(LshIndex.repairLshIndex(spark, path) == ((0L, 0L)),
        "second repair must be a no-op")
    } finally { cleanup(path); cleanup(ref) }
  }

  test("repair: orphan band rows (no committed signature) are dropped") {
    val path = tempIndex(); val ref = tempIndex()
    try {
      LshIndex.writeLshIndex(corpus, "doc_id", "text", path)
      LshIndex.writeLshIndex(corpus, "doc_id", "text", ref)
      val m = LshIndex.readMeta(spark, path)
      // band rows for a doc whose signature never landed
      val ghost = Seq((9999L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"))
        .toDF("doc_id", "text")
      Dedup.lshBands(
          Dedup.minhashSignatures(ghost, "doc_id", "text", m.n, m.k),
          "doc_id", "sig", m.bands, m.rowsPerBand)
        .withColumn("bucket",
          pmod(xxhash64(lit(42L), col("band_sig")), lit(m.nBuckets)).cast("int"))
        .write.partitionBy("bucket").mode("append").parquet(s"$path/bands")
      val (rebanded, orphaned) = LshIndex.repairLshIndex(spark, path)
      assert(rebanded == 0L && orphaned == 1L, s"($rebanded, $orphaned)")
      assert(probeSet(path) == probeSet(ref))
      val ghosts = spark.read.parquet(s"$path/bands")
        .filter(col("doc_id") === 9999L).count()
      assert(ghosts == 0L, "orphan band rows must be physically gone")
    } finally { cleanup(path); cleanup(ref) }
  }

  test("probe read is bucket-pruned: fewer band files than the full store") {
    val path = tempIndex()
    try {
      LshIndex.writeLshIndex(corpus, "doc_id", "text", path, nBuckets = 16)
      val all = spark.read.parquet(s"$path/bands").inputFiles.length
      val one = probes.limit(1)
      val m = LshIndex.readMeta(spark, path)
      val sigs = Dedup.minhashSignatures(one, "doc_id", "text", m.n, m.k)
        .select(col("doc_id").as("probe_id"), col("sig").as("psig"))
      val bk = Dedup.lshBands(sigs, "probe_id", "psig", m.bands, m.rowsPerBand)
        .select(pmod(xxhash64(lit(42L), col("band_sig")), lit(m.nBuckets))
          .cast("int").as("bucket"))
        .distinct().collect().map(_.getInt(0))
      // the isin on the partition column must plan as partition pruning…
      val p = spark.read.parquet(s"$path/bands")
        .filter(col("bucket").isin(bk.map(Integer.valueOf): _*))
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(p.contains("PartitionFilters") && p.contains("bucket#"),
        p.take(800))
      // …and the layout makes the pruned listing strictly smaller
      val prunedFiles = bk.map { b =>
        val d = new java.io.File(s"$path/bands/bucket=$b")
        if (d.isDirectory) d.listFiles.count(_.getName.endsWith(".parquet"))
        else 0
      }.sum
      assert(bk.length <= m.bands)
      assert(prunedFiles < all,
        s"single-doc probe should list < $all band files, listed $prunedFiles")
    } finally cleanup(path)
  }
}
