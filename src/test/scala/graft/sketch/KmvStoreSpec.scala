package graft.sketch

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The accreted KMV minima store: accretion ≡ one-shot (the k-minima-
  * of-a-union property), replay idempotence (distinct-union algebra),
  * estimate-invisible compaction with straggler rescue, crash repair,
  * and meta immutability.
  */
class KmvStoreSpec extends SparkSpec {

  private val K = 16

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  private def estMap(path: String) =
    KmvStore.estimate(spark, path).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_distinct_est"), r.getAs[Long]("sketch_size")))
      .toMap

  test("accreted store ≡ one-shot sketch of the union; estimates exact below k") {
    val dir = java.nio.file.Files.createTempDirectory("graft-kmv")
    try {
      val oneShot = s"$dir/one"
      val accreted = s"$dir/acc"
      KmvStore.write(docs, Seq("source"), "text", K, oneShot)
      KmvStore.write(docs.filter(col("doc_id") % 3 === 0),
        Seq("source"), "text", K, accreted)
      KmvStore.append(docs.filter(col("doc_id") % 3 === 1), accreted)
      KmvStore.append(docs.filter(col("doc_id") % 3 === 2), accreted)
      val a = estMap(accreted)
      assert(a == estMap(oneShot), "accretion must be invisible")
      // k=16 < the 25 distinct texts per source at sf0.001: every
      // group is in the estimator regime with a full sketch
      assert(a.nonEmpty && a.values.forall(_._2 == K.toLong))
      a.foreach { case (s, (est, _)) =>
        assert(est > 0L && math.abs(est - 25L) <= 15L,
          s"$s estimated $est (truth 25)")
      }
      // and the merged minima ARE the k smallest of the union: the
      // one-shot store's minima set matches cell for cell
      assert(KmvStore.minima(spark, accreted).collect().toSet
        == KmvStore.minima(spark, oneShot).collect().toSet)
    } finally delete(dir)
  }

  test("replay idempotence: re-appending a batch changes nothing (distinct-union)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-kmv-rep")
    try {
      val path = s"$dir/idx"
      KmvStore.write(docs.filter(col("doc_id") % 2 === 0),
        Seq("source"), "text", K, path)
      KmvStore.append(docs.filter(col("doc_id") % 2 === 1), path)
      val before = estMap(path)
      val minBefore = KmvStore.minima(spark, path).collect().toSet
      KmvStore.append(docs.filter(col("doc_id") % 2 === 1), path)
      KmvStore.append(docs.filter(col("doc_id") % 2 === 1), path)
      assert(estMap(path) == before, "replayed appends must be absorbed")
      assert(KmvStore.minima(spark, path).collect().toSet == minBefore,
        "the MERGED minima set itself must be replay-invariant")
    } finally delete(dir)
  }

  test("compaction folds the log without touching estimates; straggler rescued; meta round-trips") {
    val dir = java.nio.file.Files.createTempDirectory("graft-kmv-cmp")
    try {
      val path = s"$dir/idx"
      KmvStore.write(docs.filter(col("doc_id") % 3 === 0),
        Seq("source"), "text", K, path)
      KmvStore.append(docs.filter(col("doc_id") % 3 === 1), path)
      KmvStore.append(docs.filter(col("doc_id") % 3 === 1), path) // replay
      val full = s"$dir/full"
      KmvStore.write(docs, Seq("source"), "text", K, full)
      val want = estMap(full)
      // batch 2 lands inside the swap window — must be rescued
      KmvStore.compactImpl(spark, path, () =>
        KmvStore.append(docs.filter(col("doc_id") % 3 === 2), path))
      assert(estMap(path) == want,
        "a straggler append's minima must survive compaction")
      val (pre, post) = KmvStore.compact(spark, path)
      assert(post <= pre && estMap(path) == want)
      KmvStore.append(docs.filter(col("doc_id") % 3 === 2), path)
      assert(estMap(path) == want)
      assert(KmvStore.readMeta(spark, path)
        == KmvStore.Meta(Seq("source"), "text", K))
    } finally delete(dir)
  }

  test("repair restores the store from every compact crash state") {
    val dir = java.nio.file.Files.createTempDirectory("graft-kmv-rec")
    try {
      val path = s"$dir/idx"
      KmvStore.write(docs.filter(col("doc_id") % 2 === 0),
        Seq("source"), "text", K, path)
      KmvStore.append(docs.filter(col("doc_id") % 2 === 1), path)
      val want = estMap(path)
      val p = java.nio.file.Paths.get(s"$path/minima")
      val tmp = p.resolveSibling("minima__compact_tmp")
      val aside = p.resolveSibling("minima__compact_old")
      assert(KmvStore.repair(spark, path) == 0L) // healthy: no-op
      // crash BETWEEN the moves: log gone, tmp holds the merged minima
      KmvStore.minima(spark, path)
        .write.mode("overwrite").parquet(tmp.toString)
      java.nio.file.Files.move(p, aside)
      KmvStore.repair(spark, path)
      assert(java.nio.file.Files.exists(p) && estMap(path) == want)
      assert(!java.nio.file.Files.exists(aside)
        && !java.nio.file.Files.exists(tmp))
      // crash AFTER move 2, before the aside delete: old files linger
      java.nio.file.Files.createDirectory(aside)
      java.nio.file.Files.list(p).forEach { f =>
        if (f.getFileName.toString.endsWith(".parquet"))
          java.nio.file.Files.copy(f,
            aside.resolve("part-relic-" + f.getFileName.toString))
      }
      assert(KmvStore.repair(spark, path) > 0L)
      assert(estMap(path) == want, // distinct-union absorbs re-adds
        "re-folded aside files must not move any estimate")
      assert(!java.nio.file.Files.exists(aside))
    } finally delete(dir)
  }

  private def delete(dir: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    scala.util.Using.resource(java.nio.file.Files.walk(dir))(
      _.iterator().asScala.toSeq).reverse.foreach(java.nio.file.Files.delete)
  }
}
