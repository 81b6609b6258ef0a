package graft.sketch

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The accreted CMS frequency store: accretion ≡ one-shot (grids add
  * cell-wise over disjoint batches), replay idempotence via the batch
  * tag (sum alone is NOT idempotent — the taxonomy's forking point),
  * estimate-invisible compaction whose folded tag drops late replays
  * of folded batches, straggler rescue of unfolded batches, crash
  * repair with subsumed-fold resolution, and meta immutability.
  */
class CmsStoreSpec extends SparkSpec {

  private val D = 4
  private val W = 256

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  private def toks(m: Long) = docs.filter(col("doc_id") % 3 === m)
    .select(col("source"), explode(split(trim(col("text")), "\\s+"))
      .as("token"))
    .filter(col("token") =!= "")

  private def allToks = docs
    .select(col("source"), explode(split(trim(col("text")), "\\s+"))
      .as("token"))
    .filter(col("token") =!= "")

  private def gridSet(path: String) =
    CmsStore.grid(spark, path)
      .select(col("source"), col("r").cast("long"),
        col("bucket").cast("long"), col("cnt").cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet

  private def estMap(path: String, probes: org.apache.spark.sql.DataFrame) =
    CmsStore.estimate(spark, path, probes).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("token"))
        -> r.getAs[Long]("cms_n")).toMap

  private def topTokens = allToks.groupBy(col("token"))
    .agg(count(lit(1)).as("n"))
    .orderBy(col("n").desc, col("token")).limit(5)
    .select(col("token"))

  test("accreted store ≡ one-shot grid; estimates dominate truth (CMS upper bound)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cms")
    try {
      val oneShot = s"$dir/one"
      val accreted = s"$dir/acc"
      CmsStore.write(allToks, Seq("source"), "token", D, W, "all", oneShot)
      CmsStore.write(toks(0), Seq("source"), "token", D, W, "b0", accreted)
      CmsStore.append(toks(1), "b1", accreted)
      CmsStore.append(toks(2), "b2", accreted)
      assert(gridSet(accreted) == gridSet(oneShot),
        "the merged grid itself must equal the one-shot grid cell for cell")
      val probes = topTokens
      val est = estMap(accreted, probes)
      assert(est == estMap(oneShot, probes))
      // CMS contract: estimate ≥ true per-(source, token) count
      val truth = allToks.join(probes, "token")
        .groupBy(col("source"), col("token")).agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getAs[String]("source"),
          r.getAs[String]("token")) -> r.getAs[Long]("n")).toMap
      assert(truth.nonEmpty)
      truth.foreach { case (k, n) =>
        assert(est.getOrElse(k, 0L) >= n, s"$k: est below truth") }
    } finally delete(dir)
  }

  test("replay idempotence: re-appending a tagged batch changes nothing (distinct absorbs)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cms-rep")
    try {
      val path = s"$dir/idx"
      CmsStore.write(toks(0), Seq("source"), "token", D, W, "b0", path)
      CmsStore.append(toks(1), "b1", path)
      val before = gridSet(path)
      CmsStore.append(toks(1), "b1", path)
      CmsStore.append(toks(1), "b1", path)
      assert(gridSet(path) == before,
        "an at-least-once redelivery must be absorbed by the tag")
      // the SAME data under a NEW tag is a genuine second batch: sums
      // must move — proving the guard is the tag, not the data
      CmsStore.append(toks(1), "b9", path)
      assert(gridSet(path) != before,
        "a distinct tag must count — sum-merge is not idempotent")
    } finally delete(dir)
  }

  test("compaction folds without touching estimates; folded tag drops late replays; straggler rescued") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cms-cmp")
    try {
      val path = s"$dir/idx"
      CmsStore.write(toks(0), Seq("source"), "token", D, W, "b0", path)
      CmsStore.append(toks(1), "b1", path)
      val oneShot = s"$dir/one"
      CmsStore.write(allToks, Seq("source"), "token", D, W, "all", oneShot)
      val want = gridSet(oneShot)
      // batch 2 lands inside the swap window — an UNFOLDED batch, so
      // the rescue preserves it in full
      CmsStore.compactImpl(spark, path, () =>
        CmsStore.append(toks(2), "b2", path))
      assert(gridSet(path) == want,
        "a straggler append of an unfolded batch must survive compaction")
      // a late replay of a FOLDED batch: the folded tag recognizes and
      // drops it — the read-side ledger
      CmsStore.append(toks(1), "b1", path)
      assert(gridSet(path) == want,
        "a replay of a folded batch must be dropped by its tag")
      val (pre, post) = CmsStore.compact(spark, path)
      assert(post <= pre && gridSet(path) == want)
      assert(CmsStore.readMeta(spark, path)
        == CmsStore.Meta(Seq("source"), "token", D, W))
    } finally delete(dir)
  }

  test("repair restores the store from every compact crash state; subsumed fold dropped, not re-summed") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cms-rec")
    try {
      val path = s"$dir/idx"
      CmsStore.write(toks(0), Seq("source"), "token", D, W, "b0", path)
      CmsStore.append(toks(1), "b1", path)
      CmsStore.compact(spark, path) // log is now one folded grid F:b0,b1
      CmsStore.append(toks(2), "b2", path)
      val want = gridSet(path)
      val p = java.nio.file.Paths.get(s"$path/cells")
      val tmp = p.resolveSibling("cells__compact_tmp")
      val aside = p.resolveSibling("cells__compact_old")
      assert(CmsStore.repair(spark, path) == 0L) // healthy: no-op
      // crash BETWEEN the moves of a second compact: log gone, tmp
      // holds the NEW folded grid (tag F:b0,b1,b2); the aside holds
      // the OLD folded grid (F:b0,b1) plus live b2 — repair re-adds
      // BOTH, and the maximal-tag rule must keep exactly one copy
      spark.read.parquet(p.toString).createOrReplaceTempView("__cms_log")
      spark.sql("""SELECT source, r, bucket, SUM(cnt) AS cnt,
                   'F:b0,b1,b2' AS batch_id
                   FROM __cms_log GROUP BY 1, 2, 3""")
        .write.mode("overwrite").parquet(tmp.toString)
      java.nio.file.Files.move(p, aside)
      CmsStore.repair(spark, path)
      assert(java.nio.file.Files.exists(p) && gridSet(path) == want,
        "the subsumed old fold and covered b2 must not double-count")
      assert(!java.nio.file.Files.exists(aside)
        && !java.nio.file.Files.exists(tmp))
      // crash AFTER move 2, before the aside delete: relic copies of
      // the current log linger under new names — identical rows, so
      // the distinct absorbs the re-add
      java.nio.file.Files.createDirectory(aside)
      java.nio.file.Files.list(p).forEach { f =>
        if (f.getFileName.toString.endsWith(".parquet"))
          java.nio.file.Files.copy(f,
            aside.resolve("part-relic-" + f.getFileName.toString))
      }
      assert(CmsStore.repair(spark, path) > 0L)
      assert(gridSet(path) == want,
        "re-folded aside files must not move any cell")
      assert(!java.nio.file.Files.exists(aside))
    } finally delete(dir)
  }

  test("pairwise join sizes from ONE grouped store ≡ Sketch.cmsJoinSize per pair") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cms-pj")
    try {
      val path = s"$dir/idx"
      // accreted in two batches — the pairwise read must see the MERGED
      // grid, same as a rescan would
      CmsStore.write(toks(0), Seq("source"), "token", D, W, "b0", path)
      CmsStore.append(toks(1).unionByName(toks(2)), "b12", path)
      val got = CmsStore.pairwiseJoinSizes(spark, path).collect()
        .map(r => (r.getAs[String]("source_a"),
          r.getAs[String]("source_b")) -> r.getAs[Long]("cms_join_n"))
        .toMap
      val sources = allToks.select(col("source")).distinct()
        .collect().map(_.getString(0)).sorted
      assert(got.keySet == (for {
        a <- sources; b <- sources if a < b
      } yield (a, b)).toSet, "every ordered pair must be answered")
      // the store's answer for a pair IS the two-rescan estimator's
      for ((a, b) <- sources.combinations(2).map(c => (c(0), c(1)))
          .take(3)) {
        val direct = Sketch.cmsJoinSize(
          allToks.filter(col("source") === a), "token",
          allToks.filter(col("source") === b), "token", D, W)
          .head().getAs[Long]("cms_join_n")
        assert(got((a, b)) == direct,
          s"($a,$b): store ${got((a, b))} != rescan $direct")
      }
    } finally delete(dir)
  }

  test("batch ids are validated: empty, comma, and folded-prefix tags rejected") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cms-val")
    try {
      val path = s"$dir/idx"
      intercept[IllegalArgumentException] {
        CmsStore.write(toks(0), Seq("source"), "token", D, W, "a,b", path)
      }
      CmsStore.write(toks(0), Seq("source"), "token", D, W, "b0", path)
      intercept[IllegalArgumentException] {
        CmsStore.append(toks(1), "", path)
      }
      intercept[IllegalArgumentException] {
        CmsStore.append(toks(1), "F:evil", path)
      }
    } finally delete(dir)
  }

  private def delete(dir: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    scala.util.Using.resource(java.nio.file.Files.walk(dir))(
      _.iterator().asScala.toSeq).reverse.foreach(java.nio.file.Files.delete)
  }
}
