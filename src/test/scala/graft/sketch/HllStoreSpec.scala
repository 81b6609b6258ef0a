package graft.sketch

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The accreted HLL register store: accretion ≡ one-shot, replay
  * idempotence (the max-merge algebra), estimate-invisible compaction,
  * and meta immutability.
  */
class HllStoreSpec extends SparkSpec {

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  private def estMap(path: String) =
    HllStore.estimate(spark, path).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_distinct_est"), r.getAs[Long]("sketch_size")))
      .toMap

  test("accreted store estimate ≡ one-shot sketch of the union") {
    val dir = java.nio.file.Files.createTempDirectory("graft-hll")
    try {
      val oneShot = s"$dir/one"
      val accreted = s"$dir/acc"
      HllStore.write(docs, Seq("source"), "text", oneShot)
      HllStore.write(docs.filter(col("doc_id") % 3 === 0),
        Seq("source"), "text", accreted)
      HllStore.append(docs.filter(col("doc_id") % 3 === 1), accreted)
      HllStore.append(docs.filter(col("doc_id") % 3 === 2), accreted)
      val a = estMap(accreted)
      assert(a == estMap(oneShot), "accretion must be invisible")
      assert(a.nonEmpty && a.values.forall(_._1 > 0L))
      // the estimator is in its accurate regime here: every source has
      // exactly 25 distinct texts at sf0.001 — linear counting should
      // land within a couple of buckets of truth
      a.foreach { case (s, (est, _)) =>
        assert(math.abs(est - 25L) <= 5L, s"$s estimated $est (truth 25)")
      }
    } finally delete(dir)
  }

  test("replay idempotence: re-appending a batch changes nothing (max-merge)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-hll-rep")
    try {
      val path = s"$dir/idx"
      HllStore.write(docs.filter(col("doc_id") % 2 === 0),
        Seq("source"), "text", path)
      HllStore.append(docs.filter(col("doc_id") % 2 === 1), path)
      val before = estMap(path)
      val regsBefore = HllStore.registers(spark, path).collect().toSet
      // the at-least-once ingest: same batch lands twice
      HllStore.append(docs.filter(col("doc_id") % 2 === 1), path)
      HllStore.append(docs.filter(col("doc_id") % 2 === 1), path)
      assert(estMap(path) == before, "replayed appends must be absorbed")
      assert(HllStore.registers(spark, path).collect().toSet == regsBefore,
        "the MERGED grid itself must be replay-invariant")
    } finally delete(dir)
  }

  test("compaction folds the log without touching estimates; meta round-trips") {
    val dir = java.nio.file.Files.createTempDirectory("graft-hll-cmp")
    try {
      val path = s"$dir/idx"
      HllStore.write(docs.filter(col("doc_id") % 3 === 0),
        Seq("source"), "text", path)
      HllStore.append(docs.filter(col("doc_id") % 3 === 1), path)
      HllStore.append(docs.filter(col("doc_id") % 3 === 2), path)
      HllStore.append(docs.filter(col("doc_id") % 3 === 1), path) // replay
      val before = estMap(path)
      val (pre, post) = HllStore.compact(spark, path)
      assert(post <= pre, s"compaction must not grow the grid ($pre -> $post)")
      assert(post == HllStore.registers(spark, path).count())
      assert(estMap(path) == before, "compaction must be estimate-invisible")
      // append still works against the compacted store
      HllStore.append(docs.filter(col("doc_id") % 3 === 2), path)
      assert(estMap(path) == before)
      assert(HllStore.readMeta(spark, path)
        == HllStore.Meta(Seq("source"), "text", Sketch.HllM))
    } finally delete(dir)
  }

  test("compact rescues an append that lands inside the swap window") {
    val dir = java.nio.file.Files.createTempDirectory("graft-hll-race")
    try {
      val path = s"$dir/idx"
      HllStore.write(docs.filter(col("doc_id") % 3 === 0),
        Seq("source"), "text", path)
      HllStore.append(docs.filter(col("doc_id") % 3 === 1), path)
      // the reference: what the store must estimate once ALL THREE
      // batches are in, however they interleave with the compaction
      val full = s"$dir/full"
      HllStore.write(docs, Seq("source"), "text", full)
      val want = estMap(full)
      // batch 2 lands between compact's snapshot and its swap — the
      // exact race the straggler rescue exists for
      HllStore.compactImpl(spark, path, () =>
        HllStore.append(docs.filter(col("doc_id") % 3 === 2), path))
      assert(estMap(path) == want,
        "a straggler append's registers must survive compaction")
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$path/registers__compact_old")))
    } finally delete(dir)
  }

  test("repair restores the store from every compact crash state") {
    val dir = java.nio.file.Files.createTempDirectory("graft-hll-rec")
    try {
      val path = s"$dir/idx"
      HllStore.write(docs.filter(col("doc_id") % 2 === 0),
        Seq("source"), "text", path)
      HllStore.append(docs.filter(col("doc_id") % 2 === 1), path)
      val want = estMap(path)
      val p = java.nio.file.Paths.get(s"$path/registers")
      val tmp = p.resolveSibling("registers__compact_tmp")
      val aside = p.resolveSibling("registers__compact_old")
      // healthy store: repair is a no-op
      assert(HllStore.repair(spark, path) == 0L)
      assert(estMap(path) == want)
      // crash BEFORE move 1: a complete tmp next to an intact log
      HllStore.registers(spark, path)
        .write.mode("overwrite").parquet(tmp.toString)
      HllStore.repair(spark, path)
      assert(!java.nio.file.Files.exists(tmp) && estMap(path) == want)
      // crash BETWEEN the moves: log gone, tmp holds the merged grid
      HllStore.registers(spark, path)
        .write.mode("overwrite").parquet(tmp.toString)
      java.nio.file.Files.move(p, aside)
      HllStore.repair(spark, path)
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
      assert(HllStore.repair(spark, path) > 0L)
      assert(estMap(path) == want, // max-merge absorbs the re-added files
        "re-folded aside files must not move any estimate")
      assert(!java.nio.file.Files.exists(aside))
    } finally delete(dir)
  }

  test("estimate plan is pure hash aggregation — no Expand, no ObjectHashAggregate") {
    val dir = java.nio.file.Files.createTempDirectory("graft-hll-plan")
    try {
      val path = s"$dir/idx"
      HllStore.write(docs, Seq("source"), "text", path)
      HllStore.append(docs.filter(col("doc_id") % 2 === 0), path)
      val est = HllStore.estimate(spark, path)
      est.collect()
      // the a15 discipline carried into the store: max-merge + estimate
      // must stay inside codegen'd hash aggregates at any history depth
      val plan = est.queryExecution.executedPlan.toString
      assert(!plan.contains("Expand"), "register merge must not Expand")
      assert(!plan.contains("ObjectHashAggregate"),
        "no typed-UDAF tax on the store read path")
      assert(plan.contains("HashAggregate"))
    } finally delete(dir)
  }

  private def delete(dir: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    scala.util.Using.resource(java.nio.file.Files.walk(dir))(
      _.iterator().asScala.toSeq).reverse.foreach(java.nio.file.Files.delete)
  }
}
