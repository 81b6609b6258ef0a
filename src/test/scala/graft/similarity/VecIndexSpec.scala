package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The persisted banded vector store: accreted probe ≡ one-shot build,
  * directory pruning, torn-append crash repair, and meta immutability.
  */
class VecIndexSpec extends SparkSpec {

  private def base = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def probes = base.filter(col("vec_id") % 17 === 0)
    .withColumn("vec_id", col("vec_id") + 900000L)

  private def probeSet(path: String) =
    VecIndex.probeVecIndex(spark, probes, "vec_id", "embedding",
        path, 900000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("accreted store probe-identical to a one-shot build; planted dups found") {
    val dir = java.nio.file.Files.createTempDirectory("graft-vecidx")
    try {
      val oneShot = s"$dir/one"
      val accreted = s"$dir/acc"
      VecIndex.writeVecIndex(base, "vec_id", "embedding", oneShot,
        bands = 8, bitsPerBand = 8, nBuckets = 16)
      VecIndex.writeVecIndex(base.filter(col("vec_id") % 3 === 0),
        "vec_id", "embedding", accreted, bands = 8, bitsPerBand = 8,
        nBuckets = 16)
      VecIndex.appendToVecIndex(base.filter(col("vec_id") % 3 === 1),
        "vec_id", "embedding", accreted)
      VecIndex.appendToVecIndex(base.filter(col("vec_id") % 3 === 2),
        "vec_id", "embedding", accreted)
      val a = probeSet(accreted)
      assert(a == probeSet(oneShot), "accretion must be invisible to probes")
      // every verbatim re-ingest finds exactly its original at 0.9
      val expected = base.filter(col("vec_id") % 17 === 0)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(a.map(_._2) == expected, s"probe hits ${a.map(_._2)}")
      a.foreach { case (p, c, _) => assert(p == c + 900000L) }
      // meta round-trips
      val m = VecIndex.readMeta(spark, accreted)
      assert(m == VecIndex.Meta(8, 8, 16, "milli"))
    } finally delete(dir)
  }

  test("int8 codec: accreted ≡ one-shot, 1-byte codes on disk, planted " +
      "dups found, torn append repairs") {
    val dir = java.nio.file.Files.createTempDirectory("graft-vecidx8")
    try {
      val oneShot = s"$dir/one"
      val accreted = s"$dir/acc"
      VecIndex.writeVecIndex(base, "vec_id", "embedding", oneShot,
        bands = 8, bitsPerBand = 8, nBuckets = 16, codec = "int8")
      VecIndex.writeVecIndex(base.filter(col("vec_id") % 3 === 0),
        "vec_id", "embedding", accreted, bands = 8, bitsPerBand = 8,
        nBuckets = 16, codec = "int8")
      VecIndex.appendToVecIndex(base.filter(col("vec_id") % 3 === 1),
        "vec_id", "embedding", accreted)
      VecIndex.appendToVecIndex(base.filter(col("vec_id") % 3 === 2),
        "vec_id", "embedding", accreted)
      val a = probeSet(accreted)
      assert(a == probeSet(oneShot), "accretion must be invisible to probes")
      // every verbatim re-ingest finds exactly its original at 0.9 —
      // identical int8 codes have cosine exactly 1.0
      val expected = base.filter(col("vec_id") % 17 === 0)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(a.map(_._2) == expected, s"probe hits ${a.map(_._2)}")
      // the sidecar really is 1-byte codes: array<tinyint> on parquet
      val elem = spark.read.parquet(s"$accreted/vecs").schema("qv")
        .dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
        .elementType
      assert(elem == org.apache.spark.sql.types.ByteType,
        s"int8 codec must persist tinyint codes, got $elem")
      assert(VecIndex.readMeta(spark, accreted)
        == VecIndex.Meta(8, 8, 16, "int8"))
      // torn append: vecs/ committed in CODE space, bands/ never
      // written — repair must re-derive bands from the DECODED codes
      val extra = base.filter(col("vec_id") % 17 === 0)
        .withColumn("vec_id", col("vec_id") + 700000L)
      val torn0 = extra.select(col("vec_id"),
        Similarity.quantize(col("embedding")).as("__q"))
      val torn1 = torn0.select(col("vec_id"),
        transform(Similarity.int8FromMilli("__q"),
          x => x.cast("tinyint")).as("qv"))
      torn1.write.mode("append").parquet(s"$accreted/vecs")
      val tornIds = torn1.select("vec_id").collect().map(_.getLong(0)).toSet
      val torn = probeSet(accreted)
      assert(torn.forall { case (_, c, _) => !tornIds.contains(c) },
        "torn batch must be undiscoverable before repair")
      val (rebanded, orphans) = VecIndex.repairVecIndex(spark, accreted)
      assert(rebanded == tornIds.size.toLong && orphans == 0L)
      val repaired = probeSet(accreted)
      // the torn rows are verbatim copies at +700000; after repair each
      // planted probe (+900000) must ALSO find its torn twin
      assert(tornIds.subsetOf(repaired.map(_._2)),
        "repair must surface the torn int8 batch")
      assert(VecIndex.repairVecIndex(spark, accreted) == ((0L, 0L)))
    } finally delete(dir)
  }

  test("int8 probe: confirm-join payloads are 1-byte codes on BOTH sides") {
    val dir = java.nio.file.Files.createTempDirectory("graft-vecidx8p")
    try {
      val path = s"$dir/idx"
      VecIndex.writeVecIndex(base, "vec_id", "embedding", path,
        bands = 8, bitsPerBand = 8, nBuckets = 16, codec = "int8")
      val out = VecIndex.probeVecIndex(spark, probes, "vec_id",
        "embedding", path, 900000L)
      // the widened longs may exist only INSIDE the post-join dot/norm
      // expressions: every Join node that carries a vector payload must
      // carry it as array<tinyint> (1 byte/dim through shuffle/broadcast)
      val joins = out.queryExecution.analyzed.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }
      val payloads = joins.flatMap(_.output
        .filter(a => a.name == "pqv" || a.name == "qv"))
      assert(payloads.nonEmpty, "confirm join carries no vector payload?")
      payloads.foreach { a =>
        val et = a.dataType
          .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
        assert(et == org.apache.spark.sql.types.ByteType,
          s"join payload ${a.name} must be tinyint codes, got $et")
      }
      // and the narrow path returns the same hits as before
      val expected = base.filter(col("vec_id") % 17 === 0)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val hits = out.collect().map(_.getLong(1)).toSet
      assert(hits == expected, s"probe hits $hits")
    } finally delete(dir)
  }

  test("torn append: missing band rows are undiscoverable until repair re-derives them") {
    val dir = java.nio.file.Files.createTempDirectory("graft-vecidx-torn")
    try {
      val path = s"$dir/idx"
      VecIndex.writeVecIndex(base.filter(col("vec_id") % 3 =!= 2),
        "vec_id", "embedding", path, bands = 8, bitsPerBand = 8,
        nBuckets = 16)
      val healthy = probeSet(path)
      // simulate the crash window of appendToVecIndex: vecs/ committed,
      // bands/ never written — by appending ONLY the vecs half manually
      val batch = base.filter(col("vec_id") % 3 === 2)
        .select(col("vec_id"), Similarity.quantize(col("embedding")).as("qv"))
      batch.write.mode("append").parquet(s"$path/vecs")
      val torn = probeSet(path)
      val batchIds = batch.select("vec_id").collect().map(_.getLong(0)).toSet
      assert(torn.forall { case (_, c, _) => !batchIds.contains(c) },
        "torn batch must be undiscoverable (scorable but never proposed)")
      val (rebanded, orphans) = VecIndex.repairVecIndex(spark, path)
      assert(rebanded == batchIds.size.toLong && orphans == 0L)
      val repaired = probeSet(path)
      assert(repaired.map(_._2).intersect(batchIds) ==
        batchIds.intersect(base.filter(col("vec_id") % 17 === 0)
          .select("vec_id").collect().map(_.getLong(0)).toSet),
        "repair must surface the torn batch's planted originals")
      assert(healthy.subsetOf(repaired))
      // idempotent
      assert(VecIndex.repairVecIndex(spark, path) == ((0L, 0L)))
      assert(probeSet(path) == repaired)
    } finally delete(dir)
  }

  test("PQ shortlist tier: 1-byte sidecar, rank-1 serving, frozen-codebook refresh, payload pin") {
    val dir = java.nio.file.Files.createTempDirectory("graft-vecidx-pq")
    try {
      val path = s"$dir/idx"
      VecIndex.writeVecIndex(base, "vec_id", "embedding", path,
        bands = 8, bitsPerBand = 8, nBuckets = 16)
      VecIndex.writePqSidecar(spark, path, m = 16, kCodes = 256,
        trainMod = 5L)
      // the sidecar really is m one-byte codes per vector
      val elem = spark.read.parquet(s"$path/codes").schema("codes")
        .dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
        .elementType
      assert(elem == org.apache.spark.sql.types.ByteType,
        s"PQ codes must persist as tinyint, got $elem")
      val pm = VecIndex.readPqMeta(spark, path)
      assert(pm.m == 16 && pm.kCodes == 256 && pm.dims == 64
        && pm.trainMod == 5L && pm.kEff >= 1 && pm.kEff <= 256)
      // serving: every verbatim re-ingest probe must find its original
      // at rank 1 (identical vector → identical bands → candidate;
      // exact re-rank puts cosine 1.0 first)
      val out = VecIndex.annProbeVecIndex(spark, probes, "vec_id",
        "embedding", path)
      val rank1 = out.filter(col("rank") === 1).collect()
        .map(r => r.getLong(0) -> r.getAs[Long]("neighbor_id")).toMap
      val expected = base.filter(col("vec_id") % 17 === 0)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      expected.foreach { id =>
        assert(rank1.get(id + 900000L).contains(id),
          s"probe ${id + 900000L} should top-rank $id, got ${rank1.get(id + 900000L)}")
      }
      // the ADC join ships the m-byte codes — never a widened vector —
      // on the corpus side (the s25 payload-pin discipline)
      val joins = out.queryExecution.analyzed.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }
      val codesPayloads = joins.flatMap(_.output.filter(_.name == "codes"))
      assert(codesPayloads.nonEmpty, "ADC join carries no codes payload?")
      codesPayloads.foreach { a =>
        val et = a.dataType
          .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
        assert(et == org.apache.spark.sql.types.ByteType,
          s"ADC join payload must be tinyint codes, got $et")
      }
      // refresh: a post-sidecar append is undiscoverable through the PQ
      // tier until refreshPqSidecar encodes it with the FROZEN books
      val extra = base.filter(col("vec_id") % 17 === 0)
        .withColumn("vec_id", col("vec_id") + 700000L)
      VecIndex.appendToVecIndex(extra, "vec_id", "embedding", path)
      assert(VecIndex.refreshPqSidecar(spark, path)
        == expected.size.toLong)
      assert(VecIndex.refreshPqSidecar(spark, path) == 0L) // idempotent
      val out2 = VecIndex.annProbeVecIndex(spark, probes, "vec_id",
        "embedding", path)
      val top2 = out2.filter(col("rank") <= 2).collect()
        .groupBy(_.getLong(0)).view
        .mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
      expected.foreach { id =>
        assert(top2(id + 900000L) == Set(id, id + 700000L),
          s"probe ${id + 900000L} top-2 should be both verbatim copies")
      }
    } finally delete(dir)
  }

  test("probe reads prune to the probe batch's hash directories") {
    val dir = java.nio.file.Files.createTempDirectory("graft-vecidx-prune")
    try {
      val path = s"$dir/idx"
      // pruning is visible only when nBuckets ≫ the probe's cell count
      // (one probe = bands·(bits+1) = 72 cells; 256 dirs ⇒ ≤72 read)
      VecIndex.writeVecIndex(base, "vec_id", "embedding", path,
        bands = 8, bitsPerBand = 8, nBuckets = 256)
      val one = probes.limit(1)
      val out = VecIndex.probeVecIndex(spark, one, "vec_id", "embedding",
        path, 900000L)
      // collect() (not count()) so the metrics land on THIS DataFrame's
      // own QueryExecution — count() plans a separate aggregate query
      assert(out.collect().length == 1, "the planted probe finds its original")
      // the executed band scan's own numFiles metric must be below the
      // store total (the PartitionPruningSpec discipline; descend into
      // AQE's final plan — completed stages are leaf nodes)
      def scansIn(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
        p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            scansIn(a.executedPlan)
          case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            scansIn(s.plan)
          case f: org.apache.spark.sql.execution.FileSourceScanExec
              if f.metadata.getOrElse("Location", "").contains("bands") =>
            Seq(f)
          case other => other.children.flatMap(scansIn)
        }
      val scans = scansIn(out.queryExecution.executedPlan)
      assert(scans.nonEmpty, "band scan missing from the probe plan")
      val allFiles = spark.read.parquet(s"$path/bands")
        .select(input_file_name()).distinct().count()
      scans.foreach { f =>
        val read = f.metrics("numFiles").value
        assert(read > 0 && read < allFiles,
          s"probe must prune: read $read of $allFiles band files")
      }
    } finally delete(dir)
  }

  private def delete(dir: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    scala.util.Using.resource(java.nio.file.Files.walk(dir))(
      _.iterator().asScala.toSeq).reverse.foreach(java.nio.file.Files.delete)
  }
}
