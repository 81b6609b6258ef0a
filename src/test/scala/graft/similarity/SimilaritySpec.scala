package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Persisted IVF index: layout, pruning, and agreement with the
  * in-memory probe path.
  */
class IvfIndexSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("persisted index: partition layout prunes; results equal in-memory probe") {
    val base = java.nio.file.Files.createTempDirectory("graft-ivfidx")
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = Similarity.ivfCentroids(16, 64)
    Similarity.writeIvfIndex(emb, "vec_id", "embedding", s"$base/idx", cents)

    // layout: one directory per non-empty coarse list
    val dirs = new java.io.File(s"$base/idx").listFiles()
      .filter(_.getName.startsWith("centroid_id=")).map(_.getName).toSet
    assert(dirs.nonEmpty && dirs.subsetOf(
      (0 until 16).map(c => s"centroid_id=$c").toSet))

    // pruning: a list-filtered scan carries a PartitionFilters entry on
    // centroid_id — the directory-level skip that makes a probe touch
    // only its lists at 100 TB
    val pruned = spark.read.parquet(s"$base/idx")
      .filter(col("centroid_id") === 3)
    val plan = pruned.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters") &&
      plan.contains("centroid_id"), plan.take(800))

    // agreement: index-backed probe == in-memory probe on the same centroids
    val queries = emb.filter(col("vec_id") % 25 === 0)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val fromIndex = key(Similarity.ivfTopKFromIndex(
      spark, queries, "vec_id", "embedding", s"$base/idx", 3, cents))
    val inMemory = key(Similarity.ivfTopKProbeWith(
      emb, "vec_id", "embedding", 3, cents,
      queryFilter = col("vec_id") % 25 === 0))
    assert(fromIndex == inMemory)
  }

  test("index append: old ∪ new probe-identical to a full rebuild") {
    val base = java.nio.file.Files.createTempDirectory("graft-ivfapp")
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = Similarity.ivfCentroids(16, 64)
    val old = emb.filter(col("vec_id") % 2 === 0)
    val fresh = emb.filter(col("vec_id") % 2 === 1)

    Similarity.writeIvfIndex(old, "vec_id", "embedding", s"$base/inc", cents)
    // the stored centroids round-trip exactly — appends reuse them
    assert(Similarity.readIvfCentroids(spark, s"$base/inc") == cents)
    Similarity.appendToIvfIndex(fresh, "vec_id", "embedding", s"$base/inc")

    Similarity.writeIvfIndex(emb, "vec_id", "embedding", s"$base/full", cents)
    // the _centroids sidecar is invisible to a plain index scan
    val cols = spark.read.parquet(s"$base/inc").columns.toSet
    assert(cols == Set("vec_id", "qv", "centroid_id"))
    assert(spark.read.parquet(s"$base/inc").count() ==
      spark.read.parquet(s"$base/full").count())

    val queries = emb.filter(col("vec_id") % 25 === 0)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val incremental = key(Similarity.ivfTopKFromIndex(
      spark, queries, "vec_id", "embedding", s"$base/inc", 3, cents))
    val rebuilt = key(Similarity.ivfTopKFromIndex(
      spark, queries, "vec_id", "embedding", s"$base/full", 3, cents))
    assert(incremental == rebuilt)

    // index-aware compaction preserves everything that makes it an
    // index: sidecar centroids, centroid_id= partition layout, results
    Similarity.compactIvfIndex(spark, s"$base/inc")
    assert(Similarity.readIvfCentroids(spark, s"$base/inc") == cents,
      "compaction must rewrite the _centroids sidecar")
    assert(new java.io.File(s"$base/inc").listFiles()
      .exists(_.getName.startsWith("centroid_id=")),
      "compaction must keep the partition layout")
    val afterCompact = key(Similarity.ivfTopKFromIndex(
      spark, queries, "vec_id", "embedding", s"$base/inc", 3, cents))
    assert(afterCompact == rebuilt)
  }

  test("chaos: append → crash mid-compact → restore → append → probe stays rebuild-identical") {
    // s7 gates the happy path; this drives the TRAINED index through the
    // failure windows the lifecycle code claims to survive, asserting
    // probe-identity to a from-scratch rebuild after every step.
    val base = java.nio.file.Files.createTempDirectory("graft-ivfchaos")
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val idx = s"$base/idx"
    val slice = (m: Int) => emb.filter(col("vec_id") % 4 === m)
    val queries = emb.filter(col("vec_id") % 25 === 0)
    val cents = Similarity.trainIvfCentroids(slice(0), "vec_id", "embedding", 8)

    def probe() = Similarity.ivfTopKFromIndex(
        spark, queries, "vec_id", "embedding", idx, 3,
        Similarity.readIvfCentroids(spark, idx), nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    def rebuildProbe(upTo: Int) = {
      val all = emb.filter(col("vec_id") % 4 <= upTo)
      val full = s"$base/rebuild$upTo"
      Similarity.writeIvfIndex(all, "vec_id", "embedding", full, cents)
      Similarity.ivfTopKFromIndex(spark, queries, "vec_id", "embedding",
          full, 3, cents, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    }

    Similarity.writeIvfIndex(slice(0), "vec_id", "embedding", idx, cents)
    Similarity.appendToIvfIndex(slice(1), "vec_id", "embedding", idx)
    assert(probe() == rebuildProbe(1), "after first append")

    // CRASH WINDOW 1 — compactIvfIndex died after the partition-preserving
    // rewrite but before re-writing the in-dir sidecar: `_centroids` is
    // GONE and only the sibling backup survives. Reproduce the window by
    // running exactly the steps compactIvfIndex takes up to the crash.
    import spark.implicits._
    val backup = java.nio.file.Paths.get(s"$base/idx__centroids_backup")
    cents.toDF("centroid_id", "qv").coalesce(1)
      .write.mode("overwrite").parquet(backup.toString)
    graft.pipeline.StoreMaintenance.compact(
      spark, idx, targetBytes = 64 * 1024, partitionBy = Seq("centroid_id"))
    assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$idx/_centroids")),
      "precondition: the crash window really loses the in-dir sidecar")
    // recovery path: readIvfCentroids restores the sidecar from the backup
    assert(Similarity.readIvfCentroids(spark, idx) == cents,
      "centroids must survive a crash mid-compact via the sibling backup")
    assert(probe() == rebuildProbe(1), "after crashed compaction + restore")

    // appends keep working against the restored sidecar
    Similarity.appendToIvfIndex(slice(2), "vec_id", "embedding", idx)
    assert(probe() == rebuildProbe(2), "append after restore")

    // CRASH WINDOW 2 — the compact swap itself died with the store moved
    // aside (path absent): recoverInterruptedCompaction must bring the
    // index back, sidecar backup intact, before the next append.
    val p = java.nio.file.Paths.get(idx)
    java.nio.file.Files.move(p, p.resolveSibling("idx__compact_old"))
    graft.pipeline.StoreMaintenance.recoverInterruptedCompaction(idx)
    assert(java.nio.file.Files.exists(p), "store restored from aside dir")
    assert(probe() == rebuildProbe(2), "after interrupted-swap recovery")

    // a clean compaction after all that chaos: still rebuild-identical
    Similarity.compactIvfIndex(spark, idx, targetBytes = 64 * 1024)
    Similarity.appendToIvfIndex(slice(3), "vec_id", "embedding", idx)
    assert(probe() == rebuildProbe(3), "final append after clean compact")
    assert(Similarity.readIvfCentroids(spark, idx) == cents)
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.5f)),
    (1L, Array(0.9f, 0.1f, 0.0f, 0.4f)),   // near vec 0
    (2L, Array(-1.0f, 0.2f, 0.8f, -0.5f)), // far from vec 0
    (3L, Array(1.0f, 0.0f, 0.0f, 0.5f)))   // identical to vec 0

  test("quantize + dot are exact integer operations") {
    val df = vecs.toDF("vec_id", "embedding")
      .select(Similarity.quantize(col("embedding")).as("q"))
    val q0 = df.as[Seq[Long]].head()
    assert(q0 == Seq(1000L, 0L, 0L, 500L))

    // non-finite elements must degrade like Spark's round+cast (NaN→0,
    // ±Inf→Long.Min/Max), never throw — one corrupt embedding element
    // must not abort a corpus job
    val dirty = Seq((1L, Seq(Float.NaN, Float.PositiveInfinity,
        Float.NegativeInfinity, 0.25f)))
      .toDF("vec_id", "embedding")
      .select(Similarity.quantize(col("embedding")).as("q"))
      .as[Seq[Long]].head()
    assert(dirty == Seq(0L, Long.MaxValue, Long.MinValue, 250L), dirty)
  }

  test("brute-force top-k ranks the identical vector first, excludes self") {
    val df = vecs.toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(
        df.filter(col("vec_id") === 0), df, "vec_id", "embedding", 3)
      .orderBy("rank").collect()
    assert(top.forall(_.getAs[Long]("neighbor_id") != 0L))
    assert(top(0).getAs[Long]("neighbor_id") == 3L) // identical → cosine 1
    assert(top(0).getAs[Double]("cosine") === 1.0)
    assert(top(1).getAs[Long]("neighbor_id") == 1L) // near second
  }

  test("random projection: deterministic ±1 matrix; real structure survives, noise doesn't have to") {
    val m = Similarity.rademacherMatrix(4, 8)
    assert(m.length == 4 && m.forall(_.length == 8))
    assert(m.flatten.forall(v => v == 1L || v == -1L))
    assert(m.flatten.toSeq == Similarity.rademacherMatrix(4, 8).flatten.toSeq)
    // a near-identical twin stays the projected-space top-1 even at 4×
    // compression — JL preserves STRUCTURE; the s13 gate's low recall
    // on the synthetic corpus reflects noise-level neighbors, not a
    // broken projection
    val base = Array.tabulate(64)(j => math.sin(j * 1.7).toFloat)
    val twin = base.clone(); twin(0) = twin(0) + 0.01f
    val far = Array.tabulate(64)(j => math.cos(j * 2.3).toFloat)
    val df = Seq((1L, base), (2L, twin), (3L, far),
      (4L, Array.tabulate(64)(j => math.sin(j * 0.9).toFloat)))
      .toDF("vec_id", "embedding")
    val proj = Similarity.randomProjection(df, "vec_id", "embedding", 16, 64)
    val top = Similarity.topKFromQuantized(
      proj.filter(col("vec_id") === 1L)
        .select(col("vec_id").as("query_id"), col("pv").as("qv")),
      proj.select(col("vec_id").as("neighbor_id"), col("pv").as("cv")), 3)
      .orderBy("rank").collect()
    assert(top(0).getAs[Long]("neighbor_id") == 2L,
      s"twin must stay top-1 after projection, got ${top.toSeq}")
    assert(top(0).getAs[Double]("cosine") > 0.99)
    // projection is partition-independent (pure scan-stage expression)
    def pvs(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("vec_id").collect()
        .map(r => r.getSeq[Long](r.fieldIndex("pv")).toList).toSeq
    assert(pvs(Similarity.randomProjection(df.repartition(3), "vec_id",
      "embedding", 16, 64)) == pvs(proj))
  }

  test("MMR diversification demotes the clone a plain top-k would keep") {
    val mvecs = Seq(
      (100L, Array(1.0f, 0.0f, 0.0f, 0.0f)),   // the query
      (1L, Array(0.9f, 0.43f, 0.0f, 0.0f)),    // most relevant
      (2L, Array(0.89f, 0.44f, 0.0f, 0.0f)),   // near-clone of 1 (sim ≈ 1)
      (3L, Array(0.6f, -0.8f, 0.0f, 0.0f)))    // less relevant, diverse
      .toDF("vec_id", "embedding")
    val pool = Similarity.bruteForceTopK(
      mvecs.filter(col("vec_id") === 100L), mvecs, "vec_id", "embedding", 3)
    // relevance alone ranks the clone second…
    assert(pool.orderBy("rank").collect().map(_.getAs[Long]("neighbor_id"))
      .toSeq == Seq(1L, 2L, 3L))
    // …MMR (λ=½) puts the diverse doc second and the clone last
    val mmr = Similarity.mmrDiversify(pool, mvecs, "vec_id", "embedding", 3)
      .orderBy("mmr_rank").collect()
    assert(mmr.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(1L, 3L, 2L))
    // rank-1 score is plain relevance; the clone's final score carries
    // the redundancy penalty (negative: sim to pick 1 exceeds relevance)
    assert(mmr(0).getAs[Double]("mmr_score") > 0.9)
    assert(mmr(2).getAs[Double]("mmr_score") < 0.0)
  }

  test("MMR keeps a pool candidate whose vector is absent from corpus pickable") {
    val mvecs = Seq(
      (100L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.43f, 0.0f, 0.0f)),
      (2L, Array(0.89f, 0.44f, 0.0f, 0.0f)),
      (3L, Array(0.6f, -0.8f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val pool = Similarity.bruteForceTopK(
      mvecs.filter(col("vec_id") === 100L), mvecs, "vec_id", "embedding", 3)
    // drop candidate 3's vector from the corpus the re-ranker sees:
    // it must still be selectable (maxsim = 0 → pure relevance), not
    // silently vanish from rounds ≥ 2
    val partial = mvecs.filter(col("vec_id") =!= 3L)
    val mmr = Similarity.mmrDiversify(pool, partial, "vec_id", "embedding", 3)
      .orderBy("mmr_rank").collect()
    val picked = mmr.map(_.getAs[Long]("neighbor_id")).toSeq
    assert(picked.contains(3L), s"vectorless candidate dropped: $picked")
    assert(picked.size == 3, s"pool of 3 must fill all 3 ranks: $picked")
    // with maxsim=0 its score is pure relevance → it beats the penalized clone
    assert(picked == Seq(1L, 3L, 2L), s"unexpected order $picked")
  }

  test("cosine near-dup pairs pass the exact integer threshold test") {
    val df = vecs.toDF("vec_id", "embedding")
    val pairs = Similarity.cosineNearDupPairs(df, "vec_id", "embedding", 990000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 3L))) // identical pair → cosine 1 ≥ 0.99
    assert(!pairs.contains((0L, 2L)))
  }

  test("banded multi-probe pairs: exact precision, dominant recall, planted dup found") {
    // plant an exact duplicate under a fresh id — hamming 0 in every band,
    // so the banded blocking must ALWAYS propose it
    val base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val emb = base.unionByName(base.filter(col("vec_id") === 40L)
      .withColumn("vec_id", lit(990000L)))
    def pairSet(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = Similarity.cosineNearDupPairsBanded(emb, "vec_id",
      "embedding", 400000L, bands = 8, bitsPerBand = 8, probe1 = true)
    val bandedRows = banded.collect()
    val bandedPairs = bandedRows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bandedPairs.contains((40L, 990000L)), "planted dup must be found")
    assert(bandedRows.length == bandedPairs.size, "no duplicate pair rows")
    assert(bandedPairs.forall { case (a, b) => a < b }, "canonical id order")
    // precision is EXACT: every emitted pair passes the integer threshold
    // test, replayed locally over the quantized vectors
    val qv = emb.select(col("vec_id"), Similarity.quantize(col("embedding")))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.lazyZip(b).map(_ * _).sum
    def above(a: Long, b: Long): Boolean = {
      val d = dot(qv(a), qv(b))
      d > 0 && BigInt(d) * BigInt(d) * BigInt(1000000L) * BigInt(1000000L) >=
        BigInt(dot(qv(a), qv(a))) * BigInt(dot(qv(b), qv(b))) *
          BigInt(400000L) * BigInt(400000L)
    }
    bandedRows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(above(a, b), s"($a,$b) below threshold — precision broken")
      assert(r.getLong(2) == dot(qv(a), qv(b)), "dot_q must be the exact dot")
    }
    // recall: against the local brute-force pair set, the banded blocking
    // strictly dominates the single sign bucket and clears 50% here
    val ids = qv.keys.toSeq.sorted
    val exact = (for {
      i <- ids.indices.iterator; j <- (i + 1) until ids.size
      if above(ids(i), ids(j))
    } yield (ids(i), ids(j))).toSet
    val plain = pairSet(Similarity.cosineNearDupPairs(emb, "vec_id",
      "embedding", 400000L, bits = 8))
    val rb = (bandedPairs & exact).size.toDouble / exact.size
    val rp = (plain & exact).size.toDouble / exact.size
    assert(rb > rp, f"banded recall $rb%.2f must beat single-band $rp%.2f")
    assert(rb >= 0.5, f"banded recall $rb%.2f unexpectedly low")
    // the 1-bit probe only ever ADDS candidates
    val noProbe = pairSet(Similarity.cosineNearDupPairsBanded(emb, "vec_id",
      "embedding", 400000L, bands = 8, bitsPerBand = 8, probe1 = false))
    assert(noProbe.subsetOf(bandedPairs), "probe must be candidate-additive")
  }

  test("knn graph: planted dup is its twin's rank-1; ranks dense; directions kept") {
    val base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val emb = base.unionByName(base.filter(col("vec_id") === 40L)
      .withColumn("vec_id", lit(990000L)))
    val g = Similarity.knnGraphBanded(emb, "vec_id", "embedding", k = 3,
      bands = 8, bitsPerBand = 8, probe1 = true).collect()
    val byNode = g.groupBy(_.getAs[Long]("node_id"))
    // the identical pair ranks each other first, in BOTH directions
    def rank1(node: Long) = byNode(node)
      .find(_.getAs[Int]("rank") == 1).get.getAs[Long]("neighbor_id")
    assert(rank1(40L) == 990000L && rank1(990000L) == 40L)
    // ranks are dense 1..deg≤k per node; no self edges; no dup neighbors
    byNode.foreach { case (node, rows) =>
      assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq ==
        (1 to rows.length), s"ranks not dense for $node")
      assert(rows.length <= 3)
      val nbrs = rows.map(_.getAs[Long]("neighbor_id"))
      assert(!nbrs.contains(node) && nbrs.distinct.length == nbrs.length)
    }
  }

  test("IVF: identical vectors share a centroid list; top-k finds the twin") {
    val df = vecs.toDF("vec_id", "embedding")
    val assigned = Similarity.ivfAssign(
      df.select(col("vec_id"), Similarity.quantize(col("embedding")).as("qv")),
      "vec_id", "qv", Similarity.ivfCentroids(16, 4))
    val byId = assigned.collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("centroid_id")).toMap
    assert(byId(0L) == byId(3L)) // identical vectors → same list
    assert(assigned.count() == 4) // every vector assigned exactly once

    val top = Similarity.ivfTopK(df, "vec_id", "embedding", 2, 16, 4)
      .filter(col("query_id") === 0).orderBy("rank").collect()
    assert(top.nonEmpty && top(0).getAs[Long]("neighbor_id") == 3L)
  }

  test("sign bucket groups sign-identical vectors") {
    val df = vecs.toDF("vec_id", "embedding").select(col("vec_id"),
      Similarity.signBucket(Similarity.quantize(col("embedding")), 4).as("b"))
    val b = df.orderBy("vec_id").as[(Long, Int)].collect().map(_._2)
    assert(b(0) == b(3) && b(0) != b(2))
  }

  test("multi-probe IVF: recall vs brute force improves with nprobe") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val isQuery = col("vec_id") % 20 === 0
    def topkSet(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val bf = topkSet(Similarity.bruteForceTopK(
      emb.filter(isQuery), emb, "vec_id", "embedding", 5))
    def recall(nprobe: Int): Double = {
      val got = topkSet(Similarity.ivfTopKProbe(emb, "vec_id", "embedding", 5,
        nprobe = nprobe, queryFilter = isQuery))
      (bf & got).size.toDouble / bf.size
    }
    val r1 = recall(1); val r4 = recall(4); val r16 = recall(16)
    assert(r4 >= r1, s"recall must not drop with more probes: $r1 -> $r4")
    assert(r16 >= r4, s"recall must not drop with more probes: $r4 -> $r16")
    // probing ALL 16 lists IS brute force (minus nothing): exact recall
    assert(r16 == 1.0, s"nprobe=16 of 16 lists must be exhaustive, got $r16")
    // 0.4, not the old 0.5: the unnormalized centroids this was first
    // calibrated against degenerated into one near-corpus-sized list, so
    // probing it was covert brute force (high recall, quadratic cost).
    // Equal-norm centroids prune for real, and on UNIFORM vectors (no
    // cluster structure — the hardest case for IVF) recall at 4/16
    // probed tracks the scanned fraction plus direction correlation;
    // measured 0.48 here. Exhaustiveness at nprobe=k is asserted above.
    assert(r4 >= 0.4, s"nprobe=4 recall unexpectedly low: $r4")
  }

  test("trained IVF centroids: deterministic and BALANCED lists (bounded probe cost)") {
    // measured on sf0.01 (500 vecs, k=16): random md5 centroids leave a
    // 208-vector list (42% of the corpus in ONE cell — a probe of it is
    // nearly a scan); trained lists max out near the mean (41 vs mean
    // ~31). Balance, not recall at equal nprobe, is what training buys:
    // it bounds the per-probe scan at scale.
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val k = 16
    val trained = Similarity.trainIvfCentroids(emb, "vec_id", "embedding", k, iterations = 3)
    val trained2 = Similarity.trainIvfCentroids(emb, "vec_id", "embedding", k, iterations = 3)
    assert(trained == trained2, "training must be deterministic")
    assert(trained.size == k && trained.forall(_._2.size == 64))

    val q = emb.select(col("vec_id").as("id"),
      Similarity.quantize(col("embedding")).as("qv"))
    def listSizes(cents: Seq[(Int, Seq[Long])]) =
      Similarity.ivfAssign(q, "id", "qv", cents)
        .groupBy("centroid_id").count().collect().map(_.getLong(1))
    val n = emb.count()
    val mean = n.toDouble / k
    val trainedSizes = listSizes(trained)
    val randomSizes = listSizes(Similarity.ivfCentroids(k, 64))
    assert(trainedSizes.max <= 2 * mean,
      s"trained lists must be balanced: max=${trainedSizes.max} mean=$mean")
    assert(trainedSizes.max < randomSizes.max,
      s"training must shrink the largest list: ${trainedSizes.max} vs ${randomSizes.max}")

    // and the search path still works end-to-end on trained centroids
    val isQuery = col("vec_id") % 20 === 0
    def topkSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val bf = topkSet(Similarity.bruteForceTopK(
      emb.filter(isQuery), emb, "vec_id", "embedding", 5))
    val got = topkSet(Similarity.ivfTopKProbeWith(emb, "vec_id", "embedding", 5,
      trained, nprobe = 4, queryFilter = isQuery))
    val recall = (bf & got).size.toDouble / bf.size
    assert(recall >= 0.5, s"trained nprobe=4 recall too low: $recall")

    // the one-call production path (train + search) matches the composed
    // form exactly — same centroids, same ranking
    val oneCall = topkSet(Similarity.ivfTrainedTopK(emb, "vec_id", "embedding", 5,
      nCentroids = k, nprobe = 4, queryFilter = isQuery, iterations = 3))
    assert(oneCall == got, "ivfTrainedTopK must equal train+searchWith composition")

    // nprobe=1 search over explicit centroids: the With variant matches
    // the md5-default ivfTopK when handed the same md5 centroids
    val viaWith = Similarity.ivfTopKWith(emb, "vec_id", "embedding", 3,
      Similarity.ivfCentroids(16, 64)).collect().map(_.toString).sorted
    val viaDefault = Similarity.ivfTopK(emb, "vec_id", "embedding", 3)
      .collect().map(_.toString).sorted
    assert(viaWith.sameElements(viaDefault))
  }

  test("ivfAssign is a pure projection: no Exchange in the plan") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val assigned = Similarity.ivfAssign(
      emb.select(col("vec_id"), Similarity.quantize(col("embedding")).as("qv")),
      "vec_id", "qv", Similarity.ivfCentroids(16, 64))
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(assigned.count() == emb.count())
  }

  test("blocking parameters scale with corpus size; pinned at oracle scales") {
    // the driver's verification corpora (sf0.001: 50, sf0.01: 500 vectors)
    // must produce EXACTLY the oracle SQL's constants (8 bits, 16 lists)
    for (n <- Seq(50L, 500L, 5000L)) assert(Similarity.scaledBits(n) == 8, s"n=$n")
    for (n <- Seq(50L, 500L)) assert(Similarity.scaledCentroids(n) == 16, s"n=$n")
    // growth: more corpus → more blocking cells, monotonic, capped
    assert(Similarity.scaledBits(1L << 20) == 14)
    assert(Similarity.scaledBits(1000000000L) == 24)
    assert(Similarity.scaledCentroids(1000000L) == 1000)
    assert(Similarity.scaledCentroids(Long.MaxValue / 4) == 65536)
    val sizes = Seq(100L, 10000L, 1000000L, 100000000L)
    assert(sizes.map(Similarity.scaledBits(_)) == sizes.map(Similarity.scaledBits(_)).sorted)
    assert(sizes.map(Similarity.scaledCentroids(_).toLong) ==
      sizes.map(Similarity.scaledCentroids(_).toLong).sorted)
    // bucket-count growth is real on data: more bits → at least as many
    // distinct sign buckets
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def buckets(bits: Int) = emb.select(
      Similarity.signBucket(Similarity.quantize(col("embedding")), bits).as("b"))
      .distinct().count()
    assert(buckets(12) >= buckets(8))
    assert(buckets(8) > 1)
  }

  test("contrastivePairs: twin is the rank-1 positive; negatives hard, capped, margin excluded") {
    val base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val emb = base.unionByName(base.filter(col("vec_id") === 40L)
      .withColumn("vec_id", lit(990000L)))
    val rows = Similarity.contrastivePairs(emb, "vec_id", "embedding",
      kPos = 2, kNeg = 3, posFloorPpm = 900000L, negCeilPpm = 400000L,
      bands = 8, bitsPerBand = 8).collect()
    val byAnchor = rows.groupBy(r => (r.getAs[Long]("anchor_id"),
      r.getAs[String]("role")))
    // the planted twin is its anchor's rank-1 positive, both directions
    def pos1(a: Long) = byAnchor((a, "pos"))
      .find(_.getAs[Int]("rank") == 1).get.getAs[Long]("pair_id")
    assert(pos1(40L) == 990000L && pos1(990000L) == 40L)
    // class contracts: every positive ≥ 0.9, every negative < 0.4 (or
    // null-cosine), nothing from the margin band survives
    rows.foreach { r =>
      val c = Option(r.getAs[java.lang.Double]("cosine")).map(_.toDouble)
      if (r.getAs[String]("role") == "pos")
        assert(c.exists(_ >= 0.899), s"weak positive: $r")
      else assert(c.forall(_ < 0.401), s"soft negative: $r")
    }
    // caps + dense ranks per (anchor, role)
    byAnchor.foreach { case ((_, role), rs) =>
      assert(rs.length <= (if (role == "pos") 2 else 3))
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rs.length))
    }
    // hard negatives: each anchor's negatives are its HIGHEST sub-0.4
    // cosines — rank order must be non-increasing
    byAnchor.collect { case ((_, "neg"), rs) if rs.length > 1 =>
      val ordered = rs.sortBy(_.getAs[Int]("rank"))
        .flatMap(r => Option(r.getAs[java.lang.Double]("cosine")))
        .map(_.toDouble)
      assert(ordered.zip(ordered.tail).forall { case (x, y) => x >= y })
    }
  }

  test("groupCentroidCosines: parallel centroids hit 1.0, orthogonal 0.0; g1<g2 half-matrix") {
    // a: two copies of e1 (centroid ∥ e1); b: one 2·e1 (parallel to a,
    // different scale — cosine must still be exactly 1.0); c: e2.
    val df = Seq(
      (0L, "a", Array(1.0f, 0.0f)), (1L, "a", Array(1.0f, 0.0f)),
      (2L, "b", Array(2.0f, 0.0f)),
      (3L, "c", Array(0.0f, 1.0f)), (4L, "c", Array(0.0f, 3.0f))
    ).toDF("id", "src", "embedding")
    val out = Similarity.groupCentroidCosines(df, "src", "embedding")
      .orderBy("g1", "g2").collect()
      .map(r => (r.getAs[String]("g1"), r.getAs[String]("g2"),
        r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
        r.getAs[Double]("cosine"))).toSeq
    assert(out.map(t => (t._1, t._2)) ==
      Seq(("a", "b"), ("a", "c"), ("b", "c")), "strict upper triangle")
    val m = out.map(t => (t._1, t._2) -> t._5).toMap
    assert(m(("a", "b")) == 1.0, "parallel centroids, scale-invariant")
    assert(m(("a", "c")) == 0.0 && m(("b", "c")) == 0.0)
    assert(out.head._3 == 2L && out.head._4 == 1L, "vector counts carried")
    // partition independence
    val re = Similarity.groupCentroidCosines(df.repartition(5), "src",
        "embedding")
      .orderBy("g1", "g2").collect().map(_.getAs[Double]("cosine")).toSeq
    assert(re == out.map(_._5))
  }

  test("PQ: a corpus of ≤kCodes distinct patterns reconstructs exactly " +
      "— recall 10⁶ ppm; codebooks are partition-independent") {
    // 16 distinct orthogonal-ish patterns, each repeated: Lloyd gives
    // every pattern its own codeword in every subspace, reconstruction
    // is EXACT, so the ADC ranking equals the exact ranking
    val pats = (0 until 16).map { p =>
      (0 until 64).map(d => if (d % 16 == p) 0.9f else 0.01f * p)
    }
    val df = (0L until 48L).map(i =>
      (i, pats((i % 16).toInt))).toDF("vec_id", "embedding")
    val out = Similarity.pqRecallAudit(df, "vec_id", "embedding",
        m = 8, kCodes = 16, iterations = 2, k = 5, sampleMod = 4L)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("recall_ppm") == 1000000L,
        s"exact-reconstruction corpus must have perfect recall: $r")
      assert(r.getAs[Long]("short_recall_ppm") == 1000000L)
    }
    // training is deterministic and partition-count independent
    val b1 = Similarity.trainPqCodebooks(df, "vec_id", "embedding",
      m = 8, kCodes = 16, iterations = 2)
    val b7 = Similarity.trainPqCodebooks(df.repartition(7), "vec_id",
      "embedding", m = 8, kCodes = 16, iterations = 2)
    assert(b1 == b7, "codebooks must not depend on partitioning")
  }

  test("int8FromMilli saturates out-of-range coordinates instead of wrapping") {
    // unit-norm input keeps |x| ≤ 1000 and the clamp is a no-op; a
    // direct caller feeding un-normalized vectors must get ±127, never
    // a silent tinyint wrap in the store encode
    val df = Seq((1L, Seq(1000L, -1000L, 1500L, -2300L, 0L, 999L)))
      .toDF("id", "qv")
    val out = df.select(Similarity.int8FromMilli("qv").as("c"))
      .head().getSeq[Long](0)
    assert(out == Seq(127L, -127L, 127L, -127L, 0L, 127L), s"got $out")
  }

  test("PQ kEff: a corpus smaller than kCodes trains a consistent " +
      "sub-kCodes code space (flat stride follows the trained size)") {
    // 12 rows < kCodes=16 ⇒ kEff=12 codewords per subspace; 3 distinct
    // patterns still reconstruct exactly, so recall stays 10⁶ ppm — a
    // j·kCodes stride against a 12-word book would index the wrong
    // codewords and fail this
    val pats = (0 until 3).map { p =>
      (0 until 64).map(d => if (d % 4 == p) 0.8f else 0.05f * p)
    }
    val df = (0L until 12L).map(i =>
      (i, pats((i % 3).toInt))).toDF("vec_id", "embedding")
    val out = Similarity.pqRecallAudit(df, "vec_id", "embedding",
        m = 8, kCodes = 16, iterations = 2, k = 3, sampleMod = 3L)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("recall_ppm") == 1000000L,
        s"sub-kCodes code space must still reconstruct exactly: $r")
    }
  }
}
