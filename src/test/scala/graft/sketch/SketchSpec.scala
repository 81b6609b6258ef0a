package graft.sketch

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("KMV estimate: exact below k, within ~25% above k, deterministic") {
    val small = spark.range(0, 40).select(concat(lit("v"), col("id")).as("s"))
    val rSmall = Sketch.kmvEstimate(small, "s", 64).collect().head
    assert(rSmall.getLong(0) == 40 && rSmall.getLong(1) == 40,
      "below k the sketch IS the distinct set")

    val big = spark.range(0, 20000).select(concat(lit("v"), col("id")).as("s"))
      .unionAll(spark.range(0, 5000).select(concat(lit("v"), col("id")).as("s")))
    val est = Sketch.kmvEstimate(big, "s", 256).collect().head.getLong(0)
    assert(math.abs(est - 20000.0) / 20000.0 < 0.25, s"estimate $est vs true 20000")

    val est2 = Sketch.kmvEstimate(big.repartition(13), "s", 256)
      .collect().head.getLong(0)
    assert(est2 == est, "sketch must be partition-independent")
  }

  test("KMV sketches merge: union sketch = k smallest of concatenated sketches") {
    val a = spark.range(0, 3000).select(concat(lit("a"), col("id")).as("s"))
    val b = spark.range(0, 3000).select(concat(lit("b"), col("id")).as("s"))
    val k = 128
    val merged = Sketch.mergeKmvSketches(
      Sketch.kmvSketch(a, "s", k), Sketch.kmvSketch(b, "s", k), k)
      .as[Long].collect().toSeq
    val direct = Sketch.kmvSketch(a.unionAll(b), "s", k).as[Long].collect().toSeq
    assert(merged == direct)
    // accreting in a different batch order lands on the SAME store
    val c = spark.range(0, 500).select(concat(lit("c"), col("id")).as("s"))
    def sk(d: org.apache.spark.sql.DataFrame) = Sketch.kmvSketch(d, "s", k)
    val acc1 = Sketch.mergeKmvSketches(
      Sketch.mergeKmvSketches(sk(a), sk(b), k), sk(c), k).as[Long].collect().toSeq
    val acc2 = Sketch.mergeKmvSketches(
      Sketch.mergeKmvSketches(sk(c), sk(a), k), sk(b), k).as[Long].collect().toSeq
    assert(acc1 == acc2 &&
      acc1 == Sketch.kmvSketch(a.unionAll(b).unionAll(c), "s", k).as[Long].collect().toSeq)
  }

  test("per-group KMV UDAF: one group agrees with the global sketch path") {
    val df = spark.range(0, 5000)
      .select(lit("g").as("g"), concat(lit("v"), col("id")).as("s"))
    val grouped = Sketch.kmvEstimateByGroup(
      df.select(col("g"), Sketch.hash40(col("s")).as("h")), Seq("g"), "h", 64)
      .collect().head
    val global = Sketch.kmvEstimate(df, "s", 64).collect().head
    assert(grouped.getLong(1) == global.getLong(0),
      "single-group UDAF estimate must equal the global KMV estimate")
    assert(grouped.getLong(2) == global.getLong(1))
  }

  test("Misra-Gries: exact below k; heavy hitters survive above k") {
    import org.apache.spark.sql.functions.udaf
    val mg = udaf(Sketch.MisraGriesAggregator(8))
    // exact regime: 5 distinct < k=8 → exact counts, any partitioning
    val small = Seq.tabulate(100)(i => s"t${i % 5}").toDF("t")
    def run(df: org.apache.spark.sql.DataFrame) =
      df.agg(mg(col("t")).as("m")).collect().head
        .getMap[String, Long](0).toMap
    assert(run(small) == (0 until 5).map(i => s"t$i" -> 20L).toMap)
    assert(run(small.repartition(7)) == run(small))

    // heavy-hitter regime: one token at 40% of a 1000-item stream with
    // 100 distinct tail tokens MUST survive (freq > N/(k+1))
    val heavy = (Seq.fill(400)("HOT") ++
      Seq.tabulate(600)(i => s"tail${i % 100}")).toDF("t")
    val got = run(heavy.repartition(5))
    assert(got.contains("HOT"), s"heavy hitter lost: ${got.keySet}")
    // reported count is a lower bound, never an overcount
    assert(got("HOT") <= 400L && got("HOT") > 0L)
    assert(got.size <= 8)
  }

  test("per-group KMV UDAF: partition-independent; exact below k per group") {
    val df = spark.range(0, 1000).select(
      (col("id") % 3).cast("string").as("g"),
      concat(lit("v"), (col("id") % 40).cast("string"),
        lit("-"), (col("id") % 3).cast("string")).as("s"))
    def run(d: org.apache.spark.sql.DataFrame) = Sketch.kmvEstimateByGroup(
      d.select(col("g"), Sketch.hash40(col("s")).as("h")), Seq("g"), "h", 64)
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val got = run(df)
    // 40 distinct values per group, below k=64 → exact
    assert(got.forall { case (_, est, sz) => est == 40 && sz == 40 })
    assert(run(df.repartition(17)) == got, "UDAF must be partition-independent")
  }

  test("CMS: estimates never undercount, are exact sans collision, bounded grid") {
    // 50 distinct tokens with known skewed counts: token i appears i+1 times
    val df = spark.range(0, 50).select(col("id"))
      .withColumn("n", col("id") + 1)
      .select(explode(expr("array_repeat(concat('tok', id), int(n))")).as("t"))
    val depth = 4
    val width = 512
    val sk = Sketch.cmsSketch(df, "t", depth, width)
    // grid is bounded by depth × width whatever the input cardinality
    assert(sk.count() <= depth.toLong * width)
    val exact = df.groupBy(col("t")).agg(count(lit(1)).as("exact_n"))
    val est = Sketch.cmsEstimate(sk, exact, "t", depth, width)
      .collect().map(r => (r.getString(0),
        r.getLong(r.fieldIndex("exact_n")), r.getLong(r.fieldIndex("cms_n"))))
    assert(est.length == 50)
    // one-sided error: min-of-cells can only OVERcount
    assert(est.forall { case (_, ex, cms) => cms >= ex },
      "CMS must never undercount")
    // 50 tokens into 4×512 cells: some row of the grid is collision-free
    // for most tokens, so the min should be exact for nearly all
    val inexact = est.count { case (_, ex, cms) => cms != ex }
    assert(inexact <= 5, s"$inexact of 50 estimates inflated — hash spread broken?")
  }

  test("CMS is partition-independent and merges by construction") {
    val df = spark.range(0, 2000)
      .select(concat(lit("w"), (col("id") % 97).cast("string")).as("t"))
    def grid(d: org.apache.spark.sql.DataFrame) =
      Sketch.cmsSketch(d, "t", 4, 256)
        .orderBy("r", "bucket").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(grid(df) == grid(df.repartition(13)),
      "cell counts are a pure function of the data")
  }

  test("HLL: raw-regime estimate within 3 sigma; partition- and dup-independent") {
    val n = 20000
    val df = spark.range(0, n.toLong)
      .select(lit("g").as("g"), concat(lit("v"), col("id")).as("s"))
    val est = Sketch.hllEstimateByGroup(df, Seq("g"), "s").collect().head
    val rel = math.abs(est.getLong(1) - n.toDouble) / n
    // sigma = 1.04/sqrt(256) = 6.5%; 3 sigma = 19.5%
    assert(rel < 0.195, s"estimate ${est.getLong(1)} vs true $n (rel $rel)")
    assert(est.getLong(2) == 256, "20k values must touch all 256 buckets")

    val est2 = Sketch.hllEstimateByGroup(df.repartition(13), Seq("g"), "s")
      .collect().head.getLong(1)
    assert(est2 == est.getLong(1), "registers are a pure function of the data")
    // max absorbs duplicates: a 3x-duplicated feed lands on the SAME estimate
    val est3 = Sketch.hllEstimateByGroup(
      df.unionAll(df).unionAll(df), Seq("g"), "s").collect().head.getLong(1)
    assert(est3 == est.getLong(1), "duplicate rows must not move the registers")
  }

  test("HLL estimate never overflows at saturated registers (cardinality ≳ 1e10 regime)") {
    // All 256 buckets at the max rho=33 is the smallest possible S (=256):
    // the regime where the old α_ppb·(2^49 DIV S) shape wrapped negative.
    // Feed the register frame directly — generating 1e10 rows is not the point.
    val saturated = spark.range(0, 256)
      .select(lit("g").as("g"), col("id").as("bucket"), lit(33).as("r"))
    val est = Sketch.hllEstimateFromRegisters(saturated, Seq("g"))
      .collect().head
    assert(est.getLong(1) == Sketch.HllAlphaNum / 256,
      s"saturated estimate ${est.getLong(1)} != HllAlphaNum/256")
    assert(est.getLong(1) > 0, "estimate wrapped negative — overflow regression")
    // partial saturation (rho=20) also stays positive and monotone below it
    val partial = spark.range(0, 256)
      .select(lit("g").as("g"), col("id").as("bucket"), lit(20).as("r"))
    val est2 = Sketch.hllEstimateFromRegisters(partial, Seq("g"))
      .collect().head.getLong(1)
    assert(est2 > 0 && est2 < est.getLong(1),
      s"partial-saturation estimate $est2 must be positive and below saturated")
  }

  test("HLL registers merge by cell-wise max; accretion is order-invariant and idempotent") {
    def regs(d: org.apache.spark.sql.DataFrame) =
      Sketch.hllRegistersByGroup(d.select(lit("g").as("g"), col("s")), Seq("g"), "s")
    def asMap(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getLong(1) -> r.getInt(2)).toMap
    val a = spark.range(0, 4000).select(concat(lit("a"), col("id")).as("s"))
    val b = spark.range(0, 4000).select(concat(lit("b"), col("id")).as("s"))
    val direct = asMap(regs(a.unionAll(b)))
    // cell-wise max of the two register stores == registers of the union
    val merged = asMap(
      regs(a).unionByName(regs(b))
        .groupBy("g", "bucket").agg(max(col("r")).as("r")))
    assert(merged == direct, "register merge must be cell-wise max")
    // replaying a batch into the store is a no-op (max is idempotent)
    val replayed = asMap(
      regs(a).unionByName(regs(b)).unionByName(regs(b))
        .groupBy("g", "bucket").agg(max(col("r")).as("r")))
    assert(replayed == direct, "replay must not move the store")
  }

  test("cmsJoinSize: collision-free grids give the exact inner product; always an upper bound") {
    import spark.implicits._
    // A: x×3, y×2, z×1; B: x×2, z×4, w×5 → exact = 3·2 + 1·4 = 10
    val a = (Seq.fill(3)("x") ++ Seq.fill(2)("y") ++ Seq("z")).toDF("k")
    val b = (Seq.fill(2)("x") ++ Seq.fill(4)("z") ++ Seq.fill(5)("w"))
      .toDF("k")
    val wide = Sketch.cmsJoinSize(a, "k", b, "k", 4, 512)
      .collect()(0).getAs[Long]("cms_join_n")
    assert(wide == 10L,
      s"4 distinct keys in 512 buckets must be collision-free: $wide")
    // crush the width → collisions only ADD mass, never subtract
    val narrow = Sketch.cmsJoinSize(a, "k", b, "k", 4, 2)
      .collect()(0).getAs[Long]("cms_join_n")
    assert(narrow >= 10L, s"upper bound violated: $narrow")
    // partition independence
    val re = Sketch.cmsJoinSize(a.repartition(5), "k", b.repartition(3),
      "k", 4, 512).collect()(0).getAs[Long]("cms_join_n")
    assert(re == 10L)
  }

  test("cmsJoinSize: a zero-overlap hash row certifies an empty join (min = 0)") {
    import spark.implicits._
    // disjoint key sets: with 512 buckets the two 2-key grids share no
    // non-empty cell in at least one of the 4 rows — that row's 0 must
    // drive the min to 0 (the exact-empty certificate), not be dropped
    // by an inner join leaving the smallest positive collision mass
    val a = Seq("alpha", "beta").toDF("k")
    val b = Seq("gamma", "delta").toDF("k")
    val est = Sketch.cmsJoinSize(a, "k", b, "k", 4, 512)
      .collect()(0).getAs[Long]("cms_join_n")
    assert(est == 0L, s"disjoint key sets must certify an empty join: $est")
  }

  test("kmvOverlapMatrix: below-k pairs are exact; disjoint sets inter 0") {
    import spark.implicits._
    // |A|=30, |B|=20, |A∩B|=10 — all far below k=256, so the merged
    // sketch IS the union and every estimate must be exact
    val rows = ((1 to 30).map(i => ("a", s"v$i")) ++
      (21 to 40).map(i => ("b", s"v$i")) ++
      (1 to 5).map(i => ("c", s"w$i"))).toDF("g", "s")
      .select(col("g"), Sketch.hash40(col("s")).as("h"))
    val got = Sketch.kmvOverlapMatrix(rows, "g", "h", 256)
      .orderBy("g1", "g2").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val ab = got(("a", "b"))
    assert(ab.getAs[Long]("union_est") == 40L)
    assert(ab.getAs[Long]("inter_k") == 10L
      && ab.getAs[Long]("inter_est") == 10L)
    assert(ab.getAs[Long]("jaccard_ppm_est") == 250000L) // 10/40
    val ac = got(("a", "c"))
    assert(ac.getAs[Long]("inter_k") == 0L
      && ac.getAs[Long]("inter_est") == 0L
      && ac.getAs[Long]("union_est") == 35L)
  }

  test("KMV nesting: a wide sketch sliced to k ≡ the directly-built k sketch (a14's premise)") {
    import spark.implicits._
    val rows = (1 to 3000).map(i => ("g", s"x$i")).toDF("g", "s")
      .select(col("g"), Sketch.hash40(col("s")).as("h"))
    def sketchAt(k: Int) = {
      val agg = udaf(Sketch.KmvAggregator(k))
      rows.groupBy(col("g")).agg(agg(col("h")).as("sk"))
        .select(col("sk")).as[Array[Long]].head().toSeq
    }
    val wide = sketchAt(1024)
    assert(sketchAt(64) == wide.take(64) && sketchAt(256) == wide.take(256))
    // and therefore every a14 tier's pair math from the wide sketch
    // equals the one computed from its own narrow sketch
    val two = ((1 to 3000).map(i => ("a", s"x$i")) ++
      (2001 to 5000).map(i => ("b", s"x$i"))).toDF("g", "s")
      .select(col("g"), Sketch.hash40(col("s")).as("h"))
    val wideAgg = udaf(Sketch.KmvAggregator(1024))
    val skw = two.groupBy(col("g")).agg(wideAgg(col("h")).as("sk"))
    val fromWide = Sketch.kmvOverlapPairsFromSketches(skw, "g", 256)
      .collect()(0).toSeq
    val direct = Sketch.kmvOverlapMatrix(two, "g", "h", 256)
      .collect()(0).toSeq
    assert(fromWide == direct)
  }

  test("kmvOverlapMatrix: above k the union estimate tracks truth and is partition-independent") {
    import spark.implicits._
    // two 3000-element sets sharing 1000 values: union = 5000
    val rows = ((1 to 3000).map(i => ("a", s"x$i")) ++
      (2001 to 5000).map(i => ("b", s"x$i"))).toDF("g", "s")
      .select(col("g"), Sketch.hash40(col("s")).as("h"))
    def run(df: org.apache.spark.sql.DataFrame) =
      Sketch.kmvOverlapMatrix(df, "g", "h", 256).collect()(0)
    val r1 = run(rows.repartition(1))
    val r7 = run(rows.repartition(7))
    assert(r1.toSeq == r7.toSeq, "sketch pair math must not see layout")
    val est = r1.getAs[Long]("union_est")
    assert(math.abs(est - 5000L) < 1000L, // k=256 → σ ≈ 6%: 3σ ≈ 19%
      s"union estimate $est too far from 5000")
    val jac = r1.getAs[Long]("jaccard_ppm_est")
    assert(jac > 80000L && jac < 320000L, // truth 200000 ppm
      s"jaccard estimate $jac too far from 200000")
  }
}
