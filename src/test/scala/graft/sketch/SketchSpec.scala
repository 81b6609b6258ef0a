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
    val merged = Sketch.kmvSketch(a, "s", k).unionAll(Sketch.kmvSketch(b, "s", k))
      .distinct().orderBy("h").limit(k).as[Long].collect().toSeq
    val direct = Sketch.kmvSketch(a.unionAll(b), "s", k).as[Long].collect().toSeq
    assert(merged == direct)
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
}
