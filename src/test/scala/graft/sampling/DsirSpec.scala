package graft.sampling

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DsirSpec extends SparkSpec {
  import spark.implicits._

  test("importanceWeights: target-like docs outrank out-of-distribution ones") {
    // target (lang=en): a tight technical register; raw extras: one doc
    // written in the same register (should score HIGH) and one from a
    // disjoint vocabulary (every bigram unseen in the target → its
    // buckets are raw-heavy/target-light → weight strictly lower).
    val en = Seq(
      (1L, "the query plan joins the sorted runs", "en"),
      (2L, "the sorted runs merge into the query plan", "en"),
      (3L, "the plan joins sorted runs with the merge", "en"))
    val raw = Seq(
      (10L, "the query plan joins the sorted runs with the merge", "xx"),
      (11L, "uno dos tres cuatro cinco seis siete ocho nueve", "xx"))
    val df = (en ++ raw).toDF("doc_id", "text", "lang")
    val out = Dsir.importanceWeights(df, "doc_id", "text",
        col("lang") === "en", 64)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("weight"), r.getAs[Long]("n_bigrams"))).toMap
    assert(out(10L)._1 > out(11L)._1,
      s"in-register raw doc must outrank OOD doc: $out")
    // conservation: n_bigrams = max(0, tokens - 1)
    assert(out(10L)._2 == 9L && out(11L)._2 == 8L && out(1L)._2 == 6L)
  }

  test("importanceWeights: <2-token docs keep weight 0; partition-independent") {
    val df = Seq(
      (1L, "alpha beta gamma alpha beta", "en"),
      (2L, "alpha beta gamma", "xx"),
      (3L, "solo", "xx"),
      (4L, "", "xx")).toDF("doc_id", "text", "lang")
    val out = Dsir.importanceWeights(df, "doc_id", "text",
        col("lang") === "en", 16)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("weight"),
        r.getAs[Long]("n_bigrams"))).toSeq
    assert(out.map(_._1) == Seq(1L, 2L, 3L, 4L), "every doc kept")
    assert(out(2) == ((3L, 0L, 0L)) && out(3) == ((4L, 0L, 0L)),
      "gramless docs score 0, not dropped")
    // doc 2 "alpha beta gamma" → exactly 2 bigrams
    assert(out(1)._3 == 2L)
    val re = Dsir.importanceWeights(df.repartition(5), "doc_id", "text",
        col("lang") === "en", 16)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("weight"))).toSeq
    assert(re == out.map(t => (t._1, t._2)))
  }

  test("importanceWeights: bucket-bounded stats broadcast in the executed plan") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val df = Dsir.importanceWeights(docs, "doc_id", "text",
      col("lang") === "en", 256)
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "the ≤buckets-row stats frame must broadcast into the scoring " +
        "join, not shuffle the corpus-sized count frame")
    assert(!plan.contains("CartesianProduct"),
      "no unbounded pair space anywhere in DSIR")
  }

  test("clusterBalancedSample: singletons always survive; rates follow cluster size") {
    // cluster 100: ids 1..10; cluster 200: ids 21,22; singletons 31..33
    val members = ((1L to 10L).map(i => (i, 100L)) ++
      Seq((21L, 200L), (22L, 200L))).toDF("id", "cluster_id")
    val df = ((1L to 10L) ++ Seq(21L, 22L) ++ (31L to 33L))
      .map(i => (i, s"txt$i")).toDF("doc_id", "text")
    val kept = Sampling.clusterBalancedSample(df, "doc_id",
        members, "id", "cluster_id")
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_size"),
        r.getAs[Long]("rate_ppm"))).toSeq
    val keptIds = kept.map(_._1).toSet
    assert(Set(31L, 32L, 33L).subsetOf(keptIds),
      "rate 1e6 singletons are unconditionally kept")
    assert(kept.filter(_._1 <= 10L).forall(t => t._2 == 10L &&
      t._3 == 100000L), "big-cluster rows carry size 10, rate 1e5")
    assert(kept.filter(k => k._1 == 21L || k._1 == 22L)
      .forall(t => t._2 == 2L && t._3 == 500000L))
    // the kept set IS the md5-Bernoulli decision — replay it directly
    val expect = df
      .withColumn("u", Sampling.hashUniformPpm(col("doc_id"), "cbsample"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("u"))
      .toMap
    val rate = (i: Long) =>
      if (i <= 10L) 100000L else if (i <= 22L) 500000L else 1000000L
    assert(keptIds == expect.filter { case (i, u) => u < rate(i) }.keySet)
    // partition independence
    val re = Sampling.clusterBalancedSample(df.repartition(7), "doc_id",
        members.repartition(3), "id", "cluster_id")
      .orderBy("doc_id").collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(re == kept.map(_._1))
  }

  test("epochDecayAudit: hand-checked decay, k=0 passthrough, term-exact epoch sum") {
    // strata: a supply 100 (weight 10), b supply 400 (weight 20);
    // T=500, sw=30.
    val df = (Seq.fill(100)("a") ++ Seq.fill(400)("b")).zipWithIndex
      .map { case (g, i) => (i.toLong, g, 1L) }
      .toDF("id", "lang", "tok")
    // budget 3000‰ → 1500: a alloc 500 → k=5, partial 0,
    //   full = 100+50+25+12+6 = 193 (term-exact: 100 div 8 = 12, NOT
    //   floor(100/8·8)), eff = 193e6/500 = 386000;
    // b alloc 1000 → k=2, partial 200, full = 400+200 = 600,
    //   +200 div 4 = 50 → 650, eff = 650000.
    val out = Sampling.epochDecayAudit(df, "lang", col("tok"), 3000L)
      .orderBy("lang").collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("alloc_tokens"),
        r.getAs[Long]("epochs_full"), r.getAs[Long]("partial_tokens"),
        r.getAs[Long]("effective_tokens"), r.getAs[Long]("efficiency_ppm")))
      .toSeq
    assert(out == Seq(
      ("a", 500L, 5L, 0L, 193L, 386000L),
      ("b", 1000L, 2L, 200L, 650L, 650000L)))
    // budget 1000‰ → 500: a alloc 166 → k=1, partial 66 → 100+33=133;
    // b alloc 333 → k=0: NO decay below one epoch, efficiency exactly 1e6
    val u = Sampling.epochDecayAudit(df, "lang", col("tok"), 1000L)
      .orderBy("lang").collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("epochs_full"),
        r.getAs[Long]("effective_tokens"), r.getAs[Long]("efficiency_ppm")))
      .toSeq
    assert(u == Seq(("a", 1L, 133L, 801204L), ("b", 0L, 333L, 1000000L)))
    // partition independence
    val re = Sampling.epochDecayAudit(df.repartition(7), "lang",
        col("tok"), 3000L)
      .orderBy("lang").collect().map(_.getAs[Long]("effective_tokens")).toSeq
    assert(re == Seq(193L, 650L))
  }

  test("bootstrapMeans: constant corpus pins every replicate mean; weights near Binomial(4,1/4)") {
    val df = (1L to 400L).map(i => (i, 7L)).toDF("doc_id", "v")
    val out = Sampling.bootstrapMeans(df, "doc_id", col("v"), trials = 16)
      .orderBy("trial").collect()
      .map(r => (r.getAs[Long]("trial"), r.getAs[Long]("n_eff"),
        r.getAs[Long]("mean_milli"))).toSeq
    assert(out.map(_._1) == (1L to 16L), "one row per replicate")
    // with a constant value the weighted mean is EXACTLY the constant
    // in every replicate, whatever the coins did
    assert(out.forall(_._3 == 7000L), s"mean invariance broken: $out")
    // E[n_eff] = 400, sd = sqrt(400*3/4) ≈ 17 → all replicates within
    // ±6 sd is a deterministic fact of these md5 coins, asserted once
    assert(out.forall(t => t._2 > 296L && t._2 < 504L),
      s"replicate weights far from Binomial(4, 1/4): $out")
    // deterministic and partition-independent
    val re = Sampling.bootstrapMeans(df.repartition(7), "doc_id",
        col("v"), trials = 16)
      .orderBy("trial").collect().map(_.getAs[Long]("n_eff")).toSeq
    assert(re == out.map(_._2))
  }

  test("bootstrapMeans: no trials-axis row fan-out in the executed plan") {
    val df = (1L to 100L).map(i => (i, i % 7)).toDF("doc_id", "v")
    val out = Sampling.bootstrapMeans(df, "doc_id", col("v"), trials = 8)
    out.collect() // finalize the adaptive plan
    val plan = out.queryExecution.executedPlan.toString
    // the replicate axis must be conditional aggregates on the scan row,
    // never an explode multiplying corpus rows before the aggregation;
    // the only generator is the stack unpivot of the 1-row result
    // (the adaptive plan string prints final + initial plans, so node
    // counts double — assert on generator KIND, not occurrence count)
    assert(!plan.contains("explode("),
      s"trials axis exploded corpus rows:\n$plan")
    assert(plan.contains("stack("), "the 1-row unpivot is the stack form")
  }
}
