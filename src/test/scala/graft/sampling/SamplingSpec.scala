package graft.sampling

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("mixToProportions: binding stratum kept whole; mix near target; deterministic") {
    // strata: a=600, b=300, c=100 rows; targets 50/30/20 → c binds
    // (n_max = 100/0.2 = 500) → rates: a 500*0.5/600, b 500*0.3/300=0.5, c 1.0
    val df = ((1L to 600L).map(i => (s"k$i", "a")) ++
      (601L to 900L).map(i => (s"k$i", "b")) ++
      (901L to 1000L).map(i => (s"k$i", "c")))
      .toDF("k", "s")
    val shares = Seq("a" -> 500000L, "b" -> 300000L, "c" -> 200000L)
    val kept = Sampling.mixToProportions(df, "s", "k", shares)
    val rates = kept.select("s", "rate_ppm").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rates("c") == 1000000L, "the binding stratum keeps everything")
    assert(rates("a") == 500L * 500000L / 600L)
    assert(rates("b") == 500000L)
    val counts = kept.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("c") == 100L)
    // binomial tolerance around the targets (n ≈ 250/150/100)
    assert(math.abs(counts("a") - 250L) < 60, s"a kept ${counts("a")}")
    assert(math.abs(counts("b") - 150L) < 50, s"b kept ${counts("b")}")
    // deterministic and partition-independent
    val again = Sampling.mixToProportions(df.repartition(11), "s", "k", shares)
      .select("k").as[String].collect().toSet
    assert(again == kept.select("k").as[String].collect().toSet)
    // zero/negative shares rejected
    intercept[IllegalArgumentException] {
      Sampling.mixToProportions(df, "s", "k", Seq("a" -> 0L))
    }
  }

  test("hash sample: deterministic, partition-independent, near the target fraction") {
    val a = Sampling.hashSample(docs, "doc_id", 300000L).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(docs.repartition(7), "doc_id", 300000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b, "sample must not depend on partitioning")
    val frac = a.size.toDouble / docs.count()
    assert(frac > 0.2 && frac < 0.4, s"0.3 target, got $frac")
    // a different salt draws an independent sample
    val c = Sampling.hashSample(docs, "doc_id", 300000L, salt = "other")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(c != a)
    // nested fractions: a 10% sample is a subset of the 30% sample
    val d = Sampling.hashSample(docs, "doc_id", 100000L).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(d.subsetOf(a), "smaller fraction must nest inside larger")
  }

  test("stratified quota: exactly min(quota, |stratum|) per stratum, deterministic") {
    val out = Sampling.stratifiedQuota(docs, "lang", "doc_id", 25)
    val perLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    full.foreach { case (lang, n) =>
      assert(perLang(lang) == math.min(25L, n), s"$lang: ${perLang(lang)} of $n")
    }
    val again = Sampling.stratifiedQuota(docs.repartition(5), "lang", "doc_id", 25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == out.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("uniform ppm stays in range and spreads") {
    val u = Seq.tabulate(1000)(i => i.toLong).toDF("k")
      .select(Sampling.hashUniformPpm(col("k"), "s").as("u"))
      .as[Long].collect()
    assert(u.forall(x => x >= 0 && x < 1000000))
    assert(u.distinct.length > 950, "uniforms must spread (few collisions)")
  }

  test("priority sample: fixed size, threshold = (k+1)-th priority, HT estimator sane") {
    val df = docs.select(col("doc_id"), col("text"))
    val w = length(col("text")).cast("long")
    val k = 10
    val out = Sampling.prioritySample(df, "doc_id", w, k)
      .orderBy(col("priority").desc, col("doc_id")).collect()
    assert(out.length == k)
    // τ sits between the sample's smallest priority and 0
    val tau = out.head.getAs[Long]("tau")
    assert(out.forall(_.getAs[Long]("tau") == tau)) // one global threshold
    assert(out.forall(_.getAs[Long]("priority") >= tau) && tau > 0)
    // est_w = max(w, τ) row-wise
    assert(out.forall(r =>
      r.getAs[Long]("est_w") ==
        math.max(r.getAs[Long]("w"), tau)))
    // deterministic and partition-independent
    val re = Sampling.prioritySample(df.repartition(7), "doc_id", w, k)
      .orderBy(col("priority").desc, col("doc_id")).collect()
    assert(re.map(_.getAs[Long]("doc_id")).sameElements(
      out.map(_.getAs[Long]("doc_id"))))
    // HT subset-sum estimate of total weight lands within 3x on this
    // corpus (a deterministic draw — the bound guards gross estimator
    // bugs like summing w instead of est_w, not statistical noise)
    val est = out.map(_.getAs[Long]("est_w")).sum
    val total = df.select(sum(w)).collect().head.getLong(0)
    assert(est > total / 3 && est < total * 3, s"est=$est total=$total")
    // a corpus smaller than k is returned whole with est_w = w (τ = 0)
    val tiny = Sampling.prioritySample(df.limit(4), "doc_id", w, k).collect()
    assert(tiny.length == 4)
    assert(tiny.forall(r => r.getAs[Long]("tau") == 0L &&
      r.getAs[Long]("est_w") == r.getAs[Long]("w")))
  }

  test("grouped priority sample: k per stratum, per-stratum thresholds, ≡ window form") {
    val df = docs.select(col("doc_id"), col("lang"), col("text"))
    val w = length(col("text")).cast("long")
    val k = 4
    val out = Sampling.prioritySampleByGroup(df, "lang", "doc_id", w, k)
      .orderBy("lang", "rank").collect()
    val byLang = out.groupBy(_.getString(0))
    // every stratum yields min(k, |stratum|) rows with its OWN tau
    byLang.foreach { case (lang, rows) =>
      assert(rows.length <= k && rows.nonEmpty, s"$lang: ${rows.length}")
      assert(rows.map(_.getAs[Long]("tau")).distinct.length == 1)
      rows.foreach(r => assert(r.getAs[Long]("est_w") ==
        math.max(r.getAs[Long]("w"), r.getAs[Long]("tau"))))
    }
    // the aggregator form equals the window form per stratum
    val base = df.withColumn("w", w).filter(col("w") > 0)
      .withColumn("priority",
        expr(s"w * ${1L << 40}L div (CAST(conv(substring(md5(concat(" +
          s"CAST(doc_id AS STRING), '|psample')), 1, 10), 16, 10) AS BIGINT) + 1)"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("priority").desc, col("doc_id"))
    val wf = base.withColumn("rk", row_number().over(win))
      .filter(col("rk") <= k)
      .select(col("lang"), col("rk"), col("doc_id")).orderBy("lang", "rk")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    val af = out.map(r => (r.getString(0), r.getAs[Int]("rank"),
      r.getAs[Long]("doc_id"))).toSeq
    assert(af == wf, "aggregator selection must equal the window form")
  }

  test("grouped priority sample rejects a non-integral key eagerly") {
    // a string key used to be silently cast to NULL long ids → wrong
    // sample with no error; now it fails fast at plan-build time
    val df = Seq(("a", "en", 10L), ("b", "en", 20L))
      .toDF("sid", "lang", "w")
    val e = intercept[IllegalArgumentException] {
      Sampling.prioritySampleByGroup(df, "lang", "sid", col("w"), 2)
    }
    assert(e.getMessage.contains("integral key"), e.getMessage)
  }

  test("weighted sample: 0 keeps nothing, 1e6 keeps all, monotone in weight") {
    val df = Seq.tabulate(500)(i => (i.toLong, i % 7)).toDF("k", "w7")
    def ids(weight: org.apache.spark.sql.Column) =
      Sampling.weightedSample(df, "k", weight).select("k")
        .as[Long].collect().toSet
    assert(ids(lit(0L)).isEmpty)
    assert(ids(lit(1000000L)).size == 500)
    assert(ids(lit(2000000L)).size == 500, "over-1 weights clamp to always")
    val lo = ids(lit(200000L)); val hi = ids(lit(600000L))
    assert(lo.subsetOf(hi), "same salt: higher weight keeps a superset")
    assert(lo.size < hi.size && hi.size < 500)
    // per-row weights: a row's fate depends only on ITS weight — the
    // kept set must equal, row for row, what the same CONSTANT weight
    // keeps restricted to rows carrying that weight
    val perRow = ids(col("w7") * 200000L)
    val expected = (0 until 7).flatMap { w =>
      val rowsWithW = (0L until 500L).filter(_ % 7 == w).toSet
      ids(lit(w * 200000L)).intersect(rowsWithW)
    }.toSet
    assert(perRow == expected,
      "per-row decision must match the constant-weight decision per row")
    assert(Sampling.weightedSample(df.repartition(13), "k",
      col("w7") * 200000L).select("k").as[Long].collect().toSet == perRow,
      "partition-independent")
  }

  test("temperature mix: conservation, caps bind at supply, surplus redistributes") {
    // one dominant stratum (en) and three small ones — the small ones must
    // cap at supply and en must absorb the surplus
    val docs = Seq.tabulate(400) { i =>
      val lang = if (i % 4 != 0) "en" else Seq("de", "fr", "zh")(i % 3)
      (i.toLong, lang, 10L + i % 5)
    }.toDF("id", "lang", "tok")
    val out = Sampling
      .temperatureMixAllocation(docs, "lang", col("tok"), budgetPermille = 900L)
      .collect().map(r => r.getAs[String]("lang") -> r).toMap
    val supply = out.map { case (l, r) => l -> r.getAs[Long]("supply_tokens") }
    val alloc = out.map { case (l, r) => l -> r.getAs[Long]("alloc_tokens") }
    val budget = supply.values.sum * 900 / 1000
    out.foreach { case (l, r) =>
      assert(alloc(l) <= supply(l), s"$l allocated beyond supply")
      assert(r.getAs[Long]("weight_s") ==
        math.sqrt(supply(l).toDouble).toLong)
      if (r.getAs[Int]("capped") == 1)
        assert(r.getAs[Long]("fill_ppm") == 1000000L, s"$l capped but not full")
    }
    assert(alloc.values.sum <= budget, "allocation must not exceed budget")
    // integer-division remainders only: the budget is spent to within
    // one token per stratum
    assert(budget - alloc.values.sum <= out.size.toLong,
      "surplus must redistribute (headroom existed)")
    assert(out("de").getAs[Int]("capped") == 1)
    assert(out("en").getAs[Int]("capped") == 0)
    assert(alloc("en") > budget * out("en").getAs[Long]("weight_s") /
      out.values.map(_.getAs[Long]("weight_s")).sum,
      "en must receive redistributed surplus above its naive share")
    // degenerate: budget 1000‰ fills everything exactly
    val full = Sampling
      .temperatureMixAllocation(docs, "lang", col("tok"), budgetPermille = 1000L)
      .collect()
    full.foreach(r => assert(r.getAs[Long]("fill_ppm") == 1000000L))
  }

  test("capped mix: conservation with explicit unalloc; caps honored; starved regime all-cap") {
    val docs = Seq.tabulate(400) { i =>
      val lang = if (i % 4 != 0) "en" else Seq("de", "fr", "zh")(i % 3)
      (i.toLong, lang, 10L + i % 5)
    }.toDF("id", "lang", "tok")
    def run(b: Long, me: Long) = Sampling
      .cappedMixAllocation(docs, "lang", col("tok"), b, me)
      .collect().map(r => r.getAs[String]("lang") -> r).toMap
    // headroom regime: budget 1500‰ < total cap 2000‰
    val h = run(1500L, 2000L)
    val supply = h.map { case (l, r) => l -> r.getAs[Long]("supply_tokens") }
    val budget = supply.values.sum * 1500L / 1000L
    h.foreach { case (l, r) =>
      val cap = r.getAs[Long]("cap_tokens")
      assert(cap == supply(l) * 2000L / 1000L)
      assert(r.getAs[Long]("alloc_tokens") <= cap, s"$l above its cap")
      assert(r.getAs[Long]("unalloc_tokens") >= 0L)
    }
    val hAlloc = h.values.map(_.getAs[Long]("alloc_tokens")).sum
    val hUn = h.values.head.getAs[Long]("unalloc_tokens")
    assert(hAlloc + hUn == budget, "conservation: alloc + unalloc = budget")
    // integer remainders only — the caps leave headroom, so ~all places
    assert(hUn <= h.size.toLong, s"headroom regime left $hUn unplaced")
    // small strata must repeat (epochs > 1000‰), en must not cap
    assert(h("de").getAs[Long]("epochs_permille") > 1000L)
    assert(h("en").getAs[Int]("capped") == 0)
    // starved regime: cap 1300‰ < budget 1500‰ — every stratum caps and
    // the unreachable remainder is explicit
    val s = run(1500L, 1300L)
    s.foreach { case (l, r) =>
      assert(r.getAs[Int]("capped") == 1, s"$l must cap when starved")
      assert(r.getAs[Long]("alloc_tokens") == r.getAs[Long]("cap_tokens"))
    }
    val sAlloc = s.values.map(_.getAs[Long]("alloc_tokens")).sum
    val sUn = s.values.head.getAs[Long]("unalloc_tokens")
    assert(sAlloc + sUn == budget)
    assert(sUn > 0L, "starved regime must report unallocated budget")
    // trillion-token regime: products must not wrap
    val big = Seq(("en", 25000000000000L), ("es", 9000000000000L))
      .toDF("lang", "tok")
    Sampling.cappedMixAllocation(big, "lang", col("tok"), 1500L, 2000L)
      .collect().foreach { r =>
        val a = r.getAs[Long]("alloc_tokens")
        assert(a >= 0L && a <= r.getAs[Long]("cap_tokens"), s"wrapped: $r")
      }
    // all-zero-supply corpus: Σweight = 0 must yield DESIGNED zeros via
    // the greatest(__sw, 1) guard, not NULL naive shares that only
    // least() happens to skip (the r13 advisor finding) — every output
    // column is non-null and zero
    val zero = Seq(("en", 0L), ("de", 0L)).toDF("lang", "tok")
    val z = Sampling.cappedMixAllocation(zero, "lang", col("tok"),
      1500L, 2000L).collect()
    assert(z.length == 2)
    z.foreach { r =>
      Seq("supply_tokens", "cap_tokens", "weight_s", "alloc_tokens",
        "epochs_permille", "unalloc_tokens").foreach { c =>
        assert(!r.isNullAt(r.fieldIndex(c)), s"$c must not be NULL")
        assert(r.getAs[Long](c) == 0L, s"$c must be 0, got $r")
      }
    }
  }

  test("referentialSample: child rows follow their parent's coin exactly") {
    val parent = (1L to 200L).map(k => (k, s"p$k")).toDF("pk", "payload")
    // 3 children per parent, including parents the coin will drop
    val child = (1L to 200L).flatMap(k => (1 to 3).map(i => (k, i)))
      .toDF("fk", "line")
    val keptChild = Sampling.referentialSample(parent, "pk", child, "fk",
        300000L, "rs-spec")
      .collect().map(r => (r.getAs[Long]("fk"), r.getAs[Int]("line"))).toSeq
    // the kept-parent set IS the md5 coin — replay it directly
    val keptPk = parent
      .filter(Sampling.hashUniformPpm(col("pk"), "rs-spec") < 300000L)
      .collect().map(_.getAs[Long]("pk")).toSet
    assert(keptPk.nonEmpty && keptPk.size < 200, "coin must split the keys")
    assert(keptChild.map(_._1).toSet == keptPk,
      "closure: exactly the kept parents' children survive")
    assert(keptChild.size == keptPk.size * 3,
      "no child of a kept parent is lost")
    // partition independence
    val re = Sampling.referentialSample(parent.repartition(7), "pk",
        child.repartition(5), "fk", 300000L, "rs-spec")
      .collect().map(r => (r.getAs[Long]("fk"), r.getAs[Int]("line"))).toSet
    assert(re == keptChild.toSet)
  }

  test("temperature mix + epoch decay: multi-trillion-token supplies don't wrap Long") {
    // the docstring's own regime: budget ~3.4e13 × weight_s ~5e6 ≈ 1.7e20
    // exceeds Long (9.2e18) — before the decimal(38,0) widening the
    // products wrapped silently in non-ANSI Spark, yielding negative or
    // garbage allocations. One row per stratum; sums are over one row.
    val docs = Seq(("en", 25000000000000L), ("es", 9000000000000L),
      ("zh", 4000000000000L)).toDF("lang", "tok")
    val mix = Sampling
      .temperatureMixAllocation(docs, "lang", col("tok"),
        budgetPermille = 900L)
      .collect().map(r => r.getAs[String]("lang") -> r).toMap
    val budget = 38000000000000L * 900L / 1000L
    mix.values.foreach { r =>
      val alloc = r.getAs[Long]("alloc_tokens")
      val supply = r.getAs[Long]("supply_tokens")
      assert(alloc >= 0L, s"allocation wrapped negative: $r")
      assert(alloc <= supply, s"allocation exceeds supply: $r")
      val fill = r.getAs[Long]("fill_ppm")
      assert(fill >= 0L && fill <= 1000000L, s"fill_ppm out of range: $r")
    }
    val total = mix.values.map(_.getAs[Long]("alloc_tokens")).sum
    assert(total <= budget, s"allocated $total above budget $budget")
    assert(total > budget * 99L / 100L,
      s"a 900‰ budget against ample supply should near-fill: $total")
    // epoch decay at 3× budget over the same supplies: the alloc and
    // efficiency products cross Long too
    val decay = Sampling.epochDecayAudit(docs, "lang", col("tok"),
      budgetPermille = 3000L).collect()
    decay.foreach { r =>
      val alloc = r.getAs[Long]("alloc_tokens")
      val eff = r.getAs[Long]("effective_tokens")
      val ppm = r.getAs[Long]("efficiency_ppm")
      assert(alloc >= 0L, s"alloc wrapped: $r")
      assert(eff >= 0L && eff <= alloc, s"effective value out of range: $r")
      assert(ppm >= 0L && ppm <= 1000000L, s"efficiency_ppm range: $r")
    }
  }
}
