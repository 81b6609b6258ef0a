package graft

/** Plan-shape audit for the scale-critical queries: these assertions pin
  * the properties that make the plans survive a 100× scale-up — filters
  * reaching the parquet scan, broadcast joins on dimension sides, anti-
  * join merges, and the absence of cartesian products in pair
  * generation. Analysis-only (nothing executes).
  */
class PlanAuditSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val qe = SparkEntry.queries(name)(spark, sfDir).queryExecution
    // formatted mode includes scan metadata (PushedFilters / ReadSchema)
    // that the simple plan string truncates
    qe.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("q6: every predicate pushes to the parquet scan; only needed columns read") {
    val p = plan("q6_forecast")
    assert(p.contains("PushedFilters:"), p.take(800))
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), "date lower bound must push")
    assert(p.contains("LessThan(l_quantity,24.0)"), "quantity filter must push")
    assert(p.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_shipdate"),
      "scan must read only the 4 referenced columns")
  }

  test("q3/q5: dimension sides broadcast — no shuffled join on the small side") {
    assert(plan("q3_top_revenue").contains("BroadcastHashJoin"))
    val q5 = plan("q5_nation_revenue")
    assert(q5.contains("BroadcastHashJoin"))
    assert(!q5.contains("CartesianProduct"))
  }

  test("j1 merge is an anti-join, never a cartesian product") {
    val p = plan("j1_insert_only_merge")
    assert(p.contains("LeftAnti"), "insert-only merge must anti-join on the PK")
    assert(!p.contains("CartesianProduct"))
  }

  test("pair generation never goes all-pairs: jaccard + simhash + cosine near-dup") {
    for (q <- Seq("d2_jaccard_pairs", "d4_simhash_pairs", "d5_cosine_near_dup")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q has a nested-loop join")
    }
  }

  test("d2/d6: no forced broadcast of the O(corpus) per-doc sizes side") {
    // a broadcast() hint on a one-row-per-document table is a guaranteed
    // OOM at 100 TB — strategy choice must stay with AQE (a RUNTIME
    // broadcast of a measured-small side is fine; the forced hint is not)
    for (q <- Seq("d2_jaccard_pairs", "d6_shared_windows")) {
      val analyzed = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.analyzed.toString
      assert(!analyzed.contains("ResolvedHint"),
        s"$q carries a join-strategy hint:\n${analyzed.take(1500)}")
    }
  }

  test("ANN: brute force broadcasts the query side; ivf assignment shuffle-free") {
    assert(plan("s1_ann_brute_force").contains("BroadcastNestedLoopJoin"),
      "brute force IS the deliberate broadcast cross join — query side tiny")
    assert(!plan("s3_ann_ivf").contains("CartesianProduct"))
    // the assignment sits behind the index-materialization barrier
    // (localCheckpoint), so assert its shape on the producing plan:
    // a single projection, no shuffle, argmin over a once-built array
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val assigned = graft.similarity.Similarity.ivfAssign(
      emb.select(org.apache.spark.sql.functions.col("vec_id"),
        graft.similarity.Similarity.quantize(
          org.apache.spark.sql.functions.col("embedding")).as("qv")),
      "vec_id", "qv", graft.similarity.Similarity.ivfCentroids(16, 64))
    val ap = assigned.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(ap.contains("nearest_centroids"),
      "assignment must be the fused plan-data centroid expression")
    assert(!ap.contains("Exchange"), "assignment must not shuffle")
  }

  test("t16: first-wins election aggregates, never a window over content_hash") {
    // a window partitioned on content_hash cannot be AQE-skew-split: a
    // boilerplate page duplicated millions of times pins its cluster on
    // one reducer. The funnel must elect keepers with a hash aggregate
    // (struct-argmax, the d8 shape) whose map-side partials absorb skew.
    val df = SparkEntry.queries("t16_curation_funnel")(spark, sfDir)
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.isEmpty, "t16 must not contain a window operator")
    val joins = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.isEmpty, "t16 election must ride the aggregate, not a join")
    assert(plan("t16_curation_funnel").contains("HashAggregate"))
  }

  test("o3 top-errors / t9 top-tokens use TakeOrderedAndProject, not a full sort") {
    assert(plan("o3_top_errors").contains("TakeOrderedAndProject"))
    assert(plan("t9_top_tokens").contains("TakeOrderedAndProject"))
  }

  test("q7/q9/q10: dimensions broadcast, selective filters push to the scan") {
    val q7 = plan("q7_nation_volume")
    assert(q7.contains("BroadcastHashJoin") && !q7.contains("CartesianProduct"))
    val q9 = plan("q9_profit_by_nation")
    assert(q9.contains("BroadcastHashJoin"))
    assert(q9.contains("EqualTo(p_type,STANDARD)"),
      "part-type filter must push to the part scan")
    val q10 = plan("q10_returned_items")
    assert(q10.contains("EqualTo(l_returnflag,R)"),
      "returnflag filter must push to the lineitem scan")
    assert(q10.contains("TakeOrderedAndProject"), "top-20 must not full-sort")
  }

  test("q18: lineitem aggregates BEFORE joining orders/customer") {
    // the order of physical operators in the formatted plan reflects the
    // tree: the quantity aggregate must appear as a join child, i.e. the
    // join must consume an aggregated (order-count-sized) side, not raw
    // lineitem. Assert no join sits below the aggregate on its input.
    val df = SparkEntry.queries("q18_large_orders")(spark, sfDir)
    val agg = df.queryExecution.optimizedPlan.collectFirst {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
          if a.aggregateExpressions.exists(_.sql.contains("l_quantity")) => a
    }
    assert(agg.isDefined, "quantity aggregate missing from the plan")
    val joinsBelowAgg = agg.get.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joinsBelowAgg.isEmpty,
      "the HAVING aggregate must reduce lineitem before any join")
  }

  test("q14: one pass over the joined fact — a single aggregate computes both sums") {
    val df = SparkEntry.queries("q14_promo_share")(spark, sfDir)
    val aggs = df.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(aggs.size == 1, s"expected one aggregate, got ${aggs.size}")
    assert(plan("q14_promo_share").contains("BroadcastHashJoin"))
  }

  test("q15/q22: the scalar-aggregate side broadcasts (1-row comparisons)") {
    for (q <- Seq("q15_top_supplier", "q22_idle_rich_customers")) {
      val p = plan(q)
      assert(p.contains("Broadcast"), s"$q scalar side must broadcast")
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product")
    }
  }

  test("q17: per-part stats aggregate only the brand's lines, not raw lineitem") {
    // the brand semi-join must sit BELOW the stats aggregate: at scale
    // the aggregate sees one brand's lines (~1/25 of the fact), never
    // the whole table
    val df = SparkEntry.queries("q17_small_qty_revenue")(spark, sfDir)
    val statsAgg = df.queryExecution.optimizedPlan.collectFirst {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
          if a.groupingExpressions.exists(_.sql.contains("l_partkey")) => a
    }
    assert(statsAgg.isDefined, "per-part stats aggregate missing")
    val joinsBelow = statsAgg.get.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joinsBelow.nonEmpty,
      "brand filter join must reduce lineitem before the stats aggregate")
  }

  test("q19: disjunction implies pushable per-scan filters") {
    val p = plan("q19_disjunct_revenue")
    // CNF extraction must push the brand/size disjunction into the part
    // scan and the quantity envelope into the lineitem scan
    assert(p.contains("EqualTo(p_brand,Brand#12)"),
      "brand disjunction must push to the part scan")
    assert(p.contains("GreaterThanOrEqual(l_quantity,1.0)"),
      "quantity envelope must push to the lineitem scan")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q21: both self-join legs are semi/anti on the order key, no cartesian") {
    val p = plan("q21_late_suppliers")
    assert(p.contains("LeftSemi"), "EXISTS leg must plan as a semi join")
    assert(p.contains("LeftAnti"), "NOT EXISTS leg must plan as an anti join")
    assert(!p.contains("CartesianProduct"))
  }

  test("d7: edge building stays key-joined — no cartesian in the closure loop") {
    val p = plan("d7_dup_clusters")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("j7 SCD2 is single-pass: exactly one join in the whole plan") {
    // the closed/opened/kept branches ride one explode over one
    // full-outer join — a second join would mean the union re-executes it
    val df = SparkEntry.queries("j7_scd2_history")(spark, sfDir)
    val joins = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.size == 1, s"expected 1 join, got ${joins.size}")
  }

  test("q11: global total reuses the per-part exchange — one lineitem scan") {
    // the scalar-subquery side re-aggregates the SAME groupBy(l_partkey)
    // exchange; without ReuseExchange the fact table is scanned and
    // shuffled twice, which doubles the dominant cost at 100 TB. AQE
    // resolves reuse at runtime (the static adaptive explain prints both
    // subtrees unreused), so assert on the non-adaptive physical plan.
    val saved = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val p = SparkEntry.queries("q11_important_parts")(spark, sfDir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(p.contains("ReusedExchange"),
        s"total must reuse the per-part aggregate exchange:\n${p.take(1500)}")
      // formatted mode prints each node twice (tree + details); count
      // unique node-id headers
      val scans = """\(\d+\) Scan parquet""".r.findAllIn(p).size
      assert(scans == 1, s"expected exactly one lineitem scan, saw $scans")
    } finally spark.conf.set("spark.sql.adaptive.enabled", saved)
  }

  test("t12 heavy hitters: single object-agg, no per-token shuffle key") {
    // the whole point of Misra-Gries over t9's exact explode+groupBy is
    // that the shuffle ships <=k counters per partition, not one row per
    // distinct token: the plan must be a global (no-key) aggregate with
    // a single-partition exchange, never an expanded per-token exchange
    val p = plan("t12_heavy_hitters")
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      s"typed Aggregator must plan as an object aggregate:\n${p.take(1200)}")
    // the only Generate is the FINAL explode of the <=k-entry result map
    // (a parent of the aggregate, printed above it in the tree); an
    // explode feeding the aggregate would be a per-token expansion
    val gen = p.indexOf("Generate")
    val agg = Seq(p.indexOf("ObjectHashAggregate"), p.indexOf("SortAggregate"))
      .filter(_ >= 0).minOption.getOrElse(-1)
    assert(gen >= 0 && agg >= 0, s"missing Generate or aggregate:\n${p.take(1200)}")
    assert(gen < agg,
      s"explode must sit above the aggregate, not feed it:\n${p.take(1200)}")
    assert("""\(\d+\) Scan parquet""".r.findAllIn(p).size == 1)
  }

  test("grouping family (rollup/sets/cube): Expand replicates the tiny partial, not the fact scan") {
    // Expand multiplies its input by the number of grouping sets; fed the
    // raw fact table that multiplies the scan volume — the Expand must
    // sit ABOVE the finest-grain aggregate (in the printed tree: Expand
    // appears before, i.e. as a parent of, the first HashAggregate chain
    // whose child is the scan)
    for (q <- Seq("q8_rollup", "a7_grouping_sets", "a8_cube")) {
      val p = plan(q)
      val expand = p.indexOf("Expand")
      val scan = p.indexOf("Scan parquet")
      assert(expand >= 0 && scan >= 0, s"$q: missing Expand or scan")
      assert(p.lastIndexOf("HashAggregate", scan) > expand,
        s"$q: an aggregate must separate Expand from the scan:\n${p.take(1200)}")
    }
  }

  test("d12 boilerplate census: df via bounded agg + equi-join, no gram self-join") {
    val p = plan("d12_boilerplate")
    assert(!p.contains("CartesianProduct"))
    // exactly two equi-joins: the df probe on the gram key (deliberately
    // a JOIN, not a count window — joins AQE-skew-split on ubiquitous
    // grams, windows cannot; see Dedup.boilerplateStats) and the final
    // left join back to docs. Anything more is a posting-list self-join
    // regression (O(df^2) per gram).
    val joins = "(?m)^\\(\\d+\\) (BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)".r
      .findAllIn(p).size
    assert(joins == 2, s"expected df probe + docs left-join, found $joins:\n${p.take(1200)}")
    // the (doc, gram) aggregate must reuse the posexplode window's
    // hash(doc_id) partitioning — grouping keys are a superset, so an
    // extra exchange between the two would be a planner regression
    val exchanges = "(?m)^\\(\\d+\\) Exchange".r.findAllIn(p).size
    assert(exchanges <= 6, s"boilerplate census grew to $exchanges exchanges")
  }

  test("k5 z-order layout: pure scan -> aggregate, interleave stays in the scan stage") {
    val p = plan("k5_zorder_layout")
    assert(!p.contains("Join"), "zorder bucketing must not join")
    val exchanges = "(?m)^\\(\\d+\\) Exchange".r.findAllIn(p).size
    assert(exchanges <= 2, s"one group-by + one order-by expected, got $exchanges")
  }

  test("declarative joins are runtime-bloom-filter eligible at scale") {
    // at 100 TB a selective dim filter should prune the fact scan via an
    // injected bloom filter (spark.sql.optimizer.runtime.bloomFilter.*,
    // on by default); the size thresholds don't trip at test scale, so
    // lower them and assert Catalyst injects might_contain into OUR plan
    // shape — proof the plans stay declarative enough to qualify
    import org.apache.spark.sql.functions.col
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.get(k))
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val o = spark.read.parquet(s"$sfDir/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
      val q = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_linestatus")).count()
      val p = q.queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain"),
        s"runtime bloom filter must inject on the fact side:\n${p.take(1200)}")
    } finally saved.foreach { case (k, v) => conf.set(k, v) }
  }

  test("j10 CDC apply: netting windows only the batch; the apply is an anti-join") {
    val p = plan("j10_cdc_apply")
    assert(p.contains("LeftAnti"), "base must be probed with an anti-join")
    assert(!p.contains("CartesianProduct"))
    // the netting window sits behind the netted frame's checkpoint
    // barrier (shared by the anti probe and the upsert slice), so the
    // final plan carries no window at all — the base table provably
    // never flows through one
    val windows = SparkEntry.queries("j10_cdc_apply")(spark, sfDir)
      .queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }
    assert(windows.isEmpty,
      s"the base-side plan must carry no window, got ${windows.size}")
  }

  test("e6/e7: funnel and retention carry no window operators at all") {
    for (q <- Seq("e6_funnel", "e7_cohort_retention")) {
      val windows = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.optimizedPlan.collect {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
        }
      assert(windows.isEmpty, s"$q must stay join+aggregate only")
    }
  }

  test("d15 split leakage inherits d3's banding: no cartesian, no nested loop") {
    val p = plan("d15_split_leakage")
    assert(!p.contains("CartesianProduct"), "d15 has a cartesian product")
    assert(!p.contains("BroadcastNestedLoopJoin"), "d15 has a nested-loop join")
  }

  test("t25/s10: the only cross product is the one-row stats broadcast; top-k cuts take, not sort") {
    // t23's stance: a BroadcastNestedLoopJoin against a single-row
    // aggregate is the cheapest way to hand every task the corpus
    // stats — assert the build side is the aggregate, not the corpus
    for (q <- Seq("t25_unigram_surprisal", "s10_rrf_fusion")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a true cartesian")
    }
    assert(plan("s10_rrf_fusion").contains("TakeOrderedAndProject"),
      "s10 top-20 cuts must be TakeOrdered, not a global sort")
  }

  test("d16 PageRank rounds and the census/scorecard family stay window-free and cartesian-free") {
    for (q <- Seq("d16_similarity_pagerank", "t24_quality_rules",
        "t27_source_scorecard", "m4_media_dedup")) {
      val df = SparkEntry.queries(q)(spark, sfDir)
      val windows = df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }
      assert(windows.isEmpty, s"$q must carry no window operator")
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product")
    }
    // census + scorecard + media dedup are single-aggregate shapes: no join
    for (q <- Seq("t24_quality_rules", "t27_source_scorecard")) {
      val joins = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.optimizedPlan.collect {
          case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
        }
      assert(joins.isEmpty, s"$q must be one grouped aggregate, not a join")
    }
  }

  test("t30 priority sample: top-(k+1) is TakeOrdered; the only window runs on the bounded cut") {
    val p = plan("t30_priority_sample")
    assert(p.contains("TakeOrderedAndProject"),
      "the (k+1) cut must be TakeOrdered (per-partition heaps), not a global sort")
    // the rank window and threshold join exist, but only ABOVE the
    // 51-row cut — no window may consume the corpus-sized input
    val lp = SparkEntry.queries("t30_priority_sample")(spark, sfDir)
      .queryExecution.optimizedPlan
    lp.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.foreach { w =>
      val hasLimitBelow = w.collectFirst {
        case _: org.apache.spark.sql.catalyst.plans.logical.GlobalLimit => ()
        case _: org.apache.spark.sql.catalyst.plans.logical.LocalLimit => ()
      }.isDefined
      assert(hasLimitBelow, "t30's window must sit above the k+1 limit")
    }
  }

  test("t34 calibration carries no per-group window over the DATA — only over the bounded grid") {
    val df = SparkEntry.queries("t34_calibrated_quality")(spark, sfDir)
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    // both windows must consume the (group, bin) AGGREGATE, i.e. have an
    // Aggregate below them — a window directly over the scan would be
    // the percent_rank shape that pins each group on one reducer
    windows.foreach { w =>
      val overAgg = w.collectFirst {
        case _: org.apache.spark.sql.catalyst.plans.logical.Aggregate => ()
      }.isDefined
      assert(overAgg, "t34 window must run over the bounded histogram grid")
    }
    assert(windows.nonEmpty, "expected grid windows in t34")
  }

  test("new pair/join shapes (t29, d17, t35, j12, e9) are cartesian-free; t29/t35 carry no strategy hint on corpus sides") {
    for (q <- Seq("t29_source_overlap", "d17_edit_verified", "t35_novelty",
        "j12_incremental_rollup", "t33_cdc_chunks")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product")
    }
    // t35's first-owner side is O(distinct grams) — strategy must stay
    // with AQE, same rule as d2's sizes side
    val analyzed = SparkEntry.queries("t35_novelty")(spark, sfDir)
      .queryExecution.analyzed.toString
    assert(!analyzed.contains("ResolvedHint"),
      "t35 must not force a broadcast of the gram-owner table")
    // e9 / t33 windows are per-user / per-doc partitions (bounded), and
    // j12's maintenance side has no window at all
    val j12w = SparkEntry.queries("j12_incremental_rollup")(spark, sfDir)
      .queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }
    assert(j12w.isEmpty, "j12 netting must be aggregate-only, no window")
  }

  test("t36 per-stratum selection is window-free (the aggregator, not row_number); d18/s13 cartesian-free") {
    val t36w = SparkEntry.queries("t36_stratified_priority")(spark, sfDir)
      .queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }
    assert(t36w.isEmpty,
      "t36 must select via the mergeable top-k aggregate — a stratum " +
        "window would shuffle every row and pin a mega-stratum on one reducer")
    for (q <- Seq("d18_containment", "s13_rp_recall")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product")
    }
  }

  test("t37/e10 sketch merges are aggregates, not ranks; t38 joins cartesian-free") {
    // The rolling KMV merge is hash aggregates end to end — the oracle
    // may rank with windows (it replays sf-scale data), but the plan
    // that must survive 100× cannot partition a window by an unbounded
    // key
    val e10w = SparkEntry.queries("e10_rolling_distinct")(spark, sfDir)
      .queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }
    assert(e10w.isEmpty, "e10 must merge sketches by aggregation, no window")
    // t37's only window is the shingle builder's — partitioned by
    // doc_id (bounded by document length), never by the sketch group
    val t37w = SparkEntry.queries("t37_hll_by_source")(spark, sfDir)
      .queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }
    t37w.foreach { w =>
      val parts = w.partitionSpec.flatMap(_.references.map(_.name))
      assert(parts.contains("doc_id") && !parts.contains("source"),
        s"t37 window must partition per-doc, got $parts")
    }
    val p38 = plan("t38_backoff_surprisal")
    assert(!p38.contains("CartesianProduct"),
      "t38's model joins must stay token-keyed (the ntot side is a " +
        "broadcast of one row, not a cartesian)")
  }
}
