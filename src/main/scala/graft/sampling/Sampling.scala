package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines. Spark's
  * `df.sample` is seed-dependent on partitioning and not reproducible
  * across engines or re-runs with different splits; these operators
  * derive a per-row uniform from md5 of the row KEY, so the same row
  * always makes the same decision — on any cluster, any partitioning,
  * any engine (the DuckDB oracle recomputes it exactly).
  *
  * Scale posture: both forms are one scan; the quota form shuffles only
  * on the stratum key (bounded by the largest stratum — language-sized,
  * acceptable; salt the stratum if one dominates).
  */
object Sampling {

  /** md5-derived uniform in [0, 1e6) ppm for a key + salt. Changing the
    * salt draws an independent sample (the "seed").
    */
  def hashUniformPpm(key: Column, salt: String): Column =
    conv(substring(md5(concat(key.cast("string"), lit("|" + salt))), 1, 15),
      16, 10).cast("long") % 1000000L

  /** Keep rows whose uniform falls below `fractionPpm` — a deterministic
    * Bernoulli sample at fraction ppm/1e6.
    */
  def hashSample(df: DataFrame, keyCol: String, fractionPpm: Long,
      salt: String = "sample"): DataFrame =
    df.filter(hashUniformPpm(col(keyCol), salt) < fractionPpm)

  /** Weighted Bernoulli sample: each row keeps with ITS OWN probability
    * `weightPpm/1e6` (clamped to [0, 1e6]) — the quality-weighted
    * curation primitive: up-sample high-quality documents, down-sample
    * boilerplate, in one deterministic scan. Same md5 uniform as
    * [[hashSample]], so the decision is reproducible on any engine and
    * independent of partitioning; a row's fate changes only if its
    * weight does.
    */
  def weightedSample(df: DataFrame, keyCol: String, weightPpm: Column,
      salt: String = "wsample"): DataFrame =
    df.filter(hashUniformPpm(col(keyCol), salt) <
      least(lit(1000000L), greatest(lit(0L), weightPpm)))

  /** Corpus mixing to target stratum proportions — the data-mixing step
    * of a pretraining pipeline ("40% en, 15% each of es/de/fr/zh"):
    * compute, per stratum, the deterministic keep-rate that yields the
    * LARGEST corpus achievable at exactly the target mix
    * (`n_max = min_s floor(n_s·10^6 / share_ppm_s)`, then
    * `rate_ppm_s = min(10^6, floor(n_max·share_ppm_s / n_s))`), and keep
    * rows by the same md5-uniform Bernoulli as [[hashSample]]. All rate
    * arithmetic is integer (ppm shares, floor division) so any engine
    * replays the exact keep-set; realized proportions are binomially
    * tight around the targets — the scalable form (a per-stratum
    * EXACT-count cut needs a per-stratum global sort; see
    * [[stratifiedQuota]] for bounded quotas).
    *
    * Cost: one aggregate-only scan for the stratum counts (bounded
    * output, broadcast back) + the filter scan. Returns the kept rows
    * with `n_s` (stratum size) and `rate_ppm` attached.
    */
  def mixToProportions(df: DataFrame, stratumCol: String, keyCol: String,
      sharesPpm: Seq[(String, Long)], salt: String = "mix"): DataFrame = {
    require(sharesPpm.nonEmpty && sharesPpm.forall(_._2 > 0),
      "every stratum share must be positive ppm")
    val spark = df.sparkSession
    import spark.implicits._
    val shares = sharesPpm.toDF(stratumCol, "share_ppm")
    // checkpointed: caps feeds both the n_max reduction and the rate
    // projection — without it each branch re-runs the counting scan
    val caps = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("n_s"))
      .join(broadcast(shares), stratumCol)
      .withColumn("cap", expr("n_s * CAST(1000000 AS BIGINT) div share_ppm"))
      .localCheckpoint(eager = false)
    val rates = caps
      .crossJoin(broadcast(caps.agg(min(col("cap")).as("n_max"))))
      .withColumn("rate_ppm",
        least(lit(1000000L), expr("n_max * share_ppm div n_s")))
      .select(col(stratumCol), col("n_s"), col("rate_ppm"))
    df.join(broadcast(rates), stratumCol)
      .filter(hashUniformPpm(col(keyCol), salt) < col("rate_ppm"))
  }

  /** Fixed-size priority sample (Duffield–Lund–Thorup): each row draws
    * a deterministic uniform `u` from md5(key|salt) and gets priority
    * `q = w / u`; the sample is the k largest priorities and the
    * threshold `τ` is the (k+1)-th. Reported `est_w = max(w, τ)` is the
    * Horvitz–Thompson-style weight that makes any subset-sum over the
    * sample an UNBIASED estimate of the same sum over the full corpus —
    * the fixed-budget complement of [[weightedSample]] (which keeps a
    * weight-proportional FRACTION, not a fixed count).
    *
    * Arithmetic is integer-exact and engine-portable: u is a 40-bit
    * hash, `q = w·2^40 div (h+1)`, so the oracle replays the exact
    * sample and estimator. Contract: weights must be positive and below
    * 2^23 (q stays under 2^63); zero/negative-weight rows are excluded
    * (DLT samples strictly positive weights).
    *
    * Scale: one scan + one global top-(k+1) (TakeOrdered — per-partition
    * heaps then a k-sized driver merge, never a full sort); the rank
    * window and threshold run on the (k+1)-row cut — bounded by
    * construction, the t17 stance.
    */
  def prioritySample(df: DataFrame, keyCol: String, weight: Column, k: Int,
      salt: String = "psample"): DataFrame = {
    val base = df
      .withColumn("w", weight.cast("long"))
      .filter(col("w") > 0)
      .withColumn("__h",
        conv(substring(md5(concat(col(keyCol).cast("string"),
          lit("|" + salt))), 1, 10), 16, 10).cast("long"))
      .withColumn("priority", expr(s"w * ${1L << 40}L div (__h + 1)"))
      .drop("__h")
    val top = base.orderBy(col("priority").desc, col(keyCol)).limit(k + 1)
      .localCheckpoint(eager = false) // threshold + rank share the cut
    val thr = top.agg(count(lit(1)).as("n"), min(col("priority")).as("mn"))
      .select(when(col("n") === k + 1, col("mn")).otherwise(lit(0L))
        .as("tau"))
    val ranked = top.withColumn("__rk", row_number().over(
      Window.orderBy(col("priority").desc, col(keyCol))))
    ranked.filter(col("__rk") <= k).drop("__rk")
      .crossJoin(broadcast(thr))
      .withColumn("est_w", greatest(col("w"), col("tau")))
  }

  /** Per-STRATUM fixed-size priority sample: [[prioritySample]]'s DLT
    * scheme independently within each group — k rows per stratum, each
    * with its stratum's own threshold `τ_g` and Horvitz–Thompson
    * `est_w = max(w, τ_g)`, so per-stratum subset sums stay unbiased
    * (balanced corpus construction that can still extrapolate each
    * source's token totals). Selection is the WINDOW-FREE
    * [[PriorityTopKAggregator]]: map-side k-slot partials per stratum
    * per task, so a mega-stratum splits like any hash aggregate instead
    * of pinning a reducer; τ and the sample cut are array arithmetic on
    * the ≤(k+1)-slot result — nothing corpus-sized is ever ranked.
    * Output: (group, rank, id, w, priority, tau, est_w), rank 1-based
    * by (priority desc, id asc).
    *
    * `keyCol` MUST be integral: the aggregator's k-slot buffer carries
    * the id as a long (unlike [[prioritySample]], which keys on any
    * type). A non-integral key is rejected eagerly — the silent
    * cast-to-null it used to produce yielded a wrong sample with no
    * error. Hash a string id to long first if needed.
    */
  def prioritySampleByGroup(df: DataFrame, groupCol: String, keyCol: String,
      weight: Column, k: Int, salt: String = "psample"): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val keyType = df.schema(keyCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(keyType),
      s"prioritySampleByGroup requires an integral key column " +
        s"(the top-k buffer stores ids as long); '$keyCol' is $keyType — " +
        "hash or cast it to a long id first, or use prioritySample")
    val base = df
      .withColumn("w", weight.cast("long"))
      .filter(col("w") > 0)
      .withColumn("__h",
        conv(substring(md5(concat(col(keyCol).cast("string"),
          lit("|" + salt))), 1, 10), 16, 10).cast("long"))
      .withColumn("priority", expr(s"w * ${1L << 40}L div (__h + 1)"))
    val topk = udaf(PriorityTopKAggregator(k + 1))
    base.groupBy(col(groupCol))
      .agg(topk(col("priority"), col(keyCol).cast("long"), col("w"))
        .as("arr"))
      .select(col(groupCol),
        when(size(col("arr")) === k + 1,
          element_at(col("arr"), k + 1).getField("priority"))
          .otherwise(0L).as("tau"),
        posexplode(slice(col("arr"), 1, k)))
      .select(col(groupCol), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as(keyCol), col("col.w").as("w"),
        col("col.priority").as("priority"), col("tau"),
        greatest(col("col.w"), col("tau")).as("est_w"))
  }

  /** Temperature-scaled mixture allocation (τ = ½, the multilingual
    * mixing rule): allocate a global token budget across strata with
    * weights ∝ √supply — low-resource strata upweighted relative to
    * their supply share — capped at each stratum's supply, with ONE
    * deterministic redistribution round of the capped surplus
    * proportional to remaining headroom. Everything after the single
    * corpus aggregate is integer arithmetic on a strata-sized frame
    * (√ via floor(sqrt(double)) — IEEE-correctly-rounded on any
    * engine, so the floor is deterministic): one groupBy scan, two
    * broadcast 1-row totals, no windows, no iteration. At 100 TB this
    * is the mixture-planning step a training pipeline runs before
    * sharding; its cost is the scan.
    *
    * Output per stratum: `supply_tokens`, `weight_s` (=⌊√supply⌋),
    * `target_ppm` (temperature share), `alloc_tokens`, `capped`
    * (1 when the naive target exceeded supply), `fill_ppm`
    * (alloc/supply). `budgetPermille` is the budget as a share of the
    * total supply; at 900‰ small strata genuinely cap on the gate
    * corpus, so the redistribution path is data-exercised.
    */
  def temperatureMixAllocation(docs: DataFrame, groupCol: String,
      tokens: Column, budgetPermille: Long = 900L): DataFrame = {
    require(budgetPermille > 0 && budgetPermille <= 1000,
      s"budgetPermille must be in (0, 1000], got $budgetPermille")
    val supply = docs.groupBy(col(groupCol))
      .agg(sum(tokens).as("supply_tokens"))
      .withColumn("weight_s",
        floor(sqrt(col("supply_tokens").cast("double"))).cast("bigint"))
      .localCheckpoint(false)
    val tot = supply.agg(sum(col("supply_tokens")).as("__tot"),
      sum(col("weight_s")).as("__sw"))
    // overflow posture: corpus-total-scale products (budget × weight,
    // surplus × headroom, alloc × 10⁶) exceed Long at the multi-
    // trillion-token scale this plans for (budget ~1e13 × weight ~3e6
    // wraps silently in non-ANSI Spark) — widen each product through
    // decimal(38,0); `div` (IntegralDivide) brings it back to BIGINT.
    // weight_s·10⁶ needs no widening (weight ≤ √(2⁶³) ≈ 3e9 → ≤ 3e15).
    val a1 = supply.crossJoin(broadcast(tot))
      .withColumn("__budget",
        expr(s"CAST(__tot AS DECIMAL(38,0)) * $budgetPermille div 1000"))
      .withColumn("__naive",
        // greatest(,1): an all-zero-token corpus zeroes __sw — Spark
        // would yield NULL where the DuckDB replay errors on /0
        expr("CAST(__budget AS DECIMAL(38,0)) * weight_s " +
          "div greatest(__sw, 1L)"))
      .withColumn("__alloc1", least(col("supply_tokens"), col("__naive")))
    val tot2 = a1.agg(sum(col("__alloc1")).as("__a1"),
      sum(expr("supply_tokens - __alloc1")).as("__head"))
    a1.crossJoin(broadcast(tot2))
      .withColumn("alloc_tokens", expr(
        "__alloc1 + least(supply_tokens - __alloc1, " +
          "CAST(__budget - __a1 AS DECIMAL(38,0)) " +
          "* (supply_tokens - __alloc1) " +
          "div greatest(__head, 1L))"))
      .withColumn("target_ppm",
        expr("weight_s * 1000000L div greatest(__sw, 1L)"))
      .withColumn("capped",
        (col("__naive") >= col("supply_tokens")).cast("int"))
      .withColumn("fill_ppm",
        expr("CAST(alloc_tokens AS DECIMAL(38,0)) * 1000000L " +
          "div greatest(supply_tokens, 1L)"))
      .select(col(groupCol), col("supply_tokens"), col("weight_s"),
        col("target_ppm"), col("alloc_tokens"), col("capped"),
        col("fill_ppm"))
  }

  /** Per-stratum quota sample: the `quota` rows of each stratum with the
    * smallest (uniform, key) — deterministic, order-free, and exactly
    * `min(quota, |stratum|)` rows per stratum (language-balanced corpus
    * downsampling).
    */
  def stratifiedQuota(df: DataFrame, strataCol: String, keyCol: String,
      quota: Int, salt: String = "sample"): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(hashUniformPpm(col(keyCol), salt), col(keyCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= quota)
      .drop("__rk")
  }

  /** Temperature mixture allocation under per-stratum EPOCH CAPS — the
    * data-constrained regime [[temperatureMixAllocation]] cannot model:
    * when the token budget exceeds what single-epoch sampling can
    * supply, real mixers repeat data, but bounded ("no more than ~2
    * epochs of any source" — repetition beyond that measurably decays,
    * the t49/Muennighoff result). Here each stratum's ceiling is
    * `supply · maxEpochsPermille/1000` (may EXCEED supply — that is the
    * point), allocation is ∝ √supply capped at the ceiling, one
    * deterministic surplus-redistribution round proportional to
    * remaining cap headroom, and any budget the caps make unreachable
    * is reported as `unalloc_tokens` — conservation is explicit, never
    * silently dropped (Σalloc + unalloc = budget, spec-pinned).
    *
    * Same plan economics as t44: ONE corpus aggregate, then integer
    * arithmetic on a |strata|-row frame against broadcast 1-row totals;
    * every corpus-total-scale product decimal(38,0)-widened.
    * `epochs_permille` (alloc·1000 div supply) is the planner's
    * read-out: >1000 means that stratum repeats.
    */
  def cappedMixAllocation(docs: DataFrame, groupCol: String,
      tokens: Column, budgetPermille: Long,
      maxEpochsPermille: Long): DataFrame = {
    require(budgetPermille > 0,
      s"budgetPermille must be positive, got $budgetPermille")
    require(maxEpochsPermille > 0,
      s"maxEpochsPermille must be positive, got $maxEpochsPermille")
    val supply = docs.groupBy(col(groupCol))
      .agg(sum(tokens).as("supply_tokens"))
      .withColumn("weight_s",
        floor(sqrt(col("supply_tokens").cast("double"))).cast("bigint"))
      .withColumn("cap_tokens", expr(
        s"CAST(supply_tokens AS DECIMAL(38,0)) * $maxEpochsPermille " +
          "div 1000"))
      .localCheckpoint(false)
    val tot = supply.agg(sum(col("supply_tokens")).as("__tot"),
      sum(col("weight_s")).as("__sw"))
    val a1 = supply.crossJoin(broadcast(tot))
      .withColumn("__budget",
        expr(s"CAST(__tot AS DECIMAL(38,0)) * $budgetPermille div 1000"))
      .withColumn("__naive", // greatest-guard mirrors the oracle's
        // GREATEST(t.sw, 1) and the t44 sibling — an all-zero-supply
        // corpus must yield 0, not a NULL that least() happens to skip
        expr("CAST(__budget AS DECIMAL(38,0)) * weight_s " +
          "div greatest(__sw, 1L)"))
      .withColumn("__alloc1", least(col("cap_tokens"), col("__naive")))
    val tot2 = a1.agg(sum(col("__alloc1")).as("__a1"),
      sum(expr("cap_tokens - __alloc1")).as("__head"))
    val fin = a1.crossJoin(broadcast(tot2))
      .withColumn("alloc_tokens", expr(
        "__alloc1 + least(cap_tokens - __alloc1, " +
          "CAST(__budget - __a1 AS DECIMAL(38,0)) " +
          "* (cap_tokens - __alloc1) " +
          "div greatest(__head, 1L))"))
      .localCheckpoint(false) // rows + the Σalloc total
    val tot3 = fin.agg(sum(col("alloc_tokens")).as("__af"))
    fin.crossJoin(broadcast(tot3))
      .select(col(groupCol), col("supply_tokens"), col("cap_tokens"),
        col("weight_s"), col("alloc_tokens"),
        expr("CAST(alloc_tokens AS DECIMAL(38,0)) * 1000 " +
          "div greatest(supply_tokens, 1L)").as("epochs_permille"),
        // at-ceiling AFTER redistribution (not t44's naive-exceeded
        // flag): redistribution can fill a stratum whose naive share
        // was below cap, and "this stratum can absorb no more budget"
        // is the fact the planner acts on
        (col("alloc_tokens") === col("cap_tokens")).cast("int")
          .as("capped"),
        expr("CAST(__budget - __af AS BIGINT)").as("unalloc_tokens"))
  }

  /** Deterministic Poisson-style bootstrap (Chamandy et al., "Estimating
    * uncertainty for massive data streams", the map-reduce bootstrap):
    * every corpus statistic deserves an error bar, and the classic
    * resample-n-rows bootstrap needs global coordination a cluster
    * can't afford. Instead each row independently appears
    * `copies ~ Binomial(4, ¼)` times in each replicate (mean 1,
    * variance ¾ — the standard Poisson-bootstrap surrogate), with the
    * coins read as 2-bit digits of md5 uniforms on (key, block) —
    * seven trials per 60-bit hash — fully deterministic, so the
    * oracle replays every replicate exactly. Output: one row per replicate `(trial, n_eff, w_sum,
    * mean_milli)`; the spread of `mean_milli` across trials IS the
    * sampling distribution of the mean.
    *
    * Scale shape: ONE aggregate-only pass with ZERO row fan-out — the
    * trials axis is 2·`trials` conditional sums in a single wide
    * aggregate (each replicate's copy count is a column expression on
    * the scan row, the a9 profiler shape), so map-side partials ship
    * one wide row per task and the `trial` rows come from a `stack`
    * unpivot of the 1-row result. The earlier form exploded a
    * `trials`× row axis before the groupBy — linear, but `trials`×
    * the scan-stage rows (and their shuffle write) bought nothing the
    * conditional aggregate doesn't compute from the same md5 coins.
    */
  def bootstrapMeans(df: DataFrame, keyCol: String, value: Column,
      trials: Int = 32): DataFrame = {
    require(trials > 0, s"trials must be positive, got $trials")
    val base = df
      .select(col(keyCol).cast("string").as("__k"),
        value.cast("long").as("__v"))
    // Binomial(4, 1/4) copy counts from SEVEN trials per md5: each
    // 60-bit hash (15 hex chars) carries 30 uniform 2-bit digits;
    // trial t takes the 4 consecutive digits at offset ((t−1) mod 7)·4
    // of block (t−1) div 7 — "digit = 0" is an EXACT probability-¼
    // event, and all coins are independent because they occupy
    // disjoint bit positions of independent uniform values. Hashing is
    // the scan stage's dominant cost: the original form paid one md5
    // per COIN (128/row at 32 trials), r13 first cut it to one per
    // TRIAL (32/row), and the block packing lands at ⌈trials/7⌉ = 5.
    val nBlocks = (trials + 6) / 7
    val withHash = base.select(col("__v") +:
      (0 until nBlocks).map(b =>
        conv(substring(md5(concat_ws("|", col("__k"), lit("bs"),
          lit(b.toLong))), 1, 15), 16, 10).cast("long").as(s"__h$b")): _*)
    def copies(t: Int): Column = {
      val blk = (t - 1) / 7
      val off = ((t - 1) % 7) * 4
      (0 to 3).map(i =>
        when(shiftright(col(s"__h$blk"), 2 * (off + i))
            .bitwiseAND(lit(3L)) === 0L, 1L).otherwise(0L))
        .reduce(_ + _)
    }
    // hashes materialize once per (row, block) in a projection; the
    // copy-count projection reads each hash's bit slices and the
    // aggregate reads each count twice (n_eff and w_sum) without
    // re-hashing
    val withCopies = withHash.select(col("__v") +:
      (1 to trials).map(t => copies(t).as(s"__c$t")): _*)
    // coalesce: an EMPTY corpus yields `trials` all-zero replicate rows
    // (the un-grouped aggregate always emits its one wide row)
    val aggs = (1 to trials).flatMap(t => Seq(
      coalesce(sum(col(s"__c$t")), lit(0L)).as(s"n_$t"),
      coalesce(sum(col(s"__c$t") * col("__v")), lit(0L)).as(s"w_$t")))
    withCopies.agg(aggs.head, aggs.tail: _*)
      .select(expr("stack(" + trials + ", " +
        (1 to trials).map(t => s"${t}L, n_$t, w_$t").mkString(", ") +
        ") as (trial, n_eff, w_sum)"))
      .withColumn("mean_milli",
        expr("w_sum * 1000 div greatest(n_eff, 1L)"))
  }

  /** Referentially-consistent subsetting: sample PARENT rows with the
    * deterministic md5 Bernoulli on their primary key, and let CHILD
    * rows follow their parent's decision via a semi join — the
    * standard way to cut a dev/test environment out of a warehouse
    * without dangling foreign keys (a row-independent sample of both
    * tables breaks referential integrity almost surely). Determinism
    * means the subset is reproducible across runs and engines, and
    * any table keyed by the same parent can join the same decision.
    *
    * Scale shape: the parent filter is scan-stage (no shuffle); the
    * child semi join shuffles on the key exactly once — and when the
    * kept-key set is small, AQE broadcasts it; at larger rates the
    * j13 bloom-pruned semi join is the drop-in scale path.
    */
  def referentialSample(parent: DataFrame, pkCol: String,
      child: DataFrame, fkCol: String, ratePpm: Long,
      salt: String = "refsample"): DataFrame = {
    val keep = parent
      .filter(hashUniformPpm(col(pkCol), salt) < lit(ratePpm))
      .select(col(pkCol).as(fkCol))
    child.join(keep, Seq(fkCol), "left_semi")
  }

  /** Epoch-decay allocation audit (the data-constrained-scaling
    * accounting of Muennighoff et al. 2023, "Scaling Data-Constrained
    * Language Models": repeated epochs of the same tokens are worth
    * geometrically less — here the conservative r = ½ halving, with
    * value treated as exhausted past 20 epochs). Given the same √-
    * temperature weights as [[temperatureMixAllocation]] but a budget
    * that EXCEEDS total supply, the naive weight-proportional
    * allocation over-epochs small strata; this audit prices that:
    * per stratum, the full epochs `k = alloc div supply`, the partial
    * remainder, and the EFFECTIVE token value
    * `Σ_{i=1..k} supply div 2^(i-1) + (alloc − k·supply) div 2^k` —
    * all exact integer arithmetic (the epoch sum is a ≤20-element
    * `sequence` explode per stratum, both engines replay it term by
    * term). `efficiency_ppm = effective·10⁶ div alloc` < 10⁶ flags the
    * strata whose marginal tokens a re-balancing should move.
    *
    * Scale shape: one corpus aggregate to per-stratum supply; the rest
    * is arithmetic on ≤|strata|·20 rows against two broadcast 1-row
    * totals.
    */
  def epochDecayAudit(df: DataFrame, stratumCol: String, tokens: Column,
      budgetPermille: Long = 3000L, maxEpochs: Int = 20): DataFrame = {
    require(maxEpochs >= 1 && maxEpochs <= 62, "maxEpochs in [1, 62]")
    val sup = df.groupBy(col(stratumCol))
      .agg(sum(tokens).as("supply_tokens"))
      .filter(col("supply_tokens") > 0)
      .withColumn("weight_s",
        floor(sqrt(col("supply_tokens").cast("double"))).cast("long"))
    val tot = sup.agg(sum(col("supply_tokens")).as("t"),
      sum(col("weight_s")).as("sw"))
    // same decimal(38,0) widening as temperatureMixAllocation: t·permille
    // and budget·weight wrap Long at multi-trillion-token supplies
    val base = sup.crossJoin(broadcast(tot))
      .withColumn("alloc_tokens",
        expr(s"CAST(CAST(t AS DECIMAL(38,0)) * $budgetPermille div 1000" +
          " AS DECIMAL(38,0)) * weight_s div sw"))
      .withColumn("k", least(expr("alloc_tokens div supply_tokens"),
        lit(maxEpochs.toLong)))
      .withColumn("partial_tokens",
        expr("alloc_tokens - k * supply_tokens"))
      .localCheckpoint(eager = false) // epoch sum + final join share it
    // Σ_{i=1..k} supply div 2^(i-1): an explicit per-term sum — each
    // term has its own integer division, so no closed form is exact
    val eps = base.filter(col("k") >= 1)
      .select(col(stratumCol), col("supply_tokens"),
        explode(sequence(lit(1L), col("k"))).as("i"))
      .groupBy(col(stratumCol))
      .agg(sum(expr(
        "supply_tokens div shiftleft(CAST(1 AS BIGINT), CAST(i - 1 AS INT))"))
        .as("full_value"))
    base.join(eps, Seq(stratumCol), "left")
      .withColumn("full_value", coalesce(col("full_value"), lit(0L)))
      .withColumn("effective_tokens",
        expr("full_value + partial_tokens div " +
          "shiftleft(CAST(1 AS BIGINT), CAST(k AS INT))"))
      .withColumn("efficiency_ppm",
        when(col("alloc_tokens") > 0,
          expr("CAST(effective_tokens AS DECIMAL(38,0)) * 1000000 " +
            "div alloc_tokens"))
          .otherwise(lit(0L)))
      .select(col(stratumCol), col("supply_tokens"), col("alloc_tokens"),
        col("k").as("epochs_full"), col("partial_tokens"),
        col("effective_tokens"), col("efficiency_ppm"))
  }

  /** Cluster-balanced ("soft-dedup") sampling: instead of hard keep-one
    * dedup, every row survives with probability 1/|its duplicate
    * cluster| — so each cluster contributes ONE document in expectation
    * and repeated content stops dominating the mixture, while rare
    * phrasings of duplicated material still occasionally survive (the
    * keep-with-probability-1/n convention web-corpus pipelines use when
    * hard dedup is too lossy). `members` is a duplicate-cluster
    * membership frame `(memberIdCol, clusterIdCol)` — e.g. the
    * connected components of the Jaccard pair graph; rows of `df`
    * absent from it are singletons and keep rate 10⁶ ppm.
    *
    * Deterministic: the coin is the same md5 uniform every sampler here
    * uses, so the oracle replays the exact kept set. Scale shape:
    * cluster sizes are one aggregate on the INDEX-sized membership
    * frame (only paired docs appear in it); the rate join back to the
    * corpus is id-keyed and broadcasts whenever the dup set is small
    * relative to the corpus — there is no corpus-axis window anywhere.
    * Output: kept rows as `(idCol, cluster_size, rate_ppm)`.
    */
  def clusterBalancedSample(df: DataFrame, idCol: String,
      members: DataFrame, memberIdCol: String, clusterIdCol: String,
      salt: String = "cbsample"): DataFrame = {
    val sizes = members
      .groupBy(col(clusterIdCol)).agg(count(lit(1)).as("__cs"))
    val perDoc = members.join(sizes, clusterIdCol)
      .select(col(memberIdCol).as(idCol), col("__cs"))
    df.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .withColumn("cluster_size", coalesce(col("__cs"), lit(1L)))
      .withColumn("rate_ppm", expr("1000000L div cluster_size"))
      .filter(hashUniformPpm(col(idCol), salt) < col("rate_ppm"))
      .select(col(idCol), col("cluster_size"), col("rate_ppm"))
  }
}
