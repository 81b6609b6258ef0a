package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained multinomial Naive Bayes text classifier over hashed feature
  * buckets (tokens by default; tokens + char 3-grams via
  * [[tokenCharFeatures]]) — the classical trained upgrade to [[TextAnalysis.langId]]'s
  * fixed stopword vote (t52 measured that vote bleeding 'en' across
  * every label; the honest next step is a model FIT ON the corpus's own
  * labels, and an audit of whether even that recovers them).
  *
  * Everything is exact integer arithmetic so the DuckDB oracle replays
  * training AND inference bit-for-bit:
  *   - tokens hash into `nBuckets` md5 buckets (hashing trick — the
  *     model is bounded |labels|·nBuckets regardless of vocabulary);
  *   - Laplace-smoothed class-conditional surprisal of bucket b under
  *     label l is the dampened log₂ `length(bin((T_l + B) div (c_lb + 1)))`
  *     (the t20/t23/t25 convention);
  *   - the class prior enters once per document as
  *     `length(bin((D + L) div (p_l + 1)))`;
  *   - prediction = argmin of total surprisal, ties broken by label
  *     ascending (deterministic on every engine).
  *
  * Plan shape at 100 TB: training is ONE (label, bucket) shuffle with
  * map-side combine into a ≤|labels|·nBuckets model frame; scoring
  * cross-joins per-document bucket counts with the |labels|-row label
  * frame (broadcast) and LEFT-joins the model (broadcast) — unseen
  * buckets price at the c=0 smoothed surprisal instead of silently
  * dropping (the DSIR r11 lesson) — then one grouped sum per
  * (doc, label) and a bounded-list argmin. No corpus-axis window, no
  * driver-side state.
  */
object NbLang {

  /** md5 bucket of a token in [0, nBuckets). */
  def bucketOf(token: Column, nBuckets: Int): Column =
    conv(substring(md5(concat(lit("nb-"), token)), 1, 15), 16, 10)
      .cast("long") % nBuckets

  /** Char n-gram feature array — the standard lang-ID signal (Cavnar &
    * Trenkle 1994): lowercase, whitespace runs folded to `_` so word
    * boundaries are features too, then every length-n window, each
    * prefixed `"<n>g:"` so the gram space cannot collide with token
    * features when both feed one hashed bucket space. A zero-fan-out
    * array expression (transform over sequence) — the explode happens
    * once, in the caller's feature explode, not here.
    */
  def charGrams(text: Column, n: Int): Column = {
    val norm = regexp_replace(lower(text), "\\s+", "_")
    val m = length(norm) - (n - 1)
    // sequence(1, 0) would DESCEND ([1, 0]); guard short/empty/null text
    when(m >= 1, transform(sequence(lit(1), m),
        i => concat(lit(s"${n}g:"), norm.substr(i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Token features PLUS hashed char 3-grams — the t53 feature set:
    * tokens alone cannot separate labels on a shared-vocabulary corpus
    * (the r12 measured negative); char 3-grams are the signal real
    * lang-ID models run on, and the prefix keeps the two families in
    * disjoint regions of the shared bucket space.
    */
  def tokenCharFeatures(text: Column): Column =
    concat(TextAnalysis.tokens(text), charGrams(text, 3))

  /** Fitted model frame: per-(label, bucket) feature count `c` — the
    * sufficient statistic. Bounded by |labels|·nBuckets rows.
    * `feats` maps the text column to its feature array (default: the
    * corpus tokens; [[tokenCharFeatures]] for the lang-ID feature set).
    */
  def trainCounts(docs: DataFrame, labelCol: String, textCol: String,
      nBuckets: Int,
      feats: Column => Column = TextAnalysis.tokens(_)): DataFrame =
    docs.select(col(labelCol).as("label"),
        explode(feats(col(textCol))).as("__tok"))
      .select(col("label"), bucketOf(col("__tok"), nBuckets).as("bucket"))
      .groupBy(col("label"), col("bucket"))
      .agg(count(lit(1)).as("c"))

  /** Label frame: per-label doc prior count `p` and token total `t`
    * (0 when a label's train docs are all gramless). |labels| rows.
    */
  def labelStats(trainDocs: DataFrame, labelCol: String,
      counts: DataFrame): DataFrame =
    labelStatsFromPriors(trainDocs.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("p")), counts)

  /** [[labelStats]] from an already-aggregated prior frame
    * `(label, p)` — the form an accreted store resolves without
    * re-reading history ([[graft.streaming.NbStream]]).
    */
  def labelStatsFromPriors(priors: DataFrame, counts: DataFrame)
      : DataFrame = {
    val totals = counts.groupBy(col("label")).agg(sum(col("c")).as("t"))
    priors.join(totals, Seq("label"), "left")
      .select(col("label"), col("p"), coalesce(col("t"), lit(0L)).as("t"))
  }

  /** Score `docs` against a fitted model: one row per doc with the
    * argmin-surprisal `pred` label. Gramless documents fall back to the
    * prior-only argmin (a document with no tokens is not evidence
    * against the majority class). Output: (idCol, pred).
    */
  def predict(docs: DataFrame, idCol: String, textCol: String,
      counts: DataFrame, labels: DataFrame, nBuckets: Int,
      feats: Column => Column = TextAnalysis.tokens(_)): DataFrame = {
    val dl = labels.agg(sum(col("p")).as("__d"), count(lit(1)).as("__l"))
    val lab = labels.crossJoin(broadcast(dl))
      .withColumn("prior_surp",
        length(bin(expr("(__d + __l) div (p + 1)"))).cast("long"))
      .select(col("label"), col("t"), col("prior_surp"))
      .localCheckpoint(eager = false) // scoring cross + both argmins
    val pdb = docs
      .select(col(idCol), explode(feats(col(textCol))).as("__tok"))
      .select(col(idCol), bucketOf(col("__tok"), nBuckets).as("bucket"))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("k"))
    val scored = pdb.crossJoin(broadcast(lab))
      .join(broadcast(counts), Seq("label", "bucket"), "left")
      .withColumn("surp", length(bin(
        expr(s"(t + $nBuckets) div (coalesce(c, 0L) + 1)"))).cast("long"))
      .groupBy(col(idCol), col("label"))
      .agg((sum(col("k") * col("surp")) + first(col("prior_surp")))
        .as("bits"))
      .groupBy(col(idCol))
      .agg(min(struct(col("bits"), col("label"))).as("__m"))
      .select(col(idCol), col("__m.label").as("pred"))
    // prior-only fallback for gramless docs: 1 row, broadcast
    val fallback = lab
      .agg(min(struct(col("prior_surp"), col("label"))).as("__m"))
      .select(col("__m.label").as("__fb"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .crossJoin(broadcast(fallback))
      .select(col(idCol), coalesce(col("pred"), col("__fb")).as("pred"))
  }
}
