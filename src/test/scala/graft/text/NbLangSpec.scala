package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NbLangSpec extends SparkSpec {
  import spark.implicits._

  private val B = 1024

  private def fitAndPredict(train: Seq[(String, String)],
      hold: Seq[(Long, String)]) = {
    val tr = train.toDF("lang", "text")
    val hd = hold.toDF("doc_id", "text")
    val counts = NbLang.trainCounts(tr, "lang", "text", B)
    val labels = NbLang.labelStats(tr, "lang", counts)
    NbLang.predict(hd, "doc_id", "text", counts, labels, B)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
  }

  test("separable corpus: holdout evidence routes to the right label") {
    val train = Seq(
      ("aa", "apple apple banana"), ("aa", "apple cherry"),
      ("bb", "zebra yak zebra"), ("bb", "yak xylo"))
    val got = fitAndPredict(train,
      Seq((1L, "apple banana apple"), (2L, "zebra zebra yak"),
        (3L, "cherry apple")))
    assert(got(1L) == "aa" && got(2L) == "bb" && got(3L) == "aa")
  }

  test("gramless holdout doc falls back to the prior argmin") {
    val train = Seq( // 'aa' is the majority class: 3 docs vs 1
      ("aa", "apple"), ("aa", "banana"), ("aa", "cherry"), ("bb", "zebra"))
    val got = fitAndPredict(train, Seq((9L, ""), (10L, "   ")))
    assert(got(9L) == "aa" && got(10L) == "aa")
  }

  test("exact-tie evidence breaks to the lexicographically smaller label") {
    // perfectly symmetric classes; the shared token scores identically
    val train = Seq(("aa", "common"), ("bb", "common"))
    val got = fitAndPredict(train, Seq((5L, "common common")))
    assert(got(5L) == "aa")
  }

  test("unseen token is evidence FOR the smaller class (NB smoothing)") {
    // T_aa >> T_bb; an unseen bucket prices 1/(T+B): cheaper under bb
    val manyA = "apple " * 3000
    val train = Seq(("aa", manyA.trim), ("bb", "zebra"))
    val got = fitAndPredict(train, Seq((7L, "neverseen")))
    assert(got(7L) == "bb")
  }

  test("bag-of-words property: token order never changes a prediction") {
    val train = Seq(("aa", "apple banana apple cherry"),
      ("bb", "zebra yak zebra xylo"))
    val forward = fitAndPredict(train,
      Seq((1L, "apple cherry banana"), (2L, "zebra xylo yak")))
    // same multisets, shuffled order — multinomial NB sees only counts
    val shuffled = fitAndPredict(
      Seq(("aa", "cherry apple apple banana"),
        ("bb", "xylo zebra zebra yak")),
      Seq((1L, "banana apple cherry"), (2L, "yak zebra xylo")))
    assert(forward == shuffled)
    assert(forward(1L) == "aa" && forward(2L) == "bb")
  }

  test("charGrams: windows, boundary folding, prefix, short/empty text") {
    val got = Seq(("a b", 1), ("Xy", 2), ("", 3), ("abcd", 4))
      .toDF("t", "i").orderBy("i")
      .select(NbLang.charGrams(col("t"), 3))
      .as[Seq[String]].collect().toSeq
    assert(got(0) == Seq("3g:a_b")) // whitespace folds to the _ boundary
    assert(got(1) == Nil)           // shorter than n → no grams
    assert(got(2) == Nil)
    assert(got(3) == Seq("3g:abc", "3g:bcd"))
  }

  test("char grams generalize to UNSEEN tokens where token features " +
      "cannot — the lang-ID property the t53 featurization buys") {
    // every holdout token is unseen: the token model has no evidence
    // and routes BOTH docs to whichever class the unseen-bucket
    // surprisal favors; char grams recover the label from the seen
    // sub-token prefix (ax-/bz- morphology — what real lang-ID is)
    val train = Seq(
      ("aa", "axqq axrr axss"), ("bb", "bzqq bzrr"),
      ("bb", "bzss bzqq"), ("bb", "bzrr bzss"))
    val hold = Seq((1L, "axqz"), (2L, "bzqz"))
    def run(feats: org.apache.spark.sql.Column =>
        org.apache.spark.sql.Column) = {
      val tr = train.toDF("lang", "text")
      val c = NbLang.trainCounts(tr, "lang", "text", B, feats)
      val l = NbLang.labelStats(tr, "lang", c)
      NbLang.predict(hold.toDF("doc_id", "text"), "doc_id", "text",
          c, l, B, feats)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    }
    val tokensOnly = run(graft.text.TextAnalysis.tokens(_))
    assert(tokensOnly(1L) == tokensOnly(2L),
      s"token features cannot separate unseen tokens: $tokensOnly")
    val withGrams = run(NbLang.tokenCharFeatures)
    assert(withGrams(1L) == "aa" && withGrams(2L) == "bb",
      s"char grams must route the unseen-token holdout: $withGrams")
  }

  test("prediction is partition-count independent and total") {
    val train = (1 to 40).map(i =>
      (if (i % 2 == 0) "ee" else "ff", s"tok${i % 7} tok${i % 3} shared"))
    val hold = (1L to 20L).map(i => (i, s"tok${i % 7} shared"))
    val tr1 = train.toDF("lang", "text").repartition(1)
    val tr7 = train.toDF("lang", "text").repartition(7)
    def run(tr: org.apache.spark.sql.DataFrame) = {
      val c = NbLang.trainCounts(tr, "lang", "text", B)
      val l = NbLang.labelStats(tr, "lang", c)
      NbLang.predict(hold.toDF("doc_id", "text"), "doc_id", "text", c, l, B)
        .orderBy("doc_id").collect().toSeq
    }
    val a = run(tr1)
    assert(a == run(tr7))
    assert(a.size == 20) // every holdout doc gets exactly one prediction
  }
}
