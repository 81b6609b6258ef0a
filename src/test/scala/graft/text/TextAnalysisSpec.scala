package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token and subword counts") {
    val df = Seq("  the cat  sat ", "ab1 c,d").toDF("text").select(
      TextAnalysis.tokenCount(col("text")).as("n"),
      TextAnalysis.subwordCount(col("text")).as("sw"),
      TextAnalysis.punctCount(col("text")).as("p"))
    val rows = df.collect()
    assert(rows(0).getInt(0) == 3)
    // "ab1 c,d": letters abcd=4 → 1; digit 1 → 1; punct ',' → 1 ⇒ 3 subwords
    assert(rows(1).getInt(0) == 2 && rows(1).getLong(1) == 3L && rows(1).getInt(2) == 1)
  }

  test("language id votes by distinct stopword hits") {
    val df = Seq(
      "the cat is on the mat with food", // en
      "la casa de el perro y los gatos", // es
      "zzz qqq www").toDF("text")
      .select(TextAnalysis.langId(col("text")).as("l"))
    assert(df.as[String].collect().toSeq == Seq("en", "es", "und"))
  }

  test("fingerprint matches the reference polynomial formula") {
    val text = "abc z9"
    val want = text.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % 2147483647L)
    val got = Seq(text).toDF("text")
      .select(TextAnalysis.fingerprint(col("text"))).as[Long].head()
    assert(got == want)
  }

  test("content hash is standard md5") {
    val got = Seq("hello").toDF("text")
      .select(TextAnalysis.contentHash(col("text"))).as[String].head()
    assert(got == "5d41402abc4b2a76b9719d911017c592")
  }

  test("quality score is bounded and favors stopword-bearing prose") {
    val df = Seq(
      "the cat is on the mat and it is warm in the sun for now",
      ";;;; !!!! ???? ####").toDF("text")
      .select(TextAnalysis.qualityScore(col("text")).as("q"))
    val Array(prose, junk) = df.as[Long].collect()
    assert(prose > junk)
    assert(prose <= 300 && junk >= 0)
  }

  test("quality score is TOTAL: empty/whitespace docs score without ANSI errors") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // ANSI mode (Spark 4 default) throws on int casts of NaN — the
    // zero-token/zero-char guards must keep these rows alive
    val got = Seq("", "   ", "!!!", "the of and").toDF("text")
      .select(TextAnalysis.qualityScore(col("text")).as("q"))
      .as[Long].collect()
    assert(got(0) == 100) // 0 tokens, 0 chars: 0 + 0 + (100 - 0)
    assert(got(1) == 100) // whitespace only
    assert(got(2) == 1 + 0 + 0) // "!!!": 1 token, all punct
    assert(got(3) > 200) // real prose with stopwords scores high
  }

  test("chunking: overlap lookback, short docs one chunk, empty docs none") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "a b"),                                     // shorter than a chunk
      (3L, "   ")                                      // no tokens
    ).toDF("doc_id", "text")
    val got = TextAnalysis.chunkRows(docs, "doc_id", "text", 4, 2)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    // doc 1: step 2, qualifying starts are < n − overlap = 8, so
    // 0,2,4,6 → 4 chunks. A start at 8 would emit "t9 t10" — a strict
    // subset of the chunk at 6 — which is exactly what the bound exists
    // to prevent
    val doc1 = got.filter(_._1 == 1L).toSeq
    assert(doc1.size == 4, doc1)
    assert(doc1(0) == (1L, 0, 4, "t1 t2 t3 t4"))
    assert(doc1(1) == (1L, 1, 4, "t3 t4 t5 t6"), "2-token lookback overlap")
    assert(doc1.last == (1L, 3, 4, "t7 t8 t9 t10"),
      "final chunk must end at the last token without a subset tail")
    // no chunk's token set is contained in another chunk of the same doc
    val sets = doc1.map(_._4.split(" ").toSet)
    assert(!sets.combinations(2).exists(p => p(0).subsetOf(p(1)) ||
      p(1).subsetOf(p(0))), "subset chunk emitted")
    assert(got.filter(_._1 == 2L).toSeq == Seq((2L, 0, 2, "a b")))
    assert(!got.exists(_._1 == 3L), "empty docs chunk to nothing")
  }

  test("PII redaction: emails and phones masked, counts match, clean text untouched") {
    val df = Seq(
      (1L, "reach me at jane.doe+spam@mail.example.org or +56 9 12345678 ok"),
      (2L, "two mails a@b.co and c.d@e-f.io, phone +1 415-555-0199 end"),
      (3L, "no pii here, just 1234567890 and an at sign @ alone"),
      (4L, "")
    ).toDF("id", "t")
    val got = df.select(col("id"),
        TextAnalysis.emailCount(col("t")).as("ne"),
        TextAnalysis.phoneCount(col("t")).as("np"),
        TextAnalysis.redactPii(col("t")).as("red"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(got(0) == (1L, 1, 1, "reach me at [EMAIL] or [PHONE] ok"))
    assert(got(1) == (2L, 2, 1, "two mails [EMAIL] and [EMAIL], phone [PHONE] end"))
    // bare digits / lone @ must NOT trigger (conservative patterns)
    assert(got(2) == (3L, 0, 0, "no pii here, just 1234567890 and an at sign @ alone"))
    assert(got(3) == (4L, 0, 0, ""))
  }

  test("canonicalText: case, padding, punctuation, whitespace runs all fold") {
    val got = Seq(
      "  The CAT,  sat!  ",
      "the cat sat",
      "the. (cat) 'sat'?",
      "end . start",
      "end  start",
      "",
      "  ,.! ").toDF("t")
      .select(TextAnalysis.canonicalText(col("t"))).as[String].collect()
    assert(got(0) == "the cat sat" && got(1) == "the cat sat"
      && got(2) == "the cat sat")
    // punctuation deletes BEFORE whitespace collapses: both forms agree
    assert(got(3) == "end start" && got(4) == "end start")
    assert(got(5) == "" && got(6) == "")
  }

  test("canonicalText recovers planted re-crawl variants under content hash") {
    val base = Seq("alpha beta gamma", "delta epsilon").toDF("text")
    val planted = base.select(
      concat(lit("  "), upper(col("text")), lit("   ")).as("text"))
    val aug = base.unionByName(planted)
    val raw = aug.select(TextAnalysis.contentHash(col("text"))).distinct().count()
    val canon = aug.select(TextAnalysis.contentHash(
      TextAnalysis.canonicalText(col("text")))).distinct().count()
    assert(raw == 4L && canon == 2L) // lift = planted rows exactly
  }
}
