package graft

import org.apache.spark.sql.GraftSqlBridge

import graft.functions.ParseClpMoney

/** SQL-surface registration of the native expressions. Extensions can't be
  * installed on the suite-shared session (they only apply at session
  * creation), so the injection builder is exercised directly and the SQL
  * path through the function registry.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("parse_clp_money is callable from SQL once registered") {
    GraftSqlBridge.registerFunction(spark, "parse_clp_money",
      children => ParseClpMoney(children.head))
    val row = spark.sql(
      """SELECT parse_clp_money('$1.234.567') AS a,
        |       parse_clp_money('1.234,56') AS b,
        |       parse_clp_money('N/A') AS c""".stripMargin).collect().head
    assert(row.getDecimal(0).longValue == 1234567L)
    assert(row.getDecimal(1).toString == "1234.56")
    assert(row.isNullAt(2))
  }

  test("composite text/dedup/similarity layer callable from SQL") {
    GraftExtensions.registerAll(spark)
    val row = spark.sql(
      """SELECT token_count('the quick fox') AS tc,
        |       quality_score('the of and to in') AS q,
        |       lang_id('la que el en y') AS lang,
        |       content_hash('abc') AS h,
        |       shingles('a b c d', 3) AS sh,
        |       jaccard_ppm(array('ab','bc','cd'), array('ab','bc','ce')) AS j,
        |       simhash60('hello world') AS s60,
        |       quantize_vec(array(0.5D, -0.25D)) AS qv,
        |       cosine_q(array(3L, 4L), array(3L, 4L)) AS cos""".stripMargin)
      .collect().head
    assert(row.getAs[Int]("tc") == 3)
    assert(row.getAs[Long]("q") > 200)
    assert(row.getAs[String]("lang") == "es")
    assert(row.getAs[String]("h") == "900150983cd24fb0d6963f7d28e17f72") // md5("abc")
    assert(row.getSeq[String](row.fieldIndex("sh")) == Seq("a b c", "b c d"))
    assert(row.getAs[Long]("j") == 500000L) // 2 of 4 distinct grams
    assert(row.getAs[Long]("s60") != 0L)
    assert(row.getSeq[Long](row.fieldIndex("qv")) == Seq(500L, -250L))
    assert(row.getAs[Double]("cos") == 1.0)
    // the NATIVE quantize expression agrees with the SQL-level form
    val nq = spark.sql(
      "SELECT long_array_quantize(array(0.5D, -0.25D, 0.0015D)) AS v")
      .collect().head.getSeq[Long](0)
    assert(nq == Seq(500L, -250L, 2L), s"native quantize: $nq")
    // SQL-function results agree with the Scala API on real data
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    docs.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, quality_score(text) q, lang_id(text) l, simhash60(text) s FROM ext_docs")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
    val viaApi = docs.select(col("doc_id"),
        graft.text.TextAnalysis.qualityScore(col("text")),
        graft.text.TextAnalysis.langId(col("text")),
        graft.dedup.Dedup.simhash(col("text")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
    assert(viaSql == viaApi)
    // repetition_ppm: 'a b a b' has 3 bigram windows, 2 distinct → 333333
    assert(spark.sql("SELECT repetition_ppm('a b a b', 2) r")
      .collect().head.getLong(0) == 333333L)
    val repSql = spark.sql(
      "SELECT doc_id, repetition_ppm(text, 3) r FROM ext_docs")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val repApi = graft.dedup.Dedup
      .repetitionStats(docs, "doc_id", "text", 3)
      .select("doc_id", "repetition_ppm")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(repSql == repApi)
  }

  test("sampling/chunking/split SQL surface agrees with the Scala API") {
    GraftExtensions.registerAll(spark)
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(80)
    docs.createOrReplaceTempView("ext_docs2")

    // hash sample: same keep-set as Sampling.hashSample
    val keepSql = spark.sql(
      "SELECT doc_id FROM ext_docs2 WHERE hash_sample_keep(CAST(doc_id AS STRING), 200000L, 'sample')")
      .collect().map(_.getLong(0)).toSet
    val keepApi = graft.sampling.Sampling.hashSample(docs, "doc_id", 200000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keepSql == keepApi)
    assert(keepSql.nonEmpty && keepSql.size < 80, s"non-vacuous: ${keepSql.size}")

    // weighted sample: per-row weight from token count, same keep-set
    val wKeepSql = spark.sql(
      """SELECT doc_id FROM ext_docs2
        |WHERE weighted_sample_keep(CAST(doc_id AS STRING),
        |        token_count(text) * 20000L, 'wsample')""".stripMargin)
      .collect().map(_.getLong(0)).toSet
    val wKeepApi = graft.sampling.Sampling.weightedSample(docs, "doc_id",
        graft.text.TextAnalysis.tokenCount(col("text")) * 20000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(wKeepSql == wKeepApi)

    // split assignment: same ternary as the t10 gate query
    val splitSql = spark.sql(
      "SELECT doc_id, split_assign(CAST(doc_id AS STRING)) s FROM ext_docs2")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val u = graft.sampling.Sampling.hashUniformPpm(col("doc_id"), "split")
    val splitApi = docs.select(col("doc_id"),
        org.apache.spark.sql.functions.when(u < 900000L, "train")
          .when(u < 950000L, "val").otherwise("test"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(splitSql == splitApi)

    // chunking: flattened chunk_texts equals chunkRows' chunk_text column
    val chunksSql = spark.sql(
      """SELECT doc_id, pos AS chunk_idx, c AS chunk_text
        |FROM (SELECT doc_id, chunk_texts(text, 50, 10) AS ch FROM ext_docs2)
        |LATERAL VIEW posexplode(ch) AS pos, c""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val chunksApi = graft.text.TextAnalysis.chunkRows(docs, "doc_id", "text", 50, 10)
      .select(col("doc_id"), col("chunk_idx"), col("chunk_text"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(chunksSql == chunksApi)
    assert(chunksSql.nonEmpty)

    // subword_count via the native census matches the Scala API
    val swSql = spark.sql(
      "SELECT doc_id, subword_count(text) c FROM ext_docs2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val swApi = docs.select(col("doc_id"),
        graft.text.TextAnalysis.subwordCount(col("text")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(swSql == swApi)

    // priority sampling: SQL priorities equal the operator's, so
    // ORDER BY sample_priority DESC LIMIT k reproduces the t30 sample
    val prSql = spark.sql(
      """SELECT doc_id, sample_priority(CAST(doc_id AS STRING),
        |         CAST(token_count(text) AS BIGINT)) p
        |FROM ext_docs2 WHERE token_count(text) > 0""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val prApi = graft.sampling.Sampling.prioritySample(docs, "doc_id",
        graft.text.TextAnalysis.tokenCount(col("text")), k = 79)
      .select("doc_id", "priority")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(prApi.forall { case (id, p) => prSql(id) == p })
    assert(prApi.nonEmpty)

    // edit similarity: SQL composition equals editVerifiedPairs' column
    import spark.implicits._
    val pairSql = spark.sql(
      """SELECT edit_sim_ppm('the quick brown fox', 'the quick brown cat', 200) a,
        |       edit_sim_ppm('', '', 200) b""".stripMargin).collect().head
    val pairApi = graft.dedup.Dedup.editVerifiedPairs(
        Seq((1L, 2L)).toDF("id1", "id2"),
        Seq((1L, "the quick brown fox"), (2L, "the quick brown cat"))
          .toDF("doc_id", "text"),
        "doc_id", "text").select("edit_sim_ppm").collect().head.getLong(0)
    assert(pairSql.getLong(0) == pairApi)
    assert(pairSql.getLong(1) == 1000000L) // two empty prefixes: identical
  }

  test("PII and zorder SQL surface agrees with the Scala API") {
    GraftExtensions.registerAll(spark)
    import org.apache.spark.sql.functions.{col, lit}
    val row = spark.sql(
      """SELECT redact_pii('mail a.b@c.org call +56 9 12345678 done') AS red,
        |       email_count('a@b.io and c@d.co') AS ne,
        |       phone_count('no digits here') AS np,
        |       zorder_key(5L, 3L, 3) AS z""".stripMargin).collect().head
    assert(row.getString(0) == "mail [EMAIL] call [PHONE] done")
    assert(row.getInt(1) == 2)
    assert(row.getInt(2) == 0)
    // interleave(101, 011) = b011011 + check vs the Column implementation
    assert(row.getLong(3) == 27L)
    val api = spark.range(1).select(
      graft.functions.zorder_key(lit(5L), lit(3L), 3)).collect().head.getLong(0)
    assert(api == row.getLong(3), "SQL zorder_key drifted from the Column form")

    // N-dim SQL form: 2-D case must equal zorder_key; 3-D vs Column form
    val zn = spark.sql(
      """SELECT zorder_key_n(array(5L, 3L), 3) AS z2,
        |       zorder_key_n(array(5L, 3L, 6L), 3) AS z3""".stripMargin)
      .collect().head
    assert(zn.getLong(0) == 27L, "2-D zorder_key_n must match zorder_key")
    val apiN = spark.range(1).select(
      graft.functions.zorder_key_n(Seq(lit(5L), lit(3L), lit(6L)), 3))
      .collect().head.getLong(0)
    assert(zn.getLong(1) == apiN, "SQL zorder_key_n drifted from Column form")

    // redaction parity over real data shapes
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(40)
    docs.createOrReplaceTempView("ext_docs3")
    val sqlRed = spark.sql(
      "SELECT doc_id, redact_pii(text) r FROM ext_docs3")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val apiRed = docs.select(col("doc_id"),
        graft.text.TextAnalysis.redactPii(col("text")))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(sqlRed == apiRed)
  }

  test("CMS + boilerplate census + approx-quantile SQL ≡ Scala API") {
    import org.apache.spark.sql.functions._
    GraftExtensions.registerAll(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.createOrReplaceTempView("ge_docs")

    // --- count-min sketch: grid + probes in pure SQL vs Sketch API
    val toks = docs.select(
      explode(graft.text.TextAnalysis.tokens(col("text"))).as("token"))
    val exact = toks.groupBy(col("token")).agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("token")).limit(10)
    val apiCms = graft.sketch.Sketch.cmsEstimate(
        graft.sketch.Sketch.cmsSketch(toks, "token", 4, 512),
        exact, "token", 4, 512)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val sqlCms = spark.sql(
      """WITH arr AS (SELECT graft_tokens(text) AS tk FROM ge_docs),
        |toks AS (SELECT explode(tk) AS token FROM arr),
        |ex AS (SELECT token, COUNT(*) AS exact_n FROM toks
        |       GROUP BY token ORDER BY exact_n DESC, token LIMIT 10),
        |rr AS (SELECT explode(sequence(0, 3)) AS r),
        |cells AS (SELECT r, cms_bucket(token, r, 512) AS bucket,
        |                 COUNT(*) AS cnt
        |          FROM toks CROSS JOIN rr GROUP BY r, bucket),
        |probe AS (SELECT token, exact_n, r, cms_bucket(token, r, 512) AS bucket
        |          FROM ex CROSS JOIN rr)
        |SELECT p.token, p.exact_n, MIN(c.cnt) AS cms_n
        |FROM probe p JOIN cells c ON p.r = c.r AND p.bucket = c.bucket
        |GROUP BY p.token, p.exact_n""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(sqlCms == apiCms, "SQL CMS estimate drifted from the Scala API")

    // --- boilerplate census in pure SQL vs Dedup.boilerplateStats
    val apiCensus = graft.dedup.Dedup
      .boilerplateStats(docs, "doc_id", "text", 3, 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val sqlCensus = spark.sql(
      """WITH arr AS (SELECT doc_id, shingles_all(text, 3) AS sh FROM ge_docs),
        |pos AS (SELECT doc_id, explode(sh) AS s FROM arr),
        |pdg AS (SELECT doc_id, s, COUNT(*) AS pos_in_doc
        |        FROM pos GROUP BY doc_id, s),
        |dfr AS (SELECT s, COUNT(*) AS df FROM pdg GROUP BY s),
        |per AS (SELECT doc_id, SUM(pos_in_doc) AS n_pos,
        |               SUM(CASE WHEN df >= 3 THEN pos_in_doc ELSE 0L END)
        |                 AS n_boiler
        |        FROM pdg JOIN dfr USING (s) GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(n_pos, 0L) AS n_pos,
        |       coalesce(n_boiler, 0L) AS n_boiler,
        |       CASE WHEN coalesce(n_pos, 0L) > 0
        |            THEN n_boiler * 1000000L div n_pos ELSE 0L END AS boiler_ppm
        |FROM ge_docs d LEFT JOIN per USING (doc_id)""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(sqlCensus == apiCensus,
      "SQL boilerplate census drifted from the Scala API")

    // --- integer log-histogram bin + midpoint vs ApproxQuantiles
    val vals = spark.range(0, 5000).select(col("id").as("v"))
    val api = vals.select(col("v"),
        graft.sketch.ApproxQuantiles.logBin(col("v"), 4).as("id"),
        graft.sketch.ApproxQuantiles.binEstimate(
          graft.sketch.ApproxQuantiles.logBin(col("v"), 4), 4).as("est"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    vals.createOrReplaceTempView("ge_vals")
    val viaSql = spark.sql(
      """SELECT v, log_bin(v, 4) AS id, bin_midpoint(log_bin(v, 4), 4) AS est
        |FROM ge_vals""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaSql == api, "SQL log-bin surface drifted from the Scala API")
  }

  test("GraftExtensions builder produces the expression for one argument") {
    val e = new GraftExtensions
    // the injected builder itself: arity guard + expression construction
    val expr = ParseClpMoney(org.apache.spark.sql.catalyst.expressions.Literal("12.345"))
    assert(expr.dataType == org.apache.spark.sql.types.DecimalType(18, 2))
    assert(e.isInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit])
  }
}
