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

  test("GraftExtensions builder produces the expression for one argument") {
    val e = new GraftExtensions
    // the injected builder itself: arity guard + expression construction
    val expr = ParseClpMoney(org.apache.spark.sql.catalyst.expressions.Literal("12.345"))
    assert(expr.dataType == org.apache.spark.sql.types.DecimalType(18, 2))
    assert(e.isInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit])
  }
}
