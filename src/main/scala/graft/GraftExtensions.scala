package graft

import org.apache.spark.sql.{Column, GraftSqlBridge, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{LongArrayDot, LongArrayQuantize, ParseClpMoney, RollingHash}

/** Session extensions exposing the engine's functions to SQL users:
  * `spark.sql.extensions=graft.GraftExtensions` (or pass to
  * `SparkSession.builder.withExtensions`). Registers the three native
  * codegen'd expressions (`parse_clp_money`, `rolling_hash`,
  * `long_array_dot`) plus the composite text / dedup / similarity layer
  * (`token_count`, `quality_score`, `lang_id`, `content_hash`,
  * `shingles`, `jaccard_ppm`, `simhash60`, `quantize_vec`, `cosine_q`) —
  * each composite expands to the same codegen'd Column tree the Scala
  * API builds, so SQL users get identical plans.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("parse_clp_money"),
      new ExpressionInfo(classOf[ParseClpMoney].getName, "parse_clp_money"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "parse_clp_money takes exactly one argument")
        ParseClpMoney(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "rolling_hash takes exactly one argument")
        RollingHash(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("long_array_dot"),
      new ExpressionInfo(classOf[LongArrayDot].getName, "long_array_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "long_array_dot takes exactly two arguments")
        LongArrayDot(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("long_array_quantize"),
      new ExpressionInfo(classOf[LongArrayQuantize].getName, "long_array_quantize"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "long_array_quantize takes exactly one argument")
        LongArrayQuantize(children.head)
      }))
  }
}

object GraftExtensions {

  private val enWords = "'the','of','and','to','in','is','for','on','with','as'"
  private val esWords = "'de','la','que','el','en','y','los','del','las','por'"

  /** The composite text / dedup / similarity layer as Spark 4 SQL scalar
    * functions (`CREATE TEMPORARY FUNCTION ... RETURN <expr>`): each body
    * is the same expression tree the Scala API builds, inlined into the
    * calling plan by the analyzer — full codegen, no UDF boundary.
    */
  val sqlFunctions: Seq[String] = Seq(
    """CREATE OR REPLACE TEMPORARY FUNCTION graft_tokens(t STRING)
      |RETURNS ARRAY<STRING>
      |RETURN filter(split(trim(t), '\\s+'), x -> x != '')""",
    """CREATE OR REPLACE TEMPORARY FUNCTION token_count(t STRING)
      |RETURNS INT RETURN size(graft_tokens(t))""",
    """CREATE OR REPLACE TEMPORARY FUNCTION subword_count(t STRING)
      |RETURNS BIGINT
      |RETURN CAST((length(regexp_replace(t, '[^a-zA-Z]', '')) + 3) / 4 AS BIGINT)
      |       + length(regexp_replace(t, '[^0-9]', ''))
      |       + length(regexp_replace(t, '[a-zA-Z0-9\\s]', ''))""",
    """CREATE OR REPLACE TEMPORARY FUNCTION punct_count(t STRING)
      |RETURNS INT RETURN length(regexp_replace(t, '[a-zA-Z0-9\\s]', ''))""",
    s"""CREATE OR REPLACE TEMPORARY FUNCTION quality_score(t STRING)
      |RETURNS BIGINT
      |RETURN CASE WHEN t IS NULL THEN NULL ELSE 0 END
      |  + least(100, token_count(t))
      |  + CASE WHEN token_count(t) > 0
      |         THEN least(100, CAST(floor(
      |           size(array_intersect(graft_tokens(t), array($enWords,$esWords)))
      |             * 500 / token_count(t)) AS INT))
      |         ELSE 0 END
      |  + 100 - CASE WHEN length(t) > 0
      |         THEN least(100, CAST(floor(punct_count(t) * 300 / length(t)) AS INT))
      |         ELSE 0 END""",
    s"""CREATE OR REPLACE TEMPORARY FUNCTION lang_id(t STRING)
      |RETURNS STRING
      |RETURN CASE
      |  WHEN size(array_intersect(graft_tokens(t), array($enWords))) >
      |       size(array_intersect(graft_tokens(t), array($esWords))) THEN 'en'
      |  WHEN size(array_intersect(graft_tokens(t), array($esWords))) >
      |       size(array_intersect(graft_tokens(t), array($enWords))) THEN 'es'
      |  ELSE 'und' END""",
    """CREATE OR REPLACE TEMPORARY FUNCTION content_hash(t STRING)
      |RETURNS STRING RETURN md5(CAST(t AS BINARY))""",
    """CREATE OR REPLACE TEMPORARY FUNCTION shingles(t STRING, n INT)
      |RETURNS ARRAY<STRING>
      |RETURN CASE WHEN size(graft_tokens(t)) - n + 1 > 0
      |  THEN array_distinct(transform(
      |         sequence(1, size(graft_tokens(t)) - n + 1),
      |         i -> concat_ws(' ', slice(graft_tokens(t), i, n))))
      |  ELSE CAST(array() AS ARRAY<STRING>) END""",
    // per-row HOF form — fine for ad-hoc SQL; its CASE branches
    // re-tokenize per reference (conditional subtrees are excluded from
    // codegen subexpression elimination), so bulk scans should use
    // Dedup.repetitionStats, which projects the tokens once
    """CREATE OR REPLACE TEMPORARY FUNCTION repetition_ppm(t STRING, n INT)
      |RETURNS BIGINT
      |RETURN CASE WHEN size(graft_tokens(t)) - n + 1 > 0
      |  THEN ((size(graft_tokens(t)) - n + 1) - size(shingles(t, n)))
      |         * 1000000L div (size(graft_tokens(t)) - n + 1)
      |  ELSE 0L END""",
    """CREATE OR REPLACE TEMPORARY FUNCTION jaccard_ppm(a ARRAY<STRING>, b ARRAY<STRING>)
      |RETURNS BIGINT
      |RETURN CASE WHEN size(array_union(a, b)) > 0
      |  THEN floor(CAST(size(array_intersect(a, b)) AS BIGINT) * 1000000
      |             / size(array_union(a, b)))
      |  ELSE 0 END""",
    // per-row HOF form — fine for ad-hoc SQL; bulk signature jobs should
    // use the aggregate form (Dedup.simhashes), which is measured faster
    """CREATE OR REPLACE TEMPORARY FUNCTION simhash60(t STRING)
      |RETURNS BIGINT
      |RETURN aggregate(sequence(0, 59), 0L, (acc, j) -> acc +
      |  CASE WHEN aggregate(
      |         transform(graft_tokens(t),
      |           tok -> CAST(conv(substring(md5(CAST(tok AS BINARY)), 1, 15), 16, 10) AS BIGINT)),
      |         0L, (a, h) -> a + (shiftright(h, j) & 1) * 2 - 1) > 0
      |       THEN shiftleft(1L, j) ELSE 0L END)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION quantize_vec(v ARRAY<DOUBLE>)
      |RETURNS ARRAY<BIGINT>
      |RETURN transform(v, x -> CAST(round(x * 1000, 0) AS BIGINT))""",
    """CREATE OR REPLACE TEMPORARY FUNCTION cosine_q(a ARRAY<BIGINT>, b ARRAY<BIGINT>)
      |RETURNS DOUBLE
      |RETURN CASE WHEN long_array_dot(a, a) > 0 AND long_array_dot(b, b) > 0
      |  THEN CAST(long_array_dot(a, b) AS DOUBLE)
      |       / sqrt(CAST(long_array_dot(a, a) * long_array_dot(b, b) AS DOUBLE))
      |  END""").map(_.stripMargin)

  /** One-call SQL setup on a LIVE session: the three native expressions
    * (extensions only apply at session creation) plus every SQL scalar
    * function above. Idempotent.
    */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    GraftSqlBridge.registerFunction(spark, "parse_clp_money",
      ch => ParseClpMoney(ch.head))
    GraftSqlBridge.registerFunction(spark, "rolling_hash",
      ch => RollingHash(ch.head))
    GraftSqlBridge.registerFunction(spark, "long_array_dot",
      ch => LongArrayDot(ch.head, ch(1)))
    GraftSqlBridge.registerFunction(spark, "long_array_quantize",
      ch => LongArrayQuantize(ch.head))
    sqlFunctions.foreach(spark.sql(_))
  }
}
