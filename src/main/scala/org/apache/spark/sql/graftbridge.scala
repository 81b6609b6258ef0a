package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into `private[sql]` surface: wrap a custom Catalyst
  * `Expression` as a user-facing `Column` (and back). Spark 4 moved the
  * `Column`-to-`Expression` conversion behind
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is package-private;
  * this is the supported-by-convention escape hatch for libraries shipping
  * native expressions.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register an expression builder so the function is usable from SQL. */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "built-in")
}
