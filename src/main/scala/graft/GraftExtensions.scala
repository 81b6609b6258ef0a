package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{LongArrayDot, ParseClpMoney, RollingHash}

/** Session extensions exposing the engine's native expressions to SQL
  * users: `spark.sql.extensions=graft.GraftExtensions` (or pass to
  * `SparkSession.builder.withExtensions`). Currently registers:
  *
  *   - `parse_clp_money(str)` → DECIMAL(18,2) — the locale-aware money
  *     parser (null on unparseable input).
  *
  * Everything else in the library composes from built-ins, so SQL users
  * reach it through plain Spark SQL.
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
  }
}
