package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType}
import org.apache.spark.unsafe.types.UTF8String

/** Locale-aware money parser — the reference's signature scalar function
  * (reference: smartbots-etl/src/application/transformers.py:70-101).
  *
  * Rules, in order:
  *   - strip `$` and spaces;
  *   - both `.` and `,` present → the rightmost of the two is the decimal
  *     separator (US `1,234.56` vs Chilean `1.234,56`);
  *   - exactly one `,` and no `.` → decimal comma (`1234,56`);
  *   - more than one `.` → thousands dots (`1.234.567`);
  *   - exactly one `.` with exactly 3 trailing digits → Chilean thousands
  *     (`12.345` → `12345`);
  *   - otherwise parse as-is;
  *   - unparseable → null (errors are data — routed to the validation
  *     error channel, never thrown; golden vectors at
  *     tests/unit/test_transformers.py:16-46).
  *
  * The static `parse` method is shared by interpreted eval and generated
  * code, so the expression participates in whole-stage codegen.
  */
object MoneyParse {
  /** Canonicalize a locale-formatted money string to plain decimal syntax,
    * or null if it cannot be a number.
    */
  def canonicalize(raw: String): String = {
    if (raw == null) return null
    var s = raw.trim
    if (s.isEmpty) return null
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '$' && c != ' ') sb.append(c)
      i += 1
    }
    s = sb.toString
    if (s.isEmpty) return null
    val lastDot = s.lastIndexOf('.')
    val lastComma = s.lastIndexOf(',')
    if (lastDot >= 0 && lastComma >= 0) {
      if (lastDot > lastComma) s.replace(",", "") // US 1,234.56
      else s.replace(".", "").replace(',', '.')   // Chilean 1.234,56
    } else if (lastComma >= 0) {
      if (s.indexOf(',') == lastComma) s.replace(',', '.') // 1234,56
      else s // multiple commas, no dot: invalid in the reference too
    } else if (lastDot >= 0) {
      if (s.indexOf('.') != lastDot) s.replace(".", "") // 1.234.567
      else if (s.length - lastDot - 1 == 3) s.replace(".", "") // 12.345
      else s // single decimal point
    } else s
  }

  /** Parse to scale-2 BigDecimal (HALF_UP), or null when invalid. */
  def parseJava(raw: String): JBigDecimal = {
    val canon = canonicalize(raw)
    if (canon == null) return null
    try {
      val bd = new JBigDecimal(canon).setScale(2, RoundingMode.HALF_UP)
      // DecimalType(18,2) overflow → error channel, same as unparseable.
      if (bd.precision - bd.scale > 16) null else bd
    } catch { case _: NumberFormatException => null }
  }

  /** Entry point used by both eval and generated code. */
  def parse(u: UTF8String): Decimal = {
    val bd = parseJava(if (u == null) null else u.toString)
    if (bd == null) null else Decimal(bd)
  }
}

/** Catalyst expression for [[MoneyParse]]: `StringType → DecimalType(18,2)`,
  * null on unparseable input (error-as-data). Codegen delegates to the same
  * static helper, keeping the hot path inside whole-stage codegen.
  */
case class ParseClpMoney(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DecimalType(18, 2)
  override def nullable: Boolean = true
  override def prettyName: String = "parse_clp_money"

  override def nullSafeEval(input: Any): Any =
    MoneyParse.parse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.MoneyParse.parse($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ParseClpMoney =
    copy(child = newChild)
}
