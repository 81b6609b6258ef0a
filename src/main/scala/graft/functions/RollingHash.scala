package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd polynomial rolling hash over a string's code points:
  * `h = (h*31 + codePoint) mod 2^31-1`, empty/null → null. Replaces the
  * interpreted `aggregate(transform(sequence...))` character loop in
  * TextAnalysis.fingerprint (HOFs are CodegenFallback; per-character
  * interpretation dominated the text-stats pass). Code points match
  * `ascii(substr(s, i, 1))` / DuckDB `ord(substr(...))` for every BMP
  * character, so oracles are unchanged.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "rolling_hash"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string argument, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    RollingHash.hashOrNull(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("rh")
      s"""
         |java.lang.Long $r = graft.functions.RollingHash.hashOrNull($c);
         |${ev.isNull} = $r == null;
         |${ev.value} = ${ev.isNull} ? -1L : $r.longValue();
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  final val Mod = 2147483647L

  /** Shared by interpreted eval and generated code; empty → null. */
  def hashOrNull(u: UTF8String): java.lang.Long = {
    if (u == null) return null
    val s = u.toString
    if (s.isEmpty) return null
    var h = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) % Mod
      i += Character.charCount(cp)
    }
    java.lang.Long.valueOf(h)
  }
}
