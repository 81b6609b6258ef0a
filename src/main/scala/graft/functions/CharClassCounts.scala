package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd single-pass character-class census of a string:
  * `struct<n_letters, n_digits, n_punct>` where
  *   - n_letters = code points in `[a-zA-Z]`
  *   - n_digits  = code points in `[0-9]`
  *   - n_punct   = code points NOT matching `[a-zA-Z0-9\s]` (Java regex
  *                 `\s` = space, tab, \n, \x0B, \f, \r) — so any non-ASCII
  *     code point counts as punctuation, exactly like the regex it
  *     replaces.
  *
  * Replaces four full-text `regexp_replace` passes in
  * [[graft.text.TextAnalysis]] (three in subwordCount, one in punctCount)
  * with one character loop: the regex passes were the hottest expression
  * in the text-stats profile (TextProbe: subwords alone ≈ half the query).
  * Counting iterates code points, matching Spark `length()` semantics on
  * the regex-filtered string, so the DuckDB oracle is unchanged.
  */
case class CharClassCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = CharClassCounts.schema
  override def nullable: Boolean = true
  override def prettyName: String = "char_class_counts"

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
    CharClassCounts.counts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.CharClassCounts.counts($c);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CharClassCounts =
    copy(child = newChild)
}

object CharClassCounts {
  val schema: StructType = StructType(Seq(
    StructField("n_letters", IntegerType, nullable = false),
    StructField("n_digits", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false)))

  /** Shared by interpreted eval and generated code. */
  def counts(u: UTF8String): InternalRow = {
    val s = u.toString
    var letters = 0
    var digits = 0
    var punct = 0
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      if ((cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z')) letters += 1
      else if (cp >= '0' && cp <= '9') digits += 1
      else if (!(cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B ||
                 cp == '\f' || cp == '\r')) punct += 1
      i += Character.charCount(cp)
    }
    new GenericInternalRow(Array[Any](letters, digits, punct))
  }
}
