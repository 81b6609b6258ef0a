package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Codegen'd embedding quantization: `array<float|double>` →
  * `array<long>` with each element `round(x * 1000, 0)` (HALF_UP, the
  * same BigDecimal path Spark's `round` takes for doubles — bit-identical
  * to the previous `transform(v, x => round(x*1000, 0).cast("long"))`
  * form).
  *
  * Why an expression and not the HOF: `transform` is CodegenFallback
  * (interpreted), and CollapseProject re-inlines the projected `qv`
  * column into every downstream reference — the IVF assignment alone
  * references it 16× (one per centroid dot), so the interpreted
  * quantization ran ~19× per row in the ANN queries. This keeps one
  * tight generated loop per reference instead ([[LongArrayDot]] is the
  * same story for the dot products).
  *
  * Null elements stay null (matching the HOF: `round(null)` is null);
  * a null array is null.
  */
case class LongArrayQuantize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "long_array_quantize"

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float> or array<double>, got ${other.sql}")
    }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Any](n)
    val isFloat = elemIsFloat
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i)) {
        val v = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
        out(i) = LongArrayQuantize.quantizeOne(v)
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val vals = ctx.freshName("vals")
      val nulls = ctx.freshName("nulls")
      val hasNull = ctx.freshName("hasNull")
      val boxed = ctx.freshName("boxed")
      val getter = if (elemIsFloat) s"(double) $a.getFloat($i)"
                   else s"$a.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |long[] $vals = new long[$n];
         |boolean[] $nulls = new boolean[$n];
         |boolean $hasNull = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) {
         |    $nulls[$i] = true;
         |    $hasNull = true;
         |  } else {
         |    $vals[$i] = graft.functions.LongArrayQuantize.quantizeOne($getter);
         |  }
         |}
         |if ($hasNull) {
         |  Object[] $boxed = new Object[$n];
         |  for (int $j = 0; $j < $n; $j++) {
         |    if (!$nulls[$j]) $boxed[$j] = java.lang.Long.valueOf($vals[$j]);
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($boxed);
         |} else {
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions
         |    .UnsafeArrayData.fromPrimitiveArray($vals);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): LongArrayQuantize = copy(child = newChild)
}

object LongArrayQuantize {
  /** `round(v * 1000, 0)` as a long — the exact BigDecimal HALF_UP path
    * Spark's Round takes for DoubleType, then the double→long cast.
    * Non-finite guard first: Spark's Round passes NaN/Infinity through
    * unchanged and the long cast then maps NaN→0, ±Inf→Long.Min/Max —
    * BigDecimal.valueOf would instead THROW on them, so one corrupted
    * embedding element would abort a corpus-wide job.
    */
  def quantizeOne(v: Double): Long = {
    val scaled = v * 1000.0
    if (java.lang.Double.isNaN(scaled) ||
        java.lang.Double.isInfinite(scaled)) scaled.toLong
    else {
      // Fast path for the 99.9…% of values away from a .5 boundary.
      // BigDecimal.valueOf goes through Double.toString (shortest
      // decimal repr) — ~40× the cost of the arithmetic below, and it
      // was the top non-Spark frame in the similarity-query profiles.
      // The shortest repr `dec` satisfies |dec − scaled| < ulp(scaled),
      // so HALF_UP on dec can only differ from rounding the binary
      // value when scaled lies within one ulp of a k + 0.5 boundary;
      // route exactly that band (and ties) through the original exact
      // path, everywhere else floor/ceil on the binary value is
      // bit-identical to the string-based HALF_UP.
      val f = Math.floor(scaled)
      val frac = scaled - f
      if (Math.abs(frac - 0.5) > Math.ulp(scaled))
        (if (frac > 0.5) f + 1.0 else f).toLong
      else
        java.math.BigDecimal.valueOf(scaled)
          .setScale(0, java.math.RoundingMode.HALF_UP)
          .doubleValue()
          .toLong
    }
  }
}
