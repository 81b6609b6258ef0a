package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Codegen'd banded sign-bucket computation for LSH blocking: given a
  * quantized vector, returns one int bucket per band, where band t's
  * bit j is set iff `dot(qv, hyperplane(t·bitsPerBand + j)) > 0` over
  * the deterministic ±1 hyperplane matrix.
  *
  * Replaces the `bands × bitsPerBand` column pile of
  * `when(long_array_dot(qv, typedLit(row)) > 0, 1<<j)` sums: at 24
  * bands that projection is 200+ expression nodes whose generated code
  * exceeds the whole-stage/method limits, so it fell back to the
  * INTERPRETED projection — boxed per-element literal-array access at
  * ~1.7 µs per dot (StageProfile s17: 46 s of task CPU to band 2 000
  * vectors). Here the hyperplane matrix is plan DATA (one flat long[]
  * on the expression, exactly the [[NearestCentroids]] stance) and
  * evaluation is one fused primitive multiply-accumulate loop per row.
  *
  * Semantics mirror the projection it replaces EXACTLY:
  *   - dot over `min(len(qv), dims)`, null elements count 0
  *     ([[LongArrayDot]] semantics);
  *   - bit set iff dot > 0 (strict), bits OR-combined as `1 << j`;
  *   - a NULL vector yields bucket 0 in every band (the original
  *     `when(...).otherwise(0)` fell through to 0 on null dots), so
  *     the output is never null and row counts are identical.
  * All arithmetic is exact longs: |qv·row| ≤ dims·10⁶ ≪ 2⁶³.
  */
case class BandSignBuckets(
    child: Expression,
    flat: Array[Long],
    bands: Int,
    bitsPerBand: Int,
    dims: Int) extends UnaryExpression {

  require(bands > 0 && bitsPerBand > 0 && bitsPerBand <= 30,
    s"band_sign_buckets: need bands > 0 and 0 < bitsPerBand <= 30, " +
      s"got $bands/$bitsPerBand")
  require(flat.length == bands * bitsPerBand * dims,
    s"band_sign_buckets: flat matrix ${flat.length} != " +
      s"$bands x $bitsPerBand x $dims")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "band_sign_buckets"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<bigint> argument, got ${other.sql}")
    }

  /** Shared by interpreted eval and generated code; `qv` may be null. */
  def buckets(qv: ArrayData): ArrayData = {
    val out = new Array[Any](bands)
    if (qv == null) {
      var t = 0
      while (t < bands) { out(t) = 0; t += 1 }
      return new GenericArrayData(out)
    }
    val qn = math.min(qv.numElements(), dims)
    var t = 0
    while (t < bands) {
      var b = 0
      var j = 0
      while (j < bitsPerBand) {
        val base = (t * bitsPerBand + j) * dims
        var dot = 0L
        var d = 0
        while (d < qn) {
          if (!qv.isNullAt(d)) dot += qv.getLong(d) * flat(base + d)
          d += 1
        }
        if (dot > 0L) b |= (1 << j)
        j += 1
      }
      out(t) = b
      t += 1
    }
    new GenericArrayData(out)
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    buckets(child.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bandSignBuckets", this,
      classOf[BandSignBuckets].getName)
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          $self.buckets(${c.isNull} ? null : ${c.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): BandSignBuckets =
    copy(child = newChild)
}
