package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Codegen'd exact integer cosine-threshold test — the confirm gate of
  * every blocked/asymmetric near-pair operator:
  *
  *   `dot > 0  AND  dot² · 10¹² ≥ n1 · n2 · ppm²`
  *
  * evaluated EXACTLY for any long inputs. The previous formulation
  * widened through `decimal(38,0)` columns — four decimal
  * multiplications per threshold per pair, each a heap-allocating
  * BigDecimal call — and profiled as the dominant per-pair cost of the
  * banded-candidate queries (the pair-scoring stage of
  * s20_contrastive_pairs spent ~30 s of task CPU at sf0.1, most of it
  * under `Decimal.$times`). Here the common regime (|dot|, n1, n2 ≤
  * 3 037 000 499 — far above any unit-norm milli-quantized vector, where
  * dot ≲ 10⁶) runs branch-free on longs with one 128-bit product
  * comparison via `Math.multiplyHigh`; anything larger falls back to
  * BigInteger, still exact. Identical truth value to the decimal form on
  * its whole overflow-free domain, and to the oracle's HUGEINT replay
  * everywhere.
  */
case class CosineGatePpm(dot: Expression, n1: Expression, n2: Expression,
    ppm: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(dot, n1, n2, ppm)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "cosine_gate_ppm"

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires four bigint arguments, got " +
        children.map(_.dataType.sql).mkString(", "))

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val d = dot.eval(input)
    val a = n1.eval(input)
    val b = n2.eval(input)
    val p = ppm.eval(input)
    if (d == null || a == null || b == null || p == null) null
    else CosineGateEval.gate(d.asInstanceOf[Long], a.asInstanceOf[Long],
      b.asInstanceOf[Long], p.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val d = dot.genCode(ctx)
    val a = n1.genCode(ctx)
    val b = n2.genCode(ctx)
    val p = ppm.genCode(ctx)
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    ev.copy(code = code"""
      ${d.code}
      ${a.code}
      ${b.code}
      ${p.code}
      boolean ${ev.isNull} = ${d.isNull} || ${a.isNull} || ${b.isNull} ||
        ${p.isNull};
      boolean ${ev.value} = false;
      if (!${ev.isNull}) {
        ${ev.value} = graft.functions.CosineGateEval.gate(
          ${d.value}, ${a.value}, ${b.value}, ${p.value});
      }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CosineGatePpm =
    copy(dot = newChildren(0), n1 = newChildren(1), n2 = newChildren(2),
      ppm = newChildren(3))
}

object CosineGateEval {
  /** Largest x with x*x < 2^63 (floor(sqrt(2^63 − 1))). */
  private val SqrtLongMax = 3037000499L
  private val Ppm2Scale = 1000000000000L // 10¹²

  def gate(dot: Long, n1: Long, n2: Long, ppm: Long): Boolean =
    if (dot <= 0L) false
    else if (dot <= SqrtLongMax && n1 >= 0L && n1 <= SqrtLongMax &&
        n2 >= 0L && n2 <= SqrtLongMax && ppm >= 0L && ppm <= 1000000L)
      geUnsignedProd(dot * dot, Ppm2Scale, n1 * n2, ppm * ppm)
    else bigGate(dot, n1, n2, ppm)

  /** a·b ≥ c·d for non-negative longs, exact via 128-bit products. */
  private def geUnsignedProd(a: Long, b: Long, c: Long, d: Long): Boolean = {
    val hi1 = Math.multiplyHigh(a, b)
    val hi2 = Math.multiplyHigh(c, d)
    if (hi1 != hi2) hi1 > hi2
    else java.lang.Long.compareUnsigned(a * b, c * d) >= 0
  }

  private def bigGate(dot: Long, n1: Long, n2: Long, ppm: Long): Boolean = {
    val bd = java.math.BigInteger.valueOf(dot)
    val lhs = bd.multiply(bd).multiply(java.math.BigInteger.valueOf(Ppm2Scale))
    val bp = java.math.BigInteger.valueOf(ppm)
    val rhs = java.math.BigInteger.valueOf(n1)
      .multiply(java.math.BigInteger.valueOf(n2))
      .multiply(bp).multiply(bp)
    lhs.compareTo(rhs) >= 0
  }
}
