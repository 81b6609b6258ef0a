package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Codegen'd k-nearest-coarse-centroid selection for IVF assignment:
  * given a quantized vector, returns the ids of the `nprobe` nearest
  * centroids (exact integer squared L2, ties to the smaller id),
  * ordered nearest-first.
  *
  * Replaces the literal-centroid projection
  * `array_min(array(struct(-2*dot(qv, lit(cv)) + |cv|², id), ...))`:
  * that expression tree is O(k·dims) NODES — at the sqrt(n) centroid
  * count a real corpus needs (k=142 at 20k vectors, 9k+ nodes; 65k
  * centroids at 4B vectors) plan construction, codegen, and evaluation
  * all degrade superlinearly (measured at sf1: 17.9 s for s3_ann_ivf,
  * ~100× a tight loop). Here the centroid matrix is plan DATA (one
  * flat long[] carried on the expression), evaluation is one fused
  * multiply-accumulate loop, and centroid norms are precomputed once
  * per plan instead of once per row.
  *
  * Distance semantics mirror the projection it replaces exactly:
  * `d(c) = |cv|² − 2·dot(qv, cv)` (the per-row |qv|² constant is
  * dropped — ordering-identical), dot over `min(len(qv), dims)` with
  * null elements as 0 ([[LongArrayDot]] semantics), |cv|² over all
  * `dims`. All arithmetic is exact longs: |qv·cv| ≤ dims·10⁶ ≪ 2⁶³.
  */
case class NearestCentroids(
    child: Expression,
    ids: Array[Int],
    flat: Array[Long],
    dims: Int,
    nprobe: Int) extends UnaryExpression {

  require(ids.nonEmpty, "nearest_centroids: no centroids")
  require(flat.length == ids.length * dims,
    s"nearest_centroids: flat matrix ${flat.length} != ${ids.length} x $dims")
  require(nprobe >= 1, "nearest_centroids: nprobe must be >= 1")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_centroids"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<bigint> argument, got ${other.sql}")
    }

  /** |cv|² per centroid, computed once per plan. */
  @transient private lazy val normSq: Array[Long] = {
    val k = ids.length
    val out = new Array[Long](k)
    var c = 0
    while (c < k) {
      var s = 0L
      var d = 0
      val base = c * dims
      while (d < dims) { val v = flat(base + d); s += v * v; d += 1 }
      out(c) = s
      c += 1
    }
    out
  }

  /** Shared by interpreted eval and generated code. */
  def pick(qv: ArrayData): ArrayData = {
    val k = ids.length
    val m = math.min(nprobe, k)
    val qn = math.min(qv.numElements(), dims)
    // best-m insertion buffers, sorted by (dist, id) ascending
    val bd = new Array[Long](m)
    val bi = new Array[Int](m)
    var filled = 0
    var c = 0
    while (c < k) {
      var dot = 0L
      var d = 0
      val base = c * dims
      while (d < qn) {
        if (!qv.isNullAt(d)) dot += qv.getLong(d) * flat(base + d)
        d += 1
      }
      val dist = normSq(c) - 2L * dot
      val id = ids(c)
      if (filled < m || dist < bd(filled - 1) ||
          (dist == bd(filled - 1) && id < bi(filled - 1))) {
        var pos = if (filled < m) filled else m - 1
        while (pos > 0 && (dist < bd(pos - 1) ||
            (dist == bd(pos - 1) && id < bi(pos - 1)))) {
          bd(pos) = bd(pos - 1); bi(pos) = bi(pos - 1); pos -= 1
        }
        bd(pos) = dist
        bi(pos) = id
        if (filled < m) filled += 1
      }
      c += 1
    }
    val res = new Array[Any](filled)
    var i = 0
    while (i < filled) { res(i) = bi(i); i += 1 }
    new GenericArrayData(res)
  }

  override def nullSafeEval(input: Any): Any =
    pick(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("nearestCentroids", this, classOf[NearestCentroids].getName)
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = $self.pick($c);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
}
