package graft.similarity

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate: cosine is None when either vector has zero
  * norm (mirrors [[Similarity.cosineFromQ]]'s null).
  */
final case class ScoredCand(neighbor_id: Long, dot_q: Long,
    cosine: Option[Double])

/** k-slot top-k buffer as parallel primitive arrays: `reduce` mutates in
  * place, so the per-candidate hot path of a brute-force scan allocates
  * nothing (same shape as the Misra–Gries buffer in
  * [[graft.sketch.Sketch]]). `has(i)` distinguishes a real cosine from
  * the null one (zero-norm vectors), which must sort LAST. Slots at
  * index ≥ n are never read.
  */
final case class TopKBuf(ids: Array[Long], dots: Array[Long],
    cos: Array[Double], has: Array[Boolean], var n: Int)

/** Exact grouped top-k as a MERGEABLE aggregate — the scale-correct form
  * of "rank candidates per query, keep k". The window formulation
  * (`row_number() over (partition by query order by cosine desc)`)
  * shuffles the ENTIRE score matrix — O(queries × corpus) rows — to
  * rank it; at sf1 that is 100M rows through one exchange for
  * m2_media_ann (measured 168 s). As an `Aggregator` the partial
  * aggregate runs map-side, so each task ships at most k candidates per
  * query it saw: the exchange carries O(queries × tasks × k) k-slot
  * buffers instead of the pair space, and the result is bit-identical
  * (same deterministic order: cosine desc NULLS LAST, neighbor_id asc).
  *
  * Inputs must be (neighbor_id BIGINT, dot_q BIGINT, cosine DOUBLE
  * nullable); ranks are the 1-based positions of the returned
  * best-first array.
  */
final case class TopKAggregator(k: Int)
  extends Aggregator[ScoredCand, TopKBuf, Seq[ScoredCand]] {

  override def zero: TopKBuf = TopKBuf(new Array[Long](k),
    new Array[Long](k), new Array[Double](k), new Array[Boolean](k), 0)

  /** True when candidate (hasA, cosA, idA) outranks slot i of b:
    * cosine desc with nulls last, then neighbor_id asc.
    */
  private def beats(b: TopKBuf, i: Int, hasA: Boolean, cosA: Double,
      idA: Long): Boolean = {
    if (hasA != b.has(i)) hasA
    else if (hasA && cosA != b.cos(i)) cosA > b.cos(i)
    else idA < b.ids(i)
  }

  private def insert(b: TopKBuf, id: Long, dot: Long, hasC: Boolean,
      c: Double): Unit = {
    if (b.n < k || beats(b, b.n - 1, hasC, c, id)) {
      var pos = if (b.n < k) b.n else k - 1
      while (pos > 0 && beats(b, pos - 1, hasC, c, id)) {
        b.ids(pos) = b.ids(pos - 1); b.dots(pos) = b.dots(pos - 1)
        b.cos(pos) = b.cos(pos - 1); b.has(pos) = b.has(pos - 1)
        pos -= 1
      }
      b.ids(pos) = id; b.dots(pos) = dot; b.cos(pos) = c; b.has(pos) = hasC
      if (b.n < k) b.n += 1
    }
  }

  override def reduce(b: TopKBuf, x: ScoredCand): TopKBuf = {
    val hasC = x.cosine.isDefined
    insert(b, x.neighbor_id, x.dot_q, hasC,
      if (hasC) x.cosine.get else 0.0)
    b
  }

  override def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf = {
    var i = 0
    while (i < b2.n) {
      insert(b1, b2.ids(i), b2.dots(i), b2.has(i), b2.cos(i))
      i += 1
    }
    b1
  }

  override def finish(b: TopKBuf): Seq[ScoredCand] =
    (0 until b.n).map(i => ScoredCand(b.ids(i), b.dots(i),
      if (b.has(i)) Some(b.cos(i)) else None))

  override def bufferEncoder: Encoder[TopKBuf] = ExpressionEncoder[TopKBuf]()
  override def outputEncoder: Encoder[Seq[ScoredCand]] =
    ExpressionEncoder[Seq[ScoredCand]]()
}
