package graft.sampling

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One priority-sampling candidate: DLT priority, row key, weight. */
final case class PriCand(priority: Long, id: Long, w: Long)

/** k-slot buffer as parallel primitive arrays (the
  * [[graft.similarity.TopKBuf]] / Misra–Gries shape: `reduce` mutates
  * in place, the per-row hot path allocates nothing).
  */
final case class PriBuf(pri: Array[Long], ids: Array[Long],
    ws: Array[Long], var n: Int)

/** Exact per-group top-k by (priority desc, id asc) as a MERGEABLE
  * aggregate — the window-free form of per-stratum selection: a
  * `row_number() over (partition by stratum order by priority)` window
  * shuffles every row of every stratum to rank it, and a mega-stratum
  * pins one reducer (the t16/d12 skew argument); this aggregator's
  * map-side partial keeps k candidates per stratum per task, so the
  * exchange carries k-slot buffers and a hot stratum splits like any
  * hash aggregate.
  */
final case class PriorityTopKAggregator(k: Int)
  extends Aggregator[PriCand, PriBuf, Seq[PriCand]] {

  override def zero: PriBuf =
    PriBuf(new Array[Long](k), new Array[Long](k), new Array[Long](k), 0)

  private def beats(b: PriBuf, i: Int, pri: Long, id: Long): Boolean =
    if (pri != b.pri(i)) pri > b.pri(i) else id < b.ids(i)

  private def insert(b: PriBuf, pri: Long, id: Long, w: Long): Unit = {
    if (b.n < k || beats(b, b.n - 1, pri, id)) {
      var pos = if (b.n < k) b.n else k - 1
      while (pos > 0 && beats(b, pos - 1, pri, id)) {
        b.pri(pos) = b.pri(pos - 1); b.ids(pos) = b.ids(pos - 1)
        b.ws(pos) = b.ws(pos - 1)
        pos -= 1
      }
      b.pri(pos) = pri; b.ids(pos) = id; b.ws(pos) = w
      if (b.n < k) b.n += 1
    }
  }

  override def reduce(b: PriBuf, x: PriCand): PriBuf = {
    insert(b, x.priority, x.id, x.w); b
  }

  override def merge(b1: PriBuf, b2: PriBuf): PriBuf = {
    var i = 0
    while (i < b2.n) { insert(b1, b2.pri(i), b2.ids(i), b2.ws(i)); i += 1 }
    b1
  }

  override def finish(b: PriBuf): Seq[PriCand] =
    (0 until b.n).map(i => PriCand(b.pri(i), b.ids(i), b.ws(i)))

  override def bufferEncoder: Encoder[PriBuf] = ExpressionEncoder[PriBuf]()
  override def outputEncoder: Encoder[Seq[PriCand]] =
    ExpressionEncoder[Seq[PriCand]]()
}
