package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The maintained rollup must equal a from-scratch recompute of the
  * applied state — including group-moving updates, drained groups, and
  * feed slicing (incremental application in any batch split).
  */
class IncrementalRollupSpec extends SparkSpec {
  import spark.implicits._

  private def feedDf(rows: Seq[(String, String, java.lang.Long, String, java.lang.Long)]) =
    rows.toDF("op", "grp", "v", "old_grp", "old_v")

  test("maintain ≡ recompute; group-moving update; drained group vanishes") {
    val base = Seq(("a", 10L), ("a", 20L), ("b", 5L)).toDF("grp", "v")
    val prior = IncrementalRollup.recompute(base, "grp", "v")
    val feed = feedDf(Seq(
      ("I", "c", 7L, null, null),          // new group born
      ("U", "b", 21L, "a", 20L),           // moves a→b, value 20→21
      ("D", null, null, "b", 5L)           // b's original row dies
    ))
    val out = IncrementalRollup.maintain(prior, feed, "grp", "v")
      .orderBy("grp").collect()
      .map(r => (r.getString(0), r.getAs[Long]("cnt"), r.getAs[Long]("sum")))
    // applied state: a={10}, b={21}, c={7}
    assert(out.toSeq == Seq(("a", 1L, 10L), ("b", 1L, 21L), ("c", 1L, 7L)))
    // draining a group entirely removes its row
    val drain = feedDf(Seq(("D", null, null, "c", 7L)))
    val out2 = IncrementalRollup.maintain(
      IncrementalRollup.maintain(prior, feed, "grp", "v"), drain, "grp", "v")
      .orderBy("grp").collect().map(_.getString(0))
    assert(out2.toSeq == Seq("a", "b"))
  }

  test("feed slicing commutes: two half-batches ≡ one batch; malformed ops ignored") {
    val base = Seq(("x", 100L), ("y", 50L)).toDF("grp", "v")
    val prior = IncrementalRollup.recompute(base, "grp", "v")
    val all = feedDf(Seq(
      ("I", "x", 1L, null, null),
      ("U", "y", 60L, "y", 50L),
      ("I", "z", 9L, null, null),
      ("D", null, null, "x", 100L),
      ("?", "x", 999L, "y", 999L),          // malformed: must be inert
      (null, "x", 999L, "y", 999L)
    ))
    val oneShot = IncrementalRollup.maintain(prior, all, "grp", "v")
      .orderBy("grp").collect().map(_.toSeq)
    val (b1, b2) = (all.limit(3), all.orderBy(lit(1)).except(all.limit(3)))
    val sliced = IncrementalRollup.maintain(
      IncrementalRollup.maintain(prior, b1, "grp", "v"), b2, "grp", "v")
      .orderBy("grp").collect().map(_.toSeq)
    assert(oneShot.toSeq == sliced.toSeq)
    // and equals recompute of applied state: x={1}, y={60}, z={9}
    assert(oneShot.map(s => (s(0), s(1), s(2))).toSeq ==
      Seq(("x", 1L, 1L), ("y", 1L, 60L), ("z", 1L, 9L)))
  }
}
