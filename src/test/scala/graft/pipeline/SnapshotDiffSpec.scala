package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SnapshotDiff classification semantics (d13): the four change classes
  * are exhaustive and mutually exclusive over the union of snapshot keys,
  * and the diff of a snapshot with itself is all-unchanged.
  */
class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private def fp = md5(col("text").cast("binary"))

  test("added / removed / changed / unchanged classified per key") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val cur = Seq((2L, "b"), (3L, "C2"), (4L, "d")).toDF("doc_id", "text")
    val got = SnapshotDiff.diff(old, cur, "doc_id", fp)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("self-diff is all-unchanged; covers every key exactly once") {
    val snap = (1L to 50L).map(i => (i, s"doc-$i")).toDF("doc_id", "text")
    val d = SnapshotDiff.diff(snap, snap, "doc_id", fp)
    assert(d.count() == 50L)
    assert(d.filter(col("change") =!= "unchanged").count() == 0L)
  }

  test("empty old snapshot: everything is added (bootstrap run)") {
    val old = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val cur = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val d = SnapshotDiff.diff(old, cur, "doc_id", fp)
    assert(d.filter(col("change") === "added").count() == 2L)
  }
}
