package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Randomized (seeded) invariant for the bloom-prefilter incremental
  * dedup: for ANY corpus/incoming split, any overlap profile, and any
  * fpp, [[Dedup.bloomNewRows]] must equal the plain anti-join — the
  * bloom may only move rows between the free branch and the confirm
  * branch, never change the union.
  */
class BloomDedupPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260812)

  test("bloomNewRows == anti-join for random splits and fpp settings") {
    (1 to 5).foreach { trial =>
      val keySpace = rnd.nextInt(300) + 50
      val corpus = (1 to rnd.nextInt(400))
        .map(_ => s"k${rnd.nextInt(keySpace)}").toDF("k").distinct()
      val incoming = (1 to rnd.nextInt(400) + 1)
        .map(i => (i.toLong, s"k${rnd.nextInt(keySpace)}")).toDF("id", "k")
      val fpp = Seq(0.3, 0.03, 0.001)(trial % 3) // coarse → tight blooms
      val est = math.max(1L, corpus.count())

      val got = Dedup.bloomNewRows(corpus, incoming, "k", est, fpp)
        .select("id").as[Long].collect().sorted.toSeq
      val want = incoming.join(corpus, Seq("k"), "left_anti")
        .select("id").as[Long].collect().sorted.toSeq
      assert(got == want,
        s"trial $trial (fpp=$fpp): got ${got.size}, want ${want.size}")
    }
  }

  test("bloomSemiJoin == semi join for random splits; empty keys match nothing; filter is scan-stage") {
    (1 to 5).foreach { trial =>
      val keySpace = rnd.nextInt(300) + 50
      val keys = (1 to rnd.nextInt(400))
        .map(_ => s"k${rnd.nextInt(keySpace)}").toDF("k").distinct()
      val fact = (1 to rnd.nextInt(400) + 1)
        .map(i => (i.toLong, s"k${rnd.nextInt(keySpace)}")).toDF("id", "k")
      val fpp = Seq(0.3, 0.03, 0.001)(trial % 3)
      val est = math.max(1L, keys.count())
      val got = Dedup.bloomSemiJoin(fact, keys, "k", est, fpp)
        .select("id").as[Long].collect().sorted.toSeq
      val want = fact.join(keys, Seq("k"), "left_semi")
        .select("id").as[Long].collect().sorted.toSeq
      assert(got == want,
        s"trial $trial (fpp=$fpp): got ${got.size}, want ${want.size}")
    }
    // empty key set: nothing matches (and nothing NPEs on the null bloom)
    val fact = Seq((1L, "a"), (2L, "b")).toDF("id", "k")
    assert(Dedup.bloomSemiJoin(fact, fact.filter(lit(false)), "k", 1L)
      .count() == 0L)
    // the bloom predicate must reach the fact side BEFORE the join —
    // scan-stage reduction is the whole point (probe a PARQUET fact:
    // local relations constant-fold the filter away at optimize time)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val p = Dedup.bloomSemiJoin(docs, Seq(1L).toDF("doc_id"), "doc_id", 1L)
      .queryExecution.executedPlan.toString
    assert(p.contains("might_contain"), p.take(800))
    assert(p.indexOf("might_contain") > p.indexOf("Join"),
      "filter must sit below (after, in plan text) the join")
  }
}
