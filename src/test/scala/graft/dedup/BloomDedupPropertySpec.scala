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
}
