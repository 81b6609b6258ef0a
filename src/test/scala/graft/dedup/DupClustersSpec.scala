package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Connected-components duplicate clustering ([[DupClusters]]). */
class DupClustersSpec extends SparkSpec {
  import spark.implicits._

  private def cc(pairs: Seq[(Long, Long)], maxIter: Int = 20) =
    DupClusters.connectedComponents(
      pairs.toDF("id1", "id2"), "id1", "id2", maxIter)
      .as[(Long, Long)].collect().toMap

  test("two components resolve to their minimum ids") {
    // {1,2,3} via 1-2, 2-3 and {10,11}
    val got = cc(Seq((1L, 2L), (2L, 3L), (11L, 10L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("transitive closure: A~B, B~C clusters A,B,C even if A,C never paired") {
    val got = cc(Seq((5L, 9L), (9L, 2L)))
    assert(got.values.toSet == Set(2L))
    assert(got.keySet == Set(2L, 5L, 9L))
  }

  test("duplicate and self edges are tolerated; star converges in one round") {
    val got = cc(Seq((1L, 2L), (2L, 1L), (1L, 1L), (1L, 3L), (1L, 4L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("pointer jumping: a 30-node path converges within 8 rounds") {
    // plain min-propagation needs 29 rounds on a path; the shortcut step
    // makes depth collapse geometrically, so 8 rounds must suffice
    val path = (1L until 30L).map(i => (i, i + 1))
    val got = cc(path, maxIter = 8)
    assert(got.size == 30 && got.values.toSet == Set(1L))
  }

  test("canonical election works for STRING document ids (URLs/UUIDs)") {
    import spark.implicits._
    val members = Seq(("url-b", 1L), ("url-a", 1L), ("url-c", 1L))
      .toDF("id", "cluster_id")
    val docs = Seq(
      ("url-a", "one two three"), // most tokens → keeper
      ("url-b", "one two"),
      ("url-c", "one two")).toDF("doc_id", "text")
    val got = DupClusters.canonicalPerCluster(members, docs, "doc_id", "text")
      .collect().map(r => (r.getAs[String]("keep_id"),
        r.getAs[Long]("cluster_size"))).toSeq
    assert(got == Seq(("url-a", 3L)), got)
  }

  test("empty pair list yields empty membership") {
    val got = cc(Seq.empty[(Long, Long)])
    assert(got.isEmpty)
  }

  test("canonical election: most tokens wins, ties break to smallest id") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id1", "id2")
    val docs = Seq(
      (1L, "a b c"),        // 3 tokens
      (2L, "a b c d e"),    // 5 tokens -> keeper of cluster 1
      (3L, "a"),
      (10L, "x y"),         // tie on 2 tokens with 11 -> 10 keeps (min id)
      (11L, "p q")
    ).toDF("doc_id", "text")
    val members = DupClusters.connectedComponents(pairs, "id1", "id2")
    val got = DupClusters
      .canonicalPerCluster(members, docs, "doc_id", "text")
      .orderBy("cluster_id")
      .as[(Long, Long, Long, Int)].collect().toSeq
    assert(got == Seq((1L, 3L, 2L, 5), (10L, 2L, 10L, 2)))
  }

  test("pageRank: star center outranks leaves; cliques sit at the 1e6 fixed point; hand-checked") {
    // star: 1-2, 1-3, 1-4; separate triangle clique: 10-11, 11-12, 10-12
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L)).toDF("id1", "id2")
    val byId = DupClusters.pageRank(pairs, "id1", "id2", iterations = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // clique nodes: deg 2, every iteration receives 2·(pr/2) = pr → fixed
    for (id <- Seq(10L, 11L, 12L)) assert(byId(id) == ((2L, 1000000L)))
    // star, hand-unrolled with the pinned integer divisions:
    // r1: center 150000+850000·3 div 1 ... leaves get 150000+(850000·(10⁶ div 3))div 10⁶
    // r1(center)=150000+(850000*3000000)/1e6=2700000; r1(leaf)=150000+(850000*333333)/1e6=433333
    // r2(center)=150000+(850000*(433333*3))/1e6=1255000-? compute: 433333*3=1299999 → 150000+1104999=1254999
    // r2(leaf)=150000+(850000*(2700000 div 3))/1e6=150000+765000=915000
    // r3(center)=150000+(850000*(915000*3))/1e6=150000+2333250=2483250
    assert(byId(1L) == ((3L, 2483250L)), s"center got ${byId(1L)}")
    assert(byId(1L)._2 > 1000000L && byId(2L)._2 < 1000000L)
    assert(byId(2L) == byId(3L) && byId(3L) == byId(4L))
  }
}
