package graft.dedup

import graft.SparkSpec

/** Randomized (seeded) closure invariants: the distributed min-label
  * propagation must agree with a driver-side union-find on ANY graph,
  * not just the topology fixtures in DupClustersSpec.
  */
class DupClustersPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260812)

  /** Reference implementation: union-find with path compression. */
  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra max rb) = ra min rb
    }
    // roots are not guaranteed minimal under arbitrary union order;
    // normalize: label every node with the min id of its component
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val byRoot = nodes.groupBy(find)
    byRoot.valuesIterator.flatMap { members =>
      val m = members.min
      members.map(_ -> m)
    }.toMap
  }

  test("connected components agree with driver-side union-find on random graphs") {
    (1 to 6).foreach { trial =>
      val n = rnd.nextInt(60) + 5
      val nEdges = rnd.nextInt(80) + 1
      val pairs = (1 to nEdges).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter(p => p._1 != p._2)
      if (pairs.nonEmpty) {
        val got = DupClusters
          .connectedComponents(pairs.toDF("id1", "id2"), "id1", "id2")
          .as[(Long, Long)].collect().toMap
        val want = unionFind(pairs)
        assert(got == want,
          s"trial $trial (n=$n edges=${pairs.size}): " +
            s"diff=${(got.toSet diff want.toSet).take(5)}")
      }
    }
  }
}
