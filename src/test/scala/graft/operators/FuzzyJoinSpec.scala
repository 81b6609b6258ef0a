package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** FuzzyJoin completeness: blocked candidates must find EVERY pair a
  * brute-force cross product finds, across substitutions, inserts,
  * deletes, and the long/short length boundary.
  */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def bruteForce(left: Seq[(Long, String)], right: Seq[(Long, String)])
      : Set[(Long, Long, Int)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    for {
      (li, ls) <- left.toSet[(Long, String)]
      (ri, rs) <- right.toSet[(Long, String)]
      d = lev(ls, rs) if d <= 1
    } yield (li, ri, d)
  }

  private def run(left: Seq[(Long, String)], right: Seq[(Long, String)])
      : Set[(Long, Long, Int)] =
    FuzzyJoin.join1(
        left.toDF("id", "s"), right.toDF("id", "s"), "id", "s", "id", "s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("substitution / insert / delete at every position — all recovered") {
    val base = "abcdefghijkl" // 12 chars, long path (p=4)
    val left = Seq(1L -> base)
    val right =
      base.indices.map(i => (100L + i, base.updated(i, 'z').mkString)) ++
      (0 to base.length).map(i =>
        (200L + i, (base.take(i) + "z" + base.drop(i)))) ++
      base.indices.map(i => (300L + i, (base.take(i) + base.drop(i + 1))))
    assert(run(left, right.map(t => (t._1.toLong, t._2))) ==
      bruteForce(left, right.map(t => (t._1.toLong, t._2))))
  }

  test("short strings and the length boundary (len 7..9 vs p=4)") {
    val left = Seq(1L -> "abcdefg", 2L -> "abcdefgh", 3L -> "abcdefghi",
      4L -> "xyz", 5L -> "")
    val right = Seq(10L -> "abcdefg", 11L -> "abcdefgz", 12L -> "abcdefghi",
      13L -> "abcdefgh", 14L -> "zbcdefgh", 15L -> "xz", 16L -> "z",
      17L -> "abcdeXghi")
    assert(run(left, right) == bruteForce(left, right))
  }

  test("random corpus: blocked result ≡ brute force") {
    val rnd = new scala.util.Random(7)
    def word() = (0 until (5 + rnd.nextInt(10)))
      .map(_ => ('a' + rnd.nextInt(6)).toChar).mkString
    val left = (1L to 150L).map(i => i -> word())
    val right = (1L to 150L).map { i =>
      val w = left((i % 150).toInt)._2
      val mutated =
        if (i % 4 == 0 && w.nonEmpty) w.updated(rnd.nextInt(w.length), 'q').mkString
        else if (i % 4 == 1) w + "q"
        else w
      (1000L + i) -> mutated
    }
    assert(run(left, right) == bruteForce(left, right))
  }

  test("no cartesian product in the candidate plan") {
    val l = (1L to 50L).map(i => i -> s"str-$i-abcdefgh").toDF("id", "s")
    val p = FuzzyJoin.join1(l, l, "id", "s", "id", "s")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p.take(800))
  }
}
