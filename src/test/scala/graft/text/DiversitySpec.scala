package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DiversitySpec extends SparkSpec {
  import spark.implicits._

  private def census(rows: Seq[(String, String)]) =
    Diversity.tokenDiversity(rows.toDF("g", "text"), "g", "text")
      .collect().map(r => r.getString(0) -> r).toMap

  test("degenerate single-token group: simpson 1e6, ttr collapses") {
    val m = census(Seq(("a", "x x x x"), ("a", "x x")))("a")
    assert(m.getLong(1) == 6L)       // n_tokens
    assert(m.getLong(2) == 1L)       // vocab
    assert(m.getLong(3) == 166666L)  // ttr: 1e6/6
    assert(m.getLong(4) == 1000000L) // simpson: 6·5/(6·5)
    assert(m.getLong(5) == 1000000L) // top share
  }

  test("all-distinct group: simpson 0, ttr 1e6") {
    val m = census(Seq(("b", "a b c d e")))("b")
    assert(m.getLong(2) == 5L && m.getLong(3) == 1000000L
      && m.getLong(4) == 0L && m.getLong(5) == 200000L)
  }

  test("hand-computed mixed group matches the integer formulas") {
    // counts: the=3, cat=1 → N=4, V=2
    val m = census(Seq(("c", "the the"), ("c", "the cat")))("c")
    assert(m.getLong(1) == 4L && m.getLong(2) == 2L)
    assert(m.getLong(3) == 500000L)            // 2e6/4
    assert(m.getLong(4) == (3L * 2) * 1000000L / (4L * 3)) // 500000
    assert(m.getLong(5) == 750000L)            // 3e6/4
    // surp(the)=len(bin(4 div 3))=len("1")=1; surp(cat)=len(bin(4))=3
    // bits = 3·1 + 1·3 = 6 → mean milli = 6000/4 = 1500
    assert(m.getLong(6) == 1500L)
  }

  test("partition-count independent") {
    val df = (1 to 200).map(i => (s"g${i % 3}", s"tok${i % 17} tok${i % 5} common"))
      .toDF("g", "text")
    val a = Diversity.tokenDiversity(df.repartition(1), "g", "text")
      .orderBy("g").collect().toSeq
    val b = Diversity.tokenDiversity(df.repartition(13), "g", "text")
      .orderBy("g").collect().toSeq
    assert(a == b)
  }
}
