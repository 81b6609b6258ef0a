package graft.sketch

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("psiByGroup: identical histograms score 0; a shifted feed scores higher") {
    // a and b: identical length histograms (8 docs each in the same
    // log2 bins) → both PSI 0 against their complement ONLY if the
    // complement also matches; with c drifted, a and b still mirror
    // each other so psi(a) == psi(b), and c (all lengths 10x) > both.
    val mk = Seq(10L, 10L, 20L, 20L, 40L, 40L, 80L, 80L)
    val rows = mk.zipWithIndex.map { case (v, i) => (s"a$i", "a", v) } ++
      mk.zipWithIndex.map { case (v, i) => (s"b$i", "b", v) } ++
      mk.zipWithIndex.map { case (v, i) => (s"c$i", "c", v * 1000L) }
    val df = rows.toDF("doc_id", "source", "n_chars")
    val out = Drift.psiByGroup(df, "source", col("n_chars"))
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("psi"))).toMap
    assert(out("a")._1 == 8L && out.size == 3)
    assert(out("a")._2 == out("b")._2, "mirror feeds score identically")
    assert(out("c")._2 > out("a")._2, s"drifted feed must dominate: $out")
    assert(out.values.forall(_._2 >= 0L), "PSI is non-negative")
  }

  test("psiByGroup: exact zero when a group matches its complement; missing bins contribute") {
    // two groups with IDENTICAL histograms → each equals its
    // complement exactly (same counts, same n) → psi 0 for both.
    val mk = Seq(3L, 3L, 30L, 30L)
    val same = (mk.map(v => ("x", v)) ++ mk.map(v => ("y", v)))
      .zipWithIndex.map { case ((g, v), i) => (s"d$i", g, v) }
      .toDF("doc_id", "source", "n_chars")
    val zero = Drift.psiByGroup(same, "source", col("n_chars"))
      .collect().map(_.getAs[Long]("psi")).toSeq
    assert(zero == Seq(0L, 0L))
    // g hits ONLY bin A, rest only bin B: the domain cross ensures g's
    // missing-bin q-mass is priced (psi > 0 from BOTH bins' terms)
    val disjoint = Seq(("e1", "g", 1L), ("e2", "g", 1L),
      ("e3", "h", 1000L), ("e4", "h", 1000L))
      .toDF("doc_id", "source", "n_chars")
    val d = Drift.psiByGroup(disjoint, "source", col("n_chars"))
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("psi"))
      .toMap
    assert(d("g") > 0L && d("h") > 0L)
    // partition independence
    val re = Drift.psiByGroup(same.repartition(7), "source", col("n_chars"))
      .collect().map(_.getAs[Long]("psi")).toSeq
    assert(re == zero)
  }

  test("psiFromCounts: >1e6-row group with a missed bin keeps its drift term (no NULL slog)") {
    // fed as a COUNT GRID (psiFromCounts' contract), so the >1e6-row
    // regime costs 3 rows, not 3M: group `big` holds 3,000,000 rows in
    // bin 5 and MISSES bin 9 → its smoothed ppm proportion there is
    // (0+1)*1e6 div (3e6+2) = 0. Before the greatest(·,1) guard the
    // slog computed `q div 0` → NULL in non-ANSI Spark, silently
    // dropping exactly the missing-bin term PSI exists to price.
    val counts = Seq(
      ("big", 5L, 3000000L),
      ("small", 5L, 4L),
      ("small", 9L, 4L)).toDF("g", "b", "c")
    val out = Drift.psiFromCounts(counts)
      .collect().map(r => r.getAs[String]("g") ->
        (if (r.isNullAt(r.fieldIndex("psi"))) None
         else Some(r.getAs[Long]("psi")))).toMap
    assert(out.size == 2)
    assert(out.values.forall(_.isDefined), s"psi must never be NULL: $out")
    assert(out("big").get > 0L,
      s"big misses bin 9 entirely - the saturated term must price it: $out")
    assert(out("small").get > 0L)
    assert(out.values.forall(_.get >= 0L), "PSI stays non-negative")
  }
}
