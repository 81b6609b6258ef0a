package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The hybrid BPE trainer: local-fold semantics hand-checked, agreement
  * with the distributed t39 rounds, and the dry-census guard.
  */
class BpeTrainerSpec extends SparkSpec {
  import spark.implicits._

  test("local fold: census counts positions, argmax total-ordered, greedy non-overlap") {
    // "abab"×3 + "ab"×2: census (a,b)=8, (b,a)=3 → merge (a,b)
    val words = Seq(("abab", 3L), ("ab", 2L))
    val m = BpeTrainer.trainFromWordFreqs(words, 2)
    assert(m.head == ((1, "a", "b", 8L)), m.head.toString)
    // after round 1: abab→[ab,ab], ab→[ab] → round 2 merges (ab,ab)=3
    assert(m(1) == ((2, "ab", "ab", 3L)), m(1).toString)

    // overlapping runs: "aaa"×1 census (a,a)=2; greedy fold merges the
    // FIRST pair only — [aa, a], never [a, aa] or a double merge
    val r = BpeTrainer.trainFromWordFreqs(Seq(("aaa", 1L)), 1)
    assert(r.head == ((1, "a", "a", 2L)))

    // tie-break: equal counts pick the lexicographically least (a, b)
    val t = BpeTrainer.trainFromWordFreqs(Seq(("zy", 1L), ("ab", 1L)), 1)
    assert(t.head == ((1, "a", "b", 1L)), t.head.toString)
  }

  test("hybrid ≡ distributed: first rounds match t39's census/pick on real docs") {
    val docs = Seq(
      (1L, "the quick brown fox the quick"),
      (2L, "the brown cow jumped over the brown fence"),
      (3L, "quick brown quick the")).toDF("doc_id", "text")
    // distributed census round (the t39 inner step), replayed manually
    val words = BpeTrainer.wordFreqs(docs).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val hybrid = BpeTrainer.trainFromWordFreqs(words, 3)
    // one distributed round 1 census to cross-check the first pick
    val top = docs
      .select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("freq"), explode(expr(
        "transform(sequence(1, char_length(w) - 1)," +
          " i -> struct(substring(w, i, 1) AS a, substring(w, i+1, 1) AS b))"))
        .as("p"))
      .groupBy(col("p.a"), col("p.b")).agg(sum("freq").as("cnt"))
      .orderBy(col("cnt").desc, col("a"), col("b")).limit(1)
      .collect().head
    assert(hybrid.head ==
      ((1, top.getString(0), top.getString(1), top.getLong(2))))
    // end-to-end DataFrame form is ordered and typed
    val df = BpeTrainer.train(spark, docs, 3)
    assert(df.columns.toSeq ==
      Seq("round", "left_sym", "right_sym", "pair_count"))
    assert(df.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
      r.getLong(3))).toSeq == hybrid)
  }

  test("encode: vocab-sized table, broadcast corpus join, conservation invariants") {
    val docs = Seq(
      (1L, "en", "aba aba cc"),
      (2L, "de", "aba cc cc dd")).toDF("doc_id", "lang", "text")
    val enc = BpeTrainer.encode(spark, docs, 2, carryCols = Seq("lang"))
    val rows = enc.collect()
    assert(rows.length == 7, "one row per token occurrence")
    rows.foreach { r =>
      val (w, u, c) = (r.getAs[String]("w"), r.getAs[Long]("n_units"),
        r.getAs[Long]("n_chars"))
      assert(c == w.length.toLong)
      assert(u >= 1L && u <= c, s"$w: units $u chars $c")
    }
    // segmentation is the post-training state: re-derive and compare
    val words = BpeTrainer.wordFreqs(docs).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val state = BpeTrainer.trainWithState(words, 2)._2.toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_units") ==
        state(r.getAs[String]("w")).length.toLong)
    }
    // the corpus pass is a broadcast join — the 100 TB contract
    val p = enc.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("BroadcastHashJoin"), p.take(600))
  }

  test("round cost is corpus-independent; dry census fails loudly") {
    // same vocab at 100× the frequency: identical merges (scaled counts)
    val base = Seq(("stream", 7L), ("steam", 5L), ("team", 3L))
    val scaled = base.map { case (w, f) => (w, f * 100) }
    val a = BpeTrainer.trainFromWordFreqs(base, 5)
    val b = BpeTrainer.trainFromWordFreqs(scaled, 5)
    assert(a.map(x => (x._1, x._2, x._3)) == b.map(x => (x._1, x._2, x._3)))
    assert(b.map(_._4) == a.map(_._4 * 100))
    // a vocabulary that runs dry before n rounds is an error, not silence
    val e = intercept[IllegalArgumentException] {
      BpeTrainer.trainFromWordFreqs(Seq(("ab", 1L)), 5)
    }
    assert(e.getMessage.contains("ran dry"), e.getMessage)
  }
}
