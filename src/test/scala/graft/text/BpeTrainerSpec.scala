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

  test("driver collect is capped: maxVocab fails fast, minFreq floors exactly") {
    val docs = Seq(
      (1L, "aba aba aba cc cc rare1 rare2 rare3"),
      (2L, "aba cc dd dd")).toDF("doc_id", "text")
    // 6 distinct words; a 4-word cap must fail BEFORE folding, with guidance
    val e = intercept[IllegalArgumentException] {
      BpeTrainer.train(spark, docs, 2, maxVocab = 4)
    }
    assert(e.getMessage.contains("maxVocab=4"), e.getMessage)
    assert(e.getMessage.contains("minFreq"), e.getMessage)
    // floor=1 is the exact table: identical merges to the uncapped path
    val all = BpeTrainer.wordFreqs(docs).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val floored1 = BpeTrainer.train(spark, docs, 2, minFreq = 1L).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(floored1 == BpeTrainer.trainFromWordFreqs(all, 2))
    // floor=2 drops ONLY the below-floor words (the three singletons) and
    // equals the fold over the explicitly filtered table
    val kept = all.filter(_._2 >= 2L)
    assert(kept.map(_._1).toSet == Set("aba", "cc", "dd"))
    val floored2 = BpeTrainer.train(spark, docs, 2, minFreq = 2L).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(floored2 == BpeTrainer.trainFromWordFreqs(kept, 2))
    // a floor ABOVE every below-cap count makes the cap pass again
    assert(BpeTrainer.train(spark, docs, 1, minFreq = 2L, maxVocab = 4)
      .count() == 1L)
    // encode under a floor covers exactly the floored vocabulary
    val enc = BpeTrainer.encode(spark, docs, 1, minFreq = 2L)
    assert(enc.select("w").distinct().collect().map(_.getString(0)).toSet ==
      Set("aba", "cc", "dd"))
  }

  test("deep fold: >=1000 merges at production depth, invariants hold") {
    // The gate corpora's vocabulary is deliberately tiny (sf0.1: 31 words,
    // 89-round pair supply — measured by tools/BpeDepthProbe, and folded
    // to exhaustion below), so production depth is proven on a
    // deterministic 4096-word compound vocabulary whose pair supply is
    // ~50k symbols deep. Round cost is vocab-bounded either way — that is
    // the hybrid design's whole point.
    val roots = Seq("stream", "steam", "team", "batch", "window", "shard",
      "token", "corpus", "merge", "vocab", "train", "sample", "bucket",
      "filter", "cluster", "anchor")
    val words = for {
      (a, i) <- roots.zipWithIndex; (b, j) <- roots.zipWithIndex
      k <- 0 until 16
    } yield (s"$a$b${('a' + k % 26).toChar}$k", ((i * 31 + j * 7 + k) % 97 + 1).toLong)
    assert(words.map(_._1).distinct.size == 4096)
    val t0 = System.nanoTime()
    val (merges, state) = BpeTrainer.trainWithState(words, 1000)
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"1000-merge fold over 4096 words in $secs%.1f s")
    assert(merges.size == 1000, "completion at production depth")
    assert(merges.map(_._1) == (1 to 1000), "rounds are dense and ordered")
    // the winning pair count never increases round-over-round (merging the
    // global max can only shrink or preserve other pair counts)
    merges.map(_._4).sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a, s"pair counts must be monotone non-increasing: $a -> $b")
    }
    // encode-table consistency: every word's final segmentation
    // concatenates back to the word, over the full vocabulary
    val byWord = state.toMap
    assert(byWord.size == words.size)
    words.foreach { case (w, _) =>
      assert(byWord(w).mkString == w, s"segmentation must spell $w")
      assert(byWord(w).nonEmpty)
    }

    // and the sf0.1-shape corpus vocabulary folds to full exhaustion: the
    // same 89-round supply at every scale factor (vocabulary, not corpus
    // size, bounds depth — t42's 60 rounds clear it with margin)
    val tiny = Seq("the quick brown fox", "the brown cow jumped over",
      "quick brown quick the").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val tinyWords = BpeTrainer.wordFreqs(tiny).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val dry = intercept[IllegalArgumentException] {
      BpeTrainer.trainFromWordFreqs(tinyWords, 100000)
    }
    assert(dry.getMessage.contains("ran dry"), dry.getMessage)
  }
}
