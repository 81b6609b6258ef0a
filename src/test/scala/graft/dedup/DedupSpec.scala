package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val doc1 = "the quick brown fox jumps over the lazy dog"
  private val doc1Near = "the quick brown fox jumps over the lazy cat"
  private val doc2 = "completely different words appear in this sentence here now"

  test("exact dedup keeps min id per content with dupe counts") {
    val df = Seq((1L, doc1), (2L, doc1), (3L, doc2)).toDF("doc_id", "text")
    val out = Dedup.exactDedup(df, "text", "doc_id")
      .orderBy("keep_id").collect()
    assert(out.map(r => (r.getAs[Long]("keep_id"), r.getAs[Long]("dupe_count"))).toSeq
      == Seq((1L, 2L), (3L, 1L)))
  }

  test("shingles: distinct sorted word n-grams; short text → empty") {
    val df = Seq("a b c d", "a b").toDF("text")
      .select(Dedup.shingles(col("text"), 3).as("sh"))
    val got = df.as[Seq[String]].collect()
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1).isEmpty)
  }

  test("minhash: identical texts agree; near texts share most positions; distinct texts don't") {
    val df = Seq((1L, doc1), (2L, doc1), (3L, doc1Near), (4L, doc2))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.minhashSignature(col("text"), 3, 16).as("sig"))
    val sigs = df.orderBy("doc_id").as[(Long, Seq[Long])].collect().map(_._2)
    assert(sigs(0) == sigs(1), "identical docs → identical signatures")
    val nearMatches = sigs(0).zip(sigs(2)).count { case (a, b) => a == b }
    val farMatches = sigs(0).zip(sigs(3)).count { case (a, b) => a == b }
    assert(nearMatches > farMatches, s"near=$nearMatches far=$farMatches")
  }

  test("lsh candidate pairs surface the identical pair") {
    val df = Seq((1L, doc1), (2L, doc1), (4L, doc2)).toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.minhashSignature(col("text"), 3, 16).as("sig"))
    val pairs = Dedup.lshCandidatePairs(df, "doc_id", "sig", 4, 4).collect()
    val exact = pairs.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(exact.isDefined && exact.get.getAs[Int]("est_matches") == 16)
  }

  test("simhash: identical → hamming 0; near < far") {
    val df = Seq((1L, doc1), (2L, doc1), (3L, doc1Near), (4L, doc2))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.simhash(col("text")).as("sh"))
    val sh = df.orderBy("doc_id").as[(Long, Long)].collect().map(_._2)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(0), sh(1)) == 0)
    assert(ham(sh(0), sh(2)) < ham(sh(0), sh(3)),
      s"near=${ham(sh(0), sh(2))} far=${ham(sh(0), sh(3))}")
  }

  test("LSH s-curve: threshold and candidate probability behave per theory") {
    // the repo's (4 bands, 4 rows) banding targets Jaccard ≈ 0.71
    assert(math.abs(Dedup.lshThreshold(4, 4) - math.pow(0.25, 0.25)) < 1e-12)
    // steep s-curve: well below threshold → unlikely candidate; well above → near-certain
    val (b, r) = (4, 4)
    val t = Dedup.lshThreshold(b, r)
    assert(Dedup.lshCandidateProbability(t - 0.3, b, r) < 0.2)
    assert(Dedup.lshCandidateProbability(t + 0.25, b, r) > 0.9)
    // monotone in s
    val ps = (0 to 10).map(i => Dedup.lshCandidateProbability(i / 10.0, b, r))
    assert(ps == ps.sorted)
    assert(ps.head == 0.0 && math.abs(ps.last - 1.0) < 1e-12)
  }

  test("banded simhash pairs: complete vs naive all-pairs, band-key join in plan") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sh = Dedup.simhashes(docs, "doc_id", "text", carry = Seq("lang"))
      .localCheckpoint()
    val banded = Dedup.simhashNearDupPairs(sh, "doc_id", "simhash",
      radius = 5, blockCols = Seq("lang"))
    // plan proof: candidates come from a band-key equality join, not a
    // lang-only product
    assert(banded.queryExecution.optimizedPlan.toString.contains("band_sig"))
    val got = banded.orderBy("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val l = sh.select(col("doc_id").as("id1"), col("lang"), col("simhash").as("sh1"))
    val r = sh.select(col("doc_id").as("id2"), col("lang"), col("simhash").as("sh2"))
    val naive = l.join(r, "lang").filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        Dedup.hammingDistance(col("sh1"), col("sh2")).cast("int").as("hamming"))
      .filter(col("hamming") <= 5)
      .orderBy("id1", "id2").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSeq
    assert(got == naive, s"banded ${got.size} pairs vs naive ${naive.size}")
    // identical docs always collide in every band
    val two = Seq((1L, "en", "same words here"), (2L, "en", "same words here"))
      .toDF("doc_id", "lang", "text")
    val sh2 = Dedup.simhashes(two, "doc_id", "text", carry = Seq("lang"))
    val p = Dedup.simhashNearDupPairs(sh2, "doc_id", "simhash",
      radius = 5, blockCols = Seq("lang")).collect()
    assert(p.length == 1 && p(0).getInt(2) == 0)
  }

  test("shared-window pairs: copied passages surface, unrelated docs never join") {
    val copied = "one two three four five six seven eight nine ten eleven twelve"
    val partial = "zzz one two three four five six seven eight nine ten yyy"
    val df = Seq(
      (1L, copied),
      (2L, copied + " extra tail words here"),
      (3L, partial),
      (4L, "totally different words that never overlap with anything else at all"))
      .toDF("doc_id", "text")
    val pairs = Dedup.sharedWindowPairs(df, "doc_id", "text", 8, 3)
      .orderBy("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("shared_windows"))).toSeq
    // docs 1 and 2 share all 5 of doc 1's 8-token windows; 1-3 share 3
    assert(pairs.contains((1L, 2L, 5L)), pairs.toString)
    assert(pairs.exists(p => p._1 == 1L && p._2 == 3L && p._3 == 3L))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("shared-window pairs: a passage repeated WITHIN a doc still counts one window") {
    // shingleRows is distinct per (doc, window): doc 2 contains the same
    // 8-token passage twice, doc 3 once — the pair must count each shared
    // window ONCE, not (occurrences in A) × (occurrences in B)
    val passage = "alpha beta gamma delta epsilon zeta eta theta"
    val df = Seq(
      (2L, s"$passage filler words between repeats $passage"),
      (3L, s"intro $passage outro"))
      .toDF("doc_id", "text")
    val pairs = Dedup.sharedWindowPairs(df, "doc_id", "text", 8, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("shared_windows")))
    assert(pairs.toSeq == Seq((2L, 3L, 1L)),
      s"repeated intra-doc passage must not multiply the count: ${pairs.toSeq}")
  }

  test("df cap: ubiquitous shingles leave the posting lists; set sizes stay exact") {
    // "x y" appears in every doc (df=4 > maxDf=3) — it must stop
    // generating candidate pairs; "y a"/"a b" (df=2) keep pairing 1-2.
    // Doc sizes stay pre-cap, so the 1-2 jaccard DENOMINATOR still counts
    // the capped shingle: inter={y a, a b}=2, sz=4 each →
    // 2/(4+4-2) = 333333 ppm (uncapped it would be 3/5 = 600000).
    val df = Seq(
      (1L, "g", "x y a b c"), (2L, "g", "x y a b d"),
      (3L, "g", "x y p q"), (4L, "g", "x y r s"))
      .toDF("doc_id", "blk", "text")
    val capped = Dedup.jaccardPairs(df, "doc_id", "text", 2, Seq("blk"), maxDf = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("jaccard_ppm")))
    assert(capped.toSeq == Seq((1L, 2L, 333333L)),
      s"only sub-cap postings may pair: ${capped.toSeq}")
    // uncapped (default maxDf=1000): "x y" pairs everything
    val full = Dedup.jaccardPairs(df, "doc_id", "text", 2, Seq("blk"))
      .collect()
    assert(full.length == 6, "uncapped: all 4 docs pair via 'x y'")
    // same guard on shared windows: the ubiquitous window stops pairing
    val w = Seq(
      (1L, "one two three four five six seven eight a"),
      (2L, "one two three four five six seven eight b"),
      (3L, "one two three four five six seven eight c"))
      .toDF("doc_id", "text")
    assert(Dedup.sharedWindowPairs(w, "doc_id", "text", 8, 1, maxDf = 2)
      .collect().isEmpty)
    assert(Dedup.sharedWindowPairs(w, "doc_id", "text", 8, 1).count() == 3)
  }

  test("jaccard ppm: exact integer similarity") {
    val df = Seq((1L, "g", "a b c d"), (2L, "g", "a b c e"), (3L, "g", "x y z w"))
      .toDF("doc_id", "blk", "text")
    val pairs = Dedup.jaccardPairs(df, "doc_id", "text", 2, Seq("blk"))
      .orderBy("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("jaccard_ppm"))).toSeq
    // "a b c d" 2-grams {ab,bc,cd}; "a b c e" → {ab,bc,ce}: 2/4 = 500000 ppm
    assert(pairs.contains((1L, 2L, 500000L)))
    // zero-intersection pairs never materialize (inverted-index semantics)
    assert(!pairs.exists(p => p._2 == 3L))
  }

  test("contamination check flags corpus docs reproducing benchmark windows") {
    val bench = Seq((100L, "q r s t u v w x y z")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "intro q r s t u v w x y z outro"), // contains 3 bench 8-windows
      (2L, "totally different text with no overlap at all here"),
      (3L, "q r s t u v w x")                  // exactly 1 shared window
    ).toDF("doc_id", "text")
    val got = Dedup.contaminationCheck(corpus, bench, "doc_id", "text",
        8, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // doc 1: windows q..x, r..y, s..z all appear in the benchmark
    assert(got == Seq((1L, 3L, 1L)),
      s"only doc 1 crosses the 2-window threshold: $got")
  }

  test("bloom prefilter dedup == exact anti-join; empty corpus → all new") {
    val corpus = (1 to 400).map(i => s"key-${i * 3}").toDF("k")
    // incoming overlaps corpus on multiples of 3, plus genuinely new keys
    val incoming = (1 to 500).map(i => (i.toLong, s"key-$i")).toDF("id", "k")
    val got = Dedup.bloomNewRows(corpus, incoming, "k",
        expectedCorpusKeys = 400)
      .select("id").as[Long].collect().sorted
    val want = incoming.join(corpus, Seq("k"), "left_anti")
      .select("id").as[Long].collect().sorted
    assert(got.sameElements(want), s"got ${got.length}, want ${want.length}")
    assert(want.length == 500 - 166) // multiples of 3 in 1..500 are dups

    // tiny fpp → bloom diverts nearly all new keys around the join; the
    // result is STILL exact regardless (this pins the union semantics)
    val tight = Dedup.bloomNewRows(corpus, incoming, "k", 400, fpp = 0.001)
      .select("id").as[Long].collect().sorted
    assert(tight.sameElements(want))

    // empty corpus: BloomFilterAggregate yields a NULL bloom — the guard
    // must return the whole batch, not silently drop it
    val none = Dedup.bloomNewRows(corpus.limit(0), incoming, "k", 1)
    assert(none.count() == 500)
  }

  test("fixture guard: shingle df stays far below the posting cap the oracles don't mirror") {
    // d2/d6/d9's Spark side caps posting lists at maxDf=1000; their
    // DuckDB oracles intersect UNCAPPED lists. At the shipped fixtures
    // the cap never fires (max df ≈ 5) so the two agree — this guard
    // turns a silently-diverging REGENERATED fixture (df > cap → gate
    // hash mismatch with no code change) into a loud, attributable
    // failure. If this trips: mirror the cap in the oracle SQL or
    // re-tune maxDf.
    for (sf <- Seq("0.001", "0.01")) {
      val docs = spark.read.parquet(s"/root/testdata/sf$sf/documents.parquet")
      val maxDf = Dedup.shingleRows(docs, "doc_id", "text", 3)
        .join(docs.select(col("doc_id"), col("lang"), col("source")), "doc_id")
        .groupBy(col("lang"), col("source"), col("s")).count()
        .agg(max(col("count"))).head().getLong(0)
      assert(maxDf < 500,
        s"sf$sf max per-block shingle df=$maxDf approaches the 1000 cap " +
          "— the d2/d6/d9 oracles do not mirror capping")
      // the minhash oracles also assume every doc has >= 3 tokens
      val short = docs.filter(size(graft.text.TextAnalysis
        .tokens(col("text"))) < 3).count()
      assert(short == 0,
        s"sf$sf has $short sub-3-token docs — d3/d10 oracle sig CTE " +
          "excludes shingle-less docs; re-verify alignment")
    }
  }

  test("bloom prefilter plan: codegen'd might_contain, anti-join only") {
    // file-backed inputs: over a LocalRelation the optimizer evaluates
    // the might_contain filters at plan time and they vanish
    val base = java.nio.file.Files.createTempDirectory("graft-bloom").toString
    (1 to 50).map(i => s"c$i").toDF("k")
      .write.mode("overwrite").parquet(s"$base/corpus")
    (1 to 80).map(i => (i, s"c$i")).toDF("id", "k")
      .write.mode("overwrite").parquet(s"$base/incoming")
    val corpus = spark.read.parquet(s"$base/corpus")
    val incoming = spark.read.parquet(s"$base/incoming")
    val plan = Dedup.bloomNewRows(corpus, incoming, "k", 50)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("might_contain"), plan.take(800))
    assert(plan.contains("LeftAnti"), plan.take(800))
    assert(!plan.contains("Inner"), "no inner join anywhere in the plan")
  }

  test("boilerplate census: df threshold splits shared vs unique grams; positions weighted") {
    // "a b c" appears in docs 1,2,3 (df=3); everything else is unique.
    // doc 4 repeats the boilerplate gram TWICE — both positions count.
    // doc 5 is too short for a 3-gram → kept with zeros.
    val df = Seq(
      (1L, "a b c x y z"),            // grams: "a b c","b c x","c x y","x y z"
      (2L, "a b c p q r"),
      (3L, "a b c m n o"),
      (4L, "a b c a b c"),            // "a b c"@2, "b c a", "c a b"
      (5L, "hi there")
    ).toDF("doc_id", "text")
    val out = Dedup.boilerplateStats(df, "doc_id", "text", 3, minDf = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_pos"),
        r.getAs[Long]("n_boiler"), r.getAs[Long]("boiler_ppm"))).toSeq
    // df("a b c") counts DISTINCT docs (1,2,3,4) = 4 ≥ 3 → boilerplate
    assert(out == Seq(
      (1L, 4L, 1L, 250000L),
      (2L, 4L, 1L, 250000L),
      (3L, 4L, 1L, 250000L),
      (4L, 4L, 2L, 500000L),
      (5L, 0L, 0L, 0L)))
    // partition-independence: the window df is a property of the data
    val re = Dedup.boilerplateStats(df.repartition(7), "doc_id", "text", 3, 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_pos"),
        r.getAs[Long]("n_boiler"), r.getAs[Long]("boiler_ppm"))).toSeq
    assert(re == out)
  }

  test("boilerplate coverage: overlapping occurrences union, never double-count") {
    // "a b c" is boilerplate (df=3). Doc 4's overlapping occurrences
    // "a b c a b c" + internal grams cover positions, and the hand-
    // checkable case: doc 6 = "k a b c a b c k" — occurrences of
    // "a b c" at 0-based 1 and 4 cover [1,3] ∪ [4,6] = 6 tokens, NOT 2×3
    // plus re-counted overlap from any interleaved boilerplate gram.
    val df = Seq(
      (1L, "a b c x y z"),
      (2L, "a b c p q r"),
      (3L, "a b c m n o"),
      (6L, "k a b c a b c k"),
      (5L, "hi there")
    ).toDF("doc_id", "text")
    val out = Dedup.boilerplateCoverage(df, "doc_id", "text", 3, minDf = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("boiler_tokens"), r.getAs[Long]("clean_tokens"),
        r.getAs[Long]("removed_ppm"))).toSeq
    assert(out == Seq(
      (1L, 6L, 3L, 3L, 500000L),   // "a b c" covers [0,2] of 6
      (2L, 6L, 3L, 3L, 500000L),
      (3L, 6L, 3L, 3L, 500000L),
      (5L, 2L, 0L, 2L, 0L),        // too short for a 3-gram
      (6L, 8L, 6L, 2L, 750000L)))  // [1,3] ∪ [4,6]: union 6, not 9
    // partition-independent (the sweep is a per-doc window)
    val re = Dedup.boilerplateCoverage(df.repartition(7), "doc_id", "text",
      3, 3).orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("boiler_tokens")))
      .toSeq
    assert(re == out.map(t => (t._1, t._3)))
  }

  test("repetitionSignals: overlap union, lexicographic tie-break, short docs") {
    // doc 1: top bigram "a a" ×3 overlapping → union [0,3] = 4 of 5;
    //        dup trigram "a a a" ×2 overlapping → union [0,3] = 4 of 5.
    // doc 2: three bigrams tied at 2 → lexicographically smallest "a d"
    //        (pos 2,6) → 4 of 8; dup trigrams "b c a"+"c a d" →
    //        [0,3] ∪ [4,7] = 8 of 8.
    // doc 3: one token → no grams at all.
    // doc 4: all-distinct bigrams tie at 1 → smallest "p q" covers 2 of 3;
    //        the only trigram occurs once → dup3 = 0.
    val df = Seq(
      (1L, "a a a a b"),
      (2L, "b c a d b c a d"),
      (3L, "x"),
      (4L, "p q r")
    ).toDF("doc_id", "text")
    val out = Dedup.repetitionSignals(df, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("top2_tokens"), r.getAs[Long]("dup3_tokens"),
        r.getAs[Long]("top2_ppm"), r.getAs[Long]("dup3_ppm"))).toSeq
    assert(out == Seq(
      (1L, 5L, 4L, 4L, 800000L, 800000L),
      (2L, 8L, 4L, 8L, 500000L, 1000000L),
      (3L, 1L, 0L, 0L, 0L, 0L),
      (4L, 3L, 2L, 0L, 666666L, 0L)))
    // partition-independent (all windows/joins are doc-keyed)
    val re = Dedup.repetitionSignals(df.repartition(5), "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("top2_tokens"),
        r.getAs[Long]("dup3_tokens"))).toSeq
    assert(re == out.map(t => (t._1, t._3, t._4)))
  }

  test("containmentPairs: strict token-prefix only; no char-boundary false positives") {
    val long = (1 to 40).map(i => s"w$i").mkString(" ")
    val df = Seq(
      (1L, long),                                        // container
      (2L, (1 to 20).map(i => s"w$i").mkString(" ")),    // true prefix
      (3L, long),                                        // exact dup: NOT strict
      // token w1..w19 + "w2" + "0x" — same CHARACTERS as 2's prefix +
      // junk, but "w20" vs "w2 0x" differ at a token boundary
      (4L, (1 to 19).map(i => s"w$i").mkString(" ") + " w2 0x suffix"),
      (5L, (1 to 20).map(i => s"v$i").mkString(" "))     // different family
    ).toDF("doc_id", "text")
      .select(col("doc_id"), graft.text.TextAnalysis.tokens(col("text")).as("tk"))
    val out = Dedup.containmentPairs(df, "doc_id", "tk")
      .collect().map(r => (r.getAs[Long]("contained_id"),
        r.getAs[Long]("container_id"), r.getAs[Long]("coverage_ppm"))).toSet
    assert(out.contains((2L, 1L, 500000L))) // 20 of 40 tokens
    assert(out.contains((2L, 3L, 500000L)))
    // exact dups are NOT containment (strict n_a < n_b), and doc 4's
    // shared 19-token prefix diverges at token 20 — the space-boundary
    // check must reject it against 1/3 (its own prefix differs at pk)
    assert(!out.exists { case (a, b, _) => a == 1L && b == 3L })
    assert(!out.exists { case (a, b, _) => a == 3L || (a == 4L) })
    assert(!out.exists { case (a, _, _) => a == 5L })
  }

  test("noveltyScores: re-posts score 0; stitched docs score low with no dup pair") {
    val df = Seq(
      (1L, doc1),                        // original: fully novel
      (2L, doc2),                        // different original: fully novel
      (3L, doc1),                        // verbatim re-post of 1 → 0 ppm
      // stitched half from 1 and half from 2 — derivative, but NOT a
      // near-dup of either half's source alone
      (4L, doc1.split(" ").take(5).mkString(" ") + " " +
        doc2.split(" ").take(5).mkString(" "))
    ).toDF("doc_id", "text")
    val out = Dedup.noveltyScores(df, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("novelty_ppm")).toMap
    assert(out(1L) == 1000000L && out(2L) == 1000000L)
    assert(out(3L) == 0L)
    // the stitch: grams inside each half are old; only the 2 grams
    // spanning the seam are new → low but nonzero
    assert(out(4L) > 0L && out(4L) < 500000L, s"stitched=${out(4L)}")
  }

  test("contentDefinedChunks: boundaries are content-local; shared paragraphs share chunks") {
    // a long base document and a copy with one word inserted mid-stream:
    // chunks before the edit's neighborhood must keep their hashes
    val words = (1 to 120).map(i => s"w${i % 37}")
    val edited = words.take(60) ++ Seq("INSERTED") ++ words.drop(60)
    val df = Seq((1L, words.mkString(" ")), (2L, edited.mkString(" ")))
      .toDF("doc_id", "text")
    val ch = Dedup.contentDefinedChunks(df, "doc_id", "text")
      .collect()
    val h1 = ch.filter(_.getLong(0) == 1L).map(_.getAs[String]("chunk_hash")).toSet
    val h2 = ch.filter(_.getLong(0) == 2L).map(_.getAs[String]("chunk_hash")).toSet
    // both docs chunked into several pieces, most shared despite the edit
    assert(h1.size > 3, s"doc1 only ${h1.size} chunks")
    val shared = h1.intersect(h2)
    assert(shared.nonEmpty && shared.size >= h1.size / 2,
      s"shared ${shared.size} of ${h1.size}")
    assert(h1 != h2) // the edit's own chunk DID change
    // deterministic + partition-independent
    val re = Dedup.contentDefinedChunks(df.repartition(5), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getAs[Long]("chunk_idx"),
        r.getAs[String]("chunk_hash"))).sorted.toSeq
    assert(re == ch.map(r => (r.getLong(0), r.getAs[Long]("chunk_idx"),
      r.getAs[String]("chunk_hash"))).sorted.toSeq)
    // chunk token counts partition the document
    val n1 = ch.filter(_.getLong(0) == 1L).map(_.getAs[Long]("n_tok")).sum
    assert(n1 == 120L)
  }

  test("contentDefinedChunks: empty-tokenizing documents yield no chunks, not phantoms") {
    // an empty token array used to hit sequence(1,0)=[1,0] and null-pad
    // a phantom 2-null-token chunk per empty doc
    val df = Seq((1L, "alpha beta gamma delta"), (2L, ""), (3L, "   "))
      .toDF("doc_id", "text")
    val ch = Dedup.contentDefinedChunks(df, "doc_id", "text").collect()
    assert(ch.forall(_.getLong(0) == 1L),
      s"empty docs produced chunks: ${ch.toSeq}")
    assert(ch.map(_.getAs[Long]("n_tok")).sum == 4L)
  }

  test("editVerifiedPairs: confirms near-dups, rejects banding false positives") {
    val docs = Seq(
      (1L, doc1), (2L, doc1Near),   // near pair: 1 char token differs
      (3L, doc2), (4L, "unrelated text that only a bad blocker would pair")
    ).toDF("doc_id", "text")
    val cands = Seq((1L, 2L, 15), (3L, 4L, 1))
      .toDF("id1", "id2", "est_matches")
    val out = Dedup.editVerifiedPairs(cands, docs, "doc_id", "text")
      .orderBy("id1").collect()
    val near = out(0)
    assert(near.getAs[Long]("edit_dist") == 3L) // dog → cat
    assert(near.getAs[Boolean]("verified"))
    assert(near.getAs[Long]("edit_sim_ppm") > 900000L)
    val far = out(1)
    assert(!far.getAs[Boolean]("verified")) // the blocker's false positive dies
    assert(far.getAs[Long]("edit_sim_ppm") < 600000L)
    // prefix cap bounds the DP: divergence beyond the window is invisible
    val longDocs = Seq(
      (1L, "same prefix " * 30 + "tail A"),
      (2L, "same prefix " * 30 + "completely different ending")
    ).toDF("doc_id", "text")
    val capped = Dedup.editVerifiedPairs(
      Seq((1L, 2L, 16)).toDF("id1", "id2", "est_matches"),
      longDocs, "doc_id", "text", prefix = 100).collect().head
    assert(capped.getAs[Long]("edit_dist") == 0L &&
      capped.getAs[Boolean]("verified"))
  }

  test("sourceOverlap: mirrored feeds outrank disjoint ones; sizes and jaccard exact") {
    val df = Seq(
      ("a", "the quick brown fox jumps over the lazy dog"),
      ("b", "the quick brown fox jumps over the lazy dog"), // mirror of a
      ("b", "completely different words appear in this sentence"),
      ("c", "completely different words appear in this sentence"),
      ("d", "nothing here matches any other feed at all ever")
    ).toDF("source", "text")
    val out = Dedup.sourceOverlap(
      df.withColumn("rid", monotonically_increasing_id()),
      "source", "rid", "text", 3)
      .orderBy("source_1", "source_2").collect()
      .map(r => (r.getAs[String]("source_1"), r.getAs[String]("source_2"),
        r.getAs[Long]("shared_grams"), r.getAs[Long]("sz1"),
        r.getAs[Long]("sz2"), r.getAs[Long]("jaccard_ppm"))).toSeq
    // a: 7 grams; b: 7 + 5 = 12; c: 5; d: 7. Pairs sharing nothing
    // (anything × d, a × c) never materialize — inverted-index shape.
    assert(out == Seq(
      ("a", "b", 7L, 7L, 12L, 7L * 1000000L / 12L),
      ("b", "c", 5L, 12L, 5L, 5L * 1000000L / 12L)))
    // the full-mirror pair dominates the partial one
    assert(out.head._6 > out(1)._6)
  }
}
