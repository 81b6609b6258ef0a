package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hybrid BPE merge training (Sennrich et al. 2016) — the production
  * shape of t39's fully-distributed 3-round unroll.
  *
  * BPE's sufficient statistic is the WORD-FREQUENCY TABLE: after one
  * corpus pass, no merge round ever needs the corpus again — each round
  * is a pair census over the vocabulary's symbol sequences, an arg-max,
  * and a greedy left-to-right merge application, all functions of
  * `(word, freq)` alone. So the scalable plan is one distributed scan +
  * a LOCAL fold over that table: round cost is vocabulary-bounded and
  * independent of corpus size, and 32k merges are 32k in-memory
  * iterations, not 32k Spark jobs (t39's shape, correct but linear in
  * merge count as sequential cluster rounds).
  *
  * Driver-state posture: the collected table is vocab-sized — ~10⁶–10⁷
  * rows for a real web corpus (the standard tokenizer-training working
  * set), NOT corpus-sized; this is the s5 trained-centroid stance of
  * bounded model state on the driver — and the pull is GUARDED, not
  * assumed: a `minFreq` floor cuts the junk-token tail before the
  * collect and a `maxVocab` fail-fast probe errors instead of OOMing
  * (see [[collectWordFreqs]]). If a corpus's vocabulary genuinely
  * exceeds driver memory even floored, fall back to the distributed
  * census round of t39
  * (`PipelineQueries.t39BpeMerges`) for the first merges — the two
  * paths compute identical sequences (same census, same total-order
  * tie-break, same greedy fold; t42's oracle replays every round).
  *
  * Determinism: the arg-max total order is (count desc, left asc, right
  * asc) on plain string order — engine-identical for the ASCII symbol
  * alphabet, and replayed per-round by the DuckDB oracle's unrolled
  * recursive-CTE fold.
  */
object BpeTrainer {

  /** The one corpus-scale pass: whitespace-token word frequencies. */
  def wordFreqs(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))

  /** Driver-side vocabulary bound for the word-frequency collect — 10⁷
    * rows (the upper end of the standard tokenizer-training working set;
    * ~30 bytes/row → a few hundred MB on the driver).
    */
  val DefaultMaxVocab: Int = 10000000

  /** The ONE driver pull in this module, bounded two ways: `minFreq`
    * floors the table before the collect (standard BPE practice — on a
    * web corpus the vocabulary tail is typos/URLs/junk whose singleton
    * counts never win a merge census at depth, and dropping them is the
    * normal tokenizer-training cut), and `maxVocab` is a fail-fast
    * cardinality probe in the `XlsxEgress.boundedCollect` shape: a
    * `limit(maxVocab+1)` collect that errors with guidance instead of
    * OOMing the driver on an unexpectedly wild vocabulary. `minFreq = 1`
    * collects the exact table (today's oracle rows, unchanged).
    */
  private def collectWordFreqs(docs: DataFrame, textCol: String,
      minFreq: Long, maxVocab: Int): Seq[(String, Long)] = {
    require(minFreq >= 1, s"minFreq must be >= 1, got $minFreq")
    require(maxVocab > 0, s"maxVocab must be positive, got $maxVocab")
    val wf = wordFreqs(docs, textCol).filter(col("freq") >= minFreq)
    val rows = wf.limit(maxVocab + 1).collect()
    require(rows.length <= maxVocab,
      s"word-frequency table exceeds maxVocab=$maxVocab distinct words at " +
        s"minFreq=$minFreq — raise minFreq (a web corpus's vocabulary tail " +
        "is junk tokens that never win a merge) or, if the driver can hold " +
        "it, raise maxVocab")
    rows.map(r => (r.getString(0), r.getLong(1))).toSeq
  }

  /** The local fold: `n` merge rounds over a word-frequency table.
    * Returns (round, left_sym, right_sym, pair_count) per round.
    * Fails loudly if the pair census runs dry before round `n` — the
    * caller picked an `n` the vocabulary cannot support.
    */
  def trainFromWordFreqs(words: Seq[(String, Long)], n: Int)
      : Seq[(Int, String, String, Long)] =
    trainWithState(words, n)._1

  /** [[trainFromWordFreqs]] plus the post-training symbol state — each
    * word's final segmentation, which IS the BPE encode table: applying
    * the learned merges to a known word replays exactly the training
    * fold, so the table is a free by-product. Vocab-sized, like the
    * input.
    */
  def trainWithState(words: Seq[(String, Long)], n: Int)
      : (Seq[(Int, String, String, Long)], Seq[(String, List[String])]) = {
    require(n > 0, s"merge count must be positive, got $n")
    var syms: Array[(String, Long, List[String])] =
      words.map { case (w, f) => (w, f, w.map(_.toString).toList) }.toArray
    val out = Seq.newBuilder[(Int, String, String, Long)]
    for (r <- 1 to n) {
      val census = scala.collection.mutable.HashMap.empty[(String, String), Long]
      syms.foreach { case (_, f, ss) =>
        ss.lazyZip(ss.drop(1)).foreach { (a, b) =>
          census.updateWith((a, b))(c => Some(c.getOrElse(0L) + f))
        }
      }
      require(census.nonEmpty,
        s"pair census ran dry at round $r of $n — vocabulary too small")
      val ((a, b), cnt) = census.minBy { case ((x, y), c) => (-c, x, y) }
      out += ((r, a, b, cnt))
      syms = syms.map { case (w, f, ss) =>
        val acc = scala.collection.mutable.ListBuffer.empty[String]
        ss.foreach { x =>
          if (acc.nonEmpty && acc.last == a && x == b)
            acc(acc.length - 1) = a + b
          else acc += x
        }
        (w, f, acc.toList)
      }
    }
    (out.result(), syms.map { case (w, _, ss) => (w, ss) }.toSeq)
  }

  /** End-to-end: one distributed pass, vocab-bounded collect, local
    * fold, result as a DataFrame (round, left_sym, right_sym,
    * pair_count) ordered by round.
    */
  def train(spark: SparkSession, docs: DataFrame, n: Int,
      textCol: String = "text", minFreq: Long = 1L,
      maxVocab: Int = DefaultMaxVocab): DataFrame = {
    import spark.implicits._
    trainFromWordFreqs(collectWordFreqs(docs, textCol, minFreq, maxVocab), n)
      .toDF("round", "left_sym", "right_sym", "pair_count")
      .orderBy(col("round"))
  }

  /** CORPUS ENCODING under a trained tokenizer — the apply step. The
    * scalable shape mirrors training: because BPE segmentation is a
    * pure function of the WORD, the encode table is vocab-sized
    * (word → n_units from the post-training state), and encoding 100 TB
    * is ONE broadcast(-able) equi-join of the token stream against it —
    * no per-row merge loop ever touches the corpus. Returns the token
    * stream with `n_units` (BPE symbols) and `n_chars` per token
    * occurrence, for downstream compression/fertility accounting.
    * With `minFreq > 1` the encode table (and so the output) covers
    * only at-or-above-floor words — the floored tokenizer's own
    * vocabulary.
    */
  def encode(spark: SparkSession, docs: DataFrame, n: Int,
      textCol: String = "text", carryCols: Seq[String] = Seq.empty,
      minFreq: Long = 1L, maxVocab: Int = DefaultMaxVocab)
      : DataFrame = {
    import spark.implicits._
    val words = collectWordFreqs(docs, textCol, minFreq, maxVocab)
    val table = trainWithState(words, n)._2
      .map { case (w, ss) => (w, ss.length.toLong, w.length.toLong) }
      .toDF("w", "n_units", "n_chars")
    docs
      .select(carryCols.map(col) :+
        explode(TextAnalysis.tokens(col(textCol))).as("w"): _*)
      .join(broadcast(table), Seq("w"))
  }
}
