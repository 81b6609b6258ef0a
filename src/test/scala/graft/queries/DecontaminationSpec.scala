package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.similarity.Similarity

/** The s21 completeness contract: the exact asymmetric decontamination
  * scan must find EVERY pair the banded s15 detector finds (s15 ⊆ s21
  * row-for-row on the same corpus and splits) — blocking can only lose
  * pairs, the unblocked scan loses none. Plus the plan pin that makes
  * the asymmetric shape affordable: the small eval side broadcasts, the
  * corpus never shuffles into a pair space.
  */
class DecontaminationSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("s15 (banded) is a subset of s21 (exact) on the same corpus and splits") {
    val s15 = PipelineQueries.s15SemanticLeakage.fn(spark, dir)
      .select("id1", "id2", "split1", "split2", "dot_q")
      .localCheckpoint()
    val s21 = PipelineQueries.s21ExactLeakage.fn(spark, dir)
      .select("id1", "id2", "split1", "split2", "dot_q")
      .localCheckpoint()
    val n15 = s15.count()
    val n21 = s21.count()
    assert(n15 > 0L, "the planted corpus must produce banded detections")
    assert(n21 >= n15,
      s"exact scan found fewer pairs than its blocked subset: $n21 < $n15")
    val missed = s15.except(s21).collect()
    assert(missed.isEmpty,
      s"pairs the blocked detector found but the exact scan lost: " +
        missed.take(5).mkString(", "))
  }

  test("exactNearPairsAsym: eval side broadcasts; corpus side never shuffles") {
    val emb = Tables.load(spark, dir, "embeddings")
    val out = Similarity.exactNearPairsAsym(emb, emb, "vec_id",
      "embedding", 400000L)
    out.collect() // finalize the adaptive plan
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"the eval side must broadcast (no equi key exists):\n$plan")
    assert(!plan.contains("CartesianProduct"),
      "a non-broadcast cartesian would shuffle the corpus into the " +
        "pair space")
    // with eval = corpus, EVERY confirmed pair must appear in both
    // directions with the same exact integer dot
    val rows = out.select(col("eval_id"), col("corpus_id"), col("dot_q"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(rows.nonEmpty, "the corpus has above-threshold pairs")
    rows.keys.foreach { k =>
      assert(rows.contains((k._2, k._1)), s"missing mirror of $k")
      assert(rows(k) == rows((k._2, k._1)), s"asymmetric dot for $k")
    }
  }

  test("t56 quarantine set == the train-side endpoints of s21's pairs") {
    val s21 = PipelineQueries.s21ExactLeakage.fn(spark, dir)
      .localCheckpoint()
    val t56 = PipelineQueries.t56DecontaminatedSplit.fn(spark, dir)
      .localCheckpoint()
    val wantQuarantine = s21.collect().flatMap { r =>
      Seq(r.getLong(s21.columns.indexOf("id1")) ->
            r.getString(s21.columns.indexOf("split1")),
        r.getLong(s21.columns.indexOf("id2")) ->
            r.getString(s21.columns.indexOf("split2")))
    }.filter(_._2 == "train").map(_._1).toSet
    assert(wantQuarantine.nonEmpty,
      "planted corpus must leak at least one train doc")
    val got = t56.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2)))
    val gotQuarantine =
      got.filter(_._3 == "quarantine").map(_._1).toSet
    assert(gotQuarantine == wantQuarantine)
    // only train rows may move, and only to quarantine; eval/val rows
    // are the protected assets and keep their split verbatim
    got.foreach { case (id, split, fin) =>
      if (split == "train")
        assert(fin == "train" || fin == "quarantine", s"$id: $split->$fin")
      else assert(fin == split, s"protected row moved: $id: $split->$fin")
    }
  }

  test("s24 threshold curve: both counts monotone non-increasing; 0.4 tier == t56's quarantine size") {
    val rows = PipelineQueries.s24DecontamThresholds.fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == Seq(300000L, 400000L, 500000L, 600000L))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 >= b._2 && a._3 >= b._3,
        s"tightening the threshold must never add pairs: $a -> $b")
    }
    val q400 = rows.find(_._1 == 400000L).get._3
    val t56Quarantine = PipelineQueries.t56DecontaminatedSplit
      .fn(spark, dir).filter(col("final_split") === "quarantine").count()
    assert(q400 == t56Quarantine,
      s"s24@0.4 ($q400) must price exactly what t56 pulls ($t56Quarantine)")
  }
}
