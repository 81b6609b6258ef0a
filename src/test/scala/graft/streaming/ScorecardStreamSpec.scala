package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The streamed per-source scorecard (mergeable partials accreted over
  * micro-batches) must equal the batch t27 scorecard on the same corpus
  * — including the distinct-content count, which is exact while each
  * source holds fewer than K distinct contents (the documented regime;
  * the test corpus is far below it and free of 40-bit hash collisions).
  */
class ScorecardStreamSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("streamed scorecard ≡ batch t27 across 3 micro-batches; replay idempotent") {
    val base = Files.createTempDirectory("graft-scorecard")
    try {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      docs.write.parquet(s"$base/table/documents.parquet")
      for (i <- 0 to 2) {
        docs.filter(col("doc_id") % 3 === i).coalesce(1)
          .write.parquet(s"$base/landing/p$i")
        Thread.sleep(5)
      }
      ScorecardStream.runScorecardStream(spark, s"$base/landing/*",
        docs.schema, s"$base/work")

      def snap = ScorecardStream
        .currentScorecard(spark, s"$base/work/partials")
        .select("source", "n_docs", "n_langs", "distinct_contents",
          "sum_quality", "pii_hits", "dup_ppm", "qual_mean_milli")
        .orderBy("source").collect().map(_.toString).toSeq
      val streamed = snap
      val batch = graft.queries.PipelineQueries.t27SourceScorecard
        .fn(spark, s"$base/table")
        .select("source", "n_docs", "n_langs", "distinct_contents",
          "sum_quality", "pii_hits", "dup_ppm", "qual_mean_milli")
        .orderBy("source").collect().map(_.toString).toSeq
      assert(streamed == batch,
        s"streamed:\n${streamed.take(3).mkString("\n")}\nbatch:\n${batch.take(3).mkString("\n")}")

      // crash-replay of the last batch id replaces its own partition
      val lastBatch = docs.filter(col("doc_id") % 3 === 2)
      ScorecardStream.scorecardSink(s"$base/work/partials")(lastBatch, 2L)
      assert(snap == streamed, "replayed batch must replace, not re-append")
    } finally {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(Files.walk(base))(
        _.iterator().asScala.toSeq).reverse.foreach(Files.delete)
    }
  }
}
