package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prints the physical plan of the banding frame itself — the r16
  * evidence artifact for the fused [[graft.functions.BandSignBuckets]]
  * expression. The frame is normally hidden behind the similarity
  * layer's localCheckpoint (query plans show only `Scan ExistingRDD`),
  * so the ordinary PlanDump cannot show which expression computes the
  * buckets.
  */
object BandingPlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val qdf = emb.select(col("vec_id").as("id"),
      graft.similarity.Similarity.quantize(col("embedding")).as("qv"))
    println("===== bandedSignBucketsQ (bands=24) =====")
    graft.similarity.Similarity
      .bandedSignBucketsQ(qdf, "id", "qv", bands = 24, bitsPerBand = 9)
      .explain("formatted")
    spark.stop()
  }
}
