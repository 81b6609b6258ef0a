package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

object D2Profile {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[d2] $label: ${(System.nanoTime()-t0)/1e9}%.1fs"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    time("shingles+explode count")(
      println(docs.select(col("doc_id"), explode(Dedup.shingles(col("text"), 3)).as("s")).count()))
    time("shingles+explode count again")(
      println(docs.select(col("doc_id"), explode(Dedup.shingles(col("text"), 3)).as("s")).count()))
    time("full jaccardPairs")(
      println(Dedup.jaccardPairs(docs, "doc_id", "text", 3, Seq("lang", "source")).count()))
    spark.stop()
  }
}
