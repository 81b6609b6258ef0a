package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Variant B of the jaccard shingle index: tokens via posexplode + window
  * lead (codegen'd) instead of the per-row HOF transform.
  */
object D2Variant {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    def variantB() = {
      val toks = docs.select(col("doc_id"), col("lang"), col("source"),
        posexplode(TextAnalysis.tokens(col("text"))).as(Seq("pos", "tok")))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val grams = toks
        .withColumn("t2", lead(col("tok"), 1).over(w))
        .withColumn("t3", lead(col("tok"), 2).over(w))
        .filter(col("t3").isNotNull)
        .select(col("doc_id"), col("lang"), col("source"),
          concat_ws(" ", col("tok"), col("t2"), col("t3")).as("s"))
        .distinct()
      grams
    }

    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      println("B rows: " + variantB().count())
      println(f"[d2b] explode+window run $i: ${(System.nanoTime()-t0)/1e9}%.1fs")
    }
    // full pair pipeline with variant B
    val t0 = System.nanoTime()
    val ex = variantB()
    val sizes = ex.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = ex.select(col("doc_id").as("id1"), col("lang"), col("source"), col("s"))
      .join(ex.select(col("doc_id").as("id2"), col("lang"), col("source"), col("s")),
        Seq("lang", "source", "s"))
      .filter(col("id1") < col("id2"))
      .groupBy("id1", "id2").agg(count(lit(1)).as("inter"))
    val out = inter
      .join(broadcast(sizes.select(col("doc_id").as("id1"), col("sz").as("sz1"))), "id1")
      .join(broadcast(sizes.select(col("doc_id").as("id2"), col("sz").as("sz2"))), "id2")
      .select(col("id1"), col("id2"),
        floor(col("inter").cast("long") * 1000000L /
          (col("sz1") + col("sz2") - col("inter"))).as("jaccard_ppm"))
    println("pairs: " + out.count())
    println(f"[d2b] full pipeline: ${(System.nanoTime()-t0)/1e9}%.1fs")
    spark.stop()
  }
}
