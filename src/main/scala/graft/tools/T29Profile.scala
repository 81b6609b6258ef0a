package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of t29_source_overlap — which leg carries the
  * 4 s: the shingle scan, the (source, gram) distinct, or the
  * gram-keyed self-join?
  */
object T29Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[t29-prof] $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm code paths
    docs.count()

    val raw = docs.select(col("source"),
      explode(graft.dedup.Dedup.shingles(col("text"), 3)).as("s"))
    time("explode only (count)")(raw.write.format("noop").mode("overwrite").save())
    val vocab = raw.distinct()
    time("explode+distinct")(vocab.write.format("noop").mode("overwrite").save())
    val v2 = vocab.localCheckpoint(eager = false)
    time("checkpoint materialize")(v2.write.format("noop").mode("overwrite").save())
    val inter = v2.select(col("source").as("s1"), col("s"))
      .join(v2.select(col("source").as("s2"), col("s")), "s")
      .filter(col("s1") < col("s2"))
      .groupBy(col("s1"), col("s2")).agg(count(lit(1)).as("c"))
    time("self-join+agg (from checkpoint)")(
      inter.write.format("noop").mode("overwrite").save())
    time("full query")(graft.SparkEntry.queries("t29_source_overlap")(
      spark, sfDir).write.format("noop").mode("overwrite").save())
    time("full query again")(graft.SparkEntry.queries("t29_source_overlap")(
      spark, sfDir).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
