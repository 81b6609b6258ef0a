package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Measurement harness for the boilerplate-census document-frequency
  * strategy: count WINDOW over the gram key (single exchange, but a
  * ubiquitous gram's whole posting list lands on ONE reducer and
  * windows cannot be AQE-skew-split) vs two-phase AGGREGATE + join
  * (extra exchange, bounded map-side partials, and the probe join is
  * skew-splittable). Run: tools/jrun.sh graft.tools.D12Variant [sfDir].
  */
object D12Variant {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.queries.Tables.load(spark, sfDir, "documents")
    val minDf = math.max(3L,
      graft.queries.Tables.rowCount(spark, sfDir, "documents") / 500L)

    // the shipped path (join form; see Dedup.boilerplateStats scaladoc)
    def joinForm(): DataFrame =
      Dedup.boilerplateStats(docs, "doc_id", "text", 3, minDf)

    // rejected alternative kept for re-measurement: count window over the
    // gram key — one less exchange, but un-splittable skew at scale
    def windowForm(): DataFrame = {
      val perDocGram = Dedup.positionalShingleRows(docs, "doc_id", "text", 3)
        .groupBy(col("doc_id"), col("s"))
        .agg(count(lit(1)).as("__pos_in_doc"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("s"))
      val per = perDocGram
        .withColumn("__df", count(lit(1)).over(w))
        .groupBy(col("doc_id"))
        .agg(sum(col("__pos_in_doc")).as("n_pos"),
          sum(when(col("__df") >= minDf, col("__pos_in_doc"))
            .otherwise(0L)).as("n_boiler"))
      docs.select(col("doc_id"))
        .join(per, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_pos"), lit(0L)).as("n_pos"),
          coalesce(col("n_boiler"), lit(0L)).as("n_boiler"))
        .withColumn("boiler_ppm",
          when(col("n_pos") > 0,
            expr("n_boiler * 1000000 div n_pos")).otherwise(0L))
    }

    def time(label: String, f: () => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[d12-variant] $label best=${ts.min}%.3f runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    // agreement first: identical results or the timing is meaningless
    val a = windowForm().orderBy("doc_id").collect()
    val b = joinForm().orderBy("doc_id").collect()
    require(a.sameElements(b), "window and join forms disagree")
    println(s"[d12-variant] agreement ok over ${a.length} docs")
    time("window", windowForm)
    time("join", joinForm)
    spark.stop()
  }
}
