package graft.tools

import org.apache.spark.sql.SparkSession

/** Replays the driver's t1 smoke check: SparkEntry.entry on sf0.001 must
  * return rows > 0. Prints the row count and the first rows.
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    println(s"[entry-smoke] rows=${df.count()}")
    df.show(5, truncate = false)
    spark.stop()
  }
}
