package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints the formatted physical plan of selected queries — the
  * plan-review loop: check PushedFilters, broadcast choices, and
  * WholeStageCodegen spans before trusting a query at scale.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val names = if (args.isEmpty) Seq("q3_top_revenue", "j1_insert_only_merge")
      else args.toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"===== $n =====")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
