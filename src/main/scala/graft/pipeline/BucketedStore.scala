package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed layout for the consolidated store — the co-location strategy
  * for PK-keyed operations at scale. A store bucketed (and sorted) by the
  * composite PK gives every PK-keyed aggregation / self-operation a scan
  * that is ALREADY hash-partitioned on the key: no Exchange before the
  * aggregate, and store-side shuffles disappear from merge-adjacent plans
  * (the incoming batch side stays a broadcast).
  *
  * At 100 TB this is the difference between re-shuffling the whole store
  * every run and shuffling only the day's increment.
  */
object BucketedStore {

  /** Write `df` as a bucketed+sorted managed table (parquet). Bucket
    * columns must be the PK the store is probed/aggregated on.
    */
  def write(df: DataFrame, table: String, bucketCols: Seq[String],
      buckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write
      .mode(mode)
      .format("parquet")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** True when the physical plan contains no shuffle exchange — the
    * assertion that bucketing actually removed the store-side shuffle.
    * Inspects the pre-adaptive plan (`sparkPlan`): AQE wraps the executed
    * plan and hides exchanges until runtime.
    */
  def hasNoShuffle(df: DataFrame): Boolean = {
    val plan = df.queryExecution.sparkPlan
    !plan.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.exchange.ShuffleExchangeExec])
  }
}
