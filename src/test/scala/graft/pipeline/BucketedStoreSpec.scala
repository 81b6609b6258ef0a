package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketing must actually remove the store-side shuffle: a PK-keyed
  * aggregation over the bucketed table plans WITHOUT a ShuffleExchange,
  * while the same aggregation over a plain parquet copy requires one.
  */
class BucketedStoreSpec extends SparkSpec {
  import spark.implicits._

  private val pk = Seq("invoice_number", "reference_number")

  test("PK aggregation over a bucketed store plans shuffle-free") {
    spark.sql("DROP TABLE IF EXISTS consolidado_bucketed")
    val loc = java.nio.file.Paths.get(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
      "consolidado_bucketed")
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
    val df = (1 to 1000)
      .map(i => (s"F${i % 100}", s"R${i % 7}", BigDecimal(i), i % 3))
      .toDF("invoice_number", "reference_number", "total_amount", "carrier_hash")

    BucketedStore.write(df, "consolidado_bucketed", pk, buckets = 4)
    val bucketed = BucketedStore.read(spark, "consolidado_bucketed")
      .groupBy(pk.map(col): _*).agg(sum("total_amount").as("t"))
    assert(BucketedStore.hasNoShuffle(bucketed),
      bucketed.queryExecution.executedPlan.toString)

    // negative control: a layout NOT clustered on the PK must shuffle
    // (tiny parquet copies coalesce to one scan partition and trivially
    // avoid the exchange, so force a multi-partition non-PK layout)
    val plain = df.repartition(4, col("carrier_hash"))
      .groupBy(pk.map(col): _*).agg(sum("total_amount").as("t"))
    assert(!BucketedStore.hasNoShuffle(plain),
      plain.queryExecution.sparkPlan.toString)

    // results are identical either way
    val a = bucketed.orderBy(pk.map(col): _*).collect().map(_.toString)
    val b = plain.orderBy(pk.map(col): _*).collect().map(_.toString)
    assert(a.toSeq == b.toSeq)
    spark.sql("DROP TABLE IF EXISTS consolidado_bucketed")
  }
}
