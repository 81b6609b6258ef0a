package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The e8 gate proves the day-partitioned store ANSWERS identically to
  * the raw table; this proves the layout actually PRUNES — a date-range
  * scan reads only the matching `event_date=` directories, measured by
  * the scan's own numFiles metric after execution.
  */
class PartitionPruningSpec extends SparkSpec {

  // AQE wraps the plan; descend into the final adaptive plan
  private def findScan(p: org.apache.spark.sql.execution.SparkPlan)
      : Option[org.apache.spark.sql.execution.FileSourceScanExec] =
    p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        findScan(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        findScan(s.plan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Some(f)
      case other => other.children.iterator.flatMap(findScan).nextOption()
    }

  test("dimension-driven join prunes partitions at RUNTIME (dynamic partition pruning)") {
    val dir = Files.createTempDirectory("graft-dpp-spec")
    try {
      val ev = spark.range(0, 1000).select(
        (col("id") % 5).cast("string").as("event_type"),
        (lit(1704067200000000000L) + (col("id") % 10) * 86400000000000L +
          col("id") * 1000000L).as("ts"),
        (col("id") % 97).cast("double").as("value"))
      val path = s"$dir/events"
      ev.withColumn("event_date",
          expr("to_date(timestamp_micros(ts div 1000))"))
        .write.partitionBy("event_date").parquet(path)

      // the selective predicate lives ONLY on the dimension side — the
      // fact scan has no static partition filter; pruning must come
      // from the runtime subquery DPP injects off the broadcast side
      val dim = spark.range(0, 10).select(
        expr("date_add(to_date('2024-01-01'), CAST(id AS INT))")
          .as("event_date"),
        (col("id") === 2 || col("id") === 3).as("is_hot"))
      val store = spark.read.parquet(path)
      val q = store.join(dim.filter(col("is_hot")), Seq("event_date"))
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      val rows = q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = ev
        .filter(expr("to_date(timestamp_micros(ts div 1000))")
          .between("2024-01-03", "2024-01-04"))
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rows == want)

      val scan = findScan(q.queryExecution.executedPlan).get
      assert(scan.metadata("PartitionFilters").contains("dynamicpruning"),
        s"fact scan must carry a runtime pruning subquery: " +
          scan.metadata("PartitionFilters"))
      import scala.jdk.CollectionConverters._
      val totalFiles = Files.walk(java.nio.file.Paths.get(path))
        .iterator().asScala.count(_.toString.endsWith(".parquet"))
      val readFiles = scan.metrics("numFiles").value
      assert(readFiles < totalFiles,
        s"DPP scan must read fewer files: $readFiles vs $totalFiles")
    } finally {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(Files.walk(dir))(
        _.iterator().asScala.toSeq).reverse.foreach(Files.delete)
    }
  }

  test("date-range scan over a day-partitioned store reads only matching partitions") {
    val dir = Files.createTempDirectory("graft-daystore-spec")
    try {
      // 10 civil days of events, 100 per day, starting 2024-01-01 UTC
      val ev = spark.range(0, 1000).select(
        (col("id") % 5).cast("string").as("event_type"),
        (lit(1704067200000000000L) + (col("id") % 10) * 86400000000000L +
          col("id") * 1000000L).as("ts"),
        (col("id") % 97).cast("double").as("value"))
      val path = s"$dir/events"
      ev.withColumn("event_date",
          expr("to_date(timestamp_micros(ts div 1000))"))
        .write.partitionBy("event_date").parquet(path)

      val store = spark.read.parquet(path)
      val q = store
        .filter(col("event_date").between("2024-01-03", "2024-01-04"))
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      val rows = q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

      // identical answer from the raw frame
      val want = ev
        .filter(expr("to_date(timestamp_micros(ts div 1000))")
          .between("2024-01-03", "2024-01-04"))
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rows == want)

      // the scan carried a partition filter and read ONLY the 2 matching
      // day directories' files, not the store's 10
      // AQE wraps the plan; descend into the final adaptive plan
      def findScan(p: org.apache.spark.sql.execution.SparkPlan)
          : Option[org.apache.spark.sql.execution.FileSourceScanExec] =
        p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            findScan(a.executedPlan)
          case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            findScan(s.plan)
          case f: org.apache.spark.sql.execution.FileSourceScanExec => Some(f)
          case other => other.children.iterator.flatMap(findScan).nextOption()
        }
      val scan = findScan(q.queryExecution.executedPlan).get
      assert(scan.metadata("PartitionFilters").contains("event_date"),
        scan.metadata.toString)
      import scala.jdk.CollectionConverters._
      val totalFiles = Files.walk(java.nio.file.Paths.get(path))
        .iterator().asScala.count(_.toString.endsWith(".parquet"))
      val readFiles = scan.metrics("numFiles").value
      assert(readFiles < totalFiles,
        s"pruned scan must read fewer files: $readFiles vs $totalFiles")
    } finally {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(Files.walk(dir))(
        _.iterator().asScala.toSeq).reverse.foreach(Files.delete)
    }
  }
}
