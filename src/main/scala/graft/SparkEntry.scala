package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.domain.InvoiceRecord
import graft.operators.Merge
import graft.queries.{CoreQueries, InvoiceView, PipelineQueries, Tables}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001: the reference's core
    * insert-only consolidation merge (J1) over the invoice-shaped view of
    * lineitem. Driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val existing = InvoiceView.clean(li).filter("ok % 3 = 0").drop("ok")
    val incoming = InvoiceView.clean(li).filter("ok % 2 = 0").drop("ok")
    Merge.insertOnly(existing, incoming, InvoiceRecord.pk).result
  }

  private def allQueries = CoreQueries.all ++ PipelineQueries.all

  /** One entry per implemented operator from SURVEY.md §2 plus the
    * training-data pipeline layer (dedup / similarity / text analysis).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
