package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.domain.InvoiceRecord

/** Aggregation / invariant operators — SURVEY.md §2.5 (A1, A2, A3, A5).
  *
  * Reconciliation runs BEFORE the sink commits (reference:
  * smartbots-etl/src/application/use_cases/consolidate_invoices.py:550-572):
  * (a) zero data loss — every source PK appears in the merge result;
  * (b) exact-decimal amount variance between source and the semi-joined
  * result subset must be <= 1. Sums are `DecimalType` — no float drift,
  * and Spark's partial (map-side) aggregation makes each a single
  * shuffle-light pass at scale.
  */
object Reconcile {

  final case class Report(
      missingPks: Long, sourcePks: Long,
      sourceTotal: java.math.BigDecimal, resultTotal: java.math.BigDecimal) {
    def dataLossPct: Double =
      if (sourcePks == 0) 0.0 else missingPks.toDouble / sourcePks * 100.0
    def variance: java.math.BigDecimal =
      sourceTotal.subtract(resultTotal).abs()
    def ok: Boolean =
      missingPks == 0 && variance.compareTo(java.math.BigDecimal.ONE) <= 0
  }

  final case class ReconciliationException(report: Report)
    extends RuntimeException(
      s"Reconciliación fallida: data_loss=${report.dataLossPct}% " +
        s"variance=${report.variance}")

  /** A1 — exact decimal sum of an amount column. */
  def decimalTotal(df: DataFrame, amount: String): java.math.BigDecimal = {
    val row = df.agg(
      sum(col(amount).cast(InvoiceRecord.money)).as("t")).head()
    if (row.isNullAt(0)) java.math.BigDecimal.ZERO
    else row.getDecimal(0)
  }

  /** A2 — reconciliation check in TWO Spark jobs (source stats; one outer
    * join covering both the missing-PK count and the matched-result
    * total — A2 sits on the critical path before every sink commit, so
    * jobs matter at scale). Throws [[ReconciliationException]] when the
    * invariant fails, mirroring `ReconciliationError`
    * (src/domain/exceptions.py:33-42).
    */
  def check(source: DataFrame, result: DataFrame, pk: Seq[String],
      amount: String): Report = {
    val srcStats = source.agg(
      count_distinct(struct(pk.map(col): _*)).as("pks"),
      sum(col(amount).cast(InvoiceRecord.money)).as("total")).head()
    // one left-outer join from the distinct source keys: an unmatched key
    // yields exactly one null-marker row (→ missing count); a matched key
    // yields one row per matching result row (→ the semi-join sum)
    val joined = source.select(pk.map(col): _*).distinct()
      .join(result.select(pk.map(col) :+
            col(amount).cast(InvoiceRecord.money).as("__amt"): _*)
          .withColumn("__present", lit(1)),
        pk, "left_outer")
      .agg(
        count(when(col("__present").isNull, lit(1))).as("missing"),
        sum(col("__amt")).as("result_total")).head()
    val report = Report(
      missingPks = joined.getLong(0),
      sourcePks = srcStats.getLong(0),
      sourceTotal =
        if (srcStats.isNullAt(1)) java.math.BigDecimal.ZERO
        else srcStats.getDecimal(1),
      resultTotal =
        if (joined.isNullAt(1)) java.math.BigDecimal.ZERO
        else joined.getDecimal(1))
    if (!report.ok) throw ReconciliationException(report)
    report
  }

  /** A3 — merge action counters: inserted / updated / unchanged
    * (dtos.py:10-18).
    */
  def actionCounters(result: DataFrame): DataFrame =
    result.groupBy(col("status")).agg(count(lit(1)).as("n"))

  /** A5 — run-status roll-up over per-file outcomes
    * (consolidate_invoices.py:92-100,140-145).
    */
  def rollUp(totalFiles: Long, failedFiles: Long): String =
    if (totalFiles == 0) "NO_FILES"
    else if (failedFiles == 0) "SUCCESS"
    else if (failedFiles < totalFiles) "PARTIAL"
    else "ERROR"
}
