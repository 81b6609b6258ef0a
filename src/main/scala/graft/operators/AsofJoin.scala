package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — attach to every left row the single right row with the
  * greatest `rightTime <= leftTime` within the same keys (nulls when no
  * prior right row exists). The canonical time-series enrichment
  * operator (trade→latest-quote, purchase→latest-view) that Spark has
  * no built-in for.
  *
  * Implementation is the union + last-observation-carried-forward
  * pattern: tag both sides, sort within each key by (time, side) with
  * the right side first on ties (ties are matches — "at or before"),
  * and carry the last non-null right attributes forward with a running
  * window; keep only left rows. ONE shuffle on the key, no range-join
  * row explosion — the plan scales with |left| + |right|, not with
  * |left| × |right candidates| like a naive inequality join.
  *
  * The right side must be unique per (keys, rightTime) — pre-aggregate
  * if it isn't ([[dedupeRight]]) — or "the greatest time" is ambiguous
  * and engines may disagree.
  */
object AsofJoin {

  /** One right row per (keys, timeCol): keeps the row with the max
    * `tieBreak` value (deterministic disambiguation).
    */
  def dedupeRight(right: DataFrame, keys: Seq[String], timeCol: String,
      tieBreak: String): DataFrame = {
    val w = Window.partitionBy((keys :+ timeCol).map(col): _*)
      .orderBy(col(tieBreak).desc)
    right.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** `left` columns plus `asof_<c>` for each requested right column.
    * `right` must be unique per (keys, rightTime).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // common event-time axis + side tag; right rows sort FIRST on ties so
    // an equal-time right row is visible to the left row (<= semantics)
    val taggedRight = right.select(
      (keys.map(col) :+ col(rightTime).as("__t") :+ lit(0).as("__side")) ++
        rightCols.map(c => col(c).as(s"asof_$c")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).as(s"__l_$c")): _*)
    val taggedLeft = left.select(
      (keys.map(col) :+ col(leftTime).as("__t") :+ lit(1).as("__side")) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"asof_$c")) ++
        leftCols.filterNot(keys.contains).map(c => col(c).as(s"__l_$c")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = taggedRight.unionByName(taggedLeft)
      .select(col("*") +: rightCols.map(c =>
        last(col(s"asof_$c"), ignoreNulls = true).over(w).as(s"__carried_$c")): _*)
    carried.filter(col("__side") === 1)
      .select(keys.map(col) ++
        leftCols.filterNot(keys.contains).map(c => col(s"__l_$c").as(c)) ++
        rightCols.map(c => col(s"__carried_$c").as(s"asof_$c")): _*)
  }
}
