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
    *
    * The carry is ONE struct of all right columns, not per-column LOCF:
    * independent per-column `last(..., ignoreNulls)` would resurrect a
    * stale value whenever the latest right row holds a null attribute —
    * producing a hybrid of two right rows that never existed. A struct
    * of nullable fields is itself non-null for every right row, so the
    * whole LATEST row carries, nulls included.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val rType = org.apache.spark.sql.types.StructType(
      rightCols.map(c => right.schema(c)))
    // common event-time axis + side tag; right rows sort FIRST on ties so
    // an equal-time right row is visible to the left row (<= semantics)
    val taggedRight = right.select(
      (keys.map(col) :+ col(rightTime).as("__t") :+ lit(0).as("__side") :+
        struct(rightCols.map(col): _*).as("__r")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).as(s"__l_$c")): _*)
    val taggedLeft = left.select(
      (keys.map(col) :+ col(leftTime).as("__t") :+ lit(1).as("__side") :+
        lit(null).cast(rType).as("__r")) ++
        leftCols.filterNot(keys.contains).map(c => col(c).as(s"__l_$c")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = taggedRight.unionByName(taggedLeft)
      .withColumn("__carried", last(col("__r"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select(keys.map(col) ++
        leftCols.filterNot(keys.contains).map(c => col(s"__l_$c").as(c)) ++
        rightCols.map(c => col("__carried").getField(c).as(s"asof_$c")): _*)
  }

  /** [[asofJoin]] for SKEWED keys: identical semantics, but the row-level
    * LOCF partitions on (keys, time bucket) instead of keys alone, so one
    * pathologically hot key (a single user with a billion events) spreads
    * over `#buckets` tasks instead of serializing into one.
    *
    * Shape: times bucket by `bucketWidth` (same unit as the time columns);
    * within each (keys, bucket) partition the union-LOCF runs as in
    * [[asofJoin]], seeded with a CARRY-IN row — the last right row from
    * any earlier bucket. Carry-ins come from a bucket-LEVEL window over
    * one summary row per (keys, bucket): that window still serializes per
    * key, but over O(time-range / bucketWidth) rows, not O(events).
    *
    * Same contract as [[asofJoin]]: right unique per (keys, rightTime);
    * both time columns must be non-negative integral (epochs).
    */
  def asofJoinSalted(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, rightCols: Seq[String],
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val leftCols = left.columns.toSeq
    def bucketOf(t: org.apache.spark.sql.Column) =
      (t - pmod(t, lit(bucketWidth))).divide(lit(bucketWidth)).cast("long")

    // whole-row struct carry, same reason as [[asofJoin]]: per-column
    // LOCF would blend attributes of different right rows on nulls
    val rType = org.apache.spark.sql.types.StructType(
      rightCols.map(c => right.schema(c)))

    // last right row per (keys, bucket) — shuffles on the SALTED key
    val rightB = right.withColumn("__bucket", bucketOf(col(rightTime)))
    val wLast = Window.partitionBy((keys :+ "__bucket").map(col): _*)
      .orderBy(col(rightTime).desc)
    val lastPerBucket = rightB.withColumn("__rn", row_number().over(wLast))
      .filter(col("__rn") === 1)
      .select(keys.map(col) :+ col("__bucket") :+
        struct(rightCols.map(col): _*).as("__last"): _*)

    // bucket-level carry: for every bucket present on either side, the
    // last right row of any STRICTLY EARLIER bucket (window over one row
    // per bucket — tiny even for the hottest key)
    val allBuckets = left
      .select(keys.map(col) :+ bucketOf(col(leftTime)).as("__bucket"): _*)
      .distinct()
      .unionByName(lastPerBucket.select((keys :+ "__bucket").map(col): _*))
      .distinct()
    val wCarry = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carryIn = allBuckets
      .join(lastPerBucket, keys :+ "__bucket", "left")
      .select((keys.map(col) :+ col("__bucket")) :+
        last(col("__last"), ignoreNulls = true).over(wCarry).as("__r"): _*)

    // per-bucket union-LOCF: carry-in sorts before every real row in the
    // bucket (bucket start - 1 is outside the bucket's time range)
    val taggedCarry = carryIn.select(
      (keys.map(col) :+ col("__bucket") :+
        (col("__bucket") * bucketWidth - 1).as("__t") :+ lit(0).as("__side") :+
        col("__r")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).as(s"__l_$c")): _*)
    val taggedRight = rightB.select(
      (keys.map(col) :+ col("__bucket") :+ col(rightTime).as("__t") :+
        lit(0).as("__side") :+ struct(rightCols.map(col): _*).as("__r")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).as(s"__l_$c")): _*)
    val taggedLeft = left.select(
      (keys.map(col) :+ bucketOf(col(leftTime)).as("__bucket") :+
        col(leftTime).as("__t") :+ lit(1).as("__side") :+
        lit(null).cast(rType).as("__r")) ++
        leftCols.filterNot(keys.contains).map(c => col(c).as(s"__l_$c")): _*)
    val w = Window.partitionBy((keys :+ "__bucket").map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = taggedCarry.unionByName(taggedRight).unionByName(taggedLeft)
      .withColumn("__carried", last(col("__r"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select(keys.map(col) ++
        leftCols.filterNot(keys.contains).map(c => col(s"__l_$c").as(c)) ++
        rightCols.map(c => col("__carried").getField(c).as(s"asof_$c")): _*)
  }
}
