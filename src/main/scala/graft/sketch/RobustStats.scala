package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust per-group distribution census: median, MAD (median absolute
  * deviation), and robust-z outlier counts — the outlier filter that
  * survives the data it is hunting. Mean/stddev gates move with the
  * contamination itself (one 10^9-char document drags the mean past the
  * cut); median/MAD have a 50% breakdown point, so a corrupt feed can't
  * hide its own spikes.
  *
  * All arithmetic is INTEGER-exact and engine-portable: medians are
  * computed in doubled units (`med2 = percentile(2x, 0.5)` — the
  * midpoint of two even integers is an integer, so the double holds an
  * exact long), deviations as `dev2 = |2x − med2|` (= 2|x − m|), and
  * the MAD again doubled (`mad4 = percentile(2·dev2, 0.5)` = 4·MAD).
  * The z>3 cut `|x−m| > 3·MAD` becomes the pure-integer
  * `2·dev2 > 3·mad4`, and `z_milli = 2000·dev2 div mad4`, so a DuckDB
  * oracle replays every value bit-for-bit — no float quantile drift.
  *
  * Scale: MAD is a nested median, so two quantile passes are
  * irreducible; the value frame is checkpointed once and each pass is
  * one hash aggregate over GROUP-bounded state (the t17 bounded-domain
  * stance — exact `percentile` memory is ∝ distinct values per group;
  * unbounded grouping dimensions should use [[ApproxQuantiles]]).
  * Group stats are one row per group, joined back via broadcast.
  */
object RobustStats {

  /** Per-group census: `(group, n_docs, med2, mad4, max_z_milli,
    * n_out_z3)` where `med2 = 2·median`, `mad4 = 4·MAD`,
    * `max_z_milli = max 1000·|x−m|/MAD` and `n_out_z3` counts rows with
    * `|x−m| > 3·MAD`. A constant group (MAD = 0) reports null
    * `max_z_milli` and 0 outliers (every row sits AT the median —
    * deviation-free by definition, not infinitely deviant).
    */
  def madCensus(df: DataFrame, groupCol: String, value: Column): DataFrame = {
    val v = df.select(col(groupCol), value.cast("long").as("x"))
      .localCheckpoint(eager = false) // both quantile passes + census share it
    val med = v.groupBy(col(groupCol))
      .agg(expr("CAST(percentile(2 * x, 0.5D) AS BIGINT)").as("med2"))
    val dev = v.join(broadcast(med), groupCol)
      .withColumn("dev2", abs(col("x") * 2 - col("med2")))
      .localCheckpoint(eager = false) // mad pass + census share it
    val mad = dev.groupBy(col(groupCol))
      .agg(expr("CAST(percentile(2 * dev2, 0.5D) AS BIGINT)").as("mad4"))
    dev.join(broadcast(mad), groupCol)
      .groupBy(col(groupCol), col("med2"), col("mad4"))
      .agg(
        count(lit(1)).as("n_docs"),
        max(when(col("mad4") > 0,
          expr("2000 * dev2 div mad4"))).as("max_z_milli"),
        sum(when(col("dev2") * 2 > col("mad4") * 3, 1L).otherwise(0L))
          .as("n_out_z3"))
      .select(col(groupCol), col("n_docs"), col("med2"), col("mad4"),
        col("max_z_milli"), col("n_out_z3"))
  }
}
