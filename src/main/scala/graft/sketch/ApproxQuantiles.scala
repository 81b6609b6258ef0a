package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate per-group quantiles with BOUNDED state — the form t17's
  * exact `percentile` can't give: exact per-group quantile memory grows
  * with the distinct values in the group, which is fine for `lang` but
  * fatal when the grouping dimension is unbounded (domain, source URL)
  * over 100 TB. This sketch's per-group state is the occupied cells of
  * a fixed log-scaled histogram — at most `64 · 2^subBits` cells no
  * matter how many rows the group holds — and every step is a hash
  * aggregate or a window over those ≤1024 cells, so partial (map-side)
  * aggregation applies and no reducer ever sees more than the grid.
  *
  * The bin layout is DDSketch-style but integer-exact so ANY engine
  * reproduces it bit-for-bit (Spark's approx_percentile sketch is
  * engine-private and could never sit under a DuckDB oracle):
  * values below 2^subBits are their own bin (exact); a value v ≥
  * 2^subBits with e = floor(log2 v) lands in bin
  * `e·2^subBits + (v − 2^e) >> (e − subBits)` — octave e split into
  * 2^subBits equal sub-buckets. floor(log2 v) is computed as
  * `length(bin(v)) − 1`: pure integer/string ops, no floating-point
  * log whose last-ulp rounding could differ between engines. The
  * estimate returned is the bin midpoint `2^e + (sub + 0.5)·2^(e−S)`,
  * giving relative error ≤ 2^−(subBits+1) (3.1% at the default S=4).
  *
  * Quantile selection is nearest-rank with EXACT integer arithmetic:
  * rank = ceil(q·n) computed as `(n·num + den − 1) div den` from the
  * rational q = num/den — float q·n would flip at exact-divisor
  * boundaries between engines.
  */
object ApproxQuantiles {

  // functions.shiftleft/shiftrightunsigned only accept a LITERAL shift
  // amount; the SQL forms take expressions — call them by name
  private def shl(v: Column, bits: Column): Column =
    call_function("shiftleft", v, bits.cast("int"))
  private def shr(v: Column, bits: Column): Column =
    call_function("shiftrightunsigned", v, bits.cast("int"))

  /** Integer log-histogram bin id of a non-negative long column. */
  def logBin(v: Column, subBits: Int): Column = {
    val small = 1L << subBits
    val e = (length(bin(v)) - 1).cast("int")
    when(v < small, v).otherwise(
      e.cast("long") * small + shr(v - shl(lit(1L), e), e - subBits))
  }

  /** Midpoint value estimate (double) for a bin id from [[logBin]]. */
  def binEstimate(id: Column, subBits: Int): Column = {
    val small = 1L << subBits
    val e = floor(id / small).cast("int")
    when(id < small, id.cast("double")).otherwise(
      shl(lit(1L), e).cast("double") +
        ((id % small).cast("double") + lit(0.5d)) *
          shl(lit(1L), e - subBits).cast("double"))
  }

  /** Per-group approximate quantiles of `valueCol` (non-negative; nulls
    * and negatives dropped). `qs` are (qi, num, den) rational quantile
    * specs, e.g. (0,1,4),(1,2,4),(2,3,4) for quartiles. Returns
    * (groupCol, qi, q_est) ordered rows.
    *
    * Plan shape: one hash aggregate to the (group, bin) grid, a window
    * over the ≤ 64·2^subBits cells per group (bounded — skew-immune by
    * construction), a 3-row quantile-spec cross join, and a final min
    * aggregate. Nothing driver-side; everything partial-aggregatable.
    */
  def quantilesByGroup(df: DataFrame, groupCol: String, valueCol: String,
      qs: Seq[(Int, Int, Int)] = Seq((0, 1, 4), (1, 2, 4), (2, 3, 4)),
      subBits: Int = 4): DataFrame = {
    val hist = histogram(df, groupCol, valueCol, subBits)
    quantilesFromHistogram(hist, qs, subBits)
      .withColumnRenamed("g", groupCol)
  }

  /** The (group, bin, count) grid for `valueCol` — the MERGEABLE state
    * behind [[quantilesByGroup]]: two grids over disjoint row sets sum
    * cell-wise into the grid of their union, so incremental/streaming
    * accretion is a plain grouped sum (the KMV-merge property, for
    * quantiles). Nulls and negatives dropped.
    */
  def histogram(df: DataFrame, groupCol: String, valueCol: String,
      subBits: Int = 4): DataFrame =
    df.select(col(groupCol).as("g"), col(valueCol).cast("long").as("v"))
      .filter(col("v").isNotNull && col("v") >= 0)
      .select(col("g"), logBin(col("v"), subBits).as("id"))
      .groupBy(col("g"), col("id")).agg(count(lit(1)).as("c"))

  /** Quantile resolution from an accreted `(g, id, c)` grid — shared by
    * the one-shot [[quantilesByGroup]] and the streaming partial store.
    */
  def quantilesFromHistogram(hist: DataFrame, qs: Seq[(Int, Int, Int)],
      subBits: Int): DataFrame = {
    import hist.sparkSession.implicits._
    val cum = hist
      .withColumn("cum", sum("c").over(Window.partitionBy("g").orderBy("id")))
      .withColumn("n", sum("c").over(Window.partitionBy("g")))
    val spec = qs.toDF("qi", "num", "den")
    cum.crossJoin(broadcast(spec))
      .where(col("cum") >= expr("(n * num + den - 1) div den"))
      .groupBy(col("g"), col("qi")).agg(min(col("id")).as("id"))
      .select(col("g"), col("qi"),
        binEstimate(col("id"), subBits).as("q_est"))
  }

  /** Per-row PERCENTILE RANK within its group, from the same bounded
    * log-histogram — the cross-group score calibration step: a quality
    * score of 180 means nothing comparable between an `en` and a `zh`
    * corpus with different score distributions, but "83rd percentile of
    * its own group" does, so mixing/filtering thresholds transfer
    * across sources. `rank_ppm = 10⁶ · (#rows in a strictly lower bin)
    * div n` — the floor convention: ties within a bin share a rank, and
    * every value is integer-exact on any engine.
    *
    * Plan shape: one hash aggregate to the (group, bin) grid, windows
    * over the ≤ 64·2^subBits cells per group (bounded — skew-immune by
    * construction), then one BROADCAST join of the grid back to the
    * rows — per-row calibration with NO per-group window over the data
    * (a percent_rank window would pin each group on one reducer; this
    * is the skew-free form). Rows with null/negative values are
    * dropped, mirroring [[quantilesByGroup]].
    */
  def calibratedRankPpm(df: DataFrame, groupCol: String, valueCol: String,
      subBits: Int = 4): DataFrame = {
    val base = df.withColumn("__v", col(valueCol).cast("long"))
      .filter(col("__v").isNotNull && col("__v") >= 0)
      .withColumn("__id", logBin(col("__v"), subBits))
      .localCheckpoint(eager = false) // grid build + row join share the
      // scan — without this the (often expensive) value expression and
      // binning run twice, once per consumer
    val hist = base.groupBy(col(groupCol), col("__id"))
      .agg(count(lit(1)).as("c"))
    val cum = hist
      .withColumn("cum_below",
        sum("c").over(Window.partitionBy(groupCol).orderBy("__id")) - col("c"))
      .withColumn("n", sum("c").over(Window.partitionBy(groupCol)))
      .select(col(groupCol), col("__id"), col("cum_below"), col("n"))
    base.join(broadcast(cum), Seq(groupCol, "__id"))
      .withColumn("rank_ppm", expr("cum_below * 1000000L div n"))
      .drop("__v", "__id", "cum_below", "n")
  }

  /** DuckDB SQL emitting the identical bin id over a SQL expression —
    * kept beside [[logBin]] so the dialects can't drift. `>>`/`<<` are
    * DuckDB's shift operators; `length(bin(v)) - 1` is the same
    * integer floor(log2) both engines compute.
    */
  def logBinSql(v: String, subBits: Int): String = {
    val small = 1L << subBits
    s"""CASE WHEN ($v) < $small THEN ($v)
       |ELSE CAST(length(bin($v)) - 1 AS BIGINT) * $small
       |     + ((($v) - (CAST(1 AS BIGINT) << (length(bin($v)) - 1)))
       |        >> (length(bin($v)) - 1 - $subBits)) END""".stripMargin
  }

  /** DuckDB SQL for [[binEstimate]] over a bin-id SQL expression. */
  def binEstimateSql(id: String, subBits: Int): String = {
    val small = 1L << subBits
    s"""CASE WHEN ($id) < $small THEN CAST(($id) AS DOUBLE)
       |ELSE CAST(CAST(1 AS BIGINT) << CAST(($id) // $small AS INT) AS DOUBLE)
       |     + (CAST(($id) % $small AS DOUBLE) + 0.5)
       |       * CAST(CAST(1 AS BIGINT) << (CAST(($id) // $small AS INT) - $subBits) AS DOUBLE)
       |END""".stripMargin
  }
}
