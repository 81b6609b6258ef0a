package graft.sketch

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted Count-Min frequency store — the t14 CMS grid accreted the
  * [[HllStore]]/[[KmvStore]] way, and the member of the store taxonomy
  * whose merge algebra is NOT idempotent: CMS grids add cell-wise
  * (Cormode–Muthukrishnan), so a replayed batch would double-count
  * where a replayed register batch (max) or minima batch (distinct
  * union) changes nothing. The store restores idempotence with the
  * batch axis itself:
  *
  *  - every append is TAGGED with a caller batch id, and a batch's
  *    grid is a pure function of its rows — an at-least-once
  *    redelivery writes bit-identical (group, r, bucket, cnt,
  *    batch_id) rows that the read-side DISTINCT absorbs for free.
  *    (tag + distinct-union + sum) IS idempotent and commutative even
  *    though bare sum is not, so ingest still needs no read-modify-
  *    write and no side ledger.
  *  - COMPACTION is the one place the batch axis dies. The folded
  *    grid carries the ids it absorbed in its own tag
  *    (`F:id1,id2,...`), so grid and ledger are one atomic unit under
  *    the shared [[StoreDirOps]] dir swap: a late replay of a folded
  *    batch is recognized and dropped at read, and a crash that
  *    leaves BOTH the old and new folded grids behind is resolved by
  *    keeping only MAXIMAL tags (the new tag's id set strictly covers
  *    the old one's — the subsumed grid is dropped, never re-summed).
  *
  * Layout (self-describing, the `_meta` sidecar stance):
  * {{{
  *   path/cells/...  (group..., r, bucket, cnt, batch_id) — APPEND-ONLY
  *                   per-batch grid log; merging happens at read
  *   path/_meta/...  one row: (group_cols ARRAY, value_col, depth,
  *                   width) — appends MUST hash with the parameters
  *                   the store was born with
  * }}}
  *
  * The sum algebra buys one caveat the max/min-k stores do not have:
  * a TORN append (some part files landed) of a batch the compactor
  * folds is indistinguishable from a replay — its straggler files are
  * dropped at read. Compact with appends quiesced (the straggler
  * rescue still preserves every batch the fold did NOT cover); after
  * a repair, re-appending the in-flight batch is always safe.
  *
  * Scale posture: writes ship ≤ |groups|·depth·width cells per batch
  * regardless of batch row count (map-side combine does the heavy
  * count); reads fold bounded grids; [[estimate]] broadcasts the
  * merged grid under the probe join. The one driver pull is the
  * distinct batch-TAG list — ingest-count-scale metadata that
  * compaction keeps trimmed, never data.
  */
object CmsStore {

  final case class Meta(groupCols: Seq[String], valueCol: String,
      depth: Int, width: Int)

  private val FoldedPrefix = "F:"

  private def requireValidBatchId(batchId: String): Unit =
    require(batchId.nonEmpty && !batchId.contains(",")
        && !batchId.startsWith(FoldedPrefix),
      s"batch id must be non-empty, comma-free, and not start with " +
        s"'$FoldedPrefix': '$batchId'")

  /** This batch's tagged grid: one row per non-empty cell. The grid is
    * a pure function of (batch rows, params, batchId) — the property
    * the read-side distinct leans on to absorb redelivery.
    */
  private def gridOf(df: DataFrame, groupCols: Seq[String],
      valueCol: String, depth: Int, width: Int,
      batchId: String): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+ posexplode(array(
        (0 until depth).map(r => Sketch.cmsBucket(col(valueCol), r, width)): _*))
        .as(Seq("r", "bucket")): _*)
      .groupBy(groupCols.map(col) :+ col("r") :+ col("bucket"): _*)
      .agg(count(lit(1)).as("cnt"))
      .withColumn("batch_id", lit(batchId))

  /** Bootstrap write: grid the first batch and create the store. */
  def write(df: DataFrame, groupCols: Seq[String], valueCol: String,
      depth: Int, width: Int, batchId: String, path: String): Unit = {
    requireValidBatchId(batchId)
    val spark = df.sparkSession
    gridOf(df, groupCols, valueCol, depth, width, batchId)
      .write.mode("overwrite").parquet(s"$path/cells")
    import spark.implicits._
    Seq((groupCols, valueCol, depth, width))
      .toDF("group_cols", "value_col", "depth", "width").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_meta")
  }

  /** The parameters the store was born with (one row — bounded pull). */
  def readMeta(spark: SparkSession, path: String): Meta = {
    val r = spark.read.parquet(s"$path/_meta").head()
    Meta(r.getSeq[String](r.fieldIndex("group_cols")).toIndexedSeq,
      r.getAs[String]("value_col"), r.getAs[Int]("depth"),
      r.getAs[Int]("width"))
  }

  /** Incremental maintenance: grid ONLY the new batch with the store's
    * stored parameters and append it under its tag. Write-only —
    * redelivery of the same (batch, tag) is absorbed at read.
    */
  def append(df: DataFrame, batchId: String, path: String): Unit = {
    requireValidBatchId(batchId)
    val m = readMeta(df.sparkSession, path)
    gridOf(df, m.groupCols, m.valueCol, m.depth, m.width, batchId)
      .write.mode("append").parquet(s"$path/cells")
  }

  /** The log rows that count: maximal folded grids plus live batches
    * no folded tag covers, replay-duplicates removed. Tag resolution
    * is the bounded driver pull (distinct tags, column-pruned scan).
    */
  private def liveRows(spark: SparkSession, log: DataFrame): DataFrame = {
    val tags = log.select(col("batch_id")).distinct()
      .collect().map(_.getString(0))
    val folded = tags.filter(_.startsWith(FoldedPrefix))
      .map(t => t -> t.stripPrefix(FoldedPrefix).split(',').toSet)
    // a folded grid whose id set is strictly inside another's is a
    // crash leftover the bigger fold already absorbed — drop it
    val maximal = folded.filter { case (_, s) =>
      !folded.exists { case (_, o) => s != o && s.subsetOf(o) } }
    val covered = maximal.flatMap(_._2).toSet
    val keep = maximal.map(_._1) ++
      tags.filterNot(t => t.startsWith(FoldedPrefix) || covered(t))
    import spark.implicits._
    log.join(broadcast(keep.toSeq.toDF("batch_id")), Seq("batch_id"))
      .distinct()
  }

  /** The merged grid: fold every surviving batch grid cell-wise —
    * (group..., r, bucket, cnt). ≤ |groups|·depth·width rows
    * regardless of how many batches were ingested.
    */
  def grid(spark: SparkSession, path: String): DataFrame = {
    val m = readMeta(spark, path)
    liveRows(spark, spark.read.parquet(s"$path/cells"))
      .groupBy(m.groupCols.map(col) :+ col("r") :+ col("bucket"): _*)
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Per-group point estimates for `probes` (distinct values in the
    * store's value column): min over each probe's `depth` cells, per
    * group — always ≥ the true count. Inner join is sound for probes
    * drawn from the sketched data; groups where a probe never
    * occurred still answer with their collision mass (the CMS
    * contract). The grid side is bounded — broadcast.
    */
  def estimate(spark: SparkSession, path: String,
      probes: DataFrame): DataFrame = {
    val m = readMeta(spark, path)
    val cells = probes.select(col("*"), posexplode(array(
        (0 until m.depth).map(r =>
          Sketch.cmsBucket(col(m.valueCol), r, m.width)): _*))
        .as(Seq("r", "bucket")))
    val probeCols = probes.columns.map(col).toSeq
    cells.join(broadcast(grid(spark, path)), Seq("r", "bucket"))
      .groupBy(m.groupCols.map(col) ++ probeCols: _*)
      .agg(min(col("cnt")).as("cms_n"))
  }

  /** All ordered group-pair join-size estimates from ONE grouped store
    * — the AMS/Count-Min inner-product estimator
    * ([[Sketch.cmsJoinSize]]) answered from the accreted grid instead
    * of rescanning either side: for groups a < b,
    * `min_r Σ_b cntA(r,b)·cntB(r,b)`, an upper bound on the token-
    * multiset equi-join size |A ⋈ B|. The min runs over a full
    * depth-row SPINE per pair (a hash row whose grids share no bucket
    * proves the true join is EMPTY — its 0 must win the min), the
    * zero-certificate discipline a10 pinned. One bounded grid self-
    * join: ≤ |groups|·depth·width rows a side, broadcastable — the
    * optimizer-statistics read that makes the store a statistics
    * SERVICE, not just a frequency answerer.
    */
  def pairwiseJoinSizes(spark: SparkSession, path: String): DataFrame = {
    val m = readMeta(spark, path)
    require(m.groupCols.size == 1,
      s"pairwise join sizes need a single-group store, got ${m.groupCols}")
    val gcol = m.groupCols.head
    // one materialization: the merged grid feeds both self-join sides
    // AND the spine's group list — without it the plan re-scans the
    // store log once per use (bounded, but 4× the reads for nothing)
    val g = grid(spark, path).localCheckpoint(eager = false)
    val ga = g.select(col(gcol).as("__ga"), col("r"), col("bucket"),
      col("cnt").as("__cnt_a"))
    val gb = g.select(col(gcol).as("__gb"), col("r"), col("bucket"),
      col("cnt").as("__cnt_b"))
    val perRow = ga.join(broadcast(gb), Seq("r", "bucket"))
      .filter(col("__ga") < col("__gb"))
      .groupBy(col("__ga"), col("__gb"), col("r"))
      .agg(sum(col("__cnt_a") * col("__cnt_b")).as("__est"))
    val groups = g.select(col(gcol).as("__ga")).distinct()
    val spine = groups
      .crossJoin(broadcast(groups.select(col("__ga").as("__gb"))))
      .filter(col("__ga") < col("__gb"))
      .crossJoin(broadcast(spark.range(0, m.depth.toLong)
        .select(col("id").cast("int").as("r"))))
    spine.join(perRow, Seq("__ga", "__gb", "r"), "left")
      .groupBy(col("__ga"), col("__gb"))
      .agg(min(coalesce(col("__est"), lit(0L))).as("cms_join_n"))
      .select(col("__ga").as(s"${gcol}_a"), col("__gb").as(s"${gcol}_b"),
        col("cms_join_n"))
  }

  /** Fold the append log to ONE grid whose tag records every batch it
    * absorbed (the shared crash-safe aside-swap). Estimate-invisible;
    * single compactor per store, appends quiesced (see object doc —
    * the sum algebra's one caveat). Returns (rows before, rows after).
    */
  def compact(spark: SparkSession, path: String): (Long, Long) =
    compactImpl(spark, path, () => ())

  /** Test seam: `beforeSwap` runs between the snapshot merge and the
    * swap — the concurrent-append window.
    */
  private[sketch] def compactImpl(spark: SparkSession, path: String,
      beforeSwap: () => Unit): (Long, Long) = {
    val m = readMeta(spark, path)
    val logDir = s"$path/cells"
    val snapshot = spark.read.parquet(logDir).inputFiles
    val snapNames = snapshot.map(f => f.substring(f.lastIndexOf('/') + 1))
      .toSet
    val log = spark.read.parquet(snapshot.toIndexedSeq: _*)
    val before = log.count()
    val live = liveRows(spark, log)
    val ids = live.select(col("batch_id")).distinct()
      .collect().map(_.getString(0))
      .flatMap(t => if (t.startsWith(FoldedPrefix))
        t.stripPrefix(FoldedPrefix).split(',').toSeq else Seq(t))
      .distinct.sorted
    val merged = live
      .groupBy(m.groupCols.map(col) :+ col("r") :+ col("bucket"): _*)
      .agg(sum(col("cnt")).as("cnt"))
      .withColumn("batch_id", lit(FoldedPrefix + ids.mkString(",")))
      .localCheckpoint(eager = true) // fully read before the swap
    val after = merged.count()
    beforeSwap()
    merged.write.mode("overwrite")
      .parquet(StoreDirOps.compactTmp(logDir))
    StoreDirOps.swapAndRescue(logDir, snapNames)
    (before, after)
  }

  /** Crash recovery for a compact that died mid-swap (see
    * [[StoreDirOps.repair]]). Files the recovery re-adds are either
    * replay-duplicates (distinct absorbs) or a subsumed folded grid
    * (the maximal-tag rule drops it) — never re-summed. Idempotent;
    * no-op on a healthy store. Returns files restored from the aside.
    */
  def repair(spark: SparkSession, path: String): Long =
    StoreDirOps.repair(s"$path/cells")
}
