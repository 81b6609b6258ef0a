package graft.pipeline

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Consolidated-store maintenance: the insert-only pipeline appends a
  * few part files per run, so a store that lives for years accumulates
  * thousands of tiny files — the classic small-files problem that
  * dominates scan setup cost at scale. Compaction rewrites the store
  * into size-targeted files.
  *
  * Safety: the rewrite goes to a sibling temp directory first (never
  * overwrite-while-reading — the plan being written READS the files
  * being replaced), then the old store moves aside and the temp swaps
  * in; the aside copy is deleted only after the swap succeeds, so a
  * crash at any point leaves either the old or the new store intact.
  */
object StoreMaintenance {

  /** Number of parquet part files currently in the store (recursive —
    * counts within partition directories too).
    */
  def partFileCount(path: String): Long = {
    val p = Paths.get(path)
    if (!Files.exists(p)) 0L
    else scala.util.Using.resource(Files.walk(p))(
      _.iterator().asScala
        .count(f => f.getFileName.toString.startsWith("part-") &&
          f.getFileName.toString.endsWith(".parquet")))
  }

  /** Rewrite the store into `ceil(bytes / targetBytes)` files (min 1),
    * preserving `partitionBy` layout when given. Returns the new part
    * count, or -1 when the store does not exist.
    */
  def compact(spark: SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024,
      partitionBy: Seq[String] = Nil): Long =
    swapRewrite(spark, path, targetBytes) { (df, nFiles, tmp) =>
      import org.apache.spark.sql.functions.col
      // With a partitioned layout, shuffle ON the partition keys: a
      // round-robin repartition(nFiles) makes every shuffle partition
      // hold rows of many partition values, so the partitioned write
      // fans out to up to nFiles × |values| small files — MORE
      // fragmentation than before compaction. Hash-clustering on the
      // keys puts each partition value in exactly one task, so each
      // partition directory gets exactly one file (the compacted
      // layout a later partition-pruned scan wants). A single value
      // larger than targetBytes then exceeds the target — acceptable:
      // bounded file COUNT is what compaction is for.
      val writer =
        (if (partitionBy.nonEmpty)
           df.repartition(nFiles, partitionBy.map(col): _*)
         else df.repartition(nFiles))
          .write.mode(SaveMode.Overwrite)
      (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*)
       else writer).parquet(tmp)
    }

  /** Range-clustered compaction: like [[compact]], but each output file
    * owns a DISJOINT range of `clusterBy` — `repartitionByRange` (one
    * range-exchange driven by a sampled boundary sketch) then
    * `sortWithinPartitions`. Parquet then records tight per-file and
    * per-row-group min/max stats on the cluster keys, so a later
    * key-range or point-lookup scan skips every non-overlapping file
    * instead of reading the whole store — THE data-layout lever for a
    * store that is written once and range-queried for years. Rows are
    * bit-identical to the input (a layout change, never a data change).
    */
  def compactClustered(spark: SparkSession, path: String,
      clusterBy: Seq[String],
      targetBytes: Long = 128L * 1024 * 1024): Long = {
    require(clusterBy.nonEmpty, "compactClustered needs cluster keys")
    swapRewrite(spark, path, targetBytes) { (df, nFiles, tmp) =>
      import org.apache.spark.sql.functions.col
      val keys = clusterBy.map(col)
      df.repartitionByRange(nFiles, keys: _*)
        .sortWithinPartitions(keys: _*)
        .write.mode(SaveMode.Overwrite).parquet(tmp)
    }
  }

  /** Z-order compaction: rewrite the store range-partitioned by the
    * Morton interleave of two bucketed dimensions
    * ([[graft.functions.zorder_key]]), so each output file covers a
    * tight bounding BOX in (dimA, dimB) — min/max footer stats then
    * prune scans filtering on EITHER dimension, where
    * [[compactClustered]]'s linear sort only prunes its leading key.
    * The zkey is a transient repartitioning column, dropped before
    * write; each dimension is RANGE-BINNED against its observed
    * min/max into [0, 2^bits) (width_bucket-style). Modulo bucketing
    * would cluster by residue for domains wider than 2^bits — footer
    * min/max on the raw columns then stay near-full-span and the
    * pruning benefit silently evaporates; range binning keeps bucket
    * adjacency == value adjacency at any domain width. Costs one extra
    * min/max scan of the two dim columns — a maintenance job, not a
    * query path.
    */
  def compactZOrdered(spark: SparkSession, path: String,
      dimA: String, dimB: String, bits: Int = 10,
      targetBytes: Long = 128L * 1024 * 1024): Long =
    compactZOrderedN(spark, path, Seq(dimA, dimB), bits, targetBytes)

  /** N-dimensional form of [[compactZOrdered]] (the 2-D signature above
    * delegates here bit-identically): range-bin each dimension against
    * its observed min/max, interleave with
    * [[graft.functions.zorder_key_n]], range-partition + sort on the
    * key. Three/four-dim clustering fits fact stores whose query mix
    * filters on different dimension subsets; `dims.size × bits ≤ 63`.
    */
  def compactZOrderedN(spark: SparkSession, path: String,
      dims: Seq[String], bits: Int = 10,
      targetBytes: Long = 128L * 1024 * 1024): Long = {
    require(dims.size >= 2, s"need ≥ 2 dims, got ${dims.size}")
    swapRewrite(spark, path, targetBytes) { (df, nFiles, tmp) =>
      import org.apache.spark.sql.functions.{col, lit, min, max, floor, least, greatest}
      val width = 1L << bits
      val aggs = dims.flatMap(d =>
        Seq(min(col(d).cast("double")), max(col(d).cast("double"))))
      val b = df.agg(aggs.head, aggs.tail: _*).head()
      def bin(c: org.apache.spark.sql.Column, lo: Double, hi: Double) = {
        val span = math.max(hi - lo, 0.0) + 1.0
        least(lit(width - 1), greatest(lit(0L),
          floor((c.cast("double") - lit(lo)) / lit(span) * lit(width.toDouble))
            .cast("long")))
      }
      val z =
        if (dims.indices.exists(i => b.isNullAt(2 * i))) lit(0L) // empty / all-null dim
        else graft.functions.zorder_key_n(
          dims.zipWithIndex.map { case (d, i) =>
            bin(col(d), b.getDouble(2 * i), b.getDouble(2 * i + 1))
          }, bits)
      df.withColumn("__zkey", z)
        .repartitionByRange(nFiles, col("__zkey"))
        .sortWithinPartitions(col("__zkey"))
        .drop("__zkey")
        .write.mode(SaveMode.Overwrite).parquet(tmp)
    }
  }

  /** Repair an interrupted [[compact]]/[[compactClustered]] swap. The
    * swap has a window where the store path is ABSENT (old moved aside,
    * new not yet moved in); a process kill there leaves the data intact
    * but homeless in `<path>__compact_old`. Long-lived writers (the
    * streaming ingest sink) must call this before probing the store —
    * an existence check alone would misread the window as "no store
    * yet" and silently restart history. Idempotent; also clears stray
    * temp dirs from a kill mid-rewrite.
    */
  def recoverInterruptedCompaction(path: String): Unit = {
    val p = Paths.get(path)
    val tmp = p.resolveSibling(p.getFileName.toString + "__compact_tmp")
    val aside = p.resolveSibling(p.getFileName.toString + "__compact_old")
    if (!Files.exists(p) && Files.exists(aside))
      Files.move(aside, p, StandardCopyOption.ATOMIC_MOVE)
    else if (Files.exists(p) && Files.exists(aside))
      deleteRecursive(aside) // swap completed; only the cleanup was lost
    deleteRecursive(tmp)
  }

  /** Number of COMMITTED parquet part files (excludes `_temporary`
    * staging from an in-flight or killed write).
    */
  def committedPartCount(path: String): Long = {
    val p = Paths.get(path)
    if (!Files.exists(p)) 0L
    else scala.util.Using.resource(Files.walk(p))(
      _.iterator().asScala
        .count(f => f.getFileName.toString.startsWith("part-") &&
          f.getFileName.toString.endsWith(".parquet") &&
          !f.toString.contains("_temporary")))
  }

  /** Shared rewrite-then-swap: build the new layout in a sibling temp
    * dir (never overwrite-while-reading), move the old store aside,
    * swap the temp in, delete the aside only once the swap held.
    */
  private def swapRewrite(spark: SparkSession, path: String,
      targetBytes: Long)(
      build: (org.apache.spark.sql.DataFrame, Int, String) => Unit): Long = {
    val p = Paths.get(path)
    if (!Files.exists(p)) return -1L
    val bytes = scala.util.Using.resource(Files.walk(p))(
      _.iterator().asScala.filter(Files.isRegularFile(_))
        .map(Files.size).sum)
    val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt

    val tmp = p.resolveSibling(p.getFileName.toString + "__compact_tmp")
    val aside = p.resolveSibling(p.getFileName.toString + "__compact_old")
    deleteRecursive(tmp); deleteRecursive(aside)

    build(spark.read.parquet(path), nFiles, tmp.toString)

    Files.move(p, aside, StandardCopyOption.ATOMIC_MOVE)
    try Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE)
    catch { case e: Throwable =>
      // roll the old store back before propagating
      Files.move(aside, p, StandardCopyOption.ATOMIC_MOVE)
      throw e
    }
    deleteRecursive(aside)
    partFileCount(path)
  }

  /** Compact the three audit tables. The audit trail appends one tiny
    * part file per run (execution_runs, file_log) and per processed file
    * (record_log) — after a year of daily runs the AUDIT dir has the same
    * small-files problem as the store, and every J4 idempotence probe
    * lists all of it. Same swap-safety as [[compact]]; append-only
    * semantics are preserved (compaction rewrites history, it never
    * drops or merges rows). Returns per-table new part counts (-1 for a
    * table that doesn't exist yet).
    */
  def compactAudit(spark: SparkSession, auditDir: String,
      targetBytes: Long = 128L * 1024 * 1024): Map[String, Long] =
    Seq("execution_runs", "file_log", "record_log").map { t =>
      t -> compact(spark, s"$auditDir/$t", targetBytes)
    }.toMap

  private def deleteRecursive(p: Path): Unit =
    if (Files.exists(p))
      scala.util.Using.resource(Files.walk(p))(
        _.iterator().asScala.toSeq).reverse.foreach(Files.delete)
}
