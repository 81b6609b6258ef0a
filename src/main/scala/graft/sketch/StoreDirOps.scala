package graft.sketch

/** The crash-safe directory swap the accreted sketch stores share
  * ([[HllStore]], [[KmvStore]] — the VecIndex.repair discipline made
  * reusable). A store's log dir is an append-only bag of parquet part
  * files whose merge algebra is idempotent (cell-wise max, k-minima
  * distinct-union), which makes both halves of the discipline trivial:
  *
  *  - '''compact swap''': write the folded grid to `<log>__compact_tmp`,
  *    atomically move log → `<log>__compact_old` and tmp → log, then
  *    RESCUE any part file in the aside that was not in the compaction's
  *    snapshot (a concurrent append's straggler — move it into the new
  *    log verbatim; the next compact folds it) and delete the aside.
  *  - '''repair''': after a crash anywhere in that sequence, promote a
  *    complete tmp if the log is missing, fold EVERY aside file back
  *    into the log (idempotent merge absorbs the already-folded ones),
  *    and clear the leftovers. Never needs to know how far the crash
  *    got; safe on a healthy store (no-op).
  */
private[sketch] object StoreDirOps {

  private def parquetFiles(dir: java.nio.file.Path): Seq[java.io.File] =
    Option(dir.toFile.listFiles()).map(_.toSeq).getOrElse(Nil)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))

  private def tmpOf(p: java.nio.file.Path) =
    p.resolveSibling(p.getFileName.toString + "__compact_tmp")
  private def asideOf(p: java.nio.file.Path) =
    p.resolveSibling(p.getFileName.toString + "__compact_old")

  /** Where a compaction must write the folded grid before calling
    * [[swapAndRescue]].
    */
  def compactTmp(logDir: String): String = tmpOf(
    java.nio.file.Paths.get(logDir)).toString

  /** Swap the written tmp into place and rescue straggler appends.
    * `snapNames` are the part-file names the compaction's merge read —
    * anything else in the old log landed concurrently and moves into
    * the new log untouched.
    */
  def swapAndRescue(logDir: String, snapNames: Set[String]): Unit = {
    val p = java.nio.file.Paths.get(logDir)
    val (tmp, aside) = (tmpOf(p), asideOf(p))
    java.nio.file.Files.move(p, aside,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    java.nio.file.Files.move(tmp, p,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    parquetFiles(aside).filterNot(f => snapNames(f.getName)).foreach { f =>
      java.nio.file.Files.move(f.toPath, p.resolve(f.getName),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    org.apache.hadoop.fs.FileUtil.fullyDelete(aside.toFile)
  }

  /** Crash recovery (see object doc). Returns files restored from the
    * aside.
    */
  def repair(logDir: String): Long = {
    val p = java.nio.file.Paths.get(logDir)
    val (tmp, aside) = (tmpOf(p), asideOf(p))
    var restored = 0L
    if (!java.nio.file.Files.exists(p)) {
      // crashed between the two moves: the complete tmp is the folded
      // log — promote it; the aside's files fold back in below
      if (java.nio.file.Files.exists(tmp)) {
        java.nio.file.Files.move(tmp, p,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      } else if (java.nio.file.Files.exists(aside)) {
        // no tmp (shouldn't happen — tmp is written first), but
        // restoring the old log is always sound
        java.nio.file.Files.move(aside, p,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      }
    }
    if (java.nio.file.Files.exists(aside)) {
      parquetFiles(aside).foreach { f =>
        val dst = p.resolve(f.getName)
        if (!java.nio.file.Files.exists(dst)) {
          java.nio.file.Files.move(f.toPath, dst,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          restored += 1L
        }
      }
      org.apache.hadoop.fs.FileUtil.fullyDelete(aside.toFile)
    }
    if (java.nio.file.Files.exists(tmp))
      org.apache.hadoop.fs.FileUtil.fullyDelete(tmp.toFile)
    restored
  }
}
