package graft.queries

/** Temp directories for the session-memoized store gates (s6/s7, d14,
  * d21, t21, s18, s25, a16, and the CoreQueries stores): every store
  * built for a gate run lives under one of these, and ONE JVM shutdown
  * hook deletes them all when the run ends — gate runs no longer
  * accumulate orphaned `graft-*` temp trees across sessions. The hook
  * is best-effort by design (a kill -9 still leaves the dirs, like any
  * temp file), which is acceptable for what are explicitly
  * run-scratch stores rebuilt from parquet on every session.
  */
object TempStores {
  private val handed =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]

  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      handed.forEach { p =>
        try org.apache.hadoop.fs.FileUtil.fullyDelete(p.toFile)
        catch { case _: Throwable => () } // best-effort cleanup
      }
    }, "graft-tempstore-cleanup"))

  /** A fresh temp directory that the shutdown hook will delete. */
  def dir(prefix: String): String = {
    hookInstalled
    val p = java.nio.file.Files.createTempDirectory(prefix)
    handed.add(p)
    p.toString
  }
}
