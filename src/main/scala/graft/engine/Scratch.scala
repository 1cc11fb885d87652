package graft.engine

/** Scoped scratch directory for queries that must materialize an intermediate
  * physical layout before answering (z-order copies, skipping indexes,
  * versioned-state demos, rank selection): create → run → delete.
  *
  * The result MUST be consumed eagerly inside the scope — the files are gone
  * when it closes, so returning a lazy plan over them is a use-after-free.
  * The layout queries (q56/q68/q74/q81/q101/q102) all follow this discipline;
  * this helper factors their hand-rolled try/finally copies into one place.
  * (Streaming demos whose state must outlive the returned lazy frame instead
  * use `SparkEntry.tempDirCleanedOnExit`, which defers cleanup to JVM exit.)
  */
object Scratch {

  /** Run `f` with a fresh temp directory; always delete it afterwards. */
  def withTempDir[T](prefix: String)(f: String => T): T = {
    val tmp = java.nio.file.Files.createTempDirectory(prefix).toString
    try f(tmp)
    finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }
}
