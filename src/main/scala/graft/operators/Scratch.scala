package graft.operators

/** JVM-LIFETIME SCRATCH DIRECTORIES (round-12 advice closure): the
  * storage/container queries (q204–q208), the streaming batch-twin
  * harness, and the bench tools each need a throwaway on-disk table
  * root per invocation. A bare `Files.createTempDirectory` leaks a
  * full multi-version corpus copy to /tmp on EVERY execution — and a
  * bench rep re-runs the query fn, so repeated runs accumulated
  * gigabytes. Every scratch dir now registers here, and ONE shutdown
  * hook reaps them all recursively, best-effort (an IO failure during
  * JVM teardown must not mask the real exit path).
  *
  * Deliberately NOT `File.deleteOnExit`: that API keeps one entry per
  * FILE in a static set and deletes children only if registered in
  * reverse order — a parquet table tree is thousands of files whose
  * names aren't known at registration time. A recursive walk at
  * shutdown handles whatever the query wrote.
  */
object Scratch {

  private val registered =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()

  // idempotent one-time hook installation (lazy val body runs once)
  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      registered.forEach(deleteRecursively(_))
    }, "graft-scratch-reaper"))

  /** A fresh temp directory reaped at JVM exit. Returns the absolute
    * path as a String (the callers all string-append a child name). */
  def dir(prefix: String): String = {
    hookInstalled
    val p = java.nio.file.Files.createTempDirectory(prefix)
    registered.add(p)
    p.toString
  }

  private def deleteRecursively(root: java.nio.file.Path): Unit =
    try {
      if (java.nio.file.Files.exists(root)) {
        val all = java.nio.file.Files.walk(root)
        try {
          // deepest-first so directories empty before their own delete
          all.sorted(java.util.Comparator.reverseOrder())
            .forEach { p =>
              try { java.nio.file.Files.deleteIfExists(p); () }
              catch { case _: java.io.IOException => () }
            }
        } finally all.close()
      }
    } catch { case _: java.io.IOException => () } // best-effort at shutdown
}
