package graft

/** Session-scoped scratch directories for the maintained-fixture queries
  * and the bench/demo mains: every directory created here is swept by ONE
  * JVM shutdown hook, so repeated Verify/Bench runs stop leaking fixture
  * trees (two LakeTables or a whole graph epoch each) under the system
  * temp dir. Library operators never use this — a real deployment owns
  * and retains its workDirs; scratch is strictly harness plumbing.
  */
private[graft] object Scratch {
  private val created =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]

  // installed at most once, on first use; deletion is best-effort (the
  // JVM is exiting — a file Spark still holds just survives to the OS
  // tmp reaper, it must never abort the shutdown sequence)
  private lazy val hookInstalled: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      created.forEach { p =>
        try {
          java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
            .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
        } catch { case _: Exception => () }
      }
    }, "graft-scratch-sweep"))
    ()
  }

  /** A fresh temp directory registered for deletion at JVM exit. */
  def dir(prefix: String): String = {
    hookInstalled
    val p = java.nio.file.Files.createTempDirectory(prefix)
    created.add(p)
    p.toString
  }
}
