package graft.queries

/** Process-scoped scratch space for layout/streaming fixtures.
  *
  * Paths embed the JVM pid so two concurrent JVMs running the same SF
  * (e.g. Verify and a test suite) can never read each other's
  * half-rewritten layout — mode("overwrite") is only atomic per writer.
  * Within one JVM the path is deterministic, so bench warmup + timed
  * passes overwrite in place instead of accumulating. The whole pid
  * root is removed on JVM exit, so repeated runs don't leak tmp space.
  */
object Scratch {

  private lazy val root: java.io.File = {
    val f = new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/graft_scratch_${ProcessHandle.current().pid()}")
    f.mkdirs()
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(f)))
    f
  }

  /** Deterministic-within-process dir for (fixture name, SF dir). */
  def dir(name: String, sfDir: String): String =
    s"${root.getAbsolutePath}/${name}_${sfDir.replaceAll("[^A-Za-z0-9.]", "_")}"

  /** Same path, wiped: for fixtures that must start empty every call
    * (streaming landing zones, checkpoints). */
  def fresh(name: String, sfDir: String): String = {
    val d = dir(name, sfDir)
    deleteRecursively(new java.io.File(d))
    d
  }

  /** Marker-gated once-per-JVM staging under [[dir]], serialized by a
    * JVM-wide per-path lock: two concurrent first callers (parallel
    * test suites, a future parallel bench runner) can never interleave
    * the wipe/stage/read — the second blocks until the first's marker
    * lands, then sees the finished artifact. Paths are pid-scoped, so
    * JVM-wide synchronization is complete (no cross-process writers).
    * `stage` runs exactly once per (name, sfDir) per JVM against the
    * wiped base dir; every reader goes through this call, so a read
    * can never observe a half-written artifact. */
  private val stageLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  def staged(name: String, sfDir: String)(stage: java.io.File => Unit): java.io.File = {
    val base = new java.io.File(dir(name, sfDir))
    val lock = stageLocks.computeIfAbsent(base.getPath, _ => new Object)
    lock.synchronized {
      val marker = new java.io.File(base, "_STAGED")
      if (!marker.exists()) {
        deleteRecursively(base)
        base.mkdirs()
        stage(base)
        marker.createNewFile(): Unit
      }
    }
    base
  }

  def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) {
      val children = f.listFiles()
      if (children != null) children.foreach(deleteRecursively)
    }
    f.delete(): Unit
  }
}
