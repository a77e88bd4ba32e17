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

  def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) {
      val children = f.listFiles()
      if (children != null) children.foreach(deleteRecursively)
    }
    f.delete(): Unit
  }
}
