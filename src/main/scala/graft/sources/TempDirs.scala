package graft.sources

/** Per-JVM scratch directories for the registered SINK gates
  * (`zorder_write`, `shuffle_export_write`), which must materialize
  * files before their re-read plan can run.
  *
  * Two constraints pull against each other: a FIXED path lets two
  * concurrent JVMs benching the same fixture dir race on the same
  * output mid-overwrite (and `dir.hashCode` collisions would alias
  * distinct inputs), while a FRESH path per call leaks a corpus copy
  * into /tmp on every invocation. Resolution: the path is fixed per
  * (input dir, JVM) — the pid component isolates concurrent
  * processes; overwrite-mode reuse within one JVM keeps Bench's
  * repeated calls from accumulating copies; and a shutdown hook
  * removes the whole tree when the JVM exits, so nothing outlives
  * the process that wrote it. Re-read plans only ever execute inside
  * the writing JVM (the gate is write-then-reread in one query), so
  * deleting at exit is safe.
  */
object TempDirs {

  private val pid = ProcessHandle.current().pid()
  private val registered = scala.collection.mutable.HashSet[String]()

  /** A stable-within-this-JVM scratch path for (label, input dir),
    * deleted recursively at JVM shutdown. */
  def scratch(label: String, dir: String): String = synchronized {
    val f = new java.io.File(
      System.getProperty("java.io.tmpdir"),
      s"graft_${label}_${Integer.toHexString(dir.hashCode)}_p$pid")
    val path = f.toString
    if (registered.add(path))
      Runtime.getRuntime.addShutdownHook(new Thread(() => deleteTree(f)))
    path
  }

  private def deleteTree(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteTree)
    f.delete(): Unit
  }
}
