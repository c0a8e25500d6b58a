package graft.sources

/** Per-JVM scratch directories for the registered SINK gates
  * (`zorder_write`, `shuffle_export_write`), which must materialize
  * files before their re-read plan can run.
  *
  * Two constraints pull against each other: a FIXED path lets two
  * concurrent JVMs benching the same fixture dir race on the same
  * output mid-overwrite, while a FRESH path per call leaks a corpus
  * copy into /tmp on every invocation. Resolution: the path is fixed
  * per (input dir, JVM) — the pid component isolates concurrent
  * processes and an md5 of the full dir path (collision-free in
  * practice, unlike String.hashCode) isolates distinct inputs;
  * overwrite-mode reuse within one JVM keeps Bench's
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
      s"graft_${label}_${dirKey(dir)}_p$pid")
    val path = f.toString
    if (registered.add(path))
      Runtime.getRuntime.addShutdownHook(new Thread(() => deleteTree(f)))
    path
  }

  /** Collision-free short key for an input dir: md5 of its UTF-8
    * bytes (first 12 hex chars — 48 bits, vs hashCode's trivially
    * colliding 32). Also usable for catalog-table name scoping. */
  def dirKey(dir: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(dir.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
  }

  private def deleteTree(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteTree)
    f.delete(): Unit
  }
}
