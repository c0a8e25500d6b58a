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

  /** Optional scratch EPOCH (r15, VERDICT r14 item 2): the sysprop is
    * read at every `scratch` call, so flipping it mid-JVM hands out a
    * FRESH directory tree for the same (label, dir). Benchmarking is
    * the one consumer: the streaming sink gates keep their checkpoint
    * across calls in one JVM by design (a rerun drains zero new files
    * — the incremental contract), which made their min-of-two damping
    * rerun time the warm path instead of the operator. Bench flips
    * the epoch before its damping pass so a stream-op rerun is a
    * genuine cold drain. Unset (every non-bench context) → paths are
    * byte-identical to the pre-epoch scheme, and each epoch's tree
    * registers its own shutdown-hook cleanup. */
  val EpochProp = "graft.scratch.epoch"

  /** A stable-within-this-JVM scratch path for (label, input dir,
    * current epoch), deleted recursively at JVM shutdown. */
  def scratch(label: String, dir: String): String = synchronized {
    val epoch = sys.props.get(EpochProp).filter(_.nonEmpty)
      .map(e => s"_e$e").getOrElse("")
    val f = new java.io.File(
      System.getProperty("java.io.tmpdir"),
      s"graft_${label}_${dirKey(dir)}_p$pid$epoch")
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
