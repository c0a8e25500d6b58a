package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.storage.StorageLevel

/** Scoped lifetime for every cache the library creates.
  *
  * Several operators persist or localCheckpoint intermediates that
  * feed multiple consumers in one returned plan (pagerank's edge
  * relation, contrastive_pairs' verified positives, the CC rounds'
  * label checkpoints). Those blocks outlive the caller's action — a
  * library user composing several operators in one session would
  * otherwise accumulate orphaned cached RDDs (the r8-verdict cache-
  * hygiene finding). Every internal cache is therefore registered
  * with a [[CacheScope.Scope]] at creation, and releasing the scope
  * drops ONLY those — a user's own persisted data is never touched
  * (the reason this is not a `spark.catalog.clearCache()`).
  *
  * Two usage modes:
  *
  *  - '''Default (one operator at a time).''' Registrations land in
  *    the process-global scope; call `CacheScope.release()` once you
  *    are done consuming the DataFrames an operator returned.
  *    WARNING (ADVICE r9): the global scope has NO per-invocation
  *    isolation — `release()` drops every cache registered since the
  *    last release, across ALL operators and threads. Calling it
  *    while another operator's result is still unconsumed is unsafe:
  *    plain persists recompute (slower, still correct), but results
  *    with localCheckpoint ancestry (`dedup_cluster`, `cc_star`)
  *    CANNOT recompute (Spark discards their lineage by design) and
  *    fail permanently; they must be re-derived from the operator.
  *  - '''Isolated (composing operators).''' Open a scope per operator
  *    invocation and release scopes independently, in any order:
  *    {{{
  *    val s = CacheScope.open()
  *    val clusters = CacheScope.in(s)(Dedup.dedupCluster(spark, dir))
  *    // ... consume clusters ...
  *    s.release()                  // drops ONLY this invocation's caches
  *    }}}
  *    `in` binds the scope thread-locally for the duration of the
  *    operator CONSTRUCTION (all library caches materialize eagerly
  *    at build time, so construction-time binding captures them all);
  *    other threads and un-wrapped calls keep using the global scope.
  *
  * `graft.Verify` releases after every query; `graft.Bench`'s
  * inter-query sweep subsumes it. CacheScopeSpec asserts zero
  * orphaned blocks after each persisting operator runs standalone,
  * and that scope isolation holds under interleaving.
  */
object CacheScope {

  /** A per-invocation cache ledger: releasing one scope never touches
    * caches registered with another. */
  final class Scope private[CacheScope] () {
    private[CacheScope] val cleanups = new ConcurrentLinkedQueue[Boolean => Unit]()

    /** Number of tracked, not-yet-released caches in THIS scope. */
    def trackedCount: Int = cleanups.size()

    /** Unpersist every cache registered with this scope. `blocking =
      * true` waits for block removal (specs); the default queues it
      * on the async cleaner. Idempotent. */
    def release(blocking: Boolean = false): Unit = {
      var c = cleanups.poll()
      while (c != null) { c(blocking); c = cleanups.poll() }
    }
  }

  private val globalScope = new Scope()

  /** Thread-local scope binding; `None` → the global scope. */
  private val bound = new ThreadLocal[Scope]()

  private def currentScope: Scope = Option(bound.get()).getOrElse(globalScope)

  /** Opens a fresh, empty scope (not yet bound to any thread). */
  def open(): Scope = new Scope()

  /** Runs `body` with `s` as the registration target on this thread
    * (restores the previous binding on exit, exception-safe). */
  def in[A](s: Scope)(body: => A): A = {
    val prev = bound.get()
    bound.set(s)
    try body finally bound.set(prev)
  }

  /** Number of tracked, not-yet-released caches in the GLOBAL scope
    * (spec surface; per-invocation scopes report their own). */
  def trackedCount: Int = globalScope.trackedCount

  /** Releases the GLOBAL scope — see the class doc for when this is
    * unsafe; prefer per-invocation scopes when composing operators. */
  def release(blocking: Boolean = false): Unit = globalScope.release(blocking)

  implicit final class ScopedDataset[T](private val ds: Dataset[T]) extends AnyVal {

    /** `persist(MEMORY_AND_DISK)` whose unpersist is owed to the
      * current [[Scope]] (thread-bound, else global). */
    def persistScoped(): Dataset[T] = {
      val p = ds.persist(StorageLevel.MEMORY_AND_DISK)
      currentScope.cleanups.add(b => { p.unpersist(blocking = b); () })
      p
    }

    /** `localCheckpoint(eager)` whose backing RDD blocks are owed to
      * the current [[Scope]]. The checkpointed plan is a LogicalRDD
      * leaf over the persisted RDD — that RDD is what release drops
      * (Dataset.unpersist would miss it: checkpoint blocks live in
      * raw RDD storage, outside the SQL cache — the Bench sweep
      * lesson from r6). */
    def localCheckpointScoped(eager: Boolean = true): Dataset[T] = {
      val cp = ds.localCheckpoint(eager)
      currentScope.cleanups.add { b =>
        cp.queryExecution.logical.foreach {
          case l: LogicalRDD => l.rdd.unpersist(blocking = b)
          case _             => ()
        }
      }
      cp
    }
  }
}
