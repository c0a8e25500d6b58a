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
  * here at creation, and [[release]] drops ONLY those — a user's own
  * persisted data is never touched (the reason this is not a
  * `spark.catalog.clearCache()`).
  *
  * Contract: call `CacheScope.release()` once you are done consuming
  * the DataFrames an operator returned. Afterwards, results backed by
  * plain persists recompute (slower, still correct) — but results
  * with localCheckpoint ancestry (`dedup_cluster`, `cc_star`) CANNOT
  * be recomputed (Spark discards their lineage by design) and must be
  * re-derived from the operator, so release sits at the END of a
  * use-once-then-release scope. `graft.Verify` releases after every
  * query; `graft.Bench`'s inter-query sweep subsumes it.
  * CacheScopeSpec asserts zero orphaned blocks after each persisting
  * operator runs standalone.
  */
object CacheScope {

  private val cleanups = new ConcurrentLinkedQueue[Boolean => Unit]()

  /** Number of tracked, not-yet-released caches (spec surface). */
  def trackedCount: Int = cleanups.size()

  /** Unpersist every cache the library registered since the last
    * release. `blocking = true` waits for block removal (specs);
    * the default queues it on the async cleaner. */
  def release(blocking: Boolean = false): Unit = {
    var c = cleanups.poll()
    while (c != null) { c(blocking); c = cleanups.poll() }
  }

  implicit final class ScopedDataset[T](private val ds: Dataset[T]) extends AnyVal {

    /** `persist(MEMORY_AND_DISK)` whose unpersist is owed to
      * [[CacheScope.release]]. */
    def persistScoped(): Dataset[T] = {
      val p = ds.persist(StorageLevel.MEMORY_AND_DISK)
      cleanups.add(b => { p.unpersist(blocking = b); () })
      p
    }

    /** `localCheckpoint(eager)` whose backing RDD blocks are owed to
      * [[CacheScope.release]]. The checkpointed plan is a LogicalRDD
      * leaf over the persisted RDD — that RDD is what release drops
      * (Dataset.unpersist would miss it: checkpoint blocks live in
      * raw RDD storage, outside the SQL cache — the Bench sweep
      * lesson from r6). */
    def localCheckpointScoped(eager: Boolean = true): Dataset[T] = {
      val cp = ds.localCheckpoint(eager)
      cleanups.add { b =>
        cp.queryExecution.logical.foreach {
          case l: LogicalRDD => l.rdd.unpersist(blocking = b)
          case _             => ()
        }
      }
      cp
    }
  }
}
