package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Attaches a 1-row scalar aggregate to every row of a frame as a
  * BROADCAST HASH join, never a cross join.
  *
  * `df.crossJoin(broadcast(oneRow))` plans a
  * `BroadcastNestedLoopJoin … Cross` — harmless when the broadcast
  * side is by-construction one row, but indistinguishable in the
  * physical plan from an accidental cartesian, so the repo-wide plan
  * audit ([[graft.PlanAuditSpec]]) rejects it. This helper instead
  * manufactures a NON-FOLDABLE constant join key on both sides:
  * `pmod(numericCol, 1)` is always 0 but no Catalyst rule proves it
  * (`x * 0` does NOT work — CollapseProject merges the alias into
  * the upstream Aggregate where it simplifies to a foldable literal
  * and FoldablePropagation then erases the join condition, verified
  * on Spark 4.1). With the pmod key `ExtractEquiJoinKeys` sees a
  * genuine equi-join predicate and the planner picks
  * `BroadcastHashJoin`.
  *
  * Precondition: both key-source columns must be NON-NULL on every
  * row (counts/sums of `lit(1)` qualify) — a null key would silently
  * drop the row under the inner join.
  */
object ScalarJoin {

  /** Joins `scalar` (a 1-row frame) onto every row of `rows`.
    * `rowNum`/`scalarNum` are any non-null numeric columns of the
    * respective frames, used only to build the non-foldable key. */
  def attachScalar(rows: DataFrame, rowNum: Column,
                   scalar: DataFrame, scalarNum: Column): DataFrame =
    broadcastCross(rows, rowNum, scalar, scalarNum)

  /** Cross product of `rows` with a BY-CONSTRUCTION-TINY relation
    * (a centroid table, a parameter grid), planned as a broadcast
    * HASH join on the same non-foldable constant key rather than a
    * BNLJ. Fan-out = small.count per row — callers own the bound. */
  def broadcastCross(rows: DataFrame, rowNum: Column,
                     small: DataFrame, smallNum: Column): DataFrame =
    rows.withColumn("_jk", pmod(rowNum, lit(1L)).cast("int"))
      .join(broadcast(small.withColumn("_jk", pmod(smallNum, lit(1L)).cast("int"))), "_jk")
      .drop("_jk")
}
