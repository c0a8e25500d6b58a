package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Round-BODY plan pins for the ckpt-mode iterative graph ops.
  *
  * With the shipped "ckpt" state strategy ([[Graph.KcoreMode]] /
  * [[Graph.HitsMode]]) every round but the last executes eagerly, so
  * `PlanAuditSpec`'s post-hoc explain only sees the final round over
  * LogicalRDD leaves. The per-round construction — map-side combine,
  * reuse of the pre-partitioned edge copies — is mode-independent
  * (the same DataFrame expressions feed persist or checkpoint), so
  * this spec pins those properties on the LINEAGE-VISIBLE persist /
  * legacy modes, where the whole loop stays declarative.
  */
class GraphRoundPlanSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("kcore rounds (legacy lineage): per-round edges persist; degrees partial-combine") {
    val p = Graph.kcoreOn(Graph.purchaseEdges(spark, dir), mode = "legacy")
      .queryExecution.executedPlan.toString
    assert("InMemoryTableScan".r.findAllIn(p).size >= 4,
      "per-round edges must persist, not re-derive the purchase join")
    assert(p.contains("partial_count"), "degree aggregates must map-side combine")
    graft.CacheScope.release(blocking = true)
  }

  test("hits half-rounds (persist lineage): edge copies reused; sums partial-combine") {
    import org.apache.spark.sql.functions.col
    val edges = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"),
        (col("l_suppkey") + Graph.SuppOffset).as("s"))
      .distinct()
    val p = Graph.hitsOn(edges, mode = "persist")
      .queryExecution.executedPlan.toString
    assert("InMemoryTableScan".r.findAllIn(p).size >= 2,
      "alternating-key rounds must read the two pre-partitioned edge copies, not re-shuffle edges")
    assert(p.contains("partial_sum"), "score sums must map-side combine")
    graft.CacheScope.release(blocking = true)
  }
}
