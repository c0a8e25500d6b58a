package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.CacheScope
import graft.CacheScope.ScopedDataset

/** Dev-side interleaved A/B for the BFS-family relax-loop lineage
  * rewrite (VERDICT r14 item 1) — `sbt "Test/runMain
  * graft.operators.BfsLab [parity|bfs|sssp ...]"`.
  *
  * The legacy loop references its own plan twice per round (join +
  * union), growing the logical plan 2^rounds; candidates are a
  * per-round localCheckpoint ("ckpt") and delta/frontier propagation
  * ("frontier" for unit hops, "delta" for weighted). Parity is
  * asserted (exceptAll both directions vs legacy) BEFORE any timing;
  * timings interleave modes within each rep (the PLANS batch E
  * protocol) so ambient drift hits all modes equally. Not shipped;
  * its numbers decide [[Graph.BfsMode]] / [[Graph.SsspMode]]. */
object BfsLab {
  def main(args: Array[String]): Unit = {
    val sections: Set[String] =
      if (args.isEmpty) Set("parity", "bfs", "sssp") else args.toSet
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def sweep(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      CacheScope.release(blocking = true)
    }

    // --- the registry shapes, rebuilt per call with a mode knob ----
    def bfsReachWith(mode: String): DataFrame = {
      val edges = Graph.purchaseEdges(spark, dir)
        .repartition(col("u")).persistScoped()
      val seeds = edges.select(col("u").as("id"))
        .filter(col("id") >= Graph.SuppOffset &&
          col("id") <= Graph.SuppOffset + Graph.BfsMaxSeedSupp)
        .distinct()
        .select(col("id"), lit(0L).as("d"))
      val dist = Graph.bfsDistances(edges, seeds, Graph.BfsRounds, mode)
      edges.select(col("u").as("id")).distinct()
        .join(dist, Seq("id"), "left")
        .groupBy(coalesce(col("d"), lit(-1L)).as("d"))
        .agg(count(lit(1)).as("n_nodes"))
    }

    def ssspWith(mode: String): DataFrame = {
      val pair = graft.sources.Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_custkey"))
        .join(graft.sources.Tables.lineitem(spark, dir)
          .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"),
          (col("l_suppkey") + Graph.SuppOffset).as("s"),
          expr("cast(floor(l_extendedprice * 100 + 0.5) as bigint)").as("w"))
        .groupBy(col("c"), col("s")).agg(min(col("w")).as("w"))
      val edges = pair.select(col("c").as("u"), col("s").as("v"), col("w"))
        .unionAll(pair.select(col("s").as("u"), col("c").as("v"), col("w")))
      Graph.ssspOn(edges,
        edges.filter(col("u") >= Graph.SuppOffset &&
          col("u") <= Graph.SuppOffset + Graph.BfsMaxSeedSupp)
          .select(col("u").as("id")).distinct(),
        mode)
    }

    // --- parity: every mode computes the identical relation --------
    if (sections("parity")) {
      val bfsRef = bfsReachWith("legacy")
      for (m <- Seq("ckpt", "frontier")) {
        val cand = bfsReachWith(m)
        val d1 = bfsRef.exceptAll(cand).count()
        val d2 = cand.exceptAll(bfsRef).count()
        require(d1 == 0 && d2 == 0, s"bfs mode $m diverges: $d1/$d2 rows")
        println(s"BFSLAB parity bfs $m OK")
        sweep()
      }
      val ssspRef = ssspWith("legacy")
      for (m <- Seq("ckpt", "delta")) {
        val cand = ssspWith(m)
        val d1 = ssspRef.exceptAll(cand).count()
        val d2 = cand.exceptAll(ssspRef).count()
        require(d1 == 0 && d2 == 0, s"sssp mode $m diverges: $d1/$d2 rows")
        println(s"BFSLAB parity sssp $m OK")
        sweep()
      }
      sweep()
    }

    def t(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    // --- interleaved timings (modes alternate within each rep) -----
    if (sections("bfs")) {
      for (rep <- 1 to 3; m <- Seq("legacy", "ckpt", "frontier")) {
        val sec = t { bfsReachWith(m).count() }
        println(f"BFSLAB bfs mode=$m%-8s rep=$rep%d cold=$sec%.1f")
        sweep()
      }
    }
    if (sections("sssp")) {
      for (rep <- 1 to 3; m <- Seq("legacy", "ckpt", "delta")) {
        val sec = t { ssspWith(m).count() }
        println(f"BFSLAB sssp mode=$m%-8s rep=$rep%d cold=$sec%.1f")
        sweep()
      }
    }
    spark.stop()
  }
}
