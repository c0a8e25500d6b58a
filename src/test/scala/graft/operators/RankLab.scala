package graft.operators

import org.apache.spark.sql.SparkSession

import graft.CacheScope

/** Dev-side same-JVM A/B of pagerank's per-round join strategy —
  * `sbt "Test/runMain graft.RankLab"`. Shuffle-state (shipped) vs
  * broadcast-state (candidate): each round either shuffles the tiny
  * (id, rank) relation to meet the pre-partitioned edge cache, or
  * broadcasts it and partial-aggregates map-side. Alternating runs,
  * caches swept between, min + all timings reported. Not shipped;
  * the accept bar is the r9-verdict ≥15% rule. */
object RankLab {
  def main(args: Array[String]): Unit = {
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
    def time(bcast: Boolean): Double = {
      val t0 = System.nanoTime()
      Graph.rankEdges(Graph.purchaseEdges(spark, dir), broadcastState = bcast).count()
      val dt = (System.nanoTime() - t0) / 1e9
      sweep(); dt
    }
    // warmup both paths once
    time(bcast = false); time(bcast = true)
    val runs = (1 to 4).flatMap(_ => Seq(false, true)).map(b => b -> time(b))
    Seq(false, true).foreach { b =>
      val ts = runs.filter(_._1 == b).map(_._2)
      println(f"broadcastState=$b  min=${ts.min}%.2f  runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    // equality proof: both strategies must produce identical ranks
    val a = Graph.rankEdges(Graph.purchaseEdges(spark, dir)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    sweep()
    val b = Graph.rankEdges(Graph.purchaseEdges(spark, dir), broadcastState = true).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    sweep()
    println(s"identical=${a.sameElements(b)}")
    spark.stop()
  }
}
