package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.CacheScope

/** Dev-side interleaved A/B for HITS' per-half-round state strategy
  * (r15 continuation: hits_scores sits in the bench top-5) — `sbt
  * "Test/runMain graft.operators.HitsLab [parity|time ...]"`.
  *
  * The shipped rescale persists each half-round's raw sums (they are
  * referenced twice: max aggregate + rescale join). Candidate: swap
  * the persist for an eager localCheckpoint (the kcore/BFS "ckpt"
  * result — plans each half-round exactly once against a LogicalRDD
  * leaf). Parity asserted (exceptAll both directions) BEFORE timing;
  * modes interleave within each rep. Not shipped; its numbers decide
  * [[Graph.HitsMode]]. */
object HitsLab {
  def main(args: Array[String]): Unit = {
    val sections: Set[String] =
      if (args.isEmpty) Set("parity", "time") else args.toSet
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

    def hitsWith(mode: String): DataFrame =
      Graph.hitsOn(
        graft.sources.Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_custkey"))
          .join(graft.sources.Tables.lineitem(spark, dir)
            .select(col("l_orderkey"), col("l_suppkey")),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("c"),
            (col("l_suppkey") + Graph.SuppOffset).as("s"))
          .distinct(),
        mode)

    if (sections("parity")) {
      val ref = hitsWith("persist")
      val cand = hitsWith("ckpt")
      val d1 = ref.exceptAll(cand).count()
      val d2 = cand.exceptAll(ref).count()
      require(d1 == 0 && d2 == 0, s"hits ckpt diverges: $d1/$d2 rows")
      println("HITSLAB parity ckpt OK")
      sweep()
    }

    if (sections("time")) {
      for (rep <- 1 to 3; m <- Seq("persist", "ckpt")) {
        val t0 = System.nanoTime()
        hitsWith(m).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"HITSLAB mode=$m%-8s rep=$rep%d cold=$sec%.1f")
        sweep()
      }
    }
    spark.stop()
  }
}
