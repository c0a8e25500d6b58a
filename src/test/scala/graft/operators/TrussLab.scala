package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.CacheScope

/** Dev-side interleaved A/B for the k-truss per-round state strategy
  * (r15 continuation: the KcoreMode "ckpt" result should transfer —
  * a truss round references its survivor set 4×, one more than
  * kcore) — `sbt "Test/runMain graft.operators.TrussLab
  * [parity|time ...]"`.
  *
  * Protocol as KcoreLab: parity asserted (exceptAll both directions
  * vs legacy) BEFORE any timing; timings interleave modes within
  * each rep so ambient drift hits all modes equally. Not shipped;
  * its numbers decide [[Graph.TrussMode]]. Note the shared
  * shingle-pair build (Dedup.dedupNgramJaccard) is INSIDE the timed
  * wall on every run — it dominates, so the state-strategy delta
  * shows up attenuated relative to kcore's. */
object TrussLab {
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

    def trussWith(mode: String): DataFrame =
      Graph.ktrussOn(Dedup.dedupNgramJaccard(spark, dir)
        .select(col("doc_a"), col("doc_b")), mode = mode)

    if (sections("parity")) {
      val ref = trussWith("legacy")
      val cand = trussWith("ckpt")
      val d1 = ref.exceptAll(cand).count()
      val d2 = cand.exceptAll(ref).count()
      require(d1 == 0 && d2 == 0, s"truss ckpt diverges: $d1/$d2 rows")
      println("TRUSSLAB parity ckpt OK")
      sweep()
    }

    if (sections("time")) {
      for (rep <- 1 to 3; m <- Seq("legacy", "ckpt")) {
        val t0 = System.nanoTime()
        trussWith(m).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"TRUSSLAB mode=$m%-7s rep=$rep%d cold=$sec%.1f")
        sweep()
      }
    }
    spark.stop()
  }
}
