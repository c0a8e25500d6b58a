package graft.operators

import org.apache.spark.sql.SparkSession

import graft.CacheScope

/** Dev-side phase breakdown for ann_graph — `sbt "Test/runMain
  * graft.operators.GraphAnnLab"`. Times the NN-descent graph build
  * (materialized via count) and the beam search given a warm graph,
  * then the whole operator cold, alternating runs with cache sweeps.
  * Not shipped; informs where the operator's budget actually goes. */
object GraphAnnLab {
  def main(args: Array[String]): Unit = {
    // optional section filter: `Test/runMain graft.operators.GraphAnnLab cap`
    // runs only that A/B (sections: phases, beam, hops, cap)
    val sections: Set[String] =
      if (args.isEmpty) Set("phases", "beam", "hops", "cap") else args.toSet
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
    def t(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    if (sections("phases")) {
      // cold whole-operator
      val cold = t { Similarity.annGraph(spark, dir).count() }
      sweep()
      // build vs search split (graph left warm for the search timing)
      val build = t { Similarity.neighborGraph(spark, dir).count() }
      val search = t { Similarity.annGraph(spark, dir).count() }
      sweep()
      val cold2 = t { Similarity.annGraph(spark, dir).count() }
      sweep()
      println(f"GRAPHANN cold=$cold%.1f build=$build%.1f searchWarmGraph=$search%.1f cold2=$cold2%.1f")
    }
    // beam-width A/B (VERDICT r12 item 6): recall@5 vs brute force +
    // cold time at each width; ship a narrower beam only if the 0.8
    // floor holds at every SF. Lazy (ADVICE r14): a phases-only run
    // must not pay the brute-force collect it never reads.
    lazy val brute: Set[(Long, Long)] = {
      val b = Similarity.annTopkBrute(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSet
      sweep()
      b
    }
    for (bw <- Seq(48, 40, 32) if sections("beam")) {
      val t0 = System.nanoTime()
      val rows = Similarity.annGraphBeam(spark, dir, bw).collect()
      val sec = (System.nanoTime() - t0) / 1e9
      val recall = brute.intersect(
        rows.map(r => (r.getLong(0), r.getLong(2))).toSet).size.toDouble / brute.size
      println(f"GRAPHANN_AB beam=$bw%d cold=$sec%.1f recall=$recall%.3f")
      sweep()
    }
    // hop-count A/B (the r13 beam-width lab's conclusion: the per-hop
    // fixed structure dominates — so the hop count is the dial worth
    // measuring). Ship fewer hops only if recall holds at every SF.
    for (h <- Seq(4, 3, 2); rep <- 1 to 2 if sections("hops")) {
      val t0 = System.nanoTime()
      val rows = Similarity.annGraphBeam(spark, dir, 48, hops = h).collect()
      val sec = (System.nanoTime() - t0) / 1e9
      val recall = brute.intersect(
        rows.map(r => (r.getLong(0), r.getLong(2))).toSet).size.toDouble / brute.size
      println(f"GRAPHANN_HOPS hops=$h%d rep=$rep%d cold=$sec%.1f recall=$recall%.3f")
      sweep()
    }
    // candidate-cap A/B (VERDICT r13 item 5): the descent rounds'
    // local-join cap is the one unprobed term left in the build —
    // candidate mass scales with cap² (16²=256 → 12²=144 rows/node).
    // Ship 12 only if the recall>=0.8 floor holds at every SF with a
    // saving outside run noise.
    for (cap <- Seq(16, 12); rep <- 1 to 2 if sections("cap")) {
      val t0 = System.nanoTime()
      val rows = Similarity.annGraphBeam(spark, dir, 48, candCap = cap).collect()
      val sec = (System.nanoTime() - t0) / 1e9
      val recall = brute.intersect(
        rows.map(r => (r.getLong(0), r.getLong(2))).toSet).size.toDouble / brute.size
      println(f"GRAPHANN_CAP cap=$cap%d rep=$rep%d cold=$sec%.1f recall=$recall%.3f")
      sweep()
    }
    spark.stop()
  }
}
