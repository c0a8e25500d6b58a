package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.CacheScope

/** Dev-side interleaved A/B for the k-core per-round state strategy
  * (r15 continuation: kcore became the registry's slowest op after
  * the BFS-family fix) — `sbt "Test/runMain
  * graft.operators.KcoreLab [parity|time ...]"`.
  *
  * The shipped-r11 loop persisted edges per round; like the BFS
  * legacy loop its round output is referenced THREE times (the degree
  * aggregate feeding both semi joins + the join left side), so the
  * logical plan grows 3^rounds even though cache substitution bounds
  * recompute. Candidates: "legacy" (per-round persist), "ckpt"
  * (per-round eager localCheckpoint, last round declarative — the
  * BfsMode precedent), "decl" (persist only the input; rounds fully
  * declarative — the 3^rounds baseline). Parity is asserted
  * (exceptAll both directions vs legacy) BEFORE any timing; timings
  * interleave modes within each rep so ambient drift hits all modes
  * equally (the PLANS batch E protocol). Not shipped; its numbers
  * decide [[Graph.KcoreMode]].
  *
  * An earlier KcoreLab measured the keep-persist question (keep NOT
  * persisted won: 5.1–5.5 s vs 8.6–9.9 s at sf0.1); that decision is
  * recorded in [[Graph.kcoreOn]]'s comment and is not re-run here.
  */
object KcoreLab {
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

    def kcoreWith(mode: String): DataFrame =
      Graph.kcoreOn(Graph.purchaseEdges(spark, dir), mode = mode)

    if (sections("parity")) {
      val ref = kcoreWith("legacy")
      for (m <- Seq("ckpt", "decl")) {
        val cand = kcoreWith(m)
        val d1 = ref.exceptAll(cand).count()
        val d2 = cand.exceptAll(ref).count()
        require(d1 == 0 && d2 == 0, s"kcore mode $m diverges: $d1/$d2 rows")
        println(s"KCORELAB parity $m OK")
        sweep()
      }
      sweep()
    }

    if (sections("time")) {
      for (rep <- 1 to 3; m <- Seq("legacy", "ckpt", "decl")) {
        val t0 = System.nanoTime()
        kcoreWith(m).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"KCORELAB mode=$m%-7s rep=$rep%d cold=$sec%.1f")
        sweep()
      }
    }
    spark.stop()
  }
}
