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
      if (args.isEmpty) Set("phases", "beam", "hops", "cap", "initcap") else args.toSet
    // `stages` (r15, VERDICT r14 item 4) is opt-in: it replicates the
    // operator stage-by-stage and is not part of the default A/B sweep
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
    // per-stage cost attribution (r15, VERDICT r14 item 4): where do
    // ann_graph's ~12 s actually go? Replicates the shipped
    // construction (SimilaritySearch.neighborGraph +
    // SimilarityPqIndex.annGraphBeam) with a timed count() per stage:
    // LSH-bucket init, each NN-descent round, each beam hop, final
    // re-rank. Counts force extra materializations, so the SUM
    // overshoots the cold operator — the RATIOS are the signal.
    // --- replicated builders for the stages / rounds sections ------
    // (the shipped construction of SimilaritySearch.neighborGraph +
    // SimilarityPqIndex.annGraphBeam, stage-instrumentable; a lab
    // replica, so drift is caught by the recall floor it reports)
    object replica {
      import org.apache.spark.sql.DataFrame
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      import graft.CacheScope.ScopedDataset
      import graft.functions.VectorFunctions.cosine_sim
      def e: DataFrame = graft.sources.Tables.embeddings(spark, dir)
      def topM(cand: DataFrame): DataFrame = {
        val scored = cand
          .join(e.select(col("vec_id").as("src"), col("embedding").as("se")), "src")
          .join(e.select(col("vec_id").as("dst"), col("embedding").as("de")), "dst")
          .withColumn("cos", cosine_sim(col("se"), col("de")))
        val w = Window.partitionBy(col("src")).orderBy(col("cos").desc, col("dst").asc)
        scored.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= Similarity.GraphDeg)
          .select("src", "dst")
      }
      def initGraph(): DataFrame = {
        val tagged = Similarity.tableKeys(spark, dir)
        topM(tagged.as("a").join(tagged.as("b"),
            col("a.table_idx") === col("b.table_idx") &&
              col("a.table_key") === col("b.table_key") &&
              col("a.vec_id") =!= col("b.vec_id"))
          .select(col("a.vec_id").as("src"), col("b.vec_id").as("dst"))
          .distinct()).persistScoped()
      }
      def descend(g: DataFrame): DataFrame = {
        val fwd = g.as("a").join(g.as("b"),
            col("a.dst") === col("b.src") && col("a.src") =!= col("b.dst"))
          .select(col("a.src").as("src"), col("b.dst").as("dst"))
        val rev = g.select(col("dst").as("src"), col("src").as("dst"))
        val co = g.as("a").join(g.as("b"),
            col("a.src") === col("b.src") && col("a.dst") =!= col("b.dst"))
          .select(col("a.dst").as("src"), col("b.dst").as("dst"))
        topM(g.union(fwd).union(rev).union(co).distinct()).persistScoped()
      }
      private def q = e.filter(col("vec_id") < Similarity.NQueries)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      def scoredB(cand: DataFrame): DataFrame =
        cand.filter(col("qid") =!= col("nid"))
          .join(e.select(col("vec_id").as("nid"), col("embedding").as("ne")), "nid")
          .join(broadcast(q), "qid")
          .withColumn("cos", cosine_sim(col("qe"), col("ne")))
      val wq = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
      def beamTop(cand: DataFrame): DataFrame =
        scoredB(cand).withColumn("rn", row_number().over(wq))
          .filter(col("rn") <= Similarity.BeamWidth)
          .select("qid", "nid")
      def expand(g: DataFrame, b: DataFrame): DataFrame =
        g.as("gr").join(broadcast(b.as("bm")), col("bm.nid") === col("gr.src"))
          .select(col("bm.qid").as("qid"), col("gr.dst").as("nid"))
      def seedBeam(): DataFrame = {
        val seeds = e.filter(col("vec_id") % Similarity.SeedStride === 0)
          .select(col("vec_id").as("nid"))
        beamTop(seeds.join(broadcast(q.select(col("qid"))),
          col("qid") =!= col("nid"))).localCheckpointScoped()
      }
      def hop(g: DataFrame, b: DataFrame): DataFrame =
        beamTop(b.union(expand(g, b)).distinct()).localCheckpointScoped()
      def finalTopK(g: DataFrame, b: DataFrame): DataFrame =
        scoredB(b.union(expand(g, b)).distinct())
          .withColumn("rnk", row_number().over(wq).cast("long"))
          .filter(col("rnk") <= Similarity.K)
          .select(col("qid"), col("rnk"), col("nid"))
    }

    if (sections("stages")) {
      val wKeys = t { Similarity.tableKeys(spark, dir).count() }
      var g = replica.initGraph()
      val wInit = t { g.count() }
      val roundSecs = (1 to Similarity.DescentRounds).map { _ =>
        g = replica.descend(g)
        t { g.count() }
      }
      var beam = replica.seedBeam()
      val hop1 = t { beam.count() }
      val hopSecs = (2 to Similarity.BeamHops).map { _ =>
        beam = replica.hop(g, beam)
        t { beam.count() }
      }
      val tFinal = t { replica.finalTopK(g, beam).count() }
      println(f"GRAPHANN_STAGES keys=$wKeys%.1f init=$wInit%.1f " +
        s"descent=${roundSecs.map(s => f"$s%.1f").mkString("+")} " +
        s"hops=${(hop1 +: hopSecs).map(s => f"$s%.1f").mkString("+")} " +
        f"final=$tFinal%.1f")
      sweep()
    }

    // descent-round A/B (the fourth dial the stage attribution
    // surfaced: the BUILD dominates, the beam is ~free): recall@5 of
    // the full beam search over a graph built with r descent rounds
    if (sections("rounds")) {
      val bruteSet = Similarity.annTopkBrute(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSet
      sweep()
      for (r <- Seq(Similarity.DescentRounds, 1, 0); rep <- 1 to 2) {
        val t0 = System.nanoTime()
        var g = replica.initGraph()
        for (_ <- 1 to r) g = replica.descend(g)
        var beam = replica.seedBeam()
        for (_ <- 2 to Similarity.BeamHops) beam = replica.hop(g, beam)
        val rows = replica.finalTopK(g, beam).collect()
        val sec = (System.nanoTime() - t0) / 1e9
        val recall = bruteSet.intersect(
          rows.map(x => (x.getLong(0), x.getLong(2))).toSet).size.toDouble / bruteSet.size
        println(f"GRAPHANN_ROUNDS rounds=$r%d rep=$rep%d cold=$sec%.1f recall=$recall%.3f")
        sweep()
      }
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
    // ring-bounded LSH-init A/B (r16 ScaleLab: the uncapped
    // bucket-mate self-join is quadratic in corpus size — twice
    // ENOSPC at x100): recall@5 at initPairCap ∈ {∞, 256, 64} — the
    // REGISTERED op ships cap = GraphInitPairCap = 64 since r17 (the
    // linear-regime init, oracle regenerated from the constant); ∞
    // is the small-corpus dial. The measured ∞-vs-64 recall parity
    // here is what licensed the flip.
    for (cap <- Seq(Int.MaxValue, 256, 64) if sections("initcap")) {
      val t0 = System.nanoTime()
      val rows = Similarity.annGraphBeam(spark, dir, Similarity.BeamWidth,
        initPairCap = cap).collect()
      val sec = (System.nanoTime() - t0) / 1e9
      val recall = brute.intersect(
        rows.map(r => (r.getLong(0), r.getLong(2))).toSet).size.toDouble / brute.size
      val capLabel = if (cap == Int.MaxValue) "inf" else cap.toString
      println(f"GRAPHANN_INITCAP cap=$capLabel%s cold=$sec%.1f recall=$recall%.3f")
      sweep()
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
    // graph state-strategy A/B (r15, the KcoreMode transfer): each
    // descent round references its graph 6× and the beam hops re-read
    // the final graph — persist (cached plan, pre-r15) vs ckpt (eager
    // localCheckpoint → LogicalRDD leaf). Parity first, then
    // interleaved cold timings of the WHOLE operator per mode.
    if (sections("state")) {
      val ref = Similarity.neighborGraphCapped(spark, dir, Similarity.GraphDeg, "persist")
      val cand = Similarity.neighborGraphCapped(spark, dir, Similarity.GraphDeg, "ckpt")
      val d1 = ref.exceptAll(cand).count()
      val d2 = cand.exceptAll(ref).count()
      require(d1 == 0 && d2 == 0, s"graph ckpt diverges: $d1/$d2 rows")
      println("GRAPHANN_STATE parity ckpt OK")
      sweep()
      for (rep <- 1 to 3; m <- Seq("persist", "ckpt")) {
        val t0 = System.nanoTime()
        Similarity.annGraphBeam(spark, dir, Similarity.BeamWidth, graphMode = m).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"GRAPHANN_STATE mode=$m%-8s rep=$rep%d cold=$sec%.1f")
        sweep()
      }
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
