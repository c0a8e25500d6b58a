package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.CacheScope

/** Dev-side stage attribution for ann_index / ann_index_add (the
  * registry's top two ops after the r15 graph fixes) — `sbt
  * "Test/runMain graft.operators.IndexLab [stages|cold ...]"`.
  *
  * The r13 file-sizing dial was measured and REJECTED (coalescing
  * the cells/codes writes moved 5.3+6.7 s → 5.4+7.2 s); this lab
  * asks WHERE the remaining wall actually goes, stage by stage,
  * replicating [[SimilarityPqIndex.annIndexBuildOn]]'s body with a
  * timer per artifact: seed slices (driver metadata), the Lloyd
  * round (one distributed scan + tiny collect), PQ codebook training
  * (same shape, 16k lattice ops/vector), the cells write (scan +
  * 16-cell argmax/vector), the codes write (scan + 8×256-code
  * argmin/vector), then the stored-index search. Like
  * GRAPHANN_STAGES, each stage is forced by its own action so the
  * SUM overshoots the cold op — the RATIOS are the signal. Not
  * shipped; informs whether a dial exists or the op is at its
  * contract floor. */
object IndexLab {
  def main(args: Array[String]): Unit = {
    val sections: Set[String] =
      if (args.isEmpty) Set("stages", "cold") else args.toSet
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def sweep(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      CacheScope.release(blocking = true)
    }
    def t(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    if (sections("stages")) {
      // throwaway scan so rep 1's first stage doesn't absorb JVM +
      // parquet-footer warmup; two reps for steady state
      graft.sources.Tables.embeddings(spark, dir).count()
      for (rep <- 1 to 2) {
      val root = graft.sources.TempDirs.scratch("indexlab", dir)
      var cents: Array[(Int, Array[Double])] = null
      val wSeed = t { cents = Similarity.seedCentroids(spark, dir) }
      val wLloyd = t { cents = Similarity.lloydRound(spark, dir, cents) }
      var cb: Array[Array[Array[Long]]] = null
      val wCb = t { cb = Similarity.pqCodebook(spark, dir) }
      val wCentWrite = t {
        cents.toSeq.flatMap { case (cell, arr) =>
          arr.iterator.zipWithIndex.map { case (v, d) => (cell, d, v) } }
          .toDF("cell", "d", "cv")
          .coalesce(1).write.mode("overwrite").parquet(s"$root/centroids")
      }
      val wCbWrite = t {
        (for { s <- 0 until Similarity.NSub; c <- 0 until Similarity.NCodes
               d <- 0 until Similarity.SubDim }
          yield (s, c, d, cb(s)(c)(d)))
          .toDF("s", "c", "d", "cbq")
          .coalesce(1).write.mode("overwrite").parquet(s"$root/codebook")
      }
      val e = graft.sources.Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      val centsF = cents
      val cbF = cb
      val wCells = t {
        e.map(r => (r._1, Similarity.nearestCells(centsF, r._2, 1).head))
          .toDF("nid", "cell")
          .write.mode("overwrite").parquet(s"$root/cells")
      }
      val wCodes = t {
        e.flatMap { case (nid, v) =>
          Similarity.pqCodesOf(v, cbF).iterator.zipWithIndex
            .map { case (c, s) => (nid, s, c) } }
          .toDF("nid", "s", "c")
          .write.mode("overwrite").parquet(s"$root/codes")
      }
      val wSearch = t {
        Similarity.annIndexSearchN(spark, dir, root, Similarity.NQueries).count()
      }
      println(f"INDEXLAB_STAGES rep=$rep%d seed=$wSeed%.1f lloyd=$wLloyd%.1f cb=$wCb%.1f " +
        f"centWrite=$wCentWrite%.1f cbWrite=$wCbWrite%.1f " +
        f"cells=$wCells%.1f codes=$wCodes%.1f search=$wSearch%.1f")
      sweep()
      }
    }

    // job-machinery attribution for the search tail: a stored-index
    // search moves ≤1.2M tiny rows, so if it still costs seconds the
    // wall must be per-job fixed machinery — count jobs/stages/tasks
    // over one warm search to confirm (the floor-note evidence)
    if (sections("jobs")) {
      // build once (untimed) into the op's own scratch, then measure
      // the search alone
      val root = Similarity.annIndexBuild(spark, dir)
      Similarity.annIndexSearchN(spark, dir, root, Similarity.NQueries).count() // warm
      val jobs = new java.util.concurrent.atomic.AtomicInteger
      val stages = new java.util.concurrent.atomic.AtomicInteger
      val tasks = new java.util.concurrent.atomic.AtomicInteger
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
        override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          stages.incrementAndGet(); tasks.addAndGet(s.stageInfo.numTasks)
        }
      }
      spark.sparkContext.addSparkListener(l)
      val sec = t { Similarity.annIndexSearchN(spark, dir, root, Similarity.NQueries).count() }
      Thread.sleep(1000) // let the async listener bus drain
      spark.sparkContext.removeSparkListener(l)
      println(f"INDEXLAB_JOBS searchWarm=$sec%.1f jobs=${jobs.get}%d stages=${stages.get}%d tasks=${tasks.get}%d")
      sweep()
    }

    if (sections("cold")) {
      for (rep <- 1 to 2) {
        val cIdx = t { Similarity.annIndex(spark, dir).count() }
        sweep()
        val cAdd = t { Similarity.annIndexAdd(spark, dir).count() }
        sweep()
        println(f"INDEXLAB_COLD rep=$rep%d ann_index=$cIdx%.1f ann_index_add=$cAdd%.1f")
      }
    }
    spark.stop()
  }
}
