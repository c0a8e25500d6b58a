package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.CacheScope

/** Dev-side interleaved A/B for [[Graph.jaccardNeighbors]]' shared-
  * relation state strategy — the DAG (non-loop) test of the r15
  * ckpt-vs-persist question: does the eager-localCheckpoint win
  * depend on LOOP structure, or only on the REFERENCE COUNT of the
  * materialized relation? jaccard_neighbors references its (c, p)
  * relation 5× in one plan with no iteration, so it isolates the
  * reference-count mechanism. Protocol as KcoreLab: exceptAll-parity
  * both directions FIRST, modes interleaved within each rep. Not
  * shipped; its numbers decide [[Graph.JaccMode]]. */
object JaccLab {
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

    def jaccWith(mode: String): DataFrame =
      Graph.jaccardNeighborsOn(spark, dir, mode)

    if (sections("parity")) {
      val ref = jaccWith("persist")
      val cand = jaccWith("ckpt")
      val d1 = ref.exceptAll(cand).count()
      val d2 = cand.exceptAll(ref).count()
      require(d1 == 0 && d2 == 0, s"jacc ckpt diverges: $d1/$d2 rows")
      println("JACCLAB parity ckpt OK")
      sweep()
    }

    if (sections("time")) {
      // throwaway warmup so rep 1's first mode doesn't absorb JVM +
      // parquet-footer setup
      jaccWith("persist").count(); sweep()
      for (rep <- 1 to 3; m <- Seq("persist", "ckpt")) {
        val t0 = System.nanoTime()
        jaccWith(m).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"JACCLAB mode=$m%-8s rep=$rep%d cold=$sec%.1f")
        sweep()
      }
    }
    spark.stop()
  }
}
