package graft.operators

import org.apache.spark.sql.SparkSession

/** Cost decomposition for simjoin_prefix at the staged 100× corpus:
  * candidate generation alone vs the full op — so the verify rework
  * targets the measured dominant term. */
object SimjoinCostLab {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/tmp/graft_scalelab/x100")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"SIMJOINCOST $label%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s  -> $r")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      graft.CacheScope.release(blocking = true)
      System.gc(); Thread.sleep(300)
      r
    }
    t("candidates")(Dedup.simjoinPrefixCandidates(spark, dir).count())
    t("candidates_rep2")(Dedup.simjoinPrefixCandidates(spark, dir).count())
    t("full_op")(graft.SparkEntry.queries("simjoin_prefix")(spark, dir).count())
    t("full_op_rep2")(graft.SparkEntry.queries("simjoin_prefix")(spark, dir).count())
    spark.stop()
  }
}
