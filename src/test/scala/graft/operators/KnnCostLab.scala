package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cost decomposition for knn_join's capped pipeline at the staged
  * 100× corpus: (1) ring-pair generation alone, (2) + the global
  * pair distinct, (3) the full registered op — so a redesign targets
  * the measured dominant term, not a guess. */
object KnnCostLab {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/tmp/graft_scalelab/x100")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"KNNCOST $label%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  -> $r")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      graft.CacheScope.release(blocking = true)
      System.gc(); Thread.sleep(300)
      r
    }
    def rawPairs = {
      val tagged = Similarity.tableKeys(spark, dir)
      val wB = Window.partitionBy(col("table_idx"), col("table_key"))
        .orderBy(col("vec_id"))
      val ranked = tagged.withColumn("rn", row_number().over(wB))
      val fwdp = ranked.as("a").join(ranked.as("b"),
          col("a.table_idx") === col("b.table_idx") &&
            col("a.table_key") === col("b.table_key") &&
            col("b.rn") > col("a.rn") &&
            col("b.rn") <= col("a.rn") + Similarity.KnnBucketCap)
        .select(col("a.vec_id").as("qid"), col("b.vec_id").as("nid"))
      fwdp.union(fwdp.select(col("nid").as("qid"), col("qid").as("nid")))
    }
    t("raw_pairs")(rawPairs.count())
    t("raw_pairs_rep2")(rawPairs.count())
    t("distinct_pairs")(rawPairs.distinct().count())
    t("distinct_pairs_rep2")(rawPairs.distinct().count())
    t("full_knn_join")(graft.SparkEntry.queries("knn_join")(spark, dir).count())
    t("full_knn_join_rep2")(graft.SparkEntry.queries("knn_join")(spark, dir).count())
    spark.stop()
  }
}
