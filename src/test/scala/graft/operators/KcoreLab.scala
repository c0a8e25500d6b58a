package graft.operators
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.CacheScope.ScopedDataset
object KcoreLab {
  def variantNoKeepPersist(edgesIn: DataFrame, k: Int, rounds: Int): DataFrame = {
    var edges = edgesIn.persistScoped()
    for (_ <- 1 to rounds) {
      val keep = edges.groupBy(col("u")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("u").as("id"))
      edges = edges
        .join(keep, edges("u") === keep("id"), "left_semi")
        .join(keep, edges("v") === keep("id"), "left_semi")
        .persistScoped()
    }
    edges.groupBy(col("u").as("id")).agg(count(lit(1)).as("deg"))
  }
  def variantNoEdgePersist(edgesIn: DataFrame, k: Int, rounds: Int): DataFrame = {
    var edges = edgesIn.persistScoped()
    for (_ <- 1 to rounds) {
      val keep = edges.groupBy(col("u")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("u").as("id")).persistScoped()
      edges = edges
        .join(keep, edges("u") === keep("id"), "left_semi")
        .join(keep, edges("v") === keep("id"), "left_semi")
    }
    edges.groupBy(col("u").as("id")).agg(count(lit(1)).as("deg"))
  }
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(tag: String)(f: => DataFrame): Unit = {
      // warm + 2 timed
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = f.count()
        graft.CacheScope.release(); spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        if (i > 1) println(f"$tag run$i: ${(System.nanoTime()-t0)/1e9}%.2f s (rows $n)")
      }
    }
    time("shipped")(Graph.kcore(spark, dir))
    time("noKeepPersist")(KcoreLab.variantNoKeepPersist(Graph.purchaseEdges(spark, dir), 3, 4))
    time("noEdgePersist")(KcoreLab.variantNoEdgePersist(Graph.purchaseEdges(spark, dir), 3, 4))
    spark.stop()
  }
}
