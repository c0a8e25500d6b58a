package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.cosine_sim

/** Staged-scale license for the r18 neighbor-graph DESCENT rework
  * (the GraphInitParityLab pattern): the OLD descent (union → global
  * (src, dst) distinct → top-M) reconstructed inline over the SAME
  * ring init, compared set-exactly at the graph level against the
  * shipped in-window-dedup construction on the fixture and the
  * staged x10 corpus. `sbt "Test/runMain
  * graft.operators.GraphDescentParityLab [dirs...]"` (stage /tmp
  * corpora with ScaleLab gen first). GraphDescentParitySpec pins the
  * same invariant in CI at sf0.01. */
object GraphDescentParityLab {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/graft_scalelab/x10")
    for (dir <- dirs) {
      val eH = Similarity.vecHinted(graft.sources.Tables.embeddings(spark, dir))
      val tagged = Similarity.tableKeys(spark, dir)
      val cap = Similarity.GraphInitPairCap
      val deg = Similarity.GraphDeg
      def topMOld(cand: DataFrame): DataFrame = {
        val scored = cand
          .join(eH.select(col("vec_id").as("src"), col("embedding").as("se")), "src")
          .join(eH.select(col("vec_id").as("dst"), col("embedding").as("de")), "dst")
          .withColumn("cos", cosine_sim(col("se"), col("de")))
        val w = Window.partitionBy(col("src")).orderBy(col("cos").desc, col("dst").asc)
        scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= deg)
          .select("src", "dst")
      }
      val wB = Window.partitionBy(col("table_idx"), col("table_key"))
        .orderBy(col("vec_id"))
      val ranked = tagged.withColumn("rn", row_number().over(wB))
      val fwdp = ranked.as("a").join(ranked.as("b"),
          col("a.table_idx") === col("b.table_idx") &&
            col("a.table_key") === col("b.table_key") &&
            col("b.rn") > col("a.rn") &&
            col("b.rn") <= col("a.rn") + cap)
        .select(col("a.table_idx").as("table_idx"),
          col("a.vec_id").as("src"), col("b.vec_id").as("dst"))
      val dirPairs = fwdp.union(
        fwdp.select(col("table_idx"), col("dst").as("src"), col("src").as("dst")))
      val scoredT = dirPairs
        .join(eH.select(col("vec_id").as("src"), col("embedding").as("se")), "src")
        .join(eH.select(col("vec_id").as("dst"), col("embedding").as("de")), "dst")
        .withColumn("cos", cosine_sim(col("se"), col("de")))
      val wT = Window.partitionBy(col("table_idx"), col("src"))
        .orderBy(col("cos").desc, col("dst").asc)
      val cand0 = scoredT.withColumn("rt", row_number().over(wT))
        .filter(col("rt") <= deg).select(col("src"), col("dst")).distinct()
      var gOld = graft.StateMode.cut(topMOld(cand0))
      for (_ <- 1 to Similarity.DescentRounds) {
        val fwd = gOld.as("a").join(gOld.as("b"),
            col("a.dst") === col("b.src") && col("a.src") =!= col("b.dst"))
          .select(col("a.src").as("src"), col("b.dst").as("dst"))
        val rev = gOld.select(col("dst").as("src"), col("src").as("dst"))
        val co = gOld.as("a").join(gOld.as("b"),
            col("a.src") === col("b.src") && col("a.dst") =!= col("b.dst"))
          .select(col("a.dst").as("src"), col("b.dst").as("dst"))
        gOld = graft.StateMode.cut(
          topMOld(gOld.union(fwd).union(rev).union(co).distinct()))
      }
      val old = gOld.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val neu = Similarity.neighborGraph(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"GRAPHDESCENTPARITY dir=$dir old=${old.size} new=${neu.size} " +
        s"old-minus-new=${(old -- neu).size} new-minus-old=${(neu -- old).size}")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      graft.CacheScope.release(blocking = true)
    }
    spark.stop()
  }
}
