package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-off license for the r18 ann_graph ring-init rework: the OLD
  * init (ring pairs → global distinct → top-M) reconstructed inline,
  * compared set-exactly at the top-M GRAPH level against the shipped
  * per-(table, src) pre-ranked init on the staged corpora. The
  * descent rounds are a pure function of the init graph, so init
  * parity ⇒ operator parity (the sf0.01 oracle replay gates the full
  * pipeline independently). */
object GraphInitParityLab {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/graft_scalelab/x10")
    for (dir <- dirs) {
      val e = graft.sources.Tables.embeddings(spark, dir)
      val eH = Similarity.vecHinted(e)
      val tagged = Similarity.tableKeys(spark, dir)
      val cap = Similarity.GraphInitPairCap
      val deg = Similarity.GraphDeg
      def topM(cand: org.apache.spark.sql.DataFrame) = {
        val scored = cand
          .join(eH.select(col("vec_id").as("src"), col("embedding").as("se")), "src")
          .join(eH.select(col("vec_id").as("dst"), col("embedding").as("de")), "dst")
          .withColumn("cos", graft.functions.VectorFunctions.cosine_sim(col("se"), col("de")))
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
      // OLD: global pair distinct, then top-M
      val oldCand = fwdp.select("src", "dst")
        .union(fwdp.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
      // NEW (shipped shape): per-(table, src) pre-rank, winner dedup
      val dirPairs = fwdp.union(
        fwdp.select(col("table_idx"), col("dst").as("src"), col("src").as("dst")))
      val scoredT = dirPairs
        .join(eH.select(col("vec_id").as("src"), col("embedding").as("se")), "src")
        .join(eH.select(col("vec_id").as("dst"), col("embedding").as("de")), "dst")
        .withColumn("cos", graft.functions.VectorFunctions.cosine_sim(col("se"), col("de")))
      val wT = Window.partitionBy(col("table_idx"), col("src"))
        .orderBy(col("cos").desc, col("dst").asc)
      val newCand = scoredT.withColumn("rt", row_number().over(wT))
        .filter(col("rt") <= deg).select(col("src"), col("dst")).distinct()
      val old = topM(oldCand).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val neu = topM(newCand).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"GRAPHINITPARITY dir=$dir old=${old.size} new=${neu.size} " +
        s"old-minus-new=${(old -- neu).size} new-minus-old=${(neu -- old).size}")
      spark.catalog.clearCache()
      graft.CacheScope.release(blocking = true)
    }
    spark.stop()
  }
}
