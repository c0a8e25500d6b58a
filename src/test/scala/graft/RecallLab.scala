package graft

import org.apache.spark.sql.SparkSession

import graft.operators.Similarity

/** Dev-side recall measurement across SFs and operating points —
  * `sbt "Test/runMain graft.RecallLab"`. Not shipped; the asserted
  * floors live in PipelineOpsSpec.
  */
object RecallLab {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val brute = Similarity.annTopkBrute(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSet
      def recallOf(rows: Array[org.apache.spark.sql.Row]): Double =
        brute.intersect(rows.map(r => (r.getLong(0), r.getLong(2))).toSet).size.toDouble / brute.size
      for (np <- Seq(4, 6, 8)) {
        val t0 = System.nanoTime()
        val ivf = Similarity.annIvfProbe(spark, dir, np).collect()
        println(f"$sf ivf(nprobe=$np): recall=${recallOf(ivf)}%.3f  ${(System.nanoTime()-t0)/1e9}%.1fs")
      }
      val t0 = System.nanoTime()
      val pq = Similarity.annPq(spark, dir).collect()
      println(f"$sf pq: recall=${recallOf(pq)}%.3f  ${(System.nanoTime()-t0)/1e9}%.1fs")
      val t1 = System.nanoTime()
      val ivfpq = Similarity.annIvfPq(spark, dir).collect()
      println(f"$sf ivfpq: recall=${recallOf(ivfpq)}%.3f  ${(System.nanoTime()-t1)/1e9}%.1fs")
    }
    spark.stop()
  }
}
