package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: same-JVM repeated timing of registered queries (machine
  * noise across sbt invocations is ±25%, so only same-JVM A/Bs are
  * trustworthy). Usage:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.Timing dedup_minhash"
  * Prints 3 runs per query: run1 includes plan/codegen/broadcast
  * first-run costs (what Bench charges), run3 approximates steady
  * state. */
object Timing {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    SparkEntry.queries("wordcount")(spark, dir).count()
    for (n <- args; i <- 1 to 3) {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).count()
      println(f"TIMING $n run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
