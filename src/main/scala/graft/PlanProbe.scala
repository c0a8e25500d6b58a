package graft
import org.apache.spark.sql.SparkSession
/** Dev-only plan inspector: print the executed plan of one registered
  * query against the sf0.001 fixtures — the standalone form of the
  * PlanAuditSpec harness, for iterating on an operator's physical
  * shape without running the suite.
  * Usage: sbt "runMain graft.PlanProbe <query_name>" */
object PlanProbe {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(SparkEntry.queries(a(0))(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString)
    spark.stop()
  }
}
