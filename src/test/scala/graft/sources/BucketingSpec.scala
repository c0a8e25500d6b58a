package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Substantiates the README's bucketing claim: tables bucketed on the
  * join key join WITHOUT a shuffle — the plan must contain no Exchange
  * on either side. This is the 100 TB co-location technique (pay the
  * shuffle once at write time, never again per query); the spec proves
  * the engine's operators actually benefit, not just that the API
  * exists.
  */
class BucketingSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = {
    val wh = Files.createTempDirectory("graft_warehouse").toString
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.sql.ui.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force the shuffle path to show
      .getOrCreate()
  }

  /** The warehouse config above only applies if THIS suite creates the
    * session; when an earlier suite in the same JVM got there first,
    * saveAsTable targets whatever warehouse that session resolved —
    * possibly with a stale table directory from a prior run
    * (LOCATION_ALREADY_EXISTS). Drop the catalog entry AND the
    * physical location before writing. */
  private def resetTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir"))
    val loc = new java.io.File(
      if (wh.getScheme == null) wh.toString else new java.io.File(wh).toString, name)
    if (loc.exists()) {
      import scala.reflect.io.Directory
      new Directory(loc).deleteRecursively()
    }
  }

  test("bucketed fact tables join with zero exchanges") {
    resetTable("orders_b")
    resetTable("lineitem_b")
    Tables.orders(spark, dir).write
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_b")
    Tables.lineitem(spark, dir).write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("lineitem_b")

    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan.toString
    val joinExchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(joinExchanges <= 1, s"expected no join-side exchanges, plan:\n$plan")
    // only the final 1-group aggregation may exchange; the join itself must not
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))

    // and the result matches the unbucketed join
    val want = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === want)
  }
}
