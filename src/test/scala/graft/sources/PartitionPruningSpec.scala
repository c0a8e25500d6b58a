package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition pruning — the single most important 100 TB scan
  * optimization: a table laid out as `lang=<v>/...` directories must
  * let a `lang = 'en'` filter skip every other directory at PLANNING
  * time (PartitionFilters on the scan), not read-and-discard. This
  * spec writes the documents fixture partitioned by lang, proves the
  * filter lands in PartitionFilters (not PushedFilters — it never
  * reaches row-group evaluation at all), and that results match the
  * unpartitioned read. */
class PartitionPruningSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("lang-partitioned layout prunes non-matching directories at plan time") {
    val out = Files.createTempDirectory("graft_part").toString + "/docs"
    Tables.documents(spark, dir).write
      .partitionBy("lang").mode("overwrite").parquet(out)

    val langs = new java.io.File(out).list().count(_.startsWith("lang="))
    assert(langs >= 2, s"fixture should span several langs, saw $langs")

    val q = spark.read.parquet(out).filter(col("lang") === "en")
      .select(col("doc_id"), col("n_chars"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), plan.linesIterator.take(12).mkString("\n"))

    // pruned read equals the filtered unpartitioned read
    val got = q.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Tables.documents(spark, dir).filter(col("lang") === "en")
      .select(col("doc_id"), col("n_chars"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("DYNAMIC partition pruning: a filtered dim prunes the fact scan at runtime") {
    import spark.implicits._
    // the static test's sibling: here the partition filter is NOT a
    // literal in the query — it arrives at RUNTIME from the broadcast
    // side of a join (Spark's DPP subquery), the star-schema shape
    // where a dim predicate must keep a 100 TB fact from full-scanning
    val out = Files.createTempDirectory("graft_dpp").toString + "/events"
    Tables.events(spark, dir).write
      .partitionBy("event_type").mode("overwrite").parquet(out)
    val types = new java.io.File(out).list().count(_.startsWith("event_type="))
    assert(types >= 3, s"fixture should span several event types, saw $types")

    // dim: event_type → category; the query filters on CATEGORY, so
    // only the join can tell the scan which partitions survive. The
    // dim must be a real datasource: as a LocalRelation the category
    // filter constant-folds into the literal rows and DPP sees no
    // selective predicate to subquery on (measured — no
    // dynamicpruning in that plan)
    val dimOut = Files.createTempDirectory("graft_dpp_dim").toString + "/dim"
    Tables.events(spark, dir).select(col("event_type")).distinct()
      .as[String].collect().sorted
      .map(t => (t, if (t == "click" || t == "view") "browse" else "act"))
      .toSeq.toDF("event_type", "category")
      .write.mode("overwrite").parquet(dimOut)
    val dim = spark.read.parquet(dimOut)
    val q = spark.read.parquet(out)
      .join(broadcast(dim), "event_type")
      .filter(col("category") === "browse")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
    val got = q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // assert on the FINAL adaptive plan (pre-execution AQE renders the
    // subquery as SubqueryAdaptiveBroadcast and isFinalPlan=false)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruningexpression"),
      s"fact scan lacks the DPP subquery filter:\n${plan.linesIterator.take(20).mkString("\n")}")
    assert(plan.contains("SubqueryBroadcast") || plan.contains("SubqueryAdaptiveBroadcast"),
      "DPP should reuse the join's broadcast for the pruning subquery")
    val want = Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "view"))
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === want)
    assert(got.nonEmpty)
  }
}
