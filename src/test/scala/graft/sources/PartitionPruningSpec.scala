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
}
