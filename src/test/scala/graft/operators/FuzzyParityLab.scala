package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off license for the r18 dedup_fuzzy verify rework: the OLD
  * shape (candidate distinct → key attach joins → full levenshtein)
  * reconstructed from the still-exposed candidates API, compared
  * set-exactly to the shipped verify-in-join-stage path on the staged
  * 10×/100× replica corpora. Driver-side set compare (collect) —
  * combining both plans in one exceptAll trips
  * DUPLICATED_METRICS_NAME on the shared fuzzy_hot_grams observe. */
object FuzzyParityLab {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- Seq("/tmp/graft_scalelab/x10", "/tmp/graft_scalelab/x100")) {
      val docs = graft.sources.Tables.documents(spark, d)
      val n = docs.select(col("doc_id"), Dedup.fuzzyKey(col("text")).as("t"))
      val old = Dedup.dedupFuzzyCandidatesOn(docs)
        .join(n.select(col("doc_id").as("doc_a"), col("t").as("ta")), "doc_a")
        .join(n.select(col("doc_id").as("doc_b"), col("t").as("tb")), "doc_b")
        .withColumn("dist", levenshtein(col("ta"), col("tb")).cast("long"))
        .filter(col("dist") <= Dedup.FuzzyK)
        .select(col("doc_a"), col("doc_b"), col("dist"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val neu = Dedup.dedupFuzzyOn(docs)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      println(s"FUZZYPARITY dir=$d old=${old.size} new=${neu.size} " +
        s"old-minus-new=${(old -- neu).size} new-minus-old=${(neu -- old).size}")
    }
    spark.stop()
  }
}
