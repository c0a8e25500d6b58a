package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table loaders (TESTDATA.md / FIXTURES.md §2).
  *
  * One accessor per driver-generated parquet table. All engine
  * operators take `(spark, sfDir)` and resolve their inputs here, so
  * the scan always goes through the vectorized parquet reader and any
  * per-table read options stay in one place.
  *
  * At 100 TB each of these becomes a partitioned table (or catalog
  * reference); only this file changes — operators are written against
  * DataFrames, not paths.
  */
object Tables {
  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Fan CPU-heavy pipelines out to every core when the scan
    * under-partitions. Parquet splits only at row-group boundaries,
    * and the fixture files are single-row-group — so without this,
    * an entire tokenize/shingle/hash pipeline (narrow, pipelined with
    * the scan) runs on ONE task no matter how many cores the session
    * has. Applied ONLY to the tables whose consumers are
    * compute-bound (documents: shingling/fingerprinting; embeddings:
    * LSH keys/cosine) — for scan-and-aggregate tables the exchange
    * costs more than the single-task scan (measured: whole-suite A/B
    * at sf0.1 regressed 20% with every fact table fanned out). The
    * check is on the PLANNED scan partitioning, not data size: at
    * production scale a table yields ≥ cores partitions and this is a
    * no-op, so no gratuitous shuffle survives the scale-up. The
    * round-robin exchange moves the raw rows once; every downstream
    * result is partitioning-invariant (the oracle gate proves it). */
  private val scanParts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  private def fanOut(df: DataFrame, cacheKey: String): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // df.rdd builds a full QueryExecution just to read the planned
    // partition count — cache it per (path, cores): operators call
    // these accessors several times per query (dedupMinhash reads
    // documents three times) and would otherwise pay analyzer+planner
    // on the driver for each call
    val n = scanParts.computeIfAbsent(s"$cacheKey#$target", _ => df.rdd.getNumPartitions)
    if (n < math.max(2, target / 2)) df.repartition(target) else df
  }

  def region(spark: SparkSession, dir: String): DataFrame    = t(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = t(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = t(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = t(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "lineitem")
  /** The events fixture stores `ts` as parquet TIMESTAMP(NANOS), which
    * Spark's TimestampType (microseconds) refuses by default. Read the
    * nanos as a long (legacy conf) and convert; the fixture has no
    * sub-microsecond components (verified), so the conversion is exact.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // intentionally session-sticky: the legacy flag only widens what a
    // scan ACCEPTS (nanos as long), never changes an existing plan, so
    // re-setting it per call is an idempotent no-op
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // integral `div`, NOT `/`: epoch-nanos exceed double's 53-bit
    // mantissa, so float division is off by up to ±1 µs
    t(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame =
    fanOut(t(spark, dir, "documents"), s"$dir/documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    fanOut(t(spark, dir, "embeddings"), s"$dir/embeddings")
}
