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
    * under-parallelizes. Applied ONLY to the tables whose consumers
    * are compute-bound (documents: shingling/fingerprinting;
    * embeddings: LSH keys/cosine) — for scan-and-aggregate tables the
    * exchange costs more than the single-task scan (measured:
    * whole-suite A/B at sf0.1 regressed 20% with every fact table
    * fanned out). The round-robin exchange moves the raw rows once;
    * every downstream result is partitioning-invariant (the oracle
    * gate proves it).
    *
    * The gate is the number of LOADABLE tasks, not the planned split
    * count (r18 fix). Spark sizes file splits by
    * `totalBytes / defaultParallelism`, so a mid-size single file
    * plans ~cores nominal splits — but a parquet row group is read
    * only by the split containing its midpoint, so a one-row-group
    * 76 MB file runs 21 planned tasks of which 20 are EMPTY and one
    * does all the work (measured: the whole span-build pipeline
    * serial, wall ≈ Σ task runtime, while the old planned-count
    * check read 21 ≥ cores/2 and skipped the fan-out). Row-group
    * counts come from the parquet footers; footers are read only
    * when the file count alone can't prove parallelism (< cores/2
    * files), so at production scale — thousands of files — this
    * costs nothing and the fan-out is a no-op. */
  private val scanParts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  private def fanOut(df: DataFrame, cacheKey: String): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val floor = math.max(2, target / 2)
    // loadable-task upper bound, cached per (path, cores): operators
    // call these accessors several times per query (dedupMinhash
    // reads documents three times) and would otherwise pay
    // analyzer/planner + footer reads on the driver for each call
    val n = scanParts.computeIfAbsent(s"$cacheKey#$target", { _ =>
      // planned splits bound loadable tasks from above...
      val planned = df.rdd.getNumPartitions
      val files = df.inputFiles
      if (planned < floor || files.length >= floor) planned
      else {
        // ...but with few files the real bound is Σ row groups: read
        // the (< cores/2) footers rather than trust nominal splits
        val conf = spark.sparkContext.hadoopConfiguration
        val groups = files.map { f =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(new org.apache.hadoop.fs.Path(f), conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try r.getRowGroups.size finally r.close()
        }.sum
        math.min(planned, groups)
      }
    })
    if (n < floor) df.repartition(target) else df
  }

  def region(spark: SparkSession, dir: String): DataFrame    = t(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = t(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = t(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = t(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "lineitem")
  /** Schema-ADAPTIVE events loader. The fixture's physical `ts` type
    * has drifted across driver regenerations (TIMESTAMP(NANOS) through
    * r9, timestamp[us] as of 2026-08-13) — an engine must bind to the
    * schema it reads, not a remembered physical type. The legacy nanos
    * conf is set before the scan so a NANOS file surfaces as LongType
    * instead of failing schema inference; the flag only widens what a
    * scan ACCEPTS and is a no-op for real-timestamp files, so the
    * session-sticky set is idempotent and harmless either way.
    * Whatever is on disk, callers always see `ts: TimestampType`.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeEventsTs(eventsRaw(spark, dir))

  /** The Spark schema the events parquet presents on disk (nanos-era
    * files surface `ts` as LongType, see [[eventsRaw]]). Streaming
    * readers need this up front: `readStream` requires an explicit
    * schema, and hard-coding one is exactly the fixture-drift failure
    * mode this replaces. */
  private[graft] def eventsDiskSchema(spark: SparkSession, dir: String): org.apache.spark.sql.types.StructType =
    eventsRaw(spark, dir).schema

  /** Scan the events parquet as-is. A TIMESTAMP(NANOS) file fails
    * Spark schema inference outright ("Illegal Parquet type"), so on
    * that specific failure — and ONLY then — the legacy nanos-as-long
    * conf is enabled and the scan retried (VERDICT r10 item 6: the
    * conf must sit behind the schema check, not be set sticky on
    * every load). The conf only widens what a scan accepts, so
    * leaving it on afterwards cannot change any other plan. */
  private def eventsRaw(spark: SparkSession, dir: String): DataFrame =
    try t(spark, dir, "events")
    catch {
      case e: org.apache.spark.sql.AnalysisException
          if Option(e.getMessage).exists(_.contains("Illegal Parquet type")) =>
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        t(spark, dir, "events")
    }

  /** Normalize an events scan's `ts` to TimestampType regardless of
    * the physical type read: epoch-nanos longs convert with integral
    * `div` (epoch-nanos exceed double's 53-bit mantissa — float
    * division is off by up to ±1 µs); TIMESTAMP_NTZ casts (the session
    * timezone is UTC everywhere in this engine, so the cast is
    * value-exact); a real TimestampType passes through. Anything else
    * fails loudly with a fixture-drift message instead of 37 queries
    * dying downstream (the round-10 incident). */
  private[graft] def normalizeEventsTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df
      case other => throw new IllegalStateException(
        s"events.ts has unsupported physical type $other — fixture drift; " +
          "teach Tables.normalizeEventsTs the new type")
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame =
    fanOut(t(spark, dir, "documents"), s"$dir/documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    fanOut(t(spark, dir, "embeddings"), s"$dir/embeddings")
}
