package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.streaming.EventStream

/** Batch entries for the streaming-shaped operators, wired into the
  * driver contract. The same declarative plans also run under
  * `readStream` (EventStreamSpec proves stream parity); registering
  * them on the batch table gives each a real DuckDB oracle.
  *
  * `sessionize` runs the gaps-and-islands window formulation — the
  * scale-safe batch plan (spilling sorts, no per-user in-memory
  * buffering); the stateful flatMapGroupsWithState operator remains
  * the streaming path and is asserted equal in EventStreamSpec. */
object StreamOps {

  /** Gaps-and-islands sessionization (batch window formulation) —
    * the scale-safe plan; asserted equal to the stateful streaming
    * operator in EventStreamSpec. */
  def sessionize(spark: SparkSession, dir: String): DataFrame =
    EventStream.sessionizeBatchWindowed(spark, dir)
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("sum_value"))

  /** Structured Streaming tumbling-window event counts with
    * watermark, drained via [[EventStream]]'s replay harness. */
  def streamWindowCounts(spark: SparkSession, dir: String): DataFrame =
    EventStream.windowedTypeCounts(
      graft.sources.Tables.events(spark, dir))

  /** Sliding-window (overlapping) per-user activity — each event
    * lands in every covering window pane. */
  def streamSlidingActivity(spark: SparkSession, dir: String): DataFrame =
    EventStream.slidingUserActivity(
      graft.sources.Tables.events(spark, dir))

  /** View→click attribution — stream-stream interval join inside
    * the watermark bound. */
  def streamAttribution(spark: SparkSession, dir: String): DataFrame =
    EventStream.viewClickAttribution(
      graft.sources.Tables.events(spark, dir))

  /** Latest-record-wins compaction — the batch half of CDC/upsert
    * ingestion (merge-on-read): one surviving row per (user_id,
    * event_type), the one with the greatest (ts, event_id). The
    * row_number ≤ 1 form plans WindowGroupLimit, so each map task
    * forwards at most one row per key to the exchange — at 100 TB the
    * shuffle carries ~|keys| rows, not the event history. The same
    * keep-latest contract runs incrementally as a streaming
    * aggregation (EventStream's stateful ops); this registered batch
    * form is the compaction a table maintenance job runs. */
  def compactLatest(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.row_number
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts").desc, col("event_id").desc)
    graft.sources.Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_type", "event_id", "ts", "value")
  }

  /** Spark's NATIVE session_window() operator — the third sessionize
    * engine path beside the gaps-and-islands windows (`sessionize`)
    * and the stateful flatMapGroupsWithState form (EventStreamSpec):
    * the same 30-minute-gap semantics, planned as Spark's dedicated
    * SessionWindow aggregation (merging session state in the
    * aggregate, one exchange on user — no per-user sort window
    * chain), and the operator that runs UNCHANGED under readStream
    * with a watermark. Contract note the oracle encodes: the native
    * window's end = last event + gap, so `session_end` here is the
    * gap-extended bound, not the last event ts. */
  def sessionNative(spark: SparkSession, dir: String): DataFrame =
    sessionNativeOf(graft.sources.Tables.events(spark, dir))

  /** Input-generic form: the SAME plan aggregates a batch DataFrame
    * or a watermarked stream (EventStreamSpec proves replay parity —
    * the watermark is a no-op on batch, required for append on
    * streams). */
  def sessionNativeOf(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{count, lit, session_window, sum}
    events
      .withWatermark("ts", "2 hours")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(30,4)")).cast("double").as("sum_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))
  }

  /** Stream-static enrichment — the event stream broadcast-joined
    * to the customer dimension, then segmented rollups. */
  def streamEnrich(spark: SparkSession, dir: String): DataFrame =
    EventStream.enrichedSegmentActivity(
      graft.sources.Tables.events(spark, dir),
      graft.sources.Tables.customer(spark, dir))

  /** Checkpointed streaming PARQUET-SINK gate — the streaming analog
    * of `shuffle_export_write`'s write→re-read round trip and of the
    * reference's final-concat sink (O10): the events fixture is
    * consumed as a file-source STREAM, a stateless transform runs per
    * micro-batch, and rows land through the exactly-once file sink
    * (`_spark_metadata` commit log) under a checkpoint; the re-read
    * goes through that manifest, so the oracle gates the sink's
    * exactly-once contract, not just the transform. Within one JVM
    * the scratch checkpoint persists, so repeated calls re-drain ZERO
    * new files and re-serve the committed output — the incremental
    * semantics a live pipeline relies on (kill/restart resume +
    * uncommitted-file invisibility are asserted in FileStreamSpec).
    * Scale shape: stateless append streaming — no state store, no
    * watermark, partition-parallel writes; the transform is the same
    * codegen'd filter+project the batch plan runs. */
  def streamSinkParquet(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.expr
    import org.apache.spark.sql.streaming.Trigger
    // schema-adaptive like Tables.events: readStream needs an explicit
    // schema, so probe the one the fixture actually carries (nanos-era
    // files surface ts as BIGINT under the legacy conf, current files
    // as a real timestamp) and normalize after — hard-coding a
    // remembered physical type was the round-10 fixture-drift failure
    val scratch = graft.sources.TempDirs.scratch("streamsink", dir)
    val q = graft.sources.Tables.normalizeEventsTs(eventsStream(spark, dir))
      .filter(col("user_id") % 4 === 0)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts"), col("value"))
      .writeStream.format("parquet")
      .option("path", s"$scratch/out")
      .option("checkpointLocation", s"$scratch/ckpt")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)
    require(!q.isActive, "stream sink did not drain within 180 s")
    spark.read
      .schema("event_id BIGINT, user_id BIGINT, event_type STRING, ts TIMESTAMP, value DOUBLE")
      .parquet(s"$scratch/out")
      .select("event_id", "user_id", "event_type", "ts", "value")
  }

  /** Stream-STREAM interval join through the real streaming engine —
    * the two-moving-sides operator the other streaming gates don't
    * exercise (`stream_enrich` is stream-static, `stream_attribution`
    * runs the interval-join SHAPE on batch): clicks and views arrive
    * as two watermarked file-source streams, join in Spark's
    * symmetric stateful hash join under the v_ts ∈ (c_ts − 10 min,
    * c_ts] band, and land through the exactly-once parquet sink under
    * a checkpoint; the registered result is the sink re-read, so the
    * oracle (the batch interval join — stream ≡ batch for an inner
    * join drained to completion) gates the whole streaming path:
    * join state, watermark plumbing, commit log. Scale shape: state
    * retention is bounded by watermark + band (each side keeps ≤ 1 h
    * + 10 min of keyed rows); the join shuffles both streams on
    * user_id once; event-time condition prunes state per micro-batch.
    * Same one-JVM idempotence contract as `stream_sink`: the scratch
    * checkpoint persists, so repeated calls re-drain zero files and
    * re-serve the committed result. */
  /** Runs `body` (a streaming-query START) under a reduced
    * `spark.sql.shuffle.partitions`, restoring the session value
    * after. A stateful streaming query pins its state-store
    * partition count at CHECKPOINT CREATION from this conf — 32
    * partitions × N micro-batches of state-store open/commit
    * overhead dwarf the actual row volume on the drain-scale feeds,
    * and at real scale state sizing is an explicit capacity choice,
    * not an inherited batch default (measured: the outer drain
    * 18.8 → ~8 s at 8 partitions). Restarts from an existing
    * checkpoint keep the checkpointed count regardless. */
  /** Layout-agnostic streaming source for the events table (r17 —
    * found by ScaleLab's stream family): the historical
    * `parquet(dir)` + `pathGlobFilter "events.parquet"` form silently
    * read ZERO files whenever events.parquet is a DIRECTORY of part
    * files — i.e. every real parquet dataset layout — because the
    * filter applies to LEAF file names, and the part files inside
    * don't match. A direct table path fails the other way (the file
    * source requires a directory basePath on the single-file fixture
    * layout). So: probe the layout through the path's own FileSystem
    * (scheme-agnostic — HDFS/S3 datasets are always the directory
    * branch) and pick the matching reader. */
  private def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/events.parquet")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rdr = spark.readStream
      .schema(graft.sources.Tables.eventsDiskSchema(spark, dir))
    if (fs.getFileStatus(p).isDirectory) rdr.parquet(p.toString)
    else rdr.option("pathGlobFilter", "events.parquet").parquet(dir)
  }

  private def withStatePartitions[A](spark: SparkSession, n: Int)(body: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try body finally spark.conf.set(key, prev)
  }

  /** Stream-stream inner join (views ⋈ clicks) run through real
    * micro-batches with watermark state eviction. */
  def streamJoinAttrib(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.expr
    import org.apache.spark.sql.streaming.Trigger
    val scratch = graft.sources.TempDirs.scratch("streamjoin", dir)
    def src = graft.sources.Tables.normalizeEventsTs(eventsStream(spark, dir))
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
    val clicks = src.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    val views = src.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", "1 hour")
    val joined = clicks.join(views,
      col("v_user") === col("c_user") &&
        col("v_ts") <= col("c_ts") &&
        col("v_ts") > col("c_ts") - expr("INTERVAL 10 MINUTES"))
      .select(col("c_user").as("user_id"), col("click_id"), col("view_id"),
        (expr("unix_micros(c_ts)") - expr("unix_micros(v_ts)")).as("gap_us"))
    val q = withStatePartitions(spark, 8) {
      joined.writeStream.format("parquet")
        .option("path", s"$scratch/out")
        .option("checkpointLocation", s"$scratch/ckpt")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
    }
    q.awaitTermination(180000)
    require(!q.isActive, "stream-stream join did not drain within 180 s")
    spark.read
      .schema("user_id BIGINT, click_id BIGINT, view_id BIGINT, gap_us BIGINT")
      .parquet(s"$scratch/out")
  }

  /** Stream-stream LEFT OUTER interval join — the harder half the r9
    * verdict called out: unmatched left rows are emitted with null
    * right columns only when the WATERMARK passes their eviction
    * point, so this is the operator where the watermark proof
    * actually bites (the inner `stream_join` never emits from state
    * eviction). Clicks LEFT OUTER views under the same
    * v_ts ∈ (c_ts − 10 min, c_ts] band.
    *
    * Drain determinism: a drained outer join does NOT trivially equal
    * the batch left join — left rows younger than (max ts − delay)
    * are still in state when the last data batch ends, and their
    * null-emission depends on post-data watermark movement. The feed
    * therefore stages each side as three mtime-ordered files: all
    * real rows (one batch — nothing is ever late), then sentinel 1
    * (+1 day, advances both sides' watermarks past every real row at
    * batch end), then sentinel 2 (+2 days, RUNS under sentinel 1's
    * watermark and therefore evicts + emits every unmatched real
    * click) — so completeness does not depend on the engine
    * scheduling no-data micro-batches. Sentinels carry negative
    * user_ids and are filtered from the result; the sentinel click's
    * own unmatched row is dropped by the same filter. The oracle is
    * the batch LEFT join with the gate's null-free encoding
    * (COALESCE → −1; the asof_join strict-variant precedent — the
    * library emits real nulls, the hash gate runs the encoded form).
    * Scale shape: state ≤ watermark + band per side as in
    * `stream_join`; the sentinel trick is a drain-protocol detail,
    * not a plan property. Same one-JVM idempotence contract as
    * `stream_sink`/`stream_join` (scratch + checkpoint persist →
    * reruns re-drain zero files), so Bench's noRerun excludes it. */
  def streamJoinOuterAttrib(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{expr, lit}
    import org.apache.spark.sql.streaming.Trigger
    val scratch = graft.sources.TempDirs.scratch("streamjoinouter", dir)
    val done = new java.io.File(s"$scratch/feed/_done")
    if (!done.exists) {
      // feed is staged from the schema-adaptive batch loader; the
      // stream sources below then read the feed's own (normalized)
      // TIMESTAMP schema, so no physical-type assumption survives here
      val ev = graft.sources.Tables.events(spark, dir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      val maxTs = ev.agg(org.apache.spark.sql.functions.max(col("ts"))).head()
        .getTimestamp(0).toInstant
      def sentinel(idx: Int, days: Int): DataFrame =
        spark.range(1).select(
          lit(-1L - idx).as("event_id"), lit(-1L - idx).as("user_id"),
          lit(java.sql.Timestamp.from(maxTs.plusSeconds(days * 86400L))).cast("timestamp").as("ts"))
      Seq("click" -> "clicks", "view" -> "views").foreach { case (t, side) =>
        ev.filter(col("event_type") === t)
          .select(col("event_id"), col("user_id"), col("ts"))
          .coalesce(1).write.mode("overwrite").parquet(s"$scratch/feed/$side/b0")
        sentinel(0, 1).coalesce(1).write.mode("overwrite").parquet(s"$scratch/feed/$side/s1")
        sentinel(1, 2).coalesce(1).write.mode("overwrite").parquet(s"$scratch/feed/$side/s2")
        // force the file-source processing order real → s1 → s2
        val now = System.currentTimeMillis()
        Seq("b0" -> 0L, "s1" -> 60000L, "s2" -> 120000L).foreach { case (sub, off) =>
          new java.io.File(s"$scratch/feed/$side/$sub").listFiles()
            .filter(_.getName.endsWith(".parquet"))
            .foreach(f => f.setLastModified(now + off))
        }
      }
      done.getParentFile.mkdirs(); done.createNewFile()
    }
    def src(side: String, idCol: String, uCol: String, tsCol: String) =
      spark.readStream
        .schema("event_id BIGINT, user_id BIGINT, ts TIMESTAMP")
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$scratch/feed/$side/*")
        .select(col("event_id").as(idCol), col("user_id").as(uCol), col("ts").as(tsCol))
        .withWatermark(tsCol, "1 hour")
    val clicks = src("clicks", "click_id", "c_user", "c_ts")
    val views = src("views", "view_id", "v_user", "v_ts")
    val joined = clicks.join(views,
      col("v_user") === col("c_user") &&
        col("v_ts") <= col("c_ts") &&
        col("v_ts") > col("c_ts") - expr("INTERVAL 10 MINUTES"),
      "left_outer")
      .select(col("c_user").as("user_id"), col("click_id"), col("view_id"),
        (expr("unix_micros(c_ts)") - expr("unix_micros(v_ts)")).as("gap_us"))
    val q = withStatePartitions(spark, 8) {
      joined.writeStream.format("parquet")
        .option("path", s"$scratch/out")
        .option("checkpointLocation", s"$scratch/ckpt")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
    }
    q.awaitTermination(180000)
    require(!q.isActive, "outer stream-stream join did not drain within 180 s")
    spark.read
      .schema("user_id BIGINT, click_id BIGINT, view_id BIGINT, gap_us BIGINT")
      .parquet(s"$scratch/out")
      .filter(col("user_id") >= 0L)
      .select(col("user_id"), col("click_id"),
        org.apache.spark.sql.functions.coalesce(col("view_id"), lit(-1L)).as("view_id"),
        org.apache.spark.sql.functions.coalesce(col("gap_us"), lit(-1L)).as("gap_us"))
  }

  /** Streaming DEDUPLICATION through the real stateful operator —
    * `dropDuplicatesWithinWatermark`: the feed stages the events
    * fixture TWICE (every row an exact planted duplicate), the stream
    * drops repeats keyed on event_id, and the drained sink must equal
    * the fixture exactly — one surviving duplicate or one over-dropped
    * row breaks the hash. WithinWatermark, not plain dropDuplicates,
    * deliberately: plain streaming dedup keeps every key seen FOREVER
    * (unbounded state — a non-starter on an endless 100 TB feed),
    * while the watermark variant evicts keys once the watermark
    * passes them, bounding state to the late-data horizon. That is
    * the production trade; the drain feeds both copies in one
    * AvailableNow batch so every duplicate is inside the horizon and
    * the batch oracle is exact. Same one-JVM idempotence contract as
    * `stream_sink` (persistent scratch + checkpoint → reruns drain
    * zero files), so Bench's noRerun excludes it. */
  def streamDedup(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val scratch = graft.sources.TempDirs.scratch("streamdedup", dir)
    val done = new java.io.File(s"$scratch/feed/_done")
    if (!done.exists) {
      val ev = graft.sources.Tables.events(spark, dir)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      ev.coalesce(1).write.mode("overwrite").parquet(s"$scratch/feed/c0")
      ev.coalesce(1).write.mode("overwrite").parquet(s"$scratch/feed/c1")
      done.getParentFile.mkdirs(); done.createNewFile()
    }
    val q = withStatePartitions(spark, 8) {
      spark.readStream
        .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE")
        .parquet(s"$scratch/feed/*")
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark("event_id")
        .writeStream.format("parquet")
        .option("path", s"$scratch/out")
        .option("checkpointLocation", s"$scratch/ckpt")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
    }
    q.awaitTermination(180000)
    require(!q.isActive, "stream dedup did not drain within 180 s")
    spark.read
      .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE")
      .parquet(s"$scratch/out")
  }

  private val mergeRun = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Streaming MERGE (foreachBatch upsert) — the Delta-style CDC sink
    * EventStreamSpec proves convergent on MemoryStream chunks, now
    * registered against the fixture: the SAME change batch as
    * `cdc_apply` (shared derivation, [[Relational.cdcChanges]]) is
    * written as four disjoint-key parquet files, consumed as a file
    * STREAM one file per micro-batch, and each batch MERGEs into a
    * versioned parquet state chain via the same broadcast
    * `applyCdc`; the returned snapshot is the final version. Because
    * the files partition the keys (pmod 4) and each key carries
    * exactly one change, incremental application commutes and the
    * final state equals the single-shot merge — which is exactly
    * what the oracle replays (it is `cdc_apply`'s oracle). A fresh
    * run-scoped scratch per invocation keeps the checkpoint, feed
    * and state chain self-contained, so repeated calls are
    * idempotent (LayoutSpec's sink-idempotence gate covers it).
    * Scale shape: per batch, one broadcast of the micro-batch's
    * changes against a narrow scan of the snapshot — the base never
    * shuffles; state versions are the parquet the next batch reads. */
  def streamMerge(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{lit, pmod}
    import org.apache.spark.sql.streaming.Trigger
    val scratch = graft.sources.TempDirs.scratch(
      s"streammerge${mergeRun.incrementAndGet()}", dir)
    val base = Relational.cdcBase(spark, dir)
    val changes = Relational.cdcChanges(base)
    val chDir = s"$scratch/changes"
    (0 until 4).foreach { b =>
      changes.filter(pmod(col("o_orderkey"), lit(4)) === b).coalesce(1)
        .write.mode("append").parquet(chDir)
    }
    base.write.mode("overwrite").parquet(s"$scratch/state_v0")
    @volatile var cur = 0L
    val q = spark.readStream
      .schema("o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, " +
        "o_orderpriority STRING, o_totalprice DOUBLE, op STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(chDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val state = spark.read.parquet(s"$scratch/state_v$cur")
        Relational.applyCdc(state, batch, "o_orderkey")
          .write.mode("overwrite").parquet(s"$scratch/state_v${id + 1}")
        cur = id + 1
      }
      .option("checkpointLocation", s"$scratch/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)
    require(!q.isActive, "merge stream did not drain within 180 s")
    require(cur >= 4, s"expected 4 micro-batches, saw $cur")
    spark.read.parquet(s"$scratch/state_v$cur")
  }

  /** Windowed top-k users by event count — the MG/frequent-items
    * sketch aggregation over the event stream. */
  def streamFreqTopk(spark: SparkSession, dir: String): DataFrame =
    EventStream.windowedTopUsers(
      graft.sources.Tables.events(spark, dir))

  /** SCD2 dimension versioning — the other half of CDC ingestion
    * ([[compactLatest]] keeps the latest version; this keeps ALL
    * versions with validity intervals): each record is current from
    * its own timestamp until the next record of the same key, with a
    * 2100-01-01 end-of-time sentinel instead of NULL — null-free
    * outputs are a cross-engine comparator rule, the sentinel is how
    * warehouse BETWEEN lookups want it anyway, and the classic
    * 9999-12-31 overflows the driver-side nanosecond timestamp
    * compare (pandas ns range ends in 2262).
    * One keyed window sort — same single-exchange shape as
    * `compact_latest`, spilling sorts at scale, no state beyond the
    * sort. */
  def scd2Intervals(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{coalesce, lead, lit, to_timestamp}
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts").asc, col("event_id").asc)
    val nxt = lead(col("ts"), 1).over(w)
    graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("value"), col("ts").as("valid_from"),
        coalesce(nxt, to_timestamp(lit("2100-01-01 00:00:00"))).as("valid_to"),
        nxt.isNull.cast("long").as("is_current"))
  }

  /** Top-20 session PATHS — the clickstream-mining rollup above
    * [[sessionize]] (which paths do users actually walk?) and the
    * set-valued counterpart of `markov_trans`'s per-step transition
    * model: sessions form by the same 30-minute gap rule (ordered by
    * (ts, event_id) so equal-timestamp events have one canonical
    * order), each session's path is its first 5 event types joined
    * with '>', and paths rank by frequency (ties by path asc).
    *
    * Scale shape: ONE user_id exchange feeds the gap window, the
    * session-local rank, and the per-session fold (rank-limit keeps
    * ≤ 5 rows per session before any collect); the path count is a
    * partial+final aggregate on a low-cardinality key and the top-20
    * is a TakeOrderedAndProject — never a global sort. */
  def pathTopk(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{concat_ws, count, lag, lit, row_number,
      struct, sum => fsum, transform => ftransform, unix_micros, when, sort_array,
      collect_list}
    val wOrd = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val gapUs = 1800L * 1000000L
    val s = graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("new_s",
        when(lag(col("ts"), 1).over(wOrd).isNull ||
          unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(wOrd)) > gapUs,
          1L).otherwise(0L))
      .withColumn("sid", fsum(col("new_s")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id"), col("sid"))
          .orderBy(col("ts").asc, col("event_id").asc)))
      .filter(col("rn") <= 5)
    s.groupBy(col("user_id"), col("sid"))
      .agg(concat_ws(">", ftransform(
        sort_array(collect_list(struct(col("rn"), col("event_type")))),
        e => e("event_type"))).as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path").asc)
      .limit(20)
  }

  /** Late-arrival (disorder) histogram — THE watermark-sizing
    * diagnostic a streaming pipeline derives its
    * `withWatermark("ts", δ)` bound from: per user, events replay in
    * ARRIVAL order (event_id — the synthetic ingest sequence), each
    * event's lateness is the running max event-time seen so far minus
    * its own event-time (0 = in order), and the corpus rolls up to a
    * per-minute-bucket histogram. The p99.9 bucket IS the watermark
    * to configure; mass in high buckets = state that a tight
    * watermark would drop. Exact integer epoch-second arithmetic.
    * Scale shape: one user-keyed window (distributed, arrival-sorted
    * within user), then a metadata-scale partial+final histogram
    * fold. */
  def lateArrivalHist(spark: SparkSession, dir: String): DataFrame =
    lateArrivalHistOf(graft.sources.Tables.events(spark, dir))

  /** Input-generic form (EdgeCaseSpec drives it with planted
    * out-of-order streams — the fixture's event_ids are ts-ordered,
    * so disorder never occurs there and the histogram is one
    * bucket-0 row by design). */
  private[operators] def lateArrivalHistOf(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{count => fcount, expr, lit, max => fmax}
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.select(col("user_id"), col("event_id"), col("ts").cast("long").as("s"))
      .withColumn("late_s", fmax(col("s")).over(w) - col("s"))
      .groupBy(expr("late_s div 60").as("late_min"))
      .agg(fcount(lit(1)).as("n_events"))
  }

  private[operators] val WatermarkGrid = Seq(0L, 60L, 300L, 600L, 3600L)

  /** Watermark what-if table — the decision artifact next to
    * [[lateArrivalHist]]: for each candidate watermark δ on the
    * [[WatermarkGrid]] (seconds), how many events would arrive LATER
    * than δ behind the per-user high-water mark and be dropped by
    * `withWatermark("ts", δ)`, with the drop share on the 2²⁰
    * lattice. Pick the smallest δ whose drop share clears the
    * pipeline's loss budget. Scale shape: lateness folds ONCE to
    * (late_s, count) distinct values (fold-below-grid), the 5-row
    * grid broadcast-crosses the folded rows, and the readout is a
    * 5-row conditional aggregate. */
  def watermarkWhatif(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{count => fcount, expr, lit, max => fmax, sum => fsum, when}
    import spark.implicits._
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lateCounts = graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts").cast("long").as("s"))
      .withColumn("late_s", fmax(col("s")).over(w) - col("s"))
      .groupBy(col("late_s")).agg(fcount(lit(1)).as("c"))
    val grid = WatermarkGrid.toDF("delta_s")
    ScalarJoin.broadcastCross(lateCounts, col("c"), grid, col("delta_s"))
      .groupBy(col("delta_s"))
      .agg(fsum(col("c")).as("n_events"),
        fsum(when(col("late_s") > col("delta_s"), col("c")).otherwise(0L)).as("n_dropped"))
      .withColumn("drop_share_q",
        expr("cast((n_dropped * cast(1048576 as bigint)) div n_events as bigint)"))
  }

  /** Session-duration histogram — the engagement-depth profile next
    * to [[sessionize]]'s raw session table ("are sessions 30-second
    * bounces or hour-long engagements"): sessions bucket by whole
    * minutes of duration (exact epoch-micro difference, truncating
    * division), each bucket reporting session and event mass.
    * Operator composition (the pack_efficiency precedent): the
    * session relation's own window machinery runs once; this adds
    * one metadata-scale partial+final fold on top. */
  def sessionDurationHist(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{count => fcount, expr, lit, sum => fsum}
    sessionize(spark, dir)
      .groupBy(expr(
        "(unix_micros(session_end) - unix_micros(session_start)) div 60000000")
        .as("dur_min"))
      .agg(fcount(lit(1)).as("n_sessions"), fsum(col("n_events")).as("n_events"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "late_arrival_hist"       -> lateArrivalHist,
    "watermark_whatif"        -> watermarkWhatif,
    "session_duration_hist"   -> sessionDurationHist,
    "stream_enrich"           -> streamEnrich,
    "path_topk"               -> pathTopk,
    "scd2_intervals"          -> scd2Intervals,
    "sessionize"              -> sessionize,
    "stream_window_counts"    -> streamWindowCounts,
    "stream_sliding_activity" -> streamSlidingActivity,
    "stream_attribution"      -> streamAttribution,
    "compact_latest"          -> compactLatest,
    "stream_freq"             -> streamFreqTopk,
    "session_native"          -> sessionNative,
    "stream_sink"             -> streamSinkParquet,
    "stream_join"             -> streamJoinAttrib,
    "stream_join_outer"       -> streamJoinOuterAttrib,
    "stream_dedup"            -> streamDedup,
    "stream_merge"            -> streamMerge)

  /** Gaps-and-islands session replay, shared by the `sessionize` and
    * `session_duration_hist` oracles. */
  private val SessionizeSql =
    """WITH m AS (
      |  SELECT user_id, ts, value,
      |    CASE WHEN lag(ts) OVER win IS NULL
      |           OR epoch_ns(ts) - epoch_ns(lag(ts) OVER win) > 1800 * 1000000000::BIGINT
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM events
      |  WINDOW win AS (PARTITION BY user_id ORDER BY ts)),
      |g AS (
      |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM m)
      |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS sum_value
      |FROM g GROUP BY user_id, sid""".stripMargin

  val oracles: Map[String, String] = Map(
    // running max over the arrival order replays as the same window;
    // epoch seconds via epoch_us//1e6 == Spark's timestamp→long cast
    "late_arrival_hist" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) // 1000000 AS s
        |           FROM events),
        |l AS (SELECT max(s) OVER (PARTITION BY user_id ORDER BY event_id
        |        ROWS UNBOUNDED PRECEDING) - s AS late_s
        |      FROM e)
        |SELECT late_s // 60 AS late_min, count(*) AS n_events
        |FROM l GROUP BY 1""".stripMargin,
    "watermark_whatif" ->
      s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) // 1000000 AS s
         |           FROM events),
         |l AS (SELECT max(s) OVER (PARTITION BY user_id ORDER BY event_id
         |        ROWS UNBOUNDED PRECEDING) - s AS late_s
         |      FROM e),
         |f AS (SELECT late_s, count(*) AS c FROM l GROUP BY 1),
         |grid(delta_s) AS (VALUES ${StreamOps.WatermarkGrid.map(d => s"(CAST($d AS BIGINT))").mkString(", ")})
         |SELECT delta_s, CAST(sum(c) AS BIGINT) AS n_events,
         |  CAST(sum(CASE WHEN late_s > delta_s THEN c ELSE 0 END) AS BIGINT) AS n_dropped,
         |  CAST((sum(CASE WHEN late_s > delta_s THEN c ELSE 0 END) * 1048576)
         |       // sum(c) AS BIGINT) AS drop_share_q
         |FROM f, grid GROUP BY delta_s""".stripMargin,
    // watermark is a no-op on batch; windows are epoch-grid-aligned,
    // so 1-hour tumbling == date_trunc('hour')
    "stream_enrich" ->
      """SELECT date_trunc('hour', ts) AS window_start, c_mktsegment,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1, 2, 3""".stripMargin,
    "scd2_intervals" ->
      """SELECT user_id, event_type, event_id, value, ts AS valid_from,
        |  coalesce(lead(ts) OVER (PARTITION BY user_id, event_type
        |    ORDER BY ts ASC, event_id ASC), TIMESTAMP '2100-01-01 00:00:00') AS valid_to,
        |  CAST(CASE WHEN lead(ts) OVER (PARTITION BY user_id, event_type
        |    ORDER BY ts ASC, event_id ASC) IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
        |FROM events""".stripMargin,
    // the MG summary runs in its exact regime (capacity ≫ group
    // distinct count — see EventStream.windowedTopUsers), so the
    // sketch output IS the exact per-user count
    "stream_freq" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  user_id, count(*) AS n
        |FROM events GROUP BY 1, 2, 3""".stripMargin,
    "compact_latest" ->
      """SELECT user_id, event_type, event_id, ts, value FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
        |    ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) t
        |WHERE rn = 1""".stripMargin,
    // 1-hour tumbling windows on the epoch grid == date_trunc('hour')
    "stream_window_counts" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    // interval join: integral epoch arithmetic only; each timestamp
    // truncates to micros SEPARATELY (epoch_ns(x) // 1000), mirroring
    // the implementation's unix_micros(c_ts) - unix_micros(v_ts) —
    // a floored difference-of-nanos would disagree on sub-µs inputs
    // (ADVICE r9). Minute intervals are fixed-duration, cross-engine
    // safe
    "stream_attribution" ->
      """SELECT c.user_id, c.event_id AS click_id, v.event_id AS view_id,
        |  epoch_ns(c.ts) // 1000 - epoch_ns(v.ts) // 1000 AS gap_us
        |FROM events c JOIN events v
        |  ON c.event_type = 'click' AND v.event_type = 'view'
        | AND v.user_id = c.user_id
        | AND v.ts <= c.ts AND v.ts > c.ts - INTERVAL 10 MINUTE""".stripMargin,
    // 5-min window / 1-min slide: every event lands in exactly the 5
    // windows starting at trunc_minute(ts) - k minutes, k = 0..4
    "stream_sliding_activity" ->
      """SELECT date_trunc('minute', ts) - k * INTERVAL 1 MINUTE AS window_start,
        |  user_id, count(*) AS n_events
        |FROM events CROSS JOIN (SELECT unnest(range(5)) AS k) ks
        |GROUP BY 1, 2""".stripMargin,
    "path_topk" ->
      """WITH m AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN lag(ts) OVER win IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER win) > 1800 * 1000000::BIGINT
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
        |g AS (
        |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM m),
        |r AS (
        |  SELECT user_id, sid, event_type,
        |    row_number() OVER (PARTITION BY user_id, sid ORDER BY ts ASC, event_id ASC) AS rn
        |  FROM g),
        |p AS (
        |  SELECT user_id, sid, string_agg(event_type, '>' ORDER BY rn) AS path
        |  FROM r WHERE rn <= 5 GROUP BY user_id, sid)
        |SELECT path, count(*) AS n_sessions
        |FROM p GROUP BY path
        |ORDER BY n_sessions DESC, path ASC
        |LIMIT 20""".stripMargin,
    "sessionize" -> SessionizeSql,
    // duration histogram over the SAME session relation (shared CTE
    // text — the ClusterCtes rule, so the rollup cannot drift)
    "session_duration_hist" ->
      s"""WITH s AS ($SessionizeSql)
         |SELECT (epoch_us(session_end) - epoch_us(session_start)) // 60000000 AS dur_min,
         |  count(*) AS n_sessions,
         |  CAST(sum(n_events) AS BIGINT) AS n_events
         |FROM s GROUP BY 1""".stripMargin,
    // native session_window: merge iff gap < 30 min (half-open
    // [ts, ts+gap) windows ⇒ an EXACT 1800 s gap starts a new
    // session, hence >= not > here), end = last event + gap
    "session_native" ->
      """WITH m AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER win IS NULL
        |           OR epoch_ns(ts) - epoch_ns(lag(ts) OVER win) >= 1800 * 1000000000::BIGINT
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts)),
        |g AS (
        |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM m)
        |SELECT user_id, min(ts) AS session_start,
        |  max(ts) + INTERVAL 30 MINUTE AS session_end,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS sum_value
        |FROM g GROUP BY user_id, sid""".stripMargin,
    // the sink round trip must reproduce the stateless transform
    // exactly — any replayed or lost micro-batch breaks the hash
    "stream_sink" ->
      """SELECT event_id, user_id, event_type, ts, value
        |FROM events WHERE user_id % 4 = 0""".stripMargin,
    // a drained inner stream-stream join equals the batch interval
    // join: the oracle IS stream_attribution's contract. Sanity on
    // the tiny row count (6 at sf0.01): the fixture spreads 10k
    // events over 30 days across 150 users (~2 events/user/day), so a
    // (user, click←view, ≤10 min) band is a rare coincidence — thousands
    // of matches (r10's 5354, from 1000×-shrunk timestamps collapsing
    // the band) is the signature of a units bug, not density
    "stream_join" ->
      """SELECT c.user_id, c.event_id AS click_id, v.event_id AS view_id,
        |  epoch_ns(c.ts) // 1000 - epoch_ns(v.ts) // 1000 AS gap_us
        |FROM events c JOIN events v
        |  ON c.event_type = 'click' AND v.event_type = 'view'
        | AND v.user_id = c.user_id
        | AND v.ts <= c.ts AND v.ts > c.ts - INTERVAL 10 MINUTE""".stripMargin,
    // the drained LEFT OUTER join equals the batch LEFT join once the
    // sentinel protocol has advanced the watermark past every real
    // row; the gate runs the null-free −1 encoding on both sides
    // (click-side predicates in WHERE, view-side in ON — the left-
    // join decomposition that keeps unmatched clicks)
    "stream_join_outer" ->
      """SELECT c.user_id, c.event_id AS click_id,
        |  COALESCE(v.event_id, -1) AS view_id,
        |  COALESCE(epoch_ns(c.ts) // 1000 - epoch_ns(v.ts) // 1000, -1) AS gap_us
        |FROM events c LEFT JOIN events v
        |  ON v.event_type = 'view'
        | AND v.user_id = c.user_id
        | AND v.ts <= c.ts AND v.ts > c.ts - INTERVAL 10 MINUTE
        |WHERE c.event_type = 'click'""".stripMargin,
    // the twice-fed stream must collapse back to the fixture exactly:
    // a surviving duplicate or an over-dropped row both break the hash
    "stream_dedup" ->
      """SELECT event_id, ts, user_id, event_type, value
        |FROM events""".stripMargin,
    // the micro-batched merge must land on the single-shot snapshot:
    // the oracle IS cdc_apply's (same base, same change derivation)
    "stream_merge" -> Relational.oracles("cdc_apply"))
}
