package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType

/** Structured-Streaming surface over the `events` schema (stretch goal
  * per SURVEY.md §7.2 step 4 — the reference is batch-only, so this is
  * capability-extension, not parity).
  *
  * Each transform takes a DataFrame that may be a batch table OR a
  * stream (`spark.readStream`): the same declarative plan serves both,
  * which is the Spark-native way to keep batch backfill and live
  * ingestion semantically identical. Watermarking bounds state so the
  * windowed aggregation runs indefinitely at scale; output mode
  * `append` emits each window once it is final.
  */
object EventStream {

  /** Tumbling-window counts/sums per event type. `withWatermark` is a
    * no-op on batch inputs, so batch parity with Relational.eventsHourly
    * holds (asserted in EventStreamSpec). */
  def windowedTypeCounts(
      events: DataFrame,
      windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(30, 4))).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))

  /** Windowed heavy hitters: the Misra-Gries summary
    * ([[graft.functions.MisraGriesAgg]]) as a WINDOWED streaming
    * aggregation — per (window, event_type), the per-user event
    * summary. TypedImperativeAggregate state merges through the
    * streaming state store exactly as it merges across batch
    * partitions, so the same declarative plan runs both ways (the
    * trending-users / hot-keys dashboard shape, with bounded ≤ c
    * state per group at ANY event volume). Capacity 256 ≫ the
    * fixture's max distinct users per group (51 at sf0.1) keeps the
    * summary in its provably-exact regime, which is what makes
    * stream/batch parity and the count-exact oracle possible —
    * estimates in the EVICTING regime are merge-order-dependent by
    * design (freq_topk gates that regime's theorem instead). */
  def windowedTopUsers(
      events: DataFrame,
      windowLen: String = "1 hour",
      watermark: String = "2 hours",
      capacity: Int = 256): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(graft.functions.MisraGriesAgg.mg_topk(
        col("user_id").cast("string"), capacity).as("sk"))
      .select(col("w.start").as("window_start"), col("event_type"),
        explode(col("sk")))
      .select(col("window_start"), col("event_type"),
        col("key").cast("long").as("user_id"), col("value").as("n"))

  /** Stream-static enrichment join + windowed aggregation: the event
    * stream joins a STATIC dimension (customer segment) and rolls up
    * per (window, segment, type). This is the canonical streaming
    * enrichment shape — the static side is planned once per
    * micro-batch as a broadcast (explicitly hinted: dimension tables
    * stay broadcast-sized at any fact-stream volume), the stream side
    * never re-shuffles for the join, and the windowed aggregation
    * carries the watermark exactly as in [[windowedTypeCounts]].
    * Batch parity: on a batch `events` input the same plan is a
    * broadcast join + groupBy, giving the registered row its DuckDB
    * oracle; EventStreamSpec replays it through MemoryStream. */
  def enrichedSegmentActivity(
      events: DataFrame,
      customer: DataFrame,
      windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .join(broadcast(customer.select(col("c_custkey"), col("c_mktsegment"))),
        col("user_id") === col("c_custkey"))
      .groupBy(window(col("ts"), windowLen).as("w"),
        col("c_mktsegment"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(30, 4))).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("c_mktsegment"),
        col("event_type"), col("n"), col("sum_value"))

  /** One closed user session: contiguous activity with gaps < the
    * session timeout. */
  case class Session(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long, sum_value: Double)

  /** `sumE4` holds value×10⁴ as a long: exact, order-insensitive
    * accumulation that equals the oracle's DECIMAL(30,4) sum.
    * (Public: the GroupState encoder needs the constructor.) */
  case class SessionState(
      start: Long, last: Long, n: Long, sumE4: Long)

  /** Custom-state sessionization via flatMapGroupsWithState — the
    * operator the windowed APIs can't express (session length is
    * data-dependent, not clock-aligned). State per user is O(1): the
    * open session's bounds and aggregates. With an event-time timeout
    * a session closes `gapMs` after its last event; the same code
    * also runs in batch (used by the spec to cross-check a window-free
    * SQL formulation).
    *
    * 100 TB notes: state is partitioned by user across executors and
    * checkpointed by the streaming engine; memory is bounded by
    * (active users × ~40 bytes), independent of event volume. */
  def sessionize(
      events: Dataset[(Long, Timestamp, Double)],
      gapMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    // state carries epoch-MICROS: Timestamp.getTime is millis-only and
    // silently truncates the fixture's microsecond precision
    def toMicros(ts: Timestamp): Long =
      ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L
    def toTs(us: Long): Timestamp = {
      val t = new Timestamp(us / 1000L)
      t.setNanos(((us % 1000000L) * 1000L).toInt)
      t
    }
    def close(uid: Long, s: SessionState): Session =
      Session(uid, toTs(s.start), toTs(s.last), s.n, s.sumE4 / 1e4)
    def e4(v: Double): Long = math.round(v * 1e4)
    val gapUs = gapMs * 1000L
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Timestamp, Double)], state: GroupState[SessionState]) =>
          // batch path: rows arrive unordered; sort within the group
          // (bounded by one user's events)
          val sorted = rows.toSeq.sortBy(r => toMicros(r._2))
          val out = scala.collection.mutable.ArrayBuffer.empty[Session]
          var cur = state.getOption.orNull
          sorted.foreach { case (_, ts, v) =>
            val t = toMicros(ts)
            cur match {
              case null =>
                cur = SessionState(t, t, 1L, e4(v))
              case s if t - s.last <= gapUs =>
                cur = SessionState(s.start, t, s.n + 1, s.sumE4 + e4(v))
              case s =>
                out += close(uid, s)
                cur = SessionState(t, t, 1L, e4(v))
            }
          }
          // the open session stays in state — closed only by a later
          // out-of-gap event (or a sentinel flush). Closing it here
          // would truncate sessions at micro-batch boundaries.
          if (cur != null) state.update(cur)
          out.iterator
      }
  }

  /** One live record per compaction key — the streaming state/output
    * of [[latestByKey]]. */
  case class Latest(
      user_id: Long, event_type: String, event_id: Long, ts: Timestamp, value: Double)

  /** Streaming half of CDC keep-latest compaction (the batch half is
    * StreamOps.compactLatest): per (user_id, event_type) key, maintain
    * the record with the greatest (ts, event_id) and emit the current
    * winner whenever the key sees data — Update-mode output, so a
    * downstream upsert sink always converges to exactly the batch
    * compaction of everything ingested. State per key is ONE record
    * (~48 bytes), independent of event volume; ties on ts break by
    * event_id like the batch row_number ordering. The same code runs
    * in batch (one group pass) — EventStreamSpec asserts both
    * parities, including out-of-order and replayed delivery. */
  def latestByKey(
      events: Dataset[(Long, String, Long, Timestamp, Double)]): Dataset[Latest] = {
    import events.sparkSession.implicits._
    def toMicros(ts: Timestamp): Long =
      ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L
    events
      .groupByKey(r => (r._1, r._2))
      .mapGroupsWithState[Latest, Latest](GroupStateTimeout.NoTimeout) {
        case ((uid, etype), rows, state) =>
          var best = state.getOption.orNull
          var bestTs = if (best == null) Long.MinValue else toMicros(best.ts)
          var bestId = if (best == null) Long.MinValue else best.event_id
          rows.foreach { case (_, _, id, ts, v) =>
            val t = toMicros(ts)
            if (t > bestTs || (t == bestTs && id > bestId)) {
              best = Latest(uid, etype, id, ts, v); bestTs = t; bestId = id
            }
          }
          state.update(best)
          best
      }
  }

  /** Far-future sentinel used to flush open tail sessions. */
  val FlushTs: Timestamp = Timestamp.valueOf("9999-01-01 00:00:00")

  /** Batch entry: sessionize the events fixture with a 30-minute gap.
    * Tail sessions are flushed by appending one sentinel event per
    * user and dropping the sentinel's own session. */
  def sessionizeBatch(spark: SparkSession, dir: String, gapMs: Long = 30 * 60 * 1000L): Dataset[Session] = {
    import spark.implicits._
    val ev = graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("value"))
      .as[(Long, Timestamp, Double)]
    val flush = ev.map(_._1).distinct().map(u => (u, FlushTs, 0.0))
    sessionize(ev.union(flush), gapMs)
      .filter(s => s.session_start.before(FlushTs))
  }

  /** Batch sessionization via the gaps-and-islands window pattern —
    * the scale-safe formulation: lag + running sum + groupBy are all
    * Spark window/agg operators whose per-partition sorts SPILL, so a
    * single bot user with 10⁹ events streams through disk instead of
    * materializing in task memory (the weakness of the
    * flatMapGroupsWithState batch path, which buffers one user's whole
    * history to sort it). Semantics are identical to [[sessionize]]
    * (EventStreamSpec asserts equality); keep the stateful operator
    * for streaming, where micro-batches bound the group. */
  def sessionizeBatchWindowed(spark: SparkSession, dir: String, gapMs: Long = 30 * 60 * 1000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("value"))
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_s",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapMs * 1000L, 1L).otherwise(0L))
      .withColumn("sid", sum(col("new_s")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(30, 4))).cast("double").as("sum_value"))
      .drop("sid")
  }

  /** Exactly-once ingest dedup: drop replayed events by event_id
    * within the watermark horizon. At-least-once transports (Kafka
    * redelivery, job retries) make this the first operator of every
    * production ingest. On a stream the engine keeps one state entry
    * per event_id and EXPIRES it once the watermark passes — bounded
    * state, indefinitely runnable; the batch form degenerates to
    * dropDuplicates. EventStreamSpec replays chunks with injected
    * duplicates and asserts parity with the batch distinct. */
  def dedupEvents(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark("event_id")
    else events.dropDuplicates("event_id")

  /** View→click attribution: every (click, view) pair by the same
    * user where the view happened in the 10 minutes before the click —
    * the stream-stream interval join, the hardest streaming shape
    * Spark supports. In streaming both sides carry watermarks and the
    * time-bound condition lets the engine EXPIRE view state 10
    * minutes past the watermark — bounded state at any volume. In
    * batch the same plan is an equi-join on user_id with a range
    * residual: no row explosion beyond each user's in-window
    * view×click pairs. `gap_us` stays integral (epoch micros), never
    * float. */
  def viewClickAttribution(events: DataFrame, attributionWindow: String = "10 minutes"): DataFrame = {
    def side(t: String, idAs: String, tsAs: String, userAs: String): DataFrame = {
      val s = events.filter(col("event_type") === t)
        .select(col("event_id").as(idAs), col("ts").as(tsAs), col("user_id").as(userAs))
      if (s.isStreaming) s.withWatermark(tsAs, attributionWindow) else s
    }
    val clicks = side("click", "click_id", "c_ts", "c_user")
    val views = side("view", "view_id", "v_ts", "v_user")
    clicks.join(views,
      col("c_user") === col("v_user") &&
        col("v_ts") <= col("c_ts") &&
        col("v_ts") > col("c_ts") - expr(s"INTERVAL $attributionWindow"))
      .select(col("c_user").as("user_id"), col("click_id"), col("view_id"),
        (unix_micros(col("c_ts")) - unix_micros(col("v_ts"))).as("gap_us"))
  }

  /** LEFT OUTER [[viewClickAttribution]]: clicks with no view in the
    * window emit with null view columns. In streaming these null
    * rows are produced by STATE EVICTION — a click emits unmatched
    * only once the watermark passes its join-window upper bound, so
    * this is the variant where the watermark machinery is load-
    * bearing (the inner join only ever emits on match). Callers
    * draining a finite stream must advance the watermark past every
    * real row and then run one further batch under that advanced
    * watermark (two-stage sentinels — see `streamJoinOuterAttrib`
    * and the EventStreamSpec parity case). */
  def viewClickAttributionOuter(events: DataFrame, attributionWindow: String = "10 minutes"): DataFrame = {
    def side(t: String, idAs: String, tsAs: String, userAs: String): DataFrame = {
      val s = events.filter(col("event_type") === t)
        .select(col("event_id").as(idAs), col("ts").as(tsAs), col("user_id").as(userAs))
      if (s.isStreaming) s.withWatermark(tsAs, attributionWindow) else s
    }
    val clicks = side("click", "click_id", "c_ts", "c_user")
    val views = side("view", "view_id", "v_ts", "v_user")
    clicks.join(views,
      col("c_user") === col("v_user") &&
        col("v_ts") <= col("c_ts") &&
        col("v_ts") > col("c_ts") - expr(s"INTERVAL $attributionWindow"),
      "left_outer")
      .select(col("c_user").as("user_id"), col("click_id"), col("view_id"),
        (unix_micros(col("c_ts")) - unix_micros(col("v_ts"))).as("gap_us"))
  }

  /** Sliding-window event rate per user (5-minute window, 1-minute
    * slide): the fan-out pattern for rolling activity metrics. */
  def slidingUserActivity(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes", "1 minute").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("user_id"), col("n_events"))
}
