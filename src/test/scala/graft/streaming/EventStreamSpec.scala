package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Streaming semantics: the same windowed plan over (a) the events
  * batch table and (b) a MemoryStream replay of the same rows must
  * produce identical final windows (watermark passed, append mode).
  */
class EventStreamSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("stream replay of events equals batch windowed aggregation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val batch = Tables.events(spark, dir)
      .select(col("ts"), col("event_type"), col("value"))
    val rows = batch.as[(Timestamp, String, Double)].collect().sortBy(_._1.getTime)
    assert(rows.length === 1000)

    val input = MemoryStream[(Timestamp, String, Double)]
    val streamed = EventStream.windowedTypeCounts(
      input.toDF().toDF("ts", "event_type", "value"))
    val q = streamed.writeStream
      .format("memory").queryName("stream_out").outputMode("append").start()
    try {
      // feed in two chunks, then a far-future row to advance the
      // watermark past every real window so append emits them all
      val (first, rest) = rows.splitAt(rows.length / 2)
      input.addData(first.toSeq)
      q.processAllAvailable()
      input.addData(rest.toSeq)
      q.processAllAvailable()
      input.addData(Seq((Timestamp.valueOf("2030-01-01 00:00:00"), "flush", 0.0)))
      q.processAllAvailable()

      val got = spark.table("stream_out")
        .filter(col("event_type") =!= "flush")
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val want = EventStream.windowedTypeCounts(batch)
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(got === want)
      assert(want.nonEmpty)
    } finally q.stop()
  }

  test("windowed Misra-Gries sketch: stream replay equals batch (exact regime)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val batch = Tables.events(spark, dir)
      .select(col("ts"), col("event_type"), col("user_id"))
    val rows = batch.as[(Timestamp, String, Long)].collect().sortBy(_._1.getTime)

    val input = MemoryStream[(Timestamp, String, Long)]
    val streamed = EventStream.windowedTopUsers(
      input.toDF().toDF("ts", "event_type", "user_id"))
    val q = streamed.writeStream
      .format("memory").queryName("mg_stream_out").outputMode("append").start()
    try {
      // two chunks exercise cross-micro-batch STATE merges of the
      // typed-imperative buffer; the flush row closes every window
      val (first, rest) = rows.splitAt(rows.length / 2)
      input.addData(first.toSeq)
      q.processAllAvailable()
      input.addData(rest.toSeq)
      q.processAllAvailable()
      input.addData(Seq((Timestamp.valueOf("2030-01-01 00:00:00"), "flush", 0L)))
      q.processAllAvailable()

      def keyOf(r: org.apache.spark.sql.Row) =
        (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3))
      val got = spark.table("mg_stream_out")
        .filter(col("event_type") =!= "flush")
        .collect().map(keyOf).toSet
      val want = EventStream.windowedTopUsers(batch)
        .collect().map(keyOf).toSet
      assert(want.nonEmpty)
      assert(got === want)
    } finally q.stop()
  }

  test("stream-static enrichment join equals the batch broadcast join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val batch = Tables.events(spark, dir)
      .select(col("ts"), col("user_id"), col("event_type"), col("value"))
    val rows = batch.as[(Timestamp, Long, String, Double)].collect().sortBy(_._1.getTime)
    val dim = Tables.customer(spark, dir)

    val input = MemoryStream[(Timestamp, Long, String, Double)]
    val streamed = EventStream.enrichedSegmentActivity(
      input.toDF().toDF("ts", "user_id", "event_type", "value"), dim)
    val q = streamed.writeStream
      .format("memory").queryName("enrich_out").outputMode("append").start()
    try {
      val (first, rest) = rows.splitAt(rows.length / 2)
      input.addData(first.toSeq)
      q.processAllAvailable()
      input.addData(rest.toSeq)
      q.processAllAvailable()
      // watermark flush: user_id 0 exists in the dimension, so the
      // row joins and its far-future ts closes every real window
      input.addData(Seq((Timestamp.valueOf("2030-01-01 00:00:00"), 0L, "flush", 0.0)))
      q.processAllAvailable()

      def key(r: org.apache.spark.sql.Row) =
        (r.getTimestamp(0), r.getString(1), r.getString(2), r.getLong(3), r.getDouble(4))
      val got = spark.table("enrich_out")
        .filter(col("event_type") =!= "flush").collect().map(key).toSet
      val want = EventStream.enrichedSegmentActivity(batch, dim)
        .collect().map(key).toSet
      assert(got === want)
      assert(want.nonEmpty)
    } finally q.stop()
  }

  test("stateful sessionization: incremental stream equals batch result") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val gap = 30 * 60 * 1000L
    val batchRows = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("value"))
      .as[(Long, Timestamp, Double)].collect().sortBy(_._2.getTime)
    val want = EventStream.sessionizeBatch(spark, dir, gap)
      .collect().map(s => (s.user_id, s.session_start, s.session_end, s.n_events)).toSet

    // streaming mode: feed time-ordered chunks; GroupState carries the
    // open session across micro-batches. NoTimeout means tail sessions
    // stay open, so compare only sessions closed by a later event and
    // flush with a far-future event per user.
    val input = MemoryStream[(Long, Timestamp, Double)]
    val flush = batchRows.map(_._1).distinct
      .map(u => (u, Timestamp.valueOf("2031-01-01 00:00:00"), 0.0))
    val q = EventStream.sessionize(input.toDS(), gap)
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      batchRows.grouped(250).foreach { chunk =>
        input.addData(chunk.toSeq); q.processAllAvailable()
      }
      input.addData(flush.toSeq); q.processAllAvailable()
      val got = spark.table("sessions_out")
        .filter(col("session_start") < "2030-01-01")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
      assert(got === want)
    } finally q.stop()
  }

  test("windowed gaps-and-islands sessionize equals the stateful operator") {
    val stateful = EventStream.sessionizeBatch(spark, dir)
      .collect()
      .map(s => (s.user_id, s.session_start, s.session_end, s.n_events,
        math.rint(s.sum_value * 1e4))).toSet
    val windowed = EventStream.sessionizeBatchWindowed(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3),
        math.rint(r.getDouble(4) * 1e4))).toSet
    assert(windowed === stateful)
    assert(windowed.nonEmpty)
  }

  test("native session_window equals the custom sessionize modulo the gap-extended end") {
    // third engine path, same 30-min semantics: identical sessions,
    // native end = last event + gap. (Contract edge: an EXACT 1800 s
    // gap merges in the custom form (> cut) but splits in the native
    // half-open window — the fixture plants none, and the DuckDB
    // oracle for session_native encodes the native >= rule.)
    val native = graft.operators.StreamOps.sessionNative(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2).getTime, r.getLong(3),
        math.rint(r.getDouble(4) * 1e4))).toSet
    val custom = graft.operators.StreamOps.sessionize(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1),
        r.getTimestamp(2).getTime + 30L * 60L * 1000L, r.getLong(3),
        math.rint(r.getDouble(4) * 1e4))).toSet
    assert(native === custom)
    assert(native.nonEmpty)
  }

  test("native session_window: incremental stream replay equals batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch = Tables.events(spark, dir).select(col("user_id"), col("ts"), col("value"))
    val rows = batch.as[(Long, Timestamp, Double)].collect().sortBy(_._2.getTime)
    val input = MemoryStream[(Long, Timestamp, Double)]
    val streamed = graft.operators.StreamOps.sessionNativeOf(
      input.toDF().toDF("user_id", "ts", "value"))
    val q = streamed.writeStream
      .format("memory").queryName("session_native_out")
      .outputMode("append").start()
    try {
      val (first, rest) = rows.splitAt(rows.length / 2)
      input.addData(first.toSeq)
      q.processAllAvailable()
      input.addData(rest.toSeq)
      q.processAllAvailable()
      // far-future row closes every real session past the watermark
      input.addData(Seq((-1L, Timestamp.valueOf("2030-01-01 00:00:00"), 0.0)))
      q.processAllAvailable()
      val got = spark.table("session_native_out")
        .filter(col("user_id") =!= -1L)
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3),
          math.rint(r.getDouble(4) * 1e4))).toSet
      val want = graft.operators.StreamOps.sessionNativeOf(batch)
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3),
          math.rint(r.getDouble(4) * 1e4))).toSet
      assert(got === want)
      assert(want.nonEmpty)
    } finally q.stop()
  }

  test("foreachBatch incremental CDC merge converges to the single-batch merge") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the Delta-style streaming upsert sink on plain files: each
    // micro-batch of change rows MERGEs (applyCdc) into a versioned
    // parquet state dir; the final state must equal applying every
    // change in one batch. Keys are disjoint across chunks, so
    // incremental == single-shot by merge semantics.
    val tmp = java.nio.file.Files.createTempDirectory("graft_fbmerge").toString
    val base = (0L until 200L).map(k => (k, s"v$k", 1.0)).toDF("id", "name", "v")
    base.write.parquet(s"$tmp/state_v0")
    def chunk(c: Int): Seq[(Long, String, Double, String)] = {
      val u = (0 until 5).map(i => (c * 10L + i, s"u${c * 10 + i}", 2.0, "U"))
      val d = (0 until 5).map(i => (100L + c * 10 + i, "", 0.0, "D"))
      val ins = (0 until 5).map(i => (1000L + c * 10 + i, s"n${c * 10 + i}", 3.0, "I"))
      u ++ d ++ ins
    }
    val input = MemoryStream[(Long, String, Double, String)]
    @volatile var cur = 0L
    val q = input.toDF().toDF("id", "name", "v", "op")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val state = spark.read.parquet(s"$tmp/state_v$cur")
        graft.operators.Relational.applyCdc(state, batch, "id")
          .write.parquet(s"$tmp/state_v${id + 1}")
        cur = id + 1
      }
      .start()
    try {
      (0 until 3).foreach { c => input.addData(chunk(c)); q.processAllAvailable() }
    } finally q.stop()
    val got = spark.read.parquet(s"$tmp/state_v$cur").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val all = (0 until 3).flatMap(chunk).toDF("id", "name", "v", "op")
    val want = graft.operators.Relational.applyCdc(base, all, "id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got === want)
    assert(got.exists(_._2.startsWith("u")) && got.exists(_._2.startsWith("n")))
    val deleted = (0 until 3).flatMap(c => (0 until 5).map(i => 100L + c * 10 + i)).toSet
    assert(!got.exists(t => deleted(t._1)), "deleted keys must be gone")
  }

  test("streaming dedup drops replayed event_ids; batch parity holds") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"))
      .as[(Long, Timestamp, Long)].collect().sortBy(_._2.getTime)
    val input = MemoryStream[(Long, Timestamp, Long)]
    val q = EventStream.dedupEvents(
      input.toDF().toDF("event_id", "ts", "user_id"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      // at-least-once transport: every chunk is delivered twice, and
      // the tail of each chunk is replayed at the head of the next
      val chunks = rows.grouped(250).toSeq
      chunks.zipWithIndex.foreach { case (chunk, i) =>
        val replayed = if (i == 0) chunk else chunks(i - 1).takeRight(50) ++ chunk
        input.addData(replayed.toSeq); q.processAllAvailable()
        input.addData(chunk.toSeq); q.processAllAvailable() // full redelivery
      }
      val got = spark.table("dedup_out").select("event_id")
        .collect().map(_.getLong(0)).sorted
      val want = rows.map(_._1).sorted
      assert(got.length === want.length, "every replay must be dropped")
      assert(got === want)
    } finally q.stop()
  }

  test("stateful keep-latest: final streamed state equals batch compact_latest") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val want = graft.operators.StreamOps.compactLatest(spark, dir)
      .collect()
      .map(r => ((r.getLong(0), r.getString(1)), (r.getLong(2), r.getTimestamp(3))))
      .toMap
    val rows = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("event_id"), col("ts"), col("value"))
      .as[(Long, String, Long, Timestamp, Double)].collect()
    // batch parity: one pass over the whole dataset
    val batchGot = EventStream.latestByKey(rows.toSeq.toDS())
      .collect().map(l => ((l.user_id, l.event_type), (l.event_id, l.ts))).toMap
    assert(batchGot === want)
    // stream parity under adversarial delivery: reverse-time order in
    // chunks, with the previous chunk's head replayed (at-least-once)
    val disordered = rows.sortBy(r => -r._4.getTime)
    val input = MemoryStream[(Long, String, Long, Timestamp, Double)]
    val q = EventStream.latestByKey(input.toDS())
      .writeStream.format("memory").queryName("latest_out")
      .outputMode("update").start()
    try {
      val chunks = disordered.grouped(300).toSeq
      chunks.zipWithIndex.foreach { case (chunk, i) =>
        val withReplay = if (i == 0) chunk else chunks(i - 1).take(40) ++ chunk
        input.addData(withReplay.toSeq); q.processAllAvailable()
      }
      // update-mode memory sink appends every emitted update; the LAST
      // row per key is the final state a real upsert sink would hold
      val got = spark.table("latest_out").collect()
        .map(r => ((r.getLong(0), r.getString(1)), (r.getLong(2), r.getTimestamp(3))))
        .foldLeft(Map.empty[(Long, String), (Long, Timestamp)])(_ + _)
      assert(got === want)
      assert(want.nonEmpty)
    } finally q.stop()
  }

  test("stream-stream interval join (attribution) equals the batch join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch = Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
    val want = EventStream.viewClickAttribution(batch)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet

    val rows = batch.as[(Long, Timestamp, Long, String)].collect().sortBy(_._2.getTime)
    val input = MemoryStream[(Long, Timestamp, Long, String)]
    val q = EventStream.viewClickAttribution(
      input.toDF().toDF("event_id", "ts", "user_id", "event_type"))
      .writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()
    try {
      rows.grouped(250).foreach { chunk =>
        input.addData(chunk.toSeq); q.processAllAvailable()
      }
      // advance watermarks past every real event so all pairs emit
      input.addData(Seq((-1L, Timestamp.valueOf("2031-01-01 00:00:00"), -1L, "view"),
        (-2L, Timestamp.valueOf("2031-01-01 00:00:00"), -1L, "click")))
      q.processAllAvailable()
      val got = spark.table("attr_out")
        .filter(col("click_id") >= 0 && col("view_id") >= 0)
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
      assert(got === want)
      assert(want.nonEmpty)
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER interval join equals the batch left join (r9 item)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch = Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
    val want = EventStream.viewClickAttributionOuter(batch)
      .collect()
      .map(r => (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(want.exists(_._2 == -1L),
      "fixture must contain unmatched clicks or the outer semantics are untested")

    val rows = batch.as[(Long, Timestamp, Long, String)].collect().sortBy(_._2.getTime)
    val input = MemoryStream[(Long, Timestamp, Long, String)]
    val q = EventStream.viewClickAttributionOuter(
      input.toDF().toDF("event_id", "ts", "user_id", "event_type"))
      .writeStream.format("memory").queryName("attr_outer_out")
      .outputMode("append").start()
    try {
      rows.grouped(250).foreach { chunk =>
        input.addData(chunk.toSeq); q.processAllAvailable()
      }
      // two-stage sentinel drain: stage 1 advances both watermarks
      // past every real row AT BATCH END; stage 2 runs UNDER that
      // watermark, evicting remaining click state and emitting the
      // unmatched rows — completeness must not depend on the engine
      // scheduling no-data batches
      Seq("2031-01-01 00:00:00", "2031-01-02 00:00:00").foreach { ts =>
        input.addData(Seq((-1L, Timestamp.valueOf(ts), -1L, "view"),
          (-2L, Timestamp.valueOf(ts), -1L, "click")))
        q.processAllAvailable()
      }
      val got = spark.table("attr_outer_out")
        .filter(col("user_id") >= 0)
        .collect()
        .map(r => (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
      assert(got === want)
    } finally q.stop()
  }

  test("sliding windows produce one row per window a user is active in") {
    val out = EventStream.slidingUserActivity(Tables.events(spark, dir)).collect()
    assert(out.nonEmpty)
    // 5-min window, 1-min slide: every event lands in exactly 5 windows
    val totalEvents = Tables.events(spark, dir).count()
    assert(out.map(_.getLong(2)).sum === totalEvents * 5)
  }
}
