package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** File-source streaming ingest — the incremental-backfill pattern: a
  * directory of parquet shards consumed as a stream with
  * Trigger.AvailableNow (process everything present, then stop),
  * checkpointed so a rerun picks up only NEW shards. This is how a
  * 100 TB corpus lands incrementally: the same windowed plan that
  * serves live ingestion replays history shard by shard with bounded
  * state, instead of one giant batch.
  */
class FileStreamSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("parquet-directory stream with AvailableNow equals the batch aggregation") {
    val tmp = Files.createTempDirectory("graft_fstream").toString
    val in = s"$tmp/in"
    val ckpt = s"$tmp/ckpt"
    // land the fixture as two "arriving" shards
    val ev = Tables.events(spark, dir)
    ev.filter(col("user_id") % 2 === 0).write.parquet(s"$in/shard=0")
    ev.filter(col("user_id") % 2 === 1).write.parquet(s"$in/shard=1")

    val stream = spark.readStream
      .schema(ev.schema)
      .option("pathGlobFilter", "*.parquet")
      .option("recursiveFileLookup", "true")
      .parquet(in)
    val q = EventStream.windowedTypeCounts(stream)
      .writeStream.format("memory").queryName("fstream_out")
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    // append mode emits only watermark-closed windows (watermark =
    // max event time − 2 h delay; a window closes when the watermark
    // passes its END). Gate on a horizon safely inside that boundary
    // and assert those windows all emitted with exact batch counts.
    val maxTs = ev.agg(max(col("ts"))).collect()(0).getTimestamp(0)
    val got = spark.table("fstream_out")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val want = EventStream.windowedTypeCounts(ev)
      .filter(col("window_start") + expr("INTERVAL 1 HOUR")
        < to_timestamp(lit(maxTs)) - expr("INTERVAL 2 HOURS"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(got.nonEmpty)
    assert(want.subsetOf(got), s"missing ${(want -- got).take(3)}")
  }

  test("checkpointed file sink: stop mid-stream, restart, exactly-once output") {
    val tmp = Files.createTempDirectory("graft_fsink").toString
    val in = s"$tmp/in"; val out = s"$tmp/out"; val ckpt = s"$tmp/ckpt"
    val ev = Tables.events(spark, dir)

    // one run = drain whatever is CURRENTLY in the input dir, then
    // stop — so run 1 ends with the stream down while unprocessed
    // input still lies ahead (the deterministic form of a mid-stream
    // kill: the checkpoint is mid-input, exactly as after a crash
    // between micro-batch commits). maxFilesPerTrigger=1 forces one
    // commit per shard, so the restart resumes a multi-batch log.
    def run(): Long = {
      val q = spark.readStream.schema(ev.schema)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", "1")
        .parquet(in)
        .select(col("event_id"), col("user_id"), col("value"))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      q.recentProgress.map(_.numInputRows).sum
    }

    ev.filter(col("user_id") % 4 === 0).write.parquet(s"$in/w0")
    ev.filter(col("user_id") % 4 === 1).write.parquet(s"$in/w1")
    run()
    // wave 2 lands while the query is DOWN
    ev.filter(col("user_id") % 4 === 2).write.parquet(s"$in/w2")
    ev.filter(col("user_id") % 4 === 3).write.parquet(s"$in/w3")
    val run2Rows = run()

    // restart processed ONLY the new shards — no replay of committed batches
    val wave2 = ev.filter(col("user_id") % 4 >= 2).count()
    assert(run2Rows == wave2, s"restart replayed committed input: $run2Rows != $wave2")

    // the sink output is exactly the batch answer: no loss, no dups
    val got = spark.read.parquet(out).select("event_id").collect().map(_.getLong(0)).sorted
    val want = ev.select("event_id").collect().map(_.getLong(0)).sorted
    assert(got.sameElements(want), s"${got.length} sink rows vs ${want.length} batch rows")

    // exactly-once is the MANIFEST's doing: a stray uncommitted file
    // (a crashed task attempt's leftover) is invisible to readers
    val committed = new java.io.File(out).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
    java.nio.file.Files.copy(committed.head.toPath,
      new java.io.File(out, "part-stray-attempt.snappy.parquet").toPath)
    val after = spark.read.parquet(out).count()
    assert(after == want.length.toLong,
      s"stray uncommitted file leaked into the manifest read: $after rows")
  }

  test("dropDuplicatesWithinWatermark: dedups inside the horizon, evicts state past it") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_sdedup").toString
    def write(sub: String, rows: Seq[(Long, java.sql.Timestamp)], mtimeOff: Long): Unit = {
      rows.toDF("event_id", "ts").coalesce(1)
        .write.mode("overwrite").parquet(s"$tmp/in/$sub")
      val now = System.currentTimeMillis()
      new java.io.File(s"$tmp/in/$sub").listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .foreach(_.setLastModified(now + mtimeOff))
    }
    def ts(min: Long) = java.sql.Timestamp.from(
      java.time.Instant.parse("2024-06-01T00:00:00Z").plusSeconds(min * 60))
    // batch 1: ids 1,2 at t0; a rider at t0+180min drags the watermark
    // to t0+120min at batch end (delay 1h), evicting ids 1,2 from state
    write("b0", Seq((1L, ts(0)), (2L, ts(0)), (99L, ts(180))), 0L)
    // batch 2: a spacer — eviction runs at each batch's COMMIT with
    // the watermark computed from the PREVIOUS batch, so ids 1,2
    // (expiry t0+60 < t0+120) are physically removed at this batch's
    // end, not batch 1's
    write("b1", Seq((50L, ts(185))), 60000L)
    // batch 3: id 1 re-arrives ABOVE the watermark (not late) but past
    // its first instance's expiry → state evicted → re-emitted
    // (bounded state, the documented trade); id 99's state (expiry
    // t0+240) is still live → dropped
    write("b2", Seq((1L, ts(190)), (99L, ts(190))), 120000L)
    val q = spark.readStream
      .schema("event_id BIGINT, ts TIMESTAMP")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$tmp/in/*")
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.format("memory").queryName("sdedup_out")
      .option("checkpointLocation", s"$tmp/ckpt")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("sdedup_out").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1))).toSeq
    val ids = got.map(_._1).groupBy(identity).view.mapValues(_.size).toMap
    assert(ids(2L) === 1 && ids(99L) === 1 && ids(50L) === 1,
      s"unique ids must emit once: $got")
    assert(ids(1L) === 2,
      s"id 1 re-arrived past the watermark horizon — state was evicted, so it re-emits: $got")
  }
}
