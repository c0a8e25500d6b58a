package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, timestamp_micros}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Fixture-schema CONTRACT gate (round-10 postmortem). The driver
  * regenerates `/root/testdata` between rounds and has already drifted
  * physical types once (`events.ts`: TIMESTAMP(NANOS) → timestamp[us],
  * 2026-08-13), which silently killed 37 registered queries at
  * analysis time because the loader bound to a REMEMBERED type. This
  * spec makes the next drift fail ONE loud test naming the column:
  *
  *   - every fixture table, loaded through [[Tables]], must present
  *     exactly the logical schema the operator surface is written
  *     against (post-normalization — the loader may adapt, the
  *     OUTPUT contract may not);
  *   - [[Tables.normalizeEventsTs]] must handle every physical shape
  *     the fixture has ever shipped (epoch-nanos long, TIMESTAMP_NTZ
  *     micros, real TIMESTAMP) and produce identical values;
  *   - an unknown shape must fail loudly at load, not downstream.
  */
class FixtureSchemaSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  /** name → expected logical type per column, in order. Timestamp-ish
    * fixture columns may arrive NTZ or LTZ depending on the writer's
    * annotation — both are acceptable for date-only columns (all
    * comparisons/oracles are value-level under a UTC session), so
    * they are matched by a predicate, not equality. */
  private def tsLike(dt: DataType): Boolean =
    dt == TimestampType || dt == TimestampNTZType

  private def assertSchema(table: String, df: DataFrame,
      expected: Seq[(String, DataType => Boolean, String)]): Unit = {
    val actual = df.schema.fields
    assert(actual.map(_.name).toSeq === expected.map(_._1),
      s"FIXTURE DRIFT: $table columns changed — engine contract vs $sfDir/$table.parquet")
    expected.zip(actual).foreach { case ((name, ok, want), field) =>
      assert(ok(field.dataType),
        s"FIXTURE DRIFT: $table.$name is ${field.dataType.simpleString}, engine expects $want " +
          s"— update graft.sources.Tables (and FIXTURES.md) for the new physical type")
    }
  }

  private def is(dt: DataType)(x: DataType): Boolean = x == dt

  test("every fixture table presents the contracted logical schema") {
    assertSchema("region", Tables.region(spark, sfDir), Seq(
      ("r_regionkey", is(IntegerType), "int"), ("r_name", is(StringType), "string")))
    assertSchema("nation", Tables.nation(spark, sfDir), Seq(
      ("n_nationkey", is(IntegerType), "int"), ("n_name", is(StringType), "string"),
      ("n_regionkey", is(IntegerType), "int")))
    assertSchema("customer", Tables.customer(spark, sfDir), Seq(
      ("c_custkey", is(LongType), "bigint"), ("c_name", is(StringType), "string"),
      ("c_nationkey", is(IntegerType), "int"), ("c_acctbal", is(DoubleType), "double"),
      ("c_mktsegment", is(StringType), "string")))
    assertSchema("supplier", Tables.supplier(spark, sfDir), Seq(
      ("s_suppkey", is(LongType), "bigint"), ("s_name", is(StringType), "string"),
      ("s_nationkey", is(IntegerType), "int"), ("s_acctbal", is(DoubleType), "double")))
    assertSchema("part", Tables.part(spark, sfDir), Seq(
      ("p_partkey", is(LongType), "bigint"), ("p_name", is(StringType), "string"),
      ("p_brand", is(StringType), "string"), ("p_type", is(StringType), "string"),
      ("p_size", is(IntegerType), "int"), ("p_retailprice", is(DoubleType), "double")))
    assertSchema("orders", Tables.orders(spark, sfDir), Seq(
      ("o_orderkey", is(LongType), "bigint"), ("o_custkey", is(LongType), "bigint"),
      ("o_orderstatus", is(StringType), "string"), ("o_totalprice", is(DoubleType), "double"),
      ("o_orderdate", tsLike, "timestamp(_ntz)"), ("o_orderpriority", is(StringType), "string")))
    assertSchema("lineitem", Tables.lineitem(spark, sfDir), Seq(
      ("l_orderkey", is(LongType), "bigint"), ("l_partkey", is(LongType), "bigint"),
      ("l_suppkey", is(LongType), "bigint"), ("l_linenumber", is(IntegerType), "int"),
      ("l_quantity", is(DoubleType), "double"), ("l_extendedprice", is(DoubleType), "double"),
      ("l_discount", is(DoubleType), "double"), ("l_tax", is(DoubleType), "double"),
      ("l_returnflag", is(StringType), "string"), ("l_linestatus", is(StringType), "string"),
      ("l_shipdate", tsLike, "timestamp(_ntz)")))
    // events: the loader ADAPTS to the physical type; the OUTPUT
    // contract is a hard TimestampType — every temporal operator
    // (windows, as-of joins, sessionize, streaming parity) builds on it
    assertSchema("events", Tables.events(spark, sfDir), Seq(
      ("event_id", is(LongType), "bigint"), ("ts", is(TimestampType), "timestamp"),
      ("user_id", is(LongType), "bigint"), ("event_type", is(StringType), "string"),
      ("value", is(DoubleType), "double"), ("props", is(StringType), "string")))
    assertSchema("documents", Tables.documents(spark, sfDir), Seq(
      ("doc_id", is(LongType), "bigint"), ("text", is(StringType), "string"),
      ("lang", is(StringType), "string"), ("source", is(StringType), "string"),
      ("n_chars", is(LongType), "bigint")))
    assertSchema("embeddings", Tables.embeddings(spark, sfDir), Seq(
      ("vec_id", is(LongType), "bigint"),
      ("embedding", is(ArrayType(FloatType, containsNull = true)), "array<float>"),
      ("label", is(IntegerType), "int")))
  }

  test("normalizeEventsTs adapts every historical physical shape to identical values") {
    import spark.implicits._
    val micros = Seq(1700000000000000L, 1700000000123456L, 1700003600999999L)
    // (a) epoch-nanos as long — the pre-r10 fixture under nanosAsLong
    val asNanosLong = micros.map(_ * 1000L).toDF("ts")
    // (b) TIMESTAMP_NTZ — the current fixture (timestamp[us], no tz)
    val asNtz = micros.toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
    // (c) real TIMESTAMP — pass-through
    val asLtz = micros.toDF("us").select(timestamp_micros(col("us")).as("ts"))
    val outs = Seq(asNanosLong, asNtz, asLtz).map { df =>
      val norm = Tables.normalizeEventsTs(df)
      assert(norm.schema("ts").dataType === TimestampType)
      norm.select(org.apache.spark.sql.functions.unix_micros(col("ts")))
        .as[Long].collect().sorted.toSeq
    }
    assert(outs(0) === micros && outs(1) === micros && outs(2) === micros)
  }

  test("an unknown ts physical type fails loudly at load, not downstream") {
    import spark.implicits._
    val bad = Seq("2023-11-14").toDF("ts") // string ts: never shipped, must not silently pass
    val e = intercept[IllegalStateException](Tables.normalizeEventsTs(bad))
    assert(e.getMessage.contains("fixture drift"))
  }

  test("events loader adapts a true TIMESTAMP(NANOS) parquet (the pre-r10 fixture shape)") {
    // pre-generated resource (pyarrow timestamp[ns] — Spark cannot
    // write NANOS itself): schema inference must fail WITHOUT the
    // legacy conf, and the loader's retry must enable it, read the
    // nanos as longs, and land on exact micros
    import spark.implicits._
    val res = getClass.getResource("/events_nanos").getPath
    // fresh-session precondition so the retry path actually executes
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    val out = Tables.events(spark, res)
    assert(out.schema("ts").dataType === TimestampType)
    val us = out.select(org.apache.spark.sql.functions.unix_micros(col("ts")))
      .as[Long].collect().sorted.toSeq
    assert(us === Seq(1700000000000000L, 1700000001500000L))
  }

  test("events loader round-trips through a real nanos-long parquet file") {
    // write an events-shaped table whose ts is epoch-nanos LONG (what
    // the legacy conf used to surface) and load it via Tables.events —
    // proves the adaptive branch, not just the helper
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fixture_schema_spec").toString
    Seq((1L, 1700000000000000000L, 7L, "click", 1.5, "{}"),
        (2L, 1700000001000000000L, 8L, "view", 2.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Tables.events(spark, dir)
    assert(out.schema("ts").dataType === TimestampType)
    val us = out.select(org.apache.spark.sql.functions.unix_micros(col("ts")))
      .as[Long].collect().sorted.toSeq
    assert(us === Seq(1700000000000000L, 1700000001000000L))
  }
}
