package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** File-format connector coverage (SURVEY.md §2.2 row 1): the engine's
  * operators are format-agnostic DataFrame transforms, so CSV/JSON
  * interop only needs the standard readers/writers to round-trip the
  * fixture schemas. Timestamps are the classic loss point — both
  * round-trips pin them explicitly.
  */
class FormatsSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("schema evolution: mergeSchema unions drifted parquet file schemas") {
    // a long-lived table accretes columns over time; readers must see
    // the union schema with nulls where old files lack the column
    val out = Files.createTempDirectory("graft_evolve").toString
    val docs = Tables.documents(spark, dir)
    docs.filter(col("doc_id") < 25).select(col("doc_id"), col("lang"))
      .write.mode("overwrite").parquet(s"$out/v=1")
    docs.filter(col("doc_id") >= 25).select(col("doc_id"), col("lang"), col("n_chars"))
      .write.mode("overwrite").parquet(s"$out/v=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(s"$out/v=1", s"$out/v=2")
    assert(merged.columns.sorted.toSeq == Seq("doc_id", "lang", "n_chars"),
      s"union schema expected, got ${merged.columns.mkString(",")}")
    val total = docs.count()
    assert(merged.count() == total)
    val oldRows = merged.filter(col("doc_id") < 25)
    assert(oldRows.filter(col("n_chars").isNull).count() == oldRows.count(),
      "pre-drift files must surface the new column as null")
    val newNonNull = merged.filter(col("doc_id") >= 25 && col("n_chars").isNotNull).count()
    assert(newNonNull == docs.filter(col("doc_id") >= 25).count())
  }

  test("orders round-trips parquet -> csv -> DataFrame including timestamps") {
    val tmp = Files.createTempDirectory("graft_csv").toString
    val orders = Tables.orders(spark, dir)
    orders.write.option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
      .csv(s"$tmp/orders_csv")
    val back = spark.read.option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
      .schema(orders.schema)
      .csv(s"$tmp/orders_csv")
    assert(back.count() === orders.count())
    val a = orders.orderBy("o_orderkey").collect()
    val b = back.orderBy("o_orderkey").collect()
    assert(a.sameElements(b))
  }

  test("lineitem round-trips parquet -> orc value-exact") {
    val tmp = Files.createTempDirectory("graft_orc").toString
    val li = Tables.lineitem(spark, dir)
    li.write.orc(s"$tmp/li_orc")
    val back = spark.read.orc(s"$tmp/li_orc")
    assert(back.count() === li.count())
    val a = li.orderBy("l_orderkey", "l_linenumber").collect()
    val b = back.orderBy("l_orderkey", "l_linenumber").collect()
    assert(a.sameElements(b))
  }

  test("events round-trips parquet -> json -> aggregation parity") {
    val tmp = Files.createTempDirectory("graft_json").toString
    val events = Tables.events(spark, dir)
    events.write.json(s"$tmp/events_json")
    val back = spark.read.schema(events.schema).json(s"$tmp/events_json")
    assert(back.count() === events.count())
    // aggregation over the JSON copy must equal the parquet original
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("event_type").agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(30,4)")).cast("double").as("s"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(agg(back) === agg(events))
  }

  test("malformed CSV records: PERMISSIVE captures, DROPMALFORMED excises, count agrees") {
    // at 100 TB some records are ALWAYS malformed — ingestion must
    // quarantine them deterministically, not fail the job or silently
    // corrupt rows
    val tmp = Files.createTempDirectory("graft_badcsv").toString
    val lines = Seq(
      "1,alpha,10.5",
      "2,beta,not_a_number", // unparseable double
      "3,gamma,30.25",
      "4,delta",             // missing column
      "5,epsilon,50.0")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(tmp, "rows.csv"),
      String.join("\n", lines: _*).getBytes("UTF-8"))
    val schema = "id LONG, name STRING, v DOUBLE, _bad STRING"
    val permissive = spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_bad")
      .csv(tmp)
      .cache() // PERMISSIVE corrupt-column semantics require a materialized read
    val good = permissive.filter(col("_bad").isNull)
      .select("id", "name", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(good === Set((1L, "alpha", 10.5), (3L, "gamma", 30.25), (5L, "epsilon", 50.0)))
    val quarantined = permissive.filter(col("_bad").isNotNull)
      .select("_bad").collect().map(_.getString(0)).toSet
    assert(quarantined === Set("2,beta,not_a_number", "4,delta"),
      "the raw malformed lines must be preserved for repair")
    // count() prunes every column, so the parser never sees the bad
    // fields and drops nothing — materialize the columns to count
    // what DROPMALFORMED actually keeps
    val dropped = spark.read.schema("id LONG, name STRING, v DOUBLE")
      .option("mode", "DROPMALFORMED").csv(tmp)
      .select("id", "name", "v").collect()
    assert(dropped.map(_.getLong(0)).toSet === Set(1L, 3L, 5L))
  }
}
