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
}
