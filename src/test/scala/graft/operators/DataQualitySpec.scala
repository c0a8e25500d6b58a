package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted-violation checks for each DataQuality rule shape — the
  * fixture tables are clean (the registered oracle proves zeros), so
  * the rule LOGIC is pinned here on frames with known-bad rows. */
class DataQualitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("intraRules counts each predicate over one table pass") {
    import spark.implicits._
    val df = Seq((1L, 5.0), (2L, -3.0), (3L, 0.0), (4L, Double.NaN))
      .toDF("id", "v")
    val out = DataQuality.intraRules(df, Seq(
      "v_positive" -> (col("v") <= 0.0),
      "v_finite" -> isnan(col("v"))))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // NaN <= 0.0 is false, so v_positive counts only -3.0 and 0.0
    assert(out === Set(("v_positive", 2L, 4L), ("v_finite", 1L, 4L)))
  }

  test("fkRule counts orphans only") {
    import spark.implicits._
    val fact = Seq((10L, "a"), (11L, "b"), (99L, "c"), (99L, "d")).toDF("fk", "x")
    val dim = Seq(10L, 11L, 12L).toDF("pk")
    val out = DataQuality.fkRule("orphans", fact, "fk", dim, "pk")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(("orphans", 2L, 4L)))
  }

  test("uniqueRule counts every row of a duplicated key") {
    import spark.implicits._
    val df = Seq(1L, 2L, 2L, 3L, 3L, 3L).toDF("k2").withColumnRenamed("k2", "key")
    val out = DataQuality.uniqueRule("dups", df, "key")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(("dups", 5L, 6L)))
  }

  test("the fixture audit reports zero violations with full checked counts") {
    val rows = DataQuality.dqChecks(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length === 9)
    assert(rows.forall(_._2 === 0L), s"unexpected violations: ${rows.filter(_._2 != 0).mkString(",")}")
    assert(rows.forall(_._3 > 0L))
  }
}
