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

  test("reconRule: header totals reconcile within tolerance, corrupt ones counted") {
    import spark.implicits._
    // order 1 reconciles exactly; order 2 is off by far more than the
    // 0.01 tolerance; order 3 has no detail rows and a nonzero header
    val orders = Seq((1L, 220.0), (2L, 500.0), (3L, 10.0))
      .toDF("o_orderkey", "o_totalprice")
    val lineitem = Seq(
      (1L, 100.0, 0.0, 0.1),  // 110
      (1L, 100.0, 0.0, 0.1),  // 110 → order 1 sums to 220
      (2L, 100.0, 0.1, 0.0))  // 90  ≠ 500
      .toDF("l_orderkey", "l_extendedprice", "l_discount", "l_tax")
    val out = DataQuality.reconRule("recon", orders, lineitem)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(("recon", 2L, 3L)))
  }

  test("the fixture audit reports zero violations outside the recon rule") {
    val rows = DataQuality.dqChecks(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length === 10)
    val (recon, rest) = rows.partition(_._1 == "orders_totalprice_recon")
    assert(rest.forall(_._2 === 0L),
      s"unexpected violations: ${rest.filter(_._2 != 0).mkString(",")}")
    assert(rows.forall(_._3 > 0L))
    // the synthetic header totals were generated independently of the
    // detail rows, so the reconciliation rule correctly flags EVERY
    // order — the check demonstrably bites (reconRule's planted-case
    // test above pins the pass/fail boundary)
    assert(recon.head._2 === recon.head._3,
      "fixture is known-unreconciled; the rule must flag every order")
  }
}
