package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.CacheScope.ScopedDataset
import graft.sources.Tables

/** Relational operator surface over the star-schema fixtures
  * (SURVEY.md §2.2 / §7.2 step 2).
  *
  * The reference has no joins, windows, sorts or set ops — its only
  * keyed operator is MapReduce (SURVEY.md §2) — so this module is the
  * "same query capability, generalized" half of the north star:
  * filter/project, joins of every flavor, the aggregation framework,
  * windows, top-k, set ops, and scalar/date/JSON functions, each as a
  * declarative plan Catalyst can optimize (pushdown, partial aggs,
  * broadcast selection, AQE).
  *
  * Determinism discipline (driver hash-compares against DuckDB):
  * - double sums go through DECIMAL(30,s): decimal addition is exact
  *   and order-insensitive, plain double sums are not;
  * - every ORDER BY ... LIMIT has a unique-key tiebreak;
  * - integer outputs are cast to BIGINT on both sides.
  *
  * Scale notes (100 TB): dimension joins (region/nation/customer-dim)
  * are explicitly `broadcast()`; fact-fact joins shuffle on their join
  * keys and rely on AQE for skew; aggregations are partial+final by
  * construction. No collect(), no coalesce(1) anywhere.
  */
object Relational {

  /** Order-insensitive exact sum of a double column: cast to decimal,
    * sum exactly, cast back. */
  private def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(30, scale))).cast("double")

  private def ts(s: String): Column = to_timestamp(lit(s))

  // ---- TPC-H-shaped headline queries -------------------------------

  /** Q1 shape: scan-heavy single-table aggregation. */
  def q1Pricing(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= ts("2000-12-01"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 6).as("sum_charge"),
        (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))

  /** Q3 shape: 3-way join + agg + deterministic top-10. */
  def q3Shipping(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, dir).filter(col("o_orderdate") < ts("1998-01-01"))
    val l = Tables.lineitem(spark, dir).filter(col("l_shipdate") > ts("1998-01-01"))
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey").asc)
      .limit(10)
  }

  /** Q5 shape: 6-way join through the dimension chain; dims broadcast. */
  def q5LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val n = Tables.nation(spark, dir)
    val c = Tables.customer(spark, dir)
    val s = Tables.supplier(spark, dir)
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1998-01-01"))
    val l = Tables.lineitem(spark, dir)
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .join(s, col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("revenue"))
  }

  /** Q7 shape: two-nation volume shipping — the double-dimension join
    * (supplier nation AND customer nation) plus a symmetric OR
    * predicate, grouped by year. Both nation dims broadcast; the
    * fact-side chain shuffles only on its join keys. */
  def q7Volume(spark: SparkSession, dir: String): DataFrame = {
    val n1 = Tables.nation(spark, dir).select(
      col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(spark, dir).select(
      col("n_nationkey").as("c_nkey"), col("n_name").as("cust_nation"))
    Tables.supplier(spark, dir)
      .join(Tables.lineitem(spark, dir), col("s_suppkey") === col("l_suppkey"))
      .join(Tables.orders(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(spark, dir), col("c_custkey") === col("o_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nkey"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nkey"))
      .filter(
        (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("revenue"))
  }

  /** Q10 shape: returned-item reporting — 4-way join, one quarter of
    * orders, revenue per customer, deterministic top-20. */
  def q10Returns(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1996-04-01"))
    val l = Tables.lineitem(spark, dir).filter(col("l_returnflag") === "R")
    Tables.customer(spark, dir)
      .join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)
  }

  /** Q4 shape: order-priority checking — date-sliced orders semi-joined
    * to a filtered fact (EXISTS), counted per priority. The semi-join
    * shuffles only (orderkey) from the fact side; at 100 TB the date
    * slice prunes partitions before anything joins. */
  def q4Priority(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= ts("1996-07-01") && col("o_orderdate") < ts("1996-10-01"))
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R").select("l_orderkey")
    o.join(l, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
  }

  /** Q6 shape: forecasting revenue change — pure filter + single
    * global aggregate. The whole query is one codegen'd scan stage:
    * every predicate reaches PushedFilters, the projection is two
    * columns, and the agg is partial+final with a 1-row final. */
  def q6Forecast(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(
        col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1997-01-01") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(dsum(col("l_extendedprice") * col("l_discount"), 6).as("revenue"))

  /** Q18 shape: large-volume customers — a HAVING-filtered fact
    * aggregation joined back to its parents, deterministic top-100.
    * The having filter runs on the aggregated (tiny) side, so the
    * join-back is broadcast-able at any scale where "large volume" is
    * selective. */
  def q18Volume(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(dsum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > 150.0)
    Tables.orders(spark, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)
  }

  /** Q12 shape: conditional aggregation after a fact-fact join —
    * per line status, how many lines belong to high- vs low-priority
    * orders in one shipping year. The CASE sums fold into one
    * partial+final aggregate; the join shuffles on the order key
    * (both sides fact-sized — the shape AQE skew-handles at scale). */
  def q12Priority(spark: SparkSession, dir: String): DataFrame = {
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1997-01-01"))
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_linestatus")
      .agg(
        sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
  }

  /** Q14 shape: promo revenue share — a ratio of two conditional
    * decimal-exact sums over one lineitem⋈part join (part broadcasts).
    * Both sums ride one partial+final aggregate; the division of the
    * two exact-decimal-derived doubles is a single exactly-rounded
    * IEEE op, so the ratio hash-matches cross-engine. */
  def q14Promo(spark: SparkSession, dir: String): DataFrame = {
    val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1996-07-01"))
      .join(broadcast(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .agg(
        dsum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0)), 6).as("promo_revenue"),
        dsum(rev, 6).as("total_revenue"))
      .select(col("promo_revenue"), col("total_revenue"),
        (col("promo_revenue") / col("total_revenue") * 100.0).as("promo_pct"))
  }

  /** Q19 shape: disjunctive multi-attribute predicate (OR of ANDs
    * spanning both join sides). Catalyst extracts the common
    * single-side conjuncts from the OR and pushes them below the join
    * (p_size ≤ 15, l_quantity ≤ 30 reach the scans), keeping the
    * cross-side residual on the join — the pushdown pattern naive
    * planners miss entirely. */
  def q19Disjunctive(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30)))
      .agg(count(lit(1)).as("n_lines"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("revenue"))

  /** Q22 shape: anti-join + scalar aggregate subquery — dormant
    * valuable customers: above-average positive balance and no order
    * since 1998, per market segment (every fixture customer has SOME
    * order, so the classic "no orders at all" form would gate zero
    * rows — the recency predicate keeps the identical plan shape with
    * a non-vacuous result). The average arrives as a one-value scalar
    * subquery (driver metadata, no join shape); the dormancy test is
    * a left-anti join on the customer key against the filtered
    * orders. Cross-engine determinism: the mean is compared as the
    * exact DECIMAL sum cast to double divided by the exact count —
    * both single exactly-rounded ops. */
  def q22Balance(spark: SparkSession, dir: String): DataFrame = {
    SqlViews.withViews(spark,
      "customer" -> Tables.customer(spark, dir),
      "orders" -> Tables.orders(spark, dir))(
      """WITH avg_bal AS (
        |  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(30,4))) AS DOUBLE) / count(*) AS a
        |  FROM customer WHERE c_acctbal > 0.0)
        |SELECT c_mktsegment, count(*) AS n_cust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(30,4))) AS DOUBLE) AS total_bal
        |FROM customer
        |WHERE c_acctbal > (SELECT a FROM avg_bal)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
        |GROUP BY c_mktsegment""".stripMargin)
  }

  /** Q2 shape (adapted — the fixture has no partsupp): cheapest part
    * per type via a CORRELATED scalar-min subquery, TPC-H Q2's
    * defining plan feature. Catalyst decorrelates it into an
    * aggregate + self-join on p_type (no per-row re-execution); the
    * min over stored doubles is exact, so the equality filter is
    * cross-engine deterministic. */
  def q2MinCost(spark: SparkSession, dir: String): DataFrame =
    SqlViews.withViews(spark, "part" -> Tables.part(spark, dir))(
      Q2Sql)

  /** Q8 shape: national market share — one nation's fraction of a
    * region's import volume per year. The ratio divides two
    * decimal-exact conditional sums from ONE partial+final aggregate;
    * both nation dims and the region-filtered customer-nation list
    * broadcast. */
  def q8MktShare(spark: SparkSession, dir: String): DataFrame = {
    val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
    val suppNation = Tables.nation(spark, dir).select(
      col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
    val asiaNations = Tables.nation(spark, dir)
      .join(Tables.region(spark, dir).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("c_nkey"))
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderdate") >= ts("1996-01-01") &&
            col("o_orderdate") < ts("1998-01-01")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppNation), col("s_nationkey") === col("s_nkey"))
      .join(broadcast(asiaNations), col("c_nationkey") === col("c_nkey"), "left_semi")
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg((dsum(when(col("supp_nation") === "NATION_1", rev).otherwise(lit(0.0)), 6)
        / dsum(rev, 6)).as("mkt_share"))
  }

  /** Q9 shape: product-type profit by supplier nation and year — the
    * 5-way join through a name-pattern part filter (the filtered part
    * dim broadcasts; profit omits supplycost the fixture lacks). */
  def q9Profit(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir).filter(col("p_name").contains("red"))),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("profit"))

  /** Q11 shape (adapted — no partsupp): per-part revenue for one
    * nation's suppliers, kept only where it exceeds a FRACTION of the
    * nation's total — the scalar-subquery threshold over the same
    * aggregation tree that defines Q11. Share thresholds are
    * scale-free (numerator and denominator both grow linearly), so
    * the shape stays selective at any SF. */
  def q11Important(spark: SparkSession, dir: String): DataFrame =
    SqlViews.withViews(spark,
      "lineitem" -> Tables.lineitem(spark, dir),
      "supplier" -> Tables.supplier(spark, dir),
      "nation"   -> Tables.nation(spark, dir))(
      Q11Sql)

  /** Q13 shape: customer order-count distribution — the left outer
    * join with a predicate INSIDE the join (customers with zero
    * qualifying orders must survive into the c_count = 0 bucket),
    * then a second aggregation over the first. */
  def q13CustDist(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir).filter(col("o_orderpriority") =!= "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))

  /** Q15 shape: top supplier by revenue — the revenue view joined
    * against its own maximum. The max arrives as a 1-row broadcast
    * (never a second shuffle of the view); equality over
    * decimal-exact-derived doubles is deterministic. */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1996-04-01"))
      .groupBy(col("l_suppkey"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("total_revenue"))
    Tables.supplier(spark, dir)
      .join(rev, col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(rev.agg(max(col("total_revenue")).as("mx"))),
        col("total_revenue") === col("mx"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
  }

  /** Q16 shape: distinct supplier counts per part attribute triple —
    * COUNT(DISTINCT) under a multi-attribute dimension filter (the
    * expand+two-phase distinct aggregation path). */
  def q16PartSupp(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)
          .filter(col("p_brand") =!= "Brand#1" &&
            col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))

  /** Q17 shape: small-quantity revenue — the per-part CORRELATED
    * average subquery (Catalyst decorrelates to an aggregate +
    * join). The threshold `0.2 × avg` is one IEEE multiply of the
    * exact decimal-sum-over-exact-count quotient, deterministic
    * cross-engine. */
  def q17SmallQty(spark: SparkSession, dir: String): DataFrame =
    SqlViews.withViews(spark,
      "lineitem" -> Tables.lineitem(spark, dir),
      "part"     -> Tables.part(spark, dir))(
      Q17Sql)

  /** Q20 shape (adapted): suppliers with above-average shipment
    * quantity of a name-pattern part family in one year — the
    * IN-subquery over a HAVING-filtered aggregation (plans as a
    * left-semi join against the aggregated side). The per-supplier
    * AVERAGE is scale-free, so the HAVING stays selective at any
    * SF. */
  def q20Promotion(spark: SparkSession, dir: String): DataFrame =
    SqlViews.withViews(spark,
      "supplier" -> Tables.supplier(spark, dir),
      "lineitem" -> Tables.lineitem(spark, dir),
      "part"     -> Tables.part(spark, dir))(
      Q20Sql)

  /** Q21 shape (adapted — lateness re-expressed against a fixed
    * cutoff since the fixture has no commit/receipt dates): suppliers
    * who shipped late on multi-supplier finished orders where NO
    * other supplier shipped late — EXISTS + NOT EXISTS on the same
    * fact (a left-semi and a left-anti join on l_orderkey),
    * deterministic top-10. */
  def q21Waiting(spark: SparkSession, dir: String): DataFrame =
    SqlViews.withViews(spark,
      "supplier" -> Tables.supplier(spark, dir),
      "lineitem" -> Tables.lineitem(spark, dir),
      "orders"   -> Tables.orders(spark, dir))(
      Q21Sql)

  // ---- core operator surface ---------------------------------------

  /** Pushed-down filter + narrow projection: the scan must show
    * PushedFilters and a 4-column ReadSchema (plan-gated) — the
    * baseline "read less" operator every 100 TB query starts from. */
  def filterProject(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_quantity") >= 30 && col("l_discount") > 0.05 && col("l_returnflag") === "R")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net_price"))

  /** Fact ⋈ two broadcast dimension tables (nation, region) then a
    * rollup — zero wide shuffles for the dimensions at any scale. */
  def joinBroadcastDims(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("sum_bal"))

  private def bigOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).filter(col("o_totalprice") > 400000)

  /** LEFT SEMI join — existence filter (customers WITH a big order);
    * shuffles only the key column, never duplicates rows. */
  def joinSemi(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(bigOrders(spark, dir), col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")

  /** LEFT ANTI join — the negative existence filter (customers with
    * NO big order), the dual of [[joinSemi]]. */
  def joinAnti(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(bigOrders(spark, dir), col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")

  /** LEFT join preserving orderless customers, then a per-customer
    * rollup; nulls fold to zero so the output is null-free gated. */
  def joinLeftAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        coalesce(dsum(col("o_totalprice")), lit(0.0)).as("total_spend"))

  /** FULL OUTER join — the one join type the registry lacked: two
    * keyed daily aggregates whose key sets genuinely diverge (days
    * with only urgent or only high-priority orders orphan on either
    * side), coalesced to a null-free comparison table. The aggregate-
    * then-join shape keeps both inputs |days|-sized regardless of
    * order volume; at 100 TB the join is two tiny sides meeting after
    * their partial+final rollups. */
  def joinFullOuter(spark: SparkSession, dir: String): DataFrame = {
    def daily(prio: String, out: String): DataFrame =
      Tables.orders(spark, dir)
        .filter(col("o_orderpriority") === prio)
        .groupBy(col("o_orderdate").as("day"))
        .agg(count(lit(1)).as(out))
    daily("1-URGENT", "n_urgent")
      .join(daily("2-HIGH", "n_high"), Seq("day"), "full_outer")
      .select(col("day"),
        coalesce(col("n_urgent"), lit(0L)).as("n_urgent"),
        coalesce(col("n_high"), lit(0L)).as("n_high"))
  }

  /** Multi-column exact COUNT DISTINCT per group — expand-based
    * distinct aggregation with partial+final combine. */
  def aggDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))

  /** ROLLUP hierarchy (flag → flag+status → grand total) in one
    * pass — the expand operator emits all grouping levels map-side. */
  def aggRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))

  /** CUBE over (status, priority) — all four grouping-set levels in
    * one expand+aggregate pass, no re-scan per level. */
  def aggCube(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))

  /** GROUPING SETS — only expressible through the SQL surface (the
    * DataFrame API stops at rollup/cube); same SQL text runs on both
    * engines. */
  def aggGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    // per-column grouping() flags, composed into an explicit bit
    // vector — the unambiguous cross-engine form of grouping_id()
    // (whose implicit bit order is engine-defined)
    SqlViews.withViews(spark, "lineitem" -> Tables.lineitem(spark, dir))(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
        |  CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
        |  CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid,
        |  count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin)
  }

  /** Correlated scalar subquery (SQL surface): biggest order per
    * customer, 0 when none. Catalyst decorrelates this into an
    * aggregate + left join — same plan shape as joinLeftAgg. */
  def subqueryScalar(spark: SparkSession, dir: String): DataFrame = {
    SqlViews.withViews(spark,
      "customer" -> Tables.customer(spark, dir),
      "orders" -> Tables.orders(spark, dir))(
      """SELECT c_custkey,
        |  COALESCE((SELECT max(o_totalprice) FROM orders WHERE o_custkey = c_custkey), 0.0) AS max_order
        |FROM customer""".stripMargin)
  }

  /** Correlated EXISTS / NOT EXISTS — the other half of the subquery
    * surface next to [[subqueryScalar]]. Expressed as the joins
    * Catalyst compiles EXISTS to (left-semi + left-anti on the
    * correlation key), so the plan is exactly the distributed shape a
    * 100 TB run wants: two hash joins keyed on `o_custkey`, never a
    * per-row subquery re-execution. Both probes scan `orders` with
    * the predicate pushed beneath the join (urgent-only / big-F-only),
    * so each semi/anti build side is a filtered fraction of the fact
    * table, and AQE is free to broadcast it when small. */
  def subqueryExists(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    val bigF = o.filter(col("o_orderstatus") === "F" && col("o_totalprice") > 300000.0)
      .select(col("o_custkey"))
    c.join(urgent, c("c_custkey") === urgent("o_custkey"), "left_semi")
      .join(bigF, c("c_custkey") === bigF("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_mktsegment"))
  }

  /** ntile/percent_rank/cume_dist over keyed partitions — rank-family
    * window functions sharing ONE exchange + sort per key. */
  def windowNtile(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
  }

  /** Top-3-per-key via rank(): the WindowGroupLimit pushdown must
    * prune below the window (plan-gated) instead of ranking all rows. */
  def windowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        rank().over(w).cast("long").as("rnk"))
      .filter(col("rnk") <= 3)
  }

  /** Running per-customer spend — cumulative decimal sum over an
    * unbounded-preceding ROWS frame (exact, order-insensitive). */
  def windowRunning(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice").cast(DecimalType(30, 4))).over(w)
          .cast("double").as("running_spend"))
  }

  /** Time-RANGE window frame — the interval-bounded sliding aggregate
    * (RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) the
    * ROWS-frame queries can't express: each event's trailing-hour
    * activity per user, frame edges defined by TIME distance, not row
    * count. RANGE frames are deterministic under tied timestamps by
    * construction (all peers share one frame), so no tiebreak column
    * is needed. One exchange on user_id + one in-partition sort; the
    * frame evaluation is a per-partition two-pointer pass, so a bot
    * user with 10⁹ events streams through the sort spill path rather
    * than materializing. Decimal sum: exact and order-insensitive,
    * identical across engines (values are 2-decimal currency). */
  def windowRange(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"),
        expr("CAST(sum(CAST(value AS DECIMAL(30,4))) OVER " +
          "(PARTITION BY user_id ORDER BY ts RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) " +
          "AS DOUBLE)").as("trail_sum"),
        expr("count(*) OVER " +
          "(PARTITION BY user_id ORDER BY ts RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)")
          .as("trail_n"))

  /** Explicit window FRAMES — the frame-spec surface the other window
    * rows don't exercise: first/last value over one-sided unbounded
    * frames and a 3-row moving sum (ROWS BETWEEN 2 PRECEDING AND
    * CURRENT ROW, the moving-average primitive). Decimal sum for the
    * moving frame (exact, order-insensitive); unique-key tiebreak
    * makes every frame deterministic. All four functions share one
    * keyed sort — a single exchange, the compact_latest shape. */
  def windowFrames(spark: SparkSession, dir: String): DataFrame = {
    val ord = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val wFirst = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wLast = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val wMov = ord.rowsBetween(-2, Window.currentRow)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        first(col("o_totalprice")).over(wFirst).as("first_price"),
        last(col("o_totalprice")).over(wLast).as("last_price"),
        sum(col("o_totalprice").cast(DecimalType(30, 4))).over(wMov)
          .cast("double").as("moving3_sum"))
  }

  /** lag(1) previous-order price per customer — the offset window
    * primitive behind every delta/gap feature. */
  def windowLag(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"))
  }

  /** Global top-100 by price — must plan as TakeOrderedAndProject
    * (per-partition heaps + driver merge), never a full sort. */
  def topkOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)
      .select("o_orderkey", "o_custkey", "o_totalprice")

  private def custkeysOfYear(spark: SparkSession, dir: String, year: Int): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= ts(s"$year-01-01") && col("o_orderdate") < ts(s"${year + 1}-01-01"))
      .select("o_custkey")

  /** UNION DISTINCT of two yearly key sets — one hash-distinct
    * exchange over the concatenated inputs. */
  def setUnion(spark: SparkSession, dir: String): DataFrame =
    custkeysOfYear(spark, dir, 1995).union(custkeysOfYear(spark, dir, 1996)).distinct()

  /** INTERSECT (distinct) of two yearly key sets — planned as a
    * left-semi aggregate, not a join explosion. */
  def setIntersect(spark: SparkSession, dir: String): DataFrame =
    custkeysOfYear(spark, dir, 1995).intersect(custkeysOfYear(spark, dir, 1996))

  /** EXCEPT (distinct) — keys active in 1995 but not 1996; the
    * left-anti dual of [[setIntersect]]. */
  def setExcept(spark: SparkSession, dir: String): DataFrame =
    custkeysOfYear(spark, dir, 1995).except(custkeysOfYear(spark, dir, 1996))

  /** Multiset (ALL) variants: [[custkeysOfYear]] is a BAG — one row
    * per order — so multiplicities matter: a customer with 3 orders
    * in 1995 and 1 in 1996 survives EXCEPT ALL twice and INTERSECT
    * ALL once. Spark plans both as a count-per-row aggregate +
    * Generate replay (no join explosion); the shuffle carries
    * (key, count), same as the DISTINCT forms. */
  def setExceptAll(spark: SparkSession, dir: String): DataFrame =
    custkeysOfYear(spark, dir, 1995).exceptAll(custkeysOfYear(spark, dir, 1996))

  /** INTERSECT ALL — multiset intersection with multiplicities
    * min(l, r); see [[setExceptAll]] for the bag semantics note. */
  def setIntersectAll(spark: SparkSession, dir: String): DataFrame =
    custkeysOfYear(spark, dir, 1995).intersectAll(custkeysOfYear(spark, dir, 1996))

  /** Scalar string-function surface (upper/substring/length/concat_ws/
    * regexp_replace) — all codegen built-ins, zero UDFs. */
  def scalarString(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("uname"),
        substring(col("p_name"), 1, 5).as("prefix"),
        length(col("p_name")).cast("long").as("name_len"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("novowels"))

  /** Scalar date-function surface (year/month/day/date_trunc/datediff)
    * on the order-date column — integral outputs, cross-engine exact. */
  def scalarDate(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(to_date(col("o_orderdate")), to_date(lit("1995-01-01")))
          .cast("long").as("days_since"))

  /** Scalar math-function surface (floor/ceil/abs/sqrt/products) —
    * codegen built-ins over lineitem prices. */
  def scalarMath(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        floor(col("l_extendedprice")).cast("long").as("price_floor"),
        ceil(col("l_extendedprice")).cast("long").as("price_ceil"),
        abs(col("l_discount") - 0.05).as("disc_dev"),
        sqrt(col("l_quantity")).as("qty_sqrt"),
        (col("l_quantity") * col("l_quantity")).as("qty_sq"))

  /** argmax/argmin aggregates (`max_by`/`min_by`): WHICH row holds
    * the extreme, not the extreme itself — the lookup that otherwise
    * costs a self-join or a window. Ordering key is a struct
    * (price, orderkey, linenumber): lexicographic, and the id tail
    * makes it strictly unique, so ties cannot make the answer
    * engine-dependent (bare max_by on a non-unique key is
    * nondeterministic by contract). Oracle replays via a rank-1
    * window on the same composite order. */
  def aggArgmax(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        max_by(col("l_orderkey"),
          struct(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber")))
          .as("priciest_order"),
        min_by(col("l_orderkey"),
          struct(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber")))
          .as("cheapest_order"),
        max(col("l_extendedprice")).as("max_price"),
        min(col("l_extendedprice")).as("min_price"))

  /** Schema-drift union: two generations of the same table (an old
    * extract missing a column, a new one carrying it) combined with
    * `unionByName(allowMissingColumns)` — the ingestion-side sibling
    * of FormatsSpec's read-side mergeSchema. Position-based union
    * would silently misalign columns; by-name union fills the
    * missing column with NULL. Disjoint halves by key parity keep
    * the result reconciliation-friendly. */
  def unionDrift(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val oldGen = o.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_custkey"))
    val newGen = o.filter(col("o_orderkey") % 2 === 1)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    oldGen.unionByName(newGen, allowMissingColumns = true)
  }

  /** Forward-fill (`last(..., ignoreNulls)` over an ordered window) —
    * the timeseries repair primitive: 'view' events have their value
    * masked to NULL, then each row takes the most recent non-null
    * value for its user. Scale shape: one exchange on user + a
    * spilling ordered window — the sessionize shape; the frame is
    * unbounded-preceding..current, which Spark evaluates in one
    * running pass, not O(n²). */
  def forwardFill(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"),
        when(col("event_type") =!= "view", col("value")).as("v_sparse"))
      .withColumn("v_filled", last(col("v_sparse"), ignoreNulls = true).over(w))
  }

  /** Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): plain
    * `=` drops NULL keys from BOTH sides silently — the classic
    * silent-data-loss bug when a nullable dimension key joins. Keys
    * with residue 3 are nulled on each side via nullif, sides are
    * pre-aggregated (so the join is 8×8 keys, not row-level
    * fan-out), and the NULL buckets must MATCH under `<=>`. Plan
    * note: null-safe equi-keys still hash-partition (Spark wraps the
    * key in a null-safe struct), so this stays a real equi-join, not
    * a BNLJ. */
  def joinNullSafe(spark: SparkSession, dir: String): DataFrame = {
    def keyed(df: DataFrame, c: String) =
      df.select(nullif(col(c) % 7, lit(3)).as("key"))
        .groupBy("key").agg(count(lit(1)).as("n"))
    val o = keyed(Tables.orders(spark, dir), "o_custkey")
      .withColumnRenamed("n", "n_orders")
    val cu = keyed(Tables.customer(spark, dir), "c_custkey")
      .withColumnRenamed("n", "n_customers")
    o.join(cu, o("key") <=> cu("key"))
      .select(o("key").as("key"), col("n_orders"), col("n_customers"))
  }

  /** ANSI-safe scalar family: `try_divide` / `try_cast` return NULL
    * on failure instead of erroring the job — at 100 TB a single
    * malformed cell must not kill a 1000-executor stage (the scalar
    * counterpart of the PERMISSIVE-ingest contract in FormatsSpec).
    * Planted failure cases: division by a zero derived from data,
    * non-numeric and overflowing casts. */
  def scalarTry(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        // zero for every third line ⇒ NULL there, real ratio elsewhere
        expr("try_divide(l_extendedprice, l_linenumber % 3)").as("per_mod"),
        expr("try_cast(l_linestatus AS DOUBLE)").as("instr_num"), // never numeric ⇒ NULL
        // integral-valued quantities ⇒ no trunc-vs-round ambiguity
        expr("try_cast(l_quantity AS TINYINT)").as("qty_i8"),
        // digits + trailing junk fails the parse in BOTH engines
        expr("try_cast(concat(CAST(l_linenumber AS STRING), 'x') AS BIGINT)").as("junk_num"))

  /** ANSI-safe AGGREGATION beside [[scalarTry]]'s scalars: `try_sum`
    * keeps a group's aggregate NULL-tolerant the way `try_divide`
    * keeps a row's expression — malformed cells become NULLs, NULLs
    * fall out of the sum, the job survives. The summed column rides
    * an integral try_cast, so the accumulation is exact BIGINT in
    * both engines (the order-sensitive-double trap aggStats
    * documents); the mean is derived as ONE double division on
    * identical operands rather than avg()'s engine-specific
    * accumulator. */
  def scalarTryAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        // rows whose try_divide survived (every third line nulls out)
        count(expr("try_divide(l_extendedprice, l_linenumber % 3)")).as("n_ok"),
        expr("try_sum(try_cast(l_quantity AS TINYINT))").cast("long").as("sum_qty"))
      .select(col("l_returnflag"), col("n"), col("n_ok"), col("sum_qty"),
        (col("sum_qty") / col("n")).as("mean_qty"))

  /** Bivariate statistics — corr / covar_samp / regr_slope — via
    * exact decimal moment sums, the [[aggStats]] discipline extended
    * to cross-moments: Spark's native `corr` (and DuckDB's)
    * accumulates doubles in partition order and is not reproducible
    * across engines; Σx, Σy, Σx², Σy², Σxy in DECIMAL are, and the
    * closing formulas are the same handful of IEEE ops on identical
    * operands in both engines. One partial+final aggregation. */
  def aggCorr(spark: SparkSession, dir: String): DataFrame = {
    // DECIMAL(12,4): wide enough for both columns (qty ≤ 51, price
    // < 1e8), narrow enough that the cross-product stays inside
    // DuckDB's 38-digit multiply (18,4 squared overflowed its int64
    // physical type there)
    val x = col("l_quantity").cast(DecimalType(12, 4))
    val y = col("l_extendedprice").cast(DecimalType(12, 4))
    val n = count(lit(1))
    // each moment sum is FLOORED to a whole number before the double
    // cast: a 23-significant-digit decimal rounds to double
    // differently across engines (measured: ULP diffs in syy), while
    // an integer < 2^53 casts losslessly in both. floor, not a
    // decimal→decimal cast — Spark's cast rounds half-up where
    // DuckDB's truncates (measured: 2.7 → 3 vs 2); floor is
    // identical on the all-positive moments
    def mom(c: Column): Column = floor(c).cast("double")
    val sx = mom(sum(x)); val sy = mom(sum(y))
    val sxx = mom(sum(x * x)); val syy = mom(sum(y * y))
    val sxy = mom(sum(x * y))
    val covN = n * sxy - sx * sy // n²·covar — shared numerator
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        n.as("n"),
        (covN / (n * (n - lit(1)))).as("covar"),
        (covN / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))).as("corr"),
        (covN / (n * sxx - sx * sx)).as("slope"))
  }

  /** Deterministic MODE per group — most frequent event_type per
    * user, ties to the lexicographically smallest value (a mode
    * without a stated tie rule is nondeterministic under
    * partitioning, which is why Spark's own `mode` aggregate is
    * unsuitable for a gated row). One partial+final count shuffle,
    * then a WindowGroupLimit rank cut: the per-user event history
    * never concentrates in one task. */
  def aggMode(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("c").desc, col("event_type").asc)
    Tables.events(spark, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("user_id"), col("event_type").as("mode_event"), col("c").as("n"))
  }

  /** Relative-position window functions: percent_rank + cume_dist
    * over a unique total order (price, then key — an explicit
    * tiebreak, or both functions are partition-order-dependent).
    * Each emits one double from identical integral operands
    * ((rank-1)/(n-1), rows≤cur/n), so the gate is hash-exact. */
  def windowPercent(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    Tables.orders(spark, dir).select(
      col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
      percent_rank().over(w).as("pct_rank"),
      cume_dist().over(w).as("cume"))
  }

  /** Moment statistics with exact decimal accumulation: plain
    * stddev/var aggregates accumulate doubles in partition order and
    * are not reproducible across engines; sum and sum-of-squares in
    * decimal are, and the final double arithmetic is identical on both
    * sides. */
  def aggStats(spark: SparkSession, dir: String): DataFrame = {
    val qd = col("l_quantity").cast(DecimalType(18, 4))
    val n = count(lit(1))
    val sumD = sum(qd).cast("double")
    val sumSqD = sum(qd * qd).cast("double")
    val varSamp = (sumSqD - sumD * sumD / n) / (n - lit(1))
    Tables.lineitem(spark, dir)
      .groupBy("l_linestatus")
      .agg(
        n.as("n"),
        (sumD / n).as("mean_qty"),
        varSamp.as("var_qty"),
        sqrt(varSamp).as("stddev_qty"))
  }

  /** JSON extraction surface — get_json_object / from_json over the
    * events payload column, all codegen built-ins. */
  def jsonEvents(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))

  /** HLL++ approximate distinct counts — the sketch an exact
    * countDistinct can't afford at 100 TB (no per-key state, one pass,
    * mergeable). DuckDB's HLL register layout differs, so the sketch
    * VALUE can't be replayed — instead the gated row carries the exact
    * counts (oracle-checkable) plus a within-2%-envelope flag per
    * sketch. HLL++ is deterministic for a given input (fixed hash,
    * merge = register-wise max, order-insensitive), so the flag is
    * stable across runs/partitionings, and the oracle asserting
    * `1` means "the sketch landed inside its error envelope"
    * — a real gate on the operator, not just row counts.
    *
    * The envelope is 3σ of the configured rsd (0.01 → 3%): HLL++'s
    * rsd is ONE standard error, so gating at 2σ (2%) would make the
    * flag a coin-flip-adjacent bet at any new scale factor or fixture
    * even when the sketch meets its design spec; 3σ holds with
    * ~99.7%-per-key headroom while still catching a broken sketch
    * (which is off by far more than 3%). */
  def aggApproxDistinct(spark: SparkSession, dir: String): DataFrame = {
    def inEnvelope(approx: Column, exact: Column): Column =
      (abs(approx.cast("double") - exact) <= exact * 0.03).cast("long")
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        approx_count_distinct(col("l_partkey"), 0.01).as("ap"),
        approx_count_distinct(col("l_orderkey"), 0.01).as("ao"))
      .select(col("l_returnflag"), col("n_parts"), col("n_orders"),
        inEnvelope(col("ap"), col("n_parts")).as("parts_in_3sig"),
        inEnvelope(col("ao"), col("n_orders")).as("orders_in_3sig"))
  }

  /** KMV distinct-count sketch (k=64) — the oracle-checkable sketch:
    * the hash is the first 15 md5 hex chars of the key rendered as a
    * string (60 bits, positive), which DuckDB computes byte-identically,
    * and the estimator is plain integer-to-double arithmetic — so the
    * whole sketch (bounded k-heap, merges, estimator) is hash-gated by
    * the SQL replay, unlike HLL whose register layout is
    * implementation-specific. See KmvSketchAgg for the scale notes. */
  def aggKmvDistinct(spark: SparkSession, dir: String): DataFrame = {
    def h60(c: Column): Column =
      conv(substring(md5(c.cast("string").cast("binary")), 1, 15), 16, 10).cast("long")
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        graft.functions.KmvSketchAgg.kmv_distinct(h60(col("l_partkey")), 64).as("est_parts"),
        graft.functions.KmvSketchAgg.kmv_distinct(h60(col("l_orderkey")), 64).as("est_orders"))
  }

  /** KMV set algebra — the audience-overlap query (|A ∪ B|, |A ∩ B|
    * of distinct-user sets) from MERGEABLE sketches, the capability
    * that makes distinct-set analytics composable at 100 TB: each
    * set's bottom-k sketch is built in one partial+final pass, a
    * UNION sketch is just the bottom-k of the combined hash stream
    * (here: one conditional aggregate over the same scan — no second
    * pass), and the intersection estimate falls out by
    * inclusion–exclusion. One scan computes all nine sketches (three
    * singles + three pair-unions) as conditional aggregates —
    * adding set expressions widens the aggregate row, never adds a
    * pass. Same md5-60-bit hash domain as `agg_kmv_distinct`, so the
    * WHOLE estimate chain (hash, bottom-64, (k−1)·2⁶⁰/h_k, the
    * exact-regime n<k short-circuit, and the inclusion–exclusion
    * arithmetic) replays bit-for-bit in DuckDB — the estimates are
    * hash-gated, not envelope-gated. */
  def kmvSetOps(spark: SparkSession, dir: String): DataFrame = {
    def h60(c: Column): Column =
      conv(substring(md5(c.cast("string").cast("binary")), 1, 15), 16, 10).cast("long")
    val h = h60(col("user_id"))
    def est(cond: Column) =
      graft.functions.KmvSketchAgg.kmv_distinct(when(cond, h), 64)
    val t = col("event_type")
    val pairs = Seq(("click", "view"), ("click", "purchase"), ("view", "purchase"))
    val singles = Seq("click", "view", "purchase")
    val aggs =
      singles.map(a => est(t === a).as(s"e_$a")) ++
        pairs.map { case (a, b) => est(t.isin(a, b)).as(s"u_${a}_$b") }
    Tables.events(spark, dir)
      .agg(aggs.head, aggs.tail: _*)
      .selectExpr(
        s"stack(${pairs.size}, " + pairs.map { case (a, b) =>
          s"'$a', '$b', e_$a, e_$b, u_${a}_$b"
        }.mkString(", ") + ") AS (type_a, type_b, est_a, est_b, est_union)")
      .withColumn("est_intersect", (col("est_a") + col("est_b")) - col("est_union"))
  }

  /** Quantile sketch gated on its accuracy contract — completes the
    * sketch trio (HLL `agg_approx_distinct`, KMV `agg_kmv_distinct`,
    * and now quantiles). `approx_percentile` (Greenwald-Khanna) has
    * merge-order-dependent outputs, so the estimate itself can't be
    * hash-gated; what IS deterministic is the guarantee: with
    * accuracy = 100 (the value used below) the returned value's RANK
    * must be within n/100 of the target rank. The registered row emits the exact
    * percentiles plus the sketch's rank error in UNITS of that bound
    * (floored — 0 means "inside the guarantee"), checked per group.
    * At 100 TB the sketch is the only viable path (bounded memory,
    * partial+final merge); the exact percentile here is the
    * test-scale referee, same role as countDistinct above. */
  def aggApproxQuantile(spark: SparkSession, dir: String): DataFrame = {
    // accuracy=100 keeps the sketch in genuinely-compressed territory
    // at every fixture SF (memory ~ accuracy < group sizes), with a
    // rank-error guarantee of n/100; the +1 covers rank discreteness.
    // The sketch VALUE is merge-order-dependent (can't hash-gate it);
    // the guarantee holding is deterministic — that's what's gated,
    // same structure as the HLL row's 3-sigma flags.
    val acc = 100
    def inEnvelope(approxRank: Column, q: Double, n: Column): Column =
      (abs(approxRank.cast("double") - n.cast("double") * q) <=
        n.cast("double") / acc + 1.0).cast("long")
    val e = Tables.events(spark, dir)
    val ap = e.groupBy("event_type")
      .agg(
        percentile_approx(col("value"), lit(0.5), lit(acc)).as("ap50"),
        percentile_approx(col("value"), lit(0.9), lit(acc)).as("ap90"))
    val exact = e.groupBy("event_type")
      .agg(
        percentile(col("value"), lit(0.5)).as("p50"),
        percentile(col("value"), lit(0.9)).as("p90"),
        count(lit(1)).as("n"))
    // referee pass: the approx value's true rank = count(value <= it)
    val joined = e.join(broadcast(ap), "event_type")
      .groupBy("event_type")
      .agg(
        sum((col("value") <= col("ap50")).cast("long")).as("r50"),
        sum((col("value") <= col("ap90")).cast("long")).as("r90"))
      .join(broadcast(exact), "event_type")
    joined.select(col("event_type"), col("p50"), col("p90"), col("n"),
      inEnvelope(col("r50"), 0.5, col("n")).as("p50_in_bound"),
      inEnvelope(col("r90"), 0.9, col("n")).as("p90_in_bound"))
  }

  /** Exact interpolated percentiles — Spark's `percentile` and
    * DuckDB's `quantile_cont` share the (n-1)·q linear-interpolation
    * definition, so values compare exactly. */
  def aggMedian(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        percentile(col("value"), lit(0.5)).as("p50"),
        percentile(col("value"), lit(0.9)).as("p90"),
        count(lit(1)).as("n"))

  /** Leave-one-out target encoding — the supervised categorical
    * encoder ([[featureHash]]'s counterpart when a label exists):
    * each order's priority class is replaced by the mean total price
    * of the OTHER orders in that class, (S_c − xᵢ)/(n_c − 1) — the
    * leave-one-out form that avoids target leakage (a row never sees
    * its own label). Arithmetic is exact: prices land on the integer
    * cent lattice via the embed_q8 tie rule (floor(x·100 + 0.5) —
    * the data is 2-decimal, the half-up nudge absorbs double
    * representation error), class sums take decimal headroom, and
    * the LOO division is integral; only the final /100 display cast
    * is floating.
    * Shape: one partial+final class aggregate (|classes| rows, 5
    * here) broadcast back over the scan — two passes over orders,
    * zero wide shuffles of fact rows. */
  def targetEncode(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"),
        expr("cast(floor(o_totalprice * 100 + 0.5) as decimal(38,0))").as("xq"))
    val cls = o.groupBy(col("o_orderpriority"))
      .agg(sum(col("xq")).as("sc"), count(lit(1)).as("nc"))
    o.join(broadcast(cls), "o_orderpriority")
      .filter(col("nc") > 1)
      .select(col("o_orderkey"), col("o_orderpriority"),
        expr("cast((sc - xq) div (nc - 1) as bigint)").as("loo_cents"))
      .withColumn("loo", col("loo_cents") / lit(100.0))
  }

  /** Hashing-trick featurization (Weinberger et al. 2009 — the
    * Vowpal-Wabbit encoding): categorical features hash into a FIXED
    * 64-bucket index space with a ±1 sign bit, so a linear model's
    * input width is constant no matter how many distinct categories
    * appear — the standard way to featurize web-scale categoricals
    * without a vocabulary build. Features here are (event_type ×
    * hour-of-day); index = 16 md5 bits mod 64, sign = an independent
    * md5 nibble's parity (the sign trick keeps collision noise
    * zero-mean). Output is the sparse vector as (user_id, idx, val)
    * rows. Deterministic md5 arithmetic replays exactly in SQL.
    * Shape: per-row hashing rides the scan; one partial+final sum on
    * (user, idx) — at any scale the output is ≤ 64 rows per user. */
  def featureHash(spark: SparkSession, dir: String): DataFrame = {
    val feat = concat(col("event_type"), lit("-"),
      expr("cast((unix_micros(ts) div 3600000000) % 24 as string)"))
    Tables.events(spark, dir)
      .select(col("user_id"), md5(feat.cast("binary")).as("fh"))
      .select(col("user_id"),
        (conv(substring(col("fh"), 1, 4), 16, 10).cast("long") % 64).as("idx"),
        (lit(1L) - lit(2L) * (conv(substring(col("fh"), 5, 1), 16, 10).cast("long") % 2))
          .as("sign"))
      .groupBy(col("user_id"), col("idx"))
      .agg(sum(col("sign")).as("val"))
  }

  /** Exact global quantile-band assignment — (key, band 1..[[RfmBands]])
    * for every row of `df` under the TOTAL order (metric asc, key asc).
    * The band is `((rank−1)·k) div n + 1` over the exact global rank.
    *
    * Scale shape — the reason this is NOT `ntile() OVER ()`: an
    * empty-partitionBy window collapses the whole relation into ONE
    * task, the textbook global-window scale killer. Instead the
    * relation gets a DISTRIBUTED range sort (Spark's orderBy: sampled
    * range boundaries + per-partition sort — the same machinery as
    * sort_export) and `zipWithIndex` stamps contiguous indices per
    * partition with one lightweight count pass. The global index
    * depends only on the total ORDER (the key tie-break makes it
    * unique), never on where the sampled range boundaries land, so
    * the result is deterministic under any partitioning — which is
    * exactly what lets DuckDB replay it with a row_number() window.
    * This is rank-lattice arithmetic: no floats anywhere. */
  private[operators] val RfmBands = 5L

  private def globalBand(df: DataFrame, metric: String, n: Long,
      band: String, k: Long = RfmBands): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("key"), col(metric).as("m"))
      .orderBy(col("m").asc, col("key").asc)
      .select(col("key")).as[Long]
      .rdd.zipWithIndex()
      .map { case (key, idx) => (key, idx * k / n + 1L) }
      .toDF("key", band)
  }

  /** RFM (recency / frequency / monetary) customer segmentation —
    * THE classic marketing/CRM base-table rollup: per customer, days
    * since last order (vs the corpus's latest order date, so the
    * result is reproducible — wall-clock anchors are banned by the
    * determinism gate), order count, and lifetime spend on the cent
    * lattice; then each metric maps to an exact global quintile band
    * and the three digits concatenate into the familiar 111–555
    * segment code (here band 1 = LOWEST metric value — days, count,
    * cents all ascending — a fixed documented convention).
    *
    * Exactness: recency is whole calendar days (DATE arithmetic,
    * both engines identical under the UTC session), money is
    * `floor(·100 + 0.5)` cents (the target_encode rule), and bands
    * come from [[globalBand]]'s rank lattice — no percentile
    * interpolation, no floats, hash-exact oracle.
    *
    * Scale shape: one partial+final aggregate over orders (fact →
    * |customers| rows), then three DIMENSION-scale distributed sorts
    * (the globalBand note) and three key joins — all on the grouped
    * relation, never the fact table. The date anchor and n are two
    * scalar aggregates to the driver (metadata, the pagerank-N
    * precedent). */
  def rfmSegment(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.orders(spark, dir)
      .select(col("o_custkey").as("key"),
        expr("cast(datediff(cast(o_orderdate as date), date'1970-01-01') as bigint)").as("od"),
        expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)").as("cents"))
      .groupBy(col("key"))
      .agg(max(col("od")).as("last_od"), count(lit(1)).as("f"),
        sum(col("cents")).as("m_cents"))
      .persistScoped()
    val anchor = per.agg(max(col("last_od"))).head().getLong(0)
    val n = per.count()
    val base = per.select(col("key"), (lit(anchor) - col("last_od")).as("r_days"),
      col("f"), col("m_cents"))
    base
      .join(globalBand(base, "r_days", n, "r_band"), "key")
      .join(globalBand(base, "f", n, "f_band"), "key")
      .join(globalBand(base, "m_cents", n, "m_band"), "key")
      .select(col("key").as("c_custkey"), col("r_days"), col("f"),
        col("m_cents"), col("r_band"), col("f_band"), col("m_band"),
        (col("r_band") * 100L + col("f_band") * 10L + col("m_band")).as("rfm_code"))
  }

  /** Benford's-law expected first-digit shares, log₁₀(1 + 1/d),
    * pre-quantized onto the 2²⁰ lattice (floor(·2²⁰ + 0.5)) so both
    * engines consume the SAME integer constants — computing log10 at
    * runtime would reintroduce exactly the cross-engine ULP drift
    * the lattice rule exists to kill. Single source: the oracle SQL
    * interpolates these literals. */
  private[operators] val BenfordQ: Seq[(Int, Long)] = Seq(
    1 -> 315653L, 2 -> 184645L, 3 -> 131008L, 4 -> 101618L, 5 -> 83028L,
    6 -> 70199L, 7 -> 60809L, 8 -> 53637L, 9 -> 47980L)

  /** Benford first-digit deviation of order totals — the
    * forensic-accounting screen (fabricated or threshold-gamed
    * amounts bend the leading-digit histogram away from
    * log₁₀(1+1/d)): per digit 1–9, observed count, observed share on
    * the 2²⁰ lattice, the quantized Benford expectation, and the
    * absolute deviation — all integers, so the gate is hash-exact.
    * The first digit comes from the CENTS integer's decimal string
    * (identical in both engines; no float log anywhere). The
    * expectation table attaches by a 9-row broadcast join.
    *
    * Scale shape: one narrow scan → partial+final 9-group count;
    * total + expectation are broadcast-size metadata. */
  def benfordDeviation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val exp = BenfordQ.toDF("digit", "benford_q")
    // the 9-row digit histogram feeds BOTH the output and the scalar
    // total — persist it or the total's lineage re-scans the fact
    // table (PlanAuditSpec pins the single scan)
    val g = Tables.orders(spark, dir)
      .select(expr("cast(substring(cast(cast(floor(o_totalprice * 100 + 0.5) as bigint) as string), 1, 1) as int)")
        .as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      .persistScoped()
    val tot = g.agg(sum(col("n")).as("nt"), count(lit(1)).as("nn"))
    ScalarJoin.attachScalar(g, col("n"), tot, col("nn"))
      .join(broadcast(exp), "digit")
      .select(col("digit").cast("long").as("digit"), col("n"),
        expr("cast((cast(n as decimal(38,0)) * 1048576) div nt as bigint)").as("share_q"),
        col("benford_q"))
      .withColumn("dev_q", abs(col("share_q") - col("benford_q")))
  }

  private def benfordSql: String = {
    s"""WITH exp(digit, benford_q) AS (VALUES
       |  ${BenfordQ.map { case (d, q) => s"($d, CAST($q AS BIGINT))" }.mkString(", ")}),
       |g AS (
       |  SELECT CAST(substring(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit,
       |    count(*) AS n
       |  FROM orders GROUP BY 1),
       |t AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM g)
       |SELECT CAST(g.digit AS BIGINT) AS digit, CAST(n AS BIGINT) AS n,
       |  CAST((CAST(n AS HUGEINT) * 1048576) // (SELECT nt FROM t) AS BIGINT) AS share_q,
       |  benford_q,
       |  abs(CAST((CAST(n AS HUGEINT) * 1048576) // (SELECT nt FROM t) AS BIGINT)
       |      - benford_q) AS dev_q
       |FROM g JOIN exp ON g.digit = exp.digit""".stripMargin
  }

  /** Pareto concentration bands of customer spend — the "what share
    * of revenue rides on the top 20%" rollup that pairs with
    * [[giniSpend]]'s scalar: customers cut into exact spend
    * quintiles (band 5 = top spenders) via the [[rfmSegment]] rank
    * machinery, each band reporting its member count, cents total,
    * revenue share on the 2²⁰ lattice, and the CUMULATIVE-from-the-
    * top share ("band ≥ b holds X of revenue"). The 5-row cumulative
    * is a band≥band self-join over the GROUPED relation — never a
    * global window.
    *
    * Scale shape: fact → |customers| partial+final, one dimension
    * sort, one 5-row rollup; everything after the sort is
    * metadata-sized. */
  def paretoShare(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.orders(spark, dir)
      .select(col("o_custkey").as("key"),
        expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)").as("cents"))
      .groupBy(col("key")).agg(sum(col("cents")).as("x"))
      .persistScoped()
    val n = per.count()
    val bands = per.join(globalBand(per, "x", n, "band"), "key")
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sum_cents"))
      .persistScoped()
    val tot = bands.agg(sum(col("sum_cents").cast(DecimalType(38, 0))).as("t"),
      count(lit(1)).as("nn"))
    val withTot = ScalarJoin.attachScalar(bands, col("n"), tot, col("nn"))
    // band ≥ band as an EQUI join: the 15 admissible (band, b2) pairs
    // are a literal relation (bands are 1..5 by construction), so the
    // cumulative stays a broadcast HASH join — a `>=` join condition
    // would plan the banned BNLJ
    import bands.sparkSession.implicits._
    val pairs = (for { b <- 1L to RfmBands; b2 <- b to RfmBands } yield (b, b2))
      .toDF("band", "b2")
    val cum = broadcast(pairs)
      .join(bands.select(col("band").as("b2"), col("sum_cents").as("sc2")), "b2")
      .groupBy(col("band"))
      .agg(sum(col("sc2").cast(DecimalType(38, 0))).as("cum_cents"))
    withTot.join(broadcast(cum), "band")
      .select(col("band"), col("n"), col("sum_cents"),
        expr("cast((cast(sum_cents as decimal(38,0)) * 1048576) div t as bigint)")
          .as("share_q"),
        expr("cast((cum_cents * 1048576) div t as bigint)").as("cumtop_share_q"))
  }

  private def paretoSql: String =
    """WITH per AS (
      |  SELECT o_custkey AS key,
      |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
      |  FROM orders GROUP BY 1),
      |nn AS (SELECT count(*) AS n FROM per),
      |b AS (SELECT key, x,
      |        ((row_number() OVER (ORDER BY x, key) - 1) * 5)
      |          // (SELECT n FROM nn) + 1 AS band
      |      FROM per),
      |g AS (SELECT band, count(*) AS n, CAST(sum(x) AS BIGINT) AS sum_cents
      |      FROM b GROUP BY band),
      |t AS (SELECT CAST(sum(sum_cents) AS HUGEINT) AS t FROM g),
      |c AS (SELECT g1.band, CAST(sum(g2.sum_cents) AS HUGEINT) AS cum_cents
      |      FROM g g1 JOIN g g2 ON g2.band >= g1.band GROUP BY g1.band)
      |SELECT g.band, CAST(g.n AS BIGINT) AS n, g.sum_cents,
      |  CAST((CAST(g.sum_cents AS HUGEINT) * 1048576) // (SELECT t FROM t) AS BIGINT) AS share_q,
      |  CAST((c.cum_cents * 1048576) // (SELECT t FROM t) AS BIGINT) AS cumtop_share_q
      |FROM g JOIN c USING (band)""".stripMargin

  /** Lag-7 autocorrelation of daily revenue — the seasonality
    * STRENGTH scalar behind [[seasonalProfile]]'s shape: does this
    * week's daily revenue predict next week's, day for day? Series =
    * per-day revenue in whole $k (cents summed exactly, ONE
    * truncating division — integral, so the lag join is exact);
    * pairs (day, day+7) meet by epoch-day EQUI join (never a global
    * window); the correlation closes over exact integer moment sums
    * via the [[aggCorr]] discipline (decimal accumulation, floor to
    * a < 2⁵³ integer, identical IEEE ops both engines — rev_k ~10⁴
    * keeps sxx well inside the lossless-double range through ~10⁹
    * days or ~10⁶× the per-day revenue).
    *
    * Scale shape: fact folds to |days| rows partial+final FIRST;
    * the self-join and moments are metadata-sized after that. */
  def autocorrLag7(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .select(
        expr("cast(datediff(cast(o_orderdate as date), date'1970-01-01') as bigint)").as("day"),
        expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)").as("cents"))
      .groupBy(col("day"))
      .agg(expr("sum(cents) div 100000").as("rev_k"))
      .persistScoped()
    val pairs = daily.select(col("day"), col("rev_k").as("x"))
      .join(daily.select((col("day") - 7L).as("day"), col("rev_k").as("y")), "day")
    def mom(c: Column): Column = floor(c).cast("double")
    val dec = (c: Column) => c.cast(DecimalType(19, 0))
    val n = count(lit(1))
    val sx = mom(sum(dec(col("x")))); val sy = mom(sum(dec(col("y"))))
    val sxx = mom(sum(dec(col("x")) * dec(col("x"))))
    val syy = mom(sum(dec(col("y")) * dec(col("y"))))
    val sxy = mom(sum(dec(col("x")) * dec(col("y"))))
    val covN = n * sxy - sx * sy
    pairs.agg(
      n.as("n_pairs"),
      (covN / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))).as("corr_lag7"),
      (covN / (n * sxx - sx * sx)).as("slope"))
  }

  /** Peak concurrency per user — the classic interval-overlap sweep
    * (max overlapping intervals), each event an open-ended [ts,
    * ts+5 min) activity span: the "how many sessions at once"
    * capacity question. Boundaries (+1 at start, −1 at end) sort per
    * user with ends BEFORE starts at the same instant (half-open
    * semantics: touching intervals don't overlap), a running sum
    * gives the live count, and the row where it peaks is exact and
    * tie-stable — within equal (t, d) runs each prefix value occurs
    * on exactly one row, so min(t at max) is order-independent.
    * Epoch MICROSECONDS throughout (unix_micros / epoch_us —
    * integral; epoch-seconds doubles drift).
    *
    * Scale shape: 2 rows per event, ONE exchange on user_id serving
    * both windows (running sum + per-user max) and the final
    * aggregate; a bot user streams through the sort spill path, never
    * an in-memory buffer. */
  def intervalOverlap(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("s"))
    val bounds = ev.select(col("user_id"), col("s").as("t"), lit(1L).as("d"))
      .unionAll(ev.select(col("user_id"), (col("s") + 300000000L).as("t"),
        lit(-1L).as("d")))
    val wRun = Window.partitionBy(col("user_id"))
      .orderBy(col("t").asc, col("d").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("user_id"))
    bounds
      .withColumn("cnt", sum(col("d")).over(wRun))
      .withColumn("mx", max(col("cnt")).over(wAll))
      .filter(col("cnt") === col("mx"))
      .groupBy(col("user_id"))
      .agg(max(col("mx")).as("max_concurrent"), min(col("t")).as("peak_us"))
  }

  /** Join-key skew profile — the diagnostic a 100 TB join runs BEFORE
    * choosing between plain shuffle, salting ([[Reshape.aggSalted]] /
    * `join_salted`) and AQE skew-split: for each candidate key family
    * the row count, distinct-key count, hottest key's frequency, and
    * `skew_q = (max_freq · n_keys · 2²⁰) div n_rows` — the hottest
    * key's multiple of the MEAN key frequency on the lattice (2²⁰ =
    * perfectly uniform; 10·2²⁰ = the hot key is 10× mean and the
    * post-shuffle partition holding it will straggle ~10×). One
    * partial+final count per family, then a 1-row fold — O(families)
    * output at any scale; the hot keys themselves are [[freqTopk]]'s
    * job. */
  def skewProfile(spark: SparkSession, dir: String): DataFrame = {
    def family(name: String, keyed: DataFrame): DataFrame =
      keyed.groupBy(col("k")).agg(count(lit(1)).as("f"))
        .agg(sum(col("f")).as("n_rows"), count(lit(1)).as("n_keys"),
          max(col("f")).as("max_freq"))
        .select(lit(name).as("key_col"), col("n_rows"), col("n_keys"), col("max_freq"),
          expr("(max_freq * n_keys * 1048576) div n_rows").as("skew_q"))
    family("l_partkey", Tables.lineitem(spark, dir).select(col("l_partkey").as("k")))
      .unionAll(family("l_suppkey",
        Tables.lineitem(spark, dir).select(col("l_suppkey").as("k"))))
      .unionAll(family("o_custkey",
        Tables.orders(spark, dir).select(col("o_custkey").as("k"))))
  }

  /** Per-user activity bursts (Kleinberg-style burst detection
    * reduced to its exactly-replayable core): hourly event counts per
    * user, flagged where an hour runs ≥ 3× that user's own MEDIAN
    * active-hour count (discrete rank-pick median — the
    * [[aggQuantileDisc]] lattice, no interpolation) and ≥ 3 absolute.
    * The per-user baseline is the point: a bot's every hour is "high"
    * vs the corpus but flat vs itself, while a true burst towers over
    * its own history.
    *
    * Scale shape: one (user, hour) partial+final count, then two
    * windows over the GROUPED |active hours| relation sharing one
    * user_id exchange; the raw event stream never enters a window. */
  def burstDetect(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(spark, dir)
      .select(col("user_id"), expr("unix_micros(ts) div 3600000000").as("hour"))
      .groupBy(col("user_id"), col("hour")).agg(count(lit(1)).as("n_events"))
    val wRank = Window.partitionBy(col("user_id"))
      .orderBy(col("n_events").asc, col("hour").asc)
    val wAll = Window.partitionBy(col("user_id"))
    hourly
      .withColumn("rn", row_number().over(wRank))
      .withColumn("nh", count(lit(1)).over(wAll))
      .withColumn("med", max(when(col("rn") === expr("(nh * 50 + 99) div 100"),
        col("n_events"))).over(wAll))
      .filter(col("n_events") >= col("med") * 3 && col("n_events") >= 3)
      .select(col("user_id"), col("hour"), col("n_events"), col("med"))
  }

  /** Funnel step latency — the TIME dimension [[funnelSteps]]' counts
    * drop: for users who advanced, how long did view→click and
    * click→purchase take (exact epoch-microsecond deltas, discrete
    * rank-pick p50/p90 — the [[aggQuantileDisc]] lattice)? The
    * staged first-qualifying-event times replay funnelSteps'
    * windows verbatim, so the two rows can never disagree on what
    * "advanced" means. Scale shape: one user-keyed window family,
    * |transitions|-row fold, a 2-partition rank window over the
    * folded latencies. */
  def funnelLatency(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
    val staged = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_type"))
      .withColumn("tv", min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("tc", min(when(col("event_type") === "click" && col("ts") > col("tv"),
        col("ts"))).over(w))
      .withColumn("tp", min(when(col("event_type") === "purchase" && col("ts") > col("tc"),
        col("ts"))).over(w))
      .select(col("user_id"), col("tv"), col("tc"), col("tp"))
      .distinct()
    val lats = staged.filter(col("tc").isNotNull)
      .select(lit("view_to_click").as("step"),
        (unix_micros(col("tc")) - unix_micros(col("tv"))).as("lat_us"))
      .unionAll(staged.filter(col("tp").isNotNull)
        .select(lit("click_to_purchase").as("step"),
          (unix_micros(col("tp")) - unix_micros(col("tc"))).as("lat_us")))
    val wr = Window.partitionBy(col("step")).orderBy(col("lat_us").asc)
    lats
      .withColumn("rn", row_number().over(wr))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("step"))))
      .groupBy(col("step"))
      .agg(max(col("n")).as("n_users"),
        max(when(col("rn") === expr("(n * 50 + 99) div 100"), col("lat_us"))).as("p50_us"),
        max(when(col("rn") === expr("(n * 90 + 99) div 100"), col("lat_us"))).as("p90_us"))
  }

  /** Session conversion by engagement band — the gaps-and-islands
    * sessionization ([[graft.streaming.EventStream]]'s 30-minute gap
    * rule, with an event_id tiebreak so tied timestamps order
    * identically cross-engine) rolled up to the product question:
    * do longer sessions convert? Sessions band by event count (1 /
    * 2–4 / 5–9 / 10+); each band reports sessions, converting
    * sessions (≥1 purchase), and the 2²⁰-lattice conversion share.
    * Scale shape: one user-keyed window family over the raw stream,
    * then two tiny partial+final folds — O(4) output. */
  def sessionConversion(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val gapUs = 30L * 60L * 1000000L
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_s",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("sid", sum(col("new_s")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(count(lit(1)).as("n_events"),
        max((col("event_type") === "purchase").cast("long")).as("has_purchase"))
      .select(
        when(col("n_events") === 1L, "1")
          .when(col("n_events") <= 4L, "2-4")
          .when(col("n_events") <= 9L, "5-9")
          .otherwise("10+").as("band"),
        col("has_purchase"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("has_purchase")).as("n_converting"))
      .select(col("band"), col("n_sessions"), col("n_converting"),
        expr("(n_converting * 1048576) div n_sessions").as("conv_q"))
  }

  /** Purchase-gap survival curve (Kaplan–Meier-lite, no censoring —
    * every gap is fully observed): at each horizon t ∈ {7, 14, 30,
    * 60, 90} days, the share of inter-purchase gaps exceeding t on
    * the 2²⁰ lattice — the "how long until we call a customer
    * lapsed" curve that grounds [[churnLabel]]'s single-threshold
    * rule in the full distribution. Gaps derive from the identical
    * lag-over-(od, ok) order the purchase_gaps/churn oracles use.
    *
    * Scale shape: one keyed window computes gaps; the 5× horizon
    * fan-out rides the gap rows (longs only) into one partial+final
    * rollup — O(5) output at any scale. */
  def gapSurvival(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("key")).orderBy(col("od").asc, col("ok").asc)
    val gaps = Tables.orders(spark, dir)
      .select(col("o_custkey").as("key"), col("o_orderkey").as("ok"),
        expr("cast(datediff(cast(o_orderdate as date), date'1970-01-01') as bigint)").as("od"))
      .withColumn("gap", col("od") - lag(col("od"), 1).over(w))
      .filter(col("gap").isNotNull)
    gaps
      .select(col("gap"), explode(array(lit(7L), lit(14L), lit(30L), lit(60L), lit(90L))).as("t"))
      .groupBy(col("t"))
      .agg(count(lit(1)).as("n_gaps"),
        sum((col("gap") > col("t")).cast("long")).as("n_exceed"))
      .select(col("t"), col("n_gaps"), col("n_exceed"),
        expr("(n_exceed * 1048576) div n_gaps").as("surv_q"))
  }

  /** Open-order backlog over time — the operations-health series
    * behind [[shipLatency]]'s per-order latency: per 30-day grid
    * month (epoch-day div 30, the cohort_retention grid rule — never
    * calendar months, whose engine conventions differ), how many
    * orders OPENED (placed), CLOSED (last line shipped — an order is
    * open until its final lineitem ships), and the cumulative
    * backlog. A rising backlog line is the "demand outruns
    * fulfillment" signal. Fold-below-window: order spans fold to
    * |months| boundary rows FIRST; the one running-sum window orders
    * metadata only (the drawdown contract).
    *
    * Scale shape: the per-order close month is one partial+final max
    * over lineitem co-keyed with the orders join; everything after
    * the |months| fold is metadata. */
  def orderBacklog(spark: SparkSession, dir: String): DataFrame = {
    val spans = Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        expr("cast(datediff(cast(o_orderdate as date), date'1970-01-01') as bigint) div 30")
          .as("m_open"))
      .join(Tables.lineitem(spark, dir)
        .groupBy(col("l_orderkey"))
        .agg(expr("max(cast(datediff(cast(l_shipdate as date), date'1970-01-01') as bigint)) div 30")
          .as("m_ship")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("m_open"), (col("m_ship") + 1L).as("m_close"))
      .persistScoped()
    val opened = spans.groupBy(col("m_open").as("month"))
      .agg(count(lit(1)).as("n_opened"))
    val closed = spans.groupBy(col("m_close").as("month"))
      .agg(count(lit(1)).as("n_closed"))
    val w = Window.orderBy(col("month").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    opened.join(closed, Seq("month"), "full_outer")
      .select(col("month"),
        coalesce(col("n_opened"), lit(0L)).as("n_opened"),
        coalesce(col("n_closed"), lit(0L)).as("n_closed"))
      .withColumn("backlog",
        sum(col("n_opened") - col("n_closed")).over(w))
  }

  /** SAX-style motif mining over daily revenue (symbolic aggregate
    * approximation, distribution-free variant): days get quartile
    * letters a–d by exact RANK banding (the [[rfmSegment]] lattice —
    * empirical quartiles, not SAX's Gaussian breakpoints, so the
    * symbolization is integral and engine-exact), weeks concatenate
    * their 7 letters in day order into a motif word, and the output
    * counts each motif's occurrences — the repeated-shape question
    * ("how often does the week open low and close high") that raw
    * correlation can't answer. Fold-below-window: the fact stream
    * folds to |days| rows FIRST (the drawdown/revenue_wow contract);
    * the single-partition rank window orders metadata only.
    *
    * Output: one row per distinct motif with its week count and
    * length (edge weeks are shorter — kept, flagged by motif_len). */
  def saxMotifs(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .select(
        expr("cast(datediff(cast(o_orderdate as date), date'1970-01-01') as bigint)").as("day"),
        expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)").as("cents"))
      .groupBy(col("day")).agg(sum(col("cents")).as("rev"))
    val wRank = Window.orderBy(col("rev").asc, col("day").asc)
    val banded = daily
      .withColumn("rn", row_number().over(wRank))
      .withColumn("n", count(lit(1)).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("day"),
        expr("substring('abcd', cast(((rn - 1) * 4) div n + 1 as int), 1)")
          .as("letter"))
    banded
      .select(expr("day div 7").as("week"), expr("day % 7").as("dow"), col("letter"))
      .groupBy(col("week"))
      .agg(array_join(transform(
        sort_array(collect_list(struct(col("dow"), col("letter")))),
        e => e("letter")), "").as("motif"))
      .groupBy(col("motif"))
      .agg(count(lit(1)).as("n_weeks"))
      .select(col("motif"), length(col("motif")).cast("long").as("motif_len"),
        col("n_weeks"))
  }

  /** Day-of-week seasonality profile per event type — the weekly-
    * rhythm rollup behind load forecasting and anomaly baselines
    * ("is Tuesday traffic down vs its OWN Tuesday norm"). The
    * weekday derives from pure epoch-day arithmetic —
    * `(epoch_days + 4) mod 7`, 0 = Sunday (1970-01-01 was a
    * Thursday) — NOT from either engine's dayofweek() builtin, whose
    * 0-vs-1-based conventions disagree; shares live on the 2²⁰
    * lattice (`(2²⁰·n) div n_type`, widened — the simpson rule).
    *
    * Scale shape: two chained partial+final aggregates — (type, dow)
    * counts, then the |types|·7-row rollup whose totals broadcast
    * back (the simpson_diversity two-small-shuffles shape; the raw
    * event stream shuffles once, already map-combined to ≤ 7 rows
    * per type per task). */
  def seasonalProfile(spark: SparkSession, dir: String): DataFrame = {
    val g = Tables.events(spark, dir)
      .select(col("event_type"),
        expr("pmod((unix_micros(ts) div 86400000000) + 4, 7)").as("dow"))
      .groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("n"))
    val tot = g.groupBy(col("event_type")).agg(sum(col("n")).as("nt"))
    g.join(broadcast(tot), "event_type")
      .select(col("event_type"), col("dow"), col("n"),
        expr("cast((cast(n as decimal(38,0)) * 1048576) div nt as bigint)")
          .as("share_q"))
  }

  /** Gini concentration of customer lifetime spend — THE inequality
    * metric of revenue analysis ("what share of revenue rides on the
    * top accounts"), here in its exact rank form
    *
    *   G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx),  i = ascending spend rank
    *
    * on the 2²⁰ lattice. The global rank is the SAME distributed
    * range-sort + zipWithIndex lattice as [[rfmSegment]]'s bands
    * (never a single-task window), spend is exact cents, and the
    * rank-weighted sums widen to decimal(38)/HUGEINT (Σ i·xᵢ ≈ n²·x̄
    * reaches 10²⁵ at 10⁹ customers) — one trunc division lands
    * gini_q in [0, 2²⁰]. Output is ONE row (n, total, gini) — the
    * dashboard scalar.
    *
    * Scale shape: fact table folds to |customers| rows partial+final,
    * one dimension-scale distributed sort, one scalar aggregate. */
  def giniSpend(spark: SparkSession, dir: String): DataFrame =
    giniOf(Tables.orders(spark, dir)
      .select(col("o_custkey").as("key"),
        expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)").as("cents"))
      .groupBy(col("key")).agg(sum(col("cents")).as("x")))

  /** The Gini core over an arbitrary (key, x) spend relation —
    * extracted for planted-concentration specs. */
  private[operators] def giniOf(per: DataFrame): DataFrame = {
    val spark = per.sparkSession
    import spark.implicits._
    val ranked = per.orderBy(col("x").asc, col("key").asc)
      .select(col("x")).as[Long]
      .rdd.zipWithIndex()
      .map { case (x, i) => (x, i + 1L) }
      .toDF("x", "i")
    ranked
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(DecimalType(38, 0))).as("s0"),
        sum(col("x").cast(DecimalType(38, 0)) * col("i")).as("s1"))
      .select(col("n"), expr("cast(s0 as bigint)").as("total_cents"),
        expr("cast(((2 * s1 - (n + 1) * s0) * 1048576) div (n * s0) as bigint)")
          .as("gini_q"))
      .withColumn("gini", col("gini_q") / lit(1048576.0))
  }

  /** Decile lift table for the [[targetEncode]] score — the standard
    * model-evaluation artifact ("rank by predicted value, cut into
    * ten equal bands, report each band's ACTUAL mean"): a monotone
    * mean profile = the encoder ranks usefully; a flat one = it
    * doesn't. Deciles come from the [[rfmSegment]] rank machinery
    * (globalBand, k = 10 — exact, distributed, float-free) keyed on
    * the leave-one-out encoding, actuals stay exact cents, and each
    * band's mean is one trunc division.
    *
    * Scale shape: the encoder's two passes over orders, then ONE
    * fact-scale distributed sort on the score (exact deciles cost a
    * sort in any engine — the sample-sort machinery is what makes it
    * scale), one key join, one partial+final 10-row aggregate. */
  def decileLift(spark: SparkSession, dir: String): DataFrame = {
    val scored = targetEncode(spark, dir)
      .select(col("o_orderkey").as("key"), col("loo_cents"))
      .join(Tables.orders(spark, dir)
        .select(col("o_orderkey").as("key"),
          expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)").as("actual")),
        "key")
      .persistScoped()
    val n = scored.count()
    scored.join(globalBand(scored, "loo_cents", n, "decile", 10L), "key")
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n"),
        sum(col("actual").cast(DecimalType(38, 0))).as("sc"))
      .select(col("decile"), col("n"),
        expr("cast(sc div n as bigint)").as("mean_cents"))
  }

  /** Weekly growth-accounting table (new / active / resurrected) —
    * the user-lifecycle state machine every growth dashboard runs:
    * each user-week of activity classifies by the user's OWN
    * timeline (first week ever = new; consecutive week = active;
    * returned after a gap = resurrected), then rolls up to per-week
    * state counts. Weeks are integer epoch-weeks (`epoch_days div
    * 7` — no engine week-numbering conventions), and the state
    * expression is the same CASE cascade in both engines, so the
    * gate is hash-exact. Churn rows (the 4th state) need a dense
    * week grid and belong to a reporting layer — documented out.
    *
    * Scale shape: distinct user-weeks collapse the event stream
    * FIRST (partial+final distinct on ≤ |users|·|weeks| keys), then
    * the sessionize shape — one user exchange feeds lag() — and one
    * final small rollup. */
  def userLifecycle(spark: SparkSession, dir: String): DataFrame =
    userLifecycleOf(Tables.events(spark, dir))

  /** The state-machine core over any events-shaped frame — extracted
    * for planted-timeline specs. */
  private[operators] def userLifecycleOf(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("wk").asc)
    events
      .select(col("user_id"),
        expr("(unix_micros(ts) div 86400000000) div 7").as("wk"))
      // ONE user exchange: hash-partitioning on user_id alone
      // satisfies the (user, wk) distinct's clustered distribution,
      // and the lag window then rides the same partitioning — a
      // bare .distinct() would shuffle on both keys and force the
      // window to re-shuffle
      .repartition(col("user_id"))
      .distinct()
      .withColumn("prev", lag(col("wk"), 1).over(w))
      .select(col("wk"),
        when(col("prev").isNull, "new")
          .when(col("wk") - col("prev") === 1L, "active")
          .otherwise("resurrected").as("state"))
      .groupBy(col("wk"), col("state"))
      .agg(count(lit(1)).as("n_users"))
  }

  private def userLifecycleSql: String =
    """WITH uw AS (
      |  SELECT DISTINCT user_id,
      |    (epoch_us(ts) // 86400000000) // 7 AS wk
      |  FROM events),
      |s AS (SELECT wk,
      |        CASE WHEN lag(wk, 1) OVER win IS NULL THEN 'new'
      |             WHEN wk - lag(wk, 1) OVER win = 1 THEN 'active'
      |             ELSE 'resurrected' END AS state
      |      FROM uw WINDOW win AS (PARTITION BY user_id ORDER BY wk))
      |SELECT wk, state, count(*) AS n_users
      |FROM s GROUP BY wk, state""".stripMargin

  /** Price/volume/mix bridge between the corpus's two halves — the
    * revenue-variance decomposition every finance review runs
    * ("how much of the change is more UNITS vs higher PRICE"): per
    * part brand, ΔRevenue splits into
    *
    *   volume = (q₂−q₁)·p̄₁,  price = q₂·(p̄₂−p̄₁),  residual
    *
    * with p̄ the per-unit cents `r div q` and the residual keeping
    * the bridge EXACTLY additive (volume + price + residual =
    * r₂ − r₁ by construction — trunc division's crumbs land in the
    * residual instead of silently unbalancing the bridge, which is
    * what float decompositions do). Periods split at the midpoint
    * epoch-day of the order-date range (a data-derived scalar — no
    * wall clock); brands active in only one period drop (no p̄ to
    * bridge — documented).
    *
    * Scale shape: ONE pass over the joined fact (conditional
    * partial+final sums per brand — no second scan for the second
    * period), the part dimension broadcast-able, min/max dates one
    * scalar aggregate. */
  def priceVolumeMix(spark: SparkSession, dir: String): DataFrame = {
    val od = expr("cast(datediff(cast(o_orderdate as date), date'1970-01-01') as bigint)")
    val bounds = Tables.orders(spark, dir).agg(min(od).as("mn"), max(od).as("mx")).head()
    val mid = (bounds.getLong(0) + bounds.getLong(1)) / 2L
    val j = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"),
        col("l_quantity").cast(DecimalType(38, 0)).as("q"),
        expr("cast(floor(l_extendedprice * 100 + 0.5) as decimal(38,0))").as("r"))
      .join(Tables.orders(spark, dir).select(col("o_orderkey"), od.as("od")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.part(spark, dir).select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
    j.groupBy(col("p_brand"))
      .agg(sum(when(col("od") <= mid, col("q")).otherwise(lit(0L))).as("q1"),
        sum(when(col("od") <= mid, col("r")).otherwise(lit(0L))).as("r1"),
        sum(when(col("od") > mid, col("q")).otherwise(lit(0L))).as("q2"),
        sum(when(col("od") > mid, col("r")).otherwise(lit(0L))).as("r2"))
      .filter(col("q1") > 0 && col("q2") > 0)
      .select(col("p_brand"),
        expr("cast(q1 as bigint)").as("q1"), expr("cast(r1 as bigint)").as("r1"),
        expr("cast(q2 as bigint)").as("q2"), expr("cast(r2 as bigint)").as("r2"),
        expr("cast((q2 - q1) * (r1 div q1) as bigint)").as("volume_effect"),
        expr("cast(q2 * ((r2 div q2) - (r1 div q1)) as bigint)").as("price_effect"))
      .withColumn("residual",
        col("r2") - col("r1") - col("volume_effect") - col("price_effect"))
  }

  private def priceVolumeMixSql: String =
    """WITH bounds AS (
      |  SELECT (min(CAST(o_orderdate AS DATE) - DATE '1970-01-01')
      |         + max(CAST(o_orderdate AS DATE) - DATE '1970-01-01')) // 2 AS mid
      |  FROM orders),
      |j AS (
      |  SELECT p_brand,
      |    CASE WHEN CAST(o_orderdate AS DATE) - DATE '1970-01-01'
      |              <= (SELECT mid FROM bounds) THEN 1 ELSE 0 END AS p1,
      |    CAST(l_quantity AS HUGEINT) AS q,
      |    CAST(floor(l_extendedprice * 100 + 0.5) AS HUGEINT) AS r
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN part ON l_partkey = p_partkey),
      |g AS (
      |  SELECT p_brand,
      |    sum(CASE WHEN p1 = 1 THEN q ELSE 0 END) AS q1,
      |    sum(CASE WHEN p1 = 1 THEN r ELSE 0 END) AS r1,
      |    sum(CASE WHEN p1 = 0 THEN q ELSE 0 END) AS q2,
      |    sum(CASE WHEN p1 = 0 THEN r ELSE 0 END) AS r2
      |  FROM j GROUP BY p_brand)
      |SELECT p_brand,
      |  CAST(q1 AS BIGINT) AS q1, CAST(r1 AS BIGINT) AS r1,
      |  CAST(q2 AS BIGINT) AS q2, CAST(r2 AS BIGINT) AS r2,
      |  CAST((q2 - q1) * (r1 // q1) AS BIGINT) AS volume_effect,
      |  CAST(q2 * ((r2 // q2) - (r1 // q1)) AS BIGINT) AS price_effect,
      |  CAST((r2 - r1) - (q2 - q1) * (r1 // q1)
      |       - q2 * ((r2 // q2) - (r1 // q1)) AS BIGINT) AS residual
      |FROM g WHERE q1 > 0 AND q2 > 0""".stripMargin

  /** Audience-overlap Jaccard between event types — the behavioral
    * set-similarity matrix ("do the users who click also purchase"),
    * exact on the 2²⁰ lattice: per type pair, |A∩B| from a
    * canonically-oriented self-join of the DISTINCT (type, user)
    * relation blocked on the USER key (per-user fan-out is
    * C(|types a user touches|, 2) — an enum-cardinality bound, the
    * copurchase basket rule, never all-pairs), margins broadcast
    * back, `jaccard_q = (2²⁰·∩) div (n_a + n_b − ∩)`.
    *
    * Scale shape: the distinct relation persists once (pairs and
    * margins both read it), ONE shuffle on user_id for the pair
    * join, the |types|-row margins broadcast twice. */
  def typeJaccard(spark: SparkSession, dir: String): DataFrame = {
    val s = Tables.events(spark, dir)
      .select(col("event_type").as("t"), col("user_id"))
      .distinct()
      .repartition(col("user_id")).persistScoped()
    val cnt = s.groupBy(col("t")).agg(count(lit(1)).as("n"))
    s.as("a").join(s.as("b"),
        col("a.user_id") === col("b.user_id") && col("a.t") < col("b.t"))
      .groupBy(col("a.t").as("type_a"), col("b.t").as("type_b"))
      .agg(count(lit(1)).as("inter"))
      .join(broadcast(cnt.select(col("t").as("type_a"), col("n").as("n_a"))), "type_a")
      .join(broadcast(cnt.select(col("t").as("type_b"), col("n").as("n_b"))), "type_b")
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"), col("inter"),
        expr("cast((cast(inter as decimal(38,0)) * 1048576) div (n_a + n_b - inter) as bigint)")
          .as("jaccard_q"))
  }

  private def typeJaccardSql: String =
    """WITH s AS (SELECT DISTINCT event_type AS t, user_id FROM events),
      |cnt AS (SELECT t, count(*) AS n FROM s GROUP BY 1),
      |i AS (SELECT a.t AS type_a, b.t AS type_b, count(*) AS inter
      |      FROM s a JOIN s b ON a.user_id = b.user_id AND a.t < b.t
      |      GROUP BY 1, 2)
      |SELECT type_a, type_b,
      |  CAST(ca.n AS BIGINT) AS n_a, CAST(cb.n AS BIGINT) AS n_b,
      |  CAST(inter AS BIGINT) AS inter,
      |  CAST((CAST(inter AS HUGEINT) * 1048576)
      |       // (ca.n + cb.n - inter) AS BIGINT) AS jaccard_q
      |FROM i
      |JOIN cnt ca ON i.type_a = ca.t
      |JOIN cnt cb ON i.type_b = cb.t""".stripMargin

  /** Week-over-week revenue growth in basis points — the top-line
    * trend metric every revenue dashboard leads with: weekly cents
    * totals (engine-neutral epoch-weeks, the user_lifecycle rule),
    * then `growth_bp = ((rₜ − rₜ₋₁)·10⁴) div rₜ₋₁` off one lag —
    * exact integral basis points, negatives under the trunc rule.
    * The first week has no predecessor and drops.
    *
    * Scale shape: the fact collapses to |weeks| rows partial+final
    * FIRST; the lag window then runs over a TIME-GRAIN-bounded
    * relation (rows grow with calendar span, not data volume — the
    * one class of relation where a single-partition window is
    * legitimate at any scale, same reasoning as resample grids). */
  def revenueWow(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("wk").asc)
    Tables.orders(spark, dir)
      .select(
        expr("(cast(datediff(cast(o_orderdate as date), date'1970-01-01') as bigint)) div 7")
          .as("wk"),
        expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)").as("cents"))
      .groupBy(col("wk")).agg(sum(col("cents")).as("revenue_cents"))
      .withColumn("prev", lag(col("revenue_cents"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("wk"), col("revenue_cents"),
        expr("cast(((cast(revenue_cents as decimal(38,0)) - prev) * 10000) div prev as bigint)")
          .as("growth_bp"))
  }

  private def revenueWowSql: String =
    """WITH g AS (
      |  SELECT (CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)) // 7 AS wk,
      |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |      AS revenue_cents
      |  FROM orders GROUP BY 1),
      |l AS (SELECT wk, revenue_cents,
      |        lag(revenue_cents, 1) OVER (ORDER BY wk) AS prev FROM g)
      |SELECT wk, revenue_cents,
      |  CAST(((CAST(revenue_cents AS HUGEINT) - prev) * 10000) // prev AS BIGINT)
      |    AS growth_bp
      |FROM l WHERE prev IS NOT NULL""".stripMargin

  /** Running-peak drawdown of weekly revenue — the risk metric
    * ("how far below the best week ever are we") finance runs on
    * every series: per week the running maximum so far and the
    * drawdown `((peak − r)·2²⁰) div peak` on the lattice — 0 at a
    * fresh peak, → 2²⁰ toward total collapse. Same time-grain-
    * bounded window note as [[revenueWow]]; the running max is ONE
    * unbounded-preceding frame over the |weeks|-row rollup.
    *
    * Scale shape: partial+final weekly fold first; everything
    * windowed is calendar-bounded metadata. */
  def drawdown(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("wk").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .select(
        expr("(cast(datediff(cast(o_orderdate as date), date'1970-01-01') as bigint)) div 7")
          .as("wk"),
        expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)").as("cents"))
      .groupBy(col("wk")).agg(sum(col("cents")).as("revenue_cents"))
      .withColumn("peak_cents", max(col("revenue_cents")).over(w))
      .select(col("wk"), col("revenue_cents"), col("peak_cents"),
        expr("cast(((cast(peak_cents as decimal(38,0)) - revenue_cents) * 1048576) div peak_cents as bigint)")
          .as("drawdown_q"))
  }

  private def drawdownSql: String =
    """WITH g AS (
      |  SELECT (CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)) // 7 AS wk,
      |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |      AS revenue_cents
      |  FROM orders GROUP BY 1),
      |p AS (SELECT wk, revenue_cents,
      |        max(revenue_cents) OVER (ORDER BY wk
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak_cents
      |      FROM g)
      |SELECT wk, revenue_cents, peak_cents,
      |  CAST(((CAST(peak_cents AS HUGEINT) - revenue_cents) * 1048576)
      |       // peak_cents AS BIGINT) AS drawdown_q
      |FROM p""".stripMargin

  /** Duplicate-charge screen — the accounts-payable error primitive
    * ("the same part billed twice on one invoice"): every
    * (order, part) pair that appears on MORE than one line, with the
    * line count, combined quantity and cents, and the price spread
    * between the repeated lines (a zero spread is the classic
    * double-keying signature; a wide one is a pricing error). Pure
    * partial+final aggregation with a HAVING — no self-join at all,
    * so the screen costs one shuffle of (order, part, partials) at
    * any scale (the blocking-not-pairs dedup lesson taken to its
    * limit: the "block" IS the group).
    */
  def dupCharges(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"),
        col("l_quantity").cast(DecimalType(38, 0)).as("q"),
        expr("cast(floor(l_extendedprice * 100 + 0.5) as bigint)").as("cents"))
      .groupBy(col("l_orderkey"), col("l_partkey"))
      .agg(count(lit(1)).as("n_lines"),
        expr("cast(sum(q) as bigint)").as("total_qty"),
        sum(col("cents")).as("total_cents"),
        (max(col("cents")) - min(col("cents"))).as("spread_cents"))
      .filter(col("n_lines") > 1L)

  private def dupChargesSql: String =
    """SELECT l_orderkey, l_partkey, count(*) AS n_lines,
      |  CAST(sum(CAST(l_quantity AS HUGEINT)) AS BIGINT) AS total_qty,
      |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |    AS total_cents,
      |  max(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
      |    - min(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS spread_cents
      |FROM lineitem
      |GROUP BY l_orderkey, l_partkey
      |HAVING count(*) > 1""".stripMargin

  /** Categorical distribution drift between the corpus's two halves
    * — the data-quality monitor for ENUM columns ("did the
    * order-priority mix shift after the release"), the distribution
    * companion to union_drift's SCHEMA drift: per category, both
    * periods' counts and 2²⁰-lattice shares plus the per-category
    * share delta (total-variation distance = Σdrift_q div 2 — left
    * to the reader's sum so the table stays per-category). The
    * period split is the [[priceVolumeMix]] data-derived midpoint;
    * categories absent from a period report share 0 via the
    * conditional sums (never dropped — absence IS drift).
    *
    * Scale shape: one conditional partial+final pass over the fact
    * (the PVM shape), the two totals attached by one ScalarJoin
    * broadcast. */
  def categoryDrift(spark: SparkSession, dir: String): DataFrame = {
    val od = expr("cast(datediff(cast(o_orderdate as date), date'1970-01-01') as bigint)")
    val bounds = Tables.orders(spark, dir).agg(min(od).as("mn"), max(od).as("mx")).head()
    val mid = (bounds.getLong(0) + bounds.getLong(1)) / 2L
    val g = Tables.orders(spark, dir)
      .select(col("o_orderpriority"), od.as("od"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(when(col("od") <= mid, 1L).otherwise(0L)).as("n1"),
        sum(when(col("od") > mid, 1L).otherwise(0L)).as("n2"))
      .persistScoped()
    val tot = g.agg(sum(col("n1")).as("t1"), sum(col("n2")).as("t2"),
      count(lit(1)).as("nn"))
    ScalarJoin.attachScalar(g, col("n1") + col("n2"), tot, col("nn"))
      .select(col("o_orderpriority"), col("n1"), col("n2"),
        expr("cast((cast(n1 as decimal(38,0)) * 1048576) div t1 as bigint)").as("share1_q"),
        expr("cast((cast(n2 as decimal(38,0)) * 1048576) div t2 as bigint)").as("share2_q"))
      .withColumn("drift_q", abs(col("share1_q") - col("share2_q")))
  }

  private def categoryDriftSql: String =
    """WITH bounds AS (
      |  SELECT (min(CAST(o_orderdate AS DATE) - DATE '1970-01-01')
      |         + max(CAST(o_orderdate AS DATE) - DATE '1970-01-01')) // 2 AS mid
      |  FROM orders),
      |b AS (
      |  SELECT o_orderpriority,
      |    CASE WHEN CAST(o_orderdate AS DATE) - DATE '1970-01-01'
      |              <= (SELECT mid FROM bounds) THEN 1 ELSE 0 END AS p1
      |  FROM orders),
      |g AS (
      |  SELECT o_orderpriority,
      |    sum(CASE WHEN p1 = 1 THEN 1 ELSE 0 END) AS n1,
      |    sum(CASE WHEN p1 = 0 THEN 1 ELSE 0 END) AS n2
      |  FROM b GROUP BY 1),
      |t AS (SELECT CAST(sum(n1) AS HUGEINT) AS t1,
      |             CAST(sum(n2) AS HUGEINT) AS t2 FROM g)
      |SELECT o_orderpriority, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
      |  CAST((CAST(n1 AS HUGEINT) * 1048576) // (SELECT t1 FROM t) AS BIGINT) AS share1_q,
      |  CAST((CAST(n2 AS HUGEINT) * 1048576) // (SELECT t2 FROM t) AS BIGINT) AS share2_q,
      |  abs(CAST((CAST(n1 AS HUGEINT) * 1048576) // (SELECT t1 FROM t) AS BIGINT)
      |    - CAST((CAST(n2 AS HUGEINT) * 1048576) // (SELECT t2 FROM t) AS BIGINT)) AS drift_q
      |FROM g""".stripMargin

  /** Nation-to-nation trade-flow matrix — the classic OLAP rollup of
    * the full star ("how much does FRANCE buy from GERMANY"):
    * customer nation × supplier nation revenue in exact cents, plus
    * each cell's share of its BUYER-nation row on the 2²⁰ lattice
    * (which supplier-nations a buyer concentrates on — the
    * [[supplierHhi]] question in matrix form). ~|nations|² output.
    *
    * Scale shape: the fact stream takes TWO broadcast dimension
    * hops (customer and supplier are dimension-scale; at 100 TB
    * they'd be bucketed or still broadcast — either way the fact
    * never wide-shuffles for the dimensions), one partial+final
    * (c_nation, s_nation) aggregate, and the 25-row row totals
    * broadcast back — the seasonal_profile shape. */
  def tradeMatrix(spark: SparkSession, dir: String): DataFrame = {
    val cn = Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey"))
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey").as("c_nationkey"), col("n_name").as("cust_nation"))),
        "c_nationkey")
    val sn = Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey"))
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey").as("s_nationkey"), col("n_name").as("supp_nation"))),
        "s_nationkey")
    val g = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"),
        expr("cast(floor(l_extendedprice * 100 + 0.5) as bigint)").as("r"))
      .join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cn), col("o_custkey") === col("c_custkey"))
      .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("cust_nation"), col("supp_nation"))
      .agg(sum(col("r")).as("revenue_cents"))
    val rowTot = g.groupBy(col("cust_nation"))
      .agg(sum(col("revenue_cents").cast(DecimalType(38, 0))).as("rt"))
    g.join(broadcast(rowTot), "cust_nation")
      .select(col("cust_nation"), col("supp_nation"), col("revenue_cents"),
        expr("cast((cast(revenue_cents as decimal(38,0)) * 1048576) div rt as bigint)")
          .as("row_share_q"))
  }

  private def tradeMatrixSql: String =
    """WITH g AS (
      |  SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
      |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |      AS revenue_cents
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation cn ON c_nationkey = cn.n_nationkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation sn ON s_nationkey = sn.n_nationkey
      |  GROUP BY 1, 2),
      |rt AS (SELECT cust_nation, CAST(sum(revenue_cents) AS HUGEINT) AS rt
      |       FROM g GROUP BY 1)
      |SELECT g.cust_nation, g.supp_nation, g.revenue_cents,
      |  CAST((CAST(g.revenue_cents AS HUGEINT) * 1048576) // rt.rt AS BIGINT)
      |    AS row_share_q
      |FROM g JOIN rt USING (cust_nation)""".stripMargin

  /** Churn label + feature assembly — the FEATURE-STORE join a churn
    * model trains on, end to end inside the engine: per customer the
    * RFM raw metrics ([[rfmSegment]]'s aggregate), the purchase
    * cadence ([[purchaseGaps]]' exact mean gap), and a reproducible
    * label `churned = r_days > 2·(median inter-purchase gap of the
    * whole corpus)` — the median is a DISCRETE rank-lattice order
    * statistic over per-customer mean gaps (one scalar, data-derived
    * — no wall clock, no magic constant), so the label set is
    * hash-exact. Single-order customers carry no cadence: their
    * mean_gap is the −1 sentinel (null-free gate) and they label by
    * recency alone.
    *
    * Scale shape: two |customers|-row aggregates joined on the key,
    * the median one dimension-scale sort-free rank pick (ranked by
    * the distributed-sort lattice), label a narrow map. */
  def churnLabel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rfm = Tables.orders(spark, dir)
      .select(col("o_custkey").as("c_custkey"),
        expr("cast(datediff(cast(o_orderdate as date), date'1970-01-01') as bigint)").as("od"),
        expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)").as("cents"))
      .groupBy(col("c_custkey"))
      .agg(max(col("od")).as("last_od"), count(lit(1)).as("f"),
        sum(col("cents")).as("m_cents"))
      .persistScoped()
    val anchor = rfm.agg(max(col("last_od"))).head().getLong(0)
    val gaps = purchaseGaps(spark, dir)
      .select(col("c_custkey"), col("mean_gap_x100"))
      .persistScoped()
    // corpus median of per-customer mean gaps: the spend_percentile
    // rank machinery picks the (n-1)*50 div 100 + 1 element
    val n = gaps.count()
    val medIdx = (n - 1L) * 50L / 100L
    // Degenerate corpus (every customer single-order): gaps is empty,
    // there is no cadence median, and the oracle's scalar subquery
    // yields NULL → CASE → churned = 0 for all. Mirror that exactly
    // with an unreachable threshold instead of throwing on .head
    // (ADVICE r11). 2·med stays far below Long.MaxValue — no overflow.
    val med =
      if (n == 0L) Long.MaxValue / 4L
      else gaps.orderBy(col("mean_gap_x100").asc, col("c_custkey").asc)
        .select(col("mean_gap_x100")).as[Long]
        .rdd.zipWithIndex().filter(_._2 == medIdx).map(_._1).collect().head
    rfm.join(gaps, Seq("c_custkey"), "left")
      .select(col("c_custkey"), (lit(anchor) - col("last_od")).as("r_days"),
        col("f"), col("m_cents"),
        coalesce(col("mean_gap_x100"), lit(-1L)).as("mean_gap_x100"))
      .withColumn("churned",
        (col("r_days") * 100L > lit(2L * med)).cast("int").cast("long"))
  }

  private def churnLabelSql: String =
    """WITH rfm AS (
      |  SELECT o_custkey AS c_custkey,
      |    max(CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS last_od,
      |    count(*) AS f,
      |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS m_cents
      |  FROM orders GROUP BY 1),
      |anchor AS (SELECT max(last_od) AS a FROM rfm),
      |b AS (
      |  SELECT o_custkey AS key, o_orderkey AS ok,
      |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS od
      |  FROM orders),
      |gp AS (SELECT key,
      |         od - lag(od, 1) OVER (PARTITION BY key ORDER BY od, ok) AS gap
      |       FROM b),
      |gaps AS (SELECT key AS c_custkey,
      |           CAST((CAST(sum(gap) AS HUGEINT) * 100) // count(*) AS BIGINT) AS mean_gap_x100
      |         FROM gp WHERE gap IS NOT NULL GROUP BY key),
      |r AS (SELECT mean_gap_x100,
      |        row_number() OVER (ORDER BY mean_gap_x100, c_custkey) AS rn FROM gaps),
      |nn AS (SELECT count(*) AS n FROM gaps),
      |med AS (SELECT mean_gap_x100 AS m FROM r
      |        WHERE rn = (SELECT (n - 1) * 50 // 100 + 1 FROM nn))
      |SELECT rfm.c_custkey,
      |  CAST((SELECT a FROM anchor) - last_od AS BIGINT) AS r_days,
      |  CAST(f AS BIGINT) AS f, m_cents,
      |  coalesce(gaps.mean_gap_x100, -1) AS mean_gap_x100,
      |  CAST(CASE WHEN ((SELECT a FROM anchor) - last_od) * 100
      |            > 2 * (SELECT m FROM med) THEN 1 ELSE 0 END AS BIGINT) AS churned
      |FROM rfm LEFT JOIN gaps USING (c_custkey)""".stripMargin

  /** Lorenz curve of customer spend by decile — the curve BEHIND
    * [[giniSpend]]'s scalar (the area between this and the diagonal
    * is the Gini): customers in exact spend deciles (ascending — the
    * globalBand rank lattice), each reporting its member count, its
    * cents, and the CUMULATIVE share of total spend held by deciles
    * ≤ it on the 2²⁰ lattice. Decile 10 cumulates to exactly 2²⁰
    * (total div total). Cumulation is the pareto_share literal-pair
    * equi join over ten grouped rows — never a window.
    *
    * Scale shape: fact → |customers| partial+final, one dimension
    * sort, 10-row metadata joins. */
  def lorenzCurve(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val per = Tables.orders(spark, dir)
      .select(col("o_custkey").as("key"),
        expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)").as("cents"))
      .groupBy(col("key")).agg(sum(col("cents")).as("x"))
      .persistScoped()
    val n = per.count()
    val bands = per.join(globalBand(per, "x", n, "decile", 10L), "key")
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sum_cents"))
      .persistScoped()
    val tot = bands.agg(sum(col("sum_cents").cast(DecimalType(38, 0))).as("t"),
      count(lit(1)).as("nn"))
    val pairs = (for { b <- 1L to 10L; b2 <- 1L to b } yield (b, b2))
      .toDF("decile", "b2")
    val cum = broadcast(pairs)
      .join(bands.select(col("decile").as("b2"), col("sum_cents").as("sc2")), "b2")
      .groupBy(col("decile"))
      .agg(sum(col("sc2").cast(DecimalType(38, 0))).as("cum_cents"))
    ScalarJoin.attachScalar(bands, col("n"), tot, col("nn"))
      .join(broadcast(cum), "decile")
      .select(col("decile"), col("n"), col("sum_cents"),
        expr("cast((cum_cents * 1048576) div t as bigint)").as("cum_share_q"))
  }

  private def lorenzCurveSql: String =
    """WITH per AS (
      |  SELECT o_custkey AS key,
      |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
      |  FROM orders GROUP BY 1),
      |nn AS (SELECT count(*) AS n FROM per),
      |b AS (SELECT key, x,
      |        ((row_number() OVER (ORDER BY x, key) - 1) * 10)
      |          // (SELECT n FROM nn) + 1 AS decile
      |      FROM per),
      |g AS (SELECT decile, count(*) AS n, CAST(sum(x) AS BIGINT) AS sum_cents
      |      FROM b GROUP BY decile),
      |t AS (SELECT CAST(sum(sum_cents) AS HUGEINT) AS t FROM g),
      |c AS (SELECT g1.decile, CAST(sum(g2.sum_cents) AS HUGEINT) AS cum_cents
      |      FROM g g1 JOIN g g2 ON g2.decile <= g1.decile GROUP BY 1)
      |SELECT g.decile, CAST(g.n AS BIGINT) AS n, g.sum_cents,
      |  CAST((c.cum_cents * 1048576) // (SELECT t FROM t) AS BIGINT) AS cum_share_q
      |FROM g JOIN c USING (decile)""".stripMargin

  /** CR1 concentration ratio per nation — the single-largest-
    * supplier revenue share, [[supplierHhi]]'s blunt companion (the
    * antitrust pairing: HHI for the whole distribution, CR-k for the
    * head): per nation, supplier count, total cents, the TOP
    * supplier's cents, and its share on the 2²⁰ lattice. Same
    * two-chained-aggregate shape as HHI (max rides the same fold as
    * the sums).
    */
  def nationCr1(spark: SparkSession, dir: String): DataFrame = {
    val perSupp = Tables.lineitem(spark, dir)
      .select(col("l_suppkey"),
        expr("cast(floor(l_extendedprice * 100 + 0.5) as bigint)").as("r"))
      .join(Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey"), col("s_suppkey"))
      .agg(sum(col("r")).as("sr"))
    perSupp.groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("sr").cast(DecimalType(38, 0))).as("tot"),
        max(col("sr")).as("top_sr"))
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("n_nationkey").cast("long").as("n_nationkey"), col("n_name"),
        col("n_suppliers"), expr("cast(tot as bigint)").as("total_cents"),
        col("top_sr").as("top_cents"),
        expr("cast((cast(top_sr as decimal(38,0)) * 1048576) div tot as bigint)")
          .as("cr1_q"))
  }

  private def nationCr1Sql: String =
    """WITH ps AS (
      |  SELECT s_nationkey, s_suppkey,
      |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sr
      |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |  GROUP BY 1, 2),
      |g AS (
      |  SELECT s_nationkey, count(*) AS n_suppliers,
      |    CAST(sum(CAST(sr AS HUGEINT)) AS HUGEINT) AS tot, max(sr) AS top_sr
      |  FROM ps GROUP BY 1)
      |SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
      |  CAST(n_suppliers AS BIGINT) AS n_suppliers,
      |  CAST(tot AS BIGINT) AS total_cents, top_sr AS top_cents,
      |  CAST((CAST(top_sr AS HUGEINT) * 1048576) // tot AS BIGINT) AS cr1_q
      |FROM g JOIN nation ON s_nationkey = n_nationkey""".stripMargin

  /** Herfindahl–Hirschman supplier-concentration index per nation —
    * the antitrust/market-structure metric ("is this nation's supply
    * base a monopoly or a long tail"), HHI = Σ shareᵢ² over each
    * nation's supplier revenue shares, on the 2²⁰ lattice:
    * `(2²⁰·Σrᵢ²) div (Σr)²` — 2²⁰ at monopoly, →2²⁰/k for k equal
    * suppliers. Intermediates widen to decimal(38)/HUGEINT; note
    * (Σr)² is the headroom bound (a 10¹⁹-cent national market nicks
    * decimal(38) — at that scale drop the lattice to 2¹⁰ or bucket
    * by sub-market; documented, the simpson precedent).
    *
    * Scale shape: two chained partial+final aggregates ((nation,
    * supplier) revenue → per-nation fold — the simpson shape), the
    * supplier dimension broadcast-able, nation names attached by a
    * 25-row broadcast. */
  def supplierHhi(spark: SparkSession, dir: String): DataFrame = {
    val perSupp = Tables.lineitem(spark, dir)
      .select(col("l_suppkey"),
        expr("cast(floor(l_extendedprice * 100 + 0.5) as bigint)").as("r"))
      .join(Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey"), col("s_suppkey"))
      .agg(sum(col("r")).as("sr"))
    perSupp.groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("sr").cast(DecimalType(38, 0))).as("tot"),
        sum(col("sr").cast(DecimalType(38, 0)) * col("sr")).as("ss"))
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("n_nationkey").cast("long").as("n_nationkey"), col("n_name"),
        col("n_suppliers"), expr("cast(tot as bigint)").as("total_cents"),
        expr("cast((1048576 * ss) div (tot * tot) as bigint)").as("hhi_q"))
  }

  private def supplierHhiSql: String =
    """WITH ps AS (
      |  SELECT s_nationkey, s_suppkey,
      |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS HUGEINT) AS sr
      |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |  GROUP BY 1, 2),
      |g AS (
      |  SELECT s_nationkey, count(*) AS n_suppliers,
      |    sum(sr) AS tot, sum(sr * sr) AS ss
      |  FROM ps GROUP BY 1)
      |SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
      |  CAST(n_suppliers AS BIGINT) AS n_suppliers,
      |  CAST(tot AS BIGINT) AS total_cents,
      |  CAST((1048576 * ss) // (tot * tot) AS BIGINT) AS hhi_q
      |FROM g JOIN nation ON s_nationkey = n_nationkey""".stripMargin

  /** Exact spend percentile per customer — percent_rank as a
    * FEATURE column ("this account sits at p93 of lifetime spend"),
    * on the 2²⁰ rank lattice: `pct_q = (rank−1)·2²⁰ div (n−1)` under
    * the total order (cents, custkey) — bottom = 0, top = 2²⁰
    * exactly. The rank is the [[rfmSegment]] distributed-sort +
    * zipWithIndex machinery, never a single-task percent_rank()
    * window; DuckDB replays with row_number under the same order.
    * The n−1 denominator is percent_rank's own convention; a
    * single-customer corpus degenerates to pct 0 via the max(·,1)
    * guard.
    *
    * Scale shape: fact → |customers| partial+final, one dimension
    * sort, a narrow map — no joins at all. */
  def spendPercentile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val per = Tables.orders(spark, dir)
      .select(col("o_custkey").as("key"),
        expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)").as("cents"))
      .groupBy(col("key")).agg(sum(col("cents")).as("x"))
    val n = per.count()
    val d = math.max(n - 1L, 1L)
    per.orderBy(col("x").asc, col("key").asc)
      .select(col("key"), col("x")).as[(Long, Long)]
      .rdd.zipWithIndex()
      .map { case ((k, x), i) => (k, x, i * 1048576L / d) }
      .toDF("c_custkey", "spend_cents", "pct_q")
  }

  /** Exact discrete quantile table of `value` per event type —
    * p10/p25/p50/p75/p90 as ORDER STATISTICS on the rank lattice
    * (`rn = (n−1)·p div 100 + 1` under (vq, event_id) — the
    * winsorized_mean rule, no interpolation anywhere), the summary
    * block a metrics dashboard renders per series. agg_approx_quantile
    * gates the SKETCHED path; this is its exact companion, and the
    * five probes share ONE ranked pass instead of five percentile
    * calls.
    *
    * Scale shape: one event_type exchange feeds the ranking window;
    * the 5-percent probe grid rides [[ScalarJoin.broadcastCross]]
    * against the |types|-row counts (a 5·|types| rank lookup, all
    * broadcast); the probe hits pivot back via a |types|-group
    * partial+final fold. */
  def quantileTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("vq").asc, col("event_id").asc)
    val ranked = Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"),
        expr("cast(floor(value * 1000000) as bigint)").as("vq"))
      .withColumn("rn", row_number().over(w))
      .persistScoped()
    val counts = ranked.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val probes = ScalarJoin.broadcastCross(
      counts, col("n"),
      Seq(10L, 25L, 50L, 75L, 90L).toDF("p"), col("p"))
      .select(col("event_type"), col("n"), col("p"),
        (expr("(n - 1) * p div 100") + 1L).as("r"))
    val hits = ranked.join(broadcast(probes), Seq("event_type"))
      .filter(col("rn") === col("r"))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n"),
        max(when(col("p") === 10L, col("vq"))).as("p10_q"),
        max(when(col("p") === 25L, col("vq"))).as("p25_q"),
        max(when(col("p") === 50L, col("vq"))).as("p50_q"),
        max(when(col("p") === 75L, col("vq"))).as("p75_q"),
        max(when(col("p") === 90L, col("vq"))).as("p90_q"))
    hits
  }

  /** Discount elasticity of demand per part type — the pricing
    * question ("does a deeper discount actually move more units of
    * this product family") as a per-group exact OLS slope of
    * quantity against the discount percentage: the [[linregTrend]]
    * closed form re-instantiated with x = whole discount points
    * (floor(·100 + 0.5) — l_discount is 2-decimal) and y = units,
    * slope on the 2²⁰ lattice (`(num·2²⁰) div den` — a per-point
    * unit response; no centering needed, x ∈ [0, 10]). Groups whose
    * x never varies (den = 0) drop — the linreg_trend contract.
    *
    * Scale shape: the part type is denormalized onto lineitem by ONE
    * dimension join (broadcast-able at any scale — part is the
    * dimension side), then a single partial+final five-moment
    * aggregate; no window, no sort. */
  def discountElasticity(spark: SparkSession, dir: String): DataFrame = {
    val num = col("n").cast("decimal(38,0)") * col("sxy") - col("sx") * col("sy")
    val den = col("n").cast("decimal(38,0)") * col("sxx") - col("sx") * col("sx")
    Tables.lineitem(spark, dir)
      .select(col("l_partkey"),
        expr("cast(floor(l_discount * 100 + 0.5) as decimal(38,0))").as("x"),
        col("l_quantity").cast(DecimalType(38, 0)).as("y"))
      .join(Tables.part(spark, dir).select(col("p_partkey"), col("p_type")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("p_type"), col("n"), num.as("num"), den.as("den"))
      .filter(col("den") > 0)
      .select(col("p_type"), col("n"),
        expr("cast((num * 1048576) div den as bigint)").as("slope_q"))
      .withColumn("slope", col("slope_q") / lit(1048576.0))
  }

  private def discountElasticitySql: String =
    """WITH b AS (
      |  SELECT p_type,
      |    CAST(floor(l_discount * 100 + 0.5) AS HUGEINT) AS x,
      |    CAST(l_quantity AS HUGEINT) AS y
      |  FROM lineitem JOIN part ON l_partkey = p_partkey),
      |a AS (SELECT p_type, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
      |        sum(x * y) AS sxy, sum(x * x) AS sxx
      |      FROM b GROUP BY p_type)
      |SELECT p_type, CAST(n AS BIGINT) AS n,
      |  CAST(((CAST(n AS HUGEINT) * sxy - sx * sy) * 1048576)
      |       // (CAST(n AS HUGEINT) * sxx - sx * sx) AS BIGINT) AS slope_q,
      |  CAST(((CAST(n AS HUGEINT) * sxy - sx * sy) * 1048576)
      |       // (CAST(n AS HUGEINT) * sxx - sx * sx) AS BIGINT) / 1048576.0 AS slope
      |FROM a
      |WHERE (CAST(n AS HUGEINT) * sxx - sx * sx) > 0""".stripMargin

  /** Order-to-ship latency profile per calendar month — the
    * fulfillment-SLA rollup ("is shipping drifting slower this
    * quarter"): whole-day latencies from exact epoch-day DATE
    * arithmetic, bucketed by order month (year·100 + month — integer
    * month keys, both engines' year()/month() agree on DATEs), with
    * count, min, max, exact ×100 mean and the DISCRETE p50 on the
    * winsorized_mean rank lattice (`rn = (n−1)·50 div 100 + 1` under
    * (latency, orderkey, linenumber) — no interpolation).
    *
    * Scale shape: the winsorized_mean shape on a month key — ONE
    * exchange feeds the ranking window, the month counts, the median
    * pick and the partial+final stats; the |months|-row count and
    * median tables broadcast back. */
  def shipLatency(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("om"))
      .orderBy(col("lat").asc, col("l_orderkey").asc, col("l_linenumber").asc)
    val ranked = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
      .join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"),
        expr("cast(year(cast(o_orderdate as date)) * 100 + month(cast(o_orderdate as date)) as bigint)")
          .as("om"),
        expr("cast(datediff(cast(l_shipdate as date), cast(o_orderdate as date)) as bigint)")
          .as("lat"))
      .withColumn("rn", row_number().over(w))
      .persistScoped()
    val counts = ranked.groupBy(col("om")).agg(count(lit(1)).as("n"))
    val med = ranked.join(broadcast(counts), "om")
      .filter(col("rn") === expr("(n - 1) * 50 div 100") + 1L)
      .select(col("om"), col("lat").as("p50_days"))
    ranked.groupBy(col("om"))
      .agg(count(lit(1)).as("n"), min(col("lat")).as("min_days"),
        max(col("lat")).as("max_days"),
        sum(col("lat").cast(DecimalType(38, 0))).as("sl"))
      .join(broadcast(med), "om")
      .select(col("om"), col("n"), col("min_days"), col("max_days"),
        expr("cast((sl * 100) div n as bigint)").as("mean_x100"),
        col("p50_days"))
  }

  private def shipLatencySql: String =
    """WITH b AS (
      |  SELECT l_orderkey, l_linenumber,
      |    CAST(year(CAST(o_orderdate AS DATE)) * 100
      |         + month(CAST(o_orderdate AS DATE)) AS BIGINT) AS om,
      |    CAST(CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE) AS BIGINT) AS lat
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |r AS (SELECT om, lat,
      |        row_number() OVER (PARTITION BY om
      |                           ORDER BY lat, l_orderkey, l_linenumber) AS rn,
      |        count(*) OVER (PARTITION BY om) AS n
      |      FROM b),
      |m AS (SELECT om, min(CASE WHEN rn = (n - 1) * 50 // 100 + 1 THEN lat END) AS p50_days
      |      FROM r GROUP BY om)
      |SELECT b.om, count(*) AS n, min(lat) AS min_days, max(lat) AS max_days,
      |  CAST((CAST(sum(lat) AS HUGEINT) * 100) // count(*) AS BIGINT) AS mean_x100,
      |  m.p50_days
      |FROM b JOIN m USING (om)
      |GROUP BY b.om, m.p50_days""".stripMargin

  /** Order-to-ship latency by ORDER PRIORITY — the SLA table that
    * answers whether "1-URGENT" actually ships faster: the
    * [[shipLatency]] machinery keyed on o_orderpriority instead of
    * the calendar month (same exact ×100 mean + DISCRETE rank-lattice
    * p50, same one-exchange shape — window, counts, median pick and
    * stats all ride the priority key; 5 groups, so every side table
    * is broadcast-sized).
    */
  def priorityLatency(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("prio"))
      .orderBy(col("lat").asc, col("l_orderkey").asc, col("l_linenumber").asc)
    val ranked = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
      .join(Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"),
        col("o_orderpriority").as("prio"),
        expr("cast(datediff(cast(l_shipdate as date), cast(o_orderdate as date)) as bigint)")
          .as("lat"))
      .withColumn("rn", row_number().over(w))
      .persistScoped()
    val counts = ranked.groupBy(col("prio")).agg(count(lit(1)).as("n"))
    val med = ranked.join(broadcast(counts), "prio")
      .filter(col("rn") === expr("(n - 1) * 50 div 100") + 1L)
      .select(col("prio"), col("lat").as("p50_days"))
    ranked.groupBy(col("prio"))
      .agg(count(lit(1)).as("n"), min(col("lat")).as("min_days"),
        max(col("lat")).as("max_days"),
        sum(col("lat").cast(DecimalType(38, 0))).as("sl"))
      .join(broadcast(med), "prio")
      .select(col("prio").as("o_orderpriority"), col("n"), col("min_days"),
        col("max_days"),
        expr("cast((sl * 100) div n as bigint)").as("mean_x100"),
        col("p50_days"))
  }

  private def priorityLatencySql: String =
    """WITH b AS (
      |  SELECT l_orderkey, l_linenumber, o_orderpriority AS prio,
      |    CAST(CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE) AS BIGINT) AS lat
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |r AS (SELECT prio, lat,
      |        row_number() OVER (PARTITION BY prio
      |                           ORDER BY lat, l_orderkey, l_linenumber) AS rn,
      |        count(*) OVER (PARTITION BY prio) AS n
      |      FROM b),
      |m AS (SELECT prio, min(CASE WHEN rn = (n - 1) * 50 // 100 + 1 THEN lat END) AS p50_days
      |      FROM r GROUP BY prio)
      |SELECT b.prio AS o_orderpriority, count(*) AS n,
      |  min(lat) AS min_days, max(lat) AS max_days,
      |  CAST((CAST(sum(lat) AS HUGEINT) * 100) // count(*) AS BIGINT) AS mean_x100,
      |  m.p50_days
      |FROM b JOIN m USING (prio)
      |GROUP BY b.prio, m.p50_days""".stripMargin

  /** Market-segment composition per nation — the customer-base mix
    * table ("is this nation machinery-heavy or household-heavy"):
    * counts per (nation, segment) with each cell's share of its
    * nation row on the 2²⁰ lattice — the source_lang_mix /
    * trade_matrix rollup shape on the customer dimension, nation
    * names by a 25-row broadcast.
    */
  def mktsegMix(spark: SparkSession, dir: String): DataFrame = {
    val g = Tables.customer(spark, dir)
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
    val tot = g.groupBy(col("c_nationkey")).agg(sum(col("n_customers")).as("nt"))
    g.join(broadcast(tot), "c_nationkey")
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_mktsegment"), col("n_customers"),
        expr("cast((cast(n_customers as decimal(38,0)) * 1048576) div nt as bigint)")
          .as("nation_share_q"))
  }

  private def mktsegMixSql: String =
    """WITH g AS (SELECT c_nationkey, c_mktsegment, count(*) AS n_customers
      |           FROM customer GROUP BY 1, 2),
      |t AS (SELECT c_nationkey, CAST(sum(n_customers) AS HUGEINT) AS nt
      |      FROM g GROUP BY 1)
      |SELECT n_name, c_mktsegment, CAST(n_customers AS BIGINT) AS n_customers,
      |  CAST((CAST(n_customers AS HUGEINT) * 1048576) // nt AS BIGINT)
      |    AS nation_share_q
      |FROM g JOIN t USING (c_nationkey)
      |JOIN nation ON c_nationkey = n_nationkey""".stripMargin

  /** Inter-purchase gap profile per customer — the recency-dynamics
    * rollup behind churn models and replenishment forecasting ("how
    * regularly does this customer buy, and is the cadence drifting"):
    * consecutive order-date deltas in whole days via one lag window,
    * then min/max/sum/count and the exact mean on the ×100 day
    * lattice (`(Σgap·100) div n`, widened to decimal(38) — Σgap·100
    * at a 10¹²-order customer would nick int64). Customers with a
    * single order have no gap and drop (the linreg_trend den>0
    * convention). Ties on a same-day double order yield a 0-day gap
    * — counted, not collapsed (the documented contract; the gap
    * MULTISET is tie-order invariant since equal dates subtract to
    * zero under any tie-break).
    *
    * Scale shape: the twap pattern — ONE o_custkey exchange whose
    * in-partition sort feeds lag(), then the same partitioning feeds
    * the partial+final aggregate. */
  def purchaseGaps(spark: SparkSession, dir: String): DataFrame =
    purchaseGapsOf(Tables.orders(spark, dir))

  /** The gap-profile core over any orders-shaped frame — extracted
    * for planted-timeline specs. */
  private[operators] def purchaseGapsOf(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("c_custkey"))
      .orderBy(col("od").asc, col("ok").asc)
    orders
      .select(col("o_custkey").as("c_custkey"), col("o_orderkey").as("ok"),
        expr("cast(datediff(cast(o_orderdate as date), date'1970-01-01') as bigint)").as("od"))
      .withColumn("gap", col("od") - lag(col("od"), 1).over(w))
      .filter(col("gap").isNotNull)
      .groupBy(col("c_custkey"))
      .agg(count(lit(1)).as("n_gaps"), min(col("gap")).as("min_gap"),
        max(col("gap")).as("max_gap"), sum(col("gap")).as("sum_gap"))
      .select(col("c_custkey"), col("n_gaps"), col("min_gap"), col("max_gap"),
        col("sum_gap"),
        expr("cast((cast(sum_gap as decimal(38,0)) * 100) div n_gaps as bigint)")
          .as("mean_gap_x100"))
  }

  /** Winsorized mean of `value` per event type — the robust central
    * tendency beside anomaly_mad's robust dispersion: clamp each
    * observation into the group's exact [p5, p95] band, then average,
    * so a single corrupted 10⁹ reading moves the mean by at most the
    * p95 edge instead of dominating it. Percentile edges are
    * DISCRETE order statistics on the rank lattice — the element at
    * row_number `(n−1)·p div 100 + 1` under the total order
    * (vq, event_id) — NOT an interpolated percentile_cont, so both
    * engines pick the identical element and the clamped sum is exact
    * integer arithmetic end to end (values on the 10⁻⁶ floor
    * lattice, mean via ONE trunc division, negatives under the
    * window_ewma trunc rule).
    *
    * Scale shape: one event_type exchange — the ranking window, the
    * edge extraction, and the clamped partial+final aggregate all
    * ride it; the |types|-row edge table broadcasts back (the
    * anomaly_zscore shape). The ranked relation persists once —
    * edges and the clamped fold both read it. */
  def winsorizedMean(spark: SparkSession, dir: String): DataFrame =
    winsorizedMeanOf(Tables.events(spark, dir))

  /** The winsorize core over any events-shaped frame — extracted for
    * planted-outlier specs. */
  private[operators] def winsorizedMeanOf(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("vq").asc, col("event_id").asc)
    val ranked = events
      .select(col("event_type"), col("event_id"),
        expr("cast(floor(value * 1000000) as bigint)").as("vq"))
      .withColumn("rn", row_number().over(w))
      .persistScoped()
    val ranks = ranked.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .select(col("event_type"), col("n"),
        (expr("(n - 1) * 5 div 100") + 1L).as("r_lo"),
        (expr("(n - 1) * 95 div 100") + 1L).as("r_hi"))
    val edges = ranked.join(broadcast(ranks), "event_type")
      .filter(col("rn") === col("r_lo") || col("rn") === col("r_hi"))
      .groupBy(col("event_type"))
      .agg(min(when(col("rn") === col("r_lo"), col("vq"))).as("lo_q"),
        max(when(col("rn") === col("r_hi"), col("vq"))).as("hi_q"))
    ranked.join(broadcast(edges), "event_type")
      .select(col("event_type"), col("lo_q"), col("hi_q"),
        least(greatest(col("vq"), col("lo_q")), col("hi_q")).as("cv"))
      .groupBy(col("event_type"), col("lo_q"), col("hi_q"))
      .agg(count(lit(1)).as("n"),
        sum(col("cv").cast(DecimalType(38, 0))).as("sc"))
      .select(col("event_type"), col("n"), col("lo_q"), col("hi_q"),
        expr("cast(sc div n as bigint)").as("wmean_q"))
      .withColumn("wmean", col("wmean_q") / lit(1000000.0))
  }

  /** Per-user OLS trend (least-squares slope of `value` over time) —
    * the regression primitive behind drift detection, burn-rate
    * projection and per-entity trend scoring ("which users' spend is
    * accelerating"). The whole computation lives on exact integer
    * lattices so the oracle gate is hash-exact: y floors onto the
    * 10⁻⁶ value lattice (the twap rule), x is whole SECONDS since
    * the user's own first event (slope is shift-invariant, and
    * centering keeps every moment bounded by the user's time SPAN,
    * not the epoch — Σx² at a 10⁹-event/30-year user is ~10¹⁵·n,
    * well inside decimal(38) where raw epoch seconds would court the
    * cap), and the closed form
    *
    *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    *
    * is evaluated entirely in decimal(38)/HUGEINT with ONE trunc
    * division onto micro-units-per-DAY (`(num·86400) div den`) —
    * both engines agree bit-for-bit including negative slopes (the
    * window_ewma trunc rule). Degenerate series (single event, or
    * all events in one second: den = 0) drop — the documented
    * contract, matching target_encode's nc>1 gate.
    *
    * Scale shape: ONE exchange on user_id — the unordered window min
    * and the final aggregate share the partitioning (the twap
    * pattern), and the aggregate is partial+final (five sums and a
    * count, all algebraic — no per-user buffering). */
  def linregTrend(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    val num = col("n").cast("decimal(38,0)") * col("sxy") - col("sx") * col("sy")
    val den = col("n").cast("decimal(38,0)") * col("sxx") - col("sx") * col("sx")
    Tables.events(spark, dir)
      .select(col("user_id"),
        expr("unix_micros(ts) div 1000000").as("ts_s"),
        expr("cast(floor(value * 1000000) as decimal(38,0))").as("yq"))
      .withColumn("x", (col("ts_s") - min(col("ts_s")).over(w)).cast("decimal(38,0)"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("yq")).as("sy"),
        sum(col("x") * col("yq")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("user_id"), col("n"), num.as("num"), den.as("den"))
      .filter(col("den") > 0)
      .select(col("user_id"), col("n"),
        expr("cast((num * 86400) div den as bigint)").as("slope_qpd"))
      .withColumn("slope_per_day", col("slope_qpd") / lit(1000000.0))
  }

  /** Theil–Sen slope of the trailing-year daily revenue — the ROBUST
    * trend companion to [[linregTrend]]'s OLS (one Black-Friday spike
    * drags a least-squares slope; the median of pairwise slopes
    * shrugs it off — the estimator has a 29% breakdown point): every
    * ordered day pair contributes ((c₂−c₁)·2²⁰) div (d₂−d₁) on the
    * lattice (truncating division — negative slopes follow the
    * pca_power trunc-toward-zero rule), and the reported slope is the
    * nearest-rank median under the (slope_q, d1, d2) total order.
    * Scale shape: the fact table folds to |days| rows FIRST
    * (partial+final), the trailing-365 cut bounds the pair grid at
    * ≤ 66k rows regardless of corpus size (the one legitimate tiny
    * non-equi join — vocab_overlap's class), and the single-partition
    * rank window orders metadata, never data (fold-below-window). */
  def theilsenTrend(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .select(expr("datediff(to_date(o_orderdate), date'1970-01-01')")
        .cast("long").as("d"),
        expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)").as("cents"))
      .groupBy(col("d")).agg(sum(col("cents")).as("c"))
    val mx = daily.agg(max(col("d")).as("mxd"))
    val recent = ScalarJoin.attachScalar(daily, col("d"), mx, col("mxd"))
      .filter(col("d") > col("mxd") - 365L)
      .select(col("d"), col("c"))
      .persistScoped()
    val pairs = recent.as("a").join(recent.as("b"), col("a.d") < col("b.d"))
      .select(col("a.d").as("d1"), col("b.d").as("d2"),
        expr("((b.c - a.c) * cast(1048576 as bigint)) div (b.d - a.d)").as("slope_q"))
    val w = Window.orderBy(col("slope_q").asc, col("d1").asc, col("d2").asc)
    val ranked = pairs.withColumn("rn", row_number().over(w).cast("long"))
      .persistScoped()
    val np = ranked.agg(count(lit(1)).as("n_pairs"))
    val med = ScalarJoin.attachScalar(ranked, col("rn"), np, col("n_pairs"))
      .filter(col("rn") === expr("(n_pairs - 1) div 2 + 1"))
      .select(col("n_pairs"), col("slope_q").as("slope_med_q"))
    val nd = recent.agg(count(lit(1)).as("n_days"))
    ScalarJoin.attachScalar(med, col("n_pairs"), nd, col("n_days"))
      .select(col("n_days"), col("n_pairs"), col("slope_med_q"))
  }

  private def theilsenTrendSql: String =
    """WITH daily AS (
      |  SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d,
      |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
      |  FROM orders GROUP BY 1),
      |mx AS (SELECT max(d) AS mxd FROM daily),
      |recent AS (SELECT d, c FROM daily, mx WHERE d > mxd - 365),
      |pairs AS (SELECT a.d AS d1, b.d AS d2,
      |                 ((b.c - a.c) * 1048576) // (b.d - a.d) AS slope_q
      |          FROM recent a JOIN recent b ON a.d < b.d),
      |r AS (SELECT slope_q,
      |        row_number() OVER (ORDER BY slope_q ASC, d1 ASC, d2 ASC) AS rn
      |      FROM pairs),
      |n AS (SELECT count(*) AS n_pairs FROM r),
      |nd AS (SELECT count(*) AS n_days FROM recent)
      |SELECT CAST(nd.n_days AS BIGINT) AS n_days,
      |  CAST(n.n_pairs AS BIGINT) AS n_pairs,
      |  CAST(r.slope_q AS BIGINT) AS slope_med_q
      |FROM r, n, nd WHERE r.rn = (n.n_pairs - 1) // 2 + 1""".stripMargin

  private val KAnon = 5L

  /** k-anonymity / l-diversity audit — the re-identification screen a
    * data-governance review runs before a table leaves its boundary:
    * rows group by their QUASI-IDENTIFIER combination (market segment
    * × nation — the attributes an adversary can link from outside),
    * and any group smaller than k = [[KAnon]] is a re-identification
    * risk (its members are "hiding in a crowd" of fewer than k).
    * l_distinct counts distinct sensitive-attribute values (account
    * balance on a coarse 1000-unit cent-lattice bucket) per group —
    * k-anonymous but l=1 still leaks the sensitive value outright
    * (the homogeneity attack l-diversity exists to catch). Exact
    * integer arithmetic throughout; one partial+final fold with an
    * exact distinct — O(|segments|·|nations|) output at any scale. */
  def kAnonymity(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(col("c_mktsegment").as("segment"),
        col("c_nationkey").cast("long").as("nation"),
        expr("floor(c_acctbal * 100 + 0.5) div 100000").as("bal_bucket"))
      .groupBy(col("segment"), col("nation"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("bal_bucket")).as("l_distinct"))
      .select(col("segment"), col("nation"), col("n"), col("l_distinct"),
        (col("n") < KAnon).cast("long").as("risky"))

  private def kAnonymitySql: String =
    s"""SELECT c_mktsegment AS segment, CAST(c_nationkey AS BIGINT) AS nation,
       |  count(*) AS n,
       |  CAST(count(DISTINCT CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) // 100000) AS BIGINT) AS l_distinct,
       |  CAST(CASE WHEN count(*) < $KAnon THEN 1 ELSE 0 END AS BIGINT) AS risky
       |FROM customer GROUP BY 1, 2""".stripMargin

  /** Quantile normalization of per-source document lengths — the
    * cross-source calibration (bioinformatics' microarray classic,
    * here the "source A's 90th-percentile doc should count like
    * source B's 90th-percentile doc" step of corpus mixing): each
    * document's WITHIN-SOURCE rank r of n_s maps to the corpus value
    * at rank (r·N) div n_s under the same (len, doc_id) total order,
    * so every source's length distribution lands on the corpus's.
    * Exact ranks only — the within-source rank is a keyed window,
    * and the corpus-wide rank comes from the distributed
    * sort + zipWithIndex primitive (the globalBand rule: exact
    * global ranks never use a single-partition window). Scale shape:
    * one persisted narrow fold, one keyed window, one distributed
    * sort, one rank-key join. */
  def quantileNormalize(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{length => flength}
    val spark2 = spark
    import spark2.implicits._
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        flength(col("text")).cast("long").as("len"))
      .persistScoped()
    val n = docs.count()
    val corpusRank = docs.orderBy(col("len").asc, col("doc_id").asc)
      .select(col("doc_id"), col("len")).as[(Long, Long)]
      .rdd.zipWithIndex()
      .map { case ((_, len), idx) => (idx + 1L, len) }
      .toDF("rt", "norm_len")
    val ws = Window.partitionBy(col("source"))
      .orderBy(col("len").asc, col("doc_id").asc)
    docs
      .withColumn("r", row_number().over(ws).cast("long"))
      .withColumn("n_s", count(lit(1)).over(Window.partitionBy(col("source"))))
      .withColumn("rt", expr(s"(r * cast($n as bigint)) div n_s"))
      .join(corpusRank, "rt")
      .select(col("doc_id"), col("source"), col("len"), col("norm_len"))
  }

  private def quantileNormalizeSql: String =
    """WITH d AS (SELECT doc_id, source, CAST(length(text) AS BIGINT) AS len FROM documents),
      |n AS (SELECT count(*) AS nn FROM d),
      |cr AS (SELECT row_number() OVER (ORDER BY len ASC, doc_id ASC) AS rt, len AS norm_len FROM d),
      |s AS (SELECT doc_id, source, len,
      |        row_number() OVER (PARTITION BY source ORDER BY len ASC, doc_id ASC) AS r,
      |        count(*) OVER (PARTITION BY source) AS n_s
      |      FROM d)
      |SELECT s.doc_id, s.source, s.len, cr.norm_len
      |FROM s, n JOIN cr ON cr.rt = (s.r * n.nn) // s.n_s""".stripMargin

  /** Simpson concentration index of each user's event-type mix —
    * the log-free diversity metric (probability two random events
    * share a type, Σcᵢ²/n²): corpus/source-diversity reports use
    * exactly this where Shannon entropy's ln() would drift by ULPs
    * across engines — the integral lattice form is the engine's
    * standing rule for score-like outputs. simpson_q = 2²⁰ at total
    * concentration (one type), → 2²⁰/k for a uniform k-type mix.
    * Products widen to decimal(38)/HUGEINT (2²⁰·Σc² passes int64
    * once a user logs ~3M events of one type).
    * Shape: two chained partial+final aggregations — (user, type)
    * counts, then the per-user fold. The second exchange carries the
    * ALREADY-GROUPED relation (≤ |users|·|types| rows), which is why
    * two small shuffles beat pre-partitioning by user (that would
    * shuffle raw events and forfeit the first map-side combine). */
  def simpsonDiversity(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("user_id"))
      .agg(sum(col("c")).as("n"),
        sum(expr("cast(c as decimal(38,0)) * c")).as("ss"))
      // raw Σc² stays internal (it alone outgrows int64 at web
      // scale); the emitted columns — n and the ≤2²⁰ quotient — are
      // BIGINT-safe at ANY cardinality
      .select(col("user_id"), col("n"),
        expr("cast((cast(1048576 as decimal(38,0)) * ss) div (cast(n as decimal(38,0)) * n) as bigint)")
          .as("simpson_q"))

  /** Time-weighted average (TWAP/TWA) of `value` per user — the
    * metric that is CORRECT for irregularly-sampled series where the
    * plain mean over-weights bursts (finance TWAP, metrics
    * time-averaging, billing for sampled gauges): each reading holds
    * until the next one, so it weighs by its holding interval,
    * Σ vᵢ·(tᵢ₊₁−tᵢ) / (tₙ−t₀). Accumulation stays exact: intervals
    * are integral micros, value widens to decimal so the weighted
    * sum is order-insensitive (the agg_stats rule); only the final
    * one-shot division is a double. Users with a single event have
    * no holding interval and drop (null-free gate).
    *
    * Scale shape: the sessionize shape — ONE exchange on user_id
    * whose in-partition sort feeds the lead() window, then the same
    * partitioning feeds the partial+final aggregate, no second
    * shuffle. */
  def twap(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("t").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("t"), col("value"))
      .withColumn("t_next", lead(col("t"), 1).over(w))
      .filter(col("t_next").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("t_next") - col("t")).as("span_us"),
        // value quantizes by FLOOR onto the 2⁻²⁰-style 10⁻⁶ lattice
        // (bit-exact on doubles in both engines — the QScale rule;
        // a decimal CAST would round, and decimal rounding modes
        // differ cross-engine); products widen to decimal(38) since
        // v_q·Δt reaches ~10²² at decade-long spans
        sum(expr("cast(floor(value * 1000000) as decimal(38,0))")
          * (col("t_next") - col("t"))).as("num_q"))
      // the ~10²⁰ weighted sum never becomes a double (its
      // nearest-double rounding is engine-dependent past 2⁵³): the
      // time-division happens IN the integer lattice, so twap_q is an
      // exact micro-scaled BIGINT and the only double is the final
      // exact-operand division by 10⁶
      .select(col("user_id"), col("n_intervals"), col("span_us"),
        expr("cast(num_q div span_us as bigint)").as("twap_q"))
      .withColumn("twap", col("twap_q") / lit(1000000.0))
  }

  /** Exponentially-weighted moving average (α = 1/4) of `value` per
    * user timeline — the smoothing primitive behind rate dashboards
    * and drift monitors. The true EWMA is a sequential recurrence
    * (unvectorizable in one window pass), so this is the standard
    * TRUNCATED form: 8 explicit lag terms, weights α(1−α)ᵏ = 3ᵏ/4ᵏ⁺¹,
    * covering 1−(3/4)⁸ ≈ 90% of the mass — the tail is dropped, not
    * renormalized (documented contract; rows without 8 predecessors
    * drop). Everything is exact integer arithmetic: values floor
    * onto the 10⁻⁶ lattice (the twap rule), the weighted sum is
    * Σ v_q·3ᵏ·4⁷⁻ᵏ with decimal(38) headroom, and ONE truncating
    * division by 4⁸ lands ewma_q back in BIGINT — both engines
    * bit-equal including negatives (trunc-toward-zero verified).
    * Scale shape: one user_id exchange, one in-partition sort, all
    * eight lags read from the SAME window buffer — identical plan
    * cost to a single lag. */
  def windowEwma(spark: SparkSession, dir: String): DataFrame =
    windowEwmaOf(Tables.events(spark, dir))

  private[operators] def windowEwmaOf(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val coef = Seq(16384L, 12288L, 9216L, 6912L, 5184L, 3888L, 2916L, 2187L)
    val base = events
      .select(col("user_id"), col("event_id"), col("ts"),
        expr("cast(floor(value * 1000000) as decimal(38,0))").as("vq"))
      .withColumn("rn", row_number().over(w))
    val weighted = coef.zipWithIndex.map { case (c, k) =>
      (if (k == 0) col("vq") else lag(col("vq"), k).over(w)) * lit(c)
    }.reduce(_ + _)
    base
      .withColumn("ewma_q", weighted)
      .filter(col("rn") >= 8)
      .select(col("user_id"), col("event_id"), col("ts"),
        expr("cast(ewma_q div 65536 as bigint)").as("ewma_q"))
      .withColumn("ewma", col("ewma_q") / lit(1000000.0))
  }

  /** Poisson bootstrap — the single-pass resampling scheme for
    * estimating the sampling uncertainty of an aggregate over data
    * too large to resample classically (Chamandy et al., Google,
    * 2012: a true bootstrap draw needs n with-replacement picks per
    * replicate — impossible streaming — but each row's multiplicity
    * in a replicate converges to Poisson(1), which CAN be drawn
    * per-row, independently, in one scan). Each of the 8 replicates
    * weights every order by w ~ Poisson(1), deterministically: 16
    * md5 bits of (o_orderkey, replicate) against the fixed CDF
    * lattice ⌊2¹⁶·P(≤k)⌋ = 24109/48218/60273/64291/65296 (tail
    * capped at 5, P ≈ 4·10⁻⁴). The replicate spread of `sum_price`
    * IS the standard-error estimate; replicate sums are emitted
    * (not the final stddev) so the artifact is integral/decimal —
    * exact cross-engine.
    *
    * Scale shape: the 8-row replicate grid attaches via the
    * non-foldable broadcast ([[ScalarJoin.broadcastCross]] — a hash
    * join, never BNLJ), weights ride the scan, and each replicate is
    * one partial+final sum: 8× map-side fan-out, ONE shuffle of 8×
    * shuffle.partitions tiny partial rows, zero extra passes over
    * the fact table. Decimal accumulation keeps the sums
    * order-insensitive (the agg_stats rule). */
  def poissonBootstrap(spark: SparkSession, dir: String): DataFrame = {
    val reps = spark.range(0, 8).select(col("id").as("b"))
    val g = ScalarJoin.broadcastCross(
      Tables.orders(spark, dir).select(col("o_orderkey"), col("o_totalprice")),
      col("o_orderkey"), reps, col("b"))
      .withColumn("h", conv(substring(md5(
        concat(col("o_orderkey").cast("string"), lit("-"), col("b").cast("string"))),
        1, 4), 16, 10).cast("long"))
      .withColumn("w",
        when(col("h") < 24109, 0L).when(col("h") < 48218, 1L)
          .when(col("h") < 60273, 2L).when(col("h") < 64291, 3L)
          .when(col("h") < 65296, 4L).otherwise(5L))
    g.groupBy(col("b"))
      .agg(sum(col("w")).as("n_eff"),
        sum(col("w") * col("o_totalprice").cast("decimal(30,4)"))
          .cast("double").as("sum_price"))
  }

  /** Exact DISCRETE quantiles per group (p25/p50/p75/p95 of
    * l_quantity by return flag) — the holistic counterpart to
    * [[aggMedian]]'s interpolated percentile and
    * `agg_approx_quantile`'s GK sketch: PERCENTILE_DISC returns an
    * ACTUAL data value (the first at cumulative rank ≥ q), the form
    * auditors want when the quantile must be a real observed
    * measurement. Engine conventions for the boundary rank differ
    * (Spark's percentile_disc vs DuckDB's quantile_disc), so both
    * sides compute the SAME explicit rule: value at row
    * ceil(q·n) = (q·n + 99) div 100 of the per-group ascending sort —
    * integer arithmetic, no convention to disagree on. Ties in value
    * can't perturb the answer (position k's value is order-invariant
    * among equal values), so row_number needs no tiebreak contract.
    * Scale shape: ONE exchange on the group key feeds the window sort
    * AND the final per-group fold; the picked rows collapse via
    * max(CASE) — a partial+final aggregate, no second sort. At
    * extreme group cardinality the same output contract downgrades
    * to the GK sketch (`agg_approx_quantile`) — this operator is the
    * exact tier of that pair. */
  def aggQuantileDisc(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("g")).orderBy(col("v").asc)
    val r = Tables.lineitem(spark, dir)
      .select(col("l_returnflag").as("g"), col("l_quantity").as("v"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("g"))))
    r.groupBy(col("g"))
      .agg(
        max(when(col("rn") === expr("(n * 25 + 99) div 100"), col("v"))).as("p25"),
        max(when(col("rn") === expr("(n * 50 + 99) div 100"), col("v"))).as("p50"),
        max(when(col("rn") === expr("(n * 75 + 99) div 100"), col("v"))).as("p75"),
        max(when(col("rn") === expr("(n * 95 + 99) div 100"), col("v"))).as("p95"),
        count(lit(1)).as("n_rows"))
  }

  /** Cohort retention matrix — the product-analytics staple the
    * funnel/sessionize family doesn't cover: users are grouped into
    * WEEKLY cohorts by their first-ever event, and each (cohort,
    * week-offset) cell counts the distinct users still active that
    * many weeks later. Weeks are epoch-grid buckets (epoch-micros
    * div 7 days), NOT calendar weeks — date_trunc('week') start-of-
    * week conventions differ across engines while integer grid
    * arithmetic is bit-exact. Scale shape: first-event per user is
    * one key-only partial+final min; the join back to events is on
    * the same user key (co-partitioned — one shuffle feeds both);
    * the cell count is a distinct aggregate over (cohort, offset) —
    * at 100 TB the countDistinct becomes the KMV/HLL sketch from the
    * same family ([[kmvSetOps]]) with no shape change. */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val weekUs = 7L * 86400000000L
    val e = Tables.events(spark, dir).select(col("user_id"), col("ts"))
    val first = e.groupBy("user_id").agg(min(col("ts")).as("first_ts"))
    e.join(first, "user_id")
      .select(col("user_id"),
        expr(s"unix_micros(first_ts) div $weekUs").as("cohort_week"),
        expr(s"(unix_micros(ts) div $weekUs) - (unix_micros(first_ts) div $weekUs)")
          .as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("active_users"))
  }

  /** Hourly event rollup — date_trunc to the hour grain + one
    * partial+final aggregate per (hour, type). */
  def eventsHourly(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))

  /** Incremental rollup maintenance — the pattern that keeps a 100 TB
    * aggregate table fresh WITHOUT rescanning history: partial
    * aggregates (count / decimal sum / min / max — each a commutative
    * monoid) are computed for the stored base (here: the pre-cutoff
    * slice, standing in for yesterday's persisted rollup) and the
    * incoming delta separately, then MERGED by the combine step of
    * the same monoid (counts add, sums add, min/max fold). The oracle
    * is the full recompute over all rows — gating that the partial-
    * merge algebra is exactly lossless, which is the property that
    * makes incremental maintenance sound. avg is derived from the
    * merged partials (never averaged averages). Delta and base are
    * each one partial+final aggregation; the merge is a union of
    * |event_type|-sized partials — the heavy scan is the delta only
    * in production. */
  def aggIncremental(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("2024-01-21 00:00:00").cast("timestamp")
    val e = Tables.events(spark, dir)
    def partials(df: DataFrame): DataFrame = df.groupBy("event_type").agg(
      count(lit(1)).as("pn"),
      sum(col("value").cast("decimal(30,4)")).as("ps"),
      min(col("value")).as("pmn"),
      max(col("value")).as("pmx"))
    val base = partials(e.filter(col("ts") < cutoff))
    val delta = partials(e.filter(col("ts") >= cutoff))
    base.unionAll(delta)
      .groupBy("event_type")
      .agg(sum(col("pn")).as("n"), sum(col("ps")).as("s"),
        min(col("pmn")).as("min_value"), max(col("pmx")).as("max_value"))
      .select(col("event_type"), col("n"),
        col("s").cast("double").as("sum_value"),
        (col("s").cast("double") / col("n")).as("avg_value"),
        col("min_value"), col("max_value"))
  }

  /** Time-series gap filling (resample): the dense per-hour grid a
    * feature pipeline feeds to models — every hour between each
    * event type's first and last activity appears exactly once, empty
    * hours as explicit zeros. The grid GENERATES from the per-type
    * span aggregate (explode over `sequence`) — no cross join, no
    * driver-side range loop — and the left join back to the hourly
    * counts is grid-sized (broadcastable; both sides are |types|×|hours|,
    * data-volume-free). Null-free outputs by construction (the
    * comparator rule). */
  def resampleHourly(spark: SparkSession, dir: String): DataFrame =
    resampleOf(Tables.events(spark, dir))

  /** Core of [[resampleHourly]] over any (event_type, ts, value)
    * frame — exposed for edge-case specs (single-hour spans must
    * yield exactly one grid row, `sequence(lo, lo)` = [lo]). */
  private[operators] def resampleOf(e: DataFrame): DataFrame = {
    val hour = date_trunc("hour", col("ts"))
    val counts = e.groupBy(col("event_type"), hour.as("hour"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
    val grid = e.groupBy("event_type")
      .agg(min(hour).as("lo"), max(hour).as("hi"))
      .select(col("event_type"),
        explode(expr("sequence(lo, hi, interval 1 hour)")).as("hour"))
    grid.join(counts, Seq("event_type", "hour"), "left")
      .select(col("event_type"), col("hour"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
  }

  /** 3σ outlier detection — the data-quality screen a pipeline runs
    * before training on a numeric column: flag events whose value
    * deviates more than 3σ from their type's mean. Moments come from
    * decimal-exact sums (Σv, Σv² — order-insensitive, the agg_stats
    * pattern), then mean/σ/z are single IEEE ops on identical inputs
    * in both engines, so even the DOUBLE z-scores hash-match. The
    * per-type stats are a |types|-row broadcast against the event
    * scan — one aggregation pass + one narrow filtered pass at any
    * scale. v² is computed in double THEN cast to decimal: both
    * engines round the square identically, and the decimal sum of
    * those squares is exact. */
  def anomalyZscore(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val stats = e.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      sum(col("value").cast("decimal(30,8)")).as("s"),
      sum((col("value") * col("value")).cast("decimal(30,8)")).as("s2"))
      .select(col("event_type"),
        (col("s").cast("double") / col("n")).as("mean"),
        sqrt((col("s2").cast("double") -
          col("s").cast("double") * col("s").cast("double") / col("n")) / col("n"))
          .as("sigma"))
    e.join(broadcast(stats), "event_type")
      .filter(abs(col("value") - col("mean")) > col("sigma") * 3)
      .select(col("event_id"), col("event_type"), col("value"),
        ((col("value") - col("mean")) / col("sigma")).as("z"))
  }

  /** Mean-shift changepoint per series — the time-series structural-
    * break detector beside [[anomalyZscore]]'s outlier flags: for
    * each event_type (ordered by ts, event_id), find the split that
    * maximizes |mean(before) − mean(after)|. O(n) per series via
    * windowed prefix sums (no per-candidate rescan): the cumulative
    * DECIMAL(30,4) sum gives every candidate's exact left/right
    * moments in one pass, the means are the established
    * exact-decimal-over-count double division (the `agg_incremental`
    * avg precedent — deterministic cross-engine), and the argmax
    * resolves ties to the earliest (ts, event_id). Scale shape: one
    * sort-window pass + a |types|-row totals join; the argmax is a
    * rank-1 WindowGroupLimit, never a driver scan. (CUSUM's
    * max(0, ·) recurrence is deliberately NOT this operator — it is
    * not prefix-decomposable and would force a sequential per-group
    * fold; the two-sided mean-gap statistic gives the same split on
    * level shifts and stays one relational pass.) */
  def changepointMean(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val base = Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"), col("ts"),
        col("value").cast("decimal(30,4)").as("v"))
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("s", sum(col("v")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = base.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sn"))
    val scored = base.join(broadcast(tot), "event_type")
      .filter(col("i") < col("n"))
      .withColumn("mean_before", col("s").cast("double") / col("i"))
      .withColumn("mean_after",
        (col("sn") - col("s")).cast("double") / (col("n") - col("i")))
      .withColumn("gap", abs(col("mean_before") - col("mean_after")))
    val wr = Window.partitionBy(col("event_type"))
      .orderBy(col("gap").desc, col("ts").asc, col("event_id").asc)
    scored.withColumn("rk", row_number().over(wr)).filter(col("rk") === 1)
      .select(col("event_type"), col("ts").as("split_ts"),
        col("i").as("n_before"), (col("n") - col("i")).as("n_after"),
        col("mean_before"), col("mean_after"), col("gap"))
  }

  /** Gaps-and-islands — per-user runs of CONSECUTIVE active days,
    * the classic streak/tenure primitive (billing periods, engagement
    * streaks, coverage audits). Days are epoch-grid buckets
    * (micros div 86400e6 — the [[cohortRetention]] alignment rule;
    * calendar days via date_trunc carry timezone conventions that
    * differ per engine). The island id is the textbook
    * `day − row_number()` constant-per-run trick: one distinct
    * shuffle, one per-user sort window, one partial+final aggregate.
    * Scale shape: all three stages key on user_id, so one exchange
    * feeds the window AND the group-by; per-user state is a single
    * running counter — a 10⁹-event user streams through the sort
    * spill path, never materializing in memory. */
  def gapsIslands(spark: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400000000L
    val d = Tables.events(spark, dir)
      .select(col("user_id"), expr(s"unix_micros(ts) div $dayUs").as("day"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day").asc)
    d.withColumn("island", col("day") - row_number().over(w))
      .groupBy(col("user_id"), col("island"))
      .agg(min(col("day")).as("start_day"), max(col("day")).as("end_day"),
        count(lit(1)).as("n_days"))
      .select(col("user_id"), col("start_day"), col("end_day"), col("n_days"))
  }

  /** Interval coverage merge — collapse each user's overlapping
    * activity intervals (event ts + a 30-minute span) into maximal
    * disjoint covered intervals, the sessionize dual: sessionize cuts
    * on gaps BETWEEN points, this merges EXTENTS, the primitive
    * behind uptime/SLA coverage and span-level dedup of time ranges.
    * Single-pass: a per-user sort window computes the running max of
    * interval ends over STRICTLY preceding rows; a new island starts
    * exactly where start > that max (no reachable overlap — correct
    * even when a long interval swallows several later short ones,
    * which the naive lag(end) formulation gets wrong). All arithmetic
    * is exact epoch-micros integers. Scale shape: one exchange on
    * user_id feeds the window and the aggregate; state per user is
    * one running max — same spill-safe profile as [[gapsIslands]]. */
  def intervalMerge(spark: SparkSession, dir: String): DataFrame = {
    val spanUs = 1800000000L // 30 minutes
    intervalMergeOf(
      Tables.events(spark, dir)
        .select(col("user_id"), col("event_id"),
          expr("unix_micros(ts)").as("start_us"))
        .withColumn("end_us", col("start_us") + spanUs))
  }

  /** Core of [[intervalMerge]] over any (user_id, event_id, start_us,
    * end_us) frame — VARIABLE-length intervals welcome; this is where
    * the running-max form earns its keep over naive lag(end) (with
    * the registered op's constant span the two coincide, so the
    * swallowed-interval edge case lives in EdgeCaseSpec, not the
    * fixture). */
  private[operators] def intervalMergeOf(e: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("start_us").asc, col("event_id").asc)
    e
      .withColumn("prev_max_end",
        max(col("end_us")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_island",
        when(col("prev_max_end").isNull ||
          col("start_us") > col("prev_max_end"), 1L).otherwise(0L))
      .withColumn("island", sum(col("new_island")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("island"))
      .agg(min(col("start_us")).as("start_us"), max(col("end_us")).as("end_us"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("start_us"), col("end_us"), col("n_events"))
  }

  /** Per-user coverage rollup of [[intervalMerge]] — the SLA/uptime
    * scalar the merge exists to feed ("what fraction of each user's
    * active span was actually covered"): covered = Σ island lengths,
    * span = last end − first start, coverage_q on the 2²⁰ lattice
    * (span ≥ covered > 0 by construction — every user has ≥ 1
    * half-hour island). The oracle composes the SHARED interval-merge
    * SQL verbatim ([[IntervalMergeSql]] — the ClusterCtes rule: a
    * rollup's oracle must ride its parent's replay so the two can't
    * drift). Scale shape: the merge's one user_id exchange already
    * co-locates the islands; the rollup folds in place (zero
    * additional exchanges). */
  def intervalCoverage(spark: SparkSession, dir: String): DataFrame =
    intervalMerge(spark, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_islands"),
        sum(col("end_us") - col("start_us")).as("covered_us"),
        (max(col("end_us")) - min(col("start_us"))).as("span_us"))
      .select(col("user_id"), col("n_islands"), col("covered_us"), col("span_us"),
        expr("cast((cast(covered_us as decimal(38,0)) * 1048576) div span_us as bigint)")
          .as("coverage_q"))

  /** The interval_merge DuckDB replay, shared verbatim by the
    * interval_merge gate and [[intervalCoverage]]'s rollup oracle. */
  private[operators] val IntervalMergeSql: String =
    """WITH e AS (SELECT user_id, event_id,
      |    epoch_ns(ts) // 1000 AS start_us,
      |    epoch_ns(ts) // 1000 + 1800000000 AS end_us FROM events),
      |f AS (SELECT *, max(end_us) OVER (PARTITION BY user_id
      |    ORDER BY start_us, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme FROM e),
      |g AS (SELECT *, CASE WHEN pme IS NULL OR start_us > pme
      |    THEN 1 ELSE 0 END AS ni FROM f),
      |h AS (SELECT *, sum(ni) OVER (PARTITION BY user_id
      |    ORDER BY start_us, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island FROM g)
      |SELECT user_id, min(start_us) AS start_us, max(end_us) AS end_us,
      |  CAST(count(*) AS BIGINT) AS n_events
      |FROM h GROUP BY user_id, island""".stripMargin

  /** Skyline (Pareto frontier) per part type — parts not dominated on
    * (price ↓, size ↑): keep p unless some q in the type has
    * price ≤ AND size ≥ with at least one strict. The multi-objective
    * shortlist primitive (cheapest-and-biggest candidates) that a
    * naive engine writes as a quadratic self-join. Linearithmic
    * instead: collapse to one row per (type, price) carrying the max
    * size at that exact price, then a per-type sort window takes the
    * running max size over STRICTLY cheaper prices (the per-price
    * pre-aggregate is what makes the rows-frame strict — equal prices
    * never leak into the preceding frame). p survives iff no strictly
    * cheaper price reached its size AND nothing at its own price is
    * strictly bigger; equal (price, size) twins don't dominate each
    * other and are both kept. Scale shape: one partial+final
    * aggregate, one window over the (small) distinct-price relation,
    * one shuffle join back — the quadratic NOT EXISTS exists only in
    * the DuckDB oracle, which is the point of the differential test. */
  def skylineParts(spark: SparkSession, dir: String): DataFrame =
    skylineOf(Tables.part(spark, dir)
      .select(col("p_type"), col("p_partkey"), col("p_retailprice"), col("p_size")))

  /** Core of [[skylineParts]] over any (p_type, p_partkey,
    * p_retailprice, p_size) frame — exposed for the randomized
    * dominance property. */
  private[operators] def skylineOf(p: DataFrame): DataFrame = {
    val best = p.groupBy(col("p_type"), col("p_retailprice"))
      .agg(max(col("p_size")).as("best_size"))
    val w = Window.partitionBy(col("p_type")).orderBy(col("p_retailprice").asc)
    val withPrev = best.withColumn("prev_max_size",
      max(col("best_size")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
    p.join(withPrev, Seq("p_type", "p_retailprice"))
      .filter((col("prev_max_size").isNull ||
        col("prev_max_size") < col("p_size")) &&
        col("best_size") === col("p_size"))
      .select(col("p_type"), col("p_partkey"), col("p_retailprice"), col("p_size"))
  }

  /** Trailing-7-day distinct active users per day — the rolling-
    * distinct dashboard metric (WAU on a daily grid) that resists
    * plain windows because COUNT(DISTINCT) doesn't decompose over
    * sliding frames. The scalable shape is contribution fan-out, not
    * a band join: each (day, user) activity row explodes to the ≤7
    * grid days it contributes to, then one distinct aggregate per
    * day. A range-predicate join against the day grid would plan a
    * BroadcastNestedLoopJoin (the shape [[PlanAuditSpec]] bans);
    * the explode keeps it a narrow projection + one exchange. The
    * semi join restricts output to days that actually occur (the
    * fan-out otherwise invents up-to-6 phantom trailing days past
    * each activity day). At 100 TB the 7× fan-out carries only
    * (day, user_id) pairs — 16 bytes a row — and the distinct
    * aggregate is the same partial+final HashAggregate as any
    * count-distinct; swap in the KMV sketch ([[kmvSetOps]]) when
    * exactness can be traded for a 100× smaller shuffle. */
  def rollingDistinct(spark: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400000000L
    val au = Tables.events(spark, dir)
      .select(expr(s"unix_micros(ts) div $dayUs").as("day"), col("user_id"))
      .distinct()
    val days = au.select(col("day").as("d")).distinct()
    au.withColumn("d", explode(sequence(col("day"), col("day") + 6)))
      .join(days, Seq("d"), "left_semi")
      .groupBy(col("d"))
      .agg(countDistinct(col("user_id")).as("active_users_7d"))
      .select(col("d").as("day"), col("active_users_7d"))
  }

  /** Robust outlier screen via MAD — flag events whose value sits
    * more than 3 median-absolute-deviations from their type's median.
    * The robust sibling of [[anomalyZscore]]: z-scores use moments
    * that the outliers themselves inflate (a single 10⁶× corrupt
    * value widens σ until nothing is anomalous); medians don't move,
    * so MAD keeps flagging. Two exact grouped percentiles (the
    * [[aggMedian]] cross-engine interpolation contract: identical
    * sorted multisets → identical interpolated doubles), each a
    * |types|-row broadcast back over the scan — two aggregation
    * passes + one narrow filtered pass, no sort of the full data.
    * The score division and 3×MAD comparison are single IEEE ops on
    * identical inputs, so even the DOUBLE scores hash-match. */
  def anomalyMad(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val med = e.groupBy("event_type")
      .agg(percentile(col("value"), lit(0.5)).as("med"))
    val dev = e.join(broadcast(med), "event_type")
      .withColumn("adev", abs(col("value") - col("med")))
    val mad = dev.groupBy("event_type")
      .agg(percentile(col("adev"), lit(0.5)).as("mad"))
    dev.join(broadcast(mad), "event_type")
      .filter(col("adev") > col("mad") * 3)
      .select(col("event_id"), col("event_type"), col("value"),
        (col("adev") / col("mad")).as("score"))
  }

  private[operators] val HistBuckets = 20

  /** Equi-width histogram per event type — the profiling primitive
    * behind range partitioning choices and feature binning: bucket
    * `i` covers [min + i·w, min + (i+1)·w), w = (max−min)/20, max
    * clamped into the last bucket. Two passes: a |types|-row bounds
    * aggregate broadcast back over the scan, then one partial+final
    * count — no sort, no driver histogram assembly. All bucket
    * arithmetic is single IEEE ops on identical inputs. */
  def histogramValues(spark: SparkSession, dir: String): DataFrame =
    histogramOf(Tables.events(spark, dir))

  /** Core of [[histogramValues]] over any (event_type, value) frame —
    * exposed for edge-case specs. Constant-valued groups (hi == lo)
    * would make the bucket arithmetic divide by zero (NaN, whose
    * least()/cast semantics DIVERGE across engines) — they pin to
    * bucket 0 explicitly instead. */
  private[operators] def histogramOf(e: DataFrame): DataFrame = {
    val bounds = e.groupBy("event_type").agg(
      min(col("value")).as("lo"), max(col("value")).as("hi"))
    val w = (col("hi") - col("lo")) / HistBuckets
    e.join(broadcast(bounds), "event_type")
      .select(col("event_type"), col("lo"), col("hi"),
        when(col("hi") === col("lo"), lit(0L))
          .otherwise(least(floor((col("value") - col("lo")) / w), lit(HistBuckets - 1L)))
          .cast("long").as("bucket"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n"), first(col("lo")).as("lo"), first(col("hi")).as("hi"))
      .select(col("event_type"), col("bucket"), col("n"),
        (col("lo") + col("bucket") * ((col("hi") - col("lo")) / HistBuckets)).as("bucket_lo"))
  }

  // ---- layout & skew ops -------------------------------------------

  /** Z-order (Morton) clustering key over (l_orderkey, l_partkey) —
    * the data-layout primitive behind multi-dimensional clustering
    * (Delta OPTIMIZE ZORDER, Hudi/Iceberg equivalents): sorting by
    * the interleaved-bit key makes range predicates on EITHER key
    * prune contiguous file ranges, where a lexicographic sort only
    * prunes the leading key. Pure narrow map: the classic
    * magic-number bit spread (4 shift+mask steps per dimension,
    * 16 bits each → 32-bit key), exact BIGINT ops in both engines.
    * `zbucket` = zval div 2^26 is the 64-way range-partition id a
    * writer would use: at 100 TB, `repartitionByRange(zbucket)` +
    * `sortWithinPartitions(zval)` then a partitioned write gives
    * every file a tight bounding box on both keys (the
    * shuffle_export_write pattern applied to layout). */
  def zorderCluster(spark: SparkSession, dir: String): DataFrame = {
    def spread(c: Column): Column = {
      val a = c.cast("long").bitwiseAND(lit(65535L))
      val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(16711935L))
      val d = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(252645135L))
      val e = d.bitwiseOR(shiftleft(d, 2)).bitwiseAND(lit(858993459L))
      e.bitwiseOR(shiftleft(e, 1)).bitwiseAND(lit(1431655765L))
    }
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"),
        spread(col("l_orderkey"))
          .bitwiseOR(shiftleft(spread(col("l_partkey")), 1)).as("zval"))
      .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"),
        col("zval"), expr("zval div 67108864").as("zbucket"))
  }

  private[operators] val ZorderFiles = 16

  /** The layout WRITE [[zorderCluster]] motivates: range-partition by
    * the Morton key and sort within partitions, so each of the
    * [[ZorderFiles]] output files covers a tight, non-overlapping
    * zval range — i.e. a tight bounding box on BOTH l_orderkey and
    * l_partkey, which is what lets a reader prune files on either
    * predicate. The tiebreak keys make per-file row content
    * deterministic. RangePartitioner boundaries come from sampling,
    * but the gated ROW SET is partition-independent and the
    * non-overlap invariant holds for any boundary choice (equal keys
    * are never split); LayoutSpec asserts both. */
  def writeZorderLayout(spark: SparkSession, dir: String, outDir: String): Unit =
    zorderCluster(spark, dir)
      .repartitionByRange(ZorderFiles, col("zval"))
      .sortWithinPartitions(col("zval"), col("l_orderkey"), col("l_linenumber"))
      .write.mode("overwrite").parquet(outDir)

  /** Write-then-reread gate for [[writeZorderLayout]] — same pattern
    * (and same per-JVM scratch-path hygiene, see
    * [[graft.sources.TempDirs]]) as Corpus.shuffleExportWrite:
    * the round trip (range shuffle → sorted parquet → scan) must
    * reproduce exactly the rows `zorder_cluster` computes, so the
    * oracle is shared. Eager write at construction time is inherent
    * to gating a sink. */
  def zorderWrite(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.sources.TempDirs.scratch("zorder", dir)
    writeZorderLayout(spark, dir, out)
    spark.read
      .schema("l_orderkey LONG, l_partkey LONG, l_linenumber INT, zval LONG, zbucket LONG")
      .parquet(out)
  }

  /** Dynamic-PARTITION-overwrite maintenance — the lakehouse
    * "restatement" write: events land day-partitioned; a correction
    * batch covering only the trailing 7 days is written with
    * `partitionOverwriteMode=dynamic`, so ONLY the partitions the
    * batch touches are replaced. Untouched days keep their files
    * byte-identical (LayoutSpec asserts the old partition's file
    * list and mtimes survive a re-run) — at 100 TB that is the
    * difference between rewriting a 90-day table and rewriting 7/90
    * of it, and it is why dynamic mode exists over the static
    * truncate-all default. The registered result is the re-read
    * final table state, so the oracle gates exactly the
    * keep-old ∪ replace-new union semantics. The cutoff is one
    * driver-side scalar (max day — metadata, not data; the Graph.n
    * precedent); the conf flip is scoped and restored. */
  def partitionOverwrite(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.sources.TempDirs.scratch("partoverwrite", dir)
    val tbl = s"$out/t"
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        to_date(col("ts")).as("day"))
    val done = new java.io.File(s"$out/_staged")
    if (!done.exists) {
      ev.write.mode("overwrite").partitionBy("day").parquet(tbl)
      done.createNewFile()
    }
    val cutoff = ev.agg(date_sub(max(col("day")), 6)).head().getDate(0)
    val corrections = ev.filter(col("day") >= lit(cutoff))
      .withColumn("value", col("value") * 2)
      .withColumn("event_type", concat(col("event_type"), lit("_restated")))
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.get(key, "STATIC")
    spark.conf.set(key, "dynamic")
    try corrections.write.mode("overwrite").partitionBy("day").parquet(tbl)
    finally spark.conf.set(key, prev)
    spark.read.parquet(tbl)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        col("day").cast("string").as("day"))
  }

  /** Dynamic partition pruning — the scan-elimination twin of
    * [[joinRuntimeFilter]]'s row-elimination bloom, and the feature
    * that makes partitioned lakehouse layouts pay off at 100 TB: the
    * fact table lands YEAR-partitioned (the [[partitionOverwrite]]
    * write path), the dimension side derives at RUNTIME (top-2 years
    * by returned quantity — an aggregate over lineitem, so the
    * partition filter cannot constant-fold), and Spark's DPP inserts
    * a `dynamicpruningexpression` into the fact scan's
    * PartitionFilters: 5 of 7 year-directories are never opened, not
    * merely filtered after read. PlanAuditSpec asserts the pruning
    * subquery is planned; this registered form gates the join's
    * RESULTS. The dim ranking is exact (integral quantities, ties →
    * year asc), so the oracle replays the same 2 years. */
  def joinDpp(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.sources.TempDirs.scratch("dpp", dir)
    val tbl = s"$out/orders_by_year"
    val done = new java.io.File(s"$out/_staged")
    if (!done.exists) {
      Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_totalprice"),
          year(col("o_orderdate")).as("o_year"))
        .write.mode("overwrite").partitionBy("o_year").parquet(tbl)
      done.createNewFile()
    }
    val fact = spark.read.parquet(tbl)
    val dim = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .groupBy(year(col("l_shipdate")).as("o_year"))
      .agg(sum(col("l_quantity").cast("long")).as("ret_qty"))
      .orderBy(col("ret_qty").desc, col("o_year").asc)
      .limit(2)
      .select(col("o_year"))
    fact.join(dim, "o_year")
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)")).as("sum_cents"))
      .select(col("o_year").cast("long").as("o_year"),
        col("n_orders"), col("sum_cents"))
  }

  private def joinDppSql: String =
    """WITH dim AS (
      |  SELECT y AS o_year FROM (
      |    SELECT year(l_shipdate) AS y,
      |      CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS ret_qty
      |    FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1
      |    ORDER BY ret_qty DESC, y ASC LIMIT 2) t)
      |SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |  count(*) AS n_orders,
      |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM orders JOIN dim ON year(o_orderdate) = dim.o_year
      |GROUP BY 1""".stripMargin

  /** Schema-evolution scan (`mergeSchema`) — the lakehouse reality
    * that tables GROW columns: generation 1 of the landing zone
    * (orders through 1994) was written before `o_prio` existed;
    * generation 2 (1995+) carries it. One merged read must unify the
    * schemas, backfilling NULL for the legacy files — and the gated
    * report proves the merge semantics: per year, total rows and how
    * many carry the new column (all-or-nothing per generation; a
    * mis-merge either drops the column, fails the read, or bleeds
    * values across generations, each breaking the hash). The
    * NULL-bearing column itself stays ungated (the nullable-output
    * comparator rule) — the COUNTS are the contract. Scale shape:
    * schema merge is footer metadata work (per file, not per row);
    * the report is one partial+final fold. */
  def schemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.sources.TempDirs.scratch("schemaevo", dir)
    val tbl = s"$out/t"
    val done = new java.io.File(s"$out/_staged")
    if (!done.exists) {
      val o = Tables.orders(spark, dir)
        .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"),
          expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)").as("cents"),
          col("o_orderpriority"))
      o.filter(col("o_year") <= 1994)
        .select("o_orderkey", "o_year", "cents")
        .write.mode("overwrite").parquet(s"$tbl/gen1")
      o.filter(col("o_year") >= 1995)
        .select(col("o_orderkey"), col("o_year"), col("cents"),
          col("o_orderpriority").as("o_prio"))
        .write.mode("overwrite").parquet(s"$tbl/gen2")
      done.createNewFile()
    }
    spark.read.option("mergeSchema", "true")
      .parquet(s"$tbl/gen1", s"$tbl/gen2")
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_prio").isNotNull.cast("long")).as("n_with_prio"),
        sum(col("cents")).as("sum_cents"))
      .select(col("o_year").cast("long").as("o_year"),
        col("n_orders"), col("n_with_prio"), col("sum_cents"))
  }

  private def schemaEvolutionSql: String =
    """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |  count(*) AS n_orders,
      |  CAST(sum(CASE WHEN year(o_orderdate) >= 1995 THEN 1 ELSE 0 END) AS BIGINT) AS n_with_prio,
      |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM orders GROUP BY 1""".stripMargin

  /** JSON-lines round trip — the interchange format the parquet
    * fixtures don't cover (landing zones, event buses, and vendor
    * drops still speak JSONL): events serialize to JSON text and
    * re-read under an EXPLICIT schema (inference would double-scan —
    * and at 100 TB, schema-on-read without a contract is an outage),
    * then the gated rollup proves value fidelity through the text
    * encoding — doubles survive because the writer emits
    * shortest-round-trip literals, and timestamps ride as epoch
    * micros (BIGINT) precisely because JSON timestamp FORMATS are
    * where micros silently truncate; encoding the contract in the
    * schema is the documented choice, not an accident. Scale shape:
    * write and read are narrow per-partition codec passes; the
    * report is one partial+final fold. */
  def jsonlRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.sources.TempDirs.scratch("jsonl", dir)
    val tbl = s"$out/events_jsonl"
    val done = new java.io.File(s"$out/_staged")
    if (!done.exists) {
      Tables.events(spark, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), expr("unix_micros(ts)").as("ts_us"))
        .write.mode("overwrite").json(tbl)
      done.createNewFile()
    }
    spark.read
      .schema("event_id LONG, user_id LONG, event_type STRING, value DOUBLE, ts_us LONG")
      .json(tbl)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(expr("cast(floor(value * 1000000) as bigint)")).as("sum_vq"),
        min(col("ts_us")).as("min_us"), max(col("ts_us")).as("max_us"))
  }

  private def jsonlRoundtripSql: String =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS sum_vq,
      |  CAST(min(epoch_us(ts)) AS BIGINT) AS min_us,
      |  CAST(max(epoch_us(ts)) AS BIGINT) AS max_us
      |FROM events GROUP BY 1""".stripMargin

  /** ORC round trip — the third columnar format beside parquet (the
    * fixtures) and the JSONL text path: events write as ORC and
    * re-read with a pushed-down predicate, proving the engine's
    * format surface isn't parquet-shaped by accident (ORC has its
    * own reader, predicate-pushdown path, and vectorization — at
    * 100 TB, a lakehouse inherits whatever formats its producers
    * emit). The gated rollup proves value fidelity through the
    * encode/decode; PlanAuditSpec asserts the filter reaches the ORC
    * scan as a search argument, not a post-scan filter. */
  def orcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.sources.TempDirs.scratch("orc", dir)
    val tbl = s"$out/events_orc"
    val done = new java.io.File(s"$out/_staged")
    if (!done.exists) {
      Tables.events(spark, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), expr("unix_micros(ts)").as("ts_us"))
        .write.mode("overwrite").orc(tbl)
      done.createNewFile()
    }
    spark.read.orc(tbl)
      .filter(col("event_type") =!= "view")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(expr("cast(floor(value * 1000000) as bigint)")).as("sum_vq"),
        min(col("ts_us")).as("min_us"), max(col("ts_us")).as("max_us"))
  }

  private def orcRoundtripSql: String =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS sum_vq,
      |  CAST(min(epoch_us(ts)) AS BIGINT) AS min_us,
      |  CAST(max(epoch_us(ts)) AS BIGINT) AS max_us
      |FROM events WHERE event_type <> 'view' GROUP BY 1""".stripMargin

  private val obsCounter = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Observed scan — Spark's `Dataset.observe` metrics API as a gated
    * operator: production pipelines attach row-count / checksum
    * observations to their writes and alert when a deploy changes
    * them, WITHOUT running a second aggregation pass over the data —
    * the metrics accumulate inside the existing scan's tasks. Here
    * the observation rides a noop-format write (the action that
    * materializes the metrics), and the registered row IS the
    * observed values — so the gate proves the side-channel reports
    * exactly what an explicit aggregate would (the oracle computes
    * that aggregate). The observation name is counter-unique per
    * call (re-registration of a live name is an error). */
  def observedScan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val obs = new org.apache.spark.sql.Observation(
      s"graft_obs_${obsCounter.incrementAndGet()}")
    Tables.lineitem(spark, dir)
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(expr("cast(floor(l_extendedprice * 100 + 0.5) as bigint)")).as("sum_cents"),
        max(col("l_quantity").cast("long")).as("max_qty"))
      .write.format("noop").mode("overwrite").save()
    val m = obs.get
    Seq((m("n_rows").asInstanceOf[Long], m("sum_cents").asInstanceOf[Long],
      m("max_qty").asInstanceOf[Long]))
      .toDF("n_rows", "sum_cents", "max_qty")
  }

  private def observedScanSql: String =
    """SELECT count(*) AS n_rows,
      |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents,
      |  CAST(max(CAST(l_quantity AS BIGINT)) AS BIGINT) AS max_qty
      |FROM lineitem""".stripMargin

  /** Fano factor (index of dispersion, Var/Mean) of hourly event
    * counts per type — the "is this arrival process Poisson-like,
    * clumped, or regular" scalar next to [[burstDetect]]'s WHERE
    * view: 2²⁰ ≈ Poisson, ≫ 2²⁰ = bursty/overdispersed, ≪ 2²⁰ =
    * rate-limited/regular. Kept exact with no floats: over the
    * hourly-count series c₁..cₙ, fano_q = ((n·Σc² − (Σc)²)·2²⁰) div
    * (n·Σc) — the variance inequality cleared of denominators (the
    * bollinger rule), DECIMAL(38) intermediates since Σc² passes
    * int64 at warehouse scale. Scale shape: fold to (type, hour)
    * counts first (partial+final), then a |types|-row second fold —
    * fold-below everything. */
  def fanoFactor(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 3600000000").as("hour"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"),
        sum(col("c")).as("s1"),
        sum(expr("cast(c as decimal(38,0)) * c")).as("s2"))
      .select(col("event_type"), col("n_hours"), col("s1"),
        expr("cast(((n_hours * s2 - cast(s1 as decimal(38,0)) * s1) * 1048576) div (n_hours * cast(s1 as decimal(38,0))) as bigint)")
          .as("fano_q"))

  private def fanoFactorSql: String =
    """WITH h AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hour, count(*) AS c
      |           FROM events GROUP BY 1, 2)
      |SELECT event_type, count(*) AS n_hours,
      |  CAST(sum(c) AS BIGINT) AS s1,
      |  CAST(((count(*) * sum(CAST(c AS HUGEINT) * c) - CAST(sum(c) AS HUGEINT) * sum(c)) * 1048576)
      |       // (count(*) * CAST(sum(c) AS HUGEINT)) AS BIGINT) AS fano_q
      |FROM h GROUP BY 1""".stripMargin

  private[operators] val KtYearA = 1996
  private[operators] val KtYearB = 1997

  /** Kendall rank correlation of per-nation revenue between two
    * years — "did the market's ORDER change, not just its levels":
    * τ = (C − D)/(n(n−1)/2) over all nation pairs, on the 2²⁰
    * lattice, pure integers end to end (no Pearson float sums).
    * Ranks come from the TOTAL order (revenue desc, nation asc) so
    * revenue ties cannot make the answer engine-dependent. Scale
    * shape: ONE fact-side partial+final fold to (nation, year) cents
    * — the fact table is scanned once, the folded relation persists
    * and feeds both year slices from cache; the rank windows and the
    * |nations|² pair grid sit on the ≤25-row folded relation (the
    * forecast_backtest fold-below-window class; the pair join is the
    * theilsen_trend non-equi-on-folded class). */
  def kendallTau(spark: SparkSession, dir: String): DataFrame = {
    val folded = Tables.orders(spark, dir)
      .filter(expr(s"year(cast(o_orderdate as date)) IN ($KtYearA, $KtYearB)"))
      .join(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), expr("year(cast(o_orderdate as date))").as("yr"))
      .agg(sum(expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)")).as("rev"))
      .persistScoped()
    val a = folded.filter(col("yr") === KtYearA)
      .select(col("n_name"), col("rev").as("rev_a"))
    val b = folded.filter(col("yr") === KtYearB)
      .select(col("n_name"), col("rev").as("rev_b"))
    val j = a.join(b, "n_name")
      .withColumn("ra", row_number()
        .over(Window.orderBy(col("rev_a").desc, col("n_name").asc)).cast("long"))
      .withColumn("rb", row_number()
        .over(Window.orderBy(col("rev_b").desc, col("n_name").asc)).cast("long"))
    j.as("x").join(broadcast(j.as("y")), col("x.n_name") < col("y.n_name"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when((col("x.ra") - col("y.ra")) * (col("x.rb") - col("y.rb")) > 0, 1L)
          .otherwise(0L)).as("concordant"),
        sum(when((col("x.ra") - col("y.ra")) * (col("x.rb") - col("y.rb")) < 0, 1L)
          .otherwise(0L)).as("discordant"))
      .withColumn("tau_q",
        expr("((concordant - discordant) * cast(1048576 as bigint)) div greatest(n_pairs, 1)"))
  }

  private def kendallTauSql: String =
    s"""WITH f AS (
       |  SELECT n.n_name, year(CAST(o.o_orderdate AS DATE)) AS yr,
       |    CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev
       |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
       |  JOIN nation n ON n.n_nationkey = c.c_nationkey
       |  WHERE year(CAST(o.o_orderdate AS DATE)) IN ($KtYearA, $KtYearB)
       |  GROUP BY 1, 2),
       |j AS (
       |  SELECT a.n_name,
       |    row_number() OVER (ORDER BY a.rev DESC, a.n_name ASC) AS ra,
       |    row_number() OVER (ORDER BY b.rev DESC, a.n_name ASC) AS rb
       |  FROM f a JOIN f b ON b.n_name = a.n_name AND b.yr = $KtYearB
       |  WHERE a.yr = $KtYearA)
       |SELECT count(*) AS n_pairs,
       |  CAST(sum(CASE WHEN (x.ra - y.ra) * (x.rb - y.rb) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
       |  CAST(sum(CASE WHEN (x.ra - y.ra) * (x.rb - y.rb) < 0 THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
       |  CAST(((sum(CASE WHEN (x.ra - y.ra) * (x.rb - y.rb) > 0 THEN 1 ELSE 0 END)
       |        - sum(CASE WHEN (x.ra - y.ra) * (x.rb - y.rb) < 0 THEN 1 ELSE 0 END)) * 1048576)
       |       // greatest(count(*), 1) AS BIGINT) AS tau_q
       |FROM j x JOIN j y ON x.n_name < y.n_name""".stripMargin

  /** t-closeness audit — the distributional tier above
    * [[kAnonymity]]'s group-size screen (k-anonymous and l-diverse
    * can still leak: a group whose balance DISTRIBUTION skews far
    * from the corpus's tells an adversary plenty): per QI group
    * (segment × nation), the Earth Mover's Distance between the
    * group's ordered sensitive-bucket distribution and the corpus's,
    * EMD = (1/(m−1))·Σⱼ|Σ_{b≤j}(P(b) − Q(b))| for ordered domains.
    * Exact rationals with denominators cleared (the bollinger rule):
    * cum numerator Σ(c_gb·N − C_b·n_g) over denominator n_g·N, final
    * emd_q = (Σ|cum|·2²⁰) div ((m−1)·n_g·N) in DECIMAL(38)
    * intermediates (c·N passes 2⁶³ at warehouse scale). A group
    * fails at the classic t = 0.2 cut. Scale shape: ONE
    * partial+final fold of the dim table to (group, bucket) counts
    * persists and derives everything else; the dense group×bucket
    * grid (zero-count buckets still accumulate −Q) is metadata-
    * scale, built by broadcasting the |buckets|-row corpus relation
    * on a constant key; the cum rides a keyed window. */
  def tCloseness(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.customer(spark, dir)
      .select(col("c_mktsegment").as("segment"),
        col("c_nationkey").cast("long").as("nation"),
        expr("floor(c_acctbal * 100 + 0.5) div 100000").as("bucket"))
      .groupBy(col("segment"), col("nation"), col("bucket"))
      .agg(count(lit(1)).as("cgb"))
      .persistScoped()
    val corpus = base.groupBy(col("bucket")).agg(sum(col("cgb")).as("cb"))
    val groups = base.groupBy(col("segment"), col("nation"))
      .agg(sum(col("cgb")).as("n_g"))
    // two scalar aggregates to the driver (metadata — the
    // quantile_normalize / pagerank-N precedent): corpus size and
    // the bucket-domain width
    val nmRow = corpus.agg(sum(col("cb")).as("n"), count(lit(1)).as("m")).head()
    val (nTotal, m) =
      if (nmRow.isNullAt(0)) (0L, 0L) else (nmRow.getLong(0), nmRow.getLong(1))
    val w = Window.partitionBy(col("segment"), col("nation"))
      .orderBy(col("bucket").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    groups.withColumn("one", lit(1))
      .join(broadcast(corpus.withColumn("one", lit(1))), "one")
      .join(base, Seq("segment", "nation", "bucket"), "left")
      .select(col("segment"), col("nation"), col("bucket"), col("n_g"),
        (coalesce(col("cgb"), lit(0L)).cast("decimal(38,0)") * lit(nTotal) -
          col("cb").cast("decimal(38,0)") * col("n_g")).as("dnum"))
      .withColumn("cum", sum(col("dnum")).over(w))
      .groupBy(col("segment"), col("nation"))
      .agg(max(col("n_g")).as("n_g"), sum(abs(col("cum"))).as("emd_num"))
      .select(col("segment"), col("nation"), col("n_g"),
        expr(s"cast((emd_num * 1048576) div (cast(${math.max(m - 1, 1)} as decimal(38,0)) " +
          s"* n_g * ${math.max(nTotal, 1)}) as bigint)").as("emd_q"))
      .withColumn("t_fail", (col("emd_q") > lit(209715L)).cast("long"))
  }

  private def tClosenessSql: String =
    s"""WITH base AS (
       |  SELECT c_mktsegment AS segment, CAST(c_nationkey AS BIGINT) AS nation,
       |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) // 100000 AS bucket,
       |    count(*) AS cgb
       |  FROM customer GROUP BY 1, 2, 3),
       |corpus AS (SELECT bucket, CAST(sum(cgb) AS BIGINT) AS cb FROM base GROUP BY 1),
       |nm AS MATERIALIZED (SELECT CAST(sum(cb) AS BIGINT) AS n, count(*) AS m FROM corpus),
       |groups AS (SELECT segment, nation, CAST(sum(cgb) AS BIGINT) AS n_g
       |           FROM base GROUP BY 1, 2),
       |grid AS (
       |  SELECT g.segment, g.nation, g.n_g, c.bucket,
       |    CAST(coalesce(b.cgb, 0) AS HUGEINT) * nm.n
       |      - CAST(c.cb AS HUGEINT) * g.n_g AS dnum
       |  FROM groups g CROSS JOIN corpus c CROSS JOIN nm
       |  LEFT JOIN base b ON b.segment = g.segment AND b.nation = g.nation
       |                  AND b.bucket = c.bucket),
       |cums AS (
       |  SELECT segment, nation, n_g, bucket,
       |    sum(dnum) OVER (PARTITION BY segment, nation ORDER BY bucket ASC
       |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM grid)
       |SELECT segment, nation, n_g,
       |  CAST((sum(abs(cum)) * 1048576)
       |       // (greatest(nm.m - 1, 1) * n_g * greatest(nm.n, 1)) AS BIGINT) AS emd_q,
       |  CAST(CASE WHEN (sum(abs(cum)) * 1048576)
       |       // (greatest(nm.m - 1, 1) * n_g * greatest(nm.n, 1)) > 209715
       |       THEN 1 ELSE 0 END AS BIGINT) AS t_fail
       |FROM cums CROSS JOIN nm GROUP BY segment, nation, n_g, nm.m, nm.n""".stripMargin

  /** Order-insensitive table fingerprint — the cheap "did anything
    * change" screen a 100 TB table-diff runs BEFORE `snapshot_diff`'s
    * row-level pass: each row canonicalizes to integral fields only
    * (keys, cent/quantity lattices, day numbers — float formatting
    * never enters the string, the cross-engine trap), hashes to a
    * 60-bit slice of its md5, and the hashes SUM per l_returnflag —
    * addition commutes, so the fingerprint is independent of row
    * order, partitioning, and parallelism, and two tables compare by
    * |flags| rows instead of a distributed sort-merge. DECIMAL(38)
    * accumulation (2⁶⁰ per row passes 2⁶³ within 8 rows), published
    * mod 2⁶¹ on the BIGINT lattice. Scale shape: one partial+final
    * fold over the scan — no shuffle beyond the |flags|-row final. */
  def tableFingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"),
        expr("""conv(substring(md5(concat_ws('|',
            cast(l_orderkey as string), cast(l_linenumber as string),
            cast(l_partkey as string), cast(l_suppkey as string),
            cast(cast(l_quantity as bigint) as string),
            cast(cast(floor(l_extendedprice * 100 + 0.5) as bigint) as string),
            l_returnflag, l_linestatus,
            cast(datediff(cast(l_shipdate as date), date'1970-01-01') as string))), 1, 15), 16, 10)""")
          .cast("decimal(38,0)").as("h"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        expr("cast(sum(h) % 2305843009213693952 as bigint)").as("fingerprint"))

  private def tableFingerprintSql: String =
    """SELECT l_returnflag, count(*) AS n_rows,
      |  CAST(sum(CAST(('0x' || substr(md5(concat_ws('|',
      |      CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR),
      |      CAST(l_partkey AS VARCHAR), CAST(l_suppkey AS VARCHAR),
      |      CAST(CAST(l_quantity AS BIGINT) AS VARCHAR),
      |      CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS VARCHAR),
      |      l_returnflag, l_linestatus,
      |      CAST(date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS VARCHAR))), 1, 15)) AS BIGINT))
      |      % 2305843009213693952 AS BIGINT) AS fingerprint
      |FROM lineitem GROUP BY 1""".stripMargin

  /** Rank-based ROC AUC over a histogram — the binary-classifier eval
    * a labeling/filter pipeline reports ("does the score actually
    * separate the classes?"), computed the only way that scales:
    * scores quantize to a FIXED 4096-bucket lattice on the scan
    * (least(cents div 16384, 4095) — resolution is a constant of the
    * operator, not of the data), one partial+final fold yields the
    * (bucket, n_pos, n_neg) histogram, and the Mann-Whitney pair
    * count reads off it: concordant = Σ_b n_pos(b)·cum_neg(<b), ties
    * = Σ_b n_pos(b)·n_neg(b), auc_q = (2·conc + ties)·2²⁰ div
    * (2·P·N). A global rank over raw scores (the textbook AUC) would
    * be a full sort of the fact table; the bucketed form is exact ON
    * ITS OWN DOCUMENTED LATTICE and folds to 4096 rows before the
    * one single-partition cumulative window (the fold-below-window
    * class). DECIMAL(38) pair products (P·N passes 2⁶³ beyond ~3e9
    * rows per class). Label: urgent/high order priority; score:
    * order value in cents. */
  def aucRank(spark: SparkSession, dir: String): DataFrame = {
    val b = Tables.orders(spark, dir)
      .select(
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L).as("pos"),
        expr("least(cast(floor(o_totalprice * 100 + 0.5) as bigint) div 16384, 4095)")
          .as("bucket"))
      .groupBy(col("bucket"))
      .agg(sum(col("pos")).as("n_pos"), sum(lit(1L) - col("pos")).as("n_neg"))
    val w = Window.orderBy(col("bucket").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    b.withColumn("cum_neg", coalesce(sum(col("n_neg")).over(w), lit(0L)))
      .agg(
        sum(col("n_pos")).as("p"),
        sum(col("n_neg")).as("nn"),
        sum(col("n_pos").cast(DecimalType(38, 0)) *
          (col("cum_neg").cast(DecimalType(38, 0)) * 2 + col("n_neg"))).as("num"))
      .select(col("p").as("n_pos"), col("nn").as("n_neg"),
        expr("cast((num * 1048576) div (2 * cast(greatest(p, 1) as decimal(38,0)) " +
          "* greatest(nn, 1)) as bigint)").as("auc_q"))
  }

  private def aucRankSql: String =
    """WITH b AS (
      |  SELECT least(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) // 16384, 4095) AS bucket,
      |    sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS n_pos,
      |    sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS n_neg
      |  FROM orders GROUP BY 1),
      |c AS (
      |  SELECT n_pos, n_neg,
      |    coalesce(sum(n_neg) OVER (ORDER BY bucket ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_neg
      |  FROM b)
      |SELECT CAST(sum(n_pos) AS BIGINT) AS n_pos,
      |  CAST(sum(n_neg) AS BIGINT) AS n_neg,
      |  CAST((sum(CAST(n_pos AS HUGEINT) * (cum_neg * 2 + n_neg)) * 1048576)
      |       // (2 * greatest(sum(n_pos), 1) * greatest(sum(n_neg), 1)) AS BIGINT) AS auc_q
      |FROM c""".stripMargin

  /** Chi-square independence test — segment × order-priority: "does
    * purchase urgency depend on customer segment?", the categorical
    * companion to [[ksTest]]'s distributional two-sample screen.
    * Identity χ² = N·(Σ_cells O²/(R·C) − 1) keeps every intermediate
    * inside DECIMAL(38) at warehouse scale (the textbook
    * Σ(O·N−R·C)²/… squares an N²-sized residual — overflow by 10⁶ at
    * 10¹¹ rows; O²·2⁴⁰ stays under 10³⁸ to ~10¹² rows per cell):
    * per-cell term_q = (O²·2⁴⁰) div (R·C) with truncating division,
    * chi2_q = greatest(N·(Σterm − 2⁴⁰) div 2²⁰, 0) — the clamp
    * absorbs the ≤|cells| ulps truncation can shave below the
    * Cauchy-Schwarz floor. Scale shape: ONE partial+final fold of
    * the join to |segments|·|priorities| cells persists and derives
    * margins and the dense grid (zero cells still enter — absent
    * combinations are evidence OF dependence) via the constant-key
    * broadcast the t_closeness grid uses; N and the df scalars are
    * driver metadata. */
  private def chi2Full(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"),
        col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("o"))
      .persistScoped()
    val t = cells.agg(sum(col("o")).as("n"),
      countDistinct(col("segment")).as("rs"),
      countDistinct(col("priority")).as("cs")).head()
    // degenerate corpus (no orders): the fold is empty — mirror the
    // oracle's empty result instead of NPE-ing on the scalar fetch
    if (t.isNullAt(0))
      return cells.select(col("o").as("n"), col("o").as("rs"),
        col("o").as("cs"), col("o").as("chi2_q")).limit(0)
    val (nTot, rs, cs) = (t.getLong(0), t.getLong(1), t.getLong(2))
    val rowsM = cells.groupBy(col("segment")).agg(sum(col("o")).as("r"))
    val colsM = cells.groupBy(col("priority")).agg(sum(col("o")).as("c"))
    rowsM.withColumn("one", lit(1))
      .join(broadcast(colsM.withColumn("one", lit(1))), "one")
      .join(cells, Seq("segment", "priority"), "left")
      .select(col("r"), col("c"), coalesce(col("o"), lit(0L)).as("o"))
      .select(expr("(cast(o as decimal(38,0)) * o * 1099511627776) div " +
        "(cast(r as decimal(38,0)) * c)").as("term_q"))
      .agg(sum(col("term_q")).as("sum_term"))
      .select(
        lit(nTot).as("n"), lit(rs).as("rs"), lit(cs).as("cs"),
        expr(s"cast(greatest((cast($nTot as decimal(38,0)) * " +
          "(sum_term - 1099511627776)) div 1048576, 0) as bigint)").as("chi2_q"))
  }

  /** Chi-square independence test (segment × order-priority) — the
    * categorical dependence screen; projects [[chi2Full]]'s shared
    * core (see its doc for the overflow-safe χ² identity), emitting
    * (n, df, chi2_q) on the 2²⁰ lattice. [[cramersV]] projects the
    * SAME core into an effect size, so test and effect cannot
    * drift. */
  def chi2Independence(spark: SparkSession, dir: String): DataFrame =
    chi2Full(spark, dir)
      .select(col("n"),
        expr("greatest(rs - 1, 0L) * greatest(cs - 1, 0L)").as("df"),
        col("chi2_q"))

  /** Cramér's V effect size over the SAME contingency fold as
    * [[chi2Independence]] (they share [[chi2Full]], so the statistic
    * and its effect size cannot drift): at warehouse N every χ² test
    * rejects — the significance scalar saturates and the EFFECT SIZE
    * V² = χ²/(N·min(r−1, c−1)) is what a data-quality monitor must
    * threshold on instead. Emitted as v2_q on the 2²⁰ lattice
    * (v2_q = chi2_q div (N·k), computed FROM the already-truncated
    * chi2_q in both engines so the truncation order is part of the
    * contract; V itself is a square root — irrational, stays out),
    * with Cohen-1988 effect buckets on exact integer comparisons
    * (w = 0.1/0.3/0.5 ⇒ V² = 0.01/0.09/0.25, the df*=1 convention,
    * documented simplification): v2_q·100 < 2²⁰ → negligible,
    * v2_q·100 < 9·2²⁰ → small, v2_q·4 < 2²⁰ → medium, else large. */
  def cramersV(spark: SparkSession, dir: String): DataFrame =
    chi2Full(spark, dir)
      .select(col("n"),
        expr("greatest(rs - 1, 0L) * greatest(cs - 1, 0L)").as("df"),
        expr("greatest(least(rs - 1, cs - 1), 1L)").as("k"),
        col("chi2_q"),
        expr("chi2_q div (n * greatest(least(rs - 1, cs - 1), 1L))").as("v2_q"))
      .withColumn("effect",
        when(col("v2_q") * 100L < 1048576L, "negligible")
          .when(col("v2_q") * 100L < 9L * 1048576L, "small")
          .when(col("v2_q") * 4L < 1048576L, "medium")
          .otherwise("large"))

  /** Shared χ² CTE chain ending in `chi2f(n, rs, cs, chi2_q)` — the
    * [[chi2Independence]]/[[cramersV]] oracles both project it. */
  private def chi2Ctes: String =
    """cells AS (
      |  SELECT c_mktsegment AS segment, o_orderpriority AS priority,
      |    count(*) AS o
      |  FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2),
      |t AS MATERIALIZED (
      |  SELECT CAST(sum(o) AS BIGINT) AS n,
      |    count(DISTINCT segment) AS rs, count(DISTINCT priority) AS cs
      |  FROM cells),
      |rm AS (SELECT segment, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY 1),
      |cm AS (SELECT priority, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY 1),
      |grid AS (
      |  SELECT rm.r, cm.c, coalesce(cells.o, 0) AS o
      |  FROM rm CROSS JOIN cm
      |  LEFT JOIN cells ON cells.segment = rm.segment AND cells.priority = cm.priority),
      |terms AS (
      |  SELECT (CAST(o AS HUGEINT) * o * 1099511627776)
      |         // (CAST(r AS HUGEINT) * c) AS term_q
      |  FROM grid),
      |chi2f AS (
      |  SELECT t.n, t.rs, t.cs,
      |    CAST(greatest((CAST(t.n AS HUGEINT) * (sum(term_q) - 1099511627776))
      |         // 1048576, 0) AS BIGINT) AS chi2_q
      |  FROM terms CROSS JOIN t
      |  GROUP BY t.n, t.rs, t.cs)""".stripMargin

  private def chi2IndependenceSql: String =
    s"""WITH $chi2Ctes
       |SELECT n, CAST(greatest(rs - 1, 0) * greatest(cs - 1, 0) AS BIGINT) AS df,
       |  chi2_q
       |FROM chi2f""".stripMargin

  private def cramersVSql: String =
    s"""WITH $chi2Ctes
       |SELECT n, CAST(greatest(rs - 1, 0) * greatest(cs - 1, 0) AS BIGINT) AS df,
       |  CAST(greatest(least(rs - 1, cs - 1), 1) AS BIGINT) AS k, chi2_q,
       |  CAST(chi2_q // (n * greatest(least(rs - 1, cs - 1), 1)) AS BIGINT) AS v2_q,
       |  CASE WHEN chi2_q // (n * greatest(least(rs - 1, cs - 1), 1)) * 100 < 1048576
       |         THEN 'negligible'
       |       WHEN chi2_q // (n * greatest(least(rs - 1, cs - 1), 1)) * 100 < 9437184
       |         THEN 'small'
       |       WHEN chi2_q // (n * greatest(least(rs - 1, cs - 1), 1)) * 4 < 1048576
       |         THEN 'medium'
       |       ELSE 'large' END AS effect
       |FROM chi2f""".stripMargin

  /** Wald-Wolfowitz runs test — "is daily revenue a random sequence
    * around its median, or does it trend/cluster?": the
    * non-parametric randomness screen behind SPC trend rules.
    * Daily order cents fold once to |days| rows; the LOWER MEDIAN is
    * picked under the total order (cents asc, day asc) so both
    * engines select the identical pivot; equal-to-median days drop
    * (the classic treatment — a tie is neither above nor below);
    * runs count via one lag over the day order. The z test keeps
    * exact integers by clearing every denominator: with
    * D = m·(R−1) − 2·n1·n2 (m·(R − E[R])) the 5% two-sided cut
    * (R−E)² > z²·Var becomes D²·(m−1)·10⁴ > 38416·2n1n2·(2n1n2−m)
    * (z² = 3.8416 exactly as 38416/10⁴) — DECIMAL(38) products (D²
    * alone passes 2⁶³ at |days|≈2500). Scale shape: one
    * partial+final fold, then every window/scalar sits on the
    * |days|-bounded relation (fold-below-window class); the median
    * pivot is a driver scalar on that metadata-sized fold. */
  def runsTest(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .select(
        expr("cast(datediff(cast(o_orderdate as date), date'1970-01-01') as bigint)").as("day"),
        expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)").as("cents"))
      .groupBy(col("day")).agg(sum(col("cents")).as("rev"))
      .persistScoped()
    val n = daily.count()
    if (n == 0L)
      return daily.select(col("rev").as("n"), col("rev").as("n1"),
        col("rev").as("n2"), col("rev").as("runs"),
        col("rev").as("reject_05")).limit(0)
    val wMed = Window.orderBy(col("rev").asc, col("day").asc)
    val med = daily.withColumn("rn", row_number().over(wMed))
      .filter(col("rn") === lit(((n + 1) / 2).toInt))
      .select(col("rev")).head().getLong(0)
    val wDay = Window.orderBy(col("day").asc)
    daily.filter(col("rev") =!= med)
      .select(col("day"), (col("rev") > med).cast("long").as("s"))
      .withColumn("prev", lag(col("s"), 1).over(wDay))
      .agg(
        count(lit(1)).as("m"),
        sum(col("s")).as("n1"),
        sum(when(col("prev").isNull || col("prev") =!= col("s"), 1L)
          .otherwise(0L)).as("runs"))
      .select(col("m").as("n"), col("n1"), (col("m") - col("n1")).as("n2"),
        col("runs"),
        expr("""cast(case when m < 2 then 0
          | when (cast(m as decimal(38,0)) * (runs - 1) - 2 * cast(n1 as decimal(38,0)) * (m - n1))
          |      * (cast(m as decimal(38,0)) * (runs - 1) - 2 * cast(n1 as decimal(38,0)) * (m - n1))
          |      * (m - 1) * 10000
          |      > 38416 * 2 * cast(n1 as decimal(38,0)) * (m - n1)
          |        * (2 * cast(n1 as decimal(38,0)) * (m - n1) - m)
          | then 1 else 0 end as bigint)""".stripMargin).as("reject_05"))
  }

  private def runsTestSql: String =
    """WITH daily AS (
      |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
      |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev
      |  FROM orders GROUP BY 1),
      |nn AS (SELECT count(*) AS n FROM daily),
      |med AS (
      |  SELECT rev AS med FROM (
      |    SELECT rev, row_number() OVER (ORDER BY rev ASC, day ASC) AS rn FROM daily) r
      |  CROSS JOIN nn WHERE r.rn = (nn.n + 1) // 2),
      |signs AS (
      |  SELECT day, CASE WHEN rev > med THEN 1 ELSE 0 END AS s
      |  FROM daily CROSS JOIN med WHERE rev <> med),
      |lagged AS (
      |  SELECT s, lag(s, 1) OVER (ORDER BY day ASC) AS prev FROM signs),
      |agg AS (
      |  SELECT count(*) AS m, CAST(sum(s) AS BIGINT) AS n1,
      |    CAST(sum(CASE WHEN prev IS NULL OR prev <> s THEN 1 ELSE 0 END) AS BIGINT) AS runs
      |  FROM lagged)
      |SELECT m AS n, n1, m - n1 AS n2, runs,
      |  CAST(CASE WHEN m < 2 THEN 0
      |    WHEN (CAST(m AS HUGEINT) * (runs - 1) - 2 * CAST(n1 AS HUGEINT) * (m - n1))
      |         * (CAST(m AS HUGEINT) * (runs - 1) - 2 * CAST(n1 AS HUGEINT) * (m - n1))
      |         * (m - 1) * 10000
      |         > 38416 * 2 * CAST(n1 AS HUGEINT) * (m - n1)
      |           * (2 * CAST(n1 AS HUGEINT) * (m - n1) - m)
      |    THEN 1 ELSE 0 END AS BIGINT) AS reject_05
      |FROM agg""".stripMargin

  /** Header-vs-lines ledger reconciliation — the two-ledger integrity
    * audit every finance/billing pipeline runs before closing a
    * period ("does each order header total equal the sum of its
    * lines?"), and the CROSS-TABLE tier above [[graft.operators.DataQuality]]'s
    * intra-row rules: per order, header cents vs the summed per-line
    * charge cents (extendedprice·(1−discount)·(1+tax), the TPC-H
    * total-price identity), bucketed exact / within-$1 tolerance /
    * mismatch / no_lines (headers whose lines are missing entirely —
    * the left join keeps them, an inner join would silently pass
    * them). Identical cent lattice and factor order on both engines
    * (left-assoc IEEE double product, then floor(x·100+0.5) — the
    * tableFingerprint rule). Scale shape: ONE partial+final fold of
    * lineitem to |orders| rows, one equi-join on the order key, one
    * |status|-row final fold — no window, no broadcast needed beyond
    * AQE's own choices. */
  def ledgerRecon(spark: SparkSession, dir: String): DataFrame = {
    val lines = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("okey"),
        expr("cast(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100 + 0.5) as bigint)")
          .as("lc"))
      .groupBy(col("okey"))
      .agg(sum(col("lc")).as("line_cents"), count(lit(1)).as("n_lines"))
    Tables.orders(spark, dir)
      .select(col("o_orderkey").as("okey"),
        expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)").as("hdr_cents"))
      .join(lines, Seq("okey"), "left")
      .select(col("okey"), col("hdr_cents"),
        coalesce(col("line_cents"), lit(0L)).as("line_cents"),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"))
      .withColumn("delta", col("hdr_cents") - col("line_cents"))
      .withColumn("status",
        when(col("n_lines") === 0L, "no_lines")
          .when(col("delta") === 0L, "exact")
          .when(abs(col("delta")) <= 100L, "tolerance")
          .otherwise("mismatch"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_orders"),
        sum(abs(col("delta"))).as("abs_delta_cents"),
        max(abs(col("delta"))).as("max_abs_delta"))
  }

  private def ledgerReconSql: String =
    """WITH lines AS (
      |  SELECT l_orderkey AS okey,
      |    CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS line_cents,
      |    count(*) AS n_lines
      |  FROM lineitem GROUP BY 1),
      |j AS (
      |  SELECT o_orderkey AS okey,
      |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS hdr_cents,
      |    coalesce(line_cents, 0) AS line_cents,
      |    coalesce(n_lines, 0) AS n_lines
      |  FROM orders LEFT JOIN lines ON o_orderkey = lines.okey),
      |d AS (
      |  SELECT hdr_cents - line_cents AS delta,
      |    CASE WHEN n_lines = 0 THEN 'no_lines'
      |         WHEN hdr_cents - line_cents = 0 THEN 'exact'
      |         WHEN abs(hdr_cents - line_cents) <= 100 THEN 'tolerance'
      |         ELSE 'mismatch' END AS status
      |  FROM j)
      |SELECT status, count(*) AS n_orders,
      |  CAST(sum(abs(delta)) AS BIGINT) AS abs_delta_cents,
      |  CAST(max(abs(delta)) AS BIGINT) AS max_abs_delta
      |FROM d GROUP BY 1""".stripMargin

  /** U-shaped (position-based) multi-touch attribution — the 40/20/40
    * credit model marketing analytics runs beside first/last-touch
    * (which [[graft.operators.StreamOps]]' view→click attribution
    * covers): each user's pre-conversion touch journey (views+clicks
    * before their FIRST purchase, ordered by the (ts, event_id) total
    * order) splits one conversion credit on the 2²⁰ lattice — 40% to
    * first and last touch, the middle 20% divided evenly among
    * interior touches with the truncation dust pinned to the LAST
    * interior touch, so per-user credit sums to exactly 2²⁰ (the
    * abc_class share rule: dust placement is part of the contract,
    * executed in EdgeCaseSpec). Degenerate journeys: 1 touch → full
    * credit, 2 touches → an even split. Scale shape: one |users|-row
    * conversion fold, one equi-join, two windows on the SAME
    * (user_id) key and sort — a single keyed exchange — then a
    * |event_types|-row final fold. */
  def attributionPosition(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val firstPurchase = e.filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(min(col("ts")).as("pt"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val wAll = Window.partitionBy(col("user_id"))
    e.filter(col("event_type").isin("view", "click"))
      .join(firstPurchase, Seq("user_id"))
      .filter(col("ts") < col("pt"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("credit_q",
        when(col("n") === 1L, lit(1048576L))
          .when(col("n") === 2L, lit(524288L))
          .when(col("rn") === 1L || col("rn") === col("n"), lit(419430L))
          .otherwise(expr(
            "209716 div (n - 2) + case when rn = n - 1 then 209716 % (n - 2) else 0 end")))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_touches"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("credit_q")).as("credit_sum_q"))
  }

  private def attributionPositionSql: String =
    """WITH fp AS (
      |  SELECT user_id, min(ts) AS pt FROM events
      |  WHERE event_type = 'purchase' GROUP BY 1),
      |t AS (
      |  SELECT e.user_id, e.event_type, e.ts, e.event_id
      |  FROM events e JOIN fp ON e.user_id = fp.user_id
      |  WHERE e.event_type IN ('view', 'click') AND e.ts < fp.pt),
      |r AS (
      |  SELECT user_id, event_type,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rn,
      |    count(*) OVER (PARTITION BY user_id) AS n
      |  FROM t),
      |c AS (
      |  SELECT user_id, event_type,
      |    CASE WHEN n = 1 THEN 1048576
      |         WHEN n = 2 THEN 524288
      |         WHEN rn = 1 OR rn = n THEN 419430
      |         ELSE 209716 // (n - 2)
      |              + CASE WHEN rn = n - 1 THEN 209716 % (n - 2) ELSE 0 END
      |    END AS credit_q
      |  FROM r)
      |SELECT event_type, count(*) AS n_touches,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
      |  CAST(sum(credit_q) AS BIGINT) AS credit_sum_q
      |FROM c GROUP BY 1""".stripMargin

  /** Laspeyres price index by ship year — the OLAP-econometrics
    * rollup ("how much did our basket's price level move, holding
    * the basket fixed?") a pricing team tracks per period: per
    * (part, year) the exact unit-price lattice p_q = Σcents div Σqty,
    * base-1995 quantities weight every year's prices, index_q =
    * (Σ p_t·q0)·2²⁰ div (Σ p0·q0) over parts traded in BOTH years
    * (the common-basket rule — a part absent from year t simply
    * leaves the basket, matching the classic matched-model index).
    * The base year indexes to EXACTLY 2²⁰ (numerator ≡ denominator —
    * executed in spec). DECIMAL(38) basket sums (p·q products pass
    * 2⁶³ at warehouse scale). Scale shape: ONE partial+final fold of
    * lineitem to |parts|·|years| rows, a self-join on the part key
    * against the |parts|-row base slice, and a |years|-row final
    * fold. */
  def priceIndex(spark: SparkSession, dir: String): DataFrame = {
    val py = Tables.lineitem(spark, dir)
      .select(col("l_partkey").as("pk"),
        expr("cast(year(cast(l_shipdate as date)) as bigint)").as("yr"),
        expr("cast(floor(l_extendedprice * 100 + 0.5) as bigint)").as("cents"),
        expr("cast(l_quantity as bigint)").as("qty"))
      .groupBy(col("pk"), col("yr"))
      .agg(sum(col("cents")).as("sc"), sum(col("qty")).as("sq"))
      .select(col("pk"), col("yr"), col("sq"),
        expr("sc div greatest(sq, 1)").as("p_q"))
      .persistScoped()
    val base = py.filter(col("yr") === 1995L)
      .select(col("pk"), col("sq").as("q0"), col("p_q").as("p0"))
    py.join(base, Seq("pk"))
      .groupBy(col("yr"))
      .agg(count(lit(1)).as("n_parts"),
        sum(col("p_q").cast(DecimalType(38, 0)) * col("q0")).as("num"),
        sum(col("p0").cast(DecimalType(38, 0)) * col("q0")).as("den"))
      .select(col("yr").as("year"), col("n_parts"),
        expr("cast((num * 1048576) div greatest(den, 1) as bigint)").as("laspeyres_q"))
  }

  private def priceIndexSql: String =
    """WITH py AS (
      |  SELECT l_partkey AS pk, CAST(year(CAST(l_shipdate AS DATE)) AS BIGINT) AS yr,
      |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sc,
      |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq
      |  FROM lineitem GROUP BY 1, 2),
      |p AS (SELECT pk, yr, sq, sc // greatest(sq, 1) AS p_q FROM py),
      |base AS (SELECT pk, sq AS q0, p_q AS p0 FROM p WHERE yr = 1995)
      |SELECT p.yr AS year, count(*) AS n_parts,
      |  CAST((sum(CAST(p.p_q AS HUGEINT) * base.q0) * 1048576)
      |       // greatest(sum(CAST(base.p0 AS HUGEINT) * base.q0), 1) AS BIGINT) AS laspeyres_q
      |FROM p JOIN base ON p.pk = base.pk
      |GROUP BY p.yr""".stripMargin

  /** Brand-loyalty distribution — the retail-analytics rollup
    * ("how concentrated is each customer's brand spend, and how does
    * that concentration distribute over the base?") behind retention
    * and private-label strategy: per customer the TOP brand's share
    * of their line count on the 2²⁰ lattice (ties break (count desc,
    * brand asc) — the label_prop rule), bucketed into ten loyalty
    * deciles (width 104858 = ⌈2²⁰/10⌉, so a perfect 2²⁰ share lands
    * in decile 9). Scale shape: the 3-way fact join folds ONCE to
    * (customer, brand) counts; the rank, total, and brand-count
    * windows all ride the SAME (cust) exchange; the decile rollup is
    * a |10|-row final fold. */
  def brandLoyalty(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("cust")).orderBy(col("n").desc, col("brand").asc)
    val wc = Window.partitionBy(col("cust"))
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .groupBy(col("o_custkey").as("cust"), col("p_brand").as("brand"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(w))
      .withColumn("tot", sum(col("n")).over(wc))
      .withColumn("nb", count(lit(1)).over(wc))
      .filter(col("rn") === 1)
      .select(col("cust"), col("nb").as("n_brands"),
        expr("(n * cast(1048576 as bigint)) div tot").as("top_share_q"))
      .groupBy(expr("top_share_q div 104858").as("decile"))
      .agg(count(lit(1)).as("n_customers"), sum(col("n_brands")).as("sum_brands"))
  }

  private def brandLoyaltySql: String =
    """WITH cb AS (
      |  SELECT o_custkey AS cust, p_brand AS brand, count(*) AS n
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN part ON l_partkey = p_partkey
      |  GROUP BY 1, 2),
      |r AS (
      |  SELECT cust, n,
      |    row_number() OVER (PARTITION BY cust ORDER BY n DESC, brand ASC) AS rn,
      |    sum(n) OVER (PARTITION BY cust) AS tot,
      |    count(*) OVER (PARTITION BY cust) AS nb
      |  FROM cb),
      |top AS (
      |  SELECT cust, nb AS n_brands,
      |    (n * CAST(1048576 AS BIGINT)) // tot AS top_share_q
      |  FROM r WHERE rn = 1)
      |SELECT CAST(top_share_q // 104858 AS BIGINT) AS decile, count(*) AS n_customers,
      |  CAST(sum(n_brands) AS BIGINT) AS sum_brands
      |FROM top GROUP BY 1""".stripMargin

  /** Trailing-7-day modal event type per day — the windowed MODE the
    * window family lacks (window_median covers ordered medians;
    * categorical mode needs a count-then-rank, not a frame): for
    * each active day, the most frequent event type over [day−6, day]
    * with the (count desc, type asc) tie rule. The trailing window
    * is EXPLODED FORWARD (each (day, type, n) fold row contributes
    * to days day..day+6 via `sequence`), turning the range join a
    * naive rolling mode would need into an EQUI join + second fold —
    * shuffle keys only, 7× fan-out of a |days|·|types| folded
    * relation (metadata-scale at any corpus size). Days with no own
    * events don't report (semi-join to the active-day set). */
  def rollingMode(spark: SparkSession, dir: String): DataFrame = {
    val f = Tables.events(spark, dir)
      .select(expr("cast(datediff(cast(ts as date), date'1970-01-01') as bigint)").as("day"),
        col("event_type"))
      .groupBy(col("day"), col("event_type")).agg(count(lit(1)).as("n"))
      .persistScoped()
    val days = f.select(col("day")).distinct()
      .withColumnRenamed("day", "tday")
    val w = Window.partitionBy(col("tday")).orderBy(col("n7").desc, col("event_type").asc)
    f.select(explode(sequence(col("day"), col("day") + 6)).as("tday"),
        col("event_type"), col("n"))
      .join(days, Seq("tday"))
      .groupBy(col("tday"), col("event_type")).agg(sum(col("n")).as("n7"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("tday").as("day"), col("event_type").as("mode_type"),
        col("n7").as("n_7d"))
  }

  private def rollingModeSql: String =
    """WITH f AS (
      |  SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
      |    event_type, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |days AS (SELECT DISTINCT day AS tday FROM f),
      |c AS (
      |  SELECT t.tday, f.event_type, CAST(sum(f.n) AS BIGINT) AS n7
      |  FROM f, unnest(generate_series(f.day, f.day + 6)) AS g(tday)
      |  JOIN days t ON t.tday = g.tday
      |  GROUP BY 1, 2),
      |r AS (
      |  SELECT tday, event_type, n7,
      |    row_number() OVER (PARTITION BY tday ORDER BY n7 DESC, event_type ASC) AS rn
      |  FROM c)
      |SELECT tday AS day, event_type AS mode_type, n7 AS n_7d
      |FROM r WHERE rn = 1""".stripMargin

  /** Half-life-decayed engagement score — the recency weighting a
    * growth/ranking pipeline applies so last quarter's activity
    * outweighs last year's, made EXACT where the textbook e^(−λt) is
    * irrational: weight = 2²⁰ >> (age_days div 30) — a step decay
    * that halves every 30 days on the bit lattice (capped at 40
    * halvings; beyond that the weight is already 0), so both engines
    * shift identically and the score is bit-stable. Value enters on
    * the cent lattice; per event type the decayed mass publishes as
    * Σcents·w div 2²⁰ beside the raw mass, and their ratio is the
    * "how alive is this stream" signal. The reference day is the
    * corpus max (a driver scalar on the |days|-bounded fold — the
    * t_closeness metadata rule, empty-guarded). Scale shape: one
    * narrow scan with per-row shift arithmetic, ONE partial+final
    * fold to |event_types| rows; DECIMAL(38) weighted sums. */
  def decayScore(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.events(spark, dir)
      .select(col("event_type"),
        expr("cast(datediff(cast(ts as date), date'1970-01-01') as bigint)").as("day"),
        expr("cast(floor(value * 100 + 0.5) as bigint)").as("cents"))
    val mRow = base.agg(max(col("day"))).head()
    if (mRow.isNullAt(0))
      return base.select(col("event_type"), col("day").as("n_events"),
        col("day").as("raw_cents"), col("day").as("decayed_cents")).limit(0)
    val maxDay = mRow.getLong(0)
    base
      .withColumn("w",
        expr(s"shiftright(cast(1048576 as bigint), cast(least(($maxDay - day) div 30, 40) as int))"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("cents")).as("raw_cents"),
        expr("cast(sum(cast(cents as decimal(38,0)) * w) div 1048576 as bigint)")
          .as("decayed_cents"))
  }

  private def decayScoreSql: String =
    """WITH base AS (
      |  SELECT event_type,
      |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      |  FROM events),
      |m AS MATERIALIZED (SELECT max(day) AS maxday FROM base),
      |wts AS (
      |  SELECT event_type, cents,
      |    CAST(1048576 AS BIGINT) >> CAST(least((m.maxday - day) // 30, 40) AS INTEGER) AS w
      |  FROM base CROSS JOIN m)
      |SELECT event_type, count(*) AS n_events,
      |  CAST(sum(cents) AS BIGINT) AS raw_cents,
      |  CAST(sum(CAST(cents AS HUGEINT) * w) // 1048576 AS BIGINT) AS decayed_cents
      |FROM wts GROUP BY 1""".stripMargin

  /** Parquet bloom-filter write path — the third write-side layout
    * feature beside [[zorderWrite]] (clustering) and
    * [[partitionOverwrite]] (restatement): the export lands with a
    * column bloom filter on `user_id`
    * (`parquet.bloom.filter.enabled#user_id`), the row-group-level
    * skip index a high-cardinality POINT-lookup column wants where
    * min/max stats are useless (user ids are uniform across row
    * groups; a bloom answers "definitely absent" per group without
    * decoding). The registered query re-reads the bloom-equipped
    * export through a selective probe and aggregates — gating that
    * the feature-flagged write path loses nothing and the probe
    * semantics match the fixture directly (the read_corrupt_skip
    * gate shape; the bloom itself is an I/O optimization invisible
    * to results, which is exactly why the gate is content equality).
    * Explicit read schema skips footer inference. */
  def parquetBloom(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.sources.TempDirs.scratch("parquetbloom", dir)
    val done = new java.io.File(s"$out/_staged")
    if (!done.exists) {
      Tables.events(spark, dir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#user_id", "true")
        .option("parquet.bloom.filter.expected.ndv#user_id", "100000")
        .parquet(s"$out/data")
      done.createNewFile()
    }
    spark.read
      .schema("event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE")
      .parquet(s"$out/data")
      .filter(col("user_id") % 97 === 3)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(expr("cast(floor(value * 100 + 0.5) as bigint)")).as("cents"))
  }

  private def parquetBloomSql: String =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
      |FROM events WHERE user_id % 97 = 3
      |GROUP BY 1""".stripMargin

  /** Randomized-response privatized counting (Warner 1965 — the
    * local-DP mechanism behind RAPPOR-class telemetry) — the
    * RANDOMIZATION tier of the governance family above
    * [[kAnonymity]]/[[tCloseness]]'s static audits: each customer
    * reports their sensitive flag (BUILDING segment) truthfully with
    * p = 3/4 and flipped with p = 1/4 (the coin is a deterministic
    * md5 hex digit — replayable, so the oracle gates the whole
    * mechanism, which real deployments can't do and evals must), and
    * the per-nation estimator de-biases via t = (4·n_priv − n)/2.
    * The DOUBLED estimate (4·n_priv − n) is what's emitted — keeping
    * it integral sidesteps the one real cross-engine trap here
    * (Spark `div` truncates toward zero, DuckDB `//` floors: they
    * disagree on negative odd numerators, and small-n estimates go
    * negative legitimately). n_true rides along as the referee the
    * fixture affords. One narrow scan, one partial+final fold to
    * |nations| rows. */
  def randResponse(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(col("c_nationkey").cast("long").as("nation"),
        (col("c_mktsegment") === "BUILDING").cast("long").as("flag"),
        expr("substring(md5(c_name), 1, 1)").isin("0", "1", "2", "3")
          .cast("long").as("flip"))
      .withColumn("report", expr("cast((flag + flip) % 2 as bigint)"))
      .groupBy(col("nation"))
      .agg(count(lit(1)).as("n"), sum(col("flag")).as("n_true"),
        sum(col("report")).as("n_priv"))
      .select(col("nation"), col("n"), col("n_true"), col("n_priv"),
        (col("n_priv") * 4L - col("n")).as("est2x"),
        abs(col("n_priv") * 4L - col("n") - col("n_true") * 2L).as("err2x"))

  private def randResponseSql: String =
    """WITH r AS (
      |  SELECT CAST(c_nationkey AS BIGINT) AS nation,
      |    CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS flag,
      |    CASE WHEN substring(md5(c_name), 1, 1) IN ('0','1','2','3')
      |         THEN 1 ELSE 0 END AS flip
      |  FROM customer)
      |SELECT nation, count(*) AS n,
      |  CAST(sum(flag) AS BIGINT) AS n_true,
      |  CAST(sum((flag + flip) % 2) AS BIGINT) AS n_priv,
      |  CAST(sum((flag + flip) % 2) * 4 - count(*) AS BIGINT) AS est2x,
      |  CAST(abs(sum((flag + flip) % 2) * 4 - count(*) - sum(flag) * 2) AS BIGINT) AS err2x
      |FROM r GROUP BY 1""".stripMargin

  /** Central-DP released histogram — the TRUSTED-CURATOR mechanism
    * tier beside [[randResponse]]'s local-DP randomizer: per-nation
    * customer counts released with two-sided geometric noise (the
    * discrete analogue of Laplace; Ghosh–Roughgarden–Sundararajan
    * 2009's universally optimal count mechanism), ONE draw per
    * histogram CELL — not per row, which is what separates the
    * central from the local model. The draw is a deterministic md5
    * slice of the cell key (replayable, the rand_response argument:
    * the oracle gates the mechanism end-to-end, which a production
    * deployment can't and an eval harness must): magnitude = length
    * of the leading-'0' run in an 8-hex-digit slice — exactly
    * geometric, P(m = k) = (15/16)·16⁻ᵏ, i.e. ε = ln 16 (illustrative
    * operating point; production tunes the base) — sign from the 9th
    * digit. Released counts go NEGATIVE legitimately on small cells
    * (post-processing may clamp; the raw mechanism must not — bias).
    * n_true rides along as the referee only the fixture affords.
    * Scale shape: one partial+final fold to |nations| cells; the
    * noise is a per-cell scalar expression on the folded relation. */
  def dpHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .groupBy(col("c_nationkey").cast("long").as("nation"))
      .agg(count(lit(1)).as("n_true"))
      .withColumn("h", md5(concat(lit("dpnoise"), col("nation").cast("string"))))
      .select(col("nation"), col("n_true"),
        (when(substring(col("h"), 9, 1).isin("8", "9", "a", "b", "c", "d", "e", "f"),
          lit(-1L)).otherwise(lit(1L)) *
          length(regexp_extract(substring(col("h"), 1, 8), "^0*", 0)).cast("long"))
          .as("noise"))
      .withColumn("n_released", col("n_true") + col("noise"))
      .withColumn("abs_err", abs(col("noise")))

  private def dpHistogramSql: String =
    """WITH g AS (SELECT CAST(c_nationkey AS BIGINT) AS nation,
      |             count(*) AS n_true
      |           FROM customer GROUP BY 1),
      |h AS (SELECT nation, n_true,
      |        md5('dpnoise' || CAST(nation AS VARCHAR)) AS h FROM g),
      |z AS (SELECT nation, n_true,
      |        (CASE WHEN substring(h, 9, 1) IN ('8','9','a','b','c','d','e','f')
      |              THEN -1 ELSE 1 END)
      |        * length(regexp_extract(substring(h, 1, 8), '^0*')) AS noise
      |      FROM h)
      |SELECT nation, CAST(n_true AS BIGINT) AS n_true,
      |  CAST(noise AS BIGINT) AS noise,
      |  CAST(n_true + noise AS BIGINT) AS n_released,
      |  CAST(abs(noise) AS BIGINT) AS abs_err
      |FROM z""".stripMargin

  /** Cross-field TEMPORAL consistency audit — the causality rules
    * [[graft.operators.DataQuality.dqChecks]]'s intra-row battery
    * doesn't cover because each needs a JOIN or per-key fold: (1) a
    * line item shipped before its order was placed; (2) a user whose
    * first purchase precedes their first signup (the classic event-
    * pipeline ingestion bug — backfilled or clock-skewed streams).
    * Per rule: checked population and violation count — the
    * dq_checks output contract, extended to the cross-row tier.
    * Scale shape: rule 1 is one equi-join + conditional aggregate
    * (keys + two dates shuffle, never payloads); rule 2 folds events
    * to |users| first-timestamp rows, then one 1-row conditional
    * aggregate. */
  def temporalAudit(spark: SparkSession, dir: String): DataFrame = {
    val ship = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("okey"), col("l_shipdate").as("sd"))
      .join(Tables.orders(spark, dir)
        .select(col("o_orderkey").as("okey"), col("o_orderdate").as("od")), Seq("okey"))
      .agg(count(lit(1)).as("n_checked"),
        sum(when(col("sd") < col("od"), 1L).otherwise(0L)).as("n_viol"))
      .select(lit("ship_before_order").as("rule"), col("n_checked"), col("n_viol"))
    val firsts = Tables.events(spark, dir)
      .filter(col("event_type").isin("signup", "purchase"))
      .groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "signup", col("ts"))).as("first_signup"),
        min(when(col("event_type") === "purchase", col("ts"))).as("first_purchase"))
      .filter(col("first_signup").isNotNull && col("first_purchase").isNotNull)
      .agg(count(lit(1)).as("n_checked"),
        sum(when(col("first_purchase") < col("first_signup"), 1L).otherwise(0L))
          .as("n_viol"))
      .select(lit("purchase_before_signup").as("rule"), col("n_checked"), col("n_viol"))
    ship.unionAll(firsts)
  }

  private def temporalAuditSql: String =
    """SELECT 'ship_before_order' AS rule, count(*) AS n_checked,
      |  CAST(sum(CASE WHEN l_shipdate < o_orderdate THEN 1 ELSE 0 END) AS BIGINT) AS n_viol
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |UNION ALL
      |SELECT 'purchase_before_signup', count(*),
      |  CAST(sum(CASE WHEN fp < fs THEN 1 ELSE 0 END) AS BIGINT)
      |FROM (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'signup' THEN ts END) AS fs,
      |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS fp
      |  FROM events WHERE event_type IN ('signup', 'purchase')
      |  GROUP BY 1) t
      |WHERE fs IS NOT NULL AND fp IS NOT NULL""".stripMargin

  /** 2-D histogram (quantity × order-value heat grid) — the joint-
    * distribution fold behind every density scatter/heat-map a BI
    * layer renders, and the 2-D generalization of [[histogramValues]]:
    * a FIXED 10×10 bucket grid (5-unit quantity bands × $10k value
    * bands, both capped into the top bucket) so the fold is
    * O(100) rows at any scale — the resolution is a constant of the
    * operator, not of the data (the auc_rank rule). One
    * partial+final fold; cells carry count and cents mass so
    * marginals and conditional profiles derive downstream. */
  def histogram2d(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(
        expr("least((cast(l_quantity as bigint) - 1) div 5, 9)").as("qty_bucket"),
        expr("least(cast(floor(l_extendedprice * 100 + 0.5) as bigint) div 1000000, 9)")
          .as("value_bucket"),
        expr("cast(floor(l_extendedprice * 100 + 0.5) as bigint)").as("cents"))
      .groupBy(col("qty_bucket"), col("value_bucket"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))

  private def histogram2dSql: String =
    """SELECT least((CAST(l_quantity AS BIGINT) - 1) // 5, 9) AS qty_bucket,
      |  least(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) // 1000000, 9) AS value_bucket,
      |  count(*) AS n,
      |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM lineitem GROUP BY 1, 2""".stripMargin

  /** Year-over-year revenue BRIDGE — the growth decomposition a
    * revenue review opens with ("how much of the change is new
    * customers vs churn vs expansion?"), the CUSTOMER-axis
    * counterpart to [[priceVolumeMix]]'s price/volume axis: per
    * (customer, year) cents fold, self-joined FULL OUTER against
    * the prior year on the customer key, each customer classified
    * new (no prior-year revenue) / churned (no current) / retained
    * (split into expansion vs contraction deltas). The bridge
    * identity rev_t = retained_prev + expansion − contraction + new
    * is EXECUTED in spec — the decomposition can't silently leak
    * mass. Scale shape: ONE partial+final fold of orders to
    * |cust|·|years| rows (persisted once), one equi self-join on
    * (cust, year), a |years|-row final fold. */
  def revenueBridge(spark: SparkSession, dir: String): DataFrame = {
    val cy = Tables.orders(spark, dir)
      .select(col("o_custkey").as("cust"),
        expr("cast(year(cast(o_orderdate as date)) as bigint)").as("yr"),
        expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)").as("cents"))
      .groupBy(col("cust"), col("yr")).agg(sum(col("cents")).as("cents"))
      .persistScoped()
    val prev = cy.select(col("cust"), (col("yr") + 1L).as("yr"),
      col("cents").as("prev_cents"))
    cy.join(prev, Seq("cust", "yr"), "full")
      .groupBy(col("yr"))
      .agg(
        sum(when(col("prev_cents").isNull, 1L).otherwise(0L)).as("n_new"),
        sum(when(col("cents").isNull, 1L).otherwise(0L)).as("n_churned"),
        sum(when(col("cents").isNotNull && col("prev_cents").isNotNull, 1L)
          .otherwise(0L)).as("n_retained"),
        sum(when(col("prev_cents").isNull, col("cents")).otherwise(0L)).as("new_cents"),
        sum(when(col("cents").isNull, col("prev_cents")).otherwise(0L)).as("churn_cents"),
        sum(when(col("cents").isNotNull && col("prev_cents").isNotNull,
          greatest(col("cents") - col("prev_cents"), lit(0L))).otherwise(0L))
          .as("expand_cents"),
        sum(when(col("cents").isNotNull && col("prev_cents").isNotNull,
          greatest(col("prev_cents") - col("cents"), lit(0L))).otherwise(0L))
          .as("contract_cents"),
        sum(when(col("cents").isNotNull && col("prev_cents").isNotNull,
          col("prev_cents")).otherwise(0L)).as("retained_prev_cents"))
  }

  private def revenueBridgeSql: String =
    """WITH cy AS (
      |  SELECT o_custkey AS cust, CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
      |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY 1, 2),
      |j AS (
      |  SELECT coalesce(a.cust, b.cust) AS cust, coalesce(a.yr, b.yr + 1) AS yr,
      |    a.cents, b.cents AS prev_cents
      |  FROM cy a FULL JOIN cy b ON a.cust = b.cust AND a.yr = b.yr + 1)
      |SELECT yr,
      |  CAST(sum(CASE WHEN prev_cents IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
      |  CAST(sum(CASE WHEN cents IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_churned,
      |  CAST(sum(CASE WHEN cents IS NOT NULL AND prev_cents IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
      |  CAST(sum(CASE WHEN prev_cents IS NULL THEN cents ELSE 0 END) AS BIGINT) AS new_cents,
      |  CAST(sum(CASE WHEN cents IS NULL THEN prev_cents ELSE 0 END) AS BIGINT) AS churn_cents,
      |  CAST(sum(CASE WHEN cents IS NOT NULL AND prev_cents IS NOT NULL
      |       THEN greatest(cents - prev_cents, 0) ELSE 0 END) AS BIGINT) AS expand_cents,
      |  CAST(sum(CASE WHEN cents IS NOT NULL AND prev_cents IS NOT NULL
      |       THEN greatest(prev_cents - cents, 0) ELSE 0 END) AS BIGINT) AS contract_cents,
      |  CAST(sum(CASE WHEN cents IS NOT NULL AND prev_cents IS NOT NULL
      |       THEN prev_cents ELSE 0 END) AS BIGINT) AS retained_prev_cents
      |FROM j GROUP BY 1""".stripMargin

  /** Single-source supply risk by brand — the resilience screen a
    * supply-chain review runs ("which brands depend on parts only
    * one supplier has ever shipped?"): supplier diversity per part
    * from the OBSERVED (part, supplier) shipment pairs, rolled to
    * per-brand part counts, single-sourced counts, and the risk
    * share on the 2²⁰ lattice. Scale shape: one distinct fold of
    * the fact's two key columns (never payloads), a |parts|-row
    * count, an equi-join to the part dim, and a |brands|-row final
    * fold. */
  def singleSourceParts(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
      .distinct()
      .groupBy(col("pk")).agg(count(lit(1)).as("n_supp"))
      .join(Tables.part(spark, dir)
        .select(col("p_partkey").as("pk"), col("p_brand").as("brand")), Seq("pk"))
      .groupBy(col("brand"))
      .agg(count(lit(1)).as("n_parts"),
        sum(when(col("n_supp") === 1L, 1L).otherwise(0L)).as("n_single"),
        min(col("n_supp")).as("min_suppliers"))
      .select(col("brand"), col("n_parts"), col("n_single"), col("min_suppliers"),
        expr("(n_single * cast(1048576 as bigint)) div n_parts").as("single_share_q"))

  private def singleSourcePartsSql: String =
    """WITH ps AS (
      |  SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem),
      |pc AS (SELECT pk, count(*) AS n_supp FROM ps GROUP BY 1)
      |SELECT p_brand AS brand, count(*) AS n_parts,
      |  CAST(sum(CASE WHEN n_supp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_single,
      |  CAST(min(n_supp) AS BIGINT) AS min_suppliers,
      |  CAST((sum(CASE WHEN n_supp = 1 THEN 1 ELSE 0 END) * 1048576)
      |       // count(*) AS BIGINT) AS single_share_q
      |FROM pc JOIN part ON pk = p_partkey
      |GROUP BY 1""".stripMargin

  /** Corrupt-file-tolerant scan — the ops-robustness half of the
    * malformed-RECORD quarantine (`csv_quarantine` handles bad rows;
    * this handles bad FILES): a landing directory holding valid
    * parquet plus a truncated/garbage file is read with
    * `ignoreCorruptFiles`, so one bad upload cannot fail a 100 TB
    * scan. The valid content is a deterministic fixture subset
    * (user_id % 3 = 0), so the oracle replays exactly what must
    * survive — reading MORE than the valid files (garbage decoded as
    * rows) or FEWER (over-eager skipping) both break the hash. The
    * explicit read schema matters twice: it skips footer-based
    * inference (which would touch the corrupt file outside the
    * guarded path) and pins the column types. */
  def readCorruptSkip(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.sources.TempDirs.scratch("corruptdir", dir)
    val done = new java.io.File(s"$out/_staged")
    if (!done.exists) {
      Tables.events(spark, dir)
        .filter(col("user_id") % 3 === 0)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("ts"), col("value"))
        .write.mode("overwrite").parquet(s"$out/data")
      // a garbage member beside the valid part-files: parquet magic
      // so listing accepts it, then junk — the footer read fails
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$out/data/part-junk-corrupt.parquet"),
        ("PAR1" + "this is not a parquet file" * 40).getBytes("UTF-8"))
      done.createNewFile()
    }
    spark.read
      .schema("event_id BIGINT, user_id BIGINT, event_type STRING, ts TIMESTAMP, value DOUBLE")
      .option("ignoreCorruptFiles", "true")
      .parquet(s"$out/data")
  }

  /** Globally sorted export order — the final-stage sort before a
    * sorted-file handoff. The point at scale is the PLAN: Spark
    * samples the sort key and plans a `rangepartitioning` exchange
    * (every partition holds a disjoint key range, sorted within), so
    * the global order costs one balanced shuffle — never a
    * single-partition funnel. PlanAuditSpec asserts exactly that.
    * The driver's compare is order-insensitive, so the oracle gates
    * the row SET while the plan assertion gates the sort shape. */
  def sortExport(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .orderBy(col("ts").asc, col("event_id").asc)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts"), col("value"))

  private[operators] val SkipOrd = 400L
  private[operators] val SkipPart = 120L

  /** The read-side PAYOFF of [[writeZorderLayout]]: a box predicate
    * on BOTH clustered keys over the z-ordered files. Because every
    * file covers a contiguous zval range — i.e. a tight bounding box
    * on l_orderkey AND l_partkey — the parquet min/max footer stats
    * let the scan skip every row group outside the box: the pushed
    * predicate prunes at the reader, nothing but the matching corner
    * of the table is ever decoded. LayoutSpec counts it both ways
    * (footer boxes intersecting the predicate ≪ files present, and
    * the executed scan's numOutputRows ≪ table rows); the oracle
    * gates the row set itself. At 100 TB this is the entire point of
    * the layout: a needle query reads a few files, not the table. */
  def zorderSkip(spark: SparkSession, dir: String): DataFrame =
    zorderWrite(spark, dir)
      .filter(col("l_orderkey") < SkipOrd && col("l_partkey") < SkipPart)

  /** Salted fact-fact join — the standard skew-mitigation rewrite,
    * registered so the mechanics carry an oracle (the oracle is the
    * PLAIN join: salting must be output-invisible). The probe side
    * tags each row with a deterministic salt in [0, 8); the build side
    * replicates every row across all 8 salts; the join key becomes
    * (key, salt), splitting any hot key's rows across 8 reducers for
    * an 8× replication of the (smaller) build side. The `merge` hint
    * pins a sort-merge join — letting Spark broadcast the fixture-
    * sized build side would optimize the salt away and gate nothing.
    * At 100 TB this rewrite (or AQE's skewedJoin, which automates it)
    * is what keeps a power-law key from stalling the stage. */
  def joinSalted(spark: SparkSession, dir: String): DataFrame = {
    val salts = 8
    // hash-based salt so every bucket in [0, salts) is populated —
    // l_linenumber % 8 never yields 0 (TPC-H linenumbers are 1..7),
    // which left one build-side replica dead and split hot keys
    // across only 7 reducers
    val l = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_quantity"),
        pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(salts))
          .cast("int").as("salt"))
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"))
      .withColumn("salt", explode(array((0 until salts).map(s => lit(s)): _*)))
    l.hint("merge")
      .join(o, l("l_orderkey") === o("o_orderkey") && l("salt") === o("salt"))
      .groupBy(col("o_orderpriority"))
      .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_items"))
  }

  /** Generic CDC MERGE: apply a batch of keyed change records
    * (op ∈ I/U/D) to a base snapshot — the third CDC primitive beside
    * `compact_latest` (latest-record-wins compaction) and
    * `scd2_intervals` (keep-all-versions dimensioning). Updates and
    * deletes resolve through ONE left join on the key; inserts append
    * by union (their keys are absent from base by contract, so they
    * never need the join). The change batch rides a broadcast — the
    * production shape: a CDC batch is minutes of changes, orders of
    * magnitude smaller than the snapshot, and broadcasting it makes
    * the merge a NARROW pass over the base (no base shuffle at all;
    * at 100 TB the snapshot never moves). A batch too large to
    * broadcast degrades gracefully: drop the hint and the same plan
    * shuffle-joins on the key. */
  def applyCdc(base: DataFrame, changes: DataFrame, key: String): DataFrame = {
    val dataCols = base.columns.filterNot(_ == key).toSeq
    val upd = changes.filter(col("op") =!= "I")
      .select(col(key) +: col("op") +: dataCols.map(c => col(c).as(s"new_$c")): _*)
    val merged = base.join(broadcast(upd), Seq(key), "left")
      .filter(col("op").isNull || col("op") =!= "D")
      .select(col(key) +: dataCols.map(c =>
        when(col("op") === "U", col(s"new_$c")).otherwise(col(c)).as(c)): _*)
    merged.unionAll(
      changes.filter(col("op") === "I").select(col(key) +: dataCols.map(col): _*))
  }

  /** Registered [[applyCdc]] gate: a deterministic change batch
    * derived from the snapshot itself (keys ≡ 3 mod 100 update to
    * urgent priority with a 100.00 price adjustment, ≡ 7 delete,
    * ≡ 5 insert a key-shifted copy with status 'N'), applied through
    * the generic merge machinery. The oracle replays the SEMANTICS
    * (CASE + anti-filter + union); the Spark side must produce the
    * identical snapshot via the actual broadcast-merge plan. The
    * price adjustment is one IEEE add on identical inputs — both
    * engines round identically. */
  /** Base snapshot + derived change batch for the CDC merge queries —
    * shared by [[cdcApply]] (single-shot) and StreamOps.streamMerge
    * (the same change set fed through foreachBatch micro-batches), so
    * the two gates can never drift. Keys %100==3 update, ==7 delete,
    * ==5 insert under an offset key — each key touched exactly once. */
  private[operators] def cdcBase(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      col("o_orderpriority"), col("o_totalprice"))

  private[operators] def cdcChanges(o: DataFrame): DataFrame = {
    val m = col("o_orderkey") % 100
    o.filter(m.isin(3, 5, 7)).select(
      when(m === 5, col("o_orderkey") + 100000000L)
        .otherwise(col("o_orderkey")).as("o_orderkey"),
      col("o_custkey"),
      when(m === 5, lit("N")).otherwise(col("o_orderstatus")).as("o_orderstatus"),
      when(m === 3, lit("1-URGENT")).otherwise(col("o_orderpriority")).as("o_orderpriority"),
      when(m === 3, col("o_totalprice") + 100.0)
        .otherwise(col("o_totalprice")).as("o_totalprice"),
      when(m === 3, "U").when(m === 5, "I").otherwise("D").as("op"))
  }

  /** CDC upsert/delete application — full-outer merge of a change
    * batch (I/U/D ops) into the base snapshot keyed by orderkey; see
    * [[applyCdc]] for the merge semantics. */
  def cdcApply(spark: SparkSession, dir: String): DataFrame = {
    val o = cdcBase(spark, dir)
    applyCdc(o, cdcChanges(o), "o_orderkey")
  }

  /** Snapshot DIFF between two table versions — the lakehouse audit
    * op (Delta/Iceberg table_changes): given version v0 (the CDC
    * base) and v1 = changes applied, emit one row per differing key
    * classified added / removed / changed with old+new payloads.
    * One FULL OUTER key join + a column-compare predicate; at scale
    * both versions are partition-pruned scans and the join shuffles
    * keys + compared columns only. Null sides are encoded to
    * sentinels ('' / −1) on BOTH engines — the hash gate's null-free
    * convention. The 'changed' predicate compares doubles produced
    * by identical exact ops (+100.0) on both engines, so
    * classification is deterministic. */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val v0 = cdcBase(spark, dir)
    val v1 = applyCdc(v0, cdcChanges(v0), "o_orderkey")
    def side(v: DataFrame, sfx: String) = v.select(
      col("o_orderkey").as(s"k$sfx"), col("o_orderstatus").as(s"status$sfx"),
      col("o_orderpriority").as(s"prio$sfx"), col("o_totalprice").as(s"price$sfx"))
    side(v0, "0").join(side(v1, "1"), col("k0") === col("k1"), "full_outer")
      .withColumn("change_type",
        when(col("k0").isNull, lit("added"))
          .when(col("k1").isNull, lit("removed"))
          .when(col("status0") =!= col("status1") ||
            col("prio0") =!= col("prio1") ||
            col("price0") =!= col("price1"), lit("changed"))
          .otherwise(lit("unchanged")))
      .filter(col("change_type") =!= "unchanged")
      .select(coalesce(col("k0"), col("k1")).as("o_orderkey"), col("change_type"),
        coalesce(col("status0"), lit("")).as("status_old"),
        coalesce(col("status1"), lit("")).as("status_new"),
        coalesce(col("prio0"), lit("")).as("prio_old"),
        coalesce(col("prio1"), lit("")).as("prio_new"),
        coalesce(col("price0"), lit(-1.0)).as("price_old"),
        coalesce(col("price1"), lit(-1.0)).as("price_new"))
  }

  /** Incremental view maintenance of a JOIN — the delta algebra that
    * keeps a materialized join current without recomputing it:
    * (A ∪ ΔA) ⋈ (B ∪ ΔB) = A⋈B ∪ ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB. The base
    * relations are pmod splits (disjoint and exhaustive by
    * construction), so the four terms exactly partition the full
    * join and the oracle is simply the plain join of the full
    * inputs — the algebra is hash-proven, not asserted. Scale story:
    * in production the first term is the STORED view (zero cost at
    * update time) and every delta term joins a |Δ|-sized side — the
    * plan broadcasts the deltas (PlanAuditSpec asserts it), so
    * maintenance cost is proportional to the change volume, not the
    * view size; deletes extend the algebra with anti-join terms
    * (the `cdc_apply` machinery). Inserts-only here — the insert
    * algebra is the part whose cost model matters. */
  def ivmJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    val oBase  = o.filter(pmod(col("o_orderkey"), lit(5)) =!= 0)
    val oDelta = o.filter(pmod(col("o_orderkey"), lit(5)) === 0)
    val cBase  = c.filter(pmod(col("c_custkey"), lit(7)) =!= 0)
    val cDelta = c.filter(pmod(col("c_custkey"), lit(7)) === 0)
    val key = col("o_custkey") === col("c_custkey")
    val out = Seq(
      oBase.join(cBase, key),                       // the stored view
      broadcast(oDelta).join(cBase, key),           // ΔA ⋈ B
      oBase.join(broadcast(cDelta), key),           // A ⋈ ΔB
      broadcast(oDelta).join(cDelta, key))          // ΔA ⋈ ΔB
      .map(_.select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice"), col("c_mktsegment")))
    out.reduce(_ unionAll _)
  }

  /** Incremental view maintenance of a grouped AGGREGATE — the other
    * half of the delta algebra ([[ivmJoin]] maintains a join): the
    * stored view V = γ_custkey(count, Σ price) over the base orders,
    * and a mixed changeset (keys %100==5 insert a copy, %100==7
    * delete the row) is folded in WITHOUT rescanning the base. The
    * delta alone is aggregated with SIGNED multiplicities (+1
    * insert, −1 delete) — counts add the multiplicity, sums add
    * mult × price — then merged into V by a BROADCAST left join:
    * changed rows derive from base rows, so every delta group
    * already exists in the view and left-join covers the merge (a
    * brand-new group would need the full-outer variant, which can't
    * broadcast). Maintenance cost ∝ |Δ|; the base is touched only
    * through its stored aggregate. Sums stay DECIMAL through the
    * merge — exact and order-insensitive, so the maintained view is
    * bit-identical to the oracle's full recompute over base ∪ Δ —
    * and groups whose count reaches zero vanish exactly as a
    * recompute would drop them. PlanAuditSpec asserts the
    * BroadcastHashJoin merge. */
  def ivmAgg(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val m = col("o_orderkey") % 100
    val dec = col("o_totalprice").cast(DecimalType(30, 4))
    val viewBase = o.groupBy("o_custkey")
      .agg(count(lit(1)).as("n0"), sum(dec).as("s0"))
    val viewDelta = o.filter(m.isin(5, 7))
      .select(col("o_custkey"), dec.as("p"),
        when(m === 5, lit(1L)).otherwise(lit(-1L)).as("mult"))
      .groupBy("o_custkey")
      .agg(sum(col("mult")).as("dn"), sum(col("p") * col("mult")).as("ds"))
    viewBase.join(broadcast(viewDelta), Seq("o_custkey"), "left")
      .select(col("o_custkey"),
        (col("n0") + coalesce(col("dn"), lit(0L))).as("n"),
        (col("s0") + coalesce(col("ds"), lit(0).cast(DecimalType(30, 4))))
          .as("sdec"))
      .filter(col("n") > 0)
      .select(col("o_custkey"), col("n"),
        col("sdec").cast("double").as("sum_price"))
  }

  /** First-order Markov transition model over per-user event
    * sequences — the behavioral-analytics summary (and the n-gram
    * LM counterpart for event streams): for each ordered pair of
    * consecutive event types within a user's timeline, the
    * transition count and the conditional probability
    * P(next | current). One exchange on user_id feeds the lead()
    * window ((ts, event_id) ordering — event_id breaks timestamp
    * ties deterministically, the asof rule); the bigram groupBy then
    * partial-aggregates to a |types|² result, and the normalizing
    * row-sum is a window over that tiny aggregate, not the events.
    * p is one BIGINT÷BIGINT IEEE division on identical operands in
    * both engines, so even the DOUBLE column hash-matches. */
  def markovTrans(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("nxt", lead(col("event_type"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col("event_type").as("cur"), col("nxt"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy("cur")).cast("double"))
  }

  /** Semi-structured access through Spark 4's VARIANT type — the
    * schema-drift-tolerant path beyond `from_json` (`json_events`):
    * `parse_json` builds the binary variant once, `variant_get`
    * extracts typed fields lazily. At 100 TB this is the shredding
    * story — variant columns store field-wise, so `$.k` access reads
    * one shredded column instead of re-parsing text per row per
    * field. Aggregates gate the extraction end to end against
    * DuckDB's JSON functions. */
  def variantEvents(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        variant_get(parse_json(col("props")), "$.k", "long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), count(col("k")).as("n_k"),
        sum(col("k")).as("sum_k"), min(col("k")).as("min_k"), max(col("k")).as("max_k"))

  /** Multi-step funnel analysis (view → click → purchase, each step
    * strictly after the previous) — the product-analytics primitive
    * beyond the 2-step interval join (`stream_attribution`): per
    * user, the first view, the first click AFTER that view, and the
    * first purchase AFTER that click, then global step counts. All
    * three step timestamps come from CHAINED unordered window minima
    * over ONE user partitioning — a single exchange, three Window
    * passes reusing the same sort, no self-joins and no per-step
    * event-table re-scans (the join formulation explodes on users
    * with many events; this one is linear). */
  def funnelSteps(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
    val e = Tables.events(spark, dir).select(col("user_id"), col("ts"), col("event_type"))
    val staged = e
      .withColumn("tv", min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("tc", min(when(col("event_type") === "click" && col("ts") > col("tv"),
        col("ts"))).over(w))
      .withColumn("tp", min(when(col("event_type") === "purchase" && col("ts") > col("tc"),
        col("ts"))).over(w))
      .select(col("user_id"), col("tv"), col("tc"), col("tp"))
      .distinct()
    staged.agg(
      count(lit(1)).as("n_users"),
      count(col("tv")).as("n_view"),
      count(col("tc")).as("n_click"),
      count(col("tp")).as("n_purchase"))
  }

  private val EncCols: Seq[(String, Seq[String])] = Seq(
    "orders" -> Seq("o_orderstatus", "o_orderpriority"),
    "lineitem" -> Seq("l_returnflag", "l_linestatus", "l_shipdate"))

  /** Columnar ENCODING advisor — the physical-design pass a lakehouse
    * writer runs before committing a layout ([[profileTable]]'s
    * sibling, aimed at the writer not the optimizer): per string
    * column, exact row/distinct/byte-mass counts and a rule-based
    * recommendation — ndv ≤ 100 → 'dict-rle' (dictionary page +
    * run-length indexes), ndv·100 ≤ n → 'dict' (cardinality under 1%
    * of rows still dictionary-codes well), else 'plain' (dictionary
    * would blow the page budget). Parquet applies dictionary encoding
    * adaptively per row group; this op is the CORPUS-level readout
    * that decides defaults (and flags the l_shipinstruct-style
    * pseudo-enums a schema should declare). Exact integer thresholds
    * — no float heuristics. Scale shape: ONE single-pass aggregate
    * per table (all countDistincts share the scan via Expand — the
    * profile_table trade, exact because the oracle replays it), then
    * a constant-width stack/unpivot; output is Σ|columns| rows. */
  def encodingAdvisor(spark: SparkSession, dir: String): DataFrame = {
    def perTable(df: DataFrame, table: String, cols: Seq[String]): DataFrame = {
      val aggs = count(lit(1)).as("n") +: cols.flatMap(c => Seq(
        countDistinct(col(c)).as(s"d_$c"),
        sum(length(col(c).cast("string")).cast("long")).as(s"l_$c")))
      val stacked = cols.map(c => s"'$c', d_$c, l_$c").mkString(", ")
      df.agg(aggs.head, aggs.tail: _*)
        .select(lit(table).as("tbl"), col("n"),
          expr(s"stack(${cols.size}, $stacked) as (col_name, ndv, sum_len)"))
    }
    val parts = EncCols.map {
      case ("orders", cs) => perTable(Tables.orders(spark, dir), "orders", cs)
      case (t, cs) => perTable(Tables.lineitem(spark, dir), t, cs)
    }
    parts.reduce(_ unionByName _)
      .withColumn("advice",
        when(col("ndv") <= 100L, "dict-rle")
          .when(col("ndv") * 100L <= col("n"), "dict")
          .otherwise("plain"))
  }

  private def encodingAdvisorSql: String =
    EncCols.flatMap { case (t, cs) =>
      cs.map { c =>
        s"""SELECT '$t' AS tbl, count(*) AS n, '$c' AS col_name,
           |  CAST(count(DISTINCT $c) AS BIGINT) AS ndv,
           |  CAST(sum(len(CAST($c AS VARCHAR))) AS BIGINT) AS sum_len,
           |  CASE WHEN count(DISTINCT $c) <= 100 THEN 'dict-rle'
           |       WHEN count(DISTINCT $c) * 100 <= count(*) THEN 'dict'
           |       ELSE 'plain' END AS advice
           |FROM $t""".stripMargin
      }
    }.mkString("\nUNION ALL\n")

  /** ANALYZE-style table profiling — the stats-collection pass a
    * cost-based optimizer (and any data-quality dashboard) runs:
    * per column, null count, distinct count, and canonical-string
    * min/max, emitted as one row per column from a SINGLE scan (all
    * aggregates in one partial+final pass, then a narrow
    * stack/unpivot of the 1-row result — no per-column re-scans).
    * Canonical strings keep the mixed-type output one schema:
    * integers render identically everywhere; the decimal price
    * renders at fixed scale 2; the timestamp renders through an
    * explicit yyyy-MM-dd HH:mm:ss format — each a representation
    * both engines produce byte-identically (raw double/timestamp
    * toString would not be).
    *
    * Scale note: six exact countDistincts in one aggregate plan an
    * Expand (×6 rows through the partial phase) — the exact-stats
    * shape. A 100 TB profile swaps them for approx_count_distinct
    * (no Expand, one HLL register set per column); exact is kept
    * here because the oracle can replay it. */
  def profileTable(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    def ns(c: Column): Column = c.cast("string")
    val agg = o.agg(
      count(lit(1)).as("n_rows"),
      // o_orderkey
      sum(col("o_orderkey").isNull.cast("long")).as("nul_ok"),
      countDistinct(col("o_orderkey")).as("dis_ok"),
      ns(min(col("o_orderkey"))).as("min_ok"), ns(max(col("o_orderkey"))).as("max_ok"),
      // o_custkey
      sum(col("o_custkey").isNull.cast("long")).as("nul_ck"),
      countDistinct(col("o_custkey")).as("dis_ck"),
      ns(min(col("o_custkey"))).as("min_ck"), ns(max(col("o_custkey"))).as("max_ck"),
      // o_orderstatus
      sum(col("o_orderstatus").isNull.cast("long")).as("nul_st"),
      countDistinct(col("o_orderstatus")).as("dis_st"),
      min(col("o_orderstatus")).as("min_st"), max(col("o_orderstatus")).as("max_st"),
      // o_totalprice (decimal scale 2 — canonical cross-engine string)
      sum(col("o_totalprice").isNull.cast("long")).as("nul_tp"),
      countDistinct(col("o_totalprice")).as("dis_tp"),
      ns(min(col("o_totalprice")).cast("decimal(30,2)")).as("min_tp"),
      ns(max(col("o_totalprice")).cast("decimal(30,2)")).as("max_tp"),
      // o_orderdate (explicit format)
      sum(col("o_orderdate").isNull.cast("long")).as("nul_od"),
      countDistinct(col("o_orderdate")).as("dis_od"),
      date_format(min(col("o_orderdate")), "yyyy-MM-dd HH:mm:ss").as("min_od"),
      date_format(max(col("o_orderdate")), "yyyy-MM-dd HH:mm:ss").as("max_od"),
      // o_orderpriority
      sum(col("o_orderpriority").isNull.cast("long")).as("nul_op"),
      countDistinct(col("o_orderpriority")).as("dis_op"),
      min(col("o_orderpriority")).as("min_op"), max(col("o_orderpriority")).as("max_op"))
    agg.select(col("n_rows"), expr(
      """stack(6,
        |  'o_orderkey', nul_ok, dis_ok, min_ok, max_ok,
        |  'o_custkey', nul_ck, dis_ck, min_ck, max_ck,
        |  'o_orderstatus', nul_st, dis_st, min_st, max_st,
        |  'o_totalprice', nul_tp, dis_tp, min_tp, max_tp,
        |  'o_orderdate', nul_od, dis_od, min_od, max_od,
        |  'o_orderpriority', nul_op, dis_op, min_op, max_op
        |) AS (col_name, n_nulls, n_distinct, min_val, max_val)""".stripMargin))
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_val"), col("max_val"))
  }

  /** The 100 TB form of [[profileTable]], registered beside it so the
    * scale story is executable, not narrated: the six exact
    * countDistincts (which plan an Expand — ×6 rows through the
    * partial phase) are replaced by six bounded KMV sketches
    * ([[graft.functions.KmvSketchAgg]], k=64) in the SAME single
    * scan — no Expand, one partial+final pass, ≤ 64 longs of state
    * per column per partition (PlanAuditSpec asserts the shape).
    * KMV over HLL because the estimate is EXACTLY replayable: the
    * oracle recomputes each column's 64 smallest 60-bit md5 hashes
    * and the (k−1)/h_k estimator in SQL, so the distinct column is
    * hash-gated like every exact stat, not envelope-checked. Hash
    * input is each column's canonical string (the same renderings
    * [[profileTable]] proved cross-engine: fixed-scale decimal for
    * the double price, explicit format for the timestamp). */
  def profileTableApprox(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.KmvSketchAgg.kmv_distinct
    val o = Tables.orders(spark, dir)
    def ns(c: Column): Column = c.cast("string")
    def h60(c: Column): Column =
      conv(substring(md5(c.cast("string").cast("binary")), 1, 15), 16, 10).cast("long")
    val canonPrice = col("o_totalprice").cast("decimal(30,2)")
    val canonDate = date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss")
    val agg = o.agg(
      count(lit(1)).as("n_rows"),
      sum(col("o_orderkey").isNull.cast("long")).as("nul_ok"),
      kmv_distinct(h60(col("o_orderkey")), 64).as("dis_ok"),
      ns(min(col("o_orderkey"))).as("min_ok"), ns(max(col("o_orderkey"))).as("max_ok"),
      sum(col("o_custkey").isNull.cast("long")).as("nul_ck"),
      kmv_distinct(h60(col("o_custkey")), 64).as("dis_ck"),
      ns(min(col("o_custkey"))).as("min_ck"), ns(max(col("o_custkey"))).as("max_ck"),
      sum(col("o_orderstatus").isNull.cast("long")).as("nul_st"),
      kmv_distinct(h60(col("o_orderstatus")), 64).as("dis_st"),
      min(col("o_orderstatus")).as("min_st"), max(col("o_orderstatus")).as("max_st"),
      sum(col("o_totalprice").isNull.cast("long")).as("nul_tp"),
      kmv_distinct(h60(canonPrice), 64).as("dis_tp"),
      ns(min(canonPrice)).as("min_tp"), ns(max(canonPrice)).as("max_tp"),
      sum(col("o_orderdate").isNull.cast("long")).as("nul_od"),
      kmv_distinct(h60(canonDate), 64).as("dis_od"),
      date_format(min(col("o_orderdate")), "yyyy-MM-dd HH:mm:ss").as("min_od"),
      date_format(max(col("o_orderdate")), "yyyy-MM-dd HH:mm:ss").as("max_od"),
      sum(col("o_orderpriority").isNull.cast("long")).as("nul_op"),
      kmv_distinct(h60(col("o_orderpriority")), 64).as("dis_op"),
      min(col("o_orderpriority")).as("min_op"), max(col("o_orderpriority")).as("max_op"))
    agg.select(col("n_rows"), expr(
      """stack(6,
        |  'o_orderkey', nul_ok, dis_ok, min_ok, max_ok,
        |  'o_custkey', nul_ck, dis_ck, min_ck, max_ck,
        |  'o_orderstatus', nul_st, dis_st, min_st, max_st,
        |  'o_totalprice', nul_tp, dis_tp, min_tp, max_tp,
        |  'o_orderdate', nul_od, dis_od, min_od, max_od,
        |  'o_orderpriority', nul_op, dis_op, min_op, max_op
        |) AS (col_name, n_nulls, n_distinct_est, min_val, max_val)""".stripMargin))
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct_est"), col("min_val"), col("max_val"))
  }

  /** Bucketed co-located join — the pay-the-shuffle-ONCE layout
    * technique that matters most for repeated fact-fact joins at
    * 100 TB: both tables are written bucketed (+ sorted) on the join
    * key, so every later join on that key reads co-located buckets
    * and plans NO join-side exchange (PlanAuditSpec asserts ≤ 1
    * exchange — the final small-group aggregation only — under
    * broadcast-disabled cluster conditions). Eager write at
    * construction is the sink-gate precedent (zorder_write); data
    * lands under the pid-scoped scratch dir, and the oracle gates
    * the join results against the plain unbucketed join. Catalog
    * entries live in InMemoryCatalog, which sits in SharedState and
    * is therefore shared by EVERY session of the SparkContext — so
    * the table names are scoped the same way as the scratch dir
    * (input-dir md5 + pid), keeping two fixtures or two concurrent
    * JVMs from racing on DROP TABLE/saveAsTable. */
  def joinBucketed(spark: SparkSession, dir: String): DataFrame = {
    val scratch = graft.sources.TempDirs.scratch("buckets", dir)
    val scope = s"${graft.sources.TempDirs.dirKey(dir)}_p${ProcessHandle.current().pid()}"
    val ordersT = s"graft_orders_b_$scope"
    val lineitemT = s"graft_lineitem_b_$scope"
    def writeBucketed(df: DataFrame, key: String, table: String): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      df.write.bucketBy(8, key).sortBy(key)
        .option("path", s"$scratch/$table")
        .mode("overwrite").saveAsTable(table)
    }
    writeBucketed(Tables.orders(spark, dir).select("o_orderkey", "o_orderstatus"),
      "o_orderkey", ordersT)
    writeBucketed(Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity"),
      "l_orderkey", lineitemT)
    spark.table(lineitemT)
      .join(spark.table(ordersT), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_items"))
  }

  /** Shuffle join under runtime-filter pressure — the data-skipping
    * shape that matters most at 100 TB: a fact-fact join whose build
    * side is filtered selective, where Spark's runtime bloom filter
    * (spark.sql.optimizer.runtime.bloomFilter.*) injects a
    * might_contain probe into the APPLICATION side's scan so the big
    * side drops non-joining rows before the exchange, not after it.
    * The `merge` hint pins the shuffle join (broadcast at fixture
    * scale would both bypass the runtime-filter trigger and gate
    * nothing — a broadcast join already skips via its own hash
    * probe). The size thresholds that arm the rewrite are sized for
    * clusters (10 GB application-side scans), so the fixture-scale
    * plan runs unfiltered — PlanAuditSpec lowers the thresholds in a
    * dedicated session and asserts the bloom probe appears; this
    * registered form gates the join's RESULTS either way. */
  def joinRuntimeFilter(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    Tables.lineitem(spark, dir).hint("merge")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_items"))
  }

  // 2^16 bits = one full 4-hex-char slice per hash; ~16+ bits/key at
  // the largest fixture (3k keys at sf0.1) keeps the measured FP rate
  // in the sub-1% regime a planner would actually ship
  private val BloomM = 65536L // filter bits
  private val BloomK = 3      // hash functions per key

  /** Explicit broadcast-bloom semi-join calibration — the runtime
    * filter of [[joinRuntimeFilter]] made first-class and MEASURED
    * (the minhash_accuracy role for the join-pruning family): a
    * [[BloomM]]-bit / [[BloomK]]-hash filter builds over one segment's
    * customer keys, every ordering customer probes it, and the report
    * states what a planner needs to decide "ship the filter or not" —
    * probe count, true members, bloom positives, false positives, and
    * the FP rate on the 2²⁰ lattice. Bit positions are md5-hex slices
    * mod [[BloomM]] (the agg_kmv_distinct hash-domain trick), so both
    * engines replay the filter bit-for-bit and the gate is hash-exact
    * — including the no-false-negative guarantee (every member IS a
    * bloom positive, by construction; EdgeCaseSpec executes it).
    * Scale shape: the key fold and its ≤ [[BloomM]]-row bit set are
    * broadcast-sized by construction (that is the point of a bloom —
    * at 100 TB the bit set ships to every executor while the key set
    * may not); the probe side explodes to [[BloomK]] narrow rows and
    * meets the bits in a BroadcastHashJoin, then folds partial+final.
    * The scalar report is ONE row — safe at any corpus size. */
  def bloomProbe(spark: SparkSession, dir: String): DataFrame = {
    def pos(key: Column, j: Int): Column =
      pmod(conv(substring(md5(key.cast("string").cast("binary")), j * 4 + 1, 4), 16, 10)
        .cast("long"), lit(BloomM))
    val keys = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "AUTOMOBILE")
      .select(col("c_custkey").as("k")).distinct().persistScoped()
    val bits = (0 until BloomK).map(j => keys.select(pos(col("k"), j).as("pos")))
      .reduce(_ unionAll _).distinct()
    val probe = Tables.orders(spark, dir)
      .select(col("o_custkey").as("k")).distinct().persistScoped()
    // one row per (probe key, hash j): nhit = how many of the key's
    // K positions are set — duplicates among a key's positions count
    // per j, exactly the per-hash bit test of a real bloom
    val probePos = (0 until BloomK)
      .map(j => probe.select(col("k"), pos(col("k"), j).as("pos")))
      .reduce(_ unionAll _)
    val hits = probePos.join(broadcast(bits), "pos")
      .groupBy(col("k")).agg(count(lit(1)).as("nhit"))
    probe
      .join(hits, Seq("k"), "left")
      .withColumn("bloom_pos",
        (coalesce(col("nhit"), lit(0L)) === BloomK.toLong).cast("long"))
      .join(broadcast(keys.withColumn("member", lit(1L))), Seq("k"), "left")
      .withColumn("member", coalesce(col("member"), lit(0L)))
      .agg(
        count(lit(1)).as("n_probe"),
        sum(col("member")).as("n_member"),
        sum(col("bloom_pos")).as("n_bloom_pos"),
        sum(when(col("bloom_pos") === 1L && col("member") === 0L, 1L)
          .otherwise(0L)).as("n_fp"))
      .select(col("n_probe"), col("n_member"), col("n_bloom_pos"), col("n_fp"),
        expr("(n_fp * 1048576) div greatest(n_probe - n_member, 1)").as("fp_q"))
  }

  private def bloomProbeSql: String =
    s"""WITH keys AS (SELECT DISTINCT c_custkey AS k FROM customer
       |              WHERE c_mktsegment = 'AUTOMOBILE'),
       |pk AS (SELECT k, CAST('0x' || substr(md5(CAST(k AS VARCHAR)), j*4 + 1, 4) AS INTEGER)
       |                 % $BloomM AS pos
       |       FROM keys, generate_series(0, ${BloomK - 1}) AS t(j)),
       |bits AS (SELECT DISTINCT pos FROM pk),
       |probe AS (SELECT DISTINCT o_custkey AS k FROM orders),
       |pp AS (SELECT k, CAST('0x' || substr(md5(CAST(k AS VARCHAR)), j*4 + 1, 4) AS INTEGER)
       |                 % $BloomM AS pos
       |       FROM probe, generate_series(0, ${BloomK - 1}) AS t(j)),
       |hit AS (SELECT pp.k, count(*) AS nhit FROM pp JOIN bits USING (pos) GROUP BY 1),
       |v AS (SELECT p.k,
       |        CASE WHEN coalesce(h.nhit, 0) = $BloomK THEN 1 ELSE 0 END AS bloom_pos,
       |        CASE WHEN kk.k IS NULL THEN 0 ELSE 1 END AS member
       |      FROM probe p LEFT JOIN hit h ON h.k = p.k LEFT JOIN keys kk ON kk.k = p.k)
       |SELECT count(*) AS n_probe, CAST(sum(member) AS BIGINT) AS n_member,
       |  CAST(sum(bloom_pos) AS BIGINT) AS n_bloom_pos,
       |  CAST(sum(CASE WHEN bloom_pos = 1 AND member = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_fp,
       |  CAST((CAST(sum(CASE WHEN bloom_pos = 1 AND member = 0 THEN 1 ELSE 0 END) AS BIGINT) * 1048576)
       |       // greatest(count(*) - CAST(sum(member) AS BIGINT), 1) AS BIGINT) AS fp_q
       |FROM v""".stripMargin

  /** Bollinger-band breach screen over the daily revenue series —
    * the volatility-envelope anomaly primitive (price/volume bands in
    * trading, alert thresholds in ops dashboards): per calendar
    * month, how many days' revenue left the trailing-7-day ±2σ band.
    * The test is kept EXACT with no sqrt and no float variance:
    * breach ⟺ (n·x − S₁)² > 4·(n·S₂ − S₁²) over the window's exact
    * integral moment sums (S₁=Σcents, S₂=Σcents² as DECIMAL(38) —
    * cents² reaches 10²⁶ at warehouse scale, past int64), the
    * variance inequality cleared of its n² denominators, so both
    * engines compare the same integers. Partial leading windows
    * (n<7) use the same formula at their actual n. Scale shape:
    * fold-below-window (the [[drawdown]] contract) — the fact table
    * folds to |days| rows with one partial+final aggregate BEFORE
    * the single-partition trailing window orders metadata-scale
    * rows; the monthly rollup is a second partial+final aggregate. */
  def bollingerBreach(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("day").asc).rowsBetween(-6, Window.currentRow)
    val dec = (c: Column) => c.cast(DecimalType(38, 0))
    Tables.orders(spark, dir)
      .select(
        expr("cast(datediff(cast(o_orderdate as date), date'1970-01-01') as bigint)").as("day"),
        expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)").as("cents"))
      .groupBy(col("day")).agg(sum(col("cents")).as("x"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s1", sum(dec(col("x"))).over(w))
      .withColumn("s2", sum(dec(col("x")) * dec(col("x"))).over(w))
      .select(
        expr("day div 30").as("m"),
        when(
          (dec(col("n")) * dec(col("x")) - col("s1")) * (dec(col("n")) * dec(col("x")) - col("s1"))
            > lit(4) * (dec(col("n")) * col("s2") - col("s1") * col("s1")),
          1L).otherwise(0L).as("br"))
      .groupBy(col("m"))
      .agg(count(lit(1)).as("n_days"), sum(col("br")).as("n_breach"))
  }

  private def bollingerBreachSql: String =
    """WITH g AS (
      |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
      |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
      |  FROM orders GROUP BY 1),
      |w AS (SELECT day, x,
      |        count(*) OVER tw AS n,
      |        CAST(sum(CAST(x AS HUGEINT)) OVER tw AS HUGEINT) AS s1,
      |        CAST(sum(CAST(x AS HUGEINT) * x) OVER tw AS HUGEINT) AS s2
      |      FROM g
      |      WINDOW tw AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
      |b AS (SELECT day // 30 AS m,
      |        CASE WHEN (n * CAST(x AS HUGEINT) - s1) * (n * CAST(x AS HUGEINT) - s1)
      |                  > 4 * (n * s2 - s1 * s1)
      |             THEN 1 ELSE 0 END AS br
      |      FROM w)
      |SELECT CAST(m AS BIGINT) AS m, count(*) AS n_days,
      |  CAST(sum(br) AS BIGINT) AS n_breach
      |FROM b GROUP BY m""".stripMargin

  /** Lead–lag cross-correlation between two daily series — the
    * "does volume lead revenue" diagnostic a demand-planning team
    * runs before trusting one series as a predictor of the other:
    * corr(qty(d), rev(d+lag)) at lags {−7,−3,−1,0,1,3,7}. The
    * [[autocorrLag7]] exact-moment discipline generalized to a
    * second series and a lag VECTOR: both series fold from lineitem
    * in ONE partial+final aggregate, each day row explodes into 7
    * (day, lag) probes (a 7× fan-out of metadata-scale rows, not
    * fact rows), and one key join on the shifted day aligns the
    * pairs. Moment sums are exact integrals (floor-anchored
    * DECIMAL(19) products); the final corr/slope doubles divide
    * bit-identical integers, so IEEE division/sqrt makes the floats
    * reproducible cross-engine. Scale shape: fact folds once; the
    * join and the per-lag aggregate move only |days|·7 rows. */
  def crossCorr(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.lineitem(spark, dir)
      .select(
        expr("cast(datediff(cast(l_shipdate as date), date'1970-01-01') as bigint)").as("day"),
        expr("cast(l_quantity as bigint)").as("qty"),
        expr("cast(floor(l_extendedprice * 100 + 0.5) as bigint)").as("cents"))
      .groupBy(col("day"))
      .agg(sum(col("qty")).as("q"), expr("sum(cents) div 100000").as("rev_k"))
      .persistScoped()
    val xs = daily.select(col("day"), col("q").as("x"))
      .withColumn("lag", explode(array(Seq(-7L, -3L, -1L, 0L, 1L, 3L, 7L).map(lit): _*)))
      .select((col("day") + col("lag")).as("yday"), col("lag"), col("x"))
    val pairs = xs.join(
      daily.select(col("day").as("yday"), col("rev_k").as("y")), "yday")
    def mom(c: Column): Column = floor(c).cast("double")
    val dec = (c: Column) => c.cast(DecimalType(19, 0))
    val n = count(lit(1))
    val sx = mom(sum(dec(col("x")))); val sy = mom(sum(dec(col("y"))))
    val sxx = mom(sum(dec(col("x")) * dec(col("x"))))
    val syy = mom(sum(dec(col("y")) * dec(col("y"))))
    val sxy = mom(sum(dec(col("x")) * dec(col("y"))))
    val covN = n * sxy - sx * sy
    pairs.groupBy(col("lag")).agg(
      n.as("n_pairs"),
      (covN / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))).as("corr_xy"))
  }

  private def crossCorrSql: String =
    """WITH d AS (
      |  SELECT CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
      |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q,
      |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) // 100000 AS BIGINT) AS rev_k
      |  FROM lineitem GROUP BY 1),
      |xs AS (SELECT day + lag AS yday, lag, q AS x
      |       FROM d, (SELECT unnest([-7, -3, -1, 0, 1, 3, 7]) AS lag) l),
      |p AS (SELECT xs.lag, xs.x, d.rev_k AS y FROM xs JOIN d ON d.day = xs.yday),
      |m AS (SELECT lag, count(*) AS n,
      |        CAST(floor(sum(CAST(x AS HUGEINT))) AS DOUBLE) AS sx,
      |        CAST(floor(sum(CAST(y AS HUGEINT))) AS DOUBLE) AS sy,
      |        CAST(floor(sum(CAST(x AS HUGEINT) * x)) AS DOUBLE) AS sxx,
      |        CAST(floor(sum(CAST(y AS HUGEINT) * y)) AS DOUBLE) AS syy,
      |        CAST(floor(sum(CAST(x AS HUGEINT) * y)) AS DOUBLE) AS sxy
      |      FROM p GROUP BY lag)
      |SELECT CAST(lag AS BIGINT) AS lag, n AS n_pairs,
      |  (n * sxy - sx * sy)
      |    / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_xy
      |FROM m""".stripMargin

  /** Weighted trade reciprocity — the network-science companion to
    * [[tradeMatrix]]: for every unordered nation pair, the revenue
    * flowing each way and how BALANCED the exchange is,
    * `recip_q = 2·min(w_ab, w_ba) / (w_ab + w_ba)` on the 2²⁰
    * lattice (2²⁰ = perfectly reciprocal, 0 = one-way). One-way
    * pairs survive via the full outer join with zero fills — a
    * reciprocity report that silently drops them would overstate
    * balance. Scale shape: the same fact fold as the trade matrix
    * (one partial+final aggregate to |nations|² rows at most), then
    * the direction alignment is a join of two disjoint SLICES of
    * that metadata-scale fold — the fact table is long gone. Wide
    * lattice products ride DECIMAL(38) (min·2²¹ passes int64 near
    * 10¹³-cent flows). */
  def tradeReciprocity(spark: SparkSession, dir: String): DataFrame = {
    val cn = Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey"))
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey").as("c_nationkey"), col("n_name").as("cust_nation"))),
        "c_nationkey")
    val sn = Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey"))
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey").as("s_nationkey"), col("n_name").as("supp_nation"))),
        "s_nationkey")
    val g = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"),
        expr("cast(floor(l_extendedprice * 100 + 0.5) as bigint)").as("r"))
      .join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cn), col("o_custkey") === col("c_custkey"))
      .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
      .filter(col("cust_nation") =!= col("supp_nation"))
      .groupBy(col("cust_nation"), col("supp_nation"))
      .agg(sum(col("r")).as("w"))
      .persistScoped()
    val ab = g.filter(col("cust_nation") < col("supp_nation"))
      .select(col("cust_nation").as("nation_a"), col("supp_nation").as("nation_b"),
        col("w").as("w_ab"))
    val ba = g.filter(col("cust_nation") > col("supp_nation"))
      .select(col("supp_nation").as("nation_a"), col("cust_nation").as("nation_b"),
        col("w").as("w_ba"))
    ab.join(ba, Seq("nation_a", "nation_b"), "full")
      .select(col("nation_a"), col("nation_b"),
        coalesce(col("w_ab"), lit(0L)).as("w_ab"),
        coalesce(col("w_ba"), lit(0L)).as("w_ba"))
      .withColumn("recip_q",
        expr("cast((cast(least(w_ab, w_ba) as decimal(38,0)) * 2 * 1048576) " +
          "div (w_ab + w_ba) as bigint)"))
  }

  private def tradeReciprocitySql: String =
    """WITH g AS (
      |  SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
      |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS w
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation cn ON c_nationkey = cn.n_nationkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation sn ON s_nationkey = sn.n_nationkey
      |  WHERE cn.n_name <> sn.n_name
      |  GROUP BY 1, 2),
      |ab AS (SELECT cust_nation AS nation_a, supp_nation AS nation_b, w AS w_ab
      |       FROM g WHERE cust_nation < supp_nation),
      |ba AS (SELECT supp_nation AS nation_a, cust_nation AS nation_b, w AS w_ba
      |       FROM g WHERE cust_nation > supp_nation),
      |j AS (SELECT coalesce(ab.nation_a, ba.nation_a) AS nation_a,
      |        coalesce(ab.nation_b, ba.nation_b) AS nation_b,
      |        coalesce(ab.w_ab, 0) AS w_ab, coalesce(ba.w_ba, 0) AS w_ba
      |      FROM ab FULL JOIN ba
      |        ON ab.nation_a = ba.nation_a AND ab.nation_b = ba.nation_b)
      |SELECT nation_a, nation_b, CAST(w_ab AS BIGINT) AS w_ab,
      |  CAST(w_ba AS BIGINT) AS w_ba,
      |  CAST((CAST(least(w_ab, w_ba) AS HUGEINT) * 2 * 1048576)
      |       // (w_ab + w_ba) AS BIGINT) AS recip_q
      |FROM j""".stripMargin

  /** Deterministic A/B experiment readout — assignment, conversion,
    * and significance in one pass, the whole loop an experimentation
    * platform runs per flag: users land in arm A or B by the SAME
    * Knuth multiplicative hash as the corpus splits (growth-stable:
    * an assignment never changes as the corpus grows — random()
    * would reshuffle arms every run), a user CONVERTS if they emit a
    * high-value purchase (value ≥ 200 — plain "any purchase" is
    * universal on the fixture, collapsing p̂(1−p̂) to 0 and the z
    * denominator with it), and the readout is one row with both arms'
    * exact counts, conversion rates on the 2²⁰ lattice, and the
    * classic pooled two-proportion z statistic. z is the one double
    * — computed from exact integer counts by identical IEEE
    * arithmetic on both engines (the [[autocorrLag7]] discipline).
    * Scale shape: one per-user partial+final fold of the event
    * stream (conversion is max-of-flag — no distinct), then a 1-row
    * conditional aggregate; assignment is a pure per-row function,
    * never a join. */
  def abTest(spark: SparkSession, dir: String): DataFrame = {
    val h = ((col("user_id") % lit(2147483648L)) * lit(2654435761L)) % lit(4294967296L)
    val per = Tables.events(spark, dir)
      .select(col("user_id"),
        when(col("event_type") === "purchase" && col("value") >= 200.0, 1L)
          .otherwise(0L).as("c"))
      .groupBy(col("user_id"))
      .agg(max(col("c")).as("conv"))
      .select(when(h < lit(2147483648L), "A").otherwise("B").as("arm"), col("conv"))
    val z = {
      val na = sum(when(col("arm") === "A", 1L).otherwise(0L)).cast("double")
      val nb = sum(when(col("arm") === "B", 1L).otherwise(0L)).cast("double")
      val ca = sum(when(col("arm") === "A", col("conv")).otherwise(0L)).cast("double")
      val cb = sum(when(col("arm") === "B", col("conv")).otherwise(0L)).cast("double")
      val p = (ca + cb) / (na + nb)
      (ca / na - cb / nb) / sqrt(p * (lit(1.0) - p) * (lit(1.0) / na + lit(1.0) / nb))
    }
    per.agg(
      sum(when(col("arm") === "A", 1L).otherwise(0L)).as("n_a"),
      sum(when(col("arm") === "A", col("conv")).otherwise(0L)).as("conv_a"),
      sum(when(col("arm") === "B", 1L).otherwise(0L)).as("n_b"),
      sum(when(col("arm") === "B", col("conv")).otherwise(0L)).as("conv_b"),
      z.as("z_score"))
      .withColumn("rate_a_q",
        expr("cast((conv_a * cast(1048576 as bigint)) div n_a as bigint)"))
      .withColumn("rate_b_q",
        expr("cast((conv_b * cast(1048576 as bigint)) div n_b as bigint)"))
  }

  private def abTestSql: String =
    """WITH per AS (
      |  SELECT user_id,
      |    max(CASE WHEN event_type = 'purchase' AND value >= 200.0 THEN 1 ELSE 0 END) AS conv
      |  FROM events GROUP BY 1),
      |armed AS (
      |  SELECT CASE WHEN ((user_id % 2147483648) * 2654435761) % 4294967296
      |              < 2147483648 THEN 'A' ELSE 'B' END AS arm, conv
      |  FROM per),
      |a AS (SELECT
      |        CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |        CAST(sum(CASE WHEN arm = 'A' THEN conv ELSE 0 END) AS BIGINT) AS conv_a,
      |        CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
      |        CAST(sum(CASE WHEN arm = 'B' THEN conv ELSE 0 END) AS BIGINT) AS conv_b
      |      FROM armed)
      |SELECT n_a, conv_a, n_b, conv_b,
      |  (CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
      |    / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
      |           * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
      |           * (1.0 / n_a + 1.0 / n_b)) AS z_score,
      |  CAST((conv_a * 1048576) // n_a AS BIGINT) AS rate_a_q,
      |  CAST((conv_b * 1048576) // n_b AS BIGINT) AS rate_b_q
      |FROM a""".stripMargin

  /** Purged temporal split with an EMBARGO gap (the de Prado
    * purged-CV discipline, the time-series sibling of
    * [[graft.operators.Corpus.datasetSplit]]'s hash split): train =
    * events up to the 70%-of-span cut, then a 7-day embargo DROPPED
    * from both sides, then validation — the gap absorbs the label /
    * feature lookahead that makes naive temporal splits leak
    * (rolling features computed at train-tail timestamps see val-head
    * events). Emits one row per zone (train/embargo/val) with event
    * and user mass and the exact day span; the defining property —
    * min(val.day) − max(train.day) > embargo — is an EXECUTED spec
    * assertion, as is zones-partition-the-stream. Cut and span are
    * data-derived integers (the categoryDrift midpoint rule). Scale
    * shape: one scalar bounds fold, then one conditional
    * partial+final pass (exact distinct users per zone — the Expand
    * trade at |zones| = 3). */
  def embargoSplit(spark: SparkSession, dir: String): DataFrame = {
    val day = expr("unix_micros(ts) div 86400000000")
    val b = Tables.events(spark, dir).agg(min(day).as("mn"), max(day).as("mx")).head()
    if (b.isNullAt(0)) {
      return Tables.events(spark, dir)
        .select(col("event_type").as("zone"), col("user_id").as("n_events"),
          col("user_id").as("n_users"), col("user_id").as("min_day"),
          col("user_id").as("max_day")).limit(0)
    }
    val (mn, mx) = (b.getLong(0), b.getLong(1))
    val cut = mn + (mx - mn) * 7L / 10L
    val emb = cut + 7L
    Tables.events(spark, dir)
      .select(col("user_id"), day.as("d"))
      .select(col("user_id"), col("d"),
        when(col("d") <= cut, "train")
          .when(col("d") <= emb, "embargo").otherwise("val").as("zone"))
      .groupBy(col("zone"))
      .agg(count(lit(1)).as("n_events"), countDistinct(col("user_id")).as("n_users"),
        min(col("d")).as("min_day"), max(col("d")).as("max_day"))
  }

  private def embargoSplitSql: String =
    """WITH b AS (SELECT min(epoch_ns(ts) // 1000 // 86400000000) AS mn,
      |             max(epoch_ns(ts) // 1000 // 86400000000) AS mx FROM events),
      |z AS (SELECT user_id, epoch_ns(ts) // 1000 // 86400000000 AS d,
      |        CASE WHEN epoch_ns(ts) // 1000 // 86400000000
      |               <= b.mn + (b.mx - b.mn) * 7 // 10 THEN 'train'
      |             WHEN epoch_ns(ts) // 1000 // 86400000000
      |               <= b.mn + (b.mx - b.mn) * 7 // 10 + 7 THEN 'embargo'
      |             ELSE 'val' END AS zone
      |      FROM events, b)
      |SELECT zone, count(*) AS n_events,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
      |  CAST(min(d) AS BIGINT) AS min_day, CAST(max(d) AS BIGINT) AS max_day
      |FROM z GROUP BY zone""".stripMargin

  /** Referential-integrity audit — the FOREIGN-KEY tier of the DQ
    * family ([[graft.operators.DataQuality.dqChecks]] is intra-row,
    * [[temporalAudit]] cross-row-temporal; this is cross-TABLE): per
    * declared FK edge, the child population and the orphan mass
    * (child rows whose key has no parent — the repair queue of an
    * ingestion bug), orphan share on the 2²⁰ lattice. The
    * events.user_id → customer edge is deliberately included even
    * though it ISN'T clean by construction: event streams routinely
    * carry pre-signup/anonymous ids, and measuring that mass is the
    * op's production reading. Scale shape: per edge ONE key-only
    * left-anti join (keys shuffle, payloads never) + a 1-row
    * conditional count; edges union to |edges| rows. */
  def refIntegrity(spark: SparkSession, dir: String): DataFrame = {
    def rule(name: String, child: DataFrame, parent: DataFrame): DataFrame = {
      val c = child.toDF("k")
      val p = parent.toDF("k").distinct()
      val j = c.join(p.withColumn("hit", lit(1)), Seq("k"), "left")
      j.agg(count(lit(1)).as("n_child"),
        sum(when(col("hit").isNull, 1L).otherwise(0L)).as("n_orphan"))
        .select(lit(name).as("rule"), col("n_child"), col("n_orphan"),
          expr("cast((cast(n_orphan as decimal(38,0)) * 1048576) div greatest(n_child, 1) as bigint)")
            .as("orphan_q"))
    }
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val cu = Tables.customer(spark, dir)
    Seq(
      rule("lineitem_orders", li.select(col("l_orderkey")), o.select(col("o_orderkey"))),
      rule("lineitem_part", li.select(col("l_partkey")),
        Tables.part(spark, dir).select(col("p_partkey"))),
      rule("lineitem_supplier", li.select(col("l_suppkey")),
        Tables.supplier(spark, dir).select(col("s_suppkey"))),
      rule("orders_customer", o.select(col("o_custkey")), cu.select(col("c_custkey"))),
      rule("customer_nation", cu.select(col("c_nationkey")),
        Tables.nation(spark, dir).select(col("n_nationkey"))),
      rule("events_customer",
        Tables.events(spark, dir).select(col("user_id")), cu.select(col("c_custkey"))))
      .reduce(_ unionByName _)
  }

  private def refIntegritySql: String = {
    def rule(name: String, child: String, ck: String, parent: String, pk: String) =
      s"""SELECT '$name' AS rule, count(*) AS n_child,
         |  CAST(sum(CASE WHEN p.$pk IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphan,
         |  CAST((CAST(sum(CASE WHEN p.$pk IS NULL THEN 1 ELSE 0 END) AS HUGEINT)
         |       * 1048576) // greatest(count(*), 1) AS BIGINT) AS orphan_q
         |FROM $child c LEFT JOIN (SELECT DISTINCT $pk FROM $parent) p
         |  ON c.$ck = p.$pk""".stripMargin
    Seq(
      rule("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      rule("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
      rule("lineitem_supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
      rule("orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
      rule("customer_nation", "customer", "c_nationkey", "nation", "n_nationkey"),
      rule("events_customer", "events", "user_id", "customer", "c_custkey"))
      .mkString("\nUNION ALL\n")
  }

  /** CUPED variance-reduction estimator (Deng et al. 2013) — the
    * experimentation-platform technique above [[abTest]]'s plain
    * two-proportion readout: adjust the post-period metric by the
    * PRE-period covariate, ŷ = y − θ·(x − x̄), with θ = cov(x,y)/
    * var(x) pooled across arms. Here x/y are each user's revenue
    * cents in the first/second half of the time range (the
    * [[categoryDrift]] data-derived midpoint), arms by [[abTest]]'s
    * Knuth hash, and θ lives on the 2²⁰ lattice in cleared-
    * denominator form, θ_q = ((n·Σxy − Σx·Σy)·2²⁰) div (n·Σx² −
    * (Σx)²) — every product DECIMAL(38), and the possibly-NEGATIVE
    * numerator truncates toward zero identically on both engines
    * (JVM/Spark `div` and DuckDB integer `//` both truncate —
    * MEASURED, see audio_resample). Emitted: θ_q, per-arm mean y,
    * the raw A−B delta and the CUPED-adjusted delta = Δy − (θ_q·Δx)
    * div 2²⁰ — the number the experiment readout actually ships.
    * Scale shape: one per-user partial+final fold of events, then a
    * single 1-row aggregate; no joins. */
  def cupedAdjust(spark: SparkSession, dir: String): DataFrame = {
    val usec = expr("unix_micros(ts)")
    val bounds = Tables.events(spark, dir)
      .agg(min(usec).as("mn"), max(usec).as("mx")).head()
    // degenerate corpus: keep going with mid = 0 — the 1-row aggregate
    // then emits (0, NULL, ...) exactly like the oracle's empty-sum row
    val mid =
      if (bounds.isNullAt(0)) 0L
      else (bounds.getLong(0) + bounds.getLong(1)) / 2L
    val h = ((col("user_id") % lit(2147483648L)) * lit(2654435761L)) % lit(4294967296L)
    val per = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"),
        when(usec <= mid, expr("cast(floor(value * 100 + 0.5) as bigint)"))
          .otherwise(0L).as("x"),
        when(usec > mid, expr("cast(floor(value * 100 + 0.5) as bigint)"))
          .otherwise(0L).as("y"))
      .groupBy(col("user_id"))
      .agg(sum(col("x")).as("x"), sum(col("y")).as("y"))
      .select(when(h < lit(2147483648L), "A").otherwise("B").as("arm"),
        col("x").cast(DecimalType(38, 0)).as("x"),
        col("y").cast(DecimalType(38, 0)).as("y"))
    per.agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"),
      sum(when(col("arm") === "A", 1L).otherwise(0L)).as("na"),
      sum(when(col("arm") === "A", col("x")).otherwise(lit(0L))).as("sxa"),
      sum(when(col("arm") === "A", col("y")).otherwise(lit(0L))).as("sya"),
      sum(when(col("arm") === "B", 1L).otherwise(0L)).as("nb"),
      sum(when(col("arm") === "B", col("x")).otherwise(lit(0L))).as("sxb"),
      sum(when(col("arm") === "B", col("y")).otherwise(lit(0L))).as("syb"))
      .select(col("n").as("n_users"),
        expr("cast(((n * sxy - sx * sy) * 1048576) div greatest(n * sxx - sx * sx, 1) as bigint)")
          .as("theta_q"),
        expr("cast((sya * 1048576) div greatest(na, 1) as bigint)").as("mean_y_a_q"),
        expr("cast((syb * 1048576) div greatest(nb, 1) as bigint)").as("mean_y_b_q"),
        expr("cast((sya * 1048576) div greatest(na, 1) - (syb * 1048576) div greatest(nb, 1) as bigint)")
          .as("delta_raw_q"),
        expr("""cast((sya * 1048576) div greatest(na, 1) - (syb * 1048576) div greatest(nb, 1)
          - (cast(((n * sxy - sx * sy) * 1048576) div greatest(n * sxx - sx * sx, 1) as decimal(38,0))
             * ((sxa * 1048576) div greatest(na, 1) - (sxb * 1048576) div greatest(nb, 1))) div 1048576
          as bigint)""").as("delta_adj_q"))
  }

  private def cupedAdjustSql: String =
    """WITH b AS (SELECT (min(epoch_ns(ts) // 1000) + max(epoch_ns(ts) // 1000)) // 2 AS mid
      |           FROM events),
      |per AS (
      |  SELECT user_id,
      |    CAST(sum(CASE WHEN epoch_ns(ts) // 1000 <= (SELECT mid FROM b)
      |             THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS HUGEINT) AS x,
      |    CAST(sum(CASE WHEN epoch_ns(ts) // 1000 > (SELECT mid FROM b)
      |             THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS HUGEINT) AS y
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |armed AS (
      |  SELECT CASE WHEN ((user_id % 2147483648) * 2654435761) % 4294967296
      |              < 2147483648 THEN 'A' ELSE 'B' END AS arm, x, y
      |  FROM per),
      |a AS (SELECT CAST(count(*) AS HUGEINT) AS n,
      |        sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx,
      |        CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS HUGEINT) AS na,
      |        sum(CASE WHEN arm = 'A' THEN x ELSE 0 END) AS sxa,
      |        sum(CASE WHEN arm = 'A' THEN y ELSE 0 END) AS sya,
      |        CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS HUGEINT) AS nb,
      |        sum(CASE WHEN arm = 'B' THEN x ELSE 0 END) AS sxb,
      |        sum(CASE WHEN arm = 'B' THEN y ELSE 0 END) AS syb
      |      FROM armed)
      |SELECT CAST(n AS BIGINT) AS n_users,
      |  CAST(((n * sxy - sx * sy) * 1048576) // greatest(n * sxx - sx * sx, 1) AS BIGINT) AS theta_q,
      |  CAST((sya * 1048576) // greatest(na, 1) AS BIGINT) AS mean_y_a_q,
      |  CAST((syb * 1048576) // greatest(nb, 1) AS BIGINT) AS mean_y_b_q,
      |  CAST((sya * 1048576) // greatest(na, 1)
      |       - (syb * 1048576) // greatest(nb, 1) AS BIGINT) AS delta_raw_q,
      |  CAST((sya * 1048576) // greatest(na, 1) - (syb * 1048576) // greatest(nb, 1)
      |       - ((((n * sxy - sx * sy) * 1048576) // greatest(n * sxx - sx * sx, 1))
      |          * ((sxa * 1048576) // greatest(na, 1)
      |             - (sxb * 1048576) // greatest(nb, 1))) // 1048576 AS BIGINT) AS delta_adj_q
      |FROM a""".stripMargin

  /** Two-sample Kolmogorov–Smirnov distance between the lifetime-spend
    * distributions of two market segments — the NUMERIC
    * distribution-drift companion to the categorical
    * [[categoryDrift]]: did AUTOMOBILE customers' spend distribution
    * shift against BUILDING's? D is computed EXACTLY on a
    * [[KsBuckets]]-bucket ECDF lattice (bucket = (cents·K) div
    * (max+1), the documented bucketed-KS semantics — bucket
    * boundaries are where a step ECDF can differ most, and the
    * lattice makes both engines compare identical integers):
    * `d_q = max |c1·2²⁰ div n1 − c2·2²⁰ div n2|` over cumulative
    * bucket counts, plus the classic α=0.05 rejection flag against
    * `1.358·√((n1+n2)/(n1·n2))` (one IEEE comparison of
    * exact-integer-derived doubles — the [[autocorrLag7]]
    * discipline). Scale shape: fact folds to |customers| once
    * (partial+final), the max-spend anchor is one scalar aggregate
    * (the [[categoryDrift]] precedent), bucket counts fold to ≤ K
    * rows, and the cumulative sum is the lorenz-style triangular
    * broadcast join over K·(K+1)/2 metadata rows — no global sort,
    * no single-partition window. */
  def ksTest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val segs = Seq("AUTOMOBILE", "BUILDING")
    val per = Tables.orders(spark, dir)
      .select(col("o_custkey"),
        expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)").as("cents"))
      .groupBy(col("o_custkey")).agg(sum(col("cents")).as("m"))
      .join(Tables.customer(spark, dir)
        .filter(col("c_mktsegment").isin(segs: _*))
        .select(col("c_custkey"), col("c_mktsegment").as("seg")),
        col("o_custkey") === col("c_custkey"))
      .select(col("seg"), col("m"))
      .persistScoped()
    // degenerate corpus (no AUTOMOBILE/BUILDING customers, or no
    // orders): max(m) is NULL — getLong would NPE. The 0L fallback is
    // inert (b is empty, so the bucket expression never evaluates)
    // and the downstream lineage then lands on the same single
    // (NULL, NULL, NULL, 0) row the DuckDB oracle emits.
    val mxRow = per.agg(max(col("m"))).head()
    val mx = if (mxRow.isNullAt(0)) 0L else mxRow.getLong(0)
    val b = per
      .select(col("seg"),
        expr(s"(m * $KsBuckets) div ${mx + 1L}").as("b"))
      .groupBy(col("b"))
      .agg(sum(when(col("seg") === segs.head, 1L).otherwise(0L)).as("x1"),
        sum(when(col("seg") === segs.last, 1L).otherwise(0L)).as("x2"))
      .persistScoped()
    val pairs = (for { hi <- 0L until KsBuckets; lo <- 0L to hi } yield (hi, lo))
      .toDF("hb", "b")
    val cum = broadcast(pairs).join(b, "b")
      .groupBy(col("hb"))
      .agg(sum(col("x1")).as("c1"), sum(col("x2")).as("c2"))
    val tot = b.agg(sum(col("x1")).as("n1"), sum(col("x2")).as("n2"))
    ScalarJoin.attachScalar(cum, col("c1") + col("c2"), tot, col("n1") + col("n2"))
      .select(
        abs(expr("(c1 * cast(1048576 as bigint)) div n1") -
          expr("(c2 * cast(1048576 as bigint)) div n2")).as("dq"),
        col("n1"), col("n2"))
      .agg(max(col("dq")).as("d_q"), max(col("n1")).as("n1"), max(col("n2")).as("n2"))
      .withColumn("reject_05",
        when(col("d_q").cast("double") / lit(1048576.0)
          > lit(1.358) * sqrt((col("n1") + col("n2")).cast("double")
            / (col("n1") * col("n2")).cast("double")), 1L).otherwise(0L))
  }

  private[operators] val KsBuckets = 256L

  private def ksTestSql: String =
    """WITH per AS (
      |  SELECT c.c_mktsegment AS seg,
      |    CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS m
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  WHERE c.c_mktsegment IN ('AUTOMOBILE', 'BUILDING')
      |  GROUP BY o.o_custkey, c.c_mktsegment),
      |mx AS (SELECT max(m) AS mx FROM per),
      |b AS (SELECT (m * 256) // (mx + 1) AS b,
      |        CAST(sum(CASE WHEN seg = 'AUTOMOBILE' THEN 1 ELSE 0 END) AS BIGINT) AS x1,
      |        CAST(sum(CASE WHEN seg = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT) AS x2
      |      FROM per, mx GROUP BY 1),
      |grid AS (SELECT unnest(range(256)) AS hb),
      |cum AS (SELECT g.hb, CAST(sum(b.x1) AS BIGINT) AS c1, CAST(sum(b.x2) AS BIGINT) AS c2
      |        FROM grid g JOIN b ON b.b <= g.hb GROUP BY 1),
      |tot AS (SELECT CAST(sum(x1) AS BIGINT) AS n1, CAST(sum(x2) AS BIGINT) AS n2 FROM b),
      |d AS (SELECT max(abs((c1 * 1048576) // n1 - (c2 * 1048576) // n2)) AS d_q,
      |        max(n1) AS n1, max(n2) AS n2
      |      FROM cum, tot)
      |SELECT CAST(d_q AS BIGINT) AS d_q, n1, n2,
      |  CAST(CASE WHEN CAST(d_q AS DOUBLE) / 1048576.0
      |            > 1.358 * sqrt(CAST(n1 + n2 AS DOUBLE) / CAST(n1 * n2 AS DOUBLE))
      |       THEN 1 ELSE 0 END AS BIGINT) AS reject_05
      |FROM d""".stripMargin

  /** Monthly return-rate trend — the quality KPI a merchandising org
    * tracks per month: returned-line share of all lines on the 2²⁰
    * lattice plus its month-over-month delta. Fold-below-window (the
    * [[drawdown]] contract): the fact stream folds to |months| rows
    * in one partial+final conditional aggregate; the delta window
    * orders metadata only. Deltas are exact lattice differences (the
    * first month's delta is 0 by the coalesce, a pinned convention —
    * NULL would make the row incomparable cross-engine). */
  def returnRateTrend(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("m").asc)
    Tables.lineitem(spark, dir)
      .select(
        expr("(cast(datediff(cast(l_shipdate as date), date'1970-01-01') as bigint)) div 30")
          .as("m"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("ret"))
      .groupBy(col("m"))
      .agg(count(lit(1)).as("n_items"), sum(col("ret")).as("n_returned"))
      .withColumn("rate_q",
        expr("cast((n_returned * cast(1048576 as bigint)) div n_items as bigint)"))
      .withColumn("rate_delta_q",
        coalesce(col("rate_q") - lag(col("rate_q"), 1).over(w), lit(0L)))
  }

  private def returnRateTrendSql: String =
    """WITH g AS (
      |  SELECT (CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT)) // 30 AS m,
      |    count(*) AS n_items,
      |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned
      |  FROM lineitem GROUP BY 1),
      |r AS (SELECT m, n_items, n_returned,
      |        CAST((n_returned * 1048576) // n_items AS BIGINT) AS rate_q
      |      FROM g)
      |SELECT m, n_items, n_returned, rate_q,
      |  coalesce(rate_q - lag(rate_q, 1) OVER (ORDER BY m), 0) AS rate_delta_q
      |FROM r""".stripMargin

  /** Hierarchical contribution shares — the percent-of-parent OLAP
    * readout [[aggRollup]]'s level rows don't give directly: per
    * nation, its revenue, its share WITHIN its region, and its
    * region's share of the world, all on the 2²⁰ lattice. One fact
    * fold to nation grain (partial+final); region and world totals
    * are |nations|-row re-aggregates of that fold attached by
    * broadcast joins (the [[tradeMatrix]] row-total pattern) — the
    * fact table is read once. */
  def rollupShare(spark: SparkSession, dir: String): DataFrame = {
    val byNation = Tables.lineitem(spark, dir)
      .select(col("l_suppkey"),
        expr("cast(floor(l_extendedprice * 100 + 0.5) as bigint)").as("cents"))
      .join(Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey"))
      .agg(sum(col("cents")).as("cents"))
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey").as("s_nationkey"), col("n_name").as("nation"),
          col("n_regionkey"))), "s_nationkey")
      .join(broadcast(Tables.region(spark, dir)
        .select(col("r_regionkey").as("n_regionkey"), col("r_name").as("region"))),
        "n_regionkey")
      .persistScoped()
    val byRegion = byNation.groupBy(col("region").as("rg"))
      .agg(sum(col("cents").cast(DecimalType(38, 0))).as("r_cents"))
    val world = byNation.agg(sum(col("cents").cast(DecimalType(38, 0))).as("w_cents"))
    ScalarJoin.attachScalar(
      byNation.join(broadcast(byRegion), col("region") === col("rg")),
      col("cents"), world, col("w_cents"))
      .select(col("nation"), col("region"), col("cents"),
        expr("cast((cast(cents as decimal(38,0)) * 1048576) div r_cents as bigint)")
          .as("in_region_q"),
        expr("cast((r_cents * 1048576) div w_cents as bigint)").as("region_share_q"))
  }

  private def rollupShareSql: String =
    """WITH n AS (
      |  SELECT nn.n_name AS nation, r.r_name AS region,
      |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation nn ON s_nationkey = nn.n_nationkey
      |  JOIN region r ON nn.n_regionkey = r.r_regionkey
      |  GROUP BY 1, 2),
      |rg AS (SELECT region, CAST(sum(cents) AS HUGEINT) AS r_cents FROM n GROUP BY 1),
      |w AS (SELECT CAST(sum(cents) AS HUGEINT) AS w_cents FROM n)
      |SELECT n.nation, n.region, n.cents,
      |  CAST((CAST(n.cents AS HUGEINT) * 1048576) // rg.r_cents AS BIGINT) AS in_region_q,
      |  CAST((rg.r_cents * 1048576) // (SELECT w_cents FROM w) AS BIGINT) AS region_share_q
      |FROM n JOIN rg USING (region)""".stripMargin

  /** Seasonal-naive forecast backtest — the sanity loop a
    * demand-planning team closes before trusting any forecast:
    * forecast(m) = rev(m−12) × (Σ rev(m−3..m−1) div Σ rev(m−15..m−13))
    * — last year's same month, re-leveled by the trailing-quarter
    * growth ratio — scored in-sample with the absolute percentage
    * error on the 2²⁰ lattice. All arithmetic is integral: the
    * growth ratio is one 2²⁰-scaled DECIMAL(38) division, the
    * forecast one multiply-then-unscale, APE an exact quotient of
    * cents. Only months with the full 15-month history emit (the lag
    * and both trailing windows non-null — a partial-history forecast
    * is a different contract). Fold-below-window: the fact stream
    * folds to |months| rows first; every window orders metadata. */
  def forecastBacktest(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("m").asc)
    val recent = Window.orderBy(col("m").asc).rowsBetween(-3, -1)
    val yearAgo = Window.orderBy(col("m").asc).rowsBetween(-15, -13)
    Tables.orders(spark, dir)
      .select(
        expr("(cast(datediff(cast(o_orderdate as date), date'1970-01-01') as bigint)) div 30")
          .as("m"),
        expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)").as("cents"))
      .groupBy(col("m")).agg(sum(col("cents")).as("actual"))
      .withColumn("base", lag(col("actual"), 12).over(w))
      .withColumn("s_recent", sum(col("actual")).over(recent))
      .withColumn("s_yearago", sum(col("actual")).over(yearAgo))
      .withColumn("n_hist", count(lit(1)).over(Window.orderBy(col("m").asc)
        .rowsBetween(-15, -1)))
      .filter(col("n_hist") === 15L && col("base").isNotNull)
      .withColumn("ratio_q",
        expr("cast((cast(s_recent as decimal(38,0)) * 1048576) div s_yearago as bigint)"))
      .withColumn("forecast",
        expr("cast((cast(base as decimal(38,0)) * ratio_q) div 1048576 as bigint)"))
      .select(col("m"), col("actual"), col("forecast"),
        expr("cast((abs(actual - forecast) * cast(1048576 as decimal(38,0))) div actual as bigint)")
          .as("ape_q"))
  }

  private def forecastBacktestSql: String =
    """WITH g AS (
      |  SELECT (CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)) // 30 AS m,
      |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS actual
      |  FROM orders GROUP BY 1),
      |x AS (SELECT m, actual,
      |        lag(actual, 12) OVER win AS base,
      |        sum(actual) OVER (ORDER BY m ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS s_recent,
      |        sum(actual) OVER (ORDER BY m ROWS BETWEEN 15 PRECEDING AND 13 PRECEDING) AS s_yearago,
      |        count(*) OVER (ORDER BY m ROWS BETWEEN 15 PRECEDING AND 1 PRECEDING) AS n_hist
      |      FROM g WINDOW win AS (ORDER BY m)),
      |f AS (SELECT m, actual,
      |        CAST((CAST(base AS HUGEINT)
      |              * ((CAST(s_recent AS HUGEINT) * 1048576) // s_yearago))
      |             // 1048576 AS BIGINT) AS forecast
      |      FROM x WHERE n_hist = 15 AND base IS NOT NULL)
      |SELECT m, actual, forecast,
      |  CAST((abs(actual - forecast) * CAST(1048576 AS HUGEINT)) // actual AS BIGINT) AS ape_q
      |FROM f""".stripMargin

  /** The SES recurrence over a (day, cents) series, factored for the
    * spec's planted hand-checks: s₁ = c₁, s_d = (3·s_{d−1} + c_d) div 4
    * (α = 1/4 as an exact dyadic; the recurrence stays non-negative
    * from non-negative cents, so Long `/` and DuckDB integer `//`
    * agree trivially), fcst_d = s_{d−1} (the one-step-ahead
    * forecast), err = |c − fcst|.
    * Returns (day, cents, smooth, fcst, abs_err) in day order. */
  private[operators] def sesScan(daily: Seq[(Long, Long)]): Seq[(Long, Long, Long, Long, Long)] = {
    var smooth = 0L
    daily.sortBy(_._1).zipWithIndex.map { case ((day, cents), i) =>
      val fcst = if (i == 0) cents else smooth
      smooth = if (i == 0) cents else (3L * smooth + cents) / 4L
      (day, cents, smooth, fcst, math.abs(cents - fcst))
    }
  }

  /** Simple-exponential-smoothing one-step backtest over the daily
    * revenue series — the SMOOTHING-RECURRENCE primitive of the
    * forecasting family, beside [[forecastBacktest]]'s seasonal-naive
    * model: s_d = α·c_d + (1−α)·s_{d−1} with α = 1/4 kept exact as
    * the integer recurrence s_d = (3·s_{d−1} + c_d) div 4 (a float α
    * would drift between engines; the dyadic lattice IS the
    * cross-engine contract — the lsh_threshold_plan rule), scored by
    * the one-step-ahead absolute error |c_d − s_{d−1}|. A recurrence
    * is inherently sequential: the fact stream folds partial+final to
    * |days| rows (≤ ~2.5k at ANY corpus size — the date domain, not
    * the row count, bounds it) and the scan runs in driver metadata
    * ([[sesScan]], the ltv_curve collect rationale); the oracle
    * replays it as a DuckDB recursive CTE. The returned frame is a
    * LocalTableScan (the pca_power rule). */
  def sesForecast(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.orders(spark, dir)
      .select(
        expr("cast(datediff(cast(o_orderdate as date), date'1970-01-01') as bigint)")
          .as("day"),
        expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)").as("cents"))
      .groupBy(col("day")).agg(sum(col("cents")).as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    sesScan(daily).toDF("day", "cents", "smooth", "fcst", "abs_err")
  }

  private def sesForecastSql: String =
    """WITH RECURSIVE d AS (
      |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
      |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |i AS (SELECT day, cents, row_number() OVER (ORDER BY day ASC) AS rn FROM d),
      |s AS (
      |  SELECT rn, day, cents, cents AS smooth FROM i WHERE rn = 1
      |  UNION ALL
      |  SELECT i.rn, i.day, i.cents, (3 * s.smooth + i.cents) // 4
      |  FROM s JOIN i ON i.rn = s.rn + 1)
      |SELECT day, cents, CAST(smooth AS BIGINT) AS smooth,
      |  CAST(coalesce(lag(smooth) OVER (ORDER BY rn), cents) AS BIGINT) AS fcst,
      |  CAST(abs(cents - coalesce(lag(smooth) OVER (ORDER BY rn), cents)) AS BIGINT) AS abs_err
      |FROM s""".stripMargin

  /** Cumulative LTV curve by tenure month — the "how much is a
    * customer worth after t months" readout a growth team plans
    * acquisition spend against: spend folds to (customer, tenure)
    * where tenure = order month − the customer's first-order month,
    * then per tenure the curve reports how many customers are
    * OBSERVABLE at that tenure (first month early enough for t
    * months of history — censoring must divide by the at-risk mass,
    * not the whole base), the spend landing at that tenure, the
    * cumulative spend through it, and the per-observable-customer
    * cumulative average on the cent lattice. Scale shape: two
    * chained partial+final folds (fact → per-customer-month → per
    * tenure), the observability mass one |cohorts|-row broadcast
    * fold, cumulation the lorenz-style triangular broadcast over the
    * |tenures| grid, and the max-month anchor a scalar aggregate
    * (the [[categoryDrift]] precedent). No window at all. */
  def ltvCurve(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val om = Tables.orders(spark, dir)
      .select(col("o_custkey"),
        expr("(cast(datediff(cast(o_orderdate as date), date'1970-01-01') as bigint)) div 30")
          .as("m"),
        expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)").as("cents"))
      .groupBy(col("o_custkey"), col("m")).agg(sum(col("cents")).as("cents"))
      .persistScoped()
    val first = om.groupBy(col("o_custkey")).agg(min(col("m")).as("fm"))
      .persistScoped()
    // empty orders fixture → max(m) NULL; 0L keeps the lineage alive
    // and every downstream join is empty, matching the oracle's
    // empty result (the ks_test degenerate-corpus rule)
    val maxMRow = om.agg(max(col("m"))).head()
    val maxM = if (maxMRow.isNullAt(0)) 0L else maxMRow.getLong(0)
    val perTenure = om.join(first, "o_custkey")
      .select((col("m") - col("fm")).as("t"), col("cents"))
      .groupBy(col("t")).agg(sum(col("cents")).as("cents"))
      .persistScoped()
    val observable = first
      .select((lit(maxM) - col("fm")).as("maxt"))
      .groupBy(col("maxt")).agg(count(lit(1)).as("nc"))
    val tGrid = perTenure.select(col("t"))
    val obsAt = ScalarJoin.broadcastCross(tGrid, col("t") + lit(1L),
      observable, col("nc"))
      .filter(col("maxt") >= col("t"))
      .groupBy(col("t")).agg(sum(col("nc")).as("observable"))
    // |tenures| ≤ |months| — driver metadata (the lorenz-grid
    // precedent), so the triangular pair grid is an equi-join, not a
    // BNLJ range join
    val ts = perTenure.select(col("t")).as[Long].collect().sorted
    val pairs = ts.flatMap(hi => ts.filter(_ <= hi).map(lo => (hi, lo))).toSeq
      .toDF("hb", "b")
    val cum = broadcast(pairs)
      .join(perTenure.select(col("t").as("b"), col("cents").as("c2")), "b")
      .groupBy(col("hb")).agg(sum(col("c2").cast(DecimalType(38, 0))).as("cum_cents"))
    perTenure.join(obsAt, "t")
      .join(broadcast(cum), col("t") === col("hb"))
      .select(col("t"), col("observable"), col("cents"),
        col("cum_cents").cast("long").as("cum_cents"),
        expr("cast(cum_cents div observable as bigint)").as("avg_cum_cents"))
  }

  private def ltvCurveSql: String =
    """WITH om AS (
      |  SELECT o_custkey,
      |    (CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)) // 30 AS m,
      |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY 1, 2),
      |fst AS (SELECT o_custkey, min(m) AS fm FROM om GROUP BY 1),
      |mx AS (SELECT max(m) AS maxm FROM om),
      |pt AS (SELECT om.m - fst.fm AS t, CAST(sum(om.cents) AS BIGINT) AS cents
      |       FROM om JOIN fst USING (o_custkey) GROUP BY 1),
      |obs AS (SELECT pt.t, count(*) AS observable
      |        FROM pt, fst, mx WHERE (mx.maxm - fst.fm) >= pt.t GROUP BY pt.t),
      |cum AS (SELECT a.t AS hb, CAST(sum(b.cents) AS HUGEINT) AS cum_cents
      |        FROM pt a JOIN pt b ON b.t <= a.t GROUP BY 1)
      |SELECT pt.t, obs.observable, pt.cents,
      |  CAST(cum.cum_cents AS BIGINT) AS cum_cents,
      |  CAST(cum.cum_cents // obs.observable AS BIGINT) AS avg_cum_cents
      |FROM pt JOIN obs USING (t) JOIN cum ON cum.hb = pt.t""".stripMargin

  /** ABC (Pareto-class) inventory classification of parts by revenue
    * — the supply-chain standard ("A-parts: the few that carry 70 %
    * of revenue; B: the next 20; C: the long tail"): parts rank by
    * exact cent revenue under the total order (revenue desc, key asc)
    * and classify by CUMULATIVE share — A while cum ≤ 70 % of total,
    * B while ≤ 90 %, else C (boundaries inclusive, cross-multiplied:
    * cum·10 ≤ tot·7 — no fraction lattice needed for a comparison).
    * Emits the 3-row class rollup (count, cents, revenue share on
    * 2²⁰).
    *
    * Scale shape — the distributed prefix sum: the |parts| fold gets
    * a RANGE-PARTITIONED sort (the [[globalBand]] machinery — never
    * a single-partition window), one lightweight pass collects the
    * per-partition sums (|partitions| numbers to the driver), their
    * scan becomes broadcast offsets, and a second pass stamps each
    * row's running total as offset + local prefix — exact BigInt
    * throughout, so cumulative cents can pass 2⁶³ at any corpus
    * size. DuckDB replays the same total order with a window sum. */
  def abcClass(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val per = Tables.lineitem(spark, dir)
      .select(col("l_partkey").as("key"),
        expr("cast(floor(l_extendedprice * 100 + 0.5) as bigint)").as("cents"))
      .groupBy(col("key")).agg(sum(col("cents")).as("x"))
      .persistScoped()
    val sorted = per.orderBy(col("x").desc, col("key").asc)
      .select(col("key"), col("x")).as[(Long, Long)].rdd
    sorted.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val partSums = sorted
      .mapPartitionsWithIndex { case (i, it) =>
        Iterator((i, it.foldLeft(BigInt(0))(_ + _._2).toString))
      }.collect().sortBy(_._1).map(s => BigInt(s._2))
    val offsets = partSums.scanLeft(BigInt(0))(_ + _)
    val tot = offsets.last
    val bcOff = spark.sparkContext.broadcast(offsets.map(_.toString))
    val totS = tot.toString
    val classified = sorted.mapPartitionsWithIndex { case (i, it) =>
      var run = BigInt(bcOff.value(i))
      val t = BigInt(totS)
      it.map { case (_, x) =>
        run += x
        val abc = if (run * 10 <= t * 7) "A"
        else if (run * 10 <= t * 9) "B" else "C"
        (abc, x)
      }
    }
    classified.toDF("abc", "x")
      .groupBy(col("abc"))
      .agg(count(lit(1)).as("n_parts"), sum(col("x")).as("cents"))
      .select(col("abc"), col("n_parts"), col("cents"),
        expr(s"cast((cast(cents as decimal(38,0)) * 1048576) div cast('$totS' as decimal(38,0)) as bigint)")
          .as("share_q"))
  }

  private def abcClassSql: String =
    """WITH per AS (
      |  SELECT l_partkey AS key,
      |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
      |  FROM lineitem GROUP BY 1),
      |t AS (SELECT CAST(sum(x) AS HUGEINT) AS tot FROM per),
      |r AS (SELECT key, x,
      |        sum(CAST(x AS HUGEINT)) OVER (ORDER BY x DESC, key ASC
      |          ROWS UNBOUNDED PRECEDING) AS cum
      |      FROM per),
      |c AS (SELECT CASE WHEN cum * 10 <= tot * 7 THEN 'A'
      |                  WHEN cum * 10 <= tot * 9 THEN 'B'
      |                  ELSE 'C' END AS abc, x, tot
      |      FROM r, t)
      |SELECT abc, CAST(count(*) AS BIGINT) AS n_parts,
      |  CAST(sum(x) AS BIGINT) AS cents,
      |  CAST((CAST(sum(x) AS HUGEINT) * 1048576) // tot AS BIGINT) AS share_q
      |FROM c GROUP BY abc, tot""".stripMargin

  /** Monthly repeat-order rate — the loyalty KPI ("what share of this
    * month's orders came from customers we'd already served"): each
    * order ranks within its customer's lifetime by (date, orderkey),
    * rank ≥ 2 marks a repeat, and months roll up count / repeats /
    * repeat share on the 2²⁰ lattice. One customer-keyed exchange
    * feeds the lifetime window (partition by o_custkey — distributed,
    * never global), then the month rollup partial+final-combines;
    * months are metadata-scale. */
  def repeatRate(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("od").asc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        expr("cast(datediff(cast(o_orderdate as date), date'1970-01-01') as bigint)").as("od"))
      .withColumn("rn", row_number().over(w))
      .groupBy(expr("od div 30").as("m"))
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("rn") >= 2, 1L).otherwise(0L)).as("n_repeat"))
      .withColumn("repeat_share_q",
        expr("cast((n_repeat * cast(1048576 as bigint)) div n_orders as bigint)"))
  }

  private def repeatRateSql: String =
    """WITH o AS (
      |  SELECT o_custkey, o_orderkey,
      |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS od
      |  FROM orders),
      |r AS (SELECT od,
      |        row_number() OVER (PARTITION BY o_custkey ORDER BY od, o_orderkey) AS rn
      |      FROM o)
      |SELECT od // 30 AS m, count(*) AS n_orders,
      |  CAST(sum(CASE WHEN rn >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_repeat,
      |  CAST((sum(CASE WHEN rn >= 2 THEN 1 ELSE 0 END) * 1048576) // count(*) AS BIGINT)
      |    AS repeat_share_q
      |FROM r GROUP BY 1""".stripMargin

  /** Order-size histogram — lines-per-order distribution plus each
    * size's share of all orders on the 2²⁰ lattice (the order-shape
    * profile capacity planning and fraud screens read). Two chained
    * partial+final folds (fact → |orders| → |sizes|); the total
    * attaches by [[ScalarJoin]] broadcast; output is ≤ max-size rows
    * at any corpus scale. */
  def orderSizeHist(spark: SparkSession, dir: String): DataFrame = {
    val g = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n_lines"))
      .groupBy(col("n_lines")).agg(count(lit(1)).as("n_orders"))
      .persistScoped()
    val tot = g.agg(sum(col("n_orders")).as("nt"))
    ScalarJoin.attachScalar(g, col("n_orders"), tot, col("nt"))
      .select(col("n_lines"), col("n_orders"),
        expr("cast((n_orders * cast(1048576 as bigint)) div nt as bigint)").as("share_q"))
  }

  private def orderSizeHistSql: String =
    """WITH per AS (SELECT l_orderkey, count(*) AS n_lines FROM lineitem GROUP BY 1),
      |g AS (SELECT n_lines, count(*) AS n_orders FROM per GROUP BY 1),
      |t AS (SELECT CAST(sum(n_orders) AS BIGINT) AS nt FROM g)
      |SELECT CAST(n_lines AS BIGINT) AS n_lines, CAST(n_orders AS BIGINT) AS n_orders,
      |  CAST((n_orders * 1048576) // nt AS BIGINT) AS share_q
      |FROM g, t""".stripMargin

  // fixture orders span 1995–2001 at every SF — two full interior
  // years so both slices are populated and the matrix is dense
  private[operators] val MigYearA = 1996
  private[operators] val MigYearB = 1997

  /** Customer spend-quintile migration matrix [[MigYearA]] →
    * [[MigYearB]] — the segment-transition table a CRM org reads for
    * upgrade/churn dynamics ("how many Q5 whales fell to Q2"): per
    * year, active customers band into exact spend quintiles via the
    * [[globalBand]] rank lattice (band 1 = lowest spend); customers
    * inactive in a year carry band 0 (entered / lapsed); the output
    * is the ≤ 6×6 transition count matrix. Scale shape: two
    * year-sliced fact folds, two DIMENSION-scale distributed sorts
    * (globalBand — no global window), one full-outer key join, and a
    * metadata-sized rollup. */
  def segmentMigration(spark: SparkSession, dir: String): DataFrame = {
    def spend(y: Int) = Tables.orders(spark, dir)
      .filter(expr(s"year(cast(o_orderdate as date)) = $y"))
      .select(col("o_custkey").as("key"),
        expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)").as("cents"))
      .groupBy(col("key")).agg(sum(col("cents")).as("x"))
      .persistScoped()
    val pa = spend(MigYearA)
    val pb = spend(MigYearB)
    val ba = globalBand(pa, "x", pa.count(), "band_a")
    val bb = globalBand(pb, "x", pb.count(), "band_b")
    ba.join(bb, Seq("key"), "full_outer")
      .select(coalesce(col("band_a"), lit(0L)).as("band_a"),
        coalesce(col("band_b"), lit(0L)).as("band_b"))
      .groupBy(col("band_a"), col("band_b"))
      .agg(count(lit(1)).as("n_customers"))
  }

  private def segmentMigrationSql: String = {
    def yearCte(tag: String, y: Int) =
      s"""c$tag AS (
         |  SELECT o_custkey AS key,
         |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
         |  FROM orders WHERE year(CAST(o_orderdate AS DATE)) = $y GROUP BY 1),
         |n$tag AS (SELECT count(*) AS n FROM c$tag),
         |r$tag AS (SELECT key,
         |    CAST(((row_number() OVER (ORDER BY x ASC, key ASC) - 1) * $RfmBands) // n + 1
         |      AS BIGINT) AS band_$tag
         |  FROM c$tag, n$tag)""".stripMargin
    s"""WITH ${yearCte("a", MigYearA)},
       |${yearCte("b", MigYearB)}
       |SELECT COALESCE(ra.band_a, 0) AS band_a, COALESCE(rb.band_b, 0) AS band_b,
       |  count(*) AS n_customers
       |FROM ra FULL OUTER JOIN rb ON ra.key = rb.key
       |GROUP BY 1, 2""".stripMargin
  }

  /** Monthly DAU/MAU stickiness — the engagement ratio every consumer
    * dashboard headlines (Σ daily actives over the month ÷ days·MAU,
    * on the 2²⁰ lattice — 2²⁰ = every user active every day): the
    * event stream folds ONCE to distinct (user, day), daily actives
    * and monthly actives both derive from that fold, and months join
    * at metadata scale. Exact integers end to end. */
  def stickiness(spark: SparkSession, dir: String): DataFrame = {
    val du = Tables.events(spark, dir)
      .select(col("user_id"),
        expr("cast(datediff(cast(ts as date), date'1970-01-01') as bigint)").as("d"))
      .distinct().persistScoped()
    val mdau = du.groupBy(col("d")).agg(count(lit(1)).as("dau"))
      .groupBy(expr("d div 30").as("m"))
      .agg(sum(col("dau")).as("sum_dau"), count(lit(1)).as("n_days"))
    val mau = du.select(expr("d div 30").as("m"), col("user_id")).distinct()
      .groupBy(col("m")).agg(count(lit(1)).as("mau"))
    mdau.join(mau, "m")
      .select(col("m"), col("n_days"), col("sum_dau"), col("mau"),
        expr("cast((sum_dau * cast(1048576 as bigint)) div (n_days * mau) as bigint)")
          .as("stickiness_q"))
  }

  private def stickinessSql: String =
    """WITH du AS (
      |  SELECT DISTINCT user_id,
      |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d
      |  FROM events),
      |dau AS (SELECT d, count(*) AS dau FROM du GROUP BY 1),
      |md AS (SELECT d // 30 AS m, CAST(sum(dau) AS BIGINT) AS sum_dau,
      |         count(*) AS n_days
      |       FROM dau GROUP BY 1),
      |mau AS (SELECT m, count(*) AS mau FROM (
      |          SELECT DISTINCT d // 30 AS m, user_id FROM du) GROUP BY 1)
      |SELECT md.m, CAST(n_days AS BIGINT) AS n_days, sum_dau,
      |  CAST(mau AS BIGINT) AS mau,
      |  CAST((sum_dau * 1048576) // (n_days * mau) AS BIGINT) AS stickiness_q
      |FROM md JOIN mau USING (m)""".stripMargin

  /** Inter-arrival time profile per event type — discrete p50/p90 of
    * the seconds between a user's consecutive same-type events (the
    * cadence baseline behind rate alerting and bot screens). Gaps are
    * exact epoch-second differences over a (type, user)-keyed window;
    * the percentile machinery is fold-below-window (the [[drawdown]]
    * contract): gaps fold to (type, gap, count) FIRST, the per-type
    * cumulative orders only the folded distinct-gap rows, and the
    * nearest-rank cut is a cross-multiplied comparison (cum·2 ≥ n for
    * p50 — no fraction, no interpolation; both engines pick the
    * identical integer). */
  def eventInterarrival(spark: SparkSession, dir: String): DataFrame = {
    // order by the TRUNCATED second (+ event_id tiebreak), not raw
    // ts: sub-second ordering is invisible after the truncation, and
    // the oracle must replay the identical sequence
    val w = Window.partitionBy(col("event_type"), col("user_id"))
      .orderBy(col("s").asc, col("event_id").asc)
    val gaps = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"), col("event_id"),
        col("ts").cast("long").as("s"))
      .withColumn("gap_s", col("s") - lag(col("s"), 1).over(w))
      .filter(col("gap_s").isNotNull)
      .groupBy(col("event_type"), col("gap_s")).agg(count(lit(1)).as("c"))
      .persistScoped()
    val tot = gaps.groupBy(col("event_type")).agg(sum(col("c")).as("n_gaps"))
    val w2 = Window.partitionBy(col("event_type")).orderBy(col("gap_s").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gaps.withColumn("cum", sum(col("c")).over(w2))
      .join(broadcast(tot), "event_type")
      .groupBy(col("event_type"), col("n_gaps"))
      .agg(min(when(col("cum") * 2 >= col("n_gaps"), col("gap_s"))).as("p50_s"),
        min(when(col("cum") * 10 >= col("n_gaps") * 9, col("gap_s"))).as("p90_s"))
      .select(col("event_type"), col("n_gaps"), col("p50_s"), col("p90_s"))
  }

  private def eventInterarrivalSql: String =
    """WITH e AS (
      |  SELECT event_type, user_id, event_id,
      |    epoch_us(ts) // 1000000 AS s
      |  FROM events),
      |g AS (SELECT event_type,
      |        s - lag(s) OVER (PARTITION BY event_type, user_id
      |          ORDER BY s, event_id) AS gap_s
      |      FROM e),
      |f AS (SELECT event_type, gap_s, count(*) AS c
      |      FROM g WHERE gap_s IS NOT NULL GROUP BY 1, 2),
      |t AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n_gaps FROM f GROUP BY 1),
      |cu AS (SELECT event_type, gap_s,
      |         sum(c) OVER (PARTITION BY event_type ORDER BY gap_s
      |           ROWS UNBOUNDED PRECEDING) AS cum
      |       FROM f)
      |SELECT cu.event_type, t.n_gaps,
      |  min(CASE WHEN cum * 2 >= n_gaps THEN gap_s END) AS p50_s,
      |  min(CASE WHEN cum * 10 >= n_gaps * 9 THEN gap_s END) AS p90_s
      |FROM cu JOIN t USING (event_type)
      |GROUP BY 1, 2""".stripMargin

  // ---- registry ----------------------------------------------------

  // TPC-H-shaped rows use bare ids (q1…q22): the driver captures
  // Bench's stdout in a 2000-char tail, and at 100 registered queries
  // the descriptive suffixes (q1_pricing, …, used through round 4)
  // no longer fit the line budget. CORRECTNESS_r04 names map 1:1
  // (q1_pricing→q1, q3_shipping→q3, q5_local_supplier→q5,
  // q7_volume→q7, q10_returns→q10, q4_priority→q4, q6_forecast→q6,
  // q12_priority→q12, q14_promo→q14, q19_disjunctive→q19,
  // q22_balance→q22, q18_volume→q18).
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1"  -> q1Pricing,
    "q2"  -> q2MinCost,
    "q3"  -> q3Shipping,
    "q4"  -> q4Priority,
    "q5"  -> q5LocalSupplier,
    "q6"  -> q6Forecast,
    "q7"  -> q7Volume,
    "q8"  -> q8MktShare,
    "q9"  -> q9Profit,
    "q10" -> q10Returns,
    "q11" -> q11Important,
    "q12" -> q12Priority,
    "q13" -> q13CustDist,
    "q14" -> q14Promo,
    "q15" -> q15TopSupplier,
    "q16" -> q16PartSupp,
    "q17" -> q17SmallQty,
    "q18" -> q18Volume,
    "q19" -> q19Disjunctive,
    "q20" -> q20Promotion,
    "q21" -> q21Waiting,
    "q22" -> q22Balance,
    "filter_project"   -> filterProject,
    "join_broadcast"   -> joinBroadcastDims,
    "join_semi"        -> joinSemi,
    "join_anti"        -> joinAnti,
    "join_left_agg"    -> joinLeftAgg,
    "join_full"        -> joinFullOuter,
    "agg_distinct"     -> aggDistinct,
    "agg_stats"        -> aggStats,
    "agg_median"       -> aggMedian,
    "agg_approx_quantile" -> aggApproxQuantile,
    "agg_quantile_disc" -> aggQuantileDisc,
    "poisson_bootstrap" -> poissonBootstrap,
    "twap"             -> twap,
    "window_ewma"      -> windowEwma,
    "simpson_diversity" -> simpsonDiversity,
    "feature_hash"     -> featureHash,
    "target_encode"    -> targetEncode,
    "linreg_trend"     -> linregTrend,
    "rfm_segment"      -> rfmSegment,
    "purchase_gaps"    -> purchaseGaps,
    "winsorized_mean"  -> winsorizedMean,
    "seasonal_profile" -> seasonalProfile,
    "autocorr_lag7" -> autocorrLag7,
    "interval_overlap" -> intervalOverlap,
    "skew_profile" -> skewProfile,
    "burst_detect" -> burstDetect,
    "sax_motifs" -> saxMotifs,
    "order_backlog" -> orderBacklog,
    "gap_survival" -> gapSurvival,
    "funnel_latency" -> funnelLatency,
    "session_conversion" -> sessionConversion,
    "gini_spend"       -> giniSpend,
    "decile_lift"      -> decileLift,
    "benford_first_digit" -> benfordDeviation,
    "pareto_share"     -> paretoShare,
    "discount_elasticity" -> discountElasticity,
    "ship_latency"     -> shipLatency,
    "spend_percentile" -> spendPercentile,
    "quantile_table"   -> quantileTable,
    "user_lifecycle"   -> userLifecycle,
    "price_volume_mix" -> priceVolumeMix,
    "supplier_hhi"     -> supplierHhi,
    "lorenz_curve"     -> lorenzCurve,
    "nation_cr1"       -> nationCr1,
    "priority_latency" -> priorityLatency,
    "mktseg_mix"       -> mktsegMix,
    "category_drift"   -> categoryDrift,
    "trade_matrix"     -> tradeMatrix,
    "churn_label"      -> churnLabel,
    "revenue_wow"      -> revenueWow,
    "type_jaccard"     -> typeJaccard,
    "drawdown"         -> drawdown,
    "dup_charges"      -> dupCharges,
    "bollinger_breach" -> bollingerBreach,
    "cross_corr"       -> crossCorr,
    "trade_reciprocity" -> tradeReciprocity,
    "ab_test"          -> abTest,
    "ks_test"          -> ksTest,
    "return_rate_trend" -> returnRateTrend,
    "rollup_share"     -> rollupShare,
    "forecast_backtest" -> forecastBacktest,
    "ltv_curve"        -> ltvCurve,
    "abc_class"        -> abcClass,
    "repeat_rate"      -> repeatRate,
    "order_size_hist"  -> orderSizeHist,
    "segment_migration" -> segmentMigration,
    "stickiness"       -> stickiness,
    "event_interarrival" -> eventInterarrival,
    "agg_approx_distinct" -> aggApproxDistinct,
    "agg_kmv_distinct" -> aggKmvDistinct,
    "kmv_set_ops"      -> kmvSetOps,
    "ivm_join"         -> ivmJoin,
    "ivm_agg"          -> ivmAgg,
    "markov_trans"     -> markovTrans,
    "cohort_retention" -> cohortRetention,
    "snapshot_diff"    -> snapshotDiff,
    "changepoint_mean" -> changepointMean,
    "read_corrupt_skip" -> readCorruptSkip,
    "partition_overwrite" -> partitionOverwrite,
    "sort_export"      -> sortExport,
    "gaps_islands"     -> gapsIslands,
    "interval_merge"   -> intervalMerge,
    "interval_coverage" -> intervalCoverage,
    "skyline"          -> skylineParts,
    "rolling_distinct" -> rollingDistinct,
    "anomaly_mad"      -> anomalyMad,
    "agg_rollup"       -> aggRollup,
    "agg_cube"         -> aggCube,
    "agg_grouping_sets" -> aggGroupingSets,
    "subquery_scalar"  -> subqueryScalar,
    "subquery_exists"  -> subqueryExists,
    "window_ntile"     -> windowNtile,
    "window_rank"      -> windowRank,
    "window_running"   -> windowRunning,
    "window_lag"       -> windowLag,
    "window_frames"    -> windowFrames,
    "topk_orders"      -> topkOrders,
    "set_union"        -> setUnion,
    "set_intersect"    -> setIntersect,
    "set_except"       -> setExcept,
    "set_except_a"     -> setExceptAll,
    "set_intersect_a"  -> setIntersectAll,
    "scalar_string"    -> scalarString,
    "scalar_date"      -> scalarDate,
    "scalar_math"      -> scalarMath,
    "scalar_try"       -> scalarTry,
    "scalar_try_agg"   -> scalarTryAgg,
    "agg_mode"         -> aggMode,
    "agg_corr"         -> aggCorr,
    "window_percent"   -> windowPercent,
    "window_range"     -> windowRange,
    "join_nullsafe"    -> joinNullSafe,
    "union_drift"      -> unionDrift,
    "agg_argmax"       -> aggArgmax,
    "forward_fill"     -> forwardFill,
    "json_events"      -> jsonEvents,
    "events_hourly"    -> eventsHourly,
    "zorder_cluster"   -> zorderCluster,
    "zorder_write"     -> zorderWrite,
    "zorder_skip"      -> zorderSkip,
    "join_salted"      -> joinSalted,
    "cdc_apply"        -> cdcApply,
    "join_runtime_filter" -> joinRuntimeFilter,
    "bloom_probe"      -> bloomProbe,
    "join_dpp"         -> joinDpp,
    "schema_evolution" -> schemaEvolution,
    "theilsen_trend"   -> theilsenTrend,
    "k_anonymity"      -> kAnonymity,
    "quantile_normalize" -> quantileNormalize,
    "jsonl_roundtrip"  -> jsonlRoundtrip,
    "orc_roundtrip"    -> orcRoundtrip,
    "observed_scan"    -> observedScan,
    "fano_factor"      -> fanoFactor,
    "kendall_tau"      -> kendallTau,
    "t_closeness"      -> tCloseness,
    "table_fingerprint" -> tableFingerprint,
    "auc_rank"         -> aucRank,
    "chi2_independence" -> chi2Independence,
    "cramers_v"        -> cramersV,
    "dp_histogram"     -> dpHistogram,
    "ses_forecast"     -> sesForecast,
    "runs_test"        -> runsTest,
    "ledger_recon"     -> ledgerRecon,
    "attribution_position" -> attributionPosition,
    "price_index"      -> priceIndex,
    "brand_loyalty"    -> brandLoyalty,
    "rolling_mode"     -> rollingMode,
    "decay_score"      -> decayScore,
    "parquet_bloom"    -> parquetBloom,
    "rand_response"    -> randResponse,
    "temporal_audit"   -> temporalAudit,
    "histogram2d"      -> histogram2d,
    "revenue_bridge"   -> revenueBridge,
    "single_source_parts" -> singleSourceParts,
    "agg_incremental"  -> aggIncremental,
    "resample_hourly"  -> resampleHourly,
    "anomaly_zscore"   -> anomalyZscore,
    "histogram"        -> histogramValues,
    "join_bucketed"    -> joinBucketed,
    "profile_table"    -> profileTable,
    "encoding_advisor" -> encodingAdvisor,
    "ref_integrity"    -> refIntegrity,
    "cuped_adjust"     -> cupedAdjust,
    "embargo_split"    -> embargoSplit,
    "profile_approx"   -> profileTableApprox,
    "funnel_steps"     -> funnelSteps,
    "variant_events"   -> variantEvents)

  private val DSUM_Q = "CAST(sum(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE)"
  private val DSUM_P = "CAST(sum(CAST(l_extendedprice AS DECIMAL(30,4))) AS DOUBLE)"
  private val REV =
    "CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(30,6))) AS DOUBLE)"

  // SQL-surface TPC-H shapes: ONE text drives both the Spark query
  // (via SqlViews) and the DuckDB oracle, so the two can never drift.
  private[operators] val Q2Sql =
    """SELECT p.p_type, p.p_partkey, p.p_name, p.p_retailprice
      |FROM part p
      |WHERE p.p_size <= 10 AND p.p_retailprice = (
      |  SELECT min(p2.p_retailprice) FROM part p2
      |  WHERE p2.p_type = p.p_type AND p2.p_size <= 10)""".stripMargin

  private[operators] val Q11Sql =
    s"""WITH val AS (
       |  SELECT l_partkey, $REV AS value
       |  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
       |  JOIN nation ON s_nationkey = n_nationkey
       |  WHERE n_name = 'NATION_1'
       |  GROUP BY l_partkey)
       |SELECT l_partkey, value FROM val
       |WHERE value > (
       |  SELECT 0.001 * $REV
       |  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
       |  JOIN nation ON s_nationkey = n_nationkey
       |  WHERE n_name = 'NATION_1')""".stripMargin

  private[operators] val Q17Sql =
    """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(30,4))) AS DOUBLE)/7.0 AS avg_yearly
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#12'
      |  AND l_quantity < (
      |    SELECT 0.2 * (CAST(sum(CAST(l2.l_quantity AS DECIMAL(30,4))) AS DOUBLE)/count(*))
      |    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin

  private[operators] val Q20Sql =
    """SELECT s_suppkey, s_name FROM supplier
      |WHERE s_suppkey IN (
      |  SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
      |  WHERE p_name LIKE 'red%'
      |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  GROUP BY l_suppkey
      |  HAVING CAST(sum(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE)/count(*) > 26.0)""".stripMargin

  private[operators] val Q21Sql =
    """SELECT s_name, count(*) AS numwait
      |FROM supplier
      |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |WHERE o_orderstatus = 'F'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l1.l_shipdate > TIMESTAMP '1997-06-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > TIMESTAMP '1997-06-01 00:00:00')
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name ASC
      |LIMIT 10""".stripMargin

  // generated, not hand-nested: one textual substitution per
  // shift+mask step, mirroring zorderCluster's Column chain
  private val ZorderSql: String = {
    def step(inner: String, shift: Int, mask: Long): String =
      s"((($inner) | (($inner) << $shift)) & $mask)"
    def spread(c: String): String =
      List((8, 16711935L), (4, 252645135L), (2, 858993459L), (1, 1431655765L))
        .foldLeft(s"($c & 65535)") { case (acc, (sh, m)) => step(acc, sh, m) }
    s"""WITH z AS (
       |  SELECT l_orderkey, l_partkey, l_linenumber,
       |    (${spread("l_orderkey")} | (${spread("l_partkey")} << 1)) AS zval
       |  FROM lineitem)
       |SELECT l_orderkey, l_partkey, l_linenumber, zval,
       |  zval // 67108864 AS zbucket
       |FROM z""".stripMargin
  }

  /** v1 of the CDC pair — shared by cdc_apply and snapshot_diff. */
  private val CdcApplySql: String =
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |  CASE WHEN o_orderkey % 100 = 3 THEN '1-URGENT' ELSE o_orderpriority END AS o_orderpriority,
        |  CASE WHEN o_orderkey % 100 = 3 THEN o_totalprice + 100.0 ELSE o_totalprice END AS o_totalprice
        |FROM orders WHERE o_orderkey % 100 <> 7
        |UNION ALL
        |SELECT o_orderkey + 100000000, o_custkey, 'N', o_orderpriority, o_totalprice
        |FROM orders WHERE o_orderkey % 100 = 5""".stripMargin

  val oracles: Map[String, String] = Map(
    "q2"  -> Q2Sql,
    "q11" -> Q11Sql,
    "q17" -> Q17Sql,
    "q20" -> Q20Sql,
    "q21" -> Q21Sql,
    "q8" ->
      s"""WITH vol AS (
         |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |    CAST(CASE WHEN n1.n_name = 'NATION_1'
         |         THEN l_extendedprice*(1-l_discount) ELSE 0.0 END AS DECIMAL(30,6)) AS nvol,
         |    CAST(l_extendedprice*(1-l_discount) AS DECIMAL(30,6)) AS tvol
         |  FROM lineitem
         |  JOIN orders ON o_orderkey = l_orderkey
         |  JOIN customer ON c_custkey = o_custkey
         |  JOIN supplier ON s_suppkey = l_suppkey
         |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |  JOIN region ON n2.n_regionkey = r_regionkey
         |  WHERE r_name = 'ASIA'
         |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
         |SELECT o_year,
         |  CAST(sum(nvol) AS DOUBLE) / CAST(sum(tvol) AS DOUBLE) AS mkt_share
         |FROM vol GROUP BY o_year""".stripMargin,
    "q9" ->
      s"""SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year, $REV AS profit
         |FROM lineitem
         |JOIN supplier ON s_suppkey = l_suppkey
         |JOIN part ON p_partkey = l_partkey
         |JOIN orders ON o_orderkey = l_orderkey
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE p_name LIKE '%red%'
         |GROUP BY 1, 2""".stripMargin,
    "q13" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey) cc
        |GROUP BY c_count""".stripMargin,
    "q15" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey, $REV AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, total_revenue
         |FROM supplier JOIN rev ON s_suppkey = l_suppkey
         |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)""".stripMargin,
    "q16" ->
      """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#1' AND p_size IN (1,5,9,14,19,23,36,45)
        |GROUP BY 1, 2, 3""".stripMargin,
    "q1" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  $DSUM_Q AS sum_qty,
         |  $DSUM_P AS sum_base_price,
         |  $REV AS sum_disc_price,
         |  CAST(sum(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(30,6))) AS DOUBLE) AS sum_charge,
         |  $DSUM_Q/count(*) AS avg_qty,
         |  $DSUM_P/count(*) AS avg_price,
         |  count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
         |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q3" ->
      s"""SELECT o_orderkey, o_orderdate, $REV AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY o_orderkey, o_orderdate
         |ORDER BY revenue DESC, o_orderkey ASC
         |LIMIT 10""".stripMargin,
    "q5" ->
      s"""SELECT n_name, $REV AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY n_name""".stripMargin,
    "q7" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  CAST(year(l_shipdate) AS BIGINT) AS l_year, $REV AS revenue
         |FROM supplier
         |JOIN lineitem ON s_suppkey = l_suppkey
         |JOIN orders ON o_orderkey = l_orderkey
         |JOIN customer ON c_custkey = o_custkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         |   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
         |GROUP BY 1, 2, 3""".stripMargin,
    "q10" ->
      s"""SELECT c_custkey, c_name, n_name, $REV AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
         |  AND l_returnflag = 'R'
         |GROUP BY 1, 2, 3
         |ORDER BY revenue DESC, c_custkey ASC
         |LIMIT 20""".stripMargin,
    // full replay of the KMV sketch: distinct 60-bit md5 hashes, the
    // k smallest per group via row_number, and the (k-1)·2⁶⁰/hₖ
    // estimator — every intermediate integral or exactly-rounded, so
    // the sketch itself is hash-gated
    "agg_kmv_distinct" ->
      """WITH hp AS (SELECT DISTINCT l_returnflag AS flag,
        |              CAST('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15) AS BIGINT) AS h
        |            FROM lineitem),
        |rp AS (SELECT flag, h, row_number() OVER (PARTITION BY flag ORDER BY h) AS rn FROM hp),
        |ap AS (SELECT flag, count(*) AS nk, max(h) AS hk FROM rp WHERE rn <= 64 GROUP BY flag),
        |ho AS (SELECT DISTINCT l_returnflag AS flag,
        |              CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15) AS BIGINT) AS h
        |            FROM lineitem),
        |ro AS (SELECT flag, h, row_number() OVER (PARTITION BY flag ORDER BY h) AS rn FROM ho),
        |ao AS (SELECT flag, count(*) AS nk, max(h) AS hk FROM ro WHERE rn <= 64 GROUP BY flag)
        |SELECT ap.flag AS l_returnflag,
        |  CASE WHEN ap.nk < 64 THEN CAST(ap.nk AS DOUBLE)
        |       ELSE 63.0 * POWER(2.0, 60) / CAST(ap.hk AS DOUBLE) END AS est_parts,
        |  CASE WHEN ao.nk < 64 THEN CAST(ao.nk AS DOUBLE)
        |       ELSE 63.0 * POWER(2.0, 60) / CAST(ao.hk AS DOUBLE) END AS est_orders
        |FROM ap JOIN ao ON ap.flag = ao.flag""".stripMargin,
    // full replay of the KMV set algebra: same hash domain, bottom-64
    // per single type and per pair-union, same exact-regime
    // short-circuit, inclusion–exclusion in the same operation order
    "kmv_set_ops" ->
      """WITH hu AS (SELECT DISTINCT event_type,
        |              CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
        |            FROM events),
        |r1 AS (SELECT event_type, h,
        |         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn FROM hu),
        |a1 AS (SELECT event_type, count(*) AS nk, max(h) AS hk
        |       FROM r1 WHERE rn <= 64 GROUP BY 1),
        |e1 AS (SELECT event_type,
        |         CASE WHEN nk < 64 THEN CAST(nk AS DOUBLE)
        |              ELSE 63.0 * POWER(2.0, 60) / CAST(hk AS DOUBLE) END AS est
        |       FROM a1),
        |pairs(type_a, type_b) AS (VALUES
        |  ('click','view'), ('click','purchase'), ('view','purchase')),
        |hu2 AS (SELECT DISTINCT p.type_a, p.type_b, u.h
        |        FROM pairs p JOIN hu u ON u.event_type IN (p.type_a, p.type_b)),
        |r2 AS (SELECT type_a, type_b, h,
        |         row_number() OVER (PARTITION BY type_a, type_b ORDER BY h) AS rn FROM hu2),
        |a2 AS (SELECT type_a, type_b, count(*) AS nk, max(h) AS hk
        |       FROM r2 WHERE rn <= 64 GROUP BY 1, 2),
        |e2 AS (SELECT type_a, type_b,
        |         CASE WHEN nk < 64 THEN CAST(nk AS DOUBLE)
        |              ELSE 63.0 * POWER(2.0, 60) / CAST(hk AS DOUBLE) END AS est
        |       FROM a2)
        |SELECT p.type_a, p.type_b, ea.est AS est_a, eb.est AS est_b,
        |  eu.est AS est_union,
        |  (ea.est + eb.est) - eu.est AS est_intersect
        |FROM pairs p
        |JOIN e1 ea ON ea.event_type = p.type_a
        |JOIN e1 eb ON eb.event_type = p.type_b
        |JOIN e2 eu ON eu.type_a = p.type_a AND eu.type_b = p.type_b""".stripMargin,
    // the IVM decomposition must exactly partition the plain join
    "ivm_join" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, c_mktsegment
        |FROM orders JOIN customer ON o_custkey = c_custkey""".stripMargin,
    // full recompute over base ∪ Δ — the IVM merge must be
    // bit-identical to it (decimal sums end-to-end, final cast)
    "ivm_agg" ->
      """WITH eff AS (
        |  SELECT o_custkey, o_totalprice FROM orders WHERE o_orderkey % 100 <> 7
        |  UNION ALL
        |  SELECT o_custkey, o_totalprice FROM orders WHERE o_orderkey % 100 = 5)
        |SELECT o_custkey, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE) AS sum_price
        |FROM eff GROUP BY o_custkey""".stripMargin,
    // lead() over (ts, event_id) — same deterministic tiebreak; the
    // probability is one BIGINT/BIGINT division in both engines
    "markov_trans" ->
      """WITH seq AS (
        |  SELECT event_type AS cur,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        |  FROM events),
        |pairs AS (
        |  SELECT cur, nxt, count(*) AS n FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2)
        |SELECT cur, nxt, n,
        |  CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY cur) AS DOUBLE) AS p
        |FROM pairs""".stripMargin,
    // only the valid staged subset may survive the corrupt member
    "read_corrupt_skip" ->
      """SELECT event_id, user_id, event_type, ts, value
        |FROM events WHERE user_id % 3 = 0""".stripMargin,
    // dynamic partition overwrite: untouched days keep their original
    // rows, the trailing week is wholly replaced by the restatement
    "partition_overwrite" ->
      """WITH e AS (SELECT event_id, user_id, event_type, value,
        |    CAST(ts AS DATE) AS day FROM events),
        |mx AS (SELECT max(day) - 6 AS cut FROM e)
        |SELECT event_id, user_id, event_type, value,
        |  CAST(day AS VARCHAR) AS day
        |FROM e, mx WHERE day < cut
        |UNION ALL
        |SELECT event_id, user_id, event_type || '_restated', value * 2,
        |  CAST(day AS VARCHAR)
        |FROM e, mx WHERE day >= cut""".stripMargin,
    // order-insensitive compare gates the SET; PlanAuditSpec gates
    // the rangepartitioning sort shape
    "sort_export" ->
      """SELECT event_id, user_id, event_type, ts, value
        |FROM events""".stripMargin,
    // prefix-sum mean-gap replay: same DECIMAL cumulative sums, same
    // exact-decimal-over-count double division, same tie rule
    "changepoint_mean" ->
      """WITH b AS (
        |  SELECT event_type, event_id, ts, CAST(value AS DECIMAL(30,4)) AS v,
        |    row_number() OVER win AS i,
        |    sum(CAST(value AS DECIMAL(30,4))) OVER (PARTITION BY event_type
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
        |  FROM events
        |  WINDOW win AS (PARTITION BY event_type ORDER BY ts, event_id)),
        |t AS (SELECT event_type, count(*) AS n, sum(v) AS sn FROM b GROUP BY 1),
        |sc AS (
        |  SELECT b.event_type, b.event_id, b.ts, b.i, t.n,
        |    CAST(b.s AS DOUBLE) / b.i AS mean_before,
        |    CAST(t.sn - b.s AS DOUBLE) / (t.n - b.i) AS mean_after
        |  FROM b JOIN t USING (event_type) WHERE b.i < t.n),
        |r AS (SELECT *, abs(mean_before - mean_after) AS gap,
        |        row_number() OVER (PARTITION BY event_type
        |          ORDER BY abs(mean_before - mean_after) DESC, ts ASC, event_id ASC) AS rk
        |      FROM sc)
        |SELECT event_type, ts AS split_ts, CAST(i AS BIGINT) AS n_before,
        |  CAST(n - i AS BIGINT) AS n_after, mean_before, mean_after, gap
        |FROM r WHERE rk = 1""".stripMargin,
    // same day-grid + row_number() island id, replayed verbatim
    "gaps_islands" ->
      """WITH d AS (SELECT DISTINCT user_id,
        |    epoch_ns(ts) // 1000 // 86400000000 AS day FROM events),
        |i AS (SELECT user_id, day,
        |    day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS island
        |  FROM d)
        |SELECT user_id, min(day) AS start_day, max(day) AS end_day,
        |  CAST(count(*) AS BIGINT) AS n_days
        |FROM i GROUP BY user_id, island""".stripMargin,
    // running-max-over-strict-predecessors island cut, exact micros
    "interval_merge" -> IntervalMergeSql,
    // the rollup rides the IDENTICAL merge replay (shared val)
    "interval_coverage" ->
      s"""WITH m AS ($IntervalMergeSql)
         |SELECT user_id, count(*) AS n_islands,
         |  CAST(sum(end_us - start_us) AS BIGINT) AS covered_us,
         |  CAST(max(end_us) - min(start_us) AS BIGINT) AS span_us,
         |  CAST((CAST(sum(end_us - start_us) AS HUGEINT) * 1048576)
         |       // (max(end_us) - min(start_us)) AS BIGINT) AS coverage_q
         |FROM m GROUP BY user_id""".stripMargin,
    // the quadratic dominance definition the Spark side never runs —
    // a genuinely different formulation gating the window rewrite
    "skyline" ->
      """SELECT p.p_type, p.p_partkey, p.p_retailprice, p.p_size
        |FROM part p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part q
        |  WHERE q.p_type = p.p_type
        |    AND q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
        |    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))""".stripMargin,
    // band join over the day grid — the formulation Spark AVOIDS
    // (it would plan a BNLJ); the explode fan-out is its exact dual
    "rolling_distinct" ->
      """WITH au AS (SELECT DISTINCT
        |    epoch_ns(ts) // 1000 // 86400000000 AS day, user_id FROM events),
        |d AS (SELECT DISTINCT day FROM au)
        |SELECT d.day AS day,
        |  CAST(count(DISTINCT a.user_id) AS BIGINT) AS active_users_7d
        |FROM d JOIN au a ON a.day BETWEEN d.day - 6 AND d.day
        |GROUP BY 1""".stripMargin,
    // same two interpolated medians, same IEEE score arithmetic
    "anomaly_mad" ->
      """WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY 1),
        |dev AS (SELECT e.event_id, e.event_type, e.value,
        |    abs(e.value - m.med) AS adev
        |  FROM events e JOIN med m USING (event_type)),
        |mad AS (SELECT event_type, quantile_cont(adev, 0.5) AS mad
        |  FROM dev GROUP BY 1)
        |SELECT d.event_id, d.event_type, d.value, d.adev / m.mad AS score
        |FROM dev d JOIN mad m USING (event_type)
        |WHERE d.adev > m.mad * 3""".stripMargin,
    // epoch-grid weeks (micros div 7d) — per-timestamp truncation,
    // the gap_us alignment pattern; calendar weeks differ per engine
    "cohort_retention" ->
      """WITH f AS (SELECT user_id, min(ts) AS first_ts FROM events GROUP BY 1)
        |SELECT epoch_ns(f.first_ts) // 1000 // 604800000000 AS cohort_week,
        |  (epoch_ns(e.ts) // 1000 // 604800000000)
        |    - (epoch_ns(f.first_ts) // 1000 // 604800000000) AS week_offset,
        |  CAST(count(DISTINCT e.user_id) AS BIGINT) AS active_users
        |FROM events e JOIN f USING (user_id)
        |GROUP BY 1, 2""".stripMargin,
    "q4" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority""".stripMargin,
    "q6" ->
      """SELECT CAST(sum(CAST(l_extendedprice*l_discount AS DECIMAL(30,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q18" ->
      s"""SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
         |FROM orders
         |JOIN (SELECT l_orderkey, $DSUM_Q AS sum_qty
         |      FROM lineitem GROUP BY l_orderkey
         |      HAVING $DSUM_Q > 150.0) big ON o_orderkey = l_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |ORDER BY o_totalprice DESC, o_orderkey ASC
         |LIMIT 100""".stripMargin,
    "q12" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l_linestatus""".stripMargin,
    "q14" ->
      """WITH s AS (
        |  SELECT
        |    CAST(sum(CAST(CASE WHEN p_type = 'PROMO'
        |         THEN l_extendedprice*(1-l_discount) ELSE 0.0 END AS DECIMAL(30,6))) AS DOUBLE) AS promo_revenue,
        |    CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS total_revenue
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-07-01 00:00:00')
        |SELECT promo_revenue, total_revenue,
        |  promo_revenue / total_revenue * 100.0 AS promo_pct
        |FROM s""".stripMargin,
    "q19" ->
      """SELECT count(*) AS n_lines,
        |  CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q22" ->
      """WITH avg_bal AS (
        |  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(30,4))) AS DOUBLE) / count(*) AS a
        |  FROM customer WHERE c_acctbal > 0.0)
        |SELECT c_mktsegment, count(*) AS n_cust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(30,4))) AS DOUBLE) AS total_bal
        |FROM customer
        |WHERE c_acctbal > (SELECT a FROM avg_bal)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
        |GROUP BY c_mktsegment""".stripMargin,
    "filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice*(1-l_discount) AS net_price
        |FROM lineitem
        |WHERE l_quantity >= 30 AND l_discount > 0.05 AND l_returnflag = 'R'""".stripMargin,
    "join_broadcast" ->
      """SELECT r_name, count(*) AS n_cust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(30,4))) AS DOUBLE) AS sum_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,
    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)""".stripMargin,
    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)""".stripMargin,
    "join_left_agg" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        |  COALESCE(CAST(sum(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE), 0.0) AS total_spend
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey""".stripMargin,
    "join_full" ->
      """WITH u AS (SELECT o_orderdate AS day, count(*) AS n_urgent
        |           FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1),
        |h AS (SELECT o_orderdate AS day, count(*) AS n_high
        |      FROM orders WHERE o_orderpriority = '2-HIGH' GROUP BY 1)
        |SELECT coalesce(u.day, h.day) AS day,
        |  coalesce(n_urgent, 0) AS n_urgent,
        |  coalesce(n_high, 0) AS n_high
        |FROM u FULL JOIN h ON u.day = h.day""".stripMargin,
    "agg_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    // the oracle asserts the exact counts AND that the engine's HLL
    // sketches landed inside their 3-sigma envelope (flags forced to
    // 1); DuckDB can't replay the register layout, but it can hold
    // the operator to its accuracy contract
    "agg_approx_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_orderkey) AS n_orders,
        |  CAST(1 AS BIGINT) AS parts_in_3sig,
        |  CAST(1 AS BIGINT) AS orders_in_3sig
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "agg_median" ->
      """SELECT event_type, quantile_cont(value, 0.5) AS p50,
        |  quantile_cont(value, 0.9) AS p90, count(*) AS n
        |FROM events GROUP BY event_type""".stripMargin,
    // exact percentiles asserted; GK sketch held to its rank-error
    // guarantee (flags forced to 1), same convention as the HLL row
    "target_encode" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_orderpriority,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS HUGEINT) AS xq
        |  FROM orders),
        |c AS (SELECT o_orderpriority, sum(xq) AS sc, count(*) AS nc
        |      FROM o GROUP BY 1)
        |SELECT o.o_orderkey, o.o_orderpriority,
        |  CAST((c.sc - o.xq) // (c.nc - 1) AS BIGINT) AS loo_cents,
        |  CAST((c.sc - o.xq) // (c.nc - 1) AS BIGINT) / 100.0 AS loo
        |FROM o JOIN c USING (o_orderpriority)
        |WHERE c.nc > 1""".stripMargin,
    "feature_hash" ->
      """WITH f AS (
        |  SELECT user_id,
        |    md5(event_type || '-' || CAST((epoch_us(ts) // 3600000000) % 24 AS VARCHAR)) AS fh
        |  FROM events)
        |SELECT user_id,
        |  CAST('0x' || substring(fh, 1, 4) AS BIGINT) % 64 AS idx,
        |  CAST(sum(1 - 2 * (CAST('0x' || substring(fh, 5, 1) AS BIGINT) % 2)) AS BIGINT) AS val
        |FROM f GROUP BY user_id, idx""".stripMargin,
    // row_number under the same (metric, key) total order replays
    // globalBand's rank lattice exactly — ntile() would NOT (its
    // remainder distribution differs from the (rank-1)*k // n + 1
    // formula when n % 5 != 0)
    "rfm_segment" ->
      """WITH per AS (
        |  SELECT o_custkey AS key, max(CAST(o_orderdate AS DATE)) AS last_d,
        |    count(*) AS f,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS m_cents
        |  FROM orders GROUP BY 1),
        |base AS (
        |  SELECT key,
        |    CAST((SELECT max(last_d) FROM per) - last_d AS BIGINT) AS r_days,
        |    f, m_cents FROM per),
        |n AS (SELECT count(*) AS n FROM base),
        |rb AS (SELECT key, ((row_number() OVER (ORDER BY r_days, key) - 1) * 5)
        |         // (SELECT n FROM n) + 1 AS r_band FROM base),
        |fb AS (SELECT key, ((row_number() OVER (ORDER BY f, key) - 1) * 5)
        |         // (SELECT n FROM n) + 1 AS f_band FROM base),
        |mb AS (SELECT key, ((row_number() OVER (ORDER BY m_cents, key) - 1) * 5)
        |         // (SELECT n FROM n) + 1 AS m_band FROM base)
        |SELECT base.key AS c_custkey, r_days, CAST(f AS BIGINT) AS f, m_cents,
        |  CAST(r_band AS BIGINT) AS r_band, CAST(f_band AS BIGINT) AS f_band,
        |  CAST(m_band AS BIGINT) AS m_band,
        |  CAST(r_band * 100 + f_band * 10 + m_band AS BIGINT) AS rfm_code
        |FROM base JOIN rb USING (key) JOIN fb USING (key) JOIN mb USING (key)""".stripMargin,
    "user_lifecycle" -> userLifecycleSql,
    "price_volume_mix" -> priceVolumeMixSql,
    "supplier_hhi" -> supplierHhiSql,
    "lorenz_curve" -> lorenzCurveSql,
    "nation_cr1" -> nationCr1Sql,
    "priority_latency" -> priorityLatencySql,
    "mktseg_mix" -> mktsegMixSql,
    "category_drift" -> categoryDriftSql,
    "trade_matrix" -> tradeMatrixSql,
    "churn_label" -> churnLabelSql,
    "revenue_wow" -> revenueWowSql,
    "type_jaccard" -> typeJaccardSql,
    "drawdown" -> drawdownSql,
    "dup_charges" -> dupChargesSql,
    "bollinger_breach" -> bollingerBreachSql,
    "cross_corr" -> crossCorrSql,
    "trade_reciprocity" -> tradeReciprocitySql,
    "ab_test" -> abTestSql,
    "ks_test" -> ksTestSql,
    "return_rate_trend" -> returnRateTrendSql,
    "rollup_share" -> rollupShareSql,
    "forecast_backtest" -> forecastBacktestSql,
    "ltv_curve" -> ltvCurveSql,
    "abc_class" -> abcClassSql,
    "repeat_rate" -> repeatRateSql,
    "order_size_hist" -> orderSizeHistSql,
    "segment_migration" -> segmentMigrationSql,
    "stickiness" -> stickinessSql,
    "event_interarrival" -> eventInterarrivalSql,
    "spend_percentile" ->
      """WITH per AS (
        |  SELECT o_custkey AS key,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        |nn AS (SELECT greatest(count(*) - 1, 1) AS d FROM per),
        |r AS (SELECT key, x, row_number() OVER (ORDER BY x, key) - 1 AS i FROM per)
        |SELECT key AS c_custkey, x AS spend_cents,
        |  CAST((CAST(i AS HUGEINT) * 1048576) // (SELECT d FROM nn) AS BIGINT) AS pct_q
        |FROM r""".stripMargin,
    "quantile_table" ->
      """WITH b AS (
        |  SELECT event_type, event_id,
        |    CAST(floor(value * 1000000) AS BIGINT) AS vq
        |  FROM events),
        |r AS (SELECT event_type, vq,
        |        row_number() OVER (PARTITION BY event_type
        |                           ORDER BY vq, event_id) AS rn,
        |        count(*) OVER (PARTITION BY event_type) AS n
        |      FROM b)
        |SELECT event_type, CAST(max(n) AS BIGINT) AS n,
        |  max(CASE WHEN rn = (n - 1) * 10 // 100 + 1 THEN vq END) AS p10_q,
        |  max(CASE WHEN rn = (n - 1) * 25 // 100 + 1 THEN vq END) AS p25_q,
        |  max(CASE WHEN rn = (n - 1) * 50 // 100 + 1 THEN vq END) AS p50_q,
        |  max(CASE WHEN rn = (n - 1) * 75 // 100 + 1 THEN vq END) AS p75_q,
        |  max(CASE WHEN rn = (n - 1) * 90 // 100 + 1 THEN vq END) AS p90_q
        |FROM r GROUP BY event_type""".stripMargin,
    "benford_first_digit" -> benfordSql,
    // exact HUGEINT moment sums over the integral $k series, floored
    // to lossless doubles — the agg_corr closing-formula discipline
    "autocorr_lag7" ->
      """WITH d AS (
        |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |s AS (SELECT day, CAST(sum(CAST(cents AS HUGEINT)) // 100000 AS BIGINT) AS rev_k
        |      FROM d GROUP BY 1),
        |p AS (SELECT a.rev_k AS x, b.rev_k AS y
        |      FROM s a JOIN s b ON b.day = a.day + 7),
        |m AS (SELECT count(*) AS n,
        |        CAST(floor(sum(CAST(x AS HUGEINT))) AS DOUBLE) AS sx,
        |        CAST(floor(sum(CAST(y AS HUGEINT))) AS DOUBLE) AS sy,
        |        CAST(floor(sum(CAST(x AS HUGEINT) * x)) AS DOUBLE) AS sxx,
        |        CAST(floor(sum(CAST(y AS HUGEINT) * y)) AS DOUBLE) AS syy,
        |        CAST(floor(sum(CAST(x AS HUGEINT) * y)) AS DOUBLE) AS sxy
        |      FROM p)
        |SELECT n AS n_pairs,
        |  (n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_lag7,
        |  (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope
        |FROM m""".stripMargin,
    // half-open [ts, ts+5min) sweep: ends (-1) sort before starts
    // (+1) at equal t, so touching intervals never count as live
    "interval_overlap" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS s FROM events),
        |b AS (SELECT user_id, s AS t, 1 AS d FROM ev
        |      UNION ALL
        |      SELECT user_id, s + 300000000, -1 FROM ev),
        |c AS (SELECT user_id, t,
        |        sum(d) OVER (PARTITION BY user_id ORDER BY t, d
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cnt
        |      FROM b),
        |m AS (SELECT user_id, t, cnt,
        |        max(cnt) OVER (PARTITION BY user_id) AS mx FROM c)
        |SELECT user_id, CAST(max(mx) AS BIGINT) AS max_concurrent,
        |  CAST(min(t) AS BIGINT) AS peak_us
        |FROM m WHERE cnt = mx GROUP BY user_id""".stripMargin,
    "skew_profile" ->
      """WITH f AS (
        |  SELECT 'l_partkey' AS key_col, l_partkey AS k FROM lineitem
        |  UNION ALL SELECT 'l_suppkey', l_suppkey FROM lineitem
        |  UNION ALL SELECT 'o_custkey', o_custkey FROM orders),
        |g AS (SELECT key_col, k, count(*) AS f FROM f GROUP BY 1, 2)
        |SELECT key_col, CAST(sum(f) AS BIGINT) AS n_rows,
        |  count(*) AS n_keys, CAST(max(f) AS BIGINT) AS max_freq,
        |  CAST((max(f) * count(*) * 1048576) // sum(f) AS BIGINT) AS skew_q
        |FROM g GROUP BY key_col""".stripMargin,
    "burst_detect" ->
      """WITH h AS (
        |  SELECT user_id, epoch_us(ts) // 3600000000 AS hour, count(*) AS n_events
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT *,
        |        row_number() OVER (PARTITION BY user_id ORDER BY n_events, hour) AS rn,
        |        count(*) OVER (PARTITION BY user_id) AS nh
        |      FROM h),
        |m AS (SELECT user_id,
        |        max(CASE WHEN rn = (nh * 50 + 99) // 100 THEN n_events END) AS med
        |      FROM r GROUP BY 1)
        |SELECT h.user_id, CAST(h.hour AS BIGINT) AS hour, h.n_events, m.med
        |FROM h JOIN m USING (user_id)
        |WHERE h.n_events >= m.med * 3 AND h.n_events >= 3""".stripMargin,
    "funnel_latency" ->
      """WITH s1 AS (
        |  SELECT user_id, ts, event_type,
        |    min(CASE WHEN event_type = 'view' THEN ts END)
        |      OVER (PARTITION BY user_id) AS tv
        |  FROM events),
        |s2 AS (
        |  SELECT *, min(CASE WHEN event_type = 'click' AND ts > tv THEN ts END)
        |    OVER (PARTITION BY user_id) AS tc
        |  FROM s1),
        |s3 AS (
        |  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > tc THEN ts END)
        |    OVER (PARTITION BY user_id) AS tp
        |  FROM s2),
        |u AS (SELECT DISTINCT user_id, tv, tc, tp FROM s3),
        |l AS (
        |  SELECT 'view_to_click' AS step, epoch_us(tc) - epoch_us(tv) AS lat_us
        |  FROM u WHERE tc IS NOT NULL
        |  UNION ALL
        |  SELECT 'click_to_purchase', epoch_us(tp) - epoch_us(tc)
        |  FROM u WHERE tp IS NOT NULL),
        |r AS (SELECT step, lat_us,
        |        row_number() OVER (PARTITION BY step ORDER BY lat_us) AS rn,
        |        count(*) OVER (PARTITION BY step) AS n
        |      FROM l)
        |SELECT step, CAST(max(n) AS BIGINT) AS n_users,
        |  CAST(max(CASE WHEN rn = (n * 50 + 99) // 100 THEN lat_us END) AS BIGINT) AS p50_us,
        |  CAST(max(CASE WHEN rn = (n * 90 + 99) // 100 THEN lat_us END) AS BIGINT) AS p90_us
        |FROM r GROUP BY step""".stripMargin,
    "session_conversion" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events),
        |m AS (SELECT *,
        |        CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000
        |             THEN 1 ELSE 0 END AS new_s
        |      FROM e),
        |s AS (SELECT *,
        |        sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |      FROM m),
        |g AS (SELECT user_id, sid, count(*) AS n_events,
        |        max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_purchase
        |      FROM s GROUP BY 1, 2),
        |b AS (SELECT CASE WHEN n_events = 1 THEN '1'
        |                  WHEN n_events <= 4 THEN '2-4'
        |                  WHEN n_events <= 9 THEN '5-9'
        |                  ELSE '10+' END AS band, has_purchase
        |      FROM g)
        |SELECT band, count(*) AS n_sessions,
        |  CAST(sum(has_purchase) AS BIGINT) AS n_converting,
        |  CAST((sum(has_purchase) * 1048576) // count(*) AS BIGINT) AS conv_q
        |FROM b GROUP BY band""".stripMargin,
    "gap_survival" ->
      """WITH b AS (
        |  SELECT o_custkey AS key, o_orderkey AS ok,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS od
        |  FROM orders),
        |g AS (SELECT od - lag(od, 1) OVER (PARTITION BY key ORDER BY od, ok) AS gap
        |      FROM b),
        |x AS (SELECT gap, unnest([7, 14, 30, 60, 90]) AS t FROM g WHERE gap IS NOT NULL)
        |SELECT CAST(t AS BIGINT) AS t, count(*) AS n_gaps,
        |  CAST(sum(CASE WHEN gap > t THEN 1 ELSE 0 END) AS BIGINT) AS n_exceed,
        |  CAST((sum(CASE WHEN gap > t THEN 1 ELSE 0 END) * 1048576) // count(*) AS BIGINT) AS surv_q
        |FROM x GROUP BY t""".stripMargin,
    "order_backlog" ->
      """WITH sp AS (
        |  SELECT o.o_orderkey,
        |    CAST(CAST(o.o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) // 30 AS m_open,
        |    (max(CAST(CAST(l.l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT)) // 30) + 1 AS m_close
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |  GROUP BY 1, 2),
        |op AS (SELECT m_open AS month, count(*) AS n_opened FROM sp GROUP BY 1),
        |cl AS (SELECT m_close AS month, count(*) AS n_closed FROM sp GROUP BY 1),
        |j AS (SELECT coalesce(op.month, cl.month) AS month,
        |        coalesce(op.n_opened, 0) AS n_opened,
        |        coalesce(cl.n_closed, 0) AS n_closed
        |      FROM op FULL OUTER JOIN cl ON op.month = cl.month)
        |SELECT month, CAST(n_opened AS BIGINT) AS n_opened,
        |  CAST(n_closed AS BIGINT) AS n_closed,
        |  CAST(sum(n_opened - n_closed) OVER (ORDER BY month
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS backlog
        |FROM j""".stripMargin,
    "sax_motifs" ->
      """WITH d AS (
        |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |s AS (SELECT day, CAST(sum(CAST(cents AS HUGEINT)) AS BIGINT) AS rev
        |      FROM d GROUP BY 1),
        |nn AS (SELECT count(*) AS n FROM s),
        |b AS (SELECT day,
        |        substring('abcd',
        |          CAST(((row_number() OVER (ORDER BY rev, day) - 1) * 4)
        |               // (SELECT n FROM nn) + 1 AS INTEGER), 1) AS letter
        |      FROM s),
        |w AS (SELECT day // 7 AS week,
        |        string_agg(letter, '' ORDER BY day % 7) AS motif
        |      FROM b GROUP BY 1)
        |SELECT motif, CAST(length(motif) AS BIGINT) AS motif_len,
        |  count(*) AS n_weeks
        |FROM w GROUP BY motif""".stripMargin,
    "pareto_share" -> paretoSql,
    "discount_elasticity" -> discountElasticitySql,
    "ship_latency" -> shipLatencySql,
    "seasonal_profile" ->
      """WITH d AS (
        |  SELECT event_type,
        |    ((epoch_us(ts) // 86400000000) + 4) % 7 AS dow
        |  FROM events),
        |g AS (SELECT event_type, dow, count(*) AS n FROM d GROUP BY 1, 2),
        |t AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS nt FROM g GROUP BY 1)
        |SELECT g.event_type, CAST(dow AS BIGINT) AS dow, CAST(n AS BIGINT) AS n,
        |  CAST((CAST(n AS HUGEINT) * 1048576) // nt AS BIGINT) AS share_q
        |FROM g JOIN t USING (event_type)""".stripMargin,
    "gini_spend" ->
      """WITH per AS (
        |  SELECT o_custkey AS key,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        |r AS (SELECT x, row_number() OVER (ORDER BY x, key) AS i FROM per),
        |a AS (SELECT count(*) AS n, sum(CAST(x AS HUGEINT)) AS s0,
        |        sum(CAST(x AS HUGEINT) * i) AS s1 FROM r)
        |SELECT CAST(n AS BIGINT) AS n, CAST(s0 AS BIGINT) AS total_cents,
        |  CAST(((2 * s1 - (n + 1) * s0) * 1048576) // (n * s0) AS BIGINT) AS gini_q,
        |  CAST(((2 * s1 - (n + 1) * s0) * 1048576) // (n * s0) AS BIGINT)
        |    / 1048576.0 AS gini
        |FROM a""".stripMargin,
    "decile_lift" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_orderpriority,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS HUGEINT) AS xq
        |  FROM orders),
        |c AS (SELECT o_orderpriority, sum(xq) AS sc, count(*) AS nc
        |      FROM o GROUP BY 1),
        |e AS (SELECT o.o_orderkey AS key,
        |        CAST((c.sc - o.xq) // (c.nc - 1) AS BIGINT) AS loo,
        |        CAST(o.xq AS BIGINT) AS actual
        |      FROM o JOIN c USING (o_orderpriority) WHERE c.nc > 1),
        |nn AS (SELECT count(*) AS n FROM e),
        |b AS (SELECT actual,
        |        ((row_number() OVER (ORDER BY loo, key) - 1) * 10)
        |          // (SELECT n FROM nn) + 1 AS decile
        |      FROM e)
        |SELECT CAST(decile AS BIGINT) AS decile, count(*) AS n,
        |  CAST(sum(CAST(actual AS HUGEINT)) // count(*) AS BIGINT) AS mean_cents
        |FROM b GROUP BY decile""".stripMargin,
    "purchase_gaps" ->
      """WITH b AS (
        |  SELECT o_custkey AS key, o_orderkey AS ok,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS od
        |  FROM orders),
        |g AS (SELECT key,
        |        od - lag(od, 1) OVER (PARTITION BY key ORDER BY od, ok) AS gap
        |      FROM b)
        |SELECT key AS c_custkey, count(*) AS n_gaps,
        |  min(gap) AS min_gap, max(gap) AS max_gap,
        |  CAST(sum(gap) AS BIGINT) AS sum_gap,
        |  CAST((CAST(sum(gap) AS HUGEINT) * 100) // count(*) AS BIGINT) AS mean_gap_x100
        |FROM g WHERE gap IS NOT NULL GROUP BY key""".stripMargin,
    "winsorized_mean" ->
      """WITH b AS (
        |  SELECT event_type, event_id,
        |    CAST(floor(value * 1000000) AS BIGINT) AS vq
        |  FROM events),
        |r AS (SELECT event_type, vq,
        |        row_number() OVER (PARTITION BY event_type
        |                           ORDER BY vq, event_id) AS rn,
        |        count(*) OVER (PARTITION BY event_type) AS n
        |      FROM b),
        |th AS (SELECT event_type,
        |         min(CASE WHEN rn = (n - 1) * 5 // 100 + 1 THEN vq END) AS lo_q,
        |         max(CASE WHEN rn = (n - 1) * 95 // 100 + 1 THEN vq END) AS hi_q
        |       FROM r GROUP BY event_type)
        |SELECT b.event_type, count(*) AS n, th.lo_q, th.hi_q,
        |  CAST(sum(GREATEST(LEAST(vq, hi_q), lo_q))
        |       // count(*) AS BIGINT) AS wmean_q,
        |  CAST(sum(GREATEST(LEAST(vq, hi_q), lo_q))
        |       // count(*) AS BIGINT) / 1000000.0 AS wmean
        |FROM b JOIN th USING (event_type)
        |GROUP BY b.event_type, th.lo_q, th.hi_q""".stripMargin,
    "linreg_trend" ->
      """WITH b AS (
        |  SELECT user_id, epoch_us(ts) // 1000000 AS ts_s,
        |    CAST(floor(value * 1000000) AS HUGEINT) AS yq
        |  FROM events),
        |c AS (
        |  SELECT user_id,
        |    CAST(ts_s - min(ts_s) OVER (PARTITION BY user_id) AS HUGEINT) AS x,
        |    yq
        |  FROM b),
        |a AS (
        |  SELECT user_id, count(*) AS n, sum(x) AS sx, sum(yq) AS sy,
        |    sum(x * yq) AS sxy, sum(x * x) AS sxx
        |  FROM c GROUP BY user_id)
        |SELECT user_id, CAST(n AS BIGINT) AS n,
        |  CAST(((CAST(n AS HUGEINT) * sxy - sx * sy) * 86400)
        |       // (CAST(n AS HUGEINT) * sxx - sx * sx) AS BIGINT) AS slope_qpd,
        |  CAST(((CAST(n AS HUGEINT) * sxy - sx * sy) * 86400)
        |       // (CAST(n AS HUGEINT) * sxx - sx * sx) AS BIGINT) / 1000000.0 AS slope_per_day
        |FROM a
        |WHERE (CAST(n AS HUGEINT) * sxx - sx * sx) > 0""".stripMargin,
    "simpson_diversity" ->
      """WITH g AS (
        |  SELECT user_id, event_type, count(*) AS c
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id, CAST(sum(c) AS BIGINT) AS n,
        |  CAST((CAST(1048576 AS HUGEINT) * sum(CAST(c AS HUGEINT) * c))
        |       // (CAST(sum(c) AS HUGEINT) * sum(c)) AS BIGINT) AS simpson_q
        |FROM g GROUP BY user_id""".stripMargin,
    "window_ewma" ->
      """WITH b AS (
        |  SELECT user_id, event_id, ts,
        |    CAST(floor(value * 1000000) AS HUGEINT) AS vq,
        |    row_number() OVER win AS rn,
        |    lag(CAST(floor(value * 1000000) AS HUGEINT), 1) OVER win AS v1,
        |    lag(CAST(floor(value * 1000000) AS HUGEINT), 2) OVER win AS v2,
        |    lag(CAST(floor(value * 1000000) AS HUGEINT), 3) OVER win AS v3,
        |    lag(CAST(floor(value * 1000000) AS HUGEINT), 4) OVER win AS v4,
        |    lag(CAST(floor(value * 1000000) AS HUGEINT), 5) OVER win AS v5,
        |    lag(CAST(floor(value * 1000000) AS HUGEINT), 6) OVER win AS v6,
        |    lag(CAST(floor(value * 1000000) AS HUGEINT), 7) OVER win AS v7
        |  FROM events
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC))
        |SELECT user_id, event_id, ts,
        |  CAST((vq*16384 + v1*12288 + v2*9216 + v3*6912 + v4*5184
        |        + v5*3888 + v6*2916 + v7*2187) // 65536 AS BIGINT) AS ewma_q,
        |  CAST((vq*16384 + v1*12288 + v2*9216 + v3*6912 + v4*5184
        |        + v5*3888 + v6*2916 + v7*2187) // 65536 AS BIGINT) / 1000000.0 AS ewma
        |FROM b WHERE rn >= 8""".stripMargin,
    "twap" ->
      """WITH t AS (SELECT user_id, event_id, epoch_us(ts) AS t, value FROM events),
        |i AS (SELECT user_id, t, value,
        |        lead(t) OVER (PARTITION BY user_id ORDER BY t ASC, event_id ASC) AS t_next
        |      FROM t)
        |SELECT user_id, count(*) AS n_intervals,
        |  CAST(sum(t_next - t) AS BIGINT) AS span_us,
        |  CAST(sum(CAST(floor(value * 1000000) AS HUGEINT) * (t_next - t))
        |       // sum(t_next - t) AS BIGINT) AS twap_q,
        |  CAST(sum(CAST(floor(value * 1000000) AS HUGEINT) * (t_next - t))
        |       // sum(t_next - t) AS BIGINT) / 1000000.0 AS twap
        |FROM i WHERE t_next IS NOT NULL GROUP BY user_id""".stripMargin,
    "poisson_bootstrap" ->
      """WITH reps AS (SELECT unnest(range(8)) AS b),
        |g AS (
        |  SELECT r.b, o.o_totalprice,
        |    CAST('0x' || substring(md5(CAST(o.o_orderkey AS VARCHAR) || '-' || CAST(r.b AS VARCHAR)), 1, 4) AS BIGINT) AS h
        |  FROM orders o, reps r),
        |w AS (
        |  SELECT b, o_totalprice,
        |    CASE WHEN h < 24109 THEN 0 WHEN h < 48218 THEN 1 WHEN h < 60273 THEN 2
        |         WHEN h < 64291 THEN 3 WHEN h < 65296 THEN 4 ELSE 5 END AS w
        |  FROM g)
        |SELECT CAST(b AS BIGINT) AS b, CAST(sum(w) AS BIGINT) AS n_eff,
        |  CAST(sum(w * CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE) AS sum_price
        |FROM w GROUP BY b""".stripMargin,
    "agg_quantile_disc" ->
      """WITH r AS (
        |  SELECT l_returnflag AS g, l_quantity AS v,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY l_quantity ASC) AS rn,
        |    count(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem)
        |SELECT g,
        |  max(CASE WHEN rn = (n * 25 + 99) // 100 THEN v END) AS p25,
        |  max(CASE WHEN rn = (n * 50 + 99) // 100 THEN v END) AS p50,
        |  max(CASE WHEN rn = (n * 75 + 99) // 100 THEN v END) AS p75,
        |  max(CASE WHEN rn = (n * 95 + 99) // 100 THEN v END) AS p95,
        |  count(*) AS n_rows
        |FROM r GROUP BY g""".stripMargin,
    "agg_approx_quantile" ->
      """SELECT event_type, quantile_cont(value, 0.5) AS p50,
        |  quantile_cont(value, 0.9) AS p90, count(*) AS n,
        |  CAST(1 AS BIGINT) AS p50_in_bound,
        |  CAST(1 AS BIGINT) AS p90_in_bound
        |FROM events GROUP BY event_type""".stripMargin,
    "agg_stats" ->
      """SELECT l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS mean_qty,
        |  (CAST(sum(CAST(l_quantity AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
        |     - CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
        |       * CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*))
        |    / (count(*) - 1) AS var_qty,
        |  sqrt((CAST(sum(CAST(l_quantity AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
        |     - CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
        |       * CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*))
        |    / (count(*) - 1)) AS stddev_qty
        |FROM lineitem GROUP BY l_linestatus""".stripMargin,
    "agg_rollup" ->
      s"""SELECT l_returnflag, l_linestatus, count(*) AS n, $DSUM_Q AS sum_qty
         |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "agg_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,
    "agg_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
        |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
        |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
        |  count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin,
    "subquery_scalar" ->
      """SELECT c_custkey,
        |  COALESCE((SELECT max(o_totalprice) FROM orders WHERE o_custkey = c_custkey), 0.0) AS max_order
        |FROM customer""".stripMargin,
    "subquery_exists" ->
      """SELECT c_custkey, c_mktsegment
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F'
        |                    AND o_totalprice > 300000)""".stripMargin,
    "window_ntile" ->
      """SELECT o_orderkey, o_orderpriority,
        |  CAST(ntile(4) OVER win AS BIGINT) AS quartile,
        |  percent_rank() OVER win AS pct_rank,
        |  cume_dist() OVER win AS cume
        |FROM orders
        |WINDOW win AS (PARTITION BY o_orderpriority ORDER BY o_totalprice ASC, o_orderkey ASC)""".stripMargin,
    "window_rank" ->
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rnk
        |  FROM orders) t
        |WHERE rnk <= 3""".stripMargin,
    "window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(30,4)))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        |FROM orders""".stripMargin,
    "window_lag" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS prev_price
        |FROM orders""".stripMargin,
    "window_frames" ->
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_price,
        |  last_value(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS last_price,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(30,4)))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving3_sum
        |FROM orders""".stripMargin,
    "topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin,
    "set_union" ->
      """SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
        |UNION
        |SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'""".stripMargin,
    "set_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'""".stripMargin,
    "set_except" ->
      """SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'""".stripMargin,
    "set_except_a" ->
      """SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
        |EXCEPT ALL
        |SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'""".stripMargin,
    "set_intersect_a" ->
      """SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
        |INTERSECT ALL
        |SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'""".stripMargin,
    "scalar_string" ->
      """SELECT p_partkey, upper(p_name) AS uname, substring(p_name, 1, 5) AS prefix,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  concat_ws('|', p_brand, p_type) AS brand_type,
        |  regexp_replace(p_name, '[aeiou]', '', 'g') AS novowels
        |FROM part""".stripMargin,
    "scalar_date" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(month(o_orderdate) AS BIGINT) AS mo,
        |  CAST(day(o_orderdate) AS BIGINT) AS dom,
        |  date_trunc('month', o_orderdate) AS month_start,
        |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since
        |FROM orders""".stripMargin,
    "scalar_math" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
        |  abs(l_discount - 0.05) AS disc_dev,
        |  sqrt(l_quantity) AS qty_sqrt,
        |  l_quantity * l_quantity AS qty_sq
        |FROM lineitem""".stripMargin,
    // rank-1 windows on the same strictly-unique composite order
    // replay max_by/min_by deterministically
    "agg_argmax" ->
      """WITH r AS (
        |  SELECT l_returnflag, l_orderkey, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice DESC, l_orderkey DESC, l_linenumber DESC) AS rmax,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice ASC, l_orderkey ASC, l_linenumber ASC) AS rmin
        |  FROM lineitem)
        |SELECT l_returnflag,
        |  max(CASE WHEN rmax = 1 THEN l_orderkey END) AS priciest_order,
        |  max(CASE WHEN rmin = 1 THEN l_orderkey END) AS cheapest_order,
        |  max(l_extendedprice) AS max_price,
        |  min(l_extendedprice) AS min_price
        |FROM r GROUP BY l_returnflag""".stripMargin,
    "union_drift" ->
      """SELECT o_orderkey, o_custkey, NULL AS o_totalprice
        |FROM orders WHERE o_orderkey % 2 = 0
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders WHERE o_orderkey % 2 = 1""".stripMargin,
    "forward_fill" ->
      """SELECT user_id, event_id, ts,
        |  CASE WHEN event_type <> 'view' THEN value END AS v_sparse,
        |  last_value(CASE WHEN event_type <> 'view' THEN value END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
        |FROM events""".stripMargin,
    "join_nullsafe" ->
      """WITH o AS (
        |  SELECT nullif(o_custkey % 7, 3) AS key, count(*) AS n_orders
        |  FROM orders GROUP BY 1),
        |c AS (
        |  SELECT nullif(c_custkey % 7, 3) AS key, count(*) AS n_customers
        |  FROM customer GROUP BY 1)
        |SELECT o.key, o.n_orders, c.n_customers
        |FROM o JOIN c ON o.key IS NOT DISTINCT FROM c.key""".stripMargin,
    // try_divide's NULL-on-zero replays as an explicit CASE (DuckDB
    // double division yields inf, not NULL); the failed casts are
    // NULL in both engines' TRY_CAST
    "scalar_try" ->
      """SELECT l_orderkey, l_linenumber,
        |  CASE WHEN l_linenumber % 3 = 0 THEN NULL
        |       ELSE l_extendedprice / (l_linenumber % 3) END AS per_mod,
        |  TRY_CAST(l_linestatus AS DOUBLE) AS instr_num,
        |  TRY_CAST(l_quantity AS TINYINT) AS qty_i8,
        |  TRY_CAST(CAST(l_linenumber AS VARCHAR) || 'x' AS BIGINT) AS junk_num
        |FROM lineitem""".stripMargin,
    // NULLs from the planted failures fall out of count/sum in both
    // engines; the sum is exact BIGINT, the mean one double division
    "scalar_try_agg" ->
      """SELECT l_returnflag, count(*) AS n,
        |  count(CASE WHEN l_linenumber % 3 = 0 THEN NULL ELSE 1 END) AS n_ok,
        |  CAST(sum(TRY_CAST(l_quantity AS TINYINT)) AS BIGINT) AS sum_qty,
        |  CAST(sum(TRY_CAST(l_quantity AS TINYINT)) AS BIGINT) / CAST(count(*) AS DOUBLE) AS mean_qty
        |FROM lineitem GROUP BY 1""".stripMargin,
    // identical moment sums (exact DECIMAL), identical closing IEEE
    // ops — corr/covar/slope replay bit-exactly, unlike native corr()
    "agg_corr" ->
      """WITH m AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    CAST(floor(sum(CAST(l_quantity AS DECIMAL(12,4)))) AS DOUBLE) AS sx,
        |    CAST(floor(sum(CAST(l_extendedprice AS DECIMAL(12,4)))) AS DOUBLE) AS sy,
        |    CAST(floor(sum(CAST(l_quantity AS DECIMAL(24,4)) * CAST(l_quantity AS DECIMAL(12,4)))) AS DOUBLE) AS sxx,
        |    CAST(floor(sum(CAST(l_extendedprice AS DECIMAL(24,4)) * CAST(l_extendedprice AS DECIMAL(12,4)))) AS DOUBLE) AS syy,
        |    CAST(floor(sum(CAST(l_quantity AS DECIMAL(24,4)) * CAST(l_extendedprice AS DECIMAL(12,4)))) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, n,
        |  (n * sxy - sx * sy) / (n * (n - 1)) AS covar,
        |  (n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr,
        |  (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope
        |FROM m""".stripMargin,
    // mode with an explicit tie rule: max count, then smallest value
    "agg_mode" ->
      """SELECT user_id, event_type AS mode_event, c AS n FROM (
        |  SELECT user_id, event_type, count(*) AS c,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY count(*) DESC, event_type ASC) AS rk
        |  FROM events GROUP BY user_id, event_type) t
        |WHERE rk = 1""".stripMargin,
    "window_percent" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice ASC, o_orderkey ASC)""".stripMargin,
    "window_range" ->
      """SELECT event_id, user_id, ts,
        |  CAST(sum(CAST(value AS DECIMAL(30,4))) OVER w AS DOUBLE) AS trail_sum,
        |  CAST(count(*) OVER w AS BIGINT) AS trail_n
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)""".stripMargin,
    "json_events" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
        |  CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
        |FROM events GROUP BY event_type""".stripMargin,
    "events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    // same 4-step magic-number spread, decimal masks (0x00FF00FF,
    // 0x0F0F0F0F, 0x33333333, 0x55555555), BIGINT throughout
    "zorder_cluster" -> ZorderSql,
    // the sink round trip must reproduce the identical row set
    "zorder_write" -> ZorderSql,
    // the data-skipping read: same replay, box predicate applied
    "zorder_skip" ->
      s"""$ZorderSql
         |WHERE l_orderkey < $SkipOrd AND l_partkey < $SkipPart""".stripMargin,
    // the oracle is the UNSALTED join: salting must not change results
    "join_salted" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,
    // replays the merge SEMANTICS; the Spark side must reach the
    // same snapshot through the generic broadcast-merge machinery
    "cdc_apply" -> CdcApplySql,
    // v0 = orders payload, v1 = CdcApplySql; FULL key join classifies
    // added/removed/changed; null sides -> '' / -1 sentinels (the
    // null-free gate convention); unchanged rows filtered
    "snapshot_diff" ->
      s"""WITH v1 AS (${CdcApplySql.replace("\n", "\n  ")}),
         |v0 AS (SELECT o_orderkey, o_custkey, o_orderstatus,
         |         o_orderpriority, o_totalprice FROM orders)
         |SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
         |  CASE WHEN a.o_orderkey IS NULL THEN 'added'
         |       WHEN b.o_orderkey IS NULL THEN 'removed'
         |       ELSE 'changed' END AS change_type,
         |  COALESCE(a.o_orderstatus, '') AS status_old,
         |  COALESCE(b.o_orderstatus, '') AS status_new,
         |  COALESCE(a.o_orderpriority, '') AS prio_old,
         |  COALESCE(b.o_orderpriority, '') AS prio_new,
         |  COALESCE(a.o_totalprice, -1.0) AS price_old,
         |  COALESCE(b.o_totalprice, -1.0) AS price_new
         |FROM v0 a FULL JOIN v1 b ON a.o_orderkey = b.o_orderkey
         |WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL
         |   OR a.o_orderstatus <> b.o_orderstatus
         |   OR a.o_orderpriority <> b.o_orderpriority
         |   OR a.o_totalprice <> b.o_totalprice""".stripMargin,
    "bloom_probe" -> bloomProbeSql,
    "join_dpp" -> joinDppSql,
    "schema_evolution" -> schemaEvolutionSql,
    "theilsen_trend" -> theilsenTrendSql,
    "k_anonymity" -> kAnonymitySql,
    "quantile_normalize" -> quantileNormalizeSql,
    "jsonl_roundtrip" -> jsonlRoundtripSql,
    "orc_roundtrip" -> orcRoundtripSql,
    "observed_scan" -> observedScanSql,
    "fano_factor" -> fanoFactorSql,
    "kendall_tau" -> kendallTauSql,
    "t_closeness" -> tClosenessSql,
    "table_fingerprint" -> tableFingerprintSql,
    "auc_rank" -> aucRankSql,
    "chi2_independence" -> chi2IndependenceSql,
    "cramers_v" -> cramersVSql,
    "dp_histogram" -> dpHistogramSql,
    "ses_forecast" -> sesForecastSql,
    "runs_test" -> runsTestSql,
    "ledger_recon" -> ledgerReconSql,
    "attribution_position" -> attributionPositionSql,
    "price_index" -> priceIndexSql,
    "brand_loyalty" -> brandLoyaltySql,
    "rolling_mode" -> rollingModeSql,
    "decay_score" -> decayScoreSql,
    "parquet_bloom" -> parquetBloomSql,
    "rand_response" -> randResponseSql,
    "temporal_audit" -> temporalAuditSql,
    "histogram2d" -> histogram2dSql,
    "revenue_bridge" -> revenueBridgeSql,
    "single_source_parts" -> singleSourcePartsSql,
    "join_runtime_filter" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY l_returnflag""".stripMargin,
    // the oracle is the FULL recompute: base/delta partial-merge must
    // be exactly lossless
    "agg_incremental" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS sum_value,
        |  CAST(sum(CAST(value AS DECIMAL(30,4))) AS DOUBLE) / count(*) AS avg_value,
        |  min(value) AS min_value, max(value) AS max_value
        |FROM events GROUP BY 1""".stripMargin,
    // DuckDB's sum(BIGINT) widens to HUGEINT — cast back
    "variant_events" ->
      """SELECT event_type, count(*) AS n,
        |  count(CAST(json_extract_string(props, 'k') AS BIGINT)) AS n_k,
        |  CAST(sum(CAST(json_extract_string(props, 'k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  min(CAST(json_extract_string(props, 'k') AS BIGINT)) AS min_k,
        |  max(CAST(json_extract_string(props, 'k') AS BIGINT)) AS max_k
        |FROM events GROUP BY 1""".stripMargin,
    // chained window minima: each step's CASE references the previous
    // step's window result — identical nesting both engines
    "funnel_steps" ->
      """WITH s1 AS (
        |  SELECT user_id, ts, event_type,
        |    min(CASE WHEN event_type = 'view' THEN ts END)
        |      OVER (PARTITION BY user_id) AS tv
        |  FROM events),
        |s2 AS (
        |  SELECT *, min(CASE WHEN event_type = 'click' AND ts > tv THEN ts END)
        |    OVER (PARTITION BY user_id) AS tc
        |  FROM s1),
        |s3 AS (
        |  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > tc THEN ts END)
        |    OVER (PARTITION BY user_id) AS tp
        |  FROM s2),
        |u AS (SELECT DISTINCT user_id, tv, tc, tp FROM s3)
        |SELECT count(*) AS n_users, count(tv) AS n_view,
        |  count(tc) AS n_click, count(tp) AS n_purchase
        |FROM u""".stripMargin,
    // one aggregate row per column via UNION ALL; canonical strings
    // (BIGINT, DECIMAL(30,2), strftime) render identically cross-engine
    "encoding_advisor" -> encodingAdvisorSql,
    "ref_integrity" -> refIntegritySql,
    "cuped_adjust" -> cupedAdjustSql,
    "embargo_split" -> embargoSplitSql,
    "profile_table" ->
      """WITH a AS (
        |  SELECT count(*) AS n_rows,
        |    CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nul_ok,
        |    count(DISTINCT o_orderkey) AS dis_ok,
        |    CAST(min(o_orderkey) AS VARCHAR) AS min_ok, CAST(max(o_orderkey) AS VARCHAR) AS max_ok,
        |    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nul_ck,
        |    count(DISTINCT o_custkey) AS dis_ck,
        |    CAST(min(o_custkey) AS VARCHAR) AS min_ck, CAST(max(o_custkey) AS VARCHAR) AS max_ck,
        |    CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nul_st,
        |    count(DISTINCT o_orderstatus) AS dis_st,
        |    min(o_orderstatus) AS min_st, max(o_orderstatus) AS max_st,
        |    CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nul_tp,
        |    count(DISTINCT o_totalprice) AS dis_tp,
        |    CAST(CAST(min(o_totalprice) AS DECIMAL(30,2)) AS VARCHAR) AS min_tp,
        |    CAST(CAST(max(o_totalprice) AS DECIMAL(30,2)) AS VARCHAR) AS max_tp,
        |    CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nul_od,
        |    count(DISTINCT o_orderdate) AS dis_od,
        |    strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S') AS min_od,
        |    strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S') AS max_od,
        |    CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nul_op,
        |    count(DISTINCT o_orderpriority) AS dis_op,
        |    min(o_orderpriority) AS min_op, max(o_orderpriority) AS max_op
        |  FROM orders)
        |SELECT 'o_orderkey' AS col_name, n_rows, nul_ok AS n_nulls, dis_ok AS n_distinct, min_ok AS min_val, max_ok AS max_val FROM a
        |UNION ALL SELECT 'o_custkey', n_rows, nul_ck, dis_ck, min_ck, max_ck FROM a
        |UNION ALL SELECT 'o_orderstatus', n_rows, nul_st, dis_st, min_st, max_st FROM a
        |UNION ALL SELECT 'o_totalprice', n_rows, nul_tp, dis_tp, min_tp, max_tp FROM a
        |UNION ALL SELECT 'o_orderdate', n_rows, nul_od, dis_od, min_od, max_od FROM a
        |UNION ALL SELECT 'o_orderpriority', n_rows, nul_op, dis_op, min_op, max_op FROM a""".stripMargin,
    // the KMV estimates replay exactly (agg_kmv_distinct precedent):
    // per column, the 64 smallest distinct 60-bit md5 hashes of the
    // canonical string and the (k-1)/h_k estimator — so n_distinct_est
    // is hash-gated, not envelope-checked
    "profile_approx" ->
      """WITH tall AS (
        |  SELECT 'o_orderkey' AS cname, CAST(o_orderkey AS VARCHAR) AS s FROM orders WHERE o_orderkey IS NOT NULL
        |  UNION ALL SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders WHERE o_custkey IS NOT NULL
        |  UNION ALL SELECT 'o_orderstatus', o_orderstatus FROM orders WHERE o_orderstatus IS NOT NULL
        |  UNION ALL SELECT 'o_totalprice', CAST(CAST(o_totalprice AS DECIMAL(30,2)) AS VARCHAR) FROM orders WHERE o_totalprice IS NOT NULL
        |  UNION ALL SELECT 'o_orderdate', strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') FROM orders WHERE o_orderdate IS NOT NULL
        |  UNION ALL SELECT 'o_orderpriority', o_orderpriority FROM orders WHERE o_orderpriority IS NOT NULL),
        |hs AS (SELECT DISTINCT cname, CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) AS h FROM tall),
        |rk AS (SELECT cname, h, row_number() OVER (PARTITION BY cname ORDER BY h) AS rn FROM hs),
        |kmv AS (SELECT cname, count(*) AS nk, max(h) AS hk FROM rk WHERE rn <= 64 GROUP BY cname),
        |est AS (SELECT cname, CASE WHEN nk < 64 THEN CAST(nk AS DOUBLE)
        |                           ELSE 63.0 * POWER(2.0, 60) / CAST(hk AS DOUBLE) END AS e FROM kmv),
        |a AS (
        |  SELECT count(*) AS n_rows,
        |    CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nul_ok,
        |    CAST(min(o_orderkey) AS VARCHAR) AS min_ok, CAST(max(o_orderkey) AS VARCHAR) AS max_ok,
        |    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nul_ck,
        |    CAST(min(o_custkey) AS VARCHAR) AS min_ck, CAST(max(o_custkey) AS VARCHAR) AS max_ck,
        |    CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nul_st,
        |    min(o_orderstatus) AS min_st, max(o_orderstatus) AS max_st,
        |    CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nul_tp,
        |    CAST(CAST(min(o_totalprice) AS DECIMAL(30,2)) AS VARCHAR) AS min_tp,
        |    CAST(CAST(max(o_totalprice) AS DECIMAL(30,2)) AS VARCHAR) AS max_tp,
        |    CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nul_od,
        |    strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S') AS min_od,
        |    strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S') AS max_od,
        |    CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nul_op,
        |    min(o_orderpriority) AS min_op, max(o_orderpriority) AS max_op
        |  FROM orders)
        |SELECT 'o_orderkey' AS col_name, n_rows, nul_ok AS n_nulls,
        |  (SELECT e FROM est WHERE cname = 'o_orderkey') AS n_distinct_est,
        |  min_ok AS min_val, max_ok AS max_val FROM a
        |UNION ALL SELECT 'o_custkey', n_rows, nul_ck, (SELECT e FROM est WHERE cname = 'o_custkey'), min_ck, max_ck FROM a
        |UNION ALL SELECT 'o_orderstatus', n_rows, nul_st, (SELECT e FROM est WHERE cname = 'o_orderstatus'), min_st, max_st FROM a
        |UNION ALL SELECT 'o_totalprice', n_rows, nul_tp, (SELECT e FROM est WHERE cname = 'o_totalprice'), min_tp, max_tp FROM a
        |UNION ALL SELECT 'o_orderdate', n_rows, nul_od, (SELECT e FROM est WHERE cname = 'o_orderdate'), min_od, max_od FROM a
        |UNION ALL SELECT 'o_orderpriority', n_rows, nul_op, (SELECT e FROM est WHERE cname = 'o_orderpriority'), min_op, max_op FROM a""".stripMargin,
    // the bucketed round trip must reproduce the plain join exactly
    "join_bucketed" ->
      """SELECT o_orderstatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1""".stripMargin,
    // moments from decimal-exact sums; mean/sigma/z single IEEE ops →
    // double outputs hash-match cross-engine
    "anomaly_zscore" ->
      """WITH st AS (
        |  SELECT event_type, count(*) AS n,
        |    CAST(sum(CAST(value AS DECIMAL(30,8))) AS DOUBLE) AS s,
        |    CAST(sum(CAST(value * value AS DECIMAL(30,8))) AS DOUBLE) AS s2
        |  FROM events GROUP BY 1),
        |m AS (SELECT event_type, s / n AS mean,
        |             sqrt((s2 - s * s / n) / n) AS sigma FROM st)
        |SELECT e.event_id, e.event_type, e.value,
        |  (e.value - m.mean) / m.sigma AS z
        |FROM events e JOIN m ON e.event_type = m.event_type
        |WHERE abs(e.value - m.mean) > m.sigma * 3""".stripMargin,
    // constant-valued groups pin to bucket 0 (the hi = lo guard) —
    // same CASE both engines, avoiding divide-by-zero NaN divergence
    "histogram" ->
      """WITH b AS (SELECT event_type, min(value) AS lo, max(value) AS hi
        |           FROM events GROUP BY 1),
        |k AS (
        |  SELECT e.event_type, b.lo, b.hi,
        |    CASE WHEN b.hi = b.lo THEN 0
        |         ELSE CAST(least(floor((e.value - b.lo) / ((b.hi - b.lo) / 20)), 19) AS BIGINT)
        |    END AS bucket
        |  FROM events e JOIN b ON e.event_type = b.event_type)
        |SELECT event_type, bucket, count(*) AS n,
        |  any_value(lo) + bucket * ((any_value(hi) - any_value(lo)) / 20) AS bucket_lo
        |FROM k GROUP BY 1, 2""".stripMargin,
    "resample_hourly" ->
      """WITH c AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n,
        |    CAST(sum(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS sum_value
        |  FROM events GROUP BY 1, 2),
        |s AS (SELECT event_type, min(date_trunc('hour', ts)) AS lo,
        |             max(date_trunc('hour', ts)) AS hi
        |      FROM events GROUP BY 1),
        |g AS (SELECT event_type,
        |        unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
        |      FROM s)
        |SELECT g.event_type, g.hour,
        |  coalesce(c.n, 0) AS n, coalesce(c.sum_value, 0.0) AS sum_value
        |FROM g LEFT JOIN c ON g.event_type = c.event_type AND g.hour = c.hour""".stripMargin)
}
