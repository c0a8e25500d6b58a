package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Reshaping + skew-tolerant aggregation patterns (SURVEY.md §2.2
  * categories with no reference implementation: pivot, nested
  * collections, date intervals, and explicit skew mitigation).
  */
object Reshape {

  private def dsum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast(DecimalType(30, 4))).cast("double")

  /** Pivot: order totals per priority × status. Status values are
    * pinned (`Seq("F","O","P")`) so the output schema is static — at
    * scale an unpinned pivot forces an extra distinct-values job. */
  def pivotStatus(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(dsum(col("o_totalprice")))

  /** Multi-aggregate pivot — the pivot surface [[pivotStatus]]
    * doesn't exercise: TWO measures (count + exact decimal sum) per
    * pivot value, yielding the `<value>_<measure>` wide layout
    * (F_n/F_sum/...) a reporting sheet expects from one pass. Still
    * one expand-free aggregate: Spark plans the pivot as conditional
    * aggregation, identical to the oracle's CASE columns. */
  def pivotMulti(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum"))

  /** Sorted collection aggregation: active order-years per customer as
    * an array. collect_set + array_sort (NOT collect_list, whose order
    * is partition-dependent) keeps the result deterministic. */
  def arrayAggYears(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy("o_custkey")
      .agg(
        array_sort(collect_set(year(col("o_orderdate")).cast("long"))).as("years"),
        countDistinct(year(col("o_orderdate"))).as("n_years"))

  /** Gated form of [[arrayAggYears]]: the sorted array serialized to a
    * canonical comma string. The driver's comparator lexsorts columns
    * through pandas, which cannot hash an `array<bigint>` cell — the
    * string form carries the identical information and is comparable.
    * Library users call [[arrayAggYears]] for the typed array. */
  def arrayAggYearsGated(spark: SparkSession, dir: String): DataFrame =
    arrayAggYears(spark, dir)
      .select(col("o_custkey"), array_join(col("years"), ",").as("years"), col("n_years"))

  /** String aggregation, deterministically ordered. */
  def stringAggPriorities(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy("o_custkey")
      .agg(array_join(array_sort(collect_set(col("o_orderpriority"))), ",").as("priorities"))

  /** Interval arithmetic in whole days. (Month intervals are
    * deliberately absent from the oracle-gated surface: engines
    * disagree on month-end overflow — Spark clamps Jan 31 + 3 months
    * to Apr 30, DuckDB rolls into May 1 — so month arithmetic is not
    * cross-engine comparable.) */
  def dateIntervals(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"),
        (col("o_orderdate") + expr("INTERVAL 90 DAYS")).as("deadline"),
        (col("o_orderdate") + expr("INTERVAL 60 DAYS")).as("followup"))

  /** Unpivot/melt — [[pivotStatus]]'s inverse and the wide→long
    * reshape a feature pipeline runs before per-metric aggregation:
    * each lineitem row fans out to one (metric, value) row per
    * measure column. Pure narrow map (Spark plans `Expand`: k output
    * rows per input row, no shuffle, no driver involvement); the
    * measure list is pinned so the schema is static, mirroring the
    * pinned pivot. At 100 TB melt multiplies rows ×k but each output
    * row is narrow — the Expand sits below any later aggregation's
    * partial phase, so the fan-out never crosses a shuffle
    * unaggregated. */
  def meltLineitem(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
        "metric", "value")

  /** Two-phase salted aggregation — the explicit skew-mitigation
    * pattern: when one group key dominates (a hot word, a bot user),
    * a single hash-partitioned aggregation puts the whole hot group on
    * one task. Salting splits each group into `nSalts` subgroups for
    * the first (wide, parallel) partial aggregation, then merges the
    * tiny salted partials exactly. Results are identical to the
    * direct aggregation — which is exactly what the oracle checks. */
  def saltedSum(
      df: DataFrame, keyCol: String, valCol: String, nSalts: Int): DataFrame =
    df.withColumn("_salt", pmod(hash(col(keyCol), monotonically_increasing_id()), lit(nSalts)))
      .groupBy(col(keyCol), col("_salt"))
      .agg(sum(col(valCol).cast(DecimalType(30, 4))).as("_partial"),
        count(lit(1)).as("_n"))
      .groupBy(col(keyCol))
      .agg(sum(col("_partial")).cast("double").as("sum_val"),
        sum(col("_n")).as("n"))

  /** Skew-safe aggregation via 16-way key salting — two-stage
    * (salted partial → final) sum; see [[saltedSum]] for the shape. */
  def aggSalted(spark: SparkSession, dir: String): DataFrame =
    saltedSum(Tables.lineitem(spark, dir), "l_returnflag", "l_quantity", nSalts = 16)
      .withColumnRenamed("l_returnflag", "flag")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pivot_status"    -> pivotStatus,
    "array_agg_years" -> arrayAggYearsGated,
    "string_agg"      -> stringAggPriorities,
    "date_intervals"  -> dateIntervals,
    "agg_salted"      -> aggSalted,
    "pivot_multi"     -> pivotMulti,
    "melt_metrics"    -> meltLineitem)

  val oracles: Map[String, String] = Map(
    "pivot_status" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CASE WHEN o_orderstatus='F' THEN CAST(o_totalprice AS DECIMAL(30,4)) END) AS DOUBLE) AS F,
        |  CAST(sum(CASE WHEN o_orderstatus='O' THEN CAST(o_totalprice AS DECIMAL(30,4)) END) AS DOUBLE) AS O,
        |  CAST(sum(CASE WHEN o_orderstatus='P' THEN CAST(o_totalprice AS DECIMAL(30,4)) END) AS DOUBLE) AS P
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "array_agg_years" ->
      """SELECT o_custkey,
        |  list_aggregate(list_sort(list(DISTINCT CAST(year(o_orderdate) AS BIGINT))), 'string_agg', ',') AS years,
        |  count(DISTINCT year(o_orderdate)) AS n_years
        |FROM orders GROUP BY o_custkey""".stripMargin,
    "pivot_multi" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS BIGINT) AS F_n,
        |  CAST(sum(CASE WHEN o_orderstatus='F' THEN CAST(o_totalprice AS DECIMAL(30,4)) END) AS DOUBLE) AS F_sum,
        |  CAST(sum(CASE WHEN o_orderstatus='O' THEN 1 ELSE 0 END) AS BIGINT) AS O_n,
        |  CAST(sum(CASE WHEN o_orderstatus='O' THEN CAST(o_totalprice AS DECIMAL(30,4)) END) AS DOUBLE) AS O_sum,
        |  CAST(sum(CASE WHEN o_orderstatus='P' THEN 1 ELSE 0 END) AS BIGINT) AS P_n,
        |  CAST(sum(CASE WHEN o_orderstatus='P' THEN CAST(o_totalprice AS DECIMAL(30,4)) END) AS DOUBLE) AS P_sum
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "string_agg" ->
      """SELECT o_custkey,
        |  list_aggregate(list_sort(list(DISTINCT o_orderpriority)), 'string_agg', ',') AS priorities
        |FROM orders GROUP BY o_custkey""".stripMargin,
    "date_intervals" ->
      """SELECT o_orderkey,
        |  o_orderdate + INTERVAL 90 DAY AS deadline,
        |  o_orderdate + INTERVAL 60 DAY AS followup
        |FROM orders""".stripMargin,
    // the salted two-phase result must equal the plain grouped sum —
    // that equality IS the correctness property of salting
    "agg_salted" ->
      """SELECT l_returnflag AS flag,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS sum_val,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    // UNION ALL replay keeps the metric labels textual and the values
    // untouched doubles — bag semantics match the Expand exactly
    "melt_metrics" ->
      """SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem""".stripMargin)
}
