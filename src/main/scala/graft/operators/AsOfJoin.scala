package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** As-of join — attach to each left row the most recent right row at
  * or before it in time, per key. Spark has no native ASOF operator;
  * per the preference order (compose built-ins before custom plans,
  * SURVEY.md §7.3) this is the union + ordered-window formulation:
  *
  *   union(tagged left, tagged right)
  *     → one shuffle on the key
  *     → in-partition sort by (ts, side)
  *     → running `last(right value, ignoreNulls)` window
  *     → filter back to left rows.
  *
  * That is one exchange + one sort — the same cost profile as a
  * sort-merge join, and the correct 100 TB shape (a per-row range
  * lookup would be a nested-loop join). Right rows sort before left
  * rows at equal timestamps, giving the inclusive `right.ts <=
  * left.ts` match that DuckDB's native ASOF JOIN implements — which
  * is exactly what the oracle uses.
  */
object AsOfJoin {

  /** purchases ASOF LEFT JOIN clicks ON user_id, click.ts <= purchase.ts */
  def purchasesWithLastClick(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), lit(0).as("side"), col("event_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(1).as("side"), col("event_id"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(purchases)
      .withColumn("click_id",
        last(when(col("side") === 0, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("click_ts",
        last(when(col("side") === 0, col("ts")), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("click_id"), col("click_ts"))
  }

  /** Inner variant (unmatched left rows dropped) — the oracle-gated
    * form: nullable columns turn into NaN-vs-NaN noise in cross-engine
    * hash compares, so the gate runs the null-free shape while the
    * LEFT form above stays the library API. */
  def purchasesWithLastClickStrict(spark: SparkSession, dir: String): DataFrame =
    purchasesWithLastClick(spark, dir).filter(col("click_id").isNotNull)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "asof_join" -> purchasesWithLastClickStrict)

  val oracles: Map[String, String] = Map(
    "asof_join" ->
      """SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
        |       c.event_id AS click_id, c.ts AS click_ts
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND c.ts <= p.ts""".stripMargin)
}
