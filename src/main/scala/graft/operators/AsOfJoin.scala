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
    // event_id as the final tiebreak (ADVICE r9): two clicks sharing
    // (user_id, ts) would otherwise leave the pick order-dependent.
    // Traversal is ts asc / event_id asc, and `last` takes the
    // nearest preceding row — so the deterministic rule is: max ts,
    // then MAX event_id among that ts's clicks (the oracle encodes
    // the same rule explicitly).
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("side").asc, col("event_id").asc)
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

  /** FORWARD as-of — the mirror direction: attach the NEXT right row
    * at or after each left row (lead-time joins: next maintenance
    * event, next price revision, time-to-conversion). Same one-
    * exchange union+window shape, traversed in DESCENDING time, with
    * clicks still sorting first at equal timestamps so the `c.ts >=
    * p.ts` match stays inclusive. The oracle is an explicit argmin
    * over the qualifying pairs (NOT DuckDB's native ASOF JOIN, whose
    * equal-ts pick is arbitrary — ADVICE r9). */
  def purchasesWithNextClick(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), lit(0).as("side"), col("event_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(1).as("side"), col("event_id"))
    // same deterministic tie rule as the backward form (ADVICE r9):
    // traversal is ts desc / event_id asc, `last` takes the nearest
    // preceding row — min ts among clicks at/after the purchase, then
    // MAX event_id among that ts's clicks.
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("side").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(purchases)
      .withColumn("click_id",
        last(when(col("side") === 0, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("click_ts",
        last(when(col("side") === 0, col("ts")), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("click_id"), col("click_ts"))
      .filter(col("click_id").isNotNull) // null-free gate, like asof_join
  }

  /** TOLERANCE-bounded as-of (pandas `merge_asof(tolerance=…)`): the
    * backward match is only valid while FRESH — a click older than
    * one hour must not be attributed. Because the backward pick is
    * the MAXIMUM click ts ≤ purchase ts, "last click, if within the
    * band" is provably identical to "last click within the band"
    * (any other candidate is older still), so the tolerance is a
    * post-pick filter on the already-joined row — zero extra plan
    * cost over [[purchasesWithLastClickStrict]] — while the oracle
    * states the band INSIDE the join, pinning the equivalence.
    * Emits the staleness for downstream attribution weighting. */
  def purchasesWithFreshClick(spark: SparkSession, dir: String): DataFrame =
    purchasesWithLastClickStrict(spark, dir)
      .withColumn("staleness_us",
        unix_micros(col("purchase_ts")) - unix_micros(col("click_ts")))
      .filter(col("staleness_us") <= 3600000000L)

  /** NEAREST as-of — attach the temporally closest click in EITHER
    * direction (sensor alignment, nearest-quote joins: when the
    * business question is "what was happening around this moment",
    * not strictly before/after). Composition, not a new scan shape:
    * ONE union frame, one exchange on the key, and the backward and
    * forward candidates come from two window traversals (ts asc /
    * ts desc) over the same partitioning — Spark reuses the exchange
    * and pays one extra in-partition sort, still the sort-merge cost
    * profile. The pick is then a per-row expression on integral
    * micros: prev wins iff its |Δts| ≤ next's (backward-preferred on
    * exact ties, then the family's max-event_id rule inside each
    * side — the oracle spells out the identical (dist, side,
    * click_id) ordering). */
  def purchasesWithNearestClick(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), lit(0).as("side"), col("event_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(1).as("side"), col("event_id"))
    val wPrev = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("side").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("side").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val clickCol = when(col("side") === 0, col("event_id"))
    val clickTs = when(col("side") === 0, col("ts"))
    clicks.unionByName(purchases)
      .withColumn("prev_id", last(clickCol, ignoreNulls = true).over(wPrev))
      .withColumn("prev_ts", last(clickTs, ignoreNulls = true).over(wPrev))
      .withColumn("next_id", last(clickCol, ignoreNulls = true).over(wNext))
      .withColumn("next_ts", last(clickTs, ignoreNulls = true).over(wNext))
      .filter(col("side") === 1)
      .withColumn("pick_prev",
        col("next_id").isNull ||
          (col("prev_id").isNotNull &&
            unix_micros(col("ts")) - unix_micros(col("prev_ts"))
              <= unix_micros(col("next_ts")) - unix_micros(col("ts"))))
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"),
        when(col("pick_prev"), col("prev_id")).otherwise(col("next_id")).as("click_id"),
        when(col("pick_prev"), col("prev_ts")).otherwise(col("next_ts")).as("click_ts"))
      .filter(col("click_id").isNotNull) // null-free gate, like asof_join
  }

  /** Rolling exact MEDIAN over a trailing-hour event-time window —
    * the holistic-aggregate-over-RANGE-frame shape native window
    * frames cannot express (median is not frame-decomposable; Spark
    * has no median window function and `window_range`'s native RANGE
    * frame only fits distributive/algebraic aggregates). The
    * scalable form is the bucketed one-sided range self-join
    * ([[eventPairsWithin60s]]'s cell trick, trailing-only): the
    * right side registers in its own hour-cell and the NEXT one, the
    * left probes its own cell, so the theta-band becomes an
    * equi-join on (user, cell) + residual filter with ≤2× shuffle
    * fan-out, then one exact interpolated `percentile` per left row.
    * Interpolation is the measured-bit-equal (n−1)·q form both
    * engines share (agg_median precedent); window population always
    * includes the row itself, so the median is never null. */
  def windowMedian(spark: SparkSession, dir: String): DataFrame = {
    val hourUs = 3600000000L
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"),
        (unix_micros(col("ts")) / lit(hourUs)).cast("long").as("cell"))
    val left = ev.select(col("user_id"), col("event_id"), col("ts"), col("cell"))
    val r0 = ev.select(col("user_id"), col("ts").as("r_ts"),
      col("value").as("r_value"), col("cell"))
    val right = r0.unionByName(r0.withColumn("cell", col("cell") + 1))
    left.join(right, Seq("user_id", "cell"))
      .filter(col("r_ts") <= col("ts") &&
        unix_micros(col("r_ts")) >= unix_micros(col("ts")) - hourUs)
      .groupBy(col("user_id"), col("event_id"), col("ts"))
      .agg(count(lit(1)).as("n_window"),
        percentile(col("r_value"), lit(0.5)).as("med_value"))
  }

  /** Range join: same-user event pairs within 60 seconds — the
    * non-equi time-window join. Naively this is a per-user cross join
    * with an inequality filter; the scalable form buckets time into
    * window-sized cells, registers the RIGHT side in its own cell and
    * both neighbors, and probes the LEFT side in its own cell only.
    * Any pair within one window length differs by at most one bucket,
    * and exactly ONE of the three right-side copies lands in the left
    * row's bucket — so the theta-join becomes an equi-join on
    * (user, bucket) + residual filter, with no duplicate matches and
    * no distinct. Shuffle volume is 4× the input rows, independent of
    * the time span — versus the per-user quadratic blowup of the
    * naive form. */
  def eventPairsWithin60s(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"),
        (unix_micros(col("ts")) / lit(60000000L)).cast("long").as("bucket"))
    val a = ev.select(col("user_id"), col("event_id").as("id_a"),
      col("ts").as("ts_a"), col("bucket"))
    val b0 = ev.select(col("user_id"), col("event_id").as("id_b"),
      col("ts").as("ts_b"), col("bucket"))
    val b = b0
      .unionByName(b0.withColumn("bucket", col("bucket") - 1))
      .unionByName(b0.withColumn("bucket", col("bucket") + 1))
    a.join(b, Seq("user_id", "bucket"))
      .filter(col("id_a") < col("id_b") &&
        abs(unix_micros(col("ts_a")) - unix_micros(col("ts_b"))) <= 60000000L)
      .select(col("user_id"), col("id_a"), col("id_b"),
        ((unix_micros(col("ts_b")) - unix_micros(col("ts_a"))) / lit(1000000.0)).as("dt_sec"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "asof_join"    -> purchasesWithLastClickStrict,
    "asof_forward" -> purchasesWithNextClick,
    "asof_nearest" -> purchasesWithNearestClick,
    "asof_tolerance" -> purchasesWithFreshClick,
    "range_join"   -> eventPairsWithin60s,
    "window_median" -> windowMedian)

  val oracles: Map[String, String] = Map(
    // explicit argmin formulations rather than DuckDB's native ASOF
    // JOIN (ADVICE r9): ASOF's pick among equal-ts candidates is
    // arbitrary, so the oracle spells out the implementation's
    // deterministic tie rule — nearest ts, then max event_id
    "asof_join" ->
      """SELECT purchase_id, user_id, purchase_ts, click_id, click_ts FROM (
        |  SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
        |         c.event_id AS click_id, c.ts AS click_ts,
        |         row_number() OVER (PARTITION BY p.event_id
        |           ORDER BY c.ts DESC, c.event_id DESC) AS rn
        |  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |  JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |    ON p.user_id = c.user_id AND c.ts <= p.ts) t
        |WHERE rn = 1""".stripMargin,
    "asof_forward" ->
      """SELECT purchase_id, user_id, purchase_ts, click_id, click_ts FROM (
        |  SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
        |         c.event_id AS click_id, c.ts AS click_ts,
        |         row_number() OVER (PARTITION BY p.event_id
        |           ORDER BY c.ts ASC, c.event_id DESC) AS rn
        |  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |  JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |    ON p.user_id = c.user_id AND c.ts >= p.ts) t
        |WHERE rn = 1""".stripMargin,
    // band stated IN the join (the post-pick filter the engine runs
    // is equivalent because the pick is the band's maximum)
    "asof_tolerance" ->
      """SELECT purchase_id, user_id, purchase_ts, click_id, click_ts,
        |       epoch_us(purchase_ts) - epoch_us(click_ts) AS staleness_us
        |FROM (
        |  SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
        |         c.event_id AS click_id, c.ts AS click_ts,
        |         row_number() OVER (PARTITION BY p.event_id
        |           ORDER BY c.ts DESC, c.event_id DESC) AS rn
        |  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |  JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |    ON p.user_id = c.user_id AND c.ts <= p.ts
        |   AND epoch_us(p.ts) - epoch_us(c.ts) <= 3600000000) t
        |WHERE rn = 1""".stripMargin,
    // nearest = argmin |Δts|, backward preferred on exact distance
    // ties, then max event_id within the winning side — the same
    // ordering the engine's pick expression implements
    "asof_nearest" ->
      """SELECT purchase_id, user_id, purchase_ts, click_id, click_ts FROM (
        |  SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
        |         c.event_id AS click_id, c.ts AS click_ts,
        |         row_number() OVER (PARTITION BY p.event_id
        |           ORDER BY abs(epoch_us(p.ts) - epoch_us(c.ts)) ASC,
        |                    CASE WHEN c.ts <= p.ts THEN 0 ELSE 1 END ASC,
        |                    c.event_id DESC) AS rn
        |  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |  JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |    ON p.user_id = c.user_id) t
        |WHERE rn = 1""".stripMargin,
    "range_join" ->
      """SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
        |  (epoch_ns(b.ts) - epoch_ns(a.ts)) / 1e9 AS dt_sec
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND a.event_id < b.event_id
        | AND abs(epoch_ns(b.ts) - epoch_ns(a.ts)) <= 60000000000""".stripMargin,
    // trailing-hour window population via the same band predicate
    // (per-timestamp micro truncation); quantile_cont shares Spark
    // percentile's (n-1)·q interpolation — measured bit-equal
    "window_median" ->
      """SELECT e.user_id, e.event_id, e.ts,
        |  CAST(count(*) AS BIGINT) AS n_window,
        |  quantile_cont(r.value, 0.5) AS med_value
        |FROM events e JOIN events r
        |  ON r.user_id = e.user_id AND r.ts <= e.ts
        | AND epoch_ns(r.ts) // 1000 >= epoch_ns(e.ts) // 1000 - 3600000000
        |GROUP BY 1, 2, 3""".stripMargin)
}
