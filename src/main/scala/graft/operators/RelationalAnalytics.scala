package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.CacheScope.ScopedDataset
import graft.sources.Tables

/** Analytics slice of [[Relational]].
  *
  * Customer/revenue analytics and robust statistics: funnels,
  * sessions, cohort lifecycles, concentration (Gini/Lorenz/HHI/CR1),
  * price-volume mix, drawdowns, churn labels, winsorized/regression
  * trends.
  *
  * Mixin slice (r13 verdict item 3): the former 8.3k-line
  * Relational.scala is split into themed trait files mixed back into
  * the single `object Relational`, so every bare-name cross-reference
  * and external `Relational.x` usage is unchanged, and member
  * initialization order (traits in declaration order, then the object
  * body's registry) matches the original textual order exactly.
  * Bare `private` members are widened to `private[operators]` so
  * cross-slice references keep resolving.
  */
private[operators] trait RelationalAnalytics extends Serializable { this: Relational.type =>


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

  private[operators] def userLifecycleSql: String =
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

  private[operators] def priceVolumeMixSql: String =
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

  private[operators] def typeJaccardSql: String =
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

  private[operators] def revenueWowSql: String =
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

  private[operators] def drawdownSql: String =
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

  private[operators] def dupChargesSql: String =
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

  private[operators] def categoryDriftSql: String =
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

  private[operators] def tradeMatrixSql: String =
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

  private[operators] def churnLabelSql: String =
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

  private[operators] def lorenzCurveSql: String =
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

  private[operators] def nationCr1Sql: String =
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

  private[operators] def supplierHhiSql: String =
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

  private[operators] def discountElasticitySql: String =
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

  private[operators] def shipLatencySql: String =
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

  private[operators] def priorityLatencySql: String =
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

  private[operators] def mktsegMixSql: String =
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
}
