package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.CacheScope.ScopedDataset
import graft.sources.Tables

/** TimeseriesLayout slice of [[Relational]].
  *
  * Time-series machinery (EWMA, TWAP, resample, anomaly/changepoint,
  * gaps-and-islands, intervals, skylines) plus physical layout and
  * format ops (Z-order clustering, partition overwrite, DPP, schema
  * evolution, JSONL/ORC round trips) and rank statistics.
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
private[operators] trait RelationalTimeseriesLayout extends Serializable { this: Relational.type =>


  private[operators] def theilsenTrendSql: String =
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

  private[operators] val KAnon = 5L

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

  private[operators] def kAnonymitySql: String =
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

  private[operators] def quantileNormalizeSql: String =
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

  private[operators] def joinDppSql: String =
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

  private[operators] def schemaEvolutionSql: String =
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

  private[operators] def jsonlRoundtripSql: String =
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

  private[operators] def orcRoundtripSql: String =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS sum_vq,
      |  CAST(min(epoch_us(ts)) AS BIGINT) AS min_us,
      |  CAST(max(epoch_us(ts)) AS BIGINT) AS max_us
      |FROM events WHERE event_type <> 'view' GROUP BY 1""".stripMargin

  private[operators] val obsCounter = new java.util.concurrent.atomic.AtomicLong(0L)

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

  private[operators] def observedScanSql: String =
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

  private[operators] def fanoFactorSql: String =
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

  private[operators] def kendallTauSql: String =
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

  private[operators] def tClosenessSql: String =
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

  private[operators] def tableFingerprintSql: String =
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

  private[operators] def aucRankSql: String =
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
  private[operators] def chi2Full(spark: SparkSession, dir: String): DataFrame = {
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
}
