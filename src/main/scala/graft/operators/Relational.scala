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
object Relational extends RelationalCoreOps with RelationalAnalytics with RelationalTimeseriesLayout with RelationalGovernanceCdc with RelationalExperiments {

  // ---- registry ----------------------------------------------------

  // TPC-H-shaped rows use bare ids (q1…q22): the driver captures
  // Bench's stdout in a 2000-char tail, and at 100 registered queries
  // the descriptive suffixes (q1_pricing, …, used through round 4)
  // no longer fit the line budget. CORRECTNESS_r04 names map 1:1
  // (q1_pricing→q1, q3_shipping→q3, q5_local_supplier→q5,
  // q7_volume→q7, q10_returns→q10, q4_priority→q4, q6_forecast→q6,
  // q12_priority→q12, q14_promo→q14, q19_disjunctive→q19,
  // q22_balance→q22, q18_volume→q18).
  // @transient: a closure in a trait-slice method captures the module
  // (see the Serializable note on the slices); the registry maps are the
  // module's heavy fields (hundreds of lambdas + oracle SQL) and must not
  // ride every task binary — readResolve restores the singleton, so field
  // contents never survive deserialization anyway.
  @transient val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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

  @transient val oracles: Map[String, String] = Map(
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
