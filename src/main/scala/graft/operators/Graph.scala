package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.CacheScope.ScopedDataset
import graft.StateMode
import graft.sources.Tables

/** Iterative graph analytics over the fixture's bipartite
  * customer↔supplier purchase graph (orders ⋈ lineitem). The engine
  * already gates two connected-components implementations
  * (`dedup_cluster`, `cc_star`); PageRank is the other canonical
  * iterative-MapReduce workload (the motivating example of the
  * original MapReduce/Pregel papers the reference's design area comes
  * from), and it exercises a shape CC does not: per-round JOIN +
  * re-AGGREGATION over a static edge relation with evolving vertex
  * state.
  *
  * Determinism (the whole point of the formulation): ranks live on an
  * integer lattice. SCALE = 2^30; rank₀ = SCALE div N; each round is
  *
  *   r'(v) = tele + (17 * Σ_{u→v} (r(u) div deg(u))) div 20
  *   tele  = (3 * (SCALE div N)) div 20            (d = 0.85 = 17/20)
  *
  * — nothing but BIGINT multiply/add and trunc-toward-zero division,
  * which Spark `div`, Java `/` and DuckDB `//` all agree on (verified
  * round 4 for the quantized k-means), so a 4-round unrolled DuckDB
  * CTE chain replays it bit-exact. The final `rank` column divides by
  * 2^30.0 (a power of two: exact in IEEE, both engines identical).
  *
  * Scale shape (100 TB): edges and out-degrees are computed once and
  * persisted — the per-round state is one (id, rank) long pair per
  * vertex, and each round is exactly one shuffle (the contribution
  * groupBy; the edge join reuses the persisted edge relation). Fixed
  * round count means no driver-side convergence polling at all — this
  * is the batch-synchronous formulation every Pregel-style system
  * runs. The only driver-side value is N (one scalar count, same
  * metadata role as ann_ivf's 16 centroids). The symmetric-edge
  * construction guarantees every vertex has in- AND out-degree ≥ 1,
  * so no dangling-mass redistribution step is needed.
  */
object Graph {

  private[operators] val Scale = 1L << 30
  private[operators] val Rounds = 4
  private[operators] val SuppOffset = 1000000L

  /** Distinct customer→supplier pairs, symmetrized into a directed
    * edge list (u, v) with supplier ids offset out of the customer id
    * range. */
  private[operators] def purchaseEdges(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), (col("l_suppkey") + SuppOffset).as("s"))
      .distinct()
    base.select(col("c").as("u"), col("s").as("v"))
      .unionAll(base.select(col("s").as("u"), col("c").as("v")))
  }

  /** Integer-lattice PageRank core over an arbitrary SYMMETRIC edge
    * list (u, v) — extracted so specs can rank planted graphs.
    * Returns (id, r) with r on the [[Scale]] lattice.
    *
    * Round shape (round-7 rewrite, measured 4.9 → 4.4 s run3 /
    * 6.0 → 5.5 s run2 — the one-time edge build dominates what's
    * left): the
    * static relation is persisted ONCE as (u, v, deg) — out-degree
    * denormalized onto the edges — hash-partitioned on the join key
    * BEFORE the persist, so the cached InMemoryRelation advertises
    * that partitioning and every round's join reuses it: per round
    * only the TINY (id, rank) vertex state shuffles to meet the
    * cache, plus the one partial+final contribution sum. The previous
    * form (vertex ⋈ outdeg message join, then edges ⋈ messages)
    * planned a third exchange per round for the vertex-message join;
    * denormalizing deg trades 8 bytes per cached edge for that
    * exchange — at any scale the static side is sorted/partitioned
    * once and read R times, the Pregel invariant. r div deg is
    * computed per EDGE here but is identical per source vertex, so
    * the lattice arithmetic (and the oracle) is unchanged. */
  private[operators] def rankEdges(edgesIn: DataFrame,
      broadcastState: Boolean = false): DataFrame = {
    val edges = edgesIn.persistScoped()
    val outdeg = edges.groupBy(col("u")).agg(count(lit(1)).as("deg"))
    // N: vertex count — one scalar to the driver (metadata, not data);
    // it parameterizes the integer constants below, which must be
    // Scala-side longs so the oracle can embed the identical literals.
    val n = outdeg.count()
    val r0 = Scale / n
    val tele = (3L * r0) / 20L
    val edgeDeg = edges.join(outdeg, "u")
      .select(col("u"), col("v"), col("deg"))
      .repartition(col("u"))
      .persistScoped()
    var r = outdeg.select(col("u").as("id"), lit(r0).as("r"))
    for (_ <- 1 to Rounds) {
      r = edgeDeg.as("e")
        .join(if (broadcastState) broadcast(r.as("p")) else r.as("p"),
          col("e.u") === col("p.id"))
        .groupBy(col("e.v"))
        .agg(sum(expr("p.r div e.deg")).as("sm"))
        .select(col("v").as("id"),
          (lit(tele) + expr("(17 * sm) div 20")).as("r"))
      // measured: per-round localCheckpoint (the dedup_cluster fix)
      // LOSES here — 4 bounded rounds compile fine as one tree
      // (run3 4.2 s vs 5.4 s checkpointed), because the checkpoint
      // materialization tax outweighs the lineage saving when the
      // round count is a small constant
    }
    r
  }

  /** PageRank over the customer–part purchase graph — bounded-round
    * BSP on the 2²⁰ integer lattice (see [[rankEdges]]); edges persist
    * once pre-partitioned, rounds shuffle rank state only. */
  def pagerank(spark: SparkSession, dir: String): DataFrame =
    rankEdges(purchaseEdges(spark, dir))
      .select(col("id"), col("r").as("rank_scaled"),
        (col("r") / lit(Scale.toDouble)).as("rank"))

  /** DuckDB replay: identical integer lattice, rounds unrolled as a
    * CTE chain (recursive CTEs disallow aggregation in the recursive
    * term, and unrolling keeps the per-round formula textually
    * identical to the Spark side). sum(BIGINT) is HUGEINT in DuckDB —
    * cast back before the 17/20 step so the lattice stays BIGINT. */
  private def pagerankSql: String = {
    val rounds = (1 to Rounds).map { i =>
      s"""r$i AS (
         |  SELECT e.v AS id,
         |    (SELECT tele FROM consts)
         |      + ((17 * CAST(sum(p.r // d.deg) AS BIGINT)) // 20) AS r
         |  FROM edges e
         |  JOIN outdeg d ON e.u = d.u
         |  JOIN r${i - 1} p ON e.u = p.id
         |  GROUP BY e.v)""".stripMargin
    }.mkString(",\n")
    s"""WITH base AS (
       |  SELECT DISTINCT o_custkey AS c, l_suppkey + $SuppOffset AS s
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |edges AS (SELECT c AS u, s AS v FROM base
       |          UNION ALL SELECT s AS u, c AS v FROM base),
       |outdeg AS (SELECT u, count(*) AS deg FROM edges GROUP BY u),
       |consts AS (SELECT ($Scale // count(*)) AS r0,
       |                  ((3 * ($Scale // count(*))) // 20) AS tele
       |           FROM outdeg),
       |r0 AS (SELECT u AS id, (SELECT r0 FROM consts) AS r FROM outdeg),
       |$rounds
       |SELECT id, r AS rank_scaled, r / ${Scale.toDouble} AS rank
       |FROM r$Rounds""".stripMargin
  }

  private[operators] val CoK = 20

  /** Part-part co-purchase counts, top-[[CoK]] — the bipartite-
    * projection / market-basket primitive (item-item similarity,
    * recommendation candidate generation). Baskets are the DISTINCT
    * parts of an order, so multi-lineitem repeats of one part don't
    * inflate pair counts; the self-join enumerates C(basket, 2) pairs
    * per order with `a < b` canonicalization.
    *
    * Scale shape: the join shuffles on the order key, so per-task
    * work is bounded by Σ C(basket_i, 2) — basket size is a business
    * bound (dozens), NOT a data-volume bound, which is what keeps the
    * projection from going quadratic the way an unguarded similarity
    * self-join would. The top-k is a TakeOrderedAndProject (asserted
    * in PlanAuditSpec), never a global sort. */
  def copurchaseTopk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // basket form, not a self-join: collect_set aggregates each
    // order's distinct parts in ONE shuffle (with map-side partial
    // collection), pairs are emitted narrowly from the sorted basket
    // (typed flatMap — a nested-loop over a small array is closure
    // territory), and one more shuffle counts pairs. The self-join
    // formulation scanned and distinct-shuffled the base twice.
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .groupBy(col("ok"))
      .agg(sort_array(collect_set(col("pk"))).as("parts"))
      .select(col("parts")).as[Seq[Long]]
      .flatMap { ps =>
        for { i <- ps.indices.iterator; j <- (i + 1) until ps.size }
          yield (ps(i), ps(j))
      }
      .toDF("part_a", "part_b")
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_orders").desc, col("part_a").asc, col("part_b").asc)
      .limit(CoK)
  }

  private[operators] val AssocK = 20

  /** Association rules over the co-purchase pairs — the
    * support/confidence/lift triple (Agrawal & Srikant 1994) that
    * turns [[copurchaseTopk]]'s raw counts into actionable rules:
    * conf(a→b) = P(b|a) answers "given a in the basket, how likely
    * is b", lift = P(ab)/(P(a)P(b)) answers "is that better than
    * chance". All three live on the 2²⁰ lattice (`(2²⁰·n_ab) div
    * n_a`, products widened to decimal(38)/HUGEINT since
    * 2²⁰·n_ab·N ≈ 2⁸⁰ at web scale) so the gate is hash-exact; only
    * the top-[[AssocK]] support pairs are scored (the business
    * shape: rules are for the head, the tail is noise).
    *
    * Scale shape: baskets aggregate ONCE and persist (pair
    * enumeration and item margins both read them — the bigram_pmi
    * rule); pair counts bound by Σ C(basket, 2) as in copurchase;
    * the top-K is a TakeOrderedAndProject; and the two margin
    * attachments broadcast the 20-row rule table against the item
    * counts — at 100 TB the |parts| margin relation never moves. N
    * is one driver scalar (the pagerank-N precedent). */
  def assocRules(spark: SparkSession, dir: String): DataFrame =
    assocRulesOf(Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")))

  /** The rule-mining core over an arbitrary (ok, pk) item stream —
    * extracted for planted-implication specs. */
  private[operators] def assocRulesOf(items: DataFrame): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    val baskets = items
      .groupBy(col("ok"))
      .agg(sort_array(collect_set(col("pk"))).as("parts"))
      .persistScoped()
    val nOrders = baskets.count()
    val item = baskets.select(explode(col("parts")).as("pk"))
      .groupBy(col("pk")).agg(count(lit(1)).as("n_item"))
    val top = baskets.select(col("parts")).as[Seq[Long]]
      .flatMap { ps =>
        for { i <- ps.indices.iterator; j <- (i + 1) until ps.size }
          yield (ps(i), ps(j))
      }
      .toDF("part_a", "part_b")
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("n_ab"))
      .orderBy(col("n_ab").desc, col("part_a").asc, col("part_b").asc)
      .limit(AssocK)
    val withA = item.select(col("pk").as("part_a"), col("n_item").as("n_a"))
      .join(broadcast(top), "part_a")
    item.select(col("pk").as("part_b"), col("n_item").as("n_b"))
      .join(broadcast(withA), "part_b")
      .select(col("part_a"), col("part_b"), col("n_ab"), col("n_a"), col("n_b"),
        expr("cast((1048576 * cast(n_ab as decimal(38,0))) div n_a as bigint)").as("conf_ab_q"),
        expr("cast((1048576 * cast(n_ab as decimal(38,0))) div n_b as bigint)").as("conf_ba_q"),
        expr(s"cast((1048576 * cast(n_ab as decimal(38,0)) * $nOrders)" +
          " div (cast(n_a as decimal(38,0)) * n_b) as bigint)").as("lift_q"))
  }

  private def assocRulesSql: String =
    s"""WITH b AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
       |n AS (SELECT count(DISTINCT ok) AS n FROM b),
       |item AS (SELECT pk, count(*) AS n_item FROM b GROUP BY pk),
       |pair AS (SELECT a.pk AS part_a, b2.pk AS part_b, count(*) AS n_ab
       |         FROM b a JOIN b b2 ON a.ok = b2.ok AND a.pk < b2.pk
       |         GROUP BY 1, 2),
       |top AS (SELECT * FROM pair
       |        ORDER BY n_ab DESC, part_a, part_b LIMIT $AssocK)
       |SELECT part_a, part_b, CAST(n_ab AS BIGINT) AS n_ab,
       |  CAST(ia.n_item AS BIGINT) AS n_a, CAST(ib.n_item AS BIGINT) AS n_b,
       |  CAST((1048576 * CAST(n_ab AS HUGEINT)) // ia.n_item AS BIGINT) AS conf_ab_q,
       |  CAST((1048576 * CAST(n_ab AS HUGEINT)) // ib.n_item AS BIGINT) AS conf_ba_q,
       |  CAST((1048576 * CAST(n_ab AS HUGEINT) * (SELECT n FROM n))
       |       // (CAST(ia.n_item AS HUGEINT) * ib.n_item) AS BIGINT) AS lift_q
       |FROM top
       |JOIN item ia ON top.part_a = ia.pk
       |JOIN item ib ON top.part_b = ib.pk""".stripMargin

  /** Triangle enumeration over the ngram near-dup pair graph — the
    * basis of clustering-coefficient / graph-density analysis (here:
    * "how clique-like are near-dup clusters", which distinguishes
    * true k-way duplicates from chains of pairwise-similar drafts).
    * The pair relation is already canonically oriented (doc_a <
    * doc_b), so the two-hop join (a,b)⋈(b,c) + closing check (a,c)
    * emits each triangle EXACTLY once with a < b < c — the standard
    * dedup-free enumeration. At web scale the orientation would be by
    * degree (low→high), bounding per-vertex wedge work by the arboric
    * degeneracy rather than the max degree; with near-dup graphs the
    * canonical id orientation suffices (components are tiny by
    * construction). Pairs are persisted once — the shingle pipeline
    * must not run three times for a three-way self-join. */
  def triangles(spark: SparkSession, dir: String): DataFrame = {
    val p = Dedup.dedupNgramJaccard(spark, dir)
      .select(col("doc_a"), col("doc_b"))
      .persistScoped()
    p.as("e1")
      .join(p.as("e2"), col("e1.doc_b") === col("e2.doc_a"))
      .join(p.as("e3"),
        col("e3.doc_a") === col("e1.doc_a") && col("e3.doc_b") === col("e2.doc_b"))
      .select(col("e1.doc_a").as("doc_a"), col("e1.doc_b").as("doc_b"),
        col("e2.doc_b").as("doc_c"))
  }

  /** Local clustering coefficient per node of the near-dup pair
    * graph — [[triangles]] taken to its per-vertex conclusion: for
    * every document in the pair graph, its degree, incident-triangle
    * count, and the coefficient 2·tri/(deg·(deg−1)) on the 2²⁰
    * lattice (exact integer division — no floats). A coefficient of
    * 2²⁰ means the node's neighborhood is a clique (a true k-way
    * duplicate group); low values flag chain-shaped similarity
    * (drafts A~B~C where A≁C) that a transitive dedup would
    * over-merge. Scale shape: the canonical a<b<c enumeration from
    * [[triangles]] (each triangle once), explode to 3 per-vertex
    * increments, partial+final count; degree is one groupBy over the
    * symmetrized pairs; one key join aligns the two — the shingle
    * pipeline runs once behind the persistScoped pair relation. */
  def clusteringCoeff(spark: SparkSession, dir: String): DataFrame = {
    val p = Dedup.dedupNgramJaccard(spark, dir)
      .select(col("doc_a"), col("doc_b"))
      .persistScoped()
    val deg = p.select(col("doc_a").as("u"))
      .unionAll(p.select(col("doc_b").as("u")))
      .groupBy(col("u")).agg(count(lit(1)).as("deg"))
    val tri = p.as("e1")
      .join(p.as("e2"), col("e1.doc_b") === col("e2.doc_a"))
      .join(p.as("e3"),
        col("e3.doc_a") === col("e1.doc_a") && col("e3.doc_b") === col("e2.doc_b"))
      .select(explode(array(col("e1.doc_a"), col("e1.doc_b"), col("e2.doc_b"))).as("u"))
      .groupBy(col("u")).agg(count(lit(1)).as("n_tri"))
    deg.join(tri, Seq("u"), "left")
      .select(col("u").as("doc_id"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .withColumn("coeff_q",
        expr("case when deg >= 2 then (2 * n_tri * 1048576) div (deg * (deg - 1)) " +
          "else cast(0 as bigint) end"))
  }

  private[operators] val BfsRounds = 4
  private[operators] val BfsMaxSeedSupp = 3L

  /** Multi-source BFS hop distance over the purchase graph — the
    * shortest-path primitive (blast-radius / influence-horizon
    * queries: "every customer within N hops of these suppliers").
    * Seeds are suppliers 1..[[BfsMaxSeedSupp]]; [[BfsRounds]] fixed
    * BSP rounds of relax-and-minimize: each round joins the current
    * (id, d) relation to the persisted symmetric edge list, unions
    * the existing distances, and takes min(d) per vertex. Fixed
    * round count (not to-convergence) keeps cost deterministic and
    * the oracle an unrolled CTE chain — the pagerank precedent; all
    * arithmetic is integer hops, so the gate is trivially hash-
    * exact. Scale shape: per round one key-only join + one
    * partial+final min aggregate; the edges persist pre-partitioned
    * once and every round reuses them (the Pregel invariant). A
    * frontier-delta variant (propagate only vertices whose d
    * improved) is the constant-factor dial at scale — same joins,
    * strictly smaller left side each round. */
  def graphBfs(spark: SparkSession, dir: String): DataFrame =
    bfsParts(spark, dir)._2

  /** Shipped relax-loop strategy for the hop-BFS family
    * ([[bfsParts]], [[graphDiameter]]'s sweeps) — see
    * [[bfsDistances]] for the candidates. Chosen by the r15
    * interleaved A/B (BfsLab, sf0.1, 3 reps, bfs_reach shape):
    * frontier 3.7/3.9/4.0 s ≈ ckpt 3.7/3.7/3.8 (within rep noise)
    * vs legacy 5.9/6.0/6.6 — the lineage cut is worth ~40% and
    * frontier is the at-scale shape (per-round join left side is the
    * NEW frontier, not the whole reached set), so it ships. */
  private[operators] val BfsMode = "frontier"

  /** Bounded hop-BFS relax core over a symmetric edge list (u, v) and
    * a seed relation (id, d=0) — the loop shared by [[bfsParts]] and
    * [[graphDiameter]], extracted with a strategy knob for the r15
    * lineage A/B (VERDICT r14 item 1: the legacy loop references its
    * own plan TWICE per round — join side + union side — so the
    * logical plan doubles per round, 2^rounds leaf references at
    * BfsRounds = 4, and bfs_reach was the registry's slowest op).
    * All three modes compute the identical relation (BfsLab asserts
    * exceptAll-parity both directions before timing):
    *
    *  - "legacy": dist' = min_id(dist ⋈ edges ∪ dist). Declarative,
    *    zero materialization — but the doubled self-reference grows
    *    the plan geometrically and re-plans the whole history each
    *    round.
    *  - "ckpt": the same recurrence with a per-round eager
    *    [[graft.CacheScope.ScopedDataset.localCheckpointScoped]] —
    *    lineage cut to a LogicalRDD leaf each round, every round
    *    planned and executed exactly once (the dedup_cluster /
    *    cc_star precedent; the cut's storage backing is the
    *    one-switch [[graft.StateMode]] deployment property).
    *  - "frontier": delta propagation — only NEWLY-reached vertices
    *    join the edges next round. Sound because hop distances never
    *    improve once set (unit weights: first discovery IS the min),
    *    so dist is a DISJOINT union of per-round frontiers — no
    *    re-aggregation of settled state at all. Each frontier is
    *    checkpointed (linear lineage) and the relax join's left side
    *    SHRINKS as the reachable set saturates — the asymptotic
    *    winner at 100 TB (per-round work ∝ frontier, not ∝ reached),
    *    and at fixture scale within rep noise of "ckpt" (BfsLab). */
  private[operators] def bfsDistances(edges: DataFrame, seeds: DataFrame,
      rounds: Int, mode: String = BfsMode): DataFrame = mode match {
    case "legacy" =>
      var dist = seeds
      for (_ <- 1 to rounds) {
        dist = dist.as("p")
          .join(edges.as("e"), col("e.u") === col("p.id"))
          .select(col("e.v").as("id"), (col("p.d") + lit(1L)).as("d"))
          .unionAll(dist)
          .groupBy(col("id")).agg(min(col("d")).as("d"))
      }
      dist
    case "ckpt" =>
      // the LAST round stays declarative: every earlier round is a
      // LogicalRDD leaf, so the final plan's double self-reference
      // only re-scans cached blocks — the consumer's one action
      // executes the last round instead of an eager checkpoint
      // materializing it and the action re-scanning the copy
      var dist = seeds
      for (r <- 1 to rounds) {
        dist = dist.as("p")
          .join(edges.as("e"), col("e.u") === col("p.id"))
          .select(col("e.v").as("id"), (col("p.d") + lit(1L)).as("d"))
          .unionAll(dist)
          .groupBy(col("id")).agg(min(col("d")).as("d"))
        if (r < rounds) dist = StateMode.cut(dist)
      }
      dist
    case "frontier" =>
      var dist = StateMode.cut(seeds)
      var frontier = dist
      for (r <- 1 to rounds) {
        var next = frontier.as("p")
          .join(edges.as("e"), col("e.u") === col("p.id"))
          .select(col("e.v").as("id"), (col("p.d") + lit(1L)).as("d"))
          // dedupe multi-path discoveries within the hop, then drop
          // already-settled vertices: what's left is exactly the set
          // first reached at THIS hop
          .groupBy(col("id")).agg(min(col("d")).as("d"))
          .join(dist.select(col("id")), Seq("id"), "left_anti")
        // same last-round rule as "ckpt": dist is a union of leaves,
        // so the final anti-join re-scans, never recomputes
        if (r < rounds) next = StateMode.cut(next)
        dist = dist.unionAll(next)
        frontier = next
      }
      dist
    case other =>
      throw new IllegalArgumentException(s"unknown bfs mode: $other")
  }

  /** (persisted symmetric edges, bounded-horizon distances) — split
    * out so [[bfsReach]] derives its vertex set from the SAME cached
    * edge relation the rounds join against (a separate
    * purchaseEdges() call re-ran the orders×lineitem join + distinct:
    * measured 7.9 s → the graph_bfs baseline after the reuse). */
  private def bfsParts(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val edges = purchaseEdges(spark, dir)
      .repartition(col("u")).persistScoped()
    val seeds = edges.select(col("u").as("id"))
      .filter(col("id") >= SuppOffset && col("id") <= SuppOffset + BfsMaxSeedSupp)
      .distinct()
      .select(col("id"), lit(0L).as("d"))
    val dist = bfsDistances(edges, seeds, BfsRounds)
    (edges, dist.select(col("id"), col("d")))
  }

  /** BFS replay CTE prefix (rounds unrolled as a chain — the
    * pagerankSql pattern; aggregation in a recursive term is
    * disallowed), shared verbatim by the `graph_bfs` and `bfs_reach`
    * oracles so the rollup cannot drift from its source. */
  private val BfsCtes: String = {
    val rounds = (1 to BfsRounds).map { i =>
      s"""r$i AS (
         |  SELECT id, min(d) AS d FROM (
         |    SELECT e.v AS id, p.d + 1 AS d
         |    FROM edges e JOIN r${i - 1} p ON e.u = p.id
         |    UNION ALL SELECT id, d FROM r${i - 1})
         |  GROUP BY id)""".stripMargin
    }.mkString(",\n")
    s"""base AS (
       |  SELECT DISTINCT o_custkey AS c, l_suppkey + $SuppOffset AS s
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |edges AS (SELECT c AS u, s AS v FROM base
       |          UNION ALL SELECT s AS u, c AS v FROM base),
       |r0 AS (SELECT DISTINCT u AS id, CAST(0 AS BIGINT) AS d FROM edges
       |       WHERE u BETWEEN $SuppOffset AND ${SuppOffset + BfsMaxSeedSupp}),
       |$rounds""".stripMargin
  }

  private def graphBfsSql: String =
    s"""WITH $BfsCtes
       |SELECT id, CAST(d AS BIGINT) AS d FROM r$BfsRounds""".stripMargin

  /** Reach profile of [[graphBfs]] — the blast-radius summary an
    * influence/exposure analysis reads FIRST ("how much of the graph
    * is within N hops of these suppliers, and how fast does the
    * frontier grow"): vertices bucket by their bounded-horizon hop
    * distance, with the UNREACHED mass reported as d = −1 (a
    * connectivity screen: a big −1 bucket means the seeds sit in a
    * small component). Operator composition (the clean_funnel
    * precedent): the BFS machinery runs once, this adds one
    * |hops|-sized partial+final fold plus a distinct-vertex left
    * join; the oracle shares [[BfsCtes]] verbatim. */
  def bfsReach(spark: SparkSession, dir: String): DataFrame = {
    val (edges, dist) = bfsParts(spark, dir)
    edges.select(col("u").as("id")).distinct()
      .join(dist, Seq("id"), "left")
      .groupBy(coalesce(col("d"), lit(-1L)).as("d"))
      .agg(count(lit(1)).as("n_nodes"))
  }

  private def bfsReachSql: String =
    s"""WITH $BfsCtes,
       |verts AS (SELECT DISTINCT u AS id FROM edges)
       |SELECT CAST(coalesce(r.d, -1) AS BIGINT) AS d, count(*) AS n_nodes
       |FROM verts v LEFT JOIN r$BfsRounds r ON r.id = v.id
       |GROUP BY 1""".stripMargin

  private[operators] val DiamRounds = 3

  /** Bounded double-sweep diameter probe — the classic cheap
    * lower bound on graph diameter (sweep 1: BFS out to
    * [[DiamRounds]] hops from a pinned seed; sweep 2: BFS from the
    * FARTHEST vertex sweep 1 reached; the second eccentricity lower-
    * bounds the true diameter, and on real-world graphs is usually
    * tight): one row — both seeds, both bounded eccentricities, and
    * both reach counts (shrinking reach across sweeps means seed 1
    * sat in a tendril). Argmax ties pin to the smallest vertex id.
    * Scale shape: the symmetric edges persist pre-partitioned ONCE
    * and BOTH sweeps' rounds reuse them (the Pregel invariant);
    * per round one key join + one partial+final min; the farthest
    * vertex is a rank-1 TakeOrdered (ONE row to the driver — the
    * pagerank-N metadata class), never a full collect. */
  def graphDiameter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val edges = purchaseEdges(spark, dir)
      .repartition(col("u")).persistScoped()
    def sweep(seed: Long): DataFrame = {
      val seeds = edges.select(col("u").as("id"))
        .filter(col("id") === seed).distinct()
        .select(col("id"), lit(0L).as("d"))
      bfsDistances(edges, seeds, DiamRounds)
    }
    val seed1 = SuppOffset + 1L
    val d1 = sweep(seed1).persistScoped()
    val far = d1.orderBy(col("d").desc, col("id").asc).limit(1).collect()
    if (far.isEmpty) // degenerate corpus: the seed has no edges
      return Seq.empty[(Long, Long, Long, Long, Long, Long)]
        .toDF("seed1", "ecc1", "seed2", "diameter_lb", "n_reach1", "n_reach2")
    val (seed2, ecc1) = (far.head.getLong(0), far.head.getLong(1))
    val d2 = sweep(seed2).persistScoped()
    val lbRow = d2.agg(max(col("d"))).head()
    val lb = if (lbRow.isNullAt(0)) 0L else lbRow.getLong(0)
    Seq((seed1, ecc1, seed2, lb, d1.count(), d2.count()))
      .toDF("seed1", "ecc1", "seed2", "diameter_lb", "n_reach1", "n_reach2")
  }

  /** Two unrolled relax chains; every round MATERIALIZED (a round
    * references its predecessor twice — join + union — so inlining
    * re-derives the chain geometrically: the ktruss lesson). The
    * second chain seeds from the first's rank-1 argmax. */
  private def graphDiameterSql: String = {
    def chain(p: String, seed: String): String = {
      val rounds = (1 to DiamRounds).map { i =>
        s"""$p$i AS MATERIALIZED (
           |  SELECT id, min(d) AS d FROM (
           |    SELECT e.v AS id, p.d + 1 AS d
           |    FROM edges e JOIN $p${i - 1} p ON e.u = p.id
           |    UNION ALL SELECT id, d FROM $p${i - 1})
           |  GROUP BY id)""".stripMargin
      }.mkString(",\n")
      s"""${p}0 AS (SELECT DISTINCT u AS id, CAST(0 AS BIGINT) AS d FROM edges
         |        WHERE u = $seed),
         |$rounds""".stripMargin
    }
    s"""WITH base AS MATERIALIZED (
       |  SELECT DISTINCT o_custkey AS c, l_suppkey + $SuppOffset AS s
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |edges AS MATERIALIZED (SELECT c AS u, s AS v FROM base
       |          UNION ALL SELECT s AS u, c AS v FROM base),
       |${chain("a", (SuppOffset + 1L).toString)},
       |far AS MATERIALIZED (
       |  SELECT id, d FROM a$DiamRounds ORDER BY d DESC, id ASC LIMIT 1),
       |${chain("b", "(SELECT id FROM far)")}
       |SELECT CAST(${SuppOffset + 1L} AS BIGINT) AS seed1,
       |  (SELECT d FROM far) AS ecc1,
       |  (SELECT id FROM far) AS seed2,
       |  CAST(max(d) AS BIGINT) AS diameter_lb,
       |  (SELECT count(*) FROM a$DiamRounds) AS n_reach1,
       |  count(*) AS n_reach2
       |FROM b$DiamRounds""".stripMargin
  }

  private[operators] val SsspRounds = 4

  /** Weighted single-source (multi-seed) shortest paths over the
    * purchase graph — the cost-distance companion to [[graphBfs]]'s
    * hop distance ("cheapest procurement path from these suppliers",
    * routing/attribution-cost queries). Edge weight is the CHEAPEST
    * lineitem ever shipped between the customer↔supplier pair, on
    * the exact cent lattice (`floor(price·100 + 0.5)` — the
    * target_encode rule: 2-decimal data, half-up nudge absorbs
    * double representation error), so distances are pure BIGINT
    * min-plus arithmetic and the oracle gate is hash-exact.
    *
    * Algorithm: [[SsspRounds]] Bellman-Ford BSP rounds of
    * relax-and-minimize — the BFS loop with `d + w` in place of
    * `d + 1`. Bounded rounds means distances are exact for paths of
    * ≤ [[SsspRounds]] edges (the documented contract — the same
    * horizon-bounded semantics as graph_bfs), cost is deterministic,
    * and the oracle stays an unrolled CTE chain. Scale shape — the
    * Pregel invariant: the weighted edge list aggregates ONCE
    * (min-weight per pair, partial+final), persists hash-partitioned
    * on the join key, and per round only the (id, d) state shuffles
    * to meet it; delta-frontier (relax only improved vertices) is
    * the constant-factor dial at scale. */
  def ssspWeighted(spark: SparkSession, dir: String): DataFrame = {
    val pair = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), (col("l_suppkey") + SuppOffset).as("s"),
        expr("cast(floor(l_extendedprice * 100 + 0.5) as bigint)").as("w"))
      .groupBy(col("c"), col("s")).agg(min(col("w")).as("w"))
    val edges = pair.select(col("c").as("u"), col("s").as("v"), col("w"))
      .unionAll(pair.select(col("s").as("u"), col("c").as("v"), col("w")))
    ssspOn(edges,
      edges.filter(col("u") >= SuppOffset && col("u") <= SuppOffset + BfsMaxSeedSupp)
        .select(col("u").as("id")).distinct())
  }

  /** Shipped relax-loop strategy for weighted SSSP — see [[ssspOn]]
    * for the candidates. Chosen by the r15 interleaved A/B (BfsLab,
    * sf0.1, 3 reps): ckpt 3.6/3.6/3.7 s vs delta 4.2/4.3/4.3 vs
    * legacy 5.6/5.7/5.8 — the delta mode's extra improvement-join
    * costs more than the shrinking frontier saves at fixture scale
    * (4 rounds, still-expanding reach). "delta" remains the dial for
    * deep-horizon corpora where late rounds touch a vanishing
    * fraction of vertices. */
  private[operators] val SsspMode = "ckpt"

  /** The bounded Bellman-Ford core over an arbitrary weighted edge
    * list (u, v, w) and seed set (id) — extracted so specs can relax
    * planted graphs (the labelPropOn pattern).
    *
    * Same r15 lineage A/B as [[bfsDistances]], but weighted relax
    * differs in one essential: a settled distance CAN improve in a
    * later round (a longer-hop cheaper path), so the frontier trick's
    * disjoint-union shortcut is unsound here. Modes (all
    * exceptAll-parity-asserted in BfsLab before timing):
    *
    *  - "legacy": the doubled-self-reference recurrence (2^rounds
    *    plan growth — the r14 verdict nit).
    *  - "ckpt": per-round eager localCheckpoint — linear lineage.
    *  - "delta": Bellman-Ford with a change-frontier — only vertices
    *    whose distance IMPROVED last round relax their out-edges next
    *    round (the textbook queue-based Bellman-Ford, BSP form). Each
    *    round: candidates from the frontier, one min-merge against
    *    settled state to find strict improvements, checkpoint the
    *    improvement set, merge it in (min over the disjoint-by-key
    *    union). Costs one extra small join per round vs "ckpt" but
    *    the relax join's left side shrinks to the churn set — the
    *    asymptotic shape at 100 TB where late rounds touch a
    *    vanishing fraction of vertices. */
  private[operators] def ssspOn(edgesIn: DataFrame, seeds: DataFrame,
      mode: String = SsspMode): DataFrame = {
    val edges = edgesIn.repartition(col("u")).persistScoped()
    val d0 = seeds.select(col("id"), lit(0L).as("d"))
    val dist = mode match {
      case "legacy" =>
        var dist = d0
        for (_ <- 1 to SsspRounds) {
          dist = dist.as("p")
            .join(edges.as("e"), col("e.u") === col("p.id"))
            .select(col("e.v").as("id"), (col("p.d") + col("e.w")).as("d"))
            .unionAll(dist)
            .groupBy(col("id")).agg(min(col("d")).as("d"))
        }
        dist
      case "ckpt" =>
        // last round declarative — see bfsDistances' "ckpt" note
        var dist = d0
        for (r <- 1 to SsspRounds) {
          dist = dist.as("p")
            .join(edges.as("e"), col("e.u") === col("p.id"))
            .select(col("e.v").as("id"), (col("p.d") + col("e.w")).as("d"))
            .unionAll(dist)
            .groupBy(col("id")).agg(min(col("d")).as("d"))
          if (r < SsspRounds) dist = StateMode.cut(dist)
        }
        dist
      case "delta" =>
        var dist = StateMode.cut(d0)
        var frontier = dist
        for (r <- 1 to SsspRounds) {
          // checkpointed EVERY round (unlike "ckpt"'s last-round
          // exception): the settled chain is re-referenced by both
          // the improvement filter and the merge, so a declarative
          // last improvement set would recompute the whole chain
          // twice in the consumer's action
          val improved = StateMode.cut(frontier.as("p")
            .join(edges.as("e"), col("e.u") === col("p.id"))
            .select(col("e.v").as("id"), (col("p.d") + col("e.w")).as("d"))
            .groupBy(col("id")).agg(min(col("d")).as("d"))
            // strict improvements only: unreached (null) or cheaper
            .join(dist.withColumnRenamed("d", "d_set"), Seq("id"), "left")
            .filter(col("d_set").isNull || col("d") < col("d_set"))
            .select(col("id"), col("d")))
          // min-merge: `improved` beats `dist` wherever both hold a key
          dist = dist.unionAll(improved)
            .groupBy(col("id")).agg(min(col("d")).as("d"))
          frontier = improved
        }
        dist
      case other =>
        throw new IllegalArgumentException(s"unknown sssp mode: $other")
    }
    dist.select(col("id"), col("d"))
  }

  /** SSSP replay: graphBfsSql's unrolled relax chain with the
    * min-cent edge weight carried through `p.d + e.w`. */
  private def ssspWeightedSql: String = {
    val rounds = (1 to SsspRounds).map { i =>
      s"""r$i AS (
         |  SELECT id, min(d) AS d FROM (
         |    SELECT e.v AS id, p.d + e.w AS d
         |    FROM edges e JOIN r${i - 1} p ON e.u = p.id
         |    UNION ALL SELECT id, d FROM r${i - 1})
         |  GROUP BY id)""".stripMargin
    }.mkString(",\n")
    s"""WITH pair AS (
       |  SELECT o_custkey AS c, l_suppkey + $SuppOffset AS s,
       |    min(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS w
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       |  GROUP BY 1, 2),
       |edges AS (SELECT c AS u, s AS v, w FROM pair
       |          UNION ALL SELECT s AS u, c AS v, w FROM pair),
       |r0 AS (SELECT DISTINCT u AS id, CAST(0 AS BIGINT) AS d FROM edges
       |       WHERE u BETWEEN $SuppOffset AND ${SuppOffset + BfsMaxSeedSupp}),
       |$rounds
       |SELECT id, CAST(d AS BIGINT) AS d FROM r$SsspRounds""".stripMargin
  }

  /** Weight-proportional PageRank over the cent-weighted purchase
    * graph — the ranking that asks "who moves the MONEY", not "who
    * has the most links": each vertex distributes its rank over its
    * out-edges proportionally to the edge's cent weight (the
    * [[ssspWeighted]] min-cheapest-lineitem pair weights,
    * symmetrized), so a supplier bound to one big-ticket customer
    * outranks one with many trinket links. Same integer lattice as
    * [[rankEdges]] with the per-edge share `(r·w) div W(u)` in
    * decimal(38) (r·w reaches 2³⁰·cents — past int64 at real
    * ticket sizes) and the identical 17/20 damping; the oracle is
    * the pagerankSql unrolled chain with the weight share carried
    * through.
    *
    * Scale shape: identical to rankEdges — (u, v, w, W) denormalized
    * and persisted once, hash-partitioned on the join key; per round
    * only the (id, r) state shuffles plus one partial+final sum. */
  def pagerankWeighted(spark: SparkSession, dir: String): DataFrame = {
    val pair = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), (col("l_suppkey") + SuppOffset).as("s"),
        expr("cast(floor(l_extendedprice * 100 + 0.5) as bigint)").as("w"))
      .groupBy(col("c"), col("s")).agg(min(col("w")).as("w"))
    val edges = pair.select(col("c").as("u"), col("s").as("v"), col("w"))
      .unionAll(pair.select(col("s").as("u"), col("c").as("v"), col("w")))
      .persistScoped()
    val outw = edges.groupBy(col("u")).agg(sum(col("w")).as("tw"))
    val n = outw.count()
    val r0 = Scale / n
    val tele = (3L * r0) / 20L
    val edgeW = edges.join(outw, "u")
      .select(col("u"), col("v"), col("w"), col("tw"))
      .repartition(col("u")).persistScoped()
    var r = outw.select(col("u").as("id"), lit(r0).as("r"))
    for (_ <- 1 to Rounds) {
      r = edgeW.as("e")
        .join(r.as("p"), col("e.u") === col("p.id"))
        .groupBy(col("e.v"))
        .agg(sum(expr("cast(p.r as decimal(38,0)) * e.w div e.tw")).as("sm"))
        .select(col("v").as("id"),
          (lit(tele) + expr("cast((17 * sm) div 20 as bigint)")).as("r"))
    }
    r.select(col("id"), col("r").as("rank_scaled"),
      (col("r") / lit(Scale.toDouble)).as("rank"))
  }

  private def pagerankWeightedSql: String = {
    val rounds = (1 to Rounds).map { i =>
      s"""r$i AS (
         |  SELECT e.v AS id,
         |    (SELECT tele FROM consts)
         |      + ((17 * CAST(sum((CAST(p.r AS HUGEINT) * e.w) // e.tw) AS BIGINT)) // 20) AS r
         |  FROM edges e
         |  JOIN r${i - 1} p ON e.u = p.id
         |  GROUP BY e.v)""".stripMargin
    }.mkString(",\n")
    s"""WITH pair AS (
       |  SELECT o_custkey AS c, l_suppkey + $SuppOffset AS s,
       |    min(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS w
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       |  GROUP BY 1, 2),
       |e0 AS (SELECT c AS u, s AS v, w FROM pair
       |       UNION ALL SELECT s AS u, c AS v, w FROM pair),
       |outw AS (SELECT u, CAST(sum(w) AS BIGINT) AS tw FROM e0 GROUP BY u),
       |edges AS (SELECT e0.u, e0.v, e0.w, outw.tw FROM e0 JOIN outw ON e0.u = outw.u),
       |consts AS (SELECT ($Scale // count(*)) AS r0,
       |                  ((3 * ($Scale // count(*))) // 20) AS tele
       |           FROM outw),
       |r0 AS (SELECT u AS id, (SELECT r0 FROM consts) AS r FROM outw),
       |$rounds
       |SELECT id, r AS rank_scaled, r / ${Scale.toDouble} AS rank
       |FROM r$Rounds""".stripMargin
  }

  /** Degree distribution of the purchase graph — the first
    * diagnostic of any graph workload (is this a power law, where
    * does skew-join pressure come from): vertices bucket by
    * out-degree, emitting (degree, n_vertices) — two chained
    * partial+final aggregates, nothing else. */
  def degreeDist(spark: SparkSession, dir: String): DataFrame =
    purchaseEdges(spark, dir)
      .groupBy(col("u")).agg(count(lit(1)).as("deg"))
      .groupBy(col("deg")).agg(count(lit(1)).as("n_vertices"))

  private def degreeDistSql: String =
    s"""WITH base AS (
       |  SELECT DISTINCT o_custkey AS c, l_suppkey + $SuppOffset AS s
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |edges AS (SELECT c AS u, s AS v FROM base
       |          UNION ALL SELECT s AS u, c AS v FROM base),
       |d AS (SELECT u, count(*) AS deg FROM edges GROUP BY u)
       |SELECT CAST(deg AS BIGINT) AS deg, count(*) AS n_vertices
       |FROM d GROUP BY deg""".stripMargin

  private[operators] val HitsRounds = 2
  private[operators] val HitsScale = 1L << 20

  /** HITS hubs-and-authorities (Kleinberg 1999) over the DIRECTED
    * bipartite purchase graph — customers point at the suppliers
    * they buy from, so hub score = "buys from many authoritative
    * suppliers" and authority score = "bought by many strong hubs":
    * the mutual-reinforcement ranking PageRank's single score can't
    * express, and the second canonical eigenvector algorithm of the
    * iterative-MapReduce literature.
    *
    * Lattice determinism: scores live on the 2²⁰ lattice, and the
    * per-half-round normalization is by the MAX (L∞) instead of the
    * classical L2 — sqrt has no exact integer form, max does:
    * `score' = (score · 2²⁰) div max(score)`, with the product
    * widened to decimal(38)/HUGEINT (score reaches deg·2²⁰ ≈ 2⁵⁰ at
    * a 10⁹-degree authority; ·2²⁰ would overflow int64). Every
    * emitted score is back in [0, 2²⁰] BIGINT. [[HitsRounds]] fixed
    * rounds; output rows are (id, role, score_q), hubs = customers,
    * auths = suppliers.
    *
    * Scale shape: the edge list persists TWICE, pre-partitioned on
    * each join side (`eByC`, `eByS` — the standard two-index trick
    * for alternating-key iteration: h-updates join on c, a-updates
    * on s, and re-shuffling the EDGES per half-round is exactly what
    * a 100 TB run can't afford). Per half-round only the (id, score)
    * state shuffles to meet the matching copy, sums aggregate
    * partial+final, and the max attaches via [[ScalarJoin]]'s
    * broadcast hash join (never a BNLJ). */
  def hitsScores(spark: SparkSession, dir: String): DataFrame =
    hitsOn(Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), (col("l_suppkey") + SuppOffset).as("s"))
      .distinct())

  /** Shipped per-half-round state strategy for [[hitsOn]] — decided
    * by the r15 interleaved A/B (HitsLab, parity-gated): see the
    * rescale comment for the numbers. */
  private[operators] val HitsMode = "ckpt"

  /** The mutual-reinforcement core over an arbitrary DIRECTED edge
    * list (c, s) — extracted so specs can score planted graphs (the
    * labelPropOn pattern). */
  private[operators] def hitsOn(base: DataFrame,
      mode: String = HitsMode): DataFrame = {
    val eByC = base.repartition(col("c")).persistScoped()
    val eByS = base.repartition(col("s")).persistScoped()

    def rescale(scoresIn: DataFrame): DataFrame = {
      // the raw sums are referenced TWICE (the max aggregate and the
      // rescale join) and each half-round chains on the last —
      // without materialization the lineage re-evaluates
      // geometrically across the 2×2 half-rounds (measured: 12.6 s →
      // ~5 s at sf0.1 with per-half-round persist). r15's HitsLab
      // interleaved A/B (sf0.1, 3 reps, exceptAll-parity first) then
      // swapped the persist for an eager localCheckpoint: ckpt
      // 4.3/3.4/3.2 s vs persist 5.1/4.5/4.2 — a consistent ~20%
      // win, same mechanism as KcoreMode (each half-round plans and
      // executes exactly once against a LogicalRDD leaf instead of
      // paying analysis + cache-substitution passes per reference).
      // Cut storage backing: the graft.StateMode one-switch.
      val scores = mode match {
        case "ckpt"    => StateMode.cut(scoresIn)
        case "persist" => scoresIn.persistScoped()
        case other     => throw new IllegalArgumentException(s"unknown hits mode: $other")
      }
      val mx = scores.agg(max(col("x")).as("mx"), count(lit(1)).as("nn"))
      ScalarJoin.attachScalar(scores, col("x"), mx, col("nn"))
        .select(col("id"),
          expr(s"cast((cast(x as decimal(38,0)) * $HitsScale) div mx as bigint)").as("x"))
    }

    var h = eByC.select(col("c").as("id")).distinct()
      .select(col("id"), lit(HitsScale).as("x"))
    var a: DataFrame = null
    for (_ <- 1 to HitsRounds) {
      a = rescale(eByC.as("e").join(h.as("p"), col("e.c") === col("p.id"))
        .groupBy(col("e.s")).agg(sum(col("p.x")).as("x"))
        .select(col("s").as("id"), col("x")))
      h = rescale(eByS.as("e").join(a.as("p"), col("e.s") === col("p.id"))
        .groupBy(col("e.c")).agg(sum(col("p.x")).as("x"))
        .select(col("c").as("id"), col("x")))
    }
    h.select(col("id"), lit("hub").as("role"), col("x").as("score_q"))
      .unionAll(a.select(col("id"), lit("auth").as("role"), col("x").as("score_q")))
  }

  /** HITS replay: half-rounds unrolled; each max is its OWN
    * materialized CTE (a raw `(SELECT max(..) FROM ..)` in the next
    * round's aggregate trips DuckDB's "LATERAL join cannot contain
    * aggregates" once the CTE chain inlines — the consts-CTE rule
    * pagerankSql already follows), products widened to HUGEINT
    * before the 2²⁰ rescale. */
  private def hitsScoresSql: String = {
    val rounds = (1 to HitsRounds).map { i =>
      s"""a${i}r AS MATERIALIZED (SELECT s AS id, CAST(sum(h) AS BIGINT) AS x
         |  FROM base JOIN h${i - 1} ON c = id GROUP BY s),
         |am$i AS MATERIALIZED (SELECT max(x) AS mx FROM a${i}r),
         |a$i AS MATERIALIZED (SELECT id, CAST((CAST(x AS HUGEINT) * $HitsScale)
         |  // (SELECT mx FROM am$i) AS BIGINT) AS x FROM a${i}r),
         |h${i}r AS MATERIALIZED (SELECT c AS id, CAST(sum(x) AS BIGINT) AS h
         |  FROM base JOIN a$i ON s = id GROUP BY c),
         |hm$i AS MATERIALIZED (SELECT max(h) AS mx FROM h${i}r),
         |h$i AS MATERIALIZED (SELECT id, CAST((CAST(h AS HUGEINT) * $HitsScale)
         |  // (SELECT mx FROM hm$i) AS BIGINT) AS h FROM h${i}r)""".stripMargin
    }.mkString(",\n")
    s"""WITH base AS (
       |  SELECT DISTINCT o_custkey AS c, l_suppkey + $SuppOffset AS s
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |h0 AS (SELECT DISTINCT c AS id, CAST($HitsScale AS BIGINT) AS h FROM base),
       |$rounds
       |SELECT id, 'hub' AS role, h AS score_q FROM h$HitsRounds
       |UNION ALL
       |SELECT id, 'auth' AS role, x AS score_q FROM a$HitsRounds""".stripMargin
  }

  private[operators] val LpRounds = 2

  /** Semi-supervised label propagation (Zhu & Ghahramani 2002 /
    * community LP family) over the purchase graph: every 10th
    * customer is a SEED carrying its nation as the label; [[LpRounds]]
    * synchronous rounds spread labels to suppliers (round 1) and then
    * to unlabeled customers through them (round 2). Per round each
    * unlabeled vertex takes the MAJORITY label of its labeled
    * neighbors — ties broken (count desc, label asc) so every engine
    * picks the same winner; seeds are clamped (the semi-supervised
    * variant, not the self-reinforcing community one, so bounded
    * rounds are the algorithm, not an approximation cutoff).
    *
    * Scale shape — the Pregel invariant shared with [[rankEdges]]:
    * the symmetric edge list is persisted ONCE, hash-partitioned on
    * the join key; per round only the (id, label) state (≤ |V| rows,
    * 16 bytes) shuffles to meet it, votes aggregate partial+final on
    * (v, lbl), and the majority pick is a rank-limit window over the
    * GROUPED votes (O(distinct labels per vertex), never the raw
    * edge stream). The clamp is a broadcast-able anti join against
    * the seed set. */
  def labelProp(spark: SparkSession, dir: String): DataFrame = {
    val seeds = Tables.customer(spark, dir)
      .filter(col("c_custkey") % 10 === 0)
      .select(col("c_custkey").as("id"), col("c_nationkey").cast("long").as("lbl"))
    labelPropOn(purchaseEdges(spark, dir), seeds)
  }

  /** The propagation core over an arbitrary symmetric edge list
    * (u, v) and clamped (id, lbl) seed set — extracted so specs can
    * propagate over planted graphs (tie-break and clamp pins). */
  private[operators] def labelPropOn(edgesIn: DataFrame, seedsIn: DataFrame,
      rounds: Int = LpRounds): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val edges = edgesIn.repartition(col("u")).persistScoped()
    val seeds = seedsIn.persistScoped()
    var labels = seeds
    for (_ <- 1 to rounds) {
      val votes = edges.as("e")
        .join(labels.as("l"), col("e.u") === col("l.id"))
        .groupBy(col("e.v"), col("l.lbl"))
        .agg(count(lit(1)).as("n"))
      val picked = votes
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("v")).orderBy(col("n").desc, col("lbl").asc)))
        .filter(col("rn") === 1)
        .select(col("v").as("id"), col("lbl"))
      labels = seeds.unionAll(picked.join(seeds.select(col("id")), Seq("id"), "left_anti"))
    }
    labels
  }

  /** The [[labelProp]] replay's CTE prefix — edges, seeds, unrolled
    * rounds, ending with the final label set `l<LpRounds>` — shared
    * verbatim by the `label_prop` and `modularity` oracles so both
    * gate against the IDENTICAL propagation. */
  private def labelPropPrefixSql: String = {
    val rounds = (1 to LpRounds).map { i =>
      s"""v$i AS (SELECT e.v, l.lbl, count(*) AS n
         |  FROM edges e JOIN l${i - 1} l ON e.u = l.id GROUP BY 1, 2),
         |p$i AS (SELECT v AS id, lbl FROM (
         |    SELECT v, lbl, row_number() OVER (PARTITION BY v ORDER BY n DESC, lbl ASC) AS rn
         |    FROM v$i) t WHERE rn = 1),
         |l$i AS (SELECT * FROM seeds
         |  UNION ALL
         |  SELECT * FROM p$i WHERE id NOT IN (SELECT id FROM seeds))""".stripMargin
    }.mkString(",\n")
    s"""base AS (
       |  SELECT DISTINCT o_custkey AS c, l_suppkey + $SuppOffset AS s
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |edges AS (SELECT c AS u, s AS v FROM base
       |          UNION ALL SELECT s AS u, c AS v FROM base),
       |seeds AS (SELECT c_custkey AS id, CAST(c_nationkey AS BIGINT) AS lbl
       |          FROM customer WHERE c_custkey % 10 = 0),
       |l0 AS (SELECT * FROM seeds),
       |$rounds""".stripMargin
  }

  /** DuckDB replay of [[labelProp]]: rounds unrolled as CTE stages
    * (same reason as [[pagerankSql]]), the majority pick expressed
    * with the identical (n desc, lbl asc) row_number. */
  private def labelPropSql: String =
    s"""WITH $labelPropPrefixSql
       |SELECT id, lbl FROM l$LpRounds""".stripMargin

  /** Modularity profile of the [[labelProp]] communities — the
    * community-quality score (Newman 2006) a clustering pipeline
    * monitors per run: for each community c, its node count, total
    * degree d_c, intra-community directed-edge count a_c (= 2·e_c on
    * the symmetric list), and the exact integer numerator
    * q_num = D·a_c − d_c² where D = Σdeg = 2m — so
    * Q = Σ q_num / D², with every term BIGINT (d_c < 3·10⁹ before
    * d_c² overflows; the fixture is 6 orders of magnitude under).
    * A community with negative q_num is worse than random — the
    * actionable per-row signal.
    *
    * Scale shape: edges persist once; degrees and community sums are
    * partial+final aggregates; the intra count joins the (id, lbl)
    * state — |V|-sized, dimension-scale — onto each endpoint (two
    * keyed hash joins, broadcast when labels fit); output is
    * O(|communities|). */
  def modularity(spark: SparkSession, dir: String): DataFrame = {
    val edges = purchaseEdges(spark, dir).persistScoped()
    val labels = labelProp(spark, dir).persistScoped()
    val dTotal = edges.count() // 2m — one scalar (the pagerank-N rule)
    val deg = edges.groupBy(col("u").as("id")).agg(count(lit(1)).as("deg"))
    val dc = deg.join(labels, "id")
      .groupBy(col("lbl"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("deg")).as("deg_sum"))
    val intra = edges
      .join(labels.select(col("id").as("u"), col("lbl").as("lu")), "u")
      .join(labels.select(col("id").as("v"), col("lbl").as("lv")), "v")
      .filter(col("lu") === col("lv"))
      .groupBy(col("lu").as("lbl")).agg(count(lit(1)).as("intra2"))
    dc.join(intra, Seq("lbl"), "left")
      .select(col("lbl"), col("n_nodes"), col("deg_sum"),
        coalesce(col("intra2"), lit(0L)).as("intra2"),
        (lit(dTotal) * coalesce(col("intra2"), lit(0L))
          - col("deg_sum") * col("deg_sum")).as("q_num"))
  }

  private def modularitySql: String =
    s"""WITH $labelPropPrefixSql,
       |lab AS (SELECT id, lbl FROM l$LpRounds),
       |deg AS (SELECT u AS id, count(*) AS deg FROM edges GROUP BY 1),
       |dt AS (SELECT count(*) AS d FROM edges),
       |dc AS (SELECT l.lbl, count(*) AS n_nodes, CAST(sum(deg) AS BIGINT) AS deg_sum
       |       FROM deg JOIN lab l USING (id) GROUP BY 1),
       |ic AS (SELECT lu.lbl, count(*) AS intra2
       |       FROM edges e JOIN lab lu ON lu.id = e.u JOIN lab lv ON lv.id = e.v
       |       WHERE lu.lbl = lv.lbl GROUP BY 1)
       |SELECT dc.lbl, dc.n_nodes, dc.deg_sum,
       |  CAST(coalesce(ic.intra2, 0) AS BIGINT) AS intra2,
       |  CAST((SELECT d FROM dt) * coalesce(ic.intra2, 0)
       |       - dc.deg_sum * dc.deg_sum AS BIGINT) AS q_num
       |FROM dc LEFT JOIN ic USING (lbl)""".stripMargin

  /** Personalized (topic-sensitive) PageRank — teleport mass
    * restricted to a SEED set (every 10th customer, the labelProp
    * seed rule): rank measures proximity TO THE SEEDS, the
    * recommendation/trust-propagation primitive, where global
    * PageRank measures popularity. Same integer lattice as
    * [[rankEdges]] — r₀ = Scale div |S| on seeds (0 elsewhere), per
    * round r'(v) = [v∈S]·tele + (17·Σ (r(u) div deg(u))) div 20 —
    * so the unrolled oracle replays bit-exact. Vertices the seed
    * mass hasn't reached by round R carry no row (exactly the
    * personalized-PR semantics: unreached means rank 0).
    *
    * Scale shape: the [[rankEdges]] Pregel invariant — edges+degrees
    * persist once pre-partitioned; per round only (id, rank) state
    * shuffles; the seed teleport re-attaches by a full-outer join
    * against the |S|-row seed table. */
  def pagerankPersonalized(spark: SparkSession, dir: String): DataFrame = {
    val edges = purchaseEdges(spark, dir).persistScoped()
    val outdeg = edges.groupBy(col("u")).agg(count(lit(1)).as("deg"))
    val edgeDeg = edges.join(outdeg, "u")
      .select(col("u"), col("v"), col("deg"))
      .repartition(col("u"))
      .persistScoped()
    val seeds = Tables.customer(spark, dir)
      .filter(col("c_custkey") % 10 === 0)
      .select(col("c_custkey").as("id"))
      .persistScoped()
    val nS = seeds.count()
    val r0 = Scale / nS
    val tele = (3L * r0) / 20L
    var r = seeds.select(col("id"), lit(r0).as("r"))
    for (_ <- 1 to Rounds) {
      val contrib = edgeDeg.as("e")
        .join(r.as("p"), col("e.u") === col("p.id"))
        .groupBy(col("e.v"))
        .agg(sum(expr("p.r div e.deg")).as("sm"))
        .select(col("v").as("id"), expr("(17 * sm) div 20").as("rc"))
      r = contrib.join(seeds.select(col("id"), lit(tele).as("t")), Seq("id"), "full_outer")
        .select(col("id"),
          (coalesce(col("rc"), lit(0L)) + coalesce(col("t"), lit(0L))).as("r"))
    }
    r.select(col("id"), col("r").as("rank_scaled"),
      (col("r") / lit(Scale.toDouble)).as("rank"))
  }

  private def pagerankPersonalizedSql: String = {
    val rounds = (1 to Rounds).map { i =>
      s"""c$i AS (
         |  SELECT e.v AS id, (17 * CAST(sum(p.r // d.deg) AS BIGINT)) // 20 AS rc
         |  FROM edges e JOIN outdeg d ON e.u = d.u
         |  JOIN r${i - 1} p ON e.u = p.id
         |  GROUP BY e.v),
         |r$i AS (
         |  SELECT coalesce(c.id, s.id) AS id,
         |    coalesce(c.rc, 0)
         |      + CASE WHEN s.id IS NOT NULL THEN (SELECT tele FROM consts) ELSE 0 END AS r
         |  FROM c$i c FULL OUTER JOIN seeds s ON s.id = c.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH base AS (
       |  SELECT DISTINCT o_custkey AS c, l_suppkey + $SuppOffset AS s
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |edges AS (SELECT c AS u, s AS v FROM base
       |          UNION ALL SELECT s AS u, c AS v FROM base),
       |outdeg AS (SELECT u, count(*) AS deg FROM edges GROUP BY u),
       |seeds AS (SELECT c_custkey AS id FROM customer WHERE c_custkey % 10 = 0),
       |consts AS (SELECT ($Scale // count(*)) AS r0,
       |                  ((3 * ($Scale // count(*))) // 20) AS tele
       |           FROM seeds),
       |r0 AS (SELECT id, (SELECT r0 FROM consts) AS r FROM seeds),
       |$rounds
       |SELECT id, r AS rank_scaled, r / ${Scale.toDouble} AS rank
       |FROM r$Rounds""".stripMargin
  }

  /** Degree assortativity of the purchase graph (Newman 2002) — the
    * one-scalar structure summary next to [[modularity]]'s partition
    * view: the Pearson correlation of (deg(u), deg(v)) over the
    * symmetric edge list. Bipartite hub-and-spoke graphs come out
    * negative (high-degree suppliers attach to low-degree customers)
    * — a positive drift here means the graph's shape changed, which
    * is exactly what a pipeline monitors. The correlation closes via
    * the [[Relational.aggCorr]] exact-moment discipline: HUGEINT/
    * decimal sums floored to < 2⁵³ integers (measured sxx ≈ 2·10¹¹
    * at sf0.1 — four orders of headroom), then identical IEEE ops.
    *
    * Scale shape: degrees are one partial+final count; attaching
    * them to both endpoints is two keyed joins against the persisted
    * edges; the moment fold is one 1-row aggregate. */
  def graphAssortativity(spark: SparkSession, dir: String): DataFrame = {
    val edges = purchaseEdges(spark, dir).persistScoped()
    val deg = edges.groupBy(col("u").as("id")).agg(count(lit(1)).as("d"))
      .persistScoped()
    val pairs = edges
      .join(deg.select(col("id").as("u"), col("d").as("x")), "u")
      .join(deg.select(col("id").as("v"), col("d").as("y")), "v")
      .select(col("x"), col("y"))
    def mom(c: Column): Column = floor(c).cast("double")
    val dec = (c: Column) => c.cast(org.apache.spark.sql.types.DecimalType(19, 0))
    val n = count(lit(1))
    val sx = mom(sum(dec(col("x")))); val sy = mom(sum(dec(col("y"))))
    val sxx = mom(sum(dec(col("x")) * dec(col("x"))))
    val syy = mom(sum(dec(col("y")) * dec(col("y"))))
    val sxy = mom(sum(dec(col("x")) * dec(col("y"))))
    pairs.agg(n.as("n_edges"),
      ((n * sxy - sx * sy) /
        (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))).as("assortativity"))
  }

  private def graphAssortativitySql: String =
    s"""WITH base AS (
       |  SELECT DISTINCT o_custkey AS c, l_suppkey + $SuppOffset AS s
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |edges AS (SELECT c AS u, s AS v FROM base
       |          UNION ALL SELECT s AS u, c AS v FROM base),
       |deg AS (SELECT u AS id, count(*) AS d FROM edges GROUP BY 1),
       |p AS (SELECT du.d AS x, dv.d AS y
       |      FROM edges e JOIN deg du ON du.id = e.u JOIN deg dv ON dv.id = e.v),
       |m AS (SELECT count(*) AS n,
       |        CAST(floor(sum(CAST(x AS HUGEINT))) AS DOUBLE) AS sx,
       |        CAST(floor(sum(CAST(y AS HUGEINT))) AS DOUBLE) AS sy,
       |        CAST(floor(sum(CAST(x AS HUGEINT) * x)) AS DOUBLE) AS sxx,
       |        CAST(floor(sum(CAST(y AS HUGEINT) * y)) AS DOUBLE) AS syy,
       |        CAST(floor(sum(CAST(x AS HUGEINT) * y)) AS DOUBLE) AS sxy
       |      FROM p)
       |SELECT n AS n_edges,
       |  (n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
       |    AS assortativity
       |FROM m""".stripMargin

  /** Customers considered for [[jaccardNeighbors]] pairing share a
    * part bought by at most this many distinct customers. */
  private[operators] val RarePartMax = 20
  private[operators] val JaccK = 100

  /** Link prediction by neighborhood Jaccard (common-neighbors
    * family) over the customer→part purchase relation: the top
    * [[JaccK]] customer pairs by |parts(a) ∩ parts(b)| /
    * |parts(a) ∪ parts(b)| on the 2²⁰ lattice. The quadratic blow-up
    * is bounded the prefix-filter way: candidate pairs are generated
    * ONLY through parts with ≤ [[RarePartMax]] distinct buyers (rare
    * co-purchases are the signal; a part half the corpus bought
    * predicts nothing and would alone emit O(|customers|²) pairs) —
    * but the Jaccard itself is then EXACT over the candidates' full
    * part sets. Fan-out per rare part is ≤ RarePartMax², a constant.
    *
    * Scale shape: one distinct (customer, part) projection persisted;
    * candidates from a bounded self-join on rare parts; the exact
    * intersection is two keyed joins of candidates onto the edge
    * relation (shuffle on customer key, partial+final count); union
    * sizes arrive by joining the per-customer degree — and the final
    * rank is a global top-k (TakeOrderedAndProject, never a full
    * sort). */
  def jaccardNeighbors(spark: SparkSession, dir: String): DataFrame =
    jaccardNeighborsOn(spark, dir, JaccMode)

  /** State strategy for [[jaccardNeighbors]]' shared (c, p) relation
    * — the DAG (non-loop) test of the r15 ckpt-vs-persist question:
    * the relation is referenced 5× in ONE plan (rare-part df guard,
    * both candidate sides via `re`, both shared-count sides, the
    * degree fold). The r15 interleaved A/B (JaccLab, parity-gated,
    * sf0.1, 6 reps over two runs under ambient noise): ckpt
    * 6.0/3.2/4.0/6.0/3.7/3.1 s vs persist 4.3/4.6/5.0/6.3/4.9/4.7 —
    * ckpt wins 5 of 6 interleaved pairs, mean 4.3 vs 5.0 (~13%).
    * Smaller than the loop-family wins (one action analyzes ONE plan
    * here, so the per-round re-analysis term is absent; what remains
    * is per-reference re-optimization of the cached subtree), but
    * consistent — so it ships. */
  private[operators] val JaccMode = "ckpt"

  private[operators] def jaccardNeighborsOn(
      spark: SparkSession, dir: String, mode: String): DataFrame = {
    val eRaw = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
      .distinct()
    val e = mode match {
      case "ckpt"    => StateMode.cut(eRaw)
      case "persist" => eRaw.persistScoped()
      case other     => throw new IllegalArgumentException(s"unknown jacc mode: $other")
    }
    val rare = e.groupBy(col("p")).agg(count(lit(1)).as("n"))
      .filter(col("n") <= RarePartMax).select(col("p"))
    val re = e.join(rare, "p")
    val cand = re.select(col("p"), col("c").as("a"))
      .join(re.select(col("p"), col("c").as("b")), "p")
      .filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
    val shared = cand
      .join(e.select(col("c").as("a"), col("p")), "a")
      .join(e.select(col("c").as("b"), col("p")), Seq("b", "p"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("shared"))
    val degc = e.groupBy(col("c")).agg(count(lit(1)).as("n"))
    shared
      .join(degc.select(col("c").as("a"), col("n").as("n_a")), "a")
      .join(degc.select(col("c").as("b"), col("n").as("n_b")), "b")
      .select(col("a").as("cust_a"), col("b").as("cust_b"),
        col("shared"), col("n_a"), col("n_b"),
        expr("(shared * 1048576) div (n_a + n_b - shared)").as("jaccard_q"))
      .orderBy(col("jaccard_q").desc, col("cust_a").asc, col("cust_b").asc)
      .limit(JaccK)
  }

  private def jaccardNeighborsSql: String =
    s"""WITH e AS (SELECT DISTINCT o_custkey AS c, l_partkey AS p
       |           FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |rare AS (SELECT p FROM (SELECT p, count(*) AS n FROM e GROUP BY 1) t
       |         WHERE n <= $RarePartMax),
       |re AS (SELECT e.c, e.p FROM e JOIN rare USING (p)),
       |cand AS (SELECT DISTINCT a.c AS a, b.c AS b
       |         FROM re a JOIN re b ON a.p = b.p AND a.c < b.c),
       |sh AS (SELECT cand.a, cand.b, count(*) AS shared
       |       FROM cand JOIN e ea ON ea.c = cand.a
       |       JOIN e eb ON eb.c = cand.b AND eb.p = ea.p
       |       GROUP BY 1, 2),
       |dg AS (SELECT c, count(*) AS n FROM e GROUP BY 1)
       |SELECT sh.a AS cust_a, sh.b AS cust_b, sh.shared,
       |  da.n AS n_a, db.n AS n_b,
       |  CAST((sh.shared * 1048576) // (da.n + db.n - sh.shared) AS BIGINT) AS jaccard_q
       |FROM sh JOIN dg da ON da.c = sh.a JOIN dg db ON db.c = sh.b
       |ORDER BY jaccard_q DESC, cust_a ASC, cust_b ASC
       |LIMIT $JaccK""".stripMargin

  private[operators] val TrussK = 4
  private[operators] val TrussRounds = 2

  /** Bounded k-truss peeling (k = [[TrussK]], [[TrussRounds]]
    * synchronous rounds) over the near-dup pair graph — the
    * EDGE-cohesion refinement of [[kcore]]'s vertex degrees and the
    * community-core detector next to [[triangles]]: an edge survives
    * iff it participates in ≥ k−2 triangles among surviving edges,
    * so loose "bridge" near-dup pairs peel away and what remains are
    * densely inter-duplicated cliques (template families, mirror
    * sets) — at sf0.001 exactly the planted K₄ survives with every
    * edge at support 2. Bounded rounds are the CONTRACT (the kcore /
    * graph_bfs precedent): cost deterministic, oracle an unrolled CTE
    * chain; each round enumerates triangles via the canonical
    * a<b<c triple join ([[triangles]]'s shape), explodes each into
    * its 3 member edges, folds support partial+final, and semi-joins
    * survivors. Scale shape: each round's survivor set materializes
    * once (the Pregel invariant — the triple join references it
    * three times, plus the semi join's left side: 4 references per
    * round); candidate volume is Σ deg(v)² over the near-dup graph,
    * sub-quadratic because banding already bounded the pair graph. */
  def ktruss(spark: SparkSession, dir: String): DataFrame =
    ktrussOn(Dedup.dedupNgramJaccard(spark, dir)
      .select(col("doc_a"), col("doc_b")))

  /** Shipped per-round state strategy for [[ktrussOn]] — decided by
    * the r15 interleaved A/B (TrussLab, parity-gated, sf0.1, 3 reps,
    * legacy timed first so it also absorbed rep-1's JVM warmup):
    * ckpt 2.8/1.9/2.4 s vs legacy-persist 11.2/3.8/4.5 — ~45% off
    * the steady-state reps. The KcoreMode mechanism transfers (4
    * references per round beat cache substitution's analysis +
    * cache-build passes) even though the shared shingle-pair build
    * is inside both walls. */
  private[operators] val TrussMode = "ckpt"

  /** The truss-peel core over an arbitrary canonically-oriented
    * (doc_a < doc_b) pair list — extracted so specs and TrussLab can
    * peel planted graphs. Modes as [[kcoreOn]]: "ckpt" (per-round
    * eager localCheckpoint, last round declarative), "legacy"
    * (per-round persist). */
  private[operators] def ktrussOn(pairsIn: DataFrame,
      mode: String = TrussMode): DataFrame = {
    def support(edges: DataFrame): DataFrame =
      edges.as("e1")
        .join(edges.as("e2"), col("e1.doc_b") === col("e2.doc_a"))
        .join(edges.as("e3"),
          col("e3.doc_a") === col("e1.doc_a") && col("e3.doc_b") === col("e2.doc_b"))
        .select(explode(array(
          struct(col("e1.doc_a").as("doc_a"), col("e1.doc_b").as("doc_b")),
          struct(col("e2.doc_a").as("doc_a"), col("e2.doc_b").as("doc_b")),
          struct(col("e3.doc_a").as("doc_a"), col("e3.doc_b").as("doc_b")))).as("e"))
        .select(col("e.doc_a").as("doc_a"), col("e.doc_b").as("doc_b"))
        .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("support"))
    var edges = mode match {
      case "ckpt"   => StateMode.cut(pairsIn)
      case "legacy" => pairsIn.persistScoped()
      case other    => throw new IllegalArgumentException(s"unknown truss mode: $other")
    }
    for (_ <- 1 to TrussRounds) {
      edges = edges.join(
        support(edges).filter(col("support") >= TrussK - 2),
        Seq("doc_a", "doc_b"), "left_semi")
      edges = mode match {
        // the final support() below re-references the last round 4×
        // more, so unlike kcoreOn the LAST round checkpoints too —
        // the declarative tail here is the left join + coalesce only
        case "ckpt" => StateMode.cut(edges)
        case _      => edges.persistScoped()
      }
    }
    edges.join(support(edges), Seq("doc_a", "doc_b"), "left")
      .select(col("doc_a"), col("doc_b"),
        coalesce(col("support"), lit(0L)).as("support"))
  }

  /** Truss replay: each round MATERIALIZED (a round references its
    * predecessor 3× in the triple join AND 3× in the union — inlined,
    * the chain re-derives geometrically; the annGraph lesson). */
  private def ktrussSql: String = {
    def supportOf(src: String): String =
      s"""SELECT doc_a, doc_b, count(*) AS support FROM (
         |    SELECT e1.doc_a AS doc_a, e1.doc_b AS doc_b
         |    FROM $src e1 JOIN $src e2 ON e1.doc_b = e2.doc_a
         |    JOIN $src e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
         |    UNION ALL
         |    SELECT e2.doc_a, e2.doc_b
         |    FROM $src e1 JOIN $src e2 ON e1.doc_b = e2.doc_a
         |    JOIN $src e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
         |    UNION ALL
         |    SELECT e3.doc_a, e3.doc_b
         |    FROM $src e1 JOIN $src e2 ON e1.doc_b = e2.doc_a
         |    JOIN $src e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b) u
         |  GROUP BY 1, 2""".stripMargin
    val rounds = (1 to TrussRounds).map { i =>
      s"""s$i AS MATERIALIZED (
         |  ${supportOf(s"t${i - 1}")}),
         |t$i AS MATERIALIZED (
         |  SELECT t.doc_a, t.doc_b FROM t${i - 1} t
         |  JOIN s$i USING (doc_a, doc_b) WHERE s$i.support >= ${TrussK - 2})""".stripMargin
    }.mkString(",\n")
    s"""${Dedup.ClusterCtes},
       |t0 AS MATERIALIZED (SELECT doc_a, doc_b FROM jp),
       |$rounds,
       |sf AS MATERIALIZED (
       |  ${supportOf(s"t$TrussRounds")})
       |SELECT t.doc_a, t.doc_b,
       |  CAST(coalesce(sf.support, 0) AS BIGINT) AS support
       |FROM t$TrussRounds t LEFT JOIN sf USING (doc_a, doc_b)""".stripMargin
  }

  /** Resource-allocation link prediction (Zhou, Lü & Zhang 2009) —
    * the weighted companion to [[jaccardNeighbors]]'s set-overlap
    * view: two customers connected through a part every customer buys
    * share almost no signal, while a part only THEY buy is near-proof
    * of a relationship, so each shared part contributes 1/degree(p)
    * (its customer count) instead of 1. On the 2²⁰ lattice the term
    * is `1048576 div n_p` — pure integer, hash-exact. Same candidate
    * discipline as jaccard_neighbors: pairs arise ONLY through parts
    * with ≤ [[RarePartMax]] buyers (the sub-quadratic blocking trade
    * — a popular part's term is ≤ 2²⁰/[[RarePartMax]] anyway), but
    * the SCORE then sums over ALL shared parts of a candidate pair.
    *
    * Scale shape: the distinct (customer, part) relation persists
    * once and feeds candidates, the exact intersection joins, and
    * the part-degree weights (one extra key join vs jaccard); final
    * rank is a global top-k (TakeOrderedAndProject). */
  def linkPredictRa(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
      .distinct()
      .persistScoped()
    val degp = e.groupBy(col("p")).agg(count(lit(1)).as("n_p")).persistScoped()
    val rare = degp.filter(col("n_p") <= RarePartMax).select(col("p"))
    val re = e.join(rare, "p")
    val cand = re.select(col("p"), col("c").as("a"))
      .join(re.select(col("p"), col("c").as("b")), "p")
      .filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
    cand
      .join(e.select(col("c").as("a"), col("p")), "a")
      .join(e.select(col("c").as("b"), col("p")), Seq("b", "p"))
      .join(degp, "p")
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_shared"),
        sum(expr("1048576 div n_p")).as("ra_q"))
      .select(col("a").as("cust_a"), col("b").as("cust_b"),
        col("n_shared"), col("ra_q"))
      .orderBy(col("ra_q").desc, col("cust_a").asc, col("cust_b").asc)
      .limit(JaccK)
  }

  private def linkPredictRaSql: String =
    s"""WITH e AS (SELECT DISTINCT o_custkey AS c, l_partkey AS p
       |           FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |dp AS (SELECT p, count(*) AS n_p FROM e GROUP BY 1),
       |rare AS (SELECT p FROM dp WHERE n_p <= $RarePartMax),
       |re AS (SELECT e.c, e.p FROM e JOIN rare USING (p)),
       |cand AS (SELECT DISTINCT a.c AS a, b.c AS b
       |         FROM re a JOIN re b ON a.p = b.p AND a.c < b.c)
       |SELECT cand.a AS cust_a, cand.b AS cust_b,
       |  count(*) AS n_shared,
       |  CAST(sum(1048576 // dp.n_p) AS BIGINT) AS ra_q
       |FROM cand JOIN e ea ON ea.c = cand.a
       |JOIN e eb ON eb.c = cand.b AND eb.p = ea.p
       |JOIN dp ON dp.p = ea.p
       |GROUP BY 1, 2
       |ORDER BY ra_q DESC, cust_a ASC, cust_b ASC
       |LIMIT $JaccK""".stripMargin

  private[operators] val KcoreK = 3
  private[operators] val KcoreRounds = 4

  /** k-core peeling (k = [[KcoreK]], [[KcoreRounds]] synchronous
    * rounds) — the density-decomposition primitive behind community
    * cores and near-dup cluster triage: vertices with degree < k are
    * peeled, degrees recompute over the survivors, repeat. Bounded
    * rounds are the CONTRACT (the graph_bfs precedent): each round
    * only ever removes vertices, so the result after R rounds is a
    * deterministic superset of the true k-core that a production run
    * extends by raising R (the fixture converges inside 4 — asserted
    * by the spec's fixed-point check). Output: surviving vertices
    * with their residual degree.
    *
    * Scale shape: the edge relation re-derives per round as two
    * semi joins against the survivor set (both keyed on the vertex —
    * co-partitioned with the degree aggregate); per round the only
    * state is (id) survivors + (id, deg) counts, never more than one
    * shuffle family wide, and the round count is a fixed constant —
    * no driver-side convergence polling. */
  def kcore(spark: SparkSession, dir: String): DataFrame =
    kcoreOn(purchaseEdges(spark, dir))

  /** Shipped per-round state strategy for the k-core peel — see
    * [[kcoreOn]] for the candidates. Chosen by the r15 interleaved
    * A/B (KcoreLab, sf0.1, 3 reps, parity-gated): ckpt 2.4/2.2/2.3 s
    * vs legacy-persist 6.2/5.8/5.6 vs fully-declarative 28.8/31.0/
    * 32.2 (the 3^rounds baseline) — cutting each round to a
    * LogicalRDD leaf beats cache substitution here because the round
    * output is referenced three times (keep's aggregate twice + the
    * join left side) and the cached plan still pays analysis +
    * cache-build passes per reference. */
  private[operators] val KcoreMode = "ckpt"

  /** The peeling core over an arbitrary symmetric edge list —
    * extracted so specs can peel planted graphs (chain-erosion and
    * fixed-point pins). Two state strategies, identical relation
    * (KcoreLab asserts exceptAll-parity both directions before any
    * timing):
    *
    *  - "legacy": per-round `persistScoped` — cache substitution
    *    truncates the effective plan, but every round's edges are
    *    referenced 3× (degree agg feeding both semi joins + the join
    *    left side), so the logical plan still grows 3^rounds and the
    *    cache materializes as a side pass of the single action.
    *  - "ckpt": per-round eager
    *    [[graft.CacheScope.ScopedDataset.localCheckpointScoped]] —
    *    the BfsMode/"ckpt" precedent: each round plans and executes
    *    exactly once against a LogicalRDD leaf; the LAST round stays
    *    declarative (the consumer's action executes it). Swap for
    *    reliable checkpoint(dir) on preemptible executors. */
  private[operators] def kcoreOn(edgesIn: DataFrame,
      k: Int = KcoreK, rounds: Int = KcoreRounds,
      mode: String = KcoreMode): DataFrame = {
    var edges = mode match {
      case "ckpt"   => StateMode.cut(edgesIn)
      case "legacy" => edgesIn.persistScoped()
      case "decl"   => edgesIn.persistScoped() // fully declarative rounds (lab baseline)
      case other    => throw new IllegalArgumentException(s"unknown kcore mode: $other")
    }
    for (r <- 1 to rounds) {
      // keep is deliberately NOT persisted: both semi joins re-derive
      // the degree aggregate from the round's materialized edges,
      // which measured 1.7× cheaper than materializing a keep cache
      // per round (KcoreLab, sf0.1: 5.1–5.5 s vs 8.6–9.9 s
      // shipped-r11 — the materialization job costs more than the
      // re-aggregation)
      val keep = edges.groupBy(col("u")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select(col("u").as("id"))
      edges = edges
        .join(keep, edges("u") === keep("id"), "left_semi")
        .join(keep, edges("v") === keep("id"), "left_semi")
      edges = mode match {
        case "ckpt"   => if (r < rounds) StateMode.cut(edges) else edges
        case "legacy" => edges.persistScoped()
        case _        => edges
      }
    }
    edges.groupBy(col("u").as("id")).agg(count(lit(1)).as("deg"))
  }

  /** DuckDB replay: rounds unrolled, each stage a semi-join filter
    * (IN) against the round's surviving-degree set. */
  private def kcoreSql: String = {
    val rounds = (1 to KcoreRounds).map { i =>
      s"""k$i AS (SELECT u AS id FROM (
         |    SELECT u, count(*) AS deg FROM e${i - 1} GROUP BY u) t
         |  WHERE deg >= $KcoreK),
         |e$i AS (SELECT u, v FROM e${i - 1}
         |  WHERE u IN (SELECT id FROM k$i) AND v IN (SELECT id FROM k$i))""".stripMargin
    }.mkString(",\n")
    s"""WITH base AS (
       |  SELECT DISTINCT o_custkey AS c, l_suppkey + $SuppOffset AS s
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |e0 AS (SELECT c AS u, s AS v FROM base
       |       UNION ALL SELECT s AS u, c AS v FROM base),
       |$rounds
       |SELECT u AS id, count(*) AS deg FROM e$KcoreRounds GROUP BY u""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pagerank"        -> pagerank,
    "pagerank_weighted" -> pagerankWeighted,
    "degree_dist"     -> degreeDist,
    "graph_bfs"       -> graphBfs,
    "sssp_weighted"   -> ssspWeighted,
    "hits_scores"     -> hitsScores,
    "label_prop"      -> labelProp,
    "kcore"           -> kcore,
    "copurchase_topk" -> copurchaseTopk,
    "assoc_rules"     -> assocRules,
    "triangles"       -> triangles,
    "clustering_coeff" -> clusteringCoeff,
    "modularity"      -> modularity,
    "jaccard_neighbors" -> jaccardNeighbors,
    "graph_assortativity" -> graphAssortativity,
    "pagerank_personalized" -> pagerankPersonalized,
    "bfs_reach"       -> bfsReach,
    "link_predict_ra" -> linkPredictRa,
    "graph_diameter"  -> graphDiameter,
    "ktruss"          -> ktruss)

  val oracles: Map[String, String] = Map(
    "pagerank" -> pagerankSql,
    "pagerank_weighted" -> pagerankWeightedSql,
    "degree_dist" -> degreeDistSql,
    "graph_bfs" -> graphBfsSql,
    "bfs_reach" -> bfsReachSql,
    "graph_diameter" -> graphDiameterSql,
    "link_predict_ra" -> linkPredictRaSql,
    "ktruss" -> ktrussSql,
    "sssp_weighted" -> ssspWeightedSql,
    "hits_scores" -> hitsScoresSql,
    "label_prop" -> labelPropSql,
    "modularity" -> modularitySql,
    "jaccard_neighbors" -> jaccardNeighborsSql,
    "graph_assortativity" -> graphAssortativitySql,
    "pagerank_personalized" -> pagerankPersonalizedSql,
    "kcore" -> kcoreSql,
    "assoc_rules" -> assocRulesSql,
    "copurchase_topk" ->
      s"""WITH base AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
         |              FROM lineitem)
         |SELECT a.pk AS part_a, b.pk AS part_b, count(*) AS n_orders
         |FROM base a JOIN base b ON a.ok = b.ok AND a.pk < b.pk
         |GROUP BY 1, 2
         |ORDER BY n_orders DESC, part_a ASC, part_b ASC
         |LIMIT $CoK""".stripMargin,
    // jp is Dedup.ClusterCtes' canonical (doc_a < doc_b) near-dup
    // pair relation — the unreferenced clustering CTEs after it are
    // never evaluated (CTEs are lazy unless MATERIALIZED)
    "triangles" ->
      s"""${Dedup.ClusterCtes}
         |SELECT e1.doc_a AS doc_a, e1.doc_b AS doc_b, e2.doc_b AS doc_c
         |FROM jp e1
         |JOIN jp e2 ON e1.doc_b = e2.doc_a
         |JOIN jp e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b""".stripMargin,
    "clustering_coeff" ->
      s"""${Dedup.ClusterCtes},
         |degx AS (SELECT a AS u, count(*) AS deg FROM edges GROUP BY a),
         |trix AS (
         |  SELECT u, count(*) AS n_tri FROM (
         |    SELECT unnest([e1.doc_a, e1.doc_b, e2.doc_b]) AS u
         |    FROM jp e1
         |    JOIN jp e2 ON e1.doc_b = e2.doc_a
         |    JOIN jp e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b) x
         |  GROUP BY u)
         |SELECT degx.u AS doc_id, CAST(degx.deg AS BIGINT) AS deg,
         |  CAST(coalesce(trix.n_tri, 0) AS BIGINT) AS n_tri,
         |  CAST(CASE WHEN degx.deg >= 2
         |    THEN (2 * coalesce(trix.n_tri, 0) * 1048576) // (degx.deg * (degx.deg - 1))
         |    ELSE 0 END AS BIGINT) AS coeff_q
         |FROM degx LEFT JOIN trix ON trix.u = degx.u""".stripMargin)
}
