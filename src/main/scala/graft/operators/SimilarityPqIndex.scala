package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.CacheScope.ScopedDataset
import graft.StateMode
import graft.functions.VectorFunctions.cosine_sim
import graft.sources.Tables

/** PqIndex slice of [[Similarity]].
  *
  * Product quantization and the persisted-index surface: PQ
  * codebooks (8-bit codes, ADC shortlist + exact rerank), IVF-PQ,
  * index build / search / incremental add, embedding drift and
  * norm statistics, kNN margin / label-noise / conformal tiers,
  * and power-iteration PCA.
  *
  * Mixin slice (r13 verdict item 3, same technique as the Relational
  * split): themed trait files mixed back into the single
  * `object Similarity`, preserving member initialization order and
  * every bare-name cross-reference. Bare `private` members widen to
  * `private[operators]` so cross-slice references keep resolving.
  */
private[operators] trait SimilarityPqIndex extends Serializable { this: Similarity.type =>


  /** Graph ANN (HNSW-class): best-first BEAM SEARCH over the
    * NN-descent k-NN graph — the third candidate-generation family
    * beside hashing (LSH) and quantization (IVF/PQ). Entry points are
    * a deterministic stride sample of the corpus scored against each
    * query; then [[BeamHops]] rounds of expand-by-graph-edges +
    * keep-top-[[BeamWidth]], and a final exact top-[[K]]. Approximate
    * BY CONSTRUCTION (only graph-reachable candidates are scored);
    * the oracle replays the identical construction + search, so the
    * gate is exact for the operator as specified, and
    * PipelineOpsSpec pins recall ≥ 0.8 vs brute force at every SF
    * (measured 1.0 / 1.0 / 0.92).
    *
    * Scale shape: the graph is (n × M) rows partitioned on src; each
    * hop shuffles only (qid, nid) beam pairs — |Q| × B × M candidate
    * rows — and the query set rides broadcast joins. Hop count and
    * beam width are constants, so query cost is independent of n
    * given the graph; graph build cost is the bounded NN-descent
    * above. That is the standard production trade for graph ANN:
    * heavy one-time index build, cheap navigating queries.
    *
    * Beam width 48 was re-measured (r13 GraphAnnLab A/B at sf0.1):
    * 48 → 8.4 s cold / recall 0.920; 40 → 8.6 s / 0.880; 32 → 7.7 s
    * / 0.880. The ~0.7 s saving at 32 is inside run-to-run noise
    * (cold repeats varied 7.0–9.0 s) while recall gives up 0.04 of
    * its 0.12 floor margin — the per-hop fixed structure (4 rounds
    * of window+join), not the width, dominates cost. Rejected; 48
    * stays.
    *
    * The build side's last dial — the descent rounds' local-join
    * candidate cap (r14 GraphAnnLab A/B, 16 vs 12, 44% less
    * candidate mass): recall IDENTICAL at every SF (1.000 / 1.000 /
    * 0.920) but steady-state cold at sf0.1 saved only 0.2 s
    * (10.6 → 10.4; the 2–3 s "wins" at small SFs were JVM-warmup
    * order bias) — at fixture scale the per-round fixed structure
    * dominates the n·cap² candidate term. Rejected for the shipped
    * op (the oracle replays the exact construction, and a
    * within-noise win doesn't buy that SQL change); the dial ships
    * as [[neighborGraphCapped]] for corpora large enough that the
    * candidate term dominates. */
  def annGraph(spark: SparkSession, dir: String): DataFrame =
    annGraphBeam(spark, dir, BeamWidth)

  /** [[annGraph]] with explicit beam width and hop count — the two
    * cost/recall dials (GraphAnnLab A/B harness; the shipped operator
    * pins [[BeamWidth]]/[[BeamHops]], and the oracle interpolates the
    * same constants). */
  private[graft] def annGraphBeam(
      spark: SparkSession, dir: String, beamWidth: Int,
      hops: Int = BeamHops, candCap: Int = GraphDeg,
      graphMode: String = GraphStateMode,
      initPairCap: Int = GraphInitPairCap): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val g = neighborGraphCapped(spark, dir, candCap, graphMode, initPairCap)
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    def scored(cand: DataFrame): DataFrame =
      cand.filter(col("qid") =!= col("nid"))
        .join(e.select(col("vec_id").as("nid"), col("embedding").as("ne")), "nid")
        .join(broadcast(q), "qid")
        .withColumn("cos", cosine_sim(col("qe"), col("ne")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
    def beamTop(cand: DataFrame): DataFrame =
      scored(cand).withColumn("rn", row_number().over(w))
        .filter(col("rn") <= beamWidth)
        .select("qid", "nid")
    val seeds = e.filter(col("vec_id") % SeedStride === 0)
      .select(col("vec_id").as("nid"))
    // after the first hop the beam carries g in its lineage, so the
    // expansion is a self-join — qualified aliases keep it resolvable
    // the beam (|Q| × B rows) is the small side: broadcast IT against
    // the graph — the shape that survives a graph too big to ship
    def expand(b: DataFrame): DataFrame =
      g.as("gr").join(broadcast(b.as("bm")), col("bm.nid") === col("gr.src"))
        .select(col("bm.qid").as("qid"), col("gr.dst").as("nid"))
    // each hop references the previous beam TWICE (union + expand);
    // unpersisted, the per-hop window+join subtree would re-derive
    // 2^hops times — the same exponential-inlining disease the
    // oracle's AS MATERIALIZED fixes on the DuckDB side. The beam is
    // |Q| × B rows, so the scoped persist is all win.
    var beam = StateMode.cut(
      beamTop(seeds.join(broadcast(q.select(col("qid"))), col("qid") =!= col("nid"))))
    for (_ <- 1 until hops)
      beam = StateMode.cut(beamTop(beam.union(expand(beam)).distinct()))
    scored(beam.union(expand(beam)).distinct())
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= K)
      .select(col("qid"), col("rnk"), col("nid"), round(col("cos"), 4).as("cos"))
  }

  /** Int8 (linear symmetric) embedding quantization — the storage/
    * bandwidth half of a vector-search pipeline: per-vector scale =
    * max|x|/127, elements round-half-up onto [-127, 127] as
    * `floor(x/scale + 0.5)` (floor, NOT round(): round() half-away vs
    * half-even tie rules differ across engines; floor(+0.5) is one
    * exactly-rounded IEEE add + an unambiguous floor in both).
    * Produces (vec_id, scale, q); dequantization is `q * scale`.
    * Scale shape: a narrow per-row map — no shuffle, rides any scan;
    * 96 floats → 96 bytes + one double, a 4× payload cut for ANN
    * candidate stores.
    *
    * The registered row emits `q` as a comma-joined STRING (like
    * `array_agg_years`): the driver's oracle compare sorts rows by
    * every output column and raw list cells are unsortable there
    * (r5: `embed_q8` errored with "unhashable type: numpy.ndarray").
    * [[embedQuantizeArr]] keeps the typed array form for library use. */
  def embedQuantizeArr(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .withColumn("scale",
        array_max(transform(col("embedding"), x => abs(x.cast("double")))) / lit(127.0))
      .select(col("vec_id"), col("scale"),
        transform(col("embedding"),
          x => floor(x.cast("double") / col("scale") + lit(0.5)).cast("long")).as("q"))

  /** Registered (string) form of [[embedQuantizeArr]] — int8 codes
    * comma-joined so the harness compare can sort the column. */
  def embedQuantize(spark: SparkSession, dir: String): DataFrame =
    embedQuantizeArr(spark, dir)
      .select(col("vec_id"), col("scale"),
        array_join(transform(col("q"), x => x.cast("string")), ",").as("q"))

  /** Embedding-distribution drift per class — the model-ops monitor
    * ("did this label's embedding cloud move between ingestion
    * batches"): vectors split into two pseudo-batches by vec_id
    * parity, each (label, batch) gets an exact lattice centroid
    * (`Σ floor(x·2²⁰) div n` per dimension — the QScale rule, trunc
    * division), and the drift is the integer squared L2 between the
    * two centroids. A genuine distribution shift shows up as a
    * per-label outlier; at fixture both halves draw from one
    * distribution so drifts are small and — the point — EXACTLY
    * reproducible. Labels missing a batch drop (nothing to bridge).
    *
    * Scale shape: one explode to (label, half, dim) partials —
    * partial+final all the way (64·|labels|·2 grouped rows), no
    * joins, no windows; the dimension pivot is a second fold over
    * grouped metadata. */
  def embedDrift(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("label").cast("long").as("label"),
        (col("vec_id") % 2L).as("half"),
        posexplode(col("embedding")).as(Seq("d", "x")))
      .select(col("label"), col("half"), col("d"),
        expr(s"cast(floor(cast(x as double) * $QScale) as bigint)").as("q"))
    val cent = e.groupBy(col("label"), col("half"), col("d"))
      .agg(expr("cast(sum(cast(q as decimal(38,0))) div count(1) as bigint)").as("c"),
        count(lit(1)).as("n"))
    cent.groupBy(col("label"), col("d"))
      .agg(max(when(col("half") === 0L, col("c"))).as("ca"),
        max(when(col("half") === 1L, col("c"))).as("cb"),
        max(when(col("half") === 0L, col("n"))).as("na"),
        max(when(col("half") === 1L, col("n"))).as("nb"))
      .filter(col("ca").isNotNull && col("cb").isNotNull)
      .groupBy(col("label"))
      .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
        sum(expr("cast((ca - cb) as decimal(38,0)) * (ca - cb)")).as("ds"))
      .select(col("label"), col("n_a"), col("n_b"),
        expr("cast(ds as bigint)").as("drift_sq"))
  }

  private[operators] def embedDriftSql: String =
    s"""WITH e AS (
       |  SELECT label, vec_id % 2 AS half,
       |    unnest(range(len(embedding))) AS d,
       |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * $QScale.0) AS BIGINT) AS q
       |  FROM embeddings),
       |c AS (SELECT label, half, d,
       |        CAST(sum(q) // count(*) AS BIGINT) AS c, count(*) AS n
       |      FROM e GROUP BY 1, 2, 3),
       |p AS (SELECT label, d,
       |        max(CASE WHEN half = 0 THEN c END) AS ca,
       |        max(CASE WHEN half = 1 THEN c END) AS cb,
       |        max(CASE WHEN half = 0 THEN n END) AS na,
       |        max(CASE WHEN half = 1 THEN n END) AS nb
       |      FROM c GROUP BY 1, 2)
       |SELECT CAST(label AS BIGINT) AS label,
       |  CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
       |  CAST(sum(CAST(ca - cb AS HUGEINT) * (ca - cb)) AS BIGINT) AS drift_sq
       |FROM p WHERE ca IS NOT NULL AND cb IS NOT NULL
       |GROUP BY label""".stripMargin

  /** Contrastive training-pair assembly — the step that turns a
    * similarity index into a training set: POSITIVES are the verified
    * near-dup pairs ([[graft.operators.Dedup.dedupEmbedding]] — its
    * oracle proves the LSH+verify path equals all-pairs truth), HARD
    * NEGATIVES are k=2 deterministic pseudo-random candidates per
    * anchor (fixed multiplier/offset arithmetic mod N — replayable in
    * SQL, unlike rand()), each scored through the same codegen cosine
    * expression. A coincidentally-similar negative keeps label 0 —
    * standard contrastive noise; the self-pair is excluded. N rides
    * as one driver scalar (metadata, the pagerank/ann_ivf precedent).
    * Scale shape: negatives are 2 rows per anchor joined to the
    * vector table on ids — shuffle payload is (id, id) longs plus
    * per-row vectors at fetch, never all-pairs. */
  def contrastivePairs(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val n = e.count()
    // persisted: the LSH-bucket + exact-verify subtree feeds BOTH the
    // final union and the negatives' anchor set — without this the
    // most expensive subtree in the query plans and executes twice
    // (the triangles precedent, [[graft.operators.Graph.triangles]])
    val pos = graft.operators.Dedup.dedupEmbedding(spark, dir)
      .select(col("vec_a").as("anchor"), col("vec_b").as("cand"),
        col("cos"), lit(1L).as("label"))
      .persistScoped()
    val neg = pos.select(col("anchor")).distinct()
      .select(col("anchor"), explode(array(lit(1L), lit(2L))).as("j"))
      .select(col("anchor"),
        ((col("anchor") * 7919L + col("j") * 104729L) % n).as("cand"))
      .filter(col("cand") =!= col("anchor"))
      .distinct() // j=1/j=2 can collide mod N — one row per (anchor, cand)
      .join(e.select(col("vec_id").as("anchor"), col("embedding").as("ea")), "anchor")
      .join(e.select(col("vec_id").as("cand"), col("embedding").as("eb")), "cand")
      .select(col("anchor"), col("cand"),
        round(cosine_sim(col("ea"), col("eb")), 4).as("cos"), lit(0L).as("label"))
    pos.unionByName(neg)
  }

  // -- PQ: sampled-point codebook + exact integer ADC ----------------

  private[operators] val NSub = 8    // subspaces
  private[operators] val SubDim = 8  // dims per subspace (NSub × SubDim = Dim)
  private[operators] val NCodes = 256 // 8-bit codes (r8 shipped 16/4-bit; recall at sf0.1 was 0.62)

  /** Lattice-floored component i of a (possibly ragged) vector —
    * the same 2^-20 grid as the IVF Lloyd update, so every distance
    * below is exact integer arithmetic in BOTH engines. */
  private[operators] def lat(v: Array[Float], i: Int): Long =
    if (i < v.length) math.floor(v(i).toDouble * QScale).toLong else 0L

  /** Sampled-point SEED codebook, as lattice integers:
    * codebook(s)(c)(d) = component s·SubDim+d of seed vector c
    * (vec_id ∈ [base, base+NCodes), base corpus-derived via
    * `seedWindowBase` — the IVF seed-slice trick, one codebook entry
    * per seed per subspace). Driver metadata: 256×64 longs. */
  private[operators] def pqSeedCodebook(spark: SparkSession, dir: String): Array[Array[Array[Long]]] = {
    val base = seedWindowBase(spark, dir).getOrElse(SeedBaseOffset)
    val seeds = Tables.embeddings(spark, dir)
      .filter(col("vec_id") >= base && col("vec_id") < (base + NCodes))
      .select(col("vec_id"), col("embedding"))
      .collect()
      .sortBy(_.getLong(0))
      .map(_.getSeq[Float](1).toArray)
    Array.tabulate(NSub, NCodes, SubDim)((s, c, d) => lat(seeds(c), s * SubDim + d))
  }

  /** TRAINED PQ codebook: one deterministic Lloyd round per subspace
    * from the seed — the same distributed shape as the IVF centroid
    * update (one narrow pass accumulating dense per-partition
    * (subspace, code, dim) integral sums; the shuffle carries
    * partitions×8×256×8 rows, never vectors), with per-cell integer
    * means on the lattice (truncating division both engines compute
    * identically) and empty cells keeping their seed entry. Raw
    * sampled points left the ADC ordering too loose (shortlist-50
    * recall 0.5–0.6); the trained round tightens every subspace. */
  private[operators] def pqCodebook(spark: SparkSession, dir: String,
      trainFilter: Column = lit(true)): Array[Array[Array[Long]]] = {
    import spark.implicits._
    val seed = pqSeedCodebook(spark, dir)
    val sums = Tables.embeddings(spark, dir)
      .filter(trainFilter)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .mapPartitions { rows =>
        val acc = Array.ofDim[Long](NSub, NCodes, SubDim)
        val cnt = Array.ofDim[Long](NSub, NCodes)
        rows.foreach { case (_, v) =>
          val cs = pqCodesOf(v, seed)
          var s = 0
          while (s < NSub) {
            val c = cs(s)
            cnt(s)(c) += 1
            var d = 0
            while (d < SubDim) { acc(s)(c)(d) += lat(v, s * SubDim + d); d += 1 }
            s += 1
          }
        }
        for {
          s <- (0 until NSub).iterator
          c <- (0 until NCodes).iterator if cnt(s)(c) > 0
          d <- (0 until SubDim).iterator
        } yield (s, c, d, acc(s)(c)(d), cnt(s)(c))
      }
      .toDF("s", "c", "d", "pq", "pn")
      .groupBy("s", "c", "d").agg(sum(col("pq")).as("sq"), sum(col("pn")).as("n"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> (r.getLong(3), r.getLong(4)))
      .toMap
    Array.tabulate(NSub, NCodes, SubDim) { (s, c, d) =>
      sums.get((s, c, d)) match {
        case Some((sq, n)) => sq / n // trunc toward zero, same as the oracle's //
        case None          => seed(s)(c)(d)
      }
    }
  }

  /** Per-subspace code assignment: argmin L2 on the lattice
    * (tie → lower code). Exact: components ≤ 2^20, diff² ≤ 2^42,
    * Σ over 8 dims ≤ 2^45 — well inside Long. */
  private[operators] def pqCodesOf(v: Array[Float], cb: Array[Array[Array[Long]]]): Array[Int] =
    Array.tabulate(NSub) { s =>
      var best = 0; var bestDist = Long.MaxValue
      var c = 0
      while (c < NCodes) {
        var dist = 0L
        var d = 0
        while (d < SubDim) {
          val diff = lat(v, s * SubDim + d) - cb(s)(c)(d)
          dist += diff * diff
          d += 1
        }
        if (dist < bestDist) { bestDist = dist; best = c }
        c += 1
      }
      best
    }

  /** Product-quantization codes — the storage half of large-scale
    * vector search beyond scalar int8 ([[embedQuantize]]): each
    * 64-dim vector compresses to 8 eight-bit codes (8 BYTES — a 32×
    * payload cut), each code the nearest of [[NCodes]] = 256 trained
    * centroids in its 8-dim subspace — the standard production PQ
    * width (FAISS's `PQ8`). r8 shipped 4-bit codes (NCodes = 16);
    * that ADC was too coarse once N outgrew the codebook (ann_pq
    * recall@5 fell to 0.62 at sf0.1), so r9 widened to 8-bit — the
    * exact "NCodes 16 → 256" dial the r8 scaladoc predicted, plan
    * shape unchanged. All assignment arithmetic is exact
    * lattice-integer L2, so the oracle replays every code
    * bit-for-bit. Scale shape: one narrow map over the scan; the
    * codebook is driver metadata (256×64 longs). The remaining
    * recall dials at 100 TB are an OPQ-style rotation and the
    * shortlist width — neither changes the plan. */
  def embedPq(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cb = pqCodebook(spark, dir)
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .map { case (id, v) =>
        val cs = pqCodesOf(v, cb)
        (id, cs(0).toLong, cs(1).toLong, cs(2).toLong, cs(3).toLong,
          cs(4).toLong, cs(5).toLong, cs(6).toLong, cs(7).toLong)
      }
      .toDF("vec_id", "c0", "c1", "c2", "c3", "c4", "c5", "c6", "c7")
  }

  /** Per-subspace PQ distortion profile — the codebook-health query a
    * vector store runs after every (re)train: for each of the 8
    * subspaces, how far members sit from their assigned codeword
    * (exact lattice SSE — mean via one truncating division, plus the
    * max tail). A subspace whose distortion dwarfs the others is
    * under-trained or carries the data's variance and wants more
    * codes; rising means across retrains signal drift. Scale shape:
    * one narrow typed pass against the broadcast codebook (8·256·8
    * longs, driver metadata) emitting 8 (s, sse) longs per vector,
    * then ONE partial+final aggregation — O(8) output at any corpus
    * size. Sums accumulate in DECIMAL(38,0): per-row SSE ≤ 8·(2²¹)²
    * ≈ 2⁴⁵, so long totals overflow near 2¹⁸ vectors. */
  def pqDistortion(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cb = pqCodebook(spark, dir)
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .flatMap { case (_, v) =>
        val cs = pqCodesOf(v, cb)
        (0 until NSub).iterator.map { s =>
          var sse = 0L
          var d = 0
          while (d < SubDim) {
            val diff = lat(v, s * SubDim + d) - cb(s)(cs(s))(d)
            sse += diff * diff
            d += 1
          }
          (s.toLong, sse)
        }
      }
      .toDF("s", "sse")
      .groupBy(col("s"))
      .agg(count(lit(1)).as("n"),
        sum(col("sse").cast("decimal(38,0)")).as("tot"),
        max(col("sse")).as("max_sse"))
      .select(col("s"), col("n"),
        expr("cast(tot div n as bigint)").as("mean_sse"), col("max_sse"))
  }

  /** Codebook-utilization balance of the trained PQ — the OTHER
    * index-health axis beside [[pqDistortion]]'s error profile: per
    * subspace, how many of the 256 codes the corpus actually uses,
    * how many are DEAD (a dead code is a wasted codebook row — the
    * 8-bit budget quietly shrinks), and the heaviest code's member
    * share on the 2²⁰ lattice (one code swallowing the subspace
    * means the quantizer collapsed there and ADC contrast is gone).
    * Pure rollup of [[embedPq]]'s gated codes — unpivot to (s, code),
    * one partial+final count, an O(8·256) final fold; the oracle
    * wraps the identical code replay. */
  def pqCodeBalance(spark: SparkSession, dir: String): DataFrame =
    embedPq(spark, dir)
      .select(expr("stack(8, 0, c0, 1, c1, 2, c2, 3, c3, 4, c4, 5, c5, 6, c6, 7, c7) as (s, code)"))
      .groupBy(col("s"), col("code")).agg(count(lit(1)).as("n"))
      .groupBy(col("s"))
      .agg(count(lit(1)).as("codes_used"),
        max(col("n")).as("max_code_n"),
        sum(col("n")).as("n_vecs"))
      .select(col("s").cast("long").as("s"), col("codes_used"),
        (lit(256L) - col("codes_used")).as("dead_codes"), col("max_code_n"),
        expr("(max_code_n * cast(1048576 as bigint)) div n_vecs").as("top_share_q"))

  private[operators] def pqCodeBalanceSql: String =
    s"""WITH ${pqReplayPrefix()},
       |cc AS (SELECT s, code, count(*) AS n FROM codes GROUP BY 1, 2)
       |SELECT CAST(s AS BIGINT) AS s, count(*) AS codes_used,
       |  CAST(256 - count(*) AS BIGINT) AS dead_codes,
       |  CAST(max(n) AS BIGINT) AS max_code_n,
       |  CAST((max(n) * 1048576) // sum(n) AS BIGINT) AS top_share_q
       |FROM cc GROUP BY s""".stripMargin

  private[operators] val PqShortlist = 100

  /** PQ ANN: ADC scan → shortlist → exact rerank, the production
    * IVF-PQ search shape. Stage 1 (ADC, asymmetric distance
    * computation): each query's 8×256 subspace distance table is a
    * RELATION — (qid, s, c, qd) rows computed by a narrow distributed
    * map over the query vectors against the broadcast codebook — and
    * the ADC score is a broadcast hash join of the corpus codes to
    * that table on (s, code) plus a partial+final sum, so no per-pair
    * float math survives into the scan (the trick that makes billion-
    * scale scans memory-bandwidth-bound instead of FLOP-bound) AND no
    * per-query work happens on the driver: r8 collected the query
    * vectors and built per-query literal tables in a driver loop —
    * fine at 10 queries, a serial bottleneck at a real 10k-query
    * batch. This form ships the query set as data; batch size only
    * widens the broadcast. Stage 2: the [[PqShortlist]] best ADC
    * candidates per query are re-scored with EXACT (lattice-integer)
    * L2 and re-ranked — codes alone scramble the top-5, while
    * trained 8-bit ADC + shortlist-100 + rerank measures recall@5 of
    * 1.00/1.00/0.98 at sf0.001/0.01/0.1 (r8's 4-bit codes: 0.62 at
    * sf0.1; PipelineOpsSpec asserts a 0.9 floor at ALL THREE SFs);
    * only shortlist×queries vectors are ever re-fetched. Every quantity in both stages is an exact BIGINT,
    * so the WHOLE operator (seed codebook, Lloyd training, codes,
    * query tables, ADC sums, shortlist cut, rerank) hash-replays in
    * DuckDB — not an envelope check. Scale shape: one narrow map
    * over the codes, a broadcast join to the query tables, a
    * rank-limit shortlist, then an id-keyed re-join of shortlist
    * rows only; shuffles carry (qid, nid, dist) longs. */
  def annPq(spark: SparkSession, dir: String): DataFrame = {
    val cb = pqCodebook(spark, dir)
    val scored = pqCodesNarrow(spark, dir, cb)
      .join(broadcast(pqQueryTables(spark, dir, cb)), Seq("s", "c"))
      .filter(col("qid") =!= col("nid"))
      .groupBy(col("qid"), col("nid"))
      .agg(sum(col("qd")).as("adc"))
    rerankShortlist(spark, dir, scored)
  }

  /** Corpus codes in narrow (nid, s, code) form — the same argmin
    * assignment [[embedPq]] materializes wide. */
  private[operators] def pqCodesNarrow(
      spark: SparkSession, dir: String, cb: Array[Array[Array[Long]]]): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .flatMap { case (nid, v) =>
        pqCodesOf(v, cb).iterator.zipWithIndex.map { case (c, s) => (nid, s, c) }
      }
      .toDF("nid", "s", "c")
  }

  /** Per-query ADC tables as a relation: dt(q, s, c) = L2²(query
    * subvector s, codebook(s)(c)) — computed where the query rows
    * live, never on the driver. */
  private[operators] def pqQueryTables(
      spark: SparkSession, dir: String, cb: Array[Array[Array[Long]]]): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, dir)
      .filter(col("vec_id") < NQueries)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .flatMap { case (qid, v) =>
        for (s <- (0 until NSub).iterator; c <- (0 until NCodes).iterator) yield {
          var dist = 0L
          var d = 0
          while (d < SubDim) {
            val diff = lat(v, s * SubDim + d) - cb(s)(c)(d)
            dist += diff * diff
            d += 1
          }
          (qid, s, c, dist)
        }
      }
      .toDF("qid", "s", "c", "qd")
  }

  /** [[PqShortlist]] cut on (qid, nid, adc) scores, then exact
    * lattice-L2 rerank of shortlist rows only (codegen'd higher-order
    * fns, Long arithmetic throughout — bit-identical cross-engine). */
  private[operators] def rerankShortlist(spark: SparkSession, dir: String, scored: DataFrame): DataFrame = {
    val wAdc = Window.partitionBy(col("qid")).orderBy(col("adc").asc, col("nid").asc)
    val short = scored
      .withColumn("srk", row_number().over(wAdc))
      .filter(col("srk") <= PqShortlist)
      .select(col("qid"), col("nid"))
    def latArr(c: Column): Column =
      transform(c, x => floor(x.cast("double") * lit(QScale.toDouble)).cast("long"))
    val e = Tables.embeddings(spark, dir)
    val exact = short
      .join(e.select(col("vec_id").as("qid"), latArr(col("embedding")).as("ql")), "qid")
      .join(e.select(col("vec_id").as("nid"), latArr(col("embedding")).as("nl")), "nid")
      .withColumn("dist",
        aggregate(zip_with(col("ql"), col("nl"), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, v) => acc + v))
    val w = Window.partitionBy(col("qid")).orderBy(col("dist").asc, col("nid").asc)
    exact
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= K)
      .select(col("qid"), col("rnk"), col("nid"), col("dist"))
  }

  /** IVF-PQ: the production billion-scale composition — [[annIvf]]'s
    * coarse quantizer prunes the CANDIDATE SET (only vectors in the
    * query's [[NProbe]] nearest of [[NCells]] cells are considered),
    * then [[annPq]]'s integer ADC scores just those candidates from
    * their 8-byte codes, and the exact rerank touches shortlist rows
    * only. This is FAISS's `IVFx,PQy` index as a Spark plan: at
    * 100 TB the cell assignment is the partition pruning (cells map
    * to file/bucket layout, so a probe reads nprobe/NCells of the
    * corpus), the ADC scan reads codes (32× smaller than vectors),
    * and full vectors surface only for the shortlist re-join. Every
    * stage is the same exact lattice arithmetic as its parent
    * operator, so the composition hash-replays end to end — coarse
    * training, assignment, probing, PQ training, codes, ADC,
    * shortlist, rerank. Recall vs brute force is asserted beside the
    * parents' floors in PipelineOpsSpec: measured 0.88/0.80/0.76 at
    * sf0.001/0.01/0.1 (floor 0.7 at every SF) — within 0.02 of plain
    * IVF, i.e. the coarse probe dominates the loss while 8-bit ADC +
    * rerank is near-exact, the classic IVF-PQ operating profile. */
  def annIvfPq(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cents = learnedCentroids(spark, dir)
    val cb = pqCodebook(spark, dir)
    val e = Tables.embeddings(spark, dir)
    val cells = e.select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .map(r => (r._1, nearestCells(cents, r._2, 1).head))
      .toDF("nid", "cell")
    val qCells = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .flatMap(r => nearestCells(cents, r._2, NProbe).map(c => (r._1, c)))
      .toDF("qid", "cell")
    val cand = cells.join(broadcast(qCells), "cell")
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"))
    val scored = cand
      .join(pqCodesNarrow(spark, dir, cb), "nid")
      .join(broadcast(pqQueryTables(spark, dir, cb)), Seq("qid", "s", "c"))
      .groupBy(col("qid"), col("nid"))
      .agg(sum(col("qd")).as("adc"))
    rerankShortlist(spark, dir, scored)
  }

  // ──────────────── persisted ANN index (train once, search many) ───────────────

  /** Builds the IVF-PQ index ARTIFACTS and writes them as parquet —
    * the r9-verdict gap: every `ann_*` invocation retrained centroids
    * and codebook inside the query, but at 100 TB the index is the
    * expensive persisted artifact and searches must only READ it
    * (FAISS's train/add vs search split; the `zorder_write` /
    * `join_bucketed` write→re-read precedent). Four artifacts:
    *
    *  - `centroids/` (cell, d, cv DOUBLE): the Lloyd-trained coarse
    *    quantizer. DOUBLE, not lattice LONG — an empty cell keeps its
    *    raw seed components, which are not lattice multiples.
    *  - `codebook/`  (s, c, d, cbq LONG): trained PQ codebook on the
    *    2^-20 lattice (exact).
    *  - `cells/`     (nid, cell): coarse assignment of every vector.
    *  - `codes/`     (nid, s, c): 8-bit PQ codes, narrow form.
    *
    * Training runs the SAME deterministic chain as [[annIvfPq]]
    * (seed slice → one Lloyd round; seed codebook → one per-subspace
    * round), so a search over the stored index reproduces
    * `ann_ivfpq` bit-for-bit — the oracle is shared. At 100 TB the
    * cells/codes writes would be partitioned by cell (the partition-
    * pruning layout); at fixture scale they are plain parquet. */
  private[graft] def annIndexBuild(spark: SparkSession, dir: String): String =
    annIndexBuildOn(spark, dir, "annindex", lit(true))

  /** [[annIndexBuild]] generalized: train AND populate only from
    * vectors matching `srcFilter` (the base corpus of an incremental
    * add — [[annIndexAdd]]); `label` scopes the artifact scratch. */
  private[graft] def annIndexBuildOn(spark: SparkSession, dir: String,
      label: String, srcFilter: Column): String = {
    import spark.implicits._
    val root = graft.sources.TempDirs.scratch(label, dir)
    val cents = learnedCentroids(spark, dir, srcFilter)
    val cb = pqCodebook(spark, dir, srcFilter)
    cents.toSeq.flatMap { case (cell, arr) =>
      arr.iterator.zipWithIndex.map { case (v, d) => (cell, d, v) } }
      .toDF("cell", "d", "cv")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/centroids")
    (for { s <- 0 until NSub; c <- 0 until NCodes; d <- 0 until SubDim }
      yield (s, c, d, cb(s)(c)(d)))
      .toDF("s", "c", "d", "cbq")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/codebook")
    val e = Tables.embeddings(spark, dir).filter(srcFilter)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
    // IndexFileLab r13 (measured, rejected): coalescing the cells/
    // codes writes to row-sized file counts (~2^18 rows/file) moved
    // the pair 5.3+6.7 s → 5.4+7.2 s at sf0.1 — file-open overhead is
    // NOT the bound (training compute is), and the sizing pass costs
    // an extra source count. Keeping the plain per-task write; at
    // real scale maxRecordsPerFile on the writer is the knob.
    e.map(r => (r._1, nearestCells(cents, r._2, 1).head))
      .toDF("nid", "cell")
      .write.mode("overwrite").parquet(s"$root/cells")
    e.flatMap { case (nid, v) =>
      pqCodesOf(v, cb).iterator.zipWithIndex.map { case (c, s) => (nid, s, c) } }
      .toDF("nid", "s", "c")
      .write.mode("overwrite").parquet(s"$root/codes")
    root
  }

  /** IVF-PQ search over a STORED index — the production search path:
    * zero training jobs, zero object-code maps, zero driver collects.
    * Everything is relational:
    *
    *  1. query→cell probing: the 16-row centroid relation broadcasts
    *     ([[ScalarJoin.broadcastCross]] keeps it a hash join) and the
    *     cosine is built-in `aggregate`/`zip_with` double arithmetic
    *     accumulating in index order — bit-identical to the build's
    *     driver-side `cosTo` (IEEE addition in the same order);
    *  2. ADC tables: the 16384-row codebook broadcasts against the
    *     query vectors; per-(qid, s, c) distances are exact lattice
    *     LONGs — a 10k-query batch only widens this broadcast, no
    *     driver loop anywhere ([[PipelineOpsSpec]] executes a
    *     1000-query batch and asserts the plan);
    *  3. candidates: stored `cells/` joined to the broadcast probe
    *     set; ADC scores: stored `codes/` joined to the broadcast
    *     tables, partial+final integer sum;
    *  4. shortlist + exact rerank: [[rerankShortlist]] verbatim (full
    *     vectors surface only for shortlist rows).
    *
    * The search plan contains no Lloyd or codebook jobs by
    * construction — PlanAuditSpec asserts no object-serialization
    * nodes anywhere in it. */
  private[operators] def latArrCol(c: Column): Column =
    transform(c, x => floor(x.cast("double") * lit(QScale.toDouble)).cast("long"))
  private[operators] def sumArrCol(arr: Column): Column =
    aggregate(arr, lit(0.0), (a, x) => a + x)

  /** Stored centroids → (cell, ce: array<double>), d-ordered. */
  private[operators] def centArrOf(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/centroids")
      .groupBy(col("cell"))
      .agg(array_sort(collect_list(struct(col("d"), col("cv")))).as("p"))
      .select(col("cell"), transform(col("p"), s => s.getField("cv")).as("ce"))

  /** Relational cell scores for arbitrary vectors vs the centroid
    * relation: (id, cell, cos) — the cosine is built-in expression
    * arithmetic accumulating in index order, bit-identical to the
    * driver-side `cosTo` (same IEEE addition order, same −2.0
    * zero-norm sentinel, ties → lower cell downstream). */
  private[operators] def relCellScores(vecs: DataFrame, centArr: DataFrame): DataFrame =
    ScalarJoin.broadcastCross(vecs, col("id"), centArr, col("cell"))
      .withColumn("dot", sumArrCol(zip_with(col("ve"), col("ce"), (w, u) => u * w)))
      .withColumn("na", sumArrCol(transform(col("ce"), u => u * u)))
      .withColumn("nb", sumArrCol(transform(col("ve"), w => w * w)))
      .withColumn("cos", when(col("na") === 0.0 || col("nb") === 0.0, lit(-2.0))
        .otherwise(col("dot") / (sqrt(col("na")) * sqrt(col("nb")))))

  /** Relational per-(id, s, c) lattice L2² vs the stored codebook —
    * shared by the query ADC tables and the incremental-add code
    * assignment. */
  private[operators] def relCodeDists(spark: SparkSession, root: String, vecs: DataFrame): DataFrame =
    ScalarJoin.broadcastCross(vecs, col("id"),
        spark.read.parquet(s"$root/codebook"), col("cbq"))
      .withColumn("qcomp", coalesce(
        element_at(col("vl"), (col("s") * SubDim + col("d") + 1).cast("int")), lit(0L)))
      .withColumn("diff", col("qcomp") - col("cbq"))
      .groupBy(col("id"), col("s"), col("c"))
      .agg(sum(col("diff") * col("diff")).as("qd"))

  private[graft] def annIndexSearchN(
      spark: SparkSession, dir: String, root: String, nQueries: Long): DataFrame =
    annIndexSearchOver(spark, dir, root, nQueries,
      spark.read.parquet(s"$root/cells"), spark.read.parquet(s"$root/codes"))

  /** The search tail over EXPLICIT cells/codes relations (stored, or
    * stored ∪ incrementally-added — [[annIndexAdd]]). */
  private[operators] def annIndexSearchOver(spark: SparkSession, dir: String, root: String,
      nQueries: Long, cells: DataFrame, codes: DataFrame): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"),
        transform(col("embedding"), x => x.cast("double")).as("qe"),
        latArrCol(col("embedding")).as("ql"))
    val qcScored = relCellScores(
      q.select(col("qid").as("id"), col("qe").as("ve")), centArrOf(spark, root))
    val wq = Window.partitionBy(col("id")).orderBy(col("cos").desc, col("cell").asc)
    val qCells = qcScored
      .withColumn("rk", row_number().over(wq))
      .filter(col("rk") <= NProbe)
      .select(col("id").as("qid"), col("cell"))
    val cand = cells
      .join(broadcast(qCells), "cell")
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"))
    val qt = relCodeDists(spark, root,
        q.select(col("qid").as("id"), col("ql").as("vl")))
      .select(col("id").as("qid"), col("s"), col("c"), col("qd"))
    val scored = cand
      .join(codes, "nid")
      .join(broadcast(qt), Seq("qid", "s", "c"))
      .groupBy(col("qid"), col("nid"))
      .agg(sum(col("qd")).as("adc"))
    rerankShortlist(spark, dir, scored)
  }

  /** Registered round trip: build (write artifacts) then search (read
    * them). Output is bit-identical to [[annIvfPq]] — same training,
    * same probing, same ADC, same rerank — so they SHARE an oracle
    * (the simjoin_prefix ≡ dedup_ngram precedent). Bench charges
    * build + search honestly (the build rewrites its artifacts every
    * call).
    *
    * Fixture-scale floor (r15 IndexLab, sf0.1): steady-state stages
    * are seed 0.6 / lloyd 0.8 / codebook 1.3 / artifact writes 0.8 /
    * cells+codes 0.8 / search 2.3 s — and the search's 2.3 s is 23
    * AQE jobs (23 stages, 209 tasks) moving ≤1.2M tiny rows: per-job
    * fixed machinery (~0.1 s/job at local[32]), not data. The r13
    * file-sizing dial was already measured-and-rejected. At 100 TB
    * the 23-job skeleton is constant while the corpus-proportional
    * stages (cells/codes assignment+write, here 0.8 s) grow — the
    * design scales; the fixture number is the machinery floor. */
  def annIndex(spark: SparkSession, dir: String): DataFrame = {
    val root = annIndexBuild(spark, dir)
    annIndexSearchN(spark, dir, root, NQueries)
  }

  /** Incremental index ADD — FAISS's `add()` against a persisted
    * index, the last operational ANN residue from r9: the index is
    * trained and populated on the BASE corpus (the first 4/5 of the
    * vectors — all fixed seed slices live inside it), then the
    * remaining fifth is added by assigning against the STORED
    * artifacts with NO retraining: delta cell assignment is the
    * relational centroid cosine ([[relCellScores]], rank-1), delta
    * PQ codes the relational per-subspace argmin
    * ([[relCodeDists]], rank-1 per (vector, subspace)) — both
    * broadcast joins over narrow scans, zero object code, zero
    * driver collects in the add path. The registered result searches
    * the MERGED (stored ∪ added) index; its oracle is the full
    * IVF-PQ replay with the training CTEs filtered to the base —
    * assignment-with-trained-artifacts is exactly what the replay's
    * assign/codes CTEs compute for every vector, so the whole
    * add-then-search contract is hash-gated. At 100 TB this is the
    * ingest path: nightly builds train; intraday batches append
    * cells/codes partitions; searches read the union. */
  def annIndexAdd(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val t = e.count() * 4L / 5L
    val root = annIndexBuildOn(spark, dir, "annindexadd", col("vec_id") < t)
    val delta = e.filter(col("vec_id") >= t)
    val dCells = relCellScores(
        delta.select(col("vec_id").as("id"),
          transform(col("embedding"), x => x.cast("double")).as("ve")),
        centArrOf(spark, root))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("cos").desc, col("cell").asc)))
      .filter(col("rk") === 1)
      .select(col("id").as("nid"), col("cell"))
    val dCodes = relCodeDists(spark, root,
        delta.select(col("vec_id").as("id"), latArrCol(col("embedding")).as("vl")))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("id"), col("s")).orderBy(col("qd").asc, col("c").asc)))
      .filter(col("rk") === 1)
      .select(col("id").as("nid"), col("s"), col("c"))
    annIndexSearchOver(spark, dir, root, NQueries,
      spark.read.parquet(s"$root/cells").unionByName(dCells),
      spark.read.parquet(s"$root/codes").unionByName(dCodes))
  }

  /** Exact Gram (second-moment) matrix of the embedding corpus —
    * Σ xᵢxⱼ over all vectors for every coordinate pair (i, j), the
    * 64×64 input PCA / whitening / linear-probe prep reads off a
    * corpus. Elements are floored onto the family's 2^-20 lattice
    * first, so every product is an exact BIGINT and the sums
    * accumulate as DECIMAL(38,0) — order-insensitive and
    * overflow-proof far past any corpus size BIGINT could carry
    * (|product| ≤ 2^40, so 64-bit sums die around 10^5 rows of
    * full-magnitude mass; decimal dies around 10^26). Only the
    * finished sum is cast to BIGINT for the gated row — DuckDB's
    * HUGEINT sum lands on the same presentation type.
    *
    * Shape at 100 TB: the outer product is generated ROW-side —
    * `flatten(transform²)` builds the 4096-element product array
    * inside whole-stage codegen, `posexplode` streams it, and hash
    * aggregation partial-combines per partition BEFORE the only
    * shuffle. Per partition, exactly 4096 (i, j, Σ) rows cross the
    * wire regardless of row count — the n×4096 expansion never
    * materializes. PlanAuditSpec asserts the single-exchange plan. */
  def gramMatrix(spark: SparkSession, dir: String): DataFrame = {
    val q = latArrCol(col("embedding"))
    val outer = flatten(transform(q, vi => transform(q, vj => vi * vj)))
    Tables.embeddings(spark, dir)
      .select(posexplode(outer).as(Seq("pos", "prod")))
      .groupBy(floor(col("pos") / Dim).cast("long").as("i"),
        (col("pos") % Dim).cast("long").as("j"))
      .agg(sum(col("prod").cast(DecimalType38)).cast("long").as("g"))
  }

  private[operators] val DecimalType38 =
    org.apache.spark.sql.types.DecimalType(38, 0)

  private[operators] val MutualK = 3

  /** Per-label embedding-norm profile — the batch sanity check an
    * embedding pipeline runs on every new shard BEFORE indexing it
    * (collapsed vectors → norms near 0; an un-normalized model swap
    * → norms far from the expected shell; both invisible to cosine
    * ops, which normalize them away): per class label, the count and
    * the min/max/mean of ‖v‖² on the shared Q-lattice
    * (Σ floor(vᵢ·2²⁰)² — per-dim squares ≤ 2⁴⁰, a 64-dim sum ≤ 2⁴⁶,
    * long-safe; the MEAN accumulates as DECIMAL(38) before its
    * integral division). One narrow scan + one partial+final
    * aggregate — vectors never shuffle, only (label, nq) longs. */
  def embedNormStats(spark: SparkSession, dir: String): DataFrame = {
    val nq = aggregate(latArrCol(col("embedding")), lit(0L), (a, x) => a + x * x)
    Tables.embeddings(spark, dir)
      .select(col("label").cast("long").as("label"), nq.as("nq"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"), min(col("nq")).as("min_nq"),
        max(col("nq")).as("max_nq"),
        sum(col("nq").cast(DecimalType38)).as("s"))
      .select(col("label"), col("n"), col("min_nq"), col("max_nq"),
        expr("cast(s div n as bigint)").as("avg_nq"))
  }

  /** Mutual k-NN pairs — the symmetric-neighborhood graph a
    * curation pipeline trusts more than one-directional retrieval
    * (hubness filter: a vector that appears in thousands of top-k
    * lists is a degenerate hub unless those lists are reciprocated):
    * (a, b) is emitted iff b ranks in a's top-[[MutualK]] AND a
    * ranks in b's — the building block of reciprocal-rank clustering
    * and of UMAP/HDBSCAN-style graph construction. Candidates are
    * CLUSTER-SCOPED through the shared IVF coarse quantizer
    * ([[cellAssignments]] — the same trained artifact as `ann_ivf`
    * and `dedup_semantic`), never all-pairs: intra-cell work is
    * Σ cell², with cell count the 100 TB knob (the SemDeDup
    * orientation). Per-source rank caps ride WindowGroupLimit (the
    * per-partition heap prunes to k before the exchange); the
    * reciprocity check is a self-join of the top-k relation with
    * itself on the REVERSED key — |V|·k rows, metadata-scale. The
    * tagged relation persists once behind both window sides. */
  def mutualKnn(spark: SparkSession, dir: String): DataFrame = {
    val t = cellAssignments(spark, dir)
      .join(Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding")),
        "vec_id")
      .persistScoped()
    val cand = t.as("a")
      .join(t.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("src"), col("b.vec_id").as("dst"),
        cosine_sim(col("a.embedding"), col("b.embedding")).as("cos"))
    val w = Window.partitionBy("src").orderBy(col("cos").desc, col("dst").asc)
    val topk = cand.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= MutualK)
      .select(col("src"), col("dst"), col("cos"))
      .persistScoped()
    topk.as("x")
      .join(topk.as("y"),
        col("x.src") === col("y.dst") && col("x.dst") === col("y.src") &&
          col("x.src") < col("x.dst"))
      .select(col("x.src").as("vec_a"), col("x.dst").as("vec_b"),
        round(col("x.cos"), 4).as("cos"))
  }

  /** Nearest-neighbor margin per query — the retrieval-confidence
    * diagnostic (a tiny d2−d1 margin means the top hit is ambiguous;
    * margin distributions drive abstention thresholds and hard-
    * negative mining): for each of the [[NQueries]] probe vectors,
    * the exact lattice-L2 first and second neighbors and their
    * margin. All integers (per-dim squared diffs ≤ 2⁴², a 64-dim sum
    * ≤ 2⁴⁸ — long-safe), so the gate is hash-exact. Scale shape: the
    * |Q|-row probe set broadcasts against the corpus scan (the
    * [[annTopkBrute]] orientation), the rank-2 cut rides
    * WindowGroupLimit (per-partition heap keeps 2 rows per query
    * before the exchange), and the pivot to one row per query is a
    * |Q|·2-row metadata fold. */
  def knnMargin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("qid"), latArrCol(col("embedding")).as("qq"))
    val c = e.select(col("vec_id").as("nid"), latArrCol(col("embedding")).as("nq"))
    val d = aggregate(zip_with(col("qq"), col("nq"), (x, y) => (x - y) * (x - y)),
      lit(0L), (a, x) => a + x)
    val w = Window.partitionBy(col("qid")).orderBy(col("dd").asc, col("nid").asc)
    c.join(broadcast(q), col("qid") =!= col("nid"))
      .withColumn("dd", d)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 2)
      .groupBy(col("qid"))
      .agg(min(when(col("rnk") === 1, col("nid"))).as("nn1"),
        min(when(col("rnk") === 1, col("dd"))).as("d1"),
        min(when(col("rnk") === 2, col("dd"))).as("d2"))
      .withColumn("margin", col("d2") - col("d1"))
  }

  private[operators] def knnMarginSql: String =
    s"""WITH l AS (SELECT vec_id,
       |  list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * $QScale.0) AS BIGINT)) AS q
       |  FROM embeddings),
       |qs AS (SELECT vec_id AS qid, q AS qq FROM l WHERE vec_id < $NQueries),
       |dd AS (SELECT unnest(range($Dim)) AS i),
       |sc AS (SELECT qs.qid, l.vec_id AS nid,
       |         CAST(sum((qs.qq[dd.i + 1] - l.q[dd.i + 1])
       |                * (qs.qq[dd.i + 1] - l.q[dd.i + 1])) AS BIGINT) AS d
       |       FROM qs JOIN l ON l.vec_id <> qs.qid CROSS JOIN dd
       |       GROUP BY 1, 2),
       |r AS (SELECT qid, nid, d,
       |        row_number() OVER (PARTITION BY qid ORDER BY d ASC, nid ASC) AS rnk
       |      FROM sc)
       |SELECT qid,
       |  CAST(max(CASE WHEN rnk = 1 THEN nid END) AS BIGINT) AS nn1,
       |  CAST(max(CASE WHEN rnk = 1 THEN d END) AS BIGINT) AS d1,
       |  CAST(max(CASE WHEN rnk = 2 THEN d END) AS BIGINT) AS d2,
       |  CAST(max(CASE WHEN rnk = 2 THEN d END)
       |     - max(CASE WHEN rnk = 1 THEN d END) AS BIGINT) AS margin
       |FROM r WHERE rnk <= 2 GROUP BY qid""".stripMargin

  /** Label purity of the IVF coarse quantizer's cells — the
    * semantic-quality complement to [[clusterStats]]' geometric
    * profile ("do the learned cells align with the label structure,
    * or does every cell mix everything"): per cell, the member
    * count, the majority label (ties → smallest label, a pinned
    * convention), its count, and the purity share on the 2²⁰
    * lattice. Low purity across cells means cell-scoped candidate
    * generation (mutual_knn / dedup_semantic) crosses label
    * boundaries constantly — the signal to retrain with more cells.
    * Scale shape: assignments fold to (cell, label) counts
    * partial+final; the majority pick is an argmax-by-struct inside
    * the |cells|-row rollup — no window, no second shuffle of
    * vectors. */
  def cellLabelPurity(spark: SparkSession, dir: String): DataFrame =
    cellAssignments(spark, dir)
      .join(Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("label").cast("long").as("label")), "vec_id")
      .groupBy(col("cell"), col("label")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("cell"))
      .agg(sum(col("cnt")).as("n_members"),
        max(struct(col("cnt"), (-col("label")).as("nl"), col("label"))).as("m"))
      .select(col("cell").cast("long").as("cell"), col("n_members"),
        col("m.label").as("majority_label"), col("m.cnt").as("majority_cnt"),
        expr("cast((m.cnt * cast(1048576 as bigint)) div n_members as bigint)")
          .as("purity_q"))

  private[operators] def cellLabelPuritySql: String =
    s"""$IvfCellsSqlPrefix,
       |lab AS (SELECT cells.cell, CAST(e2.label AS BIGINT) AS label, count(*) AS cnt
       |        FROM cells JOIN embeddings e2 ON e2.vec_id = cells.nid
       |        GROUP BY 1, 2),
       |pick AS (SELECT cell, label, cnt,
       |           row_number() OVER (PARTITION BY cell ORDER BY cnt DESC, label ASC) AS rk,
       |           CAST(sum(cnt) OVER (PARTITION BY cell) AS BIGINT) AS n_members
       |         FROM lab)
       |SELECT CAST(cell AS BIGINT) AS cell, n_members,
       |  label AS majority_label, CAST(cnt AS BIGINT) AS majority_cnt,
       |  CAST((cnt * 1048576) // n_members AS BIGINT) AS purity_q
       |FROM pick WHERE rk = 1""".stripMargin

  private[operators] val OutlierK = 3

  /** Farthest-from-centroid members per label — the mislabel /
    * hard-example miner ("which vectors does this class barely
    * own"): each label's integer centroid comes from
    * [[classCentroidsTyped]]'s exact lattice rule (Σq div n,
    * truncating — the gated arithmetic, reused verbatim), and the
    * top-[[OutlierK]] members by exact lattice L2 to it are emitted
    * (distance desc, vec_id asc). Per-dim diffs ≤ 2²¹ → squared sums
    * ≤ 2⁴⁸, long-safe. Scale shape: the |labels|×64 centroid table
    * broadcasts against the vector scan (distances are scan-resident
    * zip_with arithmetic); the rank cut rides WindowGroupLimit. */
  def centroidOutliers(spark: SparkSession, dir: String): DataFrame = {
    val cent = classCentroidsTyped(spark, dir)
      .select(col("label"), col("centroid_q"))
    val v = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label").cast("long").as("label"),
        latArrCol(col("embedding")).as("q"))
    val d = aggregate(zip_with(col("q"), col("centroid_q"), (x, c) => (x - c) * (x - c)),
      lit(0L), (a, x) => a + x)
    val w = Window.partitionBy(col("label")).orderBy(col("d2").desc, col("vec_id").asc)
    v.join(broadcast(cent), "label")
      .withColumn("d2", d)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= OutlierK)
      .select(col("label"), col("rnk"), col("vec_id"), col("d2"))
  }

  private[operators] def centroidOutliersSql: String =
    s"""WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
       |  list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * $QScale.0) AS BIGINT)) AS q
       |  FROM embeddings),
       |dims AS (SELECT CAST(unnest(range($Dim)) AS BIGINT) AS d),
       |g AS (SELECT label, dims.d, sum(CAST(q[dims.d + 1] AS HUGEINT)) AS sq, count(*) AS n
       |      FROM e CROSS JOIN dims GROUP BY 1, 2),
       |c AS (SELECT label, d, CAST(sq // n AS BIGINT) AS cq FROM g),
       |dist AS (SELECT e.vec_id, e.label,
       |    CAST(sum((e.q[c.d + 1] - c.cq) * (e.q[c.d + 1] - c.cq)) AS BIGINT) AS d2
       |  FROM e JOIN c ON e.label = c.label GROUP BY 1, 2),
       |r AS (SELECT label, vec_id, d2,
       |        row_number() OVER (PARTITION BY label ORDER BY d2 DESC, vec_id ASC) AS rnk
       |      FROM dist)
       |SELECT label, CAST(rnk AS BIGINT) AS rnk, vec_id, d2
       |FROM r WHERE rnk <= $OutlierK""".stripMargin

  private[operators] val NoiseK = 5

  /** kNN label-noise screen (confident-learning lite) — the
    * mislabeled-example detector a training-data pipeline runs
    * before fitting anything: a vector whose [[NoiseK]]-nearest
    * neighbors (exact lattice L2, candidates blocked by the shared
    * IVF cell — the [[mutualKnn]] sub-quadratic shape) vote a
    * MAJORITY label different from its own is flagged. Per label:
    * member count, voted count (vectors with ≥1 in-cell neighbor —
    * singleton-cell vectors cast no vote and are never flagged),
    * flagged count, and the noise rate on the 2²⁰ lattice. Majority
    * ties break to the smallest label (the [[cellLabelPurity]]
    * convention); distances are BIGINT-exact (64·2⁴² ≤ 2⁴⁸).
    * Scale shape: ONE cell-keyed pair join (never all-pairs), the
    * k-cut rides WindowGroupLimit per src, then two metadata-scale
    * folds; the (cell, q, label) relation persists once and feeds
    * both join sides from cache. */
  def labelNoise(spark: SparkSession, dir: String): DataFrame = {
    val t = cellAssignments(spark, dir)
      .join(Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("label").cast("long").as("label"),
          latArrCol(col("embedding")).as("q")), "vec_id")
      .persistScoped()
    val d = aggregate(zip_with(col("a.q"), col("b.q"), (x, y) => (x - y) * (x - y)),
      lit(0L), (a, x) => a + x)
    val w = Window.partitionBy("src").orderBy(col("dd").asc, col("nid").asc)
    val votes = t.as("a")
      .join(t.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("src"), col("a.label").as("own"),
        col("b.vec_id").as("nid"), col("b.label").as("nl"), d.as("dd"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= NoiseK)
    val maj = votes.groupBy(col("src"), col("own"), col("nl"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("src"), col("own"))
      .agg(max(struct(col("cnt"), (-col("nl")).as("neg"), col("nl"))).as("m"))
      .select(col("src"), col("own"), col("m.nl").as("majl"))
    val voted = maj.groupBy(col("own").as("label"))
      .agg(count(lit(1)).as("n_voted"),
        sum(when(col("majl") =!= col("own"), 1L).otherwise(0L)).as("n_flagged"))
    t.groupBy(col("label")).agg(count(lit(1)).as("n"))
      .join(voted, Seq("label"), "left")
      .select(col("label"), col("n"),
        coalesce(col("n_voted"), lit(0L)).as("n_voted"),
        coalesce(col("n_flagged"), lit(0L)).as("n_flagged"))
      .withColumn("noise_q",
        expr("(n_flagged * cast(1048576 as bigint)) div greatest(n_voted, 1)"))
  }

  /** Squared lattice L2 via Σx²+Σy²−2Σxy over DuckDB list kernels:
    * every term ≤ 2⁴⁸ so the DOUBLE list_inner_product is integer-
    * exact (< 2⁵³), and the oracle stays vectorized instead of
    * exploding |pairs|×64 rows. */
  private[operators] def labelNoiseSql: String =
    s"""$IvfCellsSqlPrefix,
       |l AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
       |        list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * $QScale.0) AS BIGINT)) AS q
       |      FROM embeddings),
       |ln AS (SELECT vec_id, label, q,
       |         list_inner_product(list_transform(q, x -> CAST(x AS DOUBLE)),
       |                            list_transform(q, x -> CAST(x AS DOUBLE))) AS nrm
       |       FROM l),
       |sc AS (SELECT ca.nid AS src, la.label AS own, cb.nid AS nid, lb.label AS nl,
       |         CAST(la.nrm + lb.nrm
       |              - 2 * list_inner_product(list_transform(la.q, x -> CAST(x AS DOUBLE)),
       |                                       list_transform(lb.q, x -> CAST(x AS DOUBLE))) AS BIGINT) AS d
       |       FROM cells ca JOIN cells cb ON ca.cell = cb.cell AND ca.nid <> cb.nid
       |       JOIN ln la ON la.vec_id = ca.nid JOIN ln lb ON lb.vec_id = cb.nid),
       |top AS (SELECT src, own, nl FROM (
       |          SELECT src, own, nl, row_number() OVER (PARTITION BY src ORDER BY d ASC, nid ASC) AS rn
       |          FROM sc) t WHERE rn <= $NoiseK),
       |v AS (SELECT src, own, nl, count(*) AS cnt FROM top GROUP BY 1, 2, 3),
       |mj AS (SELECT src, own, nl AS majl FROM (
       |         SELECT src, own, nl, row_number() OVER (PARTITION BY src ORDER BY cnt DESC, nl ASC) AS rk
       |         FROM v) t WHERE rk = 1),
       |fl AS (SELECT own AS label, count(*) AS n_voted,
       |         CAST(sum(CASE WHEN majl <> own THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
       |       FROM mj GROUP BY 1),
       |base AS (SELECT label, count(*) AS n FROM l GROUP BY 1)
       |SELECT b.label, b.n,
       |  coalesce(f.n_voted, 0) AS n_voted,
       |  coalesce(f.n_flagged, 0) AS n_flagged,
       |  CAST((coalesce(f.n_flagged, 0) * 1048576) // greatest(coalesce(f.n_voted, 0), 1) AS BIGINT) AS noise_q
       |FROM base b LEFT JOIN fl f ON f.label = b.label""".stripMargin

  /** Split-conformal calibration over centroid nonconformity — the
    * distribution-free coverage guarantee a classifier deployment
    * actually ships ("with probability ≥ 90%, the true label is in
    * the prediction set"): calibration half = even vec_ids, test
    * half = odd. Score = exact lattice L2² to the OWN label's
    * calibration centroid (the [[classCentroidsTyped]] Σq div n
    * rule, computed on the calibration half only); the threshold is
    * the ⌈(n_cal+1)·0.9⌉-th smallest calibration score under the
    * TOTAL order (score, vec_id) — an EXACT order statistic, never a
    * percentile interpolation. Per label the test half reports
    * coverage (own-centroid score ≤ thr) and the mean prediction-set
    * size (labels whose centroid is within thr), both on the 2²⁰
    * lattice.
    *
    * Scale shape: centroids fold partial+final to |labels|×64 driver
    * metadata and broadcast back; the threshold rides the
    * sort+zipWithIndex exact-rank primitive (the globalBand rule —
    * never a global window, never a driver-side top-r collect); the
    * set-size pass joins the |labels|-row centroid table broadcast
    * on a constant key (≤ |labels|× row inflation of one scan). */
  def conformalKnn(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label").cast("long").as("label"),
        latArrCol(col("embedding")).as("q"))
    val cal = e.filter(col("vec_id") % 2 === 0)
    val cent = cal
      .select(col("label"), posexplode(col("q"))).toDF("label", "d", "qv")
      .groupBy(col("label"), col("d"))
      .agg(sum(col("qv").cast("decimal(38,0)")).as("sq"), count(lit(1)).as("n"))
      .groupBy(col("label"))
      .agg(transform(
        sort_array(collect_list(struct(col("d"), expr("cast(sq div n as bigint)").as("cq")))),
        x => x("cq")).as("cq"))
    val score = aggregate(zip_with(col("q"), col("cq"), (x, c) => (x - c) * (x - c)),
      lit(0L), (a, x) => a + x)
    val calScores = cal.join(broadcast(cent), "label").select(col("vec_id"), score.as("s"))
    val nCal = calScores.count() // scalar aggregate to the driver (metadata)
    val r = math.min((9L * (nCal + 1L) + 9L) / 10L, nCal)
    // exact global order statistic: distributed range sort + one
    // zipWithIndex pass; ONE (rank, score) row reaches the driver
    val thr = calScores.orderBy(col("s").asc, col("vec_id").asc)
      .select(col("s")).as[Long]
      .rdd.zipWithIndex().filter(_._2 == r - 1L).map(_._1).collect().head
    val test = e.filter(col("vec_id") % 2 === 1)
    val cov = test.join(broadcast(cent), "label")
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(score <= thr, 1L).otherwise(0L)).as("n_covered"))
    val sets = test.withColumn("one", lit(1))
      .join(broadcast(cent.withColumn("one", lit(1))
        .select(col("one"), col("label").as("cl"), col("cq"))), "one")
      .select(col("vec_id"), col("label"), when(score <= thr, 1L).otherwise(0L).as("inset"))
      .groupBy(col("vec_id"), col("label")).agg(sum(col("inset")).as("setsz"))
      .groupBy(col("label")).agg(sum(col("setsz")).as("sum_set"))
    cov.join(sets, "label")
      .select(col("label"), col("n_test"), col("n_covered"),
        expr("(n_covered * cast(1048576 as bigint)) div n_test").as("coverage_q"),
        col("sum_set"),
        expr("(sum_set * cast(1048576 as bigint)) div n_test").as("mean_set_q"),
        lit(thr).as("thr"))
  }

  private[operators] def conformalKnnSql: String =
    s"""WITH l AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
       |        list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * $QScale.0) AS BIGINT)) AS q
       |      FROM embeddings),
       |cal AS (SELECT * FROM l WHERE vec_id % 2 = 0),
       |dims AS (SELECT CAST(unnest(range($Dim)) AS BIGINT) AS d),
       |g AS (SELECT label, dims.d, sum(CAST(cal.q[dims.d + 1] AS HUGEINT)) AS sq, count(*) AS n
       |      FROM cal CROSS JOIN dims GROUP BY 1, 2),
       |c AS (SELECT label, d, CAST(sq // n AS BIGINT) AS cq FROM g),
       |calsc AS (SELECT cal.vec_id,
       |    CAST(sum((cal.q[c.d + 1] - c.cq) * (cal.q[c.d + 1] - c.cq)) AS BIGINT) AS s
       |  FROM cal JOIN c ON c.label = cal.label GROUP BY 1),
       |nn AS MATERIALIZED (SELECT count(*) AS n FROM calsc),
       |thr AS MATERIALIZED (
       |  SELECT s AS thr FROM (
       |    SELECT s, row_number() OVER (ORDER BY s ASC, vec_id ASC) AS rn FROM calsc) t, nn
       |  WHERE rn = least((9 * (nn.n + 1) + 9) // 10, nn.n)),
       |test AS (SELECT * FROM l WHERE vec_id % 2 = 1),
       |tsc AS (SELECT test.vec_id, test.label, c.label AS cl,
       |    CAST(sum((test.q[c.d + 1] - c.cq) * (test.q[c.d + 1] - c.cq)) AS BIGINT) AS s
       |  FROM test CROSS JOIN c GROUP BY 1, 2, 3),
       |cov AS (SELECT t.label, count(*) AS n_test,
       |    CAST(sum(CASE WHEN t.s <= thr.thr THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
       |  FROM tsc t CROSS JOIN thr WHERE t.cl = t.label GROUP BY 1),
       |st AS (SELECT t.vec_id, t.label,
       |    CAST(sum(CASE WHEN t.s <= thr.thr THEN 1 ELSE 0 END) AS BIGINT) AS setsz
       |  FROM tsc t CROSS JOIN thr GROUP BY 1, 2),
       |ss AS (SELECT label, CAST(sum(setsz) AS BIGINT) AS sum_set FROM st GROUP BY 1)
       |SELECT cov.label, cov.n_test, cov.n_covered,
       |  CAST((cov.n_covered * 1048576) // cov.n_test AS BIGINT) AS coverage_q,
       |  ss.sum_set,
       |  CAST((ss.sum_set * 1048576) // cov.n_test AS BIGINT) AS mean_set_q,
       |  CAST(thr.thr AS BIGINT) AS thr
       |FROM cov JOIN ss ON ss.label = cov.label CROSS JOIN thr""".stripMargin

  private[operators] val PcaRounds = 4

  /** Leading principal direction by power iteration over the exact
    * integral Gram matrix — the "what single axis carries this
    * embedding batch" diagnostic (anisotropy / collapsed-dimension
    * detection; the first step of PCA whitening): [[PcaRounds]]
    * rounds of v ← G·v with integer max-norm renormalization
    * (v ← v·2²⁰ div max|G·v| — no sqrt, no floats, every engine and
    * every run computes identical integers; division truncates
    * toward zero in Scala BigInt, Spark `div`, and DuckDB `//`
    * alike). Emits the 64 loadings on the 2²⁰ lattice. Scale shape:
    * the DISTRIBUTED work is [[gramMatrix]]'s one-exchange
    * partial+final fold (n×4096 never materializes); the 64×64
    * iteration is driver metadata math (the learnedCentroids /
    * codebook precedent — 4096 longs), and at ANY corpus size the
    * Gram stays 64×64. */
  def pcaPower(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val g = gramMatrix(spark, dir).collect()
    val G = Array.fill[BigInt](Dim, Dim)(BigInt(0))
    g.foreach(r => G(r.getLong(0).toInt)(r.getLong(1).toInt) = BigInt(r.getLong(2)))
    val v = powerIterate(G)
    (0 until Dim).map(d => (d.toLong, v(d).toLong)).toDF("d", "loading_q")
  }

  /** The driver-metadata half of [[pcaPower]]: [[PcaRounds]] rounds
    * of v ← (G·v)·2²⁰ / max|G·v| in exact BigInt (truncating
    * division). Invariants pinned by EdgeCaseSpec: max|v| = 2²⁰
    * after every round, and the result is invariant under scaling G
    * by any positive constant (so corpus duplication cannot move the
    * loadings). */
  private[operators] def powerIterate(G: Array[Array[BigInt]]): Array[BigInt] = {
    val dim = G.length
    var v = Array.fill(dim)(BigInt(1) << 20)
    (0 until PcaRounds).foreach { _ =>
      val mv = Array.tabulate(dim)(i =>
        (0 until dim).map(j => G(i)(j) * v(j)).sum)
      val mx = mv.map(_.abs).max
      v = mv.map(x => x * (BigInt(1) << 20) / mx)
    }
    v
  }

  /** Projection of every embedding onto [[pcaPower]]'s leading
    * principal direction — the step that turns the diagnostic into a
    * usable TRANSFORM (1-D curriculum ordering, anisotropy removal's
    * first component, coarse semantic binning): score = (q · v) div
    * 2²⁰, with q the vector's 2²⁰-lattice quantization and v the
    * power-iteration loadings — pure 64-term integer dot products
    * (|term| ≤ 2⁴⁰, sum ≤ 2⁴⁶ — BIGINT-safe), division truncating
    * toward zero in both engines (the pca_power rule). Scale shape:
    * the loadings are driver metadata (64 longs — the learnedCentroids
    * precedent) embedded as literals in a SCAN-RESIDENT projection;
    * no join, no shuffle — the plan is one narrow map over the
    * embeddings scan at any corpus size. */
  def pcaProject(spark: SparkSession, dir: String): DataFrame = {
    val v = pcaPower(spark, dir).collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1))).sortBy(_._1).map(_._2)
    val score = (0 until Dim)
      .map(i => element_at(col("q"), i + 1) * lit(v(i)))
      .reduce(_ + _)
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), latArrCol(col("embedding")).as("q"))
      .withColumn("score_raw", score)
      .select(col("vec_id"), expr("score_raw div 1048576").as("score_q"))
  }
}
