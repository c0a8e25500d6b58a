package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.CacheScope.ScopedDataset
import graft.functions.VectorFunctions.cosine_sim
import graft.sources.Tables

/** Similarity search over the `embeddings` fixture (north-star op;
  * the reference has no vector surface — SURVEY.md §2.2).
  *
  * Five search paths plus two storage forms:
  *  - `annTopkBrute`: exact top-k by cosine. The (small) query set is
  *    broadcast against the full vector table, so the big side streams
  *    once with no shuffle of the vectors themselves; per-query top-k
  *    is a rank over the scored stream. This is the correct 100 TB
  *    baseline: one scan, one narrow (qid, nid, score) shuffle.
  *  - `annLsh`: random-hyperplane LSH. Vectors hash to 16-bit sign
  *    buckets; only bucket-mates are scored. Sub-linear candidate
  *    generation at the cost of recall — the scale path when the
  *    query set is itself huge. Hyperplanes are derived from a
  *    fixed-seed SplitMix64 so results are bit-stable.
  *  - `annIvf`: IVF-flat — data-adaptive coarse quantizer (Lloyd-
  *    trained cells), multi-probe candidate generation.
  *  - `annPq`: product quantization — trained per-subspace codebook,
  *    integer ADC tables, shortlist + exact rerank (the FAISS-style
  *    billion-scale shape).
  *  - `annGraph`: graph ANN (HNSW-class) — bounded NN-descent k-NN
  *    graph + beam search; the third candidate-generation family
  *    beside hashing and quantization.
  *  - `embedQuantize` (int8 scalar) and `embedPq` (4-bit PQ codes):
  *    the storage/bandwidth halves, 4× and 64× payload cuts.
  */
object Similarity {

  private val K = 5
  private val NQueries = 10

  /** Brute-force exact cosine top-k — the ANN recall baseline: |Q|
    * broadcast query vectors scored against every row, rank-limited
    * per query (the ground truth the IVF/LSH/PQ variants are gated
    * against). */
  def annTopkBrute(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = e.select(col("vec_id").as("nid"), col("embedding").as("ne"))
    val scored = c.join(broadcast(q), col("qid") =!= col("nid"))
      .withColumn("cos", cosine_sim(col("qe"), col("ne")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
    scored
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= K)
      .select(col("qid"), col("rnk"), col("nid"), round(col("cos"), 4).as("cos"))
  }

  /** FILTERED vector search — the production retrieval mode every
    * vector store ships (metadata predicate + similarity, "nearest
    * passages from THIS shard/tenant/class"): per query, exact cosine
    * top-[[K]] among corpus vectors sharing the QUERY's OWN label, so
    * the predicate varies per query (the hard case — a global filter
    * would just be a smaller corpus). Post-filtering an unfiltered
    * top-k is WRONG at low selectivity (k survivors may not exist);
    * the filter belongs INSIDE candidate generation — here it rides
    * the broadcast-join condition, and in the IVF/LSH upgrades the
    * same predicate applies to the candidate lists before scoring.
    * Scale shape: the [[annTopkBrute]] orientation — |Q| queries
    * broadcast against the corpus scan, the label equality prunes
    * before any scoring, rank-limit per query. */
  def annFiltered(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("qid"), col("label").cast("long").as("qlabel"),
        col("embedding").as("qe"))
    val c = e.select(col("vec_id").as("nid"), col("label").as("nlabel"),
      col("embedding").as("ne"))
    val scored = c.join(broadcast(q),
        col("qid") =!= col("nid") && col("nlabel") === col("qlabel"))
      .withColumn("cos", cosine_sim(col("qe"), col("ne")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
    scored
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= K)
      .select(col("qid"), col("qlabel").as("label"), col("rnk"), col("nid"),
        round(col("cos"), 4).as("cos"))
  }

  private def annFilteredSql: String =
    s"""WITH q AS (SELECT vec_id AS qid, CAST(label AS BIGINT) AS qlabel,
       |             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe
       |           FROM embeddings WHERE vec_id < $NQueries),
       |c AS (SELECT vec_id AS nid, label AS nlabel,
       |        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ne
       |      FROM embeddings),
       |s AS (SELECT qid, qlabel, nid, list_cosine_similarity(qe, ne) AS cos
       |      FROM q, c WHERE qid <> nid AND nlabel = qlabel),
       |r AS (SELECT qid, qlabel, nid, cos,
       |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rnk
       |      FROM s)
       |SELECT qid, qlabel AS label, CAST(rnk AS BIGINT) AS rnk, nid, round(cos, 4) AS cos
       |FROM r WHERE rnk <= $K""".stripMargin

  /** HARD-NEGATIVE mining — the other half of contrastive training
    * data next to [[annFiltered]]'s positives: per query, the exact
    * cosine top-[[K]] among vectors of a DIFFERENT label — the
    * near-miss impostors a metric-learning loss needs (random
    * negatives are trivially far; the informative ones sit just
    * across the class boundary). Same |Q|-broadcast orientation as
    * [[annTopkBrute]]; the label inequality leaves no equi-key, so
    * the probe is the allowlisted tiny-broadcast BNLJ class. */
  def hardNegatives(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("qid"), col("label").cast("long").as("qlabel"),
        col("embedding").as("qe"))
    val c = e.select(col("vec_id").as("nid"), col("label").as("nlabel"),
      col("embedding").as("ne"))
    val scored = c.join(broadcast(q),
        col("qid") =!= col("nid") && col("nlabel") =!= col("qlabel"))
      .withColumn("cos", cosine_sim(col("qe"), col("ne")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
    scored
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= K)
      .select(col("qid"), col("qlabel").as("label"), col("rnk"), col("nid"),
        round(col("cos"), 4).as("cos"))
  }

  private def hardNegativesSql: String =
    s"""WITH q AS (SELECT vec_id AS qid, CAST(label AS BIGINT) AS qlabel,
       |             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe
       |           FROM embeddings WHERE vec_id < $NQueries),
       |c AS (SELECT vec_id AS nid, label AS nlabel,
       |        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ne
       |      FROM embeddings),
       |s AS (SELECT qid, qlabel, nid, list_cosine_similarity(qe, ne) AS cos
       |      FROM q, c WHERE qid <> nid AND nlabel <> qlabel),
       |r AS (SELECT qid, qlabel, nid, cos,
       |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rnk
       |      FROM s)
       |SELECT qid, qlabel AS label, CAST(rnk AS BIGINT) AS rnk, nid, round(cos, 4) AS cos
       |FROM r WHERE rnk <= $K""".stripMargin

  private val MmrPool = 8
  private val MmrK = 3

  /** Maximal-marginal-relevance diversified top-k (Carbonell–Goldstein
    * 1998) — the retrieval DIVERSIFICATION primitive between search and
    * selection: a plain top-k returns near-duplicates of the best hit;
    * MMR greedily picks argmax of λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s),
    * trading relevance against redundancy to what's already picked —
    * the shape RAG context assembly and few-shot example selection
    * need. λ = 1/2 makes the objective the pure integer rel − maxsel
    * on the 2⁻²⁰ lattice (exact [[mipsTopk]] dots — no float ordering
    * contract), ties → lowest nid; round 1 is argmax rel with
    * max_sel_sim ≡ 0. Scale shape: the ONE corpus-scale stage is the
    * [[annTopkBrute]]-oriented pool cut (|Q| broadcast queries, per-
    * query top-[[MmrPool]] rides WindowGroupLimit); the pool and its
    * ≤ P(P−1)·|Q| pairwise dots persist once, and the [[MmrK]] greedy
    * rounds unroll as bounded joins over those caches (the ktruss
    * round pattern) — metadata-sized at any corpus size. */
  def mmrSelect(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("qid"), latArrCol(col("embedding")).as("qq"))
    val c = e.select(col("vec_id").as("nid"), latArrCol(col("embedding")).as("nq"))
    val qdot = aggregate(zip_with(col("qq"), col("nq"), (x, y) => x * y),
      lit(0L), (a, x) => a + x)
    val w = Window.partitionBy(col("qid")).orderBy(col("dot").desc, col("nid").asc)
    val pool = c.join(broadcast(q), col("qid") =!= col("nid"))
      .withColumn("dot", qdot)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= MmrPool)
      .select(col("qid"), col("nid"), col("nq"), col("dot").as("rel"))
      .persistScoped()
    val pdot = aggregate(zip_with(col("aq"), col("bq"), (x, y) => x * y),
      lit(0L), (a, x) => a + x)
    val pairs = pool.select(col("qid"), col("nid").as("aid"), col("nq").as("aq"))
      .join(pool.select(col("qid"), col("nid").as("bid"), col("nq").as("bq")), Seq("qid"))
      .filter(col("aid") =!= col("bid"))
      .select(col("qid"), col("aid"), col("bid"), pdot.as("sim"))
      .persistScoped()
    val w1 = Window.partitionBy(col("qid")).orderBy(col("rel").desc, col("nid").asc)
    var result = pool
      .withColumn("rk", row_number().over(w1)).filter(col("rk") === 1)
      .select(col("qid"), col("nid"), lit(1L).as("pick"), col("rel"),
        lit(0L).as("max_sel_sim"))
    for (r <- 2 to MmrK) {
      val rem = pool.join(result.select(col("qid"), col("nid")),
        Seq("qid", "nid"), "left_anti")
      val ms = pairs
        .join(result.select(col("qid"), col("nid").as("bid")), Seq("qid", "bid"))
        .groupBy(col("qid"), col("aid")).agg(max(col("sim")).as("max_sel_sim"))
        .withColumnRenamed("aid", "nid")
      val wr = Window.partitionBy(col("qid"))
        .orderBy((col("rel") - col("max_sel_sim")).desc, col("nid").asc)
      val pick = rem.join(ms, Seq("qid", "nid"))
        .withColumn("rk", row_number().over(wr)).filter(col("rk") === 1)
        .select(col("qid"), col("nid"), lit(r.toLong).as("pick"), col("rel"),
          col("max_sel_sim"))
      result = result.unionByName(pick)
    }
    result
  }

  private def mmrSelectSql: String =
    s"""WITH l AS (SELECT vec_id,
       |  list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * $QScale.0) AS BIGINT)) AS q
       |  FROM embeddings),
       |qs AS (SELECT vec_id AS qid, q AS qq FROM l WHERE vec_id < $NQueries),
       |dd AS (SELECT unnest(range($Dim)) AS i),
       |sc AS (SELECT qs.qid, l.vec_id AS nid,
       |         CAST(sum(qs.qq[dd.i + 1] * l.q[dd.i + 1]) AS BIGINT) AS dot
       |       FROM qs JOIN l ON l.vec_id <> qs.qid CROSS JOIN dd
       |       GROUP BY 1, 2),
       |pool AS MATERIALIZED (
       |  SELECT qid, nid, dot AS rel
       |  FROM (SELECT qid, nid, dot,
       |          row_number() OVER (PARTITION BY qid ORDER BY dot DESC, nid ASC) AS rnk
       |        FROM sc) t
       |  WHERE rnk <= $MmrPool),
       |pairs AS MATERIALIZED (
       |  SELECT a.qid, a.nid AS aid, b.nid AS bid,
       |    CAST(sum(la.q[dd.i + 1] * lb.q[dd.i + 1]) AS BIGINT) AS sim
       |  FROM pool a JOIN pool b ON a.qid = b.qid AND a.nid <> b.nid
       |  JOIN l la ON la.vec_id = a.nid JOIN l lb ON lb.vec_id = b.nid
       |  CROSS JOIN dd GROUP BY 1, 2, 3),
       |s1 AS MATERIALIZED (
       |  SELECT qid, nid, 1 AS pick, rel, 0 AS max_sel_sim
       |  FROM (SELECT qid, nid, rel,
       |          row_number() OVER (PARTITION BY qid ORDER BY rel DESC, nid ASC) AS rk
       |        FROM pool) t
       |  WHERE rk = 1),
       |s2 AS MATERIALIZED (
       |  SELECT qid, nid, 2 AS pick, rel, max_sel_sim FROM (
       |    SELECT p.qid, p.nid, p.rel, m.max_sel_sim,
       |      row_number() OVER (PARTITION BY p.qid
       |        ORDER BY p.rel - m.max_sel_sim DESC, p.nid ASC) AS rk
       |    FROM pool p
       |    JOIN (SELECT pr.qid, pr.aid, max(pr.sim) AS max_sel_sim
       |          FROM pairs pr JOIN s1 ON s1.qid = pr.qid AND s1.nid = pr.bid
       |          GROUP BY 1, 2) m ON m.qid = p.qid AND m.aid = p.nid
       |    WHERE NOT EXISTS (SELECT 1 FROM s1 WHERE s1.qid = p.qid AND s1.nid = p.nid)
       |  ) t WHERE rk = 1),
       |s12 AS (SELECT qid, nid FROM s1 UNION ALL SELECT qid, nid FROM s2),
       |s3 AS (
       |  SELECT qid, nid, 3 AS pick, rel, max_sel_sim FROM (
       |    SELECT p.qid, p.nid, p.rel, m.max_sel_sim,
       |      row_number() OVER (PARTITION BY p.qid
       |        ORDER BY p.rel - m.max_sel_sim DESC, p.nid ASC) AS rk
       |    FROM pool p
       |    JOIN (SELECT pr.qid, pr.aid, max(pr.sim) AS max_sel_sim
       |          FROM pairs pr JOIN s12 ON s12.qid = pr.qid AND s12.nid = pr.bid
       |          GROUP BY 1, 2) m ON m.qid = p.qid AND m.aid = p.nid
       |    WHERE NOT EXISTS (SELECT 1 FROM s12 WHERE s12.qid = p.qid AND s12.nid = p.nid)
       |  ) t WHERE rk = 1)
       |SELECT qid, CAST(pick AS BIGINT) AS pick, nid, rel,
       |  CAST(max_sel_sim AS BIGINT) AS max_sel_sim
       |FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2
       |      UNION ALL SELECT * FROM s3) u""".stripMargin

  private val MrlDims = 16

  /** Matryoshka truncation audit (Kusupati et al. 2022, MRL) — "how
    * much retrieval quality survives keeping only the FIRST
    * [[MrlDims]] of [[Dim]] dimensions": per query, exact lattice-dot
    * top-[[K]] under the full vector vs under the prefix slice, and
    * the overlap as recall_q on the 2²⁰ lattice. This is the
    * measurement an embedding pipeline runs before shipping truncated
    * vectors as a cheap first-stage filter (4× bandwidth cut here) —
    * the storage-tier sibling of [[embedQuantize]]/[[embedPq]]'s
    * precision cuts, evaluated the ann_recall way. NOTE: the fixture
    * embeddings are NOT MRL-trained, so low prefix recall is the
    * expected (and informative) reading — the op measures, the
    * training regime decides. Scale shape: both rankings are the
    * [[annTopkBrute]]-oriented |Q|-broadcast probes (allowlisted
    * BNLJ), rank-limit pushdown per query; the overlap join and the
    * per-query fold are |Q|·K-sized. */
  def mrlTruncate(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    def ranked(dims: Int): DataFrame = {
      val q = e.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("qid"),
          slice(latArrCol(col("embedding")), 1, dims).as("qq"))
      val c = e.select(col("vec_id").as("nid"),
        slice(latArrCol(col("embedding")), 1, dims).as("nq"))
      val dot = aggregate(zip_with(col("qq"), col("nq"), (x, y) => x * y),
        lit(0L), (a, x) => a + x)
      val w = Window.partitionBy(col("qid")).orderBy(col("dot").desc, col("nid").asc)
      c.join(broadcast(q), col("qid") =!= col("nid"))
        .withColumn("dot", dot)
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= K)
        .select(col("qid"), col("nid"))
    }
    val full = ranked(Dim)
    val prefix = ranked(MrlDims)
    val overlap = full.join(prefix, Seq("qid", "nid"), "left_semi")
      .groupBy(col("qid")).agg(count(lit(1)).as("n_overlap"))
    full.groupBy(col("qid")).agg(count(lit(1)).as("n_full"))
      .join(overlap, Seq("qid"), "left")
      .select(col("qid"), col("n_full"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
      .withColumn("recall_q",
        expr("cast((n_overlap * 1048576) div n_full as bigint)"))
  }

  private def mrlTruncateSql: String =
    s"""WITH l AS (SELECT vec_id,
       |  list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * $QScale.0) AS BIGINT)) AS q
       |  FROM embeddings),
       |qs AS (SELECT vec_id AS qid, q AS qq FROM l WHERE vec_id < $NQueries),
       |ddf AS (SELECT unnest(range($Dim)) AS i),
       |ddp AS (SELECT unnest(range($MrlDims)) AS i),
       |full_r AS (
       |  SELECT qid, nid FROM (
       |    SELECT qs.qid, l.vec_id AS nid,
       |      row_number() OVER (PARTITION BY qs.qid
       |        ORDER BY sum(qs.qq[ddf.i + 1] * l.q[ddf.i + 1]) DESC, l.vec_id ASC) AS rnk
       |    FROM qs JOIN l ON l.vec_id <> qs.qid CROSS JOIN ddf
       |    GROUP BY qs.qid, l.vec_id) t WHERE rnk <= $K),
       |pre_r AS (
       |  SELECT qid, nid FROM (
       |    SELECT qs.qid, l.vec_id AS nid,
       |      row_number() OVER (PARTITION BY qs.qid
       |        ORDER BY sum(qs.qq[ddp.i + 1] * l.q[ddp.i + 1]) DESC, l.vec_id ASC) AS rnk
       |    FROM qs JOIN l ON l.vec_id <> qs.qid CROSS JOIN ddp
       |    GROUP BY qs.qid, l.vec_id) t WHERE rnk <= $K),
       |ov AS (SELECT f.qid, count(*) AS n_overlap
       |       FROM full_r f JOIN pre_r p ON p.qid = f.qid AND p.nid = f.nid
       |       GROUP BY f.qid)
       |SELECT f.qid, count(*) AS n_full,
       |  coalesce(max(ov.n_overlap), 0) AS n_overlap,
       |  CAST((coalesce(max(ov.n_overlap), 0) * 1048576) // count(*) AS BIGINT) AS recall_q
       |FROM full_r f LEFT JOIN ov ON ov.qid = f.qid
       |GROUP BY f.qid""".stripMargin

  private val KCenters = 5

  /** k-center coreset selection by farthest-point traversal (Gonzalez
    * 1985, the 2-approximation) — the DATA-SELECTION primitive a
    * training pipeline runs to pick a maximally-covering subset
    * (active-learning seeds, eval-set anchors, diversity sampling):
    * seed = the smallest vec_id, then [[KCenters]]−1 rounds of "pick
    * the vector farthest (exact lattice L2², ties → lowest id) from
    * everything picked so far". radius2 of pick r is its distance² to
    * the previous centers — the (r−1)-center cover radius, so the
    * column is non-increasing from pick 2 on (a theorem the spec
    * executes). The greedy is [[mmrSelect]]'s max-min dual: MMR
    * diversifies a per-query shortlist, k-center covers the corpus.
    * Scale shape: the lattice scan persists once; each round is one
    * scan-resident distance expression (the new center rides as an
    * array LITERAL — the pca_project rule) + a rank-1 TakeOrdered
    * (ONE driver row per round, the graph_diameter pattern). Bounded
    * rounds, zero joins, no all-pairs anywhere; the returned frame is
    * a LocalTableScan. */
  def coresetKcenter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val lat = Tables.embeddings(spark, dir)
      .select(col("vec_id"), latArrCol(col("embedding")).as("q"))
      .persistScoped()
    val seed = lat.orderBy(col("vec_id").asc).limit(1).collect()
    if (seed.isEmpty)
      return Seq.empty[(Long, Long, Long)].toDF("pick", "vec_id", "radius2")
    def dist2To(center: Array[Long]): Column =
      aggregate(zip_with(col("q"), typedlit(center.toSeq), (x, y) => (x - y) * (x - y)),
        lit(0L), (a, x) => a + x)
    var picks = List((1L, seed(0).getLong(0), 0L))
    var dcol: Column = dist2To(seed(0).getSeq[Long](1).toArray)
    for (r <- 2 to KCenters) {
      val far = lat.withColumn("d", dcol)
        .filter(!col("vec_id").isInCollection(picks.map(_._2)))
        .orderBy(col("d").desc, col("vec_id").asc).limit(1).collect()
      if (far.nonEmpty) {
        picks = picks :+ ((r.toLong, far(0).getLong(0), far(0).getLong(2)))
        dcol = least(dcol, dist2To(far(0).getSeq[Long](1).toArray))
      }
    }
    picks.toDF("pick", "vec_id", "radius2")
  }

  private def coresetSql: String = {
    val latCte =
      s"""l AS (SELECT vec_id,
         |  list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * $QScale.0) AS BIGINT)) AS q
         |  FROM embeddings),
         |dd AS (SELECT unnest(range($Dim)) AS i),
         |c1 AS MATERIALIZED (SELECT vec_id, q FROM l ORDER BY vec_id ASC LIMIT 1),
         |s1 AS (SELECT vec_id FROM c1),
         |d1 AS MATERIALIZED (
         |  SELECT l.vec_id,
         |    CAST(sum((l.q[dd.i + 1] - c.q[dd.i + 1]) * (l.q[dd.i + 1] - c.q[dd.i + 1])) AS BIGINT) AS d
         |  FROM l CROSS JOIN c1 c CROSS JOIN dd GROUP BY l.vec_id)""".stripMargin
    val rounds = (2 to KCenters).map { k =>
      val pick =
        s"""p$k AS MATERIALIZED (
           |  SELECT vec_id, d FROM d${k - 1}
           |  WHERE vec_id NOT IN (SELECT vec_id FROM s${k - 1})
           |  ORDER BY d DESC, vec_id ASC LIMIT 1),
           |s$k AS (SELECT vec_id FROM s${k - 1} UNION ALL SELECT vec_id FROM p$k)""".stripMargin
      val refine = if (k == KCenters) "" else
        s""",
           |nd$k AS MATERIALIZED (
           |  SELECT l.vec_id,
           |    CAST(sum((l.q[dd.i + 1] - c.q[dd.i + 1]) * (l.q[dd.i + 1] - c.q[dd.i + 1])) AS BIGINT) AS d
           |  FROM l CROSS JOIN (SELECT l2.q FROM l l2 JOIN p$k ON l2.vec_id = p$k.vec_id) c
           |  CROSS JOIN dd GROUP BY l.vec_id),
           |d$k AS MATERIALIZED (
           |  SELECT d${k - 1}.vec_id, least(d${k - 1}.d, nd$k.d) AS d
           |  FROM d${k - 1} JOIN nd$k USING (vec_id))""".stripMargin
      pick + refine
    }.mkString(",\n")
    val tail = (2 to KCenters)
      .map(k => s"SELECT CAST($k AS BIGINT) AS pick, vec_id, d AS radius2 FROM p$k")
      .mkString("\nUNION ALL ")
    s"""WITH $latCte,
       |$rounds
       |SELECT CAST(1 AS BIGINT) AS pick, vec_id, CAST(0 AS BIGINT) AS radius2 FROM c1
       |UNION ALL $tail""".stripMargin
  }

  /** Mean-centering audit of the embedding corpus — the anisotropy
    * fix applied BEFORE [[pcaPower]]/whitening in most embedding
    * pipelines (a large common-mean component makes every cosine
    * look alike; centering removes it): per-dimension lattice means
    * (Σq_d div n — 64 driver-metadata longs, the pca_project
    * precedent) embed as literals, and every vector reports its
    * exact integral norm² before and after centering — the
    * corpus-level gap between the two IS the mean component's mass.
    * Scale shape: one 64-row partial+final fold for the means, then
    * a scan-resident narrow map; no joins, no keyed exchange in the
    * transform. */
  def embedCenter(spark: SparkSession, dir: String): DataFrame = {
    val means: Array[Long] = Tables.embeddings(spark, dir)
      .select(posexplode(latArrCol(col("embedding"))))
      .groupBy(col("pos")).agg(sum(col("col")).as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1) / r.getLong(2)))
      .sortBy(_._1).map(_._2)
    val raw = (0 until Dim)
      .map(i => element_at(col("q"), i + 1) * element_at(col("q"), i + 1))
      .reduce(_ + _)
    val centered = (0 until Dim)
      .map { i =>
        val dlt = element_at(col("q"), i + 1) - lit(means(i))
        dlt * dlt
      }
      .reduce(_ + _)
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), latArrCol(col("embedding")).as("q"))
      .select(col("vec_id"), raw.as("norm2_raw"), centered.as("norm2_centered"))
  }

  private def embedCenterSql: String =
    s"""WITH e AS (SELECT vec_id,
       |             list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * $QScale.0) AS BIGINT)) AS q
       |           FROM embeddings),
       |m AS (SELECT t.i AS i,
       |        CAST(CAST(sum(q[t.i]) AS HUGEINT) // count(*) AS BIGINT) AS mq
       |      FROM e CROSS JOIN range(1, ${Dim + 1}) t(i) GROUP BY 1)
       |SELECT e.vec_id,
       |  CAST(sum(q[m.i] * q[m.i]) AS BIGINT) AS norm2_raw,
       |  CAST(sum((q[m.i] - m.mq) * (q[m.i] - m.mq)) AS BIGINT) AS norm2_centered
       |FROM e CROSS JOIN m GROUP BY e.vec_id""".stripMargin

  /** Exact max-inner-product top-k (MIPS) — the retrieval objective
    * recommendation/retrieval towers actually rank by (un-normalized
    * dot, not cosine: magnitude is signal). Both sides quantize to
    * the 2⁻²⁰ lattice and the dot is a 64-term BIGINT sum — exact and
    * hash-comparable, no float rounding contract needed. Scale shape:
    * |Q| query vectors broadcast against the corpus scan (the
    * [[annTopkBrute]] orientation), rank-limit pushdown per query;
    * the LSH/IVF machinery upgrades it to sub-linear exactly as for
    * cosine when |Q|·N stops being scannable. */
  def mipsTopk(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("qid"), latArrCol(col("embedding")).as("qq"))
    val c = e.select(col("vec_id").as("nid"), latArrCol(col("embedding")).as("nq"))
    val dot = aggregate(zip_with(col("qq"), col("nq"), (x, y) => x * y),
      lit(0L), (a, x) => a + x)
    val w = Window.partitionBy(col("qid")).orderBy(col("dot").desc, col("nid").asc)
    c.join(broadcast(q), col("qid") =!= col("nid"))
      .withColumn("dot", dot)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= K)
      .select(col("qid"), col("rnk"), col("nid"), col("dot"))
  }

  // -- deterministic random hyperplanes (SplitMix64, fixed seed) -----

  private val NTables = 16
  private val BitsPerTable = 6
  private val Dim = 64

  private def splitmix64(seed: Long): Iterator[Long] =
    Iterator.iterate(seed) { s => s + 0x9E3779B97F4A7C15L }.drop(1).map { z0 =>
      var z = z0
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }

  /** nPlanes hyperplanes of ±1 entries from the fixed-seed SplitMix64
    * stream. Different (tables × bits) operating points draw from the
    * same stream, so key schemes are stable per configuration. */
  private[operators] def makePlanes(nPlanes: Int, seed: Long = 42L): Array[Array[Float]] = {
    val rng = splitmix64(seed)
    Array.fill(nPlanes)(
      Array.fill(Dim)(if ((rng.next() & 1L) == 0L) 1.0f else -1.0f))
  }

  /** NTables×BitsPerTable hyperplanes of ±1 entries, fixed seed. */
  private[operators] val planes: Array[Array[Float]] = makePlanes(NTables * BitsPerTable)

  /** Per-table sign-bucket keys over an arbitrary plane set: element t
    * packs `bits` sign bits of the dots with that table's hyperplanes.
    * Short keys + many tables is the right operating point for
    * mid-similarity neighbors (cos ≈ 0.5 ⇒ P(bit agree) ≈ 0.67 ⇒
    * P(6-bit key match) ≈ 0.09/table, ≈ 0.78 over 16 tables); for
    * true near-dups (cos ≥ 0.9) the same scheme is effectively
    * lossless.
    *
    * Computed in a typed closure, not N literal-array expressions: a
    * Column formulation embeds every hyperplane in the plan, and the
    * resulting analyzer/codegen cost dwarfed the arithmetic. Double
    * accumulation in index order keeps buckets bit-stable. */
  private[operators] def signKeys(
      emb: Array[Float], ps: Array[Array[Float]], nTables: Int, bits: Int): Array[Int] = {
    val keys = new Array[Int](nTables)
    var t = 0
    while (t < nTables) {
      var key = 0
      var j = 0
      while (j < bits) {
        val p = ps(t * bits + j)
        var dot = 0.0
        var i = 0
        while (i < p.length && i < emb.length) { dot += emb(i).toDouble * p(i).toDouble; i += 1 }
        if (dot >= 0) key |= (1 << j)
        j += 1
      }
      keys(t) = key
      t += 1
    }
    keys
  }

  private[operators] def lshKeysOf(emb: Array[Float]): Array[Int] =
    signKeys(emb, planes, NTables, BitsPerTable)

  /** (vec_id, table_idx, table_key) rows for every vector. */
  private def tableKeys(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .flatMap { r =>
        val keys = lshKeysOf(r._2)
        keys.iterator.zipWithIndex.map { case (k, t) => (r._1, t, k) }
      }
      .toDF("vec_id", "table_idx", "table_key")
  }

  /** LSH-bucketed ANN: candidates = vectors sharing ≥1 of 16 table
    * keys with the query, scored exactly, top-k per query. The
    * candidate join shuffles only (table, key, id) tuples — at 100 TB
    * the vectors themselves are re-joined only for the surviving
    * candidate set. Recall vs. the brute-force truth is asserted in
    * PipelineOpsSpec on the fixed-seed fixtures. */
  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val tagged = tableKeys(spark, dir)
    val qTagged = tagged.filter(col("vec_id") < NQueries)
      .withColumnRenamed("vec_id", "qid")
    val candPairs = tagged.as("c")
      .join(broadcast(qTagged).as("q"),
        col("c.table_idx") === col("q.table_idx") &&
          col("c.table_key") === col("q.table_key") &&
          col("c.vec_id") =!= col("q.qid"))
      .select(col("q.qid"), col("c.vec_id").as("nid"))
      .distinct()
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val scored = candPairs
      .join(e.select(col("vec_id").as("nid"), col("embedding").as("ne")), "nid")
      .join(broadcast(q), "qid")
      .withColumn("cos", cosine_sim(col("qe"), col("ne")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
    scored
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= K)
      .select(col("qid"), col("rnk"), col("nid"), round(col("cos"), 4).as("cos"))
  }

  // -- IVF-flat: coarse quantizer + nprobe ---------------------------

  private val NCells = 16
  private val NProbe = 8 // r8 shipped 6 (sf0.1 recall 0.64); 8 holds ≥0.7 at every swept SF
  private val LloydRounds = 1

  /** Deterministic SEED centroids: a fixed slice of the corpus itself
    * (vec_id ∈ [100, 100+NCells)) — sampled-point initialization, the
    * k-means analogue of a fixed seed. */
  private def seedCentroids(spark: SparkSession, dir: String): Array[(Int, Array[Double])] =
    Tables.embeddings(spark, dir)
      .filter(col("vec_id") >= 100 && col("vec_id") < (100 + NCells))
      .select(col("vec_id"), col("embedding"))
      .collect()
      .sortBy(_.getLong(0))
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Float](1).toArray.map(_.toDouble)) }

  /** Quantization grid for the Lloyd mean update: components are
    * floored onto a 2^-20 lattice BEFORE summing, so the per-cell mean
    * is pure integer arithmetic — exact, order-insensitive, and
    * replayable bit-for-bit by the DuckDB oracle (×2^20 is an exact
    * double op; BIGINT sum is exact; both engines truncate integer
    * division toward zero). */
  private val QScale = 1048576L // 2^20

  /** LEARNED centroids: [[LloydRounds]] deterministic Lloyd rounds
    * from the seed. Fixed round count (not to-convergence) keeps the
    * operator deterministic-cost and oracle-replayable; at 100 TB you
    * would raise rounds, not change shape — each round is the same
    * single scan + tiny aggregate. */
  private def learnedCentroids(spark: SparkSession, dir: String,
      trainFilter: Column = lit(true)): Array[(Int, Array[Double])] =
    (1 to LloydRounds).foldLeft(seedCentroids(spark, dir))((c, _) =>
      lloydRound(spark, dir, c, trainFilter))

  /** ONE deterministic Lloyd round: assignment runs distributed (one
    * narrow pass over the vectors); the per-(cell, dim) integral
    * sums — NCells×Dim rows of driver metadata, like the seed
    * itself — are collected and turned into quantized means; an empty
    * cell keeps its previous centroid. */
  private def lloydRound(spark: SparkSession, dir: String,
      seed: Array[(Int, Array[Double])],
      trainFilter: Column = lit(true)): Array[(Int, Array[Double])] = {
    import spark.implicits._
    val dim = seed.head._2.length
    // partial sums accumulate INSIDE each partition (one dense
    // cells×dim long array), so the shuffle carries
    // partitions×cells×dim rows instead of vectors×dim — the map-side
    // combine a groupBy over the exploded (cell, d, q) stream would
    // only approximate. Exact long arithmetic ⇒ order-insensitive.
    // Ragged-vector contract (matches the oracle's COALESCE(...,0)
    // inside its sum): a dimension a member vector lacks contributes
    // 0 to the sum while the member still counts in n.
    val sums = Tables.embeddings(spark, dir)
      .filter(trainFilter)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .mapPartitions { rows =>
        val acc = Array.ofDim[Long](NCells, dim)
        val cnt = new Array[Long](NCells)
        rows.foreach { r =>
          val cell = nearestCells(seed, r._2, 1).head
          cnt(cell) += 1L
          var d = 0
          while (d < dim && d < r._2.length) {
            acc(cell)(d) += math.floor(r._2(d).toDouble * QScale).toLong
            d += 1
          }
        }
        for { c <- (0 until NCells).iterator if cnt(c) > 0; d <- (0 until dim).iterator }
          yield (c, d, acc(c)(d), cnt(c))
      }
      .toDF("cell", "d", "pq", "pn")
      .groupBy("cell", "d").agg(sum(col("pq")).as("sq"), sum(col("pn")).as("n"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    seed.map { case (cell, sc) =>
      cell -> Array.tabulate(sc.length) { d =>
        sums.get((cell, d)) match {
          case Some((sq, n)) => (sq / n).toDouble / QScale.toDouble // Long div truncates toward zero, same as the oracle's //
          case None          => sc(d)
        }
      }
    }
  }

  private def cosTo(c: Array[Double], v: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < c.length && i < v.length) {
      val u = c(i); val w = v(i).toDouble
      dot += u * w; na += u * u; nb += w * w; i += 1
    }
    if (na == 0.0 || nb == 0.0) -2.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Top-`n` nearest cells for a vector (ties → lower cell idx). */
  private def nearestCells(cents: Array[(Int, Array[Double])], v: Array[Float], n: Int): Seq[Int] =
    cents.map { case (i, c) => (i, cosTo(c, v)) }
      .sortBy { case (i, s) => (-s, i) }.take(n).map(_._1).toSeq

  /** IVF-flat ANN: vectors are assigned to their nearest centroid
    * cell; each query probes its NProbe nearest cells and scores only
    * those cells' members. Complements annLsh: IVF adapts to the data
    * distribution (centroids are one Lloyd round of k-means from a
    * fixed corpus-slice seed — [[learnedCentroids]]) where hyperplane
    * LSH is data-oblivious. Same output shape; recall vs brute force
    * asserted in PipelineOpsSpec at ALL THREE swept SFs (floor 0.7 —
    * measured 0.88/0.80/0.78 at sf0.001/0.01/0.1).
    *
    * Operating point: nprobe = 8 of 16 cells (r8 shipped 6, whose
    * sf0.1 recall of 0.64 sagged below the documented floor — the
    * r8-verdict item this closes). An 8/16 scan fraction is a
    * fixture artifact of the tiny cell count, not the 100 TB shape:
    * recall is governed by the probed FRACTION of a fixed-size probe
    * LIST, so at scale you raise NCells with corpus size (4–16k cells
    * per billion vectors is the IVF norm) and nprobe stays a small
    * constant — same plan, same shuffle shape, scan fraction
    * nprobe/NCells → sub-1%. Chosen over a 2nd Lloyd round, which
    * measured WORSE at equal probe cost (0.72 vs 0.80 at sf0.001)
    * and would double the oracle's replay chain. */
  def annIvf(spark: SparkSession, dir: String): DataFrame =
    annIvfProbe(spark, dir, NProbe)

  /** [[annIvf]] with an explicit probe count — the recall/cost dial
    * (PipelineOpsSpec measures the recall curve across settings). */
  /** Every vector's IVF cell (nearest learned centroid) — the coarse
    * quantizer shared by [[annIvf]] and the cluster-scoped semantic
    * dedup ([[graft.operators.Dedup.dedupSemantic]]). One narrow
    * distributed pass; the centroid array is driver metadata (NCells
    * seed rows), the ann_ivf precedent. */
  private[operators] def cellAssignments(spark: SparkSession, dir: String): DataFrame =
    cellAssignmentsWith(spark, dir, learnedCentroids(spark, dir))

  private def cellAssignmentsWith(spark: SparkSession, dir: String,
      cents: Array[(Int, Array[Double])]): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .map(r => (r._1, nearestCells(cents, r._2, 1).head))
      .toDF("vec_id", "cell")
  }

  /** The IVF candidate-scoring core shared by [[annIvfProbe]] (top-k)
    * and [[annRadius]] (threshold): fixed query set, nprobe nearest
    * cells per query, exact cosine against the probed cells' members
    * only. Returns (qid, nid, cos) — the consumer applies its own
    * selection. */
  private def ivfScored(spark: SparkSession, dir: String, nprobe: Int): DataFrame = {
    import spark.implicits._
    val cents = learnedCentroids(spark, dir)
    val e = Tables.embeddings(spark, dir)
    val cells = cellAssignmentsWith(spark, dir, cents).toDF("nid", "cell")
    val qCells = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .flatMap(r => nearestCells(cents, r._2, nprobe).map(c => (r._1, c)))
      .toDF("qid", "cell")
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    cells
      .join(broadcast(qCells), "cell")
      .filter(col("qid") =!= col("nid"))
      .join(e.select(col("vec_id").as("nid"), col("embedding").as("ne")), "nid")
      .join(broadcast(q), "qid")
      .withColumn("cos", cosine_sim(col("qe"), col("ne")))
  }

  private[graft] def annIvfProbe(spark: SparkSession, dir: String, nprobe: Int): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
    ivfScored(spark, dir, nprobe)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= K)
      .select(col("qid"), col("rnk"), col("nid"), round(col("cos"), 4).as("cos"))
  }

  /** Label-FILTERED IVF search — [[annFiltered]]'s production
    * upgrade: the metadata predicate (neighbors sharing the query's
    * label) applies INSIDE the IVF candidate stream — between cell
    * probing and scoring — exactly where a vector store evaluates
    * filters (post-filtering a top-k can come home short; filtering
    * before candidate generation would need one index per predicate
    * value). Same [[NProbe]] pruning, scan fraction, and shuffle
    * shape as [[annIvf]]; the label attaches by an equi-join on the
    * candidate id and the ≤|Q|-row query-label relation broadcasts.
    * Approximate by the IVF contract (matches outside probed cells
    * are unseen); the oracle composes the shared cell replay with
    * the same filter placement. */
  def annFilteredIvf(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val labels = e.select(col("vec_id").as("nid"), col("label").cast("long").as("nlabel"))
    val qLabels = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("qid"), col("label").cast("long").as("qlabel"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
    ivfScored(spark, dir, NProbe)
      .join(labels, Seq("nid"))
      .join(broadcast(qLabels), Seq("qid"))
      .filter(col("nlabel") === col("qlabel"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= K)
      .select(col("qid"), col("qlabel").as("label"), col("rnk"), col("nid"),
        round(col("cos"), 4).as("cos"))
  }

  private def annFilteredIvfSql: String =
    s"""$IvfCellsSqlPrefix,
       |qcells AS (SELECT vec_id AS qid, cell FROM assign WHERE vec_id < $NQueries AND rk <= $NProbe),
       |s AS (
       |  SELECT q.qid, CAST(gl.label AS BIGINT) AS label, c.nid,
       |    list_cosine_similarity(qe.emb, ne.emb) AS cos
       |  FROM qcells q
       |  JOIN cells c ON q.cell = c.cell AND c.nid <> q.qid
       |  JOIN embeddings nl ON nl.vec_id = c.nid
       |  JOIN embeddings gl ON gl.vec_id = q.qid
       |    AND CAST(nl.label AS BIGINT) = CAST(gl.label AS BIGINT)
       |  JOIN e qe ON qe.vec_id = q.qid JOIN e ne ON ne.vec_id = c.nid),
       |r AS (SELECT qid, label, nid, cos,
       |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rnk
       |      FROM s)
       |SELECT qid, label, CAST(rnk AS BIGINT) AS rnk, nid, round(cos, 4) AS cos
       |FROM r WHERE rnk <= $K""".stripMargin

  /** Recall-vs-probe tuning CURVE of the IVF index — the table an
    * ANN deployment reads before picking nprobe (the single knob
    * trading scan fraction for recall): corpus recall@[[K]] against
    * the exact [[annTopkBrute]] truth at probe ∈ {1, 2, 4, 8}, on
    * the 2²⁰ lattice. [[annRecall]] pins the SHIPPED operating
    * point; this emits the curve the choice comes from — as a gated
    * operator, because an eval that only lives in a test lab
    * (RecallLab) can't be run by a user against their own corpus.
    * Scale shape: cell assignment is computed once per probe level
    * from the shared cached quantizer; each level is the annIvf
    * candidate shape; everything after the retrievals is
    * O(|probes|·|Q|·K) rows. The oracle runs ONE cell replay with a
    * probes VALUES table crossed into the probe filter (rk ≤ np) —
    * not four copies of the prefix. */
  def ivfProbeCurve(spark: SparkSession, dir: String): DataFrame = {
    val brute = annTopkBrute(spark, dir).select(col("qid"), col("nid"))
    Seq(1, 2, 4, 8).map { np =>
      val ivf = annIvfProbe(spark, dir, np)
        .select(col("qid"), col("nid"), lit(1L).as("hit"))
      brute.join(ivf, Seq("qid", "nid"), "left")
        .agg(count(lit(1)).as("k_total"),
          sum(coalesce(col("hit"), lit(0L))).as("hits"))
        .select(lit(np.toLong).as("nprobe"), col("k_total"), col("hits"),
          expr("(hits * 1048576) div k_total").as("recall_q"))
    }.reduce(_ unionAll _)
  }

  private def ivfProbeCurveSql: String =
    s"""$IvfCellsSqlPrefix,
       |probes(np) AS (VALUES (1), (2), (4), (8)),
       |qcells AS (SELECT p.np, a.vec_id AS qid, a.cell
       |           FROM assign a CROSS JOIN probes p
       |           WHERE a.vec_id < $NQueries AND a.rk <= p.np),
       |s AS (SELECT q.np, q.qid, c.nid, list_cosine_similarity(qe.emb, ne.emb) AS cos
       |      FROM qcells q JOIN cells c ON q.cell = c.cell AND c.nid <> q.qid
       |      JOIN e qe ON qe.vec_id = q.qid JOIN e ne ON ne.vec_id = c.nid),
       |r AS (SELECT np, qid, nid,
       |        row_number() OVER (PARTITION BY np, qid ORDER BY cos DESC, nid ASC) AS rnk
       |      FROM s),
       |ivf AS (SELECT np, qid, nid FROM r WHERE rnk <= $K),
       |b AS ($annTopkSql)
       |SELECT CAST(p.np AS BIGINT) AS nprobe, count(*) AS k_total,
       |  CAST(sum(CASE WHEN i.nid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits,
       |  CAST((sum(CASE WHEN i.nid IS NOT NULL THEN 1 ELSE 0 END) * 1048576)
       |       // count(*) AS BIGINT) AS recall_q
       |FROM probes p CROSS JOIN b
       |LEFT JOIN ivf i ON i.np = p.np AND i.qid = b.qid AND i.nid = b.nid
       |GROUP BY p.np""".stripMargin

  private[operators] val RadiusTau = 0.25

  /** Radius (range) similarity search — ALL neighbors with
    * cos ≥ [[RadiusTau]], not a fixed k: the retrieval mode behind
    * "give me every near-duplicate / every passage above the
    * relevance bar", where result cardinality must follow the data
    * (top-k truncates dense neighborhoods and pads sparse ones).
    * Same IVF pruning as [[annIvf]] — candidates are the [[NProbe]]
    * probed cells' members only, so the scan fraction and shuffle
    * shape are identical to top-k search and the radius test rides
    * the scored stream as a per-row filter (no window at all: unlike
    * top-k, radius selection needs NO per-query sort, which drops
    * the one rank shuffle — strictly cheaper than [[annIvf]] at any
    * scale). Approximate by the same contract (matches outside every
    * probed cell are unseen); τ sits at the fixture's ~99th
    * candidate-cosine percentile so the answer set is the meaningful
    * tail, and the oracle replays cells, probing, and threshold
    * exactly. */
  def annRadius(spark: SparkSession, dir: String): DataFrame =
    ivfScored(spark, dir, NProbe)
      .filter(col("cos") >= RadiusTau)
      .select(col("qid"), col("nid"), round(col("cos"), 4).as("cos"))

  /** k-NN CLASSIFICATION over the embedding corpus — leave-one-out
    * majority vote among each vector's [[KnnK]] approximate nearest
    * neighbors ([[knnJoin]]'s LSH-candidate graph), judged against
    * the fixture's ground-truth `label` column: the standard
    * embedding-quality eval (kNN accuracy) a representation pipeline
    * reports, and the first consumer of `label` as a LEARNING target
    * rather than metadata. Vote ties break (count desc, label asc) —
    * the label_prop rule — so every engine picks the same class.
    * Output carries true label, predicted label, vote count, and the
    * correctness flag; accuracy is one aggregation away. (On this
    * synthetic fixture the labels carry no embedding signal —
    * measured accuracy 0.11 ≈ the 1/|classes| chance floor, which is
    * itself the correct reading: the operator is the measurement,
    * not the model.)
    *
    * Scale shape: everything downstream of the neighbor graph is
    * O(n·k) rows — a label join on the neighbor key, a partial+final
    * vote count, a rank-limit pick, and a join back to the
    * ground-truth labels on the SAME qid key. */
  def knnClassify(spark: SparkSession, dir: String): DataFrame = {
    val labels = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label").cast("long").as("label"))
    val votes = knnJoin(spark, dir)
      .join(labels.select(col("vec_id").as("nid"), col("label").as("nlabel")), "nid")
      .groupBy(col("qid"), col("nlabel"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("qid")).orderBy(col("n").desc, col("nlabel").asc)
    votes
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("qid"), col("nlabel").as("pred_label"), col("n").as("n_votes"))
      .join(labels.select(col("vec_id").as("qid"), col("label").as("true_label")), "qid")
      .select(col("qid"), col("true_label"), col("pred_label"), col("n_votes"),
        (col("true_label") === col("pred_label")).cast("long").as("correct"))
  }

  /** Recall@K of the learned IVF index against the exact cosine
    * ranking — the eval an ANN deployment runs after every retrain/
    * probe-count change, AS a gated operator rather than a test-only
    * lab (RecallLab measures curves; this row pins the shipped
    * operating point cross-engine). Per query: K, how many of the
    * exact top-K the index returned, and recall on the 2²⁰ lattice.
    * Both inputs are the registry's own gated operators, so the eval
    * can never drift from what it rates. Scale shape: both rankings
    * are rank-limited per query before the |Q|·K-row join —
    * everything after the retrievals is metadata. */
  def annRecall(spark: SparkSession, dir: String): DataFrame = {
    val brute = annTopkBrute(spark, dir).select(col("qid"), col("nid"))
    val ivf = annIvf(spark, dir).select(col("qid"), col("nid"), lit(1L).as("hit"))
    brute.join(ivf, Seq("qid", "nid"), "left")
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("k"), sum(coalesce(col("hit"), lit(0L))).as("hits"))
      .select(col("qid"), col("k"), col("hits"),
        expr("(hits * 1048576) div k").as("recall_q"))
  }

  /** Mean-reciprocal-rank eval of exact cosine retrieval against the
    * label ground truth — the rank-AWARE retrieval metric beside
    * [[annRecall]]'s set-overlap recall@K ("not just DID a relevant
    * neighbor surface, but how far down the list"): per query, the
    * first rank within depth [[MrrDepth]] whose neighbor shares the
    * query's label, rr_q = 2²⁰ div first_rank (0 when no relevant
    * neighbor surfaces — the standard MRR@depth convention); corpus
    * MRR is one mean away. Reciprocal ranks are why MRR — like
    * [[rankFusion]]'s RRF — is exact on the integer lattice where
    * score-based metrics are not. Scale shape: the [[annTopkBrute]]
    * orientation (|Q| broadcast queries, vectors never shuffle,
    * rank-limit pushed at depth [[MrrDepth]]), then an O(|Q|·depth)
    * label filter + min-rank fold + one |Q|-row join back. */
  def mrrEval(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("qid"), col("label").cast("long").as("qlabel"),
        col("embedding").as("qe"))
    val c = e.select(col("vec_id").as("nid"), col("label").cast("long").as("nlabel"),
      col("embedding").as("ne"))
    val scored = c.join(broadcast(q), col("qid") =!= col("nid"))
      .withColumn("cos", cosine_sim(col("qe"), col("ne")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
    val first = scored
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= MrrDepth && col("nlabel") === col("qlabel"))
      .groupBy(col("qid")).agg(min(col("rnk")).as("first_rank"))
    q.select(col("qid"), col("qlabel").as("label"))
      .join(first, Seq("qid"), "left")
      .select(col("qid"), col("label"),
        coalesce(col("first_rank"), lit(0L)).as("first_rank"),
        coalesce(expr("1048576 div first_rank"), lit(0L)).as("rr_q"))
  }

  private val MrrDepth = 50L

  /** Two-NN ratio distribution (Facco et al. 2017's intrinsic-
    * dimension estimator input) — the manifold-health probe an
    * embedding pipeline runs before trusting ANN/clustering
    * structure: per vector the ratio μ = d₂/d₁ of its two nearest
    * neighbors (squared lattice-L2, the knn_margin arithmetic);
    * concentrated-near-1 ratios mean high intrinsic dimension
    * (distances losing meaning), a fat tail means low-dimensional
    * structure worth exploiting. Emitted as the 10-bucket histogram
    * of the ratio EXCESS (μ_q − 2²⁰ capped at +2.0, width 0.2 on the
    * lattice) — the estimator's sufficient statistic without the
    * irrational log fit. Vectors whose nearest candidate is an exact
    * lattice duplicate (d₁ = 0) drop — their ratio is undefined and
    * dedup owns them. Neighbors come from the SAME fixed-seed LSH
    * candidate graph knn_join gates (no all-pairs; candidates =
    * bucket-mates), so the oracle replays planes → keys → candidates
    * → lattice distances end to end. Scale shape: the candidate join
    * shuffles (table, key, id) tuples only; distances attach by two
    * equi-joins on the surviving pairs; the rank window is keyed by
    * qid; the final fold is 10 rows. */
  def twonnRatio(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val tagged = tableKeys(spark, dir)
    val cand = tagged.as("a").join(tagged.as("b"),
        col("a.table_idx") === col("b.table_idx") &&
          col("a.table_key") === col("b.table_key") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("qid"), col("b.vec_id").as("nid"))
      .distinct()
    val lat = e.select(col("vec_id"), latArrCol(col("embedding")).as("q"))
    val d = aggregate(zip_with(col("qq"), col("nq"), (x, y) => (x - y) * (x - y)),
      lit(0L), (a, x) => a + x)
    val w = Window.partitionBy(col("qid")).orderBy(col("dd").asc, col("nid").asc)
    cand
      .join(lat.select(col("vec_id").as("nid"), col("q").as("nq")), "nid")
      .join(lat.select(col("vec_id").as("qid"), col("q").as("qq")), "qid")
      .withColumn("dd", d)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 2)
      .groupBy(col("qid"))
      .agg(min(when(col("rnk") === 1, col("dd"))).as("d1"),
        min(when(col("rnk") === 2, col("dd"))).as("d2"))
      .filter(col("d1") > 0L && col("d2").isNotNull)
      .select(expr(
        "least((d2 * 1048576) div d1 - 1048576, 2097149) div 209715").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_points"))
  }

  private def twonnRatioSql: String = {
    val planeRows = planesLiteral
    s"""WITH planes(t, j, p) AS (VALUES $planeRows),
       |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
       |      FROM embeddings),
       |bits AS (
       |  SELECT e.vec_id, pl.t, pl.j,
       |    CASE WHEN list_inner_product(e.emb, pl.p) >= 0 THEN 1 << pl.j ELSE 0 END AS bit
       |  FROM e CROSS JOIN planes pl),
       |keys AS (SELECT vec_id, t, CAST(sum(bit) AS BIGINT) AS key FROM bits GROUP BY 1, 2),
       |cands AS (
       |  SELECT DISTINCT q.vec_id AS qid, c.vec_id AS nid
       |  FROM keys q JOIN keys c ON q.t = c.t AND q.key = c.key AND c.vec_id <> q.vec_id),
       |l AS (SELECT vec_id,
       |        list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * $QScale.0) AS BIGINT)) AS q
       |      FROM embeddings),
       |dd AS (SELECT unnest(range($Dim)) AS i),
       |sc AS (SELECT cands.qid, cands.nid,
       |         CAST(sum((ql.q[dd.i + 1] - nl.q[dd.i + 1])
       |                * (ql.q[dd.i + 1] - nl.q[dd.i + 1])) AS BIGINT) AS d
       |       FROM cands
       |       JOIN l ql ON ql.vec_id = cands.qid
       |       JOIN l nl ON nl.vec_id = cands.nid
       |       CROSS JOIN dd GROUP BY 1, 2),
       |r AS (SELECT qid, d,
       |        row_number() OVER (PARTITION BY qid ORDER BY d ASC, nid ASC) AS rnk
       |      FROM sc),
       |two AS (SELECT qid,
       |          CAST(max(CASE WHEN rnk = 1 THEN d END) AS BIGINT) AS d1,
       |          CAST(max(CASE WHEN rnk = 2 THEN d END) AS BIGINT) AS d2
       |        FROM r WHERE rnk <= 2 GROUP BY qid)
       |SELECT CAST(least((d2 * 1048576) // d1 - 1048576, 2097149) // 209715 AS BIGINT) AS bucket,
       |  count(*) AS n_points
       |FROM two WHERE d1 > 0 AND d2 IS NOT NULL GROUP BY 1""".stripMargin
  }

  private def mrrEvalSql: String =
    s"""WITH q AS (SELECT vec_id AS qid, CAST(label AS BIGINT) AS qlabel,
       |             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe
       |           FROM embeddings WHERE vec_id < $NQueries),
       |c AS (SELECT vec_id AS nid, CAST(label AS BIGINT) AS nlabel,
       |        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ne
       |      FROM embeddings),
       |r AS (SELECT qid, qlabel, nid, nlabel,
       |        row_number() OVER (PARTITION BY qid
       |          ORDER BY list_cosine_similarity(qe, ne) DESC, nid ASC) AS rnk
       |      FROM q, c WHERE qid <> nid),
       |f AS (SELECT qid, min(rnk) AS first_rank
       |      FROM r WHERE rnk <= $MrrDepth AND nlabel = qlabel GROUP BY qid)
       |SELECT q.qid, q.qlabel AS label,
       |  coalesce(f.first_rank, 0) AS first_rank,
       |  coalesce(1048576 // f.first_rank, 0) AS rr_q
       |FROM q LEFT JOIN f ON q.qid = f.qid""".stripMargin

  /** Calibration curve of the kNN classifier — accuracy bucketed by
    * vote count (the classifier's native confidence signal): "when 4
    * of 5 neighbors agree, how often is the label right?" — the
    * downstream-threshold question every weak-labeling pipeline
    * answers before trusting auto-labels. Pure rollup of
    * [[knnClassify]]'s gated output (2²⁰-lattice accuracy, one
    * truncating division), so the oracle wraps the identical
    * classifier replay — O(k) output rows at any corpus size. */
  def knnCalibration(spark: SparkSession, dir: String): DataFrame =
    knnClassify(spark, dir)
      .groupBy(col("n_votes"))
      .agg(count(lit(1)).as("n_queries"), sum(col("correct")).as("n_correct"))
      .select(col("n_votes"), col("n_queries"), col("n_correct"),
        expr("(n_correct * 1048576) div n_queries").as("acc_q"))

  /** Reciprocal-rank fusion (RRF, Cormack et al. 2009) of the two
    * exact retrieval rankings the registry gates — cosine
    * ([[annTopkBrute]]) and max-inner-product ([[mipsTopk]]): per
    * (query, candidate) the fused score Σ 2²⁰ div (60 + rank) over
    * the lists that surfaced it, re-ranked top-[[K]]. RRF is THE
    * production hybrid-retrieval combiner (lexical + dense, or two
    * dense towers) precisely because it needs only ranks — which are
    * integers — so unlike score-interpolation fusion the entire
    * operator is exact on the lattice. Scale shape: both input
    * rankings are rank-limit-pushed per query; the fusion is one
    * (qid, nid) partial+final sum over ≤ 2K rows per query plus a
    * top-K window — negligible next to the retrievals themselves. */
  def rankFusion(spark: SparkSession, dir: String): DataFrame = {
    val lists = annTopkBrute(spark, dir).select(col("qid"), col("nid"), col("rnk"))
      .unionAll(mipsTopk(spark, dir).select(col("qid"), col("nid"), col("rnk")))
    val fused = lists.groupBy(col("qid"), col("nid"))
      .agg(sum(expr("1048576 div (60 + rnk)")).as("rrf_q"),
        count(lit(1)).as("n_lists"))
    val w = Window.partitionBy(col("qid")).orderBy(col("rrf_q").desc, col("nid").asc)
    fused.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= K)
      .select(col("qid"), col("rnk"), col("nid"), col("rrf_q"), col("n_lists"))
  }

  /** Class centroids (prototype vectors) — the per-label mean
    * embedding on the 2⁻²⁰ lattice: the nearest-centroid companion
    * to [[knnClassify]] (Rocchio / prototype classification), and
    * the per-class drift reference an embedding pipeline monitors
    * across model versions. Mean = integral per-dimension sums with
    * ONE truncating division, so the 64-long centroid is bit-exact
    * cross-engine (the Lloyd-round arithmetic, reused as an output).
    *
    * Scale shape: lattice-quantize on the scan, posexplode to
    * (label, dim, qv) — 64× fan-out of LONGS, never raw vectors in
    * the wide shuffle — one partial+final sum on (label, dim), then
    * an O(|classes|·64) reassembly into ordered arrays.
    *
    * Library form: [[classCentroidsTyped]] keeps `centroid_q` as the
    * typed `array<long>`; the registered query emits it comma-joined
    * (the `embed_q8` precedent) because the harness compare sorts
    * columns cell-wise and cannot order array cells. */
  def classCentroidsTyped(spark: SparkSession, dir: String): DataFrame = {
    val g = Tables.embeddings(spark, dir)
      .select(col("label").cast("long").as("label"),
        posexplode(latArrCol(col("embedding"))))
      .toDF("label", "d", "qv")
      .groupBy(col("label"), col("d"))
      // per-class lattice sums approach 2⁶³ at ~10¹³ members (qv ≤
      // 2²⁰ per element) — decimal headroom, quotient back in BIGINT
      .agg(sum(col("qv").cast("decimal(38,0)")).as("sq"), count(lit(1)).as("n"))
    g.groupBy(col("label"))
      .agg(max(col("n")).as("n_members"),
        transform(
          sort_array(collect_list(struct(col("d"), expr("sq div n").as("cq")))),
          e => e("cq")).as("centroid_q"))
  }

  /** Registered (oracle-compared) form of [[classCentroidsTyped]]:
    * identical lattice arithmetic, `centroid_q` serialized to a
    * comma-joined string so the cross-engine compare can sort it. */
  def classCentroids(spark: SparkSession, dir: String): DataFrame =
    classCentroidsTyped(spark, dir)
      .withColumn("centroid_q", array_join(col("centroid_q"), ","))

  /** Index-quality profile of the IVF coarse quantizer — per cell:
    * member count, tightest/loosest member cosine to the learned
    * centroid, and how many members sit below 0.1 ("loose" vectors
    * whose cell barely represents them). This is the monitoring
    * query an ANN deployment runs after every (re)train/ADD cycle:
    * skewed counts → imbalanced probe cost, a fat loose tail → the
    * recall floor is about to sag and the quantizer wants more cells
    * or a re-train. Spreads (min/max/threshold-count) are emitted
    * instead of a mean because double summation is order-sensitive
    * across engines while min/max/count are exactly reproducible.
    *
    * Scale shape: one narrow typed pass computes each vector's
    * (cell, cos) against the broadcast centroid array (driver
    * metadata, the ann_ivf precedent), then ONE partial+final
    * aggregation on cell — O(cells) output at any corpus size. */
  def clusterStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cents = learnedCentroids(spark, dir)
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .map { case (_, v) =>
        cents.map { case (i, c) => (i, cosTo(c, v)) }
          .minBy { case (i, s) => (-s, i) }
      }
      .toDF("cell", "cos")
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n"),
        round(min(col("cos")), 4).as("min_cos"),
        round(max(col("cos")), 4).as("max_cos"),
        sum(when(col("cos") < 0.1, 1L).otherwise(0L)).as("n_loose"))
      .select(col("cell").cast("long").as("cell"), col("n"),
        col("min_cos"), col("max_cos"), col("n_loose"))
  }

  private val KnnK = 3

  /** All-vectors approximate k-NN JOIN: every vector finds its
    * [[KnnK]] nearest LSH-candidate neighbors — the self-join
    * counterpart of [[annLsh]]'s fixed query set, and the primitive
    * behind neighbor-graph construction (embedding near-dup graphs,
    * semantic clustering) at corpus scale. Candidates are bucket-mates
    * in ≥1 of the 16 sign tables; only candidates are scored, so the
    * shuffle carries (table, key, id) tuples and then (qid, nid)
    * pairs — never all-pairs. Approximate BY CONSTRUCTION (neighbors
    * outside every shared bucket are unseen — at the 16×6 operating
    * point that loss concentrates on low-cos neighbors); the oracle
    * replays the SAME bucketing, so the gate is exact for the operator
    * as specified. Candidate volume scales with Σ bucket², the
    * documented LSH trade (see [[annLsh]]). */
  def knnJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val tagged = tableKeys(spark, dir)
    val candPairs = tagged.as("a")
      .join(tagged.as("b"),
        col("a.table_idx") === col("b.table_idx") &&
          col("a.table_key") === col("b.table_key") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("qid"), col("b.vec_id").as("nid"))
      .distinct()
    val scored = candPairs
      .join(e.select(col("vec_id").as("nid"), col("embedding").as("ne")), "nid")
      .join(e.select(col("vec_id").as("qid"), col("embedding").as("qe")), "qid")
      .withColumn("cos", cosine_sim(col("qe"), col("ne")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
    scored
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= KnnK)
      .select(col("qid"), col("rnk"), col("nid"), round(col("cos"), 4).as("cos"))
  }

  // -- graph ANN: bounded NN-descent k-NN graph + beam search --------

  private val GraphDeg = 16      // out-degree of the neighbor graph
  private val BeamWidth = 48     // candidates kept per query per hop
  private val BeamHops = 4       // beam expansion rounds
  private val SeedStride = 10    // entry points: vec_id % stride == 0
  private val DescentRounds = 2

  /** The k-NN neighbor graph behind [[annGraph]]: per vector, its
    * top-[[GraphDeg]] cosine neighbors among LSH bucket-mates
    * (initialization), refined by [[DescentRounds]] rounds of
    * NN-descent (Dong et al., WWW'11): each round's candidate set is
    * the current edges ∪ forward neighbor-of-neighbor pairs ∪
    * reversed edges ∪ co-neighbor pairs (two vectors sharing a
    * neighbor — the "local join" that makes NN-descent converge),
    * re-ranked to top-M per node. Everything is deterministic
    * (fixed-seed LSH init, ties → lower dst), so the DuckDB oracle
    * replays the whole construction.
    *
    * Scale shape: no all-pairs anywhere — init candidates are LSH
    * bucket-mates (the knn_join trade), and each descent round is
    * self-joins of an (n × M) edge list partitioned on the join key,
    * i.e. O(n·M²) candidate rows per round with M a small constant.
    * Rounds are a bounded constant, and each round's graph is
    * persisted (scoped) because the next round references it four
    * times — the same once-partitioned-reuse invariant as pagerank's
    * edge cache. */
  private[operators] def neighborGraph(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val tagged = tableKeys(spark, dir)
    val cand0 = tagged.as("a").join(tagged.as("b"),
        col("a.table_idx") === col("b.table_idx") &&
          col("a.table_key") === col("b.table_key") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("src"), col("b.vec_id").as("dst"))
      .distinct()
    def topM(cand: DataFrame): DataFrame = {
      val scored = cand
        .join(e.select(col("vec_id").as("src"), col("embedding").as("se")), "src")
        .join(e.select(col("vec_id").as("dst"), col("embedding").as("de")), "dst")
        .withColumn("cos", cosine_sim(col("se"), col("de")))
      val w = Window.partitionBy(col("src")).orderBy(col("cos").desc, col("dst").asc)
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= GraphDeg)
        .select("src", "dst")
    }
    var g = topM(cand0).persistScoped()
    for (_ <- 1 to DescentRounds) {
      val fwd = g.as("a").join(g.as("b"),
          col("a.dst") === col("b.src") && col("a.src") =!= col("b.dst"))
        .select(col("a.src").as("src"), col("b.dst").as("dst"))
      val rev = g.select(col("dst").as("src"), col("src").as("dst"))
      val co = g.as("a").join(g.as("b"),
          col("a.src") === col("b.src") && col("a.dst") =!= col("b.dst"))
        .select(col("a.dst").as("src"), col("b.dst").as("dst"))
      g = topM(g.union(fwd).union(rev).union(co).distinct()).persistScoped()
    }
    g
  }

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
    * stays. */
  def annGraph(spark: SparkSession, dir: String): DataFrame =
    annGraphBeam(spark, dir, BeamWidth)

  /** [[annGraph]] with explicit beam width and hop count — the two
    * cost/recall dials (GraphAnnLab A/B harness; the shipped operator
    * pins [[BeamWidth]]/[[BeamHops]], and the oracle interpolates the
    * same constants). */
  private[graft] def annGraphBeam(
      spark: SparkSession, dir: String, beamWidth: Int,
      hops: Int = BeamHops): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val g = neighborGraph(spark, dir)
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
    var beam = beamTop(seeds.join(broadcast(q.select(col("qid"))), col("qid") =!= col("nid")))
      .localCheckpointScoped()
    for (_ <- 1 until hops)
      beam = beamTop(beam.union(expand(beam)).distinct()).localCheckpointScoped()
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

  private def embedDriftSql: String =
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

  private val NSub = 8    // subspaces
  private val SubDim = 8  // dims per subspace (NSub × SubDim = Dim)
  private val NCodes = 256 // 8-bit codes (r8 shipped 16/4-bit; recall at sf0.1 was 0.62)

  /** Lattice-floored component i of a (possibly ragged) vector —
    * the same 2^-20 grid as the IVF Lloyd update, so every distance
    * below is exact integer arithmetic in BOTH engines. */
  private def lat(v: Array[Float], i: Int): Long =
    if (i < v.length) math.floor(v(i).toDouble * QScale).toLong else 0L

  /** Sampled-point SEED codebook, as lattice integers:
    * codebook(s)(c)(d) = component s·SubDim+d of seed vector c
    * (vec_id ∈ [100, 100+NCodes) — the IVF seed-slice trick, one
    * codebook entry per seed per subspace). Driver metadata:
    * 256×64 longs. */
  private def pqSeedCodebook(spark: SparkSession, dir: String): Array[Array[Array[Long]]] = {
    val seeds = Tables.embeddings(spark, dir)
      .filter(col("vec_id") >= 100 && col("vec_id") < (100 + NCodes))
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
  private def pqCodebook(spark: SparkSession, dir: String,
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
  private def pqCodesOf(v: Array[Float], cb: Array[Array[Array[Long]]]): Array[Int] =
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

  private def pqCodeBalanceSql: String =
    s"""WITH ${pqReplayPrefix()},
       |cc AS (SELECT s, code, count(*) AS n FROM codes GROUP BY 1, 2)
       |SELECT CAST(s AS BIGINT) AS s, count(*) AS codes_used,
       |  CAST(256 - count(*) AS BIGINT) AS dead_codes,
       |  CAST(max(n) AS BIGINT) AS max_code_n,
       |  CAST((max(n) * 1048576) // sum(n) AS BIGINT) AS top_share_q
       |FROM cc GROUP BY s""".stripMargin

  private val PqShortlist = 100

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
  private def pqCodesNarrow(
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
  private def pqQueryTables(
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
  private def rerankShortlist(spark: SparkSession, dir: String, scored: DataFrame): DataFrame = {
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
  private def latArrCol(c: Column): Column =
    transform(c, x => floor(x.cast("double") * lit(QScale.toDouble)).cast("long"))
  private def sumArrCol(arr: Column): Column =
    aggregate(arr, lit(0.0), (a, x) => a + x)

  /** Stored centroids → (cell, ce: array<double>), d-ordered. */
  private def centArrOf(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/centroids")
      .groupBy(col("cell"))
      .agg(array_sort(collect_list(struct(col("d"), col("cv")))).as("p"))
      .select(col("cell"), transform(col("p"), s => s.getField("cv")).as("ce"))

  /** Relational cell scores for arbitrary vectors vs the centroid
    * relation: (id, cell, cos) — the cosine is built-in expression
    * arithmetic accumulating in index order, bit-identical to the
    * driver-side `cosTo` (same IEEE addition order, same −2.0
    * zero-norm sentinel, ties → lower cell downstream). */
  private def relCellScores(vecs: DataFrame, centArr: DataFrame): DataFrame =
    ScalarJoin.broadcastCross(vecs, col("id"), centArr, col("cell"))
      .withColumn("dot", sumArrCol(zip_with(col("ve"), col("ce"), (w, u) => u * w)))
      .withColumn("na", sumArrCol(transform(col("ce"), u => u * u)))
      .withColumn("nb", sumArrCol(transform(col("ve"), w => w * w)))
      .withColumn("cos", when(col("na") === 0.0 || col("nb") === 0.0, lit(-2.0))
        .otherwise(col("dot") / (sqrt(col("na")) * sqrt(col("nb")))))

  /** Relational per-(id, s, c) lattice L2² vs the stored codebook —
    * shared by the query ADC tables and the incremental-add code
    * assignment. */
  private def relCodeDists(spark: SparkSession, root: String, vecs: DataFrame): DataFrame =
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
  private def annIndexSearchOver(spark: SparkSession, dir: String, root: String,
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
    * call). */
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

  private val DecimalType38 =
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

  private def knnMarginSql: String =
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

  private def cellLabelPuritySql: String =
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

  private def centroidOutliersSql: String =
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
  private def labelNoiseSql: String =
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

  private def conformalKnnSql: String =
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "gram_matrix" -> gramMatrix,
    "pca_power" -> pcaPower,
    "pca_project" -> pcaProject,
    "ann_index" -> annIndex,
    "ann_index_add" -> annIndexAdd,
    "ann_topk" -> annTopkBrute,
    "ann_filtered" -> annFiltered,
    "hard_negatives" -> hardNegatives,
    "mmr_select" -> mmrSelect,
    "coreset_kcenter" -> coresetKcenter,
    "mrl_truncate" -> mrlTruncate,
    "embed_center" -> embedCenter,
    "mips_topk" -> mipsTopk,
    "pq_distortion" -> pqDistortion,
    "ann_lsh"  -> annLsh,
    "ann_ivf"  -> annIvf,
    "ann_radius" -> annRadius,
    "cluster_stats" -> clusterStats,
    "ann_pq"   -> annPq,
    "ann_ivfpq" -> annIvfPq,
    "ann_graph" -> annGraph,
    "embed_q8" -> embedQuantize,
    "embed_drift" -> embedDrift,
    "embed_pq" -> embedPq,
    "knn_join" -> knnJoin,
    "knn_classify" -> knnClassify,
    "knn_calibration" -> knnCalibration,
    "rank_fusion" -> rankFusion,
    "ann_recall" -> annRecall,
    "mrr_eval" -> mrrEval,
    "twonn_ratio" -> twonnRatio,
    "pq_code_balance" -> pqCodeBalance,
    "ann_filtered_ivf" -> annFilteredIvf,
    "ivf_probe_curve" -> ivfProbeCurve,
    "class_centroids" -> classCentroids,
    "contrastive_pairs" -> contrastivePairs,
    "mutual_knn" -> mutualKnn,
    "knn_margin" -> knnMargin,
    "cell_label_purity" -> cellLabelPurity,
    "centroid_outliers" -> centroidOutliers,
    "label_noise" -> labelNoise,
    "conformal_knn" -> conformalKnn,
    "embed_norm_stats" -> embedNormStats)

  /** Shared PQ replay: lattice-floored vectors, the sampled-point
    * SEED codebook, the per-subspace Lloyd mean update (integral
    * sums, truncating division), then per-(vector, subspace, code)
    * integer L2 against the TRAINED codebook and the argmin code
    * assignment — every quantity an exact BIGINT, so `embed_pq` and
    * `ann_pq` hash-gate the whole operator including training. */
  private def pqReplayPrefix(trainWhere: String = "TRUE"): String =
    s"""e AS (SELECT vec_id,
       |  list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * $QScale.0) AS BIGINT)) AS q
       |  FROM embeddings),
       |cb0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, q AS cq
       |        FROM e WHERE vec_id >= 100 AND vec_id < ${100 + NCodes}),
       |sd AS (SELECT ss.s, dd.d FROM (SELECT unnest(range($NSub)) AS s) ss
       |       CROSS JOIN (SELECT unnest(range($SubDim)) AS d) dd),
       |nd0 AS (
       |  SELECT e.vec_id, sd.s, cb0.code,
       |    CAST(sum((COALESCE(e.q[sd.s*$SubDim + sd.d + 1], 0) - COALESCE(cb0.cq[sd.s*$SubDim + sd.d + 1], 0))
       |           * (COALESCE(e.q[sd.s*$SubDim + sd.d + 1], 0) - COALESCE(cb0.cq[sd.s*$SubDim + sd.d + 1], 0))) AS BIGINT) AS dist
       |  FROM e CROSS JOIN sd CROSS JOIN cb0
       |  WHERE $trainWhere
       |  GROUP BY 1, 2, 3),
       |codes0 AS (
       |  SELECT vec_id, s, code FROM (
       |    SELECT vec_id, s, code,
       |      row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, code) AS rk
       |    FROM nd0) t WHERE rk = 1),
       |lsums AS (
       |  SELECT c.s, c.code, dd.d,
       |    CAST(sum(COALESCE(e.q[c.s*$SubDim + dd.d + 1], 0)) AS BIGINT) AS sq,
       |    count(*) AS n
       |  FROM codes0 c JOIN e USING (vec_id)
       |  CROSS JOIN (SELECT unnest(range($SubDim)) AS d) dd
       |  GROUP BY 1, 2, 3),
       |cbt AS (
       |  SELECT sd.s, c0.code, sd.d,
       |    COALESCE(su.sq // su.n, COALESCE(c0.cq[sd.s*$SubDim + sd.d + 1], 0)) AS v
       |  FROM cb0 c0 CROSS JOIN sd
       |  LEFT JOIN lsums su ON su.s = sd.s AND su.code = c0.code AND su.d = sd.d),
       |nd AS (
       |  SELECT e.vec_id, cbt.s, cbt.code,
       |    CAST(sum((COALESCE(e.q[cbt.s*$SubDim + cbt.d + 1], 0) - cbt.v)
       |           * (COALESCE(e.q[cbt.s*$SubDim + cbt.d + 1], 0) - cbt.v)) AS BIGINT) AS dist
       |  FROM e CROSS JOIN cbt
       |  GROUP BY 1, 2, 3),
       |codes AS (
       |  SELECT vec_id, s, code FROM (
       |    SELECT vec_id, s, code,
       |      row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, code) AS rk
       |    FROM nd) t WHERE rk = 1)""".stripMargin

  /** Full IVF-PQ replay, training CTEs restricted to `trainWhere`
    * (TRUE = train on everything — `ann_ivfpq`/`ann_index`; a base
    * filter = the incremental-add contract, where the assign/codes
    * CTEs still cover EVERY vector using the base-trained artifacts —
    * exactly what [[annIndexAdd]] computes). */
  /** DuckDB replay of the IVF coarse quantizer — seed slice, one
    * integral-lattice Lloyd round, final assignment — ending in a
    * `cells(nid, cell)` CTE. Shared verbatim by the `ann_ivf` oracle
    * and `dedup_semantic`'s ([[graft.operators.Dedup.dedupSemantic]]),
    * so the two operators are gated against the IDENTICAL quantizer. */
  private[operators] def IvfCellsSqlPrefix: String =
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
       |           FROM embeddings),
       |cents0 AS (
       |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, emb AS ce
       |  FROM e WHERE vec_id >= 100 AND vec_id < ${100 + NCells}),
       |a0 AS (
       |  SELECT e.vec_id, c.cell,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY list_cosine_similarity(e.emb, c.ce) DESC, c.cell ASC) AS rk
       |  FROM e CROSS JOIN cents0 c),
       |m0 AS (SELECT vec_id, cell FROM a0 WHERE rk = 1),
       |dims AS (SELECT unnest(range($Dim)) AS d),
       |sums AS (
       |  SELECT m0.cell, dims.d,
       |    CAST(sum(COALESCE(CAST(floor(e.emb[dims.d + 1] * $QScale.0) AS BIGINT), 0)) AS BIGINT) AS sq,
       |    count(*) AS n
       |  FROM m0 JOIN e USING (vec_id) CROSS JOIN dims GROUP BY 1, 2),
       |cents AS (
       |  SELECT c0.cell,
       |    list(COALESCE(CAST(s.sq // s.n AS DOUBLE) / $QScale.0,
       |                  c0.ce[dims.d + 1]) ORDER BY dims.d) AS ce
       |  FROM cents0 c0 CROSS JOIN dims
       |  LEFT JOIN sums s ON s.cell = c0.cell AND s.d = dims.d
       |  GROUP BY c0.cell),
       |assign AS (
       |  SELECT e.vec_id, c.cell,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY list_cosine_similarity(e.emb, c.ce) DESC, c.cell ASC) AS rk
       |  FROM e CROSS JOIN cents c),
       |cells AS (SELECT vec_id AS nid, cell FROM assign WHERE rk = 1)""".stripMargin

  private def ivfPqReplaySql(trainWhere: String = "TRUE"): String =
      s"""WITH ${pqReplayPrefix(trainWhere)},
         |ed AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
         |       FROM embeddings),
         |cents0 AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, emb AS ce
         |  FROM ed WHERE vec_id >= 100 AND vec_id < ${100 + NCells}),
         |a0 AS (
         |  SELECT ed.vec_id, c.cell,
         |    row_number() OVER (PARTITION BY ed.vec_id
         |      ORDER BY list_cosine_similarity(ed.emb, c.ce) DESC, c.cell ASC) AS rk
         |  FROM ed CROSS JOIN cents0 c WHERE $trainWhere),
         |m0 AS (SELECT vec_id, cell FROM a0 WHERE rk = 1),
         |dims AS (SELECT unnest(range($Dim)) AS d),
         |sums AS (
         |  SELECT m0.cell, dims.d,
         |    CAST(sum(COALESCE(CAST(floor(ed.emb[dims.d + 1] * $QScale.0) AS BIGINT), 0)) AS BIGINT) AS sq,
         |    count(*) AS n
         |  FROM m0 JOIN ed USING (vec_id) CROSS JOIN dims GROUP BY 1, 2),
         |cents AS (
         |  SELECT c0.cell,
         |    list(COALESCE(CAST(s.sq // s.n AS DOUBLE) / $QScale.0,
         |                  c0.ce[dims.d + 1]) ORDER BY dims.d) AS ce
         |  FROM cents0 c0 CROSS JOIN dims
         |  LEFT JOIN sums s ON s.cell = c0.cell AND s.d = dims.d
         |  GROUP BY c0.cell),
         |assign AS (
         |  SELECT ed.vec_id, c.cell,
         |    row_number() OVER (PARTITION BY ed.vec_id
         |      ORDER BY list_cosine_similarity(ed.emb, c.ce) DESC, c.cell ASC) AS rk
         |  FROM ed CROSS JOIN cents c),
         |cells AS (SELECT vec_id AS nid, cell FROM assign WHERE rk = 1),
         |qcells AS (SELECT vec_id AS qid, cell FROM assign
         |           WHERE vec_id < $NQueries AND rk <= $NProbe),
         |cand AS (SELECT q.qid, c.nid
         |         FROM qcells q JOIN cells c ON q.cell = c.cell AND c.nid <> q.qid),
         |adc AS (
         |  SELECT cand.qid, cand.nid, CAST(sum(qt.dist) AS BIGINT) AS adc
         |  FROM cand JOIN codes c ON c.vec_id = cand.nid
         |  JOIN nd qt ON qt.vec_id = cand.qid AND qt.s = c.s AND qt.code = c.code
         |  GROUP BY 1, 2),
         |short AS (
         |  SELECT qid, nid FROM (
         |    SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY adc ASC, nid ASC) AS srk
         |    FROM adc) t WHERE srk <= $PqShortlist),
         |dd AS (SELECT unnest(range($Dim)) AS i),
         |ex AS (
         |  SELECT s.qid, s.nid,
         |    CAST(sum((COALESCE(eq.q[dd.i + 1], 0) - COALESCE(en.q[dd.i + 1], 0))
         |           * (COALESCE(eq.q[dd.i + 1], 0) - COALESCE(en.q[dd.i + 1], 0))) AS BIGINT) AS dist
         |  FROM short s JOIN e eq ON eq.vec_id = s.qid
         |  JOIN e en ON en.vec_id = s.nid CROSS JOIN dd
         |  GROUP BY 1, 2),
         |r AS (SELECT qid, nid, dist,
         |        row_number() OVER (PARTITION BY qid ORDER BY dist ASC, nid ASC) AS rnk
         |      FROM ex)
         |SELECT qid, CAST(rnk AS BIGINT) AS rnk, nid, dist
         |FROM r WHERE rnk <= $K""".stripMargin

  /** Unrolled [[PcaRounds]]-round power-iteration replay over the
    * gram_matrix CTE (the labelPropSql/pagerankPersonalizedSql
    * precedent): v₀ = 2²⁰, each round mv ← G·v as HUGEINT (G entries
    * grow with corpus mass, v ≤ 2²⁰ → |mv·2²⁰| can pass 2⁶³ well
    * inside HUGEINT range), then v ← mv·2²⁰ // max|mv|. DuckDB `//`
    * truncates toward zero on integers, exactly BigInt `/`. The max
    * is hoisted into its own mx CTE and CROSS JOINed (never a scalar
    * subquery inside an aggregate — the DuckDB LATERAL-binder trap). */
  /** Power-iteration replay prefix (ends at v[[PcaRounds]]), shared
    * verbatim by the `pca_power` and `pca_project` oracles — the
    * BfsCtes rule: a transform must not be able to drift from the
    * loadings it applies. */
  private val PcaCtes: String = {
    def round(r: Int): String =
      s"""mv$r AS (
         |  SELECT g.i AS d, sum(CAST(g.g AS HUGEINT) * v${r - 1}.v) AS mv
         |  FROM g JOIN v${r - 1} ON v${r - 1}.d = g.j GROUP BY 1),
         |mx$r AS (SELECT max(abs(mv)) AS mx FROM mv$r),
         |v$r AS (SELECT d, (mv * $QScale) // mx AS v FROM mv$r CROSS JOIN mx$r)""".stripMargin
    s"""g AS (
       |  SELECT t1.i - 1 AS i, t2.j - 1 AS j,
       |    CAST(sum(CAST(floor(CAST(embedding[t1.i] AS DOUBLE) * $QScale.0) AS BIGINT)
       |           * CAST(floor(CAST(embedding[t2.j] AS DOUBLE) * $QScale.0) AS BIGINT)) AS BIGINT) AS g
       |  FROM embeddings, range(1, ${Dim + 1}) t1(i), range(1, ${Dim + 1}) t2(j)
       |  GROUP BY 1, 2),
       |v0 AS (SELECT unnest(range($Dim)) AS d, CAST($QScale AS HUGEINT) AS v),
       |${(1 to PcaRounds).map(round).mkString(",\n")}""".stripMargin
  }

  private def pcaPowerSql: String =
    s"""WITH $PcaCtes
       |SELECT CAST(d AS BIGINT) AS d, CAST(v AS BIGINT) AS loading_q
       |FROM v$PcaRounds""".stripMargin

  private def pcaProjectSql: String =
    s"""WITH $PcaCtes
       |SELECT e.vec_id,
       |  CAST(sum(CAST(floor(CAST(e.embedding[t.i] AS DOUBLE) * $QScale.0) AS BIGINT) * v.v)
       |       // $QScale AS BIGINT) AS score_q
       |FROM embeddings e
       |CROSS JOIN range(1, ${Dim + 1}) t(i)
       |JOIN v$PcaRounds v ON v.d = t.i - 1
       |GROUP BY e.vec_id""".stripMargin

  private val oraclesBase: Map[String, String] = Map(
    "pca_power" -> pcaPowerSql,
    "pca_project" -> pcaProjectSql,
    "label_noise" -> labelNoiseSql,
    "conformal_knn" -> conformalKnnSql,
    "knn_margin" -> knnMarginSql,
    "cell_label_purity" -> cellLabelPuritySql,
    "centroid_outliers" -> centroidOutliersSql,
    // lattice products are exact BIGINTs; DuckDB's sum is HUGEINT →
    // both sides land on DECIMAL(38,0). range() is 1..64 → i = idx-1.
    "gram_matrix" ->
      s"""SELECT t1.i - 1 AS i, t2.j - 1 AS j,
         |  CAST(sum(CAST(floor(CAST(embedding[t1.i] AS DOUBLE) * $QScale.0) AS BIGINT)
         |         * CAST(floor(CAST(embedding[t2.j] AS DOUBLE) * $QScale.0) AS BIGINT))
         |       AS BIGINT) AS g
         |FROM embeddings, range(1, ${Dim + 1}) t1(i), range(1, ${Dim + 1}) t2(j)
         |GROUP BY 1, 2""".stripMargin,
    // exact lattice dot — every term and the sum are BIGINTs, so the
    // full MIPS ranking replays with zero float contract
    "mips_topk" ->
      s"""WITH l AS (SELECT vec_id,
         |  list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * $QScale.0) AS BIGINT)) AS q
         |  FROM embeddings),
         |qs AS (SELECT vec_id AS qid, q AS qq FROM l WHERE vec_id < $NQueries),
         |dd AS (SELECT unnest(range($Dim)) AS i),
         |sc AS (SELECT qs.qid, l.vec_id AS nid,
         |         CAST(sum(qs.qq[dd.i + 1] * l.q[dd.i + 1]) AS BIGINT) AS dot
         |       FROM qs JOIN l ON l.vec_id <> qs.qid CROSS JOIN dd
         |       GROUP BY 1, 2),
         |r AS (SELECT qid, nid, dot,
         |        row_number() OVER (PARTITION BY qid ORDER BY dot DESC, nid ASC) AS rnk
         |      FROM sc)
         |SELECT qid, CAST(rnk AS BIGINT) AS rnk, nid, dot FROM r WHERE rnk <= $K""".stripMargin,
    // nd already holds every (vector, subspace, code) lattice SSE —
    // the assigned-code join IS the distortion lookup
    "pq_distortion" ->
      s"""WITH ${pqReplayPrefix()},
         |da AS (SELECT nd.vec_id, nd.s, nd.dist
         |       FROM nd JOIN codes c
         |         ON c.vec_id = nd.vec_id AND c.s = nd.s AND c.code = nd.code)
         |SELECT CAST(s AS BIGINT) AS s, count(*) AS n,
         |  CAST(sum(dist) // count(*) AS BIGINT) AS mean_sse,
         |  CAST(max(dist) AS BIGINT) AS max_sse
         |FROM da GROUP BY s""".stripMargin,
    "embed_pq" ->
      s"""WITH ${pqReplayPrefix()}
         |SELECT vec_id,
         |  CAST(max(CASE WHEN s = 0 THEN code END) AS BIGINT) AS c0,
         |  CAST(max(CASE WHEN s = 1 THEN code END) AS BIGINT) AS c1,
         |  CAST(max(CASE WHEN s = 2 THEN code END) AS BIGINT) AS c2,
         |  CAST(max(CASE WHEN s = 3 THEN code END) AS BIGINT) AS c3,
         |  CAST(max(CASE WHEN s = 4 THEN code END) AS BIGINT) AS c4,
         |  CAST(max(CASE WHEN s = 5 THEN code END) AS BIGINT) AS c5,
         |  CAST(max(CASE WHEN s = 6 THEN code END) AS BIGINT) AS c6,
         |  CAST(max(CASE WHEN s = 7 THEN code END) AS BIGINT) AS c7
         |FROM codes GROUP BY vec_id""".stripMargin,
    // ADC = Σ_s querytable(s, code_s) — nd already holds every
    // (query, subspace, code) distance, so the join IS the lookup;
    // the shortlist cut and the exact-L2 rerank replay in the same
    // integer arithmetic
    "ann_pq" ->
      s"""WITH ${pqReplayPrefix()},
         |adc AS (
         |  SELECT qt.vec_id AS qid, c.vec_id AS nid, CAST(sum(qt.dist) AS BIGINT) AS adc
         |  FROM codes c JOIN nd qt ON qt.s = c.s AND qt.code = c.code
         |  WHERE qt.vec_id < $NQueries AND c.vec_id <> qt.vec_id
         |  GROUP BY 1, 2),
         |short AS (
         |  SELECT qid, nid FROM (
         |    SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY adc ASC, nid ASC) AS srk
         |    FROM adc) t WHERE srk <= $PqShortlist),
         |dd AS (SELECT unnest(range($Dim)) AS i),
         |ex AS (
         |  SELECT s.qid, s.nid,
         |    CAST(sum((COALESCE(eq.q[dd.i + 1], 0) - COALESCE(en.q[dd.i + 1], 0))
         |           * (COALESCE(eq.q[dd.i + 1], 0) - COALESCE(en.q[dd.i + 1], 0))) AS BIGINT) AS dist
         |  FROM short s JOIN e eq ON eq.vec_id = s.qid
         |  JOIN e en ON en.vec_id = s.nid CROSS JOIN dd
         |  GROUP BY 1, 2),
         |r AS (SELECT qid, nid, dist,
         |        row_number() OVER (PARTITION BY qid ORDER BY dist ASC, nid ASC) AS rnk
         |      FROM ex)
         |SELECT qid, CAST(rnk AS BIGINT) AS rnk, nid, dist
         |FROM r WHERE rnk <= $K""".stripMargin,
    // IVF-PQ: the pq replay prefix (lattice e, trained codebook,
    // codes, per-(vector, subspace, code) distances nd) composed with
    // the IVF replay (double-typed `ed`, seed + Lloyd centroids,
    // cell/probe assignment); the candidate set is probed-cell
    // members, ADC joins codes to nd, and the shortlist + exact
    // rerank tail is ann_pq's verbatim
    "ann_ivfpq" -> ivfPqReplaySql(),

    // positives replay as the all-pairs truth (the dedup_embedding
    // oracle's own equivalence); negatives replay the deterministic
    // arithmetic and re-score with list_cosine_similarity
    "contrastive_pairs" ->
      """WITH e AS (SELECT vec_id,
        |             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        |           FROM embeddings),
        |n AS (SELECT count(*) AS n FROM embeddings),
        |pos AS (
        |  SELECT a.vec_id AS anchor, b.vec_id AS cand,
        |    round(list_cosine_similarity(a.emb, b.emb), 4) AS cos,
        |    CAST(1 AS BIGINT) AS label
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id
        |  WHERE list_cosine_similarity(a.emb, b.emb) >= 0.45),
        |negid AS (
        |  SELECT DISTINCT anchor,
        |    (anchor * 7919 + j * 104729) % (SELECT n FROM n) AS cand
        |  FROM pos, (SELECT unnest([1, 2]) AS j) js
        |  WHERE (anchor * 7919 + j * 104729) % (SELECT n FROM n) <> anchor)
        |SELECT anchor, cand, cos, label FROM pos
        |UNION ALL
        |SELECT g.anchor, g.cand,
        |  round(list_cosine_similarity(ea.emb, eb.emb), 4) AS cos,
        |  CAST(0 AS BIGINT) AS label
        |FROM negid g JOIN e ea ON ea.vec_id = g.anchor
        |             JOIN e eb ON eb.vec_id = g.cand""".stripMargin,
    "embed_drift" -> embedDriftSql,
    "embed_q8" ->
      """WITH s AS (
        |  SELECT vec_id, embedding,
        |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))/127.0 AS scale
        |  FROM embeddings)
        |SELECT vec_id, scale,
        |  list_aggregate(list_transform(embedding,
        |    x -> CAST(CAST(floor(CAST(x AS DOUBLE)/scale + 0.5) AS BIGINT) AS VARCHAR)),
        |    'string_agg', ',') AS q
        |FROM s""".stripMargin,
    "ann_topk" -> annTopkSql,
    "ann_filtered" -> annFilteredSql,
    "hard_negatives" -> hardNegativesSql,
    "mmr_select" -> mmrSelectSql,
    "coreset_kcenter" -> coresetSql,
    "mrl_truncate" -> mrlTruncateSql,
    "embed_center" -> embedCenterSql,
    // IVF is fully SQL-expressible because every piece is
    // deterministic: DuckDB replays seed-centroid selection, the
    // quantized-integer Lloyd mean update (floor onto the 2^-20
    // lattice → exact BIGINT sums → trunc-toward-zero division, all
    // bit-identical across engines), nearest-cell assignment (ties →
    // lower cell), nprobe probing, in-cell scoring, and per-query
    // top-k — the whole LEARNED operator is hash-gated, not just row
    // counts.
    "ann_ivf" -> annIvfSql,
    // recall@K of the learned IVF index against the exact ranking —
    // BOTH sides are the full gated replays, composed as derived
    // tables, so the eval can never drift from the operators it rates
    "mrr_eval" -> mrrEvalSql,
    "twonn_ratio" -> twonnRatioSql,
    "pq_code_balance" -> pqCodeBalanceSql,
    "ann_filtered_ivf" -> annFilteredIvfSql,
    "ivf_probe_curve" -> ivfProbeCurveSql,
    "ann_recall" ->
      s"""SELECT b.qid, count(*) AS k,
         |  CAST(sum(CASE WHEN i.nid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits,
         |  CAST((sum(CASE WHEN i.nid IS NOT NULL THEN 1 ELSE 0 END) * 1048576) // count(*)
         |       AS BIGINT) AS recall_q
         |FROM ($annTopkSql) b
         |LEFT JOIN ($annIvfSql) i ON i.qid = b.qid AND i.nid = b.nid
         |GROUP BY b.qid""".stripMargin,
    // same cells/probe replay as ann_ivf, threshold instead of top-k
    "ann_radius" ->
      s"""$IvfCellsSqlPrefix,
         |qcells AS (SELECT vec_id AS qid, cell FROM assign WHERE vec_id < $NQueries AND rk <= $NProbe),
         |s AS (
         |  SELECT q.qid, c.nid, list_cosine_similarity(qe.emb, ne.emb) AS cos
         |  FROM qcells q JOIN cells c ON q.cell = c.cell AND c.nid <> q.qid
         |  JOIN e qe ON qe.vec_id = q.qid JOIN e ne ON ne.vec_id = c.nid)
         |SELECT qid, nid, round(cos, 4) AS cos
         |FROM s WHERE cos >= $RadiusTau""".stripMargin,
    // per-cell profile over the same cells/cents replay; spreads and
    // threshold-counts only (double mean would be order-sensitive)
    "cluster_stats" ->
      s"""$IvfCellsSqlPrefix,
         |s AS (
         |  SELECT cl.cell, list_cosine_similarity(e.emb, c.ce) AS cos
         |  FROM cells cl JOIN e ON e.vec_id = cl.nid
         |  JOIN cents c ON c.cell = cl.cell)
         |SELECT CAST(cell AS BIGINT) AS cell, count(*) AS n,
         |  round(min(cos), 4) AS min_cos, round(max(cos), 4) AS max_cos,
         |  CAST(sum(CASE WHEN cos < 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS n_loose
         |FROM s GROUP BY cell""".stripMargin,
    "embed_norm_stats" ->
      s"""WITH q AS (
         |  SELECT CAST(label AS BIGINT) AS label,
         |    list_sum(list_transform(
         |      list_transform(embedding,
         |        x -> CAST(floor(CAST(x AS DOUBLE) * $QScale.0) AS BIGINT)),
         |      y -> y * y)) AS nq
         |  FROM embeddings)
         |SELECT label, count(*) AS n,
         |  CAST(min(nq) AS BIGINT) AS min_nq, CAST(max(nq) AS BIGINT) AS max_nq,
         |  CAST(sum(CAST(nq AS HUGEINT)) // count(*) AS BIGINT) AS avg_nq
         |FROM q GROUP BY label""".stripMargin,
    // cluster-scoped candidates (cells), per-src top-k, reciprocity by
    // reversed-key self-join — the full mutual-kNN replay
    "mutual_knn" ->
      s"""$IvfCellsSqlPrefix,
         |cand AS (
         |  SELECT a.nid AS src, b.nid AS dst,
         |    list_cosine_similarity(ea.emb, eb.emb) AS cos
         |  FROM cells a JOIN cells b ON a.cell = b.cell AND a.nid <> b.nid
         |  JOIN e ea ON ea.vec_id = a.nid
         |  JOIN e eb ON eb.vec_id = b.nid),
         |tk AS (
         |  SELECT src, dst, cos,
         |    row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst ASC) AS rn
         |  FROM cand)
         |SELECT x.src AS vec_a, x.dst AS vec_b, round(x.cos, 4) AS cos
         |FROM tk x JOIN tk y
         |  ON x.src = y.dst AND x.dst = y.src AND y.rn <= $MutualK
         |WHERE x.rn <= $MutualK AND x.src < x.dst""".stripMargin,
    // the hyperplanes are just 96 fixed ±1 vectors — embed them as SQL
    // literals (exactly representable doubles) and DuckDB replays the
    // ENTIRE LSH operator: sign-bit keys per table, bucket-candidate
    // join, exact scoring, per-query top-k. The last rows-only ANN row
    // becomes hash-gated; sign flips would need a dot within ~1 ulp of
    // zero (never occurs on the fixture, and both engines accumulate
    // the same doubles).
    "ann_lsh" -> lshReplaySql(s"WHERE q.vec_id < $NQueries", K),
    // same replay, no query filter: EVERY vector ranks its bucket-mates
    "knn_join" -> lshReplaySql("", KnnK),
    "class_centroids" ->
      s"""WITH q AS (
         |  SELECT CAST(label AS BIGINT) AS label, d.d,
         |    CAST(floor(CAST(embedding[d.d + 1] AS DOUBLE) * $QScale.0) AS BIGINT) AS qv
         |  FROM embeddings CROSS JOIN (SELECT CAST(unnest(range($Dim)) AS BIGINT) AS d) d),
         |g AS (SELECT label, d, sum(CAST(qv AS HUGEINT)) AS sq, count(*) AS n
         |      FROM q GROUP BY 1, 2)
         |SELECT label, CAST(max(n) AS BIGINT) AS n_members,
         |  array_to_string(list(CAST(sq // n AS BIGINT) ORDER BY d), ',') AS centroid_q
         |FROM g GROUP BY label""".stripMargin,
    // the knn_join replay (verbatim, as a derived table) wrapped in
    // the vote / tie-break / judge pipeline
    "knn_classify" -> knnClassifySql,
    "knn_calibration" ->
      s"""SELECT n_votes, count(*) AS n_queries,
         |  CAST(sum(correct) AS BIGINT) AS n_correct,
         |  CAST((sum(correct) * 1048576) // count(*) AS BIGINT) AS acc_q
         |FROM ($knnClassifySql) b
         |GROUP BY n_votes""".stripMargin,
    "rank_fusion" -> rankFusionSql,
    "ann_graph" -> graphReplaySql)

  /** Brute-force cosine ranking replay — shared by `ann_topk` and the
    * `ann_recall` evaluator so the ground truth cannot drift. */
  private def annTopkSql: String =
    s"""WITH q AS (SELECT vec_id AS qid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe
       |           FROM embeddings WHERE vec_id < $NQueries),
       |c AS (SELECT vec_id AS nid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ne
       |      FROM embeddings),
       |s AS (SELECT qid, nid, list_cosine_similarity(qe, ne) AS cos FROM q, c WHERE qid <> nid),
       |r AS (SELECT qid, nid, cos,
       |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rnk
       |      FROM s)
       |SELECT qid, CAST(rnk AS BIGINT) AS rnk, nid, round(cos, 4) AS cos
       |FROM r WHERE rnk <= $K""".stripMargin

  // IVF is fully SQL-expressible because every piece is
  // deterministic: DuckDB replays seed-centroid selection, the
  // quantized-integer Lloyd mean update (floor onto the 2^-20
  // lattice → exact BIGINT sums → trunc-toward-zero division, all
  // bit-identical across engines), nearest-cell assignment (ties →
  // lower cell), nprobe probing, in-cell scoring, and per-query
  // top-k — the whole LEARNED operator is hash-gated, not just row
  // counts. Shared by `ann_ivf` and the `ann_recall` evaluator.
  private def annIvfSql: String =
    s"""$IvfCellsSqlPrefix,
       |qcells AS (SELECT vec_id AS qid, cell FROM assign WHERE vec_id < $NQueries AND rk <= $NProbe),
       |s AS (
       |  SELECT q.qid, c.nid, list_cosine_similarity(qe.emb, ne.emb) AS cos
       |  FROM qcells q JOIN cells c ON q.cell = c.cell AND c.nid <> q.qid
       |  JOIN e qe ON qe.vec_id = q.qid JOIN e ne ON ne.vec_id = c.nid),
       |r AS (SELECT qid, nid, cos,
       |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rnk
       |      FROM s)
       |SELECT qid, CAST(rnk AS BIGINT) AS rnk, nid, round(cos, 4) AS cos
       |FROM r WHERE rnk <= $K""".stripMargin

  /** The full kNN-classify replay (LSH candidate generation, vote
    * count, deterministic tie-broken pick, judged against the stored
    * label) — shared verbatim by `knn_classify` and the
    * `knn_calibration` rollup so both gate the identical classifier. */
  private def knnClassifySql: String =
    s"""WITH votes AS (
       |  SELECT knn.qid, CAST(l.label AS BIGINT) AS nlabel, count(*) AS n
       |  FROM (${lshReplaySql("", KnnK)}) knn
       |  JOIN embeddings l ON l.vec_id = knn.nid
       |  GROUP BY 1, 2),
       |pick AS (
       |  SELECT qid, nlabel AS pred_label, n AS n_votes FROM (
       |    SELECT *, row_number() OVER (PARTITION BY qid
       |      ORDER BY n DESC, nlabel ASC) AS rn
       |    FROM votes) t WHERE rn = 1)
       |SELECT p.qid, CAST(g.label AS BIGINT) AS true_label, p.pred_label,
       |  p.n_votes,
       |  CAST(CASE WHEN CAST(g.label AS BIGINT) = p.pred_label
       |       THEN 1 ELSE 0 END AS BIGINT) AS correct
       |FROM pick p JOIN embeddings g ON g.vec_id = p.qid""".stripMargin

  /** RRF fusion replay: the `ann_topk` cosine ranking and the
    * `mips_topk` lattice-dot ranking as CTEs, fused by the exact
    * integer 2²⁰ div (60 + rank) formula. */
  private def rankFusionSql: String =
    s"""WITH qd AS (SELECT vec_id AS qid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe
       |            FROM embeddings WHERE vec_id < $NQueries),
       |cd AS (SELECT vec_id AS nid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ne
       |       FROM embeddings),
       |cosr AS (SELECT qid, nid,
       |           row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rnk
       |         FROM (SELECT qid, nid, list_cosine_similarity(qe, ne) AS cos
       |               FROM qd, cd WHERE qid <> nid) s),
       |l AS (SELECT vec_id,
       |  list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * $QScale.0) AS BIGINT)) AS q
       |  FROM embeddings),
       |qq AS (SELECT vec_id AS qid, q AS qv FROM l WHERE vec_id < $NQueries),
       |dd AS (SELECT unnest(range($Dim)) AS i),
       |mip AS (SELECT qq.qid, l.vec_id AS nid,
       |          CAST(sum(qq.qv[dd.i + 1] * l.q[dd.i + 1]) AS BIGINT) AS dot
       |        FROM qq JOIN l ON l.vec_id <> qq.qid CROSS JOIN dd
       |        GROUP BY 1, 2),
       |mipr AS (SELECT qid, nid,
       |           row_number() OVER (PARTITION BY qid ORDER BY dot DESC, nid ASC) AS rnk
       |         FROM mip),
       |lists AS (SELECT qid, nid, rnk FROM cosr WHERE rnk <= $K
       |          UNION ALL SELECT qid, nid, rnk FROM mipr WHERE rnk <= $K),
       |fused AS (SELECT qid, nid,
       |            CAST(sum(1048576 // (60 + rnk)) AS BIGINT) AS rrf_q,
       |            count(*) AS n_lists
       |          FROM lists GROUP BY 1, 2),
       |r AS (SELECT *, row_number() OVER (PARTITION BY qid
       |        ORDER BY rrf_q DESC, nid ASC) AS rnk FROM fused)
       |SELECT qid, CAST(rnk AS BIGINT) AS rnk, nid, rrf_q, n_lists
       |FROM r WHERE rnk <= $K""".stripMargin

  /** `ann_index` shares `ann_ivfpq`'s full replay VERBATIM: the
    * persisted write→search round trip must land on the identical
    * result (same training, probing, ADC, rerank), so one oracle
    * gates both and they cannot drift apart (the simjoin_prefix ≡
    * dedup_ngram precedent). */
  val oracles: Map[String, String] =
    oraclesBase +
      ("ann_index" -> oraclesBase("ann_ivfpq")) +
      // incremental add: training restricted to the base 4/5 of the
      // corpus; assignment/search replayed over ALL vectors with the
      // base-trained artifacts — the add contract, hash-gated
      ("ann_index_add" ->
        ivfPqReplaySql("vec_id < (SELECT (4 * count(*)) // 5 FROM embeddings)"))

  /** Full DuckDB replay of the 16×6 sign-LSH pipeline (hyperplanes as
    * exact ±1.0 VALUES literals → sign-bit keys → bucket-mate
    * candidates → exact cosine → per-query rank), shared by the
    * `ann_lsh` and `knn_join` oracles so the two can't drift. */
  /** Full DuckDB replay of [[annGraph]]: LSH keys → bucket-mate
    * init → two NN-descent rounds → stride seeds → four beam hops →
    * exact top-K. Every CTE is `AS MATERIALIZED`: DuckDB inlines CTEs
    * by default and each NN-descent round references its predecessor
    * FOUR times, so the inlined plan re-derives the whole prefix per
    * reference — exponential in round count (measured: 240 s inlined
    * vs 0.9 s materialized at sf0.01, identical 50 rows). */
  private def graphReplaySql: String = {
    def ndRound(r: Int, prev: String): String =
      s"""cand$r AS MATERIALIZED (SELECT src, dst FROM $prev
         |  UNION SELECT a.src, b.dst FROM $prev a JOIN $prev b ON a.dst = b.src AND b.dst <> a.src
         |  UNION SELECT dst AS src, src AS dst FROM $prev
         |  UNION SELECT a.dst AS src, b.dst AS dst FROM $prev a JOIN $prev b ON a.src = b.src AND a.dst <> b.dst),
         |s$r AS MATERIALIZED (SELECT src, dst, list_cosine_similarity(se.emb, de.emb) AS cos
         |  FROM cand$r JOIN e se ON se.vec_id = src JOIN e de ON de.vec_id = dst),
         |e$r AS MATERIALIZED (SELECT src, dst FROM (
         |    SELECT src, dst, row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst ASC) AS rn
         |    FROM s$r) t WHERE rn <= $GraphDeg),""".stripMargin
    def hop(h: Int, prev: String, g: String): String =
      s"""c$h AS MATERIALIZED (SELECT qid, nid FROM $prev
         |  UNION SELECT $prev.qid, g.dst AS nid FROM $prev JOIN $g g ON g.src = $prev.nid),
         |b$h AS MATERIALIZED (SELECT qid, nid FROM (
         |    SELECT c.qid, c.nid,
         |      row_number() OVER (PARTITION BY c.qid
         |        ORDER BY list_cosine_similarity(qq.qe, ne.emb) DESC, c.nid ASC) AS rn
         |    FROM c$h c JOIN q qq ON qq.qid = c.qid JOIN e ne ON ne.vec_id = c.nid
         |    WHERE c.qid <> c.nid) t WHERE rn <= $BeamWidth),""".stripMargin
    s"""WITH planes(t, j, p) AS MATERIALIZED (VALUES $planesLiteral),
       |e AS MATERIALIZED (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
       |  FROM embeddings),
       |bits AS MATERIALIZED (SELECT e.vec_id, pl.t, pl.j,
       |    CASE WHEN list_inner_product(e.emb, pl.p) >= 0 THEN 1 << pl.j ELSE 0 END AS bit
       |  FROM e CROSS JOIN planes pl),
       |keys AS MATERIALIZED (SELECT vec_id, t, CAST(sum(bit) AS BIGINT) AS key FROM bits GROUP BY 1, 2),
       |cand0 AS MATERIALIZED (SELECT DISTINCT a.vec_id AS src, b.vec_id AS dst
       |  FROM keys a JOIN keys b ON a.t = b.t AND a.key = b.key AND b.vec_id <> a.vec_id),
       |s0 AS MATERIALIZED (SELECT src, dst, list_cosine_similarity(se.emb, de.emb) AS cos
       |  FROM cand0 JOIN e se ON se.vec_id = src JOIN e de ON de.vec_id = dst),
       |e0 AS MATERIALIZED (SELECT src, dst FROM (
       |    SELECT src, dst, row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst ASC) AS rn
       |    FROM s0) t WHERE rn <= $GraphDeg),
       |${ndRound(1, "e0")}
       |${ndRound(2, "e1")}
       |q AS MATERIALIZED (SELECT vec_id AS qid, emb AS qe FROM e WHERE vec_id < $NQueries),
       |seeds AS MATERIALIZED (SELECT vec_id AS nid FROM e WHERE vec_id % $SeedStride = 0),
       |b0 AS MATERIALIZED (SELECT qid, nid FROM (
       |    SELECT qq.qid, s.nid,
       |      row_number() OVER (PARTITION BY qq.qid
       |        ORDER BY list_cosine_similarity(qq.qe, ne.emb) DESC, s.nid ASC) AS rn
       |    FROM q qq CROSS JOIN seeds s JOIN e ne ON ne.vec_id = s.nid
       |    WHERE qq.qid <> s.nid) t WHERE rn <= $BeamWidth),
       |${hop(1, "b0", "e2")}
       |${hop(2, "b1", "e2")}
       |${hop(3, "b2", "e2")}
       |cf AS MATERIALIZED (SELECT qid, nid FROM b3
       |  UNION SELECT b3.qid, g.dst AS nid FROM b3 JOIN e2 g ON g.src = b3.nid),
       |sfin AS MATERIALIZED (SELECT c.qid, c.nid, list_cosine_similarity(qq.qe, ne.emb) AS cos
       |  FROM cf c JOIN q qq ON qq.qid = c.qid JOIN e ne ON ne.vec_id = c.nid
       |  WHERE c.qid <> c.nid),
       |r AS (SELECT qid, nid, cos,
       |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rnk FROM sfin)
       |SELECT qid, CAST(rnk AS BIGINT) AS rnk, nid, round(cos, 4) AS cos
       |FROM r WHERE rnk <= $K""".stripMargin
  }

  /** The 16×6 hyperplane set as an exact DuckDB VALUES literal —
    * shared by every LSH-replaying oracle. */
  private def planesLiteral: String =
    planes.zipWithIndex.map { case (p, i) =>
      s"(${i / BitsPerTable},${i % BitsPerTable},[${p.map(v => if (v > 0) "1.0" else "-1.0").mkString(",")}])"
    }.mkString(",")

  private def lshReplaySql(qFilter: String, k: Int): String = {
    val planeRows = planesLiteral
    s"""WITH planes(t, j, p) AS (VALUES $planeRows),
       |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
       |      FROM embeddings),
       |bits AS (
       |  SELECT e.vec_id, pl.t, pl.j,
       |    CASE WHEN list_inner_product(e.emb, pl.p) >= 0 THEN 1 << pl.j ELSE 0 END AS bit
       |  FROM e CROSS JOIN planes pl),
       |keys AS (SELECT vec_id, t, CAST(sum(bit) AS BIGINT) AS key FROM bits GROUP BY 1, 2),
       |cands AS (
       |  SELECT DISTINCT q.vec_id AS qid, c.vec_id AS nid
       |  FROM keys q JOIN keys c ON q.t = c.t AND q.key = c.key AND c.vec_id <> q.vec_id
       |  $qFilter),
       |s AS (
       |  SELECT qid, nid, list_cosine_similarity(qe.emb, ne.emb) AS cos
       |  FROM cands JOIN e qe ON qe.vec_id = qid JOIN e ne ON ne.vec_id = nid),
       |r AS (SELECT qid, nid, cos,
       |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rnk
       |      FROM s)
       |SELECT qid, CAST(rnk AS BIGINT) AS rnk, nid, round(cos, 4) AS cos
       |FROM r WHERE rnk <= $k""".stripMargin
  }
}
