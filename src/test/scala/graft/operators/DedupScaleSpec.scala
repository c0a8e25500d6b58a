package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions.cosine_sim

/** Executes the sub-quadratic near-dup regime the PLANS.md caveat
  * used to only document: at real near-dup thresholds (τ ≥ 0.8) on a
  * clustered corpus, sign-LSH banding with few-tables × long-keys
  * prunes the candidate set to a vanishing fraction of all pairs
  * while losing nothing — the claim that makes LSH dedup viable at
  * 100 TB, asserted here as a counted property rather than prose.
  *
  * The planted corpus is deterministic (SplitMix64-derived unit
  * vectors): `NClusters` clusters of `ClusterSize` members whose
  * pairwise cosine is ≥ 0.99 (true near-dups: small edits of one
  * base), plus unclustered singles whose pairwise cosines sit near 0
  * (64-dim quasi-orthogonality). So ground truth is by construction:
  * the within-cluster pairs and nothing else.
  */
class DedupScaleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val Dim = 64
  private val NClusters = 40
  private val ClusterSize = 3
  private val NSingles = 280
  private val N = NClusters * ClusterSize + NSingles // 400

  private def mix(seed: Long): Long = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Uniform(-0.5, 0.5)^Dim from a seed, L2-normalized. */
  private def unitVec(seed: Long): Array[Float] = {
    val raw = Array.tabulate(Dim)(i => (mix(seed * 1024L + i) >>> 11).toDouble / (1L << 53) - 0.5)
    val norm = math.sqrt(raw.map(x => x * x).sum)
    raw.map(x => (x / norm).toFloat)
  }

  /** base + eps·noise, renormalized: cos(base, out) ≈ 1/√(1+eps²). */
  private def perturb(base: Array[Float], seed: Long, eps: Double): Array[Float] = {
    val noise = unitVec(seed)
    val raw = base.zip(noise).map { case (b, n) => b + eps * n }
    val norm = math.sqrt(raw.map(x => x * x).sum)
    raw.map(x => (x / norm).toFloat)
  }

  // ids 0..119: cluster c member j = id c*ClusterSize+j; 120..399: singles
  private def planted: Seq[(Long, Array[Float])] = {
    val clustered = for {
      c <- 0 until NClusters
      j <- 0 until ClusterSize
    } yield {
      val base = unitVec(7000L + c)
      val v = if (j == 0) base else perturb(base, 9000L + c * 31L + j, 0.04)
      ((c * ClusterSize + j).toLong, v)
    }
    val singles = (0 until NSingles).map(i =>
      ((NClusters * ClusterSize + i).toLong, unitVec(50000L + i)))
    clustered ++ singles
  }

  private def truePairs: Set[(Long, Long)] =
    (for {
      c <- 0 until NClusters
      i <- 0 until ClusterSize
      j <- (i + 1) until ClusterSize
    } yield ((c * ClusterSize + i).toLong, (c * ClusterSize + j).toLong)).toSet

  test("τ≥0.8 banding is sub-quadratic on a clustered corpus and loses no pair") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val emb = planted.toDF("vec_id", "embedding")

    // sanity on the plant itself: clusters are ≥0.99-cosine near-dups,
    // and a sample of cross pairs sits well below τ
    val byId = planted.toMap
    truePairs.foreach { case (a, b) =>
      val cos = byId(a).zip(byId(b)).map { case (x, y) => x.toDouble * y }.sum
      assert(cos >= 0.99, s"planted pair ($a,$b) cos $cos")
    }
    (0 until 50).foreach { i =>
      val (a, b) = (mix(i).abs % N, mix(i * 7L + 3).abs % N)
      if (a / ClusterSize != b / ClusterSize || a >= NClusters * ClusterSize) {
        val cos = byId(a.toLong).zip(byId(b.toLong)).map { case (x, y) => x.toDouble * y }.sum
        assert(cos < 0.8, s"cross pair ($a,$b) cos $cos contaminates ground truth")
      }
    }

    // few tables × long keys: the τ≥0.8 operating point
    val cands = Dedup.embeddingCandidatesOf(emb, nTables = 8, bits = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val allPairs = N.toLong * (N - 1) / 2 // 79 800

    // zero lost pairs: every true near-dup pair is a candidate
    assert(truePairs.subsetOf(cands),
      s"banding lost ${truePairs.diff(cands).size} of ${truePairs.size} true pairs")
    // sub-quadratic: candidates are a vanishing fraction of all pairs
    // (measured: ~${truePairs.size} true + a handful of random collisions)
    assert(cands.size.toLong <= allPairs / 50,
      s"candidate volume ${cands.size} not ≪ n²/2 = $allPairs")
    info(s"candidates ${cands.size} of $allPairs pairs (${cands.size * 100.0 / allPairs}%)")

    // end-to-end: the SHIPPED τ≥0.8 operator (dedupEmbeddingTightOn —
    // library surface, unregistered because every driver fixture has
    // zero cos ≥ 0.8 pairs) recovers EXACTLY the planted clusters —
    // this test IS its behavioral gate
    val verified = Dedup.dedupEmbeddingTightOn(emb)
      .select(col("vec_a"), col("vec_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified === truePairs)
  }

  test("registered planted tight gate: brute-force recall floors hold at every SF") {
    import org.apache.spark.sql.functions._
    // the r18 registry entry (dedup_embedding_tight) runs the 8×16
    // τ≥0.8 pipeline over the in-query planted corpus; this is the
    // VERDICT-r17 "recall vs brute force executed per SF" gate. The
    // corpus is deterministic, so the floors are pins, not bounds on
    // randomness: exact duplicates are found ALWAYS (identical
    // vectors ⇒ identical sign keys), the cos≥0.99 mass is the
    // operating point's near-lossless regime, and the just-above-
    // threshold tail is honestly approximate.
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val corpus = Dedup.embPlantedTight(spark, dir)
      val bruteRows = corpus.as("a")
        .join(corpus.as("b"), col("a.vec_id") < col("b.vec_id"))
        .withColumn("cos", cosine_sim(col("a.embedding"), col("b.embedding")))
        .filter(col("cos") >= 0.8)
        .select(col("a.vec_id"), col("b.vec_id"), col("cos"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val out = Dedup.dedupEmbeddingTightPlanted(spark, dir)
        .select(col("vec_a"), col("vec_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // exact cosine confirm ⇒ zero false positives
      assert(out.subsetOf(bruteRows.keySet),
        s"$dir: output contains non-near-dup pairs ${out.diff(bruteRows.keySet).take(3)}")
      // every m=0 planted copy (vec_id % 16 == 0) pairs with its
      // original at cos 1.0 and MUST be found — identical keys
      val exactDups = bruteRows.keySet.filter { case (a, b) =>
        b == a + Dedup.PlantStride && a % 16 == 0 }
      assert(exactDups.nonEmpty && exactDups.subsetOf(out),
        s"$dir: missed exact duplicates ${exactDups.diff(out).take(3)}")
      def recall(floor: Double): Double = {
        val mass = bruteRows.filter(_._2 >= floor).keySet
        out.intersect(mass).size.toDouble / mass.size
      }
      val (r99, r95, rAll) = (recall(0.99), recall(0.95), recall(0.0))
      info(f"$dir recall: cos≥0.99 $r99%.3f, cos≥0.95 $r95%.3f, " +
        f"overall $rAll%.3f (${out.size}/${bruteRows.size})")
      assert(r99 >= 0.98, s"$dir: cos≥0.99 recall $r99 below the near-lossless floor")
      assert(r95 >= 0.90, s"$dir: cos≥0.95 recall $r95")
      assert(rAll >= 0.70, s"$dir: overall recall $rAll")
      graft.CacheScope.release()
    }
  }

  test("prefix-filtered set-similarity join is lossless and sub-quadratic on the fixture") {
    val dir = "/root/testdata/sf0.001"
    // lossless: bit-identical output to the exact all-pairs join —
    // the prefix lemma at τ=4/5 plus the integer length filter
    val exact = Dedup.dedupNgramJaccard(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val pf = Dedup.simjoinPrefix(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact.nonEmpty && pf === exact)
    // sub-quadratic: rarest-first prefixes index far fewer candidate
    // pairs than the n²/2 a naive all-pairs pass would score
    val nDocs = graft.sources.Tables.documents(spark, dir).count()
    val cands = Dedup.simjoinPrefixCandidates(spark, dir).count()
    val allPairs = nDocs * (nDocs - 1) / 2
    assert(cands <= allPairs / 50,
      s"prefix candidates $cands not ≪ n²/2 = $allPairs")
    info(s"prefix candidates $cands of $allPairs pairs (${cands * 100.0 / allPairs}%)")
    graft.CacheScope.release()
  }

  test("pigeonhole edit-distance join is lossless and sub-quadratic on the fixture") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), Dedup.fuzzyKey(col("text")).as("t"))
    // lossless: identical to the naive quadratic join (the pigeonhole
    // partition lemma, executed rather than cited)
    val naive = docs.as("a")
      .join(docs.as("b"), col("a.doc_id") < col("b.doc_id"))
      .withColumn("dist", levenshtein(col("a.t"), col("b.t")).cast("long"))
      .filter(col("dist") <= Dedup.FuzzyK)
      .select(col("a.doc_id"), col("b.doc_id"), col("dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val fuzzy = Dedup.dedupFuzzy(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(naive.nonEmpty && fuzzy === naive)
    // sub-quadratic: the segment filter indexes far fewer candidate
    // pairs than the n²/2 the naive join scores
    val nDocs = docs.count()
    val cands = Dedup.dedupFuzzyCandidates(spark, dir).count()
    val allPairs = nDocs * (nDocs - 1) / 2
    assert(cands <= allPairs / 50,
      s"pigeonhole candidates $cands not ≪ n²/2 = $allPairs")
    info(s"fuzzy candidates $cands of $allPairs pairs " +
      f"(${cands * 100.0 / allPairs}%.2f%%), ${naive.size} true pairs")
  }

  test("fuzzy hot-gram cap: boilerplate prefixes stay linear, cold pairs keep full recall") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // planted corpus (r16 ScaleLab finding executed in CI): 1,200
    // docs share segment 0 verbatim ("headerpr") but diverge beyond
    // repair inside the 32-char window (per-doc hex spelled into the
    // later segments), so every cross-pair is > FuzzyK edits — the
    // uncapped segment join would emit ~m²/2 ≈ 719k WASTED candidate
    // pairs from that one hot bucket. Beside them, 6 cold true
    // near-dup pairs (1-char edits) that must survive the cap.
    val hot = (0L until 1200L).map { i =>
      // 24 deterministic hex chars: segments 1–3 are unique per doc
      // (df 1), pairwise distance ≫ FuzzyK — segment 0 is the ONLY
      // hot gram and no hot pair is a true near-dup
      val tail = f"${mix(i)}%016x".take(12) + f"${mix(i + 7777L)}%016x".take(12)
      (i, s"headerpr $tail")
    }
    val cold = (0 until 6).flatMap { j =>
      val base = s"coldpair$j distinct body $j text number ${j}xx"
      Seq((2000L + 2 * j, base), (2001L + 2 * j, base.replace("xx", "xy")))
    }
    val docs = (hot ++ cold).toDF("doc_id", "text")
    val capped = Dedup.dedupFuzzyCandidatesOn(docs).count()
    // linear bound: cap × (2K+1) × NSeg × n, nowhere near m²/2
    assert(capped < 50000, s"capped candidates $capped should stay ≪ 719k hot pairs")
    // recall: the cold true pairs all survive, and equal the naive truth
    val keyed = docs.select(col("doc_id"), Dedup.fuzzyKey(col("text")).as("t"))
    val naive = keyed.as("a")
      .join(keyed.as("b"), col("a.doc_id") < col("b.doc_id"))
      .filter(levenshtein(col("a.t"), col("b.t")) <= Dedup.FuzzyK)
      .select(col("a.doc_id"), col("b.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val foundDf = Dedup.dedupFuzzyOn(docs)
    val found = foundDf
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.size >= 6 && found === naive,
      s"capped fuzzy must keep full recall on sub-cap pairs (${found.size} vs ${naive.size})")
    // the cap-engagement signal (ADVICE r16): the observed metric
    // reports the hot list is non-empty — exactly the one planted
    // boilerplate gram — with no extra job
    val hotGrams = foundDf.queryExecution.observedMetrics
      .get("fuzzy_hot_grams").map(_.getLong(0))
    assert(hotGrams.contains(1L),
      s"fuzzy_hot_grams observed metric should report 1 hot gram, got $hotGrams")
    info(s"capped candidates $capped; true pairs ${naive.size}, all found; " +
      s"fuzzy_hot_grams metric = ${hotGrams.orNull}")
  }

  test("the fixture operating point (32×4) still finds every fixture pair after the refactor") {
    // the candidate generator was factored out of dedupEmbedding; its
    // equality against the all-pairs exact truth is re-asserted in
    // PipelineOpsSpec — here just pin that the parameterization
    // reproduces the original pair set on the real fixture
    val dir = "/root/testdata/sf0.001"
    val lsh = Dedup.dedupEmbedding(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.dedupEmbeddingExact(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty && lsh === exact)
  }
}
