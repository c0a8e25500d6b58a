package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Invariant specs for the corpus-assembly operators (Corpus.scala)
  * and the near-dup clustering step (Dedup.dedupCluster). The DuckDB
  * oracle gate checks exact values; these assert the semantic
  * contracts directly (union-find ground truth, packing invariants,
  * split hygiene, sample/shard bounds) plus partition stability.
  */
class CorpusSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("dedup_cluster labels equal driver-side union-find on the exact pairs") {
    val pairs = Dedup.dedupNgramJaccard(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture should contain planted near-dups")
    // tiny reference union-find over the collected pairs
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val expected = nodes.map(n => n -> find(n)).toMap
    val got = Dedup.dedupCluster(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
    // sizes consistent with the labeling
    val sizes = Dedup.dedupCluster(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val bySize = expected.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    sizes.foreach { case (_, cid, sz) => assert(sz === bySize(cid)) }
  }

  test("propagateMinLabels converges in O(log n) rounds on a planted 64-chain") {
    import spark.implicits._
    // worst case for plain label propagation: a single path graph
    // 1000—1001—…—1063 needs 63 propagation rounds without pointer
    // doubling; with the hop shortcut the label's remaining travel
    // distance halves per round, so ≤ log2(64)+2 rounds suffice
    val chain = (1000L until 1063L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val (labels, rounds) = Dedup.propagateMinLabels(chain)
    assert(rounds <= 8, s"pointer doubling should bound rounds at log2(n)+2, got $rounds")
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet === (1000L to 1063L).toSet)
    assert(got.values.forall(_ == 1000L), "every chain node must label to the min id")
  }

  test("propagateMinLabels matches union-find on random pair graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 40 + trial * 20
      val pairs = Seq.fill(n)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => if (a < b) (a, b) else (b, a) }.distinct
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val expected = pairs.flatMap(p => Seq(p._1, p._2)).distinct
        .map(x => x -> find(x)).toMap
      val (labels, _) = Dedup.propagateMinLabels(pairs.toDF("doc_a", "doc_b"))
      val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"trial $trial")
    }
  }

  test("ccStarContraction equals propagateMinLabels on chains, cliques, and random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val shapes: Seq[(String, Seq[(Long, Long)])] = Seq(
      "chain64" -> (2000L until 2063L).map(i => (i, i + 1)),
      "clique8" -> (for { a <- 3000L until 3008L; b <- (a + 1) until 3008L } yield (a, b)),
      "twoComps" -> Seq((1L, 2L), (2L, 3L), (10L, 11L)),
      "random" -> Seq.fill(80)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
        .filter { case (a, b) => a != b }.distinct)
    shapes.foreach { case (name, pairs) =>
      val df = pairs.toDF("doc_a", "doc_b")
      val (star, starRounds) = Dedup.ccStarContraction(df)
      val (prop, _) = Dedup.propagateMinLabels(df)
      val a = star.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val b = prop.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(a === b, s"$name: star contraction disagrees with label propagation")
      assert(starRounds <= 12, s"$name: $starRounds rounds is not O(log n)")
    }
  }

  test("dedup_cluster is stable across partitioning") {
    val a = Dedup.dedupCluster(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try {
      val b = Dedup.dedupCluster(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      assert(a === b)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("pack_sequences lays out a gapless token stream per shard") {
    val rows = Corpus.packSequences(spark, dir)
      .select("doc_id", "shard", "n_bpe_tokens", "seq_id", "seq_offset").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (_, docs) =>
      val inOrder = docs.sortBy(_._1)
      var cum = 0L
      inOrder.foreach { case (id, _, n, seq, off) =>
        assert(seq === cum / 2048, s"doc $id seq")
        assert(off === cum % 2048, s"doc $id offset")
        cum += n
      }
    }
    // every document is packed exactly once
    val nDocs = graft.sources.Tables.documents(spark, dir).count()
    assert(rows.map(_._1).distinct.length.toLong === nDocs)
  }

  test("contamination reports only test-split docs with sane overlap counts") {
    val split = TextAnalysis.docSplit(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val rows = Corpus.contamination(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty, "synthetic corpus shares common trigrams across splits")
    rows.foreach { case (id, nSh, nShared, ratio) =>
      assert(split(id) === "test", s"doc $id is ${split(id)}")
      assert(nShared >= 1L && nShared <= nSh)
      assert(math.abs(ratio - nShared.toDouble / nSh) < 1e-12)
    }
  }

  test("sample_per_key takes at most k docs per language, deterministically") {
    val rows = Corpus.samplePerKey(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (lang, docs) =>
      assert(docs.length <= 20, s"$lang oversampled: ${docs.length}")
      assert(docs.map(_._3).sorted === (1L to docs.length).toArray, s"$lang ranks")
    }
    val again = Corpus.samplePerKey(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    assert(rows.sortBy(_._1) === again.sortBy(_._1))
  }

  test("mix_weights computes a consistent half-budget equal-share mixture") {
    val rows = Corpus.mixWeights(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    val total = rows.map(_._3).sum
    val budgetPerLang = total * 0.5 / rows.length
    rows.foreach { case (lang, nDocs, nTok, nBpe, rate, exp) =>
      assert(nDocs > 0 && nTok > 0)
      // every word is ≥ 1 subword, so the BPE total dominates words
      assert(nBpe >= nTok, s"$lang bpe $nBpe < words $nTok")
      assert(rate > 0.0 && rate <= 1.0, s"$lang rate $rate")
      assert(math.abs(exp - rate * nTok) < 1e-6)
      // a stratum under its budget is kept whole; one over is scaled to it
      if (nTok <= budgetPerLang) assert(rate === 1.0, s"$lang under budget but rate $rate")
      else assert(math.abs(exp - budgetPerLang) < 1e-6, s"$lang exp $exp vs budget $budgetPerLang")
    }
  }

  test("curriculum phases are balanced per language and quality-ordered") {
    val rows = Corpus.corpusCurriculum(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (lang, docs) =>
      val byPhase = docs.groupBy(_._4).view.mapValues(_.length).toMap
      assert(byPhase.keySet.subsetOf(Set(1L, 2L, 3L)), s"$lang phases $byPhase")
      // ntile balance: sizes differ by at most 1
      assert(byPhase.values.max - byPhase.values.min <= 1, s"$lang sizes $byPhase")
      // quality ordering: every phase-1 key >= every phase-3 key
      val p1min = docs.filter(_._4 == 1L).map(_._3).min
      val p3max = docs.filter(_._4 == 3L).map(_._3).max
      assert(p1min >= p3max, s"$lang: phase-1 min $p1min < phase-3 max $p3max")
    }
  }

  test("span_corrupt plans non-overlapping in-bounds spans at sane density") {
    val nTok = TextAnalysis.textQuality(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap // n_tokens = toksOf, same tokenizer
    val spans = Corpus.spanCorrupt(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(spans.nonEmpty)
    spans.groupBy(_._1).foreach { case (doc, ss) =>
      val n = nTok(doc)
      val sorted = ss.sortBy(_._3)
      sorted.foreach { case (_, _, start, len) =>
        assert(len >= 1 && start >= 0 && start + len <= n, s"doc $doc span out of bounds")
      }
      sorted.sliding(2).foreach {
        case Array((_, _, s1, l1), (_, _, s2, _)) =>
          assert(s1 + l1 <= s2, s"doc $doc spans overlap: $s1+$l1 > $s2")
        case _ => ()
      }
      // one window per 8 tokens, span ≤ 3 ⇒ density → 3/8
      // asymptotically; a clipped final partial window can push a
      // short doc higher (n=9 worst case: 4/9 ≈ 0.44) — bound at 1/2
      val masked = ss.map(_._4).sum.toDouble / n
      assert(masked > 0.0 && masked <= 0.5, s"doc $doc density $masked")
    }
  }

  test("tfidf_topk ranks distinctive terms first with sane bounds") {
    val rows = Corpus.tfidfTopk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (doc, terms) =>
      assert(terms.length <= 5, s"doc $doc has ${terms.length} terms")
      val byRank = terms.sortBy(_._6)
      assert(byRank.map(_._6) === (1L to terms.length).toArray)
      // scores weakly decrease with rank (ties broken by token asc)
      byRank.sliding(2).foreach {
        case Array(a, b) => assert(a._5 >= b._5, s"doc $doc rank order")
        case _ =>
      }
    }
    // every score is tf * (N+1)/(df+1)
    val n = graft.sources.Tables.documents(spark, dir).count()
    rows.foreach { case (_, _, tf, df, score, _) =>
      assert(math.abs(score - tf * ((n + 1.0) / (df + 1.0))) < 1e-9)
    }
  }

  test("shuffle_export assigns dense 0-based positions within every shard") {
    val rows = Corpus.shuffleExport(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nDocs = graft.sources.Tables.documents(spark, dir).count()
    assert(rows.length.toLong === nDocs)
    rows.groupBy(_._2).foreach { case (shard, docs) =>
      assert(docs.map(_._3).sorted === (0L until docs.length).toArray,
        s"shard $shard positions not dense")
    }
  }

  test("writeShuffleShards emits one pre-sorted parquet file per shard") {
    // fixed path + overwrite mode: a fresh temp dir per run would
    // accumulate a corpus copy in /tmp on every test invocation
    val out = new java.io.File(
      System.getProperty("java.io.tmpdir"), "graft_shards_spec").toString
    Corpus.writeShuffleShards(spark, dir, out)
    val shardDirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(shardDirs.nonEmpty)
    val expected = Corpus.shuffleExport(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._2)
    assert(shardDirs.length === expected.size, "one directory per non-empty shard")
    var seenDocs = 0L
    shardDirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length === 1,
        s"${d.getName}: a shard must land whole in one task => one file, got ${files.length}")
      val shardId = d.getName.stripPrefix("shard=").toLong
      // read the single file WITHOUT any sort: physical row order is
      // the contract — a data-loader streams the file as-is
      val inFileOrder = spark.read.parquet(files.head.getPath)
        .select("pos", "doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(inFileOrder.map(_._1).toSeq === (0L until inFileOrder.length).toSeq,
        s"shard $shardId rows not in position order")
      val want = expected(shardId).sortBy(_._3).map(r => (r._3, r._1)).toSeq
      assert(inFileOrder.toSeq === want, s"shard $shardId doc order mismatch")
      seenDocs += inFileOrder.length
    }
    assert(seenDocs === graft.sources.Tables.documents(spark, dir).count())
  }
}
