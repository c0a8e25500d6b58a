package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Property-style checks for the packing layout on synthetic corpora
  * the fixture never produces: unicode text, zero-token docs, skewed
  * document sizes, adversarial id ordering. The layout invariants must
  * hold for ANY input, not just the fixture distribution. */
class CorpusPropsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  import spark.implicits._

  private val SeqLen = 2048L

  private def layoutInvariants(rows: Array[(Long, Long, Long, Long, Long)]): Unit = {
    rows.groupBy(_._2).foreach { case (shard, docs) =>
      val inOrder = docs.sortBy(_._1)
      var cum = 0L
      inOrder.foreach { case (id, _, n, seq, off) =>
        assert(seq === cum / SeqLen, s"shard $shard doc $id seq")
        assert(off === cum % SeqLen, s"shard $shard doc $id offset")
        cum += n
      }
    }
  }

  // the layout metric is the BPE count — that's what the cumsum runs on
  private def pack(docs: Seq[(Long, String)]): Array[(Long, Long, Long, Long, Long)] =
    Corpus.packSequencesOf(docs.toDF("doc_id", "text"))
      .select("doc_id", "shard", "n_bpe_tokens", "seq_id", "seq_offset")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

  test("layout holds on random skewed corpora across three seeds") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val docs = (0L until 200L).map { id =>
        // skewed sizes: most docs tiny, a few far beyond SeqLen tokens
        val n = if (rnd.nextInt(10) == 0) 3000 + rnd.nextInt(2000) else rnd.nextInt(40)
        id -> Seq.fill(n)(s"w${rnd.nextInt(50)}").mkString(" ")
      }
      val rows = pack(docs)
      assert(rows.length === docs.length, "every doc appears exactly once")
      layoutInvariants(rows)
      // docs longer than one sequence still get a single start slot
      assert(rows.exists(_._3 > SeqLen), s"seed $seed should include giant docs")
    }
  }

  test("zero-token and unicode docs occupy zero width but keep their slot") {
    val docs = Seq(
      1L -> "normal words here",
      2L -> "",                      // no tokens
      3L -> "日本語テキストのみ",        // tokenizes to nothing (non-ASCII)
      4L -> "tail words after the empties")
    val rows = pack(docs)
    assert(rows.length === 4, "zero-token docs still receive a layout row")
    rows.filter(r => r._1 == 2L || r._1 == 3L).foreach { r =>
      assert(r._3 === 0L, s"doc ${r._1} must count zero tokens")
    }
    layoutInvariants(rows)
  }

  test("layout is insensitive to input partitioning and row order") {
    val rnd = new scala.util.Random(99)
    val docs = (0L until 120L).map(id => id -> Seq.fill(rnd.nextInt(60))("tok").mkString(" "))
    val a = pack(docs).sortBy(_._1)
    val b = Corpus.packSequencesOf(
      scala.util.Random.shuffle(docs).toDF("doc_id", "text").repartition(7))
      .select("doc_id", "shard", "n_bpe_tokens", "seq_id", "seq_offset")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(a === b)
  }
}
