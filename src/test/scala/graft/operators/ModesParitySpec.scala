package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

import graft.CacheScope

/** CI parity gate for every iterative-operator state-strategy knob.
  *
  * The r15 "ckpt" decisions (BfsMode, SsspMode, KcoreMode, HitsMode,
  * TrussMode, GraphStateMode) were each chosen by a lab whose FIRST
  * step asserts exceptAll-parity between modes — but labs are
  * manual. This spec pins the same invariant in CI at sf0.001: every
  * mode of every knobbed core returns the multiset-identical
  * relation, so a future edit to one branch of a mode match cannot
  * silently fork semantics. (The labs remain the TIMING authority;
  * this spec is correctness only.)
  */
class ModesParitySpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def assertParity(label: String)(build: String => DataFrame,
      modes: Seq[String]): Unit = {
    val ref = build(modes.head)
    modes.tail.foreach { m =>
      val cand = build(m)
      val d1 = ref.exceptAll(cand).count()
      val d2 = cand.exceptAll(ref).count()
      assert(d1 == 0 && d2 == 0,
        s"$label: mode '$m' diverges from '${modes.head}' ($d1/$d2 rows)")
    }
    CacheScope.release(blocking = true)
  }

  test("bfsDistances: legacy / ckpt / frontier agree; unknown mode throws") {
    import spark.implicits._
    // chain 1-2-3-4-5 plus an off-chain island {9,10}: exercises the
    // frontier mode's settled-set anti-join (multi-path re-discovery)
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (9L, 10L))
    val edges = (und ++ und.map(_.swap)).toDF("u", "v")
    val seeds = Seq((1L, 0L)).toDF("id", "d")
    assertParity("bfs")(m => Graph.bfsDistances(edges, seeds, rounds = 3, mode = m),
      Seq("legacy", "ckpt", "frontier"))
    intercept[IllegalArgumentException] {
      Graph.bfsDistances(edges, seeds, rounds = 1, mode = "nope")
    }
  }

  test("ssspOn: legacy / ckpt / delta agree; unknown mode throws") {
    import spark.implicits._
    // weighted diamond where the 2-hop path (1-2-4, cost 3) beats the
    // direct edge (1-4, cost 10): a later round must IMPROVE a
    // settled vertex — the case that makes the frontier shortcut
    // unsound for weights and exercises delta's min-merge
    val und = Seq((1L, 2L, 1L), (2L, 4L, 2L), (1L, 4L, 10L), (4L, 5L, 1L))
    val edges = (und ++ und.map(t => (t._2, t._1, t._3))).toDF("u", "v", "w")
    val seeds = Seq(1L).toDF("id")
    assertParity("sssp")(m => Graph.ssspOn(edges, seeds, mode = m),
      Seq("legacy", "ckpt", "delta"))
    intercept[IllegalArgumentException] {
      Graph.ssspOn(edges, seeds, mode = "nope")
    }
  }

  test("kcoreOn: legacy / ckpt / decl agree on the fixture graph; unknown mode throws") {
    assertParity("kcore")(m => Graph.kcoreOn(Graph.purchaseEdges(spark, dir), mode = m),
      Seq("legacy", "ckpt", "decl"))
    intercept[IllegalArgumentException] {
      Graph.kcoreOn(Graph.purchaseEdges(spark, dir), mode = "nope")
    }
  }

  test("hitsOn: persist / ckpt agree on a planted star; unknown mode throws") {
    import spark.implicits._
    val edges = Seq((1L, 100L), (2L, 100L), (3L, 100L), (1L, 200L)).toDF("c", "s")
    assertParity("hits")(m => Graph.hitsOn(edges, m), Seq("persist", "ckpt"))
    // ADVICE r15: hits was the one knob whose match silently fell
    // back to persist on a typo'd mode — pin the throw like the rest
    intercept[IllegalArgumentException] {
      Graph.hitsOn(edges, "nope").count()
    }
  }

  test("StateMode: default deployment is ckpt and cut() truncates lineage") {
    import spark.implicits._
    // the resolved value must always be one of the legal three —
    // this holds under any supported override
    assert(Set(graft.StateMode.Ckpt, graft.StateMode.Persist,
      graft.StateMode.Reliable)(graft.StateMode.deployment))
    // the ckpt-specific assertions pin the DEFAULT deployment; a run
    // under a legitimate GRAFT_STATE_MODE=persist/reliable override
    // is a supported configuration, not a failure (ADVICE r16) —
    // skip them rather than fail the suite
    assume(sys.env.get("GRAFT_STATE_MODE").forall(_.trim.isEmpty) &&
      sys.props.get("graft.state.mode").isEmpty,
      "StateMode override active — ckpt-default assertions skipped")
    assert(graft.StateMode.deployment == graft.StateMode.Ckpt)
    val cut = graft.StateMode.cut(Seq(1L, 2L, 3L).toDF("x"))
    assert(cut.queryExecution.optimizedPlan.collectLeaves()
      .forall(_.getClass.getSimpleName.contains("LogicalRDD")),
      "ckpt-mode cut must leave a LogicalRDD leaf (lineage truncated)")
    assert(cut.as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    CacheScope.release(blocking = true)
  }

  test("ktrussOn: legacy / ckpt agree on the fixture pair graph; unknown mode throws") {
    def pairs = Dedup.dedupNgramJaccard(spark, dir)
      .select(col("doc_a"), col("doc_b"))
    assertParity("ktruss")(m => Graph.ktrussOn(pairs, mode = m),
      Seq("legacy", "ckpt"))
    intercept[IllegalArgumentException] {
      Graph.ktrussOn(pairs, mode = "nope")
    }
  }

  test("jaccardNeighborsOn: persist / ckpt agree on the fixture graph; unknown mode throws") {
    assertParity("jaccard")(m => Graph.jaccardNeighborsOn(spark, dir, m),
      Seq("persist", "ckpt"))
    intercept[IllegalArgumentException] {
      Graph.jaccardNeighborsOn(spark, dir, "nope")
    }
  }

  test("neighborGraphCapped: persist / ckpt agree on the fixture embeddings; unknown mode throws") {
    assertParity("neighborGraph")(
      m => Similarity.neighborGraphCapped(spark, dir, Similarity.GraphDeg, m),
      Seq("persist", "ckpt"))
    intercept[IllegalArgumentException] {
      Similarity.neighborGraphCapped(spark, dir, Similarity.GraphDeg, "nope")
    }
  }
}
