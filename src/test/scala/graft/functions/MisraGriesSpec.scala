package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Misra-Gries summary guarantees, checked against exact counts on
  * planted streams — including the adversarial all-distinct tail that
  * forces continuous eviction, and skewed partitioning so the
  * partial+final MERGE path (not just update) is exercised. */
class MisraGriesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Planted stream: key "hot" ×200, "warm" ×60, then 300 distinct
    * singletons — n = 560. With c = 4: n/(c+1) = 112, so "hot" is a
    * guaranteed heavy hitter; "warm" is not. */
  private def stream = {
    import spark.implicits._
    val rows =
      Seq.fill(200)("hot") ++ Seq.fill(60)("warm") ++
        (1 to 300).map(i => s"rare_$i")
    // deterministic shuffle so eviction interleaves with the hot keys
    rows.zipWithIndex
      .sortBy { case (s, i) => (i * 2654435761L) % 1000003 }
      .map(_._1)
      .toDF("k")
  }

  private def sketch(c: Int): Map[String, Long] = {
    val row = stream
      .repartition(4, col("k")) // skewed partitions → real merges
      .agg(MisraGriesAgg.mg_topk(col("k"), c).as("sk"))
      .collect()(0)
    row.getMap[String, Long](0).toMap
  }

  test("capacity >= distinct count makes the summary exact") {
    val exact = sketch(c = 512)
    assert(exact("hot") == 200L)
    assert(exact("warm") == 60L)
    assert(exact.size == 302)
    assert(exact.collect { case (k, v) if k.startsWith("rare_") => v }.forall(_ == 1L))
  }

  test("small capacity obeys the MG theorem: underestimates only, bounded error, hh present") {
    val n = 560L
    val c = 4
    val mg = sketch(c)
    assert(mg.size <= c, s"summary exceeded capacity: $mg")
    // underestimate-only + error bound, for every surviving key
    val exact = Map("hot" -> 200L, "warm" -> 60L).withDefaultValue(1L)
    mg.foreach { case (k, est) =>
      assert(est <= exact(k), s"$k overestimated: $est > ${exact(k)}")
      assert(exact(k) - est <= n / (c + 1),
        s"$k error ${exact(k) - est} exceeds n/(c+1) = ${n / (c + 1)}")
    }
    // the guaranteed heavy hitter must be present
    assert(mg.contains("hot"), s"guaranteed heavy hitter missing from $mg")
  }

  test("randomized streams obey the MG theorem at every capacity") {
    import spark.implicits._
    val rng = new scala.util.Random(20260812L)
    for (trial <- 1 to 5) {
      // Zipf-ish: key k drawn with weight ~ 1/k over 50 keys
      val keys = (1 to 50).flatMap(k => Seq.fill(1 + 400 / k)(s"k$k"))
      val stream = Seq.fill(2000)(keys(rng.nextInt(keys.size)))
      val exact = stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val n = stream.size.toLong
      val c = 2 + rng.nextInt(15)
      val mg = stream.toDF("k")
        .repartition(4, col("k"))
        .agg(MisraGriesAgg.mg_topk(col("k"), c).as("sk"))
        .collect()(0).getMap[String, Long](0).toMap
      assert(mg.size <= c, s"trial $trial: capacity $c exceeded (${mg.size})")
      mg.foreach { case (k, est) =>
        assert(est <= exact(k), s"trial $trial c=$c: $k overestimated")
        assert(exact(k) - est <= n / (c + 1),
          s"trial $trial c=$c: $k error ${exact(k) - est} > ${n / (c + 1)}")
      }
      exact.foreach { case (k, cnt) =>
        if (cnt > n / (c + 1))
          assert(mg.contains(k), s"trial $trial c=$c: heavy hitter $k (count $cnt) missing")
      }
    }
  }

  test("grouped sketches stay per-group (no cross-group bleed)") {
    import spark.implicits._
    val df = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("b", "z"))
      .toDF("g", "k")
    val out = df.groupBy("g")
      .agg(MisraGriesAgg.mg_topk(col("k"), 8).as("sk"))
      .collect()
      .map(r => r.getString(0) -> r.getMap[String, Long](1).toMap)
      .toMap
    assert(out("a") == Map("x" -> 2L, "y" -> 1L))
    assert(out("b") == Map("z" -> 1L))
  }

  test("non-string key is rejected at analysis time, not execution") {
    import spark.implicits._
    val df = Seq(1L, 2L, 2L).toDF("k")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.agg(MisraGriesAgg.mg_topk(col("k"), 8).as("sk")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("string"))
  }
}
