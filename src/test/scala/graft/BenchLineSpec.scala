package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench JSON line is the driver's only window into per-round
  * performance; a malformed or over-long line nulls the whole round's
  * bench. These tests pin the rendering contract without a
  * SparkSession. */
class BenchLineSpec extends AnyFunSuite {

  test("f2 renders valid minimal JSON numbers") {
    assert(Bench.f2(0.50)  === "0.5")
    assert(Bench.f2(1.00)  === "1")
    assert(Bench.f2(11.12) === "11.12")
    assert(Bench.f2(0.004) === "0")
    assert(Bench.f2(132.87) === "132.87")
  }

  test("sanitize strips JSON-hostile characters and caps length") {
    val hostile = "boom \"quoted\" back\\slash\nnewlinectl"
    val s = Bench.sanitize(hostile)
    assert(!s.exists(c => c == '"' || c == '\\' || c < ' '))
    assert(Bench.sanitize("x" * 500).length === 200)
  }

  test("renderLine emits parseable JSON with and without errors") {
    val results = Seq("q_a" -> 0.5, "q_b" -> 1.25)
    val clean = Bench.renderLine(results, Map.empty[String, String], "/sf")
    assert(clean === """{"metric":"total","value":1.75,"unit":"sec","queries":{"q_a":0.5,"q_b":1.25},"errors":{},"sf":"/sf"}""")
    val withErr = Bench.renderLine(results, Map("q_b" -> "It broke"), "/sf")
    assert(withErr.contains(""""errors":{"q_b":"It broke"}"""))
  }

  test("renderLine degrades to failing-query names when messages overflow the budget") {
    // realistic shape: 88 queries × ~12-char names ⇒ clean line ~1.6 kB,
    // so two full 200-char messages overflow but names-only fits
    val results = (1 to 88).map(i => f"q_bench_$i%03d" -> 1.23)
    val bigErrors = scala.collection.immutable.ListMap(
      "q_bench_001" -> ("x" * 200),
      "q_bench_002" -> ("y" * 200))
    val out = Bench.renderLine(results, bigErrors, "/root/testdata/sf0.1")
    assert(out.length <= 1900, s"degraded line still ${out.length} chars")
    assert(out.contains(""""_failed":"q_bench_001,q_bench_002""""))
    assert(!out.contains("xxx"), "full messages must be dropped in degraded mode")
  }

  test("renderLine drops to one decimal when the timings themselves outgrow the budget") {
    // 88 queries all over 100 s: the 2-decimal clean line exceeds the
    // budget with an empty errors map — nothing to degrade except
    // precision
    val results = (1 to 88).map(i => f"q_bench_$i%03d" -> 123.45)
    val out = Bench.renderLine(results, Map.empty[String, String], "/sf")
    assert(out.length <= 1900, s"line still ${out.length} chars")
    assert(out.contains(""""q_bench_001":123.5""" + ","), "one-decimal rendering expected")
  }
}
