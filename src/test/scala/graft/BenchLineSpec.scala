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
    val clean = Bench.renderLine(results, Map.empty[String, String], "/data/sf")
    // per-query at one decimal, total at two, sf as basename
    assert(clean === """{"metric":"total","value":1.75,"unit":"sec","queries":{"q_a":0.5,"q_b":1.3},"errors":{},"sf":"sf"}""")
    val withErr = Bench.renderLine(results, Map("q_b" -> "It broke"), "/sf")
    assert(withErr.contains(""""errors":{"q_b":"It broke"}"""))
  }

  test("renderLine degrades to failing-query names when messages overflow the budget") {
    // 88 queries × 12-char names (larger than the real registry's
    // name mass) ⇒ clean line ~1.6 kB, so two full 200-char messages
    // overflow but names-only fits
    val results = (1 to 88).map(i => f"q_bench_$i%03d" -> 1.23)
    val bigErrors = scala.collection.immutable.ListMap(
      "q_bench_001" -> ("x" * 200),
      "q_bench_002" -> ("y" * 200))
    val out = Bench.renderLine(results, bigErrors, "/root/testdata/sf0.1")
    assert(out.length <= 1900, s"degraded line still ${out.length} chars")
    assert(out.contains(""""_failed":"q_bench_001,q_bench_002""""))
    assert(!out.contains("xxx"), "full messages must be dropped in degraded mode")
    assert(out.contains(""""sf":"sf0.1""""), "sf renders as the dir basename")
  }

  test("renderLine stays inside the budget at the current registry size") {
    // the real guard: every registered name at a REALISTIC timing mix
    // (most queries sub-second, a multi-second tail — the measured r6
    // shape) must fit the tail window, keeping one decimal on the tail
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
    val results = names.zipWithIndex.map { case (n, i) =>
      n -> (if (i % 4 == 0) 2.37 else 0.43)
    }
    val out = Bench.renderLine(results, Map.empty[String, String], "/root/testdata/sf0.1")
    assert(out.length <= 1896,
      s"line ${out.length} chars at ${names.size} queries — over the 1900 budget")
    assert(out.contains(":2.4"), "multi-second queries must keep a decimal")
  }

  test("renderLine survives a load-inflated run via the whole-second fallback") {
    // r5 lesson: a machine-load-inflated run prints longer digits
    // ("11.3" not "2.1") and can blow the f1 form past the window —
    // the whole-second form must rescue the line, because an oversized
    // line loses its HEAD in the driver's tail capture (parse failure).
    // Shape: the realistic mix at ~2.5x load (tail 10.7 s, rest 1.1 s).
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
    val results = names.zipWithIndex.map { case (n, i) =>
      n -> (if (i % 4 == 0) 10.71 else 1.13)
    }
    val out = Bench.renderLine(results, Map.empty[String, String], "/root/testdata/sf0.1")
    assert(out.length <= 1900, s"inflated line ${out.length} chars")
    assert(out.contains(""":11"""), "whole-second values expected in degraded form")
    assert(!out.contains("10.7"), "decimal values must be gone in degraded form")
  }

  test("renderLine's absolute floor always fits and stays parseable") {
    // pathological: EVERY query multi-digit seconds — per-query detail
    // is dropped entirely before the line can outgrow the window
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
    val results = names.map(_ -> 47.3)
    val out = Bench.renderLine(results, Map("q_x" -> "boom"), "/root/testdata/sf0.1")
    assert(out.length <= 1900, s"floor line ${out.length} chars")
    assert(out.contains(""""queries":{}"""))
    assert(out.contains(""""_failed":"q_x""""))
    assert(out.contains(""""value":"""))
  }
}
