package graft

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

/** Bench-protocol guard rails: the committed bench_full.json is the
  * regression reference, and round 9 proved a contended host can replace it
  * with numbers 2x off on identical code. These tests pin the canary-drift
  * statistic and the refresh refusal it powers — no SparkSession needed.
  */
class BenchSpec extends AnyFunSuite {

  private def baseline(n: Int = 20, t: Double = 1.0): Map[String, Double] =
    (1 to n).map(i => s"q$i" -> t).toMap

  test("medianDriftRatio flags a synthetic 2x host slowdown") {
    val base = baseline()
    val slow = base.view.mapValues(_ * 2.0).toMap
    assert(Bench.medianDriftRatio(base, slow).contains(2.0))
  }

  test("medianDriftRatio is robust to a few real per-query changes") {
    val base = baseline()
    // three genuinely-changed queries regress 10x, the rest are stable —
    // the MEDIAN stays ~1.0 so a legitimate refresh is not refused
    val fresh = base.map { case (k, v) =>
      k -> (if (Set("q1", "q2", "q3")(k)) v * 10 else v * 1.02)
    }
    val m = Bench.medianDriftRatio(base, fresh).get
    assert(m > 0.95 && m < 1.3, s"median $m should sit near the stable mass")
  }

  test("medianDriftRatio needs enough canaries and ignores sub-50ms noise") {
    assert(Bench.medianDriftRatio(baseline(4), baseline(4)).isEmpty)
    // tiny-baseline queries are excluded: all below 50ms leaves no canaries
    assert(Bench.medianDriftRatio(baseline(20, 0.01), baseline(20, 0.01)).isEmpty)
  }

  private def writeBaseline(dir: Path, qs: Map[String, Double],
      sf: String): Path = {
    val f = dir.resolve("bench_full.json")
    val body = qs.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    Files.write(f,
      s"""{"total":1.0,"queries":{$body},"errors":{},"sf":"$sf"}""".getBytes("UTF-8"))
    f
  }

  test("refreshAllowed refuses a 2x-drifted sweep and allows a stable one") {
    val dir = Files.createTempDirectory("graft-bench-spec")
    val base = baseline()
    val f = writeBaseline(dir, base, "/sf0.1")
    assert(Bench.refreshAllowed(f, base.view.mapValues(_ * 2).toMap, "/sf0.1")
      == Left(2.0))
    // symmetric: a suspiciously-2x-FASTER sweep is also not a refresh basis
    assert(Bench.refreshAllowed(f, base.view.mapValues(_ / 2).toMap, "/sf0.1")
      == Left(0.5))
    assert(Bench.refreshAllowed(f, base.view.mapValues(_ * 1.1).toMap, "/sf0.1")
      .isRight)
  }

  test("refreshAllowed refuses a run with errors even when canaries agree") {
    // a mid-sweep crash leaves fast failures for the remaining queries
    // while the clean prefix matches the baseline perfectly — the partial
    // run must be parked regardless of drift (Left(-2) marks the case)
    val dir = Files.createTempDirectory("graft-bench-spec")
    val base = baseline()
    val f = writeBaseline(dir, base, "/sf0.1")
    assert(Bench.refreshAllowed(f, base, "/sf0.1", hasErrors = true)
      == Left(-2.0))
    // and even with no baseline to defend, an errored run never writes one
    assert(Bench.refreshAllowed(dir.resolve("missing.json"), base, "/sf0.1",
      hasErrors = true) == Left(-2.0))
  }

  test("refreshAllowed never replaces a baseline from another sf") {
    val dir = Files.createTempDirectory("graft-bench-spec")
    val f = writeBaseline(dir, baseline(), "/sf0.1")
    assert(Bench.refreshAllowed(f, baseline(), "/sf0.01") == Left(-1.0))
  }

  test("refreshAllowed allows when no readable baseline exists") {
    val dir = Files.createTempDirectory("graft-bench-spec")
    assert(Bench.refreshAllowed(dir.resolve("missing.json"),
      baseline(), "/sf0.1").isRight)
    val garbled = dir.resolve("bad.json")
    Files.write(garbled, "not json".getBytes("UTF-8"))
    assert(Bench.refreshAllowed(garbled, baseline(), "/sf0.1").isRight)
  }

  test("run-condition stamp carries nproc, load and timing protocol") {
    val j = Bench.runConditionsJson()
    assert(j.contains("\"nproc\":") && j.contains("\"load_avg\":") &&
      j.contains("\"timing\":\"best_of_2\""))
  }
}
