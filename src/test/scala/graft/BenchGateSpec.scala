package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench regression gate must alarm on genuine per-query slowdowns
  * (ratio AND absolute delta both past threshold) and stay quiet on
  * jitter, new queries, and missing baselines — a false alarm fails a
  * round, a missed one ships a regression. */
class BenchGateSpec extends AnyFunSuite {

  test("alarms: only queries past BOTH ratio and absolute-delta thresholds") {
    val base = Map("a" -> 1.0, "b" -> 0.1, "c" -> 2.0, "d" -> 1.0,
      "e" -> 1.0, "f" -> 1.0, "g" -> 1.0)
    val fresh = Map[String, Option[Double]](
      "a" -> Some(1.9),  // 1.9x, +0.9s  -> alarm
      "b" -> Some(0.3),  // 3.0x but +0.2s < absFloor -> quiet (jitter band)
      "c" -> Some(2.6),  // +0.6s but 1.3x < ratio -> quiet
      "d" -> Some(0.5),  // improvement -> quiet
      // steady majority: the suite-median ratio a real 170-query run
      // provides — machineScale stays 1.0 and raw thresholds apply
      "e" -> Some(1.0), "f" -> Some(1.0), "g" -> Some(1.0))
    assert(math.abs(BenchGate.machineScale(fresh, base) - 1.0) < 1e-9)
    val got = BenchGate.alarms(fresh, base, ratio = 1.5, absFloor = 0.35)
    assert(got.map(_.query) === Seq("a"))
    assert(math.abs(got.head.ratio - 1.9) < 1e-9)
  }

  test("alarms: a uniformly slow machine window does not flake; a relative outlier still trips") {
    val base = Map("a" -> 1.0, "b" -> 2.0, "c" -> 3.0, "d" -> 1.0, "e" -> 0.5)
    // everything 1.4x (an honest slower window: two clean identical-code
    // runs measured 109.5 vs 127.2 s totals in one session) — under the
    // raw thresholds b/c/d would all alarm; normalized, none do
    val slow = base.map { case (k, v) => k -> Some(v * 1.4) }
    assert(math.abs(BenchGate.machineScale(slow, base) - 1.4) < 1e-9)
    assert(BenchGate.alarms(slow, base).isEmpty)
    // same window, but one query genuinely regressed 2.5x: it exceeds
    // 1.5x the SCALED expectation and alarms alone
    val oneBad = slow + ("c" -> Some(3.0 * 2.5))
    val got = BenchGate.alarms(oneBad, base)
    assert(got.map(_.query) === Seq("c"))
    // alarm reports the scaled base, so the ratio reads vs expectation
    assert(math.abs(got.head.base - 3.0 * 1.4) < 1e-9)
  }

  test("alarms: all-runs-failed (None) and baseline-absent queries never alarm; renames surface") {
    val base = Map("a" -> 1.0, "renamed_away" -> 5.0)
    val fresh = Map[String, Option[Double]]("a" -> None, "new_q" -> Some(99.0))
    assert(BenchGate.alarms(fresh, base).isEmpty)
    assert(BenchGate.unbaselined(fresh, base) === Seq("new_q"))
    // the counterpart signal: a baselined query absent from the run —
    // the rename-evades-the-gate trace
    assert(BenchGate.baselineMissing(fresh, base) === Seq("renamed_away"))
  }

  test("load: parses the recorded file; missing vs corrupt are DISTINCT outcomes") {
    val f = java.io.File.createTempFile("bench_baseline", ".json")
    f.deleteOnExit()
    val w = new java.io.PrintWriter(f)
    // q_null and q_zero must be SKIPPED, not coerced to 0.0 (a 0.0
    // baseline alarms forever with ratio=Infinity)
    w.write("""{"sf":"/root/testdata/sf0.1","medians":{"q1":0.5,"q2":1.25,"q_null":null,"q_zero":0.0,"q_str":"x"}}""")
    w.close()
    val BenchGate.Loaded(b) = BenchGate.load(f.getAbsolutePath): @unchecked
    assert(b.sf === "/root/testdata/sf0.1")
    assert(b.medians === Map("q1" -> 0.5, "q2" -> 1.25))
    assert(BenchGate.load("/nonexistent/path.json") === BenchGate.NoFile)
    // malformed content is Unreadable — distinguishable from "nothing
    // recorded", so Bench can fail loud instead of silently un-gating
    val bad = java.io.File.createTempFile("bench_bad", ".json")
    bad.deleteOnExit()
    val w2 = new java.io.PrintWriter(bad); w2.write("{nope"); w2.close()
    assert(BenchGate.load(bad.getAbsolutePath).isInstanceOf[BenchGate.Unreadable])
  }
}
