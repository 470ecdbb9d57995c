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

  test("spread: widens tolerance only where cross-JVM runs disagreed; a planted 2x still trips") {
    // realistic shape: a stable query (spread ~3%), a write-path query
    // whose two independent-JVM medians differed 35% (the round-12
    // driver red class), and suite ballast
    val base = Map("stable" -> 1.0, "writepath" -> 3.0,
      "e" -> 1.0, "f" -> 1.0, "g" -> 1.0)
    val spread = Map("stable" -> 0.03, "writepath" -> 1.05)
    // the write-path query at 1.8x of its recorded max: absorbed by the
    // 2x-spread widening ((3.0 + 2*1.05) * 1.5 = 7.65 > 5.4), NOT an alarm
    val drift = Map[String, Option[Double]](
      "stable" -> Some(1.05), "writepath" -> Some(5.4),
      "e" -> Some(1.0), "f" -> Some(1.0), "g" -> Some(1.0))
    assert(BenchGate.alarms(drift, base, spread = spread).isEmpty)
    // the verdict's "done" condition: a planted 2x regression on the
    // STABLE query must still trip ((1.0 + 2*0.03) * 1.5 = 1.59 < 2.0)
    val planted = drift + ("stable" -> Some(2.0))
    val got = BenchGate.alarms(planted, base, spread = spread)
    assert(got.map(_.query) === Seq("stable"))
    assert(got.head.threshold < 2.0 && got.head.threshold > 1.5)
    // and a negative spread entry (corrupt baseline) is ignored rather
    // than honored — honored, it would drive the threshold negative and
    // alarm on ANY measurement; ignored, the plain 1.5x threshold applies
    val neg = BenchGate.alarms(planted, base, spread = Map("stable" -> -5.0))
    assert(neg.exists(a => a.query == "stable" && a.threshold > 1.4))
  }

  test("scale cap: an engine-wide uniform regression cannot hide behind machine normalization") {
    val base = Map("a" -> 1.0, "b" -> 2.0, "c" -> 3.0, "d" -> 1.0, "e" -> 0.5)
    // honest host drift (1.4x, the worst adjudicated in round 12) is
    // still absorbed under the default 1.5 cap
    val drift = base.map { case (k, v) => k -> Some(v * 1.4) }
    assert(BenchGate.alarms(drift, base).isEmpty)
    // a uniform 2.5x suite-wide slowdown: unbounded normalization would
    // scale every threshold by 2.5 and ship it silently (the advisor's
    // round-12 finding); capped at 1.5 every query exceeds
    // cap*ratio = 2.25x and alarms broadly — un-maskable
    val uniform = base.map { case (k, v) => k -> Some(v * 2.5) }
    val got = BenchGate.alarms(uniform, base)
    assert(got.map(_.query).toSet === base.keySet)
  }

  test("io class: uniform disk drift on write-path queries does not flake; a planted 2x io regression still trips") {
    // 6 CPU queries steady, 6 declared IO queries — use REAL members of
    // DefaultIoQueries so the production set is what's under test
    val ioNames = BenchGate.DefaultIoQueries.toSeq.sorted.take(6)
    val base = (1 to 6).map(i => s"cpu$i" -> 1.0).toMap ++ ioNames.map(_ -> 1.0).toMap
    // disk window: every IO query 1.9x while CPU sits at 1.0x — the
    // round-13 final-run shape. Suite-median normalization can't see it
    // (median over 12 entries ~1.0); the IO-class scale absorbs it.
    val drift = base.map { case (q, v) =>
      q -> Some(if (BenchGate.DefaultIoQueries(q)) v * 1.9 else v)
    }
    assert(BenchGate.alarms(drift, base).isEmpty,
      "uniform io-class drift must normalize away")
    val (cpuS, ioS) = BenchGate.classScales(drift, base, BenchGate.DefaultIoQueries)
    assert(math.abs(cpuS - 1.0) < 1e-9 && math.abs(ioS - 1.9) < 1e-9)
    // a SINGLE io query regressed 2.5x against a steady io class: the
    // class median stays ~1, so it trips — normalization can't mask it
    val oneBad = base.map { case (q, v) => q -> Some(v) } +
      (ioNames.head -> Some(2.5))
    assert(BenchGate.alarms(oneBad, base).map(_.query) === Seq(ioNames.head))
    // and past the io cap, even a class-wide slowdown alarms (un-maskable)
    val extreme = base.map { case (q, v) =>
      q -> Some(if (BenchGate.DefaultIoQueries(q)) v * 4.5 else v)
    }
    assert(BenchGate.alarms(extreme, base).size === 6,
      "a class-wide slowdown past the io cap must alarm broadly")
    // a CPU query never borrows the io headroom: cpu at 1.9x with io
    // steady trips even though 1.9 < ioScaleCap
    val cpuBad = base.map { case (q, v) => q -> Some(v) } + ("cpu1" -> Some(1.9))
    assert(BenchGate.alarms(cpuBad, base).map(_.query) === Seq("cpu1"))
    // subset run of ONLY io queries still normalizes (falls back sanely)
    val ioOnly = ioNames.map(q => q -> Some(1.2)).toMap[String, Option[Double]]
    assert(BenchGate.alarms(ioOnly, base).isEmpty)
  }

  test("second chance: a query slow in pass 1 and at baseline in pass 2 clears; " +
    "slow in BOTH stays confirmed; a failed or absent re-run never exonerates") {
    // the r13-r16 driver-red class: host window inflates whichever
    // queries ran inside it; a tail re-measurement outside the window
    // is at baseline. threshold here = base * 1.5 (scale 1, no spread).
    val base = Map("windowed" -> 1.0, "genuine" -> 2.0, "crashy" -> 1.0,
      "e" -> 1.0, "f" -> 1.0, "g" -> 1.0, "h" -> 1.0)
    val pass1 = Map[String, Option[Double]](
      "windowed" -> Some(2.2),  // 2.2x in the bad window
      "genuine" -> Some(5.0),   // a real 2.5x regression
      "crashy" -> Some(2.5),    // slow pass 1, FAILS pass 2
      "e" -> Some(1.0), "f" -> Some(1.0), "g" -> Some(1.0), "h" -> Some(1.0))
    val alarms = BenchGate.alarms(pass1, base)
    assert(alarms.map(_.query).toSet === Set("windowed", "genuine", "crashy"))
    val pass2 = Map[String, Option[Double]](
      "windowed" -> Some(0.95), // back at baseline -> cleared
      "genuine" -> Some(4.8),   // still past threshold -> confirmed
      "crashy" -> None)         // re-run failed -> NOT exonerated
    val (confirmed, cleared) = BenchGate.confirm(alarms, pass2)
    assert(cleared.map(_.query) === Seq("windowed"))
    assert(confirmed.map(_.query).toSet === Set("genuine", "crashy"))
    // absent from pass 2 entirely (re-run skipped/died): kept confirmed
    val (c2, _) = BenchGate.confirm(alarms, Map.empty)
    assert(c2.map(_.query).toSet === Set("windowed", "genuine", "crashy"))
    // pass 2 is judged against the SAME pass-1 threshold: exactly AT the
    // threshold does not confirm (strictly-greater, matching alarms())
    val at = alarms.find(_.query == "windowed").get
    val (c3, cl3) = BenchGate.confirm(Seq(at), Map("windowed" -> Some(at.threshold)))
    assert(c3.isEmpty && cl3.map(_.query) === Seq("windowed"))
  }

  test("second chance end-to-end: all pass-1 alarms cleared -> rc 0 with " +
    "both passes persisted in the artifact (the r13-r16 false-red class " +
    "resolves in-process)") {
    val base = Map("windowed" -> 1.0, "e" -> 1.0, "f" -> 1.0, "g" -> 1.0)
    val pass1 = Map[String, Option[Double]]("windowed" -> Some(2.2),
      "e" -> Some(1.0), "f" -> Some(1.0), "g" -> Some(1.0))
    val alarms = BenchGate.alarms(pass1, base)
    assert(alarms.map(_.query) === Seq("windowed"))
    val (confirmed, cleared) = BenchGate.confirm(alarms,
      Map("windowed" -> Some(0.97)))
    assert(confirmed.isEmpty && cleared.map(_.query) === Seq("windowed"))
    // the Bench.main decision path: rc from the CONFIRMED count, artifact
    // (carrying both passes, exactly as Bench assembles it) written first
    val dir = java.nio.file.Files.createTempDirectory("bench_sc").toFile
    dir.deleteOnExit()
    val path = new java.io.File(dir, "BENCH_LAST.json").getAbsolutePath
    val json = """{"regressions":{},"regressed":0,""" +
      """"pass1_regressions":{"windowed":{"base":1.0,"median":2.2,"threshold":1.5,"ratio":2.2}},""" +
      """"pass1_regressed":1,"second_chance":{"ran":true,"medians":{"windowed":0.97},""" +
      """"cleared":["windowed"],"confirmed":[]}}"""
    val rc = BenchGate.finishRun(json, path, gateOn = true,
      BenchGate.Loaded(BenchGate.Baseline("sf", base, Map.empty)),
      nAlarms = confirmed.size)
    assert(rc === 0)
    val onDisk = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")
    assert(onDisk.contains("\"pass1_regressed\":1") &&
      onDisk.contains("\"cleared\":[\"windowed\"]") &&
      onDisk.contains("\"medians\":{\"windowed\":0.97}"))
    // and a DOUBLE-failure still exits nonzero through the same path
    assert(BenchGate.finishRun(json, path, gateOn = true,
      BenchGate.Loaded(BenchGate.Baseline("sf", base, Map.empty)),
      nAlarms = 1) === 3)
  }

  test("ratchet: 3 consecutive fast runs drop the entry; 2 do not; a normal run resets the streak") {
    val baseline = BenchGate.Baseline("sf", Map("a" -> 1.0, "b" -> 1.0),
      Map("a" -> 0.2, "b" -> 0.2))
    def run(streaks: Map[String, Seq[Double]], a: Double, b: Double) =
      BenchGate.ratchetStep(streaks,
        Map("a" -> Some(a), "b" -> Some(b)), baseline)
    // run 1: a fast (0.5 <= 0.6), b normal -> streak starts for a only
    val (s1, e1) = run(Map.empty, 0.5, 0.9)
    assert(e1.isEmpty && s1 === Map("a" -> Seq(0.5)))
    // run 2: a fast again -> streak grows, still no event (2 < 3)
    val (s2, e2) = run(s1, 0.55, 0.9)
    assert(e2.isEmpty && s2("a") === Seq(0.5, 0.55))
    // run 3: a fast a third time -> ratchet fires; new median is the
    // streak MAX, new spread never shrinks below the scaled old spread
    val (s3, e3) = run(s2, 0.45, 0.9)
    assert(e3.map(_.query) === Seq("a"))
    val ev = e3.head
    assert(ev.oldMedian === 1.0 && ev.newMedian === 0.55)
    // streak max-min = 0.10; old relative spread scaled = 0.2*0.55 = 0.11
    assert(math.abs(ev.newSpread - 0.11) < 1e-9)
    assert(!s3.contains("a"), "a consumed streak starts fresh against the new entry")
    // a normal-speed run RESETS a partial streak
    val (s4, _) = run(s1, 0.9, 0.9)
    assert(s4.isEmpty)
    // an absent query drops its streak; a failed (None) run resets too
    val (s5, e5) = BenchGate.ratchetStep(Map("a" -> Seq(0.5, 0.5), "gone" -> Seq(0.4)),
      Map("a" -> None, "b" -> Some(0.9)), baseline)
    assert(e5.isEmpty && s5.isEmpty)
  }

  test("ratchet file round-trip: baseline medians/spread/total update, other fields survive") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ratchet-").toString
    val bp = s"$dir/BENCH_BASELINE.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(bp),
      """{"source":"test","sf":"sfX","note":"keep me","total_sec":3.0,
         |"medians":{"a":1.0,"b":2.0},"spread":{"a":0.2,"b":0.1}}""".stripMargin
        .getBytes("UTF-8"))
    BenchGate.applyRatchetToFile(bp,
      Seq(BenchGate.RatchetEvent("a", 1.0, 0.55, 0.2, 0.11)), "2026-08-16T00:00:00Z")
    BenchGate.load(bp) match {
      case BenchGate.Loaded(b) =>
        assert(b.sf === "sfX")
        assert(b.medians === Map("a" -> 0.55, "b" -> 2.0))
        assert(b.spread("a") === 0.11 && b.spread("b") === 0.1)
      case other => fail(s"reload failed: $other")
    }
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(bp)), "UTF-8")
    assert(txt.contains("keep me") && txt.contains("last_ratchet")
      && txt.contains("2.55")) // total re-summed
    // streak sidecar round-trips and is SF-scoped
    val sp = s"$dir/BENCH_RATCHET.json"
    BenchGate.saveStreaks(sp, "sfX", Map("q" -> Seq(0.5, 0.45)))
    assert(BenchGate.loadStreaks(sp, "sfX") === Map("q" -> Seq(0.5, 0.45)))
    assert(BenchGate.loadStreaks(sp, "sfOTHER") === Map.empty)
    assert(BenchGate.loadStreaks(s"$dir/absent.json", "sfX") === Map.empty)
  }

  test("load: parses the recorded file; missing vs corrupt are DISTINCT outcomes") {
    val f = java.io.File.createTempFile("bench_baseline", ".json")
    f.deleteOnExit()
    val w = new java.io.PrintWriter(f)
    // q_null and q_zero must be SKIPPED, not coerced to 0.0 (a 0.0
    // baseline alarms forever with ratio=Infinity)
    w.write("""{"sf":"/root/testdata/sf0.1","medians":{"q1":0.5,"q2":1.25,"q_null":null,"q_zero":0.0,"q_str":"x"},"spread":{"q1":0.0,"q2":0.4,"q_bad":"x"}}""")
    w.close()
    val BenchGate.Loaded(b) = BenchGate.load(f.getAbsolutePath): @unchecked
    assert(b.sf === "/root/testdata/sf0.1")
    assert(b.medians === Map("q1" -> 0.5, "q2" -> 1.25))
    // spread admits exact-0 (two JVMs CAN agree) and skips non-numerics
    assert(b.spread === Map("q1" -> 0.0, "q2" -> 0.4))
    // a v1 baseline (no spread field) still loads and gates
    val v1 = java.io.File.createTempFile("bench_v1", ".json")
    v1.deleteOnExit()
    val w1 = new java.io.PrintWriter(v1)
    w1.write("""{"sf":"x","medians":{"q1":0.5}}"""); w1.close()
    val BenchGate.Loaded(b1) = BenchGate.load(v1.getAbsolutePath): @unchecked
    assert(b1.medians === Map("q1" -> 0.5) && b1.spread.isEmpty)
    assert(BenchGate.load("/nonexistent/path.json") === BenchGate.NoFile)
    // malformed content is Unreadable — distinguishable from "nothing
    // recorded", so Bench can fail loud instead of silently un-gating
    val bad = java.io.File.createTempFile("bench_bad", ".json")
    bad.deleteOnExit()
    val w2 = new java.io.PrintWriter(bad); w2.write("{nope"); w2.close()
    assert(BenchGate.load(bad.getAbsolutePath).isInstanceOf[BenchGate.Unreadable])
  }

  test("finishRun: a gate-FAIL run still persists the complete artifact " +
    "before the nonzero exit code (judge r15 #3 — both driver reds lost " +
    "the JSON to a truncated stdout tail)") {
    val dir = java.nio.file.Files.createTempDirectory("bench_last").toFile
    dir.deleteOnExit()
    val path = new java.io.File(dir, "BENCH_LAST.json").getAbsolutePath
    val json = """{"metric":"total","value":1.0,"probes":{"cpu_sec_start":0.2}}"""
    // regression alarms present -> rc 3, artifact complete on disk
    val rc = BenchGate.finishRun(json, path, gateOn = true,
      BenchGate.Loaded(BenchGate.Baseline("sf", Map("q" -> 1.0), Map.empty)),
      nAlarms = 2)
    assert(rc === 3)
    val onDisk = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")
    assert(onDisk.trim === json)
    // unreadable baseline -> rc 4, artifact still (over)written
    val rc4 = BenchGate.finishRun(json + "2", path, gateOn = true,
      BenchGate.Unreadable("boom"), nAlarms = 0)
    assert(rc4 === 4)
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8").trim === json + "2")
    // clean run -> rc 0; gate off ignores alarms (exploratory runs)
    assert(BenchGate.finishRun(json, path, gateOn = true,
      BenchGate.Loaded(BenchGate.Baseline("sf", Map.empty, Map.empty)),
      nAlarms = 0) === 0)
    assert(BenchGate.finishRun(json, path, gateOn = false,
      BenchGate.Unreadable("boom"), nAlarms = 5) === 0)
    // no stale .tmp left behind by the atomic-rename protocol
    assert(!new java.io.File(path + ".tmp").exists())
  }
}
