package graft

import graft.llm.{LlmRequest, RateLimitedException, Retry, StubLlmClient}
import graft.operators.Enrich
import org.apache.spark.sql.functions.col
import scala.collection.mutable.ArrayBuffer

/** Static (per-JVM) probes: enrich clients are serialized into task
  * closures, so captured fields would be deserialized COPIES — a shared
  * object is the only way to observe executor-side behavior in local
  * mode. */
object EnrichProbes {
  val inFlight = new java.util.concurrent.atomic.AtomicInteger(0)
  val maxSeen = new java.util.concurrent.atomic.AtomicInteger(0)
  val calls = new java.util.concurrent.atomic.AtomicInteger(0)
  val keys: java.util.Set[String] = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  def reset(): Unit = { inFlight.set(0); maxSeen.set(0); calls.set(0); keys.clear(); keyCounts.clear(); throttledPrompts.clear() }

  class ProbeClient extends graft.llm.LlmClient with Serializable {
    override def complete(req: graft.llm.LlmRequest): String = {
      val cur = inFlight.incrementAndGet()
      maxSeen.updateAndGet(m => math.max(m, cur))
      calls.incrementAndGet()
      Thread.sleep(5)
      inFlight.decrementAndGet()
      "ok"
    }
  }

  class KeyCapture extends graft.llm.LlmClient with Serializable {
    override def complete(req: graft.llm.LlmRequest): String = { keys.add(req.idempotencyKey); "ok" }
  }

  val keyCounts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  /** Counts every attempt per idempotency key; hangs on a chosen row. */
  class DeadlineClient(hangMarker: String) extends graft.llm.LlmClient with Serializable {
    override def complete(req: graft.llm.LlmRequest): String = {
      keyCounts.merge(req.idempotencyKey, 1, (a, b) => a + b)
      if (req.prompt.contains(hangMarker)) Thread.sleep(60000)
      "ok"
    }
  }

  /** 429s the FIRST attempt of every prompt (keyed on prompt), succeeds
    * on retry — one honored throttle per row. */
  class ThrottleOnceClient(retryAfterMs: Long) extends graft.llm.LlmClient with Serializable {
    override def complete(req: graft.llm.LlmRequest): String = {
      if (throttledPrompts.add(req.prompt))
        throw new graft.llm.RateLimitedException(retryAfterMs)
      "ok:" + req.prompt.length
    }
  }
  val throttledPrompts: java.util.Set[String] =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Extracts the row's input back out of the prompt — a deterministic
    * "completion" whose expected value per row is obvious in asserts.
    * Lives on the OBJECT so client closures never capture the spec
    * class (whose scalatest Engine is not serializable). */
  val echo: String => String = p => p.substring(p.indexOf("Input: ") + 7)

  /** Counts every SUCCESSFUL completion in `calls` — the "paid call"
    * ledger the resume tests assert on. */
  class CountingClient(f: String => String) extends graft.llm.LlmClient with Serializable {
    override def complete(req: graft.llm.LlmRequest): String = {
      val out = f(req.prompt)
      calls.incrementAndGet()
      out
    }
  }

  /** Hangs forever on the marker row (the batch deadline then kills the
    * job — the in-engine "kill -9 mid-chunk" for restart tests); counts
    * successes like [[CountingClient]]. */
  class HangOnClient(marker: String, f: String => String)
      extends graft.llm.LlmClient with Serializable {
    override def complete(req: graft.llm.LlmRequest): String = {
      if (req.prompt.contains(marker)) Thread.sleep(600000L)
      val out = f(req.prompt)
      calls.incrementAndGet()
      out
    }
  }

  /** Row-level failure (NonFatal — retried by the backoff ladder, then
    * the sentinel) on the marker row; successes counted. */
  class FailOnClient(marker: String, f: String => String)
      extends graft.llm.LlmClient with Serializable {
    override def complete(req: graft.llm.LlmRequest): String = {
      if (req.prompt.contains(marker)) throw new RuntimeException("stub failure")
      val out = f(req.prompt)
      calls.incrementAndGet()
      out
    }
  }
}

class EnrichSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int) = (0 until n).map(i => (s"row$i", i)).toDF("val", "num")

  test("enrich preserves input order across multi-batch runs") {
    val cfg = Enrich.Config(systemPrompt = "P", batchSize = 7, rowConcurrency = 3)
    val out = Enrich.enrich(corpus(53), 0, cfg, () => new StubLlmClient(p => p.takeRight(6)))
      .select("val", "_row_idx", "Response").collect()
    assert(out.length == 53)
    out.zipWithIndex.foreach { case (r, i) =>
      assert(r.getString(0) == s"row$i", s"row order broken at $i")
      assert(r.getLong(1) == i, s"row index not contiguous at $i")
      assert(r.getString(2).endsWith(i.toString))
    }
  }

  test("maxRows: head enriched, tail passes through with empty Response") {
    val cfg = Enrich.Config(systemPrompt = "P", maxRows = 10, batchSize = 4)
    val out = Enrich.enrich(corpus(15), 0, cfg, () => new StubLlmClient(_ => "ok")).collect()
    assert(out.length == 15)
    out.take(10).foreach(r => assert(r.getAs[String]("Response") == "ok"))
    out.drop(10).foreach(r => assert(r.getAs[String]("Response") == ""))
  }

  test("failures produce sentinel; errorReport counts 1-based indexes") {
    val cfg = Enrich.Config(systemPrompt = "P", retries = 2, retryBaseDelayMs = 1L)
    val client = () => new StubLlmClient(_ => "fine", failOn = _.contains("row4"))
    val enriched = Enrich.enrich(corpus(8), 0, cfg, client)
    val (count, idx) = Enrich.errorReport(enriched)
    assert(count == 1)
    assert(idx == Seq(5L)) // row4 is the 5th row, 1-based (test.py:52 semantics)
    assert(enriched.filter(col("Response") === Enrich.ErrorSentinel).count() == 1)
  }

  test("batch timeout: a never-returning call fails the job in bounded time") {
    // reference: as_completed(futures, timeout=3600) bounds every batch
    // (test.py:122-124); a silent socket must not hang the task forever
    val cfg = Enrich.Config(systemPrompt = "P", retries = 1, batchSize = 10,
      rowConcurrency = 2, batchTimeoutMs = 1500L)
    val hang = () => new StubLlmClient(p => { Thread.sleep(20000); p })
    val t0 = System.nanoTime()
    val e = intercept[Exception] {
      Enrich.enrich(corpus(4), 0, cfg, hang).collect()
    }
    val elapsedMs = (System.nanoTime() - t0) / 1000000L
    assert(elapsedMs < 15000, s"job took ${elapsedMs}ms — timeout did not bound it")
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    assert(chain(e).exists(_.isInstanceOf[java.util.concurrent.TimeoutException]),
      s"expected a TimeoutException in the cause chain, got $e")
  }

  test("sliding window: slow calls don't head-of-line-block fast ones") {
    // 16 rows, every 4th sleeps 500ms, others 2ms, window of 4. The old
    // grouped() formulation stalls each group of 4 on its slow member:
    // >= 4 x 500 = 2000ms. The sliding window overlaps all slow calls:
    // ~500ms + fast work. Assert well under the grouped floor.
    val cfg = Enrich.Config(systemPrompt = "P", batchSize = 100, rowConcurrency = 4)
    val bimodal = () => new StubLlmClient(p => {
      val i = p.split("row").last.trim.toInt
      Thread.sleep(if (i % 4 == 0) 500 else 2)
      s"ok$i"
    })
    val t0 = System.nanoTime()
    val out = Enrich.enrich(corpus(16), 0, cfg, bimodal)
      .select("val", "Response").collect()
    val elapsedMs = (System.nanoTime() - t0) / 1000000L
    assert(elapsedMs < 1500, s"took ${elapsedMs}ms — grouped-style head-of-line blocking (floor 2000ms)")
    out.zipWithIndex.foreach { case (r, i) =>
      assert(r.getString(0) == s"row$i" && r.getString(1) == s"ok$i", s"order broken at $i")
    }
  }

  test("errorReport caps the collected index list, count stays exact") {
    val cfg = Enrich.Config(systemPrompt = "P", retries = 1, batchSize = 25000)
    val allFail = () => new StubLlmClient(_ => "x", failOn = _ => true)
    val enriched = Enrich.enrich(corpus(100000), 0, cfg, allFail)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val (count, idx) = Enrich.errorReport(enriched, maxIndexes = 50)
      assert(count == 100000L, "count must be exact, not capped")
      assert(idx == (1L to 50L), "indexes must be the FIRST 50, ascending, 1-based")
    } finally enriched.unpersist()
  }

  test("null cells stringify as \"nan\" (pandas str(nan) parity)") {
    val df = Seq[(Option[String], Int)]((Some("a"), 1), (None, 2)).toDF("val", "num")
    val cfg = Enrich.Config(systemPrompt = "SYS")
    val out = Enrich.enrich(df, 0, cfg, () => new StubLlmClient(identity))
      .select("Response").as[String].collect()
    assert(out(0) == "SYS\n\nInput: a")
    assert(out(1) == "SYS\n\nInput: nan")
  }

  test("Retry: exponential backoff then success") {
    val delays = ArrayBuffer[Long]()
    var calls = 0
    val r = Retry.withBackoff(attempts = 7, baseDelayMs = 1000L, sleeper = delays += _) {
      calls += 1
      if (calls < 4) throw new RuntimeException("boom")
      "done"
    }
    assert(r == "done" && calls == 4)
    assert(delays.toSeq == Seq(1000L, 2000L, 4000L))
  }

  test("Retry: exhaustion rethrows after 7 attempts with doubling delays") {
    val delays = ArrayBuffer[Long]()
    var calls = 0
    intercept[RuntimeException] {
      Retry.withBackoff(attempts = 7, baseDelayMs = 1000L, sleeper = delays += _) {
        calls += 1; throw new RuntimeException("always")
      }
    }
    assert(calls == 7)
    assert(delays.toSeq == Seq(1000L, 2000L, 4000L, 8000L, 16000L, 32000L))
  }

  test("Retry: 429 + Retry-After sleeps the server's delay and leaves the ladder untouched") {
    val delays = ArrayBuffer[Long]()
    val throttled = ArrayBuffer[Long]()
    var calls = 0
    val r = Retry.withBackoff(attempts = 7, baseDelayMs = 1000L,
      sleeper = delays += _, onThrottle = throttled += _) {
      calls += 1
      calls match {
        case 1 => throw new RuntimeException("boom")             // blind: 1000
        case 2 => throw new RateLimitedException(5000L)          // honored: 5000
        case 3 => throw new RateLimitedException(3000L)          // honored: 3000
        case 4 => throw new RuntimeException("boom")             // ladder RESUMES: 2000
        case _ => "done"
      }
    }
    assert(r == "done" && calls == 5)
    assert(delays.toSeq == Seq(1000L, 5000L, 3000L, 2000L),
      "server-stated delays interleave without advancing the exponential schedule")
    assert(throttled.toSeq == Seq(5000L, 3000L), "only honored throttles are reported")
  }

  test("Retry: 429 without Retry-After takes the blind exponential schedule (parity)") {
    val delays = ArrayBuffer[Long]()
    val throttled = ArrayBuffer[Long]()
    var calls = 0
    val r = Retry.withBackoff(attempts = 7, baseDelayMs = 1000L,
      sleeper = delays += _, onThrottle = throttled += _) {
      calls += 1
      if (calls < 3) throw new RateLimitedException(-1L)
      "done"
    }
    assert(r == "done")
    assert(delays.toSeq == Seq(1000L, 2000L), "headerless 429 = reference blind backoff")
    assert(throttled.isEmpty, "no Retry-After, nothing to report as a throttle")
  }

  test("Retry: hostile Retry-After is clamped; attempts still bound a throttle storm") {
    val delays = ArrayBuffer[Long]()
    var calls = 0
    intercept[RateLimitedException] {
      Retry.withBackoff(attempts = 3, baseDelayMs = 1000L, sleeper = delays += _,
        maxRetryAfterMs = 10000L) {
        calls += 1; throw new RateLimitedException(3600000L) // server asks for 1h
      }
    }
    assert(calls == 3)
    assert(delays.toSeq == Seq(10000L, 10000L), "clamped to maxRetryAfterMs")
  }

  test("Retry-After parsing: delta-seconds, HTTP-date, garbage, absent") {
    import graft.llm.RateLimitedException.parseRetryAfterMs
    val now = 1700000000000L
    assert(parseRetryAfterMs(Some("30"), now) == 30000L)
    assert(parseRetryAfterMs(Some("0"), now) == 0L)
    val date = java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME.format(
      java.time.Instant.ofEpochMilli(now + 42000L).atZone(java.time.ZoneOffset.UTC))
    assert(parseRetryAfterMs(Some(date), now) == 42000L)
    val past = java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME.format(
      java.time.Instant.ofEpochMilli(now - 5000L).atZone(java.time.ZoneOffset.UTC))
    assert(parseRetryAfterMs(Some(past), now) == 0L, "dates in the past clamp to 0")
    assert(parseRetryAfterMs(Some("soon"), now) == -1L)
    assert(parseRetryAfterMs(Some(""), now) == -1L)
    assert(parseRetryAfterMs(None, now) == -1L)
  }

  test("enrich surfaces per-partition throttle counts through the accumulator") {
    EnrichProbes.reset()
    val acc = spark.sparkContext.longAccumulator("throttles")
    val cfg = Enrich.Config(systemPrompt = "P", batchSize = 10, retryBaseDelayMs = 1L)
    val out = Enrich.enrich(corpus(8), 0, cfg,
        () => new EnrichProbes.ThrottleOnceClient(retryAfterMs = 5L),
        throttles = Some(acc))
      .select("Response").as[String].collect()
    assert(out.length == 8 && out.forall(_.nonEmpty), "every row recovers after its 429")
    assert(acc.value == 8L, s"each row throttled exactly once, got ${acc.value}")
  }

  test("global in-flight gate bounds concurrent LLM calls JVM-wide") {
    EnrichProbes.reset()
    // 4 partitions x 8 rowConcurrency = 32 potential, gate caps at 3
    val cfg = Enrich.Config(systemPrompt = "P", batchSize = 10, rowConcurrency = 8,
      globalMaxInFlightPerJvm = 3)
    Enrich.enrich(corpus(40), 0, cfg, () => new EnrichProbes.ProbeClient).collect()
    assert(EnrichProbes.calls.get() == 40, "probe must actually observe the calls")
    assert(EnrichProbes.maxSeen.get() <= 3,
      s"saw ${EnrichProbes.maxSeen.get()} concurrent calls, cap was 3")
  }

  test("leased budget bounds in-flight GLOBALLY across two executors' pools") {
    EnrichProbes.reset()
    // two concurrent enrich jobs, each leasing under its OWN client id —
    // the two-executor topology in one JVM. Uncapped they'd run
    // 2 jobs x 4 partitions x 8 rowConcurrency; the coordinator holds
    // the global ceiling at 5 across BOTH.
    val co = new graft.llm.InFlightBudget.BudgetCoordinator(5)
    try {
      // pre-register the per-id clients with fast renewal: the enrich
      // jobs resolve the SAME instances from the JVM registry, so the
      // test converges to fair shares in ms instead of the 5 s default
      Seq("exec-A", "exec-B").foreach(id =>
        graft.llm.InFlightBudget.clientFor("localhost", co.port, id, renewEveryMs = 50))
      def job(execId: String): Thread = new Thread(() => {
        val cfg = Enrich.Config(systemPrompt = "P", batchSize = 10, rowConcurrency = 8,
          budgetHostPort = Some(("localhost", co.port)), budgetClientId = execId)
        Enrich.enrich(corpus(40), 0, cfg, () => new EnrichProbes.ProbeClient).collect()
      })
      val jobs = Seq(job("exec-A"), job("exec-B"))
      jobs.foreach(_.start()); jobs.foreach(_.join(120000))
      assert(EnrichProbes.calls.get() == 80, "both jobs' calls observed")
      assert(EnrichProbes.maxSeen.get() <= 5,
        s"saw ${EnrichProbes.maxSeen.get()} concurrent calls, global budget was 5")
      assert(EnrichProbes.maxSeen.get() >= 2,
        "both lessees should be admitted (fair share, not serialization)")
    } finally co.stop()
  }

  test("idempotency key is stable per (requestId, row index)") {
    EnrichProbes.reset()
    val cfg = Enrich.Config(systemPrompt = "P", requestId = "req9", batchSize = 5)
    Enrich.enrich(corpus(12), 0, cfg, () => new EnrichProbes.KeyCapture).collect()
    import scala.jdk.CollectionConverters._
    assert(EnrichProbes.keys.asScala.toSet == (0 until 12).map(i => s"req9-$i").toSet)
  }

  test("deadline failure: every paid call attempted exactly once, under keyed identity") {
    // Spark local mode runs with task maxFailures = 1 — a deadline-failed
    // batch aborts the job rather than re-running the paid calls. This
    // test pins BOTH halves of the double-spend contract: (a) within the
    // single job attempt no (requestId, row) key is called twice, and
    // (b) every attempted call carried its stable key, so on a cluster
    // (where task retries DO re-run a batch) an idempotent proxy can
    // drop the duplicates the retry would otherwise double-spend.
    EnrichProbes.reset()
    val cfg = Enrich.Config(systemPrompt = "P", requestId = "dl1", batchSize = 5,
      rowConcurrency = 2, retries = 1, batchTimeoutMs = 600)
    val t0 = System.nanoTime()
    val ex = intercept[Exception] {
      Enrich.enrich(corpus(20), 0, cfg, () => new EnrichProbes.DeadlineClient("row7")).collect()
    }
    val secs = (System.nanoTime() - t0) / 1e9
    def chain(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(e => e +: chain(e.getCause))
    assert(chain(ex).exists(_.isInstanceOf[java.util.concurrent.TimeoutException]),
      s"expected the batch deadline, got: $ex")
    assert(secs < 20, f"deadline failure took $secs%.1f s — not bounded")
    import scala.jdk.CollectionConverters._
    val counts = EnrichProbes.keyCounts.asScala
    assert(counts.nonEmpty, "probe observed no calls")
    val doubled = counts.filter(_._2 > 1)
    assert(doubled.isEmpty, s"paid calls attempted more than once in one job attempt: $doubled")
    assert(counts.keys.forall(_.startsWith("dl1-")), "a call went out without its idempotency key")
  }

  test("StubLlmClient is a pure function of the prompt") {
    val c = new StubLlmClient(p => s"<<$p>>")
    assert(c.complete(LlmRequest("x", "m", 1, 0.0)) == "<<x>>")
  }

  test("enrichMany: N prompts in one pass, per-column responses, order kept") {
    val specs = Seq(
      Enrich.EnrichColumn(0, "CLASSIFY", "Category"),
      Enrich.EnrichColumn(1, "EXPLAIN", "Why"))
    val cfg = Enrich.Config(systemPrompt = "ignored", batchSize = 7, rowConcurrency = 4)
    // the response encodes which PROMPT and which CELL it saw
    val out = Enrich.enrichMany(corpus(23), specs, cfg,
        () => new StubLlmClient(p => p.linesIterator.next() + ":" + p.takeRight(4)))
      .select("val", "num", "_row_idx", "Category", "Why").collect()
    assert(out.length == 23)
    out.zipWithIndex.foreach { case (r, i) =>
      assert(r.getString(0) == s"row$i", s"order broken at $i")
      assert(r.getLong(2) == i)
      assert(r.getString(3).startsWith("CLASSIFY:"), "col 0's prompt")
      assert(r.getString(4).startsWith("EXPLAIN:"), "col 1's prompt")
      assert(r.getString(4).endsWith(i.toString), "col 1 saw the num cell")
    }
  }

  test("enrichMany: failure isolation is per call, not per row") {
    val specs = Seq(
      Enrich.EnrichColumn(0, "A", "ra"),
      Enrich.EnrichColumn(0, "B", "rb"))
    val cfg = Enrich.Config(systemPrompt = "", retries = 2, retryBaseDelayMs = 1L)
    // only prompt B on row3 fails
    val client = () => new StubLlmClient(_ => "fine",
      failOn = p => p.startsWith("B") && p.contains("row3"))
    val out = Enrich.enrichMany(corpus(6), specs, cfg, client)
      .select("ra", "rb").collect()
    assert(out.forall(_.getString(0) == "fine"), "column A untouched")
    assert(out(3).getString(1) == Enrich.ErrorSentinel)
    assert(out.zipWithIndex.filter(_._2 != 3).forall(_._1.getString(1) == "fine"))
  }

  test("enrichMany: maxRows tail blanks every output column; idem keys per column") {
    EnrichProbes.reset()
    val specs = Seq(
      Enrich.EnrichColumn(0, "A", "ra"),
      Enrich.EnrichColumn(1, "B", "rb"))
    val cfg = Enrich.Config(systemPrompt = "", maxRows = 4, batchSize = 3,
      requestId = "mc1")
    val out = Enrich.enrichMany(corpus(7), specs, cfg,
      () => new EnrichProbes.KeyCapture).collect()
    assert(out.length == 7)
    out.take(4).foreach(r => assert(r.getAs[String]("ra") == "ok" && r.getAs[String]("rb") == "ok"))
    out.drop(4).foreach(r => assert(r.getAs[String]("ra") == "" && r.getAs[String]("rb") == ""))
    val keys = EnrichProbes.keys
    assert(keys.size == 8, s"4 rows x 2 columns distinct keys, got $keys")
    assert(keys.contains("mc1-0-ra") && keys.contains("mc1-3-rb"))
  }

  test("enrichMany: rejects ambiguous or colliding specs") {
    val cfg = Enrich.Config(systemPrompt = "")
    intercept[IllegalArgumentException] {
      Enrich.enrichMany(corpus(3), Seq.empty, cfg, () => new StubLlmClient(_ => "x"))
    }
    intercept[IllegalArgumentException] {
      Enrich.enrichMany(corpus(3),
        Seq(Enrich.EnrichColumn(0, "p", "R"), Enrich.EnrichColumn(1, "q", "R")),
        cfg, () => new StubLlmClient(_ => "x"))
    }
    intercept[IllegalArgumentException] {
      Enrich.enrichMany(corpus(3), Seq(Enrich.EnrichColumn(0, "p", "val")),
        cfg, () => new StubLlmClient(_ => "x"))
    }
    intercept[IllegalArgumentException] {
      Enrich.enrichMany(corpus(3), Seq(Enrich.EnrichColumn(9, "p", "R")),
        cfg, () => new StubLlmClient(_ => "x"))
    }
  }

  test("fixedBatchKey: every batch ordinal lands in its own shuffle partition") {
    // the r21 arithmetic batching must not hash-collide two batch
    // ordinals into one task (that serializes the batch pool); tokens
    // are driver-searched to hit pairwise-distinct partitions
    import org.apache.spark.sql.functions.{col, spark_partition_id}
    for (nb <- Seq(2, 3, 5, 8)) {
      val df = spark.range(0, 2000).toDF("_row_idx")
      val key = Enrich.fixedBatchKey(0L, 2000L, nb, col("_row_idx"))
      val parts = df.repartition(nb, key)
        .select(spark_partition_id().as("p"), col("_row_idx"))
        .groupBy("p").count().collect()
      assert(parts.length == nb, s"nb=$nb: expected $nb non-empty partitions, got ${parts.length}")
      val sizes = parts.map(_.getLong(1))
      assert(sizes.max - sizes.min <= 2000 / nb + 1, s"nb=$nb skewed: ${sizes.mkString(",")}")
    }
  }

  // ---- cross-run durability (enrichResumable) ---------------------------

  private def resumeRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_resume").toString + "/cache"

  test("enrichResumable: killed mid-chunk, rerun pays ONLY the lost rows, output byte-identical") {
    EnrichProbes.reset()
    val root = resumeRoot()
    val df = corpus(30)
    // rowConcurrency=1 + chunkRows=10: strictly sequential rows, three
    // chunk commits; the client hangs on row 20 (chunk 3's first row) and
    // the 900ms batch deadline kills that chunk's job — chunks 1-2 are
    // already committed with 20 paid calls
    val cfg = Enrich.Config(systemPrompt = "P", rowConcurrency = 1,
      requestId = "resume-kill", retries = 1, retryBaseDelayMs = 1L,
      batchTimeoutMs = 900L)
    intercept[Throwable] {
      Enrich.enrichResumable(df, 0, cfg,
        () => new EnrichProbes.HangOnClient("Input: row20", EnrichProbes.echo),
        root, chunkRows = 10)
    }
    assert(EnrichProbes.calls.get() == 20,
      s"run 1 should have paid exactly the two committed chunks, paid ${EnrichProbes.calls.get()}")

    EnrichProbes.calls.set(0)
    val out = Enrich.enrichResumable(df, 0, cfg,
        () => new EnrichProbes.CountingClient(EnrichProbes.echo), root, chunkRows = 10)
      .select("val", "_row_idx", "Response").collect()
    assert(EnrichProbes.calls.get() == 10,
      s"rerun must pay only the 10 uncommitted rows, paid ${EnrichProbes.calls.get()}")
    assert(out.length == 30)
    out.zipWithIndex.foreach { case (r, i) =>
      assert(r.getString(0) == s"row$i" && r.getLong(1) == i,
        s"order broken at $i")
      assert(r.getString(2) == s"row$i", s"response wrong at $i: ${r.getString(2)}")
    }
    // byte-identical to a never-failed plain run over the same input
    val fresh = Enrich.enrich(df, 0, cfg.copy(batchTimeoutMs = 3600000L),
        () => new StubLlmClient(EnrichProbes.echo))
      .select("val", "_row_idx", "Response").collect()
    assert(out.map(_.toSeq).toSeq == fresh.map(_.toSeq).toSeq,
      "resumed output differs from a single-run enrich")
  }

  test("enrichResumable: completed request re-pays ZERO; config change invalidates the cache") {
    EnrichProbes.reset()
    val root = resumeRoot()
    val df = corpus(25)
    val cfg = Enrich.Config(systemPrompt = "P", rowConcurrency = 4,
      requestId = "resume-done", retryBaseDelayMs = 1L)
    val r1 = Enrich.enrichResumable(df, 0, cfg,
        () => new EnrichProbes.CountingClient(EnrichProbes.echo), root, chunkRows = 10)
      .select("val", "_row_idx", "Response").collect()
    assert(EnrichProbes.calls.get() == 25)

    EnrichProbes.calls.set(0)
    val r2 = Enrich.enrichResumable(df, 0, cfg,
        () => new EnrichProbes.CountingClient(EnrichProbes.echo), root, chunkRows = 10)
      .select("val", "_row_idx", "Response").collect()
    assert(EnrichProbes.calls.get() == 0, "a completed request must re-pay nothing")
    assert(r1.map(_.toSeq).toSeq == r2.map(_.toSeq).toSeq)

    // a different prompt is a DIFFERENT job: cached answers must not be
    // served to it (config_hash invalidation re-pays every row)
    EnrichProbes.calls.set(0)
    Enrich.enrichResumable(df, 0, cfg.copy(systemPrompt = "Q"),
        () => new EnrichProbes.CountingClient(EnrichProbes.echo), root, chunkRows = 10)
      .select("Response").collect()
    assert(EnrichProbes.calls.get() == 25,
      "changed prompt must invalidate the cache, not reuse stale answers")
  }

  test("enrichResumable: sentinel rows retry on rerun, successes never re-pay") {
    EnrichProbes.reset()
    val root = resumeRoot()
    val df = corpus(12)
    val cfg = Enrich.Config(systemPrompt = "P", rowConcurrency = 1,
      requestId = "resume-sentinel", retries = 1, retryBaseDelayMs = 1L)
    val r1 = Enrich.enrichResumable(df, 0, cfg,
        () => new EnrichProbes.FailOnClient("Input: row7", EnrichProbes.echo),
        root, chunkRows = 5)
      .select("_row_idx", "Response").collect()
    assert(EnrichProbes.calls.get() == 11)
    assert(r1.count(_.getString(1) == Enrich.ErrorSentinel) == 1,
      "row 7 should carry the sentinel after run 1")

    EnrichProbes.calls.set(0)
    val r2 = Enrich.enrichResumable(df, 0, cfg,
        () => new EnrichProbes.CountingClient(EnrichProbes.echo), root, chunkRows = 5)
      .select("_row_idx", "Response").collect()
    assert(EnrichProbes.calls.get() == 1,
      s"only the failed row retries, paid ${EnrichProbes.calls.get()}")
    assert(r2.forall(_.getString(1) != Enrich.ErrorSentinel))
    assert(r2.find(_.getLong(0) == 7L).get.getString(1) == "row7")
  }

  test("enrichResumable: requires a requestId") {
    intercept[IllegalArgumentException] {
      Enrich.enrichResumable(corpus(3), 0, Enrich.Config(systemPrompt = "P"),
        () => new StubLlmClient(_ => "x"), resumeRoot())
    }
  }

  test("enrichManyResumable: per-(row, column) durability — one column's failure never re-buys a sibling") {
    EnrichProbes.reset()
    val root = resumeRoot()
    val df = corpus(10)
    val cfg = Enrich.Config(systemPrompt = "ignored", rowConcurrency = 1,
      requestId = "many-resume", retries = 1, retryBaseDelayMs = 1L)
    val specs = Seq(
      Enrich.EnrichColumn(0, "A", "ColA"),
      Enrich.EnrichColumn(0, "B", "ColB"))
    // run 1: column B fails on row 7 (prompt B + row7) -> sentinel there
    val r1 = Enrich.enrichManyResumable(df, specs, cfg,
        () => new EnrichProbes.FailOnClient("B\n\nInput: row7", EnrichProbes.echo),
        root, chunkRows = 4)
      .select("_row_idx", "ColA", "ColB").collect()
    assert(EnrichProbes.calls.get() == 19, s"paid ${EnrichProbes.calls.get()}")
    assert(r1.count(_.getString(2) == Enrich.ErrorSentinel) == 1)
    assert(r1.forall(_.getString(1) != Enrich.ErrorSentinel))

    // rerun: ONLY ColB/row7 is re-paid; output fully clean
    EnrichProbes.calls.set(0)
    val r2 = Enrich.enrichManyResumable(df, specs, cfg,
        () => new EnrichProbes.CountingClient(EnrichProbes.echo), root, chunkRows = 4)
      .select("_row_idx", "ColA", "ColB").collect()
    assert(EnrichProbes.calls.get() == 1,
      s"only the failed (row, column) retries, paid ${EnrichProbes.calls.get()}")
    assert(r2.forall(r => r.getString(1) != Enrich.ErrorSentinel &&
      r.getString(2) != Enrich.ErrorSentinel))
    r2.foreach { r =>
      val i = r.getLong(0)
      assert(r.getString(1) == s"row$i" && r.getString(2) == s"row$i")
    }
  }

  test("enrichManyResumable: same prompt on two columns never cross-serves cached answers") {
    EnrichProbes.reset()
    val root = resumeRoot()
    // two INPUT columns with different content, enriched under the SAME
    // prompt: a cache keyed only on (request, row, prompt) would serve
    // column 0's answer to column 1
    val df = (0 until 8).map(i => (s"left$i", s"right$i")).toDF("l", "r")
    val cfg = Enrich.Config(systemPrompt = "P", rowConcurrency = 1,
      requestId = "cross-col", retryBaseDelayMs = 1L)
    val specs = Seq(
      Enrich.EnrichColumn(0, "P", "OutL"),
      Enrich.EnrichColumn(1, "P", "OutR"))
    val out = Enrich.enrichManyResumable(df, specs, cfg,
        () => new EnrichProbes.CountingClient(EnrichProbes.echo), root, chunkRows = 4)
      .select("_row_idx", "OutL", "OutR").collect()
    assert(EnrichProbes.calls.get() == 16, "both columns pay on first run")
    out.foreach { r =>
      val i = r.getLong(0)
      assert(r.getString(1) == s"left$i", s"OutL wrong at $i: ${r.getString(1)}")
      assert(r.getString(2) == s"right$i", s"OutR wrong at $i: ${r.getString(2)}")
    }
    // completed rerun: zero for BOTH columns
    EnrichProbes.calls.set(0)
    Enrich.enrichManyResumable(df, specs, cfg,
      () => new EnrichProbes.CountingClient(EnrichProbes.echo), root, chunkRows = 4)
      .select("OutL").collect()
    assert(EnrichProbes.calls.get() == 0)
  }
}
