package graft

import graft.llm.{EmbedClient, EmbedRequest, RateLimitedException, StubEmbedClient}
import graft.operators.Embed
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col

/** Static (per-JVM) probes — same rationale as EnrichProbes: clients are
  * serialized into task closures, so only a shared object observes
  * executor-side behavior in local mode. */
object EmbedProbes {
  val calls = new java.util.concurrent.atomic.AtomicInteger(0)
  val inputsSeen = new java.util.concurrent.atomic.AtomicInteger(0)
  val maxCallSize = new java.util.concurrent.atomic.AtomicInteger(0)
  val inFlight = new java.util.concurrent.atomic.AtomicInteger(0)
  val maxInFlight = new java.util.concurrent.atomic.AtomicInteger(0)
  val keys: java.util.Set[String] = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  val throttledOnce: java.util.Set[String] = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  val attempts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  def reset(): Unit = {
    calls.set(0); inputsSeen.set(0); maxCallSize.set(0)
    inFlight.set(0); maxInFlight.set(0)
    keys.clear(); throttledOnce.clear(); attempts.clear()
  }

  class ProbeClient(dim: Int = 2) extends EmbedClient with Serializable {
    override def embed(req: EmbedRequest): Seq[Array[Float]] = {
      val cur = inFlight.incrementAndGet()
      maxInFlight.updateAndGet(m => math.max(m, cur))
      calls.incrementAndGet()
      inputsSeen.addAndGet(req.inputs.size)
      maxCallSize.updateAndGet(m => math.max(m, req.inputs.size))
      if (req.idempotencyKey.nonEmpty) keys.add(req.idempotencyKey)
      Thread.sleep(5)
      inFlight.decrementAndGet()
      req.inputs.map(t => Array(t.length.toFloat, 1.0f).take(dim))
    }
  }

  /** 429s each call's first attempt (keyed on the call's first input),
    * succeeds on retry. */
  class ThrottleOnceClient extends EmbedClient with Serializable {
    override def embed(req: EmbedRequest): Seq[Array[Float]] = {
      attempts.merge(req.inputs.head, 1, (a, b) => a + b)
      if (throttledOnce.add(req.inputs.head)) throw new RateLimitedException(10L)
      req.inputs.map(t => Array(t.length.toFloat))
    }
  }

  /** Counts successfully EMBEDDED texts; hangs on a marker input (the
    * batch deadline then kills the job — the mid-chunk-kill for resume
    * tests). */
  class HangOnEmbedClient(marker: String) extends EmbedClient with Serializable {
    override def embed(req: EmbedRequest): Seq[Array[Float]] = {
      if (req.inputs.exists(_.contains(marker))) Thread.sleep(600000L)
      inputsSeen.addAndGet(req.inputs.size)
      req.inputs.map(t => Array(t.length.toFloat, (t.length % 7).toFloat))
    }
  }

  /** Counting success-only client for the resume ledger. */
  class CountingEmbedClient(failOn: String => Boolean = _ => false)
      extends EmbedClient with Serializable {
    override def embed(req: EmbedRequest): Seq[Array[Float]] = {
      if (req.inputs.exists(failOn)) throw new RuntimeException("stub embed failure")
      inputsSeen.addAndGet(req.inputs.size)
      req.inputs.map(t => Array(t.length.toFloat, (t.length % 7).toFloat))
    }
  }
}

class EmbedSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) =
    (0 until n).map(i => (i.toLong, "x" * (i % 7 + 1))).toDF("id", "text")

  test("vectors align per-row and input order is restored exactly") {
    val df = docs(137)
    val cfg = Embed.Config(textsPerCall = 10, batchSize = 40, callConcurrency = 3)
    val out = Embed.embed(df, 1, cfg, () => new StubEmbedClient(
      t => Array(t.length.toFloat, t.hashCode.toFloat)))
    val rows = out.collect()
    assert(rows.length === 137)
    // partition-ordered collect — ids must come back 0..136 in order
    assert(rows.map(_.getLong(0)).toSeq === (0L until 137L))
    rows.foreach { r =>
      val text = r.getString(1)
      val vec = r.getSeq[Float](r.length - 1)
      assert(vec === Seq(text.length.toFloat, text.hashCode.toFloat),
        s"vector misaligned for id ${r.getLong(0)}")
    }
  }

  test("batching: ceil(n/textsPerCall) calls per partition, none above the cap") {
    EmbedProbes.reset()
    val df = docs(100)
    // one partition (batchSize >= n) -> exactly ceil(100/16) = 7 calls
    val cfg = Embed.Config(textsPerCall = 16, batchSize = 1000, callConcurrency = 4,
      requestId = "embed-batch-1")
    val out = Embed.embed(df, 1, cfg, () => new EmbedProbes.ProbeClient())
    assert(out.count() === 100)
    assert(EmbedProbes.calls.get() === 7, "ceil(100/16) batched calls")
    assert(EmbedProbes.inputsSeen.get() === 100, "every text sent exactly once")
    assert(EmbedProbes.maxCallSize.get() <= 16)
    assert(EmbedProbes.keys.size() === 7, "one idempotency key per chunk")
    assert(EmbedProbes.keys.stream().allMatch(k => k.startsWith("embed-batch-1-")))
  }

  test("sliding window keeps at most callConcurrency calls in flight") {
    EmbedProbes.reset()
    val df = docs(120)
    val cfg = Embed.Config(textsPerCall = 5, batchSize = 1000, callConcurrency = 3)
    Embed.embed(df, 1, cfg, () => new EmbedProbes.ProbeClient()).count()
    assert(EmbedProbes.maxInFlight.get() <= 3,
      s"saw ${EmbedProbes.maxInFlight.get()} concurrent calls, cap 3")
  }

  test("failure isolation: a failed call nulls exactly its own chunk") {
    val df = docs(60)
    // poison one text: calls containing a length-3 'xxx' text fail;
    // with textsPerCall=1 ONLY those rows are nulled
    val cfg = Embed.Config(textsPerCall = 1, batchSize = 1000,
      callConcurrency = 4, retries = 2, retryBaseDelayMs = 1L)
    val out = Embed.embed(df, 1, cfg,
      () => new StubEmbedClient(t => Array(t.length.toFloat), failOn = _ == "xxx"))
    val rows = out.collect()
    val (failed, ok) = rows.partition(_.getString(1) == "xxx")
    assert(failed.nonEmpty && failed.forall(_.isNullAt(rows.head.length - 1)))
    assert(ok.forall(!_.isNullAt(rows.head.length - 1)))
    assert(Embed.errorCount(out) === failed.length.toLong)
  }

  test("429 first attempt is retried; every row still embeds") {
    EmbedProbes.reset()
    // unique texts: the probe keys attempts on each call's first input,
    // and chunk composition within a partition is shuffle-read order
    val df = (0 until 40).map(i => (i.toLong, s"t$i")).toDF("id", "text")
    val cfg = Embed.Config(textsPerCall = 8, batchSize = 1000,
      callConcurrency = 2, retryBaseDelayMs = 1L)
    val out = Embed.embed(df, 1, cfg, () => new EmbedProbes.ThrottleOnceClient)
    // ONE action: each extra action re-executes the paid mapPartitions
    val rows = out.collect()
    assert(rows.length === 40)
    assert(rows.forall(!_.isNullAt(rows.head.length - 1)), "no row may fail")
    // each chunk: 1 throttled attempt + 1 success
    EmbedProbes.attempts.forEach((_, n) => assert(n === 2))
  }

  test("client returning wrong vector count fails the call into nulls, not misalignment") {
    val df = docs(10)
    val cfg = Embed.Config(textsPerCall = 5, batchSize = 1000,
      callConcurrency = 2, retries = 1, retryBaseDelayMs = 1L)
    val bad = () => new EmbedClient with Serializable {
      override def embed(req: EmbedRequest): Seq[Array[Float]] =
        req.inputs.drop(1).map(t => Array(t.length.toFloat)) // one short
    }
    val out = Embed.embed(df, 1, cfg, bad)
    assert(Embed.errorCount(out) === 10L, "short responses must never shift rows")
  }

  test("HttpEmbedClient: wire shape round-trip, index-tagged results re-sorted") {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(0), 0)
    server.createContext("/v1/embeddings", ex => {
      val body = new String(ex.getRequestBody.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      val inputs = (JsonMethods.parse(body) \ "input").asInstanceOf[JArray]
        .arr.map(_.asInstanceOf[JString].s)
      // answer in REVERSED index order — client must sort by index;
      // "DUPIDX" inputs simulate a buggy provider tagging everything 0
      val data = inputs.zipWithIndex.reverse.map { case (t, i) =>
        val idx = if (inputs.exists(_.contains("DUPIDX"))) 0 else i
        s"""{"index":$idx,"embedding":[${t.length}.0,7]}"""
      }.mkString("[", ",", "]")
      val resp = s"""{"data":$data}""".getBytes(java.nio.charset.StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(200, resp.length); ex.getResponseBody.write(resp); ex.close()
    })
    server.start()
    try {
      val client = new graft.llm.HttpEmbedClient(
        s"http://localhost:${server.getAddress.getPort}/v1", "test-key")
      val out = client.embed(graft.llm.EmbedRequest(
        Seq("a", "bb\n\"q\"", "ccc"), "m", "k-1"))
      assert(out.map(_.toSeq) === Seq(Seq(1.0f, 7.0f), Seq(6.0f, 7.0f), Seq(3.0f, 7.0f)),
        "vectors must realign to input order (and JSON-escaped text round-trips)")
      // env seam: the same OPENAI_* vars the completions path reads
      val viaEnv = graft.llm.EmbedClients.fromEnv(Map(
        "OPENAI_BASE_URL" -> s"http://localhost:${server.getAddress.getPort}/v1",
        "OPENAI_API_KEY" -> "k"))()
      assert(viaEnv.embed(graft.llm.EmbedRequest(Seq("xyz"), "m"))
        .head.toSeq === Seq(3.0f, 7.0f))
      // a duplicated index would pass the count check but misalign rows
      // — the client must reject it, not silently shift vectors
      val ex = intercept[IllegalArgumentException] {
        client.embed(graft.llm.EmbedRequest(Seq("DUPIDX", "b"), "m"))
      }
      assert(ex.getMessage.contains("not 0..1"))
    } finally server.stop(0)
  }

  test("null cells embed as the string 'nan' (Enrich parity)") {
    val df = Seq((1L, "a"), (2L, null), (3L, "ccc")).toDF("id", "text")
    val out = Embed.embed(df, 1, Embed.Config(textsPerCall = 2, batchSize = 10),
      () => new StubEmbedClient(t => Array(t.length.toFloat)))
    val byId = out.collect().map(r => r.getLong(0) -> r.getSeq[Float](r.length - 1)).toMap
    assert(byId(2L) === Seq(3.0f), "null -> \"nan\" -> length 3")
  }

  // ---- cross-run durability (embedResumable) ----------------------------

  test("embedResumable: killed mid-chunk, rerun pays only the lost texts, output identical") {
    EmbedProbes.reset()
    val root = java.nio.file.Files.createTempDirectory("graft_embed_resume").toString + "/cache"
    // 30 distinct-length rows, 1 text per call, sequential: chunk size 10
    val df = (0 until 30).map(i => (i.toLong, "y" * (i + 1))).toDF("id", "text")
    val cfg = graft.operators.Embed.Config(textsPerCall = 1, callConcurrency = 1,
      requestId = "embed-kill", retries = 1, retryBaseDelayMs = 1L,
      batchTimeoutMs = 900L)
    // row 20 has length 21 -> the marker string of 21 y's hangs chunk 3
    intercept[Throwable] {
      graft.operators.Embed.embedResumable(df, 1, cfg,
        () => new EmbedProbes.HangOnEmbedClient("y" * 21), root, chunkRows = 10)
    }
    assert(EmbedProbes.inputsSeen.get() == 20,
      s"run 1 should pay exactly the two committed chunks, paid ${EmbedProbes.inputsSeen.get()}")

    EmbedProbes.inputsSeen.set(0)
    val out = graft.operators.Embed.embedResumable(df, 1, cfg,
        () => new EmbedProbes.CountingEmbedClient(), root, chunkRows = 10)
      .select("id", "embedding").collect()
    assert(EmbedProbes.inputsSeen.get() == 10,
      s"rerun must pay only the 10 uncommitted texts, paid ${EmbedProbes.inputsSeen.get()}")
    assert(out.length == 30)
    out.foreach { r =>
      val i = r.getLong(0)
      val v = r.getSeq[Float](1)
      assert(v == Seq((i + 1).toFloat, ((i + 1) % 7).toFloat), s"vector wrong at $i: $v")
    }
  }

  test("embedResumable: completed rerun pays zero; null-embedding rows retry") {
    EmbedProbes.reset()
    val root = java.nio.file.Files.createTempDirectory("graft_embed_resume").toString + "/cache"
    val df = (0 until 12).map(i => (i.toLong, "y" * (i + 1))).toDF("id", "text")
    val cfg = graft.operators.Embed.Config(textsPerCall = 1, callConcurrency = 1,
      requestId = "embed-null", retries = 1, retryBaseDelayMs = 1L)
    // row 7 (length 8) fails its call -> NULL embedding persisted
    val r1 = graft.operators.Embed.embedResumable(df, 1, cfg,
        () => new EmbedProbes.CountingEmbedClient(failOn = _ == "y" * 8),
        root, chunkRows = 5)
      .select("id", "embedding").collect()
    assert(EmbedProbes.inputsSeen.get() == 11)
    assert(r1.count(_.isNullAt(1)) == 1, "row 7 should carry NULL after run 1")

    EmbedProbes.inputsSeen.set(0)
    val r2 = graft.operators.Embed.embedResumable(df, 1, cfg,
        () => new EmbedProbes.CountingEmbedClient(), root, chunkRows = 5)
      .select("id", "embedding").collect()
    assert(EmbedProbes.inputsSeen.get() == 1,
      s"only the failed row retries, paid ${EmbedProbes.inputsSeen.get()}")
    assert(r2.forall(!_.isNullAt(1)))
  }
}
