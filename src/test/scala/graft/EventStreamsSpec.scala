package graft

import graft.streaming.EventStreams
import graft.streaming.EventStreams.{Event, SessionOut}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(min * 60000L)

  test("tumbling windows emit on watermark advance; late data is dropped") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.tumblingCounts(events, watermark = "10 minutes")
      .writeStream.format("memory").queryName("tumb").outputMode("append").start()
    try {
      // two events in hour-0 window, one in hour-1
      input.addData((ts(5), "click", 1.0), (ts(20), "click", 2.0), (ts(65), "view", 3.0))
      q.processAllAvailable()
      // advance watermark far past hour 1 => both windows close
      input.addData((ts(300), "view", 0.5))
      q.processAllAvailable()
      // this event's window (hour 0) is far behind the watermark => dropped
      input.addData((ts(7), "click", 100.0))
      q.processAllAvailable()
      val rows = spark.table("tumb")
        .select($"win_start", $"event_type", $"n", $"total_value")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      assert(rows.contains((ts(0), "click", 2L, 3.0)))   // late row NOT counted
      assert(rows.contains((ts(60), "view", 1L, 3.0)))
      assert(!rows.exists { case (w, t, n, v) => t == "click" && v == 103.0 })
    } finally q.stop()
  }

  test("streaming session_window groups events within the gap") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Double)]
    val events = input.toDF().toDF("ts", "user_id", "value")
    val q = EventStreams.sessionCounts(events, gap = "30 minutes", watermark = "10 minutes")
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      // user 1: two events 10 min apart (one session), then 90 min gap (new session)
      input.addData((ts(0), 1L, 1.0), (ts(10), 1L, 2.0), (ts(100), 1L, 4.0))
      q.processAllAvailable()
      input.addData((ts(1000), 2L, 9.0)) // advance watermark to close all sessions
      q.processAllAvailable()
      val rows = spark.table("sess")
        .select($"user_id", $"session_start", $"n_events", $"total_value")
        .as[(Long, Timestamp, Long, Double)].collect().toSet
      assert(rows.contains((1L, ts(0), 2L, 3.0)))
      assert(rows.contains((1L, ts(100), 1L, 4.0)))
    } finally q.stop()
  }

  test("transformWithState cap admits first k per key across micro-batches") {
    implicit val ctx = spark.sqlContext
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[(String, Long)]
    val q = EventStreams.streamingCapPerKey(input.toDF().toDF("source", "doc_id"),
        "source", "doc_id", k = 2)
      .writeStream.format("memory").queryName("cap").outputMode("append").start()
    try {
      input.addData(("a", 1L), ("a", 2L), ("a", 3L), ("b", 10L))
      q.processAllAvailable()
      // the cap must persist ACROSS batches: a is full, b has one slot left
      input.addData(("a", 4L), ("b", 11L), ("b", 12L))
      q.processAllAvailable()
      val got = spark.table("cap").as[(String, Long)].collect().toSet
      assert(got === Set(("a", 1L), ("a", 2L), ("b", 10L), ("b", 11L)))
    } finally {
      q.stop()
      prev match { case Some(v) => spark.conf.set(provKey, v); case None => spark.conf.unset(provKey) }
    }
  }

  test("flatMapGroupsWithState sessionizer closes sessions on event-time timeout") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.sessionize(input.toDS(), gapMs = 30 * 60000L, watermark = "0 seconds")
      .writeStream.format("memory").queryName("fmgs").outputMode("append").start()
    try {
      // NOTE: times start at minute 60 — an event whose ts equals the
      // current watermark (epoch 0 initially) is filtered as late.
      input.addData(Event(1L, ts(60), 1.0), Event(1L, ts(70), 2.0), Event(2L, ts(65), 5.0))
      q.processAllAvailable()
      // in-batch session split: 90-min gap closes the first session inline
      input.addData(Event(1L, ts(160), 4.0))
      q.processAllAvailable()
      // advance event time far ahead => remaining sessions time out
      input.addData(Event(3L, ts(1000), 0.0))
      q.processAllAvailable()
      input.addData(Event(3L, ts(2000), 0.0))
      q.processAllAvailable()
      val rows = spark.table("fmgs").as[SessionOut].collect()
        .map(s => (s.user_id, s.session_start, s.n_events, s.total_value)).toSet
      assert(rows.contains((1L, ts(60), 2, 3.0)))   // closed by the in-stream gap
      assert(rows.contains((1L, ts(160), 1, 4.0))) // closed by timeout
      assert(rows.contains((2L, ts(65), 1, 5.0)))   // closed by timeout
    } finally q.stop()
  }

  test("conversationAssemblyStream: out-of-order turns across batches render like batch") {
    implicit val ctx = spark.sqlContext
    import graft.streaming.EventStreams.{ConvOut, Turn}
    val input = MemoryStream[Turn]
    val q = EventStreams.conversationAssemblyStream(
        input.toDS(), gapMs = 30 * 60000L, watermark = "0 seconds")
      .writeStream.format("memory").queryName("conv").outputMode("append").start()
    try {
      // conv 1 split ACROSS micro-batches, turns out of order; a replay
      // of turn 1 with different content loses because its ts is later
      // (earliest (ts, role, content) wins — arrival-order-independent)
      input.addData(Turn(1L, 2, "assistant", "A2", ts(62)),
        Turn(1L, 0, "system", "S0", ts(60)))
      q.processAllAvailable()
      // second batch must sit at/after the watermark (ts 62 now) — the
      // replay shares a batch with the original, so iterator order is
      // genuinely arbitrary and only the (ts,...) rule can decide
      input.addData(Turn(1L, 1, "user", "U1", ts(63)),
        Turn(1L, 1, "user", "REPLAYED", ts(64)))
      q.processAllAvailable()
      // advance event time far past the gap => conv 1 times out and emits
      input.addData(Turn(9L, 0, "user", "x", ts(1000)))
      q.processAllAvailable()
      input.addData(Turn(9L, 1, "user", "y", ts(2000)))
      q.processAllAvailable()
      val out = spark.table("conv").as[ConvOut].collect()
      assert(out.length === 1)
      assert(out.head.conv_id === 1L && out.head.n_turns === 3)
      // EQUAL to the batch operator's render on the same turns
      val batch = graft.operators.Sft.renderConversations(
        Seq((1L, 0, "system", "S0"), (1L, 1, "user", "U1"),
          (1L, 2, "assistant", "A2"))
          .toDF("conv_id", "turn_idx", "role", "content"),
        "conv_id", "turn_idx", "role", "content")
        .select("rendered").as[String].head()
      assert(out.head.rendered === batch)
      assert(!out.head.rendered.contains("REPLAYED"))
    } finally q.stop()
  }

  test("toolTraceAssemblyStream: stream render of a tool-use trace equals " +
    "the batch withToolCallText + renderConversations composition") {
    implicit val ctx = spark.sqlContext
    import graft.streaming.EventStreams.{ConvOut, ToolTurn}
    val input = MemoryStream[ToolTurn]
    val q = EventStreams.toolTraceAssemblyStream(
        input.toDS(), gapMs = 30 * 60000L, watermark = "0 seconds")
      .writeStream.format("memory").queryName("toolconv").outputMode("append").start()
    try {
      // out of order, split across batches; turn 1 carries the tool call
      input.addData(
        ToolTurn(1L, 2, "tool", """{"temp":7}""", None, None, ts(62)),
        ToolTurn(1L, 0, "user", "weather?", None, None, ts(60)))
      q.processAllAvailable()
      input.addData(
        ToolTurn(1L, 1, "assistant", "Checking.",
          Some("get_weather"), Some("""{"city":"Oslo"}"""), ts(63)),
        ToolTurn(1L, 3, "assistant", "7 C.", None, None, ts(64)))
      q.processAllAvailable()
      input.addData(ToolTurn(9L, 0, "user", "x", None, None, ts(1000)))
      q.processAllAvailable()
      input.addData(ToolTurn(9L, 1, "user", "y", None, None, ts(2000)))
      q.processAllAvailable()
      val out = spark.table("toolconv").as[ConvOut].collect()
      assert(out.length === 1 && out.head.conv_id === 1L && out.head.n_turns === 4)
      val batchTurns = Seq(
        (1L, 0, "user", "weather?", None: Option[String], None: Option[String]),
        (1L, 1, "assistant", "Checking.", Some("get_weather"), Some("""{"city":"Oslo"}""")),
        (1L, 2, "tool", """{"temp":7}""", None: Option[String], None: Option[String]),
        (1L, 3, "assistant", "7 C.", None: Option[String], None: Option[String]))
        .toDF("conv_id", "turn_idx", "role", "content", "tool_name", "tool_args")
      val batch = graft.operators.Sft.renderConversations(
        graft.operators.Sft.withToolCallText(batchTurns, "content", "tool_name", "tool_args"),
        "conv_id", "turn_idx", "role", "content")
        .select("rendered").as[String].head()
      assert(out.head.rendered === batch)
      assert(out.head.rendered.contains(
        """Checking.<|tool_call|>get_weather({"city":"Oslo"})"""))
    } finally q.stop()
  }

  test("conversationAssemblyStream: maxTurns caps a runaway conversation") {
    implicit val ctx = spark.sqlContext
    import graft.streaming.EventStreams.{ConvOut, Turn}
    val input = MemoryStream[Turn]
    val q = EventStreams.conversationAssemblyStream(
        input.toDS(), gapMs = 60000L, watermark = "0 seconds", maxTurns = 3)
      .writeStream.format("memory").queryName("convcap").outputMode("append").start()
    try {
      // HIGH turn indexes arrive first, low ones later across a batch
      // boundary: the cap must keep the LOWEST 3 regardless of arrival
      input.addData((9 to 5 by -1).map(i =>
        Turn(5L, i, "user", s"c$i", ts(60))): _*)
      q.processAllAvailable()
      input.addData((4 to 0 by -1).map(i =>
        Turn(5L, i, "user", s"c$i", ts(61))): _*)
      q.processAllAvailable()
      input.addData(Turn(6L, 0, "user", "z", ts(5000)))
      q.processAllAvailable()
      input.addData(Turn(6L, 1, "user", "z", ts(9000)))
      q.processAllAvailable()
      val out = spark.table("convcap").as[ConvOut].collect()
      assert(out.length === 1 && out.head.n_turns === 3)
      assert(out.head.rendered ===
        "<|user|>\nc0\n<|end|>\n<|user|>\nc1\n<|end|>\n<|user|>\nc2\n<|end|>\n")
    } finally q.stop()
  }

  test("enrichStream enriches every micro-batch through the batch operator") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val collected = java.util.concurrent.ConcurrentHashMap.newKeySet[(String, String)]()
    val cfg = graft.operators.Enrich.Config(systemPrompt = "S", batchSize = 2)
    val q = EventStreams.enrichStream(
      input.toDF().toDF("text", "num"), 0, cfg,
      () => new graft.llm.StubLlmClient(p => p.takeRight(2))) { (batch, _) =>
      batch.select("text", "Response").collect().foreach(r =>
        collected.add((r.getString(0), r.getString(1))))
    }
    try {
      input.addData(("aa", 1L), ("bb", 2L))
      q.processAllAvailable()
      input.addData(("cc", 3L))
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(collected.asScala.toSet === Set(("aa", "aa"), ("bb", "bb"), ("cc", "cc")))
    } finally q.stop()
  }

  test("embedStream embeds every micro-batch; corpus is never re-embedded") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val collected = java.util.concurrent.ConcurrentHashMap.newKeySet[(Long, Seq[Float])]()
    // static probe (EmbedProbes): a client captured in the closure is a
    // deserialized COPY — instance counters never observe executor calls
    EmbedProbes.reset()
    val cfg = graft.operators.Embed.Config(textsPerCall = 2, batchSize = 10)
    val q = EventStreams.embedStream(
      input.toDF().toDF("doc_id", "text"), 1, cfg,
      () => new EmbedProbes.ProbeClient(dim = 1)) { (batch, _) =>
      batch.collect().foreach(r =>
        collected.add((r.getLong(0), r.getSeq[Float](r.length - 1))))
    }
    try {
      input.addData((1L, "aa"), (2L, "bbbb"))
      q.processAllAvailable()
      input.addData((3L, "cccccc"))
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(collected.asScala.toSet ===
        Set((1L, Seq(2.0f)), (2L, Seq(4.0f)), (3L, Seq(6.0f))))
      assert(EmbedProbes.inputsSeen.get() === 3,
        "each text embedded exactly once across micro-batches")
    } finally q.stop()
  }

  test("dropNearDupStream gates each micro-batch against the standing corpus") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val corpusText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val otherText = "one two three four five six seven eight nine ten"
    val corpus = Seq((1L, corpusText), (2L, otherText)).toDF("doc_id", "text")
    val survived = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val q = EventStreams.dropNearDupStream(
      input.toDF().toDF("doc_id", "text"), corpus, "doc_id", "text", threshold = 0.5) {
      (batch, _) => batch.select("doc_id").as[Long].collect().foreach(survived.add)
    }
    try {
      // batch 1: 100 duplicates corpus doc 1 (one word changed), 101 is novel
      input.addData((100L, corpusText.replace("kappa", "lambda")), (101L, "red green blue cyan magenta yellow black white pink gray"))
      q.processAllAvailable()
      // batch 2: 102 duplicates corpus doc 2 exactly, 103 is novel
      input.addData((102L, otherText), (103L, "spark scala stream batch corpus index shingle band join verify"))
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(survived.asScala.toSet === Set(101L, 103L),
        "near-dups of the corpus must be dropped in every micro-batch; novel docs pass")
    } finally q.stop()
  }

  test("streaming quality gate filters docs per micro-batch (stateless narrow ops)") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val docs = input.toDF().toDF("doc_id", "text", "lang")
    val q = EventStreams.qualityGateStream(docs)
      .writeStream.format("memory").queryName("qg_stream").outputMode("append").start()
    try {
      val good = ("the a and of is it in to or an " * 5).trim
      val spam = Array.fill(10)(good).mkString("\n") // dup-line rule kills it
      input.addData((1L, good, "en"), (2L, spam, "en"), (3L, good, "fr"))
      q.processAllAvailable()
      input.addData((4L, good, "en"))
      q.processAllAvailable()
      val got = spark.table("qg_stream").select("doc_id").as[Long].collect().toSet
      // doc 2: line spam; doc 3: langid says en, labeled fr
      assert(got === Set(1L, 4L))
    } finally q.stop()
  }

  test("compliance gate: licence routing + PII screening per micro-batch == batch on the same rows") {
    implicit val ctx = spark.sqlContext
    val mit = "Permission is hereby granted, free of charge, to any person obtaining a copy."
    val rows = Seq(
      (1L, s"$mit\ndef f(x):\n    return x"),                         // permissive, clean -> ADMIT
      (2L, "under the GNU General Public License, version 3 applies\ncode"), // copyleft -> drop
      (3L, s"$mit\ncard 4111 1111 1111 1111 on file"),                 // permissive but PII -> drop
      (4L, "no licence header at all"),                                // unknown -> drop
      (5L, "// SPDX-License-Identifier: Apache-2.0\nclean code"),      // tag permissive -> ADMIT
      (6L, s"$mit\nRef 4111 1111 1111 1112 is NOT a valid card"))      // luhn-invalid: clean -> ADMIT
    val input = MemoryStream[(Long, String)]
    val q = EventStreams.complianceGateStream(input.toDF().toDF("doc_id", "text"))
      .select("doc_id")
      .writeStream.format("memory").queryName("compl").outputMode("append").start()
    try {
      input.addData(rows.take(3): _*)
      q.processAllAvailable()
      input.addData(rows.drop(3): _*) // cross-batch: gate is stateless
      q.processAllAvailable()
      val streamed = spark.table("compl").as[Long].collect().toSet
      assert(streamed === Set(1L, 5L, 6L), s"got $streamed")
      // ONE implementation: the same call on a batch frame agrees
      val batch = EventStreams.complianceGateStream(rows.toDF("doc_id", "text"))
        .select("doc_id").as[Long].collect().toSet
      assert(batch === streamed)
    } finally q.stop()
  }

  test("streaming domain gate drops blocklisted hosts per micro-batch") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "url")
    val q = EventStreams.domainFilterStream(docs, "url", Seq("badsite.biz"))
      .writeStream.format("memory").queryName("dom_stream").outputMode("append").start()
    try {
      input.addData(
        (1L, "https://news.example.com/a"),
        (2L, "https://spam.badsite.biz/b"),   // subdomain of blocked
        (3L, "https://notbadsite.biz/c"))     // string suffix, NOT subdomain
      q.processAllAvailable()
      input.addData((4L, "https://badsite.biz/d")) // exact, later batch
      q.processAllAvailable()
      val got = spark.table("dom_stream").select("doc_id").as[Long].collect().toSet
      assert(got === Set(1L, 3L))
    } finally q.stop()
  }

  test("corpusSketchStream maintains the novelty artifact across micro-batches") {
    implicit val ctx = spark.sqlContext
    import graft.operators.Snapshot
    val input = MemoryStream[Long]
    val docs = input.toDF().toDF("doc_id")
    val dir = java.nio.file.Files.createTempDirectory("graft_sk_stream").toString + "/sk"
    val q = EventStreams.corpusSketchStream(docs, "doc_id", dir)
    try {
      input.addData(0L until 2000L: _*)
      q.processAllAvailable()
      input.addData(1000L until 3000L: _*) // half overlaps batch 1
      q.processAllAvailable()
      // corpus sketch now covers [0, 3000); a probe batch of 500 known +
      // 500 new ids must read ~50% novel against it
      val probe = ((500L until 1000L) ++ (10000L until 10500L)).toDF("doc_id")
      val r = Snapshot.batchVsCorpusSketch(probe, "doc_id", dir).collect()(0)
      assert(r.getAs[Long]("batch_distinct") === 1000L)
      assert(math.abs(r.getAs[Long]("new_est") - 500L) <= 30,
        s"new=${r.getAs[Long]("new_est")}")
      assert(math.abs(r.getAs[Double]("new_fraction") - 0.5) < 0.05)
    } finally q.stop()
  }

  test("heavyHittersStream: streamed summary obeys the whole-history MG bound") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[String]
    val docs = input.toDF().toDF("domain")
    val dir = java.nio.file.Files.createTempDirectory("graft_hh_stream").toString + "/hh"
    val k = 8
    val q = EventStreams.heavyHittersStream(docs, "domain", k, dir)
    // true counts across BOTH batches: big=900 (600+300), mid=300
    // (100+200), 30 noise domains x10
    val batch1 = Seq.fill(600)("big.com") ++ Seq.fill(100)("mid.org") ++
      (0 until 30).flatMap(i => Seq.fill(5)(s"noise$i.net"))
    val batch2 = Seq.fill(300)("big.com") ++ Seq.fill(200)("mid.org") ++
      (0 until 30).flatMap(i => Seq.fill(5)(s"noise$i.net"))
    try {
      input.addData(new scala.util.Random(3).shuffle(batch1): _*)
      q.processAllAvailable()
      input.addData(new scala.util.Random(4).shuffle(batch2): _*)
      q.processAllAvailable()
      val rows = spark.read.parquet(dir)
        .select($"item", $"cnt", $"total_n").as[(String, Long, Long)].collect()
      val n = rows.head._3
      assert(n === batch1.size + batch2.size, "running total spans the stream")
      val est = rows.map(r => r._1 -> r._2).toMap
      val truth = Map("big.com" -> 900L, "mid.org" -> 300L) ++
        (0 until 30).map(i => s"noise$i.net" -> 10L)
      val bound = n.toDouble / (k + 1)
      // every theta-heavy item survives the cross-batch merges
      truth.foreach { case (d, c) =>
        if (c > bound) assert(est.contains(d), s"$d (true=$c) must survive")
      }
      // and no estimate violates the undercount bound
      est.foreach { case (d, e) =>
        assert(e <= truth(d), s"$d overcounted")
        assert(truth(d) - e <= bound, s"$d undercounted past n/(k+1)")
      }
      assert(rows.length <= k, "artifact stays k rows")
    } finally q.stop()
  }

  test("streaming dedup drops duplicate keys within the watermark") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val events = input.toDF().toDF("ts", "event_id", "payload")
    val q = EventStreams.streamingDedup(events, Seq("event_id"), watermark = "1 hour")
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      input.addData((ts(0), 1L, "a"), (ts(1), 1L, "a"), (ts(2), 2L, "b"))
      q.processAllAvailable()
      input.addData((ts(3), 1L, "a"), (ts(4), 3L, "c"))
      q.processAllAvailable()
      val n = spark.table("dedup").count()
      assert(n == 3) // event_ids 1, 2, 3 — exactly once each (same (id, ts) dup dropped)
    } finally q.stop()
  }

  test("urlFrontierStream admits one arrival per CANONICAL url, aliases collapse") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val docs = input.toDF().toDF("ts", "crawl_id", "url")
    val q = EventStreams.urlFrontierStream(docs, "url", watermark = "1 hour")
      .writeStream.format("memory").queryName("frontier").outputMode("append").start()
    try {
      // four aliases of ONE page: case, default port, utm noise, fragment
      input.addData(
        (ts(0), 1L, "http://Example.com/a?b=2&a=1"),
        (ts(1), 2L, "HTTP://EXAMPLE.COM:80/a?a=1&b=2&utm_source=x"),
        (ts(2), 3L, "http://example.com/a?b=2&a=1#frag"),
        (ts(3), 4L, "https://other.org/b"))
      q.processAllAvailable()
      input.addData((ts(4), 5L, "http://example.com/a?a=1&b=2"))
      q.processAllAvailable()
      val got = spark.table("frontier")
        .select("crawl_id", "canon_url").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      // one admission per canonical form (which alias represents it
      // within a micro-batch is unspecified); the LATER batch's alias
      // (id 5) must stay suppressed by standing state
      val byCanon = got.groupBy(_._2)
      assert(got.size === 2 && byCanon.keySet ===
        Set("http://example.com/a?a=1&b=2", "https://other.org/b"), s"$got")
      assert(byCanon("http://example.com/a?a=1&b=2").keySet.subsetOf(Set(1L, 2L, 3L)),
        s"the second batch's alias must not be re-admitted: $got")
    } finally q.stop()
  }

  test("stream-stream interval join pairs each left event with in-window right events only") {
    implicit val ctx = spark.sqlContext
    val purchases = MemoryStream[(Timestamp, Long, Double)]
    val clicks = MemoryStream[(Timestamp, Long, String)]
    val joined = EventStreams.intervalJoin(
      purchases.toDF().toDF("p_ts", "user_id", "amount"),
      clicks.toDF().toDF("c_ts", "user_id", "page"),
      keyCol = "user_id", leftTs = "p_ts", rightTs = "c_ts",
      lookback = "10 minutes", watermark = "30 minutes")
    val q = joined.writeStream.format("memory").queryName("ivj").outputMode("append").start()
    try {
      clicks.addData((ts(0), 7L, "home"), (ts(55), 7L, "pricing"), (ts(58), 8L, "docs"))
      purchases.addData((ts(60), 7L, 9.99))
      q.processAllAvailable()
      // only user 7's click at t=55 is within [50, 60]; t=0 is stale,
      // user 8 is a different key
      val got = spark.table("ivj").select("page").collect().map(_.getString(0)).toSeq
      assert(got == Seq("pricing"), s"got $got")

      // a later right-side event inside a later purchase's window still joins
      clicks.addData((ts(118), 7L, "faq"))
      purchases.addData((ts(120), 7L, 19.99))
      q.processAllAvailable()
      assert(spark.table("ivj").count() == 2)
    } finally q.stop()
  }

  // ---- landing-directory contract: restart recovery ----------------------

  private def landingDirs(): (String, String, String) = {
    val base = java.nio.file.Files.createTempDirectory("graft-landing-").toString
    (s"$base/landing", s"$base/out", s"$base/chk")
  }

  private def land(dir: String, rows: Seq[(Long, String, Timestamp)]): Unit =
    rows.toDF("id", "k", "ts").coalesce(1).write.mode("append").parquet(dir)

  private def schemaDf = Seq.empty[(Long, String, Timestamp)].toDF("id", "k", "ts")

  private def readOut(outDir: String): Seq[Long] =
    spark.read.parquet(outDir).select("id").as[Long].collect().toSeq.sorted

  test("landing restart: committed files are never reprocessed, new files are picked up") {
    val (landing, out, chk) = landingDirs()
    land(landing, (0L until 10L).map(i => (i, s"k$i", ts(i))))
    val q1 = EventStreams.runLandingToParquet(spark, landing, schemaDf, identity, out, chk)
    q1.awaitTermination() // AvailableNow: self-stops when caught up
    assert(readOut(out) == (0L until 10L), "first run emits the landed rows once")

    land(landing, (10L until 20L).map(i => (i, s"k$i", ts(i))))
    val q2 = EventStreams.runLandingToParquet(spark, landing, schemaDf, identity, out, chk)
    q2.awaitTermination()
    assert(readOut(out) == (0L until 20L),
      "restart from the checkpoint processes ONLY the new files — old rows exactly once")
  }

  test("landing restart: stateful dedup state survives — a cross-restart duplicate stays suppressed") {
    val (landing, out, chk) = landingDirs()
    def dedup(df: org.apache.spark.sql.DataFrame) =
      EventStreams.streamingDedup(df, Seq("k"))
    land(landing, Seq((1L, "a", ts(600)), (2L, "b", ts(600))))
    val q1 = EventStreams.runLandingToParquet(spark, landing, schemaDf, dedup, out, chk)
    q1.awaitTermination()
    assert(readOut(out) == Seq(1L, 2L))

    // "b" lands AGAIN after the restart, within the watermark window
    land(landing, Seq((3L, "b", ts(630)), (4L, "c", ts(630))))
    val q2 = EventStreams.runLandingToParquet(spark, landing, schemaDf, dedup, out, chk)
    q2.awaitTermination()
    assert(readOut(out) == Seq(1L, 2L, 4L),
      "recovered state store still knows key b — the duplicate is dropped, c passes")
  }

  test("landing restart from a LOADED classifier model: gate identical across restart, old rows once") {
    // batch job trains + persists the gate model ONCE; every stream
    // (re)start loads the ARTIFACT — across a restart the reloaded model
    // must gate new arrivals exactly as the first load did, and the
    // checkpoint must keep committed files unreprocessed
    val trainRows = (0 until 60).map { i =>
      if (i % 2 == 0) (s"good clean prose number $i", 1)
      else (s"zz$i spammy junk zz$i", 0)
    }
    val model = graft.operators.Classifier.trainHashedText(
      trainRows.toDF("text", "y"), "text", "y",
      buckets = 1 << 10, iters = 6, lr = 2.0)
    val modelPath = java.nio.file.Files.createTempDirectory("graft_gate_model").toString
    graft.operators.Classifier.saveHashed(spark, model, modelPath)

    val (landing, out, chk) = landingDirs()
    val docSchema = Seq.empty[(Long, String, Timestamp)].toDF("id", "text", "ts")
    def landDocs(rows: Seq[(Long, String, Timestamp)]): Unit =
      rows.toDF("id", "text", "ts").coalesce(1).write.mode("append").parquet(landing)
    def gate(df: org.apache.spark.sql.DataFrame) =
      EventStreams.classifierGateStream(df,
        graft.operators.Classifier.loadHashed(spark, modelPath))

    landDocs(Seq((1L, "good clean prose number 2", ts(0)),
      (2L, "zz9 spammy junk zz9", ts(0))))
    val q1 = EventStreams.runLandingToParquet(spark, landing, docSchema, gate, out, chk)
    q1.awaitTermination()
    assert(readOut(out) == Seq(1L), "first run keeps only the good doc")

    landDocs(Seq((3L, "good clean prose number 4", ts(30)),
      (4L, "zz7 spammy junk zz7", ts(30))))
    val q2 = EventStreams.runLandingToParquet(spark, landing, docSchema, gate, out, chk)
    q2.awaitTermination()
    assert(readOut(out) == Seq(1L, 3L),
      "restart reloads the model artifact and gates identically; committed rows exactly once")
  }

  test("landing restart: URL-frontier state survives — a cross-restart alias stays suppressed") {
    val (landing, out, chk) = landingDirs()
    def frontier(df: org.apache.spark.sql.DataFrame) =
      EventStreams.urlFrontierStream(df.withColumnRenamed("k", "url"), "url")
    land(landing, Seq((1L, "http://Example.com/a?b=2&a=1", ts(600)),
      (2L, "https://other.org/x", ts(600))))
    val q1 = EventStreams.runLandingToParquet(spark, landing, schemaDf, frontier, out, chk)
    q1.awaitTermination()
    assert(readOut(out) == Seq(1L, 2L))

    // an ALIAS of page 1 (case + default port + utm + fragment) lands
    // AFTER the restart, within the watermark window
    land(landing, Seq((3L, "HTTP://EXAMPLE.COM:80/a?a=1&b=2&utm_source=x#f", ts(630)),
      (4L, "https://new.org/y", ts(630))))
    val q2 = EventStreams.runLandingToParquet(spark, landing, schemaDf, frontier, out, chk)
    q2.awaitTermination()
    assert(readOut(out) == Seq(1L, 2L, 4L),
      "recovered state knows the canonical form — the alias drops, the new page passes")
  }

  test("landing crash mid-batch: no partial rows visible; retry lands the batch exactly once") {
    val (landing, out, chk) = landingDirs()
    val crash = org.apache.spark.sql.functions.udf { (id: Long) =>
      if (id == 13L && EventStreamsProbes.armed.compareAndSet(true, false))
        throw new RuntimeException("injected crash")
      id
    }
    def transform(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("id", crash(org.apache.spark.sql.functions.col("id")))

    land(landing, Seq((1L, "a", ts(0)), (2L, "b", ts(1))))
    EventStreamsProbes.armed.set(false)
    val q1 = EventStreams.runLandingToParquet(spark, landing, schemaDf, transform, out, chk)
    q1.awaitTermination()
    assert(readOut(out) == Seq(1L, 2L))

    // batch 2 carries the poison row; the query dies mid-batch
    land(landing, Seq((12L, "c", ts(2)), (13L, "d", ts(3)), (14L, "e", ts(4))))
    EventStreamsProbes.armed.set(true)
    val q2 = EventStreams.runLandingToParquet(spark, landing, schemaDf, transform, out, chk)
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] { q2.awaitTermination() }
    assert(readOut(out) == Seq(1L, 2L),
      "a crashed batch must leak NOTHING into the committed view of the sink")

    // restart: the same batch retries (the kill switch is spent) and commits once
    val q3 = EventStreams.runLandingToParquet(spark, landing, schemaDf, transform, out, chk)
    q3.awaitTermination()
    assert(readOut(out) == Seq(1L, 2L, 12L, 13L, 14L),
      "the retried batch lands exactly once — no dupes of rows from its failed attempt")
  }

  test("Merge sink crash AFTER commit: the replayed micro-batch no-ops across restart") {
    import graft.sources.Merge
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = java.nio.file.Files.createTempDirectory("graft_ingest_restart").toString
    val chk = java.nio.file.Files.createTempDirectory("graft_ingest_restart_ckpt").toString
    Merge.init(Seq((0L, "seed")).toDF("id", "text"), root, "id", nBuckets = 4)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    // worst-case window: the Merge manifest commits, then the sink dies
    // BEFORE the streaming checkpoint records the batch — on restart the
    // SAME batchId replays into the table
    val sink: (org.apache.spark.sql.DataFrame, Long) => Unit = (df, id) => {
      Merge.foreachBatchUpsert(root)(df, id)
      if (EventStreamsProbes.armed.compareAndSet(true, false))
        throw new RuntimeException("injected crash after Merge commit")
    }
    def start() = in.toDF().toDF("id", "text").writeStream
      .foreachBatch(sink).option("checkpointLocation", chk).start()
    EventStreamsProbes.armed.set(true)
    val q1 = start()
    in.addData((1L, "a"), (2L, "b"))
    intercept[Exception](q1.processAllAvailable())
    q1.stop()
    assert(Merge.versions(spark, root) === Seq(0, 1),
      "the batch committed to the table before the crash")
    // restart: batch 0 REPLAYS (the checkpoint never saw it complete);
    // upsertBatch observes lastBatchId >= 0 and must no-op — a re-apply
    // would mint version 2
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert(Merge.versions(spark, root) === Seq(0, 1),
      "replayed batch no-ops: exactly-once across the restart, no duplicate version")
    assert(Merge.read(spark, root).orderBy("id").as[(Long, String)].collect().toSeq ===
      Seq((0L, "seed"), (1L, "a"), (2L, "b")))
  }

  test("ingest pipeline e2e: landing -> near-dup gate -> Merge, crash mid-stream, zero dup / zero lost") {
    // the three exactly-once cases COMPOSED as one pipeline (the shape
    // pipeline_ingest gates in batch form): files land, each micro-batch
    // gates against the CURRENT corpus (so later batches dedup vs
    // just-landed docs too), survivors upsert exactly-once — and the
    // crash hits the worst window, AFTER the Merge commit but BEFORE the
    // streaming checkpoint records the batch
    import graft.sources.Merge
    val base = java.nio.file.Files.createTempDirectory("graft-e2e-").toString
    val (landing, chk, root) = (s"$base/landing", s"$base/chk", s"$base/corpus")
    def txt(i: Long) = s"document body $i with plenty of shared shingle words " +
      s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i eta$i theta$i"
    Merge.init((0L until 10L).map(i => (i, txt(i))).toDF("id", "text"), root,
      "id", nBuckets = 8)
    def landDocs(rows: Seq[(Long, String)]): Unit =
      rows.toDF("id", "text").coalesce(1).write.mode("append").parquet(landing)
    val docSchema = Seq.empty[(Long, String)].toDF("id", "text")
    val sink: (org.apache.spark.sql.DataFrame, Long) => Unit = (batch, id) => {
      val fresh = graft.operators.Dedup.dropNearDupAgainst(
        Merge.read(spark, root), batch, "id", "text", 0.5)
      Merge.foreachBatchUpsert(root)(fresh, id)
      if (EventStreamsProbes.armed.compareAndSet(true, false))
        throw new RuntimeException("injected crash after Merge commit")
    }
    def start() = EventStreams.fileSource(spark, landing, docSchema).writeStream
      .foreachBatch(sink).option("checkpointLocation", chk)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()

    // batch 0: ten novel docs + three re-crawls of standing-corpus texts
    landDocs((10L until 20L).map(i => (i, txt(i))) ++
      Seq((100L, txt(1)), (101L, txt(2)), (102L, txt(3))))
    EventStreamsProbes.armed.set(true)
    val q1 = start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException](q1.awaitTermination())
    assert(Merge.versions(spark, root) === Seq(0, 1),
      "batch 0's survivors committed to the table before the crash")

    // restart: batch 0 replays (checkpoint never saw it finish); the
    // gate now drops everything (the corpus already holds those texts)
    // AND upsertBatch observes lastBatchId — either way, no new version
    val q2 = start()
    q2.awaitTermination()
    assert(Merge.versions(spark, root) === Seq(0, 1),
      "replayed batch no-ops — zero duplicates across the restart")

    // batch 1 after the restart: two novel docs + a re-crawl of a doc
    // the STREAM itself landed (dup only vs the grown corpus)
    landDocs(Seq((200L, txt(12)), (20L, txt(20)), (21L, txt(21))))
    val q3 = start()
    q3.awaitTermination()
    val rows = Merge.read(spark, root).as[(Long, String)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq === (0L until 22L).toSeq,
      "zero lost: every novel doc landed; zero dup: every re-crawl dropped")
    assert(rows.map(_._2).distinct.length === rows.length,
      "corpus texts are pairwise distinct — no near-dup slipped through")
  }

  test("backfill: AvailableNow replay through the LIVE graph equals the batch twin " +
    "(tumbling windows, sessionizer, quality gate — one code path)") {
    import org.apache.spark.sql.functions.{col, round => fround}
    val base = java.nio.file.Files.createTempDirectory("graft-backfill-").toString
    // ---- historical events: 3 users over ~3 hours, two landed files
    val hist = s"$base/hist"
    val rows = Seq(
      (1L, ts(5), 1.0, "click"), (1L, ts(20), 2.0, "click"),
      (2L, ts(10), 3.0, "view"), (2L, ts(70), 4.0, "view"),
      (3L, ts(65), 5.0, "click"), (1L, ts(130), 6.0, "view"),
      (2L, ts(95), 7.0, "click"), (3L, ts(170), 8.0, "view"))
    rows.take(4).toDF("user_id", "ts", "value", "event_type")
      .coalesce(1).write.mode("append").parquet(hist)
    rows.drop(4).toDF("user_id", "ts", "value", "event_type")
      .coalesce(1).write.mode("append").parquet(hist)
    val histBatch = spark.read.parquet(hist)
    val evSchema = Seq.empty[(Long, Timestamp, Double, String)]
      .toDF("user_id", "ts", "value", "event_type")
    // sentinel: event time far past horizon + watermark, reserved key
    def sentinel = Seq((-1L, ts(100000), 0.0, "sentinel"))
      .toDF("user_id", "ts", "value", "event_type")

    // ---- 1) tumbling windows: the SAME function serves stream and batch
    // (withWatermark is a no-op on a batch frame) — the strongest
    // one-code-path statement available
    EventStreams.backfill(spark, hist, evSchema,
      df => EventStreams.tumblingCounts(df, watermark = "30 minutes"),
      s"$base/out_t", s"$base/chk_t",
      flushSentinel = Some(sentinel), maxFilesPerBatch = Some(1))
    val gotT = spark.read.parquet(s"$base/out_t")
      .filter(col("event_type") =!= "sentinel")
      .collect().map(_.toSeq).toSet
    val wantT = EventStreams.tumblingCounts(histBatch, watermark = "30 minutes")
      .collect().map(_.toSeq).toSet
    assert(gotT === wantT, s"tumbling: stream $gotT vs batch $wantT")
    assert(gotT.nonEmpty && gotT.size >= 4, "the flush sentinel must close EVERY real window")

    // ---- 2) custom-state sessionizer vs the declarative batch twin
    // (session_window over the same frame, same 30-minute gap)
    EventStreams.backfill(spark, hist, evSchema,
      df => EventStreams.sessionize(
        df.select(col("user_id"), col("ts"), col("value")).as[Event],
        gapMs = 30L * 60000L, watermark = "30 minutes").toDF(),
      s"$base/out_s", s"$base/chk_s",
      flushSentinel = Some(sentinel), maxFilesPerBatch = Some(1))
    val gotS = spark.read.parquet(s"$base/out_s")
      .filter(col("user_id") =!= -1L)
      .select(col("user_id"), col("session_start"),
        col("n_events").cast("long"), fround(col("total_value"), 2))
      .collect().map(_.toSeq).toSet
    val wantS = EventStreams.sessionCounts(histBatch,
        gap = "30 minutes", watermark = "30 minutes")
      .select(col("user_id"), col("session_start"),
        col("n_events").cast("long"), fround(col("total_value"), 2))
      .collect().map(_.toSeq).toSet
    assert(gotS === wantS, s"sessions: stream $gotS vs batch $wantS")
    assert(gotS.size >= 5, "every user's final session must flush, not die in state")

    // ---- 3) stateless quality gate: no sentinel needed, same operator
    val docs = Seq(
      (1L, "en", "the quick brown fox jumps over the lazy dog and it is a fine day in the park"),
      (2L, "en", "spam spam spam spam spam spam spam spam spam spam spam spam"),
      (3L, "en", "a reasonable second document with enough varied words to clear the quality gate today"))
      .toDF("doc_id", "lang", "text")
    val dhist = s"$base/dhist"
    docs.coalesce(1).write.parquet(dhist)
    val docSchema = Seq.empty[(Long, String, String)].toDF("doc_id", "lang", "text")
    EventStreams.backfill(spark, dhist, docSchema,
      df => EventStreams.qualityGateStream(df).select("doc_id", "lang", "text"),
      s"$base/out_q", s"$base/chk_q")
    val gotQ = spark.read.parquet(s"$base/out_q").select("doc_id")
      .as[Long].collect().toSet
    val wantQ = graft.operators.TextAnalysis.qualityGate(spark.read.parquet(dhist))
      .select("doc_id").as[Long].collect().toSet
    assert(gotQ === wantQ, "gate: one shared implementation, identical survivors")
  }

  test("sentinelGlob qualifies paths: absolute, scheme-qualified, and relative inputs " +
    "all yield an absolute one-filesystem glob") {
    // absolute local POSIX — the only shape the old string splice handled
    assert(EventStreams.sentinelGlob(spark, "/a/hist", "/a/chk/flush_sentinel")
      === "file:///{a/hist,a/chk/flush_sentinel}")
    // scheme-qualified input must not double-prefix
    assert(EventStreams.sentinelGlob(spark, "file:/a/hist", "/a/chk/s")
      === "file:///{a/hist,a/chk/s}")
    // a RELATIVE dir qualifies against the session filesystem's working
    // directory instead of silently building a cwd-relative glob
    val rel = EventStreams.sentinelGlob(spark, "relhist", "/a/chk/s")
    assert(rel.startsWith("file:///") && rel.contains("relhist") && !rel.startsWith("file:///{rel"),
      s"relative dir must qualify to an absolute path: $rel")
  }

  test("backfill reads a SCHEME-QUALIFIED historical dir through the sentinel glob") {
    val base = java.nio.file.Files.createTempDirectory("graft-backfill-uri-").toString
    val docs = Seq(
      (1L, "en", "the quick brown fox jumps over the lazy dog and it is a fine day in the park"),
      (2L, "en", "spam spam spam spam spam spam spam spam spam spam spam spam"))
      .toDF("doc_id", "lang", "text")
    val dhist = s"$base/dhist"
    docs.coalesce(1).write.parquet(dhist)
    val docSchema = Seq.empty[(Long, String, String)].toDF("doc_id", "lang", "text")
    // sentinel present -> the glob path is exercised; historicalDir is
    // scheme-qualified (file:), which the old splice turned into garbage
    val sentinel = Seq((-1L, "en", "sentinel row that does not matter for a stateless gate"))
      .toDF("doc_id", "lang", "text")
    EventStreams.backfill(spark, s"file:$dhist", docSchema,
      df => EventStreams.qualityGateStream(df).select("doc_id", "lang", "text"),
      s"$base/out_q", s"$base/chk_q", flushSentinel = Some(sentinel))
    val got = spark.read.parquet(s"$base/out_q").select("doc_id")
      .as[Long].collect().toSet
    val want = graft.operators.TextAnalysis.qualityGate(spark.read.parquet(dhist))
      .select("doc_id").as[Long].collect().toSet
    assert(got.filter(_ >= 0) === want, "qualified-path backfill must read the historical dir")
  }

  test("anomalyScore: streaming monitor emits exactly the gated batch rows") {
    import org.apache.spark.sql.functions.{avg, hour, stddev_pop, weekday}
    implicit val ctx = spark.sqlContext
    // train the profile on a batch slice of the real fixture, then feed
    // the SAME events through a MemoryStream: the stateless stream-
    // static join must reproduce the oracle-gated batch output row for row
    val sf = "/root/testdata/sf0.001"
    val ev = graft.sources.Tables.events(spark, sf)
      .select($"event_id", $"ts", $"event_type", $"value").cache()
    val cells = ev
      .select($"event_type", $"value",
        (weekday($"ts") + 1).as("dow"), hour($"ts").as("hr"))
      .groupBy($"event_type", $"dow", $"hr")
      .agg(avg($"value").as("mu"), stddev_pop($"value").as("sd"))
      .cache()
    val batch = EventStreams.anomalyScore(ev, cells)
      .collect().map(_.toSeq).toSet
    val input = MemoryStream[(Long, Timestamp, String, Double)]
    val stream = input.toDF().toDF("event_id", "ts", "event_type", "value")
    val q = EventStreams.anomalyScore(stream, cells)
      .writeStream.format("memory").queryName("anom").outputMode("append").start()
    try {
      input.addData(ev.as[(Long, Timestamp, String, Double)].collect().toSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("anom").collect().map(_.toSeq).toSet
      assert(streamed === batch, s"stream ${streamed.size} rows vs batch ${batch.size}")
    } finally q.stop()
    ev.unpersist()
    cells.unpersist()
    ()
  }
}

/** JVM-wide kill switch for the crash-injection case (UDFs close over
  * nothing; local mode shares the JVM, so a static flag reaches tasks). */
object EventStreamsProbes {
  val armed = new java.util.concurrent.atomic.AtomicBoolean(false)
}
