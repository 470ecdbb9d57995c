package graft

import graft.operators.Sft
import org.apache.spark.sql.functions._

class SftSpec extends SparkSpec {
  import spark.implicits._

  private val turns = Seq(
    // conv 0, deliberately out of input order — render must sort
    (0L, 2, "assistant", "Sure: 42."),
    (0L, 0, "system", "Be terse."),
    (0L, 1, "user", "Answer?"),
    // conv 1: assistant FIRST (prefix window is empty -> 0), then two
    // more assistant turns around a user turn
    (1L, 0, "assistant", "Hi"),
    (1L, 1, "user", "Who?"),
    (1L, 2, "assistant", "Me")
  ).toDF("conv_id", "turn_idx", "role", "content")

  test("renderConversations: template, turn order, n_turns") {
    val out = Sft.renderConversations(turns, "conv_id", "turn_idx", "role", "content")
      .orderBy("conv_id").collect()
    assert(out.length === 2)
    assert(out(0).getString(1) ===
      "<|system|>\nBe terse.\n<|end|>\n<|user|>\nAnswer?\n<|end|>\n<|assistant|>\nSure: 42.\n<|end|>\n")
    assert(out(0).getLong(2) === 3L)
    assert(out(1).getString(1) ===
      "<|assistant|>\nHi\n<|end|>\n<|user|>\nWho?\n<|end|>\n<|assistant|>\nMe\n<|end|>\n")
  }

  test("assistantSpans: substring of the render recovers the content exactly") {
    val rendered = Sft.renderConversations(turns, "conv_id", "turn_idx", "role", "content")
    val spans = Sft.assistantSpans(turns, "conv_id", "turn_idx", "role", "content")
    val joined = spans.join(rendered, Seq("conv_id"))
      .select($"conv_id", $"turn_idx", $"start", $"end",
        expr("substring(rendered, cast(start as int) + 1, cast(end - start as int))").as("got"))
      .orderBy("conv_id", "turn_idx").collect()
    // conv 0: one assistant turn; conv 1: two (one at turn 0 — null prefix)
    assert(joined.map(r => (r.getLong(0), r.getInt(1), r.getString(4))).toSeq ===
      Seq((0L, 2, "Sure: 42."), (1L, 0, "Hi"), (1L, 2, "Me")))
    // the turn-0 assistant starts right after its template prefix
    val first = joined.find(r => r.getLong(0) == 1L && r.getInt(1) == 0).get
    assert(first.getLong(2) === "<|assistant|>\n".length.toLong)
  }

  test("preferencePairs: argmax/argmin, deterministic ties, zero-margin dropped") {
    val d = Seq(
      // prompt 0: clear winner/loser
      (0L, 0, "a", 5), (0L, 1, "b", 9), (0L, 2, "c", 1),
      // prompt 1: max-score tie (ids 1,2) -> chosen is LOWEST id;
      // min-score tie (ids 0,3) -> rejected is LOWEST id
      (1L, 0, "p", 2), (1L, 1, "q", 7), (1L, 2, "r", 7), (1L, 3, "s", 2),
      // prompt 2: all equal -> margin 0 -> dropped
      (2L, 0, "x", 4), (2L, 1, "y", 4)
    ).toDF("prompt_id", "resp_id", "response", "score")
    val out = Sft.preferencePairs(d, "prompt_id", "resp_id", "response", "score")
      .orderBy("prompt_id").collect()
    assert(out.length === 2)
    assert(out(0).toSeq === Seq(0L, 1, "b", 9, 2, "c", 1, 8))
    assert(out(1).toSeq === Seq(1L, 1, "q", 7, 0, "p", 2, 5))
  }

  test("curriculumIndex: a contiguous permutation matching the global order") {
    val n = 500
    val d = spark.range(n).toDF("id")
      .withColumn("diff", pmod(col("id") * 13L, lit(40L)))
    val bucket = expr("diff div 10") // 4 buckets
    val key = pmod(col("id") * 48271L, lit(104729L))
    val out = Sft.curriculumIndex(d, "id", bucket, key, salts = 3)
      .select("id", "bucket", "train_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // permutation of 0..n-1
    assert(out.map(_._3).sorted.toSeq === (0L until n).toSeq)
    // matches the single global sort by (bucket, salt, key, id)
    val expected = out.map { case (id, b, _) =>
      val k = (id * 48271L) % 104729L
      (b, k % 3, k, id)
    }.sorted.map(_._4).zipWithIndex.map { case (id, i) => id -> i.toLong }.toMap
    for ((id, _, idx) <- out) assert(idx === expected(id), s"id $id")
  }

  test("packBlocks/packSpans: start-offset assignment, offsets, span survival") {
    // one group; cap 10: doc0 len 6 starts at 0 -> block 0; doc1 len 8
    // starts at 6 -> block 0 (overflows it, never split); doc2 len 4
    // starts at 14 -> block 1
    val r = Seq((0L, "aaaaaa", "g"), (1L, "bbbbbbbb", "g"), (2L, "cccc", "g"))
      .toDF("id", "text", "grp")
    val blocks = Sft.packBlocks(r, "id", "text", "grp", 10L)
      .orderBy("chunk").collect()
    assert(blocks.map(b => (b.getLong(1), b.getString(2), b.getLong(3))).toSeq ===
      Seq((0L, "aaaaaa" + "bbbbbbbb", 2L), (1L, "cccc", 1L)))
    // spans: doc1's [2,5) must land at block offset 6 (after doc0)
    val spans = Seq((0L, 1L, 3L), (1L, 2L, 5L), (2L, 0L, 4L))
      .toDF("id", "start", "end")
    val remap = Sft.packSpans(r, "id", "text", "grp", 10L, spans, "start", "end")
      .select("id", "chunk", "block_start", "block_end").orderBy("id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(remap.toSeq === Seq((0L, 0L, 1L, 3L), (1L, 0L, 8L, 11L), (2L, 1L, 0L, 4L)))
    // extraction from the packed block recovers the original span
    val block0 = blocks(0).getString(2)
    assert(block0.substring(8, 11) === "bbbbbbbb".substring(2, 5))
  }

  test("leakFreeSplit: clusters move as units, split is rep-deterministic") {
    val d = Seq(
      (0L, "aaa"), (1L, "bbb"), (2L, "aaa"),   // cluster {0,2} rep 0
      (3L, "ccc"), (4L, "bbb"), (5L, "bbb")    // cluster {1,4,5} rep 1
    ).toDF("id", "key")
    val out = Sft.leakFreeSplit(d, "id", col("key"), valPct = 30, testPct = 30)
      .select("id", "rep", "split").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // same key -> same rep -> same split (cluster atomicity)
    val byId = out.map(t => t._1 -> t).toMap
    assert(byId(0L)._3 === byId(2L)._3 && byId(0L)._2 === 0L)
    assert(byId(1L)._3 === byId(4L)._3 && byId(4L)._3 === byId(5L)._3)
    assert(byId(1L)._2 === 1L && byId(4L)._2 === 1L)
    // split is the documented pure function of rep
    def expected(rep: Long): String = {
      val b = (rep * 48271L) % 100L
      if (b < 30) "test" else if (b < 60) "val" else "train"
    }
    for ((_, rep, split) <- out) assert(split === expected(rep))
  }

  test("leakFreeSplit: assignments are stable under append-only growth") {
    // refresh = the same corpus plus LARGER-id arrivals (some joining
    // existing clusters): every pre-existing row keeps its split
    val before = Seq((0L, "ka"), (1L, "kb"), (2L, "ka")).toDF("id", "key")
    val after = before.unionAll(
      Seq((10L, "ka"), (11L, "kc")).toDF("id", "key"))
    def splits(d: org.apache.spark.sql.DataFrame) =
      Sft.leakFreeSplit(d, "id", col("key"), valPct = 30, testPct = 30)
        .select("id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = splits(before); val a = splits(after)
    for ((id, s) <- b) assert(a(id) === s, s"id $id moved on refresh")
    // the new cluster member inherits its cluster's split
    assert(a(10L) === a(0L))
  }

  test("leakFreeSplit: snowflake-scale ids don't overflow the split arithmetic") {
    // raw id * 48271 would wrap a Long for ids ~2e14+; the pre-reduced
    // form must equal the mathematical (rep * 48271) mod 100
    val big = 4611686018427387900L // ~2^62
    val d = Seq((big, "k1"), (big - 7L, "k2")).toDF("id", "key")
    val out = Sft.leakFreeSplit(d, "id", col("key"), valPct = 10, testPct = 10)
      .select("rep", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def expected(rep: Long): String = {
      val b = ((rep % 100L) * 48271L) % 100L
      if (b < 10) "test" else if (b < 20) "val" else "train"
    }
    for ((rep, split) <- out) assert(split === expected(rep))
  }

  test("assistantSpans: duplicated turn_idx stays consistent with the render") {
    // at-least-once ingestion can duplicate a turn_idx with different
    // content; render sorts by (idx, role, content) and the spans window
    // must order identically, or offsets drift off the rendered text
    val turns = Seq(
      (7L, 0, "user", "Q"),
      (7L, 1, "assistant", "AAA"),
      (7L, 1, "assistant", "B")  // duplicate idx, different content
    ).toDF("conv_id", "turn_idx", "role", "content")
    val rendered = Sft.renderConversations(turns, "conv_id", "turn_idx", "role", "content")
    val spans = Sft.assistantSpans(turns, "conv_id", "turn_idx", "role", "content")
    val got = spans.join(rendered, Seq("conv_id"))
      .select(expr("substring(rendered, cast(start as int) + 1, cast(end - start as int))"))
      .as[String].collect().sorted
    assert(got.toSeq === Seq("AAA", "B"))
  }

  test("leakFreeSplit: fractions roughly honored over many singleton clusters") {
    val d = spark.range(1000).toDF("id").withColumn("key", col("id"))
    val counts = Sft.leakFreeSplit(d, "id", col("key"), valPct = 10, testPct = 10)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("train") > 700 && counts("train") < 900)
    assert(counts("val") > 50 && counts("val") < 150)
    assert(counts("test") > 50 && counts("test") < 150)
  }

  test("curriculumIndex: single bucket, salts wider than data") {
    val d = spark.range(5).toDF("id")
    val out = Sft.curriculumIndex(d, "id", lit(0L), col("id"), salts = 64)
      .select("id", "train_idx").as[(Long, Long)].collect().sorted
    // key = id, salt = id%64 = id -> global order (0, id, id, id) = id order
    assert(out.toSeq === (0L until 5).map(i => (i, i)))
  }

  test("bestOfN: only the first n ordinals compete; ties go to the lowest id") {
    val rows = Seq(
      // prompt 0: k=2 has the top score but sits OUTSIDE n=2
      (0L, 0L, "a", 5L), (0L, 1L, "b", 7L), (0L, 2L, "c", 99L),
      // prompt 1: tie between k=0 and k=1 -> lowest id wins
      (1L, 0L, "x", 4L), (1L, 1L, "y", 4L), (1L, 2L, "z", 1L))
      .toDF("p", "k", "resp", "score")
    val out = graft.operators.Sft.bestOfN(rows, "p", "k", "resp", "score", n = 2)
      .orderBy("p").collect()
    assert(out(0).getAs[Long]("best_id") == 1L && out(0).getAs[String]("best") == "b",
      "k=2 must not compete under n=2")
    assert(out(0).getAs[Long]("n_candidates") == 2L)
    assert(out(1).getAs[Long]("best_id") == 0L, "score tie must break to the lowest id")
  }

  test("rejectionSample: threshold drops prompts entirely; cap keeps top-scored, id tiebreak") {
    val rows = Seq(
      (0L, 0L, 10L), (0L, 1L, 30L), (0L, 2L, 20L), (0L, 3L, 30L), // cap 2 of 4 survivors? threshold 15 keeps 3
      (1L, 0L, 5L), (1L, 1L, 9L))                                  // all below threshold -> prompt vanishes
      .toDF("p", "k", "score")
    val out = graft.operators.Sft.rejectionSample(rows, "p", "k", "score",
        minScore = 15.0, maxPerPrompt = 2)
      .select("p", "k", "rk").orderBy("p", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.toSeq === Seq((0L, 1L, 1), (0L, 3L, 2)),
      "keep the two best >= 15 (tie 30/30 breaks to lower id first), prompt 1 gone")
  }

  // one agentic conversation: assistant calls a tool, tool answers,
  // assistant concludes — the modern trace shape
  private def toolTurns = Seq(
    (0L, 0, "user", "weather in Oslo?", None: Option[String], None: Option[String]),
    (0L, 1, "assistant", "Checking.", Some("get_weather"), Some("""{"city":"Oslo"}""")),
    (0L, 2, "tool", """{"temp":7}""", None: Option[String], None: Option[String]),
    (0L, 3, "assistant", "It is 7 C.", None: Option[String], None: Option[String])
  ).toDF("conv_id", "turn_idx", "role", "content", "tool_name", "tool_args")

  test("toolTraceSpans: content and tool_call spans both substring-recover; " +
    "tool-result turns contribute no span") {
    val rendered = Sft.renderConversations(
      Sft.withToolCallText(toolTurns, "content", "tool_name", "tool_args"),
      "conv_id", "turn_idx", "role", "content")
    val spans = Sft.toolTraceSpans(toolTurns, "conv_id", "turn_idx", "role",
      "content", "tool_name", "tool_args")
    val got = spans.join(rendered, Seq("conv_id"))
      .select($"turn_idx", $"kind",
        expr("substring(rendered, cast(start as int) + 1, cast(end - start as int))"))
      .orderBy("turn_idx", "kind")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    assert(got.toSeq === Seq(
      (1, "content", "Checking."),
      (1, "tool_call", """get_weather({"city":"Oslo"})"""),
      (3, "content", "It is 7 C.")))
    // the rendered assistant turn carries the marker + call inline
    val r0 = rendered.collect()(0).getAs[String]("rendered")
    assert(r0.contains("""Checking.<|tool_call|>get_weather({"city":"Oslo"})"""))
    assert(r0.contains("<|tool|>\n{\"temp\":7}\n<|end|>\n"),
      "tool result renders as its own turn")
  }

  test("toolTraceSpans/withToolCallText: a NULL-args tool call renders as " +
    "name() in BOTH batch and stream paths, never NULLing the turn") {
    val t = Seq(
      (0L, 0, "assistant", "Now:", Some("get_time"), None: Option[String]),
      (0L, 1, "tool", "12:00", None: Option[String], None: Option[String])
    ).toDF("conv_id", "turn_idx", "role", "content", "tool_name", "tool_args")
    val rendered = Sft.renderConversations(
      Sft.withToolCallText(t, "content", "tool_name", "tool_args"),
      "conv_id", "turn_idx", "role", "content").collect()(0)
    assert(rendered.getAs[String]("rendered")
      .contains("Now:<|tool_call|>get_time()"), "batch render drops NULL args, not the turn")
    assert(rendered.getAs[Long]("n_turns") === 2L)
    val spans = Sft.toolTraceSpans(t, "conv_id", "turn_idx", "role",
      "content", "tool_name", "tool_args")
      .orderBy("turn_idx", "kind").collect()
    assert(spans.length === 2)
    val call = spans.find(_.getString(2) == "tool_call").get
    // span covers exactly "get_time()" — end must be a number, not null
    assert(call.getLong(4) - call.getLong(3) === "get_time()".length.toLong)
    // string twin (the streaming path's builder) agrees
    assert(Sft.toolCallTextStr("Now:", "get_time", null) ===
      "Now:<|tool_call|>get_time()")
  }

  test("toMessagesWithTools: JSONL roundtrip keeps tool_calls on exactly " +
    "the calling turns and json writer omits the null field") {
    val msgs = Sft.toMessagesWithTools(toolTurns, "conv_id", "turn_idx",
      "role", "content", "tool_name", "tool_args")
    val dir = java.nio.file.Files.createTempDirectory("sft_tools_jsonl").toString
    msgs.write.mode("overwrite").json(dir)
    val back = spark.read.schema(msgs.schema).json(dir)
      .select($"conv_id", posexplode($"messages"))
      .select($"pos", $"col.role", $"col.content", $"col.tool_calls")
      .orderBy("pos").collect()
    assert(back.length === 4)
    assert(back.map(_.getString(1)).toSeq === Seq("user", "assistant", "tool", "assistant"))
    val calls = back(1).getSeq[org.apache.spark.sql.Row](3)
    assert(calls.length === 1 &&
      calls.head.getString(0) === "get_weather" &&
      calls.head.getString(1) === """{"city":"Oslo"}""")
    assert(back(0).isNullAt(3) && back(2).isNullAt(3) && back(3).isNullAt(3))
    // raw JSONL line: non-calling turns have NO tool_calls key at all
    val line = scala.io.Source.fromFile(
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".json")).head)
      .getLines().next()
    assert(line.contains(""""tool_calls":[{"name":"get_weather""""))
    assert(!line.contains(""""role":"user","content":"weather in Oslo?","tool_calls""""))
  }
}
