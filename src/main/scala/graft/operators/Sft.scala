package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Supervised-fine-tuning / alignment sample preparation `[EXT]`: the
  * stages between a curated corpus and an SFT/DPO training set.
  *
  * The reference service (test.py) stops at enriched rows; a
  * fine-tuning pipeline additionally needs (a) conversation turns
  * rendered into ONE training string under a chat template, (b) the
  * loss mask over that string (loss on assistant content only —
  * InstructGPT-style SFT), (c) preference pairs (chosen vs rejected
  * response per prompt — the DPO/RLHF comparison format, Rafailov et
  * al. 2023 §3), and (d) a curriculum ordering that assigns every
  * sample a contiguous global training index without a single-partition
  * global sort.
  *
  * Everything here is a declarative DataFrame transform: Catalyst keeps
  * pushdown/pruning, and each operator is one keyed shuffle (or none),
  * so the shapes hold on a 1000-executor cluster.
  */
object Sft {

  /** Chat template: a turn renders as
    * `prefixOpen + role + prefixClose + content + suffix`.
    * Defaults to `<|role|>\n…content…\n<|end|>\n` — structurally the
    * published ChatML shape, spelled with ASCII-only delimiters so the
    * DuckDB oracle twin reproduces it with plain `||`/`chr(10)`. */
  final case class ChatTemplate(prefixOpen: String = "<|",
                                prefixClose: String = "|>\n",
                                suffix: String = "\n<|end|>\n") {
    /** Rendered length of a turn, as a Column over (role, content) —
      * used by [[assistantSpans]] to locate content without re-rendering. */
    def segLen(role: Column, content: Column): Column =
      length(role) + length(content) +
        lit(prefixOpen.length + prefixClose.length + suffix.length)
    def segment(role: Column, content: Column): Column =
      concat(lit(prefixOpen), role, lit(prefixClose), content, lit(suffix))
    /** Driver/executor-side render of one turn — the STRING twin of
      * [[segment]], shared with the streaming assembler so batch and
      * stream renders can never drift. */
    def segmentStr(role: String, content: String): String =
      prefixOpen + role + prefixClose + content + suffix
  }

  /** Render (convId, turnIdx, role, content) rows into one training
    * string per conversation, turns in `turnIdx` order.
    *
    * Output: `convCol | rendered | n_turns` (n_turns is bigint).
    *
    * Scale shape: ONE keyed shuffle (groupBy conv) with map-side
    * partial `collect_list`; the sort and the template render happen
    * per-conversation on an array of turns — `transform` here is in the
    * per-row-once position (one output row per conversation), not under
    * a generator, so the measured HOF-regeneration trap does not apply.
    * Conversations are bounded (chat depth), so the collected array is
    * bounded — this is the standard "group is small, corpus is huge"
    * aggregation. */
  def renderConversations(df: DataFrame, convCol: String, idxCol: String,
                          roleCol: String, contentCol: String,
                          t: ChatTemplate = ChatTemplate()): DataFrame = {
    val turns = sort_array(collect_list(
      struct(col(idxCol).as("i"), col(roleCol).as("r"), col(contentCol).as("c"))))
    df.groupBy(col(convCol))
      .agg(turns.as("_turns"))
      .select(col(convCol),
        array_join(transform(col("_turns"),
          x => t.segment(x.getField("r"), x.getField("c"))), "").as("rendered"),
        size(col("_turns")).cast("long").as("n_turns"))
  }

  /** Messages-format export shape — the OpenAI-style SFT handoff file:
    * one row per conversation with `messages = [{role, content} …]` in
    * turn order; `out.write.json(path)` then emits the standard
    * one-JSON-object-per-line training file every fine-tuning stack
    * ingests. Same bounded-group one-keyed-shuffle shape as
    * [[renderConversations]] (sorted by the full (idx, role, content)
    * triple, so duplicated turn indexes order identically to the
    * render). */
  def toMessages(df: DataFrame, convCol: String, idxCol: String,
                 roleCol: String, contentCol: String): DataFrame =
    df.groupBy(col(convCol))
      .agg(transform(sort_array(collect_list(struct(col(idxCol).as("i"),
          col(roleCol).as("role"), col(contentCol).as("content")))),
        x => struct(x.getField("role").as("role"),
          x.getField("content").as("content"))).as("messages"))

  /** Marker that introduces a rendered tool call inside an assistant
    * turn — ASCII-only for the same DuckDB-twin reason as
    * [[ChatTemplate]]'s delimiters. A turn with a tool call renders as
    * `content + "<|tool_call|>" + name + "(" + args + ")"`, i.e. the
    * call is part of the ASSISTANT turn's emitted text (the model must
    * learn to produce it), while the tool RESULT arrives as its own
    * `role = "tool"` turn that the loss mask excludes (input context,
    * never a training target). */
  val ToolCallMarker = "<|tool_call|>"

  /** Rendered text of one tool call: `name(argsJson)` behind the
    * marker. NULL args render as `name()` — a no-argument call — NOT as
    * a NULL that would propagate through concat and silently drop the
    * whole turn from the render (round-16 review finding: the streaming
    * path already rendered `name()`, so the batch side must match the
    * no-drift contract). */
  def toolCallText(toolName: Column, toolArgs: Column): Column =
    concat(lit(ToolCallMarker), toolName, lit("("),
      coalesce(toolArgs, lit("")), lit(")"))

  /** Executor/driver-side STRING twin of [[toolCallText]] — shared with
    * the streaming assembler so batch and stream tool-call renders can
    * never drift (the [[ChatTemplate.segmentStr]] pattern). */
  def toolCallTextStr(content: String, name: String, args: String): String =
    content + ToolCallMarker + name + "(" + (if (args == null) "" else args) + ")"

  /** Rewrite `contentCol` so turns carrying a tool call (non-null
    * `toolNameCol`) append their rendered call — after this the plain
    * [[renderConversations]] / [[toMessages]] machinery applies
    * unchanged (agentic traces are ordinary conversations whose
    * assistant turns sometimes end in a call). Narrow projection, no
    * shuffle. */
  def withToolCallText(df: DataFrame, contentCol: String,
                       toolNameCol: String, toolArgsCol: String): DataFrame =
    df.withColumn(contentCol,
      when(col(toolNameCol).isNotNull,
        concat(col(contentCol), toolCallText(col(toolNameCol), col(toolArgsCol))))
        .otherwise(col(contentCol)))

  /** Loss-mask spans for TOOL-USE traces: per `lossRole` turn, a
    * `kind = "content"` span over the turn's own text and — when the
    * turn carries a tool call — a `kind = "tool_call"` span over the
    * rendered `name(args)` (marker excluded: the tokens the model must
    * emit, addressable separately so trainers can weight call syntax).
    * Offsets are codepoint positions into the
    * [[renderConversations]]-over-[[withToolCallText]] string, `end`
    * exclusive, so `substring(rendered, start+1, end-start)` recovers
    * the span exactly. `role = "tool"` result turns contribute NO span:
    * results are context, not targets.
    *
    * Output: `convCol | idxCol | kind | start | end`.
    *
    * Scale shape: the same single conversation-keyed window as
    * [[assistantSpans]] (ordered by the full (idx, role, rendered-
    * content) tuple the render's sort_array uses), then two narrow
    * filtered projections unioned — no join, no re-render, nothing
    * corpus-concentrating. */
  def toolTraceSpans(df: DataFrame, convCol: String, idxCol: String,
                     roleCol: String, contentCol: String,
                     toolNameCol: String, toolArgsCol: String,
                     t: ChatTemplate = ChatTemplate(),
                     lossRole: String = "assistant"): DataFrame = {
    val full = when(col(toolNameCol).isNotNull,
      concat(col(contentCol), toolCallText(col(toolNameCol), col(toolArgsCol))))
      .otherwise(col(contentCol))
    val base = df.withColumn("_full", full)
    val w = Window.partitionBy(col(convCol))
      .orderBy(col(idxCol), col(roleCol), col("_full"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = coalesce(
      sum(t.segLen(col(roleCol), col("_full")).cast("long")).over(w), lit(0L))
    val contentStart = prefix + length(col(roleCol)).cast("long") +
      lit(t.prefixOpen.length.toLong + t.prefixClose.length.toLong)
    val anchored = base.withColumn("_cs", contentStart)
    val contentSpans = anchored.where(col(roleCol) === lossRole)
      .select(col(convCol), col(idxCol), lit("content").as("kind"),
        col("_cs").as("start"),
        (col("_cs") + length(col(contentCol)).cast("long")).as("end"))
    val callStart = col("_cs") + length(col(contentCol)).cast("long") +
      lit(ToolCallMarker.length.toLong)
    val callSpans = anchored
      .where(col(roleCol) === lossRole && col(toolNameCol).isNotNull)
      .select(col(convCol), col(idxCol), lit("tool_call").as("kind"),
        callStart.as("start"),
        // NULL args = zero-length `name()` call (same coalesce contract
        // as toolCallText — a NULL here would void the span's end)
        (callStart + length(col(toolNameCol)).cast("long") + 1L +
          coalesce(length(col(toolArgsCol)).cast("long"), lit(0L)) + 1L).as("end"))
    contentSpans.union(callSpans)
  }

  /** Messages-format export WITH tool calls — the OpenAI-style
    * fine-tuning JSONL where an assistant turn that invoked a tool
    * carries `tool_calls = [{name, arguments}]` (arguments as the raw
    * JSON string, the published convention) and tool results are
    * ordinary `role = "tool"` messages. Turns without a call get a NULL
    * `tool_calls`, which `DataFrameWriter.json` omits from the line —
    * exactly the shape ingestion stacks expect. Same bounded-group
    * one-keyed-shuffle shape as [[toMessages]]. */
  def toMessagesWithTools(df: DataFrame, convCol: String, idxCol: String,
                          roleCol: String, contentCol: String,
                          toolNameCol: String, toolArgsCol: String): DataFrame =
    df.groupBy(col(convCol))
      .agg(transform(sort_array(collect_list(struct(col(idxCol).as("i"),
          col(roleCol).as("role"), col(contentCol).as("content"),
          col(toolNameCol).as("tn"), col(toolArgsCol).as("ta")))),
        x => struct(x.getField("role").as("role"),
          x.getField("content").as("content"),
          when(x.getField("tn").isNotNull,
            array(struct(x.getField("tn").as("name"),
              x.getField("ta").as("arguments")))).as("tool_calls")))
        .as("messages"))

  /** Character spans of `lossRole` CONTENT inside the
    * [[renderConversations]] output — the SFT loss mask (train on
    * assistant tokens only). Offsets are 0-based character positions,
    * `end` exclusive, counted in Unicode codepoints (what both Spark's
    * `length`/`substring` and the SQL twin's count), so
    * `substring(rendered, start+1, end-start)` recovers the content
    * exactly.
    *
    * Output: `convCol | idxCol | start | end` (bigint offsets), one row
    * per `lossRole` turn.
    *
    * Scale shape: one window (partition by conversation, order by turn)
    * computing the running rendered length — the same keyed shuffle the
    * render pays, no join, no re-render. */
  def assistantSpans(df: DataFrame, convCol: String, idxCol: String,
                     roleCol: String, contentCol: String,
                     t: ChatTemplate = ChatTemplate(),
                     lossRole: String = "assistant"): DataFrame = {
    // order by the SAME (idx, role, content) triple the render's
    // sort_array uses: with a duplicated turn_idx (at-least-once
    // ingestion) an idx-only sort would sum the duplicates in arbitrary
    // partition order and the spans would drift off the rendered text
    val w = Window.partitionBy(col(convCol))
      .orderBy(col(idxCol), col(roleCol), col(contentCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = coalesce(
      sum(t.segLen(col(roleCol), col(contentCol)).cast("long")).over(w), lit(0L))
    val start = prefix + length(col(roleCol)).cast("long") +
      lit(t.prefixOpen.length.toLong + t.prefixClose.length.toLong)
    df.select(col(convCol), col(idxCol), col(roleCol),
        start.as("start"),
        (start + length(col(contentCol)).cast("long")).as("end"))
      .where(col(roleCol) === lossRole)
      .drop(roleCol)
  }

  /** DPO/RLHF preference pairs: per prompt, `chosen` = the response
    * with the HIGHEST score and `rejected` = the LOWEST, both with
    * deterministic tie-breaks (lowest response id wins a score tie on
    * either side), emitted only when the margin is strictly positive
    * (an all-tied prompt yields no training signal and is dropped).
    *
    * Output: `promptCol | chosen_id | chosen | chosen_score |
    * rejected_id | rejected | rejected_score | margin`.
    *
    * Scale shape: ONE groupBy aggregate with map-side partial combine —
    * the argmax/argmin ride Spark's lexicographic struct min/max
    * (`max(struct(score, -id, …))` = highest score, ties to lowest id),
    * so there is no window sort and no second shuffle; prompts with
    * millions of responses still combine partially on the map side. */
  def preferencePairs(df: DataFrame, promptCol: String, respIdCol: String,
                      respCol: String, scoreCol: String): DataFrame = {
    val best = max(struct(col(scoreCol).as("s"), (-col(respIdCol)).as("ni"),
      col(respIdCol).as("i"), col(respCol).as("r")))
    val worst = min(struct(col(scoreCol).as("s"), col(respIdCol).as("i"),
      col(respCol).as("r")))
    df.groupBy(col(promptCol))
      .agg(best.as("_c"), worst.as("_r"))
      .select(col(promptCol),
        col("_c.i").as("chosen_id"), col("_c.r").as("chosen"),
        col("_c.s").as("chosen_score"),
        col("_r.i").as("rejected_id"), col("_r.r").as("rejected"),
        col("_r.s").as("rejected_score"),
        (col("_c.s") - col("_r.s")).as("margin"))
      .where(col("margin") > 0)
  }

  /** Best-of-n selection — the rejection-sampling SFT recipe (RAFT; the
    * Llama-2 §3.2.2 fine-tuning loop): among each prompt's first `n`
    * candidate responses, keep the single highest-reward one as the SFT
    * sample. "First n" is by response ORDINAL (`respIdCol` < n) — the
    * convention when candidates are numbered sample draws 0..m-1, which
    * makes the bound a pushed FILTER instead of a second shuffle; ids
    * that are not ordinals need a per-prompt rank upstream.
    *
    * Output: `promptCol | best_id | best | best_score | n_candidates`.
    *
    * Scale shape: one filter + ONE groupBy aggregate with map-side
    * partial combine — the argmax is the lexicographic struct max
    * (ties to the lowest id), the same no-window shape as
    * [[preferencePairs]]. */
  def bestOfN(df: DataFrame, promptCol: String, respIdCol: String,
              respCol: String, scoreCol: String, n: Int): DataFrame = {
    require(n > 0, "n must be > 0")
    val best = max(struct(col(scoreCol).as("s"), (-col(respIdCol)).as("ni"),
      col(respIdCol).as("i"), col(respCol).as("r")))
    df.filter(col(respIdCol) < n)
      .groupBy(col(promptCol))
      .agg(best.as("_b"), count(lit(1)).as("n_candidates"))
      .select(col(promptCol),
        col("_b.i").as("best_id"), col("_b.r").as("best"),
        col("_b.s").as("best_score"), col("n_candidates"))
  }

  /** Rejection sampling with a per-prompt cap — the SFT-pool builder
    * that keeps EVERY response clearing the reward threshold (not just
    * the single best), at most `maxPerPrompt` per prompt by
    * (score desc, id asc). Output: input columns + `rk` (1-based rank
    * within the prompt's kept set).
    *
    * Scale shape: the threshold is a pushed filter; the cap is one
    * window on the prompt key, bounded by responses-per-prompt (a
    * handful), never corpus-wide. */
  def rejectionSample(df: DataFrame, promptCol: String, respIdCol: String,
                      scoreCol: String, minScore: Double,
                      maxPerPrompt: Int): DataFrame = {
    require(maxPerPrompt > 0, "maxPerPrompt must be > 0")
    val w = Window.partitionBy(col(promptCol))
      .orderBy(col(scoreCol).desc, col(respIdCol))
    df.filter(col(scoreCol) >= minScore)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= maxPerPrompt)
  }

  /** Interleaved multimodal assembly: turns that carry an image get a
    * `<|image_k|>` placeholder APPENDED to their content, where `k` is
    * the image's per-conversation ordinal (turn order) — the rendered
    * string then interleaves text and image slots exactly the way
    * published VLM chat formats do, and the (conversation, slot) →
    * image-id sidecar tells the vision side what to splice where.
    * Images stay opaque ids here (the multimodal decode plumbing lives
    * in [[Multimodal]]); this operator owns only the TEXT-side contract:
    * deterministic slot numbering and placeholder placement.
    *
    * Output: input columns with `contentCol` rewritten + `slot` (long,
    * null for imageless turns). Sidecar = `.where(col("slot").isNotNull)
    * .select(conv, slot, image)`. One window on the conversation key —
    * the same keyed shuffle every other turn operator pays. */
  def withImagePlaceholders(df: DataFrame, convCol: String, idxCol: String,
                            contentCol: String, imageCol: String): DataFrame = {
    val w = Window.partitionBy(col(convCol)).orderBy(col(idxCol))
    // count of image-bearing turns up to AND including this one, minus
    // one on image rows = this image's 0-based slot; running count is
    // order-deterministic because idxCol orders the frame
    val slot = (sum(when(col(imageCol).isNotNull, 1L).otherwise(0L)).over(w) - 1L)
    df.withColumn("slot", when(col(imageCol).isNotNull, slot))
      .withColumn(contentCol,
        when(col(imageCol).isNotNull,
          concat(col(contentCol), lit("<|image_"),
            col("slot").cast("string"), lit("|>")))
          .otherwise(col(contentCol)))
  }

  /** Shared pack-assignment core: each sample lands in the block where
    * its START offset falls in the group's concatenated stream
    * (`chunk = (cum - len) div cap` — the same start-offset contract as
    * the txt_pack query: a sample crossing the boundary belongs to, and
    * may overflow, its starting block; samples are never split). Adds
    * `_len`, `_chunk`, `_off` (offset of the sample INSIDE its block =
    * running length of its block-mates before it). Two windows on
    * bounded keys: the caller's `groupCol` shards the cumsum (pick a
    * shard key ≈ cluster cores, like txt_pack's per-lang partition), the
    * second window refines by block.
    *
    * PRECONDITION (stated on [[packBlocks]]/[[packSpans]] too): `idCol`
    * must be unique within each `groupCol` shard. The cumsum window's
    * default RANGE frame makes duplicate ids PEERS — both lengths sum
    * into each peer's running total and the `_off` ROWS window breaks
    * the tie nondeterministically, silently drifting block text and
    * remapped spans. Unique ids make both windows total orders, which
    * is what the deterministic-offset contract is built on. */
  private def packAssign(df: DataFrame, idCol: String, textCol: String,
                         groupCol: String, capChars: Long): DataFrame = {
    require(capChars > 0, "capChars must be > 0")
    val wCum = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
    val len = length(col(textCol)).cast("long")
    val start = sum(len).over(wCum) - len
    val d = df.withColumn("_len", len)
      .withColumn("_chunk", floor(start.cast("double") / capChars).cast("long"))
    val wOff = Window.partitionBy(col(groupCol), col("_chunk"))
      .orderBy(col(idCol)).rowsBetween(Window.unboundedPreceding, -1)
    d.withColumn("_off", coalesce(sum(col("_len")).over(wOff), lit(0L)))
  }

  /** Packed training blocks: concatenate samples (in id order) into
    * blocks of ~`capChars` per `groupCol` shard. Output:
    * `groupCol | chunk | block_text | n_docs`. REQUIRES `idCol` unique
    * per `groupCol` shard (see [[packAssign]] — duplicate ids make the
    * offsets nondeterministic). */
  def packBlocks(df: DataFrame, idCol: String, textCol: String,
                 groupCol: String, capChars: Long): DataFrame =
    packAssign(df, idCol, textCol, groupCol, capChars)
      .groupBy(col(groupCol), col("_chunk").as("chunk"))
      .agg(array_join(transform(sort_array(collect_list(
          struct(col(idCol).as("i"), col(textCol).as("t")))),
          x => x.getField("t")), "").as("block_text"),
        count(lit(1)).as("n_docs"))

  /** Loss-mask SURVIVAL through packing: remap per-sample [start, end)
    * spans (e.g. [[assistantSpans]] output) into the coordinates of the
    * packed block the sample landed in — the step real pipelines get
    * subtly wrong (a one-sample offset error poisons every loss mask in
    * the block). Join [[packBlocks]] on (group, chunk) and
    * `substring(block_text, block_start+1, …)` recovers the original
    * span content exactly — which is how the oracle query checks it.
    *
    * Output: spans columns + `chunk` + `block_start` + `block_end`.
    * Shapes: the two pack windows + one id-keyed join (spans to
    * assignment) — nothing corpus-sized concentrates beyond the caller's
    * shard choice. REQUIRES `idCol` unique per `groupCol` shard (see
    * [[packAssign]]). */
  def packSpans(df: DataFrame, idCol: String, textCol: String,
                groupCol: String, capChars: Long,
                spans: DataFrame, startCol: String, endCol: String): DataFrame = {
    val assign = packAssign(df, idCol, textCol, groupCol, capChars)
      .select(col(idCol), col(groupCol), col("_chunk").as("chunk"), col("_off"))
    spans.join(assign, idCol)
      .withColumn("block_start", col(startCol) + col("_off"))
      .withColumn("block_end", col(endCol) + col("_off"))
      .drop("_off")
  }

  /** Leak-free train/val/test split: every member of a duplicate
    * cluster lands on the SAME side of the split, so near-identical
    * text can never sit in both train and eval (the cross-split
    * contamination C4/Pile-style dedup exists to prevent — splitting
    * BEFORE dedup leaks; this splits BY cluster).
    *
    * `clusterKey` is any duplicate-cluster key expression — an exact
    * fingerprint ([[TextAnalysis.fingerprint]]), a MinHash component
    * representative from [[Dedup]], a canonical URL. The cluster's
    * representative is its MINIMUM id (deterministic), and the split is
    * a pure function of the representative: `(rep * 48271) mod 100` <
    * testPct → test, < testPct+valPct → val, else train — so adding or
    * removing cluster MEMBERS never moves the cluster.
    *
    * Growth stability: because ids in an append-only corpus are
    * assigned monotonically, new arrivals always have LARGER ids than
    * the cluster's representative, so refreshing the corpus never moves
    * an existing cluster's split — held-out sets stay clean across
    * refreshes (the [[Sample.hashSplit]] property, lifted to clusters).
    * The one way to flip a cluster is backfilling a duplicate with a
    * SMALLER id than the current representative; if ids are not
    * monotone, key the split on a content-derived rep (e.g. min
    * fingerprint) instead of min id.
    *
    * Output: input columns + `rep` (bigint) + `split` (string).
    *
    * Scale shape: one window (partition by cluster key, min over the
    * whole frame — no ORDER BY, no sort) = one keyed shuffle; the split
    * itself is a narrow projection. */
  def leakFreeSplit(df: DataFrame, idCol: String, clusterKey: Column,
                    valPct: Int = 10, testPct: Int = 10): DataFrame = {
    require(valPct >= 0 && testPct >= 0 && valPct + testPct <= 100,
      "val/test percentages must be non-negative and sum to <= 100")
    val w = Window.partitionBy(clusterKey)
    val rep = min(col(idCol).cast("long")).over(w)
    // reduce mod 100 BEFORE the multiply: (rep mod 100)·48271 mod 100 ==
    // rep·48271 mod 100, and the pre-reduced product cannot overflow a
    // Long the way a raw 64-bit id (snowflake-scale) times 48271 silently
    // would — the twin's BIGINT multiply would error where Spark wraps
    val b = pmod(pmod(rep, lit(100L)) * 48271L, lit(100L))
    df.withColumn("rep", rep)
      .withColumn("split",
        when(b < testPct, "test")
          .when(b < testPct + valPct, "val")
          .otherwise("train"))
  }

  /** Contiguous global training index WITHOUT a single-partition global
    * sort — curriculum ordering at cluster scale.
    *
    * The global order is `(bucket, salt, shuffleKey, id)` where
    * `salt = shuffleKey mod salts`: bucket encodes the curriculum
    * policy (caller-supplied — difficulty band, source tier, …), the
    * salted shuffle key gives a deterministic pseudo-random order
    * WITHIN a bucket. The index is assigned scalably: per-(bucket,salt)
    * counts (a bounded `buckets × salts` vector) come to the driver
    * once, their cumulative sums become broadcast offsets, and each
    * row's index is `offset + row_number within its (bucket, salt)
    * cell`. Window parallelism is `buckets × salts` cells, NOT 1 — the
    * classic distributed zipWithIndex; pick `salts` ≈ cluster cores /
    * buckets so cells stay partition-sized.
    *
    * Output: input columns + `bucket` (bigint) + `train_idx` (bigint,
    * 0-based, contiguous, a permutation of 0..n-1).
    *
    * Driver memory: one (bucket, salt, count) row per cell — bounded by
    * the cap below, metadata not data (the [[GraphRank]] driver-vector
    * pattern). */
  def curriculumIndex(df: DataFrame, idCol: String, bucket: Column,
                      shuffleKey: Column, salts: Int): DataFrame = {
    require(salts > 0, "salts must be > 0")
    val d = df.withColumn("bucket", bucket.cast("long"))
      .withColumn("_key", shuffleKey.cast("long"))
      .withColumn("_salt", pmod(col("_key"), lit(salts.toLong)))
    val counts = d.groupBy("bucket", "_salt").count().collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .sortBy(_._1)
    require(counts.length <= (1 << 20),
      s"${counts.length} (bucket, salt) cells exceed the driver-vector cap " +
        "(1M) — coarsen the bucket expression or lower salts")
    val offsets = counts.scanLeft(((0L, 0L), 0L)) { case ((_, acc), ((b, s), n)) =>
      ((b, s), acc + n)
    }.init.zip(counts).map { case ((_, off), ((b, s), _)) => (b, s, off) }
    val spark = df.sparkSession
    val offDf = spark.createDataFrame(offsets.toIndexedSeq)
      .toDF("bucket", "_salt", "_off")
    val w = Window.partitionBy(col("bucket"), col("_salt"))
      .orderBy(col("_key"), col(idCol))
    d.join(broadcast(offDf), Seq("bucket", "_salt"))
      .withColumn("train_idx",
        col("_off") + row_number().over(w).cast("long") - 1L)
      .drop("_key", "_salt", "_off")
  }
}
