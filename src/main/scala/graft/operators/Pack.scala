package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sequence packing for training pipelines: assign documents to
  * fixed-token-budget chunks.
  *
  * Exact greedy packing is inherently sequential; the scalable
  * formulation is cumulative-sum binning within an explicit order:
  * chunk = floor((cumsum(tokens) - tokens) / budget) — every chunk holds
  * consecutive documents and at most `budget` tokens of SLACK-FREE
  * prefix; a document longer than the budget gets its own chunk(s)
  * boundary. Deterministic given the order column, so it stays
  * oracle-checkable (unlike random-assignment packing).
  *
  * SCALE NOTE: the cumulative sum runs one window per partition key. With
  * `partitionCols` empty the window has no partition spec and Spark
  * funnels ALL rows through one task — fine for per-group or test-sized
  * data, wrong for a whole corpus. At scale always pack within keys
  * (language, source, shard) so the windows parallelize.
  */
object Pack {

  /** `tokenCol` IS the tokenizer seam: the budget is counted in whatever
    * units the caller materialized there — whitespace counts
    * ([[TextAnalysis.tokenCount]], the oracle default), BPE-ish regex
    * counts (`tokenCount(c, TextAnalysis.regexTokens)`), or a column of
    * real LLM tokenizer counts precomputed upstream. Budgeting in
    * whitespace tokens UNDERCOUNTS real LLM tokens ~1.3-1.5x on English
    * (far more on CJK) — at scale, feed a subword-calibrated count. */
  def byTokenBudget(df: DataFrame, orderCol: String, tokenCol: String,
                    budget: Long, partitionCols: Seq[String] = Nil): DataFrame = {
    val w = (if (partitionCols.isEmpty) Window.partitionBy()
             else Window.partitionBy(partitionCols.map(col): _*))
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_cum", sum(col(tokenCol)).over(w))
      .withColumn("chunk", floor((col("_cum") - col(tokenCol)) / budget))
      .drop("_cum")
  }

  /** Context-length chunking: split each document's token stream into
    * fixed-size windows of `window` tokens advancing by `stride`
    * (overlapping when stride < window — the standard sliding-context
    * recipe for LLM training/eval sets). Chunk starts are i*stride for
    * i = 0 .. ceil(max(0, n-window)/stride); the final chunk may be
    * shorter than `window`; a non-empty document shorter than `window`
    * yields exactly one chunk; an empty/blank document yields none.
    *
    * Output: (idCol, chunk_idx int, chunk_tokens int, chunk_text).
    *
    * Plan shape: tokenize -> per-row chunk count -> `explode(sequence)`
    * -> `slice` + `array_join`. Every expression is codegen'd and the
    * whole operator is NARROW — zero shuffles, no window functions, so
    * at 100 TB it is a single pass that parallelizes per input split
    * and composes with downstream repartitioning (unlike a
    * posexplode+window formulation, which would shuffle every token).
    *
    * `tokenizer` swaps the token basis (window/stride are counted in its
    * units and `chunk_text` re-joins its tokens with single spaces);
    * the whitespace default is the oracle-pinned behavior,
    * [[TextAnalysis.regexTokens]] the shipped subword-ish option. */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
                  window: Int, stride: Int,
                  tokenizer: Column => Column = TextAnalysis.tokens): DataFrame = {
    require(window > 0, "window must be positive")
    require(stride > 0 && stride <= window, "stride must be in [1, window]")
    val toks = tokenizer(col(textCol))
    // null/blank text guard: split(trim("")) yields [""], not [] — treat
    // as 0 chunks so empty documents emit nothing instead of one ""
    // chunk. The null check must be EXPLICIT: length(trim(null)) === 0
    // is null, which would fall through to the otherwise branch where
    // greatest(null, 0) = 0 conjures one phantom null chunk. The
    // size(toks)=0 disjunct covers custom tokenizers that return [] on
    // NON-blank text (e.g. letters-only over "!!!") — no-op for the
    // whitespace default, which never returns [] on non-blank input.
    val nChunks = when(col(textCol).isNull || length(trim(col(textCol))) === 0 ||
        size(toks) === 0, lit(0))
      .otherwise(lit(1) + ceil(greatest(size(toks) - window, lit(0)) / lit(stride.toDouble)))
      .cast("int")
    df.select(col(idCol), toks.as("_toks"), nChunks.as("_nc"))
      // sequence(0, nc-1) needs nc >= 1: Spark infers step -1 for
      // start > stop, so an unguarded nc=0 would yield [0,-1], not []
      .filter(col("_nc") > 0)
      .select(col(idCol), col("_toks"),
        explode(sequence(lit(0), col("_nc") - 1)).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx").cast("int").as("chunk_idx"),
        slice(col("_toks"), col("chunk_idx") * stride + 1, lit(window)).as("_chunk"))
      .select(col(idCol), col("chunk_idx"),
        size(col("_chunk")).as("chunk_tokens"),
        array_join(col("_chunk"), " ").as("chunk_text"))
  }

  /** Sentence grammar shared VERBATIM with the DuckDB twin — RE2-safe
    * (no lookaround): a sentence is either a run ending in [.!?]+ (its
    * trailing whitespace absorbed) or the terminator-less tail. */
  val SentenceRegex: String = "[^.!?]*[.!?]+\\s*|[^.!?]+$"

  /** RAG-style sentence-boundary chunking: sentences are ATOMS (a chunk
    * never cuts mid-sentence — the property retrieval embeddings care
    * about, which token-window [[chunkTokens]] can't give), packed into
    * `budget`-token chunks by cumulative-sum binning in document order.
    * The budget is a TARGET, not a cap: atoms are never split, so a
    * chunk may overrun by its final (straddling) sentence, and a
    * sentence that alone exceeds the budget fills however many bins its
    * length spans (consecutive chunk ids are preserved by dense-ranking
    * the bins). That slack is the price of atomicity + SQL-exact parity.
    *
    * Shape: one narrow sentence-extraction pass (regexp_extract_all),
    * a per-document window (cumsum + dense bin rank — parallel across
    * docs), and the struct-array sort reassembly groupBy.
    *
    * `tokenizer` is the engine-wide seam: budget in whitespace units by
    * default (the oracle-pinned behavior), or learned subword units via
    * [[Bpe.tokenizer]]/[[Unigram.tokenizer]]. */
  def chunkSentences(df: DataFrame, idCol: String, textCol: String,
                     budget: Int,
                     tokenizer: Column => Column = TextAnalysis.tokens): DataFrame = {
    require(budget > 0, "budget must be positive")
    val sents = df
      .select(col(idCol),
        posexplode(regexp_extract_all(col(textCol), lit(SentenceRegex), lit(0)))
          .as(Seq("_pos", "_sent")))
      .select(col(idCol), col("_pos"), trim(col("_sent")).as("_sent"))
      .filter(length(col("_sent")) > 0)
      .withColumn("_n", size(tokenizer(col("_sent"))))
    val w = Window.partitionBy(col(idCol)).orderBy(col("_pos"))
    val binned = sents
      .withColumn("_cum", sum(col("_n")).over(w))
      .withColumn("_bin", floor((col("_cum") - col("_n")) / budget))
      // dense-rank bins so a budget-spanning sentence can't leave holes
      // in chunk_idx (floor binning skips bins it jumps over)
      .withColumn("chunk_idx",
        (dense_rank().over(Window.partitionBy(col(idCol)).orderBy(col("_bin"))) - 1)
          .cast("int"))
    binned.groupBy(col(idCol), col("chunk_idx"))
      .agg(count(lit(1)).cast("int").as("n_sentences"),
        sum(col("_n")).as("chunk_tokens"),
        array_join(transform(array_sort(collect_list(struct(col("_pos"), col("_sent")))),
          s => s.getField("_sent")), " ").as("chunk_text"))
  }

  /** T5-style span-corruption sample prep (Raffel 2020 §3.1.4): mask
    * fixed-length token spans and emit the denoising (input, target)
    * pair — input keeps the unmasked tokens with one `<extra_id_k>`
    * sentinel per masked span, target is each sentinel followed by its
    * masked tokens, sentinels numbered in document order. The schedule
    * is DETERMINISTIC: the token stream is cut into `period`-token
    * blocks and block b masks its [spanStart, spanStart+spanLen) slice
    * whenever that slice fits inside the document (defaults 7/3/2 ≈ the
    * paper's 15%-rate, mean-span-2 regime at reproducible positions).
    * Determinism keeps the pair engine-reproducible and SQL-checkable;
    * a production noise draw hashes (id, block) into the offset — same
    * shape, same cost, one expression swapped.
    *
    * One narrow per-row pass: the block loop is a per-row-once HOF over
    * a bounded sequence (the sanctioned non-generator position); no
    * shuffle, no state. Output: (idCol, n_tokens, n_spans, input_text,
    * target_text); a doc too short for one span emits an empty target. */
  def spanCorrupt(df: DataFrame, idCol: String, textCol: String,
                  period: Int = 7, spanStart: Int = 3, spanLen: Int = 2,
                  tokenizer: Column => Column = TextAnalysis.tokens): DataFrame = {
    require(period > 0 && spanLen > 0 && spanStart >= 0 &&
      spanStart + spanLen <= period, "span must fit inside the period")
    val p = period; val s0 = spanStart; val sl = spanLen
    def sentinel(b: Column): Column =
      concat(lit("<extra_id_"), b.cast("string"), lit(">"))
    val n = size(col("_t"))
    val nBlocks = ceil(n / lit(p.toDouble)).cast("int")
    val blocks = sequence(lit(0), greatest(nBlocks - 1, lit(0)))
    val inParts = flatten(transform(blocks, b => {
      val base = b * p
      when(base + s0 + sl <= n,
        concat(slice(col("_t"), base + 1, lit(s0)), array(sentinel(b)),
          slice(col("_t"), base + s0 + sl + 1, lit(p - s0 - sl))))
        .otherwise(slice(col("_t"), base + 1, lit(p)))
    }))
    val tgtParts = flatten(transform(blocks, b => {
      val base = b * p
      when(base + s0 + sl <= n,
        concat(array(sentinel(b)), slice(col("_t"), base + s0 + 1, lit(sl))))
        .otherwise(array().cast("array<string>"))
    }))
    val nSpans = when(n >= s0 + sl,
      (floor((n - s0 - sl) / lit(p.toDouble)) + 1).cast("int")).otherwise(lit(0))
    df.select(col(idCol), tokenizer(col(textCol)).as("_t"))
      .select(col(idCol), n.as("n_tokens"), nSpans.as("n_spans"),
        array_join(inParts, " ").as("input_text"),
        array_join(tgtParts, " ").as("target_text"))
  }

  /** Fill-in-the-middle sample prep (Bavarian 2022 §2, PSM order): the
    * token stream splits at the deterministic thirds into (prefix,
    * middle, suffix) and emits
    * `<fim_prefix> P <fim_suffix> S <fim_middle> M` — the infilling
    * sample an autoregressive trainer consumes. Thirds keep the split
    * engine-reproducible and SQL-checkable; a production draw hashes
    * the id into the two cut points — same shape. Assembled from token
    * arrays (flatten of sentinel singletons + slices, then one join) so
    * empty parts never leave doubled separators. One narrow per-row
    * pass, no shuffle. */
  def fimSplit(df: DataFrame, idCol: String, textCol: String,
               tokenizer: Column => Column = TextAnalysis.tokens): DataFrame = {
    val n = size(col("_t"))
    val c1 = floor(n / lit(3.0)).cast("int")
    val c2 = floor(n * 2 / lit(3.0)).cast("int")
    df.select(col(idCol), tokenizer(col(textCol)).as("_t"))
      .select(col(idCol), n.as("n_tokens"), c1.as("cut1"), c2.as("cut2"),
        array_join(flatten(array(
          array(lit("<fim_prefix>")), slice(col("_t"), lit(1), c1),
          array(lit("<fim_suffix>")), slice(col("_t"), c2 + 1, greatest(n - c2, lit(0))),
          array(lit("<fim_middle>")), slice(col("_t"), c1 + 1, c2 - c1))), " ")
          .as("psm_text"))
  }
}
