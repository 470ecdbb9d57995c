package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting.
  *
  * Everything here is built from codegen'd `org.apache.spark.sql.functions`
  * (no UDFs), so the whole surface stays inside WholeStageCodegen and
  * scales linearly with input — the shape you want scanning 100 TB of
  * documents: narrow transformations only, no shuffle.
  */
object TextAnalysis {

  /** Whitespace tokenization (runs of whitespace collapse) — the DEFAULT
    * tokenizer of every token-consuming operator in the engine
    * ([[Pack]], quality/stats, packing budgets). Operators take a
    * `tokenizer: Column => Column` parameter defaulting to this, so a
    * deployment can swap in [[regexTokens]] (or its own column
    * expression — e.g. a precomputed BPE token array) without touching
    * operator code. The default stays whitespace for oracle parity. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** BPE-ish regex TOKENIZER: letter runs, digit runs, or single
    * non-alphanumeric symbols, as a real token array. Splits punctuation
    * from words the way subword vocabularies do ("don't" -> [don, ', t]),
    * so budgets counted in these tokens track real LLM token counts much
    * closer than whitespace words (~1.3-1.5x more tokens on English
    * prose). Pure codegen'd regexp — usable as the `tokenizer` argument
    * of every token-parameterized operator. */
  def regexTokens(text: Column): Column =
    regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))

  /** Token count under `tokenizer`; 0 for empty/blank input. */
  def tokenCount(text: Column, tokenizer: Column => Column = tokens): Column =
    when(length(trim(text)) === 0, lit(0)).otherwise(size(tokenizer(text)))

  /** [[regexTokens]] count — kept as the cheap subword-ish count knob. */
  def regexTokenCount(text: Column): Column = size(regexTokens(text))

  /** Tiny in-plan stopword list (enough for quality ratios; a real
    * deployment would broadcast a larger set). */
  val EnStopwords: Seq[String] = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  def stopwordCount(text: Column, tokenizer: Column => Column = tokens): Column =
    size(filter(tokenizer(text), t => t.isin(EnStopwords: _*)))

  /** Ratio of distinct tokens to tokens — low values flag boilerplate /
    * word-spam documents. */
  def distinctTokenRatio(text: Column, tokenizer: Column => Column = tokens): Column = {
    val t = tokenizer(text)
    round(size(array_distinct(t)).cast("double") / greatest(size(t), lit(1)).cast("double"), 4)
  }

  /** Mean token length in characters. */
  def meanTokenLength(text: Column, tokenizer: Column => Column = tokens): Column = {
    val t = tokenizer(text)
    val totalChars = aggregate(t, lit(0), (acc, tok) => acc + length(tok))
    round(totalChars.cast("double") / greatest(size(t), lit(1)).cast("double"), 4)
  }

  /** Composite quality score in [0,1]: length sweet-spot, stopword
    * presence, vocabulary diversity. Deterministic and cheap; the weights
    * mirror common pretraining-corpus heuristics (C4-style).
    * `tokenizer` swaps the token basis (all three terms move together);
    * the whitespace default is what the oracles pin. */
  def qualityScore(text: Column, tokenizer: Column => Column = tokens): Column = {
    val nTok = tokenCount(text, tokenizer).cast("double")
    val lengthTerm = least(nTok / lit(50.0), lit(1.0))
    val stopTerm = least(stopwordCount(text, tokenizer).cast("double") / greatest(nTok, lit(1.0)) * lit(4.0), lit(1.0))
    val diversityTerm = size(array_distinct(tokenizer(text))).cast("double") / greatest(nTok, lit(1.0))
    // +1e-9 pushes exact half-way values (e.g. 0.49975 from nice token
    // ratios) off the rounding boundary, where engines legitimately
    // disagree (binary-double vs shortest-decimal half-up). The oracle
    // applies the same nudge.
    round(lit(0.4) * lengthTerm + lit(0.3) * stopTerm + lit(0.3) * diversityTerm + lit(1e-9), 4)
  }

  /** Fraction of lines that duplicate an earlier line (Gopher-style
    * repetition rule, Rae et al. 2021 — public): 1 - distinct/total over
    * newline-split lines. 0.0 for single-line or empty docs. Narrow
    * per-row expression, no shuffle. */
  def duplicateLineFraction(text: Column): Column = {
    val lines = split(text, "\n")
    val n = size(lines)
    round(when(n <= 1, lit(0.0))
      .otherwise(lit(1.0) - size(array_distinct(lines)).cast("double") / n.cast("double"))
      + lit(1e-9), 4)
  }

  /** Fraction of all word bigrams accounted for by the single most
    * frequent bigram (Gopher top-2-gram rule): high values flag
    * machine-repeated boilerplate. Docs with <2 tokens score 0.0.
    * One native codegen'd expression
    * ([[graft.functions.TopBigramFraction]]) — the HOF fold formulation
    * it replaces blew past the JIT huge-method limit when fused into
    * wider projections (txt_quality_gate ran interpreted, ~20x slower).
    */
  def topBigramFraction(text: Column): Column =
    round(graft.functions.TopBigramFraction(tokens(text)) + lit(1e-9), 4)

  /** Language-marker hit counts: distinct marker words present. */
  private val markers = Map(
    "en" -> Seq("the", "a", "is", "and", "of", "to"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un"))

  /** Distinct-token form of [[langId]]: intersects a PRE-COMPUTED
    * `array_distinct(tokens(text))` column per language. Callers should
    * materialize that column in a lower projection (CollapseProject keeps
    * a non-cheap expression referenced more than once in its own
    * projection), so the text is tokenized + deduplicated ONCE per row
    * instead of once per language — ~3x less scan work on the langid
    * path. */
  def langIdFromDistinctTokens(distinctToks: Column): Column = {
    def hits(lang: String): Column =
      size(array_intersect(distinctToks, array(markers(lang).map(lit): _*)))
    val en = hits("en")
    val de = hits("de")
    val fr = hits("fr")
    when(en >= de && en >= fr, lit("en"))
      .when(de >= fr, lit("de"))
      .otherwise(lit("fr"))
  }

  /** N-gram/stopword-marker language ID over {en, de, fr}; ties resolve
    * en > de > fr (fixed order, so the result is deterministic).
    * Single-projection convenience form — inside a wide scan, prefer
    * materializing the distinct tokens and calling
    * [[langIdFromDistinctTokens]]. A 6-marker intersection is a WEAK
    * signal on short texts (any text missing all markers ties to 'en');
    * the production predictor is the trained
    * [[trainTrigramLangId]]/[[langIdTrigram]] pair — this heuristic
    * stays as the zero-training fallback and the quality-gate
    * agreement check whose oracles pin it. */
  def langId(text: Column): Column =
    langIdFromDistinctTokens(array_distinct(tokens(text)))

  /** Character trigrams of an (already-lowercased) text column —
    * consecutive 3-char windows, step 1; fewer than 3 chars → empty.
    * One native linear walk ([[graft.functions.CharTrigrams]]); the
    * builtin HOF form was quadratic per document (see its scaladoc). */
  def charTrigrams(lowered: Column): Column =
    graft.functions.CharTrigrams(lowered)

  /** Train the Cavnar–Trenkle (1994) rank-order trigram language
    * identifier on a labeled corpus: per language, the `topK` character
    * trigrams of the lowercased text ranked by (count desc, trigram
    * asc). One explode + one (lang, trigram) groupBy shuffle — the
    * model is `langs × topK` short strings, driver-bounded regardless
    * of corpus size. Scoring ([[langIdTrigram]]) is all-integer rank
    * displacement, so an SQL twin reproduces predictions bit-exactly
    * (the reason this formulation was chosen over log-likelihood, whose
    * FP argmax can flip cross-engine). Candidate languages and their
    * deterministic tie-break order are the sorted distinct labels. */
  def trainTrigramLangId(df: org.apache.spark.sql.DataFrame, textCol: Column,
                         langCol: Column, topK: Int = 500,
                         docTopK: Int = 300): graft.functions.TrigramLangRanks = {
    require(topK > 0 && docTopK > 0, "profile sizes must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_lang")).orderBy(col("_c").desc, col("_t").asc)
    val ranked = df
      .select(langCol.as("_lang"), explode(charTrigrams(lower(textCol))).as("_t"))
      .groupBy(col("_lang"), col("_t")).agg(count(lit(1)).as("_c"))
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= topK)
      .select(col("_lang"), col("_t"), col("_rk"))
      .collect()
    val langs = ranked.map(_.getString(0)).distinct.sorted
    val tables = langs.map { l =>
      val m = new java.util.HashMap[String, Integer]()
      ranked.foreach { r =>
        if (r.getString(0) == l) m.put(r.getString(1), Int.box(r.getInt(2)))
      }
      m
    }
    new graft.functions.TrigramLangRanks(langs, tables, penalty = topK, docTopK = docTopK)
  }

  /** Predicted language of `text` under a trained model — a narrow
    * zero-shuffle codegen scan ([[graft.functions.TrigramLangId]]);
    * lowercasing happens HERE with the engine's own `lower` so training
    * and scoring share one case-folding definition. */
  def langIdTrigram(text: Column, model: graft.functions.TrigramLangRanks): Column =
    graft.functions.TrigramLangId(lower(text), model)

  /** Persist the trained profiles as parquet (lang, trigram, rank —
    * plus the two scoring constants, which are part of the model: a
    * loaded model must score identically or cross-run predictions
    * drift). Same artifact pattern as [[graft.operators.Bpe.saveModel]];
    * langs × topK short rows, driver-bounded. */
  def saveTrigramLangId(spark: org.apache.spark.sql.SparkSession,
                        model: graft.functions.TrigramLangRanks, path: String): Unit = {
    import spark.implicits._
    val rows = for {
      (l, i) <- model.langs.zipWithIndex.toSeq
      e <- {
        import scala.jdk.CollectionConverters._
        model.ranks(i).entrySet().asScala
      }
    } yield (l, e.getKey, e.getValue.toInt, model.penalty, model.docTopK)
    rows.toDF("lang", "trigram", "rank", "penalty", "doc_top_k")
      .repartition(1).write.mode("overwrite").parquet(path)
  }

  def loadTrigramLangId(spark: org.apache.spark.sql.SparkSession,
                        path: String): graft.functions.TrigramLangRanks = {
    val rows = spark.read.parquet(path)
      .select(col("lang"), col("trigram"), col("rank"),
        col("penalty"), col("doc_top_k")).collect()
    require(rows.nonEmpty, s"$path holds no language profiles")
    val consts = rows.map(r => (r.getInt(3), r.getInt(4))).distinct
    require(consts.length == 1, s"$path mixes scoring constants: ${consts.toSeq}")
    val langs = rows.map(_.getString(0)).distinct.sorted
    val tables = langs.map { l =>
      val m = new java.util.HashMap[String, Integer]()
      rows.foreach { r =>
        if (r.getString(0) == l) m.put(r.getString(1), Int.box(r.getInt(2)))
      }
      m
    }
    new graft.functions.TrigramLangRanks(langs, tables,
      penalty = consts.head._1, docTopK = consts.head._2)
  }

  /** The four gate thresholds, SHARED by [[qualityGate]], the funnel
    * report ([[graft.queries.Ext]] `rptGateFunnel`) and the streaming
    * gate — a tuned threshold must move every consumer at once, or the
    * funnel silently reports a different gate than the one that ran
    * (QueriesSpec pins gate-survivors == funnel-survivors). */
  val MinQualityScore: Double = 0.5
  val MaxDupLineFrac: Double = 0.3
  val MaxTopBigramFrac: Double = 0.2

  /** The composite quality gate over any frame with (textCol, langCol):
    * quality score, both Gopher repetition bounds, langid agreement —
    * one fused narrow projection + filter, all codegen builtins. Keeps
    * the input columns and appends the metric columns. STREAMING-SAFE:
    * stateless and narrow (no sort, no state), so it drops into a
    * readStream→writeStream pipeline per micro-batch unchanged —
    * [[graft.streaming.EventStreams.qualityGateStream]] is exactly this. */
  def qualityGate(d: org.apache.spark.sql.DataFrame, textCol: String = "text",
                  langCol: String = "lang"): org.apache.spark.sql.DataFrame =
    d.withColumn("_toks", array_distinct(tokens(col(textCol))))
      .withColumn("quality", qualityScore(col(textCol)))
      .withColumn("dup_line_frac", duplicateLineFraction(col(textCol)))
      .withColumn("top_bigram_frac", topBigramFraction(col(textCol)))
      .withColumn("pred_lang", langIdFromDistinctTokens(col("_toks")))
      .filter(col("quality") >= MinQualityScore &&
        col("dup_line_frac") <= MaxDupLineFrac &&
        col("top_bigram_frac") <= MaxTopBigramFrac &&
        col("pred_lang") === col(langCol))
      .drop("_toks", "pred_lang")

  // ---- PII scrubbing ----------------------------------------------------

  /** Redaction patterns — deliberately restricted to the regex subset
    * where Java regex (Spark) and RE2 (the DuckDB oracle) agree:
    * character classes, bounded repetition, ASCII `\b`, no lookaround,
    * no backreferences. Order matters downstream: emails first (their
    * local/domain parts may contain digit runs), then IPv4 (so the
    * phone pattern never sees dotted quads), then phones. */
  private[operators] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[operators] val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  // 3-3-4 digit groups with space/dash separators and an optional +CC
  // prefix; the \b sits AFTER the optional group ('+' is a non-word char,
  // so a leading \b could never match past "+1 ") and before the first
  // digit group, which also keeps dates (2026-01-02) and long digit runs
  // unmatched
  private[operators] val PhoneRe = "(\\+\\d{1,3}[ -])?\\b\\d{3}[ -]\\d{3}[ -]?\\d{4}\\b"

  /** PII-scrubbed text: emails → [EMAIL], IPv4 → [IP], phone numbers →
    * [PHONE]. A narrow codegen'd projection — the 100 TB shape is a pure
    * scan; at cluster scale this fuses with whatever filter follows.
    * Pattern-based scrubbing is the standard first pass of a
    * training-data pipeline (C4/Dolma-style); it is heuristic by nature
    * — a recall-oriented NER pass would sit behind the same column
    * contract. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "[EMAIL]"),
        Ipv4Re, "[IP]"),
      PhoneRe, "[PHONE]")

  /** Consistent pseudonymization of email identities: each address
    * becomes a STABLE token `[EMAIL:xxxxxxxx]` (the 8-hex md5(salt|
    * address) prefix), so the same identity still LINKS across
    * documents while the raw value never survives — the GDPR-style
    * pseudonymization pass, vs [[redactPii]]'s destructive masking
    * (every address collapses to one literal and cross-doc joins die).
    * Rotating `salt` re-keys the whole pseudonym space.
    *
    * Per-match hashing is beyond regexp_replace, so the text is split
    * at the matches and reassembled around the hashed tokens — all
    * column algebra, the two HOFs in the sanctioned per-row-once
    * non-generator position. Narrow; no shuffle. */
  def pseudonymizeEmails(text: Column, salt: String = ""): Column = {
    val parts = split(text, EmailRe, -1)
    val ms = regexp_extract_all(text, lit(EmailRe), lit(0))
    val toks = transform(ms, m => concat(lit("[EMAIL:"),
      substring(md5(concat(lit(salt), lit("|"), m)), 1, 8), lit("]")))
    val tail = zip_with(toks, slice(parts, lit(2), size(parts) - 1),
      (t, p) => concat(t, p))
    concat(element_at(parts, 1), array_join(tail, ""))
  }

  /** Match counts per PII class on the ORIGINAL text (audit channel:
    * corpus-level PII incidence without keeping the raw values). */
  def piiCounts(text: Column): (Column, Column, Column) =
    (regexp_count(text, lit(EmailRe)),
     regexp_count(regexp_replace(text, EmailRe, "[EMAIL]"), lit(Ipv4Re)),
     regexp_count(
       regexp_replace(regexp_replace(text, EmailRe, "[EMAIL]"), Ipv4Re, "[IP]"),
       lit(PhoneRe)))

  // ---- structural / gazetteer PII (NER beyond regex) --------------------

  /** Demo first-name gazetteer for the person-name rule. A real
    * curation gate broadcasts a locale-specific list of 10⁴–10⁵ names
    * (or compiles it into an Aho–Corasick scan); the in-plan
    * alternation here is the bounded demo form, the [[EnStopwords]]
    * precedent. The COLUMN CONTRACT is the point: swapping the list
    * changes one constant, not the operator. */
  val FirstNameGazetteer: Seq[String] = Seq(
    "Alice", "Bob", "Carol", "David", "Emma", "Frank", "Grace", "Henry",
    "Maria", "James", "Linda", "Robert", "Sarah", "Michael", "Nancy",
    "Peter", "Laura", "Thomas", "Karen", "Oliver")

  /** Gazetteer-first-name + capitalized-surname pair — the structural
    * person-name rule (a bare gazetteer hit like "grace period" never
    * fires: the first name must be capitalized AND followed by a
    * capitalized token). Built from [[FirstNameGazetteer]]; Java∩RE2
    * subset. */
  private[graft] def NameRe: String =
    "\\b(" + FirstNameGazetteer.mkString("|") + ") [A-Z][a-z]+\\b"

  /** US-style street address: house number + 1–3 capitalized words +
    * a canonical street suffix. Deliberately conservative — dates,
    * versions, and bare numbers never carry a suffix token. */
  private[graft] val AddressRe =
    "\\b\\d{1,5} ([A-Z][a-z]+ ){1,3}(Street|St|Avenue|Ave|Road|Rd|Boulevard|Blvd|Lane|Ln|Drive|Dr)\\b"

  /** Card-number CANDIDATE (4-4-4-(1..4) digit groups, space/dash
    * separators): candidates are cheap; the [[graft.functions.LuhnValid]]
    * checksum is the decision — a 16-digit serial or timestamp run
    * fails mod-10 with probability 0.9. */
  private[graft] val CardCandidateRe =
    "\\b\\d{4}[ -]?\\d{4}[ -]?\\d{4}[ -]?\\d{1,4}\\b"

  /** IBAN CANDIDATE (ISO 13616 shape: country code + 2 check digits +
    * 11–30 alphanumerics); [[graft.functions.IbanValid]]'s mod-97 fold
    * decides. */
  private[graft] val IbanCandidateRe = "\\b[A-Z]{2}\\d{2}[A-Z0-9]{11,30}\\b"

  /** Structural-PII counts beyond [[redactPii]]'s regex classes:
    * (names, addresses, luhn-valid cards, mod97-valid ibans). The
    * checksum classes extract candidates with `regexp_extract_all`
    * and gate each through the codegen'd validator inside an array
    * `filter` — a narrow scan, no shuffle, no UDF. The twin replays
    * the same candidates and folds the same checksums in SQL
    * (generate_series Luhn sum; list_reduce mod-97).
    *
    * The NAMES leg runs on the Aho–Corasick automaton
    * ([[graft.functions.AcGazetteerNameCount]]) — one pass regardless
    * of gazetteer size, where the [[NameRe]] alternation scan grows
    * with the dictionary. The two forms are provably equal on
    * prefix-free gazetteers (TextAnalysisSpec pins it on randomized
    * text), and the DuckDB twin keeps replaying the REGEX form — the
    * oracle is a standing cross-implementation check. */
  def piiNerCounts(text: Column): (Column, Column, Column, Column) = {
    import org.apache.spark.sql.GraftColumnBridge.{column => cc, expression => ee}
    val names = cc(graft.functions.AcGazetteerNameCount(ee(text), FirstNameGazetteer))
    val addrs = regexp_count(text, lit(AddressRe))
    val cards = size(filter(regexp_extract_all(text, lit(CardCandidateRe), lit(0)),
      c => cc(graft.functions.LuhnValid(ee(c)))))
    val ibans = size(filter(regexp_extract_all(text, lit(IbanCandidateRe), lit(0)),
      c => cc(graft.functions.IbanValid(ee(c)))))
    (names, addrs, cards, ibans)
  }

  // ---- licence / provenance detection -----------------------------------

  /** SPDX tag extractor — `SPDX-License-Identifier: <id>` is the
    * machine-readable licence declaration the SPDX spec defines and
    * most code corpora carry; the id charset is the SPDX short-form
    * grammar (letters, digits, `.+-`). Same Java∩RE2 regex subset as
    * the PII patterns, so the DuckDB twin replays it verbatim. */
  private[graft] val SpdxIdRe =
    "SPDX-License-Identifier:[ \\t]*([A-Za-z0-9.+-]+)"

  /** Canonical licence-header phrases, most-specific first (the order
    * IS the precedence: AGPL/LGPL outrank the bare-GPL patterns their
    * names embed, BSD-3's endorse-clause marker outranks the shared
    * BSD preamble). Each pattern is one distinctive sentence from the
    * licence's canonical text (public knowledge — the dozen headers
    * every provenance scanner matches), case-insensitive, with bounded
    * gaps (`.{0,n}` under `(?s)`, never `.*`) so a pathological
    * document cannot turn the scan quadratic. Java∩RE2 subset only —
    * no lookaround, no backreferences. */
  private[graft] val LicenseHeaderPatterns: Seq[(String, String)] = Seq(
    "Apache-2.0"   -> "(?i)Apache License,? Version 2\\.0",
    "AGPL-3.0"     -> "(?i)GNU Affero General Public License",
    "LGPL"         -> "(?i)GNU (Lesser|Library) General Public License",
    "GPL-3.0"      -> "(?is)GNU General Public License.{0,200}version 3",
    "GPL-2.0"      -> "(?is)GNU General Public License.{0,200}version 2",
    "MIT"          -> "(?i)Permission is hereby granted, free of charge, to any person obtaining a copy",
    "BSD-3-Clause" -> "(?is)Redistribution and use in source and binary forms.{0,800}endorse or promote",
    "BSD-2-Clause" -> "(?i)Redistribution and use in source and binary forms",
    "MPL-2.0"      -> "(?i)Mozilla Public License,? (Version |v\\.? ?)?2\\.0",
    "ISC"          -> "(?i)Permission to use, copy, modify, and(/or)? distribute this software",
    "Unlicense"    -> "(?i)free and unencumbered software released into the public domain",
    "CC0-1.0"      -> "(?i)waived all copyright and related or neighboring rights")

  /** SPDX ids classified permissive; everything matching the
    * GPL/AGPL/LGPL/MPL prefixes is copyleft (weak copyleft included —
    * both impose redistribution obligations a compliance gate must
    * surface); anything else (unknown SPDX ids, `NONE`) is unknown —
    * the conservative default a curation pipeline QUARANTINES rather
    * than ships. */
  private[graft] val PermissiveLicenseIds: Seq[String] = Seq(
    "MIT", "Apache-2.0", "BSD-2-Clause", "BSD-3-Clause", "ISC",
    "Unlicense", "CC0-1.0", "0BSD", "Zlib")

  def licenseFamily(id: Column): Column =
    when(id.isin(PermissiveLicenseIds: _*), "permissive")
      // prefix match classifies the whole SPDX variant space
      // (GPL-3.0-only, LGPL-2.1-or-later, ...) without enumerating it
      .when(id.rlike("^(AGPL|LGPL|GPL|MPL)"), "copyleft")
      .otherwise("unknown")

  /** Licence detection: (licence_id, family, via). An SPDX tag wins
    * over header prose (it is the declared intent; case 'header says
    * MIT, tag says BSD-3-Clause' resolves to the tag); otherwise the
    * first matching header pattern; otherwise `NONE`/unknown/none.
    * One narrow codegen'd scan — ~a dozen bounded regex probes per
    * row, fused by whole-stage codegen with whatever filter follows
    * (repeated subtrees collapse under subexpression elimination).
    * This is the first compliance gate of a code-data pipeline:
    * route permissive, quarantine unknown, exclude-or-comply
    * copyleft. */
  def detectLicense(text: Column): (Column, Column, Column) = {
    val spdx = regexp_extract(text, SpdxIdRe, 1)
    val header = LicenseHeaderPatterns.reverse.foldLeft(lit("NONE")) {
      case (acc, (id, re)) => when(text.rlike(re), lit(id)).otherwise(acc)
    }
    val id = when(length(spdx) > 0, spdx).otherwise(header)
    val via = when(length(spdx) > 0, lit("spdx"))
      .when(header =!= "NONE", lit("header"))
      .otherwise(lit("none"))
    (id, licenseFamily(id), via)
  }

  /** Canonical text form for fingerprinting: lowercase, punctuation
    * stripped, whitespace collapsed. */
  /** Repair UTF-8-decoded-as-cp1252 mojibake ("cafÃ©" -> "café") via
    * the strict inverse transform — see [[graft.functions.FixMojibake]]
    * for the three safety gates that keep legitimate text (e.g. "São")
    * untouched. Run BEFORE [[canonicalText]]/fingerprints: the corrupted
    * and clean forms of the same document otherwise never dedup. */
  def fixMojibake(text: Column): Column = graft.functions.FixMojibake(text)

  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\\s]", " "), "\\s+", " "))

  /** Markup strip — the crawl-extraction step (HTML/XML -> text) kept
    * deliberately regex-simple so the oracle twin runs the SAME
    * patterns: drop script/style SUBTREES (content too, `(?is)` dotall
    * so tags spanning lines die), then every remaining tag, then HTML
    * comments, decode the six entities that dominate real markup, and
    * collapse whitespace. All Java-regex/RE2 shared syntax. A browser-
    * grade extractor (boilerplate removal, main-content detection) is a
    * model call upstream; this is the scan-speed structural pass every
    * crawl pipeline runs first — narrow codegen, no shuffle. */
  def stripMarkup(text: Column): Column = {
    val noScript = regexp_replace(text,
      "(?is)<(script|style)[^>]*>.*?</(script|style)>", " ")
    val noComments = regexp_replace(noScript, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComments, "(?s)<[^>]+>", " ")
    val decoded = regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(regexp_replace(noTags,
        "&nbsp;", " "), "&lt;", "<"), "&gt;", ">"),
        "&quot;", "\""), "&#39;", "'"), "&amp;", "&")
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Keep only the FIRST occurrence of each line — the within-document
    * twin of cross-corpus span dedup: boilerplate navigation/footer
    * lines repeated inside one page collapse to one copy, in original
    * order. Window-free: a per-row [[graft.functions.DedupLines]]
    * codegen expression, narrow at any scale. */
  def dedupLines(text: Column): Column =
    graft.functions.DedupLines(text)

  /** Unicode script classes as code-point RANGES written with \x{hhhh}
    * — the one syntax Java regex (Spark) and RE2 (the DuckDB oracle)
    * both accept verbatim, so the twin runs the SAME patterns and no
    * Unicode-property-name drift between engines can split results.
    * Ranges cover the dominant blocks, not every historic extension —
    * a routing signal, not a linguistics library. */
  val ScriptRanges: Seq[(String, String)] = Seq(
    "latin" -> "[A-Za-z\\x{00C0}-\\x{024F}]",
    "cjk" -> "[\\x{4E00}-\\x{9FFF}\\x{3040}-\\x{30FF}\\x{AC00}-\\x{D7AF}]",
    "cyrillic" -> "[\\x{0400}-\\x{04FF}]",
    "arabic" -> "[\\x{0600}-\\x{06FF}]",
    "devanagari" -> "[\\x{0900}-\\x{097F}]")

  /** Per-script character counts, all from ONE character walk
    * ([[graft.functions.ScriptProfile]] — it implements exactly the
    * [[ScriptRanges]] classes; five separate regexp_counts measured ~2×
    * this single pass on the documents fixture, BENCH_NOTES #34). The
    * five field extractions reference structurally identical
    * ScriptProfile trees, which physical subexpression elimination
    * collapses to one evaluation per row. */
  def scriptCounts(text: Column): Seq[(String, Column)] =
    graft.functions.ScriptProfile.classNames.map { name =>
      name -> graft.functions.ScriptProfile(text).getField(name)
    }

  /** Dominant script label: the class with the most characters, ties
    * resolved by [[ScriptRanges]] order; 'none' when no class matches
    * (digits/punctuation-only text) — and, as before the single-pass
    * rewrite, on NULL text ('none' label over null counts, the regex
    * argmax chain's historical fallthrough). */
  def dominantScript(text: Column): Column =
    coalesce(graft.functions.ScriptProfile(text).getField("script"), lit("none"))

  /** Unicode-canonical text: NFC compose, lowercase, collapse
    * whitespace. The dedup-robustness prerequisite [[normalize]] skips:
    * composed U+00E9 and decomposed e+U+0301 render identically but
    * hash differently until NFC unifies them, so every downstream
    * fingerprint/shingle/span hash silently splits such duplicates.
    * Narrow codegen'd pass ([[graft.functions.NfcNormalize]] with an
    * ASCII fast path), the first stage a multilingual 100 TB corpus
    * runs before any hashing operator. */
  def canonicalText(text: Column): Column =
    trim(regexp_replace(lower(graft.functions.NfcNormalize(text)), "\\s+", " "))

  /** Remove format-control characters the eye can't see but every hash
    * can: zero-widths (ZWSP/ZWNJ/ZWJ), stray BOMs, soft hyphens vanish;
    * NBSP and the typographic space block normalize to a plain space.
    * Copy-pasted web text is full of these, and "identical" strings
    * that differ only invisibly split every dedup/fingerprint. Both
    * regexes are in the Java-regex/RE2 agreement subset, shared
    * verbatim with the DuckDB twin — plain column algebra, narrow. */
  def stripInvisible(text: Column): Column =
    regexp_replace(
      regexp_replace(text,
        "[\\x{200B}\\x{200C}\\x{200D}\\x{FEFF}\\x{00AD}]", ""),
      "[\\x{00A0}\\x{2000}-\\x{200A}\\x{202F}\\x{205F}\\x{3000}]", " ")

  /** Content fingerprint: md5 of the normalized text. Stable across
    * whitespace/case/punctuation perturbations — the exact-dedup key. */
  def fingerprint(text: Column): Column = md5(normalize(text).cast("binary"))

  /** Rolling-hash fingerprint of the normalized text (codegen'd
    * polynomial hash — see graft.functions.RollingHash). Cheaper than
    * md5 and incrementally computable. */
  def rollingFingerprint(text: Column): Column =
    graft.functions.RollingHash(normalize(text))

  /** Distinctive terms per class, c-TF-IDF style (the class-based
    * TF-IDF topic-labeling pipelines use — BERTopic's scoring shape):
    * per-(class, token) counts weighted by `ln(1 + n_classes /
    * df_classes)`, top `k` per class by (score desc, token asc).
    * `toks` is one row per token occurrence (`classCol | tokenCol`);
    * the class can be a language, a planted label, or a discovered
    * embedding-cluster cell ([[Ivf.attachCell]]) — the topic-report
    * composition. Output: `classCol | rk | token | score`.
    *
    * Shuffle story (unchanged from the txt_top_terms query this was
    * factored out of, whose DuckDB twin value-gates the arithmetic):
    * one groupBy on (class, token); one re-shuffle of that BOUNDED
    * vocab-sized aggregate on token for the df join; one window over
    * n_classes partitions. Nothing corpus-sized joins or broadcasts. */
  def classTopTerms(toks: DataFrame, classCol: String, tokenCol: String,
                    k: Int, classUniverse: Option[DataFrame] = None): DataFrame = {
    val tf = toks.groupBy(col(classCol), col(tokenCol)).agg(count(lit(1)).as("tf"))
    // n_classes from the (cheap, un-exploded) universe frame when the
    // caller has one — counting it off the token rows would re-scan the
    // exploded corpus for a single scalar
    val nc = classUniverse.getOrElse(toks.select(col(classCol)))
      .agg(count_distinct(col(classCol)).as("n_classes"))
    classTopTermsFromCounts(tf, classCol, tokenCol, "tf", k, nc)
  }

  /** Overlapping fixed-size chunking — the RAG/embedding-prep splitter:
    * each document yields `1 + ceil(max(0, len - size) / stride)` chunks
    * (stride = size − overlap), chunk `i` covering codepoints
    * `[i·stride, min(i·stride + size, len))`; the final chunk may be
    * short, a doc shorter than `size` (including empty) yields exactly
    * one chunk. Offsets are emitted so downstream consumers (span
    * alignment, citation highlighting) can map chunk hits back into the
    * source — `substring(text, start+1, end-start)` recovers the chunk,
    * which is how the oracle gates it.
    *
    * Output: `idCol | chunk_idx | start | end | chunk` (long offsets,
    * end exclusive).
    *
    * Scale shape: one narrow generate pass — `explode(sequence)` +
    * `substring` (the sanctioned chunking idiom; substring is codegen,
    * so the measured HOF-regeneration trap does not apply). Row fan-out
    * is the chunk count, text duplicated per chunk exactly like every
    * columnar splitter — linear, no shuffle. */
  def chunkText(df: DataFrame, idCol: String, textCol: String,
                size: Int, overlap: Int): DataFrame = {
    require(size > 0, "size must be > 0")
    require(overlap >= 0 && overlap < size, "overlap must be in [0, size)")
    val stride = (size - overlap).toLong
    val len = length(col(textCol)).cast("long")
    // integer ceil via floor((x + stride - 1) / stride): exact — the
    // operands are far below 2^53, so the double division of an exact
    // multiple rounds to the exact integer
    val n = lit(1L) + floor(
      (greatest(len - size.toLong, lit(0L)) + lit(stride - 1L)).cast("double")
        / stride).cast("long")
    val start = col("chunk_idx") * stride
    val end = least(start + size.toLong, len)
    df.select(col(idCol), col(textCol),
        explode(sequence(lit(0L), n - 1L)).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"), start.as("start"), end.as("end"),
        // substring(col, colPos, colLen) needs the SQL form — the Scala
        // overload takes Int literals only
        expr(s"substring($textCol, cast(chunk_idx * $stride as int) + 1, " +
          s"cast(least(chunk_idx * $stride + $size, length($textCol)) " +
          s"- chunk_idx * $stride as int))").as("chunk"))
  }

  /** [[classTopTerms]] over PRE-AGGREGATED (class, token, tf) counts —
    * for callers that already hold the count table (e.g. a checkpointed
    * per-cell aggregate reused by several gates). `nClasses` is a
    * one-row frame with an `n_classes` column. Same vocab-bounded
    * shuffle story. */
  def classTopTermsFromCounts(tf: DataFrame, classCol: String,
                              tokenCol: String, tfCol: String, k: Int,
                              nClasses: DataFrame): DataFrame = {
    require(k > 0, "k must be > 0")
    val dfc = tf.groupBy(col(tokenCol)).agg(count(lit(1)).as("df_classes"))
    val scored = tf.join(dfc, Seq(tokenCol)).crossJoin(broadcast(nClasses))
      .withColumn("score",
        round(col(tfCol) * log(lit(1.0) + col("n_classes").cast("double") / col("df_classes")), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(classCol)).orderBy(col("score").desc, col(tokenCol).asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col(classCol), col("rk"), col(tokenCol).as("token"), col("score"))
  }
}
