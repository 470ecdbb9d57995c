package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{BigramKeys, LmVocab}

/** N-gram language-model perplexity scoring — the CCNet-recipe quality
  * filter (Wenzek et al. 2020: score a crawl against an LM trained on a
  * clean reference corpus; low perplexity = reference-like text, high =
  * junk/other-language). The reference engine has no LM stage, but any
  * production curation pipeline runs one; this is the bigram flavor
  * whose math a SQL oracle can reproduce exactly.
  *
  * Shape (all counts, no floats until scoring — engine-exact parity):
  *
  *  1. Vocabulary: top-`maxVocab` tokens of the REFERENCE corpus by
  *     (count desc, token asc) — a `TakeOrderedAndProject` heap, driver
  *     holds `maxVocab` strings, never text. OOV -> `&lt;unk&gt;` bounds
  *     every LM table regardless of corpus size.
  *  2. Bigram counts: [[graft.functions.BigramKeys]] emits each row's
  *     vocab-mapped `"prev cur"` keys in ONE narrow codegen pass (BOS
  *     `&lt;s&gt;` starts each doc), then a single `groupBy(key).count`
  *     shuffle. Context counts aggregate from the bigram table itself
  *     (`c(w1·) = Σ_w2 c(w1,w2)` — consistent by construction).
  *  3. Scoring: explode the target's mapped bigram keys, left-join the
  *     two count tables, per-token add-α log-likelihood
  *     `ln((c(w1,w2)+α) / (c(w1·)+α·V))`, average per doc. Perplexity
  *     `exp(-avg)`. V = vocabSize + 1 (the unk bucket; BOS is never a
  *     predicted token so it does not enter V).
  *
  * Scale: the token stream is touched narrowly once, shuffled once on
  * bigram key (the LM join), once on doc id (the final agg). Both LM
  * tables are bounded by the closed vocabulary — `maxVocab` in the tens
  * of thousands keeps contexts broadcastable and bigrams far below
  * corpus size, so the LM join's build side is the SMALL side at any
  * corpus scale. */
object LangModel {

  /** Trained bigram LM: bounded count tables + the closed vocabulary. */
  final case class BigramLm(vocab: LmVocab, bigrams: DataFrame,
                            contexts: DataFrame, alpha: Double) {
    /** Smoothing denominator vocabulary size: |vocab| + unk. */
    def vSize: Int = vocab.size + 1
  }

  private def bigramKeys(textCol: Column, vocab: LmVocab,
                         tokenizer: Column => Column): Column =
    BigramKeys(tokenizer(textCol), vocab)

  /** Learn the vocabulary + bigram/context counts from `reference`
    * (the clean corpus — CCNet uses Wikipedia; the demo query uses the
    * fixture's English slice). */
  def train(reference: DataFrame, textCol: Column, maxVocab: Int,
            alpha: Double = 0.5,
            tokenizer: Column => Column = TextAnalysis.tokens): BigramLm = {
    require(maxVocab > 0, "maxVocab must be > 0")
    require(alpha > 0, "alpha must be > 0 (unsmoothed zeros break ln)")
    val top = reference
      .select(explode(tokenizer(textCol)).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc)
      .limit(maxVocab)
      .collect().map(_.getString(0))
    val vocab = new LmVocab(top)
    // eager checkpoint: the bigram table is consumed by the context
    // aggregate AND every scoring join — without it each consumer
    // re-explodes the reference corpus. Both tables are vocab-bounded
    // small sets, the exact shape core.Checkpoint exists for.
    val bigrams = graft.core.Checkpoint.materialize(reference
      .select(explode(bigramKeys(textCol, vocab, tokenizer)).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("cb")))
    val contexts = graft.core.Checkpoint.materialize(bigrams
      .groupBy(substring_index(col("bg"), " ", 1).as("w1"))
      .agg(sum(col("cb")).as("cw")))
    BigramLm(vocab, bigrams, contexts, alpha)
  }

  /** Per-document cross-entropy (nats) and perplexity of `target` under
    * `lm`. Docs with zero tokens emit nothing (no bigrams to score).
    * Output: (idCol, n_tokens, cross_entropy, perplexity), both doubles
    * rounded to 4 — FP summation order differs across engines. */
  def perplexity(target: DataFrame, idCol: String, textCol: String, lm: BigramLm,
                 tokenizer: Column => Column = TextAnalysis.tokens): DataFrame = {
    val v = lit(lm.alpha * lm.vSize)
    val logp = log(
      (coalesce(col("cb"), lit(0L)) + lm.alpha) /
      (coalesce(col("cw"), lit(0L)) + v))
    target
      .select(col(idCol), explode(bigramKeys(col(textCol), lm.vocab, tokenizer)).as("bg"))
      .join(lm.bigrams, Seq("bg"), "left")
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(lm.contexts, Seq("w1"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("int").as("n_tokens"), avg(logp).as("h"))
      .select(col(idCol), col("n_tokens"),
        round(-col("h"), 4).as("cross_entropy"),
        round(exp(-col("h")), 4).as("perplexity"))
  }

  /** Interpolated Kneser–Ney bigram LM — the KenLM-grade smoothing the
    * actual CCNet recipe uses, still fully SQL-twinnable: beyond
    * [[BigramLm]]'s tables it needs only two more vocab-bounded count
    * tables (distinct FOLLOWERS per context `N1+(w1·)` — the
    * interpolation weight numerator — and distinct PREDECESSORS per word
    * `N1+(·w2)` — the continuation count that makes "francisco" cheap
    * after "san" but expensive elsewhere) plus one scalar (total bigram
    * types). All derive from the already-materialized bigram table:
    * training adds two bounded aggregates and a count, no extra corpus
    * pass. */
  final case class KnBigramLm(vocab: LmVocab, bigrams: DataFrame,
                              contexts: DataFrame, followers: DataFrame,
                              continuation: DataFrame, nBigramTypes: Long,
                              discount: Double) {
    def vSize: Int = vocab.size + 1
  }

  def trainKn(reference: DataFrame, textCol: Column, maxVocab: Int,
              discount: Double = 0.75,
              tokenizer: Column => Column = TextAnalysis.tokens): KnBigramLm = {
    require(discount > 0 && discount < 1, "discount must be in (0, 1)")
    val base = train(reference, textCol, maxVocab, alpha = 0.5, tokenizer)
    val followers = graft.core.Checkpoint.materialize(base.bigrams
      .groupBy(substring_index(col("bg"), " ", 1).as("w1"))
      .agg(count(lit(1)).as("f1")))
    val continuation = graft.core.Checkpoint.materialize(base.bigrams
      .groupBy(substring_index(col("bg"), " ", -1).as("w2"))
      .agg(count(lit(1)).as("nc")))
    KnBigramLm(base.vocab, base.bigrams, base.contexts, followers,
      continuation, base.bigrams.count(), discount)
  }

  /** Per-document cross-entropy/perplexity under interpolated KN:
    * `P(w2|w1) = (max(c12−D,0) + D·N1+(w1·)·Pcont(w2)) / c(w1·)` for
    * seen contexts, else `Pcont(w2)`, with the continuation distribution
    * add-1 smoothed — `Pcont(w2) = (N1+(·w2)+1) / (NB+V)` — so every
    * probability is strictly positive and ln stays finite. Same output
    * shape and rounding as [[perplexity]]. */
  def perplexityKn(target: DataFrame, idCol: String, textCol: String,
                   lm: KnBigramLm,
                   tokenizer: Column => Column = TextAnalysis.tokens): DataFrame = {
    val d = lm.discount
    val pc = (coalesce(col("nc"), lit(0L)) + 1.0) /
      lit((lm.nBigramTypes + lm.vSize).toDouble)
    val p = when(coalesce(col("cw"), lit(0L)) > 0,
        (greatest(coalesce(col("cb"), lit(0L)) - d, lit(0.0)) +
          lit(d) * coalesce(col("f1"), lit(0L)) * pc) / col("cw"))
      .otherwise(pc)
    target
      .select(col(idCol), explode(bigramKeys(col(textCol), lm.vocab, tokenizer)).as("bg"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .withColumn("w2", substring_index(col("bg"), " ", -1))
      .join(lm.bigrams, Seq("bg"), "left")
      .join(lm.contexts, Seq("w1"), "left")
      .join(lm.followers, Seq("w1"), "left")
      .join(lm.continuation, Seq("w2"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("int").as("n_tokens"), avg(log(p)).as("h"))
      .select(col(idCol), col("n_tokens"),
        round(-col("h"), 4).as("cross_entropy"),
        round(exp(-col("h")), 4).as("perplexity"))
  }

  // ---- model persistence (the Ivf.saveModel artifact shape) -------------

  /** Persist a trained [[BigramLm]] under `path`: vocabulary as
    * (idx, token) rows (the top-by-count ORDER is part of the model),
    * both count tables as plain parquet, the smoothing scalar in a
    * one-row meta file. Everything written is vocab-bounded — never
    * corpus-sized — so the artifact is kilobytes-to-megabytes at any
    * training-corpus scale. Closes the train-per-job gap: the CCNet
    * recipe trains the reference LM ONCE (on Wikipedia) and scores every
    * crawl snapshot against the SAME model; without persistence every
    * scoring job silently re-trains on whatever slice it has. */
  def save(spark: org.apache.spark.sql.SparkSession, lm: BigramLm,
           path: String): Unit = {
    import spark.implicits._
    lm.vocab.tokens.zipWithIndex.toSeq.map { case (t, i) => (i, t) }
      .toDF("idx", "token").repartition(1)
      .write.mode("overwrite").parquet(s"$path/vocab")
    lm.bigrams.write.mode("overwrite").parquet(s"$path/bigrams")
    lm.contexts.write.mode("overwrite").parquet(s"$path/contexts")
    Seq(lm.alpha).toDF("alpha").repartition(1)
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Load a [[BigramLm]]: the count tables come back as LAZY parquet
    * reads — a loaded model scores a 100 TB target without retraining
    * and without materializing anything up front (the tables join as
    * the small side exactly like the trainer's checkpointed frames).
    * Scoring from a loaded model is bit-identical to scoring from the
    * trainer's in-memory model (LangModelSpec pins it). */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): BigramLm = {
    val vocab = new LmVocab(spark.read.parquet(s"$path/vocab")
      .orderBy(col("idx")).select(col("token")).collect().map(_.getString(0)))
    val meta = spark.read.parquet(s"$path/meta").collect()
    require(meta.length == 1, s"expected one meta row under $path/meta, got ${meta.length}")
    BigramLm(vocab, spark.read.parquet(s"$path/bigrams"),
      spark.read.parquet(s"$path/contexts"), meta(0).getDouble(0))
  }

  /** [[save]] plus the KN side: follower/continuation tables and the
    * (discount, bigram-type-count) scalars. */
  def saveKn(spark: org.apache.spark.sql.SparkSession, lm: KnBigramLm,
             path: String): Unit = {
    import spark.implicits._
    lm.vocab.tokens.zipWithIndex.toSeq.map { case (t, i) => (i, t) }
      .toDF("idx", "token").repartition(1)
      .write.mode("overwrite").parquet(s"$path/vocab")
    lm.bigrams.write.mode("overwrite").parquet(s"$path/bigrams")
    lm.contexts.write.mode("overwrite").parquet(s"$path/contexts")
    lm.followers.write.mode("overwrite").parquet(s"$path/followers")
    lm.continuation.write.mode("overwrite").parquet(s"$path/continuation")
    Seq((lm.discount, lm.nBigramTypes)).toDF("discount", "n_bigram_types")
      .repartition(1).write.mode("overwrite").parquet(s"$path/meta_kn")
  }

  def loadKn(spark: org.apache.spark.sql.SparkSession, path: String): KnBigramLm = {
    val vocab = new LmVocab(spark.read.parquet(s"$path/vocab")
      .orderBy(col("idx")).select(col("token")).collect().map(_.getString(0)))
    val meta = spark.read.parquet(s"$path/meta_kn").collect()
    require(meta.length == 1, s"expected one meta row under $path/meta_kn, got ${meta.length}")
    KnBigramLm(vocab, spark.read.parquet(s"$path/bigrams"),
      spark.read.parquet(s"$path/contexts"),
      spark.read.parquet(s"$path/followers"),
      spark.read.parquet(s"$path/continuation"),
      meta(0).getLong(1), meta(0).getDouble(0))
  }

  /** Train-on-reference, score-target in one call (the CCNet filter
    * stage: keep target rows under a perplexity ceiling upstream). */
  def perplexityAgainst(reference: DataFrame, target: DataFrame,
                        idCol: String, textCol: String, maxVocab: Int,
                        alpha: Double = 0.5,
                        tokenizer: Column => Column = TextAnalysis.tokens): DataFrame =
    perplexity(target, idCol, textCol,
      train(reference, col(textCol), maxVocab, alpha, tokenizer), tokenizer)

  /** CCNet's head/middle/tail split: per-group (usually per-language)
    * perplexity terciles — `head` = most reference-like third, `tail` =
    * junk-most. Thresholds are exact percentiles rounded to 4 (rounded
    * BEFORE the comparison so both engines cut on identical doubles;
    * ties land in the lower bucket). The threshold table is one row per
    * group — broadcast back, so bucketing costs one small agg + one
    * broadcast join over the scored rows. At 100 TB swap the exact
    * percentile for `percentile_approx` upstream of this call if group
    * cardinalities explode (same switch as `Ext.corpusStats`), and
    * persist/checkpoint `scored` first — it feeds both the threshold
    * aggregate and the label join, and it is corpus-sized (one row per
    * doc), so the CALLER owns that materialization decision. */
  def perplexityBuckets(scored: DataFrame, groupCols: Seq[String],
                        pplCol: String = "perplexity",
                        q1: Double = 1.0 / 3, q2: Double = 2.0 / 3): DataFrame = {
    require(q1 > 0 && q2 > q1 && q2 < 1, "need 0 < q1 < q2 < 1")
    val th = scored.groupBy(groupCols.map(col): _*)
      .agg(round(percentile(col(pplCol), lit(q1)), 4).as("ppl_t1"),
        round(percentile(col(pplCol), lit(q2)), 4).as("ppl_t2"))
    scored.join(broadcast(th), groupCols)
      .withColumn("bucket",
        when(col(pplCol) <= col("ppl_t1"), lit("head"))
          .when(col(pplCol) <= col("ppl_t2"), lit("middle"))
          .otherwise(lit("tail")))
  }
}
