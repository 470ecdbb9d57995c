package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data Selection with Importance Resampling (DSIR) — score a raw
  * document pool by how target-domain-like its hashed n-gram features
  * are, then keep the top-weighted documents. The published recipe
  * (Xie et al. 2023, "Data Selection for Language Models via
  * Importance Resampling"): fit two bag-of-hashed-n-gram unigram
  * models, one on a (small) target-domain exemplar corpus and one on
  * the raw pool, and weight each pool document by its log importance
  * ratio sum_f n_f · [log p_target(f) − log p_pool(f)] over its
  * feature counts n_f. This implementation selects the top-k by
  * weight (the deterministic heavy-selection variant; the paper's
  * Gumbel-noised resampling draws a softened sample — swap the final
  * ordering for a noised one if diversity matters more than
  * reproducibility).
  *
  * Feature space: lowercased whitespace tokens hashed into 256
  * buckets keyed by the FIRST TWO hex chars of md5(token). A string
  * bucket key (not a parsed integer) keeps the hash engine-portable:
  * any engine with md5 derives the identical feature space, so the
  * whole selection is oracle-checkable — the same portability
  * rationale as [[Sample.capPerKey]]'s md5 draws. Laplace smoothing
  * (+1 over the 256-bucket space) keeps unseen buckets finite.
  *
  * Scale shape: two token-count aggregates (map-side combined, so the
  * shuffle carries at most 256 rows per map task), a 256-row
  * broadcast of the log-ratio table into a per-(doc, bucket) count
  * aggregate, and a top-k (TakeOrderedAndProject — k rows to the
  * driver, never a global sort). Nothing corpus-sized ever sits on
  * one node; at 100 TB the only full-data passes are the two narrow
  * tokenize scans. */
object Dsir {

  /** Size of the hashed feature space (2 hex chars = 256 buckets). */
  val Buckets = 256

  private def toks(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** md5-prefix feature bucket of one token — engine-portable. */
  def bucket(token: Column): Column = substring(md5(token.cast("binary")), 1, 2)

  /** Joined per-bucket token counts for target (`_ct`) and pool
    * (`_cr`) — at most one row per OBSERVED bucket. Target and pool
    * are typically filters of ONE corpus frame, so the two aggregates
    * share scan lineage — every reference is qualified via explicit
    * aliases or the analyzer calls the columns ambiguous. */
  private def pairedBucketCounts(target: DataFrame, pool: DataFrame,
                                 textCol: String): DataFrame = {
    def bucketCounts(df: DataFrame, out: String): DataFrame =
      df.select(explode(toks(col(textCol))).as("_t"))
        .filter(length(col("_t")) > 0)
        .groupBy(bucket(col("_t")).as("_b")).agg(count(lit(1)).as(out))
    val t = bucketCounts(target, "_ct").alias("_dsir_t")
    val r = bucketCounts(pool, "_cr").alias("_dsir_r")
    t.join(r, col("_dsir_t._b") === col("_dsir_r._b"), "full_outer")
      .select(coalesce(col("_dsir_t._b"), col("_dsir_r._b")).as("_b"),
        coalesce(col("_dsir_t._ct"), lit(0L)).as("_ct"),
        coalesce(col("_dsir_r._cr"), lit(0L)).as("_cr"))
  }

  /** Per-bucket log importance ratios
    * log((ct_b+1)/(Ct+256)) − log((cr_b+1)/(Cr+256)) fitted from the
    * target exemplar vs the raw pool: a 256-row frame (`_b`,
    * `_logratio`), broadcastable by construction. */
  def logRatios(target: DataFrame, pool: DataFrame, textCol: String): DataFrame = {
    val joined = pairedBucketCounts(target, pool, textCol)
    // corpus totals via a window over the joined frame — ≤256 rows by
    // construction (the feature space), so the single partition is
    // bounded by the bucket count, never the data
    val wAll = Window.partitionBy(lit(1))
    joined.select(col("_b"),
      (log((col("_ct").cast("double") + lit(1.0))
            / (sum(col("_ct")).over(wAll).cast("double") + lit(Buckets.toDouble)))
        - log((col("_cr").cast("double") + lit(1.0))
            / (sum(col("_cr")).over(wAll).cast("double") + lit(Buckets.toDouble)))).as("_logratio"))
  }

  /** Top-`k` pool documents by DSIR importance weight: (rank, id,
    * weight) with rank 1 = most target-like. Weights are summed over
    * per-(doc, bucket) INTEGER counts times the bucket log-ratio —
    * ≤256 float additions per document regardless of length — and
    * rounded to 4 dp BEFORE ranking so the ordering is reproducible
    * across engines and partitionings (doc id breaks rounded ties).
    * The final rank window runs over k rows, bounded by the ask, not
    * the data. */
  /** Per-doc importance weights, 4-dp rounded: (`idCol`, weight). */
  private def docWeights(pool: DataFrame, idCol: String, textCol: String,
                         target: DataFrame): DataFrame = {
    val lr = logRatios(target, pool, textCol)
    pool.select(col(idCol), explode(toks(col(textCol))).as("_t"))
      .filter(length(col("_t")) > 0)
      .groupBy(col(idCol), bucket(col("_t")).as("_b"))
      .agg(count(lit(1)).as("_n"))
      .join(broadcast(lr), "_b")
      .groupBy(col(idCol))
      .agg(round(sum(col("_n").cast("double") * col("_logratio")), 4).as("weight"))
  }

  /** Top-k by key desc (id tiebreak) with a bounded `rank` column —
    * TakeOrderedAndProject then a window over the k survivors. */
  private def rankedTopK(weighted: DataFrame, idCol: String,
                         keyCol: String, k: Int, outCols: Seq[Column]): DataFrame = {
    val top = weighted.orderBy(col(keyCol).desc, col(idCol).asc).limit(k)
    val w = Window.orderBy(col(keyCol).desc, col(idCol).asc)
    top.withColumn("rank", row_number().over(w)).select(outCols: _*)
  }

  def topK(pool: DataFrame, idCol: String, textCol: String,
           target: DataFrame, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    rankedTopK(docWeights(pool, idCol, textCol, target), idCol, "weight", k,
      Seq(col("rank"), col(idCol), col("weight")))
  }

  /** The paper-faithful RESAMPLING form: a weighted sample of `k`
    * documents WITHOUT replacement with inclusion odds softened by
    * temperature `tau`, via the Gumbel-top-k trick (public method:
    * Vieira 2014; Kool et al. 2019) — rank by weight/tau + Gumbel
    * noise and keep the top k. The noise is NOT seeded RNG: each
    * doc's uniform is the top 32 bits of md5(salt|id) (the
    * [[Sample.acceptByScore]] draw), so the sample is reproducible
    * across runs, partitionings, and ENGINES — g = −ln(−ln((h+0.5) /
    * 2^32)), well-defined because the +0.5 keeps u strictly inside
    * (0, 1). Same scale shape as [[topK]]; the key rounds to 4 dp
    * before ranking for cross-engine ordering stability. */
  def resample(pool: DataFrame, idCol: String, textCol: String,
               target: DataFrame, k: Int, tau: Double,
               salt: String = "dsir"): DataFrame = {
    require(k > 0, "k must be positive")
    require(tau > 0, "tau must be positive")
    val u = (conv(substring(md5(concat(lit(salt), lit("|"),
        col(idCol).cast("string"))), 1, 8), 16, 10).cast("double") + lit(0.5)) /
      lit(4294967296.0)
    val keyed = docWeights(pool, idCol, textCol, target)
      .withColumn("gumbel_key",
        round(col("weight") / lit(tau) - log(-log(u)), 4))
    rankedTopK(keyed, idCol, "gumbel_key", k,
      Seq(col("rank"), col(idCol), col("weight"), col("gumbel_key")))
  }

  /** The fitted log-ratio model as a COMPLETE driver-side map — one
    * entry for every one of the 256 buckets, including unobserved
    * ones (whose ratio is the smoothing constant ln((Cr+256)/(Ct+256))
    * ), so per-row scoring never misses a key. Bounded by the feature
    * space — a model artifact, not data. */
  def fitLogRatioMap(target: DataFrame, pool: DataFrame,
                     textCol: String): Map[String, Double] = {
    val spark = target.sparkSession
    val full = spark.range(Buckets).select(format_string("%02x", col("id")).as("_b"))
    val joined = full.join(pairedBucketCounts(target, pool, textCol), Seq("_b"), "left")
      .select(col("_b"),
        coalesce(col("_ct"), lit(0L)).as("_ct"),
        coalesce(col("_cr"), lit(0L)).as("_cr"))
    val wAll = Window.partitionBy(lit(1))
    joined.select(col("_b"),
        (log((col("_ct").cast("double") + lit(1.0))
              / (sum(col("_ct")).over(wAll).cast("double") + lit(Buckets.toDouble)))
          - log((col("_cr").cast("double") + lit(1.0))
              / (sum(col("_cr")).over(wAll).cast("double") + lit(Buckets.toDouble)))).as("_lr"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
  }

  /** Per-ROW importance score against a fitted model: the sum of
    * bucket log-ratios over the row's tokens as a single narrow
    * expression — no explode, no grouping, no state. This is the
    * STREAMING-safe form (append mode, stateless): a live admission
    * gate filters each micro-batch row by `scoreExpr >= minWeight`
    * with the model broadcast as a 256-entry literal map. Numerically
    * it equals [[topK]]'s grouped weight up to FP summation order
    * (per-token adds here vs per-bucket count×ratio there). */
  def scoreExpr(text: Column, lrMap: Map[String, Double]): Column = {
    require(lrMap.size == Buckets,
      s"lrMap must cover all $Buckets buckets (use fitLogRatioMap)")
    val m = typedLit(lrMap)
    aggregate(
      filter(toks(text), t => length(t) > 0),
      lit(0.0),
      (acc, t) => acc + element_at(m, bucket(t)))
  }

  /** Domain-shift report between the target exemplar and the pool
    * over the full smoothed 256-bucket hashed-vocabulary
    * distributions: KL(P‖Q), KL(Q‖P), Jensen–Shannon divergence, and
    * L1 distance, plus observed-bucket counts. P and Q include the
    * smoothing mass of UNOBSERVED buckets (the full space is
    * generated, not just observed rows), so each distribution sums to
    * exactly 1 and the divergences are true divergences. One row out;
    * the only data-sized work is the two token-count aggregates. */
  def domainDivergence(target: DataFrame, pool: DataFrame,
                       textCol: String): DataFrame = {
    val spark = target.sparkSession
    val full = spark.range(Buckets).select(format_string("%02x", col("id")).as("_b"))
    val joined = full.join(pairedBucketCounts(target, pool, textCol), Seq("_b"), "left")
      .select(col("_b"),
        coalesce(col("_ct"), lit(0L)).as("_ct"),
        coalesce(col("_cr"), lit(0L)).as("_cr"))
    val wAll = Window.partitionBy(lit(1))
    val dist = joined.select(col("_b"), col("_ct"), col("_cr"),
      ((col("_ct").cast("double") + lit(1.0))
        / (sum(col("_ct")).over(wAll).cast("double") + lit(Buckets.toDouble))).as("_p"),
      ((col("_cr").cast("double") + lit(1.0))
        / (sum(col("_cr")).over(wAll).cast("double") + lit(Buckets.toDouble))).as("_q"))
    val m = (col("_p") + col("_q")) / lit(2.0)
    dist.agg(
      round(sum(col("_p") * log(col("_p") / col("_q"))), 6).as("kl_target_pool"),
      round(sum(col("_q") * log(col("_q") / col("_p"))), 6).as("kl_pool_target"),
      round(sum(col("_p") * log(col("_p") / m) + col("_q") * log(col("_q") / m)) / 2.0, 6)
        .as("js_divergence"),
      round(sum(abs(col("_p") - col("_q"))), 6).as("l1_distance"),
      sum((col("_ct") > 0).cast("long")).as("target_buckets"),
      sum((col("_cr") > 0).cast("long")).as("pool_buckets"))
  }
}
