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

  /** Per-bucket log importance ratios
    * log((ct_b+1)/(Ct+256)) − log((cr_b+1)/(Cr+256)) fitted from the
    * target exemplar vs the raw pool: a 256-row frame (`_b`,
    * `_logratio`), broadcastable by construction. */
  def logRatios(target: DataFrame, pool: DataFrame, textCol: String): DataFrame = {
    def bucketCounts(df: DataFrame, out: String): DataFrame =
      df.select(explode(toks(col(textCol))).as("_t"))
        .filter(length(col("_t")) > 0)
        .groupBy(bucket(col("_t")).as("_b")).agg(count(lit(1)).as(out))
    // target and pool are typically filters of ONE corpus frame, so the
    // two aggregates share scan lineage — qualify every reference via
    // explicit aliases or the analyzer calls the columns ambiguous
    val t = bucketCounts(target, "_ct").alias("_dsir_t")
    val r = bucketCounts(pool, "_cr").alias("_dsir_r")
    val joined = t.join(r, col("_dsir_t._b") === col("_dsir_r._b"), "full_outer")
      .select(coalesce(col("_dsir_t._b"), col("_dsir_r._b")).as("_b"),
        coalesce(col("_dsir_t._ct"), lit(0L)).as("_ct"),
        coalesce(col("_dsir_r._cr"), lit(0L)).as("_cr"))
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
  def topK(pool: DataFrame, idCol: String, textCol: String,
           target: DataFrame, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val lr = logRatios(target, pool, textCol)
    val perDocBucket = pool
      .select(col(idCol), explode(toks(col(textCol))).as("_t"))
      .filter(length(col("_t")) > 0)
      .groupBy(col(idCol), bucket(col("_t")).as("_b"))
      .agg(count(lit(1)).as("_n"))
    val weighted = perDocBucket.join(broadcast(lr), "_b")
      .groupBy(col(idCol))
      .agg(round(sum(col("_n").cast("double") * col("_logratio")), 4).as("weight"))
      .orderBy(col("weight").desc, col(idCol).asc)
      .limit(k)
    val w = Window.orderBy(col("weight").desc, col(idCol).asc)
    weighted.withColumn("rank", row_number().over(w))
      .select(col("rank"), col(idCol), col("weight"))
  }
}
