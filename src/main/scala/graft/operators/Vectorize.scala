package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{CentroidAggregator, HashedTfVector, VectorOps, WeightScale}

/** Engine-native text vectorization: hashed TF-IDF embeddings
  * (hashing trick, Weinberger et al. 2009 + the MLlib HashingTF/IDF
  * composition) — a DETERMINISTIC, dependency-free `text →
  * array<float>` so every `sim_*` / `dedup_embed_*` operator runs
  * end-to-end from raw text, with no external embeddings API and no
  * pre-made fixture required ([[Embed]] is the API path; this is the
  * self-sufficient one).
  *
  * Scale shape — two NARROW corpus passes, zero data shuffles:
  *
  *  1. tf: [[HashedTfVector]] per row (fixed `dim`, no vocabulary, no
  *     fit) + the document count and per-slot document frequencies in
  *     ONE aggregation whose state is a single dim-length vector
  *     (partial aggregation: each task folds its rows locally, buffers
  *     merge on the driver side — the shuffle carries one vector per
  *     partition, not rows).
  *  2. scale: idf rides back as a dim-length reference object
  *     ([[WeightScale]] — O(1) plan size at any dim) and the row's
  *     vector is tf·idf, L2-normalized, in one codegen'd projection.
  *
  * The idf table is `dim` doubles on the driver — bounded by the
  * CHOSEN dimension, independent of corpus size (contrast a dictionary
  * vectorizer whose fit state is the vocabulary). MLlib's smoothed
  * formula: idf = ln((N + 1) / (df + 1)) + 1 — strictly positive, so
  * hash slots never nullify and cosine stays well-defined. */
object Vectorize {

  /** Per-slot idf weights learned from `df` (one bounded-state pass).
    * Exposed so a TRAINING corpus can fit the weights and a serving /
    * incremental batch can reuse them (same seam as the tokenizer
    * models: fit once, apply anywhere). */
  def fitIdf(df: DataFrame, textCol: Column, dim: Int, seed: Long = 42L,
             tokenizer: Column => Column = TextAnalysis.tokens): Array[Double] = {
    // presence indicator per slot; mean over docs = df/N, so
    // df = mean * N — reuses the mergeable centroid aggregator
    val ind = transform(HashedTfVector(tokenizer(textCol), dim, seed),
      x => when(x > 0d, 1f).otherwise(0f))
    val row = df.agg(
      CentroidAggregator.centroid(ind).as("mean_presence"),
      count(lit(1)).as("n")).head()
    val n = row.getLong(1)
    if (n == 0) return Array.fill(dim)(1.0)
    val mean = row.getSeq[Double](0)
    Array.tabulate(dim) { i =>
      val dfi = (if (i < mean.length) mean(i) else 0.0) * n
      math.log((n + 1.0) / (dfi + 1.0)) + 1.0
    }
  }

  /** tf·idf embedding column (L2-normalized float array) under fitted
    * `idf` weights — a pure narrow projection, applicable to any batch. */
  def embedColumn(textCol: Column, idf: Array[Double], seed: Long = 42L,
                  tokenizer: Column => Column = TextAnalysis.tokens): Column =
    VectorOps.l2Normalize(
        WeightScale(HashedTfVector(tokenizer(textCol), idf.length, seed), idf))
      .cast("array<float>")

  /** Fit + apply over one corpus: `df` plus an `outCol` embedding
    * column. Two passes total (fit is pass one, the projection is lazy
    * pass two); deterministic for a given corpus and seed. */
  def hashedTfIdf(df: DataFrame, textCol: String, outCol: String, dim: Int,
                  seed: Long = 42L,
                  tokenizer: Column => Column = TextAnalysis.tokens): DataFrame = {
    require(dim > 0, "dim must be > 0")
    val idf = fitIdf(df, col(textCol), dim, seed, tokenizer)
    df.withColumn(outCol, embedColumn(col(textCol), idf, seed, tokenizer))
  }
}
