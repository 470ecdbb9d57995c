package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora: flag training
  * documents that CONTAIN n-grams from an evaluation/benchmark set —
  * the standard pretraining hygiene step (public practice since GPT-3's
  * 13-gram filtering; containment-style overlap per "Documenting large
  * webtext corpora", Dodge et al. 2021).
  *
  * Scale design: training-side word-trigram shingles become 8-byte
  * xxhash64 postings ([[Dedup]]'s posting machinery — codegen'd, no HOF
  * lambdas under generators); the benchmark side reduces to a DISTINCT
  * hash set, which for any realistic benchmark is tiny relative to the
  * corpus, so Spark broadcasts it and the "join" is a broadcast-hash
  * semi-probe over the training postings: one pass over the corpus, no
  * corpus shuffle before the per-doc count. Work is linear in corpus
  * shingles + benchmark size — the 100 TB shape.
  */
object Decontaminate {

  /** Per-training-doc benchmark containment:
    * `contamination = |shingles(doc) ∩ benchShingles| / |shingles(doc)|`
    * over distinct word-trigram shingles. Returns docs with containment
    * >= `threshold`: (trainId, n_shared, n_shingles, contamination).
    * Short docs (<3 tokens) shingle to their whole text, matching
    * [[Dedup.shingles3]] — an exact short-answer copy still flags. */
  def ngramContamination(train: DataFrame, bench: DataFrame,
                         trainId: String, benchId: String,
                         trainText: String, benchText: String,
                         threshold: Double): DataFrame = {
    val posts = Dedup.shinglePostings(train, trainId, trainText)
    val benchHashes = Dedup.shinglePostings(bench, benchId, benchText)
      .select(col("_h")).distinct()
    posts.join(broadcast(benchHashes), Seq("_h"))
      .groupBy(col(trainId), col("_sz"))
      .agg(count(lit(1)).as("n_shared"))
      .select(col(trainId), col("n_shared"),
        col("_sz").cast("long").as("n_shingles"),
        round(col("n_shared") / col("_sz") + lit(1e-9), 4).as("contamination"))
      .filter(col("contamination") >= threshold)
  }
}
