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
    contaminationTail(posts.join(broadcast(benchHashes), Seq("_h")),
      trainId, "n_shared", "contamination", threshold)
  }

  /** SEMANTIC decontamination: flag training items whose EMBEDDING is
    * too close to any benchmark embedding — catches paraphrased or
    * reformatted benchmark leakage that n-gram overlap misses (public
    * practice: embedding-similarity decontamination in the Phi model
    * reports). Returns (train id, max_cos) for items with max cosine to
    * the benchmark >= threshold.
    *
    * Plan: the benchmark side is small by nature — broadcast it; the
    * cross join is then one pass over the training vectors with a
    * codegen'd dot per (train, bench) pair, norms precomputed per ROW
    * (never per pair), and a partial-aggregating max per train id. No
    * corpus shuffle until the tiny flagged aggregate. */
  def semanticContamination(train: DataFrame, bench: DataFrame,
                            trainId: String, benchId: String,
                            trainVec: String, benchVec: String,
                            threshold: Double): DataFrame = {
    import graft.operators.Similarity.{asDouble, dot, l2Norm}
    val t = train.select(col(trainId).as("_tid"), asDouble(col(trainVec)).as("_tv"))
      .withColumn("_tn", l2Norm(col("_tv")))
    val b = bench.select(asDouble(col(benchVec)).as("_bv"))
      .withColumn("_bn", l2Norm(col("_bv")))
    // clamp the PRODUCT of norms (not each factor): exactly the formula
    // the DuckDB twin uses, so degenerate near-zero-norm embeddings can
    // never produce engine-vs-oracle cosine drift
    val cos = dot(col("_tv"), col("_bv")) /
      greatest(col("_tn") * col("_bn"), lit(1e-12))
    t.crossJoin(broadcast(b))
      .groupBy(col("_tid"))
      .agg(round(max(cos), 6).as("max_cos"))
      .filter(col("max_cos") >= threshold)
      .select(col("_tid").as(trainId), col("max_cos"))
  }

  /** Shared tail of both decontamination variants: per-doc flagged-count
    * aggregate -> ratio (with the oracle-parity 1e-9 nudge and 4-digit
    * rounding) -> threshold filter. ONE definition so the exact and
    * Bloom paths can never drift apart (DecontaminateSpec asserts their
    * equality at tiny fpp). */
  private def contaminationTail(flagged: DataFrame, trainId: String,
                                countName: String, ratioName: String,
                                threshold: Double): DataFrame =
    flagged.groupBy(col(trainId), col("_sz"))
      .agg(count(lit(1)).as(countName))
      .select(col(trainId), col(countName),
        col("_sz").cast("long").as("n_shingles"),
        round(col(countName) / col("_sz") + lit(1e-9), 4).as(ratioName))
      .filter(col(ratioName) >= threshold)

  /** [[ngramContamination]] with the exact benchmark-hash set replaced by
    * a Bloom filter — the memory knob for very large benchmark suites.
    * An exact DISTINCT set of 1B 8-byte hashes broadcasts ~8 GB+ (with
    * hash-set overhead well beyond executor broadcast comfort); a Bloom
    * sketch at fpp=0.1% is ~1.7 GB and at 1% ~1.2 GB, independent of the
    * value width. The probe becomes a codegen'd per-row call
    * ([[graft.functions.BloomContainsLong]]) directly over the training
    * postings — NO join at all on the corpus side, one narrow pass.
    *
    * Semantics: `contamination_ub` is an UPPER bound — a false positive
    * only inflates a doc's shared count by ~fpp x n_shingles, so the flag
    * set is a superset of the exact operator's (safe direction for
    * hygiene: nothing contaminated slips through; borderline-clean docs
    * may over-flag). `false` probes are exact. The sketch is built
    * DISTRIBUTED (per-partition filters, driver merge via
    * `df.stat.bloomFilter`) from the benchmark's distinct shingle hashes;
    * only the merged bits ever reach the driver. */
  def bloomNgramContamination(train: DataFrame, bench: DataFrame,
                              trainId: String, benchId: String,
                              trainText: String, benchText: String,
                              threshold: Double, fpp: Double = 0.001): DataFrame = {
    // consumed twice (size + build): materialize the small distinct set
    // once; no CacheManager entry, durability per the session's
    // graft.core.Checkpoint policy (the engine-wide pattern)
    val benchHashes = graft.core.Checkpoint.materialize(
      Dedup.shinglePostings(bench, benchId, benchText)
        .select(col("_h")).distinct())
    // floor the sizing: Spark's BloomFilterImpl double-hashes (two 32-bit
    // base hashes, Kirsch-Mitzenmacher), and on tiny bit arrays the
    // observed fp rate floors at ~0.4-0.6% no matter the configured fpp
    // (measured: n=10 @ fpp=1e-9 -> 0.38% observed; n=100k -> ~1e-6).
    // Sizing for >=100k items costs <=540 KB and restores near-theoretical
    // behavior; at the operator's real scale (benchmark suites of 1e6+
    // n-grams) the floor is inert.
    val nBench = math.max(benchHashes.count(), 100_000L)
    val bloom = benchHashes.stat.bloomFilter("_h", nBench, fpp)
    val posts = Dedup.shinglePostings(train, trainId, trainText)
    contaminationTail(posts.filter(graft.functions.BloomContainsLong(col("_h"), bloom)),
      trainId, "n_flagged", "contamination_ub", threshold)
  }
}
