package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for training-data pipelines.
  *
  * Scale design: every method here reduces to hash-shuffle groupBy /
  * equi-join on a derived key (fingerprint, LSH bucket, blocking key) —
  * never an all-pairs comparison. At 100 TB the candidate space is what
  * kills you; exact dedup is one shuffle on a 128-bit fingerprint,
  * MinHash-LSH turns near-dup detection into `bands` equi-joins whose
  * fan-out is controlled by (bands x rowsPerBand) vs the similarity
  * threshold. All hashing is deterministic (xxhash64 with literal seeds),
  * so results are reproducible across runs and cluster layouts.
  */
object Dedup {

  /** Exact dedup: one representative (min id) per distinct text, with the
    * copy count. Single hash-shuffle on the md5 fingerprint — at scale the
    * 16-byte digest shuffles instead of the document body. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol).cast("binary")).as("fp"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  /** Keep-first dedup by arbitrary key columns: the row with the lowest
    * `orderCol` per key survives. Window shuffle on the key columns. */
  def keepFirst(df: DataFrame, keyCols: Seq[String], orderCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol))
    // collision-safe rank name: withColumn silently overwrites existing
    val rn = Iterator.from(0).map(i => s"_rn$i").find(n => !df.columns.contains(n)).get
    df.withColumn(rn, row_number().over(w)).filter(col(rn) === 1).drop(rn)
  }

  /** Distinct word-n-gram shingles of a token array (n fixed at 3; a doc
    * shorter than n shingles to its full text). */
  def shingles3(toks: Column): Column = {
    val sh = transform(
      sequence(lit(1), size(toks) - 2),
      i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2)))
    array_distinct(when(size(toks) < 3, array(concat_ws(" ", toks))).otherwise(sh))
  }

  /** Exact Jaccard over two (already distinct) string arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      greatest(size(array_union(a, b)), lit(1)).cast("double")

  /** Per-document DISTINCT trigram-shingle hash ARRAY (sorted), via the
    * native [[graft.functions.TrigramShingleHashes]] expression — a
    * narrow codegen'd map, NO shuffle. Docs with <3 tokens contribute one
    * whole-text shingle, mirroring [[shingles3]]; hash values are
    * byte-identical to `xxhash64(concat_ws(" ", ...))`.
    *
    * (Rounds 1-2 built postings with posexplode + window lead(1)/lead(2)
    * — HOF-free, but it shuffled and sorted every POSTING just to pair
    * each token with its successors, then paid a distinct exchange and a
    * window count. The per-row expression removes all three.) */
  private def shingleSets(df: DataFrame, idCol: String, textCol: String,
                          blockCols: Seq[String]): DataFrame =
    df.select(col(idCol) +: blockCols.map(col) :+
      graft.functions.TrigramShingleHashes(TextAnalysis.tokens(col(textCol))).as("_sh"): _*)

  /** Distinct shingle-hash postings per document: one row per
    * (id, blocks..., _h), plus _sz = the doc's distinct-shingle count.
    * The shingle string never leaves its task — downstream joins/aggs
    * shuffle 8-byte longs (collision odds for one corpus pair ~k^2/2^64).
    * Fully narrow: explode over the codegen'd shingle-set array (a
    * generator over a CODEGEN child — never over a CodegenFallback HOF,
    * which would re-evaluate per output row; measured ~20x). */
  private def shinglePosts(df: DataFrame, idCol: String, textCol: String,
                           blockCols: Seq[String]): DataFrame =
    shingleSets(df, idCol, textCol, blockCols)
      .select(col(idCol) +: blockCols.map(col) :+
        size(col("_sh")).as("_sz") :+ explode(col("_sh")).as("_h"): _*)

  /** Unblocked shingle postings for cross-operator reuse
    * ([[Decontaminate]]): one (id, _h, _sz) row per distinct trigram
    * shingle hash per document. */
  private[operators] def shinglePostings(df: DataFrame, idCol: String, textCol: String): DataFrame =
    shinglePosts(df, idCol, textCol, Nil)

  /** Exact n-gram Jaccard pairs (j >= threshold) within blocks, via an
    * inverted-index (posting-list) join instead of a block-nested-loop
    * join: explode each doc's distinct shingle hashes, equi-join postings
    * on (block, hash), and count matches per pair — |A∩B| — then
    * J = common / (|A| + |B| - common). No array intersection and no
    * higher-order-function lambdas in the hot path: the join + count is
    * whole-stage-codegen'd over longs, and work is proportional to
    * Σ df(shingle)^2 (true co-occurrence), not to #pairs-in-block.
    *
    * `maxDocFreq` (0 = off) is the 100 TB knob: postings whose document
    * frequency within their block exceeds it are dropped BEFORE the join
    * (stop-shingle removal), bounding the fan-out of ultra-common
    * shingles — one shingle shared by n docs otherwise produces n^2 join
    * rows. Capping keeps the TRUE shingle-set sizes in the denominator,
    * so measured J = (i - c) / (u + c) for a pair sharing c capped
    * shingles: it only UNDERESTIMATES — precision is unaffected (every
    * reported pair is a true >= -threshold pair); recall is lost only for
    * pairs whose overlap depends on stop-shingles, which at a df cap of
    * thousands are exactly the pairs a near-dup detector shouldn't match
    * on anyway. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        blockCols: Seq[String], threshold: Double,
                        maxDocFreq: Int = 0): DataFrame =
    intersectionPairs(df, idCol, textCol, blockCols, maxDocFreq)
      .withColumn("j", round(col("_common") / (col("_sza") + col("_szb") - col("_common")), 4))
      .filter(col("j") >= threshold)
      .select(col("id_a"), col("id_b"), col("j"))

  /** Shingle-CONTAINMENT pairs: `C = |A∩B| / min(|A|, |B|) >= threshold`
    * — the asymmetric near-dup signal symmetric Jaccard is blind to. A
    * quote, excerpt, or truncated mirror of a long document has
    * J = |A|/|B| (arbitrarily small as B grows) but containment ~ 1;
    * C4/RealNews-style curation drops exactly these. Same inverted-
    * index posting join and `maxDocFreq` stop-shingle knob as
    * [[ngramJaccardPairs]] (one shared candidate stage — the two
    * metrics can never see different pair sets), same cost shape:
    * Σ df(shingle)², never #pairs-in-block. */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
                       blockCols: Seq[String], threshold: Double,
                       maxDocFreq: Int = 0): DataFrame =
    intersectionPairs(df, idCol, textCol, blockCols, maxDocFreq)
      .withColumn("containment",
        round(col("_common") / least(col("_sza"), col("_szb")), 4))
      .filter(col("containment") >= threshold)
      .select(col("id_a"), col("id_b"), col("containment"))

  /** Shared candidate-intersection stage of the exact set-overlap
    * family: posting join on (block, shingle hash), pair-grouped match
    * counts — emits (id_a < id_b, _sza, _szb, _common). */
  private def intersectionPairs(df: DataFrame, idCol: String, textCol: String,
                                blockCols: Seq[String],
                                maxDocFreq: Int): DataFrame = {
    val allPosts = shinglePosts(df, idCol, textCol, blockCols)
    val posts = if (maxDocFreq <= 0) allPosts else {
      // df per (block, shingle-hash): window count over the same keys the
      // candidate join shuffles on — no extra shuffle shape at scale
      val dfw = Window.partitionBy(blockCols.map(col) :+ col("_h"): _*)
      allPosts.withColumn("_df", count(lit(1)).over(dfw))
        .filter(col("_df") <= maxDocFreq).drop("_df")
    }
    val a = posts.select(col(idCol).as("id_a") +: col("_sz").as("_sza") +: blockCols.map(col) :+ col("_h"): _*)
    val b = posts.select(col(idCol).as("id_b") +: col("_sz").as("_szb") +: blockCols.map(col) :+ col("_h"): _*)
    a.join(b, blockCols :+ "_h")
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"), col("_sza"), col("_szb"))
      .agg(count(lit(1)).as("_common"))
  }

  /** Edit-distance-verified near-dup pairs: candidate pairs share >=1
    * word-trigram shingle (the same inverted-index posting join as
    * [[ngramJaccardPairs]] — never all-pairs), then each candidate is
    * verified with EXACT Levenshtein distance on the trimmed text,
    * kept when `d <= floor(maxDistFrac * max(len_a, len_b))`.
    *
    * Complements the Jaccard/MinHash family with ORDER-SENSITIVE
    * verification: shingle-set Jaccard is blind to local reorderings
    * and repeated-shingle rearrangements, while edit distance prices
    * every insertion/deletion/substitution — the refinement stage a
    * precision-critical dedup pipeline runs on its candidate pairs
    * (and the character-level twin of [[duplicateSpans]]'s exact
    * substring matching).
    *
    * Recall: complete whenever a qualifying pair still shares one
    * unedited shingle — d character edits touch at most d words, i.e.
    * at most 3d of the word-trigram shingles, so any pair whose
    * smaller side carries more than 3*floor(maxDistFrac*maxLen)
    * distinct shingles cannot be missed. Precision is exact: every
    * emitted pair passed the real Levenshtein bound.
    *
    * Cost shape at scale: the posting join shuffles 8-byte hashes; the
    * candidate set (distinct pairs) is then length-prefiltered —
    * `abs(len_a - len_b) <= bound` is implied by the bound, and kills
    * the bulk of shingle-coincidence candidates BEFORE the Levenshtein
    * — so the quadratic work runs once per surviving pair only. The
    * verify itself is the BANDED O((2k+1)*len) algorithm (Spark's
    * 3-arg `levenshtein`, k = the per-pair bound), not full O(len^2)
    * DP, and the candidate set is explicitly repartitioned to the
    * session shuffle parallelism first: AQE sizes the post-distinct
    * stage by shuffle BYTES (pairs of longs — a few MB), but each row
    * here costs a quadratic-ish string verify, so byte-based coalesce
    * would funnel minutes of DP onto two tasks (measured 94 s -> 3 s
    * at sf0.1). Text moves only for candidate pairs, never
    * corpus-wide. */
  def editDistPairs(df: DataFrame, idCol: String, textCol: String,
                    blockCols: Seq[String], maxDistFrac: Double,
                    maxDocFreq: Int = 0): DataFrame = {
    require(maxDistFrac > 0 && maxDistFrac < 1,
      "maxDistFrac must be in (0, 1): a fraction of the longer text's length")
    val allPosts = shinglePosts(df, idCol, textCol, blockCols)
    val posts = if (maxDocFreq <= 0) allPosts else {
      val dfw = Window.partitionBy(blockCols.map(col) :+ col("_h"): _*)
      allPosts.withColumn("_df", count(lit(1)).over(dfw))
        .filter(col("_df") <= maxDocFreq).drop("_df")
    }
    val a = posts.select(col(idCol).as("id_a") +: blockCols.map(col) :+ col("_h"): _*)
    val b = posts.select(col(idCol).as("id_b") +: blockCols.map(col) :+ col("_h"): _*)
    val cand = a.join(b, blockCols :+ "_h")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
    editDistVerify(cand, df, idCol, textCol, maxDistFrac)
  }

  /** Exact banded-Levenshtein verification of a candidate pair frame
    * (id_a, id_b) — the shared refinement stage of [[editDistPairs]]
    * and [[editDistPairsLsh]]. Dedupes the candidates, restores full
    * verify parallelism, length-prefilters, then prices each survivor
    * with the BANDED O((2k+1)*len) algorithm.
    *
    * The explicit-N ROUND-ROBIN repartition: AQE never coalesces a
    * user-numbered shuffle, and round-robin (unlike re-hashing the
    * distinct's own keys, which is statically elided as redundant)
    * guarantees a real exchange — AQE sizes the post-distinct stage by
    * shuffle BYTES (pairs of longs, a few MB), but each row here costs
    * a quadratic-ish string verify, so byte-based coalesce would funnel
    * minutes of DP onto two tasks (measured 94 s -> 3 s at sf0.1).
    *
    * The text re-attach joins carry FULL DOCUMENT TEXT and must never
    * become broadcasts: AQE's conversion compares the COMPRESSED
    * runtime shuffle size against the threshold, but the in-memory
    * hash relation it then builds is uncompressed — the 100x soak
    * measured a 64 MB-compressed text side exploding into a 3.1 GiB
    * broadcast that spilled to disk (BENCH_NOTES #37); at cluster
    * scale that is an executor OOM. SMJ hints pin the scale-safe
    * shape: shuffle on the id, sort, stream — text bytes never
    * concentrate anywhere. */
  private def editDistVerify(cand: DataFrame, df: DataFrame, idCol: String,
                             textCol: String, maxDistFrac: Double): DataFrame =
    editDistVerifyCross(cand, df, df, idCol, textCol, "id_a", "id_b", maxDistFrac)

  /** Two-frame form of the verify stage: candidate columns `aOut`/`bOut`
    * resolve against `aDf`/`bDf` respectively (the incremental
    * batch-vs-corpus shape; the self-dedup form passes one frame for
    * both). Same distinct/repartition/length-prefilter/banded-DP
    * pipeline, same merge-hinted text re-attach. */
  private def editDistVerifyCross(cand: DataFrame, aDf: DataFrame, bDf: DataFrame,
                                  idCol: String, textCol: String,
                                  aOut: String, bOut: String,
                                  maxDistFrac: Double): DataFrame = {
    val parts = aDf.sparkSession.sessionState.conf.numShufflePartitions
    def txt(df: DataFrame) = df.select(col(idCol), trim(col(textCol)).as("_t"))
    val bound = floor(lit(maxDistFrac) * greatest(length(col("_ta")), length(col("_tb"))))
    cand
      .distinct()
      .repartition(parts)
      .join(txt(aDf).select(col(idCol).as(aOut), col("_t").as("_ta")).hint("merge"), aOut)
      .join(txt(bDf).select(col(idCol).as(bOut), col("_t").as("_tb")).hint("merge"), bOut)
      .filter(abs(length(col("_ta")) - length(col("_tb"))) <= bound)
      // banded Levenshtein: exact d when d <= bound, -1 sentinel when the
      // band is exceeded — O((2*bound+1)*len) instead of full len^2 DP
      .withColumn("d", call_function("levenshtein",
        col("_ta"), col("_tb"), bound.cast("int")))
      .filter(col("d") >= 0)
      .select(col(aOut), col(bOut), col("d"))
  }

  /** Edit-distance near-dup pairs at MINHASH candidate cost — the
    * at-scale fuzzy-dedup compose. [[editDistPairs]]' candidate stage
    * shuffles every (block, shingle, id) posting (~hundreds of rows per
    * document; the 100x soak measured 344 s on 500k docs), which is the
    * right EXACT-recall shape but priced per shingle. This variant
    * proposes candidates with [[minHashNearDupPairs]]' banded-LSH
    * machinery instead — `bands` 8-byte band keys per document, nothing
    * else shuffles (8.3 s on the same 500k-doc fixture) — then verifies
    * each candidate with the same exact banded Levenshtein.
    *
    * The trade is recall, priced by the S-curve
    * ([[lshDetectionProbability]] at the pair's Jaccard; size with
    * [[lshParamsFor]]): a qualifying pair surfaces iff some band of
    * its MinHash signatures agrees. Pairs within a small relative edit
    * bound are near-identical texts with Jaccard near 1, where 12x4
    * detection is ~certain — the regime this operator targets.
    * Precision stays EXACT (every emitted pair passed the real bound);
    * the signature is deterministic (salted xxhash64), so the output
    * is run-reproducible, not sampled. */
  def editDistPairsLsh(df: DataFrame, idCol: String, textCol: String,
                       maxDistFrac: Double,
                       bands: Int = 12, rowsPerBand: Int = 4): DataFrame = {
    require(maxDistFrac > 0 && maxDistFrac < 1,
      "maxDistFrac must be in (0, 1): a fraction of the longer text's length")
    // persist/release discipline follows minHashNearDupPairs, but only
    // the band table caches: it feeds BOTH sides of the candidate
    // self-join, while the shingle frame feeds it exactly once (the
    // verify below prices raw text, not shingle sets — no reuse). The
    // eager checkpoint lets the cache release before returning.
    val sh = shingleSets(df, idCol, textCol, Nil).filter(col("_sh").isNotNull)
    val banded = bandTable(sh, idCol, bands, rowsPerBand).persist()
    val cand = banded.withColumnRenamed(idCol, "id_a")
      .join(banded.withColumnRenamed(idCol, "id_b"), Seq("_band", "_h"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
    try graft.core.Checkpoint.materialize(
      editDistVerify(cand, df, idCol, textCol, maxDistFrac))
    finally banded.unpersist()
  }

  /** (id, _band, _h) LSH band-bucket keys from a shingle-set frame
    * (id, _sh): the k = bands*rowsPerBand MinHash signature is one
    * narrow native expression ([[graft.functions.MinHashSignature]]);
    * each band's rows hash to a single 8-byte bucket key. This IS the
    * near-dup index shape — in a standing pipeline, compute it once per
    * corpus and store it; [[minHashNearDupAgainst]] joins new batches
    * against it without re-touching corpus text. */
  private def bandTable(sh: DataFrame, idCol: String,
                        bands: Int, rowsPerBand: Int): DataFrame = {
    val sig = sh.withColumn("_sig",
      graft.functions.MinHashSignature(col("_sh"), bands * rowsPerBand))
    sig.select(col(idCol), explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          xxhash64((0 until rowsPerBand).map(j => element_at(col("_sig"), b * rowsPerBand + j + 1)) :+ lit(b): _*).as("h"))
      }: _*)).as("_bh"))
      .select(col(idCol), col("_bh.band").as("_band"), col("_bh.h").as("_h"))
  }

  /** P(LSH proposes a pair | true Jaccard = j) for a (bands x rowsPerBand)
    * banding: a band matches iff all its rows agree (prob j^r under the
    * MinHash permutation model); the pair surfaces iff ANY band matches —
    * the standard S-curve 1 - (1 - j^r)^b (Leskovec/Rajaraman/Ullman,
    * Mining of Massive Datasets ch. 3). */
  def lshDetectionProbability(j: Double, bands: Int, rowsPerBand: Int): Double =
    1.0 - math.pow(1.0 - math.pow(j, rowsPerBand), bands)

  /** Derive (bands, rowsPerBand) from the S-curve for a target Jaccard
    * threshold and error budgets, instead of hard-coding 12x4: find the
    * cheapest signature (minimal bands*rowsPerBand = hashes per doc, the
    * narrow-stage cost; ties to fewer BANDS = fewer band-join rows, the
    * shuffle cost) such that
    *   - a true pair at `threshold + margin` is detected with
    *     probability >= 1 - fnBudget, and
    *   - a non-pair at `threshold - margin` surfaces as a candidate with
    *     probability <= fpBudget (candidate = wasted verify work, not a
    *     wrong answer — the exact-Jaccard verify step removes it).
    * The +-margin formulation is honest about what LSH can do: AT the
    * threshold detection is ~54% for any sane parameters; budgets only
    * bind outside the transition band. */
  def lshParamsFor(threshold: Double, fpBudget: Double = 0.05, fnBudget: Double = 0.05,
                   margin: Double = 0.1, maxHashes: Int = 1024): (Int, Int) = {
    require(threshold - margin > 0 && threshold + margin <= 1.0,
      s"threshold +- margin must stay inside (0, 1]: $threshold +- $margin")
    // MinHash: per-hash collision probability IS the Jaccard similarity.
    // maxRowsPerBand = 32 preserves MinHash's long-standing r <= 32
    // sizing bound (configs that can't separate the margins within 32
    // rows/band fail loud here, as they always did). Each family passes
    // its own consumer's cap explicitly — sign-LSH passes 48, its
    // band+tag-in-one-long packing limit.
    lshParamsForProb(threshold + margin, threshold - margin,
      fpBudget, fnBudget, maxHashes, maxRowsPerBand = 32)
  }

  /** The S-curve solver in per-hash collision-PROBABILITY space — the
    * family-independent core of [[lshParamsFor]]. Every banded LSH
    * scheme shares the same algebra (detect = 1 − (1 − p^r)^b); families
    * differ only in how similarity maps to the per-hash collision
    * probability p: MinHash passes Jaccard directly (p = J), sign-LSH
    * maps cosine through the Goemans–Williamson angle
    * ([[Similarity.signCollisionProb]], p = 1 − θ/π). Both families size
    * through here so their budget contract can never drift apart. */
  private[operators] def lshParamsForProb(pHi: Double, pLo: Double,
                                          fpBudget: Double, fnBudget: Double,
                                          maxHashes: Int,
                                          maxRowsPerBand: Int): (Int, Int) = {
    require(pHi > pLo && pHi <= 1.0 && pLo > 0,
      s"need 0 < pLo < pHi <= 1, got pLo=$pLo pHi=$pHi")
    require(fpBudget > 0 && fpBudget < 1 && fnBudget > 0 && fnBudget < 1,
      "budgets are probabilities in (0, 1)")
    require(maxRowsPerBand >= 1, "maxRowsPerBand must be >= 1")
    var best: Option[(Int, Int)] = None // (bands, rowsPerBand)
    def cost(p: (Int, Int)): (Int, Int) = (p._1 * p._2, p._1) // (hashes, bands)
    var r = 1
    // the caller's packing limit caps the search (sign-LSH packs a
    // band's bits into one long with a band tag — 48 max — so the
    // solver must never derive parameters its consumer rejects)
    while (r <= maxRowsPerBand) {
      // smallest b meeting the FN budget: (1 - pHi^r)^b <= fn
      val miss = 1.0 - math.pow(pHi, r)
      val b =
        if (miss <= 0.0) 1
        else math.ceil(math.log(fnBudget) / math.log(miss)).toInt.max(1)
      if (b.toLong * r <= maxHashes &&
          lshDetectionProbability(pLo, b, r) <= fpBudget &&
          lshDetectionProbability(pHi, b, r) >= 1.0 - fnBudget &&
          best.forall(p => Ordering[(Int, Int)].lt(cost((b, r)), cost(p))))
        best = Some((b, r))
      r += 1
    }
    best.getOrElse(throw new IllegalArgumentException(
      s"no (bands, rows) within $maxHashes hashes separates per-hash " +
        s"collision prob $pLo (fp<=$fpBudget) from $pHi (fn<=$fnBudget) — " +
        "widen the margin, relax a budget, or raise maxHashes"))
  }

  /** MinHash+LSH near-dup pairs, verified: LSH proposes candidates via
    * band-bucket equi-join; exact shingle-Jaccard (over 64-bit shingle
    * hashes) filters false positives. k = bands*rowsPerBand hash
    * functions, simulated by salted xxhash64 re-hashes of each shingle
    * hash; the signature is computed as k codegen'd `min` aggregates over
    * exploded postings — one hash-shuffle on the id, no per-row lambda
    * evaluation. The candidate equi-join shuffles (band, bandHash) longs
    * only — this is the 100 TB-safe formulation (no O(n^2)).
    *
    * The 12x4 default is a high-similarity operating point: detection
    * 0.96 at J=0.7, ~1 at J>=0.9, but only 0.81 at J=0.6 — fine when
    * true duplicates are near-exact (crawl dedup), lossy for a corpus
    * with genuine borderline pairs. For explicit error budgets derive
    * (bands, rowsPerBand) with [[lshParamsFor]] — and expect tight
    * budgets near the threshold to be expensive: the S-curve is shallow,
    * e.g. separating J=0.4 from J=0.6 at 5%/5% costs ~5000 hashes/doc. */
  def minHashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
                          threshold: Double, bands: Int = 12, rowsPerBand: Int = 4): DataFrame = {
    val k = bands * rowsPerBand
    // Shingle sets come straight from the narrow native expression — no
    // posting explode, no groupBy shuffle of the whole corpus; the
    // k-permutation signature is a second native expression over it (see
    // graft.functions.MinHashSignature) — no wide aggregate either.
    // persisted: consumed by the signature stage AND both verification
    // joins — without it the shingle computation runs three times.
    // Released explicitly below: Dataset caches live in the CacheManager
    // until unpersist (they are NOT ContextCleaner-managed).
    // isNotNull: null-text docs have a NULL shingle set -> NULL signature
    // -> every element_at is NULL -> xxhash64 (which skips null children)
    // would give ALL of them IDENTICAL band keys, and the banding
    // self-join would fan out n_null^2 candidate pairs before the
    // verifier drops them. Excluding them up front matches the posting
    // path, where explode(NULL) drops the row.
    val sh = shingleSets(df, idCol, textCol, Nil).filter(col("_sh").isNotNull).persist()
    // persisted: the banding self-join consumes `banded` on BOTH sides —
    // unpersisted, each side re-evaluates the k-permutation signature
    // (k x n hashes per doc, the most expensive narrow stage here).
    // Released explicitly below, like `sh`.
    val banded = bandTable(sh, idCol, bands, rowsPerBand).persist()
    val cand = banded.withColumnRenamed(idCol, "id_a")
      .join(banded.withColumnRenamed(idCol, "id_b"), Seq("_band", "_h"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct() // a pair may collide in several bands
    val verified = cand
      .join(sh.select(col(idCol).as("id_a"), col("_sh").as("_sha")), Seq("id_a"))
      .join(sh.select(col(idCol).as("id_b"), col("_sh").as("_shb")), Seq("id_b"))
      .withColumn("j", round(jaccard(col("_sha"), col("_shb")), 4))
      .filter(col("j") >= threshold)
      .select(col("id_a"), col("id_b"), col("j"))
    // Materialize the (small, derived) pair set ONCE, then release both
    // caches deterministically: the eager localCheckpoint truncates
    // lineage to its stored blocks, so the returned DataFrame never
    // recomputes the shingle/band stages, and checkpoint RDD blocks —
    // unlike Dataset caches — ARE freed by the ContextCleaner once the
    // result is unreferenced. A long-lived service looping dedup calls
    // therefore holds no CacheManager entries after each call returns
    // (the round-4/5/6 leak: persist-without-unpersist accumulated
    // MEMORY_AND_DISK blocks without bound). Durability is the session's
    // graft.core.Checkpoint policy: local (default — fine for an edge
    // list consumed promptly) vs reliable (preemptible clusters).
    try graft.core.Checkpoint.materialize(verified)
    finally {
      // also on a failed checkpoint job: an abandoned call must not pin
      // the caches (Ivf.train guards its training cache the same way)
      sh.unpersist()
      banded.unpersist()
    }
  }

  /** INCREMENTAL near-dup detection: which `batch` documents are
    * near-duplicates (shingle Jaccard >= threshold) of some `corpus`
    * document — "dedup today's crawl against the index", the standing
    * form of corpus curation. Returns (batch_id, corpus_id, j); one row
    * per matched cross pair. Batch-internal and corpus-internal
    * duplicates are out of scope by design (run [[minHashNearDupPairs]]
    * within a set for those).
    *
    * Same LSH machinery as [[minHashNearDupPairs]], but the candidate
    * join is batch-bands x corpus-bands instead of a self-join, so the
    * work is proportional to the BATCH (plus one narrow corpus pass for
    * its band keys) — never corpus x corpus. At 100 TB the corpus band
    * table is the precomputed index you'd persist between runs
    * ([[bandTable]] note); recomputing it here keeps the operator
    * self-contained while the join shape stays identical. */
  def minHashNearDupAgainst(corpus: DataFrame, batch: DataFrame,
                            idCol: String, textCol: String, threshold: Double,
                            bands: Int = 12, rowsPerBand: Int = 4): DataFrame = {
    // both shingle frames feed a band table AND a verification join
    val shC = shingleSets(corpus, idCol, textCol, Nil).filter(col("_sh").isNotNull).persist()
    val shB = shingleSets(batch, idCol, textCol, Nil).filter(col("_sh").isNotNull).persist()
    val cand = bandTable(shB, idCol, bands, rowsPerBand).withColumnRenamed(idCol, "batch_id")
      .join(bandTable(shC, idCol, bands, rowsPerBand).withColumnRenamed(idCol, "corpus_id"),
        Seq("_band", "_h"))
      .select(col("batch_id"), col("corpus_id"))
      .distinct() // a pair may collide in several bands
    val verified = cand
      .join(shB.select(col(idCol).as("batch_id"), col("_sh").as("_shb")), Seq("batch_id"))
      .join(shC.select(col(idCol).as("corpus_id"), col("_sh").as("_shc")), Seq("corpus_id"))
      .withColumn("j", round(jaccard(col("_shb"), col("_shc")), 4))
      .filter(col("j") >= threshold)
      .select(col("batch_id"), col("corpus_id"), col("j"))
    try graft.core.Checkpoint.materialize(verified)
    finally {
      shC.unpersist()
      shB.unpersist()
    }
  }

  /** INCREMENTAL edit-distance near-dup detection — [[editDistPairsLsh]]'
    * batch-vs-corpus form ("which of today's crawl are byte-level
    * near-copies of the index"): batch band keys join corpus band keys
    * (work ∝ batch, one narrow corpus pass — at 100 TB the corpus band
    * table is the persisted index, [[bandTable]] note), then the exact
    * banded-Levenshtein verify prices each cross candidate. Returns
    * (batch_id, corpus_id, d). Same recall framing as
    * [[editDistPairsLsh]]: pairs inside a small relative edit bound sit
    * at Jaccard ~1 where the banding detects ~certainly, and the
    * salted-xxhash64 signature is deterministic. */
  def editDistAgainstLsh(corpus: DataFrame, batch: DataFrame,
                         idCol: String, textCol: String, maxDistFrac: Double,
                         bands: Int = 12, rowsPerBand: Int = 4): DataFrame = {
    require(maxDistFrac > 0 && maxDistFrac < 1,
      "maxDistFrac must be in (0, 1): a fraction of the longer text's length")
    // no persist here, unlike the Jaccard-verified sibling: the shingle
    // frames each feed exactly ONE band table (the verify below prices
    // raw text, not shingle sets), so there is nothing to reuse
    val shC = shingleSets(corpus, idCol, textCol, Nil).filter(col("_sh").isNotNull)
    val shB = shingleSets(batch, idCol, textCol, Nil).filter(col("_sh").isNotNull)
    val cand = bandTable(shB, idCol, bands, rowsPerBand).withColumnRenamed(idCol, "batch_id")
      .join(bandTable(shC, idCol, bands, rowsPerBand).withColumnRenamed(idCol, "corpus_id"),
        Seq("_band", "_h"))
      .select(col("batch_id"), col("corpus_id"))
    editDistVerifyCross(cand, batch, corpus, idCol, textCol,
      "batch_id", "corpus_id", maxDistFrac)
  }

  /** Apply path of [[editDistPairsLsh]] — the SemDeDup-style
    * keep-one-representative step over the byte-level near-copy graph
    * (same shape as [[dropNearDuplicates]] for the Jaccard family):
    * cluster the edit-distance pair graph, keep each component's
    * min-id representative. */
  def dropNearDupByEditDist(df: DataFrame, idCol: String, textCol: String,
                            maxDistFrac: Double, bands: Int = 12,
                            rowsPerBand: Int = 4, maxIter: Int = 30): DataFrame = {
    val pairs = editDistPairsLsh(df, idCol, textCol, maxDistFrac, bands, rowsPerBand)
    val comps = connectedComponents(df.select(col(idCol)), idCol, pairs, maxIter)
    df.join(comps.filter(col("id") === col("rep")).select(col("id").as(idCol)), Seq(idCol))
  }

  /** Apply path of [[minHashNearDupAgainst]]: `batch` minus every row
    * near-duplicating the corpus (left-anti on the matched batch ids). */
  def dropNearDupAgainst(corpus: DataFrame, batch: DataFrame,
                         idCol: String, textCol: String, threshold: Double): DataFrame = {
    val hits = minHashNearDupAgainst(corpus, batch, idCol, textCol, threshold)
      .select(col("batch_id").as(idCol)).distinct()
    batch.join(hits, Seq(idCol), "left_anti")
  }

  /** Connected components over an undirected pair list (id_a, id_b):
    * returns (id, rep) where rep = min id reachable.
    *
    * Two paths, chosen by edge count:
    *   - **Driver union-find** when edges fit driver memory
    *     (`maxDriverEdges`, default 10M ≈ 160 MB). Near-dup EDGE lists
    *     are a small derived set even for huge corpora, and driver
    *     union-find avoids the real cost of iterative DataFrame CC:
    *     every propagation round builds new plans and recompiles
    *     codegen, ~1-2 s/round of fixed overhead regardless of data
    *     size. The label map returns as a broadcast join.
    *   - **Distributed min-label propagation** (one shuffle join per
    *     round, rounds = graph diameter) beyond that; for web-scale
    *     general graphs swap in large-star/small-star, same contract. */
  def connectedComponents(nodes: DataFrame, idCol: String, pairs: DataFrame,
                          maxIter: Int = 30, maxDriverEdges: Long = 10_000_000L): DataFrame = {
    // ids flow through driver union-find as longs — cast up front so any
    // integral id type works (a string id would be a caller bug; fail here)
    val persistedPairs = pairs
      .select(col("id_a").cast("long").as("id_a"), col("id_b").cast("long").as("id_b"))
      .persist()
    val nEdges = persistedPairs.count()
    if (nEdges <= maxDriverEdges) {
      val edges = persistedPairs.collect().map(r => (r.getLong(0), r.getLong(1)))
      persistedPairs.unpersist()
      // union-find with path compression; roots normalized to component min
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      edges.foreach { case (a, b) =>
        val ra = find(a); val rb = find(b)
        if (ra != rb) { val lo = math.min(ra, rb); val hi = math.max(ra, rb); parent(hi) = lo }
      }
      val labels = (edges.flatMap { case (a, b) => Seq(a, b) }.distinct
        .map(id => (id, find(id)))).toSeq
      val spark = nodes.sparkSession
      import spark.implicits._
      // broadcast the label map only while it is honestly broadcast-able:
      // labels can reach 2x maxDriverEdges, and a caller raising that
      // knob hit Spark's broadcast-build memory wall at ~30M labels
      // (measured, Scratch cccross) — past the cap, fall back to a
      // shuffle join instead of a hard crash
      val labelsRaw = labels.toDF("id", "_rep")
      val labelDf = if (labels.size <= 4_000_000) broadcast(labelsRaw) else labelsRaw
      nodes.select(col(idCol).as("id"))
        .join(labelDf, Seq("id"), "left")
        .select(col("id"), coalesce(col("_rep"), col("id")).as("rep"))
    } else {
      val out = propagateComponents(nodes, idCol, persistedPairs, maxIter)
      persistedPairs.unpersist()
      out
    }
  }

  /** Distributed path of [[connectedComponents]]: alternating
    * large-star / small-star (Kiveris et al., "Connected Components in
    * MapReduce and Beyond", SoCC'14 — public algorithm). Each round is
    * two groupBy+join shuffles; the edge set converges to rooted stars
    * (every node pointing at its component's min id) in O(log^2 n)
    * rounds REGARDLESS of graph diameter — where plain min-label
    * propagation needs diameter rounds and never converges on a long
    * path graph within any fixed budget. Each round is materialized
    * (persist + count doubles as the convergence check), so lineage
    * stays shallow. */
  private def propagateComponents(nodes: DataFrame, idCol: String, pairs: DataFrame,
                                  maxIter: Int): DataFrame = {
    // star ops treat the graph as undirected: symmetrize per round
    def sym(e: DataFrame): DataFrame =
      e.union(e.select(col("dst").as("src"), col("src").as("dst")))
    // one star round over symmetric neighbor pairs:
    //   m(u) = min(N(u) ∪ {u});  large: {(v, m) : v > u};  small: {(v, m) : v <= u}
    //   plus (u, m) itself — keeps u attached to its current min
    def star(e: DataFrame, large: Boolean): DataFrame = {
      val nbrs = sym(e)
      val withM = nbrs.join(
        nbrs.groupBy("src").agg(least(min(col("dst")), col("src")).as("m")), Seq("src"))
      val moved =
        if (large) withM.filter(col("dst") > col("src"))
        else withM.filter(col("dst") <= col("src"))
      moved.select(col("dst").as("src"), col("m").as("dst"))
        .union(withM.select(col("src"), col("m").as("dst")))
        .filter(col("src") =!= col("dst"))
        .distinct()
    }
    // (count, xxhash64-sum) fingerprint: equal across a round => edge set
    // stable => rooted stars reached (order-independent convergence check
    // in one aggregate job over the persisted round result)
    def fingerprint(e: DataFrame): (Long, BigDecimal) = {
      // decimal(38,0) sum: a long sum of 2^63-scale hashes overflows ANSI
      val r = e.agg(count(lit(1)),
        sum(xxhash64(col("src"), col("dst")).cast("decimal(38,0)"))).collect()(0)
      (r.getLong(0), if (r.isNullAt(1)) BigDecimal(0) else BigDecimal(r.getDecimal(1)))
    }
    // Every round ends in an EAGER checkpoint: without lineage
    // truncation the logical plan multiplies ~8x per round (star∘star
    // reads its input four times) and plan analysis alone goes
    // exponential — measured OOM at round ~6 on a 300-edge graph.
    // Superseded rounds' local-checkpoint RDDs are dropped by the
    // ContextCleaner once the `edges` var moves on. Durability follows
    // the session's graft.core.Checkpoint policy (local default).
    var edges = graft.core.Checkpoint.materialize(
      pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
        .filter(col("src") =!= col("dst")).distinct())
    var fp = fingerprint(edges)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // persist the half-round: the small-star consumes its input twice
      // (neighbor pairs + per-node min join) — unpersisted, the
      // large-star subtree would run 4x per round
      val mid = star(edges, large = true).persist()
      val next = graft.core.Checkpoint.materialize(star(mid, large = false))
      mid.unpersist()
      edges = next
      val nfp = fingerprint(next)
      converged = nfp == fp
      fp = nfp
      i += 1
    }
    if (!converged)
      System.err.println(s"[graft] connectedComponents: star rounds not provably stable after " +
        s"$maxIter iterations — labels may be incomplete; raise maxIter (O(log^2 n) suffices)")
    // converged edge set is a star forest: src -> component min
    val labels = edges.groupBy(col("src").as("id")).agg(min(col("dst")).as("_rep"))
    nodes.select(col(idCol).as("id"))
      .join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("_rep"), col("id")).as("rep"))
  }

  /** End-to-end near-dup removal: MinHash-LSH pairs -> connected
    * components -> keep each cluster's min-id representative. Returns the
    * surviving rows of `df` (original columns). */
  def dropNearDuplicates(df: DataFrame, idCol: String, textCol: String,
                         threshold: Double = 0.5, maxIter: Int = 30): DataFrame = {
    val pairs = minHashNearDupPairs(df, idCol, textCol, threshold)
    val comps = connectedComponents(df.select(col(idCol)), idCol, pairs, maxIter)
    df.join(comps.filter(col("id") === col("rep")).select(col("id").as(idCol)), Seq(idCol))
  }

  /** Quality-aware canonical selection: given near-dup PAIRS from any
    * detector family (`id_a`/`id_b`, the [[minHashNearDupPairs]] shape)
    * and a per-row quality score, keep each duplicate component's
    * HIGHEST-scoring member (ties -> lowest id) plus every singleton —
    * the curation refinement over [[dropNearDuplicates]]'s min-id rule:
    * a crawl's near-dup cluster typically mixes one clean original with
    * truncated, boilerplate-wrapped, or mojibake copies, and the kept
    * text should be the BEST one, not the one whose id happens to be
    * smallest (CCNet keeps by quality bucket, Wenzek 2020 §4.3 —
    * public practice). Returns the surviving rows of `df` with their
    * original columns.
    *
    * Scale: components via [[connectedComponents]] (driver union-find
    * under `maxDriverEdges`, star-contraction beyond); the argmax is
    * ONE row_number window keyed on the component representative — a
    * near-unique key (components are tiny), so no hot partition. */
  def dropNearDupsKeepBest(df: DataFrame, idCol: String, pairs: DataFrame,
                           score: Column, maxIter: Int = 30): DataFrame = {
    val comps = connectedComponents(df.select(col(idCol)), idCol, pairs, maxIter)
      .select(col("id").as(idCol), col("rep").as("_kb_rep"))
    val w = Window.partitionBy(col("_kb_rep"))
      .orderBy(col("_kb_score").desc_nulls_last, col(idCol).asc_nulls_last)
    val keep = df.select(col(idCol), score.as("_kb_score"))
      .join(comps, Seq(idCol))
      .withColumn("_kb_rk", row_number().over(w))
      .filter(col("_kb_rk") === 1)
      .select(col(idCol))
    df.join(keep, Seq(idCol))
  }

  /** Positional k-span postings (id, _pos 1-based, _h) filtered to
    * hashes occurring in >= minDocFreq DISTINCT documents.
    * The posting set feeds both the doc-frequency aggregate and the join
    * probe — deliberately RECOMPUTED per consumer, not persisted: it is
    * ~n_tokens rows (corpus-sized; caching it at 100 TB costs more than
    * the narrow re-scan), while the duplicated-hash set it reduces to is
    * small and broadcasts back for the second pass. */
  private def duplicatedSpanPostings(df: DataFrame, idCol: String, textCol: String,
                                     k: Int, minDocFreq: Int): DataFrame = {
    require(minDocFreq >= 2, "minDocFreq < 2 would mark every span duplicated")
    def spans = df
      .select(col(idCol),
        posexplode(graft.functions.SpanHashes(TextAnalysis.tokens(col(textCol)), k)))
      .select(col(idCol), (col("pos") + 1).as("_pos"), col("col").as("_h"))
    val dup = spans.groupBy(col("_h"))
      .agg(countDistinct(col(idCol)).as("_df"))
      .filter(col("_df") >= minDocFreq)
      .select(col("_h"))
    spans.join(dup, Seq("_h"))
  }

  /** Merge hit positions (id, _pos) into maximal 1-based-inclusive
    * (id, token_start, token_end) ranges: two spans at p_prev < p overlap
    * or touch iff p <= p_prev + k; a larger gap starts a new range. */
  private def mergeSpanRanges(hits: DataFrame, idCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("_pos"))
    hits
      .withColumn("_new",
        when(col("_pos") - lag(col("_pos"), 1).over(w) <= k, lit(0)).otherwise(lit(1)))
      .withColumn("_grp", sum(col("_new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("_grp"))
      .agg(min(col("_pos")).cast("long").as("token_start"),
        (max(col("_pos")) + k - 1).cast("long").as("token_end"))
      .select(col(idCol), col("token_start"), col("token_end"))
  }

  /** Duplicate-substring spans (Lee et al. 2022, "Deduplicating Training
    * Data Makes Language Models Better" — public recipe): every maximal
    * token range covered by k-token spans occurring in at least
    * `minDocFreq` DISTINCT documents, as (id, token_start, token_end),
    * 1-based inclusive. A caller removes the ranges (or drops the docs)
    * downstream; returning ranges rather than rewritten text keeps the
    * operator composable and oracle-checkable.
    *
    * Plan shape (the 100 TB-safe formulation — no all-pairs anywhere):
    *   1. narrow map: positional span hashes per doc
    *      ([[graft.functions.SpanHashes]], codegen'd, O(tokens*k));
    *      posexplode to (id, pos, hash) — a generator over a CODEGEN
    *      child (the ~20x CodegenFallback trap does not apply)
    *   2. doc frequency per hash: one hash-shuffle groupBy on the 8-byte
    *      span hash (the span STRING never leaves its task)
    *   3. map duplicated hashes back: equi-join postings with the
    *      duplicated-hash set on the same 8-byte key
    *   4. merge overlapping/adjacent hit positions per doc into maximal
    *      ranges: window over (id, pos) — interval-merge via the
    *      gap>k group-boundary flag + running sum
    * Duplicated-hash fan-out is bounded by true duplication (work is
    * proportional to the number of duplicated span occurrences), and
    * every shuffle key is a long or the doc id. */
  def duplicateSpans(df: DataFrame, idCol: String, textCol: String,
                     k: Int = 8, minDocFreq: Int = 2): DataFrame =
    mergeSpanRanges(
      duplicatedSpanPostings(df, idCol, textCol, k, minDocFreq).select(col(idCol), col("_pos")),
      idCol, k)

  /** Remove token ranges from documents: `ranges` is (id, token_start,
    * token_end) 1-based inclusive (the [[duplicateSpans]] shape). Docs
    * absent from `ranges` keep their text VERBATIM; stripped docs are
    * rebuilt by re-joining surviving tokens with single spaces (span
    * dedup is token-level — original whitespace inside stripped docs is
    * normalized, documented behavior). The rebuild is two nested HOF
    * lambdas — CodegenFallback, but per-row-once in a non-generator
    * projection (the documented safe position), and range lists per doc
    * are short. */
  def stripSpans(df: DataFrame, idCol: String, textCol: String, ranges: DataFrame,
                 outCol: String = "text_dedup"): DataFrame = {
    val rs = ranges.groupBy(col(idCol))
      .agg(collect_list(struct(col("token_start").as("s"), col("token_end").as("e"))).as("_rs"))
    val toks = TextAnalysis.tokens(col(textCol))
    val kept = filter(toks, (_, i) =>
      !exists(col("_rs"), r => (i + 1) >= r.getField("s") && (i + 1) <= r.getField("e")))
    df.join(rs, Seq(idCol), "left")
      .withColumn(outCol,
        when(col("_rs").isNull, col(textCol)).otherwise(concat_ws(" ", kept)))
      .drop("_rs")
  }

  /** End-to-end substring-span dedup (Lee et al. 2022 apply path): the
    * FIRST occurrence of each duplicated k-span — lowest (id, position)
    * — is kept; every other occurrence is stripped from its document.
    * Returns `df` plus `outCol` with the deduplicated text.
    *
    * Keep-first is a real guarantee: a strip candidate whose token cover
    * [p, p+k-1] would overlap a SAME-DOC kept (rank-1) occurrence is
    * exempted, so canonical copies survive verbatim even under
    * self-overlapping repeats ("a b a b a" with k=3: position 3 repeats
    * the kept position-1 span — stripping it would delete token 3 OF the
    * kept copy; the exemption leaves the doc intact and strips only
    * occurrences clear of canonical ranges). The trade is residual
    * within-doc redundancy next to a kept copy — under-stripping, never
    * destroying the last copy of duplicated content.
    *
    * Shapes: occurrence ranking is one hash-shuffle window over the
    * duplicated postings; the exemption is a (doc, position-bucket)
    * equi-join between strip candidates and kept positions — overlap
    * needs |p_strip - p_keep| <= k-1, so keeps replicate into the 3
    * adjacent width-k buckets and the exact predicate filters inside the
    * bucket (the RangeJoin trick; no per-doc cross product even for
    * boilerplate-heavy docs). All inputs are duplicated postings only —
    * bounded by true duplication. */
  def dedupSpans(df: DataFrame, idCol: String, textCol: String, k: Int = 8,
                 minDocFreq: Int = 2, outCol: String = "text_dedup"): DataFrame = {
    val hits = duplicatedSpanPostings(df, idCol, textCol, k, minDocFreq)
    val rankW = Window.partitionBy(col("_h")).orderBy(col(idCol), col("_pos"))
    val ranked = hits.withColumn("_rn", row_number().over(rankW))
    // distinct column names on each side: both frames descend from
    // `ranked`, and a self-join over same-name refs is ambiguous
    val kept = ranked.filter(col("_rn") === 1)
      .select(col(idCol).as("_kid"), col("_pos").as("_kpos"))
      .withColumn("_kbkt", explode(array(
        floor((col("_kpos") - 1) / k) - 1,
        floor((col("_kpos") - 1) / k),
        floor((col("_kpos") - 1) / k) + 1)))
    val cand = ranked.filter(col("_rn") > 1)
      .select(col(idCol).as("_sid"), col("_pos"))
      .withColumn("_sbkt", floor((col("_pos") - 1) / k))
    // anti-join on (doc, bucket) equality PLUS the exact overlap
    // predicate: bucket equality alone would also exempt adjacent-bucket
    // candidates at distance k..2k-1, which do NOT overlap a kept range
    val strip = cand.join(kept,
        col("_sid") === col("_kid") && col("_sbkt") === col("_kbkt") &&
          abs(col("_pos") - col("_kpos")) <= k - 1,
        "left_anti")
      .select(col("_sid").as(idCol), col("_pos"))
    stripSpans(df, idCol, textCol, mergeSpanRanges(strip, idCol, k), outCol)
  }

  /** Cross-document boilerplate LINE removal — the crawl-hygiene pass
    * (RefinedWeb 2023, CCNet 2020 run it corpus-wide): a line whose
    * trimmed form occurs in at least `minDocFreq` DISTINCT documents is
    * boilerplate (nav bars, cookie banners, footers) and is stripped
    * from every document; every other line survives in original order.
    * Whitespace-only lines are structural — never counted toward
    * document frequency and never stripped. Complements the per-row
    * [[TextAnalysis.dedupLines]] (within-doc collapse): this one needs
    * corpus-wide evidence, so it is a DataFrame op, not a Column.
    * Returns one row per input document: (idCol, outCol); a document
    * reduced to nothing keeps an empty string.
    *
    * Shapes at 100 TB: one distinct over (doc, line key) + one count
    * shuffle keyed on the line, then an anti-join of the exploded lines
    * against the boilerplate set — that set is tiny by construction
    * (only lines repeated across >= minDocFreq docs), so AQE broadcasts
    * it from its runtime size. With `hashKeys` the group/join key is
    * `xxhash64(trimmed line)` — 8 bytes shuffle instead of line text,
    * at a ~n^2/2^65 collision risk (a unique line colliding with a
    * boilerplate hash is wrongly stripped); the exact default moves
    * each distinct line's text once. Reassembly avoids HOF lambdas:
    * sort the (pos, line) struct array and extract the field
    * (GetArrayStructFields — codegen'd, per-row-once). */
  def stripBoilerplateLines(df: DataFrame, idCol: String, textCol: String,
                            minDocFreq: Int, hashKeys: Boolean = false,
                            outCol: String = "clean"): DataFrame = {
    require(minDocFreq >= 2, s"minDocFreq must be >= 2, got $minDocFreq")
    val lines = df
      .select(col(idCol), posexplode(split(col(textCol), "\n")).as(Seq("_pos", "_line")))
      .withColumn("_key", trim(col("_line")))
      .withColumn("_gk", if (hashKeys) xxhash64(col("_key")) else col("_key"))
    // blank keys are excluded here, so they can never enter the
    // boilerplate set — the anti-join below then keeps them for free
    val boiler = lines.filter(col("_key") =!= "")
      .select(col(idCol), col("_gk")).distinct()
      .groupBy("_gk").agg(count(lit(1)).as("_df"))
      .filter(col("_df") >= minDocFreq)
      .select(col("_gk"))
    val kept = lines.join(boiler, Seq("_gk"), "left_anti")
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("_pos"), col("_line")))).as("_ls"))
      .select(col(idCol), concat_ws("\n", col("_ls").getField("_line")).as(outCol))
    df.select(col(idCol)).join(kept, Seq(idCol), "left")
      .withColumn(outCol, coalesce(col(outCol), lit("")))
  }

  /** Cross-document KEEP-FIRST line dedup (RefinedWeb 2023 §3.2 exact
    * line dedup: a repeated line is removed from every document EXCEPT
    * its first occurrence, corpus order = (doc id, line position)).
    * Complements [[stripBoilerplateLines]], which strips a frequent
    * line from ALL documents once it crosses a doc-frequency threshold:
    * keep-first preserves exactly one copy of every line, threshold-
    * free. Whitespace-only lines are structural — never deduped.
    * Returns one row per input document: (idCol, outCol); a document
    * reduced to nothing keeps an empty string.
    *
    * Scale: one window keyed on the trimmed line (per-key rows = that
    * line's total occurrence count) + one per-doc reassembly shuffle.
    * A line repeated across millions of documents is a hot window key —
    * the price of a GLOBAL argmin per line; when the corpus has such
    * lines and one canonical copy isn't required, the df-threshold
    * [[stripBoilerplateLines]] is the skew-robust form (its count
    * aggregate partials map-side; an argmin window cannot). */
  def keepFirstLinesAcrossDocs(df: DataFrame, idCol: String, textCol: String,
                               outCol: String = "clean"): DataFrame = {
    val lines = df
      .select(col(idCol), posexplode(split(col(textCol), "\n")).as(Seq("_pos", "_line")))
      .withColumn("_key", trim(col("_line")))
    val w = Window.partitionBy(col("_key"))
      .orderBy(col(idCol).asc_nulls_last, col("_pos").asc_nulls_last)
    val firsts = lines.filter(col("_key") =!= "")
      .withColumn("_rk", row_number().over(w)).filter(col("_rk") === 1)
      .select(col(idCol), col("_pos"), col("_line"))
    // blank keys never enter the window: they are kept everywhere AND
    // would otherwise be the one guaranteed-hot key
    val blanks = lines.filter(col("_key") === "")
      .select(col(idCol), col("_pos"), col("_line"))
    val kept = firsts.unionByName(blanks)
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("_pos"), col("_line")))).as("_ls"))
      .select(col(idCol), concat_ws("\n", col("_ls").getField("_line")).as(outCol))
    df.select(col(idCol)).join(kept, Seq(idCol), "left")
      .withColumn(outCol, coalesce(col(outCol), lit("")))
  }

  /** 64-bit SimHash over the token multiset: bit i of the result is the
    * sign of the population vote across token hashes (`2*popcount_i > n`).
    * One native codegen'd expression (graft.functions.SimHash64) — a
    * narrow per-row map, no shuffle, no HOF lambda.
    *
    * Null-in-null-out: a null token ARRAY yields NULL (standard
    * expression null propagation), distinct from an empty array's 0L.
    * Callers persisting signatures should treat the column as nullable;
    * [[simHashNearDupPairs]] is unaffected (null-text docs can't band). */
  def simHash(toks: Column): Column = graft.functions.SimHash64(toks)

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Pigeonhole-banded Hamming pair join over any 64-bit fingerprint
    * column (SimHash, dHash, ...): split the hash into `maxHamming + 1`
    * contiguous sub-bands — a pair within Hamming distance `maxHamming`
    * differs in at most `maxHamming` bands, so it must agree EXACTLY on
    * at least one — equi-join on (band, key), verify the true distance.
    * Lossless (never misses a pair within the bound) and the same
    * shuffle shape as MinHash-LSH: candidates ∝ band-key collisions,
    * never n². Rows whose hash is NULL (e.g. undecodable images under
    * [[graft.functions.DHash64]]) can't band and drop out.
    *
    * `maxHamming` <= 31 (each band needs >= 2 bits to discriminate;
    * in practice near-dup bounds are single digits — wider bands =
    * fewer, more selective join keys). */
  def hammingBandedPairs(withH: DataFrame, idCol: String, hashCol: String,
                         maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 31,
      s"maxHamming must be in [0, 31], got $maxHamming")
    val nBands = maxHamming + 1
    // contiguous bands covering all 64 bits: the first (64 % nBands)
    // bands take one extra bit
    val widths = Array.tabulate(nBands)(b => 64 / nBands + (if (b < 64 % nBands) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    val banded = withH.select(col(idCol), col(hashCol).as("_h"),
      explode(array((0 until nBands).map { b =>
        val mask = if (widths(b) == 64) -1L else (1L << widths(b)) - 1L
        struct(lit(b).as("band"),
          shiftrightunsigned(col(hashCol), offsets(b)).bitwiseAND(lit(mask)).as("key"))
      }: _*)).as("_bh"))
      .select(col(idCol), col("_h"), col("_bh.band").as("_band"), col("_bh.key").as("_key"))
    val a = banded.select(col(idCol).as("id_a"), col("_h").as("_ha"), col("_band"), col("_key"))
    val b = banded.select(col(idCol).as("id_b"), col("_h").as("_hb"), col("_band"), col("_key"))
    a.join(b, Seq("_band", "_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("_ha"), col("_hb"))
      .distinct()
      .withColumn("hamming", hamming64(col("_ha"), col("_hb")))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** SimHash near-dup pairs: block on `maxHamming + 1` sub-bands
    * (pigeonhole — see [[hammingBandedPairs]]), then verify the true
    * Hamming distance. Same equi-join shape as MinHash-LSH: scales. */
  def simHashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
                          maxHamming: Int = 3): DataFrame = {
    // Signature stage is a NARROW map (native SimHash64 expression): no
    // shuffle at all before banding. The previous formulation (explode +
    // 64 sum-aggregate columns) paid a full shuffle on the id plus a huge
    // generated HashAggregate class — the round-1 bench outlier.
    val withH = df.select(col(idCol), simHash(TextAnalysis.tokens(col(textCol))).as("_h"))
    hammingBandedPairs(withH, idCol, "_h", maxHamming)
  }

  /** SemDeDup-style clustered semantic dedup (the published scale recipe
    * for DENSE embeddings — Abbas et al. 2023: k-means cells, then
    * pairwise cosine only WITHIN each cell): one narrow coarse-quantizer
    * assignment ([[Ivf.attachCell]]) blocks the corpus, and the pairwise
    * verifier ([[Similarity.cosineNearDupPairs]]) runs per cell as an
    * equi-join — never all-pairs. Replaces random-hyperplane LSH for
    * dense vectors: data-learned cells track the actual density, so
    * candidate sets are tighter at equal recall.
    *
    * Published tradeoff, inherited deliberately: a near-dup pair
    * straddling a cell boundary is missed — DedupSpec bounds recall
    * vs brute force on clustered data. `assignCells > 1` is the
    * multi-probe mitigation: each vector blocks into its n nearest
    * cells ([[Ivf.attachTopCells]]), so a pair split by ONE boundary
    * still meets in the runner-up cell; candidate volume grows ~n-fold
    * and duplicate hits dedupe on the pair key. Work: one codegen
    * assignment pass + one shuffle on cell + within-cell pairs (cell
    * sizes are corpus/k on average; pick k so cells fit comfortably in
    * a task). */
  /** APPLY path of [[semanticNearDupPairs]] — the SemDeDup keep-one-
    * representative step (same shape as [[dropNearDuplicates]] for the
    * MinHash family): cluster the semantic near-dup graph and keep each
    * component's min-id representative. */
  def dropSemanticNearDups(df: DataFrame, idCol: String, vecCol: String,
                           model: Ivf.Model, threshold: Double,
                           assignCells: Int = 1, maxIter: Int = 30): DataFrame = {
    val pairs = semanticNearDupPairs(df, idCol, vecCol, model, threshold, assignCells)
    val comps = connectedComponents(df.select(col(idCol)), idCol, pairs, maxIter)
    df.join(comps.filter(col("id") === col("rep")).select(col("id").as(idCol)), Seq(idCol))
  }

  def semanticNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                           model: Ivf.Model, threshold: Double,
                           assignCells: Int = 1): DataFrame = {
    require(assignCells >= 1, "assignCells must be >= 1")
    if (assignCells == 1)
      Similarity.cosineNearDupPairs(
        Ivf.attachCell(df, vecCol, model, "_sem_cell"),
        idCol, vecCol, blockCols = Seq("_sem_cell"), threshold = threshold)
    else
      Similarity.cosineNearDupPairs(
        Ivf.attachTopCells(df, vecCol, model, assignCells, "_sem_cells")
          .withColumn("_sem_cell", explode(col("_sem_cells")))
          .drop("_sem_cells"),
        idCol, vecCol, blockCols = Seq("_sem_cell"), threshold = threshold)
        // a pair sharing several probed cells arrives once per shared
        // cell with an identical cos — dedupe on the pair key
        .dropDuplicates("id_a", "id_b")
  }
}
