package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorOps

/** Vector similarity search over embedding columns (`array<float>`).
  *
  * Arithmetic is done in double precision via `zip_with`/`aggregate`
  * folds — sequential accumulation, so results are deterministic and
  * reproducible (and oracle-comparable). All expressions codegen.
  *
  * Two tiers:
  *   - [[knnBruteForce]]: exact top-k via broadcast of the (small) query
  *     set against the full corpus — the right plan when |queries| is
  *     small: one pass over the corpus, no shuffle of the corpus itself.
  *   - [[annLshTopK]]: random-hyperplane LSH — corpus and queries are
  *     bucketed by a 16-bit sign signature and only same-bucket pairs are
  *     scored. At 100 TB this is the scale path: the equi-join on bucket
  *     replaces the cross product; recall is tunable via bits/probes.
  */
object Similarity {

  /** Cast a float vector to double for stable arithmetic. */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Codegen'd dot product (tight primitive loop; see
    * graft.functions.DotProduct — sequential accumulation, so the sum
    * order matches a scalar engine's and results stay oracle-comparable).
    */
  def dot(a: Column, b: Column): Column = VectorOps.dotProduct(a, b)

  def l2Norm(a: Column): Column = VectorOps.l2Norm(a)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (greatest(l2Norm(a), lit(1e-12)) * greatest(l2Norm(b), lit(1e-12)))

  /** cosine(a, b) when per-row norms were precomputed (norm columns cost
    * one pass per ROW; recomputing them per candidate PAIR is the
    * difference between 1 and 3 vector loops per pair). */
  private def cosinePre(a: Column, b: Column, na: Column, nb: Column): Column =
    dot(a, b) / (greatest(na, lit(1e-12)) * greatest(nb, lit(1e-12)))

  /** Exact top-k cosine neighbors for each query vector.
    * `queries`/`corpus`: (id, vec float array). The query side is
    * broadcast; ranking keys are rounded before the window so FP noise
    * can't flip ranks between runs/engines. */
  def knnBruteForce(queries: DataFrame, corpus: DataFrame, qId: String, cId: String,
                    qVec: String, cVec: String, k: Int): DataFrame = {
    val q = queries.select(col(qId).as("query_id"), asDouble(col(qVec)).as("_qv"))
      .withColumn("_qn", l2Norm(col("_qv")))
    val c = corpus.select(col(cId).as("neighbor_id"), asDouble(col(cVec)).as("_cv"))
      .withColumn("_cn", l2Norm(col("_cv")))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", round(cosinePre(col("_qv"), col("_cv"), col("_qn"), col("_cn")), 6))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("neighbor_id"), col("cos"))
  }

  /** Hard-negative mining (the contrastive-training data op: DPR /
    * SimCSE-style): for each query, the top-k most-similar corpus rows
    * whose `labelCol` DIFFERS — maximally confusable wrong answers,
    * which train far better than random negatives. Same broadcast-
    * queries + per-query heap plan as [[knnBruteForce]]; the label
    * inequality is one more pushed filter, so mining costs exactly a
    * kNN. Swap the corpus side for the IVF path at billion-vector
    * scale — the operator contract (query_id, rk, neighbor_id, cos,
    * neighbor_label) is the same. */
  def hardNegatives(queries: DataFrame, corpus: DataFrame, qId: String, cId: String,
                    qVec: String, cVec: String, labelCol: String, k: Int): DataFrame = {
    val q = queries.select(col(qId).as("query_id"), asDouble(col(qVec)).as("_qv"),
        col(labelCol).as("_qlbl"))
      .withColumn("_qn", l2Norm(col("_qv")))
    val c = corpus.select(col(cId).as("neighbor_id"), asDouble(col(cVec)).as("_cv"),
        col(labelCol).as("neighbor_label"))
      .withColumn("_cn", l2Norm(col("_cv")))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .filter(col("neighbor_label") =!= col("_qlbl")) // negatives only
      .withColumn("cos", round(cosinePre(col("_qv"), col("_cv"), col("_qn"), col("_cn")), 6))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("neighbor_id"), col("neighbor_label"), col("cos"))
  }

  /** Contrastive TRIPLET mining — the (anchor, positive, hardest
    * negative) table a reranker/bi-encoder trains on (DPR, Karpukhin
    * 2020 §4.2): per query, the most-similar SAME-label row is the
    * positive, the most-similar DIFFERENT-label row the hard negative,
    * `margin` their cosine gap (small/negative margin = the pairs that
    * teach the most). One broadcast-queries pass (the [[knnBruteForce]]
    * plan) + one (query, side) window; queries lacking either side are
    * dropped (documented: a singleton label has no positive). Swap the
    * corpus side for the IVF path at billion-vector scale. */
  def contrastiveTriplets(queries: DataFrame, corpus: DataFrame, qId: String,
                          cId: String, qVec: String, cVec: String,
                          labelCol: String): DataFrame = {
    val q = queries.select(col(qId).as("query_id"), asDouble(col(qVec)).as("_qv"),
        col(labelCol).as("_qlbl"))
      .withColumn("_qn", l2Norm(col("_qv")))
    val c = corpus.select(col(cId).as("neighbor_id"), asDouble(col(cVec)).as("_cv"),
        col(labelCol).as("_clbl"))
      .withColumn("_cn", l2Norm(col("_cv")))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("_pos", col("_clbl") === col("_qlbl"))
      .withColumn("cos", round(cosinePre(col("_qv"), col("_cv"), col("_qn"), col("_cn")), 6))
    val w = Window.partitionBy(col("query_id"), col("_pos"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .groupBy(col("query_id"))
      .agg(
        max(when(col("_pos"), col("neighbor_id"))).as("pos_id"),
        max(when(col("_pos"), col("cos"))).as("pos_cos"),
        max(when(!col("_pos"), col("neighbor_id"))).as("neg_id"),
        max(when(!col("_pos"), col("cos"))).as("neg_cos"))
      .filter(col("pos_id").isNotNull && col("neg_id").isNotNull)
      .select(col("query_id"), col("pos_id"), col("pos_cos"),
        col("neg_id"), col("neg_cos"),
        round(col("pos_cos") - col("neg_cos"), 6).as("margin"))
  }

  /** Top-k neighbors over int8-QUANTIZED vectors: L2-normalize, quantize
    * ([[graft.functions.QuantizeInt8]], 4x smaller than float32), score
    * with integer dot products ([[graft.functions.Int8Dot]]) — on unit
    * vectors the int8 dot approximates cosine to ~1e-2, which preserves
    * neighbor RANKINGS (QuantSpec pins recall vs exact). The serving
    * shape at scale: the corpus is stored/shuffled as codes — a quarter
    * of the bytes through every scan, cache, and exchange — and floats
    * are never rebuilt. Same broadcast-queries plan as
    * [[knnBruteForce]]. */
  def knnInt8(queries: DataFrame, corpus: DataFrame, qId: String, cId: String,
              qVec: String, cVec: String, k: Int): DataFrame = {
    import graft.functions.{Int8Dot, QuantizeInt8, VectorOps}
    def codes(vec: Column) = QuantizeInt8(VectorOps.l2Normalize(asDouble(vec)))
    val q = queries.select(col(qId).as("query_id"), codes(col(qVec)).as("_qc"))
    val c = corpus.select(col(cId).as("neighbor_id"), codes(col(cVec)).as("_cc"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos8", round(Int8Dot(col("_qc"), col("_cc")), 6))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos8").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("neighbor_id"), col("cos8"))
  }

  /** Deterministic random hyperplanes: `bits` planes x `dim` components
    * derived from a fixed-seed PRNG, embedded as a literal. At 64 dims x
    * 16 bits this is a 1k-element literal — negligible plan size. */
  def hyperplanes(bits: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(bits)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit LSH signature (bucket id in [0, 2^bits)). */
  def lshBucket(vec: Column, planes: Seq[Seq[Double]]): Column = {
    val bitCols = planes.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.map(lit): _*)
      when(dot(vec, planeLit) >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bitCols.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Approximate top-k: score only pairs that share an LSH bucket.
    * Multi-probe (`probes` bit-flip variants of the query signature)
    * recovers recall lost at bucket boundaries. Output schema matches
    * [[knnBruteForce]]; `rk` may have gaps vs exact when a true neighbor
    * hashed elsewhere — that's the documented recall tradeoff.
    *
    * `dim` (0 = infer) is VERIFIED against the data: the hyperplane
    * family must span the full vector width, or buckets silently key on a
    * prefix and recall collapses. Inference reads one corpus row and one
    * query row (two `limit(1)` jobs — negligible); an explicit `dim` that
    * contradicts the data throws instead of degrading. */
  /** One non-null sample per side infers the vector dimension; a
    * ragged-dim corpus is NOT fully validated (that would cost a full
    * pass) — the sample catches the systematic mistake (an explicit
    * `dim` contradicting a homogeneous corpus). Shared by both LSH
    * variants so their validation can never drift apart. */
  private def inferredDim(opName: String, queries: DataFrame, corpus: DataFrame,
                          qVec: String, cVec: String, dim: Int): Int = {
    def sampleDim(df: DataFrame, vec: String): Option[Int] =
      df.filter(col(vec).isNotNull).select(size(col(vec)).as("d")).limit(1)
        .collect().headOption.map(_.getInt(0))
    val cDimOpt = sampleDim(corpus, cVec)
    val qDimOpt = sampleDim(queries, qVec)
    for (cd <- cDimOpt; qd <- qDimOpt)
      require(qd == cd, s"$opName: query vectors are $qd-dim but corpus vectors are $cd-dim")
    val cDim = cDimOpt.orElse(qDimOpt).getOrElse(1) // both empty -> empty result, any planes do
    require(dim <= 0 || cDimOpt.isEmpty && qDimOpt.isEmpty || dim == cDim,
      s"$opName: explicit dim=$dim but the data's vectors are $cDim-dimensional")
    cDim
  }

  /** Shared tail of both LSH variants: bucket equi-join (queries side
    * broadcast), self-pair drop, pair dedupe on ids ONLY (the shuffle
    * compares 2 longs, never two 64-double vectors — the same pair can
    * arrive via multiple probes/bands), precomputed-norm cosine, per-
    * query top-k. Both `c` and `q` carry a `_bucket` column. */
  private def bucketedTopK(c: DataFrame, q: DataFrame, k: Int): DataFrame = {
    val scored = c.join(broadcast(q), Seq("_bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), col("_qv"), col("_cv"), col("_qn"), col("_cn"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cos", round(cosinePre(col("_qv"), col("_cv"), col("_qn"), col("_cn")), 6))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("neighbor_id"), col("cos"))
  }

  def annLshTopK(queries: DataFrame, corpus: DataFrame, qId: String, cId: String,
                 qVec: String, cVec: String, k: Int, bits: Int = 12, probes: Int = 4,
                 dim: Int = 0): DataFrame = {
    val cDim = inferredDim("annLshTopK", queries, corpus, qVec, cVec, dim)
    val planes = hyperplanes(bits, cDim)
    val c = corpus
      .select(col(cId).as("neighbor_id"), asDouble(col(cVec)).as("_cv"))
      .withColumn("_cn", l2Norm(col("_cv")))
      .withColumn("_bucket", lshBucket(col("_cv"), planes))
    // query probes: exact bucket + single-bit flips (multi-probe LSH)
    val q = queries.select(col(qId).as("query_id"), asDouble(col(qVec)).as("_qv"))
      .withColumn("_qn", l2Norm(col("_qv")))
      .withColumn("_b0", lshBucket(col("_qv"), planes))
      .withColumn("_bucket", explode(array(
        col("_b0") +: (0 until (probes - 1)).map(i => col("_b0").bitwiseXOR(shiftleft(lit(1L), i))): _*)))
      .select(col("query_id"), col("_qv"), col("_qn"), col("_bucket"))
    bucketedTopK(c, q, k)
  }

  /** Exact kNN under a row predicate — "top-k among corpus rows
    * satisfying P", the filtered-search baseline [[Ivf.searchTopKWhere]]
    * approximates. The predicate applies BEFORE scoring (pushed to the
    * corpus scan), never as a post-filter of an unfiltered top-k — the
    * post-filter form silently under-returns exactly when the predicate
    * is selective. */
  def knnFiltered(queries: DataFrame, corpus: DataFrame, qId: String, cId: String,
                  qVec: String, cVec: String, k: Int, predicate: Column): DataFrame =
    knnBruteForce(queries, corpus.filter(predicate), qId, cId, qVec, cVec, k)

  /** Per-BIT sign-LSH collision probability at cosine similarity `cos`:
    * P[sign(w·a) = sign(w·b)] = 1 − θ/π for a Gaussian hyperplane w
    * (Goemans–Williamson 1995; Charikar 2002 simhash) — the angular
    * family's analogue of "per-MinHash collision prob = Jaccard". This
    * is the similarity→probability map that lets sign-LSH share
    * [[Dedup.lshParamsForProb]]'s S-curve sizing contract. */
  def signCollisionProb(cos: Double): Double = {
    require(cos >= -1.0 && cos <= 1.0, s"cosine must be in [-1, 1], got $cos")
    1.0 - math.acos(cos) / math.Pi
  }

  /** (bands, bitsPerBand) for banded sign-LSH separating cosine >=
    * threshold+margin (detected with prob >= 1−fnBudget) from cosine <=
    * threshold−margin (candidate with prob <= fpBudget) — EXACTLY
    * [[Dedup.lshParamsFor]]'s contract, mapped through
    * [[signCollisionProb]] into the shared probability-space solver.
    * Angular collision probs compress toward 1 (cos 0 already collides
    * at p=0.5), so tight margins need far more bits than MinHash needs
    * hashes — the solver fails loud when `maxHashes` can't buy the
    * separation, which is the honest answer for sign-LSH at close
    * thresholds. */
  def annLshParamsFor(cosThreshold: Double, fpBudget: Double = 0.05,
                      fnBudget: Double = 0.05, margin: Double = 0.1,
                      maxHashes: Int = 1024): (Int, Int) = {
    require(cosThreshold - margin > -1.0 && cosThreshold + margin <= 1.0,
      s"threshold +- margin must stay inside (-1, 1]: $cosThreshold +- $margin")
    // maxRowsPerBand = 48: [[annLshBandedTopK]] packs a band's sign bits
    // plus the band tag into one long — the solver must only derive
    // parameterizations its consumer accepts
    Dedup.lshParamsForProb(
      signCollisionProb(cosThreshold + margin),
      signCollisionProb(cosThreshold - margin),
      fpBudget, fnBudget, maxHashes, maxRowsPerBand = 48)
  }

  /** Banded sign-LSH ANN: `bands` independent signatures of
    * `bitsPerBand` hyperplane bits each; a corpus vector is a candidate
    * for a query iff ANY band agrees exactly (the OR-of-ANDs S-curve —
    * same construction as MinHash banding, so the (bands, bits) pair
    * comes from [[annLshParamsFor]] and carries its fp/fn contract).
    * Same bucketed equi-join shape as [[annLshTopK]] — shuffles
    * (band-tagged bucket, id) longs, never all-pairs; the multi-PROBE
    * variant trades that contract for fewer hashes. */
  def annLshBandedTopK(queries: DataFrame, corpus: DataFrame, qId: String, cId: String,
                       qVec: String, cVec: String, k: Int,
                       bands: Int, bitsPerBand: Int, dim: Int = 0): DataFrame = {
    require(bands >= 1 && bitsPerBand >= 1 && bitsPerBand <= 48,
      s"need bands >= 1 and 1 <= bitsPerBand <= 48, got ($bands, $bitsPerBand)")
    val cDim = inferredDim("annLshBandedTopK", queries, corpus, qVec, cVec, dim)
    val planes = hyperplanes(bands * bitsPerBand, cDim)
    // ALL hyperplane dots as ONE referenced-object expression
    // ([[graft.functions.CentroidDots]] — the plane matrix never enters
    // the generated source): the per-bit literal-array form embedded
    // bands*bits 64-double literals and a dot loop each, which at a
    // derived 61x8 sizing meant a ~31k-double plan and a multi-second
    // Janino ceremony per run (measured 5.8 s/query at sf0.1; this form
    // prices the same math as one flat mat-vec)
    val planesFlat = planes.flatten.toArray
    def bandBuckets(vec: Column): Column = {
      import org.apache.spark.sql.GraftColumnBridge.{column, expression}
      val dots = graft.functions.CentroidDots(
        expression(vec.cast("array<double>")), planesFlat, bands * bitsPerBand)
      // band-tagged sign buckets in one loop ([[functions.SignBandBuckets]])
      column(graft.functions.SignBandBuckets(dots, bands, bitsPerBand))
    }
    val c = corpus
      .select(col(cId).as("neighbor_id"), asDouble(col(cVec)).as("_cv"))
      .withColumn("_cn", l2Norm(col("_cv")))
      .withColumn("_bucket", explode(bandBuckets(col("_cv"))))
    val q = queries.select(col(qId).as("query_id"), asDouble(col(qVec)).as("_qv"))
      .withColumn("_qn", l2Norm(col("_qv")))
      .withColumn("_bucket", explode(bandBuckets(col("_qv"))))
      .select(col("query_id"), col("_qv"), col("_qn"), col("_bucket"))
    bucketedTopK(c, q, k)
  }

  /** Embedding near-duplicate pairs within blocks (e.g. same label):
    * cosine >= threshold. Blocked equi-join, not all-pairs — an empty
    * block list would silently degenerate to the n² cross product this
    * operator exists to avoid, so it fails loud instead (block on IVF
    * cells via [[Dedup.semanticNearDupPairs]] when no natural key
    * exists). */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                         blockCols: Seq[String], threshold: Double): DataFrame = {
    require(blockCols.nonEmpty,
      "cosineNearDupPairs requires at least one block column — an empty list " +
        "would be an all-pairs cross product; use IVF-cell blocking " +
        "(Dedup.semanticNearDupPairs) when no natural blocking key exists")
    val base = df.select(col(idCol) +: blockCols.map(col) :+ asDouble(col(vecCol)).as("_v"): _*)
      .withColumn("_n", l2Norm(col("_v")))
    val a = base.select(col(idCol).as("id_a") +: blockCols.map(c => col(c)) :+ col("_v").as("_va") :+ col("_n").as("_na"): _*)
    val b = base.select(col(idCol).as("id_b") +: blockCols.map(c => col(c).as(s"${c}_b")) :+ col("_v").as("_vb") :+ col("_n").as("_nb"): _*)
    val cond = blockCols.map(c => col(c) === col(s"${c}_b")).reduce(_ && _) && col("id_a") < col("id_b")
    a.join(b, cond)
      .withColumn("cos", round(cosinePre(col("_va"), col("_vb"), col("_na"), col("_nb")), 6))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** Maximal Marginal Relevance re-rank (Carbonell & Goldstein 1998):
    * from each query's candidate set, greedily select k results trading
    * relevance against redundancy — `argmax λ·rel(c) − (1−λ)·max_{s∈S}
    * cos(c, s)` — the standard diversification pass a RAG retriever
    * runs AFTER ANN candidate generation (top-k-by-cosine alone returns
    * k copies of the same near-duplicate passage).
    *
    * `candidates`: (query id, candidate id, candidate vector,
    * relevance) — an ALREADY-TRUNCATED per-query set (the ANN stage's
    * top-N), which is what bounds the per-group work: the greedy is
    * O(N·k) dot products over ≤ N rows per query, run inside
    * `flatMapGroups` after a query-keyed shuffle — corpus-scale in the
    * number of queries, constant in N. The first pick is the pure
    * relevance argmax; ties break toward the smaller candidate id.
    *
    * Determinism contract (what makes the SQL twin hash-match): the
    * relevance input arrives 6-dp-rounded (knnBruteForce's contract),
    * pairwise cosines are rounded to 6 dp with [[cosinePre]]'s exact
    * arithmetic (dot / (max(‖a‖,1e-12)·max(‖b‖,1e-12)), sequential
    * folds), and the greedy compares the resulting doubles exactly —
    * identical inputs, identical ops, identical argmax in both engines.
    * Returns (query_id, rk 1..k, neighbor_id, mmr_score rounded 6 dp;
    * rk 1's score is the relevance itself). */
  def mmrRerank(candidates: DataFrame, queryIdCol: String, candIdCol: String,
                candVecCol: String, relCol: String, k: Int,
                lambda: Double): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(lambda >= 0.0 && lambda <= 1.0, "lambda must be in [0, 1]")
    val spark = candidates.sparkSession
    import spark.implicits._
    val ds = candidates.select(
        col(queryIdCol).cast("long").as("_q"),
        col(candIdCol).cast("long").as("_c"),
        asDouble(col(candVecCol)).as("_v"),
        col(relCol).cast("double").as("_r"))
      .as[(Long, Long, Seq[Double], Double)]
    ds.groupByKey(_._1).flatMapGroups { (q, it) =>
      // candidates sorted by id so the strict > argmax breaks ties low
      val cands = it.map { case (_, c, v, r) => (c, v.toArray, r) }
        .toArray.sortBy(_._1)
      val n = cands.length
      val norms = cands.map { t =>
        val s = math.sqrt(t._2.map(x => x * x).sum)
        if (s < 1e-12) 1e-12 else s
      }
      // Spark's own Round semantics (BigDecimal.valueOf + HALF_UP), so
      // the driver-side greedy sees EXACTLY the values round(col, 6)
      // would produce — rint's half-even would drift on .5 boundaries
      def r6(x: Double): Double =
        java.math.BigDecimal.valueOf(x)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      def cosRounded(i: Int, j: Int): Double = {
        val a = cands(i)._2
        val b = cands(j)._2
        // equal lengths are a hard precondition (advisor r16): silently
        // truncating to the shorter vector would DIVERGE from the twin
        // (DuckDB's list_cosine_similarity errors on mismatched lists) —
        // malformed input must fail fast on both engines, not drift
        require(a.length == b.length,
          s"mmrRerank: mismatched vector lengths within query group $q " +
            s"(${a.length} vs ${b.length} for candidates ${cands(i)._1}, ${cands(j)._1})")
        var s = 0.0
        var d = 0
        while (d < a.length) { s += a(d) * b(d); d += 1 }
        r6(s / (norms(i) * norms(j)))
      }
      val used = new Array[Boolean](n)
      // max cos to the selected set so far — NEGATIVE infinity start: a
      // candidate anti-correlated with everything selected earns a
      // diversity BONUS (−(1−λ)·maxSim > 0); a 0.0 floor would clamp it
      val maxSim = Array.fill(n)(Double.NegativeInfinity)
      val out = Seq.newBuilder[(Long, Int, Long, Double)]
      var rk = 1
      val kk = math.min(k, n)
      while (rk <= kk) {
        var best = -1
        var bestScore = Double.NegativeInfinity
        var i = 0
        while (i < n) {
          if (!used(i)) {
            val score =
              if (rk == 1) cands(i)._3
              else lambda * cands(i)._3 - (1.0 - lambda) * maxSim(i)
            if (score > bestScore) { best = i; bestScore = score }
          }
          i += 1
        }
        used(best) = true
        out += ((q, rk, cands(best)._1, r6(bestScore + 1e-9)))
        var j = 0
        while (j < n) {
          if (!used(j)) {
            val c = cosRounded(best, j)
            if (c > maxSim(j)) maxSim(j) = c
          }
          j += 1
        }
        rk += 1
      }
      out.result().iterator
    }.toDF("query_id", "rk", "neighbor_id", "mmr_score")
  }
}
