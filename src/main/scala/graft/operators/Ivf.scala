package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.{CentroidAggregator, VectorOps}

/** IVF (inverted-file) approximate nearest neighbor over embeddings —
  * the scale path beyond sign-LSH bucketing: a coarse quantizer (mini
  * k-means over unit vectors, trained distributed) splits the corpus into
  * `k` cells; a query scores only the `nProbe` nearest cells' vectors.
  *
  * Scale shape: training is `iters` rounds of (narrow argmax assignment +
  * one map-side-combined centroid aggregation); search is an equi-join on
  * cell id — corpus shuffles once by cell, probes fan out queries
  * nProbe-fold. No cross product anywhere. Recall is tunable with
  * k/nProbe exactly like FAISS IVF. Assignment/scoring run on the
  * codegen'd [[graft.functions.CentroidDots]] expression; the centroid
  * matrix ships as a task-serialized referenced object (k x dim doubles
  * — fine for coarse quantizers; a 100k-cell quantizer would broadcast
  * a DataFrame instead). */
object Ivf {

  final case class Model(centroids: Array[Array[Double]])

  /** Unit-normalized double vector column (cosine == dot thereafter). */
  private def unit(vecCol: Column): Column =
    VectorOps.l2Normalize(vecCol.cast("array<double>"))

  /** All-centroid dot scores as ONE referenced-object expression
    * ([[graft.functions.CentroidDots]]): unlike the earlier per-centroid
    * literal array, the generated source is identical across Lloyd
    * rounds, so iterative training hits the codegen cache instead of
    * recompiling every round. */
  private def centroidScores(v: Column, cents: Array[Array[Double]]): Column = {
    // the flat layout decodes as k rows of length total/k — a ragged
    // caller-built Model would silently misalign every centroid after
    // the first short row; fail loudly at plan time instead
    require(cents.nonEmpty && cents.forall(_.length == cents.head.length),
      s"centroid rows must share one dimension, got ${cents.map(_.length).distinct.toSeq}")
    org.apache.spark.sql.GraftColumnBridge.column(graft.functions.CentroidDots(
      org.apache.spark.sql.GraftColumnBridge.expression(v), cents.flatten, cents.length))
  }

  /** Adds `out` = index of the max-dot centroid (first wins on ties).
    * Deliberately NOT a when-chain argmax: folding `when(d > best, ...)`
    * duplicates the accumulated tree in BOTH branches — exponential
    * expression growth (measured 90+ MiB task binaries at k=16). The
    * scores array is materialized once; array_max/array_position walk it
    * linearly. */
  private def withCell(df: DataFrame, v: Column, cents: Array[Array[Double]], out: String): DataFrame =
    df.withColumn("_cs", centroidScores(v, cents))
      .withColumn(out, (expr("array_position(_cs, array_max(_cs))") - 1).cast("int"))
      .drop("_cs")

  /** Train the coarse quantizer: deterministic init (k vectors in
    * xxhash64-of-id order — a cheap seeded spread), then `iters` Lloyd
    * rounds of assign + mean. */
  def train(corpus: DataFrame, idCol: String, vecCol: String,
            k: Int, iters: Int = 3): Model = {
    // persisted: init + every Lloyd round scans the normalized corpus —
    // unpersisted, training reads (and re-normalizes) the source
    // iters+1 times. Freed eagerly once the model is collected.
    val base = corpus.select(col(idCol).as("_id"), unit(col(vecCol)).as("_v")).persist()
    try {
    // orderBy+limit plans as TakeOrderedAndProject (per-partition heap,
    // no global sort) — a linear seeded sample even at corpus scale
    var centroids = base.orderBy(xxhash64(col("_id"))).limit(k)
      .select(col("_v")).collect().map(_.getSeq[Double](0).toArray)
    for (_ <- 0 until iters) {
      val assigned = withCell(base, col("_v"), centroids, "_cell")
      val next = assigned.groupBy(col("_cell"))
        .agg(CentroidAggregator.centroid(col("_v").cast("array<float>")).as("_c"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
      // empty cells keep their old centroid; re-normalize means to unit
      centroids = centroids.zipWithIndex.map { case (old, i) =>
        next.get(i).map { c =>
          val n = math.sqrt(c.map(x => x * x).sum)
          if (n > 0) c.map(_ / n) else old
        }.getOrElse(old)
      }
    }
    Model(centroids)
    } finally base.unpersist() // a mid-train failure must not pin the cache
  }

  // ---- incremental maintenance -------------------------------------

  /** Assign a NEW batch to an existing (possibly [[loadModel]]-ed)
    * coarse quantizer without retraining: ONE narrow codegen pass, work
    * ∝ batch size, the standing index untouched. The (id, cell) output
    * unions into the serving assignment table; a search over old ∪ new
    * sees additions immediately because [[searchTopK]] cells corpus
    * rows with the same expression. */
  def assignNew(batch: DataFrame, idCol: String, vecCol: String,
                model: Model): DataFrame =
    withCell(batch.select(col(idCol), unit(col(vecCol)).as("_v")),
        col("_v"), model.centroids, "cell")
      .select(col(idCol), col("cell"))

  /** Attach the coarse-quantizer cell of `vecCol` as column `out` — the
    * public blocking seam ([[Dedup.semanticNearDupPairs]] composes it
    * with the pairwise-cosine verifier). One narrow codegen pass; the
    * input row set is untouched. */
  def attachCell(df: DataFrame, vecCol: String, model: Model,
                 out: String = "cell"): DataFrame =
    withCell(df, unit(col(vecCol)), model.centroids, out)

  /** Multi-assignment variant: `out` = the `nCells` nearest cells as an
    * int array (one codegen pass, referenced-object centroids). The
    * multi-probe mitigation for blocking schemes — a vector sits in all
    * its near cells, so boundary-straddling pairs still meet. */
  def attachTopCells(df: DataFrame, vecCol: String, model: Model,
                     nCells: Int, out: String = "cells"): DataFrame = {
    val v = unit(col(vecCol))
    df.withColumn(out, org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.TopCells(
        org.apache.spark.sql.GraftColumnBridge.expression(v),
        model.centroids.flatten, model.centroids.length, nCells)))
  }

  /** The retrain alarm: PSI of per-cell occupancy shares between the
    * index-time corpus and the corpus after incremental adds — the
    * [[Snapshot.categoryDrift]] math verbatim, cells as categories.
    * Incremental assignment stays accurate only while new data still
    * looks like what the quantizer was trained on; occupancy drift is
    * the cheapest observable proxy for when that stops being true (two
    * narrow assign passes + a k-row join — no search-quality evaluation
    * needed). */
  def centroidDrift(oldCorpus: DataFrame, newCorpus: DataFrame,
                    idCol: String, vecCol: String, model: Model): DataFrame =
    Snapshot.categoryDrift(
      assignNew(oldCorpus, idCol, vecCol, model),
      assignNew(newCorpus, idCol, vecCol, model), "cell")

  /** Industry PSI reading: < 0.1 stable, 0.1-0.25 watch, > 0.25 shifted.
    * Default trips at 0.2 — retrain before quality visibly sags. */
  def shouldRetrain(drift: DataFrame, threshold: Double = 0.2): Boolean = {
    val row = drift.agg(sum(col("psi_term"))).collect()(0)
    !row.isNullAt(0) && row.getDouble(0) > threshold
  }

  /** Per-query probe set: the `nProbe` cells with the highest
    * centroid dot products, as (query_id, _qv, _cell, _cdot) rows.
    * Shared by [[searchTopK]] and [[searchTopKPq]]. */
  private def probedCells(queries: DataFrame, qId: String, qVec: String,
                          cents: Array[Array[Double]], nProbe: Int): DataFrame = {
    val qScores = centroidScores(col("_qv"), cents)
    val probeW = Window.partitionBy(col("query_id")).orderBy(col("_cdot").desc, col("_cell"))
    queries.select(col(qId).as("query_id"), unit(col(qVec)).as("_qv"))
      .withColumn("_cs", qScores)
      .select(col("query_id"), col("_qv"),
        posexplode(col("_cs")).as(Seq("_cell", "_cdot")))
      .withColumn("_pr", row_number().over(probeW))
      .filter(col("_pr") <= nProbe)
      .select(col("query_id"), col("_qv"), col("_cell"), col("_cdot"))
  }

  /** Approximate top-k cosine neighbors: score only vectors in each
    * query's `nProbe` best cells. Output matches Similarity.knnBruteForce
    * (query_id, rk, neighbor_id, cos). */
  def searchTopK(queries: DataFrame, corpus: DataFrame, model: Model,
                 qId: String, cId: String, qVec: String, cVec: String,
                 topK: Int, nProbe: Int): DataFrame =
    searchTopKWhere(queries, corpus, model, qId, cId, qVec, cVec, topK, nProbe,
      predicate = lit(true))

  /** Attribute-FILTERED IVF search — the vector-DB table-stakes compose
    * (predicate + kNN in ONE probe): the row `predicate` applies to the
    * corpus BEFORE cell attach and the probe join, so Catalyst pushes it
    * down to the scan and the candidate set shrinks before any scoring
    * work. The alternative — post-filtering an UNfiltered top-k —
    * returns fewer than k rows (or nothing) exactly when the filter is
    * selective, which is when filtering matters; pre-filtering keeps
    * "top-k among rows satisfying P" semantics at one probe's cost.
    * Hard-negative mining composes here too: `predicate =
    * col("label") =!= queryLabel` generalizes
    * [[Similarity.hardNegatives]]' broadcast path to the IVF index. */
  def searchTopKWhere(queries: DataFrame, corpus: DataFrame, model: Model,
                      qId: String, cId: String, qVec: String, cVec: String,
                      topK: Int, nProbe: Int, predicate: Column): DataFrame = {
    val c = withCell(
      corpus.filter(predicate).select(col(cId).as("neighbor_id"), unit(col(cVec)).as("_cv")),
      col("_cv"), model.centroids, "_cell")
    val q = probedCells(queries, qId, qVec, model.centroids, nProbe)
      .select(col("query_id"), col("_qv"), col("_cell"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    // no broadcast hint: a small probe set broadcasts via AQE anyway; a
    // huge query set must be allowed to shuffle-join on _cell
    c.join(q, Seq("_cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", round(VectorOps.dotProduct(col("_qv"), col("_cv")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topK)
      .select(col("query_id"), col("rk"), col("neighbor_id"), col("cos"))
  }

  // ---- IVF-PQ: residual product quantization --------------------------

  /** IVF-PQ model: coarse quantizer + m sub-quantizers of ks codewords
    * each over cell residuals, flattened `codebook[((j*ks)+c)*dsub+t]`.
    * A corpus vector is stored as (cell:int, codes: m bytes) — at 100 TB
    * the index holds m bytes per vector instead of d doubles. */
  final case class PqModel(coarse: Model, m: Int, ks: Int, codebook: Array[Double]) {
    def dim: Int = coarse.centroids.head.length
    private[operators] def centroidsFlat: Array[Double] = coarse.centroids.flatten
  }

  /** Driver-local Lloyd k-means (deterministic stride init, empty
    * clusters keep their previous center). PQ codebooks are trained on a
    * bounded residual sample — standard practice (FAISS does the same):
    * at any corpus scale the driver sees <= `sample rows` x d doubles. */
  private def kmeansLocal(pts: Array[Array[Double]], ks: Int, iters: Int): Array[Array[Double]] = {
    val n = pts.length
    var centers = Array.tabulate(ks)(c => pts(((c.toLong * n) / ks).toInt).clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(ks)(new Array[Double](pts.head.length))
      val counts = new Array[Long](ks)
      pts.foreach { p =>
        var best = 0; var bestDist = Double.MaxValue
        var c = 0
        while (c < ks) {
          var dist = 0.0; var t = 0
          while (t < p.length) { val df = p(t) - centers(c)(t); dist += df * df; t += 1 }
          if (dist < bestDist) { bestDist = dist; best = c }
          c += 1
        }
        var t = 0
        while (t < p.length) { sums(best)(t) += p(t); t += 1 }
        counts(best) += 1
      }
      centers = centers.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old else sums(c).map(_ / counts(c))
      }
    }
    centers
  }

  /** Train coarse quantizer + per-subspace residual codebooks. The
    * codebook sample is drawn in xxhash64-of-id order (deterministic,
    * linear TakeOrdered — no global sort), capped at `sampleSize`. */
  def trainPq(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
              iters: Int = 3, m: Int = 8, ks: Int = 256,
              sampleSize: Int = 20000, pqIters: Int = 8): PqModel = {
    val coarse = train(corpus, idCol, vecCol, k, iters)
    val d = coarse.centroids.head.length
    require(d % m == 0, s"embedding dim $d must divide by m=$m")
    require(ks <= 256, "ks must fit one byte")
    val dsub = d / m
    val base = corpus.select(col(idCol).as("_id"), unit(col(vecCol)).as("_v"))
    val sample = withCell(base, col("_v"), coarse.centroids, "_cell")
      .orderBy(xxhash64(col("_id"))).limit(sampleSize)
      .select(col("_v"), col("_cell")).collect()
      .map(r => (r.getSeq[Double](0).toArray, r.getInt(1)))
    require(sample.nonEmpty, "cannot train PQ codebooks on an empty corpus")
    val residuals = sample.map { case (v, cell) =>
      Array.tabulate(d)(t => v(t) - coarse.centroids(cell)(t))
    }
    val codebook = new Array[Double](m * ks * dsub)
    for (j <- 0 until m) {
      val sub = residuals.map(r => java.util.Arrays.copyOfRange(r, j * dsub, (j + 1) * dsub))
      val cw = kmeansLocal(sub, ks, pqIters)
      for (c <- 0 until ks; t <- 0 until dsub) codebook(((j * ks) + c) * dsub + t) = cw(c)(t)
    }
    PqModel(coarse, m, ks, codebook)
  }

  /** Encode a corpus against a PQ model: (id, _cell, _codes) with codes
    * as m bytes. Fully narrow (two codegen'd expressions) — the 100 TB
    * index build is a pure scan; persist/write the result once and serve
    * many query batches from it. */
  def encodePq(corpus: DataFrame, idCol: String, vecCol: String, model: PqModel): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge.{column => cc, expression => ee}
    withCell(corpus.select(col(idCol), unit(col(vecCol)).as("_v")), col("_v"),
      model.coarse.centroids, "_cell")
      .withColumn("_codes", cc(graft.functions.PqEncode(
        ee(col("_v")), ee(col("_cell")), model.centroidsFlat, model.codebook, model.m, model.ks)))
      .select(col(idCol), col("_cell"), col("_codes"))
  }

  /** IVF-PQ approximate top-k by asymmetric distance: probe nProbe cells,
    * score candidates as `q . centroid[cell] + LUT-sum(codes)` — m table
    * lookups per candidate, never touching the original vectors. Same
    * output shape as [[searchTopK]] with `score` in place of exact cos.
    * Convenience form that encodes `corpus` inline; a serving path
    * should [[encodePq]] (and persist/write) ONCE and call
    * [[searchEncodedTopKPq]] per query batch — the index build is the
    * expensive scan, the search only reads (cell, m bytes) rows. */
  def searchTopKPq(queries: DataFrame, corpus: DataFrame, model: PqModel,
                   qId: String, cId: String, qVec: String, cVec: String,
                   topK: Int, nProbe: Int): DataFrame =
    searchEncodedTopKPq(queries,
      encodePq(corpus, cId, cVec, model).withColumnRenamed(cId, "neighbor_id"),
      model, qId, qVec, topK, nProbe)

  /** Attribute-FILTERED IVF-PQ search — [[searchTopKWhere]]'s contract
    * on the PQ index: the predicate applies BEFORE encoding/probing, so
    * at serving time a pre-encoded index would carry the attribute
    * column and the filter prunes codes before ADC scoring. Same
    * "top-k among rows satisfying P" semantics; post-filtering an
    * unfiltered top-k under-returns exactly when P is selective. */
  def searchTopKPqWhere(queries: DataFrame, corpus: DataFrame, model: PqModel,
                        qId: String, cId: String, qVec: String, cVec: String,
                        topK: Int, nProbe: Int, predicate: Column): DataFrame =
    searchTopKPq(queries, corpus.filter(predicate), model,
      qId, cId, qVec, cVec, topK, nProbe)

  // ---- model persistence ----------------------------------------------

  /** Write a trained coarse quantizer as parquet under `path` (layout:
    * `path/centroids` = (idx, v)). Doubles round-trip parquet exactly,
    * so a loaded model reproduces searches BIT-IDENTICALLY (IvfSpec).
    * This is the serving-restart story: without it a restart retrains —
    * paying the Lloyd rounds again AND, because init order feeds from
    * data order, potentially producing a model that assigns borderline
    * vectors to different cells than the persisted encoded index, which
    * silently degrades recall. Persist the model WITH the index
    * ([[encodePq]] output) and load both. */
  def saveModel(spark: SparkSession, model: Model, path: String): Unit = {
    import spark.implicits._
    model.centroids.zipWithIndex.toSeq.map { case (c, i) => (i, c.toSeq) }
      .toDF("idx", "v")
      .repartition(1).write.mode("overwrite").parquet(s"$path/centroids")
  }

  def loadModel(spark: SparkSession, path: String): Model = {
    // k rows of dim doubles — a driver-bounded read by construction
    val cents = spark.read.parquet(s"$path/centroids")
      .select(col("idx"), col("v")).orderBy(col("idx"))
      .collect().map(_.getSeq[Double](1).toArray)
    require(cents.nonEmpty, s"no centroids found under $path/centroids")
    Model(cents)
  }

  /** [[saveModel]] plus the PQ side: `path/pq` holds one (m, ks,
    * codebook) row. Same exactness guarantee — ADC lookup tables from a
    * loaded model are bit-identical to the trainer's. */
  def savePqModel(spark: SparkSession, model: PqModel, path: String): Unit = {
    import spark.implicits._
    saveModel(spark, model.coarse, path)
    Seq((model.m, model.ks, model.codebook.toSeq)).toDF("m", "ks", "codebook")
      .repartition(1).write.mode("overwrite").parquet(s"$path/pq")
  }

  /** Persist an [[encodePq]] output — the SERVING INDEX (neighbor_id,
    * _cell, _codes) — under `path/encoded`, next to the model that
    * produced it (the two must travel together: codes are meaningless
    * under any other codebook). Write it LAST: its _SUCCESS is the
    * artifact's completion marker, so a torn earlier write re-encodes
    * instead of serving half an index. At 100 TB this is the whole
    * point of PQ — the encoded index is (id, cell, m bytes) per vector,
    * ~100× smaller than the raw embeddings, scanned per query batch
    * while the raw corpus is never touched again. */
  def saveEncodedPq(spark: SparkSession, encoded: DataFrame, path: String): Unit =
    encoded.write.mode("overwrite").parquet(s"$path/encoded")

  /** The persisted serving index back as a DataFrame — pair with
    * [[loadPqModel]] and [[searchEncodedTopKPq]]. */
  def loadEncodedPq(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/encoded")

  def loadPqModel(spark: SparkSession, path: String): PqModel = {
    val coarse = loadModel(spark, path)
    val r = spark.read.parquet(s"$path/pq")
      .select(col("m"), col("ks"), col("codebook")).collect()
    require(r.length == 1, s"expected one pq-params row under $path/pq, got ${r.length}")
    PqModel(coarse, r(0).getInt(0), r(0).getInt(1), r(0).getSeq[Double](2).toArray)
  }

  /** Search a pre-encoded index: `encoded` is the [[encodePq]] output
    * with the id column named `neighbor_id` — (neighbor_id, _cell,
    * _codes). */
  def searchEncodedTopKPq(queries: DataFrame, encoded: DataFrame, model: PqModel,
                          qId: String, qVec: String, topK: Int, nProbe: Int): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge.{column => cc, expression => ee}
    // LUT is cell-independent (inner-product ADC): nProbe copies per
    // query ride the join, each m*ks doubles — small next to the
    // candidate fan-in they replace
    val q = probedCells(queries, qId, qVec, model.coarse.centroids, nProbe)
      .withColumn("_lut", cc(graft.functions.PqAdcLut(ee(col("_qv")), model.codebook, model.m, model.ks)))
      .select(col("query_id"), col("_cell"), col("_cdot"), col("_lut"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id"))
    encoded.join(q, Seq("_cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("score",
        round(col("_cdot") + cc(graft.functions.PqLookupSum(ee(col("_codes")), ee(col("_lut")))), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topK)
      .select(col("query_id"), col("rk"), col("neighbor_id"), col("score"))
  }
}
