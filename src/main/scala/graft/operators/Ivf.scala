package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * codegen'd DotProduct expression; centroids ride along as array
  * literals (k x dim doubles — fine for coarse quantizers; a 100k-cell
  * quantizer would broadcast a DataFrame instead). */
object Ivf {

  final case class Model(centroids: Array[Array[Double]])

  /** Unit-normalized double vector column (cosine == dot thereafter). */
  private def unit(vecCol: Column): Column =
    VectorOps.l2Normalize(vecCol.cast("array<double>"))

  private def centroidLits(m: Array[Array[Double]]): Seq[Column] =
    m.map(c => typedlit(c.toSeq))

  /** Adds `out` = index of the max-dot centroid (first wins on ties).
    * Deliberately NOT a when-chain argmax: folding `when(d > best, ...)`
    * duplicates the accumulated tree in BOTH branches — exponential
    * expression growth (measured 90+ MiB task binaries at k=16). The
    * scores array is materialized once; array_max/array_position walk it
    * linearly. */
  private def withCell(df: DataFrame, v: Column, cents: Seq[Column], out: String): DataFrame =
    df.withColumn("_cs", array(cents.map(c => VectorOps.dotProduct(v, c)): _*))
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
      val cents = centroidLits(centroids)
      val assigned = withCell(base, col("_v"), cents, "_cell")
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

  /** Approximate top-k cosine neighbors: score only vectors in each
    * query's `nProbe` best cells. Output matches Similarity.knnBruteForce
    * (query_id, rk, neighbor_id, cos). */
  def searchTopK(queries: DataFrame, corpus: DataFrame, model: Model,
                 qId: String, cId: String, qVec: String, cVec: String,
                 topK: Int, nProbe: Int): DataFrame = {
    val cents = centroidLits(model.centroids)
    val c = withCell(
      corpus.select(col(cId).as("neighbor_id"), unit(col(cVec)).as("_cv")),
      col("_cv"), cents, "_cell")
    val qScores = array(cents.map(ct => VectorOps.dotProduct(col("_qv"), ct)): _*)
    val probeW = Window.partitionBy(col("query_id")).orderBy(col("_cdot").desc, col("_cell"))
    val q = queries.select(col(qId).as("query_id"), unit(col(qVec)).as("_qv"))
      .withColumn("_cs", qScores)
      .select(col("query_id"), col("_qv"),
        posexplode(col("_cs")).as(Seq("_cell", "_cdot")))
      .withColumn("_pr", row_number().over(probeW))
      .filter(col("_pr") <= nProbe)
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
}
