package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bradley–Terry strength fitting over pairwise preference comparisons
  * `[EXT]` — the reward-model data-prep step that turns raw annotator
  * judgments ("response A beat response B") into per-item strength
  * scores: P(i beats j) = w_i / (w_i + w_j), fitted by Hunter's MM
  * algorithm (Hunter 2004, "MM algorithms for generalized
  * Bradley-Terry models"):
  *
  *   w_i ← (W_i + λ) / ( Σ_j n_ij / (w_i + w_j)  +  2λ / (w_i + 1) )
  *
  * where W_i = i's total wins, n_ij = games between i and j, and λ
  * adds λ virtual wins AND λ virtual losses against a fixed-strength-1
  * referee — the standard regularization that keeps the iteration
  * finite on items with zero wins (or zero losses) and on weakly
  * connected comparison graphs. Strengths are renormalized to mean 1
  * each step (BT is scale-invariant).
  *
  * Scale shape: the comparisons corpus reduces ONCE to the bounded
  * (item, item, n_ij) game table and W_i win vector (two keyed
  * aggregates with map-side combine); each of the K iterations then
  * joins the game table against the one-row-per-item strength frame —
  * work ∝ observed item PAIRS per iteration, never ∝ raw comparisons.
  * The strength frame is localCheckpoint'd per iteration so K
  * iterations never stack K joins of lineage (the GraphRank loop
  * discipline).
  */
object BradleyTerry {

  /** Fit strengths from (winner, loser) comparison rows. Ties should be
    * dropped (or split into two half-comparisons) by the caller.
    *
    * Output: `item | strength` (double, mean 1 over items), one row per
    * distinct item appearing in any comparison. Deterministic given the
    * comparison multiset.
    *
    * When the reduced game table fits under `maxDriverPairs` (the usual
    * case — items are models/annotators, pairs ≤ items², while the raw
    * comparison corpus can be arbitrarily large), the K iterations run
    * as a driver-side vector sweep over the collected table — BOUNDED
    * metadata, the [[GraphRank]] dispatch pattern — instead of K
    * distributed join rounds; past the cap the distributed loop runs
    * unchanged. Set `maxDriverPairs = 0` to force the distributed path. */
  def fit(comparisons: DataFrame, winnerCol: String, loserCol: String,
          iterations: Int = 10, lambda: Double = 1.0,
          maxDriverPairs: Long = 10000000L): DataFrame = {
    require(iterations > 0, "iterations must be > 0")
    require(lambda > 0, "lambda must be > 0 (the MM update needs the " +
      "regularizer to stay finite on zero-win/zero-loss items)")
    // fail fast on non-integral id columns: a silent cast-to-long of a
    // string/double id column yields NULLs, which would collapse every
    // item into one null key and NPE deep inside the driver-vector sweep
    // instead of pointing at the caller's schema
    for (c <- Seq(winnerCol, loserCol)) {
      import org.apache.spark.sql.types._
      val dt = comparisons.schema(c).dataType
      val integral = dt == ByteType || dt == ShortType ||
        dt == IntegerType || dt == LongType
      require(integral,
        s"column '$c' must be an integral item id, got $dt — " +
          "map string/float ids to longs upstream (e.g. a dictionary join)")
    }
    val wc = col(winnerCol).cast("long")
    val lc = col(loserCol).cast("long")
    val dirs = comparisons.select(wc.as("i"), lc.as("j"))
      .unionAll(comparisons.select(lc.as("i"), wc.as("j")))
    // bounded reductions of the corpus: games per observed pair + wins
    val games = dirs.groupBy(col("i"), col("j"))
      .agg(count(lit(1)).cast("double").as("nij")).persist()
    val wins = comparisons.groupBy(wc.as("i"))
      .agg(count(lit(1)).cast("double").as("wi"))
    if (games.count() <= maxDriverPairs) {
      val out = fitVector(comparisons.sparkSession, games, wins,
        iterations, lambda)
      games.unpersist(false)
      return out
    }
    val items = games.select(col("i")).distinct()
    val nItems = items.count().toDouble
    require(nItems > 0, "no comparisons")
    var w = items
      .join(wins, Seq("i"), "left").na.fill(0.0, Seq("wi"))
      .withColumn("w", lit(1.0))
      .localCheckpoint()
    for (_ <- 1 to iterations) {
      val denom = games
        .join(w.select(col("i"), col("w").as("_wi")), Seq("i"))
        .join(w.select(col("i").as("j"), col("w").as("_wj")), Seq("j"))
        .groupBy(col("i"))
        .agg(sum(col("nij") / (col("_wi") + col("_wj"))).as("den"))
      val updated = w.join(denom, Seq("i"))
        .withColumn("_raw", (col("wi") + lit(lambda)) /
          (col("den") + lit(2.0 * lambda) / (col("w") + lit(1.0))))
      val total = updated.agg(sum(col("_raw"))).collect()(0).getDouble(0)
      w = updated
        .withColumn("w", col("_raw") * nItems / total)
        .select(col("i"), col("wi"), col("w"))
        .localCheckpoint()
    }
    games.unpersist(false)
    w.select(col("i").as("item"), col("w").as("strength"))
  }

  /** Driver-vector MM sweep over the collected (bounded) game table —
    * identical update arithmetic to the distributed loop; edge order is
    * fixed by an (i, j) sort so the floating-point sums are
    * deterministic. */
  private def fitVector(spark: org.apache.spark.sql.SparkSession,
                        games: DataFrame, wins: DataFrame,
                        iterations: Int, lambda: Double): DataFrame = {
    val edges = games.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(e => (e._1, e._2))
    require(edges.nonEmpty, "no comparisons")
    val winsMap = wins.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ids = edges.map(_._1).distinct.sorted
    val idx = ids.zipWithIndex.toMap
    val n = ids.length
    val wiArr = ids.map(winsMap.getOrElse(_, 0.0))
    var w = Array.fill(n)(1.0)
    for (_ <- 1 to iterations) {
      val den = new Array[Double](n)
      for ((i, j, nij) <- edges)
        den(idx(i)) += nij / (w(idx(i)) + w(idx(j)))
      val raw = Array.tabulate(n)(k =>
        (wiArr(k) + lambda) / (den(k) + 2.0 * lambda / (w(k) + 1.0)))
      val total = raw.sum
      w = raw.map(_ * n / total)
    }
    spark.createDataFrame(ids.zip(w).toIndexedSeq)
      .toDF("item", "strength")
  }
}
