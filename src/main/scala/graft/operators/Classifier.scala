package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Model-based quality filtering — the linear-classifier gate every
  * large pretraining pipeline runs after the heuristic gates (the
  * GPT-3 / LLaMA "quality classifier": score each document against a
  * curated positive set, keep by score). Two halves:
  *
  *   - TRAIN: full-batch logistic regression by gradient descent,
  *     where each iteration is ONE distributed aggregation pass —
  *     per-component `avg(residual * x[j])` plus the bias and log-loss
  *     means, all inside whole-stage codegen with map-side partial
  *     aggregation. No parameter server, no driver-side data: the
  *     driver holds only the (dim+1) weights between iterations.
  *     Training sets are labeled SAMPLES (10^5-10^6 docs), so the
  *     per-iteration pass is small; the trained model then scores the
  *     full corpus in a single narrow pass.
  *   - SCORE: `sigmoid(w . x + b)` as a codegen'd column over the
  *     literal weight array — usable in any filter/select, no join,
  *     no UDF, linear at 100 TB.
  *
  * Determinism: from a fixed init the trajectory is deterministic up
  * to float summation order in `avg` (partition layout); specs assert
  * accuracy/loss bounds, and the oracle-gated scoring query uses
  * closed-form weights so both engines compute the identical formula.
  */
object Classifier {

  /** Trained dense logistic-regression model. `lossHistory(i)` is the
    * mean log-loss BEFORE iteration i's update (history(0) = loss at
    * init), so a learning run shows a decreasing sequence. */
  final case class LogRegModel(weights: Array[Double], bias: Double,
                               lossHistory: Array[Double]) {
    def score(vec: Column): Column = scoreDense(weights, bias, vec)
  }

  /** `sigmoid(w . x + b)` over an array column (float or double;
    * floats widen exactly). Codegen: one DotProduct loop + scalar
    * exp — stays inside WholeStageCodegen. */
  def scoreDense(weights: Array[Double], bias: Double, vec: Column): Column = {
    val w = array(weights.map(lit).toSeq: _*)
    val margin = VectorOps.dotProduct(w, vec.cast("array<double>")) + lit(bias)
    lit(1.0) / (lit(1.0) + exp(-margin))
  }

  /** Full-batch gradient-descent logistic regression on `vecCol`
    * (array of float/double, constant dimension) against binary
    * `labelCol` (0/1, any numeric/boolean castable to double).
    *
    * Each iteration: gradient g_j = avg(r * x_j), gb = avg(r) with
    * r = sigmoid(w.x+b) - y, then w -= lr * (g + l2 * w). The input is
    * persisted across iterations and released in `finally`. Fails loud
    * (not silent-drop) on null vectors/labels or ragged dimensions —
    * a quality gate trained on silently-skipped rows is miscalibrated
    * with no symptom.
    *
    * Scale shape: `iters` jobs, each one narrow scan + one partial
    * aggregate of dim+2 doubles per partition — no shuffle of row
    * data, gradient traffic is (partitions x dim) doubles per pass. */
  def trainLogReg(df: DataFrame, vecCol: String, labelCol: String,
                  iters: Int = 100, lr: Double = 1.0,
                  l2: Double = 0.0): LogRegModel = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val data = df.select(col(vecCol).cast("array<double>").as("_x"),
      col(labelCol).cast("double").as("_y"))
      .persist()
    try {
      val dim = data.select(size(col("_x")).as("d")).limit(1).collect() match {
        case Array(r) => r.getInt(0)
        case _ => throw new IllegalArgumentException("empty training set")
      }
      val bad = data.filter(col("_x").isNull || col("_y").isNull ||
        size(col("_x")) =!= dim || !col("_y").isin(0.0, 1.0)).limit(1).count()
      require(bad == 0,
        "training rows must have non-null constant-dimension vectors and 0/1 labels")
      val eps = 1e-12
      var w = new Array[Double](dim)
      var b = 0.0
      val loss = Array.newBuilder[Double]
      for (_ <- 0 until iters) {
        val margin = VectorOps.dotProduct(array(w.map(lit).toSeq: _*), col("_x")) + lit(b)
        val p = lit(1.0) / (lit(1.0) + exp(-margin))
        val scored = data.select(col("_x"), col("_y"), p.as("_p"),
          (p - col("_y")).as("_r"))
        val aggs =
          (0 until dim).map(j => avg(col("_r") * col("_x").getItem(j))) ++ Seq(
            avg(col("_r")),
            avg(-(col("_y") * log(greatest(col("_p"), lit(eps))) +
              (lit(1.0) - col("_y")) * log(greatest(lit(1.0) - col("_p"), lit(eps))))))
        val row = scored.agg(aggs.head, aggs.tail: _*).collect()(0)
        loss += row.getDouble(dim + 1)
        val next = new Array[Double](dim)
        var j = 0
        while (j < dim) {
          next(j) = w(j) - lr * (row.getDouble(j) + l2 * w(j))
          j += 1
        }
        w = next
        b -= lr * row.getDouble(dim)
      }
      LogRegModel(w, b, loss.result())
    } finally data.unpersist()
  }
}
