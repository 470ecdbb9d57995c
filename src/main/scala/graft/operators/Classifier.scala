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
    // referenced-object margin: re-scoring with retrained weights never
    // re-compiles (see AffineMargin)
    val margin = graft.functions.AffineMargin.margin(vec.cast("array<double>"), weights, bias)
    lit(1.0) / (lit(1.0) + exp(-margin))
  }

  /** Trained hashed bag-of-words logistic-regression model (the
    * fastText-shaped TEXT quality/language classifier). `weights` is
    * dense over `buckets` hash buckets (unseen buckets stay 0). */
  final case class HashedModel(weights: Array[Double], bias: Double,
                               lossHistory: Array[Double]) {
    def buckets: Int = weights.length
    /** Margin over a token-array column — ONE narrow codegen pass
      * ([[graft.functions.HashedBagMargin]]); the corpus-scoring path. */
    def margin(tokens: Column): Column =
      graft.functions.HashedBagMargin.margin(tokens, weights, normalize = true) + lit(bias)
    def score(tokens: Column): Column =
      lit(1.0) / (lit(1.0) + exp(-margin(tokens)))
  }

  /** Hashed bag-of-words logistic regression on raw TEXT — the
    * fastText-style classifier gate (language ID, curated-positive
    * quality scoring) trained entirely as DataFrame operations.
    *
    * Features: token t -> bucket `pmod(xxhash64(t), buckets)`, value
    * c_b / total tokens (term frequency). Feature rows (doc, bucket, f)
    * are built ONCE and checkpointed; each GD iteration is then
    *   margin:   feat join (tiny nonzero-weight table — AQE runtime-
    *             broadcasts) -> groupBy doc,
    *   residual: join labels, one scalar aggregate for bias/loss,
    *   gradient: residual join feat -> groupBy bucket -> collect
    *             (<= buckets rows — bounded by the parameter, the Ivf
    *             centroid-collect pattern).
    * The driver holds only the weight array between iterations. Train
    * on a labeled SAMPLE (the published classifiers use 10^5-10^6
    * docs); corpus-wide scoring is `model.score(tokens)` — a narrow
    * codegen pass with exact bucket parity (ClassifierSpec asserts
    * expression == DataFrame bucketing on randomized tokens).
    *
    * Same fail-loud contract as [[trainLogReg]]: null labels/token
    * arrays or non-binary labels throw up front. */
  def trainHashedText(df: DataFrame, textCol: String, labelCol: String,
                      buckets: Int = 1 << 15, iters: Int = 20,
                      lr: Double = 1.0, l2: Double = 0.0,
                      tokenizer: Column => Column = TextAnalysis.tokens): HashedModel = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(buckets >= 2 && buckets <= (1 << 22),
      s"buckets must be in [2, 2^22], got $buckets")
    val spark = df.sparkSession
    import spark.implicits._
    val base = graft.core.Checkpoint.materialize(
      df.select(monotonically_increasing_id().as("_d"),
        col(labelCol).cast("double").as("_y"),
        tokenizer(col(textCol)).as("_toks")))
    val bad = base.filter(col("_y").isNull || !col("_y").isin(0.0, 1.0) ||
      col("_toks").isNull).limit(1).count()
    require(bad == 0,
      "training rows must have non-null token arrays and 0/1 labels")
    val n = base.count()
    require(n > 0, "empty training set")
    val tok = base
      .select(col("_d"), explode(col("_toks")).as("_t"))
      .filter(col("_t").isNotNull)
      .select(col("_d"), pmod(xxhash64(col("_t")), lit(buckets.toLong)).cast("int").as("_b"))
    val tot = tok.groupBy("_d").agg(count(lit(1)).as("_n"))
    val feat = graft.core.Checkpoint.materialize(
      tok.groupBy("_d", "_b").agg(count(lit(1)).as("_c"))
        .join(tot, "_d")
        .select(col("_d"), col("_b"), (col("_c").cast("double") / col("_n")).as("_f")))
    val docs = base.select(col("_d"), col("_y"))
    val eps = 1e-12
    var w = new Array[Double](buckets)
    var b = 0.0
    val loss = Array.newBuilder[Double]
    for (_ <- 0 until iters) {
      val nz = w.iterator.zipWithIndex.filter(_._1 != 0.0)
        .map { case (v, j) => (j, v) }.toSeq
      val margins =
        if (nz.isEmpty) docs.select(col("_d"), col("_y"), lit(0.0).as("_m"))
        else {
          val wDf = nz.toDF("_b", "_w")
          val m = feat.join(wDf, Seq("_b"))
            .groupBy("_d").agg(sum(col("_f") * col("_w")).as("_m"))
          docs.join(m, Seq("_d"), "left")
            .select(col("_d"), col("_y"), coalesce(col("_m"), lit(0.0)).as("_m"))
        }
      val scored = margins.select(col("_d"), col("_y"),
        (lit(1.0) / (lit(1.0) + exp(-(col("_m") + lit(b))))).as("_p"))
        .withColumn("_r", col("_p") - col("_y"))
      val head = scored.agg(avg(col("_r")),
        avg(-(col("_y") * log(greatest(col("_p"), lit(eps))) +
          (lit(1.0) - col("_y")) * log(greatest(lit(1.0) - col("_p"), lit(eps)))))).collect()(0)
      loss += head.getDouble(1)
      val grad = scored.select(col("_d"), col("_r")).join(feat, Seq("_d"))
        .groupBy("_b").agg((sum(col("_r") * col("_f")) / n.toDouble).as("_g"))
        .as[(Int, Double)].collect()
      val next = w.clone()
      var j = 0
      while (j < next.length) {
        if (next(j) != 0.0 && l2 != 0.0) next(j) -= lr * l2 * next(j)
        j += 1
      }
      grad.foreach { case (bk, g) => next(bk) -= lr * g }
      w = next
      b -= lr * head.getDouble(0)
    }
    HashedModel(w, b, loss.result())
  }

  // ---- model persistence (the Ivf.saveModel artifact shape) -------------

  /** Persist a [[LogRegModel]] under `path/logreg`: one row of
    * (weights, bias, loss_history) — dim+1 doubles plus the training
    * curve, bounded by the feature dimension. Closes the train-per-job
    * gap: the published pipelines train the quality classifier ONCE on
    * the curated sample and score every corpus snapshot with the same
    * weights; a loaded model's scores are bit-identical to the
    * trainer's (same literal weight array → same codegen). */
  def saveLogReg(spark: org.apache.spark.sql.SparkSession,
                 model: LogRegModel, path: String): Unit = {
    import spark.implicits._
    Seq((model.weights.toSeq, model.bias, model.lossHistory.toSeq))
      .toDF("weights", "bias", "loss_history").repartition(1)
      .write.mode("overwrite").parquet(s"$path/logreg")
  }

  def loadLogReg(spark: org.apache.spark.sql.SparkSession,
                 path: String): LogRegModel = {
    val r = spark.read.parquet(s"$path/logreg")
      .select(col("weights"), col("bias"), col("loss_history")).collect()
    require(r.length == 1, s"expected one model row under $path/logreg, got ${r.length}")
    LogRegModel(r(0).getSeq[Double](0).toArray, r(0).getDouble(1),
      r(0).getSeq[Double](2).toArray)
  }

  /** Persist a [[HashedModel]] under `path/hashed`: SPARSE (idx, w)
    * rows for the nonzero buckets plus a one-row meta file carrying
    * (buckets, bias, loss_history) — a 2^22-bucket model with 50k seen
    * tokens writes 50k rows, not 4M zeros. */
  def saveHashed(spark: org.apache.spark.sql.SparkSession,
                 model: HashedModel, path: String): Unit = {
    import spark.implicits._
    Seq((model.buckets, model.bias, model.lossHistory.toSeq))
      .toDF("buckets", "bias", "loss_history").repartition(1)
      .write.mode("overwrite").parquet(s"$path/hashed/meta")
    model.weights.iterator.zipWithIndex.filter(_._1 != 0.0)
      .map { case (w, i) => (i, w) }.toSeq
      .toDF("idx", "w").repartition(1)
      .write.mode("overwrite").parquet(s"$path/hashed/weights")
  }

  def loadHashed(spark: org.apache.spark.sql.SparkSession,
                 path: String): HashedModel = {
    val m = spark.read.parquet(s"$path/hashed/meta")
      .select(col("buckets"), col("bias"), col("loss_history")).collect()
    require(m.length == 1, s"expected one meta row under $path/hashed/meta, got ${m.length}")
    val w = new Array[Double](m(0).getInt(0))
    spark.read.parquet(s"$path/hashed/weights")
      .select(col("idx"), col("w")).collect()
      .foreach(r => w(r.getInt(0)) = r.getDouble(1))
    HashedModel(w, m(0).getDouble(1), m(0).getSeq[Double](2).toArray)
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
    * Scale shape: ONE single-stage job per iteration — a
    * `treeAggregate` (MLlib's own gradient pattern) folds each
    * partition to dim+2 doubles and tree-combines; no exchange, no
    * per-iteration Catalyst re-analysis, gradient traffic is
    * (partitions x dim) doubles per pass. (The first cut aggregated
    * through a dim+2-column SQL agg: correct, but every step paid plan
    * analysis + a two-stage job, ~0.3 s of fixed latency per iteration
    * that dwarfed the scan on small data.) */
  def trainLogReg(df: DataFrame, vecCol: String, labelCol: String,
                  iters: Int = 100, lr: Double = 1.0,
                  l2: Double = 0.0): LogRegModel = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val data = df.select(col(vecCol).cast("array<double>").as("_x"),
      col(labelCol).cast("double").as("_y"))
    val dim = data.select(size(col("_x")).as("d")).limit(1).collect() match {
      case Array(r) => r.getInt(0)
      case _ => throw new IllegalArgumentException("empty training set")
    }
    val bad = data.filter(col("_x").isNull || col("_y").isNull ||
      size(col("_x")) =!= dim || !col("_y").isin(0.0, 1.0)).limit(1).count()
    require(bad == 0,
      "training rows must have non-null constant-dimension vectors and 0/1 labels")
    // primitive-array rows persist once; every iteration re-reads THIS,
    // never the source scan
    val rdd = data.queryExecution.toRdd
      .map { r => (r.getArray(0).toDoubleArray(), r.getDouble(1)) }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val eps = 1e-12
      var w = new Array[Double](dim)
      var b = 0.0
      val loss = Array.newBuilder[Double]
      for (_ <- 0 until iters) {
        val wLoc = w; val bLoc = b; val d = dim // stable closure captures
        // acc = [grad_0..grad_{d-1}, grad_b, loss_sum, n]
        val acc = rdd.treeAggregate(new Array[Double](d + 3))(
          seqOp = (a, xy) => {
            val (x, y) = xy
            var m = bLoc
            var j = 0
            while (j < d) { m += wLoc(j) * x(j); j += 1 }
            val p = 1.0 / (1.0 + math.exp(-m))
            val r = p - y
            j = 0
            while (j < d) { a(j) += r * x(j); j += 1 }
            a(d) += r
            a(d + 1) -= y * math.log(math.max(p, eps)) +
              (1.0 - y) * math.log(math.max(1.0 - p, eps))
            a(d + 2) += 1.0
            a
          },
          combOp = (a, c) => {
            var j = 0
            while (j < a.length) { a(j) += c(j); j += 1 }
            a
          })
        val n = acc(d + 2)
        loss += acc(d + 1) / n
        val next = new Array[Double](dim)
        var j = 0
        while (j < dim) {
          next(j) = w(j) - lr * (acc(j) / n + l2 * w(j))
          j += 1
        }
        w = next
        b -= lr * acc(d) / n
      }
      LogRegModel(w, b, loss.result())
    } finally rdd.unpersist(blocking = false)
  }

  // ---- evaluation reports --------------------------------------------

  /** Calibration report — the reliability diagram every model-gated
    * curation pipeline reads before trusting classifier scores as keep
    * probabilities: scores in [0,1] bin into `bins` equal-width buckets,
    * each emitting its mean predicted score vs the empirical positive
    * rate; the per-row |gap| weighted by bucket mass is the Expected
    * Calibration Error (Naeini et al. 2015), attached to every row as
    * the whole-job scalar. Scores exactly 1.0 land in the TOP bucket
    * (the standard closed-last-interval convention).
    *
    * Output: `bucket | n | mean_score | pos_rate | gap` + `ece`
    * (doubles at 6 dp; empty buckets are absent).
    *
    * Scale shape: ONE groupBy on the bucket index (bins-bounded
    * aggregate with map-side combine) + a broadcast of the bins-row
    * total for the ECE — nothing corpus-sized shuffles. */
  def calibrationReport(df: DataFrame, scoreCol: String, labelCol: String,
                        bins: Int = 10): DataFrame = {
    require(bins > 0, "bins must be > 0")
    val b = least(floor(col(scoreCol) * bins).cast("long"), lit(bins - 1L))
    val agg = df.select(b.as("bucket"), col(scoreCol).cast("double").as("_s"),
        col(labelCol).cast("double").as("_y"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), avg(col("_s")).as("_ms"), avg(col("_y")).as("_pr"))
    val tot = agg.agg(sum(col("n")).as("_tot"),
      sum(abs(col("_ms") - col("_pr")) * col("n")).as("_werr"))
    agg.crossJoin(broadcast(tot))
      .select(col("bucket"), col("n"),
        Agreement.noNegZero(round(col("_ms"), 6)).as("mean_score"),
        Agreement.noNegZero(round(col("_pr"), 6)).as("pos_rate"),
        Agreement.noNegZero(round(abs(col("_ms") - col("_pr")), 6)).as("gap"),
        Agreement.noNegZero(round(col("_werr") / col("_tot"), 6)).as("ece"))
  }

  /** Multi-class confusion report: per (gold, predicted) cell counts
    * plus per-gold-class precision/recall/F1 — the eval table a
    * label-model or langid gate ships with. Per-class metrics join back
    * onto the cells so one frame carries both views (precision repeats
    * across a predicted class's cells by construction).
    *
    * Output: `gold | pred | n | recall | precision | f1` (6 dp; a
    * class never predicted has precision NULL — honest, not 0).
    *
    * Scale shape: one (gold, pred) groupBy (classes²-bounded) + two
    * class-bounded re-aggregates broadcast back. */
  def confusionReport(df: DataFrame, goldCol: String, predCol: String): DataFrame = {
    val cells = df.select(col(goldCol).as("gold"), col(predCol).as("pred"))
      .groupBy(col("gold"), col("pred")).agg(count(lit(1)).as("n"))
    // per-CLASS metric table: recall(g) = tp/ng, precision(g) = tp/np
    // (np = rows PREDICTED as g; NULL when g is never predicted)
    val ng = cells.groupBy(col("gold")).agg(sum(col("n")).as("_ng"))
    val np = cells.groupBy(col("pred")).agg(sum(col("n")).as("_np"))
      .withColumnRenamed("pred", "gold")
    val tp = cells.filter(col("gold") === col("pred"))
      .select(col("gold"), col("n").as("_tp"))
    val metrics = ng.join(np, Seq("gold"), "left").join(tp, Seq("gold"), "left")
      .withColumn("_tpz", coalesce(col("_tp"), lit(0L)).cast("double"))
      .select(col("gold"),
        round(col("_tpz") / col("_ng"), 6).as("recall"),
        round(col("_tpz") / col("_np"), 6).as("precision"),
        round(when(col("_tpz") > 0,
          lit(2.0) * col("_tpz") / (col("_ng") + col("_np")))
          .otherwise(when(col("_np").isNull, null).otherwise(0.0)), 6).as("f1"))
    cells.join(broadcast(metrics), Seq("gold"))
      .select(col("gold"), col("pred"), col("n"),
        col("recall"), col("precision"), col("f1"))
  }
}
