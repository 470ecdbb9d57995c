package graft

import graft.operators.Classifier
import org.apache.spark.sql.functions._
import scala.util.Random

/** Logistic-regression quality classifier: learning on separable data,
  * loss descent, regularization shrinkage, codegen scoring parity, and
  * the fail-loud input contract. */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic linearly-separable-with-margin corpus in R^4:
    * y = 1 iff x0 + x1 - x2 - x3 > 0.5 (no points inside |margin|<0.5). */
  private def separable(n: Int, seed: Int): Seq[(Array[Float], Int)] = {
    val rnd = new Random(seed)
    (0 until n).flatMap { _ =>
      val x = Array.fill(4)((rnd.nextDouble() * 4 - 2).toFloat)
      val m = x(0) + x(1) - x(2) - x(3)
      if (math.abs(m) < 0.5) None else Some((x, if (m > 0) 1 else 0))
    }
  }

  test("trainLogReg separates a margin dataset and loss decreases") {
    val data = separable(400, seed = 7)
    val df = data.toDF("x", "y")
    val model = Classifier.trainLogReg(df, "x", "y", iters = 120, lr = 1.0)
    // loss at init is ln(2); the end of a learning run must sit well below
    assert(model.lossHistory.head > 0.6 && model.lossHistory.head < 0.75)
    assert(model.lossHistory.last < 0.2,
      s"final loss ${model.lossHistory.last} too high")
    assert(model.lossHistory.last < model.lossHistory.head)
    val acc = df.select(avg(
        ((model.score(col("x")) >= 0.5).cast("int") === col("y")).cast("double")))
      .as[Double].collect()(0)
    assert(acc >= 0.97, s"train accuracy $acc below 0.97")
  }

  test("l2 regularization shrinks the weight norm") {
    val df = separable(300, seed = 11).toDF("x", "y")
    def norm(w: Array[Double]) = math.sqrt(w.map(v => v * v).sum)
    val free = Classifier.trainLogReg(df, "x", "y", iters = 60, lr = 1.0)
    val reg = Classifier.trainLogReg(df, "x", "y", iters = 60, lr = 1.0, l2 = 0.3)
    assert(norm(reg.weights) < norm(free.weights))
  }

  test("scoreDense equals the hand-computed sigmoid") {
    val w = Array(0.5, -1.0, 2.0)
    val df = Seq((1L, Array(1.0f, 2.0f, 0.25f))).toDF("id", "x")
    val got = df.select(Classifier.scoreDense(w, 0.3, col("x"))).as[Double].collect()(0)
    val margin = 0.5 * 1.0 - 1.0 * 2.0 + 2.0 * 0.25 + 0.3
    assert(math.abs(got - 1.0 / (1.0 + math.exp(-margin))) < 1e-12)
  }

  test("HashedBagMargin buckets match the DataFrame training side exactly") {
    val buckets = 64
    // identity weights: margin of a single-token bag (unnormalized)
    // IS the bucket id — any hash/floorMod drift from pmod(xxhash64)
    // shows as a mismatch
    val w = Array.tabulate(buckets)(_.toDouble)
    val rnd = new Random(3)
    val toks = (0 until 200).map(i =>
      (i.toLong, rnd.alphanumeric.take(1 + rnd.nextInt(12)).mkString))
    val df = toks.toDF("id", "t")
    val got = df.select(col("id"),
      graft.functions.HashedBagMargin.margin(array(col("t")), w, normalize = false).as("m"),
      pmod(xxhash64(col("t")), lit(buckets.toLong)).cast("double").as("b"))
    assert(got.filter(col("m") =!= col("b")).count() === 0)
  }

  test("trainHashedText separates planted vocabularies and scores narrowly") {
    val pos = Vector("alpha", "bravo", "charlie", "delta", "echo", "foxtrot")
    val neg = Vector("uno", "dos", "tres", "cuatro", "cinco", "seis")
    val rnd = new Random(13)
    val docs = (0 until 240).map { i =>
      val v = if (i % 2 == 0) pos else neg
      val text = Seq.fill(4 + rnd.nextInt(8))(v(rnd.nextInt(v.size))).mkString(" ")
      (i.toLong, text, i % 2)
    }
    val df = docs.toDF("id", "text", "y")
    val model = Classifier.trainHashedText(df, "text", "y",
      buckets = 1 << 10, iters = 30, lr = 4.0)
    assert(model.lossHistory.last < 0.2 &&
      model.lossHistory.last < model.lossHistory.head)
    val scored = df.select(col("y"),
      model.score(graft.operators.TextAnalysis.tokens(col("text"))).as("s"))
    val acc = scored.select(avg(((col("s") >= 0.5).cast("int") === col("y")).cast("double")))
      .as[Double].collect()(0)
    assert(acc >= 0.95, s"train accuracy $acc below 0.95")
    // the narrow expression margin == the join-based margin it trained on
    val toks = graft.operators.TextAnalysis.tokens(col("text"))
    val joinMargin = df
      .select(col("id"), explode(toks).as("_t"), size(toks).as("_n"))
      .select(col("id"), pmod(xxhash64(col("_t")), lit(model.buckets.toLong)).cast("int").as("_b"), col("_n"))
      .groupBy(col("id"), col("_n")).agg(collect_list(col("_b")).as("_bs"))
      .as[(Long, Int, Seq[Int])].collect()
      .map { case (id, n, bs) => id -> (bs.map(model.weights).sum / n + model.bias) }
      .toMap
    val exprMargin = df.select(col("id"), model.margin(toks).as("m"))
      .as[(Long, Double)].collect().toMap
    exprMargin.foreach { case (id, m) =>
      assert(math.abs(m - joinMargin(id)) < 1e-9, s"doc $id margin drift")
    }
  }

  test("trainLogReg fails loud on ragged dimensions, nulls, non-binary labels") {
    val ragged = Seq((Array(1.0f, 2.0f), 1), (Array(1.0f), 0)).toDF("x", "y")
    intercept[IllegalArgumentException] {
      Classifier.trainLogReg(ragged, "x", "y", iters = 1)
    }
    val nullVec = Seq((Some(Array(1.0f)), 1), (None, 0)).toDF("x", "y")
    intercept[IllegalArgumentException] {
      Classifier.trainLogReg(nullVec, "x", "y", iters = 1)
    }
    val badLabel = Seq((Array(1.0f), 2), (Array(2.0f), 0)).toDF("x", "y")
    intercept[IllegalArgumentException] {
      Classifier.trainLogReg(badLabel, "x", "y", iters = 1)
    }
  }

  test("saveLogReg/loadLogReg round-trip: loaded model scores bit-identically") {
    val df = separable(200, seed = 11).toDF("x", "y")
    val model = Classifier.trainLogReg(df, "x", "y", iters = 40, lr = 1.0)
    val path = java.nio.file.Files.createTempDirectory("graft_lr_rt").toString
    Classifier.saveLogReg(spark, model, path)
    val loaded = Classifier.loadLogReg(spark, path)
    assert(loaded.weights.toSeq === model.weights.toSeq)
    assert(loaded.bias === model.bias)
    assert(loaded.lossHistory.toSeq === model.lossHistory.toSeq)
    val fresh = df.select(model.score(col("x"))).as[Double].collect().toSeq
    val again = df.select(loaded.score(col("x"))).as[Double].collect().toSeq
    assert(fresh === again, "loaded-model scores differ from the trainer's")
  }

  test("saveHashed/loadHashed round-trip: sparse artifact, identical scoring") {
    val rows = (0 until 60).map { i =>
      if (i % 2 == 0) (s"good clean prose number $i", 1)
      else (s"zz$i spammy junk zz$i", 0)
    }
    val df = rows.toDF("text", "y")
    val model = Classifier.trainHashedText(df, "text", "y",
      buckets = 1 << 10, iters = 6, lr = 2.0)
    val path = java.nio.file.Files.createTempDirectory("graft_hm_rt").toString
    Classifier.saveHashed(spark, model, path)
    val loaded = Classifier.loadHashed(spark, path)
    assert(loaded.buckets === model.buckets)
    assert(loaded.weights.toSeq === model.weights.toSeq,
      "sparse (idx, w) rows must reconstruct the DENSE weight array exactly")
    val toks = graft.operators.TextAnalysis.tokens(col("text"))
    val fresh = df.select(model.score(toks)).as[Double].collect().toSeq
    val again = df.select(loaded.score(toks)).as[Double].collect().toSeq
    assert(fresh === again, "loaded-model scores differ from the trainer's")
  }

  test("calibrationReport: hand-computed bins, gaps, ECE; score 1.0 joins " +
    "the top bucket") {
    // bucket 0: scores .05/.05, 0 positives -> gap .05
    // bucket 9: scores .95/1.0, both positive -> gap |0.975-1| = .025
    val d = Seq((0.05, 0), (0.05, 0), (0.95, 1), (1.0, 1))
      .toDF("score", "label")
    val out = Classifier.calibrationReport(d, "score", "label", bins = 10)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(out.map(t => (t._1, t._2)).toSeq === Seq((0L, 2L), (9L, 2L)))
    assert(out(0)._3 === 0.05 && out(0)._4 === 0.0 && out(0)._5 === 0.05)
    assert(out(1)._3 === 0.975 && out(1)._4 === 1.0 && out(1)._5 === 0.025)
    // ECE = (2*.05 + 2*.025)/4 = 0.0375, attached to every row
    assert(out.forall(_._6 === 0.0375))
  }

  test("confusionReport: per-gold recall/precision/F1; a never-predicted " +
    "class has NULL precision and F1, not fake zeros") {
    // gold a: 3 rows, 2 predicted a, 1 predicted b; gold b: 1 row -> b;
    // gold c: 1 row predicted a (c is never predicted)
    val d = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"), ("c", "a"))
      .toDF("gold", "pred")
    val out = Classifier.confusionReport(d, "gold", "pred")
      .orderBy("gold", "pred").collect()
    val byKey = out.map(r => (r.getString(0), r.getString(1)) ->
      (r.getLong(2), r.getDouble(3), if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)))).toMap
    // recall(a)=2/3, precision(a)=2/3 (3 predicted a), f1 = 2*2/(3+3)
    assert(byKey(("a", "a"))._1 === 2L)
    assert(math.abs(byKey(("a", "a"))._2 - 0.666667) < 1e-6)
    assert(math.abs(byKey(("a", "a"))._3.get - 0.666667) < 1e-6)
    assert(math.abs(byKey(("a", "a"))._4.get - 0.666667) < 1e-6)
    // metrics repeat on every cell of the same gold class
    assert(byKey(("a", "b")) === byKey(("a", "a")).copy(_1 = 1L))
    // recall(b)=1, precision(b)=1/2 (two predicted b), f1=2*1/(1+2)
    assert(byKey(("b", "b"))._2 === 1.0 &&
      byKey(("b", "b"))._3.get === 0.5 &&
      math.abs(byKey(("b", "b"))._4.get - 0.666667) < 1e-6)
    // gold c never predicted: recall 0, precision NULL, f1 NULL
    assert(byKey(("c", "a"))._2 === 0.0 &&
      byKey(("c", "a"))._3.isEmpty && byKey(("c", "a"))._4.isEmpty)
  }
}
