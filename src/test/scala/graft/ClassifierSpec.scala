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
}
