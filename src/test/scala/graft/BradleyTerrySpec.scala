package graft

import graft.operators.BradleyTerry

class BradleyTerrySpec extends SparkSpec {
  import spark.implicits._

  private def fit(pairs: Seq[(Long, Long)], iters: Int = 10): Map[Long, Double] =
    BradleyTerry.fit(pairs.toDF("winner", "loser"), "winner", "loser", iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("a 3:1 head-to-head ranks the winner above the loser, mean 1") {
    val w = fit(Seq((1L, 2L), (1L, 2L), (1L, 2L), (2L, 1L)))
    assert(w(1L) > w(2L))
    assert(math.abs(w.values.sum / 2.0 - 1.0) < 1e-9, "strengths renormalize to mean 1")
    // the fitted win probability should sit near the observed 3/4
    val p = w(1L) / (w(1L) + w(2L))
    assert(p > 0.6 && p < 0.8, s"p=$p (lambda pulls the MLE 0.75 toward 1/2)")
  }

  test("a transitive tournament recovers the total order") {
    // a beats b twice, b beats c twice, a beats c twice
    val w = fit(Seq((1L, 2L), (1L, 2L), (2L, 3L), (2L, 3L), (1L, 3L), (1L, 3L)))
    assert(w(1L) > w(2L) && w(2L) > w(3L))
  }

  test("zero-win items stay finite and rank last") {
    val w = fit(Seq((1L, 2L), (1L, 2L), (1L, 2L)))
    assert(w(2L) > 0.0 && java.lang.Double.isFinite(w(2L)))
    assert(w(1L) > w(2L))
  }

  test("driver-vector and distributed paths agree to 8 dp") {
    val pairs = (0 until 80).map(k => (k % 5).toLong -> ((k % 4) + 5).toLong)
    val d = pairs.toDF("winner", "loser")
    def rounded(maxDriverPairs: Long) =
      BradleyTerry.fit(d, "winner", "loser", maxDriverPairs = maxDriverPairs)
        .collect().map(r => r.getLong(0) -> math.rint(r.getDouble(1) * 1e8)).toMap
    assert(rounded(10000000L) === rounded(0L))
  }

  test("result is independent of input partitioning") {
    val pairs = (0 until 60).map(k => (k % 4).toLong -> ((k % 3) + 4).toLong)
    val d1 = pairs.toDF("winner", "loser").repartition(1)
    val d13 = pairs.toDF("winner", "loser").repartition(13)
    val r1 = BradleyTerry.fit(d1, "winner", "loser").collect()
      .map(r => r.getLong(0) -> math.rint(r.getDouble(1) * 1e8)).toMap
    val r13 = BradleyTerry.fit(d13, "winner", "loser").collect()
      .map(r => r.getLong(0) -> math.rint(r.getDouble(1) * 1e8)).toMap
    assert(r1 === r13)
  }
}
