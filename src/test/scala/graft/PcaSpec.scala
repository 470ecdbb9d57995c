package graft

import graft.operators.Pca
import org.apache.spark.sql.functions._
import scala.util.Random

class PcaSpec extends SparkSpec {
  import spark.implicits._

  private def clustered(n: Int, d: Int, seed: Int): Seq[(Long, Array[Float])] = {
    val rnd = new Random(seed)
    val centers = Array.fill(4)(Array.fill(d)(rnd.nextGaussian() * 2))
    (0 until n).map { id =>
      val c = centers(id % 4)
      (id.toLong, Array.tabulate(d)(j => (c(j) + 0.2 * rnd.nextGaussian()).toFloat))
    }
  }

  test("fit: eigenpairs satisfy C v = lambda v, orthonormal, descending") {
    val data = clustered(400, 32, seed = 7)
    val df = data.toDF("id", "v")
    val m = Pca.fit(df, "v", dim = 32, k = 6)
    // rebuild the covariance on the driver for the residual check
    val n = data.size
    val mean = Array.tabulate(32)(j => data.map(_._2(j).toDouble).sum / n)
    val c = Array.tabulate(32, 32) { (i, j) =>
      data.map(r => (r._2(i) - mean(i)) * (r._2(j) - mean(j))).sum / n
    }
    assert(m.eigenvalues.zip(m.eigenvalues.tail).forall { case (a, b) => a >= b - 1e-9 })
    for (r <- 0 until 6) {
      val v = Array.tabulate(32)(j => m.components(r * 32 + j))
      // orthonormal rows
      assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-9)
      for (r2 <- r + 1 until 6) {
        val w = Array.tabulate(32)(j => m.components(r2 * 32 + j))
        assert(math.abs(v.zip(w).map(p => p._1 * p._2).sum) < 1e-9)
      }
      // residual ||Cv - lambda v||
      val cv = Array.tabulate(32)(i => (0 until 32).map(j => c(i)(j) * v(j)).sum)
      val res = math.sqrt(cv.zip(v).map { case (x, vi) =>
        val dd = x - m.eigenvalues(r) * vi; dd * dd }.sum)
      assert(res < 1e-6, s"component $r residual $res")
      // model mean matches
      assert(mean.zip(m.mean).forall { case (a, b) => math.abs(a - b) < 1e-9 })
    }
    // 4 well-separated clusters live in a 3-dim affine subspace + noise:
    // top-3 eigenvalues must dominate
    val top3 = m.eigenvalues.take(3).sum
    val trace = (0 until 32).map(i => c(i)(i)).sum
    assert(top3 / trace > 0.8, s"top-3 variance share ${top3 / trace}")
  }

  test("transformColumn equals the driver-side W(x - mu)") {
    val data = clustered(100, 16, seed = 13)
    val df = data.toDF("id", "v")
    val m = Pca.fit(df, "v", dim = 16, k = 4)
    val got = df.select(col("id"), Pca.transformColumn(col("v"), m).as("p"))
      .as[(Long, Seq[Double])].collect().toMap
    data.foreach { case (id, v) =>
      val want = Array.tabulate(4)(r =>
        (0 until 16).map(j => m.components(r * 16 + j) * (v(j) - m.mean(j))).sum)
      got(id).zip(want).foreach { case (g, w) =>
        assert(math.abs(g - w) < 1e-9, s"id=$id")
      }
    }
  }

  test("projection to k=4 keeps cluster neighbourhoods intact") {
    val data = clustered(240, 48, seed = 29)
    val df = data.toDF("id", "embedding").persist()
    val proj = Pca.fitTransform(df, "embedding", "p", dim = 48, k = 4)
      .select(col("id"), col("p").cast("array<float>").as("embedding"))
    val q = proj.filter(col("id") < 30).select(col("id").as("qid"), col("embedding").as("qv"))
    val nn = graft.operators.Similarity
      .knnBruteForce(q, proj, "qid", "id", "qv", "embedding", k = 10)
      .select(col("query_id"), col("neighbor_id")).as[(Long, Long)].collect()
    df.unpersist()
    val byQ = nn.groupBy(_._1)
    val sameCluster = byQ.toSeq.map { case (qid, v) =>
      v.count { case (_, n) => n % 4 == qid % 4 } / 10.0 }.sum / byQ.size
    assert(sameCluster >= 0.95, s"same-cluster fraction $sameCluster")
  }

  test("guards: oversize dim, tiny corpus, bad k") {
    val df = Seq((1L, Array.fill(8)(1f))).toDF("id", "v")
    intercept[IllegalArgumentException](Pca.fit(df, "v", dim = 8, k = 9))
    intercept[IllegalArgumentException](Pca.fit(df, "v", dim = 5000, k = 2))
    intercept[IllegalArgumentException](Pca.fit(df, "v", dim = 8, k = 2)) // n=1
  }

  test("fit fails loud on a null vector, naming the column") {
    val df = Seq((1L, Array.fill(8)(1.0f)), (2L, null.asInstanceOf[Array[Float]]))
      .toDF("id", "v")
    val e = intercept[Exception](Pca.fit(df, "v", dim = 8, k = 2))
    def chain(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ++ chain(t.getCause)
    assert(chain(e).exists(m => m.contains("null vector") && m.contains("'v'")),
      chain(e).mkString(" | "))
  }

  test("transform fails loud when the vector length differs from the fitted dim") {
    val data = clustered(50, 8, seed = 11)
    val df = data.toDF("id", "v")
    val m = Pca.fit(df, "v", dim = 8, k = 2)
    val bad = Seq((1L, Array.fill(5)(1.0f))).toDF("id", "v")
    val e = intercept[Exception](
      bad.select(Pca.transformColumn(col("v"), m)).collect())
    def chain(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ++ chain(t.getCause)
    assert(chain(e).exists(_.contains("graft_affine_dots")), chain(e).mkString(" | "))
  }

}
