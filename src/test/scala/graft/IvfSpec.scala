package graft

import graft.operators.{Ivf, Similarity}
import scala.util.Random

class IvfSpec extends SparkSpec {
  import spark.implicits._

  test("IVF search achieves high recall on clustered data with few probes") {
    val rnd = new Random(41)
    // 8 well-separated Gaussian blobs of 50 vectors each (dim 16)
    val centers = Array.fill(8)(Array.fill(16)(rnd.nextGaussian() * 5))
    val corpus = (0 until 400).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.3).toFloat))
    }
    val df = corpus.toDF("vec_id", "embedding")
    val queries = df.filter($"vec_id" < 8)

    val model = Ivf.train(df, "vec_id", "embedding", k = 8, iters = 3)
    assert(model.centroids.length == 8)

    val ivf = Ivf.searchTopK(queries, df, model, "vec_id", "vec_id",
        "embedding", "embedding", topK = 5, nProbe = 2)
      .as[(Long, Int, Long, Double)].collect()
    val brute = Similarity.knnBruteForce(queries, df, "vec_id", "vec_id",
        "embedding", "embedding", k = 5)
      .as[(Long, Int, Long, Double)].collect()

    val ivfSets = ivf.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val bruteSets = brute.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val recalls = bruteSets.map { case (q, want) =>
      ivfSets.getOrElse(q, Set.empty).intersect(want).size.toDouble / want.size
    }
    val meanRecall = recalls.sum / recalls.size
    assert(meanRecall >= 0.9, s"mean recall@5 = $meanRecall")
    // every query returns exactly topK ranked rows
    ivf.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1 to 5), s"query $q ranks")
    }
  }
}
