package graft

import graft.operators.{RandomProjection, Similarity}
import org.apache.spark.sql.functions._
import scala.util.Random

class RandomProjectionSpec extends SparkSpec {
  import spark.implicits._

  test("cell weights follow the public md5 formula (spot values + distribution)") {
    // independent recomputation of one cell
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest("rp|3|7".getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val u = java.lang.Long.parseLong(hex.take(8), 16)
    val want = (u % 6) match { case 0 => 1.0; case 1 => -1.0; case _ => 0.0 }
    assert(RandomProjection.cellWeight("rp", 3, 7) === want)
    // Achlioptas sparsity: ~2/3 zeros, signs balanced-ish
    val m = RandomProjection.signMatrix(64, 16)
    val zeros = m.count(_ == 0.0)
    assert(zeros > m.length * 0.55 && zeros < m.length * 0.78, s"zeros=$zeros/${m.length}")
    assert(m.count(_ == 1.0) > 0 && m.count(_ == -1.0) > 0)
  }

  test("projectColumn equals the driver-side mat-vec") {
    val rnd = new Random(11)
    val vecs = (0 until 20).map(id =>
      (id.toLong, Array.fill(64)(rnd.nextFloat() * 2f - 1f)))
    val df = vecs.toDF("id", "v")
    val got = df.select(col("id"),
        RandomProjection.projectColumn(col("v"), 64, 16).as("p"))
      .as[(Long, Seq[Double])].collect().toMap
    val m = RandomProjection.signMatrix(64, 16)
    vecs.foreach { case (id, v) =>
      val want = Array.tabulate(16)(i =>
        (0 until 64).map(j => v(j).toDouble * m(i * 64 + j)).sum)
      val g = got(id)
      (0 until 16).foreach(i => assert(math.abs(g(i) - want(i)) < 1e-9,
        s"id=$id i=$i ${g(i)} vs ${want(i)}"))
    }
  }

  test("projection preserves kNN neighbours (recall@10 over clustered vectors)") {
    val rnd = new Random(23)
    // 300 vectors in 6 gaussian clusters: realistic neighbour structure
    val centers = Array.fill(6)(Array.fill(64)(rnd.nextGaussian()))
    val vecs = (0 until 300).map { id =>
      val c = centers(id % 6)
      (id.toLong, Array.tabulate(64)(j => (c(j) + 0.3 * rnd.nextGaussian()).toFloat))
    }
    val df = vecs.toDF("id", "embedding").persist()
    val proj = df.select(col("id"),
      RandomProjection.projectColumn(col("embedding"), 64, 24).cast("array<float>").as("embedding"))
    def top10(d: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] = {
      val q = d.limit(40).select(col("id").as("qid"), col("embedding").as("qv"))
      Similarity.knnBruteForce(q, d, "qid", "id", "qv", "embedding", k = 10)
        .select(col("query_id"), col("neighbor_id")).as[(Long, Long)].collect()
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    }
    val full = top10(df)
    val red = top10(proj)
    // toSeq before map: Map#keys is set-like and would dedup the
    // per-query fractions
    val qs = full.keys.toSeq
    val recall = qs.map(q => (full(q) & red(q)).size.toDouble / 10).sum / qs.size
    // cluster structure must survive even where fine-grained ranking
    // within a tight cluster scrambles (JL distortion at outDim=24)
    val sameCluster = qs.map(q => red(q).count(n => n % 6 == q % 6) / 10.0).sum / qs.size
    df.unpersist()
    assert(recall >= 0.3, s"recall@10 after 64->24 projection = $recall")
    assert(sameCluster >= 0.85, s"same-cluster fraction after projection = $sameCluster")
  }
}
