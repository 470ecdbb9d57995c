package graft

import graft.functions.{Int8Dot, QuantizeInt8}
import graft.operators.Similarity
import org.apache.spark.sql.functions._
import scala.util.Random

/** int8 symmetric quantization: code layout, reconstruction error
  * bounds, dot-product fidelity, and neighbor recall vs exact search. */
class QuantSpec extends SparkSpec {
  import spark.implicits._

  test("code layout and edge cases: length, zero vector, null, empty") {
    val rows = Seq(
      (1L, Some(Seq(0.5, -1.0, 0.25))),
      (2L, Some(Seq(0.0, 0.0))),
      (3L, Some(Seq.empty[Double])),
      (4L, Option.empty[Seq[Double]])
    ).toDF("id", "v")
    val got = rows.select($"id", QuantizeInt8($"v".cast("array<double>")).as("c"))
      .as[(Long, Option[Array[Byte]])].collect().toMap
    assert(got(1L).get.length === 4 + 3, "4-byte scale header + 1 byte/dim")
    assert(got(1L).get.drop(4).toSeq === Seq[Byte](64, -127, 32), "max-abs -> ±127 scaling")
    assert(got(2L).get.drop(4).toSeq === Seq[Byte](0, 0), "zero vector -> zero codes")
    assert(got(3L).get.length === 4, "empty vector -> header only")
    assert(got(4L).isEmpty, "null propagates")
  }

  test("a null ELEMENT nulls the whole code (never quantized as 0.0)") {
    val df = Seq((1L, Seq(Some(0.5), None, Some(1.0))), (2L, Seq(Some(0.5), Some(1.0))))
      .toDF("id", "v")
    val got = df.select($"id", QuantizeInt8($"v".cast("array<double>")).as("c"))
      .as[(Long, Option[Array[Byte]])].collect().toMap
    assert(got(1L).isEmpty, "null element must null the code, not read as 0.0")
    assert(got(2L).nonEmpty, "null-free rows unaffected")
  }

  test("int8 dot is NULL for ragged or malformed codes, never a truncated score") {
    val a = Seq((1L, Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0))).toDF("id", "a", "b")
      .select(Int8Dot(QuantizeInt8($"a".cast("array<double>")),
        QuantizeInt8($"b".cast("array<double>"))).as("d"))
      .collect()(0)
    assert(a.isNullAt(0), "dimension mismatch must surface as NULL")
    val bad = Seq((Array[Byte](1, 2), Array[Byte](0, 0, 0, 0, 5))).toDF("x", "y")
      .select(Int8Dot($"x", $"y").as("d")).collect()(0)
    assert(bad.isNullAt(0), "malformed header must surface as NULL")
  }

  test("int8 dot tracks the exact dot within quantization error on random vectors") {
    val rnd = new Random(13)
    val dim = 64
    val pairs = Seq.fill(50)((Seq.fill(dim)(rnd.nextGaussian()), Seq.fill(dim)(rnd.nextGaussian())))
    val df = pairs.toDF("a", "b")
      .select(
        Similarity.dot($"a".cast("array<double>"), $"b".cast("array<double>")).as("exact"),
        Int8Dot(QuantizeInt8($"a".cast("array<double>")), QuantizeInt8($"b".cast("array<double>"))).as("approx"))
      .as[(Double, Double)].collect()
    df.foreach { case (exact, approx) =>
      // per-element error <= scale/2 ~ maxAbs/254; dim-64 gaussians keep
      // the accumulated relative error well under 5% of the norm product
      assert(math.abs(exact - approx) < 0.05 * dim / 8, s"exact=$exact approx=$approx")
    }
  }

  test("knnInt8 over a ragged corpus: mismatched-dim rows rank last, never mid-list") {
    val rnd = new Random(41)
    val corpus = ((0L until 50L).map(i => (i, Seq.fill(16)(rnd.nextGaussian().toFloat)))
      :+ (99L, Seq.fill(8)(10.0f))) // ragged row with a huge norm
      .toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" < 3)
    val got = Similarity.knnInt8(queries, corpus, "vec_id", "vec_id",
        "embedding", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    // the ragged row's Int8Dot is NULL; desc ordering puts NULLS LAST,
    // so it can never crack the top-5 no matter its magnitude
    assert(!got.map(_._2).contains(99L), "ragged row must not appear in top-k")
    assert(got.groupBy(_._1).forall(_._2.length == 5))
  }

  test("quantized kNN recall@5 >= 0.9 vs exact cosine on a synthetic corpus") {
    val rnd = new Random(29)
    val dim = 32
    val corpus = (0L until 400L).map(i => (i, Seq.fill(dim)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" < 25)
    val exact = Similarity.knnBruteForce(queries, corpus, "vec_id", "vec_id",
        "embedding", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().groupBy(_._1)
    val quant = Similarity.knnInt8(queries, corpus, "vec_id", "vec_id",
        "embedding", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().groupBy(_._1)
    val recalls = exact.keys.toSeq.map { q =>
      val e = exact(q).map(_._2).toSet
      val g = quant.getOrElse(q, Array.empty).map(_._2).toSet
      e.intersect(g).size.toDouble / e.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean recall@5 $mean")
  }
}
