package graft

import graft.functions.{HashedTfVector, WeightScale}
import graft.operators.{Similarity, Vectorize}
import org.apache.spark.sql.functions._

/** Hashed TF-IDF vectorization: determinism, normalization, the idf
  * downweighting effect, fit/apply seam, codegen parity, and the
  * end-to-end composition into kNN search. */
class VectorizeSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "shared apple apple orchard"),
    (2L, "shared apple apple orchard"),
    (3L, "shared banana plantation grove"),
    (4L, "shared banana plantation grove"),
    (5L, "")
  ).toDF("doc_id", "text")

  test("deterministic, L2-normalized, fixed-dimension vectors") {
    val a = Vectorize.hashedTfIdf(docs, "text", "v", dim = 64)
      .select($"doc_id", $"v").as[(Long, Array[Float])].collect().sortBy(_._1)
    val b = Vectorize.hashedTfIdf(docs, "text", "v", dim = 64)
      .select($"doc_id", $"v").as[(Long, Array[Float])].collect().sortBy(_._1)
    assert(a.map(_._2.toSeq).toSeq === b.map(_._2.toSeq).toSeq, "same corpus+seed -> same vectors")
    a.foreach { case (id, v) =>
      assert(v.length === 64, s"doc $id dimension")
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
      if (id == 5L) assert(norm === 0.0, "empty doc -> zero vector")
      else assert(math.abs(norm - 1.0) < 1e-5, s"doc $id norm=$norm")
    }
    // identical texts -> identical vectors
    assert(a(0)._2.toSeq === a(1)._2.toSeq)
  }

  test("idf downweights corpus-wide tokens relative to plain tf") {
    val dim = 256
    // tf-only cosine: weight every slot 1.0
    val flat = Array.fill(dim)(1.0)
    val tfOnly = docs.filter($"doc_id".isin(1L, 3L))
      .select(Vectorize.embedColumn($"text", flat, tokenizer = graft.operators.TextAnalysis.tokens).as("v"))
      .as[Array[Float]].collect()
    val idf = Vectorize.fitIdf(docs, $"text", dim)
    val weighted = docs.filter($"doc_id".isin(1L, 3L))
      .select(Vectorize.embedColumn($"text", idf).as("v"))
      .as[Array[Float]].collect()
    def cos(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    // docs 1 and 3 share ONLY the ubiquitous token "shared": idf
    // weighting must shrink their similarity vs unweighted tf
    assert(cos(weighted(0), weighted(1)) < cos(tfOnly(0), tfOnly(1)),
      s"idf=${cos(weighted(0), weighted(1))} tf=${cos(tfOnly(0), tfOnly(1))}")
    // and the ubiquitous slot's weight is the smoothed floor, strictly
    // below any rare token's
    val sharedSlot = {
      val tf = docs.limit(1).select(HashedTfVector(
        graft.operators.TextAnalysis.tokens(lit("shared")), dim, 42L)).as[Array[Double]].head()
      tf.indexWhere(_ > 0)
    }
    // "shared" is in docs 1-4 (the blank doc 5 has no tokens): df=4, n=5
    assert(idf(sharedSlot) === math.log(6.0 / 5.0) + 1.0, "df=4 of n=5 -> ln(6/5)+1")
    assert(idf.max > idf(sharedSlot), "rare slots outweigh the ubiquitous one")
  }

  test("fit/apply seam: frozen idf embeds a NEW batch deterministically") {
    val idf = Vectorize.fitIdf(docs, $"text", dim = 64)
    val batch = Seq((10L, "apple grove")).toDF("doc_id", "text")
    val v1 = batch.select(Vectorize.embedColumn($"text", idf).as("v")).as[Array[Float]].head()
    val v2 = batch.select(Vectorize.embedColumn($"text", idf).as("v")).as[Array[Float]].head()
    assert(v1.toSeq === v2.toSeq)
    assert(math.abs(math.sqrt(v1.map(x => x.toDouble * x).sum) - 1.0) < 1e-5)
    // dimension mismatch fails loud, not silently truncated
    val err = intercept[Exception] {
      batch.select(WeightScale(HashedTfVector(
        graft.operators.TextAnalysis.tokens($"text"), 32, 42L), idf).as("v")).collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(err).exists(_.contains("32")), s"fails loud on mismatch: ${chain(err)}")
  }

  test("interpreted and codegen paths agree; null propagates") {
    val idf = Vectorize.fitIdf(docs, $"text", dim = 64)
    def run(): Seq[Seq[Float]] =
      docs.select(Vectorize.embedColumn($"text", idf).as("v"))
        .as[Seq[Float]].collect().toSeq
    val withCodegen = run()
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      assert(run() === withCodegen)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    val n = Seq(Option.empty[String]).toDF("text")
      .select(Vectorize.embedColumn($"text", idf).as("v")).collect()(0)
    assert(n.isNullAt(0), "null text propagates")
  }

  test("composes into kNN: the nearest neighbor is the near-duplicate") {
    val emb = Vectorize.hashedTfIdf(docs.filter(length($"text") > 0), "text", "v", dim = 128)
    val top = Similarity.knnBruteForce(emb.filter($"doc_id" === 1L), emb,
      "doc_id", "doc_id", "v", "v", k = 3).orderBy($"rk")
      .select($"neighbor_id").as[Long].collect()
    assert(top.head === 2L, "doc 2 is doc 1's duplicate -> rank 1")
  }
}
