package graft

import graft.functions.{DotProduct, L2Norm, L2Normalize}
import graft.operators.Similarity
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import org.apache.spark.sql.functions.col
import scala.util.Random

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def lit(a: Array[Double]): Literal =
    Literal.create(a, ArrayType(DoubleType, containsNull = false))

  private def refDot(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  private def refCos(a: Array[Double], b: Array[Double]): Double =
    refDot(a, b) / (math.sqrt(refDot(a, a)) * math.sqrt(refDot(b, b)))

  test("DotProduct / L2Norm / L2Normalize interpreted eval matches reference") {
    val rnd = new Random(3)
    for (_ <- 0 until 20) {
      val a = Array.fill(16)(rnd.nextGaussian())
      val b = Array.fill(16)(rnd.nextGaussian())
      val d = DotProduct(lit(a), lit(b)).eval(null).asInstanceOf[Double]
      assert(math.abs(d - refDot(a, b)) < 1e-12)
      val n = L2Norm(lit(a)).eval(null).asInstanceOf[Double]
      assert(math.abs(n - math.sqrt(refDot(a, a))) < 1e-12)
      val u = L2Normalize(lit(a)).eval(null).asInstanceOf[ArrayData].toDoubleArray()
      assert(math.abs(math.sqrt(refDot(u, u)) - 1.0) < 1e-9)
    }
    // nulls propagate; zero vector survives normalize
    assert(DotProduct(Literal.create(null, ArrayType(DoubleType)), lit(Array(1.0))).eval(null) == null)
    val z = L2Normalize(lit(Array(0.0, 0.0))).eval(null).asInstanceOf[ArrayData].toDoubleArray()
    assert(z.toSeq == Seq(0.0, 0.0))
  }

  test("codegen path (via DataFrame) agrees with interpreted eval") {
    val rnd = new Random(5)
    val rows = (0 until 50).map { i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian()), Array.fill(8)(rnd.nextGaussian()))
    }
    val df = rows.toDF("id", "a", "b")
    val got = df.select($"id", Similarity.dot($"a", $"b").as("d"))
      .as[(Long, Double)].collect().toMap
    rows.foreach { case (id, a, b) =>
      assert(math.abs(got(id) - refDot(a, b)) < 1e-12, s"id=$id")
    }
  }

  test("knnBruteForce matches a Scala reference ranking") {
    val rnd = new Random(9)
    val corpus = (0L until 60L).map(i => (i, Array.fill(12)(rnd.nextGaussian().toFloat)))
    val df = corpus.toDF("vec_id", "embedding")
    val queries = df.filter($"vec_id" < 5)
    val got = Similarity.knnBruteForce(queries, df, "vec_id", "vec_id", "embedding", "embedding", k = 4)
      .as[(Long, Int, Long, Double)].collect()
      .groupBy(_._1).map { case (q, rs) => q -> rs.sortBy(_._2).map(r => (r._3, r._4)).toSeq }

    val dbl = corpus.map { case (id, v) => id -> v.map(_.toDouble) }.toMap
    for (q <- 0L until 5L) {
      val want = dbl.keys.filter(_ != q).map { c =>
        val cos = BigDecimal(refCos(dbl(q), dbl(c))).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (c, cos)
      }.toSeq.sortBy { case (c, cos) => (-cos, c) }.take(4)
      assert(got(q) === want, s"query $q")
    }
  }

  test("annLshTopK returns correctly-scored subsets of the corpus") {
    val rnd = new Random(13)
    val corpus = (0L until 100L).map(i => (i, Array.fill(16)(rnd.nextGaussian().toFloat)))
    val df = corpus.toDF("vec_id", "embedding")
    val queries = df.filter($"vec_id" < 5)
    val got = Similarity.annLshTopK(queries, df, "vec_id", "vec_id", "embedding", "embedding",
      k = 3, bits = 4, probes = 3, dim = 16).as[(Long, Int, Long, Double)].collect()
    val dbl = corpus.map { case (id, v) => id -> v.map(_.toDouble) }.toMap
    assert(got.nonEmpty)
    got.foreach { case (q, _, c, cos) =>
      assert(c != q)
      val want = BigDecimal(refCos(dbl(q), dbl(c))).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(cos - want) < 1e-9, s"pair ($q,$c)")
    }
    // ranks are 1..k contiguous per query
    got.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1 to rs.length).toSeq, s"query $q ranks")
    }
  }

  test("annLshTopK infers vector dim; an explicit wrong dim fails loudly") {
    val rnd = new Random(29)
    // 128-dim vectors: the old hardcoded dim=64 default would silently
    // bucket on a 64-component prefix here
    val corpus = (0L until 60L).map(i => (i, Array.fill(128)(rnd.nextGaussian().toFloat)))
    val df = corpus.toDF("vec_id", "embedding")
    val queries = df.filter($"vec_id" < 3)
    val got = Similarity.annLshTopK(queries, df, "vec_id", "vec_id", "embedding", "embedding",
      k = 3, bits = 4, probes = 3).as[(Long, Int, Long, Double)].collect()
    assert(got.nonEmpty)
    val dbl = corpus.map { case (id, v) => id -> v.map(_.toDouble) }.toMap
    got.foreach { case (q, _, c, cos) =>
      val want = BigDecimal(refCos(dbl(q), dbl(c))).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(cos - want) < 1e-9, s"pair ($q,$c): full 128-dim vector must be scored")
    }
    val e = intercept[IllegalArgumentException] {
      Similarity.annLshTopK(queries, df, "vec_id", "vec_id", "embedding", "embedding",
        k = 3, bits = 4, probes = 3, dim = 64).collect()
    }
    assert(e.getMessage.contains("128-dimensional"))

    // empty corpus is a valid input -> empty result, not a crash
    val none = df.filter($"vec_id" < 0)
    assert(Similarity.annLshTopK(queries, none, "vec_id", "vec_id", "embedding", "embedding",
      k = 3, bits = 4, probes = 3).count() == 0)
    assert(Similarity.annLshTopK(none, none, "vec_id", "vec_id", "embedding", "embedding",
      k = 3, bits = 4, probes = 3).count() == 0)
  }

  test("cosineNearDupPairs finds planted near-duplicates within blocks") {
    val rnd = new Random(17)
    val base = Array.fill(12)(rnd.nextGaussian())
    val nearDup = base.map(_ + rnd.nextGaussian() * 0.01)
    val far = Array.fill(12)(rnd.nextGaussian())
    val rows = Seq(
      (1L, "g1", base.map(_.toFloat)), (2L, "g1", nearDup.map(_.toFloat)),
      (3L, "g1", far.map(_.toFloat)),
      (4L, "g2", base.map(_.toFloat))) // same vec as id 1 but different block
    val df = rows.toDF("vec_id", "label", "embedding")
    val got = Similarity.cosineNearDupPairs(df, "vec_id", "embedding", Seq("label"), 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L)))
  }

  test("hardNegatives: only other-label rows, ranked by similarity") {
    // label 0 cluster near +x, label 1 near +y, one label-1 DECOY close
    // to +x: the decoy must be every label-0 query's rank-1 negative
    val rows = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),
      (1L, Array(0.99f, 0.1f, 0.0f), 0),
      (2L, Array(0.0f, 1.0f, 0.0f), 1),
      (3L, Array(0.1f, 0.99f, 0.0f), 1),
      (4L, Array(0.95f, 0.3f, 0.0f), 1) // decoy: label 1 but x-ish
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(rows.filter($"vec_id" < 2), rows,
        "vec_id", "vec_id", "embedding", "embedding", "label", k = 2)
      .as[(Long, Int, Long, Int, Double)].collect()
    assert(out.forall(_._4 == 1), "negatives only — never the query's own label")
    val top = out.filter(_._2 == 1).map(r => r._1 -> r._3).toMap
    assert(top === Map(0L -> 4L, 1L -> 4L), "the confusable decoy ranks first")
    out.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).sorted.toSeq === Seq(1, 2))
      val cs = rs.sortBy(_._2).map(_._5)
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b }, "cos non-increasing in rank")
    }
  }

  test("annLshParamsFor: sign-LSH shares the MinHash S-curve budget contract") {
    import graft.operators.{Dedup, Similarity}
    // the similarity->probability map is the Goemans-Williamson angle
    assert(math.abs(Similarity.signCollisionProb(1.0) - 1.0) < 1e-12)
    assert(math.abs(Similarity.signCollisionProb(0.0) - 0.5) < 1e-12)
    assert(math.abs(Similarity.signCollisionProb(0.5) - (1.0 - 1.0 / 3.0)) < 1e-12)
    // derived params honor both budgets at threshold +- margin, checked
    // through the SAME detection-probability algebra MinHash sizing uses
    for ((t, fp, fn, margin, maxH) <- Seq(
        (0.55, 0.10, 0.05, 0.35, 1024),   // wide margin: cheap signature
        (0.80, 0.05, 0.05, 0.10, 16384))) { // threshold +- 0.1: costs real bits
      val (b, r) = Similarity.annLshParamsFor(t, fp, fn, margin, maxH)
      assert(b >= 1 && r >= 1 && b * r <= maxH, s"($b, $r) within $maxH")
      val pHi = Similarity.signCollisionProb(t + margin)
      val pLo = Similarity.signCollisionProb(t - margin)
      assert(Dedup.lshDetectionProbability(pHi, b, r) >= 1.0 - fn,
        s"t=$t: fn budget at cos ${t + margin}")
      assert(Dedup.lshDetectionProbability(pLo, b, r) <= fp,
        s"t=$t: fp budget at cos ${t - margin}")
    }
    // angular margins the bit budget cannot buy fail loud, not degrade
    intercept[IllegalArgumentException](
      Similarity.annLshParamsFor(0.5, 0.01, 0.01, margin = 0.05, maxHashes = 256))
  }

  test("annLshParamsFor fail-loud boundary == brute-force S-curve infeasibility") {
    import graft.operators.{Dedup, Similarity}
    // the solver's refusal must mean "no parameterization exists within
    // the budget", not "the search missed one": sweep margins across
    // the soak operating point (t=0.25, fp=0.2, fn=0.05, maxHashes
    // 1024 — the banded_lsh soak's exact configuration) and compare
    // feasibility against an exhaustive (b, r) scan of the same
    // S-curve. The bit budget is sharply nonlinear in the margin
    // (0.3 -> 488 bits, 0.25 -> 1026, 0.2 -> 6480), so the boundary
    // sits between usable margins — worth proving, not assuming.
    val (t, fp, fn) = (0.25, 0.2, 0.05)
    def bruteFeasible(margin: Double, maxH: Int): Boolean = {
      val pHi = Similarity.signCollisionProb(t + margin)
      val pLo = Similarity.signCollisionProb(t - margin)
      (1 to 48).exists { r =>
        (1 to maxH / r).exists { b =>
          Dedup.lshDetectionProbability(pLo, b, r) <= fp &&
            Dedup.lshDetectionProbability(pHi, b, r) >= 1.0 - fn
        }
      }
    }
    for (maxH <- Seq(1024, 2048); margin <- Seq(0.10, 0.15, 0.20, 0.25, 0.30)) {
      val solver = scala.util.Try(
        Similarity.annLshParamsFor(t, fp, fn, margin, maxH)).isSuccess
      assert(solver === bruteFeasible(margin, maxH),
        s"margin=$margin maxHashes=$maxH: solver=$solver, brute force disagrees")
    }
    // boundary placement at the soak budgets: 0.3 fits in 1024, 0.25
    // needs 2048, 0.2 needs more than 2048 — the tight-soak sizing
    assert(scala.util.Try(Similarity.annLshParamsFor(t, fp, fn, 0.30, 1024)).isSuccess)
    assert(scala.util.Try(Similarity.annLshParamsFor(t, fp, fn, 0.25, 1024)).isFailure)
    assert(scala.util.Try(Similarity.annLshParamsFor(t, fp, fn, 0.25, 2048)).isSuccess)
    assert(scala.util.Try(Similarity.annLshParamsFor(t, fp, fn, 0.20, 2048)).isFailure)
  }

  test("annLshBandedTopK: derived params find planted neighbors; scores are exact") {
    val rnd = new Random(31)
    // clustered corpus: 10 base directions, 6 noisy copies each -> true
    // neighbors sit at cos ~0.9, background pairs at ~0
    val bases = Array.fill(10)(Array.fill(16)(rnd.nextGaussian()))
    val corpus = (0L until 60L).map { i =>
      val b = bases((i % 10).toInt)
      (i, b.map(x => (x + rnd.nextGaussian() * 0.22).toFloat))
    }
    val df = corpus.toDF("vec_id", "embedding")
    val queries = df.filter($"vec_id" < 10)
    val (bands, bits) = graft.operators.Similarity.annLshParamsFor(
      0.55, fpBudget = 0.10, fnBudget = 0.05, margin = 0.35)
    val got = graft.operators.Similarity.annLshBandedTopK(queries, df,
      "vec_id", "vec_id", "embedding", "embedding", k = 5, bands, bits)
    val exact = graft.operators.Similarity.knnBruteForce(queries, df,
      "vec_id", "vec_id", "embedding", "embedding", k = 5)
    val hits = got.select($"query_id", $"neighbor_id")
      .join(exact.select($"query_id", $"neighbor_id"), Seq("query_id", "neighbor_id"))
      .count()
    val total = exact.count()
    assert(hits.toDouble / total >= 0.85,
      s"banded sign-LSH recall $hits/$total under the derived ($bands x $bits) params")
    // reported cosines are true cosines (the verify step is exact)
    val dbl = corpus.map { case (id, v) => id -> v.map(_.toDouble) }.toMap
    got.as[(Long, Int, Long, Double)].collect().foreach { case (q, _, c, cos) =>
      val want = BigDecimal(refCos(dbl(q), dbl(c))).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(cos - want) < 1e-9, s"pair ($q,$c)")
    }
  }


  test("cosineNearDupPairs: an empty block list fails loud, never degenerates to all-pairs") {
    val df = Seq((1L, "a", Array(1.0f, 0.0f))).toDF("vec_id", "label", "embedding")
    val e = intercept[IllegalArgumentException](
      Similarity.cosineNearDupPairs(df, "vec_id", "embedding", Nil, 0.9))
    assert(e.getMessage.contains("block column"), e.getMessage)
  }


  test("annLshParamsFor never derives a bitsPerBand the banded operator rejects") {
    import graft.operators.Similarity
    // tight angular margins at generous hash budgets push the solver
    // toward deep bands; the sign family packs a band + tag into one
    // long (48-bit cap), so derived params must stay inside it or the
    // solver must fail loud — never hand back a crashing pair
    for ((t, fp, fn, m, maxH) <- Seq(
        (0.90, 0.05, 0.01, 0.05, 65536),
        (0.95, 0.20, 0.05, 0.02, 65536))) {
      try {
        val (b, r) = Similarity.annLshParamsFor(t, fp, fn, m, maxH)
        assert(r >= 1 && r <= 48 && b >= 1, s"derived ($b, $r) at t=$t")
        // and the pair must construct (plan-time require passes)
        val df = Seq((1L, Array.fill(4)(1.0f))).toDF("vec_id", "embedding")
        Similarity.annLshBandedTopK(df, df, "vec_id", "vec_id",
          "embedding", "embedding", k = 1, b, r)
      } catch {
        case e: IllegalArgumentException =>
          assert(e.getMessage.contains("no (bands, rows)") ||
            e.getMessage.contains("separates"), e.getMessage)
      }
    }
  }


  test("mmrRerank: redundancy is penalized — the near-duplicate loses its rank-2 slot") {
    // q = (1,0); c1=(1,0) rel 1.0; c2=(0.999.., tiny) near-dup of c1;
    // c3=(0.6,0.8) rel 0.6 but orthogonal-ish to c1.
    // Plain top-2 = {c1, c2}; MMR(lambda=0.7) must pick {c1, c3}:
    //   c2: 0.7*0.99999.. - 0.3*cos(c1,c2)~1.0  ->  ~0.4
    //   c3: 0.7*0.6       - 0.3*0.6             ->  0.24 ... wait c2 ~0.4 wins
    // push the near-dup closer: with c2 == c1 exactly, score c2 = 0.7 - 0.3 = 0.4
    // so use lambda = 0.5: c2 = 0.5 - 0.5 = 0.0; c3 = 0.5*0.6 - 0.5*0.6 = 0.0 — tie.
    // cleanest: c3 at (0,1): rel 0.0? then c3 never wins. Use rel mid + cos 0:
    // c3=(0.8,0.6)? rel 0.8 ... simpler numbers below.
    // q=(1,0); c1=(1,0); c2=(1,0) duplicate; c3=(0,1) rel 0, cos(c1,c3)=0.
    // lambda=0.7: c2 = 0.7*1 - 0.3*1 = 0.4; c3 = 0.7*0 - 0.3*0 = 0.0 -> c2 still wins.
    // lambda=0.3: c2 = 0.3 - 0.7 = -0.4; c3 = 0.0 -> c3 wins rank 2.
    import graft.operators.Similarity
    val q = Seq((100L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val c = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val cands = Similarity.knnBruteForce(q, c, "vec_id", "vec_id",
      "embedding", "embedding", k = 3)
      .join(c.select(col("vec_id").as("neighbor_id"), col("embedding")), "neighbor_id")
    val out = Similarity.mmrRerank(cands, "query_id", "neighbor_id",
        "embedding", "cos", k = 2, lambda = 0.3)
      .orderBy("rk").collect()
    assert(out.map(_.getAs[Long]("neighbor_id")).toSeq === Seq(1L, 3L),
      "rank 2 must be the diverse candidate, not the duplicate")
    assert(out(0).getAs[Double]("mmr_score") === 1.0)
    assert(out(1).getAs[Double]("mmr_score") === 0.0)
  }

  test("mmrRerank: anti-correlated candidates earn a diversity BONUS (negative maxSim)") {
    // q=(1,0); c1=(1,0) rel 1; c2=(-1, eps) ~rel -1, cos(c1,c2) ~ -1:
    // step-2 score for c2 = 0.5*(-1) - 0.5*(-1) = 0 > any 0-floored clamp
    // of -0.5 — regression for the maxSim init bug.
    import graft.operators.Similarity
    val q = Seq((100L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val c = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(-1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val cands = Similarity.knnBruteForce(q, c, "vec_id", "vec_id",
      "embedding", "embedding", k = 2)
      .join(c.select(col("vec_id").as("neighbor_id"), col("embedding")), "neighbor_id")
    val out = Similarity.mmrRerank(cands, "query_id", "neighbor_id",
        "embedding", "cos", k = 2, lambda = 0.5)
      .orderBy("rk").collect()
    assert(out.map(_.getAs[Long]("neighbor_id")).toSeq === Seq(1L, 2L))
    // 0.5*(-1.0) - 0.5*(-1.0) = 0.0 — a 0.0-floored maxSim would give -0.5
    assert(out(1).getAs[Double]("mmr_score") === 0.0)
  }

  test("mmrRerank: mismatched vector lengths within a group fail FAST (advisor r16)") {
    // silent truncation to the shorter vector would drift from the
    // DuckDB twin (list_cosine_similarity errors on mismatched lists);
    // the greedy must fail loudly the moment it scores such a pair
    import graft.operators.Similarity
    val cands = Seq(
      (100L, 1L, Array(1.0f, 0.0f), 1.0),
      (100L, 2L, Array(1.0f, 0.0f, 0.5f), 0.9) // 3-dim among 2-dims
    ).toDF("query_id", "neighbor_id", "embedding", "cos")
    val e = intercept[Exception] {
      Similarity.mmrRerank(cands, "query_id", "neighbor_id",
        "embedding", "cos", k = 2, lambda = 0.5).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("mismatched vector lengths")),
      s"expected the fail-fast message, got: ${messages(e).mkString(" | ")}")
  }

  test("mmrRerank: k past the candidate count truncates; ranks stay 1..n") {
    import graft.operators.Similarity
    val q = Seq((100L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val c = Seq((1L, Array(1.0f, 0.1f)), (2L, Array(0.5f, 0.5f)))
      .toDF("vec_id", "embedding")
    val cands = Similarity.knnBruteForce(q, c, "vec_id", "vec_id",
      "embedding", "embedding", k = 2)
      .join(c.select(col("vec_id").as("neighbor_id"), col("embedding")), "neighbor_id")
    val out = Similarity.mmrRerank(cands, "query_id", "neighbor_id",
      "embedding", "cos", k = 10, lambda = 0.7).collect()
    assert(out.length === 2)
    assert(out.map(_.getAs[Int]("rk")).sorted.toSeq === Seq(1, 2))
  }
}
