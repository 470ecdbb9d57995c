package graft

import graft.operators.Dsir

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")

  test("target-vocabulary pool docs outrank off-domain docs") {
    val target = docs(Seq(
      (1L, "alpha beta gamma alpha delta"),
      (2L, "beta gamma delta epsilon alpha")))
    // pool: ids 10-14 share the target vocabulary, 20-24 use a disjoint one
    val pool = docs(
      (10L to 14L).map(i => (i, "alpha beta gamma delta epsilon")) ++
      (20L to 24L).map(i => (i, "zork quux blarg wibble frotz")))
    val out = Dsir.topK(pool, "doc_id", "text", target, k = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(out.length == 10)
    assert(out.map(_._1).toSeq == (1 to 10), "ranks must be contiguous from 1")
    val byId = out.map(t => t._2 -> t._3).toMap
    val inDomain = (10L to 14L).map(byId)
    val offDomain = (20L to 24L).map(byId)
    assert(inDomain.min > offDomain.max,
      s"every in-domain weight (${inDomain.min}) must exceed every off-domain one (${offDomain.max})")
  }

  test("k bounds the output; deterministic across evaluations") {
    val target = docs(Seq((1L, "alpha beta")))
    val pool = docs((10L to 30L).map(i => (i, s"alpha tok$i beta word$i")))
    val first = Dsir.topK(pool, "doc_id", "text", target, k = 5).collect().toSeq
    assert(first.length == 5)
    val again = Dsir.topK(pool, "doc_id", "text", target, k = 5).collect().toSeq
    assert(first == again, "md5 feature space + rounded weights must be run-stable")
  }

  test("tokens unseen in the target are smoothed, not fatal; longer off-domain docs sink") {
    val target = docs(Seq((1L, "alpha beta gamma")))
    val pool = docs(Seq(
      (10L, "alpha beta"),                       // fully in-domain
      (11L, "unseen1 unseen2"),                  // fully novel
      (12L, "unseen1 unseen2 unseen3 unseen4"))) // more novel mass
    val out = Dsir.topK(pool, "doc_id", "text", target, k = 3)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(out.size == 3, "smoothing must keep every doc scoreable")
    assert(out(10L) > out(11L), "in-domain doc must outrank the novel one")
    assert(out(11L) > out(12L), "novel token mass accumulates negative evidence")
  }

  test("resample: k rows, deterministic, salt-sensitive; tiny tau converges to topK") {
    val target = docs(Seq((1L, "alpha beta gamma delta")))
    val pool = docs((10L to 40L).map(i =>
      (i, if (i % 3 == 0) "alpha beta gamma" else s"junk$i noise$i blob$i")))
    val a = Dsir.resample(pool, "doc_id", "text", target, k = 8, tau = 1.0).collect()
    assert(a.length == 8)
    assert(a.map(_.getInt(0)).toSeq == (1 to 8))
    val b = Dsir.resample(pool, "doc_id", "text", target, k = 8, tau = 1.0).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq, "md5 noise must be run-stable")
    val salted = Dsir.resample(pool, "doc_id", "text", target, k = 8, tau = 1.0,
      salt = "other").collect()
    assert(a.map(_.getLong(1)).toSet != salted.map(_.getLong(1)).toSet ||
      a.map(_.toSeq).toSeq != salted.map(_.toSeq).toSeq,
      "a different salt must vary the draw")
    // tau -> 0: weights dominate the O(1) Gumbel noise, recovering
    // topK's set. Needs DISTINCT weights (ties are legitimately
    // noise-decided at any tau), so give doc i exactly i-9 target
    // tokens — strictly increasing weights.
    val graded = docs((10L to 40L).map(i => (i, Seq.fill((i - 9).toInt)("alpha").mkString(" "))))
    val tight = Dsir.resample(graded, "doc_id", "text", target, k = 8, tau = 1e-4)
      .collect().map(_.getLong(1)).toSet
    val det = Dsir.topK(graded, "doc_id", "text", target, k = 8)
      .collect().map(_.getLong(1)).toSet
    assert(tight == det, s"tau->0 must converge to the deterministic top-k: $tight vs $det")
  }

  test("domainDivergence: zero on identical corpora, positive and bounded on disjoint ones") {
    val a = docs((1L to 20L).map(i => (i, "alpha beta gamma delta")))
    val same = Dsir.domainDivergence(a, a, "text").collect()(0)
    assert(same.getDouble(0) == 0.0 && same.getDouble(1) == 0.0 &&
      same.getDouble(2) == 0.0 && same.getDouble(3) == 0.0)
    val b = docs((1L to 20L).map(i => (i, "zork quux wibble frotz")))
    val diff = Dsir.domainDivergence(a, b, "text").collect()(0)
    assert(diff.getDouble(0) > 0 && diff.getDouble(1) > 0)
    assert(diff.getDouble(2) > 0 && diff.getDouble(2) <= math.log(2) + 1e-9,
      s"JS must sit in (0, ln 2]: ${diff.getDouble(2)}")
    assert(diff.getDouble(3) > 0 && diff.getDouble(3) <= 2.0 + 1e-9)
    assert(diff.getLong(4) <= 256 && diff.getLong(5) <= 256)
  }

  test("logRatios is a bounded bucket table") {
    val target = docs(Seq((1L, "alpha beta gamma delta")))
    val pool = docs((10L to 50L).map(i => (i, s"word$i other$i thing$i")))
    val lr = Dsir.logRatios(target, pool, "text").collect()
    assert(lr.length <= Dsir.Buckets, "at most one row per feature bucket")
    assert(lr.map(_.getString(0)).forall(b => b.length == 2 && b.matches("[0-9a-f]{2}")))
  }
}
