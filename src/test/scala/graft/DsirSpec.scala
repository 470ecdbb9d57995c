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

  test("logRatios is a bounded bucket table") {
    val target = docs(Seq((1L, "alpha beta gamma delta")))
    val pool = docs((10L to 50L).map(i => (i, s"word$i other$i thing$i")))
    val lr = Dsir.logRatios(target, pool, "text").collect()
    assert(lr.length <= Dsir.Buckets, "at most one row per feature bucket")
    assert(lr.map(_.getString(0)).forall(b => b.length == 2 && b.matches("[0-9a-f]{2}")))
  }
}
