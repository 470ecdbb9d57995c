package graft

import org.apache.spark.sql.functions._
import graft.operators.Relevance

class RelevanceSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "a b a c"),
    (2L, "a d"),
    (3L, "b b e a"),
    (4L, "x y z")
  ).toDF("doc_id", "text")

  test("bm25Scores matches hand-computed Okapi values (k1=1.2, b=0.75)") {
    // N=4, avgdl=3.25, df(a)=3, df(b)=2; idf = ln((N-df+0.5)/(df+0.5)+1)
    val got = Relevance.bm25Scores(corpus, "doc_id", "text", Seq("a", "b"))
      .orderBy("doc_id").as[(Long, Double)].collect()
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L))
    val expected = Map(1L -> 1.0939, 2L -> 0.4233, 3L -> 1.2209)
    got.foreach { case (id, s) => assert(math.abs(s - expected(id)) < 1e-4, s"doc $id") }
  }

  test("docs without any query term are absent, not zero-scored") {
    val got = Relevance.bm25Scores(corpus, "doc_id", "text", Seq("a", "b"))
    assert(got.filter(col("doc_id") === 4L).count() == 0)
  }

  test("bm25TopK returns the k best by score with id tiebreak, via a heap plan") {
    val top = Relevance.bm25TopK(corpus, "doc_id", "text", Seq("a", "b"), k = 2)
    assert(top.select("doc_id").as[Long].collect().toSeq == Seq(3L, 1L))
    // global top-k must plan as per-partition heaps + driver merge,
    // never a full sort: the 100 TB cut
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("repeated query terms contribute with their multiplicity (Okapi qtf)") {
    val once = Relevance.bm25Scores(corpus, "doc_id", "text", Seq("a"))
      .orderBy("doc_id").as[(Long, Double)].collect()
    val twice = Relevance.bm25Scores(corpus, "doc_id", "text", Seq("a", "a"))
      .orderBy("doc_id").as[(Long, Double)].collect()
    assert(once.map(_._1).toSeq == twice.map(_._1).toSeq)
    once.zip(twice).foreach { case ((_, s1), (_, s2)) =>
      assert(math.abs(s2 - 2 * s1) < 1e-3, s"qtf=2 should double the term's score: $s1 vs $s2")
    }
  }

  test("rarer term outranks common term at equal tf and dl") {
    val d = Seq((1L, "rare pad1 pad2"), (2L, "comm pad3 pad4"), (3L, "comm pad5 pad6"))
      .toDF("doc_id", "text")
    val s = Relevance.bm25Scores(d, "doc_id", "text", Seq("rare", "comm"))
      .orderBy("doc_id").as[(Long, Double)].collect().toMap
    assert(s(1L) > s(2L))
    assert(s(2L) == s(3L))
  }

  test("bm25PerQuery: each query scores exactly as the single-query form " +
    "with its own tokenized terms (qtf included)") {
    val q = Seq((10L, "a b"), (20L, "a a d")).toDF("q_id", "q_text")
    val got = Relevance.bm25PerQuery(corpus, "doc_id", "text", q, "q_id", "q_text")
      .orderBy("q_id", "doc_id").as[(Long, Long, Double)].collect()
    val exp10 = Relevance.bm25Scores(corpus, "doc_id", "text", Seq("a", "b"))
      .orderBy("doc_id").as[(Long, Double)].collect()
    val exp20 = Relevance.bm25Scores(corpus, "doc_id", "text", Seq("a", "a", "d"))
      .orderBy("doc_id").as[(Long, Double)].collect()
    assert(got.filter(_._1 == 10L).map(t => (t._2, t._3)).toSeq === exp10.toSeq)
    assert(got.filter(_._1 == 20L).map(t => (t._2, t._3)).toSeq === exp20.toSeq)
  }

  test("rrfFuse: 1/(c+rank) arithmetic, single-list docs contribute one term, " +
    "ties break by id, top-k cut") {
    val a = Seq((1L, 100L, 1), (1L, 101L, 2), (1L, 102L, 3)).toDF("q", "d", "r")
    val b = Seq((1L, 101L, 1), (1L, 103L, 2)).toDF("q", "d", "r")
    val out = Relevance.rrfFuse(a, b, "q", "d", "r", k = 3, c = 60)
      .orderBy("rk").as[(Long, Int, Long, Double)].collect()
    def f(rs: Seq[Int]) = math.rint((rs.map(r => 1.0 / (60 + r)).sum + 1e-9) * 1e6) / 1e6
    // 101 in both lists (ranks 2,1) wins; 100 (rank 1 in a) next;
    // 103 (rank 2 in b) and 102 (rank 3 in a) trail
    assert(out.map(_._3).toSeq === Seq(101L, 100L, 103L))
    assert(out.map(_._4).toSeq === Seq(f(Seq(2, 1)), f(Seq(1)), f(Seq(2))))
    assert(out.map(_._2).toSeq === Seq(1, 2, 3))
  }
}
