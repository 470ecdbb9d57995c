package graft

import graft.operators.GraphRank
import scala.util.Random

class GraphRankSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference PageRank (same fixed-iteration semantics). */
  private def refPageRank(edges: Seq[(Long, Long)], iters: Int,
                          d: Double): Map[Long, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size
    val outdeg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toDouble }
    var pr = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val danglingMass = nodes.filterNot(outdeg.contains).map(pr).sum
      val in = edges.groupBy(_._2)
      pr = nodes.map { v =>
        val s = in.getOrElse(v, Nil).map { case (u, _) => pr(u) / outdeg(u) }.sum
        v -> ((1.0 - d) / n + d * (s + danglingMass / n))
      }.toMap
    }
    pr
  }

  test("pageRank matches the reference on a random directed graph with dangling nodes") {
    val rnd = new Random(5)
    // ~80 edges over 30 nodes; some nodes appear only as destinations (dangling)
    val edges = (0 until 80).map(_ => (rnd.nextInt(20).toLong, (rnd.nextInt(30)).toLong))
      .distinct.filter(e => e._1 != e._2)
    val want = refPageRank(edges, 8, 0.85)
    // both execution shapes: driver-vector (default) and the
    // distributed-vector loop (forced via vectorMaxNodes = 0)
    for (vmax <- Seq(1000000L, 0L)) {
      val got = GraphRank.pageRank(edges.toDF("src", "dst"), "src", "dst",
          iterations = 8, damping = 0.85, vectorMaxNodes = vmax)
        .as[(Long, Double)].collect().toMap
      assert(got.keySet === want.keySet)
      got.foreach { case (v, p) =>
        assert(math.abs(p - want(v)) < 1e-12, s"vmax=$vmax node $v: $p vs ${want(v)}")
      }
      // probability mass is conserved (dangling redistribution keeps sum = 1)
      assert(math.abs(got.values.sum - 1.0) < 1e-9)
    }
  }

  /** Reference personalized PageRank (teleport on seeds). */
  private def refPersonalized(edges: Seq[(Long, Long)], seeds: Set[Long],
                              iters: Int, d: Double): Map[Long, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val present = nodes.count(seeds.contains)
    val t = nodes.map(v => v -> (if (seeds.contains(v)) 1.0 / present else 0.0)).toMap
    val outdeg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toDouble }
    var pr = t
    for (_ <- 1 to iters) {
      val dm = nodes.filterNot(outdeg.contains).map(pr).sum
      val in = edges.groupBy(_._2)
      pr = nodes.map { v =>
        val s = in.getOrElse(v, Nil).map { case (u, _) => pr(u) / outdeg(u) }.sum
        v -> ((1.0 - d) * t(v) + d * (s + dm * t(v)))
      }.toMap
    }
    pr
  }

  test("personalizedPageRank matches the reference on both paths; seeds dominate") {
    val rnd = new Random(41)
    val edges = (0 until 90).map(_ => (rnd.nextInt(25).toLong, rnd.nextInt(30).toLong))
      .distinct.filter(e => e._1 != e._2)
    val seeds = Set(1L, 2L, 3L)
    val want = refPersonalized(edges, seeds, iters = 8, d = 0.85)
    for (vmax <- Seq(1000000L, 0L)) {
      val got = GraphRank.personalizedPageRank(edges.toDF("src", "dst"), "src", "dst",
          seeds.toSeq, iterations = 8, damping = 0.85, vectorMaxNodes = vmax)
        .as[(Long, Double)].collect().toMap
      assert(got.keySet === want.keySet)
      got.foreach { case (v, p) =>
        assert(math.abs(p - want(v)) < 1e-12, s"vmax=$vmax node $v: $p vs ${want(v)}")
      }
      assert(math.abs(got.values.sum - 1.0) < 1e-9, "mass conserved")
      // trust concentrates near the seeds: their mean beats the global mean
      val seedMean = seeds.toSeq.flatMap(got.get).sum / seeds.size
      assert(seedMean > got.values.sum / got.size)
    }
    // absent seeds fail loud
    intercept[Exception](GraphRank.personalizedPageRank(
      edges.toDF("src", "dst"), "src", "dst", Seq(999L), iterations = 2).collect())
  }

  test("triangleCount: known graphs; dirty input (dups, reversals, self-loops) cleaned") {
    def count(edges: Seq[(Long, Long)]): Long =
      GraphRank.triangleCount(edges.toDF("s", "d"), "s", "d")
        .head().getLong(0)
    // K3 = 1, K4 = 4, square (4-cycle) = 0
    assert(count(Seq((1L, 2L), (2L, 3L), (1L, 3L))) === 1L)
    assert(count(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))) === 4L)
    assert(count(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))) === 0L)
    // reversed duplicates, self-loops, repeated edges: still one K3
    assert(count(Seq((1L, 2L), (2L, 1L), (2L, 3L), (1L, 3L), (3L, 1L),
      (2L, 2L), (1L, 2L))) === 1L)
    // brute-force cross-check on a random graph
    val rnd = new Random(9)
    val edges = (0 until 60).map(_ => (rnd.nextInt(12).toLong, rnd.nextInt(12).toLong))
      .filter(e => e._1 != e._2).distinct
    val canon = edges.map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    val nodes = canon.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    var brute = 0L
    for {
      i <- nodes.indices; j <- i + 1 until nodes.size; k <- j + 1 until nodes.size
      if canon((nodes(i), nodes(j))) && canon((nodes(j), nodes(k))) && canon((nodes(i), nodes(k)))
    } brute += 1
    assert(count(edges) === brute)
  }

  test("star graph: the hub out-ranks every leaf") {
    // leaves 1..6 all point at hub 0, hub points back at leaf 1.
    // 40 iterations: the hub<->leaf-1 2-cycle oscillates from the uniform
    // start, so this qualitative claim only holds near the fixpoint.
    val edges = ((1L to 6L).map(l => (l, 0L)) :+ (0L, 1L)).toDF("src", "dst")
    val pr = GraphRank.pageRank(edges, "src", "dst", iterations = 40)
      .as[(Long, Double)].collect().toMap
    assert(pr(0L) > pr.removed(0L).values.max)
    assert(pr(1L) > pr(2L)) // leaf 1 receives the hub's mass
    assert(math.abs(pr.values.sum - 1.0) < 1e-9)
  }

  test("boundedSeeds: dim-sized whitelists collect; fact-sized seed sets fail loud") {
    import graft.operators.GraphRank
    val small = spark.range(10).toDF("seed")
    assert(GraphRank.boundedSeeds(small, "seed").toSet === (0L until 10L).toSet)
    val big = spark.range(5000).toDF("seed")
    val e = intercept[IllegalArgumentException](
      GraphRank.boundedSeeds(big, "seed", cap = 1000))
    assert(e.getMessage.contains("dim-table-sized"), e.getMessage)
  }

  test("boundedSeeds: null ids are dropped, not NPEs; malformed ids fail loud") {
    import graft.operators.GraphRank
    val withNulls = Seq(Some(1L), None, Some(2L), None, Some(3L))
      .toDF("seed")
    assert(GraphRank.boundedSeeds(withNulls, "seed").toSet === Set(1L, 2L, 3L))
    // a malformed string id fails via the ANSI cast error, which names
    // the offending value — loud, not a bare NPE
    val mixed = Seq("7", "not-an-id", "9").toDF("seed")
    val e = intercept[Exception](GraphRank.boundedSeeds(mixed, "seed"))
    assert(e.getMessage.contains("not-an-id"), e.getMessage)
  }


  test("hits: hand-computed one-iteration scores on a tiny bipartite graph") {
    import graft.operators.GraphRank
    // c1->{s1,s2}, c2->{s1}; a0=1: h=(2,1), a=(3,2)
    // L1-normalized: hubs (2/3, 1/3), auths (3/5, 2/5)
    val e = Seq((10L, 21L), (10L, 23L), (12L, 21L)).toDF("src", "dst")
    val got = GraphRank.hits(e, "src", "dst", iterations = 1)
      .orderBy("role", "node").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val exp = Seq((21L, "auth", 0.6), (23L, "auth", 0.4),
      (10L, "hub", 2.0 / 3), (12L, "hub", 1.0 / 3))
    assert(got.length === 4)
    got.zip(exp).foreach { case ((n, r, s), (en, er, es)) =>
      assert(n === en && r === er, s"$n/$r vs $en/$er")
      assert(math.abs(s - es) < 1e-12, s"$n score $s vs $es")
    }
  }

  test("hits: driver-vector and distributed paths agree") {
    import graft.operators.GraphRank
    // deterministic 60-edge directed bipartite graph
    val e = (0 until 60).map(i => ((i % 7).toLong, 100L + (i * 13 % 11)))
      .toDF("src", "dst")
    val a = GraphRank.hits(e, "src", "dst", iterations = 5)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    val b = GraphRank.hits(e, "src", "dst", iterations = 5, vectorMaxNodes = 1L)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(a.keySet === b.keySet)
    a.foreach { case (k, v) => assert(math.abs(v - b(k)) < 1e-12, s"$k: $v vs ${b(k)}") }
  }
}
