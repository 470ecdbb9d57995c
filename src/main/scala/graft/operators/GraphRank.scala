package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative PageRank over an edge list — the standard authority score
  * for web-curation pipelines (rank domains/hosts by link structure and
  * keep/weight documents from reputable ones; the CommonCrawl curation
  * recipe pairs the [[WebCurate]] URL surface with exactly this ranking).
  *
  * Power iteration
  * `pr'(v) = (1-d)·t(v) + d * (Σ_{(u,v)∈E} pr(u)/outdeg(u) + danglingMass·t(v))`
  * where the teleport distribution `t` is uniform (classic PageRank) or
  * concentrated on a trusted seed set ([[personalizedPageRank]] —
  * TrustRank, Gyöngyi et al. 2004: spam farms can fake in-links but not
  * proximity to hand-vetted seeds). Dangling-node mass redistributes
  * along `t` — the textbook correction that keeps Σpr = 1.
  *
  * Two execution shapes, chosen by node count (`vectorMaxNodes`):
  *
  *  - **Driver-vector path** (N ≤ vectorMaxNodes, default 1 M — a rank
  *    vector of ~16 MB): edges are index-mapped once into a cached
  *    `RDD[(Int, Int)]`; each iteration broadcasts the per-source weight
  *    vector `pr(u)/outdeg(u)` (n doubles) and runs ONE treeAggregate
  *    stage — per-partition array folds combined on the driver, no
  *    shuffle, no exchange planning. The teleport/damping/dangling
  *    update is an O(N) driver loop. Same shape as [[Classifier]]'s
  *    gradient loop (measured 9× vs the exchange-per-step layout).
  *
  *  - **Distributed-vector path** (N above the bound — host-level web
  *    graphs): pure DataFrame loop. The edge table joins its out-degrees
  *    once and is persisted; each iteration shuffle-joins the rank
  *    vector into it, aggregates contributions per destination (the
  *    ∝E Pregel message volume — GraphX pays the same), completes
  *    in-edge-less nodes by unioning a zero-contribution row per node
  *    into the SAME aggregation (no second join), and localCheckpoints
  *    the result so lineage stays O(1) across iterations. The dangling
  *    mass, when the graph has dangling nodes at all (static property,
  *    checked once), is a one-row aggregate broadcast into the update;
  *    the seed teleport column rides in as a broadcast join against the
  *    (bounded, driver-supplied) seed list.
  *
  * The uniform path keeps the exact `base + d*(s + dm/N)` arithmetic
  * (not the algebraically-equal teleport form) so results are
  * bit-comparable with the SQL oracle twins.
  */
object GraphRank {

  /** Edges per task for the driver-vector treeAggregate paths: the fold
    * is ~an array increment per edge, so a task under this many edges
    * is pure scheduling overhead; above it, tasks parallelize the fold.
    * Partitioning derives from edge count capped at defaultParallelism
    * — scale-adaptive, not tuned to either local mode or a cluster. */
  private val EdgesPerVectorTask = 1000000L

  /** PageRank over `edges(srcCol, dstCol)` (long-castable node ids).
    * Returns (node: long, pr: double) for every node appearing as a
    * source or destination. Fixed `iterations` (deterministic, twin-able
    * in SQL) rather than convergence-tested — damping < 1 makes the map
    * a contraction, so a fixed count bounds the error a priori. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int = 10, damping: Double = 0.85,
               vectorMaxNodes: Long = 1000000L): DataFrame =
    run(edges, srcCol, dstCol, iterations, damping, vectorMaxNodes, seeds = None)

  /** TrustRank / personalized PageRank: teleport mass restricted to
    * `seeds` (uniform over the seeds present in the graph). Rank decays
    * with link distance from the trusted set — the web-curation
    * anti-spam score. `seeds` is a driver-side list by nature (a vetted
    * whitelist); seeds absent from the graph are ignored, and at least
    * one must be present. */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
                           seeds: Seq[Long], iterations: Int = 10,
                           damping: Double = 0.85,
                           vectorMaxNodes: Long = 1000000L): DataFrame = {
    require(seeds.nonEmpty, "need at least one seed")
    run(edges, srcCol, dstCol, iterations, damping, vectorMaxNodes,
      seeds = Some(seeds.toSet))
  }

  /** Collect a seed-id column under an explicit bound — the guarded
    * driver-side step feeding [[personalizedPageRank]]. Seeds are a
    * vetted whitelist BY ASSUMPTION (dim-table-sized); this enforces the
    * assumption instead of hoping: a seed set past `cap` fails loud with
    * the remediation options rather than OOMing the driver. Costs a
    * `limit(cap+1)` collect — never more than cap+1 rows move. */
  def boundedSeeds(seedIds: DataFrame, idCol: String, cap: Int = 1000000): Seq[Long] = {
    require(cap > 0, "cap must be positive")
    // null ids are dropped BEFORE collect: a null seed is meaningless
    // for the whitelist, and without the filter Row.getLong would throw
    // a bare NPE instead of this method's contracted loud-and-named
    // failures. (Malformed string ids still fail loud via the ANSI cast
    // error, which names the value — that path needs no guard.)
    val got = seedIds.select(col(idCol).cast("long"))
      .where(col(idCol).cast("long").isNotNull).limit(cap + 1)
      .collect().map(_.getLong(0)).toSeq
    require(got.size <= cap,
      s"seed list exceeds $cap rows — a TrustRank whitelist must stay " +
        "dim-table-sized; sample it, raise the cap deliberately, or move " +
        "to a distributed seed mass")
    got
  }

  /** Triangle count over an UNDIRECTED edge list (pass each edge once,
    * either direction; self-loops and duplicates are cleaned here) —
    * the local-clustering signal used to find tightly-knit
    * link-farm/community structure. Standard ordered enumeration: edges
    * canonicalized to (lo, hi), each triangle counted exactly once via
    * the a<b<c join chain. Scale shape: two shuffle joins over the
    * canonical edge set; the classic optimization for skewed real
    * graphs (join small-degree side first) is a degree-ordering
    * refinement of the same plan. Returns one row: (n_triangles). */
  def triangleCount(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges.select(
        least(col(srcCol).cast("long"), col(dstCol).cast("long")).as("a"),
        greatest(col(srcCol).cast("long"), col(dstCol).cast("long")).as("b"))
      .where(col("a") =!= col("b")).distinct().persist()
    val ab = e.select(col("a"), col("b"))
    val bc = e.select(col("a").as("b2"), col("b").as("c"))
    val ac = e.select(col("a").as("a3"), col("b").as("c3"))
    val out = ab
      .join(bc, col("b") === col("b2"))
      .join(ac, col("a") === col("a3") && col("c") === col("c3"))
      .agg(count(lit(1)).as("n_triangles"))
    val materialized = out.localCheckpoint()
    e.unpersist()
    materialized
  }

  private def run(edges: DataFrame, srcCol: String, dstCol: String,
                  iterations: Int, damping: Double, vectorMaxNodes: Long,
                  seeds: Option[Set[Long]]): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    require(damping > 0 && damping < 1, "damping must be in (0, 1)")
    // persist the edge list up front: node derivation, degree counts, and
    // every iteration read it — without this the upstream plan (often a
    // join+distinct) re-executes per setup action
    val e0 = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).persist()
    val nodes = e0.select(col("src").as("node"))
      .union(e0.select(col("dst").as("node"))).distinct().persist()
    val n = nodes.count()
    require(n > 0, "empty graph")
    // driver path requires int-indexable arrays: cap the dispatch bound
    // so a vectorMaxNodes raised past Int.MaxValue can't wrap nL.toInt
    val driverCap = math.min(vectorMaxNodes, Int.MaxValue.toLong - 8)
    val out =
      if (n <= driverCap) driverVector(e0, nodes, n, iterations, damping, seeds)
      else distributedVector(e0, nodes, n, iterations, damping, seeds)
    e0.unpersist()
    nodes.unpersist()
    out
  }

  private def driverVector(e0: DataFrame, nodesDf: DataFrame, nL: Long,
                           iterations: Int, damping: Double,
                           seeds: Option[Set[Long]]): DataFrame = {
    val spark = e0.sparkSession
    import spark.implicits._
    val n = nL.toInt
    val nodes = nodesDf.as[Long].collect().sorted
    val idx = new java.util.HashMap[java.lang.Long, Integer](n * 2)
    var i = 0
    while (i < n) { idx.put(nodes(i), i); i += 1 }
    // map edges into index space ONCE and cache the int pairs: each
    // iteration is then a single treeAggregate stage over this RDD — no
    // shuffle, no exchange planning, just per-partition array folds
    // combined on the driver (the same shape as the classifier's
    // gradient loop). Per-partition accumulator = n doubles.
    // Partition count derives from EDGE COUNT, not the shuffle default:
    // every task allocates an n-double accumulator and every iteration
    // pays (tasks x scheduling + combine) overhead, so tiny graphs on
    // 32 partitions spend the whole iteration on task dispatch
    // (measured r20: 10 iterations of ~1s wall for <20ms of fold CPU).
    // The edge count rides out of the outdegree pass the path already
    // runs (no extra job); coalesce() moves no data, and the
    // defaultParallelism cap keeps large graphs using every core.
    // persist the mapped pairs BEFORE the outdegree pass (ADVICE r20):
    // countByValue materializes the cache, so the idx-map scan of e0
    // runs exactly once; eIdx is then a coalesce VIEW over the cached
    // blocks (narrow, moves no data) rather than a second full scan.
    val eRaw = e0.as[(Long, Long)].rdd
      .map { case (s0, d0) => (idx.get(s0).intValue(), idx.get(d0).intValue()) }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val outdeg = new Array[Long](n)
    var nE = 0L
    eRaw.map(_._1).countByValue().foreach { case (j, d) => outdeg(j) = d; nE += d }
    val eParts = math.max(1L, math.min(spark.sparkContext.defaultParallelism.toLong,
      nE / EdgesPerVectorTask + 1L)).toInt
    val eIdx = eRaw.coalesce(eParts)
    // teleport vector: uniform, or 1/|seeds∩nodes| on the seeds
    val t: Array[Double] = seeds match {
      case None => Array.fill(n)(1.0 / nL)
      case Some(ss) =>
        val present = nodes.count(ss.contains)
        require(present > 0, "no teleport seed is present in the graph")
        Array.tabulate(n)(j => if (ss.contains(nodes(j))) 1.0 / present else 0.0)
    }
    val uniform = seeds.isEmpty
    val base = (1.0 - damping) / nL
    var pr = t.clone()
    for (_ <- 1 to iterations) {
      val w = new Array[Double](n)
      var j = 0
      while (j < n) { if (outdeg(j) > 0) w(j) = pr(j) / outdeg(j); j += 1 }
      val bc = spark.sparkContext.broadcast(w)
      val s = eIdx.treeAggregate(new Array[Double](n))(
        seqOp = (acc, e) => { acc(e._2) += bc.value(e._1); acc },
        combOp = (a, b) => { var k = 0; while (k < n) { a(k) += b(k); k += 1 }; a })
      bc.unpersist(blocking = false)
      var dm = 0.0
      j = 0
      while (j < n) { if (outdeg(j) == 0) dm += pr(j); j += 1 }
      val next = new Array[Double](n)
      j = 0
      // uniform keeps the oracle-twinned arithmetic verbatim
      if (uniform) {
        while (j < n) { next(j) = base + damping * (s(j) + dm / nL); j += 1 }
      } else {
        while (j < n) {
          next(j) = (1.0 - damping) * t(j) + damping * (s(j) + dm * t(j))
          j += 1
        }
      }
      pr = next
    }
    eRaw.unpersist(blocking = false)
    spark.sparkContext.parallelize(nodes.indices.map(k => (nodes(k), pr(k))), 1)
      .toDF("node", "pr")
  }

  private def distributedVector(e0: DataFrame, nodesDf: DataFrame, n: Long,
                                iterations: Int, damping: Double,
                                seeds: Option[Set[Long]]): DataFrame = {
    val spark = e0.sparkSession
    import spark.implicits._
    val nodes = nodesDf.persist()
    val deg = e0.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val e = e0.join(deg, "src").persist()
    e.count() // materialize the static loop input once
    val danglingNodes = nodes.join(deg, nodes("node") === deg("src"), "left_anti").persist()
    val hasDangling = danglingNodes.limit(1).count() > 0
    val base = (1.0 - damping) / n
    val zeros = nodes.select(col("node"), lit(0.0).as("c"))
    // seeded teleport as a broadcast-joinable (node, _t) table; the seed
    // list is driver-bounded by contract
    val tDf: Option[DataFrame] = seeds.map { ss =>
      val present = nodes.join(broadcast(ss.toSeq.toDF("node")), "node").count()
      require(present > 0, "no teleport seed is present in the graph")
      ss.toSeq.toDF("node").withColumn("_t", lit(1.0 / present))
    }
    def withT(df: DataFrame): DataFrame = tDf match {
      case Some(td) => df.join(broadcast(td), Seq("node"), "left")
        .withColumn("_t", coalesce(col("_t"), lit(0.0)))
      case None => df
    }

    var ranks = (tDf match {
      case None => nodes.select(col("node"), lit(1.0 / n).as("pr"))
      case Some(_) => withT(nodes).select(col("node"), col("_t").as("pr"))
    }).localCheckpoint()
    for (_ <- 1 to iterations) {
      val summed = e.join(ranks, e("src") === ranks("node"))
        .select(e("dst").as("node"), (col("pr") / col("outdeg")).as("c"))
        .unionByName(zeros) // completes in-edge-less nodes in the same shuffle
        .groupBy("node").agg(sum(col("c")).as("s"))
      val dangling =
        if (hasDangling) danglingNodes.select("node").join(ranks, "node")
          .agg(coalesce(sum(col("pr")), lit(0.0)).as("_dm"))
        else null
      val next = (tDf, hasDangling) match {
        case (None, true) =>
          summed.crossJoin(broadcast(dangling))
            .select(col("node"),
              (lit(base) + lit(damping) * (col("s") + col("_dm") / n)).as("pr"))
        case (None, false) =>
          summed.select(col("node"),
            (lit(base) + lit(damping) * col("s")).as("pr"))
        case (Some(_), true) =>
          withT(summed).crossJoin(broadcast(dangling))
            .select(col("node"),
              (lit(1.0 - damping) * col("_t")
                + lit(damping) * (col("s") + col("_dm") * col("_t"))).as("pr"))
        case (Some(_), false) =>
          withT(summed).select(col("node"),
            (lit(1.0 - damping) * col("_t") + lit(damping) * col("s")).as("pr"))
      }
      val prev = ranks
      ranks = next.localCheckpoint()
      prev.unpersist()
    }
    e.unpersist()
    nodes.unpersist()
    danglingNodes.unpersist()
    ranks
  }

  /** HITS (Kleinberg 1999) over a DIRECTED edge list: hub scores on the
    * source side, authority scores on the destination side — the
    * companion to PageRank for link analysis where "points at good
    * things" and "is pointed at by good things" are distinct signals
    * (bipartite curation graphs: crawlers→domains, raters→documents).
    *
    * Fixed iterations of the UNNORMALIZED mutual recursion
    * `h_i = A·a_{i−1}`, `a_i = Aᵀ·h_i` from `a_0 = 1`, with ONE final
    * L1 normalization per side — the per-step normalization of the
    * textbook form only rescales (the direction is identical), and
    * skipping it keeps the SQL twin's arithmetic minimal. Duplicate
    * edges are collapsed (HITS is defined on the edge SET).
    *
    * Same dual execution shape as [[pageRank]]: a driver-vector path
    * (two treeAggregates per iteration — one per matrix side — no
    * shuffle) below `vectorMaxNodes` per side, a DataFrame loop with
    * localCheckpointed O(1) lineage above it. Every source has
    * outdegree ≥ 1 and every destination indegree ≥ 1 by construction,
    * so no zero-completion union is needed (unlike PageRank's dangling
    * handling). Returns (node: long, role: 'hub'|'auth', score). */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           iterations: Int = 5, vectorMaxNodes: Long = 1000000L): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val e0 = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct().persist()
    val srcs = e0.select(col("src")).distinct().persist()
    val dsts = e0.select(col("dst")).distinct().persist()
    val ns = srcs.count()
    val nd = dsts.count()
    require(ns > 0 && nd > 0, "empty graph")
    val driverCap = math.min(vectorMaxNodes, Int.MaxValue.toLong - 8)
    val out =
      if (ns <= driverCap && nd <= driverCap)
        hitsDriver(e0, srcs, dsts, ns.toInt, nd.toInt, iterations)
      else hitsDistributed(e0, srcs, dsts, iterations)
    e0.unpersist()
    srcs.unpersist()
    dsts.unpersist()
    out
  }

  private def hitsDriver(e0: DataFrame, srcsDf: DataFrame, dstsDf: DataFrame,
                         ns: Int, nd: Int, iterations: Int): DataFrame = {
    val spark = e0.sparkSession
    import spark.implicits._
    val srcs = srcsDf.as[Long].collect().sorted
    val dsts = dstsDf.as[Long].collect().sorted
    val si = new java.util.HashMap[java.lang.Long, Integer](ns * 2)
    val di = new java.util.HashMap[java.lang.Long, Integer](nd * 2)
    var i = 0
    while (i < ns) { si.put(srcs(i), i); i += 1 }
    i = 0
    while (i < nd) { di.put(dsts(i), i); i += 1 }
    // index-map edges once (same idiom as driverVector): each iteration
    // is two treeAggregate stages over the cached int pairs, partition
    // count edge-derived (see driverVector's coalesce note)
    val eParts = math.max(1L, math.min(spark.sparkContext.defaultParallelism.toLong,
      e0.count() / EdgesPerVectorTask + 1L)).toInt
    val eIdx = e0.as[(Long, Long)].rdd
      .map { case (s0, d0) => (si.get(s0).intValue(), di.get(d0).intValue()) }
      .coalesce(eParts)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var a = Array.fill(nd)(1.0)
    var h = new Array[Double](ns)
    for (_ <- 1 to iterations) {
      val bcA = spark.sparkContext.broadcast(a)
      h = eIdx.treeAggregate(new Array[Double](ns))(
        seqOp = (acc, e) => { acc(e._1) += bcA.value(e._2); acc },
        combOp = (x, y) => { var k = 0; while (k < ns) { x(k) += y(k); k += 1 }; x })
      bcA.unpersist(blocking = false)
      val bcH = spark.sparkContext.broadcast(h)
      a = eIdx.treeAggregate(new Array[Double](nd))(
        seqOp = (acc, e) => { acc(e._2) += bcH.value(e._1); acc },
        combOp = (x, y) => { var k = 0; while (k < nd) { x(k) += y(k); k += 1 }; x })
      bcH.unpersist(blocking = false)
    }
    eIdx.unpersist(blocking = false)
    val hSum = h.sum
    val aSum = a.sum
    val rows = srcs.indices.map(k => (srcs(k), "hub", h(k) / hSum)) ++
      dsts.indices.map(k => (dsts(k), "auth", a(k) / aSum))
    spark.sparkContext.parallelize(rows, 1).toDF("node", "role", "score")
  }

  private def hitsDistributed(e0: DataFrame, srcs: DataFrame, dsts: DataFrame,
                              iterations: Int): DataFrame = {
    var auth = dsts.select(col("dst").as("node"), lit(1.0).as("a")).localCheckpoint()
    var hubs = srcs.select(col("src"), lit(0.0).as("h")).localCheckpoint()
    for (_ <- 1 to iterations) {
      val prevA = auth
      val prevH = hubs
      hubs = e0.join(auth, e0("dst") === auth("node"))
        .groupBy(col("src")).agg(sum(col("a")).as("h")).localCheckpoint()
      auth = e0.join(hubs, Seq("src"))
        .groupBy(col("dst")).agg(sum(col("h")).as("a"))
        .select(col("dst").as("node"), col("a")).localCheckpoint()
      prevA.unpersist()
      prevH.unpersist()
    }
    val hTot = hubs.agg(sum(col("h")).as("_th"))
    val aTot = auth.agg(sum(col("a")).as("_ta"))
    hubs.crossJoin(broadcast(hTot))
      .select(col("src").as("node"), lit("hub").as("role"),
        (col("h") / col("_th")).as("score"))
      .unionAll(auth.crossJoin(broadcast(aTot))
        .select(col("node"), lit("auth").as("role"),
          (col("a") / col("_ta")).as("score")))
  }
}
