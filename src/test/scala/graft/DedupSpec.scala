package graft

import graft.operators.Dedup
import scala.util.Random

/** Dedup operators vs brute-force Scala reference implementations. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  // --- reference implementations (mirror TextAnalysis.tokens + shingles3) ---

  private def refTokens(text: String): Array[String] = text.trim.split("\\s+", -1)

  private def refShingles(text: String): Set[String] = {
    val t = refTokens(text)
    if (t.length < 3) Set(t.mkString(" "))
    else t.sliding(3).map(_.mkString(" ")).toSet
  }

  private def refJaccard(a: Set[String], b: Set[String]): Double = {
    val u = (a ++ b).size
    a.intersect(b).size.toDouble / math.max(u, 1)
  }

  private def bruteforcePairs(docs: Seq[(Long, String, String)], threshold: Double,
                              blocked: Boolean): Set[(Long, Long, Double)] = {
    (for {
      (ia, ba, ta) <- docs
      (ib, bb, tb) <- docs
      if ia < ib && (!blocked || ba == bb)
      j = refJaccard(refShingles(ta), refShingles(tb))
      if j >= threshold
    } yield (ia, ib, j)).toSet
  }

  private def randomCorpus(seed: Int, n: Int): Seq[(Long, String, String)] = {
    val rnd = new Random(seed)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    (0L until n).map { i =>
      val len = rnd.nextInt(13) // includes 0..2-token docs (whole-text shingle path)
      val base = Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      (i, if (rnd.nextBoolean()) "en" else "fr", base)
    }
  }

  test("exact dedup groups identical texts and keeps min id") {
    val df = Seq((1L, "aa"), (2L, "bb"), (3L, "aa"), (4L, "aa"), (5L, "cc"))
      .toDF("doc_id", "text")
    val out = Dedup.exact(df, "doc_id", "text")
      .select("doc_id", "n_copies").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 3L), (2L, 1L), (5L, 1L)))
  }

  test("keepFirst keeps lowest order value per key") {
    val df = Seq((3L, "a"), (1L, "a"), (2L, "a"), (10L, "b"), (11L, "b"))
      .toDF("id", "k")
    val out = Dedup.keepFirst(df, Seq("k"), "id").select("id").as[Long].collect().toSet
    assert(out === Set(1L, 10L))
  }

  test("stripBoilerplateLines drops cross-doc repeated lines, keeps unique/blank lines in order") {
    val docs = Seq(
      (1L, "alpha one\nSHARED FOOTER\n\nunique to one"),
      (2L, "beta two\n  SHARED FOOTER  \nmore beta"), // trim-key matches boilerplate
      (3L, "gamma\nSHARED FOOTER"),
      (4L, "SHARED FOOTER"), // reduced to nothing
      (5L, "delta text\nrare pair line"),
      (6L, "rare pair line\nomega")) // df=2 < minDocFreq=3 -> kept
      .toDF("doc_id", "text")
    val out = Dedup.stripBoilerplateLines(docs, "doc_id", "text", minDocFreq = 3)
      .as[(Long, String)].collect().toMap
    assert(out === Map(
      1L -> "alpha one\n\nunique to one", // blank line survives
      2L -> "beta two\nmore beta",
      3L -> "gamma",
      4L -> "",
      5L -> "delta text\nrare pair line",
      6L -> "rare pair line\nomega"))
    // hashed-key mode is pair-identical on a collision-free corpus
    val hashed = Dedup.stripBoilerplateLines(docs, "doc_id", "text",
      minDocFreq = 3, hashKeys = true).as[(Long, String)].collect().toMap
    assert(hashed === out)
  }

  test("stripBoilerplateLines never counts whitespace-only lines as boilerplate") {
    val docs = Seq(
      (1L, "a\n\n \nb"), (2L, "c\n\n \nd"), (3L, "e\n\n \nf"))
      .toDF("doc_id", "text")
    val out = Dedup.stripBoilerplateLines(docs, "doc_id", "text", minDocFreq = 2)
      .as[(Long, String)].collect().toMap
    // the blank and the single-space line occur in all three docs but survive
    assert(out === Map(1L -> "a\n\n \nb", 2L -> "c\n\n \nd", 3L -> "e\n\n \nf"))
  }

  test("ngramJaccardPairs matches brute force on a randomized corpus") {
    for (seed <- Seq(1, 2, 3)) {
      val docs = randomCorpus(seed, 40)
      val df = docs.toDF("doc_id", "lang", "text")
      val got = Dedup.ngramJaccardPairs(df, "doc_id", "text", Seq("lang"), 0.3)
        .as[(Long, Long, Double)].collect().toSet
      val want = bruteforcePairs(docs, 0.3, blocked = true)
      assert(got.map(p => (p._1, p._2)) === want.map(p => (p._1, p._2)), s"seed=$seed pair sets differ")
      val wantJ = want.map(p => (p._1, p._2) -> p._3).toMap
      got.foreach { case (a, b, j) =>
        assert(math.abs(j - wantJ((a, b))) < 1e-4, s"seed=$seed j mismatch for ($a,$b)")
      }
    }
  }

  test("ngramJaccardPairs handles short and empty docs") {
    val docs = Seq((1L, "x", ""), (2L, "x", ""), (3L, "x", "one two"),
      (4L, "x", "one two"), (5L, "x", "a b c d"))
    val df = docs.toDF("doc_id", "lang", "text")
    val got = Dedup.ngramJaccardPairs(df, "doc_id", "text", Seq("lang"), 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L), (3L, 4L)))
  }

  test("ngramJaccardPairs df-cap: stop-shingle corpus stays linear, true pairs survive") {
    // adversarial corpus: EVERY doc opens with the same trigram, so the
    // uncapped posting join fans out n^2 rows on that single shingle.
    // True near-dups share their 10 rare tokens except the last.
    val vocab = Vector.tabulate(50000)(i => s"t$i")
    def corpus(n: Int, seed: Int): Seq[(Long, String, String)] = {
      val rnd = new Random(seed)
      (0 until n / 2).flatMap { i =>
        val rare = Seq.fill(10)(vocab(rnd.nextInt(vocab.size)))
        val a = ("the quick fox" +: rare).mkString(" ")
        val b = ("the quick fox" +: (rare.dropRight(1) :+ "CHANGED")).mkString(" ")
        Seq((i * 2L, "x", a), (i * 2L + 1, "x", b))
      }
    }
    def run(docs: Seq[(Long, String, String)], cap: Int): (Set[(Long, Long)], Long) = {
      val df = docs.toDF("doc_id", "lang", "text").repartition(8)
      val t0 = System.nanoTime()
      val out = Dedup.ngramJaccardPairs(df, "doc_id", "text", Seq("lang"), 0.4, maxDocFreq = cap)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      (out, (System.nanoTime() - t0) / 1000000L)
    }

    // correctness vs brute force at small n: the cap only drops the stop
    // shingle, and true pairs overlap in rare shingles, so the capped run
    // must report exactly the above-threshold pair set
    val small = corpus(400, 11)
    val want = bruteforcePairs(small, 0.4, blocked = true).map(p => (p._1, p._2))
    assert(want.size == 200, "corpus construction: every (a,b) pair must be a true near-dup")
    assert(run(small, 100)._1 === want, "df-capped pairs must match brute force")
    assert(run(small, 0)._1 === want, "uncapped pairs must match brute force")

    // scale behavior at n=6000: uncapped fans out n^2/2 = 18M join rows on
    // the stop shingle; capped stays ~linear. Both plans are warm from the
    // small runs above. Expected pairs are by construction.
    val big = corpus(6000, 12)
    val expect = (0 until 3000).map(i => (i * 2L, i * 2L + 1L)).toSet
    val (cappedBig, tCapped) = run(big, 100)
    val (uncappedBig, tUncapped) = run(big, 0)
    assert(cappedBig === expect)
    assert(uncappedBig === expect)
    assert(tCapped * 2 < tUncapped,
      s"capped run (${tCapped}ms) should be well under uncapped (${tUncapped}ms) on a stop-shingle corpus")
  }

  test("editDistPairs matches brute-force blocked Levenshtein on a randomized corpus") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    // near-identical planted pairs + random noise docs; frac 0.2
    val rnd = new Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta")
    val base = (0L until 30L).map { i =>
      (i, "en", Seq.fill(6 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val twins = base.take(8).map { case (i, l, t) =>
      (i + 100L, l, t.replaceFirst("a", "o")) // 1-char substitution
    }
    val docs = base ++ twins
    val expected = (for {
      (ia, la, ta) <- docs; (ib, lb, tb) <- docs
      if ia < ib && la == lb
      a = ta.trim; b = tb.trim
      // blocked semantics: candidates must share a word-trigram shingle
      if refShingles(a).intersect(refShingles(b)).nonEmpty
      d = lev(a, b)
      if d <= math.floor(0.2 * math.max(a.length, b.length))
    } yield (ia, ib, d)).toSet
    val out = Dedup.editDistPairs(docs.toDF("doc_id", "lang", "text"),
        "doc_id", "text", Seq("lang"), maxDistFrac = 0.2)
      .as[(Long, Long, Int)].collect().toSet
    assert(out === expected)
    assert(out.nonEmpty, "fixture must produce at least one qualifying pair")
    // every planted twin pair survives (distance 1 vs bound >= 1 at len >= 5)
    assert(base.take(8).forall { case (i, _, t) => out.exists(p => p._1 == i && p._2 == i + 100L) || t.trim.length < 5 })
  }

  test("editDistPairsLsh: banded candidates reproduce the exact answer on near-identical pairs") {
    // the compose's operating regime: near-identical texts (Jaccard ~1,
    // where 12x4 banding detects ~certainly) — LSH-proposed + exactly
    // verified must EQUAL the shingle-complete exact operator, including
    // the d values; the far-apart noise docs must produce nothing
    val rnd = new Random(11)
    val vocab = Vector.tabulate(120)(i => s"tok$i")
    val base = (0L until 25L).map { i =>
      (i, Seq.fill(30)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val twins = base.take(9).map { case (i, t) => (i + 500L, t.dropRight(2)) } // 2-char deletion
    val docs = (base ++ twins).toDF("doc_id", "text")
    val viaLsh = Dedup.editDistPairsLsh(docs, "doc_id", "text", maxDistFrac = 0.2)
      .as[(Long, Long, Int)].collect().toSet
    val exactDf = Dedup.editDistPairs(docs, "doc_id", "text", Nil, maxDistFrac = 0.2)
    val exact = exactDf.as[(Long, Long, Int)].collect().toSet
    assert(viaLsh === exact)
    // plan shape of the shared verify stage (editDistPairs is
    // un-checkpointed, so its plan is inspectable; the LSH variant runs
    // the SAME editDistVerify code): the text re-attach joins must be
    // merge-hinted SMJ — never a broadcast of a text-carrying side (the
    // 3.1 GiB decompression blowup of BENCH_NOTES #37) and never a
    // cross product
    val phys = exactDf.queryExecution.executedPlan.toString
    assert(phys.contains("SortMergeJoin"), phys.take(1500))
    assert(!phys.contains("CartesianProduct") && !phys.contains("BroadcastNestedLoopJoin"))
    // all 9 planted pairs found, with the true distance
    (0L until 9L).foreach(i => assert(viaLsh.exists(p => p._1 == i && p._2 == i + 500L && p._3 == 2)))
  }

  test("dropNearDupByEditDist keeps each edit-component's min-id representative") {
    val rnd = new Random(17)
    val vocab = Vector.tabulate(120)(i => s"tok$i")
    val base = (0L until 12L).map { i =>
      (i, Seq.fill(30)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    // chain component: 0 ~ 600 ~ 601 (601 is 600's near-copy, both near 0)
    val twins = Seq((600L, base(0)._2.dropRight(2)), (601L, base(0)._2.dropRight(3))) ++
      base.slice(1, 5).map { case (i, t) => (i + 700L, t.dropRight(2)) }
    val docs = (base ++ twins).toDF("doc_id", "text")
    val kept = Dedup.dropNearDupByEditDist(docs, "doc_id", "text", maxDistFrac = 0.2)
      .select("doc_id").as[Long].collect().toSet
    // every component collapses to its min id: 0 survives its chain,
    // 1-4 survive their twins, 5-11 are singletons
    assert(kept === (0L until 12L).toSet, s"got $kept")
  }

  test("editDistAgainstLsh: cross pairs only, exact distances, batch-internal dups ignored") {
    val rnd = new Random(13)
    val vocab = Vector.tabulate(120)(i => s"tok$i")
    val corpus = (0L until 20L).map { i =>
      (i, Seq.fill(30)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    // batch: 6 near-copies of corpus docs (2-char deletion), 2 fresh
    // docs, and a pair of batch-INTERNAL duplicates that must NOT match
    val internal = Seq.fill(30)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val batch = corpus.take(6).map { case (i, t) => (i + 900L, t.dropRight(2)) } ++
      Seq((950L, Seq.fill(30)(vocab(rnd.nextInt(vocab.size))).mkString(" ")),
        (951L, internal), (952L, internal))
    val got = Dedup.editDistAgainstLsh(corpus.toDF("doc_id", "text"),
        batch.toDF("doc_id", "text"), "doc_id", "text", maxDistFrac = 0.2)
      .as[(Long, Long, Int)].collect().toSet
    assert(got === (0L until 6L).map(i => (i + 900L, i, 2)).toSet,
      s"exactly the planted cross pairs with true distance, got $got")
  }

  test("editDistPairs is order-sensitive where Jaccard is blind") {
    // docs 1 and 3 are cyclic rotations: IDENTICAL shingle sets under
    // the periodic repetition (J = 1.0 — ngramJaccardPairs pairs them),
    // but turning one into the other costs many real edits, so the
    // edit-distance refinement correctly refuses the pair. Doc 2 is one
    // substitution from doc 1 and passes. That asymmetry IS the point
    // of the operator: set similarity proposes, edit distance disposes.
    val docs = Seq(
      (1L, "en", "alpha beta gamma alpha beta gamma alpha beta gamma alpha beta gamma"),
      (2L, "en", "alpha beta gamma alpha beta gamma alpha beta gamma alpha beta gamm"),
      (3L, "en", "beta gamma alpha beta gamma alpha beta gamma alpha beta gamma alpha")
    ).toDF("doc_id", "lang", "text")
    val jac = Dedup.ngramJaccardPairs(docs, "doc_id", "text", Seq("lang"), threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(jac.contains((1L, 3L)), "rotation shares the full shingle set")
    val ed = Dedup.editDistPairs(docs, "doc_id", "text", Seq("lang"), maxDistFrac = 0.1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(ed.contains((1L, 2L)), "one substitution passes the 10% bound")
    assert(!ed.contains((1L, 3L)), "rotation needs real edits and must be refused")
  }

  test("minHashNearDupPairs finds high-similarity pairs, rejects low ones") {
    val rnd = new Random(7)
    val vocab = Vector.tabulate(200)(i => s"w$i")
    // 10 well-separated base docs + a near-dup of each (1 token changed => J ~ 0.9)
    val bases = (0 until 10).map { i =>
      (i * 2L, Seq.fill(33)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val dups = bases.map { case (id, t) =>
      val toks = t.split(" "); toks(toks.length - 1) = "CHANGED"
      (id + 1, toks.mkString(" "))
    }
    val df = (bases ++ dups).toDF("doc_id", "text")
    val got = Dedup.minHashNearDupPairs(df, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val want = bruteforcePairs(
      (bases ++ dups).map { case (id, t) => (id, "x", t) }, 0.5, blocked = false)
      .map(p => (p._1, p._2))
    assert(got === want)
    assert(got.size >= 10) // every (base, dup) pair found
  }

  test("minHashNearDupPairs: null-text docs are excluded, not banded together") {
    // null text -> NULL shingle set -> NULL signature; unguarded, all
    // null-text docs would share identical band keys and self-join n^2
    val docs = Seq[(Long, Option[String])](
      (1L, Some("alpha beta gamma delta epsilon zeta")),
      (2L, Some("alpha beta gamma delta epsilon zeta")),
      (3L, None), (4L, None), (5L, None))
    val df = docs.toDF("doc_id", "text")
    val got = Dedup.minHashNearDupPairs(df, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L)), s"null-text docs must not pair: $got")
  }

  test("connectedComponents labels chains and isolated nodes correctly") {
    val nodes = (1L to 7L).map(Tuple1(_)).toDF("id")
    // components: {1,2,3,4} (chain), {5,6}, {7} isolated
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L)).toDF("id_a", "id_b")
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 5L, 6L -> 5L, 7L -> 7L)
    val gotDriver = Dedup.connectedComponents(nodes, "id", pairs)
      .as[(Long, Long)].collect().toMap
    assert(gotDriver === want)
    // force the distributed large-star/small-star path
    val gotDistributed = Dedup.connectedComponents(nodes, "id", pairs, maxDriverEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(gotDistributed === want)
  }

  test("distributed CC converges on a path graph whose diameter dwarfs maxIter") {
    // path 1-2-...-300 (diameter 299): min-label propagation moves the
    // label one hop per round and could never finish in 15 rounds;
    // large-star/small-star halves star heights every round (O(log^2 n))
    val n = 300L
    val nodes = (1L to n).map(Tuple1(_)).toDF("id")
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(nodes, "id", pairs, maxIter = 15, maxDriverEdges = 0L)
      .as[(Long, Long)].collect()
    assert(got.length == n)
    got.foreach { case (id, rep) => assert(rep == 1L, s"node $id labeled $rep, want 1") }

    // shuffled ids (root not an endpoint) + two extra components
    val perm = new Random(5).shuffle((1000L to 1300L).toVector)
    val pathB = (0 until 300).map(i => (perm(i), perm(i + 1)))
    val nodesB = (perm ++ Seq(1L, 2L, 3L)).map(Tuple1(_)).toDF("id")
    val pairsB = (pathB ++ Seq((2L, 3L))).toDF("id_a", "id_b")
    val gotB = Dedup.connectedComponents(nodesB, "id", pairsB, maxIter = 15, maxDriverEdges = 0L)
      .as[(Long, Long)].collect().toMap
    (1000L to 1300L).foreach(id => assert(gotB(id) == 1000L, s"node $id -> ${gotB(id)}"))
    assert(gotB(1L) == 1L && gotB(2L) == 2L && gotB(3L) == 2L)
  }

  test("dropNearDuplicates keeps one representative per near-dup cluster") {
    val rnd = new Random(23)
    val vocab = Vector.tabulate(300)(i => s"v$i")
    val bases = (0 until 6).map(i => Seq.fill(30)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    // each base appears 3x (ids 3i, 3i+1, 3i+2: original + 2 near-copies)
    val docs = bases.zipWithIndex.flatMap { case (t, i) =>
      val toks = t.split(" ")
      val mut = toks.clone(); mut(mut.length - 1) = "X"
      Seq((i * 3L, t), (i * 3L + 1, t), (i * 3L + 2, mut.mkString(" ")))
    }
    val df = docs.toDF("doc_id", "text")
    val kept = Dedup.dropNearDuplicates(df, "doc_id", "text", 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === (0 until 6).map(_ * 3L).toSet)
  }

  test("minHashNearDupAgainst finds only CROSS pairs; dropNearDupAgainst filters the batch") {
    val rnd = new Random(31)
    val vocab = Vector.tabulate(300)(i => s"v$i")
    def doc() = Seq.fill(30)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val shared = doc() // present in corpus AND near-copied in the batch
    val batchDup = doc() // duplicated WITHIN the batch only — must not match
    val corpus = Seq((0L, shared), (1L, doc()), (2L, doc())).toDF("doc_id", "text")
    val mut = { val t = shared.split(" "); t(t.length - 1) = "X"; t.mkString(" ") }
    val batch = Seq((100L, mut), (101L, doc()), (102L, batchDup), (103L, batchDup))
      .toDF("doc_id", "text")
    val hits = Dedup.minHashNearDupAgainst(corpus, batch, "doc_id", "text", 0.5)
      .select("batch_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(hits === Set((100L, 0L)), "only the cross near-dup pair; batch-internal dups excluded")
    val kept = Dedup.dropNearDupAgainst(corpus, batch, "doc_id", "text", 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(101L, 102L, 103L), "batch minus corpus near-dups, internal dups retained")
  }

  test("minHashNearDupPairs releases its caches and still serves its result") {
    spark.catalog.clearCache() // isolate from other suites on the shared session
    val rnd = new Random(31)
    val vocab = Vector.tabulate(200)(i => s"c$i")
    val bases = (0 until 5).map(i => (i * 2L, Seq.fill(30)(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
    val dups = bases.map { case (id, t) => (id + 1, t) }
    val df = (bases ++ dups).toDF("doc_id", "text")
    val pairs = Dedup.minHashNearDupPairs(df, "doc_id", "text", threshold = 0.5)
    // deterministic release: no CacheManager entry may survive the call
    // (Dataset caches are not ContextCleaner-managed — a leak here grows
    // without bound in a service looping dedup calls)
    assert(org.apache.spark.sql.GraftColumnBridge.cacheManagerIsEmpty(spark),
      "minHashNearDupPairs left a Dataset cache registered")
    // the returned pairs are materialized — correct after the release
    val got = pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got === bases.map { case (id, _) => (id, id + 1) }.toSet)
  }

  // --- substring-span dedup (Lee et al. 2022) ---

  /** Brute-force reference: positions (1-based) of k-spans occurring in
    * >= 2 distinct docs, merged into maximal ranges per doc. */
  private def refDuplicateSpans(docs: Seq[(Long, String)], k: Int): Set[(Long, Long, Long)] = {
    val spans = docs.flatMap { case (id, t) =>
      val toks = refTokens(t)
      (0 to toks.length - k).map(i => (id, i + 1L, toks.slice(i, i + k).mkString(" ")))
    }
    val docFreq = spans.groupBy(_._3).map { case (sp, occ) => sp -> occ.map(_._1).distinct.size }
    spans.filter(s => docFreq(s._3) >= 2)
      .groupBy(_._1).toSeq.flatMap { case (id, hs) =>
        val ps = hs.map(_._2).distinct.sorted
        val ranges = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        var start = ps.head; var last = ps.head
        for (p <- ps.tail) {
          if (p - last <= k) last = p
          else { ranges += ((start, last + k - 1)); start = p; last = p }
        }
        ranges += ((start, last + k - 1))
        ranges.map { case (s, e) => (id, s, e) }
      }.toSet
  }

  test("checkpoint policy: reliable and local produce identical pairs and scores") {
    val docs = randomCorpus(83, 120).map { case (id, _, t) => (id, t) }
      .toDF("doc_id", "text")
    val localPairs = Dedup.minHashNearDupPairs(docs, "doc_id", "text", threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    val localBm25 = graft.operators.Relevance
      .bm25Scores(docs, "doc_id", "text", Seq("alpha", "beta"))
      .as[(Long, Double)].collect().toSet
    val ckDir = java.nio.file.Files.createTempDirectory("graft_reliable_ck").toString
    spark.sparkContext.setCheckpointDir(ckDir)
    spark.conf.set(graft.core.Checkpoint.PolicyKey, "reliable")
    try {
      val relPairs = Dedup.minHashNearDupPairs(docs, "doc_id", "text", threshold = 0.5)
        .as[(Long, Long, Double)].collect().toSet
      val relBm25 = graft.operators.Relevance
        .bm25Scores(docs, "doc_id", "text", Seq("alpha", "beta"))
        .as[(Long, Double)].collect().toSet
      assert(relPairs === localPairs, "policy must not change dedup semantics")
      assert(relBm25 === localBm25, "policy must not change bm25 semantics")
      // reliable checkpoints actually hit the configured directory
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(ckDir))
        .filter(p => java.nio.file.Files.isRegularFile(p)).count()
      assert(wrote > 0, "reliable policy must write to the checkpoint dir")
    } finally spark.conf.set(graft.core.Checkpoint.PolicyKey, "local")
    // misconfiguration fails loudly: unknown policy value
    spark.conf.set(graft.core.Checkpoint.PolicyKey, "bogus")
    try intercept[IllegalArgumentException] {
      Dedup.minHashNearDupPairs(docs, "doc_id", "text", threshold = 0.5).count()
    } finally spark.conf.set(graft.core.Checkpoint.PolicyKey, "local")
  }

  test("duplicateSpans maps a planted cross-doc span back to exact token ranges") {
    val shared = (1 to 10).map(i => s"S$i").mkString(" ")
    val docs = Seq(
      (1L, s"u1 u2 u3 $shared u4 u5"),       // shared run at tokens 4..13
      (2L, s"v1 $shared v2 v3"),             // shared run at tokens 2..11
      (3L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"))// no duplication
    val got = Dedup.duplicateSpans(docs.toDF("doc_id", "text"), "doc_id", "text", k = 4)
      .as[(Long, Long, Long)].collect().toSet
    // overlapping 4-spans inside the shared run merge into ONE maximal
    // range per doc; boundary-straddling spans are unique and must not
    // widen it
    assert(got === Set((1L, 4L, 13L), (2L, 2L, 11L)))
    assert(got === refDuplicateSpans(docs, 4))
  }

  test("duplicateSpans: within-doc repeats alone don't count; short docs produce nothing") {
    val docs = Seq(
      (1L, "a b c d X Y a b c d"), // repeated span but df = 1 doc
      (2L, "p q r"),               // shorter than k
      (3L, ""))
    val got = Dedup.duplicateSpans(docs.toDF("doc_id", "text"), "doc_id", "text", k = 4)
      .collect()
    assert(got.isEmpty, s"got ${got.mkString(",")}")
  }

  test("duplicateSpans matches brute force on a randomized small-vocab corpus") {
    for (seed <- Seq(4, 5)) {
      val rnd = new Random(seed)
      val vocab = Vector("a", "b", "c", "d", "e", "f")
      val docs = (0L until 40L).map { i =>
        val len = rnd.nextInt(13)
        (i, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val got = Dedup.duplicateSpans(docs.toDF("doc_id", "text"), "doc_id", "text", k = 3)
        .as[(Long, Long, Long)].collect().toSet
      assert(got === refDuplicateSpans(docs, 3), s"seed=$seed")
    }
  }

  /** Brute-force keep-first span dedup: rank duplicated-span occurrences
    * by (doc, pos), strip every non-first occurrence's [p, p+k-1] cover —
    * EXCEPT candidates overlapping a same-doc kept occurrence (the
    * keep-first protection: canonical copies survive verbatim). */
  private def refDedupSpans(docs: Seq[(Long, String)], k: Int): Map[Long, String] = {
    val spans = docs.flatMap { case (id, t) =>
      val toks = refTokens(t)
      (0 to toks.length - k).map(i => (id, i + 1L, toks.slice(i, i + k).mkString(" ")))
    }
    val docFreq = spans.groupBy(_._3).map { case (sp, occ) => sp -> occ.map(_._1).distinct.size }
    val dupOcc = spans.filter(s => docFreq(s._3) >= 2)
    val keep = dupOcc.groupBy(_._3).map { case (_, occ) => occ.minBy(o => (o._1, o._2)) }.toSet
    val keptByDoc = keep.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val stripPos = dupOcc.filterNot(keep)
      .filter { case (id, p, _) =>
        !keptByDoc.getOrElse(id, Set.empty[Long]).exists(kp => math.abs(p - kp) <= k - 1)
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    docs.map { case (id, t) =>
      id -> (stripPos.get(id) match {
        case None => t
        case Some(ps) =>
          val covered = (i: Long) => ps.exists(p => i >= p && i <= p + k - 1)
          refTokens(t).zipWithIndex.collect { case (tok, i) if !covered(i + 1L) => tok }
            .mkString(" ")
      })
    }.toMap
  }

  test("stripSpans removes exactly the given ranges; docs without ranges stay verbatim") {
    val docs = Seq((1L, "a  b c d e"), (2L, "x y z")).toDF("doc_id", "text")
    val ranges = Seq((1L, 2L, 3L)).toDF("doc_id", "token_start", "token_end")
    val got = Dedup.stripSpans(docs, "doc_id", "text", ranges)
      .select("doc_id", "text_dedup").as[(Long, String)].collect().toMap
    assert(got(1L) == "a d e")      // tokens 2-3 stripped, rebuilt single-spaced
    assert(got(2L) == "x y z")      // untouched doc keeps ORIGINAL text verbatim
  }

  test("dedupSpans keeps the first occurrence, strips the rest") {
    val shared = (1 to 10).map(i => s"S$i").mkString(" ")
    val docs = Seq(
      (1L, s"u1 u2 $shared u3"),   // first occurrence — kept verbatim
      (2L, s"v1 $shared v2"),      // stripped
      (3L, "w1 w2 w3 w4 w5"))
    val got = Dedup.dedupSpans(docs.toDF("doc_id", "text"), "doc_id", "text", k = 4)
      .select("doc_id", "text_dedup").as[(Long, String)].collect().toMap
    assert(got(1L) == s"u1 u2 $shared u3", "canonical doc must keep its text verbatim")
    assert(got(2L) == "v1 v2", s"duplicate span should strip: ${got(2L)}")
    assert(got(3L) == "w1 w2 w3 w4 w5")
    assert(got === refDedupSpans(docs, 4))
  }

  test("dedupSpans self-overlap: the kept copy survives verbatim, not destroyed by its own repeats") {
    // "a b a" occurs at doc1 pos1 (kept), doc1 pos3 and doc2 pos1. The
    // pos3 strip would delete token 3 OF the kept pos1 copy — it must be
    // exempted; doc2's clear occurrence strips fully. Without the
    // protection NO copy of "a b a" would survive anywhere.
    val docs = Seq((1L, "a b a b a"), (2L, "a b a"))
    val got = Dedup.dedupSpans(docs.toDF("doc_id", "text"), "doc_id", "text", k = 3)
      .select("doc_id", "text_dedup").as[(Long, String)].collect().toMap
    assert(got(1L) == "a b a b a", s"kept copy mutilated: '${got(1L)}'")
    assert(got(2L) == "", s"clear duplicate should strip fully: '${got(2L)}'")
    assert(got === refDedupSpans(docs, 3))
  }

  test("dedupSpans matches brute force on a randomized small-vocab corpus") {
    for (seed <- Seq(6, 7)) {
      val rnd = new Random(seed)
      val vocab = Vector("a", "b", "c", "d", "e", "f")
      val docs = (0L until 40L).map { i =>
        val len = rnd.nextInt(13)
        (i, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val got = Dedup.dedupSpans(docs.toDF("doc_id", "text"), "doc_id", "text", k = 3)
        .select("doc_id", "text_dedup").as[(Long, String)].collect().toMap
      assert(got === refDedupSpans(docs, 3), s"seed=$seed")
    }
  }

  test("simHashNearDupPairs: duplicates at hamming 0, distinct docs rejected") {
    val rnd = new Random(11)
    val vocab = Vector.tabulate(500)(i => s"tok$i")
    val docs = (0 until 8).map { i =>
      (i * 2L, Seq.fill(40)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val exactDups = docs.map { case (id, t) => (id + 1, t) }
    val df = (docs ++ exactDups).toDF("doc_id", "text")
    val got = Dedup.simHashNearDupPairs(df, "doc_id", "text", maxHamming = 3)
      .as[(Long, Long, Int)].collect()
    val dupPairs = got.filter(_._3 == 0).map(p => (p._1, p._2)).toSet
    assert(docs.map { case (id, _) => (id, id + 1) }.toSet.subsetOf(dupPairs))
    // no cross-document pair (different base text) should appear
    got.foreach { case (a, b, _) => assert(b - a == 1 && a % 2 == 0, s"unexpected pair ($a,$b)") }
  }

  test("lshParamsFor: derived params honor both budgets at threshold +- margin") {
    // feasible operating points: a loose FP budget is the realistic
    // shape (false candidates are wasted verify work, not wrong answers;
    // the S-curve near the threshold is shallow, so tight two-sided
    // budgets cost thousands of hashes)
    for ((t, fp, fn) <- Seq((0.5, 0.3, 0.05), (0.7, 0.3, 0.05), (0.9, 0.1, 0.1),
                            (0.9, 0.05, 0.05), (0.8, 0.2, 0.02))) {
      val (b, r) = Dedup.lshParamsFor(t, fpBudget = fp, fnBudget = fn, margin = 0.1)
      val pHi = Dedup.lshDetectionProbability(t + 0.1, b, r)
      val pLo = Dedup.lshDetectionProbability(t - 0.1, b, r)
      assert(pHi >= 1.0 - fn, s"t=$t fp=$fp fn=$fn -> ${b}x$r: P(hi)=$pHi misses the FN budget")
      assert(pLo <= fp, s"t=$t fp=$fp fn=$fn -> ${b}x$r: P(lo)=$pLo blows the FP budget")
      assert(b * r <= 1024)
    }
  }

  test("lshParamsFor: cheapest signature wins — no smaller hash count satisfies the budgets") {
    val (b, r) = Dedup.lshParamsFor(0.5, fpBudget = 0.3, fnBudget = 0.05, margin = 0.1)
    val k = b * r
    // exhaustive check below the chosen cost: nothing cheaper works
    for (r2 <- 1 to 32; b2 <- 1 to (k - 1) / r2) {
      val ok = Dedup.lshDetectionProbability(0.6, b2, r2) >= 0.95 &&
        Dedup.lshDetectionProbability(0.4, b2, r2) <= 0.3
      assert(!ok || b2 * r2 >= k, s"${b2}x$r2 (${b2 * r2} hashes) beats chosen ${b}x$r ($k)")
    }
  }

  test("lshParamsFor: the hard-coded 12x4 default matches its documented operating point") {
    assert(Dedup.lshDetectionProbability(0.7, 12, 4) >= 0.96)
    assert(Dedup.lshDetectionProbability(0.9, 12, 4) >= 0.99999)
    assert(Dedup.lshDetectionProbability(0.2, 12, 4) <= 0.02)
    // honest about the soft spot: J=0.6 detection is ~0.81, NOT ~1
    val p06 = Dedup.lshDetectionProbability(0.6, 12, 4)
    assert(p06 > 0.80 && p06 < 0.82)
  }

  test("lshParamsFor: impossible separations fail loud, not silently degrade") {
    intercept[IllegalArgumentException] {
      Dedup.lshParamsFor(0.5, fpBudget = 1e-9, fnBudget = 1e-9, margin = 0.01, maxHashes = 64)
    }
    intercept[IllegalArgumentException] {
      Dedup.lshParamsFor(0.05, margin = 0.1) // threshold - margin <= 0
    }
  }

  // ---- SemDeDup-style clustered semantic dedup ------------------------

  /** Clustered synthetic: 30 tight clusters of 4 near-identical unit
    * vectors (the true near-dup pairs) + 80 scattered singletons. */
  private def semFixture(): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Double])]
    var id = 0L
    for (_ <- 0 until 30) {
      val base = unit(Array.fill(16)(rnd.nextGaussian()))
      for (_ <- 0 until 4) {
        rows += ((id, unit(base.map(_ + rnd.nextGaussian() * 0.02)))); id += 1
      }
    }
    for (_ <- 0 until 80) {
      rows += ((id, unit(Array.fill(16)(rnd.nextGaussian())))); id += 1
    }
    rows.toSeq.toDF("vec_id", "embedding")
  }

  test("semanticNearDupPairs: recall >= 0.9 vs brute force, precision exact") {
    val df = semFixture()
    val brute = graft.operators.Similarity.cosineNearDupPairs(
        df.withColumn("_one", org.apache.spark.sql.functions.lit(1)),
        "vec_id", "embedding", blockCols = Seq("_one"), threshold = 0.98)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.size >= 30 * 5, s"fixture must contain real near-dup pairs, got ${brute.size}")
    val model = graft.operators.Ivf.train(df, "vec_id", "embedding", k = 6, iters = 3)
    val got = Dedup.semanticNearDupPairs(df, "vec_id", "embedding", model, threshold = 0.98)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(brute), "every found pair must verify (precision 1.0)")
    val recall = got.size.toDouble / brute.size
    assert(recall >= 0.9, s"cell-blocked recall $recall below 0.9 (${got.size}/${brute.size})")
  }

  test("semanticNearDupPairs: multi-probe recall >= single-probe, no duplicate pairs") {
    val df = semFixture()
    val brute = graft.operators.Similarity.cosineNearDupPairs(
        df.withColumn("_one", org.apache.spark.sql.functions.lit(1)),
        "vec_id", "embedding", blockCols = Seq("_one"), threshold = 0.98)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val model = graft.operators.Ivf.train(df, "vec_id", "embedding", k = 6, iters = 3)
    def run(cells: Int): Seq[(Long, Long)] =
      Dedup.semanticNearDupPairs(df, "vec_id", "embedding", model,
          threshold = 0.98, assignCells = cells)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val one = run(1)
    val two = run(2)
    assert(two.size === two.distinct.size, "multi-probe must emit each pair once")
    assert(two.toSet.subsetOf(brute), "precision stays exact under multi-probe")
    assert(two.toSet.size >= one.toSet.size,
      s"probing 2 cells must not lose pairs (1-cell ${one.size}, 2-cell ${two.size})")
    assert(two.toSet.size.toDouble / brute.size >= 0.9)
  }

  test("TopCells expression: ordered nearest cells, ties to lower index, codegen==interp") {
    import org.apache.spark.sql.functions.{col, lit}
    // centroids: unit axes e0, e1, e2 in 3-d
    val model = graft.operators.Ivf.Model(Array(
      Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0), Array(0.0, 0.0, 1.0)))
    val df = Seq(
      (1L, Seq(0.9, 0.5, 0.1)),   // nearest e0 then e1
      (2L, Seq(0.1, 0.1, 0.9)),   // nearest e2; e0/e1 tie -> lower index
      (3L, Seq(0.5, 0.5, 0.0))    // e0/e1 tie at the TOP -> e0 first
    ).toDF("id", "embedding")
    val got = graft.operators.Ivf.attachTopCells(df, "embedding", model, nCells = 2)
      .select(col("id"), col("cells")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(got(1L) === Seq(0, 1))
    assert(got(2L) === Seq(2, 0))
    assert(got(3L) === Seq(0, 1))
    val codegenOff = spark.conf.getOption("spark.sql.codegen.wholeStage")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val interp = graft.operators.Ivf.attachTopCells(df, "embedding", model, nCells = 2)
        .select(col("id"), col("cells")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      assert(interp === got)
    } finally codegenOff.foreach(spark.conf.set("spark.sql.codegen.wholeStage", _))
  }

  test("dropSemanticNearDups keeps exactly one min-id representative per cluster") {
    val df = semFixture()
    val model = graft.operators.Ivf.train(df, "vec_id", "embedding", k = 6, iters = 3)
    val pairs = Dedup.semanticNearDupPairs(df, "vec_id", "embedding", model,
        threshold = 0.98, assignCells = 2)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val kept = Dedup.dropSemanticNearDups(df, "vec_id", "embedding", model,
        threshold = 0.98, assignCells = 2)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // reference union-find over the found pairs
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = { var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val allIds = df.select("vec_id").collect().map(_.getLong(0))
    val expect = allIds.filter(id => find(id) == id).toSet
    assert(kept === expect, "survivors must be exactly the component min-ids")
    assert(kept.size < allIds.length, "clusters must actually prune")
  }

  test("TopCells degrades on NaN vectors instead of crashing the job") {
    val model = graft.operators.Ivf.Model(Array(
      Array(1.0, 0.0), Array(0.0, 1.0), Array(0.5, 0.5)))
    val df = Seq((1L, Seq(Double.NaN, 0.3)), (2L, Seq(0.9, 0.1)))
      .toDF("id", "embedding")
    val got = graft.operators.Ivf.attachTopCells(df, "embedding", model, nCells = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](r.length - 1)).toMap
    assert(got(1L).distinct.size === 2 && got(1L).forall(c => c >= 0 && c < 3),
      "NaN-poisoned scores must yield valid distinct cells")
    assert(got(2L).head === 0, "clean vectors keep exact argmax")
  }

  test("semanticNearDupPairs: the verify join is per-cell, never all-pairs") {
    val df = semFixture()
    val model = graft.operators.Ivf.train(df, "vec_id", "embedding", k = 6, iters = 1)
    val plan = Dedup.semanticNearDupPairs(df, "vec_id", "embedding", model, threshold = 0.98)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"pairing must be an equi-join on the cell:\n$plan")
    assert(plan.contains("_sem_cell"), s"join must key on the learned cell:\n$plan")
  }

  test("keepFirstLinesAcrossDocs: global (doc, pos) keep-first; blanks structural") {
    val docs = Seq(
      (1L, "alpha\nshared\n\nbody one"),
      (2L, "shared\nbeta\n\nbody two"),  // 'shared' already seen in doc 1
      (3L, "shared\nalpha\ngamma"),      // both repeats vanish
      (4L, "shared"),                    // reduced to nothing -> empty string
      (5L, "echo\necho")                 // within-doc repeat also deduped
    ).toDF("id", "text")
    val out = Dedup.keepFirstLinesAcrossDocs(docs, "id", "text")
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(out === Seq(
      (1L, "alpha\nshared\n\nbody one"),
      (2L, "beta\n\nbody two"),
      (3L, "gamma"),
      (4L, ""),
      (5L, "echo")))
  }

  test("dropNearDupsKeepBest keeps the argmax-score member, not the min id") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      // transitive cluster {1,2,3} via 1-2, 2-3: scores tie at 50 for
      // ids 2 and 3 -> lowest id among the best wins (2), never min-id 1
      (1L, "a", 10L), (2L, "a", 50L), (3L, "a", 50L),
      (10L, "b", 5L),                 // singleton survives untouched
      (20L, "c", 1L), (21L, "c", 2L)  // best is the HIGHER id (21)
    ).toDF("id", "text", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (20L, 21L)).toDF("id_a", "id_b")
    val out = Dedup.dropNearDupsKeepBest(docs, "id", pairs, col("score"))
    assert(out.columns.toSeq === Seq("id", "text", "score"), "original columns survive")
    assert(out.select("id").as[Long].collect().toSet === Set(2L, 10L, 21L))
    // the min-id rule keeps {1, 10, 20}: the refinement changes survivors
    val minId = Dedup.connectedComponents(docs.select(col("id")), "id", pairs)
    assert(minId.filter(col("id") === col("rep")).select("id").as[Long]
      .collect().toSet === Set(1L, 10L, 20L))
  }

  test("containmentPairs flags a prefix excerpt that Jaccard under-scores") {
    // doc 1: 12 tokens; doc 2: its first 6 tokens (prefix excerpt).
    // Excerpt shingles are a SUBSET of the original's: containment = 1.0,
    // while J = |A|/|B| = 4/10 sits far below a 0.5 Jaccard gate.
    val words = (1 to 12).map(i => s"w$i").mkString(" ")
    val half = (1 to 6).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, words, "en"), (2L, half, "en"),
      (3L, "completely different text here now", "en"))
      .toDF("id", "text", "lang")
    val cont = Dedup.containmentPairs(docs, "id", "text", Seq("lang"), 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(cont.toSeq === Seq((1L, 2L, 1.0)))
    val jac = Dedup.ngramJaccardPairs(docs, "id", "text", Seq("lang"), 0.5)
    assert(jac.count() === 0L, "symmetric Jaccard misses the excerpt at 0.5")
    // shared candidate stage: lowering the Jaccard gate surfaces the
    // SAME pair — the two metrics see one pair set
    val jacLow = Dedup.ngramJaccardPairs(docs, "id", "text", Seq("lang"), 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(jacLow.toSeq === Seq((1L, 2L)))
  }
}
