package graft

import graft.operators.Sample
import scala.util.Random

class SampleSpec extends SparkSpec {
  import spark.implicits._

  private val rows = {
    val rnd = new Random(61)
    (0L until 500L).map(i => (i, s"k${rnd.nextInt(5)}"))
  }

  test("capPerKey keeps at most k per key; small groups survive whole") {
    val df = (rows :+ (9999L, "lonely")).toDF("id", "k")
    val out = Sample.capPerKey(df, Seq("k"), "id", k = 20)
      .as[(Long, String)].collect()
    val byKey = out.groupBy(_._2).view.mapValues(_.length).toMap
    byKey.foreach { case (key, n) => assert(n <= 20, s"$key kept $n") }
    assert(byKey("lonely") == 1)
    assert(out.toSet.subsetOf((rows :+ (9999L, "lonely")).toSet), "output rows must come from input")
  }

  test("selection is deterministic across partitionings and independent of row order") {
    val base = Sample.capPerKey(rows.toDF("id", "k"), Seq("k"), "id", 7)
      .as[(Long, String)].collect().toSet
    (1 to 5).foreach { p =>
      val shuffled = new Random(p).shuffle(rows).toDF("id", "k").repartition(p * 2)
      val got = Sample.capPerKey(shuffled, Seq("k"), "id", 7).as[(Long, String)].collect().toSet
      assert(got === base, s"partitioning $p changed the sample")
    }
  }

  test("hashSplit: exhaustive labels, stable under corpus growth, ~fractions") {
    val big = (0L until 5000L).map(i => (i, s"d$i")).toDF("id", "payload")
    val frac = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val counts = Sample.hashSplit(big, "id", frac)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.keySet === Set("train", "val", "test"), "every row gets a bucket")
    assert(counts.values.sum === 5000L)
    assert(math.abs(counts("train") - 4000.0) / 4000.0 < 0.05)
    assert(math.abs(counts("val") - 500.0) / 500.0 < 0.2)
    // growth stability: the first 500 ids keep their assignment when the
    // corpus grows 10x — the clean-test-set property
    val small = Sample.hashSplit(big.filter($"id" < 500), "id", frac)
      .select("id", "split").as[(Long, String)].collect().toSet
    val fromBig = Sample.hashSplit(big, "id", frac).filter($"id" < 500)
      .select("id", "split").as[(Long, String)].collect().toSet
    assert(small === fromBig, "growing the corpus must not reassign rows")
  }

  test("acceptByScore: rate tracks the score; 0 and 1 are absorbing") {
    val df = (0L until 8000L).map { i =>
      val score = (i % 4) match {
        case 0 => 0.0; case 1 => 0.25; case 2 => 0.75; case 3 => 1.0
      }
      (i, score)
    }.toDF("id", "score")
    val kept = Sample.acceptByScore(df, "id", "score")
      .groupBy("score").count().as[(Double, Long)].collect().toMap
    assert(!kept.contains(0.0), "score 0 keeps nothing")
    assert(kept(1.0) === 2000L, "score 1 keeps everything")
    assert(math.abs(kept(0.25) - 500.0) / 500.0 < 0.15, s"got ${kept(0.25)}")
    assert(math.abs(kept(0.75) - 1500.0) / 1500.0 < 0.15, s"got ${kept(0.75)}")
    // deterministic: same inputs -> same selection
    val again = Sample.acceptByScore(df, "id", "score").count()
    assert(again === kept.values.sum)
  }

  test("acceptByScore fails loudly on null or NaN scores (never a silent drop)") {
    val withNull = Seq((1L, Some(0.5)), (2L, Option.empty[Double])).toDF("id", "score")
    val e1 = intercept[Exception] { Sample.acceptByScore(withNull, "id", "score").count() }
    assert(e1.getMessage != null)
    val withNan = Seq((1L, 0.5), (2L, Double.NaN)).toDF("id", "score")
    val e2 = intercept[Exception] { Sample.acceptByScore(withNan, "id", "score").count() }
    assert(e2.getMessage != null)
  }

  test("hashSplit clamps a cumulative fraction of exactly 1.0 to the 8-hex ceiling") {
    // sums to 1.0 + 1e-10: passes the tolerance, and the first bucket's
    // cumulative fraction is exactly 1.0 — unclamped it would format as
    // the 9-char '100000000' and lexicographically lose to most draws
    val df = (0L until 2000L).map(i => (i, i)).toDF("id", "v")
    val counts = Sample.hashSplit(df, "id", Seq("a" -> 1.0, "b" -> 1e-10))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.getOrElse("a", 0L) === 2000L, s"bucket a must take everything: $counts")
  }

  test("hashSplit validates fractions and rejects colliding split column") {
    val df = Seq((1L, "x")).toDF("id", "split")
    intercept[IllegalArgumentException] {
      Sample.hashSplit(df, "id", Seq("a" -> 0.5, "b" -> 0.4)) // sums to 0.9
    }
    intercept[IllegalArgumentException] {
      Sample.hashSplit(df, "id", Seq("a" -> 0.5, "b" -> 0.5)) // 'split' exists
    }
  }

  test("shuffleShards: near-uniform shards, deterministic, salt re-deals the order") {
    val df = (0L until 4000L).map(i => (i, s"d$i")).toDF("id", "payload")
    val sizes = Sample.shuffleShards(df, "id", nShards = 8)
      .groupBy("shard").count().as[(Int, Long)].collect().toMap
    assert(sizes.keySet === (0 until 8).toSet, "every shard populated")
    sizes.values.foreach(n => assert(math.abs(n - 500.0) / 500.0 < 0.25, s"skewed shard: $n"))
    val a = Sample.shuffleShards(df, "id", 8).select("id", "shard", "shuffle_key")
      .as[(Long, Int, String)].collect().toSet
    val b = Sample.shuffleShards(df, "id", 8).select("id", "shard", "shuffle_key")
      .as[(Long, Int, String)].collect().toSet
    assert(a === b, "assignment is deterministic")
    val c = Sample.shuffleShards(df, "id", 8, salt = "epoch1")
      .select("id", "shard", "shuffle_key").as[(Long, Int, String)].collect().toSet
    assert(a != c, "a new salt re-deals the order")
  }

  test("salt changes the draw") {
    val df = rows.toDF("id", "k")
    val a = Sample.capPerKey(df, Seq("k"), "id", 7).as[(Long, String)].collect().toSet
    val b = Sample.capPerKey(df, Seq("k"), "id", 7, salt = "epoch2").as[(Long, String)].collect().toSet
    assert(a != b, "different salts should select different rows")
    assert(a.size == b.size)
  }

  test("stratified: per-stratum rates tracked, absorbing 0/1, default applied") {
    val df = (1L to 3000L).map(i =>
      (i, if (i % 3 == 0) "web" else if (i % 3 == 1) "books" else "code"))
      .toDF("id", "src")
    val kept = Sample.stratified(df, "id", "src",
        rates = Map("web" -> 0.2, "books" -> 1.0, "code" -> 0.0), defaultRate = 0.5)
      .as[(Long, String)].collect().toSeq
    val bySrc = kept.groupBy(_._2).view.mapValues(_.size).toMap
    assert(bySrc.getOrElse("code", 0) === 0, "rate 0 keeps nothing")
    assert(bySrc("books") === 1000, "rate 1 keeps everything")
    assert(math.abs(bySrc("web") - 200) < 60, s"web ~20%, got ${bySrc.get("web")}")
    // a stratum not in the map uses defaultRate
    val other = Sample.stratified(
        df.withColumn("src", org.apache.spark.sql.functions.lit("unlisted")), "id", "src",
        rates = Map("web" -> 0.2), defaultRate = 0.5).count()
    assert(math.abs(other - 1500L) < 150, s"default 0.5, got $other")
  }

  test("stratified: stable under corpus growth and across strata") {
    val small = (1L to 500L).map(i => (i, if (i % 2 == 0) "a" else "b")).toDF("id", "src")
    val grown = (1L to 1000L).map(i => (i, if (i % 2 == 0) "a" else "b")).toDF("id", "src")
    val rates = Map("a" -> 0.3, "b" -> 0.7)
    val keptSmall = Sample.stratified(small, "id", "src", rates)
      .as[(Long, String)].collect().toSet
    val keptGrown = Sample.stratified(grown, "id", "src", rates)
      .as[(Long, String)].collect().toSet
    assert(keptSmall.subsetOf(keptGrown),
      "growing the corpus never reverses an existing keep decision")
    // validation
    intercept[IllegalArgumentException] {
      Sample.stratified(small, "id", "src", Map("a" -> 1.5))
    }
    intercept[IllegalArgumentException] {
      Sample.stratified(small, "id", "src", Map.empty[String, Double])
    }
  }

  test("quantileNormalize: per-group percent rank calibrates scales; ties share ranks") {
    import org.apache.spark.sql.functions.col
    // group a: scores 10,20,30,40 (wide scale); group b: 0.1,0.2,0.2,0.3
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 30.0), ("a", 4L, 40.0),
      ("b", 5L, 0.1), ("b", 6L, 0.2), ("b", 7L, 0.2), ("b", 8L, 0.3)
    ).toDF("g", "id", "score")
    val out = Sample.quantileNormalize(df, Seq("g"), "score")
      .select("id", "score_q").as[(Long, Double)].collect().toMap
    // scales differ 100x but calibrated ranks are identical shape
    assert(out(1L) === 0.0 && out(4L) === 1.0)
    assert(out(2L) === out(6L) && out(2L) === 0.333333, "same quantile across groups (rounded 6)")
    assert(out(6L) === out(7L), "ties share a rank (percent_rank semantics)")
    assert(out(8L) === 1.0)
    // composes with acceptByScore: calibrated keep-probability per group
    val kept = Sample.acceptByScore(
      Sample.quantileNormalize(df, Seq("g"), "score"), "id", "score_q")
    assert(kept.count() <= 8)
    // null scores fail loud, same stance as the rest of the family
    val bad = Seq(("a", 1L, Option.empty[Double])).toDF("g", "id", "score")
    val e = intercept[Exception] {
      Sample.quantileNormalize(bad, Seq("g"), "score").collect()
    }
    assert(e.getMessage.contains("quantileNormalize requires non-null"))
  }

  test("weightedTopK: selection matches hand-computed E-S priorities") {
    import org.apache.spark.sql.functions.col
    val df = (1L to 20L).map(i => (i, s"doc$i", i.toDouble)).toDF("id", "text", "w")
    val got = Sample.weightedTopK(df, "id", "w", k = 5, salt = "t")
      .select("id").as[Long].collect().toSet
    // reimplement the draw: u = (top-32 md5 bits + 0.5)/2^32, key = ln(u)/w
    def key(id: Long, w: Double): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"t|$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      val u = (java.lang.Long.parseLong(md.substring(0, 8), 16) + 0.5) / 4294967296.0
      BigDecimal(math.log(u) / w).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expect = (1L to 20L).map(i => i -> key(i, i.toDouble))
      .sortBy { case (id, k0) => (-k0, id) }.take(5).map(_._1).toSet
    assert(got === expect, s"got $got expect $expect")
  }

  test("weightedTopK: k=1 inclusion probability tracks w/sum(w) (E-S property)") {
    import org.apache.spark.sql.functions.col
    // 400 independent replicas of {a: w=9, b: w=1}; per-replica top-1.
    // P(a) = 0.9 exactly for k=1 under E-S; sd over 400 trials ~0.015.
    val rows = (0 until 400).flatMap(r =>
      Seq((r, s"r$r-a", 9.0, "a"), (r, s"r$r-b", 1.0, "b")))
    val df = rows.toDF("rep", "id", "w", "tag")
    val winners = Sample.weightedTopK(df, "id", "w", k = 1, groupCols = Seq("rep"))
      .groupBy("tag").count().as[(String, Long)].collect().toMap
    val fracA = winners.getOrElse("a", 0L).toDouble / 400.0
    assert(fracA > 0.84 && fracA < 0.96, s"P(a)=$fracA, expected ~0.9")
    // a different salt re-deals at least SOME replicas; same salt repeats
    val w1 = Sample.weightedTopK(df, "id", "w", k = 1, groupCols = Seq("rep"))
      .select("id").as[String].collect().toSet
    val w2 = Sample.weightedTopK(df, "id", "w", k = 1, groupCols = Seq("rep"),
      salt = "epoch2").select("id").as[String].collect().toSet
    assert(w1 !== w2, "salt re-deals the draw")
    assert(w1 === Sample.weightedTopK(df, "id", "w", k = 1, groupCols = Seq("rep"))
      .select("id").as[String].collect().toSet, "same salt -> same selection")
  }

  test("weightedTopK: non-positive or null weights fail loud; global path caps at k") {
    val bad = Seq((1L, 0.0), (2L, 3.0)).toDF("id", "w")
    val e = intercept[Exception] {
      Sample.weightedTopK(bad, "id", "w", k = 1).collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(_.contains("weightedTopK requires positive")), chain(e).mkString(" | "))
    val ok = (1L to 50L).map(i => (i, 1.0)).toDF("id", "w")
    assert(Sample.weightedTopK(ok, "id", "w", k = 7).count() === 7)
  }

  test("kFold: deterministic, near-uniform, exhaustive and disjoint") {
    import graft.operators.Sample
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = (0L until 5000L).toDF("id")
    val f1 = Sample.kFold(df, "id", k = 5).select("id", "fold")
      .as[(Long, Int)].collect().toMap
    val f2 = Sample.kFold(df, "id", k = 5).select("id", "fold")
      .as[(Long, Int)].collect().toMap
    assert(f1 === f2, "same salt => same folds")
    assert(f1.values.toSet === Set(0, 1, 2, 3, 4))
    val sizes = f1.values.groupBy(identity).map(_._2.size)
    assert(sizes.min > 800 && sizes.max < 1200, s"fold sizes $sizes")
    // different salt re-deals
    val g = Sample.kFold(df, "id", k = 5, salt = "cv2").select("id", "fold")
      .as[(Long, Int)].collect().toMap
    assert(f1.count { case (k, v) => g(k) == v } < 1500, "salt must re-deal")
    intercept[IllegalArgumentException](Sample.kFold(df, "id", k = 1))
  }

  test("clusterBalanced flattens a planted dense mode and is deterministic") {
    // two well-separated modes in 4-d: 400 points near e1 (the dense
    // crawl mode), 25 near e2 — uniform sampling keeps the 16:1 skew,
    // cluster-balanced must not
    val rnd = new Random(7)
    def jitter(base: Array[Float]): Array[Float] =
      base.map(x => x + (rnd.nextFloat() - 0.5f) * 0.1f)
    val dense = (0L until 400L).map(i => (i, jitter(Array(1f, 0f, 0f, 0f))))
    val sparse = (1000L until 1025L).map(i => (i, jitter(Array(0f, 1f, 0f, 0f))))
    val df = (dense ++ sparse).toDF("id", "vec")
    // hand-built centroids: the test pins the SAMPLER's semantics, and
    // k-means init on a 16:1 fixture can legitimately local-optimum
    // both seeds into the dense mode (IvfSpec owns trainer behavior)
    val model = graft.operators.Ivf.Model(
      Array(Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 1.0, 0.0, 0.0)))
    val out = Sample.clusterBalanced(df, "id", "vec", model, capPerCell = 25)
      .select("id").as[Long].collect().toSet
    val nDense = out.count(_ < 1000L)
    val nSparse = out.size - nDense
    assert(nSparse === 25, "the sparse mode survives whole")
    assert(nDense === 25, s"dense mode must cap at exactly 25, kept $nDense")
    // deterministic: a second run selects the identical id set
    val again = Sample.clusterBalanced(df, "id", "vec", model, capPerCell = 25)
      .select("id").as[Long].collect().toSet
    assert(again === out)
    // cell column collision fails loudly instead of silently overwriting
    intercept[IllegalArgumentException](Sample.clusterBalanced(
      df.withColumn("cell", org.apache.spark.sql.functions.lit(1)),
      "id", "vec", model, capPerCell = 5))
  }
}
