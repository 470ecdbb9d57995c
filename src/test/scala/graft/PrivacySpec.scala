package graft

import graft.operators.Privacy
import org.apache.spark.sql.functions._

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  // two equivalence classes on (region, tier): ("e","a") has 3 rows /
  // 3 distinct sensitive values; ("w","b") has 2 rows / 1 distinct
  private val d = Seq(
    (1L, "e", "a", 100.0),
    (2L, "e", "a", 250.0),
    (3L, "e", "a", 390.0),
    (4L, "w", "b", 120.0),
    (5L, "w", "b", 145.0)
  ).toDF("id", "region", "tier", "bal")

  test("annotate: class sizes, distinct sensitive counts, both gates") {
    val out = Privacy.annotate(d, Seq("region", "tier"),
        floor(col("bal") / 100).cast("long"), k = 3, l = 2)
      .select("id", "grp_n", "distinct_sens", "k_ok", "l_ok")
      .orderBy("id").collect()
    // (e,a): n=3, sens bands {1,2,3} -> 3 distinct; both gates pass
    for (i <- 0 until 3)
      assert(out(i).toSeq.drop(1) === Seq(3L, 3L, true, true))
    // (w,b): n=2 < k; bands {1,1} -> 1 distinct < l; both fail
    for (i <- 3 until 5)
      assert(out(i).toSeq.drop(1) === Seq(2L, 1L, false, false))
  }

  test("suppress: only fully-passing classes survive, flags dropped") {
    val out = Privacy.suppress(d, Seq("region", "tier"),
      floor(col("bal") / 100).cast("long"), k = 3, l = 2)
    assert(out.columns.toSet === d.columns.toSet)
    assert(out.select("id").as[Long].collect().sorted.toSeq === Seq(1L, 2L, 3L))
  }

  test("generalizeUntilK: picks the smallest passing width") {
    // ids 0..19 with value = id*10 (0..190), one category: width 100
    // gives classes {0..9}=10 and {10..19}=10 -> k=10 passes at 100;
    // width 50 gives classes of 5 -> fails
    val d = spark.range(20).toDF("id")
      .withColumn("cat", lit("a")).withColumn("v", col("id") * 10.0)
    val out = graft.operators.Privacy.generalizeUntilK(
      d, Seq("cat"), col("v"), widths = Seq(50L, 100L, 200L), k = 10)
    val rows = out.select("id", "gen_width", "bucket", "grp_n", "k_ok")
      .orderBy("id").collect()
    assert(rows.forall(_.getLong(1) === 100L))
    assert(rows.forall(_.getBoolean(4)))
    assert(rows.map(_.getLong(2)).toSet === Set(0L, 1L))
    assert(rows.forall(_.getLong(3) === 10L))
  }

  test("generalizeUntilK: falls back to the widest width when none passes") {
    val d = spark.range(4).toDF("id")
      .withColumn("cat", lit("a")).withColumn("v", col("id") * 100.0)
    val out = graft.operators.Privacy.generalizeUntilK(
        d, Seq("cat"), col("v"), widths = Seq(100L, 200L), k = 10)
      .select("gen_width", "k_ok").collect()
    assert(out.forall(_.getLong(0) === 200L))
    assert(out.forall(!_.getBoolean(1)))
  }

  test("generalizeUntilK: negative values bucket by floor on every ladder rung") {
    val d = Seq(("a", -150.0), ("a", -50.0), ("a", 50.0)).toDF("cat", "v")
    val out = graft.operators.Privacy.generalizeUntilK(
        d, Seq("cat"), col("v"), widths = Seq(100L, 200L), k = 1)
      .select("v", "bucket").collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    // k=1 passes at the finest width 100: floor(-150/100) = -2
    assert(out === Map(-150.0 -> -2L, -50.0 -> -1L, 50.0 -> 0L))
  }

  test("dpNoisyCounts: deterministic, bounded noise, true count optional") {
    val d = Seq(("x", 1), ("x", 2), ("x", 3), ("y", 1)).toDF("g", "i")
    val a = graft.operators.Privacy.dpNoisyCounts(d, Seq("g"), eps = 0.5,
      salt = "s", keepTrueCount = true).orderBy("g").collect()
    val b = graft.operators.Privacy.dpNoisyCounts(d, Seq("g"), eps = 0.5,
      salt = "s", keepTrueCount = true).orderBy("g").collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq, "same salt -> same release")
    assert(a.map(_.getString(0)).toSeq === Seq("x", "y"))
    assert(a(0).getLong(1) === 3L && a(1).getLong(1) === 1L)
    // noise is finite and centered-ish: |noisy - n| plausible for b=2
    for (r <- a) assert(math.abs(r.getDouble(2) - r.getLong(1)) < 50.0)
    // a different salt moves the release
    val c = graft.operators.Privacy.dpNoisyCounts(d, Seq("g"), eps = 0.5,
      salt = "t", keepTrueCount = true).orderBy("g").collect()
    assert(c.map(_.getDouble(2)).toSeq !== a.map(_.getDouble(2)).toSeq)
    // release form drops the true count
    val rel = graft.operators.Privacy.dpNoisyCounts(d, Seq("g"), eps = 0.5, salt = "s")
    assert(rel.columns.toSeq === Seq("g", "noisy_n"))
  }

  test("annotate: NULL quasi values form their own class and are never dropped") {
    val d = Seq(
      (1L, Some("e"), "a", 100.0), (2L, Some("e"), "a", 250.0),
      (3L, None, "a", 300.0), (4L, None, "a", 410.0)
    ).toDF("id", "region", "tier", "bal")
    val out = graft.operators.Privacy.annotate(d, Seq("region", "tier"),
        floor(col("bal") / 100).cast("long"), k = 2, l = 2)
      .select("id", "grp_n", "k_ok").orderBy("id").collect()
    assert(out.length === 4, "null-keyed rows must survive the annotate join")
    assert(out.map(_.getLong(1)).toSeq === Seq(2L, 2L, 2L, 2L))
    assert(out.forall(_.getBoolean(2)))
  }

  test("generalizeUntilK: empty input yields empty output, not an NPE") {
    val d = Seq.empty[(String, Double)].toDF("cat", "v")
    val out = graft.operators.Privacy.generalizeUntilK(
      d, Seq("cat"), col("v"), widths = Seq(100L, 200L), k = 5)
    assert(out.count() === 0L)
    assert(out.columns.contains("gen_width"))
  }

  test("dpNoisyCounts: delimiter-shaped values and NULL keys never collide") {
    val d = Seq(
      (Some("x|y"), Some("z")), (Some("x"), Some("y|z")),
      (None, Some("n")), (Some(""), Some("n"))
    ).toDF("a", "b")
    val out = graft.operators.Privacy.dpNoisyCounts(d, Seq("a", "b"), eps = 1.0,
      salt = "s", keepTrueCount = true).collect()
    assert(out.length === 4)
    val noises = out.map(r => r.getDouble(r.length - 1) - r.getLong(r.length - 2))
    assert(noises.distinct.length === 4,
      "every group (incl. null vs '' and pipe-shaped values) draws distinct noise")
  }

  test("annotate: l gate is independent of k gate") {
    // k=2 passes both classes; l=2 still fails the homogeneous one
    val out = Privacy.annotate(d, Seq("region", "tier"),
        floor(col("bal") / 100).cast("long"), k = 2, l = 2)
      .select("id", "k_ok", "l_ok").orderBy("id").collect()
    assert(out.forall(_.getBoolean(1)))
    assert(out.map(r => (r.getLong(0), r.getBoolean(2))).toSeq ===
      Seq((1L, true), (2L, true), (3L, true), (4L, false), (5L, false)))
  }

  test("tCloseness: hand-computed EMD, unequal group sizes") {
    // g1: sens [0,0,1,1] (n=4), g2: [1,1] (n=2); global q=(1/3, 2/3), m=2
    // EMD(g1) = |0.5 - 1/3| = 1/6; EMD(g2) = |0 - 1/3| = 1/3
    val d = Seq(("g1", 0L), ("g1", 0L), ("g1", 1L), ("g1", 1L),
      ("g2", 1L), ("g2", 1L)).toDF("grp", "sens")
    val out = Privacy.tCloseness(d, Seq("grp"), col("sens"), t = 0.2)
      .orderBy("grp").collect()
    assert(out.map(_.getString(0)).toSeq === Seq("g1", "g2"))
    assert(out.map(_.getAs[Long]("grp_n")).toSeq === Seq(4L, 2L))
    assert(out.map(_.getAs[Double]("t_emd")).toSeq === Seq(0.166667, 0.333333))
    assert(out.map(_.getAs[Boolean]("t_ok")).toSeq === Seq(true, false))
  }

  test("tCloseness: a single global sensitive bin fails LOUD, not null/Inf (advisor r16)") {
    // one distinct sensitive value -> m=1 -> (m-1)=0 denominator; the
    // operator must raise a meaningful error instead of releasing
    // null/Inf (or an opaque ANSI divide error)
    val d = Seq(("g1", 7L), ("g1", 7L), ("g2", 7L)).toDF("grp", "sens")
    val e = intercept[Exception] {
      Privacy.tCloseness(d, Seq("grp"), col("sens"), t = 0.2).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("2 distinct global")),
      s"expected the >=2-bins message, got: ${messages(e).mkString(" | ")}")
  }

  test("dpNoisyMeans and dpNoisyCounts share ONE sign convention for the shared draw (advisor r16)") {
    // same group key + same salt -> identical unit Laplace draw; the two
    // mechanisms must push the release the SAME direction (the r16
    // advisor found means using +scale while counts used -scale —
    // mirror-image noise for the same key)
    val d = Seq(("x", 10.0), ("x", 20.0), ("x", 30.0),
      ("y", 5.0), ("y", 15.0)).toDF("g", "v")
    val counts = graft.operators.Privacy.dpNoisyCounts(d, Seq("g"), eps = 0.5,
        salt = "conv", keepTrueCount = true).orderBy("g").collect()
      .map(r => r.getString(0) -> (r.getDouble(2) - r.getLong(1))).toMap
    val means = graft.operators.Privacy.dpNoisyMeans(d, Seq("g"), "v",
        clip = 100.0, eps = 0.5, salt = "conv", keepTrueMean = true)
      .orderBy("g").collect()
      .map(r => r.getString(0) ->
        (r.getAs[Double]("noisy_mean") - r.getAs[Double]("mean"))).toMap
    for (g <- Seq("x", "y")) {
      assert(counts(g) !== 0.0)
      assert(math.signum(counts(g)) === math.signum(means(g)),
        s"group $g: counts noise ${counts(g)} vs means noise ${means(g)} must share sign")
    }
  }

  test("tCloseness: missing global bins complete as zeros in the cumulative walk") {
    // g2 lacks bin 1 entirely; global bins {0,1,2}, m=3
    // g1 p=(1/3,1/3,1/3) q=(1/3,1/6,1/2): cums 0, 1/6, 0 -> EMD 1/12
    // g2 p=(1/3,0,2/3):                   cums 0,-1/6, 0 -> EMD 1/12
    val d = Seq(("g1", 0L), ("g1", 1L), ("g1", 2L),
      ("g2", 0L), ("g2", 2L), ("g2", 2L)).toDF("grp", "sens")
    val out = Privacy.tCloseness(d, Seq("grp"), col("sens"), t = 0.1)
      .orderBy("grp").collect()
    assert(out.map(_.getAs[Double]("t_emd")).toSeq === Seq(0.083333, 0.083333))
    assert(out.forall(_.getAs[Boolean]("t_ok")))
  }
}
