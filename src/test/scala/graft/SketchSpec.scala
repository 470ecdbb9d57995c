package graft

import org.apache.spark.sql.functions._

/** Sketch aggregates: error bounds vs exact, and — the property that
  * matters at scale — mergeability: HLL sketches built over disjoint
  * slices union into the same estimate as one sketch over everything,
  * so incremental/partitioned pipelines never re-scan raw data. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  // group and user indices must be independent: i%4 vs i%1500 would give
  // each group only the users congruent to it mod gcd(4,1500)=4
  private val rows = (0 until 24000).map { i =>
    (i % 4, s"user${(i / 4) % 1500}") // 4 groups, the same 1500 users each
  }

  test("approx_count_distinct and HLL estimates stay within 5% of exact") {
    val df = rows.toDF("g", "user")
    val got = df.groupBy($"g")
      .agg(
        count_distinct($"user").as("exact"),
        approx_count_distinct($"user").as("approx"),
        hll_sketch_estimate(hll_sketch_agg($"user", lit(12))).as("hll"))
      .as[(Int, Long, Long, Long)].collect()
    assert(got.length === 4)
    got.foreach { case (g, exact, approx, hll) =>
      assert(exact === 1500L)
      assert(math.abs(approx - exact) / exact.toDouble < 0.05, s"group $g approx=$approx")
      assert(math.abs(hll - exact) / exact.toDouble < 0.05, s"group $g hll=$hll")
    }
  }

  test("HLL sketches merge: union of per-slice sketches == whole-data sketch") {
    val df = rows.toDF("g", "user")
    // per-slice sketches (as if built per partition / per day)
    val slices = df.groupBy($"g").agg(hll_sketch_agg($"user", lit(12)).as("sk"))
    val merged = slices.agg(hll_sketch_estimate(hll_union_agg($"sk")).as("est"))
      .as[Long].head()
    val direct = df.agg(hll_sketch_estimate(hll_sketch_agg($"user", lit(12))).as("est"))
      .as[Long].head()
    // the union operator re-estimates from the merged registers, so the
    // value can differ from the single-pass estimate by a hair — but both
    // must sit inside the sketch's error envelope of the true count
    assert(math.abs(merged - direct) / direct.toDouble < 0.02,
      s"merged=$merged direct=$direct")
    // all groups draw from the same 1500 users -> global distinct = 1500
    assert(math.abs(merged - 1500.0) / 1500.0 < 0.05)
  }

  test("KLL quantile sketches: bounded rank error; merged slices == one pass") {
    import org.apache.spark.sql.functions._
    val n = 20000
    val df = (0 until n).map(i => (i % 7, i.toDouble)).toDF("g", "v")
    // one-pass sketch vs exact percentile on a known uniform ramp
    val one = df.agg(
      kll_sketch_get_quantile_double(kll_sketch_agg_double(col("v")), lit(0.5)).as("p50"),
      kll_sketch_get_quantile_double(kll_sketch_agg_double(col("v")), lit(0.95)).as("p95"))
      .as[(Double, Double)].head()
    // default k gives ~1.65% rank error at 99% confidence; allow 2% rank
    assert(math.abs(one._1 - n * 0.5) <= n * 0.02, s"p50=${one._1}")
    assert(math.abs(one._2 - n * 0.95) <= n * 0.02, s"p95=${one._2}")
    // per-slice sketches merged == quantiles of the union, within the
    // same error budget — the no-rescan incremental path
    val merged = df.groupBy("g").agg(kll_sketch_agg_double(col("v")).as("sk"))
      .agg(kll_sketch_get_quantile_double(kll_merge_agg_double(col("sk")), lit(0.5)).as("p50"))
      .as[Double].head()
    assert(math.abs(merged - n * 0.5) <= n * 0.02, s"merged p50=$merged")
  }

  test("Theta sketches: overlap/union/difference within 5% of exact set algebra") {
    import org.apache.spark.sql.functions._
    // A = [0, 3000), B = [2000, 6000): |A∩B|=1000 |A∪B|=6000 |A\B|=2000
    val a = (0 until 3000).map(_.toLong).toDF("id")
      .agg(theta_sketch_agg(col("id")).as("sk")).select(col("sk").as("sk_a"))
    val b = (2000 until 6000).map(_.toLong).toDF("id")
      .agg(theta_sketch_agg(col("id")).as("sk")).select(col("sk").as("sk_b"))
    val (inter, union, diff) = a.crossJoin(b).select(
        theta_sketch_estimate(theta_intersection(col("sk_a"), col("sk_b"))),
        theta_sketch_estimate(theta_union(col("sk_a"), col("sk_b"))),
        theta_sketch_estimate(theta_difference(col("sk_a"), col("sk_b"))))
      .as[(Double, Double, Double)].head()
    assert(math.abs(inter - 1000) / 1000.0 < 0.05, s"intersection=$inter")
    assert(math.abs(union - 6000) / 6000.0 < 0.05, s"union=$union")
    assert(math.abs(diff - 2000) / 2000.0 < 0.05, s"difference=$diff")
    // identity: |A| ≈ |A∩B| + |A\B|
    assert(math.abs((inter + diff) - 3000) / 3000.0 < 0.05)
  }

  test("Misra–Gries heavy hitters: undercount bound; all theta-heavy items survive") {
    // zipf-ish skew: item i (1..40) occurs ceil(2000/i) times
    val counts = (1 to 40).map(i => s"item$i" -> ((2000 + i - 1) / i).toLong).toMap
    val stream = new scala.util.Random(7).shuffle(
      counts.toSeq.flatMap { case (w, c) => Seq.fill(c.toInt)(w) }.toList)
    val n = stream.size.toLong
    val k = 10
    // repartition(13) forces real partial-buffer merges through udaf
    val got = stream.toDF("w").repartition(13)
      .agg(graft.functions.FreqSketch.heavyHitters($"w", k).as("hh"))
      .selectExpr("hh").as[Map[String, Long]].collect().head
    assert(got.size <= k, "at most k counters survive")
    val bound = n.toDouble / (k + 1)
    counts.foreach { case (w, c) =>
      if (c > bound) assert(got.contains(w), s"heavy item $w (true=$c, bound=$bound) must survive")
    }
    got.foreach { case (w, est) =>
      val c = counts(w)
      assert(est <= c, s"$w overcounted: est=$est true=$c (MG must undercount)")
      assert(c - est <= bound, s"$w undercounted beyond n/(k+1): est=$est true=$c")
    }
  }

  test("sketch join-size gate: error flags hold and the containment identity is exact") {
    val row = graft.queries.Ext
      .aggSketchJoinsize(spark, "/root/testdata/sf0.001").head()
    val exact = row.getAs[Long]("exact_join_rows")
    assert(exact > 0)
    // the decision-constant gates (est within 15%, theta shared keys
    // within 5% — measured worst 5.5% / 1.6% across the SFs) must hold
    assert(row.getAs[Boolean]("est_join_rows_ok"), row.toString)
    assert(row.getAs[Boolean]("shared_keys_theta_ok"), row.toString)
    // the containment term: nearly every urgent order key exists in
    // lineitem (a few childless orders at tiny SF), so the exact
    // shared-key count sits within 5% of (and never above) ndv_b
    val shared = row.getAs[Long]("shared_keys_exact")
    val ndvB = row.getAs[Long]("ndv_b")
    assert(shared <= ndvB && (ndvB - shared).toDouble / ndvB < 0.05,
      s"shared=$shared ndv_b=$ndvB")
  }

  test("Misra–Gries core: decrement-all insert and PODS'12 merge") {
    import graft.functions.FreqSketch.{insert, mergeCounts}
    // untracked item at capacity decrements everything (and itself cancels)
    assert(insert(Map("a" -> 1L, "b" -> 1L), "c", k = 2) === Map.empty)
    assert(insert(Map("a" -> 3L, "b" -> 1L), "c", k = 2) === Map("a" -> 2L))
    assert(insert(Map("a" -> 1L), "b", k = 2) === Map("a" -> 1L, "b" -> 1L))
    // merge: sum, then subtract the (k+1)-largest and keep positives
    val m = mergeCounts(Map("a" -> 5L, "b" -> 3L), Map("a" -> 2L, "c" -> 4L), k = 2)
    assert(m === Map("a" -> 4L, "c" -> 1L))
    // merging with empty is the identity
    assert(mergeCounts(Map("a" -> 5L), Map.empty, k = 2) === Map("a" -> 5L))
    assert(mergeCounts(Map.empty, Map("a" -> 5L), k = 2) === Map("a" -> 5L))
  }
}
