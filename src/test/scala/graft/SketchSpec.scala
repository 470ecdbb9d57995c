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
}
