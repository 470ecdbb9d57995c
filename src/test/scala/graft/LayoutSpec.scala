package graft

import graft.functions.MortonCode
import graft.operators.Layout
import org.apache.spark.sql.functions._
import scala.util.Random

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("Morton interleave: known codes, bit positions, unsigned handling") {
    // x=5 (101), y=3 (011): z bits = y2 x2 y1 x1 y0 x0 = 0 1 1 0 1 1 = 27
    assert(MortonCode.interleave(5, 3) === 27L)
    // swap: x=3 -> even bits 0,2 (=5); y=5 -> odd bits 1,5 (=34); 5+34=39
    assert(MortonCode.interleave(3, 5) === 39L)
    assert(MortonCode.interleave(0, 0) === 0L)
    assert(MortonCode.interleave(-1, 0) === 0x5555555555555555L, "x occupies even bits, unsigned")
    assert(MortonCode.interleave(0, -1) === 0xaaaaaaaaaaaaaaaaL, "y occupies odd bits, unsigned")
    // monotone locality: nearby points share high bits
    assert(java.lang.Long.numberOfLeadingZeros(
      MortonCode.interleave(1000, 1000) ^ MortonCode.interleave(1001, 1001)) > 40)
  }

  test("graft_morton SQL registration evaluates like the Scala API") {
    graft.functions.GraftFunctions.registerAll(spark)
    val df = Seq((5, 3), (17, 99), (0, 0)).toDF("x", "y")
    df.createOrReplaceTempView("mort_in")
    val viaSql = spark.sql("SELECT graft_morton(x, y) AS z FROM mort_in ORDER BY z")
      .as[Long].collect().toSeq
    val viaApi = df.select(MortonCode(col("x"), col("y")).as("z")).orderBy("z")
      .as[Long].collect().toSeq
    assert(viaSql === viaApi)
    assert(viaApi.contains(27L))
  }

  test("zorderBy bounds both dimensions per partition; linear sort serves one") {
    val rnd = new Random(7)
    val pts = Seq.fill(20000)((rnd.nextInt(1000), rnd.nextInt(1000))).toDF("x", "y")
    val nPart = 16

    // per-partition bounding boxes under each layout
    def boxes(df: org.apache.spark.sql.DataFrame): Array[(Int, Int, Int, Int)] =
      df.withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg(min($"x").as("x0"), max($"x").as("x1"), min($"y").as("y0"), max($"y").as("y1"))
        .select("x0", "x1", "y0", "y1")
        .as[(Int, Int, Int, Int)].collect()

    val zBoxes = boxes(Layout.zorderBy(pts, "x", "y", nPart))
    val linBoxes = boxes(pts.repartitionByRange(nPart, $"x").sortWithinPartitions($"x"))
    assert(zBoxes.length === nPart && linBoxes.length === nPart)

    // how many partitions would a min/max-stat reader scan for a range
    // predicate on ONE dimension?
    def scanned(bs: Array[(Int, Int, Int, Int)], onY: Boolean, lo: Int, hi: Int): Int =
      bs.count { case (x0, x1, y0, y1) =>
        if (onY) y1 >= lo && y0 <= hi else x1 >= lo && x0 <= hi }

    val queries = Seq.fill(20){ val a = rnd.nextInt(900); (a, a + 100) }
    val zOnY = queries.map { case (lo, hi) => scanned(zBoxes, onY = true, lo, hi) }.sum
    val linOnY = queries.map { case (lo, hi) => scanned(linBoxes, onY = true, lo, hi) }.sum
    val zOnX = queries.map { case (lo, hi) => scanned(zBoxes, onY = false, lo, hi) }.sum
    val linOnX = queries.map { case (lo, hi) => scanned(linBoxes, onY = false, lo, hi) }.sum

    // the linear-x layout cannot prune y predicates at all
    assert(linOnY === 20 * nPart, "sanity: x-sorted layout scans everything for y ranges")
    // z-order prunes y ranges to well under half the partitions
    assert(zOnY < linOnY / 2, s"zorder y-scan $zOnY vs linear $linOnY")
    // and still prunes x ranges — weaker than a pure x sort (a 16-part
    // z-layout is a ~4x4 grid, so a 10%-wide x range touches a whole
    // column strip ≈ half the partitions), but far from scanning all
    assert(zOnX < (20 * nPart * 7) / 10, s"zorder x-scan $zOnX of ${20 * nPart}")
    assert(linOnX <= zOnX, "sanity: pure x sort is at least as good on x")
  }

  test("BucketIndex: binary-search rank against sorted boundaries") {
    val bs = Array(10.0, 20.0, 30.0)
    assert(graft.functions.BucketIndex.bucket(5.0, bs) === 0)
    assert(graft.functions.BucketIndex.bucket(10.0, bs) === 1, "boundary value counts as <=")
    assert(graft.functions.BucketIndex.bucket(25.0, bs) === 2)
    assert(graft.functions.BucketIndex.bucket(99.0, bs) === 3)
    assert(graft.functions.BucketIndex.bucket(Double.NaN, bs) === 3, "NaN lands in the top bucket")
  }

  test("zorderByRank keeps pruning inside a skewed dimension's dense region") {
    val rnd = new Random(11)
    // x heavily skewed: 90% in [0,10), 10% spread to 10000; y uniform
    val pts = Seq.fill(20000) {
      val x = if (rnd.nextInt(10) < 9) rnd.nextInt(10) else rnd.nextInt(10000)
      (x, rnd.nextInt(1000))
    }.toDF("x", "y")
    val nPart = 16

    def xBoxes(df: org.apache.spark.sql.DataFrame): Array[(Int, Int)] =
      df.withColumn("pid", spark_partition_id())
        .groupBy("pid").agg(min($"x").as("x0"), max($"x").as("x1"))
        .select("x0", "x1").as[(Int, Int)].collect()

    val uni = xBoxes(Layout.zorderBy(pts, "x", "y", nPart))
    val rank = xBoxes(Layout.zorderByRank(pts, "x", "y", nPart, buckets = 256))

    // query x in [2,3] — inside the dense region
    def scanned(bs: Array[(Int, Int)]): Int = bs.count { case (x0, x1) => x1 >= 2 && x0 <= 3 }
    // uniform min/max bins put ~90% of rows in x-bucket 0: every dense
    // partition's box covers [0,10) and matches
    assert(scanned(uni) > nPart / 2, s"sanity: uniform layout scans ${scanned(uni)}")
    // quantile buckets subdivide the dense region into distinct x ranks
    assert(scanned(rank) < scanned(uni), s"rank ${scanned(rank)} !< uniform ${scanned(uni)}")
    // only 10 distinct x values exist in the dense region, so rank
    // resolution caps out; ~2/10 of dense rank space still interleaves
    // across y — well under scanning everything, not a surgical cut
    assert(scanned(rank) <= (nPart * 2) / 3, s"rank layout should prune the dense region: ${scanned(rank)}")
  }

  test("zorderBy handles constant and null-bearing dimensions") {
    val df = Seq((1, 5), (2, 5), (3, 5)).toDF("x", "y") // y constant
    assert(Layout.zorderBy(df, "x", "y", 2).count() === 3)
    val withNull = Seq((Some(1), Some(2)), (None, Some(4)), (Some(3), None))
      .toDF("x", "y")
    assert(Layout.zorderBy(withNull, "x", "y", 2).count() === 3)
  }

  test("zorderBy degrades gracefully on empty input, all-null dims, and NaN rows") {
    val empty = Seq.empty[(Int, Int)].toDF("x", "y")
    assert(Layout.zorderBy(empty, "x", "y", 4).count() === 0, "empty input must not throw")
    val allNull = Seq((Option.empty[Int], Some(1)), (None, Some(2))).toDF("x", "y")
    assert(Layout.zorderBy(allNull, "x", "y", 2).count() === 2, "all-null dimension must not throw")
    // one NaN row must not poison the bounds: the other rows still get
    // distinct codes (clustering survives), the NaN row still comes back
    val withNaN = (Seq((Double.NaN, 1.0)) ++ (1 to 100).map(i => (i.toDouble, i.toDouble)))
      .toDF("x", "y")
    val out = Layout.zorderBy(withNaN, "x", "y", 4)
    assert(out.count() === 101)
    val sizes = out.withColumn("pid", spark_partition_id())
      .groupBy("pid").count().as[(Int, Long)].collect().map(_._2)
    assert(sizes.max < 101, "rows must spread over partitions, not collapse into one")
  }
}
