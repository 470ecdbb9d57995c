package graft

import graft.plans.TopK
import scala.util.Random

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("TopK.perKey matches the window row_number formulation on random data") {
    val rnd = new Random(21)
    val rows = (0 until 5000).map { i =>
      (rnd.nextInt(40).toLong, i.toLong, math.round(rnd.nextDouble() * 100) / 10.0)
    }
    // deliberately includes value ties (1-decimal values) to exercise the tie-break
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 8)).toDF("k", "id", "v")
    val got = TopK.perKey(df, Seq("k"), "v", "id", 5)
      .as[(Long, Long, Double)].collect().toSet
    val want = rows.groupBy(_._1).flatMap { case (_, g) =>
      g.sortBy { case (_, id, v) => (-v, id) }.take(5)
    }.toSet
    assert(got === want)
  }

  test("TopK.perKey ranks null order values last, like the window formulation") {
    val df = Seq((1L, 1L, Some(5.0)), (1L, 2L, None), (1L, 3L, Some(7.0)))
      .toDF("k", "id", "v")
    val got = TopK.perKey(df, Seq("k"), "v", "id", 2)
      .select("id").as[Long].collect().toSet
    assert(got === Set(1L, 3L)) // null row excluded only because k=2 non-nulls exist
    val withNull = TopK.perKey(df, Seq("k"), "v", "id", 3)
      .select("id").as[Long].collect().toSet
    assert(withNull === Set(1L, 2L, 3L)) // k=3: null row kept, ranked last
  }

  test("TopK.perKey with k larger than group size keeps all rows") {
    val df = Seq((1L, 1L, 5.0), (1L, 2L, 3.0), (2L, 3L, 9.9)).toDF("k", "id", "v")
    assert(TopK.perKey(df, Seq("k"), "v", "id", 10).count() == 3)
  }
}
