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

  test("salt changes the draw") {
    val df = rows.toDF("id", "k")
    val a = Sample.capPerKey(df, Seq("k"), "id", 7).as[(Long, String)].collect().toSet
    val b = Sample.capPerKey(df, Seq("k"), "id", 7, salt = "epoch2").as[(Long, String)].collect().toSet
    assert(a != b, "different salts should select different rows")
    assert(a.size == b.size)
  }
}
