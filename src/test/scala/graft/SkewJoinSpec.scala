package graft

import graft.operators.SkewJoin
import scala.util.Random

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("saltedInnerJoin result equals the plain inner join on skewed data") {
    val rnd = new Random(31)
    // 90% of left rows share one hot key
    val left = (0 until 2000).map { i =>
      val k = if (rnd.nextInt(10) < 9) 7L else rnd.nextInt(50).toLong
      (k, i.toLong)
    }.toDF("k", "lid")
    val right = (0L until 50L).map(k => (k, s"payload$k")).toDF("k", "p")

    val got = SkewJoin.saltedInnerJoin(left, right, Seq("k"), saltFactor = 4)
      .select("k", "lid", "p").as[(Long, Long, String)].collect().toSet
    val want = left.join(right, Seq("k"))
      .select("k", "lid", "p").as[(Long, Long, String)].collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("salted join handles right keys with no left match (inner semantics)") {
    val left = Seq((1L, 10L)).toDF("k", "lid")
    val right = Seq((1L, "a"), (2L, "b")).toDF("k", "p")
    val got = SkewJoin.saltedInnerJoin(left, right, Seq("k"), saltFactor = 3)
      .select("k", "lid", "p").as[(Long, Long, String)].collect().toSeq
    assert(got == Seq((1L, 10L, "a")))
  }
}
