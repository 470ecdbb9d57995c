package graft

import graft.operators.RangeJoin
import java.sql.Timestamp

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("pointInInterval: inclusive bounds, bin-boundary spanning, key isolation") {
    val points = Seq(
      (1L, "u1", ts(100)),  // inside ivl A
      (2L, "u1", ts(50)),   // == A start (inclusive)
      (3L, "u1", ts(150)),  // == A end (inclusive)
      (4L, "u1", ts(151)),  // just outside A
      (5L, "u2", ts(100)),  // right time, wrong key
      (6L, "u1", ts(1030))) // inside ivl B which spans a bin boundary (bin width 1000)
      .toDF("pid", "user_id", "ts")
    val intervals = Seq(
      ("A", "u1", ts(50), ts(150)),
      ("B", "u1", ts(990), ts(1090)))
      .toDF("ivl_id", "user_id", "start_ts", "end_ts")

    val out = RangeJoin.pointInInterval(points, intervals, Seq("user_id"),
        "ts", "start_ts", "end_ts", maxIntervalWidthSec = 1000L)
      .select($"pid", $"ivl_ivl_id").as[(Long, String)].collect().toSet
    assert(out === Set((1L, "A"), (2L, "A"), (3L, "A"), (6L, "B")))
  }

  test("pointInInterval handles intervals wider than the bin width") {
    val points = Seq((1L, "k", ts(2500))).toDF("pid", "user_id", "ts")
    val intervals = Seq(("W", "k", ts(0), ts(5000))).toDF("ivl_id", "user_id", "start_ts", "end_ts")
    val out = RangeJoin.pointInInterval(points, intervals, Seq("user_id"),
        "ts", "start_ts", "end_ts", maxIntervalWidthSec = 1000L)
      .select($"pid").as[Long].collect().toSeq
    assert(out == Seq(1L))
  }
}
