package graft

import graft.operators.Resample
import java.sql.Timestamp

/** Fixed-grid densification + ffill, focusing on the per-key grid cap —
  * the scale guard against long-idle keys amplifying a handful of events
  * into span/step grid rows. */
class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // key 1: 3 events over 2 hours; key 2: IDLE for ~40 days between its
  // two events -> an unclamped hourly grid emits ~974 rows for it
  private def events = Seq(
    (1L, ts("2026-01-01 10:15:00"), 1.0),
    (1L, ts("2026-01-01 11:45:00"), 2.0),
    (1L, ts("2026-01-01 12:05:00"), 3.0),
    (2L, ts("2026-01-01 00:30:00"), 10.0),
    (2L, ts("2026-02-10 13:00:00"), 20.0)
  ).toDF("user_id", "ts", "value")

  test("unclamped grid densifies each key's full span with backward fill") {
    val got = Resample.ffillGrid(events, Seq("user_id"), "ts", Seq("value"))
      .as[(Long, Timestamp, Option[Double])].collect()
    val k1 = got.filter(_._1 == 1L).sortBy(_._2.getTime)
    assert(k1.map(_._2) === Seq("2026-01-01 10:00:00", "2026-01-01 11:00:00",
      "2026-01-01 12:00:00").map(ts))
    // hour-truncated grid points precede the first event -> first is null,
    // later points carry the latest value at-or-before
    assert(k1.map(_._3) === Seq(None, Some(1.0), Some(2.0)))
    val k2 = got.filter(_._1 == 2L)
    val expectRows = ((ts("2026-02-10 13:00:00").getTime -
      ts("2026-01-01 00:00:00").getTime) / 3600000L) + 1
    assert(k2.length.toLong === expectRows, s"full idle span densified (${k2.length})")
  }

  test("cap with truncate=true cuts each key's grid at the cap, start-anchored") {
    val got = Resample.ffillGrid(events, Seq("user_id"), "ts", Seq("value"),
        maxGridRowsPerKey = 24L, truncate = true)
      .as[(Long, Timestamp, Option[Double])].collect()
    // short key untouched (3 < 24); idle key cut to exactly 24 rows
    assert(got.count(_._1 == 1L) === 3)
    val k2 = got.filter(_._1 == 2L).sortBy(_._2.getTime)
    assert(k2.length === 24)
    assert(k2.head._2 === ts("2026-01-01 00:00:00"), "grid stays start-anchored")
    assert(k2.last._2 === ts("2026-01-01 23:00:00"), "cut at cap rows from start")
  }

  test("cap with truncate=false fails loudly naming the bound") {
    val e = intercept[Exception] {
      Resample.ffillGrid(events, Seq("user_id"), "ts", Seq("value"),
        maxGridRowsPerKey = 24L).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("maxGridRowsPerKey")),
      s"error must name the knob: ${messages(e)}")
  }

  test("cap equal to the largest grid passes untouched (boundary)") {
    val largest = ((ts("2026-02-10 13:00:00").getTime -
      ts("2026-01-01 00:00:00").getTime) / 3600000L) + 1
    val full = Resample.ffillGrid(events, Seq("user_id"), "ts", Seq("value")).count()
    val capped = Resample.ffillGrid(events, Seq("user_id"), "ts", Seq("value"),
      maxGridRowsPerKey = largest).count()
    assert(full === capped)
  }

  test("holtLinear: hand-computed recurrence on [10,12,14,13,15], alpha=0.5 beta=0.3") {
    // level0=10, trend0=0; stepping x=12,14,13,15 by hand:
    //   x=12: f=10,   err 2;      level 11,      trend 0.3
    //   x=14: f=11.3, err 2.7;    level 12.65,   trend 0.705
    //   x=13: f=13.355, err .355; level 13.1775, trend 0.65175
    //   x=15: f=13.82925, err 1.17075 -> level 14.414625, trend 0.8273625
    // sae = 6.22575
    import org.apache.spark.sql.functions._
    val out = Seq(Seq(10.0, 12.0, 14.0, 13.0, 15.0)).toDF("xs")
      .withColumn("h", Resample.holtLinear(col("xs"), alpha = 0.5, beta = 0.3))
      .select(round(col("h.level"), 6), round(col("h.trend"), 7),
        round(col("h.sae"), 5))
      .collect().head
    assert(out.getDouble(0) === 14.414625)
    assert(out.getDouble(1) === 0.8273625)
    assert(out.getDouble(2) === 6.22575)
    // invalid smoothing constants fail loud at construction
    intercept[IllegalArgumentException] {
      Resample.holtLinear(col("xs"), alpha = 1.0, beta = 0.3)
    }
    ()
  }
}
