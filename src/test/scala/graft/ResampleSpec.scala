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
}
