package graft

import graft.operators.AsOfJoin
import java.sql.Timestamp

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("leftAsOf attaches latest right row at or before left ts, per key") {
    val left = Seq(
      (1L, "u1", ts(100)), (2L, "u1", ts(205)), (3L, "u2", ts(50)), (4L, "u3", ts(10)))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (101L, "u1", ts(90), 1.0), (102L, "u1", ts(100), 2.0), (103L, "u1", ts(200), 3.0),
      (104L, "u2", ts(60), 4.0))
      .toDF("click_id", "user_id", "ts", "value")

    val m = AsOfJoin.leftAsOf(left, right, Seq("user_id"), "ts", "ts", Seq("click_id", "value"))
      .select("event_id", "asof_click_id").as[(Long, Option[Long])].collect().toMap
    assert(m(1L).contains(102L)) // tie: right.ts == left.ts matches
    assert(m(2L).contains(103L)) // latest preceding
    assert(m(3L).isEmpty)        // right row is after left ts
    assert(m(4L).isEmpty)        // no right rows for key
  }

  test("duplicate (key, ts) right rows resolve deterministically across partitionings") {
    // ten right rows at the SAME (key, ts) with distinct payloads: without
    // a full tiebreak in the window orderBy, last(_r) is run-order-
    // dependent. Contract: the greatest payload struct wins.
    val left = Seq((1L, "u1", ts(100)), (2L, "u1", ts(300))).toDF("event_id", "user_id", "ts")
    val rightRows = (0 until 10).map(i => (200L + i, "u1", ts(100), i.toDouble))
    val expected = Map(1L -> Some(209L), 2L -> Some(209L)) // max (click_id, value) struct

    (1 to 10).foreach { run =>
      // vary the physical layout: different partition counts and row orders
      val right = scala.util.Random.shuffle(rightRows).toDF("click_id", "user_id", "ts", "value")
        .repartition(1 + run % 5)
      val m = AsOfJoin.leftAsOf(left, right, Seq("user_id"), "ts", "ts", Seq("click_id", "value"))
        .select("event_id", "asof_click_id").as[(Long, Option[Long])].collect().toMap
      assert(m == expected, s"run $run: nondeterministic tie resolution: $m")
    }
  }

  test("map-typed payload still executes (tiebreak falls back to ts/side)") {
    import org.apache.spark.sql.functions.{map, lit}
    val left = Seq((1L, "u1", ts(100))).toDF("event_id", "user_id", "ts")
    val right = Seq((9L, "u1", ts(50))).toDF("click_id", "user_id", "ts")
      .withColumn("attrs", map(lit("k"), lit("v")))
    val out = AsOfJoin.leftAsOf(left, right, Seq("user_id"), "ts", "ts", Seq("click_id", "attrs"))
      .select("event_id", "asof_click_id").as[(Long, Option[Long])].collect()
    assert(out.toSeq == Seq((1L, Some(9L))))
  }

  test("forward direction attaches earliest right row at or after left ts") {
    val left = Seq(
      (1L, "u1", ts(100)), (2L, "u1", ts(205)), (3L, "u2", ts(70)), (4L, "u3", ts(10)))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (101L, "u1", ts(90), 1.0), (102L, "u1", ts(100), 2.0), (103L, "u1", ts(200), 3.0),
      (104L, "u2", ts(60), 4.0))
      .toDF("click_id", "user_id", "ts", "value")
    val m = AsOfJoin.leftAsOf(left, right, Seq("user_id"), "ts", "ts",
        Seq("click_id", "value"), direction = "forward")
      .select("event_id", "asof_click_id").as[(Long, Option[Long])].collect().toMap
    assert(m(1L).contains(102L)) // tie: right.ts == left.ts matches forward too
    assert(m(2L).isEmpty)        // nothing at or after 205
    assert(m(3L).isEmpty)        // right row precedes left ts
    assert(m(4L).isEmpty)
  }

  test("tolerance nulls matches farther than the bound, both directions") {
    val left = Seq((1L, "u1", ts(1000)), (2L, "u1", ts(5000))).toDF("event_id", "user_id", "ts")
    val right = Seq((11L, "u1", ts(940), 1.0), (12L, "u1", ts(5600), 2.0))
      .toDF("click_id", "user_id", "ts", "value")
    val back = AsOfJoin.leftAsOf(left, right, Seq("user_id"), "ts", "ts",
        Seq("click_id"), direction = "backward", tolerance = Some("1 minute"))
      .select("event_id", "asof_click_id").as[(Long, Option[Long])].collect().toMap
    assert(back(1L).contains(11L)) // 60s back: inside the 1-minute bound
    assert(back(2L).isEmpty)       // nearest preceding is 4060s back: nulled
    val fwd = AsOfJoin.leftAsOf(left, right, Seq("user_id"), "ts", "ts",
        Seq("click_id"), direction = "forward", tolerance = Some("10 minutes"))
      .select("event_id", "asof_click_id").as[(Long, Option[Long])].collect().toMap
    assert(fwd(1L).isEmpty)        // nearest following is 4600s ahead: nulled
    assert(fwd(2L).contains(12L))  // 600s ahead: exactly on the bound
  }

  test("null timestamps: reference rows never match, probe rows survive unmatched") {
    val left = Seq((1L, "u1", Some(ts(100))), (2L, "u1", None))
      .toDF("event_id", "user_id", "ts")
    val rightNullOnly = Seq((11L, "u1", None: Option[Timestamp], 1.0))
      .toDF("click_id", "user_id", "ts", "value")
    for (dir <- Seq("backward", "forward")) {
      val m = AsOfJoin.leftAsOf(left, rightNullOnly, Seq("user_id"), "ts", "ts",
          Seq("click_id"), direction = dir)
        .select("event_id", "asof_click_id").as[(Long, Option[Long])].collect().toMap
      assert(m == Map(1L -> None, 2L -> None),
        s"$dir: null-ts reference row must never match: $m")
    }
    // a real reference row still matches the non-null probe, never the null one
    val rightReal = Seq((12L, "u1", Some(ts(100)), 2.0)).toDF("click_id", "user_id", "ts", "value")
    for (dir <- Seq("backward", "forward")) {
      val m = AsOfJoin.leftAsOf(left, rightReal, Seq("user_id"), "ts", "ts",
          Seq("click_id"), direction = dir)
        .select("event_id", "asof_click_id").as[(Long, Option[Long])].collect().toMap
      assert(m == Map(1L -> Some(12L), 2L -> None), s"$dir: $m")
    }
  }

  test("randomized equivalence vs brute-force reference, both directions with tolerance") {
    val rnd = new scala.util.Random(7)
    val keys = Vector("u1", "u2", "u3")
    val left = (1L to 60L).map(i => (i, keys(rnd.nextInt(3)), ts(rnd.nextInt(500))))
    val right = (100L to 180L).map(i => (i, keys(rnd.nextInt(3)), ts(rnd.nextInt(500)), rnd.nextDouble()))
    val lDf = left.toDF("event_id", "user_id", "ts")
    val rDf = right.toDF("click_id", "user_id", "ts", "value")
    val tolSec = 60L
    for (dir <- Seq("backward", "forward")) {
      // brute force: nearest by |dt| respecting direction, ties broken by
      // greatest (backward) / smallest (forward) (click_id, value) struct
      // — the operator's documented tie contract
      val expected = left.map { case (id, u, lts) =>
        val cands = right.filter { case (_, ru, rts, _) =>
          ru == u && (if (dir == "backward") rts.getTime <= lts.getTime else rts.getTime >= lts.getTime)
        }
        val best =
          if (cands.isEmpty) None
          else {
            val bestTs =
              if (dir == "backward") cands.map(_._3.getTime).max else cands.map(_._3.getTime).min
            val atBest = cands.filter(_._3.getTime == bestTs).map(c => (c._1, c._4))
            val pick = if (dir == "backward") atBest.max else atBest.min
            if (math.abs(bestTs - lts.getTime) <= tolSec * 1000) Some(pick._1) else None
          }
        id -> best
      }.toMap
      val got = AsOfJoin.leftAsOf(lDf, rDf, Seq("user_id"), "ts", "ts",
          Seq("click_id", "value"), direction = dir, tolerance = Some(s"$tolSec seconds"))
        .select("event_id", "asof_click_id").as[(Long, Option[Long])].collect().toMap
      assert(got == expected, s"$dir mismatch: ${got.toSeq.diff(expected.toSeq).take(5)}")
    }
  }

  test("left rows and columns are preserved") {
    val left = Seq((1L, "u1", ts(5), "payload")).toDF("id", "user_id", "ts", "extra")
    val right = Seq((9L, "u1", ts(1))).toDF("rid", "user_id", "ts")
    val out = AsOfJoin.leftAsOf(left, right, Seq("user_id"), "ts", "ts", Seq("rid"))
    assert(out.columns.toSeq == Seq("id", "user_id", "ts", "extra", "asof_rid"))
    assert(out.count() == 1)
  }

  test("leftAsOfNearest picks the closer side; ties go backward; tolerance per side") {
    val left = Seq(
      (1L, "u1", ts(99)),   // bwd dt 9 vs fwd dt 11 -> backward (90)
      (2L, "u1", ts(101)),  // bwd dt 11 vs fwd dt 9 -> forward (110)
      (3L, "u1", ts(100)),  // exact tie dt 10 -> backward (90)
      (4L, "u1", ts(500)),  // only backward exists
      (5L, "u1", ts(1)),    // only forward exists
      (6L, "u2", ts(100))   // no right rows for the key
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (90L, "u1", ts(90), 0.9), (110L, "u1", ts(110), 1.1)
    ).toDF("click_id", "user_id", "ts", "value")
    val m = AsOfJoin.leftAsOfNearest(left, right, Seq("user_id"), "ts", "ts",
        Seq("click_id", "value"))
      .select("event_id", "asof_click_id").as[(Long, Option[Long])].collect().toMap
    assert(m === Map(1L -> Some(90L), 2L -> Some(110L), 3L -> Some(90L),
      4L -> Some(110L), 5L -> Some(90L), 6L -> None))
    // tolerance nulls each side independently: at ts=99 with 5s tolerance
    // both matches are too far; at ts=108 only the forward one survives
    val tol = AsOfJoin.leftAsOfNearest(
        Seq((1L, "u1", ts(99)), (2L, "u1", ts(108))).toDF("event_id", "user_id", "ts"),
        right, Seq("user_id"), "ts", "ts", Seq("click_id"), tolerance = Some("5 seconds"))
      .select("event_id", "asof_click_id").as[(Long, Option[Long])].collect().toMap
    assert(tol === Map(1L -> None, 2L -> Some(110L)))
  }
}
