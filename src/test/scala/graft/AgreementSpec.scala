package graft

import graft.operators.Agreement

class AgreementSpec extends SparkSpec {
  import spark.implicits._

  private def kappa(rows: Seq[(Long, Long, Long)]): Map[(Long, Long), (Double, Option[Double])] =
    Agreement.cohenKappa(rows.toDF("item", "rater", "label"), "item", "rater", "label")
      .collect().map { r =>
        (r.getLong(0), r.getLong(1)) ->
          (r.getDouble(3), if (r.isNullAt(5)) None else Some(r.getDouble(5)))
      }.toMap

  test("perfect agreement on varied labels gives kappa 1") {
    val rows = (0L until 20L).flatMap(i => Seq((i, 0L, i % 4), (i, 1L, i % 4)))
    val ((po, k)) = kappa(rows)((0L, 1L))
    assert(po === 1.0)
    assert(math.abs(k.get - 1.0) < 1e-9)
  }

  test("systematic disagreement scores below chance (negative kappa)") {
    // rater 1 always says the OTHER label: po = 0, kappa < 0
    val rows = (0L until 20L).flatMap(i => Seq((i, 0L, i % 2), (i, 1L, (i + 1) % 2)))
    val ((po, k)) = kappa(rows)((0L, 1L))
    assert(po === 0.0)
    assert(k.get < 0.0)
  }

  test("two constant identical raters: agreement undefined, kappa NULL") {
    val rows = (0L until 10L).flatMap(i => Seq((i, 0L, 3L), (i, 1L, 3L)))
    val ((po, k)) = kappa(rows)((0L, 1L))
    assert(po === 1.0)
    assert(k.isEmpty, "pe = 1 must yield NULL, not a division blow-up")
  }

  private def fleiss(rows: Seq[(Long, Long, Long)]) =
    Agreement.fleissKappa(rows.toDF("item", "rater", "label"),
      "item", "rater", "label").collect()(0)

  test("fleissKappa: perfect multi-rater agreement on varied labels = 1") {
    val rows = (0L until 12L).flatMap(i => (0L until 3L).map(r => (i, r, i % 4)))
    val out = fleiss(rows)
    assert(out.getLong(0) === 12L && out.getLong(1) === 36L)
    assert(out.getDouble(2) === 1.0)
    assert(math.abs(out.getDouble(4) - 1.0) < 1e-9)
  }

  test("fleissKappa: constant identical raters -> pe = 1, kappa NULL") {
    val rows = (0L until 8L).flatMap(i => (0L until 3L).map(r => (i, r, 2L)))
    val out = fleiss(rows)
    assert(out.getDouble(3) === 1.0 && out.isNullAt(4))
  }

  test("fleissKappa: single-rating items are excluded; empty input yields a zero row") {
    val rows = Seq((0L, 0L, 1L), (0L, 1L, 1L), (9L, 0L, 4L)) // item 9: one rating
    val out = fleiss(rows)
    assert(out.getLong(0) === 1L && out.getLong(1) === 2L)
    val empty = Agreement.fleissKappa(
      Seq.empty[(Long, Long, Long)].toDF("item", "rater", "label"),
      "item", "rater", "label").collect()(0)
    assert(empty.getLong(0) === 0L && empty.isNullAt(2) && empty.isNullAt(4))
  }

  test("pairs are computed over co-rated items only, all rater pairs emitted") {
    // rater 2 rated only half the items; three pairs expected
    val rows = (0L until 10L).flatMap { i =>
      Seq((i, 0L, i % 3), (i, 1L, i % 3)) ++
        (if (i < 5) Seq((i, 2L, (i + 1) % 3)) else Nil)
    }
    val out = Agreement.cohenKappa(rows.toDF("item", "rater", "label"),
        "item", "rater", "label")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out.keySet === Set((0L, 1L), (0L, 2L), (1L, 2L)))
    assert(out((0L, 1L)) === 10L && out((0L, 2L)) === 5L && out((1L, 2L)) === 5L)
  }

  test("raterBias: planted constant offsets recovered exactly; dup rows collapse") {
    // item difficulty varies (i*2), rater 1 is +3 lenient, rater 2 is -3
    // harsh; residuals remove the item term exactly, so leniency is the
    // planted offset MINUS the rater-mean of offsets (residuals are
    // centered per item): offsets (0, 3, -3) -> mean 0 -> leniency = offset
    val rows = (0L until 20L).flatMap { i =>
      Seq((i, 0L, (i * 2).toDouble), (i, 1L, i * 2 + 3.0), (i, 2L, i * 2 - 3.0))
    }
    val dup = rows ++ rows.take(5) // transport duplicates must not skew
    val out = Agreement.raterBias(dup.toDF("item", "rater", "score"),
        "item", "rater", "score")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(3), r.getDouble(4))).toMap
    assert(out(0L)._1 == 20L && out(1L)._1 == 20L && out(2L)._1 == 20L)
    assert(out(0L)._2 == 0.0, s"neutral rater leniency ${out(0L)._2}")
    assert(out(1L)._2 == 3.0, s"lenient rater leniency ${out(1L)._2}")
    assert(out(2L)._2 == -3.0, s"harsh rater leniency ${out(2L)._2}")
    // constant offsets -> zero residual variance per rater
    assert(out.values.forall(_._3 == 0.0), s"residual_sd should be 0: $out")
  }
}
