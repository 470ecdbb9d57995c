package graft

import graft.operators.Mixture

class MixtureSpec extends SparkSpec {
  import spark.implicits._

  test("mix approximates requested rates and tags provenance") {
    val a = (0 until 2000).map(i => (i.toLong, "a")).toDF("id", "payload")
    val b = (0 until 2000).map(i => (i.toLong, "b")).toDF("id", "payload")
    val mixed = Mixture.mix(Seq(("web", a, 0.25), ("books", b, 1.5)))
    val counts = mixed.groupBy("mix_source").count().as[(String, Long)].collect().toMap
    assert(math.abs(counts("web") - 500.0) / 500.0 < 0.2)
    assert(counts("books") >= 2000 && math.abs(counts("books") - 3000.0) / 3000.0 < 0.2)
    assert(mixed.columns.contains("mix_source"))
  }

  test("temperatureRates: alpha=1 is natural, alpha=0 uniform, alpha=0.3 upsamples small sources") {
    val sizes = Seq("big" -> 900000L, "small" -> 100000L)
    // alpha=1: rates equal across sources (mix keeps natural proportions)
    val natural = Mixture.temperatureRates(sizes, alpha = 1.0, targetRows = 1000000L).toMap
    assert(math.abs(natural("big") - 1.0) < 1e-9 && math.abs(natural("small") - 1.0) < 1e-9)
    // alpha=0: expected counts equal per source -> 500k each
    val uniform = Mixture.temperatureRates(sizes, alpha = 0.0, targetRows = 1000000L).toMap
    assert(math.abs(uniform("big") * 900000 - 500000.0) < 1e-6)
    assert(math.abs(uniform("small") * 100000 - 500000.0) < 1e-6)
    // alpha=0.3: small source's SHARE rises above natural (0.1), below uniform (0.5)
    val t = Mixture.temperatureRates(sizes, alpha = 0.3, targetRows = 1000000L).toMap
    val smallShare = t("small") * 100000 / 1000000.0
    assert(smallShare > 0.1 && smallShare < 0.5, s"share=$smallShare")
    // total expected rows == target for any alpha
    Seq(natural, uniform, t).foreach { r =>
      val total = r("big") * 900000 + r("small") * 100000
      assert(math.abs(total - 1000000.0) < 1e-3, s"total=$total")
    }
  }

  test("mixDeterministic: reproducible, rate-faithful, oversampling duplicates wholes") {
    val df = (0 until 1000).map(i => (i.toLong, s"t$i")).toDF("id", "text")
    val out = Mixture.mixDeterministic(Seq(("a", df, 2.5)), "id")
    val rows = out.select("id").as[Long].collect()
    // 2 whole copies + ~0.5 fractional draw: binomial(1000, .5) ± 5σ
    assert(rows.length >= 2000 && rows.length < 3000)
    assert(math.abs(rows.length - 2500) < 80, s"got ${rows.length}, expected ~2500")
    val perId = rows.groupBy(identity).view.mapValues(_.length)
    assert(perId.values.forall(c => c == 2 || c == 3), "each id appears 2 or 3 times")
    // no RNG anywhere: a second evaluation is row-identical
    val again = Mixture.mixDeterministic(Seq(("a", df, 2.5)), "id")
      .select("id").as[Long].collect()
    assert(rows.sorted.toSeq == again.sorted.toSeq)
    // different source names draw different fractional subsets
    val other = Mixture.mixDeterministic(Seq(("b", df, 0.5)), "id")
      .select("id").as[Long].collect().toSet
    val aFrac = perId.filter(_._2 == 3).keySet
    assert(other != aFrac, "per-source salt must vary the draw")
  }

  test("rate 0 contributes nothing; integer rate repeats exactly") {
    val a = (0 until 100).map(i => (i.toLong, "x")).toDF("id", "payload")
    val mixed = Mixture.mix(Seq(("none", a, 0.0), ("twice", a, 2.0)))
    val counts = mixed.groupBy("mix_source").count().as[(String, Long)].collect().toMap
    assert(!counts.contains("none") || counts("none") == 0L)
    assert(counts("twice") == 200L)
  }
}
