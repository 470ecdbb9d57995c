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

  test("budgetPlan: caps bind, leftover redistributes to the uncapped source") {
    // small=100 tokens, large=10000; alpha=0.5 -> w_small ~ 0.0909.
    // T=5000, E=3: small's round-1 ask 454.5 hits its 300 cap; large
    // absorbs the 154.5 leftover -> ~4700 tokens, uncapped, 0 left over.
    val sizes = Seq(("small", 100L), ("large", 10000L)).toDF("src", "n")
    val plan = Mixture.budgetPlan(sizes, "src", "n",
        budgetTokens = 5000L, maxEpochs = 3.0, alpha = 0.5)
      .collect().map(r => r.getString(0) -> r).toMap
    val s = plan("small"); val l = plan("large")
    assert(s.getAs[Long]("alloc_tokens") == 300L && s.getAs[Boolean]("capped"))
    assert(s.getAs[Double]("epochs") == 3.0)
    assert(math.abs(l.getAs[Long]("alloc_tokens") - 4700L) <= 1 && !l.getAs[Boolean]("capped"))
    assert(plan.values.map(_.getAs[Long]("unallocated_tokens")).toSet.size == 1)
    assert(s.getAs[Long]("unallocated_tokens") <= 1L)
  }

  test("budgetPlan: budget beyond every cap -> all capped, surplus reported") {
    val sizes = Seq(("a", 1000L), ("b", 2000L)).toDF("src", "n")
    val plan = Mixture.budgetPlan(sizes, "src", "n",
        budgetTokens = 100000L, maxEpochs = 2.0, alpha = 0.5)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(plan("a").getAs[Long]("alloc_tokens") == 2000L)
    assert(plan("b").getAs[Long]("alloc_tokens") == 4000L)
    assert(plan.values.forall(_.getAs[Boolean]("capped")))
    assert(plan("a").getAs[Long]("unallocated_tokens") == 100000L - 6000L)
  }

  test("budgetPlan invariants across a parameter grid") {
    val sizes = Seq(("a", 100L), ("b", 3000L), ("c", 50000L), ("d", 7L)).toDF("src", "n")
    for (t <- Seq(500L, 20000L, 200000L); e <- Seq(1.0, 3.0); alpha <- Seq(0.0, 0.5, 1.0)) {
      val rows = Mixture.budgetPlan(sizes, "src", "n", t, e, alpha).collect()
      val alloc = rows.map(_.getAs[Long]("alloc_tokens")).sum
      assert(alloc <= t, s"t=$t e=$e alpha=$alpha over-allocated: $alloc")
      rows.foreach { r =>
        val n = r.getAs[Long]("n_tokens")
        assert(r.getAs[Long]("alloc_tokens") <= math.ceil(e * n).toLong)
        assert(r.getAs[Double]("epochs") <= e + 1e-9)
        assert(r.getAs[Long]("alloc_tokens") >= 0L)
        assert(r.getAs[Boolean]("capped") == (math.abs(r.getAs[Double]("epochs") - e) < 1e-9))
      }
      // accounting identity: allocated + unallocated == budget (floor slack
      // of at most one token per source plus the reported remainder)
      val un = rows.head.getAs[Long]("unallocated_tokens")
      assert(alloc + un <= t && t - (alloc + un) <= rows.length + 1,
        s"t=$t e=$e alpha=$alpha alloc=$alloc un=$un")
    }
  }

  test("budgetPlan rejects non-positive sizes loudly") {
    val sizes = Seq(("a", 0L), ("b", 10L)).toDF("src", "n")
    val e = intercept[Exception] {
      Mixture.budgetPlan(sizes, "src", "n", 100L, 2.0).collect()
    }
    assert(e.getMessage != null)
  }

  test("rate 0 contributes nothing; integer rate repeats exactly") {
    val a = (0 until 100).map(i => (i.toLong, "x")).toDF("id", "payload")
    val mixed = Mixture.mix(Seq(("none", a, 0.0), ("twice", a, 2.0)))
    val counts = mixed.groupBy("mix_source").count().as[(String, Long)].collect().toMap
    assert(!counts.contains("none") || counts("none") == 0L)
    assert(counts("twice") == 200L)
  }
}
