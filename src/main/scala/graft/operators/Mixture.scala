package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted dataset mixing for training-corpus assembly: sample each
  * source at its own rate and union, tagging provenance. Rates > 1 mean
  * oversampling (whole repeats + a fractional sample — epochs-style
  * upweighting). Deterministic per seed; sampling is a narrow
  * transformation, so mixing N sources is N scans and zero shuffles. */
object Mixture {

  /** Temperature-based sampling rates from raw source sizes — the
    * standard `p_i ∝ size_i^alpha` recipe for rebalancing skewed corpora
    * (alpha=1 proportional / natural distribution, alpha=0 uniform,
    * alpha≈0.3 the common multilingual upsampling setting; public
    * practice from multilingual-pretraining literature, e.g. XLM-R).
    * Returns per-source RATES for [[mix]] scaled so the total expected
    * mixed row count equals `targetRows`: rate_i = targetRows * p_i /
    * size_i — small sources get rates > 1 (oversampled epochs), large
    * ones < 1. */
  def temperatureRates(sizes: Seq[(String, Long)], alpha: Double,
                       targetRows: Long): Seq[(String, Double)] = {
    require(sizes.nonEmpty && sizes.forall(_._2 > 0), "sizes must be positive")
    require(alpha >= 0, "alpha must be >= 0")
    require(targetRows > 0, "targetRows must be positive")
    val weights = sizes.map { case (_, n) => math.pow(n.toDouble, alpha) }
    val z = weights.sum
    require(java.lang.Double.isFinite(z) && z > 0,
      s"size^alpha overflowed (alpha=$alpha) — rates would be NaN")
    sizes.zip(weights).map { case ((name, n), w) =>
      name -> (targetRows.toDouble * (w / z) / n.toDouble)
    }
  }

  /** Token-budget mixture planner: given per-source token counts,
    * allocate a total training-token budget across sources by
    * temperature weight w_s ∝ n_s^alpha, capping every source at
    * `maxEpochs` passes over its data (the standard guard against
    * over-repeating small sources; public practice from LLM data
    * recipes — epoch caps appear in e.g. the data-constrained-scaling
    * literature, Muennighoff et al. 2023). Allocation is TWO
    * deterministic rounds: (1) alloc1_s = min(w_s·T, maxEpochs·n_s);
    * (2) the leftover T − Σ alloc1 is redistributed over the uncapped
    * sources proportional to their weights, again capped. Whatever
    * remains after round 2 is reported as `unallocated_tokens` rather
    * than silently looping — a fixed-round semantic is reproducible
    * on any engine (full water-filling iterates a data-dependent
    * number of times), and in practice two rounds place all but a few
    * percent of skewed budgets.
    *
    * Shape: the input frame is one row per SOURCE — bounded by the
    * catalog, not the corpus — so the three tiny aggregates and
    * broadcast cross-joins here cost nothing at any scale; the only
    * data-sized work is whatever aggregate produced `sizes`.
    *
    * @param sizes one row per source: (`srcCol`, `nCol` = token count)
    * @param budgetTokens total token budget T to allocate
    * @param maxEpochs max passes over any single source (rate cap)
    * @param alpha temperature exponent for w_s ∝ n_s^alpha
    * @return (mix_source, n_tokens, weight, alloc_tokens, epochs,
    *         capped, budget_tokens, unallocated_tokens) */
  def budgetPlan(sizes: DataFrame, srcCol: String, nCol: String,
                 budgetTokens: Long, maxEpochs: Double,
                 alpha: Double = 0.5): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    require(maxEpochs > 0, "maxEpochs must be positive")
    require(alpha >= 0, "alpha must be >= 0")
    val n = col(nCol).cast("double")
    val budget = lit(budgetTokens.toDouble)
    // Materialize the per-source frame ONCE: `sizes` is typically a
    // corpus-sized aggregate, and the planner's three tiny aggregates
    // below would otherwise each re-evaluate that lineage — five full
    // corpus scans for a rows-per-source plan (measured: the sf0.1
    // sizing tokenize re-ran 4x before this truncation).
    val once = graft.core.Checkpoint.materialize(sizes)
    // fail loudly on a non-positive source size: pow(0, alpha) would
    // silently zero the weight while epochs divides by zero
    val guarded = once.withColumn("_n",
      when(col(nCol).isNull || col(nCol) <= 0,
        raise_error(lit(s"Mixture.budgetPlan requires positive '$nCol'")))
        .otherwise(n))
    val wRaw = guarded.withColumn("_wr", pow(col("_n"), lit(alpha)))
    val a1 = wRaw.crossJoin(broadcast(wRaw.agg(sum(col("_wr")).as("_wsum"))))
      .withColumn("_w", col("_wr") / col("_wsum"))
      .withColumn("_cap", lit(maxEpochs) * col("_n"))
      .withColumn("_alloc1", least(col("_w") * budget, col("_cap")))
    val t2 = a1.agg(sum(col("_alloc1")).as("_sum1"),
      sum(when(col("_alloc1") < col("_cap"), col("_w")).otherwise(lit(0.0))).as("_wu"))
    val a2 = a1.crossJoin(broadcast(t2))
      .withColumn("_alloc2", least(
        col("_alloc1") + when(col("_alloc1") < col("_cap") && col("_wu") > 0,
          col("_w") / col("_wu") * greatest(budget - col("_sum1"), lit(0.0)))
          .otherwise(lit(0.0)),
        col("_cap")))
    a2.crossJoin(broadcast(a2.agg(sum(col("_alloc2")).as("_sum2"))))
      .select(
        col(srcCol).as("mix_source"),
        col(nCol).cast("long").as("n_tokens"),
        round(col("_w"), 6).as("weight"),
        floor(col("_alloc2")).cast("long").as("alloc_tokens"),
        round(col("_alloc2") / col("_n"), 4).as("epochs"),
        (col("_alloc2") >= col("_cap")).as("capped"),
        lit(budgetTokens).as("budget_tokens"),
        floor(greatest(budget - col("_sum2"), lit(0.0))).cast("long")
          .as("unallocated_tokens"))
  }

  /** Shared mixing skeleton: whole-copy repeats + a fractional sample
    * per source, provenance-tagged union. `fracSample(name, idx, df,
    * frac)` decides HOW the fractional part is drawn. */
  private def mixWith(sources: Seq[(String, DataFrame, Double)])
                     (fracSample: (String, Int, DataFrame, Double) => DataFrame): DataFrame = {
    require(sources.nonEmpty)
    val parts = sources.zipWithIndex.map { case ((name, df, rate), idx) =>
      require(rate >= 0, s"negative rate for $name")
      val whole = math.floor(rate).toInt
      val frac = rate - whole
      val repeats = Seq.fill(whole)(df) ++
        (if (frac > 0) Seq(fracSample(name, idx, df, frac)) else Nil)
      repeats match {
        case Nil => df.limit(0).withColumn("mix_source", lit(name))
        case rs => rs.reduce(_ unionByName _).withColumn("mix_source", lit(name))
      }
    }
    parts.reduce(_ unionByName _)
  }

  /** [[mix]] with the fractional draw decided by an md5 threshold over
    * an id column instead of seeded RNG: a row survives iff the first 8
    * hex digits of `md5(name|id)` fall below `floor(frac * 2^32)` (fixed
    * -width lowercase hex compares lexicographically == numerically).
    * md5 agrees across engines, so — unlike RNG sampling — the mix is
    * reproducible on ANY engine and layout, and oracle-checkable (same
    * property [[Sample.capPerKey]] uses). Still N narrow scans, zero
    * shuffles. */
  def mixDeterministic(sources: Seq[(String, DataFrame, Double)], idCol: String): DataFrame =
    mixWith(sources) { (name, _, df, frac) =>
      val thresholdHex = f"${(frac * 4294967296.0).toLong}%08x"
      // fail loudly on a null id: concat_ws silently SKIPS nulls, which
      // would collapse every null-id row onto one shared draw — an
      // all-or-nothing sampling block invisible in aggregate rates
      // (same contract as Sample.acceptByScore/hashSplit/shuffleShards)
      val draw = when(col(idCol).isNull,
          raise_error(lit(s"Mixture.mixDeterministic requires non-null '$idCol'")))
        .otherwise(substring(md5(concat_ws("|", lit(name), col(idCol).cast("string")).cast("binary")), 1, 8))
      df.filter(draw < lit(thresholdHex))
    }

  /** @param sources (name, df, rate) — rate in [0, inf): expected copies
    *                of each source row in the mix.
    * @return union of sampled sources with a `mix_source` column. */
  def mix(sources: Seq[(String, DataFrame, Double)], seed: Long = 42L): DataFrame =
    mixWith(sources) { (_, idx, df, frac) =>
      // per-source seed: the same df mixed twice must yield independent
      // samples, not two copies of the same subset
      df.sample(withReplacement = false, frac, seed + idx)
    }
}
