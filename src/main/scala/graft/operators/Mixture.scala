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
