package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tabular privacy gates `[EXT]`: k-anonymity and l-diversity over
  * quasi-identifier columns (Sweeney 2002; Machanavajjhala et al. 2007)
  * — the release-side complement to the text-side PII
  * redaction/pseudonymization already in [[TextAnalysis]]. A training
  * corpus with user metadata columns must not ship equivalence classes
  * small enough to re-identify (k) or sensitive-homogeneous enough to
  * disclose (l).
  *
  * Both checks are ONE aggregation keyed on the quasi-identifier tuple
  * plus one keyed join back — two shuffles on the same key, no window
  * over a giant partition, no driver-side state. Group-count tables are
  * bounded by quasi-identifier cardinality, so AQE broadcasts the join
  * when that is small and shuffles it when not — correct at every
  * scale.
  */
object Privacy {

  /** Annotate every row with its equivalence class's size and distinct
    * sensitive-value count, plus the pass/fail flags:
    * `grp_n` (bigint), `distinct_sens` (bigint),
    * `k_ok = grp_n >= k`, `l_ok = distinct_sens >= l`.
    *
    * `sensitive` is an expression (not a column name) so callers
    * generalize on the fly — e.g. `floor(col("balance") / 1000)` checks
    * diversity of the BUCKET, the usual l-diversity practice for
    * numeric attributes. */
  def annotate(df: DataFrame, quasiCols: Seq[String], sensitive: Column,
               k: Int, l: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1 && l >= 1, "k and l must be >= 1")
    val g = df.withColumn("_sens", sensitive)
      .groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("grp_n"),
        count_distinct(col("_sens")).as("distinct_sens"))
    // NULL is a legal quasi value and forms its own equivalence class —
    // a plain equi-join would silently DROP null-keyed rows (they'd be
    // neither annotated nor counted as suppressed), so join null-safely
    joinNullSafe(df, g, quasiCols)
      .withColumn("k_ok", col("grp_n") >= k)
      .withColumn("l_ok", col("distinct_sens") >= l)
  }

  /** Join on `keys` where NULL == NULL (`<=>`), keeping the left side's
    * key columns — the USING-join shape with null-safe equality.
    * `keepUnmatchedLeft` switches inner → left outer (grid completion). */
  private def joinNullSafe(left: DataFrame, right: DataFrame,
                           keys: Seq[String],
                           keepUnmatchedLeft: Boolean = false): DataFrame = {
    val r = keys.foldLeft(right)((d, c) => d.withColumnRenamed(c, s"_r_$c"))
    val cond = keys.map(c => left(c) <=> r(s"_r_$c")).reduce(_ && _)
    val joined = left.join(r, cond, if (keepUnmatchedLeft) "left" else "inner")
    keys.foldLeft(joined)((d, c) => d.drop(s"_r_$c"))
  }

  /** Suppression release: only rows whose equivalence class satisfies
    * BOTH gates survive (the standard suppression model — generalize
    * first via the `sensitive`/quasi expressions, then suppress what
    * still fails). */
  def suppress(df: DataFrame, quasiCols: Seq[String], sensitive: Column,
               k: Int, l: Int): DataFrame =
    annotate(df, quasiCols, sensitive, k, l)
      .where(col("k_ok") && col("l_ok"))
      .drop("grp_n", "distinct_sens", "k_ok", "l_ok")

  /** Generalization ladder: widen the numeric quasi-identifier's band
    * until EVERY equivalence class reaches size k (the
    * generalize-then-suppress order of the k-anonymity literature —
    * suppressing at a too-fine width throws away rows a coarser band
    * would have kept). `widths` is ascending and each must be a
    * multiple of the FIRST: the corpus is aggregated ONCE at the finest
    * width, and every coarser width's class sizes derive from that
    * bounded group table (`floor(x/w) == floor(floor(x/w0)*w0/w)` when
    * w0 | w), so the ladder costs one corpus shuffle + L bounded-table
    * aggregates + one annotate join — NOT L corpus passes. The chosen
    * width is the smallest that satisfies k everywhere (the widest if
    * none does — caller then suppresses via `k_ok`).
    *
    * Output: input columns + `gen_width` + `bucket` + `grp_n` + `k_ok`.
    * Deterministic: the choice is a pure function of the data. */
  def generalizeUntilK(df: DataFrame, catCols: Seq[String], num: Column,
                       widths: Seq[Long], k: Int): DataFrame = {
    require(widths.nonEmpty && widths == widths.sorted &&
      widths.distinct == widths, "widths must be ascending and distinct")
    val w0 = widths.head
    require(w0 > 0 && widths.forall(_ % w0 == 0),
      "each width must be a positive multiple of the first")
    val b0 = floor(num / w0.toDouble).cast("long")
    val g0 = df.groupBy((catCols.map(col) :+ b0.as("_b0")): _*)
      .agg(count(lit(1)).as("n")).persist()
    def atWidth(w: Long) = g0.groupBy((catCols.map(col) :+
        floor(col("_b0").cast("double") / (w / w0)).cast("long").as("bucket")): _*)
      .agg(sum(col("n")).as("grp_n"))
    // smallest width whose WORST class reaches k — L tiny aggregates on
    // the persisted group table (bounded by quasi cardinality). An EMPTY
    // input has no classes, so every width passes vacuously (min over
    // nothing is a null row, not a zero).
    def worst(w: Long): Long =
      Option(atWidth(w).agg(min(col("grp_n"))).collect()(0).get(0))
        .map(_.asInstanceOf[Long]).getOrElse(Long.MaxValue)
    val chosen = widths.find(worst(_) >= k).getOrElse(widths.last)
    // materialize the chosen width's BOUNDED group table off the cache
    // BEFORE unpersisting: the returned plan is lazy, and letting it
    // recompute g0 at action time would silently double the promised
    // "one corpus shuffle"
    val gw = atWidth(chosen).localCheckpoint()
    g0.unpersist(false)
    // derive the join-side bucket from the SAME two-stage _b0 arithmetic
    // atWidth used (floor(floor(x/w0)/(w/w0))): mathematically equal to
    // floor(x/chosen), but sharing one double-division path means a
    // boundary value can never round differently on the two sides of the
    // inner join and silently drop its rows from the output
    joinNullSafe(
      df.withColumn("bucket",
        floor(b0.cast("double") / (chosen / w0)).cast("long")),
      gw, catCols :+ "bucket")
      .withColumn("gen_width", lit(chosen))
      .withColumn("k_ok", col("grp_n") >= k)
  }

  /** t-closeness (Li et al. 2007): per equivalence class, the Earth
    * Mover's Distance between the class's sensitive-value distribution
    * and the GLOBAL one, for an ORDERED sensitive attribute — the gate
    * that catches what l-diversity misses (a class can be diverse yet
    * skewed, e.g. all its salaries in the top bins). For m ordered bins
    * with unit adjacent distance, `EMD = (1/(m-1)) · Σ_i |Σ_{j≤i}(p_j −
    * q_j)|` — the standard ordered-attribute formula from the paper.
    *
    * Scale shape: three keyed aggregations over the corpus (global
    * bins, class sizes, class×bin cells — all one shuffle family on the
    * quasi key), then a classes × bins GRID via broadcast cross join
    * (both sides dim-bounded: quasi-cardinality × bin-cardinality;
    * declared in the join audit), a quasi-PARTITIONED cumulative-sum
    * window, and a bounded final aggregate. The cumulative sum runs in
    * window order (ORDER BY bin), so both engines add in the same
    * order — no summation-order caveat on the EMD itself.
    *
    * Output: one row per equivalence class — quasi cols, `grp_n`,
    * `t_emd` (6 dp), `t_ok = EMD <= t`. Requires >= 2 global bins. */
  def tCloseness(df: DataFrame, quasiCols: Seq[String], sensitive: Column,
                 t: Double): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(t > 0, "t must be > 0")
    val s = df.withColumn("_sens", sensitive)
      .select(quasiCols.map(col) :+ col("_sens"): _*)
    val global = s.groupBy(col("_sens")).agg(count(lit(1)).as("_qn"))
    val gstats = global.agg(count(lit(1)).as("_m"), sum(col("_qn")).as("_n"))
    val globalW = global.crossJoin(broadcast(gstats))
    val groups = s.groupBy(quasiCols.map(col): _*).agg(count(lit(1)).as("grp_n"))
    val cells = s.groupBy(quasiCols.map(col) :+ col("_sens"): _*)
      .agg(count(lit(1)).as("_cn"))
    // complete the missing-bin zeros: every class needs a row for every
    // GLOBAL bin (the cumulative difference keeps moving through bins
    // the class lacks), hence the bounded grid
    val grid = joinNullSafe(groups.crossJoin(broadcast(globalW)), cells,
      quasiCols :+ "_sens", keepUnmatchedLeft = true)
    val p = coalesce(col("_cn").cast("double"), lit(0.0)) / col("grp_n")
    val q = col("_qn").cast("double") / col("_n")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(quasiCols.map(col): _*).orderBy(col("_sens"))
    // fail LOUD on m < 2 (advisor r16): with a single global bin the
    // (m-1) denominator is 0 and the EMD would release null/Inf (or an
    // opaque ANSI error) — a lazily-raised error keeps the operator
    // plan-only while making the misuse message meaningful
    val emdDenom = when(first(col("_m")) >= 2, first(col("_m")) - lit(1))
      .otherwise(raise_error(lit("tCloseness requires >= 2 distinct global " +
        "sensitive bins (ordered-EMD over one bin is undefined); bin the " +
        "sensitive attribute upstream")).cast("long"))
    grid.withColumn("_cum", sum(p - q).over(w))
      .groupBy((quasiCols.map(col) :+ col("grp_n")): _*)
      .agg((sum(abs(col("_cum"))) / emdDenom).as("_emd"))
      .select((quasiCols.map(col) :+ col("grp_n") :+
        round(col("_emd") + lit(1e-9), 6).as("t_emd") :+
        (col("_emd") <= t).as("t_ok")): _*)
  }

  /** Differentially-private histogram release: per-group counts with
    * Laplace(1/eps) noise (sensitivity 1 for disjoint groups — the
    * textbook counting-query mechanism, Dwork 2006). The noise draw is
    * the engine-reproducible md5-fraction `u` (the same draw every
    * sampler in [[Sample]] uses) pushed through the Laplace inverse
    * CDF: `-(1/eps) * sign(u-1/2) * ln(1 - 2|u-1/2|)`. A DETERMINISTIC
    * draw is NOT private — it exists so tests and the DuckDB twin can
    * hash-compare the mechanism's arithmetic; a production release
    * swaps `salt` for secure randomness (one expression), everything
    * else unchanged. `keepTrueCount` retains the raw count for
    * validation ONLY — never in a release.
    *
    * One keyed aggregate (map-side combine) + a narrow noise
    * projection; the group table is bounded by group-key cardinality. */
  def dpNoisyCounts(df: DataFrame, groupCols: Seq[String], eps: Double,
                    salt: String = "", keepTrueCount: Boolean = false): DataFrame = {
    require(eps > 0, "eps must be > 0")
    require(groupCols.nonEmpty, "need at least one group column")
    val counts = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("_n"))
    val lap = lit(-1.0 / eps) * laplaceUnit(groupCols, salt)
    val out = counts.withColumn("noisy_n", round(col("_n") + lap, 4))
    if (keepTrueCount) out.withColumnRenamed("_n", "n")
    else out.drop("_n")
  }

  /** The engine-reproducible unit Laplace draw shared by the DP
    * mechanisms: `sign(u−½)·ln(1−2|u−½|)` from the md5-fraction `u` of
    * the group key. The key encodes each group value as md5(value) + a
    * null flag: FIXED-length components cannot alias across positions
    * (a '|'-join would collide ('x|y','z') with ('x','y|z') and hand
    * two groups the same noise draw), and NULL is distinguished from
    * every real value including '' — same arithmetic in the DuckDB
    * twins. The log argument is clamped away from 0 (u = 0, one in
    * 2^32 keys, would otherwise release an infinite value). Callers
    * multiply by their mechanism's scale. */
  private def laplaceUnit(groupCols: Seq[String], salt: String): Column = {
    val key = concat((lit(salt) +: groupCols.map(c => concat(
      md5(coalesce(col(c).cast("string"), lit(""))),
      when(col(c).isNull, "0").otherwise("1")))): _*)
    val u = conv(substring(md5(key), 1, 8), 16, 10).cast("double") / 4294967296.0
    val arg = greatest(lit(1.0) - lit(2.0) * abs(u - 0.5), lit(1.0 / 4294967296.0))
    signum(u - 0.5) * log(arg)
  }

  /** Differentially-private per-group MEANS: values clipped to [0, clip]
    * (the clipping bound is what bounds the sensitivity — without it a
    * single outlier row moves the mean arbitrarily), noise scale
    * `clip / (n·eps)` — the known-n Laplace mean mechanism. Same
    * engine-reproducible draw contract as [[dpNoisyCounts]] (tests and
    * twins hash-compare the arithmetic; production swaps the draw for
    * secure randomness). `keepTrueMean` retains the exact clipped mean
    * for validation ONLY. One keyed aggregate + a narrow projection. */
  def dpNoisyMeans(df: DataFrame, groupCols: Seq[String], valueCol: String,
                   clip: Double, eps: Double, salt: String = "",
                   keepTrueMean: Boolean = false): DataFrame = {
    require(eps > 0, "eps must be > 0")
    require(clip > 0, "clip must be > 0")
    require(groupCols.nonEmpty, "need at least one group column")
    val clipped = least(greatest(col(valueCol).cast("double"), lit(0.0)), lit(clip))
    val agg = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(clipped).as("_s"))
    // negative scale, matching dpNoisyCounts: both mechanisms release
    // `scale * (-sign(u-1/2)*ln(1-2|u-1/2|))` — ONE sign convention for
    // the shared draw (advisor r16: the mirror-image +scale here made
    // the two mechanisms add opposite-signed noise for the same key,
    // contradicting the factored-draw intent; distributionally
    // symmetric, but the convention is the contract)
    val lap = (lit(-clip) / (col("n") * lit(eps))) * laplaceUnit(groupCols, salt)
    val out = agg
      .withColumn("noisy_mean", round(col("_s") / col("n") + lap, 4))
    if (keepTrueMean)
      out.withColumn("mean", round(col("_s") / col("n") + lit(1e-9), 4)).drop("_s")
    else out.drop("_s")
  }
}
