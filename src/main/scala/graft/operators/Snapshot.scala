package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the audit step of every incremental refresh:
  * given yesterday's corpus and today's, report per-document whether it
  * was added, removed, changed, or unchanged, by content fingerprint.
  * Downstream consumers re-embed/re-index ONLY `added`+`changed` rows
  * (work ∝ churn, not corpus — the same incremental shape as
  * [[Dedup.minHashNearDupAgainst]]), and `removed` drives tombstones.
  *
  * One full-outer shuffle join on the id; fingerprints are narrow
  * per-row hashes computed before the join, so 100 TB snapshots diff
  * at the cost of one co-partitioned join of (id, 16-byte digest)
  * pairs — never text movement. */
object Snapshot {

  /** Per-id diff of two snapshots. `fingerprint` is evaluated against
    * each snapshot's own columns (default: md5 of a `text` column).
    * Output: (idCol, old_fp, new_fp, status). */
  def diff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
           fingerprint: Column = md5(col("text").cast("binary"))): DataFrame = {
    val o = oldDf.select(col(idCol), fingerprint.as("old_fp"))
    val n = newDf.select(col(idCol), fingerprint.as("new_fp"))
    o.join(n, Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("old_fp").isNull, lit("added"))
          .when(col("new_fp").isNull, lit("removed"))
          .when(col("old_fp") =!= col("new_fp"), lit("changed"))
          .otherwise(lit("unchanged")))
  }

  /** Churn totals — the refresh-size estimate that decides whether to
    * run incremental or full downstream passes. */
  def diffSummary(oldDf: DataFrame, newDf: DataFrame, idCol: String,
                  fingerprint: Column = md5(col("text").cast("binary"))): DataFrame =
    diff(oldDf, newDf, idCol, fingerprint)
      .groupBy("status").agg(count(lit(1)).as("n"))

  /** The rows downstream must reprocess: `added` + `changed`, with the
    * new snapshot's full columns (work ∝ churn). */
  def changedRows(oldDf: DataFrame, newDf: DataFrame, idCol: String,
                  fingerprint: Column = md5(col("text").cast("binary"))): DataFrame = {
    val d = diff(oldDf, newDf, idCol, fingerprint)
      .where(col("status").isin("added", "changed"))
      .select(col(idCol))
    newDf.join(d, Seq(idCol), "left_semi")
  }

  /** Continuous-column drift: bin BOTH snapshots by the OLD snapshot's
    * quantile edges (the reference binning — standard PSI practice, so
    * a shifted new distribution shows up as mass moving between fixed
    * bins), then delegate to [[categoryDrift]]'s share/PSI math via the
    * bin label. Edges are exact percentiles rounded to 6 (both engines
    * cut on identical doubles); values above the last INTERIOR edge —
    * including anything beyond the old max — land in the top bin, so new
    * out-of-range mass is visible, never dropped. One percentile
    * aggregate over the old snapshot (nBins-1 scalars broadcast as
    * literals) + the two categorical scans. */
  def numericDrift(oldDf: DataFrame, newDf: DataFrame, valueCol: String,
                   nBins: Int = 10, epsilon: Double = 1e-6): DataFrame = {
    require(nBins >= 2, "need at least 2 bins")
    val qs = (1 until nBins).map(_.toDouble / nBins)
    val edges = oldDf
      .agg(percentile(col(valueCol), typedLit(qs)).as("e"))
      .head().getSeq[Double](0)
      .map(e => BigDecimal(e).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    def binned(df: DataFrame): DataFrame = {
      // fold from the top so bin(i) = first interior edge the value is
      // <= ; ties at an edge go to the lower bin on both engines. Nulls
      // get their own visible bin (-1), never a silent top-bin landing.
      val label = edges.zipWithIndex.foldRight(lit(nBins - 1): Column) {
        case ((e, i), rest) => when(col(valueCol) <= e, i).otherwise(rest)
      }
      df.withColumn("bin",
        when(col(valueCol).isNull, lit(-1)).otherwise(label).cast("int"))
    }
    categoryDrift(binned(oldDf), binned(newDf), "bin", epsilon)
  }

  /** Two-sample Kolmogorov–Smirnov statistic — the nonparametric
    * sibling of [[numericDrift]]'s binned PSI: `D = sup|F₁(v) − F₂(v)|`
    * over the empirical CDFs, sensitive to ANY distributional change
    * with no binning choices to tune. Returns one row
    * (ks, n_ref, n_cur).
    *
    * Shape: per-sample value counts reduce both inputs to their
    * DISTINCT values first (one shuffle each), and the exact prefix
    * sums over the NDV-sized count table run RANGE-BUCKETED (r21,
    * guide §2): a distribution-free monotonic log-band bin, a
    * cumulative window partitioned BY BIN, and per-bin offsets from
    * the encoding-bounded bin-totals table. The old single
    * unpartitioned window moved the whole distinct-value table —
    * data-sized at 100 TB — to ONE partition (`WindowExec: No
    * Partition Defined`); long-count arithmetic makes the bucketed
    * sums bit-identical to that form. A pathological distribution
    * (all mass inside one ~28% value band) degrades toward the old
    * single-partition cost, never worse. */
  def ksStatistic(ref: DataFrame, cur: DataFrame, valueCol: String): DataFrame = {
    def counts(df: DataFrame, out: String) = df
      .where(col(valueCol).isNotNull)
      .groupBy(col(valueCol).cast("double").as("v"))
      .agg(count(lit(1)).as(out))
    val merged = counts(ref, "a").join(counts(cur, "b"), Seq("v"), "full_outer")
      .select(col("v"),
        coalesce(col("a"), lit(0L)).as("a"), coalesce(col("b"), lit(0L)).as("b"))
    // DISTRIBUTION-FREE monotonic bin: sign-aware log-scale bands
    // (~4 bins per e-fold) with explicit ±inf / NaN / zero bands that
    // mirror Spark's double ordering (-inf < finite < +inf < NaN)
    // exactly — so bin k's values all precede bin k+1's and the
    // per-bin prefix sums + offsets compose to the exact global
    // prefix. No (min, max) pre-pass touches the data, and the bin
    // count is bounded by the ENCODING (≤ ~12k bands over the whole
    // double domain; log/×/floor are all (semi-)monotonic), never by
    // data.
    val v = col("v")
    val bin =
      when(isnan(v), lit(10000L))
        .when(v === Double.PositiveInfinity, lit(9000L))
        .when(v === Double.NegativeInfinity, lit(-9000L))
        .when(v > 0, lit(3000L) + floor(log(v) * 4))
        .when(v < 0, lit(-3000L) - floor(log(-v) * 4))
        .otherwise(lit(0L))
    val binned = merged.withColumn("_bin", bin.cast("int"))
    val btot = binned.groupBy(col("_bin"))
      .agg(sum(col("a")).as("_ta"), sum(col("b")).as("_tb"))
    // exclusive per-bin offsets + sample totals: a global window over
    // the bin-TOTALS table — bounded by the encoding's band count, the
    // Dsir-class bounded frame, declared in the engine-wide window
    // audit. The corpus-NDV-sized global window this replaces is gone.
    val wOff = Window.orderBy(col("_bin"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.orderBy(col("_bin"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val boff = btot.select(col("_bin"),
      coalesce(sum(col("_ta")).over(wOff), lit(0L)).as("_offa"),
      coalesce(sum(col("_tb")).over(wOff), lit(0L)).as("_offb"),
      sum(col("_ta")).over(wAll).as("_na"),
      sum(col("_tb")).over(wAll).as("_nb"))
    // within-bin cumulative window — partitioned, so no single-partition
    // data-sized WindowExec anywhere in the plan; an empty sample still
    // fails loud at evaluation time
    val w = Window.partitionBy(col("_bin")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    binned.join(broadcast(boff), Seq("_bin"))
      .select(
        when(col("_na") === 0 || col("_nb") === 0,
          raise_error(lit("ksStatistic: both samples must be non-empty")))
          .otherwise(abs(
            (sum(col("a")).over(w) + col("_offa")) / col("_na").cast("double")
              - (sum(col("b")).over(w) + col("_offb")) / col("_nb").cast("double"))).as("d"),
        col("_na").as("na"), col("_nb").as("nb"))
      .agg(round(max(col("d")), 6).as("ks"),
        max(col("na")).as("n_ref"), max(col("nb")).as("n_cur"))
  }

  /** Distribution drift between snapshots over a categorical column —
    * the Population Stability Index per category (the standard
    * monitoring stat: PSI < 0.1 stable, 0.1-0.25 moderate, > 0.25 the
    * mix shifted enough to re-tune samplers/mixtures). Shares are
    * floored at `epsilon` so a category appearing or vanishing yields a
    * large-but-finite term instead of ±inf. Two tiny aggregates (one
    * per snapshot, category-cardinality rows each) and a full-outer
    * join of the category tables — the corpus is scanned once per side
    * regardless of category count. */
  def categoryDrift(oldDf: DataFrame, newDf: DataFrame, catCol: String,
                    epsilon: Double = 1e-6): DataFrame = {
    require(epsilon > 0, "epsilon must be positive")
    def shares(df: DataFrame, n: String, s: String): DataFrame =
      df.groupBy(col(catCol))
        .agg(count(lit(1)).as(n))
        .withColumn(s, col(n).cast("double") /
          sum(col(n)).over(org.apache.spark.sql.expressions.Window.partitionBy()))
    val o = shares(oldDf, "old_n", "old_share")
    val nw = shares(newDf, "new_n", "new_share")
    o.join(nw, Seq(catCol), "full_outer")
      .select(col(catCol),
        coalesce(col("old_n"), lit(0L)).as("old_n"),
        coalesce(col("new_n"), lit(0L)).as("new_n"),
        round(greatest(coalesce(col("old_share"), lit(0.0)), lit(epsilon)), 6).as("old_share"),
        round(greatest(coalesce(col("new_share"), lit(0.0)), lit(epsilon)), 6).as("new_share"))
      .withColumn("psi_term",
        round((col("new_share") - col("old_share")) *
          log(col("new_share") / col("old_share")), 6))
  }

  // ---- persisted corpus-membership sketch ----------------------------

  /** Persist a Theta membership sketch of `idCol` — the standing-corpus
    * artifact for [[batchVsCorpusSketch]]. A few KB of parquet stands in
    * for the whole corpus in every later overlap question; refresh by
    * unioning the next batch's sketch (`theta_union`), never by
    * rescanning history. Same persistence seam as `Ivf.saveModel` /
    * `Bpe.saveModel`. */
  def saveCorpusSketch(df: DataFrame, idCol: String, path: String): Unit =
    df.agg(theta_sketch_agg(col(idCol)).as("sketch"))
      .repartition(1).write.mode("overwrite").parquet(path)

  /** "How much of this batch is NEW?" against a [[saveCorpusSketch]]
    * artifact — one narrow aggregate over the batch plus a few-KB
    * sketch read; the standing corpus is never touched. Returns one row:
    * batch distinct (exact), estimated overlap with the corpus,
    * estimated new-to-corpus count, and the new fraction the ingest
    * decision actually keys on. Estimates are Theta-sketch accurate
    * (~2% at default lgK); SketchSpec bounds them. */
  def batchVsCorpusSketch(batch: DataFrame, idCol: String,
                          sketchPath: String): DataFrame = {
    val spark = batch.sparkSession
    val corpus = spark.read.parquet(sketchPath).select(col("sketch").as("corpus_sk"))
    val b = batch.agg(theta_sketch_agg(col(idCol)).as("batch_sk"),
      count_distinct(col(idCol)).as("batch_distinct"))
    b.crossJoin(corpus).select(
        col("batch_distinct"),
        round(theta_sketch_estimate(theta_intersection(col("batch_sk"), col("corpus_sk"))), 0)
          .cast("long").as("overlap_est"),
        round(theta_sketch_estimate(theta_difference(col("batch_sk"), col("corpus_sk"))), 0)
          .cast("long").as("new_est"))
      .withColumn("new_fraction",
        round(col("new_est").cast("double") /
          greatest(col("batch_distinct"), lit(1L)), 4))
  }
}
