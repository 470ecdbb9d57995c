package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for corpus curation. */
object Sample {

  /** At most `k` rows per key, selected in md5-hash order of the id —
    * the standard "cap documents per domain" curation step. Hash order
    * makes the selection (a) uniform-ish regardless of id assignment
    * order, (b) stable across runs, partitionings, and cluster layouts,
    * and (c) reproducible in any engine with md5 (so the result is
    * DuckDB-oracle-checkable, unlike seeded RNG sampling). `salt` varies
    * the draw without touching the data. One window shuffle on the keys
    * — the same cost envelope as [[Dedup.keepFirst]]. */
  def capPerKey(df: DataFrame, keyCols: Seq[String], idCol: String, k: Int,
                salt: String = ""): DataFrame = {
    require(k > 0, "k must be positive")
    // Non-null id is a hard precondition: null ids tie completely (null
    // draw AND null tiebreaker), so which of >k null-id rows survive
    // would be partitioning-dependent. Fail loudly per-row instead of
    // silently returning engine-dependent output.
    val draw = when(col(idCol).isNull,
        raise_error(lit(s"Sample.capPerKey requires non-null '$idCol'")))
      .otherwise(md5(concat(lit(salt), lit("|"), col(idCol).cast("string"))))
    // nulls LAST explicitly: Spark's ASC default is NULLS FIRST while SQL
    // engines like DuckDB default to NULLS LAST — pin it so the oracle
    // comparison can never hinge on the engines' divergent default
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(draw.asc_nulls_last, col(idCol).asc_nulls_last)
    // rank column name chosen to not collide with any input column —
    // withColumn would silently overwrite (and drop) a caller's column
    val rn = Iterator.from(0).map(i => s"_rn$i").find(n => !df.columns.contains(n)).get
    df.withColumn(rn, row_number().over(w)).filter(col(rn) <= k).drop(rn)
  }

  /** Deterministic score-weighted acceptance sampling: keep each row
    * with probability `scoreCol` (a double; <=0 never keeps, >=1 always
    * keeps — no clamping needed since the draw is uniform on
    * [0, 1 - 2^-32]). The draw is the top 32 bits of md5(salt|id) as a
    * fraction, so acceptance is a pure per-row function — narrow,
    * engine-reproducible, stable across runs and corpus growth, same
    * rationale as [[hashSplit]]. The curation use: quality-weighted
    * data selection, where each document's keep probability IS its
    * quality score (soft filtering, vs the hard quality-gate cut). */
  def acceptByScore(df: DataFrame, idCol: String, scoreCol: String,
                    salt: String = ""): DataFrame = {
    val draw = when(col(idCol).isNull,
        raise_error(lit(s"Sample.acceptByScore requires non-null '$idCol'")))
      .otherwise(conv(substring(md5(concat(lit(salt), lit("|"), col(idCol).cast("string"))), 1, 8), 16, 10)
        .cast("double") / 4294967296.0)
    // same fail-loud stance as the id guard: draw < NULL (or NaN compare)
    // would silently DROP the row — a null-quality document vanishing is
    // invisible in aggregate acceptance rates, so surface it instead
    val score = when(col(scoreCol).isNull || isnan(col(scoreCol)),
        raise_error(lit(s"Sample.acceptByScore requires non-null, non-NaN '$scoreCol'")))
      .otherwise(col(scoreCol))
    df.filter(draw < score)
  }

  /** Per-group quantile normalization of a score column: each row's
    * score becomes its percent-rank WITHIN its group — the curation
    * calibration step that makes one threshold mean the same thing
    * across languages/sources (a perplexity of 180 is great for Finnish
    * and junk for English; its within-language quantile is comparable).
    * Composes directly with [[acceptByScore]] (calibrated score = keep
    * probability) or a global cut. One window per group — parallel
    * across groups, the same scale shape as every rank operator here.
    * Ties share a rank (percent_rank semantics); null scores fail loud
    * like the rest of the family (a null ranking silently as 0.0 would
    * vanish into the acceptance math). */
  def quantileNormalize(df: DataFrame, groupCols: Seq[String], scoreCol: String,
                        outCol: String = "score_q"): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column")
    val checked = when(col(scoreCol).isNull || isnan(col(scoreCol)),
        raise_error(lit(s"Sample.quantileNormalize requires non-null, non-NaN '$scoreCol'")))
      .otherwise(col(scoreCol))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy(checked.asc)
    df.withColumn(outCol, round(percent_rank().over(w), 6))
  }

  /** Per-stratum downsampling to explicit rates — the corpus
    * REBALANCER (cap the over-represented web crawl at 10%, keep all
    * of the rare curated slice), complementing [[Mixture]]'s
    * temperature weighting with hand-set rates. Same md5-fraction draw
    * as [[acceptByScore]], so the keep decision is a pure per-row
    * function: narrow, engine-reproducible, stable under corpus growth
    * (a stratum's survivors never change when other strata grow).
    * Strata absent from `rates` use `defaultRate` (1.0 = keep); a NULL
    * stratum fails loud like a NULL id — `when(col === k)` is
    * null-false, so it would otherwise silently fall to `defaultRate`,
    * diverging from the family's fail-loud stance. */
  def stratified(df: DataFrame, idCol: String, strataCol: String,
                 rates: Map[String, Double], defaultRate: Double = 1.0,
                 salt: String = ""): DataFrame = {
    require(rates.nonEmpty, "need at least one stratum rate")
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= 1),
      "rates must be in [0, 1]")
    val draw = when(col(idCol).isNull,
        raise_error(lit(s"Sample.stratified requires non-null '$idCol'")))
      .otherwise(conv(substring(md5(concat(lit(salt), lit("|"), col(idCol).cast("string"))), 1, 8), 16, 10)
        .cast("double") / 4294967296.0)
    // deterministic rate lookup: sorted fold keeps the plan stable for a
    // given rates map regardless of Map iteration order
    val lookup = rates.toSeq.sortBy(_._1).foldRight(lit(defaultRate): Column) {
      case ((k, r), rest) => when(col(strataCol) === k, r).otherwise(rest)
    }
    val rate = when(col(strataCol).isNull,
        raise_error(lit(s"Sample.stratified requires non-null '$strataCol'")))
      .otherwise(lookup)
    df.filter(draw < rate)
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis & Spirakis 2006,
    * algorithm A): each row draws priority `u^(1/w)` — equivalently
    * `ln(u)/w`, the monotone form used here — and the k largest
    * priorities win. The classic result: for k=1 the inclusion
    * probability is exactly `w_i / Σw`, and for general k the scheme is
    * the standard one-pass distributed answer to "sample k docs biased
    * by quality/length without replacement" (a with-replacement sampler
    * over-picks heavy rows; naive normalization needs Σw up front —
    * E-S needs neither).
    *
    * `u` is the md5(salt|id) fraction like every sampler in this
    * family: the draw is a pure per-row function — narrow,
    * engine-reproducible, oracle-checkable, stable under corpus growth
    * — and `salt` re-deals it. Priorities round to 12 decimals before
    * ranking so the oracle engine's libm can never flip a rank on a
    * 1-ulp `ln` difference; ties (same rounded key) break by id.
    *
    * Plan shape: with `groupCols` one window shuffle on the groups
    * (top-k per stratum, parallel across strata); without, a global
    * `orderBy(...).limit(k)` that Spark plans as TakeOrderedAndProject
    * — per-partition heaps + one k-row merge, no global sort. */
  def weightedTopK(df: DataFrame, idCol: String, weightCol: String, k: Int,
                   groupCols: Seq[String] = Seq.empty, salt: String = ""): DataFrame = {
    require(k > 0, "k must be positive")
    val u = when(col(idCol).isNull,
        raise_error(lit(s"Sample.weightedTopK requires non-null '$idCol'")))
      .otherwise((conv(substring(md5(concat(lit(salt), lit("|"), col(idCol).cast("string"))), 1, 8), 16, 10)
        .cast("double") + 0.5) / 4294967296.0) // +0.5 keeps u in (0,1): ln(0) would poison the key
    // weights must be strictly positive: w<=0 has no E-S semantics (and
    // null/NaN would rank arbitrarily) — fail loud like the family
    val wgt = when(col(weightCol).isNull || isnan(col(weightCol).cast("double")) ||
          col(weightCol).cast("double") <= 0,
        raise_error(lit(s"Sample.weightedTopK requires positive, non-null '$weightCol'")))
      .otherwise(col(weightCol).cast("double"))
    val key = round(log(u) / wgt, 12)
    if (groupCols.isEmpty) {
      df.orderBy(key.desc_nulls_last, col(idCol).asc_nulls_last).limit(k)
    } else {
      val w = Window.partitionBy(groupCols.map(col): _*)
        .orderBy(key.desc_nulls_last, col(idCol).asc_nulls_last)
      val rn = Iterator.from(0).map(i => s"_rn$i").find(n => !df.columns.contains(n)).get
      df.withColumn(rn, row_number().over(w)).filter(col(rn) <= k).drop(rn)
    }
  }

  /** Deterministic training-order shuffle: assign each row a shard
    * (top-32 md5 bits mod nShards) and a within-shard order key (the
    * full draw) — reading shards in order, each sorted by the draw,
    * yields a reproducible pseudo-random global order without any
    * global sort: the write is `repartition(n, shard)` + sort-within by
    * the draw, all parallel. `salt` = epoch: a new salt re-deals the
    * order for the next training pass. Engine-reproducible like the
    * other md5 operators, so the assignment is oracle-checkable. */
  def shuffleShards(df: DataFrame, idCol: String, nShards: Int,
                    salt: String = ""): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    require(!df.columns.contains("shard") && !df.columns.contains("shuffle_key"),
      "input already has a shard/shuffle_key column")
    val draw = when(col(idCol).isNull,
        raise_error(lit(s"Sample.shuffleShards requires non-null '$idCol'")))
      .otherwise(md5(concat(lit(salt), lit("|"), col(idCol).cast("string"))))
    df.withColumn("shuffle_key", draw)
      .withColumn("shard",
        (conv(substring(col("shuffle_key"), 1, 8), 16, 10).cast("long") % nShards).cast("int"))
  }

  /** Deterministic train/val/test (or arbitrary N-way) split by id hash.
    * Each row gets the label of the bucket its md5 draw falls into:
    * bucket boundaries are the cumulative fractions mapped onto the
    * first 8 hex chars of `md5(salt|id)` — a lowercase-hex string whose
    * lexicographic order equals the numeric order of the top 32 hash
    * bits, so a plain string `<` against precomputed literal thresholds
    * implements the split. The last label takes the remainder, making
    * the buckets exhaustive regardless of floating-point rounding.
    *
    * Properties the formulation buys: (a) assignment is a pure per-row
    * function of the id — NARROW, zero shuffle, trivially parallel at
    * 100 TB; (b) stable across runs, partitionings, and engines (md5 is
    * universal, so a DuckDB oracle reproduces it exactly, unlike seeded
    * RNG splits); (c) adding data later never reassigns existing rows —
    * the property training pipelines need so the test set stays clean
    * across corpus refreshes; (d) `salt` re-deals the split without
    * touching the data. */
  def hashSplit(df: DataFrame, idCol: String, fractions: Seq[(String, Double)],
                salt: String = "", splitCol: String = "split"): DataFrame = {
    require(fractions.size >= 2, "need at least two split buckets")
    require(fractions.forall(_._2 > 0), "fractions must be positive")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9, "fractions must sum to 1")
    require(!df.columns.contains(splitCol), s"column '$splitCol' already exists")
    val draw = when(col(idCol).isNull,
        raise_error(lit(s"Sample.hashSplit requires non-null '$idCol'")))
      .otherwise(substring(md5(concat(lit(salt), lit("|"), col(idCol).cast("string"))), 1, 8))
    // cumulative thresholds for all but the last bucket, as 8-digit hex.
    // Clamped to 0xffffffff: a cumulative fraction hitting exactly 1.0
    // (e.g. fractions like 1.0 + 1e-10 passing the sum tolerance) would
    // format as the 9-char "100000000", which compares LOWER than most
    // 8-char draws lexicographically — a silent mis-split.
    val cum = fractions.init.scanLeft(0.0)(_ + _._2).tail
    val thresholds = cum.map(f =>
      f"${math.min(math.floor(f * 4294967296.0).toLong, 0xffffffffL)}%08x")
    val label = fractions.init.zip(thresholds).foldRight(lit(fractions.last._1): Column) {
      case (((name, _), thr), rest) => when(draw < thr, name).otherwise(rest)
    }
    df.withColumn(splitCol, label)
  }

  /** K-fold cross-validation assignment: fold = top-32 md5 bits of the
    * salted id, mod k — deterministic, stable under corpus growth, and
    * engine-reproducible (same draw family as [[hashSplit]]). Train set
    * for fold f = everything where fold ≠ f; no shuffle, pure narrow. */
  def kFold(df: DataFrame, idCol: String, k: Int, salt: String = "cv",
            foldCol: String = "fold"): DataFrame = {
    require(k >= 2, "need at least 2 folds")
    require(!df.columns.contains(foldCol), s"column '$foldCol' already exists")
    val draw = when(col(idCol).isNull,
        raise_error(lit(s"Sample.kFold requires non-null '$idCol'")))
      .otherwise(conv(substring(md5(
        concat(lit(salt), lit("|"), col(idCol).cast("string"))), 1, 8), 16, 10)
        .cast("long"))
    df.withColumn(foldCol, pmod(draw, lit(k.toLong)).cast("int"))
  }

  /** Cluster-balanced sampling — diversity selection over an embedding
    * column (the prototype/cluster-capping step of SemDeDup, Abbas 2023
    * §4, and density-balanced selection generally): assign every row to
    * its nearest k-means centroid ([[Ivf.attachCell]], one narrow
    * codegen pass against the broadcast centroid table — no join) and
    * keep at most `capPerCell` rows per cluster via [[capPerKey]]'s
    * deterministic md5 draw. A raw crawl is dominated by its densest
    * semantic modes; capping per CLUSTER (not per domain) flattens the
    * topical distribution, which per-domain caps cannot see.
    *
    * Scale: one narrow assignment pass + one window shuffle keyed on the
    * cell. The cell key has `model.centroids.length` distinct values —
    * at corpus scale train with the IVF regime's k (~sqrt(n), thousands
    * of cells) so no cell is a hot shuffle key; tiny k is a fixture
    * convenience, not the deployment shape. */
  def clusterBalanced(df: DataFrame, idCol: String, vecCol: String,
                      model: Ivf.Model, capPerCell: Int, salt: String = "",
                      cellCol: String = "cell"): DataFrame = {
    require(!df.columns.contains(cellCol),
      s"clusterBalanced would overwrite existing column '$cellCol'")
    capPerKey(Ivf.attachCell(df, vecCol, model, cellCol),
      Seq(cellCol), idCol, capPerCell, salt)
  }
}
