package graft

import graft.operators.Snapshot
import org.apache.spark.sql.functions._

/** Snapshot diff: status classification, churn summary, and the
  * reprocess-set (added+changed) semantics. */
class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def oldSnap = Seq(
    (1L, "alpha"), (2L, "beta"), (3L, "gamma")
  ).toDF("id", "text")
  private def newSnap = Seq(
    (1L, "alpha"),       // unchanged
    (2L, "BETA EDITED"), // changed
    (4L, "delta")        // added; 3 is removed
  ).toDF("id", "text")

  test("classifies added/removed/changed/unchanged by fingerprint") {
    val d = Snapshot.diff(oldSnap, newSnap, "id")
      .select("id", "status").as[(Long, String)].collect().toMap
    assert(d === Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("summary counts match the detail") {
    val s = Snapshot.diffSummary(oldSnap, newSnap, "id")
      .as[(String, Long)].collect().toMap
    assert(s === Map("unchanged" -> 1L, "changed" -> 1L, "removed" -> 1L, "added" -> 1L))
  }

  test("changedRows returns only added+changed with new-snapshot columns") {
    val rows = Snapshot.changedRows(oldSnap, newSnap, "id")
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(rows === Seq((2L, "BETA EDITED"), (4L, "delta")),
      "work proportional to churn: ids 2 (changed) and 4 (added) only")
  }

  test("custom fingerprint column controls what counts as a change") {
    // fingerprint only the first character: "beta" vs "BETA EDITED" now
    // differ by case, "alpha" stays equal
    val fp = md5(lower(substring(col("text"), 1, 1)).cast("binary"))
    val d = Snapshot.diff(oldSnap, newSnap, "id", fp)
      .select("id", "status").as[(Long, String)].collect().toMap
    assert(d(1L) === "unchanged")
    assert(d(2L) === "unchanged", "first-letter fingerprint ignores the edit")
  }

  test("categoryDrift: zero for identical mixes, epsilon-floored for vanishing ones") {
    val oldDf = (1L to 100L).map(i => (i, if (i <= 80) "en" else "de")).toDF("id", "lang")
    val same = Snapshot.categoryDrift(oldDf, oldDf, "lang")
    assert(same.select("psi_term").as[Double].collect().forall(_ == 0.0),
      "identical distributions have zero PSI")
    // de vanishes in the new snapshot: its new_share floors at epsilon,
    // yielding a large positive term instead of infinity
    val newDf = (1L to 100L).map(i => (i, "en")).toDF("id", "lang")
    val drift = Snapshot.categoryDrift(oldDf, newDf, "lang")
      .collect().map(r => r.getString(0) -> r.getDouble(5)).toMap
    assert(drift("de") > 1.0 && !drift("de").isInfinite,
      s"vanished category: large finite term, got ${drift("de")}")
    val counts = Snapshot.categoryDrift(oldDf, newDf, "lang")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(counts === Set(("en", 80L, 100L), ("de", 20L, 0L)))
  }

  test("numericDrift: old-anchored bins, shifted mass shows, nulls get their own bin") {
    val oldDf = (1L to 1000L).map(i => (i, Some(i.toDouble % 100))).toDF("id", "v")
    val same = Snapshot.numericDrift(oldDf, oldDf, "v", nBins = 4)
    assert(same.select("psi_term").as[Double].collect().forall(_ == 0.0))
    // shift the new distribution up by 50: mass moves to the top bin
    val shifted = (1L to 1000L).map(i => (i, Some(i.toDouble % 100 + 50))).toDF("id", "v")
    val drift = Snapshot.numericDrift(oldDf, shifted, "v", nBins = 4)
      .collect().map(r => r.getInt(0) -> r.getDouble(5)).toMap
    assert(drift(3) > 0.1, s"top bin gains mass: $drift")
    assert(drift.values.sum > 0.25, s"total PSI flags the shift: $drift")
    // nulls are visible as bin -1, not silently top-binned
    val withNulls = (1L to 100L).map(i =>
      (i, if (i % 4 == 0) None else Some(i.toDouble))).toDF("id", "v")
    val nb = Snapshot.numericDrift(oldDf, withNulls, "v", nBins = 4)
      .select("bin").as[Int].collect().toSet
    assert(nb.contains(-1))
    intercept[IllegalArgumentException] {
      Snapshot.numericDrift(oldDf, oldDf, "v", nBins = 1)
    }
  }

  test("empty snapshots degenerate cleanly") {
    val empty = Seq.empty[(Long, String)].toDF("id", "text")
    val allAdded = Snapshot.diff(empty, newSnap, "id")
      .select("status").distinct().as[String].collect().toSeq
    assert(allAdded === Seq("added"))
    val allRemoved = Snapshot.diff(oldSnap, empty, "id")
      .select("status").distinct().as[String].collect().toSeq
    assert(allRemoved === Seq("removed"))
  }

  test("persisted corpus sketch answers batch-novelty without touching the corpus") {
    import org.apache.spark.sql.functions.col
    val corpus = (0L until 5000L).toDF("doc_id")
    val dir = java.nio.file.Files.createTempDirectory("graft_sketch").toString
    Snapshot.saveCorpusSketch(corpus, "doc_id", dir)
    // batch: 1000 known ids + 500 new ones -> new fraction 1/3
    val batch = ((1000L until 2000L) ++ (9000L until 9500L)).toDF("doc_id")
    val r = Snapshot.batchVsCorpusSketch(batch, "doc_id", dir).collect()(0)
    assert(r.getAs[Long]("batch_distinct") === 1500L)
    val overlap = r.getAs[Long]("overlap_est")
    val fresh = r.getAs[Long]("new_est")
    assert(math.abs(overlap - 1000L) <= 50, s"overlap=$overlap")
    assert(math.abs(fresh - 500L) <= 25, s"new=$fresh")
    assert(math.abs(r.getAs[Double]("new_fraction") - 1.0 / 3) < 0.02)
    // the artifact is tiny — a few KB stands in for the corpus
    val bytes = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
      .map(_.length()).sum
    assert(bytes < 64 * 1024, s"sketch artifact should be KBs, was $bytes")
  }

  test("ksStatistic: identical samples give 0; known shift gives the exact sup distance") {
    import graft.operators.Snapshot
    import org.apache.spark.sql.functions.col
    val a = (1 to 100).map(_.toLong).toDF("x")
    assert(Snapshot.ksStatistic(a, a, "x").head().getDouble(0) === 0.0)
    // ref uniform{1..4} x25; cur uniform{3..6} x25: ECDFs cross maximally
    // at v=2: F1=0.5, F2=0 -> D=0.5 (and at v=4: 1.0 vs 0.5)
    val ref = (1 to 4).flatMap(v => Seq.fill(25)(v.toLong)).toDF("x")
    val cur = (3 to 6).flatMap(v => Seq.fill(25)(v.toLong)).toDF("x")
    val row = Snapshot.ksStatistic(ref, cur, "x").head()
    assert(row.getDouble(0) === 0.5)
    assert(row.getLong(1) === 100L && row.getLong(2) === 100L)
    // nulls are excluded, not counted
    val withNull = spark.sql("SELECT CAST(NULL AS BIGINT) AS x").unionByName(a)
    assert(Snapshot.ksStatistic(withNull, a, "x").head().getDouble(0) === 0.0)
    // empty sample fails loud (raise_error at evaluation time)
    intercept[Exception](
      Snapshot.ksStatistic(a.where(col("x") < 0), a, "x").head())
  }
}
