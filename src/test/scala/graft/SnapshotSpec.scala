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

  test("empty snapshots degenerate cleanly") {
    val empty = Seq.empty[(Long, String)].toDF("id", "text")
    val allAdded = Snapshot.diff(empty, newSnap, "id")
      .select("status").distinct().as[String].collect().toSeq
    assert(allAdded === Seq("added"))
    val allRemoved = Snapshot.diff(oldSnap, empty, "id")
      .select("status").distinct().as[String].collect().toSeq
    assert(allRemoved === Seq("removed"))
  }
}
