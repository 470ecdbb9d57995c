package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable heavy-hitters sketch: the Misra–Gries frequent-items
  * summary (Misra & Gries 1982) with the merge rule of Agarwal,
  * Cormode et al., "Mergeable Summaries" (PODS 2012) — the standard
  * bounded-space answer to "top domains / top tokens over 100 TB"
  * where an exact groupBy would shuffle every distinct key.
  *
  * Summary = at most `k` (item, count) counters. Insert: tracked item
  * increments; an untracked item takes a free slot, else every counter
  * decrements by one (zeros evicted). Merge: sum counts of common
  * items, union the rest, then subtract the (k+1)-largest count from
  * all and keep the positives — the PODS'12 result is that this
  * preserves the one-pass error bound, which makes the sketch safe for
  * arbitrary partial-aggregation trees (Spark's map-side combine +
  * reduce).
  *
  * Guarantees over a stream of n items (any merge tree):
  *   - estimates UNDERCOUNT: true - n/(k+1) <= est <= true;
  *   - every item with true count > n/(k+1) is present in the summary
  *     (so with k = 1/theta, all theta-heavy hitters survive).
  *
  * Shuffle cost: one k-entry map per group per partition — constant in
  * the data size, the whole point vs `groupBy(item).count()` whose
  * shuffle carries every distinct item. The exact top-N stays the
  * right call when N is small AND a full count is needed; the sketch
  * is for "what's frequent" over unbounded key domains (URLs, tokens,
  * user agents) where the distinct count itself is the problem.
  */
object FreqSketch {

  /** `counts` holds at most k entries (k fixed per aggregator). */
  final case class Buf(counts: Map[String, Long])

  /** Core single-item update, exposed for spec-level verification. */
  private[graft] def insert(counts: Map[String, Long], item: String, k: Int): Map[String, Long] =
    counts.get(item) match {
      case Some(c) => counts.updated(item, c + 1L)
      case None if counts.size < k => counts.updated(item, 1L)
      case None =>
        // decrement-all: the new item and one unit of every counter
        // cancel; zeros drop out
        counts.iterator.map { case (w, c) => (w, c - 1L) }
          .filter(_._2 > 0L).toMap
    }

  /** PODS'12 merge: pointwise sum, then shrink back to k by subtracting
    * the (k+1)-largest count. Exposed for spec-level verification. */
  private[graft] def mergeCounts(a: Map[String, Long], b: Map[String, Long],
                                 k: Int): Map[String, Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val summed = (a.keySet ++ b.keySet).iterator
      .map(w => w -> (a.getOrElse(w, 0L) + b.getOrElse(w, 0L))).toMap
    if (summed.size <= k) summed
    else {
      // (k+1)-th largest value; ties are fine — subtracting it zeroes
      // out everything at or below, leaving <= k strictly-larger items
      val kth = summed.valuesIterator.toArray.sortBy(-_).apply(k)
      summed.iterator.map { case (w, c) => (w, c - kth) }
        .filter(_._2 > 0L).toMap
    }
  }

  /** Typed Aggregator over a string item column. Null items are skipped
    * (consistent with count(col) semantics). */
  def agg(k: Int): Aggregator[String, Buf, Map[String, Long]] = {
    require(k >= 1, "k must be >= 1")
    new Aggregator[String, Buf, Map[String, Long]] {
      override def zero: Buf = Buf(Map.empty)
      override def reduce(b: Buf, item: String): Buf =
        if (item == null) b else Buf(insert(b.counts, item, k))
      override def merge(a: Buf, b: Buf): Buf = Buf(mergeCounts(a.counts, b.counts, k))
      override def finish(b: Buf): Map[String, Long] = b.counts
      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Map[String, Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    }
  }

  /** Column form: `df.agg(FreqSketch.heavyHitters(col("domain"), 32))`
    * returns a map<string,bigint> of surviving counters (undercounted
    * by at most n/(k+1); explode + sort for a report). */
  def heavyHitters(item: Column, k: Int): Column = udaf(agg(k)).apply(item)
}
