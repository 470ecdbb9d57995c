package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed custom aggregate (SURVEY.md §2.12): per-group centroid (mean
  * vector) of an embedding column.
  *
  * Spark's Aggregator contract gives partial aggregation for free: each
  * task folds its rows into a local (sum, count) buffer, buffers merge on
  * the reduce side — so the shuffle carries one vector per group per
  * partition, not the raw embeddings. That map-side combine is the whole
  * scale story for 100 TB aggregations. */
object CentroidAggregator {

  final case class Buf(var sums: Array[Double], var n: Long)

  val agg: Aggregator[Array[Float], Buf, Array[Double]] =
    new Aggregator[Array[Float], Buf, Array[Double]] {
      override def zero: Buf = Buf(Array.empty, 0L)

      // null/empty vectors are skipped entirely (not counted in n).
      // Ragged dimensions: the buffer grows to the longest vector seen and
      // each dim accumulates over the vectors that have it — dim sums are
      // order- and partition-layout-independent, so results are
      // deterministic even on (buggy) mixed-dimension groups.
      override def reduce(b: Buf, v: Array[Float]): Buf = {
        if (v == null || v.length == 0) return b
        if (v.length > b.sums.length) b.sums = java.util.Arrays.copyOf(b.sums, v.length)
        var i = 0
        while (i < v.length) { b.sums(i) += v(i); i += 1 }
        b.n += 1
        b
      }

      override def merge(a: Buf, b: Buf): Buf = {
        if (a.n == 0) return b
        if (b.n == 0) return a
        val n = math.min(a.sums.length, b.sums.length)
        var i = 0
        while (i < n) { a.sums(i) += b.sums(i); i += 1 }
        if (b.sums.length > a.sums.length) {
          a.sums = java.util.Arrays.copyOf(a.sums, b.sums.length)
          while (i < b.sums.length) { a.sums(i) = b.sums(i); i += 1 }
        }
        a.n += b.n
        a
      }

      override def finish(b: Buf): Array[Double] =
        if (b.n == 0) Array.empty else b.sums.map(_ / b.n)

      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Array[Double]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
    }

  /** Column form: `df.groupBy(...).agg(CentroidAggregator.centroid(col("embedding")))`. */
  def centroid(embedding: Column): Column = udaf(agg).apply(embedding)
}
