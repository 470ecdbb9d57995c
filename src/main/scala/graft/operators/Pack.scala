package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sequence packing for training pipelines: assign documents to
  * fixed-token-budget chunks.
  *
  * Exact greedy packing is inherently sequential; the scalable
  * formulation is cumulative-sum binning within an explicit order:
  * chunk = floor((cumsum(tokens) - tokens) / budget) — every chunk holds
  * consecutive documents and at most `budget` tokens of SLACK-FREE
  * prefix; a document longer than the budget gets its own chunk(s)
  * boundary. Deterministic given the order column, so it stays
  * oracle-checkable (unlike random-assignment packing).
  *
  * SCALE NOTE: the cumulative sum runs one window per partition key. With
  * `partitionCols` empty the window has no partition spec and Spark
  * funnels ALL rows through one task — fine for per-group or test-sized
  * data, wrong for a whole corpus. At scale always pack within keys
  * (language, source, shard) so the windows parallelize.
  */
object Pack {

  def byTokenBudget(df: DataFrame, orderCol: String, tokenCol: String,
                    budget: Long, partitionCols: Seq[String] = Nil): DataFrame = {
    val w = (if (partitionCols.isEmpty) Window.partitionBy()
             else Window.partitionBy(partitionCols.map(col): _*))
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_cum", sum(col(tokenCol)).over(w))
      .withColumn("chunk", floor((col("_cum") - col(tokenCol)) / budget))
      .drop("_cum")
  }
}
