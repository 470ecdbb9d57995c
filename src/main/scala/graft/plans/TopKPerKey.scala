package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Cast, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Native top-k-per-key operator (custom LogicalPlan + Strategy +
  * SparkPlan, SURVEY.md §4.2 escape hatch (c)).
  *
  * The built-in formulation — `row_number().over(Window.partitionBy(key)
  * .orderBy(v.desc)) <= k` — shuffles EVERY row to rank it, then throws
  * almost all of them away. This operator runs a bounded per-key heap in
  * each input partition first (partial), shuffles only the <= k survivors
  * per (key, partition) — the same partial/final split Spark uses for
  * aggregates — and finishes with an exact per-key top-k after the
  * exchange. At 100 TB with small k this cuts the shuffle by orders of
  * magnitude; the exchange is inserted by EnsureRequirements from the
  * final node's ClusteredDistribution requirement.
  *
  * Semantics: keep rows ranked <= k per key by (orderCol DESC, tieCol
  * ASC) — the tie column makes results deterministic and
  * oracle-comparable. orderCol is evaluated in its NATIVE type and
  * compared with Spark's interpreted ordering for that type (an earlier
  * version cast to double, which merged long/decimal ranks beyond 2^53
  * and so had to reject those types); tieCol is evaluated as long.
  */
case class TopKPerKey(keys: Seq[Attribute], order: Expression, tie: Expression,
                      k: Int, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

case class TopKPerKeyExec(keys: Seq[Attribute], order: Expression, tie: Expression,
                          k: Int, partial: Boolean, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val orderExpr = order
    val tieExpr = tie
    val childOutput = child.output
    // The PARTIAL phase's heap map grows with the distinct keys seen in a
    // partition — unbounded key cardinality would OOM where the window
    // formulation spills. Bound it: past `flushThreshold` buffered rows
    // the map is emitted downstream and cleared (some keys then ship more
    // than k rows from one partition — harmless, the final phase
    // re-ranks; this is the same shape as partial-aggregation fallback).
    // The FINAL phase's state is the result itself (<= k rows per key,
    // all keys of the hash-clustered partition) and is never flushed.
    // max(1, ...): a zero/negative setting would make the consume loop
    // admit no rows while drain() emits nothing — an infinite spin
    val flushThreshold =
      if (partial) math.max(1, conf.getConfString("graft.topk.partialMaxBufferedRows", "1000000").toInt)
      else Int.MaxValue
    child.execute().mapPartitions ({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordEval = BindReferences.bindReference(orderExpr, childOutput)
      val tieEval = BindReferences.bindReference(Cast(tieExpr, LongType), childOutput)
      // Native-type ordering (same interpreted ordering the Sort operator
      // uses, so NaN/decimal/timestamp semantics match the window
      // formulation exactly). The heap stores the evaluated value boxed —
      // no costlier than before (tuple members were already boxed).
      val valueOrd = TypeUtils.getInterpretedOrdering(orderExpr.dataType)
      // "better" = (non-null, higher order value, lower tie): an explicit
      // non-null flag keeps null order values BELOW genuine minimal
      // data, matching row_number over DESC (NULLS LAST) exactly.
      // Explicit comparator — the earlier Ordering.by(..., -t) negation
      // overflowed on Long.MinValue (the null-tie encoding), silently
      // inverting NULLS FIRST.
      type Entry = (Boolean, Any, Long, InternalRow)
      val betterOrd: Ordering[Entry] = new Ordering[Entry] {
        override def compare(a: Entry, b: Entry): Int = {
          val c1 = java.lang.Boolean.compare(a._1, b._1)
          if (c1 != 0) return c1
          if (a._1) { // both non-null
            val c2 = valueOrd.compare(a._2, b._2)
            if (c2 != 0) return c2
          }
          java.lang.Long.compare(b._3, a._3) // LOWER tie is better
        }
      }
      // min-heap under betterOrd: the root is the current worst survivor
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[Entry]]
      var bufferedRows = 0
      // UTF8String from an UnsafeRow points into the row buffer the
      // iterator reuses — clone when (and only when) the value outlives
      // processRow by entering a heap; the common rejected row compares
      // against the buffer-backed value and allocates nothing
      // (Decimal/primitives are materialized fresh by eval).
      def keep(v: Any): Any = v match {
        case s: UTF8String => s.clone()
        case other => other
      }
      def processRow(row: InternalRow): Unit = {
        val v0 = ordEval.eval(row)
        val nonNull = v0 != null
        // null tie = Long.MinValue: ASC NULLS FIRST, matching row_number's
        // default null ordering (unboxing null would silently give 0)
        val t0 = tieEval.eval(row)
        val t = if (t0 == null) Long.MinValue else t0.asInstanceOf[Long]
        val key = keyProj(row)
        heaps.get(key) match {
          case None =>
            val h = mutable.PriorityQueue.empty(betterOrd.reverse)
            h.enqueue((nonNull, keep(v0), t, row.copy()))
            heaps.put(key.copy(), h)
            bufferedRows += 1
          case Some(h) =>
            if (h.size < kLocal) {
              h.enqueue((nonNull, keep(v0), t, row.copy()))
              bufferedRows += 1
            } else if (betterOrd.compare((nonNull, v0, t, null), h.head) > 0) {
              h.dequeue()
              h.enqueue((nonNull, keep(v0), t, row.copy()))
            }
        }
      }
      // materialize entry references (rows are already copies) before
      // clearing, so the drained iterator survives the reset
      def drain(): Iterator[InternalRow] = {
        val vs = heaps.valuesIterator.map(_.toArray).toArray
        heaps.clear()
        bufferedRows = 0
        vs.iterator.flatMap(_.iterator.map(_._4))
      }
      new Iterator[Iterator[InternalRow]] {
        override def hasNext: Boolean = iter.hasNext || heaps.nonEmpty
        override def next(): Iterator[InternalRow] = {
          while (iter.hasNext && bufferedRows < flushThreshold) processRow(iter.next())
          drain()
        }
      }.flatten
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, tie, k, child) =>
      val part = TopKPerKeyExec(keys, order, tie, k, partial = true, planLater(child))
      TopKPerKeyExec(keys, order, tie, k, partial = false, part) :: Nil
    case _ => Nil
  }
}

object TopK {
  /** Installs the planner strategy AND the window-top-k rewrite rule on
    * a session (idempotent; public `spark.experimental` hooks) — an
    * explicit opt-in, because the rewrite changes the plans of every
    * matching window query on the session.
    * [[graft.core.GraftSession]] calls this; sessions built outside
    * graft can set `spark.sql.extensions=graft.core.GraftExtensions`
    * instead. */
  def install(spark: SparkSession): Unit = {
    installStrategy(spark)
    if (!spark.experimental.extraOptimizations.contains(TopKRewrite))
      spark.experimental.extraOptimizations = spark.experimental.extraOptimizations :+ TopKRewrite
  }

  private def installStrategy(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ TopKStrategy

  /** Column API: top-k rows per key by (orderCol DESC, tieCol ASC).
    * Registers only the planner strategy — calling this does NOT opt the
    * session into the global window rewrite. */
  def perKey(df: DataFrame, keyCols: Seq[String], orderCol: String,
             tieCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    installStrategy(spark)
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute = analyzed.output
      .find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(s"column $name not found"))
    val ov = attr(orderCol)
    require(TopKRewrite.nativeOrderable(ov.dataType),
      s"order column $orderCol: ${ov.dataType} is not natively orderable by TopKPerKey")
    val node = TopKPerKey(keyCols.map(attr), ov, attr(tieCol), k, analyzed)
    org.apache.spark.sql.GraftColumnBridge.ofRows(spark, node)
  }
}
