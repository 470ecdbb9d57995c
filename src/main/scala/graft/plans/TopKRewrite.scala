package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite the window top-k idiom
  *
  * {{{ df.withColumn("rk", row_number().over(partitionBy(K).orderBy(v.desc, tie)))
  *      .filter($"rk" <= k).drop("rk") }}}
  *
  * into the native [[TopKPerKey]] operator.
  *
  * Spark 3.5+ already partial-prunes this idiom natively
  * (`InferWindowGroupLimit` inserts a sort-based `WindowGroupLimit`
  * before the exchange), so the shuffle volume is comparable; what the
  * native operator still removes is BOTH per-partition full sorts
  * (O(n log n) -> O(n log k) heaps), the post-shuffle Sort + Window +
  * Filter chain, and the materialized rank column. The rule unwraps an
  * already-inserted matching WindowGroupLimit so the two prunings never
  * stack.
  *
  * Deliberately narrow — the rewrite fires only when it is provably
  * semantics-preserving:
  *   - exactly one window expression, a bare `row_number()` with the
  *     default ROWS UNBOUNDED PRECEDING..CURRENT ROW frame;
  *   - partition keys are plain attributes;
  *   - order spec is exactly (value DESC NULLS LAST, tie ASC): the
  *     two-sort-key shape [[TopKPerKey]] implements. Single-key windows
  *     are NOT rewritten (row_number ties there are nondeterministic and
  *     callers accepted that; we don't change which rows survive);
  *   - the value is an atomic orderable type, compared natively by the
  *     exec (long/decimal included — the exec's interpreted ordering
  *     replaced its old double packing, which merged ranks beyond 2^53);
  *     non-atomic orderables (arrays/structs) stay on the window path —
  *     their eval results alias reused row buffers. The tie is integral
  *     with ASC NULLS FIRST (the heap compares it as long, null ranking
  *     first like row_number's default);
  *   - the rank filter is `rk <= IntLiteral` / `rk < IntLiteral`;
  *   - the rank attribute is dropped by the Project directly above the
  *     filter — nothing downstream can observe the missing column.
  */
object TopKRewrite extends Rule[LogicalPlan] {

  /** Order-value types [[TopKPerKeyExec]] compares natively. Atomic
    * only: array/struct eval results alias reused row buffers, so the
    * heap could not retain them safely. */
  private[plans] def nativeOrderable(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType => true
    case _: DecimalType => true
    case DateType | TimestampType | TimestampNTZType | StringType | BooleanType => true
    case _ => false
  }

  private def integral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def defaultRowFrame(f: WindowFrame): Boolean = f match {
    case SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow) => true
    case _ => false
  }

  private def rankBound(cond: Expression, rk: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType)) if a.semanticEquals(rk) => Some(k)
    case LessThan(a: Attribute, Literal(k: Int, IntegerType))
      if a.semanticEquals(rk) && k != Int.MinValue => Some(k - 1) // MinValue-1 would wrap positive
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: Attribute) if a.semanticEquals(rk) => Some(k)
    case GreaterThan(Literal(k: Int, IntegerType), a: Attribute)
      if a.semanticEquals(rk) && k != Int.MinValue => Some(k - 1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case p @ Project(projectList,
           Filter(cond,
           Window(Seq(alias @ Alias(WindowExpression(RowNumber(), spec), _)),
                  partitionSpec, orderSpec, child, _))) =>
      val rk = alias.toAttribute
      val keys = partitionSpec.collect { case a: Attribute => a }
      val rewritten = for {
        k <- rankBound(cond, rk)
        if k > 0
        if keys.length == partitionSpec.length && keys.nonEmpty
        // no float/double keys: via spark.sql.extensions the rule runs
        // BEFORE NormalizeFloatingNumbers, and hash-partitioning raw
        // floats would split 0.0 / -0.0 into two groups
        if keys.forall(a => a.dataType != FloatType && a.dataType != DoubleType)
        if defaultRowFrame(spec.frameSpecification)
        if orderSpec.length == 2
        value <- orderSpec.head match {
          case SortOrder(v, Descending, NullsLast, _) => Some(v)
          case _ => None
        }
        // NullsFirst (the ASC default) is what the exec implements for a
        // null tie (Long.MinValue); parquet attrs are nullable, so a
        // non-null requirement would block every real table
        tie <- orderSpec(1) match {
          case SortOrder(t, Ascending, NullsFirst, _) => Some(t)
          case _ => None
        }
        if nativeOrderable(value.dataType) && integral(tie.dataType)
        // the project must drop rk and only pass through child columns
        if projectList.forall {
          case a: Attribute => !a.semanticEquals(rk) && child.outputSet.contains(a)
          case _ => false
        }
      } yield {
        // InferWindowGroupLimit (main optimizer batch, runs before user
        // rules) may already have inserted its sort-based pruning below
        // the Window — replace it, don't stack on it
        val realChild = child match {
          case WindowGroupLimit(ps, os, RowNumber(), limit, grandchild)
            if limit >= k && ps == partitionSpec && os == orderSpec => grandchild
          case other => other
        }
        Project(projectList, TopKPerKey(keys, value, tie, k, realChild))
      }
      rewritten.getOrElse(p)
  }
}
