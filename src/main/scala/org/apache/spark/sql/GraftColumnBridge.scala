package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column <-> catalyst Expression
  * converters, for graft's native expressions (see
  * graft.functions.VectorExpressions). Compiled into the
  * org.apache.spark.sql package solely to satisfy the access modifier —
  * the same pattern community Spark extension libraries use. Classic
  * (non-Connect) Spark only. */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def ofRows(spark: SparkSession, plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** True when no Dataset cache is registered — operators that persist
    * intermediates must leave the CacheManager exactly as they found it
    * (Dataset caches are NOT ContextCleaner-managed; a leaked entry
    * lives until explicit unpersist). Test/diagnostic hook. */
  def cacheManagerIsEmpty(spark: SparkSession): Boolean =
    spark.asInstanceOf[classic.SparkSession].sharedState.cacheManager.isEmpty
}
