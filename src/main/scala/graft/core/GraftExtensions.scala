package graft.core

import org.apache.spark.sql.SparkSessionExtensions

/** Production injection point: `--conf spark.sql.extensions=
  * graft.core.GraftExtensions` installs graft's custom planner strategy
  * and optimizer rule on every session of the application — the
  * idiomatic deployment hook (SURVEY §4.2 escape hatch (c)).
  * [[GraftSession]] installs the same pieces programmatically for
  * sessions it builds itself. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    e.injectOptimizerRule(_ => graft.plans.TopKRewrite)
  }
}
