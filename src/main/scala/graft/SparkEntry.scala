package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Ext, Relational}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator name -> (spark, sfDir) -> DataFrame; each
  * SQL-expressible entry has a DuckDB twin in `oracleSql` with identical
  * column names (the driver sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q03RegionRevenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.all ++ Ext.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Ext.oracles ++ Map(
      // loaded-model twins are their fresh-model siblings VERBATIM: the
      // oracle gate is the statement that scoring from a persisted +
      // reloaded model is bit-identical to the trainer's in-memory model
      "txt_perplexity_kn_loaded" -> Ext.oracles("txt_perplexity_kn"),
      "sim_classify_loaded" -> Ext.oracles("sim_classify_train"))
}
