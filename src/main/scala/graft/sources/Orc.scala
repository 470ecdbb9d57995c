package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ORC source/sink — the second columnar interchange format after
  * parquet (Hive/Trino-heavy estates are ORC-native, and cross-org
  * corpus exchange shouldn't require a transcode step on THEIR side).
  *
  * Same scale rules as the parquet path: columnar scans prune columns
  * and push predicates (ORC carries min/max stripe statistics exactly
  * as parquet carries row-group stats, so the `PushedFilters` story is
  * unchanged), sharded parallel writes, zstd compression (ORC's
  * default zlib trades ~20% read CPU for little size on text). */
object Orc {

  /** Write `df` as `numShards` zstd ORC part files under `dir`. */
  def write(df: DataFrame, dir: String, numShards: Int): Unit = {
    require(numShards > 0, "numShards must be positive")
    df.repartition(numShards)
      .write.mode("overwrite").option("compression", "zstd").orc(dir)
  }

  /** ORC scan. Schema comes from the ORC footer (one metadata read,
    * unlike JSON inference — no explicit-schema requirement here). */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.orc(dir)
}
