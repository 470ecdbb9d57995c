package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hive-partitioned parquet sink/source for curated corpora.
  *
  * Partitioning by the columns every consumer filters on (language,
  * train/val/test split) turns those filters into DIRECTORY pruning: a
  * reader of `lang=en/split=train` never lists, opens, or scans any
  * other partition — the difference between touching 1/N of 100 TB and
  * all of it. The spec asserts the mechanism (PartitionFilters in the
  * scan, not a post-scan Filter), not just the row counts.
  *
  * `maxRecordsPerFile` bounds file sizes so one hot partition (English
  * is always the biggest) still parallelizes downstream; without it a
  * partition is one task's single file. Sort within partitions by the
  * id before writing so parquet row-group min/max stats stay tight on
  * the id — directory pruning and stats pruning compose. */
object PartitionedParquet {

  def write(df: DataFrame, dir: String, partitionCols: Seq[String],
            idCol: String, maxRecordsPerFile: Long = 1000000L): Unit = {
    require(partitionCols.nonEmpty, "partitionCols must be non-empty")
    // sort by (partitionCols, id): dynamic partitionBy requires an
    // ordering on the partition columns and would inject its OWN sort
    // (stability not guaranteed) over a bare id sort — pre-sorting with
    // the partition columns leading satisfies the writer's requirement
    // directly, so ids genuinely stay ordered within every file and the
    // row-group min/max stats hold
    df.sortWithinPartitions((partitionCols :+ idCol).map(org.apache.spark.sql.functions.col): _*)
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .mode("overwrite")
      .parquet(dir)
  }

  def read(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(dir)
}
