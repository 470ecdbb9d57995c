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

  /** Data-skipping-hardened variant: besides the sorted-id row-group
    * stats, write parquet BLOOM FILTERS for `bloomCols` — the serving-
    * side complement to directory pruning and Z-order. Stats prune
    * point lookups only on the SORTED column; a lookup on any scattered
    * column (domain, url-hash) spans every row group's min/max, and
    * only a bloom filter can say "definitely not in this row group".
    * Column indexes (page-level min/max) are on by default in
    * parquet-mr 1.11+; this asserts-by-construction that both artifacts
    * exist for the lookup columns a serving layer actually probes.
    *
    * `expectedNdv` sizes each bloom filter (parquet-mr derives bits
    * from it; the default targets ~1% false-positive at that
    * cardinality). `blockSizeBytes` bounds row-group size — smaller
    * groups = finer skipping granularity at slightly worse scan
    * throughput; the 128 MB default matches the upstream default. */
  def writeIndexed(df: DataFrame, dir: String, partitionCols: Seq[String],
                   idCol: String, bloomCols: Seq[String],
                   expectedNdv: Long = 1000000L,
                   maxRecordsPerFile: Long = 1000000L,
                   blockSizeBytes: Long = 128L * 1024 * 1024): Unit = {
    require(bloomCols.nonEmpty, "bloomCols must be non-empty")
    var w = df.sortWithinPartitions(
        (partitionCols :+ idCol).map(org.apache.spark.sql.functions.col): _*)
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .option("parquet.block.size", blockSizeBytes)
    bloomCols.foreach { c =>
      // parquet-mr silently DROPS the bloom filter when a chunk ends up
      // fully dictionary-encoded (the dictionary already prunes
      // exactly), so a small-NDV test corpus would write no artifact at
      // all. Bloom columns are by definition the high-NDV lookup
      // columns whose dictionaries blow out at scale — disabling
      // dictionary on exactly these makes the skipping artifact
      // deterministic instead of data-dependent.
      w = w.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", expectedNdv)
        .option(s"parquet.enable.dictionary#$c", "false")
    }
    val withParts = if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w
    withParts.mode("overwrite").parquet(dir)
  }
}
