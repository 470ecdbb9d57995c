package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}

/** Loaders for the TPC-H-ish fixture tables (TESTDATA.md).
  *
  * One parquet file per table under a scale-factor directory. Reads are
  * plain `spark.read.parquet` so Catalyst keeps full pushdown/pruning:
  * filters and column selections applied downstream reach the scan
  * (`PushedFilters`/`ReadSchema` in explain output). At 100 TB the same
  * call reads a partitioned parquet lake; nothing here assumes a single
  * file.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  /** `events.ts` has shipped as both parquet TIMESTAMP(NANOS) (which
    * Spark 4 rejects outright) and plain TIMESTAMP(MICROS), depending on
    * fixture vintage. Handle both: the legacy conf surfaces NANOS as a
    * raw long, which we floor-divide to micros — integer division, NOT a
    * double cast (ns-since-epoch ~1.7e18 exceeds double's 2^53
    * exact-integer range; floor matches DuckDB's ns -> us truncation).
    * A MICROS column reads as a timestamp and passes through untouched
    * (the conf only affects NANOS), so the dispatch is on the OBSERVED
    * read schema, not a guess. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // normalize to TIMESTAMP (session tz is pinned UTC in
        // GraftSession) so every downstream consumer — unix_micros in
        // AsOfJoin, window(), watermarks — sees the SAME type the NANOS
        // path always produced; wall-clock values are unchanged
        df.withColumn("ts",
          org.apache.spark.sql.functions.col("ts")
            .cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Register all fixture tables as temp views so `spark.sql` works. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
