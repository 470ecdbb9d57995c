package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-Lines source/sink — the lingua franca of training-corpus
  * interchange (one JSON object per line, splittable, appendable).
  *
  * Scale rules encoded here:
  *   - READS TAKE AN EXPLICIT SCHEMA. Spark's JSON schema inference is
  *     a full extra pass over the data before the real scan — a silent
  *     2x on a 100 TB read. Callers pass the schema (usually from the
  *     table definition) and the scan is single-pass; corrupt lines
  *     land in `_corrupt_record` under the default PERMISSIVE mode
  *     instead of failing the job (crawl data always has a bad line).
  *   - WRITES SHARD, NEVER COALESCE. JSONL's whole point is parallel
  *     append/read; the ordered-single-object contract belongs to the
  *     CSV sink ([[OrderedCsv]]), not here.
  */
object Jsonl {

  /** Write `df` as `numShards` JSONL part files under `dir`. */
  def write(df: DataFrame, dir: String, numShards: Int): Unit = {
    require(numShards > 0, "numShards must be positive")
    df.repartition(numShards).write.mode("overwrite").json(dir)
  }

  /** Single-pass schema-explicit JSONL read; keeps corrupt lines as
    * `_corrupt_record` rows when the schema includes that column. */
  def read(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(dir)
}
