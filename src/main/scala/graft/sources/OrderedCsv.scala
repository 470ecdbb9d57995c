package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Order-preserving single-object CSV sink.
  *
  * The reference's output contract (test.py:182-255): one CSV object named
  * `{file_name}_final.csv`, header included, rows in exact input order.
  * Implemented as sort -> coalesce(1) -> write -> rename of the single
  * part file. `coalesce(1)` is correct for enrichment-scale outputs (the
  * reference materialized the whole file in one process anyway); for
  * lake-scale outputs use the multi-file `df.write` path and concat on
  * the object store instead — both run through the same Hadoop
  * FileSystem API, so `file://` and `s3a://` behave identically here.
  */
object OrderedCsv {

  /** Writes `df` ordered by `orderCol` (dropped from output) to
    * `dir/{fileName}_final.csv`; returns the full path. */
  def write(df: DataFrame, dir: String, fileName: String, orderCol: String = "_row_idx"): String = {
    val spark = df.sparkSession
    val tmp = s"$dir/_tmp_${fileName}_${System.nanoTime()}"
    // coalesce(1) merges partitions in order; the in-partition sort then
    // gives exact total order WITHOUT a global orderBy — whose range
    // sampling would re-execute the upstream plan (paid LLM calls) a
    // second time.
    df.coalesce(1).sortWithinPartitions(col(orderCol)).drop(orderCol)
      .write.option("header", "true").mode("overwrite").csv(tmp)

    val conf = spark.sparkContext.hadoopConfiguration
    val fs = FileSystem.get(new java.net.URI(tmp), conf)
    val part = fs.globStatus(new Path(s"$tmp/part-*"))(0).getPath
    val dest = new Path(s"$dir/${fileName}_final.csv")
    if (fs.exists(dest)) fs.delete(dest, false)
    fs.rename(part, dest)
    fs.delete(new Path(tmp), true)
    dest.toString
  }

  /** Reference URL-shape parity (test.py:248-252): the reference returns
    * `https://{bucket}.s3.amazonaws.com/{key}` for its uploaded object.
    * Hadoop S3 paths (`s3a://bucket/key`, `s3://bucket/key`) are mapped to
    * that public-style virtual-hosted URL; any other filesystem's path
    * (file://, hdfs://) is returned untouched. Purely syntactic — no
    * network, so it behaves identically under the local-FS tests and a
    * real S3A deployment. */
  def publicUrl(path: String): String = {
    val m = "^s3a?://([^/]+)/(.+)$".r
    path match {
      case m(bucket, key) => s"https://$bucket.s3.amazonaws.com/$key"
      case _ => path
    }
  }

  /** Lake-scale variant: `numShards` part files whose LEXICOGRAPHIC name
    * order equals row order — `repartitionByRange` on the order column
    * gives contiguous ascending ranges per output task, and Spark's
    * part-00000..part-NNNNN numbering follows partition order. Readers
    * concatenate in file-name order (or an S3 multipart concat does) to
    * recover the exact input order without any single-node bottleneck.
    * Returns the directory. NOTE: `repartitionByRange` runs a sampling
    * pass over `df` to pick boundaries — if the upstream stage is
    * side-effecting (paid LLM calls), persist `df` first, as
    * ProcessCsvServer does. */
  def writeSharded(df: DataFrame, dir: String, fileName: String,
                   numShards: Int, orderCol: String = "_row_idx"): String = {
    val out = s"$dir/${fileName}_final_csv"
    df.repartitionByRange(numShards, col(orderCol))
      .sortWithinPartitions(col(orderCol))
      .drop(orderCol)
      .write.option("header", "true").mode("overwrite").csv(out)
    out
  }
}
