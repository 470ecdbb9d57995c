package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file compaction — the maintenance pass every streaming sink
  * needs: micro-batch writers emit a part file per trigger per
  * partition, and a week of 1-minute triggers turns a table into
  * hundreds of thousands of KB-sized files whose per-file open/footer
  * overhead dominates scan time long before data volume does.
  *
  * Strategy: size the output file count from the INPUT'S actual bytes
  * (`ceil(totalBytes / targetBytes)`), one `repartition` shuffle, write
  * to a fresh directory. The rewrite is out-of-place (`src` -> `dst`) —
  * atomic swap/retire is the metastore's job, not a file trick; an
  * in-place rewrite that fails mid-way loses data, an out-of-place one
  * loses nothing. Cost: one full read+shuffle+write of the data being
  * compacted — schedule it on cold partitions (yesterday's date dirs),
  * not the live head. */
object Compaction {

  /** Recursive data-file byte total + file count under `dir`
    * (ignores _SUCCESS/metadata/hidden files). */
  def dataFileStats(spark: SparkSession, dir: String): (Long, Int) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var bytes = 0L
    var n = 0
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) {
        bytes += f.getLen; n += 1
      }
    }
    (bytes, n)
  }

  /** Compact the parquet directory `src` into `dst` with ~`targetBytes`
    * files. Returns (files before, files after). Compression changes the
    * on-disk ratio, so `targetBytes` is an input-bytes heuristic (the
    * standard practice) — at 512 MB targets the error is cosmetic. */
  def compactParquet(spark: SparkSession, src: String, dst: String,
                     targetBytes: Long = 512L * 1024 * 1024): (Int, Int) = {
    require(targetBytes > 0, "targetBytes must be positive")
    val (bytes, before) = dataFileStats(spark, src)
    val nOut = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(src)
      .repartition(nOut)
      .write.mode("overwrite").parquet(dst)
    (before, dataFileStats(spark, dst)._2)
  }

  /** The read-side view after compaction (plain parquet scan). */
  def read(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(dir)
}
