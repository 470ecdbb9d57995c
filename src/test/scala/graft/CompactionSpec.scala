package graft

import graft.sources.Compaction
import java.nio.file.Files

/** Small-file compaction: byte-sized output count, content equality,
  * and the stats helper it sizes from. */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  test("compaction collapses many small files into a byte-targeted few") {
    val base = Files.createTempDirectory("graft_compact").toString
    val src = s"$base/src"
    val dst = s"$base/dst"
    val df = (1L to 5000L).map(i => (i, s"document body $i " * 10)).toDF("id", "text")
    df.repartition(40).write.parquet(src)
    val (bytes, before) = Compaction.dataFileStats(spark, src)
    assert(before === 40)
    assert(bytes > 0)
    val (b2, after) = Compaction.compactParquet(spark, src, dst, targetBytes = bytes / 3)
    assert(b2 === 40)
    assert(after <= 5 && after >= 3,
      s"ceil(bytes / (bytes/3)) file target, got $after")
    val got = Compaction.read(spark, dst).as[(Long, String)].collect().toSet
    assert(got === df.collect().map(r => (r.getLong(0), r.getString(1))).toSet,
      "compaction is lossless")
  }

  test("tiny input compacts to exactly one file; stats ignore _SUCCESS") {
    val base = Files.createTempDirectory("graft_compact1").toString
    val src = s"$base/src"
    Seq((1L, "a"), (2L, "b")).toDF("id", "t").repartition(8).write.parquet(src)
    val (_, n) = Compaction.dataFileStats(spark, src)
    assert(n === 2, "one file per NON-EMPTY partition; _SUCCESS/hidden excluded")
    val (_, after) = Compaction.compactParquet(spark, src, s"$base/dst")
    assert(after === 1)
  }
}
