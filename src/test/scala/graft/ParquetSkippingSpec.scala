package graft

import graft.sources.PartitionedParquet
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Parquet data-skipping hardening: bloom filters + column indexes are
  * REALLY in the files, and the bloom filter prunes row groups for
  * point lookups on a SCATTERED column where min/max stats cannot. */
class ParquetSkippingSpec extends SparkSpec {
  import spark.implicits._

  /** ids sorted (stats-tight); domain scattered across row groups so
    * every group's [min,max] spans most domains — the stats-can't-help
    * regime bloom filters exist for. Padding inflates bytes so the tiny
    * block size yields several row groups per file. */
  private def fixture(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_pq_skip").toString
    val df = (0 until 6000).map { i =>
      (i.toLong, s"d${i % 97}", "pad" * 60 + i.toString)
    }.toDF("doc_id", "domain", "text").coalesce(1)
    PartitionedParquet.writeIndexed(df, dir, partitionCols = Seq.empty,
      idCol = "doc_id", bloomCols = Seq("domain"),
      expectedNdv = 1000L, blockSizeBytes = 64L * 1024)
    dir
  }

  private def footers(dir: String) = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new Path(dir)).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => ParquetFileReader.open(
        HadoopInputFile.fromPath(s.getPath, spark.sparkContext.hadoopConfiguration)))
  }

  test("bloom filter + column index artifacts exist for the requested column only") {
    val readers = footers(fixture())
    try {
      val blocks = readers.flatMap(r => r.getFooter.getBlocks.asScala.map(r -> _))
      assert(blocks.size >= 3, s"fixture must span several row groups, got ${blocks.size}")
      blocks.foreach { case (r, b) =>
        val domainCol = b.getColumns.asScala.find(_.getPath.toDotString == "domain").get
        val textCol = b.getColumns.asScala.find(_.getPath.toDotString == "text").get
        assert(r.getBloomFilterDataReader(b).readBloomFilter(domainCol) != null,
          "domain must carry a bloom filter in every row group")
        assert(r.getBloomFilterDataReader(b).readBloomFilter(textCol) == null,
          "unrequested columns must NOT pay bloom bytes")
        assert(r.readColumnIndex(domainCol) != null,
          "page-level column index must be present")
      }
    } finally readers.foreach(_.close())
  }

  test("bloom prunes row groups on point lookups where min/max stats cannot") {
    val dir = fixture()
    val readers = footers(dir)
    try {
      val blocks = readers.flatMap(r => r.getFooter.getBlocks.asScala.map(r -> _))
      val total = blocks.size
      def mightContain(v: String): Int = blocks.count { case (r, b) =>
        val c = b.getColumns.asScala.find(_.getPath.toDotString == "domain").get
        val bloom = r.getBloomFilterDataReader(b).readBloomFilter(c)
        bloom.findHash(bloom.hash(Binary.fromString(v)))
      }
      // stats CANNOT prune this probe: every row group's [min,max] spans it
      blocks.foreach { case (_, b) =>
        val c = b.getColumns.asScala.find(_.getPath.toDotString == "domain").get
        val st = c.getStatistics
        val mn = new String(st.getMinBytes, java.nio.charset.StandardCharsets.UTF_8)
        val mx = new String(st.getMaxBytes, java.nio.charset.StandardCharsets.UTF_8)
        assert(mn <= "d7" && "d7" <= mx,
          s"scattered column: every group's stats range [$mn,$mx] must span the probe")
      }
      // a value absent from the data: bloom says definitely-not everywhere
      assert(mightContain("zz-not-a-domain") === 0,
        "absent probe must prune ALL row groups")
      // present value: pruning still keeps it somewhere
      assert(mightContain("d7") >= 1)
      // read-back correctness with pushdown on
      val got = PartitionedParquet.read(spark, dir)
        .where(col("domain") === "d7").select("doc_id").as[Long].collect().sorted
      assert(got.toSeq === (0 until 6000).filter(_ % 97 == 7).map(_.toLong))
    } finally readers.foreach(_.close())
  }
}
