package graft

import graft.operators.Enrich
import graft.sources.OrderedCsv
import java.nio.file.Files
import scala.io.Source

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("OrderedCsv writes one *_final.csv with header and exact input order") {
    val dir = Files.createTempDirectory("graft_csv").toString
    // parallelize keeps global order across partitions (like a multi-split
    // file read); withRowIndex must run BEFORE any shuffle — that's its
    // contract (Enrich scaladoc)
    val base = spark.createDataFrame(
      spark.sparkContext.parallelize((0 until 37).map(i => (s"v$i", i * 2)), 5))
      .toDF("name", "num")
    val df = Enrich.withRowIndex(base)
    val path = OrderedCsv.write(df, dir, "myfile")
    assert(path.endsWith("/myfile_final.csv"))
    val src = Source.fromFile(new java.io.File(new java.net.URI(path).getPath))
    val lines = try src.getLines().toVector finally src.close()
    assert(lines.head == "name,num")
    assert(lines.tail == (0 until 37).map(i => s"v$i,${i * 2}").toVector)
  }

  test("withRowIndex is contiguous and matches input order across partitions") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize((0 until 100).map(i => Tuple1(s"r$i")), 7))
      .toDF("v")
    val indexed = Enrich.withRowIndex(df)
    val rows = indexed.orderBy("_row_idx").collect()
    assert(rows.map(_.getLong(1)).toSeq == (0L until 100L))
    assert(rows.map(_.getString(0)).toSeq == (0 until 100).map(i => s"r$i"))
  }
}
