package graft

import graft.sources.{Warc, Wet}
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

/** WET extraction sidecar: markup-stripped conversion records, the
  * extractable-content-type gate, refers linkage back to the source
  * capture, and the end-to-end write/read round trip. */
class WetSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  private val html =
    "<html><head><style>p{}</style></head><body><!-- c --><p>Hello&nbsp;<b>crawl</b> &amp; world</p><script>1<2</script></body></html>"

  private def captures = Seq(
    ("https://a.test/1", ts(1700000001L), "response", "text/html; charset=utf-8", html.getBytes(UTF_8)),
    ("https://a.test/2", ts(1700000002L), "response", "image/png", Array[Byte](1, 2, 3)),
    ("https://a.test/3", ts(1700000003L), "response", "text/plain", "plain  text".getBytes(UTF_8)),
    ("https://a.test/4", ts(1700000004L), "response", "application/xhtml+xml", "<p>x</p>".getBytes(UTF_8)),
    ("https://a.test/5", ts(1700000005L), "response", "application/pdf", Array[Byte](9)),
    ("https://a.test/6", ts(1700000006L), "metadata", "application/json", "{}".getBytes(UTF_8)))
    .toDF("url", "ts", "record_type", "content_type", "payload")

  test("conversionRecords: strips markup, gates on extractable types") {
    val out = Wet.conversionRecords(captures).orderBy("url").collect()
    // png, pdf, and the non-response metadata record must drop
    assert(out.map(_.getString(0)).toSeq ===
      Seq("https://a.test/1", "https://a.test/3", "https://a.test/4"))
    assert(out.forall(_.getString(2) == "conversion"))
    assert(out.forall(_.getString(3) == "text/plain"))
    val texts = out.map(r => new String(r.getAs[Array[Byte]]("payload"), UTF_8))
    assert(texts(0) === "Hello crawl & world")
    assert(texts(1) === "plain text") // whitespace collapse applies to text/plain too
    assert(texts(2) === "x")
    // linkage points at the source capture
    assert(out.map(_.getAs[String]("refers_to_url")).toSeq === out.map(_.getString(0)).toSeq)
    assert(out.map(_.getAs[java.sql.Timestamp]("refers_to_ts")).toSeq ===
      out.map(_.getAs[java.sql.Timestamp]("ts")).toSeq)
  }

  test("end-to-end: WARC -> WET sidecar -> readWet, with refers headers on disk") {
    val warcDir = Files.createTempDirectory("graft_wet_src").toString
    val wetDir = Files.createTempDirectory("graft_wet_out").toString
    Warc.write(captures, warcDir, numShards = 1)
    Wet.write(spark, warcDir, wetDir, numShards = 1)
    val back = Warc.read(spark, wetDir).orderBy("url").collect()
    assert(back.length === 3)
    assert(back.forall(_.getString(2) == "conversion"))
    assert(new String(back(0).getAs[Array[Byte]]("payload"), UTF_8) === "Hello crawl & world")
    assert(back(0).getLong(4) === "Hello crawl & world".getBytes(UTF_8).length.toLong)
    // readWet convenience shape
    val wet = Warc.readWet(spark, wetDir).orderBy("url").as[(String, java.sql.Timestamp, String)].collect()
    assert(wet.map(_._3).toSeq === Seq("Hello crawl & world", "plain text", "x"))
    // the spec's WARC-Refers-To headers survive on disk: re-parse members
    val shard = new java.io.File(wetDir).listFiles().filter(_.getName.endsWith(".warc.gz")).head
    // GZIPInputStream inflates all concatenated members; records parse
    // back-to-back from the concatenation
    val inflated = new java.util.zip.GZIPInputStream(
      new java.io.FileInputStream(shard)).readAllBytes()
    val refs = Warc.parseRecordsWithRefers(inflated).toList
    assert(refs.length === 3)
    assert(refs.forall { case (row, refUrl, refTs) =>
      refUrl == row.getString(0) && refTs == row.getTimestamp(1)
    })
  }

  test("extractableType covers parameters and rejects lookalikes") {
    val ok = Seq("text/html", "text/html; charset=utf-8", "text/plain",
      "application/xhtml+xml", "application/xhtml+xml; charset=us-ascii")
    val no = Seq("image/png", "application/pdf", "application/json",
      "video/mp4", "atext/html", null)
    val df = (ok.map((_, true)) ++ no.map((_, false))).toDF("ct", "want")
    val got = df.withColumn("hit",
        coalesce(col("ct").rlike(Wet.extractableType), lit(false)))
      .filter(col("hit") =!= col("want")).count()
    assert(got === 0L)
  }
}
