package graft

import graft.sources.{Warc, Wat}
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

/** WAT sidecar: envelope round trip, link harvest + title extraction
  * in the generation path, null-link graph nodes, non-HTML skip. */
class WatSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("write: links + title harvest to the published envelope; readLinks round trip") {
    val html1 = "<html><head><title>A &amp; \"B\"</title></head><body>" +
      "<a href=\"https://x.test/1\">one</a><A HREF='https://x.test/2'>two</A></body></html>"
    val html2 = "<html><head></head><body>no anchors here</body></html>"
    val captures = Seq(
      ("https://a.test/p1", ts(1700000001L), "response", "text/html", html1.getBytes(UTF_8)),
      ("https://a.test/p2", ts(1700000002L), "response", "text/html; charset=utf-8", html2.getBytes(UTF_8)),
      ("https://a.test/p3", ts(1700000003L), "response", "image/png", Array[Byte](1)),
      ("https://a.test/p4", ts(1700000004L), "metadata", "application/json", "{}".getBytes(UTF_8)))
      .toDF("url", "ts", "record_type", "content_type", "payload")
    val warcDir = Files.createTempDirectory("graft_wat_src").toString
    val watDir = Files.createTempDirectory("graft_wat_out").toString
    Warc.write(captures, warcDir, numShards = 1)
    Wat.write(spark, warcDir, watDir, numShards = 1)
    val got = Wat.readLinks(spark, watDir)
      .orderBy("src_url", "link_url").collect()
    // p1: two links; p2: ONE null-link node; p3/p4: skipped entirely
    assert(got.map(_.getString(0)).toSeq ===
      Seq("https://a.test/p1", "https://a.test/p1", "https://a.test/p2"))
    assert(got(0).getString(2) === "A &amp; \"B\"") // title, JSON-escaped quote survives
    assert(got(0).getString(3) === "A@/href" && got(0).getString(4) === "https://x.test/1")
    assert(got(1).getString(4) === "https://x.test/2") // case-insensitive href scan
    assert(got(2).isNullAt(3) && got(2).isNullAt(4), "no-anchor page is a null-link node")
    assert(got(2).isNullAt(2), "absent <title> is null")
  }
}
