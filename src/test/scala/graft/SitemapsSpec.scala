package graft

import graft.sources.Sitemaps
import org.apache.spark.sql.functions._

/** Sitemaps protocol: robots discovery, urlset/index XML parsing via
  * from_xml, W3C lastmod forms, one-level index resolution. */
class SitemapsSpec extends SparkSpec {
  import spark.implicits._

  private val robotsBody =
    """# crawl policy
      |Sitemap: https://a.test/sitemap_index.xml
      |User-agent: *
      |Disallow: /private
      |SITEMAP: https://a.test/extra.xml  # inline comment
      |""".stripMargin

  test("fromRobots: group-independent, case-insensitive, comment-stripped") {
    val robots = Seq(("a.test", robotsBody), ("b.test", "User-agent: *\nDisallow:\n"))
      .toDF("host", "body")
    val got = Sitemaps.fromRobots(robots).orderBy("sitemap_url")
      .as[(String, String)].collect().toSeq
    assert(got === Seq(("a.test", "https://a.test/extra.xml"),
      ("a.test", "https://a.test/sitemap_index.xml")))
  }

  test("parse: urlset entries with optional fields, xmlns, XML declaration") {
    val body =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url><loc>https://a.test/p1</loc><lastmod>2024-03-01</lastmod>
        |    <changefreq>daily</changefreq><priority>0.25</priority></url>
        |  <url><loc>https://a.test/p2</loc></url>
        |</urlset>""".stripMargin
    val got = Sitemaps.parse(Seq(("https://a.test/s.xml", body)).toDF("url", "body"))
      .orderBy("loc").collect()
    assert(got.length === 2)
    assert(got(0).getString(1) === "urlset")
    assert(got(0).getString(2) === "https://a.test/p1")
    assert(got(0).getString(3) === "2024-03-01")
    assert(got(0).getString(4) === "daily")
    assert(got(0).getDouble(5) === 0.25)
    assert(got(1).getString(2) === "https://a.test/p2")
    assert(got(1).isNullAt(3) && got(1).isNullAt(4) && got(1).isNullAt(5))
  }

  test("parse: sitemapindex and garbage documents") {
    val idx =
      """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <sitemap><loc>https://a.test/a.xml</loc><lastmod>2024-01-02</lastmod></sitemap>
        |  <sitemap><loc>https://a.test/b.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin
    val docs = Seq(("https://a.test/i.xml", idx),
      ("https://a.test/garbage", "<html><body>404</body></html>"),
      ("https://a.test/empty", "")).toDF("url", "body")
    val got = Sitemaps.parse(docs).orderBy("loc").collect()
    assert(got.length === 2)
    assert(got.forall(_.getString(1) == "index"))
    assert(got.map(_.getString(2)).toSeq ===
      Seq("https://a.test/a.xml", "https://a.test/b.xml"))
    assert(got(0).getString(3) === "2024-01-02")
    assert(got.forall(r => r.isNullAt(4) && r.isNullAt(5)))
  }

  test("lastmodTs: the three W3C forms parse, garbage stays null") {
    val got = Seq("2024-03-01", "2024-03-01T10:30:00", "2024-03-01T10:30:00+02:00",
      "2024-03-01T10:30:00Z", "next tuesday")
      .toDF("lm").select(Sitemaps.lastmodTs(col("lm")).cast("string")).as[String]
      .collect().toSeq
    assert(got(0) === "2024-03-01 00:00:00")
    assert(got(1) === "2024-03-01 10:30:00")
    assert(got(2) === "2024-03-01 08:30:00") // UTC session
    assert(got(3) === "2024-03-01 10:30:00")
    assert(got(4) === null)
  }

  test("frontier: discovery -> one-level index resolution -> seeded urls") {
    val robots = Seq(
      ("a.test", "Sitemap: https://a.test/i.xml\nUser-agent: *\nDisallow:"),
      ("b.test", "Sitemap: https://b.test/s.xml"),
      ("c.test", "User-agent: *\nDisallow: /")).toDF("host", "body")
    val idx =
      """<sitemapindex><sitemap><loc>https://a.test/s1.xml</loc></sitemap></sitemapindex>"""
    val s1 =
      """<urlset><url><loc>https://a.test/p1</loc><priority>0.5</priority></url>
        |<url><loc>https://a.test/p2</loc></url></urlset>""".stripMargin
    val sb = """<urlset><url><loc>https://b.test/p9</loc></url></urlset>"""
    // c.test publishes a sitemap nobody references: must NOT seed
    val sc = """<urlset><url><loc>https://c.test/p1</loc></url></urlset>"""
    val docs = Seq(("https://a.test/i.xml", idx), ("https://a.test/s1.xml", s1),
      ("https://b.test/s.xml", sb), ("https://c.test/s.xml", sc)).toDF("url", "body")
    val got = Sitemaps.frontier(robots, docs).orderBy("loc")
      .select("host", "loc", "priority").collect()
    assert(got.map(r => (r.getString(0), r.getString(1))).toSeq === Seq(
      ("a.test", "https://a.test/p1"), ("a.test", "https://a.test/p2"),
      ("b.test", "https://b.test/p9")))
    assert(got(0).getDouble(2) === 0.5 && got(1).isNullAt(2))
  }
}
