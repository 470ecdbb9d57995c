package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sitemaps-protocol discovery and parsing (sitemaps.org, the public
  * spec every crawler implements) — the frontier-SEEDING half of crawl
  * politeness next to [[Robots]]' exclusion half: `Sitemap:` directives
  * in robots.txt point at XML documents that enumerate a site's URLs
  * with freshness hints (`lastmod`, `changefreq`, `priority`), and a
  * `<sitemapindex>` fans out to child `<urlset>` files (how any site
  * over 50k URLs ships). A 100 TB recrawl budgets by exactly these
  * hints, so the parse must be a scan, not a fetch-time loop.
  *
  * Spark-first shape: discovery is a line parse over (host, body)
  * robots documents (same split/trim algebra as [[Robots.parseRules]]);
  * XML parses DECLARATIVELY with `from_xml` against narrowed schemas
  * (the sitemap vocabulary is flat and fixed — absent optional fields
  * null out, foreign namespaces prune away), entries fan out with one
  * `explode`. Everything narrow until the caller joins loc lists;
  * sitemap documents are KB–MB each and ride whatever source carries
  * them (here a DataFrame of (url, body)). */
object Sitemaps {

  /** One `<url>` entry: the spec's four children; `lastmod` stays a
    * string at parse (W3C datetime has date-only AND full-ISO forms —
    * interpreting it is the caller's policy). */
  private[graft] val urlsetSchema: StructType = StructType(Seq(
    StructField("url", ArrayType(StructType(Seq(
      StructField("loc", StringType),
      StructField("lastmod", StringType),
      StructField("changefreq", StringType),
      StructField("priority", DoubleType)))))))

  private[graft] val indexSchema: StructType = StructType(Seq(
    StructField("sitemap", ArrayType(StructType(Seq(
      StructField("loc", StringType),
      StructField("lastmod", StringType)))))))

  /** `Sitemap:` directives from (host, body) robots documents →
    * `(host, sitemap_url)`. Per RFC 9309 §2.3 the directive is
    * group-INDEPENDENT (valid anywhere in the file, applies to every
    * agent), so this is a pure line scan: strip comments, match the
    * case-insensitive key, keep the absolute URL value. */
  def fromRobots(robots: DataFrame, hostCol: String = "host",
                 bodyCol: String = "body"): DataFrame =
    robots.select(col(hostCol).as("host"),
        explode(split(col(bodyCol), "\n")).as("raw"))
      .select(col("host"),
        trim(regexp_replace(col("raw"), "#.*$", "")).as("line"))
      .filter(lower(col("line")).rlike("^sitemap\\s*:"))
      .select(col("host"),
        trim(regexp_extract(col("line"), "^[^:]+:(.*)$", 1)).as("sitemap_url"))
      .filter(col("sitemap_url") =!= "")

  /** Parse sitemap XML documents `(urlCol, bodyCol)` into one row per
    * entry: `(sitemap_url, kind, loc, lastmod, changefreq, priority)`
    * where `kind` is `urlset` (page entries) or `index` (child-sitemap
    * pointers, changefreq/priority null). Root-tag detection is a
    * regex on the leading bytes; a document that is neither parses to
    * zero rows (explode of a null array) rather than failing the scan
    * — crawl-scale inputs always contain garbage. */
  def parse(docs: DataFrame, urlCol: String = "url",
            bodyCol: String = "body"): DataFrame = {
    val body = col(bodyCol)
    val isUrlset = body.rlike("(?s)^\\s*(<\\?xml[^>]*>\\s*)?<urlset[\\s>]")
    val isIndex = body.rlike("(?s)^\\s*(<\\?xml[^>]*>\\s*)?<sitemapindex[\\s>]")
    val base = docs.select(col(urlCol).as("sitemap_url"), body.as("_body"),
      isUrlset.as("_isU"), isIndex.as("_isI"))
    val urlset = base.filter(col("_isU"))
      .select(col("sitemap_url"), lit("urlset").as("kind"),
        explode(from_xml(col("_body"), urlsetSchema).getField("url")).as("e"))
      .select(col("sitemap_url"), col("kind"),
        col("e.loc").as("loc"), col("e.lastmod").as("lastmod"),
        col("e.changefreq").as("changefreq"), col("e.priority").as("priority"))
    val index = base.filter(col("_isI") && !col("_isU"))
      .select(col("sitemap_url"), lit("index").as("kind"),
        explode(from_xml(col("_body"), indexSchema).getField("sitemap")).as("e"))
      .select(col("sitemap_url"), col("kind"),
        col("e.loc").as("loc"), col("e.lastmod").as("lastmod"),
        lit(null).cast(StringType).as("changefreq"),
        lit(null).cast(DoubleType).as("priority"))
    urlset.unionByName(index)
  }

  /** The spec's W3C-datetime `lastmod` as a timestamp: date-only forms
    * read as UTC midnight, full ISO forms (with or without zone
    * designator) parse as written. Unparseable stays null — freshness
    * hints are advisory. */
  def lastmodTs(lastmod: Column): Column =
    coalesce(
      try_to_timestamp(lastmod, lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
      try_to_timestamp(lastmod, lit("yyyy-MM-dd'T'HH:mm:ss")),
      try_to_timestamp(lastmod, lit("yyyy-MM-dd")))

  /** Frontier seeding end-to-end: robots documents discover sitemap
    * URLs ([[fromRobots]]), `sitemapDocs` (url, body) supplies the
    * fetched XML, `<sitemapindex>` pointers resolve ONE level to their
    * child urlsets (the protocol forbids nested indexes), and the
    * result is one row per seeded page:
    * `(host, loc, lastmod, changefreq, priority)`. Join shape: the
    * discovery table is rows-per-host tiny against the entry fan-out,
    * so both joins broadcast at real scale; entries stay narrow. */
  def frontier(robots: DataFrame, sitemapDocs: DataFrame): DataFrame = {
    val refs = fromRobots(robots) // (host, sitemap_url)
    val parsed = parse(sitemapDocs)
    // one-level index resolution: child loc -> that document's entries
    val fromIndex = refs
      .join(parsed.filter(col("kind") === "index")
          .select(col("sitemap_url"), col("loc").as("_child")),
        Seq("sitemap_url"))
      .select(col("host"), col("_child").as("sitemap_url"))
    val leafRefs = refs.unionByName(fromIndex)
    leafRefs.join(parsed.filter(col("kind") === "urlset"), Seq("sitemap_url"))
      .select(col("host"), col("loc"), col("lastmod"),
        col("changefreq"), col("priority"))
  }
}
