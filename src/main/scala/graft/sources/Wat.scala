package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WAT metadata sidecar (the public format CommonCrawl ships alongside
  * every WARC segment): `metadata` records whose JSON payload is the
  * per-capture "Envelope" — target URI, HTTP header metadata, and the
  * HTML-Metadata block carrying the page's outgoing `Links` and `Head`
  * fields. WAT exists precisely so 100 TB-scale consumers can harvest
  * the WEB LINK GRAPH (and titles/metas) WITHOUT re-parsing any HTML:
  * the sidecar is ~1/4 the size of the crawl and the harvest is a pure
  * scan (format knowledge public from the CommonCrawl WAT spec;
  * original code).
  *
  * Spark-first: the records ride the splittable [[Warc]] reader (WAT
  * files ARE WARC files), the envelope parses declaratively with
  * `from_json` against a narrowed schema (absent branches null out —
  * non-HTML captures simply carry no Links), and the link fan-out is
  * one `explode_outer`. Everything stays in whole-stage codegen; the
  * downstream `groupBy(target)` / PageRank shuffle is the first wide
  * edge. */
object Wat {

  /** The envelope, narrowed to the harvest fields. `from_json` ignores
    * everything else in the real sidecar (HTTP headers, metas, scripts)
    * — column pruning for semi-structured payloads. */
  private[graft] val envelopeSchema: StructType = {
    val link = StructType(Seq(
      StructField("path", StringType), StructField("url", StringType)))
    val htmlMeta = StructType(Seq(
      StructField("Links", ArrayType(link)),
      StructField("Head", StructType(Seq(StructField("Title", StringType))))))
    val payloadMeta = StructType(Seq(
      StructField("HTTP-Response-Metadata", StructType(Seq(
        StructField("HTML-Metadata", htmlMeta))))))
    val headerMeta = StructType(Seq(
      StructField("WARC-Target-URI", StringType)))
    StructType(Seq(StructField("Envelope", StructType(Seq(
      StructField("WARC-Header-Metadata", headerMeta),
      StructField("Payload-Metadata", payloadMeta))))))
  }

  /** The link graph from WAT records under `path`: one row per
    * (capture, outgoing link) — `src_url, ts, title, link_path,
    * link_url`. Captures whose envelope carries no HTML links emit one
    * row with null link columns (`explode_outer` — a page with no
    * outlinks is still a node of the graph). */
  def readLinks(spark: SparkSession, path: String,
                maxSplitBytes: Long = 128L << 20): DataFrame = {
    val env = Warc.read(spark, path, maxSplitBytes)
      .filter(col("record_type") === "metadata")
      .select(col("url").as("src_url"), col("ts"),
        from_json(decode(col("payload"), "UTF-8"), envelopeSchema).as("w"))
    val html = col("w").getField("Envelope").getField("Payload-Metadata")
      .getField("HTTP-Response-Metadata").getField("HTML-Metadata")
    env.select(col("src_url"), col("ts"),
        html.getField("Head").getField("Title").as("title"),
        explode_outer(html.getField("Links")).as("l"))
      .select(col("src_url"), col("ts"), col("title"),
        col("l").getField("path").as("link_path"),
        col("l").getField("url").as("link_url"))
  }

  /** A WAT `metadata` record payload (the Envelope JSON) for a capture
    * of `url` with `links` (path, url) structs and a `title` — the
    * writer side of the interchange, so fixtures round-trip the exact
    * published nesting. Compose with [[Warc.write]]
    * (record_type `metadata`, content_type `application/json`). */
  def envelopeJson(url: Column, links: Column, title: Column): Column =
    to_json(struct(
      struct(
        struct(url.as("WARC-Target-URI")).as("WARC-Header-Metadata"),
        struct(
          struct(
            struct(
              links.as("Links"),
              struct(title.as("Title")).as("Head")
            ).as("HTML-Metadata")
          ).as("HTTP-Response-Metadata")
        ).as("Payload-Metadata")
      ).as("Envelope")))

  /** GENERATE the WAT sidecar from the HTML `response` captures of the
    * crawl at `warcPath` — the producer side of [[readLinks]], so a
    * crawl written here ships the same sidecar pair CommonCrawl does
    * (round 19 added [[Wet]] for the text sidecar; this completes the
    * trio). Per capture: outgoing links harvested with the same
    * codegen'd href scan the curation pipeline uses
    * ([[graft.operators.WebCurate.extractLinks]], emitted under the
    * WAT `A@/href` path), the `<title>` (first, dotall; absent →
    * null), packed into the published envelope nesting and written as
    * `metadata` records. Scan → narrow regex project → write: zero
    * wide edges at any crawl size. */
  def write(spark: SparkSession, warcPath: String, watDir: String,
            numShards: Int, maxSplitBytes: Long = 128L << 20): Unit = {
    val html = decode(col("payload"), "UTF-8")
    val links = transform(
      graft.operators.WebCurate.extractLinks(html),
      u => struct(lit("A@/href").as("path"), u.as("url")))
    val title = nullif(
      trim(regexp_extract(html, "(?is)<title[^>]*>(.*?)</title>", 1)), lit(""))
    val recs = Warc.read(spark, warcPath, maxSplitBytes)
      .filter(col("record_type") === "response" &&
        col("content_type").rlike(Wet.extractableType))
      .select(col("url"), col("ts"),
        lit("metadata").as("record_type"),
        lit("application/json").as("content_type"),
        encode(envelopeJson(col("url"), links, title), "UTF-8").as("payload"))
    Warc.write(recs, watDir, numShards)
  }
}
