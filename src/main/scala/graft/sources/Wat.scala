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
}
