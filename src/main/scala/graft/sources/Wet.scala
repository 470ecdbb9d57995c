package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** WET extraction sidecar — the THIRD published CommonCrawl format
  * (WARC captures, WAT metadata, WET extracted text): `conversion`
  * records whose payload is the markup-stripped plain text of an HTML
  * response, linked back to the source capture with WARC-Refers-To
  * headers. WET exists so 100 TB-scale text consumers (LM corpus
  * builders — the dominant reader of these files) never touch raw
  * HTML: the sidecar is ~1/5 the crawl and every downstream pass
  * (langid, quality gates, dedup) starts from it. Format knowledge is
  * public from the CommonCrawl WET spec; original code.
  *
  * Spark-first shape: the response scan rides the splittable [[Warc]]
  * reader, extraction is [[TextAnalysis.stripMarkup]] — a narrow
  * whole-stage-codegen regex chain, no UDF, no shuffle — and the sink
  * is [[Warc.write]]'s one-gzip-member-per-record layout, so the
  * sidecar re-reads in parallel exactly like the crawl it derives
  * from. End to end the job is scan → project → write: at 100 TB it
  * is embarrassingly parallel with zero wide edges. */
object Wet {

  /** Response content types WET extraction applies to: HTML/XHTML and
    * other `text/`-prefixed payloads (the CommonCrawl extractor's
    * scope — binary captures carry no extractable text, skipped). */
  private[graft] val extractableType =
    "^(text/.*|application/xhtml\\+xml)(;.*)?$"

  /** `conversion` records derived from the `response` records of
    * `captures` (a [[Warc.read]] frame): same url/ts, payload =
    * UTF-8 bytes of the markup-stripped text, and `refers_to_url`/
    * `refers_to_ts` linkage back to the source capture ([[Warc.write]]
    * renders those as the spec's WARC-Refers-To-Target-URI/-Date
    * headers — the same linkage surface the `revisit` family uses).
    * Non-extractable content types drop (no text to convert). */
  def conversionRecords(captures: DataFrame): DataFrame =
    captures
      .filter(col("record_type") === "response" &&
        col("content_type").rlike(extractableType))
      .select(
        col("url"), col("ts"),
        lit("conversion").as("record_type"),
        lit("text/plain").as("content_type"),
        encode(TextAnalysis.stripMarkup(decode(col("payload"), "UTF-8")),
          "UTF-8").as("payload"),
        col("url").as("refers_to_url"),
        col("ts").as("refers_to_ts"))

  /** Extract the WET sidecar for the crawl at `warcPath` into
    * `wetDir`: scan responses, strip markup, write `numShards`
    * `.warc.wet.gz`-layout shards. Read back with [[Warc.readWet]]
    * (text shape) or [[Warc.read]] (full records). */
  def write(spark: SparkSession, warcPath: String, wetDir: String,
            numShards: Int, maxSplitBytes: Long = 128L << 20): Unit =
    Warc.write(conversionRecords(Warc.read(spark, warcPath, maxSplitBytes)),
      wetDir, numShards)
}
