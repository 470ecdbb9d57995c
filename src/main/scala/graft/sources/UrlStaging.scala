package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.time.Duration

/** The reference reads its input CSV from an arbitrary HTTP(S) URL
  * (`pd.read_csv(csv_url)`, test.py:170). Spark's file sources speak
  * Hadoop filesystems (file://, s3a://, hdfs://) but not plain https, so
  * an HTTP input is fetched once, driver-side, to a local staging file
  * and then read distributed from there — the same "driver downloads,
  * cluster reads" split the reference implicitly has (its whole read was
  * driver-side). S3 inputs should use s3a:// directly and never pass
  * through here; this is only the arbitrary-URL compatibility path, and
  * at 100 TB the answer is "put the data on an object store", not a
  * bigger staging disk. */
object UrlStaging {

  /** Returns a path `spark.read` can consume: http(s) URLs are staged to
    * a temp file (timeout per the reference's 200 s envelope); any other
    * scheme (file, s3a, hdfs, bare path) passes through untouched. */
  def stage(url: String, timeoutSec: Long = 200L): String = {
    val scheme = Option(URI.create(url).getScheme).getOrElse("")
    if (scheme != "http" && scheme != "https") return url
    val client = HttpClient.newBuilder()
      .connectTimeout(Duration.ofSeconds(timeoutSec))
      .followRedirects(HttpClient.Redirect.NORMAL)
      .build()
    val req = HttpRequest.newBuilder()
      .uri(URI.create(url))
      .timeout(Duration.ofSeconds(timeoutSec))
      .GET()
      .build()
    val tmp = Files.createTempFile("graft_staged_", ".csv")
    val resp = client.send(req, HttpResponse.BodyHandlers.ofInputStream())
    if (resp.statusCode() != 200) {
      Files.deleteIfExists(tmp)
      throw new RuntimeException(s"CSV fetch failed: HTTP ${resp.statusCode()} for $url")
    }
    try Files.copy(resp.body(), tmp, StandardCopyOption.REPLACE_EXISTING)
    finally resp.body().close()
    tmp.toUri.toString
  }
}
