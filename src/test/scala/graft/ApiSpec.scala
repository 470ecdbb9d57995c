package graft

import com.sun.net.httpserver.HttpServer
import graft.api.ProcessCsvServer
import graft.llm.StubLlmClient
import org.json4s._
import org.json4s.jackson.JsonMethods

import java.net.InetSocketAddress
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

/** End-to-end contract tests for the reference-parity HTTP surface
  * (test.py:140-282): the ten-param POST, the exact response payload
  * (`"Processing completed"`, test.py:261), the staged 500 messages, the
  * KeyError-shaped 400 (test.py:161), and the completion webhook derived
  * from `version_id` (test.py:263) observed on a real local listener. */
class ApiSpec extends SparkSpec {

  private implicit val fmt: Formats = DefaultFormats
  private val http = HttpClient.newHttpClient()

  private def post(port: Int, body: String): HttpResponse[String] =
    http.send(
      HttpRequest.newBuilder()
        .uri(java.net.URI.create(s"http://localhost:$port/process_csv"))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(body))
        .build(),
      HttpResponse.BodyHandlers.ofString())

  private def requestJson(csvPath: String, overrides: Map[String, String] = Map.empty,
                          drop: Set[String] = Set.empty): String = {
    val base = Map(
      "s3_file_url" -> s""""$csvPath"""",
      "column_index" -> "0",
      "max_rows" -> "100",
      "system_prompt" -> "\"Classify\"",
      "model" -> "\"m\"",
      "temperature" -> "0.1",
      "tokens" -> "64",
      "file_name" -> "\"api_e2e_out\"",
      "request_id" -> "\"req-e2e-1\"",
      "version_id" -> "\"v77test\"")
    (base ++ overrides).filterNot { case (k, _) => drop(k) }
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
  }

  private def withServer(webhookTemplate: Option[String])(f: Int => Unit): Unit = {
    val outDir = Files.createTempDirectory("graft_api_out").toString
    val server = new ProcessCsvServer(spark, 0, outDir,
      () => new StubLlmClient(p => s"R${p.length}"), webhookTemplate)
    server.start()
    try f(server.boundPort) finally server.stop()
  }

  private def writeCsv(): String = {
    val f = Files.createTempFile("graft_api_in", ".csv")
    Files.writeString(f, "name,score\nalpha,1\nbeta,2\ngamma,3\n")
    f.toString
  }

  test("e2e: 200 payload parity + webhook hit at the version_id-substituted URL") {
    // local webhook listener standing in for the reference's workflow URL
    val received = new java.util.concurrent.LinkedBlockingQueue[(String, String)]()
    val hook = HttpServer.create(new InetSocketAddress(0), 0)
    hook.createContext("/", ex => {
      val b = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      received.put((ex.getRequestURI.getPath, b))
      val ok = "ok".getBytes(UTF_8)
      ex.sendResponseHeaders(200, ok.length); ex.getResponseBody.write(ok); ex.close()
    })
    hook.start()
    try {
      val tmpl = s"http://localhost:${hook.getAddress.getPort}/version-{version_id}/wf/data-enrichment"
      withServer(Some(tmpl)) { port =>
        val resp = post(port, requestJson(writeCsv()))
        assert(resp.statusCode() == 200, s"body: ${resp.body()}")
        val j = JsonMethods.parse(resp.body())
        assert((j \ "message").extract[String] == "Processing completed") // test.py:261 exact string
        assert((j \ "error_count").extract[Long] == 0L)
        assert((j \ "request_id").extract[String] == "req-e2e-1")
        assert((j \ "file_url").extract[String].nonEmpty)

        val (path, body) = received.poll(10, java.util.concurrent.TimeUnit.SECONDS)
        assert(path == "/version-v77test/wf/data-enrichment",
          s"webhook URL not derived from version_id: $path")
        assert(body == resp.body(), "webhook payload must be the response JSON (test.py:270)")
      }
    } finally hook.stop(0)
  }

  test("AWS env vars wire into S3A config and pick the default bucket") {
    import graft.api.ProcessCsvServer
    val hc = spark.sparkContext.hadoopConfiguration
    try {
      val bucket = ProcessCsvServer.applyAwsEnv(spark, Map(
        "AWS_ACCESS_KEY" -> "AKTEST", "AWS_SECRET_KEY" -> "sekrit",
        "AWS_REGION" -> "eu-west-1", "AWS_S3_BUCKET" -> "graft-out"))
      assert(hc.get("fs.s3a.access.key") == "AKTEST")
      assert(hc.get("fs.s3a.secret.key") == "sekrit")
      assert(hc.get("fs.s3a.endpoint.region") == "eu-west-1")
      assert(bucket.contains("graft-out"))
      // bucket overrides the local default, mirroring the reference's
      // bucket-root upload; no bucket -> caller's directory
      assert(ProcessCsvServer.resolveOutDir("/tmp/out", bucket) == "s3a://graft-out")
      assert(ProcessCsvServer.resolveOutDir("/tmp/out", None) == "/tmp/out")
      // unset names must not clobber existing config (IAM-role path)
      ProcessCsvServer.applyAwsEnv(spark, Map.empty)
      assert(hc.get("fs.s3a.access.key") == "AKTEST")
    } finally {
      Seq("fs.s3a.access.key", "fs.s3a.secret.key", "fs.s3a.endpoint.region")
        .foreach(hc.unset)
    }
  }

  test("400 names the first missing parameter, KeyError-style") {
    withServer(None) { port =>
      val resp = post(port, requestJson(writeCsv(), drop = Set("model")))
      assert(resp.statusCode() == 400)
      assert((JsonMethods.parse(resp.body()) \ "error").extract[String] == "Missing parameter: 'model'")
    }
  }

  test("present-but-malformed param is a 500 (reference ValueError path), not a lying 400") {
    withServer(None) { port =>
      val resp = post(port, requestJson(writeCsv(), overrides = Map("column_index" -> "\"abc\"")))
      assert(resp.statusCode() == 500, s"body: ${resp.body()}")
      assert((JsonMethods.parse(resp.body()) \ "error").extract[String] == "invalid parameter value")
    }
  }

  test("500 stages: unreadable CSV vs batch-processing failure") {
    withServer(None) { port =>
      val bad = post(port, requestJson("/nonexistent/graft/in.csv"))
      assert(bad.statusCode() == 500)
      assert((JsonMethods.parse(bad.body()) \ "error").extract[String]
        .startsWith("Error reading CSV file:"), s"got: ${bad.body()}")

      // column_index out of range blows up inside the enrich stage
      val boom = post(port, requestJson(writeCsv(), overrides = Map("column_index" -> "99")))
      assert(boom.statusCode() == 500)
      assert((JsonMethods.parse(boom.body()) \ "error").extract[String]
        .startsWith("Error during batch processing:"), s"got: ${boom.body()}")
    }
  }

  test("e2e: .xlsx input stages to CSV and enriches like any CSV") {
    // a minimal real xlsx (SpreadsheetML zip) with name,score + 2 rows
    val sheet =
      """<?xml version="1.0"?><worksheet><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
        |<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>1</v></c></row>
        |<row r="3"><c r="A3" t="s"><v>3</v></c><c r="B3"><v>2</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    val sst = """<?xml version="1.0"?><sst><si><t>name</t></si><si><t>score</t></si>
      |<si><t>alpha</t></si><si><t>beta</t></si></sst>""".stripMargin
    val f = Files.createTempFile("graft_api_in", ".xlsx")
    val z = new java.util.zip.ZipOutputStream(Files.newOutputStream(f))
    try Seq("xl/worksheets/sheet1.xml" -> sheet, "xl/sharedStrings.xml" -> sst)
      .foreach { case (n, c) =>
        z.putNextEntry(new java.util.zip.ZipEntry(n)); z.write(c.getBytes(UTF_8)); z.closeEntry()
      }
    finally z.close()
    withServer(None) { port =>
      val resp = post(port, requestJson(f.toString))
      assert(resp.statusCode() == 200, s"body: ${resp.body()}")
      val j = JsonMethods.parse(resp.body())
      assert((j \ "message").extract[String] == "Processing completed")
      assert((j \ "error_count").extract[Long] == 0L)
      val outFile = (j \ "file_url").extract[String]
      val content = Files.readString(java.nio.file.Path.of(outFile))
      assert(content.contains("alpha") && content.contains("beta"),
        s"enriched output should carry the xlsx rows: $content")
    }
  }

  test("e2e: xlsx cell with embedded newline stays ONE row (multiLine staging read)") {
    // Xlsx.csvEscape quotes embedded newlines; the server's staged read
    // must use multiLine=true or this cell silently splits into two
    // malformed rows. 2 data rows in -> error_count 0 and both markers out.
    val sheet =
      """<?xml version="1.0"?><worksheet><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c></row>
        |<row r="2"><c r="A2" t="s"><v>1</v></c></row>
        |<row r="3"><c r="A3" t="s"><v>2</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    val sst = "<?xml version=\"1.0\"?><sst><si><t>name</t></si>" +
      "<si><t xml:space=\"preserve\">first&#10;second</t></si><si><t>plain</t></si></sst>"
    val f = Files.createTempFile("graft_api_nl", ".xlsx")
    val z = new java.util.zip.ZipOutputStream(Files.newOutputStream(f))
    try Seq("xl/worksheets/sheet1.xml" -> sheet, "xl/sharedStrings.xml" -> sst)
      .foreach { case (n, c) =>
        z.putNextEntry(new java.util.zip.ZipEntry(n)); z.write(c.getBytes(UTF_8)); z.closeEntry()
      }
    finally z.close()
    withServer(None) { port =>
      val resp = post(port, requestJson(f.toString, overrides = Map("column_index" -> "0")))
      assert(resp.statusCode() == 200, s"body: ${resp.body()}")
      val j = JsonMethods.parse(resp.body())
      assert((j \ "error_count").extract[Long] == 0L)
      val outFile = (j \ "file_url").extract[String]
      val content = Files.readString(java.nio.file.Path.of(outFile))
      // the newline cell survived intact (quoted), and only 2 data rows exist:
      // header + 2 logical rows; the embedded newline adds 1 physical line
      assert(content.contains("first\nsecond") || content.contains("first\r\nsecond"),
        s"newline cell should survive staging: $content")
      assert(content.contains("plain"))
    }
  }

  test("webhook failure is non-fatal: request still returns 200") {
    // template points at a port nothing listens on
    withServer(Some("http://localhost:1/version-{version_id}/dead")) { port =>
      val resp = post(port, requestJson(writeCsv()))
      assert(resp.statusCode() == 200, s"body: ${resp.body()}")
      assert((JsonMethods.parse(resp.body()) \ "message").extract[String] == "Processing completed")
    }
  }
}
