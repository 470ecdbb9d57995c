package graft.api

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.SparkSession
import org.json4s._
import org.json4s.jackson.JsonMethods

import java.net.InetSocketAddress
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

import graft.llm.{HttpLlmClient, LlmClient}
import graft.operators.Enrich
import graft.sources.OrderedCsv

/** Reference-parity HTTP surface: `POST /process_csv` with the exact ten
  * body params (test.py:148-159), 400 on missing keys (test.py:161),
  * completion webhook fired non-fatally (test.py:263-279), JSON response
  * `{message, file_url, error_count, request_id}` (test.py:261).
  *
  * Control plane only — the server submits a Spark pipeline per request;
  * all data-plane work (read, enrich, order, write) is the distributed
  * operators in [[graft.operators.Enrich]] / [[graft.sources.OrderedCsv]].
  * Built on the JDK's HttpServer: zero extra dependencies.
  */
class ProcessCsvServer(spark: SparkSession, port: Int, outDir: String,
                       clientFactory: () => LlmClient,
                       webhookUrlTemplate: Option[String] = None) {

  private val server = HttpServer.create(new InetSocketAddress(port), 0)

  /** Actual listening port (differs from `port` when constructed with 0). */
  def boundPort: Int = server.getAddress.getPort

  def start(): Unit = {
    // reference uploads with ACL='private' (test.py:248); the S3A
    // equivalent is the canned-ACL default, a no-op for local FS
    spark.sparkContext.hadoopConfiguration.set("fs.s3a.acl.default", "Private")
    server.createContext("/process_csv", new Handler)
    server.setExecutor(null)
    server.start()
  }

  def stop(): Unit = server.stop(0)

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.add("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def jstr(s: String): String = graft.llm.JsonUtil.quote(s)

  private class Handler extends HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      if (ex.getRequestMethod != "POST") { respond(ex, 405, """{"error":"POST only"}"""); return }
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      val json = try JsonMethods.parse(body) catch {
        case _: Throwable => respond(ex, 400, """{"error":"invalid JSON"}"""); return
      }
      implicit val fmt: Formats = DefaultFormats

      // the reference's ten params, same names (test.py:148-159); the 400
      // names the first missing key exactly like Python's KeyError str
      // (test.py:161: {"error": "Missing parameter: 's3_file_url'"})
      def str(k: String) = (json \ k).extractOpt[String]
      def num[T](k: String)(implicit m: Manifest[T]) = (json \ k).extractOpt[T]
      val required = Seq("s3_file_url", "column_index", "max_rows", "system_prompt",
        "model", "temperature", "tokens", "file_name", "request_id", "version_id")
      val missing = required.find(k => (json \ k) == JNothing)
      val parsed = for {
        csvUrl <- str("s3_file_url")
        columnIndex <- num[Int]("column_index")
        maxRows <- num[Int]("max_rows")
        systemPrompt <- str("system_prompt")
        model <- str("model")
        temperature <- num[Double]("temperature")
        tokens <- num[Int]("tokens")
        fileName <- str("file_name")
        requestId <- str("request_id")
        versionId <- str("version_id")
      } yield (csvUrl, columnIndex, maxRows, systemPrompt, model, temperature, tokens, fileName, requestId, versionId)

      parsed match {
        case None if missing.isDefined =>
          // test.py:161 — KeyError shape, naming the absent key
          respond(ex, 400, s"""{"error":${jstr(s"Missing parameter: '${missing.get}'")}}""")
        case None =>
          // all keys present but one failed to coerce: the reference's
          // int()/float() would raise ValueError past the KeyError
          // handler -> Flask 500; mirror that status with a JSON body
          respond(ex, 500, """{"error":"invalid parameter value"}""")
        case Some((csvUrl, columnIndex, maxRows, systemPrompt, model, temperature, tokens, fileName, requestId, versionId)) =>
          var logger: Thread = null
          // staged 500 messages, matching the reference's per-stage error
          // payloads (test.py:172 read, test.py:213 batch, test.py:254 upload)
          var stagePrefix = "Error reading CSV file"
          try {
            val fetched = graft.sources.UrlStaging.stage(csvUrl)
            // .xlsx inputs (decided on the URL path, not the staged temp
            // name) convert driver-side to CSV, then read identically —
            // positional column addressing carries over unchanged
            val fromXlsx = graft.sources.Xlsx.isXlsx(csvUrl)
            val staged =
              if (fromXlsx) graft.sources.Xlsx.stageToCsv(fetched)
              else fetched
            // Xlsx.csvEscape quotes embedded newlines; without multiLine the
            // CSV reader would split such a cell into extra malformed rows.
            // Safe to enable: Xlsx.stageToCsv is the sole producer of this file.
            val df = spark.read.option("header", "true").option("inferSchema", "true")
              .option("multiLine", fromXlsx.toString).csv(staged)
            df.schema // force analysis so read errors surface under the read stage
            val cfg = Enrich.Config(systemPrompt = systemPrompt, model = model,
              maxTokens = tokens, temperature = temperature, maxRows = maxRows.toLong,
              requestId = requestId)
            // progress accumulator + periodic log, mirroring the
            // reference's every-100-rows counter (test.py:98-101)
            val progress = spark.sparkContext.longAccumulator(s"enrich-$requestId")
            logger = new Thread(() => {
              var last = -1L
              while (!Thread.currentThread().isInterrupted) {
                val v = progress.value
                if (v / 100 > last / 100) { println(s"[graft] $requestId processed $v rows"); last = v }
                try Thread.sleep(2000) catch { case _: InterruptedException => return }
              }
            }, s"graft-progress-$requestId")
            logger.setDaemon(true)
            logger.start()
            stagePrefix = "Error during batch processing" // test.py:213
            val enriched = Enrich.enrich(df, columnIndex, cfg, clientFactory, Some(progress))
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            // persist: the error count and the CSV write are two actions
            // over the same plan — without it each would re-run the LLM
            // calls. Count only: the response needs no index list, so the
            // collect job of the full errorReport would be wasted work.
            val errorCount = Enrich.errorCount(enriched)
            stagePrefix = "Error uploading to S3" // test.py:254
            // s3a:// outputs surface as the reference's public-style
            // https URL (test.py:249); local/hdfs paths pass through
            val fileUrl = OrderedCsv.publicUrl(OrderedCsv.write(enriched, outDir, fileName))
            enriched.unpersist()
            val respJson =
              s"""{"message":${jstr("Processing completed")},"file_url":${jstr(fileUrl)},""" +
                s""""error_count":$errorCount,"request_id":${jstr(requestId)}}"""
            // the reference ALWAYS fires the completion webhook, deriving
            // the URL from version_id (test.py:263); here the URL shape is
            // an env-configured template with a {version_id} placeholder
            // (vendor-neutral), fired non-fatally (test.py:278-279)
            webhookUrlTemplate.map(_.replace("{version_id}", versionId))
              .foreach(postWebhook(_, respJson))
            respond(ex, 200, respJson)
          } catch {
            case e: Throwable =>
              respond(ex, 500, s"""{"error":${jstr(s"$stagePrefix: ${String.valueOf(e.getMessage)}")}}""")
          } finally {
            // always stop the polling thread — a failed request must not
            // leak it (it would spin for the life of the server)
            if (logger != null) logger.interrupt()
          }
      }
    }
  }

  private def postWebhook(url: String, payload: String): Unit =
    try {
      val req = HttpRequest.newBuilder()
        .uri(java.net.URI.create(url))
        .timeout(Duration.ofSeconds(200)) // test.py:273
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(payload))
        .build()
      HttpClient.newHttpClient().send(req, HttpResponse.BodyHandlers.ofString())
      ()
    } catch { case e: Throwable => System.err.println(s"[webhook] failed (non-fatal): ${e.getMessage}") }
}

object ProcessCsvServer {
  /** Env name for the completion-webhook URL template. `{version_id}` is
    * replaced with the request's `version_id` — the vendor-neutral form
    * of the reference's hardcoded
    * `.../version-{version_id}/api/1.1/wf/data-enrichment/` (test.py:263).
    * Unset = no webhook. */
  val WebhookTemplateEnv = "GRAFT_WEBHOOK_URL_TEMPLATE"

  /** The reference's AWS env names (test.py:23,27-30), mapped onto the
    * S3A connector's Hadoop configuration. Returns the default bucket
    * (`AWS_S3_BUCKET`), if set. Unset names leave the existing Hadoop
    * config untouched, so IAM-role / instance-profile deployments (the
    * reference's commented-out default, test.py:26) keep working —
    * S3A's provider chain falls through to them. */
  def applyAwsEnv(spark: SparkSession, env: Map[String, String] = sys.env): Option[String] = {
    val hc = spark.sparkContext.hadoopConfiguration
    env.get("AWS_ACCESS_KEY").foreach(hc.set("fs.s3a.access.key", _))
    env.get("AWS_SECRET_KEY").foreach(hc.set("fs.s3a.secret.key", _))
    env.get("AWS_REGION").foreach(hc.set("fs.s3a.endpoint.region", _))
    env.get("AWS_S3_BUCKET")
  }

  /** Output location: the env bucket's root when set — the reference
    * writes `{file_name}_final.csv` directly under its bucket
    * (test.py:247-250) — else the caller's directory. */
  def resolveOutDir(outDir: String, bucket: Option[String]): String =
    bucket.map(b => s"s3a://$b").getOrElse(outDir)

  /** Production wiring from the reference's env names (test.py:17-30):
    * OpenAI client config, AWS credentials/region into S3A, default
    * bucket as the write destination, webhook template. */
  def fromEnv(spark: SparkSession, port: Int, outDir: String,
              env: Map[String, String] = sys.env): ProcessCsvServer = {
    val bucket = applyAwsEnv(spark, env)
    val baseUrl = env.getOrElse("OPENAI_BASE_URL", "https://api.openai.com/v1")
    val apiKey = env.getOrElse("OPENAI_API_KEY", "")
    new ProcessCsvServer(spark, port, resolveOutDir(outDir, bucket),
      () => new HttpLlmClient(baseUrl, apiKey),
      webhookUrlTemplate = env.get(WebhookTemplateEnv))
  }
}
