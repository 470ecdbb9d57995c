package graft.llm

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** One chat-completion call (reference: test.py:57-74 builds
  * `{model, messages:[{role:"user",content:prompt}], max_tokens,
  * temperature}` against `{base_url}/chat/completions`).
  *
  * `idempotencyKey` (stable per (request_id, row_idx)) lets a proxy or
  * provider dedupe the retry a Spark task re-execution would otherwise
  * double-spend — the reference never re-runs a *succeeded* call, Spark
  * task retry might. Empty = not sent. */
final case class LlmRequest(prompt: String, model: String, maxTokens: Int, temperature: Double,
                            idempotencyKey: String = "")

/** Pluggable completion client. Implementations must be constructible on
  * executors (the enrich operator ships a factory, not a live client —
  * sockets don't serialize). `complete` throws on failure; retry policy
  * lives in [[Retry]], sentinel semantics in the operator. */
trait LlmClient {
  def complete(req: LlmRequest): String
}

/** Deterministic local stub for tests and oracle-checked pipelines: the
  * "completion" is a pure function of the prompt. Mirrors the reference's
  * test seam (test.py:18 — base_url is the only coupling). */
final class StubLlmClient(f: String => String, failOn: String => Boolean = _ => false)
    extends LlmClient with Serializable {
  override def complete(req: LlmRequest): String = {
    if (failOn(req.prompt)) throw new RuntimeException("stub failure")
    f(req.prompt)
  }
}

/** Real HTTP client: bearer auth, 200s per-call timeout (test.py:71),
  * JSON in/out. Built on java.net.http (JDK) — no extra dependency. */
final class HttpLlmClient(baseUrl: String, apiKey: String, timeoutSec: Long = 200L)
    extends LlmClient {

  @transient private lazy val http: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(timeoutSec)).build()

  private def jsonEscape(s: String): String = JsonUtil.escape(s)

  override def complete(req: LlmRequest): String = {
    val body =
      s"""{"model":"${jsonEscape(req.model)}","messages":[{"role":"user","content":"${jsonEscape(req.prompt)}"}],""" +
        s""""max_tokens":${req.maxTokens},"temperature":${req.temperature}}"""
    val builder = HttpRequest.newBuilder()
      .uri(URI.create(s"$baseUrl/chat/completions"))
      .timeout(Duration.ofSeconds(timeoutSec))
      .header("Content-Type", "application/json")
      .header("Authorization", s"Bearer $apiKey")
      .POST(HttpRequest.BodyPublishers.ofString(body))
    if (req.idempotencyKey.nonEmpty) builder.header("Idempotency-Key", req.idempotencyKey)
    val httpReq = builder.build()
    val resp = http.send(httpReq, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw new RuntimeException(s"LLM call failed: HTTP ${resp.statusCode()}")
    extractContent(resp.body())
  }

  /** Pull `choices[0].message.content` (test.py:74) using json4s, which
    * ships with Spark. */
  private def extractContent(json: String): String = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val parsed = JsonMethods.parse(json)
    (parsed \ "choices") (0) \ "message" \ "content" match {
      case JString(s) => s.trim
      case other => throw new RuntimeException(s"unexpected LLM response shape: $other")
    }
  }
}

/** Exponential-backoff retry: 7 attempts, 1s doubling to 64s — the exact
  * policy at test.py:66-78. Sleep is capped for tests via `sleeper`. */
object Retry {
  def withBackoff[T](attempts: Int = 7, baseDelayMs: Long = 1000L,
                     sleeper: Long => Unit = Thread.sleep)(f: => T): T = {
    var delay = baseDelayMs
    var last: Throwable = null
    var i = 0
    while (i < attempts) {
      try return f
      catch {
        // NonFatal only: an InterruptedException (task kill) or OOM must
        // propagate immediately, not burn up to 63s of backoff sleeps
        // and then masquerade as a row-level failure.
        case e if scala.util.control.NonFatal(e) =>
          last = e
          i += 1
          if (i < attempts) { sleeper(delay); delay *= 2 }
      }
    }
    throw last
  }
}
