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

/** HTTP 429 with the server's requested delay, when it sent one.
  * `retryAfterMs < 0` means "throttled, no Retry-After header" — the
  * retry loop then falls back to the reference's blind exponential
  * schedule (test.py:66-78), preserving exact parity for servers that
  * don't advertise. */
final class RateLimitedException(val retryAfterMs: Long)
    extends RuntimeException(
      s"LLM call failed: HTTP 429" +
        (if (retryAfterMs >= 0) s" (Retry-After ${retryAfterMs}ms)" else ""))

object RateLimitedException {
  /** Parse a Retry-After header value: RFC 9110 allows delta-seconds or
    * an HTTP-date. Unparseable/absent → -1 (blind-backoff fallback). */
  def parseRetryAfterMs(header: Option[String], nowEpochMs: Long): Long =
    header.map(_.trim).filter(_.nonEmpty) match {
      case None => -1L
      case Some(v) =>
        try math.max(0L, v.toLong * 1000L)
        catch {
          case _: NumberFormatException =>
            try {
              val at = java.time.ZonedDateTime
                .parse(v, java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME)
              math.max(0L, at.toInstant.toEpochMilli - nowEpochMs)
            } catch { case _: Exception => -1L }
        }
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
    if (resp.statusCode() == 429) {
      val ra = resp.headers().firstValue("Retry-After")
      throw new RateLimitedException(RateLimitedException.parseRetryAfterMs(
        if (ra.isPresent) Some(ra.get) else None, System.currentTimeMillis()))
    }
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
  * policy at test.py:66-78. Sleep is capped for tests via `sleeper`.
  *
  * Rate-limit aware: when the failure is a [[RateLimitedException]]
  * carrying a server-stated Retry-After, sleep THAT long (clamped to
  * `maxRetryAfterMs` — a hostile or miscalibrated server must not pin a
  * task thread for an hour) instead of the blind exponential step, and
  * do NOT advance the exponential schedule — the server told us when
  * capacity returns; the doubling ladder stays reserved for failures we
  * know nothing about. A 429 WITHOUT the header takes the blind
  * schedule, byte-for-byte the reference behavior. Every honored
  * throttle is reported through `onThrottle(sleptMs)` so callers can
  * surface backpressure metrics (Enrich wires an accumulator). Attempts
  * are consumed either way — a throttle storm still terminates. */
object Retry {
  def withBackoff[T](attempts: Int = 7, baseDelayMs: Long = 1000L,
                     sleeper: Long => Unit = Thread.sleep,
                     onThrottle: Long => Unit = _ => (),
                     maxRetryAfterMs: Long = 120000L)(f: => T): T = {
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
          if (i < attempts) e match {
            case rl: RateLimitedException if rl.retryAfterMs >= 0 =>
              val ms = math.min(rl.retryAfterMs, maxRetryAfterMs)
              onThrottle(ms)
              sleeper(ms)
            case _ =>
              sleeper(delay); delay *= 2
          }
      }
    }
    throw last
  }
}
