package graft.llm

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** One batched embeddings call ([EXT] — the reference's only compute op
  * is the per-row chat completion, test.py:57-74; its highest-volume
  * sibling in a training-data pipeline is `POST /v1/embeddings` with N
  * inputs per request). The response is one vector per input, in input
  * order.
  *
  * `idempotencyKey` plays the same role as [[LlmRequest]]'s: stable per
  * (request_id, chunk) so a Spark task re-execution can be deduped by a
  * proxy/provider instead of double-spending the paid call. */
final case class EmbedRequest(inputs: Seq[String], model: String,
                              idempotencyKey: String = "")

/** Pluggable embeddings client. Same executor-side contract as
  * [[LlmClient]]: ship a factory, not a live client; `embed` throws on
  * failure (retry policy lives in [[Retry]], null-vector semantics in the
  * operator). MUST return exactly `inputs.size` vectors, aligned. */
trait EmbedClient {
  def embed(req: EmbedRequest): Seq[Array[Float]]
}

/** Deterministic local stub: each vector is a pure function of its text.
  * `failOn` faults whole calls (any input matching fails the call) —
  * failure isolation in the operator is per-call, mirroring how a real
  * batched endpoint fails. */
final class StubEmbedClient(f: String => Array[Float],
                            failOn: String => Boolean = _ => false)
    extends EmbedClient with Serializable {
  override def embed(req: EmbedRequest): Seq[Array[Float]] = {
    if (req.inputs.exists(failOn)) throw new RuntimeException("stub embed failure")
    req.inputs.map(f)
  }
}

/** Env-wired factory — the embeddings twin of ServeMain's completions
  * seam: the same `OPENAI_BASE_URL` / `OPENAI_API_KEY` variables the
  * reference reads (test.py:17-22) configure the batched embeddings
  * endpoint, so a deployment that enriches can embed with zero extra
  * wiring. Returns a factory (clients are built per-partition on
  * executors — sockets don't serialize). */
object EmbedClients {
  def fromEnv(env: Map[String, String] = sys.env): () => EmbedClient =
    () => new HttpEmbedClient(
      env.getOrElse("OPENAI_BASE_URL", "https://api.openai.com/v1"),
      env.getOrElse("OPENAI_API_KEY", ""))
}

/** Real HTTP client for the public embeddings API shape:
  * `{"model": m, "input": [texts...]}` → `{"data": [{"index": i,
  * "embedding": [floats...]}, ...]}`. Bearer auth, same 200 s per-call
  * timeout and 429/Retry-After contract as [[HttpLlmClient]]. */
final class HttpEmbedClient(baseUrl: String, apiKey: String, timeoutSec: Long = 200L)
    extends EmbedClient {

  @transient private lazy val http: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(timeoutSec)).build()

  override def embed(req: EmbedRequest): Seq[Array[Float]] = {
    val inputs = req.inputs.map(t => s""""${JsonUtil.escape(t)}"""").mkString("[", ",", "]")
    val body = s"""{"model":"${JsonUtil.escape(req.model)}","input":$inputs}"""
    val builder = HttpRequest.newBuilder()
      .uri(URI.create(s"$baseUrl/embeddings"))
      .timeout(Duration.ofSeconds(timeoutSec))
      .header("Content-Type", "application/json")
      .header("Authorization", s"Bearer $apiKey")
      .POST(HttpRequest.BodyPublishers.ofString(body))
    if (req.idempotencyKey.nonEmpty) builder.header("Idempotency-Key", req.idempotencyKey)
    val resp = http.send(builder.build(), HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() == 429) {
      val ra = resp.headers().firstValue("Retry-After")
      throw new RateLimitedException(RateLimitedException.parseRetryAfterMs(
        if (ra.isPresent) Some(ra.get) else None, System.currentTimeMillis()))
    }
    if (resp.statusCode() != 200)
      throw new RuntimeException(s"embeddings call failed: HTTP ${resp.statusCode()}")
    parseVectors(resp.body(), req.inputs.size)
  }

  /** `data[*].embedding` ordered by `data[*].index` — the API documents
    * index-tagged results, so sort rather than trust wire order. */
  private def parseVectors(json: String, expected: Int): Seq[Array[Float]] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val data = JsonMethods.parse(json) \ "data" match {
      case JArray(items) => items
      case other => throw new RuntimeException(s"unexpected embeddings response shape: $other")
    }
    val tagged = data.map { item =>
      val idx = item \ "index" match {
        case JInt(i) => i.toInt
        case other => throw new RuntimeException(s"bad embeddings index: $other")
      }
      val vec = item \ "embedding" match {
        case JArray(xs) => xs.map {
          case JDouble(d) => d.toFloat
          case JInt(i) => i.toFloat
          case JDecimal(d) => d.toFloat
          case other => throw new RuntimeException(s"bad embedding component: $other")
        }.toArray
        case other => throw new RuntimeException(s"bad embedding vector: $other")
      }
      idx -> vec
    }
    require(tagged.size == expected,
      s"embeddings response has ${tagged.size} vectors for $expected inputs")
    val sorted = tagged.sortBy(_._1)
    // indexes must be exactly 0..n-1: a duplicated/skipped index would
    // pass the count check yet misalign vectors onto wrong rows — the
    // one failure mode this parser exists to prevent
    require(sorted.map(_._1) == (0 until expected).toList,
      s"embeddings response indexes ${sorted.map(_._1)} are not 0..${expected - 1}")
    sorted.map(_._2)
  }
}
