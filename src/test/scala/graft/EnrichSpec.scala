package graft

import graft.llm.{LlmRequest, Retry, StubLlmClient}
import graft.operators.Enrich
import org.apache.spark.sql.functions.col
import scala.collection.mutable.ArrayBuffer

class EnrichSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int) = (0 until n).map(i => (s"row$i", i)).toDF("val", "num")

  test("enrich preserves input order across multi-batch runs") {
    val cfg = Enrich.Config(systemPrompt = "P", batchSize = 7, rowConcurrency = 3)
    val out = Enrich.enrich(corpus(53), 0, cfg, () => new StubLlmClient(p => p.takeRight(6)))
      .select("val", "_row_idx", "Response").collect()
    assert(out.length == 53)
    out.zipWithIndex.foreach { case (r, i) =>
      assert(r.getString(0) == s"row$i", s"row order broken at $i")
      assert(r.getLong(1) == i, s"row index not contiguous at $i")
      assert(r.getString(2).endsWith(i.toString))
    }
  }

  test("maxRows: head enriched, tail passes through with empty Response") {
    val cfg = Enrich.Config(systemPrompt = "P", maxRows = 10, batchSize = 4)
    val out = Enrich.enrich(corpus(15), 0, cfg, () => new StubLlmClient(_ => "ok")).collect()
    assert(out.length == 15)
    out.take(10).foreach(r => assert(r.getAs[String]("Response") == "ok"))
    out.drop(10).foreach(r => assert(r.getAs[String]("Response") == ""))
  }

  test("failures produce sentinel; errorReport counts 1-based indexes") {
    val cfg = Enrich.Config(systemPrompt = "P", retries = 2, retryBaseDelayMs = 1L)
    val client = () => new StubLlmClient(_ => "fine", failOn = _.contains("row4"))
    val enriched = Enrich.enrich(corpus(8), 0, cfg, client)
    val (count, idx) = Enrich.errorReport(enriched)
    assert(count == 1)
    assert(idx == Seq(5L)) // row4 is the 5th row, 1-based (test.py:52 semantics)
    assert(enriched.filter(col("Response") === Enrich.ErrorSentinel).count() == 1)
  }

  test("null cells stringify as \"nan\" (pandas str(nan) parity)") {
    val df = Seq[(Option[String], Int)]((Some("a"), 1), (None, 2)).toDF("val", "num")
    val cfg = Enrich.Config(systemPrompt = "SYS")
    val out = Enrich.enrich(df, 0, cfg, () => new StubLlmClient(identity))
      .select("Response").as[String].collect()
    assert(out(0) == "SYS\n\nInput: a")
    assert(out(1) == "SYS\n\nInput: nan")
  }

  test("Retry: exponential backoff then success") {
    val delays = ArrayBuffer[Long]()
    var calls = 0
    val r = Retry.withBackoff(attempts = 7, baseDelayMs = 1000L, sleeper = delays += _) {
      calls += 1
      if (calls < 4) throw new RuntimeException("boom")
      "done"
    }
    assert(r == "done" && calls == 4)
    assert(delays.toSeq == Seq(1000L, 2000L, 4000L))
  }

  test("Retry: exhaustion rethrows after 7 attempts with doubling delays") {
    val delays = ArrayBuffer[Long]()
    var calls = 0
    intercept[RuntimeException] {
      Retry.withBackoff(attempts = 7, baseDelayMs = 1000L, sleeper = delays += _) {
        calls += 1; throw new RuntimeException("always")
      }
    }
    assert(calls == 7)
    assert(delays.toSeq == Seq(1000L, 2000L, 4000L, 8000L, 16000L, 32000L))
  }

  test("StubLlmClient is a pure function of the prompt") {
    val c = new StubLlmClient(p => s"<<$p>>")
    assert(c.complete(LlmRequest("x", "m", 1, 0.0)) == "<<x>>")
  }
}
