package graft.api

import graft.core.GraftSession
import graft.llm.{HttpLlmClient, StubLlmClient}

/** Runnable service entry: `runMain graft.api.ServeMain <port> <outDir>
  * [stub]`. With `stub`, completions come from the deterministic local
  * stub (echoes prompt length) — the test seam the reference exposes via
  * its configurable base_url (test.py:18). Without it, wiring comes from
  * OPENAI_* env vars like the reference (test.py:17-22). */
object ServeMain {
  def main(args: Array[String]): Unit = {
    val port = args.headOption.map(_.toInt).getOrElse(5005) // test.py:285
    val outDir = if (args.length > 1) args(1) else "/tmp/graft-out"
    val useStub = args.contains("stub")
    val spark = GraftSession.get("graft-serve")
    val factory = if (useStub) () => new StubLlmClient(p => s"len:${p.length}")
                  else () => new HttpLlmClient(
                    sys.env.getOrElse("OPENAI_BASE_URL", "https://api.openai.com/v1"),
                    sys.env.getOrElse("OPENAI_API_KEY", ""))
    val server = new ProcessCsvServer(spark, port, outDir, factory,
      webhookUrlTemplate = sys.env.get(ProcessCsvServer.WebhookTemplateEnv))
    server.start()
    println(s"[graft] serving POST /process_csv on :$port -> $outDir")
    Thread.currentThread().join()
  }
}
