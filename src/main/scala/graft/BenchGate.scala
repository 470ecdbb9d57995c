package graft

import com.fasterxml.jackson.databind.ObjectMapper

/** Per-query bench regression gate against a recorded baseline
  * (`BENCH_BASELINE.json`).
  *
  * Why this exists: the external "within 2× of BASELINE" contract is
  * vacuous — the reference publishes no benchmark numbers, so its gate
  * reduces to "the bench ran without failures", and a 10× slowdown in
  * one query would ship as long as rc==0. The first materializing-bench
  * round produced the first honest per-query medians; this gate pins
  * them: any query whose fresh median exceeds BOTH `ratio ×` its
  * recorded median AND `absFloor` seconds above it trips an alarm, and
  * [[Bench]] exits nonzero. The AND is deliberate — sub-second queries
  * jitter well past 1.5× on a contended machine (median-of-3 softens
  * but doesn't eliminate that), so a pure ratio would cry wolf on noise
  * while the absolute floor alone would ignore a genuine 2× on a 10 s
  * query. A 1.5×+0.35 s trip is a real regression, not scheduler luck.
  *
  * Re-baselining is deliberate, never silent: when a measurement-form
  * or declared-workload change moves a median on purpose, re-record
  * BENCH_BASELINE.json from a fresh run and write the BENCH_NOTES entry
  * saying why (the r11 count-only → materializing reset is the model).
  * New queries absent from the baseline pass un-gated and are listed in
  * the output so the next re-baseline picks them up.
  *
  * Scope: the gate only fires when the baseline's recorded `sf` matches
  * the run's — comparing sf0.01 medians against an sf0.1 baseline would
  * alarm on pure data-volume difference.
  */
object BenchGate {

  final case class Baseline(sf: String, medians: Map[String, Double])

  final case class Alarm(query: String, base: Double, median: Double) {
    def ratio: Double = median / base
  }

  /** Parse BENCH_BASELINE.json: {"sf": "...", "medians": {name: sec}}.
    * Returns None on absent/unreadable file — a missing baseline means
    * "nothing recorded yet", which must not fail the bench itself. */
  def load(path: String): Option[Baseline] = {
    val f = new java.io.File(path)
    if (!f.isFile) return None
    try {
      val root = new ObjectMapper().readTree(f)
      val sf = root.path("sf").asText("")
      val m = root.path("medians")
      val b = Map.newBuilder[String, Double]
      val it = m.fieldNames()
      while (it.hasNext) { val k = it.next(); b += k -> m.get(k).asDouble() }
      Some(Baseline(sf, b.result()))
    } catch { case _: Exception => None }
  }

  /** Queries whose fresh median regressed past ratio AND absolute-delta
    * thresholds vs the recorded baseline. All-runs-failed queries
    * (median None) are the bench's own `failed` count's job, not this
    * gate's. */
  def alarms(medians: Map[String, Option[Double]], baseline: Map[String, Double],
             ratio: Double = 1.5, absFloor: Double = 0.35): Seq[Alarm] =
    medians.toSeq.sortBy(_._1).flatMap { case (q, mOpt) =>
      for {
        m <- mOpt
        base <- baseline.get(q)
        if m > base * ratio && m - base > absFloor
      } yield Alarm(q, base, m)
    }

  /** Queries present in this run but absent from the baseline — not
    * alarms (a new query has no prior), but surfaced so a re-baseline
    * picks them up instead of leaving them permanently un-gated. */
  def unbaselined(medians: Map[String, Option[Double]],
                  baseline: Map[String, Double]): Seq[String] =
    medians.keys.filterNot(baseline.contains).toSeq.sorted
}
