package graft

import graft.llm.InFlightBudget.{BudgetClient, BudgetCoordinator}

/** The driver-coordinated token bucket: ledger invariant, fair-share
  * convergence, lease expiry reclaim, and the hard global cap under
  * concurrent clients hammering the gate. */
class InFlightBudgetSpec extends SparkSpec {

  test("ledger never over-grants; shares converge across renewals") {
    val co = new BudgetCoordinator(10)
    try {
      val t0 = 1000000L
      assert(co.lease("a", t0) === 10, "sole client takes the whole budget")
      // joiner reads 0 until the incumbent shrinks at ITS next renewal
      assert(co.lease("b", t0 + 10) === 0)
      assert(co.grantedSum <= 10)
      assert(co.lease("a", t0 + 20) === 5, "incumbent shrinks to fair share")
      assert(co.lease("b", t0 + 30) === 5, "joiner now gets its half")
      assert(co.grantedSum === 10)
      // third member: ceil-shares converge within a cycle and use the
      // WHOLE pool (floor would strand 10 - 3*3 = 1 permit forever)
      co.lease("c", t0 + 40)
      Seq("a", "b", "c").foreach(id => co.lease(id, t0 + 100))
      assert(co.grantedSum <= 10)
      val settled = Seq("a", "b", "c").map(id => co.lease(id, t0 + 200))
      assert(settled.sum === 10, s"no stranded permits: $settled")
      assert(settled.forall(q => q >= 2 && q <= 4), s"near-fair shares: $settled")
    } finally co.stop()
  }

  test("a lease that stops renewing expires; capacity returns to the pool") {
    val co = new BudgetCoordinator(8, leaseTtlMs = 100)
    try {
      val t0 = 5000000L
      co.lease("dead", t0); co.lease("live", t0 + 10)
      co.lease("dead", t0 + 20); co.lease("live", t0 + 30) // both at 4
      assert(co.lease("live", t0 + 40) === 4)
      // "dead" last renewed at t0+20; past TTL it vanishes
      assert(co.lease("live", t0 + 200) === 8, "expired lease must be reclaimed")
    } finally co.stop()
  }

  test("hard global cap under two concurrent clients (two executors in one JVM)") {
    val total = 6
    val co = new BudgetCoordinator(total)
    try {
      val c1 = new BudgetClient("localhost", co.port, "exec-1", renewEveryMs = 40)
      val c2 = new BudgetClient("localhost", co.port, "exec-2", renewEveryMs = 40)
      val inFlight = new java.util.concurrent.atomic.AtomicInteger(0)
      val maxSeen = new java.util.concurrent.atomic.AtomicInteger(0)
      val done = new java.util.concurrent.atomic.AtomicInteger(0)
      val work = 120
      val threads = (0 until 12).map { i =>
        val client = if (i % 2 == 0) c1 else c2
        new Thread(() => {
          (0 until work / 12).foreach { _ =>
            client.acquire()
            try {
              val cur = inFlight.incrementAndGet()
              maxSeen.updateAndGet(m => math.max(m, cur))
              Thread.sleep(3)
              inFlight.decrementAndGet()
            } finally client.release()
            done.incrementAndGet()
          }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join(30000))
      assert(done.get() === work, "all work must complete (no deadlock/starvation)")
      assert(maxSeen.get() <= total,
        s"global in-flight ${maxSeen.get()} exceeded the $total budget")
      assert(maxSeen.get() >= total / 2,
        s"the bucket must actually be used (saw ${maxSeen.get()})")
    } finally co.stop()
  }

  test("stale quota dies BEFORE the coordinator's TTL re-grants the permits") {
    // ttl 200 ms but a 5 s client renew cadence: the fail-closed cut
    // must clamp to the SERVER's ttl (3/4 of it), or for ~15 s both the
    // stale quota and its re-granted permits would admit calls
    val co = new BudgetCoordinator(4, leaseTtlMs = 200)
    val c = new BudgetClient("localhost", co.port, "slowpoke", renewEveryMs = 5000)
    c.acquire(); c.release() // leases 4 and learns ttl=200 from the response
    assert(c.currentCapacity === 4)
    co.stop()
    Thread.sleep(200) // past 3/4 * ttl = 150 ms
    c.renewNow() // fails; post-I/O clock is beyond the clamped cut
    assert(c.currentCapacity === 0,
      "capacity must fail closed within the coordinator's TTL, not the renew cadence")
  }

  test("coordinator death fails CLOSED after staleness, never open") {
    val co = new BudgetCoordinator(4)
    val c = new BudgetClient("localhost", co.port, "solo", renewEveryMs = 30)
    c.acquire(); c.release() // leased 4
    co.stop()
    Thread.sleep(150)
    // after 3x renewEveryMs of unreachability the capacity drops to 0:
    // acquire must BLOCK (fail closed), not admit unbounded calls
    val admitted = new java.util.concurrent.atomic.AtomicBoolean(false)
    val t = new Thread(() => { c.renewNow(); c.renewNow(); c.acquire(); admitted.set(true) })
    t.setDaemon(true); t.start(); t.join(500)
    assert(!admitted.get(), "a long-unreachable coordinator must gate calls to zero")
  }
}
