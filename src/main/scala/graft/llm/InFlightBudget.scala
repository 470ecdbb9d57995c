package graft.llm

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8

/** Cluster-global in-flight call budget — the reference's 200-call
  * ceiling (test.py:163-165, 10 batches x 20 workers) enforced GLOBALLY
  * under dynamic executor membership, replacing the static
  * budget/numExecutors division that under-uses capacity when executors
  * die and over-admits when they join.
  *
  * Shape: a driver-side [[BudgetCoordinator]] leases permit quotas to
  * executor-side [[BudgetClient]]s over one tiny TCP round-trip per
  * RENEWAL (never per call — calls hit only the local gate). Leases are
  * bounded-staleness: each client re-leases every `renewEveryMs`; a
  * client that stops renewing (dead executor) expires after
  * `leaseTtlMs` and its permits return to the pool.
  *
  * Invariant: the coordinator's ledger Σ granted ≤ total at every
  * step — a renewal REPLACES the caller's quota with
  * `min(fairShare, total - Σ others)`, which cannot push the sum over.
  * Convergence to fair shares takes one renewal cycle per member
  * change (a joiner may read 0 until incumbents shrink at their next
  * renewal). When a shrink lands on a client with calls already in
  * flight, the overshoot is bounded by those calls' remaining duration
  * — tighter than the reference's own envelope, which had no dynamic
  * membership at all. */
object InFlightBudget {

  final class BudgetCoordinator(totalPermits: Int, leaseTtlMs: Long = 15000L) {
    require(totalPermits > 0, "totalPermits must be positive")
    private val server = new ServerSocket()
    server.bind(new InetSocketAddress(0))
    @volatile private var running = true
    // clientId -> (granted quota, last renewal ms)
    private val leases = scala.collection.mutable.HashMap.empty[String, (Int, Long)]

    def port: Int = server.getLocalPort

    /** The lease protocol, exposed for deterministic spec stepping. */
    private[graft] def lease(clientId: String, nowMs: Long): Int = leases.synchronized {
      leases.filterInPlace { case (_, (_, at)) => nowMs - at <= leaseTtlMs }
      val othersSum = leases.collect { case (id, (q, _)) if id != clientId => q }.sum
      val n = (leases.keySet + clientId).size
      val fair = math.max(1, totalPermits / n)
      val granted = math.max(0, math.min(fair, totalPermits - othersSum))
      leases.update(clientId, (granted, nowMs))
      granted
    }

    private[graft] def grantedSum: Int = leases.synchronized(leases.valuesIterator.map(_._1).sum)

    private val acceptor = new Thread(() => {
      val pool = java.util.concurrent.Executors.newCachedThreadPool()
      try while (running) {
        val sock = try server.accept() catch { case _: Exception => null }
        if (sock != null) pool.execute(() => handle(sock))
      } finally pool.shutdown()
    }, "graft-budget-coordinator")
    acceptor.setDaemon(true)
    acceptor.start()

    private def handle(sock: Socket): Unit = {
      try {
        sock.setSoTimeout(5000)
        val in = new BufferedReader(new InputStreamReader(sock.getInputStream, UTF_8))
        val out = new PrintWriter(sock.getOutputStream, true, UTF_8)
        val line = in.readLine()
        if (line != null && line.startsWith("LEASE ")) {
          val id = line.substring("LEASE ".length).trim
          out.println(lease(id, System.currentTimeMillis()))
        } else out.println("-1")
      } catch { case _: Exception => () }
      finally { try sock.close() catch { case _: Exception => () } }
    }

    def stop(): Unit = {
      running = false
      try server.close() catch { case _: Exception => () }
    }
  }

  /** Executor-side gate. `acquire()` blocks while local in-use >=
    * leased quota; renewals happen opportunistically on the acquire
    * path (every `renewEveryMs`, or immediately while starved at
    * quota 0), so there is no background thread to leak. Thread-safe;
    * many tasks in one JVM share one client. */
  final class BudgetClient(host: String, port: Int, clientId: String,
                           renewEveryMs: Long = 5000L) {
    private val lock = new Object
    private var capacity = 0
    private var inUse = 0
    private var lastAttempt = 0L // rate-limits renewal traffic
    private var lastSuccess = 0L // drives the fail-closed staleness cut
    private var renewing = false // one renewal in flight at a time

    /** Network I/O happens OUTSIDE the lock — a slow/dead coordinator
      * must never block [[release]] (in-flight completions). */
    private def renew(): Unit = {
      val now = System.currentTimeMillis()
      var quota = -1
      val sock = new Socket()
      try {
        sock.connect(new InetSocketAddress(host, port), 5000)
        sock.setSoTimeout(5000)
        val out = new PrintWriter(sock.getOutputStream, true, UTF_8)
        val in = new BufferedReader(new InputStreamReader(sock.getInputStream, UTF_8))
        out.println(s"LEASE $clientId")
        val resp = in.readLine()
        if (resp != null) quota = resp.trim.toInt
      } catch { case _: Exception => quota = -1 }
      finally { try sock.close() catch { case _: Exception => () } }
      lock.synchronized {
        if (quota >= 0) { capacity = quota; lastSuccess = now }
        // coordinator unreachable: keep the stale quota until TTL-scale
        // staleness, then fail closed to zero — never fail open
        else if (now - lastSuccess > 3 * renewEveryMs) capacity = 0
        renewing = false
        lock.notifyAll()
      }
    }

    def acquire(): Unit = {
      var waited = false
      while (true) {
        var doRenew = false
        lock.synchronized {
          val now = System.currentTimeMillis()
          if (!renewing &&
              (now - lastAttempt >= renewEveryMs || (capacity == 0 && !waited))) {
            renewing = true; lastAttempt = now; doRenew = true
          } else if (inUse < capacity) {
            inUse += 1; return
          } else {
            waited = true
            lock.wait(math.max(50L, renewEveryMs / 4))
          }
        }
        if (doRenew) {
          renew()
          // starved-at-zero renewals must pace on the wait path, not
          // hammer the coordinator in a tight loop
          waited = true
        }
      }
    }

    def release(): Unit = lock.synchronized { inUse -= 1; lock.notifyAll() }

    private[graft] def currentCapacity: Int = lock.synchronized(capacity)

    /** Step the protocol now — spec hook for deterministic convergence. */
    private[graft] def renewNow(): Unit = {
      lock.synchronized { renewing = true; lastAttempt = System.currentTimeMillis() }
      renew()
    }
  }

  // one client per (host, port, clientId) per JVM — tasks share it, so
  // renewals amortize across every concurrent call in the executor
  private val clients =
    new java.util.concurrent.ConcurrentHashMap[(String, Int, String), BudgetClient]()

  def clientFor(host: String, port: Int, clientId: String,
                renewEveryMs: Long = 5000L): BudgetClient =
    clients.computeIfAbsent((host, port, clientId),
      k => new BudgetClient(k._1, k._2, k._3, renewEveryMs))
}
