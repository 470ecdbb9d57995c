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

    /** The lease protocol, exposed for deterministic spec stepping.
      * Fair share uses CEILING division: floor would strand up to n-1
      * permits forever (200 permits / 150 clients = 1 each, 50 permits
      * never granted); with ceil the earliest renewers pick up the
      * remainder and `min(_, total - othersSum)` still caps Σ at total. */
    private[graft] def lease(clientId: String, nowMs: Long): Int = leases.synchronized {
      leases.filterInPlace { case (_, (_, at)) => nowMs - at <= leaseTtlMs }
      val othersSum = leases.collect { case (id, (q, _)) if id != clientId => q }.sum
      val n = (leases.keySet + clientId).size
      val fair = math.max(1L, (totalPermits.toLong + n - 1) / n).toInt
      val granted = math.max(0, math.min(fair, totalPermits - othersSum))
      leases.update(clientId, (granted, nowMs))
      granted
    }

    private[graft] def ttlMs: Long = leaseTtlMs

    private[graft] def grantedSum: Int = leases.synchronized(leases.valuesIterator.map(_._1).sum)

    private val acceptor = new Thread(() => {
      val pool = java.util.concurrent.Executors.newCachedThreadPool()
      try while (running) {
        val sock = try server.accept() catch { case _: Exception => null }
        if (sock != null) pool.execute(() => handle(sock))
        // a persistently failing accept (EMFILE under fd exhaustion)
        // must not busy-spin a driver core
        else if (running) Thread.sleep(50)
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
          // "quota ttlMs": the server's TTL is part of the protocol so
          // clients derive their fail-closed cut and renew cadence from
          // the AUTHORITATIVE value instead of a guess that may exceed it
          out.println(s"${lease(id, System.currentTimeMillis())} $leaseTtlMs")
        } else out.println("-1 0")
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
    * many tasks in one JVM share one client.
    *
    * Safety coupling: the fail-closed staleness cut derives from the
    * COORDINATOR's TTL (stated in every lease response), clamped to
    * 3/4 of it — the stale quota must die BEFORE the coordinator
    * expires the lease and re-grants those permits to someone else, or
    * the global ceiling is transiently violated. Renewal RPC timeouts
    * are likewise clamped to ttl/8 so a hanging connect can't carry a
    * stale quota past the cut. `acquire` gives up with a budget-naming
    * error after `starveTimeoutMs` of continuous zero capacity — a
    * dead coordinator should fail the job fast and accurately, not as
    * an hour-later batch timeout blamed on the LLM endpoint. */
  final class BudgetClient(host: String, port: Int, clientId: String,
                           renewEveryMs: Long = 5000L,
                           starveTimeoutMs: Long = 120000L) {
    private val lock = new Object
    private var capacity = 0
    private var inUse = 0
    private var lastAttempt = 0L // rate-limits renewal traffic
    private var lastSuccess = 0L // drives the fail-closed staleness cut
    private var renewing = false // one renewal in flight at a time
    private var serverTtlMs = 15000L // authoritative from the first lease

    private def staleCutMs: Long = math.min(3 * renewEveryMs, serverTtlMs * 3 / 4)
    private def rpcTimeoutMs: Int =
      math.min(2000L, math.max(250L, serverTtlMs / 8)).toInt

    /** Network I/O happens OUTSIDE the lock — a slow/dead coordinator
      * must never block [[release]] (in-flight completions). */
    private def renew(): Unit = {
      var quota = -1
      var ttl = -1L
      val sock = new Socket()
      try {
        val t = lock.synchronized(rpcTimeoutMs)
        sock.connect(new InetSocketAddress(host, port), t)
        sock.setSoTimeout(t)
        val out = new PrintWriter(sock.getOutputStream, true, UTF_8)
        val in = new BufferedReader(new InputStreamReader(sock.getInputStream, UTF_8))
        out.println(s"LEASE $clientId")
        val resp = in.readLine()
        if (resp != null) {
          val parts = resp.trim.split(" ")
          quota = parts(0).toInt
          if (parts.length > 1) ttl = parts(1).toLong
        }
      } catch { case _: Exception => quota = -1 }
      finally { try sock.close() catch { case _: Exception => () } }
      // staleness decisions use the POST-I/O clock: a timed-out connect
      // consumed real time that must count against the cut
      val now = System.currentTimeMillis()
      lock.synchronized {
        if (quota >= 0) {
          capacity = quota; lastSuccess = now
          if (ttl > 0) serverTtlMs = ttl
        }
        // coordinator unreachable: keep the stale quota only within the
        // cut, then fail closed to zero — never fail open
        else if (now - lastSuccess > staleCutMs) capacity = 0
        renewing = false
        lock.notifyAll()
      }
    }

    def acquire(): Unit = {
      var waited = false
      var starvedSince = -1L
      while (true) {
        var doRenew = false
        lock.synchronized {
          val now = System.currentTimeMillis()
          if (capacity > 0) starvedSince = -1L
          else if (starvedSince < 0) starvedSince = now
          else if (now - starvedSince > starveTimeoutMs)
            throw new IllegalStateException(
              s"in-flight budget starved for ${now - starvedSince} ms: " +
                s"coordinator $host:$port grants no capacity to '$clientId' " +
                "(dead coordinator, or more lessees than permits)")
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
  // renewals amortize across every concurrent call in the executor.
  // NOTE: the FIRST creator fixes the cadence for that key; later
  // callers with a different renewEveryMs share the existing lease (two
  // clients for one id would double-lease the same executor).
  private val clients =
    new java.util.concurrent.ConcurrentHashMap[(String, Int, String), BudgetClient]()

  def clientFor(host: String, port: Int, clientId: String,
                renewEveryMs: Long = 5000L): BudgetClient =
    clients.computeIfAbsent((host, port, clientId),
      k => new BudgetClient(k._1, k._2, k._3, renewEveryMs))
}
