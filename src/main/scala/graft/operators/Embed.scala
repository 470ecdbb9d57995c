package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, StructField, StructType}
import org.apache.spark.util.LongAccumulator

import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}

import graft.llm.{EmbedClient, EmbedRequest, Retry}

/** Batched LLM embeddings generation ([EXT] — SURVEY §2.9's external-API
  * map applied to the pipeline's highest-volume real call): embed one
  * column of every row via `POST /v1/embeddings` with `textsPerCall`
  * texts per request, appending an `embedding: array<float>` column in
  * exact input order. This feeds every downstream `sim_*` / embedding-
  * dedup operator without a pre-made fixture.
  *
  * Spark formulation — deliberately the [[Enrich]] shape, because the
  * hard parts are identical and already proven there:
  *   - stable `_row_idx` (zipWithIndex, or sharded for the 100 TB path);
  *   - `repartitionByRange` into ~batchSize-row contiguous batches;
  *   - `mapPartitions` packs rows into chunks of `textsPerCall` and keeps
  *     `callConcurrency` CALLS (not rows) in flight via the sliding
  *     submission window — each call is 1 HTTP request carrying N texts;
  *   - per-call 7x1→64 s retry with 429/Retry-After honoring
  *     ([[Retry.withBackoff]]), the JVM-wide in-flight gate SHARED with
  *     [[Enrich]] (completions + embeddings live inside one 200-call
  *     budget, the reference's envelope), and the 3600 s batch deadline;
  *   - idempotency key per (request_id, chunk-of-row-idxs) so a Spark
  *     task retry presents the same key for the same texts;
  *   - per-partition sort on `_row_idx` restores input order with no
  *     global sort (whose sampling pass would re-run the paid calls).
  *
  * Failure isolation is per CALL: a call that exhausts retries leaves a
  * NULL embedding on exactly its `textsPerCall` rows — the array-typed
  * sibling of Enrich's string sentinel (there is no in-band "error
  * vector"; null is the only honest encoding). Count with [[errorCount]].
  */
object Embed {

  /** Envelope for the batched embeddings map. `textsPerCall` is the
    * public API's documented batching lever (N inputs per request);
    * `callConcurrency` bounds in-flight HTTP calls per partition, and
    * `globalMaxInFlightPerJvm` is the same JVM-wide ceiling Enrich
    * enforces — the two operators share one semaphore per cap value. */
  final case class Config(
      model: String = "text-embedding-3-small",
      textsPerCall: Int = 64,
      batchSize: Int = 1000,
      callConcurrency: Int = 8,
      retries: Int = 7,
      retryBaseDelayMs: Long = 1000L,
      requestId: String = "",
      globalMaxInFlightPerJvm: Int = 200,
      batchTimeoutMs: Long = 3600000L,
      budgetHostPort: Option[(String, Int)] = None,
      budgetClientId: String = "",
      budgetRenewMs: Long = 5000L)

  /** Embed `df.columns(columnIndex)` (positional addressing for parity
    * with the reference's API surface) through `client`, appending
    * `embedding: array<float>`. Returns ALL input columns + `_row_idx` +
    * `embedding`, in input order. `shardedIndex` swaps the contiguous
    * index for the no-extra-job sharded one (same order semantics — see
    * [[Enrich.withRowIndexSharded]]). */
  def embed(df: DataFrame, columnIndex: Int, cfg: Config,
            clientFactory: () => EmbedClient,
            progress: Option[LongAccumulator] = None,
            shardedIndex: Boolean = false,
            throttles: Option[LongAccumulator] = None): DataFrame = {
    require(columnIndex >= 0 && columnIndex < df.columns.length,
      s"columnIndex $columnIndex out of range for ${df.columns.length} columns")
    require(cfg.textsPerCall >= 1, "textsPerCall must be >= 1")
    // reserved-name guard: an existing 'embedding' column would silently
    // yield TWO same-named columns (nothing fails until a later
    // ambiguous-reference error far from the cause)
    Seq("embedding", "_row_idx").foreach(c => require(!df.columns.contains(c),
      s"input already has a '$c' column — the embed operator reserves it"))

    val indexed =
      if (shardedIndex) Enrich.withRowIndexSharded(df) else Enrich.withRowIndex(df)
    val embedded = runPaidEmbeds(indexed, columnIndex, cfg, clientFactory,
      progress, throttles)

    // Same argument as Enrich: batches are contiguous _row_idx ranges, so
    // a within-partition sort yields total order for partition-ordered
    // consumers without re-executing the paid calls.
    embedded.sortWithinPartitions(col("_row_idx"))
  }

  /** The paid-call core shared by [[embed]] and [[embedResumable]]:
    * range-batch an already-indexed frame and drive the sliding CALL
    * window over each batch partition. Input must carry `_row_idx` as
    * its LAST column; output appends `embedding`.
    *
    * `knownCount` / `fixedRange`: identical contract to
    * [[Enrich]]'s paid core — the resumable chunk loop passes both so a
    * chunk pays neither a count job nor a RangePartitioner sampling
    * pass; batches become arithmetic contiguous index ranges with rows
    * sorted in index order within each batch partition. */
  private def runPaidEmbeds(indexed: DataFrame, columnIndex: Int, cfg: Config,
                            clientFactory: () => EmbedClient,
                            progress: Option[LongAccumulator],
                            throttles: Option[LongAccumulator],
                            knownCount: Option[Long] = None,
                            fixedRange: Option[(Long, Long)] = None): DataFrame = {
    val n = knownCount.getOrElse(indexed.count())
    val numBatches = math.max(1, math.ceil(n.toDouble / cfg.batchSize).toInt)
    val batched = fixedRange match {
      case Some((lo, hi)) =>
        indexed.repartition(numBatches,
            Enrich.fixedBatchKey(lo, hi, numBatches, col("_row_idx")))
          .sortWithinPartitions(col("_row_idx"))
      case None => indexed.repartitionByRange(numBatches, col("_row_idx"))
    }

    val outSchema = StructType(batched.schema.fields :+
      StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = true))
    val colIdx = columnIndex
    val conf = cfg

    batched.mapPartitions { rows =>
      val client = clientFactory()
      implicit val ec: ExecutionContext = Enrich.ioPool
      val deadlineNs = System.nanoTime() + conf.batchTimeoutMs * 1000000L
      def remainingNs: Long = deadlineNs - System.nanoTime()

      // Chunks are built on the task thread (source iterators are not
      // thread-safe and assume the task thread's TaskContext); each chunk
      // becomes ONE in-flight call. The sliding window counts calls.
      val inFlight = new java.util.concurrent.atomic.AtomicInteger(0)
      val pending = scala.collection.mutable.Queue.empty[Future[Seq[Row]]]

      def submitChunk(): Unit = {
        val texts = new scala.collection.mutable.ArrayBuffer[String](conf.textsPerCall)
        val seqs = new scala.collection.mutable.ArrayBuffer[Seq[Any]](conf.textsPerCall)
        var minIdx = Long.MaxValue
        var idxHash = 1L
        while (texts.length < conf.textsPerCall && rows.hasNext) {
          val row = rows.next()
          val cell = row.get(colIdx)
          // pandas str(nan) == "nan" (test.py:86) — same coercion as Enrich
          texts += (if (cell == null) "nan" else cell.toString)
          seqs += row.toSeq
          val rowIdx = row.getLong(row.length - 1) // _row_idx is last
          minIdx = math.min(minIdx, rowIdx)
          idxHash = idxHash * 1000003L + rowIdx // order-sensitive content hash
        }
        if (texts.isEmpty) return
        // Stable for a re-executed task that re-forms the same chunk; a
        // differently-chunked retry gets a fresh key (fail-open: at worst
        // the provider sees a new key and charges the call — never drops).
        val idemKey =
          if (conf.requestId.isEmpty) ""
          else s"${conf.requestId}-$minIdx-${java.lang.Long.toHexString(idxHash)}"
        val in = texts.toVector
        val rowSeqs = seqs.toVector
        inFlight.incrementAndGet()
        pending.enqueue(Future {
          try {
            val g = Enrich.resolveGate(conf.budgetHostPort, conf.budgetClientId,
              conf.globalMaxInFlightPerJvm, conf.budgetRenewMs)
            val vectors: Seq[Array[Float]] =
              try {
                val out = Retry.withBackoff(conf.retries, conf.retryBaseDelayMs,
                  onThrottle = _ => throttles.foreach(a => a.synchronized(a.add(1)))) {
                  g.foreach(_.acquire())
                  try client.embed(EmbedRequest(in, conf.model, idemKey))
                  finally g.foreach(_.release())
                }
                // contract check OUTSIDE the retry: a deterministically
                // short/long response would otherwise re-send the same
                // paid request 7x (with ~127 s of backoff) before nulling
                require(out.size == in.size,
                  s"embed client returned ${out.size} vectors for ${in.size} inputs")
                out
              } catch {
                // per-call isolation: this chunk's rows get NULL vectors
                case e if scala.util.control.NonFatal(e) => null
              }
            progress.foreach(a => a.synchronized(a.add(in.size.toLong)))
            rowSeqs.zipWithIndex.map { case (seq, i) =>
              Row.fromSeq(seq :+ (if (vectors == null) null else vectors(i)))
            }
          } finally inFlight.decrementAndGet()
        })
      }

      def topUp(): Unit =
        while (inFlight.get() < math.max(1, conf.callConcurrency) && rows.hasNext)
          submitChunk()
      topUp()

      new Iterator[Row] {
        private var buf: Seq[Row] = Nil
        private def timeout() = throw new java.util.concurrent.TimeoutException(
          s"embed batch exceeded ${conf.batchTimeoutMs} ms " +
            "(per-batch deadline, the Enrich/reference envelope)")
        override def hasNext: Boolean =
          buf.nonEmpty || pending.nonEmpty || rows.hasNext
        override def next(): Row = {
          if (buf.isEmpty) {
            topUp()
            val f = pending.dequeue()
            var out: Option[Seq[Row]] = None
            while (out.isEmpty) {
              if (remainingNs <= 0L) timeout()
              val wait = math.min(remainingNs, 25L * 1000000L)
              try out = Some(Await.result(f, Duration.fromNanos(math.max(wait, 1L))))
              catch { case _: java.util.concurrent.TimeoutException => topUp() }
            }
            buf = out.get
            topUp()
          }
          val r = buf.head
          buf = buf.tail
          r
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Cross-run paid-call durability for EMBEDDINGS — the
    * [[Enrich.enrichResumable]] contract applied to the pipeline's
    * highest-volume paid call: every successfully embedded row persists
    * to a [[graft.sources.Merge]] table keyed (requestId, row_idx),
    * committed atomically per `chunkRows` chunk, so a rerun of a
    * killed/failed/finished embedding job pays ZERO for committed rows.
    * NULL embeddings (a call that exhausted retries) are retried on
    * rerun — only paid SUCCESSES are durable. A `config_hash` over the
    * model id invalidates the cache when the model changes (same texts
    * under a different model are DIFFERENT vectors; `textsPerCall` and
    * concurrency knobs deliberately do NOT hash — they change chunking,
    * never results).
    *
    * Same preconditions and shapes as the enrich sibling: byte-stable
    * input (`_row_idx` is row identity), one bounded anti-join folded
    * into one per-chunk-count aggregation (r21 — no per-chunk isEmpty
    * probes), one Merge version per paid chunk, output assembled
    * purely from parquet so the final order-restoring shuffle re-pays
    * nothing. */
  def embedResumable(df: DataFrame, columnIndex: Int, cfg: Config,
                     clientFactory: () => EmbedClient,
                     cacheRoot: String,
                     chunkRows: Long = 10000L,
                     cacheBuckets: Int = 16,
                     progress: Option[LongAccumulator] = None,
                     throttles: Option[LongAccumulator] = None): DataFrame = {
    require(cfg.requestId.nonEmpty,
      "embedResumable keys its durable cache on cfg.requestId — set one " +
        "(reruns resume the SAME requestId; a new requestId starts fresh)")
    require(chunkRows > 0, "chunkRows must be > 0")
    require(cacheBuckets > 0, "cacheBuckets must be > 0")
    require(columnIndex >= 0 && columnIndex < df.columns.length,
      s"columnIndex $columnIndex out of range for ${df.columns.length} columns")
    Seq("embedding", "_row_idx").foreach(c => require(!df.columns.contains(c),
      s"input already has a '$c' column — the embed operator reserves it"))
    val spark = df.sparkSession
    // columnIndex is part of the cache identity (advisor r15): without
    // it, reusing one requestId+cacheRoot to embed a DIFFERENT text
    // column would silently serve the previous column's vectors —
    // mirrors Enrich.resumeColumn's Seq(model, columnIndex) hash.
    val configHash = java.security.MessageDigest.getInstance("MD5")
      .digest(Seq(cfg.model, columnIndex.toString).mkString("\u0000")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

    // pinned snapshot — same consistency/cost argument as
    // Enrich.enrichResumable (the chunk loop's actions must all see ONE
    // input image); the count rides the indexing pass (r21)
    val (indexedRaw, n) = Enrich.withRowIndexCounted(df)
    val indexed = graft.core.Checkpoint.materialize(indexedRaw)

    def tableExists: Boolean = {
      val p = new org.apache.hadoop.fs.Path(cacheRoot, "manifest")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    }
    def cacheRows(): DataFrame = graft.sources.Merge.read(spark, cacheRoot)
      .filter(col("request_id") === cfg.requestId &&
        col("config_hash") === configHash)

    val done: DataFrame =
      if (tableExists) cacheRows().filter(col("embedding").isNotNull)
        .select(col("row_idx"))
      else indexed.select(col("_row_idx").as("row_idx")).limit(0)
    val todo = indexed.join(done, col("_row_idx") === col("row_idx"), "left_anti")

    // per-chunk DONE counts from the cache alone; TODO counts follow by
    // arithmetic over the contiguous [0, n) index domain — one bounded
    // job on resume, zero on a fresh table; same argument as
    // Enrich.resumeColumn (r21)
    val doneCounts: Map[Long, Long] =
      if (!tableExists) Map.empty
      else done.groupBy(expr(s"row_idx DIV ${chunkRows}L").as("_chunk"))
        .agg(count(lit(1)).as("_n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    var lo = 0L
    while (lo < n) {
      val hi = math.min(n, lo + chunkRows)
      val doneCnt = doneCounts.getOrElse(lo / chunkRows, 0L)
      val cnt = math.max(0L, (hi - lo) - doneCnt)
      if (cnt > 0L) {
        val base = if (doneCnt == 0L) indexed else todo
        val chunk = base.filter(col("_row_idx") >= lo && col("_row_idx") < hi)
        // exactly-once materialization before the multi-action sink —
        // same argument as enrichResumable
        val res = graft.core.Checkpoint.materialize(
          runPaidEmbeds(chunk, columnIndex, cfg, clientFactory,
              progress, throttles,
              knownCount = Some(cnt), fixedRange = Some((lo, hi)))
            .select(
              concat_ws("-", lit(cfg.requestId), col("_row_idx")).as("cache_id"),
              lit(cfg.requestId).as("request_id"),
              col("_row_idx").as("row_idx"),
              lit(configHash).as("config_hash"),
              col("embedding")))
        if (!tableExists)
          graft.sources.Merge.init(res, cacheRoot, "cache_id", cacheBuckets)
        else if (doneCnt == 0L)
          // chunk ids are exactly [lo, hi) — known-id commit skips the
          // touched-bucket collect job (r21)
          graft.sources.Merge.upsertKnownIds(spark, cacheRoot, res,
            res.select(col("cache_id")).limit(0),
            (lo until hi).map(i => s"${cfg.requestId}-$i"))
        else
          graft.sources.Merge.upsert(spark, cacheRoot, res,
            res.select(col("cache_id")).limit(0))
      }
      lo = hi
    }

    val responses =
      if (tableExists) cacheRows()
        .select(col("row_idx").as("_c_idx"), col("embedding").as("_c_emb"))
      else indexed.select(col("_row_idx").as("_c_idx"))
        .withColumn("_c_emb",
          lit(null).cast(ArrayType(FloatType, containsNull = false))).limit(0)
    // a head row missing from the cache (vacuumed mid-run) surfaces as
    // the operator's failure encoding — NULL embedding — via the left join
    val out = indexed.join(responses, col("_row_idx") === col("_c_idx"), "left")
      .withColumn("embedding", col("_c_emb"))
      .drop("_c_idx", "_c_emb")
    val numBatches = math.max(1, math.ceil(n.toDouble / cfg.batchSize).toInt)
    out.repartitionByRange(numBatches, col("_row_idx"))
      .sortWithinPartitions(col("_row_idx"))
  }

  /** Rows whose call failed after retries (NULL embedding). */
  def errorCount(embedded: DataFrame): Long =
    embedded.filter(col("embedding").isNull).count()
}
