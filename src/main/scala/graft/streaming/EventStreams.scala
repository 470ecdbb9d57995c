package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import java.sql.Timestamp

/** Structured Streaming surface over the `events` schema
  * (event_id, user_id, event_type, ts, value, props — TESTDATA.md).
  *
  * Batch twins of these queries live in graft.queries.Ext (ev_tumbling /
  * ev_sliding / ev_session) and are DuckDB-oracle-checked; the streaming
  * versions here share the same aggregation expressions, so correctness
  * transfers — what this module adds is event-time semantics: watermarks
  * bound state (without one, windowed state grows forever on an unbounded
  * stream — a 100 TB-pipeline non-negotiable), late rows beyond the
  * watermark are dropped, and append-mode emission waits until a window
  * can no longer change.
  */
object EventStreams {

  /** Read a directory of parquet events as a stream (file source —
    * processes files as they land; schema must be supplied for streams). */
  def fileSource(spark: SparkSession, dir: String, schemaFrom: DataFrame): DataFrame =
    spark.readStream.schema(schemaFrom.schema).parquet(dir)

  /** Seasonal-residual anomaly scoring SHARED by the batch query
    * (`Ext.evAnomaly`, oracle-gated) and the streaming monitor: a
    * stateless projection + a broadcast join against the TRAINED
    * per-(type, dow, hour) profile table, flagging
    * `|value − μ| > 3σ`. `cells` is the batch-trained profile (types ×
    * 168 rows — the train-batch / serve-stream deployment every
    * monitoring stack uses); because the operator is stateless, the
    * SAME code serves a batch frame or an unbounded stream (stream-
    * static broadcast join, no watermark or state needed). One shared
    * definition — the stream can never drift from the gated batch
    * semantics. */
  def anomalyScore(events: DataFrame, cells: DataFrame): DataFrame = {
    val e = events.select(col("event_id"), col("event_type"), col("value"),
      (weekday(col("ts")) + 1).as("dow"), hour(col("ts")).as("hr"))
    val z = (col("value") - col("mu")) / col("sd")
    e.join(broadcast(cells), Seq("event_type", "dow", "hr"))
      .where(col("sd") > 1e-9 && abs(z) > 3.0)
      .select(col("event_id"), col("event_type"), col("dow"), col("hr"),
        col("value"), round(z + lit(1e-9), 4).as("z"))
  }

  /** Tumbling 1-hour counts/sums per event type. */
  def tumblingCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(col("w.start").as("win_start"), col("event_type"), col("n"), col("total_value"))

  /** Sliding 2-hour windows every hour. */
  def slidingCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(col("w.start").as("win_start"), col("event_type"), col("n"), col("total_value"))

  /** Built-in session windows (gap-based) per user. */
  def sessionCounts(events: DataFrame, gap: String = "8 hours",
                    watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("n_events"), col("total_value"))

  /** Streaming exact dedup on a key with watermark-bounded state: the
    * streaming twin of Dedup.exact — each key is emitted once; dedup
    * state for keys older than the watermark is dropped, so state stays
    * O(keys-per-watermark-window), not O(stream). */
  def streamingDedup(events: DataFrame, keyCols: Seq[String],
                     watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-stream interval join: each left event pairs with right
    * events for the same key whose timestamp lies in
    * `[left.ts - lookback, left.ts]` — the streaming twin of
    * [[graft.operators.RangeJoin]]'s point-in-interval shape (e.g.
    * "attribute each purchase to the clicks that preceded it by up to
    * N minutes").
    *
    * Both sides MUST carry a watermark plus the time-range condition:
    * that pair is what lets Spark expire join state — each side buffers
    * only rows inside `watermark + lookback`, so state is bounded by
    * rate x window, not by stream length (the unbounded-state trap of a
    * naive stream-stream equi-join). Inner join: rows emit as matches
    * arrive; no emission barrier needed.
    *
    * Column contract: both sides carry the join key as `keyCol`; all
    * OTHER column names (including `leftTs`/`rightTs`) must be distinct
    * across the two sides. The right key is equi-joined and dropped.
    *
    * BEHAVIOR CHANGE (round 7): this contract used to be enforced only
    * for the ts columns; it now covers EVERY non-key column, so a call
    * that previously joined two frames sharing an (unused) payload
    * column name now fails at plan time with the shared names listed.
    * Intentional — the old behavior emitted ambiguous duplicate columns
    * that only exploded downstream; callers should rename shared payload
    * columns (`withColumnRenamed`) before joining. */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                   leftTs: String, rightTs: String, lookback: String,
                   watermark: String = "2 hours"): DataFrame = {
    // enforce the FULL documented contract, not just the ts columns: a
    // shared payload name (both sides derived from the same events
    // schema is the typical case) would join fine and emit ambiguous
    // duplicate columns that only explode downstream
    val overlap = (left.columns.toSet - keyCol).intersect(right.columns.toSet - keyCol)
    require(overlap.isEmpty,
      s"non-key columns must be named distinctly across sides; shared: ${overlap.mkString(", ")}")
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withColumnRenamed(keyCol, "_rkey").withWatermark(rightTs, watermark)
    l.join(r, col(keyCol) === col("_rkey") &&
        col(rightTs) >= col(leftTs) - expr(s"INTERVAL $lookback") &&
        col(rightTs) <= col(leftTs))
      .drop("_rkey")
  }

  /** Streaming LLM enrichment: each micro-batch runs through the batch
    * enrich operator (same ordering, retry, sentinel, idempotency, and
    * in-flight-cap semantics), and the caller's sink receives the
    * enriched frame per batch — continuous enrichment as a composition
    * of the proven batch operator, which is exactly how Structured
    * Streaming wants side-effecting externals handled (foreachBatch). */
  def enrichStream(stream: DataFrame, columnIndex: Int,
                   cfg: graft.operators.Enrich.Config,
                   clientFactory: () => graft.llm.LlmClient)
                  (writeBatch: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatch(graft.operators.Enrich.enrich(batch, columnIndex, cfg, clientFactory), batchId)
      }
      .start()

  /** Streaming embeddings maintenance: each micro-batch of NEW documents
    * embeds through the batched `/v1/embeddings` map
    * ([[graft.operators.Embed.embed]]) — work ∝ batch, the standing
    * corpus is never re-embedded — and lands via `writeBatch` (append to
    * the embeddings corpus; optionally [[graft.operators.Ivf.assignNew]]
    * the fresh vectors into the serving assignment table, which is the
    * existing incremental-ANN path, and watch
    * [[graft.operators.Ivf.centroidDrift]] for the retrain alarm).
    * Batch and streaming share ONE implementation, so EmbedSpec and the
    * enrich_embed oracle validate these semantics; this wrapper adds
    * only micro-batch plumbing. The 200-call envelope applies unchanged
    * — the gate (JVM or cluster-leased) spans streaming and batch maps
    * alike. */
  def embedStream(stream: DataFrame, columnIndex: Int,
                  cfg: graft.operators.Embed.Config,
                  clientFactory: () => graft.llm.EmbedClient)
                 (writeBatch: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatch(graft.operators.Embed.embed(batch, columnIndex, cfg, clientFactory), batchId)
      }
      .start()

  /** Streaming near-dup gate: every micro-batch of documents is
    * deduplicated against a standing corpus via the incremental batch
    * operator ([[graft.operators.Dedup.dropNearDupAgainst]]) — the
    * continuous form of "dedup today's crawl against the index". Work
    * per batch is proportional to the BATCH (LSH band join against the
    * corpus band index), never corpus x corpus, so the stream keeps up
    * at any corpus size.
    *
    * Composition contract, same as [[enrichStream]]: foreachBatch runs
    * the proven batch operator, so the oracle-gated batch twin
    * (`dedup_drop_inc`) is what validates these semantics. The CALLER
    * owns corpus-index evolution — appending survivors to the corpus
    * (and its persisted band index) inside `writeBatch` if the gate
    * should also catch later re-crawls of just-admitted documents;
    * batch-INTERNAL duplicates are likewise the caller's
    * `minHashNearDupPairs` call when micro-batches are large enough to
    * self-duplicate. */
  def dropNearDupStream(stream: DataFrame, corpus: DataFrame,
                        idCol: String, textCol: String, threshold: Double)
                       (writeBatch: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatch(graft.operators.Dedup.dropNearDupAgainst(
          corpus, batch, idCol, textCol, threshold), batchId)
      }
      .start()

  /** The landing-directory contract, as one callable: stream files from
    * `landingDir` through `transform` into an exactly-once parquet sink.
    *
    * Durability semantics (what a production landing pipeline needs and
    * what EventStreamsSpec's restart cases pin):
    *   - Source progress (which files are consumed) and operator state
    *     (watermarks, dedup keys, session state) live in
    *     `checkpointDir` — a restart with the same (checkpointDir,
    *     outDir, transform) RESUMES: already-committed files are never
    *     reprocessed, stateful operators continue from their snapshot.
    *   - The parquet sink commits per micro-batch into `_spark_metadata`;
    *     readers going through `spark.read.parquet(outDir)` see ONLY
    *     committed batches — a crash mid-batch leaks no partial rows,
    *     and the retried batch lands exactly once.
    *   - `Trigger.AvailableNow` processes everything currently landed
    *     then stops on its own: the restartable catch-up shape (cron it)
    *     — pass `continuous = true` for a long-running tail instead.
    *
    * The transform must be append-mode-compatible (stateless narrow ops,
    * watermark + append aggregations, dropDuplicatesWithinWatermark...).
    * Changing the transform against an existing checkpoint is on the
    * caller: Spark rejects incompatible plan changes at restart. */
  def runLandingToParquet(spark: SparkSession, landingDir: String, schemaFrom: DataFrame,
                          transform: DataFrame => DataFrame,
                          outDir: String, checkpointDir: String,
                          continuous: Boolean = false): org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = transform(fileSource(spark, landingDir, schemaFrom)).writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
    (if (continuous) writer
     else writer.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())).start()
  }

  /** HISTORICAL BACKFILL through the SAME transform the live landing
    * pipeline runs — one code path, so a backfilled range and the live
    * tail cannot diverge semantically (the two-systems
    * lambda-architecture drift this kills). `Trigger.AvailableNow`
    * drains the bounded historical directory, then the query stops on
    * its own; blocks until done (done-or-throw semantics — a backfill
    * is a job, not a service).
    *
    * The append-mode caveat every event-time backfill must handle:
    * windows/sessions only EMIT once the watermark passes them, and a
    * drained bounded source never advances the watermark past its last
    * real event — without intervention the FINAL windows stay in state
    * and never flush. `flushSentinel` is the standard fix: caller-built
    * rows whose event time sits beyond the historical horizon +
    * watermark delay, carrying a reserved key (e.g. user_id = -1) so
    * the sentinel's own window is droppable downstream. The harness
    * lands them as one extra file in a harness-owned dir (under the
    * fresh checkpoint) and reads BOTH dirs through one glob source; the
    * file source processes oldest-modified first, so the sentinel
    * arrives last and flushes everything real. Stateless transforms
    * (quality gates, projections) need no sentinel.
    *
    * `maxFilesPerBatch` bounds each micro-batch (progress checkpoints
    * land every N files — a 100 TB backfill survives preemption without
    * redoing the range; it also guarantees the sentinel lands in a
    * LATER batch than the data it flushes). */
  def backfill(spark: SparkSession, historicalDir: String, schemaFrom: DataFrame,
               transform: DataFrame => DataFrame,
               outDir: String, checkpointDir: String,
               flushSentinel: Option[DataFrame] = None,
               maxFilesPerBatch: Option[Int] = None): Unit = {
    val srcPath = flushSentinel match {
      case None => historicalDir
      case Some(rows) =>
        val sdir = s"$checkpointDir/flush_sentinel"
        rows.coalesce(1).write.mode("overwrite").parquet(sdir)
        sentinelGlob(spark, historicalDir, sdir)
    }
    val reader = spark.readStream.schema(schemaFrom.schema)
    val src = maxFilesPerBatch.fold(reader)(n =>
      reader.option("maxFilesPerTrigger", n)).parquet(srcPath)
    val q = transform(src).writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** The one-source glob over the historical dir + the sentinel dir,
    * built from FULLY QUALIFIED Hadoop paths: both inputs qualify
    * against the session filesystem first, so scheme-qualified
    * (s3a://, hdfs://, file:) and relative inputs all yield a valid
    * absolute glob — the naive `"/{a,b}"` string splice silently
    * produced a cwd-relative glob (a Hadoop path starting with '{' is
    * relative) for anything but absolute local POSIX paths. The two
    * dirs must live on ONE filesystem because they feed one file
    * source; a cross-filesystem pair fails loud here instead of
    * globbing nothing. */
  private[graft] def sentinelGlob(spark: SparkSession, historicalDir: String,
                                      sentinelDir: String): String = {
    import org.apache.hadoop.fs.Path
    val hconf = spark.sessionState.newHadoopConf()
    val histQ = {
      val p = new Path(historicalDir)
      p.getFileSystem(hconf).makeQualified(p)
    }
    val sentQ = {
      val p = new Path(sentinelDir)
      p.getFileSystem(hconf).makeQualified(p)
    }
    val (hu, su) = (histQ.toUri, sentQ.toUri)
    require(hu.getScheme == su.getScheme &&
        Option(hu.getAuthority) == Option(su.getAuthority),
      s"backfill historical dir ($histQ) and checkpoint dir ($sentQ) must " +
        "live on the same filesystem — one glob file source reads both")
    val authority = Option(hu.getAuthority).getOrElse("")
    s"${hu.getScheme}://$authority/{${hu.getPath.stripPrefix("/")},${su.getPath.stripPrefix("/")}}"
  }

  /** Streaming corpus quality gate: the batch gate's fused narrow
    * projection + filter applied to each micro-batch. Stateless — no
    * watermark, no state store; works in append mode on any document
    * stream (e.g. `readStream.parquet` over a landing directory). The
    * batch and streaming paths share ONE implementation
    * ([[graft.operators.TextAnalysis.qualityGate]]), so the oracle-gated
    * batch query also validates this operator's semantics. */
  def qualityGateStream(docs: DataFrame): DataFrame =
    graft.operators.TextAnalysis.qualityGate(docs)

  /** Streaming COMPLIANCE admission gate — the code-corpus landing
    * twin of [[graft.queries.Ext.pipelineCodeCurate]]'s middle stages:
    * licence routing (SPDX tag > canonical headers, permissive by
    * default) and structural-PII screening (gazetteer names via the
    * Aho–Corasick automaton, addresses, Luhn-valid cards, mod97-valid
    * IBANs) applied per micro-batch. Stateless narrow ops sharing ONE
    * implementation with the oracle-gated batch operators
    * ([[graft.operators.TextAnalysis.detectLicense]] /
    * [[graft.operators.TextAnalysis.piiNerCounts]]) — the
    * [[qualityGateStream]] contract: the stream can never drift from
    * the gated batch semantics, and the same call works on a batch
    * frame (EventStreamsSpec asserts stream == batch on the same
    * rows). Admitted = licence family in `allowFamilies` AND zero
    * checksum-valid PII entities; the annotation columns survive so a
    * downstream sink can audit WHY rows were admitted. */
  def complianceGateStream(docs: DataFrame, textCol: String = "text",
                           allowFamilies: Seq[String] = Seq("permissive")): DataFrame = {
    require(allowFamilies.nonEmpty, "allowFamilies must be non-empty")
    val (id, fam, _) = graft.operators.TextAnalysis.detectLicense(col(textCol))
    val (n, a, c, i) = graft.operators.TextAnalysis.piiNerCounts(col(textCol))
    docs.withColumn("licence_id", id)
      .withColumn("licence_family", fam)
      .withColumn("n_pii", (n + a + c + i).cast("long"))
      .filter(col("licence_family").isin(allowFamilies: _*) && col("n_pii") === 0)
  }

  /** Streaming MODEL-based quality gate: score each micro-batch with a
    * trained — typically persisted-and-LOADED — hashed text classifier
    * and keep rows clearing `minScore`. Stateless narrow predicate (the
    * score is one codegen'd expression over the literal weight array),
    * so it drops into any landing stream. The model is a bounded driver
    * object riding the plan; batch jobs own its lifecycle
    * ([[graft.operators.Classifier.trainHashedText]] →
    * `saveHashed`/`loadHashed`) and refresh it at whatever cadence the
    * corpus drifts — the same batch-owns-the-model seam as the DSIR
    * admission gate. A stream RESTART reloads the artifact and gates
    * identically (EventStreamsSpec pins it). */
  def classifierGateStream(docs: DataFrame,
                           model: graft.operators.Classifier.HashedModel,
                           textCol: String = "text",
                           minScore: Double = 0.5): DataFrame =
    docs.filter(model.score(
      graft.operators.TextAnalysis.tokens(col(textCol))) >= minScore)

  /** Streaming DSIR admission gate: keep only documents whose hashed
    * -unigram importance score against a PRE-FITTED target-vs-pool
    * model ([[graft.operators.Dsir.fitLogRatioMap]], a 256-entry
    * driver map refreshed by batch jobs at whatever cadence the
    * corpus drifts) clears `minWeight`. Stateless narrow predicate —
    * [[graft.operators.Dsir.scoreExpr]] sums bucket log-ratios per
    * row with no explode/group/state — so it runs in append mode on
    * any document stream, the live counterpart of the smp_dsir batch
    * selection. Batch and streaming share the expression, so the
    * DsirSpec consistency case (per-row score == grouped weight up to
    * FP order) validates both. */
  def dsirAdmitStream(docs: DataFrame, lrMap: Map[String, Double],
                      minWeight: Double, textCol: String = "text"): DataFrame =
    docs.filter(graft.operators.Dsir.scoreExpr(col(textCol), lrMap) >= minWeight)

  /** Streaming URL/domain admission gate: blocklisted domains (and their
    * subdomains) never enter the corpus — the earliest, cheapest cut in
    * a live-crawl feed. Stateless narrow predicate
    * ([[graft.operators.WebCurate.isBlockedDomain]]'s suffix-chain
    * match), append mode, no watermark/state; batch and streaming share
    * ONE implementation, so the oracle-gated txt_domain_filter also
    * validates these semantics. (Per-domain CAPS are inherently
    * stateful-global — run [[graft.operators.WebCurate.capPerDomain]]
    * as a batch compaction over the landed corpus instead.) */
  def domainFilterStream(docs: DataFrame, urlCol: String,
                         blocklist: Seq[String]): DataFrame =
    graft.operators.WebCurate.filterByDomain(docs, urlCol, blocklist)

  /** Streaming crawl-frontier admission: canonicalize each arriving URL
    * ([[graft.operators.WebCurate.canonicalizeUrl]] — case/port/
    * fragment/tracking-param noise all collapse to one form) and admit
    * only the FIRST arrival of each canonical form within the
    * watermark. The frontier use: a live crawl re-discovers the same
    * page under utm-decorated and case-varied aliases continuously;
    * admission must key on the canonical identity, not the raw string.
    * The canonical url is the STATE key, so alias storms cost one state
    * entry; state expires with the watermark (bounded by rate x
    * horizon, the [[streamingDedup]] contract — a frontier that must
    * never re-admit across restarts layers the Merge corpus anti-join
    * on top, as [[dropNearDupStream]] does for text). `ts` column
    * required (event time). */
  def urlFrontierStream(docs: DataFrame, urlCol: String,
                        watermark: String = "2 hours",
                        canonCol: String = "canon_url"): DataFrame =
    docs.withColumn(canonCol,
        graft.operators.WebCurate.canonicalizeUrl(col(urlCol)))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(Seq(canonCol))

  /** Streaming maintenance of the persisted corpus-membership sketch
    * ([[graft.operators.Snapshot.saveCorpusSketch]]'s artifact): each
    * micro-batch's Theta sketch unions into the standing one — the
    * artifact stays KB-sized and current while the corpus lands, so
    * "how much of this batch is new" ([[graft.operators.Snapshot
    * .batchVsCorpusSketch]]) is answerable mid-stream at any moment.
    * Work per batch ∝ batch (one narrow aggregate + a few-KB
    * read/write); the landed corpus itself is never re-read. */
  def corpusSketchStream(docs: DataFrame, idCol: String,
                         sketchPath: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val fresh = batch.agg(theta_sketch_agg(col(idCol)).as("sketch"))
        // Bootstrap ONLY on a genuinely-absent artifact. A transient read
        // failure (permissions, corrupt footer, FS hiccup) must fail the
        // micro-batch — treating it as "absent" would silently overwrite
        // the standing corpus sketch with this batch alone and poison
        // every later batchVsCorpusSketch novelty answer.
        val exists = try {
          spark.read.parquet(sketchPath).count() > 0
        } catch {
          case _: java.io.FileNotFoundException => false
          case e: org.apache.spark.sql.AnalysisException
              if e.getCondition != null && e.getCondition.contains("PATH_NOT_FOUND") => false
        }
        val merged =
          if (exists) {
            val old = spark.read.parquet(sketchPath)
              .select(col("sketch").as("old_sk"))
            fresh.crossJoin(old)
              .select(theta_union(col("sketch"), col("old_sk")).as("sketch"))
          } else fresh
        // collect-then-write (one row of a few KB): the sink path is
        // also the source path, and overwriting a parquet dir that is
        // concurrently being read races — materialize first
        val row = merged.collect()(0).getAs[Array[Byte]](0)
        import spark.implicits._
        Seq(row).toDF("sketch")
          .repartition(1).write.mode("overwrite").parquet(sketchPath)
      }
      .start()

  /** Streaming maintenance of a persisted Misra–Gries heavy-hitters
    * summary ([[graft.functions.FreqSketch]]): each micro-batch's
    * k-counter summary merges into the standing artifact with the
    * PODS'12 rule — the MG bound survives ARBITRARY merge trees, so
    * batch-at-a-time maintenance inherits the one-pass guarantee:
    * estimates undercount by at most total_n/(k+1) and every item with
    * true count above that is present, across the whole stream's
    * history. The artifact is ≤ k (item, cnt) rows plus a running total;
    * the landed stream is never re-read — "what are the top domains so
    * far" is answerable mid-stream at any moment. Same bootstrap stance
    * as [[corpusSketchStream]]: only a genuinely-absent artifact
    * bootstraps; transient read failures fail the micro-batch. */
  def heavyHittersStream(docs: DataFrame, itemCol: String, k: Int,
                         path: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val fresh = batch.agg(
            graft.functions.FreqSketch.heavyHitters(col(itemCol), k).as("hh"),
            count(col(itemCol)).as("n"))
          .collect()(0)
        val freshCounts = fresh.getMap[String, Long](0).toMap
        val freshN = fresh.getLong(1)
        val old: Option[(Map[String, Long], Long)] = try {
          val rows = spark.read.parquet(path)
            .select(col("item"), col("cnt"), col("total_n")).collect()
          Some((rows.iterator.filter(_.getString(0) != null)
              .map(r => r.getString(0) -> r.getLong(1)).toMap,
            rows.headOption.map(_.getLong(2)).getOrElse(0L)))
        } catch {
          case _: java.io.FileNotFoundException => None
          case e: org.apache.spark.sql.AnalysisException
              if e.getCondition != null && e.getCondition.contains("PATH_NOT_FOUND") => None
        }
        val merged = old match {
          case Some((oldCounts, _)) =>
            graft.functions.FreqSketch.mergeCounts(oldCounts, freshCounts, k)
          case None => freshCounts
        }
        val totalN = old.map(_._2).getOrElse(0L) + freshN
        import spark.implicits._
        // total_n rides on every row (k is small). A null-item sentinel
        // carries total_n when the summary is EMPTY — possible mid-stream
        // (k fully-cancelling decrements), and losing the running total
        // would silently reset the error bound
        val rows =
          if (merged.isEmpty) Seq((null: String, 0L, totalN))
          else merged.toSeq.map { case (item, cnt) => (item, cnt, totalN) }
        rows.toDF("item", "cnt", "total_n")
          .repartition(1).write.mode("overwrite").parquet(path)
      }
      .start()

  // ---- custom state: sessionization via flatMapGroupsWithState ----------

  final case class Event(user_id: Long, ts: Timestamp, value: Double)
  final case class SessionState(start: Long, lastTs: Long, n: Int, total: Double)
  final case class SessionOut(user_id: Long, session_start: Timestamp,
                              n_events: Int, total_value: Double)

  /** Gap-based sessionizer with explicit state — the escape hatch for
    * session logic `session_window` can't express (per-session caps,
    * custom close conditions, enrichment at close). Emits a session when
    * the gap elapses (event-time timeout against the watermark). State per
    * live session only: O(active users), not O(events). */
  def sessionize(events: Dataset[Event], gapMs: Long,
                 watermark: String = "2 hours"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(userId, new Timestamp(s.start), s.n, s.total))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastTs < gapMs =>
                  cur = Some(s.copy(lastTs = t, n = s.n + 1, total = s.total + e.value))
                case Some(s) =>
                  closed ::= SessionOut(userId, new Timestamp(s.start), s.n, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastTs + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  // ---- streaming SFT assembly: conversation gap-close ------------------

  final case class Turn(conv_id: Long, turn_idx: Int, role: String,
                        content: String, ts: Timestamp)
  final case class ConvState(turns: Map[Int, (Long, String, String)], lastTs: Long)
  final case class ConvOut(conv_id: Long, rendered: String, n_turns: Int)

  /** Streaming twin of [[graft.operators.Sft.renderConversations]]:
    * turns arrive as events (possibly out of order, possibly replayed),
    * and a conversation is rendered and emitted once it has been QUIET
    * for `gapMs` of event time (the live-chat close condition — there is
    * no in-band "conversation done" marker, exactly like sessionization).
    *
    * Semantics pinned by the spec: turns render in `turn_idx` order
    * regardless of arrival order; when a turn_idx arrives more than once
    * (at-least-once transports dup, buggy producers rewrite), the copy
    * with the EARLIEST (ts, role, content) wins — a commutative rule, so
    * the result is independent of both arrival order and micro-batch
    * boundaries (within a batch the rows iterator is unordered; "first
    * arrival wins" would be nondeterministic); the render string is
    * produced by the template's [[graft.operators.Sft.ChatTemplate
    * .segmentStr]], the same constants the batch operator concatenates —
    * batch and stream output are asserted EQUAL on the same turns.
    *
    * State: O(live conversations × chat depth) — `maxTurns` caps a
    * runaway key by keeping the LOWEST `maxTurns` turn_idx values (a
    * deterministic set — replays and batch splits render identically;
    * a million-turn "conversation" is an attack, not data).
    * Event-time timeout against the watermark bounds state lifetime.
    *
    * Re-emission on stragglers (inherent to gap-close sessionization):
    * a turn arriving AFTER its conversation's gap already closed and
    * emitted — but still inside the watermark — re-opens state for that
    * conv_id and, at the next gap close, emits a SECOND ConvOut carrying
    * only the late turns (Append mode cannot retract the first row).
    * Downstream consumers must reconcile per conv_id — keep the earliest
    * or the longest render (`min_by(struct(render), n_turns DESC)` in
    * batch, or the [[graft.sources.Merge]] keep-best upsert) — exactly
    * the contract every watermark-bounded session stream carries. */
  def conversationAssemblyStream(turns: Dataset[Turn], gapMs: Long,
                                 watermark: String = "2 hours",
                                 template: graft.operators.Sft.ChatTemplate =
                                   graft.operators.Sft.ChatTemplate(),
                                 maxTurns: Int = 1024): Dataset[ConvOut] = {
    import turns.sparkSession.implicits._
    require(gapMs > 0 && maxTurns > 0, "gapMs and maxTurns must be positive")
    turns
      .withWatermark("ts", watermark)
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState[ConvState, ConvOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (convId: Long, rows: Iterator[Turn], state: GroupState[ConvState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            val ordered = s.turns.toSeq.sortBy(_._1)
            val rendered = ordered.map { case (_, (_, r, c)) =>
              template.segmentStr(r, c)
            }.mkString
            Iterator.single(ConvOut(convId, rendered, ordered.size))
          } else {
            val s0 = state.getOption.getOrElse(ConvState(Map.empty, 0L))
            var m = s0.turns
            var last = s0.lastTs
            rows.foreach { t =>
              val cand = (t.ts.getTime, t.role, t.content)
              m.get(t.turn_idx) match {
                // earliest (ts, role, content) wins — commutative, so
                // arrival order and batch boundaries cannot change it
                case Some(prev) =>
                  if (Ordering[(Long, String, String)].lt(cand, prev))
                    m += t.turn_idx -> cand
                case None if m.size < maxTurns =>
                  m += t.turn_idx -> cand
                case None =>
                  // capped: keep the LOWEST maxTurns turn_idx values —
                  // a deterministic set, so an over-cap conversation
                  // still renders identically across replays and batch
                  // splits ("whoever arrived first" would not)
                  val worst = m.keysIterator.max
                  if (t.turn_idx < worst) {
                    m -= worst
                    m += t.turn_idx -> cand
                  }
              }
              last = math.max(last, t.ts.getTime)
            }
            state.update(ConvState(m, last))
            state.setTimeoutTimestamp(last + gapMs)
            Iterator.empty
          }
      }
  }

  final case class ToolTurn(conv_id: Long, turn_idx: Int, role: String,
                            content: String, tool_name: Option[String],
                            tool_args: Option[String], ts: Timestamp)

  /** Streaming twin of the TOOL-TRACE render (round 16): turns carrying
    * a tool call rewrite their content through
    * [[graft.operators.Sft.toolCallTextStr]] — the same constants the
    * batch [[graft.operators.Sft.withToolCallText]] column form
    * concatenates — in a STATELESS pre-map, then the proven
    * [[conversationAssemblyStream]] gap-close machinery applies
    * unchanged (dedup rule, turn cap, re-emission contract all
    * inherited). Batch and stream renders are asserted EQUAL on the
    * same turns in EventStreamsSpec. */
  def toolTraceAssemblyStream(turns: Dataset[ToolTurn], gapMs: Long,
                              watermark: String = "2 hours",
                              template: graft.operators.Sft.ChatTemplate =
                                graft.operators.Sft.ChatTemplate(),
                              maxTurns: Int = 1024): Dataset[ConvOut] = {
    import turns.sparkSession.implicits._
    conversationAssemblyStream(
      turns.map { t =>
        val c = t.tool_name match {
          case Some(n) => graft.operators.Sft.toolCallTextStr(
            t.content, n, t.tool_args.getOrElse(""))
          case None => t.content
        }
        Turn(t.conv_id, t.turn_idx, t.role, c, t.ts)
      }, gapMs, watermark, template, maxTurns)
  }

  // ---- arbitrary state v2: transformWithState -------------------------

  final case class KeyedDoc(key: String, id: Long)

  /** Streaming per-key admission cap via `transformWithState` (Spark 4's
    * arbitrary-state API): admit the first `k` rows per key ACROSS
    * micro-batches, drop the rest — the streaming twin of
    * [[graft.operators.Sample.capPerKey]]'s "max N docs per domain"
    * curation rule, for ingestion pipelines that must bound per-source
    * volume before anything lands. One `ValueState[Long]` counter per
    * key (O(keys) state, optionally TTL'd so idle sources are evicted
    * and a source's budget refreshes after `ttl` of silence).
    *
    * Requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass` — transformWithState
    * does not run on the default HDFS-backed store). */
  class CapPerKeyProcessor(k: Long, ttl: TTLConfig)
      extends StatefulProcessor[String, KeyedDoc, KeyedDoc] {
    @transient private var admitted: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      admitted = getHandle.getValueState[Long](
        "admitted", org.apache.spark.sql.Encoders.scalaLong, ttl)

    override def handleInputRows(key: String, rows: Iterator[KeyedDoc],
                                 timers: TimerValues): Iterator[KeyedDoc] = {
      val before = if (admitted.exists()) admitted.get() else 0L
      var c = before
      val out = Seq.newBuilder[KeyedDoc]
      // stop consuming once full — a saturated key must not pay per-row
      // work for the rest of the batch
      while (c < k && rows.hasNext) { out += rows.next(); c += 1 }
      // With a TTL, every batch that saw arrivals must refresh the state
      // (TTL restarts on update): the documented contract is "budget
      // refreshes after ttl of SILENCE", so a continuously hot key must
      // never lapse. Without a TTL the write is skipped when the count
      // is unchanged — a saturated key then costs zero state writes.
      if (c != before || ttl != TTLConfig.NONE) admitted.update(c)
      out.result().iterator
    }
  }

  def streamingCapPerKey(docs: DataFrame, keyCol: String, idCol: String, k: Long,
                         ttl: TTLConfig = TTLConfig.NONE): Dataset[KeyedDoc] = {
    import docs.sparkSession.implicits._
    require(k > 0, "k must be positive")
    docs.select(col(keyCol).cast("string").as("key"), col(idCol).cast("long").as("id"))
      .as[KeyedDoc]
      .groupByKey(_.key)
      .transformWithState(new CapPerKeyProcessor(k, ttl),
        TimeMode.None(), OutputMode.Append())
  }
}
