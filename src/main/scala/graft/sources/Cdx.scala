package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.charset.StandardCharsets.UTF_8

/** CDX capture index over WARC archives — the public CDXJ format
  * CommonCrawl ships next to every crawl (one line per capture:
  * `SURT-key timestamp14 {json}` where the JSON carries url, filename,
  * compressed byte offset and length, mime). The index is what turns
  * crawl access from "sweep every 1 GB file" into "pread the 12
  * records you want": a selective fetch reads EXACTLY the indexed
  * member extents, no resync scan, no wasted bytes — the real 100 TB
  * crawl-access pattern (reference: the CDXJ spec and CommonCrawl's
  * published cc-index layout; format knowledge only, original code).
  *
  * Three pieces:
  *   - [[build]]: the one-time index-construction sweep (how the crawl
  *     provider builds theirs) — distributed over the same byte-range
  *     splits as [[Warc.read]], recording each member's exact
  *     compressed extent from the reader's own position accounting;
  *   - [[writeCdxj]]/[[readCdxj]]: the published text interchange,
  *     sorted by (SURT key, timestamp) exactly like shipped indexes
  *     (the sort is what makes the file binary-searchable client-side);
  *   - [[fetch]]: the selective read — filter the index DataFrame with
  *     any predicate (host, prefix, time range), then each task preads
  *     only its members' [offset, offset+length) slices, grouped by
  *     file so one task streams one archive's selections in offset
  *     order (seek-friendly on object stores: strictly forward reads).
  *
  * Scale: the index is ~80 bytes/record — petabyte crawls index to
  * mere terabytes that Spark filters as an ordinary DataFrame with
  * predicate pushdown; no driver-side range list ever materializes. */
object Cdx {

  val schema: StructType = StructType(Seq(
    StructField("urlkey", StringType, nullable = false),
    StructField("ts", TimestampType, nullable = true),
    StructField("url", StringType, nullable = false),
    StructField("filename", StringType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("length", LongType, nullable = false),
    StructField("mime", StringType, nullable = true),
    StructField("record_type", StringType, nullable = false),
    // base32 SHA-1 of the record payload — the published CDXJ `digest`
    // field (CommonCrawl's dedup keys revisit records on it); null for
    // index rows from sources that never carried one
    StructField("digest", StringType, nullable = true)))

  /** SURT (Sort-friendly URI Reordering Transform) key — the public
    * canonical form every CDX index sorts by: lowercase, host labels
    * reversed and comma-joined, `)` then path+query. Keeps same-host
    * captures adjacent so host-prefix range scans work on the sorted
    * file. */
  private[graft] def surt(url: String): String = {
    val u = url.toLowerCase(java.util.Locale.ROOT)
    val afterScheme = u.indexOf("://") match {
      case -1 => u
      case i  => u.substring(i + 3)
    }
    val slash = afterScheme.indexOf('/')
    val (host0, path) =
      if (slash < 0) (afterScheme, "/")
      else (afterScheme.substring(0, slash), afterScheme.substring(slash))
    val host = host0.takeWhile(_ != ':') // strip port for the key, like the published transform
    host.split('.').reverse.mkString(",") + ")" + path
  }

  // ---- build -------------------------------------------------------------

  /** Construct the index by sweeping `warcPath` once — distributed over
    * the same validated byte-range splits as [[Warc.read]], so a 100 TB
    * crawl indexes in one embarrassingly parallel pass. Each member's
    * exact compressed extent comes from the reader's own position
    * accounting (`Inflater.getBytesRead`), so a fetch preads precisely
    * the member, never a guess. Multi-record members (nonstandard but
    * legal) index every record at the member's extent. Records without
    * a Target-URI (warcinfo) are not captures and are skipped, exactly
    * like shipped indexes. */
  def build(spark: SparkSession, warcPath: String,
            maxSplitBytes: Long = 128L << 20): DataFrame = {
    val splits = Warc.planSplits(spark, warcPath, maxSplitBytes)
    val confBc = spark.sparkContext.broadcast(Warc.serializableConf(spark))
    val rdd = spark.sparkContext
      .parallelize(splits, math.max(1, splits.size))
      .flatMap { case (file, start, end) =>
        val conf = new Configuration(false)
        confBc.value.foreach { case (k, v) => conf.set(k, v) }
        val name = new Path(file).getName
        Warc.readSplitMembers(conf, file, start, end).flatMap {
          case (off, len, bytes) =>
            Warc.parseRecords(bytes).flatMap { r =>
              val url = if (r.isNullAt(0)) null else r.getString(0)
              if (url == null) Iterator.empty
              else Iterator.single(Row(surt(url), r.get(1), url, name, off, len,
                if (r.isNullAt(3)) null else r.getString(3), r.getString(2),
                sha1Base32(r.getAs[Array[Byte]](5))))
            }
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** RFC 4648 base32 (no padding — SHA-1's 160 bits pack to exactly 32
    * characters) of the payload's SHA-1, the encoding shipped CDX
    * `digest` fields use. */
  private[graft] def sha1Base32(payload: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("SHA-1").digest(payload)
    val alphabet = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"
    val sb = new java.lang.StringBuilder(32)
    var acc = 0L; var bits = 0; var i = 0
    while (i < d.length) {
      acc = (acc << 8) | (d(i) & 0xffL); bits += 8
      while (bits >= 5) {
        bits -= 5
        sb.append(alphabet(((acc >>> bits) & 0x1f).toInt))
      }
      i += 1
    }
    sb.toString
  }

  // ---- CDXJ text interchange ----------------------------------------------

  private val Ts14 = java.time.format.DateTimeFormatter.ofPattern("yyyyMMddHHmmss")
    .withZone(java.time.ZoneOffset.UTC)

  /** Write the index in the published CDXJ line format, globally sorted
    * by (urlkey, ts) — the invariant that makes shipped indexes
    * range-scannable. `numShards` range-partitioned sorted shards (a
    * petabyte index cannot be one file; CommonCrawl ships ~300 sorted
    * shards per crawl). Offset/length serialize as JSON strings, the
    * quirk the public format actually has. */
  def writeCdxj(index: DataFrame, dir: String, numShards: Int = 1): Unit = {
    require(numShards > 0, "numShards must be positive")
    val spark = index.sparkSession
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    fs.mkdirs(p)
    val confBc = spark.sparkContext.broadcast(Warc.serializableConf(spark))
    val dirStr = dir
    val withDigest = if (index.columns.contains("digest")) index
      else index.withColumn("digest", lit(null).cast("string"))
    withDigest.select(col("urlkey"), col("ts"), col("url"), col("filename"),
        col("offset"), col("length"), col("mime"), col("record_type"),
        col("digest"))
      .repartitionByRange(numShards, col("urlkey"), col("ts"))
      .sortWithinPartitions(col("urlkey"), col("ts"))
      .rdd.mapPartitionsWithIndex { (pid, rows) =>
        if (!rows.hasNext) Iterator.empty
        else {
          val conf = new Configuration(false)
          confBc.value.foreach { case (k, v) => conf.set(k, v) }
          val outPath = new Path(dirStr, f"part-$pid%05d.cdxj")
          val out = outPath.getFileSystem(conf).create(outPath, true)
          try {
            val w = new java.io.BufferedWriter(new java.io.OutputStreamWriter(out, UTF_8))
            rows.foreach { r =>
              val ts = if (r.isNullAt(1)) null else r.getTimestamp(1)
              val json = new StringBuilder("{\"url\": ")
              json.append(jstr(r.getString(2)))
                .append(", \"filename\": ").append(jstr(r.getString(3)))
                .append(", \"offset\": \"").append(r.getLong(4))
                .append("\", \"length\": \"").append(r.getLong(5)).append('"')
              if (!r.isNullAt(6)) json.append(", \"mime\": ").append(jstr(r.getString(6)))
              json.append(", \"record_type\": ").append(jstr(r.getString(7)))
              if (!r.isNullAt(8)) json.append(", \"digest\": ").append(jstr(r.getString(8)))
              json.append('}')
              w.write(r.getString(0)); w.write(' ')
              w.write(if (ts == null) "-" else Ts14.format(ts.toInstant)); w.write(' ')
              w.write(json.toString); w.write('\n')
            }
            w.flush()
          } finally out.close()
          Iterator.empty
        }
      }.count() // force the write
    ()
  }

  private def jstr(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '\\'          => sb.append("\\\\")
      case '"'           => sb.append("\\\"")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c             => sb.append(c)
    }
    sb.append('"').toString
  }

  /** Read CDXJ text back into the [[schema]] frame. Plain `.cdxj` files
    * split like any text source; the parse is declarative (one regex
    * cut + `from_json`), so it rides whole-stage codegen and the filter
    * a caller applies next pushes into the scan. */
  def readCdxj(spark: SparkSession, path: String): DataFrame =
    parseCdxjLines(spark.read.text(path))

  // ---- sorted-shard prefix lookup -------------------------------------------

  /** Index entries whose SURT key starts with (or, `exact = true`,
    * equals) `surtPrefix`, optionally restricted to a ts14 capture-time
    * range `[from14, to14]` — located by BINARY SEARCH over the sorted
    * CDXJ shards instead of scanning them, the pywb-style serving path
    * shipped indexes are sorted FOR (a petabyte crawl's index is
    * terabytes across a few hundred sorted shards; a one-URL lookup
    * must cost O(log shardBytes) preads per shard, never a scan).
    *
    * Mechanics: ONE Spark job binary-searches every shard in parallel
    * (a task per shard, ~2·log2(shardBytes) positioned reads each) for
    * the byte range [first line >= loTarget, first line >= hiTarget);
    * a second job reads ONLY those ranges, split into `maxChunkBytes`
    * sub-ranges with Hadoop-text-split line ownership (a line belongs
    * to the chunk its first byte falls in), so a broad prefix spanning
    * many GB in one shard still parses distributed and no task ever
    * materializes an unbounded buffer. Empty ranges cost two binary
    * searches and read nothing.
    *
    * ORDER CORRECTNESS: shards are written in Spark's UTF8String sort
    * order, which is unsigned UTF-8 BYTE order — so the search compares
    * raw unsigned bytes, never Java UTF-16 strings (those disagree with
    * byte order above U+007F and would silently miss non-ASCII keys).
    * The upper bound is the byte-level successor of the prefix
    * (last non-0xFF byte incremented, tail truncated), which sorts
    * after every extension of the prefix; all-0xFF prefixes fall back
    * to shard EOF. Lines are compared WHOLE (key, space, ts14, json):
    * valid CDXJ keys are `\S+`, whose UTF-8 bytes are all > 0x20, so a
    * `prefix ++ " " ++ from14` lower target skips exactly the
    * exact-key lines older than `from14` and nothing else — the ts
    * filter on the remaining lines applies after the parse.
    *
    * `from14`/`to14` are inclusive 14-digit `yyyyMMddHHmmss` UTC
    * bounds (the pywb query parameters); entries with no timestamp
    * never match a bounded lookup. */
  def lookupPrefix(spark: SparkSession, dir: String, surtPrefix: String,
                   from14: Option[String] = None, to14: Option[String] = None,
                   exact: Boolean = false,
                   maxChunkBytes: Long = 64L << 20): DataFrame = {
    require(surtPrefix.nonEmpty, "surtPrefix must be non-empty")
    require(maxChunkBytes >= (1L << 16), s"maxChunkBytes too small: $maxChunkBytes")
    Seq("from14" -> from14, "to14" -> to14).foreach { case (n, v) =>
      v.foreach(s => require(s.length == 14 && s.forall(_.isDigit),
        s"$n must be 14 digits yyyyMMddHHmmss, got: $s"))
    }
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val shards = (if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).toSeq.filter(s => s.isFile && s.getPath.getName.endsWith(".cdxj"))
      else Seq(fs.getFileStatus(p))).sortBy(_.getPath.toString)
    require(shards.nonEmpty, s"no .cdxj shards under $dir")
    val prefixBytes = surtPrefix.getBytes(UTF_8)
    // exact-key lookups bound the range by "key " (key, space): every
    // exact-key line starts with it and no other key's line does.
    val base = if (exact) prefixBytes :+ ' '.toByte else prefixBytes
    val loTarget = from14 match {
      case Some(f) if exact => base ++ f.getBytes(UTF_8)
      case Some(f)          => prefixBytes ++ (' '.toByte +: f.getBytes(UTF_8))
      case None             => base
    }
    // None = no finite successor (all-0xFF prefix): range ends at EOF
    val hiTarget: Option[Array[Byte]] = (to14, exact) match {
      case (Some(t), true) => byteSuccessor(base ++ t.getBytes(UTF_8))
      case _               => byteSuccessor(base)
    }
    val confBc = spark.sparkContext.broadcast(Warc.serializableConf(spark))
    // job 1: binary-search all shards in parallel — a one-host lookup
    // over hundreds of shards is hundreds of concurrent log-probe tasks,
    // not a serial driver loop over high-latency opens
    val shardList = shards.map(st => (st.getPath.toString, st.getLen))
    val ranges = spark.sparkContext
      .parallelize(shardList, shardList.size)
      .flatMap { case (file, len) =>
        val conf = new Configuration(false)
        confBc.value.foreach { case (k, v) => conf.set(k, v) }
        val fp = new Path(file)
        val in = fp.getFileSystem(conf).open(fp)
        try {
          val lo = firstLineAtLeast(in, len, loTarget)
          val hi = hiTarget.map(firstLineAtLeast(in, len, _)).getOrElse(len)
          if (hi > lo) Iterator.single((file, lo, hi)) else Iterator.empty
        } finally in.close()
      }.collect().toSeq
    if (ranges.isEmpty) return spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], schema)
    // driver-side chunk cut: descriptors only (a few longs per chunk),
    // never bytes; each chunk owns the lines STARTING inside it
    val chunks = ranges.flatMap { case (file, lo, hi) =>
      (lo until hi by maxChunkBytes).map { cs =>
        (file, cs, math.min(cs + maxChunkBytes, hi), cs == lo, hi)
      }
    }
    // job 2: read + parse only the matched byte ranges, distributed
    val lines = spark.sparkContext.parallelize(chunks, chunks.size).flatMap {
      case (file, cs, ce, isFirst, rangeHi) =>
        val conf = new Configuration(false)
        confBc.value.foreach { case (k, v) => conf.set(k, v) }
        val fp = new Path(file)
        val fin = fp.getFileSystem(conf).open(fp)
        try readChunkLines(fin, cs, ce, isFirst, rangeHi)
        finally fin.close()
    }
    import spark.implicits._
    val parsed = parseCdxjLines(lines.toDF("value"))
    val keyed =
      if (exact) parsed.filter(col("urlkey") === surtPrefix)
      else parsed.filter(col("urlkey").startsWith(surtPrefix))
    // inclusive ts14 bounds as driver-built UTC instants — immune to
    // the session timezone by construction
    val fromFiltered = from14.fold(keyed) { f =>
      keyed.filter(col("ts") >= lit(java.sql.Timestamp.from(ts14ToInstant(f))))
    }
    to14.fold(fromFiltered) { t =>
      fromFiltered.filter(col("ts") <= lit(java.sql.Timestamp.from(ts14ToInstant(t))))
    }
  }

  private def ts14ToInstant(ts14: String): java.time.Instant =
    java.time.LocalDateTime.parse(ts14,
      java.time.format.DateTimeFormatter.ofPattern("yyyyMMddHHmmss"))
      .toInstant(java.time.ZoneOffset.UTC)

  /** Shortest byte string greater than every string prefixed by `b`:
    * drop trailing 0xFF bytes, increment the last remaining one.
    * None iff b is all 0xFF (no finite successor). */
  private[graft] def byteSuccessor(b: Array[Byte]): Option[Array[Byte]] = {
    var i = b.length - 1
    while (i >= 0 && b(i) == -1) i -= 1
    if (i < 0) None
    else {
      val out = java.util.Arrays.copyOf(b, i + 1)
      out(i) = (out(i) + 1).toByte
      Some(out)
    }
  }

  /** Unsigned-byte lexicographic: is the line starting at `lineStart`
    * (ending at '\n' or EOF) >= `target`? Reads at most
    * `target.length` bytes — the comparison decides by then. */
  private def lineAtLeast(in: org.apache.hadoop.fs.FSDataInputStream,
                          len: Long, lineStart: Long, target: Array[Byte]): Boolean = {
    if (target.isEmpty) return true
    val n = math.min(target.length.toLong, len - lineStart).toInt
    val buf = new Array[Byte](n)
    in.readFully(lineStart, buf, 0, n)
    var i = 0
    while (i < n) {
      val b = buf(i)
      if (b == '\n') return false // line is a strict prefix of target
      val cmp = (b & 0xff) - (target(i) & 0xff)
      if (cmp != 0) return cmp > 0
      i += 1
    }
    n == target.length // equal through EOF-truncation => shorter => less
  }

  /** Byte offset of the first LINE START in [0, len] whose whole line
    * sorts >= `target` in unsigned UTF-8 byte order — binary search in
    * a sorted text file: probe a byte offset, snap to the next line
    * start, compare that line. Invariant: lo always at an offset whose
    * snapped line < target, hi at one whose snapped line >= target
    * (EOF counts as +infinity). */
  private def firstLineAtLeast(in: org.apache.hadoop.fs.FSDataInputStream,
                               len: Long, target: Array[Byte]): Long = {
    def lineStartAfter(pos: Long): Long = {
      if (pos < 0) return 0L
      var p = pos
      val buf = new Array[Byte](8192)
      while (p < len) {
        val n = math.min(buf.length.toLong, len - p).toInt
        in.readFully(p, buf, 0, n)
        var i = 0
        while (i < n) {
          if (buf(i) == '\n') return p + i + 1
          i += 1
        }
        p += n
      }
      len
    }
    // first line start at or after byte x (a line starts at x iff
    // byte x-1 is '\n'; x=0 is always a line start)
    def las(x: Long): Long = if (x <= 0) 0L else lineStartAfter(x - 1)
    // monotone predicate over raw byte offsets: g(x) = line at the
    // first line start at-or-after x (EOF => +infinity). The file is
    // sorted, so g is non-decreasing and {x : g(x) >= target} is a
    // suffix — plain binary search over bytes, snap to the line start.
    def g(x: Long): Boolean = {
      val s = las(x)
      s >= len || lineAtLeast(in, len, s, target)
    }
    if (len == 0 || g(0)) return 0L
    var lo = 0L  // g(lo) false
    var hi = len // g(len) true (EOF)
    while (hi - lo > 1) {
      val mid = lo + (hi - lo) / 2
      if (g(mid)) hi = mid else lo = mid
    }
    las(hi)
  }

  /** Lines OWNED by chunk [cs, ce) of a matched range ending at
    * `rangeHi`: a line belongs to the chunk its first byte falls in
    * (Hadoop text-split convention), so adjacent chunks partition the
    * range's lines exactly. Non-first chunks skip the partial line
    * carried over from the previous chunk; the last owned line may
    * extend past `ce` (bounded by `rangeHi`, itself a line start).
    * Streams in bounded blocks — no task buffers more than
    * (chunk + one line) bytes. */
  private def readChunkLines(in: org.apache.hadoop.fs.FSDataInputStream,
                             cs: Long, ce: Long, isFirst: Boolean,
                             rangeHi: Long): Iterator[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val buf = new Array[Byte](1 << 20)
    var p = if (isFirst) cs else {
      // first line start at or after cs: scan from cs-1 for '\n'
      var q = cs - 1
      var found = -1L
      while (found < 0 && q < rangeHi) {
        val n = math.min(buf.length.toLong, rangeHi - q).toInt
        in.readFully(q, buf, 0, n)
        var i = 0
        while (found < 0 && i < n) {
          if (buf(i) == '\n') found = q + i + 1
          i += 1
        }
        q += n
      }
      if (found < 0) rangeHi else found
    }
    var lineStart = p
    val acc = new java.io.ByteArrayOutputStream()
    while (lineStart < ce && p < rangeHi) {
      val n = math.min(buf.length.toLong, rangeHi - p).toInt
      in.readFully(p, buf, 0, n)
      var i = 0
      var from = 0
      while (i < n && lineStart < ce) {
        if (buf(i) == '\n') {
          acc.write(buf, from, i - from)
          if (acc.size() > 0) out += acc.toString("UTF-8")
          acc.reset()
          from = i + 1
          lineStart = p + i + 1
        }
        i += 1
      }
      if (lineStart < ce && from < n) acc.write(buf, from, n - from)
      p += n
    }
    // tail: the range ends at a line start, so an unterminated
    // accumulator can only happen at physical EOF
    if (lineStart < ce && acc.size() > 0) out += acc.toString("UTF-8")
    out.iterator
  }

  /** The declarative CDXJ line parse shared by [[readCdxj]] and
    * [[lookupPrefix]]. */
  private def parseCdxjLines(lines: DataFrame): DataFrame = {
    val jsonSchema = StructType(Seq(
      StructField("url", StringType), StructField("filename", StringType),
      StructField("offset", StringType), StructField("length", StringType),
      StructField("mime", StringType), StructField("record_type", StringType),
      StructField("digest", StringType)))
    lines.filter(length(trim(col("value"))) > 0)
      .select(
        regexp_extract(col("value"), "^(\\S+) (\\S+) (.*)$", 1).as("urlkey"),
        regexp_extract(col("value"), "^(\\S+) (\\S+) (.*)$", 2).as("_ts14"),
        from_json(regexp_extract(col("value"), "^(\\S+) (\\S+) (.*)$", 3), jsonSchema).as("j"))
      .select(col("urlkey"),
        // ts14 is DEFINED as UTC (writeCdxj formats it so); parse it as
        // UTC explicitly — to_timestamp would interpret the wall time in
        // the session zone and shift every capture by the zone offset
        when(col("_ts14") === "-", lit(null).cast("timestamp"))
          .otherwise(expr(
            "make_timestamp(CAST(substr(_ts14, 1, 4) AS INT), " +
              "CAST(substr(_ts14, 5, 2) AS INT), CAST(substr(_ts14, 7, 2) AS INT), " +
              "CAST(substr(_ts14, 9, 2) AS INT), CAST(substr(_ts14, 11, 2) AS INT), " +
              "CAST(substr(_ts14, 13, 2) AS DECIMAL(8,6)), 'UTC')")).as("ts"),
        col("j.url").as("url"), col("j.filename").as("filename"),
        col("j.offset").cast("long").as("offset"),
        col("j.length").cast("long").as("length"),
        col("j.mime").as("mime"), col("j.record_type").as("record_type"),
        col("j.digest").as("digest"))
  }

  /** pywb `matchType=domain`: every capture of `surtHost` AND its
    * subdomains — the access pattern behind "give me everything under
    * this site" queries. SURT makes it a RANGE problem: a host's
    * subdomains all share its comma-joined reversed-label prefix
    * (`example,site` → `example,site)` itself, `example,site,www)` a
    * subdomain), so the same binary-searched shard range serves the
    * query; the ONLY extra work is a boundary filter dropping
    * longer-label false hits (`example,sitex)`) — the next character
    * after the host prefix must be `,` (subdomain) or `)` (the host
    * itself). Pass the SURT host WITHOUT the `)` terminator; ts14
    * range and chunking behave exactly like [[lookupPrefix]]. */
  def lookupDomain(spark: SparkSession, dir: String, surtHost: String,
                   from14: Option[String] = None, to14: Option[String] = None,
                   maxChunkBytes: Long = 64L << 20): DataFrame = {
    require(surtHost.nonEmpty && !surtHost.endsWith(")"),
      s"pass the SURT host without ')': '$surtHost'")
    lookupPrefix(spark, dir, surtHost, from14, to14,
        exact = false, maxChunkBytes = maxChunkBytes)
      .filter(col("urlkey").rlike(
        "^" + java.util.regex.Pattern.quote(surtHost) + "[,)]"))
  }

  // ---- change-rate recrawl priority -----------------------------------------

  /** Refetch priority from capture history — the recrawl-budgeting
    * pass a 100 TB cumulative index exists to answer: per `urlkey`,
    * the OBSERVED change rate is (distinct payload digests − 1) over
    * the capture span, and the priority is the EXPECTED number of
    * missed changes since the last capture, `rate × age`. Pure
    * count/min/max aggregation + IEEE arithmetic — one shuffle on
    * urlkey at any index size, no window, no exp (bit-identical
    * cross-engine). Single-capture histories (span 0) get priority 0 —
    * no observed change rate, nothing to extrapolate; timestampless
    * index rows are not captures and are ignored. */
  def refetchPriority(index: DataFrame,
                      asOf: java.sql.Timestamp): DataFrame =
    index.filter(col("ts").isNotNull)
      .groupBy(col("urlkey"))
      .agg(max(col("url")).as("url"),
        count(lit(1)).as("n_captures"),
        countDistinct(col("digest")).as("n_versions"),
        min(unix_timestamp(col("ts"))).as("_first"),
        max(unix_timestamp(col("ts"))).as("_last"))
      .select(col("urlkey"), col("url"), col("n_captures"), col("n_versions"),
        (col("_last") - col("_first")).as("span_sec"),
        (lit(asOf.getTime / 1000L) - col("_last")).as("age_sec"),
        when(col("_last") > col("_first"),
            (col("n_versions") - 1).cast("double") *
              (lit(asOf.getTime / 1000L) - col("_last")).cast("double") /
              (col("_last") - col("_first")).cast("double"))
          .otherwise(lit(0.0)).as("priority"))

  // ---- capture collapsing ----------------------------------------------------

  /** pywb's `collapse=timestamp:digits` serving option: ONE capture per
    * (urlkey, ts14 N-digit bucket) — `digits = 8` is the calendar-page
    * default (one capture per URL per day), 4 yearly, 10 hourly, 14
    * no-op dedup. Keeps the FIRST capture of each bucket (earliest ts;
    * ties break on (filename, offset) so the result is deterministic
    * across shard layouts); timestampless entries collapse as their own
    * bucket. One shuffle — a window keyed (urlkey, bucket), the same
    * shape at any index size.
    *
    * ts14 buckets are DEFINED in UTC (writeCdxj formats them so);
    * `date_format` renders in the session timezone, so a non-UTC
    * session would silently bucket shifted days — refuse it loud. */
  def collapse(index: DataFrame, digits: Int): DataFrame = {
    require(digits >= 4 && digits <= 14 && digits % 2 == 0,
      s"digits must be one of 4,6,8,10,12,14 (ts14 field boundaries), got $digits")
    val tz = index.sparkSession.conf.get("spark.sql.session.timeZone", "")
    require(tz == "UTC",
      s"collapse buckets ts14 in UTC but the session timezone is '$tz'; " +
        "set spark.sql.session.timeZone=UTC (ts14 is defined as UTC)")
    val bucket = when(col("ts").isNull, lit("-"))
      .otherwise(substring(date_format(col("ts"), "yyyyMMddHHmmss"), 1, digits))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("urlkey"), bucket)
      .orderBy(col("ts").asc_nulls_first, col("filename"), col("offset"))
    index.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  // ---- selective fetch -----------------------------------------------------

  /** Read EXACTLY the records `index` selects: each row's
    * [offset, offset+length) slice preads from `warcDir/filename`,
    * inflates standalone (no resync — the extent is exact), and parses
    * to [[Warc.schema]] rows. Duplicate extents fetch ONCE — a
    * multi-record member (nonstandard but legal) indexes every record
    * at the same extent, and preading it per index row would duplicate
    * its records; fetch is member-granular: selecting any record of a
    * member yields that member's full record set exactly once (the
    * dedupe is a same-task adjacent-row skip, not an extra shuffle —
    * equal extents sort together).
    *
    * Partitioning: ONE shuffle keyed by (filename, offset-band of
    * `maxBytesPerTask` compressed bytes), rows sorted by (filename,
    * offset) within each task — so a selection that concentrates in
    * ONE archive (the common one-host lookup) still fans out across
    * the cluster instead of serializing through a single per-file
    * task, every task's pread volume is bounded by the band width,
    * and each task reads strictly forward (the seek pattern object
    * stores serve well). A selection of 12 records from a 1 GB
    * archive reads ~12 member-lengths, not 1 GB. */
  def fetch(spark: SparkSession, index: DataFrame, warcDir: String,
            maxBytesPerTask: Long = 256L << 20): DataFrame =
    spark.createDataFrame(
      fetchRows(spark, index, warcDir, maxBytesPerTask, withRefers = false),
      Warc.schema)

  private val refersSchema: StructType = StructType(
    Warc.schema.fields ++ Seq(
      StructField("refers_to_url", StringType, nullable = true),
      StructField("refers_to_ts", TimestampType, nullable = true)))

  /** The shared pread loop behind [[fetch]] and [[fetchResolved]]:
    * one shuffle keyed by (filename, offset band), adjacent-duplicate
    * extent skip, strictly-forward positioned reads. `withRefers`
    * additionally surfaces each record's WARC-Refers-To linkage. */
  private def fetchRows(spark: SparkSession, index: DataFrame, warcDir: String,
                        maxBytesPerTask: Long,
                        withRefers: Boolean): org.apache.spark.rdd.RDD[Row] = {
    require(maxBytesPerTask > 0, "maxBytesPerTask must be positive")
    val confBc = spark.sparkContext.broadcast(Warc.serializableConf(spark))
    val dirStr = warcDir
    // EXPLICIT partition count: index rows are ~50 bytes but each one
    // drives a `length`-byte pread — AQE would coalesce the tiny
    // shuffle into one partition and serialize the whole fetch (it
    // sizes by shuffle bytes, which do not measure the I/O the rows
    // fan out into). Pinning numPartitions keeps the byte-band
    // fan-out an actual fan-out.
    val nPart = spark.conf.get("spark.sql.shuffle.partitions", "200").toInt
    index.select(col("filename"), col("offset"), col("length"))
      .withColumn("_band", (col("offset") / maxBytesPerTask).cast("long"))
      .repartition(nPart, col("filename"), col("_band"))
      .sortWithinPartitions(col("filename"), col("offset"), col("length"))
      .drop("_band")
      .rdd.mapPartitions { rows =>
        val conf = new Configuration(false)
        confBc.value.foreach { case (k, v) => conf.set(k, v) }
        var openName: String = null
        var in: org.apache.hadoop.fs.FSDataInputStream = null
        def switchTo(name: String): Unit = {
          if (name != openName) {
            if (in != null) { try in.close() catch { case _: Exception => () } }
            val p = new Path(dirStr, name)
            in = p.getFileSystem(conf).open(p)
            openName = name
          }
        }
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit] { _ =>
          if (in != null) { try in.close() catch { case _: Exception => () } }
        }
        // adjacent-duplicate skip: equal (filename, offset, length)
        // rows are consecutive after the sort, and a same-extent pair
        // is the SAME member — fetch it once
        var lastName: String = null
        var lastOff = -1L
        var lastLen = -1L
        rows.flatMap { r =>
          val name = r.getString(0)
          val off = r.getLong(1)
          val len = r.getLong(2)
          if (name == lastName && off == lastOff && len == lastLen) Iterator.empty
          else {
            lastName = name; lastOff = off; lastLen = len
            switchTo(name)
            require(len > 0 && len <= Int.MaxValue, s"member length out of range: $len")
            val buf = new Array[Byte](len.toInt)
            in.readFully(off, buf) // positioned read: exactly the member
            val recs = Warc.parseRecordsWithRefers(Warc.inflateMemberBytes(buf))
            if (withRefers)
              recs.map { case (rec, ru, rt) => Row.fromSeq(rec.toSeq ++ Seq(ru, rt)) }
            else recs.map(_._1)
          }
        }
      }
  }

  /** [[fetch]] with `revisit` records RESOLVED — the CommonCrawl dedup
    * quirk: a re-crawl whose content didn't change writes a `revisit`
    * record with an EMPTY payload plus WARC-Refers-To-Target-URI /
    * WARC-Refers-To-Date headers pointing at the capture that holds the
    * bytes. A fetch that surfaces revisits as-is hands the pipeline
    * empty documents; this one joins each revisit's linkage back
    * through `fullIndex`, preads the ORIGINAL captures too, and emits
    * the revisit rows carrying the original's payload / content_type /
    * content_length (own url/ts/record_type kept — provenance stays
    * visible; filter `record_type` if you want originals-shaped rows).
    *
    * Shape: two index-joined selective fetches, never a sweep — the
    * revisit subset joins `fullIndex` on (url, ts) (broadcast-able
    * when small, AQE decides), and only the referred extents pread.
    * Revisits whose target is NOT in `fullIndex` (a linkage across
    * crawl segments the caller didn't index) pass through UNCHANGED —
    * empty payload, never a dropped row or a job failure. */
  def fetchResolved(spark: SparkSession, selected: DataFrame, fullIndex: DataFrame,
                    warcDir: String, maxBytesPerTask: Long = 256L << 20): DataFrame = {
    val fetched = spark.createDataFrame(
      fetchRows(spark, selected, warcDir, maxBytesPerTask, withRefers = true),
      refersSchema)
    val isLinkedRevisit = col("record_type") === "revisit" &&
      col("refers_to_url").isNotNull && col("refers_to_ts").isNotNull
    val plain = fetched.filter(!isLinkedRevisit)
      .select(Warc.schema.fieldNames.map(col).toSeq: _*)
    val revisits = fetched.filter(isLinkedRevisit)
    // referred extents: semi-join keeps the index frame's pushdown;
    // non-revisit originals only (a revisit chain resolves one hop —
    // CommonCrawl always points at the concrete capture)
    val wanted = revisits.select(col("refers_to_url").as("url"),
      col("refers_to_ts").as("ts")).distinct()
    val origIdx = fullIndex.filter(col("record_type") =!= "revisit")
      .join(wanted, Seq("url", "ts"), "left_semi")
    val originals = fetch(spark, origIdx, warcDir, maxBytesPerTask)
      .filter(col("record_type") =!= "revisit")
      .dropDuplicates("url", "ts")
      .select(col("url").as("_o_url"), col("ts").as("_o_ts"),
        col("content_type").as("_o_ctype"),
        col("content_length").as("_o_clen"), col("payload").as("_o_payload"))
    val resolved = revisits.join(originals,
        revisits("refers_to_url") === col("_o_url") &&
          revisits("refers_to_ts") === col("_o_ts"), "left")
      .select(col("url"), col("ts"), col("record_type"),
        coalesce(col("_o_ctype"), col("content_type")).as("content_type"),
        coalesce(col("_o_clen"), col("content_length")).as("content_length"),
        coalesce(col("_o_payload"), col("payload")).as("payload"))
    plain.unionByName(resolved)
  }
}
