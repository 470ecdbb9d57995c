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
    StructField("record_type", StringType, nullable = false)))

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
                if (r.isNullAt(3)) null else r.getString(3), r.getString(2)))
            }
        }
      }
    spark.createDataFrame(rdd, schema)
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
    index.select(col("urlkey"), col("ts"), col("url"), col("filename"),
        col("offset"), col("length"), col("mime"), col("record_type"))
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
              json.append(", \"record_type\": ").append(jstr(r.getString(7))).append('}')
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

  /** All index entries whose SURT key starts with `surtPrefix`, located
    * by BINARY SEARCH over the sorted CDXJ shards instead of scanning
    * them — the access path shipped indexes are sorted FOR (a petabyte
    * crawl's index is terabytes across a few hundred sorted shards; a
    * one-host lookup must cost O(log shardBytes) preads per shard, not
    * a full text scan). Per shard the driver finds the byte range
    * [first line with key >= prefix, first line with key >= successor)
    * with ~2·log2(len) positioned reads, then ONLY those ranges are
    * read and parsed (distributed when large, one task per shard
    * range). Keys are compared as Java strings — valid because SURT
    * keys are ASCII (lowercased host/path); `successor` is
    * prefix+U+FFFF, which sorts after every extension of the prefix.
    * Empty ranges cost two binary searches and read nothing. */
  def lookupPrefix(spark: SparkSession, dir: String, surtPrefix: String): DataFrame = {
    require(surtPrefix.nonEmpty, "surtPrefix must be non-empty")
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val shards = (if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).toSeq.filter(s => s.isFile && s.getPath.getName.endsWith(".cdxj"))
      else Seq(fs.getFileStatus(p))).sortBy(_.getPath.toString)
    require(shards.nonEmpty, s"no .cdxj shards under $dir")
    val successor = surtPrefix + "\uffff"
    val ranges = shards.flatMap { st =>
      val in = fs.open(st.getPath)
      try {
        val len = st.getLen
        val lo = firstLineWithKeyAtLeast(in, len, surtPrefix)
        val hi = firstLineWithKeyAtLeast(in, len, successor)
        if (hi > lo) Some((st.getPath.toString, lo, hi)) else None
      } finally in.close()
    }
    if (ranges.isEmpty) return spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], schema)
    val confBc = spark.sparkContext.broadcast(Warc.serializableConf(spark))
    val lines = spark.sparkContext.parallelize(ranges, ranges.size).flatMap {
      case (file, lo, hi) =>
        val conf = new Configuration(false)
        confBc.value.foreach { case (k, v) => conf.set(k, v) }
        val fp = new Path(file)
        val fin = fp.getFileSystem(conf).open(fp)
        try {
          val n = (hi - lo).toInt
          val buf = new Array[Byte](n)
          fin.readFully(lo, buf)
          new String(buf, UTF_8).split('\n').toSeq.filter(_.nonEmpty)
        } finally fin.close()
    }
    import spark.implicits._
    parseCdxjLines(lines.toDF("value"))
      .filter(col("urlkey").startsWith(surtPrefix))
  }

  /** Byte offset of the first LINE START in [0, len] whose key (the
    * text before the first space) sorts >= `target` — classic
    * binary-search-in-a-sorted-text-file: probe a byte offset, advance
    * to the next line start, read its key. Invariant: lo is always at
    * a line start with key < target (or 0), hi at one with key >=
    * target (or EOF). */
  private def firstLineWithKeyAtLeast(in: org.apache.hadoop.fs.FSDataInputStream,
                                      len: Long, target: String): Long = {
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
    def keyAt(lineStart: Long): String = {
      val sb = new StringBuilder
      var p = lineStart
      val buf = new Array[Byte](512)
      while (p < len) {
        val n = math.min(buf.length.toLong, len - p).toInt
        in.readFully(p, buf, 0, n)
        var i = 0
        while (i < n) {
          val c = buf(i)
          if (c == ' ' || c == '\n') return sb.toString
          sb.append(c.toChar) // SURT keys are ASCII by construction
          i += 1
        }
        p += n
      }
      sb.toString
    }
    // first line start at or after byte x (a line starts at x iff
    // byte x-1 is '\n'; x=0 is always a line start)
    def las(x: Long): Long = if (x <= 0) 0L else lineStartAfter(x - 1)
    // monotone predicate over raw byte offsets: g(x) = key of the first
    // line at-or-after x (EOF => +infinity). The file is sorted, so g is
    // non-decreasing in x and {x : g(x) >= target} is a suffix — plain
    // binary search over bytes, then snap the boundary to its line start.
    def g(x: Long): Boolean = {
      val s = las(x)
      s >= len || keyAt(s) >= target
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

  /** The declarative CDXJ line parse shared by [[readCdxj]] and
    * [[lookupPrefix]]. */
  private def parseCdxjLines(lines: DataFrame): DataFrame = {
    val jsonSchema = StructType(Seq(
      StructField("url", StringType), StructField("filename", StringType),
      StructField("offset", StringType), StructField("length", StringType),
      StructField("mime", StringType), StructField("record_type", StringType)))
    lines.filter(length(trim(col("value"))) > 0)
      .select(
        regexp_extract(col("value"), "^(\\S+) (\\S+) (.*)$", 1).as("urlkey"),
        regexp_extract(col("value"), "^(\\S+) (\\S+) (.*)$", 2).as("_ts14"),
        from_json(regexp_extract(col("value"), "^(\\S+) (\\S+) (.*)$", 3), jsonSchema).as("j"))
      .select(col("urlkey"),
        when(col("_ts14") === "-", lit(null).cast("timestamp"))
          .otherwise(to_timestamp(col("_ts14"), "yyyyMMddHHmmss")).as("ts"),
        col("j.url").as("url"), col("j.filename").as("filename"),
        col("j.offset").cast("long").as("offset"),
        col("j.length").cast("long").as("length"),
        col("j.mime").as("mime"), col("j.record_type").as("record_type"))
  }

  // ---- selective fetch -----------------------------------------------------

  /** Read EXACTLY the records `index` selects: each row's
    * [offset, offset+length) slice preads from `warcDir/filename`,
    * inflates standalone (no resync — the extent is exact), and parses
    * to [[Warc.schema]] rows. Rows hash-partition by filename and sort
    * by offset within each task, so every archive is visited by a
    * bounded number of tasks reading strictly forward — the
    * seek-pattern object stores serve well. A selection of 12 records
    * from a 1 GB archive reads ~12 member-lengths, not 1 GB. */
  def fetch(spark: SparkSession, index: DataFrame, warcDir: String): DataFrame = {
    val confBc = spark.sparkContext.broadcast(Warc.serializableConf(spark))
    val dirStr = warcDir
    val rdd = index.select(col("filename"), col("offset"), col("length"))
      .repartition(col("filename"))
      .sortWithinPartitions(col("filename"), col("offset"))
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
        rows.flatMap { r =>
          switchTo(r.getString(0))
          val off = r.getLong(1)
          val len = r.getLong(2)
          require(len > 0 && len <= Int.MaxValue, s"member length out of range: $len")
          val buf = new Array[Byte](len.toInt)
          in.readFully(off, buf) // positioned read: exactly the member
          Warc.parseRecords(Warc.inflateMemberBytes(buf))
        }
      }
    spark.createDataFrame(rdd, Warc.schema)
  }
}
