package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{CRC32, Deflater, Inflater}

/** WARC/WET (web-crawl archive, ISO 28500) source — the crawl-format
  * reader in front of the web-curation pipeline (WebCurate / markup
  * strip / pipelineWebCurate): CommonCrawl and every crawler that
  * follows the spec deliver `.warc.gz` / `.wet.gz` files whose records
  * are each their own gzip MEMBER. That layout is the spec's explicit
  * scale affordance: a reader can start at ANY byte offset, resync to
  * the next member boundary, and inflate independently — so one 1 GB
  * crawl file parallelizes across tasks without any index.
  *
  * Design (all public knowledge: ISO 28500 / gzip RFC 1952):
  *   - the driver lists files and cuts byte-range splits of
  *     `maxSplitBytes`; each task owns the members whose compressed
  *     START lies in [start, end) — the same ownership convention as
  *     Hadoop's FileInputFormat, so every record is read exactly once;
  *   - resync scans for the gzip magic (1f 8b 08) and VALIDATES each
  *     candidate by parsing the member header and inflating a prefix
  *     that must read "WARC/" — compressed bytes can contain the magic
  *     by chance, so the scan must prove a candidate before trusting it;
  *   - members inflate via a raw `Inflater` (not GZIPInputStream, whose
  *     readahead buffering loses the exact compressed position needed
  *     for split accounting); `Inflater.getBytesRead` gives the exact
  *     member length, positioning the scan at the next member with no
  *     second pass;
  *   - WARC named fields parse from the inflated record: Target-URI,
  *     Date (→ TimestampType), Type, Content-Type, Content-Length →
  *     payload bytes.
  *
  * The writer emits the same one-record-per-member layout (each record
  * deflated as an independent gzip member, members concatenated), so
  * fixtures written here exercise the identical resync path CommonCrawl
  * files would. */
object Warc {

  val schema: StructType = StructType(Seq(
    StructField("url", StringType, nullable = true), // warcinfo records carry none
    StructField("ts", TimestampType, nullable = true),
    StructField("record_type", StringType, nullable = false),
    StructField("content_type", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** Largest decompressed record accepted (fail-loud guard: a corrupt
    * length or a hostile file must not OOM an executor). */
  val MaxRecordBytes: Int = 256 << 20

  // ---- read ------------------------------------------------------------

  /** Distributed, splittable scan of `.warc.gz`/`.wet.gz` under `path`
    * (a directory, a single file, or a glob). `maxSplitBytes` bounds
    * per-task input — at 100 TB the default cuts ~800k independent
    * splits, each resyncing locally; no driver-side byte ever moves. */
  def read(spark: SparkSession, path: String,
           maxSplitBytes: Long = 128L << 20): DataFrame = {
    require(maxSplitBytes >= (1L << 16), s"maxSplitBytes too small: $maxSplitBytes")
    val splits = planSplits(spark, path, maxSplitBytes)
    // broadcast: the conf map is hundreds of entries — shipping it in
    // every task closure at ~800k splits would serialize it 800k times
    val confBc = spark.sparkContext.broadcast(serializableConf(spark))
    val rdd = spark.sparkContext
      .parallelize(splits, math.max(1, splits.size))
      .flatMap { case (file, start, end) =>
        val conf = new Configuration(false)
        confBc.value.foreach { case (k, v) => conf.set(k, v) }
        readSplit(conf, file, start, end)
      }
    spark.createDataFrame(rdd, schema)
  }

  /** WET convenience: conversion records as (url, ts, text) — the shape
    * [[graft.queries.Ext.pipelineWebCurate]] consumes. */
  def readWet(spark: SparkSession, path: String,
              maxSplitBytes: Long = 128L << 20): DataFrame =
    read(spark, path, maxSplitBytes)
      .filter(col("record_type") === "conversion" || col("record_type") === "response")
      .select(col("url"), col("ts"),
        decode(col("payload"), "UTF-8").as("text"))

  // ---- write -----------------------------------------------------------

  /** Write `df` (url, ts, record_type, content_type, payload) as
    * `numShards` `.warc.gz` files, one gzip member per record —
    * the spec's splittable layout, so written corpora re-read in
    * parallel. Overwrite semantics like the other graft sinks. */
  def write(df: DataFrame, dir: String, numShards: Int): Unit = {
    require(numShards > 0, "numShards must be positive")
    val cols = Seq("url", "ts", "record_type", "content_type", "payload")
    cols.foreach(c => require(df.columns.contains(c), s"write needs column $c"))
    // optional revisit linkage: `refers_to_url`/`refers_to_ts` columns
    // emit the spec's WARC-Refers-To-Target-URI / WARC-Refers-To-Date
    // headers (how CommonCrawl's dedup points a `revisit` record at the
    // capture holding the payload)
    val hasRefers = df.columns.contains("refers_to_url") &&
      df.columns.contains("refers_to_ts")
    val allCols = if (hasRefers) cols ++ Seq("refers_to_url", "refers_to_ts") else cols
    val spark = df.sparkSession
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    fs.mkdirs(p)
    val confBc = spark.sparkContext.broadcast(serializableConf(spark))
    val dirStr = dir
    df.select(allCols.map(col): _*).repartition(numShards).rdd
      .mapPartitionsWithIndex { (pid, rows) =>
        if (!rows.hasNext) Iterator.empty
        else {
        val conf = new Configuration(false)
        confBc.value.foreach { case (k, v) => conf.set(k, v) }
        val outPath = new Path(dirStr, f"part-$pid%05d.warc.gz")
        val out = outPath.getFileSystem(conf).create(outPath, true)
        try rows.foreach { r =>
          val url = if (r.isNullAt(0)) null else r.getString(0)
          val ts = if (r.isNullAt(1)) null else r.getTimestamp(1)
          val rtype = r.getString(2)
          val ctype = if (r.isNullAt(3)) null else r.getString(3)
          val payload = r.getAs[Array[Byte]](4)
          val rUrl = if (hasRefers && !r.isNullAt(5)) r.getString(5) else null
          val rTs = if (hasRefers && !r.isNullAt(6)) r.getTimestamp(6) else null
          out.write(gzipMember(recordBytes(url, ts, rtype, ctype, payload, rUrl, rTs)))
        } finally out.close()
        Iterator.empty
        }
      }
      .count() // force the write
  }

  /** One WARC record, ISO 28500 layout: version line, named fields,
    * blank line, payload, two CRLFs. */
  private[graft] def recordBytes(url: String, ts: java.sql.Timestamp,
                                   recordType: String, contentType: String,
                                   payload: Array[Byte],
                                   refersToUrl: String = null,
                                   refersToTs: java.sql.Timestamp = null): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.0\r\n")
    sb.append(s"WARC-Type: $recordType\r\n")
    if (url != null) sb.append(s"WARC-Target-URI: $url\r\n")
    if (ts != null)
      sb.append(s"WARC-Date: ${java.time.format.DateTimeFormatter.ISO_INSTANT
        .format(ts.toInstant.truncatedTo(java.time.temporal.ChronoUnit.SECONDS))}\r\n")
    if (refersToUrl != null) sb.append(s"WARC-Refers-To-Target-URI: $refersToUrl\r\n")
    if (refersToTs != null)
      sb.append(s"WARC-Refers-To-Date: ${java.time.format.DateTimeFormatter.ISO_INSTANT
        .format(refersToTs.toInstant.truncatedTo(java.time.temporal.ChronoUnit.SECONDS))}\r\n")
    if (contentType != null) sb.append(s"Content-Type: $contentType\r\n")
    sb.append(s"Content-Length: ${payload.length}\r\n\r\n")
    val head = sb.toString.getBytes(UTF_8)
    val out = new Array[Byte](head.length + payload.length + 4)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(payload, 0, out, head.length, payload.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** One complete gzip member (RFC 1952: 10-byte header FLG=0, raw
    * deflate body, CRC32 + ISIZE trailer). */
  private[graft] def gzipMember(bytes: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(bytes.length / 2 + 64)
    out.write(Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0))
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(bytes); d.finish()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    val crc = new CRC32(); crc.update(bytes)
    def le32(v: Long): Unit = { var i = 0; while (i < 4) { out.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 } }
    le32(crc.getValue); le32(bytes.length.toLong & 0xffffffffL)
    out.toByteArray
  }

  // ---- split planning --------------------------------------------------

  private[sources] def planSplits(spark: SparkSession, path: String,
                         maxSplitBytes: Long): Seq[(String, Long, Long)] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val statuses =
      if (path.exists("*?[".contains(_))) fs.globStatus(p).toSeq
      else {
        val st = fs.getFileStatus(p)
        if (st.isDirectory)
          fs.listStatus(p).toSeq.filter(s => s.isFile &&
            (s.getPath.getName.endsWith(".warc.gz") || s.getPath.getName.endsWith(".wet.gz")))
        else Seq(st)
      }
    require(statuses.nonEmpty, s"no WARC files under $path")
    statuses.sortBy(_.getPath.toString).flatMap { st =>
      val len = st.getLen
      val n = math.max(1L, (len + maxSplitBytes - 1) / maxSplitBytes)
      (0L until n).map(i =>
        (st.getPath.toString, i * maxSplitBytes, math.min((i + 1) * maxSplitBytes, len)))
    }
  }

  /** Hadoop Configuration is not serializable; ship its entries and
    * rebuild executor-side (keeps s3a credentials etc. working). */
  private[sources] def serializableConf(spark: SparkSession): Map[String, String] = {
    val it = spark.sparkContext.hadoopConfiguration.iterator()
    val b = Map.newBuilder[String, String]
    while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
    b.result()
  }

  // ---- split reading ---------------------------------------------------

  /** All records whose gzip member starts in [start, end). Every member
    * start is located via the validated scan — for back-to-back members
    * (the normal layout) the scan hits on its first candidate, so the
    * resync machinery doubles as cheap per-member validation. */
  private[graft] def readSplit(conf: Configuration, file: String,
                                 start: Long, end: Long): Iterator[Row] =
    readSplitMembers(conf, file, start, end).flatMap(m => parseRecords(m._3))

  /** The member-granular form of [[readSplit]]: each element is
    * (compressed member start, compressed member length, inflated
    * bytes). This is the index-construction seam — a CDX builder
    * ([[Cdx.build]]) records exactly these byte extents so a later
    * selective fetch can pread one member without any resync scan. */
  private[graft] def readSplitMembers(conf: Configuration, file: String,
                                      start: Long, end: Long): Iterator[(Long, Long, Array[Byte])] = {
    val path = new Path(file)
    val fs = path.getFileSystem(conf)
    val len = fs.getFileStatus(path).getLen
    val in = fs.open(path)
    // a consumer may abandon the iterator early (limit/take/row-level
    // failure) — close with the TASK, not only on full drain, or every
    // abandoned split leaks a file handle on long-lived executors
    val tc = org.apache.spark.TaskContext.get()
    if (tc != null) tc.addTaskCompletionListener[Unit] { _ =>
      try in.close() catch { case _: Exception => () }
    }
    val reader = new MemberReader(in, len)
    var pos = reader.findMember(start, end)
    new Iterator[(Long, Long, Array[Byte])] {
      private var nextMember: (Long, Long, Array[Byte]) = null
      private var done = false
      private def advance(): Unit = {
        while (nextMember == null && !done) {
          if (pos < 0 || pos >= end || pos >= len) { done = true; in.close() }
          else reader.inflateMember(pos) match {
            case Some((bytes, nextPos)) =>
              nextMember = (pos, nextPos - pos, bytes)
              pos = if (nextPos >= end) -1L else reader.findMember(nextPos, end)
            case None =>
              // validated candidate still failed full inflation (corrupt
              // large record, or magic inside compressed data whose
              // prefix also inflated to "WARC/") — resync strictly past
              // it; the window repositions backwards via pread if the
              // failed inflation slid it ahead
              pos = reader.findMember(pos + 1, end)
          }
        }
      }
      override def hasNext: Boolean = { advance(); nextMember != null }
      override def next(): (Long, Long, Array[Byte]) = {
        advance()
        val m = nextMember; nextMember = null; m
      }
    }
  }

  /** Inflate ONE complete gzip member handed over as exact bytes (the
    * CDX fetch path: the index supplies [offset, offset+length) so the
    * caller preads precisely this slice — no scan, no resync). RFC 1952
    * header parse + raw inflate, same [[MaxRecordBytes]] guard as the
    * streaming reader. */
  private[graft] def inflateMemberBytes(bytes: Array[Byte]): Array[Byte] = {
    require(bytes.length > 10 && (bytes(0) & 0xff) == 0x1f &&
      (bytes(1) & 0xff) == 0x8b && bytes(2) == 8,
      s"not a gzip member (${bytes.length} bytes) — stale or misaligned CDX entry?")
    val flg = bytes(3) & 0xff
    var h = 10
    if ((flg & 4) != 0) { val xlen = (bytes(h) & 0xff) | ((bytes(h + 1) & 0xff) << 8); h += 2 + xlen }
    if ((flg & 8) != 0) { while (bytes(h) != 0) h += 1; h += 1 }  // FNAME
    if ((flg & 16) != 0) { while (bytes(h) != 0) h += 1; h += 1 } // FCOMMENT
    if ((flg & 2) != 0) h += 2                                    // FHCRC
    val inf = new Inflater(true)
    inf.setInput(bytes, h, bytes.length - h)
    val out = new ByteArrayOutputStream(math.min(bytes.length * 4, 1 << 20))
    val chunk = new Array[Byte](64 << 10)
    try {
      while (!inf.finished()) {
        val r = inf.inflate(chunk)
        if (r > 0) {
          out.write(chunk, 0, r)
          if (out.size() > MaxRecordBytes)
            throw new IllegalStateException(
              s"gzip member exceeds $MaxRecordBytes inflated bytes")
        } else if (inf.needsInput() || inf.needsDictionary())
          throw new java.util.zip.DataFormatException(
            "truncated gzip member — CDX length shorter than the member")
      }
    } finally inf.end()
    out.toByteArray
  }

  /** Buffered window over one open file + gzip member operations. Reads
    * are positioned (pread), so the window can reposition ANYWHERE —
    * including backwards, which the resync path needs after a large
    * failed inflation slid the window past the failure point. ALL
    * offset arithmetic is Long-safe: a multi-GiB crawl file must not
    * overflow Int anywhere (offsets routinely exceed 2^31). */
  private final class MemberReader(in: org.apache.hadoop.fs.FSDataInputStream,
                                   fileLen: Long) {
    private var bufStart = 0L
    private var buf = new Array[Byte](0)
    private var bufLen = 0

    /** Ensure [absPos, absPos+n) is buffered (clamped to EOF); returns
      * available bytes from absPos. */
    private def ensure(absPos: Long, n: Int): Int = {
      if (absPos < bufStart) { bufLen = 0; bufStart = absPos } // reposition (pread makes it safe)
      if (absPos + n <= bufStart + bufLen)
        return math.min(n.toLong, bufStart + bufLen - absPos).toInt
      // slide: drop bytes before absPos, then fill. keepFrom fits Int:
      // it is < bufLen (an Int) whenever kept > 0.
      val keepFromL = absPos - bufStart
      val kept = if (keepFromL >= bufLen) 0 else (bufLen - keepFromL).toInt
      val want = math.min(n.toLong, fileLen - absPos).toInt
      if (want <= 0) return math.max(0, kept)
      val cap = math.max(want, 1 << 20)
      val nb = if (buf.length >= cap) buf else new Array[Byte](cap)
      if (kept > 0) System.arraycopy(buf, keepFromL.toInt, nb, 0, kept)
      buf = nb; bufStart = absPos; bufLen = kept
      while (bufLen < want) {
        val remainingL = fileLen - bufStart - bufLen
        val r = in.read(bufStart + bufLen, buf, bufLen,
          math.min(buf.length - bufLen.toLong, remainingL).toInt)
        if (r <= 0) return bufLen
        bufLen += r
      }
      math.min(want, bufLen)
    }

    private def byteAt(absPos: Long): Int = buf((absPos - bufStart).toInt) & 0xff

    /** Smallest validated member start in [from, end); -1 if none. A
      * candidate's START must be < end, but its magic/header/probe bytes
      * may extend past end — splits deliberately overshoot their range
      * to finish boundary members, exactly like FileInputFormat readers. */
    def findMember(from: Long, end: Long): Long = {
      var p = from
      while (p < end && p + 3 <= fileLen) {
        val avail = ensure(p, 1 << 16)
        if (avail < 3) return -1L
        // scan the buffered window for the magic; candidate start < end
        var i = (p - bufStart).toInt
        val scanLimit = (math.min(bufStart + bufLen.toLong, end) - bufStart).toInt
        var found = -1L
        while (found < 0 && i < scanLimit && i + 2 < bufLen) {
          if ((buf(i) & 0xff) == 0x1f && (buf(i + 1) & 0xff) == 0x8b && buf(i + 2) == 8)
            found = bufStart + i
          else i += 1
        }
        found match {
          case -1L =>
            // no magic in window; resume at window end minus overlap (a
            // magic can straddle the window edge)
            val windowEnd = bufStart + bufLen
            if (windowEnd >= end + 2 || windowEnd >= fileLen) return -1L
            p = windowEnd - 2
          case q =>
            if (validate(q)) return q
            p = q + 1
        }
      }
      -1L
    }

    /** Cheap proof: member header parses and the inflated prefix reads
      * "WARC/". All ensures anchor at p so the window never slides past
      * the member start (ensure is forward-only). */
    private def validate(p: Long): Boolean =
      try {
        val h = headerLen(p)
        val avail = ensure(p, h + (1 << 15))
        val probe = avail - h
        if (probe <= 0) return false
        val inf = new Inflater(true)
        inf.setInput(buf, (p + h - bufStart).toInt, probe)
        val out = new Array[Byte](5)
        var got = 0
        var stuck = false
        while (got < 5 && !inf.finished() && !stuck) {
          val r = inf.inflate(out, got, 5 - got)
          if (r == 0) stuck = true else got += r
        }
        inf.end()
        got == 5 && out.sameElements("WARC/".getBytes(UTF_8))
      } catch { case _: Exception => false }

    /** RFC 1952 header length at p (magic assumed checked). Anchored
      * ensures: the buffer keeps p in-window throughout. */
    private def headerLen(p: Long): Int = {
      var need = 1 << 12
      ensure(p, need)
      def at(off: Int): Int = {
        if (off >= need) { need = math.max(need * 2, off + 1); ensure(p, need) }
        byteAt(p + off)
      }
      val flg = at(3)
      var h = 10
      if ((flg & 4) != 0) { // FEXTRA
        val xlen = at(h) | (at(h + 1) << 8)
        h += 2 + xlen
      }
      if ((flg & 8) != 0) { while (at(h) != 0) h += 1; h += 1 } // FNAME
      if ((flg & 16) != 0) { while (at(h) != 0) h += 1; h += 1 } // FCOMMENT
      if ((flg & 2) != 0) h += 2 // FHCRC
      h
    }

    /** Inflate the whole member at p. Some((bytes, posAfterMember)) or
      * None if it does not inflate cleanly (false positive). */
    def inflateMember(p: Long): Option[(Array[Byte], Long)] =
      try {
        val h = headerLen(p)
        val inf = new Inflater(true)
        val out = new ByteArrayOutputStream(64 << 10)
        val chunk = new Array[Byte](64 << 10)
        var feedPos = p + h
        // first fill anchors at p (keeps header in-window); later fills
        // slide freely — the member start is no longer needed
        var avail = ensure(p, h + (1 << 20)) - h
        var ok = avail > 0
        if (ok) {
          inf.setInput(buf, (feedPos - bufStart).toInt, avail)
          feedPos += avail
        }
        while (ok && !inf.finished()) {
          if (inf.needsInput()) {
            avail = ensure(feedPos, 1 << 20)
            if (avail <= 0) ok = false
            else {
              inf.setInput(buf, (feedPos - bufStart).toInt, avail)
              feedPos += avail
            }
          }
          if (ok) {
            val r = inf.inflate(chunk)
            if (r > 0) {
              out.write(chunk, 0, r)
              if (out.size() > MaxRecordBytes)
                throw new IllegalStateException(
                  s"WARC member at $p exceeds $MaxRecordBytes inflated bytes")
            } else if (!inf.finished() && !inf.needsInput() && inf.needsDictionary()) ok = false
          }
        }
        val res =
          if (!ok) None
          else {
            val memberEnd = p + h + inf.getBytesRead + 8 // CRC32 + ISIZE
            Some((out.toByteArray, memberEnd))
          }
        inf.end()
        res
      } catch { case _: java.util.zip.DataFormatException => None }
  }

  // ---- record parsing --------------------------------------------------

  /** Parse the (possibly several) WARC records in one inflated member. */
  private[graft] def parseRecords(member: Array[Byte]): Iterator[Row] =
    parseRecordsWithRefers(member).map(_._1)

  /** [[parseRecords]] plus each record's revisit linkage —
    * (row, WARC-Refers-To-Target-URI, WARC-Refers-To-Date), both null
    * when the headers are absent. The resolution path
    * ([[Cdx.fetchResolved]]) needs them; the plain read schema stays
    * six columns. */
  private[graft] def parseRecordsWithRefers(member: Array[Byte])
      : Iterator[(Row, String, java.sql.Timestamp)] = {
    var pos = 0
    val out = scala.collection.mutable.ArrayBuffer.empty[(Row, String, java.sql.Timestamp)]
    while (pos < member.length) {
      // skip inter-record CRLFs
      while (pos < member.length && (member(pos) == '\r' || member(pos) == '\n')) pos += 1
      if (pos >= member.length) return out.iterator
      val headEnd = indexOfDoubleCrlf(member, pos)
      require(headEnd > 0, s"WARC record at $pos has no header terminator")
      val head = new String(member, pos, headEnd - pos, UTF_8)
      val lines = head.split("\r\n")
      require(lines.nonEmpty && lines(0).startsWith("WARC/"),
        s"not a WARC record header: ${lines.headOption.getOrElse("")}")
      var url: String = null
      var ts: java.sql.Timestamp = null
      var rtype: String = ""
      var ctype: String = null
      var clen: Long = -1L
      var refUrl: String = null
      var refTs: java.sql.Timestamp = null
      lines.drop(1).foreach { line =>
        val i = line.indexOf(':')
        if (i > 0) {
          val k = line.substring(0, i).trim.toLowerCase
          val v = line.substring(i + 1).trim
          k match {
            case "warc-target-uri" => url = v
            case "warc-date" =>
              ts = java.sql.Timestamp.from(java.time.Instant.parse(v))
            case "warc-type" => rtype = v
            case "content-type" => ctype = v
            case "content-length" => clen = v.toLong
            case "warc-refers-to-target-uri" => refUrl = v
            case "warc-refers-to-date" =>
              refTs = java.sql.Timestamp.from(java.time.Instant.parse(v))
            case _ => ()
          }
        }
      }
      require(clen >= 0, "WARC record missing Content-Length")
      val payloadStart = headEnd + 4
      require(payloadStart + clen <= member.length,
        s"WARC Content-Length $clen overruns member (${member.length} bytes)")
      val payload = java.util.Arrays.copyOfRange(member, payloadStart, payloadStart + clen.toInt)
      out += ((Row(url, ts, rtype, ctype, clen, payload), refUrl, refTs))
      pos = payloadStart + clen.toInt
    }
    out.iterator
  }

  private def indexOfDoubleCrlf(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }
}
