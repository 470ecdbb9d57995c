package graft

import graft.sources.{Cdx, Warc}
import org.apache.spark.sql.functions._

/** CDX index semantics: SURT keys, EXACT member extents (the whole
  * point — a fetch preads precisely the member), the published CDXJ
  * text round-trip incl. a hand-built line, and the selective fetch
  * equal to the full-sweep filter. */
class CdxSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(n: Int, dir: String, shards: Int = 2): Unit = {
    val recs = (1 to n).map { i =>
      (s"https://site${i % 3}.example/page/$i",
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1700000000L + i)),
        "conversion", "text/plain",
        (s"payload body $i " + ("x" * (i % 50))).getBytes("UTF-8"))
    }.toDF("url", "ts", "record_type", "content_type", "payload")
    Warc.write(recs, dir, numShards = shards)
  }

  test("surt: lowercased, host labels reversed, port stripped, path kept") {
    assert(Cdx.surt("https://Corpus.Example/Doc/5?Q=1") === "example,corpus)/doc/5?q=1")
    assert(Cdx.surt("http://a.b.c.example.org:8080/x") === "org,example,c,b,a)/x")
    assert(Cdx.surt("https://example.org") === "org,example)/")
  }

  test("build records EXACT member extents: preading [offset, offset+length) " +
    "inflates to the indexed record, and extents tile each file completely") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cdx_build").toString + "/warc"
    fixture(40, dir)
    val idx = Cdx.build(spark, dir, maxSplitBytes = 1 << 16).collect()
    assert(idx.length === 40)
    val conf = spark.sparkContext.hadoopConfiguration
    // per file: extents are disjoint, back-to-back, and cover the file
    idx.groupBy(_.getString(3)).foreach { case (name, rows) =>
      val p = new org.apache.hadoop.fs.Path(dir, name)
      val fs = p.getFileSystem(conf)
      val fileLen = fs.getFileStatus(p).getLen
      val extents = rows.map(r => (r.getLong(4), r.getLong(5))).sortBy(_._1)
      assert(extents.head._1 === 0L)
      extents.sliding(2).foreach {
        case Array((o1, l1), (o2, _)) => assert(o1 + l1 === o2, "members must tile")
        case _ => ()
      }
      val (lo, ll) = extents.last
      assert(lo + ll === fileLen, "last member must end at EOF")
      // pread one member and check it inflates to the indexed url
      val probe = rows.head
      val in = fs.open(p)
      val buf = new Array[Byte](probe.getLong(5).toInt)
      try in.readFully(probe.getLong(4), buf) finally in.close()
      val rec = Warc.parseRecords(Warc.inflateMemberBytes(buf)).next()
      assert(rec.getString(0) === probe.getString(2))
    }
  }

  test("CDXJ write/read round-trip: fields survive, lines are (urlkey, ts)-sorted") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cdxj").toString
    fixture(25, s"$dir/warc")
    val built = Cdx.build(spark, s"$dir/warc", maxSplitBytes = 1 << 16)
    Cdx.writeCdxj(built, s"$dir/idx", numShards = 2)
    val back = Cdx.readCdxj(spark, s"$dir/idx")
    val a = built.orderBy("urlkey", "ts").collect().map(_.toSeq)
    val b = back.orderBy("urlkey", "ts").collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
    // each shard's lines are sorted (the binary-search invariant)
    val files = new java.io.File(s"$dir/idx").listFiles().filter(_.getName.endsWith(".cdxj"))
    assert(files.nonEmpty)
    files.foreach { f =>
      val keys = scala.io.Source.fromFile(f).getLines()
        .map(l => (l.split(" ", 3)(0), l.split(" ", 3)(1))).toSeq
      assert(keys === keys.sorted, s"${f.getName} must be sorted")
    }
  }

  test("a hand-built published-format CDXJ line parses: string offset/length, ts14, mime") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cdxj_hand").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/hand.cdxj"),
      "org,example)/page 20240101120000 {\"url\": \"https://example.org/page\", " +
        "\"filename\": \"crawl-00001.warc.gz\", \"offset\": \"12345\", " +
        "\"length\": \"678\", \"mime\": \"text/html\", \"record_type\": \"response\"}\n" +
        "org,example)/x - {\"url\": \"https://example.org/x\", " +
        "\"filename\": \"crawl-00001.warc.gz\", \"offset\": \"0\", \"length\": \"1\", " +
        "\"record_type\": \"warcinfo\"}\n")
    val rows = Cdx.readCdxj(spark, dir).orderBy("urlkey").collect()
    assert(rows.length === 2)
    assert(rows(0).getString(0) === "org,example)/page")
    assert(rows(0).getTimestamp(1).toInstant.toString === "2024-01-01T12:00:00Z")
    assert(rows(0).getLong(4) === 12345L && rows(0).getLong(5) === 678L)
    assert(rows(0).getString(6) === "text/html")
    assert(rows(1).isNullAt(1), "'-' timestamp must parse to null")
  }

  test("lookupPrefix: binary search over sorted shards == full-scan filter for EVERY host; " +
    "first/last keys and absent prefixes behave") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cdx_lkp").toString
    fixture(80, s"$dir/warc", shards = 3)
    val built = Cdx.build(spark, s"$dir/warc", maxSplitBytes = 1 << 16)
    Cdx.writeCdxj(built, s"$dir/idx", numShards = 3)
    val full = Cdx.readCdxj(spark, s"$dir/idx")
    // every host: the searched range must equal the scanned filter
    Seq("site0", "site1", "site2").foreach { host =>
      val prefix = s"example,$host)"
      val got = Cdx.lookupPrefix(spark, s"$dir/idx", prefix)
        .select("urlkey", "offset").orderBy("urlkey", "offset")
        .collect().map(_.toSeq)
      val want = full.filter(col("urlkey").startsWith(prefix))
        .select("urlkey", "offset").orderBy("urlkey", "offset")
        .collect().map(_.toSeq)
      assert(got.nonEmpty && got.toSeq === want.toSeq, s"prefix $prefix")
    }
    // boundary prefixes: before-everything and after-everything find nothing
    assert(Cdx.lookupPrefix(spark, s"$dir/idx", "aaaa").count() === 0)
    assert(Cdx.lookupPrefix(spark, s"$dir/idx", "zzzz").count() === 0)
    // a prefix that is an exact full key still matches that one line
    val oneKey = full.orderBy("urlkey").limit(1).collect()(0).getString(0)
    assert(Cdx.lookupPrefix(spark, s"$dir/idx", oneKey).count() >= 1)
    // composes with fetch: lookup one host, pread those members only
    val got = Cdx.fetch(spark,
        Cdx.lookupPrefix(spark, s"$dir/idx", "example,site2)"), s"$dir/warc")
      .select("url").orderBy("url").collect().map(_.getString(0)).toSeq
    val want = Warc.read(spark, s"$dir/warc", maxSplitBytes = 1 << 16)
      .filter(col("url").startsWith("https://site2.example/"))
      .select("url").orderBy("url").collect().map(_.getString(0)).toSeq
    assert(got === want)
  }

  test("byteSuccessor: bump last non-0xFF byte, truncate tail; all-0xFF has none") {
    def s(a: Array[Byte]) = Cdx.byteSuccessor(a).map(_.toSeq)
    assert(s("abc".getBytes("UTF-8")) === Some("abd".getBytes("UTF-8").toSeq))
    assert(s(Array('a'.toByte, 0xff.toByte)) === Some(Seq('b'.toByte)))
    assert(s(Array(0xff.toByte, 0xff.toByte)) === None)
    assert(s(Array(0xfe.toByte)) === Some(Seq(0xff.toByte)))
  }

  test("lookupPrefix compares unsigned UTF-8 bytes: non-ASCII keys (incl. the " +
    "UTF-16/UTF-8 order divergence above U+FFFF) are found, never silently missed") {
    // UTF-8 byte order: 'a' (61) < é (C3A9) < U+FFFD (EFBFBD) < U+10348 (F0908D88).
    // Java String (UTF-16) order SWAPS the last two (D800 surrogate < FFFD), so a
    // string-comparing search probes the wrong half of the file for the last key.
    val keys = Seq(
      "org,example)/a", "org,example)/é",
      "org,example)/�", "org,example)/" + new String(Character.toChars(0x10348)))
    val dir = java.nio.file.Files.createTempDirectory("graft_cdx_nonascii").toString
    val body = keys.zipWithIndex.map { case (k, i) =>
      s"""$k 2024010100000$i {"url": "https://x/$i", "filename": "f.warc.gz", """ +
        s""""offset": "$i", "length": "1", "record_type": "response"}"""
    }.mkString("", "\n", "\n")
    // sanity: the fixture really is sorted in UTF-8 byte order and NOT in UTF-16 order
    assert(keys != keys.sorted, "fixture must expose the UTF-16/UTF-8 divergence")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/p.cdxj"),
      body.getBytes("UTF-8"))
    keys.zipWithIndex.foreach { case (k, i) =>
      val got = Cdx.lookupPrefix(spark, dir, k).collect()
      assert(got.length === 1 && got(0).getLong(4) === i.toLong, s"key #$i $k")
    }
    // prefix covering all four
    assert(Cdx.lookupPrefix(spark, dir, "org,example)/").count() === 4)
  }

  test("lookupPrefix ts14 range + exact mode: inclusive bounds, extended keys " +
    "filtered in prefix mode, excluded in exact mode") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cdx_ts").toString
    // one exact key with four captures + an extension key interleaving in time
    val lines = Seq(
      """com,site)/page 20240101000000 {"url": "https://site.com/page", "filename": "f", "offset": "0", "length": "1", "record_type": "response"}""",
      """com,site)/page 20240201000000 {"url": "https://site.com/page", "filename": "f", "offset": "1", "length": "1", "record_type": "response"}""",
      """com,site)/page 20240301000000 {"url": "https://site.com/page", "filename": "f", "offset": "2", "length": "1", "record_type": "response"}""",
      """com,site)/page 20240401000000 {"url": "https://site.com/page", "filename": "f", "offset": "3", "length": "1", "record_type": "response"}""",
      """com,site)/page/sub 20240215000000 {"url": "https://site.com/page/sub", "filename": "f", "offset": "4", "length": "1", "record_type": "response"}""")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/p.cdxj"),
      lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    def offs(df: org.apache.spark.sql.DataFrame) =
      df.select("offset").collect().map(_.getLong(0)).sorted.toSeq
    // prefix mode + range: exact-key captures 2,3 (Feb 1 .. Mar 1 inclusive)
    // AND the extension's Feb 15 capture — from/to applies to every match
    assert(offs(Cdx.lookupPrefix(spark, dir, "com,site)/page",
      from14 = Some("20240201000000"), to14 = Some("20240301000000"))) === Seq(1L, 2L, 4L))
    // exact mode: extension key excluded entirely
    assert(offs(Cdx.lookupPrefix(spark, dir, "com,site)/page",
      from14 = Some("20240201000000"), to14 = Some("20240301000000"),
      exact = true)) === Seq(1L, 2L))
    // inclusive boundaries: from == to == an existing capture
    assert(offs(Cdx.lookupPrefix(spark, dir, "com,site)/page",
      from14 = Some("20240401000000"), to14 = Some("20240401000000"))) === Seq(3L))
    // open-ended from / to
    assert(offs(Cdx.lookupPrefix(spark, dir, "com,site)/page",
      from14 = Some("20240301000001"))) === Seq(3L))
    assert(offs(Cdx.lookupPrefix(spark, dir, "com,site)/page",
      to14 = Some("20240131235959"), exact = true)) === Seq(0L))
    // empty range
    assert(Cdx.lookupPrefix(spark, dir, "com,site)/page",
      from14 = Some("20250101000000")).count() === 0)
    // exact mode without range == urlkey equality
    assert(offs(Cdx.lookupPrefix(spark, dir, "com,site)/page", exact = true))
      === Seq(0L, 1L, 2L, 3L))
  }

  test("lookupPrefix chunked range read: a matched range spanning many chunks " +
    "parses distributed and equals the full scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cdx_chunk").toString
    val n = 3000
    val sb = new StringBuilder
    (0 until n).foreach { i =>
      sb.append(f"com,load)/page/$i%06d 20240101000000 ")
        .append(f"""{"url": "https://load.com/page/$i%06d", "filename": "f.warc.gz", """)
        .append(f""""offset": "$i%d", "length": "1", "mime": "text/html", "record_type": "response"}%n""")
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/p.cdxj"),
      sb.toString.getBytes("UTF-8"))
    val fileLen = new java.io.File(s"$dir/p.cdxj").length()
    assert(fileLen > 3L * (1 << 16), "fixture must span several 64 KB chunks")
    val got = Cdx.lookupPrefix(spark, dir, "com,load)/", maxChunkBytes = 1 << 16)
      .select("offset").collect().map(_.getLong(0)).sorted.toSeq
    assert(got === (0L until n.toLong))
    // a narrower prefix inside the big file still lands exactly
    val sub = Cdx.lookupPrefix(spark, dir, "com,load)/page/000777",
      maxChunkBytes = 1 << 16).collect()
    assert(sub.length === 1 && sub(0).getLong(4) === 777L)
  }

  test("readCdxj parses ts14 as UTC regardless of the session timezone") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cdx_tz").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/p.cdxj"),
      "org,example)/tz 20240101120000 {\"url\": \"https://example.org/tz\", " +
        "\"filename\": \"f\", \"offset\": \"0\", \"length\": \"1\", " +
        "\"record_type\": \"response\"}\n")
    // isolated session state: same SparkContext, different SQLConf
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.session.timeZone", "America/New_York")
    val row = Cdx.readCdxj(s2, dir).collect()(0)
    assert(row.getTimestamp(1).toInstant.toString === "2024-01-01T12:00:00Z")
  }

  test("fetch is member-granular: a multi-record member fetches once even when " +
    "several of its records are selected") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cdx_multi").toString + "/warc"
    new java.io.File(dir).mkdirs()
    def rec(url: String, payload: String): Array[Byte] = {
      val body = payload.getBytes("UTF-8")
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $url\r\n" +
        s"WARC-Date: 2024-01-01T00:00:00Z\r\nContent-Type: text/plain\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n").getBytes("UTF-8") ++
        body ++ "\r\n\r\n".getBytes("UTF-8")
    }
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close(); bos.toByteArray
    }
    // member 1: TWO records in one gzip member (nonstandard but legal);
    // member 2: a normal single-record member
    val f = java.nio.file.Paths.get(dir, "m.warc.gz")
    java.nio.file.Files.write(f,
      gz(rec("https://m.example/r1", "one") ++ rec("https://m.example/r2", "two")) ++
        gz(rec("https://m.example/r3", "three")))
    val idx = Cdx.build(spark, dir, maxSplitBytes = 1 << 16)
    assert(idx.count() === 3) // every record indexed, multi-member rows share an extent
    assert(idx.select("filename", "offset", "length").distinct().count() === 2)
    // select ALL THREE index rows: the multi member must fetch ONCE -> 3 records
    val all = Cdx.fetch(spark, idx, dir).select("url").collect().map(_.getString(0)).sorted
    assert(all.toSeq === Seq("https://m.example/r1", "https://m.example/r2",
      "https://m.example/r3"))
    // selecting ONE record of the multi member yields that member's full set (2)
    val one = Cdx.fetch(spark, idx.filter(col("url") === "https://m.example/r1"), dir)
      .select("url").collect().map(_.getString(0)).sorted
    assert(one.toSeq === Seq("https://m.example/r1", "https://m.example/r2"))
  }

  test("fetch with a tiny per-task byte band (intra-file fan-out) == default fetch") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cdx_salt").toString
    fixture(50, s"$dir/warc", shards = 2)
    val idx = Cdx.build(spark, s"$dir/warc", maxSplitBytes = 1 << 16)
    // 256-byte bands cut every file into many offset bands — the
    // fan-out path a single-archive selection takes at scale
    val a = Cdx.fetch(spark, idx, s"$dir/warc", maxBytesPerTask = 256L)
      .select("url", "content_length").orderBy("url").collect().map(_.toSeq)
    val b = Cdx.fetch(spark, idx, s"$dir/warc")
      .select("url", "content_length").orderBy("url").collect().map(_.toSeq)
    assert(a.length === 50 && a.toSeq === b.toSeq)
  }

  test("collapse: first capture per (urlkey, ts14 bucket); null-ts bucket, " +
    "deterministic ties, digit validation, non-UTC session refused") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cdx_clps").toString
    def line(key: String, ts14: String, off: Int, file: String = "f") =
      s"""$key $ts14 {"url": "https://x/$off", "filename": "$file", """ +
        s""""offset": "$off", "length": "1", "record_type": "response"}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/p.cdxj"),
      Seq(
        line("com,a)/", "20240101080000", 0), // day 1, first
        line("com,a)/", "20240101120000", 1), // day 1, later -> collapsed away
        line("com,a)/", "20240102080000", 2), // day 2
        line("com,a)/x", "20240101090000", 3), // different key, same day
        line("com,b)/", "-", 4),               // no ts: its own bucket
        line("com,b)/", "-", 5)                // second null-ts: collapsed away
      ).mkString("", "\n", "\n"))
    val idx = Cdx.readCdxj(spark, dir)
    val daily = Cdx.collapse(idx, 8).select("offset")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(daily === Seq(0L, 2L, 3L, 4L))
    // digits=14 keeps everything except exact-duplicate timestamps
    assert(Cdx.collapse(idx, 14).count() === 5) // the two "-" rows collapse
    // yearly
    assert(Cdx.collapse(idx, 4).select("offset")
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(0L, 3L, 4L))
    // tie on (urlkey, bucket, ts): deterministic by (filename, offset)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/q.cdxj"),
      Seq(line("org,t)/", "20240101080000", 7, "zzz"),
        line("org,t)/", "20240101080000", 6, "aaa")).mkString("", "\n", "\n"))
    val tied = Cdx.collapse(Cdx.readCdxj(spark, s"$dir/q.cdxj"), 8).collect()
    assert(tied.length === 1 && tied(0).getLong(4) === 6L, "tie -> (filename, offset) order")
    // invalid digits and non-UTC sessions fail loud
    intercept[IllegalArgumentException](Cdx.collapse(idx, 7))
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.session.timeZone", "America/New_York")
    val e = intercept[IllegalArgumentException](
      Cdx.collapse(Cdx.readCdxj(s2, dir), 8))
    assert(e.getMessage.contains("UTC"))
  }

  test("fetchResolved: revisit records carry the ORIGINAL capture's payload; " +
    "unresolvable and unlinked revisits pass through unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cdx_revisit").toString
    val t0 = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1700000000L))
    val t1 = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1700086400L))
    val tAbsent = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1600000000L))
    val none: Option[String] = None
    val noneTs: Option[java.sql.Timestamp] = None
    val recs = Seq(
      // originals
      ("https://r.example/a", t0, "response", "text/plain",
        "alpha body".getBytes("UTF-8"), none, noneTs),
      ("https://r.example/b", t0, "response", "text/plain",
        "beta body".getBytes("UTF-8"), none, noneTs),
      // linked revisit -> /a@t0
      ("https://r.example/a", t1, "revisit", null.asInstanceOf[String],
        Array.empty[Byte], Some("https://r.example/a"), Some(t0)),
      // revisit pointing OUTSIDE the index (different ts)
      ("https://r.example/b", t1, "revisit", null.asInstanceOf[String],
        Array.empty[Byte], Some("https://r.example/b"), Some(tAbsent)),
      // revisit with NO linkage headers at all
      ("https://r.example/c", t1, "revisit", null.asInstanceOf[String],
        Array.empty[Byte], none, noneTs)
    ).toDF("url", "ts", "record_type", "content_type", "payload",
      "refers_to_url", "refers_to_ts")
    Warc.write(recs, s"$dir/warc", numShards = 2)
    val idx = Cdx.build(spark, s"$dir/warc", maxSplitBytes = 1 << 16)
    assert(idx.count() === 5)
    val got = Cdx.fetchResolved(spark, idx, idx, s"$dir/warc")
      .select(col("url"), col("ts"), col("record_type"), col("content_type"),
        col("content_length"), decode(col("payload"), "UTF-8").as("text"))
      .orderBy("url", "ts").collect()
    assert(got.length === 5)
    // schema is exactly Warc.schema-shaped (no refers leakage)
    assert(Cdx.fetchResolved(spark, idx, idx, s"$dir/warc").columns.toSeq ===
      Warc.schema.fieldNames.toSeq)
    val byKey = got.map(r => (r.getString(0), r.getTimestamp(1).toInstant.getEpochSecond) ->
      (r.getString(2), r.getString(3), r.getLong(4), r.getString(5))).toMap
    // originals untouched
    assert(byKey(("https://r.example/a", 1700000000L)) ===
      (("response", "text/plain", 10L, "alpha body")))
    // linked revisit: original's payload/ctype/clen, own type kept
    assert(byKey(("https://r.example/a", 1700086400L)) ===
      (("revisit", "text/plain", 10L, "alpha body")))
    // unresolvable revisit: unchanged empty payload
    assert(byKey(("https://r.example/b", 1700086400L)) ===
      (("revisit", null, 0L, "")))
    // unlinked revisit: unchanged
    assert(byKey(("https://r.example/c", 1700086400L)) ===
      (("revisit", null, 0L, "")))
    // selecting ONLY revisits still resolves through the FULL index
    val onlyRev = Cdx.fetchResolved(spark,
        idx.filter(col("record_type") === "revisit"), idx, s"$dir/warc")
      .select(col("url"), decode(col("payload"), "UTF-8").as("text"))
      .orderBy("url").collect().map(r => (r.getString(0), r.getString(1)))
    assert(onlyRev.toSeq === Seq(("https://r.example/a", "alpha body"),
      ("https://r.example/b", ""), ("https://r.example/c", "")))
  }

  test("selective fetch == full-sweep filter; only the selected members are read; " +
    "a corrupt extent fails loud") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cdx_fetch").toString
    fixture(60, s"$dir/warc", shards = 3)
    val built = Cdx.build(spark, s"$dir/warc", maxSplitBytes = 1 << 16)
    Cdx.writeCdxj(built, s"$dir/idx")
    val index = Cdx.readCdxj(spark, s"$dir/idx")
    val wanted = index.filter(col("url").startsWith("https://site1.example/"))
    val got = Cdx.fetch(spark, wanted, s"$dir/warc")
      .select("url", "content_length").orderBy("url")
      .collect().map(_.toSeq)
    val want = Warc.read(spark, s"$dir/warc", maxSplitBytes = 1 << 16)
      .filter(col("url").startsWith("https://site1.example/"))
      .select("url", "content_length").orderBy("url")
      .collect().map(_.toSeq)
    assert(got.nonEmpty && got.toSeq === want.toSeq)
    // a misaligned offset must fail loud, never return a wrong record
    val corrupt = wanted.limit(1).withColumn("offset", col("offset") + 3)
    val e = intercept[org.apache.spark.SparkException] {
      Cdx.fetch(spark, corrupt, s"$dir/warc").collect()
    }
    assert(e.getMessage.contains("gzip") || Option(e.getCause).exists(
      _.getMessage.contains("gzip")))
  }

  test("digest: base32 payload SHA-1 in build, CDXJ round-trip, absent field null") {
    // RFC 4648 base32 of SHA-1("") and of a fixture payload — reference
    // vectors computed with an independent implementation
    assert(Cdx.sha1Base32(Array.emptyByteArray) === "3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ")
    // fixture record 1's payload is "payload body 1 x" (i%50 = one x)
    assert(Cdx.sha1Base32("payload body 1 x".getBytes("UTF-8")) ===
      "JEIXSENLWFJKTPVOKY2FI7CPTIYZIL5O")
    val dir = java.nio.file.Files.createTempDirectory("graft_cdx_digest").toString
    fixture(10, s"$dir/warc")
    val built = Cdx.build(spark, s"$dir/warc", maxSplitBytes = 1 << 16)
    val ds = built.select("digest").as[String].collect()
    assert(ds.length === 10 && ds.forall(d => d != null && d.length == 32 &&
      d.forall(c => (c >= 'A' && c <= 'Z') || (c >= '2' && c <= '7'))))
    assert(ds.distinct.length === 10, "distinct payloads -> distinct digests")
    // record 1's digest is the reference vector's payload
    val d1 = built.filter(col("url").endsWith("/page/1")).select("digest")
      .as[String].head()
    assert(d1 === "JEIXSENLWFJKTPVOKY2FI7CPTIYZIL5O")
    // text interchange round-trips the field
    Cdx.writeCdxj(built, s"$dir/idx", numShards = 2)
    val back = Cdx.readCdxj(spark, s"$dir/idx")
    assert(back.orderBy("urlkey", "ts").select("digest").as[String].collect().toSeq ===
      built.orderBy("urlkey", "ts").select("digest").as[String].collect().toSeq)
    // a line without the field (pre-digest index) parses to null
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/old.cdxj"),
      "org,example)/p 20240101000000 {\"url\": \"https://example.org/p\", " +
        "\"filename\": \"f\", \"offset\": \"0\", \"length\": \"1\", " +
        "\"record_type\": \"response\"}\n")
    assert(Cdx.readCdxj(spark, s"$dir/old.cdxj").select("digest").as[String]
      .head() === null)
  }

  test("refetchPriority: change-rate arithmetic, single-capture and null-ts edges") {
    def ts(sec: Long) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))
    // u1: 3 captures over 2 days, 2 versions -> rate=(2-1)/172800, age=86400
    // u2: single capture -> span 0, priority 0
    // u3: 2 captures SAME digest -> (1-1)*... = 0.0 but span/age real
    val rows = Seq(
      ("com,a)/1", ts(1000000L), "https://a.com/1", "f", 0L, 1L, null.asInstanceOf[String], "response", "D1"),
      ("com,a)/1", ts(1000000L + 86400), "https://a.com/1", "f", 1L, 1L, null.asInstanceOf[String], "response", "D1"),
      ("com,a)/1", ts(1000000L + 172800), "https://a.com/1", "f", 2L, 1L, null.asInstanceOf[String], "response", "D2"),
      ("com,a)/2", ts(1000000L), "https://a.com/2", "f", 3L, 1L, null.asInstanceOf[String], "response", "D3"),
      ("com,a)/3", ts(1000000L), "https://a.com/3", "f", 4L, 1L, null.asInstanceOf[String], "response", "D4"),
      ("com,a)/3", ts(1000000L + 100), "https://a.com/3", "f", 5L, 1L, null.asInstanceOf[String], "response", "D4"),
      // null-ts row (a "-" interchange line) must be ignored entirely
      ("com,a)/1", null.asInstanceOf[java.sql.Timestamp], "https://a.com/1", "f", 6L, 1L, null.asInstanceOf[String], "response", "DX"))
      .toDF("urlkey", "ts", "url", "filename", "offset", "length", "mime",
        "record_type", "digest")
    val got = Cdx.refetchPriority(rows, ts(1000000L + 259200))
      .orderBy("urlkey").collect()
    assert(got.length === 3)
    assert(got(0).getLong(2) === 3L && got(0).getLong(3) === 2L) // n_captures, n_versions
    assert(got(0).getLong(4) === 172800L && got(0).getLong(5) === 86400L)
    assert(got(0).getDouble(6) === 1.0 * 86400 / 172800)
    assert(got(1).getLong(2) === 1L && got(1).getLong(4) === 0L)
    assert(got(1).getDouble(6) === 0.0)
    assert(got(2).getLong(3) === 1L && got(2).getDouble(6) === 0.0)
    assert(got(2).getLong(4) === 100L)
  }

  test("lookupDomain: host + subdomains from the prefix range; byte-prefix decoy excluded") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cdx_dom").toString
    val recs = Seq(
      ("https://site.example/a", 1L), ("https://www.site.example/b", 2L),
      ("https://deep.www.site.example/c", 3L),
      ("https://sitex.example/decoy", 4L), // shares the byte prefix "example,site"
      ("https://other.example/d", 5L))
      .map { case (u, i) => (u,
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1700000000L + i)),
        "conversion", "text/plain", s"p$i".getBytes("UTF-8")) }
      .toDF("url", "ts", "record_type", "content_type", "payload")
    Warc.write(recs, s"$dir/warc", numShards = 1)
    val built = Cdx.build(spark, s"$dir/warc", maxSplitBytes = 1 << 16)
    Cdx.writeCdxj(built, s"$dir/idx", numShards = 2)
    val got = Cdx.lookupDomain(spark, s"$dir/idx", "example,site")
      .select("url").as[String].collect().sorted.toSeq
    assert(got === Seq("https://deep.www.site.example/c",
      "https://site.example/a", "https://www.site.example/b"))
    // == the full-scan filter on the same boundary semantics
    val full = Cdx.readCdxj(spark, s"$dir/idx")
      .filter(col("urlkey").rlike("^\\Qexample,site\\E[,)]"))
      .select("url").as[String].collect().sorted.toSeq
    assert(got === full)
    // the ')' -terminated form is rejected (that's lookupPrefix's job)
    intercept[IllegalArgumentException](
      Cdx.lookupDomain(spark, s"$dir/idx", "example,site)"))
  }
}
