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
}
