package graft

import graft.sources.Warc
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

/** WARC source: gzip-member round-trip, split ownership (every record
  * read exactly once for ANY split grid), mid-member resync, false-magic
  * robustness, multi-record members, and the WET text path. */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  private def writeFixture(dir: String, n: Int, payload: Int => Array[Byte]): Unit = {
    val rows = (0 until n).map { i =>
      (s"https://x.test/$i", ts(1700000000L + i), "response",
        if (i % 5 == 0) null else "text/plain", payload(i))
    }
    Warc.write(rows.toDF("url", "ts", "record_type", "content_type", "payload"),
      dir, numShards = 1)
  }

  /** Incompressible payloads (seeded random) force real file sizes so
    * small maxSplitBytes yields MANY splits per file. */
  private def randomPayload(i: Int): Array[Byte] = {
    val r = new scala.util.Random(i)
    val b = new Array[Byte](200 + r.nextInt(600))
    r.nextBytes(b)
    b
  }

  test("round-trip: fields, nulls, binary payloads survive exactly") {
    val dir = Files.createTempDirectory("graft_warc_rt").toString
    // payloads deliberately contain gzip magic bytes and CRLF CRLF
    val tricky = Array[Byte](0x1f, 0x8b.toByte, 8, 0, '\r', '\n', '\r', '\n', 0x1f, 0x8b.toByte, 8)
    val rows = Seq(
      ("https://a.test/1", ts(1700000001L), "response", "text/html", "hello <b>world</b>".getBytes(UTF_8)),
      (null, ts(1700000002L), "warcinfo", null, "software: graft".getBytes(UTF_8)),
      ("https://a.test/3", ts(1700000003L), "conversion", "text/plain", tricky))
    Warc.write(rows.toDF("url", "ts", "record_type", "content_type", "payload"), dir, 1)
    val back = Warc.read(spark, dir).orderBy(col("ts")).collect()
    assert(back.length === 3)
    assert(back(0).getString(0) === "https://a.test/1")
    assert(back(1).isNullAt(0) && back(1).getString(2) === "warcinfo" && back(1).isNullAt(3))
    assert(back(2).getAs[Array[Byte]]("payload").toSeq === tricky.toSeq)
    assert(back.map(_.getTimestamp(1).getTime / 1000).toSeq ===
      Seq(1700000001L, 1700000002L, 1700000003L))
    assert(back(0).getLong(4) === "hello <b>world</b>".getBytes(UTF_8).length.toLong)
  }

  test("split ownership: every record exactly once for any split size") {
    val dir = Files.createTempDirectory("graft_warc_split").toString
    writeFixture(dir, 800, randomPayload) // ~350 KB single file
    val full = Warc.read(spark, dir, maxSplitBytes = 1L << 40)
      .select("url").as[String].collect().sorted
    assert(full.length === 800)
    for (msb <- Seq(1 << 16, 1 << 17)) {
      val split = Warc.read(spark, dir, maxSplitBytes = msb.toLong)
        .select("url").as[String].collect().sorted
      assert(split.toSeq === full.toSeq,
        s"split grid $msb must reproduce the file exactly (got ${split.length})")
    }
  }

  test("readSplit: a range starting mid-member yields only members starting in-range") {
    val dir = Files.createTempDirectory("graft_warc_mid").toString
    writeFixture(dir, 50, randomPayload)
    val file = Files.list(Paths.get(dir)).filter(_.toString.endsWith(".warc.gz"))
      .findFirst().get.toString
    val len = Files.size(Paths.get(file))
    val conf = new Configuration(false)
    conf.set("fs.defaultFS", "file:///")
    // full read for reference
    val all = Warc.readSplit(conf, file, 0, len).toVector
    assert(all.length === 50)
    // two-way split at an arbitrary byte: both halves partition the records
    val cut = len / 3
    val a = Warc.readSplit(conf, file, 0, cut).toVector
    val b = Warc.readSplit(conf, file, cut, len).toVector
    assert(a.length + b.length === 50, s"${a.length} + ${b.length}")
    assert((a ++ b).map(_.getString(0)).sorted === all.map(_.getString(0)).sorted)
  }

  test("multi-record member parses sequentially (CommonCrawl tolerance)") {
    val r1 = Warc.recordBytes("https://m.test/1", ts(1L), "response", "text/plain",
      "alpha".getBytes(UTF_8))
    val r2 = Warc.recordBytes(null, ts(2L), "metadata", null, "beta\r\n\r\ngamma".getBytes(UTF_8))
    val rows = Warc.parseRecords(r1 ++ r2).toVector
    assert(rows.length === 2)
    assert(rows(0).getString(0) === "https://m.test/1")
    assert(new String(rows(1).getAs[Array[Byte]](5), UTF_8) === "beta\r\n\r\ngamma")
  }

  test("readWet: conversion records decode to text") {
    val dir = Files.createTempDirectory("graft_warc_wet").toString
    val rows = Seq(
      ("https://w.test/1", ts(10L), "conversion", "text/plain", "wet text one".getBytes(UTF_8)),
      (null, ts(11L), "warcinfo", null, "ignored".getBytes(UTF_8)),
      ("https://w.test/2", ts(12L), "conversion", "text/plain", "wet text two".getBytes(UTF_8)))
    Warc.write(rows.toDF("url", "ts", "record_type", "content_type", "payload"), dir, 1)
    val wet = Warc.readWet(spark, dir).orderBy("url").collect()
    assert(wet.length === 2)
    assert(wet.map(_.getString(2)).toSeq === Seq("wet text one", "wet text two"))
  }

  test("resync survives a failed inflation larger than the buffer window") {
    // one good small member, then a HUGE member (incompressible ~3 MiB
    // payload) truncated mid-stream: its inflation consumes > 1 MiB of
    // compressed input (sliding the window far past the member start)
    // and then fails at EOF — the reader must reposition and finish
    // cleanly with just the good record, not die on a window assertion
    val good = Warc.gzipMember(Warc.recordBytes(
      "https://big.test/ok", ts(1L), "response", "text/plain", "fine".getBytes(UTF_8)))
    val rnd = new scala.util.Random(7)
    val huge = new Array[Byte](3 << 20)
    rnd.nextBytes(huge)
    val bigMember = Warc.gzipMember(Warc.recordBytes(
      "https://big.test/huge", ts(2L), "response", "application/octet-stream", huge))
    assume(bigMember.length > (1 << 21), s"member must exceed the 1 MiB fill window, got ${bigMember.length}")
    val f = Files.createTempFile("graft_warc_big", ".warc.gz")
    Files.write(f, good ++ bigMember.take(bigMember.length - (1 << 19))) // cut ~512 KiB short
    val conf = new Configuration(false)
    conf.set("fs.defaultFS", "file:///")
    val got = Warc.readSplit(conf, f.toString, 0, Files.size(f)).toVector
    assert(got.map(_.getString(0)) === Vector("https://big.test/ok"),
      "only the intact record survives; the truncated giant resyncs away")
  }

  test("fail-loud: a truncated member at EOF does not yield a torn record") {
    val dir = Files.createTempDirectory("graft_warc_trunc").toString
    writeFixture(dir, 20, randomPayload)
    val file = Files.list(Paths.get(dir)).filter(_.toString.endsWith(".warc.gz"))
      .findFirst().get.toString
    val bytes = Files.readAllBytes(Paths.get(file))
    val cutFile = Files.createTempFile("graft_warc_cut", ".warc.gz")
    Files.write(cutFile, bytes.dropRight(37)) // truncate mid-final-member
    val conf = new Configuration(false)
    conf.set("fs.defaultFS", "file:///")
    val got = Warc.readSplit(conf, cutFile.toString, 0, bytes.length.toLong - 37).toVector
    assert(got.length === 19, "the truncated final member must drop, not tear")
  }
}
