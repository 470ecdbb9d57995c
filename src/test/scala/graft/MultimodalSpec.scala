package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("attachBinary + extractFeatures computes byte stats per row") {
    val df = Seq((1L, "abc"), (2L, "")).toDF("doc_id", "text")
    val media = Multimodal.attachBinary(df, "doc_id", "text")
    val feats = Multimodal.extractFeatures(spark, media, "doc_id", () => new Multimodal.FakeDecoder)
      .collect().map(f => f.doc_id -> f).toMap
    assert(feats(1L).n_bytes == 3)
    assert(feats(1L).first_byte == 'a'.toInt)
    assert(feats(1L).checksum16 == "abc".getBytes.map(_ & 0xff).sum)
    assert(feats(2L).n_bytes == 0 && feats(2L).first_byte == 0 && feats(2L).checksum16 == 0L)
  }

  test("frameSample emits n frames per row with monotone offsets") {
    val df = Seq((1L, "0123456789abcdef")).toDF("doc_id", "text")
    val media = Multimodal.attachBinary(df, "doc_id", "text")
    val frames = Multimodal.frameSample(media, "doc_id", nFrames = 4)
      .select("doc_id", "frame_idx", "frame_offset")
      .as[(Long, Int, Long)].collect().sortBy(_._2)
    assert(frames.length == 4)
    assert(frames.map(_._3).toSeq == Seq(0L, 4L, 8L, 12L))
  }

  test("ImageHeaders.sniff reads real PNG/GIF/BMP/JPEG dimensions from bytes") {
    import graft.operators.ImageHeaders
    for (fmt <- Seq("png", "gif", "bmp", "jpeg"); (w, h) <- Seq((1, 1), (37, 5), (300, 200))) {
      val bytes = Multimodal.encodeImage(w, h, rgb = 0x3366cc, format = fmt)
      val m = ImageHeaders.sniff(bytes)
      assert(m === ImageHeaders.ImageMeta(fmt, w, h), s"$fmt ${w}x$h -> $m")
    }
  }

  test("ImageHeaders.sniff: corrupt, truncated, empty, and null blobs degrade to unknown") {
    import graft.operators.ImageHeaders
    val unknown = ImageHeaders.ImageMeta("unknown", -1, -1)
    assert(ImageHeaders.sniff(null) === unknown)
    assert(ImageHeaders.sniff(Array.emptyByteArray) === unknown)
    assert(ImageHeaders.sniff("just some text bytes".getBytes) === unknown)
    val png = Multimodal.encodeImage(20, 10, 0, "png")
    assert(ImageHeaders.sniff(png.take(12)) === unknown, "truncated before IHDR data")
    val jpg = Multimodal.encodeImage(20, 10, 0, "jpeg")
    assert(ImageHeaders.sniff(jpg.take(4)) === unknown, "truncated before any SOF")
    // JPEG that desyncs mid-walk (marker byte overwritten) must not loop or throw
    val broken = jpg.clone(); broken(2) = 0x00
    assert(ImageHeaders.sniff(broken) === unknown)
    // a PNG signature whose first chunk is NOT IHDR must not read chunk
    // payload bytes as dimensions
    val resigned = png.clone()
    resigned(12) = 'I'; resigned(13) = 'D'; resigned(14) = 'A'; resigned(15) = 'T'
    assert(ImageHeaders.sniff(resigned) === unknown)
    // BMP with an unrecognized DIB header size must be unknown, and the
    // 12-byte OS/2 core header layout (16-bit dims) must parse
    val bmp = Multimodal.encodeImage(20, 10, 0, "bmp")
    val weird = bmp.clone(); weird(14) = 33
    assert(ImageHeaders.sniff(weird) === unknown)
    val core = bmp.take(26).clone()
    core(14) = 12; core(15) = 0; core(16) = 0; core(17) = 0
    core(18) = 20; core(19) = 0 // width le16
    core(20) = 10; core(21) = 0 // height le16
    assert(ImageHeaders.sniff(core) === ImageHeaders.ImageMeta("bmp", 20, 10))
  }

  test("AudioHeaders.sniff round-trips genuine WAV headers across parameter shapes") {
    import graft.operators.AudioHeaders
    for {
      rate <- Seq(8000, 22050, 44100)
      ch <- Seq(1, 2)
      frames <- Seq(0, 1, 480)
    } {
      val bytes = Multimodal.encodeWavPcm16(rate, ch, frames)
      val m = AudioHeaders.sniff(bytes)
      assert(m === AudioHeaders.AudioMeta("wav", rate, ch, 16, frames.toLong),
        s"wav $rate/$ch/$frames -> $m")
    }
  }

  test("AudioHeaders.sniff parses hand-built FLAC STREAMINFO and MP3 frame headers") {
    import graft.operators.AudioHeaders
    // FLAC: fLaC + STREAMINFO block (type 0, len 34); 44100 Hz, 2ch,
    // 16-bit, 1000 total samples packed per the spec layout
    val flac = new Array[Byte](4 + 4 + 34)
    "fLaC".getBytes("US-ASCII").copyToArray(flac, 0)
    flac(4) = 0x00; flac(5) = 0x00; flac(6) = 0x00; flac(7) = 34
    // rate 44100 = 0x0AC44 (20 bits): bytes 18,19 and high nibble of 20
    flac(18) = 0x0a; flac(19) = 0xc4.toByte
    // byte 20: rate low nibble (4) | (channels-1=1)<<1 | (bits-1=15)>>4
    flac(20) = ((0x4 << 4) | (1 << 1) | (15 >> 4)).toByte
    // byte 21: (bits-1 low nibble)<<4 | total-samples bits 35..32
    flac(21) = ((15 & 0xf) << 4).toByte
    // total samples 1000 = 0x3E8 in bytes 22..25 (big-endian 32 low bits)
    flac(22) = 0x00; flac(23) = 0x00; flac(24) = 0x03; flac(25) = 0xe8.toByte
    assert(AudioHeaders.sniff(flac) === AudioHeaders.AudioMeta("flac", 44100, 2, 16, 1000L))
    // FLAC with total-samples 0 (spec: unknown) -> -1
    val flacUnk = flac.clone(); flacUnk(24) = 0; flacUnk(25) = 0
    assert(AudioHeaders.sniff(flacUnk).nFrames === -1L)
    // MP3: MPEG1 Layer III, 44100 Hz (rate idx 0), joint stereo; frame
    // headers carry no length/depth -> -1
    val mp3 = Array[Byte](0xff.toByte, 0xfb.toByte, 0x90.toByte, 0x40)
    assert(AudioHeaders.sniff(mp3 ++ new Array[Byte](16)) ===
      AudioHeaders.AudioMeta("mp3", 44100, 2, -1, -1L))
    // same frame behind an ID3v2 tag (synchsafe size 20, no footer)
    val id3 = Array[Byte]('I', 'D', '3', 3, 0, 0, 0, 0, 0, 20) ++
      new Array[Byte](20) ++ mp3 ++ new Array[Byte](16)
    assert(AudioHeaders.sniff(id3).format === "mp3")
    // mono mode bits (11) -> channels 1; MPEG2 rate table
    val mp3Mono = Array[Byte](0xff.toByte, 0xf3.toByte, 0x90.toByte, 0xc0.toByte)
    val m2 = AudioHeaders.sniff(mp3Mono ++ new Array[Byte](16))
    assert(m2.channels === 1 && m2.sampleRate === 22050)
  }

  test("AudioHeaders.sniff: corrupt, truncated, empty, and null degrade to unknown") {
    import graft.operators.AudioHeaders
    val unknown = AudioHeaders.AudioMeta("unknown", -1, -1, -1, -1L)
    assert(AudioHeaders.sniff(null) === unknown)
    assert(AudioHeaders.sniff(Array.emptyByteArray) === unknown)
    assert(AudioHeaders.sniff("just some text bytes again".getBytes) === unknown)
    val wav = Multimodal.encodeWavPcm16(44100, 2, 100)
    assert(AudioHeaders.sniff(wav.take(16)) === unknown, "truncated before fmt chunk")
    // fmt chunk SIZE running past the buffer: the walk must terminate
    // (never throw/loop); fmt fields still parse, the now-unreachable
    // data chunk degrades to frame count -1
    val bad = wav.clone(); bad(16) = 0xff.toByte; bad(17) = 0xff.toByte
    bad(18) = 0xff.toByte; bad(19) = 0x7f
    assert(AudioHeaders.sniff(bad) === AudioHeaders.AudioMeta("wav", 44100, 2, 16, -1L))
    // fmt TAG corrupted: no format info anywhere -> unknown
    val noFmt = wav.clone(); noFmt(12) = 'x'
    assert(AudioHeaders.sniff(noFmt) === unknown)
    // ID3 tag whose synchsafe size exceeds the buffer
    val id3Trunc = Array[Byte]('I', 'D', '3', 3, 0, 0, 0x7f, 0x7f, 0x7f, 0x7f)
    assert(AudioHeaders.sniff(id3Trunc) === unknown)
    // reserved MPEG version / bad sync must not parse
    assert(AudioHeaders.sniff(Array[Byte](0xff.toByte, 0xeb.toByte, 0x90.toByte, 0x40, 0, 0, 0, 0, 0, 0, 0, 0)) === unknown)
  }

  test("audioMeta dataset operator sniffs per row; corrupt rows survive as unknown") {
    val rows = Seq(
      (1L, Multimodal.encodeWavPcm16(16000, 1, 50)),
      (2L, "garbage audio".getBytes))
    val df = rows.toDF("doc_id", "content")
    val got = Multimodal.audioMeta(spark, df, "doc_id", "content")
      .collect().map(r => r.doc_id -> ((r.format, r.sample_rate, r.channels, r.n_frames))).toMap
    assert(got(1L) === (("wav", 16000, 1, 50L)))
    assert(got(2L) === (("unknown", -1, -1, -1L)))
  }

  test("imageMeta dataset operator sniffs per row; corrupt rows survive as unknown") {
    val rows = Seq(
      (1L, Multimodal.encodeImage(8, 3, 0xff0000, "png")),
      (2L, Multimodal.encodeImage(5, 7, 0x00ff00, "gif")),
      (3L, "garbage".getBytes))
    val df = rows.toDF("doc_id", "content")
    val got = Multimodal.imageMeta(spark, df, "doc_id", "content")
      .collect().map(r => r.doc_id -> ((r.format, r.width, r.height))).toMap
    assert(got(1L) === (("png", 8, 3)))
    assert(got(2L) === (("gif", 5, 7)))
    assert(got(3L) === (("unknown", -1, -1)))
  }

  // blocky test pattern on normalized coordinates: per row, 9 cell lumas
  // form a +-24-step random walk with group-keyed step signs — every
  // horizontal neighbor pair has a guaranteed 24-unit margin (no ties to
  // flip under JPEG noise), and re-rendering at another size is a true
  // resized copy
  private def pattern(group: Long)(u: Double, v: Double): Int = {
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val r = math.min((v * 8).toInt, 7)
    val c = math.min((u * 9).toInt, 8)
    val rowBits = mix(group * 8 + r)
    val offs = new Array[Int](9)
    var o = 0; var minO = 0; var i = 1
    while (i < 9) {
      o += (if (((rowBits >>> (i - 1)) & 1L) == 1L) -1 else 1)
      offs(i) = o; if (o < minO) minO = o; i += 1
    }
    (16 + 24 * (offs(c) - minO)) * 0x010101
  }

  test("DHash64: resized and re-encoded copies hash within 3 bits; distinct patterns far apart") {
    import graft.functions.DHash64
    val orig = DHash64.compute(Multimodal.encodeImagePattern(90, 80, "png")(pattern(7L)))
    val small = DHash64.compute(Multimodal.encodeImagePattern(45, 40, "png")(pattern(7L)))
    val jpeg = DHash64.compute(Multimodal.encodeImagePattern(63, 56, "jpg")(pattern(7L)))
    val other = DHash64.compute(Multimodal.encodeImagePattern(90, 80, "png")(pattern(8L)))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(orig != null && small != null && jpeg != null && other != null)
    assert(ham(orig, small) <= 3, s"resize moved the hash ${ham(orig, small)} bits")
    assert(ham(orig, jpeg) <= 3, s"lossy re-encode moved the hash ${ham(orig, jpeg)} bits")
    assert(ham(orig, other) > 10, "distinct patterns must not collide")
    assert(DHash64.compute("not an image".getBytes) === null, "corrupt-is-data")
    assert(DHash64.compute(Array.emptyByteArray) === null)
    // a flat image carries no gradients: all-zero hash, equal for all colors
    assert(DHash64.compute(Multimodal.encodeImage(16, 16, 0xff0000, "png")) === 0L)
  }

  test("imageNearDupPairs finds planted resize/recompress groups; corrupt blobs drop out") {
    // two groups x three variants + one undecodable blob per group
    val rows = (0 until 2).flatMap { g =>
      val base = g * 10L
      Seq(
        (base + 0, Multimodal.encodeImagePattern(90, 80, "png")(pattern(g))),
        (base + 1, Multimodal.encodeImagePattern(45, 40, "png")(pattern(g))),
        (base + 2, Multimodal.encodeImagePattern(63, 56, "jpg")(pattern(g))),
        (base + 3, s"corrupt $g".getBytes))
    }
    val pairs = Multimodal.imageNearDupPairs(
        rows.toDF("doc_id", "content"), "doc_id", "content", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((0L, 1L), (0L, 2L), (1L, 2L), (10L, 11L), (10L, 12L), (11L, 12L)),
      s"expected exactly the planted within-group pairs, got $pairs")
  }

  test("DHash64 expression: codegen and interpreted agree; null propagates") {
    import graft.functions.DHash64
    val df = Seq(
      (1L, Multimodal.encodeImagePattern(36, 32, "png")(pattern(3L))),
      (2L, "junk".getBytes),
      (3L, null.asInstanceOf[Array[Byte]])
    ).toDF("id", "content")
    def run(): Seq[(Long, Option[Long])] =
      df.select($"id", DHash64($"content").as("h")).as[(Long, Option[Long])]
        .collect().toSeq.sortBy(_._1)
    val withCodegen = run()
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      assert(run() === withCodegen)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    assert(withCodegen.find(_._1 == 1L).get._2.isDefined)
    assert(withCodegen.find(_._1 == 2L).get._2.isEmpty, "undecodable bytes hash to NULL")
    assert(withCodegen.find(_._1 == 3L).get._2.isEmpty, "null payload propagates")
  }

  test("VideoHeaders.sniff round-trips genuine MP4 box trees; video track found past audio") {
    import graft.operators.{Multimodal, VideoHeaders}
    for ((w, h, ts, dur) <- Seq((640, 360, 1000, 5000L), (16, 16, 90000, 90000L),
                                (1920, 1080, 600, 1L))) {
      val m = VideoHeaders.sniff(Multimodal.encodeMp4(w, h, ts, dur))
      assert(m.format === "mp4")
      assert((m.width, m.height) === (w, h),
        "dimensions come from the SECOND trak — the 0x0 audio trak is skipped")
      assert(m.durationMs === dur * 1000L / ts)
    }
  }

  test("VideoHeaders.sniff parses hand-built AVI and detects Matroska") {
    import graft.operators.VideoHeaders
    // minimal RIFF/AVI : LIST hdrl { avih } — 56-byte avih payload
    val avih = java.nio.ByteBuffer.allocate(8 + 56)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    avih.put("avih".getBytes("US-ASCII")).putInt(56)
      .putInt(33367) // usPerFrame (~29.97fps)
      .putInt(0).putInt(0).putInt(0)
      .putInt(300) // totalFrames
      .putInt(0).putInt(2).putInt(0)
      .putInt(320).putInt(240) // width height
      .putInt(0).putInt(0).putInt(0).putInt(0)
    val hdrl = "hdrl".getBytes("US-ASCII") ++ avih.array()
    val riff = java.nio.ByteBuffer.allocate(12 + 8 + hdrl.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    riff.put("RIFF".getBytes("US-ASCII")).putInt(4 + 8 + hdrl.length)
      .put("AVI ".getBytes("US-ASCII"))
      .put("LIST".getBytes("US-ASCII")).putInt(hdrl.length).put(hdrl)
    val avi = VideoHeaders.sniff(riff.array())
    assert(avi.format === "avi")
    assert((avi.width, avi.height) === (320, 240))
    assert(avi.durationMs === 33367L * 300L / 1000L)

    val mkv = VideoHeaders.sniff(Array(0x1a, 0x45, 0xdf, 0xa3, 0, 0, 0, 0, 0, 0, 0, 0).map(_.toByte))
    assert(mkv.format === "mkv" && mkv.width === -1)
  }

  test("VideoHeaders.sniff: corrupt, truncated, empty, and null degrade to unknown") {
    import graft.operators.{Multimodal, VideoHeaders}
    assert(VideoHeaders.sniff(null).format === "unknown")
    assert(VideoHeaders.sniff(Array.empty[Byte]).format === "unknown")
    assert(VideoHeaders.sniff("plain text not a container".getBytes).format === "unknown")
    val good = Multimodal.encodeMp4(320, 240, 1000, 2000L)
    for (cut <- Seq(5, 12, 30, good.length / 2))
      VideoHeaders.sniff(good.take(cut)) // must not throw; fields best-effort
    // box size lying past the buffer: walk stops cleanly
    val lying = good.clone()
    lying(0) = 0x7f.toByte
    VideoHeaders.sniff(lying)
  }

  test("videoMeta dataset operator sniffs per row; corrupt rows survive as unknown") {
    import graft.operators.Multimodal
    val rows = Seq(
      (1L, Multimodal.encodeMp4(100, 50, 1000, 750L)),
      (2L, "junk".getBytes)
    ).toDF("doc_id", "content")
    val out = Multimodal.videoMeta(spark, rows, "doc_id", "content")
      .collect().sortBy(_.doc_id)
    assert(out(0).format === "mp4" && out(0).width === 100 &&
      out(0).height === 50 && out(0).duration_ms === 750L)
    assert(out(1).format === "unknown" && out(1).width === -1)
  }

  test("EXIF: spliced APP1 round-trips; both endians; corrupt degrades to empty") {
    import graft.operators.{ImageHeaders, Multimodal}
    val b = Multimodal.encodeJpegExif(4, 4, 0x336699, orientation = 6,
      dateTime = "2021:07:04 08:09:10", make = "acme", model = "supercam9000")
    val m = ImageHeaders.exif(b)
    assert(m === ImageHeaders.ExifMeta(6, "2021:07:04 08:09:10", "acme", "supercam9000"))
    // the spliced blob is still a valid JPEG for the dimension sniffer
    val dims = ImageHeaders.sniff(b)
    assert(dims.format === "jpeg" && dims.width === 4 && dims.height === 4)
    // short make/model (inline <=4-byte ASCII values incl. NUL)
    val short = Multimodal.encodeJpegExif(2, 2, 0, 1, "2020:01:01 00:00:00", "abc", "x")
    assert(ImageHeaders.exif(short) ===
      ImageHeaders.ExifMeta(1, "2020:01:01 00:00:00", "abc", "x"))
    // little-endian TIFF: hand-built II block with just orientation
    val tiff = Array[Int](
      'I', 'I', 42, 0, 8, 0, 0, 0, // header, IFD0 at 8
      1, 0,                         // 1 entry
      0x12, 0x01, 3, 0, 1, 0, 0, 0, 5, 0, 0, 0, // orientation = 5
      0, 0, 0, 0).map(_.toByte)
    val le = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe1.toByte,
      ((tiff.length + 8) >> 8).toByte, ((tiff.length + 8) & 0xff).toByte,
      'E', 'x', 'i', 'f', 0, 0) ++ tiff
    assert(ImageHeaders.exif(le).orientation === 5)
    // no EXIF / non-JPEG / truncated / null -> defaults, never throw
    assert(ImageHeaders.exif(Multimodal.encodeImage(3, 3, 0, "jpg")) ===
      ImageHeaders.ExifMeta(-1, "", "", ""))
    assert(ImageHeaders.exif("plain text".getBytes) === ImageHeaders.ExifMeta(-1, "", "", ""))
    assert(ImageHeaders.exif(b.take(20)) === ImageHeaders.ExifMeta(-1, "", "", ""))
    assert(ImageHeaders.exif(null) === ImageHeaders.ExifMeta(-1, "", "", ""))
  }

  test("exifMeta dataset operator extracts per row; corrupt rows yield defaults") {
    import graft.operators.Multimodal
    import spark.implicits._
    val rows = Seq(
      (1L, Multimodal.encodeJpegExif(3, 3, 1, 8, "2019:12:31 23:59:59", "mk", "md")),
      (2L, "not an image".getBytes)).toDF("doc_id", "content")
    val out = Multimodal.exifMeta(spark, rows, "doc_id", "content")
      .collect().sortBy(_.doc_id)
    assert(out(0) === Multimodal.ExifMetaRow(1L, 8, "2019:12:31 23:59:59", "mk", "md"))
    assert(out(1) === Multimodal.ExifMetaRow(2L, -1, "", "", ""))
  }

  test("ImageHeaders.sniff: SOF dimension payload ending exactly at the buffer end parses") {
    import graft.operators.ImageHeaders
    // minimal JPEG prefix: SOI + SOF0 whose height/width bytes are the
    // last bytes of the blob (a truncated-but-parseable crawl artifact)
    val b = Array(0xff, 0xd8, 0xff, 0xc0, 0x00, 0x0b, 0x08, 0x00, 0x0a, 0x00, 0x14)
      .map(_.toByte)
    assert(ImageHeaders.sniff(b) === ImageHeaders.ImageMeta("jpeg", 20, 10))
  }

}
