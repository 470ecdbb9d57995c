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
}
