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
}
