package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: images/audio/video ride through the
  * engine as opaque `binary` columns with a typed metadata struct, and
  * per-modality compute runs as batched partition functions — the Scala
  * analogue of `mapInPandas` (iterator-of-batches, bounded memory,
  * library handles instantiated once per task, never serialized).
  *
  * The decode step is a STUB by design: codec libraries aren't in this
  * container. `FakeDecoder` is deterministic so pipelines stay
  * oracle-checkable; a real deployment swaps in an actual decoder behind
  * the same `Decoder` interface without touching the Spark plumbing
  * (schema, batching, partitioning — all real and tested).
  */
object Multimodal {

  // ImageIO defaults to a FILE-backed stream cache: every encode/decode
  // creates+deletes a temp file through a synchronized temp-dir — 5000
  // images = 5000 file round-trips across all task threads. Memory
  // caching removes that entirely (blobs here are small by contract).
  javax.imageio.ImageIO.setUseCache(false)

  /** Typed media metadata carried alongside the opaque payload. */
  final case class MediaMeta(format: String, width: Int, height: Int, nBytes: Long)

  /** One media row in, fixed-width features out. */
  final case class MediaFeatures(doc_id: Long, n_bytes: Int, first_byte: Int, checksum16: Long)

  /** Decoder seam. Real deployments: JavaCV/TwelveMonkeys/ffmpeg here. */
  trait Decoder extends Serializable {
    def features(bytes: Array[Byte]): MediaFeatures
  }

  /** Deterministic stand-in for a pixel decoder: "features" are cheap
    * byte statistics (count, first byte, 16-byte prefix checksum). */
  final class FakeDecoder extends Decoder {
    override def features(bytes: Array[Byte]): MediaFeatures = {
      val checksum = bytes.take(16).foldLeft(0L)((acc, b) => acc + (b & 0xff))
      MediaFeatures(0L, bytes.length, if (bytes.isEmpty) 0 else bytes(0) & 0xff, checksum)
    }
  }

  /** Attach a binary payload + metadata struct to a text corpus —
    * in production the binary comes off object storage; here the
    * document body doubles as the payload so the column plumbing is
    * exercised end-to-end on real fixtures. */
  def attachBinary(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      col(textCol).cast("binary").as("content"),
      struct(
        lit("text/plain").as("format"),
        lit(0).as("width"), lit(0).as("height"),
        length(col(textCol)).cast("long").as("nBytes")).as("meta"))

  /** Batched feature extraction: decoder constructed once per partition,
    * rows streamed through it (the mapInPandas batch shape). Output is a
    * typed Dataset — schema checked at compile time. */
  def extractFeatures(spark: SparkSession, media: DataFrame, idCol: String,
                      decoder: () => Decoder): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col(idCol).cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val d = decoder() // once per task — never serialized
        rows.map { case (id, bytes) => d.features(bytes).copy(doc_id = id) }
      }
  }

  /** One row of real image metadata, sniffed from container headers. */
  final case class ImageMetaRow(doc_id: Long, format: String, width: Int, height: Int)

  /** REAL header-based metadata extraction over a binary column —
    * [[ImageHeaders.sniff]] per row, no codec libraries, a few bytes
    * inspected per blob: the narrow-scan shape dimension profiling of a
    * 100 TB image column wants. Unrecognized/corrupt payloads yield
    * ("unknown", -1, -1) rows, not task failures. */
  def imageMeta(spark: SparkSession, media: DataFrame, idCol: String,
                binCol: String): Dataset[ImageMetaRow] = {
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val m = ImageHeaders.sniff(bytes)
        ImageMetaRow(id, m.format, m.width, m.height)
      }
  }

  /** One row of real audio metadata, sniffed from container headers. */
  final case class AudioMetaRow(doc_id: Long, format: String, sample_rate: Int,
                                channels: Int, bits_per_sample: Int, n_frames: Long)

  /** REAL header-based audio metadata over a binary column —
    * [[AudioHeaders.sniff]] per row (WAV/FLAC/MP3, no codec libraries,
    * a few bytes inspected per blob). Same narrow-scan shape and
    * corrupt-is-data contract as [[imageMeta]]. */
  def audioMeta(spark: SparkSession, media: DataFrame, idCol: String,
                binCol: String): Dataset[AudioMetaRow] = {
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val m = AudioHeaders.sniff(bytes)
        AudioMetaRow(id, m.format, m.sampleRate, m.channels, m.bitsPerSample, m.nFrames)
      }
  }

  /** Encode a genuine PCM16 WAV (RIFF/fmt/data) of silent frames — pure
    * header arithmetic, no codec involved, so it runs anywhere. Fixture
    * twin of [[encodeImage]]: the samples are arbitrary, the container
    * headers are authentic. */
  def encodeWavPcm16(sampleRate: Int, channels: Int, nFrames: Int): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && nFrames >= 0, "invalid wav params")
    val blockAlign = channels * 2
    val dataSize = nFrames * blockAlign
    val out = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * blockAlign) // byte rate
      .putShort(blockAlign.toShort)
      .putShort(16) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    out.array() // remaining dataSize bytes stay zero = silence
  }

  /** Encode a genuine minimal ISO-BMFF (MP4) container: `ftyp` + `moov`
    * holding `mvhd` (timescale/duration) and TWO `trak/tkhd` boxes — an
    * audio-shaped track (0x0 dimensions) FIRST, then the video track —
    * so every round-trip also exercises the sniffer's skip-non-video
    * logic. Pure header arithmetic, no codec (no media data, like
    * [[encodeWavPcm16]]'s silent frames): the box tree is authentic,
    * the payload absent. */
  def encodeMp4(width: Int, height: Int, timescale: Int, duration: Long): Array[Byte] = {
    require(width > 0 && height > 0 && timescale > 0 && duration >= 0, "invalid mp4 params")
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + payload.length)
      b.putInt(8 + payload.length).put(typ.getBytes("US-ASCII")).put(payload)
      b.array()
    }
    val identity: Array[Int] = Array(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    val ftyp = box("ftyp", {
      val b = java.nio.ByteBuffer.allocate(16)
      b.put("isom".getBytes("US-ASCII")).putInt(0x200)
        .put("isom".getBytes("US-ASCII")).put("iso2".getBytes("US-ASCII"))
      b.array()
    })
    val mvhd = box("mvhd", {
      val b = java.nio.ByteBuffer.allocate(100)
      b.putInt(0) // version 0 + flags
        .putInt(0).putInt(0) // ctime mtime
        .putInt(timescale).putInt(duration.toInt)
        .putInt(0x10000).putShort(0x100.toShort).putShort(0) // rate, volume, reserved
        .putLong(0) // reserved
      identity.foreach(b.putInt)
      (0 until 6).foreach(_ => b.putInt(0)) // pre_defined
      b.putInt(3) // next_track_ID
      b.array()
    })
    def tkhd(trackId: Int, w: Int, h: Int): Array[Byte] = box("tkhd", {
      val b = java.nio.ByteBuffer.allocate(84)
      b.putInt(7) // version 0 + flags (enabled|in-movie|in-preview)
        .putInt(0).putInt(0) // ctime mtime
        .putInt(trackId).putInt(0) // track_ID, reserved
        .putInt(duration.toInt)
        .putLong(0) // reserved
        .putShort(0).putShort(0) // layer, alternate_group
        .putShort(if (w == 0) 0x100.toShort else 0).putShort(0) // volume, reserved
      identity.foreach(b.putInt)
      b.putInt(w << 16).putInt(h << 16) // 16.16 fixed
      b.array()
    })
    val moov = box("moov",
      mvhd ++ box("trak", tkhd(1, 0, 0)) ++ box("trak", tkhd(2, width, height)))
    ftyp ++ moov
  }

  /** One row of real video metadata, sniffed from container structures. */
  final case class VideoMetaRow(doc_id: Long, format: String, width: Int,
                                height: Int, duration_ms: Long)

  /** REAL structure-based video metadata over a binary column —
    * [[VideoHeaders.sniff]] per row (MP4/MOV box walk, AVI RIFF walk,
    * Matroska detection; no codec libraries, a few bytes inspected per
    * blob). Same narrow-scan shape and corrupt-is-data contract as
    * [[imageMeta]]/[[audioMeta]]. */
  def videoMeta(spark: SparkSession, media: DataFrame, idCol: String,
                binCol: String): Dataset[VideoMetaRow] = {
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val m = VideoHeaders.sniff(bytes)
        VideoMetaRow(id, m.format, m.width, m.height, m.durationMs)
      }
  }

  final case class ExifMetaRow(doc_id: Long, orientation: Int,
                               date_time: String, make: String, model: String)

  /** EXIF provenance per row (orientation / original timestamp / camera
    * make+model) — a pure narrow scan over the binary column, a few
    * hundred bytes read per blob, same shape as [[imageMeta]]. */
  def exifMeta(spark: SparkSession, media: DataFrame, idCol: String,
               binCol: String): Dataset[ExifMetaRow] = {
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val m = ImageHeaders.exif(bytes)
        ExifMetaRow(id, m.orientation, m.dateTime, m.make, m.model)
      }
  }

  /** Splice a genuine EXIF APP1 segment (big-endian TIFF, IFD0 with
    * Make/Model/Orientation/DateTime) into a real ImageIO JPEG, right
    * after SOI — fixture helper for the [[exifMeta]] round-trip. */
  def encodeJpegExif(width: Int, height: Int, rgb: Int, orientation: Int,
                     dateTime: String, make: String, model: String): Array[Byte] = {
    val jpeg = encodeImage(width, height, rgb, "jpg")
    val bos = new java.io.ByteArrayOutputStream()
    def be16(v: Int): Unit = { bos.write((v >> 8) & 0xff); bos.write(v & 0xff) }
    def be32(v: Int): Unit = { be16((v >> 16) & 0xffff); be16(v & 0xffff) }
    // TIFF block, offsets relative to its own start
    val makeB = (make + "\u0000").getBytes("ISO-8859-1")
    val modelB = (model + "\u0000").getBytes("ISO-8859-1")
    val dtB = (dateTime + "\u0000").getBytes("ISO-8859-1")
    val nEntries = 4
    val dataStart = 8 + 2 + nEntries * 12 + 4 // header + count + entries + next-IFD
    val tiff = new java.io.ByteArrayOutputStream()
    def t16(v: Int): Unit = { tiff.write((v >> 8) & 0xff); tiff.write(v & 0xff) }
    def t32(v: Int): Unit = { t16((v >> 16) & 0xffff); t16(v & 0xffff) }
    def entry(tag: Int, typ: Int, count: Int, writeValue: => Unit): Unit = {
      t16(tag); t16(typ); t32(count); writeValue
    }
    def asciiValue(b: Array[Byte], off: Int): Unit =
      if (b.length <= 4) { var i = 0; while (i < 4) { tiff.write(if (i < b.length) b(i) else 0); i += 1 } }
      else t32(off)
    tiff.write('M'); tiff.write('M'); t16(42); t32(8)
    t16(nEntries)
    var off = dataStart
    val makeOff = off; off += (if (makeB.length > 4) makeB.length else 0)
    val modelOff = off; off += (if (modelB.length > 4) modelB.length else 0)
    val dtOff = off
    // IFD entries must be ascending by tag: 010F Make, 0110 Model,
    // 0112 Orientation, 0132 DateTime
    entry(0x010f, 2, makeB.length, asciiValue(makeB, makeOff))
    entry(0x0110, 2, modelB.length, asciiValue(modelB, modelOff))
    entry(0x0112, 3, 1, { t16(orientation); t16(0) })
    entry(0x0132, 2, dtB.length, asciiValue(dtB, dtOff))
    t32(0) // next IFD
    if (makeB.length > 4) tiff.write(makeB)
    if (modelB.length > 4) tiff.write(modelB)
    if (dtB.length > 4) tiff.write(dtB)
    val tiffB = tiff.toByteArray
    // assemble: SOI + APP1(Exif) + rest of the original JPEG
    bos.write(jpeg, 0, 2)
    bos.write(0xff); bos.write(0xe1)
    be16(2 + 6 + tiffB.length) // segment length includes these 2 bytes
    bos.write("Exif".getBytes("ISO-8859-1")); bos.write(0); bos.write(0)
    bos.write(tiffB)
    bos.write(jpeg, 2, jpeg.length - 2)
    bos.toByteArray
  }

  /** Encode a real single-color image via the JDK's ImageIO (PNG, GIF,
    * BMP, JPEG — no external codecs). Fixture/round-trip helper: the
    * pixels are arbitrary, the container headers are genuine. */
  def encodeImage(width: Int, height: Int, rgb: Int, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, format, out), s"no ImageIO writer for $format")
    out.toByteArray
  }

  /** Perceptual (difference-)hash column over an encoded-image binary
    * column: 64-bit content fingerprint via [[graft.functions.DHash64]]
    * (JDK ImageIO decode, 9x8 integer area-average, neighbor-gradient
    * bits). NULL for undecodable payloads — corrupt-is-data. One narrow
    * map, no shuffle. */
  def imageDHash(media: DataFrame, idCol: String, binCol: String): DataFrame =
    media.select(col(idCol), graft.functions.DHash64(col(binCol)).as("dhash"))

  /** Content-level image near-dup pairs: dHash each blob (narrow map),
    * then pigeonhole-banded Hamming join
    * ([[graft.operators.Dedup.hammingBandedPairs]] — candidates ∝
    * band-key collisions, never n²). Catches resized and re-encoded
    * (PNG<->JPEG, recompressed) copies that byte-level fingerprints
    * miss; undecodable blobs hash NULL and drop out of the join.
    * Returns (id_a, id_b, hamming). */
  def imageNearDupPairs(media: DataFrame, idCol: String, binCol: String,
                        maxHamming: Int = 3): DataFrame =
    Dedup.hammingBandedPairs(imageDHash(media, idCol, binCol), idCol, "dhash", maxHamming)

  /** Encode a real image whose pixels come from a smooth function of
    * NORMALIZED coordinates (u, v in [0,1)) — resolution-independent, so
    * re-rendering at a different size is a genuine "resized copy" of the
    * same picture (the fixture twin a perceptual-hash spec needs; flat
    * single-color fixtures from [[encodeImage]] all dHash to 0). */
  def encodeImagePattern(width: Int, height: Int, format: String)
                        (f: (Double, Double) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        img.setRGB(x, y, f(x.toDouble / width, y.toDouble / height))
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, format, out), s"no ImageIO writer for $format")
    out.toByteArray
  }

  /** Deterministic frame sampling for video-like payloads: n evenly
    * spaced byte-offset "frames" per row (stub for real frame decode;
    * the explode/fan-out shape is what matters at scale — rows explode
    * into frames BEFORE the shuffle, so frame work distributes). */
  def frameSample(media: DataFrame, idCol: String, nFrames: Int): DataFrame =
    media
      .withColumn("frame_idx", explode(sequence(lit(0), lit(nFrames - 1))))
      .withColumn("frame_offset",
        (col("frame_idx") * col("meta.nBytes")) / nFrames)
      .select(col(idCol), col("frame_idx"), col("frame_offset").cast("long").as("frame_offset"),
        col("content").substr((col("frame_offset") + 1).cast("int"), lit(16)).as("frame_bytes"))
}
