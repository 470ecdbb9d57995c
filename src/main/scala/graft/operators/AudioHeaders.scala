package graft.operators

/** REAL audio metadata from raw bytes — no codec libraries, just the
  * public container formats' fixed headers (WAV: RIFF chunk walk per the
  * Microsoft/IBM RIFF spec; FLAC: the mandatory first STREAMINFO
  * metadata block per the FLAC format spec; MP3: MPEG audio frame
  * header per ISO 11172-3, with ID3v2 tag skip). The audio sibling of
  * [[ImageHeaders]], closing the multimodal metadata story: sample
  * rate / channel / length profiling over a 100 TB binary column reads
  * a few header bytes per row — a narrow scan, no sample decode.
  * Waveform-level features still sit behind [[Multimodal.Decoder]].
  *
  * All parsing is bounds-checked; anything unrecognized or truncated
  * returns ("unknown", -1, ...) rather than throwing — corrupt blobs
  * are data, not errors, in a crawl corpus. Fields a format does not
  * carry in its header are -1 (MP3 frame headers have no sample count
  * or bit depth; FLAC's total-samples field may be legitimately 0 =
  * unknown, mapped to -1). */
object AudioHeaders {

  /** `nFrames` = inter-channel sample frames (duration = nFrames /
    * sampleRate seconds); -1 where the header doesn't say. */
  final case class AudioMeta(format: String, sampleRate: Int, channels: Int,
                             bitsPerSample: Int, nFrames: Long)
  private val Unknown = AudioMeta("unknown", -1, -1, -1, -1L)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3).toLong << 24)) & 0xffffffffL
  private def tag(b: Array[Byte], i: Int, s: String): Boolean =
    i + s.length <= b.length && s.indices.forall(j => b(i + j) == s.charAt(j).toByte)

  def sniff(bytes: Array[Byte]): AudioMeta = {
    if (bytes == null || bytes.length < 12) return Unknown
    if (tag(bytes, 0, "RIFF") && tag(bytes, 8, "WAVE")) return sniffWav(bytes)
    if (tag(bytes, 0, "fLaC")) return sniffFlac(bytes)
    sniffMp3(bytes)
  }

  /** RIFF chunk walk: find "fmt " (PCM layout: format, channels, sample
    * rate, block align, bits) and "data" (payload size -> frame count).
    * Chunks are word-aligned; a size field running past the buffer ends
    * the walk with whatever was found so far. */
  private def sniffWav(bytes: Array[Byte]): AudioMeta = {
    var i = 12
    var channels = -1; var rate = -1; var bits = -1; var blockAlign = -1
    var dataSize = -1L
    while (i + 8 <= bytes.length) {
      val size = le32(bytes, i + 4)
      if (tag(bytes, i, "fmt ") && i + 8 + 16 <= bytes.length) {
        channels = le16(bytes, i + 10)
        rate = le32(bytes, i + 12).toInt
        blockAlign = le16(bytes, i + 20)
        bits = le16(bytes, i + 22)
      } else if (tag(bytes, i, "data")) {
        dataSize = size
      }
      // +1 word-align pad on odd sizes, per RIFF; guard vs overflow
      val step = 8L + size + (size & 1L)
      if (step <= 0 || i + step > Int.MaxValue) i = bytes.length
      else i += step.toInt
    }
    if (channels <= 0 || rate <= 0) Unknown
    else AudioMeta("wav", rate, channels, bits,
      if (dataSize >= 0 && blockAlign > 0) dataSize / blockAlign else -1L)
  }

  /** FLAC: the spec mandates STREAMINFO as the FIRST metadata block
    * (type 0, length 34). Sample rate (20 bits), channels-1 (3),
    * bits-per-sample-1 (5), total samples (36) live packed at fixed
    * offsets inside it. total == 0 means "unknown" in the spec -> -1. */
  private def sniffFlac(bytes: Array[Byte]): AudioMeta = {
    if (bytes.length < 4 + 4 + 34) return Unknown
    val blockType = u8(bytes, 4) & 0x7f
    val blockLen = (u8(bytes, 5) << 16) | (u8(bytes, 6) << 8) | u8(bytes, 7)
    if (blockType != 0 || blockLen < 34) return Unknown
    val o = 8 // STREAMINFO payload start
    val rate = (u8(bytes, o + 10) << 12) | (u8(bytes, o + 11) << 4) | (u8(bytes, o + 12) >> 4)
    val channels = ((u8(bytes, o + 12) >> 1) & 0x7) + 1
    val bits = (((u8(bytes, o + 12) & 1) << 4) | (u8(bytes, o + 13) >> 4)) + 1
    val total = ((u8(bytes, o + 13) & 0x0f).toLong << 32) |
      (u8(bytes, o + 14).toLong << 24) | (u8(bytes, o + 15).toLong << 16) |
      (u8(bytes, o + 16).toLong << 8) | u8(bytes, o + 17).toLong
    if (rate <= 0) Unknown
    else AudioMeta("flac", rate, channels, bits, if (total == 0) -1L else total)
  }

  // MPEG audio sample-rate tables by version bits (ISO 11172-3 / 13818-3)
  private val Mpeg1Rates = Array(44100, 48000, 32000)
  private val Mpeg2Rates = Array(22050, 24000, 16000)
  private val Mpeg25Rates = Array(11025, 12000, 8000)

  /** MP3: optional ID3v2 tag (synchsafe size) then the first MPEG frame
    * header: 11-bit sync, version, layer, sample-rate index, channel
    * mode. Frame headers carry no total length or bit depth -> -1. */
  private def sniffMp3(bytes: Array[Byte]): AudioMeta = {
    var i = 0
    if (tag(bytes, 0, "ID3")) {
      if (bytes.length < 10) return Unknown
      val size = ((u8(bytes, 6) & 0x7f) << 21) | ((u8(bytes, 7) & 0x7f) << 14) |
        ((u8(bytes, 8) & 0x7f) << 7) | (u8(bytes, 9) & 0x7f)
      val footer = if ((u8(bytes, 5) & 0x10) != 0) 10 else 0
      i = 10 + size + footer
    }
    if (i < 0 || i + 4 > bytes.length) return Unknown
    val b1 = u8(bytes, i); val b2 = u8(bytes, i + 1)
    val b3 = u8(bytes, i + 2); val b4 = u8(bytes, i + 3)
    if (b1 != 0xff || (b2 & 0xe0) != 0xe0) return Unknown
    val version = (b2 >> 3) & 0x3 // 0=MPEG2.5, 1=reserved, 2=MPEG2, 3=MPEG1
    val layer = (b2 >> 1) & 0x3   // 0 = reserved
    if (version == 1 || layer == 0) return Unknown
    val rateIdx = (b3 >> 2) & 0x3
    if (rateIdx == 3) return Unknown
    val rate = version match {
      case 3 => Mpeg1Rates(rateIdx)
      case 2 => Mpeg2Rates(rateIdx)
      case _ => Mpeg25Rates(rateIdx)
    }
    val channels = if (((b4 >> 6) & 0x3) == 3) 1 else 2
    AudioMeta("mp3", rate, channels, -1, -1L)
  }
}
