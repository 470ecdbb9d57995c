package graft.operators

/** REAL video metadata from raw bytes — no codec libraries, just the
  * public container formats' structures (MP4/MOV: the ISO-BMFF box tree
  * per ISO 14496-12 — `moov/mvhd` carries timescale+duration,
  * `moov/trak/tkhd` carries 16.16 fixed-point track dimensions; AVI:
  * the RIFF `hdrl/avih` main header's dwWidth/dwHeight; Matroska/WebM:
  * EBML magic detection). The video sibling of [[ImageHeaders]] and
  * [[AudioHeaders]], completing the multimodal metadata story:
  * resolution/duration profiling over a 100 TB binary column reads a
  * few header bytes per row — a narrow scan, no frame decode.
  *
  * All parsing is bounds-checked; anything unrecognized or truncated
  * returns ("unknown", -1, ...) rather than throwing — corrupt blobs
  * are data, not errors, in a crawl corpus. Fields a container doesn't
  * surface cheaply are -1 (Matroska dims live deep in EBML elements —
  * detection only; frame-level anything sits behind
  * [[Multimodal.Decoder]]). */
object VideoHeaders {

  final case class VideoMeta(format: String, width: Int, height: Int,
                             durationMs: Long)
  private val Unknown = VideoMeta("unknown", -1, -1, -1L)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be32(b: Array[Byte], i: Int): Long =
    ((u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)) & 0xffffffffL
  private def be64(b: Array[Byte], i: Int): Long = (be32(b, i) << 32) | be32(b, i + 4)
  private def le32(b: Array[Byte], i: Int): Long =
    (u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3).toLong << 24)) & 0xffffffffL
  private def tag(b: Array[Byte], i: Int, s: String): Boolean =
    i + s.length <= b.length && s.indices.forall(j => b(i + j) == s.charAt(j).toByte)

  def sniff(bytes: Array[Byte]): VideoMeta = {
    if (bytes == null || bytes.length < 12) return Unknown
    // ISO-BMFF: first box is conventionally ftyp; accept any valid box
    // whose type is a known top-level 4cc
    if (tag(bytes, 4, "ftyp")) return sniffBmff(bytes)
    if (tag(bytes, 0, "RIFF") && tag(bytes, 8, "AVI ")) return sniffAvi(bytes)
    if (bytes.length >= 4 && (bytes(0) & 0xff) == 0x1a && (bytes(1) & 0xff) == 0x45 &&
        (bytes(2) & 0xff) == 0xdf && (bytes(3) & 0xff) == 0xa3)
      return VideoMeta("mkv", -1, -1, -1L) // Matroska/WebM: detection only
    Unknown
  }

  /** Box walk: top-level to `moov`, inside it `mvhd` (timescale +
    * duration, version 0/1 layouts) and the first `trak/tkhd` with
    * nonzero 16.16 dimensions (the video track; audio tracks carry 0x0).
    * 64-bit `size==1` largesize boxes handled; any size running past
    * the buffer ends the walk with whatever was found. */
  private def sniffBmff(bytes: Array[Byte]): VideoMeta = {
    var timescale = -1L; var duration = -1L
    var width = -1; var height = -1

    def walkChildren(from: Int, to: Int, f: (String, Int, Int) => Unit): Unit = {
      var i = from
      while (i + 8 <= to) {
        var size = be32(bytes, i)
        var hdr = 8
        if (size == 1 && i + 16 <= to) { size = be64(bytes, i + 8); hdr = 16 }
        else if (size == 0) size = (to - i).toLong // box extends to end
        if (size < hdr || i + size > to) return
        val typ = new String(bytes, i + 4, 4, "US-ASCII")
        f(typ, i + hdr, (i + size).toInt)
        i += size.toInt
      }
    }

    def parseMvhd(from: Int, to: Int): Unit = {
      if (from + 4 > to) return
      val version = u8(bytes, from)
      if (version == 0 && from + 20 <= to) {
        timescale = be32(bytes, from + 12)
        duration = be32(bytes, from + 16)
      } else if (version == 1 && from + 32 <= to) {
        timescale = be32(bytes, from + 20)
        duration = be64(bytes, from + 24)
      }
    }
    def parseTkhd(from: Int, to: Int): Unit = {
      if (width > 0) return // first video track wins
      if (from + 4 > to) return
      val version = u8(bytes, from)
      val dimOff = if (version == 1) from + 88 else from + 76
      if (dimOff + 8 <= to) {
        val w = (be32(bytes, dimOff) >> 16).toInt
        val h = (be32(bytes, dimOff + 4) >> 16).toInt
        if (w > 0 && h > 0) { width = w; height = h }
      }
    }

    walkChildren(0, bytes.length, {
      case ("moov", f, t) =>
        walkChildren(f, t, {
          case ("mvhd", mf, mt) => parseMvhd(mf, mt)
          case ("trak", tf, tt) =>
            walkChildren(tf, tt, {
              case ("tkhd", kf, kt) => parseTkhd(kf, kt)
              case _ =>
            })
          case _ =>
        })
      case _ =>
    })
    if (timescale <= 0 && width < 0) return Unknown
    val durMs = if (timescale > 0 && duration >= 0) duration * 1000L / timescale else -1L
    VideoMeta("mp4", width, height, durMs)
  }

  /** RIFF walk to LIST/hdrl's `avih`: dwMicroSecPerFrame + dwTotalFrames
    * give duration; dwWidth/dwHeight at payload offsets 32/36. */
  private def sniffAvi(bytes: Array[Byte]): VideoMeta = {
    var i = 12
    while (i + 8 <= bytes.length) {
      val size = le32(bytes, i + 4)
      if (tag(bytes, i, "LIST") && tag(bytes, i + 8, "hdrl")) {
        var j = i + 12
        val end = math.min(bytes.length.toLong, i + 8 + size).toInt
        while (j + 8 <= end) {
          val csize = le32(bytes, j + 4)
          if (tag(bytes, j, "avih") && j + 8 + 40 <= end) {
            val usPerFrame = le32(bytes, j + 8)
            val totalFrames = le32(bytes, j + 8 + 16)
            val w = le32(bytes, j + 8 + 32).toInt
            val h = le32(bytes, j + 8 + 36).toInt
            val durMs =
              if (usPerFrame > 0 && totalFrames > 0) usPerFrame * totalFrames / 1000L else -1L
            return VideoMeta("avi", w, h, durMs)
          }
          j += 8 + ((csize + 1L) & ~1L).toInt // word-aligned
        }
      }
      i += 8 + ((size + 1L) & ~1L).toInt
    }
    VideoMeta("avi", -1, -1, -1L)
  }
}
