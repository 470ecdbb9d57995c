package graft.operators

/** REAL image metadata from raw bytes — no codec libraries, just the
  * public container formats' fixed headers (PNG: ISO 15948 §5.3/11.2.2,
  * GIF: GIF89a spec logical screen descriptor, BMP: BITMAPINFOHEADER,
  * JPEG: ITU T.81 SOF segment walk). This replaces the "decode is a
  * stub" seam for the metadata half of the multimodal story: dimension
  * extraction over a 100 TB binary column needs exactly these few bytes
  * per row, no pixel decode, so a narrow scan does it at full speed.
  * Pixel-level features still sit behind [[Multimodal.Decoder]].
  *
  * All parsing is bounds-checked; anything unrecognized or truncated
  * returns ("unknown", -1, -1) rather than throwing — corrupt blobs are
  * data, not errors, in a crawl corpus. */
object ImageHeaders {

  final case class ImageMeta(format: String, width: Int, height: Int)
  private val Unknown = ImageMeta("unknown", -1, -1)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)

  def sniff(bytes: Array[Byte]): ImageMeta = {
    if (bytes == null || bytes.length < 10) return Unknown
    // PNG: 8-byte signature; the spec requires the FIRST chunk to be
    // IHDR — verify its tag at 12-15 before trusting the dims at 16/20,
    // else a resigned/corrupt blob reads chunk payload as dimensions
    if (bytes.length >= 24 &&
        u8(bytes, 0) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G' &&
        u8(bytes, 4) == 0x0d && u8(bytes, 5) == 0x0a && u8(bytes, 6) == 0x1a && u8(bytes, 7) == 0x0a)
      return if (bytes(12) == 'I' && bytes(13) == 'H' && bytes(14) == 'D' && bytes(15) == 'R')
        ImageMeta("png", be32(bytes, 16), be32(bytes, 20))
      else Unknown
    // GIF87a / GIF89a: logical screen descriptor at offset 6
    if (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == '8' &&
        (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a')
      return ImageMeta("gif", le16(bytes, 6), le16(bytes, 8))
    // BMP: "BM" + a DIB header whose size field (offset 14) selects the
    // layout: 12 = BITMAPCOREHEADER (16-bit dims), 40+ family = 32-bit
    // dims (height may be negative = top-down rows); anything else is
    // not a layout we know — unknown, never garbage
    if (bytes.length >= 26 && bytes(0) == 'B' && bytes(1) == 'M') {
      val dibSize = le32(bytes, 14)
      return dibSize match {
        case 12 => ImageMeta("bmp", le16(bytes, 18), le16(bytes, 20))
        case 40 | 52 | 56 | 64 | 108 | 124 =>
          ImageMeta("bmp", le32(bytes, 18), math.abs(le32(bytes, 22)))
        case _ => Unknown
      }
    }
    // JPEG: FFD8, walk marker segments to the first SOF (C0..CF minus
    // the non-frame markers C4=DHT, C8=JPG extension, CC=DAC)
    if (u8(bytes, 0) == 0xff && u8(bytes, 1) == 0xd8) {
      var i = 2
      // guard i+8 < length: a SOF whose dimension payload (i+5..i+8) ends
      // exactly at the buffer end is still fully parseable
      while (i + 8 < bytes.length) {
        if (u8(bytes, i) != 0xff) return Unknown // desynced — corrupt
        val marker = u8(bytes, i + 1)
        if (marker == 0xff) { i += 1 } // fill bytes before a marker
        else if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) i += 2 // standalone
        else {
          val len = be16(bytes, i + 2)
          if (len < 2) return Unknown
          val isSof = marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc
          // dims at i+5..i+8 are in bounds: the loop guard is i+8 < length
          if (isSof) return ImageMeta("jpeg", be16(bytes, i + 7), be16(bytes, i + 5))
          i += 2 + len
        }
      }
      return Unknown
    }
    Unknown
  }

  /** EXIF IFD0 essentials (JEITA CP-3451 / TIFF 6.0): orientation,
    * original timestamp, camera make/model — the provenance fields a
    * crawl-curation pipeline actually filters and groups on. Absent or
    * unparsable → (−1, "", "", ""): corrupt blobs are data. */
  final case class ExifMeta(orientation: Int, dateTime: String,
                            make: String, model: String)
  private val NoExif = ExifMeta(-1, "", "", "")

  /** Parse EXIF from a JPEG's APP1 segment: marker walk → "Exif\0\0" →
    * TIFF header (both byte orders) → IFD0 entry scan. Only the four
    * IFD0 tags above are read; everything is bounds-checked. */
  def exif(bytes: Array[Byte]): ExifMeta = {
    if (bytes == null || bytes.length < 4) return NoExif
    if (u8(bytes, 0) != 0xff || u8(bytes, 1) != 0xd8) return NoExif
    var i = 2
    while (i + 4 < bytes.length) {
      if (u8(bytes, i) != 0xff) return NoExif
      val marker = u8(bytes, i + 1)
      if (marker == 0xff) { i += 1 }
      else if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) i += 2
      else {
        val len = be16(bytes, i + 2)
        if (len < 2 || i + 2 + len > bytes.length) return NoExif
        if (marker == 0xe1 && len >= 8 + 6 &&
            bytes(i + 4) == 'E' && bytes(i + 5) == 'x' && bytes(i + 6) == 'i' &&
            bytes(i + 7) == 'f' && bytes(i + 8) == 0 && bytes(i + 9) == 0)
          return parseTiff(bytes, i + 10, i + 2 + len)
        if (marker == 0xda) return NoExif // entropy-coded data: EXIF precedes it
        i += 2 + len
      }
    }
    NoExif
  }

  /** TIFF block between [tiff, end): header + IFD0 tag scan. */
  private def parseTiff(bytes: Array[Byte], tiff: Int, end: Int): ExifMeta = {
    if (tiff + 8 > end) return NoExif
    val little = bytes(tiff) == 'I' && bytes(tiff + 1) == 'I'
    val big = bytes(tiff) == 'M' && bytes(tiff + 1) == 'M'
    if (!little && !big) return NoExif
    def r16(i: Int): Int = if (little) le16(bytes, i) else be16(bytes, i)
    def r32(i: Int): Int = if (little) le32(bytes, i) else be32(bytes, i)
    if (r16(tiff + 2) != 42) return NoExif
    val ifd0 = tiff + r32(tiff + 4)
    if (ifd0 < tiff || ifd0 + 2 > end) return NoExif
    val n = r16(ifd0)
    var orientation = -1
    var dateTime = ""
    var make = ""
    var model = ""
    def ascii(valOff: Int, count: Int): String = {
      // ASCII values ≤4 bytes are inline in the value field, else the
      // field holds an offset from the TIFF header
      val start = if (count <= 4) valOff else tiff + r32(valOff)
      // subtraction form: `start + count` can overflow on a crafted
      // count near Int.MaxValue and dodge the bound check
      if (start < tiff || count <= 0 || count > end - start) return ""
      val upto = start + count - 1 // trailing NUL mandated by TIFF
      new String(bytes, start, math.max(0, upto - start), "ISO-8859-1")
        .takeWhile(_ != '\u0000') // defensive: stop at an embedded NUL
    }
    var e = 0
    while (e < n) {
      val entry = ifd0 + 2 + e * 12
      if (entry + 12 > end) return ExifMeta(orientation, dateTime, make, model)
      val tag = r16(entry)
      val typ = r16(entry + 2)
      val count = r32(entry + 4)
      val valOff = entry + 8
      tag match {
        case 0x0112 if typ == 3 && count == 1 => orientation = r16(valOff)
        case 0x0132 if typ == 2 => dateTime = ascii(valOff, count)
        case 0x010f if typ == 2 => make = ascii(valOff, count)
        case 0x0110 if typ == 2 => model = ascii(valOff, count)
        case _ =>
      }
      e += 1
    }
    ExifMeta(orientation, dateTime, make, model)
  }
}
