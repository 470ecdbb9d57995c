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
      while (i + 9 < bytes.length) {
        if (u8(bytes, i) != 0xff) return Unknown // desynced — corrupt
        val marker = u8(bytes, i + 1)
        if (marker == 0xff) { i += 1 } // fill bytes before a marker
        else if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) i += 2 // standalone
        else {
          val len = be16(bytes, i + 2)
          if (len < 2) return Unknown
          val isSof = marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc
          if (isSof) {
            if (i + 9 >= bytes.length) return Unknown
            return ImageMeta("jpeg", be16(bytes, i + 7), be16(bytes, i + 5))
          }
          i += 2 + len
        }
      }
      return Unknown
    }
    Unknown
  }
}
