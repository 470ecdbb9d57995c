package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** 64-bit perceptual difference hash (dHash) of an encoded image: decode
  * via the JDK's `ImageIO` (PNG/GIF/BMP/JPEG — no external codecs),
  * area-average the luma down to a 9x8 grid, and set bit `r*8+c` when
  * cell (r,c) is strictly brighter than its right neighbor. The hash is
  * a function of image CONTENT, not bytes: a resized or re-encoded copy
  * of the same picture lands within a few bits of Hamming distance
  * (gradients between neighboring cells survive rescaling and mild
  * compression loss), which is exactly what content-level image dedup
  * needs — the byte-level fingerprints (`dedup_exact`, md5) see resized
  * copies as unrelated blobs.
  *
  * Determinism: the downscale is our own integer area-average (per-cell
  * luma SUM plus pixel COUNT, compared cross-multiplied in Long
  * arithmetic — no float rounding, no `Graphics2D` rendering-hint
  * variance), so one JVM's hash equals every JVM's hash for the same
  * decoded pixels.
  *
  * Corrupt-is-data: bytes `ImageIO` can't decode (truncated file, text,
  * unsupported codec) yield NULL, never a task failure — matching
  * [[graft.operators.ImageHeaders.sniff]]'s contract. NULL hashes can't
  * band, so undecodable blobs drop out of near-dup joins naturally.
  *
  * Scale shape: one narrow map per blob (decode cost is the image
  * itself; no shuffle). The pair stage downstream joins on banded
  * sub-keys of this Long — see
  * [[graft.operators.Dedup.hammingBandedPairs]]. */
case class DHash64(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true // decode failure => null, even for non-null input
  override def prettyName: String = "graft_dhash64"

  override protected def nullSafeEval(input: Any): Any =
    DHash64.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val tmp = ctx.freshName("dh")
      s"""
         |java.lang.Long $tmp = graft.functions.DHash64.compute($in);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DHash64 {

  // no file-backed ImageIO stream cache on the decode path (a temp-file
  // create/delete per blob, serialized on the temp dir) — see Multimodal
  javax.imageio.ImageIO.setUseCache(false)

  /** Null on any decode failure; otherwise the 64-bit dHash. Static so
    * generated code calls it directly (stays inside WholeStageCodegen;
    * the decode dominates anyway — the point is no shuffle, not JIT). */
  def compute(bytes: Array[Byte]): java.lang.Long = {
    if (bytes == null || bytes.length == 0) return null
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) return null
    val w = img.getWidth
    val h = img.getHeight
    if (w <= 0 || h <= 0) return null
    // 9 columns x 8 rows of (luma sum, pixel count); integer area-average.
    // Box edges floor(c*w/9) guarantee full coverage; a sub-9px image
    // reuses pixels across cells (x1 clamped to >= x0+1), which keeps
    // the grid total and the comparisons well-defined.
    val sums = new Array[Long](72)
    val cnts = new Array[Long](72)
    var r = 0
    while (r < 8) {
      val y0 = (r.toLong * h / 8).toInt
      val y1 = math.max(y0 + 1, ((r + 1).toLong * h / 8).toInt)
      var c = 0
      while (c < 9) {
        val x0 = (c.toLong * w / 9).toInt
        val x1 = math.max(x0 + 1, ((c + 1).toLong * w / 9).toInt)
        var s = 0L
        var n = 0L
        var y = y0
        while (y < y1 && y < h) {
          var x = x0
          while (x < x1 && x < w) {
            val rgb = img.getRGB(x, y)
            // integer ITU-R 601 luma in 0..255000 (x1000 fixed point)
            s += 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)
            n += 1L
            x += 1
          }
          y += 1
        }
        sums(r * 9 + c) = s
        cnts(r * 9 + c) = math.max(n, 1L)
        c += 1
      }
      r += 1
    }
    var out = 0L
    r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        val i = r * 9 + c
        // mean(i) > mean(i+1) without division: cross-multiplied Longs
        // (sums <= 255000 * w * h fit comfortably; counts are small)
        if (sums(i) * cnts(i + 1) > sums(i + 1) * cnts(i)) out |= (1L << (r * 8 + c))
        c += 1
      }
      r += 1
    }
    java.lang.Long.valueOf(out)
  }

  def apply(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      DHash64(org.apache.spark.sql.GraftColumnBridge.expression(c)))
}
