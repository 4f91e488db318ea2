package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Perceptual difference-hash (dHash) over a binary image column — the
  * multimodal near-dup fingerprint: 64 bits, bit r·8+c set when pixel
  * (r, c) is brighter than its right neighbour on a 9×8 grayscale grid.
  * Equal hashes ⇒ pixel-gradient-identical images; small hamming distance
  * ⇒ near-duplicates — the image-side analog of q38's text SimHash, and
  * the q268 cross-source dup flow's visual variant.
  *
  * The decoder walks a REAL 24-bit uncompressed BMP byte layout
  * (little-endian header, bottom-up padded rows) — the q112 EXIF
  * discipline: the gate generates genuine image bytes per row
  * ([[GrayBmpFixture]]) and the oracle recomputes the hash from the same
  * pixel formula in pure integer SQL, so what's verified is exactly this
  * byte-walk. Grayscale = the blue channel (fixture pixels are gray, all
  * channels equal). */
case class DHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "dhash64"

  override def nullSafeEval(input: Any): Any =
    DHash64.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = DHash64.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val boxed = ctx.freshName("dhashBoxed")
    nullSafeCodeGen(ctx, ev, b =>
      s"""java.lang.Long $boxed = (java.lang.Long) $cls.compute($b);
         |${ev.isNull} = $boxed == null;
         |if (!${ev.isNull}) ${ev.value} = $boxed.longValue();""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DHash64 {

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  /** Decode a 24-bit uncompressed BMP and fold its 9×8 grid into the
    * 64-bit dHash. NULL on anything that isn't the expected layout — a
    * fingerprint over misparsed pixels would be silently wrong, and a
    * THROW would kill the task on the first stray object in a mixed
    * binary column (the library-wide hostile-bytes contract: WavMeta,
    * Mp4Meta, ImageFeature64 all return null). The pixel window is
    * bounds-checked against the buffer: a bit-flipped dataOff in an
    * otherwise-valid header must not read out of bounds (round-8 fuzz
    * sweep). */
  def compute(bytes: Array[Byte]): java.lang.Long = {
    if (bytes == null || bytes.length < 54 ||
      bytes(0) != 'B' || bytes(1) != 'M') return null
    val dataOff = le32(bytes, 10)
    val width = le32(bytes, 18)
    val height = le32(bytes, 22)
    val bpp = (bytes(28) & 0xff) | ((bytes(29) & 0xff) << 8)
    if (width != 9 || height != 8 || bpp != 24) return null
    val stride = ((width * 3 + 3) / 4) * 4
    if (dataOff < 0 || dataOff.toLong + stride.toLong * height > bytes.length)
      return null
    // bottom-up storage: pixel row r (top-origin) lives in stored row
    // height-1-r; gray = blue channel (first byte of the BGR triple)
    def px(r: Int, c: Int): Int =
      bytes(dataOff + (height - 1 - r) * stride + c * 3) & 0xff
    var hash = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (px(r, c) > px(r, c + 1)) hash |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    java.lang.Long.valueOf(hash)
  }

  /** Build the 9×8 24-bit gray BMP whose pixel (r, c) has intensity
    * (seed·31 + r·17 + c·13) mod 256 — the deterministic fixture the q308
    * oracle mirrors in integer SQL. */
  def buildBmp(seed: Long): Array[Byte] = {
    val width = 9; val height = 8
    val stride = ((width * 3 + 3) / 4) * 4
    val dataOff = 54
    val size = dataOff + stride * height
    val b = new Array[Byte](size)
    def put32(off: Int, v: Int): Unit = {
      b(off) = (v & 0xff).toByte
      b(off + 1) = ((v >> 8) & 0xff).toByte
      b(off + 2) = ((v >> 16) & 0xff).toByte
      b(off + 3) = ((v >> 24) & 0xff).toByte
    }
    b(0) = 'B'; b(1) = 'M'
    put32(2, size); put32(10, dataOff)
    put32(14, 40) // BITMAPINFOHEADER
    put32(18, width); put32(22, height)
    b(26) = 1 // planes
    b(28) = 24 // bpp
    put32(34, stride * height)
    var r = 0
    while (r < height) {
      var c = 0
      while (c < width) {
        val g = (((seed * 31 + r * 17 + c * 13) % 256 + 256) % 256).toInt
        val off = dataOff + (height - 1 - r) * stride + c * 3
        b(off) = g.toByte; b(off + 1) = g.toByte; b(off + 2) = g.toByte
        c += 1
      }
      r += 1
    }
    b
  }
}

/** Fixture builder expression: seed → the deterministic 9×8 gray BMP bytes
  * (see [[DHash64.buildBmp]]). */
case class GrayBmpFixture(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "gray_bmp_fixture"

  override def nullSafeEval(input: Any): Any =
    DHash64.buildBmp(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = DHash64.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $cls.buildBmp($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
