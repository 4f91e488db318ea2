package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Deterministic 64-d image feature vector over a `binary` column — the
  * REAL feature extractor behind the multimodal embedding column (closes
  * the last EXT stub: Multimodal.imageFeatureVector's hash stand-in): the
  * image is decoded with JDK `javax.imageio` (PNG/JPEG/GIF/BMP — the same
  * decode path as [[ImageMeta]]), converted to grayscale, partitioned into
  * an 8×8 block grid, and each block's mean intensity becomes one vector
  * component (row-major). Block-mean grids are the classic cheap visual
  * descriptor (the average-hash family without the binarization step), and
  * the output feeds the EXISTING embedding stack unchanged —
  * `Dedup.embeddingNearDups`, the ANN gates, int8 quantization — because
  * near-identical images give near-identical block means.
  *
  * Exactness: gray = (r + g + b) / 3.0 per pixel, block mean = sum / count
  * — for the gray fixtures (r = g = b) every component is an exact small
  * rational, so an external oracle recomputes the vector from the pixel
  * formula alone (the q112/q308 fixture discipline). NULL when no ImageIO
  * reader claims the bytes or the image is smaller than the 8×8 grid.
  *
  * Reference: the north-star's multimodal columns imply an image→vector
  * producer for the similarity stack; the reference's own pipeline keeps
  * pillow-side features (services/file-service/requirements.txt:10). */
case class ImageFeature64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "image_feature64"

  override def nullSafeEval(input: Any): Any =
    ImageFeature64.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = ImageFeature64.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, bytes =>
      s"""${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $cls.compute($bytes);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ImageFeature64 {
  /** 64 block means (8×8 grid, row-major: component 8·by+bx covers x ∈
    * [bx·W/8, (bx+1)·W/8) × y ∈ [by·H/8, (by+1)·H/8), integer-floor
    * boundaries), or null when the bytes don't decode or W/H < 8.
    * Decodes via [[ImageMeta.readImage]] — explicit memory-cached stream,
    * no temp-file churn, no JVM-global ImageIO flag. */
  def compute(bytes: Array[Byte]): ArrayData = {
    val img = ImageMeta.readImage(bytes)
    if (img == null) return null
    val w = img.getWidth; val h = img.getHeight
    if (w < 8 || h < 8) return null
    val out = new Array[Any](64)
    var by = 0
    while (by < 8) {
      val y0 = by * h / 8; val y1 = (by + 1) * h / 8
      var bx = 0
      while (bx < 8) {
        val x0 = bx * w / 8; val x1 = (bx + 1) * w / 8
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        val cnt = (y1 - y0).toLong * (x1 - x0)
        out(by * 8 + bx) = sum / (3.0 * cnt)
        bx += 1
      }
      by += 1
    }
    new GenericArrayData(out)
  }

  /** Deterministic 16×16 24-bit gray BMP fixture for the feature gates:
    * pixel (x, y) of the (group, member) image has intensity
    *
    *   v = (group % 10^6)·256 + (y·16 + x)
    *   base = (v·v % 999983) % 252          — quadratic mixing, so two
    *   intensity = base + member            —   groups' images are NOT
    *                                            shifted copies of each other
    *
    * with member ∈ [0, 3]: the four members of a group differ by a
    * uniform ≤3/255 brightness shift (near-duplicates by construction),
    * while distinct groups get decorrelated pixel patterns. ImageIO's BMP
    * reader decodes this losslessly, so the block means are exact integer
    * rationals an oracle recomputes from the formula. */
  def buildBmp(group: Long, member: Long): Array[Byte] = {
    val g = ((group % 1000000L) + 1000000L) % 1000000L
    val m = (((member % 4L) + 4L) % 4L).toInt
    val width = 16; val height = 16
    val stride = width * 3 // 48 bytes — already a multiple of 4, no padding
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
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val v = g * 256 + (y * 16 + x)
        val gray = ((v * v % 999983L) % 252L).toInt + m
        val off = dataOff + (height - 1 - y) * stride + x * 3
        b(off) = gray.toByte; b(off + 1) = gray.toByte; b(off + 2) = gray.toByte
        x += 1
      }
      y += 1
    }
    b
  }
}

object PatchBmp {
  /** splitmix64 finalizer (the WavNearDup mix — an affine envelope does
    * not decorrelate groups; see that Scaladoc). */
  private def mix(x0: Long): Long = {
    var x = x0
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Gray value of pixel (x, y) in the (group, member) patch fixture:
    * quadrant (0,0) (x < 8, y < 8) hashes on (group, tag=0) ONLY — every
    * member of a group carries that 8×8 patch pixel-identical — while the
    * other three quadrants hash on (group, member·4 + quadrant), so they
    * decorrelate across members AND across quadrants of one image. */
  def gray(group: Long, member: Long, x: Int, y: Int): Int = {
    val q = (y >> 3) * 2 + (x >> 3)
    val tag = if (q == 0) 0L else member * 4 + q
    val h = mix(group * 0x9E3779B97F4A7C15L + tag * 0x100000001B3L
      + (y * 16 + x) * 0xC2B2AE3D27D4EB4FL)
    ((h >>> 8) % 252L).toInt
  }

  /** Planted shared-patch 16×16 gray BMP: the fragment-of relation on the
    * IMAGE modality (the verdict's round-9 item 6 — what q252's substring
    * containment catches for text). All members of `group` share quadrant
    * (0,0) exactly; every other quadrant is member-private splitmix64
    * noise, so ONLY the (0,0) tiles of a group are near-duplicates: full-
    * image vectors sit far apart (3/4 of the pixels differ) while the
    * shared tile matches pixel-exactly after [[ImageCropBmp]]'s cut. */
  def build(group: Long, member: Long): Array[Byte] = {
    val g = ((group % 1000000000L) + 1000000000L) % 1000000000L
    val m = ((member % 4L) + 4L) % 4L
    val width = 16; val height = 16
    val stride = width * 3
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
    put32(14, 40)
    put32(18, width); put32(22, height)
    b(26) = 1
    b(28) = 24
    put32(34, stride * height)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val v = gray(g, m, x, y)
        val off = dataOff + (height - 1 - y) * stride + x * 3
        b(off) = v.toByte; b(off + 1) = v.toByte; b(off + 2) = v.toByte
        x += 1
      }
      y += 1
    }
    b
  }
}

/** Fixture builder expression: (group, member) → the shared-patch 16×16
  * gray BMP bytes (see [[PatchBmp.build]]). */
case class PatchBmpFixture(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "patch_bmp_fixture"

  override def nullSafeEval(group: Any, member: Any): Any =
    PatchBmp.build(group.asInstanceOf[Long], member.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = PatchBmp.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (g, m) => s"${ev.value} = $cls.build($g, $m);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fixture builder expression: (group, member) → the deterministic 16×16
  * gray BMP bytes (see [[ImageFeature64.buildBmp]]). */
case class FeatureBmpFixture(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "feature_bmp_fixture"

  override def nullSafeEval(group: Any, member: Any): Any =
    ImageFeature64.buildBmp(group.asInstanceOf[Long], member.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = ImageFeature64.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (g, m) => s"${ev.value} = $cls.buildBmp($g, $m);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
