package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** REAL image downscale (area average) — closes the `resizePlan` stub:
  * decodes any ImageIO-claimed format, averages each target pixel's
  * source rectangle per RGB channel, and re-encodes as a 24-bit BMP that
  * every other image op in this library (ImageMeta, ImageFeature64,
  * DHash64 at 9×8, sniffMime) ingests directly — resize-then-featurize
  * without leaving the binary column.
  *
  * Block boundaries are the integer-floor grid (x ∈ [tx·W∕w, (tx+1)·W∕w),
  * same rule as [[ImageFeature64]]'s block means) and each channel mean
  * is TRUNCATING integer division sum∕count — every output pixel is
  * exact integer algebra an external oracle recomputes, no float
  * rounding anywhere. Downscale only (W ≥ w, H ≥ h): area averaging is
  * exact there; upscaling needs interpolation and a float contract, so
  * non-conforming inputs (undecodable bytes, smaller-than-target images)
  * return NULL per the library-wide hostile-bytes discipline. */
case class ImageResizeBmp(child: Expression, w: Int, h: Int)
    extends UnaryExpression {
  require(w >= 1 && h >= 1 && w <= 4096 && h <= 4096,
    "target size must be in [1, 4096]")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "image_resize_bmp"

  override def nullSafeEval(input: Any): Any =
    ImageResizeBmp.compute(input.asInstanceOf[Array[Byte]], w, h)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = ImageResizeBmp.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, bytes =>
      s"""${ev.value} = (byte[]) $cls.compute($bytes, $w, $h);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** REAL tile/patch extraction — the pixel-decode counterpart of
  * [[graft.operators.Multimodal.tileGrid]] (which plans the (tile_x,
  * tile_y) explosion; this kernel cuts the actual pixels): copy the
  * w×h rectangle at (x, y) into a fresh 24-bit BMP. Pure pixel copy —
  * no resampling, so every output byte is the source pixel an oracle
  * recomputes. NULL for undecodable bytes or a window not fully inside
  * the image (a clamped crop would silently change the patch geometry
  * the grid promised). */
case class ImageCropBmp(child: Expression, x: Int, y: Int, w: Int, h: Int)
    extends UnaryExpression {
  require(x >= 0 && y >= 0 && w >= 1 && h >= 1 && w <= 4096 && h <= 4096,
    "crop window must be non-negative with size in [1, 4096]")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "image_crop_bmp"

  override def nullSafeEval(input: Any): Any =
    ImageCropBmp.compute(input.asInstanceOf[Array[Byte]], x, y, w, h)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = ImageCropBmp.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, bytes =>
      s"""${ev.value} = (byte[]) $cls.compute($bytes, $x, $y, $w, $h);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** [[ImageCropBmp]] with EXPRESSION-valued window position — the ViT-patch
  * shape: a fixed w×h patch size (literal, so the output geometry is known
  * at plan time) cut at a per-row (x, y), which is what lets one plan crop
  * every tile [[graft.operators.Multimodal.tileGrid]] lays out instead of
  * one plan per window. Same kernel, same NULL contract (undecodable bytes
  * or a window not fully inside the image). */
case class ImageCropAtBmp(first: Expression, second: Expression,
                          third: Expression, w: Int, h: Int)
    extends TernaryExpression {
  require(w >= 1 && h >= 1 && w <= 4096 && h <= 4096,
    "patch size must be in [1, 4096]")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "image_crop_at_bmp"

  override def nullSafeEval(bytes: Any, x: Any, y: Any): Any =
    ImageCropBmp.computeAt(bytes.asInstanceOf[Array[Byte]],
      x.asInstanceOf[Long], y.asInstanceOf[Long], w, h)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = ImageCropBmp.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (bytes, x, y) =>
      s"""${ev.value} = (byte[]) $cls.computeAt($bytes, $x, $y, $w, $h);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

object ImageCropBmp {

  /** Long-positioned entry for [[ImageCropAtBmp]]: NULL (not a throw, not a
    * clamp) for windows that start outside [0, 2³¹) — per-row positions are
    * data, and hostile data must degrade like hostile bytes do. */
  def computeAt(bytes: Array[Byte], x: Long, y: Long, w: Int, h: Int): Array[Byte] =
    if (x < 0 || y < 0 || x > Int.MaxValue || y > Int.MaxValue) null
    else compute(bytes, x.toInt, y.toInt, w, h)

  def compute(bytes: Array[Byte], x: Int, y: Int, w: Int, h: Int): Array[Byte] = {
    val img = ImageMeta.readImage(bytes)
    if (img == null) return null
    // long compare: a near-Int.MaxValue x would overflow `x + w` and slip
    // past an int guard into getRGB
    if (x.toLong + w > img.getWidth || y.toLong + h > img.getHeight) return null
    val stride = ((w * 3 + 3) / 4) * 4
    val dataOff = 54
    val out = new Array[Byte](dataOff + stride * h)
    def put32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte
      out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    put32(2, out.length); put32(10, dataOff)
    put32(14, 40)
    put32(18, w); put32(22, h)
    out(26) = 1
    out(28) = 24
    put32(34, stride * h)
    var ty = 0
    while (ty < h) {
      var tx = 0
      while (tx < w) {
        val p = img.getRGB(x + tx, y + ty)
        val off = dataOff + (h - 1 - ty) * stride + tx * 3
        out(off) = (p & 0xff).toByte
        out(off + 1) = ((p >> 8) & 0xff).toByte
        out(off + 2) = ((p >> 16) & 0xff).toByte
        tx += 1
      }
      ty += 1
    }
    out
  }
}

object ImageResizeBmp {
  def compute(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val img = ImageMeta.readImage(bytes)
    if (img == null) return null
    val sw = img.getWidth; val sh = img.getHeight
    if (sw < w || sh < h) return null
    val stride = ((w * 3 + 3) / 4) * 4
    val dataOff = 54
    val out = new Array[Byte](dataOff + stride * h)
    def put32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte
      out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    put32(2, out.length); put32(10, dataOff)
    put32(14, 40) // BITMAPINFOHEADER
    put32(18, w); put32(22, h)
    out(26) = 1  // planes
    out(28) = 24 // bpp
    put32(34, stride * h)
    var ty = 0
    while (ty < h) {
      val y0 = ty * sh / h; val y1 = (ty + 1) * sh / h
      var tx = 0
      while (tx < w) {
        val x0 = tx * sw / w; val x1 = (tx + 1) * sw / w
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val p = img.getRGB(x, y)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            x += 1
          }
          y += 1
        }
        val n = (x1 - x0).toLong * (y1 - y0)
        // BGR triple, bottom-up rows (the BMP layout every sibling reads)
        val off = dataOff + (h - 1 - ty) * stride + tx * 3
        out(off) = (sb / n).toByte
        out(off + 1) = (sg / n).toByte
        out(off + 2) = (sr / n).toByte
        tx += 1
      }
      ty += 1
    }
    out
  }
}
