package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, IntegerType, StructField, StructType}

/** Real image-header decode for a `binary` column via JDK `javax.imageio` —
  * no external codec dependency (ImageIO ships PNG/JPEG/GIF/BMP readers in
  * every JDK), with a pure-JVM TIFF IFD header parse as the fallback for
  * TIFF bytes ImageIO cannot decode (exotic compression, header-only files,
  * or a JDK without the TIFF plugin): width/height/samples live in plain
  * IFD tags 256/257/277, no codec needed to read them. Returns
  * struct(width, height, channels), or NULL when neither path claims the
  * bytes (full EXIF GPS / CRS extraction stays with real geo libraries —
  * callers supply their own deterministic fallback).
  *
  * Reference: the upload pipeline's metadata extraction
  * (services/file-service/main.py:128), whose pillow/rasterio backing
  * (requirements.txt:10-14) covers exactly these formats for the
  * width/height/band fields.
  */
case class ImageMeta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ImageMeta.schema
  override def nullable: Boolean = true
  override def prettyName: String = "image_meta"

  override def nullSafeEval(input: Any): Any =
    ImageMeta.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = ImageMeta.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, bytes =>
      s"""${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $cls.compute($bytes);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ImageMeta {
  val schema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType)))

  /** (width, height, channels) when a JDK ImageIO reader decodes the bytes,
    * else from the TIFF IFD header when the bytes are TIFF. */
  def decode(bytes: Array[Byte]): Option[(Int, Int, Int)] =
    (try {
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) None
      else Some((img.getWidth, img.getHeight, img.getColorModel.getNumComponents))
    } catch { case scala.util.control.NonFatal(_) => None })
      .orElse(tiffDims(bytes))

  /** TIFF width/height/samples from the first IFD — a pure byte-walk over
    * the baseline TIFF 6.0 header (byte order II/MM, magic 42, IFD offset,
    * 12-byte directory entries), reading ImageWidth (256), ImageLength (257)
    * and SamplesPerPixel (277, default 1 per spec). No decompression and no
    * codec: dimensions are header metadata, which is exactly what the
    * reference's rasterio-backed extractor reads for these fields. Returns
    * None on anything malformed — never throws on hostile bytes. */
  def tiffDims(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    if (bytes == null || bytes.length < 8) return None
    val le = bytes(0) == 'I'.toByte && bytes(1) == 'I'.toByte
    val be = bytes(0) == 'M'.toByte && bytes(1) == 'M'.toByte
    if (!le && !be) return None
    def u16(off: Long): Int = {
      if (off < 0 || off + 2 > bytes.length) return -1
      val o = off.toInt
      val a = bytes(o) & 0xff; val b = bytes(o + 1) & 0xff
      if (le) a | (b << 8) else (a << 8) | b
    }
    def u32(off: Long): Long = {
      if (off < 0 || off + 4 > bytes.length) return -1L
      val o = off.toInt
      val a = bytes(o) & 0xffL; val b = bytes(o + 1) & 0xffL
      val c = bytes(o + 2) & 0xffL; val d = bytes(o + 3) & 0xffL
      if (le) a | (b << 8) | (c << 16) | (d << 24)
      else (a << 24) | (b << 16) | (c << 8) | d
    }
    if (u16(2) != 42) return None // classic TIFF only (43 = BigTIFF)
    val ifd = u32(4)
    val n = u16(ifd)
    if (n <= 0) return None
    var width = -1L; var height = -1L; var samples = 1L
    var i = 0
    while (i < n) {
      val e = ifd + 2 + i * 12L
      val tag = u16(e)
      val typ = u16(e + 2)
      val count = u32(e + 4)
      // inline value only (count == 1, SHORT or LONG — how baseline TIFF
      // stores these three tags); SHORT is left-justified in the value field
      val v: Long =
        if (count != 1L) -1L
        else if (typ == 3) u16(e + 8).toLong
        else if (typ == 4) u32(e + 8)
        else -1L
      if (tag == 256) width = v
      else if (tag == 257) height = v
      else if (tag == 277 && v > 0) samples = v
      i += 1
    }
    if (width > 0 && width <= Int.MaxValue && height > 0 && height <= Int.MaxValue)
      Some((width.toInt, height.toInt, samples.toInt))
    else None
  }

  def compute(bytes: Array[Byte]): InternalRow = decode(bytes) match {
    case Some((w, h, c)) => new GenericInternalRow(Array[Any](w, h, c))
    case None            => null
  }
}
