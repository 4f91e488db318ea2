package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, IntegerType, StructField, StructType}

/** Real image-header decode for a `binary` column via JDK `javax.imageio` —
  * no external codec dependency (ImageIO ships PNG/JPEG/GIF/BMP readers in
  * every JDK). Returns struct(width, height, channels), or NULL when no
  * reader claims the bytes (TIFF/GeoTIFF/EXIF territory stays with real
  * codec libraries — callers supply their own deterministic fallback).
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

  /** (width, height, channels) when a JDK ImageIO reader decodes the bytes. */
  def decode(bytes: Array[Byte]): Option[(Int, Int, Int)] =
    try {
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) None
      else Some((img.getWidth, img.getHeight, img.getColorModel.getNumComponents))
    } catch { case scala.util.control.NonFatal(_) => None }

  def compute(bytes: Array[Byte]): InternalRow = decode(bytes) match {
    case Some((w, h, c)) => new GenericInternalRow(Array[Any](w, h, c))
    case None            => null
  }
}
