package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, IntegerType, StructField, StructType}

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

  /** Decode in-memory image bytes through an EXPLICIT memory-cached
    * ImageIO stream, or null when the bytes don't decode. ImageIO's
    * default ImageInputStream for a plain InputStream is a TEMP FILE per
    * decode (FileCacheImageInputStream) — pure fs churn for byte arrays;
    * at 15k tiny images × 32 executor threads it dominated the decode ~5×
    * (q491: 8.5 → 1.7 s at sf0.1). Passing MemoryCacheImageInputStream at
    * the call site keeps the fix WITHOUT mutating the JVM-global
    * ImageIO.setUseCache flag for unrelated ImageIO users in the same
    * process (round-8 advice). ImageIO.read(ImageInputStream) closes the
    * stream itself on success; the finally-close covers the null/throw
    * paths and is idempotent. */
  private[graft] def readImage(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    if (bytes == null) return null
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new ByteArrayInputStream(bytes))
    try javax.imageio.ImageIO.read(iis)
    catch { case scala.util.control.NonFatal(_) => null }
    finally { try iis.close() catch { case scala.util.control.NonFatal(_) => () } }
  }

  /** (width, height, channels) when a JDK ImageIO reader decodes the bytes,
    * else from the TIFF IFD header when the bytes are TIFF. */
  def decode(bytes: Array[Byte]): Option[(Int, Int, Int)] =
    (Option(readImage(bytes))
      .map(img => (img.getWidth, img.getHeight, img.getColorModel.getNumComponents)))
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

  // ------------------------------------------------------------------
  // EXIF GPS — reference: the upload pipeline's metadata extractor models
  // GPS as lat/lon floats (shared/models/__init__.py:122-128, populated at
  // services/file-service/main.py:128). GPS tags are plain IFD metadata
  // (IFD0 tag 0x8825 points at a GPS sub-IFD of refs + degree/minute/second
  // RATIONALs), so they are a pure byte-walk in both TIFF files and the
  // TIFF block embedded in a JPEG APP1/Exif segment — no codec needed,
  // exactly like the dimension tags above. Only the CRS field stays out of
  // reach (it genuinely needs GDAL).
  // ------------------------------------------------------------------

  /** Decimal-degree (lat, lon) from EXIF GPS metadata: TIFF bytes walk
    * IFD0 directly; JPEG bytes first locate the APP1/Exif segment and walk
    * the TIFF block inside it. None when the bytes carry no GPS IFD or any
    * structure is malformed — never throws on hostile bytes. */
  def gps(bytes: Array[Byte]): Option[(Double, Double)] = {
    if (bytes == null || bytes.length < 8) None
    else if ((bytes(0) & 0xff) == 0xFF && (bytes(1) & 0xff) == 0xD8)
      jpegExifTiff(bytes).flatMap(tiffGps)
    else tiffGps(bytes)
  }

  /** The TIFF block inside a JPEG's APP1/Exif segment ("Exif\0\0" header;
    * EXIF 2.3 §4.7.2) — offsets inside that block are relative to its own
    * TIFF header, so the copied slice walks like a standalone TIFF. Stops
    * at SOS/EOI: APP segments precede scan data by construction. */
  private def jpegExifTiff(bytes: Array[Byte]): Option[Array[Byte]] = {
    var p = 2
    while (p + 4 <= bytes.length) {
      if ((bytes(p) & 0xff) != 0xFF) return None
      val marker = bytes(p + 1) & 0xff
      if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD8)) p += 2
      else if (marker == 0xD9 || marker == 0xDA) return None
      else {
        val len = ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff)
        if (len < 2 || p + 2 + len > bytes.length) return None
        if (marker == 0xE1 && len >= 10 &&
            bytes(p + 4) == 'E'.toByte && bytes(p + 5) == 'x'.toByte &&
            bytes(p + 6) == 'i'.toByte && bytes(p + 7) == 'f'.toByte &&
            bytes(p + 8) == 0 && bytes(p + 9) == 0)
          return Some(java.util.Arrays.copyOfRange(bytes, p + 10, p + 2 + len))
        p += 2 + len
      }
    }
    None
  }

  /** GPS (lat, lon) from a TIFF byte block: IFD0 → GPSInfo pointer (tag
    * 0x8825) → GPS IFD tags 1/3 (N|S / E|W refs, ASCII) and 2/4 (three
    * RATIONALs: degrees, minutes, seconds). lat = ±(d + m/60 + s/3600).
    * Requires both refs and both coordinate triples; a zero-denominator
    * RATIONAL is accepted only as an explicit 0/… zero component. */
  def tiffGps(bytes: Array[Byte]): Option[(Double, Double)] = {
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
    if (u16(2) != 42) return None
    val ifd = u32(4)
    val n = u16(ifd)
    if (n <= 0) return None
    var gpsOff = -1L
    var i = 0
    while (i < n) {
      val e = ifd + 2 + i * 12L
      if (u16(e) == 0x8825 && u32(e + 4) == 1L) {
        val typ = u16(e + 2)
        if (typ == 4) gpsOff = u32(e + 8)
        else if (typ == 3) gpsOff = u16(e + 8).toLong
      }
      i += 1
    }
    if (gpsOff <= 0) return None
    val m = u16(gpsOff)
    if (m <= 0) return None
    var latRef = 0; var lonRef = 0
    var latOff = -1L; var lonOff = -1L
    var j = 0
    while (j < m) {
      val e = gpsOff + 2 + j * 12L
      val tag = u16(e); val typ = u16(e + 2); val cnt = u32(e + 4)
      if (typ == 2 && cnt >= 1 && e + 8 < bytes.length) {
        if (tag == 1) latRef = bytes((e + 8).toInt) & 0xff
        else if (tag == 3) lonRef = bytes((e + 8).toInt) & 0xff
      } else if (typ == 5 && cnt == 3) {
        if (tag == 2) latOff = u32(e + 8)
        else if (tag == 4) lonOff = u32(e + 8)
      }
      j += 1
    }
    def rat(o: Long): Option[Double] = {
      val nu = u32(o); val de = u32(o + 4)
      if (nu < 0 || de < 0) None
      else if (de == 0) { if (nu == 0) Some(0.0) else None }
      else Some(nu.toDouble / de.toDouble)
    }
    def dms(off: Long): Option[Double] =
      if (off < 0) None
      else for (d <- rat(off); mi <- rat(off + 8); s <- rat(off + 16))
        yield d + mi / 60.0 + s / 3600.0
    for {
      latAbs <- dms(latOff)
      lonAbs <- dms(lonOff)
      latSign <- latRef match {
        case 'N' => Some(1.0) case 'S' => Some(-1.0) case _ => None }
      lonSign <- lonRef match {
        case 'E' => Some(1.0) case 'W' => Some(-1.0) case _ => None }
    } yield (latSign * latAbs, lonSign * lonAbs)
  }

  def computeGps(bytes: Array[Byte]): InternalRow = gps(bytes) match {
    case Some((lat, lon)) => new GenericInternalRow(Array[Any](lat, lon))
    case None             => null
  }

  /** Deterministic EXIF fixture: a minimal valid little-endian TIFF whose
    * GPS IFD encodes |latMicro|/10^6 degrees (ref N/S by sign) and
    * |lonMicro|/10^6 degrees (ref E/W) as (micro, 10^6), (0,1), (0,1)
    * degree/minute/second RATIONALs — so extraction recovers exactly
    * micro/10^6, reproducible by an external oracle from the same integers.
    * Synthesized because the sandbox ships no EXIF-writing codec; the
    * byte layout is the same structure [[tiffGps]] walks in real files. */
  def buildTiffGps(latMicro: Long, lonMicro: Long): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(152)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('I'.toByte).put('I'.toByte).putShort(42)
    buf.putInt(8)
    def entry(tag: Int, typ: Int, count: Int, value: Int, short: Boolean): Unit = {
      buf.putShort(tag.toShort).putShort(typ.toShort).putInt(count)
      if (short) { buf.putShort(value.toShort); buf.putShort(0) }
      else buf.putInt(value): Unit
    }
    def ascii(tag: Int, ch: Char): Unit = {
      buf.putShort(tag.toShort).putShort(2).putInt(2)
      buf.put(ch.toByte).put(0.toByte).put(0.toByte).put(0.toByte): Unit
    }
    // IFD0: 1x1 dims + the GPS pointer (GPS IFD at byte 50)
    buf.putShort(3)
    entry(256, 3, 1, 1, short = true)
    entry(257, 3, 1, 1, short = true)
    entry(0x8825, 4, 1, 50, short = false)
    buf.putInt(0)
    // GPS IFD: refs inline, coordinate triples at 104/128
    buf.putShort(4)
    ascii(1, if (latMicro >= 0) 'N' else 'S')
    entry(2, 5, 3, 104, short = false)
    ascii(3, if (lonMicro >= 0) 'E' else 'W')
    entry(4, 5, 3, 128, short = false)
    buf.putInt(0)
    def rats(micro: Long): Unit = {
      buf.putInt(math.abs(micro).toInt).putInt(1000000)
      buf.putInt(0).putInt(1)
      buf.putInt(0).putInt(1): Unit
    }
    rats(latMicro); rats(lonMicro)
    buf.array()
  }

  /** Fixture variant wrapped in a minimal JPEG (SOI + APP1/Exif + EOI) —
    * exercises the [[jpegExifTiff]] segment walk end-to-end. */
  def buildJpegGps(latMicro: Long, lonMicro: Long): Array[Byte] = {
    val tiff = buildTiffGps(latMicro, lonMicro)
    val segLen = 2 + 6 + tiff.length
    val out = java.nio.ByteBuffer.allocate(2 + 2 + segLen + 2)
    out.put(0xFF.toByte).put(0xD8.toByte)
    out.put(0xFF.toByte).put(0xE1.toByte)
    out.put(((segLen >> 8) & 0xff).toByte).put((segLen & 0xff).toByte)
    out.put("Exif".getBytes("US-ASCII")).put(0.toByte).put(0.toByte)
    out.put(tiff)
    out.put(0xFF.toByte).put(0xD9.toByte)
    out.array()
  }
}

/** EXIF GPS (lat, lon) decimal degrees from a `binary` column — TIFF or
  * JPEG/Exif bytes (see [[ImageMeta.gps]]); NULL when no GPS IFD is
  * present. Reference: services/file-service/main.py:128 populating the
  * lat/lon floats of shared/models/__init__.py:122-128. */
case class ExifGps(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ExifGps.schema
  override def nullable: Boolean = true
  override def prettyName: String = "exif_gps"

  override def nullSafeEval(input: Any): Any =
    ImageMeta.computeGps(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = ImageMeta.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, bytes =>
      s"""${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $cls.computeGps($bytes);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ExifGps {
  val schema: StructType = StructType(Seq(
    StructField("lat", DoubleType),
    StructField("lon", DoubleType)))
}

/** Deterministic EXIF-bearing TIFF bytes from (latMicro, lonMicro) long
  * columns — the gate fixture for [[ExifGps]] ([[ImageMeta.buildTiffGps]]).
  */
case class TiffGpsFixture(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "tiff_gps_fixture"

  override def nullSafeEval(lat: Any, lon: Any): Any =
    ImageMeta.buildTiffGps(lat.asInstanceOf[Long], lon.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = ImageMeta.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (lat, lon) =>
      s"${ev.value} = $cls.buildTiffGps($lat, $lon);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
