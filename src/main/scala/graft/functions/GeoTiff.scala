package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, IntegerType, StructField, StructType}

/** GeoTIFF CRS + georeferencing extraction from a `binary` column — the
  * pure-JVM closure of the reference's GDAL/rasterio metadata path
  * (services/file-service/requirements.txt:11-12 feeding `files.metadata`
  * JSONB, init.sql:49): the CRS and geotransform of a GeoTIFF are plain
  * TIFF IFD entries, no raster codec needed —
  *
  *   - tag 34735 GeoKeyDirectory (SHORTs): header + 4-short key entries;
  *     key 1024 = GTModelType (1 projected / 2 geographic), key 3072 =
  *     ProjectedCSType EPSG code, key 2048 = GeographicType EPSG code
  *   - tag 33550 ModelPixelScale (3 DOUBLEs): pixel size in model units
  *   - tag 33922 ModelTiepoint (6 DOUBLEs): raster (i,j,k) → model (X,Y,Z)
  *
  * Returns struct(epsg, model_type, scale_x, scale_y, tie_x, tie_y), NULL
  * when the bytes are not a classic TIFF or carry no GeoKeyDirectory with a
  * CRS key. Same byte-walk discipline as [[ImageMeta.tiffDims]]/[[ExifGps]]
  * (GeoTIFF 1.1 / OGC 19-008r4 key layout); never throws on hostile bytes. */
case class GeoTiffCrs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = GeoTiffCrs.schema
  override def nullable: Boolean = true
  override def prettyName: String = "geotiff_crs"

  override def nullSafeEval(input: Any): Any =
    GeoTiffCrs.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = GeoTiffCrs.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, bytes =>
      s"""${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $cls.compute($bytes);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GeoTiffCrs {
  val schema: StructType = StructType(Seq(
    StructField("epsg", IntegerType),
    StructField("model_type", IntegerType),
    StructField("scale_x", DoubleType),
    StructField("scale_y", DoubleType),
    StructField("tie_x", DoubleType),
    StructField("tie_y", DoubleType)))

  /** (epsg, modelType, scaleX, scaleY, tieX, tieY) from a classic-TIFF
    * byte block, or None. epsg prefers ProjectedCSType (3072) over
    * GeographicType (2048); 32767 ("user-defined") counts as absent. */
  def parse(bytes: Array[Byte])
      : Option[(Int, Int, Double, Double, Double, Double)] = {
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
    def f64(off: Long): Double = {
      if (off < 0 || off + 8 > bytes.length) return Double.NaN
      val lo = u32(if (le) off else off + 4)
      val hi = u32(if (le) off + 4 else off)
      java.lang.Double.longBitsToDouble((hi << 32) | lo)
    }
    if (u16(2) != 42) return None // classic TIFF only
    val ifd = u32(4)
    val n = u16(ifd)
    if (n <= 0) return None
    var geoOff = -1L; var geoCnt = -1L
    var scaleOff = -1L; var tieOff = -1L
    var i = 0
    while (i < n) {
      val e = ifd + 2 + i * 12L
      val tag = u16(e); val typ = u16(e + 2); val cnt = u32(e + 4)
      if (tag == 34735 && typ == 3 && cnt >= 8) { geoOff = u32(e + 8); geoCnt = cnt }
      else if (tag == 33550 && typ == 12 && cnt >= 3) scaleOff = u32(e + 8)
      else if (tag == 33922 && typ == 12 && cnt >= 6) tieOff = u32(e + 8)
      i += 1
    }
    if (geoOff < 0) return None
    // GeoKeyDirectory header: (KeyDirectoryVersion=1, KeyRevision, Minor,
    // NumberOfKeys); entries are (KeyID, TIFFTagLocation, Count, Value) —
    // only inline values (location 0, count 1) carry the CRS codes
    if (u16(geoOff) != 1) return None
    val nKeys = u16(geoOff + 6)
    if (nKeys <= 0 || 4L * (nKeys + 1) > geoCnt) return None
    var modelType = 0; var projected = 0; var geographic = 0
    var k = 0
    while (k < nKeys) {
      val ke = geoOff + 8 + k * 8L
      val keyId = u16(ke); val loc = u16(ke + 2); val cnt = u16(ke + 4)
      val v = u16(ke + 6)
      if (loc == 0 && cnt == 1) {
        if (keyId == 1024) modelType = v
        else if (keyId == 3072 && v != 32767) projected = v
        else if (keyId == 2048 && v != 32767) geographic = v
      }
      k += 1
    }
    val epsg = if (projected > 0) projected else geographic
    if (epsg <= 0) return None
    val sx = if (scaleOff >= 0) f64(scaleOff) else 0.0
    val sy = if (scaleOff >= 0) f64(scaleOff + 8) else 0.0
    // tiepoint doubles 4-5 are the MODEL (X, Y) of raster point 0-2
    val tx = if (tieOff >= 0) f64(tieOff + 24) else 0.0
    val ty = if (tieOff >= 0) f64(tieOff + 32) else 0.0
    if (sx.isNaN || sy.isNaN || tx.isNaN || ty.isNaN) return None
    Some((epsg, modelType, sx, sy, tx, ty))
  }

  def compute(bytes: Array[Byte]): InternalRow = parse(bytes) match {
    case Some((e, m, sx, sy, tx, ty)) =>
      new GenericInternalRow(Array[Any](e, m, sx, sy, tx, ty))
    case None => null
  }

  /** Deterministic GeoTIFF fixture from one integer seed — the q112 recipe
    * applied to the georeferencing tags: a minimal valid little-endian
    * TIFF (1×1 dims) whose GeoKeyDirectory, ModelPixelScale and
    * ModelTiepoint encode integer-derived values an external oracle can
    * recompute from the same seed:
    *
    *   even seed → projected:  epsg = 32601 + (seed/2) % 60, model 1
    *   odd seed  → geographic: epsg = 4001  + (seed/2) % 900, model 2
    *   scale_x = (100000 + seed % 900000)  / 10^6
    *   scale_y = (50000  + seed % 450000)  / 10^6
    *   tie_x   = (seed·1111 % 500000000)   / 10^6
    *   tie_y   = (seed·777  % 200000000)   / 10^6
    *
    * The byte layout is the same tag structure [[parse]] walks in real
    * GeoTIFFs (ascending IFD tags, out-of-line SHORT/DOUBLE arrays). */
  def buildGeoTiff(seed: Long): Array[Byte] = {
    val s = ((seed % 2000000000L) + 2000000000L) % 2000000000L
    val projected = s % 2 == 0
    val epsg = if (projected) 32601 + (s / 2 % 60).toInt
               else 4001 + (s / 2 % 900).toInt
    val modelType = if (projected) 1 else 2
    val sxMicro = 100000L + s % 900000L
    val syMicro = 50000L + s % 450000L
    val txMicro = s * 1111L % 500000000L
    val tyMicro = s * 777L % 200000000L
    val geoOff = 74; val scaleOff = 98; val tieOff = 122
    val buf = java.nio.ByteBuffer.allocate(170)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('I'.toByte).put('I'.toByte).putShort(42)
    buf.putInt(8)
    def entry(tag: Int, typ: Int, count: Int, value: Int, short: Boolean): Unit = {
      buf.putShort(tag.toShort).putShort(typ.toShort).putInt(count)
      if (short) { buf.putShort(value.toShort); buf.putShort(0) }
      else buf.putInt(value): Unit
    }
    buf.putShort(5)
    entry(256, 3, 1, 1, short = true)
    entry(257, 3, 1, 1, short = true)
    entry(33550, 12, 3, scaleOff, short = false)
    entry(33922, 12, 6, tieOff, short = false)
    entry(34735, 3, 12, geoOff, short = false)
    buf.putInt(0)
    // GeoKeyDirectory: version 1.1.0, 2 keys (GTModelType + the CRS key)
    Seq(1, 1, 0, 2,
      1024, 0, 1, modelType,
      if (projected) 3072 else 2048, 0, 1, epsg)
      .foreach(v => buf.putShort(v.toShort): Unit)
    buf.putDouble(sxMicro / 1000000.0).putDouble(syMicro / 1000000.0)
      .putDouble(0.0)
    buf.putDouble(0.0).putDouble(0.0).putDouble(0.0)
    buf.putDouble(txMicro / 1000000.0).putDouble(tyMicro / 1000000.0)
      .putDouble(0.0)
    buf.array()
  }
}

/** Fixture builder expression: seed → deterministic GeoTIFF bytes (see
  * [[GeoTiffCrs.buildGeoTiff]]). */
case class GeoTiffFixture(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "geotiff_fixture"

  override def nullSafeEval(input: Any): Any =
    GeoTiffCrs.buildGeoTiff(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = GeoTiffCrs.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $cls.buildGeoTiff($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
