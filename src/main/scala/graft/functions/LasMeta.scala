package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, IntegerType, LongType, StructField, StructType}

/** LAS point-cloud header metadata from a `binary` column — closes the
  * reference's `point_cloud` file type (init.sql:8, DECL tier: the
  * reference declares the enum but ships no parser). The LAS 1.x public
  * header block is a fixed-layout little-endian struct (ASPRS LAS spec):
  * "LASF" signature, version at bytes 24-25, point format at 104, legacy
  * point count (u32) at 107, and the XYZ bounding box as six doubles at
  * 179-226 (stored max-before-min per axis); LAS 1.4 adds the u64 point
  * count at 247. Pure byte-walk, never throws on hostile bytes — same
  * discipline as [[ImageMeta.tiffDims]]. Returns NULL for non-LAS bytes. */
case class LasMeta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LasMeta.schema
  override def nullable: Boolean = true
  override def prettyName: String = "las_meta"

  override def nullSafeEval(input: Any): Any =
    LasMeta.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = LasMeta.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, bytes =>
      s"""${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $cls.compute($bytes);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LasMeta {
  val schema: StructType = StructType(Seq(
    StructField("version_major", IntegerType),
    StructField("version_minor", IntegerType),
    StructField("point_format", IntegerType),
    StructField("n_points", LongType),
    StructField("min_x", DoubleType), StructField("max_x", DoubleType),
    StructField("min_y", DoubleType), StructField("max_y", DoubleType),
    StructField("min_z", DoubleType), StructField("max_z", DoubleType)))

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
  private def i64(b: Array[Byte], off: Int): Long =
    u32(b, off) | (u32(b, off + 4) << 32)
  private def f64(b: Array[Byte], off: Int): Double =
    java.lang.Double.longBitsToDouble(i64(b, off))

  /** Parsed header fields, or None when the bytes are not a LAS 1.x
    * public header (bad signature, impossible version, or truncated).
    * Point count: the LAS 1.4 u64 at 247 when non-zero (the legacy u32
    * is 0 by spec once the count exceeds 2³²−1), else the legacy u32. */
  def parse(bytes: Array[Byte])
      : Option[(Int, Int, Int, Long, Double, Double, Double, Double, Double, Double)] = {
    if (bytes == null || bytes.length < 227) return None
    if (bytes(0) != 'L' || bytes(1) != 'A' || bytes(2) != 'S' || bytes(3) != 'F')
      return None
    val major = bytes(24) & 0xff
    val minor = bytes(25) & 0xff
    if (major != 1 || minor > 4) return None
    val headerSize = u16(bytes, 94)
    if (headerSize < 227 || headerSize > bytes.length) return None
    val fmt = bytes(104) & 0xff
    val legacy = u32(bytes, 107)
    val n =
      if (minor >= 4 && headerSize >= 375) {
        val full = i64(bytes, 247)
        if (full != 0L) full else legacy
      } else legacy
    val maxX = f64(bytes, 179); val minX = f64(bytes, 187)
    val maxY = f64(bytes, 195); val minY = f64(bytes, 203)
    val maxZ = f64(bytes, 211); val minZ = f64(bytes, 219)
    if (Seq(maxX, minX, maxY, minY, maxZ, minZ).exists(_.isNaN)) return None
    Some((major, minor, fmt, n, minX, maxX, minY, maxY, minZ, maxZ))
  }

  def compute(bytes: Array[Byte]): InternalRow = parse(bytes) match {
    case Some((ma, mi, fmt, n, x0, x1, y0, y1, z0, z1)) =>
      new GenericInternalRow(Array[Any](ma, mi, fmt, n, x0, x1, y0, y1, z0, z1))
    case None => null
  }

  /** Deterministic LAS 1.4 header fixture from one integer seed (the q112
    * recipe): a full 375-byte public header whose fields derive from
    * integer algebra an external oracle mirrors —
    *
    *   point_format = seed % 11
    *   n_points     = seed·7 + 1
    *   min_x = (seed·13 % 340000000 − 170000000) / 10^6,
    *     max_x = min_x + (1000000 + seed % 9000000) / 10^6
    *   min_y = (seed·17 % 160000000 − 80000000) / 10^6,
    *     max_y = min_y + (500000 + seed % 4500000) / 10^6
    *   min_z = (seed % 5000000) / 10^6,
    *     max_z = min_z + (100000 + seed % 900000) / 10^6
    *
    * (the sums run in integer micros before the single /10^6 division, so
    * every double is engine-exactly reproducible). */
  def buildLas(seed: Long): Array[Byte] = {
    val s = ((seed % 1000000000L) + 1000000000L) % 1000000000L
    val b = java.nio.ByteBuffer.allocate(375)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("LASF".getBytes("US-ASCII"))          // 0 signature
    b.putShort(0).putShort(0)                    // 4 source id, 6 encoding
    b.position(24)
    b.put(1.toByte).put(4.toByte)                // 24 version 1.4
    b.position(90)
    b.putShort(1).putShort(2026.toShort)         // 90 DOY, 92 year
    b.putShort(375.toShort)                      // 94 header size
    b.putInt(375)                                // 96 offset to point data
    b.putInt(0)                                  // 100 number of VLRs
    val nPts = s * 7 + 1
    b.put((s % 11).toByte)                       // 104 point format
    b.putShort(20.toShort)                       // 105 record length
    b.putInt((nPts & 0xffffffffL).toInt)         // 107 legacy count
    b.position(131)
    b.putDouble(0.001).putDouble(0.001).putDouble(0.001) // 131 scales
    b.putDouble(0.0).putDouble(0.0).putDouble(0.0)       // 155 offsets
    val minXu = s * 13 % 340000000L - 170000000L
    val maxXu = minXu + 1000000L + s % 9000000L
    val minYu = s * 17 % 160000000L - 80000000L
    val maxYu = minYu + 500000L + s % 4500000L
    val minZu = s % 5000000L
    val maxZu = minZu + 100000L + s % 900000L
    b.putDouble(maxXu / 1000000.0).putDouble(minXu / 1000000.0) // 179, 187
    b.putDouble(maxYu / 1000000.0).putDouble(minYu / 1000000.0) // 195, 203
    b.putDouble(maxZu / 1000000.0).putDouble(minZu / 1000000.0) // 211, 219
    b.position(247)
    b.putLong(nPts)                              // 247 LAS 1.4 u64 count
    b.array()
  }
}

/** Fixture builder expression: seed → deterministic LAS 1.4 header bytes
  * (see [[LasMeta.buildLas]]). */
case class LasFixture(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "las_fixture"

  override def nullSafeEval(input: Any): Any =
    LasMeta.buildLas(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = LasMeta.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $cls.buildLas($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
