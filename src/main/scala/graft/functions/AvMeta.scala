package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WAV/RIFF audio metadata from a `binary` column — makes the AUDIO arm of
  * the multimodal mandate real (SURVEY §2.12: image/audio/video as opaque
  * binary + typed metadata; the reference's file_type enum admits media
  * uploads, init.sql:8, and its MIME allowlist is the upload gate,
  * services/file-service/main.py:103-107). WAV is a RIFF container: "RIFF"
  * + u32 size + "WAVE", then a chunk walk — the canonical 16-byte "fmt "
  * chunk carries audio_format/channels/sample_rate/bits, and the "data"
  * chunk carries raw PCM. Everything is a little-endian byte-walk: no
  * codec, no native library — the same pure-JVM discipline as
  * [[LasMeta]]/[[GeoTiffCrs]]. Compressed codecs (MP3/AAC) stay out of
  * scope; WAV/PCM is the uncompressed interchange format a training
  * pipeline normalizes audio INTO before feature extraction.
  * Returns NULL for bytes that are not a parseable PCM WAV. */
case class WavMeta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = WavMeta.schema
  override def nullable: Boolean = true
  override def prettyName: String = "wav_meta"

  override def nullSafeEval(input: Any): Any =
    WavMeta.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = WavMeta.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, bytes =>
      s"""${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $cls.compute($bytes);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WavMeta {
  val schema: StructType = StructType(Seq(
    StructField("audio_format", IntegerType),
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("bits", IntegerType),
    StructField("n_frames", LongType),
    StructField("duration_ms", LongType)))

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
  private def fourCC(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** Header fields + data-chunk location, or None when the bytes are not a
    * RIFF/WAVE with a complete fmt chunk and a data chunk. The chunk walk
    * tolerates extra chunks (LIST/fact/bext...) and the RIFF odd-size pad
    * byte; a data chunk whose declared size overruns the buffer is clamped
    * (truncation-tolerant, never throws — hostile-bytes discipline).
    * Returns (format, channels, rate, bits, blockAlign, dataOff, dataLen). */
  def parse(bytes: Array[Byte])
      : Option[(Int, Int, Int, Int, Int, Int, Long)] = {
    if (bytes == null || bytes.length < 44) return None
    if (fourCC(bytes, 0) != "RIFF" || fourCC(bytes, 8) != "WAVE") return None
    var off = 12
    var fmt: Option[(Int, Int, Int, Int, Int)] = None
    var dataOff = -1
    var dataLen = -1L
    while (off + 8 <= bytes.length) {
      val id = fourCC(bytes, off)
      val size = u32(bytes, off + 4)
      if (size < 0 || size > Int.MaxValue) return None
      if (id == "fmt " && size >= 16 && off + 8 + 16 <= bytes.length) {
        fmt = Some((u16(bytes, off + 8), u16(bytes, off + 10),
          u32(bytes, off + 12).toInt, u16(bytes, off + 22),
          u16(bytes, off + 20)))
      } else if (id == "data" && dataOff < 0) {
        dataOff = off + 8
        dataLen = math.min(size, (bytes.length - dataOff).toLong)
      }
      off += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
      if (off <= 0) return None               // overflow guard
    }
    fmt match {
      case Some((f, ch, rate, bits, ba))
          if ch > 0 && rate > 0 && ba > 0 && dataOff >= 0 =>
        Some((f, ch, rate, bits, ba, dataOff, dataLen))
      case _ => None
    }
  }

  def compute(bytes: Array[Byte]): InternalRow = parse(bytes) match {
    case Some((f, ch, rate, bits, ba, _, dataLen)) =>
      val nFrames = dataLen / ba
      new GenericInternalRow(Array[Any](
        f, ch, rate, bits, nFrames, nFrames * 1000L / rate))
    case None => null
  }

  /** Deterministic 16-bit PCM WAV fixture from one integer seed (the q112
    * planted-fixture recipe): every header field and every sample is
    * integer algebra an external oracle mirrors —
    *
    *   channels     = 1 + seed % 2
    *   sample_rate  = 8000 + seed·37 % 40000
    *   n_frames     = 64 + seed % 192
    *   sample j     = (seed·48271 + j·16807) % 65536 − 32768
    *     (j = flat interleaved sample index, 0 ≤ j < n_frames·channels)
    *
    * so duration_ms = n_frames·1000 ∕ sample_rate (integer division) and
    * per-block PCM energies are exact integer rationals. */
  def buildWav(seed: Long): Array[Byte] = {
    val s = ((seed % 1000000000L) + 1000000000L) % 1000000000L
    val channels = (1 + s % 2).toInt
    val rate = (8000 + s * 37 % 40000).toInt
    val nFrames = (64 + s % 192).toInt
    val nTotal = nFrames * channels
    val blockAlign = channels * 2
    val dataSize = nTotal * 2
    val b = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
    b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
    b.putShort(1)                                // PCM
    b.putShort(channels.toShort)
    b.putInt(rate)
    b.putInt(rate * blockAlign)                  // byte rate
    b.putShort(blockAlign.toShort)
    b.putShort(16)                               // bits per sample
    b.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var j = 0
    while (j < nTotal) {
      val v = (s * 48271L + j.toLong * 16807L) % 65536L - 32768L
      b.putShort(v.toShort)
      j += 1
    }
    b.array()
  }
}

object WavNearDup {
  /** splitmix64 finalizer — a real per-(group, block) hash for the
    * amplitude envelope. An affine envelope (group·K + block·C mod M) is
    * NOT enough: its per-block sequence is one arithmetic progression mod
    * M with only the PHASE varying by group, so groups equal mod M share
    * the envelope exactly and their energy vectors collide at cosine 1
    * (measured before this mix was added). */
  private def mix(x0: Long): Long = {
    var x = x0
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Planted near-duplicate 16-bit PCM WAV: all members of one `group`
    * share a block-wise amplitude envelope and base sample stream; the
    * `member` adds a ±3 wiggle on samples of magnitude ≲32640, so
    * within-group 64-block energy vectors sit at centered cosine
    * ≥ 0.9999999 while cross-group envelopes (splitmix64 per block)
    * decorrelate to ≤ ~0.65 even at 10⁷ pairs (64-dim concentration:
    * std ≈ 1/8, the measured 7k-pair max is 0.55) — the q491 planted-pair
    * recipe applied to the AUDIO modality. 512 frames, 64 blocks of 8
    * samples, mono 16 kHz. */
  def buildWavGroup(group: Long, member: Long): Array[Byte] = {
    val g = ((group % 1000000000L) + 1000000000L) % 1000000000L
    val m = ((member % 64L) + 64L) % 64L
    val nFrames = 512
    val nBlocks = 64
    val dataSize = nFrames * 2
    val b = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
    b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
    b.putShort(1)                // PCM
    b.putShort(1)                // mono
    b.putInt(16000)
    b.putInt(16000 * 2)          // byte rate
    b.putShort(2)                // block align
    b.putShort(16)               // bits per sample
    b.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var j = 0
    while (j < nFrames) {
      val blk = j * nBlocks / nFrames
      val h = mix(g * 0x9E3779B97F4A7C15L + blk)
      val amp = 32L + (h & 0xFFFFL) % 224L                 // [32, 256)
      val base = (g * 48271L + j.toLong * 16807L) % 2049L - 1024L
      val v = base * amp / 8L + (m * 31L + j) % 7L - 3L
      b.putShort(v.toShort)
      j += 1
    }
    b.array()
  }
}

/** Fixture builder expression: (group, member) → planted near-duplicate
  * PCM WAV bytes (see [[WavNearDup.buildWavGroup]]). */
case class WavGroupFixture(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "wav_group_fixture"

  override def nullSafeEval(group: Any, member: Any): Any =
    WavNearDup.buildWavGroup(group.asInstanceOf[Long], member.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = WavNearDup.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (g, m) => s"${ev.value} = $cls.buildWavGroup($g, $m);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fixture builder expression: seed → deterministic PCM WAV bytes
  * (see [[WavMeta.buildWav]]). */
case class WavFixture(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "wav_fixture"

  override def nullSafeEval(input: Any): Any =
    WavMeta.buildWav(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = WavMeta.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $cls.buildWav($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** REAL audio feature extraction: per-block mean PCM energy over a 16-bit
  * WAV's sample stream — the audio sibling of [[ImageFeature64]]. The
  * sample stream (interleaved, all channels) splits into `nBlocks`
  * balanced blocks (sample j → block ⌊j·nBlocks∕n⌋, the standard balanced
  * partition — every block non-empty whenever n ≥ nBlocks); each block
  * yields Σv²∕count as a double. Integer sums (|v| ≤ 32768 ⇒ Σv² fits
  * i64 up to ~10⁹ samples per block) with ONE final division — the same
  * engine-exactness discipline as the image block means. NULL for bytes
  * that are not 16-bit PCM WAV or carry no samples. The output vector
  * feeds the embedding stack unchanged (near-dup, ANN, quantization). */
case class WavBlockEnergy(child: Expression, nBlocks: Int = 8)
    extends UnaryExpression {
  require(nBlocks >= 1 && nBlocks <= 4096, "nBlocks must be in [1, 4096]")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "wav_block_energy"

  override def nullSafeEval(input: Any): Any =
    WavBlockEnergy.compute(input.asInstanceOf[Array[Byte]], nBlocks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = WavBlockEnergy.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, bytes =>
      s"""${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $cls.compute($bytes, $nBlocks);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WavBlockEnergy {
  def compute(bytes: Array[Byte], nBlocks: Int): GenericArrayData =
    WavMeta.parse(bytes) match {
      case Some((format, _, _, bits, _, dataOff, dataLen))
          if format == 1 && bits == 16 && dataLen >= 2 =>
        val n = (dataLen / 2).toInt
        val sums = new Array[Long](nBlocks)
        val counts = new Array[Long](nBlocks)
        var j = 0
        while (j < n) {
          val lo = bytes(dataOff + 2 * j) & 0xff
          val hi = bytes(dataOff + 2 * j + 1).toInt
          val v = (hi << 8) | lo // sign comes from the high byte
          val blk = (j.toLong * nBlocks / n).toInt
          sums(blk) += v.toLong * v
          counts(blk) += 1
          j += 1
        }
        val out = new Array[Any](nBlocks)
        var k = 0
        while (k < nBlocks) {
          out(k) = if (counts(k) == 0) 0.0d else sums(k).toDouble / counts(k)
          k += 1
        }
        new GenericArrayData(out)
      case _ => null
    }
}

/** PCM decimation — keep every k-th FRAME (all channels) of a 16-bit PCM
  * WAV and rewrite the header at rate∕k: the sample-rate NORMALIZATION
  * step a training pipeline runs before featurizing mixed-rate audio
  * (decimate-to-common-rate, then [[WavBlockEnergy]]/[[WavStats]] — the
  * audio analog of [[ImageResizeBmp]]). Pure byte surgery, integer-exact:
  * output sample m of frame f IS input sample of frame f·k, so an
  * external oracle reproduces every byte. NULL for non-PCM/non-16-bit
  * bytes and for rates not divisible by k (a fractional header rate
  * would lie; resampling at arbitrary ratios needs interpolation and is
  * out of the exactness contract). No anti-alias filter by design —
  * this is frame SELECTION, documented as such, matching the
  * [[graft.operators.Multimodal.sampleFrames]] video counterpart. */
case class PcmDecimate(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1 && k <= 1024, "decimation factor must be in [1, 1024]")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "pcm_decimate"

  override def nullSafeEval(input: Any): Any =
    PcmDecimate.compute(input.asInstanceOf[Array[Byte]], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = PcmDecimate.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, bytes =>
      s"""${ev.value} = (byte[]) $cls.compute($bytes, $k);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PcmDecimate {
  def compute(bytes: Array[Byte], k: Int): Array[Byte] =
    WavMeta.parse(bytes) match {
      case Some((format, channels, rate, bits, blockAlign, dataOff, dataLen))
          if format == 1 && bits == 16 && rate % k == 0 && dataLen >= blockAlign =>
        val framesIn = (dataLen / blockAlign).toInt
        val framesOut = (framesIn + k - 1) / k
        val outData = framesOut * blockAlign
        val b = java.nio.ByteBuffer.allocate(44 + outData)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val newRate = rate / k
        b.put("RIFF".getBytes("US-ASCII")).putInt(36 + outData)
        b.put("WAVE".getBytes("US-ASCII"))
        b.put("fmt ".getBytes("US-ASCII")).putInt(16)
        b.putShort(1)
        b.putShort(channels.toShort)
        b.putInt(newRate)
        b.putInt(newRate * blockAlign)
        b.putShort(blockAlign.toShort)
        b.putShort(16)
        b.put("data".getBytes("US-ASCII")).putInt(outData)
        var f = 0
        while (f < framesOut) {
          b.put(bytes, dataOff + f * k * blockAlign, blockAlign)
          f += 1
        }
        b.array()
      case _ => null
    }
}

/** Per-clip PCM quality statistics — the audio QUALITY-FILTER primitive
  * (the audio analog of the Gopher text-quality signals): peak absolute
  * amplitude, clipped-sample count (|v| at the 16-bit rails — the
  * standard recording-defect detector), exact mean square (integer Σv²
  * with ONE final division, the [[WavBlockEnergy]] discipline), and
  * zero-crossing count (a crude pitch/noisiness signal). A training
  * pipeline drops silent (mean_square ≈ 0), clipped
  * (n_clipped/n > threshold), or DC-stuck (zero_crossings = 0) clips
  * before paying for feature extraction. NULL for bytes that are not
  * 16-bit PCM WAV or carry no samples. */
case class WavStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = WavStats.schema
  override def nullable: Boolean = true
  override def prettyName: String = "wav_stats"

  override def nullSafeEval(input: Any): Any =
    WavStats.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = WavStats.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, bytes =>
      s"""${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $cls.compute($bytes);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WavStats {
  val schema: StructType = StructType(Seq(
    StructField("n_samples", LongType),
    StructField("peak_abs", IntegerType),
    StructField("n_clipped", LongType),
    StructField("mean_square", DoubleType),
    StructField("zero_crossings", LongType)))

  def compute(bytes: Array[Byte]): InternalRow =
    WavMeta.parse(bytes) match {
      case Some((format, _, _, bits, _, dataOff, dataLen))
          if format == 1 && bits == 16 && dataLen >= 2 =>
        val n = (dataLen / 2).toInt
        var sumSq = 0L
        var peak = 0
        var clipped = 0L
        var crossings = 0L
        var prevSign = 0 // sign of the last NONZERO sample
        var j = 0
        while (j < n) {
          val lo = bytes(dataOff + 2 * j) & 0xff
          val hi = bytes(dataOff + 2 * j + 1).toInt
          val v = (hi << 8) | lo
          val a = math.abs(v)
          sumSq += v.toLong * v
          if (a > peak) peak = a
          if (v == 32767 || v == -32768) clipped += 1
          val sgn = Integer.signum(v)
          if (sgn != 0) {
            if (prevSign != 0 && sgn != prevSign) crossings += 1
            prevSign = sgn
          }
          j += 1
        }
        new GenericInternalRow(Array[Any](
          n.toLong, peak, clipped, sumSq.toDouble / n, crossings))
      case _ => null
    }
}

/** MP4/ISO-BMFF video metadata from a `binary` column — the VIDEO arm of
  * the multimodal mandate. ISO base-media files are a tree of big-endian
  * boxes (u32 size + 4CC, size 1 → u64 largesize, size 0 → to EOF): `ftyp`
  * carries the major brand, `moov`▸`mvhd` carries the presentation
  * timescale and duration (version 0 = u32 times, version 1 = u64). One
  * top-level walk + one child walk — no codec, no frame decode (frame
  * SAMPLING plans stay in [[graft.operators.Multimodal.sampleFrames]];
  * decoding the H.264 payload is genuinely out of JVM scope and remains
  * the documented stub). Returns NULL unless both ftyp and mvhd parse. */
case class Mp4Meta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = Mp4Meta.schema
  override def nullable: Boolean = true
  override def prettyName: String = "mp4_meta"

  override def nullSafeEval(input: Any): Any =
    Mp4Meta.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = Mp4Meta.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, bytes =>
      s"""${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $cls.compute($bytes);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Mp4Meta {
  val schema: StructType = StructType(Seq(
    StructField("brand", StringType),
    StructField("version", IntegerType),
    StructField("timescale", IntegerType),
    StructField("duration", LongType),
    StructField("duration_ms", LongType)))

  private def u32be(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
  private def u64be(b: Array[Byte], off: Int): Long =
    (u32be(b, off) << 32) | u32be(b, off + 4)
  private def fourCC(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** (brand, mvhdVersion, timescale, duration) or None. Walks top-level
    * boxes for `ftyp` and `moov`, then `moov`'s children for `mvhd`.
    * Handles largesize and size-0 (to-EOF) boxes; any malformed size ends
    * the walk instead of throwing. */
  def parse(bytes: Array[Byte]): Option[(String, Int, Int, Long)] = {
    if (bytes == null || bytes.length < 16) return None
    var brand: String = null
    var mvhd: Option[(Int, Int, Long)] = None

    def boxBounds(off: Int, limit: Long): Option[(String, Int, Long)] = {
      if (off + 8 > limit) return None
      val size32 = u32be(bytes, off)
      val tpe = fourCC(bytes, off + 4)
      val (payloadOff, end) =
        if (size32 == 1L) {
          if (off + 16 > limit) return None
          (off + 16, off + u64be(bytes, off + 8))
        } else if (size32 == 0L) (off + 8, limit)
        else (off + 8, off + size32)
      if (end < payloadOff || end > limit) None
      else Some((tpe, payloadOff, end))
    }

    def readMvhd(off: Int): Option[(Int, Int, Long)] = {
      val v = bytes(off) & 0xff
      if (v == 1) {
        if (off + 32 > bytes.length) None
        else Some((1, u32be(bytes, off + 20).toInt, u64be(bytes, off + 24)))
      } else {
        if (off + 20 > bytes.length) None
        else Some((0, u32be(bytes, off + 12).toInt, u32be(bytes, off + 16)))
      }
    }

    var off = 0
    val limit = bytes.length.toLong
    var guard = 0
    while (off + 8 <= limit && guard < 1024) {
      guard += 1
      boxBounds(off, limit) match {
        case Some((tpe, p, end)) =>
          if (tpe == "ftyp" && p + 4 <= end) brand = fourCC(bytes, p)
          else if (tpe == "moov") {
            var c = p
            var g2 = 0
            while (c + 8 <= end && g2 < 1024 && mvhd.isEmpty) {
              g2 += 1
              boxBounds(c, end) match {
                case Some((ct, cp, cend)) =>
                  if (ct == "mvhd") mvhd = readMvhd(cp)
                  c = cend.toInt
                case None => c = end.toInt
              }
            }
          }
          off = end.toInt
        case None => off = bytes.length
      }
    }
    (Option(brand), mvhd) match {
      case (Some(br), Some((v, ts, dur))) if ts > 0 => Some((br, v, ts, dur))
      case _ => None
    }
  }

  def compute(bytes: Array[Byte]): InternalRow = parse(bytes) match {
    case Some((brand, v, ts, dur)) =>
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(brand), v, ts, dur, dur * 1000L / ts))
    case None => null
  }

  /** Deterministic minimal MP4 fixture from one integer seed: `ftyp`
    * (brand "isom") + `moov`▸`mvhd`, alternating mvhd version 0/1 on seed
    * parity so BOTH time layouts are exercised —
    *
    *   version   = seed % 2
    *   timescale = 600 + seed·11 % 90000
    *   duration  = seed·31 % 100000000
    *
    * so duration_ms = duration·1000 ∕ timescale (integer division). */
  def buildMp4(seed: Long): Array[Byte] = {
    val s = ((seed % 1000000000L) + 1000000000L) % 1000000000L
    val version = (s % 2).toInt
    val timescale = (600 + s * 11 % 90000).toInt
    val duration = s * 31 % 100000000L
    val mvhdSize = if (version == 1) 120 else 108
    val moovSize = 8 + mvhdSize
    val b = java.nio.ByteBuffer.allocate(16 + moovSize) // big-endian default
    b.putInt(16).put("ftyp".getBytes("US-ASCII"))
    b.put("isom".getBytes("US-ASCII")).putInt(512)
    b.putInt(moovSize).put("moov".getBytes("US-ASCII"))
    b.putInt(mvhdSize).put("mvhd".getBytes("US-ASCII"))
    if (version == 1) {
      b.put(1.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      b.putLong(0L).putLong(0L)                  // creation/modification
      b.putInt(timescale)
      b.putLong(duration)
    } else {
      b.put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      b.putInt(0).putInt(0)                      // creation/modification
      b.putInt(timescale)
      b.putInt(duration.toInt)
    }
    // rate/volume/reserved/matrix/predefined/next_track — zeros suffice
    b.array()
  }
}

/** Fixture builder expression: seed → deterministic MP4 bytes
  * (see [[Mp4Meta.buildMp4]]). */
case class Mp4Fixture(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "mp4_fixture"

  override def nullSafeEval(input: Any): Any =
    Mp4Meta.buildMp4(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = Mp4Meta.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $cls.buildMp4($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
