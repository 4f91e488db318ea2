package graft

import org.apache.spark.sql.functions._
import graft.functions.{Mp4Meta, WavBlockEnergy, WavMeta}

/** Audio/video modality goldens (q493-q495): the WAV/RIFF chunk walk, the
  * per-block PCM energy feature, and the MP4 mvhd box walk — fixture
  * round-trips, brute-force parity, hostile-bytes robustness, and
  * real-layout variations the planted fixtures don't exercise (extra
  * chunks, odd-size padding, largesize boxes). */
class AvMetaSpec extends SparkSuite {
  import spark.implicits._

  private def sample(s: Long, j: Long): Long =
    (s * 48271L + j * 16807L) % 65536L - 32768L

  // ---- WAV header ----

  test("WavMeta: round-trips the fixture algebra across seeds") {
    for (seed <- Seq(0L, 1L, 7L, 42L, 1499L, 987654L)) {
      val got = WavMeta.parse(WavMeta.buildWav(seed))
      assert(got.isDefined, s"seed $seed")
      val (f, ch, rate, bits, ba, _, dataLen) = got.get
      val expCh = (1 + seed % 2).toInt
      val expRate = (8000 + seed * 37 % 40000).toInt
      val expFrames = 64 + seed % 192
      assert(f == 1 && bits == 16, s"seed $seed")
      assert(ch == expCh && rate == expRate, s"seed $seed")
      assert(ba == expCh * 2, s"seed $seed")
      assert(dataLen / ba == expFrames, s"seed $seed")
    }
  }

  test("WavMeta: tolerates extra chunks before data and odd-size padding") {
    // RIFF with a 3-byte LIST chunk (pad byte) between fmt and data
    val pcm = Array[Byte](0x01, 0x00, 0x02, 0x00) // two frames, mono 16-bit
    val b = java.nio.ByteBuffer.allocate(44 + 3 + 1 + 8 + pcm.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + 3 + 1 + 8 + pcm.length)
    b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
    b.putShort(1).putShort(1).putInt(8000).putInt(16000)
    b.putShort(2).putShort(16)
    b.put("LIST".getBytes("US-ASCII")).putInt(3)
    b.put(Array[Byte](1, 2, 3, 0)) // 3 bytes + the word-align pad
    b.put("data".getBytes("US-ASCII")).putInt(pcm.length)
    b.put(pcm)
    val got = WavMeta.parse(b.array())
    assert(got.isDefined)
    val (_, ch, rate, _, _, _, dataLen) = got.get
    assert(ch == 1 && rate == 8000 && dataLen == 4)
  }

  test("WavMeta: hostile bytes give null, not a throw") {
    assert(WavMeta.parse(null).isEmpty)
    assert(WavMeta.parse(Array[Byte]()).isEmpty)
    assert(WavMeta.parse("RIFFxxxxNOPE".getBytes ++ Array.fill[Byte](40)(0)).isEmpty)
    assert(WavMeta.parse(Array.fill[Byte](64)(0x52)).isEmpty)
    // declared data size overrunning the buffer is clamped, not a throw
    val w = WavMeta.buildWav(5L)
    val truncated = w.take(w.length - 10)
    val got = WavMeta.parse(truncated)
    assert(got.isDefined && got.get._7 == (got.get._7 / 2) * 2)
  }

  test("WavMeta: compute duration is integer-division exact") {
    val seed = 321L
    val row = WavMeta.compute(WavMeta.buildWav(seed))
    val rate = 8000 + seed * 37 % 40000
    val frames = 64 + seed % 192
    assert(row.getLong(4) == frames)
    assert(row.getLong(5) == frames * 1000L / rate)
  }

  // ---- WAV block energy ----

  test("WavBlockEnergy: brute parity with the sample formula") {
    for (seed <- Seq(0L, 3L, 11L, 250L)) {
      val got = WavBlockEnergy.compute(WavMeta.buildWav(seed), 8)
      assert(got != null, s"seed $seed")
      val ch = 1 + seed % 2
      val n = (ch * (64 + seed % 192)).toInt
      val sums = new Array[Long](8); val counts = new Array[Long](8)
      for (j <- 0 until n) {
        val v = sample(seed, j)
        val blk = (j * 8 / n).toInt
        sums(blk) += v * v; counts(blk) += 1
      }
      for (k <- 0 until 8)
        assert(got.getDouble(k) == sums(k).toDouble / counts(k),
          s"seed $seed block $k")
    }
  }

  test("WavBlockEnergy: non-PCM and non-WAV bytes give null") {
    assert(WavBlockEnergy.compute("junk".getBytes, 8) == null)
    // 8-bit WAV: parseable header but not the 16-bit contract
    val b = java.nio.ByteBuffer.allocate(44 + 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(40)
    b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
    b.putShort(1).putShort(1).putInt(8000).putInt(8000)
    b.putShort(1).putShort(8)
    b.put("data".getBytes("US-ASCII")).putInt(4)
    b.put(Array[Byte](1, 2, 3, 4))
    assert(WavMeta.parse(b.array()).isDefined)
    assert(WavBlockEnergy.compute(b.array(), 8) == null)
  }

  test("audioBlockEnergy feeds the embedding stack: planted near-dup audio") {
    // same-group clips differ only in seed offsets that perturb every
    // sample by the same LCG step — cosine between energy vectors of the
    // SAME seed must be 1, different seeds well below
    val e = graft.operators.Multimodal.audioBlockEnergy(
      org.apache.spark.sql.GraftColumnBridge.column(
        graft.functions.WavFixture(
          org.apache.spark.sql.GraftColumnBridge.expression(col("seed")))))
    val rows = Seq(1L, 1L, 9L).toDF("seed").select(e.as("v"))
      .as[Seq[Double]].collect()
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    assert(cos(rows(0), rows(1)) == 1.0)
    assert(rows(0) != rows(2))
  }

  // ---- MP4 mvhd ----

  test("Mp4Meta: round-trips both mvhd versions") {
    for (seed <- Seq(0L, 1L, 2L, 43L, 1500L, 999999L)) {
      val got = Mp4Meta.parse(Mp4Meta.buildMp4(seed))
      val expV = (seed % 2).toInt
      val expTs = (600 + seed * 11 % 90000).toInt
      val expDur = seed * 31 % 100000000L
      assert(got.contains(("isom", expV, expTs, expDur)), s"seed $seed: $got")
    }
  }

  test("Mp4Meta: largesize box and trailing free box are handled") {
    val base = Mp4Meta.buildMp4(4L) // v0, 108-byte mvhd
    // rewrap moov as a largesize box: size=1 + u64, then the payload
    val moovOff = 16
    val moovSize = 8 + 108
    val b = java.nio.ByteBuffer.allocate(base.length + 8 + 8)
    b.put(base, 0, 16)                       // ftyp unchanged
    b.putInt(1).put("moov".getBytes("US-ASCII"))
    b.putLong(16L + moovSize - 8)            // largesize covers header+payload
    b.put(base, moovOff + 8, moovSize - 8)   // original moov children
    b.putInt(8).put("free".getBytes("US-ASCII"))
    val got = Mp4Meta.parse(b.array())
    val exp = Mp4Meta.parse(base)
    assert(got == exp && got.isDefined)
  }

  test("Mp4Meta: hostile bytes give null, not a throw") {
    assert(Mp4Meta.parse(null).isEmpty)
    assert(Mp4Meta.parse(Array[Byte]()).isEmpty)
    assert(Mp4Meta.parse(Array.fill[Byte](64)(0x00)).isEmpty)
    assert(Mp4Meta.parse("ftypisomisomisom".getBytes).isEmpty)
    // ftyp without moov → null
    val b = java.nio.ByteBuffer.allocate(16)
    b.putInt(16).put("ftyp".getBytes("US-ASCII"))
    b.put("isom".getBytes("US-ASCII")).putInt(0)
    assert(Mp4Meta.parse(b.array()).isEmpty)
    // declared box size past EOF ends the walk cleanly
    val c = java.nio.ByteBuffer.allocate(12)
    c.putInt(4096).put("moov".getBytes("US-ASCII")).putInt(0)
    assert(Mp4Meta.parse(c.array()).isEmpty)
  }

  test("mp4Meta duration_ms drives sampleFrames") {
    val m = graft.operators.Multimodal.mp4Meta(
      org.apache.spark.sql.GraftColumnBridge.column(
        graft.functions.Mp4Fixture(
          org.apache.spark.sql.GraftColumnBridge.expression(col("seed")))))
    val df = Seq(2L).toDF("seed")
      .select(struct(lit("video").as("media_type"), lit(0).as("width"),
        lit(0).as("height"), lit(0).as("n_channels"),
        m.getField("duration_ms").as("duration_ms")).as("media_meta"))
    val frames = graft.operators.Multimodal
      .sampleFrames(df, stepMs = 1000L).count()
    val durMs = (2L * 31 % 100000000L) * 1000L / (600 + 2 * 11 % 90000)
    assert(frames == durMs / 1000 + (if (durMs % 1000 != 0) 1 else 0))
  }
}
