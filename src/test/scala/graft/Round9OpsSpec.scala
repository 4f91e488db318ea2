package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Round-9 hardening: the round-8 kernels (ImageCropBmp, ImageResizeBmp,
  * PcmDecimate, WavStats, HashedNgramVector) reached their final form after
  * the round-8 fuzz sweep (commit 1ca0657), so this suite extends the
  * hostile-input discipline to each of them — exact-boundary windows,
  * 1-frame PCM, astral-plane text, null tokens — plus the null-token
  * window contract fixed per the round-8 advice. */
class Round9OpsSpec extends SparkSuite {
  import graft.functions._

  private def toks(ss: String*): GenericArrayData =
    new GenericArrayData(ss.map(s =>
      if (s == null) null else UTF8String.fromString(s)).toArray[Any])

  test("round-8 kernels: fuzz sweep never throws (random, truncated, bit-flipped)") {
    val rnd = new scala.util.Random(20260909L)
    val kernels: Seq[(String, Array[Byte] => Any)] = Seq(
      ("ImageCropBmp", (b: Array[Byte]) => ImageCropBmp.compute(b, 0, 0, 4, 4)),
      ("ImageCropBmp@far", (b: Array[Byte]) => ImageCropBmp.compute(b, 1 << 30, 1 << 30, 4096, 4096)),
      ("ImageResizeBmp", (b: Array[Byte]) => ImageResizeBmp.compute(b, 4, 4)),
      ("PcmDecimate", (b: Array[Byte]) => PcmDecimate.compute(b, 2)),
      ("PcmDecimate@k1", (b: Array[Byte]) => PcmDecimate.compute(b, 1)),
      ("WavStats", WavStats.compute _))
    val seeds: Seq[Array[Byte]] = Seq(
      ImageFeature64.buildBmp(21L, 3L), WavMeta.buildWav(20260909L),
      ImageResizeBmp.compute(ImageFeature64.buildBmp(21L, 3L), 8, 8))
    def noThrow(tag: String, bytes: Array[Byte]): Unit =
      kernels.foreach { case (name, k) =>
        try { k(bytes); () } catch {
          case e: Throwable => fail(s"$name threw on $tag: $e")
        }
      }
    Seq(0, 1, 7, 44, 54, 128, 600).foreach { len =>
      (1 to 40).foreach { i =>
        val b = new Array[Byte](len); rnd.nextBytes(b)
        noThrow(s"random[$len]#$i", b)
      }
    }
    seeds.foreach { s =>
      (0 to s.length by math.max(1, s.length / 37)).foreach { k =>
        noThrow(s"truncated@$k/${s.length}", java.util.Arrays.copyOf(s, k))
      }
    }
    seeds.foreach { s =>
      (1 to 60).foreach { i =>
        val b = s.clone()
        (1 to 3).foreach { _ => b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte }
        noThrow(s"bitflip#$i", b)
      }
    }
  }

  test("ImageCropBmp: window at exact image bounds crops; one past returns null") {
    val bmp = ImageFeature64.buildBmp(5L, 1L)
    val Some((w, h, _)) = ImageMeta.decode(bmp)
    // full-image crop at the exact boundary — every pixel must survive
    val full = ImageCropBmp.compute(bmp, 0, 0, w, h)
    assert(full != null, "full-bounds crop must succeed")
    assert(ImageMeta.decode(full).contains((w, h, 3)))
    // bottom-right 1×1 at the far corner (x+w == W, y+h == H exactly)
    val corner = ImageCropBmp.compute(bmp, w - 1, h - 1, 1, 1)
    assert(corner != null, "corner crop at exact bounds must succeed")
    val src = ImageMeta.readImage(bmp)
    val got = ImageMeta.readImage(corner)
    assert((got.getRGB(0, 0) & 0xffffff) == (src.getRGB(w - 1, h - 1) & 0xffffff))
    // one pixel past the boundary in each axis → null, never clamp
    assert(ImageCropBmp.compute(bmp, 1, 0, w, 1) == null)
    assert(ImageCropBmp.compute(bmp, 0, 1, 1, h) == null)
    // near-Int.MaxValue origin must not overflow past the guard
    assert(ImageCropBmp.compute(bmp, Int.MaxValue - 2, 0, 3, 1) == null)
  }

  test("ImageResizeBmp: same-size resize is pixel-exact; upscale is null") {
    val bmp = ImageFeature64.buildBmp(9L, 2L)
    val Some((w, h, _)) = ImageMeta.decode(bmp)
    val same = ImageResizeBmp.compute(bmp, w, h)
    assert(same != null)
    val a = ImageMeta.readImage(bmp); val b = ImageMeta.readImage(same)
    (0 until h).foreach { y =>
      (0 until w).foreach { x =>
        assert((a.getRGB(x, y) & 0xffffff) == (b.getRGB(x, y) & 0xffffff),
          s"same-size resize changed pixel ($x,$y)")
      }
    }
    // 1×1 target = global truncating channel means
    val one = ImageResizeBmp.compute(bmp, 1, 1)
    assert(one != null && ImageMeta.decode(one).contains((1, 1, 3)))
    // upscale violates the exactness contract → null
    assert(ImageResizeBmp.compute(bmp, w + 1, h) == null)
    assert(ImageResizeBmp.compute(bmp, w, h + 1) == null)
  }

  private def oneFrameWav(rate: Int, l: Short, r: Short): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(44 + 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + 4)
    b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
    b.putShort(1); b.putShort(2)          // PCM, stereo
    b.putInt(rate); b.putInt(rate * 4)
    b.putShort(4); b.putShort(16)         // blockAlign, bits
    b.put("data".getBytes("US-ASCII")).putInt(4)
    b.putShort(l); b.putShort(r)
    b.array()
  }

  test("PcmDecimate: 1-frame PCM — k=1 identity, k=2 keeps the frame at half rate, k∤rate null") {
    val wav = oneFrameWav(8000, 1234, -567)
    val id = PcmDecimate.compute(wav, 1)
    assert(id != null && java.util.Arrays.equals(id, wav),
      "k=1 on a canonical 44-byte-header WAV must be byte-identical")
    val half = PcmDecimate.compute(wav, 2)
    assert(half != null, "1 frame, k=2: ceil(1/2)=1 frame survives")
    WavMeta.parse(half) match {
      case Some((fmt, ch, rate, bits, ba, off, len)) =>
        assert(fmt == 1 && ch == 2 && rate == 4000 && bits == 16 && ba == 4 && len == 4)
        // the surviving frame IS input frame 0
        assert(half(off) == wav(44) && half(off + 1) == wav(45) &&
          half(off + 2) == wav(46) && half(off + 3) == wav(47))
      case None => fail("decimated 1-frame WAV did not re-parse")
    }
    // 8000 % 3 != 0 → a truthful header rate is impossible → null
    assert(PcmDecimate.compute(wav, 3) == null)
    // truncate below one full frame → null (dataLen < blockAlign)
    val hdrOnly = java.util.Arrays.copyOf(wav, 44)
    assert(PcmDecimate.compute(hdrOnly, 1) == null)
  }

  test("WavStats: 1-frame edges — rails count as clipped, zero crossings need sign flips") {
    val rails = WavStats.compute(oneFrameWav(8000, 32767, -32768))
    assert(rails != null)
    assert(rails.getLong(0) == 2L)        // n_samples
    assert(rails.getInt(1) == 32768)      // peak_abs
    assert(rails.getLong(2) == 2L)        // both samples at the rails
    assert(rails.getLong(4) == 1L)        // + → − is one crossing
    val silent = WavStats.compute(oneFrameWav(8000, 0, 0))
    assert(silent != null && silent.getInt(1) == 0 && silent.getLong(4) == 0L)
    assert(silent.getDouble(3) == 0.0)    // mean_square of silence
  }

  test("HashedNgramVector: a null token voids its whole window (SQL ||-concat semantics)") {
    val dim = 32
    // every bigram window touches the null → zero vector
    val mid = HashedNgramVector.compute(toks("a", null, "b"), dim, 2)
    assert((0 until dim).forall(i => mid.getDouble(i) == 0.0),
      "windows (a,null) and (null,b) must both vanish")
    // trailing null voids only the second window: result == vector of [a,b]
    val lead = HashedNgramVector.compute(toks("a", "b", null), dim, 2)
    val pure = HashedNgramVector.compute(toks("a", "b"), dim, 2)
    assert((0 until dim).forall(i => lead.getDouble(i) == pure.getDouble(i)),
      "the (a,b) window must count exactly once, the (b,null) window not at all")
    assert((0 until dim).map(pure.getDouble).map(math.abs).sum == 1.0)
  }

  test("PatchBmp: quadrant (0,0) is member-invariant, everything else decorrelates") {
    val a = ImageMeta.readImage(PatchBmp.build(7L, 0L))
    val b = ImageMeta.readImage(PatchBmp.build(7L, 3L))
    val c = ImageMeta.readImage(PatchBmp.build(8L, 0L))
    // shared patch: pixel-exact across members of one group
    (0 until 8).foreach { y =>
      (0 until 8).foreach { x =>
        assert(a.getRGB(x, y) == b.getRGB(x, y), s"shared patch differs at ($x,$y)")
      }
    }
    // private quadrants: members differ somewhere in each of the other three
    Seq((8, 0), (0, 8), (8, 8)).foreach { case (qx, qy) =>
      assert((0 until 8).exists(y => (0 until 8).exists(x =>
        a.getRGB(qx + x, qy + y) != b.getRGB(qx + x, qy + y))),
        s"quadrant ($qx,$qy) identical across members — not private")
    }
    // groups do not share the (0,0) patch
    assert((0 until 8).exists(y => (0 until 8).exists(x =>
      a.getRGB(x, y) != c.getRGB(x, y))), "tile 0 identical across groups")
  }

  test("ImageCropAtBmp: per-row position equals the literal-window kernel; hostile x is null") {
    val bmp = PatchBmp.build(3L, 1L)
    Seq((0L, 0L), (8L, 0L), (0L, 8L), (8L, 8L)).foreach { case (x, y) =>
      val dyn = ImageCropBmp.computeAt(bmp, x, y, 8, 8)
      val lit = ImageCropBmp.compute(bmp, x.toInt, y.toInt, 8, 8)
      assert(dyn != null && java.util.Arrays.equals(dyn, lit),
        s"dynamic crop at ($x,$y) diverged from the literal kernel")
    }
    assert(ImageCropBmp.computeAt(bmp, -1L, 0L, 8, 8) == null)
    assert(ImageCropBmp.computeAt(bmp, 0L, -1L, 8, 8) == null)
    assert(ImageCropBmp.computeAt(bmp, Long.MaxValue, 0L, 8, 8) == null)
    assert(ImageCropBmp.computeAt(bmp, Int.MaxValue.toLong + 1L, 0L, 8, 8) == null)
    assert(ImageCropBmp.computeAt(bmp, 9L, 0L, 8, 8) == null) // past the edge
  }

  test("HashedNgramVector + WordShingles: astral-plane text hashes by UTF-8 bytes") {
    val emoji = Seq("😀😁", "🍕", "text𐀀mix")
    val dim = 64
    val vec = HashedNgramVector.compute(toks(emoji: _*), dim, 2)
    // direct md5-of-UTF8 oracle, same rule the DuckDB gate uses
    val acc = new Array[Double](dim)
    emoji.sliding(2).foreach { g =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(g.mkString(" ").getBytes("UTF-8")).map(b => f"$b%02x").mkString
      val bucket = (java.lang.Long.parseLong(hex.take(15), 16) % dim).toInt
      acc(bucket) += (if (Integer.parseInt(hex.substring(15, 16), 16) % 2 == 0) 1 else -1)
    }
    (0 until dim).foreach(i => assert(vec.getDouble(i) == acc(i),
      s"astral-plane bigram hashing diverged at bucket $i"))
    // WordShingles joins astral tokens byte-exactly (UTF8String concat)
    val sh = WordShingles.compute(toks(emoji: _*), 2, false)
    assert(sh.numElements() == 2)
    assert(sh.getUTF8String(0).toString == emoji(0) + " " + emoji(1))
    assert(sh.getUTF8String(1).toString == emoji(1) + " " + emoji(2))
  }
}
