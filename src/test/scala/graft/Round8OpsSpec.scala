package graft

import org.apache.spark.sql.functions._

/** Round-8 additions: the shared Holt rounding core (the round-7 verdict's
  * q492 fix), bench/fixture hygiene, and the audio/multimodal end-to-end
  * gates' building blocks. */
class Round8OpsSpec extends SparkSuite {
  import spark.implicits._
  import graft.operators.Analyses

  test("halfAway6: sign-split half-away-from-zero floor semantics") {
    assert(Analyses.halfAway6(1.2345675) == math.floor(1.2345675 * 1e6 + 0.5) / 1e6)
    assert(Analyses.halfAway6(0.0) == 0.0)
    // negatives mirror: -floor(-x*1e6+0.5)/1e6 (away from zero on .5)
    assert(Analyses.halfAway6(-1.2345675) == -Analyses.halfAway6(1.2345675))
    assert(Analyses.halfAway6(2.0000005) == 2.000001 ||
      Analyses.halfAway6(2.0000005) == 2.0) // whichever side the DOUBLE sits,
    // the result is one IEEE op sequence — assert it is exactly reproducible
    assert(Analyses.halfAway6(2.0000005) ==
      math.floor(2.0000005 * 1000000.0 + 0.5) / 1000000.0)
  }

  test("holtSteps: one core — both library forms byte-equal on random series incl. negatives") {
    val rnd = new scala.util.Random(20260815L)
    (1 to 20).foreach { trial =>
      val n = 2 + rnd.nextInt(40)
      // values cross zero so the trend AND level go negative — the sign-split
      // branch is exercised, not just the positive arm
      val ys = Array.fill(n)((rnd.nextDouble() - 0.5) * 2e4)
      val days = (0 until n).map(i =>
        new java.sql.Date(java.sql.Date.valueOf("2024-01-01").getTime + i * 86400000L))
      val df = days.zip(ys).map { case (d, y) => ("k", d, y) }.toDF("k", "d", "v")
      val single = Analyses.holtSmooth(df, "d", "v")
        .orderBy("d")
        .as[(java.sql.Date, Double, Double, Double, Double)].collect().toSeq
      val byKey = Analyses.holtSmoothByKey(df, "k", "d", "v")
        .orderBy("d")
        .as[(String, java.sql.Date, Double, Double, Double, Double)]
        .collect().toSeq.map { case (_, d, v, l, t, f) => (d, v, l, t, f) }
      assert(single == byKey, s"trial $trial: forms diverged")
      // and the steps ARE the shared core's output, forecast included
      val steps = Analyses.holtSteps(ys, 0.3, 0.2)
      single.zip(steps).foreach { case ((_, _, l, t, f), (cl, ct, cf)) =>
        assert(l == cl && t == ct && f == cf)
      }
      steps.foreach { case (l, t, f) =>
        assert(f == Analyses.halfAway6(l + t)) // forecast uses the same helper
      }
    }
  }

  test("geojson streaming read rejects the batch-only snapshotFiles option") {
    val d = java.nio.file.Files.createTempDirectory("graft_snap_stream").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(d, "a.jsonl"),
      """{"type":"Feature","id":"x","geometry":{"type":"Point","coordinates":[[0,0]]},"properties":{}}""")
    val e = intercept[Exception] {
      spark.readStream.format("graft-geojson")
        .option("snapshotFiles", "1").load(d)
        .writeStream.format("memory").queryName("snap_stream_reject")
        .start().processAllAvailable()
    }
    def causes(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: causes(x.getCause))
    assert(causes(e).exists(c =>
      Option(c.getMessage).exists(_.contains("batch-only"))),
      s"expected the batch-only contract error, got $e")
  }

  test("pcaPowerScores: over-dim embedding fails with a clear error, not AIOOBE") {
    import graft.operators.Similarity
    val df = Seq((1L, "a", Array(1.0, 2.0, 3.0))).toDF("vec_id", "label", "embedding")
    val e = intercept[Exception] {
      Similarity.pcaPowerScores(df, "vec_id", "label", "embedding",
        dim = 2, rounds = 2).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: causes(x.getCause))
    assert(causes(e).exists(c => Option(c.getMessage)
      .exists(_.contains("embedding dimension exceeds dim"))),
      s"expected the dim-guard error, got $e")
  }

  test("WavNearDup: within-group vs cross-group vs cross-modality cosine margins") {
    import graft.functions.{ImageFeature64, WavBlockEnergy, WavNearDup}
    def center(e: Array[Double]): Array[Double] = {
      val mu = e.sum / e.length; e.map(_ - mu)
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val num = a.zip(b).map { case (x, y) => x * y }.sum
      num / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    def audioVec(g: Long, m: Long): Array[Double] = {
      val arr = WavBlockEnergy.compute(WavNearDup.buildWavGroup(g, m), 64)
      center(arr.toDoubleArray())
    }
    def imageVec(g: Long, m: Long): Array[Double] =
      ImageFeature64.compute(ImageFeature64.buildBmp(g, m))
        .toDoubleArray().map(_ - 128.0)
    val groups = (0L until 40L).map(_ * 97 + 3)
    // within-group: all 6 pairs of 4 members nearly identical
    groups.take(10).foreach { g =>
      val vs = (0L until 4L).map(m => audioVec(g, m))
      for (i <- 0 until 4; j <- i + 1 until 4)
        assert(cos(vs(i), vs(j)) > 0.999, s"group $g members $i,$j")
    }
    // cross-group: envelopes decorrelate (threshold 0.9 with margin)
    val reps = groups.map(g => audioVec(g, 0))
    for (i <- reps.indices; j <- i + 1 until reps.length)
      assert(cos(reps(i), reps(j)) < 0.8, s"groups $i,$j too close")
    // cross-MODALITY: image block-means never near-dup an audio energy
    // vector (the q502 unified embedding space must not merge modalities)
    val imgs = groups.take(10).map(g => imageVec(g, 0))
    for (a <- reps.take(10); im <- imgs)
      assert(math.abs(cos(a, im)) < 0.8, "image-audio false near-dup")
  }

  test("sniffMime: media container magics (WAV/MP4/BMP/LAS/GIF)") {
    import graft.functions.{LasMeta, Mp4Meta, Scalars, WavNearDup}
    import graft.functions.ImageFeature64
    val rows = Seq(
      ("wav", WavNearDup.buildWavGroup(5, 1)),
      ("mp4", Mp4Meta.buildMp4(7)),
      ("bmp", ImageFeature64.buildBmp(3, 2)),
      ("las", LasMeta.buildLas(11)),
      ("gif", "GIF89a-rest-is-junk".getBytes("US-ASCII")),
      ("junk", "definitely not media".getBytes("US-ASCII")))
      .toDF("tag", "content")
    val got = rows.select(col("tag"), Scalars.sniffMime(col("content")).as("m"))
      .as[(String, String)].collect().toMap
    assert(got("wav") == "audio/wav")
    assert(got("mp4") == "video/mp4")
    assert(got("bmp") == "image/bmp")
    assert(got("las") == "application/vnd.las")
    assert(got("gif") == "image/gif")
    assert(got("junk") == "application/octet-stream")
  }

  test("WordShingles: byte parity with the HOF formulation it replaced") {
    // the oracle mirrors shingle STRINGS, so the native expression must be
    // byte-identical to transform(sequence…, i -> array_join(slice…)) —
    // including empty tokens from split, sub-n docs, duplicate shingles,
    // and first-occurrence distinct order
    val rnd = new scala.util.Random(8L)
    val vocab = Seq("the", "a", "b", "", "café", "naïve", "x1", "-", "θ")
    val docs = (1 to 200).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.length)))
        .mkString(" "))
    }.toDF("id", "text")
    for (n <- Seq(1, 2, 3, 5)) {
      val toks = graft.operators.TextOps.tokens(col("text"))
      val hofPlain = transform(
        when(size(toks) >= n, sequence(lit(1), size(toks) - (n - 1)))
          .otherwise(array()),
        i => array_join(slice(toks, i, lit(n)), " "))
      val got = docs.select(col("id"),
          graft.operators.TextOps.shingles(toks, n).as("a"),
          graft.operators.TextOps.distinctShingles(toks, n).as("b"),
          hofPlain.as("ea"), array_distinct(hofPlain).as("eb"))
        .as[(Long, Seq[String], Seq[String], Seq[String], Seq[String])]
        .collect()
      got.foreach { case (id, a, b, ea, eb) =>
        assert(a == ea, s"n=$n id=$id plain shingles diverged")
        assert(b == eb, s"n=$n id=$id distinct shingles diverged")
      }
    }
  }

  test("byte-walk parsers: fuzz sweep never throws (random, truncated, bit-flipped)") {
    import graft.functions._
    val rnd = new scala.util.Random(20260815L)
    val parsers: Seq[(String, Array[Byte] => Any)] = Seq(
      ("WavMeta", WavMeta.compute _),
      ("WavBlockEnergy", (b: Array[Byte]) => WavBlockEnergy.compute(b, 8)),
      ("Mp4Meta", Mp4Meta.compute _),
      ("LasMeta", LasMeta.compute _),
      ("GeoTiffCrs", GeoTiffCrs.compute _),
      ("ImageMeta", ImageMeta.compute _),
      ("ExifGps", ImageMeta.computeGps _),
      ("ImageFeature64", ImageFeature64.compute _),
      ("DHash64", (b: Array[Byte]) => DHash64.compute(b)))
    val seeds: Seq[Array[Byte]] = Seq(
      WavMeta.buildWav(12345L), WavNearDup.buildWavGroup(7L, 2L),
      Mp4Meta.buildMp4(99L), Mp4Meta.buildMp4(100L),
      LasMeta.buildLas(4242L), GeoTiffCrs.buildGeoTiff(777L),
      ImageFeature64.buildBmp(13L, 1L))
    def noThrow(tag: String, bytes: Array[Byte]): Unit =
      parsers.foreach { case (name, p) =>
        try { p(bytes); () } catch {
          case e: Throwable => fail(s"$name threw on $tag: $e")
        }
      }
    // pure random garbage at assorted lengths (incl. 0)
    Seq(0, 1, 7, 44, 128, 375, 600).foreach { len =>
      (1 to 40).foreach { i =>
        val b = new Array[Byte](len); rnd.nextBytes(b)
        noThrow(s"random[$len]#$i", b)
      }
    }
    // every valid fixture truncated at sampled prefixes — header fields
    // that promise more bytes than exist are the classic walk overrun
    seeds.foreach { s =>
      (0 to s.length by math.max(1, s.length / 37)).foreach { k =>
        noThrow(s"truncated@$k/${s.length}", java.util.Arrays.copyOf(s, k))
      }
    }
    // valid fixtures with 3 random byte flips — corrupt sizes/counts
    // INSIDE an otherwise-valid container
    seeds.foreach { s =>
      (1 to 60).foreach { i =>
        val b = s.clone()
        (1 to 3).foreach { _ => b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte }
        noThrow(s"bitflip#$i", b)
      }
    }
  }

  test("hashedNgramVector: feeds the ANN stack — cosine agrees with direct computation") {
    import graft.operators.{Dedup, TextOps}
    // two paraphrase-ish docs sharing most bigrams + one stranger: the
    // hashed vectors' cosine ordering must reflect bigram overlap, and the
    // vector must be exactly the signed bucket counts
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the sleepy dog"),
      (3L, "completely different text about spark query engines")).toDF("id", "text")
    val vecs = docs.select(col("id"),
        TextOps.hashedNgramVector(TextOps.tokens(col("text")), 64, 2).as("vec"))
      .as[(Long, Seq[Double])].collect().toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val num = a.zip(b).map { case (x, y) => x * y }.sum
      num / math.sqrt(a.map(x => x * x).sum * b.map(y => y * y).sum)
    }
    assert(cos(vecs(1L), vecs(2L)) > 0.7, "near-paraphrases must be close")
    assert(cos(vecs(1L), vecs(3L)) < 0.5, "strangers must be far")
    // direct recomputation: md5 bucket+sign per bigram
    def direct(text: String): Array[Double] = {
      val toks = text.split(" ", -1)
      val acc = new Array[Double](64)
      toks.sliding(2).filter(_.length == 2).foreach { g =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(g.mkString(" ").getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString
        val bucket = (java.lang.Long.parseLong(hex.take(15), 16) % 64).toInt
        val sgn = if (Integer.parseInt(hex.substring(15, 16), 16) % 2 == 0) 1 else -1
        acc(bucket) += sgn
      }
      acc
    }
    vecs.foreach { case (id, v) =>
      val d = direct(Seq("the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the sleepy dog",
        "completely different text about spark query engines")(id.toInt - 1))
      assert(v == d.toSeq, s"doc $id vector mismatch")
    }
    // and it flows through the existing near-dup machinery end-to-end
    val pairs = Dedup.embeddingNearDups(
      docs.select(col("id"), TextOps.hashedNgramVector(
        TextOps.tokens(col("text")), 64, 2).as("vec")),
      "id", "vec", dim = 64, threshold = 0.7, nBands = 16, rowsPerBand = 8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("WavStats: goldens on crafted PCM — clipping, crossings, silence") {
    import graft.functions.WavStats
    def wav(samples: Seq[Int]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(44 + samples.length * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes).putInt(36 + samples.length * 2).put("WAVE".getBytes)
      b.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
        .putInt(8000).putInt(16000).putShort(2).putShort(16)
      b.put("data".getBytes).putInt(samples.length * 2)
      samples.foreach(v => b.putShort(v.toShort))
      b.array()
    }
    // +5, -3, 0, 32767, -32768, 0, 7 → peak 32768, 2 clipped,
    // crossings: +→− (1), −→+ at 32767 (2), +→− at −32768 (3), −→+ at 7 (4)
    val r = WavStats.compute(wav(Seq(5, -3, 0, 32767, -32768, 0, 7)))
    assert(r.getLong(0) == 7L)        // n_samples
    assert(r.getInt(1) == 32768)      // peak_abs
    assert(r.getLong(2) == 2L)        // n_clipped
    assert(r.getLong(4) == 4L)        // zero_crossings
    val sq = Seq(5, -3, 0, 32767, -32768, 0, 7).map(v => v.toLong * v).sum
    assert(r.getDouble(3) == sq.toDouble / 7)
    // all-zero clip: zero crossings, zero mean square — the silence filter
    val z = WavStats.compute(wav(Seq(0, 0, 0, 0)))
    assert(z.getLong(4) == 0L && z.getDouble(3) == 0.0 && z.getInt(1) == 0)
    assert(WavStats.compute("not audio".getBytes) == null)
  }

  test("ImageResizeBmp: exact area means, BMP round-trip, contract nulls") {
    import graft.functions.{ImageFeature64, ImageResizeBmp}
    // 16×16 fixture → 8×8: target pixel = integer-div mean of 2×2 block
    val src = ImageFeature64.buildBmp(42L, 0L)
    val out = ImageResizeBmp.compute(src, 8, 8)
    assert(out != null)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out))
    assert(img.getWidth == 8 && img.getHeight == 8)
    def srcGray(y: Int, x: Int): Int = {
      val v = 42L * 256 + (y * 16 + x)
      ((v * v % 999983L) % 252L).toInt
    }
    for (ty <- 0 until 8; tx <- 0 until 8) {
      val want = (srcGray(2 * ty, 2 * tx) + srcGray(2 * ty, 2 * tx + 1) +
        srcGray(2 * ty + 1, 2 * tx) + srcGray(2 * ty + 1, 2 * tx + 1)) / 4
      assert((img.getRGB(tx, ty) & 0xff) == want, s"pixel ($tx,$ty)")
    }
    // the resized bytes re-enter every sibling op: sniff + feature grid
    assert(ImageFeature64.compute(out) != null)
    // upscale and junk are NULL, not a throw
    assert(ImageResizeBmp.compute(src, 32, 32) == null)
    assert(ImageResizeBmp.compute("junk".getBytes, 4, 4) == null)
  }

  test("ImageCropBmp: exact pixel copy, out-of-window null, tileGrid composition") {
    import graft.functions.{ImageCropBmp, ImageFeature64}
    val src = ImageFeature64.buildBmp(77L, 0L)
    val patch = ImageCropBmp.compute(src, 4, 4, 8, 8)
    assert(patch != null)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(patch))
    assert(img.getWidth == 8 && img.getHeight == 8)
    def srcGray(y: Int, x: Int): Int = {
      val v = 77L * 256 + (y * 16 + x)
      ((v * v % 999983L) % 252L).toInt
    }
    for (ty <- 0 until 8; tx <- 0 until 8)
      assert((img.getRGB(tx, ty) & 0xff) == srcGray(ty + 4, tx + 4))
    // window leaving the image → null (no silent clamp); junk → null
    assert(ImageCropBmp.compute(src, 10, 10, 8, 8) == null)
    assert(ImageCropBmp.compute("junk".getBytes, 0, 0, 2, 2) == null)
    // composes with the planned grid: every tileGrid cell of a 16×16 at
    // tile=8/stride=8 is croppable (4 tiles, all fully inside)
    val grid = graft.operators.Multimodal.tileGrid(
      Seq((1L, 16, 16)).toDF("id", "w", "h"), "w", "h", tile = 8, stride = 8)
      .select("tile_x", "tile_y").as[(Long, Long)].collect().toSet
    assert(grid == Set((0L, 0L), (0L, 8L), (8L, 0L), (8L, 8L)))
    grid.foreach { case (gx, gy) =>
      assert(ImageCropBmp.compute(src, gx.toInt, gy.toInt, 8, 8) != null)
    }
  }

  test("PcmDecimate: frame-aligned (stereo), header rewrite, divisibility null") {
    import graft.functions.{PcmDecimate, WavMeta}
    def wav(channels: Int, rate: Int, frames: Seq[Seq[Int]]): Array[Byte] = {
      val n = frames.length * channels
      val b = java.nio.ByteBuffer.allocate(44 + n * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes).putInt(36 + n * 2).put("WAVE".getBytes)
      b.put("fmt ".getBytes).putInt(16).putShort(1).putShort(channels.toShort)
        .putInt(rate).putInt(rate * channels * 2)
        .putShort((channels * 2).toShort).putShort(16)
      b.put("data".getBytes).putInt(n * 2)
      frames.foreach(_.foreach(v => b.putShort(v.toShort)))
      b.array()
    }
    // 5 stereo frames decimated by 2 → frames 0, 2, 4 with BOTH channels —
    // frame alignment is the contract (sample-wise decimation would tear
    // the channel interleave)
    val st = wav(2, 16000, Seq(Seq(1, -1), Seq(2, -2), Seq(3, -3), Seq(4, -4), Seq(5, -5)))
    val dec = PcmDecimate.compute(st, 2)
    val Some((fmt, ch, rate, bits, ba, off, len)) = WavMeta.parse(dec)
    assert((fmt, ch, rate, bits) == ((1, 2, 8000, 16)))
    val vals = (0 until (len / 2).toInt).map { i =>
      ((dec(off + 2 * i + 1).toInt << 8) | (dec(off + 2 * i) & 0xff))
    }
    assert(vals == Seq(1, -1, 3, -3, 5, -5))
    // indivisible rate → null; junk → null
    assert(PcmDecimate.compute(wav(1, 8001, Seq(Seq(7))), 2) == null)
    assert(PcmDecimate.compute("junk".getBytes, 2) == null)
  }

  test("holtSteps: every emitted value is an exact 6-dp grid point") {
    val ys = Array(10.0, -12.5, 9.333333, 15.000001, -2.75)
    Analyses.holtSteps(ys, 0.3, 0.2).foreach { case (l, t, f) =>
      Seq(l, t, f).foreach { v =>
        assert(v == Analyses.halfAway6(v), s"$v not on the 6-dp grid")
      }
    }
  }
}
