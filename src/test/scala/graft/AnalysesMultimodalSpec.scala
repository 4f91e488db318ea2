package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analyses, Multimodal, Similarity}
import graft.sources.Sources

class AnalysesMultimodalSpec extends SparkSuite {
  import spark.implicits._

  test("analysis registry: ops run with JSON parameter bags; unknown type throws") {
    val tasks = Seq(("t1", "done"), ("t2", "done"), ("t3", "failed"))
      .toDF("id", "state")
    val out = Analyses.run("status_rollup", tasks, """{"column":"state"}""")
      .as[(String, Long)].collect().toMap
    assert(out == Map("done" -> 2L, "failed" -> 1L))
    val dedup = Analyses.run("dedup_audit",
      Seq((1L, "x"), (2L, "x")).toDF("id", "key"), """{"key":"key","id":"id"}""")
    assert(dedup.filter(col("n_dups") === 2).count() == 1)
    intercept[IllegalArgumentException] {
      Analyses.run("nope", tasks, "{}")
    }
  }

  test("BBox Aggregator matches four-way min/max aggregation") {
    val pts = Seq(("a", -10.0, 5.0), ("a", 20.0, -3.0), ("b", 0.0, 0.0))
      .toDF("g", "lon", "lat")
    val viaUdaf = pts.groupBy(col("g"))
      .agg(Analyses.bboxUdaf(col("lon"), col("lat")).as("b"))
      .select(col("g"), col("b.minLon"), col("b.minLat"), col("b.maxLon"), col("b.maxLat"))
      .as[(String, Double, Double, Double, Double)].collect().toSet
    assert(viaUdaf == Set(("a", -10.0, -3.0, 20.0, 5.0), ("b", 0.0, 0.0, 0.0, 0.0)))
  }

  test("multimodal: real PNG/JPEG dimensions decoded via JDK ImageIO") {
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 0x336699)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def jpeg(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val df = Seq(
      (1L, png(7, 5)), (2L, jpeg(33, 9)), (3L, Array[Byte](1, 2, 3))
    ).toDF("id", "content")
    // mapPartitions path (withImageMeta)
    val metas = Multimodal.withImageMeta(spark, df)
      .select(col("id"), col("media_meta.width"), col("media_meta.height"),
        col("media_meta.n_channels"))
      .as[(Long, Int, Int, Int)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(metas(1L) == ((7, 5, 3)), s"png dims: ${metas(1L)}")
    assert(metas(2L) == ((33, 9, 3)), s"jpeg dims: ${metas(2L)}")
    assert(metas(3L)._1 > 0) // undecodable bytes: deterministic fallback
    // expression path (Ingest.extractMetadata)
    val viaExpr = df.select(col("id"),
        operators.Ingest.extractMetadata(col("content")).as("m"))
      .select(col("id"), col("m.width"), col("m.height"), col("m.bands"))
      .as[(Long, Int, Int, Int)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(viaExpr(1L) == ((7, 5, 3)))
    assert(viaExpr(2L) == ((33, 9, 3)))
  }

  test("multimodal: TIFF dimensions parsed from the IFD header, both byte orders") {
    // Minimal baseline-TIFF headers (no pixel data — ImageIO cannot decode
    // them, so this exercises the pure-JVM IFD fallback): byte order, magic
    // 42, first-IFD offset 8, three entries (ImageWidth 256, ImageLength 257,
    // SamplesPerPixel 277) with inline SHORT values, next-IFD pointer 0.
    def tiff(le: Boolean, w: Int, h: Int, samples: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + 2 + 3 * 12 + 4)
      bb.order(if (le) java.nio.ByteOrder.LITTLE_ENDIAN
               else java.nio.ByteOrder.BIG_ENDIAN)
      bb.put((if (le) "II" else "MM").getBytes)
      bb.putShort(42.toShort)
      bb.putInt(8) // IFD offset
      bb.putShort(3.toShort) // entry count
      def entry(tag: Int, v: Int): Unit = {
        bb.putShort(tag.toShort)
        bb.putShort(3.toShort) // SHORT
        bb.putInt(1)           // count
        bb.putShort(v.toShort) // value, left-justified
        bb.putShort(0.toShort) // pad
      }
      entry(256, w); entry(257, h); entry(277, samples)
      bb.putInt(0) // no next IFD
      bb.array()
    }
    assert(graft.functions.ImageMeta.decode(tiff(le = true, 640, 480, 3))
      .contains((640, 480, 3)))
    assert(graft.functions.ImageMeta.decode(tiff(le = false, 1024, 77, 1))
      .contains((1024, 77, 1)))
    // hostile / malformed bytes must fall through, never throw
    assert(graft.functions.ImageMeta.tiffDims("II*junkbutshort".getBytes).isEmpty)
    assert(graft.functions.ImageMeta.tiffDims(Array[Byte]('I', 'I', 42, 0, 9, 9, 9, 9)).isEmpty)
    // the mime sniffer routes these bytes as image/tiff, so the ingest
    // pipeline's allowlist and the real decode now agree on TIFF
    val df = Seq((1L, tiff(le = true, 320, 200, 4))).toDF("id", "content")
    val m = df.select(operators.Ingest.extractMetadata(col("content")).as("m"),
        graft.functions.Scalars.sniffMime(col("content")).as("mime"))
      .select(col("mime"), col("m.width"), col("m.height"), col("m.bands"))
      .as[(String, Int, Int, Int)].head()
    assert(m == (("image/tiff", 320, 200, 4)))
  }

  test("multimodal: EXIF GPS byte-walk — TIFF, JPEG/APP1, signs, hostile bytes") {
    import graft.functions.ImageMeta
    // planted micro-degrees round-trip exactly through the rational encoding
    val cases = Seq((37774929L, -122419416L), (-33868820L, 151209290L), (0L, 0L))
    cases.foreach { case (la, lo) =>
      val exp = (la / 1e6, lo / 1e6)
      assert(ImageMeta.gps(ImageMeta.buildTiffGps(la, lo)).contains(exp), s"tiff $la,$lo")
      assert(ImageMeta.gps(ImageMeta.buildJpegGps(la, lo)).contains(exp), s"jpeg $la,$lo")
    }
    // a real-shaped GPS IFD with nonzero minutes/seconds decodes d+m/60+s/3600
    locally {
      val b = ImageMeta.buildTiffGps(10000000L, 20000000L)
      // lat rationals live at 104: overwrite (10,1),(30,1),(36,10) = 10°30'3.6"
      val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(104, 10); bb.putInt(108, 1)
      bb.putInt(112, 30); bb.putInt(116, 1)
      bb.putInt(120, 36); bb.putInt(124, 10)
      val got = ImageMeta.gps(b).get._1
      assert(math.abs(got - (10.0 + 30.0 / 60 + 3.6 / 3600)) < 1e-12, s"dms=$got")
    }
    // dimension walk and GPS walk coexist on the same fixture bytes
    assert(ImageMeta.tiffDims(ImageMeta.buildTiffGps(1L, 2L)).contains((1, 1, 1)))
    // no GPS IFD (plain dims-only TIFF), truncated, and garbage bytes -> None
    val plain = java.nio.ByteBuffer.allocate(18)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("II".getBytes).putShort(42).putInt(8).putShort(0).putInt(0).array()
    assert(ImageMeta.gps(plain).isEmpty)
    assert(ImageMeta.gps(ImageMeta.buildTiffGps(5L, 6L).take(60)).isEmpty)
    assert(ImageMeta.gps("not an image at all".getBytes).isEmpty)
    assert(ImageMeta.gps(null).isEmpty)
  }

  test("multimodal: image meta attach is deterministic and null-safe") {
    val df = Seq(
      (1L, "a.jpg", Array[Byte](1, 2, 3)),
      (2L, "b.jpg", Array[Byte](1, 2, 3)),
      (3L, "c.jpg", null)
    ).toDF("id", "name", "content")
    val out = Multimodal.withImageMeta(spark, df)
    assert(out.schema.fieldNames.contains("media_meta"))
    // same bytes → same decoded dims; null content → zeros
    val rows = out.select(col("id"), col("media_meta.width")).as[(Long, Int)].collect().toMap
    assert(rows(1L) == rows(2L) && rows(3L) == 0)
  }

  test("multimodal: frame sampling explodes one row per offset") {
    val df = Seq((1L, 3500L)).toDF("id", "dur")
      .withColumn("media_meta", struct(lit("video").as("media_type"),
        lit(0).as("width"), lit(0).as("height"), lit(0).as("n_channels"),
        col("dur").as("duration_ms")))
    val frames = Multimodal.sampleFrames(df, stepMs = 1000L)
      .select("frame_ms").as[Long].collect().toSeq
    assert(frames == Seq(0L, 1000L, 2000L, 3000L))
  }

  test("multimodal: feature vector is deterministic, bounded, fixed-dim") {
    val df = Seq(Array[Byte](9, 9, 9), Array[Byte](9, 9, 9), Array[Byte](1))
      .toDF("content")
      .select(Multimodal.imageFeatureVector(col("content"), 8).as("v"))
    val vs = df.as[Seq[Double]].collect()
    assert(vs(0) == vs(1) && vs(0) != vs(2))
    assert(vs.forall(v => v.length == 8 && v.forall(x => x >= -1 && x <= 1)))
  }

  test("sources: csv and json-lines round trip with explicit schema") {
    val dir = "target/sources_fixture"
    def rm(f: java.io.File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete(): Unit }
    rm(new java.io.File(dir))
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    df.write.option("header", "true").csv(s"$dir/csv")
    Sources.writeJsonLog(df, s"$dir/log")
    val csv = Sources.readCsv(spark, s"$dir/csv", df.schema)
    assert(csv.as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")))
    val log = Sources.readJsonLines(spark, s"$dir/log", df.schema)
    assert(log.as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")))
  }

  test("IVF ANN recall vs brute force on fixture embeddings") {
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 20)
    val brute = Similarity.bruteKnn(e, q, "vec_id", "embedding", k = 5, dim = 64)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // Near-random fixture cosines spread true neighbors across cells — the
    // worst case for IVF; 6 of 8 probed cells is what 0.8 recall costs here.
    // (Clustered production embeddings concentrate neighbors in 1-2 cells.)
    val ivf = Similarity.ivfKnn(e, q, "vec_id", "embedding", k = 5,
      nCentroids = 8, nprobe = 6, dim = 64)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = brute.count(ivf.contains).toDouble / brute.size
    assert(recall >= 0.8, s"IVF recall too low: $recall")
    // the md5-seeded deterministic quantizer (the oracle-gated variant)
    // holds the same recall bar: random directions are a data-independent
    // coarse quantizer, recall comes from nprobe either way
    val seeded = Similarity.ivfKnnSeeded(e, q, "vec_id", "embedding", k = 5,
      nCentroids = 8, nprobe = 6, dim = 64)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val seededRecall = brute.count(seeded.contains).toDouble / brute.size
    assert(seededRecall >= 0.8, s"seeded IVF recall too low: $seededRecall")
  }
}
