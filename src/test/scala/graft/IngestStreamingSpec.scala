package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.Ingest
import graft.streaming.Streams

/** SURVEY §5.5 pipeline e2e + §5.6 streaming (stream/batch equivalence). */
class IngestStreamingSpec extends SparkSuite {
  import spark.implicits._

  def writeFixtureFiles(dir: String): Unit = {
    val d = Paths.get(dir)
    if (Files.exists(d)) d.toFile.listFiles().foreach(_.delete())
    Files.createDirectories(d)
    Files.write(d.resolve("good.jpg"), Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte) ++ "jpegbody".getBytes)
    Files.write(d.resolve("good.png"), Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47) ++ "pngbody".getBytes)
    Files.write(d.resolve("good.tif"), Array[Byte](0x49, 0x49, 0x2A, 0x00) ++ "tiffbody".getBytes)
    Files.write(d.resolve("bad.txt"), "plain text".getBytes)
    Files.write(d.resolve("tiny.bin"), Array[Byte](0x00)) // 1 byte, unknown magic
  }

  test("ingestion pipeline: sniff + checksum + quarantine routing + partition layout") {
    val base = "target/ingest_fixture"
    writeFixtureFiles(base)
    val (valid, bad) = Ingest.pipeline(Ingest.readBinaryDir(spark, base), "p1")
    val v = valid.select("original_filename", "mime_type").as[(String, String)].collect().toMap
    assert(v == Map("good.jpg" -> "image/jpeg", "good.png" -> "image/png", "good.tif" -> "image/tiff"))
    val b = bad.select("original_filename").as[String].collect().toSet
    assert(b == Set("bad.txt", "tiny.bin"))
    // checksum matches an independently computed sha-256
    val jpgBytes = Files.readAllBytes(Paths.get(base, "good.jpg"))
    val expected = java.security.MessageDigest.getInstance("SHA-256")
      .digest(jpgBytes).map("%02x".format(_)).mkString
    val got = valid.filter(col("original_filename") === "good.jpg")
      .select("checksum").as[String].collect().head
    assert(got == expected)
    // partitioned write layout: files land under project_id=p1/
    val out = "target/ingest_out"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File(out))
    Ingest.writeFilesTable(valid, out)
    assert(Files.exists(Paths.get(out, "project_id=p1")))
    assert(spark.read.parquet(out).count() == 3)
  }

  test("T2 streaming latest-status equals the W1 batch view") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Streams.Event]
    val batch1 = Seq(
      Streams.Event(1L, ts("2024-01-01 10:00:00"), 7L, "pending", 0.0),
      Streams.Event(2L, ts("2024-01-01 11:00:00"), 7L, "processing", 0.4))
    val batch2 = Seq(
      Streams.Event(3L, ts("2024-01-01 12:00:00"), 7L, "completed", 1.0),
      Streams.Event(4L, ts("2024-01-01 09:00:00"), 8L, "failed", 0.0),
      Streams.Event(5L, ts("2024-01-01 08:00:00"), 7L, "stale-late", 0.1)) // older than state → ignored
    val q = Streams.latestStatus(spark, mem.toDF())
      .writeStream.format("memory").queryName("latest").outputMode("update").start()
    try {
      mem.addData(batch1); q.processAllAvailable()
      mem.addData(batch2); q.processAllAvailable()
      val all = (batch1 ++ batch2).toDF()
      val batchView = operators.Relational.latestPerKey(all, "user_id", col("ts"), col("event_id"))
        .select(col("user_id"), col("event_type"))
      val s = spark.table("latest").orderBy(col("user_id"), col("event_id").desc)
        .groupBy("user_id").agg(first("event_type").as("event_type"))
        .as[(Long, String)].collect().toMap
      val b = batchView.as[(Long, String)].collect().toMap
      assert(s == b && b == Map(7L -> "completed", 8L -> "failed"))
    } finally q.stop()
  }

  test("T3 windowed metrics with watermark produce per-window counts") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Streams.Event]
    mem.addData(Seq(
      Streams.Event(1L, ts("2024-01-01 10:05:00"), 1L, "click", 1.0),
      Streams.Event(2L, ts("2024-01-01 10:55:00"), 1L, "click", 3.0),
      Streams.Event(3L, ts("2024-01-01 11:05:00"), 2L, "view", 5.0)))
    val q = Streams.windowedMetrics(mem.toDF(), "1 hour", "30 minutes")
      .writeStream.format("memory").queryName("winm").outputMode("update").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("winm")
        .select(col("win_start").cast("string"), col("event_type"), col("n"))
        .as[(String, String, Long)].collect().toSet
      assert(rows == Set(
        ("2024-01-01 10:00:00", "click", 2L),
        ("2024-01-01 11:00:00", "view", 1L)))
    } finally q.stop()
  }

  test("T1 file-source streaming: parquet directory drives windowed metrics") {
    // real readStream over a directory (the task-queue ingest path), not
    // MemoryStream — asserts schema'd file discovery + watermark agg e2e.
    val dir = "target/stream_src"
    def rm(f: java.io.File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete(): Unit }
    rm(new java.io.File(dir))
    Seq(
      Streams.Event(1L, ts("2024-01-01 10:05:00"), 1L, "click", 1.0),
      Streams.Event(2L, ts("2024-01-01 10:35:00"), 2L, "click", 2.0),
      Streams.Event(3L, ts("2024-01-01 11:20:00"), 1L, "view", 3.0)
    ).toDF().write.parquet(dir)
    val src = spark.readStream
      .schema(Seq(Streams.Event(0L, ts("2024-01-01 00:00:00"), 0L, "", 0.0)).toDF().schema)
      .parquet(dir)
    val q = Streams.windowedMetrics(src, "1 hour", "30 minutes")
      .writeStream.format("memory").queryName("filewin").outputMode("update").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("filewin")
        .select(col("win_start").cast("string"), col("event_type"), col("n"))
        .as[(String, String, Long)].collect().toSet
      assert(rows == Set(
        ("2024-01-01 10:00:00", "click", 2L),
        ("2024-01-01 11:00:00", "view", 1L)))
    } finally q.stop()
  }

  test("T1/T4 append dedup drops re-delivered event ids") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Streams.Event]
    mem.addData(Seq(
      Streams.Event(1L, ts("2024-01-01 10:00:00"), 1L, "a", 1.0),
      Streams.Event(1L, ts("2024-01-01 10:00:00"), 1L, "a", 1.0),
      Streams.Event(2L, ts("2024-01-01 10:01:00"), 1L, "b", 2.0)))
    val q = Streams.appendDeduped(mem.toDF())
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("dedup").count() == 2)
    } finally q.stop()
  }

  test("S3/S4 binary object sink + source round-trip preserves exact bytes") {
    import org.apache.spark.sql.types._
    val rows = Seq(
      (7L, Array[Byte](0, 1, 2, 127, -128, -1)),
      (8L, "utf8 text with ünïcode".getBytes("UTF-8")),
      (9L, Array.tabulate(4096)(i => (i * 31 % 251).toByte))) // > one FS buffer
    val df = spark.createDataFrame(rows).toDF("id", "content")
    val out = Files.createTempDirectory("graft_bin_spec").toString
    Ingest.writeBinaryObjects(df, "id", "content", out)
    val back = Ingest.readBinaryDir(spark, out)
      .select(regexp_extract(col("path"), "([0-9]+)\\.bin$", 1).cast("long").as("id"),
        col("content"))
      .as[(Long, Array[Byte])].collect().toMap
    assert(back.keySet == Set(7L, 8L, 9L))
    rows.foreach { case (id, bytes) =>
      assert(java.util.Arrays.equals(back(id), bytes), s"bytes differ for id=$id")
    }
  }

  test("T1/T4 replay harness: doubled delivery dedups back to the exact event set") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a", 1.0),
      (2L, ts("2024-01-01 09:00:00"), 2L, "b", 2.0), // out-of-order ts vs id
      (3L, ts("2024-01-01 11:00:00"), 1L, "c", 3.0),
      (4L, ts("2024-01-01 08:00:00"), 3L, "d", 4.0),
      (5L, ts("2024-01-01 12:00:00"), 2L, "e", 5.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Streams.replayedDedupAppend(spark, ev, chunks = 2, name = "spec_dedup")
      .select("event_id", "user_id", "event_type", "value")
      .as[(Long, Long, String, Double)].collect().toSet
    assert(got == Set((1L, 1L, "a", 1.0), (2L, 2L, "b", 2.0), (3L, 1L, "c", 3.0),
      (4L, 3L, "d", 4.0), (5L, 2L, "e", 5.0)))
  }

  test("replayedHeavyHitters: streamed sketch + recount == batch top-n on a skewed stream") {
    // planted skew: "hot" 40, "warm" 20, "w2" 12, then 30 singletons — with
    // k=8 the N/(k+1)=102/9≈11.3 guarantee covers the top-3; 5 chunks force
    // cross-micro-batch sketch merges
    val rows = (Seq.fill(40)("hot") ++ Seq.fill(20)("warm") ++
      Seq.fill(12)("w2") ++ (1 to 30).map(i => s"one$i")).zipWithIndex
      .map { case (k, i) => (i.toLong, k) }
    val df = rows.toDF("id", "key")
    val got = Streams.replayedHeavyHitters(spark, df, "id", "key",
      chunks = 5, n = 3, k = 8, name = "spec_hh")
      .as[(String, Long)].collect().toSeq
    val want = graft.operators.TextOps.heavyHitters(df, col("key"), n = 3, k = 8)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("hot", 40L), ("warm", 20L), ("w2", 12L)))
    assert(got == want)
  }
}
