package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** The graft-geojson DataSource V2 connector: column pruning reaches the
  * scan, parsing is byte-exact, malformed input degrades to nulls, and a
  * sharded directory plans one partition per file. */
class GeoJsonSourceSpec extends SparkSuite {

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_gj_spec").toString
    val w = new java.io.PrintWriter(s"$d/part-0.geojsonl")
    w.println("""{"type":"Feature","id":"a","geometry":{"type":"Polygon","coordinates":[[[0,0],[4,0],[4,4],[0,4],[0,0]]]},"properties":{"name":"alpha","zone":"z1"}}""")
    w.println("""{"type":"Feature","id":"b","geometry":{"type":"Point","coordinates":[[7,8]]},"properties":{"name":"beta"}}""")
    w.println("")
    w.println("""{"type":"Feature","geometry":null,"properties":null}""")
    w.close()
    val w2 = new java.io.PrintWriter(s"$d/part-1.geojsonl")
    w2.println("""{"type":"Feature","id":"c","geometry":{"type":"Polygon","coordinates":[[[10,10],[12,10],[12,12],[10,12],[10,10]]]},"properties":{"name":"gamma"}}""")
    w2.close()
    d
  }

  test("parses features with nested ring and props map; nulls for malformed") {
    val rows = spark.read.format("graft-geojson").load(dir)
      .orderBy("id").collect()
    assert(rows.length == 4)
    val a = rows.find(r => !r.isNullAt(0) && r.getString(0) == "a").get
    assert(a.getString(1) == "Polygon")
    val ring = a.getSeq[scala.collection.Seq[Double]](2).map(_.toSeq)
    assert(ring.length == 5)
    assert(ring.head == Seq(0.0, 0.0))
    assert(a.getMap[String, String](3) ==
      Map("name" -> "alpha", "zone" -> "z1"))
    val nullRow = rows.find(_.isNullAt(0)).get
    assert(nullRow.isNullAt(1) && nullRow.isNullAt(2) && nullRow.isNullAt(3))
  }

  test("limit pushdown reaches the scan and stops readers early") {
    // a bigger lake: 3 shards x 50 features
    val d = java.nio.file.Files.createTempDirectory("graft_gj_lim").toString
    (0 until 3).foreach { sh =>
      val w = new java.io.PrintWriter(s"$d/part-$sh.geojsonl")
      (0 until 50).foreach { i =>
        w.println(s"""{"type":"Feature","id":"f$sh-$i","geometry":""" +
          s"""{"type":"Point","coordinates":[[$i,$sh]]},"properties":{}}""")
      }
      w.close()
    }
    val q = spark.read.format("graft-geojson").load(d).limit(5)
    val scans = q.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b
    }
    assert(scans.nonEmpty)
    val gs = scans.head.scan.asInstanceOf[graft.sources.GeoJsonScan]
    assert(gs.limit.contains(5))
    graft.sources.GeoJsonV2.rowsEmitted.set(0L)
    assert(q.collect().length == 5)
    // each of the 3 shard readers stops after <= 5 rows instead of 50
    val emitted = graft.sources.GeoJsonV2.rowsEmitted.get()
    assert(emitted <= 15, s"readers emitted $emitted rows, expected <= 15")
  }

  test("column pruning reaches the scan (only requested fields parse)") {
    val q = spark.read.format("graft-geojson").load(dir).select("id")
    val scans = q.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b
    }
    assert(scans.nonEmpty)
    val gs = scans.head.scan.asInstanceOf[graft.sources.GeoJsonScan]
    assert(gs.required.fieldNames.toSeq == Seq("id"))
    assert(q.collect().flatMap(r =>
      if (r.isNullAt(0)) None else Some(r.getString(0))).sorted.toSeq ==
      Seq("a", "b", "c"))
  }

  test("one input partition per shard file") {
    val scan = graft.sources.GeoJsonScan(dir, graft.sources.GeoJsonV2.fullSchema)
    assert(scan.planInputPartitions().length == 2)
  }

  test("streaming reads each appended shard exactly once (incremental offsets)") {
    val d = java.nio.file.Files
      .createTempDirectory("graft_gj_stream_spec").toString
    def shard(i: Int, n: Int): Unit = {
      val w = new java.io.PrintWriter(s"$d/shard-$i.geojsonl")
      (0 until n).foreach { j =>
        w.println(s"""{"type":"Feature","id":"s$i-$j","geometry":{"type":"Point","coordinates":[[$j,$j]]},"properties":{}}""")
      }
      w.close()
    }
    shard(0, 3)
    val q = spark.readStream.format("graft-geojson").load(d)
      .groupBy().count()
      .writeStream.format("memory").queryName("gj_stream_spec")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      shard(1, 2)
      q.processAllAvailable()
      // exactly-once: total input rows across ALL batches == 5 — a
      // re-read of shard-0 in batch 2 would make this 8
      val totalIn = q.recentProgress.map(_.numInputRows).sum
      assert(totalIn == 5, s"expected 5 input rows total, got $totalIn")
      assert(spark.table("gj_stream_spec").collect()(0).getLong(0) == 5L)
    } finally q.stop()
  }

  test("snapshotFiles pins a batch read to the first k sorted shards") {
    val d = java.nio.file.Files.createTempDirectory("graft_gj_snap").toString
    (0 until 4).foreach { sh =>
      val w = new java.io.PrintWriter(f"$d/shard$sh%02d.geojsonl")
      (0 until 3).foreach { i =>
        w.println(s"""{"type":"Feature","id":"s$sh-$i","geometry":""" +
          s"""{"type":"Point","coordinates":[[$sh,$i]]},"properties":{}}""")
      }
      w.close()
    }
    def ids(k: Int) = spark.read.format("graft-geojson")
      .option("snapshotFiles", k.toString).load(d)
      .select("id").collect().map(_.getString(0)).toSet
    assert(ids(0) == Set.empty)
    assert(ids(2) == (for (s <- 0 until 2; i <- 0 until 3)
      yield s"s$s-$i").toSet)
    // k past the live tail = the full lake
    assert(ids(9) == (for (s <- 0 until 4; i <- 0 until 3)
      yield s"s$s-$i").toSet)
    // one partition per SNAPSHOT shard, not per lake shard
    val scan = spark.read.format("graft-geojson")
      .option("snapshotFiles", "2").load(d)
    assert(scan.rdd.getNumPartitions == 2)
    // the pushed COUNT(*) respects the snapshot too
    val cnt = spark.read.format("graft-geojson")
      .option("snapshotFiles", "3").load(d).count()
    assert(cnt == 9L)
    // bucketed layouts reject the option (keyed, not append-ordered)
    val e = intercept[Exception] {
      spark.read.format("graft-geojson").option("bucketed", "true")
        .option("snapshotFiles", "2").load(d).collect()
    }
    assert(e.getMessage.contains("append-ordered"))
  }

  test("snapshotFiles equals what the stream saw at that offset") {
    // the contract that makes snapshotFiles TIME TRAVEL: batch-at-k ==
    // union of micro-batches 0..k-1 (same sorted-name offset axis)
    val d = java.nio.file.Files.createTempDirectory("graft_gj_tt").toString
    def shard(sh: Int, n: Int): Unit = {
      val w = new java.io.PrintWriter(f"$d/shard$sh%02d.geojsonl")
      (0 until n).foreach { i =>
        w.println(s"""{"type":"Feature","id":"t$sh-$i","geometry":""" +
          s"""{"type":"Point","coordinates":[[$sh,$i]]},"properties":{}}""")
      }
      w.close()
    }
    shard(0, 2)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_gj_tt_ck").toString
    val q = spark.readStream.format("graft-geojson").load(d)
      .groupBy().count()
      .writeStream.format("memory").queryName("gj_tt_spec")
      .outputMode("complete").option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      val seenAtOffset1 = spark.table("gj_tt_spec").collect()(0).getLong(0)
      shard(1, 3)
      q.processAllAvailable()
      val batchAt1 = spark.read.format("graft-geojson")
        .option("snapshotFiles", "1").load(d).count()
      assert(batchAt1 == seenAtOffset1, "batch-at-1 == stream offset 1")
      assert(spark.table("gj_tt_spec").collect()(0).getLong(0) == 5L)
      val batchAt2 = spark.read.format("graft-geojson")
        .option("snapshotFiles", "2").load(d).count()
      assert(batchAt2 == 5L, "batch-at-2 == stream offset 2")
    } finally q.stop()
  }
}
