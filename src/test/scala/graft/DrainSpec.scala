package graft

import org.apache.spark.sql.functions._
import org.scalatest.concurrent.TimeLimits
import org.scalatest.concurrent.Signaler
import org.scalatest.time.SpanSugar._
import graft.streaming.Streams

/** Pins the replay DRAIN primitive (round-10 regression class: commit
  * 44adb66 replaced the bounded drain with an unbounded
  * `processAllAvailable()`, which never returns for a
  * ProcessingTimeTimeout query — q72 hung the whole Verify run and the
  * round's correctness artifact came back empty). Two contracts, each the
  * one the other drain mode violates:
  *
  *  1. a PTT query must drain and STOP within a strict wall deadline
  *     (PAA hangs forever on it — shouldRunAnotherBatch is always true);
  *  2. a foreachBatch query must not be stopped before its LAST batch's
  *     sink commit (the q518 35-of-50-row flake: a listener-latch drain
  *     raced the async progress bus against the final commit).
  */
class DrainSpec extends SparkSuite with TimeLimits {
  import spark.implicits._

  // failAfter must interrupt the MAIN thread stuck in the drain wait loop
  implicit val signaler: Signaler = org.scalatest.concurrent.ThreadSignaler

  private def eventsFixture = Tables.events(spark, sf)

  test("PTT drain: replayedFinalState over sessionWithTtl completes in bounded time " +
       "and equals the batch latest-per-key view (q72 regression pin)") {
    val streamed = failAfter(180.seconds) {
      Streams.replayedFinalState(
          spark, eventsFixture, chunks = 3, name = "drainspec_ptt",
          processingTimeTimeout = true)(
          (sp, ev) => Streams.sessionWithTtl(sp, ev, ttlMs = 3600000L))
        .select("user_id", "event_id", "event_type", "value")
    }
    val batch = graft.operators.Relational
      .latestPerKey(eventsFixture, "user_id", col("ts"), col("event_id"))
      .select("user_id", "event_id", "event_type", "value")
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("PAA drain: every foreachBatch commit lands before the drain returns, " +
       "even when commits are slow (q518 race pin)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_drainspec").toFile
    try {
      val base = (0 until 40).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      (0 until 4).foreach { c =>
        base.filter(pmod(col("id"), lit(4)) === c).coalesce(1)
          .write.mode("overwrite").parquet(s"$dir/in/c$c")
      }
      val committed = new java.util.concurrent.atomic.AtomicInteger(0)
      val stream = spark.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/in/c*")
      val qname = "graft_drainspec_paa"
      failAfter(180.seconds) {
        Streams.drainStream(spark, qname, expectedRows = 40L) {
          stream.writeStream.queryName(qname)
            .option("checkpointLocation", s"$dir/ckpt")
            .foreachBatch { (mb: org.apache.spark.sql.DataFrame, batchId: Long) =>
              val n = mb.count()
              // a slow sink commit: the old listener-latch drain would stop
              // the query here once the input-row count had latched
              Thread.sleep(250)
              mb.write.mode("overwrite").parquet(s"$dir/out/b$batchId")
              committed.incrementAndGet(): Unit
            }
            .start()
        }
      }
      assert(committed.get() === 4,
        s"drain returned after ${committed.get()} of 4 batch commits")
      val out = spark.read.parquet(s"$dir/out/b*")
      assert(out.count() === 40L)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(dir): Unit
    }
  }
}
