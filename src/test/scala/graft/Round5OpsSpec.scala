package graft

import org.apache.spark.sql.functions._
import graft.operators.Spatial

/** Unit goldens for the round-5 reusable operators: grid-density
  * clustering, the streaming rate limiter, and the state-bounded
  * streaming dedup (their end-to-end gates are q243/q254/q248). */
class Round5OpsSpec extends SparkSuite {
  import spark.implicits._

  test("gridDensityClusters: 8-connectivity merges, diagonal counts, " +
    "isolated sparse cells drop") {
    // grid: two dense cells touching diagonally (one cluster), one dense
    // cell far away (own cluster), one sparse cell (dropped). Counts:
    // (0,0)=4, (1,1)=4, (5,5)=4, (9,9)=1 → mean 13/4 = 3.25; 1.2×mean =
    // 3.9 → core = the three 4s.
    def cell(gx: Long, gy: Long, n: Int) =
      Seq.fill(n)((gx, gy))
    val pts = (cell(0, 0, 4) ++ cell(1, 1, 4) ++ cell(5, 5, 4) ++
      cell(9, 9, 1)).toDF("gx", "gy")
    val out = Spatial.gridDensityClusters(pts, minNum = 12, minDen = 10)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // cluster ids: min member cell id (gx*1000+gy)
    assert(out.toSeq == Seq((0L, 2L, 8L), (5005L, 1L, 4L)))
  }

  test("gridDensityClusters: straight-line chain collapses to one cluster") {
    val pts = (0L to 4L).flatMap(i => Seq.fill(3)((i, 0L))).toDF("gx", "gy")
    val out = Spatial.gridDensityClusters(pts, minNum = 1, minDen = 2)
      .as[(Long, Long, Long)].collect()
    assert(out.toSeq == Seq((0L, 5L, 15L)))
  }

  test("rateLimitStream (batch shape): earliest k per user-day admitted, " +
    "ties broken by event_id") {
    // same user, same day: 4 events, two sharing a timestamp — the lower
    // event_id wins the contested slot. Batch mode exercises the same
    // quota rule via the q254 oracle statement.
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "click", 1.0),
      (3L, ts("2024-01-01 11:00:00"), 7L, "click", 1.0),
      (2L, ts("2024-01-01 11:00:00"), 7L, "click", 1.0),
      (4L, ts("2024-01-01 12:00:00"), 7L, "click", 1.0),
      (5L, ts("2024-01-02 09:00:00"), 7L, "click", 1.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    // batch-side statement of the rule (the oracle q254 uses)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"), to_date(col("ts")))
      .orderBy(col("ts"), col("event_id"))
    val admitted = rows.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2).select("event_id")
      .as[Long].collect().sorted
    assert(admitted.toSeq == Seq(1L, 2L, 5L))
  }

  test("appendDedupedWithinWatermark is streaming-only (unlike " +
    "appendDeduped, which degrades to batch distinct)") {
    // dropDuplicatesWithinWatermark refuses batch frames by design — the
    // replay==batch semantics are asserted end-to-end by the q248 gate;
    // this pins the API boundary so a batch caller fails loudly instead of
    // silently double-counting.
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "click", 1.0),
      (1L, ts("2024-01-01 10:00:00"), 7L, "click", 1.0),
      (2L, ts("2024-01-01 11:00:00"), 8L, "view", 2.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    intercept[org.apache.spark.sql.AnalysisException] {
      graft.streaming.Streams.appendDedupedWithinWatermark(rows).collect()
    }
    val batchOk = graft.streaming.Streams.appendDeduped(rows)
      .select("event_id").as[Long].collect().sorted
    assert(batchOk.toSeq == Seq(1L, 2L))
  }
}
