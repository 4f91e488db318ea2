package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** SURVEY.md §2.10 — the reference's declared event-driven architecture
  * (Celery queue docker-compose.yml:159-160, status/progress mutation
  * init.sql:64-65, audit_logs append table init.sql:153-163) re-expressed as
  * Structured Streaming over an append-only event log.
  *
  * All transforms below accept either a batch or a streaming DataFrame with
  * the `events` fixture schema (event_id, ts, user_id, event_type, value,
  * props) — stream/batch equivalence is asserted in StreamingSpec.
  */
object Streams {

  /** Typed view of an event row (FIXTURES.md events schema). */
  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)

  /** Latest observed state per key. */
  case class KeyState(user_id: Long, event_id: Long, event_type: String,
                      value: Double, ts: java.sql.Timestamp)

  /** T3 — tumbling-window request metrics: the streaming generalization of
    * the reference's lifetime count/mean middleware
    * (reference: services/api-gateway/middleware.py:68-94). Watermark bounds
    * state so late events older than `late` are dropped deterministically. */
  def windowedMetrics(events: DataFrame, windowLen: String = "1 hour",
                      late: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", late)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      // sum exactly in decimal, cast once to double, derive the mean with a
      // single double division: a double `avg` accumulates in reduction
      // order, which diverges between engines/partitionings — this form is
      // deterministic and external-oracle-reproducible (and works the same
      // over a stream or a batch frame; withWatermark is a no-op in batch).
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"),
        (col("sum_value") / col("n")).as("avg_value"))

  /** T2 — stateful latest-status per key via flatMapGroupsWithState: the
    * streaming "current status" view of the task state machine (reference:
    * processing_status transitions init.sql:7,64-65). Emits one updated row
    * per key per micro-batch; equivalent to the W1 batch window view. */
  def latestStatus(spark: SparkSession, events: DataFrame): Dataset[KeyState] = {
    import spark.implicits._
    events
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (uid: Long, batch: Iterator[Event], state: GroupState[KeyState]) => {
          import scala.math.Ordering.Implicits._
          def key(e: Event) = (e.ts.getTime, e.event_id)
          val latestInBatch = batch.reduceOption { (a, b) =>
            if (key(a) >= key(b)) a else b
          }
          val merged = (state.getOption, latestInBatch) match {
            case (Some(s), Some(e)) if key(e) > (s.ts.getTime, s.event_id) =>
              Some(KeyState(uid, e.event_id, e.event_type, e.value, e.ts))
            case (None, Some(e)) =>
              Some(KeyState(uid, e.event_id, e.event_type, e.value, e.ts))
            case (s, _) => s
          }
          merged match {
            case Some(m) if !state.getOption.contains(m) || latestInBatch.isDefined =>
              state.update(m); Iterator.single(m)
            case _ => Iterator.empty
          }
        })
  }

  /** T5 — TTL session state (the Redis `setex` analog, reference:
    * services/auth-service/main.py:155-159): keeps the latest value per key,
    * expires after `ttlMs` of processing-time inactivity. */
  def sessionWithTtl(spark: SparkSession, events: DataFrame, ttlMs: Long): Dataset[KeyState] = {
    import spark.implicits._
    events
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.ProcessingTimeTimeout)(
        (uid: Long, batch: Iterator[Event], state: GroupState[KeyState]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val events = batch.toSeq
            val out = if (events.nonEmpty) {
              val e = events.maxBy(ev => (ev.ts.getTime, ev.event_id))
              val m = KeyState(uid, e.event_id, e.event_type, e.value, e.ts)
              state.update(m)
              Iterator.single(m)
            } else Iterator.empty
            state.setTimeoutDuration(ttlMs)
            out
          }
        })
  }

  /** T1/T4 — audit/event append sink with dedup on event_id within the
    * watermark (exactly-once append semantics over an at-least-once source). */
  def appendDeduped(events: DataFrame, late: String = "1 hour"): DataFrame =
    events.withWatermark("ts", late).dropDuplicates("event_id")
}
