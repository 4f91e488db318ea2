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

  /** T1 — audit/event append sink with dedup on event_id within the
    * watermark (exactly-once append semantics over an at-least-once source).
    * Note the watermark here bounds dedup STATE, not lateness: Spark's
    * streaming dedup passes rows older than the watermark straight through
    * (probe-verified); the late-row DROP contract is [[retentionAppend]]. */
  def appendDeduped(events: DataFrame, late: String = "1 hour"): DataFrame =
    events.withWatermark("ts", late).dropDuplicates("event_id")

  /** T1 scale variant — [[appendDeduped]] keeps one state entry per distinct
    * key FOREVER (plain `dropDuplicates` never evicts, watermark or not);
    * `dropDuplicatesWithinWatermark` EVICTS a key's entry once the watermark
    * passes its event time + delay, so dedup state is bounded by the
    * watermark horizon instead of by lifetime key cardinality — the only
    * variant an always-on 100 TB ingest can actually run. Contract: copies
    * arriving within `late` of each other (event time) dedup exactly; the
    * at-least-once sources this models re-deliver within seconds, far
    * inside any sane horizon. */
  def appendDedupedWithinWatermark(events: DataFrame,
                                   late: String = "1 hour"): DataFrame =
    events.withWatermark("ts", late)
      .dropDuplicatesWithinWatermark("event_id")

  /** Replay gate for [[appendDedupedWithinWatermark]]: the doubled fixture
    * streams in TIME-SLICED chunks (monotone event time — so the watermark
    * genuinely advances and evicts dedup state while the run progresses,
    * which is the point of this API) and the appended rows must equal batch
    * DISTINCT: both copies of an event share its event time, hence its
    * slice, hence dedup within the watermark is exact by construction. */
  def replayedDedupWithinWatermark(spark: SparkSession, events: DataFrame,
                                   chunks: Int, name: String,
                                   late: String = "1 hour"): DataFrame = {
    val base = events.select(col("event_id"), col("ts"), col("user_id"),
      col("event_type"), col("value"))
    val dir = freshReplayDir(name)
    val mm = base.agg(min(unix_micros(col("ts"))).as("lo"),
      max(unix_micros(col("ts"))).as("hi")).head()
    val (loUs, hiUs) = (mm.getLong(0), mm.getLong(1))
    val span = math.max(hiUs - loUs, 1L)
    val doubled = base.unionAll(base)
    (0 until chunks).foreach { i =>
      doubled.filter(least(
          floor(((unix_micros(col("ts")) - loUs).cast("double") / span)
            * chunks).cast("int"), lit(chunks - 1)) === i)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/c$i")
    }
    val expectedRows = base.count() * 2
    val stream = spark.readStream.schema(base.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/c*")
    val qname = s"graft_gate_${name}_${replaySeq.incrementAndGet()}"
    drainStream(spark, qname, expectedRows) {
      appendDedupedWithinWatermark(stream, late)
        .writeStream.format("memory").queryName(qname)
        .outputMode("append").start()
    }
    spark.table(qname)
  }

  /** Streaming per-key RATE LIMITER: at most `k` events pass per
    * (user, tumbling day) window; excess drops. The ingest-protection
    * shape (quota enforcement at the edge) as a stateful streaming op:
    * state is ONE counter per active (user, window) key, cleaned up by
    * EVENT-TIME timeout once the watermark passes the window end — so
    * state is bounded by active windows, not by history. Per micro-batch
    * the group's rows are sorted by (ts, event_id) before the quota is
    * applied, making the admitted set deterministic for any time-ordered
    * replay: earliest k events of the window win, exactly the batch
    * row_number rule the q254 oracle states. */
  def rateLimitStream(spark: SparkSession, events: DataFrame, k: Int,
                      lateness: String = "1 hour"): DataFrame = {
    import spark.implicits._
    events.select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .withWatermark("ts", lateness)
      .as[Event]
      .groupByKey(e => (e.user_id, e.ts.getTime / 86400000L))
      .flatMapGroupsWithState[Long, Event](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (Long, Long), rows: Iterator[Event], state: GroupState[Long]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val prev = state.getOption.getOrElse(0L)
            val admit = sorted.take(math.max(0L, k - prev).toInt)
            state.update(prev + sorted.size)
            // clean up once the watermark passes the window end (+1 day)
            state.setTimeoutTimestamp((key._2 + 2) * 86400000L)
            admit.iterator
          }
      }.toDF()
  }

  /** Replay gate for [[rateLimitStream]]: time-sliced chunks make arrival
    * order match event-time order across micro-batches (within a batch the
    * operator sorts), so the admitted set must equal the batch
    * `row_number() ≤ k` rule regardless of how the replay was chunked. */
  def replayedRateLimit(spark: SparkSession, events: DataFrame, chunks: Int,
                        k: Int, name: String): DataFrame = {
    val base = events.select(col("event_id"), col("ts"), col("user_id"),
      col("event_type"), col("value"))
    val dir = freshReplayDir(name)
    val mm = base.agg(min(unix_micros(col("ts"))).as("lo"),
      max(unix_micros(col("ts"))).as("hi")).head()
    val (loUs, hiUs) = (mm.getLong(0), mm.getLong(1))
    val span = math.max(hiUs - loUs, 1L)
    (0 until chunks).foreach { i =>
      base.filter(least(
          floor(((unix_micros(col("ts")) - loUs).cast("double") / span)
            * chunks).cast("int"), lit(chunks - 1)) === i)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/c$i")
    }
    val expectedRows = base.count()
    val stream = spark.readStream.schema(base.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/c*")
    val qname = s"graft_gate_${name}_${replaySeq.incrementAndGet()}"
    drainStream(spark, qname, expectedRows) {
      rateLimitStream(spark, stream, k)
        .writeStream.format("memory").queryName(qname)
        .outputMode("append").start()
    }
    spark.table(qname)
  }

  /** Exactly-once across KILL + RESTART — the recovery contract every
    * production stream lives on: a parquet file sink with a real
    * checkpoint is stopped PARTWAY through the replay, a NEW query is
    * started on the same checkpoint + sink, and the drained sink must
    * equal the batch table exactly — no loss (checkpoint resumes from the
    * committed offset) and no duplication (the sink's _spark_metadata
    * commit log makes a re-run of an in-flight batch idempotent). The
    * committed count is polled through a BATCH read of the sink, which
    * respects the commit log — uncommitted files are invisible, exactly as
    * a downstream consumer would see them. */
  def replayedRestartFileSink(spark: SparkSession, events: DataFrame,
                              chunks: Int, name: String): DataFrame = {
    val base = events.select(col("event_id"), col("ts"), col("user_id"),
      col("event_type"), col("value"))
    val dir = freshReplayDir(name)
    val mm = base.agg(min(unix_micros(col("ts"))).as("lo"),
      max(unix_micros(col("ts"))).as("hi")).head()
    val (loUs, hiUs) = (mm.getLong(0), mm.getLong(1))
    val span = math.max(hiUs - loUs, 1L)
    (0 until chunks).foreach { i =>
      base.filter(least(
          floor(((unix_micros(col("ts")) - loUs).cast("double") / span)
            * chunks).cast("int"), lit(chunks - 1)) === i)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/in/c$i")
    }
    val n = base.count()
    val out = s"$dir/out"
    val ckpt = s"$dir/ckpt"
    def committed(): Long =
      try spark.read.parquet(out).count() catch { case _: Throwable => 0L }
    def runUntil(target: Long): Unit = {
      val q = spark.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/in/c*")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try {
        val deadline = System.nanoTime() + 300L * 1000 * 1000 * 1000
        while (committed() < target && System.nanoTime() < deadline &&
            q.isActive) Thread.sleep(100)
        q.exception.foreach(throw _)
        require(committed() >= target,
          s"restart sink $name: ${committed()} of $target rows committed")
      } finally q.stop()
    }
    runUntil(1) // first committed batch, then KILL mid-stream
    runUntil(n) // restart on the same checkpoint, drain the remainder
    spark.read.parquet(out)
  }

  /** T4 — audit retention: an append stream that EXPIRES events older than
    * the retention horizon, where "older" is judged against the event-time
    * watermark (max event time seen, minus the horizon) — the streaming
    * analog of the reference's TTL-based audit cleanup. Spark's built-in
    * watermarked operators don't drop late rows on their own (the watermark
    * only bounds their state — probe-verified for both dedup variants), so
    * the drop is explicit: a stateless-by-construction
    * `flatMapGroupsWithState` pass that filters each micro-batch against
    * `GroupState.getCurrentWatermarkMs` — the same mechanism the T5 session
    * TTL operator builds on, keyed by user so the filter distributes. */
  def retentionAppend(spark: SparkSession, events: DataFrame,
                      horizon: String): DataFrame = {
    import spark.implicits._
    events.select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value")).as[Event]
      .withWatermark("ts", horizon)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, Event](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[Event], state: GroupState[Long]) =>
          val wm = state.getCurrentWatermarkMs()
          rows.filter(_.ts.getTime >= wm)
      }.toDF()
  }

  private val replaySeq = new java.util.concurrent.atomic.AtomicLong(0)

  /** Fresh chunk directory for a replay harness. The directory is DELETED
    * recursively before use: `mode(overwrite)` only replaces the chunk
    * indices written THIS run, so a stale `c{i}` from an earlier run with a
    * larger `chunks` value (or a crashed partial run) would otherwise be
    * globbed back in, duplicating input and breaking the gate's
    * expectedRows/oracle comparison. */
  /** Exact event-time micros of a fixture timestamp (unix_micros parity):
    * `getTime` alone is ms-grain and could mis-order sub-ms neighbors. */
  private def eventUs(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000

  /** Per-user running event counter as a Spark 4 `StatefulProcessor` —
    * the arbitrary-stateful-processing API (transformWithState) that
    * supersedes flatMapGroupsWithState: named state variables live in the
    * RocksDB state store, TTL and timers are first-class, and state
    * evolves independently of the output encoder. One `ValueState[Long]`
    * here; within a micro-batch the group's rows apply in (ts, event_id)
    * order so any time-ordered replay emits the same running numbers as
    * the batch `row_number()` rule (the q254 determinism discipline). */
  private class RunningCountProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, (Long, Long, Long)] {
    @transient private var cnt:
      org.apache.spark.sql.streaming.ValueState[Long] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      cnt = getHandle.getValueState[Long]("cnt",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[(Long, Long, Long)] = {
      val sorted = rows.toSeq.sortBy(e => (eventUs(e.ts), e.event_id))
      var c = if (cnt.exists()) cnt.get() else 0L
      val out = sorted.map { e => c += 1; (key, e.event_id, c) }
      cnt.update(c)
      out.iterator
    }
  }

  /** Replay gate for [[RunningCountProcessor]]: time-sliced chunks, one
    * per micro-batch, through transformWithState on the RocksDB state
    * store (the only provider the API supports). The emitted running
    * number per event must equal the batch
    * `row_number() OVER (PARTITION BY user ORDER BY ts, event_id)` —
    * state carried across micro-batches is what makes the numbers keep
    * counting instead of restarting at each chunk. */
  /** Shared replay harness for the transformWithState family: time-sliced
    * chunks (one per micro-batch), RocksDB provider pinned for the run and
    * restored after (the only store the API supports), completion by
    * input-row count. `xform` plugs the keyed stateful pipeline. */
  private def replayTws(spark: SparkSession, events: DataFrame, chunks: Int,
      name: String)(xform: Dataset[Event] => DataFrame): DataFrame = {
    import spark.implicits._
    val base = events.select(col("event_id"), col("ts"), col("user_id"),
      col("event_type"), col("value"))
    val dir = freshReplayDir(name)
    val mm = base.agg(min(unix_micros(col("ts"))).as("lo"),
      max(unix_micros(col("ts"))).as("hi")).head()
    val (loUs, hiUs) = (mm.getLong(0), mm.getLong(1))
    val span = math.max(hiUs - loUs, 1L)
    (0 until chunks).foreach { i =>
      base.filter(least(
          floor(((unix_micros(col("ts")) - loUs).cast("double") / span)
            * chunks).cast("int"), lit(chunks - 1)) === i)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/c$i")
    }
    val expectedRows = base.count()
    val stream = spark.readStream.schema(base.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/c*")
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val qname = s"graft_gate_${name}_${replaySeq.incrementAndGet()}"
      drainStream(spark, qname, expectedRows) {
        xform(stream.as[Event])
          .writeStream.format("memory").queryName(qname)
          .outputMode("append").start()
      }
      spark.table(qname)
    } finally {
      prevProvider match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  def replayedRunningCount(spark: SparkSession, events: DataFrame,
                           chunks: Int, name: String): DataFrame =
    replayTws(spark, events, chunks, name) { ds =>
      import spark.implicits._
      ds.groupByKey(_.user_id)
        .transformWithState(new RunningCountProcessor,
          org.apache.spark.sql.streaming.TimeMode.None(),
          OutputMode.Append())
        .toDF("user_id", "event_id", "running_n")
    }

  /** Last-k event-type path per user through a `ListState` ring buffer —
    * the state-variable shape q466's single counter can't model: ordered
    * recent history, trimmed to k entries so state stays O(k) per key
    * forever. Emits the up-to-k-step path ending at every event; any
    * time-ordered replay must reproduce the batch lag-window paths. */
  private class LastKPathProcessor(k: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, (Long, Long, String)] {
    @transient private var buf:
      org.apache.spark.sql.streaming.ListState[String] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      buf = getHandle.getListState[String]("buf",
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[(Long, Long, String)] = {
      val sorted = rows.toSeq.sortBy(e => (eventUs(e.ts), e.event_id))
      var hist = if (buf.exists()) buf.get().toList else Nil
      val out = sorted.map { e =>
        hist = (hist :+ e.event_type).takeRight(k)
        (key, e.event_id, hist.mkString(">"))
      }
      buf.put(hist.toArray)
      out.iterator
    }
  }

  def replayedLastKPath(spark: SparkSession, events: DataFrame,
                        chunks: Int, k: Int, name: String): DataFrame =
    replayTws(spark, events, chunks, name) { ds =>
      import spark.implicits._
      ds.groupByKey(_.user_id)
        .transformWithState(new LastKPathProcessor(k),
          org.apache.spark.sql.streaming.TimeMode.None(),
          OutputMode.Append())
        .toDF("user_id", "event_id", "path")
    }

  /** Per-(user, event-type) running counters through ONE `MapState` per
    * user — the keyed-submap state shape: the map key set is the type
    * vocabulary (bounded), so state is O(types) per user. Equals the
    * batch per-(user,type) row_number. */
  private class TypeCountProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, (Long, Long, String, Long)] {
    @transient private var cnt:
      org.apache.spark.sql.streaming.MapState[String, Long] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      cnt = getHandle.getMapState[String, Long]("cnt",
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[(Long, Long, String, Long)] = {
      val sorted = rows.toSeq.sortBy(e => (eventUs(e.ts), e.event_id))
      val out = sorted.map { e =>
        val c = if (cnt.containsKey(e.event_type))
          cnt.getValue(e.event_type) else 0L
        cnt.updateValue(e.event_type, c + 1)
        (key, e.event_id, e.event_type, c + 1)
      }
      out.iterator
    }
  }

  def replayedTypeCounts(spark: SparkSession, events: DataFrame,
                         chunks: Int, name: String): DataFrame =
    replayTws(spark, events, chunks, name) { ds =>
      import spark.implicits._
      ds.groupByKey(_.user_id)
        .transformWithState(new TypeCountProcessor,
          org.apache.spark.sql.streaming.TimeMode.None(),
          OutputMode.Append())
        .toDF("user_id", "event_id", "event_type", "type_n")
    }

  /** Session builder on transformWithState EVENT-TIME TIMERS — the API
    * surface q466 doesn't touch: a named timer per open session, re-armed
    * as events extend it; `handleExpiredTimer` emits the session once the
    * watermark passes end+gap, so the LAST session per user closes
    * without any closing event. Gap math runs in exact micros (ms-grain
    * timers only schedule the flush, they never decide a boundary).
    * Sessions closed by a later event inside one batch emit immediately;
    * state is one (start, end, n) triple per OPEN session only. */
  private class SessionTimerProcessor(gapUs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, (Long, Long, Long, Long)] {
    @transient private var sess:
      org.apache.spark.sql.streaming.ValueState[(Long, Long, Long)] = _
    private def expiryMs(endUs: Long): Long = endUs / 1000 + gapUs / 1000
    private def us(t: java.sql.Timestamp): Long = eventUs(t)
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      sess = getHandle.getValueState[(Long, Long, Long)]("sess",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong),
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[(Long, Long, Long, Long)] = {
      val sorted = rows.toSeq.sortBy(e => (us(e.ts), e.event_id))
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long, Long)]
      var cur = if (sess.exists()) {
        val c = sess.get(); getHandle.deleteTimer(expiryMs(c._2)); Some(c)
      } else None
      sorted.foreach { e =>
        val t = us(e.ts)
        cur match {
          case Some((s0, e0, n)) if t - e0 > gapUs =>
            out += ((key, s0, e0, n)); cur = Some((t, t, 1L))
          case Some((s0, e0, n)) =>
            cur = Some((s0, math.max(e0, t), n + 1))
          case None => cur = Some((t, t, 1L))
        }
      }
      cur.foreach { c =>
        sess.update(c); getHandle.registerTimer(expiryMs(c._2))
      }
      out.iterator
    }
    override def handleExpiredTimer(key: Long,
        timerValues: org.apache.spark.sql.streaming.TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[(Long, Long, Long, Long)] =
      if (sess.exists() &&
          expiryMs(sess.get()._2) == expiredTimerInfo.getExpiryTimeInMs) {
        val (s0, e0, n) = sess.get()
        sess.clear()
        Iterator.single((key, s0, e0, n))
      } else Iterator.empty
  }

  /** Replay gate for [[SessionTimerProcessor]]: time-sliced chunks with
    * explicit mtimes, two flush-sentinel rounds a day past max(ts) so the
    * watermark passes every open session's timer and `handleExpiredTimer`
    * flushes the tails. Result must equal the batch gaps-and-islands
    * sessionization at the same 30-minute gap. */
  def replayedSessionTimers(spark: SparkSession, events: DataFrame,
                            chunks: Int, name: String,
                            gapMinutes: Int = 30): DataFrame = {
    import spark.implicits._
    val base = events.select(col("event_id"), col("ts"), col("user_id"),
      col("event_type"), col("value"))
    val dir = freshReplayDir(name)
    val mm = base.agg(min(unix_micros(col("ts"))).as("lo"),
      max(unix_micros(col("ts"))).as("hi")).head()
    val (loUs, hiUs) = (mm.getLong(0), mm.getLong(1))
    val span = math.max(hiUs - loUs, 1L)
    val mtimeBase = System.currentTimeMillis()
    def stampChunk(sub: String, seq: Int): Unit = {
      val files = new java.io.File(s"$dir/$sub").listFiles()
      if (files != null) files.foreach { f =>
        f.setLastModified(mtimeBase + seq * 2000L): Unit
      }
    }
    (0 until chunks).foreach { i =>
      base.filter(least(
          floor(((unix_micros(col("ts")) - loUs).cast("double") / span)
            * chunks).cast("int"), lit(chunks - 1)) === i)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/c$i")
      stampChunk(s"c$i", i)
    }
    (0 to 1).foreach { r =>
      spark.range(1).select(lit(-1L - r).as("event_id"),
          lit(new java.sql.Timestamp(hiUs / 1000 + 86400000L + r * 1000L))
            .as("ts"),
          lit(-10L).as("user_id"), lit("__flush").as("event_type"),
          lit(0.0).as("value"))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/c${chunks + r}")
      stampChunk(s"c${chunks + r}", chunks + r)
    }
    val expectedRows = base.count() + 2
    val stream = spark.readStream.schema(base.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/c*")
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val qname = s"graft_gate_${name}_${replaySeq.incrementAndGet()}"
      drainStream(spark, qname, expectedRows) {
        // sentinels flow INTO the processor (as user -10) and are dropped
        // from the OUTPUT: a pre-watermark filter would be pushed below
        // the EventTimeWatermark node into the scan, the sentinel rows
        // would never reach the watermark tracker, and the flush timers
        // would never fire
        stream.withWatermark("ts", "1 minute")
          .as[Event]
          .groupByKey(_.user_id)
          .transformWithState(
            new SessionTimerProcessor(gapMinutes * 60L * 1000000L),
            org.apache.spark.sql.streaming.TimeMode.EventTime(),
            OutputMode.Append())
          .toDF("user_id", "session_start_us", "session_end_us", "n_events")
          .writeStream.format("memory").queryName(qname)
          .outputMode("append").start()
      }
      spark.table(qname).filter(col("user_id") >= 0)
    } finally {
      prevProvider match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  /** [[RunningCountProcessor]] with BOOTSTRAPPED state — the
    * StatefulProcessorWithInitialState arm: a batch backfill seeds each
    * user's counter via `handleInitialState` before the first
    * micro-batch, so the stream continues numbering where the backfill
    * stopped (the standard lambda-architecture cutover: recompute
    * history in batch, stream from the cutoff). */
  private class SeededCountProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessorWithInitialState[
        Long, Event, (Long, Long, Long), Long] {
    @transient private var cnt:
      org.apache.spark.sql.streaming.ValueState[Long] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      cnt = getHandle.getValueState[Long]("cnt",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInitialState(key: Long, initialState: Long,
        timerValues: org.apache.spark.sql.streaming.TimerValues): Unit =
      cnt.update(initialState)
    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[(Long, Long, Long)] = {
      val sorted = rows.toSeq.sortBy(e => (eventUs(e.ts), e.event_id))
      var c = if (cnt.exists()) cnt.get() else 0L
      val out = sorted.map { e => c += 1; (key, e.event_id, c) }
      cnt.update(c)
      out.iterator
    }
  }

  /** Replay gate for [[SeededCountProcessor]]: events before the time
    * cutoff become the BATCH seed (per-user counts), events at/after it
    * stream through time-sliced chunks — the emitted running numbers
    * must continue the seed exactly, i.e. equal the batch row_number
    * over ALL events restricted to the streamed half. */
  def replayedSeededCount(spark: SparkSession, events: DataFrame,
                          chunks: Int, name: String): DataFrame = {
    import spark.implicits._
    val base = events.select(col("event_id"), col("ts"), col("user_id"),
      col("event_type"), col("value"))
    val mm = base.agg(min(unix_micros(col("ts"))).as("lo"),
      max(unix_micros(col("ts"))).as("hi")).head()
    val cutUs = mm.getLong(0) + (mm.getLong(1) - mm.getLong(0)) / 2
    val seed = base.filter(unix_micros(col("ts")) < cutUs)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
    val tail = base.filter(unix_micros(col("ts")) >= cutUs)
    replayTws(spark, tail, chunks, name) { ds =>
      ds.groupByKey(_.user_id)
        .transformWithState(new SeededCountProcessor,
          org.apache.spark.sql.streaming.TimeMode.None(),
          OutputMode.Append(), seed)
        .toDF("user_id", "event_id", "running_n")
    }
  }

  private def freshReplayDir(name: String): String = {
    // tmpfs-backed (LocalSession.fixtureTmpRoot): replay chunk writes on
    // the VM disk leave async-writeback kernel CPU that pollutes the
    // gates that follow in suite order
    val dir = new java.io.File(
      graft.LocalSession.fixtureTmpRoot().toFile, s"graft_replay_$name")
    def rm(f: java.io.File): Unit = {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(rm)
      f.delete(): Unit
    }
    rm(dir)
    // heartbeat-registered: a replay dir is written and read across the
    // gate's whole run and must survive a sibling JVM's stale sweep.
    // mkdirs BEFORE registering (round-12 advisor fix): touchHeartbeats
    // prunes registered paths that are not directories, so registering
    // the just-rm'd path was a silent no-op — the dir never got a
    // heartbeat and could still be swept out from under a live run.
    dir.mkdirs(): Unit
    graft.LocalSession.registerFixtureRoot(dir.getAbsolutePath)
    dir.getAbsolutePath
  }

  /** Streaming arm of the graft-geojson connector, replay-gated: feature
    * lines land as `chunks` shard files APPENDED between micro-batches
    * (processAllAvailable between appends — each append advances the
    * file-count offset by exactly one shard), aggregated in complete mode
    * into a memory sink. Exactly-once across offsets ⇒ the final counts
    * equal the batch view of all lines. The driver-side chunk writes are
    * replay-harness plumbing (same status as the parquet chunk writers
    * here); the operator under test is the connector's MicroBatchStream. */
  def replayedGeoJsonStream(spark: SparkSession, lines: DataFrame,
                            chunkKey: org.apache.spark.sql.Column,
                            chunks: Int,
                            name: String): DataFrame = {
    val dir = freshReplayDir(name)
    new java.io.File(dir).mkdirs()
    val qname = s"graft_gate_${name}_${replaySeq.incrementAndGet()}"
    val stream = spark.readStream.format("graft-geojson").load(dir)
      .groupBy(size(col("ring")).as("n_vertices"))
      .agg(count(lit(1)).as("n_features"))
    val q = stream.writeStream.format("memory").queryName(qname)
      .outputMode("complete").start()
    try {
      val tagged = lines.withColumn("__c", chunkKey % chunks)
      (0 until chunks).foreach { i =>
        val rows = tagged.filter(col("__c") === i)
          .select(col("line")).collect().map(_.getString(0))
        val p = new java.io.PrintWriter(s"$dir/shard-$i.geojsonl")
        rows.foreach(p.println); p.close()
        awaitAllAvailable(q, qname)
      }
    } finally q.stop()
    spark.table(qname)
  }

  /** End-to-end REPLAY gate for the stateful operators (T2/T5): write the
    * batch event table out as `chunks` single-file parquet chunks keyed by
    * `event_id % chunks` (so each micro-batch interleaves users and
    * timestamps — the cross-batch out-of-order state-merge path is genuinely
    * exercised), stream them back through a file source one file per
    * trigger, run `op` with a memory sink in update mode to completion, and
    * reduce the emitted updates to the final state per key.
    *
    * If the operator's state handling is correct this equals the W1 batch
    * view of the same events (`Relational.latestPerKey`) — which is exactly
    * what the DuckDB oracle of the gated queries (q71/q72) computes. Eager
    * I/O is inherent to a replay harness and confined to it: the operators
    * under test stay pure stream transforms. */
  def replayedFinalState(spark: SparkSession, events: DataFrame, chunks: Int,
                         name: String, processingTimeTimeout: Boolean = false)(
      op: (SparkSession, DataFrame) => Dataset[KeyState]): DataFrame = {
    val base = events.select(col("event_id"), col("ts"), col("user_id"),
      col("event_type"), col("value"))
    val dir = freshReplayDir(name)
    (0 until chunks).foreach { i =>
      base.filter(pmod(col("event_id"), lit(chunks)) === i)
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/c$i")
    }
    val expectedRows = base.count()
    val stream = spark.readStream.schema(base.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/c*")
    val qname = s"graft_gate_${name}_${replaySeq.incrementAndGet()}"
    drainStream(spark, qname, expectedRows, processingTimeTimeout) {
      op(spark, stream).toDF()
        .writeStream.format("memory").queryName(qname)
        // pace the timeout-check idle loop instead of spinning back-to-back
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"))
        .outputMode("update").start()
    }
    // final state = latest emitted update per key (re-emissions of an
    // unchanged state are identical rows, so the window picks a stable one)
    graft.operators.Relational.latestPerKey(
      spark.table(qname), "user_id", col("ts"), col("event_id"))
  }

  /** T1/T4 replay gate: stream an at-least-once event log (the fixture
    * UNION'd with itself — every event delivered twice) through the
    * watermarked dedup sink in APPEND mode; the emitted rows must be each
    * event exactly once, i.e. the batch `events` table itself — which is
    * what the q76 DuckDB oracle selects. The duplicate copies are identical
    * rows, so which copy wins is unobservable and the gate hashes stably. */
  def replayedDedupAppend(spark: SparkSession, events: DataFrame, chunks: Int,
                          name: String, late: String = "3650 days"): DataFrame = {
    val base = events.select(col("event_id"), col("ts"), col("user_id"),
      col("event_type"), col("value"))
    val dir = freshReplayDir(name)
    val doubled = base.unionAll(base)
    (0 until chunks).foreach { i =>
      // both copies of an event share an event_id, hence land in the same
      // chunk file — the dedup state sees the duplicate within one batch or
      // adjacent ones, both inside the (wide) watermark
      doubled.filter(pmod(col("event_id"), lit(chunks)) === i)
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/c$i")
    }
    val expectedRows = base.count() * 2
    val stream = spark.readStream.schema(base.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/c*")
    val qname = s"graft_gate_${name}_${replaySeq.incrementAndGet()}"
    drainStream(spark, qname, expectedRows) {
      appendDeduped(stream, late)
        .writeStream.format("memory").queryName(qname)
        .outputMode("append").start()
    }
    spark.table(qname)
  }

  /** T4 replay gate: watermark RETENTION. Batch 0 streams the full fixture,
    * advancing the watermark to max(ts) − horizon; batch 1 then delivers
    * crafted LATE rows — fresh event_ids (so dedup cannot mask the outcome)
    * carrying original timestamps — and the watermarked append sink must
    * drop exactly those older than the watermark. A ±guard band around the
    * boundary keeps the gate independent of the engine's exact <-vs-≤
    * watermark comparator: crafted rows inside the band are not sent at
    * all. Survivors = every original event + the crafted rows with
    * ts ≥ max(ts) − horizon + guard — the batch filter the DuckDB oracle
    * computes. The two driver-side scalars (count, max ts) are harness
    * bookkeeping, not operator data paths. */
  def replayedRetentionAppend(spark: SparkSession, events: DataFrame,
                              name: String, horizon: String = "15 days",
                              idOffset: Long = 1000000000L): DataFrame = {
    val base = events.select(col("event_id"), col("ts"), col("user_id"),
      col("event_type"), col("value"))
    val dir = freshReplayDir(name)
    val maxTs = base.agg(max(col("ts"))).head().getTimestamp(0)
    val horizonMs = horizon match {
      case s if s.endsWith(" days") => s.stripSuffix(" days").trim.toLong * 86400000L
      case other => throw new IllegalArgumentException(s"horizon '$other': use '<n> days'")
    }
    val guardMs = 3600000L // 1 hour
    val dropCut = new java.sql.Timestamp(maxTs.getTime - horizonMs - guardMs)
    val keepCut = new java.sql.Timestamp(maxTs.getTime - horizonMs + guardMs)
    val crafted = base
      .filter(col("ts") <= lit(dropCut) || col("ts") >= lit(keepCut))
      .select((col("event_id") + idOffset).as("event_id"), col("ts"),
        col("user_id"), col("event_type"), col("value"))
    // chunk order matters (c0 must commit before c1 so the watermark is up);
    // the file source orders by modification time and these sequential jobs
    // are comfortably apart
    base.coalesce(1).write.mode("overwrite").parquet(s"$dir/c0")
    crafted.coalesce(1).write.mode("overwrite").parquet(s"$dir/c1")
    val expectedRows = base.count() + crafted.count()
    val stream = spark.readStream.schema(base.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/c*")
    val qname = s"graft_gate_${name}_${replaySeq.incrementAndGet()}"
    drainStream(spark, qname, expectedRows) {
      retentionAppend(spark, stream, horizon)
        .writeStream.format("memory").queryName(qname)
        .outputMode("append").start()
    }
    spark.table(qname)
  }

  /** Stream-static enrichment join — the canonical streaming lookup: an
    * unbounded fact stream joined per micro-batch to a bounded dimension
    * DataFrame. Stateless (no watermark, no join state — the static side is
    * re-resolved each batch, which is also what picks up dim updates for
    * file-backed dims), so rows emit in their own batch. The dim side is a
    * by-NATURE dimension → explicit broadcast; at 100 TB/h stream rates the
    * same declaration holds because the static side's size is schema-bound,
    * not stream-bound. */
  def enrichStream(events: DataFrame, dim: DataFrame, dimKey: String,
                   dimCols: String*): DataFrame =
    events.join(broadcast(dim.select((dimKey +: dimCols).map(col): _*)),
      col("user_id") === col(dimKey))
      .drop(dimKey)

  /** Replay gate for [[enrichStream]]: the fixture streams in `chunks`
    * micro-batches against the static customer dim; the appended enriched
    * rows must equal the batch join (the q137 DuckDB oracle). Stateless →
    * no sentinels needed. */
  def replayedEnrichment(spark: SparkSession, events: DataFrame, dim: DataFrame,
                         chunks: Int, name: String): DataFrame = {
    val base = events.select(col("event_id"), col("ts"), col("user_id"), col("value"))
    val dir = freshReplayDir(name)
    (0 until chunks).foreach { i =>
      base.filter(pmod(col("event_id"), lit(chunks)) === i)
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/c$i")
    }
    val expectedRows = base.count()
    val stream = spark.readStream.schema(base.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/c*")
    val qname = s"graft_gate_${name}_${replaySeq.incrementAndGet()}"
    drainStream(spark, qname, expectedRows) {
      enrichStream(stream, dim, "c_custkey", "c_mktsegment", "c_nationkey")
        .select(col("event_id"), col("user_id"), col("c_mktsegment"),
          col("c_nationkey"), col("value"))
        .writeStream.format("memory").queryName(qname)
        .outputMode("append").start()
    }
    spark.table(qname)
  }

  /** Streaming parquet FILE-sink round-trip — the durable-sink analog of the
    * memory-sink gates: the fixture streams through an append file sink with
    * a checkpoint, then reads back through the sink's `_spark_metadata`
    * commit log, which is what makes the sink exactly-once (a reader only
    * sees files recorded by committed batches, so a crashed batch's partial
    * files are invisible). The read-back must equal the batch table — the
    * q138 oracle. */
  def replayedFileSink(spark: SparkSession, events: DataFrame, chunks: Int,
                       name: String): DataFrame = {
    val base = events.select(col("event_id"), col("ts"), col("user_id"),
      col("event_type"), col("value"))
    val dir = freshReplayDir(name)
    (0 until chunks).foreach { i =>
      base.filter(pmod(col("event_id"), lit(chunks)) === i)
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/in/c$i")
    }
    val expectedRows = base.count()
    val stream = spark.readStream.schema(base.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/in/c*")
    val qname = s"graft_gate_${name}_${replaySeq.incrementAndGet()}"
    drainStream(spark, qname, expectedRows) {
      stream.writeStream.format("parquet")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ckpt")
        .queryName(qname)
        .outputMode("append").start()
    }
    spark.read.parquet(s"$dir/out")
  }

  /** Native session-window aggregation — the built-in streaming analog of
    * the batch gap-rule sessionizer (`Relational.sessionize`, q87): Spark's
    * `session_window` merges per-key windows whose gap-extended spans
    * overlap, so a session splits exactly when the inter-event gap exceeds
    * `gap` (strict, micro-exact — NOT the floored-second q87 oracle
    * convention). Append mode emits a session only once the watermark
    * passes its end — the state-eviction contract that keeps the operator
    * bounded on an unbounded stream. */
  def sessionAgg(events: DataFrame, gap: String, lateness: String): DataFrame =
    events.withWatermark("ts", lateness)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"), col("sum_value"))

  /** T2-family replay gate for [[sessionAgg]]: the fixture streams in
    * `chunks` event_id-interleaved micro-batches (so one session's events
    * straddle batches out of time order and the session-MERGE path is
    * genuinely exercised), followed by two sentinel rows far enough in the
    * future that the watermark — which lags one batch behind the data that
    * moved it — passes every real session end. Sentinel 1 advances the
    * watermark; the batch consuming sentinel 2 computes with that advanced
    * watermark and flushes every real session to the append sink before the
    * drain's row-count latch releases. The sentinels' own key (user −1)
    * stays un-finalized by construction and is filtered here; real events
    * are never late because `lateness` exceeds the fixture span and the
    * sentinel lead is `lateness + gap` + margin. Equality target: the batch
    * gap-rule session table (the q134 DuckDB oracle). */
  def replayedSessionAgg(spark: SparkSession, events: DataFrame, chunks: Int,
                         name: String, gap: String = "30 minutes"): DataFrame = {
    val base = events.select(col("event_id"), col("ts"), col("user_id"), col("value"))
    val dir = freshReplayDir(name)
    (0 until chunks).foreach { i =>
      base.filter(pmod(col("event_id"), lit(chunks)) === i)
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/c$i")
    }
    val latenessDays = 3650L
    val maxTs = base.agg(max(col("ts"))).head().getTimestamp(0)
    def sentinel(i: Int): DataFrame = {
      // lead = lateness + gap headroom (1 day ≫ 30 min) + 1 day margin
      val ts = new java.sql.Timestamp(maxTs.getTime + (latenessDays + 2) * 86400000L + i * 1000L)
      spark.range(1).select(lit(-1L - i).as("event_id"), lit(ts).as("ts"),
        lit(-1L).as("user_id"), lit(0.0).as("value"))
    }
    // written after the data chunks: the file source orders by modification
    // time and these sequential single-file jobs are comfortably apart
    sentinel(0).coalesce(1).write.mode("overwrite").parquet(s"$dir/s0")
    sentinel(1).coalesce(1).write.mode("overwrite").parquet(s"$dir/s1")
    val expectedRows = base.count() + 2
    val stream = spark.readStream.schema(base.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/*")
    val qname = s"graft_gate_${name}_${replaySeq.incrementAndGet()}"
    drainStream(spark, qname, expectedRows) {
      sessionAgg(stream, gap, lateness = s"$latenessDays days")
        .writeStream.format("memory").queryName(qname)
        .outputMode("append").start()
    }
    spark.table(qname).filter(col("user_id") >= 0)
  }

  /** Stream-stream INTERVAL join (the streaming analog of
    * [[graft.operators.Joins.rangeJoin]]): left events matched to right
    * events of the same key with `r.ts ∈ [l.ts, l.ts + window]`. Both sides
    * carry watermarks and the join condition bounds BOTH event-time columns,
    * which is exactly what lets Spark evict join state — a left row's state
    * drops once the right watermark passes `l.ts + window`, a right row's
    * once the left watermark passes `r.ts`. Inner stream-stream joins emit
    * eagerly in append mode (the watermark only bounds state and lateness,
    * not emission). Column contract: left (event_id, ts, user_id, …), right
    * renamed (p_event_id, p_ts, p_user_id). */
  def intervalJoinStream(left: DataFrame, right: DataFrame,
                         lateness: String, window: String): DataFrame =
    left.withWatermark("ts", lateness)
      .join(right.withWatermark("p_ts", lateness),
        expr(s"user_id = p_user_id AND p_ts >= ts AND p_ts <= ts + interval $window"))

  /** T-family capstone replay gate: clicks and purchases streamed as TWO
    * independent file-source streams (each in `chunks` micro-batches, so
    * matches straddle batch boundaries on both sides) through
    * [[intervalJoinStream]]; the appended pair set must equal the batch
    * inequality join — which is what the q108 DuckDB oracle computes. The
    * gate uses a wide lateness so no fixture row is ever dropped as late
    * (state stays bounded by the window condition regardless). */
  def replayedIntervalJoin(spark: SparkSession, events: DataFrame, chunks: Int,
                           name: String, window: String = "30 minutes"): DataFrame = {
    val left = events.filter(col("event_type") === "click")
      .select(col("event_id"), col("ts"), col("user_id"))
    val right = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event_id"), col("ts").as("p_ts"),
        col("user_id").as("p_user_id"))
    val dir = freshReplayDir(name)
    (0 until chunks).foreach { i =>
      left.filter(pmod(col("event_id"), lit(chunks)) === i)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/l/c$i")
      right.filter(pmod(col("p_event_id"), lit(chunks)) === i)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/r/c$i")
    }
    val expectedRows = left.count() + right.count()
    val ls = spark.readStream.schema(left.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/l/c*")
    val rs = spark.readStream.schema(right.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/r/c*")
    val qname = s"graft_gate_${name}_${replaySeq.incrementAndGet()}"
    drainStream(spark, qname, expectedRows) {
      intervalJoinStream(ls, rs, lateness = "3650 days", window = window)
        .select(col("event_id"), col("p_event_id"))
        .writeStream.format("memory").queryName(qname)
        .outputMode("append").start()
    }
    spark.table(qname)
  }

  /** Stream-stream LEFT OUTER interval join: like [[intervalJoinStream]]
    * but left rows with no match emit null-extended ONCE the watermark
    * proves no match can arrive (right watermark past `l.ts + window`).
    * This is the semantics inner joins don't exercise: emission here is
    * DRIVEN by watermark progress, not by data arrival, and the same
    * watermark bounds the join state on both sides. */
  def leftIntervalJoinStream(left: DataFrame, right: DataFrame,
                             lateness: String, window: String,
                             joinType: String = "left_outer"): DataFrame =
    left.withWatermark("ts", lateness)
      .join(right.withWatermark("p_ts", lateness),
        expr(s"user_id = p_user_id AND p_ts >= ts AND p_ts <= ts + interval $window"),
        joinType)

  /** Replay gate for [[leftIntervalJoinStream]]: the appended result set
    * must equal the BATCH left interval join (the q244 oracle).
    *
    * Unlike the inner-join gate (which can hide behind a huge lateness),
    * outer emission requires the watermark to actually ADVANCE past the
    * fixture — so chunks are TIME-SLICED (chunk i = i-th time range), making
    * event time monotone across micro-batches and a small lateness
    * sufficient, and two flush-sentinel rounds per side (non-matching
    * user ids, event time far past max(ts) + window + lateness) push the
    * final global watermark past every fixture left row's `ts + window`,
    * forcing the null-extended rows out. Sentinels are filtered from the
    * result; the sentinel LEFT rows themselves stay in state (the final
    * watermark stops short of their own window) — by construction, not by
    * luck. State is evicted as the watermark advances — the gate exercises
    * the real production shape, not an unbounded-state replay. */
  def replayedLeftIntervalJoin(spark: SparkSession, events: DataFrame,
                               chunks: Int, name: String,
                               window: String = "30 minutes",
                               joinType: String = "left_outer"): DataFrame = {
    val left = events.filter(col("event_type") === "click")
      .select(col("event_id"), col("ts"), col("user_id"))
    val right = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event_id"), col("ts").as("p_ts"),
        col("user_id").as("p_user_id"))
    val dir = freshReplayDir(name)
    val mm = events.agg(min(unix_micros(col("ts"))).as("lo"),
      max(unix_micros(col("ts"))).as("hi")).head()
    val (loUs, hiUs) = (mm.getLong(0), mm.getLong(1))
    val span = math.max(hiUs - loUs, 1L)
    def slice(ts: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      least(
      floor(((unix_micros(ts) - loUs).cast("double") / span) * chunks)
        .cast("int"), lit(chunks - 1))
    // FileStreamSource drains files oldest-mtime-first; the time-sliced
    // chunks MUST arrive in slice order or their rows land behind the
    // 1-minute watermark and are silently dropped as late. Write order
    // usually produces ascending mtimes, but a same-millisecond tie (or a
    // filesystem with coarse mtime granularity) falls back to an
    // unspecified tiebreak — so every chunk's files are stamped with an
    // EXPLICIT strictly-increasing mtime, 2 s apart, making delivery order
    // deterministic by construction.
    val mtimeBase = System.currentTimeMillis()
    def stampChunk(sub: String, seq: Int): Unit = {
      val files = new java.io.File(s"$dir/$sub").listFiles()
      if (files != null) files.foreach { f =>
        f.setLastModified(mtimeBase + seq * 2000L): Unit
      }
    }
    (0 until chunks).foreach { i =>
      left.filter(slice(col("ts")) === i)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/l/c$i")
      right.filter(slice(col("p_ts")) === i)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/r/c$i")
      stampChunk(s"l/c$i", i)
      stampChunk(s"r/c$i", i)
    }
    // flush sentinels: 1 day past max(ts) clears window (30 min) + lateness
    // (1 min) with margin; user ids never match each other or the fixture
    def sentinelTs(round: Int) =
      new java.sql.Timestamp(hiUs / 1000 + 86400000L + round * 1000L)
    (0 to 1).foreach { r =>
      spark.range(1).select(lit(-1L - r).as("event_id"),
          lit(sentinelTs(r)).as("ts"), lit(-10L).as("user_id"))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/l/s$r")
      spark.range(1).select(lit(-1L - r).as("p_event_id"),
          lit(sentinelTs(r)).as("p_ts"), lit(-20L).as("p_user_id"))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/r/s$r")
      // sentinels stamp AFTER every data chunk so the flush rounds are the
      // last micro-batches on each side
      stampChunk(s"l/s$r", chunks + r)
      stampChunk(s"r/s$r", chunks + r)
    }
    val expectedRows = left.count() + right.count() + 4
    val ls = spark.readStream.schema(left.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/l/*")
    val rs = spark.readStream.schema(right.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/r/*")
    val qname = s"graft_gate_${name}_${replaySeq.incrementAndGet()}"
    drainStream(spark, qname, expectedRows) {
      leftIntervalJoinStream(ls, rs, lateness = "1 minute", window = window,
          joinType = joinType)
        .select(col("event_id"), col("p_event_id"))
        .writeStream.format("memory").queryName(qname)
        .outputMode("append").start()
    }
    // drop sentinel residue null-safely: FULL OUTER legitimately emits
    // rows with a null on either side
    spark.table(qname)
      .filter((col("event_id").isNull || col("event_id") >= 0) &&
        (col("p_event_id").isNull || col("p_event_id") >= 0))
  }

  /** FULL OUTER sibling of [[replayedLeftIntervalJoin]]: unmatched RIGHT
    * rows also emit null-extended, each exactly once, when the watermark
    * passes their own event time (a right row at p_ts can only match
    * left rows with ts ∈ [p_ts − window, p_ts], so watermark > p_ts
    * proves no future match). Same time-sliced replay + flush sentinels;
    * result == the batch FULL OUTER interval join. */
  def replayedFullIntervalJoin(spark: SparkSession, events: DataFrame,
                               chunks: Int, name: String,
                               window: String = "30 minutes"): DataFrame =
    replayedLeftIntervalJoin(spark, events, chunks, name, window,
      joinType = "full_outer")

  /** T3+sketch replay gate: maintain a Misra–Gries frequent-items sketch as
    * STREAMING aggregation state over the replayed item stream (complete
    * mode — the state is ONE bounded ≤k-entry map row, mergeable across
    * micro-batches exactly as it is across map-side partials in batch),
    * then run the exact candidate recount as the batch compaction pass —
    * the production periodic-top-k shape (stream keeps the cheap sketch,
    * a scheduled batch pass recounts the survivors exactly).
    *
    * Replay == batch: when the true n-th count exceeds N/(k+1), the MG
    * mergeability guarantee puts every true top-n item in the streamed
    * sketch's candidate set NO MATTER how the input was micro-batched, so
    * the recounted top-n equals [[graft.operators.TextOps.heavyHitters]]
    * on the same table — which is what the q163 oracle (plain exact top-n)
    * checks. The candidate set is k-bounded BY CONSTRUCTION (a design
    * dimension, not data) — the allowed broadcast class. */
  def replayedHeavyHitters(spark: SparkSession, items: DataFrame, idCol: String,
                           keyCol: String, chunks: Int, n: Int, k: Int,
                           name: String): DataFrame = {
    val base = items.select(col(idCol).as("id"), col(keyCol).cast("string").as("key"))
    val dir = freshReplayDir(name)
    (0 until chunks).foreach { i =>
      base.filter(graft.operators.Sampling.hashBucket(col("id"), chunks) === i)
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/c$i")
    }
    val expectedRows = base.count()
    val stream = spark.readStream.schema(base.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/c*")
    val qname = s"graft_gate_${name}_${replaySeq.incrementAndGet()}"
    val sketch = udaf(new graft.operators.TextOps.MisraGriesAgg(k))
    drainStream(spark, qname, expectedRows) {
      stream.groupBy().agg(sketch(col("key")).as("sketch"))
        .writeStream.format("memory").queryName(qname)
        .outputMode("complete").start()
    }
    val cand = spark.table(qname)
      .select(explode(map_keys(col("sketch"))).as("key"))
    base.join(broadcast(cand), Seq("key"), "left_semi")
      .groupBy(col("key")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("key").asc)
      .limit(n)
  }

  /** §3.4 replay gate — the reference's ASYNC upload flow (file lands in
    * the shared volume, a worker validates/extracts/records it:
    * services/file-service/main.py:75-169 + the Celery/Redis declaration,
    * docker-compose.yml:159-160) run as a REAL file stream: the mixed-
    * modality binary lake is discovered by `readStream.format("binaryFile")`
    * in `filesPerTrigger`-sized micro-batches, flows through the SAME
    * Ingest.pipeline validation/quarantine as the q502 batch gate, gets
    * its per-type metadata extracted in-stream (stateless expressions — the
    * worker does its work while the bytes are in hand), and lands in an
    * exactly-once append parquet sink (checkpoint + `_spark_metadata`
    * commit log, the q138 machinery — a crashed batch's partial files are
    * invisible to readers). The returned read-back therefore must equal
    * the batch pipeline's table — stream/batch equivalence for the whole
    * ingest path, not just one operator. */
  def replayedBinaryIngest(spark: SparkSession, lakeDir: String, name: String,
                           allowedMime: Seq[String], filesPerTrigger: Int)(
      flatten: DataFrame => DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    require(filesPerTrigger >= 1, "filesPerTrigger must be positive")
    val dir = freshReplayDir(name)
    // harness bookkeeping: the drain latch needs the total file count
    val expected = spark.read.format("binaryFile").load(lakeDir).count()
    val binSchema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    val stream = spark.readStream.format("binaryFile").schema(binSchema)
      .option("maxFilesPerTrigger", filesPerTrigger.toString)
      .load(lakeDir)
    val (valid, _) = graft.operators.Ingest.pipeline(stream, "p-mixed", allowedMime)
    val qname = s"graft_gate_${name}_${replaySeq.incrementAndGet()}"
    drainStream(spark, qname, expected) {
      flatten(valid)
        .writeStream.format("parquet")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ckpt")
        .queryName(qname)
        .outputMode("append").start()
    }
    spark.read.parquet(s"$dir/out")
  }

  /** Dedup-at-ingest, streamed — the production shape for CONTINUOUS
    * corpus hygiene: new documents arrive as micro-batches and each batch
    * is deduplicated against the standing corpus before it lands. Runs
    * through `foreachBatch` (the documented Structured-Streaming pattern
    * for composite per-batch logic): every micro-batch executes the SAME
    * audited batch operator ([[graft.operators.Dedup.dedupAgainstCorpus]] —
    * exact-fingerprint anti-join, then banded MinHash candidates + exact
    * Jaccard verify) and appends its survivors to a per-batchId directory
    * (overwrite-by-batchId = idempotent under retries, the foreachBatch
    * exactly-once recipe). Because the operator compares batch docs against
    * the CORPUS only — never batch-internal — chunk survivors are
    * independent and the streamed union EQUALS the one-shot batch result:
    * this gate shares q83's oracle verbatim. (A long-lived deployment would
    * additionally pin the corpus's band table instead of re-deriving it per
    * batch; at gate scale the re-derivation keeps the code the audited
    * operator itself.) */
  def replayedIncrementalDedup(spark: SparkSession, corpus: DataFrame,
                               batchDocs: DataFrame, chunks: Int,
                               name: String): DataFrame = {
    val base = batchDocs.select(col("doc_id"), col("text"), col("lang"))
    val dir = freshReplayDir(name)
    (0 until chunks).foreach { i =>
      base.filter(pmod(col("doc_id"), lit(chunks)) === i)
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/in/c$i")
    }
    val expectedRows = base.count()
    val stream = spark.readStream.schema(base.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/in/c*")
    val qname = s"graft_gate_${name}_${replaySeq.incrementAndGet()}"
    drainStream(spark, qname, expectedRows) {
      stream.writeStream
        .queryName(qname)
        .option("checkpointLocation", s"$dir/ckpt")
        .foreachBatch { (mb: DataFrame, batchId: Long) =>
          graft.operators.Dedup
            .dedupAgainstCorpus(corpus, mb, "doc_id", "text")
            .select("doc_id", "lang")
            .write.mode("overwrite").parquet(s"$dir/out/b$batchId")
        }
        .start()
    }
    spark.read.parquet(s"$dir/out/b*")
  }

  /** Stream-serving replay: the QUERY side of a candidate+verify retrieval
    * operator arrives as `chunks` micro-batches against a pinned static
    * corpus; each batch is answered by the SAME audited batch operator
    * inside foreachBatch, results appended idempotently per batchId (the
    * q512 exactly-once pattern). Per-query results are batching-independent
    * by construction (the operator emits a per-query-key top-k that never
    * looks at other queries), so the streamed union EQUALS the one-shot
    * batch result and gates share the batch oracle verbatim — the
    * ANN-serving shape (a continuous query stream over a static index)
    * without a second code path to audit. */
  def replayedQueryServe(spark: SparkSession, queries: DataFrame,
                         chunkKey: org.apache.spark.sql.Column, chunks: Int,
                         name: String)(
      serve: DataFrame => DataFrame): DataFrame = {
    val dir = freshReplayDir(name)
    (0 until chunks).foreach { i =>
      queries.filter(pmod(chunkKey, lit(chunks)) === i)
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/in/c$i")
    }
    val expectedRows = queries.count()
    val stream = spark.readStream.schema(queries.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/in/c*")
    val qname = s"graft_gate_${name}_${replaySeq.incrementAndGet()}"
    drainStream(spark, qname, expectedRows) {
      stream.writeStream
        .queryName(qname)
        .option("checkpointLocation", s"$dir/ckpt")
        .foreachBatch { (mb: DataFrame, batchId: Long) =>
          serve(mb).write.mode("overwrite").parquet(s"$dir/out/b$batchId")
        }
        .start()
    }
    spark.read.parquet(s"$dir/out/b*")
  }

  /** Streamed dedup-at-ingest against the PERSISTED standing index
    * (round-10): each micro-batch (1) dedups against the index tables as
    * they stand — the SAME audited Dedup.dedupAgainstIndex, reloaded per
    * batch so nothing is served from session memory, (2) appends its
    * survivors' three artifacts (O(batch) — Dedup.appendIndex), and (3)
    * writes survivors per batchId. This is the full production ingest
    * loop: stream + storage-backed index + incremental maintenance in
    * one path; batches arriving in chunk order make survivorship
    * chunk-DEPENDENT exactly like the q515 oracle (a later near-dup of
    * an earlier survivor drops). Replay safety: a re-delivered batch
    * re-appends its artifacts, and duplicate index rows are SEMANTICALLY
    * idempotent for dedup — the fingerprint anti-join, the DISTINCT
    * band candidates, and the verify (whose drop-set is distinct'd) all
    * give identical survivors against duplicated rows — while the
    * survivor outputs overwrite per batchId as everywhere else. */
  def replayedIndexIngest(spark: SparkSession, prefix: String,
                          batchDocs: DataFrame, chunkKey: org.apache.spark.sql.Column,
                          chunks: Int, name: String): DataFrame = {
    val base = batchDocs.select(col("doc_id"), col("text"), col("lang"))
    val dir = freshReplayDir(name)
    val tagged = base.withColumn("__c", pmod(chunkKey, lit(chunks)))
      .localCheckpoint(eager = false) // chunks written one at a time below
    // Chunk files are APPENDED between processAllAvailable calls (the
    // replayedGeoJsonStream discipline), NOT pre-written: survivorship
    // against a maintained index is ORDER-dependent (a chunk-B near-dup
    // of a chunk-A survivor must drop), and a file source's listing
    // order over a pre-populated directory is not a sequencing contract.
    val stream = spark.readStream.schema(base.schema)
      .parquet(s"$dir/in/c*")
    val qname = s"graft_gate_${name}_${replaySeq.incrementAndGet()}"
    val q = stream.writeStream
      .queryName(qname)
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (mb: DataFrame, batchId: Long) =>
        val surv = graft.operators.Dedup
          .dedupAgainstIndex(graft.operators.Dedup.readIndex(spark, prefix),
            mb, "doc_id", "text")
          .localCheckpoint(eager = false) // feeds the append AND the sink
        surv.select("doc_id", "lang")
          .write.mode("overwrite").parquet(s"$dir/out/b$batchId")
        graft.operators.Dedup.appendIndex(surv, "doc_id", "text", prefix)
      }
      .start()
    try {
      (0 until chunks).foreach { i =>
        tagged.filter(col("__c") === i).drop("__c")
          .coalesce(1)
          .write.mode("overwrite").parquet(s"$dir/in/c$i")
        awaitAllAvailable(q, qname)
      }
      q.exception.foreach(throw _)
    } finally q.stop()
    spark.read.parquet(s"$dir/out/b*")
  }

  /** The q521 production ingest loop on the EMBEDDING index (q526's
    * storage + q512's replay discipline): vector micro-batches dedup via
    * the audited [[graft.operators.Dedup.dedupEmbAgainstIndex]] over the
    * RELOADED persisted tables, append their survivors' band/vector rows
    * (O(batch)), and emit survivors per batchId. Chunk files are
    * appended between drains — survivorship against a maintained index
    * is ORDER-dependent — so the gate shares q526's chained two-stage
    * oracle verbatim. */
  def replayedEmbIndexIngest(spark: SparkSession, prefix: String,
                             batchVecs: DataFrame,
                             chunkKey: org.apache.spark.sql.Column,
                             chunks: Int, name: String, dim: Int,
                             threshold: Double): DataFrame = {
    val base = batchVecs.select(col("vec_id"), col("embedding"), col("label"))
    val dir = freshReplayDir(name)
    val tagged = base.withColumn("__c", pmod(chunkKey, lit(chunks)))
      .localCheckpoint(eager = false)
    val stream = spark.readStream.schema(base.schema)
      .parquet(s"$dir/in/c*")
    val qname = s"graft_gate_${name}_${replaySeq.incrementAndGet()}"
    val q = stream.writeStream
      .queryName(qname)
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (mb: DataFrame, batchId: Long) =>
        val surv = graft.operators.Dedup
          .dedupEmbAgainstIndex(
            graft.operators.Dedup.readEmbIndex(spark, prefix),
            mb, "vec_id", "embedding", dim, threshold)
          .localCheckpoint(eager = false) // feeds the append AND the sink
        surv.select("vec_id", "label")
          .write.mode("overwrite").parquet(s"$dir/out/b$batchId")
        graft.operators.Dedup.appendEmbIndex(surv, "vec_id", "embedding",
          dim, prefix)
      }
      .start()
    try {
      (0 until chunks).foreach { i =>
        tagged.filter(col("__c") === i).drop("__c")
          .coalesce(1)
          .write.mode("overwrite").parquet(s"$dir/in/c$i")
        awaitAllAvailable(q, qname)
      }
      q.exception.foreach(throw _)
    } finally q.stop()
    spark.read.parquet(s"$dir/out/b*")
  }

  /** Streamed IVM replay (round-10): the signed-delta batches of a
    * materialized additive view arrive as `chunks` micro-batches; each
    * foreachBatch merges its batch into the CURRENT persisted view
    * version via the SAME audited operator (Incremental.mergeAggDelta)
    * and writes the next — view_{b+1} = merge(view_b, batch_b), the
    * nightly-refresh loop run continuously. Versioned writes keyed by
    * batchId make replays idempotent (a re-delivered batch b rewrites
    * v_{b+1} from the same v_b — the q512 exactly-once discipline). The
    * merge algebra is associative over batches and deletes are genuine
    * base rows (a group's count reaching 0 implies its sums reach 0), so
    * the final version equals the one-shot merge and the gate shares
    * q444's from-scratch recompute oracle. The base table is never read
    * in ANY refresh — each micro-batch costs O(|batch| + touched
    * groups). */
  def replayedIvmMerge(spark: SparkSession, view0: DataFrame, delta: DataFrame,
                       keys: Seq[String], cntCol: String, sumCols: Seq[String],
                       chunkKey: org.apache.spark.sql.Column, chunks: Int,
                       name: String): DataFrame = {
    val dir = freshReplayDir(name)
    view0.write.mode("overwrite").parquet(s"$dir/view/v0")
    val tagged = delta.withColumn("__c", pmod(chunkKey, lit(chunks)))
    (0 until chunks).foreach { i =>
      tagged.filter(col("__c") === i).drop("__c")
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/in/c$i")
    }
    val expectedRows = delta.count()
    val stream = spark.readStream.schema(tagged.drop("__c").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/in/c*")
    val qname = s"graft_gate_${name}_${replaySeq.incrementAndGet()}"
    drainStream(spark, qname, expectedRows) {
      stream.writeStream
        .queryName(qname)
        .option("checkpointLocation", s"$dir/ckpt")
        .foreachBatch { (mb: DataFrame, batchId: Long) =>
          val cur = spark.read.parquet(s"$dir/view/v$batchId")
          graft.operators.Incremental
            .mergeAggDelta(cur, mb, keys, cntCol, sumCols)
            .write.mode("overwrite").parquet(s"$dir/view/v${batchId + 1}")
        }
        .start()
    }
    spark.read.parquet(s"$dir/view/v$chunks")
  }

  /** Hard ceiling on any single replay drain. A drain that takes longer
    * than this at sf0.1 is a harness bug, not a slow query — fail loudly
    * rather than hang the Verify runner. */
  private[graft] val DrainDeadlineMs = 300000L

  /** Bounded `processAllAvailable` for the sequenced-append replays
    * (write a chunk file, drain, write the next): they use the engine
    * primitive directly between appends, so give them the same hard
    * deadline as [[drainStream]] — the round-10 lesson (an unbounded
    * drain hangs the whole Verify runner) applied to every drain site. */
  private def awaitAllAvailable(
      q: org.apache.spark.sql.streaming.StreamingQuery, tag: String): Unit = {
    val err = new java.util.concurrent.atomic.AtomicReference[Throwable]
    val t = new Thread(() => {
      try q.processAllAvailable()
      catch { case e: Throwable => err.set(e) }
    }, s"paa-$tag")
    t.setDaemon(true)
    t.start()
    t.join(DrainDeadlineMs)
    if (t.isAlive)
      throw new IllegalStateException(
        s"replay $tag: processAllAvailable exceeded ${DrainDeadlineMs / 1000}s")
    Option(err.get()).foreach(throw _)
  }

  /** Drain a replay query — THE authoritative drain semantics (the only
    * comment describing them; keep it that way).
    *
    * Two completion signals exist and each is wrong for the other class:
    *
    *  - `processingTimeTimeout = false` (default): block on the ENGINE's
    *    own primitive — `processAllAvailable` returns only after every
    *    batch over the listed input has COMMITTED (foreachBatch body
    *    included). A listener-latch drain is NOT sufficient here: progress
    *    events ride an async bus, and ~half of fresh-JVM q518 runs stopped
    *    the query between the input-row count reaching its target and the
    *    LAST batch's sink commit — the final output directory simply never
    *    appeared (q518's 35-of-50-row flake, round 10). The listener
    *    remains as a post-drain sanity check that the source actually
    *    listed every chunk (grace-waited, the bus is async). PAA runs on a
    *    helper thread joined against [[DrainDeadlineMs]] so a misclassified
    *    query fails loudly instead of hanging forever.
    *
    *  - `processingTimeTimeout = true` (the T5 gate): `processAllAvailable`
    *    NEVER RETURNS — under GroupStateTimeout.ProcessingTimeTimeout,
    *    FlatMapGroupsWithStateExec.shouldRunAnotherBatch is always true
    *    (processing time always advances), so empty timeout-check batches
    *    run on every trigger forever and `noNewData` never latches (this
    *    hung the whole round-10 Verify run at q72). Completion instead:
    *    latch the listener's input-row count at `expectedRows`, then wait
    *    for a progress event of a batch that committed with
    *    `numInputRows == 0` at-or-after the latch. Progress events publish
    *    AFTER their batch's sink commit and batches are sequential, so an
    *    empty batch committing once all input rows were counted proves
    *    every listed input batch committed first — the same commit-race
    *    guarantee PAA gives, without waiting on a latch that never fires. */
  private[graft] def drainStream(spark: SparkSession, qname: String, expectedRows: Long,
                                 processingTimeTimeout: Boolean = false)(
      start: => org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    val rowsSeen = new java.util.concurrent.atomic.AtomicLong(0)
    @volatile var emptyCommitAfterLatch = false
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit =
        if (e.progress.name == qname) {
          val n = e.progress.numInputRows
          if (rowsSeen.addAndGet(n) >= expectedRows && n == 0)
            emptyCommitAfterLatch = true
        }
      override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    val query = start
    try {
      val deadline = System.nanoTime() + DrainDeadlineMs * 1000000L
      if (processingTimeTimeout) {
        while (!emptyCommitAfterLatch && query.isActive && System.nanoTime() < deadline)
          Thread.sleep(50)
        query.exception.foreach(throw _)
        // Two distinct wait-loop exits misdirect debugging if conflated
        // (round-12 advisor fix): the deadline genuinely elapsing vs the
        // query terminating early without an exception — name which.
        val cause =
          if (System.nanoTime() >= deadline)
            s"drain deadline (${DrainDeadlineMs / 1000}s) elapsed"
          else "query terminated before the empty-commit latch (no exception)"
        require(emptyCommitAfterLatch,
          s"replay $qname: $cause — saw " +
            s"${rowsSeen.get()} of $expectedRows input rows, emptyCommitAfterLatch=false")
      } else {
        val paaError = new java.util.concurrent.atomic.AtomicReference[Throwable]
        val paa = new Thread(() => {
          try query.processAllAvailable()
          catch { case t: Throwable => paaError.set(t) }
        }, s"drain-$qname")
        paa.setDaemon(true)
        paa.start()
        paa.join(DrainDeadlineMs)
        if (paa.isAlive)
          throw new IllegalStateException(
            s"replay $qname: processAllAvailable exceeded ${DrainDeadlineMs / 1000}s — " +
              "a ProcessingTimeTimeout query must drain with processingTimeTimeout=true")
        Option(paaError.get()).foreach(throw _)
        query.exception.foreach(throw _)
        val grace = System.nanoTime() + 10L * 1000 * 1000 * 1000
        while (rowsSeen.get() < expectedRows && System.nanoTime() < grace)
          Thread.sleep(50)
        require(rowsSeen.get() >= expectedRows,
          s"replay $qname under-read: saw ${rowsSeen.get()} of $expectedRows input rows")
      }
    } finally {
      query.stop()
      spark.streams.removeListener(listener)
    }
  }
}
