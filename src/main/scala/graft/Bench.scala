package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line on stdout. Per-query progress
  * goes to stderr so stragglers are visible without polluting the contract
  * output.
  *
  * Self-diagnosing artifact: this host is a shared VM, and a noisy
  * neighbour during the measurement window can inflate every iteration of a
  * query by 5-11× (observed round 3). The JSON therefore carries, per query,
  * the RAW per-iteration times and a /proc/loadavg sample taken before each
  * query — an inflated run is then visible in its own artifact (loadavg ≫
  * core count) instead of needing an out-of-band re-measurement.
  */
object Bench {

  /** Global budget for quiet-certification waits (ms): bounds the TOTAL
    * untimed sleeping across the whole run, so a host that never goes
    * quiet costs at most ~5 min of extra wall clock, not per-query. */
  private var sleepBudgetMs: Long = 300000L

  /** 1-minute load average — exogenous-load evidence for the artifact. */
  private def loadavg(): Double =
    try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try src.mkString.split(" ")(0).toDouble finally src.close()
    } catch { case scala.util.control.NonFatal(_) => -1.0 }

  private def cpuJiffies(): (Long, Long) = { // (busy, total)
    val src = scala.io.Source.fromFile("/proc/stat")
    val f = try src.getLines().next().trim.split("\\s+").drop(1).map(_.toLong)
            finally src.close()
    // fields 0-7 = user nice system idle iowait irq softirq steal; guest +
    // guest_nice (8-9) are already folded into user/nice by the kernel, so
    // summing them double-counts guest time and overstates busy (round-8
    // advice) — take at most the first 8 fields.
    val g = f.take(8)
    val idle = g(3) + (if (g.length > 4) g(4) else 0L) // idle + iowait
    (g.sum - idle, g.sum)
  }

  /** Cumulative CPU nanoseconds consumed by THIS process (all threads,
    * incl. GC/JIT) — the self-attribution side of the exogenous-CPU
    * channel. -1 if the platform bean is unavailable. */
  private def procCpuNanos(): Long =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case b: com.sun.management.OperatingSystemMXBean => b.getProcessCpuTime
      case _ => -1L
    }

  /** Cumulative IO-pressure stall micros (PSI `some`) — threads blocked on
    * IO host-wide. Sampled across an iteration it measures how much of the
    * window ANYONE (us or a neighbour) stalled on disk. -1 = PSI absent. */
  private def ioStallMicros(): Long =
    try {
      val src = scala.io.Source.fromFile("/proc/pressure/io")
      val line = try src.getLines().next() finally src.close()
      line.split("\\s+").collectFirst {
        case s if s.startsWith("total=") => s.stripPrefix("total=").toLong
      }.getOrElse(-1L)
    } catch { case scala.util.control.NonFatal(_) => -1L }

  /** (heapUsedMb, metaspaceUsedMb, codeCacheUsedMb) — JVM-state evidence
    * sampled once per gate after hygiene: a late-suite slowdown caused by
    * accumulated driver state (heap growth, metaspace/class churn, JIT
    * code-cache exhaustion) is then visible in the gate's own artifact row
    * instead of needing an out-of-band profiler. */
  private def jvmHealth(): (Long, Long, Long) = {
    import scala.jdk.CollectionConverters._
    val pools = java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
    def mb(n: Long) = n >> 20
    val heap = java.lang.management.ManagementFactory.getMemoryMXBean
      .getHeapMemoryUsage.getUsed
    val meta = pools.filter(_.getName.contains("Metaspace"))
      .map(_.getUsage.getUsed).sum
    val code = pools.filter(_.getName.startsWith("CodeHeap"))
      .map(_.getUsage.getUsed).sum
    (mb(heap), mb(meta), mb(code))
  }

  /** Instantaneous whole-host CPU busy fraction over a short window —
    * sampled BETWEEN iterations, when this JVM is idle, it measures
    * EXOGENOUS load only. The 1-min loadavg cannot: the bench's own
    * 32-thread bursts drag a trailing average through the next several
    * gates (observed: one heavy fixture build pushed loadavg to 16-20 and
    * the following three gates' brackets all read "loaded" while their
    * iteration times sat rock-steady — self-load, not a neighbour).
    * -1 = /proc/stat unavailable. */
  private def busyFrac(windowMs: Long = 120): Double =
    try {
      val (b0, t0) = cpuJiffies()
      Thread.sleep(windowMs)
      val (b1, t1) = cpuJiffies()
      if (t1 == t0) -1.0 else (b1 - b0).toDouble / (t1 - t0)
    } catch { case scala.util.control.NonFatal(_) => -1.0 }

  /** Short key for the contract line: "q36_neardup_jaccard" -> "q36". The
    * driver's tail capture is ~2.2 KiB; full query names across 100+ queries
    * overflow it (that is exactly how round 4's artifact became unparseable),
    * while qNN keys keep the whole contract line ≈1.5 KiB. The short->full
    * mapping ships in the BENCH_DETAIL sidecar.
    */
  private def shortKey(name: String): String = name.takeWhile(_ != '_')

  /** One gate's measurement record — every evidence channel the detail
    * sidecar ships, aligned 1:1 with `ran` (the raw iteration times).
    * `gateDegraded` is the round-12 per-gate stamp: the gate's window
    * showed an above-trip calibration bracket (or exceeds 1.5× its
    * committed quiet reference) and no settled re-run cleared it.
    * `retrySteady` is the end-of-suite quiet-retry measurement (-1 =
    * not retried). */
  private final case class GateResult(
    name: String, cold: Double, steady: Double, ok: Boolean,
    ran: Seq[Double], preLoads: Seq[Double], postLoads: Seq[Double],
    preBusy: Seq[Double], postBusy: Seq[Double],
    exoCpu: Seq[Double], procCpu: Seq[Double], ioStall: Seq[Double],
    calPre: Seq[Double], calPost: Seq[Double],
    heapMb: Long, metaMb: Long, codeMb: Long,
    certified: Boolean, gateDegraded: Boolean = false,
    retrySteady: Double = -1.0)

  /** Budgeted wait for the HOST to read quiet on the calibration probe —
    * the precondition for any re-measurement meant to correct a loaded
    * window (re-running inside the same burst just reproduces it; the
    * round-6 back-to-back-retry lesson applied to the probe channel).
    * Settle bar = [[Calibration.RunDegradedRatio]] (1.10), deliberately
    * STRICTER than the 1.25 trip: the q100 blind spot was brackets
    * straddling just under the trip while the window ran ~2.5× slow, so
    * a corrective re-run must start from a window the probe calls
    * genuinely quiet (settled quiet probes read ~1.03-1.06 on this rig).
    * Returns whether quiet was reached; waiting spends the shared
    * [[sleepBudgetMs]]. */
  private def waitForQuiet(maxWaitMs: Long): Boolean = {
    val deadline = System.nanoTime() + maxWaitMs * 1000000L
    var r = Calibration.settledRatio()
    while (r > Calibration.RunDegradedRatio &&
           System.nanoTime() < deadline && sleepBudgetMs > 0) {
      val nap = math.min(3000L, sleepBudgetMs)
      Thread.sleep(nap); sleepBudgetMs -= nap
      r = Calibration.settledRatio()
    }
    r <= Calibration.RunDegradedRatio
  }

  /** Committed per-gate quiet steady references (seconds), regenerated
    * each round from a quiet full run (tools/quiet_ref.py): the anchor
    * for the end-of-suite retry queue and the ≥1.5× stamp. Absent file →
    * empty map (the channel degrades to the per-bracket arm only). */
  private def loadQuietRef(): Map[String, Double] = {
    val path = sys.env.getOrElse("SPARK_GRAFT_QUIET_REF", "bench_quiet_ref.json")
    val f = new java.io.File(path)
    if (!f.isFile) Map.empty
    else try {
      val src = scala.io.Source.fromFile(f)
      val txt = try src.mkString finally src.close()
      val re = """"([^"]+)"\s*:\s*(-?[0-9.eE+]+)""".r
      re.findAllMatchIn(txt).map(m => m.group(1) -> m.group(2).toDouble).toMap
    } catch { case scala.util.control.NonFatal(_) => Map.empty }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = LocalSession.build(cpus, "graft-bench")
    // Round-10 calibration channel (the q111/q100 closer): a fixed
    // pointer-chase whose quiet-host cost is committed as
    // Calibration.RefMs, timed bracketing each heavy iteration. It
    // catches the theft class every jiffies channel is blind to — a
    // co-tenant/hypervisor making our jiffies do less work (wall 5×,
    // exo ≈ 0, the r8/r9 signature) — validated by ThrashCheck:
    // in-process contention at exo = 0.001 inflated real 32-thread work
    // 4.0× and the probe 4.5× (trips), while quiet ratio sits at 1.00.
    Calibration.warm()
    // Warm the JVM once on tiny tables (codegen compiler, parquet reader,
    // shuffle machinery) so the first measured query doesn't absorb one-time
    // session costs.
    locally {
      import org.apache.spark.sql.functions._
      val r = Tables.region(spark, sfDir)
      val n = Tables.nation(spark, sfDir)
      r.join(n, r("r_regionkey") === n("n_regionkey"))
        .groupBy("r_name").count()
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("r_name").orderBy("count")))
        .count(): Unit
    }
    // Each query runs `iters` times; the REPORTED time is the MINIMUM —
    // steady state. The first run of a plan pays one-time costs (Janino
    // codegen compile, JIT, page cache) that are process artifacts, not data
    // work: on a real cluster a plan compiles once and then processes 100 TB,
    // so steady-state is the number that predicts scale. The min (not the
    // last run) is robust to one-off host-noise/GC spikes on this shared VM.
    // The cold first-run time is still emitted per query ("cold"), and every
    // raw iteration lands in "iter_times" for spread diagnosis.
    // 3 iterations: iter 1 is the cold run (codegen/JIT/page-cache); iters
    // 2-3 are both steady, so "iter_times" demonstrates the within-JVM
    // steady-state spread directly (the ≤1.5× quiet signature) instead of
    // conflating cold-vs-steady.
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt.max(1)
    // Correctness-gate HARNESSES, not queries: their wall time measures
    // replay plumbing (temp-dir chunk writes, micro-batch scheduling,
    // per-object sink PUTs), so timing them would grade the test rig. They
    // stay in Verify's gate; the artifact names them so the exclusion is
    // visible.
    val harness = Set("q71_stream_latest_status", "q72_stream_session_state",
      "q74_json_log_roundtrip", "q75_binary_roundtrip", "q76_stream_dedup",
      "q108_stream_interval_join", "q113_stream_retention",
      "q244_stream_left_interval_join", "q248_stream_dedup_within_watermark",
      "q452_stream_full_interval_join", "q466_stream_transform_with_state", "q467_stream_session_timers", "q470_stream_lastk_path", "q471_stream_type_counts", "q480_stream_seeded_count",
      "q254_stream_rate_limit", "q261_stream_restart_exactly_once",
      "q510_stream_multimodal_ingest", "q512_stream_incremental_dedup",
      "q514_stream_ann_serve", "q518_ivf_persist_serve",
      "q519_stream_ivm_replay", "q521_stream_index_ingest",
      "q527_stream_emb_index_ingest",
      "q134_stream_session_agg", "q137_stream_enrich", "q138_stream_file_sink",
      "q163_stream_heavy_hitters", "q442_stream_geojson")
    // Single-gate mode (diagnosis): `sbt "runMain graft.Bench q252"` (or the
    // full name) measures just those gates in an otherwise-idle JVM — the
    // round-7 q252 question ("regression or 500-gate JVM accumulation?") is
    // answerable in-repo instead of out-of-band.
    val only = args.toSet
    def measureGate(name: String,
                    fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
                    itersN: Int): GateResult = {
      // Between-query hygiene (untimed): drop the previous query's orphaned
      // localCheckpoint/shuffle blocks. The ContextCleaner unpersists them
      // only after the referencing plan is garbage-collected, so without an
      // explicit GC the block manager accumulates earlier queries' blocks
      // and evicts the CURRENT query's checkpoint mid-iteration — observed
      // as 3-5x single-iteration spikes on the checkpoint-heavy queries
      // (q100/q111) late in a 111-query run, at low host load. Round-8
      // hardening after q252's quiet-host 7→12.6 s drift in the 500-gate
      // run (isolated single-gate rerun measured 6.6 s → JVM accumulation,
      // not a plan regression): explicitly unpersist every lingering
      // cached plan and persistent RDD (localCheckpoints) FIRST, so the GC
      // actually releases their blocks instead of waiting on plan
      // references still held by the results buffer.
      def hygiene(): Unit = {
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        System.gc()
        Thread.sleep(100)
      }
      hygiene()
      // post-hygiene JVM state snapshot (evidence channel for the
      // "accumulated driver state" hypothesis — if a late-suite gate is
      // slow AND these have grown monotonically, the artifact shows it)
      val (heapMb, metaMb, codeMb) =
        try jvmHealth() catch { case scala.util.control.NonFatal(_) => (-1L, -1L, -1L) }
      val times = scala.collection.mutable.ArrayBuffer.empty[Double]
      // loadavg sampled BEFORE and AFTER each iteration, aligned 1:1 with
      // iter_times — an iteration is BRACKETED-QUIET only when both samples
      // are ≤ quietThresh, so "load rose mid-iteration" (round-7's q111:
      // pre 5.8 → post 13.3, the 74 s iteration shipped as certified) is
      // caught by its own artifact.
      val preLoads = scala.collection.mutable.ArrayBuffer.empty[Double]
      val postLoads = scala.collection.mutable.ArrayBuffer.empty[Double]
      // instantaneous busy-fraction brackets, sampled only once a gate has
      // shown a ≥1.5 s iteration (the sampling window costs ~0.25 s per
      // iteration — pointless on the sub-2 s tail that certifies trivially;
      // -2 = deliberately unsampled)
      val preBusy = scala.collection.mutable.ArrayBuffer.empty[Double]
      val postBusy = scala.collection.mutable.ArrayBuffer.empty[Double]
      // ACROSS-iteration channels (round-9: the round-8 brackets sampled the
      // host only BETWEEN iterations, so a bursty neighbour active during
      // the iterations but idle in the 120 ms gaps — the r8 q111 signature:
      // all three iterations 15-25 s, busy_pre/post 0.0 — shipped as
      // certified). Per iteration we now record host busy fraction, OUR OWN
      // process's CPU fraction, and their difference = exogenous CPU during
      // the window. Self-load-immune by construction: our 32-thread bursts
      // land in proc_cpu and subtract out.
      val exoCpu = scala.collection.mutable.ArrayBuffer.empty[Double]
      val procCpu = scala.collection.mutable.ArrayBuffer.empty[Double]
      val ioStall = scala.collection.mutable.ArrayBuffer.empty[Double]
      // Calibration brackets (round-10): effective-speed ratio
      // (probe ms / Calibration.RefMs) sampled immediately before and
      // after each iteration, once the gate has shown a ≥1.5 s iteration
      // (same trigger as the busy brackets; the probe costs ~92 ms, so
      // it would double the sub-second tail's wall for nothing).
      // -2 = deliberately unsampled. Certification of a heavy iteration
      // now REQUIRES quiet calibration on both sides — the channel that
      // sees invisible CPU theft (wall inflated, jiffies clean).
      val calPre = scala.collection.mutable.ArrayBuffer.empty[Double]
      val calPost = scala.collection.mutable.ArrayBuffer.empty[Double]
      val ncores = Runtime.getRuntime.availableProcessors().toDouble
      var sampleBusy = false
      var ok = true
      def runOnce(): Unit = {
        // Between-ITERATION hygiene (untimed): each iteration re-invokes
        // the gate fn, so the previous iteration's pinned localCheckpoints
        // are dead garbage by construction (fresh ones are created per
        // invocation; lineage-truncated RDDs are never plan-cache-matched)
        // — and they accumulate: 3 pins/iter on the checkpoint-pinning
        // gates made q509's iterations RISE [5.8, 18.9, 44.9 s] with
        // process CPU climbing ~+40 CPU-s per iteration in a deep-suite
        // JVM (r9 full run; flat in any short run). Unpersist ONLY those.
        // Deliberately NOT clearCache(): the cache manager's plan-match
        // reuse across iterations is real steady-state warmth — clearing
        // it re-cold-started the iterative graph family every iteration
        // (q111 2.35 → 9.25 s, q296 3.25 → 8.04 s, measured), which is a
        // different (colder) quantity than the suite reports everywhere
        // else.
        // public-API test for "locally checkpointed": materialized local
        // checkpoints report isCheckpointed with NO checkpoint file
        // (reliable checkpoints carry Some(path); plain persists false)
        spark.sparkContext.getPersistentRDDs.values
          .filter(r => r.isCheckpointed && r.getCheckpointFile.isEmpty)
          .foreach(_.unpersist(blocking = false))
        // …and collect the freed garbage NOW, not mid-measurement: the
        // checkpoint-heavy gates otherwise pay the previous iteration's
        // GC debt inside the next window (q509 iters [6.7, 22.9, 15.4]
        // with unpersist alone; [6.5, 5.6, 4.7] once the full-hygiene
        // variant's gc ran — the clearCache part of that variant is what
        // hurt the graph family, not this). Heavy iterations only.
        if (times.nonEmpty && times.last >= 1.5) { System.gc(); Thread.sleep(50) }
        preLoads += loadavg()
        preBusy += (if (sampleBusy) busyFrac() else -2.0)
        calPre += (if (sampleBusy) Calibration.ratio() else -2.0)
        val (hb0, ht0) = try cpuJiffies() catch { case scala.util.control.NonFatal(_) => (-1L, -1L) }
        val pc0 = procCpuNanos()
        val io0 = ioStallMicros()
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: $e"); ok = false
        }
        val wallNs = System.nanoTime() - t0
        times += wallNs / 1e9
        val (hb1, ht1) = try cpuJiffies() catch { case scala.util.control.NonFatal(_) => (-1L, -1L) }
        val pc1 = procCpuNanos()
        val io1 = ioStallMicros()
        val hostFrac =
          if (ht0 < 0 || ht1 <= ht0) -1.0 else (hb1 - hb0).toDouble / (ht1 - ht0)
        val pFrac =
          if (pc0 < 0 || pc1 < pc0 || wallNs <= 0) -1.0
          else (pc1 - pc0).toDouble / (wallNs * ncores)
        procCpu += (if (pc0 < 0 || pc1 < pc0) -1.0 else (pc1 - pc0) / 1e9)
        exoCpu += (if (hostFrac < 0 || pFrac < 0) -1.0
                   else math.max(0.0, hostFrac - pFrac))
        ioStall += (if (io0 < 0 || io1 < io0 || wallNs <= 0) -1.0
                    else math.min(1.0, (io1 - io0) * 1000.0 / wallNs))
        // settled min-of-2 (round-11): the immediate post-window probe can
        // catch the gate's OWN trailing GC/cleanup and false-trip the
        // channel (conservative but burns the sleep budget); real external
        // theft spans both samples so the min still trips
        calPost += (if (sampleBusy) Calibration.settledRatio() else -2.0)
        postBusy += (if (sampleBusy) busyFrac() else -2.0)
        postLoads += loadavg()
        if (!sampleBusy && times.last >= 1.5) sampleBusy = true
      }
      var i = 0
      while (i < itersN && ok) { runOnce(); i += 1 }
      // Quiet-certification retries (round-7 verdict fix: certify the
      // REPORTED iteration, not ANY iteration). The reported steady time is
      // the min over bracketed-quiet iterations when one exists — so the
      // number the artifact ships always comes from a window whose load was
      // ≤ quietThresh both entering AND leaving the iteration. A heavy query
      // (global min ≥ 2 s) with NO bracketed-quiet iteration gets up to 5
      // extra warm iterations.
      // Back-to-back retries all land inside the same noise burst (round-6
      // lesson: q53's three iterations ran at loadavg 15-17 and its 3
      // immediate retries would have too) — so each retry first WAITS with
      // escalating backoff (10/20/40/60/60 s) for the burst to pass, paid
      // from a global sleep budget so a fully-loaded host can't stall the
      // whole run (waiting is untimed; the query re-runs after).
      // An iteration is bracketed-quiet when EITHER evidence channel says
      // the window was ours alone: (a) instantaneous /proc/stat busy
      // fraction ≤ busyThresh on both sides (immune to our own trailing
      // loadavg — the q53/q83/q86 false-uncertified lesson), or (b) 1-min
      // loadavg ≤ quietThresh on both sides (the r3-r7 noisy-neighbour
      // signature is 8-21). A real neighbour trips BOTH channels.
      val quietThresh = 6.0
      val busyThresh = 0.25 // ≤ 8 of 32 cores busy by someone else
      // Round-9 third channel, required for EVERY certified iteration: the
      // exogenous CPU fraction DURING the window (host busy − our process)
      // must be ≤ busyThresh. The between-iteration brackets can't see a
      // neighbour that's busy exactly while we run (r8 q111); this can, and
      // it can't false-trip on self-load because our own CPU subtracts out.
      // -1 (channel unavailable) degrades to the round-8 behaviour.
      // Round-10 fourth channel, required for EVERY certified heavy
      // iteration: quiet CALIBRATION brackets. The exo/busy/load channels
      // are all jiffies accounting, and the r8/r9 q111/q100 contamination
      // (wall 5× steady, exo ≈ 0 — theft from outside the guest) is
      // invisible to all of them by construction; the probe measures
      // effective machine speed directly. An iteration without
      // calibration samples (-2: the gate's sampling regime starts after
      // its first ≥1.5 s iteration, so for any gate that NEEDS bracket
      // certification that is only iteration 1) cannot certify — the
      // reported steady then comes from a calibrated-quiet iteration, a
      // certified upper bound (the existing quiet-min philosophy).
      def bracketQuiet(j: Int): Boolean = {
        val busyOk = preBusy(j) >= 0 && preBusy(j) <= busyThresh &&
          postBusy(j) >= 0 && postBusy(j) <= busyThresh
        val loadOk = preLoads(j) >= 0 && preLoads(j) <= quietThresh &&
          postLoads(j) >= 0 && postLoads(j) <= quietThresh
        val exoOk = exoCpu(j) < 0 || exoCpu(j) <= busyThresh
        val calOk = calPre(j) >= 0 && calPre(j) <= Calibration.TripRatio &&
          calPost(j) >= 0 && calPost(j) <= Calibration.TripRatio
        exoOk && calOk && (busyOk || loadOk)
      }
      def quietIdxs = times.indices.filter(bracketQuiet)
      var extras = 0
      while (ok && times.min >= 2.0 && extras < 5 && quietIdxs.isEmpty) {
        val backoffMs = math.min(10000L << extras, 60000L)
        val waitMs = math.min(backoffMs, Bench.sleepBudgetMs)
        System.err.println(f"[bench] $name retry ${extras + 1} for a bracketed-quiet iteration (pre ${preLoads.map(l => f"$l%.1f").mkString(",")} post ${postLoads.map(l => f"$l%.1f").mkString(",")} cal ${calPre.map(c => f"$c%.2f").mkString(",")}; waiting ${waitMs / 1000}%d s)")
        if (waitMs > 0) { Thread.sleep(waitMs); Bench.sleepBudgetMs -= waitMs }
        runOnce(); extras += 1
      }
      // Per-gate degradation arm (round-12, the q100 closer): a single
      // gate's loaded window can certify when its brackets STRADDLE the
      // 1.25 trip (q100 r11: one pre-bracket 1.321, the certified
      // iteration's brackets just under — shipped 13.8 s vs 5.5 s quiet)
      // while the run-level median stays clean. Rule: a heavy gate with
      // ANY sampled above-trip bracket is never silently certified — it
      // either re-runs once more after the host settles to genuinely
      // quiet (probe ≤ 1.10, stricter than the trip, so the corrective
      // window can't itself be a straddle) and that re-run's clean
      // bracket-quiet iteration corrects/confirms the number, or it
      // ships stamped `gate_degraded`.
      def hotIdx(j: Int): Boolean =
        calPre(j) > Calibration.TripRatio || calPost(j) > Calibration.TripRatio
      var settleCleared = false
      val sawHot = times.indices.exists(hotIdx)
      if (ok && sawHot && times.min >= 2.0) {
        System.err.println(f"[bench] $name above-trip bracket (cal pre ${calPre.map(c => f"$c%.2f").mkString(",")} post ${calPost.map(c => f"$c%.2f").mkString(",")}) — settling for a corrective re-run")
        if (waitForQuiet(60000L)) {
          runOnce()
          val j = times.length - 1
          settleCleared = !hotIdx(j) && bracketQuiet(j)
        }
      }
      val gateDegraded = ok && sawHot && times.min >= 2.0 && !settleCleared
      val ran = times.toSeq
      val cold = ran.head
      val globalMin = ran.min
      // sub-2 s global min: host noise cannot inflate it past the grading
      // resolution — trivially certified on the global min. Otherwise the
      // reported number is the quiet min (a certified upper bound even when
      // a loaded iteration happened to run faster).
      val qi = quietIdxs
      val steady =
        if (globalMin < 2.0 || qi.isEmpty) globalMin
        else qi.map(ran).min
      val certified = steady < 2.0 || qi.nonEmpty
      val load0 = preLoads.head
      val load1 = postLoads.last
      val exoMax = exoCpu.filter(_ >= 0) match {
        case b if b.isEmpty => -1.0; case b => b.max
      }
      val calMax = (calPre ++ calPost).filter(_ >= 0) match {
        case b if b.isEmpty => -1.0; case b => b.max
      }
      System.err.println(
        f"[bench] $name%-24s cold $cold%8.2f s  steady $steady%8.2f s  load $load0%5.1f->$load1%5.1f  exo $exoMax%5.2f  cal $calMax%5.2f" +
          (if (!ok) "  FAILED" else if (!certified) "  UNCERTIFIED" else "") +
          (if (gateDegraded) "  GATE-DEGRADED" else ""))
      GateResult(name, cold, steady, ok, ran, preLoads.toSeq, postLoads.toSeq,
        preBusy.toSeq, postBusy.toSeq, exoCpu.toSeq, procCpu.toSeq,
        ioStall.toSeq, calPre.toSeq, calPost.toSeq,
        heapMb, metaMb, codeMb, certified, gateDegraded)
    }
    val qmap = SparkEntry.queries
    val results0 = qmap.toSeq.sortBy(_._1)
      .filterNot(q => harness(q._1))
      .filter(q => only.isEmpty || only(q._1) || only(shortKey(q._1)))
      .map { case (name, fn) => measureGate(name, fn, iters) }
    // ---- end-of-suite quiet-retry queue (round-12, the second arm of the
    // per-gate channel): gates that finished either stamped (above-trip
    // bracket, uncorrected) or ≥1.5× their committed quiet reference get
    // ONE re-measurement in the suite's tail — the quietest window the run
    // will ever see (all 32-thread work done, host given a settle wait) —
    // keeping min(steady, retry). The quiet reference (bench_quiet_ref
    // .json, regenerated each round from a quiet full run) is what makes
    // "this number is 2× its known-quiet value" detectable at all: a
    // loaded per-gate window whose brackets all straddle under the trip is
    // invisible to every in-window channel by construction. Queue capped
    // (worst ratios first, cap logged) so a hopelessly-loaded host bounds
    // the extra wall at ~12 gate re-runs.
    val quietRef = loadQuietRef()
    def refExceeded(r: GateResult): Boolean =
      quietRef.get(r.name).exists(ref => ref > 0 && r.steady > ref * 1.5)
    val queue0 = results0.filter(r => r.ok && r.steady >= 2.0 &&
      (r.gateDegraded || refExceeded(r)))
      .sortBy(r => -(r.steady / quietRef.getOrElse(r.name, r.steady)))
    val queue = queue0.take(12)
    if (queue0.size > queue.size)
      System.err.println(s"[bench] quiet-retry queue capped at ${queue.size} of ${queue0.size} candidates (worst ratios kept)")
    val results1 = if (queue.isEmpty) results0 else {
      System.err.println(s"[bench] quiet-retry queue: ${queue.map(_.name).mkString(", ")}")
      val retried: Map[String, GateResult] = queue.map { r =>
        waitForQuiet(90000L): Unit // retry regardless; the retry's own brackets decide
        val again = measureGate(r.name, qmap(r.name), 2)
        // the retry corrects the number only from a CERTIFIED (bracket-
        // quiet) window; an unclean retry leaves the original in place.
        // The stamp survives unless the retry's own window was clean AND
        // it no longer exceeds the quiet reference.
        val steady2 = if (again.certified) math.min(r.steady, again.steady) else r.steady
        val merged = r.copy(steady = steady2, retrySteady = again.steady,
          certified = r.certified || again.certified,
          gateDegraded = again.gateDegraded ||
            (r.gateDegraded && !again.certified))
        System.err.println(f"[bench] ${r.name} quiet-retry: ${r.steady}%.2f -> ${merged.steady}%.2f s (retry ${again.steady}%.2f, certified ${again.certified}, stamped ${merged.gateDegraded || refExceeded(merged)})")
        r.name -> merged
      }.toMap
      results0.map(r => retried.getOrElse(r.name, r))
    }
    // stamp finalization: whatever the in-window channels said, a heavy
    // gate still ≥1.5× its committed quiet steady after the retry ships
    // stamped — the artifact's slow-map then carries no silently-loaded
    // number (the round-12 "Done" bar).
    val results = results1.map { r =>
      if (r.ok && r.steady >= 2.0 && refExceeded(r) && !r.gateDegraded)
        r.copy(gateDegraded = true)
      else r
    }
    def fmt(d: Double) = f"$d%.3f"
    def fmt2(d: Double) = f"$d%.2f"
    // Contract-line value format: 2 dp under 10 s (1 dp above), trailing
    // zeros trimmed — worth ~100 B across 150 queries, and byte-headroom on
    // the contract line is a real resource (see shortKey).
    def fmtQ(d: Double) = {
      val s = if (d >= 10) f"$d%.1f" else f"$d%.2f"
      val t = s.reverse.dropWhile(_ == '0').reverse.stripSuffix(".")
      if (t.isEmpty) "0" else t
    }
    // failed queries report -1 and are EXCLUDED from the total (a broken
    // query must not read as a fast one), and named in "failed".
    //
    // CONTRACT LINE (final stdout line, compact): total + steady per-query
    // map keyed by qNN + failed + sf. Everything diagnostic — full names,
    // cold times, raw per-iteration times, loadavg samples — goes to the
    // BENCH_DETAIL sidecar and stderr, NOT the contract line, so the line
    // stays well inside the driver's ~2.2 KiB tail capture (round 4's
    // artifact was unparseable because the diagnostics rode on this line).
    // At 200+ gated queries even the compact qNN map outgrows the capture
    // (~13 B/entry × 200 ≈ 2.6 KiB — the round-4 failure mode returns).
    // The contract map therefore lists only NON-TRIVIAL queries (steady ≥
    // `mapCutoff`); the sub-cutoff tail is folded into three summary fields
    // ("n_fast", "fast_total", "fast_max") — zero information loss for
    // grading (per-query values for EVERY query stay in the sidecar +
    // stderr detail), and the cutoff auto-raises until the line fits, so
    // the artifact stays parseable at ANY future gate count.
    def qsAt(cutoff: Double) = {
      val heavy = results.filter(r => !r.ok || r.steady >= cutoff)
      val fast = results.filter(r => r.ok && r.steady < cutoff)
      val m = heavy.map { r =>
        "\"" + shortKey(r.name) + "\":" + (if (r.ok) fmtQ(r.steady) else "-1")
      }.mkString("{", ",", "}")
      val ft = fast.map(_.steady).sum
      val fm = if (fast.isEmpty) 0.0 else fast.map(_.steady).max
      (m, s""""n_fast":${fast.size},"fast_total":${fmt2(ft)},"fast_max":${fmtQ(fm)},"map_cutoff":${fmtQ(cutoff)}""")
    }
    val (qs, fastSummary) = LazyList(0.3, 0.5, 0.8, 1.5, 3.0)
      .map(qsAt)
      .find { case (m, fs) => (m.length + fs.length) <= 1600 }
      .getOrElse(qsAt(1e9))
    def numMap(f: GateResult => Double, okOnly: Boolean = true) =
      results.map { r =>
        "\"" + r.name + "\":" + (if (!okOnly || r.ok) fmt(f(r)) else "-1")
      }.mkString("{", ",", "}")
    def seqMap(f: GateResult => Seq[Double]) =
      results.map { r =>
        "\"" + r.name + "\":" + f(r).map(fmt).mkString("[", ",", "]")
      }.mkString("{", ",", "}")
    val colds = numMap(_.cold)
    val steadies = numMap(_.steady)
    val iterTimes = seqMap(_.ran)
    // pre-/post-iteration loadavg samples (each aligned 1:1 with iter_times)
    // — every iteration self-documents whether it was bracketed-quiet
    val loads = seqMap(_.preLoads)
    val loadsPost = seqMap(_.postLoads)
    // instantaneous busy-fraction brackets (-2 = unsampled fast gate,
    // -1 = /proc/stat unavailable) — the self-load-immune evidence channel
    val busyPre = seqMap(_.preBusy)
    val busyPost = seqMap(_.postBusy)
    // across-iteration channels: exogenous CPU (host busy − this process,
    // required ≤ busyThresh for certification), this process's CPU seconds,
    // and host IO-pressure stall fraction (PSI `some`) per iteration
    val exoCpuM = seqMap(_.exoCpu)
    val procCpuM = seqMap(_.procCpu)
    val ioStallM = seqMap(_.ioStall)
    // calibration brackets (round-10): effective-speed ratio probe/RefMs
    // per iteration side (-2 = unsampled fast gate); plus the run-wide
    // minimum sampled ratio — if even the QUIETEST probe of the whole run
    // sits well above 1, the host baseline drifted vs commissioning
    // (slower VM generation), which reads differently from per-gate bursts
    val calPreM = seqMap(_.calPre)
    val calPostM = seqMap(_.calPost)
    val calSamples = results.flatMap(r => r.calPre ++ r.calPost).filter(_ >= 0)
    val calMinRatio = calSamples match {
      case s if s.isEmpty => -1.0; case s => s.min
    }
    // Run-level verdict (round-11, the q111/q502 closer): the per-bracket
    // trip catches bursts, but a run-WIDE moderate slowdown (every window
    // uniformly ~1.3× slow, each bracket under 1.25) certifies silently
    // while inflating every number. The sampled-probe MEDIAN over the
    // whole run sees exactly that class: when it exceeds
    // Calibration.RunDegradedRatio the artifact self-reports `run_degraded`
    // — "host was slower", not "code got slower". Validated by the
    // ThrashCheck moderate arm (synthetic ~30% whole-run slowdown flags
    // itself; quiet arm does not).
    val calMedianRatio = calSamples match {
      case s if s.isEmpty => -1.0; case s => s.sorted.apply(s.size / 2)
    }
    val runDegraded = calMedianRatio > Calibration.RunDegradedRatio
    // post-hygiene JVM state per gate (MB): driver-state-accumulation evidence
    def jvmMap(f: GateResult => Long) =
      results.map(r => "\"" + shortKey(r.name) + "\":" + f(r)).mkString("{", ",", "}")
    val jvmHeap = jvmMap(_.heapMb)
    val jvmMeta = jvmMap(_.metaMb)
    val jvmCode = jvmMap(_.codeMb)
    val failed = results.collect { case r if !r.ok => "\"" + shortKey(r.name) + "\"" }
      .mkString("[", ",", "]")
    // heavy queries with NO bracketed-quiet iteration (incl. backoff
    // retries) — their numbers are upper bounds, not steady-state
    val uncertified = results.collect { case r if r.ok && !r.certified => "\"" + shortKey(r.name) + "\"" }
      .mkString("[", ",", "]")
    // per-gate degradation stamps (round-12): gates whose window showed an
    // above-trip bracket uncorrected by a settled re-run, or whose final
    // steady is ≥1.5× the committed quiet reference — their numbers are
    // measurement-channel weak, not code regressions
    val gateDegradedShort = results.collect { case r if r.ok && r.gateDegraded => "\"" + shortKey(r.name) + "\"" }
      .mkString("[", ",", "]")
    val gateDegradedFull = results.collect { case r if r.ok && r.gateDegraded => "\"" + r.name + "\"" }
      .mkString("[", ",", "]")
    val quietRetryM = results.collect { case r if r.retrySteady >= 0 =>
      "\"" + r.name + "\":" + fmt(r.retrySteady) }.mkString("{", ",", "}")
    val total = results.collect { case r if r.ok => r.steady }.sum
    val coldTotal = results.collect { case r if r.ok => r.cold }.sum
    val excluded = harness.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val names = results.map { r =>
      "\"" + shortKey(r.name) + "\":\"" + r.name + "\""
    }.mkString("{", ",", "}")
    // Filtered (single-gate diagnosis) runs mark themselves in the artifact
    // and write to a DIFFERENT default path, so a diagnostic run can't
    // silently clobber the official full-run sidecar with a partial total
    // (round-8 advice).
    val filterField =
      if (only.isEmpty) ""
      else only.toSeq.sorted.map("\"" + _ + "\"").mkString(""","filter":[""", ",", "]")
    val detail =
      s"""{"metric":"total","value":${fmt2(total)},"unit":"sec","iters":$iters$filterField,"names":$names,"steady":$steadies,"cold_total":${fmt2(coldTotal)},"cold":$colds,"iter_times":$iterTimes,"loadavg_1m":$loads,"loadavg_post":$loadsPost,"busy_pre":$busyPre,"busy_post":$busyPost,"exo_cpu":$exoCpuM,"proc_cpu_sec":$procCpuM,"io_stall":$ioStallM,"cal_pre":$calPreM,"cal_post":$calPostM,"cal_ref_ms":${Calibration.RefMs},"cal_trip":${Calibration.TripRatio},"cal_min_ratio":${fmt(calMinRatio)},"cal_median_ratio":${fmt(calMedianRatio)},"run_degraded":$runDegraded,"gate_degraded":$gateDegradedFull,"quiet_retry":$quietRetryM,"quiet_ref_n":${quietRef.size},"jvm_heap_mb":$jvmHeap,"jvm_meta_mb":$jvmMeta,"jvm_code_mb":$jvmCode,"failed":$failed,"uncertified":$uncertified,"excluded_harness":$excluded,"sf":"$sfDir"}"""
    val defaultDetail =
      if (only.isEmpty) "BENCH_DETAIL.json" else "BENCH_DETAIL_FILTERED.json"
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL", defaultDetail)
    try {
      val w = new java.io.PrintWriter(detailPath, "UTF-8")
      try w.println(detail) finally w.close()
      System.err.println(s"[bench] detail sidecar -> $detailPath")
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] sidecar write failed ($e); detail follows on stderr")
    }
    System.err.println(detail)
    spark.stop()
    // FINAL stdout line: the compact driver contract — total + steady qNN map
    // + failures only. The harness-exclusion list (with full names) lives in
    // the sidecar's "excluded_harness"; keeping it off the contract line buys
    // ~100 bytes of headroom under the driver's ~2.2 KiB tail capture as the
    // gate surface grows (n_excluded keeps the exclusion COUNT visible).
    val line =
      s"""{"metric":"total","value":${fmt2(total)},"unit":"sec","iters":$iters$filterField,"queries":$qs,$fastSummary,"failed":$failed,"uncertified":$uncertified,"n_excluded":${harness.size},"cal_median_ratio":${fmt(calMedianRatio)},"run_degraded":$runDegraded,"gate_degraded":$gateDegradedShort,"sf":"$sfDir"}"""
    // Self-check: warn loudly (stderr) before the line outgrows the capture.
    if (line.length > 2000)
      System.err.println(s"[bench] WARNING contract line ${line.length} B — nearing the ~2.2 KiB driver tail capture")
    else
      System.err.println(s"[bench] contract line ${line.length} B")
    println(line)
  }
}
