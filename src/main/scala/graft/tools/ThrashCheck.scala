package graft.tools

import graft.Calibration

/** Validation rig for the calibration channel (round-10, the way the exo
  * channel was validated in round 9): synthesize the contamination class
  * the exo channel MISSES and show the probe catches it.
  *
  * Contention running in THIS process raises host-busy and process-CPU
  * identically, so exo = host − proc ≈ 0 — structurally invisible to the
  * round-9 certification channels. (It stands in for theft from outside
  * the guest — a co-tenant or the hypervisor — which the guest kernel
  * cannot attribute either.) Two arms:
  *
  *   - `nThreads ≤ cores`: pure memory-bandwidth thrash — the probe must
  *     track the slowdown of REAL multi-threaded work proportionally;
  *   - `nThreads > cores` (e.g. 64 on 32): scheduling-pressure theft —
  *     the guest effectively loses cores, reproducing the q111 signature
  *     (windows inflate, exo ≈ 0); the probe must trip decisively.
  *
  * Alongside the probe, a 32-thread reference workload (parallel sums —
  * the shape of real query work) is timed quiet and thrashed, so the
  * artifact shows probe inflation vs true work slowdown.
  *
  * Usage: runMain graft.tools.ThrashCheck [nThreads] [samples]
  */
object ThrashCheck {
  private def cpuJiffies(): (Long, Long) = {
    val src = scala.io.Source.fromFile("/proc/stat")
    val f = try src.getLines().next().trim.split("\\s+").drop(1).map(_.toLong)
            finally src.close()
    val g = f.take(8)
    val idle = g(3) + (if (g.length > 4) g(4) else 0L)
    (g.sum - idle, g.sum)
  }
  private def procCpuNanos(): Long =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case b: com.sun.management.OperatingSystemMXBean => b.getProcessCpuTime
      case _ => -1L
    }

  /** 32-thread fixed-work parallel sum — the reference "real work". */
  private def workloadMs(): Double = {
    val nT = 32
    val n = 4 * 1024 * 1024
    val arrays = Array.fill(nT)(Array.tabulate(n)(i => i.toLong))
    val t0 = System.nanoTime()
    val hole = new java.util.concurrent.atomic.AtomicLong()
    val ts = arrays.map { a =>
      val th = new Thread(() => {
        var pass = 0
        var s = 0L
        while (pass < 8) { var i = 0; while (i < n) { s += a(i); i += 1 }; pass += 1 }
        hole.addAndGet(s): Unit
      })
      th.start(); th
    }
    ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e6
  }

  /** Single-gate arm (round-12, validates the per-gate degradation
    * channel end-to-end): thrash the host for `thrashMs` while the REAL
    * Bench measures ONE real gate (single-gate filter → BENCH_DETAIL_
    * FILTERED.json), then read the artifact back and judge. A q100-class
    * loaded window must either CORRECT itself (the thrash ends before
    * the settle-retry, which then lands a clean bracket-quiet iteration)
    * or ship STAMPED `gate_degraded` — never silently certify a ≥1.5×
    * number. Pick thrashMs ≈ the gate's 3-iteration span to exercise the
    * correct-after-settle path; pick it larger than the whole run (incl.
    * the settle budget) to exercise the stamp path.
    *
    * Usage: runMain graft.tools.ThrashCheck gate <gateName> [thrashMs] [nThreads]
    */
  private def gateArm(gateName: String, thrashMs: Long, nThreads: Int): Unit = {
    @volatile var stop = false
    val hole = new java.util.concurrent.atomic.AtomicLong()
    val threads = (1 to nThreads).map { t =>
      val th = new Thread(() => {
        val n = 8 * 1024 * 1024
        val a = new Array[Long](n)
        var i = 0; while (i < n) { a(i) = i + t; i += 1 }
        val deadline = System.nanoTime() + thrashMs * 1000000L
        while (!stop && System.nanoTime() < deadline) {
          var s = 0L; var j = 0
          while (j < n) { s += a(j); j += 1 }
          hole.addAndGet(s): Unit
        }
      })
      th.setDaemon(true); th.start(); th
    }
    Thread.sleep(500) // saturate before the measurement starts
    try graft.Bench.main(Array(gateName))
    finally { stop = true; threads.foreach(_.join(2000)) }
    // judge from the artifact, exactly as the driver would
    val txt = {
      val src = scala.io.Source.fromFile("BENCH_DETAIL_FILTERED.json")
      try src.mkString finally src.close()
    }
    val stamped = """"gate_degraded":\[([^\]]*)\]""".r
      .findFirstMatchIn(txt).exists(_.group(1).contains(gateName))
    val steady = (""""steady":\{[^}]*"""" + java.util.regex.Pattern.quote(gateName) + """":([0-9.]+)""").r
      .findFirstMatchIn(txt).map(_.group(1).toDouble).getOrElse(-1.0)
    val ref = {
      val f = new java.io.File("bench_quiet_ref.json")
      if (!f.isFile) -1.0
      else {
        val s = scala.io.Source.fromFile(f)
        val t = try s.mkString finally s.close()
        ("\"" + java.util.regex.Pattern.quote(gateName) + """"\s*:\s*([0-9.]+)""").r
          .findFirstMatchIn(t).map(_.group(1).toDouble).getOrElse(-1.0)
      }
    }
    val corrected = ref > 0 && steady >= 0 && steady <= ref * 1.5
    println(f"[thrash-gate] $gateName steady $steady%.2f s (quiet ref $ref%.2f), stamped=$stamped, corrected=$corrected")
    val pass = stamped || corrected || ref <= 0
    println(s"[thrash-gate] ${if (pass) "PASS" else "FAIL"}: a loaded window must correct itself or ship stamped" +
      (if (ref <= 0) " (no quiet ref — verdict informational)" else ""))
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("gate")) {
      gateArm(args(1), args.lift(2).map(_.toLong).getOrElse(60000L),
        args.lift(3).map(_.toInt).getOrElse(64))
      return
    }
    val nThreads = args.lift(0).map(_.toInt).getOrElse(64)
    val samples = args.lift(1).map(_.toInt).getOrElse(10)
    Calibration.warm()
    workloadMs(): Unit // JIT warm

    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    def sample(tag: String): (Double, Double, Double) = {
      val chases = (1 to samples).map { _ => Thread.sleep(50); Calibration.probeMs() }
      val sums = (1 to samples).map { _ => Thread.sleep(50); Calibration.sumMs() }
      val work = (1 to 3).map { _ => workloadMs() }
      println(f"[thrash] $tag%-8s chase ${med(chases)}%7.1f ms (${chases.min}%.1f-${chases.max}%.1f)  " +
        f"sum ${med(sums)}%6.1f ms  work ${med(work)}%7.1f ms")
      (med(chases), med(sums), med(work))
    }

    val (qChase, _, qWork) = sample("quiet")

    // in-process thrasher: each thread sums its own 64 MiB array forever
    @volatile var stop = false
    val hole = new java.util.concurrent.atomic.AtomicLong()
    val threads = (1 to nThreads).map { t =>
      val th = new Thread(() => {
        val n = 8 * 1024 * 1024
        val a = new Array[Long](n)
        var i = 0; while (i < n) { a(i) = i + t; i += 1 }
        while (!stop) {
          var s = 0L; var j = 0
          while (j < n) { s += a(j); j += 1 }
          hole.addAndGet(s): Unit
        }
      })
      th.setDaemon(true); th.start(); th
    }
    Thread.sleep(500) // let the thrashers saturate

    // exo channel over the thrashed window, computed exactly as Bench does
    val ncores = Runtime.getRuntime.availableProcessors().toDouble
    val (hb0, ht0) = cpuJiffies(); val pc0 = procCpuNanos()
    val w0 = System.nanoTime()
    val (tChase, _, tWork) = sample("thrashed")
    val wallNs = System.nanoTime() - w0
    val (hb1, ht1) = cpuJiffies(); val pc1 = procCpuNanos()
    val hostFrac = (hb1 - hb0).toDouble / (ht1 - ht0)
    val pFrac = (pc1 - pc0).toDouble / (wallNs * ncores)
    val exo = math.max(0.0, hostFrac - pFrac)

    stop = true
    threads.foreach(_.join(2000))

    val probeInfl = tChase / qChase
    val workInfl = tWork / qWork
    val tRatio = tChase / Calibration.RefMs
    val qRatio = qChase / Calibration.RefMs
    println(f"[thrash] exo during thrash = $exo%.3f (cert gate 0.25; host $hostFrac%.3f proc $pFrac%.3f)")
    println(f"[thrash] probe inflation $probeInfl%.2f×  real-work inflation $workInfl%.2f×")
    println(f"[thrash] quiet ratio $qRatio%.2f  thrashed ratio $tRatio%.2f  trip ${Calibration.TripRatio}")
    // round-11 run-level verdict arm: the Bench artifact stamps
    // `run_degraded` when the run's sampled probe MEDIAN exceeds
    // RunDegradedRatio — a synthetic whole-run slowdown must classify as
    // degraded while the quiet window must not (validates the bar
    // placement, not just the per-bracket trip)
    println(f"[thrash] run verdict: quiet median $qRatio%.2f -> degraded=${qRatio > Calibration.RunDegradedRatio}; " +
      f"thrashed median $tRatio%.2f -> degraded=${tRatio > Calibration.RunDegradedRatio} (bar ${Calibration.RunDegradedRatio})")
    val exoBlind = exo <= 0.25
    val pass = qRatio <= Calibration.TripRatio && exoBlind &&
      (workInfl < 1.15 || probeInfl >= 1.0 + (workInfl - 1.0) * 0.5)
    println(s"[thrash] ${if (pass) "PASS" else "FAIL"}: exo channel " +
      s"${if (exoBlind) "would have certified" else "caught"} this window; probe tracks " +
      f"${(probeInfl - 1.0) / math.max(0.01, workInfl - 1.0) * 100}%.0f%% of real-work slowdown" +
      (if (tRatio > Calibration.TripRatio) "; window trips certification" else ""))
  }
}
