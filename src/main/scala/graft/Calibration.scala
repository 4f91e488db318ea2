package graft

/** Effective-machine-speed calibration probe — the round-10 certification
  * channel for the contamination class every jiffies-based channel is
  * blind to by construction.
  *
  * The r8/r9 q111/q100 signature: wall time 5× the quiet steady state,
  * process-CPU accounting clean, loadavg quiet, exogenous CPU (host busy −
  * our process) ≈ 0, no guest-visible steal. That is theft from OUTSIDE
  * the guest — a co-tenant stealing memory bandwidth / SMT slots / turbo
  * headroom, or the hypervisor descheduling vCPUs without reporting steal:
  * the guest kernel hands us the same jiffies, but each jiffy does less
  * work. No /proc counter can see it — only a SPEED measurement can.
  *
  * The probe (`probeMs`): a single-threaded pointer-chase over a 32 MiB
  * random cycle — every load depends on the previous one, so the loop
  * measures DRAM LATENCY plus scheduling/frequency effects. The 32 MiB
  * working set assumes the LLC is comfortably smaller; on a host whose
  * LLC approaches 32 MiB the chase turns cache-resident and loses the
  * DRAM-bandwidth-theft arm (RefMs=92 ms on the commissioning rig shows
  * the walk does miss to DRAM there — ~176 ns/load). If RefMs is ever
  * recommissioned on new hardware (ThrashCheck quiet arm), re-check that
  * the quiet probe cost implies DRAM-latency-class loads, and double `M`
  * if it does not. Latency
  * degrades superlinearly as contention pushes the memory controller
  * toward saturation (queuing), and any descheduling of the probe thread
  * inflates the wall directly; a register-only spinner would be blind to
  * the bandwidth arm, which is exactly the synthetic contention
  * ThrashCheck validates against. Fixed work ⇒ elapsed time IS effective
  * machine speed. `sumMs` (sequential 64 MiB sums, bandwidth-bound) ships
  * as a diagnostic second opinion.
  *
  * [[RefMs]] is the committed quiet-host probe cost (commissioning
  * measurement on this rig via ThrashCheck's quiet arm; PLANS.md round
  * 10). A fixed anchor that never moves within or across runs: an
  * iteration whose bracketing probes run > [[TripRatio]] × RefMs was
  * measured on a machine effectively slower than the one the bars were
  * commissioned on, whatever the CPU accounting says. Bench additionally
  * ships the run's minimum sampled ratio, so a HOST-level baseline drift
  * (new VM generation) is distinguishable in the artifact from per-gate
  * bursts.
  */
object Calibration {
  // ---- pointer-chase (certification probe) ----
  /** 8 Mi ints = a 32 MiB working set — larger than the commissioning
    * rig's LLC, so steps miss to DRAM (see object doc's LLC caveat). */
  private val M = 8 * 1024 * 1024
  private val ChaseSteps = 1 << 19
  private lazy val nxt: Array[Int] = {
    val a = new Array[Int](M)
    var i = 0
    while (i < M) { a(i) = i; i += 1 }
    // Sattolo's algorithm with a deterministic LCG → one full cycle
    var seed = 0x5DEECE66DL
    var k = M - 1
    while (k > 0) {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      val j = (((seed >>> 33) % k).toInt + k) % k // j in [0, k)
      val t = a(k); a(k) = a(j); a(j) = t
      k -= 1
    }
    a
  }

  /** Blackhole so the JIT cannot elide the loops. */
  @volatile var sink: Long = 0L

  /** Committed quiet-host probe cost (ms) — see object doc. */
  val RefMs: Double = 92.0
  /** Effective-speed ratio above which a window is contaminated (the
    * verdict's ~1.2 bar plus measured quiet spread headroom). */
  val TripRatio: Double = 1.25

  /** RUN-level verdict bar (round-11): the per-bracket [[TripRatio]]
    * catches bursts, but a UNIFORMLY ~1.3×-slow driver window sits under
    * every per-iteration trip while inflating all 32-thread work (the
    * r10 q111/q502 residual: suite probe median 1.125 vs 1.05 on a quiet
    * run of the same code). When the run's sampled probe MEDIAN exceeds
    * this, Bench stamps the artifact `run_degraded` so a reader can
    * separate "code got slower" from "host was slower" without a quiet
    * re-run. Bar placement: quiet-run medians sit ≈1.0–1.05 once the
    * post-iteration probe settles (min-of-2, [[settledRatio]]); the
    * degraded windows observed are ≥1.12. */
  val RunDegradedRatio: Double = 1.10

  /** Min of two probes separated by a short settle — the certification
    * sample shape. A single probe taken immediately after a measured
    * 32-thread iteration can catch the gate's OWN trailing activity (GC
    * of the just-finished heap, async executor cleanup) and false-trip
    * the channel (only conservative, but it burns the global sleep
    * budget on spurious retries). Genuine external theft spans both
    * samples, so the min still trips. */
  def settledRatio(): Double = {
    val r1 = ratio()
    Thread.sleep(60)
    math.min(r1, ratio())
  }

  /** Time [[ChaseSteps]] dependent loads on the calling thread (ms). */
  def probeMs(): Double = {
    val a = nxt
    val t0 = System.nanoTime()
    var p = 0
    var i = 0
    while (p < ChaseSteps) { i = a(i); p += 1 }
    sink = i.toLong
    (System.nanoTime() - t0) / 1e6
  }

  /** probeMs / RefMs — ≤ ~1 on the commissioning host when quiet. */
  def ratio(): Double = probeMs() / RefMs

  // ---- sequential-sum diagnostic (bandwidth-bound second opinion) ----
  private val N = 8 * 1024 * 1024
  private val SumPasses = 6
  private lazy val buf: Array[Long] = {
    val a = new Array[Long](N)
    var i = 0
    while (i < N) { a(i) = i * 0x9E3779B97F4A7C15L; i += 1 }
    a
  }

  /** Time [[SumPasses]] sequential 64 MiB sums (ms). */
  def sumMs(): Double = {
    val t0 = System.nanoTime()
    var p = 0
    var s = 0L
    while (p < SumPasses) {
      val a = buf
      var i = 0
      while (i < N) { s += a(i); i += 1 }
      p += 1
    }
    sink = s
    (System.nanoTime() - t0) / 1e6
  }

  /** JIT-compile the loops and fault the buffers in before first use. */
  def warm(): Unit = { probeMs(); probeMs(); sumMs(); sumMs(); () }
}
