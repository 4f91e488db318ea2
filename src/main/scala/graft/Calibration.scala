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
  * The probe (`probeMs`): a single-threaded pointer-chase over a 64 MiB
  * random cycle — every load depends on the previous one, so the loop
  * measures DRAM LATENCY plus scheduling/frequency effects. Latency
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
  /** 8 Mi ints = 32 MiB of indices over a 64 MiB working set walk —
    * far larger than any plausible LLC, so steps miss to DRAM. */
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
