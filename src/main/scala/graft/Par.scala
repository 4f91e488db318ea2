package graft

/** Run INDEPENDENT Spark actions concurrently from a bounded, shared,
  * daemon thread pool — optimization guide §2.6 ("overlap independent
  * jobs"): Spark's scheduler happily runs several jobs at once inside one
  * application; actions are only sequential because driver code calls
  * them sequentially. The index-lifecycle operators (Dedup.writeIndex /
  * appendIndex / writeEmbIndex / appendEmbIndex / compactIndex) are each
  * 2-3 independent table writes whose stage tails otherwise leave most
  * executor slots idle; submitting them together lets the next write's
  * tasks back-fill slots freed by the current write's stragglers (FIFO
  * scheduling gives exactly this back-fill behaviour).
  *
  * Contract: thunks must be independent (no thunk may read what another
  * writes) and must NOT call [[Par.run]] themselves — a nested run on the
  * same fixed pool can deadlock waiting for its own slots. Every thunk is
  * always awaited (no job is left running against a half-finished
  * lifecycle step); the first failure rethrows after the drain. */
object Par {
  private lazy val pool = java.util.concurrent.Executors.newFixedThreadPool(
    3,
    new java.util.concurrent.ThreadFactory {
      private val n = new java.util.concurrent.atomic.AtomicInteger(0)
      def newThread(r: Runnable): Thread = {
        val t = new Thread(r, s"graft-par-${n.getAndIncrement()}")
        t.setDaemon(true)
        t
      }
    })

  def run(thunks: (() => Unit)*): Unit = {
    val futs = thunks.map { t =>
      pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = t()
      })
    }
    var firstErr: Throwable = null
    futs.foreach { f =>
      try f.get()
      catch {
        case e: java.util.concurrent.ExecutionException =>
          if (firstErr == null) firstErr = e.getCause
        case e: InterruptedException =>
          Thread.currentThread().interrupt()
          if (firstErr == null) firstErr = e
      }
    }
    if (firstErr != null) throw firstErr
  }
}
