package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Isolated A/B of materialization strategies for a vector table —
  * round-10 diagnosis of the q511 sf1 finding (localCheckpoint 816 CPU-s
  * vs MEMORY_ONLY persist 59 CPU-s for the same 600k×64d vectors).
  * Synthetic rows, no fixture kernel, so the measured delta is PURELY the
  * pin machinery. Usage: runMain graft.tools.PinProbe [rows] */
object PinProbe {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(600000L)
    val spark = graft.LocalSession.build("32", "graft-pinprobe")
    def plan = spark.range(n).repartition(32)
      .select(col("id"), transform(sequence(lit(0), lit(63)),
        i => (col("id") + i).cast("double") / 1000.0).as("vec"))
    Probe.time("baseline count (no pin)")(plan.count())
    Probe.time("forced agg (no pin)")(
      plan.agg(sum(element_at(col("vec"), 1))).collect())
    val lc = plan.localCheckpoint(eager = false)
    Probe.time("localCheckpoint(lazy) + count")(lc.count())
    Probe.time("localCheckpoint re-read")(lc.count())
    val lce = Probe.time("localCheckpoint(eager)")(plan.localCheckpoint(eager = true))
    Probe.time("localCheckpoint(eager) re-read")(lce.count())
    val pm = plan.persist(StorageLevel.MEMORY_ONLY)
    Probe.time("persist(MEMORY_ONLY) + count")(pm.count())
    Probe.time("persist re-read")(pm.count())
    pm.unpersist()
    val pd = plan.persist(StorageLevel.MEMORY_AND_DISK)
    Probe.time("persist(MEMORY_AND_DISK) + count")(pd.count())
    pd.unpersist()
    spark.stop()
  }
}
