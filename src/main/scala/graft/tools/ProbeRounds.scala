package graft.tools

import org.apache.spark.sql.functions._
import graft.Tables

/** Round-13 attribution probe: where does a single PageRank-style round
  * spend CPU at sf0.1 — the cached-pin scan, the join, the aggregate, or
  * the key representation (string "c123"/"s45" node ids vs packed longs)?
  * Times, per key type: a warm count over the pinned edge table, one
  * join+agg round (per-node decimal contribution), and the decimal sum
  * alone. Decides whether narrowing the iterative graph family's node
  * keys (guide §2.3 "narrower types") is worth restructuring queries. */
object ProbeRounds {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.LocalSession.build("32", "graft-probe-rounds")
    import org.apache.spark.storage.StorageLevel
    val iters = args.lift(0).map(_.toInt).getOrElse(3)
    for (i <- 1 to iters; keys <- Seq("str", "lng")) {
      println(s"---- iteration $i keys=$keys ----")
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
      val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_suppkey")
      val o = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
      val pairs0 = li.join(o, li("l_orderkey") === o("o_orderkey"))
      val pairs =
        if (keys == "str")
          pairs0.select(concat(lit("c"), col("o_custkey")).as("src"),
            concat(lit("s"), col("l_suppkey")).as("dst")).distinct()
        else
          pairs0.select((col("o_custkey").cast("long") * 2L).as("src"),
            (col("l_suppkey").cast("long") * 2L + 1L).as("dst")).distinct()
      val edges = pairs.select(explode(array(
          struct(col("src"), col("dst")),
          struct(col("dst").as("src"), col("src").as("dst")))).as("__e"))
        .select(col("__e.src").as("src"), col("__e.dst").as("dst"))
      val e = edges.repartition(col("src")).sortWithinPartitions(col("src"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      Probe.time(s"$keys pin build (count)")(e.count())
      Probe.time(s"$keys warm cache count")(e.count())
      Probe.time(s"$keys warm cache count 2")(e.count())
      val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      Probe.time(s"$keys deg pin")(deg.count())
      val nodes = e.select(col("src").as("node")).distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      val nn = Probe.time(s"$keys nodes pin")(nodes.count())
      val ranks = nodes.select(col("node"), (lit(1.0d) / nn).as("r"))
        .localCheckpoint()
      Probe.time(s"$keys ranks checkpoint materialize")(ranks.count())
      // one PageRank-style round, per-node contribution shape
      def round1() = {
        val ctbl = deg.join(ranks, deg("src") === ranks("node"))
          .select(col("src"),
            round(col("r") / col("deg"), 12).cast("decimal(38,12)").as("c"))
        e.join(ctbl, "src")
          .select(col("dst").as("node"), col("c"))
          .groupBy(col("node"))
          .agg(sum(col("c")).cast("double").as("inflow"))
      }
      Probe.time(s"$keys one round (join+agg)")(round1().count())
      Probe.time(s"$keys one round again")(round1().count())
      // per-edge decimal agg WITHOUT the join: isolates the agg share
      val cconst = lit(java.math.BigDecimal.valueOf(0.000001d))
        .cast("decimal(38,12)")
      Probe.time(s"$keys agg only (no join)")(
        e.select(col("dst").as("node"), cconst.as("c"))
          .groupBy(col("node"))
          .agg(sum(col("c")).cast("double").as("inflow")).count())
      // join only, no agg beyond count
      Probe.time(s"$keys join only")(
        e.join(broadcast(ranks.withColumnRenamed("node", "src")), "src")
          .count())
      e.unpersist(blocking = false)
      deg.unpersist(blocking = false)
      nodes.unpersist(blocking = false)
    }
    spark.stop()
  }
}
