package graft.tools

import org.apache.spark.sql.functions._
import graft.Tables

/** Round-13 stage probe for q111's per-invocation cost under the
  * self-contained regime (verdict Next #1): with the operator pins
  * released at exit, every bench iteration pays edge build + pins +
  * rounds — this splits that cost so the optimization targets the
  * measured stage, not a hypothesis. Mirrors SparkEntry q111 + the
  * Graph.pageRank body exactly. */
object Probe111 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.LocalSession.build("32", "graft-probe111")
    val iters = args.lift(0).map(_.toInt).getOrElse(3)
    import org.apache.spark.storage.StorageLevel
    for (i <- 1 to iters) {
      println(s"---- iteration $i ----")
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
      val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_suppkey")
      val o = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
      val pairs = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst")).distinct()
      val edges = pairs.select(explode(array(
          struct(col("src"), col("dst")),
          struct(col("dst").as("src"), col("src").as("dst")))).as("__e"))
        .select(col("__e.src").as("src"), col("__e.dst").as("dst"))
      // ---- pageRank body, stage-timed; shape arg: "new" = pre-joined
      // ed table (1 join/round), "old" = separate deg pin (2 joins/round),
      // "pn" = per-node contribution table (round()/decimal cast runs |V|
      // times per round, unsorted edge pin), "pns" = pn + edge pin cached
      // sorted within partitions (per-round SMJ skips the edge-side sort)
      val shape = args.lift(1).getOrElse("new")
      val base0 = edges.select(col("src"), col("dst")).repartition(col("src"))
      val base =
        if (shape == "pns") base0.sortWithinPartitions(col("src")) else base0
      val e = base.persist(StorageLevel.MEMORY_AND_DISK)
      // "noe": build ed WITHOUT pinning e — the two base references (join
      // probe + deg build) share one repartition exchange via
      // ReuseExchange, so the edge build still executes once and the
      // separate e cache write/read is skipped
      val perNode = shape == "pn" || shape == "pns"
      val edSrc = if (shape == "noe") base else e.toDF()
      val deg0 = edSrc.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      val ed = edSrc.join(deg0, "src").persist(StorageLevel.MEMORY_AND_DISK)
      val deg = deg0.persist(StorageLevel.MEMORY_AND_DISK)
      val nodes0 =
        if (shape == "noe")
          ed.select(explode(array(col("src"), col("dst"))).as("node")).distinct()
        else e.select(col("src").as("node"))
          .union(e.select(col("dst").as("node"))).distinct()
      val nodes = nodes0.persist(StorageLevel.MEMORY_AND_DISK)
      val ne =
        if (shape == "noe") Probe.time("ed pin (ReuseExchange, no e pin)")(ed.count())
        else Probe.time("edge pin materialize (e.count)")(e.count())
      if (shape == "new") Probe.time("ed pin (e ⋈ deg from cache)")(ed.count())
      else if (shape == "old" || perNode) Probe.time("deg pin")(deg.count())
      val nn = Probe.time("nodes pin (distinct from cache)")(nodes.count())
      println(s"        edges = $ne  nodes = $nn  shape = $shape")
      val nc = broadcast(nodes.agg(count(lit(1)).cast("double").as("n_nodes")))
      var ranks = nodes.crossJoin(nc)
        .select(col("node"), (lit(1.0d) / col("n_nodes")).as("r"))
      for (k <- 1 to 5) {
        val joined =
          if (shape == "old")
            e.join(ranks, e("src") === ranks("node")).join(deg, "src")
          else ed.join(ranks, ed("src") === ranks("node"))
        val inflow = if (perNode) {
          val ctbl = deg.join(ranks, deg("src") === ranks("node"))
            .select(col("src"),
              round(col("r") / col("deg"), 12).cast("decimal(38,12)").as("c"))
          e.join(ctbl, "src")
            .select(col("dst").as("node"), col("c"))
            .groupBy(col("node"))
            .agg(sum(col("c")).cast("double").as("inflow"))
        } else shape match {
          case "lng" =>
            // exact long fixed-point: the 12-dp rounded contribution as
            // micros-of-a-unit; sum(long) is codegen'd long addition
            joined.select(col("dst").as("node"),
                (round(col("r") / col("deg"), 12).cast("decimal(18,12)")
                  * lit(1000000000000L)).cast("long").as("c"))
              .groupBy(col("node"))
              .agg((sum(col("c")).cast("decimal(38,12)") /
                lit(1000000000000L)).cast("double").as("inflow"))
          case "d18" =>
            joined.select(col("dst").as("node"),
                round(col("r") / col("deg"), 12).cast("decimal(18,12)").as("c"))
              .groupBy(col("node"))
              .agg(sum(col("c")).cast("double").as("inflow"))
          case _ =>
            joined.select(col("dst").as("node"),
                round(col("r") / col("deg"), 12).cast("decimal(38,12)").as("c"))
              .groupBy(col("node"))
              .agg(sum(col("c")).cast("double").as("inflow"))
        }
        ranks = nodes.crossJoin(nc)
          .join(inflow, Seq("node"), "left")
          .select(col("node"),
            round(lit(1.0d - 0.85) / col("n_nodes")
              + lit(0.85) * coalesce(col("inflow"), lit(0.0d)), 12).as("r"))
        if (k % 2 == 0 && k < 5)
          ranks = Probe.time(s"round $k checkpoint")(ranks.localCheckpoint())
      }
      val out = Probe.time("final rounds + out checkpoint")(ranks.localCheckpoint())
      // exact cross-shape equality witness: Σ r as an exact decimal
      println("        checksum " + out
        .agg(sum(col("r").cast("decimal(20,12)"))).head().get(0))
      e.unpersist(blocking = false)
      ed.unpersist(blocking = false)
      deg.unpersist(blocking = false)
      nodes.unpersist(blocking = false)
    }
    spark.stop()
  }
}
