package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line on stdout. Per-query progress
  * goes to stderr so stragglers are visible without polluting the contract
  * output. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = LocalSession.build(cpus, "graft-bench")
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
    // The cold first-run time is still emitted per query ("cold").
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "2").toInt.max(1)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = new Array[Double](iters)
      var ok = true
      var i = 0
      while (i < iters && ok) {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: $e"); ok = false
        }
        times(i) = (System.nanoTime() - t0) / 1e9
        i += 1
      }
      val cold = times(0)
      val steady = times.take(math.max(1, i)).min
      System.err.println(
        f"[bench] $name%-24s cold $cold%8.2f s  steady $steady%8.2f s" +
          (if (ok) "" else "  FAILED"))
      (name, cold, steady, ok)
    }
    // failed queries report -1 and are EXCLUDED from the total (a broken
    // query must not read as a fast one), and named in "failed".
    val qs = results.map { case (k, _, v, ok) => "\"" + k + "\":" + (if (ok) v else -1) }
      .mkString("{", ",", "}")
    val colds = results.map { case (k, c, _, ok) => "\"" + k + "\":" + (if (ok) c else -1) }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, _, v, true) => v }.sum
    val coldTotal = results.collect { case (_, c, _, true) => c }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","iters":$iters,"queries":$qs,"cold_total":$coldTotal,"cold":$colds,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
