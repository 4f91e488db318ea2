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
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: $e"); false
      }
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-24s $sec%8.2f s" + (if (ok) "" else "  FAILED"))
      (name, sec, ok)
    }
    // failed queries report -1 and are EXCLUDED from the total (a broken
    // query must not read as a fast one), and named in "failed".
    val qs = results.map { case (k, v, ok) => "\"" + k + "\":" + (if (ok) v else -1) }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
