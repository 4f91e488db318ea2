package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection harness: `runMain graft.Explain <sfDir> [query...]`
  * prints the formatted physical plan per query — the iterate-until-the-
  * plan-is-right loop (pushed filters, broadcast choices, codegen spans). */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = LocalSession.build("4", "graft-explain")
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      try SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
