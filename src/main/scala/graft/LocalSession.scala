package graft

import org.apache.spark.sql.SparkSession

/** One place for the local-mode session knobs shared by Verify, Bench and
  * the timing tools (MicroBench, Probe), so correctness runs and every
  * measurement use the same configuration. */
object LocalSession {
  def build(cpus: String, appName: String = "graft"): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // storage-partitioned joins over key-grouped DSv2 scans (the
      // bucketed GeoJSONL lake, q448): recognized co-partitioning is a
      // strict plan improvement, so both knobs are engine defaults —
      // requireAllClusterKeys=false lets a join whose keys are a SUPERSET
      // of the partition keys still zip in place
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(s)
    s
  }
}
