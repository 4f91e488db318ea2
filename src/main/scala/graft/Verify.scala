package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Truncation-proof by construction (rounds 10 and 11 both shipped an empty
  * CORRECTNESS artifact because a driver-side kill mid-loop lost everything):
  *   - oracle_sql.json is written FIRST — it depends only on SparkEntry
  *     .oracleSql, not on execution, so even an immediate kill leaves the
  *     oracle map in place and every per-query dump that lands is checkable.
  *   - results.jsonl is appended (and flushed) one line per query as each
  *     dump completes: {"name","rows","wall_ms","ok"[,"err"]}. An external
  *     kill at any point leaves a consistent journal of exactly how far the
  *     run got, with per-query wall times the driver can calibrate its
  *     timeout cap against.
  *   - a final "[verify] N/N dumped" line + total-wall journal entry mark a
  *     complete run; their absence marks a truncated one.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional extra args: run only these queries (builder-side iteration;
    // the driver always calls with exactly two args → full run)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = LocalSession.build(cpus, "graft-verify")
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)

    val journal = new java.io.FileWriter(s"$outDir/results.jsonl", /*append=*/ false)
    def logLine(fields: String): Unit = {
      journal.write("{" + fields + "}\n"); journal.flush()
    }
    val queries = SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
    val t0 = System.nanoTime()
    var done = 0
    // Per-query cache hygiene (round-13, verdict Next #7 — the Bench
    // pre-gate sweep applied here): operators pin plans/checkpoints per
    // invocation and a 528-query session otherwise accumulates every
    // query's blocks in the block manager for the whole run (§5
    // memory-pressure debt). Dropping them between queries bounds
    // block-manager growth; an explicit unpersist releases blocks without
    // waiting on the ContextCleaner, and a periodic GC collects the freed
    // object graphs so late queries don't pay earlier queries' debt.
    var sinceGc = 0
    def hygiene(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      sinceGc += 1
      if (sinceGc >= 32) { sinceGc = 0; System.gc() }
    }
    queries.foreach { case (name, fn) =>
      hygiene()
      val tq = System.nanoTime()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // footer-served count over the single just-written file: cheap, and
        // gives the driver a rows-per-query record even if DuckDB never runs
        val rows = spark.read.parquet(s"$outDir/$name").count()
        val ms = (System.nanoTime() - tq) / 1000000
        done += 1
        logLine(s"${q("name")}: ${q(name)}, ${q("rows")}: $rows, ${q("wall_ms")}: $ms, ${q("ok")}: true")
      } catch { case e: Throwable =>
        val ms = (System.nanoTime() - tq) / 1000000
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        logLine(s"${q("name")}: ${q(name)}, ${q("wall_ms")}: $ms, ${q("ok")}: false, ${q("err")}: ${q(String.valueOf(e.getMessage).take(300))}")
      }
    }
    val totalMs = (System.nanoTime() - t0) / 1000000
    logLine(s"${q("name")}: ${q("__total__")}, ${q("queries")}: ${queries.size}, ${q("dumped")}: $done, ${q("wall_ms")}: $totalMs, ${q("ok")}: ${done == queries.size}")
    journal.close()
    println(s"[verify] $done/${queries.size} dumped in ${totalMs / 1000} s")
    spark.stop()
  }
}
