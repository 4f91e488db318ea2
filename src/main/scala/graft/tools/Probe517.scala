package graft.tools

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Dedup

/** Round-13 stage probe for the q517/q522 index-lifecycle gates (verdict
  * Next #2): splits each gate's wall into build (writeIndex), session +
  * reload (newSession/readIndex), probe (dedupAgainstIndex + pin), append
  * (appendIndex), policy (rebuildDue) and the final union action — so the
  * "~1.5-2 s of multi-session catalog round-trips" hypothesis is
  * attributed by measurement before anything is changed. Mirrors
  * SparkEntry q517 exactly (same filters, same chunking). */
object Probe517 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.LocalSession.build("32", "graft-probe517")
    val iters = args.lift(0).map(_.toInt).getOrElse(2)
    for (i <- 1 to iters) {
      println(s"---- iteration $i ----")
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
      val docs = Tables.documents(spark, sfDir)
      if (args.lift(1).contains("build")) {
        // writeIndex body replicated stage-by-stage (same ops, same order)
        val corpus = docs.filter(col("doc_id") % 3 =!= 0)
        val fp = corpus.select(
          graft.operators.TextOps.fingerprint(col("text")).as("__fp"))
        val sets = corpus.select(col("doc_id"),
          graft.operators.TextOps.distinctShingles(
            graft.operators.TextOps.tokens(col("text")), 3).as("__sh"))
        Probe.time("  build: Par(sets write, fp write)") {
          graft.Par.run(
            () => graft.sources.Sources.writeBucketed(
              sets, "graft_q517p_sets", 32, Seq("doc_id")),
            () => graft.sources.Sources.writeBucketed(
              fp, "graft_q517p_fp", 32, Seq("__fp")))
        }
        Probe.time("  build: refreshTable(sets)") {
          spark.catalog.refreshTable("graft_q517p_sets")
        }
        Probe.time("  build: bands derive+write") {
          val sh = spark.table("graft_q517p_sets")
            .select(col("doc_id"), explode(col("__sh")).as("shingle"))
          val h = sh.withColumn("h",
            graft.operators.TextOps.tokenHash(col("shingle")) % Dedup.P)
          val mins = (0 until Dedup.NumHashes).map(i =>
            min((col("h") * (i * 2 + 3) + (i * 5 + 7)) % Dedup.P).as(s"s_$i"))
          val sig = h.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
            .select(col("doc_id"),
              array((0 until Dedup.NumHashes).map(i => col(s"s_$i")): _*).as("sig"))
          val b = sig.select(col("doc_id"),
            posexplode(Dedup.bandHashes(col("sig"))).as(Seq("band_id", "band_hash")))
          graft.sources.Sources.writeBucketed(
            b, "graft_q517p_bands", 32, Seq("band_id", "band_hash"))
        }
        Probe.time("  build: meta write") {
          graft.sources.Sources.dropTableAndLocation(spark, "graft_q517p_meta")
          spark.table("graft_q517p_fp").groupBy().count()
            .select(col("count").as("build_rows"))
            .write.mode("overwrite").format("parquet")
            .saveAsTable("graft_q517p_meta")
        }
      } else
      Probe.time("writeIndex (build, 2/3 corpus)") {
        Dedup.writeIndex(docs.filter(col("doc_id") % 3 =!= 0), "doc_id",
          "text", prefix = "graft_q517p")
      }
      val s2 = Probe.time("newSession #2")(spark.newSession())
      val idx2 = Probe.time("readIndex #2")(Dedup.readIndex(s2, "graft_q517p"))
      val arr2 = Tables.documents(s2, sfDir).filter(col("doc_id") % 3 === 0)
      val s1v = Probe.time("dedup chunk A (pin materialize)") {
        val v = Dedup.dedupAgainstIndex(idx2,
            arr2.filter(col("doc_id") % 2 === 0), "doc_id", "text")
          .localCheckpoint(eager = false)
        v.count()
        v
      }
      Probe.time("appendIndex (chunk A survivors)") {
        Dedup.appendIndex(s1v, "doc_id", "text", prefix = "graft_q517p")
      }
      val s3 = Probe.time("newSession #3")(s2.newSession())
      val idx3 = Probe.time("readIndex #3")(Dedup.readIndex(s3, "graft_q517p"))
      val arr3 = Tables.documents(s3, sfDir).filter(col("doc_id") % 3 === 0)
      val s2v = Probe.time("dedup chunk B (count)") {
        val v = Dedup.dedupAgainstIndex(idx3,
          arr3.filter(col("doc_id") % 2 =!= 0), "doc_id", "text")
        v.count()
        v
      }
      Probe.time("rebuildDue check") {
        require(!Dedup.rebuildDue(s3, "graft_q517p"), "policy must not fire")
      }
      Probe.time("final union count") {
        s1v.unionByName(s2v).select("doc_id", "lang").count(): Unit
      }
    }
    spark.stop()
  }
}
