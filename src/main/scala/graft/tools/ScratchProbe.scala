package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 fixture-geometry probe (not part of the library surface):
  * measures the planted-paraphrase text fixture's cosine margins and LSH
  * recall BEFORE the q509 gate ships, so the band parameters are chosen
  * from data, not hope (the q501 splitmix64-decorrelation lesson).
  *
  * Usage: runMain graft.tools.ScratchProbe <sfDir> [probe]
  */
object ScratchProbe {

  /** Does readStream.format("binaryFile") work as a file stream source? */
  def binStreamProbe(): Unit = {
    import org.apache.spark.sql.types._
    val spark = graft.LocalSession.build("4", "graft-binstream")
    val dir = java.nio.file.Files.createTempDirectory("graft_binstream").toString
    (1 to 5).foreach { i =>
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, s"f$i.bin"),
        Array.fill[Byte](10 + i)(i.toByte))
    }
    val schema = StructType(Seq(
      StructField("path", StringType), StructField("modificationTime", TimestampType),
      StructField("length", LongType), StructField("content", BinaryType)))
    try {
      val st = spark.readStream.format("binaryFile").schema(schema)
        .option("maxFilesPerTrigger", "2").load(dir)
      val q = st.select(col("path"), col("length"))
        .writeStream.format("memory").queryName("binprobe").outputMode("append").start()
      q.processAllAvailable(); q.stop()
      println(s"[probe] binaryFile streaming rows = ${spark.table("binprobe").count()}")
    } catch { case e: Throwable => println(s"[probe] binaryFile streaming FAILED: $e") }
    spark.stop()
  }

  /** The q509 candidate fixture: 120 md5-derived words per doc; the four
    * members of a group (custkey div 4) each swap ONE word at a distinct
    * interior position — a planted paraphrase family. */
  def paraphraseText(grp: Column, mem: Column, nWords: Int = 120): Column = {
    val variantPos = Map(10 -> 0, 35 -> 1, 60 -> 2, 85 -> 3)
    val words = (0 until nWords).map { i =>
      val base = concat(lit("w"),
        substring(md5(concat(grp.cast("string"), lit("_" + i))), 1, 8))
      variantPos.get(i) match {
        case Some(m) =>
          when(mem === m, concat(lit("v"),
            substring(md5(concat(grp.cast("string"), lit("_sw_" + m))), 1, 8)))
            .otherwise(base)
        case None => base
      }
    }
    concat_ws(" ", words: _*)
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("binstream")) { binStreamProbe(); return }
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.LocalSession.build("32", "graft-scratch")
    import spark.implicits._
    val dim = 512
    val docs = graft.Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("doc_id"),
        paraphraseText(expr("c_custkey div 4"), expr("c_custkey % 4")).as("text"))
    val feats = docs.select(col("doc_id"),
      graft.operators.TextOps.hashedNgramVector(
        graft.operators.TextOps.tokens(col("text")), dim, 2).as("vec"))
      .localCheckpoint()

    def cosStats(tag: String, pairs: DataFrame): Unit = {
      val withCos = pairs
        .join(feats.select(col("doc_id").as("doc_a"), col("vec").as("va")), "doc_a")
        .join(feats.select(col("doc_id").as("doc_b"), col("vec").as("vb")), "doc_b")
        .select(graft.operators.Similarity.cosineU(col("va"), col("vb"), dim).as("cos"))
      val r = withCos.agg(min("cos"), max("cos"), avg("cos"), count(lit(1))).collect()(0)
      println(s"[probe] $tag cos: min=${r.get(0)} max=${r.get(1)} avg=${r.get(2)} n=${r.get(3)}")
    }

    val ids = feats.select("doc_id")
    val within = ids.as("a").join(ids.as("b"),
        expr("a.doc_id div 4 = b.doc_id div 4 and a.doc_id < b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    cosStats("within-group", within)
    // cross-group sample: doc i vs doc i+4 .. i+12 (different groups)
    val cross = ids.as("a").join(ids.as("b"),
        expr("b.doc_id - a.doc_id between 4 and 12 and a.doc_id div 4 <> b.doc_id div 4"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    cosStats("cross-sample", cross)

    // stage decomposition: where do the seconds go?
    def time(tag: String)(f: => Long): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[probe] stage $tag#$i: ${(System.nanoTime() - t0) / 1e9}%.2f s (n=$n)")
      }
    }
    time("docs-text")(docs.count())
    val rawFeats = graft.Tables.spread(spark, docs).select(col("doc_id"),
      graft.operators.TextOps.hashedNgramVector(
        graft.operators.TextOps.tokens(col("text")), dim, 2).as("vec"))
      .localCheckpoint(eager = false)
    time("vectorize")(rawFeats.count())
    val banded0 = rawFeats.select(col("doc_id"),
      posexplode(graft.operators.Similarity.bandBuckets(
        graft.operators.Similarity.asDouble(col("vec")), dim, 48, 12))
        .as(Seq("band_id", "bucket")))
      .localCheckpoint(eager = false)
    time("bands")(banded0.count())
    val cand0 = banded0.as("a").join(banded0.as("b"),
        col("a.band_id") === col("b.band_id") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    time("cand-raw")(cand0.count())
    time("cand-distinct")(cand0.distinct().count())
    // geometry sweep: extra args of the form nb:rpb (e.g. "48:12 96:16")
    // measure the candidate volume + recall + wall time per band shape —
    // the scale-curve evidence that widening bands with log2(N) restores
    // near-linear candidate growth
    val shapes = args.drop(1).map { a =>
      val Array(nb, rpb) = a.split(":"); (nb.toInt, rpb.toInt)
    } match { case e if e.isEmpty => Seq((48, 12)); case s => s.toSeq }
    shapes.foreach { case (nb, rpb) =>
      val bandedG = rawFeats.select(col("doc_id"),
        posexplode(graft.operators.Similarity.bandBuckets(
          graft.operators.Similarity.asDouble(col("vec")), dim, nb, rpb))
          .as(Seq("band_id", "bucket")))
      val candG = bandedG.groupBy(col("band_id"), col("bucket"))
        .agg(count(lit(1)).as("c")).filter(col("c") > 1)
        .agg(sum(col("c") * (col("c") - 1) / 2)).collect()(0)
      println(s"[probe] bands=$nb rows=$rpb candidate pairs (incl. dups) = ${candG.get(0)}")
    }
    shapes.foreach { case (nb, rpb) =>
      val t0 = System.nanoTime()
      val got = graft.operators.Dedup.embeddingNearDups(
          feats, "doc_id", "vec", dim = dim, threshold = 0.8,
          nBands = nb, rowsPerBand = rpb)
        .select(col("doc_a"), col("doc_b"))
      val missing = within.exceptAll(got).count()
      val extra = got.exceptAll(within).count()
      val nPlanted = within.count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[probe] bands=$nb rows=$rpb: planted=$nPlanted missing=$missing extra=$extra  (${dt}%.1f s)")
    }
    spark.stop()
  }
}
