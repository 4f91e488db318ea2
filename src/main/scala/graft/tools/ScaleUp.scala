package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 fixture generator for the scale-curve measurement (round-9 verdict
  * item 3): 10× the bench scale with the SAME internal structure, so the
  * heavy gates' sf1∕sf0.1 runtime ratio measures their scaling exponent.
  *
  * Construction: `factor` key-offset copies of every sf0.1 table —
  * referential integrity preserved WITHIN a copy (orders.o_custkey and
  * lineitem.l_suppkey shift together), copies mutually disjoint, copy 0
  * verbatim. Content columns that drive similarity operators are
  * decorrelated ACROSS copies while preserving within-copy geometry
  * exactly:
  *
  *   - documents.text: copy i suffixes every word with `_i` — a bijective
  *     word remap, so two docs share a shingle in copy i iff their copy-0
  *     originals did (within-copy dedup structure identical), while
  *     cross-copy shingle sets are disjoint (naive row replication would
  *     instead plant 10-way EXACT duplicates and inflate every candidate
  *     set quadratically — an artifact, not scale).
  *   - embeddings.embedding: copy i circularly shifts components by i — a
  *     coordinate permutation (rotation), so within-copy cosines are
  *     EXACTLY preserved and cross-copy vectors decorrelate.
  *
  * Usage: runMain graft.tools.ScaleUp [srcDir] [outDir] [factor] [tables]
  * — `tables` (optional, comma-separated) restricts generation to a
  * subset, for decade-scale fixtures of a single table family (round-10:
  * customer ×33 / documents ×100 for the q509/q515 decade curve; a full
  * ×100 lineitem would cost minutes of write for tables those gates
  * never read).
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft_testdata/sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val wanted: Set[String] = args.lift(3)
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty)
    val spark = graft.LocalSession.build("32", "graft-scaleup")

    def load(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def save(t: String, df: DataFrame, parts: Int): Unit = {
      if (wanted.nonEmpty && !wanted(t)) return
      df.repartition(parts).write.mode("overwrite").parquet(s"$out/$t.parquet")
      System.err.println(s"[scaleup] $t: ${spark.read.parquet(s"$out/$t.parquet").count()} rows")
    }
    def span(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head().getLong(0) + 1L

    val (cust, supp, part, ord, li, ev, doc, emb) = (
      load("customer"), load("supplier"), load("part"), load("orders"),
      load("lineitem"), load("events"), load("documents"), load("embeddings"))
    val (ck, sk, pk, ok, evk, dk, vk) = (
      span(cust, "c_custkey"), span(supp, "s_suppkey"), span(part, "p_partkey"),
      span(ord, "o_orderkey"), span(ev, "event_id"), span(doc, "doc_id"),
      span(emb, "vec_id"))

    def copies(df: DataFrame)(shift: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(i => shift(df, i)).reduce(_ unionAll _)

    // fixed dimensions pass through once
    save("region", load("region"), 1)
    save("nation", load("nation"), 1)

    save("customer", copies(cust)((d, i) =>
      d.withColumn("c_custkey", col("c_custkey") + lit(i * ck))), 4)
    save("supplier", copies(supp)((d, i) =>
      d.withColumn("s_suppkey", col("s_suppkey") + lit(i * sk))), 2)
    save("part", copies(part)((d, i) =>
      d.withColumn("p_partkey", col("p_partkey") + lit(i * pk))), 4)
    save("orders", copies(ord)((d, i) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(i * ok))
        .withColumn("o_custkey", col("o_custkey") + lit(i * ck))), 8)
    save("lineitem", copies(li)((d, i) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(i * ok))
        .withColumn("l_partkey", col("l_partkey") + lit(i * pk))
        .withColumn("l_suppkey", col("l_suppkey") + lit(i * sk))), 16)
    save("events", copies(ev)((d, i) =>
      d.withColumn("event_id", col("event_id") + lit(i * evk))
        .withColumn("user_id", col("user_id") + lit(i * ck))), 8)
    save("documents", copies(doc)((d, i) =>
      d.withColumn("doc_id", col("doc_id") + lit(i * dk))
        .withColumn("text",
          if (i == 0) col("text")
          else array_join(
            transform(split(col("text"), " "), w => concat(w, lit("_" + i))),
            " "))
        .withColumn("n_chars", length(col("text")).cast("long"))), 8)
    save("embeddings", copies(emb)((d, i) =>
      d.withColumn("vec_id", col("vec_id") + lit(i * vk))
        .withColumn("embedding",
          if (i == 0) col("embedding")
          else transform(sequence(lit(0), size(col("embedding")) - 1),
            j => element_at(col("embedding"),
              pmod(j + lit(i), size(col("embedding"))) + 1)))), 4)

    spark.stop()
  }
}
