package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** Decade measurement for the PERSISTED storage paths (round-10 verdict
  * Next #7): the 495-500 k-doc curve covered the session-pinned index
  * (q515) and the in-memory near-dup kernel (q509); this probe runs the
  * STORAGE layer at the same two points — q517's persisted dedup index
  * (build → reload → probe → append) and q520's IVF lake (build →
  * append → serve) — to confirm the O(batch) promise holds when the
  * corpus side is 10×: probe join ~flat (batch-sized work against
  * bucket-co-located corpus tables), append ~flat (O(batch) new files
  * per bucket/cell), build ~linear (one corpus pass).
  *
  * Methodology matches the round-10 decade runs: fixed BATCH at both
  * corpus points (the batch is sf0.1's documents/embeddings, word-
  * remapped/id-offset so nothing exact-dups against the corpus), cold
  * fresh JVM, 1 iteration, idle host.
  *
  * Round-12 adds the `emb` mode — the q526/q527 persisted EMBEDDING
  * index was the one storage surface without a measured decade: build
  * (writeEmbIndex) → reload+probe (dedupEmbAgainstIndex, fixed batch) →
  * append → probe #2 → compactEmbIndex → probe #3, at 20 k and 200 k
  * corpus vectors (ScaleUp embeddings ×10 / ×100). Expected signature =
  * the text index's: probe near-flat, append flat, build/compact linear.
  *
  * Usage:
  *   runMain graft.tools.ProbePersist dedup <corpusDir> [prefix]
  *   runMain graft.tools.ProbePersist ivf   <corpusDir> [lakePath]
  *   runMain graft.tools.ProbePersist emb   <corpusDir> [prefix]
  * where corpusDir holds documents.parquet / embeddings.parquet
  * (e.g. /tmp/graft_testdata/sf1 and /tmp/graft_testdata/sf10docs).
  */
object ProbePersist {
  private def timed[A](tag: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val corpusDir = args(1)
    val spark = graft.LocalSession.build("32", "graft-probe-persist")
    val batchSrc = "/root/testdata/sf0.1"

    mode match {
      case "dedup" =>
        val prefix = args.lift(2).getOrElse("graft_prob517")
        val corpus = spark.read.parquet(s"$corpusDir/documents.parquet")
          .select("doc_id", "text", "lang")
        val n = corpus.count()
        println(s"[probe] corpus docs: $n")
        // fixed batch: sf0.1 docs, every word suffixed + ids offset past
        // any corpus span — no exact dups against either corpus point,
        // same batch bytes at both
        val batch = spark.read.parquet(s"$batchSrc/documents.parquet")
          .select((col("doc_id") + 100000000L).as("doc_id"),
            regexp_replace(col("text"), lit(" "), lit("zq ")).as("text"),
            col("lang"))
          .localCheckpoint()
        println(s"[probe] batch docs: ${batch.count()}")
        timed("build (writeIndex)") {
          Dedup.writeIndex(corpus, "doc_id", "text", prefix = prefix)
        }
        val s2 = spark.newSession()
        val surv = timed("reload+probe (dedup)") {
          val v = Dedup.dedupAgainstIndex(Dedup.readIndex(s2, prefix),
            batch, "doc_id", "text").localCheckpoint()
          println(s"[probe]   survivors: ${v.count()}")
          v
        }
        timed("append (appendIndex)") {
          Dedup.appendIndex(surv, "doc_id", "text", prefix = prefix)
        }
        val s3 = s2.newSession()
        // a SECOND fresh batch (different word remap, disjoint ids) so the
        // post-append probe does full band+verify work instead of
        // short-circuiting on exact dups of the batch just appended
        val batch2 = spark.read.parquet(s"$batchSrc/documents.parquet")
          .select((col("doc_id") + 200000000L).as("doc_id"),
            regexp_replace(col("text"), lit(" "), lit("vx ")).as("text"),
            col("lang"))
          .localCheckpoint()
        timed("reload+probe #2 (post-append)") {
          val v2 = Dedup.dedupAgainstIndex(Dedup.readIndex(s3, prefix),
            batch2, "doc_id", "text")
          println(s"[probe]   survivors2: ${v2.count()}")
        }
        timed("compact (compactIndex)") {
          Dedup.compactIndex(s3, prefix)
        }
        timed("reload+probe #3 (post-compact)") {
          val v3 = Dedup.dedupAgainstIndex(Dedup.readIndex(s3.newSession(), prefix),
            batch2.withColumn("doc_id", col("doc_id") + 1000000000L),
            "doc_id", "text")
          println(s"[probe]   survivors3: ${v3.count()}")
        }

      case "ivf" =>
        val lake = args.lift(2).getOrElse(
          s"/tmp/graft_prob520_lake_${System.nanoTime()}")
        val cents = Similarity.seededCentroids(8, 64)
        val corpus = spark.read.parquet(s"$corpusDir/embeddings.parquet")
        println(s"[probe] corpus vecs: ${corpus.count()}")
        val batch = spark.read.parquet(s"$batchSrc/embeddings.parquet")
          .select((col("vec_id") + 100000000L).as("vec_id"), col("embedding"))
          .localCheckpoint()
        println(s"[probe] batch vecs: ${batch.count()}")
        val queries = spark.read.parquet(s"$batchSrc/embeddings.parquet")
          .filter(col("vec_id") < 10).select("vec_id", "embedding")
          .localCheckpoint()
        timed("build (writeIvfLists)") {
          Similarity.writeIvfLists(corpus, "vec_id", "embedding", cents, lake)
        }
        timed("append (appendIvfLists)") {
          Similarity.appendIvfLists(batch, "vec_id", "embedding", cents, lake)
        }
        timed("serve (10 queries, nprobe 2)") {
          val r = Similarity.serveIvfFromLists(spark, lake, queries,
            "vec_id", "embedding", k = 5, cents, nprobe = 2, dim = 64)
          println(s"[probe]   rows: ${r.count()}")
        }
        timed("compact (all cells)") {
          Similarity.compactIvfLists(spark, lake,
            Similarity.ivfCells(spark, lake))
        }
        timed("serve #2 (post-compact)") {
          val r = Similarity.serveIvfFromLists(spark, lake, queries,
            "vec_id", "embedding", k = 5, cents, nprobe = 2, dim = 64)
          println(s"[probe]   rows: ${r.count()}")
        }

      case "emb" =>
        val prefix = args.lift(2).getOrElse("graft_prob526")
        val corpus = spark.read.parquet(s"$corpusDir/embeddings.parquet")
        println(s"[probe] corpus vecs: ${corpus.count()}")
        // fixed batches: sf0.1 vectors, ids offset past any corpus span,
        // components passed through an ORTHOGONAL transform (sign-flip of
        // odd components / component reversal) — norms and within-batch
        // geometry exact, decorrelated from the corpus copies' rotations
        // (ScaleUp), so no planted near-dups and the probe does full
        // band+verify work at both corpus points on identical batch bytes
        def remap(idOffset: Long)(
            f: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
          spark.read.parquet(s"$batchSrc/embeddings.parquet")
            .select((col("vec_id") + idOffset).as("vec_id"),
              f(col("embedding")).as("embedding"))
            .localCheckpoint()
        val batch = remap(100000000L)(e =>
          transform(sequence(lit(0), size(e) - 1),
            j => when(pmod(j, lit(2)) === 0, element_at(e, j + 1))
              .otherwise(-element_at(e, j + 1))))
        println(s"[probe] batch vecs: ${batch.count()}")
        val batch2 = remap(200000000L)(e => reverse(e))
        // corpus-adaptive geometry, exactly as a deployment would build:
        // the fixed 8×6 default at 200 k vectors floods the verify join
        // (~3 k candidates/vector — the quadratic trap adaptiveBandShape
        // exists for); probes/appends pick the shape up from _meta
        val (nb, rpb) = Dedup.adaptiveBandShape(
          corpus.count(), withinCos = 0.95, minBands = 8, minRows = 6)
        println(s"[probe] adaptive band shape: ($nb bands, $rpb bits)")
        timed("build (writeEmbIndex)") {
          Dedup.writeEmbIndex(corpus, "vec_id", "embedding", dim = 64,
            prefix = prefix, nBands = nb, rowsPerBand = rpb)
        }
        val s2 = spark.newSession()
        val surv = timed("reload+probe (embDedup)") {
          val v = Dedup.dedupEmbAgainstIndex(Dedup.readEmbIndex(s2, prefix),
            batch, "vec_id", "embedding", dim = 64, threshold = 0.4)
            .localCheckpoint()
          println(s"[probe]   survivors: ${v.count()}")
          v
        }
        timed("append (appendEmbIndex)") {
          Dedup.appendEmbIndex(surv, "vec_id", "embedding", dim = 64,
            prefix = prefix)
        }
        val s3 = s2.newSession()
        timed("reload+probe #2 (post-append)") {
          val v2 = Dedup.dedupEmbAgainstIndex(Dedup.readEmbIndex(s3, prefix),
            batch2, "vec_id", "embedding", dim = 64, threshold = 0.4)
          println(s"[probe]   survivors2: ${v2.count()}")
        }
        timed("compact (compactEmbIndex)") {
          Dedup.compactEmbIndex(s3, prefix)
        }
        timed("reload+probe #3 (post-compact)") {
          val v3 = Dedup.dedupEmbAgainstIndex(
            Dedup.readEmbIndex(s3.newSession(), prefix),
            batch2.withColumn("vec_id", col("vec_id") + 1000000000L),
            "vec_id", "embedding", dim = 64, threshold = 0.4)
          println(s"[probe]   survivors3: ${v3.count()}")
        }

      case other => sys.error(s"unknown mode $other (dedup|ivf|emb)")
    }
    spark.stop()
  }
}
