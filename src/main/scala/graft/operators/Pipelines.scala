package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus preparation — the composition the individual EXT
  * operators exist for, in the canonical order a pretraining data pipeline
  * applies them (each stage motivated by the published C4/Gopher/GPT-3
  * cleaning recipes):
  *
  *   1. length-outlier filter — corpus-relative percentile band
  *      ([[TextOps.lengthOutlierFilter]]); cheapest signal first, so every
  *      later stage processes fewer rows.
  *   2. PII scrub — URL/email/phone placeholders ([[TextOps.piiScrub]]).
  *   3. exact dedup on the normalized fingerprint of the SCRUBBED text —
  *      scrub first, because two documents differing only in a scrubbed
  *      email address are duplicates after scrubbing; keeps the minimum id
  *      per group (deterministic representative).
  *   4. benchmark decontamination — drop documents sharing any n-gram with
  *      the evaluation set ([[TextOps.decontaminate]]; eval set broadcast,
  *      corpus streams once).
  *   5. deterministic split assignment — key-stable md5 buckets
  *      ([[Sampling.splitAssign]]), so the train/val/test membership of a
  *      surviving document never changes across reruns or appends.
  *
  * The whole pipeline is ONE lazy DataFrame plan: no stage materializes,
  * Catalyst prunes columns across stage boundaries, and the only shuffles
  * are the dedup groupBy, the decontamination per-doc aggregate, and the
  * percentile aggregate — everything else is per-row. Near-dedup
  * deliberately stays OUT of the default composition (its candidate
  * pipeline wants the checkpointing discipline of [[Dedup.dedupCorpus]];
  * compose explicitly when needed).
  */
object Pipelines {

  /** Returns the cleaned corpus: (idCol, n_tokens, clean_text, split).
    * `benchmark` rows provide only text (`benchTextCol`); they are the
    * held-out evaluation documents to decontaminate against. */
  def pretrainCorpus(docs: DataFrame, idCol: String, textCol: String,
                     benchmark: DataFrame, benchTextCol: String,
                     splits: Seq[(String, Double)] =
                       Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05),
                     pLo: Double = 0.05, pHi: Double = 0.95,
                     shingleN: Int = 3): DataFrame = {
    val lengthed = TextOps.lengthOutlierFilter(docs, idCol, textCol, pLo, pHi)
    val scrubbed = lengthed
      .withColumn("clean_text", TextOps.piiScrub(col(textCol)))
      .select(col(idCol), col("n_tokens"), col("clean_text"))
    val keep = scrubbed
      .groupBy(TextOps.fingerprint(col("clean_text")).as("__fp"))
      .agg(min(col(idCol)).as(idCol))
      .select(idCol)
    val deduped = scrubbed.join(keep, Seq(idCol), "left_semi")
    val decon = TextOps.decontaminate(deduped, idCol, "clean_text",
      benchmark, benchTextCol, shingleN)
    decon.withColumn("split", Sampling.splitAssign(col(idCol), splits))
  }
}
