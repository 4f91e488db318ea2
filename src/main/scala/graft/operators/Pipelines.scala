package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions
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

  /** Sequence packing — the final corpus-assembly step before training:
    * documents are concatenated in a deterministic shuffled order (md5 of
    * the id — the "global shuffle" that decorrelates neighboring training
    * sequences, with the id as total tie-break) and the token stream is cut
    * into fixed `budget`-token training sequences. Each document is mapped
    * to its token interval: `tok_offset` (exclusive prefix sum of token
    * counts in pack order), `seq_first = tok_offset div budget` and
    * `seq_last = (tok_offset + n_tokens − 1) div budget` — the packed-sequence
    * range a loader must read to reconstruct the document. Zero-token
    * documents are dropped (they occupy no interval).
    *
    * Scale shape: a naive implementation is ONE GLOBAL WINDOW (every row
    * through a single partition — the q10 anti-pattern). This one is the
    * two-level distributed prefix sum: rows are hash-sliced into 256 ordered
    * groups by their md5's first byte (group order = pack order prefix), the
    * per-group exclusive prefix runs in a GROUP-partitioned window, and the
    * 256 group totals — a dimension-sized aggregate — get their own
    * exclusive prefix and are broadcast-joined back. Integer addition is
    * associative, so the two-level sum equals the global one exactly. */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    budget: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    val keyed = docs.select(
        col(idCol),
        size(functions.filter(TextOps.tokens(col(textCol)), t => t =!= ""))
          .cast("long").as("n_tokens"),
        md5(col(idCol).cast("string")).as("__key"))
      .filter(col("n_tokens") > 0)
      .withColumn("__grp", substring(col("__key"), 1, 2))
    val wLocal = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__grp")).orderBy(col("__key"), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val local = keyed.withColumn("__local_end", sum(col("n_tokens")).over(wLocal))
    val wGrp = org.apache.spark.sql.expressions.Window
      .orderBy(col("__grp"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val grpOffsets = keyed.groupBy(col("__grp"))
      .agg(sum(col("n_tokens")).as("__grp_total"))
      .withColumn("__grp_offset",
        coalesce(sum(col("__grp_total")).over(wGrp), functions.lit(0L)))
      .select(col("__grp"), col("__grp_offset"))
    local.join(functions.broadcast(grpOffsets), Seq("__grp"))
      .withColumn("tok_offset",
        col("__grp_offset") + col("__local_end") - col("n_tokens"))
      // integer division: a double-rounded quotient goes wrong past 2^53
      // total tokens, which a 100 TB corpus exceeds
      .withColumn("seq_first", expr(s"tok_offset div $budget"))
      .withColumn("seq_last", expr(s"(tok_offset + n_tokens - 1) div $budget"))
      .select(col(idCol), col("n_tokens"), col("tok_offset"),
        col("seq_first"), col("seq_last"))
  }

  /** Mergeable per-key aggregate STATE (n, decimal-exact sum, min, max) —
    * the materialized half of incremental aggregation. */
  def aggState(df: DataFrame, key: String, valueCol: String): DataFrame =
    df.groupBy(col(key)).agg(
      count(lit(1)).as("n"),
      sum(col(valueCol).cast("decimal(18,2)")).as("__s"),
      min(col(valueCol)).as("min_v"),
      max(col(valueCol)).as("max_v"))

  /** Incremental aggregate maintenance — merge partial [[aggState]]s
    * WITHOUT rescanning the base data: counts add, exact decimal sums add,
    * min/max fold. merge(state(A), state(B)) ≡ state(A ∪ B) because every
    * component is a commutative monoid — the property the q169 oracle
    * (full recompute over the union) checks. This is the daily-ETL shape:
    * the base state is a write-once artifact; each new partition folds in
    * with work proportional to the DELTA, not the corpus. */
  def mergeAggStates(states: DataFrame*): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy(col(states.head.columns.head))
      .agg(sum(col("n")).as("n"), sum(col("__s")).as("__s"),
        min(col("min_v")).as("min_v"), max(col("max_v")).as("max_v"))

  /** Final user-facing view of an agg state (sum exposed as double). */
  def finishAggState(state: DataFrame): DataFrame =
    state.select(col(state.columns.head), col("n"),
      col("__s").cast("double").as("sum_v"), col("min_v"), col("max_v"))
  /** Incremental JOIN-view maintenance — the delta algebra for a
    * materialized `fact ⋈ dim` view when a fact delta (appends) and a dim
    * delta (key-level updates, latest-wins) arrive:
    * V′ = (V ∖ rows touching Δdim keys) ∪ (fact_old ⋈ Δdim) ∪ (Δfact ⋈ dim′).
    * Result is row-identical to the full recompute `fact′ ⋈ dim′`, but the
    * work is Δ-sized: one anti-join against the existing view plus two
    * delta joins — the point at 100 TB, where the full fact never moves.
    * (The agg-state and snapshot-CDC siblings are `aggState`/`cdcApply`;
    * this is the JOIN member of the incremental family.) */
  def incrementalJoinView(factOld: DataFrame, deltaFact: DataFrame,
                          dimOld: DataFrame, deltaDim: DataFrame,
                          key: String): DataFrame = {
    val vOld = factOld.join(dimOld, Seq(key))
    val keep = vOld.join(deltaDim.select(col(key)), Seq(key), "left_anti")
    val refreshed = factOld.join(deltaDim, Seq(key))
    val dimNew = dimOld.join(deltaDim.select(col(key)), Seq(key), "left_anti")
      .unionByName(deltaDim)
    val fresh = deltaFact.join(dimNew, Seq(key))
    keep.unionByName(refreshed).unionByName(fresh)
  }
  /** RLHF preference-pair construction — per group, the best- and
    * worst-scoring documents under a caller-supplied quality score form
    * one (chosen, rejected) pair; groups with fewer than two distinct
    * documents emit nothing (no self-pairs). Total order (score desc, id
    * asc) / (score asc, id asc) makes both picks deterministic.
    *
    * Scale shape: ONE hash aggregate with min/max over (score, ±id)
    * struct orderings — no windows, no sort. */
  def preferencePairs(docs: DataFrame, groupCols: Seq[String], idCol: String,
                      score: Column): DataFrame = {
    require(groupCols.nonEmpty, "need at least one grouping column")
    // max of (score, -id) = best with ties to LOWER id; min of (score, id)
    // = worst with ties to lower id
    val best = max(struct(score.as("s"), (-col(idCol)).as("ni"),
      col(idCol).as("id")))
    val worst = min(struct(score.as("s"), col(idCol).as("id")))
    docs.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"), best.as("__b"), worst.as("__w"))
      .filter(col("n_docs") >= 2)
      .select(groupCols.map(col) ++ Seq(col("n_docs"),
        col("__b.id").as("chosen_id"), col("__b.s").as("chosen_score"),
        col("__w.id").as("rejected_id"), col("__w.s").as("rejected_score")): _*)
  }

  /** Deterministic span-corruption plan (T5/UL2-style): each token index
    * masks when md5(id:idx) mod 100 < maskPct; consecutive masked indices
    * merge into spans (gaps-and-islands over the token index), and the
    * plan emits one row per span — (doc, span_start, span_len). The
    * downstream collator replaces each span with a sentinel; this op is
    * the DECISION, deterministic and replayable (no RNG, the repo rule).
    *
    * Scale shape: explode to (doc, idx) for masked tokens only, then one
    * doc-partitioned window (island = idx − row_number, the classic
    * constant-time islands key) and one hash agg. */
  def maskSpans(docs: DataFrame, idCol: String, textCol: String,
                maskPct: Int): DataFrame = {
    require(maskPct >= 1 && maskPct <= 99, "maskPct must be in [1, 99]")
    val W = org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol),
        posexplode(TextOps.tokens(col(textCol))).as(Seq("idx", "__t")))
      .filter(col("__t") =!= "")
      .filter(pmod(conv(substring(md5(concat_ws(":",
        col(idCol).cast("string"), col("idx").cast("string"))), 1, 8), 16, 10)
        .cast("long"), lit(100L)) < maskPct)
    val w = W.partitionBy(col(idCol)).orderBy(col("idx").asc)
    toks.withColumn("__island", col("idx") - row_number().over(w))
      .groupBy(col(idCol), col("__island"))
      .agg(min(col("idx")).as("span_start"), count(lit(1)).as("span_len"))
      .drop("__island")
  }
}