package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXT (training-data pipeline) — deterministic, key-stable sampling and
  * dataset splitting.
  *
  * Training corpora need splits that are (a) reproducible run-to-run with no
  * RNG state, (b) stable under re-partitioning and incremental appends (a
  * document keeps its split forever), and (c) auditable by external engines.
  * Hashing the key gives all three where `rand()`/`randomSplit` give none:
  * the assignment is a pure per-row expression (embarrassingly parallel, no
  * shuffle) derived from `md5(key)` — reproducible in any engine
  * (DuckDB: `('0x'||substr(md5(key),1,8))::bigint % 10000`).
  */
object Sampling {

  /** Uniform bucket in [0, buckets) from the md5 of the key column —
    * deterministic, partition-independent, engine-reproducible. 32 hash bits
    * are uniform across 10^4 buckets far beyond any corpus size. */
  def hashBucket(key: Column, buckets: Int = 10000): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long") % buckets

  /** Assign each row a named split by cumulative fraction over the hash
    * bucket space, e.g. Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1).
    * Order matters (cumulative ranges); fractions must sum to ≤ 1, any
    * remainder falls into the last split. */
  def splitAssign(key: Column, splits: Seq[(String, Double)],
                  buckets: Int = 10000): Column = {
    require(splits.nonEmpty, "need at least one split")
    require(splits.map(_._2).sum <= 1.0 + 1e-9, "fractions must sum to <= 1")
    val b = hashBucket(key, buckets)
    val cuts = splits.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
      .map(f => math.round(f * buckets))
    val cases = splits.map(_._1).zip(cuts).dropRight(1)
      .foldLeft(None: Option[Column]) { case (acc, (name, cut)) =>
        Some(acc.fold(when(b < cut, name))(_.when(b < cut, name)))
      }
    cases.fold(lit(splits.last._1))(_.otherwise(splits.last._1))
  }

  /** Key-stable deterministic sample: keep rows whose hash bucket falls under
    * `fraction` — the scalable substitute for `df.sample` when re-runs and
    * appends must see the same rows kept. */
  def deterministicSample(df: DataFrame, key: Column, fraction: Double,
                          buckets: Int = 10000): DataFrame =
    df.filter(hashBucket(key, buckets) < math.round(fraction * buckets))

  /** Per-stratum deterministic sampling — the class-rebalancing primitive
    * (downsample over-represented languages/sources/domains in a training
    * corpus) with the same guarantees as `deterministicSample`: no RNG, no
    * shuffle (a pure per-row predicate over (stratum, key)), append-stable,
    * reproducible in any engine. Strata not named in `fractions` keep
    * `defaultFraction` of their rows. */
  def stratifiedSample(df: DataFrame, stratum: Column, key: Column,
                       fractions: Map[String, Double],
                       defaultFraction: Double = 0.0,
                       buckets: Int = 10000): DataFrame = {
    require((fractions.values ++ Seq(defaultFraction)).forall(f => f >= 0 && f <= 1),
      "fractions must be in [0,1]")
    val cut = fractions.toSeq.sortBy(_._1).foldLeft(
        lit(math.round(defaultFraction * buckets)): Column) {
      case (acc, (s, f)) =>
        when(stratum === s, lit(math.round(f * buckets))).otherwise(acc)
    }
    df.filter(hashBucket(key, buckets) < cut)
  }

  /** Token-budget sampling: per stratum (source/domain/language), keep
    * documents in deterministic hash order until the stratum's TOKEN budget
    * is exhausted — the "sample N billion tokens per domain" step of a
    * mixture recipe, where caps are token counts, not document counts. A
    * document is kept while the budget still has room when it starts
    * (exclusive prefix sum < budget), so the cap overshoots by at most one
    * document — the standard greedy contract, reproducible in any engine.
    *
    * Scale shape: a window partitioned only by stratum serializes each
    * stratum onto ONE task — and the contract is "N billion tokens per
    * domain", so a stratum is corpus-sized. This is the two-level
    * distributed prefix sum ([[Pipelines.packSequences]]'s pattern) applied
    * WITHIN each stratum: the bucket range [0, buckets) is sliced into
    * `groups` contiguous sub-ranges (the sub-group is a monotone function of
    * the primary sort key, so group order is a prefix of the global
    * hash order), the exclusive prefix runs in a (stratum, group)-partitioned
    * window, and the per-(stratum, group) totals — a dimension-sized
    * aggregate, #strata × groups rows — get their own exclusive prefix and
    * broadcast back. Integer addition is associative, so the two-level sum
    * equals the single-window one exactly; the hash order makes the kept
    * prefix unbiased w.r.t. the data's natural order. */
  def tokenBudgetSample(df: DataFrame, stratum: Column, key: Column,
                        nTokens: Column, budget: Long,
                        buckets: Int = 10000, groups: Int = 256): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(groups >= 1 && groups <= buckets, "need 1 <= groups <= buckets")
    val W = org.apache.spark.sql.expressions.Window
    val sliced = df
      .withColumn("__stratum", stratum)
      .withColumn("__bkt", hashBucket(key, buckets))
      .withColumn("__grp", expr(s"(__bkt * ${groups}L) div $buckets").cast("int"))
    val wLocal = W.partitionBy(col("__stratum"), col("__grp"))
      .orderBy(col("__bkt"), key)
      .rowsBetween(W.unboundedPreceding, -1)
    val local = sliced
      .withColumn("__local_before", coalesce(sum(nTokens).over(wLocal), lit(0L)))
    // per-(stratum, group) totals: #strata × groups rows, dimension-sized BY
    // CONSTRUCTION (not data-dependent), so the exclusive prefix over groups
    // and the broadcast back are both safe at any corpus size
    val wGrp = W.partitionBy(col("__stratum")).orderBy(col("__grp"))
      .rowsBetween(W.unboundedPreceding, -1)
    val grpOffsets = sliced.groupBy(col("__stratum"), col("__grp"))
      .agg(sum(nTokens).as("__grp_total"))
      .withColumn("__grp_offset",
        coalesce(sum(col("__grp_total")).over(wGrp), lit(0L)))
      .select(col("__stratum"), col("__grp"), col("__grp_offset"))
    local.join(broadcast(grpOffsets), Seq("__stratum", "__grp"))
      .filter(col("__grp_offset") + col("__local_before") < budget)
      .drop("__stratum", "__bkt", "__grp", "__local_before", "__grp_offset")
  }

  /** Epoch-weighted mixture assembly — the "dataset × epochs" table of the
    * published pretraining recipes (some sources repeat 2-3×, others are
    * subsampled below 1×): each row is replicated `floor(epochs)` times and
    * gains one extra copy on a key-stable `frac(epochs)` subsample. Output
    * adds an `epoch` column (0-based copy index) so downstream packing can
    * decorrelate copies (e.g. salt the pack key with it). Pure per-row
    * explode — no shuffle, no RNG; the fractional copy reuses the md5
    * bucket, so membership is append-stable and engine-reproducible.
    * Strata absent from `epochs` default to 1.0. */
  def epochMix(df: DataFrame, stratum: Column, key: Column,
               epochs: Map[String, Double], defaultEpochs: Double = 1.0,
               buckets: Int = 10000): DataFrame = {
    require((epochs.values ++ Seq(defaultEpochs)).forall(e => e >= 0),
      "epochs must be >= 0")
    val e = epochs.toSeq.sortBy(_._1).foldLeft(lit(defaultEpochs): Column) {
      case (acc, (s, f)) => when(stratum === s, lit(f)).otherwise(acc)
    }
    val full = floor(e).cast("long")
    val frac = e - full
    val copies = full +
      when(hashBucket(key, buckets) < round(frac * buckets), 1L).otherwise(0L)
    df.withColumn("epoch",
        explode(when(copies > 0, sequence(lit(0L), copies - 1))
          .otherwise(array().cast("array<long>"))))
  }

  /** Quality-banded downsampling — the importance-resampling shape of the
    * published data-selection recipes (keep high-quality bands at full rate,
    * thin the low-quality tail instead of cutting it): bucket every row by
    * its CORPUS-RELATIVE score quantile, then keep a per-band fraction with
    * the key-stable md5 predicate.
    *
    * `cuts` are ascending quantiles (e.g. 0.25, 0.5, 0.9) defining
    * `cuts.size + 1` bands; `rates(i)` is band i's keep fraction. A row's
    * band = the number of thresholds strictly below its score (ties fall to
    * the lower band — mirrored exactly by the oracle).
    *
    * Scale shape: thresholds are ONE exact-percentile aggregate row,
    * broadcast; band assignment and the keep predicate are pure per-row
    * expressions — no shuffle beyond the threshold agg, no RNG,
    * append-stable. The 100 TB variant swaps `percentile` for
    * `approx_percentile` (sketch-mergeable, single pass), as q84. */
  def scoreBandSample(df: DataFrame, key: Column, scoreCol: String,
                      cuts: Seq[Double], rates: Seq[Double],
                      buckets: Int = 10000): DataFrame = {
    require(rates.length == cuts.length + 1, "need one rate per band")
    require(cuts == cuts.sorted && cuts.forall(c => c > 0 && c < 1),
      "cuts must be ascending quantiles in (0,1)")
    require(rates.forall(r => r >= 0 && r <= 1), "rates must be in [0,1]")
    // thresholds rounded to 6 dp before the strict > comparison: Spark's
    // exact percentile and an external engine's quantile_cont both linearly
    // interpolate but can differ by 1 ulp, and a score within that ulp of a
    // cut would land in different bands — rounding on BOTH sides (mirrored
    // in the oracle SQL) is this engine's established cross-engine contract
    val th = df.agg(
      transform(
        expr(s"percentile($scoreCol, array(${cuts.mkString(", ")}))"),
        t => round(t, 6)).as("__th"))
    val banded = df.crossJoin(broadcast(th))
      .withColumn("band",
        aggregate(col("__th"), lit(0),
          (acc, t) => acc + when(col(scoreCol) > t, 1).otherwise(0)))
      .drop("__th")
    val rateArr = array(rates.map(lit): _*)
    banded
      .filter(hashBucket(key, buckets) <
        round(element_at(rateArr, col("band") + 1) * buckets))
      .withColumn("band", col("band").cast("long"))
  }

  /** Weighted sample-without-replacement (Efraimidis–Spirakis A-ES), made
    * deterministic: each row's priority is ln(u)/w for a key-stable uniform
    * u ∈ (0,1) (md5 bucket midpoint) and weight w > 0; the top `n` by
    * priority are EXACTLY an n-sample without replacement with inclusion
    * probability proportional to weight. The priority is rounded to 6 dp
    * before ranking with the key as tie-break — raw ln can differ by 1 ulp
    * between libms, and ranking on the rounded value is this engine's
    * established cross-engine contract (q81/q88). The top-n is a global
    * TakeOrdered (n is small by contract — a sample, not a partition of the
    * corpus); per-stratum caps at scale compose with [[stratifiedTake]]'s
    * window instead. */
  def weightedSample(df: DataFrame, key: Column, weight: Column, n: Int,
                     buckets: Int = 1000000000): DataFrame = {
    require(n > 0, "n must be positive")
    val u = (hashBucket(key, buckets).cast("double") + 0.5d) / buckets
    df
      // enforce the documented w > 0 contract: weight 0 yields null/±Inf
      // priorities and a negative weight silently inverts the A-ES ordering,
      // so non-positive-weight rows are excluded rather than corrupting the
      // sample (they have zero inclusion probability by definition anyway)
      .filter(weight > 0)
      .withColumn("__pri", round(log(u) / weight, 6))
      .orderBy(col("__pri").desc, key.asc)
      .limit(n)
      .drop("__pri")
  }

  /** Deterministic negative sampling for contrastive training: every row
    * gets `k` pseudo-random negatives drawn from the NEXT md5 bucket —
    * key-stable (append/rerun-reproducible, the same contract as every
    * sampler here), never self (different bucket), and uniform because md5
    * buckets are. The per-bucket candidate table is `nBuckets·k` rows — a
    * design-time dimension (pick nBuckets ~ parallelism, not corpus size),
    * so the bucket equi-join broadcasts; the only window is per-bucket
    * top-k over the secondary hash (hash-partitioned, k rows survive per
    * bucket before any shuffle via WindowGroupLimit). No RNG, no dense-id
    * assumption, no global window. A row whose successor bucket is empty
    * keeps its row with NULL negatives (left join) rather than silently
    * vanishing — pick nBuckets ≪ corpus size so every bucket is populated
    * and the null case never fires. */
  def hashNegatives(df: DataFrame, key: Column, k: Int,
                    nBuckets: Int = 64): DataFrame = {
    require(k > 0, "k must be positive")
    require(nBuckets >= 2, "need >= 2 buckets so a row cannot draw itself")
    // secondary hash (md5 chars 9-16) orders candidates within a bucket
    // independently of the bucket hash (chars 1-8)
    val h2 = conv(substring(md5(key.cast("string")), 9, 8), 16, 10).cast("long")
    val bucketed = df.withColumn("__bkt", hashBucket(key, nBuckets))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__bkt")).orderBy(h2.asc, key.asc)
    val cand = bucketed
      .withColumn("neg_rank", row_number().over(w).cast("long"))
      .filter(col("neg_rank") <= k)
      .select(col("__bkt").as("__src_bkt"), key.as("neg_id"), col("neg_rank"))
    bucketed.join(broadcast(cand),
        col("__src_bkt") === (col("__bkt") + 1) % nBuckets, "left")
      .drop("__bkt", "__src_bkt")
  }

  /** EXACT-n per-stratum deterministic sample: keep the `n` rows of each
    * stratum with the smallest (hash bucket, key) — a deterministic
    * substitute for per-group reservoir sampling when the contract is a
    * hard per-class cap ("at most n examples per language") rather than a
    * rate. One shuffle on the stratum key + a partitioned window (never a
    * global one); the hash order makes the selection unbiased w.r.t. any
    * natural ordering of the data. */
  def stratifiedTake(df: DataFrame, stratum: Column, key: Column,
                     n: Int, buckets: Int = 10000): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum).orderBy(hashBucket(key, buckets), key)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }
}
