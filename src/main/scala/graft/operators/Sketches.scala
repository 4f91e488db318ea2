package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXT (training-data pipeline) — mergeable frequency/cardinality sketches
  * with deterministic md5-derived hash rows, plus their accuracy AUDITS
  * against exact recounts.
  *
  * The engine already carries HLL distinct counts (q230) and Bloom semi-join
  * pruning (q195); this module adds the other two classics: count-min
  * (point-frequency estimation under a fixed memory budget) and KMV /
  * bottom-k (distinct counting that, unlike HLL, also supports SET
  * INTERSECTION estimates via the bottom-k union trick). Every hash is an
  * md5-substring integer — the `hashBucket` idiom — so an external engine
  * reproduces the sketch bit-for-bit: the accuracy audit itself is an
  * oracle-checkable query, not a trust-me property.
  *
  * Scale shape: both sketches reduce the corpus to a DESIGN-SIZED table
  * (d·w counters / k minima per set) — map-side combinable, mergeable
  * across partitions and days, then joined back broadcast. That
  * mergeability is the whole point at 100 TB: per-partition sketches union
  * without a second corpus pass.
  */
object Sketches {

  /** Row-j count-min hash: an independent 32-bit lane from md5 chars
    * [1+8j, 8+8j), reduced mod `width`. DuckDB mirror:
    * `('0x'||substr(md5(k), 1+8*j, 8))::bigint % width`. */
  def cmHash(key: Column, row: Int, width: Int): Column =
    conv(substring(md5(key.cast("string")), 1 + 8 * row, 8), 16, 10)
      .cast("long") % width

  /** Count-min sketch accuracy audit over `df`'s `key` occurrences: build
    * the d×w counter table, estimate every distinct key's frequency as the
    * min over lanes of its counter, and report the top `topN` keys by
    * exact count with exact vs estimate. CM never underestimates
    * (estimate ≥ exact; equality unless the key collided in every lane),
    * so `overestimate` is the per-key collision damage under this (d, w)
    * budget — the sizing feedback a 100 TB ingest needs before trusting
    * the sketch for heavy-hitter triage.
    *
    * Scale shape: ONE corpus aggregate to the (key, n) grain, then d
    * per-lane aggregates over that grain into d·w counters; the audit
    * joins the key grain against the BROADCAST counter table. At corpus
    * scale the counter build merges partials map-side — the sketch
    * property. */
  def countMinAudit(df: DataFrame, key: Column, depth: Int, width: Int,
                    topN: Int): DataFrame = {
    require(depth >= 1 && depth <= 3, "md5 has 32 hex chars: depth <= 3 lanes")
    require(width >= 2, "width must be >= 2")
    require(topN >= 1, "topN must be >= 1")
    val keyed = df.select(key.cast("string").as("__k"))
      .groupBy(col("__k")).agg(count(lit(1)).as("exact"))
    val lanes = (0 until depth).map { j =>
      keyed.groupBy(cmHash(col("__k"), j, width).as("__b"))
        .agg(sum(col("exact")).as("__c"))
        .select(lit(j).as("__j"), col("__b"), col("__c"))
    }.reduce(_.unionByName(_))
    val est = (0 until depth).map { j =>
      keyed.join(broadcast(lanes.filter(col("__j") === j)),
          cmHash(col("__k"), j, width) === col("__b"))
        .select(col("__k"), col("exact"), col("__c"))
    }.reduce(_.unionByName(_))
      .groupBy(col("__k"), col("exact"))
      .agg(min(col("__c")).as("estimate"))
    est
      .orderBy(col("exact").desc, col("__k").asc)
      .limit(topN)
      .select(col("__k").as("key"), col("exact"), col("estimate"),
        (col("estimate") - col("exact")).as("overestimate"))
  }

  /** 60-bit uniform hash for KMV minima — md5 chars 1..15. The bottom-k of
    * these over a set's distinct members IS the sketch. */
  def kmvHash(member: Column): Column =
    conv(substring(md5(member.cast("string")), 1, 15), 16, 10).cast("long")

  private val Full: Double = math.pow(2.0, 60)

  /** KMV (bottom-k) set-intersection audit between every unordered pair of
    * sets: per set keep the k smallest member hashes; |A∪B| ≈ (k−1)/θ with
    * θ = the k-th minimum of the MERGED sketches as a fraction of hash
    * space, and |A∩B| ≈ ρ·|A∪B| where ρ = the fraction of the union's
    * bottom-k present in BOTH sketches (membership below θ is decided by
    * the sketches alone since θ ≤ θ_A, θ_B — the bottom-k union trick HLL
    * cannot do for intersections). A pair whose union sketch is under-full
    * has both sets fully stored, so its estimate is exact by construction.
    * Output: per pair, exact vs estimated intersection cardinality.
    *
    * Scale shape: the per-set bottom-k is a (set, member)-grain distinct +
    * a set-partitioned top-k window (WindowGroupLimit keeps k rows per set
    * before any full sort); everything downstream operates on sketches —
    * n_sets·k rows, design-sized, broadcast. The EXACT intersection (the
    * audit's ground truth) is a member-grain self-join — affordable at
    * audit scale, and exactly the pass the sketch replaces at 100 TB. */
  def kmvIntersectAudit(df: DataFrame, setCol: Column, memberCol: Column,
                        k: Int): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val m = df.select(setCol.cast("string").as("__s"),
        memberCol.cast("string").as("__m")).distinct()
    val sizes = m.groupBy(col("__s")).agg(count(lit(1)).as("__n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__s")).orderBy(col("__h").asc, col("__m").asc)
    val sk = m.withColumn("__h", kmvHash(col("__m")))
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= k)
      .select(col("__s"), col("__m"), col("__h"))
    val pairs = sizes.select(col("__s").as("set_a"), col("__n").as("n_a"))
      .crossJoin(broadcast(sizes.select(col("__s").as("set_b"), col("__n").as("n_b"))))
      .filter(col("set_a") < col("set_b"))
    // merged-sketch member grain per pair: __cnt = how many of the two
    // sketches contain the member (2 ⇒ in A∩B for any member under θ)
    val uni = pairs
      .join(broadcast(sk.withColumnRenamed("__s", "set_a")), Seq("set_a"))
      .select(col("set_a"), col("set_b"), col("n_a"), col("n_b"),
        col("__m"), col("__h"))
      .unionByName(pairs
        .join(broadcast(sk.withColumnRenamed("__s", "set_b")), Seq("set_b"))
        .select(col("set_a"), col("set_b"), col("n_a"), col("n_b"),
          col("__m"), col("__h")))
      .groupBy(col("set_a"), col("set_b"), col("n_a"), col("n_b"),
        col("__m"), col("__h"))
      .agg(count(lit(1)).as("__cnt"))
    val wp = org.apache.spark.sql.expressions.Window
      .partitionBy(col("set_a"), col("set_b"))
      .orderBy(col("__h").asc, col("__m").asc)
    val stats = uni.withColumn("__r", row_number().over(wp))
      .filter(col("__r") <= k)
      .groupBy(col("set_a"), col("set_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("__ku"),
        max(when(col("__r") === k, col("__h"))).as("__thetah"),
        sum(when(col("__cnt") === 2, 1L).otherwise(0L)).as("__inboth"))
    val exact = m.select(col("__s").as("set_a"), col("__m"))
      .join(m.select(col("__s").as("set_b"), col("__m")), Seq("__m"))
      .filter(col("set_a") < col("set_b"))
      .groupBy(col("set_a"), col("set_b"))
      .agg(count(lit(1)).as("exact_intersection"))
    stats
      .withColumn("__estu",
        when(col("__ku") < k || col("__thetah").isNull,
          col("__ku").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(Full) /
            col("__thetah").cast("double")))
      .withColumn("__rho", col("__inboth").cast("double") /
        least(col("__ku"), lit(k.toLong)).cast("double"))
      .join(exact, Seq("set_a", "set_b"), "left")
      .select(col("set_a"), col("set_b"), col("n_a"), col("n_b"),
        coalesce(col("exact_intersection"), lit(0L)).as("exact_intersection"),
        (round(col("__rho") * col("__estu"), 2) + lit(0.0d))
          .as("est_intersection"))
  }
}
