package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.3 — the join shapes fixed by the reference's FK graph
  * (reference: database/schemas/init.sql FK declarations, e.g. :29,:47-48,:59-62).
  *
  * Scale policy: dimension joins broadcast (no shuffle of the fact side);
  * fact-fact joins shuffle on the join key and rely on AQE for skew; lineage
  * joins explode the UUID-array first so the join itself is a plain equi-join.
  */
object Joins {

  /** J1-J4 — fact ⋈ dimension equi-join with an explicit broadcast hint: the
    * dim side (projects/users/nation/region…) is orders of magnitude smaller
    * than the fact side, so a broadcast hash join avoids shuffling the fact
    * table entirely (reference: files.project_id → projects.id, init.sql:47). */
  def dimJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String], how: String = "inner"): DataFrame =
    fact.join(broadcast(dim), keys, how)

  /** J6/J7 — lineage array join: `input_files UUID[]` exploded, then
    * equi-joined against the files table
    * (reference: processing_tasks.input_files init.sql:61-62;
    * analyses.input_files init.sql:118). Explode-then-join keeps the probe
    * side a plain shuffled equi-join instead of an O(n·m) array-contains
    * nested loop. */
  def explodeJoin(tasks: DataFrame, arrayCol: String, files: DataFrame,
                  fileKey: String, how: String = "inner"): DataFrame =
    tasks
      .withColumn("__file_id", explode(col(arrayCol)))
      .join(files, col("__file_id") === col(fileKey), how)
      .drop("__file_id")

  /** J10 — access-control semi-join: keep fact rows whose key appears in the
    * permitted set; no columns from the right side leak into the output
    * (reference: owner checks, services/file-service/main.py:185,210,243). */
  def semiJoin(df: DataFrame, keys: DataFrame, on: Seq[String]): DataFrame =
    df.join(keys, on, "left_semi")

  /** J11 — cascade delete as an anti-join rewrite: children of deleted parents
    * are filtered out, parquet snapshots are rewritten rather than mutated
    * (reference: ON DELETE CASCADE on every FK, init.sql:29,47-48,59-60…). */
  def antiJoin(df: DataFrame, deleted: DataFrame, on: Seq[String]): DataFrame =
    df.join(deleted, on, "left_anti")

  /** J8/J9 — left outer join preserving unmatched rows (nullable FKs:
    * visualization_layers.file_id init.sql:132; audit_logs.user_id
    * ON DELETE SET NULL init.sql:155). */
  def leftJoin(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(right, keys, "left_outer")

  /** S6 analog — copy-on-write row update: merge updated rows over the base
    * snapshot by key (reference: field-wise update + updated_at stamp,
    * services/auth-service/crud.py:52-68). Implemented as anti-join of the
    * base against updated keys, then union — both sides shuffle once on the
    * key. */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    base.join(updates.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(updates)

  /** As-of join (LEFT): for each left row, the single most recent right row
    * whose timestamp is ≤ the left row's timestamp, within the same key —
    * the standard event⋈effective-dated-dimension operator (rates, configs,
    * slowly-changing state) that Spark has no built-in for.
    *
    * Spark-first implementation — NOT a range join (which explodes to
    * |left|·|versions| before picking the max) and NOT a per-key collect:
    * tag both sides, union, ONE shuffle on the key, sort each partition by
    * (ts, side), and propagate the latest right payload onto each left row
    * with `last(ignoreNulls)` over the preceding frame. O(n log n) per key
    * partition, single pass, whole pipeline stays in Exchange → Sort →
    * Window — the same cost shape as one window aggregate at any scale.
    *
    * Semantics: inclusive (a right row AT the left timestamp matches, the
    * ASOF `>=` convention); left rows with no prior right row keep null
    * payload columns. Right rows tied on (key, ts) resolve to the greatest
    * payload struct (deterministic); pre-dedup the right side when a
    * different tie rule is needed. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               rightCols: Seq[String], prefix: String = "asof_"): DataFrame = {
    require(rightCols.nonEmpty, "asofJoin needs at least one right payload column")
    val payload = struct(rightCols.map(col): _*)
    val payloadType = right.select(payload.as("__p")).schema("__p").dataType
    val r = right.select(col(key), col(rightTs).as("__ts"),
      payload.as("__p"), lit(0).as("__side"))
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__p", lit(null).cast(payloadType))
      .withColumn("__side", lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key))
      .orderBy(col("__ts").asc, col("__side").asc, col("__p").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    unioned
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.map(col) ++
        rightCols.map(c => col("__m").getField(c).as(prefix + c)): _*)
  }

  /** NATIVE as-of join — same semantics as [[asofJoin]], planned through
    * the custom [[graft.plans.AsofJoinNode]] LogicalPlan +
    * [[graft.plans.AsofJoinStrategy]] + [[graft.plans.AsofJoinExec]]
    * vertical instead of the union+window rewrite. Each side sorts once
    * within its hash co-partitioning and the merge is one forward pass
    * holding a single row of state — no union row inflation, no window
    * buffering — and the operator passes the left partitioning/ordering
    * through, so a downstream aggregate on `key` plans no new exchange.
    * Requires `AsofJoinStrategy` to be registered
    * (GraftExtensions.register). */
  def asofJoinNative(left: DataFrame, right: DataFrame, key: String,
                     leftTs: String, rightTs: String,
                     rightCols: Seq[String],
                     prefix: String = "asof_"): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    import org.apache.spark.sql.types._
    require(rightCols.nonEmpty, "asofJoinNative needs a payload column")
    // key/time types MUST match exactly: hashpartitioning(bigint) and
    // hashpartitioning(int) hash the same numeric value DIFFERENTLY
    // (Murmur3 over 8 vs 4 bytes), so mismatched types silently mispair
    // the co-partitions (caught by the AQE-off parity spec — with AQE on,
    // small inputs coalesce to one partition and hide it). Widen both
    // sides to the wider type up front.
    val order = Seq(ByteType, ShortType, IntegerType, LongType,
      FloatType, DoubleType)
    def widen(a: DataType, b: DataType): DataType =
      if (a == b) a
      else {
        val (ia, ib) = (order.indexOf(a), order.indexOf(b))
        require(ia >= 0 && ib >= 0,
          s"as-of key/time types must match or be widenable: $a vs $b")
        order(math.max(ia, ib))
      }
    val keyDt = widen(left.schema(key).dataType, right.schema(key).dataType)
    val tsDt = widen(left.schema(leftTs).dataType,
      right.schema(rightTs).dataType)
    def align(df: DataFrame, kc: String, tc: String): DataFrame = {
      var d = df
      if (d.schema(kc).dataType != keyDt)
        d = d.withColumn(kc, col(kc).cast(keyDt))
      if (d.schema(tc).dataType != tsDt)
        d = d.withColumn(tc, col(tc).cast(tsDt))
      d
    }
    val lAligned = align(left, key, leftTs)
    val rAligned = align(right, key, rightTs)
    val lPlan = lAligned.queryExecution.analyzed
    val rPlan = rAligned.queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             n: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found"))
    val pAttrs = rightCols.map(attr(rPlan, _))
    val outAttrs = pAttrs.map(a =>
      AttributeReference(prefix + a.name, a.dataType, nullable = true)())
    org.apache.spark.sql.graft.GraftPlanBuilder.ofRows(lAligned.sparkSession,
      graft.plans.AsofJoinNode(lPlan, rPlan,
        attr(lPlan, key), attr(rPlan, key),
        attr(lPlan, leftTs), attr(rPlan, rightTs), pAttrs, outAttrs))
  }

  /** Skew-salted equi-join: when one join key holds a disproportionate share
    * of the left (fact) side, a plain shuffled join puts that whole key on
    * one reducer. Salting splits each left key into `buckets` sub-keys using
    * a DETERMINISTIC per-row hash (never `rand()` — retries/speculative
    * tasks must re-derive the same salt), and explodes the right side
    * `buckets` ways so every sub-key still finds its match. Result set is
    * identical to the unsalted join; the hot key's rows now spread over
    * `buckets` reducers.
    *
    * AQE's skew-join handles this automatically for SORT-MERGE joins at
    * runtime; explicit salting remains the tool when AQE can't split (hash
    * joins, aggregations feeding the join, or a deliberately pinned
    * partitioning). `saltBy` should be any column unique-ish per row (a pk). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltBy: Column, buckets: Int,
                 how: String = "inner"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val l = left.withColumn("__salt", pmod(xxhash64(saltBy), lit(buckets)))
    val r = right.withColumn("__salt",
      explode(array((0 until buckets).map(b => lit(b.toLong)): _*)))
    l.join(r, Seq(key, "__salt"), how).drop("__salt")
  }

  /** Interval (range) join — pair each event with every interval containing
    * its timestamp (half-open: start ≤ ts < end; epoch-second longs on both
    * sides). Spark has no native range join, and the naive θ-join plans as
    * a broadcast-nested-loop (|events|·|intervals| comparisons — the same
    * trap `asofJoin` avoids). Time-bucketize instead, the temporal analog of
    * [[Spatial.gridJoin]]: each interval explodes to the buckets it covers
    * (≤ length/bucketSeconds + 1 rows), each event keys to its ONE bucket,
    * and the join becomes a shuffled EQUI-join on the bucket id with the
    * exact range predicate on survivors. No distinct needed — an event's
    * single bucket meets each covering interval exactly once. Pick
    * bucketSeconds on the order of the median interval length: too fine
    * explodes intervals, too coarse degrades selectivity (gridJoin's rule).
    * Empty/inverted intervals (end ≤ start) match nothing by construction. */
  def rangeJoin(events: DataFrame, tsSecCol: String,
                intervals: DataFrame, startSecCol: String, endSecCol: String,
                bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val bEv = events.withColumn("__bkt",
      floor(col(tsSecCol) / bucketSeconds).cast("long"))
    val covered = when(col(endSecCol) > col(startSecCol),
      sequence(floor(col(startSecCol) / bucketSeconds).cast("long"),
        floor((col(endSecCol) - 1) / bucketSeconds).cast("long")))
      .otherwise(array().cast("array<long>"))
    val bIv = intervals.withColumn("__bkt", explode(covered))
    bEv.join(bIv, Seq("__bkt"))
      .filter(col(tsSecCol) >= col(startSecCol) && col(tsSecCol) < col(endSecCol))
      .drop("__bkt")
  }

  /** CDC apply — the batch MERGE: collapse an insert/update/delete change
    * log to its latest operation per key and apply it to a snapshot.
    * Untouched snapshot rows survive (anti-join on logged keys), keys whose
    * latest op is I/U take the log's value, keys whose latest op is D
    * disappear. `src` marks provenance ('base' kept vs 'cdc' applied) so
    * downstream audits can tell a carried row from a merged one.
    *
    * Scale shape: the log collapses FIRST (latest-per-key window — key-
    * partitioned, state bounded by changed keys, which is the small side of
    * a CDC batch by nature); the snapshot then sees one anti equi-join.
    * Copy-on-write semantics, same as [[upsert]] — no in-place mutation. */
  def applyCdc(snapshot: DataFrame, log: DataFrame, key: String,
               valueCol: String, order: Column*): DataFrame = {
    val latest = Relational.latestPerKey(log, key, order: _*)
    val untouched = snapshot
      .join(latest.select(col(key)), Seq(key), "left_anti")
      .select(col(key), col(valueCol), lit("base").as("src"))
    val applied = latest.filter(col("op") =!= "D")
      .select(col(key), col(valueCol), lit("cdc").as("src"))
    untouched.unionByName(applied)
  }

  /** Bloom-pruned semi-join — the shuffle-avoidance composition for
    * fact ⋉ dim at 100 TB: build a `mBits`-bit Bloom filter over the dim
    * keys (k md5-derived positions each), prune the fact side with a
    * PER-ROW bitset probe (no shuffle, no join — a codegen'd filter), and
    * exact-verify the survivors with the real semi-join. Bloom filters
    * have NO false negatives, so the result is bit-identical to the plain
    * semi-join; the prune just shrinks what the verify join must shuffle
    * (at scale: a few KB broadcast replaces a fact-wide shuffle of
    * non-matching rows; Spark's own runtime bloom pruning is the same
    * idea, this form makes it explicit and tunable).
    *
    * The built filter is `mBits/64` longs — sized by the PARAMETER, not
    * the data, so the driver-side collect is a bounded model fit (the PQ
    * codebook class), and the probe array broadcasts by nature. */
  def bloomPruneSemiJoin(fact: DataFrame, factKey: String,
                         dim: DataFrame, dimKey: String,
                         mBits: Int = 4096, kHashes: Int = 3): DataFrame = {
    require(mBits % 64 == 0 && mBits > 0, "mBits must be a positive multiple of 64")
    require(kHashes >= 1, "need at least one hash")
    def posExpr(keySql: String, h: Int): String =
      s"pmod(cast(conv(substring(md5(concat('$h:', cast($keySql as string))), 1, 15), 16, 10) as bigint), ${mBits}L)"
    val words = new Array[Long](mBits / 64)
    dim.selectExpr((0 until kHashes).map(h => posExpr(dimKey, h) + s" as __p$h"): _*)
      .selectExpr(s"explode(array(${(0 until kHashes).map("__p" + _).mkString(",")})) as p")
      .distinct()
      .selectExpr("p div 64 as w",
        "shiftleft(cast(1 as bigint), cast(pmod(p, 64) as int)) as b")
      .groupBy(col("w")).agg(expr("bit_or(b)").as("bits"))
      .collect().foreach(r => words(r.getLong(0).toInt) = r.getLong(1))
    val probed = fact
      .withColumn("__words", typedLit(words.toSeq))
      .withColumn("__bloom_hit", (0 until kHashes).map { h =>
        expr(s"(element_at(__words, cast((${posExpr(factKey, h)}) div 64 as int) + 1)" +
          s" & shiftleft(cast(1 as bigint), cast(pmod(${posExpr(factKey, h)}, 64) as int))) != 0")
      }.reduce(_ && _))
      .filter(col("__bloom_hit"))
      .drop("__words", "__bloom_hit")
    probed.join(dim.select(col(dimKey)).distinct(),
      probed(factKey) === col(dimKey), "left_semi")
  }

  /** Golden-record merge — two-source survivorship: full-outer join on the
    * entity key, PER-COLUMN precedence (source B wins where it has a
    * value, A fills the gaps — the master-data "latest feed overrides,
    * nulls fall through" rule), plus a provenance tag. One shuffle on the
    * key; no windows. */
  def goldenRecord(a: DataFrame, b: DataFrame, key: String,
                   cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one payload column")
    val aa = a.select(col(key) +: lit(1).as("__a1") +:
      cols.map(c => col(c).as(s"__a_$c")): _*)
    val bb = b.select(col(key) +: lit(1).as("__b1") +:
      cols.map(c => col(c).as(s"__b_$c")): _*)
    aa.join(bb, Seq(key), "full_outer")
      .select(col(key) +:
        cols.map(c => coalesce(col(s"__b_$c"), col(s"__a_$c")).as(c)) :+
        when(col("__b1").isNull, "a_only")
          .when(col("__a1").isNull, "b_only")
          .otherwise("merged").as("src"): _*)
  }
}
