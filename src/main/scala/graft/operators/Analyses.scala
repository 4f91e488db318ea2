package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** SURVEY.md §2.11 — the reference's extension point: "an analysis is a named
  * function over files with a JSON parameter bag"
  * (reference: analyses table init.sql:113-124 — analysis_type string +
  * JSONB parameters → JSONB results; same pattern for processing_tasks
  * init.sql:57-71).
  *
  * Spark shape: a registry `name → (DataFrame, params) => DataFrame`. Params
  * arrive as a JSON string (the JSONB bag); results are DataFrames the caller
  * serializes back. Registered ops compose the operator library — adding an
  * analysis type is adding a map entry, exactly like the reference's design.
  */
object Analyses {

  type AnalysisOp = (DataFrame, String) => DataFrame

  /** Pull a string field out of the JSONB-style parameter bag. */
  private def param(json: String, key: String): Option[String] =
    Option(json).filter(_.trim.nonEmpty).flatMap { j =>
      org.json4s.jackson.JsonMethods.parse(j) \ key match {
        case org.json4s.JString(s) => Some(s)
        case _ => None
      }
    }

  /** Built-in analysis types. Each mirrors a §2 operator family so the
    * registry exercises the whole library through one uniform entry point. */
  val registry: Map[String, AnalysisOp] = Map(
    // per-group coverage bbox over point columns (A3)
    "bbox_stats" -> ((df, params) => {
      val g = param(params, "group_by").getOrElse("project_id")
      Relational.bboxAgg(df, Seq(g), col("lon"), col("lat"))
    }),
    // status rollup (A5)
    "status_rollup" -> ((df, params) => {
      val c = param(params, "column").getOrElse("status")
      Relational.rollupCount(df, c)
    }),
    // exact dedup audit over an arbitrary key column
    "dedup_audit" -> ((df, params) => {
      val key = param(params, "key").getOrElse("id")
      Dedup.exactDedup(df, param(params, "id").getOrElse(key), col(key))
    }),
    // token statistics over a text column (EXT)
    "token_stats" -> ((df, params) => {
      val c = col(param(params, "column").getOrElse("text"))
      df.select(
        size(TextOps.tokens(c)).as("n_tokens"),
        TextOps.langId(TextOps.tokens(c)).as("lang_pred"))
        .groupBy(col("lang_pred"))
        .agg(count(lit(1)).as("n"), avg(col("n_tokens")).as("avg_tokens"))
    }))

  def run(analysisType: String, input: DataFrame, paramsJson: String): DataFrame =
    registry.getOrElse(analysisType,
      throw new IllegalArgumentException(
        s"unknown analysis_type '$analysisType' (have: ${registry.keys.mkString(", ")})"))(
      input, paramsJson)

  // ---- custom typed UDAF (SURVEY §7.3): single-pass bbox Aggregator ----

  case class BBox(minLon: Double, minLat: Double, maxLon: Double, maxLat: Double)

  /** Per-group bbox as one `Aggregator[(lon,lat), BBox, BBox]` — the typed
    * single-pass form of A3 (reference: shared/utils/__init__.py:181-194);
    * usable via `udaf(BBoxAggregator)` from SQL or `.agg(bboxUdaf(...))`. */
  object BBoxAggregator extends Aggregator[(Double, Double), BBox, BBox] {
    override def zero: BBox =
      BBox(Double.MaxValue, Double.MaxValue, Double.MinValue, Double.MinValue)
    override def reduce(b: BBox, p: (Double, Double)): BBox =
      BBox(math.min(b.minLon, p._1), math.min(b.minLat, p._2),
        math.max(b.maxLon, p._1), math.max(b.maxLat, p._2))
    override def merge(a: BBox, b: BBox): BBox =
      BBox(math.min(a.minLon, b.minLon), math.min(a.minLat, b.minLat),
        math.max(a.maxLon, b.maxLon), math.max(a.maxLat, b.maxLat))
    override def finish(r: BBox): BBox = r
    override def bufferEncoder: Encoder[BBox] = Encoders.product[BBox]
    override def outputEncoder: Encoder[BBox] = Encoders.product[BBox]
  }

  /** Column form: `df.groupBy(...).agg(bboxUdaf(col("lon"), col("lat")))`. */
  def bboxUdaf(lon: Column, lat: Column): Column =
    udaf(BBoxAggregator).apply(lon, lat).as("bbox")

  /** Data-profiling histogram: per-group equi-width bucket counts of an
    * integer column over the GLOBAL [min, max] range (shared bucket edges
    * make groups comparable — the point of a profile). Pure integer
    * arithmetic (`(v − min)·buckets div (max − min)`, top value clamped
    * into the last bucket) so bucket assignment is engine-exact; the
    * min/max pair is one broadcast row, the histogram one hash aggregate —
    * the single-pass profiling shape that replaces per-column driver
    * loops. */
  def histogramProfile(df: DataFrame, groupCol: String, valueCol: String,
                       buckets: Int = 10): DataFrame = {
    require(buckets >= 1, "need at least one bucket")
    val mm = df.agg(
      min(col(valueCol).cast("long")).as("__mn"),
      max(col(valueCol).cast("long")).as("__mx"))
    df.select(col(groupCol), col(valueCol).cast("long").as("__v"))
      .crossJoin(broadcast(mm))
      .withColumn("bucket",
        when(col("__mx") === col("__mn"), lit(0L))
          .otherwise(least(
            expr(s"((__v - __mn) * ${buckets}L) div (__mx - __mn)"),
            lit((buckets - 1).toLong))))
      .groupBy(col(groupCol), col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("__v")).as("bucket_min"), max(col("__v")).as("bucket_max"))
  }

  /** Pearson chi-squared contingency cells over two categorical columns —
    * the corpus-composition independence test (is language distribution the
    * same across sources, or is one source skewing the mixture?). Emits one
    * row per observed cell with the observed count, the
    * independence-expected count r·c/n, and the cell's chi-squared
    * contribution (o−e)²/e; the statistic is the sum, left to the caller so
    * the per-cell attribution (WHICH cells deviate) survives.
    *
    * Scale shape: one hash aggregate collapses the data to the cell table,
    * which is bounded by |rows|×|cols| — a product of two categorical
    * cardinalities, not data size — so the window sums over it (row, column
    * and grand totals) are safe at any input scale. */
  def contingencyChi2(df: DataFrame, rowCol: String, colCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = df.groupBy(col(rowCol), col(colCol)).agg(count(lit(1)).as("observed"))
    val withTotals = cells
      .withColumn("__r", sum(col("observed")).over(Window.partitionBy(col(rowCol))))
      .withColumn("__c", sum(col("observed")).over(Window.partitionBy(col(colCol))))
      .withColumn("__n", sum(col("observed")).over(Window.partitionBy()))
      .withColumn("__e",
        col("__r").cast("double") * col("__c").cast("double") / col("__n").cast("double"))
    withTotals.select(
      col(rowCol), col(colCol), col("observed"),
      round(col("__e"), 6).as("expected"),
      round((col("observed").cast("double") - col("__e")) *
        (col("observed").cast("double") - col("__e")) / col("__e"), 6).as("chi2_contrib"))
  }

  /** Per-key event-rate anomaly detection — flag the days where a key's
    * activity deviates from its own baseline by ≥ `zThresh` sample standard
    * deviations (the monitoring/abuse-detection shape: bots, scrapers and
    * outages all show up as per-entity rate spikes or cliffs). Days with no
    * events are absent from the baseline by design (observed-day model).
    *
    * Determinism: the mean and sample variance are derived from EXACT
    * integer sums (Σc, Σc²) so both engines do the identical
    * (ss − s²/nd)/(nd−1) double arithmetic — never a Welford-style
    * `stddev_samp` whose accumulation order is engine-specific. Scale
    * shape: two hash aggregates (daily counts, per-key moments) and one
    * key-equi join back; no windows, no driver state. */
  def rateAnomalies(events: DataFrame, keyCol: String, tsCol: String,
                    zThresh: Double = 2.0): DataFrame = {
    require(zThresh > 0, "need zThresh > 0")
    val daily = events.groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val stats = daily.groupBy(col(keyCol)).agg(
        count(lit(1)).as("__nd"),
        sum(col("n_events")).as("__s"),
        sum(col("n_events") * col("n_events")).as("__ss"))
      .filter(col("__nd") >= 2)
    val z = daily.join(stats, Seq(keyCol))
      .withColumn("__mean", col("__s").cast("double") / col("__nd").cast("double"))
      .withColumn("__var",
        (col("__ss").cast("double") -
          col("__s").cast("double") * col("__s").cast("double") / col("__nd").cast("double")) /
          (col("__nd").cast("double") - lit(1)))
      .filter(col("__var") > 0)
      .withColumn("__z",
        (col("n_events").cast("double") - col("__mean")) / sqrt(col("__var")))
    z.filter(abs(col("__z")) >= zThresh)
      .select(col(keyCol), col("day"), col("n_events"), round(col("__z"), 6).as("z"))
  }

  /** MAD (median-absolute-deviation) outlier detection — the ROBUST
    * companion of [[rateAnomalies]]: a key whose baseline contains outliers
    * inflates its own stddev and hides them from a z-test, while the median
    * and MAD ignore up to half the days being wild. Flags days where the
    * modified z-score 0.6745·(x − med)/MAD exceeds `thresh` (3.5 = the
    * Iglewicz–Hoaglin convention). MAD-0 keys (≥ half the days identical)
    * are excluded rather than dividing by zero.
    *
    * Determinism: daily counts are integers, so the interpolated median and
    * the MAD are EXACT binary doubles (whole or half/quarter values) in any
    * engine — the one place exact `percentile` parity is unconditionally
    * safe. Scale shape: two per-key percentile aggregates + two key
    * equi-joins; the q84 note applies — at 100 TB swap `percentile` for
    * `approx_percentile` and accept sketch error. */
  def madOutliers(events: DataFrame, keyCol: String, tsCol: String,
                  thresh: Double = 3.5): DataFrame = {
    require(thresh > 0, "need thresh > 0")
    val daily = events.groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val med = daily.groupBy(col(keyCol))
      .agg(expr("percentile(n_events, 0.5)").as("__med"))
    val dev = daily.join(med, Seq(keyCol))
      .withColumn("__adev", abs(col("n_events").cast("double") - col("__med")))
    val mad = dev.groupBy(col(keyCol))
      .agg(expr("percentile(__adev, 0.5)").as("__mad"))
    dev.join(mad, Seq(keyCol)).filter(col("__mad") > 0)
      .withColumn("__rz",
        (lit(0.6745) * (col("n_events").cast("double") - col("__med"))) / col("__mad"))
      .filter(abs(col("__rz")) > thresh)
      .select(col(keyCol), col("day"), col("n_events"), round(col("__rz"), 6).as("rz"))
  }

  /** Per-key OLS trend — slope/intercept of value over time from EXACT
    * moments: x is seconds since the key's own first event (small exact
    * longs — never raw epoch micros, whose squares overflow), y is
    * decimal(18,2), and Σx, Σx², Σxy, Σy are all exact integer/decimal sums,
    * so both engines do the identical closed-form double arithmetic
    * slope = (n·Σxy − Σx·Σy)/(n·Σx² − Σx²̂) once at the end — the same
    * never-sum-doubles contract as q129, here for `regr_slope` semantics.
    * Zero-time-variance keys (all events co-timestamped) are excluded.
    * Scale shape: per-key min join + one hash aggregate. */
  def trendSlope(events: DataFrame, keyCol: String, tsCol: String,
                 valCol: String): DataFrame = {
    val withT0 = events
      .join(events.groupBy(col(keyCol)).agg(min(col(tsCol)).as("__t0")), Seq(keyCol))
      // whole seconds since the key's first event: `div` keeps x an exact
      // long (`/` would be double division and poison the exact sums)
      .withColumn("__x", expr(s"(unix_micros($tsCol) - unix_micros(__t0)) div 1000000"))
      .withColumn("__y", col(valCol).cast("decimal(18,2)"))
    val m = withT0.groupBy(col(keyCol)).agg(
      count(lit(1)).as("n"),
      sum(col("__x")).as("__sx"),
      // x widened to decimal BEFORE the square: long·long would wrap
      // silently once x² sums pass 2⁶³ at larger scale factors
      sum(col("__x").cast("decimal(20,0)") * col("__x")).as("__sxx"),
      sum(col("__y")).as("__sy"),
      sum(col("__y") * col("__x")).as("__sxy"))
    m.withColumn("__det",
        col("n").cast("double") * col("__sxx").cast("double") -
          col("__sx").cast("double") * col("__sx").cast("double"))
      .filter(col("__det") > 0)
      .withColumn("__slope",
        (col("n").cast("double") * col("__sxy").cast("double") -
          col("__sx").cast("double") * col("__sy").cast("double")) / col("__det"))
      // `+ 0.0` collapses IEEE -0.0 to +0.0 — DuckDB's round can emit -0.0
      // where Spark emits 0.0 (hash-comparator divergence, never a value one)
      .withColumn("slope", round(col("__slope"), 6) + lit(0.0d))
      .withColumn("intercept",
        round((col("__sy").cast("double") - col("__slope") * col("__sx").cast("double")) /
          col("n").cast("double"), 6) + lit(0.0d))
      .select(col(keyCol), col("n"), col("slope"), col("intercept"))
  }

  /** Market-basket co-occurrence — "orders containing X also contained Y":
    * top-k co-purchased items per item, the classic item-item
    * recommendation table. Pairs are generated WITHIN each basket (the
    * a<b self-join on the basket key), so the quadratic term is bounded by
    * basket size — a per-GROUP explosion, never a per-CORPUS one; the
    * symmetric orientation + top-k then runs over the (item, other) count
    * table, bounded by pair cardinality (WindowGroupLimit prunes per-item
    * groups to k before the sort completes).
    *
    * Determinism: ties rank by (n_co desc, other asc) — a total order. */
  def coPurchasePairs(baskets: DataFrame, basketCol: String, itemCol: String,
                      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    import org.apache.spark.sql.expressions.Window
    val b = baskets.select(col(basketCol).as("__ok"), col(itemCol).as("__item")).distinct()
    val pairs = b.join(b.select(col("__ok"), col("__item").as("__other")), Seq("__ok"))
      .filter(col("__item") < col("__other"))
      .groupBy(col("__item"), col("__other")).agg(count(lit(1)).as("n_co"))
    // both orientations via ONE explode — a `unionAll(pairs, pairs.select)`
    // would duplicate the whole self-join+agg subtree in the plan (verified
    // in the executed plan: two identical join branches), doubling the work
    val sym = pairs.select(explode(array(
        struct(col("__item").as("item"), col("__other").as("other")),
        struct(col("__other").as("item"), col("__item").as("other")))).as("__p"),
        col("n_co"))
      .select(col("__p.item"), col("__p.other"), col("n_co"))
    val w = Window.partitionBy(col("item")).orderBy(col("n_co").desc, col("other").asc)
    sym.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** Per-group Pearson correlation from EXACT moments — `corr()` built-ins
    * are engine-ordered double reductions (Spark's CentralMomentAgg and
    * DuckDB's corr sum doubles in partition order), so their last bits
    * differ run-to-run and engine-to-engine; under an exact-hash contract
    * the statistic must be a CLOSED-FORM evaluation of exactly-summed
    * moments (the trendSlope discipline). n, Σx, Σy, Σxy, Σx², Σy² are
    * decimal-exact; r = (nΣxy − ΣxΣy) / √((nΣx²−Σx²ₛ)(nΣy²−Σy²ₛ)) is ONE
    * double expression, rounded to the 6-dp contract. Degenerate groups
    * (zero variance on either axis) are excluded — r is undefined there.
    *
    * Scale shape: one hash aggregate with map-side partials; no windows,
    * no second pass (the mean-centered two-pass formulation would need
    * one). */
  def exactCorr(df: DataFrame, groupCol: String, xCol: String,
                yCol: String): DataFrame = {
    val t = df.select(col(groupCol),
      col(xCol).cast("decimal(18,2)").as("__x"),
      col(yCol).cast("decimal(18,2)").as("__y"))
    val m = t.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n"),
      sum(col("__x")).as("__sx"),
      sum(col("__y")).as("__sy"),
      sum(col("__x") * col("__y")).as("__sxy"),
      sum(col("__x") * col("__x")).as("__sxx"),
      sum(col("__y") * col("__y")).as("__syy"))
    m.withColumn("__vx",
        col("n").cast("double") * col("__sxx").cast("double") -
          col("__sx").cast("double") * col("__sx").cast("double"))
      .withColumn("__vy",
        col("n").cast("double") * col("__syy").cast("double") -
          col("__sy").cast("double") * col("__sy").cast("double"))
      .filter(col("__vx") > 0 && col("__vy") > 0)
      .withColumn("corr", round(
        (col("n").cast("double") * col("__sxy").cast("double") -
          col("__sx").cast("double") * col("__sy").cast("double")) /
          sqrt(col("__vx") * col("__vy")), 6))
      .select(col(groupCol), col("n"), col("corr"))
  }

  /** Percent-rank normalization via the value-distribution table — calibrate
    * a score across groups (e.g. a quality score across languages) so one
    * global threshold means the same thing in every group. pr(v) =
    * |values < v| / (n_group − 1), the standard `percent_rank` definition,
    * with ties sharing the rank of their first peer.
    *
    * Scale shape: this is deliberately NOT `percent_rank().over(partitionBy
    * (group))` — with few groups those window partitions are corpus-sized
    * sorts. Instead the data collapses to the (group, value) distribution
    * table (bounded by value cardinality), cumulative counts run over THAT,
    * and a hash join maps every row to its rank — the same
    * distribution-table trick as the q92 two-level prefix sum. */
  def percentRankNormalize(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dist = df.groupBy(col(groupCol), col(valueCol)).agg(count(lit(1)).as("__c"))
    val cum = dist
      .withColumn("__less",
        sum(col("__c")).over(
          Window.partitionBy(col(groupCol)).orderBy(col(valueCol))) - col("__c"))
      .withColumn("__ng", sum(col("__c")).over(Window.partitionBy(col(groupCol))))
      .withColumn("pr",
        when(col("__ng") === 1, lit(0.0)).otherwise(
          round(col("__less").cast("double") / (col("__ng").cast("double") - lit(1)), 6)))
      .select(col(groupCol), col(valueCol), col("pr"))
    df.join(cum, Seq(groupCol, valueCol))
  }

  /** 2-D skyline (Pareto frontier): the points not dominated on
    * (minimize `xCol`, maximize `yCol`) — the classic "cheapest for its
    * size class" / best-tradeoff query. A pair is dominated iff some other
    * pair is ≤ on x AND ≥ on y with at least one strict; equal pairs never
    * dominate each other (they collapse at the distinct-pair grain anyway).
    *
    * Scale shape: rows collapse to the DISTINCT (x, y) grain first (with
    * multiplicity), then a two-level prune: a hash-bucketed LOCAL skyline
    * pass (sound for ANY row partition — a locally dominated pair is
    * globally dominated) shrinks each bucket to its own frontier (expected
    * O(log n) for random data), and only the surviving candidates see the
    * one GLOBAL ordered pass. In sort order (x asc, y desc, and x asc
    * within equal y) a pair is on the frontier iff its y strictly exceeds
    * the running max over all earlier pairs — earlier = cheaper-or-equal,
    * so rmax ≥ y is exactly a dominance witness. */
  def skyline2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = df.groupBy(col(xCol), col(yCol)).agg(count(lit(1)).as("n"))
    def frontier(in: DataFrame, w: org.apache.spark.sql.expressions.WindowSpec) =
      in.withColumn("__rmax",
          max(col(yCol)).over(w.orderBy(col(xCol).asc, col(yCol).desc)
            .rowsBetween(Window.unboundedPreceding, -1)))
        .filter(col("__rmax").isNull || col(yCol) > col("__rmax"))
        .drop("__rmax")
    // bucket choice is plan-only: ANY partition gives the same survivors set
    // superset, and the global pass fixes the exact frontier
    val local = frontier(
      pairs.withColumn("__b", pmod(hash(col(xCol), col(yCol)), lit(64))),
      Window.partitionBy(col("__b"))).drop("__b")
    frontier(local, Window.partitionBy())
  }

  /** Per-group weighted median — the smallest value v whose cumulative
    * weight reaches half the group total (2·cumw ≥ total, compared in
    * EXACT decimals so the cut never floats). The robust center for
    * weighted distributions (price weighted by quantity, score weighted by
    * tokens).
    *
    * Scale shape: rows collapse to the (group, value) grain with exactly-
    * summed decimal weights; the cumulative window then runs over that
    * value-cardinality-bounded table (the percentRankNormalize discipline),
    * never over raw rows. */
  def weightedMedian(df: DataFrame, groupCol: String, valueCol: String,
                     weightCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grain = df
      .select(col(groupCol), col(valueCol),
        col(weightCol).cast("decimal(18,2)").as("__w"))
      .filter(col("__w") > 0)
      .groupBy(col(groupCol), col(valueCol)).agg(sum(col("__w")).as("__wv"))
    val cum = grain
      .withColumn("__cum", sum(col("__wv")).over(
        Window.partitionBy(col(groupCol)).orderBy(col(valueCol))))
      .withColumn("__tot", sum(col("__wv")).over(Window.partitionBy(col(groupCol))))
    cum.filter(col("__cum") * 2 >= col("__tot"))
      .groupBy(col(groupCol))
      .agg(min(col(valueCol)).as("wmedian"))
  }

  /** One-pass column profiler — per-column row/null/distinct counts plus
    * min/max (numeric columns numerically as double, string columns
    * lexicographically), in LONG form: one output row per profiled column.
    * The data-quality sweep a pipeline runs before trusting a new drop.
    *
    * Scale shape: one aggregate pass computes every per-column statistic
    * (count-distinct over k columns expands the map side k-fold — the
    * documented cost of an exact one-pass profile; swap in
    * approx_count_distinct at 100 TB if ±2 % is acceptable), producing a
    * SINGLE wide row that unpivots to the long report — the unpivot runs
    * on one row, not on data. */
  def profileColumns(df: DataFrame, numCols: Seq[String],
                     strCols: Seq[String]): DataFrame = {
    val aggs = numCols.flatMap { c => Seq(
      count(col(c)).as(s"${c}__n"),
      countDistinct(col(c)).as(s"${c}__d"),
      min(col(c)).cast("double").as(s"${c}__mn"),
      max(col(c)).cast("double").as(s"${c}__mx"))
    } ++ strCols.flatMap { c => Seq(
      count(col(c)).as(s"${c}__n"),
      countDistinct(col(c)).as(s"${c}__d"),
      min(col(c)).as(s"${c}__smn"),
      max(col(c)).as(s"${c}__smx"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = numCols.map { c =>
      struct(lit(c).as("col_name"), col(s"${c}__n").as("n_nonnull"),
        col(s"${c}__d").as("n_distinct"), col(s"${c}__mn").as("min_num"),
        col(s"${c}__mx").as("max_num"),
        lit(null).cast("string").as("min_str"),
        lit(null).cast("string").as("max_str"))
    } ++ strCols.map { c =>
      struct(lit(c).as("col_name"), col(s"${c}__n").as("n_nonnull"),
        col(s"${c}__d").as("n_distinct"),
        lit(null).cast("double").as("min_num"),
        lit(null).cast("double").as("max_num"),
        col(s"${c}__smn").as("min_str"), col(s"${c}__smx").as("max_str"))
    }
    wide.select(explode(array(rows: _*)).as("__r")).select(col("__r.*"))
  }

  /** Per-group EQUI-DEPTH histogram — B buckets of (approximately) equal
    * row count, the quantile-sketch profile that exposes skew an equi-width
    * histogram ([[histogramProfile]]) hides. Each distinct value lands in
    * the bucket of its cumulative START position, b = (cum−c)·B div total —
    * pure integer arithmetic, so bucket edges are engine-exact; ties stay
    * whole (a heavy value can overfill its bucket — the honest behavior,
    * since a value cannot straddle quantiles).
    *
    * Scale shape: rows collapse to the (group, value) distribution grain
    * first; the cumulative window runs over THAT (value-cardinality
    * bounded, partitioned by group — never a raw-row or global window). */
  def equiDepthHistogram(df: DataFrame, groupCol: String, valueCol: String,
                         buckets: Int): DataFrame = {
    require(buckets >= 1, "need at least one bucket")
    import org.apache.spark.sql.expressions.Window
    val grain = df.groupBy(col(groupCol), col(valueCol)).agg(count(lit(1)).as("__c"))
    grain
      .withColumn("__cum", sum(col("__c")).over(
        Window.partitionBy(col(groupCol)).orderBy(col(valueCol))))
      .withColumn("__tot", sum(col("__c")).over(Window.partitionBy(col(groupCol))))
      .withColumn("bucket",
        expr(s"((__cum - __c) * ${buckets}L) div __tot"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(sum(col("__c")).as("n_rows"),
        min(col(valueCol)).as("v_min"), max(col(valueCol)).as("v_max"))
  }

  /** Per-key ROLLING Pearson correlation — the windowed form of
    * [[exactCorr]]: for every row, r between x and y over the key's
    * trailing `windowDays` (micros-exact range frame). The drift detector
    * for paired signals (does quantity still track price this month?).
    *
    * Determinism: the six moments are EXACT decimal range-window sums, the
    * statistic one mirrored double tree rounded to 6 dp — engine-order
    * free, same discipline as exactCorr. Degenerate windows (either
    * variance ≤ 0) emit null r rather than dropping the row, so the output
    * grain stays the input grain. */
  def rollingCorr(df: DataFrame, keyCol: String, tsCol: String,
                  xCol: String, yCol: String, windowDays: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val micros = windowDays * 86400000000L
    // cast covers TIMESTAMP_NTZ sources (identity under the UTC session TZ)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(unix_micros(col(tsCol).cast("timestamp")))
      .rangeBetween(-micros, 0)
    val t = df.select(col("*"),
      col(xCol).cast("decimal(18,2)").as("__x"),
      col(yCol).cast("decimal(18,2)").as("__y"))
    val m = t
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__sx", sum(col("__x")).over(w))
      .withColumn("__sy", sum(col("__y")).over(w))
      .withColumn("__sxy", sum(col("__x") * col("__y")).over(w))
      .withColumn("__sxx", sum(col("__x") * col("__x")).over(w))
      .withColumn("__syy", sum(col("__y") * col("__y")).over(w))
    m.withColumn("__vx",
        col("__n").cast("double") * col("__sxx").cast("double") -
          col("__sx").cast("double") * col("__sx").cast("double"))
      .withColumn("__vy",
        col("__n").cast("double") * col("__syy").cast("double") -
          col("__sy").cast("double") * col("__sy").cast("double"))
      .withColumn("n_win", col("__n"))
      .withColumn("r",
        when(col("__vx") > 0 && col("__vy") > 0, round(
          (col("__n").cast("double") * col("__sxy").cast("double") -
            col("__sx").cast("double") * col("__sy").cast("double")) /
            sqrt(col("__vx") * col("__vy")), 6)))
      .drop("__x", "__y", "__n", "__sx", "__sy", "__sxy", "__sxx", "__syy",
        "__vx", "__vy")
  }

  /** Association rules over the co-purchase pair table — support,
    * confidence and lift for item→other rules with at least `minCo`
    * co-occurrences. Every statistic is ONE division of exact integer
    * counts (lift as the cross-product ratio n_co·N / n_item·n_other), so
    * the doubles are bit-identical across engines with NO rounding step —
    * the q166 lesson applied by construction.
    *
    * Scale shape: rides [[coPurchasePairs]]' bounded-by-basket-size pair
    * generation; item supports are one hash agg; the total-baskets row is
    * broadcast by nature. */
  def associationRules(baskets: DataFrame, basketCol: String, itemCol: String,
                       minCo: Long): DataFrame = {
    val b = baskets.select(col(basketCol).as("__ok"), col(itemCol).as("__item")).distinct()
    val pairs = b.join(b.select(col("__ok"), col("__item").as("__other")), Seq("__ok"))
      .filter(col("__item") < col("__other"))
      .groupBy(col("__item"), col("__other")).agg(count(lit(1)).as("n_co"))
      .filter(col("n_co") >= minCo)
    val sym = pairs.select(explode(array(
        struct(col("__item").as("item"), col("__other").as("other")),
        struct(col("__other").as("item"), col("__item").as("other")))).as("__p"),
        col("n_co"))
      .select(col("__p.item"), col("__p.other"), col("n_co"))
    val supp = b.groupBy(col("__item").as("item")).agg(count(lit(1)).as("n_item"))
    val tot = b.select(col("__ok")).distinct().agg(count(lit(1)).as("n_baskets"))
    sym
      .join(supp, Seq("item"))
      .join(supp.select(col("item").as("other"), col("n_item").as("n_other")),
        Seq("other"))
      .crossJoin(broadcast(tot))
      .select(col("item"), col("other"), col("n_co"),
        (col("n_co").cast("double") / col("n_baskets").cast("double")).as("support"),
        (col("n_co").cast("double") / col("n_item").cast("double")).as("confidence"),
        ((col("n_co") * col("n_baskets")).cast("double") /
          (col("n_item") * col("n_other")).cast("double")).as("lift"))
  }

  /** Per-key time-bucketed OHLC bars — open/high/low/close/volume per
    * `key × day`, the downsampling shape for dashboards and monitoring.
    * Open/close are the FIRST/LAST value under the total order (ts,
    * tieBreak) — two row_number flags folded in the same hash aggregate,
    * so the whole bar is one window pass + one agg over key-day partitions
    * (span-bounded, never global). */
  def ohlcBars(df: DataFrame, keyCol: String, tsCol: String,
               valueCol: String, tieBreak: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = df.withColumn("__day", to_date(col(tsCol)))
    val wA = Window.partitionBy(col(keyCol), col("__day"))
      .orderBy(col(tsCol).asc, tieBreak.asc)
    val wD = Window.partitionBy(col(keyCol), col("__day"))
      .orderBy(col(tsCol).desc, tieBreak.desc)
    t.withColumn("__ra", row_number().over(wA))
      .withColumn("__rd", row_number().over(wD))
      .groupBy(col(keyCol), col("__day").as("day"))
      .agg(
        max(when(col("__ra") === 1, col(valueCol))).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max(when(col("__rd") === 1, col(valueCol))).as("close"),
        count(lit(1)).as("n_events"))
  }

  /** Per-group Shannon entropy over a categorical column — corpus/feed
    * composition diagnostics (how mixed is each user's event stream, each
    * source's language mix). H = −Σ p·ln p with p = c/n; each term is
    * computed in the mirrored double tree, rounded to 6 dp, and summed as
    * EXACT decimal (the sourceKlDivergence discipline — engine-order-free).
    *
    * Scale shape: two hash aggregates over the (group, category) grain —
    * bounded by category cardinality per group, never a window. */
  def groupEntropy(df: DataFrame, groupCol: String, catCol: String): DataFrame = {
    val gc = df.groupBy(col(groupCol), col(catCol)).agg(count(lit(1)).as("__c"))
    val n = gc.groupBy(col(groupCol)).agg(sum(col("__c")).as("__n"))
    gc.join(n, Seq(groupCol))
      .withColumn("__term",
        round(-(col("__c").cast("double") / col("__n").cast("double")) *
          log(col("__c").cast("double") / col("__n").cast("double")), 6)
          .cast("decimal(18,6)"))
      .groupBy(col(groupCol))
      .agg(max(col("__n")).as("n_events"),
        countDistinct(col(catCol)).as("n_cats"),
        sum(col("__term")).cast("double").as("entropy"))
  }

  /** Peak concurrency per key — the max number of simultaneously open
    * half-open intervals [start, end), the capacity-planning primitive
    * (concurrent sessions, parallel jobs, open connections).
    *
    * Classic +1/−1 sweep: each interval emits a +1 at start and a −1 at
    * end; the running sum over (t asc, delta asc) is the concurrency
    * curve. Ordering −1 before +1 at equal t realizes the half-open
    * convention (an interval ending exactly when another starts does not
    * overlap it). Rows tied on (t, delta) get arbitrary relative order,
    * but the MAX of the running sum is order-independent: within a +1 run
    * the sum only rises (its end value covers the run), within a −1 run
    * it only falls (already covered by the preceding prefix).
    *
    * Scale shape: one union + one key-partitioned window + one hash agg —
    * per-key event counts bound the window, never global. */
  def maxConcurrent(df: DataFrame, keyCol: String, startCol: Column,
                    endCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val up = df.select(col(keyCol), startCol.as("__t"), lit(1L).as("__d"))
    val down = df.select(col(keyCol), endCol.as("__t"), lit(-1L).as("__d"))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__t").asc, col("__d").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    up.unionAll(down)
      .withColumn("__run", sum(col("__d")).over(w))
      .groupBy(col(keyCol))
      .agg(max(col("__run")).as("peak"))
  }

  /** ABC / Pareto classification — each key labeled A/B/C by its
    * cumulative share of the total (A = first 80% of value, B = to 95%,
    * C = tail) in (value desc, key asc) order; the inventory/corpus
    * triage primitive.
    *
    * Scale shape: the cumulative sum is a GLOBAL ordered prefix — the q10
    * anti-pattern if done as one window. This is the two-level distributed
    * prefix sum (the packSequences/q92 discipline) with RANGE partitioning
    * as the slicer: `repartitionByRange` on the sort key makes partitions
    * CONTIGUOUS in the total order by construction (the monotone-group
    * requirement), the local prefix runs per partition, and the
    * partition totals — at most `nGroups` rows by construction — get their
    * own exclusive prefix and broadcast back. Exact-decimal addition is
    * associative, so the two-level sum equals the global one bit-for-bit;
    * the 80/95 cuts are exact integer-multiply compares (no division,
    * no float thresholds). */
  def paretoClass(df: DataFrame, keyCol: String, valueCol: String,
                  nGroups: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    // Decimal inputs keep their NATIVE scale — a cast to a narrower scale
    // is a ROUNDING step whose half-rule differs per engine (HALF_UP vs
    // half-even, the q97 trap); only non-decimal inputs get a defining cast
    val (inScale, vExpr) = df.schema(valueCol).dataType match {
      case d: DecimalType => (d.scale, col(valueCol))
      case _ => (2, col(valueCol).cast("decimal(18,2)"))
    }
    val v = col("__v")
    // the ranged table feeds BOTH the local prefix and the group totals —
    // pin it once or Spark re-derives the whole upstream (scan + agg +
    // range exchange) per consumer: 3 fact passes at 100 TB
    val ranged = df
      .select(col(keyCol), vExpr.as("__v"))
      .repartitionByRange(nGroups, col("__v").desc, col(keyCol).asc)
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    ranged.count(): Unit
    val wLocal = Window.partitionBy(col("__pid"))
      .orderBy(v.desc, col(keyCol).asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val local = ranged.withColumn("__cum_local", sum(v).over(wLocal))
    val wPid = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // per-partition totals: ≤ nGroups rows BY CONSTRUCTION; the global
    // total re-aggregates THEM (exact decimal addition is associative),
    // never the fact again
    val offs = ranged.groupBy(col("__pid")).agg(sum(v).as("__ptot"))
      .withColumn("__off",
        coalesce(sum(col("__ptot")).over(wPid),
          lit(0).cast(DecimalType(38, inScale))))
      .withColumn("__total",
        sum(col("__ptot")).over(Window.partitionBy()))
      .select(col("__pid"), col("__off"), col("__total"))
    local.join(broadcast(offs), Seq("__pid"))
      .withColumn("__cum", col("__off") + col("__cum_local"))
      .select(col(keyCol), v.cast("double").as("value"),
        when(col("__cum") * 10 <= col("__total") * 8, "A")
          .when(col("__cum") * 100 <= col("__total") * 95, "B")
          .otherwise("C").as("abc_class"))
  }

  /** Rolling distinct count — for every OBSERVED (key, day), the number
    * of distinct categories seen in the trailing `windowDays` window (the
    * "distinct features used this week per account" diagnostic). Exact
    * sliding COUNT(DISTINCT) is not a window-function shape (no engine
    * allows DISTINCT in a frame); the distributed form is visibility
    * explosion: each (key, day, cat) observation stays visible for
    * `windowDays` days — a CONSTANT-factor explode — then one equi-join
    * against observed days and one count-distinct agg. No windows at all.
    *
    * Scale shape: explode factor is the window length (constant);
    * both join sides hash-partition on (key, day); the count-distinct
    * grain is bounded by per-key daily category diversity. */
  def rollingDistinct(df: DataFrame, keyCol: String, tsCol: String,
                      catCol: String, windowDays: Int): DataFrame = {
    require(windowDays >= 1, "window must be at least one day")
    val obs = df.select(col(keyCol).as("__k"), to_date(col(tsCol)).as("__day"),
      col(catCol).as("__c")).distinct()
    val vis = obs.select(col("__k"), col("__c"),
        explode(sequence(col("__day"), date_add(col("__day"), windowDays - 1)))
          .as("__vday"))
      .distinct()
    val days = obs.select(col("__k"), col("__day")).distinct()
    days.join(vis,
        days("__k") === vis("__k") && days("__day") === vis("__vday"))
      .groupBy(days("__k").as(keyCol), days("__day").as("day"))
      .agg(countDistinct(col("__c")).as("n_distinct"))
  }

  /** Per-group Gini coefficient over a nonnegative value column — the
    * inequality/concentration diagnostic (revenue concentration per
    * region, token-count skew per source).
    *
    * Sorted-rank identity: G = (2·Σ i·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ) with
    * i = 1-based rank in (x asc, tie asc) order. Numerator and denominator
    * are EXACT decimal·integer sums; the single final division runs on
    * bit-identical doubles (the one-division rule). Groups with all-zero
    * totals are excluded (0/0).
    *
    * Scale shape: one key-partitioned window (rank) + one hash agg. */
  def giniByGroup(df: DataFrame, groupCol: String, valueCol: String,
                  tieBreak: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol).asc, tieBreak.asc)
    df.withColumn("__i", row_number().over(w).cast("long"))
      .withColumn("__v", col(valueCol).cast("decimal(18,2)"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(col("__v")).as("__s"),
        sum(col("__v") * col("__i")).as("__s1"))
      .filter(col("__s") > 0)
      .select(col(groupCol), col("n"),
        col("__s").cast("double").as("total"),
        ((col("__s1") * 2 - col("__s") * (col("n") + 1)).cast("double") /
          (col("__s") * col("n")).cast("double")).as("gini"))
  }

  /** Per-group winsorized mean — the outlier-robust location estimate:
    * values clipped to the group's own [pLo, pHi] exact interpolated
    * percentiles, then averaged. Thresholds are rounded to 6 dp BEFORE
    * the clip compare (the scoreBandSample lesson: two engines'
    * interpolation can differ by one ulp, and a value AT the threshold
    * must clip the same way everywhere); clipped values sum as exact
    * decimals, ONE final division.
    *
    * Scale shape: one grouped percentile agg (bounded output), one hash
    * join back, one grouped mean — no windows. */
  def winsorizedMean(df: DataFrame, groupCol: String, valueCol: String,
                     pLo: Double, pHi: Double): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, "need 0 <= pLo < pHi <= 1")
    val cuts = df.groupBy(col(groupCol))
      .agg(expr(s"percentile($valueCol, array($pLo, $pHi))").as("__qs"))
      .select(col(groupCol),
        round(element_at(col("__qs"), 1), 6).as("__lo"),
        round(element_at(col("__qs"), 2), 6).as("__hi"))
    df.join(cuts, Seq(groupCol))
      .withColumn("__clip",
        least(greatest(col(valueCol).cast("double"), col("__lo")), col("__hi")))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        max(col("__lo")).as("p_lo"), max(col("__hi")).as("p_hi"),
        (sum(round(col("__clip"), 6).cast("decimal(18,6)")).cast("double") /
          count(lit(1)).cast("double")).as("winsorized_mean"))
  }

  /** Discrete Kaplan-Meier survival curve per group — time-to-event with
    * right censoring (churn, time-to-conversion, component lifetime):
    * S(t) = Π_{s ≤ t, event} (1 − d_s / r_s) over the observed duration
    * grid, r_t = subjects with duration ≥ t, d_t = events at t.
    *
    * Determinism: each factor enters as round(ln(1 − d/r), 6) summed as
    * EXACT decimal, survival = round(exp(Σ), 6) — the entropy/KL ln-sum
    * discipline, engine-order-free. A final point where d = r (everyone
    * left fails) yields survival 0 exactly, bypassing ln(0).
    *
    * Scale shape: subjects collapse to the (group, duration) grain first
    * (one hash agg); the cumulative runs in a GROUP-partitioned window
    * over that bounded grid, never over subjects. */
  def kaplanMeier(df: DataFrame, groupCol: String, durationCol: String,
                  eventCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grid = df
      .select(col(groupCol), col(durationCol).cast("long").as("__t"),
        col(eventCol).cast("int").as("__e"))
      .groupBy(col(groupCol), col("__t"))
      .agg(sum(col("__e")).cast("long").as("d"), count(lit(1)).as("__all"))
    val wAsc = Window.partitionBy(col(groupCol)).orderBy(col("__t").asc)
    val withRisk = grid
      .withColumn("r",
        sum(col("__all")).over(wAsc.rowsBetween(Window.currentRow,
          Window.unboundedFollowing)))
      .withColumn("__term",
        when(col("d") < col("r"),
          round(log(lit(1.0d) - col("d").cast("double") / col("r").cast("double")), 6)
            .cast("decimal(18,6)"))
          .otherwise(lit(0).cast("decimal(18,6)")))
    withRisk
      .withColumn("__cum",
        sum(col("__term")).over(wAsc.rowsBetween(Window.unboundedPreceding, 0)))
      .select(col(groupCol), col("__t").as("t"), col("d"), col("r"),
        when(col("d") === col("r"), lit(0.0d))
          .otherwise(round(exp(col("__cum").cast("double")), 6)).as("survival"))
  }

  /** Functional-dependency violation detector — the data-quality probe
    * "does LHS determine RHS?": emits one row per LHS group observed with
    * MORE than one distinct RHS value, with the violation extent (distinct
    * count) and a min/max example pair for the drill-down.
    *
    * Scale shape: one hash aggregate over the LHS grain (count-distinct
    * expands internally but stays keyed); no windows, no joins. */
  def fdViolations(df: DataFrame, lhs: Seq[String], rhs: String): DataFrame = {
    require(lhs.nonEmpty, "need at least one determinant column")
    df.groupBy(lhs.map(col): _*)
      .agg(countDistinct(col(rhs)).as("n_rhs"),
        count(lit(1)).as("n_rows"),
        min(col(rhs)).as("rhs_min"),
        max(col(rhs)).as("rhs_max"))
      .filter(col("n_rhs") > 1)
  }

  /** Autocorrelation of a (date, value) series at lags 1..`maxLag` — the
    * seasonality detector behind forecast-model selection (a weekly cycle
    * shows as a spike at lag 7). r_k = Σ(v_t−m)(v_{t+k}−m) / Σ(v_t−m)²
    * with the FULL-series mean m and variance, computed entirely from
    * exact-decimal cross moments (Σv, Σv², Σ v_t·v_{t+k}, and the lag-side
    * marginals Σv_t, Σv_{t+k} over matched pairs) expanded algebraically —
    * no double is ever summed, the q152/q141 discipline. Pairs match by
    * CALENDAR date (t+k days), so gaps shrink n_k rather than sliding the
    * alignment. Scale shape: one hash agg to the daily grain (bounded by
    * the date range), then a self-join per lag on the dimension-sized
    * daily table — corpus rows are touched once. */
  def acfByLag(daily: DataFrame, dateCol: String, valCol: String,
               maxLag: Int): DataFrame = {
    require(maxLag >= 1, "need at least one lag")
    // the daily series is dimension-sized (one row per calendar day) and
    // reused maxLag+1 times — pin it so the corpus-side aggregate that
    // produced it runs once, not once per lag
    val s = daily.select(col(dateCol).as("__d"), col(valCol).cast("decimal(18,2)").as("__v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val base = s.agg(
      count(lit(1)).as("n"),
      sum(col("__v")).as("__sv"),
      sum(col("__v") * col("__v")).as("__svv"))
    val lags = (1 to maxLag).map(k => (k, s.as("a").join(
        s.select(col("__d").as("__d2"), col("__v").as("__w")).as("b"),
        expr(s"date_add(__d, $k) = __d2"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("__v")).as("__spa"),
        sum(col("__w")).as("__spb"),
        sum(col("__v") * col("__w")).as("__spab"))
      .withColumn("lag", lit(k))))
    val pairs = lags.map(_._2).reduce(_.unionByName(_))
    pairs.crossJoin(broadcast(base))
      .withColumn("__m", col("__sv").cast("double") / col("n").cast("double"))
      // numerator: Σ v_t·v_{t+k} − m·Σv_t − m·Σv_{t+k} + n_k·m²
      .withColumn("__num",
        col("__spab").cast("double") -
          col("__m") * col("__spa").cast("double") -
          col("__m") * col("__spb").cast("double") +
          col("n_pairs").cast("double") * col("__m") * col("__m"))
      // denominator: full-series Σ(v−m)² = Σv² − n·m²
      .withColumn("__den",
        col("__svv").cast("double") -
          col("n").cast("double") * col("__m") * col("__m"))
      .filter(col("__den") > 0)
      .select(col("lag"), col("n_pairs"),
        (round(col("__num") / col("__den"), 6) + lit(0.0d)).as("acf"))
  }

  /** MASE — mean absolute scaled error of the seasonal-naive forecast
    * v̂_t = v_{t−season} against the naive-1 baseline |v_t − v_{t−1}|, the
    * scale-free forecast-quality metric (MASE < 1 ⇒ the seasonal model
    * beats carrying yesterday forward). Absolute differences of exact
    * decimals are exact decimals; each MAE is ONE final double division,
    * and the ratio one more — nothing double is ever summed. Calendar-date
    * joins (not row offsets) so series gaps shrink the pair count instead
    * of mis-aligning the forecast. Scale shape: daily-grain self-joins on
    * a dimension-sized series table, grouped per series key. */
  def maseSeasonalNaive(daily: DataFrame, keyCol: String, dateCol: String,
                        valCol: String, season: Int): DataFrame = {
    require(season >= 2, "season must be >= 2 (1 would equal the baseline)")
    // dimension-sized (key × day) series, reused by both lag joins — pin it
    val s = daily.select(col(keyCol).as("__k"), col(dateCol).as("__d"),
      col(valCol).cast("decimal(18,2)").as("__v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def lagJoin(k: Int) = s.as("a").join(
        s.select(col("__k").as("__k2"), col("__d").as("__d2"),
          col("__v").as("__w")).as("b"),
        col("__k") === col("__k2") && expr(s"date_add(__d, $k) = __d2"))
      .groupBy(col("__k").as(keyCol))
      .agg(count(lit(1)).as(s"n_$k"), sum(abs(col("__w") - col("__v"))).as(s"__sae_$k"))
    lagJoin(season).join(lagJoin(1), Seq(keyCol))
      .withColumn("__mae_s",
        col(s"__sae_$season").cast("double") / col(s"n_$season").cast("double"))
      .withColumn("__mae_1",
        col("__sae_1").cast("double") / col("n_1").cast("double"))
      .filter(col("__mae_1") > 0)
      .select(col(keyCol),
        col(s"n_$season").as("n_seasonal_pairs"),
        (round(col("__mae_s"), 6) + lit(0.0d)).as("mae_seasonal"),
        (round(col("__mae_1"), 6) + lit(0.0d)).as("mae_naive"),
        (round(col("__mae_s") / col("__mae_1"), 6) + lit(0.0d)).as("mase"))
  }

  /** Average ranks (midranks) of `valueCol` within each group, returned at
    * the (group, value) DISTRIBUTION grain as the INTEGER 2·rank (ties get
    * the mean of the positions they occupy, so 2·rank = 2·|{<v}| + c + 1 is
    * always a whole number — rank algebra stays exact end-to-end). The
    * shared primitive of the rank statistics below: correlation and U are
    * invariant to the affine 2r map, so no division ever happens before the
    * final statistic. Scale shape: the corpus collapses to the (group,
    * value) distribution table first (the q130 trick); the window runs over
    * THAT, bounded by value cardinality, never corpus-sized. */
  def midranks2(df: DataFrame, groupCol: String, valueCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dist = df.select(col(groupCol), valueCol.as("__v"))
      .groupBy(col(groupCol), col("__v")).agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    dist.withColumn("__cum", sum(col("__c")).over(w))
      .select(col(groupCol), col("__v"), col("__c"),
        (lit(2L) * (col("__cum") - col("__c")) + col("__c") + 1L).as("__r2"))
  }

  /** Spearman rank correlation per group — the monotone-association
    * measure that survives outliers and nonlinearity (use over q152's
    * Pearson when the question is "does y go up with x" rather than "is it
    * linear"). Pearson over midranks, computed with EXACT integer moments
    * of the doubled ranks (2r is integral even under ties; correlation is
    * affine-invariant so the doubling cancels) — sums go through
    * decimal(38,0) because Σ(2r)² reaches n³. One double sqrt+division at
    * the end, rounded, negative zero collapsed. Scale shape: two
    * distribution-table rank maps (bounded windows) + two hash joins back
    * to rows + one hash aggregate — no corpus-sized window, no RDD. */
  def spearmanRho(df: DataFrame, groupCol: String, xCol: Column,
                  yCol: Column): DataFrame = {
    val t = df.select(col(groupCol), xCol.as("__x"), yCol.as("__y"))
    val rx = midranks2(t, groupCol, col("__x"))
      .select(col(groupCol), col("__v").as("__x"), col("__r2").as("__rx"))
    val ry = midranks2(t, groupCol, col("__y"))
      .select(col(groupCol), col("__v").as("__y"), col("__r2").as("__ry"))
    val ranked = t.join(rx, Seq(groupCol, "__x")).join(ry, Seq(groupCol, "__y"))
    val B = "decimal(38,0)"
    val m = ranked.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n"),
      sum(col("__rx").cast(B)).as("__sx"),
      sum(col("__ry").cast(B)).as("__sy"),
      sum(col("__rx").cast(B) * col("__ry")).as("__sxy"),
      sum(col("__rx").cast(B) * col("__rx")).as("__sxx"),
      sum(col("__ry").cast(B) * col("__ry")).as("__syy"))
    m.withColumn("__vx",
        col("n").cast("double") * col("__sxx").cast("double") -
          col("__sx").cast("double") * col("__sx").cast("double"))
      .withColumn("__vy",
        col("n").cast("double") * col("__syy").cast("double") -
          col("__sy").cast("double") * col("__sy").cast("double"))
      .filter(col("__vx") > 0 && col("__vy") > 0)
      .select(col(groupCol), col("n"),
        (round((col("n").cast("double") * col("__sxy").cast("double") -
          col("__sx").cast("double") * col("__sy").cast("double")) /
          sqrt(col("__vx") * col("__vy")), 6) + lit(0.0d)).as("rho"))
  }

  /** Mann–Whitney U with normal approximation and tie-corrected variance —
    * the distribution-free two-sample test (the robust sibling of q206's
    * t-based A/B read: no normality assumption, rank-level only). U_A =
    * ΣrankA − n_A(n_A+1)/2 over the POOLED midranks; doubled-rank sums keep
    * every term integral until the final z. Tie correction Σ(t³−t) comes
    * off the pooled distribution table exactly. Scale shape: distribution-
    * table ranks (bounded window) + one hash join + one hash aggregate. */
  def mannWhitneyU(df: DataFrame, groupCol: String, armCol: Column,
                   valueCol: Column): DataFrame = {
    val t = df.select(col(groupCol), armCol.cast("int").as("__arm"),
      valueCol.as("__v"))
    val r = midranks2(t, groupCol, col("__v"))
      .select(col(groupCol), col("__v"), col("__r2"))
    val ties = t.groupBy(col(groupCol), col("__v")).agg(count(lit(1)).as("__t"))
      .groupBy(col(groupCol))
      .agg(sum(col("__t").cast("decimal(38,0)") * col("__t") * col("__t") -
        col("__t")).as("__tie3"))
    val B = "decimal(38,0)"
    val m = t.join(r, Seq(groupCol, "__v"))
      .groupBy(col(groupCol)).agg(
        count(lit(1)).as("n"),
        sum(col("__arm")).as("n_b"),
        sum(when(col("__arm") === 1, col("__r2").cast(B)).otherwise(lit(0L)))
          .as("__sr2b"))
      .withColumn("n_a", col("n") - col("n_b"))
    m.join(ties, Seq(groupCol))
      .filter(col("n_a") > 0 && col("n_b") > 0)
      // 2U_B = Σ2r_B − n_B(n_B+1): still integral
      .withColumn("__u2",
        col("__sr2b").cast("double") -
          col("n_b").cast("double") * (col("n_b").cast("double") + 1.0d))
      .withColumn("__mu", col("n_a").cast("double") * col("n_b").cast("double"))
      // Var U = n_a·n_b/12 · [(n+1) − Σ(t³−t)/(n(n−1))]
      .withColumn("__var",
        col("__mu") / 12.0d * ((col("n").cast("double") + 1.0d) -
          col("__tie3").cast("double") /
            (col("n").cast("double") * (col("n").cast("double") - 1.0d))))
      .filter(col("__var") > 0)
      .select(col(groupCol), col("n_a"), col("n_b"),
        (round(col("__u2") / 2.0d, 6) + lit(0.0d)).as("u_b"),
        (round((col("__u2") / 2.0d - col("__mu") / 2.0d) /
          sqrt(col("__var")), 6) + lit(0.0d)).as("z"))
  }

  /** Cramér's V — χ² normalized to [0,1] effect size so association
    * strength is comparable ACROSS contingency tables of different shape
    * (the "is this drift big" companion to q128's raw χ², which only says
    * "is it nonzero"). Reuses [[contingencyChi2]]'s per-cell contributions
    * (already rounded per term, the entropy discipline) and reduces them
    * with an exact decimal(18,6) sum; V = sqrt(χ²/(n·min(r−1,c−1))) is one
    * final double expression. Scale: the cell table is |rows|×|cols| —
    * dimension-sized by design. */
  def cramersV(df: DataFrame, rowCol: String, colCol: String): DataFrame = {
    // NOT built on contingencyChi2: that one reports only OBSERVED cells
    // (right for its per-cell display gate q128, wrong for a χ² total —
    // an empty cell still contributes e to the statistic). The full
    // rows×cols grid here is dimension-sized by construction.
    val obs = df.groupBy(col(rowCol), col(colCol)).agg(count(lit(1)).as("__o"))
    val rt = obs.groupBy(col(rowCol)).agg(sum(col("__o")).as("__r"))
    val ct = obs.groupBy(col(colCol)).agg(sum(col("__o")).as("__c"))
    val n = obs.agg(sum(col("__o")).as("__n"))
    val grid = rt.crossJoin(broadcast(ct)).crossJoin(broadcast(n))
      .join(obs, Seq(rowCol, colCol), "left")
      .withColumn("__e",
        col("__r").cast("double") * col("__c").cast("double") /
          col("__n").cast("double"))
      .withColumn("__od", coalesce(col("__o"), lit(0L)).cast("double"))
      .withColumn("__term", round(
        (col("__od") - col("__e")) * (col("__od") - col("__e")) / col("__e"), 6)
        .cast("decimal(18,6)"))
    grid.agg(
        max(col("__n")).as("n"),
        countDistinct(col(rowCol)).as("n_rows"),
        countDistinct(col(colCol)).as("n_cols"),
        sum(col("__term")).as("__chi2"))
      .withColumn("__dof",
        least(col("n_rows"), col("n_cols")).cast("double") - 1.0d)
      .filter(col("__dof") > 0)
      .select(col("n"), col("n_rows"), col("n_cols"),
        col("__chi2").cast("double").as("chi2"),
        (round(sqrt(col("__chi2").cast("double") /
          (col("n").cast("double") * col("__dof"))), 6) + lit(0.0d)).as("cramers_v"))
  }

  /** RFM (recency / frequency / monetary) quintile segmentation — the
    * classic customer-value grid. Each entity's three metrics (days since
    * last activity, activity count, exact-decimal spend) are bucketed
    * 1..5 against CORPUS quintile thresholds; the 3-digit `segment` code
    * (r·100 + f·10 + m) is the marketing-facing label.
    *
    * Deliberately NOT `ntile(5) OVER ()` — a global window is a
    * single-partition sort. Thresholds are ONE percentile-array aggregate
    * row, broadcast (the scoreBandSample shape); bucket assignment is a
    * pure per-row expression: q = 1 + |{thresholds strictly below the
    * value}| so ties fall to the lower bucket deterministically, and
    * thresholds are rounded to 6 dp before the compare (two engines'
    * linear interpolation can differ by 1 ulp — the established
    * cross-engine contract). Monetary is rounded to 2 dp on BOTH sides of
    * the compare for the same reason. */
  def rfmSegments(orders: DataFrame, keyCol: String, tsCol: String,
                  amountCol: String): DataFrame = {
    val per = orders.groupBy(col(keyCol)).agg(
      max(to_date(col(tsCol))).as("__last"),
      count(lit(1)).as("frequency"),
      sum(col(amountCol).cast("decimal(18,2)")).as("__spend"))
    val horizon = per.agg(max(col("__last")).as("__h"))
    val base = per.crossJoin(broadcast(horizon))
      .withColumn("recency_days", datediff(col("__h"), col("__last")).cast("long"))
      .withColumn("monetary", round(col("__spend").cast("double"), 2))
      .select(col(keyCol), col("recency_days"), col("frequency"), col("monetary"))
    val cuts = "0.2, 0.4, 0.6, 0.8"
    val th = base.agg(
      transform(expr(s"percentile(recency_days, array($cuts))"), t => round(t, 6)).as("__tr"),
      transform(expr(s"percentile(frequency, array($cuts))"), t => round(t, 6)).as("__tf"),
      transform(expr(s"percentile(monetary, array($cuts))"), t => round(t, 6)).as("__tm"))
    def bucket(v: Column, th: Column): Column =
      aggregate(th, lit(1), (acc, t) => acc + when(v > t, 1).otherwise(0))
    base.crossJoin(broadcast(th))
      .select(col(keyCol), col("recency_days"), col("frequency"), col("monetary"),
        bucket(col("recency_days").cast("double"), col("__tr")).as("r_q"),
        bucket(col("frequency").cast("double"), col("__tf")).as("f_q"),
        bucket(col("monetary"), col("__tm")).as("m_q"))
      .withColumn("segment",
        (col("r_q") * 100 + col("f_q") * 10 + col("m_q")).cast("long"))
  }

  /** Inter-arrival burstiness per group — mean gap and the Goh–Barabási
    * burstiness coefficient B = (σ−μ)/(σ+μ) over per-entity event gaps:
    * B→−1 is a metronome (periodic polling), B≈0 Poisson-random, B→+1
    * bursty (human/incident-driven) — the traffic-shape read behind
    * capacity planning and bot detection that a plain rate (q129) misses.
    * Gaps are exact integer microseconds; μ and the POPULATION σ come from
    * exact Σg/Σg² (decimal(38,0), since Σg² reaches n·gap²) — the q129
    * never-sum-doubles rule. One partitioned lag window (per entity) + one
    * hash aggregate. */
  def interarrivalStats(df: DataFrame, groupCol: String, entityCol: String,
                        tsCol: String, tieBreak: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol), col(entityCol))
      .orderBy(col(tsCol).asc, tieBreak.asc)
    val gaps = df
      .withColumn("__t", unix_micros(col(tsCol)))
      .withColumn("__g", col("__t") - lag(col("__t"), 1).over(w))
      .filter(col("__g").isNotNull)
    val B = "decimal(38,0)"
    gaps.groupBy(col(groupCol)).agg(
        count(lit(1)).as("n_gaps"),
        sum(col("__g").cast(B)).as("__sg"),
        sum(col("__g").cast(B) * col("__g")).as("__sgg"))
      .filter(col("n_gaps") > 1)
      .withColumn("__mu",
        col("__sg").cast("double") / col("n_gaps").cast("double"))
      // population σ = sqrt(n·Σg² − (Σg)²)/n, all from exact sums
      .withColumn("__sigma",
        sqrt(col("n_gaps").cast("double") * col("__sgg").cast("double") -
          col("__sg").cast("double") * col("__sg").cast("double")) /
          col("n_gaps").cast("double"))
      .filter(col("__sigma") + col("__mu") > 0)
      .select(col(groupCol), col("n_gaps"),
        (round(col("__mu") / 1e6d, 6) + lit(0.0d)).as("mean_gap_s"),
        (round(col("__sigma") / 1e6d, 6) + lit(0.0d)).as("sd_gap_s"),
        (round((col("__sigma") - col("__mu")) /
          (col("__sigma") + col("__mu")), 6) + lit(0.0d)).as("burstiness"))
  }

  /** Gumbel (EV-I) fit of block maxima by the method of moments — the
    * extreme-value read behind "what daily peak should next quarter
    * plan for": collapse to a daily grain, take each calendar block's
    * maximum, and fit β = s·√6/π, μ = m̄ − γ·β (γ = Euler–Mascheroni).
    * Block maxima and their Σv/Σv² are exact decimals; the sample std and
    * the two plug-in parameters are one final double expression each (the
    * q141 closed-form discipline — the oracle hardcodes the same γ
    * literal). Scale shape: corpus → daily hash agg → block-max hash agg
    * (calendar-bounded) → one moment row. */
  def gumbelBlockMaxima(daily: DataFrame, dateCol: String,
                        valCol: String): DataFrame = {
    val blocks = daily
      .groupBy(date_trunc("month", col(dateCol)).as("__blk"))
      .agg(max(col(valCol).cast("decimal(18,2)")).as("__mx"))
    blocks.agg(
        count(lit(1)).as("n_blocks"),
        sum(col("__mx")).as("__sv"),
        sum(col("__mx").cast("decimal(28,2)") * col("__mx")).as("__svv"))
      .filter(col("n_blocks") > 1)
      .withColumn("__mean",
        col("__sv").cast("double") / col("n_blocks").cast("double"))
      .withColumn("__sd",
        sqrt((col("n_blocks").cast("double") * col("__svv").cast("double") -
          col("__sv").cast("double") * col("__sv").cast("double")) /
          (col("n_blocks").cast("double") *
            (col("n_blocks").cast("double") - 1.0d))))
      .withColumn("__beta",
        col("__sd") * sqrt(lit(6.0d)) / lit(math.Pi))
      .select(col("n_blocks"),
        (round(col("__mean"), 6) + lit(0.0d)).as("block_max_mean"),
        (round(col("__sd"), 6) + lit(0.0d)).as("block_max_sd"),
        (round(col("__beta"), 6) + lit(0.0d)).as("gumbel_beta"),
        (round(col("__mean") - lit(0.5772156649015329d) * col("__beta"), 6)
          + lit(0.0d)).as("gumbel_mu"))
  }

  /** Single-split decision stump search — per feature, the threshold
    * minimizing weighted Gini impurity of the induced left/right label
    * split: the inner loop of greedy tree training (and the quickest "is
    * this feature predictive at all" read), expressed as the XGBoost-style
    * histogram pass. Candidate thresholds are the DISTINCT (bucketed)
    * feature values, so callers pass a pre-rounded feature column to bound
    * the grid; per-threshold class counts come from ONE cumulative window
    * over the (feature, value) distribution table — never a per-candidate
    * scan. Gini is a rational of exact integer counts evaluated once in
    * double; candidates rank on the ROUNDED impurity with the threshold as
    * tie-break (the cross-engine rank contract). Scale shape: one hash agg
    * to the candidate grid + a feature-partitioned window over it + top-1
    * per feature (WindowGroupLimit). */
  def giniStump(df: DataFrame, features: Seq[(String, Column)],
                label: Column): DataFrame = {
    require(features.nonEmpty, "need at least one candidate feature")
    import org.apache.spark.sql.expressions.Window
    val tagged = features.map { case (name, f) =>
      df.select(lit(name).as("feature"), f.cast("double").as("__v"),
        label.cast("int").as("__y"))
    }.reduce(_.unionByName(_))
    val dist = tagged.groupBy(col("feature"), col("__v"))
      .agg(count(lit(1)).as("__c"), sum(col("__y")).as("__a"))
    val tot = dist.groupBy(col("feature"))
      .agg(sum(col("__c")).as("__n"), sum(col("__a")).as("__at"))
    val w = Window.partitionBy(col("feature")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    def sq(c: Column): Column = c.cast("double") * c.cast("double")
    val cum = dist
      .withColumn("__nl", sum(col("__c")).over(w))
      .withColumn("__al", sum(col("__a")).over(w))
      .join(tot, Seq("feature"))
      .filter(col("__nl") < col("__n"))
      .withColumn("__nr", col("__n") - col("__nl"))
      .withColumn("__ar", col("__at") - col("__al"))
      .withColumn("__bl", col("__nl") - col("__al"))
      .withColumn("__br", col("__nr") - col("__ar"))
      .withColumn("__gini", round(
        (col("__nl").cast("double")
          - (sq(col("__al")) + sq(col("__bl"))) / col("__nl").cast("double")
          + col("__nr").cast("double")
          - (sq(col("__ar")) + sq(col("__br"))) / col("__nr").cast("double"))
          / col("__n").cast("double"), 6))
    val rank = Window.partitionBy(col("feature"))
      .orderBy(col("__gini").asc, col("__v").asc)
    cum.withColumn("__rn", row_number().over(rank))
      .filter(col("__rn") === 1)
      .select(col("feature"), col("__v").as("threshold"),
        (col("__gini") + lit(0.0d)).as("gini"),
        col("__nl").as("n_left"), col("__nr").as("n_right"),
        (round(col("__al").cast("double") / col("__nl").cast("double"), 6)
          + lit(0.0d)).as("pos_rate_left"),
        (round(col("__ar").cast("double") / col("__nr").cast("double"), 6)
          + lit(0.0d)).as("pos_rate_right"))
  }

  /** l-diversity audit — q217's k-anonymity sibling one level deeper: a
    * quasi-identifier group can be large (k-anonymous) yet expose its
    * members if nearly all share one SENSITIVE value. Reports, per QI
    * group, the group size, distinct-l, and ENTROPY-l (exp of the
    * sensitive-value entropy — the effective number of sensitive values,
    * robust to 99:1 skew that distinct-l misses), plus the pass flag
    * against `minL`. Entropy terms follow the q162 rounded-then-decimal-
    * summed discipline. Scale shape: two hash aggregates at the (QI,
    * sensitive) and QI grains — no windows, no driver state. */
  def lDiversityAudit(df: DataFrame, qiCols: Seq[String],
                      sensitiveCol: Column, minL: Int): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(minL >= 1, "minL must be positive")
    val qi = qiCols.map(col)
    val cell = df.groupBy(qi :+ sensitiveCol.as("__s"): _*)
      .agg(count(lit(1)).as("__c"))
    val totals = cell.groupBy(qi: _*).agg(sum(col("__c")).as("__n"))
    val g = cell.join(totals, qiCols)
      .withColumn("__term",
        round(-(col("__c").cast("double") / col("__n").cast("double")) *
          log(col("__c").cast("double") / col("__n").cast("double")), 6)
          .cast("decimal(18,6)"))
      .groupBy(qi: _*)
      .agg(max(col("__n")).as("n"),
        countDistinct(col("__s")).as("l_distinct"),
        sum(col("__term")).as("__ent"))
    g.select(qi :+ col("n") :+ col("l_distinct") :+
        (round(exp(col("__ent").cast("double")), 6) + lit(0.0d)).as("entropy_l") :+
        (col("l_distinct") >= minL).cast("int").as("diverse"): _*)
  }

  /** Distributed logistic regression by IRLS (Newton) — the GLM sibling of
    * q205's closed-form OLS and the representative "model training as
    * aggregation" primitive: each iteration is ONE map-side-combinable
    * aggregate over the corpus (gradient + upper-triangle Hessian of the
    * 2-feature-plus-intercept model), a 3×3 cofactor solve on the driver
    * (a bounded model fit, the kmeans-step precedent), and a broadcast of
    * the 3 updated coefficients — the exact shape that scales to 1000
    * executors because only 10 doubles cross the wire per round.
    *
    * Determinism (the q111 iterative discipline): per-row gradient/Hessian
    * terms are rounded to 6 dp THEN summed as exact decimals (raw-double Σ
    * is accumulation-order-dependent and iteration amplifies divergence);
    * each new coefficient is rounded to 8 dp (Spark `round` semantics —
    * BigDecimal HALF_UP — which the oracle's `round` matches) so every
    * round starts from an identical representable β in both engines. The
    * β=0 start makes iteration 1 exp-free (p = 0.5 exactly). */
  def logisticIrls(df: DataFrame, x1: Column, x2: Column, label: Column,
                   iters: Int = 3): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    // spread before the persist: a one-file source (events at bench
    // scale) would otherwise pin ONE cached partition and run every
    // round's 9-sum map side in a single task (the q509/q487 one-file-scan
    // lesson; no-op when the scan already has enough splits). Values are
    // unaffected — the per-term decimal(18,6) sums are exact, so partition
    // layout cannot change them.
    val feats = graft.Tables.spread(df.sparkSession,
        df.select(label.cast("int").as("y"),
          x1.cast("double").as("x1"), x2.cast("double").as("x2")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def r8(x: Double): Double =
      BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    def term(c: Column): Column = round(c, 6).cast("decimal(18,6)")
    var b0 = 0.0; var b1 = 0.0; var b2 = 0.0
    (1 to iters).foreach { _ =>
      val withP = feats
        .withColumn("p", lit(1.0d) / (lit(1.0d) +
          exp(-(lit(b0) + lit(b1) * col("x1") + lit(b2) * col("x2")))))
        .withColumn("w", col("p") * (lit(1.0d) - col("p")))
      val r = withP.agg(
        sum(term(col("y") - col("p"))).cast("double").as("g0"),
        sum(term((col("y") - col("p")) * col("x1"))).cast("double").as("g1"),
        sum(term((col("y") - col("p")) * col("x2"))).cast("double").as("g2"),
        sum(term(col("w"))).cast("double").as("h00"),
        sum(term(col("w") * col("x1"))).cast("double").as("h01"),
        sum(term(col("w") * col("x2"))).cast("double").as("h02"),
        sum(term(col("w") * col("x1") * col("x1"))).cast("double").as("h11"),
        sum(term(col("w") * col("x1") * col("x2"))).cast("double").as("h12"),
        sum(term(col("w") * col("x2") * col("x2"))).cast("double").as("h22")
      ).head()
      val Seq(g0, g1, g2, h00, h01, h02, h11, h12, h22) =
        (0 until 9).map(r.getDouble)
      // symmetric 3×3 cofactor solve — the SAME expression text as the
      // oracle so the IEEE operation sequence is identical
      val cA = h11 * h22 - h12 * h12
      val cB = h02 * h12 - h01 * h22
      val cC = h01 * h12 - h02 * h11
      val cD = h00 * h22 - h02 * h02
      val cE = h01 * h02 - h00 * h12
      val cF = h00 * h11 - h01 * h01
      val det = h00 * cA + h01 * cB + h02 * cC
      require(det != 0.0 && !det.isNaN,
        "singular Hessian: features are collinear (or constant) — " +
          "the 3-parameter model is unidentifiable on this data")
      b0 = r8(b0 + (cA * g0 + cB * g1 + cC * g2) / det)
      b1 = r8(b1 + (cB * g0 + cD * g1 + cE * g2) / det)
      b2 = r8(b2 + (cC * g0 + cE * g1 + cF * g2) / det)
    }
    feats
      .withColumn("p", lit(1.0d) / (lit(1.0d) +
        exp(-(lit(b0) + lit(b1) * col("x1") + lit(b2) * col("x2")))))
      .agg(count(lit(1)).as("n"),
        sum(term(col("y") * log(col("p")) +
          (lit(1) - col("y")) * log(lit(1.0d) - col("p"))))
          .cast("double").as("__ll"))
      .select(col("n"), lit(iters).as("iters"),
        (lit(b0) + lit(0.0d)).as("b0"),
        (lit(b1) + lit(0.0d)).as("b1"),
        (lit(b2) + lit(0.0d)).as("b2"),
        (round(col("__ll"), 6) + lit(0.0d)).as("log_likelihood"))
  }

  /** Floor-at-zero running balance — inventory/credit semantics where the
    * balance cannot go negative (you can't ship stock you don't have):
    * s_i = max(0, s_{i−1} + δ_i). Looks like an inherently sequential
    * recurrence, but it has the closed form s_i = P_i − min(0, min_{j≤i}
    * P_j) over the RAW prefix sums P — so the whole computation is two
    * stacked key-partitioned windows (running sum, running min), fully
    * distributed, no sequential scan and no driver state. Deltas are
    * exact integers end-to-end. Returns one row per key with the final
    * clamped balance, the total absorbed shortfall (demand lost to the
    * floor), and the raw net for comparison. */
  def clampedBalance(df: DataFrame, keyCol: String, tsCol: String,
                     deltaCol: Column, tieBreak: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, tieBreak.asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val run = df
      .withColumn("__d", deltaCol.cast("long"))
      .withColumn("__p", sum(col("__d")).over(w))
    // the final prefix IS the group total and the final running-min IS the
    // group-wide min of prefixes — so the reduction is a plain hash agg,
    // no order-sensitive `last()` anywhere
    run.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(col("__d")).as("net_raw"),
        min(col("__p")).as("__minp"))
      .select(col(keyCol), col("n"), col("net_raw"),
        (col("net_raw") - least(lit(0L), col("__minp"))).as("balance"),
        (-least(lit(0L), col("__minp"))).as("absorbed_shortfall"))
  }

  /** Geometric and harmonic means per group — the right central tendencies
    * for ratio/rate data (growth factors average geometrically; rates
    * average harmonically), both over strictly positive values. Per-row
    * transforms (ln v, 1/v) are rounded THEN summed as exact decimals (the
    * q162 entropy discipline — never sum raw doubles across engines); the
    * final exp/division is one double expression. Scale: one hash
    * aggregate, map-side combinable. */
  def logMeans(df: DataFrame, groupCol: String, valueCol: Column): DataFrame = {
    val t = df.select(col(groupCol), valueCol.cast("double").as("__v"))
      .filter(col("__v") > 0)
    t.groupBy(col(groupCol)).agg(
        count(lit(1)).as("n"),
        sum(round(log(col("__v")), 6).cast("decimal(18,6)")).as("__slog"),
        sum(round(lit(1.0d) / col("__v"), 9).cast("decimal(18,9)")).as("__sinv"))
      .filter(col("__sinv") > 0)
      .select(col(groupCol), col("n"),
        (round(exp(col("__slog").cast("double") / col("n").cast("double")), 6)
          + lit(0.0d)).as("geo_mean"),
        (round(col("n").cast("double") / col("__sinv").cast("double"), 6)
          + lit(0.0d)).as("harmonic_mean"))
  }

  /** Sign-split half-away-from-zero 6-dp rounding: `floor(x·1e6 + 0.5)/1e6`
    * mirrored for negatives. The q370 rule: Spark's `round()` rounds the
    * double's SHORTEST-decimal rendering while DuckDB `round()` rounds the
    * binary value, and a value landing ~1e-16 from a 6-dp midpoint flips
    * between them (q492's round-7 hash red was exactly one such cell).
    * This formula is the same IEEE op sequence (abs-side mul, add, floor,
    * div) in both engines, so a mirrored oracle writing the identical
    * expression reproduces every bit. */
  private[graft] def halfAway6(x: Double): Double =
    if (x >= 0) math.floor(x * 1000000.0 + 0.5) / 1000000.0
    else -math.floor(-x * 1000000.0 + 0.5) / 1000000.0

  /** The Holt level/trend recursion
    *
    *   l_t = α·y_t + (1−α)(l_{t−1} + b_{t−1})
    *   b_t = β(l_t − l_{t−1}) + (1−β)·b_{t−1}
    *
    * shared by [[holtSmooth]] and [[holtSmoothByKey]] — ONE step
    * implementation so the single-series and per-key forms cannot drift
    * numerically (round-7 verdict item 4). Every step — and the one-step
    * forecast l+b — is rounded with the mirrored half-away floor
    * [[halfAway6]]. Returns (level, trend, forecast) aligned with the
    * input series; requires ≥ 2 points (the trend initializes from the
    * first difference). */
  private[graft] def holtSteps(ys: Array[Double], alpha: Double,
                               beta: Double): Array[(Double, Double, Double)] = {
    require(ys.length >= 2, "Holt smoothing needs at least 2 points")
    // complements via DECIMAL subtraction of the shortest representation:
    // IEEE `1.0 - 0.3` is 0.7000000000000001, NOT the double literal 0.7
    // a mirrored oracle writes — BigDecimal.valueOf(0.3) is the decimal
    // "0.3", so 1 − it round-trips to the exact literal 0.7
    val ca = (BigDecimal(1) - BigDecimal.valueOf(alpha)).toDouble
    val cb = (BigDecimal(1) - BigDecimal.valueOf(beta)).toDouble
    val out = new Array[(Double, Double, Double)](ys.length)
    var lev = halfAway6(ys(0))
    var tr = halfAway6(ys(1) - ys(0))
    out(0) = (lev, tr, halfAway6(lev + tr))
    var i = 1
    while (i < ys.length) {
      val l2 = halfAway6(alpha * ys(i) + ca * (lev + tr))
      val t2 = halfAway6(beta * (l2 - lev) + cb * tr)
      lev = l2; tr = t2
      out(i) = (lev, tr, halfAway6(lev + tr))
      i += 1
    }
    out
  }

  /** Holt linear (double-exponential) smoothing over a BOUNDED series —
    * the library form of gate q339. The input is collected (bounded model
    * fit, the q332 precedent: the caller aggregates the corpus to a
    * bounded grain first) and the recursion runs via the shared
    * [[holtSteps]] core (identical numerics to [[holtSmoothByKey]]).
    * Output: one row per input point with the smoothed level, trend and
    * one-step forecast.
    *
    * Ordering is by `orderCol` ascending; requires ≥ 2 rows (the trend
    * initializes from the first difference). */
  def holtSmooth(series: DataFrame, orderCol: String, valueCol: String,
                 alpha: Double = 0.3, beta: Double = 0.2): DataFrame = {
    require(alpha > 0 && alpha < 1 && beta > 0 && beta < 1,
      "alpha/beta must be in (0,1)")
    val rows = series
      .select(col(orderCol).cast("date").as("__m"),
        col(valueCol).cast("double").as("__y"))
      .orderBy(col("__m"))
      .collect()
      .map(r => (r.getDate(0), r.getDouble(1)))
    val steps = holtSteps(rows.map(_._2), alpha, beta)
    val out = rows.zip(steps).map { case ((m, y), (lev, tr, fc)) =>
      (m, y, lev, tr, fc)
    }
    val spark = series.sparkSession
    import spark.implicits._
    out.toSeq.toDF("__m", "__y", "__lev", "__tr", "__fc")
      .select(col("__m").as(orderCol), col("__y").as(valueCol),
        col("__lev").as("smooth_level"), col("__tr").as("smooth_trend"),
        col("__fc").as("forecast_next"))
  }

  /** Per-key EXECUTOR-SIDE Holt smoothing — the "smooth every key's series"
    * shape a 100 TB user actually wants (the round-6 verdict's item on
    * [[holtSmooth]]'s driver-side collect): the same level/trend recursion,
    * run independently for every key inside `flatMapGroups`, so the corpus
    * shuffles ONCE on the key and no series row ever reaches the driver.
    * Each key's series must be span-bounded (callers aggregate to a
    * day/month grain first — the recursion buffers one key's points, not
    * the corpus); keys with < 2 points are dropped (the trend initializes
    * from the first difference). Key is carried as STRING; the recursion
    * is the shared [[holtSteps]] core (half-away-floor 6-dp steps), so a
    * per-key recursive-CTE oracle writing the identical
    * `floor(x·1e6 + 0.5)/1e6` expression reproduces it lockstep and the
    * two library forms cannot drift. */
  def holtSmoothByKey(series: DataFrame, keyCol: String, orderCol: String,
                      valueCol: String, alpha: Double = 0.3,
                      beta: Double = 0.2): DataFrame = {
    require(alpha > 0 && alpha < 1 && beta > 0 && beta < 1,
      "alpha/beta must be in (0,1)")
    val spark = series.sparkSession
    import spark.implicits._
    series
      .select(col(keyCol).cast("string").as("__k"),
        col(orderCol).cast("date").as("__m"),
        col(valueCol).cast("double").as("__y"))
      .as[(String, java.sql.Date, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (k: String, it: Iterator[(String, java.sql.Date, Double)]) =>
        val rows = it.toArray.sortBy(_._2.getTime) // span-bounded per key
        if (rows.length < 2) Iterator.empty
        else {
          val steps = holtSteps(rows.map(_._3), alpha, beta)
          rows.iterator.zip(steps.iterator).map {
            case ((_, m, y), (lev, tr, fc)) => (k, m, y, lev, tr, fc)
          }
        }
      }
      .toDF("__k", "__m", "__y", "__lev", "__tr", "__fc")
      .select(col("__k").as(keyCol), col("__m").as(orderCol),
        col("__y").as(valueCol),
        col("__lev").as("smooth_level"), col("__tr").as("smooth_trend"),
        col("__fc").as("forecast_next"))
  }
}
