package graft

import org.apache.spark.sql.functions._

/** The native as-of join vertical (AsofJoinNode/Strategy/Exec): result
  * parity with the union+window rewrite, null semantics, the physical
  * plan shape, and the pass-through partitioning contract. */
class AsofNativeSpec extends SparkSuite {

  private def evRates = {
    val ev = Tables.events(spark, sf).select(col("event_id"),
      (col("user_id") % 25).as("k"),
      date_trunc("second", col("ts")).as("ets"))
    val rates = Tables.nation(spark, sf)
      .select(col("n_nationkey").as("k"),
        explode(sequence(lit(0), lit(29))).as("d"))
      .select(col("k"),
        to_timestamp(date_add(lit("2024-01-01").cast("date"), col("d")))
          .as("eff"),
        (((col("k") * 31 + col("d") * 7) % 100).cast("double") / 10)
          .as("rate"))
    (ev, rates)
  }

  test("native as-of equals the union+window rewrite row for row") {
    val (ev, rates) = evRates
    def key(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).sortBy(_._1).toSeq
    val native = key(operators.Joins
      .asofJoinNative(ev, rates, "k", "ets", "eff", Seq("rate"))
      .select("event_id", "k", "asof_rate").collect())
    val rewrite = key(operators.Joins
      .asofJoin(ev, rates, "k", "ets", "eff", Seq("rate"))
      .select("event_id", "k", "asof_rate").collect())
    assert(native == rewrite && native.nonEmpty)
  }

  test("left rows before any right version keep null payload") {
    import spark.implicits._
    val l = Seq((1L, 5L, 10L), (2L, 5L, 100L), (3L, 7L, 50L))
      .toDF("id", "k", "t")
    val r = Seq((5L, 20L, 1.5), (5L, 90L, 2.5), (6L, 10L, 9.9))
      .toDF("k", "t", "v")
    val out = operators.Joins.asofJoinNative(l, r, "k", "t", "t", Seq("v"))
      .select("id", "asof_v").collect()
      .map(x => x.getLong(0) ->
        (if (x.isNullAt(1)) None else Some(x.getDouble(1)))).toMap
    assert(out(1L).isEmpty)        // t=10 before first version at 20
    assert(out(2L).contains(2.5))  // t=100 sees the t=90 version
    assert(out(3L).isEmpty)        // key 7 has no versions at all
  }

  test("ties on (key, time) resolve to the greatest payload (both impls)") {
    import spark.implicits._
    val l = Seq((1L, 5L, 30L)).toDF("id", "k", "t")
    val r = Seq((5L, 30L, 1.0), (5L, 30L, 7.0), (5L, 30L, 4.0))
      .toDF("k", "t", "v")
    val n = operators.Joins.asofJoinNative(l, r, "k", "t", "t", Seq("v"))
      .select("asof_v").collect()(0).getDouble(0)
    val w = operators.Joins.asofJoin(l, r, "k", "t", "t", Seq("v"))
      .select("asof_v").collect()(0).getDouble(0)
    assert(n == 7.0 && w == 7.0)
  }

  test("parity holds with AQE disabled (type-widening regression)") {
    // the original bug: bigint left key vs int right key hash-partition
    // DIFFERENTLY (Murmur3 over 8 vs 4 bytes) and the co-partitions
    // mispair; AQE-on runs coalesced the tiny shuffles to one partition
    // and masked it. evRates has exactly that type mismatch.
    val old = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val (ev, rates) = evRates
      val native = operators.Joins
        .asofJoinNative(ev, rates, "k", "ets", "eff", Seq("rate"))
        .select("event_id", "asof_rate").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      val rewrite = operators.Joins
        .asofJoin(ev, rates, "k", "ets", "eff", Seq("rate"))
        .select("event_id", "asof_rate").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      assert(native == rewrite)
    } finally spark.conf.set("spark.sql.adaptive.enabled", old)
  }

  test("physical plan uses AsofJoinExec and passes partitioning through") {
    val (ev, rates) = evRates
    val joinedAgg = operators.Joins
      .asofJoinNative(ev, rates, "k", "ets", "eff", Seq("rate"))
      .groupBy(col("k")).agg(count(lit(1)).as("n"))
    joinedAgg.collect()
    def flatten(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] =
      p +: (p.children ++ (p match {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          Seq(q.plan)
        case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case _ => Seq.empty
      })).flatMap(flatten)
    val nodes = flatten(joinedAgg.queryExecution.executedPlan)
    assert(nodes.exists(_.isInstanceOf[graft.plans.AsofJoinExec]))
    // pass-through contract: no exchange BETWEEN the as-of join and the
    // downstream aggregate on the same key (the join's output partitioning
    // already satisfies the aggregate's requirement)
    val asofIdx = nodes.indexWhere(_.isInstanceOf[graft.plans.AsofJoinExec])
    val above = nodes.take(asofIdx)
    val exchangesAbove = above.count(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange
        .ShuffleExchangeExec])
    assert(exchangesAbove == 0,
      s"expected no shuffle between AsofJoinExec and the aggregate:\n${joinedAgg.queryExecution.executedPlan}")
  }
}
