package graft

import org.apache.spark.sql.functions._

/** Invariants for the SQL-surface + text-hygiene wave (q462–q465). */
class Wave17Spec extends SparkSuite {

  test("q462 variable threshold splits orders exactly") {
    val total = Tables.orders(spark, sf).count()
    val above = SparkEntry.queries("q462_session_variable")(spark, sf)
      .agg(sum("n_above")).collect()(0).getLong(0)
    // the threshold is the floored mean, so both sides are non-empty
    // and partition the table
    assert(above > 0 && above < total)
    val thr = spark.sql("SELECT thr_cents").collect()(0).getLong(0)
    val below = Tables.orders(spark, sf)
      .filter((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long") <= thr).count()
    assert(above + below == total)
  }

  test("q463 EXECUTE IMMEDIATE matches the classic statement") {
    Tables.registerAll(spark, sf)
    val classic = spark.sql(
      """SELECT o_orderpriority, count(*) AS n
         FROM orders
         WHERE o_orderdate >= DATE '1998-01-01'
           AND o_orderdate < DATE '1999-01-01'
         GROUP BY o_orderpriority""")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val dyn = SparkEntry.queries("q463_execute_immediate")(spark, sf)
      .select("o_orderpriority", "n")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(dyn == classic)
  }

  test("q464 try_divide nulls exactly the zero-discount rows") {
    val row = SparkEntry.queries("q464_try_arithmetic")(spark, sf)
      .collect()(0)
    val zeros = Tables.lineitem(spark, sf)
      .filter(col("l_discount") === 0.0).count()
    assert(row.getLong(1) == zeros)
    assert(row.getLong(0) == row.getLong(1) + row.getLong(2))
  }

  test("q466 transformWithState running count survives re-chunking") {
    import org.apache.spark.sql.expressions.Window
    val batch = Tables.events(spark, sf)
      .withColumn("running_n", row_number().over(
        Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .cast("long"))
      .select("user_id", "event_id", "running_n")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    // a different chunking must not change the running numbers: state
    // carries across micro-batches, so the count never restarts
    val streamed = graft.streaming.Streams.replayedRunningCount(
      spark, Tables.events(spark, sf), chunks = 5, name = "rc_spec")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(streamed == batch)
  }

  test("q467 timer sessions survive re-chunking") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val batch = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("new_s", when(lag("us", 1).over(w).isNull ||
        col("us") - lag("us", 1).over(w) > 1800000000L, 1L).otherwise(0L))
      .withColumn("sid", sum("new_s").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(min("us").as("s"), max("us").as("e"), count(lit(1)).as("n"))
      .select("user_id", "s", "e", "n")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val streamed = graft.streaming.Streams.replayedSessionTimers(
      spark, Tables.events(spark, sf), chunks = 5, name = "st_spec")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(streamed == batch)
  }

  test("q484 join hints steer the physical plan without changing answers") {
    Tables.registerAll(spark, sf)
    val broadcastPlan = spark.sql(
      """SELECT /*+ BROADCAST(nation) */ n_name, count(*) AS n
         FROM supplier JOIN nation ON s_nationkey = n_nationkey
         GROUP BY n_name""").queryExecution.executedPlan.toString
    assert(broadcastPlan.contains("BroadcastHashJoin"))
    val shuffleHashPlan = spark.sql(
      """SELECT /*+ SHUFFLE_HASH(nation) */ n_name, count(*) AS n
         FROM supplier JOIN nation ON s_nationkey = n_nationkey
         GROUP BY n_name""").queryExecution.executedPlan.toString
    assert(shuffleHashPlan.contains("ShuffledHashJoin"))
    val rebalancePlan = spark.sql(
      """SELECT /*+ REBALANCE */ s_suppkey FROM supplier""")
      .queryExecution.optimizedPlan.toString
    assert(rebalancePlan.contains("RebalancePartitions"))
    // and the hinted gate answers exactly like the plain join
    val hinted = SparkEntry.queries("q484_join_hints")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val plain = spark.sql(
      """SELECT n_name, count(*) AS n
         FROM supplier JOIN nation ON s_nationkey = n_nationkey
         GROUP BY n_name""")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(hinted == plain)
  }

  test("q465 skeleton merges every spoofed variant and nothing else") {
    val n = Tables.customer(spark, sf).count()
    val row = SparkEntry.queries("q465_homoglyph_skeleton")(spark, sf)
      .collect()(0)
    assert(row.getLong(0) == 2 * n)          // clean + variant per row
    assert(row.getLong(1) == 2 * n)          // every variant is distinct
    assert(row.getLong(2) == n)              // skeletons collapse pairwise
    assert(row.getLong(3) == n)              // every variant was spoofed
    assert(row.getLong(4) == n)              // merged = exactly the spoofs
  }
}
