package graft

import org.apache.spark.sql.functions._
import graft.operators.Joins
import graft.sources.Sources

/** Scale-layout techniques: bucketed co-located joins (shuffle paid at
  * write time, not per query) and deterministic skew salting. */
class ScaleLayoutSpec extends SparkSuite {
  import spark.implicits._

  test("bucketed tables join with no Exchange on either side") {
    val orders = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
    val cust = Tables.customer(spark, sf).select("c_custkey", "c_name")
      .withColumnRenamed("c_custkey", "o_custkey")
    Sources.writeBucketed(orders, "b_orders", 8, Seq("o_custkey"))
    Sources.writeBucketed(cust, "b_cust", 8, Seq("o_custkey"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // force a sort-merge join so the assertion is about bucketing, not a
      // broadcast; AQE off so the executed plan is the static one
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = spark.table("b_orders").join(spark.table("b_cust"), "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      // and the result equals the plain (shuffled) join
      val expected = orders.join(cust, "o_custkey").count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_cust")
    }
  }

  test("saltedJoin returns exactly the unsalted join result on skewed data") {
    // 10k rows of one hot key + a uniform tail, joined to a small dim
    val fact = ((1 to 10000).map(i => (1L, i.toLong)) ++
      (1 to 500).map(i => ((i % 50 + 2).toLong, i.toLong)))
      .toDF("k", "row_id")
    val dim = (1L to 60L).map(k => (k, s"name_$k")).toDF("k", "name")
    val plain = fact.join(dim, Seq("k")).select("k", "row_id", "name")
      .as[(Long, Long, String)].collect().sorted
    val salted = Joins.saltedJoin(fact, dim, "k", col("row_id"), buckets = 8)
      .select("k", "row_id", "name")
      .as[(Long, Long, String)].collect().sorted
    assert(salted.length == plain.length && salted.sameElements(plain))
    // outer sides survive salting too: keys absent from dim keep null rows
    val leftOuter = Joins.saltedJoin(fact.withColumn("k", col("k") + 100),
      dim, "k", col("row_id"), buckets = 4, how = "left_outer")
    assert(leftOuter.filter(col("name").isNull).count() == fact.count())
  }

  test("partitioned layout prunes partitions at the scan (PartitionFilters)") {
    // the date/source-partitioned layout for 100 TB fact tables: a filter on
    // the partition column must prune directories at planning time, not scan
    // and discard rows
    val dir = java.nio.file.Files.createTempDirectory("part_layout").toString
    val events = Tables.events(spark, sf).select("event_id", "event_type", "value")
    Sources.appendParquet(events, dir, partitionCols = Seq("event_type"))
    val read = spark.read.parquet(dir).filter(col("event_type") === "click")
    read.count() // finalize AQE
    val scan = read.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("event_type"), s"partition filter not pushed:\n$scan")
    // the pruned read returns exactly the filtered rows
    assert(read.count() == events.filter(col("event_type") === "click").count())
    // only the matching partition directory is read
    assert(scan.contains("PartitionFilters: [isnotnull(event_type") ||
      !scan.contains("PushedFilters: [IsNotNull(event_type)"),
      s"expected the predicate at the partition layer, not the data layer:\n$scan")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("dim-filtered join dynamically prunes fact partitions (DPP)") {
    // the 100 TB star-join shape: the fact table is partitioned on the join
    // key's column; a selective dim filter must prune fact DIRECTORIES at
    // runtime (dynamic partition pruning), not stream the whole fact
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dpp_layout").toString
    val events = Tables.events(spark, sf)
      .select("event_id", "event_type", "value")
    Sources.appendParquet(events, dir, partitionCols = Seq("event_type"))
    // the dim must be a REAL source (parquet), not a LocalRelation: Catalyst
    // constant-folds a filter over literal rows away, and with no surviving
    // selective Filter node the PartitionPruning rule has nothing to hook
    val dimDir = java.nio.file.Files.createTempDirectory("dpp_dim").toString
    Seq(("click", "interactive"), ("view", "passive"))
      .toDF("event_type", "grp").write.mode("overwrite").parquet(dimDir)
    val joined = spark.read.parquet(dir)
      .join(spark.read.parquet(dimDir).filter(col("grp") === "interactive"),
        Seq("event_type"))
    joined.count() // finalize AQE so the executed plan is real
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamicpruning partition filter on the fact scan:\n$plan")
    assert(joined.count() ==
      events.filter(col("event_type") === "click").count())
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dimDir))
  }
}
