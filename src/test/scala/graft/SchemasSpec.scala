package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Relational => R}

class SchemasSpec extends SparkSuite {
  import spark.implicits._

  test("applyDefaults fills only null/missing columns (DDL DEFAULT analog)") {
    val df = Seq(("k1", null.asInstanceOf[String]), ("k2", "existing-id"))
      .toDF("name", "id")
    val out = Schemas.applyDefaults(df, Schemas.insertDefaults)
    val ids = out.select("name", "id").as[(String, String)].collect().toMap
    assert(ids("k2") == "existing-id")
    assert(ids("k1") != null && ids("k1").matches(R.UuidRe))
    assert(out.columns.contains("created_at") && out.columns.contains("updated_at"))
    assert(out.filter(col("created_at").isNull).count() == 0)
  }

  test("CHECK predicates quarantine constraint violations (init.sql:66)") {
    val tasks = Seq(
      ("t1", 5, 0.5, "pending"),
      ("t2", 11, 0.5, "pending"),   // priority out of range
      ("t3", 5, 1.5, "pending"),    // progress out of range
      ("t4", 5, 0.5, "unknown")     // status outside enum
    ).toDF("id", "priority", "progress", "status")
    val (ok, bad) = R.quarantine(tasks, Schemas.taskChecks)
    assert(ok.select("id").as[String].collect().toSeq == Seq("t1"))
    assert(bad.count() == 3)
  }

  test("CHECK boundaries accepted exactly (priority 1/10, progress 0/1)") {
    // FIXTURES.md edge cases: boundary values must pass, one-past must fail.
    val tasks = Seq(
      ("lo", 1, 0.0, "pending"), ("hi", 10, 1.0, "completed"),
      ("under", 0, 0.0, "pending"), ("over", 10, 1.0000001, "pending")
    ).toDF("id", "priority", "progress", "status")
    val (ok, bad) = R.quarantine(tasks, Schemas.taskChecks)
    assert(ok.select("id").as[String].collect().toSet == Set("lo", "hi"))
    assert(bad.select("id").as[String].collect().toSet == Set("under", "over"))
    // lat/lon domain boundaries (utils:176-178): exactly ±90/±180 are valid
    val coords = Seq((180.0, 90.0, true), (-180.0, -90.0, true),
      (180.0001, 0.0, false), (0.0, -90.0001, false))
      .toDF("lon", "lat", "expected")
    assert(coords.filter(
      R.validCoords(col("lon"), col("lat")) =!= col("expected")).count() == 0)
  }

  test("empty inputs: pagination, dedup, explode join are empty-safe") {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Schemas.processingTasks)
    assert(R.page(empty, 1, 10, col("id").asc).count() == 0)
    assert(R.paginationMeta(empty, 10).as[(Long, Long)].collect().head == ((0L, 0L)))
    assert(Dedup.exactDedup(empty, "id", col("task_type")).count() == 0)
    // empty lineage arrays produce no joined rows (init.sql:62 default '{}')
    val tasks = Seq(("t1", Seq.empty[String])).toDF("id", "input_files")
    val files = Seq(("f1", 1)).toDF("file_id", "x")
    assert(graft.operators.Joins.explodeJoin(tasks, "input_files", files, "file_id").count() == 0)
  }

  test("schema StructTypes build empty frames with correct nullability") {
    val users = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Schemas.users)
    assert(users.schema("last_login").nullable)
    assert(!users.schema("email").nullable)
    assert(users.count() == 0)
  }

  test("removeNearDups keeps the lower id of every pair") {
    val docs = Seq((1L, "a"), (2L, "a2"), (3L, "b"), (4L, "c")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("doc_a", "doc_b")
    val kept = Dedup.removeNearDups(docs, pairs, "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L))
  }
}
