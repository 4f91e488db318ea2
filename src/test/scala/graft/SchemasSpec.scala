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

  test("all 11 domain tables declared; new tables build frames with declared nullability") {
    assert(Schemas.domainTables.keySet == Set(
      "users", "projects", "files", "processing_tasks", "audit_logs",
      "webodm_projects", "webodm_tasks", "gee_export_tasks", "analyses",
      "visualization_layers", "api_keys"))
    for ((name, st) <- Schemas.domainTables) {
      val df = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], st)
      assert(df.count() == 0, name)
      assert(!df.schema("id").nullable, s"$name.id must be non-null (PK)")
      assert(!df.schema("created_at").nullable, s"$name.created_at must be non-null")
    }
    // spot nullability parity with init.sql: nullable FK / optional columns
    assert(Schemas.visualizationLayers("file_id").nullable)       // init.sql:132
    assert(Schemas.apiKeys("expires_at").nullable)                // init.sql:149
    assert(!Schemas.geeExportTasks("bounds_geojson").nullable)    // init.sql:102
  }

  test("CHECK predicates for webodm_tasks, layers, gee exports quarantine violations") {
    val wt = Seq(
      ("w1", 0.5, "pending"), ("w2", 1.5, "pending"), ("w3", 0.5, "nope")
    ).toDF("id", "progress", "status")
    val (okW, badW) = R.quarantine(wt, Schemas.webodmTaskChecks)
    assert(okW.select("id").as[String].collect().toSeq == Seq("w1") && badW.count() == 2)
    val vl = Seq(("l1", 0.0), ("l2", 1.0), ("l3", 1.01)).toDF("id", "opacity")
    val (okL, badL) = R.quarantine(vl, Schemas.layerChecks)
    assert(okL.count() == 2 && badL.count() == 1)
    val ge = Seq(
      ("g1", "2024-01-01", "2024-02-01", "pending"),
      ("g2", "2024-03-01", "2024-02-01", "pending"),  // inverted range
      ("g3", "2024-01-01", "2024-02-01", "bogus")
    ).toDF("id", "s", "e", "status")
      .select(col("id"), col("s").cast("date").as("start_date"),
        col("e").cast("date").as("end_date"), col("status"))
    val (okG, badG) = R.quarantine(ge, Schemas.geeExportChecks)
    assert(okG.select("id").as[String].collect().toSeq == Seq("g1") && badG.count() == 2)
  }

  test("paginationMeta full envelope: page/size clamp, has_next/has_prev") {
    val df = spark.range(250).toDF("id")
    // page 2 of 3 (size 100): both neighbors exist
    val m = R.paginationMeta(df, page = 2, size = 100)
      .as[(Long, Int, Int, Long, Boolean, Boolean)].collect().head
    assert(m == ((250L, 2, 100, 3L, true, true)))
    // clamp: page 0 → 1, size 1000 → 100 (shared/models/__init__.py:38-41)
    val c = R.paginationMeta(df, page = 0, size = 1000)
      .as[(Long, Int, Int, Long, Boolean, Boolean)].collect().head
    assert(c == ((250L, 1, 100, 3L, true, false)))
    assert(R.clampPageParams(-5, 0) == ((1, 1)))
  }

  test("cascadeDeleteProjectDeep removes grandchildren via the second FK level") {
    val projectIds = Seq("p1").toDF("project_id")
    val tasks = Seq(("t1", "p1"), ("t2", "p2")).toDF("id", "project_id")
    val webodm = Seq(("w1", "t1"), ("w2", "t2")).toDF("id", "processing_task_id")
    val (keptTasks, keptWebodm) =
      Engine.cascadeDeleteProjectDeep(projectIds, tasks, webodm)
    assert(keptTasks.select("id").as[String].collect().toSeq == Seq("t2"))
    assert(keptWebodm.select("id").as[String].collect().toSeq == Seq("w2"))
  }

  test("backoffDelay matches the reference's delay*backoff^attempt series") {
    val out = Seq(0, 1, 2, 3).toDF("attempt")
      .select(graft.functions.Scalars.backoffDelay(col("attempt")).as("d"))
      .as[Double].collect().toSeq
    assert(out == Seq(1.0, 2.0, 4.0, 8.0))
  }

  test("removeNearDups keeps the lower id of every pair") {
    val docs = Seq((1L, "a"), (2L, "a2"), (3L, "b"), (4L, "c")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("doc_a", "doc_b")
    val kept = Dedup.removeNearDups(docs, pairs, "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L))
  }

  test("connectedComponents collapses chains to the minimum id per component") {
    // chain 1-2, 2-3, 3-4 (no direct 1-3/1-4 pair) + isolated pair 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("doc_a", "doc_b")
    val comps = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("dedupCorpus keeps one representative per near-dup chain") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, base),
      (2L, base + " x"),          // near-dup of 1
      (3L, base + " x y"),        // near-dup of 2 (chain to 1)
      (9L, "completely different text about satellites and drones flying high")
    ).toDF("doc_id", "text")
    val kept = Dedup.dedupCorpus(docs, "doc_id", "text", threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(9L) && kept.contains(1L))
    assert(!kept.contains(3L) || !kept.contains(2L),
      s"chain members must collapse, kept=$kept")
  }
}
