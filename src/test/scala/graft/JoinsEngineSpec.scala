package graft

import org.apache.spark.sql.functions._
import graft.operators.Joins

/** SURVEY §2.3 join shapes + the Engine facade flows (reference endpoints). */
class JoinsEngineSpec extends SparkSuite {
  import spark.implicits._

  lazy val files = Seq(
    ("f1", "p1", "u1", "image", ts("2024-01-01 00:00:00"), "a.jpg", "a0.jpg", 10L, "image/jpeg", "c1", false),
    ("f2", "p1", "u1", "image", ts("2024-01-02 00:00:00"), "b.jpg", "b0.jpg", 11L, "image/jpeg", "c2", false),
    ("f3", "p1", "u2", "dsm", ts("2024-01-03 00:00:00"), "c.tif", "c0.tif", 12L, "image/tiff", "c3", true),
    ("f4", "p2", "u2", "image", ts("2024-01-04 00:00:00"), "d.jpg", "d0.jpg", 13L, "image/jpeg", "c4", false)
  ).toDF("id", "project_id", "owner_id", "file_type", "created_at",
    "filename", "original_filename", "size", "mime_type", "checksum", "is_processed")

  test("J6 explode join resolves array lineage to one row per (task,file)") {
    val tasks = Seq(("t1", Seq("f1", "f3")), ("t2", Seq("f2")), ("t3", Seq.empty[String]))
      .toDF("id", "input_files")
    val out = Engine.taskInputFiles(tasks, files.withColumnRenamed("id", "fid").withColumnRenamed("fid", "id"))
    assert(out.count() == 3)
    assert(out.filter(col("task_id") === "t1").count() == 2)
  }

  test("J11 cascade delete removes children of deleted parents only") {
    val deleted = Seq("p1").toDF("project_id")
    val Seq(remaining) = Engine.cascadeDeleteProject(deleted, Seq(files))
    assert(remaining.select("id").as[String].collect().toSeq == Seq("f4"))
  }

  test("J9 audit trail preserves rows with deleted (null) users") {
    val logs = Seq(("l1", "u1", "login"), ("l2", null, "delete"))
      .toDF("id", "user_id", "action")
    val users = Seq(("u1", "alice")).toDF("id", "username")
    val out = Engine.auditTrail(logs, users)
    assert(out.count() == 2)
    assert(out.filter(col("username").isNull).count() == 1)
  }

  test("S6 upsert merges updates copy-on-write, keeps unmatched base rows") {
    val base = Seq(("k1", 1), ("k2", 2)).toDF("id", "v")
    val upd = Seq(("k2", 20), ("k3", 30)).toDF("id", "v")
    val out = Joins.upsert(base, upd, Seq("id")).as[(String, Int)].collect().toMap
    assert(out == Map("k1" -> 1, "k2" -> 20, "k3" -> 30))
  }

  test("Engine.listProjectFiles applies row-level security + type filter + paging") {
    // non-admin u1 sees only own rows in p1
    val mine = Engine.listProjectFiles(files, "p1", "u1", "viewer", None, page = 1, size = 10)
    assert(mine.select("id").as[String].collect().toSet == Set("f1", "f2"))
    // admin sees all of p1; type filter narrows
    val admin = Engine.listProjectFiles(files, "p1", "u9", "admin", Some("dsm"), 1, 10)
    assert(admin.select("id").as[String].collect().toSeq == Seq("f3"))
    // page 2 of size 1 for admin, deterministic order by created_at
    val p2 = Engine.listProjectFiles(files, "p1", "u9", "admin", None, 2, 1)
    assert(p2.select("id").as[String].collect().toSeq == Seq("f2"))
  }

  test("Engine.listUsers honors a non-aligned skip (reference crud.py skip/limit)") {
    // 20 users created a minute apart; skip=5/limit=10 must return rows 6-15
    // exactly — the page-number translation (skip/limit+1) would return 1-10.
    val users = (1 to 20).map(i =>
      (f"u$i%02d", s"u$i@x.com", s"user$i", s"User $i", "viewer", true,
        ts(f"2024-01-01 00:$i%02d:00"), ts("2024-02-01 00:00:00")))
      .toDF("id", "email", "username", "full_name", "role", "is_active",
        "created_at", "last_login")
    val got = Engine.listUsers(users, skip = 5, limit = 10, isActive = Some(true))
      .select("id").as[String].collect().toSeq
    assert(got == (6 to 15).map(i => f"u$i%02d"))
    // aligned skip still behaves like page 1
    val first = Engine.listUsers(users, 0, 3, None).select("id").as[String].collect().toSeq
    assert(first == Seq("u01", "u02", "u03"))
  }

  test("Engine.nextPendingTasks orders by priority desc then age") {
    val tasks = Seq(
      ("t1", "pending", 5, ts("2024-01-01 00:00:00")),
      ("t2", "pending", 9, ts("2024-01-02 00:00:00")),
      ("t3", "running", 10, ts("2024-01-01 00:00:00")),
      ("t4", "pending", 9, ts("2024-01-01 00:00:00"))
    ).toDF("id", "status", "priority", "created_at")
    val next = Engine.nextPendingTasks(tasks, 2).select("id").as[String].collect().toSeq
    assert(next == Seq("t4", "t2"))
  }
}
