package graft

import java.sql.{Date, Timestamp}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.sources.Sources

/** S11/S12 wired to the DECLARED domain schemas (Schemas.geeExportTasks,
  * Schemas.processingTasks, Schemas.webodmTasks) — not ad-hoc columns. */
class SourcesSchemaSpec extends SparkSuite {
  import spark.implicits._

  private val ts = Timestamp.valueOf("2024-01-01 00:00:00")

  test("runExports: pending gee_export_tasks select matching scenes in one pass") {
    val tasks = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("e1", "gee-1", "c1", Date.valueOf("1995-01-01"), Date.valueOf("1995-12-31"),
          """{"type":"Polygon"}""", Row(-50.0, -50.0, 50.0, 50.0),
          "{}", "{}", "p1", "u1", "pending", ts),
        Row("e2", "gee-2", "c1", Date.valueOf("1995-01-01"), Date.valueOf("1995-12-31"),
          """{"type":"Polygon"}""", Row(-50.0, -50.0, 50.0, 50.0),
          "{}", "{}", "p1", "u1", "completed", ts),          // not pending → ignored
        Row("e3", "gee-3", "c2", Date.valueOf("1995-01-01"), Date.valueOf("1995-12-31"),
          """{"type":"Polygon"}""", Row(-50.0, -50.0, 50.0, 50.0),
          "{}", "{}", "p1", "u1", "pending", ts))),
      Schemas.geeExportTasks)
    val scenes = Seq(
      ("s1", "c1", "1995-06-01", -10.0, -10.0, 10.0, 10.0, 20.0),   // match e1
      ("s2", "c1", "1996-06-01", -10.0, -10.0, 10.0, 10.0, 20.0),   // date out
      ("s3", "c1", "1995-06-01", 60.0, 60.0, 80.0, 70.0, 20.0),     // bbox out
      ("s4", "c2", "1995-06-01", -10.0, -10.0, 10.0, 10.0, 20.0),   // match e3
      ("s5", "c1", "1995-06-01", -10.0, -10.0, 10.0, 10.0, 95.0))   // cloud out
      .toDF("scene_id", "collection_id", "date", "min_lon", "min_lat",
        "max_lon", "max_lat", "cloud_pct")
      .withColumn("date", col("date").cast("date"))
    val out = Sources.runExports(tasks, scenes, maxCloudPct = 60.0)
      .select("export_id", "scene_id").as[(String, String)].collect().toSet
    assert(out == Set(("e1", "s1"), ("e3", "s4")))
  }

  test("webodmJobView: declared-schema join, unsubmitted tasks keep null webodm columns") {
    val tasks = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("t1", "odm_orthophoto", "p1", "u1", Seq("f1"), Seq.empty[String],
          "{}", "processing", 0.4, 5, null, ts, null, ts),
        Row("t2", "odm_dsm", "p1", "u1", Seq("f2"), Seq.empty[String],
          "{}", "pending", 0.0, 5, null, null, null, ts))),
      Schemas.processingTasks)
    val webodm = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("w1", "ortho run", "wo-123", 7, "t1", "{}", "processing", 0.35, ts))),
      Schemas.webodmTasks)
    val view = Sources.webodmJobView(tasks, webodm)
    val byId = view.collect().map(r => r.getAs[String]("task_id") -> r).toMap
    assert(byId("t1").getAs[String]("webodm_task_id") == "wo-123")
    assert(byId("t1").getAs[Double]("webodm_progress") == 0.35)
    assert(byId("t2").getAs[String]("webodm_task_id") == null)  // J8 null-preserving
    assert(view.count() == 2)
  }
}
