package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §1.2/§1.3 — the single source of truth for the reference's
  * domain-table schemas (the reference declares them three times: DDL
  * init.sql, Pydantic shared/models, SQLAlchemy database.py; here once).
  *
  * Type mapping per SURVEY §1.2: UUID→string, ENUM→string + domain check,
  * JSONB→json string, GEOMETRY→GeoJSON string + derived bbox/point struct,
  * TIMESTAMPTZ→timestamp (session pinned UTC).
  */
object Schemas {

  // enums (reference: init.sql:6-8)
  val UserRoles = Seq("admin", "analyst", "viewer")
  val ProcessingStatuses = Seq("pending", "processing", "completed", "failed", "cancelled")
  val FileTypes = Seq("image", "orthomosaic", "point_cloud", "dsm", "dtm", "satellite")

  val gps: StructType = StructType(Seq(
    StructField("lon", DoubleType), StructField("lat", DoubleType)))

  val bbox: StructType = StructType(Seq(
    StructField("min_lon", DoubleType), StructField("min_lat", DoubleType),
    StructField("max_lon", DoubleType), StructField("max_lat", DoubleType)))

  /** users (reference: init.sql:11-22) */
  val users: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("email", StringType, nullable = false),
    StructField("username", StringType, nullable = false),
    StructField("full_name", StringType),
    StructField("password_hash", StringType, nullable = false),
    StructField("role", StringType, nullable = false),
    StructField("is_active", BooleanType, nullable = false),
    StructField("created_at", TimestampType, nullable = false),
    StructField("updated_at", TimestampType, nullable = false),
    StructField("last_login", TimestampType)))

  /** projects (reference: init.sql:25-35) */
  val projects: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("description", StringType),
    StructField("owner_id", StringType, nullable = false),
    StructField("location_geojson", StringType),
    StructField("location_bbox", bbox),
    StructField("tags", ArrayType(StringType), nullable = false),
    StructField("is_active", BooleanType, nullable = false),
    StructField("created_at", TimestampType, nullable = false),
    StructField("updated_at", TimestampType, nullable = false)))

  /** files (reference: init.sql:38-53) */
  val files: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("filename", StringType, nullable = false),
    StructField("original_filename", StringType, nullable = false),
    StructField("file_type", StringType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("mime_type", StringType, nullable = false),
    StructField("checksum", StringType, nullable = false),
    StructField("storage_path", StringType, nullable = false),
    StructField("project_id", StringType, nullable = false),
    StructField("owner_id", StringType, nullable = false),
    StructField("metadata", StringType),        // JSONB → json string
    StructField("gps", gps),
    StructField("is_processed", BooleanType, nullable = false),
    StructField("created_at", TimestampType, nullable = false)))

  /** processing_tasks (reference: init.sql:56-71) */
  val processingTasks: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("task_type", StringType, nullable = false),
    StructField("project_id", StringType, nullable = false),
    StructField("owner_id", StringType, nullable = false),
    StructField("input_files", ArrayType(StringType), nullable = false),
    StructField("output_files", ArrayType(StringType), nullable = false),
    StructField("parameters", StringType),
    StructField("status", StringType, nullable = false),
    StructField("progress", DoubleType, nullable = false),
    StructField("priority", IntegerType, nullable = false),
    StructField("error_message", StringType),
    StructField("started_at", TimestampType),
    StructField("completed_at", TimestampType),
    StructField("created_at", TimestampType, nullable = false)))

  /** audit_logs (reference: init.sql:153-163) */
  val auditLogs: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("user_id", StringType),          // ON DELETE SET NULL
    StructField("action", StringType, nullable = false),
    StructField("resource_type", StringType),
    StructField("resource_id", StringType),
    StructField("details", StringType),
    StructField("ip_address", StringType),
    StructField("user_agent", StringType),
    StructField("created_at", TimestampType, nullable = false)))

  /** webodm_projects (reference: init.sql:74-81) */
  val webodmProjects: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("description", StringType),
    StructField("webodm_id", IntegerType, nullable = false),
    StructField("project_id", StringType, nullable = false),
    StructField("created_at", TimestampType, nullable = false)))

  /** webodm_tasks (reference: init.sql:84-94) */
  val webodmTasks: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("webodm_task_id", StringType, nullable = false),
    StructField("webodm_project_id", IntegerType, nullable = false),
    StructField("processing_task_id", StringType, nullable = false),
    StructField("options", StringType),          // JSONB → json string
    StructField("status", StringType, nullable = false),
    StructField("progress", DoubleType, nullable = false),
    StructField("created_at", TimestampType, nullable = false)))

  /** gee_export_tasks (reference: init.sql:97-110).
    * GEOMETRY(POLYGON) → GeoJSON string + derived bbox struct (SURVEY §1.2). */
  val geeExportTasks: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("task_id", StringType, nullable = false),
    StructField("collection_id", StringType, nullable = false),
    StructField("start_date", DateType, nullable = false),
    StructField("end_date", DateType, nullable = false),
    StructField("bounds_geojson", StringType, nullable = false),
    StructField("bounds_bbox", bbox),
    StructField("filters", StringType),
    StructField("export_params", StringType),
    StructField("project_id", StringType, nullable = false),
    StructField("owner_id", StringType, nullable = false),
    StructField("status", StringType, nullable = false),
    StructField("created_at", TimestampType, nullable = false)))

  /** analyses (reference: init.sql:113-124) */
  val analyses: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("analysis_type", StringType, nullable = false),
    StructField("project_id", StringType, nullable = false),
    StructField("owner_id", StringType, nullable = false),
    StructField("input_files", ArrayType(StringType), nullable = false),
    StructField("parameters", StringType),
    StructField("results", StringType),
    StructField("status", StringType, nullable = false),
    StructField("created_at", TimestampType, nullable = false),
    StructField("completed_at", TimestampType)))

  /** visualization_layers (reference: init.sql:127-138) */
  val visualizationLayers: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("layer_type", StringType, nullable = false),
    StructField("project_id", StringType, nullable = false),
    StructField("file_id", StringType),          // nullable FK
    StructField("data_source", StringType, nullable = false),
    StructField("style", StringType),
    StructField("is_visible", BooleanType, nullable = false),
    StructField("opacity", DoubleType, nullable = false),
    StructField("created_at", TimestampType, nullable = false)))

  /** api_keys (reference: init.sql:141-150) */
  val apiKeys: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("user_id", StringType, nullable = false),
    StructField("service_name", StringType, nullable = false),
    StructField("key_name", StringType, nullable = false),
    StructField("encrypted_key", StringType, nullable = false),
    StructField("is_active", BooleanType, nullable = false),
    StructField("created_at", TimestampType, nullable = false),
    StructField("expires_at", TimestampType)))

  /** All 11 domain tables by reference name (init.sql:11-150). */
  val domainTables: Map[String, StructType] = Map(
    "users" -> users,
    "projects" -> projects,
    "files" -> files,
    "processing_tasks" -> processingTasks,
    "audit_logs" -> auditLogs,
    "webodm_projects" -> webodmProjects,
    "webodm_tasks" -> webodmTasks,
    "gee_export_tasks" -> geeExportTasks,
    "analyses" -> analyses,
    "visualization_layers" -> visualizationLayers,
    "api_keys" -> apiKeys)

  // ---- write-path defaults & triggers (SURVEY §1.3, §4.3) ----

  /** DDL defaults applied at write time (`DEFAULT uuid_generate_v4()`
    * init.sql:12, `DEFAULT CURRENT_TIMESTAMP` init.sql:19, status/progress
    * defaults init.sql:64-65): fill each listed column only where null. */
  def applyDefaults(df: DataFrame, defaults: Map[String, Column]): DataFrame =
    defaults.foldLeft(df) { case (d, (name, default)) =>
      if (d.columns.contains(name))
        d.withColumn(name, coalesce(col(name), default))
      else d.withColumn(name, default)
    }

  /** Standard default set for insert paths. */
  def insertDefaults: Map[String, Column] = Map(
    "id" -> expr("uuid()"),
    "created_at" -> current_timestamp(),
    "updated_at" -> current_timestamp())

  /** The `BEFORE UPDATE` trigger analog (init.sql:207-219): stamp
    * updated_at on every merged row in the write path. */
  def touchUpdatedAt(df: DataFrame): DataFrame =
    df.withColumn("updated_at", current_timestamp())

  /** CHECK-constraint predicates per table (init.sql:66,136 + enum domains)
    * for the quarantine write path (SURVEY §4.3). */
  def taskChecks: Column =
    col("priority").between(1, 10) &&
      col("progress").between(0.0, 1.0) &&
      col("status").isin(ProcessingStatuses: _*)

  def userChecks: Column =
    col("role").isin(UserRoles: _*) &&
      col("email").rlike(graft.operators.Relational.EmailRe)

  def fileChecks(maxSize: Long): Column =
    col("file_type").isin(FileTypes: _*) &&
      col("size") > 0 && col("size") <= maxSize

  /** webodm_tasks status/progress domain (init.sql:91-92). */
  def webodmTaskChecks: Column =
    col("progress").between(0.0, 1.0) &&
      col("status").isin(ProcessingStatuses: _*)

  /** visualization_layers opacity CHECK (init.sql:136). */
  def layerChecks: Column = col("opacity").between(0.0, 1.0)

  /** gee_export_tasks status domain + date-range sanity (init.sql:101-109). */
  def geeExportChecks: Column =
    col("status").isin(ProcessingStatuses: _*) &&
      col("start_date") <= col("end_date")
}
