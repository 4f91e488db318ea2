package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Scalars

/** SURVEY.md §3.3 — the reference's richest dataflow, the file-upload
  * ingestion pipeline (reference: services/file-service/main.py:75-169),
  * re-expressed as a batch job over a binary-file source:
  *
  *   binaryFile scan → validation columns (size cap, MIME sniff+allowlist,
  *   extension/type) → sha-256 checksum → unique storage name → metadata
  *   extraction → split into (valid, quarantined) → write parquet
  *   partitioned by project.
  *
  * The reference's per-file try/except + compensating unlink (main.py:158-167)
  * becomes per-row validity columns and a quarantine DataFrame — failures
  * never abort the batch.
  */
object Ingest {

  /** MIME allowlist (reference: shared/config/__init__.py:36-39). */
  val AllowedMime: Seq[String] = Seq(
    "image/jpeg", "image/png", "image/tiff", "application/zip")

  /** Extended allowlist for the multimodal lake: the reference's images
    * plus the audio/video/point-cloud containers the training pipeline
    * ingests (SURVEY §2.12; the reference's file_type enum admits media
    * uploads, init.sql:8). */
  val MediaMime: Seq[String] = AllowedMime ++ Seq(
    "image/bmp", "image/gif", "audio/wav", "video/mp4",
    "application/vnd.las")

  /** Size cap (reference: MAX_FILE_SIZE, .env.example:27). */
  val MaxFileSize: Long = 1073741824L

  /** Read a directory of raw files as (path, modificationTime, length,
    * content) — the multipart-upload analog (reference: main.py:100). */
  def readBinaryDir(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile").load(dir)

  /** S3 — per-row binary OBJECT sink: write each row's bytes as one object
    * `<dir>/<id><ext>` — the storage-write half of the upload pipeline
    * (reference: open(file_path,'wb').write(content), main.py:113-122).
    * Executor-side imperative I/O is the correct shape for an object-store
    * PUT (there is no columnar encoding to exploit): each task writes its
    * own partition's objects through the Hadoop FileSystem API — works the
    * same against local disk, HDFS, or an object store, with NO driver
    * funnel and no per-row collect. */
  def writeBinaryObjects(df: DataFrame, idCol: String, contentCol: String,
                         dir: String, ext: String = ".bin"): Unit =
    df.select(col(idCol).cast("string"), col(contentCol).cast("binary"))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        if (rows.hasNext) {
          val conf = new org.apache.hadoop.conf.Configuration()
          val base = new org.apache.hadoop.fs.Path(dir)
          val fs = base.getFileSystem(conf)
          rows.foreach { r =>
            val out = fs.create(
              new org.apache.hadoop.fs.Path(base, r.getString(0) + ext), true)
            try out.write(r.getAs[Array[Byte]](1)) finally out.close()
          }
        }
      }

  /** Multimodal metadata extraction (reference: the `MetadataExtractor`
    * delegate, services/file-service/main.py:128; requirements.txt:10-14).
    * width/height/bands are decoded for REAL for every format
    * `Scalars.sniffMime` admits: PNG/JPEG/GIF/BMP via JDK ImageIO and
    * TIFF/GeoTIFF via the pure-JVM IFD header parse inside
    * [[graft.functions.ImageMeta]] (tags 256/257/277 — no codec needed for
    * dimensions). EXIF GPS lat/lon is likewise a REAL byte-walk
    * ([[graft.functions.ExifGps]]: IFD0 → GPS IFD in TIFF and JPEG/APP1),
    * null when the bytes carry no GPS tags. Bytes neither dimension path
    * claims fall back to a deterministic crc32-derived stand-in; only crs
    * stays a stub — CRS genuinely needs GDAL. */
  def extractMetadata(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val m = org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.ImageMeta(
        org.apache.spark.sql.GraftColumnBridge.expression(content)))
    val g = org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.ExifGps(
        org.apache.spark.sql.GraftColumnBridge.expression(content)))
    val h = crc32(content)
    struct(
      coalesce(m.getField("width"), (h % 4096 + 1).cast("int")).as("width"),
      coalesce(m.getField("height"), (h % 2160 + 1).cast("int")).as("height"),
      coalesce(m.getField("channels"), (h % 4 + 1).cast("int")).as("bands"),
      g.getField("lat").as("gps_lat"),
      g.getField("lon").as("gps_lon"),
      lit("EPSG:4326").as("crs"))
  }

  /** P11/P13/F1/F4 — the reference's upload VALIDATION path
    * (main.py:86-107) as deterministic per-row columns: byte size, sniffed
    * MIME, sha-256 checksum, size-cap and allowlist verdicts, combined
    * validity. The uuid/now-bearing columns of [[pipeline]] are deliberately
    * absent so the validation decision itself is externally checkable
    * row-for-row (q117). */
  def validateUploads(files: DataFrame, idCol: String,
                      maxSize: Long = MaxFileSize): DataFrame =
    files
      .withColumn("size", length(col("content")).cast("long"))
      .withColumn("mime_type", Scalars.sniffMime(col("content")))
      .withColumn("checksum", Scalars.sha256Hex(col("content")))
      .withColumn("size_ok", col("size") <= maxSize && col("size") > 0)
      .withColumn("mime_ok", col("mime_type").isin(AllowedMime: _*))
      .withColumn("valid", col("size_ok") && col("mime_ok"))
      .select(col(idCol), col("size"), col("mime_type"), col("checksum"),
        col("size_ok"), col("mime_ok"), col("valid"))

  /** The §3.3 pipeline: returns (valid, quarantined). Validation mirrors
    * main.py:86-107 step-for-step; checksum is F1 (sha2 over content).
    * `allowedMime` defaults to the reference's image allowlist; pass
    * [[MediaMime]] for the full multimodal lake. */
  def pipeline(files: DataFrame, projectId: String,
               allowedMime: Seq[String] = AllowedMime): (DataFrame, DataFrame) = {
    val staged = files
      .withColumn("project_id", lit(projectId))
      .withColumn("original_filename", regexp_extract(col("path"), "([^/]+)$", 1))
      .withColumn("size", col("length"))
      .withColumn("mime_type", Scalars.sniffMime(col("content")))
      .withColumn("checksum", Scalars.sha256Hex(col("content")))
      .withColumn("filename", Scalars.uniqueFilename(col("original_filename")))
      .withColumn("metadata", extractMetadata(col("content")))
      .withColumn("size_ok", col("size") <= MaxFileSize && col("size") > 0)
      .withColumn("mime_ok", col("mime_type").isin(allowedMime: _*))
      .withColumn("valid", col("size_ok") && col("mime_ok"))
    Relational.quarantine(staged, col("valid"))
  }

  /** Write the validated rows as the `files` table, partitioned by
    * project_id — the storage-path layout `{storage}/{project_id}/...` of the
    * reference (main.py:113-122) becomes partition pruning for per-project
    * queries. */
  def writeFilesTable(valid: DataFrame, outDir: String): Unit =
    valid
      .drop("content") // content stays in the object store, not the table
      .withColumn("created_at", current_timestamp())
      .write.mode("append").partitionBy("project_id").parquet(outDir)
}
