package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2.12 (EXT) — multimodal columns: image/audio/video carried as
  * opaque `binary` columns with typed metadata structs, processed by
  * per-partition batch operators.
  *
  * Image decode is REAL for every format the reference's allowlist admits:
  * PNG/JPEG/GIF/BMP via `javax.imageio` and TIFF/GeoTIFF dimensions via the
  * pure-JVM IFD header parse (see [[graft.functions.ImageMeta]] — the
  * reference's rasterio/GDAL territory,
  * services/file-service/requirements.txt:10-14). Audio is REAL for
  * WAV/PCM (RIFF chunk walk + per-block energy features,
  * [[graft.functions.WavMeta]]/[[graft.functions.WavBlockEnergy]]) and
  * video metadata is REAL for MP4/ISO-BMFF (mvhd box walk,
  * [[graft.functions.Mp4Meta]]). The remaining honest stub is compressed
  * CODEC payload decode (MP3/AAC frames, H.264 pictures — genuinely
  * outside pure-JVM scope): bytes no parser claims fall back to a
  * deterministic byte-hash so pipelines stay testable. The Spark-side
  * plumbing — schema, mapPartitions batching, partitioning — is real
  * either way; swap the fallback for codec calls (ffmpeg/jni) to
  * productionize, signatures stay.
  */
object Multimodal {

  /** Typed metadata carried beside each media binary column. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_channels", IntegerType),
    StructField("duration_ms", LongType)))

  /** Image decode: REAL (width, height, channels) via JDK ImageIO for
    * PNG/JPEG/GIF/BMP and the TIFF IFD parse for TIFF; a deterministic
    * byte-hash stand-in for bytes neither path claims (so non-image media
    * still flow through the pipeline). */
  private[operators] def decodeImageBytes(bytes: Array[Byte]): (Int, Int, Int) =
    graft.functions.ImageMeta.decode(bytes).getOrElse {
      val h = java.util.Arrays.hashCode(bytes).toLong & 0x7fffffffL
      ((h % 4096 + 1).toInt, (h / 4096 % 2160 + 1).toInt, (h % 3 + 1).toInt)
    }

  /** Attach decoded metadata to a binary media column via mapPartitions —
    * the batch shape a real decoder needs (amortized per-partition codec
    * init, row-at-a-time decode). Output schema = input + `media_meta`. */
  def withImageMeta(spark: SparkSession, df: DataFrame,
                    contentCol: String = "content"): DataFrame = {
    val outSchema = df.schema.add(StructField("media_meta", mediaMetaSchema))
    val idx = df.schema.fieldIndex(contentCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      // per-partition init happens here in a real decoder (codec handles etc.)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val (w, h, c) =
          if (bytes == null) (0, 0, 0) else decodeImageBytes(bytes)
        Row.fromSeq(r.toSeq :+ Row("image", w, h, c, 0L))
      }
    }
  }

  /** REAL image feature extraction: 64-d block-mean grayscale vector via
    * the JDK ImageIO decode — one codegen expression per row, NULL for
    * bytes no reader claims ([[graft.functions.ImageFeature64]]). The
    * output feeds the embedding stack unchanged (embeddingNearDups, ANN,
    * int8 quantization); near-identical images give near-identical
    * vectors, so planted-duplicate recall is gate-checkable (q491). */
  def imageBlockMeans(content: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val bridge = org.apache.spark.sql.GraftColumnBridge
    bridge.column(
      graft.functions.ImageFeature64(bridge.expression(content)))
  }

  /** REAL audio feature extraction: per-block mean PCM energy over a
    * 16-bit WAV — the audio sibling of [[imageBlockMeans]]. One codegen
    * expression per row, NULL for non-PCM bytes; integer Σv² with one
    * final division, so planted fixtures verify exactly (q494). */
  def audioBlockEnergy(content: org.apache.spark.sql.Column, nBlocks: Int = 8)
      : org.apache.spark.sql.Column = {
    val bridge = org.apache.spark.sql.GraftColumnBridge
    bridge.column(
      graft.functions.WavBlockEnergy(bridge.expression(content), nBlocks))
  }

  /** REAL audio metadata: RIFF/WAVE chunk walk →
    * struct(audio_format, channels, sample_rate, bits, n_frames,
    * duration_ms); NULL for non-WAV bytes (q493). */
  def wavMeta(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val bridge = org.apache.spark.sql.GraftColumnBridge
    bridge.column(graft.functions.WavMeta(bridge.expression(content)))
  }

  /** REAL video metadata: MP4/ISO-BMFF box walk → struct(brand, version,
    * timescale, duration, duration_ms); NULL unless ftyp+mvhd parse
    * (q495). duration_ms feeds [[sampleFrames]]. */
  /** Per-clip PCM quality statistics (peak/clipping/mean-square/zero-
    * crossings) — the audio quality-filter primitive; see
    * [[graft.functions.WavStats]]. */
  def audioStats(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val bridge = org.apache.spark.sql.GraftColumnBridge
    bridge.column(graft.functions.WavStats(bridge.expression(content)))
  }

  def mp4Meta(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val bridge = org.apache.spark.sql.GraftColumnBridge
    bridge.column(graft.functions.Mp4Meta(bridge.expression(content)))
  }

  /** Hash stand-in feature vector for NON-decodable media (compressed
    * codec payloads — MP3/AAC/H.264, no JVM codec in this environment):
    * deterministic bytes→vector hash so those rows still flow through the
    * embedding pipeline. Images should use [[imageBlockMeans]] and PCM
    * audio [[audioBlockEnergy]] (real decodes). Expressed with
    * codegen-friendly Column functions so only the kernel is a stub. */
  def imageFeatureVector(content: org.apache.spark.sql.Column, dim: Int = 16): org.apache.spark.sql.Column =
    transform(sequence(lit(0), lit(dim - 1)), i =>
      (conv(substring(md5(concat(sha2(content, 256), i.cast("string"))), 1, 8), 16, 10)
        .cast("double") / lit(4294967295.0)) * 2 - 1)

  /** Frame sampling plan for video columns: one output row per sampled frame
    * offset (explode), every `stepMs` up to `duration_ms` in the metadata
    * struct. The decode of each frame is downstream (stub'd); the row
    * explosion and partitioning are the real Spark work. */
  def sampleFrames(df: DataFrame, metaCol: String = "media_meta",
                   stepMs: Long = 1000L): DataFrame =
    df.withColumn("frame_ms",
        explode(sequence(lit(0L),
          greatest(col(s"$metaCol.duration_ms") - 1, lit(0L)), lit(stepMs))))

  /** REAL downscale (area average): decode → integer-exact block means →
    * re-encoded 24-bit BMP, NULL for undecodable or smaller-than-target
    * inputs; see [[graft.functions.ImageResizeBmp]]. */
  def resizeImage(content: org.apache.spark.sql.Column, w: Int, h: Int)
      : org.apache.spark.sql.Column = {
    val bridge = org.apache.spark.sql.GraftColumnBridge
    bridge.column(graft.functions.ImageResizeBmp(
      bridge.expression(content), w, h))
  }

  /** Plan-only variant of [[resizeImage]]: records the target size beside
    * the binary without touching bytes — for pipelines that defer the
    * kernel (e.g. to a GPU stage) but want the plan shape now. */
  def resizePlan(df: DataFrame, w: Int, h: Int): DataFrame =
    df.withColumn("resize_to", struct(lit(w).as("width"), lit(h).as("height")))

  /** REAL tile extraction — the pixel kernel behind [[tileGrid]]'s
    * planned (tile_x, tile_y) explosion: cut the w×h patch at (x, y) as
    * a fresh BMP, NULL if the window leaves the image; see
    * [[graft.functions.ImageCropBmp]]. */
  def cropImage(content: org.apache.spark.sql.Column,
                x: Int, y: Int, w: Int, h: Int): org.apache.spark.sql.Column = {
    val bridge = org.apache.spark.sql.GraftColumnBridge
    bridge.column(graft.functions.ImageCropBmp(
      bridge.expression(content), x, y, w, h))
  }

  /** [[cropImage]] with per-row window position — cuts the patches
    * [[tileGrid]] plans (fixed literal patch size, expression-valued
    * (x, y)); NULL for windows outside the image, like the literal form. */
  def cropImageAt(content: org.apache.spark.sql.Column,
                  x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column,
                  w: Int, h: Int): org.apache.spark.sql.Column = {
    val bridge = org.apache.spark.sql.GraftColumnBridge
    bridge.column(graft.functions.ImageCropAtBmp(
      bridge.expression(content),
      bridge.expression(x.cast("long")), bridge.expression(y.cast("long")),
      w, h))
  }

  /** ViT-style tile/patch grid plan: one row per (tile_x, tile_y) covering
    * a widthCol×heightCol image with `tile`-sized tiles at `stride` steps.
    * Interior tiles sit at i·stride; the LAST tile on each axis clamps to
    * size−tile so the right/bottom edge is always covered (the standard
    * overlapped-tiling rule; images smaller than a tile get one tile at
    * 0). Tile count per axis is ⌈(size−tile)/stride⌉+1 — pure integer
    * arithmetic, so the grid is engine-exact. The pixel decode is
    * downstream; the row EXPLOSION (the real Spark work: one metadata row
    * fans to nx·ny patch rows, partitioning preserved) is here. */
  def tileGrid(df: DataFrame, widthCol: String, heightCol: String,
               tile: Int, stride: Int): DataFrame = {
    require(tile >= 1 && stride >= 1, "tile and stride must be positive")
    val nx = when(col(widthCol) <= tile, lit(1L))
      .otherwise(expr(s"($widthCol - $tile + $stride - 1) div $stride") + 1)
    val ny = when(col(heightCol) <= tile, lit(1L))
      .otherwise(expr(s"($heightCol - $tile + $stride - 1) div $stride") + 1)
    df.withColumn("__ti", explode(sequence(lit(0L), nx - 1)))
      .withColumn("__tj", explode(sequence(lit(0L), ny - 1)))
      .withColumn("tile_x", least(col("__ti") * stride,
        greatest(col(widthCol) - tile, lit(0)).cast("long")))
      .withColumn("tile_y", least(col("__tj") * stride,
        greatest(col(heightCol) - tile, lit(0)).cast("long")))
      .drop("__ti", "__tj")
  }
}
