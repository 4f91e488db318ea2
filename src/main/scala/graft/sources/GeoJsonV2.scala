package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData,
  GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table,
  TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference,
  Transform}
import org.apache.spark.sql.connector.expressions.{Literal => ConnLiteral}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation,
  CountStar}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey,
  InputPartition, PartitionReader, PartitionReaderFactory, Scan,
  ScanBuilder, SupportsPushDownAggregates, SupportsPushDownLimit,
  SupportsPushDownRequiredColumns,
  SupportsReportPartitioning, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.connector.read.partitioning.{
  KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream,
  Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 reader for newline-delimited GeoJSON features
  * (GeoJSONL) — the engine-native ingestion path for the reference's
  * GeoJSON payloads (reference: services/file-service/main.py GeoJSON
  * uploads; F15 parses the column form, this reads the FILE form).
  *
  * Spark-first design notes:
  *  - one InputPartition per file: a directory of shard files reads in
  *    parallel with no driver-side parsing;
  *  - SupportsPushDownRequiredColumns: a `select(id)` over a wide
  *    feature collection never parses geometry (the JSON node is only
  *    traversed for requested fields) and the scan's readSchema shows
  *    exactly the pruned columns (spec-asserted);
  *  - rows are built directly as InternalRow (UTF8String / nested
  *    GenericArrayData), no Row→InternalRow conversion layer.
  *
  * Schema: id STRING, gtype STRING, ring ARRAY<ARRAY<DOUBLE>>
  * (exterior ring of [lon, lat] pairs — GeoJSON coordinates[0]),
  * props MAP<STRING, STRING>.
  */
class GeoJsonSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-geojson"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    if (GeoJsonV2.isBucketed(options)) GeoJsonV2.bucketedSchema
    else GeoJsonV2.fullSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new GeoJsonTable(GeoJsonV2.pathOf(properties),
      "true".equalsIgnoreCase(properties.getOrDefault("bucketed", "false")),
      GeoJsonV2.snapshotOf(properties))
  override def supportsExternalMetadata(): Boolean = false
}

object GeoJsonV2 {
  val fullSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("gtype", StringType),
    StructField("ring", ArrayType(ArrayType(DoubleType))),
    StructField("props", MapType(StringType, StringType))))

  /** Bucketed lakes carry the Hive-style partition key as a real column. */
  val bucketedSchema: StructType =
    fullSchema.add(StructField("pkey", IntegerType))

  def isBucketed(options: CaseInsensitiveStringMap): Boolean =
    "true".equalsIgnoreCase(options.getOrDefault("bucketed", "false"))

  /** Bucketed layout: `root/pkey=<int>/<files>` (what
    * `df.write.partitionBy("pkey").text(root)` produces). Returns
    * (file, pkey) pairs across all bucket directories. */
  def listBucketedFiles(dir: String): Seq[(String, Int)] = {
    val root = new java.io.File(dir)
    val dirs = root.listFiles()
    require(dirs != null, s"not a directory: $dir")
    dirs.filter(d => d.isDirectory && d.getName.startsWith("pkey="))
      .sortBy(_.getName)
      .flatMap { d =>
        val k = d.getName.stripPrefix("pkey=").toInt
        d.listFiles()
          .filter(x => x.isFile && !x.getName.startsWith(".") &&
            !x.getName.startsWith("_"))
          .map(f => (f.getPath, k)).sortBy(_._1)
      }.toSeq
  }

  /** Time-travel read option: `snapshotFiles = k` pins a batch read to
    * the FIRST k shards in sorted-name order. Because the lake's append
    * contract is monotone shard names (the same contract the streaming
    * offsets rely on, [[GeoJsonMicroBatchStream]]), "first k files" IS
    * "the table as of version k" — the Iceberg version-as-of idea
    * expressed on this connector's own offset axis, and a batch reader
    * can replay exactly what micro-batches 0..n saw. Batch-only:
    * streaming starts from the live tail by definition; bucketed lakes
    * reject it (their layout is keyed, not append-ordered). */
  def snapshotOf(properties: util.Map[String, String]): Option[Int] = {
    val raw = Option(properties.get("snapshotfiles"))
      .orElse(Option(properties.get("snapshotFiles")))
    raw.map { v =>
      val k = v.toInt
      require(k >= 0, s"snapshotFiles must be >= 0, got $k")
      k
    }
  }

  /** `load(path)` lands as the `paths` property (a JSON string array) or
    * `path` for the single-path form — accept both. */
  def pathOf(properties: util.Map[String, String]): String = {
    val single = properties.get("path")
    if (single != null) single
    else {
      val many = properties.get("paths")
      require(many != null, "graft-geojson needs a path")
      // minimal JSON array unwrap: ["p1"] or ["p1","p2"] → first path
      val m = new ObjectMapper().readTree(many)
      require(m.isArray && m.size() >= 1, s"bad paths option: $many")
      m.get(0).asText()
    }
  }

  /** Observability hook (specs assert the limit pushdown actually stops
    * readers early): total rows emitted by row-path partition readers,
    * accumulated at reader close. */
  private[graft] val rowsEmitted =
    new java.util.concurrent.atomic.AtomicLong()

  /** Sorted shard list pinned to the first `snapshot` files when the
    * version-as-of option is set (k past the live tail = the full lake,
    * matching a stream that has consumed every offset). */
  def snapshotFiles(dir: String, snapshot: Option[Int]): Seq[String] = {
    val all = listFiles(dir)
    snapshot.fold(all)(k => all.take(k))
  }

  def listFiles(dir: String): Seq[String] = {
    val f = new java.io.File(dir)
    if (f.isFile) Seq(f.getPath)
    else f.listFiles()
      .filter(x => x.isFile && !x.getName.startsWith(".") &&
        !x.getName.startsWith("_"))
      .map(_.getPath).sorted.toSeq
  }
}

class GeoJsonTable(path: String, bucketed: Boolean = false,
                   snapshot: Option[Int] = None)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  require(snapshot.isEmpty || !bucketed,
    "snapshotFiles applies to append-ordered lakes, not bucketed layouts")
  override def name(): String = s"geojson:$path"
  override def schema(): StructType =
    if (bucketed) GeoJsonV2.bucketedSchema else GeoJsonV2.fullSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GeoJsonScanBuilder(path, bucketed, snapshot)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new GeoJsonWriteBuilder(path, info.schema())
}

/** Aggregate pushdown (COUNT(*) only): a bare row count never needs the
  * JSON parsed — each shard answers with ONE row holding its non-blank
  * line count, and Spark's partial-pushdown contract sums the per-shard
  * partials (`supportCompletePushDown` stays false: shards are
  * independent InputPartitions, the final merge belongs to the engine).
  * At 100 TB this turns dataset-census queries over a GeoJSONL lake from
  * a full parse into a metadata-speed byte scan; richer aggregates
  * (min/max over parsed fields, grouped counts) deliberately stay on the
  * row path — they need the parse anyway. */
class GeoJsonScanBuilder(path: String, bucketed: Boolean = false,
                         snapshot: Option[Int] = None)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates
    with SupportsPushDownLimit {
  private var required: StructType =
    if (bucketed) GeoJsonV2.bucketedSchema else GeoJsonV2.fullSchema
  private var countPushed = false
  private var limit: Option[Int] = None
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def pushAggregation(aggregation: Aggregation): Boolean = {
    val ok = !bucketed && aggregation.groupByExpressions.isEmpty &&
      aggregation.aggregateExpressions.length == 1 &&
      aggregation.aggregateExpressions.head.isInstanceOf[CountStar]
    if (ok) countPushed = true
    ok
  }
  /** LIMIT n stops each shard reader after n rows (a PARTIAL push —
    * `isPartiallyPushed` stays true so the engine applies the global
    * limit on top). At 100 TB this turns `LIMIT 100` debug queries over
    * a full lake into a few-line read of each shard head instead of a
    * full parse of every file. */
  override def pushLimit(l: Int): Boolean = {
    if (!bucketed) limit = Some(l)
    !bucketed
  }
  override def build(): Scan =
    if (countPushed) GeoJsonCountScan(path, snapshot)
    else if (bucketed) GeoJsonBucketedScan(path, required)
    else GeoJsonScan(path, required, limit, snapshot)
}

case class GeoJsonBucketedFilePartition(file: String, pkey: Int)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(pkey)
}

/** Scan over a Hive-layout bucketed GeoJSONL lake that REPORTS its
  * key-grouped partitioning (`SupportsReportPartitioning` +
  * `HasPartitionKey` per file): with
  * `spark.sql.sources.v2.bucketing.enabled=true`, two lakes bucketed on
  * the same key join WITHOUT a shuffle on either side — Spark's
  * storage-partitioned join recognizes the co-partitioning exactly as it
  * does for Iceberg tables. At 100 TB this is the layout contract that
  * turns the biggest fact⋈fact joins into zero-exchange zips; the
  * `writeBucketed` parquet layout (ScaleLayoutSpec) is the same idea on
  * the engine's native format. */
case class GeoJsonBucketedScan(path: String, required: StructType)
    extends Scan with Batch with SupportsReportPartitioning
    with SupportsRuntimeV2Filtering {
  private lazy val allFiles: Seq[(String, Int)] =
    GeoJsonV2.listBucketedFiles(path)
  // runtime (DPP-style) shard pruning: set once by filter(), read by
  // planInputPartitions; deliberately NOT part of case equality so a
  // filtered scan still reuses the unfiltered scan's broadcast
  @volatile private var keptKeys: Option[Set[Int]] = None
  /** Test hook: which bucket keys survived runtime filtering. */
  private[graft] def prunedKeys: Option[Set[Int]] = keptKeys
  private def files: Seq[(String, Int)] = keptKeys match {
    case Some(ks) => allFiles.filter { case (_, k) => ks(k) }
    case None => allFiles
  }
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    files.map { case (f, k) => GeoJsonBucketedFilePartition(f, k) }.toArray
  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(
      Array(org.apache.spark.sql.connector.expressions.Expressions
        .identity("pkey")),
      files.size)
  /** Dynamic shard pruning (the DSv2 DPP hook): when the bucketed lake is
    * the fact side of a join on `pkey`, Spark hands the dim side's key
    * set here at RUN time and whole shard directories drop out of the
    * scan before any byte is read — the Iceberg-style
    * SupportsRuntimeV2Filtering contract on the engine's own connector.
    * Unrecognized predicate shapes are ignored (pruning is an
    * optimization, never a correctness dependency — Spark re-applies the
    * join itself). */
  override def filterAttributes(): Array[NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions
      .column("pkey"))
  override def filter(predicates: Array[Predicate]): Unit = {
    val keys = predicates.iterator.flatMap { p =>
      val kids = p.children()
      p.name() match {
        case "IN" if kids.nonEmpty =>
          val lits = kids.drop(1).collect {
            case l: ConnLiteral[_] if l.value.isInstanceOf[java.lang.Integer] =>
              l.value.asInstanceOf[java.lang.Integer].intValue()
          }
          if (lits.length == kids.length - 1) Some(lits.toSet) else None
        case "=" if kids.length == 2 =>
          kids.collectFirst {
            case l: ConnLiteral[_] if l.value.isInstanceOf[java.lang.Integer] =>
              Set(l.value.asInstanceOf[java.lang.Integer].intValue())
          }
        case _ => None
      }
    }.toSeq
    if (keys.nonEmpty) keptKeys = Some(keys.reduce(_ intersect _))
  }
  override def createReaderFactory(): PartitionReaderFactory =
    GeoJsonBucketedReaderFactory(required.fieldNames)
  override def description(): String =
    s"GeoJsonBucketedScan(path=$path, keyGroupedBy=pkey)"
}

case class GeoJsonBucketedReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val bp = p.asInstanceOf[GeoJsonBucketedFilePartition]
    new GeoJsonPartitionReader(bp.file, fields, bp.pkey)
  }
}

/** The pushed-COUNT(*) scan: one partial-count row per shard file. */
case class GeoJsonCountScan(path: String, snapshot: Option[Int] = None)
    extends Scan with Batch {
  override def readSchema(): StructType =
    StructType(Seq(StructField("count", LongType)))
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    GeoJsonV2.snapshotFiles(path, snapshot)
      .map(GeoJsonFilePartition.apply).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    GeoJsonCountReaderFactory()
  override def description(): String =
    s"GeoJsonCountScan(path=$path, PushedAggregates=[COUNT(*)]" +
      snapshot.map(k => s", snapshotFiles=$k").getOrElse("") + ")"
}

case class GeoJsonCountReaderFactory() extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val file = p.asInstanceOf[GeoJsonFilePartition].file
      private var done = false
      private var n = 0L
      override def next(): Boolean =
        if (done) false
        else {
          val it = java.nio.file.Files
            .lines(java.nio.file.Paths.get(file)).iterator()
          while (it.hasNext) if (it.next().trim.nonEmpty) n += 1
          done = true
          true
        }
      override def get(): InternalRow = InternalRow(n)
      override def close(): Unit = ()
    }
}

case class GeoJsonFilePartition(file: String) extends InputPartition

case class GeoJsonScan(path: String, required: StructType,
                       limit: Option[Int] = None,
                       snapshot: Option[Int] = None)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    GeoJsonV2.snapshotFiles(path, snapshot)
      .map(GeoJsonFilePartition.apply).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    GeoJsonReaderFactory(required.fieldNames, limit)
  override def toMicroBatchStream(checkpointLocation: String)
      : MicroBatchStream = {
    // snapshotFiles is a batch-only contract (a stream starts from the
    // live tail by definition) — enforce it rather than silently ignoring
    // the pin a user asked for
    require(snapshot.isEmpty,
      "snapshotFiles is a batch-only option; a streaming read replays the " +
        "append log from its own offsets")
    new GeoJsonMicroBatchStream(path, required)
  }
}

/** Offset = how many files (in sorted-name order) have been consumed.
  * Appended shards must sort after consumed ones (monotone shard names —
  * the writer contract every file-based stream source shares). */
case class GeoJsonOffset(files: Int) extends Offset {
  override def json(): String = s"""{"files":$files}"""
}

/** Streaming arm of the connector: each micro-batch reads exactly the
  * shard files that appeared since the last committed offset — one
  * InputPartition per new file, same pruned reader as the batch path. */
class GeoJsonMicroBatchStream(path: String, required: StructType)
    extends MicroBatchStream {
  override def initialOffset(): Offset = GeoJsonOffset(0)
  override def latestOffset(): Offset =
    GeoJsonOffset(GeoJsonV2.listFiles(path).size)
  override def deserializeOffset(json: String): Offset = {
    val n = new ObjectMapper().readTree(json).get("files").asInt()
    GeoJsonOffset(n)
  }
  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val s0 = start.asInstanceOf[GeoJsonOffset].files
    val e0 = end.asInstanceOf[GeoJsonOffset].files
    GeoJsonV2.listFiles(path).slice(s0, e0)
      .map(GeoJsonFilePartition.apply).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    GeoJsonReaderFactory(required.fieldNames)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class GeoJsonReaderFactory(fields: Array[String],
                                limit: Option[Int] = None)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new GeoJsonPartitionReader(
      p.asInstanceOf[GeoJsonFilePartition].file, fields, limit = limit)
}

class GeoJsonPartitionReader(file: String, fields: Array[String],
                             pkey: Int = -1,
                             limit: Option[Int] = None)
    extends PartitionReader[InternalRow] {
  private val mapper = new ObjectMapper()
  private val lines = java.nio.file.Files
    .lines(java.nio.file.Paths.get(file)).iterator()
  private var row: InternalRow = _
  private var emitted = 0L

  override def next(): Boolean = {
    if (limit.exists(emitted >= _)) return false
    var found = false
    while (!found && lines.hasNext) {
      val line = lines.next()
      if (line.trim.nonEmpty) { row = parse(line); found = true }
    }
    if (found) emitted += 1
    found
  }
  override def get(): InternalRow = row
  override def close(): Unit =
    GeoJsonV2.rowsEmitted.addAndGet(emitted): Unit

  private def parse(line: String): InternalRow = {
    val n = mapper.readTree(line)
    val vals: Array[Any] = fields.map {
      case "id" =>
        val v = n.get("id"); if (v == null) null
        else UTF8String.fromString(v.asText())
      case "gtype" =>
        val g = n.get("geometry")
        if (g == null || g.get("type") == null) null
        else UTF8String.fromString(g.get("type").asText())
      case "ring" =>
        val g = n.get("geometry")
        val cs = if (g == null) null else g.get("coordinates")
        if (cs == null || !cs.isArray || cs.size() == 0) null
        else ringOf(cs.get(0))
      case "props" =>
        val p = n.get("properties")
        if (p == null || !p.isObject) null
        else {
          val ks = p.properties().asScala.toSeq
          new ArrayBasedMapData(
            new GenericArrayData(ks.map(e =>
              UTF8String.fromString(e.getKey)).toArray[Any]),
            new GenericArrayData(ks.map(e =>
              UTF8String.fromString(e.getValue.asText())).toArray[Any]))
        }
      case "pkey" => pkey
      case other =>
        throw new IllegalArgumentException(s"unknown column $other")
    }
    InternalRow.fromSeq(vals.toSeq)
  }

  private def ringOf(ring: JsonNode): ArrayData =
    new GenericArrayData((0 until ring.size()).map { i =>
      val pt = ring.get(i)
      new GenericArrayData(
        (0 until pt.size()).map(j => pt.get(j).asDouble()).toArray[Any])
    }.toArray[Any])
}

/** WRITE arm of the connector — the V2 commit protocol done properly:
  * every task writes to a hidden temp file (`.tmp-<task>-<attempt>`),
  * task commit hands the temp name to the driver in its commit message,
  * and ONLY `BatchWrite.commit` renames the complete set to visible
  * shard names (`shard-<task>.jsonl`). A failed/speculative attempt's
  * temp file is ignored by every reader (dot-prefix) and deleted on
  * abort — the exactly-once file-sink contract, connector-local. Shard
  * names are monotone in task id, satisfying the streaming arm's
  * sorted-name offset contract, so a directory written here is
  * immediately replayable by the MicroBatchStream. */
class GeoJsonWriteBuilder(path: String, schema: StructType)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  private var doTruncate = false
  override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder = {
    doTruncate = true; this
  }
  override def build(): org.apache.spark.sql.connector.write.Write =
    new GeoJsonWrite(path, schema, doTruncate)
}

case class GeoJsonShardCommit(tempPath: String, finalName: String)
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

class GeoJsonWrite(path: String, schema: StructType, truncate: Boolean)
    extends org.apache.spark.sql.connector.write.Write {
  override def toBatch: org.apache.spark.sql.connector.write.BatchWrite =
    new org.apache.spark.sql.connector.write.BatchWrite {
      override def createBatchWriterFactory(
          info: org.apache.spark.sql.connector.write.PhysicalWriteInfo)
          : org.apache.spark.sql.connector.write.DataWriterFactory = {
        val dir = new java.io.File(path)
        dir.mkdirs()
        GeoJsonWriterFactory(path, schema.fieldNames)
      }
      override def commit(messages: Array[
          org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit = {
        val dir = java.nio.file.Paths.get(path)
        if (truncate) {
          val old = new java.io.File(path).listFiles()
          if (old != null) old.filter(f => f.isFile &&
            !messages.exists(_.asInstanceOf[GeoJsonShardCommit]
              .tempPath == f.getPath))
            .foreach(_.delete())
        }
        messages.foreach { m =>
          val c = m.asInstanceOf[GeoJsonShardCommit]
          java.nio.file.Files.move(java.nio.file.Paths.get(c.tempPath),
            dir.resolve(c.finalName),
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
      }
      override def abort(messages: Array[
          org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit =
        messages.foreach {
          case c: GeoJsonShardCommit =>
            java.nio.file.Files.deleteIfExists(
              java.nio.file.Paths.get(c.tempPath))
          case _ =>
        }
    }
}

case class GeoJsonWriterFactory(path: String, fields: Array[String])
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new GeoJsonShardWriter(path, fields, partitionId, taskId)
}

class GeoJsonShardWriter(path: String, fields: Array[String],
                         partitionId: Int, taskId: Long)
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
  private val temp = java.nio.file.Paths.get(path,
    f".tmp-$partitionId%05d-$taskId")
  private val out = java.nio.file.Files.newBufferedWriter(temp,
    java.nio.charset.StandardCharsets.UTF_8)
  private val idx = fields.zipWithIndex.toMap

  /** Doubles render integer-exact where possible so integer-coordinate
    * fixtures round-trip byte-identically through any JSON parser. */
  private def num(d: Double): String =
    if (d == Math.rint(d) && Math.abs(d) < 1e15) d.toLong.toString
    else d.toString

  private def esc(s: String): String = {
    val b = new StringBuilder
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.toString
  }

  override def write(row: InternalRow): Unit = {
    val b = new StringBuilder("{\"type\":\"Feature\"")
    idx.get("id").foreach { i =>
      if (!row.isNullAt(i))
        b.append(",\"id\":\"").append(esc(row.getUTF8String(i).toString))
          .append('"')
    }
    val gtype = idx.get("gtype")
      .filterNot(row.isNullAt).map(i => row.getUTF8String(i).toString)
    val ring = idx.get("ring").filterNot(row.isNullAt).map(row.getArray)
    (gtype, ring) match {
      case (Some(t), Some(r)) =>
        b.append(",\"geometry\":{\"type\":\"").append(esc(t))
          .append("\",\"coordinates\":[[")
        var i = 0
        while (i < r.numElements()) {
          if (i > 0) b.append(',')
          val pt = r.getArray(i)
          b.append('[')
          var j = 0
          while (j < pt.numElements()) {
            if (j > 0) b.append(',')
            b.append(num(pt.getDouble(j)))
            j += 1
          }
          b.append(']')
          i += 1
        }
        b.append("]]}")
      case _ => b.append(",\"geometry\":null")
    }
    b.append(",\"properties\":{")
    idx.get("props").filterNot(row.isNullAt).foreach { i =>
      val m = row.getMap(i)
      var k = 0
      while (k < m.numElements()) {
        if (k > 0) b.append(',')
        b.append('"').append(esc(m.keyArray().getUTF8String(k).toString))
          .append("\":\"")
          .append(esc(m.valueArray().getUTF8String(k).toString)).append('"')
        k += 1
      }
    }
    b.append("}}")
    out.write(b.toString)
    out.newLine()
  }

  override def commit()
      : org.apache.spark.sql.connector.write.WriterCommitMessage = {
    out.close()
    GeoJsonShardCommit(temp.toString, f"shard-$partitionId%05d.jsonl")
  }

  override def abort(): Unit = {
    out.close()
    java.nio.file.Files.deleteIfExists(temp)
  }

  override def close(): Unit = ()
}
