package graft.tables

import java.nio.file.Paths
import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport}
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types => PTypes}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.connector.write.{DataWriter, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperationBuilder, RowLevelOperationInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** [[SnapshotTable]] as a Structured Streaming SOURCE:
  * `spark.readStream.format("graft-table").option("path", root)`
  * turns the table's commit log into a micro-batch stream — each
  * trigger delivers the files ADDED since the last committed offset,
  * composing with watermarks, windowed aggregates and stateful ops,
  * and replacing [[TableTail]]'s driver-side poll for standing
  * queries (TableTail stays for scheduler-driven batch consumers).
  *
  * Offset design: the offset IS the committed table version — unlike
  * the cursor-token sources (CameraStreamSource), versions are
  * durable and replayable, so a restarted query re-plans exactly the
  * versions after its checkpointed offset and the source is
  * end-to-end exactly-once with a transactional or idempotent sink
  * (e.g. [[SnapshotTable.appendOnce]] downstream). `latestOffset`
  * is a manifest listing (O(1) metadata); `planInputPartitions`
  * diffs two manifests ([[SnapshotTable.addedFiles]] semantics) and
  * emits ONE partition PER ADDED FILE, so a large append fans out
  * across executors while untouched history is never re-read.
  *
  * Options:
  *  - `path` (required): table root;
  *  - `startingVersion` (default 0): first delivered batch covers
  *    (startingVersion, latest]; pass `latest` to consume only
  *    commits after stream start;
  *  - `readChangeFeed` (default false): stream the ROW-LEVEL change
  *    feed ([[SnapshotTable.rowChangesBetween]] semantics) instead of
  *    added files — rows carry `_change_type`
  *    (insert/update_preimage/update_postimage/delete), merge commits
  *    deliver their recorded changelog, appends derive inserts, and a
  *    non-tracking commit fails the query loudly.
  *
  * The per-file reader decodes parquet via the public
  * parquet-hadoop Group API (primitive columns: boolean, int32
  * incl. date, int64 incl. timestamp micros/millis, int96
  * timestamps, float, double, binary strings) — self-contained and
  * executor-side. On a production cluster the natural upgrade is
  * swapping the reader factory for Spark's vectorized parquet
  * reader; the source's offset/planning contract (the part this
  * class owns) is unchanged by that swap. Nested/array columns are
  * rejected at schema-inference time rather than silently mis-read.
  */
class GraftTableSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-table"

  /** Write-side table resolution passes the QUERY's schema to
    * getTable (so `writeStream.format("graft-table")` can create a
    * fresh, never-committed table); read-side with no user schema
    * still goes through [[inferSchema]]. */
  override def supportsExternalMetadata(): Boolean = true

  private def rootOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, "graft-table requires option(\"path\", <table root>)")
    p
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val root = Paths.get(rootOf(options))
    val v = Option(options.get("versionAsOf")).map(_.toLong)
      .orElse(Option(options.get("timestampAsOf")).map(ts =>
        SnapshotTable.versionAtTs(root, ts.toLong)))
      .getOrElse(SnapshotTable.currentVersionAt(root))
    require(v > 0, s"graft-table at $root has no committed version to infer a schema from")
    val schema = SnapshotTable.schemaAt(root, v)
    schema.fields.foreach { f =>
      require(GraftTableReaderFactory.supported(f.dataType),
        s"graft-table streaming reader does not support column ${f.name}: ${f.dataType}")
    }
    if (options.getBoolean("readChangeFeed", false))
      schema.add(SnapshotTable.ChangeTypeCol, StringType, nullable = false)
    else schema
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new GraftTableStreamTable(schema, properties.asScala.toMap)
}

class GraftTableStreamTable(tableSchema: StructType, options: Map[String, String])
    extends Table with SupportsRead with SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations
    with org.apache.spark.sql.connector.catalog.SupportsDeleteV2
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns {
  override def name(): String = s"graft_table(${options.getOrElse("path", "?")})"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(
      TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.STREAMING_WRITE)

  // ---- standard SQL row-level DML --------------------------------------

  /** Row addresses as METADATA columns — the rowId of the delta-based
    * row-level protocol, synthesized by the batch reader, never
    * stored. Also directly queryable (`SELECT __graft_file, ... FROM
    * t` — handy for audits), like Iceberg's _file/_pos. */
  override def metadataColumns(): Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    Array(
      new org.apache.spark.sql.connector.catalog.MetadataColumn {
        override def name(): String = GraftRowMeta.FileCol
        override def dataType(): org.apache.spark.sql.types.DataType = StringType
        override def isNullable: Boolean = false
        override def comment(): String = "data file address (dir/name) of the row"
      },
      new org.apache.spark.sql.connector.catalog.MetadataColumn {
        override def name(): String = GraftRowMeta.PosCol
        override def dataType(): org.apache.spark.sql.types.DataType = LongType
        override def isNullable: Boolean = false
        override def comment(): String = "physical row index within the data file"
      })

  /** `UPDATE` / `MERGE INTO` / subquery-`DELETE`: the delta-based
    * row-level rewrite ([[GraftRowLevelOperation]]). */
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    () => new GraftRowLevelOperation(options, tableSchema, info.command())

  /** Simple `DELETE FROM t WHERE p`: Spark's metadata-delete path —
    * accepted only when every conjunct translates, and then routed to
    * [[SnapshotTable.delete]] (DV tombstones, file-drop detection,
    * CDC pre-images). Untranslatable conditions refuse and fall back
    * to the row-level rewrite above. */
  override def canDeleteWhere(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate]): Boolean =
    predicates.forall(p => GraftRowMeta.predicateToColumn(p).isDefined)

  override def deleteWhere(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit = {
    val cond = predicates.toSeq.map(p => GraftRowMeta.predicateToColumn(p)
      .getOrElse(throw new UnsupportedOperationException(
        s"untranslatable delete predicate: $p")))
      .reduceOption(_ && _)
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    new SnapshotTable(SparkSession.active, options("path")).delete(cond)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with org.apache.spark.sql.connector.write.SupportsTruncate {
      private var doTruncate = false
      override def truncate(): WriteBuilder = { doTruncate = true; this }
      override def build(): Write = new Write {
        override def toStreaming: StreamingWrite = {
          require(!doTruncate,
            "graft-table streaming sink supports append epochs only")
          new GraftTableStreamingWrite(options("path"), info.schema(), info.queryId())
        }
        override def toBatch: org.apache.spark.sql.connector.write.BatchWrite =
          new GraftTableBatchWrite(options("path"), info.schema(), info.queryId(),
            truncate = doTruncate)
      }
    }

  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new GraftTableScanBuilder(options ++ o.asScala, tableSchema)
}

/** The committed table version (0 = before the first commit). */
case class GraftTableOffset(version: Long) extends Offset {
  override def json(): String = s"""{"version":$version}"""
}

/** `writeStream.format("graft-table")` — the commit log as a SINK,
  * end-to-end EXACTLY-ONCE: executors write their micro-batch
  * partitions as parquet part files into a per-epoch staging dir
  * under `data/` (data-sized, fully parallel), and the driver's
  * `commit(epochId, …)` publishes ONE manifest appending exactly
  * those files, carrying the epoch id as the idempotence ledger
  * ([[SnapshotTable.appendFilesOnce]]): a replayed epoch (the
  * at-least-once window between the sink committing and the engine's
  * own offset-log write) finds its batchId already committed and
  * publishes nothing — no duplicate version, no duplicate rows —
  * while a crash BEFORE commit leaves only unreferenced staging files
  * that vacuum reclaims. Concurrent writers compose: the publish CAS
  * retries with a fresh carry list (the staged files are disjoint by
  * construction).
  *
  * Unlike `foreachBatch { appendOnce }` (which funnels the batch
  * through one driver-coordinated DataFrame write job), the sink
  * path writes data purely executor-side and commits metadata-only —
  * and it composes with any readStream source, including
  * `graft-table` itself (table→table streaming pipelines). */
class GraftTableStreamingWrite(root: String, schema: StructType, queryId: String)
    extends StreamingWrite {
  schema.fields.foreach { f =>
    require(GraftTableReaderFactory.supported(f.dataType),
      s"graft-table sink does not support column ${f.name}: ${f.dataType}")
  }

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    // epochs appended to a column-mapped table stage their parts
    // under the table's PHYSICAL names
    val writeSchema = SnapshotTable.physApplied(schema,
      SnapshotTable.physMapAt(java.nio.file.Paths.get(root),
        SnapshotTable.currentVersionAt(java.nio.file.Paths.get(root))))
    new GraftTableWriterFactory(root, writeSchema.json)
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    // per-file counts ride the epoch's write-task commit messages —
    // `#rows=` lines land without any driver-side footer read
    val counted = messages.collect {
      case GraftTableWriteMessage(rel, n) if n > 0 => rel -> n
    }
    val rels = counted.map(_._1).sorted
    val table = new SnapshotTable(SparkSession.active, root)
    // the ledger key is (queryId, epochId): replays of THIS query's
    // epoch are dropped, while a different query's epoch 0 appends
    if (table.appendFilesOnce(rels.toSeq, schema, epochId, queryId,
        stagedRows = Some(counted.toMap)).isEmpty) {
      // replayed epoch: its staged files are duplicates — drop them
      // (the committed version references the FIRST attempt's files)
      rels.foreach { rel =>
        try java.nio.file.Files.deleteIfExists(Paths.get(root).resolve(rel))
        catch { case _: java.io.IOException => () }
      }
    }
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case GraftTableWriteMessage(rel, _) =>
        try java.nio.file.Files.deleteIfExists(Paths.get(root).resolve(rel))
        catch { case _: java.io.IOException => () }
      case _ => ()
    }
}

case class GraftTableWriteMessage(relPath: String, rows: Long)
  extends WriterCommitMessage

class GraftTableWriterFactory(root: String, schemaJson: String)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] = {
    val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
    new GraftTableDataWriter(root, schema, partitionId, taskId, s"stream-epoch$epochId")
  }
}

/** Executor-side parquet writer (public parquet-hadoop Group API;
  * same type coverage as the reader, INT64-micros timestamps). Each
  * task owns one part file under a per-write staging prefix (one per
  * streaming epoch or batch query); the file becomes durable table
  * state only when the driver's manifest commit references it. */
class GraftTableDataWriter(root: String, schema: StructType,
    partitionId: Int, taskId: Long, stagingTag: String)
    extends DataWriter[InternalRow] {

  private val rel =
    s"data/$stagingTag/part-$partitionId-$taskId-${java.util.UUID.randomUUID()}.parquet"
  private val abs = Paths.get(root).resolve(rel)
  java.nio.file.Files.createDirectories(abs.getParent)

  private val messageType: MessageType = GraftTableDataWriter.toParquetType(schema)
  private val factory = new SimpleGroupFactory(messageType)
  private var rows = 0L

  private val writer = {
    val conf = new Configuration()
    org.apache.parquet.hadoop.example.GroupWriteSupport.setSchema(messageType, conf)
    ExampleParquetWriter.builder(new org.apache.hadoop.fs.Path(abs.toString))
      .withConf(conf)
      .withType(messageType)
      .build()
  }

  override def write(row: InternalRow): Unit = {
    val g = factory.newGroup()
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      if (!row.isNullAt(i)) f.dataType match {
        case BooleanType => g.add(f.name, row.getBoolean(i))
        case ByteType => g.add(f.name, row.getByte(i).toInt)
        case ShortType => g.add(f.name, row.getShort(i).toInt)
        case IntegerType | DateType => g.add(f.name, row.getInt(i))
        case LongType | TimestampType => g.add(f.name, row.getLong(i))
        case FloatType => g.add(f.name, row.getFloat(i))
        case DoubleType => g.add(f.name, row.getDouble(i))
        case StringType =>
          g.add(f.name, Binary.fromConstantByteArray(row.getUTF8String(i).getBytes))
        case BinaryType =>
          g.add(f.name, Binary.fromConstantByteArray(row.getBinary(i)))
        case other => throw new UnsupportedOperationException(
          s"graft-table sink: column ${f.name} $other")
      }
    }
    writer.write(g)
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    writer.close()
    if (rows == 0L) {
      // empty partition: no point publishing a zero-row file
      try java.nio.file.Files.deleteIfExists(abs)
      catch { case _: java.io.IOException => () }
    }
    GraftTableWriteMessage(rel, rows)
  }

  override def abort(): Unit = {
    try writer.close() catch { case _: Throwable => () }
    try java.nio.file.Files.deleteIfExists(abs)
    catch { case _: java.io.IOException => () }
  }

  override def close(): Unit = ()
}

object GraftTableDataWriter {
  /** StructType → parquet MessageType, matching the reader's decode
    * (timestamps as INT64 TIMESTAMP(MICROS, adjustedToUTC), dates as
    * INT32 DATE, strings as BINARY STRING). */
  private[tables] def toParquetType(schema: StructType): MessageType = {
    val builder = PTypes.buildMessage()
    schema.fields.foreach { f =>
      import PrimitiveTypeName._
      val (prim, ann) = f.dataType match {
        case BooleanType => (BOOLEAN, None)
        case ByteType => (INT32, Some(LogicalTypeAnnotation.intType(8, true)))
        case ShortType => (INT32, Some(LogicalTypeAnnotation.intType(16, true)))
        case IntegerType => (INT32, None)
        case DateType => (INT32, Some(LogicalTypeAnnotation.dateType()))
        case LongType => (INT64, None)
        case TimestampType => (INT64, Some(LogicalTypeAnnotation.timestampType(
          true, LogicalTypeAnnotation.TimeUnit.MICROS)))
        case FloatType => (FLOAT, None)
        case DoubleType => (DOUBLE, None)
        case StringType => (BINARY, Some(LogicalTypeAnnotation.stringType()))
        case BinaryType => (BINARY, None)
        case other => throw new UnsupportedOperationException(
          s"graft-table sink: unsupported type $other for ${f.name}")
      }
      val field = PTypes.optional(prim)
      builder.addField(ann.fold(field)(field.as).named(f.name))
    }
    builder.named("graft_table")
  }
}

class GraftTableMicroBatchStream(root: String, startingVersion: String,
    schema: StructType, changeFeed: Boolean = false,
    maxVersionsPerTrigger: Option[Long] = None)
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  private val rootPath = Paths.get(root)

  /** Trigger.AvailableNow: the version pinned at query start — the
    * stream drains up to it and terminates, never chasing commits
    * that land mid-drain (exact run-to-completion semantics). */
  @volatile private var pinnedVersion: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    pinnedVersion = Some(SnapshotTable.currentVersionAt(rootPath))

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def initialOffset(): Offset = {
    val v = startingVersion match {
      case "latest" => SnapshotTable.currentVersionAt(rootPath)
      case s => s.toLong
    }
    GraftTableOffset(v)
  }

  override def latestOffset(): Offset =
    GraftTableOffset(pinnedVersion.getOrElse(SnapshotTable.currentVersionAt(rootPath)))

  /** Admission control: `maxVersionsPerTrigger` caps how many commits
    * one micro-batch ingests — a catch-up read over a long commit
    * chain proceeds in bounded steps instead of one giant batch
    * (Delta's maxFilesPerTrigger, at this source's natural commit
    * granularity). Composes with Trigger.AvailableNow: the drain
    * still terminates at the pinned version, just in capped steps. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val target = pinnedVersion.getOrElse(SnapshotTable.currentVersionAt(rootPath))
    val s = start.asInstanceOf[GraftTableOffset].version
    GraftTableOffset(maxVersionsPerTrigger.fold(target)(m => math.min(target, s + m)))
  }

  override def deserializeOffset(json: String): Offset = {
    val v = "\"version\":(\\d+)".r.findFirstMatchIn(json)
      .map(_.group(1).toLong)
      .getOrElse(throw new IllegalArgumentException(s"bad graft-table offset: $json"))
    GraftTableOffset(v)
  }

  /** Files in `end`'s manifest but not `start`'s — the same
    * metadata-only diff as [[SnapshotTable.addedFiles]], spanning all
    * versions in (start, end] in one step (append chains carry files
    * forward, so the end manifest covers the intermediate commits).
    * In `readChangeFeed` mode the walk is PER VERSION instead: each
    * commit contributes its recorded `#cdc=` changelog files (the
    * `_change_type` column is IN those files), or its added files
    * tagged `insert` for appends — [[SnapshotTable.rowChangesBetween]]
    * as a streaming plan. */
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftTableOffset].version
    val e = end.asInstanceOf[GraftTableOffset].version
    if (e <= s) return Array.empty
    def filesAt(v: Long): Vector[String] =
      if (v == 0L) Vector.empty
      else SnapshotTable.manifestFilesOf(SnapshotTable.manifestLinesAt(rootPath, v))
    if (!changeFeed) {
      val before = filesAt(s).toSet
      filesAt(e).filterNot(before)
        .map(rel => GraftTableFilePartition(
          rootPath.resolve(rel).toString): InputPartition)
        .toArray
    } else ((s + 1) to e).iterator.flatMap { v =>
      val lines = SnapshotTable.manifestLinesAt(rootPath, v)
      if (SnapshotTable.cdcTrackedOf(lines))
        SnapshotTable.manifestCdcFilesOf(lines).map(rel =>
          GraftTableFilePartition(rootPath.resolve(rel).toString))
      else if (SnapshotTable.isAppendCommitOf(lines)) {
        val before = filesAt(v - 1).toSet
        SnapshotTable.manifestFilesOf(lines).filterNot(before).map(rel =>
          GraftTableFilePartition(rootPath.resolve(rel).toString,
            literalChangeType = Some("insert")))
      } else throw new IllegalStateException(
        s"graft-table change feed: version $v at $root does not track " +
          "row-level changes (written by plain commit)")
    }.map(p => p: InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // executors resolve data-file columns by PHYSICAL name (stable
    // across renames, so one mapping serves every trigger); CDC
    // `#cdc=` files are written under logical names — no mapping on
    // those — but APPEND-derived change-feed partitions are ordinary
    // data files under physical names, so the factory carries the map
    // and applies it per-partition (literalChangeType-tagged only).
    val physMap = SnapshotTable.physMapAt(
      rootPath, SnapshotTable.currentVersionAt(rootPath))
    val decodeSchema =
      if (changeFeed) schema
      else SnapshotTable.physApplied(schema, physMap)
    new GraftTableReaderFactory(decodeSchema.json, allowColumnar = !changeFeed,
      readConf = GraftReadConf.capture(),
      appendPhysMap = if (changeFeed) physMap else Map.empty)
  }

  /** Versions are durable, immutable, and re-derivable from the
    * manifest log — nothing to release on commit. */
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** One data (or changelog) file; `literalChangeType` is set for
  * append-derived change-feed partitions, whose files carry no
  * `_change_type` column — the reader appends the constant. */
case class GraftTableFilePartition(absPath: String,
    literalChangeType: Option[String] = None) extends InputPartition

object GraftTableReaderFactory {
  /** Types the Group-API decoder handles: the primitive set, plus
    * ONE-LEVEL arrays of those primitives (embedding vectors are a
    * first-class table column — an ANN index's inverted lists live in
    * graft tables). Deeper nesting stays rejected at inference time
    * rather than silently mis-read. */
  def supported(dt: DataType): Boolean = dt match {
    case BooleanType | IntegerType | LongType | FloatType | DoubleType |
         StringType | BinaryType | DateType | TimestampType |
         ByteType | ShortType => true
    case org.apache.spark.sql.types.ArrayType(et, _) => et match {
      case BooleanType | IntegerType | LongType | FloatType | DoubleType |
           StringType | BinaryType | ByteType | ShortType => true
      case _ => false
    }
    case _ => false
  }

  private val JulianEpochDay = 2440588L

  /** INT96 timestamp: 8 LE bytes nanos-of-day + 4 LE bytes Julian day. */
  private[tables] def int96ToMicros(bytes: Array[Byte]): Long = {
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val nanosOfDay = buf.getLong
    val julianDay = buf.getInt
    (julianDay - JulianEpochDay) * 86400000000L + nanosOfDay / 1000L
  }
}

/** Executor-side per-file reader: ordinary data files stream through
  * the VECTORIZED columnar path ([[GraftVectorized]] — ColumnarBatch
  * straight into whole-stage codegen); change-feed partitions that
  * synthesize a literal `_change_type` keep the row-at-a-time Group
  * decode (matching columns BY NAME so file-level field order never
  * matters). */
class GraftTableReaderFactory(schemaJson: String,
    allowColumnar: Boolean = true,
    readConf: GraftReadConf = GraftReadConf.capture(),
    appendPhysMap: Map[String, String] = Map.empty)
    extends PartitionReaderFactory {
  @transient private lazy val streamSchema: StructType =
    DataType.fromJson(schemaJson).asInstanceOf[StructType]

  override def supportColumnarReads(p: InputPartition): Boolean = p match {
    case fp: GraftTableFilePartition =>
      GraftVectorized.eligible(allowColumnar, streamSchema, Int.MaxValue)
    case _ => false
  }

  override def createColumnarReader(
      p: InputPartition): PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    GraftVectorized.createReader(
      p.asInstanceOf[GraftTableFilePartition].absPath, streamSchema,
      readConf)

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val fullSchema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
    val part = p.asInstanceOf[GraftTableFilePartition]
    val path = part.absPath
    // append-derived change-feed files carry no _change_type column:
    // decode the table fields from the file, append the constant —
    // and resolve them by PHYSICAL name (appends stage under the
    // mapping; `#cdc=` files, which take the literal=None path, stay
    // logical)
    val literal = part.literalChangeType.map(UTF8String.fromString)
    val schema = {
      val s = if (literal.isDefined) StructType(fullSchema.fields.init) else fullSchema
      if (literal.isDefined && appendPhysMap.nonEmpty)
        SnapshotTable.physApplied(s, appendPhysMap)
      else s
    }
    new PartitionReader[InternalRow] {
      private val reader: ParquetReader[Group] =
        ParquetReader.builder(new GroupReadSupport(), new org.apache.hadoop.fs.Path(path))
          .withConf(new Configuration()).build()
      private var current: InternalRow = _

      // per-field decoders resolve ONCE (index, physical type, list
      // layout, timestamp unit) from the first row's file schema —
      // constant for every row of the file — and the per-row loop is
      // null-check + direct accessor, the same resolve-once design as
      // the batch reader (GraftTableBatch.scala). Built lazily because
      // the Group API only surfaces the file schema with a row in hand.
      private var decoders: Array[Group => Any] = _
      private def buildDecoders(
          gType: org.apache.parquet.schema.GroupType): Array[Group => Any] =
        schema.fields.map { f =>
          // a file older than a schema evolution lacks the new column
          // entirely — surface NULL, like the batch reader
          if (!gType.containsField(f.name)) (_: Group) => null
          else {
            val idx = gType.getFieldIndex(f.name)
            val leaf = GraftTableBatchReaderFactory.decoderFor(gType, idx, f)
            (g: Group) =>
              if (g.getFieldRepetitionCount(idx) == 0) null else leaf(g)
          }
        }

      private def convert(g: Group): InternalRow = {
        if (decoders == null) decoders = buildDecoders(g.getType)
        val out = new Array[Any](decoders.length + (if (literal.isDefined) 1 else 0))
        var i = 0
        while (i < decoders.length) { out(i) = decoders(i)(g); i += 1 }
        literal.foreach(out(decoders.length) = _)
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
      }

      override def next(): Boolean = {
        val g = reader.read()
        if (g == null) false
        else { current = convert(g); true }
      }
      override def get(): InternalRow = current
      override def close(): Unit = reader.close()
    }
  }
}
