package graft.tables

import java.nio.file.Paths
import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types => PTypes}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.functions.{lit, not}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Standard SQL row-level DML for graft tables — `DELETE FROM`,
  * `UPDATE`, `MERGE INTO` from ANY Spark SQL client, landing on the
  * table's deletion-vector machinery with no engine-specific verbs in
  * sight. This is the reference's core PATCH-or-POST upsert loop
  * (reference task.ts:228-271) expressible as one `MERGE INTO`
  * statement.
  *
  * Design: the DELTA-based DSv2 row-level protocol
  * ([[org.apache.spark.sql.connector.write.SupportsDelta]]) — the
  * same shape Iceberg's position-delta writes use — because it IS the
  * deletion-vector design: Spark rewrites the statement into a scan
  * that carries each row's ADDRESS (`__graft_file`, `__graft_pos` —
  * synthesized metadata columns, never stored), and streams
  * delete/update/insert verdicts to [[GraftDeltaWriter]]s that stage
  * tombstones as DV sidecar parts and new images as ordinary data
  * parts, all executor-side. The driver's commit is one atomic
  * manifest publish ([[SnapshotTable.commitDelta]]): O(changed rows)
  * data, O(1) metadata, no data file rewritten — exactly what a
  * 100 TB CDC upsert needs. Copy-on-write MERGE would rewrite every
  * touched FILE; this writes only the touched ROWS.
  *
  * Simple `DELETE FROM t WHERE <translatable>` never reaches this
  * plan: Spark's metadata-delete optimization routes it to
  * [[GraftTableStreamTable.deleteWhere]] (SupportsDeleteV2), which is
  * [[SnapshotTable.delete]] — file-drop detection, CDC pre-images and
  * all.
  */
object GraftRowMeta {
  /** Metadata column: the row's data-file address (dir/name — the
    * same [[SnapshotTable.dvAddressOf]] domain the DV sidecars key
    * by). */
  val FileCol = "__graft_file"
  /** Metadata column: the row's physical index within its file. */
  val PosCol = "__graft_pos"

  /** V2 Predicate → Column, EXACT by construction: every node must
    * translate or the whole predicate refuses (None) and Spark plans
    * the full row-level rewrite instead. Deliberately NOT Spark's
    * `PredicateUtils.toV1`, which approximates — it rewrites
    * `(k % 2 = 0) OR (k > 90)` to `k > 90`, sound for conjunctive
    * scan pushdown (residual filters restore exactness) but silently
    * WRONG as a DELETE condition. A metadata delete has no residual:
    * the translated condition IS the semantics, so only a total
    * translation is acceptable. */
  def predicateToColumn(
      p: org.apache.spark.sql.connector.expressions.filter.Predicate): Option[Column] = {
    import org.apache.spark.sql.connector.expressions.{Expression => V2Expr, Literal => V2Literal, NamedReference}
    import org.apache.spark.sql.connector.expressions.filter.{Predicate => V2Predicate}
    import org.apache.spark.sql.graftbridge.Bridge

    def exprToColumn(e: V2Expr): Option[Column] = e match {
      case r: NamedReference if r.fieldNames().length == 1 =>
        Some(Bridge.column(
          org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(
            r.fieldNames().toIndexedSeq)))
      case l: V2Literal[_] =>
        // V2 literals carry CATALYST-internal values + the DataType —
        // a catalyst Literal round-trips them exactly (UTF8String,
        // epoch micros/days, Decimal included)
        Some(Bridge.column(
          org.apache.spark.sql.catalyst.expressions.Literal(l.value(), l.dataType())))
      case sub: V2Predicate => predToColumn(sub)
      case _ => None // GeneralScalarExpression etc.: not translatable
    }

    def two(p2: V2Predicate)(f: (Column, Column) => Column): Option[Column] =
      p2.children() match {
        case Array(a, b) =>
          for { ca <- exprToColumn(a); cb <- exprToColumn(b) } yield f(ca, cb)
        case _ => None
      }
    def one(p2: V2Predicate)(f: Column => Column): Option[Column] =
      p2.children() match {
        case Array(a) => exprToColumn(a).map(f)
        case _ => None
      }

    def predToColumn(p2: V2Predicate): Option[Column] = p2.name() match {
      case "=" => two(p2)(_ === _)
      case "<=>" => two(p2)(_ <=> _)
      case ">" => two(p2)(_ > _)
      case ">=" => two(p2)(_ >= _)
      case "<" => two(p2)(_ < _)
      case "<=" => two(p2)(_ <= _)
      case "<>" | "!=" => two(p2)(_ =!= _)
      case "AND" => two(p2)(_ && _)
      case "OR" => two(p2)(_ || _)
      case "NOT" => one(p2)(not)
      case "IS_NULL" => one(p2)(_.isNull)
      case "IS_NOT_NULL" => one(p2)(_.isNotNull)
      case "STARTS_WITH" => two(p2)((c, v) => c.startsWith(v))
      case "ENDS_WITH" => two(p2)((c, v) => c.endsWith(v))
      case "CONTAINS" => two(p2)((c, v) => c.contains(v))
      case "IN" if p2.children().nonEmpty =>
        val cols = p2.children().map(exprToColumn)
        if (cols.exists(_.isEmpty)) None
        else Some(cols.head.get.isin(cols.tail.map(_.get).toIndexedSeq: _*))
      case "ALWAYS_TRUE" => Some(lit(true))
      case "ALWAYS_FALSE" => Some(lit(false))
      case _ => None
    }

    predToColumn(p)
  }
}

/** One SQL statement's row-level operation. The snapshot version is
  * pinned HERE — scan and commit agree on the file set tombstone
  * addresses refer to, however long the statement runs. */
class GraftRowLevelOperation(options: Map[String, String],
    tableSchema: StructType, cmd: RowLevelOperation.Command)
    extends RowLevelOperation with SupportsDelta {
  private val root = options("path")
  private val pinnedVersion = SnapshotTable.currentVersionAt(Paths.get(root))

  override def command(): RowLevelOperation.Command = cmd

  override def description(): String = s"graft-table $cmd v$pinnedVersion"

  /** The rowId IS the deletion-vector address. */
  override def rowId(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(Expressions.column(GraftRowMeta.FileCol),
      Expressions.column(GraftRowMeta.PosCol))

  override def requiredMetadataAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array.empty

  /** The statement's read side: the ordinary pushdown-capable batch
    * scan (manifest pruning, DV application, projection) pinned to
    * the operation's snapshot, emitting the row-address metadata
    * columns when the rewrite asks for them. */
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new GraftTableScanBuilder(
      options ++ o.asScala + ("versionAsOf" -> pinnedVersion.toString), tableSchema)

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = {
        // staged parts (MERGE inserts / UPDATE post-images) land under
        // the table's PHYSICAL column names when the schema is mapped
        val writeSchema = SnapshotTable.physApplied(tableSchema,
          SnapshotTable.physMapAt(Paths.get(root), pinnedVersion))
        new GraftDeltaWrite(root, writeSchema, info.queryId(), pinnedVersion,
          s"SQL-$cmd")
      }
    }
}

class GraftDeltaWrite(root: String, schema: StructType, queryId: String,
    baseVersion: Long, op: String) extends DeltaWrite {
  override def toBatch: DeltaBatchWrite =
    new GraftDeltaBatchWrite(root, schema, queryId, baseVersion, op)
  override def description(): String = s"graft-table delta write $op"
}

case class GraftDeltaWriteMessage(insRel: Option[String], insRows: Long,
    updRel: Option[String], updRows: Long,
    dvRel: Option[String], tombstones: Long) extends WriterCommitMessage

/** Driver-side commit of a statement's staged delta: collects the
  * executors' DV sidecar parts and data parts into ONE
  * [[SnapshotTable.commitDelta]] manifest publish. A statement that
  * matched nothing commits nothing (the table version does not
  * move). */
class GraftDeltaBatchWrite(root: String, schema: StructType, queryId: String,
    baseVersion: Long, op: String) extends DeltaBatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DeltaWriterFactory =
    new GraftDeltaWriterFactory(root, schema.json, queryId)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val msgs = messages.collect { case m: GraftDeltaWriteMessage => m }
    val dvRels = msgs.flatMap(_.dvRel).toSeq
    val insRels = msgs.flatMap(_.insRel).toSeq
    val updRels = msgs.flatMap(_.updRel).toSeq
    if (dvRels.isEmpty && insRels.isEmpty && updRels.isEmpty) return // matched nothing
    // per-file counts ride the delta writers' commit messages — the
    // driver publishes `#rows=` without re-opening parquet footers
    val counted: Map[String, Long] =
      (msgs.flatMap(m => m.insRel.map(_ -> m.insRows)) ++
        msgs.flatMap(m => m.updRel.map(_ -> m.updRows))).toMap
    val table = new SnapshotTable(SparkSession.active, root)
    try table.commitDelta(baseVersion, dvRels, insRels, updRels, op,
      stagedRows = Some(counted))
    catch { case e: Throwable => cleanup(dvRels ++ insRels ++ updRels); throw e }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    cleanup(messages.collect { case m: GraftDeltaWriteMessage => m }
      .flatMap(m => m.dvRel.toSeq ++ m.insRel.toSeq ++ m.updRel.toSeq).toSeq)

  private def cleanup(rels: Seq[String]): Unit = rels.foreach { rel =>
    try java.nio.file.Files.deleteIfExists(Paths.get(root).resolve(rel))
    catch { case _: java.io.IOException => () }
  }
}

class GraftDeltaWriterFactory(root: String, schemaJson: String,
    queryId: String) extends DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] = {
    val schema = org.apache.spark.sql.types.DataType.fromJson(schemaJson)
      .asInstanceOf[StructType]
    new GraftDeltaWriter(root, schema, partitionId, taskId, s"dml-$queryId")
  }
}

/** Executor-side delta writer for one task: MERGE inserts and update
  * post-images stream into SEPARATE staged data parts
  * ([[GraftTableDataWriter]] each — the split is what lets the commit
  * mint `insert` vs `update_postimage` change-feed rows without
  * re-deriving anything); delete/update tombstone addresses buffer,
  * sort by (file, pos) and flush as one DV sidecar part at commit —
  * the same clustered layout [[SnapshotTable.delete]] writes, so the
  * batch scan's per-file sidecar filter keeps its row-group
  * skipping. The sidecar carries a third `u` column (update vs
  * delete) that only the commit's CDC pass reads — scan-side readers
  * project (file, pos) and never see it. Memory is O(this task's
  * tombstones): 16 bytes a row plus the address string, bounded by
  * the statement's match partition, not the table. */
class GraftDeltaWriter(root: String, schema: StructType,
    partitionId: Int, taskId: Long, stagingTag: String)
    extends DeltaWriter[InternalRow] {

  private var insWriter: GraftTableDataWriter = _
  private var updWriter: GraftTableDataWriter = _
  private def ins: GraftTableDataWriter = {
    if (insWriter == null)
      insWriter = new GraftTableDataWriter(root, schema, partitionId, taskId,
        s"$stagingTag-ins")
    insWriter
  }
  private def upd: GraftTableDataWriter = {
    if (updWriter == null)
      updWriter = new GraftTableDataWriter(root, schema, partitionId, taskId,
        s"$stagingTag-upd")
    updWriter
  }

  private val tombstones = ArrayBuffer.empty[(String, Long, Boolean)]

  override def insert(row: InternalRow): Unit = ins.write(row)

  override def delete(metadata: InternalRow, id: InternalRow): Unit =
    tombstones += ((id.getUTF8String(0).toString, id.getLong(1), false))

  override def update(metadata: InternalRow, id: InternalRow, row: InternalRow): Unit = {
    tombstones += ((id.getUTF8String(0).toString, id.getLong(1), true))
    upd.write(row)
  }

  private def writeDvPart(): Option[String] = {
    if (tombstones.isEmpty) return None
    val rel = s"data/$stagingTag-dv/part-$partitionId-$taskId-${java.util.UUID.randomUUID()}.parquet"
    val abs = Paths.get(root).resolve(rel)
    java.nio.file.Files.createDirectories(abs.getParent)
    val msgType: MessageType = PTypes.buildMessage()
      .addField(PTypes.required(PrimitiveTypeName.BINARY)
        .as(LogicalTypeAnnotation.stringType()).named(SnapshotTable.DvFileCol))
      .addField(PTypes.required(PrimitiveTypeName.INT64)
        .named(SnapshotTable.DvPosCol))
      .addField(PTypes.required(PrimitiveTypeName.BOOLEAN)
        .named(SnapshotTable.DvUpdCol))
      .named("graft_dv")
    val conf = new Configuration()
    org.apache.parquet.hadoop.example.GroupWriteSupport.setSchema(msgType, conf)
    val writer = ExampleParquetWriter.builder(
      new org.apache.hadoop.fs.Path(abs.toString))
      .withConf(conf).withType(msgType).build()
    try {
      val factory = new org.apache.parquet.example.data.simple.SimpleGroupFactory(msgType)
      tombstones.sortInPlace()(Ordering.by(t => (t._1, t._2)))
      tombstones.foreach { case (f, p, u) =>
        val g = factory.newGroup()
        g.add(SnapshotTable.DvFileCol, Binary.fromString(f))
        g.add(SnapshotTable.DvPosCol, p)
        g.add(SnapshotTable.DvUpdCol, u)
        writer.write(g)
      }
    } finally writer.close()
    Some(rel)
  }

  override def commit(): WriterCommitMessage = {
    def done(w: GraftTableDataWriter): Option[GraftTableWriteMessage] =
      Option(w).map(_.commit().asInstanceOf[GraftTableWriteMessage])
        .filter(_.rows > 0)
    val insMsg = done(insWriter)
    val updMsg = done(updWriter)
    val dvRel = writeDvPart()
    GraftDeltaWriteMessage(insMsg.map(_.relPath), insMsg.fold(0L)(_.rows),
      updMsg.map(_.relPath), updMsg.fold(0L)(_.rows),
      dvRel, tombstones.size.toLong)
  }

  override def abort(): Unit = {
    Option(insWriter).foreach(_.abort())
    Option(updWriter).foreach(_.abort())
  }

  override def close(): Unit = ()
}
