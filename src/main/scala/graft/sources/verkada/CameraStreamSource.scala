package graft.sources.verkada

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

/** Structured-Streaming (MicroBatchStream) twin of [[CameraSource]]:
  * the cursor-paginated device scan as an incremental source — one
  * API page per micro-batch, so a scheduled re-pull becomes a
  * standing `readStream` instead of repeated batch jobs
  * (reference: next_page_token paging, /root/reference/task.ts:
  * 143-166).
  *
  * Offset design: the offset is the PAGE ORDINAL; the cursor token is
  * driver-side state inside the stream (an opaque server string — it
  * cannot be recomputed from an ordinal, so it lives with the only
  * component that ever touches it). `latestOffset()` advances the
  * cursor by fetching exactly one page and buffering it; the
  * non-advancing-token guard (task.ts:160-166) lives THERE: a token
  * that fails to advance marks the stream drained and latestOffset
  * stops moving, which under processAllAvailable/AvailableNow
  * terminates cleanly instead of looping on the stuck cursor.
  *
  * The buffered page rides the InputPartition to the executor — a
  * page is bounded (one HTTP response), so this is a bounded driver
  * buffer, the same shape as Kafka's metadata-on-driver /
  * data-on-executor split but for a protocol whose "offsets" (cursor
  * tokens) are server-opaque. `commit(end)` drops buffers at or
  * below the committed page. Cursor APIs are not seekable, so a
  * restarted query re-reads from the live cursor head (the API
  * offers no replay; the reference's batch scan has the same
  * at-most-once contract).
  */
class CameraStreamSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = CameraSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new CameraStreamTable(properties.asScala.toMap)
}

class CameraStreamTable(options: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = "verkada_cameras_stream"
  override def schema(): StructType = CameraSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder = {
    val opts = options ++ o.asScala
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = CameraSource.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new CameraMicroBatchStream(opts("url"), opts.getOrElse("token", ""))
      }
    }
  }
}

/** Page-ordinal offset (page 0 = nothing read yet). */
case class CameraOffset(page: Int) extends Offset {
  override def json(): String = s"""{"page":$page}"""
}

class CameraMicroBatchStream(url: String, token: String) extends MicroBatchStream {
  private val client = Json.httpClient()
  private val headers =
    if (token.isEmpty) Map.empty[String, String]
    else Map("Authorization" -> s"Bearer $token")

  // driver-side cursor state, all guarded by `this`
  private var pageToken: Option[String] = None
  private var fetchedPages = 0
  private var drained = false
  private val buffered = scala.collection.mutable.Map.empty[Int, Array[String]]

  /** Fetch ONE page, buffer its rows, advance (or drain) the cursor. */
  private def fetchNext(): Unit = {
    val u = url + pageToken.map(t =>
      s"?page_token=${java.net.URLEncoder.encode(t, "UTF-8")}").getOrElse("")
    val body = Json.parse(Json.get(client, u, headers))
    fetchedPages += 1
    buffered(fetchedPages) =
      body.get("cameras").elements().asScala.map(_.toString).toArray
    val next =
      if (body.hasNonNull("next_page_token")) Some(body.get("next_page_token").asText())
      else None
    // null token OR a token that failed to advance drains the stream
    // (task.ts:160-166)
    if (next.isEmpty || next == pageToken) drained = true
    pageToken = next
  }

  override def initialOffset(): Offset = CameraOffset(0)

  override def latestOffset(): Offset = synchronized {
    if (!drained) fetchNext()
    CameraOffset(fetchedPages)
  }

  override def deserializeOffset(json: String): Offset =
    CameraOffset("\"page\":(\\d+)".r.findFirstMatchIn(json)
      .map(_.group(1).toInt)
      .getOrElse(throw new IllegalArgumentException(s"bad offset: $json")))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    synchronized {
      val s = start.asInstanceOf[CameraOffset].page
      val e = end.asInstanceOf[CameraOffset].page
      ((s + 1) to e).map { p =>
        CameraPagePartition(p, buffered.getOrElse(p, Array.empty)): InputPartition
      }.toArray
    }

  override def createReaderFactory(): PartitionReaderFactory =
    new CameraPageReaderFactory

  override def commit(end: Offset): Unit = synchronized {
    val e = end.asInstanceOf[CameraOffset].page
    buffered.keys.filter(_ <= e).toSeq.foreach(buffered.remove)
  }

  override def stop(): Unit = ()
}

case class CameraPagePartition(page: Int, rows: Array[String]) extends InputPartition

class CameraPageReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[CameraPagePartition]
    new PartitionReader[InternalRow] {
      private val it = part.rows.iterator
      private var current: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) { current = InternalRow(UTF8String.fromString(it.next()), part.page); true }
        else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
