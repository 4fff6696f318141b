package graft.ops

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: text ⋈ embedding bundling (struct columns,
  * nested field access — the reference's nested Feature build/access
  * pattern, /root/reference/task.ts:168-195 + withField enrichment
  * task.ts:245-249), and binary-payload decode via a pure-JVM
  * container-header parser ([[graft.functions.MediaHeader]]): real
  * magic-byte + dimension extraction for PNG/GIF/JPEG, no media
  * libraries needed.
  */
object Multimodal extends QueryPack {

  /** Join documents to their embedding, bundle into a struct, then
    * read fields back out (flattened for the oracle compare). */
  private def multimodal(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val vecs = Tables.embeddings(s, d)
    docs.join(vecs, docs("doc_id") === vecs("vec_id"))
      .withColumn("bundle",
        struct(
          col("doc_id"),
          struct(col("lang"), col("source"), col("n_chars")).as("meta"),
          col("embedding"),
          col("label")))
      // late enrichment via withField (reference A16 analog)
      .withColumn("bundle",
        col("bundle").withField("n_dims", size(col("bundle.embedding"))))
      .select(
        col("bundle.doc_id").as("doc_id"),
        col("bundle.meta.lang").as("lang"),
        col("bundle.meta.n_chars").as("n_chars"),
        col("bundle.label").as("label"),
        col("bundle.n_dims").as("n_dims"))
      .orderBy("doc_id")
  }

  /** Binary-payload decode: build a REAL media container header per
    * document (PNG / GIF / JPEG, rotating on doc_id), then parse it
    * back with the native [[graft.functions.MediaHeader]] expression —
    * magic-byte format detection plus big/little-endian dimension
    * extraction, including the JPEG marker WALK over a
    * variable-length APP0 segment (dimensions are at no fixed
    * offset). Every 7th payload is truncated to 5 bytes to exercise
    * the corrupt-input contract: ("unknown", NULL, NULL), never an
    * exception — the behavior a 100 TB scan of damaged payloads
    * needs.
    *
    * Construction happens in hex-string space (one shared recipe the
    * DuckDB oracle replays verbatim), then `unhex` materializes the
    * actual bytes the parser sees. The oracle extracts the same
    * fields by slicing the identical hex at the arithmetically-same
    * byte offsets — so Spark's binary walk and DuckDB's offset math
    * must agree bit-for-bit. Whole pipeline is narrow (no shuffle
    * before the final presentation sort) and stays in whole-stage
    * codegen: MediaHeader emits a direct static call. */
  private def multimodalBlob(s: SparkSession, d: String): DataFrame = {
    import graft.functions.MediaHeader.media_header
    def be32(c: Column) = lpad(hex(c.cast("bigint")), 8, "0")
    def be16(c: Column) = lpad(hex(c.cast("bigint")), 4, "0")
    def le16(c: Column) = concat(
      lpad(hex(pmod(c, lit(256)).cast("bigint")), 2, "0"),
      lpad(hex(shiftright(c, 8).cast("bigint")), 2, "0"))
    val w = (col("n_chars") % 1900 + 16).cast("int")
    val h = ((col("doc_id") * 7) % 1060 + 16).cast("int")
    val pad = (col("doc_id") % 13 + 1).cast("int")
    val hx = when(col("doc_id") % 3 === 0,       // PNG: sig + IHDR, BE32 dims
        concat(lit("89504E470D0A1A0A0000000D49484452"), be32(w), be32(h)))
      .when(col("doc_id") % 3 === 1,             // GIF89a: LE16 dims
        concat(lit("474946383961"), le16(w), le16(h)))
      .otherwise(                                // JPEG: SOI, APP0(pad), SOF0
        concat(lit("FFD8FFE0"), be16(pad + 2), repeat(lit("41"), pad),
          lit("FFC0001108"), be16(h), be16(w)))
    val cut = when(col("doc_id") % 7 === 0, substring(hx, 1, 10)).otherwise(hx)
    Tables.documents(s, d)
      .withColumn("blob", unhex(cut))
      .withColumn("hdr", media_header(col("blob")))
      .select(col("doc_id"),
        col("hdr.format").as("format"),
        col("hdr.width").as("width"),
        col("hdr.height").as("height"),
        length(col("blob")).cast("int").as("byte_len"))
      .orderBy("doc_id")
  }

  /** Frame sampling through the imperative batched surface — the
    * Scala analog of a pandas-batch decode UDF. The payload is
    * chunked into fixed 64-char "frames" and every 4th is kept, all
    * inside mapPartitions: the contract is an ITERATOR of rows in,
    * lazily flat-mapped iterator out — no per-partition
    * materialization, no shuffle (row multiplication happens inside
    * the stage), partition-parallel by construction. A real media
    * pipeline swaps the chunker for a decoder behind the same
    * iterator contract; the md5 stands in for per-frame features.
    * Differentially oracle-checked (the rare mapPartitions operator
    * with a SQL twin). */
  private def multimodalFrames(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val src = Tables.documents(s, d)
      .select(col("doc_id"), col("text")).as[(Long, String)]
    src.mapPartitions { rows =>
      rows.flatMap { case (id, text) =>
        val nFrames = (text.length + 63) / 64
        (0 until nFrames).iterator.filter(_ % 4 == 0).map { i =>
          val frame = text.substring(i * 64, math.min((i + 1) * 64, text.length))
          val md5 = java.security.MessageDigest.getInstance("MD5")
            .digest(frame.getBytes("UTF-8"))
            .map(b => f"$b%02x").mkString
          (id, i, frame.length, md5)
        }
      }
    }.toDF("doc_id", "frame_idx", "frame_len", "frame_md5")
      .orderBy("doc_id", "frame_idx")
  }

  override val queries: Map[String, Q] = Map(
    "q_multimodal"        -> multimodal,
    "q_multimodal_blob"   -> multimodalBlob,
    "q_multimodal_frames" -> multimodalFrames,
  )

  override val oracles: Map[String, String] = Map(
    // Same hex-space payload recipe as the Spark side; the parse half
    // slices the hex at the byte offsets the binary walk lands on
    // (2 hex chars per byte, 1-based substr ⇒ byte o lives at char
    // 2*o+1). JPEG's SOF offset is 4 + APP0-length, read from the
    // payload itself — the oracle replays the walk arithmetic, it
    // does not assume the construction.
    "q_multimodal_blob" ->
      """WITH base AS (
        |  SELECT doc_id,
        |         (n_chars % 1900) + 16 AS w,
        |         ((doc_id * 7) % 1060) + 16 AS h,
        |         (doc_id % 13) + 1 AS pad
        |  FROM documents),
        |built AS (
        |  SELECT doc_id,
        |    CASE doc_id % 3
        |      WHEN 0 THEN '89504e470d0a1a0a0000000d49484452'
        |                  || lpad(to_hex(w), 8, '0') || lpad(to_hex(h), 8, '0')
        |      WHEN 1 THEN '474946383961'
        |                  || lpad(to_hex(w % 256), 2, '0') || lpad(to_hex(w // 256), 2, '0')
        |                  || lpad(to_hex(h % 256), 2, '0') || lpad(to_hex(h // 256), 2, '0')
        |      ELSE 'ffd8ffe0' || lpad(to_hex(pad + 2), 4, '0') || repeat('41', pad)
        |           || 'ffc0001108' || lpad(to_hex(h), 4, '0') || lpad(to_hex(w), 4, '0')
        |    END AS hx
        |  FROM base),
        |cut AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 7 = 0 THEN substr(hx, 1, 10) ELSE hx END AS hx
        |  FROM built),
        |jp AS (
        |  SELECT doc_id, hx,
        |    CASE WHEN length(hx) >= 12 AND substr(hx, 1, 4) = 'ffd8'
        |         THEN 4 + TRY_CAST('0x' || substr(hx, 9, 4) AS BIGINT) END AS sof_off
        |  FROM cut),
        |fmtd AS (
        |  SELECT doc_id, hx, sof_off,
        |    CASE
        |      WHEN length(hx) >= 48 AND substr(hx, 1, 16) = '89504e470d0a1a0a'
        |           AND substr(hx, 25, 8) = '49484452' THEN 'png'
        |      WHEN length(hx) >= 20 AND substr(hx, 1, 12) = '474946383961' THEN 'gif'
        |      WHEN sof_off IS NOT NULL AND length(hx) >= 2 * (sof_off + 9)
        |           AND substr(hx, 2 * sof_off + 1, 4) = 'ffc0' THEN 'jpeg'
        |      ELSE 'unknown' END AS format
        |  FROM jp)
        |SELECT doc_id, format,
        |  CAST(CASE format
        |    WHEN 'png'  THEN TRY_CAST('0x' || substr(hx, 33, 8) AS BIGINT)
        |    WHEN 'gif'  THEN TRY_CAST('0x' || substr(hx, 13, 2) AS BIGINT)
        |                     + 256 * TRY_CAST('0x' || substr(hx, 15, 2) AS BIGINT)
        |    WHEN 'jpeg' THEN TRY_CAST('0x' || substr(hx, 2 * (sof_off + 7) + 1, 4) AS BIGINT)
        |  END AS INT) AS width,
        |  CAST(CASE format
        |    WHEN 'png'  THEN TRY_CAST('0x' || substr(hx, 41, 8) AS BIGINT)
        |    WHEN 'gif'  THEN TRY_CAST('0x' || substr(hx, 17, 2) AS BIGINT)
        |                     + 256 * TRY_CAST('0x' || substr(hx, 19, 2) AS BIGINT)
        |    WHEN 'jpeg' THEN TRY_CAST('0x' || substr(hx, 2 * (sof_off + 5) + 1, 4) AS BIGINT)
        |  END AS INT) AS height,
        |  CAST(length(hx) // 2 AS INT) AS byte_len
        |FROM fmtd ORDER BY doc_id""".stripMargin,
    "q_multimodal" ->
      """SELECT d.doc_id, d.lang, d.n_chars, e.label, CAST(LEN(e.embedding) AS INT) AS n_dims
        |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        |ORDER BY doc_id""".stripMargin,
    "q_multimodal_frames" ->
      """SELECT doc_id, CAST(i AS INT) AS frame_idx,
        |       CAST(LENGTH(substring(text, CAST(i * 64 + 1 AS BIGINT), 64)) AS INT) AS frame_len,
        |       md5(substring(text, CAST(i * 64 + 1 AS BIGINT), 64)) AS frame_md5
        |FROM (SELECT doc_id, text,
        |             UNNEST(range(CAST(CEIL(LENGTH(text) / 64.0) AS BIGINT))) AS i
        |      FROM documents)
        |WHERE i % 4 = 0
        |ORDER BY doc_id, frame_idx""".stripMargin,
  )
}
