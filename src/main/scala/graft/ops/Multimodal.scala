package graft.ops

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: text ⋈ embedding bundling (struct columns,
  * nested field access — the reference's nested Feature build/access
  * pattern, /root/reference/task.ts:168-195 + withField enrichment
  * task.ts:245-249), and binary-payload plumbing with a stubbed
  * decoder.
  *
  * The decode step is a clearly-marked deterministic STUB (this
  * container has no image/audio libs); the Spark-side contract is
  * real: binary column + typed metadata struct in, fixed-schema
  * feature struct out, computed per-partition with no shuffle.
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

  /** Binary-payload pipeline: pack a deterministic fake payload into
    * a binary column with typed metadata, then "decode" it.
    *
    * STUB: a real deployment decodes image/audio bytes with a native
    * lib behind the same columnar contract (binary in, struct out,
    * batched per partition). Here decode() derives deterministic
    * pseudo-dimensions from the payload bytes so the plumbing —
    * schema, nullability, partition-parallel execution — is real and
    * testable without media libraries. */
  private def multimodalBlob(s: SparkSession, d: String): DataFrame = {
    val payload = Tables.documents(s, d)
      .withColumn("media", struct(
        encode(col("text"), "UTF-8").as("bytes"),
        lit("fake/raw").as("mime"),
        length(col("text")).as("declared_len")))
    payload
      .withColumn("decoded", struct(
        length(col("media.bytes")).as("n_bytes"),
        // stubbed decode: dimensions derived from content hash
        pmod(xxhash64(col("media.bytes")), lit(1920)).cast("int").as("width"),
        pmod(xxhash64(col("media.bytes"), lit(1)), lit(1080)).cast("int").as("height"),
        (crc32(col("media.bytes")) % 256).cast("int").as("checksum_byte")))
      .filter(col("decoded.n_bytes") === col("media.declared_len"))
      .select(col("doc_id"), col("media.mime").as("mime"),
        col("decoded.n_bytes").as("n_bytes"), col("decoded.width").as("width"),
        col("decoded.height").as("height"), col("decoded.checksum_byte").as("checksum_byte"))
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
