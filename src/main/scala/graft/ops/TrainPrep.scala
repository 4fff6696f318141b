package graft.ops

import graft.{Det, QueryPack, Tables}
import graft.functions.TextSim._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data preparation operators beyond dedup/curation:
  * benchmark decontamination and fixed-length sequence packing.
  */
object TrainPrep extends QueryPack {

  /** Decontamination: flag corpus documents whose 3-gram shingle
    * overlap with a benchmark set exceeds 30% — the standard guard
    * against test-set leakage into training data. The "benchmark"
    * here is the deterministic pseudo-set doc_id % 10 = 0 (sized so
    * the synthetic corpus's near-duplicates of benchmark docs are
    * actually flagged: 8 docs at sf0.01).
    *
    * Scale shape: the benchmark's distinct shingle set is SMALL
    * (benchmarks are thousands of documents, not billions) and
    * broadcast; corpus docs explode to (doc, shingle) rows map-side,
    * hit-count via broadcast join + partial aggregation. The corpus
    * is never shuffled by shingle; per-doc output is one row. */
  private def decontaminate(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), shingles(tokens(col("text")), 3).as("sh"))
    val bench = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
      .select(explode(col("sh")).as("g")).distinct()
    val cand = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
      .select(col("doc_id"), size(col("sh")).as("n_sh"), explode(col("sh")).as("g"))
    // shingles are distinct within a doc and bench is distinct, so the
    // post-join count IS the distinct-hit count (no double counting)
    cand.join(broadcast(bench), "g")
      .groupBy("doc_id", "n_sh")
      .agg(count(lit(1)).as("n_hits"))
      .filter(col("n_hits").cast("double") / col("n_sh") >= 0.3)
      .select(col("doc_id"), col("n_sh"), col("n_hits"),
        Det.r4(col("n_hits").cast("double") / col("n_sh")).as("overlap"))
      .orderBy("doc_id")
  }

  /** Fixed-length sequence packing: assign every document a byte-free
    * (token-offset) position in a stream of concatenated training
    * sequences of 512 tokens — (start_offset, seq_bin) per doc, in
    * doc_id order. The global running offset is [[Dist.prefixSum]],
    * so packing a 100 TB corpus never serializes onto one partition. */
  private def packSeq(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d)
      .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n_tokens"))
    Dist.prefixSum(base, "doc_id", "n_tokens", "cum_tokens")
      .withColumn("start_offset", col("cum_tokens") - col("n_tokens"))
      .select(col("doc_id"), col("n_tokens"), col("start_offset"),
        floor(col("start_offset") / 512).cast("long").as("seq_bin"))
      .orderBy("doc_id")
  }

  override val queries: Map[String, Q] = Map(
    "q_decontaminate" -> decontaminate,
    "q_pack_seq"      -> packSeq,
  )

  override val oracles: Map[String, String] = Map(
    // shingle construction mirrors graft.functions.Shingles: distinct
    // 3-token windows joined with a space; inputs shorter than 3
    // tokens yield the whole-input join (slice clamps)
    "q_decontaminate" ->
      s"""WITH sh AS (
         |  SELECT doc_id,
         |         list_distinct(list_transform(
         |           range(1, greatest(LEN(string_split(text, ' ')) - 1, 2)),
         |           i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS s
         |  FROM documents),
         |bench AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 10 = 0),
         |cand AS (SELECT doc_id, CAST(LEN(s) AS INT) AS n_sh, unnest(s) AS g
         |         FROM sh WHERE doc_id % 10 <> 0)
         |SELECT doc_id, n_sh, n_hits, ${Det.r4Sql("CAST(n_hits AS DOUBLE) / n_sh")} AS overlap
         |FROM (SELECT doc_id, n_sh, COUNT(*) AS n_hits
         |      FROM cand JOIN bench USING (g)
         |      GROUP BY doc_id, n_sh)
         |WHERE CAST(n_hits AS DOUBLE) / n_sh >= 0.3
         |ORDER BY doc_id""".stripMargin,
    "q_pack_seq" ->
      """SELECT doc_id, n_tokens,
        |       CAST(SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
        |            - n_tokens AS BIGINT) AS start_offset,
        |       CAST(FLOOR((SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
        |            - n_tokens) / 512) AS BIGINT) AS seq_bin
        |FROM (SELECT doc_id, CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,
  )
}
