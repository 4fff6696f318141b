package graft.ops

import graft.{QueryPack, Tables}
import graft.functions.TextSim._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Capstone: the end-to-end corpus-curation pipeline a training-data
  * run executes, as ONE oracle-checked query — quality gate → exact
  * dedup → near-dup removal → stratified sampling → global token
  * budget. Every stage is the partition-parallel formulation used by
  * its standalone operator, composed.
  *
  * The token-budget cut is the interesting scale piece: a global
  * running sum is a SINGLE-partition window in naive form. Here it is
  * the classic two-phase distributed prefix sum — bucket by the
  * global order key (data-derived, order-preserving), running sums
  * within each bucket, then a P-row offset table (P = parallelism,
  * driver-scale) broadcast back and added. Identical results to the
  * naive window at any partition count; scales to any corpus.
  */
object Curation extends QueryPack {

  private val Stopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  private def pipelineCurate(s: SparkSession, d: String): DataFrame = {
    val toksCol = tokens(col("text"))
    val stopRatio = size(filter(toksCol,
      t => t.isin(Stopwords.map(lit(_)): _*))).cast("double") / size(toksCol)

    // 1. quality gate (per-doc, embarrassingly parallel)
    val quality = Tables.documents(s, d)
      .withColumn("n_tokens", size(toksCol))
      .withColumn("stop_ratio", stopRatio)
      .filter(col("n_tokens") >= 30 && col("stop_ratio") <= 0.5)

    // 2. exact dedup, first-wins on the normalized prefix key
    val wDed = Window.partitionBy("norm_key").orderBy("doc_id")
    val dedup = quality
      .withColumn("norm_key", lower(array_join(slice(split(col("text"), " "), 1, 5), " ")))
      .withColumn("rn", row_number().over(wDed))
      .filter(col("rn") === 1)
      .drop("rn", "norm_key")

    // 3. near-dup removal: blocked Jaccard candidates (length-bound
    //    prefilter, explicit-count repartition — see Dedup), higher
    //    id of each pair dropped
    val sets = dedup.select(col("doc_id"), col("lang"), col("source"),
      array_distinct(split(col("text"), " ")).as("t"))
    val na = size(col("a.t")).cast("double")
    val nb = size(col("b.t")).cast("double")
    val drops = sets.repartition(s.sparkContext.defaultParallelism, col("doc_id")).as("a")
      .join(sets.as("b"),
        col("a.lang") === col("b.lang") && col("a.source") === col("b.source"))
      .filter(col("a.doc_id") < col("b.doc_id")
        && least(na, nb) / greatest(na, nb) >= 0.8
        && jaccard(col("a.t"), col("b.t")) >= 0.8)
      .select(col("b.doc_id").as("doc_id")).distinct()
    val kept = dedup.join(drops, Seq("doc_id"), "left_anti")

    // 4. deterministic stratified sampling: every 2nd doc per lang
    val wSamp = Window.partitionBy("lang").orderBy("doc_id")
    val sampled = kept
      .withColumn("srn", row_number().over(wSamp))
      .filter((col("srn") - 1) % 2 === 0)
      .select(col("doc_id"), col("lang"), col("n_tokens").cast("long").as("n_tokens"))

    // 5. global token budget via the two-phase distributed prefix sum
    //    ([[Dist.prefixSum]]): data-derived monotone buckets →
    //    per-bucket running sums → P-row offset table broadcast back.
    //    Deterministic regardless of exchange reuse (CurationSpec
    //    proves it with reuse disabled).
    Dist.prefixSum(sampled, "doc_id", "n_tokens", "cum_tokens")
      .filter(col("cum_tokens") <= 3000)
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("cum_tokens"))
      .orderBy("doc_id")
  }

  override val queries: Map[String, Q] = Map(
    "q_pipeline_curate" -> pipelineCurate,
  )

  override val oracles: Map[String, String] = Map(
    "q_pipeline_curate" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, source, text,
        |         LEN(string_split(text, ' ')) AS n_tokens,
        |         CAST(LEN(list_filter(string_split(text, ' '),
        |              t -> t IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
        |           / LEN(string_split(text, ' ')) AS stop_ratio
        |  FROM documents),
        |quality AS (SELECT * FROM toks WHERE n_tokens >= 30 AND stop_ratio <= 0.5),
        |dedup AS (
        |  SELECT * FROM (
        |    SELECT *, ROW_NUMBER() OVER (
        |      PARTITION BY LOWER(array_to_string(string_split(text, ' ')[1:5], ' '))
        |      ORDER BY doc_id) AS rn
        |    FROM quality) WHERE rn = 1),
        |neardup AS (
        |  SELECT DISTINCT b.doc_id AS drop_id
        |  FROM (SELECT doc_id, lang, source, list_distinct(string_split(text,' ')) AS t FROM dedup) a
        |  JOIN (SELECT doc_id, lang, source, list_distinct(string_split(text,' ')) AS t FROM dedup) b
        |    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
        |  WHERE CAST(LEN(list_intersect(a.t, b.t)) AS DOUBLE)
        |        / LEN(list_distinct(list_concat(a.t, b.t))) >= 0.8),
        |kept AS (SELECT * FROM dedup WHERE doc_id NOT IN (SELECT drop_id FROM neardup)),
        |sampled AS (
        |  SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS srn
        |    FROM kept) WHERE (srn - 1) % 2 = 0)
        |SELECT doc_id, lang, n_tokens, cum_tokens FROM (
        |  SELECT doc_id, lang, n_tokens,
        |         CAST(SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        |  FROM sampled)
        |WHERE cum_tokens <= 3000
        |ORDER BY doc_id""".stripMargin,
  )
}
