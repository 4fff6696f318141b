package graft.ops

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Row-reshaping operators: generator/explode (UDTF surface),
  * unpivot (melt), time-series gap fill, and deterministic
  * stratified sampling.
  *
  * The reference's only reshape is array-pack/unpack inside the
  * GeoJSON projection (/root/reference/task.ts:188-191); this pack is
  * Tier-B surface a training-data pipeline needs for corpus prep.
  *
  * Scale notes: explode and unpivot are narrow (no shuffle — row
  * multiplication happens inside the stage); the gap-fill grid is
  * generated per key from that key's own bounds, so grid size scales
  * with keys × range, never with the fact table; sampling is a
  * per-partition window over the stratum key — one keyed shuffle.
  */
object Reshape extends QueryPack {

  /** posexplode = generator/UDTF surface: one output row per token
    * with its position. The length filter runs AFTER the generate —
    * a predicate on generator output — and Catalyst still prunes the
    * scan to (doc_id, text). */
  private def explodeQ(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .filter(length(col("tok")) >= 8)
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("tok"))
      .orderBy("doc_id", "pos")

  /** Unpivot (melt): wide numeric columns → (metric, value) long
    * form — the inverse of q_pivot. */
  private def unpivot(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(col("c_custkey"), col("c_acctbal").as("acctbal"),
        col("c_nationkey").cast("double").as("nationkey"))
      .unpivot(Array(col("c_custkey")),
        Array(col("acctbal"), col("nationkey")), "metric", "value")
      .orderBy("c_custkey", "metric")

  /** Time-series gap fill: per-user hourly event counts with missing
    * hours zero-filled. The hour grid is sequence(min, max) per user
    * exploded — grid size is bounded by each key's own span, and the
    * counts join is keyed (no cross join against a global calendar). */
  private def gapfill(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .filter(col("user_id") % 17 === 0)
      .withColumn("hour", date_trunc("hour", col("ts")))
    val grid = ev.groupBy("user_id")
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
      .select(col("user_id"),
        explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR"))).as("hour"))
    val counts = ev.groupBy("user_id", "hour").agg(count(lit(1)).as("cnt"))
    grid.join(counts, Seq("user_id", "hour"), "left_outer")
      .select(col("user_id"), col("hour"), coalesce(col("cnt"), lit(0L)).as("n"))
      .orderBy("user_id", "hour")
  }

  /** Deterministic stratified sampling: every 10th document per lang
    * in doc_id order — systematic sampling as a per-stratum window,
    * reproducible across engines and runs (unlike Bernoulli sample(),
    * whose seed streams are engine-specific; that surface is covered
    * by ScalaTest determinism checks instead). */
  private def sampleStrat(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("lang").orderBy("doc_id")
    Tables.documents(s, d)
      .withColumn("rn", row_number().over(w))
      .filter((col("rn") - 1) % 10 === 0)
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy("doc_id")
  }

  override val queries: Map[String, Q] = Map(
    "q_explode"      -> explodeQ,
    "q_unpivot"      -> unpivot,
    "q_gapfill"      -> gapfill,
    "q_sample_strat" -> sampleStrat,
  )

  override val oracles: Map[String, String] = Map(
    "q_explode" ->
      """SELECT doc_id, pos, tok FROM (
        |  SELECT doc_id,
        |         UNNEST(string_split(text, ' ')) AS tok,
        |         UNNEST(range(LEN(string_split(text, ' ')))) AS pos
        |  FROM documents)
        |WHERE LENGTH(tok) >= 8
        |ORDER BY doc_id, pos""".stripMargin,
    "q_unpivot" ->
      """SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS value FROM customer
        |UNION ALL
        |SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE) FROM customer
        |ORDER BY c_custkey, metric""".stripMargin,
    "q_gapfill" ->
      """WITH ev AS (
        |  SELECT user_id, DATE_TRUNC('hour', ts) AS hour
        |  FROM events WHERE user_id % 17 = 0),
        |b AS (SELECT user_id, MIN(hour) AS h0, MAX(hour) AS h1 FROM ev GROUP BY user_id),
        |grid AS (SELECT user_id, UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM b),
        |c AS (SELECT user_id, hour, COUNT(*) AS cnt FROM ev GROUP BY user_id, hour)
        |SELECT g.user_id, g.hour, COALESCE(c.cnt, 0) AS n
        |FROM grid g LEFT JOIN c ON g.user_id = c.user_id AND g.hour = c.hour
        |ORDER BY g.user_id, g.hour""".stripMargin,
    "q_sample_strat" ->
      """SELECT doc_id, lang, source FROM (
        |  SELECT doc_id, lang, source,
        |         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
        |  FROM documents)
        |WHERE (rn - 1) % 10 = 0
        |ORDER BY doc_id""".stripMargin,
  )
}
