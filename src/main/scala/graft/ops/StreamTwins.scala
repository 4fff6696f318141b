package graft.ops

import graft.{Det, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch twins of the streaming operators (SURVEY.md §2): tumbling
  * windows, session windows, and keyed dedup. The streaming versions
  * (readStream + watermark) live in graft.streaming and are
  * MemoryStream-tested; these batch formulations are the oracle-
  * checked semantics both must agree on.
  *
  * Scale notes: window()/session_window() group on (window, key) with
  * partial aggregation; session merge is per-key ordered state — in
  * streaming this is exactly the mapGroupsWithState layout, keyed
  * shuffle then per-key ordering.
  */
object StreamTwins extends QueryPack {

  private def tumble(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("value"), 2).as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("sum_value"))
      .orderBy("w_start", "event_type")

  /** Session windows, 30-minute gap, per user. session_window's
    * interval is [start, last+gap); an event exactly at the previous
    * end starts a new session — the oracle's gaps-and-islands twin
    * uses `>=` on the gap for the same boundary rule. */
  private def session(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), max(col("ts")).as("last_ts"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("n_events"), col("last_ts"))
      .orderBy("user_id", "session_start")

  /** Keyed dedup, first event per (user_id, event_type) by time —
    * the batch twin of dropDuplicatesWithinWatermark. */
  private def dedup(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"), col("ts"))
      .orderBy("user_id", "event_type")
  }

  /** Sliding (hopping) windows: 10-minute windows every 5 minutes —
    * each event lands in exactly 2 windows. The oracle derives the
    * same window set arithmetically: starts at floor₅(ts) and
    * floor₅(ts) − 5 min (both epoch-aligned, as Spark's window()
    * is). Row multiplication = window/slide ratio, applied before
    * partial aggregation — state stays (windows × types). */
  private def slide(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"))
      .orderBy("w_start", "event_type")

  /** Stream-stream interval join, batch-evaluated THROUGH the same
    * code path the streaming query runs ([[graft.streaming.Streams
    * .errorClickJoin]] — watermarks are no-ops in batch, Spark drops
    * them from the plan): each error joined to the same user's clicks
    * in the preceding 10 minutes, rolled up per error. The oracle
    * states the identical interval join in SQL, so the hash-compare
    * pins the exact semantics the MemoryStream differential
    * (StreamingSpec) then proves the incremental path matches. */
  private def ssJoin(s: SparkSession, d: String): DataFrame =
    graft.streaming.Streams.errorClickJoin(Tables.events(s, d))
      .groupBy(col("e_id"))
      .agg(count(lit(1)).as("n_clicks"),
        Det.dsum(col("c_value"), 2).as("sum_click_value"),
        max(col("c_ts")).as("last_click_ts"))
      .select(col("e_id").as("error_id"), col("n_clicks"),
        col("sum_click_value"), col("last_click_ts"))
      .orderBy("error_id")

  override val queries: Map[String, Q] = Map(
    "q_stream_slide"   -> slide,
    "q_stream_tumble"  -> tumble,
    "q_stream_session" -> session,
    "q_stream_dedup"   -> dedup,
    "q_stream_join"    -> ssJoin,
  )

  override val oracles: Map[String, String] = Map(
    "q_stream_join" ->
      s"""SELECT e.event_id AS error_id, COUNT(*) AS n_clicks,
         |       ${Det.dsumSql("c.value", 2)} AS sum_click_value,
         |       MAX(c.ts) AS last_click_ts
         |FROM events e
         |JOIN events c
         |  ON c.user_id = e.user_id
         | AND e.event_type = 'error' AND c.event_type = 'click'
         | AND c.ts >= e.ts - INTERVAL 10 MINUTE AND c.ts <= e.ts
         |GROUP BY e.event_id
         |ORDER BY error_id""".stripMargin,
    "q_stream_slide" ->
      """WITH x AS (
        |  SELECT event_type,
        |         make_timestamp(CAST(epoch_us(ts) // 300000000 * 300000000 AS BIGINT)) AS s1
        |  FROM events),
        |u AS (
        |  SELECT event_type, s1 AS ws FROM x
        |  UNION ALL
        |  SELECT event_type, s1 - INTERVAL 5 MINUTE FROM x)
        |SELECT ws AS w_start, event_type, COUNT(*) AS n
        |FROM u
        |GROUP BY ws, event_type
        |ORDER BY w_start, event_type""".stripMargin,
    "q_stream_tumble" ->
      s"""SELECT CAST(TO_TIMESTAMP(CAST(FLOOR(EPOCH(ts) / 300) * 300 AS BIGINT)) AS TIMESTAMP) AS w_start,
         |       event_type, COUNT(*) AS n,
         |       ${Det.dsumSql("value", 2)} AS sum_value
         |FROM events
         |GROUP BY 1, 2
         |ORDER BY w_start, event_type""".stripMargin,
    "q_stream_session" ->
      """WITH marked AS (
        |  SELECT user_id, ts,
        |         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |                   >= INTERVAL 30 MINUTE
        |              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |numbered AS (
        |  SELECT user_id, ts,
        |         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |                                ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked)
        |SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events, MAX(ts) AS last_ts
        |FROM numbered
        |GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    "q_stream_dedup" ->
      """SELECT user_id, event_type, event_id, ts
        |FROM (SELECT user_id, event_type, event_id, ts,
        |             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |                                ORDER BY ts, event_id) AS rn
        |      FROM events)
        |WHERE rn = 1
        |ORDER BY user_id, event_type""".stripMargin,
  )
}
