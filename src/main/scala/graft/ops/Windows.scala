package graft.ops

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Window functions: ranking, analytic (lag/lead/first/last), and
  * explicit row/range frames.
  *
  * Determinism: every ordered window includes a unique tie-break key
  * (c_custkey / event_id) wherever row identity matters; rank and
  * dense_rank are exercised over an ordering WITH ties (floored
  * acctbal) since that is the semantics that distinguishes them from
  * row_number.
  *
  * Scale notes: a window = one hash-partition shuffle on the
  * partition key + per-partition sort. All specs here share the same
  * partitioning per query, so Spark plans a single Window operator
  * chain with one exchange — check .explain that consecutive Window
  * nodes reuse the same Exchange.
  */
object Windows extends QueryPack {

  private def windowRank(s: SparkSession, d: String): DataFrame = {
    val tie  = Window.partitionBy("c_mktsegment")
      .orderBy(floor(col("c_acctbal")).desc)
    val uniq = Window.partitionBy("c_mktsegment")
      .orderBy(floor(col("c_acctbal")).desc, col("c_custkey").asc)
    Tables.customer(s, d)
      .select(
        col("c_mktsegment"), col("c_custkey"),
        floor(col("c_acctbal")).as("bal_floor"),
        row_number().over(uniq).as("rn"),
        rank().over(tie).as("rk"),
        dense_rank().over(tie).as("drk"),
        ntile(4).over(uniq).as("quartile"))
      .orderBy("c_mktsegment", "rn")
  }

  private def windowAnalytic(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val framed = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .select(
        col("event_id"), col("user_id"), col("value"),
        lag(col("value"), 1).over(w).as("prev_value"),
        lead(col("value"), 1).over(w).as("next_value"),
        first(col("value")).over(framed).as("first_value"),
        last(col("value")).over(framed).as("running_last"))
      .orderBy("event_id")
  }

  private def windowFrame(s: SparkSession, d: String): DataFrame = {
    val ordered = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val running = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val moving  = ordered.rowsBetween(-3, Window.currentRow)
    val range   = Window.partitionBy("user_id").orderBy(col("value").asc)
      .rangeBetween(Window.currentRow, 10)
    val decVal  = col("value").cast(DecimalType(18, 2))
    Tables.events(s, d)
      .select(
        col("event_id"), col("user_id"), col("value"),
        sum(decVal).over(running).cast(DoubleType).as("running_sum"),
        (sum(decVal).over(moving).cast(DoubleType) / count(lit(1)).over(moving)).as("moving_avg"),
        count(lit(1)).over(range).as("n_within_10"))
      .orderBy("event_id")
  }

  /** Distribution functions: percent_rank and cume_dist over an
    * ordering WITH ties (peer groups share the value, so both are
    * deterministic without a tie-break key — that's their defining
    * semantics); nth_value over the running frame with a unique
    * order. Ratios are (rank-1)/(n-1) style divisions of exact ints,
    * guarded by Det.r4. */
  private def windowDist(s: SparkSession, d: String): DataFrame = {
    val peers = Window.partitionBy("c_mktsegment").orderBy(floor(col("c_acctbal")).asc)
    val uniq = Window.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.customer(s, d)
      .select(
        col("c_mktsegment"), col("c_custkey"),
        floor(col("c_acctbal")).as("bal_floor"),
        graft.Det.r4(percent_rank().over(peers)).as("pct_rank"),
        graft.Det.r4(cume_dist().over(peers)).as("cum_dist"),
        nth_value(col("c_custkey"), 2).over(uniq).as("second_seen"))
      .orderBy("c_custkey")
  }

  override val queries: Map[String, Q] = Map(
    "q_window_rank"     -> windowRank,
    "q_window_analytic" -> windowAnalytic,
    "q_window_frame"    -> windowFrame,
    "q_window_dist"     -> windowDist,
  )

  override val oracles: Map[String, String] = Map(
    "q_window_rank" ->
      """SELECT c_mktsegment, c_custkey,
        |       CAST(FLOOR(c_acctbal) AS BIGINT) AS bal_floor,
        |       ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY FLOOR(c_acctbal) DESC, c_custkey ASC) AS rn,
        |       RANK() OVER (PARTITION BY c_mktsegment ORDER BY FLOOR(c_acctbal) DESC) AS rk,
        |       DENSE_RANK() OVER (PARTITION BY c_mktsegment ORDER BY FLOOR(c_acctbal) DESC) AS drk,
        |       NTILE(4) OVER (PARTITION BY c_mktsegment ORDER BY FLOOR(c_acctbal) DESC, c_custkey ASC) AS quartile
        |FROM customer
        |ORDER BY c_mktsegment, rn""".stripMargin,
    "q_window_analytic" ->
      """SELECT event_id, user_id, value,
        |       LAG(value, 1) OVER w AS prev_value,
        |       LEAD(value, 1) OVER w AS next_value,
        |       FIRST_VALUE(value) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_value,
        |       LAST_VALUE(value) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_last
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        |ORDER BY event_id""".stripMargin,
    "q_window_frame" ->
      """SELECT event_id, user_id, value,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_sum,
        |       (CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |        / COUNT(*) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |                         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)) AS moving_avg,
        |       COUNT(*) OVER (PARTITION BY user_id ORDER BY value ASC
        |                      RANGE BETWEEN CURRENT ROW AND 10 FOLLOWING) AS n_within_10
        |FROM events
        |ORDER BY event_id""".stripMargin,
    "q_window_dist" ->
      s"""SELECT c_mktsegment, c_custkey,
         |       CAST(FLOOR(c_acctbal) AS BIGINT) AS bal_floor,
         |       ${graft.Det.r4Sql("PERCENT_RANK() OVER (PARTITION BY c_mktsegment ORDER BY FLOOR(c_acctbal) ASC)")} AS pct_rank,
         |       ${graft.Det.r4Sql("CUME_DIST() OVER (PARTITION BY c_mktsegment ORDER BY FLOOR(c_acctbal) ASC)")} AS cum_dist,
         |       NTH_VALUE(c_custkey, 2) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC
         |                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_seen
         |FROM customer
         |ORDER BY c_custkey""".stripMargin,
  )
}
