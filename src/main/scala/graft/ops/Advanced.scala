package graft.ops

import graft.{Det, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Advanced relational surface: pivot and correlated scalar
  * subqueries (Catalyst decorrelates the latter into a join —
  * SURVEY.md §4's RewriteCorrelatedScalarSubquery note).
  */
object Advanced extends QueryPack {

  /** Pivot: order counts + decimal-exact totals per orderpriority,
    * pivoted on orderstatus. Oracle uses conditional aggregation
    * (the engine-independent formulation of the same operator). */
  private def pivot(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .select(col("o_orderpriority"), col("F").as("n_f"), col("O").as("n_o"),
        col("P").as("n_p"))
      .orderBy("o_orderpriority")

  /** Correlated scalar subquery: customers whose acctbal exceeds
    * their market segment's average. Expressed as the decorrelated
    * join Catalyst would produce — broadcast the 5-row per-segment
    * aggregate, no per-row subquery execution. */
  private def scalarSubq(s: SparkSession, d: String): DataFrame = {
    val segAvg = Tables.customer(s, d)
      .groupBy(col("c_mktsegment").as("seg"))
      .agg(Det.davg(col("c_acctbal"), 2).as("seg_avg"))
    Tables.customer(s, d)
      .join(broadcast(segAvg), col("c_mktsegment") === col("seg"))
      .filter(col("c_acctbal") > col("seg_avg"))
      .select(col("c_custkey"), col("c_mktsegment"),
        col("c_acctbal"), round(col("seg_avg"), 4).as("seg_avg_r"))
      .orderBy("c_custkey")
  }

  override val queries: Map[String, Q] = Map(
    "q_pivot"       -> pivot,
    "q_scalar_subq" -> scalarSubq,
  )

  override val oracles: Map[String, String] = Map(
    "q_pivot" ->
      """SELECT o_orderpriority,
        |       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        |       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
        |       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q_scalar_subq" ->
      s"""SELECT c_custkey, c_mktsegment, c_acctbal,
         |       ROUND(seg_avg, 4) AS seg_avg_r
         |FROM customer
         |JOIN (SELECT c_mktsegment AS seg,
         |             ${Det.davgSql("c_acctbal", 2)} AS seg_avg
         |      FROM customer GROUP BY c_mktsegment) s
         |  ON c_mktsegment = seg
         |WHERE c_acctbal > seg_avg
         |ORDER BY c_custkey""".stripMargin,
  )
}
