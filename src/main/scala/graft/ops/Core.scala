package graft.ops

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core relational operators: scan+projection, predicate filter,
  * global sort+limit, per-group top-k, and set operations.
  *
  * Reference analogs: projection = the camera→Feature rebuild
  * (/root/reference/task.ts:168-195, A8); filter = the lease predicate
  * (/root/reference/task.ts:122, A6). Everything here is stock
  * DataFrame DSL so Catalyst pushes filters/projections into the
  * parquet scan (verify with .explain: PushedFilters / ReadSchema).
  *
  * Scale notes: sort+limit compiles to TakeOrderedAndProject (per
  * partition top-k, then a single merge on the driver — no global
  * shuffle-sort); per-group top-k is a single hash-partition shuffle
  * by the group key; set ops on DISTINCT semantics are one hash
  * aggregate each.
  */
object Core extends QueryPack {

  private def scanProject(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("net"))
      .orderBy("l_orderkey", "l_linenumber", "net")

  private def filterPred(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(
        (col("l_quantity").between(10, 20)
          && col("l_returnflag").isin("A", "R")
          && col("l_shipdate") >= lit("1997-06-01").cast("timestamp"))
        || (col("l_discount") <= 0.01
          && col("l_linestatus") === "F"
          && col("l_tax").isNotNull))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_returnflag"), col("l_linestatus"))
      // (l_orderkey, l_linenumber) is NOT unique in this data — order
      // by every output column for a deterministic multiset order.
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_linestatus")

  private def sortLimit(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)

  /** Per-group top-k via rank-filter: top 3 lineitems by extendedprice
    * per (returnflag, linestatus); ties broken on the unique
    * (orderkey, linenumber) so row_number is deterministic.
    *
    * Two-phase plan (the PLANS.md "pre-aggregation" scale posture):
    * phase 1 computes each group's k-th-largest price with the
    * bounded-heap TopK aggregate (map-side partials, shuffle carries
    * ≤ k rows per group×partition); phase 2 broadcast-joins the
    * 6-row threshold table back and runs the window only over rows
    * at-or-above the cut. The full table is scanned twice but never
    * shuffled — at 100 TB the window sorts a few dozen rows instead
    * of the whole fact table. Price is the primary sort key, so every
    * row ranked ≤ k has price ≥ the k-th price; ties at the cut are
    * kept and resolved by the same deterministic row_number order. */
  private def topK(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val topk = udaf(new graft.functions.TopKByPrice(3),
      org.apache.spark.sql.Encoders.product[graft.functions.LineRef])
    val thresholds = Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(topk(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber")).as("top"))
      .select(col("l_returnflag"), col("l_linestatus"),
        element_at(col("top"), least(size(col("top")), lit(3)))
          .getField("price").as("cut"))
    val w = Window.partitionBy("l_returnflag", "l_linestatus")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
    Tables.lineitem(s, d)
      .join(broadcast(thresholds), Seq("l_returnflag", "l_linestatus"))
      .filter(col("l_extendedprice") >= col("cut"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("l_returnflag"), col("l_linestatus"), col("rk"),
        col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy("l_returnflag", "l_linestatus", "rk")
  }

  private def highBal(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).filter(col("c_acctbal") > 7000).select("c_custkey")
  private def building(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING").select("c_custkey")

  // Spark `union` is UNION ALL; duplicates sort adjacent so the
  // multiset hash is deterministic.
  private def unionAll(s: SparkSession, d: String): DataFrame =
    highBal(s, d).union(building(s, d)).orderBy("c_custkey")

  private def intersectQ(s: SparkSession, d: String): DataFrame =
    highBal(s, d).intersect(building(s, d)).orderBy("c_custkey")

  private def exceptQ(s: SparkSession, d: String): DataFrame =
    highBal(s, d).except(building(s, d)).orderBy("c_custkey")

  private def intersectAllQ(s: SparkSession, d: String): DataFrame =
    highBal(s, d).intersectAll(building(s, d)).orderBy("c_custkey")

  private def exceptAllQ(s: SparkSession, d: String): DataFrame =
    unionAll(s, d).exceptAll(building(s, d)).orderBy("c_custkey")

  override val queries: Map[String, Q] = Map(
    "q_scan_project" -> scanProject,
    "q_filter_pred"  -> filterPred,
    "q_sort_limit"   -> sortLimit,
    "q_topk"         -> topK,
    "q_union"        -> unionAll,
    "q_intersect"    -> intersectQ,
    "q_except"       -> exceptQ,
    "q_intersect_all" -> intersectAllQ,
    "q_except_all"   -> exceptAllQ,
  )

  override val oracles: Map[String, String] = Map(
    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber,
        |       ROUND(l_extendedprice * (1 - l_discount), 4) AS net
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, net""".stripMargin,
    "q_filter_pred" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_linestatus
        |FROM lineitem
        |WHERE (l_quantity BETWEEN 10 AND 20
        |       AND l_returnflag IN ('A','R')
        |       AND l_shipdate >= TIMESTAMP '1997-06-01 00:00:00')
        |   OR (l_discount <= 0.01 AND l_linestatus = 'F' AND l_tax IS NOT NULL)
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_returnflag, l_linestatus""".stripMargin,
    "q_sort_limit" ->
      """SELECT o_orderkey, o_totalprice, o_orderpriority
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 100""".stripMargin,
    "q_topk" ->
      """SELECT l_returnflag, l_linestatus, rk, l_orderkey, l_linenumber, l_extendedprice
        |FROM (
        |  SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber, l_extendedprice,
        |         ROW_NUMBER() OVER (PARTITION BY l_returnflag, l_linestatus
        |                            ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC) AS rk
        |  FROM lineitem)
        |WHERE rk <= 3
        |ORDER BY l_returnflag, l_linestatus, rk""".stripMargin,
    "q_union" ->
      """SELECT c_custkey FROM customer WHERE c_acctbal > 7000
        |UNION ALL
        |SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |ORDER BY c_custkey""".stripMargin,
    "q_intersect" ->
      """SELECT c_custkey FROM customer WHERE c_acctbal > 7000
        |INTERSECT
        |SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |ORDER BY c_custkey""".stripMargin,
    "q_except" ->
      """SELECT c_custkey FROM customer WHERE c_acctbal > 7000
        |EXCEPT
        |SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |ORDER BY c_custkey""".stripMargin,
    "q_intersect_all" ->
      """SELECT c_custkey FROM customer WHERE c_acctbal > 7000
        |INTERSECT ALL
        |SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |ORDER BY c_custkey""".stripMargin,
    "q_except_all" ->
      """(SELECT c_custkey FROM customer WHERE c_acctbal > 7000
        | UNION ALL
        | SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |EXCEPT ALL
        |SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |ORDER BY c_custkey""".stripMargin,
  )
}
