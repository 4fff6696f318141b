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
        col("c_acctbal"), Det.r4(col("seg_avg")).as("seg_avg_r"))
      .orderBy("c_custkey")
  }

  /** The SQL-string surface: TPC-H Q3 shape parsed and planned by
    * Spark SQL over temp views — same Catalyst pipeline as the
    * DataFrame DSL, one parser earlier. */
  private def sqlTpch(s: SparkSession, d: String): DataFrame = {
    val (vc, vo, vl) = (Tables.view(s, d, "customer"),
      Tables.view(s, d, "orders"), Tables.view(s, d, "lineitem"))
    s.sql(
      s"""SELECT l_orderkey,
         |       ${graft.Det.dsumSql("l_extendedprice * (1 - l_discount)", 6)} AS revenue,
         |       o_orderdate, o_orderpriority
         |FROM $vc JOIN $vo ON c_custkey = o_custkey
         |JOIN $vl ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, l_orderkey
         |LIMIT 10""".stripMargin)
  }

  /** Time-range window frame: events per user within the preceding
    * hour (RANGE BETWEEN INTERVAL ... PRECEDING AND CURRENT ROW). */
  private def windowRangeTime(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .selectExpr("event_id", "user_id", "ts",
        """count(*) OVER (PARTITION BY user_id ORDER BY ts
          |RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS n_last_hour""".stripMargin)
      .orderBy("event_id")

  private def dateFuncs2(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(
        col("event_id"),
        hour(col("ts")).as("h"),
        minute(col("ts")).as("mi"),
        second(col("ts")).as("sec"),
        dayofyear(col("ts")).as("doy"),
        weekofyear(col("ts")).as("woy"),
        date_add(col("ts").cast("date"), 5).as("plus5d"),
        add_months(col("ts").cast("date"), 1).as("plus1m"),
        date_trunc("hour", col("ts")).as("hour_start"))
      .orderBy("event_id")

  /** Correlated LATERAL subquery: per-order aggregate computed by a
    * dependent subquery. Catalyst decorrelates the DependentJoin into
    * an aggregate + equi-join — same physical shape as the hand-
    * decorrelated q_scalar_subq, arrived at from SQL. The scalar
    * aggregate always yields one row, so orders without lineitems
    * survive with (NULL, 0). */
  private def joinLateral(s: SparkSession, d: String): DataFrame = {
    val (vo, vl) = (Tables.view(s, d, "orders"), Tables.view(s, d, "lineitem"))
    s.sql(
      s"""SELECT o.o_orderkey, l.maxp, l.n
        |FROM $vo o,
        |LATERAL (SELECT MAX(l_extendedprice) AS maxp, COUNT(*) AS n
        |         FROM $vl WHERE l_orderkey = o.o_orderkey) l
        |WHERE o.o_totalprice > 450000
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** TPC-H Q5 shape: the six-table join — region → nation → customer
    * → orders → lineitem → supplier with the nation-match condition —
    * exercising Catalyst's join-order planning over a star-plus-snowflake
    * graph. Dims flow into broadcasts; the two fact tables meet in one
    * keyed shuffle. */
  private def sqlTpch5(s: SparkSession, d: String): DataFrame = {
    val (vr, vn, vc) = (Tables.view(s, d, "region"),
      Tables.view(s, d, "nation"), Tables.view(s, d, "customer"))
    val (vo, vl, vs) = (Tables.view(s, d, "orders"),
      Tables.view(s, d, "lineitem"), Tables.view(s, d, "supplier"))
    s.sql(
      s"""SELECT n_name,
         |       ${Det.dsumSql("l_extendedprice * (1 - l_discount)", 6)} AS revenue,
         |       COUNT(*) AS n_items
         |FROM $vr
         |JOIN $vn ON n_regionkey = r_regionkey
         |JOIN $vc ON c_nationkey = n_nationkey
         |JOIN $vo ON o_custkey = c_custkey
         |JOIN $vl ON l_orderkey = o_orderkey
         |JOIN $vs ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
         |WHERE r_name IN ('AFRICA', 'AMERICA')
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name""".stripMargin)
  }

  /** TPC-H Q3 shape: shipping-priority top-k — segment-filtered
    * customer dim broadcast into orders⋈lineitem (the fact-fact join
    * shuffles on orderkey), per-order revenue agg, then top-10 by
    * revenue via TakeOrderedAndProject (never a global sort). The
    * date predicates push into both fact scans. */
  private def sqlTpch3(s: SparkSession, d: String): DataFrame = {
    val (vc, vo, vl) = (Tables.view(s, d, "customer"),
      Tables.view(s, d, "orders"), Tables.view(s, d, "lineitem"))
    s.sql(
      s"""SELECT o_orderkey,
         |       ${Det.dsumSql("l_extendedprice * (1 - l_discount)", 6)} AS revenue,
         |       o_orderdate
         |FROM $vc
         |JOIN $vo ON c_custkey = o_custkey
         |JOIN $vl ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
         |GROUP BY o_orderkey, o_orderdate
         |ORDER BY revenue DESC, o_orderkey
         |LIMIT 10""".stripMargin)
  }

  /** TPC-H Q10 shape: returned-item revenue per customer — fact-fact
    * join (orders⋈lineitem) with a selective lineitem filter, dims
    * broadcast, wide group-by (one group per customer) ranked by
    * revenue. Unlike Q5's few-group agg, the shuffle here is
    * customer-cardinality: the top-k is TakeOrderedAndProject, never
    * a global sort. */
  private def sqlTpch10(s: SparkSession, d: String): DataFrame = {
    val (vn, vc) = (Tables.view(s, d, "nation"), Tables.view(s, d, "customer"))
    val (vo, vl) = (Tables.view(s, d, "orders"), Tables.view(s, d, "lineitem"))
    s.sql(
      s"""SELECT c_custkey, c_name, n_name,
         |       ${Det.dsumSql("l_extendedprice * (1 - l_discount)", 6)} AS revenue,
         |       COUNT(*) AS n_items
         |FROM $vc
         |JOIN $vn ON c_nationkey = n_nationkey
         |JOIN $vo ON o_custkey = c_custkey
         |JOIN $vl ON l_orderkey = o_orderkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
         |GROUP BY c_custkey, c_name, n_name
         |ORDER BY revenue DESC, c_custkey
         |LIMIT 20""".stripMargin)
  }

  /** TPC-H Q18 shape: large-volume orders — a HAVING-aggregated
    * subquery feeding a semi-join back against the same fact table.
    * The inner aggregate is the map-side-combine shape (partial sums
    * shuffled per orderkey); its survivors are a tiny set that
    * broadcasts into the outer join. */
  private def sqlTpch18(s: SparkSession, d: String): DataFrame = {
    val (vc, vo, vl) = (Tables.view(s, d, "customer"),
      Tables.view(s, d, "orders"), Tables.view(s, d, "lineitem"))
    s.sql(
      s"""SELECT c_custkey, o_orderkey, o_orderdate, o_totalprice,
         |       ${Det.dsumSql("l_quantity", 2)} AS sum_qty
         |FROM $vc
         |JOIN $vo ON c_custkey = o_custkey
         |JOIN $vl ON o_orderkey = l_orderkey
         |WHERE o_orderkey IN (
         |  SELECT l_orderkey FROM $vl
         |  GROUP BY l_orderkey HAVING SUM(l_quantity) > 180)
         |GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
         |ORDER BY o_totalprice DESC, o_orderkey""".stripMargin)
  }

  /** TPC-H Q6 shape: forecast-revenue — the pure scan+filter+agg
    * probe (no join, one output row); every predicate must reach the
    * parquet scan as a pushed filter. */
  private def sqlTpch6(s: SparkSession, d: String): DataFrame = {
    val vl = Tables.view(s, d, "lineitem")
    s.sql(
      s"""SELECT ${Det.dsumSql("l_extendedprice * l_discount", 6)} AS revenue,
         |       COUNT(*) AS n_rows
         |FROM $vl
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
         |  AND l_discount BETWEEN 0.03 AND 0.07
         |  AND l_quantity < 25""".stripMargin)
  }

  /** Batch MERGE / upsert semantics (the SCD1 counterpart of
    * Analytics' SCD2): a change set is applied to the orders snapshot
    * in one pass — matched keys take the source row (update), unmatched
    * source keys append (insert), untouched target rows carry over
    * (keep). Without a transactional table format on the classpath the
    * engine expresses MERGE as its relational core: ONE full outer
    * join on the key, then per-row classification — which is exactly
    * the shuffle a Delta/Iceberg MERGE plans too, minus the commit.
    * The change set here is derived deterministically from the target
    * (keys ≡ 0 mod 7 repriced via an additive delta, keys ≡ 0 mod 13
    * mirrored to fresh negative keys), so both engines rebuild it
    * bit-identically. Output is the per-action row count + DECIMAL
    * checksum of the post-merge price column — any misclassification
    * or lost row moves a checksum.
    *
    * Scale shape: the join shuffles both sides on the key (AQE picks
    * SMJ/SHJ by size); on a bucketed target (q_join_bucketed's layout)
    * the same plan co-locates and the shuffle drops out. Everything
    * after the join is a map-side partial agg into 3 rows. */
  private def mergeUpsert(s: SparkSession, d: String): DataFrame = {
    val t = Tables.orders(s, d)
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("t_price"))
    val changes = t.filter(col("k") % 7 === 0)
      .select(col("k").as("sk"), (col("t_price") + 1234.56).as("s_price"))
      .unionAll(t.filter(col("k") % 13 === 0)
        .select((-col("k")).as("sk"), col("t_price").as("s_price")))
    t.join(changes, col("k") === col("sk"), "full_outer")
      .select(
        when(col("k").isNotNull && col("sk").isNotNull, lit("update"))
          .when(col("k").isNull, lit("insert"))
          .otherwise(lit("keep")).as("action"),
        coalesce(col("s_price"), col("t_price")).as("price"))
      .groupBy("action")
      .agg(count(lit(1)).as("n"), Det.dsum(col("price"), 2).as("total"))
      .orderBy("action")
  }

  override val queries: Map[String, Q] = Map(
    "q_merge_upsert"     -> mergeUpsert,
    "q_sql_tpch3"        -> sqlTpch3,
    "q_sql_tpch6"        -> sqlTpch6,
    "q_sql_tpch5"        -> sqlTpch5,
    "q_sql_tpch10"       -> sqlTpch10,
    "q_sql_tpch18"       -> sqlTpch18,
    "q_join_lateral"     -> joinLateral,
    "q_pivot"            -> pivot,
    "q_scalar_subq"      -> scalarSubq,
    "q_sql_tpch"         -> sqlTpch,
    "q_window_range_time" -> windowRangeTime,
    "q_date_funcs2"      -> dateFuncs2,
  )

  override val oracles: Map[String, String] = Map(
    "q_merge_upsert" ->
      s"""WITH t AS (SELECT o_orderkey AS k, o_totalprice AS t_price FROM orders),
         |changes AS (
         |  SELECT k AS sk, t_price + 1234.56 AS s_price FROM t WHERE k % 7 = 0
         |  UNION ALL
         |  SELECT -k AS sk, t_price AS s_price FROM t WHERE k % 13 = 0),
         |m AS (
         |  SELECT CASE WHEN t.k IS NOT NULL AND changes.sk IS NOT NULL THEN 'update'
         |              WHEN t.k IS NULL THEN 'insert'
         |              ELSE 'keep' END AS action,
         |         COALESCE(changes.s_price, t.t_price) AS price
         |  FROM t FULL OUTER JOIN changes ON t.k = changes.sk)
         |SELECT action, COUNT(*) AS n, ${Det.dsumSql("price", 2)} AS total
         |FROM m GROUP BY action ORDER BY action""".stripMargin,
    "q_sql_tpch10" ->
      s"""SELECT c_custkey, c_name, n_name,
         |       ${Det.dsumSql("l_extendedprice * (1 - l_discount)", 6)} AS revenue,
         |       COUNT(*) AS n_items
         |FROM customer
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN orders ON o_custkey = c_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
         |GROUP BY c_custkey, c_name, n_name
         |ORDER BY revenue DESC, c_custkey
         |LIMIT 20""".stripMargin,
    "q_sql_tpch18" ->
      s"""SELECT c_custkey, o_orderkey, o_orderdate, o_totalprice,
         |       ${Det.dsumSql("l_quantity", 2)} AS sum_qty
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |WHERE o_orderkey IN (
         |  SELECT l_orderkey FROM lineitem
         |  GROUP BY l_orderkey HAVING SUM(l_quantity) > 180)
         |GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
         |ORDER BY o_totalprice DESC, o_orderkey""".stripMargin,
    "q_sql_tpch3" ->
      s"""SELECT o_orderkey,
         |       ${Det.dsumSql("l_extendedprice * (1 - l_discount)", 6)} AS revenue,
         |       o_orderdate
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
         |GROUP BY o_orderkey, o_orderdate
         |ORDER BY revenue DESC, o_orderkey
         |LIMIT 10""".stripMargin,
    "q_sql_tpch6" ->
      s"""SELECT ${Det.dsumSql("l_extendedprice * l_discount", 6)} AS revenue,
         |       COUNT(*) AS n_rows
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
         |  AND l_discount BETWEEN 0.03 AND 0.07
         |  AND l_quantity < 25""".stripMargin,
    "q_sql_tpch5" ->
      s"""SELECT n_name,
         |       ${Det.dsumSql("l_extendedprice * (1 - l_discount)", 6)} AS revenue,
         |       COUNT(*) AS n_items
         |FROM region
         |JOIN nation ON n_regionkey = r_regionkey
         |JOIN customer ON c_nationkey = n_nationkey
         |JOIN orders ON o_custkey = c_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
         |WHERE r_name IN ('AFRICA', 'AMERICA')
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name""".stripMargin,
    "q_join_lateral" ->
      """SELECT o.o_orderkey, l.maxp, l.n
        |FROM orders o,
        |LATERAL (SELECT MAX(l_extendedprice) AS maxp, COUNT(*) AS n
        |         FROM lineitem WHERE l_orderkey = o.o_orderkey) l
        |WHERE o.o_totalprice > 450000
        |ORDER BY o_orderkey""".stripMargin,
    "q_pivot" ->
      """SELECT o_orderpriority,
        |       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        |       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
        |       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q_sql_tpch" ->
      s"""SELECT l_orderkey,
         |       ${Det.dsumSql("l_extendedprice * (1 - l_discount)", 6)} AS revenue,
         |       o_orderdate, o_orderpriority
         |FROM customer JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, l_orderkey
         |LIMIT 10""".stripMargin,
    "q_window_range_time" ->
      """SELECT event_id, user_id, ts,
        |       COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
        |                      RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS n_last_hour
        |FROM events
        |ORDER BY event_id""".stripMargin,
    "q_date_funcs2" ->
      """SELECT event_id,
        |       CAST(HOUR(ts) AS INT) AS h,
        |       CAST(MINUTE(ts) AS INT) AS mi,
        |       CAST(SECOND(ts) AS INT) AS sec,
        |       CAST(DAYOFYEAR(ts) AS INT) AS doy,
        |       CAST(WEEKOFYEAR(ts) AS INT) AS woy,
        |       CAST(ts AS DATE) + 5 AS plus5d,
        |       CAST(CAST(ts AS DATE) + INTERVAL 1 MONTH AS DATE) AS plus1m,
        |       DATE_TRUNC('hour', ts) AS hour_start
        |FROM events
        |ORDER BY event_id""".stripMargin,
    "q_scalar_subq" ->
      s"""SELECT c_custkey, c_mktsegment, c_acctbal,
         |       ${Det.r4Sql("seg_avg")} AS seg_avg_r
         |FROM customer
         |JOIN (SELECT c_mktsegment AS seg,
         |             ${Det.davgSql("c_acctbal", 2)} AS seg_avg
         |      FROM customer GROUP BY c_mktsegment) s
         |  ON c_mktsegment = seg
         |WHERE c_acctbal > seg_avg
         |ORDER BY c_custkey""".stripMargin,
  )
}
