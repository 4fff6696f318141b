package graft.ops

import graft.{Det, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Extended SQL-string surface: the remaining TPC-H plan shapes,
  * adapted to the driver schema (no partsupp / l_shipmode /
  * l_commitdate / c_phone columns — each query keeps the ORIGINAL
  * query's plan-shape point and swaps the missing column for an
  * available one).
  *
  * Every query is written ONCE as a dialect-portable SQL template
  * parameterized only by physical table names: the Spark side runs it
  * over dir-keyed temp views, the oracle side is the identical text
  * over DuckDB's parquet views. Textual identity removes the
  * dialect-drift failure mode entirely — both engines parse the same
  * expression tree, and Det's decimal-sum/floor-round conventions
  * make every double deterministic.
  *
  * Plan-shape inventory this pack adds (each asserted in
  * PlanShapeSpec where load-bearing):
  *  - Q1  full 8-aggregate scan shape (partial agg dominates)
  *  - Q4  correlated EXISTS with a non-equi outer reference
  *  - Q7  same dim joined twice under different aliases (nation²)
  *  - Q9  5-table profit join with LIKE-filtered build side
  *  - Q12 conditional COUNT FILTER pivot over a fact-fact join
  *  - Q13 outer-join histogram (join-then-double-agg)
  *  - Q14 two-branch conditional aggregate ratio
  *  - Q15 scalar-max subquery against a reused aggregate (view twice)
  *  - Q16 null-aware NOT IN anti-join + COUNT(DISTINCT)
  *  - Q17 per-key correlated average (decorrelates to agg+join)
  *  - Q19 OR-of-ANDs disjunctive pushdown across two tables
  *  - Q21 double-correlated EXISTS / NOT EXISTS (the "only late
  *        supplier" pattern)
  *  - Q22 anti-join + uncorrelated scalar subquery gate
  */
object SqlSuite extends QueryPack {

  private type T = Map[String, String]
  private val TableNames =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")

  private def run(s: SparkSession, d: String, tpl: T => String): DataFrame =
    s.sql(tpl(TableNames.map(n => n -> Tables.view(s, d, n)).toMap))

  private val OracleT: T = TableNames.map(n => n -> n).toMap

  /** TPC-H Q1: the canonical full-aggregate scan — 8 aggregates over
    * one filtered fact scan; at 100 TB the partial (map-side) agg
    * reduces each task to 6 rows before the 6-row shuffle. */
  private def q1(t: T): String =
    s"""SELECT l_returnflag, l_linestatus,
       |       ${Det.dsumSql("l_quantity", 2)} AS sum_qty,
       |       ${Det.dsumSql("l_extendedprice", 2)} AS sum_base_price,
       |       ${Det.dsumSql("l_extendedprice * (1 - l_discount)", 6)} AS sum_disc_price,
       |       ${Det.dsumSql("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6)} AS sum_charge,
       |       ${Det.davgSql("l_quantity", 2)} AS avg_qty,
       |       ${Det.davgSql("l_extendedprice", 2)} AS avg_price,
       |       ${Det.davgSql("l_discount", 2)} AS avg_disc,
       |       COUNT(*) AS count_order
       |FROM ${t("lineitem")}
       |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q2: minimum-cost supplier — the correlated MIN subquery
    * selecting, per part, exactly the rows achieving the per-part
    * minimum (lineitem stands in for the missing partsupp bridge;
    * the min is over raw parquet doubles, so the equality is exact
    * on both engines). DISTINCT because several shipments can tie at
    * the minimum price. */
  private def q2(t: T): String =
    s"""SELECT DISTINCT p_partkey, p_name, s_suppkey, s_name, l_extendedprice
       |FROM ${t("part")}
       |JOIN ${t("lineitem")} ON p_partkey = l_partkey
       |JOIN ${t("supplier")} ON s_suppkey = l_suppkey
       |WHERE p_size = 25 AND p_type = 'LARGE'
       |  AND l_extendedprice = (SELECT MIN(l2.l_extendedprice)
       |                         FROM ${t("lineitem")} l2
       |                         WHERE l2.l_partkey = p_partkey)
       |ORDER BY p_partkey, s_suppkey, l_extendedprice""".stripMargin

  /** TPC-H Q4: priority checking — correlated EXISTS whose inner
    * predicate references the OUTER table's o_orderdate (a non-equi
    * correlation; Catalyst's DecorrelateInnerQuery turns it into a
    * left-semi join with the date condition in the join predicate,
    * never a per-row subquery). l_commitdate/l_receiptdate don't
    * exist in this schema; "late" = shipped >30 days after order. */
  private def q4(t: T): String =
    s"""SELECT o_orderpriority, COUNT(*) AS order_count
       |FROM ${t("orders")}
       |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
       |  AND EXISTS (SELECT 1 FROM ${t("lineitem")}
       |              WHERE l_orderkey = o_orderkey
       |                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q7: volume shipping — the SAME nation dim joined twice
    * under different aliases (supplier side and customer side), with
    * the symmetric two-nation OR predicate. Both alias copies
    * broadcast independently; the fact-fact orders⋈lineitem shuffle
    * is the only exchange that scales with data. */
  private def q7(t: T): String =
    s"""SELECT supp_nation, cust_nation, l_year,
       |       ${Det.dsumSql("volume", 6)} AS revenue,
       |       COUNT(*) AS n_items
       |FROM (
       |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |         CAST(YEAR(l_shipdate) AS INT) AS l_year,
       |         l_extendedprice * (1 - l_discount) AS volume
       |  FROM ${t("supplier")}
       |  JOIN ${t("lineitem")} ON s_suppkey = l_suppkey
       |  JOIN ${t("orders")}   ON o_orderkey = l_orderkey
       |  JOIN ${t("customer")} ON c_custkey = o_custkey
       |  JOIN ${t("nation")} n1 ON s_nationkey = n1.n_nationkey
       |  JOIN ${t("nation")} n2 ON c_nationkey = n2.n_nationkey
       |  WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
       |     OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
       |) shipping
       |GROUP BY supp_nation, cust_nation, l_year
       |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** TPC-H Q8: national market share — a conditional-aggregate RATIO
    * per group (the supplier-nation share of each order-year's
    * volume) over the 7-table snowflake with the customer side
    * region-filtered. Same two-nation-alias device as Q7, plus the
    * two-branch ratio of Q14 — per group instead of globally. */
  private def q8(t: T): String =
    s"""SELECT o_year,
       |       ${Det.r4Sql(s"""${Det.dsumSql(
            "CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END", 6)}
              / ${Det.dsumSql("volume", 6)}""")} AS mkt_share,
       |       COUNT(*) AS n_items
       |FROM (
       |  SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
       |         l_extendedprice * (1 - l_discount) AS volume,
       |         n2.n_name AS supp_nation
       |  FROM ${t("part")}
       |  JOIN ${t("lineitem")} ON p_partkey = l_partkey
       |  JOIN ${t("supplier")} ON s_suppkey = l_suppkey
       |  JOIN ${t("orders")}   ON o_orderkey = l_orderkey
       |  JOIN ${t("customer")} ON c_custkey = o_custkey
       |  JOIN ${t("nation")} n1 ON c_nationkey = n1.n_nationkey
       |  JOIN ${t("nation")} n2 ON s_nationkey = n2.n_nationkey
       |  JOIN ${t("region")} ON n1.n_regionkey = r_regionkey
       |  WHERE r_name = 'AFRICA' AND p_type = 'STANDARD'
       |) all_nations
       |GROUP BY o_year
       |ORDER BY o_year""".stripMargin

  /** TPC-H Q9: product-type profit — five-table join where the
    * build side (part) is LIKE-filtered before joining; the schema
    * has no ps_supplycost, so cost is proxied by p_retailprice-based
    * unit cost. Group keys come from two different dims (nation,
    * order year). */
  private def q9(t: T): String =
    s"""SELECT nation, o_year, ${Det.dsumSql("amount", 4)} AS sum_profit
       |FROM (
       |  SELECT n_name AS nation,
       |         CAST(YEAR(o_orderdate) AS INT) AS o_year,
       |         l_extendedprice * (1 - l_discount)
       |           - p_retailprice * l_quantity * 0.1 AS amount
       |  FROM ${t("part")}
       |  JOIN ${t("lineitem")} ON p_partkey = l_partkey
       |  JOIN ${t("supplier")} ON s_suppkey = l_suppkey
       |  JOIN ${t("orders")}   ON o_orderkey = l_orderkey
       |  JOIN ${t("nation")}   ON s_nationkey = n_nationkey
       |  WHERE p_name LIKE '%bolt%'
       |) profit
       |GROUP BY nation, o_year
       |ORDER BY nation, o_year""".stripMargin

  /** TPC-H Q11: important stock — a grouped aggregate gated by its
    * own global total (value > 0.1% of the national total). The gate
    * is a global window over the ALREADY-AGGREGATED (part-cardinality)
    * set, not a scalar subquery over a repeated CTE: Spark plans no
    * exchange/subquery reuse across a CTE referenced twice (measured
    * — the fact scan + join ran TWICE in the subquery form), while
    * the window form aggregates once and the global window sees only
    * dim-sized rows. The threshold is a decimal-exact sum on both
    * engines, so the boundary comparison cannot split. */
  private def q11(t: T): String =
    s"""WITH pv AS (
       |  SELECT l_partkey, ${Det.dsumSql("l_extendedprice", 2)} AS value
       |  FROM ${t("lineitem")}
       |  JOIN ${t("supplier")} ON l_suppkey = s_suppkey
       |  WHERE s_nationkey = 3
       |  GROUP BY l_partkey)
       |SELECT l_partkey, value FROM (
       |  SELECT l_partkey, value,
       |         CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER () AS DOUBLE) * 0.001 AS thr
       |  FROM pv)
       |WHERE value > thr
       |ORDER BY value DESC, l_partkey""".stripMargin

  /** TPC-H Q12: shipmode priority pivot — conditional COUNT FILTER
    * aggregation over the orders⋈lineitem fact-fact join (no
    * l_shipmode column; l_linestatus carries the group role). */
  private def q12(t: T): String =
    s"""SELECT l_linestatus,
       |       COUNT(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))     AS high_line_count,
       |       COUNT(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')) AS low_line_count
       |FROM ${t("orders")}
       |JOIN ${t("lineitem")} ON o_orderkey = l_orderkey
       |WHERE l_returnflag = 'N'
       |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
       |GROUP BY l_linestatus
       |ORDER BY l_linestatus""".stripMargin

  /** TPC-H Q13: customer order-count distribution — LEFT join (so
    * zero-order customers survive as count 0) then a second aggregate
    * over the first's output: the join-then-histogram shape. The ON
    * clause carries an extra non-join predicate, which must NOT be
    * pushed below the outer join's null-extension. */
  private def q13(t: T): String =
    s"""SELECT c_count, COUNT(*) AS custdist
       |FROM (
       |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
       |  FROM ${t("customer")}
       |  LEFT JOIN ${t("orders")}
       |    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
       |  GROUP BY c_custkey
       |) c_orders
       |GROUP BY c_count
       |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** TPC-H Q14: promo revenue — two-branch conditional aggregate
    * ratio in a single pass (no self-join); one output row. */
  private def q14(t: T): String =
    s"""SELECT ${Det.r4Sql(
            s"""100.0 * ${Det.dsumSql(
                 "CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END", 6)}
                / ${Det.dsumSql("l_extendedprice * (1 - l_discount)", 6)}""")} AS promo_revenue,
       |       COUNT(*) AS n_rows
       |FROM ${t("lineitem")}
       |JOIN ${t("part")} ON l_partkey = p_partkey
       |WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
       |  AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'""".stripMargin

  /** TPC-H Q15: top supplier — the revenue aggregate gated by its own
    * maximum. Expressed as MAX() OVER () on the single aggregate pass
    * rather than a scalar subquery over the CTE: Spark plans no reuse
    * across a CTE referenced twice (measured — the 3-month lineitem
    * scan + agg executed TWICE in the subquery form). The window sits
    * DIRECTLY on the revenue aggregate (r7) — supplier joins the
    * already-max-filtered rows — so the global window provably sees
    * only supplier-cardinality aggregate output (PlanShapeSpec's
    * tightened guard: the bounded subtree must sit under the window
    * through narrow nodes only, never across a join). The
    * decimal-exact revenue makes the double equality safe. */
  private def q15(t: T): String =
    s"""WITH revenue AS (
       |  SELECT l_suppkey AS supplier_no,
       |         ${Det.dsumSql("l_extendedprice * (1 - l_discount)", 6)} AS total_revenue
       |  FROM ${t("lineitem")}
       |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
       |  GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name, total_revenue FROM ${t("supplier")}
       |JOIN (
       |  SELECT supplier_no, total_revenue FROM (
       |    SELECT supplier_no, total_revenue,
       |           MAX(total_revenue) OVER () AS max_rev
       |    FROM revenue)
       |  WHERE total_revenue = max_rev
       |) top ON s_suppkey = supplier_no
       |ORDER BY s_suppkey""".stripMargin

  /** TPC-H Q16: supplier count by part attribute — COUNT(DISTINCT)
    * behind a null-aware NOT IN anti-join (lineitem stands in for the
    * missing partsupp bridge). */
  private def q16(t: T): String =
    s"""SELECT p_brand, p_type, COUNT(DISTINCT l_suppkey) AS supplier_cnt
       |FROM ${t("part")}
       |JOIN ${t("lineitem")} ON p_partkey = l_partkey
       |WHERE p_type <> 'PROMO'
       |  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
       |  AND l_suppkey NOT IN
       |      (SELECT s_suppkey FROM ${t("supplier")} WHERE s_acctbal < 100)
       |GROUP BY p_brand, p_type
       |ORDER BY supplier_cnt DESC, p_brand, p_type""".stripMargin

  /** TPC-H Q17: small-quantity-order revenue — correlated per-part
    * average inside the WHERE; Catalyst decorrelates to a per-part
    * aggregate joined back on partkey. The inner average uses the
    * same decimal-exact formulation on both engines, so the boundary
    * comparison can never split. */
  private def q17(t: T): String =
    s"""SELECT ${Det.r4Sql(s"${Det.dsumSql("l_extendedprice", 2)} / 7.0")} AS avg_yearly,
       |       COUNT(*) AS n_rows
       |FROM ${t("lineitem")}
       |JOIN ${t("part")} ON p_partkey = l_partkey
       |WHERE p_brand = 'Brand#23'
       |  AND l_quantity < (SELECT 0.5 * ${Det.davgSql("l2.l_quantity", 2)}
       |                    FROM ${t("lineitem")} l2
       |                    WHERE l2.l_partkey = p_partkey)""".stripMargin

  /** TPC-H Q19: discounted revenue — the OR-of-ANDs disjunctive
    * predicate spanning both join sides. The single-table conjuncts
    * common to every branch (p_size >= 1, quantity bounds) are what
    * the optimizer can push; PlanShapeSpec asserts the part scan
    * carries pushed filters rather than a bare scan. */
  private def q19(t: T): String =
    s"""SELECT ${Det.dsumSql("l_extendedprice * (1 - l_discount)", 6)} AS revenue,
       |       COUNT(*) AS n_rows
       |FROM ${t("lineitem")}
       |JOIN ${t("part")} ON p_partkey = l_partkey
       |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       |       AND l_quantity BETWEEN 1 AND 11)
       |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       |       AND l_quantity BETWEEN 10 AND 20)
       |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
       |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  /** TPC-H Q20: suppliers with excess shipments — the IN-subquery
    * whose inner query is itself a filtered join + HAVING aggregate
    * (part name filter nested inside the supplier selection). */
  private def q20(t: T): String =
    s"""SELECT s_suppkey, s_name
       |FROM ${t("supplier")}
       |WHERE s_suppkey IN (
       |  SELECT l_suppkey
       |  FROM ${t("lineitem")}
       |  JOIN ${t("part")} ON p_partkey = l_partkey
       |  WHERE p_name LIKE '%red%'
       |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
       |  GROUP BY l_suppkey
       |  HAVING ${Det.dsumSql("l_quantity", 2)} > 100.0)
       |ORDER BY s_suppkey""".stripMargin

  /** TPC-H Q21: suppliers who kept orders waiting — the double
    * correlated EXISTS / NOT EXISTS pattern ("another supplier was on
    * the order, but no OTHER supplier was late"). The late flag is
    * computed once in a shared derived table so the correlation stays
    * equality-on-orderkey plus a <> on the outer supplier — the shape
    * DecorrelateInnerQuery turns into one semi and one anti join
    * against the same aggregate-free subtree. */
  private def q21(t: T): String =
    s"""WITH lo AS (
       |  SELECT l_orderkey, l_suppkey,
       |         l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
       |  FROM ${t("lineitem")}
       |  JOIN ${t("orders")} ON o_orderkey = l_orderkey
       |  WHERE o_orderstatus = 'F')
       |SELECT s_name, COUNT(*) AS numwait
       |FROM ${t("supplier")}
       |JOIN lo l1 ON s_suppkey = l1.l_suppkey
       |WHERE l1.late
       |  AND EXISTS (SELECT 1 FROM lo l2
       |              WHERE l2.l_orderkey = l1.l_orderkey
       |                AND l2.l_suppkey <> l1.l_suppkey)
       |  AND NOT EXISTS (SELECT 1 FROM lo l3
       |                  WHERE l3.l_orderkey = l1.l_orderkey
       |                    AND l3.l_suppkey <> l1.l_suppkey
       |                    AND l3.late)
       |GROUP BY s_name
       |ORDER BY numwait DESC, s_name
       |LIMIT 20""".stripMargin

  /** TPC-H Q22: global sales opportunity — customers above the
    * corpus average balance (uncorrelated scalar subquery, computed
    * once and broadcast) who never placed an urgent order (anti-join;
    * the synthetic data gives every customer SOME order, so the
    * original "no orders at all" predicate would select zero rows and
    * prove nothing). */
  private def q22(t: T): String =
    s"""SELECT c_mktsegment, COUNT(*) AS numcust,
       |       ${Det.dsumSql("c_acctbal", 2)} AS totacctbal
       |FROM ${t("customer")}
       |WHERE c_acctbal > (SELECT ${Det.davgSql("c_acctbal", 2)}
       |                   FROM ${t("customer")} WHERE c_acctbal > 0.0)
       |  AND NOT EXISTS (SELECT 1 FROM ${t("orders")}
       |                  WHERE o_custkey = c_custkey
       |                    AND o_orderpriority = '1-URGENT')
       |GROUP BY c_mktsegment
       |ORDER BY c_mktsegment""".stripMargin

  private val shapes: Map[String, T => String] = Map(
    "q_sql_tpch1"  -> q1,
    "q_sql_tpch2"  -> q2,
    "q_sql_tpch4"  -> q4,
    "q_sql_tpch8"  -> q8,
    "q_sql_tpch11" -> q11,
    "q_sql_tpch20" -> q20,
    "q_sql_tpch7"  -> q7,
    "q_sql_tpch9"  -> q9,
    "q_sql_tpch12" -> q12,
    "q_sql_tpch13" -> q13,
    "q_sql_tpch14" -> q14,
    "q_sql_tpch15" -> q15,
    "q_sql_tpch16" -> q16,
    "q_sql_tpch17" -> q17,
    "q_sql_tpch19" -> q19,
    "q_sql_tpch21" -> q21,
    "q_sql_tpch22" -> q22,
  )

  override val queries: Map[String, Q] =
    shapes.map { case (k, tpl) => k -> ((s: SparkSession, d: String) => run(s, d, tpl)) }

  override val oracles: Map[String, String] =
    shapes.map { case (k, tpl) => k -> tpl(OracleT) }
}
