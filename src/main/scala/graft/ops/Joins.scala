package graft.ops

import graft.{QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators: inner/broadcast/outer/semi/anti equi-joins, a
  * theta (range-band) join, and an as-of join.
  *
  * Reference analogs: the broadcast hash join is the lease-map
  * build+probe (/root/reference/task.ts:114-125, probe :228, A11);
  * the semi join is the streamable-camera membership test
  * (/root/reference/task.ts:209-212, A10).
  *
  * Scale notes:
  * - Dimension sides (part, supplier, filtered orders) are explicitly
  *   `broadcast()` so the fact scan never shuffles for them; at 100 TB
  *   the same shape holds as long as dims stay under the broadcast
  *   threshold — AQE converts to shuffled hash join otherwise.
  * - The theta join keeps BOTH inputs pre-filtered and broadcasts the
  *   small side; a BroadcastNestedLoopJoin over unfiltered fact tables
  *   would be O(n·m) and is exactly what we avoid.
  * - The as-of join uses the union+window technique: one shuffle by
  *   user_id, one ordered pass — no O(n·m) inequality join. This is
  *   the formulation that survives 1000 executors.
  */
object Joins extends QueryPack {

  private def joinInner(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).as("o")
      .join(Tables.customer(s, d).as("c"), col("o.o_custkey") === col("c.c_custkey"), "inner")
      .select(col("o.o_orderkey"), col("c.c_custkey"), col("c.c_name"), col("o.o_totalprice"))
      .orderBy("o_orderkey")

  private def joinBroadcast(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).as("l")
      .join(broadcast(Tables.part(s, d).as("p")), col("l.l_partkey") === col("p.p_partkey"))
      .join(broadcast(Tables.supplier(s, d).as("s")), col("l.l_suppkey") === col("s.s_suppkey"))
      .groupBy(col("p.p_brand"), col("s.s_name"))
      .agg(count(lit(1)).as("n_items"), graft.Det.dsum(col("l.l_quantity"), 2).as("sum_qty"))
      .orderBy("p_brand", "s_name")

  private def joinLeft(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).as("c")
      .join(
        Tables.orders(s, d).filter(col("o_totalprice") > 400000).as("o"),
        col("c.c_custkey") === col("o.o_custkey"), "left_outer")
      .select(col("c.c_custkey"), col("o.o_orderkey"), col("o.o_totalprice"))
      .orderBy(col("c_custkey").asc, col("o_orderkey").asc_nulls_first)

  private def joinFull(s: SparkSession, d: String): DataFrame = {
    val perCust = Tables.orders(s, d)
      .filter(col("o_orderstatus") === "F")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"))
    val rich = Tables.customer(s, d).filter(col("c_acctbal") > 9000)
      .select(col("c_custkey"), col("c_acctbal"))
    perCust.join(rich, col("o_custkey") === col("c_custkey"), "full_outer")
      .select(col("o_custkey"), col("c_custkey"), col("n_orders"), col("c_acctbal"))
      .orderBy(col("o_custkey").asc_nulls_first, col("c_custkey").asc_nulls_first)
  }

  private def joinSemi(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).as("c")
      .join(
        Tables.orders(s, d).filter(col("o_totalprice") > 450000).as("o"),
        col("c.c_custkey") === col("o.o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy("c_custkey")

  private def joinAnti(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).as("c")
      .join(
        Tables.orders(s, d).filter(col("o_totalprice") > 450000).as("o"),
        col("c.c_custkey") === col("o.o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy("c_custkey")

  /** Range-band theta join: both sides pre-filtered small, small side
    * broadcast, so the inequality join is a bounded nested loop. */
  private def joinTheta(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).filter(col("o_totalprice") > 495000).as("o")
    val l = Tables.lineitem(s, d).filter(col("l_quantity") >= 49).as("l")
    l.join(broadcast(o),
        col("l.l_extendedprice") >= col("o.o_totalprice") / 100
          && col("l.l_extendedprice") <= col("o.o_totalprice") / 100 + 200)
      .select(col("o.o_orderkey"), col("l.l_orderkey"), col("l.l_linenumber"),
        col("l.l_extendedprice"), col("o.o_totalprice"))
      .orderBy("o_orderkey", "l_orderkey", "l_linenumber", "l_extendedprice")
  }

  /** As-of join: for each 'error' event, the latest 'click' by the
    * same user at ts <= error ts (DuckDB ASOF JOIN semantics, inner).
    *
    * Union+window formulation: tag both sides, sort within user_id by
    * (ts, side) — clicks first on ties so `>=` semantics hold — and
    * carry the last non-null click forward. One shuffle, no n·m join.
    * (user_id, ts) is unique in the events table, so tie-breaking
    * between clicks at identical ts never arises; event_id is in the
    * sort anyway for full determinism. */
  private def joinAsof(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), lit(0).as("side"),
        col("event_id").as("oid"), col("value").as("c_value"), col("ts").as("c_ts"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts"), lit(1).as("side"),
        col("event_id").as("oid"), lit(null).cast("double").as("c_value"),
        lit(null).cast("timestamp").as("c_ts"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("side").asc, col("oid").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(errors)
      .withColumn("click_ts", last(col("c_ts"), ignoreNulls = true).over(w))
      .withColumn("click_value", last(col("c_value"), ignoreNulls = true).over(w))
      .filter(col("side") === 1 && col("click_ts").isNotNull)
      .select(col("oid").as("event_id"), col("user_id"), col("ts"),
        col("click_ts"), col("click_value"))
      .orderBy("event_id")
  }

  /** Interval/range join, window formulation: for each 'error' event,
    * how many 'click' events by the same user landed in the preceding
    * 10 minutes. The naive form is an inequality join (O(n·m) pairs
    * per user); expressed as a RANGE-frame window over the unioned
    * stream it is ONE keyed shuffle + one ordered pass — the same
    * technique as the as-of join, generalized to an interval
    * aggregate. Scales like any keyed window: state per user is
    * bounded by the interval width. */
  private def joinRange(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        when(col("event_type") === "click", 1).otherwise(0).as("is_click"))
      .selectExpr("event_id", "user_id", "ts", "event_type",
        """sum(is_click) OVER (PARTITION BY user_id ORDER BY ts
          |RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING AND CURRENT ROW) AS n_clicks""".stripMargin)
      .filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"), col("n_clicks"))
      .orderBy("event_id")

  /** Bucket width for [[joinInterval]] — equal to the interval
    * length, so every interval explodes to at most 2 buckets. */
  private val IntervalBucketSec: Long = 7L * 86400

  /** Interval-OVERLAP join (interval × interval — distinct from
    * [[joinRange]]'s point-in-window): urgent-order weeks vs low-
    * priority-order weeks, aggregated by overlap month. The naive
    * plan is a pure inequality join — a BroadcastNestedLoop /
    * cartesian, THE 100 TB killer. The scalable formulation maps
    * each interval to the fixed-width time buckets it touches
    * (explode ≤2 rows here) and equi-joins on the bucket, so the
    * pair search is local to a bucket and shuffles hash-partition
    * both sides — O(pairs-per-bucket), linear at scale. A pair
    * overlapping in several buckets would duplicate, so the join
    * keeps only the bucket containing GREATEST(a_s, b_s) — the
    * overlap start lies in both intervals, hence in both bucket
    * lists: each true pair survives exactly once, no distinct
    * needed. The oracle is the plain inequality join — the
    * bucketization must be result-invariant and the hash-compare
    * proves it. */
  private def joinInterval(s: SparkSession, d: String): DataFrame = {
    def side(pri: String, p: String): DataFrame =
      Tables.orders(s, d)
        .filter(col("o_orderpriority") === pri)
        .select(
          col("o_orderdate").as(s"${p}_s"),
          (col("o_orderdate") + expr("INTERVAL 7 DAYS")).as(s"${p}_e"))
        .withColumn(s"${p}_bkt", explode(expr(
          s"sequence(unix_timestamp(${p}_s) div $IntervalBucketSec," +
            s" (unix_timestamp(${p}_e) - 1) div $IntervalBucketSec)")))
    // explicit bucket-keyed repartition (r16): the per-bucket pair
    // search is compute-amplified (|a_bkt|·|b_bkt| predicate evals per
    // bucket) while the shuffled bytes are tiny, so AQE's bytes-driven
    // coalescing serialized the whole pair stage into one task
    // (measured 1.7 s single-task). Pinning both sides to
    // cluster-parallelism bucket partitions keeps the pairwise work
    // spread; parallelism is bounded by distinct buckets either way.
    val p = s.sparkContext.defaultParallelism
    side("1-URGENT", "a").repartition(p, col("a_bkt"))
      .join(side("5-LOW", "b").repartition(p, col("b_bkt")),
        col("a_bkt") === col("b_bkt") &&
          col("a_s") < col("b_e") && col("b_s") < col("a_e") &&
          expr(s"unix_timestamp(greatest(a_s, b_s)) div $IntervalBucketSec")
            === col("a_bkt"))
      .groupBy(to_date(date_trunc("month", greatest(col("a_s"), col("b_s")))).as("m"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(datediff(least(col("a_e"), col("b_e")).cast("date"),
          greatest(col("a_s"), col("b_s")).cast("date"))).as("overlap_days"))
      .orderBy("m")
  }

  /** Salt-factor for [[joinSkew]]: the hot key's rows spread over
    * this many shuffle tasks instead of one. */
  private val SkewSalts = 8

  /** Skew-resilient join: lineitem is keyed so that ~4/7 of all rows
    * share ONE hot supplier key — at scale that key's shuffle
    * partition would straggle the whole stage. The salted two-phase
    * pattern bounds per-task work: every fact row gets a
    * deterministic salt in [0, S); the dim side is replicated ×S
    * (explode of a literal range — dim·S stays dim-sized); the join
    * key becomes (key, salt), so the hot key occupies S tasks. The
    * dim is shuffle-hash-hinted precisely because this query models
    * the case where the dim is TOO BIG to broadcast (a broadcast
    * join would sidestep skew entirely — see q_join_broadcast).
    * The oracle is the PLAIN unsalted join: salting must be
    * result-invariant, and the hash-compare proves it. */
  private def joinSkew(s: SparkSession, d: String): DataFrame = {
    val fact = Tables.lineitem(s, d)
      .select(
        when(col("l_linenumber") <= 4, lit(1L)).otherwise(col("l_suppkey")).as("k"),
        col("l_quantity"),
        pmod(col("l_orderkey") + col("l_linenumber"), lit(SkewSalts)).as("salt"))
    val dim = Tables.supplier(s, d)
      .select(col("s_suppkey"), col("s_nationkey"),
        explode(sequence(lit(0), lit(SkewSalts - 1))).as("salt"))
    fact.join(dim.hint("shuffle_hash"),
        col("k") === col("s_suppkey") && fact("salt") === dim("salt"))
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_items"), graft.Det.dsum(col("l_quantity"), 2).as("sum_qty"))
      .orderBy("s_nationkey")
  }

  /** Cartesian product of the two bounded dims (5 × 25 rows) — the
    * one join shape that is ONLY safe when at least one side is known
    * tiny; planned as BroadcastNestedLoopJoin, never over facts. */
  private def joinCross(s: SparkSession, d: String): DataFrame =
    Tables.region(s, d).crossJoin(Tables.nation(s, d))
      .select(col("r_name"), col("n_name"))
      .orderBy("r_name", "n_name")

  /** Null-safe equi self-join (<=>): NULL keys match each other,
    * unlike plain `=` where NULL = NULL is NULL and the rows vanish.
    * Keys are made sparse-null deterministically with nullif. */
  private def joinNullsafe(s: SparkSession, d: String): DataFrame = {
    val sup = Tables.supplier(s, d)
      .select(col("s_suppkey"), expr("nullif(s_nationkey % 5, 0)").as("k"))
    sup.as("a")
      .join(sup.as("b"),
        col("a.k") <=> col("b.k") && col("a.s_suppkey") < col("b.s_suppkey"))
      .groupBy(col("a.k").as("k"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("k").asc_nulls_first)
  }

  /** Bucketed co-located fact-fact join: both tables written
    * `bucketBy(8, key)` + `sortBy(key)` into the session catalog,
    * then joined WITHOUT shuffling either side — the scan itself is
    * bucket-aware, so the sort-merge join reads co-located buckets
    * directly. This is the 100 TB move for a repeatedly-joined
    * fact-fact pair (orders⋈lineitem): pay the layout once at write
    * time, skip the dominant exchange on every subsequent join.
    * PlanShapeSpec asserts the join has NO shuffle below it and the
    * scans report bucketed reads. The merge hint keeps the plan
    * honest at test scale, where orders would otherwise broadcast
    * (a broadcast would make the co-location demo vacuous; at real
    * scale neither side broadcasts). */
  private def joinBucketed(s: SparkSession, d: String): DataFrame = {
    val suf = d.replaceAll("[^A-Za-z0-9]", "_")
    val (liT, ordT) = (s"graft_li_bkt_$suf", s"graft_ord_bkt_$suf")
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
      .write.mode("overwrite").format("parquet")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(liT)
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderpriority"))
      .write.mode("overwrite").format("parquet")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(ordT)
    s.table(liT).hint("merge")
      .join(s.table(ordT), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        graft.Det.dsum(col("l_extendedprice"), 2).as("sum_price"))
      .orderBy("o_orderpriority")
  }

  override val queries: Map[String, Q] = Map(
    "q_join_cross"     -> joinCross,
    "q_join_bucketed"  -> joinBucketed,
    "q_join_nullsafe"  -> joinNullsafe,
    "q_join_inner"     -> joinInner,
    "q_join_broadcast" -> joinBroadcast,
    "q_join_left"      -> joinLeft,
    "q_join_full"      -> joinFull,
    "q_join_semi"      -> joinSemi,
    "q_join_anti"      -> joinAnti,
    "q_join_theta"     -> joinTheta,
    "q_join_asof"      -> joinAsof,
    "q_join_skew"      -> joinSkew,
    "q_join_range"     -> joinRange,
    "q_join_interval"  -> joinInterval,
  )

  override val oracles: Map[String, String] = Map(
    "q_join_interval" ->
      """WITH a AS (
        |  SELECT o_orderdate AS a_s, o_orderdate + INTERVAL 7 DAY AS a_e
        |  FROM orders WHERE o_orderpriority = '1-URGENT'),
        |b AS (
        |  SELECT o_orderdate AS b_s, o_orderdate + INTERVAL 7 DAY AS b_e
        |  FROM orders WHERE o_orderpriority = '5-LOW')
        |SELECT CAST(DATE_TRUNC('month', GREATEST(a_s, b_s)) AS DATE) AS m,
        |       COUNT(*) AS n_pairs,
        |       CAST(SUM(DATEDIFF('day', CAST(GREATEST(a_s, b_s) AS DATE),
        |                         CAST(LEAST(a_e, b_e) AS DATE))) AS BIGINT) AS overlap_days
        |FROM a JOIN b ON a_s < b_e AND b_s < a_e
        |GROUP BY m
        |ORDER BY m""".stripMargin,
    "q_join_bucketed" ->
      s"""SELECT o_orderpriority, COUNT(*) AS n_items,
         |       ${graft.Det.dsumSql("l_extendedprice", 2)} AS sum_price
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderpriority
         |ORDER BY o_orderpriority""".stripMargin,
    "q_join_cross" ->
      """SELECT r_name, n_name
        |FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,
    "q_join_nullsafe" ->
      """SELECT a.k, COUNT(*) AS n_pairs
        |FROM (SELECT s_suppkey, NULLIF(s_nationkey % 5, 0) AS k FROM supplier) a
        |JOIN (SELECT s_suppkey, NULLIF(s_nationkey % 5, 0) AS k FROM supplier) b
        |  ON a.k IS NOT DISTINCT FROM b.k AND a.s_suppkey < b.s_suppkey
        |GROUP BY a.k
        |ORDER BY a.k NULLS FIRST""".stripMargin,
    "q_join_inner" ->
      """SELECT o_orderkey, c_custkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "q_join_broadcast" ->
      s"""SELECT p_brand, s_name, COUNT(*) AS n_items,
         |       ${graft.Det.dsumSql("l_quantity", 2)} AS sum_qty
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |GROUP BY p_brand, s_name
         |ORDER BY p_brand, s_name""".stripMargin,
    "q_join_left" ->
      """SELECT c_custkey, o_orderkey, o_totalprice
        |FROM customer
        |LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) o
        |  ON c_custkey = o_custkey
        |ORDER BY c_custkey ASC, o_orderkey ASC NULLS FIRST""".stripMargin,
    "q_join_full" ->
      """SELECT o_custkey, c_custkey, n_orders, c_acctbal
        |FROM (SELECT o_custkey, COUNT(*) AS n_orders FROM orders
        |      WHERE o_orderstatus = 'F' GROUP BY o_custkey) o
        |FULL JOIN (SELECT c_custkey, c_acctbal FROM customer
        |           WHERE c_acctbal > 9000) c
        |  ON o_custkey = c_custkey
        |ORDER BY o_custkey ASC NULLS FIRST, c_custkey ASC NULLS FIRST""".stripMargin,
    "q_join_semi" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 450000)
        |ORDER BY c_custkey""".stripMargin,
    "q_join_anti" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 450000)
        |ORDER BY c_custkey""".stripMargin,
    "q_join_theta" ->
      """SELECT o.o_orderkey, l.l_orderkey, l.l_linenumber, l.l_extendedprice, o.o_totalprice
        |FROM (SELECT * FROM lineitem WHERE l_quantity >= 49) l
        |JOIN (SELECT * FROM orders WHERE o_totalprice > 495000) o
        |  ON l.l_extendedprice >= o.o_totalprice / 100
        | AND l.l_extendedprice <= o.o_totalprice / 100 + 200
        |ORDER BY o_orderkey, l_orderkey, l_linenumber, l_extendedprice""".stripMargin,
    "q_join_asof" ->
      """SELECT e.event_id, e.user_id, e.ts, c.ts AS click_ts, c.value AS click_value
        |FROM (SELECT * FROM events WHERE event_type = 'error') e
        |ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON e.user_id = c.user_id AND e.ts >= c.ts
        |ORDER BY e.event_id""".stripMargin,
    // the UNSALTED join: the hash-compare proves salting is
    // result-invariant
    "q_join_skew" ->
      s"""SELECT s_nationkey, COUNT(*) AS n_items,
         |       ${graft.Det.dsumSql("l_quantity", 2)} AS sum_qty
         |FROM (SELECT CASE WHEN l_linenumber <= 4 THEN 1 ELSE l_suppkey END AS k,
         |             l_quantity FROM lineitem) f
         |JOIN supplier ON f.k = s_suppkey
         |GROUP BY s_nationkey
         |ORDER BY s_nationkey""".stripMargin,
    // the INEQUALITY-JOIN form: the window formulation must agree
    "q_join_range" ->
      """SELECT e.event_id, e.user_id, e.ts,
        |       (SELECT COUNT(*) FROM events c
        |        WHERE c.event_type = 'click' AND c.user_id = e.user_id
        |          AND c.ts BETWEEN e.ts - INTERVAL 10 MINUTE AND e.ts) AS n_clicks
        |FROM events e
        |WHERE e.event_type = 'error'
        |ORDER BY e.event_id""".stripMargin,
  )
}
