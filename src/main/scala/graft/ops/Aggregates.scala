package graft.ops

import graft.{Det, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Aggregation operators: hash aggregate (TPC-H Q1 shape), distinct
  * counts, approximate sketches, rollup/cube/grouping sets.
  *
  * The reference computes no aggregates at all (SURVEY.md §2 negative
  * results) — this is Tier-B surface.
  *
  * Scale notes: groupBy on low-cardinality keys gets map-side partial
  * aggregation for free (HashAggregate partial → shuffle tiny →
  * final); count(DISTINCT x) is planned by Catalyst as a two-phase
  * expand+agg; rollup/cube use the Expand operator (rows × number of
  * grouping sets) — at 100 TB prefer ROLLUP over CUBE when the
  * hierarchy allows, since Expand multiplies the shuffle volume.
  *
  * NULL-vs-ALL: rollup/cube emit NULL for rolled-up keys; we COALESCE
  * them to a sentinel so the oracle compare never sorts NULL keys
  * (Spark and DuckDB default NULL sort order differ).
  */
object Aggregates extends QueryPack {

  /** TPC-H Q1 shape: the canonical partial+final hash aggregate. */
  private def aggGroup(s: SparkSession, d: String): DataFrame = {
    val disc  = col("l_extendedprice") * (lit(1) - col("l_discount"))
    val charge = disc * (lit(1) + col("l_tax"))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Det.dsum(col("l_quantity"), 2).as("sum_qty"),
        Det.dsum(col("l_extendedprice"), 2).as("sum_base_price"),
        Det.dsum(disc, 6).as("sum_disc_price"),
        Det.dsum(charge, 6).as("sum_charge"),
        Det.davg(col("l_quantity"), 2).as("avg_qty"),
        Det.davg(col("l_extendedprice"), 2).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  private def aggDistinct(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  /** Approximate sketches (HLL++, quantile digest), oracle-checked
    * through their guarantees: the sketch estimates themselves are
    * engine-specific, so the row carries the EXACT distinct count
    * (hash-matched against DuckDB) plus the error-bound verdicts —
    * HLL within 3× its default 5% rsd, approx-median inside the exact
    * (p40, p60) band (rank error n/1000 << n/10). The oracle asserts
    * the exact column and TRUE for both verdicts, so a sketch drifting
    * out of its published bound turns the row red — the ScalaTest
    * error-bound check promoted into the driver's oracle gate. */
  private def aggApprox(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        approx_count_distinct(col("l_partkey")).as("ap"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("am"),
        expr("percentile(l_extendedprice, 0.4)").as("p40"),
        expr("percentile(l_extendedprice, 0.6)").as("p60"))
      .select(col("l_returnflag"), col("n_parts"),
        (abs(col("ap") - col("n_parts")) / col("n_parts") <= 0.15).as("hll_ok"),
        (col("am") >= col("p40") && col("am") <= col("p60")).as("median_ok"))
      .orderBy("l_returnflag")

  /** The MERGEABLE-sketch surface (Datasketches HLL): per-subgroup
    * binary sketches built in one pass, then RE-aggregated with
    * hll_union_agg — the two-level pattern a 100 TB deployment uses
    * (persist per-partition/per-day sketches, merge at query time
    * without touching raw data). Distinct from q_agg_approx's
    * approx_count_distinct, which hides the sketch: here the sketch
    * is a value that survives a shuffle/write between build and
    * merge. Approximate → no oracle; error vs exact is bounded in
    * PropertySpec. */
  private def aggSketch(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(hll_sketch_agg(col("l_partkey")).as("sk"))
      .groupBy(col("l_returnflag"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_parts"))
      .orderBy("l_returnflag")

  /** The same persist-then-merge sketch workflow in the regime where
    * it is EXACT, so the full DuckDB hash oracle applies: a
    * DataSketches HLL holds raw 26-bit coupons (LIST then SET mode)
    * until ~3/4·2^(lgK-3) distincts before switching to HLL
    * registers, and in coupon mode the rounded estimate is the exact
    * distinct count (the sub-0.5 collision correction for n ≪ 2^26
    * vanishes under rounding). lgConfigK=14 keeps the ≤1000 distinct
    * suppliers per return flag coupon-resident at every test scale
    * (measured: estimate ≡ countDistinct at sf0.01 AND sf0.1;
    * lgK=12 drifts to 988/1000 at sf0.1). The 100 TB posture is the
    * point of the pattern: per-day/per-partition sketches persist and
    * merge without re-touching raw data, and a deployment sizes lgK
    * so the tier it must report exactly stays in coupon mode while
    * larger cardinalities degrade gracefully to ±0.8% HLL error. */
  private def aggSketchExact(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(hll_sketch_agg(col("l_suppkey"), lit(14)).as("sk"))
      .groupBy(col("l_returnflag"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("n_supp"))
      .orderBy("l_returnflag")

  private def sentinel(df: DataFrame): DataFrame =
    df.select(
      coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
      coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
      col("sum_qty"), col("n_rows"))
      .orderBy("rf", "ls")

  private def aggRollup(s: SparkSession, d: String): DataFrame =
    sentinel(Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(Det.dsum(col("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n_rows")))

  private def aggCube(s: SparkSession, d: String): DataFrame =
    sentinel(Tables.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(Det.dsum(col("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n_rows")))

  private def aggGsets(s: SparkSession, d: String): DataFrame =
    sentinel(Tables.lineitem(s, d)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"))
      .agg(Det.dsum(col("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n_rows")))

  /** Exact interpolated median (continuous percentile). Spark
    * `percentile` and DuckDB `quantile_cont` both sort exactly, so
    * the result is order-independent; ROUND(4) guards the final
    * interpolation arithmetic. */
  private def aggMedian(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        Det.r4(expr("percentile(l_extendedprice, 0.5)")).as("median_price"),
        Det.r4(expr("percentile(l_quantity, 0.25)")).as("q1_qty"),
        Det.r4(expr("percentile(l_quantity, 0.75)")).as("q3_qty"))
      .orderBy("l_returnflag")

  /** Moment statistics computed from exact decimal sums (sum, sum of
    * squares) so the std-dev is order-independent — the built-in
    * streaming stddev differs across engines in low bits. */
  private def aggStats(s: SparkSession, d: String): DataFrame = {
    val x = col("o_totalprice")
    Tables.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n"),
        Det.davg(x, 2).as("mean_price"),
        Det.dsum(x * x, 4).as("sum_sq"),
        Det.dsum(x, 2).as("sum_x"),
        min(x).as("min_price"),
        max(x).as("max_price"))
      .select(
        col("o_orderstatus"), col("n"), Det.r4(col("mean_price")).as("mean_r"),
        Det.r4(sqrt((col("sum_sq") - col("sum_x") * col("sum_x") / col("n"))
          / (col("n") - 1))).as("stddev_r"),
        col("min_price"), col("max_price"))
      .orderBy("o_orderstatus")
  }

  /** Bitwise aggregates — order-independent by construction (AND/OR/
    * XOR are commutative+associative), so partial aggregation is
    * always safe. */
  private def aggBitwise(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .groupBy(col("p_brand"))
      .agg(
        expr("bit_or(p_size)").cast("long").as("size_or"),
        expr("bit_and(p_size)").cast("long").as("size_and"),
        expr("bit_xor(p_size)").cast("long").as("size_xor"),
        count(lit(1)).as("n"))
      .orderBy("p_brand")

  /** Ordered collection aggregate: collect_list is accumulation-order
    * nondeterministic under parallel partials, so a deterministic
    * engine must sort the collected array (or use an order-insensitive
    * digest) before exposing it — serialized to a string here so the
    * oracle compare is scalar. */
  private def aggCollect(s: SparkSession, d: String): DataFrame =
    Tables.nation(s, d)
      .groupBy(col("n_regionkey"))
      .agg(
        array_join(sort_array(collect_list(col("n_name"))), ",").as("nations"),
        count(lit(1)).as("n"))
      .orderBy("n_regionkey")

  /** Discrete percentiles (percentile_disc / quantile_disc): both
    * engines return the smallest element whose cumulative fraction
    * reaches p — an actual data value, so no interpolation arithmetic
    * and no rounding guard needed. */
  private def aggDisc(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY l_extendedprice)").as("p25"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)").as("p50"),
        expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY l_extendedprice)").as("p95"))
      .orderBy("l_returnflag")

  /** Grouping metadata: GROUPING marks per rolled-up key and the
    * combined grouping_id bitmask — how a consumer distinguishes a
    * real NULL key from a rollup subtotal. */
  private def aggGid(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping(col("l_returnflag")).cast("int").as("g_rf"),
        grouping(col("l_linestatus")).cast("int").as("g_ls"),
        grouping_id().cast("int").as("gid"),
        count(lit(1)).as("n_rows"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("g_rf"), col("g_ls"), col("gid"), col("n_rows"))
      .orderBy("rf", "ls")

  /** Conditional aggregation via the SQL FILTER clause — per-branch
    * partial aggregation in one pass (the alternative to pivot or
    * CASE-inside-SUM). */
  private def aggFilter(s: SparkSession, d: String): DataFrame = {
    val vo = Tables.view(s, d, "orders")
    s.sql(
      s"""SELECT o_orderpriority,
        |       COUNT(*) AS n,
        |       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |            FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS sum_open
        |FROM $vo
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
  }

  /** Exact heavy hitters (tokens with count > n/30) via the two-pass
    * Misra–Gries plan: pass 1 reduces the stream to ≤ k=32 candidate
    * tokens with an O(k)-state mergeable sketch (partial+final typed
    * aggregation — the MG guarantee makes the candidate set a proven
    * superset of every token above n/33, hence above n/30); pass 2
    * re-counts ONLY candidate rows behind a broadcast join and
    * filters by the exact threshold. The result is exactly the
    * brute-force answer — the oracle is the plain HAVING query — but
    * no full-vocabulary groupBy ever runs: at 100 TB the unbounded
    * (token → count) shuffle is replaced by an O(k) sketch plus a
    * ≤ k-key aggregation. */
  private def heavyHitters(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val toks = Tables.documents(s, d)
      .select(explode(graft.functions.TextSim.tokens(col("text"))).as("tok"))
    // n_total rides the sketch pass (typed select binds the input
    // deserializer; count shares the same aggregation), so the corpus
    // is scanned exactly twice: sketch+count, then the recount join
    val cands = toks.as[String]
      .select(new graft.functions.MisraGries(32).toColumn,
        count(lit(1)).as[Long])
      .toDF("sketch", "n_total")
      .select(explode(map_keys(col("sketch"))).as("tok"), col("n_total"))
    toks.join(broadcast(cands), "tok")
      .groupBy("tok", "n_total").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > col("n_total") / 30.0)
      .select(col("tok"), col("cnt"), col("n_total"))
      .orderBy("tok")
  }

  override val queries: Map[String, Q] = Map(
    "q_heavy_hitters" -> heavyHitters,
    "q_agg_filter"   -> aggFilter,
    "q_agg_gid"      -> aggGid,
    "q_agg_disc"     -> aggDisc,
    "q_agg_bitwise"  -> aggBitwise,
    "q_agg_collect"  -> aggCollect,
    "q_agg_group"    -> aggGroup,
    "q_agg_distinct" -> aggDistinct,
    "q_agg_approx"   -> aggApprox,
    "q_agg_sketch"   -> aggSketch,
    "q_agg_sketch_exact" -> aggSketchExact,
    "q_agg_rollup"   -> aggRollup,
    "q_agg_cube"     -> aggCube,
    "q_agg_gsets"    -> aggGsets,
    "q_agg_median"   -> aggMedian,
    "q_agg_stats"    -> aggStats,
    "q_histogram"    -> histogram,
    "q_anomaly"      -> anomaly,
  )

  /** Equal-width histogram: 10 bins over [min, max] of o_totalprice.
    * Global bounds are a 1-row aggregate broadcast by the cross join
    * (the BM25-stats pattern); binning is then a narrow map and the
    * shuffle carries 10 rows. */
  private def histogram(s: SparkSession, d: String): DataFrame = {
    val x = col("o_totalprice")
    val bounds = Tables.orders(s, d).agg(min(x).as("lo"), max(x).as("hi"))
    // explicit broadcast: the 1-row bounds must replicate regardless
    // of autoBroadcastJoinThreshold — uniform with every other stats
    // cross join (BM25, tf-idf, prefix sum)
    Tables.orders(s, d).crossJoin(broadcast(bounds))
      .withColumn("bin",
        least(floor((x - col("lo")) / ((col("hi") - col("lo")) / 10)), lit(9.0))
          .cast("int"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        Det.r4(min(x)).as("bin_min"), Det.r4(max(x)).as("bin_max"))
      .orderBy("bin")
  }

  /** Z-score anomaly ranking: per-status moments from DECIMAL-exact
    * sums (mean and variance are then identical IEEE expressions on
    * both engines), broadcast back, top-20 by |z| via
    * TakeOrderedAndProject. The moment table is group-cardinality —
    * the fact table never shuffles. */
  private def anomaly(s: SparkSession, d: String): DataFrame = {
    val x = col("o_totalprice")
    val stats = Tables.orders(s, d)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).cast("double").as("n"),
        (Det.dsum(x, 2) / count(lit(1))).as("mean"),
        Det.dsum(x * x, 4).as("sum_sq"))
      .withColumn("sd",
        sqrt((col("sum_sq") - col("n") * col("mean") * col("mean"))
          / (col("n") - 1)))
      .select(col("o_orderstatus"), col("mean"), col("sd"))
    Tables.orders(s, d)
      .join(broadcast(stats), "o_orderstatus")
      .withColumn("z", (x - col("mean")) / col("sd"))
      .orderBy(abs(col("z")).desc, col("o_orderkey").asc)
      .limit(20)
      .select(col("o_orderkey"), col("o_orderstatus"), x.as("price"),
        Det.r4(col("z")).as("z"))
  }

  private val q1Sql =
    s"""SELECT l_returnflag, l_linestatus,
       |       ${Det.dsumSql("l_quantity", 2)} AS sum_qty,
       |       ${Det.dsumSql("l_extendedprice", 2)} AS sum_base_price,
       |       ${Det.dsumSql("l_extendedprice * (1 - l_discount)", 6)} AS sum_disc_price,
       |       ${Det.dsumSql("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6)} AS sum_charge,
       |       ${Det.davgSql("l_quantity", 2)} AS avg_qty,
       |       ${Det.davgSql("l_extendedprice", 2)} AS avg_price,
       |       COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  private def sentinelSql(groupBody: String): String =
    s"""SELECT COALESCE(l_returnflag, 'ALL') AS rf,
       |       COALESCE(l_linestatus, 'ALL') AS ls,
       |       ${Det.dsumSql("l_quantity", 2)} AS sum_qty,
       |       COUNT(*) AS n_rows
       |FROM lineitem
       |GROUP BY $groupBody
       |ORDER BY rf, ls""".stripMargin

  override val oracles: Map[String, String] = Map(
    "q_heavy_hitters" ->
      """WITH t AS (SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents),
        |n AS (SELECT COUNT(*) AS n_total FROM t)
        |SELECT tok, COUNT(*) AS cnt, n_total
        |FROM t, n
        |GROUP BY tok, n_total
        |HAVING COUNT(*) > n_total / 30.0
        |ORDER BY tok""".stripMargin,
    "q_histogram" ->
      s"""WITH b AS (SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi FROM orders)
         |SELECT CAST(LEAST(FLOOR((o_totalprice - lo) / ((hi - lo) / 10)), 9) AS INT) AS bin,
         |       COUNT(*) AS n,
         |       ${Det.r4Sql("MIN(o_totalprice)")} AS bin_min,
         |       ${Det.r4Sql("MAX(o_totalprice)")} AS bin_max
         |FROM orders, b
         |GROUP BY bin
         |ORDER BY bin""".stripMargin,
    "q_anomaly" ->
      s"""WITH s AS (
         |  SELECT o_orderstatus,
         |         CAST(COUNT(*) AS DOUBLE) AS n,
         |         ${Det.dsumSql("o_totalprice", 2)} / COUNT(*) AS mean,
         |         ${Det.dsumSql("o_totalprice * o_totalprice", 4)} AS sum_sq
         |  FROM orders GROUP BY o_orderstatus),
         |st AS (
         |  SELECT o_orderstatus, mean,
         |         SQRT((sum_sq - n * mean * mean) / (n - 1)) AS sd
         |  FROM s)
         |SELECT o_orderkey, o.o_orderstatus, o_totalprice AS price,
         |       ${Det.r4Sql("(o_totalprice - mean) / sd")} AS z
         |FROM orders o JOIN st ON o.o_orderstatus = st.o_orderstatus
         |ORDER BY ABS((o_totalprice - mean) / sd) DESC, o_orderkey ASC
         |LIMIT 20""".stripMargin,
    "q_agg_filter" ->
      """SELECT o_orderpriority,
        |       COUNT(*) AS n,
        |       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |            FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS sum_open
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q_agg_gid" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
        |       COALESCE(l_linestatus, 'ALL') AS ls,
        |       CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
        |       CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
        |       CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
        |       COUNT(*) AS n_rows
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,
    "q_agg_disc" ->
      """SELECT l_returnflag,
        |       quantile_disc(l_extendedprice, 0.25) AS p25,
        |       quantile_disc(l_extendedprice, 0.5) AS p50,
        |       quantile_disc(l_extendedprice, 0.95) AS p95
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q_agg_bitwise" ->
      """SELECT p_brand,
        |       CAST(BIT_OR(p_size) AS BIGINT) AS size_or,
        |       CAST(BIT_AND(p_size) AS BIGINT) AS size_and,
        |       CAST(BIT_XOR(p_size) AS BIGINT) AS size_xor,
        |       COUNT(*) AS n
        |FROM part
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,
    "q_agg_collect" ->
      """SELECT n_regionkey,
        |       STRING_AGG(n_name, ',' ORDER BY n_name) AS nations,
        |       COUNT(*) AS n
        |FROM nation
        |GROUP BY n_regionkey
        |ORDER BY n_regionkey""".stripMargin,
    "q_agg_group" -> q1Sql,
    // the exact column is genuinely differential; the TRUE verdicts
    // hold only while Spark's sketches stay inside their bounds
    "q_agg_approx" ->
      """SELECT l_returnflag,
        |       COUNT(DISTINCT l_partkey) AS n_parts,
        |       TRUE AS hll_ok,
        |       TRUE AS median_ok
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q_agg_distinct" ->
      """SELECT l_returnflag,
        |       COUNT(DISTINCT l_partkey) AS n_parts,
        |       COUNT(DISTINCT l_suppkey) AS n_supps,
        |       COUNT(*) AS n_rows
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    // exact BY CONSTRUCTION, not approximately: lgK=14 keeps every
    // group's coupon set below the HLL-mode threshold (see
    // aggSketchExact doc), so the rounded estimate IS the distinct
    // count and the full hash oracle applies to the sketch path
    "q_agg_sketch_exact" ->
      """SELECT l_returnflag,
        |       COUNT(DISTINCT l_suppkey) AS n_supp
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q_agg_median" ->
      s"""SELECT l_returnflag,
        |       ${Det.r4Sql("quantile_cont(l_extendedprice, 0.5)")} AS median_price,
        |       ${Det.r4Sql("quantile_cont(l_quantity, 0.25)")} AS q1_qty,
        |       ${Det.r4Sql("quantile_cont(l_quantity, 0.75)")} AS q3_qty
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q_agg_stats" ->
      s"""SELECT o_orderstatus, COUNT(*) AS n,
         |       ${Det.r4Sql(Det.davgSql("o_totalprice", 2))} AS mean_r,
         |       ${Det.r4Sql(s"""SQRT((${Det.dsumSql("o_totalprice * o_totalprice", 4)}
         |                   - ${Det.dsumSql("o_totalprice", 2)} * ${Det.dsumSql("o_totalprice", 2)} / COUNT(*))
         |                  / (COUNT(*) - 1))""")} AS stddev_r,
         |       MIN(o_totalprice) AS min_price,
         |       MAX(o_totalprice) AS max_price
         |FROM orders
         |GROUP BY o_orderstatus
         |ORDER BY o_orderstatus""".stripMargin,
    "q_agg_rollup" -> sentinelSql("ROLLUP (l_returnflag, l_linestatus)"),
    "q_agg_cube"   -> sentinelSql("CUBE (l_returnflag, l_linestatus)"),
    "q_agg_gsets"  -> sentinelSql("GROUPING SETS ((l_returnflag), (l_linestatus), ())"),
  )
}
