package graft.ops

import graft.{QueryPack, Tables}
import graft.functions.{CosineSimilarity, WeightedAvg}
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Custom-function surface: the typed Aggregator UDAF and the native
  * codegen Expression, each exercised through a query.
  */
object Custom extends QueryPack {

  /** Weighted average via Aggregator UDAF (partial+final merge like a
    * built-in). Oracle: SUM(x*w)/SUM(w). The quotient normalizes the
    * FP summation-order noise to ~1e-10 relative, far inside the
    * ROUND(4) guard band. */
  private def udafWavg(s: SparkSession, d: String): DataFrame = {
    val wavg = udaf(new WeightedAvg(),
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble))
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(graft.Det.r4(wavg(col("l_extendedprice"), col("l_quantity"))).as("wavg_price"))
      .orderBy("l_returnflag")
  }

  /** q_sim_search twin through the native CosineSimilarity expression
    * (single fused codegen loop) — same oracle as the HOF version,
    * proving bit-identical semantics. */
  private def simSearchNative(s: SparkSession, d: String): DataFrame = {
    val probe = Tables.embeddings(s, d).filter(col("vec_id") === 0)
      .select(col("embedding").as("probe"))
    Tables.embeddings(s, d)
      .filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(probe))
      .select(col("vec_id"), col("label"),
        graft.Det.r4(CosineSimilarity.cosine_sim(col("embedding"), col("probe"))).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(10)
  }

  /** q_topk's semantics through the bounded-heap TopK Aggregator:
    * partial buffers of k rows -> shuffle carries k rows per
    * group×partition, not the whole table. Shares q_topk's oracle —
    * two physical strategies, one verified result. */
  private def topkAgg(s: SparkSession, d: String): DataFrame = {
    val topk = udaf(new graft.functions.TopKByPrice(3),
      Encoders.product[graft.functions.LineRef])
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(topk(col("l_extendedprice"), col("l_orderkey"),
        col("l_linenumber")).as("top"))
      .select(col("l_returnflag"), col("l_linestatus"),
        posexplode(col("top")).as(Seq("pos", "r")))
      .select(col("l_returnflag"), col("l_linestatus"),
        (col("pos") + 1).cast("int").as("rk"),
        col("r.okey").as("l_orderkey"), col("r.lineno").as("l_linenumber"),
        col("r.price").as("l_extendedprice"))
      .orderBy("l_returnflag", "l_linestatus", "rk")
  }

  /** The extension-registered SQL surface: the native Expressions
    * resolved by NAME inside a SQL string (GraftExtensions
    * injectFunction) — cosine against a probe vector plus Jaccard
    * against a seed token set, through the same Catalyst pipeline as
    * the DSL twins. */
  private def sqlFuncs(s: SparkSession, d: String): DataFrame = {
    val vd = Tables.view(s, d, "documents")
    val ve = Tables.view(s, d, "embeddings")
    s.sql(
      s"""SELECT d.doc_id,
         |       ${graft.Det.r4Sql("cosine_sim(e.embedding, p.probe)")} AS cos_probe,
         |       ${graft.Det.r4Sql(
               "jaccard_coeff(array_distinct(split(d.text, ' ')), array('data','spark','query'))")} AS j_seed
         |FROM $vd d
         |JOIN $ve e ON d.doc_id = e.vec_id
         |CROSS JOIN (SELECT embedding AS probe FROM $ve WHERE vec_id = 0) p
         |WHERE d.doc_id <> 0
         |ORDER BY d.doc_id""".stripMargin)
  }

  /** The per-priority orders rollup used for the MV demonstration —
    * built twice below: once to register/materialize, once as "the
    * user's query" that the optimizer must transparently redirect. */
  private[ops] def mvShape(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority").as("pri"))
      .agg(count(lit(1)).as("n"), graft.Det.dsum(col("o_totalprice"), 2).as("total"))

  /** Materialized-view rewrite end-to-end: register the rollup as an
    * MV (parquet materialization + optimized-plan fingerprint), then
    * run a FRESH construction of the same aggregate — the
    * [[graft.plans.RewriteToMaterializedView]] rule swaps its
    * Aggregate for the MV scan (plan-guarded in ExtensionsSpec), and
    * the oracle hash proves the redirected answer is the recomputed
    * one. Re-registration writes a FRESH immutable `path-<uuid>` dir
    * and queues the superseded one for grace-period reclamation in
    * MaterializedViews — repeated runs (bench iterations) do not
    * accumulate view-sized tmp dirs. */
  private def mvRewrite(s: SparkSession, d: String): DataFrame = {
    val path = s"${sys.props("java.io.tmpdir")}/graft_mv_" +
      d.replaceAll("[^A-Za-z0-9]", "_") + "_" + ProcessHandle.current().pid()
    graft.plans.MaterializedViews.register(mvShape(s, d), path)
    mvShape(s, d).orderBy("pri")
  }

  /** Containment rewrite end-to-end (oracle-gated, not just
    * spec-guarded): register a WIDER view — grouped by (priority,
    * status) with count/min/max — then run a key-FILTERED ROLLUP
    * grouped by priority alone. Exact-match cannot answer it; only
    * the containment shapes (filter-above-view composed with
    * rollup-above-view) can, and the `require` makes the key fail
    * loudly if the rewrite ever stops firing, so the driver's DuckDB
    * hash (the unrewritten recompute) gates both the firing AND the
    * re-aggregated values. Aggregates are count/min/max only —
    * order-independent, so rolling the view's partials up is
    * bit-identical to aggregating base rows. */
  private def mvContained(s: SparkSession, d: String): DataFrame = {
    val path = s"${sys.props("java.io.tmpdir")}/graft_mvc_" +
      d.replaceAll("[^A-Za-z0-9]", "_") + "_" + ProcessHandle.current().pid()
    val wide = Tables.orders(s, d)
      .groupBy(col("o_orderpriority").as("pri"), col("o_orderstatus").as("st"))
      .agg(count(lit(1)).as("n"), min(col("o_totalprice")).as("lo"),
        max(col("o_totalprice")).as("hi"))
    val fp = graft.plans.MaterializedViews.register(wide, path)
    val q = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT" ||
        col("o_orderpriority") === "2-HIGH")
      .groupBy(col("o_orderpriority").as("pri"))
      .agg(count(lit(1)).as("n"), min(col("o_totalprice")).as("lo"),
        max(col("o_totalprice")).as("hi"))
      .orderBy("pri")
    // force the physical plan NOW (QueryExecution caches it — later
    // actions on this DataFrame reuse the rewritten plan), then drop
    // the registration so it cannot leak into unrelated queries over
    // the same orders base
    try require(q.queryExecution.executedPlan.toString.contains("graft_mvc_"),
      "containment rewrite did not fire: the filtered rollup still scans orders")
    finally graft.plans.MaterializedViews.deregister(fp)
    q
  }

  /** JOIN containment end-to-end (oracle-gated): register the classic
    * production MV — orders⋈customer grouped by (mktsegment, priority)
    * — then run the same join FILTERED to one segment and rolled up to
    * priority alone. Only the join-containment path can answer it
    * (different pruning, pushed filters, coarser keys); the `require`
    * fails loudly if the rewrite stops firing, and the DuckDB hash
    * gates the re-aggregated values. Aggregates are count + min/max +
    * an exact integral sum — all order-independent, so the rollup is
    * bit-identical to aggregating base rows. */
  /** STAR-JOIN containment (N-ary): the registered view aggregates a
    * 3-way inner equi-join — fact (orders) ⋈ customer ⋈ nation, the
    * production star shape — and the query, the SAME flattened join
    * filtered on two view group keys and rolled up coarser, is
    * answered from the view at O(view) instead of re-joining the
    * fact. The matcher flattens the inner-join tree and canonicalizes
    * the base order by leaf-identity render, so optimizer join
    * REORDERING between registration and query cannot break the
    * ordinal space (plans/MaterializedViews.decomposeJoinAgg); the
    * in-query require proves the rewrite fired. */
  private def mvContainedStar(s: SparkSession, d: String): DataFrame = {
    val path = s"${sys.props("java.io.tmpdir")}/graft_mvcs_" +
      d.replaceAll("[^A-Za-z0-9]", "_") + "_" + ProcessHandle.current().pid()
    def joined = Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
    val wide = joined
      .groupBy(col("n_name").as("nat"), col("c_mktsegment").as("seg"),
        col("o_orderpriority").as("pri"))
      .agg(count(lit(1)).as("n"), min(col("o_totalprice")).as("lo"),
        max(col("o_totalprice")).as("hi"), sum(col("o_custkey")).as("sum_cust"))
    val fp = graft.plans.MaterializedViews.register(wide, path)
    val q = joined
      .filter(col("n_name") === "NATION_12" && col("c_mktsegment") === "HOUSEHOLD")
      .groupBy(col("o_orderpriority").as("pri"))
      .agg(count(lit(1)).as("n"), min(col("o_totalprice")).as("lo"),
        max(col("o_totalprice")).as("hi"), sum(col("o_custkey")).as("sum_cust"))
      .orderBy("pri")
    try require(q.queryExecution.executedPlan.toString.contains("graft_mvcs_"),
      "star containment rewrite did not fire: the filtered rollup still joins base tables")
    finally graft.plans.MaterializedViews.deregister(fp)
    q
  }

  /** HAVING above a containment rollup: the aggregate-filter sits
    * ABOVE the rewritten Aggregate, so the rule answers the rollup
    * from the wider view and Catalyst evaluates the HAVING over the
    * re-aggregated outputs — the remaining composition of the
    * warehouse idiom (WHERE on group keys + coarser GROUP BY +
    * HAVING on aggregates) now all served from one registered view.
    * The in-query require proves the rewrite fired under the
    * filter. */
  private def mvContainedHaving(s: SparkSession, d: String): DataFrame = {
    val path = s"${sys.props("java.io.tmpdir")}/graft_mvch_" +
      d.replaceAll("[^A-Za-z0-9]", "_") + "_" + ProcessHandle.current().pid()
    val wide = Tables.orders(s, d)
      .groupBy(col("o_orderpriority").as("pri"), col("o_orderstatus").as("st"))
      .agg(count(lit(1)).as("n"), min(col("o_totalprice")).as("lo"),
        max(col("o_totalprice")).as("hi"))
    val fp = graft.plans.MaterializedViews.register(wide, path)
    val q = Tables.orders(s, d)
      .groupBy(col("o_orderpriority").as("pri"))
      .agg(count(lit(1)).as("n"), min(col("o_totalprice")).as("lo"),
        max(col("o_totalprice")).as("hi"))
      .filter(col("n") > 100L && col("hi") < 600000.0)
      .orderBy("pri")
    try require(q.queryExecution.executedPlan.toString.contains("graft_mvch_"),
      "HAVING containment did not fire: the rollup under the filter still scans orders")
    finally graft.plans.MaterializedViews.deregister(fp)
    q
  }

  private def mvContainedJoin(s: SparkSession, d: String): DataFrame = {
    val path = s"${sys.props("java.io.tmpdir")}/graft_mvcj_" +
      d.replaceAll("[^A-Za-z0-9]", "_") + "_" + ProcessHandle.current().pid()
    def joined = Tables.orders(s, d).join(Tables.customer(s, d),
      col("o_custkey") === col("c_custkey"))
    val wide = joined
      .groupBy(col("c_mktsegment").as("seg"), col("o_orderpriority").as("pri"))
      .agg(count(lit(1)).as("n"), min(col("o_totalprice")).as("lo"),
        max(col("o_totalprice")).as("hi"), sum(col("o_custkey")).as("sum_cust"))
    val fp = graft.plans.MaterializedViews.register(wide, path)
    val q = joined
      .filter(col("c_mktsegment") === "BUILDING")
      .groupBy(col("o_orderpriority").as("pri"))
      .agg(count(lit(1)).as("n"), min(col("o_totalprice")).as("lo"),
        max(col("o_totalprice")).as("hi"), sum(col("o_custkey")).as("sum_cust"))
      .orderBy("pri")
    try require(q.queryExecution.executedPlan.toString.contains("graft_mvcj_"),
      "join containment rewrite did not fire: the filtered rollup still joins base tables")
    finally graft.plans.MaterializedViews.deregister(fp)
    q
  }

  /** AVG rollup in containment (oracle-gated): the view stores
    * SUM(o_custkey) + COUNT(o_custkey) partials per (priority, status);
    * the query asks AVG(o_custkey) per priority — decomposed into
    * SUM(sums)/SUM(counts) in double, exactly Average's own arithmetic
    * (and exact here: integral sums < 2^53). The `require` proves the
    * rewrite fired; the DuckDB hash proves the decomposition. */
  private def mvContainedAvg(s: SparkSession, d: String): DataFrame = {
    val path = s"${sys.props("java.io.tmpdir")}/graft_mvca_" +
      d.replaceAll("[^A-Za-z0-9]", "_") + "_" + ProcessHandle.current().pid()
    val wide = Tables.orders(s, d)
      .groupBy(col("o_orderpriority").as("pri"), col("o_orderstatus").as("st"))
      .agg(sum(col("o_custkey")).as("s"), count(col("o_custkey")).as("c"),
        count(lit(1)).as("n"))
    val fp = graft.plans.MaterializedViews.register(wide, path)
    val q = Tables.orders(s, d)
      .groupBy(col("o_orderpriority").as("pri"))
      .agg(avg(col("o_custkey")).as("avg_cust"), count(lit(1)).as("n"))
      .orderBy("pri")
    try require(q.queryExecution.executedPlan.toString.contains("graft_mvca_"),
      "AVG containment rewrite did not fire: the rollup still scans orders")
    finally graft.plans.MaterializedViews.deregister(fp)
    q
  }

  /** GROUPING-EXPRESSION containment (the calendar-hierarchy rollup,
    * oracle-gated): the view is grouped by DAY (the bare
    * `o_orderdate` key); the query groups by
    * `date_trunc('month', o_orderdate)` — an expression the view
    * never stored. The matcher accepts any DETERMINISTIC expression
    * whose base columns are bare view group keys, remaps it over the
    * view's key column, and re-aggregates: grouping by f(day) merely
    * COARSENS the view's partition, so COUNT/SUM/MIN/MAX roll up
    * exactly (plans/MaterializedViews.attempt, KeyExpr). The most
    * common warehouse MV ask after join shapes — day-grained views
    * answering month/quarter/year queries. The `require` proves the
    * rewrite fired; the DuckDB hash gates the remapped arithmetic. */
  private def mvContainedExpr(s: SparkSession, d: String): DataFrame = {
    val path = s"${sys.props("java.io.tmpdir")}/graft_mvce_" +
      d.replaceAll("[^A-Za-z0-9]", "_") + "_" + ProcessHandle.current().pid()
    val wide = Tables.orders(s, d)
      .groupBy(col("o_orderdate").as("day"))
      .agg(count(lit(1)).as("n"), sum(col("o_custkey")).as("sum_cust"),
        min(col("o_totalprice")).as("lo"), max(col("o_totalprice")).as("hi"))
    val fp = graft.plans.MaterializedViews.register(wide, path)
    val q = Tables.orders(s, d)
      .groupBy(date_trunc("month", col("o_orderdate")).as("mon"))
      .agg(count(lit(1)).as("n"), sum(col("o_custkey")).as("sum_cust"),
        min(col("o_totalprice")).as("lo"), max(col("o_totalprice")).as("hi"))
      .orderBy("mon")
    try require(q.queryExecution.executedPlan.toString.contains("graft_mvce_"),
      "grouping-expression containment did not fire: the month rollup still scans orders")
    finally graft.plans.MaterializedViews.deregister(fp)
    q
  }

  /** Grouping-expression containment on the JOIN path (oracle-gated):
    * the view aggregates orders⋈customer by (day, segment); the query
    * — same join, filtered to one segment, grouped by
    * `date_trunc('month', day)` — composes all three containment
    * moves at once: join-shape match, key-filter commute, and the
    * calendar rollup's expression remap (r14,
    * plans/MaterializedViews.attemptJoin KeyExpr). */
  private def mvContainedJoinExpr(s: SparkSession, d: String): DataFrame = {
    val path = s"${sys.props("java.io.tmpdir")}/graft_mvcje_" +
      d.replaceAll("[^A-Za-z0-9]", "_") + "_" + ProcessHandle.current().pid()
    def joined = Tables.orders(s, d).join(Tables.customer(s, d),
      col("o_custkey") === col("c_custkey"))
    val wide = joined
      .groupBy(col("o_orderdate").as("day"), col("c_mktsegment").as("seg"))
      .agg(count(lit(1)).as("n"), sum(col("o_custkey")).as("sum_cust"))
    val fp = graft.plans.MaterializedViews.register(wide, path)
    val q = joined
      .filter(col("c_mktsegment") === "BUILDING")
      .groupBy(date_trunc("month", col("o_orderdate")).as("mon"))
      .agg(count(lit(1)).as("n"), sum(col("o_custkey")).as("sum_cust"))
      .orderBy("mon")
    try require(q.queryExecution.executedPlan.toString.contains("graft_mvcje_"),
      "join grouping-expression containment did not fire: the month rollup still joins base tables")
    finally graft.plans.MaterializedViews.deregister(fp)
    q
  }

  override val queries: Map[String, Q] = Map(
    "q_udaf_wavg"        -> udafWavg,
    "q_sim_search_native" -> simSearchNative,
    "q_topk_agg"         -> topkAgg,
    "q_sql_funcs"        -> sqlFuncs,
    "q_mv_rewrite"       -> mvRewrite,
    "q_mv_contained"     -> mvContained,
    "q_mv_contained_join" -> mvContainedJoin,
    "q_mv_contained_star" -> mvContainedStar,
    "q_mv_contained_having" -> mvContainedHaving,
    "q_mv_contained_avg" -> mvContainedAvg,
    "q_mv_contained_expr" -> mvContainedExpr,
    "q_mv_contained_join_expr" -> mvContainedJoinExpr,
  )

  override val oracles: Map[String, String] = Map(
    "q_mv_rewrite" ->
      s"""SELECT o_orderpriority AS pri, COUNT(*) AS n,
         |       ${graft.Det.dsumSql("o_totalprice", 2)} AS total
         |FROM orders GROUP BY pri ORDER BY pri""".stripMargin,
    "q_mv_contained" ->
      """SELECT o_orderpriority AS pri, COUNT(*) AS n,
        |       MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
        |FROM orders
        |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        |GROUP BY pri ORDER BY pri""".stripMargin,
    "q_mv_contained_join" ->
      """SELECT o_orderpriority AS pri, COUNT(*) AS n,
        |       MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
        |       CAST(SUM(o_custkey) AS BIGINT) AS sum_cust
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY pri ORDER BY pri""".stripMargin,
    "q_mv_contained_having" ->
      """SELECT o_orderpriority AS pri, COUNT(*) AS n,
        |       MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
        |FROM orders
        |GROUP BY pri
        |HAVING COUNT(*) > 100 AND MAX(o_totalprice) < 600000.0
        |ORDER BY pri""".stripMargin,
    "q_mv_contained_star" ->
      """SELECT o_orderpriority AS pri, COUNT(*) AS n,
        |       MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
        |       CAST(SUM(o_custkey) AS BIGINT) AS sum_cust
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE n_name = 'NATION_12' AND c_mktsegment = 'HOUSEHOLD'
        |GROUP BY pri ORDER BY pri""".stripMargin,
    "q_mv_contained_avg" ->
      """SELECT o_orderpriority AS pri, AVG(o_custkey) AS avg_cust,
        |       COUNT(*) AS n
        |FROM orders GROUP BY pri ORDER BY pri""".stripMargin,
    "q_mv_contained_expr" ->
      """SELECT date_trunc('month', o_orderdate) AS mon, COUNT(*) AS n,
        |       CAST(SUM(o_custkey) AS BIGINT) AS sum_cust,
        |       MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
        |FROM orders GROUP BY mon ORDER BY mon""".stripMargin,
    "q_mv_contained_join_expr" ->
      """SELECT date_trunc('month', o_orderdate) AS mon, COUNT(*) AS n,
        |       CAST(SUM(o_custkey) AS BIGINT) AS sum_cust
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY mon ORDER BY mon""".stripMargin,
    "q_udaf_wavg" ->
      s"""SELECT l_returnflag,
        |       ${graft.Det.r4Sql("SUM(l_extendedprice * l_quantity) / SUM(l_quantity)")} AS wavg_price
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q_sim_search_native" -> Similarity.oracles("q_sim_search"),
    "q_topk_agg"          -> Core.oracles("q_topk"),
    "q_sql_funcs" ->
      """WITH p AS (SELECT embedding AS probe FROM embeddings WHERE vec_id = 0),
        |     t AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
        |           FROM documents)
        |SELECT d.doc_id,
        |       FLOOR((
        |         list_sum(list_transform(list_zip(e.embedding, p.probe),
        |                  z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
        |         / (SQRT(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |            * SQRT(list_sum(list_transform(p.probe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
        |       ) * 10000 + 0.5) / 10000 AS cos_probe,
        |       FLOOR((CAST(LEN(list_intersect(t.toks, ['data','spark','query'])) AS DOUBLE)
        |              / LEN(list_distinct(list_concat(t.toks, ['data','spark','query'])))) * 10000 + 0.5) / 10000 AS j_seed
        |FROM documents d
        |JOIN t ON d.doc_id = t.doc_id
        |JOIN embeddings e ON d.doc_id = e.vec_id
        |CROSS JOIN p
        |WHERE d.doc_id <> 0
        |ORDER BY d.doc_id""".stripMargin,
  )
}
