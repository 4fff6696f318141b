package graft.ops

import graft.{Det, QueryPack, Tables}
import graft.functions.TextSim.cosine
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-analytics + retrieval-fusion operators a warehouse user
  * expects on top of the relational core:
  *
  *  - q_funnel: ordered conversion funnel (view → click → purchase)
  *    via conditional-min stage timestamps — one shuffle on user_id,
  *    map-side partial mins, then a single global roll-up row.
  *  - q_scd2: slowly-changing-dimension (type 2) reconstruction of a
  *    change log — collapse consecutive equal states per key, emit
  *    [valid_from, valid_to) intervals. Pure windows over the key
  *    partition; nothing corpus-global.
  *  - q_profile: per-column data profiling (nulls / distincts /
  *    numeric range) in ONE pass over the table — the shape behind
  *    ANALYZE TABLE. The multi-countDistinct plans as a single
  *    Expand+agg; at 100 TB swap countDistinct for
  *    approx_count_distinct and the plan is otherwise unchanged.
  *  - q_hybrid_rrf: hybrid retrieval — BM25 keyword ranking fused
  *    with embedding-cosine ranking by reciprocal-rank fusion
  *    (k=60, Cormack et al. SIGIR'09). Ranks are computed on the
  *    4-decimal-rounded scores (identical on both engines), so the
  *    fusion is exactly reproducible; the fused score 1/(60+r) is
  *    pure integer-reciprocal arithmetic, deterministic by
  *    construction.
  */
object Analytics extends QueryPack {

  // ---- funnel ----------------------------------------------------

  private def funnel(s: SparkSession, d: String): DataFrame = {
    val stages = Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "view", col("ts"))).as("t_view"),
        min(when(col("event_type") === "click", col("ts"))).as("t_click"),
        min(when(col("event_type") === "purchase", col("ts"))).as("t_buy"))
    stages.agg(
      count(lit(1)).as("n_users"),
      count(col("t_view")).as("n_view"),
      count(when(col("t_click") > col("t_view"), lit(1))).as("n_click_after_view"),
      count(when(col("t_buy") > col("t_click") && col("t_click") > col("t_view"),
        lit(1))).as("n_full_funnel"))
  }

  // ---- SCD type 2 ------------------------------------------------

  private def scd2(s: SparkSession, d: String): DataFrame = {
    val byTime = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val changes = Tables.events(s, d)
      .withColumn("prev_state", lag(col("event_type"), 1).over(byTime))
      .filter(col("prev_state").isNull || col("prev_state") =!= col("event_type"))
    changes
      .withColumn("valid_to", lead(col("ts"), 1).over(byTime))
      .select(col("user_id"), col("event_id"), col("event_type").as("state"),
        col("ts").as("valid_from"), col("valid_to"))
      .orderBy("user_id", "event_id")
  }

  // ---- column profiling ------------------------------------------

  /** (column, is-numeric) inventory of the profiled table. */
  private val ProfileCols: Seq[(String, Boolean)] = Seq(
    "o_orderkey" -> true, "o_custkey" -> true, "o_orderstatus" -> false,
    "o_totalprice" -> true, "o_orderdate" -> false, "o_orderpriority" -> false)

  private def profile(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    // one wide aggregation row: 1 job; the countDistincts share a
    // single Expand. Numeric min/max cast to double so every column's
    // profile row has one schema.
    val aggs = count(lit(1)).as("n_rows") +: ProfileCols.flatMap { case (c, num) =>
      Seq(count(col(c)).as(s"cnt_$c"), countDistinct(col(c)).as(s"nd_$c")) ++
        (if (num) Seq(min(col(c)).cast("double").as(s"min_$c"),
          max(col(c)).cast("double").as(s"max_$c"))
        else Nil)
    }
    val wide = o.agg(aggs.head, aggs.tail: _*)
    // unpivot the single row to long format (narrow, driver-free)
    val rows = ProfileCols.map { case (c, num) =>
      struct(
        lit(c).as("col"),
        (col("n_rows") - col(s"cnt_$c")).as("n_nulls"),
        col(s"nd_$c").as("n_distinct"),
        (if (num) col(s"min_$c") else lit(null).cast("double")).as("min_val"),
        (if (num) col(s"max_$c") else lit(null).cast("double")).as("max_val"))
    }
    wide.select(explode(array(rows: _*)).as("p"))
      .select(col("p.col"), col("p.n_nulls"), col("p.n_distinct"),
        col("p.min_val"), col("p.max_val"))
      .orderBy("col")
  }

  // ---- snapshot diff (CDC derivation) ----------------------------

  /** Change-data-capture DERIVATION between two table snapshots: a
    * keyed full-outer comparison classifying every key as insert /
    * delete / update / unchanged, with decimal-exact value-delta
    * totals per class. The "new" snapshot is synthesized in-query
    * from orders by deterministic key arithmetic (drop every 97th
    * key, reprice every 101st, append shifted copies of every 103rd),
    * so the query is self-contained and the oracle reproduces the
    * same construction. The reprice is ADDITIVE (+1234.56), keeping
    * every delta exact at 2 decimals — a multiplicative reprice
    * (×1.1) put thousands of deltas on the half-cent rounding
    * boundary where Spark's HALF_UP decimal cast and DuckDB's can
    * split (observed at sf0.1). Scale shape: ONE shuffle of each side on the
    * key (the join), classification is a narrow projection; at
    * 100 TB both snapshots would be bucketed on the key and the join
    * co-located (see q_join_bucketed). */
  private def oldSnap(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey").as("k"), col("o_orderpriority").as("pri"),
        col("o_totalprice").as("v"))

  private def newSnap(s: SparkSession, d: String): DataFrame = {
    val maxK = lit(6000000L) // > any o_orderkey at every test SF
    Tables.orders(s, d)
      .filter(col("o_orderkey") % 97 =!= 0)
      .select(col("o_orderkey").as("k"), col("o_orderpriority").as("pri"),
        when(col("o_orderkey") % 101 === 0, col("o_totalprice") + 1234.56)
          .otherwise(col("o_totalprice")).as("v"))
      .unionAll(
        Tables.orders(s, d).filter(col("o_orderkey") % 103 === 0)
          .select((col("o_orderkey") + maxK).as("k"),
            col("o_orderpriority").as("pri"), col("o_totalprice").as("v")))
  }

  private def snapshotDiff(s: SparkSession, d: String): DataFrame = {
    val old = oldSnap(s, d).drop("pri")
    val newS = newSnap(s, d).drop("pri")
    old.as("o").join(newS.as("n"), col("o.k") === col("n.k"), "full_outer")
      .select(
        when(col("o.k").isNull, "insert")
          .when(col("n.k").isNull, "delete")
          .when(col("o.v") =!= col("n.v"), "update")
          .otherwise("unchanged").as("change"),
        coalesce(col("n.v"), lit(0.0)).as("nv"),
        coalesce(col("o.v"), lit(0.0)).as("ov"))
      .groupBy("change")
      .agg(count(lit(1)).as("n_keys"),
        Det.dsum(col("nv") - col("ov"), 2).as("delta_value"))
      .orderBy("change")
  }

  // ---- MERGE upsert (row-level CDC apply) ---------------------------

  /** Row-level CDC apply — derive the delta between two snapshots,
    * then APPLY it back to the old table (matched-update /
    * not-matched-insert / delete-when-source-gone) and emit the full
    * merged table. Complements Advanced's q_merge_upsert (which
    * proves MERGE's per-action accounting + checksum): here the
    * oracle is the NEW snapshot itself, so the hash match proves
    * apply(old, diff(old → new)) ≡ new ROW-FOR-ROW — the row-level
    * companion of q_ivm's aggregate-level maintenance proof.
    *
    * Scale shape: two keyed joins (derive + apply), each shuffling on
    * the same snapshot key the pipeline would bucket by at 100 TB
    * (q_join_bucketed's layout turns both into co-located merges);
    * classification and application are narrow projections. */
  private def cdcApply(s: SparkSession, d: String): DataFrame = {
    val old = oldSnap(s, d).drop("pri")
    val newS = newSnap(s, d).drop("pri")
    val delta = old.as("o").join(newS.as("n"), col("o.k") === col("n.k"), "full_outer")
      .filter(col("o.k").isNull || col("n.k").isNull || col("o.v") =!= col("n.v"))
      .select(coalesce(col("n.k"), col("o.k")).as("k"),
        when(col("n.k").isNull, "D").when(col("o.k").isNull, "I")
          .otherwise("U").as("op"),
        col("n.v").as("nv"))
    old.as("t").join(delta.as("dl"), col("t.k") === col("dl.k"), "full_outer")
      .filter(col("dl.op").isNull || col("dl.op") =!= "D")
      .select(coalesce(col("dl.k"), col("t.k")).as("k"),
        when(col("dl.op").isNotNull, col("dl.nv")).otherwise(col("t.v")).as("v"))
      .orderBy("k")
  }

  // ---- incremental view maintenance ------------------------------

  /** Incremental maintenance of a grouped aggregate under the CDC
    * delta: the maintained view (base aggregate ⊕ per-group delta
    * contributions) must EQUAL a full recompute over the new snapshot
    * — which is exactly what the oracle computes, so the hash match
    * IS the IVM correctness proof. Sums stay in DECIMAL until the
    * final projection (exact ⊕ needs exact addends, not the rounded
    * double); counts are ±1 per changed key. Scale shape: the base
    * view is group-cardinality, the delta aggregate shuffles only
    * CHANGED keys — maintenance cost tracks the delta, not the table,
    * which is the entire point of IVM at 100 TB. */
  private def ivm(s: SparkSession, d: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val base = oldSnap(s, d)
      .groupBy(col("pri"))
      .agg(count(lit(1)).as("n0"), sum(col("v").cast(dec)).as("v0"))
    // per-key delta rows: only keys present in exactly one side or
    // with changed values contribute
    val delta = oldSnap(s, d).as("o")
      .join(newSnap(s, d).as("n"), col("o.k") === col("n.k"), "full_outer")
      .select(
        coalesce(col("n.pri"), col("o.pri")).as("pri"),
        (when(col("n.k").isNotNull, lit(1)).otherwise(lit(0)) -
          when(col("o.k").isNotNull, lit(1)).otherwise(lit(0))).as("dn"),
        (coalesce(col("n.v").cast(dec), lit(0).cast(dec)) -
          coalesce(col("o.v").cast(dec), lit(0).cast(dec))).as("dv"))
      .filter(col("dn") =!= 0 || col("dv") =!= 0)
      .groupBy(col("pri"))
      .agg(sum(col("dn")).as("dn"), sum(col("dv")).as("dv"))
    base.join(delta, Seq("pri"), "full_outer")
      .select(col("pri"),
        (coalesce(col("n0"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
        (coalesce(col("v0"), lit(0).cast(dec)) +
          coalesce(col("dv"), lit(0).cast(dec))).cast("double").as("total"))
      .orderBy("pri")
  }

  // ---- winsorization ---------------------------------------------

  /** Per-group winsorization (outlier clipping to the [p05, p95]
    * band) — the standard robust-statistics prep step before training
    * on heavy-tailed numeric features. The percentile table is built
    * WITHOUT percentile_disc's per-group value buffering (the old
    * plan held every value of a group in one aggregation buffer — at
    * 100 TB a returnflag group is billions of doubles in one task):
    * instead we aggregate per-VALUE counts (mergeable hash agg, no
    * buffering), run [[Dist.prefixSumKeyed]] to get each distinct
    * value's cumulative count without ever windowing a whole group in
    * one task, and select the value at rank ceil(p·n) — exactly
    * percentile_disc's SQL-standard semantics (first value whose
    * cume_dist ≥ p), with the rank computed in exact decimal
    * arithmetic so p·n never suffers an FP boundary. The same
    * machinery q_spearman uses for exact ranks. The resulting bounds
    * table is group-cardinality-sized and broadcast back onto the
    * fact scan for a map-side clip, never a shuffle on data. */
  private def winsorize(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_extendedprice"))
    // lazy localCheckpoint (r16): the per-value table has three
    // consumers split across broadcast-subquery jobs (cum, totals,
    // final roll-up) — ReuseExchange cannot collapse subtrees that
    // execute in separate jobs, so the scan+aggregate ran per
    // consumer; the checkpoint computes the value-domain-sized table
    // once (same fix as q_mad, measured there)
    val counts = li.groupBy(col("l_returnflag"), col("l_extendedprice"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(eager = false)
    val cum = Dist.prefixSumKeyed(counts, Seq("l_returnflag"),
      "l_extendedprice", "cnt", "cum")
    val totals = counts.groupBy(col("l_returnflag"))
      .agg(sum(col("cnt")).as("n_tot"))
    val pLo = lit(new java.math.BigDecimal("0.05"))
    val pHi = lit(new java.math.BigDecimal("0.95"))
    val bounds = cum.join(broadcast(totals), "l_returnflag")
      .groupBy(col("l_returnflag"))
      .agg(
        min(when(col("cum") >= greatest(ceil(col("n_tot") * pLo), lit(1)),
          col("l_extendedprice"))).as("lo"),
        min(when(col("cum") >= greatest(ceil(col("n_tot") * pHi), lit(1)),
          col("l_extendedprice"))).as("hi"))
    // final roll-up rides the per-value COUNT table with multiplicity
    // cnt, not a second fact scan: Σ cast(v)·cnt is the same exact
    // decimal value as the row-wise Det.dsum (per-value cast is exact,
    // cnt is integral), and ReuseExchange collapses this subtree with
    // the percentile build's — ONE scan of lineitem total
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val w = when(col("l_extendedprice") < col("lo"), col("lo"))
      .when(col("l_extendedprice") > col("hi"), col("hi"))
      .otherwise(col("l_extendedprice"))
    counts.join(broadcast(bounds), "l_returnflag")
      .groupBy(col("l_returnflag"), col("lo"), col("hi"))
      .agg(
        sum(col("cnt")).as("n"),
        sum(when(col("l_extendedprice") < col("lo"), col("cnt"))
          .otherwise(lit(0L))).as("n_clip_lo"),
        sum(when(col("l_extendedprice") > col("hi"), col("cnt"))
          .otherwise(lit(0L))).as("n_clip_hi"),
        sum(col("l_extendedprice").cast(dec) * col("cnt"))
          .cast("double").as("sum_raw"),
        sum(w.cast(dec) * col("cnt")).cast("double").as("sum_winsorized"))
      .orderBy("l_returnflag")
  }

  // ---- correlation matrix ----------------------------------------

  /** Pearson correlation between numeric column pairs of lineitem,
    * computed from DECIMAL-EXACT raw moments (Σx, Σy, Σxy, Σx², Σy²,
    * n) gathered in ONE scan — never via the streaming `corr`
    * aggregate, whose FP accumulation order differs between engines
    * and across partition counts. The moment sums are
    * order-independent (exact decimal addition), so the final double
    * arithmetic is bit-identical on both engines, and adding
    * executors cannot change the answer — determinism AND scale from
    * the same trick. */
  private val CorrPairs = Seq(
    ("l_quantity", "l_extendedprice"),
    ("l_extendedprice", "l_discount"),
    ("l_quantity", "l_tax"))

  private def corrMatrix(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val cols = CorrPairs.flatMap(p => Seq(p._1, p._2)).distinct
    val moments =
      count(lit(1)).as("n") +:
        (cols.flatMap { c =>
          Seq(Det.dsum(col(c), 6).as(s"s_$c"),
            Det.dsum(col(c) * col(c), 6).as(s"ss_$c"))
        } ++ CorrPairs.map { case (a, b) =>
          Det.dsum(col(a) * col(b), 6).as(s"sp_${a}_$b")
        })
    val wide = li.agg(moments.head, moments.tail: _*)
    val rows = CorrPairs.map { case (a, b) =>
      val n = col("n").cast("double")
      val cov = col(s"sp_${a}_$b") * n - col(s"s_$a") * col(s"s_$b")
      val va = col(s"ss_$a") * n - col(s"s_$a") * col(s"s_$a")
      val vb = col(s"ss_$b") * n - col(s"s_$b") * col(s"s_$b")
      struct(lit(s"${a}__$b").as("pair"),
        Det.r4(cov / sqrt(va * vb)).as("pearson"))
    }
    wide.select(explode(array(rows: _*)).as("p"))
      .select(col("p.pair"), col("p.pearson"))
      .orderBy("pair")
  }

  private def corrOracle: String = {
    val cols = CorrPairs.flatMap(p => Seq(p._1, p._2)).distinct
    val moments =
      ("CAST(COUNT(*) AS DOUBLE) AS n" +:
        (cols.flatMap { c =>
          Seq(s"${Det.dsumSql(c, 6)} AS s_$c",
            s"${Det.dsumSql(s"$c * $c", 6)} AS ss_$c")
        } ++ CorrPairs.map { case (a, b) =>
          s"${Det.dsumSql(s"$a * $b", 6)} AS sp_${a}_$b"
        })).mkString(",\n         ")
    val selects = CorrPairs.map { case (a, b) =>
      val expr = s"(sp_${a}_$b * n - s_$a * s_$b)" +
        s" / SQRT((ss_$a * n - s_$a * s_$a) * (ss_$b * n - s_$b * s_$b))"
      s"SELECT '${a}__$b' AS pair, ${Det.r4Sql(expr)} AS pearson FROM m"
    }
    s"""WITH m AS (
       |  SELECT $moments
       |  FROM lineitem)
       |${selects.mkString("", "\nUNION ALL\n", "\nORDER BY pair")}""".stripMargin
  }

  // ---- EWMA smoothing --------------------------------------------

  /** Exponentially-weighted moving average (α=0.5) over each user's
    * last [[EwmaLookback]] events — time-series smoothing as one
    * per-key window pass. The recurrence is unrolled into a LAG chain
    * (all LAGs share one window spec, so Catalyst plans a single
    * WindowExec over the user_id partition — nothing corpus-global),
    * normalized over the weights actually present so the series
    * starts unbiased. The SAME template text runs on both engines:
    * the weights are exact binary fractions and the addition chain is
    * left-associative in both parsers, so the doubles agree bitwise.
    */
  private val EwmaLookback = 10

  private def ewmaSql(events: String): String = {
    val over = "OVER (PARTITION BY user_id ORDER BY ts, event_id)"
    val coefs = (1 until EwmaLookback).map(k =>
      k -> java.math.BigDecimal.valueOf(0.5).pow(k).toPlainString)
    val num = ("value" +: coefs.map { case (k, c) =>
      s"COALESCE(LAG(value, $k) $over * $c, 0.0)" }).mkString("\n         + ")
    val den = ("1.0" +: coefs.map { case (k, c) =>
      s"CASE WHEN LAG(value, $k) $over IS NOT NULL THEN $c ELSE 0.0 END" })
      .mkString("\n         + ")
    s"""SELECT user_id, event_id, value,
       |       ${Det.r4Sql(s"($num)\n        / ($den)")} AS ewma
       |FROM $events
       |ORDER BY event_id""".stripMargin
  }

  /** Spark-side events view with the ns→µs ts conversion applied
    * (Tables.view registers the RAW table, whose ts is nanos BIGINT
    * under the legacy read conf — the SQL template needs timestamp
    * ordering semantics identical to DuckDB's µs). */
  private def eventsView(s: SparkSession, d: String): String = {
    val v = s"v_eventsconv_${d.replaceAll("[^A-Za-z0-9]", "_")}"
    Tables.events(s, d).createOrReplaceTempView(v)
    v
  }

  private def ewma(s: SparkSession, d: String): DataFrame =
    s.sql(ewmaSql(eventsView(s, d)))

  // ---- association rules (market basket) ---------------------------

  /** Association-rule mining over order baskets (order = basket,
    * part = item): support / confidence / lift for item pairs
    * co-occurring in ≥ 2 baskets, top-20 by lift — the market-basket
    * recommender primitive (Agrawal & Srikant, VLDB 1994's candidate
    * counting specialized to pairs).
    *
    * Scale shape: the quadratic pair stage is an ORDER-keyed
    * self-equi-join, so its fan-out is bounded by basket size
    * (≤ items²-per-basket, ~4² here), never |items|² — the same
    * blocked-candidate discipline as q_cooccur. Item frequencies are
    * item-domain-sized (broadcast at this scale, keyed at 100 TB);
    * support/confidence/lift are fixed IEEE expressions over exact
    * Long counts with all products in DOUBLE (overflow-safe at any
    * corpus size), and the top-20 cut orders by (r4 lift, item_a,
    * item_b) — total. */
  private def assocRules(s: SparkSession, d: String): DataFrame = {
    // lazy localCheckpoint (r16): the basket table has FOUR consumers
    // (n, freq — whose two broadcast projections each ran the
    // scan+distinct as their own job, measured twin 0.6 s jobs — and
    // both sides of the pair self-join); the checkpoint runs the
    // distinct once. Reused-4x materialization is the guide §5 persist
    // criterion; at scale this is one shuffle-sized spill, cheaper
    // than three recomputes of a corpus-wide distinct.
    val items = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("i")).distinct()
      .localCheckpoint(eager = false)
    val n = items.agg(countDistinct(col("o")).as("n_baskets"))
    val freq = items.groupBy("i").agg(count(lit(1)).as("cnt"))
    val pairs = items.as("a")
      .join(items.as("b"), col("a.o") === col("b.o") && col("a.i") < col("b.i"))
      .groupBy(col("a.i").as("item_a"), col("b.i").as("item_b"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2)
    pairs
      .join(broadcast(freq.select(col("i").as("item_a"), col("cnt").as("ca"))),
        "item_a")
      .join(broadcast(freq.select(col("i").as("item_b"), col("cnt").as("cb"))),
        "item_b")
      .crossJoin(broadcast(n))
      .select(col("item_a"), col("item_b"), col("c").as("n_both"),
        Det.r4(col("c").cast("double") / col("n_baskets")).as("support"),
        Det.r4(col("c").cast("double") / col("ca")).as("confidence"),
        Det.r4(col("c").cast("double") * col("n_baskets")
          / (col("ca").cast("double") * col("cb"))).as("lift"))
      .orderBy(col("lift").desc, col("item_a"), col("item_b"))
      .limit(20)
  }

  private def assocRulesOracle: String =
    s"""WITH items AS (
       |  SELECT DISTINCT l_orderkey AS o, l_partkey AS i FROM lineitem),
       |n AS (SELECT COUNT(DISTINCT o) AS n_baskets FROM items),
       |freq AS (SELECT i, COUNT(*) AS cnt FROM items GROUP BY i),
       |pairs AS (
       |  SELECT a.i AS item_a, b.i AS item_b, COUNT(*) AS c
       |  FROM items a JOIN items b ON a.o = b.o AND a.i < b.i
       |  GROUP BY 1, 2
       |  HAVING COUNT(*) >= 2)
       |SELECT item_a, item_b, c AS n_both,
       |       ${Det.r4Sql("CAST(c AS DOUBLE) / n_baskets")} AS support,
       |       ${Det.r4Sql("CAST(c AS DOUBLE) / fa.cnt")} AS confidence,
       |       ${Det.r4Sql(
          "CAST(c AS DOUBLE) * n_baskets / (CAST(fa.cnt AS DOUBLE) * fb.cnt)")} AS lift
       |FROM pairs
       |JOIN freq fa ON fa.i = item_a
       |JOIN freq fb ON fb.i = item_b
       |CROSS JOIN n
       |ORDER BY lift DESC, item_a, item_b
       |LIMIT 20""".stripMargin

  // ---- CUSUM change-point detection -------------------------------

  /** CUSUM change-point detection on the daily event-count series
    * (Page 1954; the at-most-one-change mean-shift scan): the
    * centered cumulative sum Sₜ = Σᵢ≤ₜ(xᵢ − x̄) peaks at the day the
    * series' mean shifts, and max|Sₜ| is the classic AMOC statistic.
    * Computed EXACTLY in integers: S'ₜ = n·cumₜ − t·total = n·Sₜ, so
    * the argmax (ties → earliest day) involves no division at all;
    * only the final normalized statistic and the before/after mean
    * estimates touch doubles, spelled identically in the oracle.
    *
    * Scale shape: the corpus-sized stage is the one map-side-combined
    * daily count; everything after runs on the CALENDAR-sized day
    * table (the global window sits directly on the aggregate — the
    * waived bounded shape, same as q_hybrid_rrf's limit windows).
    * Headroom: n·cumₜ ≤ days·events < 10⁴·10¹⁴ fits a Long. */
  private def cusum(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    val tot = daily.agg(count(lit(1)).as("n"), sum(col("x")).as("total"))
    val w = Window.orderBy("day")
    val cum = daily
      .withColumn("t", row_number().over(w).cast("long"))
      .withColumn("cumx", sum(col("x"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(tot))
      .withColumn("sprime", col("n") * col("cumx") - col("t") * col("total"))
    cum.orderBy(abs(col("sprime")).desc, col("day")).limit(1)
      .select(col("n").as("n_days"), col("total").as("total_events"),
        col("day").as("change_day"),
        Det.r4(abs(col("sprime")).cast("double")
          / (col("n").cast("double") * col("total"))).as("cusum_stat"),
        Det.r4(col("cumx").cast("double") / col("t")).as("mean_before"),
        when(col("n") === col("t"), lit(null).cast("double"))
          .otherwise(Det.r4((col("total") - col("cumx")).cast("double")
            / (col("n") - col("t")))).as("mean_after"))
  }

  private def cusumOracle(events: String): String =
    s"""WITH daily AS (
       |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS x
       |  FROM $events GROUP BY 1),
       |tot AS (SELECT COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS total FROM daily),
       |cum AS (
       |  SELECT day,
       |         ROW_NUMBER() OVER (ORDER BY day) AS t,
       |         SUM(x) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS cumx,
       |         n, total,
       |         n * SUM(x) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
       |           - ROW_NUMBER() OVER (ORDER BY day) * total AS sprime
       |  FROM daily, tot)
       |SELECT n AS n_days, total AS total_events, day AS change_day,
       |       ${Det.r4Sql("CAST(ABS(sprime) AS DOUBLE) / (CAST(n AS DOUBLE) * total)")} AS cusum_stat,
       |       ${Det.r4Sql("CAST(cumx AS DOUBLE) / t")} AS mean_before,
       |       CASE WHEN n = t THEN NULL
       |            ELSE ${Det.r4Sql("CAST(total - cumx AS DOUBLE) / (n - t)")} END AS mean_after
       |FROM cum
       |ORDER BY ABS(sprime) DESC, day LIMIT 1""".stripMargin

  // ---- autocorrelation function -----------------------------------

  /** ACF lags computed. */
  private val AcfMaxLag = 7

  /** Autocorrelation function of the daily event-count series, lags
    * 1..[[AcfMaxLag]] — the seasonality probe behind "is this weekly-
    * periodic?" (and the diagnostics companion to q_cusum/q_ewma).
    * Estimator: rₖ = Σₜ(xₜ−x̄)(xₜ₊ₖ−x̄) / Σₜ(xₜ−x̄)², expanded into
    * INTEGER sums (Σxₜxₜ₊ₖ, head/tail sums, Σx², n, total — all exact
    * Longs) so both engines feed bit-identical inputs into one fixed
    * IEEE formula. The k LEADs share one window spec over the
    * CALENDAR-sized day table (single WindowExec above the aggregate
    * — the waived bounded shape); the corpus-sized stage is the one
    * map-side-combined daily count. */
  private def acf(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    val w = Window.orderBy("day")
    val withLeads = (1 to AcfMaxLag).foldLeft(daily) { (df, k) =>
      df.withColumn(s"l$k", lead(col("x"), k).over(w))
    }
    val aggs =
      Seq(count(lit(1)).as("n"), sum(col("x")).as("tot"),
        sum(col("x") * col("x")).as("sxx")) ++
        (1 to AcfMaxLag).flatMap { k =>
          Seq(
            sum(col("x") * col(s"l$k")).as(s"s2_$k"),
            sum(when(col(s"l$k").isNotNull, col("x"))).as(s"sh_$k"),
            sum(col(s"l$k")).as(s"st_$k"))
        }
    val wide = withLeads.agg(aggs.head, aggs.tail: _*)
    val mean = col("tot").cast("double") / col("n")
    val denom = col("sxx") - col("n") * mean * mean
    val rows = (1 to AcfMaxLag).map { k =>
      val num = col(s"s2_$k") - mean * (col(s"sh_$k") + col(s"st_$k")) +
        (col("n") - k) * mean * mean
      struct(lit(k).as("lag"), Det.r4(num / denom).as("acf"))
    }
    wide.select(explode(array(rows: _*)).as("p"))
      .select(col("p.lag"), col("p.acf"))
      .orderBy("lag")
  }

  private def acfOracle(events: String): String = {
    val leads = (1 to AcfMaxLag).map(k =>
      s"LEAD(x, $k) OVER (ORDER BY day) AS l$k").mkString(",\n         ")
    val sums = (1 to AcfMaxLag).map { k =>
      s"""CAST(SUM(x * l$k) AS BIGINT) AS s2_$k,
         |         CAST(SUM(CASE WHEN l$k IS NOT NULL THEN x END) AS BIGINT) AS sh_$k,
         |         CAST(SUM(l$k) AS BIGINT) AS st_$k""".stripMargin
    }.mkString(",\n         ")
    val mean = "(CAST(tot AS DOUBLE) / n)"
    val selects = (1 to AcfMaxLag).map { k =>
      val num = s"(s2_$k - $mean * (sh_$k + st_$k) + (n - $k) * $mean * $mean)"
      s"SELECT $k AS lag, ${Det.r4Sql(s"$num / (sxx - n * $mean * $mean)")} AS acf FROM m"
    }
    s"""WITH daily AS (
       |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS x
       |  FROM $events GROUP BY 1),
       |leads AS (
       |  SELECT x,
       |         $leads
       |  FROM daily),
       |m AS (
       |  SELECT COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS tot,
       |         CAST(SUM(x * x) AS BIGINT) AS sxx,
       |         $sums
       |  FROM leads)
       |${selects.mkString("\nUNION ALL\n")}
       |ORDER BY lag""".stripMargin
  }

  // ---- linear trend forecast ---------------------------------------

  /** Forecast horizon (days). */
  private val FcHorizon = 7

  /** Linear-trend forecast of the daily event volume: OLS of count on
    * day index over the observed series, extrapolated [[FcHorizon]]
    * days — the capacity-planning baseline every monitoring stack
    * ships. The regression moments (Σt, Σt², Σy, Σty) are EXACT Longs
    * (t = day rank, y = integer counts), so both engines feed
    * bit-identical inputs to one fixed IEEE slope/intercept formula;
    * forecasts are r4-rounded. Scale shape: one map-side-combined
    * daily count; the moment aggregate and the 7-row horizon explode
    * run on the calendar-sized day table. */
  private def trendForecast(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
    val w = Window.orderBy("day")
    val m = daily
      .withColumn("t", row_number().over(w).cast("long"))
      .agg(count(lit(1)).as("n"), max(col("day")).as("last_day"),
        sum(col("t")).as("st"), sum(col("t") * col("t")).as("stt"),
        sum(col("y")).as("sy"), sum(col("t") * col("y")).as("sty"))
    val slope = (col("n") * col("sty") - col("st") * col("sy")).cast("double") /
      (col("n") * col("stt") - col("st") * col("st"))
    val icept = (col("sy") - slope * col("st")) / col("n")
    m.select(col("n"), col("last_day"), slope.as("b"), icept.as("a"))
      .select(col("n"), col("last_day"), col("b"), col("a"),
        explode(sequence(lit(1), lit(FcHorizon))).as("h"))
      .select(col("h"),
        date_add(col("last_day"), col("h")).as("forecast_day"),
        Det.r4(col("b")).as("slope"),
        Det.r4(col("a") + col("b") * (col("n") + col("h"))).as("forecast"))
      .orderBy("h")
  }

  private def trendForecastOracle(events: String): String = {
    val slope = "(CAST(n * sty - st * sy AS DOUBLE) / (n * stt - st * st))"
    val icept = s"((sy - $slope * st) / n)"
    s"""WITH daily AS (
       |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS y
       |  FROM $events GROUP BY 1),
       |m AS (
       |  SELECT COUNT(*) AS n, MAX(day) AS last_day,
       |         CAST(SUM(t) AS BIGINT) AS st,
       |         CAST(SUM(t * t) AS BIGINT) AS stt,
       |         CAST(SUM(y) AS BIGINT) AS sy,
       |         CAST(SUM(t * y) AS BIGINT) AS sty
       |  FROM (SELECT day, y, ROW_NUMBER() OVER (ORDER BY day) AS t FROM daily))
       |SELECT h, last_day + CAST(h AS INT) AS forecast_day,
       |       ${Det.r4Sql(slope)} AS slope,
       |       ${Det.r4Sql(s"$icept + $slope * (n + h)")} AS forecast
       |FROM m, (SELECT CAST(UNNEST(range(1, ${FcHorizon + 1})) AS INT) AS h)
       |ORDER BY h""".stripMargin
  }

  // ---- day-of-week seasonality profile ------------------------------

  /** Day-of-week seasonality profile: per weekday — days observed,
    * events, exact-decimal events/day, and each weekday's share of
    * total volume. The companion to q_acf (which detects periodicity;
    * this names it) and the input to dow-aware anomaly baselines.
    * One map-side-combined (date, dow) count; everything after runs
    * on the calendar-sized day table and a 7-row rollup. dow is
    * ISO (1 = Monday), spelled identically on both engines. */
  private def seasonality(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .withColumn("dow", dayofweek(col("day")))
      // dayofweek is 1=Sunday; re-map to ISO 1=Monday..7=Sunday
      .withColumn("dow", when(col("dow") === 1, 7).otherwise(col("dow") - 1))
    val tot = daily.agg(sum(col("x")).as("tot"))
    daily.groupBy("dow")
      .agg(count(lit(1)).as("n_days"), sum(col("x")).as("n_events"),
        Det.davg(col("x").cast("double"), 0).as("events_per_day"))
      .crossJoin(broadcast(tot))
      .select(col("dow").cast("long").as("dow"), col("n_days"), col("n_events"),
        Det.r4(col("events_per_day")).as("events_per_day"),
        Det.r4(col("n_events").cast("double") / col("tot")).as("share"))
      .orderBy("dow")
  }

  private def seasonalityOracle(events: String): String =
    s"""WITH daily AS (
       |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS x
       |  FROM $events GROUP BY 1),
       |dd AS (SELECT ISODOW(day) AS dow, x FROM daily),
       |tot AS (SELECT CAST(SUM(x) AS BIGINT) AS tot FROM daily)
       |SELECT dow, COUNT(*) AS n_days, CAST(SUM(x) AS BIGINT) AS n_events,
       |       ${Det.r4Sql(Det.davgSql("CAST(x AS DOUBLE)", 0))} AS events_per_day,
       |       ${Det.r4Sql("CAST(CAST(SUM(x) AS BIGINT) AS DOUBLE) / tot")} AS share
       |FROM dd, tot
       |GROUP BY dow, tot
       |ORDER BY dow""".stripMargin

  // ---- inter-arrival audit -----------------------------------------

  /** Inter-arrival (point-process) audit of the event stream: per-user
    * gaps between consecutive events, rolled up per event type — gap
    * count, decimal-exact mean gap, extremes, and the under-a-minute
    * burst fraction. The burst share flags machine-generated traffic;
    * the mean/max calibrate session-window and watermark choices
    * (q_stream_session's 30-min gap, the streaming tier's lateness
    * bounds). One user-keyed window pass (LAG shares the key
    * partition), then a type-bounded aggregate — no corpus-global
    * stage. */
  private def interarrival(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev", lag(col("ts"), 1).over(byUser))
      .filter(col("prev").isNotNull)
      .select(col("event_type"),
        (unix_timestamp(col("ts")) - unix_timestamp(col("prev"))).as("gap_s"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_gaps"),
        Det.r4(Det.davg(col("gap_s").cast("double"), 0)).as("mean_gap_s"),
        min(col("gap_s")).as("min_gap_s"),
        max(col("gap_s")).as("max_gap_s"),
        Det.r4(count(when(col("gap_s") < 60, lit(1))).cast("double")
          / count(lit(1))).as("burst_frac"))
      .orderBy("event_type")
  }

  private def interarrivalOracle(events: String): String =
    s"""WITH gaps AS (
       |  SELECT event_type,
       |         CAST(FLOOR(EPOCH(ts)) AS BIGINT)
       |           - CAST(FLOOR(EPOCH(LAG(ts) OVER (PARTITION BY user_id
       |                         ORDER BY ts, event_id))) AS BIGINT) AS gap_s
       |  FROM $events
       |  QUALIFY LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
       |          IS NOT NULL)
       |SELECT event_type, COUNT(*) AS n_gaps,
       |       ${Det.r4Sql(Det.davgSql("CAST(gap_s AS DOUBLE)", 0))} AS mean_gap_s,
       |       MIN(gap_s) AS min_gap_s,
       |       MAX(gap_s) AS max_gap_s,
       |       ${Det.r4Sql(
          "CAST(COUNT(CASE WHEN gap_s < 60 THEN 1 END) AS DOUBLE) / COUNT(*)")} AS burst_frac
       |FROM gaps
       |GROUP BY event_type
       |ORDER BY event_type""".stripMargin

  // ---- cohort retention ------------------------------------------

  /** Weekly cohort retention on purchase activity: cohort = the
    * user's first purchase week; each later active week counts the
    * user at its week offset; retention = active / cohort size.
    * Scale shape: ONE distinct on (user, week) — map-side partial —
    * then a window min on user_id (the user-grain shuffle that
    * dominates at 100 TB), and everything after runs on the
    * cohort×offset grid, which is calendar-sized, not data-sized.
    * The ratio divides two exact counts, so it is bit-identical
    * cross-engine under the floor-based r4. */
  private def retention(s: SparkSession, d: String): DataFrame = {
    val weeks = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("w"))
      .distinct()
    val agg = weeks
      .withColumn("cohort_week", min(col("w")).over(Window.partitionBy("user_id")))
      .groupBy(col("cohort_week"),
        (datediff(col("w"), col("cohort_week")) / 7).cast("int").as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
    agg
      .withColumn("cohort_size",
        max(when(col("week_offset") === 0, col("n_active")))
          .over(Window.partitionBy("cohort_week")))
      .select(col("cohort_week"), col("week_offset"), col("n_active"),
        Det.r4(col("n_active").cast("double") / col("cohort_size")).as("retention"))
      .orderBy("cohort_week", "week_offset")
  }

  // ---- rolling distinct (WAU/DAU) --------------------------------

  /** 7-day rolling distinct users (WAU) + same-day distinct (DAU)
    * per day. COUNT(DISTINCT) over a sliding window is not window-
    * expressible in Spark (and a per-day self-join is O(days·data)),
    * so each (user, day) contributes itself to the 7 window days it
    * falls in — a NARROW explode (factor = window length) — and one
    * hash aggregation per window day does a partial-distinct count.
    * The day grid is calendar-sized, so the semi-join that drops
    * phantom trailing days broadcasts. Scale: explode factor is the
    * window length (7), independent of data size; the shuffle key is
    * the day — at 100 TB add the user's hash prefix as a salt and a
    * second merge level (the count-distinct Expand already gives
    * partial aggregation). */
  private def rollingDistinct(s: SparkSession, d: String): DataFrame = {
    val ud = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val days = ud.select(col("day")).distinct()
    ud.select(col("user_id"), col("day"),
        explode(sequence(col("day"), date_add(col("day"), 6))).as("wday"))
      .join(broadcast(days.withColumnRenamed("day", "wday")), "wday", "left_semi")
      .groupBy(col("wday").as("day"))
      .agg(countDistinct(col("user_id")).as("wau7"),
        countDistinct(when(col("day") === col("wday"), col("user_id"))).as("dau"))
      .orderBy("day")
  }

  // ---- clickstream paths -----------------------------------------

  /** Top event-type trigram paths: the 3-step sequences users
    * actually walk (path analysis over the clickstream). Two LEADs
    * over the per-user time order build the trigram stream in ONE
    * keyed window pass — n-gram-over-sequence, the sessionized twin
    * of q_bpe_pairs' n-gram-over-text. One user-keyed shuffle, then
    * a type³-cardinality count aggregation; top-20 ties break on the
    * path itself, so the cut is total-ordered. */
  private def paths(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("step2", lead(col("event_type"), 1).over(byUser))
      .withColumn("step3", lead(col("event_type"), 2).over(byUser))
      .filter(col("step3").isNotNull)
      .groupBy(col("event_type").as("step1"), col("step2"), col("step3"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("step1"), col("step2"), col("step3"))
      .limit(20)
  }

  // ---- skyline (Pareto frontier) ---------------------------------

  /** Per-priority 2D skyline of orders — the Pareto frontier
    * minimizing (price, date): rows no other same-priority row
    * dominates (≤ in both dimensions, < in one). The scalable plan is
    * the classic TWO-PHASE skyline (Börzsönyi et al., ICDE 2001,
    * distributed): phase 1 computes a LOCAL skyline per input split —
    * sound because a dominated row is dominated by some member of any
    * superset's skyline, so skyline(S) ⊆ ∪ᵢ skyline(split i) — and
    * phase 2 re-runs the same pruning globally on the few survivors
    * (~H(n) per split). Both phases are the same O(n log n) window
    * trick, never the quadratic NOT-EXISTS: sort by price, and a row
    * survives iff no STRICTLY-cheaper row has date ≤ mine (a RANGE
    * frame ending 1 cent before the current row) and no same-price
    * row has date < mine. Prices order by exact integer CENTS: a
    * double `price - 0.01` range boundary can exclude an adjacent-
    * cent row outright (0.03 - 0.01 < 0.02 in IEEE). Phase 1 keys the
    * window on (priority, input split id) — result-invariant to the
    * split layout since phase 2 prunes exactly — so parallelism stays
    * data-proportional; phase 2's 5-value partition key sees only
    * survivor rows. The oracle is the quadratic NOT EXISTS — a
    * formulation-independent cross-check. */
  private def skyline(s: SparkSession, d: String): DataFrame = {
    def prune(df: DataFrame, keys: Seq[String]): DataFrame = {
      val cheaper = Window.partitionBy(keys.map(col): _*).orderBy("price_c")
        .rangeBetween(Window.unboundedPreceding, -1)
      val same = Window.partitionBy((keys :+ "price_c").map(col): _*)
      df.withColumn("d_cheaper", min(col("o_orderdate")).over(cheaper))
        .withColumn("d_same", min(col("o_orderdate")).over(same))
        .filter((col("d_cheaper").isNull || col("d_cheaper") > col("o_orderdate")) &&
          !(col("d_same") < col("o_orderdate")))
        .drop("d_cheaper", "d_same")
    }
    val o = Tables.orders(s, d)
      .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("price_c"),
        spark_partition_id().as("split"))
    prune(prune(o, Seq("o_orderpriority", "split")), Seq("o_orderpriority"))
      .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderkey"))
      .orderBy("o_orderpriority", "o_totalprice", "o_orderdate", "o_orderkey")
  }

  // ---- hybrid retrieval (RRF) ------------------------------------

  private val RrfK = 60
  /** Per-retriever candidate-list depth: each side contributes its
    * top-100, the standard RRF setup. The limit is what makes the
    * rank windows scale-safe — TakeOrderedAndProject merges
    * per-partition top-100s (never a global sort), and the global
    * row_number that follows ranks ≤100 rows by construction. */
  private val CandK = 100

  private def hybridRrf(s: SparkSession, d: String): DataFrame = {
    // keyword side: full BM25 scoring (shared with q_bm25), probe
    // document excluded; top-CandK cut, then rank the candidate list
    val textRank = Search.bm25Scored(s, d)
      .filter(col("doc_id") =!= 0L)
      .orderBy(col("score").desc, col("doc_id")).limit(CandK)
      .withColumn("text_rank",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id"))))
      .select(col("doc_id"), col("text_rank"))
    // vector side: cosine vs the probe embedding (vec_id 0 = doc 0)
    val probe = Tables.embeddings(s, d).filter(col("vec_id") === 0L)
      .select(col("embedding").as("probe"))
    val vecRank = Tables.embeddings(s, d)
      .filter(col("vec_id") =!= 0L)
      .crossJoin(broadcast(probe))
      .select(col("vec_id"),
        Det.r4(cosine(col("embedding"), col("probe"))).as("cos"))
      .orderBy(col("cos").desc, col("vec_id")).limit(CandK)
      .withColumn("vec_rank",
        row_number().over(Window.orderBy(col("cos").desc, col("vec_id"))))
      .select(col("vec_id"), col("vec_rank"))
    textRank
      .join(vecRank, col("doc_id") === col("vec_id"), "full_outer")
      .select(
        coalesce(col("doc_id"), col("vec_id")).as("doc_id"),
        col("text_rank"), col("vec_rank"),
        (coalesce(lit(1.0) / (lit(RrfK) + col("text_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfK) + col("vec_rank")), lit(0.0))).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(10)
  }

  /** Attribution lookback: a purchase more than this many days after
    * the last touch is credited to 'direct'. Mirrored in the oracle. */
  private val AttrWindowDays = 7

  /** Last-touch marketing attribution: each purchase is credited to
    * the channel (click / view) of the same user's most recent touch
    * at-or-before the purchase, or to 'direct' when the last touch is
    * absent or older than AttrWindowDays. Touches are first collapsed
    * to one row per (user, ts) with max_by on event_id, so the
    * at-same-instant winner is total-ordered on both engines; the
    * DuckDB oracle states the same operator as an ASOF LEFT JOIN,
    * while the Spark side fuses it into ONE window pass — union the
    * touch and purchase streams, running max/last over the user
    * timeline — because the as-of join and the ordered scan are the
    * same operator, and the union form shuffles each event exactly
    * once on user_id (partial-agg'd map-side by the dedup) instead of
    * shuffling both join sides. Everything downstream of the window
    * is a 3-row channel rollup. */
  private def attribution(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val touches = ev.filter(col("event_type").isin("click", "view"))
      .groupBy(col("user_id"), col("ts"))
      .agg(max_by(col("event_type"), col("event_id")).as("ch"))
      .select(col("user_id"), col("ts"), lit(0).as("tag"), col("ch"),
        lit(null).cast("double").as("value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(1).as("tag"),
        lit(null).cast("string").as("ch"), col("value"))
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    touches.unionAll(purchases)
      .withColumn("lt_ts", max(when(col("tag") === 0, col("ts"))).over(w))
      .withColumn("lt_ch",
        last(when(col("tag") === 0, col("ch")), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(
        when(col("lt_ts").isNull ||
          // µs-exact boundary, matching the oracle's INTERVAL compare
          unix_micros(col("ts")) - unix_micros(col("lt_ts")) >
            AttrWindowDays * 86400000000L, lit("direct"))
          .otherwise(col("lt_ch")).as("channel"),
        col("value"))
      .groupBy("channel")
      .agg(count(lit(1)).as("n_purchases"),
        Det.dsum(col("value"), 4).as("total_value"))
      .orderBy("channel")
  }

  override val queries: Map[String, Q] = Map(
    "q_attribution" -> attribution,
    "q_funnel"     -> funnel,
    "q_scd2"       -> scd2,
    "q_profile"    -> profile,
    "q_hybrid_rrf" -> hybridRrf,
    "q_ewma"       -> ewma,
    "q_cusum"      -> cusum,
    "q_acf"        -> acf,
    "q_assoc_rules" -> assocRules,
    "q_trend_forecast" -> trendForecast,
    "q_seasonality" -> seasonality,
    "q_interarrival" -> interarrival,
    "q_corr"       -> corrMatrix,
    "q_winsorize"  -> winsorize,
    "q_snapshot_diff" -> snapshotDiff,
    "q_cdc_apply" -> cdcApply,
    "q_ivm"        -> ivm,
    "q_retention"  -> retention,
    "q_rolling_distinct" -> rollingDistinct,
    "q_paths"      -> paths,
    "q_skyline"    -> skyline,
  )

  override val oracles: Map[String, String] = Map(
    // the oracle states the operator declaratively (ASOF LEFT JOIN);
    // the Spark side proves its fused single-window form is the same
    "q_attribution" ->
      s"""WITH touches AS (
         |  SELECT user_id, ts, MAX_BY(event_type, event_id) AS ch
         |  FROM events WHERE event_type IN ('click', 'view')
         |  GROUP BY user_id, ts),
         |p AS (
         |  SELECT user_id, ts AS pts, value
         |  FROM events WHERE event_type = 'purchase')
         |SELECT channel, COUNT(*) AS n_purchases,
         |       ${Det.dsumSql("value", 4)} AS total_value
         |FROM (
         |  SELECT CASE WHEN t.ts IS NULL
         |                 OR p.pts - t.ts > INTERVAL $AttrWindowDays DAY
         |              THEN 'direct' ELSE t.ch END AS channel,
         |         p.value
         |  FROM p ASOF LEFT JOIN touches t
         |    ON p.user_id = t.user_id AND t.ts <= p.pts)
         |GROUP BY channel ORDER BY channel""".stripMargin,
    "q_retention" ->
      s"""WITH weeks AS (
         |  SELECT DISTINCT user_id, CAST(DATE_TRUNC('week', ts) AS DATE) AS w
         |  FROM events WHERE event_type = 'purchase'),
         |coh AS (
         |  SELECT user_id, w, MIN(w) OVER (PARTITION BY user_id) AS cohort_week
         |  FROM weeks),
         |agg AS (
         |  SELECT cohort_week,
         |         CAST(DATEDIFF('day', cohort_week, w) / 7 AS INT) AS week_offset,
         |         COUNT(*) AS n_active
         |  FROM coh GROUP BY 1, 2)
         |SELECT cohort_week, week_offset, n_active,
         |       ${Det.r4Sql(
            "CAST(n_active AS DOUBLE) / MAX(CASE WHEN week_offset = 0 THEN n_active END) OVER (PARTITION BY cohort_week)")} AS retention
         |FROM agg
         |ORDER BY cohort_week, week_offset""".stripMargin,
    // the oracle states the SPEC (a correlated distinct-count over
    // the trailing week); the Spark side must match it from the
    // contribute-explode formulation
    "q_rolling_distinct" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |days AS (SELECT DISTINCT day FROM ud)
        |SELECT d.day,
        |       (SELECT COUNT(DISTINCT user_id) FROM ud u
        |        WHERE u.day BETWEEN d.day - 6 AND d.day) AS wau7,
        |       (SELECT COUNT(DISTINCT user_id) FROM ud u
        |        WHERE u.day = d.day) AS dau
        |FROM days d
        |ORDER BY d.day""".stripMargin,
    "q_paths" ->
      """WITH seq AS (
        |  SELECT event_type AS step1,
        |         LEAD(event_type, 1) OVER w AS step2,
        |         LEAD(event_type, 2) OVER w AS step3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT step1, step2, step3, COUNT(*) AS cnt
        |FROM seq WHERE step3 IS NOT NULL
        |GROUP BY 1, 2, 3
        |ORDER BY cnt DESC, step1, step2, step3
        |LIMIT 20""".stripMargin,
    // the spec, not the algorithm: quadratic NOT EXISTS dominance —
    // formulation-independent of the Spark side's two-phase windows
    "q_skyline" ->
      """SELECT o_orderpriority, o_totalprice, o_orderdate, o_orderkey
        |FROM orders a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders b
        |  WHERE b.o_orderpriority = a.o_orderpriority
        |    AND b.o_totalprice <= a.o_totalprice
        |    AND b.o_orderdate <= a.o_orderdate
        |    AND (b.o_totalprice < a.o_totalprice OR b.o_orderdate < a.o_orderdate))
        |ORDER BY o_orderpriority, o_totalprice, o_orderdate, o_orderkey""".stripMargin,
    "q_ewma" -> ewmaSql("events"),
    "q_cusum" -> cusumOracle("events"),
    "q_acf" -> acfOracle("events"),
    "q_assoc_rules" -> assocRulesOracle,
    "q_trend_forecast" -> trendForecastOracle("events"),
    "q_seasonality" -> seasonalityOracle("events"),
    "q_interarrival" -> interarrivalOracle("events"),
    "q_corr" -> corrOracle,
    // the IVM proof: the oracle RECOMPUTES the aggregate from the new
    // snapshot; the Spark side maintains it incrementally from the
    // base + delta. Hash equality = maintenance correctness.
    "q_ivm" ->
      s"""WITH newsnap AS (
         |  SELECT o_orderkey AS k, o_orderpriority AS pri,
         |         CASE WHEN o_orderkey % 101 = 0 THEN o_totalprice + 1234.56
         |              ELSE o_totalprice END AS v
         |  FROM orders WHERE o_orderkey % 97 <> 0
         |  UNION ALL
         |  SELECT o_orderkey + 6000000 AS k, o_orderpriority AS pri, o_totalprice AS v
         |  FROM orders WHERE o_orderkey % 103 = 0)
         |SELECT pri, COUNT(*) AS n, ${Det.dsumSql("v", 2)} AS total
         |FROM newsnap
         |GROUP BY pri
         |ORDER BY pri""".stripMargin,
    // the applied table must BE the new snapshot — the oracle states it
    // directly, so the hash match is the apply-correctness proof
    "q_cdc_apply" ->
      """SELECT k, v FROM (
        |  SELECT o_orderkey AS k,
        |         CASE WHEN o_orderkey % 101 = 0 THEN o_totalprice + 1234.56
        |              ELSE o_totalprice END AS v
        |  FROM orders WHERE o_orderkey % 97 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 6000000 AS k, o_totalprice AS v
        |  FROM orders WHERE o_orderkey % 103 = 0)
        |ORDER BY k""".stripMargin,
    "q_snapshot_diff" ->
      s"""WITH oldsnap AS (
         |  SELECT o_orderkey AS k, o_totalprice AS v FROM orders),
         |newsnap AS (
         |  SELECT o_orderkey AS k,
         |         CASE WHEN o_orderkey % 101 = 0 THEN o_totalprice + 1234.56
         |              ELSE o_totalprice END AS v
         |  FROM orders WHERE o_orderkey % 97 <> 0
         |  UNION ALL
         |  SELECT o_orderkey + 6000000 AS k, o_totalprice AS v
         |  FROM orders WHERE o_orderkey % 103 = 0)
         |SELECT CASE WHEN o.k IS NULL THEN 'insert'
         |            WHEN n.k IS NULL THEN 'delete'
         |            WHEN o.v <> n.v THEN 'update'
         |            ELSE 'unchanged' END AS change,
         |       COUNT(*) AS n_keys,
         |       ${Det.dsumSql("COALESCE(n.v, 0.0) - COALESCE(o.v, 0.0)", 2)} AS delta_value
         |FROM oldsnap o FULL OUTER JOIN newsnap n ON o.k = n.k
         |GROUP BY change
         |ORDER BY change""".stripMargin,
    "q_winsorize" ->
      s"""WITH bounds AS (
         |  SELECT l_returnflag,
         |         QUANTILE_DISC(l_extendedprice, 0.05) AS lo,
         |         QUANTILE_DISC(l_extendedprice, 0.95) AS hi
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT l.l_returnflag, lo, hi,
         |       COUNT(*) AS n,
         |       COUNT(CASE WHEN l_extendedprice < lo THEN 1 END) AS n_clip_lo,
         |       COUNT(CASE WHEN l_extendedprice > hi THEN 1 END) AS n_clip_hi,
         |       ${Det.dsumSql("l_extendedprice", 2)} AS sum_raw,
         |       ${Det.dsumSql(
              "CASE WHEN l_extendedprice < lo THEN lo WHEN l_extendedprice > hi THEN hi ELSE l_extendedprice END", 2)} AS sum_winsorized
         |FROM lineitem l JOIN bounds b ON l.l_returnflag = b.l_returnflag
         |GROUP BY l.l_returnflag, lo, hi
         |ORDER BY l.l_returnflag""".stripMargin,
    "q_funnel" ->
      """WITH stages AS (
        |  SELECT user_id,
        |         MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
        |         MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
        |         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
        |  FROM events GROUP BY user_id)
        |SELECT COUNT(*) AS n_users,
        |       COUNT(t_view) AS n_view,
        |       COUNT(CASE WHEN t_click > t_view THEN 1 END) AS n_click_after_view,
        |       COUNT(CASE WHEN t_buy > t_click AND t_click > t_view THEN 1 END) AS n_full_funnel
        |FROM stages""".stripMargin,
    "q_scd2" ->
      """WITH marked AS (
        |  SELECT user_id, event_id, event_type, ts,
        |         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_state
        |  FROM events),
        |changes AS (
        |  SELECT user_id, event_id, event_type, ts
        |  FROM marked WHERE prev_state IS NULL OR prev_state <> event_type)
        |SELECT user_id, event_id, event_type AS state, ts AS valid_from,
        |       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        |FROM changes
        |ORDER BY user_id, event_id""".stripMargin,
    "q_profile" -> {
      val selects = ProfileCols.map { case (c, num) =>
        val mn = if (num) s"CAST(MIN($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
        val mx = if (num) s"CAST(MAX($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
        s"""SELECT '$c' AS col, COUNT(*) - COUNT($c) AS n_nulls,
           |       COUNT(DISTINCT $c) AS n_distinct, $mn AS min_val, $mx AS max_val
           |FROM orders""".stripMargin
      }
      selects.mkString("", "\nUNION ALL\n", "\nORDER BY col")
    },
    "q_hybrid_rrf" ->
      s"""WITH docs AS (
         |  SELECT doc_id, CAST(LEN(string_split(text, ' ')) AS INT) AS dl
         |  FROM documents),
         |stats AS (
         |  SELECT COUNT(*) AS n_docs,
         |         ${Det.davgSql("CAST(LEN(string_split(text, ' ')) AS DOUBLE)", 0)} AS avgdl
         |  FROM documents),
         |tf AS (
         |  SELECT doc_id, dl, term, COUNT(*) AS tf FROM (
         |    SELECT doc_id,
         |           CAST(LEN(string_split(text, ' ')) AS INT) AS dl,
         |           UNNEST(string_split(text, ' ')) AS term
         |    FROM documents)
         |  WHERE term IN ('data', 'query', 'spark')
         |  GROUP BY doc_id, dl, term),
         |idf AS (
         |  SELECT term, LN(1.0 + (n_docs - df + 0.5) / (df + 0.5)) AS idf, avgdl
         |  FROM (SELECT term, COUNT(*) AS df FROM tf GROUP BY term), stats),
         |bm AS (
         |  SELECT doc_id,
         |         ${Det.r4Sql(Det.dsumSql(
              "idf.idf * (tf.tf * CAST(2.2 AS DOUBLE)) / (tf.tf + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * tf.dl / idf.avgdl))"))} AS score
         |  FROM tf JOIN idf USING (term)
         |  WHERE doc_id <> 0
         |  GROUP BY doc_id),
         |trk AS (
         |  SELECT doc_id, text_rank FROM (
         |    SELECT doc_id,
         |           CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS INT) AS text_rank
         |    FROM bm)
         |  WHERE text_rank <= 100),
         |cosd AS (
         |  SELECT vec_id,
         |         FLOOR((
         |           list_sum(list_transform(list_zip(e.embedding, p.probe),
         |                    t -> CAST(t[1] AS DOUBLE) * CAST(t[2] AS DOUBLE)))
         |           / (SQRT(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
         |              * SQRT(list_sum(list_transform(p.probe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
         |         ) * 10000 + 0.5) / 10000 AS cos
         |  FROM embeddings e,
         |       (SELECT embedding AS probe FROM embeddings WHERE vec_id = 0) p
         |  WHERE e.vec_id <> 0),
         |vrk AS (
         |  SELECT vec_id, vec_rank FROM (
         |    SELECT vec_id,
         |           CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, vec_id) AS INT) AS vec_rank
         |    FROM cosd)
         |  WHERE vec_rank <= 100)
         |SELECT COALESCE(t.doc_id, v.vec_id) AS doc_id, t.text_rank, v.vec_rank,
         |       COALESCE(CAST(1.0 AS DOUBLE) / ($RrfK + t.text_rank), CAST(0.0 AS DOUBLE))
         |       + COALESCE(CAST(1.0 AS DOUBLE) / ($RrfK + v.vec_rank), CAST(0.0 AS DOUBLE)) AS rrf
         |FROM trk t FULL OUTER JOIN vrk v ON t.doc_id = v.vec_id
         |ORDER BY rrf DESC, doc_id
         |LIMIT 10""".stripMargin,
  )
}
