package graft.ops

import graft.{Det, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Statistical-inference operators on top of the relational core:
  *
  *  - q_spearman: Spearman rank correlation (average ranks for ties)
  *    between lineitem measure pairs. Ranks are computed WITHOUT a
  *    global single-partition window: per-value counts are prefix-
  *    summed with [[Dist.prefixSum]] (two-phase distributed scan), so
  *    the rank assignment is a groupBy + bounded windows + a keyed
  *    join back — every stage partition-parallel at 100 TB. Average
  *    rank of value v is cum(v) − (cnt(v)−1)/2, exactly the
  *    RANK() + (cnt−1)/2 average-rank convention the oracle states
  *    with window functions. Ranks are halves (exact doubles), the
  *    moments are DECIMAL-exact [[Det.dsum]] sums, and the final
  *    Pearson combination over ranks runs the identical IEEE op
  *    sequence on both engines.
  *
  *  - q_chisq: chi-square test of independence on the
  *    event_type × hour-of-day contingency table, plus Cramér's V.
  *    Observed counts are integers (exact); expected counts and the
  *    (o−e)²/e terms are doubles produced by the identical expression
  *    text on both engines (IEEE ops are correctly rounded, so
  *    identical inputs + identical op order = bitwise-equal results);
  *    the 120-term sum is DECIMAL-exact. The cell/marginal tables are
  *    category-bounded (≤ types × 24 rows), so every join is a
  *    broadcast and the single shuffle is the map-side-combined
  *    count — the shape survives any row count.
  */
object Stats extends QueryPack {

  // ---- Spearman rank correlation ---------------------------------

  /** (a, b) measure pairs to correlate; ranks computed once per
    * distinct column. */
  private val Pairs = Seq(
    ("l_quantity", "l_extendedprice"),
    ("l_quantity", "l_discount"),
    ("l_extendedprice", "l_discount"))

  /** Average-rank table for one column: one row per distinct value,
    * rank = prefix-count − (cnt−1)/2. Broadcastable when the value
    * domain is small (quantity: 50, discount: 11); the extendedprice
    * table is ~|distinct| rows and joins back keyed. */
  private def ranked(li: DataFrame, c: String, rname: String): DataFrame = {
    val grouped = li.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
    Dist.prefixSum(grouped, c, "cnt", "cum")
      .select(col(c), (col("cum") - (col("cnt") - lit(1)) / lit(2.0)).as(rname))
  }

  private def spearman(s: SparkSession, d: String): DataFrame = {
    // explicit not-null pin (no-op on TPC-H data, where these columns
    // are non-nullable): keeps the rank join-back semantics fixture-
    // independent — see the mannwhitney note.
    val li = Tables.lineitem(s, d)
      .filter(col("l_quantity").isNotNull && col("l_extendedprice").isNotNull &&
        col("l_discount").isNotNull)
    val withRanks = li
      .select(col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      .join(broadcast(ranked(li, "l_quantity", "r_l_quantity")), "l_quantity")
      .join(ranked(li, "l_extendedprice", "r_l_extendedprice"), "l_extendedprice")
      .join(broadcast(ranked(li, "l_discount", "r_l_discount")), "l_discount")
    val cols = Pairs.flatMap(p => Seq(p._1, p._2)).distinct
    // rank products at n rows are ≤ n²: scale 2 keeps 16 integral
    // digits of DECIMAL headroom (exact for half-integer ranks).
    val moments =
      count(lit(1)).cast("double").as("n") +:
        (cols.flatMap { c =>
          Seq(Det.dsum(col(s"r_$c"), 2).as(s"s_$c"),
            Det.dsum(col(s"r_$c") * col(s"r_$c"), 2).as(s"ss_$c"))
        } ++ Pairs.map { case (a, b) =>
          Det.dsum(col(s"r_$a") * col(s"r_$b"), 2).as(s"sp_${a}_$b")
        })
    val wide = withRanks.agg(moments.head, moments.tail: _*)
    val rows = Pairs.map { case (a, b) =>
      val cov = col(s"sp_${a}_$b") * col("n") - col(s"s_$a") * col(s"s_$b")
      val va = col(s"ss_$a") * col("n") - col(s"s_$a") * col(s"s_$a")
      val vb = col(s"ss_$b") * col("n") - col(s"s_$b") * col(s"s_$b")
      struct(lit(s"${a}__$b").as("pair"),
        Det.r4(cov / sqrt(va * vb)).as("spearman"))
    }
    wide.select(explode(array(rows: _*)).as("p"))
      .select(col("p.pair"), col("p.spearman"))
      .orderBy("pair")
  }

  private def spearmanOracle: String = {
    val cols = Pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val ranks = cols.map { c =>
      s"RANK() OVER (ORDER BY $c) + (COUNT(*) OVER (PARTITION BY $c) - 1) / 2.0 AS r_$c"
    }.mkString(",\n         ")
    val moments =
      ("CAST(COUNT(*) AS DOUBLE) AS n" +:
        (cols.flatMap { c =>
          Seq(s"${Det.dsumSql(s"r_$c", 2)} AS s_$c",
            s"${Det.dsumSql(s"r_$c * r_$c", 2)} AS ss_$c")
        } ++ Pairs.map { case (a, b) =>
          s"${Det.dsumSql(s"r_$a * r_$b", 2)} AS sp_${a}_$b"
        })).mkString(",\n         ")
    val selects = Pairs.map { case (a, b) =>
      val expr = s"(sp_${a}_$b * n - s_$a * s_$b)" +
        s" / SQRT((ss_$a * n - s_$a * s_$a) * (ss_$b * n - s_$b * s_$b))"
      s"SELECT '${a}__$b' AS pair, ${Det.r4Sql(expr)} AS spearman FROM m"
    }
    s"""WITH r AS (
       |  SELECT $ranks
       |  FROM lineitem
       |  WHERE ${cols.map(c => s"$c IS NOT NULL").mkString(" AND ")}),
       |m AS (
       |  SELECT $moments
       |  FROM r)
       |${selects.mkString("", "\nUNION ALL\n", "\nORDER BY pair")}""".stripMargin
  }

  // ---- chi-square independence test ------------------------------

  private def chisq(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_type"), hour(col("ts")).cast("long").as("hr"))
    val cells = ev.groupBy("event_type", "hr").agg(count(lit(1)).as("o"))
    val rowT = ev.groupBy("event_type").agg(count(lit(1)).as("rt"))
    val colT = ev.groupBy("hr").agg(count(lit(1)).as("ct"))
    val tot = ev.agg(count(lit(1)).as("n"),
      countDistinct(col("event_type")).as("r"), countDistinct(col("hr")).as("c"))
    val chi2d = cells
      .join(broadcast(rowT), "event_type")
      .join(broadcast(colT), "hr")
      .crossJoin(broadcast(tot))
      .withColumn("e", col("rt").cast("double") * col("ct") / col("n"))
      .withColumn("term", (col("o") - col("e")) * (col("o") - col("e")) / col("e"))
      .groupBy("n", "r", "c")
      .agg(Det.dsum(col("term"), 6).cast("double").as("chi2d"))
    chi2d.select(
      col("n").as("n_events"), col("r").as("n_rows"), col("c").as("n_cols"),
      ((col("r") - 1) * (col("c") - 1)).as("dof"),
      Det.r4(col("chi2d")).as("chi2"),
      Det.r4(sqrt(col("chi2d") / (col("n") * least(col("r") - 1, col("c") - 1))))
        .as("cramers_v"))
  }

  private def chisqOracle: String =
    s"""WITH ev AS (
       |  SELECT event_type, CAST(HOUR(ts) AS BIGINT) AS hr FROM events),
       |cells AS (SELECT event_type, hr, COUNT(*) AS o FROM ev GROUP BY 1, 2),
       |rowt AS (SELECT event_type, COUNT(*) AS rt FROM ev GROUP BY 1),
       |colt AS (SELECT hr, COUNT(*) AS ct FROM ev GROUP BY 1),
       |tot AS (SELECT COUNT(*) AS n, COUNT(DISTINCT event_type) AS r,
       |               COUNT(DISTINCT hr) AS c FROM ev),
       |terms AS (
       |  SELECT (o - e) * (o - e) / e AS term FROM (
       |    SELECT o, CAST(rt AS DOUBLE) * ct / n AS e
       |    FROM cells
       |    JOIN rowt USING (event_type)
       |    JOIN colt USING (hr)
       |    CROSS JOIN tot)),
       |m AS (SELECT ${Det.dsumSql("term", 6)} AS chi2d FROM terms)
       |SELECT n AS n_events, r AS n_rows, c AS n_cols,
       |       (r - 1) * (c - 1) AS dof,
       |       ${Det.r4Sql("chi2d")} AS chi2,
       |       ${Det.r4Sql("SQRT(chi2d / (n * LEAST(r - 1, c - 1)))")} AS cramers_v
       |FROM m CROSS JOIN tot""".stripMargin

  // ---- Welch's t-test --------------------------------------------

  /** The two event populations whose `value` distributions are
    * compared; mirrored literally in the oracle. */
  private val TGroupA = "purchase"
  private val TGroupB = "view"

  /** Welch's unequal-variance t-test in ONE aggregation pass:
    * conditional DECIMAL-exact moments per group (map-side combined),
    * then the t statistic and Welch–Satterthwaite df as a constant
    * number of IEEE ops replayed identically by the oracle. */
  private def ttest(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    def side(t: String, tag: String) = Seq(
      count(when(col("event_type") === t, lit(1))).as(s"n$tag"),
      Det.dsum(when(col("event_type") === t, col("value")), 2).as(s"s$tag"),
      Det.dsum(when(col("event_type") === t, col("value") * col("value")), 4)
        .as(s"ss$tag"))
    val agg = side(TGroupA, "1") ++ side(TGroupB, "2")
    val m = ev.agg(agg.head, agg.tail: _*)
    def mean(t: String) = col(s"s$t") / col(s"n$t")
    def va(t: String) =
      (col(s"ss$t") - col(s"s$t") * col(s"s$t") / col(s"n$t")) / (col(s"n$t") - 1)
    val se2 = va("1") / col("n1") + va("2") / col("n2")
    val dfW = (se2 * se2) /
      ((va("1") / col("n1")) * (va("1") / col("n1")) / (col("n1") - 1) +
        (va("2") / col("n2")) * (va("2") / col("n2")) / (col("n2") - 1))
    m.select(
      col("n1"), col("n2"),
      Det.r4(mean("1")).as("mean_a"), Det.r4(mean("2")).as("mean_b"),
      Det.r4((mean("1") - mean("2")) / sqrt(se2)).as("t_stat"),
      Det.r4(dfW).as("df"))
  }

  private def ttestOracle: String = {
    def sideSql(t: String, tag: String) = Seq(
      s"COUNT(CASE WHEN event_type = '$t' THEN 1 END) AS n$tag",
      s"${Det.dsumSql(s"CASE WHEN event_type = '$t' THEN value END", 2)} AS s$tag",
      s"${Det.dsumSql(s"CASE WHEN event_type = '$t' THEN value * value END", 4)} AS ss$tag")
    val moments = (sideSql(TGroupA, "1") ++ sideSql(TGroupB, "2"))
      .mkString(",\n         ")
    def mean(t: String) = s"(s$t / n$t)"
    def va(t: String) = s"((ss$t - s$t * s$t / n$t) / (n$t - 1))"
    val se2 = s"(${va("1")} / n1 + ${va("2")} / n2)"
    val dfW = s"(($se2 * $se2) / " +
      s"((${va("1")} / n1) * (${va("1")} / n1) / (n1 - 1) + " +
      s"(${va("2")} / n2) * (${va("2")} / n2) / (n2 - 1)))"
    s"""WITH m AS (
       |  SELECT $moments
       |  FROM events)
       |SELECT n1, n2,
       |       ${Det.r4Sql(mean("1"))} AS mean_a,
       |       ${Det.r4Sql(mean("2"))} AS mean_b,
       |       ${Det.r4Sql(s"(${mean("1")} - ${mean("2")}) / SQRT($se2)")} AS t_stat,
       |       ${Det.r4Sql(dfW)} AS df
       |FROM m""".stripMargin
  }

  // ---- Mann-Whitney U (rank-sum) test ----------------------------

  /** Tie-corrected Mann-Whitney U on the same two populations. Ranks
    * over the POOLED values come from the same distributed rank
    * construction as q_spearman (per-value counts → prefix sum —
    * never a global data window); the tie-correction term Σ(t³−t)
    * rides the same per-value count table. U, its normal
    * approximation z, and the rank-biserial effect size are constant
    * arithmetic from DECIMAL-exact rank sums. */
  private def mannwhitney(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      // value IS NOT NULL pins the NULL semantics explicitly: without
      // it the rank join-back would silently DROP null-valued rows
      // while the oracle's RANK() keeps them (NULLS LAST) and counts
      // them in n1/n2 — masked today only because the fixture's value
      // column is non-null.
      .filter(col("event_type").isin(TGroupA, TGroupB) && col("value").isNotNull)
      .select(col("event_type"), col("value"))
    val byVal = ev.groupBy(col("value")).agg(count(lit(1)).as("cnt"))
    val ranks = Dist.prefixSum(byVal, "value", "cnt", "cum")
      .select(col("value"), col("cnt"),
        (col("cum") - (col("cnt") - lit(1)) / lit(2.0)).as("r"),
        (col("cnt") * col("cnt") * col("cnt") - col("cnt")).as("tie3"))
    val m = ev.join(ranks, "value")
      .agg(
        count(when(col("event_type") === TGroupA, lit(1))).as("n1"),
        count(when(col("event_type") === TGroupB, lit(1))).as("n2"),
        Det.dsum(when(col("event_type") === TGroupA, col("r")), 2).as("r1"),
        // every distinct value contributes its tie term once: divide
        // the per-row replicated term by the value's multiplicity
        Det.dsum(col("tie3") / col("cnt"), 6).as("ties"))
    val n = col("n1") + col("n2")
    val u1 = col("r1") - col("n1") * (col("n1") + 1) / lit(2.0)
    val mu = col("n1").cast("double") * col("n2") / 2
    val sigma2 = col("n1").cast("double") * col("n2") / 12 *
      ((n + 1) - col("ties") / (n * (n - 1)))
    m.select(
      col("n1"), col("n2"),
      u1.as("u1"),
      (col("n1").cast("double") * col("n2") - u1).as("u2"),
      Det.r4((u1 - mu) / sqrt(sigma2)).as("z"),
      Det.r4(lit(2.0) * u1 / (col("n1").cast("double") * col("n2")) - 1)
        .as("rank_biserial"))
  }

  private def mannwhitneyOracle: String =
    s"""WITH ev AS (
       |  SELECT event_type, value FROM events
       |  WHERE event_type IN ('$TGroupA', '$TGroupB') AND value IS NOT NULL),
       |ranks AS (
       |  SELECT event_type, value,
       |         RANK() OVER (ORDER BY value)
       |           + (COUNT(*) OVER (PARTITION BY value) - 1) / 2.0 AS r,
       |         COUNT(*) OVER (PARTITION BY value) AS cnt
       |  FROM ev),
       |m AS (
       |  SELECT COUNT(CASE WHEN event_type = '$TGroupA' THEN 1 END) AS n1,
       |         COUNT(CASE WHEN event_type = '$TGroupB' THEN 1 END) AS n2,
       |         ${Det.dsumSql(s"CASE WHEN event_type = '$TGroupA' THEN r END", 2)} AS r1,
       |         ${Det.dsumSql(
            "(CAST(cnt AS BIGINT) * cnt * cnt - cnt) / cnt", 6)} AS ties
       |  FROM ranks)
       |SELECT n1, n2,
       |       (r1 - n1 * (n1 + 1) / 2.0) AS u1,
       |       (CAST(n1 AS DOUBLE) * n2 - (r1 - n1 * (n1 + 1) / 2.0)) AS u2,
       |       ${Det.r4Sql(
          "((r1 - n1 * (n1 + 1) / 2.0) - CAST(n1 AS DOUBLE) * n2 / 2)" +
            " / SQRT(CAST(n1 AS DOUBLE) * n2 / 12" +
            " * (((n1 + n2) + 1) - ties / ((n1 + n2) * ((n1 + n2) - 1))))")} AS z,
       |       ${Det.r4Sql(
          "2.0 * (r1 - n1 * (n1 + 1) / 2.0) / (CAST(n1 AS DOUBLE) * n2) - 1")} AS rank_biserial
       |FROM m""".stripMargin

  // ---- two-sample Kolmogorov-Smirnov test -------------------------

  /** Two-sample Kolmogorov–Smirnov test between the same two event
    * populations' `value` distributions. D = sup |F₁(v) − F₂(v)| is
    * computed EXACTLY in integer arithmetic: per-value counts (one
    * map-side-combined aggregation over the corpus), then the signed
    * per-value contribution c₁(v)·n₂ − c₂(v)·n₁ is prefix-summed with
    * [[Dist.prefixSum]] (two-phase distributed scan — never a global
    * single-partition window), giving cum(v) = F₁(v)·n₁n₂ − F₂(v)·n₁n₂
    * as an exact DECIMAL(38,0). The argmax of |cum| (ties → smallest
    * value) is a single max(struct) aggregate, and only the final
    * division to D and the 5%-level critical value
    * c(0.05)·√((n₁+n₂)/n₁n₂) touch doubles — both spelled identically
    * in the oracle, so the comparison bit `reject_05` agrees too.
    *
    * Scale shape: the only corpus-sized stage is the per-value count
    * aggregation (shuffle rows = distinct values, with map-side
    * combine); everything downstream runs on the value domain. The
    * DECIMAL(38,0) accumulator keeps the cross products exact to
    * n₁·n₂ < 10³⁸ — headroom far past any real corpus (doubles would
    * lose the sup at ~2⁵³). */
  private def kstest(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val ev = Tables.events(s, d)
      .filter(col("event_type").isin(TGroupA, TGroupB) && col("value").isNotNull)
      .select(col("event_type"), col("value"))
    val byVal = ev.groupBy(col("value")).agg(
      count(when(col("event_type") === TGroupA, lit(1))).as("c1"),
      count(when(col("event_type") === TGroupB, lit(1))).as("c2"))
    val tot = byVal.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    val contrib = byVal.crossJoin(broadcast(tot))
      .select(col("value"), col("n1"), col("n2"),
        (col("c1").cast(DecimalType(19, 0)) * col("n2")
          - col("c2").cast(DecimalType(19, 0)) * col("n1"))
          .cast(DecimalType(38, 0)).as("dnum"))
    val cum = Dist.prefixSum(contrib, "value", "dnum", "cumd")
    cum.groupBy("n1", "n2")
      .agg(max(struct(abs(col("cumd")).as("m"), negate(col("value")).as("nv")))
        .as("mx"))
      .select(
        col("n1"), col("n2"),
        Det.r4(col("mx.m").cast("double")
          / (col("n1").cast("double") * col("n2"))).as("ks_d"),
        negate(col("mx.nv")).as("at_value"),
        Det.r4(lit(1.358) * sqrt((col("n1") + col("n2")).cast("double")
          / (col("n1").cast("double") * col("n2")))).as("d_crit_05"))
      .withColumn("reject_05", col("ks_d") > col("d_crit_05"))
  }

  private def kstestOracle: String =
    s"""WITH ev AS (
       |  SELECT event_type, value FROM events
       |  WHERE event_type IN ('$TGroupA', '$TGroupB') AND value IS NOT NULL),
       |byval AS (
       |  SELECT value,
       |         COUNT(CASE WHEN event_type = '$TGroupA' THEN 1 END) AS c1,
       |         COUNT(CASE WHEN event_type = '$TGroupB' THEN 1 END) AS c2
       |  FROM ev GROUP BY value),
       |tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
       |               CAST(SUM(c2) AS BIGINT) AS n2 FROM byval),
       |cum AS (
       |  SELECT value,
       |         SUM(CAST(c1 AS HUGEINT) * n2 - CAST(c2 AS HUGEINT) * n1)
       |           OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS cumd
       |  FROM byval, tot),
       |sel AS (
       |  SELECT ABS(cumd) AS m, value FROM cum
       |  ORDER BY m DESC, value ASC LIMIT 1)
       |SELECT n1, n2,
       |       ${Det.r4Sql("CAST(m AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2)")} AS ks_d,
       |       value AS at_value,
       |       ${Det.r4Sql(
          "CAST(1.358 AS DOUBLE) * SQRT(CAST(n1 + n2 AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2))")} AS d_crit_05,
       |       ${Det.r4Sql("CAST(m AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2)")}
       |         > ${Det.r4Sql(
          "CAST(1.358 AS DOUBLE) * SQRT(CAST(n1 + n2 AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2))")} AS reject_05
       |FROM sel, tot""".stripMargin

  // ---- ROC AUC evaluation -----------------------------------------

  /** Retrieval/classifier evaluation: exact ROC AUC (and Gini) of the
    * cosine-to-probe score against the "same label as the probe"
    * ground truth — the rank-sum identity AUC = (R₊ − n₊(n₊+1)/2) /
    * (n₊·n₋), i.e. the Mann–Whitney U normalized, computed on the
    * SAME distributed rank machinery as q_mannwhitney: per-score
    * counts (one map-side-combined aggregation), [[Dist.prefixSum]]
    * average ranks over the score domain, one DECIMAL-exact rank-sum.
    * No per-row rank window, no sort of the corpus — at 100 TB the
    * only data-sized stage is the per-score count. (On this fixture
    * the embeddings are synthetic unit-noise, so AUC ≈ 0.5 — the
    * evaluator reporting "no signal" is the honest output; the
    * operator's correctness is pinned by the oracle and replay.)
    *
    * Determinism: scores are sequential-fold cosines (bit-identical
    * across engines — the q_sim_search precedent), ranks exact
    * half-integers, the rank sum DECIMAL(18,2)-exact, and the final
    * AUC/Gini a fixed IEEE op sequence spelled identically in SQL. */
  private def aucEval(s: SparkSession, d: String): DataFrame = {
    import graft.functions.TextSim.cosine
    val emb = Tables.embeddings(s, d)
    val probe = emb.filter(col("vec_id") === 0L)
      .select(col("embedding").as("probe"), col("label").as("plabel"))
    val byVal = emb.filter(col("vec_id") =!= 0L)
      .crossJoin(broadcast(probe))
      .select(col("plabel"), (col("label") === col("plabel")).as("pos"),
        cosine(col("embedding"), col("probe")).as("sc"))
      .groupBy("plabel", "sc")
      .agg(count(when(col("pos"), lit(1))).as("cp"), count(lit(1)).as("cnt"))
    val u = col("rpos") - col("np") * (col("np") + 1) / lit(2.0)
    Dist.prefixSum(byVal, "sc", "cnt", "cum")
      .groupBy("plabel")
      .agg(
        sum(col("cp")).as("np"),
        sum(col("cnt") - col("cp")).as("nn"),
        Det.dsum(col("cp") * (col("cum") - (col("cnt") - 1) / lit(2.0)), 2)
          .as("rpos"))
      .select(col("plabel").as("probe_label"),
        col("np").as("n_pos"), col("nn").as("n_neg"),
        Det.r4(u / (col("np").cast("double") * col("nn"))).as("auc"),
        Det.r4(lit(2.0) * u / (col("np").cast("double") * col("nn")) - 1)
          .as("gini"))
  }

  private def aucEvalOracle: String = {
    val cos =
      """(list_sum(list_transform(list_zip(e.embedding, p.probe),
        |            t -> CAST(t[1] AS DOUBLE) * CAST(t[2] AS DOUBLE)))
        |   / (SQRT(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |      * SQRT(list_sum(list_transform(p.probe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))))""".stripMargin
    val u = "(rpos - np * (np + 1) / 2.0)"
    s"""WITH p AS (SELECT embedding AS probe, label AS plabel
       |           FROM embeddings WHERE vec_id = 0),
       |byv AS (
       |  SELECT plabel, sc,
       |         COUNT(CASE WHEN pos THEN 1 END) AS cp, COUNT(*) AS cnt
       |  FROM (SELECT p.plabel, e.label = p.plabel AS pos, $cos AS sc
       |        FROM embeddings e, p WHERE e.vec_id <> 0)
       |  GROUP BY plabel, sc),
       |cum AS (
       |  SELECT plabel, cp, cnt,
       |         SUM(cnt) OVER (ORDER BY sc ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM byv),
       |m AS (
       |  SELECT plabel, CAST(SUM(cp) AS BIGINT) AS np,
       |         CAST(SUM(cnt - cp) AS BIGINT) AS nn,
       |         ${Det.dsumSql("cp * (cum - (cnt - 1) / 2.0)", 2)} AS rpos
       |  FROM cum GROUP BY plabel)
       |SELECT plabel AS probe_label, np AS n_pos, nn AS n_neg,
       |       ${Det.r4Sql(s"$u / (CAST(np AS DOUBLE) * nn)")} AS auc,
       |       ${Det.r4Sql(s"2.0 * $u / (CAST(np AS DOUBLE) * nn) - 1")} AS gini
       |FROM m""".stripMargin
  }

  // ---- systematic PPS weighted sampling --------------------------

  /** Sample size per stratum. */
  private val PpsK = 20

  /** Systematic probability-proportional-to-size sampling: within
    * each order-priority stratum, walk the weight axis (cumulative
    * o_totalprice in o_orderkey order) and take the row at every
    * 1/K-of-total boundary crossing — the classic PPS systematic
    * design, here with ZERO transcendental functions (no ln/pow whose
    * libm bits differ across engines): cumulative weights are
    * DECIMAL-exact via [[Dist.prefixSumKeyed]] (grouped two-phase
    * prefix sum — a whole stratum never sits in one task), and the
    * boundary test is IEEE *,/ and floor, bit-equal on both engines.
    * Selection probability ∝ weight, deterministic, seedless. */
  private def samplePps(s: SparkSession, d: String): DataFrame = {
    val w = Tables.orders(s, d).select(col("o_orderkey"), col("o_orderpriority"),
      col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)).as("wt"))
    val cum = Dist.prefixSumKeyed(w, Seq("o_orderpriority"), "o_orderkey", "wt", "cumw")
    val tot = w.groupBy("o_orderpriority").agg(sum(col("wt")).as("tot"))
    cum.join(broadcast(tot), "o_orderpriority")
      .withColumn("pos", col("cumw").cast("double") * PpsK / col("tot").cast("double"))
      .withColumn("prev",
        (col("cumw") - col("wt")).cast("double") * PpsK / col("tot").cast("double"))
      .filter(floor(col("pos")) > floor(col("prev")))
      .select(col("o_orderpriority"), col("o_orderkey"),
        col("wt").cast("double").as("weight"),
        floor(col("pos")).cast("long").as("slot"))
      .orderBy("o_orderpriority", "o_orderkey")
  }

  private def samplePpsOracle: String =
    s"""WITH w AS (
       |  SELECT o_orderkey, o_orderpriority,
       |         CAST(o_totalprice AS DECIMAL(18,2)) AS wt
       |  FROM orders),
       |c AS (
       |  SELECT o_orderkey, o_orderpriority, wt,
       |         SUM(wt) OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey
       |                       ROWS UNBOUNDED PRECEDING) AS cumw,
       |         SUM(wt) OVER (PARTITION BY o_orderpriority) AS tot
       |  FROM w)
       |SELECT o_orderpriority, o_orderkey, CAST(wt AS DOUBLE) AS weight,
       |       CAST(FLOOR(CAST(cumw AS DOUBLE) * $PpsK / CAST(tot AS DOUBLE)) AS BIGINT) AS slot
       |FROM c
       |WHERE FLOOR(CAST(cumw AS DOUBLE) * $PpsK / CAST(tot AS DOUBLE))
       |    > FLOOR(CAST(cumw - wt AS DOUBLE) * $PpsK / CAST(tot AS DOUBLE))
       |ORDER BY o_orderpriority, o_orderkey""".stripMargin

  // ---- data-quality audit ----------------------------------------

  /** Declarative data-quality rule audit — the expectation-suite
    * shape: each rule is one (n_checked, n_violations) aggregate;
    * range/null rules are map-side single passes, the uniqueness rule
    * is COUNT − COUNT DISTINCT, the FK rule is a null-counting left
    * join against the distinct key set, and the cross-table temporal
    * rule rides one fact-fact keyed join. Rules union to a
    * rule-count-bounded result; every branch is independently
    * partition-parallel. */
  private def dqAudit(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
    val li = Tables.lineitem(s, d)
    val cust = Tables.customer(s, d)
    def rule(id: String, n: org.apache.spark.sql.Column,
        viol: org.apache.spark.sql.Column, src: DataFrame) =
      src.agg(n.as("n_checked"), viol.as("n_violations"))
        .select(lit(id).as("rule"), col("n_checked"), col("n_violations"))
    val r1 = rule("r1_orders_totalprice_positive",
      count(lit(1)), count(when(col("o_totalprice") <= 0, lit(1))), orders)
    val r2 = rule("r2_lineitem_discount_range",
      count(lit(1)),
      count(when(col("l_discount") < 0 || col("l_discount") > 0.1, lit(1))), li)
    val r3 = rule("r3_customer_key_unique",
      count(lit(1)), count(lit(1)) - countDistinct(col("c_custkey")), cust)
    val r4 = rule("r4_orders_custkey_fk",
      count(lit(1)), count(when(col("c_custkey").isNull, lit(1))),
      orders.join(cust.select(col("c_custkey")).distinct(),
        col("o_custkey") === col("c_custkey"), "left_outer"))
    val r5 = rule("r5_lineitem_ship_after_order",
      count(lit(1)), count(when(col("l_shipdate") < col("o_orderdate"), lit(1))),
      li.join(orders.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey")))
    r1.unionAll(r2).unionAll(r3).unionAll(r4).unionAll(r5).orderBy("rule")
  }

  private def dqAuditOracle: String =
    """SELECT * FROM (
      |SELECT 'r1_orders_totalprice_positive' AS rule, COUNT(*) AS n_checked,
      |       COUNT(CASE WHEN o_totalprice <= 0 THEN 1 END) AS n_violations
      |FROM orders
      |UNION ALL
      |SELECT 'r2_lineitem_discount_range', COUNT(*),
      |       COUNT(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 END)
      |FROM lineitem
      |UNION ALL
      |SELECT 'r3_customer_key_unique', COUNT(*),
      |       COUNT(*) - COUNT(DISTINCT c_custkey)
      |FROM customer
      |UNION ALL
      |SELECT 'r4_orders_custkey_fk', COUNT(*),
      |       COUNT(CASE WHEN c.c_custkey IS NULL THEN 1 END)
      |FROM orders o
      |LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
      |  ON o.o_custkey = c.c_custkey
      |UNION ALL
      |SELECT 'r5_lineitem_ship_after_order', COUNT(*),
      |       COUNT(CASE WHEN l.l_shipdate < o.o_orderdate THEN 1 END)
      |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
      |ORDER BY rule""".stripMargin

  override val queries: Map[String, Q] = Map(
    "q_spearman"    -> spearman,
    "q_chisq"       -> chisq,
    "q_ttest"       -> ttest,
    "q_mannwhitney" -> mannwhitney,
    "q_ks_test"     -> kstest,
    "q_auc_eval"    -> aucEval,
    "q_sample_pps"  -> samplePps,
    "q_dq_audit"    -> dqAudit,
  )

  override val oracles: Map[String, String] = Map(
    "q_spearman"    -> spearmanOracle,
    "q_chisq"       -> chisqOracle,
    "q_ttest"       -> ttestOracle,
    "q_mannwhitney" -> mannwhitneyOracle,
    "q_ks_test"     -> kstestOracle,
    "q_auc_eval"    -> aucEvalOracle,
    "q_sample_pps"  -> samplePpsOracle,
    "q_dq_audit"    -> dqAuditOracle,
  )
}
