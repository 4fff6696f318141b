package graft.plans

import graft.SparkSpec
import graft.functions.TextSim
import org.apache.spark.sql.functions._

/** GraftExtensions: SQL-name resolution of the native Expressions and
  * the FuseHofCosine optimizer rewrite. The shared test session is
  * built with the extensions (SparkTestBase), so these run against
  * the same wiring Verify/Bench use.
  */
class ExtensionsSpec extends SparkSpec {

  test("native expressions resolve by SQL name via injectFunction") {
    val r = spark.sql(
      """SELECT cosine_sim(CAST(array(3.0D, 4.0D) AS ARRAY<FLOAT>),
        |                  CAST(array(3.0D, 4.0D) AS ARRAY<FLOAT>)) AS c,
        |       jaccard_coeff(array('a','b'), array('b','c')) AS j,
        |       size(minhash_signature(array('a','b'), 8)) AS m,
        |       size(shingles(array('a','b','c'), 2)) AS sh,
        |       simhash64(array('x','y')) AS s""".stripMargin).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1) - 1.0 / 3.0) < 1e-12)
    assert(r.getInt(2) == 8)
    assert(r.getInt(3) == 2) // shingles: "a b", "b c"
    // simhash value is checked for determinism elsewhere; here just typed
    assert(!r.isNullAt(4))
  }

  test("FuseHofCosine rewrites the HOF cosine into the fused kernel") {
    val df = graft.Tables.embeddings(spark, sf)
    val probe = df.filter(col("vec_id") === 0).select(col("embedding").as("probe"))
    val hof = df.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(probe))
      .select(col("vec_id"),
        TextSim.cosine(col("embedding"), col("probe")).as("cos"))
    val optimized = hof.queryExecution.optimizedPlan.toString
    assert(optimized.contains("cosinesimilarity") || optimized.contains("CosineSimilarity"),
      s"HOF cosine not fused:\n$optimized")
    assert(!optimized.toLowerCase.contains("aggregate(zip_with"),
      s"HOF tree survived:\n$optimized")
    // results bit-identical to the explicitly-native formulation
    val native = df.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(probe))
      .select(col("vec_id"),
        graft.functions.CosineSimilarity.cosine_sim(col("embedding"), col("probe")).as("cos"))
    assert(hof.exceptAll(native).isEmpty && native.exceptAll(hof).isEmpty)
  }

  test("registered MV transparently answers an identical fresh query; others untouched") {
    val mvPath = java.nio.file.Files.createTempDirectory("graft_mv_spec_").toString + "/mv"
    def shape() = graft.Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority").as("pri"))
      .agg(count(lit(1)).as("n"), graft.Det.dsum(col("o_totalprice"), 2).as("total"))
    val expected = shape().orderBy("pri").collect().toSeq
    val fp = MaterializedViews.register(shape(), mvPath)
    try {
      // a FRESH construction of the same aggregate: the optimizer must
      // swap the Aggregate for the MV scan — no orders scan, no
      // aggregate left in the plan
      // (executedPlan: the simple logical string elides scan paths)
      val q = shape().orderBy("pri")
      val phys = q.queryExecution.executedPlan.toString
      assert(phys.contains("graft_mv_spec_"),
        s"MV scan missing from plan:\n$phys")
      assert(!phys.contains("orders.parquet"),
        s"fact-table scan survived the rewrite:\n$phys")
      assert(!q.queryExecution.optimizedPlan.toString.contains("Aggregate"),
        "aggregate should be gone — answered from the materialization")
      assert(q.collect().toSeq == expected)
      // a DIFFERENT aggregate over the same table must NOT be hijacked
      val other = graft.Tables.orders(spark, sf)
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      val otherPlan = other.queryExecution.executedPlan.toString
      assert(!otherPlan.contains("graft_mv_spec_"), otherPlan)
      assert(otherPlan.contains("orders.parquet"), otherPlan)
      // after deregistration the original plan returns
      MaterializedViews.deregister(fp)
      val back = shape().orderBy("pri")
      assert(!back.queryExecution.executedPlan.toString.contains("graft_mv_spec_"))
      assert(back.collect().toSeq == expected)
    } finally MaterializedViews.deregister(fp)
  }

  test("MV containment: key-filter and rollup queries answer from a wider view") {
    val mvPath = java.nio.file.Files.createTempDirectory("graft_mv_cont_").toString + "/mv"
    // double sums are addition-order dependent: re-aggregating the
    // view's partial sums legitimately differs from summing base rows
    // in the last ULPs, so value comparisons use a relative tolerance
    def approxEq(a: Seq[Seq[Any]], b: Seq[Seq[Any]]): Boolean =
      a.length == b.length && a.zip(b).forall { case (ra, rb) =>
        ra.length == rb.length && ra.zip(rb).forall {
          case (x: Double, y: Double) =>
            math.abs(x - y) <= 1e-9 * math.max(1.0, math.max(math.abs(x), math.abs(y)))
          case (x, y) => x == y
        }
      }
    // the WIDE view: grouped by (pri, status), storing count + sums
    def wide() = graft.Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority").as("pri"), col("o_orderstatus").as("st"))
      .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("total"),
        max(col("o_totalprice")).as("hi"))
    val fp = MaterializedViews.register(wide(), mvPath)
    try {
      // FILTER-ABOVE-VIEW: a WHERE on a group key rewrites to a
      // filtered view scan — no orders scan in the plan
      val filtered = graft.Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === "1-URGENT")
        .groupBy(col("o_orderpriority").as("pri"), col("o_orderstatus").as("st"))
        .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("total"),
          max(col("o_totalprice")).as("hi"))
      val fPlan = filtered.queryExecution.executedPlan.toString
      assert(fPlan.contains("graft_mv_cont_"), s"no MV in plan:\n${fPlan.take(800)}")
      assert(!fPlan.contains("orders.parquet"), fPlan.take(800))
      // values match the unrewritten computation
      MaterializedViews.clear()
      val expectF = graft.Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === "1-URGENT")
        .groupBy(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)), sum(col("o_totalprice")), max(col("o_totalprice")))
        .orderBy("o_orderstatus").collect().toSeq.map(_.toSeq)
      val fp2 = MaterializedViews.register(wide(), mvPath)
      assert(approxEq(filtered.orderBy("st").collect().toSeq.map(_.toSeq), expectF))

      // ROLLUP-ABOVE-VIEW: coarser grouping re-aggregates view rows
      val rollup = graft.Tables.orders(spark, sf)
        .groupBy(col("o_orderpriority").as("pri"))
        .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("total"),
          max(col("o_totalprice")).as("hi"))
      val rPlan = rollup.queryExecution.executedPlan.toString
      assert(rPlan.contains("graft_mv_cont_"), s"no MV in rollup plan:\n${rPlan.take(800)}")
      assert(!rPlan.contains("orders.parquet"), rPlan.take(800))
      MaterializedViews.clear()
      val expectR = graft.Tables.orders(spark, sf)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)), sum(col("o_totalprice")), max(col("o_totalprice")))
        .orderBy("o_orderpriority").collect().toSeq.map(_.toSeq)
      val fp3 = MaterializedViews.register(wide(), mvPath)
      assert(approxEq(rollup.orderBy("pri").collect().toSeq.map(_.toSeq), expectR))

      // GLOBAL rollup (no groups): COUNT comes back 0-safe via the
      // coalesced sum; values exact
      val global = graft.Tables.orders(spark, sf)
        .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("total"))
      val gPlan = global.queryExecution.executedPlan.toString
      assert(gPlan.contains("graft_mv_cont_"), gPlan.take(800))
      MaterializedViews.clear()
      val expectG = graft.Tables.orders(spark, sf)
        .agg(count(lit(1)), sum(col("o_totalprice"))).collect().toSeq.map(_.toSeq)
      MaterializedViews.register(wide(), mvPath)
      assert(approxEq(global.collect().toSeq.map(_.toSeq), expectG))

      // NON-REWRITABLE shapes refuse: an AVG (no decomposition
      // stored) and a MIN the view lacks both scan the fact table
      val avgQ = graft.Tables.orders(spark, sf)
        .groupBy(col("o_orderpriority"))
        .agg(avg(col("o_totalprice")).as("a"))
      assert(!avgQ.queryExecution.executedPlan.toString.contains("graft_mv_cont_"))
      val minQ = graft.Tables.orders(spark, sf)
        .groupBy(col("o_orderpriority"))
        .agg(min(col("o_totalprice")).as("lo"))
      assert(!minQ.queryExecution.executedPlan.toString.contains("graft_mv_cont_"))
      // a filter on a NON-key column refuses too
      val badFilter = graft.Tables.orders(spark, sf)
        .filter(col("o_totalprice") > 1000.0)
        .groupBy(col("o_orderpriority").as("pri"), col("o_orderstatus").as("st"))
        .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("total"),
          max(col("o_totalprice")).as("hi"))
      assert(!badFilter.queryExecution.executedPlan.toString.contains("graft_mv_cont_"))
    } finally MaterializedViews.clear()
  }

  test("MV grouping-expression containment: month rollup over a day view; non-key/non-det refuse") {
    val mvPath = java.nio.file.Files.createTempDirectory("graft_mv_gexpr_").toString + "/mv"
    // view grouped by the bare day key
    def wide() = graft.Tables.orders(spark, sf)
      .groupBy(col("o_orderdate").as("day"))
      .agg(count(lit(1)).as("n"), sum(col("o_custkey")).as("sc"),
        max(col("o_totalprice")).as("hi"))
    MaterializedViews.register(wide(), mvPath)
    try {
      // the calendar rollup: GROUP BY date_trunc('month', day) is an
      // expression over the view key — rewritten and re-aggregated
      val monthly = graft.Tables.orders(spark, sf)
        .groupBy(date_trunc("month", col("o_orderdate")).as("mon"))
        .agg(count(lit(1)).as("n"), sum(col("o_custkey")).as("sc"),
          max(col("o_totalprice")).as("hi"))
      val mPlan = monthly.queryExecution.executedPlan.toString
      assert(mPlan.contains("graft_mv_gexpr_"), s"no MV in plan:\n${mPlan.take(800)}")
      assert(!mPlan.contains("orders.parquet"), mPlan.take(800))
      MaterializedViews.clear()
      val expect = graft.Tables.orders(spark, sf)
        .groupBy(date_trunc("month", col("o_orderdate")).as("mon"))
        .agg(count(lit(1)), sum(col("o_custkey")), max(col("o_totalprice")))
        .orderBy("mon").collect().toSeq.map(_.toSeq)
      MaterializedViews.register(wide(), mvPath)
      assert(monthly.orderBy("mon").collect().toSeq.map(_.toSeq) == expect)
      // a second calendar grain from the SAME view (year) — the point
      // of the hierarchy: one day-grained view serves every rollup
      val yearly = graft.Tables.orders(spark, sf)
        .groupBy(year(col("o_orderdate")).as("yr"))
        .agg(count(lit(1)).as("n"))
      assert(yearly.queryExecution.executedPlan.toString.contains("graft_mv_gexpr_"))
      // an expression over a NON-key column refuses (the view never
      // grouped by custkey — rows with equal f(custkey) straddle view
      // rows in ways partial aggregates cannot reconstruct)
      val nonKey = graft.Tables.orders(spark, sf)
        .groupBy((col("o_custkey") % 7).as("b"))
        .agg(count(lit(1)).as("n"))
      assert(!nonKey.queryExecution.executedPlan.toString.contains("graft_mv_gexpr_"))
      // a NON-DETERMINISTIC grouping expression refuses: its
      // evaluation count would change (per base row → per view row)
      val nonDet = graft.Tables.orders(spark, sf)
        .groupBy(when(rand(7) < 2.0, col("o_orderdate")).as("g"))
        .agg(count(lit(1)).as("n"))
      assert(!nonDet.queryExecution.executedPlan.toString.contains("graft_mv_gexpr_"))

      // the SAME fallback on the JOIN containment path: star view by
      // (day, segment), query filtered to one segment and rolled up
      // to month — expression over a view key + key filter compose
      val jPath = java.nio.file.Files.createTempDirectory("graft_mv_gexprj_")
        .toString + "/mv"
      def joined = graft.Tables.orders(spark, sf).join(
        graft.Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      def jWide() = joined
        .groupBy(col("o_orderdate").as("day"), col("c_mktsegment").as("seg"))
        .agg(count(lit(1)).as("n"), sum(col("o_custkey")).as("sc"))
      MaterializedViews.register(jWide(), jPath)
      def jq() = joined.filter(col("c_mktsegment") === "BUILDING")
        .groupBy(date_trunc("month", col("o_orderdate")).as("mon"))
        .agg(count(lit(1)).as("n"), sum(col("o_custkey")).as("sc"))
      val jPlan = jq().queryExecution.executedPlan.toString
      assert(jPlan.contains("graft_mv_gexprj_"), s"join-path rollup missed:\n${jPlan.take(800)}")
      assert(!jPlan.contains("orders.parquet"), jPlan.take(800))
      MaterializedViews.clear()
      val jExpect = jq().orderBy("mon").collect().toSeq.map(_.toSeq)
      MaterializedViews.register(jWide(), jPath)
      assert(jq().orderBy("mon").collect().toSeq.map(_.toSeq) == jExpect)
    } finally MaterializedViews.clear()
  }

  test("MV grouping-expression containment composes with HAVING; mixed key/non-key refuses") {
    val mvPath = java.nio.file.Files.createTempDirectory("graft_mv_gexprh_").toString + "/mv"
    def wide() = graft.Tables.orders(spark, sf)
      .groupBy(col("o_orderdate").as("day"))
      .agg(count(lit(1)).as("n"), sum(col("o_custkey")).as("sc"))
    MaterializedViews.register(wide(), mvPath)
    try {
      // month rollup (expression over the view key) + HAVING on the
      // ROLLED-UP aggregate: the Filter sits above the rewritten
      // Aggregate and must keep filtering the re-aggregated values —
      // counts and integral sums are exact, so equality is exact
      def q() = graft.Tables.orders(spark, sf)
        .groupBy(date_trunc("month", col("o_orderdate")).as("mon"))
        .agg(count(lit(1)).as("n"), sum(col("o_custkey")).as("sc"))
        .filter(col("n") > 15)
      val plan = q().queryExecution.executedPlan.toString
      assert(plan.contains("graft_mv_gexprh_"), s"no MV in plan:\n${plan.take(800)}")
      assert(!plan.contains("orders.parquet"), plan.take(800))
      MaterializedViews.clear()
      val expect = q().orderBy("mon").collect().toSeq.map(_.toSeq)
      val allMonths = graft.Tables.orders(spark, sf)
        .groupBy(date_trunc("month", col("o_orderdate"))).count().count()
      assert(expect.nonEmpty, "HAVING threshold filtered everything — test is vacuous")
      assert(expect.size < allMonths, "HAVING threshold filtered nothing — test is vacuous")
      MaterializedViews.register(wide(), mvPath)
      assert(q().orderBy("mon").collect().toSeq.map(_.toSeq) == expect)
      // an expression over a MIXED key/non-key reference list refuses:
      // f(day, custkey) groups base rows across view rows (the view
      // never grouped by custkey), so partial aggregates cannot
      // reconstruct it
      val mixed = graft.Tables.orders(spark, sf)
        .groupBy(concat(col("o_orderdate").cast("string"),
          (col("o_custkey") % 7).cast("string")).as("g"))
        .agg(count(lit(1)).as("n"))
      assert(!mixed.queryExecution.executedPlan.toString.contains("graft_mv_gexprh_"),
        "mixed key/non-key grouping expression must not rewrite")
    } finally MaterializedViews.clear()
  }

  test("MV join containment: same join rewrites; different keys/filters/joins refuse") {
    val mvPath = java.nio.file.Files.createTempDirectory("graft_mv_join_").toString + "/mvj"
    def approxEq(a: Seq[Seq[Any]], b: Seq[Seq[Any]]): Boolean =
      a.length == b.length && a.zip(b).forall { case (ra, rb) =>
        ra.zip(rb).forall {
          case (x: Double, y: Double) =>
            math.abs(x - y) <= 1e-9 * math.max(1.0, math.max(math.abs(x), math.abs(y)))
          case (x, y) => x == y
        }
      }
    def joined = graft.Tables.orders(spark, sf).join(
      graft.Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
    def wide() = joined
      .groupBy(col("c_mktsegment").as("seg"), col("o_orderpriority").as("pri"))
      .agg(count(lit(1)).as("n"), sum(col("o_custkey")).as("s"),
        count(col("o_custkey")).as("c"), max(col("o_totalprice")).as("hi"))
    val fp = MaterializedViews.register(wide(), mvPath)
    try {
      // the classic shape: same join, filtered on a view group key,
      // rolled up coarser — answered from the view, base tables gone
      def q() = joined.filter(col("c_mktsegment") === "BUILDING")
        .groupBy(col("o_orderpriority").as("pri"))
        .agg(count(lit(1)).as("n"), max(col("o_totalprice")).as("hi"))
      val plan = q().queryExecution.executedPlan.toString
      assert(plan.contains("graft_mv_join_"), s"join containment did not fire:\n${plan.take(900)}")
      assert(!plan.contains("orders.parquet") && !plan.contains("customer.parquet"),
        plan.take(900))
      // AVG decomposes from the view's sum+count of the same operand
      def qa() = joined.groupBy(col("c_mktsegment").as("seg"))
        .agg(avg(col("o_custkey")).as("a"))
      assert(qa().queryExecution.executedPlan.toString.contains("graft_mv_join_"))
      // values match the unrewritten computations
      MaterializedViews.clear()
      val expect = q().orderBy("pri").collect().toSeq.map(_.toSeq)
      val expectA = qa().orderBy("seg").collect().toSeq.map(_.toSeq)
      MaterializedViews.register(wide(), mvPath)
      assert(approxEq(q().orderBy("pri").collect().toSeq.map(_.toSeq), expect))
      assert(approxEq(qa().orderBy("seg").collect().toSeq.map(_.toSeq), expectA))

      // DIFFERENT join keys must NOT rewrite (the conjunct sets differ)
      val wrongKeys = graft.Tables.orders(spark, sf).join(
        graft.Tables.customer(spark, sf), col("o_custkey") === col("c_nationkey"))
        .groupBy(col("o_orderpriority").as("pri"))
        .agg(count(lit(1)).as("n"), max(col("o_totalprice")).as("hi"))
      assert(!wrongKeys.queryExecution.executedPlan.toString.contains("graft_mv_join_"))
      // a filter on a NON-group-key column must NOT rewrite
      val badFilter = joined.filter(col("o_totalprice") > 1000.0)
        .groupBy(col("o_orderpriority").as("pri"))
        .agg(count(lit(1)).as("n"), max(col("o_totalprice")).as("hi"))
      assert(!badFilter.queryExecution.executedPlan.toString.contains("graft_mv_join_"))
      // a different JOIN TYPE must NOT rewrite (inner-only containment)
      val leftJoin = graft.Tables.orders(spark, sf).join(
        graft.Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"), "left")
        .groupBy(col("o_orderpriority").as("pri"))
        .agg(count(lit(1)).as("n"), max(col("o_totalprice")).as("hi"))
      assert(!leftJoin.queryExecution.executedPlan.toString.contains("graft_mv_join_"))
      // an aggregate the view did not store must NOT rewrite
      val missingAgg = joined.groupBy(col("o_orderpriority").as("pri"))
        .agg(min(col("o_totalprice")).as("lo"))
      assert(!missingAgg.queryExecution.executedPlan.toString.contains("graft_mv_join_"))
    } finally MaterializedViews.clear()
  }

  test("MV star containment: N-ary join rewrites order-independently; self-joins refuse") {
    val mvPath = java.nio.file.Files.createTempDirectory("graft_mv_star_").toString + "/mvs"
    def star = graft.Tables.orders(spark, sf)
      .join(graft.Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .join(graft.Tables.nation(spark, sf), col("c_nationkey") === col("n_nationkey"))
    def wide() = star
      .groupBy(col("n_name").as("nat"), col("c_mktsegment").as("seg"),
        col("o_orderpriority").as("pri"))
      .agg(count(lit(1)).as("n"), max(col("o_totalprice")).as("hi"))
    val fp = MaterializedViews.register(wide(), mvPath)
    try {
      def q() = star.filter(col("n_name") === "NATION_12")
        .groupBy(col("o_orderpriority").as("pri"))
        .agg(count(lit(1)).as("n"), max(col("o_totalprice")).as("hi"))
      val plan = q().queryExecution.executedPlan.toString
      assert(plan.contains("graft_mv_star_"), s"star containment did not fire:\n${plan.take(900)}")
      assert(!plan.contains("orders.parquet") && !plan.contains("nation.parquet"),
        plan.take(900))
      // a DIFFERENT user-written join order flattens to the same
      // canonical base sequence — still answered from the view
      val permuted = graft.Tables.nation(spark, sf)
        .join(graft.Tables.customer(spark, sf), col("c_nationkey") === col("n_nationkey"))
        .join(graft.Tables.orders(spark, sf), col("o_custkey") === col("c_custkey"))
        .filter(col("n_name") === "NATION_12")
        .groupBy(col("o_orderpriority").as("pri"))
        .agg(count(lit(1)).as("n"), max(col("o_totalprice")).as("hi"))
      assert(permuted.queryExecution.executedPlan.toString.contains("graft_mv_star_"),
        "permuted join order did not canonicalize to the view's ordinal space")
      // values match the unrewritten computation
      MaterializedViews.clear()
      val expect = q().orderBy("pri").collect().toSeq.map(_.toSeq)
      MaterializedViews.register(wide(), mvPath)
      assert(q().orderBy("pri").collect().toSeq.map(_.toSeq) == expect)
      // a 2-way sub-join of the star must NOT rewrite (base sets differ)
      val subJoin = graft.Tables.orders(spark, sf)
        .join(graft.Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderpriority").as("pri"))
        .agg(count(lit(1)).as("n"), max(col("o_totalprice")).as("hi"))
      assert(!subJoin.queryExecution.executedPlan.toString.contains("graft_mv_star_"))
    } finally MaterializedViews.clear()

    // SELF-JOINS refuse at registration and lookup: identical leaf
    // renders make the concatenated ordinal space ambiguous
    val selfPath = java.nio.file.Files.createTempDirectory("graft_mv_self_").toString + "/self"
    val o1 = graft.Tables.orders(spark, sf)
    val o2 = graft.Tables.orders(spark, sf).select(
      col("o_orderkey").as("k2"), col("o_orderpriority").as("pri2"))
    val selfAgg = o1.join(o2, col("o_orderkey") === col("k2"))
      .groupBy(col("o_orderpriority").as("pri")).agg(count(lit(1)).as("n"))
    MaterializedViews.register(selfAgg, selfPath)
    try {
      val qSelf = o1.join(o2, col("o_orderkey") === col("k2"))
        .filter(col("o_orderpriority") === "2-HIGH")
        .groupBy(col("o_orderpriority").as("pri")).agg(count(lit(1)).as("n"))
      assert(!qSelf.queryExecution.executedPlan.toString.contains("graft_mv_self_"),
        "ambiguous self-join must not be answered via containment")
    } finally MaterializedViews.clear()
  }

  test("MV AVG containment on a single relation decomposes into stored SUM/COUNT partials") {
    val mvPath = java.nio.file.Files.createTempDirectory("graft_mv_avg_").toString + "/mva"
    def wide() = graft.Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority").as("pri"), col("o_orderstatus").as("st"))
      .agg(sum(col("o_custkey")).as("s"), count(col("o_custkey")).as("c"))
    MaterializedViews.register(wide(), mvPath)
    try {
      def q() = graft.Tables.orders(spark, sf)
        .groupBy(col("o_orderpriority").as("pri"))
        .agg(avg(col("o_custkey")).as("a"))
      val plan = q().queryExecution.executedPlan.toString
      assert(plan.contains("graft_mv_avg_"), s"AVG containment did not fire:\n${plan.take(800)}")
      assert(!plan.contains("orders.parquet"), plan.take(800))
      MaterializedViews.clear()
      val expect = q().orderBy("pri").collect().toSeq
      MaterializedViews.register(wide(), mvPath)
      // integral sums are exact in double: values are bit-identical
      assert(q().orderBy("pri").collect().toSeq == expect)
      // DISTINCT AVG must not rewrite (no decomposition exists)
      val distinctAvg = graft.Tables.orders(spark, sf)
        .groupBy(col("o_orderpriority").as("pri"))
        .agg(expr("avg(DISTINCT o_custkey)").as("a"))
      assert(!distinctAvg.queryExecution.executedPlan.toString.contains("graft_mv_avg_"))
    } finally MaterializedViews.clear()
  }

  test("re-registering an MV refreshes from BASE data, not from the stale materialization") {
    import spark.implicits._
    // regression: the refresh write must run with rewriting disabled,
    // else the recompute is answered from the OLD materialization and
    // the refresh silently copies stale bytes forward forever
    val baseDir = java.nio.file.Files.createTempDirectory("graft_mv_refresh_").toString
    val basePath = s"$baseDir/base"
    val mvBase = s"$baseDir/mv"
    Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v").write.parquet(basePath)
    def shape() = spark.read.parquet(basePath)
      .groupBy(lit(1).as("g")).agg(graft.Det.dsum(col("v"), 2).as("total"))
    val fp1 = MaterializedViews.register(shape(), mvBase)
    try {
      assert(shape().head().getDouble(1) == 30.0)
      // base data changes; the OLD materialization still answers
      Seq((3L, 70.0)).toDF("k", "v").write.mode("append").parquet(basePath)
      // refresh: same fingerprint, recomputed materialization
      val fp2 = MaterializedViews.register(shape(), mvBase)
      assert(fp2 == fp1, "same query must fingerprint identically")
      assert(shape().head().getDouble(1) == 100.0,
        "refresh must recompute from base data, not copy the stale MV")
    } finally MaterializedViews.deregister(fp1)
  }

  test("a DSL-registered MV answers the equivalent SQL-string query (fingerprints converge)") {
    // the registry keys on the CANONICALIZED optimized plan, which
    // normalizes exprIds and alias names — so the same aggregate
    // reached through the SQL parser and through the DataFrame DSL
    // collapses to one fingerprint, and either surface's users hit
    // the materialization
    val mvPath = java.nio.file.Files.createTempDirectory("graft_mv_sql_").toString + "/mv"
    val dsl = graft.Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority").as("pri"))
      .agg(count(lit(1)).as("n"))
    val fp = MaterializedViews.register(dsl, mvPath)
    try {
      val v = graft.Tables.view(spark, sf, "orders")
      val sqlQ = spark.sql(
        s"SELECT o_orderpriority AS pri, COUNT(*) AS n FROM $v GROUP BY pri ORDER BY pri")
      val phys = sqlQ.queryExecution.executedPlan.toString
      assert(phys.contains("graft_mv_sql_"),
        s"SQL-surface query missed the DSL-registered MV:\n$phys")
      assert(sqlQ.collect().toSeq == dsl.orderBy("pri").collect().toSeq)
    } finally MaterializedViews.deregister(fp)
  }

  test("wide aggregates differing past the 25-field toString cutoff fingerprint distinctly") {
    // regression: the old fingerprint was canonicalized.toString, which
    // truncates expression lists at spark.sql.debug.maxToStringFields
    // (default 25) — two wide aggregates identical in their first 25
    // expressions but different beyond collided, and the second was
    // silently answered from the FIRST's materialization
    val mvPath = java.nio.file.Files.createTempDirectory("graft_mv_wide_").toString + "/mv"
    def wide(lastAgg: org.apache.spark.sql.Column) =
      graft.Tables.orders(spark, sf)
        .groupBy(col("o_orderpriority").as("pri"))
        .agg(count(lit(1)).as("c0"),
          (1 to 28).map(i => sum(col("o_orderkey") + lit(i)).as(s"c$i")) :+
            lastAgg.as("c29"): _*)
    val fp = MaterializedViews.register(wide(sum(col("o_orderkey") * 2)), mvPath)
    try {
      // identical prefix, different 30th aggregate: must NOT hit the MV
      val other = wide(sum(col("o_orderkey") * 3))
      val phys = other.queryExecution.executedPlan.toString
      assert(!phys.contains("graft_mv_wide_"),
        s"distinct wide aggregate answered from the wrong MV:\n$phys")
      // the registered shape itself still rewrites, and its MV-served
      // rows equal the direct recompute after deregistration
      val same = wide(sum(col("o_orderkey") * 2))
      assert(same.queryExecution.executedPlan.toString.contains("graft_mv_wide_"))
      val served = same.orderBy("pri").collect().toSeq
      MaterializedViews.deregister(fp)
      assert(wide(sum(col("o_orderkey") * 2)).orderBy("pri").collect().toSeq == served)
    } finally MaterializedViews.deregister(fp)
  }

  test("FuseHofCosine does not fire on double arrays (kernel is float-only)") {
    // Same HOF shape over ARRAY<DOUBLE>: the fused kernel reads via
    // getFloat, so the rule must leave the HOF tree alone — and the
    // un-rewritten HOF must still compute the right value.
    val df = spark.sql("SELECT array(3.0D, 4.0D) AS a, array(4.0D, 3.0D) AS b")
      .select(TextSim.cosine(col("a"), col("b")).as("cos"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.toLowerCase.contains("cosinesimilarity"),
      s"rule fired on ARRAY<DOUBLE>:\n$optimized")
    assert(math.abs(df.head().getDouble(0) - 24.0 / 25.0) < 1e-12)
  }

  test("FuseHofCosine leaves a bare dot product untouched") {
    val df = graft.Tables.embeddings(spark, sf).limit(5)
      .select(TextSim.dot(col("embedding"), col("embedding")).as("d"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.toLowerCase.contains("cosinesimilarity"), optimized)
    assert(df.collect().forall(_.getDouble(0) > 0))
  }

  test("durable MV registry: a rebuilt session rewrites against a prior session's materializations") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mv_durable_").toString
    def wide() = graft.Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority").as("pri"), col("o_orderstatus").as("st"))
      .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("total"))
    def rollup() = graft.Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority").as("pri"))
      .agg(count(lit(1)).as("n"))
    val expectWide = wide().orderBy("pri", "st").collect().toSeq
    val expectRoll = rollup().orderBy("pri").collect().toSeq
    try {
      // SESSION 1: the catalog root carries the registry; register
      MaterializedViews.attachDurableRegistry(dir)
      MaterializedViews.register(wide(), s"$dir/mv")
      // "PROCESS DEATH": wipe every in-memory map — the only state a
      // brand-new JVM would not have. The rewrite goes cold.
      MaterializedViews.resetMemoryForTest()
      val cold = wide().queryExecution.executedPlan.toString
      assert(!cold.contains("graft_mv_durable_"), "stale in-memory state survived reset")
      // SESSION 2: initializing a GraftCatalog with mvRegistry=true on
      // the same root transparently reloads the registry
      spark.conf.set("spark.sql.catalog.mvdur",
        classOf[graft.tables.GraftCatalog].getName)
      spark.conf.set("spark.sql.catalog.mvdur.root", dir)
      spark.conf.set("spark.sql.catalog.mvdur.mvRegistry", "true")
      spark.sql("SHOW TABLES IN mvdur").collect() // forces catalog init
      // exact-match rewrite fires from the reloaded registry
      val hot = wide()
      val hPlan = hot.queryExecution.executedPlan.toString
      assert(hPlan.contains("graft_mv_durable_") && !hPlan.contains("orders.parquet"),
        s"reloaded registry did not fire:\n${hPlan.take(800)}")
      assert(hot.orderBy("pri", "st").collect().toSeq == expectWide)
      // containment shapes reloaded too: the COUNT rollup answers
      // from the view (counts re-aggregate exactly — no double sums)
      val roll = rollup()
      val rPlan = roll.queryExecution.executedPlan.toString
      assert(rPlan.contains("graft_mv_durable_") && !rPlan.contains("orders.parquet"),
        s"reloaded shape did not fire:\n${rPlan.take(800)}")
      assert(roll.orderBy("pri").collect().toSeq == expectRoll)
    } finally {
      MaterializedViews.detachDurableRegistry()
      MaterializedViews.clear()
      spark.conf.unset("spark.sql.catalog.mvdur")
      graft.tables.SnapshotTable.deleteRecursively(java.nio.file.Paths.get(dir))
    }
  }

  test("durable MV registry: deregistration is durable; concurrent sessions' entries merge") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mv_dur2_").toString
    def viewA() = graft.Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority").as("pri")).agg(count(lit(1)).as("n"))
    def viewB() = graft.Tables.orders(spark, sf)
      .groupBy(col("o_orderstatus").as("st")).agg(count(lit(1)).as("n"))
    try {
      // session 1 registers A and then DEREGISTERS it — the tombstone
      // must survive the write-through merge, so a later session does
      // not resurrect A from the file
      MaterializedViews.attachDurableRegistry(dir)
      val fpA = MaterializedViews.register(viewA(), s"$dir/a")
      MaterializedViews.deregister(fpA)
      MaterializedViews.resetMemoryForTest()
      MaterializedViews.attachDurableRegistry(dir)
      assert(!viewA().queryExecution.executedPlan.toString.contains("graft_mv_dur2_"),
        "deregistered view resurrected from the durable file")
      // "concurrent" session 2 (same file, fresh memory) registers B;
      // session 3 then sees BOTH its own state and survivors — and
      // after session 1's deregistration, only B
      MaterializedViews.register(viewB(), s"$dir/b")
      MaterializedViews.resetMemoryForTest()
      MaterializedViews.attachDurableRegistry(dir)
      assert(viewB().queryExecution.executedPlan.toString.contains("graft_mv_dur2_"),
        "merged entry lost")
      assert(!viewA().queryExecution.executedPlan.toString.contains("graft_mv_dur2_"))
    } finally {
      MaterializedViews.detachDurableRegistry()
      MaterializedViews.clear()
      graft.tables.SnapshotTable.deleteRecursively(java.nio.file.Paths.get(dir))
    }
  }

  test("durable MV registry: a persisted DEAD tombstone stops a still-attached session from resurrecting the entry") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mv_dead_").toString
    def viewA() = graft.Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority").as("pri")).agg(count(lit(1)).as("n"))
    def viewB() = graft.Tables.orders(spark, sf)
      .groupBy(col("o_orderstatus").as("st")).agg(count(lit(1)).as("n"))
    def b64(x: String) = java.util.Base64.getEncoder.encodeToString(x.getBytes("UTF-8"))
    val reg = java.nio.file.Paths.get(dir, "_mv_registry")
    try {
      MaterializedViews.attachDurableRegistry(dir)
      val fpA = MaterializedViews.register(viewA(), s"$dir/a")
      assert(new String(java.nio.file.Files.readAllBytes(reg), "UTF-8")
        .contains(s"ENTRY ${b64(fpA)}"))
      // ANOTHER PROCESS deregisters A: its persist leaves a DEAD
      // tombstone line in the file (simulated by editing the file the
      // way that process's persist() would have written it)
      val edited = new String(java.nio.file.Files.readAllBytes(reg), "UTF-8")
        .linesIterator.filterNot(_.startsWith(s"ENTRY ${b64(fpA)}"))
        .mkString("", "\n", "\n") + s"DEAD ${b64(fpA)}\n"
      java.nio.file.Files.write(reg, edited.getBytes("UTF-8"))
      // THIS session still holds fpA in memory; its next persist
      // (triggered by registering B) must ADOPT the tombstone, not
      // write the dead fingerprint back
      MaterializedViews.register(viewB(), s"$dir/b")
      val after = new String(java.nio.file.Files.readAllBytes(reg), "UTF-8")
      assert(!after.contains(s"ENTRY ${b64(fpA)}"),
        "still-attached session resurrected a tombstoned entry")
      assert(after.contains(s"DEAD ${b64(fpA)}"), "tombstone dropped")
      assert(!viewA().queryExecution.executedPlan.toString.contains("graft_mv_dead_"),
        "in-memory rewrite survived an adopted tombstone")
      // RE-REGISTER outranks the tombstone: the fresh registration
      // persists as an ENTRY and the DEAD line is cleared
      MaterializedViews.register(viewA(), s"$dir/a2")
      val reborn = new String(java.nio.file.Files.readAllBytes(reg), "UTF-8")
      assert(reborn.contains(s"ENTRY ${b64(fpA)}"), "re-registration lost")
      assert(!reborn.contains(s"DEAD ${b64(fpA)}"), "stale tombstone kept")
      assert(viewA().queryExecution.executedPlan.toString.contains("graft_mv_dead_"))
    } finally {
      MaterializedViews.detachDurableRegistry()
      MaterializedViews.clear()
      graft.tables.SnapshotTable.deleteRecursively(java.nio.file.Paths.get(dir))
    }
  }

  test("durable MV registry: a deregistering session cannot destroy another session's later re-registration") {
    // the r16 review's failure case: A deregisters V (tombstone
    // persisted), B re-registers V (clears the DEAD line, writes
    // ENTRY). A's NEXT persist must adopt B's fresh ENTRY — not skip
    // it through a stale in-memory tombstone and re-emit DEAD.
    val dir = java.nio.file.Files.createTempDirectory("graft_mv_regain_").toString
    def viewA() = graft.Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority").as("pri")).agg(count(lit(1)).as("n"))
    def viewB() = graft.Tables.orders(spark, sf)
      .groupBy(col("o_orderstatus").as("st")).agg(count(lit(1)).as("n"))
    def b64(x: String) = java.util.Base64.getEncoder.encodeToString(x.getBytes("UTF-8"))
    val reg = java.nio.file.Paths.get(dir, "_mv_registry")
    try {
      MaterializedViews.attachDurableRegistry(dir)
      val fpA = MaterializedViews.register(viewA(), s"$dir/a")
      MaterializedViews.deregister(fpA) // session A: tombstone persisted
      // session B re-registers V: simulate its completed persist —
      // DEAD line gone, fresh ENTRY present (at a path that exists)
      val bPath = java.nio.file.Files.createTempDirectory("graft_mv_bmat_").toString
      val edited = new String(java.nio.file.Files.readAllBytes(reg), "UTF-8")
        .linesIterator.filterNot(_.startsWith(s"DEAD ${b64(fpA)}"))
        .mkString("", "\n", "\n") + s"ENTRY ${b64(fpA)} ${b64(bPath)}\n"
      java.nio.file.Files.write(reg, edited.getBytes("UTF-8"))
      // session A mutates again: its persist must ADOPT B's entry
      MaterializedViews.register(viewB(), s"$dir/b")
      val after = new String(java.nio.file.Files.readAllBytes(reg), "UTF-8")
      assert(after.contains(s"ENTRY ${b64(fpA)}"),
        "stale in-memory tombstone destroyed a re-registration")
      assert(!after.contains(s"DEAD ${b64(fpA)}"), "tombstone resurrected")
      graft.tables.SnapshotTable.deleteRecursively(java.nio.file.Paths.get(bPath))
    } finally {
      MaterializedViews.detachDurableRegistry()
      MaterializedViews.clear()
      graft.tables.SnapshotTable.deleteRecursively(java.nio.file.Paths.get(dir))
    }
  }

  test("durable MV registry: persist holds an OS file lock and merges writes that land before it") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mv_lock_").toString
    def viewA() = graft.Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority").as("pri")).agg(count(lit(1)).as("n"))
    def b64(x: String) = java.util.Base64.getEncoder.encodeToString(x.getBytes("UTF-8"))
    val reg = java.nio.file.Paths.get(dir, "_mv_registry")
    val lck = java.nio.file.Paths.get(dir, "_mv_registry.lck")
    // a foreign materialization dir that EXISTS (the merge skips
    // entries whose paths are gone)
    val foreignPath = java.nio.file.Files.createTempDirectory("graft_mv_foreign_").toString
    val foreignFp = "foreign-session-fingerprint"
    @volatile var sawLocked = false
    try {
      MaterializedViews.attachDurableRegistry(dir)
      MaterializedViews.persistRaceHook = () => {
        // 1) the .lck is HELD for the whole read-merge-write: a second
        //    locker (what another process's persist would do first)
        //    cannot enter the critical section
        val ch2 = java.nio.channels.FileChannel.open(lck,
          java.nio.file.StandardOpenOption.WRITE)
        try intercept[java.nio.channels.OverlappingFileLockException](ch2.tryLock())
        finally ch2.close()
        sawLocked = true
        // 2) an interleaved write that COMPLETED before we locked (the
        //    r15 lost-update window): the merge must pick it up
        val prev = if (java.nio.file.Files.exists(reg))
          new String(java.nio.file.Files.readAllBytes(reg), "UTF-8") else ""
        java.nio.file.Files.write(reg,
          (prev + s"ENTRY ${b64(foreignFp)} ${b64(foreignPath)}\n").getBytes("UTF-8"))
      }
      MaterializedViews.register(viewA(), s"$dir/a") // triggers persist
      assert(sawLocked, "race hook never ran inside the lock")
      val after = new String(java.nio.file.Files.readAllBytes(reg), "UTF-8")
      assert(after.contains(s"ENTRY ${b64(foreignFp)}"),
        "interleaved foreign registration was last-writer-wins dropped")
      assert(after.contains("ENTRY "), after)
    } finally {
      MaterializedViews.persistRaceHook = () => ()
      MaterializedViews.detachDurableRegistry()
      MaterializedViews.clear()
      graft.tables.SnapshotTable.deleteRecursively(java.nio.file.Paths.get(dir))
      graft.tables.SnapshotTable.deleteRecursively(java.nio.file.Paths.get(foreignPath))
    }
  }

  test("durable MV registry: re-attaching a different root while attached refuses loudly") {
    val dir1 = java.nio.file.Files.createTempDirectory("graft_mv_att1_").toString
    val dir2 = java.nio.file.Files.createTempDirectory("graft_mv_att2_").toString
    try {
      MaterializedViews.attachDurableRegistry(dir1)
      MaterializedViews.attachDurableRegistry(dir1) // same root: idempotent refresh
      val e = intercept[IllegalStateException](
        MaterializedViews.attachDurableRegistry(dir2))
      assert(e.getMessage.contains("detachDurableRegistry"), e.getMessage)
      MaterializedViews.detachDurableRegistry()
      MaterializedViews.attachDurableRegistry(dir2) // explicit detach unblocks
    } finally {
      MaterializedViews.detachDurableRegistry()
      MaterializedViews.clear()
      graft.tables.SnapshotTable.deleteRecursively(java.nio.file.Paths.get(dir1))
      graft.tables.SnapshotTable.deleteRecursively(java.nio.file.Paths.get(dir2))
    }
  }
}
