package graft.ops

import graft.SparkSpec

/** Plan-shape regression guards for the properties PLANS.md records —
  * each was load-bearing for correctness-at-scale or a measured
  * performance fix, and each could silently regress under a Spark
  * upgrade or an innocent-looking query edit.
  */
class PlanShapeSpec extends SparkSpec {

  private def plan(q: String): String =
    graft.SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString

  test("q_filter_pred pushes predicates into the parquet scan") {
    val p = plan("q_filter_pred")
    // the WHOLE disjunction is pushed as one Or tree (plan string
    // truncates the tail, so match the head)
    assert(p.contains("PushedFilters: [Or(And("), p)
  }

  test("q_scan_project prunes the scan to referenced columns") {
    val p = plan("q_scan_project")
    // 4 of lineitem's columns referenced; the full table has 16
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int," +
      "l_extendedprice:double,l_discount:double>"), p)
  }

  test("q_sim_search_native scans without a data shuffle") {
    val p = plan("q_sim_search_native")
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q_dedup_ngram candidates join on prefix TOKENS, never a bare block key") {
    // the scale contract of the prefix-filter rewrite: every join in
    // the pair path is either token-keyed (candidate generation) or
    // doc_id-keyed (rescore); a join whose only equality keys are
    // (lang, source) is the quadratic block cartesian this replaced
    val p = plan("q_dedup_ngram")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    val joinKeys = p.linesIterator.filter(l =>
      l.contains("Join") && (l.contains("lang") || l.contains("source"))).toSeq
    assert(joinKeys.forall(_.contains("tok")),
      s"found a (lang, source) join without the prefix-token key:\n${joinKeys.mkString("\n")}")
  }

  test("q_dedup_edit rescores only candidate pairs (doc_id-keyed joins)") {
    val p = plan("q_dedup_edit")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the Levenshtein DP must sit above the candidate join, filtering
    // pairs, not inside a block-cartesian condition
    assert(p.contains("levenshtein"), p)
  }

  test("q_agg_group plans partial-then-final hash aggregation") {
    val p = plan("q_agg_group")
    assert(p.split("HashAggregate").length >= 3, p) // partial + final
  }

  test("q_join_skew shuffles on the SALTED key, not the raw key") {
    val p = plan("q_join_skew")
    // the pre-join exchange must hash on (k, salt): the salt column
    // appearing in the partitioning is the whole point of the pattern
    val exch = p.linesIterator
      .filter(l => l.contains("Exchange hashpartitioning"))
      .filter(l => l.contains("salt")).toSeq
    assert(exch.nonEmpty, s"no salted exchange found:\n$p")
    // and it is a shuffled hash join (the dim is modeled too big to
    // broadcast; a broadcast join would make the demo vacuous)
    assert(p.contains("ShuffledHashJoin"), p)
  }

  test("q_decontaminate broadcasts the benchmark shingle set") {
    val p = plan("q_decontaminate")
    // the corpus side must stream through a broadcast hash join — a
    // sort-merge join would shuffle the exploded corpus by shingle
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q_pack_seq prefix sum windows the full data by bucket, not globally") {
    val p = plan("q_pack_seq")
    // the running sum over the documents table must shuffle by the
    // derived bucket id; the only no-partition windows left are over
    // the P-row offset table. (A naive global running sum would have
    // no hashpartitioned window at all.)
    assert(p.contains("hashpartitioning(__pid"), p)
    val fullDataWindow = p.linesIterator.exists(l =>
      l.contains("Window") && l.contains("windowspecdefinition(doc_id"))
    assert(!fullDataWindow, s"full-data global window found:\n$p")
  }

  test("q_sim_ann_indexed prunes index partitions via dynamic pruning") {
    val p = plan("q_sim_ann_indexed")
    // the probe's bucket must reach the scan as a partition filter
    // (dynamicpruning subquery on the bucket partition column), so
    // only the probe's bucket directory is read
    assert(p.contains("PartitionFilters") && p.contains("dynamicpruning"),
      s"expected dynamic partition pruning on the index scan:\n$p")
  }

  test("q_sim_ann_indexed_multiprobe prunes index partitions for the probed bucket SET") {
    // the multi-probe generalization of the DPP guard: the ≤4-row
    // probed-bucket relation must reach the index scan as a partition
    // filter (dynamic pruning on the bucket partition column), so the
    // search reads T bucket directories, never the whole index
    val p = plan("q_sim_ann_indexed_multiprobe")
    assert(p.contains("PartitionFilters") && p.contains("dynamicpruning"),
      s"expected dynamic partition pruning on the multi-probe index scan:\n$p")
  }

  test("q_bm25 broadcasts idf/stats and never sort-merge-joins the corpus") {
    val p = plan("q_bm25")
    // the term filter must precede the (doc, term) shuffle: the only
    // joins are broadcasts of the |terms|-row idf and 1-row stats
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"),
      s"corpus-side sort-merge join in BM25 plan:\n$p")
  }

  test("q_dsir_sample broadcasts vocab buckets and lnr ratios — no corpus-side SMJ") {
    val p = plan("q_dsir_sample")
    // token→bucket map (vocabulary-sized) and the 256-row lnr table
    // must come back as broadcasts; the occurrence stream shuffles
    // only for the per-doc aggregate
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"),
      s"corpus-side sort-merge join in DSIR plan:\n$p")
  }

  test("q_query_expand gates the corpus df pass on broadcast candidate terms") {
    val p = plan("q_query_expand")
    // candidate-term semi-join must be a broadcast (the BM25
    // discipline: the filter precedes the term shuffle)
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
    assert(!p.contains("SortMergeJoin"),
      s"corpus-side sort-merge join in RM3 plan:\n$p")
  }

  test("q_sql_tpch6 pushes every predicate into the lineitem scan") {
    // formatted mode shows the full filter list (the simple plan
    // string truncates it)
    val p = graft.SparkEntry.queries("q_sql_tpch6")(spark, sf)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("GreaterThanOrEqual(l_shipdate")
      && p.contains("LessThan(l_shipdate")
      && p.contains("GreaterThanOrEqual(l_discount,0.03)")
      && p.contains("LessThanOrEqual(l_discount,0.07)")
      && p.contains("LessThan(l_quantity,25.0)"), p)
    assert(p.contains("ReadSchema: struct<l_quantity:double," +
      "l_extendedprice:double,l_discount:double,l_shipdate:timestamp_ntz>"), p)
  }

  test("q_pipeline_train windows per-shard or per-doc, never globally") {
    val p = plan("q_pipeline_train")
    // every window must be key-partitioned: per-shard (final ordering)
    // or per-document (the prefix-filter rank) — an unpartitioned
    // window serializes the corpus through one task
    val globalWindow = p.linesIterator.exists(l =>
      l.contains("windowspecdefinition")
        && !l.contains("shard") && !l.contains("doc_id#"))
    assert(!globalWindow, s"global (non-shard) window in capstone plan:\n$p")
    assert(p.contains("LeftAnti"), "cluster-member pruning join missing")
  }

  test("q_chunk generates chunks without any shuffle before the sort") {
    val p = plan("q_chunk")
    // generator + projection only; the single exchange is the final
    // presentation ORDER BY
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges == 1, s"expected only the output-sort exchange:\n$p")
  }

  test("q_heavy_hitters recount pass joins via broadcast, sketch aggregates partially") {
    val p = plan("q_heavy_hitters")
    assert(p.contains("BroadcastHashJoin"), s"candidate join must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no sort-merge anywhere — the corpus never shuffles on the token key:\n$p")
    // the MG sketch is a typed Aggregator → partial/final ObjectHashAggregate
    assert(p.contains("ObjectHashAggregate"), s"sketch must aggregate partially:\n$p")
  }

  test("1-row stats cross joins replicate via BroadcastNestedLoopJoin, explicitly") {
    // every bounds/corpus-stats cross join wraps its 1-row side in
    // broadcast() so the plan never depends on autoBroadcastJoinThreshold
    for (q <- Seq("q_histogram", "q_bm25", "q_tfidf", "q_cooccur")) {
      val p = plan(q)
      assert(p.contains("BroadcastNestedLoopJoin"), s"$q plan:\n$p")
    }
  }

  test("q_dedup_semantic pair join shuffles on the cluster key") {
    // with k ≈ √n the cluster-key cardinality grows with the data, so
    // the shuffled hash join has data-proportional parallelism (a
    // broadcast of the n-row table would be the wrong fix at scale)
    val p = plan("q_dedup_semantic")
    assert(p.contains("ShuffledHashJoin"), p)
  }

  test("q_winsorize builds percentiles from counts, never buffering a group") {
    // the old plan's percentile_disc held EVERY value of a returnflag
    // group in one aggregation buffer — at 100 TB that is billions of
    // doubles in a single task. The rewrite aggregates per-value
    // counts and rank-selects via the distributed prefix sum, so no
    // percentile aggregate (and no whole-group buffering) may appear
    // anywhere in the plan.
    val p = plan("q_winsorize")
    assert(!p.toLowerCase.contains("percentile"),
      s"percentile aggregate (per-group value buffering) back in plan:\n$p")
    // the prefix-sum phase must window by (key, bucket), the
    // scale-safe shape
    assert(p.contains("hashpartitioning(l_returnflag") && p.contains("__pid"),
      s"expected keyed prefix-sum bucketing in plan:\n$p")
  }

  test("q_dedup_span is linear: keyed shuffles only, no pairwise join") {
    val p = plan("q_dedup_span")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"span dedup must never compare documents pairwise:\n$p")
  }

  test("no registered query plans a GLOBAL window (single-partition straggler)") {
    // the WindowExec "No Partition Defined" warnings in the test log
    // must all come from tiny oracle-twin formulations inside specs,
    // never from the library surface: a global window moves ALL data
    // to one task and is the canonical 100 TB straggler
    // WAIVER 1: a global window directly over an Aggregate subtree is
    // the second phase of the two-phase prefix sum (Dist.prefixSum):
    // it windows the P per-bucket TOTALS (P = defaultParallelism),
    // not the data — bounded by construction, and exactly why
    // q_pack_seq / q_pipeline_curate legitimately log one "No
    // Partition Defined" line on a P-row frame.
    // WAIVER 2: a global window over a Limit subtree ranks at most
    // the literal row count (q_hybrid_rrf's per-retriever top-100
    // candidate lists) — TakeOrderedAndProject does the scalable cut,
    // the window orders ≤K rows. Anything windowing non-aggregated,
    // unbounded rows globally is a real straggler and fails.
    // The waiver walks only NARROW unary nodes (Project/Filter): the
    // bounded subtree must sit DIRECTLY under the window. An
    // aggregate buried below a join would not bound the window's
    // input and must not waive it — this is what machine-enforces the
    // prefix-sum discipline for the r6 ScaleOps tier
    // (q_skew_audit / q_length_buckets / q_mad ride Dist.prefixSum;
    // their only global windows are over P-row bucket totals).
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, GlobalLimit, LogicalPlan, Project, Window => LWindow}
    def boundedBelow(p: LogicalPlan): Boolean = p match {
      case _: Aggregate => true
      case _: GlobalLimit => true
      case n: Project => boundedBelow(n.child)
      case n: Filter => boundedBelow(n.child)
      case _ => false
    }
    val offenders = graft.SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val df = graft.SparkEntry.queries(name)(spark, sf)
      val global = df.queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty && !boundedBelow(w.child) => w
      }
      if (global.nonEmpty) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"queries with a global window over non-aggregated data: $offenders")
  }

  test("no registered query EXECUTES an unbounded global WindowExec (physical guard)") {
    // The physical twin of the logical guard above, prompted by the
    // "WindowExec: No Partition Defined" warnings in the test log:
    // that warning is emitted from the PHYSICAL operator, so this
    // walks every registered query's executedPlan and requires any
    // WindowExec with an empty partition spec to sit on a provably
    // bounded input — an aggregate subtree (the P-row bucket-total
    // phase of Dist.prefixSum) or a limit cut — reachable through
    // narrow/exchange nodes only. A global window whose input is
    // unbounded data rows is the canonical single-task straggler and
    // fails here by name.
    import org.apache.spark.sql.execution._
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    def bounded(p: SparkPlan): Boolean = p match {
      case _: BaseAggregateExec => true
      case _: GlobalLimitExec | _: LocalLimitExec | _: CollectLimitExec |
           _: TakeOrderedAndProjectExec => true
      case n: ProjectExec => bounded(n.child)
      case n: FilterExec => bounded(n.child)
      case n: SortExec => bounded(n.child)
      case n: CoalesceExec => bounded(n.child)
      case n: WindowGroupLimitExec => bounded(n.child)
      case n: ShuffleExchangeExec => bounded(n.child)
      case n: WholeStageCodegenExec => bounded(n.child)
      case n: InputAdapter => bounded(n.child)
      case a: AdaptiveSparkPlanExec => bounded(a.executedPlan)
      case _ => false
    }
    def walk(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case other => other.children.flatMap(walk)
    })
    val offenders = graft.SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val exec = graft.SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan
      val bad = walk(exec).collect {
        case w: WindowExec if w.partitionSpec.isEmpty && !bounded(w.child) => w
      }
      if (bad.nonEmpty) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"queries executing a global WindowExec over unbounded input: $offenders")
  }

  test("q_join_skew's salt demonstrably spreads the hot key across tasks") {
    import org.apache.spark.sql.functions._
    // same synthetic skew as joinSkew: ~4/7 of lineitem rows collapse
    // onto one hot key. Shuffling on the RAW key puts that entire key
    // in one task; shuffling on (key, salt) bounds the largest task.
    // This is the runtime half of the "shuffles on the SALTED key"
    // plan assertion: if a Spark default ever reroutes the salted
    // exchange, the spread collapses and this fails.
    val salts = 8
    val fact = graft.Tables.lineitem(spark, sf)
      .select(
        when(col("l_linenumber") <= 4, lit(1L)).otherwise(col("l_suppkey")).as("k"),
        pmod(col("l_orderkey") + col("l_linenumber"), lit(salts)).as("salt"))
    def maxTaskRows(df: org.apache.spark.sql.DataFrame): Long =
      df.groupBy(spark_partition_id().as("p")).count()
        .agg(max("count")).head().getLong(0)
    val n = fact.count()
    val raw = maxTaskRows(fact.repartition(32, col("k")))
    val salted = maxTaskRows(fact.repartition(32, col("k"), col("salt")))
    // raw: the hot key alone (~4/7 of rows) sits in one task
    assert(raw >= (n * 4) / 7, s"raw skew not reproduced: max $raw of $n")
    // salted: the hot key is split ~S ways, so the largest task holds
    // well under half the rows (4/7 ÷ 8 ≈ 7% + tail, allow 3× slack)
    assert(salted * 4 < raw,
      s"salting failed to spread the hot key: max $salted vs unsalted $raw")
  }

  test("q_sql_tpch19 pushes each branch's single-table conjuncts into BOTH scans") {
    // the point of the OR-of-ANDs shape: Catalyst must extract the
    // per-table disjunctions (quantity bounds → lineitem, brand/size
    // → part) and push them, leaving only the cross-table residual in
    // the join condition. A bare scan on either side means the
    // extraction regressed and the join input is the full table.
    val p = plan("q_sql_tpch19")
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).toSeq
    assert(pushed.exists(l => l.contains("l_quantity") && l.contains("Or(")),
      s"lineitem scan lost the quantity disjunction:\n${pushed.mkString("\n")}")
    assert(pushed.exists(l => l.contains("p_brand") && l.contains("Or(")),
      s"part scan lost the brand/size disjunction:\n${pushed.mkString("\n")}")
  }

  test("q_sql_tpch21 decorrelates EXISTS/NOT EXISTS to semi + anti joins") {
    val p = plan("q_sql_tpch21")
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_sql_tpch13 keeps the ON-clause filter pushed and the outer join broadcast") {
    val p = plan("q_sql_tpch13")
    // the o_orderpriority <> '5-LOW' predicate lives in the JOIN's ON
    // clause: it must be pushed into the ORDERS scan (null-extension
    // semantics permit it there, but NOT as a post-join filter)
    assert(p.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("5-LOW")), p)
    assert(p.contains("LeftOuter"), p)
  }

  test("q_hybrid_rrf ranks limit-bounded candidate lists via TakeOrdered") {
    // every global rank window must consume a top-K cut: the logical
    // plan shows GlobalLimit below each partition-less Window, and
    // the physical plan does the cut with TakeOrderedAndProject (a
    // per-partition-top-K merge), never a global Sort of the corpus
    import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, Window => LWindow}
    val qe = graft.SparkEntry.queries("q_hybrid_rrf")(spark, sf).queryExecution
    val rankWindows = qe.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }
    assert(rankWindows.size == 2, s"expected 2 rank windows:\n${qe.optimizedPlan}")
    rankWindows.foreach { w =>
      assert(w.child.collectFirst { case l: GlobalLimit => l }.nonEmpty,
        s"rank window not bounded by a Limit:\n$w")
    }
    assert(qe.executedPlan.toString.contains("TakeOrderedAndProject"),
      qe.executedPlan.toString)
  }

  test("q_join_bucketed joins co-located buckets with NO shuffle below the join") {
    val p = plan("q_join_bucketed")
    assert(p.contains("SortMergeJoin"), p)
    // both scans must be bucket-aware reads
    assert(p.contains("Bucketed: true"), p)
    // the ONLY hash exchange in the plan is the post-join groupBy's:
    // a second one means a join input shuffled and co-location broke
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 1, s"join input shuffled despite bucketing ($exchanges exchanges):\n$p")
  }

  test("q_sql_tpch15 and q_sql_tpch11 aggregate the fact table exactly ONCE") {
    // both gate an aggregate by its own global stat; the scalar-
    // subquery formulation re-executed the fact scan + agg (Spark
    // plans no reuse across a twice-referenced CTE — measured), so
    // the templates use a global window over the aggregated set.
    // Two scans expected per query: the fact table and supplier.
    Seq("q_sql_tpch15", "q_sql_tpch11").foreach { q =>
      val p = plan(q)
      val scans = p.linesIterator.count(_.contains("Scan parquet"))
      assert(scans == 2, s"$q re-scans a table ($scans scans):\n$p")
    }
  }

  test("q_join_interval pair search is a bucket equi-join, never a nested loop") {
    // the whole point of the bucketization: the interval-overlap
    // inequality must ride an equi-join on the time bucket, not a
    // BroadcastNestedLoop over the inequality alone
    val p = plan("q_join_interval")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.linesIterator.exists(l =>
      (l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin") ||
        l.contains("BroadcastHashJoin")) && l.contains("bkt")),
      s"no bucket-keyed equi-join found:\n$p")
  }

  test("q_bpe_pairs builds the pair stream narrowly (single aggregation shuffle)") {
    // adjacent pairs come from zip_with over two slices of the SAME
    // token list — a generator, not a posexplode self-join; the only
    // exchange is the pair-count aggregation, and the top-30 is a
    // TakeOrderedAndProject, never a global Sort
    val p = plan("q_bpe_pairs")
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 1, s"pair stream shuffled more than the count agg:\n$p")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.linesIterator.exists(l => l.contains("Join")), s"unexpected join:\n$p")
  }

  test("q_grid_join joins on grid cells (broadcast equi-join), never pairwise points") {
    // the oracle is the brute-force |C|×|S| product; the engine side
    // must NOT be — the 3×3 cell replication makes it an equi-join
    // on (jx, jy) with the 9×|supplier| build side broadcast
    val p = plan("q_grid_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q_spearman joins ranks back keyed and broadcasts small-domain rank tables") {
    // ranks come from the two-phase prefix sum (audited by the global
    // window test's waiver); the join back to the fact rows must be
    // hash-keyed on the value, with the ≤50-row quantity/discount
    // rank tables broadcast
    val p = plan("q_spearman")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("no registered query plans a CartesianProduct (except the cross-join demo)") {
    // a non-broadcast nested-loop product is THE 100 TB killer: every
    // partition of one side ships to every partition of the other.
    // q_join_cross is the deliberate tiny-dims cross join; everything
    // else must plan keyed joins or broadcast nested loops (bounded
    // build side), never a shuffled cartesian.
    val offenders = graft.SparkEntry.queries.keys.toSeq.sorted
      .filterNot(_ == "q_join_cross")
      .flatMap { name =>
        val p = plan(name)
        if (p.contains("CartesianProduct")) Some(name) else None
      }
    assert(offenders.isEmpty, s"queries planning CartesianProduct: $offenders")
  }

  test("no registered query evaluates a Scala UDF (codegen surface only)") {
    // the engine's contract: built-ins / HOFs / native Expressions
    // everywhere — a ScalaUDF black-boxes the optimizer (no pushdown
    // through it, no codegen, boxed row values). The UDF/UDAF surface
    // (q_udaf_wavg etc.) uses typed Aggregators, which compile to
    // ObjectHashAggregate, not ScalaUDF.
    val offenders = graft.SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val p = graft.SparkEntry.queries(name)(spark, sf)
        .queryExecution.optimizedPlan.toString
      if (p.contains("UDF(") || p.contains("ScalaUDF")) Some(name) else None
    }
    assert(offenders.isEmpty, s"queries with Scala UDFs: $offenders")
  }

  test("q_sink_partitioned prunes partitions on read-back (no data filter)") {
    // run the full query once so the partitioned layout exists, then
    // inspect the read-back scan: the o_orderpriority predicate must
    // appear as a PartitionFilter (directory pruning before I/O) and
    // NOT as a pushed data filter — on a partition column the value
    // is in the path, not the files
    graft.SparkEntry.queries("q_sink_partitioned")(spark, sf).count()
    val p = Formats.sinkPartitionedPlanProbe(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") &&
      p.linesIterator.exists(l => l.contains("PartitionFilters") &&
        l.contains("o_orderpriority")),
      s"partition filter not applied to the partition column:\n$p")
  }

  test("q_mad selects percentiles by rank — no percentile aggregate, keyed buckets") {
    // same contract as q_winsorize: a percentile aggregate buffers a
    // whole group in one task; both medians must come from per-value
    // counts + the keyed prefix sum
    val p = plan("q_mad")
    assert(!p.toLowerCase.contains("percentile"),
      s"percentile aggregate (per-group buffering) in q_mad plan:\n$p")
    assert(p.contains("hashpartitioning(event_type") && p.contains("__pid"),
      s"expected keyed prefix-sum bucketing in q_mad plan:\n$p")
  }

  test("q_length_buckets never plans an ntile window") {
    // the library computes NTILE's bucket id arithmetically from
    // distributed ranks; Spark's ntile() would be a full-corpus
    // single-task sort+window (the spec's oracle twin uses it on
    // sf0.001 only — the LIBRARY plan must not)
    val p = plan("q_length_buckets")
    assert(!p.toLowerCase.contains("ntile"), s"ntile window in plan:\n$p")
    assert(p.contains("__pid"), s"expected prefix-sum ranks in plan:\n$p")
  }

  test("q_split_train shuffles only to aggregate the 3 split groups") {
    // the split itself must be map-side (a pure projection over the
    // scan): exactly one hash exchange — the final 3-group aggregate
    // — may appear, nothing keyed by doc
    val p = plan("q_split_train")
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 1, s"split added a data shuffle:\n$p")
    // scan pruned to the two referenced columns (of documents' five)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,n_chars:bigint>"),
      s"scan not pruned to (doc_id, n_chars):\n$p")
  }

  test("q_zorder computes the morton key inside whole-stage codegen") {
    // materialize first: WholeStageCodegen spans only appear in the
    // AQE final plan
    // exchange count from the pre-execution plan (the AQE final-plan
    // string re-prints materialized stages, double-counting)
    val p0 = plan("q_zorder")
    assert(p0.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1, p0)
    val df = graft.SparkEntry.queries("q_zorder")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"), p)
    // codegen'd stages print as "*(n) Op"; the morton Project must
    // carry the marker (interpreted eval would print bare "Project")
    assert(p.linesIterator.exists(l => l.contains("*(") && l.contains("shiftleft")), p)
  }
}
