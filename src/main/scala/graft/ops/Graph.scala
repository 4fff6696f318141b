package graft.ops

import graft.{Det, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed graph analytics over a deterministic synthetic graph.
  *
  * The corpus tables can't supply a sparse graph (the documents
  * vocabulary is 31 terms that nearly all co-occur — the
  * co-occurrence graph is complete, degenerate for triangle work), so
  * the graph is generated graph500-style from orderkeys by pure
  * modular arithmetic: each orderkey u emits 4 pseudo-random
  * neighbors 1 + (u·131 + i·9973) mod max_key. Both engines run the
  * identical integer construction, so the DuckDB oracle reproduces
  * the exact graph; vertex count (and edge count) scales linearly
  * with the fact table.
  *
  *  - q_graph_triangles: exact triangle count + global clustering
  *    coefficient. Edges are ORIENTED by the vertex total order
  *    (u < v), so each triangle is enumerated exactly once as
  *    e1=(a,b), e2=(b,c), e3=(a,c) — no post-hoc /6 and no symmetric
  *    edge duplication. Scale shape: the wedge join shuffles on the
  *    shared vertex, the closing join on the (a,c) pair — both
  *    equi-joins; intermediate size is the wedge count
  *    Σ_v d(v)·(d(v)-1)/2, which the degree-ordered orientation
  *    (point high-degree vertices at low-degree ones; see Latapy,
  *    TCS 2008) would further bound at true scale. The three 1-row
  *    stat aggregates assemble via broadcast cross joins.
  */
object Graph extends QueryPack {

  /** Out-degree of the synthetic generator (edges per orderkey). */
  private val Fanout = 4

  /** Oriented (u < v) distinct edge list of the synthetic graph.
    * Package-visible so GraphSpec can run exact differentials on it. */
  private[ops] def edges(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(col("o_orderkey").as("u"))
    val nv = o.agg(max(col("u")).as("nv"))
    o.crossJoin(broadcast(nv))
      .select(col("u"), col("nv"), explode(sequence(lit(1), lit(Fanout))).as("i"))
      .select(col("u"),
        (lit(1) + (col("u") * 131 + col("i") * 9973) % col("nv")).as("v"))
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .distinct()
  }

  private def triangles(s: SparkSession, d: String): DataFrame = {
    val e = edges(s, d)
    val edgeStats = e.agg(count(lit(1)).as("n_edges"))
    // degree from the oriented list: each undirected edge touches
    // both endpoints once.
    val degStats = e.select(col("u").as("x"))
      .unionAll(e.select(col("v").as("x")))
      .groupBy("x").agg(count(lit(1)).as("d"))
      .agg(count(lit(1)).as("n_vertices"),
        sum(expr("d * (d - 1) div 2")).as("n_wedges"))
    val triStats = e.as("e1")
      .join(e.as("e2"), col("e1.v") === col("e2.u"))
      .join(e.as("e3"),
        col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v"))
      .agg(count(lit(1)).as("n_triangles"))
    edgeStats.crossJoin(broadcast(degStats)).crossJoin(broadcast(triStats))
      .select(col("n_edges"), col("n_vertices"), col("n_wedges"), col("n_triangles"),
        Det.r4(lit(3.0) * col("n_triangles") / col("n_wedges")).as("clustering"))
  }

  /** Fixed-point scale for PageRank mass: 1.0 of rank = 1e12. */
  private[ops] val PrScale = 1000000000000L
  /** Damping 0.85 expressed as integer percent. */
  private[ops] val PrDampPct = 85L
  private[ops] val PrIters = 8

  /** PageRank over the synthetic graph (undirected: each edge walks
    * both ways), PrIters power iterations. All mass arithmetic is
    * FIXED-POINT Long (scale 1e12): r/deg is integer `div`, the
    * damping multiply is `(m * 85) div 100`, and Long sums are exact
    * and order-independent — so the result is BIT-deterministic
    * across partitionings, task orders, and retries, which no
    * double-based formulation can promise (FP addition does not
    * commute with partial aggregation). Headroom: a vertex's in-mass
    * is ≤ max_deg · max_rank ≈ 2⁶ · 2 · 1e12 ≪ 2⁶³/85.
    *
    * Scale shape: the adjacency (src, dst, deg) is materialized once,
    * persisted pre-partitioned on src; every iteration is ONE
    * src-keyed join (rank refresh is vertex-sized) + ONE dst-keyed
    * partial-agg shuffle. The (1-d)/N base term rides a broadcast
    * 1-row cross join — no driver collect, so the query also
    * degrades cleanly to empty output on an empty graph. Lineage is
    * cut by localCheckpoint mid-loop, the connected-components
    * pattern (see Dedup.connectedComponents). */
  private def pagerank(s: SparkSession, d: String): DataFrame = {
    val e = edges(s, d)
    val dir = e.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(e.select(col("v").as("src"), col("u").as("dst")))
    // GROUPED adjacency — one row per vertex (src, deg, [dsts]) —
    // persisted pre-partitioned and sorted on src: the per-iteration
    // join is then vertex-sized on BOTH sides (8× smaller than the
    // edge list here) and reuses partitioning + order from the
    // cache; the edge-sized stream only exists as a narrow explode
    // between the join and the partial-agg shuffle.
    val adj = dir.groupBy("src")
      .agg(count(lit(1)).as("deg"), collect_list(col("dst")).as("dsts"))
      .repartition(col("src")).sortWithinPartitions("src").persist()
    val deg = adj.select(col("src"), col("deg"))
    // 1-row vertex count, PERSISTED: it is broadcast-cross-joined in
    // every iteration, and an unpersisted plan would re-run the whole
    // edge construction (scan + explode + distinct shuffle) once per
    // broadcast — the dominant cost of the loop when left out
    val nDf = deg.agg(count(lit(1)).as("n")).persist()
    try {
      var ranks = deg.select(col("src").as("v"), lit(PrScale).as("r"))
      for (i <- 1 to PrIters) {
        val inMass = adj.join(ranks, col("src") === col("v"))
          .select(explode(col("dsts")).as("dst"), expr("r div deg").as("c"))
          .groupBy(col("dst")).agg(sum(col("c")).as("in_mass"))
        ranks = inMass.crossJoin(broadcast(nDf))
          .select(col("dst").as("v"),
            (expr(s"(($PrScale * ${100 - PrDampPct}) div 100) div n")
              + expr(s"(in_mass * $PrDampPct) div 100")).as("r"))
        if (i % 4 == 0) ranks = ranks.localCheckpoint()
      }
      ranks.orderBy(col("r").desc, col("v")).limit(20)
        .select(col("v"), col("r").as("rank_fp"))
    } finally { adj.unpersist(); nDf.unpersist() }
  }

  /** BFS hop cap — mirrored in the recursive-CTE oracle, so both
    * engines explore the identical bounded neighborhood. */
  private[ops] val BfsMaxHops = 10

  /** Single-source BFS hop distances from the globally smallest
    * vertex, capped at BfsMaxHops, reported as a (hops, n_vertices)
    * histogram. The iterative frontier loop is the textbook
    * distributed BFS: each round joins the CURRENT FRONTIER (only the
    * vertices first reached last round — not the whole visited set)
    * against the grouped adjacency, then an anti-join against the
    * visited set keeps first-touch distances only. Work per round is
    * O(frontier · fanout) plus one vertex-keyed shuffle, the same
    * shape Pregel/GraphX uses; total work is O(E) across all rounds
    * regardless of the cap.
    *
    * The frontier is localCheckpointed each round (it seeds the next
    * join), visited accumulates as a union whose lineage is cut every
    * 4 rounds — the connected-components pattern (Dedup.scala). The
    * source vertex is a 1-row broadcast, not a driver collect, so the
    * query degrades cleanly on an empty graph. BFS gives min-hop
    * distance by construction, so the result is exactly DuckDB's
    * MIN(d) over the bounded recursive walk. */
  private def bfs(s: SparkSession, d: String): DataFrame = {
    val e = edges(s, d)
    val dir = e.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(e.select(col("v").as("src"), col("u").as("dst")))
    val adj = dir.groupBy("src").agg(collect_list(col("dst")).as("dsts"))
      .repartition(col("src")).sortWithinPartitions("src").persist()
    try {
      val src0 = e.agg(min(col("u")).as("s0"))
      var frontier = adj.select(col("src").as("v")).crossJoin(broadcast(src0))
        .filter(col("v") === col("s0")).select(col("v"), lit(0).as("hops"))
        .localCheckpoint()
      var visited = frontier
      var hop = 0
      while (hop < BfsMaxHops && !frontier.isEmpty) {
        hop += 1
        val next = adj.join(frontier, col("src") === col("v"))
          .select(explode(col("dsts")).as("nv")).distinct()
          .join(visited, col("nv") === visited("v"), "left_anti")
          .select(col("nv").as("v"), lit(hop).as("hops"))
          .localCheckpoint()
        visited = visited.unionAll(next)
        if (hop % 4 == 0) visited = visited.localCheckpoint()
        frontier = next
      }
      visited.groupBy(col("hops")).agg(count(lit(1)).as("n_vertices"))
        .orderBy("hops")
    } finally adj.unpersist()
  }

  override val queries: Map[String, Q] = Map(
    "q_graph_triangles" -> triangles,
    "q_pagerank"        -> pagerank,
    "q_graph_bfs"       -> bfs,
  )

  /** Shared edge CTE — the identical modular construction DuckDB-side. */
  private val EdgesSql: String =
    """WITH nv AS (SELECT MAX(o_orderkey) AS nv FROM orders),
      |raw AS (
      |  SELECT o_orderkey AS u, 1 + (o_orderkey * 131 + i * 9973) % nv AS v
      |  FROM orders, nv, UNNEST([1, 2, 3, 4]) AS t(i)),
      |edges AS (
      |  SELECT DISTINCT LEAST(u, v) AS u, GREATEST(u, v) AS v
      |  FROM raw WHERE u <> v),
      |deg AS (
      |  SELECT x, COUNT(*) AS d
      |  FROM (SELECT u AS x FROM edges UNION ALL SELECT v AS x FROM edges)
      |  GROUP BY x)""".stripMargin

  override val oracles: Map[String, String] = Map(
    "q_graph_triangles" ->
      s"""$EdgesSql
         |SELECT (SELECT COUNT(*) FROM edges) AS n_edges,
         |       (SELECT COUNT(*) FROM deg) AS n_vertices,
         |       (SELECT CAST(SUM(d * (d - 1) // 2) AS BIGINT) FROM deg) AS n_wedges,
         |       n_triangles,
         |       ${Det.r4Sql("3.0 * n_triangles / (SELECT SUM(d * (d - 1) // 2) FROM deg)")} AS clustering
         |FROM (SELECT COUNT(*) AS n_triangles
         |      FROM edges e1
         |      JOIN edges e2 ON e2.u = e1.v
         |      JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v)""".stripMargin,
    // Bounded recursive walk: UNION-distinct on (v, d) pairs plus the
    // d < cap guard terminates despite cycles; MIN(d) per vertex is
    // the BFS hop distance because every ≤cap-hop path is enumerated.
    "q_graph_bfs" ->
      s"""${EdgesSql.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |dir AS (SELECT u AS src, v AS dst FROM edges
         |        UNION ALL SELECT v AS src, u AS dst FROM edges),
         |walk(v, d) AS (
         |  SELECT MIN(u), 0 FROM edges
         |  UNION
         |  SELECT dir.dst, walk.d + 1
         |  FROM walk JOIN dir ON dir.src = walk.v
         |  WHERE walk.d < $BfsMaxHops)
         |SELECT d AS hops, COUNT(*) AS n_vertices
         |FROM (SELECT v, MIN(d) AS d FROM walk GROUP BY v)
         |GROUP BY d ORDER BY d""".stripMargin,
  )
}
