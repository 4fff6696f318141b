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

  /** Oriented (u < v) distinct edge list of the synthetic graph. */
  private def edges(s: SparkSession, d: String): DataFrame = {
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

  override val queries: Map[String, Q] = Map(
    "q_graph_triangles" -> triangles,
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
  )
}
