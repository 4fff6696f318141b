package graft.ops

import graft.SparkSpec

import scala.collection.mutable

/** Ground truth for the graph pack: exact driver-side differentials
  * on the sf0.001 synthetic graph (~1.5k vertices, ~6k edges). The
  * triangle count has a DuckDB oracle too; PageRank has none (an
  * iterative fixpoint is not SQL), so this differential IS its
  * correctness gate — and because the query's arithmetic is
  * fixed-point Long, the comparison is exact equality, not a
  * tolerance band.
  */
class GraphSpec extends SparkSpec {

  private lazy val edgeList: Seq[(Long, Long)] =
    Graph.edges(spark, sf).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("q_graph_triangles matches a brute-force count over the edge set") {
    val edges = edgeList.toSet
    val byVertex = mutable.Map.empty[Long, mutable.Set[Long]]
    edges.foreach { case (u, v) =>
      byVertex.getOrElseUpdate(u, mutable.Set.empty) += v
      byVertex.getOrElseUpdate(v, mutable.Set.empty) += u
    }
    // brute force over wedges a<b<c
    var tri = 0L
    for ((a, b) <- edges; c <- byVertex(b) if c > b && edges.contains((a, c)))
      tri += 1
    val wedges = byVertex.valuesIterator.map { n =>
      val d = n.size.toLong; d * (d - 1) / 2
    }.sum
    val row = SparkEntryRow("q_graph_triangles")
    assert(row.getAs[Long]("n_edges") === edges.size.toLong)
    assert(row.getAs[Long]("n_vertices") === byVertex.size.toLong)
    assert(row.getAs[Long]("n_wedges") === wedges)
    assert(row.getAs[Long]("n_triangles") === tri)
  }

  test("q_pagerank matches an exact Long fixed-point reimplementation") {
    val nbrs = mutable.Map.empty[Long, mutable.ArrayBuffer[Long]]
    edgeList.foreach { case (u, v) =>
      nbrs.getOrElseUpdate(u, mutable.ArrayBuffer.empty) += v
      nbrs.getOrElseUpdate(v, mutable.ArrayBuffer.empty) += u
    }
    val n = nbrs.size.toLong
    val base = (Graph.PrScale * (100 - Graph.PrDampPct) / 100) / n
    var rank: Map[Long, Long] = nbrs.keysIterator.map(_ -> Graph.PrScale).toMap
    for (_ <- 1 to Graph.PrIters) {
      val in = mutable.Map.empty[Long, Long].withDefaultValue(0L)
      nbrs.foreach { case (u, out) =>
        val c = rank(u) / out.size
        out.foreach(v => in(v) += c)
      }
      rank = in.iterator.map { case (v, m) => v -> (base + m * Graph.PrDampPct / 100) }.toMap
    }
    val want = rank.toSeq.sortBy { case (v, r) => (-r, v) }.take(20)
    val got = graft.SparkEntry.queries("q_pagerank")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === want)
  }

  private def SparkEntryRow(q: String): org.apache.spark.sql.Row =
    graft.SparkEntry.queries(q)(spark, sf).collect().head
}
