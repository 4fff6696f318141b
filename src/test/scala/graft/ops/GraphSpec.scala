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

  test("Latapy orientation collapses the wedge-join intermediate on a skewed graph") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // Star: hub 0 (the LOWEST id — worst case for id-orientation)
    // joined to 400 leaves, plus a ring among consecutive leaves so
    // triangles exist (0, i, i+1).
    val n = 400L
    val star = (1L to n).map(i => (0L, i))
    val ring = (1L until n).map(i => (i, i + 1))
    val e = (star ++ ring).toDF("u", "v")

    def orientedWedges(o: org.apache.spark.sql.DataFrame): Long =
      o.groupBy("a").agg(count(lit(1)).as("dout"))
        .agg(sum(expr("dout * (dout - 1) div 2"))).head.getLong(0)

    // id-orientation (the old plan): the hub keeps ALL its wedges.
    val idWedges = orientedWedges(e.select(col("u").as("a"), col("v").as("b")))
    val degWedges = orientedWedges(Graph.orientByDegree(e))
    // hub wedges: n·(n-1)/2 ≈ 80k under id order; under degree order
    // every star edge points INTO the hub, leaving only leaf-local
    // wedges (dout ≤ 3 per leaf).
    assert(idWedges >= n * (n - 1) / 2, s"id-oriented wedges: $idWedges")
    assert(degWedges < 3 * n, s"degree-oriented wedges: $degWedges")

    // and the triangle count is orientation-invariant: both orderings
    // enumerate each (0, i, i+1) triangle exactly once.
    def triCount(o: org.apache.spark.sql.DataFrame): Long =
      o.as("e1").join(o.as("e2"), col("e1.b") === col("e2.a"))
        .join(o.as("e3"), col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
        .count()
    val got = triCount(Graph.orientByDegree(e))
    assert(got === triCount(e.select(col("u").as("a"), col("v").as("b"))))
    assert(got === (n - 1))
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

  test("q_label_prop matches an exact synchronous replay with (count, min-label) argmax") {
    val nbrs = mutable.Map.empty[Long, mutable.ArrayBuffer[Long]]
    edgeList.foreach { case (u, v) =>
      nbrs.getOrElseUpdate(u, mutable.ArrayBuffer.empty) += v
      nbrs.getOrElseUpdate(v, mutable.ArrayBuffer.empty) += u
    }
    var lbl: Map[Long, Long] = nbrs.keysIterator.map(v => v -> (v % Graph.LpSeedMod)).toMap
    for (_ <- 1 to Graph.LpIters) {
      lbl = nbrs.iterator.map { case (v, out) =>
        val counts = out.groupBy(lbl).view.mapValues(_.size.toLong)
        // most frequent neighbor label, smallest label on a tie —
        // the query's max(struct(c, -lbl)) total order
        v -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }.toMap
    }
    val want = lbl.values.groupBy(identity).view
      .mapValues(_.size.toLong).toSeq.sortBy(_._1)
    val got = graft.SparkEntry.queries("q_label_prop")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === want)
  }

  test("q_graph_jaccard matches an exact common-neighbor replay") {
    val nbrs = mutable.Map.empty[Long, mutable.Set[Long]]
    edgeList.foreach { case (u, v) =>
      nbrs.getOrElseUpdate(u, mutable.Set.empty) += v
      nbrs.getOrElseUpdate(v, mutable.Set.empty) += u
    }
    def r4(x: Double): Double = math.floor(x * 10000 + 0.5) / 10000
    val want = edgeList.map { case (u, v) =>
      val cn = (nbrs(u) & nbrs(v)).size.toLong
      (u, v, cn, r4(cn.toDouble / (nbrs(u).size + nbrs(v).size - cn)))
    }.sortBy { case (u, v, _, j) => (-j, u, v) }.take(20).toSeq
    val got = graft.SparkEntry.queries("q_graph_jaccard")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got === want)
  }

  test("q_hierarchy matches an exact per-node walk replay") {
    val keys = graft.Tables.orders(spark, sf)
      .select("o_orderkey").collect().map(_.getLong(0))
    def depth(k: Long): Long = {
      var cur = k; var d = 0L
      while (cur >= 16) { cur /= 16; d += 1 }
      d
    }
    val want = keys.map(depth).groupBy(identity).view
      .mapValues(_.size.toLong).toSeq.sortBy(_._1)
    val got = graft.SparkEntry.queries("q_hierarchy")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === want)
    // pointer doubling must have fully resolved: max depth < 2^rounds
    assert(want.map(_._1).max < (1L << Graph.HierRounds))
  }

  test("q_modularity matches an exact Newman-Q replay of the LP partition") {
    val nbrs = mutable.Map.empty[Long, mutable.Set[Long]]
    edgeList.foreach { case (u, v) =>
      nbrs.getOrElseUpdate(u, mutable.Set.empty) += v
      nbrs.getOrElseUpdate(v, mutable.Set.empty) += u
    }
    var lbl: Map[Long, Long] = nbrs.keysIterator.map(v => v -> (v % Graph.LpSeedMod)).toMap
    for (_ <- 1 to Graph.LpIters) {
      lbl = nbrs.iterator.map { case (v, out) =>
        val counts = out.toSeq.groupBy(lbl).view.mapValues(_.size.toLong)
        v -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }.toMap
    }
    val m = edgeList.size.toLong
    val dsum = nbrs.toSeq.map { case (v, nb) => lbl(v) -> nb.size.toLong }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val ein = edgeList.filter { case (u, v) => lbl(u) == lbl(v) }
      .groupBy(p => lbl(p._1)).view.mapValues(_.size.toLong).toMap
      .withDefaultValue(0L)
    val q = dsum.map { case (c, ds) =>
      val t = ein(c).toDouble / m - (ds.toDouble / (2L * m)) * (ds.toDouble / (2L * m))
      BigDecimal(t).setScale(10, BigDecimal.RoundingMode.HALF_UP)
    }.sum
    def r4(x: Double): Double = math.floor(x * 10000 + 0.5) / 10000
    val row = SparkEntryRow("q_modularity")
    assert(row.getAs[Long]("n_vertices") === nbrs.size.toLong)
    assert(row.getAs[Long]("n_edges") === m)
    assert(row.getAs[Long]("n_communities") === dsum.size.toLong)
    assert(row.getAs[Double]("modularity") === r4(q.toDouble))
    // Q is bounded in [-1/2, 1)
    val qv = row.getAs[Double]("modularity")
    assert(qv >= -0.5 && qv < 1.0)
  }

  test("q_kcore profile matches an exact synchronous peel replay") {
    var edges = edgeList.toSet
    def degs(e: Set[(Long, Long)]): Map[Long, Long] =
      e.toSeq.flatMap { case (u, v) => Seq(u, v) }
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = mutable.ArrayBuffer.empty[(Int, Long, Long)]
    for (i <- 0 to Graph.KcIters) {
      val dd = degs(edges)
      want += ((i, edges.size.toLong, dd.size.toLong))
      if (i < Graph.KcIters) {
        val keep = dd.collect { case (x, c) if c >= Graph.KcK => x }.toSet
        edges = edges.filter { case (u, v) => keep(u) && keep(v) }
      }
    }
    val got = graft.SparkEntry.queries("q_kcore")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === want.toSeq)
    // the cascade is the signal: the profile must be non-increasing,
    // and one EXTRA peel past the reported horizon must be a no-op
    // (fixpoint reached) — otherwise KcIters under-reports the core
    val sizes = want.map(_._2)
    assert(sizes.zip(sizes.tail).forall { case (a, b) => b <= a })
    val dd = degs(edges)
    val keep = dd.collect { case (x, c) if c >= Graph.KcK => x }.toSet
    assert(edges.forall { case (u, v) => keep(u) && keep(v) },
      "peel had not converged after KcIters rounds at this fixture")
  }

  private def SparkEntryRow(q: String): org.apache.spark.sql.Row =
    graft.SparkEntry.queries(q)(spark, sf).collect().head
}
