package graft.ops

import graft.SparkSpec

/** Recall checks for the approximate similarity paths against the
  * exact brute-force baseline. Thresholds are deliberately loose —
  * these are approximate indexes; the invariant is "finds most of
  * the true neighbors", not equality. */
class SimilaritySpec extends SparkSpec {

  private def ids(q: String, n: Int): Seq[Long] =
    SparkEntry_queries(q).collect().take(n).map(_.getLong(0)).toSeq

  private def SparkEntry_queries(q: String) =
    graft.SparkEntry.queries(q)(spark, sf)

  test("IVF ANN returns k rows with >=3/5 of the true top-5") {
    val brute = ids("q_sim_search", 5).toSet
    val ivf = ids("q_sim_ann_ivf", 5)
    assert(ivf.size == 5)
    assert((brute & ivf.toSet).size >= 3,
      s"IVF recall too low: $ivf vs $brute")
  }

  test("LSH ANN results are a subset of true cosine ordering") {
    val lsh = SparkEntry_queries("q_sim_ann_lsh").collect()
    assert(lsh.nonEmpty)
    // scores must be genuine cosine values (in [-1, 1]) and sorted desc
    val scores = lsh.map(_.getDouble(2)).toSeq
    assert(scores == scores.sorted.reverse)
    assert(scores.forall(s => s >= -1.0 && s <= 1.0))
  }
}
