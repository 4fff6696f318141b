package graft.ops

import graft.SparkSpec

/** Ground truth for the inference tier's round-8 addition: the
  * two-sample KS statistic replayed exactly on the driver from the
  * raw samples (the oracle pins cross-engine agreement; this pins
  * the STATISTIC — that the distributed integer-prefix-sum
  * construction computes sup |F1 − F2| at all, not just the same
  * thing twice).
  */
class StatsSpec extends SparkSpec {

  private def r4(x: Double): Double = math.floor(x * 10000 + 0.5) / 10000

  test("q_ks_test matches an exact driver-side ECDF replay") {
    val ev = graft.Tables.events(spark, sf)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val a = ev.collect { case ("purchase", v) => v }.sorted
    val b = ev.collect { case ("view", v) => v }.sorted
    val n1 = a.length.toLong
    val n2 = b.length.toLong
    // exact sup over the pooled distinct values, in integer arithmetic
    val values = (a ++ b).distinct.sorted
    var best = BigInt(0)
    var bestAt = Double.NaN
    values.foreach { v =>
      val c1 = a.count(_ <= v).toLong
      val c2 = b.count(_ <= v).toLong
      val m = (BigInt(c1) * n2 - BigInt(c2) * n1).abs
      if (m > best) { best = m; bestAt = v } // ties keep the SMALLEST value
    }
    val row = graft.SparkEntry.queries("q_ks_test")(spark, sf).collect().head
    assert(row.getAs[Long]("n1") === n1)
    assert(row.getAs[Long]("n2") === n2)
    assert(row.getAs[Double]("ks_d") ===
      r4(best.toDouble / (n1.toDouble * n2)))
    assert(row.getAs[Double]("at_value") === bestAt)
    assert(row.getAs[Double]("d_crit_05") ===
      r4(1.358 * math.sqrt((n1 + n2).toDouble / (n1.toDouble * n2))))
    assert(row.getAs[Boolean]("reject_05") ===
      (row.getAs[Double]("ks_d") > row.getAs[Double]("d_crit_05")))
    // sanity: D is a probability distance
    val d = row.getAs[Double]("ks_d")
    assert(d >= 0.0 && d <= 1.0)
  }

  test("q_auc_eval matches a driver-side rank-sum AUC replay") {
    val emb = graft.Tables.embeddings(spark, sf)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    val probe = emb.find(_._1 == 0L).get
    def cosine(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      // sequential fold, the engine's op order
      a.indices.foreach { i =>
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val scored = emb.filter(_._1 != 0L)
      .map { case (_, l, e) => (l == probe._2, cosine(e, probe._3)) }
    val nPos = scored.count(_._1).toLong
    val nNeg = scored.size - nPos
    // pooled average ranks ascending by score
    val byScore = scored.groupBy(_._2).toSeq.sortBy(_._1)
    var cum = 0L
    var rPos = BigDecimal(0)
    byScore.foreach { case (_, xs) =>
      val cnt = xs.size.toLong
      cum += cnt
      val avgRank = cum - (cnt - 1) / 2.0
      val cp = xs.count(_._1)
      rPos += BigDecimal(cp * avgRank).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    }
    def r4(x: Double): Double = math.floor(x * 10000 + 0.5) / 10000
    val u = rPos.toDouble - nPos * (nPos + 1) / 2.0
    val auc = u / (nPos.toDouble * nNeg)
    val row = graft.SparkEntry.queries("q_auc_eval")(spark, sf).collect().head
    assert(row.getAs[Int]("probe_label") === probe._2)
    assert(row.getAs[Long]("n_pos") === nPos)
    assert(row.getAs[Long]("n_neg") === nNeg)
    assert(row.getAs[Double]("auc") === r4(auc))
    assert(row.getAs[Double]("gini") === r4(2.0 * u / (nPos.toDouble * nNeg) - 1))
    assert(auc >= 0.0 && auc <= 1.0)
  }
}
