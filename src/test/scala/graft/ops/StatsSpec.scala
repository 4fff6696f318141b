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
}
