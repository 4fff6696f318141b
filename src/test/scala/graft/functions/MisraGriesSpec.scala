package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The Misra–Gries guarantee the engine relies on (Aggregates.
  * heavyHitters): the candidate set is a SUPERSET of every item with
  * true frequency > n/(k+1), regardless of how the stream is
  * partitioned — merge trees must not break it (mergeable-summaries
  * construction). The counter values are order-dependent by design
  * and no registered query exposes them.
  */
class MisraGriesSpec extends SparkSpec {

  // deterministic skewed stream: a few dominant items over a uniform
  // tail, so items above AND below the n/(k+1) threshold both exist
  private val freqs: Map[String, Long] =
    Map("hot0" -> 10000L, "hot1" -> 4000L, "hot2" -> 2500L, "warm" -> 1500L) ++
      (0 until 20).map(i => s"cold$i" -> 100L)
  private val n: Long = freqs.values.sum

  private def stream = {
    import spark.implicits._
    // interleave deterministically so heavy items aren't contiguous
    freqs.toSeq.sortBy(_._1)
      .flatMap { case (t, c) => (0L until c).map(j => (j * 977 + t.hashCode % 997, t)) }
      .sortBy(_._1).map(_._2)
      .toDF("tok")
  }

  test("candidate set contains every item above n/(k+1), at any partitioning") {
    import spark.implicits._
    val k = 8
    val mustHave = freqs.filter(_._2 > n.toDouble / (k + 1)).keySet
    assert(mustHave.nonEmpty && mustHave.size < freqs.size) // test discriminates
    for (parts <- Seq(1, 4, 13)) {
      val sketch: Map[String, Long] = stream.repartition(parts).as[String]
        .select(new MisraGries(k).toColumn)
        .head()
      val missing = mustHave -- sketch.keySet
      assert(missing.isEmpty,
        s"parts=$parts: MG(k=$k) lost guaranteed heavy hitters: $missing")
      assert(sketch.size <= k, s"parts=$parts: ${sketch.size} counters > k=$k")
    }
  }

  test("counter estimates are underestimates within n/(k+1)") {
    import spark.implicits._
    val k = 8
    val sketch: Map[String, Long] = stream.repartition(4).as[String]
      .select(new MisraGries(k).toColumn)
      .head()
    val bound = n.toDouble / (k + 1)
    sketch.foreach { case (t, est) =>
      val truth = freqs(t)
      assert(est <= truth, s"$t: est $est > true $truth")
      assert(truth - est <= bound, s"$t: error ${truth - est} > n/(k+1)=$bound")
    }
  }

  test("q_heavy_hitters equals the brute-force exact answer") {
    val got = graft.SparkEntry.queries("q_heavy_hitters")(spark, sf)
    val toks = graft.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("tok"))
    val total = toks.count()
    val want = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > total / 30.0)
      .withColumn("n_total", lit(total))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "two-pass MG heavy hitters != brute-force full groupBy")
    assert(got.count() > 0, "degenerate fixture: no heavy hitters at all")
  }
}
