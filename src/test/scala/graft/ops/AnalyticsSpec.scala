package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Ground-truth checks for the analytics pack beyond the DuckDB
  * hash-compare: structural invariants for SCD2 (the oracle proves
  * value equality, not that the intervals MEAN what SCD2 promises)
  * and an exact driver-side recomputation of the EWMA fold.
  */
class AnalyticsSpec extends SparkSpec {

  test("q_scd2 intervals tile each user's timeline without overlap or repeat") {
    val rows = graft.SparkEntry.queries("q_scd2")(spark, sf)
      .select("user_id", "state", "valid_from", "valid_to")
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2).getTime,
        Option(r.getTimestamp(3)).map(_.getTime)))
    rows.groupBy(_._1).foreach { case (user, ivs0) =>
      val ivs = ivs0.sortBy(_._3)
      ivs.sliding(2).foreach {
        case Array((_, s1, f1, t1), (_, s2, f2, _)) =>
          // consecutive intervals: abut exactly, never repeat a state
          assert(t1.contains(f2), s"user $user: gap/overlap at $f1 -> $f2")
          assert(s1 != s2, s"user $user: un-collapsed repeat state $s1")
          assert(f1 < f2, s"user $user: non-increasing valid_from")
        case _ => ()
      }
      // exactly one open interval per user, and it is the last
      assert(ivs.count(_._4.isEmpty) == 1 && ivs.last._4.isEmpty,
        s"user $user: open-interval invariant broken")
    }
  }

  test("q_scd2 change rows agree with a driver-side fold of the raw log") {
    val log = graft.Tables.events(spark, sf)
      .select("user_id", "event_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getTimestamp(3)))
      .sortBy(t => (t._1, t._4.getTime, t._2))
    // reference: keep rows whose state differs from the user's prior row
    val expected = log.groupBy(_._1).values.flatMap { evs =>
      evs.zip(None +: evs.map(e => Some(e._3))).collect {
        case (e, prev) if !prev.contains(e._3) => (e._1, e._2)
      }
    }.toSet
    val got = graft.SparkEntry.queries("q_scd2")(spark, sf)
      .select("user_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
  }

  test("q_ewma equals an exact driver-side replay of the LAG-chain fold") {
    // replicate the SQL expression tree EXACTLY: same coefficients,
    // same left-associative addition order, same floor-rounding —
    // doubles must match bit-for-bit
    val coefs = (1 until 10).map(k => math.pow(0.5, k))
    val series = graft.Tables.events(spark, sf)
      .select("user_id", "event_id", "ts", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime, r.getDouble(3)))
      .groupBy(_._1)
    val expected = series.values.flatMap { evs0 =>
      val evs = evs0.sortBy(e => (e._3, e._2))
      evs.indices.map { i =>
        var num = evs(i)._4
        var den = 1.0
        coefs.zipWithIndex.foreach { case (c, k0) =>
          val k = k0 + 1
          if (i - k >= 0) { num += evs(i - k)._4 * c; den += c }
          else { num += 0.0; den += 0.0 }
        }
        evs(i)._2 -> math.floor((num / den) * 10000 + 0.5) / 10000
      }
    }.toMap
    val got = graft.SparkEntry.queries("q_ewma")(spark, sf)
      .select("event_id", "ewma").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.size == expected.size)
    val bad = got.collect { case (id, v) if v != expected(id) => (id, v, expected(id)) }
    assert(bad.isEmpty, s"first mismatches: ${bad.take(5)}")
  }

  test("q_cdc_apply row accounting agrees with the snapshot diff") {
    val diff = graft.SparkEntry.queries("q_snapshot_diff")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val oldN = spark.read.parquet(s"$sf/orders.parquet").count()
    val merged = graft.SparkEntry.queries("q_cdc_apply")(spark, sf).count()
    assert(merged === oldN - diff.getOrElse("delete", 0L) + diff.getOrElse("insert", 0L))
  }

  test("q_trend_forecast matches a driver-side OLS replay") {
    val daily = graft.Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("y"))
      .collect().map(r => (r.getDate(0), r.getLong(1))).sortBy(_._1.getTime)
    val n = daily.length.toLong
    val ys = daily.map(_._2)
    val ts = (1L to n).toArray
    val (st, stt) = (ts.sum, ts.map(t => t * t).sum)
    val sy = ys.sum
    val sty = ts.zip(ys).map { case (t, y) => t * y }.sum
    val slope = (n * sty - st * sy).toDouble / (n * stt - st * st)
    val icept = (sy - slope * st) / n
    def r4(x: Double): Double = math.floor(x * 10000 + 0.5) / 10000
    val got = graft.SparkEntry.queries("q_trend_forecast")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getDate(1), r.getDouble(2), r.getDouble(3)))
    assert(got.length === 7)
    got.foreach { case (h, fday, s2, f) =>
      assert(s2 === r4(slope))
      assert(f === r4(icept + slope * (n + h)))
      val expectDay = java.time.LocalDate
        .parse(daily.last._1.toString).plusDays(h.toLong)
      assert(fday.toString === expectDay.toString)
    }
  }

  test("q_seasonality matches a driver-side dow-profile replay") {
    val daily = graft.Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getDate(0), r.getLong(1)))
    val tot = daily.map(_._2).sum
    def r4(x: Double): Double = math.floor(x * 10000 + 0.5) / 10000
    val want = daily
      .groupBy(d => java.time.LocalDate.parse(d._1.toString).getDayOfWeek.getValue.toLong)
      .map { case (dow, xs) =>
        val ev = xs.map(_._2).sum
        (dow, xs.length.toLong, ev,
          r4(ev.toDouble / xs.length), r4(ev.toDouble / tot))
      }.toSeq.sortBy(_._1)
    val got = graft.SparkEntry.queries("q_seasonality")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got === want)
    // shares partition the volume
    assert(math.abs(got.map(_._5).sum - 1.0) < 0.001)
  }

  test("q_interarrival matches a driver-side gap replay") {
    val ev = graft.Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
    val gaps = ev.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val sorted = xs.sortBy(x => (x._2.getTime, x._3))
      sorted.zip(sorted.drop(1)).map { case (a, b) =>
        // floor-seconds difference, the query's unix_timestamp semantics
        (b._4, math.floorDiv(b._2.getTime, 1000L) - math.floorDiv(a._2.getTime, 1000L))
      }
    }
    def r4(x: Double): Double = math.floor(x * 10000 + 0.5) / 10000
    val want = gaps.groupBy(_._1).map { case (t, xs) =>
      val gs = xs.map(_._2)
      val mean = gs.map(g => BigDecimal(g.toDouble)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / gs.size
      (t, gs.size.toLong, r4(mean), gs.min, gs.max,
        r4(gs.count(_ < 60).toDouble / gs.size))
    }.toSeq.sortBy(_._1)
    val got = graft.SparkEntry.queries("q_interarrival")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
    assert(got === want)
  }

  test("q_assoc_rules matches a driver-side basket replay") {
    val rows = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val baskets = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val n = baskets.size.toLong
    val freq = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val pairCounts = baskets.values.toSeq
      .flatMap(b => b.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 2)
    def r4(x: Double): Double = math.floor(x * 10000 + 0.5) / 10000
    val want = pairCounts.map { case ((a, b), c) =>
      (a, b, c, r4(c.toDouble / n), r4(c.toDouble / freq(a)),
        r4(c.toDouble * n / (freq(a).toDouble * freq(b))))
    }.toSeq.sortBy { case (a, b, _, _, _, l) => (-l, a, b) }.take(20)
    val got = graft.SparkEntry.queries("q_assoc_rules")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
    assert(got === want)
    // confidence and support are probabilities; lift > 0
    assert(got.forall(g => g._4 >= 0 && g._4 <= 1 && g._5 >= 0 && g._5 <= 1 && g._6 > 0))
  }

  test("q_acf matches an exact driver-side autocorrelation replay") {
    val xs = graft.Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getDate(0).getTime, r.getLong(1)))
      .sortBy(_._1).map(_._2)
    val n = xs.length.toLong
    val tot = xs.sum
    val sxx = xs.map(x => x * x).sum
    val mean = tot.toDouble / n
    def r4(x: Double): Double = math.floor(x * 10000 + 0.5) / 10000
    val want = (1 to 7).map { k =>
      val pairs = xs.dropRight(k).zip(xs.drop(k))
      val s2 = pairs.map { case (a, b) => a * b }.sum
      val sh = pairs.map(_._1).sum
      val st = pairs.map(_._2).sum
      // the query's exact IEEE op order
      val num = s2 - mean * (sh + st) + (n - k) * mean * mean
      (k, r4(num / (sxx - n * mean * mean)))
    }
    val got = graft.SparkEntry.queries("q_acf")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toSeq
    assert(got === want)
    // all autocorrelations are in [-1, 1] up to rounding
    assert(got.forall(g => g._2 >= -1.0001 && g._2 <= 1.0001))
  }

  test("q_cusum matches an exact driver-side AMOC scan") {
    val daily = graft.Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getDate(0), r.getLong(1)))
      .sortBy(_._1.getTime)
    val n = daily.length.toLong
    val total = daily.map(_._2).sum
    var cum = 0L
    var best = (-1L, null: java.sql.Date, 0L, 0L) // |s'|, day, cumx, t
    daily.zipWithIndex.foreach { case ((day, x), i) =>
      cum += x
      val t = i + 1L
      val sp = math.abs(n * cum - t * total)
      if (sp > best._1) best = (sp, day, cum, t) // strict > keeps earliest day
    }
    def r4(x: Double): Double = math.floor(x * 10000 + 0.5) / 10000
    val row = graft.SparkEntry.queries("q_cusum")(spark, sf).collect().head
    assert(row.getAs[Long]("n_days") === n)
    assert(row.getAs[Long]("total_events") === total)
    assert(row.getAs[java.sql.Date]("change_day") === best._2)
    assert(row.getAs[Double]("cusum_stat") ===
      r4(best._1.toDouble / (n.toDouble * total)))
    assert(row.getAs[Double]("mean_before") === r4(best._3.toDouble / best._4))
    if (best._4 < n)
      assert(row.getAs[Double]("mean_after") ===
        r4((total - best._3).toDouble / (n - best._4)))
  }
}
