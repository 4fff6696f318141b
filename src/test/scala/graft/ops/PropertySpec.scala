package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** scalacheck-generated property tests (SURVEY.md §5.3): relational
  * algebra laws the engine's join / set-op / window rewrites must
  * preserve. Generators are sampled with fixed seeds (no scalatestplus
  * bridge in the offline dependency set, and determinism is a feature
  * here).
  */
class PropertySpec extends SparkSpec {

  private val keyVal: Gen[List[(Int, Int)]] =
    Gen.listOfN(40, Gen.zip(Gen.choose(0, 8), Gen.choose(0, 100)))

  /** Deterministically sample n values from a generator. */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private def df(rows: List[(Int, Int)], k: String = "k", v: String = "v") = {
    val schema = StructType(Seq(StructField(k, IntegerType), StructField(v, IntegerType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 3), schema)
  }

  private def cases2: Seq[(List[(Int, Int)], List[(Int, Int)])] =
    samples(Gen.zip(keyVal, keyVal), 5)

  test("semi + anti partition the left side; semi = distinct-key inner") {
    cases2.foreach { case (l, r) =>
      val left = df(l); val right = df(r, "k2", "v2")
      val cond = left("k") === right("k2")
      val semi = left.join(right, cond, "left_semi")
      val anti = left.join(right, cond, "left_anti")
      assert(semi.count() + anti.count() == left.count())
      assert(semi.unionAll(anti).exceptAll(left).isEmpty)
      val innerKeys = left.join(right, cond, "inner").select("k").distinct()
      assert(semi.select("k").distinct().exceptAll(innerKeys).isEmpty)
      assert(innerKeys.exceptAll(semi.select("k").distinct()).isEmpty)
    }
  }

  test("union/except cardinality laws") {
    cases2.foreach { case (a, b) =>
      val da = df(a); val db = df(b)
      assert(da.unionAll(db).count() == da.count() + db.count())
      // |A exceptAll B| = |A| - |A intersectAll B|
      assert(da.exceptAll(db).count() == da.count() - da.intersectAll(db).count())
      // distinct union == distinct of unionAll
      assert(da.union(db).distinct().count() == da.unionAll(db).distinct().count())
    }
  }

  test("dedup idempotence and containment") {
    samples(keyVal, 5).foreach { rows =>
      val d = df(rows)
      val once = d.dropDuplicates("k")
      val twice = once.dropDuplicates("k")
      assert(once.count() == twice.count())
      // containment checked row-wise: exceptAll(self-ancestor) trips
      // a Spark attribute-binding bug on shared lineage
      val allRows = d.collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      assert(once.collect().map(r => (r.getInt(0), r.getInt(1))).forall(allRows.contains))
      assert(once.count() == d.select("k").distinct().count())
    }
  }

  test("window running sum per partition ends at the group sum") {
    samples(keyVal, 5).foreach { rows =>
      val d = df(rows)
      // v >= 0, so the running sum is monotone and max == final
      val w = org.apache.spark.sql.expressions.Window.partitionBy("k")
        .orderBy("v").rowsBetween(Long.MinValue, 0)
      val lastRunning = d.withColumn("rs", sum("v").over(w))
        .groupBy("k").agg(max("rs").as("final_rs"))
      val groupSum = d.groupBy("k").agg(sum("v").as("s"))
      val joined = lastRunning.join(groupSum, "k")
        .filter(col("final_rs") =!= col("s"))
      assert(joined.isEmpty)
    }
  }

  test("full outer join row accounting") {
    cases2.foreach { case (l, r) =>
      val left = df(l).select("k").distinct()
      val right = df(r, "k2", "v2").select("k2").distinct()
      val full = left.join(right, left("k") === right("k2"), "full_outer")
      val inner = left.join(right, left("k") === right("k2"), "inner")
      assert(full.count() == left.count() + right.count() - inner.count())
    }
  }

  test("approx sketches stay inside their error bounds vs exact") {
    val li = graft.Tables.lineitem(spark, sf)
    val exact = li.select(countDistinct("l_partkey")).head.getLong(0)
    val approx = li.select(approx_count_distinct("l_partkey")).head.getLong(0)
    // default rsd = 0.05; allow 3 sigma
    assert(math.abs(approx - exact) <= math.max(1, (0.15 * exact).toLong),
      s"HLL estimate $approx too far from exact $exact")
    val exactMedian = li.select(expr("percentile(l_extendedprice, 0.5)")).head.getDouble(0)
    val approxMedian = li.select(percentile_approx(col("l_extendedprice"), lit(0.5),
      lit(1000))).head.getDouble(0)
    assert(math.abs(approxMedian - exactMedian) / exactMedian < 0.05)
  }

  test("q_agg_sketch two-level HLL union stays near exact per-group distincts") {
    val li = graft.Tables.lineitem(spark, sf)
    val exact = li.groupBy("l_returnflag").agg(countDistinct("l_partkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sketched = graft.SparkEntry.queries("q_agg_sketch")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sketched.keySet == exact.keySet)
    // Datasketches HLL at default lgK=12 is ~1.6% rsd; allow 3 sigma.
    // The point under test: sketches built per (rf, ls) subgroup and
    // UNION-MERGED per rf agree with a direct exact count — i.e. the
    // sketch survives re-aggregation losslessly enough to be the
    // persist-then-merge primitive.
    sketched.foreach { case (k, est) =>
      assert(math.abs(est - exact(k)) <= math.max(1, (0.05 * exact(k)).toLong),
        s"group $k: union estimate $est vs exact ${exact(k)}")
    }
  }

  test("q_agg_sketch_exact is EXACTLY the per-group distinct count (coupon-mode regime)") {
    // the oracle's load-bearing claim: at lgK=14 the per-group
    // supplier cardinality stays below the coupon→HLL-register
    // transition, where the rounded merged-sketch estimate IS the
    // exact distinct count — equality, not an error bound
    val li = graft.Tables.lineitem(spark, sf)
    val exact = li.groupBy("l_returnflag").agg(countDistinct("l_suppkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sketched = graft.SparkEntry.queries("q_agg_sketch_exact")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sketched == exact, s"coupon-exact sketch diverged: $sketched vs $exact")
  }

  test("Dist.prefixSum equals the naive global window on random data") {
    val gen: Gen[List[(Long, Long)]] = for {
      n <- Gen.choose(1, 200)
      keys <- Gen.pick(n, 0L until 10000L)
      vals <- Gen.listOfN(n, Gen.choose(0L, 1000L))
    } yield keys.toList.zip(vals)
    samples(gen, 5).foreach { rows =>
      val schema = StructType(Seq(
        StructField("id", LongType), StructField("v", LongType)))
      val d = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 3), schema)
      val got = Dist.prefixSum(d, "id", "v", "cum")
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      val expected = rows.sortBy(_._1)
        .scanLeft((0L, 0L)) { case ((_, acc), (id, v)) => (id, acc + v) }
        .drop(1).toMap
      assert(got == expected, s"rows=${rows.size}")
    }
  }

  test("Dist.prefixSum is exact at key ranges near Long.MaxValue (bucket math must not wrap)") {
    // Keys cluster at both ends of the Long domain: (hi-lo) ≈ 2^64,
    // so any native-Long `(key - lo) * p` bucket arithmetic wraps and
    // silently breaks bucket monotonicity. The double-space bucketing
    // collapses same-end neighbors into one bucket — allowed — but
    // the prefix sums must still be exactly the sorted running total.
    val ends =
      (0L until 40L).map(i => Long.MinValue + i * 7) ++
      (0L until 40L).map(i => Long.MaxValue - i * 11) ++
      Seq(-1L, 0L, 1L, Long.MinValue / 3, Long.MaxValue / 3)
    val rows = ends.distinct.zipWithIndex.map { case (k, i) => (k, (i % 13).toLong + 1) }
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", LongType)))
    val d = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 5), schema)
    val got = Dist.prefixSum(d, "id", "v", "cum")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val expected = rows.sortBy(_._1)
      .scanLeft((0L, 0L)) { case ((_, acc), (id, v)) => (id, acc + v) }
      .drop(1).toMap
    assert(got == expected)

    // keyed twin under the same extreme range
    val keyedRows = rows.map { case (k, v) => (if (v % 2 == 0) "a" else "b", k, v) }
    val schema2 = StructType(Seq(StructField("g", StringType),
      StructField("id", LongType), StructField("v", LongType)))
    val d2 = spark.createDataFrame(
      spark.sparkContext.parallelize(keyedRows.map(r => Row(r._1, r._2, r._3)), 5), schema2)
    val got2 = Dist.prefixSumKeyed(d2, Seq("g"), "id", "v", "cum")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    val expected2 = keyedRows.groupBy(_._1).flatMap { case (g, grp) =>
      grp.sortBy(_._2)
        .scanLeft((g, 0L, 0L)) { case ((_, _, acc), (_, id, v)) => (g, id, acc + v) }
        .drop(1).map { case (gg, id, c) => (gg, id) -> c }
    }
    assert(got2 == expected2)
  }

  test("prefix+positional filter finds EXACTLY the J>=0.5 pairs on random corpora") {
    // the AllPairs prefix bound and the PPJoin positional filter are
    // both proved exact on paper (Dedup.ngramPairsOf); this checks the
    // proof survives implementation details (ANSI ceil semantics, the
    // epsilon guards, duplicate tokens, single-token docs, block
    // boundaries) on arbitrary data — a recall bug here silently
    // under-merges every consumer (ngram/edit/cluster/pipeline_train)
    val gen: Gen[List[(Long, String, String)]] = for {
      n <- Gen.choose(4, 28)
      rows <- Gen.listOfN(n, for {
        lang <- Gen.oneOf("en", "de")
        len <- Gen.choose(1, 24)
        toks <- Gen.listOfN(len, Gen.choose(0, 19).map(i => s"w$i"))
      } yield (lang, toks.mkString(" ")))
    } yield rows.zipWithIndex.map { case ((lang, text), i) => (i.toLong, lang, text) }
    samples(gen, 8).foreach { rows =>
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("lang", StringType),
        StructField("source", StringType), StructField("text", StringType)))
      val d = spark.createDataFrame(
        spark.sparkContext.parallelize(
          rows.map(r => Row(r._1, r._2, "s0", r._3)), 3), schema)
      val got = Dedup.ngramPairsOf(d)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // brute force over distinct token sets within (lang, source)
      val sets = rows.map(r => (r._1, r._2, r._3.split(" ").toSet))
      val want = (for {
        (ia, la, sa) <- sets; (ib, lb, sb) <- sets
        if ia < ib && la == lb
        j = sa.intersect(sb).size.toDouble / sa.union(sb).size
        if j >= 0.5
      } yield (ia, ib)).toSet
      assert(got == want,
        s"missed=${want -- got} extra=${got -- want} over ${rows.size} docs")
    }
  }

  test("star-contraction CC ≡ union-find on random graphs") {
    // both CC formulations must produce min-id component labels on
    // ANY topology — random graphs hit shapes the fixture corpus and
    // the hand-built chains never do (multi-hub merges, dense blobs,
    // many singleton edges)
    val gen: Gen[List[(Long, Long)]] = for {
      n <- Gen.choose(1, 60)
      edges <- Gen.listOfN(n,
        Gen.zip(Gen.choose(0L, 30L), Gen.choose(0L, 30L)))
    } yield edges.filter(e => e._1 != e._2)
    samples(gen, 6).filter(_.nonEmpty).foreach { edges =>
      val schema = StructType(Seq(
        StructField("doc_a", LongType), StructField("doc_b", LongType)))
      val d = spark.createDataFrame(
        spark.sparkContext.parallelize(edges.map(e => Row(e._1, e._2)), 3), schema)
      val got = Dedup.connectedComponentsStar(d).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // driver union-find ground truth
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = parent.keys.map(x => x -> find(x)).toMap
      assert(got == want,
        s"edges=$edges\n got=$got\n want=$want")
    }
  }

  test("freqItems heavy-hitter guarantee: frequent keys always surface") {
    // single-pass approximate frequent items (Karp-style): any value
    // with true frequency > support MUST appear (false positives
    // allowed, false negatives not) — the heavy-hitters primitive a
    // top-terms pass uses when the vocabulary won't fit an exact count
    val li = graft.Tables.lineitem(spark, sf)
    val support = 0.3
    val hits = li.stat.freqItems(Array("l_returnflag"), support)
      .head.getSeq[String](0).toSet
    val n = li.count()
    val mustHave = li.groupBy("l_returnflag").count()
      .filter(col("count") > n * support)
      .collect().map(_.getString(0)).toSet
    assert(mustHave.subsetOf(hits), s"missing heavy hitters: ${mustHave -- hits}")
  }

  test("udf() registration surface: squared-distance UDF round-trips") {
    // the one sanctioned UDF demo (SURVEY.md §2 UDF/UDAF/UDTF row) —
    // everything in the library proper uses built-ins/Expressions
    val sq = spark.udf.register("graft_sq", (x: Double) => x * x)
    import spark.implicits._
    val out = Seq(1.5, -2.0).toDF("x")
      .select(sq(col("x")).as("a"), expr("graft_sq(x)").as("b")).collect()
    assert(out.map(_.getDouble(0)).toSeq == Seq(2.25, 4.0))
    assert(out.map(_.getDouble(1)).toSeq == Seq(2.25, 4.0))
  }

  test("spec token hash: UTF-8 byte decode ≡ String code-point fold on random unicode") {
    // the whole oracle tier hangs off this agreement (SimHash,
    // MinHash, fingerprint): generated strings mix ASCII, 2-byte
    // (Latin/Greek), 3-byte (CJK), and 4-byte (supplementary-plane)
    // code points, plus spaces and empties
    val cp: Gen[Int] = Gen.frequency(
      6 -> Gen.choose(0x20, 0x7E),
      2 -> Gen.choose(0xA0, 0x7FF),
      2 -> Gen.choose(0x4E00, 0x9FFF),
      1 -> Gen.choose(0x10000, 0x10FFFF))
    val str: Gen[String] = Gen.choose(0, 24).flatMap(n =>
      Gen.listOfN(n, cp).map(_.flatMap(Character.toChars(_)).mkString))
    def viaString(t: String): Long = {
      var h1 = 0L; var h2 = 0L; var i = 0
      while (i < t.length) {
        val c = t.codePointAt(i)
        h1 = (h1 * 131 + c) % 2147483647L
        h2 = (h2 * 137 + c) % 2147483629L
        i += Character.charCount(c)
      }
      (h1 << 31) | h2
    }
    samples(str, 200).foreach { t =>
      val got = graft.functions.SimHash64.tokenHashU(
        org.apache.spark.unsafe.types.UTF8String.fromString(t))
      assert(got == viaString(t),
        s"byte-decode diverged on code points ${t.codePoints().toArray.toSeq}")
    }
  }
}
