package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit tests for the custom function surface: the codegen Expression
  * (vs the HOF twin and hand-computed values, plus null/edge cases)
  * and the Aggregator UDAF. */
class FunctionsSpec extends SparkSpec {
  import CosineSimilarity.cosine_sim

  test("cosine_sim matches hand-computed value") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 0.0f, 2.0f), Array(2.0f, 1.0f, 0.0f)))
      .toDF("a", "b")
    val got = df.select(cosine_sim(col("a"), col("b"))).head.getDouble(0)
    val want = 2.0 / (math.sqrt(5.0) * math.sqrt(5.0))
    assert(math.abs(got - want) < 1e-12)
  }

  test("cosine_sim is bit-identical to the HOF formulation") {
    val e = graft.Tables.embeddings(spark, sf).limit(50)
    val pairs = e.select(col("embedding").as("a"))
      .crossJoin(e.select(col("embedding").as("b")))
    val n = pairs.select(
        cosine_sim(col("a"), col("b")).as("x"),
        TextSim.cosine(col("a"), col("b")).as("y"))
      .filter(col("x") =!= col("y"))
      .count()
    assert(n == 0)
  }

  test("cosine_sim null array yields null") {
    import spark.implicits._
    val df = Seq((Some(Array(1.0f)), Option.empty[Array[Float]])).toDF("a", "b")
    assert(df.select(cosine_sim(col("a"), col("b"))).head.isNullAt(0))
  }

  test("cosine_sim interpreted and codegen paths agree") {
    import spark.implicits._
    val df = Seq((Array(0.5f, -1.5f, 3.25f), Array(-2.0f, 0.25f, 1.0f))).toDF("a", "b")
    val expr = CosineSimilarity(
      org.apache.spark.sql.graftbridge.Bridge.expression(col("a")),
      org.apache.spark.sql.graftbridge.Bridge.expression(col("b")))
    val viaPlan = df.select(cosine_sim(col("a"), col("b"))).head.getDouble(0)
    // interpreted eval on the same input
    val row = df.select(col("a"), col("b")).queryExecution.toRdd.first()
    val interpreted = expr.nullSafeEval(row.getArray(0), row.getArray(1))
      .asInstanceOf[Double]
    assert(viaPlan == interpreted)
  }

  test("kernels compile under codegen on a NON-nullable array column") {
    // Round-4 regression: downstream of isnotnull, Catalyst narrows
    // the attribute to non-nullable; without the `nullable=true`
    // override the generated `ev.isNull = true` assigned to a
    // constant-folded slot and Janino rejected the class. With
    // spark.sql.codegen.fallback=false (SparkTestBase) a compile
    // failure now throws instead of degrading, so this test failing
    // loudly IS the guard.
    import spark.implicits._
    val df = Seq(
        (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
        (Array(3.0f, 4.0f), Array(3.0f, 4.0f)))
      .toDF("a", "b")
      .filter(col("a").isNotNull && col("b").isNotNull)
    val cos = df.select(cosine_sim(col("a"), col("b")).as("c"))
      .orderBy("c").collect().map(_.getDouble(0))
    assert(math.abs(cos(0)) < 1e-12 && math.abs(cos(1) - 1.0) < 1e-12)
    val dists = df.select(
        DistArray.dist_array(col("a"), Seq(Seq(0.0, 0.0))).as("d"))
      .collect().map(_.getSeq[Double](0).head).sorted
    assert(math.abs(dists(0) - 1.0) < 1e-12 && math.abs(dists(1) - 25.0) < 1e-12)
  }

  test("kernels null-propagate a null array ELEMENT (containsNull=true)") {
    import spark.implicits._
    val df = Seq(
        (Seq(Some(1.0f), None), Seq(Some(1.0f), Some(2.0f))),
        (Seq(Some(1.0f), Some(0.0f)), Seq(Some(1.0f), Some(0.0f))))
      .toDF("a", "b")
    val cos = df.select(cosine_sim(col("a"), col("b")).as("c")).collect()
    assert(cos.count(_.isNullAt(0)) == 1)
    assert(cos.exists(r => !r.isNullAt(0) && math.abs(r.getDouble(0) - 1.0) < 1e-12))
    val d = df.select(
      DistArray.dist_array(col("a"), Seq(Seq(0.0, 0.0))).as("d")).collect()
    assert(d.count(_.isNullAt(0)) == 1)
    assert(d.exists(r => !r.isNullAt(0) &&
      math.abs(r.getSeq[Double](0).head - 1.0) < 1e-12))
  }

  test("native JaccardCoeff equals the array_intersect/union formulation") {
    val docs = graft.Tables.documents(spark, sf).limit(80)
      .withColumn("toks", array_distinct(split(col("text"), " ")))
    val pairs = docs.select(col("toks").as("a"))
      .crossJoin(docs.select(col("toks").as("b")).limit(20))
    val n = pairs.select(
        TextSim.jaccard(col("a"), col("b")).as("x"),
        TextSim.jaccardHof(col("a"), col("b")).as("y"))
      .filter(col("x") =!= col("y")).count()
    assert(n == 0)
  }

  test("native SimHash64 is bit-identical to the HOF formulation") {
    val docs = graft.Tables.documents(spark, sf).limit(100)
      .withColumn("toks", split(col("text"), " "))
    val n = docs.select(
        SimHash64.simhash64(col("toks")).as("a"),
        TextSim.simhash64("toks").as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(n == 0)
  }

  test("tokenHash UTF-8 byte decode agrees with String code-point iteration on multi-byte input") {
    // 1-, 2-, 3-, and 4-byte UTF-8 sequences (the 4-byte case is a
    // surrogate PAIR in the String form — codePointAt must see one
    // code point, and the byte decoder the same one)
    val cases = Seq("", "abc", "café", "日本語",
      new String(Character.toChars(0x1F600)) + "mixß中")
    cases.foreach { t =>
      val viaString = {
        var h1 = 0L; var h2 = 0L; var i = 0
        while (i < t.length) {
          val cp = t.codePointAt(i)
          h1 = (h1 * 131 + cp) % 2147483647L
          h2 = (h2 * 137 + cp) % 2147483629L
          i += Character.charCount(cp)
        }
        (h1 << 31) | h2
      }
      val viaBytes = SimHash64.tokenHashU(
        org.apache.spark.unsafe.types.UTF8String.fromString(t))
      assert(viaBytes == viaString, s"decode mismatch on ${t.codePoints().toArray.toSeq}")
    }
  }

  test("native Shingles is set-identical to the HOF formulation") {
    val docs = graft.Tables.documents(spark, sf).limit(100)
      .withColumn("toks", split(col("text"), " "))
    val n = docs.select(
        array_sort(TextSim.shingles(col("toks"), 3)).as("a"),
        array_sort(TextSim.shinglesHof(col("toks"), 3)).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(n == 0)
    // short-input guard: fewer tokens than n -> whole input as one shingle
    import spark.implicits._
    val short = Seq(Seq("only", "two")).toDF("t")
      .select(TextSim.shingles(col("t"), 3)).head.getSeq[String](0)
    assert(short == Seq("only two"))
  }

  test("SimHash is permutation-invariant; MinHash Jaccard estimate tracks truth") {
    import spark.implicits._
    val text = graft.Tables.documents(spark, sf)
      .select("text").head.getString(0)
    val toks = text.split(" ").toSeq
    val perm = (toks.reverse ++ Seq.empty).toSeq
    val df = Seq((toks, perm)).toDF("a", "b")
    val r = df.select(
      SimHash64.simhash64(col("a")).as("sa"),
      SimHash64.simhash64(col("b")).as("sb")).head
    assert(r.getLong(0) == r.getLong(1)) // bag-of-tokens: order-free
    // MinHash collision fraction approximates Jaccard: identical sets
    // must agree on every component
    val m = df.select(
      MinHashSignature.minhash_signature(col("a"), 32).as("ma"),
      MinHashSignature.minhash_signature(col("b"), 32).as("mb")).head
    assert(m.getSeq[Long](0) == m.getSeq[Long](1))
  }

  test("native MinHash signature: min-merge property and determinism") {
    import spark.implicits._
    val df = Seq(
      (Seq("a b c", "d e f"), Seq("g h i")),
      (Seq("a b c", "d e f", "g h i"), Seq[String]())).toDF("x", "y")
    // sig(x ++ y) == elementwise min(sig(x), sig(y ++ x)) when x++y
    // covers the same element set — check via the concatenated column
    val sigs = df.select(
      MinHashSignature.minhash_signature(concat(col("x"), col("y")), 16).as("s"))
      .collect().map(_.getSeq[Long](0))
    assert(sigs(0) == sigs(1)) // same element multiset -> same signature
    // empty input -> sentinel array
    val empty = Seq(Seq.empty[String]).toDF("x")
      .select(MinHashSignature.minhash_signature(col("x"), 4)).head.getSeq[Long](0)
    assert(empty.forall(_ == Long.MaxValue))
  }

  test("WeightedAvg aggregator: hand-checked groups and merge path") {
    import spark.implicits._
    val wavg = udaf(new WeightedAvg(),
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaDouble,
        org.apache.spark.sql.Encoders.scalaDouble))
    // repartition(4) forces non-trivial partial-buffer merges
    val df = Seq(("a", 10.0, 1.0), ("a", 20.0, 3.0), ("b", 5.0, 2.0))
      .toDF("k", "x", "w").repartition(4)
    val got = df.groupBy("k").agg(wavg(col("x"), col("w")).as("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(got("a") - 70.0 / 4.0) < 1e-12)
    assert(math.abs(got("b") - 5.0) < 1e-12)
  }
}
