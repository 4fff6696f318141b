package graft.ops

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Ground truths for the corpus-hygiene passes that the DuckDB oracle
  * alone doesn't pin down: span-dedup global invariants, redaction
  * completeness, and bit-exact format round-trips.
  */
class CorpusHygieneSpec extends SparkSpec {

  test("q_dedup_span keeps each distinct span exactly once, corpus-wide") {
    val res = SparkEntry.queries("q_dedup_span")(spark, sf)
    val spans = Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0), ceil(size(col("toks")).cast("double") / 8).cast("int") - 1),
        i => array_join(slice(col("toks"), i * 8 + 1, lit(8)), " ")))
        .as(Seq("pos", "span")))
    val nDistinct = spans.select("span").distinct().count()
    val agg = res.agg(
      sum(col("n_kept")).as("kept"), sum(col("n_spans")).as("all")).head()
    assert(agg.getLong(0) == nDistinct,
      s"sum(n_kept)=${agg.getLong(0)} != corpus distinct spans $nDistinct")
    assert(agg.getLong(1) == spans.count(), "n_spans must tile the corpus")
    // reassembled text carries exactly the kept spans' tokens
    val reTokens = res.filter(col("text_clean") =!= "")
      .select(size(split(col("text_clean"), " ")).cast("long").as("nt"))
      .agg(sum("nt")).head().getLong(0)
    val keptTokens = spans
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("span").orderBy("doc_id", "pos")))
      .filter(col("rn") === 1)
      .select(size(split(col("span"), " ")).cast("long").as("nt"))
      .agg(sum("nt")).head().getLong(0)
    assert(reTokens == keptTokens, s"reassembly tokens $reTokens != kept $keptTokens")
  }

  test("q_fingerprint matches a driver-side recompute; min-shingle-hash is order-sensitive") {
    // independent recompute: plain Scala shingling + the SPEC of the
    // hash (double code-point Horner mod the two largest 31-bit
    // primes, packed) reimplemented from its constants — no Catalyst
    // expressions, no graft.functions call, in the loop
    def specHash(t: String): Long = {
      var h1 = 0L; var h2 = 0L; var i = 0
      while (i < t.length) {
        val cp = t.codePointAt(i)
        h1 = (h1 * 131 + cp) % 2147483647L
        h2 = (h2 * 137 + cp) % 2147483629L
        i += Character.charCount(cp)
      }
      (h1 << 31) | h2
    }
    def minShingleHash(text: String): Long = {
      val toks = text.split(" ", -1).toSeq
      val shingles = toks.sliding(4).map(_.mkString(" ")).toSeq.distinct
      shingles.map(specHash).min
    }

    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val res = SparkEntry.queries("q_fingerprint")(spark, sf).collect()
    assert(res.length == docs.size && res.nonEmpty)
    res.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == minShingleHash(docs(id)),
        s"min_shingle_hash mismatch for doc $id")
    }
    // simhash column ≡ the native expression the suite already proves
    // bit-identical to its HOF twin (FunctionsSpec) — here just pin
    // the wiring: recompute via an independent one-column plan
    val simTwin = Tables.documents(spark, sf)
      .select(col("doc_id"),
        graft.functions.SimHash64.simhash64(split(col("text"), " ")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    res.foreach(r => assert(r.getLong(2) == simTwin(r.getLong(0))))

    // permutation sensitivity: SimHash is bag-of-tokens (invariant,
    // FunctionsSpec), while the shingle fingerprint must SEE order —
    // reversing the tokens of any long-enough doc changes the shingle
    // set and (modulo a 2^-64 collision) the min hash
    val longDoc = docs.values.find(_.split(" ").length >= 8).get
    val reversed = longDoc.split(" ", -1).reverse.mkString(" ")
    assert(minShingleHash(longDoc) != minShingleHash(reversed),
      "min-shingle-hash failed to distinguish a token permutation")
  }

  test("q_zipf_fit matches a driver-side least-squares replay") {
    val counts = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val top = counts.sortBy { case (t, c) => (-c, t) }.take(100)
    def dec6(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val xy = top.zipWithIndex.map { case ((_, c), i) =>
      (math.log((i + 1).toDouble), math.log(c.toDouble))
    }
    val k = xy.length.toDouble
    val sx = xy.map(p => dec6(p._1)).sum.toDouble
    val sy = xy.map(p => dec6(p._2)).sum.toDouble
    val sxx = xy.map(p => dec6(p._1 * p._1)).sum.toDouble
    val sxy = xy.map(p => dec6(p._1 * p._2)).sum.toDouble
    val syy = xy.map(p => dec6(p._2 * p._2)).sum.toDouble
    def r4(x: Double): Double = math.floor(x * 10000 + 0.5) / 10000
    val slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    val row = SparkEntry.queries("q_zipf_fit")(spark, sf).collect().head
    assert(row.getAs[Long]("n_terms") === top.length.toLong)
    assert(row.getAs[Double]("slope") === r4(slope))
    assert(row.getAs[Double]("intercept") === r4((sy - slope * sx) / k))
    assert(row.getAs[Double]("r2") === r4(
      ((k * sxy - sx * sy) * (k * sxy - sx * sy))
        / ((k * sxx - sx * sx) * (k * syy - sy * sy))))
    // corpus sanity: a rank-frequency law fits decreasingly — slope < 0
    assert(row.getAs[Double]("slope") < 0.0)
  }

  test("q_kl_mix matches a driver-side smoothed-KL replay and is non-negative") {
    val docs = Tables.documents(spark, sf)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ").filter(_.nonEmpty)))
    val corpus = docs.flatMap(_._2).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val v = corpus.size.toLong
    val nc = corpus.values.sum
    def r4(x: Double): Double = math.floor(x * 10000 + 0.5) / 10000
    val want = docs.groupBy(_._1).map { case (src, ds) =>
      val toks = ds.flatMap(_._2)
      val cs = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
        .withDefaultValue(0L)
      val ns = toks.size.toLong
      val kl = corpus.map { case (t, cc) =>
        val ps = (cs(t) + 1).toDouble / (ns + v)
        val pc = (cc + 1).toDouble / (nc + v)
        BigDecimal(ps * math.log(ps / pc))
          .setScale(10, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      (src, ns, r4(kl.toDouble))
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q_kl_mix")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === want)
    // KL of smoothed distributions over a shared support is ≥ 0 up to
    // the 4-decimal rounding
    assert(got.forall(_._3 >= -0.0001))
  }

  test("q_pii_redact leaves no digits and accounts for every masked char") {
    val res = SparkEntry.queries("q_pii_redact")(spark, sf)
    assert(res.filter(col("redacted").rlike("[0-9]")).count() == 0,
      "digits survived redaction")
    assert(res.filter(col("n_redacted") === 0).count() == 0,
      "fixture rows all carry a user id — every row must redact something")
    // length bookkeeping: redacted = raw - masked digit chars + 5·"<NUM>"
    val raw = Tables.events(spark, sf).select(col("event_id"),
      length(concat(col("event_type"), lit(" user="), col("user_id"),
        lit(" "), col("props"))).as("raw_len"))
    val bad = res.join(raw, "event_id")
      .filter(length(col("redacted"))
        =!= col("raw_len") - col("n_digit_chars") + col("n_redacted") * 5)
      .count()
    assert(bad == 0, "redacted length != raw - digit chars + 5*n_redacted")
  }

  test("format round-trips are bit-exact (csv, json, orc)") {
    val cols = Seq("l_orderkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_returnflag", "l_linestatus").map(col)
    val src = Tables.lineitem(spark, sf).select(cols: _*)
    for (fmt <- Seq("csv", "json", "orc")) {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_rt_spec_$fmt"
      val w = src.write.mode("overwrite")
      (if (fmt == "csv") w.option("header", "true") else w).format(fmt).save(out)
      val r = spark.read.schema(
        "l_orderkey BIGINT, l_linenumber INT, l_quantity DOUBLE, " +
          "l_extendedprice DOUBLE, l_returnflag STRING, l_linestatus STRING")
      val back = (if (fmt == "csv") r.option("header", "true") else r)
        .format(fmt).load(out)
      assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty,
        s"$fmt round-trip not lossless")
    }
  }
}
