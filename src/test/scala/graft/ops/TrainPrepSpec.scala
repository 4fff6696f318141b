package graft.ops

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Ground truths for the chunking / mixture-sampling / repetition /
  * BM25 operators beyond their DuckDB oracles: coverage and overlap
  * invariants for q_chunk, rate calibration for q_mix_sample, a
  * driver-side exact recompute for q_repetition's bigram stats, and
  * a from-scratch BM25 differential.
  */
class TrainPrepSpec extends SparkSpec {

  private val sf001 = "/root/testdata/sf0.001"
  private val sf01  = "/root/testdata/sf0.01"

  test("q_ngram_novelty matches a driver-side first-occurrence replay") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def shingles(text: String): Set[String] = {
      val t = text.split(" ")
      if (t.length < 3) t.sliding(t.length.max(1)).map(_.mkString(" ")).toSet
      else t.sliding(3).map(_.mkString(" ")).toSet
    }
    val perDoc = docs.map { case (id, t) => id -> shingles(t) }
    val firstOwner = perDoc.flatMap { case (id, sh) => sh.map(_ -> id) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).min }
    def r4(x: Double): Double = math.floor(x * 10000 + 0.5) / 10000
    val want = perDoc.filter(_._2.nonEmpty).map { case (id, sh) =>
      val novel = sh.count(g => firstOwner(g) == id).toLong
      (id, sh.size.toLong, novel, r4(novel.toDouble / sh.size))
    }.sortBy { case (id, _, _, nv) => (nv, id) }.take(20).toSeq
    val got = SparkEntry.queries("q_ngram_novelty")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got === want)
  }

  test("q_bpe_train matches a driver-side greedy merge replay") {
    var docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).toVector))
    val want = (1 to TrainPrep.BpeRounds).map { r =>
      val counts = docs.flatMap { case (_, toks) =>
        toks.zip(toks.drop(1)).filter(p => p._1 != p._2)
      }.groupBy(identity).view.mapValues(_.size.toLong)
      val ((a, b), c) = counts.toSeq.minBy { case ((x, y), n) => (-n, x, y) }
      // non-overlapping left-to-right merge: a != b so matches never chain
      docs = docs.map { case (id, toks) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < toks.length) {
          if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
            out += s"$a $b"; i += 2
          } else { out += toks(i); i += 1 }
        }
        (id, out.result())
      }
      (r, a, b, c, docs.map(_._2.size.toLong).sum)
    }
    val got = graft.SparkEntry.queries("q_bpe_train")(spark, sf001)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === want)
    // the merged pair's count must be non-increasing across rounds
    // (each merge removes its occurrences from the stream)
    assert(want.map(_._4).zip(want.map(_._4).tail).forall { case (x, y) => y <= x })
  }

  test("q_dsir_sample matches a driver-side importance-weight replay") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def bucket(t: String): Long = {
      var h = 0L
      t.foreach(c => h = (h * 131 + c.toLong) % 2147483647L)
      h % TrainPrep.DsirBuckets
    }
    val occ = docs.flatMap { case (id, lang, text) =>
      text.split(" ").filter(_.nonEmpty).map(t => (id, lang, bucket(t)))
    }
    val cr = occ.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val ct = occ.filter(_._2 == "en").groupBy(_._3).view
      .mapValues(_.size.toLong).toMap.withDefaultValue(0L)
    val nr = occ.size.toLong
    val nt = occ.count(_._2 == "en").toLong
    val nb = TrainPrep.DsirBuckets
    val lnr = cr.map { case (b, c) =>
      b -> math.log(((ct(b) + 1).toDouble / (nt + nb)) / ((c + 1).toDouble / (nr + nb)))
    }
    def r4(x: Double): Double = math.floor(x * 10000 + 0.5) / 10000
    // Det.dsum replay: per-addend DECIMAL(18,8) HALF_UP cast, exact sum
    val want = occ.groupBy(_._1).map { case (id, xs) =>
      val s = xs.map { case (_, _, b) =>
        BigDecimal(lnr(b)).setScale(8, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      (id, r4(s.toDouble), xs.size.toLong)
    }.toSeq.sortBy { case (id, w, _) => (-w, id) }.take(TrainPrep.DsirK)
    val got = SparkEntry.queries("q_dsir_sample")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(got === want)
    // the target-domain docs should rank ahead of the field on average:
    // mean weight of selected en docs >= mean of selected non-en docs
    // (weak but directional — the fixture's langs share one vocabulary)
    val langOf = docs.map(d => d._1 -> d._2).toMap
    val (en, rest) = got.partition(g => langOf(g._1) == "en")
    if (en.nonEmpty && rest.nonEmpty)
      assert(en.map(_._2).sum / en.size >= rest.map(_._2).sum / rest.size)
  }

  test("q_chunk covers every token exactly and overlaps by stride") {
    val chunks = SparkEntry.queries("q_chunk")(spark, sf001)
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_tok"))
    // full coverage: chunks start at 0 and the last chunk ends at n_tok
    val cov = chunks.groupBy("doc_id")
      .agg(min(col("start")).as("lo"),
        max(col("start") + col("n_chunk_tokens")).as("hi"),
        count(lit(1)).as("n_chunks"))
      .join(docs, "doc_id")
    assert(cov.filter(col("lo") =!= 0 || col("hi") =!= col("n_tok")).isEmpty)
    // stride: consecutive chunks start exactly 48 apart
    val gaps = chunks.select(col("doc_id"), col("chunk_id"), col("start"))
      .withColumn("next_start", lead("start", 1)
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("chunk_id")))
      .filter(col("next_start").isNotNull && col("next_start") - col("start") =!= 48)
    assert(gaps.isEmpty)
    // every non-final chunk is full-length (64), so overlap is 16
    val short = chunks.withColumn("max_id",
        max("chunk_id").over(org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
      .filter(col("chunk_id") < col("max_id") && col("n_chunk_tokens") =!= 64)
    assert(short.isEmpty)
  }

  test("q_decontaminate_bloom ≡ exact decontamination (FPs die in the confirm join)") {
    val exact = graft.SparkEntry.queries("q_decontaminate")(spark, sf).collect()
    val bloom = graft.SparkEntry.queries("q_decontaminate_bloom")(spark, sf).collect()
    assert(exact.nonEmpty, "fixture produced no contaminated docs — test is vacuous")
    assert(bloom.map(_.toString).toSeq == exact.map(_.toString).toSeq)
  }

  test("q_mix_sample keeps src0 fully and calibrates to the rate") {
    val kept = SparkEntry.queries("q_mix_sample")(spark, sf01)
    val perSource = spark.read.parquet(s"$sf01/documents.parquet")
      .groupBy("source").agg(count(lit(1)).as("n"))
      .join(kept.groupBy("source").agg(count(lit(1)).as("k")), Seq("source"), "left")
      .na.fill(0L, Seq("k"))
      .withColumn("sfx", substring(col("source"), 4, 10).cast("int"))
      .withColumn("rate", (lit(20) - col("sfx")) / 20.0)
      .collect()
    perSource.foreach { r =>
      val (n, k, rate) = (r.getAs[Long]("n"), r.getAs[Long]("k"), r.getAs[Double]("rate"))
      if (rate >= 1.0) assert(k == n, s"src rate 1.0 must keep all: $r")
      // binomial-ish tolerance at n=25 per source
      assert(math.abs(k.toDouble / n - rate) <= 0.35, s"calibration: $r")
    }
  }

  test("q_repetition matches a driver-side exact recompute") {
    val got = SparkEntry.queries("q_repetition")(spark, sf001)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4))).toMap
    def r4(x: Double): Double = math.floor(x * 10000 + 0.5) / 10000
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id", "text").collect()
    assert(docs.nonEmpty && got.nonEmpty)
    docs.foreach { row =>
      val id = row.getLong(0)
      val toks = row.getString(1).split(" ", -1)
      val bgs = toks.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
      if (bgs.nonEmpty) {
        val topTok = toks.groupBy(identity).values.map(_.size).max.toDouble / toks.length
        val topBg = bgs.groupBy(identity).values.map(_.size).max.toDouble / bgs.size
        val dup = (toks.length - toks.distinct.length).toDouble / toks.length
        val (gTok, gBg, gDup, gFlag) = got(id)
        assert(gTok == r4(topTok) && gBg == r4(topBg) && gDup == r4(dup),
          s"doc $id: got ($gTok,$gBg,$gDup) want (${r4(topTok)},${r4(topBg)},${r4(dup)})")
        assert(gFlag == (topBg > 0.18 || dup > 0.5), s"flag for doc $id")
      }
    }
  }

  test("q_bm25 matches a from-scratch scoring") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq).toMap
    val terms = Seq("data", "query", "spark")
    val n = docs.size.toDouble
    val avgdl = docs.values.map(_.size.toLong).sum.toDouble / n
    val tf = for {
      (id, toks) <- docs.toSeq; t <- terms
      c = toks.count(_ == t) if c > 0
    } yield (id, t, c, toks.size)
    val df = tf.groupBy(_._2).map { case (t, xs) => t -> xs.size }
    val idf = df.map { case (t, d) => t -> math.log(1.0 + (n - d + 0.5) / (d + 0.5)) }
    def dec6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val scores = tf.groupBy(_._1).map { case (id, xs) =>
      id -> xs.map { case (_, t, c, dl) =>
        dec6(idf(t) * (c * 2.2) / (c + 1.2 * (0.25 + 0.75 * dl / avgdl)))
      }.sum
    }
    def r4(x: Double): Double = math.floor(x * 10000 + 0.5) / 10000
    val want = scores.toSeq.sortBy { case (id, s) => (-s, id) }.take(10)
      .map { case (id, s) => (id, r4(s)) }
    val gotRows = SparkEntry.queries("q_bm25")(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(gotRows.toSeq == want, s"got ${gotRows.toSeq}\nwant $want")
  }
}
