package graft.ops

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Structural ground truths for the retrieval tier beyond the DuckDB
  * oracles: the inverted index must round-trip to the corpus, and
  * co-occurrence counts must respect their marginals.
  */
class SearchSpec extends SparkSpec {

  private val sf001 = "/root/testdata/sf0.001"

  test("q_inverted round-trips: postings rebuild the corpus term sets") {
    // postings ship as a comma-joined string (the driver's comparator
    // can't hash arrays) — split back to ids for the round-trip
    val fromIndex = SparkEntry.queries("q_inverted")(spark, sf001)
      .select(col("term"), explode(split(col("postings"), ",")).as("d"))
      .select(col("term"), col("d").cast("long").as("doc_id"))
    val fromCorpus = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("term"))
      .select("term", "doc_id")
    assert(fromIndex.exceptAll(fromCorpus).isEmpty
      && fromCorpus.exceptAll(fromIndex).isEmpty,
      "postings ≠ corpus (term, doc) pairs")
    // shard bound: no postings row exceeds its 256-doc shard capacity
    val over = SparkEntry.queries("q_inverted")(spark, sf001)
      .filter(size(split(col("postings"), ",")) > 256)
    assert(over.isEmpty)
  }

  test("q_phrase_search matches a sliding-window scan of the raw text") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val phrase = Seq("merge", "slow")
    val want = docs.flatMap { case (id, text) =>
      val toks = text.split(" ")
      val n = toks.sliding(phrase.size)
        .count(w => w.sameElements(phrase))
      if (n > 0) Some((id, n.toLong)) else None
    }.sortBy { case (id, n) => (-n, id) }.take(20).toSeq
    assert(want.nonEmpty, "fixture has no phrase hits — pick a new phrase")
    val got = SparkEntry.queries("q_phrase_search")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === want)
  }

  test("q_query_expand matches a driver-side RM3 replay off the BM25 top-10") {
    // the feedback set is q_bm25's (oracle-proven) top-10
    val fb = SparkEntry.queries("q_bm25")(spark, sf001).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ")))
    val queryTerms = Set("data", "query", "spark")
    def r4(x: Double): Double = math.floor(x * 10000 + 0.5) / 10000
    // per-term Σ tf/dl over feedback docs, Det.dsum-style decimal addends
    val rel = docs.filter(d => fb(d._1)).flatMap { case (_, toks) =>
      val dl = toks.length
      toks.filterNot(queryTerms).groupBy(identity).map { case (t, xs) =>
        (t, BigDecimal(xs.length.toDouble / dl)
          .setScale(8, BigDecimal.RoundingMode.HALF_UP), 1L)
      }
    }.groupBy(_._1).map { case (t, xs) =>
      t -> (xs.map(_._2).sum, xs.map(_._3).sum)
    }
    val df = docs.flatMap(_._2.distinct).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val n = docs.length.toDouble
    val want = rel.map { case (t, (srel, nfb)) =>
      (t, nfb, df(t), r4(srel.toDouble * math.log(n / df(t))))
    }.toSeq.sortBy { case (t, _, _, sc) => (-sc, t) }.take(10)
    val got = SparkEntry.queries("q_query_expand")(spark, sf001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got === want)
    // the original query terms must never re-enter the expansion
    assert(got.forall(g => !queryTerms(g._1)))
  }

  test("q_rank_eval matches a driver-side metric replay of the BM25 top-10") {
    // q_bm25's ranking is itself oracle-proven; replay the metric
    // arithmetic over it and the corpus grade set
    val ranked = SparkEntry.queries("q_bm25")(spark, sf001).collect()
      .map(r => r.getAs[Long]("doc_id"))
    def grade(id: Long): Long = ((id % 1000003L) * 2654435761L) % 100 match {
      case h if h < 5  => 3
      case h if h < 15 => 2
      case h if h < 35 => 1
      case _           => 0
    }
    def dcgOf(grades: Seq[Long]): Double =
      grades.zipWithIndex.map { case (g, i) =>
        // mirror the decimal(18,6) per-term cast of Det.dsum
        BigDecimal((math.pow(2.0, g.toDouble) - 1.0)
          / (math.log(i + 2.0) / math.log(2.0)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }.sum.toDouble
    def r4(x: Double): Double = math.floor(x * 10000 + 0.5) / 10000
    val grades = ranked.map(grade).toSeq
    val corpus = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    val idealGrades = corpus.map(grade).sorted.reverse.take(10).toSeq
    val dcg = dcgOf(grades)
    val idcg = dcgOf(idealGrades)
    val firstRel = grades.zipWithIndex.collectFirst {
      case (g, i) if g >= 2 => i + 1 }
    val row = SparkEntry.queries("q_rank_eval")(spark, sf001).collect().head
    assert(row.getAs[Double]("dcg") === r4(dcg))
    assert(row.getAs[Double]("idcg") === r4(idcg))
    assert(row.getAs[Double]("ndcg") === r4(dcg / idcg))
    assert(row.getAs[Double]("mrr") === r4(firstRel.map(1.0 / _).getOrElse(0.0)))
    assert(row.getAs[Double]("p_at_10") === r4(grades.count(_ >= 2) / 10.0))
  }

  test("q_cooccur counts respect marginals and PMI bounds") {
    val rows = SparkEntry.queries("q_cooccur")(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ca, cb, cab) = (r.getAs[Long]("c_a"), r.getAs[Long]("c_b"), r.getAs[Long]("c_ab"))
      assert(cab <= math.min(ca, cb), s"pair count exceeds marginal: $r")
      assert(r.getAs[String]("term_a") < r.getAs[String]("term_b"), s"pair order: $r")
    }
  }

  test("q_tfidf ranks exactly 3 terms per doc with distinct ranks") {
    val t = SparkEntry.queries("q_tfidf")(spark, sf001)
    val bad = t.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), countDistinct(col("rk")).as("nrk"))
      .filter(col("n") =!= 3 || col("nrk") =!= 3)
    assert(bad.isEmpty)
  }
}
