package graft.ops

import graft.{Det, QueryPack, Tables}
import graft.functions.TextSim._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Full-text relevance scoring: BM25 ranking of the corpus against a
  * query term set — the retrieval side of a training-data pipeline
  * (hard-negative mining, dedup-by-retrieval, eval-set construction).
  *
  * Scale shape: the query vocabulary is tiny and the per-term filter
  * runs BEFORE the (doc, term) shuffle, so the aggregation input is
  * only matching occurrences, never the corpus. Corpus-level stats
  * (N, avgdl) are a one-row aggregate broadcast to every score; the
  * per-term document frequencies are a |terms|-row broadcast. At
  * 100 TB nothing here shuffles the text — the widest exchange is
  * (matching doc × term), and the final top-k is TakeOrdered.
  */
object Search extends QueryPack {

  private val QueryTerms = Seq("data", "query", "spark") // k1=1.2 b=0.75 inline below

  private def bm25(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("dl", size(col("toks")))
    // corpus stats: one row, broadcast by the cross join
    val stats = docs.agg(
      count(lit(1)).as("n_docs"),
      Det.davg(col("dl").cast("double"), 0).as("avgdl"))
    // term frequency: explode only matching tokens (filter precedes
    // the shuffle), then count per (doc, term)
    val tf = docs
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(QueryTerms: _*))
      .groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).as("tf"))
    // document frequency per term (tf already has one row per
    // (doc, term)); idf via the standard BM25 log form
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = df.crossJoin(stats)
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .select(col("term"), col("idf"), col("avgdl"))
    // per-(doc, term) contribution; DECIMAL-cast sum makes the per-doc
    // score order-independent across engines
    // literals written as 2.2/1.2/0.25/0.75 verbatim: the oracle uses
    // CAST(x AS DOUBLE) of the same decimal literals, so both engines
    // evaluate the identical IEEE expression tree (a Scala-side K1+1
    // would constant-fold with its own rounding)
    val contrib = tf.join(broadcast(idf), "term")
      .withColumn("c",
        col("idf") * (col("tf") * lit(2.2))
          / (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
    contrib.groupBy("doc_id")
      .agg(Det.r4(Det.dsum(col("c"))).as("score"),
        count(lit(1)).as("n_terms_hit"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(10)
  }

  override val queries: Map[String, Q] = Map(
    "q_bm25" -> bm25,
  )

  override val oracles: Map[String, String] = Map(
    "q_bm25" ->
      s"""WITH docs AS (
         |  SELECT doc_id, CAST(LEN(string_split(text, ' ')) AS INT) AS dl
         |  FROM documents),
         |stats AS (
         |  SELECT COUNT(*) AS n_docs,
         |         ${Det.davgSql("CAST(LEN(string_split(text, ' ')) AS DOUBLE)", 0)} AS avgdl
         |  FROM documents),
         |tf AS (
         |  SELECT doc_id, dl, term, COUNT(*) AS tf FROM (
         |    SELECT doc_id,
         |           CAST(LEN(string_split(text, ' ')) AS INT) AS dl,
         |           UNNEST(string_split(text, ' ')) AS term
         |    FROM documents)
         |  WHERE term IN ('data', 'query', 'spark')
         |  GROUP BY doc_id, dl, term),
         |idf AS (
         |  SELECT term, LN(1.0 + (n_docs - df + 0.5) / (df + 0.5)) AS idf, avgdl
         |  FROM (SELECT term, COUNT(*) AS df FROM tf GROUP BY term), stats)
         |SELECT doc_id,
         |       ${Det.r4Sql(Det.dsumSql(
             "idf.idf * (tf.tf * CAST(2.2 AS DOUBLE)) / (tf.tf + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * tf.dl / idf.avgdl))"))} AS score,
         |       COUNT(*) AS n_terms_hit
         |FROM tf JOIN idf USING (term)
         |GROUP BY doc_id
         |ORDER BY score DESC, doc_id
         |LIMIT 10""".stripMargin,
  )
}
