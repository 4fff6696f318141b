package graft.ops

import graft.{Det, QueryPack, Tables}
import graft.functions.TextSim._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Full BM25 scoring of every term-matching document (no top-k cut)
    * — shared by q_bm25 and the hybrid-fusion query in Analytics. */
  private[ops] def bm25Scored(s: SparkSession, d: String): DataFrame = {
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
    val idf = df.crossJoin(broadcast(stats))
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
  }

  private def bm25(s: SparkSession, d: String): DataFrame =
    bm25Scored(s, d)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(10)

  /** Sharded inverted index: term → sorted doc-id postings, SHARDED
    * by doc-id range (shard = doc_id >> 8) so no single output row
    * ever carries an unbounded postings list — the stop-word term
    * that appears in a billion documents becomes ~4M bounded rows,
    * not one 8 GB array. df per shard; global df is a sum over
    * shards (mergeable). */
  private def inverted(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        explode(array_distinct(tokens(col("text")))).as("term"))
      .withColumn("shard", shiftright(col("doc_id"), 8))
      .groupBy("term", "shard")
      .agg(count(lit(1)).as("df_shard"),
        // comma-joined string, not a raw ARRAY: the driver's comparator
        // sorts output columns with pandas, which can't hash ndarrays
        array_join(sort_array(collect_list(col("doc_id"))), ",").as("postings"))
      .orderBy("term", "shard")

  /** Top-3 terms per document by tf–idf (idf = ln(N/df), raw tf).
    * The df table is |vocabulary|-sized — the tf→df join shuffles on
    * term, never on the corpus; ties break lexicographically so the
    * rank is total on both engines. */
  private def tfidf(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
    val tf = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("term").asc)
    tf.join(df, "term").crossJoin(broadcast(n))
      .withColumn("tfidf", col("tf") * log(col("n_docs").cast("double") / col("df")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("rk"), col("term"), col("tf"),
        Det.r4(col("tfidf")).as("tfidf"))
      .orderBy("doc_id", "rk")
  }

  /** Term co-occurrence PMI over the top-16 vocabulary: document-level
    * pair counts → pointwise mutual information. The quadratic pair
    * stage is BOUNDED by the broadcast vocabulary filter (≤16 distinct
    * terms per doc → ≤120 pairs) — the corpus never self-joins
    * unrestricted; this is the blocked-candidate discipline of the
    * dedup tier applied to co-occurrence mining. */
  private def cooccur(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val occ = docs
      .select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("term"))
    val vocab = occ.groupBy("term").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("term").asc).limit(16)
    val hits = occ.join(broadcast(vocab), "term")
      .select(col("doc_id"), col("term"), col("c"))
    val pairs = hits.as("a").join(hits.as("b"), "doc_id")
      .filter(col("a.term") < col("b.term"))
      .groupBy(col("a.term").as("term_a"), col("b.term").as("term_b"),
        col("a.c").as("c_a"), col("b.c").as("c_b"))
      .agg(count(lit(1)).as("c_ab"))
    pairs.crossJoin(broadcast(n))
      .withColumn("pmi",
        log(col("c_ab").cast("double") * col("n_docs")
          / (col("c_a") * col("c_b"))))
      .select(col("term_a"), col("term_b"), col("c_a"), col("c_b"), col("c_ab"),
        Det.r4(col("pmi")).as("pmi"))
      .orderBy("term_a", "term_b")
  }

  /** Phrase to match, in order. Chosen from the fixture vocabulary so
    * every scale factor yields hits (23 adjacent pairs at sf0.01). */
  private val Phrase = Seq("merge", "slow")

  /** Exact phrase search over POSITIONAL postings: each phrase term's
    * occurrence positions are normalized to the would-be phrase start
    * (pos − term_index), so adjacency becomes a plain equi-join on
    * (doc_id, start) — no window, no self-join inequality, and the
    * construction extends to any phrase length as a chain of
    * equi-joins. Per-term filters run BEFORE the position shuffle
    * (only occurrences of the phrase's own terms move), which is the
    * same candidate-blocking discipline as the BM25/co-occurrence
    * queries: at 100 TB the widest exchange is the phrase terms'
    * postings, never the corpus, and each join key (doc_id, start)
    * is unique per side (a token occupies one position), so the join
    * output is bounded by the rarest term's occurrence count. */
  private def phraseSearch(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"),
        posexplode(tokens(col("text"))).as(Seq("pos", "term")))
    val aligned = Phrase.zipWithIndex.map { case (t, i) =>
      toks.filter(col("term") === t)
        .select(col("doc_id"), (col("pos") - i).as("start"))
    }
    aligned.reduce((a, b) => a.join(b, Seq("doc_id", "start")))
      .groupBy("doc_id").agg(count(lit(1)).as("n_matches"))
      .orderBy(col("n_matches").desc, col("doc_id"))
      .limit(20)
  }

  /** Retrieval-quality evaluation of the BM25 ranking: nDCG@10, MRR
    * and precision@10 against a SPEC-STATED graded relevance —
    * grade(doc) is derived from ((doc_id mod 1000003) · 2654435761) mod 100
    * (5% grade 3, 10% grade 2, 20% grade 1, else 0), so any engine
    * reproduces the judgment set from the constants alone, the
    * q_split_train auditability argument applied to IR evaluation.
    * "Relevant" for MRR/P@10 means grade ≥ 2.
    *
    * Determinism: ranks come from the r4-rounded BM25 score with
    * doc_id tie-break (a total order both engines share); log2 is
    * spelled LN(x)/LN(2) on BOTH sides so the expression trees are
    * identical IEEE ops (the BM25 precedent for LN agreement); DCG
    * sums are DECIMAL-cast (order-independent), and nDCG divides the
    * two correctly-rounded doubles. Scale shape: the ranked list is
    * top-10 of the BM25 scorer (TakeOrdered), the ideal DCG is a
    * corpus-wide TakeOrdered on (grade, doc_id) — both O(n) scans
    * with O(k) state; the final row assembles via broadcast cross
    * joins of 1-row aggregates. */
  private def rankEval(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def grade(id: Column): Column = {
      // pre-reduce mod a prime so the Knuth multiply is provably
      // overflow-free on BOTH engines: max product ≈ 1e6 · 2.65e9 ≈
      // 2.7e15 ≪ 2^63. Without it, Spark's Long silently wraps for
      // doc_id ≳ 3.5e9 while DuckDB promotes to HUGEINT — a latent
      // cross-engine divergence at extreme id ranges.
      val h = pmod(pmod(id, lit(1000003L)) * lit(2654435761L), lit(100))
      when(h < 5, 3L).when(h < 15, 2L).when(h < 35, 1L).otherwise(0L)
    }
    def gain(g: Column): Column = pow(lit(2.0), g.cast("double")) - lit(1.0)
    def dcgTerm(g: Column, rk: Column): Column =
      gain(g) / (log(rk.cast("double") + lit(1.0)) / log(lit(2.0)))
    val ranked = bm25Scored(s, d)
      .orderBy(col("score").desc, col("doc_id")).limit(10)
      .withColumn("rk",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id"))))
      .withColumn("g", grade(col("doc_id")))
    val dcg = ranked.agg(
      Det.dsum(dcgTerm(col("g"), col("rk"))).as("dcg"),
      min(when(col("g") >= 2, col("rk"))).as("first_rel"),
      count(when(col("g") >= 2, lit(1))).as("n_rel"))
    val ideal = Tables.documents(s, d)
      .select(col("doc_id"), grade(col("doc_id")).as("g"))
      .orderBy(col("g").desc, col("doc_id")).limit(10)
      .withColumn("rk",
        row_number().over(Window.orderBy(col("g").desc, col("doc_id"))))
    val idcg = ideal.agg(Det.dsum(dcgTerm(col("g"), col("rk"))).as("idcg"))
    dcg.crossJoin(broadcast(idcg))
      .select(
        Det.r4(col("dcg")).as("dcg"),
        Det.r4(col("idcg")).as("idcg"),
        Det.r4(col("dcg") / col("idcg")).as("ndcg"),
        Det.r4(coalesce(lit(1.0) / col("first_rel"), lit(0.0))).as("mrr"),
        Det.r4(col("n_rel").cast("double") / lit(10.0)).as("p_at_10"))
  }

  /** Expansion terms kept. */
  private val ExpandK = 10

  /** Pseudo-relevance-feedback query expansion (Rocchio/RM3 family):
    * take the BM25 top-10 as the feedback set, score every non-query
    * term t by Σ_{d ∈ top10} (tf(t,d)/|d|) · ln(N/df(t)) — relevance-
    * model term mass weighted by corpus rarity — and emit the top
    * [[ExpandK]] expansion terms. This is the retrieval-side
    * vocabulary-mining loop (RM3: Lavrenko & Croft, SIGIR 2001;
    * Jaleel et al., TREC 2004) that hard-negative mining and eval-set
    * construction build on.
    *
    * Scale shape: only the 10 feedback documents ever explode into
    * (term, doc) rows (a broadcast semi-join gates the corpus scan),
    * so the feedback tf table is feedback-sized; the corpus-wide df
    * pass is gated the same way — candidate terms broadcast, the
    * filter runs BEFORE the term shuffle (the BM25 discipline), so
    * the df exchange carries only candidate-term occurrences. The
    * per-term Σ tf/dl is DECIMAL-exact; idf's LN is the shared BM25
    * precedent; the final cut orders by (r4 score, term) — total. */
  private def queryExpand(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val top = bm25Scored(s, d)
      .orderBy(col("score").desc, col("doc_id")).limit(10)
      .select(col("doc_id"))
    val ftf = docs
      .join(broadcast(top), "doc_id")
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).as("dl"),
        explode(col("toks")).as("term"))
      .filter(!col("term").isin(QueryTerms: _*))
      .groupBy("term", "doc_id", "dl").agg(count(lit(1)).as("tf"))
    val rel = ftf.groupBy("term")
      .agg(Det.dsum(col("tf").cast("double") / col("dl"), 8).as("srel"),
        count(lit(1)).as("n_fb_docs"))
    val df = docs
      .select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("term"))
      .join(broadcast(rel.select("term")), "term", "left_semi")
      .groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    rel.join(broadcast(df), "term").crossJoin(broadcast(n))
      .select(col("term"), col("n_fb_docs"), col("df"),
        Det.r4(col("srel") * log(col("n_docs").cast("double") / col("df")))
          .as("rm_score"))
      .orderBy(col("rm_score").desc, col("term"))
      .limit(ExpandK)
  }

  override val queries: Map[String, Q] = Map(
    "q_bm25"     -> bm25,
    "q_inverted" -> inverted,
    "q_tfidf"    -> tfidf,
    "q_cooccur"  -> cooccur,
    "q_phrase_search" -> phraseSearch,
    "q_rank_eval" -> rankEval,
    "q_query_expand" -> queryExpand,
  )

  /** Shared BM25 scoring CTEs (through `scored`) — the oracle twin of
    * [[bm25Scored]], reused by q_bm25 and q_rank_eval. */
  private val Bm25Ctes: String =
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
       |  FROM (SELECT term, COUNT(*) AS df FROM tf GROUP BY term), stats),
       |scored AS (
       |  SELECT doc_id,
       |         ${Det.r4Sql(Det.dsumSql(
           "idf.idf * (tf.tf * CAST(2.2 AS DOUBLE)) / (tf.tf + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * tf.dl / idf.avgdl))"))} AS score,
       |         COUNT(*) AS n_terms_hit
       |  FROM tf JOIN idf USING (term)
       |  GROUP BY doc_id)""".stripMargin

  /** Grade expression of the spec-stated relevance judgment. */
  private def gradeSql(idExpr: String): String =
    s"""(CASE WHEN ((($idExpr) % 1000003) * 2654435761) % 100 < 5 THEN 3
       |      WHEN ((($idExpr) % 1000003) * 2654435761) % 100 < 15 THEN 2
       |      WHEN ((($idExpr) % 1000003) * 2654435761) % 100 < 35 THEN 1
       |      ELSE 0 END)""".stripMargin

  override val oracles: Map[String, String] = Map(
    "q_bm25" ->
      s"""$Bm25Ctes
         |SELECT doc_id, score, n_terms_hit FROM scored
         |ORDER BY score DESC, doc_id
         |LIMIT 10""".stripMargin,
    "q_rank_eval" ->
      s"""$Bm25Ctes,
         |rtop AS (
         |  SELECT doc_id, score FROM scored
         |  ORDER BY score DESC, doc_id LIMIT 10),
         |ranked AS (
         |  SELECT doc_id,
         |         ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rk,
         |         ${gradeSql("doc_id")} AS g
         |  FROM rtop),
         |dcgs AS (
         |  SELECT ${Det.dsumSql(
             "(POW(CAST(2.0 AS DOUBLE), CAST(g AS DOUBLE)) - CAST(1.0 AS DOUBLE)) / (LN(CAST(rk AS DOUBLE) + CAST(1.0 AS DOUBLE)) / LN(CAST(2.0 AS DOUBLE)))")} AS dcg,
         |         MIN(CASE WHEN g >= 2 THEN rk END) AS first_rel,
         |         COUNT(CASE WHEN g >= 2 THEN 1 END) AS n_rel
         |  FROM ranked),
         |itop AS (
         |  SELECT doc_id, g FROM (
         |    SELECT doc_id, ${gradeSql("doc_id")} AS g FROM documents)
         |  ORDER BY g DESC, doc_id LIMIT 10),
         |ideal AS (
         |  SELECT g, ROW_NUMBER() OVER (ORDER BY g DESC, doc_id) AS rk FROM itop),
         |idcgs AS (
         |  SELECT ${Det.dsumSql(
             "(POW(CAST(2.0 AS DOUBLE), CAST(g AS DOUBLE)) - CAST(1.0 AS DOUBLE)) / (LN(CAST(rk AS DOUBLE) + CAST(1.0 AS DOUBLE)) / LN(CAST(2.0 AS DOUBLE)))")} AS idcg
         |  FROM ideal)
         |SELECT ${Det.r4Sql("dcg")} AS dcg,
         |       ${Det.r4Sql("idcg")} AS idcg,
         |       ${Det.r4Sql("dcg / idcg")} AS ndcg,
         |       ${Det.r4Sql("COALESCE(CAST(1.0 AS DOUBLE) / first_rel, CAST(0.0 AS DOUBLE))")} AS mrr,
         |       ${Det.r4Sql("CAST(n_rel AS DOUBLE) / CAST(10.0 AS DOUBLE)")} AS p_at_10
         |FROM dcgs, idcgs""".stripMargin,
    "q_inverted" ->
      """SELECT term, doc_id // 256 AS shard, COUNT(*) AS df_shard,
        |       array_to_string(LIST(doc_id ORDER BY doc_id), ',') AS postings
        |FROM (SELECT doc_id, UNNEST(list_distinct(string_split(text, ' '))) AS term
        |      FROM documents)
        |GROUP BY term, shard
        |ORDER BY term, shard""".stripMargin,
    "q_tfidf" ->
      s"""WITH tf AS (
         |  SELECT doc_id, term, COUNT(*) AS tf FROM (
         |    SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents)
         |  GROUP BY doc_id, term),
         |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
         |n AS (SELECT COUNT(*) AS n_docs FROM documents),
         |scored AS (
         |  SELECT doc_id, term, tf.tf,
         |         tf.tf * LN(CAST(n_docs AS DOUBLE) / df) AS tfidf
         |  FROM tf JOIN df USING (term), n)
         |SELECT doc_id, CAST(rk AS INT) AS rk, term, tf,
         |       ${Det.r4Sql("tfidf")} AS tfidf
         |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
         |                  ORDER BY tfidf DESC, term ASC) AS rk
         |      FROM scored)
         |WHERE rk <= 3
         |ORDER BY doc_id, rk""".stripMargin,
    "q_cooccur" ->
      s"""WITH occ AS (
         |  SELECT doc_id, UNNEST(list_distinct(string_split(text, ' '))) AS term
         |  FROM documents),
         |vocab AS (
         |  SELECT term, COUNT(*) AS c FROM occ GROUP BY term
         |  ORDER BY c DESC, term ASC LIMIT 16),
         |hits AS (SELECT doc_id, occ.term, c FROM occ JOIN vocab USING (term)),
         |n AS (SELECT COUNT(*) AS n_docs FROM documents),
         |pairs AS (
         |  SELECT a.term AS term_a, b.term AS term_b, a.c AS c_a, b.c AS c_b,
         |         COUNT(*) AS c_ab
         |  FROM hits a JOIN hits b ON a.doc_id = b.doc_id AND a.term < b.term
         |  GROUP BY 1, 2, 3, 4)
         |SELECT term_a, term_b, c_a, c_b, c_ab,
         |       ${Det.r4Sql("LN(CAST(c_ab AS DOUBLE) * n_docs / (c_a * c_b))")} AS pmi
         |FROM pairs, n
         |ORDER BY term_a, term_b""".stripMargin,
    "q_query_expand" ->
      s"""$Bm25Ctes,
         |rtop AS (
         |  SELECT doc_id FROM scored
         |  ORDER BY score DESC, doc_id LIMIT 10),
         |ftf AS (
         |  SELECT term, doc_id, dl, COUNT(*) AS tf FROM (
         |    SELECT d.doc_id, CAST(LEN(string_split(d.text, ' ')) AS INT) AS dl,
         |           UNNEST(string_split(d.text, ' ')) AS term
         |    FROM documents d JOIN rtop USING (doc_id))
         |  WHERE term NOT IN (${QueryTerms.map(t => s"'$t'").mkString(", ")})
         |  GROUP BY term, doc_id, dl),
         |rel AS (
         |  SELECT term, ${Det.dsumSql("CAST(tf AS DOUBLE) / dl", 8)} AS srel,
         |         COUNT(*) AS n_fb_docs
         |  FROM ftf GROUP BY term),
         |cdf AS (
         |  SELECT term, COUNT(*) AS df FROM (
         |    SELECT doc_id, UNNEST(list_distinct(string_split(text, ' '))) AS term
         |    FROM documents)
         |  WHERE term IN (SELECT term FROM rel)
         |  GROUP BY term),
         |n AS (SELECT COUNT(*) AS n_docs FROM documents)
         |SELECT term, n_fb_docs, df,
         |       ${Det.r4Sql("srel * LN(CAST(n_docs AS DOUBLE) / df)")} AS rm_score
         |FROM rel JOIN cdf USING (term), n
         |ORDER BY rm_score DESC, term
         |LIMIT $ExpandK""".stripMargin,
    // Positions: generate_subscripts is 1-based vs posexplode's
    // 0-based, but both sides only use positions RELATIVELY (the
    // per-term alignment subtracts the term's phrase index), so the
    // off-by-one cancels in the equi-join.
    "q_phrase_search" ->
      s"""WITH sp AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |toks AS (
         |  SELECT doc_id, UNNEST(toks) AS term,
         |         generate_subscripts(toks, 1) AS pos
         |  FROM sp),
         |${Phrase.zipWithIndex.map { case (t, i) =>
             s"p$i AS (SELECT doc_id, pos - $i AS start FROM toks WHERE term = '$t')"
           }.mkString(",\n")},
         |m AS (
         |  SELECT doc_id, COUNT(*) AS n_matches
         |  FROM p0${(1 until Phrase.size).map(i => s" JOIN p$i USING (doc_id, start)").mkString}
         |  GROUP BY doc_id)
         |SELECT doc_id, n_matches FROM m
         |ORDER BY n_matches DESC, doc_id LIMIT 20""".stripMargin,
  )
}
