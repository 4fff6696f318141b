package graft.ops

import graft.{Det, QueryPack, Tables}
import graft.functions.TextSim._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis tier: corpus statistics, heuristic language ID,
  * quality scoring, token counting, and document fingerprinting —
  * the per-document passes a training-data pipeline runs before
  * filtering/sampling.
  *
  * All per-document work is embarrassingly parallel (no shuffle);
  * only the per-language rollups aggregate, on a 5-value key with
  * map-side partials. No UDFs — split/explode/HOFs keep everything
  * inside whole-stage codegen.
  */
object TextStats extends QueryPack {

  private val Stopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  private def textStats(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .withColumn("toks", tokens(col("text")))
    val perLang = docs.groupBy("lang").agg(
      count(lit(1)).as("n_docs"),
      Det.davg(size(col("toks")).cast("double"), 0).as("avg_tokens"),
      sum(col("n_chars")).as("total_chars"))
    val distinctToks = docs
      .select(col("lang"), explode(col("toks")).as("tok"))
      .groupBy("lang")
      .agg(countDistinct(col("tok")).as("n_distinct_tokens"))
    perLang.join(distinctToks, "lang").orderBy("lang")
  }

  /** Heuristic language ID: score = stopword hits per candidate list,
    * argmax with a fixed tie order. (The mechanics of n-gram lang-ID;
    * the seed lists are tiny here because the corpus is synthetic.) */
  private def langId(s: SparkSession, d: String): DataFrame = {
    val en = Seq("the", "a", "of")
    val xx = Seq("query", "data", "row")
    val zz = Seq("spark", "join", "merge")
    def score(words: Seq[String]) =
      size(filter(tokens(col("text")), t => t.isin(words.map(lit(_)): _*)))
    Tables.documents(s, d)
      .withColumn("s_en", score(en))
      .withColumn("s_xx", score(xx))
      .withColumn("s_zz", score(zz))
      .withColumn("pred_lang",
        when(col("s_en") >= col("s_xx") && col("s_en") >= col("s_zz"), "en")
          .when(col("s_xx") >= col("s_zz"), "xx")
          .otherwise("zz"))
      .select(col("doc_id"), col("lang"), col("s_en"), col("s_xx"), col("s_zz"),
        col("pred_lang"))
      .orderBy("doc_id")
  }

  /** Quality scoring: token count, mean token length, stopword ratio,
    * distinct-token ratio, and a composite score. Ratios are double
    * divisions of exact integers — deterministic on both engines. */
  private def qualityScore(s: SparkSession, d: String): DataFrame = {
    val toks = tokens(col("text"))
    val nToks = size(toks).cast("double")
    val nStop = size(filter(toks, t => t.isin(Stopwords.map(lit(_)): _*))).cast("double")
    val nUniq = size(array_distinct(toks)).cast("double")
    val meanTokLen = (length(col("text")) - (size(toks) - 1)).cast("double") / size(toks)
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        size(toks).as("n_tokens"),
        Det.r4(meanTokLen).as("mean_tok_len"),
        Det.r4(nStop / nToks).as("stopword_ratio"),
        Det.r4(nUniq / nToks).as("uniq_ratio"),
        Det.r4((nUniq / nToks) * (lit(1.0) - nStop / nToks) * least(nToks / 50, lit(1.0)))
          .as("quality"))
      .orderBy("doc_id")
  }

  private def tokenCount(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        size(tokens(col("text"))).as("n_ws_tokens"),
        regexp_count(col("text"), lit("[a-z]+")).as("n_word_tokens"),
        ceil(length(col("text")).cast("double") / 4).as("n_bpe_est"))
      .orderBy("doc_id")

  /** Document fingerprint: min-of-shingle-hashes (winnowing's keep-min
    * rule over the whole doc) + the SimHash — two compact signatures
    * for downstream clustering. Both hashes are spec-stated (r7, the
    * shingle hash was xxhash64): the double-Horner TokenHash64 and
    * the SimHash built on it, so the DuckDB oracle restates the whole
    * fingerprint and this key hash-matches. */
  private def fingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("toks", tokens(col("text")))
      .select(
        col("doc_id"),
        array_min(transform(shingles(col("toks"), 4),
          sh => graft.functions.SimHash64.token_hash(sh))).as("min_shingle_hash"),
        graft.functions.SimHash64.simhash64(col("toks")).as("simhash"))
      .orderBy("doc_id")

  /** Top terms per language: explode → count → rank-filter, ties
    * broken lexicographically. The shuffle key is (lang, tok) with
    * map-side partial counts — at 100 TB the count table, not the
    * corpus, feeds the ranking window. */
  private def topTerms(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = Tables.documents(s, d)
      .select(col("lang"), explode(tokens(col("text"))).as("tok"))
      .groupBy("lang", "tok")
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("lang").orderBy(col("n").desc, col("tok").asc)
    counts
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("lang"), col("rk"), col("tok"), col("n"))
      .orderBy("lang", "rk")
  }

  /** Token-distribution entropy per document: H = −Σ (c/n)·ln(c/n)
    * over the doc's token frequencies — low entropy flags repetitive
    * or template text (complements q_repetition's max-based stats).
    * The shuffle carries (doc, distinct-token) count rows; the
    * DECIMAL-cast term sum keeps H order-independent. */
  private def entropy(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .withColumn("n", sum(col("c")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
      .withColumn("p", col("c").cast("double") / col("n"))
      .groupBy("doc_id")
      .agg(first(col("n")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        Det.r4(-Det.dsum(col("p") * log(col("p")))).as("entropy"))
      .orderBy("doc_id")

  /** PII redaction pass: global regex replacement of digit runs in a
    * reconstructed log line (event_type + user id + raw props), with
    * per-row redaction counts and the masked-character tally — the
    * scrubbing sweep a corpus runs before anything else reads it.
    * Purely narrow (no shuffle except the presentation sort) and the
    * regexes are codegen'd builtins, so the pass is scan-bound at any
    * scale; the counts give the audit trail (how much was masked)
    * without retaining the raw values. */
  private def piiRedact(s: SparkSession, d: String): DataFrame = {
    val raw = concat(col("event_type"), lit(" user="), col("user_id"),
      lit(" "), col("props"))
    Tables.events(s, d)
      .select(col("event_id"), raw.as("raw"))
      .select(col("event_id"),
        regexp_replace(col("raw"), "[0-9]+", "<NUM>").as("redacted"),
        regexp_count(col("raw"), lit("[0-9]+")).as("n_redacted"),
        (length(col("raw")) - length(regexp_replace(col("raw"), "[0-9]+", "")))
          .as("n_digit_chars"))
      .orderBy("event_id")
  }

  /** Zipf rank–frequency audit: least-squares fit of
    * ln(freq) ~ ln(rank) over the top-100 vocabulary — the standard
    * corpus-health check (natural text slopes ≈ −1; synthetic or
    * template-heavy corpora flatten). One vocabulary-sized count, a
    * top-100 TakeOrdered with (count, term) total tie order, and a
    * 100-row closed-form regression — O(corpus tokens) scan, O(1)
    * result state, so the audit costs a token scan at any corpus
    * size. Determinism: LN over exact integer ranks/counts (the BM25
    * LN-agreement precedent), DECIMAL-cast regression sums, r4
    * outputs; R² uses the centered sum-of-squares identities on the
    * same five sums. */
  private def zipfFit(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val top = Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term")).limit(100)
      .withColumn("rk",
        row_number().over(Window.orderBy(col("cnt").desc, col("term"))))
    val sums = top
      .select(log(col("rk").cast("double")).as("x"),
        log(col("cnt").cast("double")).as("y"))
      .agg(count(lit(1)).cast("double").as("k"),
        Det.dsum(col("x")).as("sx"), Det.dsum(col("y")).as("sy"),
        Det.dsum(col("x") * col("x")).as("sxx"),
        Det.dsum(col("x") * col("y")).as("sxy"),
        Det.dsum(col("y") * col("y")).as("syy"))
    sums.select(
      col("k").cast("long").as("n_terms"),
      Det.r4((col("k") * col("sxy") - col("sx") * col("sy"))
        / (col("k") * col("sxx") - col("sx") * col("sx"))).as("slope"),
      Det.r4((col("sy") - (col("k") * col("sxy") - col("sx") * col("sy"))
        / (col("k") * col("sxx") - col("sx") * col("sx")) * col("sx")) / col("k"))
        .as("intercept"),
      Det.r4(
        ((col("k") * col("sxy") - col("sx") * col("sy"))
          * (col("k") * col("sxy") - col("sx") * col("sy")))
          / ((col("k") * col("sxx") - col("sx") * col("sx"))
            * (col("k") * col("syy") - col("sy") * col("sy")))).as("r2"))
  }

  /** Domain-mixture divergence audit: per-source KL(p_source ‖
    * p_corpus) over add-1-smoothed token distributions — the
    * data-mixing health check that flags a source whose token
    * demographics drift from the corpus it feeds (template farms,
    * wrong-language feeds, synthetic injections) before it skews a
    * training mix. Smoothing is over the CORPUS vocabulary, so every
    * (source, term) cell is defined and the divergence is finite.
    *
    * Scale shape: two map-side-combined counts (corpus vocabulary;
    * source × term cells — both vocabulary-bounded, never
    * corpus-sized after the combine), then the zero-fill grid is
    * sources × vocabulary built against the BROADCAST vocabulary
    * table — domain-sized work, not data-sized. Determinism: the
    * smoothed ratios and LN are identical IEEE expression trees (BM25
    * precedent), per-cell addends DECIMAL(18,10)-cast, r4 output. */
  private def klMix(s: SparkSession, d: String): DataFrame = {
    val tok = Tables.documents(s, d)
      .select(col("source"), explode(tokens(col("text"))).as("t"))
      .filter(length(col("t")) > 0)
    val corpus = tok.groupBy("t").agg(count(lit(1)).as("cc"))
    val perSrc = tok.groupBy("source", "t").agg(count(lit(1)).as("cs"))
    val srcTot = tok.groupBy("source").agg(count(lit(1)).as("ns"))
    val tots = corpus.agg(count(lit(1)).as("v"), sum(col("cc")).as("nc"))
    def sm(c: Column, n: Column) = (c + 1).cast("double") / (n + col("v"))
    srcTot.crossJoin(broadcast(corpus))
      .join(perSrc, Seq("source", "t"), "left").na.fill(0L, Seq("cs"))
      .crossJoin(broadcast(tots))
      .select(col("source"), col("ns"),
        (sm(col("cs"), col("ns"))
          * log(sm(col("cs"), col("ns")) / sm(col("cc"), col("nc")))).as("term"))
      .groupBy("source", "ns")
      .agg(Det.r4(Det.dsum(col("term"), 10)).as("kl"))
      .select(col("source"), col("ns").as("n_tokens"), col("kl"))
      .orderBy("source")
  }

  override val queries: Map[String, Q] = Map(
    "q_kl_mix"        -> klMix,
    "q_zipf_fit"      -> zipfFit,
    "q_pii_redact"    -> piiRedact,
    "q_top_terms"     -> topTerms,
    "q_text_stats"    -> textStats,
    "q_lang_id"       -> langId,
    "q_quality_score" -> qualityScore,
    "q_token_count"   -> tokenCount,
    "q_fingerprint"   -> fingerprint,
    "q_entropy"       -> entropy,
  )

  override val oracles: Map[String, String] = Map(
    "q_kl_mix" -> {
      def sm(c: String, n: String) = s"(CAST($c + 1 AS DOUBLE) / ($n + v))"
      s"""WITH tok AS (
         |  SELECT source, t FROM (
         |    SELECT source, UNNEST(string_split(text, ' ')) AS t FROM documents)
         |  WHERE t <> ''),
         |corpus AS (SELECT t, COUNT(*) AS cc FROM tok GROUP BY t),
         |persrc AS (SELECT source, t, COUNT(*) AS cs FROM tok GROUP BY source, t),
         |srctot AS (SELECT source, COUNT(*) AS ns FROM tok GROUP BY source),
         |tots AS (SELECT COUNT(*) AS v, SUM(cc) AS nc FROM corpus),
         |grid AS (
         |  SELECT s.source, s.ns, c.cc, COALESCE(p.cs, 0) AS cs
         |  FROM srctot s CROSS JOIN corpus c
         |  LEFT JOIN persrc p ON p.source = s.source AND p.t = c.t),
         |terms AS (
         |  SELECT source, ns,
         |         ${sm("cs", "ns")} * LN(${sm("cs", "ns")} / ${sm("cc", "nc")}) AS term
         |  FROM grid, tots)
         |SELECT source, ns AS n_tokens,
         |       ${Det.r4Sql(Det.dsumSql("term", 10))} AS kl
         |FROM terms
         |GROUP BY source, ns
         |ORDER BY source""".stripMargin
    },
    "q_zipf_fit" ->
      s"""WITH tf AS (
         |  SELECT term, COUNT(*) AS cnt FROM (
         |    SELECT UNNEST(string_split(text, ' ')) AS term FROM documents)
         |  GROUP BY term),
         |top AS (
         |  SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, term) AS rk
         |  FROM (SELECT term, cnt FROM tf ORDER BY cnt DESC, term LIMIT 100)),
         |xy AS (
         |  SELECT LN(CAST(rk AS DOUBLE)) AS x, LN(CAST(cnt AS DOUBLE)) AS y
         |  FROM top),
         |sums AS (
         |  SELECT CAST(COUNT(*) AS DOUBLE) AS k,
         |         ${Det.dsumSql("x")} AS sx, ${Det.dsumSql("y")} AS sy,
         |         ${Det.dsumSql("x * x")} AS sxx,
         |         ${Det.dsumSql("x * y")} AS sxy,
         |         ${Det.dsumSql("y * y")} AS syy
         |  FROM xy)
         |SELECT CAST(k AS BIGINT) AS n_terms,
         |       ${Det.r4Sql("(k * sxy - sx * sy) / (k * sxx - sx * sx)")} AS slope,
         |       ${Det.r4Sql("(sy - (k * sxy - sx * sy) / (k * sxx - sx * sx) * sx) / k")} AS intercept,
         |       ${Det.r4Sql("((k * sxy - sx * sy) * (k * sxy - sx * sy)) / ((k * sxx - sx * sx) * (k * syy - sy * sy))")} AS r2
         |FROM sums""".stripMargin,
    // Fingerprint oracle (r7): both signature hashes are spec-stated,
    // so the whole fingerprint is SQL — distinct strings (tokens ∪
    // 4-gram shingles) hashed ONCE via the double-Horner power CTE,
    // min over each doc's shingles, and the SimHash sign-counter
    // construction over each doc's token multiset.
    "q_fingerprint" ->
      """WITH RECURSIVE toks AS (SELECT doc_id, string_split(text,' ') AS l FROM documents),
        |tk AS (SELECT doc_id, unnest(l) AS s, generate_subscripts(l, 1) AS tpos FROM toks),
        |sh AS (
        |  SELECT DISTINCT doc_id, array_to_string(l[i : LEAST(i + 3, LEN(l))], ' ') AS s
        |  FROM toks, UNNEST(generate_series(1, GREATEST(LEN(l) - 3, 1))) AS u(i)),
        |strs AS (SELECT DISTINCT s FROM (SELECT s FROM tk UNION ALL SELECT s FROM sh)),
        |pw(e, v1, v2) AS (
        |  SELECT 0, CAST(1 AS BIGINT), CAST(1 AS BIGINT)
        |  UNION ALL
        |  SELECT e + 1, (v1 * 131) % 2147483647, (v2 * 137) % 2147483629
        |  FROM pw WHERE e < (SELECT MAX(length(s)) FROM strs)),
        |ch AS (SELECT s, length(s) AS n, unnest(range(1, length(s)+1)) AS i FROM strs),
        |hh AS (
        |  SELECT s, CAST(((SUM(ord(substr(s, CAST(i AS INT), 1)) * p.v1) % 2147483647) << 31)
        |                 | (SUM(ord(substr(s, CAST(i AS INT), 1)) * p.v2) % 2147483629) AS BIGINT) AS h
        |  FROM ch JOIN pw p ON p.e = ch.n - ch.i GROUP BY s),
        |msh AS (
        |  SELECT sh.doc_id, MIN(COALESCE(hh.h, 0)) AS min_shingle_hash
        |  FROM sh LEFT JOIN hh USING (s) GROUP BY sh.doc_id),
        |tkh AS (
        |  SELECT tk.doc_id, tk.tpos, COALESCE(hh.h, 0) AS h
        |  FROM tk LEFT JOIN hh USING (s)),
        |bits AS (
        |  SELECT doc_id, i, SUM(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS c
        |  FROM tkh, range(0, 64) r(i) GROUP BY doc_id, i),
        |sig AS (
        |  SELECT doc_id, CAST(SUM(CASE WHEN c > 0 THEN (CAST(1 AS BIGINT) << CAST(i AS INT))
        |                  ELSE 0 END) AS BIGINT) AS simhash
        |  FROM bits GROUP BY doc_id)
        |SELECT m.doc_id, m.min_shingle_hash, s.simhash
        |FROM msh m JOIN sig s USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "q_pii_redact" ->
      """WITH r AS (
        |  SELECT event_id,
        |         event_type || ' user=' || CAST(user_id AS VARCHAR) || ' ' || props AS raw
        |  FROM events)
        |SELECT event_id,
        |       regexp_replace(raw, '[0-9]+', '<NUM>', 'g') AS redacted,
        |       CAST(LEN(regexp_extract_all(raw, '[0-9]+')) AS INT) AS n_redacted,
        |       CAST(LENGTH(raw) - LENGTH(regexp_replace(raw, '[0-9]+', '', 'g')) AS INT)
        |         AS n_digit_chars
        |FROM r
        |ORDER BY event_id""".stripMargin,
    "q_top_terms" ->
      """SELECT lang, CAST(rk AS INT) AS rk, tok, n FROM (
        |  SELECT lang, tok, n,
        |         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, tok ASC) AS rk
        |  FROM (SELECT lang, tok, COUNT(*) AS n
        |        FROM (SELECT lang, UNNEST(string_split(text, ' ')) AS tok FROM documents)
        |        GROUP BY lang, tok))
        |WHERE rk <= 5
        |ORDER BY lang, rk""".stripMargin,
    "q_text_stats" ->
      s"""SELECT d.lang, d.n_docs, d.avg_tokens, d.total_chars, t.n_distinct_tokens
         |FROM (SELECT lang, COUNT(*) AS n_docs,
         |             ${Det.davgSql("LEN(string_split(text, ' '))", 0)} AS avg_tokens,
         |             CAST(SUM(n_chars) AS BIGINT) AS total_chars
         |      FROM documents GROUP BY lang) d
         |JOIN (SELECT lang, COUNT(DISTINCT tok) AS n_distinct_tokens
         |      FROM (SELECT lang, UNNEST(string_split(text, ' ')) AS tok FROM documents)
         |      GROUP BY lang) t
         |  ON d.lang = t.lang
         |ORDER BY d.lang""".stripMargin,
    "q_lang_id" ->
      """SELECT doc_id, lang,
        |       CAST(LEN(list_filter(string_split(text,' '), t -> t IN ('the','a','of'))) AS INT) AS s_en,
        |       CAST(LEN(list_filter(string_split(text,' '), t -> t IN ('query','data','row'))) AS INT) AS s_xx,
        |       CAST(LEN(list_filter(string_split(text,' '), t -> t IN ('spark','join','merge'))) AS INT) AS s_zz,
        |       CASE WHEN LEN(list_filter(string_split(text,' '), t -> t IN ('the','a','of')))
        |                 >= LEN(list_filter(string_split(text,' '), t -> t IN ('query','data','row')))
        |             AND LEN(list_filter(string_split(text,' '), t -> t IN ('the','a','of')))
        |                 >= LEN(list_filter(string_split(text,' '), t -> t IN ('spark','join','merge')))
        |            THEN 'en'
        |            WHEN LEN(list_filter(string_split(text,' '), t -> t IN ('query','data','row')))
        |                 >= LEN(list_filter(string_split(text,' '), t -> t IN ('spark','join','merge')))
        |            THEN 'xx'
        |            ELSE 'zz' END AS pred_lang
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "q_quality_score" ->
      s"""WITH q AS (
         |  SELECT doc_id,
         |         CAST(LEN(string_split(text,' ')) AS DOUBLE) AS nt,
         |         CAST(LEN(list_filter(string_split(text,' '),
         |              t -> t IN ('the','a','of','and','to','in','is'))) AS DOUBLE) AS ns,
         |         CAST(LEN(list_distinct(string_split(text,' '))) AS DOUBLE) AS nu,
         |         CAST(LENGTH(text) - (LEN(string_split(text,' ')) - 1) AS DOUBLE)
         |           / LEN(string_split(text,' ')) AS mtl
         |  FROM documents)
         |SELECT doc_id,
         |       CAST(nt AS INT) AS n_tokens,
         |       ${Det.r4Sql("mtl")} AS mean_tok_len,
         |       ${Det.r4Sql("ns / nt")} AS stopword_ratio,
         |       ${Det.r4Sql("nu / nt")} AS uniq_ratio,
         |       ${Det.r4Sql("(nu / nt) * (1.0 - ns / nt) * LEAST(nt / 50, 1.0)")} AS quality
         |FROM q
         |ORDER BY doc_id""".stripMargin,
    "q_entropy" ->
      s"""WITH f AS (
         |  SELECT doc_id, tok, COUNT(*) AS c FROM (
         |    SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents)
         |  GROUP BY doc_id, tok),
         |p AS (
         |  SELECT doc_id, c, SUM(c) OVER (PARTITION BY doc_id) AS n FROM f)
         |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens, COUNT(*) AS n_distinct,
         |       ${Det.r4Sql("-" + Det.dsumSql("(CAST(c AS DOUBLE) / n) * LN(CAST(c AS DOUBLE) / n)"))} AS entropy
         |FROM p
         |GROUP BY doc_id, n
         |ORDER BY doc_id""".stripMargin,
    "q_token_count" ->
      """SELECT doc_id,
        |       CAST(LEN(string_split(text,' ')) AS INT) AS n_ws_tokens,
        |       CAST(LEN(regexp_extract_all(text, '[a-z]+')) AS INT) AS n_word_tokens,
        |       CAST(CEIL(CAST(LENGTH(text) AS DOUBLE) / 4) AS BIGINT) AS n_bpe_est
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
  )
}
