package graft.ops

import graft.{Det, QueryPack, Tables}
import graft.functions.TextSim._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data preparation operators beyond dedup/curation:
  * benchmark decontamination and fixed-length sequence packing.
  */
object TrainPrep extends QueryPack {

  /** Decontamination: flag corpus documents whose 3-gram shingle
    * overlap with a benchmark set exceeds 30% — the standard guard
    * against test-set leakage into training data. The "benchmark"
    * here is the deterministic pseudo-set doc_id % 10 = 0 (sized so
    * the synthetic corpus's near-duplicates of benchmark docs are
    * actually flagged: 8 docs at sf0.01).
    *
    * Scale shape: the benchmark's distinct shingle set is SMALL
    * (benchmarks are thousands of documents, not billions) and
    * broadcast; corpus docs explode to (doc, shingle) rows map-side,
    * hit-count via broadcast join + partial aggregation. The corpus
    * is never shuffled by shingle; per-doc output is one row. */
  private def decontaminate(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), shingles(tokens(col("text")), 3).as("sh"))
    val bench = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
      .select(explode(col("sh")).as("g")).distinct()
    val cand = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
      .select(col("doc_id"), size(col("sh")).as("n_sh"), explode(col("sh")).as("g"))
    // shingles are distinct within a doc and bench is distinct, so the
    // post-join count IS the distinct-hit count (no double counting)
    cand.join(broadcast(bench), "g")
      .groupBy("doc_id", "n_sh")
      .agg(count(lit(1)).as("n_hits"))
      .filter(col("n_hits").cast("double") / col("n_sh") >= 0.3)
      .select(col("doc_id"), col("n_sh"), col("n_hits"),
        Det.r4(col("n_hits").cast("double") / col("n_sh")).as("overlap"))
      .orderBy("doc_id")
  }

  /** [[decontaminate]] with the benchmark membership test summarized
    * into a BLOOM FILTER instead of a broadcast shingle array — the
    * shape for benchmark sets too large to broadcast exactly (10⁹
    * distinct shingles ≈ tens of GB as strings, ~1.2 GB as a 1%-fpp
    * Bloom filter). Three stages, result byte-identical to the exact
    * query (same oracle):
    *
    *  1. distributed sketch build (Spark's own BloomFilterAggregate,
    *     the runtime-filter machinery): the driver receives ONE
    *     serialized filter, never the shingle set;
    *  2. corpus pre-filter with the codegen'd BloomFilterMightContain
    *     predicate — no false negatives, so nothing is lost;
    *  3. EXACT confirmation join on the Bloom-positive rows only —
    *     false positives die here, and at scale this join's probe
    *     side is the (tiny) suspicious subset, not the corpus. */
  private def decontaminateBloom(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftbridge.Bridge
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), shingles(tokens(col("text")), 3).as("sh"))
    val bench = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
      .select(explode(col("sh")).as("g")).distinct()
    // size the filter from the actual distinct-shingle count (one
    // vocabulary-sized job); ~10 bits/item ≈ 1% fpp
    val nBench = math.max(bench.count(), 1L)
    val bloomBytes = bench
      .select(Bridge.column(new BloomFilterAggregate(
          new XxHash64(Seq(Bridge.expression(col("g")))),
          Literal(nBench), Literal(nBench * 10L))
        .toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
    val cand = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
      .select(col("doc_id"), size(col("sh")).as("n_sh"), explode(col("sh")).as("g"))
    // empty benchmark -> aggregate yields null -> nothing can overlap
    val positive =
      if (bloomBytes == null) cand.filter(lit(false))
      else cand.filter(Bridge.column(BloomFilterMightContain(
        Literal.create(bloomBytes, org.apache.spark.sql.types.BinaryType),
        new XxHash64(Seq(Bridge.expression(col("g")))))))
    positive.join(broadcast(bench), "g")
      .groupBy("doc_id", "n_sh")
      .agg(count(lit(1)).as("n_hits"))
      .filter(col("n_hits").cast("double") / col("n_sh") >= 0.3)
      .select(col("doc_id"), col("n_sh"), col("n_hits"),
        Det.r4(col("n_hits").cast("double") / col("n_sh")).as("overlap"))
      .orderBy("doc_id")
  }

  /** Fixed-length sequence packing: assign every document a byte-free
    * (token-offset) position in a stream of concatenated training
    * sequences of 512 tokens — (start_offset, seq_bin) per doc, in
    * doc_id order. The global running offset is [[Dist.prefixSum]],
    * so packing a 100 TB corpus never serializes onto one partition. */
  private def packSeq(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d)
      .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n_tokens"))
    Dist.prefixSum(base, "doc_id", "n_tokens", "cum_tokens")
      .withColumn("start_offset", col("cum_tokens") - col("n_tokens"))
      .select(col("doc_id"), col("n_tokens"), col("start_offset"),
        floor(col("start_offset") / 512).cast("long").as("seq_bin"))
      .orderBy("doc_id")
  }

  /** Sliding-window chunking: split each document into 64-token
    * chunks at stride 48 (16-token overlap) — the retrieval/context
    * windowing step of a training pipeline. Chunk generation is a
    * per-row generator (sequence + posexplode): narrow, no shuffle,
    * row multiplication stays inside the scan stage — the same shape
    * at 100 TB. */
  private def chunk(s: SparkSession, d: String): DataFrame = {
    val ChunkLen = 64
    val Stride   = 48
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("n_starts",
        (ceil(greatest(size(col("toks")) - ChunkLen, lit(0)) / Stride.toDouble) + 1)
          .cast("int"))
    docs
      .select(col("doc_id"), col("toks"),
        posexplode(sequence(lit(0), col("n_starts") - 1)).as(Seq("chunk_id", "i")))
      .withColumn("start", col("i") * Stride)
      .withColumn("chunk_toks", slice(col("toks"), col("start") + 1, lit(ChunkLen)))
      .select(col("doc_id"), col("chunk_id"),
        col("start").cast("long").as("start"),
        size(col("chunk_toks")).as("n_chunk_tokens"),
        array_join(col("chunk_toks"), " ").as("chunk"))
      .orderBy("doc_id", "chunk_id")
  }

  /** Deterministic mixture sampling: per-source keep rates (source
    * srcK keeps at rate (20-K)/20) applied via a Lehmer hash of
    * doc_id — the domain-mixing step that reweights a corpus toward
    * a target source distribution. Engine-reproducible (pure integer
    * arithmetic, no RNG) and embarrassingly parallel: the keep
    * decision is a per-row predicate, pushed into the scan. */
  private def mixSample(s: SparkSession, d: String): DataFrame = {
    val rate = (lit(20) - substring(col("source"), 4, 10).cast("int")) / 20.0
    // two Lehmer rounds: one round leaves small ids clustered near 0;
    // the first mod bounds the second product at (M-1)*48271 < 2^63,
    // so the arithmetic never overflows BIGINT for any doc_id — the
    // same expression is exact on both engines at any corpus size
    val M = 2147483647L
    val u = pmod(pmod(col("doc_id") * 48271L, lit(M)) * 48271L, lit(M))
      .cast("double") / M.toDouble
    Tables.documents(s, d)
      .withColumn("rate", rate)
      .withColumn("u", u)
      .filter(col("u") < col("rate"))
      .select(col("doc_id"), col("lang"), col("source"),
        Det.r4(col("rate")).as("rate"), Det.r4(col("u")).as("u"))
      .orderBy("doc_id")
  }

  /** Repetition filter (Gopher-style): per-document top-bigram
    * fraction, top-token fraction, and duplicate-token fraction, plus
    * the composite flag. Frequency tables are (doc, unit)-keyed
    * aggregations with map-side partials — the shuffle carries one
    * row per distinct unit per doc, never the corpus text. */
  private def repetition(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("n_tok", size(col("toks")))
      // raw (non-distinct) bigrams: zip of toks with its own tail
      .withColumn("bgs",
        zip_with(
          slice(col("toks"), lit(1), greatest(size(col("toks")) - 1, lit(0))),
          slice(col("toks"), lit(2), greatest(size(col("toks")) - 1, lit(0))),
          (a, b) => concat(a, lit(" "), b)))
    // three consumers each re-scan the (column-pruned) source rather
    // than caching the tokenized corpus — at 100 TB the scan is the
    // cheap part and a corpus-sized cache would thrash storage memory
    def topFreq(unit: org.apache.spark.sql.Column, outMax: String, outTot: String) =
      docs.select(col("doc_id"), explode(unit).as("u"))
        .groupBy("doc_id", "u").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(max(col("c")).as(outMax), sum(col("c")).as(outTot))
    val tokF = topFreq(col("toks"), "top_tok", "n_tok_t")
    val bgF  = topFreq(col("bgs"), "top_bg", "n_bg")
    docs.select(col("doc_id"), col("n_tok"),
        size(array_distinct(col("toks"))).as("n_uniq"))
      .join(tokF, "doc_id")
      .join(bgF, "doc_id")
      .select(
        col("doc_id"),
        Det.r4(col("top_tok").cast("double") / col("n_tok")).as("top_tok_frac"),
        Det.r4(col("top_bg").cast("double") / col("n_bg")).as("top_bg_frac"),
        Det.r4((col("n_tok") - col("n_uniq")).cast("double") / col("n_tok"))
          .as("dup_tok_frac"),
        (col("top_bg").cast("double") / col("n_bg") > 0.18
          || (col("n_tok") - col("n_uniq")).cast("double") / col("n_tok") > 0.5)
          .as("is_repetitive"))
      .orderBy("doc_id")
  }

  /** Bigram-LM quality scoring (the CCNet recipe): train MLE bigram
    * probabilities on the corpus itself, score each document by its
    * mean log-probability — low scores mark incoherent/outlier text
    * for filtering. Every doc bigram exists in the count table by
    * construction, so the MLE needs no smoothing here.
    *
    * Scale shape: the model is the (distinct-bigram)-sized count
    * table — vocabulary-bounded, not corpus-bounded; scoring joins
    * the exploded doc bigrams against it on the bigram key with
    * map-side partial counts on both sides. The corpus text itself
    * shuffles only as (doc, bigram) occurrence rows. */
  private def lmScore(s: SparkSession, d: String): DataFrame = {
    val docBigrams = Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        explode(zip_with(
          slice(col("toks"), lit(1), greatest(size(col("toks")) - 1, lit(0))),
          slice(col("toks"), lit(2), greatest(size(col("toks")) - 1, lit(0))),
          (a, b) => concat(a, lit(" "), b))).as("bg"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
    val bgCounts = docBigrams.groupBy(col("bg")).agg(count(lit(1)).as("c_bg"))
    val w1Counts = docBigrams.groupBy(col("w1")).agg(count(lit(1)).as("c_w1"))
    docBigrams
      .join(bgCounts, "bg")
      .join(w1Counts, "w1")
      .withColumn("logp", log(col("c_bg").cast("double") / col("c_w1")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        Det.r4(Det.davg(col("logp"))).as("avg_logp"))
      .orderBy("doc_id")
  }

  /** Deterministic global shuffle: reproducible training-data order
    * without RNG. Each doc gets a Lehmer-hash key; shard = key mod 32
    * is the shuffle/partition key and the within-shard rank is a
    * per-shard window — shard count scales with data so no window
    * partition is ever corpus-sized, and (epoch-seed ⊕ doc_id) in
    * place of doc_id reshuffles per epoch with the same plan. */
  private def shuffleDet(s: SparkSession, d: String): DataFrame = {
    val M = 2147483647L
    val key = pmod(pmod(col("doc_id") * 48271L, lit(M)) * 48271L, lit(M))
    Tables.documents(s, d)
      .withColumn("key", key)
      .withColumn("shard", pmod(col("key"), lit(32L)))
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("shard").orderBy("key", "doc_id")))
      .select(col("doc_id"), col("shard"), col("pos").cast("long").as("pos"))
      .orderBy("shard", "pos")
  }

  /** Capstone #2: the corpus→training-shards pipeline, composing this
    * round's operators end-to-end as ONE oracle-checked query —
    * quality gates → duplicate-CLUSTER pruning (keep each cluster's
    * representative, not just pairwise drops) → deterministic mixture
    * sampling → sliding-window chunking → deterministic sharding.
    * Every stage is the partition-parallel formulation of its
    * standalone operator; nothing here is corpus-sized on the driver
    * or in any single window partition.
    *
    * The shard key packs (doc_id, chunk_id) as doc_id·128 + chunk_id
    * — valid while docs stay under ~6.1k tokens (128 chunks at
    * stride 48); a 100 TB deployment widens the factor with the
    * corpus's real max-doc bound. */
  private def pipelineTrain(s: SparkSession, d: String): DataFrame = {
    val ChunkLen = 64
    val Stride   = 48
    val M        = 2147483647L
    // 1. quality gates: length + duplicate-token fraction (array-local)
    val toks = tokens(col("text"))
    val gated = Tables.documents(s, d)
      .withColumn("toks", toks)
      .withColumn("n_tok", size(col("toks")))
      .filter(col("n_tok") >= 10
        && (col("n_tok") - size(array_distinct(col("toks")))).cast("double")
           / col("n_tok") <= 0.5)
    // 2. near-dup cluster pruning: drop non-representative members
    val dupMembers = Dedup.clusterLabels(s, d)
      .filter(col("node") =!= col("lbl"))
      .select(col("node").as("doc_id"))
    val unique = gated.join(dupMembers, Seq("doc_id"), "left_anti")
    // 3. deterministic mixture sampling (two-round Lehmer, as q_mix_sample)
    val u = pmod(pmod(col("doc_id") * 48271L, lit(M)) * 48271L, lit(M))
      .cast("double") / M.toDouble
    val rate = (lit(20) - substring(col("source"), 4, 10).cast("int")) / 20.0
    val sampled = unique.filter(u < rate)
    // 4. sliding-window chunking (as q_chunk)
    val chunks = sampled
      .withColumn("n_starts",
        (ceil(greatest(col("n_tok") - ChunkLen, lit(0)) / Stride.toDouble) + 1).cast("int"))
      .select(col("doc_id"), col("toks"),
        posexplode(sequence(lit(0), col("n_starts") - 1)).as(Seq("chunk_id", "i")))
      .withColumn("chunk_toks",
        slice(col("toks"), col("i") * Stride + 1, lit(ChunkLen)))
    // 5. deterministic sharding of chunks (as q_shuffle_det)
    val key = pmod(pmod((col("doc_id") * 128 + col("chunk_id")) * 48271L, lit(M))
      * 48271L, lit(M))
    chunks
      .withColumn("key", key)
      .withColumn("shard", pmod(col("key"), lit(16L)))
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("shard").orderBy("key", "doc_id", "chunk_id")))
      .select(col("doc_id"), col("chunk_id"), col("shard"),
        col("pos").cast("long").as("pos"),
        size(col("chunk_toks")).as("n_chunk_tokens"))
      .orderBy("shard", "pos")
  }

  /** One BPE-training merge step: count ADJACENT token pairs across
    * the corpus and emit the top candidates — the inner loop of
    * byte-pair-encoding vocabulary learning (Sennrich et al., ACL
    * 2016), run corpus-scale. The pair stream is built NARROWLY by
    * zipping each token list with its own tail (zip_with over two
    * slices — no posexplode self-join, which would shuffle the corpus
    * twice), so the only shuffle is the final pair-count aggregation,
    * whose cardinality is vocabulary², not corpus-sized; the top-30
    * cut is a TakeOrderedAndProject (per-partition top-k merge, never
    * a global sort). Ranking ties break on the pair itself, so the
    * cutoff is total-ordered and cross-engine deterministic. */
  private def bpePairs(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
    toks
      .select(explode(zip_with(
        slice(col("t"), lit(1), size(col("t")) - 1),
        slice(col("t"), lit(2), size(col("t")) - 1),
        (x, y) => struct(x.as("tok_a"), y.as("tok_b")))).as("p"))
      .groupBy(col("p.tok_a").as("tok_a"), col("p.tok_b").as("tok_b"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok_a"), col("tok_b"))
      .limit(30)
  }

  /** Per-document n-gram NOVELTY: the fraction of a doc's distinct
    * 3-token shingles whose FIRST corpus occurrence (min doc_id) is
    * this doc — the "contribution" signal dedup-aware sampling uses
    * to down-weight documents that mostly restate earlier corpus
    * content. Reported as the bottom-20 (most redundant) docs.
    *
    * Scale shape: one shingle-keyed aggregation finds each shingle's
    * first owner; the join back arrives co-partitioned from that agg
    * (same key), then a doc-keyed count — two keyed exchanges linear
    * in the shingle stream, never a doc-pair stage. This is the
    * aggregate-side complement of the MinHash candidate pipeline:
    * where near-dup asks "which PAIRS collide", novelty asks "how
    * much of each doc is corpus-first", at O(corpus tokens). */
  private def ngramNovelty(s: SparkSession, d: String): DataFrame = {
    val sh = Tables.documents(s, d)
      .select(col("doc_id"), explode(shingles(tokens(col("text")), 3)).as("g"))
    val firstOwner = sh.groupBy("g").agg(min(col("doc_id")).as("first_doc"))
    sh.join(firstOwner, "g")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_sh"),
        count(when(col("first_doc") === col("doc_id"), lit(1))).as("n_novel"))
      .select(col("doc_id"), col("n_sh"), col("n_novel"),
        Det.r4(col("n_novel").cast("double") / col("n_sh")).as("novelty"))
      .orderBy(col("novelty").asc, col("doc_id"))
      .limit(20)
  }

  /** DSIR feature-space size (hashed unigram buckets). */
  private[ops] val DsirBuckets = 256
  /** Sample size. */
  private[ops] val DsirK = 50
  private val DsirTargetLang = "en"

  /** Hashed-feature bucket of one token: the spec-stated Horner fold
    * of the token's code points mod 2³¹−1 (SimHash64.tokenHash's
    * first field), reduced mod [[DsirBuckets]] — reproducible on any
    * engine from the constants alone. Computed once per DISTINCT
    * token (vocabulary-sized work) and broadcast back, never per
    * occurrence. */
  private def dsirBucket(t: Column): Column =
    aggregate(
      transform(sequence(lit(1), length(t)), i => ascii(t.substr(i, lit(1)))),
      lit(0L), (a, c) => (a * 131 + c) % 2147483647L) % DsirBuckets

  /** Data Selection via Importance Resampling (DSIR — Xie et al.,
    * NeurIPS 2023): score every document by how much its hashed
    * unigram features look like a TARGET domain (here lang = 'en')
    * relative to the raw corpus, w(doc) = Σ_tokens ln(p̂_t(b(tok)) /
    * p̂_r(b(tok))) with add-1-smoothed bucket distributions, and keep
    * the top-[[DsirK]] — the standard cheap proxy for "select
    * pretraining data that matches a high-quality domain".
    * Deterministic and seedless: this is the importance-WEIGHT
    * ranking (top-k) variant, not gumbel resampling — no RNG to
    * reconcile across engines.
    *
    * Scale shape: token→bucket hashing is vocabulary-sized (distinct
    * tokens) and broadcast back to the occurrence stream; the bucket
    * distributions are one map-side-combined count over (bucket) —
    * [[DsirBuckets]] rows — joined back as a broadcast; the per-doc
    * weight is one doc-keyed DECIMAL-exact sum. Nothing pairwise,
    * nothing corpus-global beyond two bounded broadcasts; the widest
    * shuffle is the per-doc aggregation the pipeline needs anyway.
    * Determinism: ln ratios are identical IEEE expressions on both
    * engines (the BM25 LN precedent), per-token addends are
    * DECIMAL(18,8)-cast so the doc sum is order-independent, and the
    * top-k cut orders by (r4 weight, doc_id) — a total order. */
  private def dsirSample(s: SparkSession, d: String): DataFrame = {
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), explode(tokens(col("text"))).as("t"))
      .filter(length(col("t")) > 0)
    val vocab = tok.select("t").distinct().withColumn("b", dsirBucket(col("t")))
    val bt = tok.join(broadcast(vocab), "t")
      .select(col("doc_id"), col("lang"), col("b"))
    val counts = bt.groupBy("b").agg(
      count(lit(1)).as("cr"),
      count(when(col("lang") === DsirTargetLang, lit(1))).as("ct"))
    val tots = counts.agg(sum(col("cr")).as("nr"), sum(col("ct")).as("nt"))
    val lnr = counts.crossJoin(broadcast(tots))
      .select(col("b"),
        log(((col("ct") + 1).cast("double") / (col("nt") + DsirBuckets))
          / ((col("cr") + 1).cast("double") / (col("nr") + DsirBuckets))).as("lnr"))
    bt.join(broadcast(lnr), "b")
      .groupBy("doc_id")
      .agg(Det.r4(Det.dsum(col("lnr"), 8)).as("weight"),
        count(lit(1)).as("n_tokens"))
      .orderBy(col("weight").desc, col("doc_id"))
      .limit(DsirK)
  }

  /** BPE merge rounds trained. */
  private[ops] val BpeRounds = 3

  /** BPE tokenizer TRAINING, not just pair counting (q_bpe_pairs is
    * one round's input): [[BpeRounds]] greedy merge rounds — count
    * adjacent HETEROGENEOUS digrams, merge every occurrence of the
    * most frequent pair (ties → lexicographic), recount on the merged
    * stream, repeat. Restricting to a ≠ b pairs makes the greedy
    * merge exactly window-expressible: a match at position i−1 forces
    * tokᵢ = b and a match at i would need tokᵢ = a, so matches NEVER
    * overlap and "merge all non-overlapping occurrences left-to-right"
    * is just `match ∧ ¬lag(match)` — no sequential scan, no run-parity
    * recursion (homogeneous runs like "aa aa" are the one case that
    * needs it, and real-text BPE implementations special-case them
    * too). Reports per round: the merged pair, its count, and the
    * stream size after the merge.
    *
    * Scale shape: each round is one doc-keyed window pass (LEAD+LAG
    * share the spec → a single WindowExec), one map-side-combined
    * pair count, a 1-row broadcast argmax, and a narrow rewrite —
    * the stream is localCheckpointed per round (the kcore/CC lineage
    * rule). At 100 TB a tokenizer trains on a sample; the shape is
    * unchanged, the sample gate is one filter. */
  private def bpeTrain(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    var stream = Tables.documents(s, d)
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
      .localCheckpoint()
    var profile = Seq.empty[DataFrame]
    // merge rounds execute eagerly (argmax + stream checkpoints) and
    // are compile-bound at bench scale — run interpreted, like the
    // graph-tier loops (GraftSession.interpreted has the measurements)
    graft.GraftSession.interpreted(s) {
    for (r <- 1 to BpeRounds) {
      val w = Window.partitionBy("doc_id").orderBy("pos")
      val withNext = stream.withColumn("nxt", lead(col("tok"), 1).over(w))
      val best = withNext
        .filter(col("nxt").isNotNull && col("tok") =!= col("nxt"))
        .groupBy(col("tok").as("a"), col("nxt").as("b"))
        .agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("a"), col("b")).limit(1)
        // 1 row, two consumers (merge broadcast + profile row): cut
        // so the pair-count pass runs once per round, not twice
        .localCheckpoint()
      val merged = withNext.crossJoin(broadcast(best))
        .withColumn("m", col("tok") === col("a") && col("nxt") === col("b"))
        .withColumn("mp", coalesce(lag(col("m"), 1).over(w), lit(false)))
        .filter(!col("mp"))
        .select(col("doc_id"), col("pos"),
          when(col("m"), concat(col("tok"), lit(" "), col("nxt")))
            .otherwise(col("tok")).as("tok"))
        .localCheckpoint()
      profile = profile :+ best
        .crossJoin(broadcast(merged.agg(count(lit(1)).as("n_tokens_after"))))
        .select(lit(r).as("round"), col("a").as("merged_a"),
          col("b").as("merged_b"), col("c").as("pair_count"),
          col("n_tokens_after"))
      stream = merged
    }
    }
    profile.reduce(_ unionAll _).orderBy("round")
  }

  override val queries: Map[String, Q] = Map(
    "q_decontaminate"  -> decontaminate,
    "q_bpe_train"      -> bpeTrain,
    "q_dsir_sample"    -> dsirSample,
    "q_ngram_novelty"  -> ngramNovelty,
    "q_bpe_pairs"      -> bpePairs,
    "q_decontaminate_bloom" -> decontaminateBloom,
    "q_pack_seq"       -> packSeq,
    "q_chunk"          -> chunk,
    "q_mix_sample"     -> mixSample,
    "q_repetition"     -> repetition,
    "q_lm_score"       -> lmScore,
    "q_shuffle_det"    -> shuffleDet,
    "q_pipeline_train" -> pipelineTrain,
  )

  // shingle construction mirrors graft.functions.Shingles: distinct
  // 3-token windows joined with a space; inputs shorter than 3
  // tokens yield the whole-input join (slice clamps)
  private val DecontaminateOracle =
    s"""WITH sh AS (
       |  SELECT doc_id,
       |         list_distinct(list_transform(
       |           range(1, greatest(LEN(string_split(text, ' ')) - 1, 2)),
       |           i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS s
       |  FROM documents),
       |bench AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 10 = 0),
       |cand AS (SELECT doc_id, CAST(LEN(s) AS INT) AS n_sh, unnest(s) AS g
       |         FROM sh WHERE doc_id % 10 <> 0)
       |SELECT doc_id, n_sh, n_hits, ${Det.r4Sql("CAST(n_hits AS DOUBLE) / n_sh")} AS overlap
       |FROM (SELECT doc_id, n_sh, COUNT(*) AS n_hits
       |      FROM cand JOIN bench USING (g)
       |      GROUP BY doc_id, n_sh)
       |WHERE CAST(n_hits AS DOUBLE) / n_sh >= 0.3
       |ORDER BY doc_id""".stripMargin

  /** DSIR oracle: the Horner token hash restated over the distinct
    * vocabulary via the recursive power CTE (the q_dedup_near
    * machinery), then the identical smoothing/LN/decimal-sum
    * arithmetic. */
  private def dsirOracle: String =
    s"""WITH RECURSIVE tf AS (
       |  SELECT doc_id, lang, t FROM (
       |    SELECT doc_id, lang, UNNEST(string_split(text, ' ')) AS t
       |    FROM documents)
       |  WHERE t <> ''),
       |vocab AS (SELECT DISTINCT t FROM tf),
       |pw(e, v) AS (
       |  SELECT 0, CAST(1 AS BIGINT)
       |  UNION ALL
       |  SELECT e + 1, (v * 131) % 2147483647
       |  FROM pw WHERE e < (SELECT MAX(length(t)) FROM vocab)),
       |ch AS (SELECT t, length(t) AS n, unnest(range(1, length(t) + 1)) AS i
       |       FROM vocab),
       |hb AS (
       |  SELECT t,
       |         CAST(SUM(ord(substr(t, CAST(i AS INT), 1)) * pw.v)
       |              % 2147483647 AS BIGINT) % $DsirBuckets AS b
       |  FROM ch JOIN pw ON pw.e = ch.n - ch.i
       |  GROUP BY t),
       |bt AS (SELECT doc_id, lang, b FROM tf JOIN hb USING (t)),
       |counts AS (
       |  SELECT b, COUNT(*) AS cr,
       |         COUNT(CASE WHEN lang = '$DsirTargetLang' THEN 1 END) AS ct
       |  FROM bt GROUP BY b),
       |tot AS (SELECT SUM(cr) AS nr, SUM(ct) AS nt FROM counts),
       |lnr AS (
       |  SELECT b,
       |         LN((CAST(ct + 1 AS DOUBLE) / (nt + $DsirBuckets))
       |            / (CAST(cr + 1 AS DOUBLE) / (nr + $DsirBuckets))) AS lnr
       |  FROM counts, tot)
       |SELECT doc_id,
       |       ${Det.r4Sql(Det.dsumSql("lnr", 8))} AS weight,
       |       COUNT(*) AS n_tokens
       |FROM bt JOIN lnr USING (b)
       |GROUP BY doc_id
       |ORDER BY weight DESC, doc_id
       |LIMIT $DsirK""".stripMargin

  /** BPE-training oracle: the merge rounds unrolled with MATERIALIZED
    * stream CTEs (each round's stream has three consumers — the next
    * round, its pair count, and the profile row — so plain CTEs would
    * inline-explode, the q_kcore lesson). The profile rows join the
    * 1-row best table (FROM, not scalar subqueries) so an empty
    * corpus yields zero rows on both engines. */
  private def bpeTrainOracle: String = {
    val rounds = (1 to BpeRounds).map { r =>
      val p = r - 1
      s"""n$r AS (
         |  SELECT doc_id, pos, tok,
         |         LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
         |  FROM s$p),
         |b$r AS MATERIALIZED (
         |  SELECT tok AS a, nxt AS b, COUNT(*) AS c
         |  FROM n$r WHERE nxt IS NOT NULL AND tok <> nxt
         |  GROUP BY 1, 2
         |  ORDER BY c DESC, a, b LIMIT 1),
         |s$r AS MATERIALIZED (
         |  SELECT doc_id, pos,
         |         CASE WHEN m THEN tok || ' ' || nxt ELSE tok END AS tok
         |  FROM (
         |    SELECT doc_id, pos, tok, nxt, m,
         |           COALESCE(LAG(m) OVER (PARTITION BY doc_id ORDER BY pos),
         |                    false) AS mp
         |    FROM (SELECT n$r.*,
         |                 (tok = b$r.a AND nxt = b$r.b) AS m
         |          FROM n$r, b$r))
         |  WHERE NOT mp)""".stripMargin
    }.mkString(",\n")
    val profile = (1 to BpeRounds).map { r =>
      s"""SELECT $r AS round, a AS merged_a, b AS merged_b, c AS pair_count,
         |       nt AS n_tokens_after
         |FROM b$r CROSS JOIN (SELECT COUNT(*) AS nt FROM s$r)""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH sp AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |s0 AS MATERIALIZED (
       |  SELECT doc_id, generate_subscripts(toks, 1) AS pos, UNNEST(toks) AS tok
       |  FROM sp),
       |$rounds
       |SELECT * FROM (
       |$profile
       |) ORDER BY round""".stripMargin
  }

  override val oracles: Map[String, String] = Map(
    "q_decontaminate" -> DecontaminateOracle,
    "q_bpe_train"     -> bpeTrainOracle,
    "q_dsir_sample"   -> dsirOracle,
    "q_ngram_novelty" ->
      s"""WITH sh AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(
         |           range(1, greatest(LEN(string_split(text, ' ')) - 1, 2)),
         |           i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')))) AS g
         |  FROM documents),
         |fo AS (SELECT g, MIN(doc_id) AS first_doc FROM sh GROUP BY g)
         |SELECT doc_id, n_sh, n_novel,
         |       ${Det.r4Sql("CAST(n_novel AS DOUBLE) / n_sh")} AS novelty
         |FROM (SELECT sh.doc_id, COUNT(*) AS n_sh,
         |             COUNT(CASE WHEN fo.first_doc = sh.doc_id THEN 1 END) AS n_novel
         |      FROM sh JOIN fo USING (g)
         |      GROUP BY sh.doc_id)
         |ORDER BY novelty ASC, doc_id LIMIT 20""".stripMargin,
    // adjacent pairs via list-slice zip: t[:-2] is the first n-1
    // elements (1-based inclusive slicing, -2 = second-to-last),
    // t[2:] the last n-1 — same pairing as the Spark zip_with
    "q_bpe_pairs" ->
      """WITH toks AS (
        |  SELECT string_split(text, ' ') AS t FROM documents
        |  WHERE LEN(string_split(text, ' ')) >= 2),
        |pairs AS (
        |  SELECT UNNEST(list_zip(t[:-2], t[2:])) AS p FROM toks)
        |SELECT p[1] AS tok_a, p[2] AS tok_b, COUNT(*) AS cnt
        |FROM pairs
        |GROUP BY 1, 2
        |ORDER BY cnt DESC, tok_a, tok_b
        |LIMIT 30""".stripMargin,
    // the Bloom variant is result-identical by construction (no false
    // negatives + exact confirmation join) — same oracle
    "q_decontaminate_bloom" -> DecontaminateOracle,
    "q_pack_seq" ->
      """SELECT doc_id, n_tokens,
        |       CAST(SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
        |            - n_tokens AS BIGINT) AS start_offset,
        |       CAST(FLOOR((SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
        |            - n_tokens) / 512) AS BIGINT) AS seq_bin
        |FROM (SELECT doc_id, CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,
    // DuckDB list slicing toks[a:b] is 1-based inclusive, so
    // [start+1 : start+64] is exactly Spark's slice(toks, start+1, 64)
    "q_chunk" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks,
        |         CAST(CEIL(GREATEST(LEN(string_split(text, ' ')) - 64, 0) / 48.0) AS INT) + 1 AS n_starts
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, UNNEST(range(n_starts)) AS chunk_id, toks FROM d)
        |SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
        |       CAST(chunk_id * 48 AS BIGINT) AS start,
        |       CAST(LEN(toks[chunk_id*48 + 1 : chunk_id*48 + 64]) AS INT) AS n_chunk_tokens,
        |       array_to_string(toks[chunk_id*48 + 1 : chunk_id*48 + 64], ' ') AS chunk
        |FROM c
        |ORDER BY doc_id, chunk_id""".stripMargin,
    "q_mix_sample" ->
      s"""WITH d AS (
         |  SELECT doc_id, lang, source,
         |         (20 - CAST(SUBSTR(source, 4) AS INT)) / 20 AS rate,
         |         CAST(((doc_id * 48271) % 2147483647) * 48271 % 2147483647 AS DOUBLE)
         |           / 2147483647 AS u
         |  FROM documents)
         |SELECT doc_id, lang, source,
         |       ${Det.r4Sql("rate")} AS rate, ${Det.r4Sql("u")} AS u
         |FROM d WHERE u < rate
         |ORDER BY doc_id""".stripMargin,
    // raw bigrams via LEAD over token position (the last token's
    // NULL partner is dropped) — same multiset as the Spark zip
    "q_repetition" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |         UNNEST(string_split(text, ' ')) AS tok,
         |         UNNEST(range(LEN(string_split(text, ' ')))) AS pos
         |  FROM documents),
         |base AS (
         |  SELECT doc_id,
         |         CAST(LEN(string_split(text, ' ')) AS INT) AS n_tok,
         |         CAST(LEN(list_distinct(string_split(text, ' '))) AS INT) AS n_uniq
         |  FROM documents),
         |bg AS (
         |  SELECT doc_id, bg FROM (
         |    SELECT doc_id, tok || ' ' || LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS bg
         |    FROM t) WHERE bg IS NOT NULL),
         |tokf AS (
         |  SELECT doc_id, MAX(c) AS top_tok FROM (
         |    SELECT doc_id, COUNT(*) AS c FROM t GROUP BY doc_id, tok)
         |  GROUP BY doc_id),
         |bgf AS (
         |  SELECT doc_id, MAX(c) AS top_bg, SUM(c) AS n_bg FROM (
         |    SELECT doc_id, COUNT(*) AS c FROM bg GROUP BY doc_id, bg)
         |  GROUP BY doc_id)
         |SELECT b.doc_id,
         |       ${Det.r4Sql("CAST(top_tok AS DOUBLE) / n_tok")} AS top_tok_frac,
         |       ${Det.r4Sql("CAST(top_bg AS DOUBLE) / n_bg")} AS top_bg_frac,
         |       ${Det.r4Sql("CAST(n_tok - n_uniq AS DOUBLE) / n_tok")} AS dup_tok_frac,
         |       (CAST(top_bg AS DOUBLE) / n_bg > 0.18
         |         OR CAST(n_tok - n_uniq AS DOUBLE) / n_tok > 0.5) AS is_repetitive
         |FROM base b JOIN tokf USING (doc_id) JOIN bgf USING (doc_id)
         |ORDER BY b.doc_id""".stripMargin,
    "q_lm_score" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |         UNNEST(string_split(text, ' ')) AS tok,
         |         UNNEST(range(LEN(string_split(text, ' ')))) AS pos
         |  FROM documents),
         |bg AS (
         |  SELECT doc_id, bg, split_part(bg, ' ', 1) AS w1 FROM (
         |    SELECT doc_id, tok || ' ' || LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS bg
         |    FROM t) WHERE bg IS NOT NULL),
         |bgc AS (SELECT bg, COUNT(*) AS c_bg FROM bg GROUP BY bg),
         |w1c AS (SELECT w1, COUNT(*) AS c_w1 FROM bg GROUP BY w1)
         |SELECT doc_id, COUNT(*) AS n_bigrams,
         |       ${Det.r4Sql(Det.davgSql("LN(CAST(c_bg AS DOUBLE) / c_w1)"))} AS avg_logp
         |FROM bg JOIN bgc USING (bg) JOIN w1c USING (w1)
         |GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin,
    // the cluster CTE mirrors q_dedup_cluster's oracle; downstream
    // stages reuse the standalone operators' oracle arithmetic
    "q_pipeline_train" ->
      """WITH RECURSIVE p0 AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM (SELECT doc_id, lang, source, list_distinct(string_split(text,' ')) toks FROM documents) a
        |  JOIN (SELECT doc_id, lang, source, list_distinct(string_split(text,' ')) toks FROM documents) b
        |    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
        |  WHERE CAST(LEN(list_intersect(a.toks, b.toks)) AS DOUBLE)
        |        / LEN(list_distinct(list_concat(a.toks, b.toks))) >= 0.5),
        |edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM p0
        |  UNION ALL SELECT doc_b, doc_a FROM p0),
        |reach(node, lbl) AS (
        |  SELECT DISTINCT src, src FROM edges
        |  UNION
        |  SELECT e.src, r.lbl FROM reach r JOIN edges e ON e.dst = r.node),
        |members AS (
        |  SELECT node AS doc_id FROM reach GROUP BY node HAVING node <> MIN(lbl)),
        |gated AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS toks,
        |         CAST(LEN(string_split(text, ' ')) AS INT) AS n_tok
        |  FROM documents
        |  WHERE LEN(string_split(text, ' ')) >= 10
        |    AND CAST(LEN(string_split(text, ' '))
        |             - LEN(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |        / LEN(string_split(text, ' ')) <= 0.5),
        |uniq AS (
        |  SELECT * FROM gated WHERE doc_id NOT IN (SELECT doc_id FROM members)),
        |sampled AS (
        |  SELECT * FROM uniq
        |  WHERE CAST(((doc_id * 48271) % 2147483647) * 48271 % 2147483647 AS DOUBLE)
        |          / 2147483647
        |        < (20 - CAST(SUBSTR(source, 4) AS INT)) / 20),
        |chunks AS (
        |  SELECT doc_id, toks,
        |         UNNEST(range(CAST(CEIL(GREATEST(n_tok - 64, 0) / 48.0) AS INT) + 1)) AS cid
        |  FROM sampled),
        |keyed AS (
        |  SELECT doc_id, CAST(cid AS INT) AS chunk_id,
        |         ((doc_id * 128 + cid) * 48271 % 2147483647) * 48271 % 2147483647 AS key,
        |         CAST(LEN(toks[cid*48 + 1 : cid*48 + 64]) AS INT) AS n_chunk_tokens
        |  FROM chunks)
        |SELECT doc_id, chunk_id, key % 16 AS shard,
        |       ROW_NUMBER() OVER (PARTITION BY key % 16 ORDER BY key, doc_id, chunk_id) AS pos,
        |       n_chunk_tokens
        |FROM keyed
        |ORDER BY shard, pos""".stripMargin,
    "q_shuffle_det" ->
      """WITH k AS (
        |  SELECT doc_id,
        |         ((doc_id * 48271) % 2147483647) * 48271 % 2147483647 AS key
        |  FROM documents)
        |SELECT doc_id, key % 32 AS shard,
        |       ROW_NUMBER() OVER (PARTITION BY key % 32 ORDER BY key, doc_id) AS pos
        |FROM k
        |ORDER BY shard, pos""".stripMargin,
  )
}
