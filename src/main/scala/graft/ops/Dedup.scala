package graft.ops

import graft.{QueryPack, Tables}
import graft.functions.TextSim._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication tier: exact (keyed first-wins — the reference's
  * last-wins lease dedup analog, /root/reference/task.ts:121-125 /
  * CHANGELOG.md:16), MinHash+LSH near-dup, SimHash near-dup,
  * token-set Jaccard near-dup, and embedding-cosine near-dup.
  *
  * Scale posture (100 TB): every near-dup variant generates
  * candidates through a bounded key (LSH band bucket, SimHash chunk,
  * rare-first prefix token, k-means cluster) and only scores within
  * buckets — never an unrestricted O(n²) cross join and never a
  * data-demographics block (a dominant (lang, source) block is a
  * cartesian bomb). The exact rescoring join touches only candidate
  * pairs.
  */
object Dedup extends QueryPack {

  /** Exact dedup, first-wins on a normalized key (first 5 tokens).
    * row_number() over a deterministic tie-break — the order-stable
    * formulation of dropDuplicates (SURVEY.md A7). */
  private def dedupExact(s: SparkSession, d: String): DataFrame = {
    val key = lower(array_join(slice(split(col("text"), " "), 1, 5), " "))
    val w = Window.partitionBy("norm_key").orderBy("doc_id")
    Tables.documents(s, d)
      .withColumn("norm_key", key)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy("doc_id")
  }

  /** MinHash(32) + LSH(8 bands × 4 rows) near-dup pairs, rescored
    * with exact shingle Jaccard >= 0.8.
    *
    * Plan shape matters here: the signature is computed by the native
    * single-pass Expression BEFORE the band explode, and each band's
    * bucket is derived from the materialized signature attribute —
    * explode-then-bucket. Building an array of 8 band structs over
    * the raw signature expression instead lets CollapseProject
    * duplicate the whole MinHash tree into every struct field (and
    * the explode's implicit size filter), which measured ~50× slower
    * at sf0.1. */
  private def dedupNear(s: SparkSession, d: String): DataFrame = {
    // explicit-count repartition BEFORE the signature computation:
    // the one-file scan otherwise runs the whole MinHash pass in a
    // single task per join side (AQE would re-coalesce a column-only
    // repartition of so small an input)
    val docs = Tables.documents(s, d)
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("doc_id"), shingles(tokens(col("text")), 3).as("sh"))
    val sigs = docs.select(col("doc_id"), col("sh"),
      minhashSignature(col("sh"), 32).as("sig"))
    // Shingle sets ride along through the band join, so a candidate
    // pair is rescored in place — no distinct+rejoin round trips.
    // (The id-only-candidates-then-rejoin variant shuffles less per
    // row but adds three joins; with banded buckets the carried
    // payload is bounded by bucket width, and a pair is rescored at
    // most once per colliding band before the final pair-dedup.)
    val buckets = sigs
      .select(col("doc_id"), col("sh"), explode(sequence(lit(0), lit(7))).as("band"), col("sig"))
      .select(col("doc_id"), col("sh"), col("band"),
        lshBandBucket(col("sig"), col("band"), 4).as("bucket"))
    // One fused And keeps the conjunct order cheap→expensive (id
    // ordering halves the directed pairs BEFORE the shingle-set
    // Jaccard runs — Catalyst preserves order inside a conjunction
    // and codegen short-circuits; separate Filters get reordered).
    buckets.as("x")
      .join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket"))
      .filter(col("x.doc_id") < col("y.doc_id")
        && jaccard(col("x.sh"), col("y.sh")) >= 0.8)
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        graft.Det.r4(jaccard(col("x.sh"), col("y.sh"))).as("jaccard"))
      .dropDuplicates("doc_a", "doc_b")
      .orderBy("doc_a", "doc_b")
  }

  /** SimHash near-dup: 64-bit signatures, candidates via 4×16-bit
    * chunk blocking (pigeonhole: hamming<=6 pairs share a chunk with
    * high probability; hamming<=3 pairs share one always), verified
    * with bit_count(xor) <= 6. The signature's token hash is
    * spec-stated (SimHash64.tokenHash — r7), so the whole pipeline,
    * blocking predicate included, is restated as the DuckDB oracle:
    * this key is hash-matched, not rows-only. */
  private def dedupSimhash(s: SparkSession, d: String): DataFrame = {
    val sigs = Tables.documents(s, d)
      .repartition(s.sparkContext.defaultParallelism) // parallel signature pass
      .withColumn("toks", tokens(col("text")))
      .withColumn("sim", graft.functions.SimHash64.simhash64(col("toks")))
      .select(col("doc_id"), col("sim"))
    // explode-then-chunk (same plan-shape rule as dedupNear)
    val chunks = sigs
      .select(col("doc_id"), col("sim"), explode(sequence(lit(0), lit(3))).as("chunk"))
      .select(col("doc_id"), col("sim"), col("chunk"),
        expr("shiftrightunsigned(sim, CAST(chunk * 16 AS INT)) & 65535").as("ck"))
    chunks.as("x")
      .join(chunks.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.ck") === col("y.ck")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.sim").bitwiseXOR(col("y.sim"))).as("hamming"))
      // filter BEFORE the pair-dedup: hamming is O(1), so the
      // distinct (a shuffle) sees only matching pairs, not every
      // band collision
      .filter(col("hamming") <= 6)
      .distinct()
      .orderBy("doc_a", "doc_b")
  }

  /** Token-Jaccard (>= 0.5) near-dup pairs within (lang, source)
    * blocks, shared by [[dedupNgram]] (scored output), [[dedupEdit]]
    * (Levenshtein rescore) and [[dedupCluster]] (graph edges).
    *
    * Candidate generation is EXACT prefix filtering (AllPairs /
    * PPJoin, Bayardo et al. WWW'07): order every document's token set
    * by ascending global frequency (rarest first, token as
    * tie-break — one total order for the whole corpus) and keep only
    * the first floor((1-t)·|toks|)+1 tokens. Two sets with
    * J(A,B) >= t MUST share a prefix token — |A∩B| >= t·|A∪B| >=
    * ⌈t·|A|⌉, and a prefix of length |A|-⌈t·|A|⌉+1 is too long for
    * the intersection to hide entirely in the suffix — so joining on
    * (prefix token, lang, source) has provably 100% recall: the
    * rescored pair set is byte-identical to the naive block join's
    * (and the recursive-CTE oracle's).
    *
    * Why this survives 100 TB where the (lang, source) block join
    * doesn't: block-join cost is Σ block², and block sizes are set by
    * data demographics — one dominant (en, srcK) block is a cartesian
    * bomb. Here the join key is the prefix TOKEN; rare-first ordering
    * means frequent tokens land in a prefix only when a document is
    * made of nothing else, so posting lists are bounded by token
    * rarity, not corpus demographics — the candidate count tracks the
    * true-pair count. The frequency table is vocabulary-sized, the
    * prefix-rank window is per-document, and every other shuffle is
    * keyed — nothing quadratic in any block. */
  private def ngramPairs(s: SparkSession, d: String): DataFrame =
    ngramPairsOf(Tables.documents(s, d))

  /** [[ngramPairs]] over an explicit (doc_id, lang, source, text)
    * DataFrame — factored so the prefix-filter + positional-filter
    * recall proof is property-testable on arbitrary synthetic corpora
    * (PropertySpec), not just the fixture tables. */
  private[ops] def ngramPairsOf(documents: DataFrame): DataFrame = {
    val t = 0.5
    // required-overlap factor: J >= t  ⟺  |A∩B| >= t/(1+t)·(|A|+|B|)
    val tf = t / (1 + t)
    // epsilon guard on every real-valued ceil/bound: double rounding
    // must only ever LENGTHEN a prefix or LOOSEN a bound (more
    // candidates, never a missed pair)
    val eps = 1e-9
    val docs = documents
      .select(col("doc_id"), col("lang"), col("source"),
        array_distinct(split(col("text"), " ")).as("toks"))
      .withColumn("n", size(col("toks")))
    val occ = docs.select(col("doc_id"), col("lang"), col("source"),
      col("n"), explode(col("toks")).as("tok"))
    // global document frequency per token — vocabulary-sized
    val tokDf = occ.groupBy("tok").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id").orderBy(col("df").asc, col("tok").asc)
    // persisted: the candidate self-join reads pref on BOTH sides, and
    // without the cache the occ→df-join→window subtree executes twice
    // (the self-join's two exchanges differ by alias, so Spark's
    // exchange reuse does not collapse them). The cache is
    // CacheManager-registered, so the bench's clearCache() between
    // queries reclaims it; an eager release here (persist cand +
    // count + unpersist pref) was tried and REJECTED: splitting the
    // fused job in two re-ran the window pipeline and measured ~2×
    // slower across the whole family (PLANS.md round 5).
    val pref = occ.join(tokDf, "tok")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= floor(col("n") * (1 - t)) + 1)
      .select(col("tok"), col("doc_id"), col("lang"), col("source"),
        col("n"), col("rk"))
      .persist()
    // candidates: shared prefix token within the block, plus two O(1)
    // exact prunes evaluated per posting row BEFORE the pair-distinct:
    // the PPJoin length bound J <= min/max, and the PPJoin POSITIONAL
    // filter — a shared token at prefix ranks (rk_a, rk_b) caps the
    // overlap at 1 + min(n_a - rk_a, n_b - rk_b) whenever it is the
    // pair's FIRST shared token in the global rare-first order (no
    // common token can precede it on either side), and a true pair's
    // first-shared-token row always lands inside both prefixes and
    // passes the cap (overlap >= t/(1+t)·(n_a+n_b) forces it), so
    // keep-if-any-row-passes is exact while duplicate-pair rows from
    // late shared tokens are dropped before the distinct shuffle. The
    // epsilon keeps double rounding from ever tightening the bound.
    // NOTE both join sides stay the IDENTICAL cached plan: an
    // asymmetric PPJoin indexing prefix (⅓-length on the smaller
    // side) was tried and REJECTED — the differing side filters gave
    // the two exchanges different subtrees, the window pipeline
    // computed twice, and the family benched ~2× slower even though
    // the join itself shrank (PLANS.md round 5).
    // distinct-BEFORE-rescore (opposite trade from dedupNear): at
    // t=0.5 the prefix is half the document, so carrying token sets
    // through the posting join would duplicate the payload per shared
    // prefix token — dedup the id pairs first, rescore each pair
    // exactly once.
    val cand = pref.as("a")
      .join(pref.as("b"),
        col("a.tok") === col("b.tok")
          && col("a.lang") === col("b.lang") && col("a.source") === col("b.source")
          && col("a.doc_id") < col("b.doc_id")
          && least(col("a.n"), col("b.n")).cast("double")
             / greatest(col("a.n"), col("b.n")) >= t
          && (lit(1) + least(col("a.n") - col("a.rk"), col("b.n") - col("b.rk")))
             >= (col("a.n") + col("b.n")) * tf - eps)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // exact rescore: candidate-bounded doc_id-keyed joins, then the
    // full Jaccard only on candidates (threshold on the UNROUNDED
    // value, matching the oracle's WHERE)
    val sets = docs.select(col("doc_id"), col("toks"))
    cand
      .join(sets.as("sa"), cand("doc_a") === col("sa.doc_id"))
      .join(sets.as("sb"), cand("doc_b") === col("sb.doc_id"))
      .filter(jaccard(col("sa.toks"), col("sb.toks")) >= t)
      .select(col("doc_a"), col("doc_b"),
        jaccard(col("sa.toks"), col("sb.toks")).as("j"))
  }

  /** Token-set (1-gram) Jaccard near-dup within (lang, source)
    * blocks — the SQL-expressible variant, oracle-checked. */
  private def dedupNgram(s: SparkSession, d: String): DataFrame =
    ngramPairs(s, d)
      .select(col("doc_a"), col("doc_b"), graft.Det.r4(col("j")).as("jaccard"))
      .orderBy("doc_a", "doc_b")

  /** Duplicate CLUSTERS from the near-dup pair graph: connected
    * components via iterative min-label propagation — each doc in any
    * pair gets the smallest doc_id reachable through near-dup edges
    * as its cluster id (so the cluster id IS the canonical
    * representative). This is the step that turns pairwise dedup into
    * an actionable keep/drop decision.
    *
    * Shape: the classic fixpoint of distributed joins (GraphX-pregel
    * style) — per round, every node takes the min label over itself
    * and its neighbors; converges in graph-diameter rounds. The loop
    * is CONVERGENCE-CHECKED, not fixed-count: labels only ever
    * decrease under min-propagation, so Σlbl is strictly decreasing
    * until the fixpoint and one scalar sum per round detects it —
    * near-dup graphs are shallow (2-3 rounds in practice), so the
    * check typically saves more than half the rounds, while a
    * pathological long chain at 100 TB still converges instead of
    * silently under-merging at a hardcoded cutoff (the failure mode a
    * fixed count risks). Per-round driver traffic is ONE aggregated
    * long. Each round is one keyed join + partial-agg min; at 100 TB
    * the same loop runs with the edge list partitioned by src (the
    * large-star/small-star optimization drops rounds to ~log n if
    * diameter ever grows).
    *
    * Two plan-shape rules make the loop viable (70s -> ~1s at sf0.1):
    * the edge list carries SELF-LOOPS so a round is ONE join + min
    * referencing the previous labels exactly once (a second reference
    * — e.g. `labels.unionAll(fromNeighbors)` — doubles the lineage
    * every round: 2^rounds copies of the base plan), and the edge
    * list is persisted so the prefix-filter pair generation runs
    * once, not once per round. */
  private val ClusterMaxRounds = 50

  /** The propagation loop, shared by [[dedupCluster]] (scored output)
    * and TrainPrep's q_pipeline_train (duplicate pruning): (node, lbl)
    * per doc appearing in any near-dup pair. */
  private[ops] def clusterLabels(s: SparkSession, d: String): DataFrame =
    connectedComponents(
      ngramPairs(s, d).select(col("doc_a"), col("doc_b")))

  /** Min-label connected components over an undirected pair graph
    * (columns doc_a, doc_b) — the generic loop behind
    * [[clusterLabels]], factored to take ANY candidate generator's
    * pair list (and to be testable on synthetic graphs: see
    * DedupGroundTruthSpec's deep-chain convergence case, which a
    * fixed-round loop fails). Returns (node, lbl). */
  private[ops] def connectedComponents(pairList: DataFrame): DataFrame = {
    // persisted: nodes + the three edge branches reference the pair
    // query FIVE times — without the cache the whole prefix-filter
    // pipeline re-executes per reference. The count both forces the
    // cache (so the candidate pipeline runs exactly once) and sizes
    // the loop's shuffles below.
    val pairs = pairList.persist()
    val nPairs = pairs.count()
    // partition count proportional to the EDGE data (~3 rows per
    // pair), not the session default: a near-dup pair graph is orders
    // of magnitude smaller than the corpus it came from, and an
    // iterative loop pays the per-task scheduling overhead once per
    // round — 32 near-empty tasks per stage was measured as the
    // dominant loop cost at small scale, while at 100 TB the same
    // formula grows the partition count with the graph
    val loopParts = math.max(4, (3 * nPairs / 2000000L).toInt)
    val nodes = pairs.select(col("doc_a").as("node"))
      .unionAll(pairs.select(col("doc_b").as("node"))).distinct()
    // undirected (both directions) + self-loops; cached across rounds
    // ALREADY HASH-PARTITIONED on the join key: the cached blocks
    // satisfy every round's required distribution, so only the (small)
    // label side shuffles per round — the edge exchange happens once
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionAll(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .unionAll(nodes.select(col("node").as("src"), col("node").as("dst")))
      .repartition(loopParts, col("dst"))
      .persist()
    // labels are localCheckpoint'd per round, not merely persisted:
    // round r's logical plan would otherwise nest all r-1 previous
    // rounds, and re-analyzing that growing tree dominates the round
    // cost long before the data does (measured: rounds crept 0.7s →
    // 1.9s by round 5 at sf0.1). The checkpoint truncates lineage to
    // a leaf, keeping per-round planning O(1); edges stay persist()ed
    // — the cache preserves their dst hash-partitioning, so only the
    // (small) label side shuffles per round.
    // Initial labels come from the cached edge SELF-LOOPS (src = dst
    // ⟺ one row per node): re-deriving nodes.distinct here would run
    // its shuffle a second time, while the self-loop filter is a
    // narrow read of blocks already partitioned on the join key.
    var labels = edges.filter(col("src") === col("dst"))
      .select(col("dst").as("node"), col("dst").as("lbl"))
      .localCheckpoint()
    // Σlbl: equal across a round ⟺ no label changed (labels are
    // monotone non-increasing under min-propagation) ⟺ fixpoint.
    // DECIMAL(38) accumulator: a long sum of n ids overflows under
    // ANSI mode long before 100 TB node counts.
    def lblSum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("lbl").cast("decimal(38,0)")),
        lit(java.math.BigDecimal.ZERO))).head().getDecimal(0)
    var prev = lblSum(labels)
    var converged = false
    var round = 0
    // min-label rounds are compile-bound at bench scale (the pair
    // graph is tiny per round; each round's stages Janino-compile
    // fresh classes) — run the loop interpreted, like the graph-tier
    // loops (GraftSession.interpreted scaladoc has the measurements)
    graft.GraftSession.interpreted(pairList.sparkSession) {
    while (!converged && round < ClusterMaxRounds) {
      // LAZY checkpoint: the Σlbl action below is what materializes
      // it, so a round costs ONE Spark job, not a checkpoint job plus
      // a sum job (measured ~2× on the whole loop — the graph is tiny
      // per-round, scheduling is the cost)
      val next = edges.join(labels, edges("dst") === labels("node"))
        .groupBy(edges("src")).agg(min(col("lbl")).as("lbl"))
        .select(col("src").as("node"), col("lbl"))
        .localCheckpoint(eager = false)
      val cur = lblSum(next)
      // the previous round's checkpointed blocks are dead the moment
      // `next` is materialized — release them instead of letting them
      // accumulate in the block manager for the life of the session
      // (localCheckpoint caches are NOT in the CacheManager, so
      // spark.catalog.clearCache() never reclaims them)
      org.apache.spark.sql.graftbridge.Bridge.releaseLocalCheckpoint(labels)
      labels = next
      converged = cur == prev
      prev = cur
      round += 1
    }
    }
    // labels are checkpointed leaves — the edge cache can be released
    edges.unpersist(blocking = false)
    if (!converged) {
      // under-merged labels would be WRONG results, not slow ones: a
      // component whose diameter exceeds the cap would silently split
      // into several clusters. Min-label propagation needs diameter
      // rounds; a graph that deep is exactly what the star-contraction
      // variant (O(log n) rounds) exists for — switch to it rather
      // than failing or raising the cap.
      System.err.println(
        s"connectedComponents: no fixpoint within $ClusterMaxRounds min-label rounds " +
          "(graph diameter exceeds the cap) — switching to star contraction")
      val starLabels = connectedComponentsStar(pairs)
      pairs.unpersist(blocking = false)
      return starLabels
    }
    pairs.unpersist(blocking = false)
    labels
  }

  /** Star-contraction connected components (alternating large-star /
    * small-star, Kiveris et al., "Connected Components in MapReduce
    * and Beyond", SoCC'14): converges in O(log n) ROUNDS ON ANY
    * GRAPH, versus diameter rounds for min-label propagation — the
    * scale path for deep graphs (long duplication chains), and the
    * automatic fallback when [[connectedComponents]] hits its round
    * cap. Same contract: (doc_a, doc_b) pairs in, (node, lbl) out
    * with lbl = the component's smallest node id.
    *
    * Each round is two keyed join+agg passes over the current edge
    * set; edges strictly shrink toward star form (u → component
    * root), so the fixpoint test — count plus an order-independent
    * hash-sum, confirmed exact by an anti-join only when it first
    * trips — costs one scalar aggregate per round.
    */
  private[ops] def connectedComponentsStar(pairList: DataFrame): DataFrame = {
    // canonical directed form: (u, v) with u > v
    var edges = pairList
      .filter(col("doc_a") =!= col("doc_b"))
      .select(greatest(col("doc_a"), col("doc_b")).as("u"),
        least(col("doc_a"), col("doc_b")).as("v"))
      .distinct()
      .localCheckpoint()
    // isolated self-pairs (a node paired only with itself) still need
    // a label row — collect them as roots up front
    val selfRoots = pairList.filter(col("doc_a") === col("doc_b"))
      .select(col("doc_a").as("node")).distinct()

    // large-star: every neighbor v > u links to m(u) = min(Γ(u) ∪ u).
    // Output stays canonical: v > u >= m(u).
    def largeStar(e: DataFrame): DataFrame = {
      val nbrs = e.select(col("u"), col("v"))
        .unionAll(e.select(col("v").as("u"), col("u").as("v")))
      val m = nbrs.groupBy("u").agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      nbrs.join(m, "u")
        .filter(col("v") > col("u") && col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
    }
    // small-star: u and all its smaller neighbors link to
    // m(u) = min of those neighbors (all < u in canonical form).
    def smallStar(e: DataFrame): DataFrame = {
      val m = e.groupBy("u").agg(min(col("v")).as("m"))
      val vm = e.join(m, "u")
        .select(col("v").as("u"), col("m").as("v"))
      val um = m.select(col("u"), col("m").as("v"))
      vm.unionAll(um)
        .filter(col("u") =!= col("v"))
        .distinct()
    }
    // (count, order-independent hash XOR) — cheap per-round fixpoint
    // probe (XOR, not SUM: edges are distinct so nothing cancels, and
    // it cannot overflow under ANSI mode); an exact EXCEPT confirms
    // the first time it trips
    def sig(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)), bit_xor(xxhash64(col("u"), col("v")))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var prev = sig(edges)
    var converged = false
    var rounds = 0
    while (!converged && rounds < ClusterMaxRounds) {
      val next = smallStar(largeStar(edges)).localCheckpoint(eager = false)
      val cur = sig(next)
      if (cur == prev && next.exceptAll(edges).isEmpty)
        converged = true
      org.apache.spark.sql.graftbridge.Bridge.releaseLocalCheckpoint(edges)
      edges = next
      prev = cur
      rounds += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"star contraction did not converge within $ClusterMaxRounds rounds — " +
          "O(log n) bound violated; edge state is inconsistent")
    // fixpoint edges are stars (node -> root); roots label themselves.
    // Materialized (checkpointed) so the edge state and the caller's
    // pair cache can be released without the result re-deriving them.
    val out = edges.select(col("u").as("node"), col("v").as("lbl"))
      .unionAll(edges.select(col("v").as("node"), col("v").as("lbl")).distinct())
      .unionAll(selfRoots.select(col("node"), col("node").as("lbl")))
      .distinct()
      .localCheckpoint()
    org.apache.spark.sql.graftbridge.Bridge.releaseLocalCheckpoint(edges)
    out
  }

  private def dedupCluster(s: SparkSession, d: String): DataFrame =
    clusterLabels(s, d)
      .select(col("node").as("doc_id"), col("lbl").as("cluster_id"),
        (col("node") === col("lbl")).as("is_representative"))
      .orderBy("doc_id")

  /** Embedding-cosine near-dup pairs. Candidates come from the UNION
    * of two generators — the data-given label block AND T independent
    * hyperplane-LSH tables (OR-amplification: a pair is a candidate
    * if ANY table collides, so per-table recall deficits multiply
    * away) — then are rescored with the exact fused cosine kernel.
    * Label blocking alone found 5/59 of the sf0.01 ground-truth
    * pairs (measured in DedupGroundTruthSpec); the LSH tables lift
    * recall without an all-pairs join. At 100 TB the same shape
    * holds: bucket keys are the shuffle key, bits per table tune
    * bucket width. */
  private def dedupEmbed(s: SparkSession, d: String): DataFrame = {
    val tables = 8; val bits = 4; val dims = 64
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("label"), col("embedding"))
    // bucket columns materialized BEFORE the explode, with an
    // exchange between them and the block join — the same
    // CollapseProject guard as dedupNear's signature (the T×bits
    // hyperplane dot products must be computed once per row, not once
    // per consumer)
    val bucketCols = (0 until tables).map(t =>
      hyperplaneBucket(col("embedding"), bits, dims, t * bits).cast("string").as(s"b$t"))
    val withBuckets = e
      .select(Seq(col("vec_id"), col("label"), col("embedding")) ++ bucketCols: _*)
      .repartition(s.sparkContext.defaultParallelism)
    val blockKeys = array(
      concat_ws(":", lit("lbl"), col("label")) +:
        (0 until tables).map(t => concat_ws(":", lit(s"t$t"), col(s"b$t"))): _*)
    val keyed = withBuckets
      .select(col("vec_id"), col("embedding"), explode(blockKeys).as("block"))
    keyed.as("a")
      .join(keyed.as("b"),
        col("a.block") === col("b.block") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        // native fused-loop expression (bit-identical to TextSim.cosine,
        // single pass instead of three HOF folds)
        graft.functions.CosineSimilarity.cosine_sim(
          col("a.embedding"), col("b.embedding")).as("c"))
      // threshold BEFORE the pair-dedup so the distinct shuffles only
      // true matches (same rule as dedupSimhash)
      .filter(col("c") >= 0.4)
      .select(col("vec_a"), col("vec_b"), graft.Det.r4(col("c")).as("cos"))
      .dropDuplicates("vec_a", "vec_b")
      .orderBy("vec_a", "vec_b")
  }

  /** Edit-distance near-dup: the exact prefix-filter Jaccard pairs
    * ([[ngramPairs]], J >= 0.5) are the candidates; Levenshtein over a
    * 48-char prefix rescores ONLY those. The O(L²) DP never runs on a
    * pair the Jaccard stage rejected — the two-stage cheap-filter→
    * expensive-rescore shape, now on top of a candidate generator
    * whose cost tracks the true-pair count instead of block
    * demographics (see ngramPairs). The pfx join is doc_id-keyed and
    * candidate-bounded. */
  private def dedupEdit(s: SparkSession, d: String): DataFrame = {
    val pfx = Tables.documents(s, d)
      .select(col("doc_id"), substring(col("text"), 1, 48).as("pfx"))
    val pairs = ngramPairs(s, d).select(col("doc_a"), col("doc_b"))
    pairs
      .join(pfx.as("pa"), pairs("doc_a") === col("pa.doc_id"))
      .join(pfx.as("pb"), pairs("doc_b") === col("pb.doc_id"))
      .filter(levenshtein(col("pa.pfx"), col("pb.pfx")) <= 30)
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("pa.pfx"), col("pb.pfx")).cast("long").as("dist"))
      .orderBy("doc_a", "doc_b")
  }

  /** Span-level (C4-style) dedup: documents are cut into consecutive
    * 8-token spans, and every span that appeared earlier ANYWHERE in
    * the corpus (first occurrence = smallest (doc_id, pos)) is
    * removed; surviving spans reassemble into the cleaned text. This
    * is the intra-document-granularity dedup the doc-level tier
    * can't express — boilerplate repeated across documents vanishes
    * while the unique remainder survives.
    *
    * Scale shape: one keyed shuffle on the span value (the keep-first
    * window — at 100 TB the key would be xxhash64(span) with the
    * text carried, same plan), one keyed shuffle on doc_id to
    * reassemble, and the per-doc span count rides the same doc_id
    * distribution so the final join adds no exchange. Never a pairwise
    * comparison anywhere — global span dedup is linear. */
  private def dedupSpan(s: SparkSession, d: String): DataFrame = {
    val W = 8
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val nSpans = ceil(size(col("toks")).cast("double") / W).cast("int")
    val spans = docs.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), nSpans - 1),
        i => array_join(slice(col("toks"), i * W + 1, lit(W)), " ")))
        .as(Seq("pos", "span")))
    val w = Window.partitionBy("span").orderBy("doc_id", "pos")
    val kept = spans
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("span")))),
            x => x.getField("span")), " ").as("text_clean"))
    spans.groupBy("doc_id").agg(count(lit(1)).as("n_spans"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_spans"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
      .orderBy("doc_id")
  }

  /** SemDeDup-style semantic dedup: the blocking key is a LEARNED
    * partition of embedding space — k-means clusters (Lloyd via
    * Similarity.lloydCentroids, deterministic init, decimal-exact
    * means) — and exact fused-kernel cosine rescoring runs only
    * within clusters. Complements [[dedupEmbed]]: hyperplane LSH
    * blocks by random projections (data-independent, recall from
    * OR-amplification), this blocks by the data's own density
    * structure — near-dups sit in the same cluster unless they
    * straddle a Voronoi boundary, which the differential ground
    * truth (DedupGroundTruthSpec) quantifies.
    *
    * Scale: assignment is a narrow pass against broadcast centroid
    * literals; the pair join shuffles on the cluster id. At 100 TB
    * one level of k-means (k ~ √n) keeps clusters bounded, exactly
    * the SemDeDup recipe. */
  /** (vec_id, embedding, cluster) with each vector assigned to its
    * TOP-2 nearest clusters (multi-probe): single-assignment blocking
    * measured 28/59 ground-truth recall at sf0.01 — near-dup pairs
    * straddling a Voronoi boundary never meet. The deterministic
    * (distance, index) sort breaks ties by centroid index. Shared
    * with DedupGroundTruthSpec so the miss analysis uses the exact
    * blocking the query ran. */
  private[ops] def semanticBlocks(vecs: DataFrame, centroids: Seq[Seq[Double]]): DataFrame = {
    val ranked = array_sort(zip_with(
      Similarity.distArray(centroids),
      sequence(lit(0), lit(math.max(centroids.size - 1, 0))),
      (dd, i) => struct(dd.as("d"), i.as("i"))))
    vecs.withColumn("ranked", ranked)
      .select(col("vec_id"), col("embedding"),
        explode(slice(col("ranked"), 1, 2)).as("blk"))
      .select(col("vec_id"), col("embedding"), col("blk.i").as("cluster"))
  }

  /** k ≈ √n with a floor of 8 — the SemDeDup recipe's cluster-count
    * rule: expected cluster size √n keeps the within-cluster pair
    * stage at O(n·√n) total instead of O(n²/k) with a fixed k. The
    * count comes from the table's own row count (one cheap count
    * job), so the blocking self-tunes as the corpus grows. */
  private[ops] def semanticK(vecs: DataFrame): Int =
    math.max(8, math.sqrt(vecs.count().toDouble).toInt)

  private def dedupSemantic(s: SparkSession, d: String): DataFrame = {
    val vecs = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val centroids = Similarity.lloydCentroids(vecs, semanticK(vecs), 3)
    val blocks = semanticBlocks(vecs, centroids)
    // the pair join shuffles on the cluster key: with k ≈ √n the key
    // cardinality grows with the data, so the join's parallelism is
    // data-proportional (the fixed-k version could collapse to ≤k
    // tasks under a shuffle join; broadcasting the n-row table
    // instead would be its own scale-killer). shuffle_hash avoids a
    // sort of both sides on so hot a key.
    blocks.as("a").hint("shuffle_hash")
      .join(blocks.as("b"),
        col("a.cluster") === col("b.cluster") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        graft.functions.CosineSimilarity.cosine_sim(
          col("a.embedding"), col("b.embedding")).as("c"))
      // threshold BEFORE the pair-dedup so the distinct shuffles only
      // true matches (same rule as dedupSimhash/dedupEmbed)
      .filter(col("c") >= 0.4)
      .select(col("vec_a"), col("vec_b"), graft.Det.r4(col("c")).as("cos"))
      .dropDuplicates("vec_a", "vec_b")
      .orderBy("vec_a", "vec_b")
  }

  /** Repeated-substring window length (tokens); also the island-merge
    * gap bound. Mirrored verbatim in the oracle. */
  private[ops] val SubstrL = 10

  /** Corpus-level repeated-substring dedup (the exact-substring
    * technique of Lee et al., "Deduplicating Training Data Makes
    * Language Models Better", ACL 2022 — there with suffix arrays):
    * every length-L token window that occurs MORE THAN ONCE anywhere
    * in the corpus marks its position as duplicated; per document,
    * overlapping-or-adjacent duplicated windows (start-gap ≤ L) merge
    * into maximal spans. Output: per affected document, the span
    * count and total duplicated-token footprint — the rows a trainer
    * would cut before tokenization.
    *
    * Scale shape: window extraction is NARROW (explode over the
    * token array + slice — no window function, no per-doc shuffle);
    * the single corpus-global shuffle is the gram groupBy, whose
    * partial map-side count collapses each partition's repeats before
    * the exchange. The semi join back rides the same gram key. At
    * 100 TB the gram string would be replaced by a 128-bit hash
    * (shuffle bytes ∝ corpus size × L otherwise) with a verify pass
    * on colliding buckets; the string key here keeps the DuckDB
    * hash-compare exact. Island merging is one per-doc window over
    * ONLY the duplicated positions (~9% of the corpus here), not the
    * full token stream. */
  private def dedupSubstring(s: SparkSession, d: String): DataFrame = {
    val grams = Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("l"))
      .filter(size(col("l")) >= SubstrL)
      .select(col("doc_id"),
        explode(sequence(lit(1), size(col("l")) - (SubstrL - 1))).as("pos"),
        col("l"))
      .select(col("doc_id"), col("pos"),
        concat_ws(" ", slice(col("l"), col("pos"), lit(SubstrL))).as("gram"))
    val dup = grams.groupBy("gram").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).select("gram")
    val dupPos = grams.join(dup, Seq("gram"), "left_semi")
      .select(col("doc_id"), col("pos"))
    val wOrd = Window.partitionBy("doc_id").orderBy("pos")
    dupPos
      .withColumn("prev", lag(col("pos"), 1).over(wOrd))
      .withColumn("new_isl",
        when(col("prev").isNull || col("pos") - col("prev") > SubstrL, 1)
          .otherwise(0))
      .withColumn("isl", sum(col("new_isl"))
        .over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("isl"))
      .agg(min(col("pos")).as("a"), (max(col("pos")) + (SubstrL - 1)).as("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"), sum(col("b") - col("a") + 1).as("dup_tokens"))
      .orderBy("doc_id")
  }

  override val queries: Map[String, Q] = Map(
    "q_dedup_substring" -> dedupSubstring,
    "q_dedup_semantic" -> dedupSemantic,
    "q_dedup_span"    -> dedupSpan,
    "q_dedup_edit"    -> dedupEdit,
    "q_dedup_exact"   -> dedupExact,
    "q_dedup_near"    -> dedupNear,
    "q_dedup_simhash" -> dedupSimhash,
    "q_dedup_ngram"   -> dedupNgram,
    "q_dedup_cluster" -> dedupCluster,
    "q_dedup_embed"   -> dedupEmbed,
  )

  /** Full MinHash-LSH pipeline restated in SQL (r7): shingles (3-gram
    * windows, whole-input under 3 tokens, distinct), the spec-stated
    * shingle hash (SimHash64.tokenHash's double Horner via a
    * recursive power CTE), 32 universal mixes (A_i, B_i) =
    * (131^(i+1), 137^(i+1)) mod 2³¹−1 from a recursive mixer CTE,
    * per-band Horner bucket folds, the band-collision candidate
    * join, and the exact Jaccard ≥ 0.8 rescore — the same arithmetic
    * as the Spark pipeline end to end, so q_dedup_near hash-matches
    * instead of relying on the (kept) brute-force differential. */
  private def nearOracle: String = {
    def bexpr(o: Int): String =
      s"((((((sig[${o + 1}] * 131 + sig[${o + 2}]) % 2147483647) * 131 + sig[${o + 3}]) % 2147483647) * 131 + sig[${o + 4}]) % 2147483647)"
    val cases = (0 until 8).map { b =>
      if (b < 7) s"WHEN $b THEN ${bexpr(4 * b)}" else s"ELSE ${bexpr(4 * b)}"
    }.mkString(" ")
    s"""WITH RECURSIVE toks AS (SELECT doc_id, string_split(text,' ') AS l FROM documents),
       |sh AS (
       |  SELECT DISTINCT doc_id,
       |         array_to_string(l[i : LEAST(i + 2, LEN(l))], ' ') AS shingle
       |  FROM toks, UNNEST(generate_series(1, GREATEST(LEN(l) - 2, 1))) AS u(i)),
       |hs AS (SELECT DISTINCT shingle FROM sh),
       |pw(e, v1, v2) AS (
       |  SELECT 0, CAST(1 AS BIGINT), CAST(1 AS BIGINT)
       |  UNION ALL
       |  SELECT e + 1, (v1 * 131) % 2147483647, (v2 * 137) % 2147483629
       |  FROM pw WHERE e < (SELECT MAX(length(shingle)) FROM hs)),
       |ch AS (SELECT shingle, length(shingle) AS n, unnest(range(1, length(shingle)+1)) AS i FROM hs),
       |hh AS (
       |  SELECT shingle,
       |         CAST(((SUM(ord(substr(shingle, CAST(i AS INT), 1)) * p.v1) % 2147483647) << 31)
       |              | (SUM(ord(substr(shingle, CAST(i AS INT), 1)) * p.v2) % 2147483629) AS BIGINT) AS h
       |  FROM ch JOIN pw p ON p.e = ch.n - ch.i
       |  GROUP BY shingle),
       |mx(i, a, b) AS (
       |  SELECT 0, CAST(131 AS BIGINT), CAST(137 AS BIGINT)
       |  UNION ALL
       |  SELECT i + 1, (a * 131) % 2147483647, (b * 137) % 2147483647
       |  FROM mx WHERE i < 31),
       |sg AS (
       |  SELECT sh.doc_id, mx.i,
       |         MIN((mx.a * (COALESCE(hh.h, 0) % 2147483647) + mx.b) % 2147483647) AS v
       |  FROM sh LEFT JOIN hh USING (shingle), mx
       |  GROUP BY sh.doc_id, mx.i),
       |sigl AS (SELECT doc_id, list(v ORDER BY i) AS sig FROM sg GROUP BY doc_id),
       |bk AS (
       |  SELECT doc_id, r.b AS band, CASE r.b $cases END AS bucket
       |  FROM sigl, range(0, 8) r(b)),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM bk x JOIN bk y ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id),
       |shl AS (SELECT doc_id, list(shingle) AS s FROM sh GROUP BY doc_id)
       |SELECT doc_a, doc_b, ${graft.Det.r4Sql("j")} AS jaccard
       |FROM (
       |  SELECT doc_a, doc_b,
       |         CAST(LEN(list_intersect(a.s, b.s)) AS DOUBLE)
       |           / LEN(list_distinct(list_concat(a.s, b.s))) AS j
       |  FROM cand JOIN shl a ON a.doc_id = doc_a JOIN shl b ON b.doc_id = doc_b)
       |WHERE j >= 0.8
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** Hyperplane-LSH embedding-dedup oracle (r7). The plane
    * coefficients were always spec-stated integer arithmetic; the one
    * dialect trap is that plane index g reaches 31, so
    * g·1609587929392839161 WRAPS a 64-bit long — Scala wraps
    * silently, DuckDB errors on BIGINT overflow, so the oracle
    * computes the product in HUGEINT, reduces mod 2⁶⁴ back to the
    * signed value, and applies the same truncating %/ABS. Candidates
    * = same (table, 4-bit bucket) for any of the 8 tables OR same
    * label (the blockKeys union), rescored with the sequential-fold
    * cosine ≥ 0.4 (list_sum order = the native kernel's). */
  private def embedOracle: String = {
    val wm = "((CAST(g AS HUGEINT) * 1609587929392839161 + (j - 1) * 2654435761) % 18446744073709551616 + 18446744073709551616) % 18446744073709551616"
    val coef =
      s"""(ABS(CASE WHEN $wm >= 9223372036854775808
         |     THEN CAST($wm - 18446744073709551616 AS BIGINT)
         |     ELSE CAST($wm AS BIGINT) END % 1000003) / 1000003.0 * 2.0 - 1.0)""".stripMargin
    val cos =
      """list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |        t -> CAST(t[1] AS DOUBLE) * CAST(t[2] AS DOUBLE)))
        |      / (SQRT(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |         * SQRT(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))""".stripMargin
    s"""WITH e AS (SELECT vec_id, label, embedding FROM embeddings),
       |d AS (
       |  SELECT vec_id, g,
       |         list_sum(list_transform(range(1, 65),
       |           j -> CAST(embedding[j] AS DOUBLE) * $coef)) AS d
       |  FROM e, range(0, 32) t(g)),
       |bk AS (
       |  SELECT vec_id, CAST(g // 4 AS INT) AS tbl,
       |         SUM(CASE WHEN d >= 0 THEN 1 << CAST(g % 4 AS INT) ELSE 0 END) AS bucket
       |  FROM d GROUP BY vec_id, g // 4),
       |cand AS (
       |  SELECT x.vec_id AS vec_a, y.vec_id AS vec_b
       |  FROM bk x JOIN bk y ON x.tbl = y.tbl AND x.bucket = y.bucket AND x.vec_id < y.vec_id
       |  UNION
       |  SELECT x.vec_id, y.vec_id
       |  FROM e x JOIN e y ON x.label = y.label AND x.vec_id < y.vec_id)
       |SELECT vec_a, vec_b, ${graft.Det.r4Sql("c")} AS cos
       |FROM (
       |  SELECT DISTINCT vec_a, vec_b, $cos AS c
       |  FROM cand JOIN e a ON a.vec_id = vec_a JOIN e b ON b.vec_id = vec_b)
       |WHERE c >= 0.4
       |ORDER BY vec_a, vec_b""".stripMargin
  }

  /** SemDeDup oracle (r7): the 3-round Lloyd quantizer unrolls with
    * the shared [[LloydSql]] CTEs (the q_kmeans technique), k is the
    * data's own √n rule computed in SQL (GREATEST(8, ⌊√n⌋) with a
    * scalar-subquery LIMIT), blocking takes each vector's TOP-2
    * clusters (rn ≤ 2 of the same (d2, cluster) order array_sort
    * uses), and candidate pairs rescore with the sequential-fold
    * cosine ≥ 0.4. */
  private def semanticOracle: String = {
    val R = 3 // matches dedupSemantic's lloydCentroids(vecs, k, 3)
    val cos =
      """list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |        t -> CAST(t[1] AS DOUBLE) * CAST(t[2] AS DOUBLE)))
        |      / (SQRT(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |         * SQRT(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))""".stripMargin
    val head =
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
         |kk AS (SELECT GREATEST(8, CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT)) AS k FROM e),
         |init AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS mv
         |         FROM e ORDER BY vec_id LIMIT (SELECT k FROM kk)),
         |c0 AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cluster, mv FROM init)""".stripMargin
    val rounds = (1 to R).flatMap { r =>
      Seq(LloydSql.assign(s"c${r - 1}", s"a$r"), LloydSql.update(s"a$r", s"c${r - 1}", s"c$r"))
    }
    (Seq(head) ++ rounds ++ Seq(LloydSql.assign(s"c$R", "blkraw"))).mkString(",\n") +
      s""",
         |blk AS (SELECT vec_id, embedding, cluster FROM blkraw WHERE rn <= 2)
         |SELECT vec_a, vec_b, ${graft.Det.r4Sql("c")} AS cos
         |FROM (
         |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b, $cos AS c
         |  FROM blk a JOIN blk b ON a.cluster = b.cluster AND a.vec_id < b.vec_id)
         |WHERE c >= 0.4
         |ORDER BY vec_a, vec_b""".stripMargin
  }

  override val oracles: Map[String, String] = Map(
    "q_dedup_near" -> nearOracle,
    "q_dedup_embed" -> embedOracle,
    "q_dedup_semantic" -> semanticOracle,
    // Full SimHash pipeline restated in SQL (r7): the spec-stated
    // token hash (SimHash64.tokenHash) is two Horner folds mod the
    // two largest 31-bit primes — set-expressible as Σ cp·mᵉ mod p with a
    // recursive power CTE, since the fold is linear. Sign counters
    // and bit packing are plain conditional sums; the pair predicate
    // mirrors the Spark query EXACTLY (shared 16-bit chunk AND
    // hamming ≤ 6 — a hamming-4..6 pair sharing no chunk is excluded
    // on both sides). Signature equality spot-checked against a
    // python reimplementation of the spec; end-to-end hash-match in
    // the verify gate.
    "q_dedup_simhash" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
        |         generate_subscripts(string_split(text, ' '), 1) AS tpos
        |  FROM documents),
        |pw(e, v1, v2) AS (
        |  SELECT 0, CAST(1 AS BIGINT), CAST(1 AS BIGINT)
        |  UNION ALL
        |  SELECT e + 1, (v1 * 131) % 2147483647, (v2 * 137) % 2147483629
        |  FROM pw WHERE e < (SELECT MAX(length(tok)) FROM toks)),
        |ch AS (
        |  SELECT doc_id, tpos, length(tok) AS n, tok,
        |         unnest(range(1, length(tok) + 1)) AS i
        |  FROM toks),
        |th AS (
        |  SELECT doc_id, tpos,
        |         CAST(((SUM(ord(substr(tok, CAST(i AS INT), 1)) * p.v1) % 2147483647) << 31)
        |              | (SUM(ord(substr(tok, CAST(i AS INT), 1)) * p.v2) % 2147483629) AS BIGINT) AS h
        |  FROM ch JOIN pw p ON p.e = ch.n - ch.i
        |  GROUP BY doc_id, tpos),
        |allth AS (
        |  SELECT t.doc_id, t.tpos, COALESCE(th.h, 0) AS h
        |  FROM toks t LEFT JOIN th ON th.doc_id = t.doc_id AND th.tpos = t.tpos),
        |bits AS (
        |  SELECT doc_id, i, SUM(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS c
        |  FROM allth, range(0, 64) r(i)
        |  GROUP BY doc_id, i),
        |sig AS (
        |  SELECT doc_id,
        |         CAST(SUM(CASE WHEN c > 0 THEN (CAST(1 AS BIGINT) << CAST(i AS INT))
        |                  ELSE 0 END) AS BIGINT) AS sim
        |  FROM bits GROUP BY doc_id)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       bit_count(xor(a.sim, b.sim)) AS hamming
        |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        |WHERE ((a.sim >> 0) & 65535 = (b.sim >> 0) & 65535
        |    OR (a.sim >> 16) & 65535 = (b.sim >> 16) & 65535
        |    OR (a.sim >> 32) & 65535 = (b.sim >> 32) & 65535
        |    OR (a.sim >> 48) & 65535 = (b.sim >> 48) & 65535)
        |  AND bit_count(xor(a.sim, b.sim)) <= 6
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q_dedup_substring" -> {
      val L = SubstrL
      s"""WITH lists AS (
         |  SELECT doc_id, string_split(text, ' ') AS l FROM documents
         |  WHERE LEN(string_split(text, ' ')) >= $L),
         |positions AS (
         |  SELECT doc_id, UNNEST(generate_series(1, LEN(l) - ${L - 1})) AS pos, l
         |  FROM lists),
         |grams AS (
         |  SELECT doc_id, pos, array_to_string(l[pos:pos+${L - 1}], ' ') AS gram
         |  FROM positions),
         |dup AS (SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) > 1),
         |dp AS (SELECT doc_id, pos FROM grams JOIN dup USING (gram)),
         |isl AS (
         |  SELECT doc_id, pos,
         |         SUM(CASE WHEN prev IS NULL OR pos - prev > $L THEN 1 ELSE 0 END)
         |           OVER (PARTITION BY doc_id ORDER BY pos) AS isl
         |  FROM (SELECT doc_id, pos,
         |               LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
         |        FROM dp)),
         |spans AS (
         |  SELECT doc_id, isl, MIN(pos) AS a, MAX(pos) + ${L - 1} AS b
         |  FROM isl GROUP BY doc_id, isl)
         |SELECT doc_id, COUNT(*) AS n_spans,
         |       CAST(SUM(b - a + 1) AS BIGINT) AS dup_tokens
         |FROM spans GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },
    "q_dedup_span" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |spans AS (
        |  SELECT doc_id, u.i AS pos,
        |         array_to_string(toks[u.i*8+1 : u.i*8+8], ' ') AS span
        |  FROM t, UNNEST(generate_series(0, CAST(CEIL(LEN(toks)/8.0) AS INT) - 1)) AS u(i)),
        |kept AS (
        |  SELECT doc_id, pos, span,
        |         ROW_NUMBER() OVER (PARTITION BY span ORDER BY doc_id, pos) AS rn
        |  FROM spans),
        |agg AS (
        |  SELECT doc_id, COUNT(*) AS n_kept,
        |         string_agg(span, ' ' ORDER BY pos) AS text_clean
        |  FROM kept WHERE rn = 1 GROUP BY doc_id),
        |ns AS (SELECT doc_id, COUNT(*) AS n_spans FROM spans GROUP BY doc_id)
        |SELECT ns.doc_id, ns.n_spans,
        |       COALESCE(agg.n_kept, 0) AS n_kept,
        |       COALESCE(agg.text_clean, '') AS text_clean
        |FROM ns LEFT JOIN agg ON ns.doc_id = agg.doc_id
        |ORDER BY ns.doc_id""".stripMargin,
    "q_dedup_edit" ->
      """WITH p AS (SELECT doc_id, lang, source, LEFT(text, 48) AS pfx,
        |                  list_distinct(string_split(text, ' ')) AS toks
        |           FROM documents)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       levenshtein(a.pfx, b.pfx) AS dist
        |FROM p a
        |JOIN p b ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
        |WHERE CAST(LEN(list_intersect(a.toks, b.toks)) AS DOUBLE)
        |      / LEN(list_distinct(list_concat(a.toks, b.toks))) >= 0.5
        |  AND levenshtein(a.pfx, b.pfx) <= 30
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q_dedup_exact" ->
      """SELECT doc_id, lang, source, n_chars
        |FROM (
        |  SELECT doc_id, lang, source, n_chars,
        |         ROW_NUMBER() OVER (
        |           PARTITION BY LOWER(array_to_string(string_split(text, ' ')[1:5], ' '))
        |           ORDER BY doc_id) AS rn
        |  FROM documents)
        |WHERE rn = 1
        |ORDER BY doc_id""".stripMargin,
    "q_dedup_ngram" ->
      """SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       FLOOR((CAST(LEN(list_intersect(a.toks, b.toks)) AS DOUBLE)
        |             / LEN(list_distinct(list_concat(a.toks, b.toks)))) * 10000 + 0.5) / 10000 AS jaccard
        |FROM (SELECT doc_id, lang, source, list_distinct(string_split(text,' ')) toks FROM documents) a
        |JOIN (SELECT doc_id, lang, source, list_distinct(string_split(text,' ')) toks FROM documents) b
        |  ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
        |WHERE CAST(LEN(list_intersect(a.toks, b.toks)) AS DOUBLE)
        |      / LEN(list_distinct(list_concat(a.toks, b.toks))) >= 0.5
        |ORDER BY doc_a, doc_b""".stripMargin,
    // exact connected components over the same pair graph, via
    // min-label-reachability recursive CTE — the oracle's exactness
    // cross-checks the fixed-round propagation
    "q_dedup_cluster" ->
      """WITH RECURSIVE pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM (SELECT doc_id, lang, source, list_distinct(string_split(text,' ')) toks FROM documents) a
        |  JOIN (SELECT doc_id, lang, source, list_distinct(string_split(text,' ')) toks FROM documents) b
        |    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
        |  WHERE CAST(LEN(list_intersect(a.toks, b.toks)) AS DOUBLE)
        |        / LEN(list_distinct(list_concat(a.toks, b.toks))) >= 0.5),
        |edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION ALL
        |  SELECT doc_b, doc_a FROM pairs),
        |reach(node, lbl) AS (
        |  SELECT DISTINCT src, src FROM edges
        |  UNION
        |  SELECT e.src, r.lbl FROM reach r JOIN edges e ON e.dst = r.node)
        |SELECT node AS doc_id, MIN(lbl) AS cluster_id,
        |       node = MIN(lbl) AS is_representative
        |FROM reach
        |GROUP BY node
        |ORDER BY doc_id""".stripMargin,
  )
}
