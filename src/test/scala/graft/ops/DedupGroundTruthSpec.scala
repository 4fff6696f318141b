package graft.ops

import graft.{SparkEntry, SparkSpec, Tables}
import graft.functions.TextSim._
import org.apache.spark.sql.functions._

/** Exact differential ground truth for the three non-oracle dedup
  * queries (VERDICT r2 task 3): each is compared AS A SET against a
  * brute-force O(n²) cross-join twin at sf0.01 — no blocking, no
  * LSH, just the definition. Where the blocking scheme has a proven
  * guarantee radius, misses outside it are asserted to be exactly
  * the pairs the guarantee never covered (and printed).
  */
class DedupGroundTruthSpec extends SparkSpec {

  private val sf01 = "/root/testdata/sf0.01"

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("q_dedup_near ≡ brute-force shingle-Jaccard >= 0.8 pair set") {
    val got = pairSet(SparkEntry.queries("q_dedup_near")(spark, sf01)
      .select("doc_a", "doc_b"))
    val docs = Tables.documents(spark, sf01)
      .select(col("doc_id"), shingles(tokens(col("text")), 3).as("sh"))
    val brute = pairSet(docs.as("a").crossJoin(docs.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id")
        && jaccard(col("a.sh"), col("b.sh")) >= 0.8)
      .select(col("a.doc_id"), col("b.doc_id")))
    // precision 1.0 is structural (candidates are rescored with the
    // exact Jaccard); recall 1.0 is the empirical claim at this SF —
    // 8 bands x 4 rows collides every J>=0.8 pair here
    val extra = got -- brute
    val missed = brute -- got
    assert(extra.isEmpty, s"false positives (violate the exact rescore): $extra")
    assert(missed.isEmpty,
      s"LSH missed ${missed.size}/${brute.size} true pairs: ${missed.toSeq.sorted}")
    assert(got.nonEmpty)
  }

  test("q_dedup_simhash ≡ brute hamming<=6 set, misses only beyond radius 3") {
    val got = pairSet(SparkEntry.queries("q_dedup_simhash")(spark, sf01)
      .select("doc_a", "doc_b"))
    val sigs = Tables.documents(spark, sf01)
      .select(col("doc_id"),
        graft.functions.SimHash64.simhash64(tokens(col("text"))).as("sim"))
    val bruteDf = sigs.as("a").crossJoin(sigs.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        bit_count(col("a.sim").bitwiseXOR(col("b.sim"))).as("h"))
      .filter(col("h") <= 6)
    val brute = bruteDf.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    val extra = got -- brute.keySet
    val missed = brute.keySet -- got
    assert(extra.isEmpty, s"false positives (violate the exact hamming check): $extra")
    // 4x16-bit chunk blocking guarantees a shared chunk for hamming<=3
    // (pigeonhole); any miss must therefore have hamming in [4,6]
    if (missed.nonEmpty)
      println(s"simhash blocking missed ${missed.size}/${brute.size} pairs " +
        s"(all beyond guarantee radius): ${missed.toSeq.sorted.map(p => p -> brute(p))}")
    missed.foreach { p =>
      assert(brute(p) >= 4, s"pair $p hamming=${brute(p)} <= 3 must never be missed")
    }
    assert(got.nonEmpty)
  }

  test("q_dedup_ngram prefix-filter candidates ≡ naive block join (exact, not probabilistic)") {
    // the AllPairs prefix-filter principle guarantees 100% recall at
    // the threshold — this differential is the proof the candidate
    // rewrite left the oracle-checked pair set byte-identical
    val got = pairSet(SparkEntry.queries("q_dedup_ngram")(spark, sf01)
      .select("doc_a", "doc_b"))
    val docs = Tables.documents(spark, sf01)
      .select(col("doc_id"), col("lang"), col("source"),
        array_distinct(split(col("text"), " ")).as("toks"))
    val brute = pairSet(docs.as("a").join(docs.as("b"),
        col("a.lang") === col("b.lang") && col("a.source") === col("b.source"))
      .filter(col("a.doc_id") < col("b.doc_id")
        && jaccard(col("a.toks"), col("b.toks")) >= 0.5)
      .select(col("a.doc_id"), col("b.doc_id")))
    assert(got === brute,
      s"extra=${(got -- brute).toSeq.sorted} missed=${(brute -- got).toSeq.sorted}")
    assert(got.nonEmpty)
  }

  test("connectedComponents converges on a deep chain (beyond any fixed round count)") {
    // a 40-node path graph has diameter 39: min-label propagation
    // needs 39 rounds to pull node 0's label to the far end, so any
    // hardcoded round cutoff (the pre-convergence-check loop used 8)
    // silently under-merges exactly this topology. The sum-fixpoint
    // check must keep iterating until one component remains.
    import spark.implicits._
    val chain = (0L until 39L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labels = Dedup.connectedComponents(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 40)
    assert(labels.values.toSet == Set(0L), s"unconverged labels: ${labels.values.toSet}")
    // two disjoint triangles stay disjoint (no over-merging)
    val two = Seq((0L, 1L), (1L, 2L), (10L, 11L), (11L, 12L)).toDF("doc_a", "doc_b")
    val l2 = Dedup.connectedComponents(two).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(l2 == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("star contraction ≡ min-label CC, and rescues graphs beyond the round cap") {
    import spark.implicits._
    // equality on the real near-dup pair graph
    val pairs = SparkEntry.queries("q_dedup_ngram")(spark, sf)
      .select("doc_a", "doc_b")
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(toMap(Dedup.connectedComponentsStar(pairs)) ==
      toMap(Dedup.connectedComponents(pairs)))
    // a 120-node path has diameter 119 > ClusterMaxRounds(50): the
    // min-label loop cannot reach a fixpoint and must hand off to
    // star contraction (O(log n) rounds) instead of failing or
    // silently under-merging — the public entry point stays correct
    // on ANY topology
    val deep = (0L until 119L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val viaFallback = toMap(Dedup.connectedComponents(deep))
    assert(viaFallback.size == 120)
    assert(viaFallback.values.toSet == Set(0L),
      s"deep chain under-merged: ${viaFallback.values.toSet}")
    // star contraction directly agrees, and keeps disjoint components
    // disjoint (no over-merge)
    val mixed = deep.unionAll(
      Seq((500L, 501L), (501L, 502L)).toDF("doc_a", "doc_b"))
    val star = toMap(Dedup.connectedComponentsStar(mixed))
    assert(star.filter(_._1 >= 500L).values.toSet == Set(500L))
    assert(star.filter(_._1 < 500L).values.toSet == Set(0L))
  }

  test("q_dedup_cluster ≡ driver union-find over the pair graph; labels are a fixpoint") {
    val pairs = SparkEntry.queries("q_dedup_ngram")(spark, sf01)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    // driver-side union-find with path compression — the definition
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    // canonical min-id per component (union-find roots are order-dependent)
    val expect = nodes.groupBy(find).iterator.flatMap { case (_, ns) =>
      val m = ns.min; ns.map(_ -> m)
    }.toMap
    val got = SparkEntry.queries("q_dedup_cluster")(spark, sf01).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got.view.mapValues(_._1).toMap === expect)
    got.foreach { case (doc, (cl, rep)) => assert(rep === (doc == cl)) }
    // fixpoint: a converged labeling gives both endpoints of every
    // edge the same cluster — the property an 8-round shortfall breaks
    pairs.foreach { case (a, b) =>
      assert(got(a)._1 === got(b)._1, s"edge ($a,$b) crosses clusters")
    }
  }

  test("q_dedup_embed vs brute cosine >= 0.4: precision 1.0, label pairs complete, recall bounded") {
    val got = pairSet(SparkEntry.queries("q_dedup_embed")(spark, sf01)
      .select("vec_a", "vec_b"))
    val e = Tables.embeddings(spark, sf01)
      .select(col("vec_id"), col("label"), col("embedding"))
    def bruteWith(cond: org.apache.spark.sql.Column) = pairSet(
      e.as("a").crossJoin(e.as("b"))
        .filter(col("a.vec_id") < col("b.vec_id") && cond
          && graft.functions.CosineSimilarity.cosine_sim(
               col("a.embedding"), col("b.embedding")) >= 0.4)
        .select(col("a.vec_id"), col("b.vec_id")))
    // precision 1.0 is structural: every candidate is rescored with
    // the exact kernel
    val unblocked = bruteWith(lit(true))
    assert((got -- unblocked).isEmpty, s"false positives: ${got -- unblocked}")
    // the label generator is part of the union, so every same-label
    // true pair MUST be present — exact containment
    val sameLabel = bruteWith(col("a.label") === col("b.label"))
    assert((sameLabel -- got).isEmpty, s"label-block misses: ${sameLabel -- got}")
    // OR-amplified LSH (6 tables x 4 bits) over the rest: recall is
    // probabilistic near the 0.4 threshold; document and bound it
    // (label-only blocking measured 5/59 here — the LSH union must
    // do meaningfully better)
    val missed = unblocked -- got
    println(s"embed label∪LSH blocking: ${got.size}/${unblocked.size} true pairs; " +
      s"${missed.size} misses: ${missed.toSeq.sorted}")
    assert(got.size.toDouble / unblocked.size >= 0.6,
      s"recall ${got.size}/${unblocked.size} below 0.6")
    assert(got.nonEmpty)
  }

  test("q_dedup_semantic vs brute cosine >= 0.4: precision 1.0, misses straddle clusters") {
    val got = pairSet(SparkEntry.queries("q_dedup_semantic")(spark, sf01)
      .select("vec_a", "vec_b"))
    val e = Tables.embeddings(spark, sf01).select(col("vec_id"), col("embedding"))
    val brute = pairSet(e.as("a").crossJoin(e.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id")
        && graft.functions.CosineSimilarity.cosine_sim(
             col("a.embedding"), col("b.embedding")) >= 0.4)
      .select(col("a.vec_id"), col("b.vec_id")))
    // precision 1.0 is structural (exact rescoring within clusters)
    assert((got -- brute).isEmpty, s"false positives: ${got -- brute}")
    // every miss must be a cluster-boundary pair — verify against the
    // same deterministic clustering the query used
    val vecs = Tables.embeddings(spark, sf01).select(col("vec_id"), col("embedding"))
    val clusters = Similarity.assignTo(vecs,
        Similarity.lloydCentroids(vecs, Dedup.semanticK(vecs), 3))
      .select("vec_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val missed = brute -- got
    missed.foreach { case (a, b) =>
      assert(clusters(a) != clusters(b),
        s"pair ($a,$b) shares cluster ${clusters(a)} but was missed — not a boundary miss")
    }
    println(s"semantic (k-means block): ${got.size}/${brute.size} true pairs; " +
      s"${missed.size} boundary misses: ${missed.toSeq.sorted}")
    assert(got.size.toDouble / brute.size >= 0.5,
      s"recall ${got.size}/${brute.size} below 0.5")
    assert(got.nonEmpty)
  }
}
