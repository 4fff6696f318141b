package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.functions.CosineSimilarity.cosine_sim

/** Emits RECALL.json: the multi-probe LSH probes-vs-recall trade-off
  * as a tracked artifact (recall@10 at probe budgets T = 1..8, i.e.
  * own bucket + T−1 margin-ordered Hamming-1 flips, Lv et al.
  * VLDB'07), measured on three corpora:
  *
  *  - `planted_locality`: the deterministic 16-cluster fixture from
  *    SimilaritySpec — embeddings WITH neighborhood structure, the
  *    regime real embedding corpora live in. This is where
  *    multi-probe earns its keep: the flips recover cluster mates
  *    that straddle a low-margin hyperplane.
  *  - `sf0.01` / `sf0.1`: the driver's isotropic-random embeddings —
  *    no locality, so recall grows ~linearly with the fraction of
  *    the 16 buckets probed, for ANY probe order. Included as the
  *    adversarial baseline so the artifact shows both regimes
  *    honestly rather than cherry-picking the favorable one.
  *
  * Recall is averaged over several probe ids per corpus. Run via
  * `tools/run_main.sh graft.ops.RecallSweep [out.json]`.
  */
object RecallSweep {

  private def hv(a: Long, b: Long, c: Long): Double =
    Math.floorMod(a * 1609587929392839161L + b * 2654435761L + c * 97531L,
      1000003L).toDouble / 1000003.0 * 2.0 - 1.0

  private[ops] def planted(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (for { c <- 0 until 16; m <- 0 until 24 } yield {
      val id = (c * 24 + m).toLong
      val emb = (0 until 64).map { j =>
        (hv(c + 1, j, 7) + hv(c * 100 + m + 13, j, 31) * 2.0 / 8.0).toFloat
      }.toArray
      (id, c.toLong, emb)
    }).toDF("vec_id", "label", "embedding")
  }

  /** Exact SQUARED-L2 top-10 — the reference metric for the PQ
    * tiers, whose ADC approximates L2 (cosine would conflate metric
    * mismatch with quantization loss). */
  private def bruteL2Top10(emb: DataFrame, probeId: Long): Set[Long] = {
    val probeVec = emb.filter(col("vec_id") === probeId)
      .select(col("embedding").as("probe"))
    emb.filter(col("vec_id") =!= probeId).crossJoin(broadcast(probeVec))
      .select(col("vec_id"),
        aggregate(zip_with(col("embedding"), col("probe"), (x, y) =>
          (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
          lit(0.0d), (acc, v) => acc + v).as("d2"))
      .orderBy(col("d2").asc, col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSet
  }

  /** PQ tier recall@10 vs the exact-L2 baseline: codebooks trained
    * ONCE per corpus (m=8 x 64 codes, the engine's geometry), then
    * one ADC ranking per probe. */
  private[ops] def pqRecall(emb: DataFrame, probeIds: Seq[Long]): Double = {
    val e = emb.select(col("vec_id"), col("label"), col("embedding"))
    val (subs, codebook, codes) = Similarity.pqTrain(e)
    val cbC = codebook.cache(); cbC.count()
    val codesC = codes.cache(); codesC.count()
    val r = probeIds.map { pid =>
      val brute = bruteL2Top10(emb, pid)
      val got = Similarity.pqAdc(subs.filter(col("vec_id") === pid), cbC,
        codesC.filter(col("vec_id") =!= pid), topK = 10)
        .collect().map(_.getLong(0)).toSet
      (brute & got).size / 10.0
    }.sum / probeIds.size
    cbC.unpersist(); codesC.unpersist()
    r
  }

  /** Residual IVF+PQ recall@10 vs nprobe (coarse k=8, the engine's
    * geometry): quantizers trained once per corpus, probes sweep the
    * nprobe budget — the coarse-pruning/recall trade-off surface. */
  private[ops] def ivfPqRecall(emb: DataFrame, probeIds: Seq[Long],
      nprobes: Seq[Int]): Map[Int, Double] = {
    val base = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val n = base.count()
    val (assigned0, centroids0) = Similarity.ivfTrainFor(base, n, 8)
    val assigned = assigned0.select(col("id").as("vec_id"),
      lit(0L).as("label"), col("vec").as("embedding"), col("cluster"))
    val centroids = centroids0.cache(); centroids.count()
    val (_, codebook, codes) = Similarity.ivfPqTrain(assigned, centroids)
    val cbC = codebook.cache(); cbC.count()
    val codesC = codes.cache(); codesC.count()
    val perProbe = probeIds.map { pid =>
      val brute = bruteL2Top10(emb, pid)
      val probe = emb.filter(col("vec_id") === pid)
        .select(col("embedding").as("probe"))
      nprobes.map { np =>
        val got = Similarity.ivfPqAdc(probe, centroids, cbC,
          codesC.filter(col("vec_id") =!= pid), nprobe = np, topK = 10)
          .collect().map(_.getLong(0)).toSet
        np -> (brute & got).size / 10.0
      }.toMap
    }
    centroids.unpersist(); cbC.unpersist(); codesC.unpersist()
    nprobes.map(np => np -> perProbe.map(_(np)).sum / perProbe.size).toMap
  }

  /** NSW graph-ANN recall@10 vs the exact-cosine baseline (the
    * graph's metric): graph built once per corpus by [[Similarity
    * .nswTopK]]'s own recipe per probe (the per-query key's honest
    * shape — build rides every probe there too). */
  private[ops] def nswRecall(emb: DataFrame, probeIds: Seq[Long]): Double =
    probeIds.map { pid =>
      val brute = bruteTop10(emb, pid)
      val got = Similarity.nswTopK(emb, pid, 10)
        .collect().map(_.getLong(0)).toSet
      (brute & got).size / 10.0
    }.sum / probeIds.size

  private def bruteTop10(emb: DataFrame, probeId: Long): Set[Long] = {
    val probeVec = emb.filter(col("vec_id") === probeId)
      .select(col("embedding").as("probe"))
    emb.filter(col("vec_id") =!= probeId).crossJoin(broadcast(probeVec))
      .select(col("vec_id"), cosine_sim(col("embedding"), col("probe")).as("cos"))
      .orderBy(col("cos").desc, col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSet
  }

  private def sweep(emb: DataFrame, probeIds: Seq[Long],
      budgets: Seq[Int]): Map[Int, Double] = {
    val perProbe = probeIds.map { pid =>
      val brute = bruteTop10(emb, pid)
      budgets.map { t =>
        val got = Similarity.multiprobeTopK(emb, pid, t - 1, 10)
          .collect().map(_.getLong(0)).toSet
        t -> (brute & got).size / 10.0
      }.toMap
    }
    budgets.map(t => t -> perProbe.map(_(t)).sum / perProbe.size).toMap
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("RECALL.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val budgets = Seq(1, 2, 3, 4, 6, 8)
    val probeIds = Seq(0L, 30L, 61L, 120L, 241L)
    def fmt(name: String, n: Long, m: Map[Int, Double]): String =
      s""""$name":{"n":$n,"recall_at_10":{${
        budgets.map(t => s""""T$t":${math.rint(m(t) * 1000) / 1000}""").mkString(",")}}}"""
    val sections = Seq(
      ("planted_locality", planted(spark)),
      ("sf0.01", Tables.embeddings(spark, "/root/testdata/sf0.01")),
      ("sf0.1", Tables.embeddings(spark, "/root/testdata/sf0.1")),
    ).map { case (name, df) =>
      val cached = df.cache()
      val n = cached.count()
      val s = fmt(name, n, sweep(cached, probeIds, budgets))
      cached.unpersist()
      s
    }
    // PQ tier rows (r16): recall@10 vs the exact-L2 baseline, and
    // the residual IVF+PQ nprobe sweep — the compression tiers'
    // committed quality surface, like multi-probe LSH above
    val nprobes = Seq(1, 2, 4, 8)
    val pqSections = Seq(
      ("planted_locality", planted(spark)),
      ("sf0.01", Tables.embeddings(spark, "/root/testdata/sf0.01")),
      ("sf0.1", Tables.embeddings(spark, "/root/testdata/sf0.1")),
    ).map { case (name, df) =>
      val cached = df.cache(); cached.count()
      val pq = math.rint(pqRecall(cached, probeIds) * 1000) / 1000
      val ipq = ivfPqRecall(cached, probeIds, nprobes)
      val nsw = math.rint(nswRecall(cached, probeIds) * 1000) / 1000
      cached.unpersist()
      s""""$name":{"pq_recall_at_10":$pq,"nsw_recall_at_10":$nsw,"ivf_pq_recall_at_10":{${
        nprobes.map(np => s""""nprobe$np":${math.rint(ipq(np) * 1000) / 1000}""").mkString(",")}}}"""
    }
    val json =
      s"""{"artifact":"multi-probe LSH recall sweep","k":10,"planes":4,
         |"budget_semantics":"T buckets probed = own bucket + T-1 margin-ordered Hamming-1 flips",
         |"note":"with 4 hyperplanes there are only 4 Hamming-1 flips, so budgets beyond T5 clamp to 5 distinct buckets; isotropic sf corpora have no locality, so their recall tracks the probed fraction of the 16 buckets (the honest adversarial baseline), while planted_locality shows the structured-corpus regime",
         |"probe_ids":[${probeIds.mkString(",")}],
         |${sections.mkString(",\n")},
         |"pq_tiers":{"m":8,"codes":64,"coarse_k":8,"baseline":"exact squared-L2 top-10 (ADC's metric) for pq/ivf_pq; exact cosine top-10 for nsw (the graph's metric; hub stride 16, B=10, R=4)",
         |${pqSections.mkString(",\n")}}}""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
