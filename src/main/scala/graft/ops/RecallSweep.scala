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

  private def planted(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (for { c <- 0 until 16; m <- 0 until 24 } yield {
      val id = (c * 24 + m).toLong
      val emb = (0 until 64).map { j =>
        (hv(c + 1, j, 7) + hv(c * 100 + m + 13, j, 31) * 2.0 / 8.0).toFloat
      }.toArray
      (id, c.toLong, emb)
    }).toDF("vec_id", "label", "embedding")
  }

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
    val json =
      s"""{"artifact":"multi-probe LSH recall sweep","k":10,"planes":4,
         |"budget_semantics":"T buckets probed = own bucket + T-1 margin-ordered Hamming-1 flips",
         |"note":"with 4 hyperplanes there are only 4 Hamming-1 flips, so budgets beyond T5 clamp to 5 distinct buckets; isotropic sf corpora have no locality, so their recall tracks the probed fraction of the 16 buckets (the honest adversarial baseline), while planted_locality shows the structured-corpus regime",
         |"probe_ids":[${probeIds.mkString(",")}],
         |${sections.mkString(",\n")}}""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
