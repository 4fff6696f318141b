package graft

import org.apache.spark.sql.functions._

/** Scaling probe for the candidate-bounded dedup family: replicates
  * the sf0.1 documents table k× (each copy's tokens prefixed with the
  * copy id, so copies are INDEPENDENT corpus replicas — same token-df
  * demographics, no cross-copy near-dups) and times the document-only
  * queries cold at k = 1, 2, 4. A candidate generator whose cost
  * tracks the true-pair count should grow ~linearly here; anything
  * quadratic in corpus size (the round-3 block-join failure mode)
  * shows up as a >2 growth exponent between doublings.
  *
  * Usage: `graft.ScaleProbe [q_name ...]` — defaults to the
  * prefix-filter family. Prints one JSON line per (query, scale).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus)
      .config("spark.sql.files.maxPartitionBytes", s"${16 * 1024 * 1024}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q_dedup_ngram", "q_dedup_cluster", "q_pipeline_train")
    val base = java.nio.file.Files.createTempDirectory("graft-scale").toString

    def buildDir(k: Int): String = {
      val dir = s"$base/x$k"
      val docs = spark.read.parquet(s"$src/documents.parquet")
      val n = docs.agg(max("doc_id")).head().getLong(0) + 1
      val copies = (0 until k).map { c =>
        docs.select(
          (col("doc_id") + lit(c.toLong * n)).as("doc_id"),
          // prefix every token with the copy id: token-df shape is
          // preserved per copy, cross-copy Jaccard is exactly 0
          array_join(transform(split(col("text"), " "),
            t => concat(lit(s"c${c}_"), t)), " ").as("text"),
          col("lang"), col("source"), col("n_chars"))
      }
      copies.reduce(_ unionAll _)
        .repartition(spark.sparkContext.defaultParallelism.min(32))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      dir
    }

    // JIT/classload warmup at the smallest scale so scale=1 timings
    // aren't inflated relative to the later points
    names.foreach { name =>
      SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").count()
      spark.catalog.clearCache()
    }

    for (k <- Seq(1, 2, 4)) {
      val dir = buildDir(k)
      names.foreach { name =>
        val t0 = System.nanoTime()
        val rows = SparkEntry.queries(name)(spark, dir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        println(f"""{"query":"$name","scale":$k,"rows":$rows,"sec":$sec%.3f}""")
      }
    }
    spark.stop()
  }
}
