package graft.ops

import graft.{SparkEntry, SparkSpec}

/** Robustness sweep: every registered query must execute on EMPTY
  * input tables without throwing. At 100 TB, empty inputs are
  * routine — a filtered partition, a new tenant, a source with no
  * data in the window — and an engine whose operators crash on them
  * (rather than returning an empty or neutral result) fails in
  * production in ways sf-scale correctness tests never see.
  *
  * The fixture preserves each table's RAW physical schema (events.ts
  * stays the nanos BIGINT the loader expects) by round-tripping
  * `limit(0)` through parquet.
  */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-empty").toString
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      spark.read.parquet(s"$sf/$t.parquet").limit(0)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("every registered query executes on empty tables") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, emptyDir).count(); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: " +
            String.valueOf(e.getMessage).linesIterator.take(1).mkString)
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries crash on empty input:\n${failures.mkString("\n")}")
  }
}
