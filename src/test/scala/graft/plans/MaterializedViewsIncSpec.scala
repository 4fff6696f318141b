package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.SparkSpec
import graft.tables.SnapshotTable

/** Incremental maintenance of SnapshotTable-backed materialized
  * views: append-only refreshes fold only the change feed into the
  * persisted partial state (delta-scaled read cost, asserted on the
  * actual file set), rewriting commits fall back to a full recompute,
  * and the optimizer keeps answering the user's fresh aggregate from
  * the refreshed materialization.
  */
class MaterializedViewsIncSpec extends SparkSpec {
  import spark.implicits._

  private def q(df: DataFrame): DataFrame =
    df.groupBy("g").agg(count(lit(1)).as("n"), graft.Det.dsum(col("v"), 2).as("total"))
  private def partial(df: DataFrame): DataFrame =
    df.groupBy("g").agg(count(lit(1)).as("n"),
      sum(col("v").cast(DecimalType(18, 2))).cast(DecimalType(38, 2)).as("dec"))
  private def combine(df: DataFrame): DataFrame =
    df.groupBy("g").agg(sum(col("n")).as("n"),
      sum(col("dec")).cast(DecimalType(38, 2)).as("dec"))
  private def fin(df: DataFrame): DataFrame =
    df.select(col("g"), col("n"), col("dec").cast("double").as("total"))

  private def register(t: SnapshotTable, base: String): String =
    MaterializedViews.registerIncremental(t, base)(q, partial, combine, fin)

  test("append-only refresh reads state + delta only, and the rewrite follows the version") {
    val t = SnapshotTable.temp(spark, "graft_mvinc_append_")
    val base = java.nio.file.Files.createTempDirectory("graft_mvinc_").toString + "/mv"
    try {
      val rows = (0L until 1000L).map(k => (k, k % 7, k * 1.5)).toDF("k", "g", "v")
      t.commit(rows.filter($"k" % 2 === 0))
      val fp = register(t, base)
      // registered: the user's fresh aggregate is answered from the MV
      val served1 = q(t.read()).orderBy("g")
      assert(served1.queryExecution.executedPlan.toString.contains("graft_mvinc_"))
      assert(served1.collect().toSeq ==
        q(rows.filter($"k" % 2 === 0)).orderBy("g").collect().toSeq)
      // append a delta, refresh: mode=incremental, inputs = state+delta
      t.appendOnce(rows.filter($"k" % 2 === 1), 0L)
      val v1Files = new SnapshotTable(spark, t.root).addedFiles(0L, 1L).toSet
      val res = MaterializedViews.refresh(fp).get
      assert(res.mode == "incremental", res.toString)
      assert(res.inputFiles.nonEmpty)
      assert(!res.inputFiles.exists(f => v1Files.exists(rel => f.endsWith(rel))),
        s"refresh re-read the base snapshot: ${res.inputFiles}")
      assert(res.inputFiles.forall(f =>
        f.contains("-state-") || f.contains("v2-")),
        s"refresh inputs not state+delta: ${res.inputFiles}")
      // the refreshed MV answers the user's post-append aggregate
      val served2 = q(t.read()).orderBy("g")
      assert(served2.queryExecution.executedPlan.toString.contains("graft_mvinc_"))
      assert(served2.collect().toSeq == q(rows).orderBy("g").collect().toSeq)
      // noop refresh
      assert(MaterializedViews.refresh(res.fingerprint).get.mode == "noop")
      MaterializedViews.deregister(res.fingerprint)
    } finally SnapshotTable.drop(t)
  }

  test("a rewriting commit in the range de-incrementalizes to a full recompute, still exact") {
    val t = SnapshotTable.temp(spark, "graft_mvinc_merge_")
    val base = java.nio.file.Files.createTempDirectory("graft_mvinc_full_").toString + "/mv"
    try {
      val rows = (0L until 500L).map(k => (k, k % 5, k * 2.0)).toDF("k", "g", "v")
      t.commit(rows)
      val fp = register(t, base)
      t.merge(Seq((3L, 3L, 999.0), (1000L, 0L, 1.0)).toDF("k", "g", "v"), "k")
      val res = MaterializedViews.refresh(fp).get
      assert(res.mode == "full", res.toString)
      val served = q(t.read()).orderBy("g")
      assert(served.queryExecution.executedPlan.toString.contains("graft_mvinc_"))
      assert(served.collect().toSeq == q(t.read()).orderBy("g")
        .collect().toSeq)
      // exactness against a from-scratch recompute with the MV gone
      val expected = {
        MaterializedViews.deregister(res.fingerprint)
        q(t.read()).orderBy("g").collect().toSeq
      }
      assert(served.collect().toSeq == expected)
    } finally SnapshotTable.drop(t)
  }
}
