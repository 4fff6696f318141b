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

  private def finDropEmpty(df: DataFrame): DataFrame =
    df.filter(col("n") > 0).select(col("g"), col("n"),
      col("dec").cast("double").as("total"))

  private val partialDelta: DataFrame => DataFrame = { cdc =>
    val sign = when(col(SnapshotTable.ChangeTypeCol)
      .isin("insert", "update_postimage"), lit(1L)).otherwise(lit(-1L))
    cdc.groupBy("g").agg(sum(sign).as("n"),
      sum(sign * col("v").cast(DecimalType(18, 2)).cast(DecimalType(38, 2)))
        .cast(DecimalType(38, 2)).as("dec"))
  }

  test("retraction IVM: deletes and updates fold the signed change feed, O(state+changelog)") {
    val t = SnapshotTable.temp(spark, "graft_mvinc_cdc_")
    val base = java.nio.file.Files.createTempDirectory("graft_mvinc_cdc_").toString + "/mv"
    try {
      val rows = (0L until 1000L).map(k => (k, k % 7, k * 1.5)).toDF("k", "g", "v")
      t.commit(rows)
      val fp = MaterializedViews.registerIncremental(t, base)(
        q, partial, combine, finDropEmpty, Some(partialDelta))
      // a DV DELETE that fully empties group g=6, plus a DV UPDATE
      t.delete($"g" === 6L || $"k" === 10L)
      t.update($"k" === 3L, Map("v" -> lit(12345.0)))
      val res = MaterializedViews.refresh(fp).get
      assert(res.mode == "incremental-cdc", res.toString)
      // delta-scaled: inputs are the persisted state + changelog files
      // only — never a v1 base data file
      assert(res.inputFiles.nonEmpty)
      assert(res.inputFiles.forall(f =>
        f.contains("-state-") || f.contains("-cdc-")),
        s"IVM refresh inputs not state+changelog: ${res.inputFiles}")
      // the refreshed MV answers the user's fresh aggregate exactly,
      // and the fully-retracted group is GONE (not a zero-count row)
      val served = q(t.read()).orderBy("g")
      assert(served.queryExecution.executedPlan.toString.contains("graft_mvinc_"))
      val expected = {
        MaterializedViews.deregister(res.fingerprint)
        q(t.read()).orderBy("g").collect().toSeq
      }
      assert(served.collect().toSeq == expected)
      assert(!expected.exists(_.getLong(0) == 6L))
    } finally SnapshotTable.drop(t)
  }

  test("delta-join IVM: a fact-join-dim view refreshes from dim-joined deltas, stacked") {
    val t = SnapshotTable.temp(spark, "graft_mvinc_join_")
    val base = java.nio.file.Files.createTempDirectory("graft_mvinc_join_").toString + "/mv"
    try {
      // fact(k, c, v); static broadcast dim maps c -> g
      val dim = (0L until 10L).map(c => (c, c % 3)).toDF("dc", "g")
      def joined(df: DataFrame) = df.join(broadcast(dim), col("c") === col("dc"))
      val fact = (0L until 500L).map(k => (k, k % 10, k * 2.0)).toDF("k", "c", "v")
      t.commit(fact)
      def jq(df: DataFrame) = q(joined(df).select("g", "v", "k"))
      val sign = when(col(SnapshotTable.ChangeTypeCol)
        .isin("insert", "update_postimage"), lit(1L)).otherwise(lit(-1L))
      val fp = MaterializedViews.registerIncremental(t, base)(
        jq,
        df => partial(joined(df).select("g", "v", "k")),
        combine, finDropEmpty,
        Some(cdc => joined(cdc).groupBy("g").agg(sum(sign).as("n"),
          sum(sign * col("v").cast(DecimalType(18, 2))
            .cast(DecimalType(38, 2))).cast(DecimalType(38, 2)).as("dec"))))
      // round 1: append + delete, one refresh
      t.appendOnce((500L until 600L).map(k => (k, k % 10, k * 2.0)).toDF("k", "c", "v"), 0L)
      t.delete($"k" % 9 === 0)
      val r1 = MaterializedViews.refresh(fp).get
      assert(r1.mode == "incremental-cdc", r1.toString)
      assert(!r1.inputFiles.exists(_.contains("/data/v1-")),
        s"delta-join refresh re-scanned the fact: ${r1.inputFiles}")
      // round 2: update on the REFRESHED state — still delta-scaled
      t.update($"k" === 11L, Map("v" -> lit(9999.0)))
      val r2 = MaterializedViews.refresh(r1.fingerprint).get
      assert(r2.mode == "incremental-cdc", r2.toString)
      assert(!r2.inputFiles.exists(_.contains("/data/v1-")) &&
        !r2.inputFiles.exists(_.contains("/data/v2-")),
        s"stacked refresh read fact data: ${r2.inputFiles}")
      // exactness against the from-scratch recompute
      val served = jq(t.read()).orderBy("g")
      assert(served.queryExecution.executedPlan.toString.contains("graft_mvinc_"))
      val expected = {
        MaterializedViews.deregister(r2.fingerprint)
        jq(t.read()).orderBy("g").collect().toSeq
      }
      assert(served.collect().toSeq == expected)
    } finally SnapshotTable.drop(t)
  }

  test("retraction IVM survives INSERT OVERWRITE: the replace folds as deletes + inserts") {
    val t = SnapshotTable.temp(spark, "graft_mvinc_replace_")
    val base = java.nio.file.Files.createTempDirectory("graft_mvinc_repl_").toString + "/mv"
    try {
      val rows = (0L until 600L).map(k => (k, k % 5, k * 1.0)).toDF("k", "g", "v")
      t.commit(rows)
      val fp = MaterializedViews.registerIncremental(t, base)(
        q, partial, combine, finDropEmpty, Some(partialDelta))
      // INSERT OVERWRITE through the DSv2 batch write: groups 3,4
      // vanish entirely, 0..2 change value
      val repl = (0L until 100L).map(k => (k, k % 3, k * 2.0)).toDF("k", "g", "v")
      repl.write.format("graft-table").option("path", t.root)
        .mode("overwrite").save()
      val res = MaterializedViews.refresh(fp).get
      assert(res.mode == "incremental-cdc", res.toString)
      // the replace's own changelog + state only — no re-scan of either snapshot
      assert(res.inputFiles.nonEmpty)
      assert(res.inputFiles.forall(f =>
        f.contains("-state-") || f.contains("-cdc-")),
        s"overwrite IVM refresh inputs not state+changelog: ${res.inputFiles}")
      val served = q(t.read()).orderBy("g")
      assert(served.queryExecution.executedPlan.toString.contains("graft_mvinc_repl"))
      val expected = {
        MaterializedViews.deregister(res.fingerprint)
        q(t.read()).orderBy("g").collect().toSeq
      }
      assert(served.collect().toSeq == expected)
      assert(!expected.exists(r => r.getLong(0) == 3L || r.getLong(0) == 4L),
        "fully-replaced groups must retract to nothing")
    } finally SnapshotTable.drop(t)
  }

  test("a DML range WITHOUT a registered partialDelta still falls back to full, exact") {
    val t = SnapshotTable.temp(spark, "graft_mvinc_nodelta_")
    val base = java.nio.file.Files.createTempDirectory("graft_mvinc_nd_").toString + "/mv"
    try {
      val rows = (0L until 300L).map(k => (k, k % 3, k * 1.0)).toDF("k", "g", "v")
      t.commit(rows)
      val fp = register(t, base) // no partialDelta
      t.delete($"k" % 10 === 0)
      val res = MaterializedViews.refresh(fp).get
      assert(res.mode == "full", res.toString)
      val served = q(t.read()).orderBy("g")
      val expected = {
        MaterializedViews.deregister(res.fingerprint)
        q(t.read()).orderBy("g").collect().toSeq
      }
      assert(served.collect().toSeq == expected)
    } finally SnapshotTable.drop(t)
  }
}
