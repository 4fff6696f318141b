package graft.tables

import java.nio.file.Paths

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Write-time `#rows` minting + append-time stat carry: the zero-IO
  * COUNT(*) contract survives EVERY write path (plain commits,
  * appends, updates, merges, partial compaction), per-file skipping
  * stats survive appends (stat-less new files conservatively kept),
  * and concurrent blind appends auto-rebase instead of failing each
  * other. */
class AppendStatsSpec extends SparkSpec {
  import spark.implicits._

  private def kv(rows: (Long, Double)*) = rows.toDF("k", "v")

  test("a WIDE commit's footer counts come from the executor-side pass and stay exact") {
    // >32 staged files takes the distributed footer-read path (a
    // narrow write keeps the driver's ≤32 metadata-sized reads) —
    // the per-file #rows lines must be complete and exact either way
    val t = SnapshotTable.temp(spark, "graft_appstats_wide_")
    try {
      t.commit((1L to 500L).map(k => (k, k * 1.0)).toDF("k", "v").repartition(40))
      assert(t.metaCount(1L) == 500L)
      t.appendOnce((501L to 540L).map(k => (k, k * 1.0)).toDF("k", "v")
        .repartition(40), 0L)
      assert(t.metaCount(t.currentVersion) == 540L)
    } finally SnapshotTable.drop(t)
  }

  test("metaCount stays zero-IO through commit/append/delete/update/merge/compactSmall") {
    val t = SnapshotTable.temp(spark, "graft_appstats_count_")
    try {
      t.commit((1L to 200L).map(k => (k, k * 1.0)).toDF("k", "v"))
      assert(t.metaCount(1L) == 200L) // plain commit mints footer counts
      t.appendOnce((201L to 250L).map(k => (k, k * 1.0)).toDF("k", "v"), 0L)
      assert(t.metaCount(t.currentVersion) == 250L)
      t.delete(col("k") <= 30L)
      assert(t.metaCount(t.currentVersion) == 220L)
      // update: tombstones + post-images, both sides counted
      t.update(col("k") % 50 === 0, Map("v" -> (col("v") * 2)))
      assert(t.metaCount(t.currentVersion) == 220L)
      // merge rewrites: fresh counts for the merged snapshot
      t.merge(kv(300L -> 3.0, 301L -> 3.1), "k")
      assert(t.metaCount(t.currentVersion) == 222L)
      // partial compaction keeps coverage (carried + re-minted)
      val sizes = t.read().inputFiles.toSeq
        .filterNot(_.contains("-dv-"))
        .map(u => java.nio.file.Files.size(Paths.get(java.net.URI.create(u))))
      if (sizes.size > 2) t.compactSmall(sizes.max)
      val v = t.currentVersion
      val expect = t.read(v).count()
      // destructive zero-IO proof
      SnapshotTable.deleteRecursively(Paths.get(t.root, "data"))
      assert(t.metaCount(v) == expect)
    } finally SnapshotTable.drop(t)
  }

  test("SQL COUNT(*) pushes down on unclustered tables and through appends") {
    val t = SnapshotTable.temp(spark, "graft_appstats_sql_")
    try {
      t.commit((1L to 500L).map(k => (k, k * 1.0)).toDF("k", "v"))
      t.appendOnce((501L to 600L).map(k => (k, k * 1.0)).toDF("k", "v"), 0L)
      val q = spark.read.format("graft-table").option("path", t.root).load()
        .agg(count(lit(1)))
      assert(q.queryExecution.executedPlan.toString
        .contains("PushedAggregates (metadata-only)"),
        q.queryExecution.executedPlan.toString.take(800))
      SnapshotTable.deleteRecursively(Paths.get(t.root, "data"))
      assert(q.head.getLong(0) == 600L)
      // MIN/MAX/SUM now SURVIVE appends: the append mints write-time
      // #range/#sum for its fresh files (one executor pass), so the
      // full cluster claim — and the zero-IO aggregate pushdown with
      // it — keeps answering, proven destructively
      val t2 = SnapshotTable.temp(spark, "graft_appstats_sql2_")
      try {
        t2.commitClustered((1L to 100L).map(k => (k, k * 1.0)).toDF("k", "v"), "k", 4)
        t2.appendOnce(kv(1000L -> 1.0), 0L)
        assert(t2.metaAgg(t2.currentVersion) == ((101L, Some(1L), Some(1000L))))
        assert(t2.metaSum(t2.currentVersion) == ((Some((1L to 100L).sum + 1000L), 101L)))
        val q2 = spark.read.format("graft-table").option("path", t2.root).load()
          .agg(min("k"), max("k"), sum("k"), count(lit(1)))
        assert(q2.queryExecution.executedPlan.toString
          .contains("PushedAggregates (metadata-only)"),
          q2.queryExecution.executedPlan.toString.take(800))
        SnapshotTable.deleteRecursively(Paths.get(t2.root, "data"))
        val r2 = q2.head
        assert((r2.getLong(0), r2.getLong(1), r2.getLong(2), r2.getLong(3)) ==
          ((1L, 1000L, (1L to 100L).sum + 1000L, 101L)))
      } finally SnapshotTable.drop(t2)
    } finally SnapshotTable.drop(t)
  }

  test("appends keep pruning AND coverage: fresh files mint real bounds") {
    val t = SnapshotTable.temp(spark, "graft_appstats_mint_")
    try {
      t.commitClustered((1L to 1000L).map(k => (k, k * 1.0)).toDF("k", "v"), "k", 8)
      t.appendOnce(kv(5000L -> 5.0, 5100L -> 5.1), 0L)
      val v = t.currentVersion
      // the appended file has REAL bounds now, so a range read that
      // does not intersect [5000, 5100] prunes it too: ≤2 of 9 files
      assert(t.prunedFiles(v, 100L, 150L).size <= 2)
      assert(t.readWhere(v, "k", 100L, 150L).count() == 51L)
      assert(t.readWhere(v, "k", 4999L, 5101L).count() == 2L)
      // a second append stacks more coverage; a DV delete then
      // re-mints across BOTH eras and the metadata aggregates answer
      t.appendOnce(kv(6000L -> 6.0), 1L)
      t.delete(col("k") === 5000L || col("k") <= 10L)
      val v3 = t.currentVersion
      val live = ((11L to 1000L) ++ Seq(5100L, 6000L))
      assert(t.metaAgg(v3) == ((live.size.toLong, Some(11L), Some(6000L))))
      assert(t.metaSum(v3) == ((Some(live.sum), live.size.toLong)))
    } finally SnapshotTable.drop(t)
  }

  test("file skipping and bloom lookups survive appends (new files conservatively kept)") {
    val t = SnapshotTable.temp(spark, "graft_appstats_prune_")
    try {
      t.commitClustered((1L to 1000L).map(k => (k, k * 1.0)).toDF("k", "v"), "k", 8)
      t.appendOnce(kv(5000L -> 5.0), 0L)
      val v = t.currentVersion
      // carried #range lines still prune the 8 clustered files; the
      // stat-less appended file is conservatively kept
      // a 51-key range intersects at most two of the 8 clustered
      // files; the stat-less appended file is always kept — so ≤3 of
      // 9, not all of them
      val pruned = t.prunedFiles(v, 100L, 150L)
      assert(pruned.size <= 3, s"pruning lost after append: ${pruned.size} files kept")
      assert(t.readWhere(v, "k", 100L, 150L).count() == 51L)
      assert(t.readWhere(v, "k", 4999L, 5001L).count() == 1L) // finds the appended row
    } finally SnapshotTable.drop(t)
    val tb = SnapshotTable.temp(spark, "graft_appstats_bloom_")
    try {
      tb.commitBloom((1L to 1000L).map(k => (k, k * 1.0)).toDF("k", "v"), "k", 8)
      tb.appendOnce(kv(5000L -> 5.0), 0L)
      val v = tb.currentVersion
      // bloom sidecars still skip among the 8 hashed files; the
      // appended file has no sidecar and is always probed
      assert(tb.prunedFilesBloom(v, 77L).size <= 3)
      assert(tb.readWhereEq(v, "k", 77L).count() == 1L)
      assert(tb.readWhereEq(v, "k", 5000L).count() == 1L)
    } finally SnapshotTable.drop(tb)
  }

  test("concurrent blind appends auto-rebase: all land, none fail") {
    val t = SnapshotTable.temp(spark, "graft_appstats_conc_")
    try {
      t.commit(kv(0L -> 0.0))
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      val futures = (1 to 8).map { i =>
        scala.concurrent.Future {
          // each writer its own instance (no shared driver state)
          val w = new SnapshotTable(spark, t.root)
          w.appendOnce(kv((i * 10L) -> i.toDouble), batchId = i.toLong)
        }
      }
      val results = scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futures),
        scala.concurrent.duration.Duration(120, "s"))
      pool.shutdown()
      assert(results.forall(_.isDefined),
        s"an append lost its CAS permanently: $results")
      assert(t.read().count() == 9L)
      assert(t.metaCount(t.currentVersion) == 9L) // counts carried through every rebase
      // a schema change underneath must still CONFLICT, not rebase
    } finally SnapshotTable.drop(t)
  }
}
