package graft.tables

import java.nio.file.Paths

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Deletion-vector MAINTENANCE invariants: inert sidecars (every
  * addressed file dead) leave the manifest so the metadata-only
  * COUNT(*) path never falsely refuses, stacked sidecar sets compact
  * into one without touching data, and MIN/MAX metadata stats stay
  * answerable under DVs on clustered tables (re-minted per touched
  * file inside the delete commit). */
class DvMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def lines(t: SnapshotTable, v: Long): Vector[String] =
    SnapshotTable.manifestLinesAt(Paths.get(t.root), v)

  /** (lo, hi) of the FIRST clustered file's manifest range stats. */
  private def firstRange(t: SnapshotTable, v: Long): (Long, Long) =
    lines(t, v).collectFirst {
      case SnapshotTable.RangeMeta(_, a, b) => (a.toLong, b.toLong)
    }.getOrElse(fail("no #range stats"))

  test("metaCount survives a delete that kills every tombstoned file (inert sidecar elision)") {
    val t = SnapshotTable.temp(spark, "graft_dvmaint_inert_")
    try {
      t.commitClustered((1L to 100L).map(k => (k, k * 1.0)).toDF("k", "v"), "k", 4)
      val (lo, hi) = firstRange(t, 1L)
      // tombstone EXACTLY the first file's key range: the file dies,
      // its sidecar addresses only a removed file — fully inert, so
      // the commit elides it instead of stranding `#dv=` lines with an
      // empty #dvrows ledger (which metaCount must refuse as
      // counts-lost)
      val v2 = t.delete(col("k") >= lo && col("k") <= hi)
      assert(t.read(v2).count() == 100L - (hi - lo + 1))
      assert(!lines(t, v2).exists(_.startsWith("#dv=")),
        "inert sidecar lines survived the dead-file drop")
      assert(t.metaCount(v2) == 100L - (hi - lo + 1))
    } finally SnapshotTable.drop(t)
  }

  test("stacked deletes: carried sidecars elide once their last addressed file dies") {
    val t = SnapshotTable.temp(spark, "graft_dvmaint_stack_")
    try {
      t.commitClustered((1L to 100L).map(k => (k, k * 1.0)).toDF("k", "v"), "k", 4)
      val (lo, hi) = firstRange(t, 1L)
      // v2: one row of file 1 tombstones (sidecar + #dvrows live)
      val v2 = t.delete(col("k") === lo)
      assert(lines(t, v2).exists(_.startsWith("#dv=")))
      assert(t.metaCount(v2) == 99L)
      // v3: the REST of file 1 dies -> both this commit's sidecar and
      // the carried v2 sidecar now address only the dead file — all
      // DV lines leave, metaCount answers from #rows alone
      val v3 = t.delete(col("k") > lo && col("k") <= hi)
      assert(!lines(t, v3).exists(_.startsWith("#dv=")),
        "stacked inert sidecars survived")
      assert(t.metaCount(v3) == 100L - (hi - lo + 1))
      assert(t.read(v3).count() == 100L - (hi - lo + 1))
    } finally SnapshotTable.drop(t)
  }

  test("partially-live sidecars stay: metaCount uses rows minus dvrows") {
    val t = SnapshotTable.temp(spark, "graft_dvmaint_partial_")
    try {
      t.commitClustered((1L to 100L).map(k => (k, k * 1.0)).toDF("k", "v"), "k", 4)
      val v2 = t.delete(col("k") % 10 === 0) // touches several files, none dies
      assert(lines(t, v2).exists(_.startsWith("#dv=")))
      assert(lines(t, v2).exists(_.startsWith("#dvrows=")))
      assert(t.metaCount(v2) == 90L)
    } finally SnapshotTable.drop(t)
  }
}
