package graft.tables

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Standard SQL row-level DML against graft tables: `DELETE FROM`
  * (metadata path AND subquery row-level path), `UPDATE`, and
  * `MERGE INTO` — the reference's PATCH-or-POST upsert loop
  * (task.ts:228-271) as one SQL statement. All land on deletion
  * vectors + staged data parts: no pre-existing data file is ever
  * rewritten, and the version log stays time-travelable through
  * every statement.
  */
class GraftSqlDmlSpec extends SparkSpec {
  import spark.implicits._

  private val catName = "graftdml"
  private lazy val catRoot = {
    val r = java.nio.file.Files.createTempDirectory("graft_dml_")
    spark.conf.set(s"spark.sql.catalog.$catName", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$catName.root", r.toString)
    r
  }

  private var n = 0
  /** Fresh catalog table seeded with (k, v) rows 1..rows. */
  private def seeded(rows: Long): (String, SnapshotTable) = {
    n += 1
    val name = s"t$n"
    val t = new SnapshotTable(spark, catRoot.resolve(name).toString)
    t.commit((1L to rows).map(k => (k, k * 1.0)).toDF("k", "v"))
    (s"$catName.$name", t)
  }

  test("DELETE FROM with a translatable WHERE runs the metadata (deleteWhere) path") {
    val (tbl, t) = seeded(100)
    spark.sql(s"DELETE FROM $tbl WHERE k % 2 = 0 OR k > 90")
    // % doesn't translate to a v1 filter... unless it does: either
    // path must produce the same rows, so assert semantics only
    val got = spark.sql(s"SELECT k FROM $tbl ORDER BY k").as[Long].collect().toSeq
    assert(got == (1L to 90L).filter(_ % 2 == 1))
    // no data file rewritten: v2's files are a subset of v1's
    assert(t.currentVersion == 2L)
    assert(spark.read.format("graft-table").option("path", t.root)
      .option("versionAsOf", "1").load().count() == 100)
  }

  test("DELETE FROM with a simple range predicate: file-drop + DV, one commit") {
    val (tbl, t) = seeded(100)
    spark.sql(s"DELETE FROM $tbl WHERE k <= 10")
    assert(spark.sql(s"SELECT count(*) FROM $tbl").head.getLong(0) == 90L)
    assert(t.currentVersion == 2L)
  }

  test("DELETE FROM with a subquery takes the row-level rewrite (no v1 translation exists)") {
    val (tbl, t) = seeded(50)
    val (other, _) = seeded(50)
    spark.sql(s"DELETE FROM $tbl WHERE k IN (SELECT k FROM $other WHERE k <= 20)")
    val got = spark.sql(s"SELECT k FROM $tbl ORDER BY k").as[Long].collect().toSeq
    assert(got == (21L to 50L))
    // the delta commit: DV lines present, all v1 data files still listed
    assert(t.currentVersion == 2L)
    assert(t.read(1L).count() == 50)
  }

  test("UPDATE SET with expressions over the pre-image") {
    val (tbl, t) = seeded(30)
    spark.sql(s"UPDATE $tbl SET v = v * 10 WHERE k <= 3")
    val got = spark.sql(s"SELECT k, v FROM $tbl ORDER BY k")
      .as[(Long, Double)].collect().toSeq
    assert(got.take(3) == Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)))
    assert(got.drop(3) == (4L to 30L).map(k => (k, k * 1.0)))
    assert(t.currentVersion == 2L)
  }

  test("MERGE INTO: matched-update, matched-delete, not-matched-insert in one statement") {
    val (tbl, t) = seeded(10)
    val (src, _) = seeded(0) // reuse machinery for a second table
    spark.sql(s"INSERT INTO $src VALUES (3, 300.0), (5, -1.0), (11, 11.0), (12, 12.0)")
    spark.sql(
      s"""MERGE INTO $tbl AS t USING $src AS s ON t.k = s.k
         |WHEN MATCHED AND s.v < 0 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)
         |""".stripMargin)
    val got = spark.sql(s"SELECT k, v FROM $tbl ORDER BY k")
      .as[(Long, Double)].collect().toSeq
    val expected = ((1L to 10L).filterNot(_ == 5).map(k =>
      (k, if (k == 3) 300.0 else k * 1.0)) ++ Seq((11L, 11.0), (12L, 12.0))).sortBy(_._1)
    assert(got == expected)
    // one atomic version: tombstones + inserts together
    assert(t.currentVersion == 2L)
    // time travel under the merge
    assert(t.read(1L).count() == 10)
  }

  test("MERGE INTO is the reference upsert: source wins on match, inserts otherwise") {
    val (tbl, t) = seeded(5)
    val (src, _) = seeded(0)
    spark.sql(s"INSERT INTO $src VALUES (4, 40.0), (5, 50.0), (6, 60.0), (7, 70.0)")
    spark.sql(
      s"""MERGE INTO $tbl t USING $src s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *
         |""".stripMargin)
    val got = spark.sql(s"SELECT k, v FROM $tbl ORDER BY k")
      .as[(Long, Double)].collect().toSeq
    assert(got == Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 40.0), (5L, 50.0),
      (6L, 60.0), (7L, 70.0)))
  }

  test("row-address metadata columns are queryable and consistent with DV addressing") {
    val (tbl, _) = seeded(20)
    val rows = spark.sql(
      s"SELECT ${GraftRowMeta.FileCol} AS f, ${GraftRowMeta.PosCol} AS p, k FROM $tbl")
      .collect()
    assert(rows.length == 20)
    // addresses are dir/name and positions are dense within a file
    rows.foreach(r => assert(r.getString(0).split('/').length == 2))
    val posByFile = rows.groupBy(_.getString(0)).values
    posByFile.foreach { rs =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == (0L until rs.length).toSeq)
    }
  }

  test("DML statements compose: delete, update, merge, stacked, all time-travelable") {
    val (tbl, t) = seeded(100)
    spark.sql(s"DELETE FROM $tbl WHERE k > 90")
    spark.sql(s"UPDATE $tbl SET v = 0.0 WHERE k <= 5")
    val (src, _) = seeded(0)
    spark.sql(s"INSERT INTO $src VALUES (1, 111.0), (200, 200.0)")
    spark.sql(
      s"""MERGE INTO $tbl t USING $src s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)
         |""".stripMargin)
    val got = spark.sql(s"SELECT sum(v) FROM $tbl").head.getDouble(0)
    val expected = 111.0 + 0.0 * 4 + (6L to 90L).map(_ * 1.0).sum + 200.0
    assert(math.abs(got - expected) < 1e-9)
    assert(spark.sql(s"SELECT count(*) FROM $tbl").head.getLong(0) == 91L)
    // every intermediate version still reads exactly
    assert(t.read(1L).count() == 100)
    // DV-aware scans also serve the SQL VERSION AS OF surface
    assert(spark.sql(s"SELECT count(*) FROM $tbl VERSION AS OF 2").head.getLong(0) == 90L)
  }

  test("SQL MERGE mints the row-level change feed: per-type rows exact") {
    val (tbl, t) = seeded(10)
    val (src, _) = seeded(0)
    spark.sql(s"INSERT INTO $src VALUES (3, 300.0), (5, -1.0), (11, 11.0), (12, 12.0)")
    spark.sql(
      s"""MERGE INTO $tbl AS t USING $src AS s ON t.k = s.k
         |WHEN MATCHED AND s.v < 0 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)
         |""".stripMargin)
    val cdc = t.rowChangesBetween(1L, 2L)
      .select(col("k"), col("v"), col(SnapshotTable.ChangeTypeCol))
      .as[(Long, Double, String)].collect().toSeq.sorted
    assert(cdc == Seq(
      (3L, 3.0, "update_preimage"), (3L, 300.0, "update_postimage"),
      (5L, 5.0, "delete"),
      (11L, 11.0, "insert"), (12L, 12.0, "insert")).sorted)
    // the same feed through the DSv2 readChangeFeed surface
    val viaRead = spark.read.format("graft-table").option("path", t.root)
      .option("readChangeFeed", "true")
      .option("startingVersion", "1").option("endingVersion", "2").load()
      .select(col("k"), col("v"), col(SnapshotTable.ChangeTypeCol))
      .as[(Long, Double, String)].collect().toSeq.sorted
    assert(viaRead == cdc)
  }

  test("SQL UPDATE and subquery DELETE record exact pre-images in the change feed") {
    val (tbl, t) = seeded(30)
    spark.sql(s"UPDATE $tbl SET v = v * 10 WHERE k <= 3")
    val updCdc = t.rowChangesBetween(1L, 2L)
      .select(col("k"), col("v"), col(SnapshotTable.ChangeTypeCol))
      .as[(Long, Double, String)].collect().toSeq.sorted
    assert(updCdc == (1L to 3L).flatMap(k => Seq(
      (k, k * 1.0, "update_preimage"), (k, k * 10.0, "update_postimage"))).sorted)
    // subquery DELETE forces the row-level rewrite path — its deletes
    // must carry full pre-images too (v reflects the prior UPDATE)
    val (other, _) = seeded(30)
    spark.sql(s"DELETE FROM $tbl WHERE k IN (SELECT k FROM $other WHERE k <= 2)")
    val delCdc = t.rowChangesBetween(2L, 3L)
      .select(col("k"), col("v"), col(SnapshotTable.ChangeTypeCol))
      .as[(Long, Double, String)].collect().toSeq.sorted
    assert(delCdc == Seq((1L, 10.0, "delete"), (2L, 20.0, "delete")))
    // and the feed composes across the whole SQL DML stack
    assert(t.rowChangesBetween(1L, 3L).count() == 8L)
  }

  test("SQL DELETE drops fully-tombstoned files from the manifest (metadata dead-file check)") {
    val t = new SnapshotTable(spark, catRoot.resolve("deadfile").toString)
    t.commitClustered((1L to 100L).map(k => (k, k * 1.0)).toDF("k", "v"), "k", 4)
    val v1Files = SnapshotTable.manifestFilesOf(
      SnapshotTable.manifestLinesAt(catRoot.resolve("deadfile"), 1L))
    assert(v1Files.length == 4)
    val (other, _) = seeded(60)
    // subquery forces the row-level delta path; keys 1..60 fully
    // cover at least the first range-clustered file, whose known
    // #rows all tombstone — the commit drops it without any scan
    spark.sql(s"DELETE FROM $catName.deadfile WHERE k IN (SELECT k FROM $other)")
    assert(spark.sql(s"SELECT count(*) FROM $catName.deadfile").head.getLong(0) == 40L)
    val v2Lines = SnapshotTable.manifestLinesAt(catRoot.resolve("deadfile"),
      t.currentVersion)
    assert(SnapshotTable.manifestFilesOf(v2Lines).length < 4,
      "fully-tombstoned file still listed after SQL DELETE")
    // the surviving files' tombstone counts are recorded, so COUNT(*)
    // stays metadata-answerable under the DVs
    assert(v2Lines.exists(_.startsWith("#dvrows=")))
  }

  test("MERGE WHEN NOT MATCHED BY SOURCE: target-only rows delete/update through the delta path") {
    val (tbl, t) = seeded(10)
    val (src, _) = seeded(0)
    spark.sql(s"INSERT INTO $src VALUES (1, 100.0), (2, 200.0), (11, 11.0)")
    spark.sql(
      s"""MERGE INTO $tbl AS t USING $src AS s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)
         |WHEN NOT MATCHED BY SOURCE AND t.k > 8 THEN DELETE
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = 0.0
         |""".stripMargin)
    val got = spark.sql(s"SELECT k, v FROM $tbl ORDER BY k")
      .as[(Long, Double)].collect().toSeq
    // 1,2 updated from source; 11 inserted; 9,10 (target-only, k>8)
    // deleted; 3..8 (target-only) zeroed
    assert(got == Seq((1L, 100.0), (2L, 200.0)) ++
      (3L to 8L).map(k => (k, 0.0)) :+ (11L, 11.0))
    assert(t.currentVersion == 2L)
    // and the change feed classifies every branch exactly
    val cdc = t.rowChangesBetween(1L, 2L)
      .groupBy(SnapshotTable.ChangeTypeCol).count()
      .as[(String, Long)].collect().toMap
    assert(cdc == Map("insert" -> 1L, "delete" -> 2L,
      "update_preimage" -> 8L, "update_postimage" -> 8L), cdc.toString)
  }

  test("INSERT OVERWRITE mints the overwrite change feed: deletes + inserts exact") {
    val (tbl, t) = seeded(5)
    spark.sql(s"INSERT OVERWRITE $tbl VALUES (100, 1.0), (200, 2.0)")
    val v = t.currentVersion
    val cdc = t.rowChangesBetween(v - 1, v)
      .select(col("k"), col("v"), col(SnapshotTable.ChangeTypeCol))
      .as[(Long, Double, String)].collect().toSeq.sorted
    assert(cdc == ((1L to 5L).map(k => (k, k * 1.0, "delete")) ++
      Seq((100L, 1.0, "insert"), (200L, 2.0, "insert"))).sorted, cdc.toString)
    // the DSv2 readChangeFeed surface serves the same rows
    val viaRead = spark.read.format("graft-table").option("path", t.root)
      .option("readChangeFeed", "true")
      .option("startingVersion", (v - 1).toString)
      .option("endingVersion", v.toString).load()
      .select(col("k"), col("v"), col(SnapshotTable.ChangeTypeCol))
      .as[(Long, Double, String)].collect().toSeq.sorted
    assert(viaRead == cdc)
    // and the feed composes across insert + overwrite history
    assert(t.isRowTracked(v - 1, v))
  }

  test("overwrite CDC pre-images respect prior deletion vectors (live rows only)") {
    val (tbl, t) = seeded(10)
    spark.sql(s"DELETE FROM $tbl WHERE k <= 5") // v2: DV tombstones
    spark.sql(s"INSERT OVERWRITE $tbl VALUES (42, 4.2)") // v3
    val cdc = t.rowChangesBetween(2L, 3L)
      .select(col("k"), col("v"), col(SnapshotTable.ChangeTypeCol))
      .as[(Long, Double, String)].collect().toSeq.sorted
    assert(cdc == ((6L to 10L).map(k => (k, k * 1.0, "delete")) :+
      (42L, 4.2, "insert")).sorted, cdc.toString)
  }

  test("a schema-changing overwrite stays untracked: the change feed refuses loudly") {
    val (_, t) = seeded(3)
    Seq(("a", 1L)).toDF("name", "x").write.format("graft-table")
      .option("path", t.root).mode("overwrite").save()
    val v = t.currentVersion
    assert(!t.isRowTracked(v - 1, v))
    intercept[IllegalStateException] {
      t.rowChangesBetween(v - 1, v).collect()
    }
  }

  test("a MERGE matching nothing does not move the version") {
    val (tbl, t) = seeded(5)
    val (src, _) = seeded(0)
    // empty source: no deletes, no inserts
    spark.sql(
      s"""MERGE INTO $tbl t USING $src s ON t.k = s.k
         |WHEN MATCHED THEN DELETE
         |""".stripMargin)
    assert(t.currentVersion == 1L)
  }
}
