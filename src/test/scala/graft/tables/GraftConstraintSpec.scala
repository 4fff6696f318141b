package graft.tables

import java.nio.file.Paths

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Persistent CHECK constraints (Delta's ALTER TABLE ADD CONSTRAINT):
  * durable `#constraint=` table metadata, auto-carried across every
  * commit verb, enforced INSIDE every write job — instance verbs,
  * SQL INSERT/OVERWRITE, SQL row-level DML, streaming appends — with
  * SQL CHECK null semantics (only FALSE violates), add-time
  * validation of existing rows, and rename/drop refusal for
  * referenced columns. */
class GraftConstraintSpec extends SparkSpec {
  import spark.implicits._

  private def kv(rows: (Long, Double)*) = rows.toDF("k", "v")

  private def chainHas(e: Throwable, needle: String): Boolean = {
    var c: Throwable = e
    while (c != null) {
      if (Option(c.getMessage).exists(_.contains(needle))) return true
      c = c.getCause
    }
    false
  }

  private def rejects(needle: String)(f: => Any): Unit = {
    val e = intercept[Throwable](f)
    assert(chainHas(e, needle), s"wrong rejection: $e")
  }

  test("add validates existing rows, then every instance write path enforces") {
    val t = SnapshotTable.temp(spark, "graft_cons_paths_")
    try {
      t.commit(kv(1L -> 1.0, 2L -> 2.0))
      // add-time validation
      rejects("CHECK constraint")(t.addConstraint("neg", "v < 0.0"))
      t.addConstraint("v_pos", "v > 0.0")
      assert(t.constraints == Map("v_pos" -> "v > 0.0"))
      rejects("already exists")(t.addConstraint("v_pos", "v > 1.0"))
      val v = t.currentVersion

      // appendOnce: violating batch rejected, version unmoved, batchId
      // NOT consumed (a corrected retry with the same id lands)
      rejects("v_pos")(t.appendOnce(kv(3L -> -3.0), 7L))
      assert(t.currentVersion == v)
      assert(t.appendOnce(kv(3L -> 3.0), 7L).isDefined)

      // merge: violating source row rejected
      rejects("v_pos")(t.merge(kv(4L -> -4.0), "k"))
      t.merge(kv(4L -> 4.0), "k")

      // update: violating post-image rejected; valid one passes
      rejects("v_pos")(t.update(col("k") === 1L, Map("v" -> (col("v") * -1))))
      t.update(col("k") === 1L, Map("v" -> (col("v") + 10.0)))

      // applyChanges: violating upsert rejected
      rejects("v_pos")(t.applyChanges(
        Seq((5L, -5.0, "u")).toDF("k", "v", "op"), "k", "op"))
      // commit (overwrite): constraint survives it and still enforces
      t.commit(kv(1L -> 1.0, 2L -> 2.0))
      assert(t.constraints == Map("v_pos" -> "v > 0.0"))
      rejects("v_pos")(t.commit(kv(1L -> -1.0)))

      // NULL passes (SQL CHECK semantics)
      assert(t.appendOnce(Seq((9L, Option.empty[Double])).toDF("k", "v"), 8L)
        .isDefined)
      assert(t.read().filter(col("v").isNull).count() == 1)
    } finally SnapshotTable.drop(t)
  }

  test("constraints carry across layout rewrites, schema changes, clone; restore reverts them") {
    val t = SnapshotTable.temp(spark, "graft_cons_carry_")
    try {
      t.commit((1L to 100L).map(k => (k, k * 1.0)).toDF("k", "v"))
      t.addConstraint("v_pos", "v > 0.0")
      val atAdd = t.currentVersion
      t.compact(1)
      assert(t.constraints.nonEmpty, "compact shed the constraint")
      t.delete(col("k") === 50L)
      assert(t.constraints.nonEmpty, "delete shed the constraint")
      t.commitClustered(t.read(), "k", 4)
      assert(t.constraints.nonEmpty, "commitClustered shed the constraint")
      rejects("v_pos")(t.appendOnce(kv(200L -> -1.0), 1L))
      t.addColumn("tag", org.apache.spark.sql.types.StringType)
      assert(t.constraints.nonEmpty, "addColumn shed the constraint")
      // clone keeps constraints and enforces them independently
      val dest = java.nio.file.Files.createTempDirectory("graft_cons_clone_")
      try {
        val c = t.shallowCloneTo(dest.resolve("t").toString)
        assert(c.constraints == Map("v_pos" -> "v > 0.0"))
        rejects("v_pos")(c.merge(
          Seq((300L, -3.0, "x")).toDF("k", "v", "tag"), "k"))
      } finally SnapshotTable.deleteRecursively(dest)
      // drop, then restore to a constrained version: reverts BOTH ways
      t.dropConstraint("v_pos")
      assert(t.constraints.isEmpty)
      t.appendOnce(kv(300L -> -3.0), 2L) // violator lands while dropped
      t.restore(atAdd)
      assert(t.constraints == Map("v_pos" -> "v > 0.0"),
        "restore must revert constraint metadata")
      rejects("v_pos")(t.appendOnce(kv(400L -> -4.0), 3L))
    } finally SnapshotTable.drop(t)
  }

  test("rename/drop of a referenced column refuse until the constraint drops") {
    val t = SnapshotTable.temp(spark, "graft_cons_rename_")
    try {
      t.commit(Seq((1L, 1.0, "a")).toDF("k", "v", "tag"))
      t.addConstraint("v_pos", "v > 0.0")
      rejects("referenced by CHECK constraint")(t.renameColumn("v", "price"))
      rejects("referenced by CHECK constraint")(t.dropColumn("v"))
      t.renameColumn("tag", "label") // unreferenced: fine
      assert(t.constraints.nonEmpty)
      t.dropConstraint("v_pos")
      t.renameColumn("v", "price") // now fine
      assert(t.read().columns.toSet == Set("k", "price", "label"))
    } finally SnapshotTable.drop(t)
  }

  test("SQL INSERT, INSERT OVERWRITE and row-level DML enforce via CALL add_constraint") {
    val catRoot = java.nio.file.Files.createTempDirectory("graft_cons_sql_")
    spark.conf.set("spark.sql.catalog.conscat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.conscat.root", catRoot.toString)
    try {
      spark.sql("CREATE TABLE conscat.t (k BIGINT, v DOUBLE)")
      spark.sql("INSERT INTO conscat.t VALUES (1, 1.0), (2, 2.0)")
      spark.sql("CALL conscat.add_constraint('t', 'v_pos', 'v > 0.0')")
      val t = new SnapshotTable(spark, catRoot.resolve("t").toString)
      assert(t.constraints == Map("v_pos" -> "v > 0.0"))
      val v = t.currentVersion

      rejects("v_pos")(spark.sql("INSERT INTO conscat.t VALUES (3, -3.0)"))
      assert(t.currentVersion == v, "rejected INSERT published")
      // the rejected statement's staged parts are cleaned up, not
      // left as orphan garbage under the table root
      spark.sql("INSERT INTO conscat.t VALUES (3, 3.0)")

      rejects("v_pos")(
        spark.sql("INSERT OVERWRITE conscat.t VALUES (9, -9.0)"))
      rejects("v_pos")(
        spark.sql("UPDATE conscat.t SET v = -v WHERE k = 1"))
      rejects("v_pos")(spark.sql(
        "MERGE INTO conscat.t USING (SELECT 4 AS k, -4.0 AS v) s ON t.k = s.k " +
          "WHEN NOT MATCHED THEN INSERT *"))
      spark.sql(
        "MERGE INTO conscat.t USING (SELECT 4 AS k, 4.0 AS v) s ON t.k = s.k " +
          "WHEN NOT MATCHED THEN INSERT *")
      // DELETE introduces no rows — constraints never block it
      spark.sql("DELETE FROM conscat.t WHERE k = 2")
      assert(spark.sql("SELECT k, v FROM conscat.t ORDER BY k")
        .as[(Long, Double)].collect().toSeq == Seq((1L, 1.0), (3L, 3.0), (4L, 4.0)))
      spark.sql("CALL conscat.drop_constraint('t', 'v_pos')")
      assert(t.constraints.isEmpty)
      spark.sql("INSERT INTO conscat.t VALUES (5, -5.0)") // passes now
      assert(spark.sql("SELECT COUNT(*) FROM conscat.t").head.getLong(0) == 4L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS conscat.t")
      SnapshotTable.deleteRecursively(catRoot)
    }
  }

  test("NOT NULL: SET validates existing rows; every write path then rejects nulls; SQL ALTER surface") {
    val catRoot = java.nio.file.Files.createTempDirectory("graft_cons_nn_")
    spark.conf.set("spark.sql.catalog.consnn", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.consnn.root", catRoot.toString)
    val t = new SnapshotTable(spark, catRoot.resolve("d").toString)
    t.commit(Seq((1L, Some(1.0)), (2L, Some(2.0))).toDF("k", "v"))

    // a column that already holds nulls refuses the marker
    val t2 = SnapshotTable.temp(spark, "graft_cons_nn2_")
    try {
      t2.commit(Seq((1L, Some(1.0)), (2L, None)).toDF("k", "v"))
      rejects("CHECK constraint")(t2.setNotNull("v"))
    } finally SnapshotTable.drop(t2)

    // SQL surface: CALL set_not_null (Spark's analyzer refuses a
    // nullable→non-nullable ALTER before it can reach any catalog,
    // so SET rides the procedure catalog like add_constraint)
    spark.sql("CALL consnn.set_not_null(table => 'd', column => 'v')")
    assert(t.constraints == Map("__notnull_v" -> "v IS NOT NULL"))
    val v = t.currentVersion
    // instance append with a NULL aborts inside the write job —
    // CHECK's null-passes rule cannot mask it (IS NOT NULL is FALSE)
    rejects("__notnull_v")(
      t.appendOnce(Seq((3L, None: Option[Double])).toDF("k", "v"), 3L))
    assert(t.currentVersion == v)
    // SQL INSERT of a NULL refuses; a good row lands
    rejects("__notnull_v")(spark.sql("INSERT INTO consnn.d VALUES (4, NULL)"))
    spark.sql("INSERT INTO consnn.d VALUES (4, 4.0)")
    // SQL row-level DML writing NULL post-images refuses
    rejects("__notnull_v")(
      spark.sql("UPDATE consnn.d SET v = NULL WHERE k = 1"))
    // the marker auto-carries across commits and survives maintenance
    t.compact(1)
    assert(t.constraints == Map("__notnull_v" -> "v IS NOT NULL"))
    // rename of the guarded column refuses while the marker stands
    rejects("constraint")(
      spark.sql("ALTER TABLE consnn.d RENAME COLUMN v TO w"))
    // DROP NOT NULL removes the marker; nulls land again
    spark.sql("ALTER TABLE consnn.d ALTER COLUMN v DROP NOT NULL")
    assert(t.constraints.isEmpty)
    spark.sql("INSERT INTO consnn.d VALUES (5, NULL)")
    assert(spark.sql("SELECT count(*) FROM consnn.d WHERE v IS NULL")
      .head.getLong(0) == 1L)
  }

  test("a constraint added between validation and publish is re-validated on the CAS retry") {
    val catRoot = java.nio.file.Files.createTempDirectory("graft_cons_race_")
    spark.conf.set("spark.sql.catalog.consrace", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.consrace.root", catRoot.toString)
    val t = new SnapshotTable(spark, catRoot.resolve("d").toString)
    t.commit(kv(1L -> 1.0))
    // interpose EXACTLY ONCE: a concurrent writer adds a constraint
    // the staged rows violate, after this INSERT validated (against
    // the then-empty set) and before its publish — the addConstraint
    // takes the version, so the INSERT's CAS loses and the retry must
    // re-validate against the NEW set instead of republishing
    var fired = false
    SnapshotTable.beforePublishHook = () => {
      if (!fired) {
        fired = true
        new SnapshotTable(spark, catRoot.resolve("d").toString)
          .addConstraint("v_pos", "v > 0.0")
      }
    }
    try rejects("v_pos")(spark.sql("INSERT INTO consrace.d VALUES (2, -2.0)"))
    finally SnapshotTable.beforePublishHook = () => ()
    assert(fired, "interposition hook never ran")
    // nothing published; the violating staged rows never became a row
    assert(spark.sql("SELECT count(*) FROM consrace.d").head.getLong(0) == 1L)
    // and a CONFORMING insert retried under the same race lands
    var fired2 = false
    SnapshotTable.beforePublishHook = () => {
      if (!fired2) {
        fired2 = true
        new SnapshotTable(spark, catRoot.resolve("d").toString)
          .addConstraint("k_pos", "k > 0")
      }
    }
    try spark.sql("INSERT INTO consrace.d VALUES (3, 3.0)")
    finally SnapshotTable.beforePublishHook = () => ()
    assert(spark.sql("SELECT count(*) FROM consrace.d").head.getLong(0) == 2L)
  }

  test("streaming sink enforces constraints per micro-batch; CALL detail reports them") {
    val catRoot = java.nio.file.Files.createTempDirectory("graft_cons_stream_")
    spark.conf.set("spark.sql.catalog.consstr", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.consstr.root", catRoot.toString)
    try {
      spark.sql("CREATE TABLE consstr.t (k BIGINT, v DOUBLE)")
      spark.sql("INSERT INTO consstr.t VALUES (1, 1.0)")
      spark.sql("CALL consstr.add_constraint('t', 'v_pos', 'v > 0.0')")
      val tPath = catRoot.resolve("t").toString
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val in = MemoryStream[(Long, Double)]
      val ck = java.nio.file.Files.createTempDirectory("graft_cons_ck_").toString
      val q = in.toDF().toDF("k", "v").writeStream
        .format("graft-table").option("path", tPath)
        .option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      in.addData((2L, 2.0), (3L, -3.0)) // batch contains a violator
      val failed = try { q.processAllAvailable(); false }
        catch { case e: Throwable => chainHas(e, "CHECK constraint") }
      try q.stop() catch { case _: Throwable => () }
      assert(failed, "streaming batch with a violating row must fail the epoch")
      val t = new SnapshotTable(spark, tPath)
      assert(t.read().count() == 1L, "a failed epoch must publish nothing")
      // DESCRIBE DETAIL surface: metadata-only summary row
      val detail = spark.sql("CALL consstr.detail('t')").head
      assert(detail.getLong(0) == t.currentVersion)
      assert(detail.getLong(1) >= 1L) // files
      assert(detail.getLong(3) == 1L) // rows from metadata
      assert(detail.getString(5).contains("v_pos"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS consstr.t")
      SnapshotTable.deleteRecursively(catRoot)
    }
  }

  test("constraint commits are metadata-only, CdcTracked, and feed/IVM-transparent") {
    val t = SnapshotTable.temp(spark, "graft_cons_meta_")
    try {
      t.commit(kv(1L -> 1.0))
      val before = SnapshotTable.manifestFilesOf(
        SnapshotTable.manifestLinesAt(Paths.get(t.root), 1L))
      val v2 = t.addConstraint("v_pos", "v > 0.0")
      val lines = SnapshotTable.manifestLinesAt(Paths.get(t.root), v2)
      assert(SnapshotTable.manifestFilesOf(lines) == before,
        "addConstraint touched data files")
      // zero row-level changes tracked: the feed passes straight through
      assert(t.rowChangesBetween(1L, v2).count() == 0L)
      val v3 = t.dropConstraint("v_pos")
      assert(t.rowChangesBetween(v2, v3).count() == 0L)
    } finally SnapshotTable.drop(t)
  }

  test("DROP NOT NULL on an already-nullable column is a no-op, not a refusal") {
    val t = SnapshotTable.temp(spark, "graft_cons_nnnoop_")
    try {
      t.commit(kv(1L -> 1.0))
      val v = t.currentVersion
      // no __notnull_v marker exists: Delta/Spark semantics say no-op
      assert(t.dropNotNull("v") == v, "no-op drop must not commit")
      assert(t.currentVersion == v)
      // the column-existence check stays loud
      rejects("no column")(t.dropNotNull("nope"))
    } finally SnapshotTable.drop(t)
  }

  test("multi-action ALTER mixing nullability with a failing change commits NOTHING") {
    val catRoot = java.nio.file.Files.createTempDirectory("graft_cons_atomic_")
    spark.conf.set("spark.sql.catalog.consatomic", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.consatomic.root", catRoot.toString)
    val t = new SnapshotTable(spark, catRoot.resolve("d").toString)
    try {
      t.commit(Seq((1L, Some(1.0)), (2L, Some(2.0))).toDF("k", "v"))
      t.setNotNull("v")
      val v = t.currentVersion
      // DROP NOT NULL (valid alone) + an invalid rename in ONE call:
      // the old per-change path would publish the nullability commit
      // before the rename validated — now nothing may publish
      import org.apache.spark.sql.connector.catalog.{Identifier, TableChange}
      val cat = spark.sessionState.catalogManager.catalog("consatomic")
        .asInstanceOf[GraftCatalog]
      val ident = Identifier.of(Array.empty, "d")
      rejects("no column")(cat.alterTable(ident,
        TableChange.updateColumnNullability(Array("v"), true),
        TableChange.renameColumn(Array("nope"), "w")))
      assert(t.currentVersion == v, "partial ALTER published a commit")
      assert(t.constraints == Map("__notnull_v" -> "v IS NOT NULL"),
        "nullability half leaked out of a failed ALTER")
      // two nullability changes are atomic among themselves too: the
      // second failing (nonexistent column) must roll back the first
      rejects("no column")(cat.alterTable(ident,
        TableChange.updateColumnNullability(Array("v"), true),
        TableChange.updateColumnNullability(Array("nope"), false)))
      assert(t.constraints == Map("__notnull_v" -> "v IS NOT NULL"))
      // the happy path lands BOTH halves in ONE commit
      cat.alterTable(ident,
        TableChange.updateColumnNullability(Array("v"), true),
        TableChange.addColumn(Array("w"), org.apache.spark.sql.types.LongType))
      assert(t.currentVersion == v + 1, "mixed ALTER must be one commit")
      assert(t.constraints.isEmpty)
      assert(t.read().columns.contains("w"))
      // DROP NOT NULL a + RENAME a composes (the drop clears the
      // reference the rename would otherwise trip on)...
      t.setNotNull("v")
      cat.alterTable(ident,
        TableChange.updateColumnNullability(Array("v"), true),
        TableChange.renameColumn(Array("v"), "v2"))
      assert(t.constraints.isEmpty)
      assert(t.read().columns.contains("v2"))
      // ...while SET NOT NULL a + RENAME a refuses loudly
      rejects("constraint")(cat.alterTable(ident,
        TableChange.updateColumnNullability(Array("v2"), false),
        TableChange.renameColumn(Array("v2"), "v3")))
    } finally {
      spark.sql("DROP TABLE IF EXISTS consatomic.d")
      SnapshotTable.deleteRecursively(catRoot)
    }
  }
}
