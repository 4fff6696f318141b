package graft.tables

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Column mapping (Delta "name mode"): RENAME / DROP / ADD COLUMN as
  * METADATA-ONLY commits — no data file touched, renamed columns
  * resolve in pre-rename files through pinned physical names, drops
  * survive time travel, and a re-added name can never resurrect
  * dropped data (the retired-name guard). */
class ColumnMappingSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(tag: String): SnapshotTable =
    SnapshotTable.temp(spark, s"graft_cmap_${tag}_")

  private def kv(rows: (Long, Double)*) = rows.toDF("k", "v")

  test("rename is metadata-only: old files resolve, old versions keep old names") {
    val t = freshTable("rename")
    try {
      t.commit(kv(1L -> 1.0, 2L -> 2.0, 3L -> 3.0))
      val filesBefore = java.nio.file.Files.walk(java.nio.file.Paths.get(t.root))
        .filter(p => p.toString.endsWith(".parquet")).count()
      val v2 = t.renameColumn("v", "price")
      // no data file written by the rename
      val filesAfter = java.nio.file.Files.walk(java.nio.file.Paths.get(t.root))
        .filter(p => p.toString.endsWith(".parquet")).count()
      assert(filesAfter == filesBefore)
      // current read surfaces the new name with the old data
      val got = t.read().select("k", "price").as[(Long, Double)].collect().sorted
      assert(got.toSeq == Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)))
      // time travel: v1 still reads under the OLD name
      assert(t.read(1L).columns.toSeq == Seq("k", "v"))
      assert(t.read(v2).columns.toSeq == Seq("k", "price"))
    } finally SnapshotTable.drop(t)
  }

  test("appends after a rename compose: new files live beside pre-rename files") {
    val t = freshTable("append")
    try {
      t.commit(kv(1L -> 1.0, 2L -> 2.0))
      t.renameColumn("v", "price")
      // append uses the CURRENT logical names
      assert(t.appendOnce(Seq((3L, 3.0)).toDF("k", "price"), batchId = 7L).isDefined)
      val got = t.read().select("k", "price").as[(Long, Double)].collect().sorted
      assert(got.toSeq == Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)))
      // both eras of files agree through the DSv2 scan too
      val viaDsv2 = spark.read.format("graft-table").option("path", t.root).load()
        .select("k", "price").as[(Long, Double)].collect().sorted
      assert(viaDsv2.toSeq == Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)))
    } finally SnapshotTable.drop(t)
  }

  test("DV delete and update work across the mapping") {
    val t = freshTable("dml")
    try {
      t.commit(kv(1L -> 1.0, 2L -> 2.0, 3L -> 3.0, 4L -> 4.0))
      t.renameColumn("v", "price")
      t.delete(col("price") === 2.0)
      t.update(col("k") === 3L, Map("price" -> lit(30.0)))
      val got = t.read().select("k", "price").as[(Long, Double)].collect().sorted
      assert(got.toSeq == Seq((1L, 1.0), (3L, 30.0), (4L, 4.0)))
      // the change feed across the mapped update carries exact images
      val cdc = t.rowChangesBetween(3L, 4L)
        .select(col("k"), col("price"), col(SnapshotTable.ChangeTypeCol))
        .as[(Long, Double, String)].collect().toSeq.sorted
      assert(cdc == Seq((3L, 3.0, "update_preimage"), (3L, 30.0, "update_postimage")))
    } finally SnapshotTable.drop(t)
  }

  test("drop survives time travel; re-added name cannot resurrect dropped data") {
    val t = freshTable("drop")
    try {
      t.commit(Seq((1L, 1.0, "a"), (2L, 2.0, "b")).toDF("k", "v", "tag"))
      val vDrop = t.dropColumn("tag")
      assert(t.read().columns.toSeq == Seq("k", "v"))
      // time travel: the dropped column still reads at v1
      assert(t.read(1L).select("tag").as[String].collect().sorted.toSeq == Seq("a", "b"))
      // re-add the SAME name: must surface NULL, not the old bytes
      t.addColumn("tag", org.apache.spark.sql.types.StringType)
      val vals = t.read().select("tag").collect().map(_.isNullAt(0))
      assert(vals.length == 2 && vals.forall(identity),
        "re-added column resurrected dropped data")
      // and an appendEvolved re-add behaves the same on fresh rows
      assert(t.read(vDrop).columns.toSeq == Seq("k", "v"))
    } finally SnapshotTable.drop(t)
  }

  test("SQL surface: ALTER TABLE RENAME/DROP/ADD COLUMN end-to-end") {
    val catRoot = java.nio.file.Files.createTempDirectory("graft_cmap_cat_")
    spark.conf.set("spark.sql.catalog.cmapcat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.cmapcat.root", catRoot.toString)
    try {
      spark.sql("CREATE TABLE cmapcat.t (k BIGINT, v DOUBLE, tag STRING)")
      spark.sql("INSERT INTO cmapcat.t VALUES (1, 1.0, 'a'), (2, 2.0, 'b')")
      spark.sql("ALTER TABLE cmapcat.t RENAME COLUMN v TO price")
      assert(spark.sql("SELECT sum(price) FROM cmapcat.t").head.getDouble(0) == 3.0)
      spark.sql("ALTER TABLE cmapcat.t DROP COLUMN tag")
      assert(spark.sql("SELECT * FROM cmapcat.t").columns.toSeq == Seq("k", "price"))
      spark.sql("ALTER TABLE cmapcat.t ADD COLUMN tag STRING")
      val tags = spark.sql("SELECT tag FROM cmapcat.t").collect()
      assert(tags.length == 2 && tags.forall(_.isNullAt(0)))
      // DML composes with the mapping through SQL too
      spark.sql("UPDATE cmapcat.t SET price = price * 10 WHERE k = 1")
      assert(spark.sql("SELECT sum(price) FROM cmapcat.t").head.getDouble(0) == 12.0)
      // and time travel still serves v2 under the ORIGINAL names
      assert(spark.sql("SELECT * FROM cmapcat.t VERSION AS OF 2").columns.toSeq ==
        Seq("k", "v", "tag"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS cmapcat.t")
      SnapshotTable.deleteRecursively(catRoot)
    }
  }

  test("appendEvolved after a rename: mapping survives, the added column composes") {
    val t = freshTable("evolve_after_rename")
    try {
      t.commit(kv(1L -> 1.0, 2L -> 2.0))
      t.renameColumn("v", "price")
      assert(t.appendEvolved(Seq((3L, 3.0, 7L)).toDF("k", "price", "flag"), 0L).isDefined)
      val got = t.read().select("k", "price", "flag")
        .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long]).toSeq
      assert(got == Seq(Seq(1L, 1.0, null), Seq(2L, 2.0, null), Seq(3L, 3.0, 7L)))
      // pre-rename files still resolve price through the pinned phys
      // name even though the schema also evolved since
      assert(t.read().agg(sum(col("price"))).head.getDouble(0) == 6.0)
    } finally SnapshotTable.drop(t)
  }

  test("SQL DML change feed carries exact images across a rename") {
    val catRoot = java.nio.file.Files.createTempDirectory("graft_cmap_cdc_")
    spark.conf.set("spark.sql.catalog.cmapcdc", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.cmapcdc.root", catRoot.toString)
    try {
      spark.sql("CREATE TABLE cmapcdc.t (k BIGINT, v DOUBLE)")
      spark.sql("INSERT INTO cmapcdc.t VALUES (1, 1.0), (2, 2.0), (3, 3.0)")
      spark.sql("ALTER TABLE cmapcdc.t RENAME COLUMN v TO price")
      spark.sql("UPDATE cmapcdc.t SET price = price * 10 WHERE k = 2")
      val t = new SnapshotTable(spark, catRoot.resolve("t").toString)
      val v = t.currentVersion
      val cdc = t.rowChangesBetween(v - 1, v)
        .select(col("k"), col("price"), col(SnapshotTable.ChangeTypeCol))
        .as[(Long, Double, String)].collect().toSeq.sorted
      assert(cdc == Seq((2L, 2.0, "update_preimage"), (2L, 20.0, "update_postimage")))
    } finally {
      spark.sql("DROP TABLE IF EXISTS cmapcdc.t")
      SnapshotTable.deleteRecursively(catRoot)
    }
  }

  test("readChangeFeed decodes post-rename appends under the mapping (batch + streaming)") {
    val t = freshTable("cdf_rename")
    try {
      t.commit(kv(1L -> 1.0))
      t.renameColumn("v", "price") // v2: price pinned to physical "v"
      // v3 append: staged under the PHYSICAL name — the change feed's
      // append-derived insert rows must still decode `price`, not NULL
      assert(t.appendOnce(Seq((2L, 2.0)).toDF("k", "price"), 0L).isDefined)
      val feed = spark.read.format("graft-table").option("path", t.root)
        .option("readChangeFeed", "true")
        .option("startingVersion", "2").option("endingVersion", "3").load()
        .select(col("k"), col("price"), col(SnapshotTable.ChangeTypeCol))
        .as[(Long, Double, String)].collect().toSeq
      assert(feed == Seq((2L, 2.0, "insert")), feed.toString)
      // streaming twin: the MicroBatchStream reader factory carries
      // the same per-partition mapping
      val sink = "cmap_cdf_stream"
      val q = spark.readStream.format("graft-table").option("path", t.root)
        .option("readChangeFeed", "true").option("startingVersion", "2").load()
        .writeStream.format("memory").queryName(sink).outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      val got = spark.table(sink).select("k", "price")
        .as[(Long, Double)].collect().toSeq
      spark.catalog.dropTempView(sink)
      assert(got == Seq((2L, 2.0)), got.toString)
    } finally SnapshotTable.drop(t)
  }

  test("multi-action ALTER TABLE is atomic: a failing later change commits nothing") {
    val catRoot = java.nio.file.Files.createTempDirectory("graft_cmap_atomic_")
    spark.conf.set("spark.sql.catalog.cmapatomic", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.cmapatomic.root", catRoot.toString)
    try {
      spark.sql("CREATE TABLE cmapatomic.t (k BIGINT, v DOUBLE)")
      spark.sql("INSERT INTO cmapatomic.t VALUES (1, 1.0)")
      val t = new SnapshotTable(spark, catRoot.resolve("t").toString)
      val before = t.currentVersion
      // second added column collides with an existing one: the whole
      // statement must refuse with NOTHING committed (previously the
      // first column landed as a durable partial commit)
      intercept[Exception] {
        spark.sql("ALTER TABLE cmapatomic.t ADD COLUMNS (x INT, k INT)")
      }
      assert(t.currentVersion == before, "partial ALTER committed")
      assert(t.read().columns.toSeq == Seq("k", "v"))
      // positioned ADD COLUMN refuses loudly instead of silently
      // appending at the tail
      val e = intercept[Exception] {
        spark.sql("ALTER TABLE cmapatomic.t ADD COLUMNS (y INT FIRST)")
      }
      assert(e.getMessage.contains("positioned") ||
        Option(e.getCause).exists(_.getMessage.contains("positioned")), e.getMessage)
      assert(t.currentVersion == before)
      // a VALID multi-action ADD commits exactly once, atomically
      spark.sql("ALTER TABLE cmapatomic.t ADD COLUMNS (x INT, y STRING)")
      assert(t.currentVersion == before + 1)
      assert(t.read().columns.toSeq == Seq("k", "v", "x", "y"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS cmapatomic.t")
      SnapshotTable.deleteRecursively(catRoot)
    }
  }

  test("stats pruning keeps working through a rename (filters translate to phys keys)") {
    val t = freshTable("stats")
    try {
      t.commitClustered((1L to 1000L).map(k => (k, k * 1.0)).toDF("k", "v"),
        "k", nFiles = 8)
      t.renameColumn("k", "id")
      // DSv2 point read on the NEW name must still prune by the
      // commit-era range stats
      val df = spark.read.format("graft-table").option("path", t.root).load()
        .filter(col("id") === 500L)
      val scans = df.queryExecution.executedPlan.collectLeaves()
      assert(df.collect().map(_.getLong(0)).toSeq == Seq(500L))
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters") || plan.contains("graft-table"))
      // metadata-only agg pushdown also translates: count(*) + min/max
      // over the renamed cluster key
      val agg = spark.read.format("graft-table").option("path", t.root).load()
        .agg(count(lit(1)), min(col("id")), max(col("id"))).head
      assert(agg.getLong(0) == 1000L && agg.getLong(1) == 1L && agg.getLong(2) == 1000L)
    } finally SnapshotTable.drop(t)
  }
}
