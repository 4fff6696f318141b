package graft.tables

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** TYPE WIDENING (Delta's typeWidening): `widenColumn` promotes a
  * column's declared type along a lossless lane (byte→short→int→long,
  * float→double, byte/short/int→double) as a METADATA-ONLY commit —
  * no data file rewritten; pre-widen files keep their narrower
  * physical type and every read path promotes up on decode. */
class TypeWideningSpec extends SparkSpec {
  import spark.implicits._

  test("int->long and float->double widen metadata-only; both eras decode everywhere") {
    val t = SnapshotTable.temp(spark, "graft_widen_basic_")
    try {
      t.commit(Seq((1, 1.5f), (2, 2.5f)).toDF("k", "v")) // int, float
      val filesBefore = java.nio.file.Files.walk(java.nio.file.Paths.get(t.root))
        .filter(p => p.toString.endsWith(".parquet")).count()
      t.widenColumn("k", LongType)
      t.widenColumn("v", DoubleType)
      val filesAfter = java.nio.file.Files.walk(java.nio.file.Paths.get(t.root))
        .filter(p => p.toString.endsWith(".parquet")).count()
      assert(filesAfter == filesBefore, "widen rewrote data")
      // post-widen append: values beyond the old type's range
      assert(t.appendOnce(Seq((6000000000L, 9.25d)).toDF("k", "v"), 0L).isDefined)
      // instance read (Spark parquet scan under the widened schema)
      val got = t.read().as[(Long, Double)].collect().toSeq.sorted
      assert(got == Seq((1L, 1.5), (2L, 2.5), (6000000000L, 9.25)), got.toString)
      // DSv2 scan (vectorized columnar path)
      val viaDsv2 = spark.read.format("graft-table").option("path", t.root).load()
        .as[(Long, Double)].collect().toSeq.sorted
      assert(viaDsv2 == got, viaDsv2.toString)
      // streaming source over the same files
      val sink = "widen_stream_sink"
      val q = spark.readStream.format("graft-table").option("path", t.root).load()
        .writeStream.format("memory").queryName(sink).outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      val viaStream = spark.table(sink).as[(Long, Double)].collect().toSeq.sorted
      spark.catalog.dropTempView(sink)
      assert(viaStream == got, viaStream.toString)
      // time travel: v1 keeps its own narrower schema
      assert(t.read(1L).schema("k").dataType == IntegerType)
      assert(t.read(1L).schema("v").dataType == FloatType)
    } finally SnapshotTable.drop(t)
  }

  test("narrowing and cross-family changes refuse loudly") {
    val t = SnapshotTable.temp(spark, "graft_widen_refuse_")
    try {
      t.commit(Seq((1L, "a")).toDF("k", "s"))
      intercept[IllegalArgumentException] { t.widenColumn("k", IntegerType) }
      intercept[IllegalArgumentException] { t.widenColumn("s", LongType) }
      intercept[IllegalArgumentException] { t.widenColumn("k", DoubleType) } // long->double is lossy
      assert(t.currentVersion == 1L)
    } finally SnapshotTable.drop(t)
  }

  test("SQL surface: ALTER TABLE ALTER COLUMN TYPE widens; inserts beyond the old range land") {
    val catRoot = java.nio.file.Files.createTempDirectory("graft_widen_cat_")
    spark.conf.set("spark.sql.catalog.widencat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.widencat.root", catRoot.toString)
    try {
      spark.sql("CREATE TABLE widencat.t (k INT, v DOUBLE)")
      spark.sql("INSERT INTO widencat.t VALUES (1, 1.0), (2, 2.0)")
      spark.sql("ALTER TABLE widencat.t ALTER COLUMN k TYPE BIGINT")
      spark.sql("INSERT INTO widencat.t VALUES (6000000000, 3.0)")
      val got = spark.sql("SELECT k, v FROM widencat.t ORDER BY k")
        .as[(Long, Double)].collect().toSeq
      assert(got == Seq((1L, 1.0), (2L, 2.0), (6000000000L, 3.0)), got.toString)
      // narrowing refuses through SQL too
      intercept[Exception] {
        spark.sql("ALTER TABLE widencat.t ALTER COLUMN k TYPE INT")
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS widencat.t")
      SnapshotTable.deleteRecursively(catRoot)
    }
  }

  test("appendOnce with the pre-widen width still lands; the committed type wins") {
    val t = SnapshotTable.temp(spark, "graft_widen_append_")
    try {
      t.commit(Seq((1, 1.0)).toDF("k", "v"))
      t.widenColumn("k", LongType)
      // a straggler writer still producing INT batches: accepted, the
      // manifest keeps LONG, the narrow file decodes up
      assert(t.appendOnce(Seq((2, 2.0)).toDF("k", "v"), 0L).isDefined)
      assert(t.read().schema("k").dataType == LongType)
      assert(t.read().as[(Long, Double)].collect().toSeq.sorted ==
        Seq((1L, 1.0), (2L, 2.0)))
      // but a non-widenable type change refuses
      intercept[IllegalArgumentException] {
        t.appendOnce(Seq(("x", 3.0)).toDF("k", "v"), 1L)
      }
    } finally SnapshotTable.drop(t)
  }

  test("widen composes with rename and DV deletes") {
    val t = SnapshotTable.temp(spark, "graft_widen_compose_")
    try {
      t.commit(Seq((1, 1.0), (2, 2.0), (3, 3.0)).toDF("k", "v"))
      t.renameColumn("k", "id")
      t.widenColumn("id", LongType)
      t.delete(col("id") === 2L)
      assert(t.appendOnce(Seq((7000000000L, 7.0)).toDF("id", "v"), 0L).isDefined)
      val got = t.read().select("id", "v").as[(Long, Double)].collect().toSeq.sorted
      assert(got == Seq((1L, 1.0), (3L, 3.0), (7000000000L, 7.0)), got.toString)
    } finally SnapshotTable.drop(t)
  }
}
