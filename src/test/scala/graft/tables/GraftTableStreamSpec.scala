package graft.tables

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** [[GraftTableSource]]: the SnapshotTable commit log as a Structured
  * Streaming source — offset = committed version, one partition per
  * added file, exactly-once across restarts (durable replayable
  * offsets), full primitive-type decode fidelity.
  */
class GraftTableStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tempTable(name: String): SnapshotTable =
    SnapshotTable.temp(spark, s"graft_stream_src_${name}_")

  test("streams a live append chain; tumbling counts match the batch twin") {
    val t = tempTable("tumble")
    try {
      val b = graft.Tables.orders(spark, sf)
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("v"))
      t.commit(b.filter(col("k") % 2 === 0))
      val stream = spark.readStream.format("graft-table")
        .option("path", t.root).load()
        .groupBy(pmod(col("k"), lit(10L)).as("bucket"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("total"))
      val q = stream.writeStream.format("memory").queryName("gt_tumble")
        .outputMode("complete").start()
      q.processAllAvailable()
      // LIVE append while the query runs: the next trigger must pick up
      // exactly the appended files
      t.appendOnce(b.filter(col("k") % 2 === 1), 0L)
      q.processAllAvailable()
      q.stop()
      val got = spark.table("gt_tumble").orderBy("bucket").collect().toSeq
      val expect = b.groupBy(pmod(col("k"), lit(10L)).as("bucket"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("total"))
        .orderBy("bucket").collect().toSeq
      assert(got == expect)
    } finally SnapshotTable.drop(t)
  }

  test("restart resumes from the checkpointed version: exactly-once delivery") {
    val t = tempTable("restart")
    val ckpt = Files.createTempDirectory("graft_gt_ckpt_").toString
    try {
      t.commit(Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v"))
      t.appendOnce(Seq((3L, 3.0)).toDF("k", "v"), 0L)
      val delivered = java.util.concurrent.ConcurrentHashMap.newKeySet[(Long, Long)]()
      def run(): Unit = {
        val q = spark.readStream.format("graft-table").option("path", t.root).load()
          .writeStream.option("checkpointLocation", ckpt)
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
            batch.select("k").as[Long].collect().foreach(k => delivered.add((id, k)))
            ()
          }
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      run()
      import scala.jdk.CollectionConverters._
      assert(delivered.asScala.map(_._2).toSet == Set(1L, 2L, 3L))
      val afterFirst = delivered.size()
      // restart with nothing new: NOTHING redelivered
      run()
      assert(delivered.size() == afterFirst,
        s"restart redelivered rows: ${delivered.asScala.toSeq.sorted}")
      // append two more versions, restart: exactly the new rows arrive
      t.appendOnce(Seq((4L, 4.0)).toDF("k", "v"), 1L)
      t.appendOnce(Seq((5L, 5.0)).toDF("k", "v"), 2L)
      run()
      assert(delivered.asScala.map(_._2).toSet == Set(1L, 2L, 3L, 4L, 5L))
      assert(delivered.asScala.count(p => p._2 == 4L || p._2 == 5L) == 2,
        "appended rows must arrive exactly once")
    } finally SnapshotTable.drop(t)
  }

  test("startingVersion=latest skips history; plan emits one partition per added file") {
    val t = tempTable("latest")
    try {
      t.commit(Seq((1L, 1.0)).toDF("k", "v"))
      val startAt = t.currentVersion
      val q = spark.readStream.format("graft-table")
        .option("path", t.root).option("startingVersion", "latest").load()
        .writeStream.format("memory").queryName("gt_latest").start()
      q.processAllAvailable()
      assert(spark.table("gt_latest").count() == 0, "history must be skipped")
      t.appendOnce(Seq((2L, 2.0), (3L, 3.0)).toDF("k", "v"), 0L)
      q.processAllAvailable()
      q.stop()
      assert(spark.table("gt_latest").select("k").as[Long].collect().toSet == Set(2L, 3L))
      // partition granularity: the micro-batch plan is one partition
      // per file added in (start, end] — untouched history never re-read
      val stream = new GraftTableMicroBatchStream(t.root, "0",
        SnapshotTable.schemaAt(java.nio.file.Paths.get(t.root), t.currentVersion))
      val parts = stream.planInputPartitions(
        GraftTableOffset(startAt), GraftTableOffset(t.currentVersion))
      val added = new SnapshotTable(spark, t.root).addedFiles(startAt, t.currentVersion)
      assert(parts.length == added.size && parts.nonEmpty)
      assert(parts.map(_.asInstanceOf[GraftTableFilePartition].absPath).forall(p =>
        added.exists(rel => p.endsWith(rel))))
      assert(stream.planInputPartitions(
        GraftTableOffset(t.currentVersion), GraftTableOffset(t.currentVersion)).isEmpty)
    } finally SnapshotTable.drop(t)
  }

  test("readChangeFeed streams the row-level feed through merges, appends, compaction") {
    val t = tempTable("cdcfeed")
    try {
      val base = (0L until 100L).map(k => (k, k.toDouble)).toDF("k", "v")
      t.commitBucketed(base, "k", 4)            // v1 (tracked? no — but start after it)
      val startAt = t.currentVersion
      t.mergeBucketed(Seq((3L, 30.0), (500L, 5.0)).toDF("k", "v"), "k") // v2
      t.appendOnce(Seq((600L, 6.0)).toDF("k", "v"), 0L)                 // v3
      t.compact(2)                                                      // v4
      val q = spark.readStream.format("graft-table")
        .option("path", t.root).option("readChangeFeed", "true")
        .option("startingVersion", startAt.toString).load()
        .writeStream.format("memory").queryName("gt_cdc").start()
      q.processAllAvailable(); q.stop()
      val got = spark.table("gt_cdc").collect()
        .map(r => (r.getString(2), r.getLong(0), r.getDouble(1))).toSet
      assert(got == Set(
        ("update_preimage", 3L, 3.0),
        ("update_postimage", 3L, 30.0),
        ("insert", 500L, 5.0),
        ("insert", 600L, 6.0)), got.toString)
      // the streamed feed matches the batch rowChangesBetween exactly
      val batch = t.rowChangesBetween(startAt, t.currentVersion).collect()
        .map(r => (r.getString(2), r.getLong(0), r.getDouble(1))).toSet
      assert(got == batch)
    } finally SnapshotTable.drop(t)
  }

  test("sink: exactly-once appends across restarts; per-query ledger scoping") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t = tempTable("sink")
    val ckpt = Files.createTempDirectory("graft_sink_ckpt_").toString
    try {
      val ms = MemoryStream[(Long, Double)]
      def start() = ms.toDF().toDF("k", "v").writeStream
        .format("graft-table").option("path", t.root)
        .option("checkpointLocation", ckpt).start()
      val q = start()
      ms.addData((1L, 1.0), (2L, 2.0))
      q.processAllAvailable()
      ms.addData((3L, 3.0))
      q.processAllAvailable()
      q.stop()
      assert(t.read().orderBy("k").as[(Long, Double)].collect().toSeq ==
        Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)))
      val vAfter = t.currentVersion
      // restart from the same checkpoint with nothing new: no
      // duplicate versions, no duplicate rows
      val q2 = start()
      q2.processAllAvailable(); q2.stop()
      assert(t.currentVersion == vAfter && t.read().count() == 3)
      // a DIFFERENT query (own checkpoint) also starts at epoch 0:
      // the per-query ledger must append, not dedup it away
      val ms2 = MemoryStream[(Long, Double)]
      val q3 = ms2.toDF().toDF("k", "v").writeStream
        .format("graft-table").option("path", t.root)
        .option("checkpointLocation",
          Files.createTempDirectory("graft_sink_ckpt2_").toString).start()
      ms2.addData((4L, 4.0))
      q3.processAllAvailable(); q3.stop()
      assert(t.read().orderBy("k").as[(Long, Double)].collect().toSeq ==
        Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0)))
      // replayed epoch via the ledger API: publishes nothing
      assert(t.read(1L).count() == 2) // version history intact
    } finally SnapshotTable.drop(t)
  }

  test("table-to-table streaming pipeline: graft-table source into graft-table sink") {
    val t1 = tempTable("pipe_src")
    val t2 = tempTable("pipe_dst")
    try {
      val b = graft.Tables.orders(spark, sf)
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("v"))
      t1.commit(b.filter(col("k") % 2 === 0))
      t1.appendOnce(b.filter(col("k") % 2 === 1), 0L)
      val q = spark.readStream.format("graft-table").option("path", t1.root).load()
        .filter(col("k") % 3 === 0)
        .withColumn("v", col("v") * 2)
        .writeStream.format("graft-table").option("path", t2.root)
        .option("checkpointLocation",
          Files.createTempDirectory("graft_pipe_ckpt_").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      val got = t2.read().orderBy("k").as[(Long, Double)].collect().toSeq
      val want = b.filter(col("k") % 3 === 0)
        .select(col("k"), col("v") * 2)
        .orderBy("k").as[(Long, Double)].collect().toSeq
      assert(got == want)
    } finally { SnapshotTable.drop(t1); SnapshotTable.drop(t2) }
  }

  test("startingTimestamp resolves to the first commit at or after it (stream + batch CDF)") {
    val t = tempTable("start_ts")
    try {
      // pinned commit clock: three appends at ts 1000/2000/3000
      t.nowMs = () => 1000L
      assert(t.appendOnce(Seq((1L, 1.0)).toDF("k", "v"), 0L).isDefined)
      t.nowMs = () => 2000L
      assert(t.appendOnce(Seq((2L, 2.0)).toDF("k", "v"), 1L).isDefined)
      t.nowMs = () => 3000L
      assert(t.appendOnce(Seq((3L, 3.0)).toDF("k", "v"), 2L).isDefined)
      // streaming from ts=2000: v2 (committed AT 2000) and v3 deliver
      val sink = "gt_start_ts"
      val q = spark.readStream.format("graft-table").option("path", t.root)
        .option("startingTimestamp", "2000").load()
        .writeStream.format("memory").queryName(sink).outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val got = spark.table(sink).select("k").as[Long].collect().toSeq.sorted
      spark.catalog.dropTempView(sink)
      assert(got == Seq(2L, 3L), got.toString)
      // change-feed twin through the batch surface
      val cdf = spark.read.format("graft-table").option("path", t.root)
        .option("readChangeFeed", "true").option("startingTimestamp", "2000").load()
        .select("k").as[Long].collect().toSeq.sorted
      assert(cdf == Seq(2L, 3L), cdf.toString)
      // a timestamp before every commit streams the whole log
      val cdfAll = spark.read.format("graft-table").option("path", t.root)
        .option("readChangeFeed", "true").option("startingTimestamp", "500").load()
        .count()
      assert(cdfAll == 3L)
    } finally SnapshotTable.drop(t)
  }

  test("decodes every supported primitive type identically to the batch reader") {
    val t = tempTable("types")
    try {
      val df = spark.sql(
        """SELECT * FROM VALUES
          |  (1, CAST(1 AS BIGINT), CAST(1.5 AS FLOAT), 2.5D, true, 'one',
          |   CAST('abc' AS BINARY), DATE'2024-03-01', TIMESTAMP'2024-03-01 12:34:56.789012'),
          |  (2, CAST(NULL AS BIGINT), CAST(NULL AS FLOAT), NULL, NULL, NULL,
          |   NULL, NULL, NULL)
          |AS t(i, l, f, d, b, s, bin, dt, ts)""".stripMargin)
      t.commit(df)
      val q = spark.readStream.format("graft-table").option("path", t.root).load()
        .writeStream.format("memory").queryName("gt_types").start()
      q.processAllAvailable(); q.stop()
      val streamed = spark.table("gt_types").orderBy("i").collect().toSeq
      val batch = t.read().orderBy("i").collect().toSeq
      assert(streamed.map(_.toSeq.map {
        case a: Array[Byte] => a.toSeq; case x => x
      }) == batch.map(_.toSeq.map {
        case a: Array[Byte] => a.toSeq; case x => x
      }), s"streamed=$streamed batch=$batch")
    } finally SnapshotTable.drop(t)
  }

  test("one-level primitive arrays stream identically to the batch read") {
    val t = tempTable("arrays")
    try {
      // embedding-style columns: float/long/string arrays, incl. an
      // empty array and a NULL array
      t.commit(spark.sql(
        """SELECT * FROM VALUES
          |  (1, array(cast(0.5 as float), cast(-1.25 as float)), array(7L, 8L), array('a', 'b')),
          |  (2, array(cast(2.0 as float)), array(), array('c')),
          |  (3, cast(NULL as array<float>), array(9L), cast(NULL as array<string>))
          |AS t(i, emb, ls, ss)""".stripMargin))
      val q = spark.readStream.format("graft-table").option("path", t.root).load()
        .writeStream.format("memory").queryName("gt_arrays").start()
      q.processAllAvailable(); q.stop()
      val norm = (rows: Seq[org.apache.spark.sql.Row]) => rows.map(_.toSeq)
      val streamed = norm(spark.table("gt_arrays").orderBy("i").collect().toSeq)
      val batch = norm(t.read().orderBy("i").collect().toSeq)
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
    } finally SnapshotTable.drop(t)
  }

  test("deeper-nested columns are rejected at schema inference, not mis-read") {
    val t = tempTable("nested")
    try {
      t.commit(spark.sql("SELECT 1 AS k, array(struct(1 AS a)) AS xs"))
      val e = intercept[IllegalArgumentException] {
        spark.readStream.format("graft-table").option("path", t.root).load()
      }
      assert(e.getMessage.contains("does not support column xs"))
    } finally SnapshotTable.drop(t)
  }
}
