package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** MemoryStream tests (SURVEY.md §5.4): streaming-vs-batch
  * equivalence on the events table, watermark late-row drop, and the
  * custom-state sessionizer. */
class StreamingSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def ts(min: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$min%02d:$sec%02d")

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String,
      mode: String = "append"): org.apache.spark.sql.DataFrame = {
    val q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable(); q.stop()
    spark.table(name)
  }

  test("streaming tumbling agg matches batch twin on real events") {
    import spark.implicits._
    val batch = graft.Tables.events(spark, sf)
    val rows = batch.as[Event].collect().toSeq
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Event]
    ms.addData(rows)
    val out = runToMemory(Streams.tumblingAgg(ms.toDF()), "tumble_out", "complete")
    val expected = graft.ops.StreamTwins.queries("q_stream_tumble")(spark, sf)
      .select("w_start", "event_type", "n")
    val got = out.select("w_start", "event_type", "n")
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }

  test("streaming sliding agg matches batch twin on real events") {
    import spark.implicits._
    val rows = graft.Tables.events(spark, sf).as[Event].collect().toSeq
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Event]
    ms.addData(rows)
    val out = runToMemory(Streams.slidingAgg(ms.toDF()), "slide_out", "complete")
    val expected = graft.ops.StreamTwins.queries("q_stream_slide")(spark, sf)
      .select("w_start", "event_type", "n")
    val got = out.select("w_start", "event_type", "n")
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }

  test("watermark drops late rows in append mode") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Event]
    val df = Streams.tumblingAgg(ms.toDF())
    val q = df.writeStream.format("memory").queryName("late_out").outputMode("append").start()
    // batch 1: events at minute 0-4 (window [0,5)), then minute 40 to
    // push the watermark to 30 — finalizing window [0,5)
    ms.addData(Seq(
      Event(1, ts(0), 1, "click", 1.0, "{}"),
      Event(2, ts(4), 1, "click", 1.0, "{}")))
    q.processAllAvailable()
    ms.addData(Seq(Event(3, ts(40), 1, "click", 1.0, "{}")))
    q.processAllAvailable()
    // batch 2: a late event for the already-finalized [0,5) window
    ms.addData(Seq(Event(4, ts(1), 1, "click", 99.0, "{}")))
    q.processAllAvailable()
    // batch 3: advance watermark far enough to flush everything open
    ms.addData(Seq(Event(5, ts(59), 1, "click", 1.0, "{}")))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("late_out").collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(2))).toMap
    // window [0,5) was emitted with 2 events; the late event 4 did NOT
    // re-emit or bump it
    assert(out("2024-01-01 00:00:00.0") == 2L)
  }

  test("streaming dedup drops duplicate event_ids") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Event]
    ms.addData(Seq(
      Event(10, ts(0), 1, "click", 1.0, "{}"),
      Event(10, ts(0, 30), 1, "click", 1.0, "{}"),
      Event(11, ts(1), 2, "view", 2.0, "{}")))
    val out = runToMemory(Streams.dedupEvents(ms.toDF()), "dedup_out")
    assert(out.count() == 2)
    assert(out.select("event_id").as[Long].collect().toSet == Set(10L, 11L))
  }

  test("stateful sessionizer closes sessions on gaps and flushes idle state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = Streams.statefulSessions(ms.toDS()).toDF()
      .writeStream.format("memory").queryName("sess_out").outputMode("append").start()
    ms.addData(Seq(
      Event(1, ts(0), 7, "click", 1.0, "{}"),
      Event(2, ts(10), 7, "view", 1.0, "{}"),
      // 35-minute gap closes session 1 (2 events)
      Event(3, ts(45), 7, "click", 1.0, "{}"),
      // other user, single session left open for now
      Event(4, ts(0), 8, "click", 1.0, "{}")))
    q.processAllAvailable()
    val afterBatch1 = spark.table("sess_out").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(afterBatch1 == Set((7L, 2L)))
    // advance the watermark far past every open session's last+gap:
    // EventTimeTimeout must flush and evict users 7 and 8
    ms.addData(Seq(Event(5, Timestamp.valueOf("2024-01-01 03:00:00"), 9, "click", 1.0, "{}")))
    q.processAllAvailable()
    ms.addData(Seq(Event(6, Timestamp.valueOf("2024-01-01 03:01:00"), 9, "view", 1.0, "{}")))
    q.processAllAvailable()
    q.stop()
    val all = spark.table("sess_out").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(all.contains((7L, 1L)) && all.contains((8L, 1L)),
      s"idle sessions not flushed: $all")
  }

  test("transformWithState accumulates per-user totals across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val saved = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[Event]
      val q = Streams.runningTotals(ms.toDS()).toDF()
        .writeStream.format("memory").queryName("tws_out").outputMode("update").start()
      ms.addData(Seq(
        Event(1, ts(0), 1, "click", 2.0, "{}"),
        Event(2, ts(1), 1, "click", 3.0, "{}"),
        Event(3, ts(1), 2, "view", 10.0, "{}")))
      q.processAllAvailable()
      ms.addData(Seq(Event(4, ts(2), 1, "click", 5.0, "{}")))
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("tws_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      // batch 1 emitted (1, 2, 5.0) and (2, 1, 10.0); batch 2's state
      // CARRIED OVER from batch 1: (1, 3, 10.0)
      assert(rows.contains((1L, 2L, 5.0)))
      assert(rows.contains((2L, 1L, 10.0)))
      assert(rows.contains((1L, 3L, 10.0)), rows.mkString(","))
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming funnel stages converge to the batch q_funnel roll-up on shuffled input") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val saved = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // real events, deterministically SHUFFLED (hash order) and split
      // into 3 micro-batches: min-merge state must converge to the
      // batch conditional-min aggregate regardless of arrival order
      val rows = graft.Tables.events(spark, sf).as[Event].collect()
        .sortBy(e => java.util.Objects.hash(java.lang.Long.valueOf(e.event_id)) * 2654435761L)
      val ms = MemoryStream[Event]
      val q = Streams.funnelStages(ms.toDS()).toDF()
        .writeStream.format("memory").queryName("funnel_out").outputMode("update").start()
      rows.grouped((rows.length + 2) / 3).foreach { chunk =>
        ms.addData(chunk.toSeq); q.processAllAvailable()
      }
      q.stop()
      // latest state per user = per-column min over emitted rows
      // (stage timestamps only ever decrease; -1 = not reached → max)
      val last = spark.table("funnel_out")
        .groupBy("user_id")
        .agg(min(when(col("t_view") >= 0, col("t_view"))).as("t_view"),
          min(when(col("t_click") >= 0, col("t_click"))).as("t_click"),
          min(when(col("t_buy") >= 0, col("t_buy"))).as("t_buy"))
      val got = last.agg(
        count(lit(1)).as("n_users"),
        count(col("t_view")).as("n_view"),
        count(when(col("t_click") > col("t_view"), lit(1))).as("n_click_after_view"),
        count(when(col("t_buy") > col("t_click") && col("t_click") > col("t_view"),
          lit(1))).as("n_full_funnel")).head()
      val want = graft.SparkEntry.queries("q_funnel")(spark, sf).head()
      assert(got.getLong(1) == want.getAs[Long]("n_view"))
      assert(got.getLong(2) == want.getAs[Long]("n_click_after_view"))
      assert(got.getLong(3) == want.getAs[Long]("n_full_funnel"))
      // user count differs only by users with NO funnel event at all
      assert(got.getLong(0) <= want.getAs[Long]("n_users"))
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("incremental SCD2 folds only watermark-final prefixes and matches the batch change set") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val saved = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // 3 contiguous TIME slices (watermark semantics demand bounded
      // disorder), each slice internally hash-shuffled: the processor
      // must re-order within the allowed lateness
      val evs = graft.Tables.events(spark, sf).as[Event].collect()
        .sortBy(e => (e.ts.getTime, e.event_id))
      val maxTs = evs.map(_.ts.getTime).max
      val slices = evs.grouped((evs.length + 2) / 3).toSeq
        .map(_.sortBy(e => java.util.Objects.hash(java.lang.Long.valueOf(e.event_id)) * 2654435761L))
      val ms = MemoryStream[Event]
      val q = Streams.incrementalScd2(ms.toDS()).toDF()
        .writeStream.format("memory").queryName("scd2_out").outputMode("append").start()
      slices.foreach { s => ms.addData(s.toSeq); q.processAllAvailable() }
      // two sentinel batches: the first advances the watermark past
      // every real event, the second gives the per-key timers a batch
      // to fire in (watermark updates between batches)
      ms.addData(Seq(Event(-1, new Timestamp(maxTs + 3600 * 1000L), -1L, "view", 0.0, "{}")))
      q.processAllAvailable()
      ms.addData(Seq(Event(-2, new Timestamp(maxTs + 7200 * 1000L), -1L, "view", 0.0, "{}")))
      q.processAllAvailable()
      q.stop()
      val got = spark.table("scd2_out")
        .filter(col("user_id") >= 0)
        .select("user_id", "event_id", "state", "valid_from_us").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
      val want = graft.SparkEntry.queries("q_scd2")(spark, sf)
        .select("user_id", "event_id", "state", "valid_from").collect()
        .map { r =>
          val t = r.getTimestamp(3)
          (r.getLong(0), r.getLong(1), r.getString(2),
            t.getTime * 1000L + (t.getNanos / 1000L) % 1000L)
        }.toSet
      assert(got == want,
        s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)} " +
          s"(got ${got.size} vs want ${want.size})")
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("stream-static join enriches each micro-batch against the dim") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val ms = MemoryStream[Event]
    ms.addData(Seq(
      Event(1, ts(0), 1, "click", 1.0, "{}"),
      Event(2, ts(1), 2, "view", 2.0, "{}"),
      Event(3, ts(2), 9, "view", 3.0, "{}"))) // no dim row -> null tier
    val out = runToMemory(Streams.enrichEvents(ms.toDF(), dim), "ss_out")
    val tiers = out.select("event_id", "tier").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(tiers == Map(1L -> Some("gold"), 2L -> Some("basic"), 3L -> None))
  }

  test("stream-stream interval join matches the batch formulation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = graft.Tables.events(spark, sf).as[Event].collect().toSeq
    val ms = MemoryStream[Event]
    ms.addData(rows)
    val out = runToMemory(Streams.errorClickJoin(ms.toDF()), "ssj_out")
    val batch = Streams.errorClickJoin(graft.Tables.events(spark, sf))
    assert(out.count() == batch.count())
    assert(out.exceptAll(batch).isEmpty && batch.exceptAll(out).isEmpty)
  }

  test("q_join_range (window form) ≡ stream-stream interval join, per error") {
    // the registered batch query computes the same interval semantics
    // as Streams.errorClickJoin: clicks by the same user in the 10
    // minutes up to each error. Group the pair join by error and
    // compare counts (the inner join has no row for 0-click errors).
    import org.apache.spark.sql.functions._
    val viaJoin = Streams.errorClickJoin(graft.Tables.events(spark, sf))
      .groupBy(col("e_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaWindow = graft.SparkEntry.queries("q_join_range")(spark, sf)
      .filter(col("n_clicks") > 0)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(viaJoin == viaWindow,
      s"only-in-join: ${viaJoin.toSet -- viaWindow.toSet}; only-in-window: ${viaWindow.toSet -- viaJoin.toSet}")
    assert(viaWindow.nonEmpty)
  }

  test("interval-join click state survives a restart: post-restart errors still match pre-restart clicks") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // batch 1: two clicks then an error; batch 2 (after restart): an
    // error whose ONLY possible matches are batch-1 clicks — rows for
    // it exist iff the join's click buffer was restored from the
    // checkpoint, not rebuilt empty.
    val batch1 = Seq(
      Event(1, ts(0), 1, "click", 1.0, "{}"),
      Event(2, ts(5), 1, "click", 2.0, "{}"),
      Event(3, ts(6), 1, "error", 0.0, "{}"))
    val batch2 = Seq(Event(4, ts(8), 1, "error", 0.0, "{}"))

    // memory sink cannot recover an append-mode checkpoint; foreachBatch
    // is the restart-capable sink. Sets absorb a replayed final batch
    // (at-least-once), and the join output is duplicate-free by
    // construction (distinct (e_id, c_ts) pairs).
    def collectPairs(sink: java.util.concurrent.ConcurrentLinkedQueue[(Long, Timestamp)])(
        df: org.apache.spark.sql.DataFrame, id: Long): Unit =
      df.select("e_id", "c_ts").collect()
        .foreach(r => sink.add((r.getLong(0), r.getTimestamp(1))))

    // uninterrupted reference: same two batches, one query lifetime
    val refRows = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Timestamp)]()
    val msRef = MemoryStream[Event]
    val qRef = Streams.errorClickJoin(msRef.toDF()).writeStream
      .outputMode("append").foreachBatch(collectPairs(refRows) _).start()
    msRef.addData(batch1); qRef.processAllAvailable()
    msRef.addData(batch2); qRef.processAllAvailable()
    qRef.stop()

    val gotRows = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Timestamp)]()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ssj-ckpt").toString
    val ms = MemoryStream[Event]
    def start() = Streams.errorClickJoin(ms.toDF()).writeStream
      .outputMode("append").option("checkpointLocation", ckpt)
      .foreachBatch(collectPairs(gotRows) _).start()
    val q1 = start()
    ms.addData(batch1); q1.processAllAvailable(); q1.stop()
    val q2 = start()
    ms.addData(batch2); q2.processAllAvailable(); q2.stop()

    val got = gotRows.asScala.toSet
    val ref = refRows.asScala.toSet
    assert(got == ref, s"restarted join diverged: got $got vs $ref")
    // the cross-restart matches specifically: error 4 (min 8) joins
    // clicks at minutes 0 and 5, both buffered before the restart
    assert(got.filter(_._1 == 4L).map(_._2) == Set(ts(0), ts(5)))
  }

  test("incremental SCD2 resumes mid-stream: buffered events and last-state survive restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val saved = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // run 1 folds the early prefix (watermark reaches min 8) and
      // leaves event 4 (click@18) BUFFERED with last='click' in state.
      // After restart, click@18 must NOT emit a change (same state as
      // the restored 'last') and purchase@25 must — distinguishing a
      // restored state store from a rebuilt-empty one, which would
      // emit a spurious click@18 change.
      val run1 = Seq(
        Event(1, ts(0), 1, "view", 1.0, "{}"),
        Event(2, ts(2), 1, "click", 1.0, "{}"),
        Event(3, ts(4), 1, "click", 1.0, "{}"),
        Event(4, ts(18), 1, "click", 1.0, "{}"))
      val run2 = Seq(Event(5, ts(25), 1, "purchase", 1.0, "{}"))
      val sentinel = Seq(
        Event(-1, ts(50), -1L, "view", 0.0, "{}"),
        Event(-2, ts(55), -1L, "view", 0.0, "{}"))

      // foreachBatch sink (memory sink can't recover append-mode
      // checkpoints); Set collection absorbs a replayed batch, and
      // change rows are unique by event_id.
      def collectChanges(sink: java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, String)])(
          df: org.apache.spark.sql.DataFrame, id: Long): Unit =
        df.filter(col("user_id") >= 0).select("user_id", "event_id", "state")
          .collect().foreach(r => sink.add((r.getLong(0), r.getLong(1), r.getString(2))))

      // uninterrupted reference over the identical batch sequence
      val refRows = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, String)]()
      val msRef = MemoryStream[Event]
      val qRef = Streams.incrementalScd2(msRef.toDS()).toDF().writeStream
        .outputMode("append").foreachBatch(collectChanges(refRows) _).start()
      (Seq(run1, run2) ++ sentinel.map(Seq(_))).foreach { b =>
        msRef.addData(b); qRef.processAllAvailable()
      }
      qRef.stop()

      val gotRows = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, String)]()
      val ckpt = java.nio.file.Files.createTempDirectory("graft-scd2-ckpt").toString
      val ms = MemoryStream[Event]
      def start() = Streams.incrementalScd2(ms.toDS()).toDF().writeStream
        .outputMode("append").option("checkpointLocation", ckpt)
        .foreachBatch(collectChanges(gotRows) _).start()
      val q1 = start()
      ms.addData(run1); q1.processAllAvailable(); q1.stop()
      val q2 = start()
      (Seq(run2) ++ sentinel.map(Seq(_))).foreach { b =>
        ms.addData(b); q2.processAllAvailable()
      }
      q2.stop()

      val got = gotRows.asScala.toSet
      val ref = refRows.asScala.toSet
      assert(got == ref, s"restarted SCD2 diverged: got $got vs $ref")
      // exact change-set: view@0, click@2 — then click@18 is a
      // no-change against the RESTORED last state — then purchase@25
      assert(got == Set((1L, 1L, "view"), (1L, 2L, "click"), (1L, 5L, "purchase")))
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("funnel stage-min state survives a restart: post-restart emissions carry pre-restart minima") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val saved = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val run1 = Seq(
        Event(1, ts(0), 1, "view", 1.0, "{}"),
        Event(2, ts(5), 1, "click", 1.0, "{}"),
        Event(3, ts(2), 2, "view", 1.0, "{}"))
      // post-restart: user 1's purchase completes the funnel, and the
      // LATER view@20 must not move t_view off the restored minimum —
      // a rebuilt-empty store would emit t_view = 20min, so asserting
      // on the LAST emission per user (not a min over all emissions,
      // which run 1's rows would mask) distinguishes a restored state
      // store from a silently re-initialized one.
      val run2 = Seq(
        Event(4, ts(9), 1, "purchase", 1.0, "{}"),
        Event(5, ts(20), 1, "view", 1.0, "{}"),
        Event(6, ts(8), 2, "click", 1.0, "{}"))

      // last emission per user in batch order; a replayed batch
      // re-merges identical values (min-merge state is idempotent)
      type Sink = java.util.concurrent.ConcurrentHashMap[Long, (Long, (Long, Long, Long))]
      def collectLast(sink: Sink)(df: org.apache.spark.sql.DataFrame, id: Long): Unit =
        df.select("user_id", "t_view", "t_click", "t_buy").collect().foreach { r =>
          sink.merge(r.getLong(0), (id, (r.getLong(1), r.getLong(2), r.getLong(3))),
            (a, b) => if (a._1 >= b._1) a else b)
        }

      // uninterrupted reference over the identical batch sequence
      val refSink = new Sink()
      val msRef = MemoryStream[Event]
      val qRef = Streams.funnelStages(msRef.toDS()).toDF().writeStream
        .outputMode("update").foreachBatch(collectLast(refSink) _).start()
      Seq(run1, run2).foreach { b => msRef.addData(b); qRef.processAllAvailable() }
      qRef.stop()

      val gotSink = new Sink()
      val ckpt = java.nio.file.Files.createTempDirectory("graft-funnel-ckpt").toString
      val ms = MemoryStream[Event]
      def start() = Streams.funnelStages(ms.toDS()).toDF().writeStream
        .outputMode("update").option("checkpointLocation", ckpt)
        .foreachBatch(collectLast(gotSink) _).start()
      val q1 = start()
      ms.addData(run1); q1.processAllAvailable(); q1.stop()
      val q2 = start()
      ms.addData(run2); q2.processAllAvailable(); q2.stop()

      def fin(s: Sink) = s.asScala.map { case (u, (_, v)) => u -> v }.toMap
      assert(fin(gotSink) == fin(refSink),
        s"restarted funnel diverged: ${fin(gotSink)} vs ${fin(refSink)}")
      // exact converged stage minima (epoch micros): user 1 keeps the
      // PRE-restart view@0 and click@5 under the post-restart
      // purchase; user 2 keeps view@2 and gains click@8
      def us(min: Int) = ts(min).getTime * 1000L
      assert(fin(gotSink) == Map(
        1L -> ((us(0), us(5), us(9))),
        2L -> ((us(2), us(8), -1L))))
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming state survives a query restart from checkpoint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val ms = MemoryStream[Event]
    def start() = Streams.tumblingAgg(ms.toDF()).writeStream
      .format("memory").queryName("ckpt_out").outputMode("complete")
      .option("checkpointLocation", ckpt).start()
    // run 1: two events into window [0,5)
    val q1 = start()
    ms.addData(Seq(
      Event(1, ts(0), 1, "click", 1.0, "{}"),
      Event(2, ts(2), 1, "click", 1.0, "{}")))
    q1.processAllAvailable(); q1.stop()
    // run 2: SAME checkpoint — the restarted query must resume the
    // window's count at 2, not rebuild from zero
    val q2 = start()
    ms.addData(Seq(Event(3, ts(3), 1, "click", 1.0, "{}")))
    q2.processAllAvailable(); q2.stop()
    val n = spark.table("ckpt_out")
      .filter(col("w_start") === ts(0).toString.replace(".0", ""))
      .select("n").as[Long].head()
    assert(n == 3L, s"expected window count 3 after restart, got $n")
  }

  test("foreachBatch sink receives update-mode batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Event]
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val agg = ms.toDF().groupBy("event_type").count()
    val q = Streams.runForeachBatch(agg, (df, id) => { seen.add((id, df.count())) })
    ms.addData(Seq(Event(1, ts(0), 1, "click", 1.0, "{}"),
      Event(2, ts(1), 1, "view", 1.0, "{}")))
    q.processAllAvailable()
    ms.addData(Seq(Event(3, ts(2), 1, "click", 1.0, "{}")))
    q.processAllAvailable()
    q.stop()
    import scala.jdk.CollectionConverters._
    val batches = seen.asScala.toSeq.sortBy(_._1)
    assert(batches.head._2 == 2)          // first batch: click+view rows
    assert(batches.last._2 == 1)          // update mode: only the changed row
  }

  test("AvailableNow scheduled run is incremental across invocations") {
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("graft-anow").toString
    val in = s"$base/in"; val sink = s"$base/sink"; val ckpt = s"$base/ckpt"
    new java.io.File(in).mkdirs()
    // invocation 1: one events file
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      java.nio.file.Paths.get(s"$in/e1.parquet"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(in).schema
    val tsNorm = schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => timestamp_micros(expr("ts div 1000"))
      case _ => col("ts").cast("timestamp")
    }
    def src = spark.readStream.schema(schema).parquet(in)
      .withColumn("ts", tsNorm)
    ScheduledRunner.runOnce(src.filter(col("event_type") === "click"), sink, ckpt)
    val n1 = spark.read.parquet(sink).count()
    assert(n1 > 0)
    // invocation 2 with no new data: nothing re-processed (the
    // reference would re-pull the full snapshot here)
    ScheduledRunner.runOnce(src.filter(col("event_type") === "click"), sink, ckpt)
    assert(spark.read.parquet(sink).count() == n1)
    // invocation 3 with one new file: only the increment lands
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      java.nio.file.Paths.get(s"$in/e2.parquet"))
    ScheduledRunner.runOnce(src.filter(col("event_type") === "click"), sink, ckpt)
    assert(spark.read.parquet(sink).count() == 2 * n1)
  }

  test("streaming near-dup detection converges to the batch LSH pair set across batches") {
    import org.apache.spark.sql.functions._
    val sf01 = "/root/testdata/sf0.01"
    val base = java.nio.file.Files.createTempDirectory("graft-neardup").toString
    val in = s"$base/in"
    new java.io.File(in).mkdirs()
    // two arrival waves of the same corpus the batch query reads, so
    // cross-wave pairs can only come from bucket STATE
    val docs = spark.read.parquet(s"$sf01/documents.parquet")
    docs.filter(col("doc_id") % 2 === 0)
      .repartition(1).write.mode("append").parquet(in)
    docs.filter(col("doc_id") % 2 =!= 0)
      .repartition(1).write.mode("append").parquet(in)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val q = Streams.nearDupPairs(stream).writeStream
      .format("memory").queryName("neardup_stream").outputMode("append").start()
    val multiBatch = try {
      q.processAllAvailable()
      q.recentProgress.count(_.numInputRows > 0)
    } finally q.stop()
    assert(multiBatch >= 2, s"expected >=2 non-empty micro-batches, got $multiBatch")
    val got = spark.table("neardup_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = graft.SparkEntry.queries("q_dedup_near")(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty, "batch pair set empty — test is vacuous")
    assert(got == want, s"missed=${want -- got} extra=${got -- want}")
  }

  test("near-dup bucket state survives a restart: cross-restart pairs equal the uninterrupted run") {
    import org.apache.spark.sql.functions._
    val sf01 = "/root/testdata/sf0.01"
    val base = java.nio.file.Files.createTempDirectory("graft-neardup-rs").toString
    val in = s"$base/in"; val ckpt = s"$base/ckpt"
    new java.io.File(in).mkdirs()
    val docs = spark.read.parquet(s"$sf01/documents.parquet")
    // wave 1 (even doc_ids) lands, the query is KILLED, wave 2 (odd)
    // arrives after a cold restart from the checkpoint. An even-odd
    // pair can only surface if the (band, bucket) state holding the
    // even doc's shingles was restored — a fresh state store would
    // silently lose every cross-wave duplicate.
    docs.filter(col("doc_id") % 2 === 0).repartition(1)
      .write.mode("append").parquet(in)
    val schema = docs.schema
    val pairs = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    def collectPairs(df: org.apache.spark.sql.DataFrame, id: Long): Unit =
      df.select("doc_a", "doc_b").collect()
        .foreach(r => pairs.add((r.getLong(0), r.getLong(1))))
    // memory sink cannot recover an append-mode checkpoint; foreachBatch
    // is the restart-capable sink. The set sink absorbs an at-least-once
    // replayed batch; the operator emits each pair once by construction.
    def start() = Streams.nearDupPairs(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(in))
      .writeStream.outputMode("append").option("checkpointLocation", ckpt)
      .foreachBatch(collectPairs _).start()
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    docs.filter(col("doc_id") % 2 =!= 0).repartition(1)
      .write.mode("append").parquet(in)
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    val got = pairs.asScala.toSet
    val want = graft.SparkEntry.queries("q_dedup_near")(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty, "batch pair set empty — test is vacuous")
    assert(got == want, s"restarted near-dup diverged: missed=${want -- got} extra=${got -- want}")
    val cross = got.filter(p => (p._1 % 2) != (p._2 % 2))
    assert(cross.nonEmpty, "no even-odd pair in the corpus — restart evidence is vacuous")
  }

  test("incremental corpus ingest: quality gate + content dedup across invocations") {
    import org.apache.spark.sql.functions._
    // the streaming twin of the training-prep front end: each
    // AvailableNow invocation quality-gates new documents and drops
    // content-hash duplicates against ALL previously ingested state
    // (dropDuplicates state persists in the checkpoint) — an
    // incremental corpus build that never re-reads old files
    val base = java.nio.file.Files.createTempDirectory("graft-corpus").toString
    val in = s"$base/in"; val sink = s"$base/sink"; val ckpt = s"$base/ckpt"
    new java.io.File(in).mkdirs()
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/documents.parquet"),
      java.nio.file.Paths.get(s"$in/d1.parquet"))
    val schema = spark.read.parquet(in).schema
    def gated = spark.readStream.schema(schema).parquet(in)
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 10)
      .withColumn("content_key", xxhash64(col("text")))
      .dropDuplicates("content_key")
      .select("doc_id", "lang", "source", "content_key")
    ScheduledRunner.runOnce(gated, sink, ckpt)
    val n1 = spark.read.parquet(sink).count()
    val batchExpect = spark.read.parquet(s"$sf/documents.parquet")
      .filter(size(split(col("text"), " ")) >= 10)
      .select(xxhash64(col("text")).as("k")).distinct().count()
    assert(n1 == batchExpect, s"streaming $n1 != batch $batchExpect")
    // re-delivering the SAME documents (a new file with identical
    // content) must add nothing: every content_key is already in state
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/documents.parquet"),
      java.nio.file.Paths.get(s"$in/d2.parquet"))
    ScheduledRunner.runOnce(gated, sink, ckpt)
    assert(spark.read.parquet(sink).count() == n1,
      "duplicate re-delivery leaked through the dedup state")
  }

  test("streaming session windows match batch twin for closed sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = graft.Tables.events(spark, sf).as[Event].collect().toSeq
    val ms = MemoryStream[Event]
    ms.addData(rows)
    val out = runToMemory(Streams.sessionAgg(ms.toDF()), "sess_twin_out", "complete")
    val expected = graft.ops.StreamTwins.queries("q_stream_session")(spark, sf)
    val got = out.select("user_id", "session_start", "n_events", "last_ts")
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }
}
