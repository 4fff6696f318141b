package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState,
  GroupStateTimeout, ListState, OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** Event row shape of the events table (FIXTURES.md). */
case class Event(
  event_id: Long,
  ts: java.sql.Timestamp,
  user_id: Long,
  event_type: String,
  value: Double,
  props: String)

/** Per-user session state for the custom-state operator. */
case class SessionState(nEvents: Long, startMs: Long, lastMs: Long)
case class SessionOut(user_id: Long, session_start: Long, n_events: Long, last_ms: Long)

/** Output row of the transformWithState running aggregate. */
case class UserRunning(user_id: Long, n_events: Long, sum_value: Double)

/** A near-dup pair surfaced by [[Streams.nearDupPairs]] (doc_a < doc_b). */
case class NearDupPair(doc_a: Long, doc_b: Long, jaccard: Double)

/** Per-user funnel stage timestamps (epoch MICROS — the events
  * table's native precision, so strict stage-order comparisons can
  * never falsely tie; -1 = stage not reached), the streaming state
  * AND output row of [[FunnelStagesProcessor]]. */
case class UserFunnel(user_id: Long, t_view: Long, t_click: Long, t_buy: Long)

/** Spark 4 arbitrary-state API (transformWithState successor of
  * flatMapGroupsWithState): a per-user running count/sum held in a
  * typed ValueState, emitted once per key per micro-batch. State
  * lives in the RocksDB state store (the API requires it), shards by
  * the groupByKey key, and — unlike the GroupState API — supports
  * independent named state variables, TTL per variable, and timers
  * decoupled from output mode. */
class RunningTotalsProcessor
    extends StatefulProcessor[Long, Event, UserRunning] {
  @transient private var totals: ValueState[(Long, Double)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    totals = getHandle.getValueState[(Long, Double)](
      "totals", Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble),
      TTLConfig.NONE)

  override def handleInputRows(user: Long, rows: Iterator[Event],
      timers: TimerValues): Iterator[UserRunning] = {
    var (n, sum) = Option(totals.get()).getOrElse((0L, 0.0))
    rows.foreach { e => n += 1; sum += e.value }
    totals.update((n, sum))
    Iterator.single(UserRunning(user, n, sum))
  }
}

/** Streaming twin of the conversion funnel (ops.Analytics.q_funnel):
  * per-user earliest view/click/purchase timestamps as MIN-merge
  * state. Minimum is commutative and idempotent, so the state
  * converges to the batch conditional-min aggregate REGARDLESS of
  * arrival order across micro-batches — late or reordered events can
  * only lower a stage timestamp toward the batch truth, never past
  * it. Emits the running stage row per user per micro-batch (update
  * mode); the funnel roll-up (did click follow view?) stays a
  * downstream batch-style aggregate over the latest state. */
class FunnelStagesProcessor
    extends StatefulProcessor[Long, Event, UserFunnel] {
  @transient private var stages: ValueState[(Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    stages = getHandle.getValueState[(Long, Long, Long)](
      "stages",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong),
      TTLConfig.NONE)

  private def minTs(cur: Long, t: Long): Long = if (cur < 0 || t < cur) t else cur

  override def handleInputRows(user: Long, rows: Iterator[Event],
      timers: TimerValues): Iterator[UserFunnel] = {
    var (v, c, b) = Option(stages.get()).getOrElse((-1L, -1L, -1L))
    rows.foreach { e =>
      // epoch micros: getTime carries ms (incl. the nanos' ms part);
      // the sub-ms micros come from getNanos
      val t = e.ts.getTime * 1000L + (e.ts.getNanos / 1000L) % 1000L
      e.event_type match {
        case "view"     => v = minTs(v, t)
        case "click"    => c = minTs(c, t)
        case "purchase" => b = minTs(b, t)
        case _          => ()
      }
    }
    stages.update((v, c, b))
    Iterator.single(UserFunnel(user, v, c, b))
  }
}

/** A change row emitted by [[IncrementalScd2Processor]]: the state
  * became `state` at `valid_from_us` (epoch micros). valid_to is the
  * next change's valid_from — an interval view is a downstream
  * stateless window, exactly as in the batch q_scd2. */
case class Scd2Change(user_id: Long, event_id: Long, state: String,
  valid_from_us: Long)

/** Streaming twin of ops.Analytics.q_scd2 — incremental SCD type-2
  * change detection that is SAFE UNDER OUT-OF-ORDER ARRIVAL, unlike a
  * naive per-batch fold: change detection is order-SENSITIVE (a
  * reordered pair of events can both create and suppress change
  * rows), so arriving events are only buffered here, and the fold
  * advances exclusively over the WATERMARK-FINAL prefix — events
  * strictly older than the watermark, which Spark guarantees no
  * later arrival can precede. Per key: a ListState buffer of
  * (ts, event_id, type), a ValueState of the last folded state, and
  * an event-time timer (re-registered at each batch's max ts) so
  * keys with buffered events drain when the watermark passes even if
  * they never receive another row. State is bounded by the
  * allowed-lateness window per key — the buffer holds at most the
  * events of the last delay interval, not history.
  */
class IncrementalScd2Processor
    extends StatefulProcessor[Long, Event, Scd2Change] {
  @transient private var buffer: ListState[(Long, Long, String)] = _
  @transient private var last: ValueState[String] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    buffer = getHandle.getListState[(Long, Long, String)](
      "buffer",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.STRING),
      TTLConfig.NONE)
    last = getHandle.getValueState[String]("last", Encoders.STRING, TTLConfig.NONE)
  }

  private def micros(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

  /** Fold the watermark-final prefix of the buffer (strict <, so an
    * equal-ts straggler can never sort before an already-folded row)
    * and emit the detected changes in (ts, event_id) order. */
  private def drain(user: Long, wmMs: Long): Iterator[Scd2Change] = {
    if (!buffer.exists()) return Iterator.empty
    val wmUs = wmMs * 1000L
    val (ready, rest) = buffer.get().toVector.partition(_._1 < wmUs)
    if (ready.isEmpty) return Iterator.empty
    if (rest.isEmpty) buffer.clear() else buffer.put(rest.toArray)
    var cur = Option(last.get())
    val out = Vector.newBuilder[Scd2Change]
    ready.sortBy(e => (e._1, e._2)).foreach { case (t, id, st) =>
      if (!cur.contains(st)) { out += Scd2Change(user, id, st, t); cur = Some(st) }
    }
    cur.foreach(last.update)
    out.result().iterator
  }

  override def handleInputRows(user: Long, rows: Iterator[Event],
      timers: TimerValues): Iterator[Scd2Change] = {
    var maxTsMs = Long.MinValue
    rows.foreach { e =>
      buffer.appendValue((micros(e.ts), e.event_id, e.event_type))
      maxTsMs = math.max(maxTsMs, e.ts.getTime)
    }
    // fire once the watermark passes everything currently buffered
    if (maxTsMs != Long.MinValue) getHandle.registerTimer(maxTsMs + 1)
    drain(user, timers.getCurrentWatermarkInMs())
  }

  override def handleExpiredTimer(user: Long, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[Scd2Change] =
    drain(user, timers.getCurrentWatermarkInMs())
}

/** Structured Streaming operators (SURVEY.md §2 streaming tier +
  * A19's scheduled-snapshot model upgraded to incremental streams).
  *
  * Each transform takes the (possibly streaming) events DataFrame, so
  * the same code path serves `readStream` in production and
  * MemoryStream in tests; the batch twins in ops.StreamTwins pin the
  * semantics via the DuckDB oracle.
  *
  * Watermarks bound state: 10-minute lateness on a 5-minute window
  * means at most ~3 open windows per key partition; session state is
  * evicted once the watermark passes start+gap. At scale the state
  * store shards by the groupBy key — user_id keys distribute evenly
  * (no skew in this domain).
  */
object Streams {

  /** Tumbling 5-minute counts/sums with 10-minute watermark. */
  def tumblingAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("sum_value"))

  /** Sliding 10-minute windows every 5 minutes (each event in 2
    * windows) with 10-minute watermark; state is bounded by
    * (open windows × types), open windows ≤ window/slide + watermark
    * slack per key. */
  def slidingAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"))

  /** Session windows (30-minute gap) per user. */
  def sessionAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), max(col("ts")).as("last_ts"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("n_events"), col("last_ts"))

  /** Streaming exact dedup on event_id within the watermark. */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** foreachBatch sink: per-micro-batch custom write — the streaming
    * analog of the reference's batched submit (A17); each batch gets
    * the full DataFrame API (joins, upserts, multi-sink writes). */
  def runForeachBatch(out: DataFrame, onBatch: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    out.writeStream
      .outputMode("update")
      .foreachBatch(onBatch)
      .start()

  /** Stream-static enrichment join: each micro-batch joins against a
    * bounded static dimension (broadcast — the dimension is planned
    * once, re-read per batch only if its source changes). The
    * streaming analog of the reference's lease-map probe (A11). */
  def enrichEvents(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), Seq("user_id"), "left_outer")

  /** Stream-stream interval join: each error event joined to click
    * events by the same user within the preceding 10 minutes. Both
    * sides watermarked so the join state is bounded (clicks retained
    * only inside the interval + watermark). */
  def errorClickJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("value").as("c_value"))
      .withWatermark("c_ts", "10 minutes")
    val errors = events.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("ts").as("e_ts"),
        col("event_id").as("e_id"))
      .withWatermark("e_ts", "10 minutes")
    errors.join(clicks,
      col("e_user") === col("c_user") &&
        col("c_ts") >= col("e_ts") - expr("INTERVAL 10 MINUTES") &&
        col("c_ts") <= col("e_ts"))
  }

  /** Running per-user totals via the Spark 4 transformWithState API
    * (see [[RunningTotalsProcessor]]). Requires the RocksDB state
    * store provider. */
  def runningTotals(events: Dataset[Event]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** Incremental funnel stages — see [[FunnelStagesProcessor]]. */
  def funnelStages(events: Dataset[Event]): Dataset[UserFunnel] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new FunnelStagesProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** Incremental SCD2 — see [[IncrementalScd2Processor]]. The
    * watermark delay is the out-of-order tolerance; emission lags
    * arrival by at most that delay. */
  def incrementalScd2(events: Dataset[Event],
      delay: String = "10 minutes"): Dataset[Scd2Change] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .transformWithState(new IncrementalScd2Processor,
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** INCREMENTAL MinHash-LSH near-dup detection: every arriving
    * document is checked against the full history of documents that
    * ever landed in any of its 8 LSH band buckets, and exact-Jaccard
    * near-dup pairs stream out as they are discovered — the streaming
    * twin of Dedup.dedupNear (same signature: MinHash-32, 8 bands × 4
    * rows, same exact shingle-Jaccard rescore, same ≥ t threshold),
    * for the corpus that GROWS rather than re-deduplicates from
    * scratch per snapshot.
    *
    * Shape: narrow signature pass (native MinHash Expression) →
    * band explode → flatMapGroupsWithState keyed by (band, bucket) —
    * state shards by bucket exactly like the batch join's shuffle —
    * → streaming dropDuplicates on the pair key (a pair colliding in
    * several bands emits once). State per bucket holds (doc_id,
    * shingle set) for exact in-place rescoring; a 100 TB deployment
    * bounds it by TTL/watermark eviction or keeps signatures only
    * (estimated Jaccard) with a periodic batch rescore — the
    * candidate-generation discipline (bounded LSH buckets, never
    * all-pairs) is identical either way. */
  def nearDupPairs(docs: DataFrame, threshold: Double = 0.8): DataFrame = {
    import docs.sparkSession.implicits._
    import graft.functions.TextSim._
    val sigs = docs
      .select(col("doc_id"), shingles(split(col("text"), " "), 3).as("sh"))
      .select(col("doc_id"), col("sh"), minhashSignature(col("sh"), 32).as("sig"))
    // explode-then-bucket (the Dedup.dedupNear CollapseProject guard)
    val keyed = sigs
      .select(col("doc_id"), col("sh"),
        explode(sequence(lit(0), lit(7))).as("band"), col("sig"))
      .select(col("doc_id"), col("sh"), col("band"),
        lshBandBucket(col("sig"), col("band"), 4).as("bucket"))
      .as[(Long, Seq[String], Int, Long)]
    keyed
      .groupByKey(r => (r._3, r._4))
      .flatMapGroupsWithState[List[(Long, Seq[String])], NearDupPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: (Int, Long), it: Iterator[(Long, Seq[String], Int, Long)],
            state: GroupState[List[(Long, Seq[String])]]) =>
          val out = List.newBuilder[NearDupPair]
          // deterministic intra-batch order; new docs also pair with
          // each other, not just with history
          var acc = state.getOption.getOrElse(Nil)
          it.map(r => (r._1, r._2)).toList.sortBy(_._1).foreach { case (id, sh) =>
            if (!acc.exists(_._1 == id)) {
              val s1 = sh.toSet
              acc.foreach { case (oid, osh) =>
                val s2 = osh.toSet
                val j = s1.intersect(s2).size.toDouble / s1.union(s2).size
                if (j >= threshold) {
                  val (a, b) = if (oid < id) (oid, id) else (id, oid)
                  out += NearDupPair(a, b, j)
                }
              }
              acc = (id, sh) :: acc
            }
          }
          state.update(acc)
          out.result().iterator
      }
      // a pair that collides in several bands must surface ONCE —
      // streaming dedup keeps the pair key in state
      .dropDuplicates("doc_a", "doc_b")
      .toDF()
  }

  /** Custom-state sessionization via flatMapGroupsWithState — the
    * mapGroupsWithState surface (SURVEY.md §2 Tier B), emitting a
    * session row when a 30-minute gap closes one, and flushing/
    * evicting idle state via EventTimeTimeout once the watermark
    * passes last_event + gap — so state is bounded by the number of
    * ACTIVE users, not all users ever seen. Equivalent results to
    * sessionAgg for completed sessions. (Per-trigger batch sort is
    * bounded by the trigger's batch size, not the group's history.) */
  def statefulSessions(events: Dataset[Event]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = 30L * 60 * 1000
    events
      .withWatermark("ts", "30 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed last+gap: the session can never extend
            val st = state.get
            state.remove()
            Iterator.single(SessionOut(user, st.startMs, st.nEvents, st.lastMs))
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var cur = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(st) if t - st.lastMs < gapMs =>
                  cur = Some(st.copy(nEvents = st.nEvents + 1, lastMs = t))
                case Some(st) =>
                  closed += SessionOut(user, st.startMs, st.nEvents, st.lastMs)
                  cur = Some(SessionState(1, t, t))
                case None =>
                  cur = Some(SessionState(1, t, t))
              }
            }
            cur.foreach { st =>
              state.update(st)
              state.setTimeoutTimestamp(st.lastMs + gapMs)
            }
            closed.result().iterator
          }
      }
  }
}
