package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the events stream.
  *
  * The reference has no streaming constructs (SURVEY.md §2 note) — its
  * only incremental surface is SCL cursors. These operators are the
  * beyond-reference streaming path the events table implies: the same
  * declarative plans as the batch aggregates, run by the micro-batch
  * engine with bounded state.
  *
  * Scale design: a watermark bounds every stateful operator's state (no
  * unbounded accumulation); windowed aggregation shuffles once per key;
  * sessionization keys state by user_id — the natural partition key — and
  * closes sessions by event-time gap plus watermark timeout, so state per
  * user is O(1). All expressions are built-in (codegen'd); the custom
  * session logic is a typed state function, the one place
  * mapGroupsWithState genuinely beats composition.
  */
object Streams {

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class SessionState(start: Long, last: Long, n: Long, total: Double)
  final case class Session(user_id: Long, start_ms: Long, n_events: Long,
      duration_ms: Long, total_value: Double)

  /** Tumbling-window counts per event type with a watermark: late rows
    * beyond the watermark are dropped and window state is reclaimed.
    * The value sum runs in DECIMAL (the repo-wide float-aggregation
    * discipline — a raw double sum is shuffle-order-dependent and can
    * flip a rounding boundary between runs) with one final cast. */
  def windowedEventCounts(events: DataFrame, windowDur: String = "1 minute",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4))).as("__tv"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), round(col("__tv").cast("double"), 4).as("total_value"))

  /** Streaming exact dedup for a document ingest pipeline: emit the
    * FIRST occurrence of each content digest, drop later duplicates.
    * State is keyed on the 32-byte sha-256 of the text — never the
    * document itself — and reclaimed once the watermark passes
    * (`dropDuplicatesWithinWatermark`), so state size is one digest per
    * distinct document inside the watermark horizon, not per document
    * ever seen: the bounded-state streaming counterpart of
    * [[graft.pipeline.Dedup.exact]]. */
  def streamingDedup(docs: DataFrame, tsCol: String = "ts", textCol: String = "text",
      watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("content_hash", sha2(col(textCol).cast("string"), 256))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Stream-static ENRICHMENT with per-batch dimension refresh: join
    * each micro-batch against the dimension snapshot `dimFor(batchId)`
    * resolves — re-read inside `foreachBatch`, broadcast (dimensions are
    * small relative to the stream), written to a batch-keyed OVERWRITE
    * partition (idempotent under foreachBatch retries because the
    * dimension is keyed by the DETERMINISTIC batch id, never "latest":
    * a replayed batch re-resolves the SAME snapshot, where an in-place-
    * mutated dimension would have moved on — the classic non-idempotent
    * SCD-refresh bug).
    *
    * Why not a plain static join in the streaming plan: a static
    * DataFrame is resolved ONCE at query start (its file listing is
    * pinned in the plan), so a dimension that refreshes mid-stream is
    * silently stale — per-batch re-resolution inside foreachBatch is the
    * documented pattern for slowly-changing dimensions over file
    * sources. At 100 TB the stream side never shuffles for this join:
    * the dimension broadcasts to the batch's existing partitioning. */
  def enrichPerBatch(stream: DataFrame, dimFor: Long => DataFrame,
      joinKey: (DataFrame, DataFrame) => org.apache.spark.sql.Column,
      project: (DataFrame, DataFrame) => Seq[org.apache.spark.sql.Column],
      sink: String, checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        val d = dimFor(batchId)
        b.join(broadcast(d), joinKey(b, d))
          .select(project(b, d): _*)
          .write.mode("overwrite").parquet(s"$sink/b=$batchId")
      }
      .start()

  /** Stream-stream interval join — the streaming counterpart of
    * [[graft.operators.RangeJoin]]: attribute every event on `right` to
    * the `left` rows of the same user it follows within `(0, maxGap]`
    * event time (e.g. purchases within an hour of a click).
    *
    * Scale design: both sides carry watermarks and the join condition
    * bounds right.ts within a window of left.ts, so the micro-batch
    * engine derives a state-eviction horizon for BOTH sides — buffered
    * state is O(events inside the watermark + gap window), never
    * unbounded (the documented requirement for streaming equi-joins with
    * time-interval conditions). The join key (`user_id`) shuffles both
    * streams once; everything else is codegen'd comparison. */
  def intervalJoin(left: DataFrame, right: DataFrame, gap: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    intervalJoinImpl(left, right, gap, watermark, "inner")
      .select(col("l_event"), col("user_id"), col("l_type"),
        col("r_event"), col("r_type"), col("r_value"))

  /** LEFT OUTER variant of [[intervalJoin]] — the attribution shape real
    * pipelines need when "no follow-up inside the window" is itself the
    * signal (clicks that never converted, ingests never re-seen): every
    * left event emits, matched rows on arrival exactly like the inner
    * join, unmatched rows NULL-PADDED once the joint watermark passes
    * their state-eviction horizon (l_ts + gap + delay) — only then does
    * the engine KNOW no future right row can match, so outer emission is
    * exactly-once by construction. Same range condition, same bounded
    * buffer state; the one behavioral addition is that results for
    * unmatched rows are watermark-delayed rather than arrival-driven
    * (the documented trade of every streaming outer join). */
  def intervalJoinLeftOuter(left: DataFrame, right: DataFrame, gap: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    intervalJoinImpl(left, right, gap, watermark, "left_outer")
      .select(col("l_event"), col("user_id"), col("l_type"),
        col("r_event"), col("r_type"), col("r_value"))

  /** LEFT SEMI variant: emit each left event ONCE iff any same-user
    * event follows it within the gap — the streaming `EXISTS` (did this
    * click convert? did this ingest get re-referenced?). Matched
    * emission happens on the first match's arrival, exactly once (the
    * engine marks the left row's state matched); state is bounded by
    * the same two-sided watermark horizon as the inner join, and no
    * flush batch is needed — absence simply never emits. */
  def intervalJoinLeftSemi(left: DataFrame, right: DataFrame, gap: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    intervalJoinImpl(left, right, gap, watermark, "left_semi")
      .select(col("l_event"), col("user_id"), col("l_type"))

  /** FULL OUTER variant: both directions of absence are signals — a
    * left event with no follow-up AND a right event following nothing
    * (session heads, cold-start ingests). Padding on each side waits for
    * the OTHER side's watermark to prove no future partner can arrive
    * (left pads when the watermark clears l_ts + gap; right pads when it
    * clears r_ts), so each unmatched row emits exactly once. The output
    * keeps BOTH user columns — a right-padded row has no left user_id,
    * so `r_user` is the only key an unmatched-right row carries. */
  def intervalJoinFullOuter(left: DataFrame, right: DataFrame, gap: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    intervalJoinImpl(left, right, gap, watermark, "full_outer")
      .select(col("l_event"), col("user_id"), col("l_type"),
        col("r_event"), col("r_user"), col("r_type"), col("r_value"))

  private def intervalJoinImpl(left: DataFrame, right: DataFrame, gap: String,
      watermark: String, joinType: String): DataFrame = {
    val l = left.select(col("event_id").as("l_event"), col("user_id"),
        col("ts").as("l_ts"), col("event_type").as("l_type"))
      .withWatermark("l_ts", watermark)
    val r = right.select(col("event_id").as("r_event"), col("user_id").as("r_user"),
        col("ts").as("r_ts"), col("event_type").as("r_type"), col("value").as("r_value"))
      .withWatermark("r_ts", watermark)
    l.join(r,
      col("user_id") === col("r_user") &&
        col("r_ts") > col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $gap"),
      joinType)
  }

  /** Event-time sessionization: per-user sessions close when the gap to
    * the next event exceeds `gapMs`, or when the watermark passes the
    * session's horizon (event-time timeout). Emits one row per completed
    * session.
    *
    * Late-event semantics (events above the watermark but BEFORE the
    * open session's start — possible across micro-batches): they are
    * gap-grouped into their own islands; an island ending within
    * `gapMs` of the open session's start extends it BACKWARD (start,
    * counts), an earlier island emits as its own completed session.
    * Inherent single-pass limit, stated rather than hidden: a session
    * emitted in an earlier batch can never be retro-bridged by a later
    * late arrival (append mode has no retraction) — the watermark is
    * the knob that bounds how late such a bridge can arrive. */
  def sessionize(events: Dataset[Event], gapMs: Long,
      watermark: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(s =>
              Session(userId, s.start, s.n, s.last - s.start, s.total)).iterator
            state.remove()
            out
          } else {
            val completed = scala.collection.mutable.ListBuffer[Session]()
            var cur = state.getOption
            def close(s: SessionState): Unit =
              completed += Session(userId, s.start, s.n, s.last - s.start, s.total)
            // micro-batch iterators carry no order guarantee; order by event time
            val sorted = batch.toSeq.sortBy(_.ts.getTime)
            // cross-batch LATE events (before the open session's start):
            // island them by gap; only the final island can bridge into
            // the open session — earlier ones are separated from it by
            // construction and complete on their own
            val (before, rest) = cur match {
              case Some(s) => sorted.partition(_.ts.getTime < s.start)
              case None    => (Seq.empty[Event], sorted)
            }
            if (before.nonEmpty) {
              val s = cur.get
              var island = Option.empty[SessionState]
              for (e <- before) {
                val t = e.ts.getTime
                island match {
                  case Some(i) if t - i.last > gapMs =>
                    close(i)
                    island = Some(SessionState(t, t, 1, e.value))
                  case Some(i) =>
                    island = Some(i.copy(last = t, n = i.n + 1, total = i.total + e.value))
                  case None =>
                    island = Some(SessionState(t, t, 1, e.value))
                }
              }
              island.foreach { i =>
                if (s.start - i.last <= gapMs) // bridges: extend backward
                  cur = Some(s.copy(start = i.start, n = s.n + i.n, total = s.total + i.total))
                else close(i)
              }
            }
            for (e <- rest) {
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last > gapMs =>
                  close(s)
                  cur = Some(SessionState(t, t, 1, e.value))
                case Some(s) =>
                  cur = Some(s.copy(last = math.max(s.last, t), n = s.n + 1, total = s.total + e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            completed.iterator
          }
      }
  }

  final case class TopKState(windowStart: Long, counts: Map[String, Long],
      processed: Long)
  final case class TopKItem(window_start: Long, item: String, min_count: Long,
      max_count: Long, n_processed: Long)

  /** Streaming heavy hitters per tumbling window — Misra-Gries '82
    * (SpaceSaving's ancestor) inside `flatMapGroupsWithState`: per
    * window the state is a candidate map BOUNDED at `capacity` entries
    * no matter how many distinct items flow through, and any item with
    * true frequency > n/(capacity+1) is GUARANTEED present when the
    * window's watermark timeout flushes it. Emitted counts carry the
    * sketch's error interval [min_count, max_count] = [c, c + n/(cap+1)]
    * — the trending-items/hot-keys monitor a 100 TB ingest runs per
    * window without a per-item groupBy.
    *
    * Scale design: state per window is O(capacity) — never O(distinct
    * items); windows close by event-time timeout (watermark), so state
    * count is O(open windows). Batches are sorted by (ts, event_id)
    * before folding, so replays of the same chunked input produce the
    * same sketch (MG is order-dependent by nature; determinism comes
    * from pinning the order). */
  def windowTopK(events: Dataset[Event], windowMs: Long, capacity: Int,
      watermarkDelay: String = "10 minutes"): Dataset[TopKItem] = {
    require(windowMs > 0 && capacity > 0, s"bad windowMs=$windowMs capacity=$capacity")
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(e => e.ts.getTime / windowMs * windowMs)
      .flatMapGroupsWithState[TopKState, TopKItem](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (windowStart: Long, batch: Iterator[Event], state: GroupState[TopKState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.iterator.flatMap { s =>
              val slack = s.processed / (capacity + 1)
              s.counts.toSeq.sortBy { case (item, c) => (-c, item) }.iterator
                .map { case (item, c) =>
                  TopKItem(s.windowStart, item, c, c + slack, s.processed) }
            }
            state.remove()
            out.toSeq.iterator
          } else {
            var s = state.getOption.getOrElse(TopKState(windowStart, Map.empty, 0L))
            for (e <- batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))) {
              val item = e.event_type
              val c = s.counts
              s =
                if (c.contains(item))
                  s.copy(counts = c.updated(item, c(item) + 1), processed = s.processed + 1)
                else if (c.size < capacity)
                  s.copy(counts = c.updated(item, 1L), processed = s.processed + 1)
                else {
                  // decrement-all step: every candidate pays one; zeros drop
                  val dec = c.map { case (k, v) => k -> (v - 1) }.filter(_._2 > 0)
                  s.copy(counts = dec, processed = s.processed + 1)
                }
            }
            state.update(s)
            state.setTimeoutTimestamp(s.windowStart + windowMs)
            Iterator.empty
          }
      }
  }

  /** Per-key quota admission for a streaming ingest: pass through at
    * most `quota` events per user (first-arrived in event-time order
    * within each micro-batch), drop the rest — the contribution cap a
    * training-data stream applies so no single user/source floods the
    * corpus (the streaming counterpart of
    * [[graft.pipeline.Sampling.capPerStratum]], admission-by-arrival
    * instead of rank-by-size).
    *
    * State is ONE long per user (the admitted count) — mapGroupsWithState
    * bounded-state at its smallest; no timeout, because the whole point
    * is remembering a user's lifetime admission across the run. Batch
    * iterators carry no order guarantee, so each batch is ordered by
    * (ts, event_id) before admitting — replays of the same chunked input
    * admit the same events. */
  def perKeyQuota(events: Dataset[Event], quota: Long): Dataset[Event] = {
    require(quota > 0, s"non-positive quota: $quota")
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, Event](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: Long, batch: Iterator[Event], state: GroupState[Long]) =>
          val admitted = state.getOption.getOrElse(0L)
          // clamp before toInt: a Long-scale quota must admit the whole
          // batch, not overflow to a negative take and admit nothing
          val take = math.min((quota - admitted).max(0L), Int.MaxValue.toLong)
          val out = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            .take(take.toInt)
          state.update(admitted + out.length)
          out.iterator
      }
  }
}
