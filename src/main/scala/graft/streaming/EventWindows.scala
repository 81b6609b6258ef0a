package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time streaming operators over the events stream: watermarked
  * tumbling-window aggregation and stateful sessionization
  * (`flatMapGroupsWithState`) — the Structured-Streaming depth the engine
  * offers beyond the reference's batch-only surface.
  *
  * Events carry nanosecond epochs (`ts` as long, see nanosAsLong); they
  * convert to event-time timestamps at the source boundary.
  */
object EventWindows {

  /** Attach an event-time timestamp column from `ts`. Both source
    * encodings are accepted (see [[graft.queries.Tables]]): nanos-long
    * (old generator via nanosAsLong) divides down to micros; a
    * TIMESTAMP/TIMESTAMP_NTZ `ts` (current generator) is already
    * event-time and casts directly — a streaming relation cannot route
    * through the batch loader's normalization, so the branch lives here
    * at the source boundary.
    */
  def withEventTime(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val eventTime = events.schema("ts").dataType match {
      case LongType => timestamp_micros(expr("ts DIV 1000"))
      case TimestampType | TimestampNTZType => col("ts").cast(TimestampType)
      case other => throw new IllegalArgumentException(
        s"events.ts must be nanos-long or timestamp, got $other")
    }
    events.withColumn("event_time", eventTime)
  }

  /** Watermarked tumbling-window counts per event type. Late events beyond
    * the watermark are dropped; state for closed windows is released —
    * the property that makes hour-window aggregation run forever at scale.
    */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    withEventTime(events)
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))

  /** Stream-static enrichment: join the event stream against a static
    * dimension (broadcast — stream-static joins are STATELESS in
    * Structured Streaming, so no watermark or state store is involved;
    * the dimension re-resolves per micro-batch, picking up dim updates
    * between batches). The standard pattern for attaching user/document
    * metadata to a 100 TB event firehose without shuffling the stream.
    */
  def enriched(stream: DataFrame, dim: DataFrame,
      keys: Seq[String]): DataFrame =
    stream.join(broadcast(dim), keys)

  /** Watermarked stream-stream inner join — click→purchase attribution
    * within a bounded window: each purchase matches the same user's
    * clicks from the preceding `attribution` interval. The time-range
    * predicate plus BOTH-side watermarks is what lets Structured
    * Streaming expire join state: a buffered click can only match
    * purchases inside `[click_time, click_time + attribution]`, so once
    * the purchase watermark passes that bound the click is dropped from
    * the state store. Without the range condition (or with only one
    * watermark) both sides buffer forever — the unbounded-state trap of
    * stream-stream joins at 100 TB.
    *
    * Works identically as a batch join (the agreement spec runs both).
    */
  def attributionJoin(clicks: DataFrame, purchases: DataFrame,
      attribution: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame = {
    val c = withEventTime(clicks)
      .select(col("user_id"), col("event_id").as("click_id"),
        col("event_time").as("click_time"))
      .withWatermark("click_time", watermark)
    val p = withEventTime(purchases)
      .select(col("user_id").as("p_user_id"),
        col("event_id").as("purchase_id"),
        col("event_time").as("purchase_time"))
      .withWatermark("purchase_time", watermark)
    c.join(p,
      col("user_id") === col("p_user_id") &&
        col("purchase_time") >= col("click_time") &&
        col("purchase_time") <= col("click_time") + expr(s"INTERVAL $attribution"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("click_time"), col("purchase_time"))
  }

  /** Batch sessionization — the gaps-and-islands equivalent of
    * [[sessionize]]: split each user's event history into sessions at any
    * inactivity longer than `gap` (same unit as `tsCol`). A new-session
    * flag (`ts - lag(ts) > gap`, first event = new) summed over an
    * event-ordered running window numbers the sessions; one aggregate
    * rolls them up to (start, end, count).
    *
    * ONE shuffle on `userCol`; per-user work is a linear scan. `tieCol`
    * breaks event-time ties so the row order — and therefore the result —
    * is total and engine-independent. A pathologically hot user serializes
    * into one task, the same caveat as [[graft.operators.AsofJoin]]; at
    * that point sessionize incrementally with the streaming form instead.
    */
  def sessionizeBatch(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, gap: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    // EXPLICIT width (r16): the window needs hashpartitioning(userCol)
    // anyway; establishing it with a pinned-count repartition (AQE-
    // exempt, width = spark.sql.shuffle.partitions) keeps the per-user
    // lag/sum session scan at engine width instead of letting byte-
    // sized AQE coalescing serialize it behind a few-MB event exchange.
    // Same exchange count — the window's own ENSURE exchange is elided.
    val width = events.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt
    events.repartition(width, col(userCol))
      .select(col(userCol), col(tsCol), col(tieCol))
      // null lag (first event) compares null <= gap → null → otherwise(1)
      .withColumn("__new_s",
        when(col(tsCol) - lag(col(tsCol), 1).over(w) <= gap, 0L).otherwise(1L))
      .withColumn("session_id", sum(col("__new_s"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("session_id"))
      .agg(min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
  }

  final case class SessionEvent(user_id: Long, event_time_us: Long)
  final case class SessionState(start_us: Long, last_us: Long, events: Long)
  final case class Session(user_id: Long, start_us: Long, end_us: Long,
      events: Long)

  /** Stateful sessionization: per-user sessions close after `gapMinutes`
    * of inactivity in EVENT time (`EventTimeTimeout` + a `gapMinutes`
    * watermark) — session boundaries are a function of the data alone, so
    * a backfill replayed at any micro-batch split or throughput yields
    * byte-identical sessions (a processing-time timeout would close them
    * on wall-clock gaps between batches instead). A session emits when a
    * new event arrives past the gap, or when the watermark passes
    * `last_event + gap` (timeout). The custom-state shape the reference's
    * architecture never needed but a streaming engine must offer
    * (`flatMapGroupsWithState`).
    *
    * Scale: state is one (start, last, count) triple per ACTIVE user, and
    * the watermark bounds how long inactivity keeps it alive — the state
    * store stays O(active users) on an unbounded stream.
    */
  def sessionize(events: Dataset[SessionEvent], gapMinutes: Int)
      : Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes.toLong * 60 * 1000 * 1000
    val gapMs = gapMinutes.toLong * 60 * 1000
    // the watermark delay equals the gap: any event surviving the late
    // filter has ts >= watermark, so its timeout ts + gap is always ahead
    // of the watermark (setTimeoutTimestamp would reject otherwise)
    events
      .withColumn("event_time", timestamp_micros(col("event_time_us")))
      .withWatermark("event_time", s"$gapMinutes minutes")
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, it, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(userId, s.start_us, s.last_us, s.events))
          } else {
            val sorted = it.toSeq.sortBy(_.event_time_us)
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              cur match {
                case Some(s) if e.event_time_us - s.last_us <= gapUs =>
                  // min/max, not overwrite: an out-of-order event from a
                  // lagging partition (late but inside the watermark) can
                  // arrive with time < last_us — overwriting would move
                  // the session end BACKWARD (end < start) and make the
                  // next on-time event falsely split the session
                  cur = Some(s.copy(
                    start_us = math.min(s.start_us, e.event_time_us),
                    last_us = math.max(s.last_us, e.event_time_us),
                    events = s.events + 1))
                case Some(s) =>
                  closed ::= Session(userId, s.start_us, s.last_us, s.events)
                  cur = Some(SessionState(e.event_time_us, e.event_time_us, 1))
                case None =>
                  cur = Some(SessionState(e.event_time_us, e.event_time_us, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last_us / 1000 + gapMs)
            }
            closed.reverseIterator
          }
      }
  }
}
