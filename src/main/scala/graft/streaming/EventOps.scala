package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming surface. The reference is purely batch (SURVEY.md §2.10), so
  * these are the engine's forward-looking transforms: written against
  * DataFrame so the SAME function runs in a batch job or under
  * `readStream` (Structured Streaming plans it incrementally).
  *
  * Scale design: windowed aggregation is a streaming-state hash agg keyed
  * by (window, key) — the watermark bounds state; sessionization uses
  * `flatMapGroupsWithState` with an explicit timeout so state size tracks
  * live users, not history.
  */
object EventOps {

  /** Tumbling-window counts/sums per key. Works on a batch frame or a
    * stream; pass `watermark` when streaming so late state is evicted.
    */
  def hourlyAgg(events: DataFrame, watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(w => events.withWatermark("ts", w))
    src
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))
  }

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class Session(user_id: Long, n_events: Long, first_ts: java.sql.Timestamp,
      last_ts: java.sql.Timestamp, total_value: Double)

  /** Public (not `private`): the state encoder's generated code must be
    * able to construct it outside this object's scope.
    */
  final case class SessionState(n: Long, first: Long, last: Long, total: Double)

  /** Event-time sessionization state: gap-separated session segments in
    * start order — the LAST is the open session, earlier ones are
    * gap-closed but unsealed (the watermark has not yet passed their
    * `last + gap`, so a late-but-within-watermark event could still
    * extend or bridge them). Public for the state encoder, like
    * [[SessionState]].
    */
  final case class SessionBuf(segs: Seq[SessionState])

  /** Stateful sessionization: one open session per user, closed (emitted)
    * after `gapMinutes` of inactivity via processing-time timeout. The
    * canonical `flatMapGroupsWithState` shape — explicit state, explicit
    * timeout, append output.
    */
  def sessionize(events: Dataset[Event], gapMinutes: Int): Dataset[Session] =
    sessionize(events, s"$gapMinutes minutes")

  /** [[sessionize]] with the inactivity gap as a duration string — test
    * harnesses close sessions in seconds, production in minutes.
    */
  def sessionize(
      events: Dataset[Event],
      gapDuration: String = "30 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout)(
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(userId, s.n, new java.sql.Timestamp(s.first),
              new java.sql.Timestamp(s.last), s.total))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var st = state.getOption.getOrElse(SessionState(0, Long.MaxValue, Long.MinValue, 0d))
            sorted.foreach { e =>
              st = SessionState(st.n + 1, math.min(st.first, e.ts.getTime),
                math.max(st.last, e.ts.getTime), st.total + e.value)
            }
            state.update(st)
            state.setTimeoutDuration(gapDuration)
            Iterator.empty
          }
        })
  }

  /** Event-time sessionization — the true streaming twin of
    * [[sessionizeBatch]]. [[sessionize]] closes a session after
    * `gapDuration` of processing-time silence, which matches the batch
    * twin only when ingestion keeps up with event time; under ingestion
    * lag or replay, a late-but-within-gap burst arrives after the
    * processing-time timer fired and wrongly opens a second session.
    * Here the timeout is an event-time timestamp (`last event + gap`)
    * measured against the WATERMARK, so a burst that is within the gap
    * in event time merges into the open session no matter how late it
    * arrives in processing time — as long as it beats the watermark
    * delay, which is the standard Structured Streaming lateness
    * contract (state stays bounded by watermark + gap).
    *
    * Sessions EMIT only when the watermark (max event time seen minus
    * `watermarkDelay`) passes their `last + gap` — including sessions a
    * gap WITHIN one batch already closed. Emitting an in-batch-closed
    * session immediately would be wrong in Append mode: a later
    * within-watermark event whose timestamp falls inside the gap must
    * still be able to extend it — or BRIDGE it with the next segment
    * into one session — and an appended row cannot be retracted. So
    * gap-closed segments are held in state ([[SessionBuf]]) until
    * sealed; sealing at `last + gap <= watermark` is exact, because any
    * event able to touch a session must have `ts <= last + gap`, and an
    * event at or behind the watermark is beyond-lateness and dropped
    * before reaching the state function. State stays bounded by
    * watermark + gap per user, same as before; the cost of exactness is
    * emission latency of one watermark delay — the standard Structured
    * Streaming Append-mode contract. A bounded stream's final sessions
    * stay open until later events (any user) advance the watermark.
    */
  def sessionizeEventTime(
      events: Dataset[Event],
      gapDuration: String = "30 minutes",
      watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = durationMs(gapDuration)
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionBuf]) => {
          val wm = state.getCurrentWatermarkMs()
          // merge held segments with the batch's events as interval
          // aggregates sorted by start: a singleton event within `gap`
          // of the previous aggregate's end extends it, and an event
          // landing between two held segments bridges them exactly
          // (counts/sums/min/max compose associatively)
          val prev = state.getOption.map(_.segs).getOrElse(Seq.empty)
          val incoming = rows.map(e =>
            SessionState(1, e.ts.getTime, e.ts.getTime, e.value)).toSeq
          val merged = scala.collection.mutable.ArrayBuffer.empty[SessionState]
          (prev ++ incoming).sortBy(s => (s.first, s.last)).foreach { s =>
            if (merged.nonEmpty && s.first - merged.last.last <= gapMs) {
              val m = merged.last
              merged(merged.size - 1) = SessionState(m.n + s.n,
                math.min(m.first, s.first), math.max(m.last, s.last), m.total + s.total)
            } else merged += s
          }
          val (closed, live) = merged.partition(_.last + gapMs <= wm)
          if (live.isEmpty) state.remove()
          else {
            state.update(SessionBuf(live.toSeq))
            // wake when the earliest held segment seals; strictly beyond
            // the current watermark or the runtime rejects the timestamp
            state.setTimeoutTimestamp(
              math.max(live.map(_.last + gapMs).min, wm + 1))
          }
          closed.iterator.map(s => Session(userId, s.n,
            new java.sql.Timestamp(s.first), new java.sql.Timestamp(s.last), s.total))
        })
  }

  /** "5 seconds" / "30 minutes" / "1 hour" -> milliseconds. */
  private def durationMs(d: String): Long = {
    val m = """(\d+)\s*(millisecond|second|minute|hour)s?""".r
    d.trim match {
      case m(n, unit) =>
        n.toLong * (unit match {
          case "millisecond" => 1L
          case "second" => 1000L
          case "minute" => 60000L
          case "hour" => 3600000L
        })
      case other => throw new IllegalArgumentException(s"unparseable duration: '$other'")
    }
  }

  /** Streaming twin of exact dedup ([[graft.operators.Dedup]], SURVEY
    * T1): first occurrence per key wins, duplicates arriving within the
    * watermark window are dropped. `dropDuplicatesWithinWatermark`
    * (not plain `dropDuplicates`) is the 100-TB-stream shape — the
    * dedup state evicts once the watermark passes, so state tracks the
    * lateness window instead of growing with the whole stream history.
    * A duplicate arriving later than `watermarkDelay` after the
    * original re-emits; size the delay to the source's replay window.
    */
  def dedupStream(
      events: DataFrame,
      keys: Seq[String],
      tsCol: String = "ts",
      watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Batch twin of [[sessionize]] for verification: same session
    * definition computed with a gap-split window cascade (the standard
    * batch sessionization: lag -> gap flag -> running session id).
    */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    events
      .withColumn("__prev", lag(col("ts"), 1).over(byUser))
      .withColumn("__new_session",
        when(col("__prev").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("__prev")) > gapMinutes * 60L, 1)
          .otherwise(0))
      .withColumn("__session_id", sum(col("__new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("__session_id"))
      .agg(count(lit(1)).as("n_events"), min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .drop("__session_id")
  }
}
