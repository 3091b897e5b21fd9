package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event on the stream (event-time `ts` as a real timestamp). */
final case class StreamEvent(user_id: Long, ts: Timestamp, event_type: String, value: Double)

/** A closed user session emitted by [[EventsStream.sessionize]]. */
final case class UserSession(
    user_id: Long, start_sec: Long, end_sec: Long, n_events: Long, sum_value: Double)

/** Mutable-free accumulator for an open session. */
final case class SessionAcc(startMs: Long, endMs: Long, n: Long, sum: Double)

/** Per-user state for [[EventsStream.sessionize]]: every session the
  * watermark has not yet finalized, kept sorted by start. Bounded — a
  * session leaves as soon as the watermark passes `end + gap`, so the list
  * holds at most `watermark horizon / gap` entries per user. */
final case class OpenSessions(sessions: Seq[SessionAcc])

/**
 * Structured Streaming twins of the batch [[graft.ext.Events]] operators:
 * the same semantics expressed as an unbounded query — `readStream` →
 * watermark → windowed agg / custom session state → `writeStream`.
 *
 * Scale: both are standard stateful streaming shapes — state is
 * partitioned by (window, type) or user key across executors, watermarks
 * bound state size, and output mode Append only emits finalized results.
 */
object EventsStream {

  /**
   * Streaming tumbling 1-hour aggregation: the streaming plan of
   * [[graft.ext.Events.hourly]]. The 2-hour watermark lets the engine
   * finalize and emit windows (Append mode) once event time passes.
   */
  def hourly(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"),
        avg(col("value")).as("avg_value"))
      .select(
        unix_timestamp(col("window.start")).as("hour_start_sec"),
        col("event_type"), col("n_events"), col("sum_value"), col("avg_value"))

  /**
   * Streaming gap-based sessionization with custom state —
   * `flatMapGroupsWithState` keyed by user, event-time timeout. A session
   * is emitted once the watermark passes its `end + gap`: at that point no
   * event the watermark still admits can extend it or bridge into it, so
   * the output EXACTLY matches the batch twin ([[graft.ext.Events
   * .sessionize]]) for every reordering the watermark tolerates — chained
   * stragglers included (the r3 divergence, now closed and pinned by
   * BatchStreamParitySpec).
   *
   * State holds every not-yet-final session per user (sorted, merged with
   * the same sort-and-fold rule batch uses); the watermark bounds the list
   * at ~horizon/gap entries, so state stays O(1) per user. The trade vs
   * the old emit-on-gap design is output latency (a closed session waits
   * for the watermark), which is the standard Append-mode contract.
   */
  def sessionize(events: Dataset[StreamEvent], gapSec: Long = 1800,
      watermark: String = "1 hour"): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    val gapMs = gapSec * 1000L

    def finish(userId: Long, s: SessionAcc): UserSession =
      UserSession(userId, s.startMs / 1000, s.endMs / 1000, s.n, s.sum)

    // the batch twin's rule, incremental: sort by start, merge neighbors
    // whose gap is <= gapMs
    def merge(xs: Seq[SessionAcc]): List[SessionAcc] =
      xs.sortBy(s => (s.startMs, s.endMs)).foldLeft(List.empty[SessionAcc]) {
        case (cur :: done, nxt) if nxt.startMs - cur.endMs <= gapMs =>
          SessionAcc(cur.startMs, math.max(cur.endMs, nxt.endMs),
            cur.n + nxt.n, cur.sum + nxt.sum) :: done
        case (acc, nxt) => nxt :: acc
      }.reverse

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[StreamEvent], state: GroupState[OpenSessions]) =>
          val prior = state.getOption.map(_.sessions).getOrElse(Seq.empty)
          val incoming =
            batch.map(e => SessionAcc(e.ts.getTime, e.ts.getTime, 1L, e.value)).toSeq
          val wm = state.getCurrentWatermarkMs()
          // final once the watermark strictly passes end + gap — no
          // admissible event can reach the session anymore
          val (closed, open) = merge(prior ++ incoming).partition(_.endMs + gapMs < wm)
          if (open.isEmpty) state.remove()
          else {
            state.update(OpenSessions(open))
            // wake when the earliest open session becomes final (timeout
            // timestamps must sit strictly beyond the current watermark)
            state.setTimeoutTimestamp(math.max(open.map(_.endMs).min + gapMs, wm + 1))
          }
          closed.sortBy(_.startMs).map(finish(userId, _)).iterator
      }
  }

  /** Attach a memory sink and drain available data; test/demo helper. */
  def runToMemory(df: DataFrame, name: String): Unit = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    q.processAllAvailable()
    q.stop()
  }
}
