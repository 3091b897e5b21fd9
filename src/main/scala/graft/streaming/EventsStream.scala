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
   * closes (and is emitted) when a new event arrives more than `gapSec`
   * after the previous one, or when the watermark passes the open
   * session's end + gap (timeout path).
   *
   * Out-of-order input matches the batch twin with one bounded exception:
   * an event arriving more than a gap before the CURRENT open session is
   * emitted as a singleton session immediately; if several such stragglers
   * would have chained into one earlier session, batch merges them while
   * this emits them separately. State holds one open session per user, so
   * that reordering (well past the watermark in practice) is the trade.
   */
  def sessionize(events: Dataset[StreamEvent], gapSec: Long = 1800,
      watermark: String = "1 hour"): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    val gapMs = gapSec * 1000L

    def finish(userId: Long, s: SessionAcc): UserSession =
      UserSession(userId, s.startMs / 1000, s.endMs / 1000, s.n, s.sum)

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[StreamEvent], state: GroupState[SessionAcc]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            // watermark passed: close and emit the open session
            val out = state.getOption.map(finish(userId, _))
            state.remove()
            out.iterator
          } else {
            var open = state.getOption
            val closed = Seq.newBuilder[UserSession]
            batch.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val t = e.ts.getTime
              open match {
                case Some(s) if t >= s.startMs - gapMs && t - s.endMs <= gapMs =>
                  // late-but-within-watermark events can precede the open
                  // session's start; extend both ends so start_sec matches
                  // the batch twin on out-of-order input (ADVICE r2)
                  open = Some(SessionAcc(math.min(s.startMs, t), math.max(s.endMs, t),
                    s.n + 1, s.sum + e.value))
                case Some(s) if t < s.startMs - gapMs =>
                  // more than a gap BEFORE the open session: the batch twin
                  // (global sort) would close it as its own earlier session,
                  // never merge it forward — emit it closed right away
                  closed += finish(userId, SessionAcc(t, t, 1, e.value))
                case Some(s) =>
                  closed += finish(userId, s)
                  open = Some(SessionAcc(t, t, 1, e.value))
                case None =>
                  open = Some(SessionAcc(t, t, 1, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.endMs + gapMs)
            }
            closed.result().iterator
          }
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
