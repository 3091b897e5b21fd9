package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Batch analytics over the event stream table: tumbling-window aggregation
 * and gap-based sessionization.
 *
 * The events table stores TIMESTAMP(NANOS), which Spark's parquet reader
 * rejects; with `spark.sql.legacy.parquet.nanosAsLong` (set by
 * [[graft.SparkSessions]]) `ts` arrives as an epoch-nanosecond Long. All
 * window arithmetic here stays in exact int64 nanoseconds — no float
 * timestamps, no timezone dependence, and a double would silently lose
 * precision above 2^53 ns (~104 days). The streaming twin of these
 * operators is [[graft.streaming.EventsStream]].
 *
 * Scale: both operators are single-shuffle — hourly by (hour, type) with
 * map-side partial aggregation; sessionize by user_id (window + final agg
 * reuse the same hash partitioning, so Catalyst plans one exchange).
 */
object Events {

  val NsPerSec: Long = 1000000000L
  val NsPerHour: Long = 3600L * NsPerSec
  val DefaultGapNs: Long = 30L * 60 * NsPerSec

  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/events.parquet")

  /**
   * Tumbling 1-hour windows per event type: event counts, value sum/avg.
   * `hour_start_sec` is the window's epoch-second start.
   */
  def hourly(events: DataFrame): DataFrame =
    events
      .groupBy(
        (expr(s"ts div $NsPerHour") * 3600L).as("hour_start_sec"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"),
        avg(col("value")).as("avg_value"))

  /**
   * Gap-based sessionization: a new session starts when a user's gap since
   * their previous event exceeds `gapNs`. Session ids number 1..n per user
   * in time order. One row per session with its span and value total.
   */
  def sessionize(events: DataFrame, gapNs: Long = DefaultGapNs): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val numbered = events
      .withColumn("prev", lag("ts", 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev").isNull || col("ts") - col("prev") > gapNs, 1L).otherwise(0L))
      .withColumn("session_id",
        sum("new_sess").over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    numbered
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        expr(s"min(ts) div $NsPerSec").as("start_sec"),
        expr(s"max(ts) div $NsPerSec").as("end_sec"),
        sum(col("value")).as("sum_value"))
  }
}
