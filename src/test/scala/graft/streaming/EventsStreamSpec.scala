package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

class EventsStreamSpec extends SparkSpec {
  implicit lazy val s: SparkSession = spark
  import s.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(hour: Int, min: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $hour%02d:$min%02d:00")

  test("hourly: windowed agg finalizes once the watermark passes") {
    val in = MemoryStream[StreamEvent]
    val q = EventsStream.hourly(in.toDF())
      .writeStream.format("memory").queryName("hourly_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        StreamEvent(1, ts(0, 10), "click", 1.0),
        StreamEvent(2, ts(0, 40), "click", 3.0),
        StreamEvent(1, ts(0, 50), "buy", 10.0))
      q.processAllAvailable()
      // advance event time far enough to close hour 0 (2h watermark)
      in.addData(StreamEvent(9, ts(5), "click", 0.0))
      q.processAllAvailable()
      val rows = spark.table("hourly_out")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      val hour0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000
      assert(rows.toSet == Set((hour0, "click", 2L, 4.0), (hour0, "buy", 1L, 10.0)))
    } finally q.stop()
  }

  test("sessionize: gap closes a session, watermark flushes the last one") {
    val in = MemoryStream[StreamEvent]
    val q = EventsStream.sessionize(in.toDS(), gapSec = 1800)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append).start()
    try {
      // user 7: two events 10 min apart (one session), then a 2h gap → new session
      in.addData(
        StreamEvent(7, ts(0, 0), "click", 1.0),
        StreamEvent(7, ts(0, 10), "click", 2.0))
      q.processAllAvailable()
      in.addData(StreamEvent(7, ts(2, 0), "click", 5.0))
      q.processAllAvailable()
      // push the watermark far ahead so the open session times out
      in.addData(StreamEvent(99, ts(9), "click", 0.0))
      q.processAllAvailable()
      in.addData(StreamEvent(99, ts(23), "click", 0.0))
      q.processAllAvailable()
      val sessions = spark.table("sess_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
        .filter(_._1 == 7L).sortBy(_._2)
      val t0 = ts(0, 0).getTime / 1000
      assert(sessions.length == 2)
      assert(sessions(0) == ((7L, t0, t0 + 600, 2L, 3.0)))
      assert(sessions(1)._4 == 1L && sessions(1)._5 == 5.0)
    } finally q.stop()
  }

  test("as-of: an expired reference stops matching once the TTL passes") {
    val in = MemoryStream[IdStreamEvent]
    // 30-minute reference TTL, 10-minute watermark
    val q = EventsStream.lastPriorEvent(in.toDS(), "purchase", "click",
      watermark = "10 minutes", refTtlMs = 30L * 60000)
      .writeStream.format("memory").queryName("asof_ttl")
      .outputMode(OutputMode.Append).start()
    try {
      // click at 0:00; a purchase at 0:05 matches it
      in.addData(IdStreamEvent(1, 7, ts(0, 0), "click", 1.0),
        IdStreamEvent(2, 7, ts(0, 5), "purchase", 2.0))
      q.processAllAvailable()
      // watermark sweeps far past the click's TTL (0:30), dropping it;
      // a purchase at 2:00 then finds no reference
      in.addData(IdStreamEvent(3, 99, ts(1, 30), "click", 0.0))
      q.processAllAvailable()
      in.addData(IdStreamEvent(4, 7, ts(2, 0), "purchase", 4.0))
      q.processAllAvailable()
      in.addData(IdStreamEvent(5, 99, ts(4, 0), "click", 0.0))
      q.processAllAvailable()
      in.addData(IdStreamEvent(6, 99, ts(8, 0), "click", 0.0))
      q.processAllAvailable()
      val rows = spark.table("asof_ttl").where($"user_id" === 7)
        .collect()
        .map(r => r.getAs[Long]("event_id") ->
          Option(r.getAs[Any]("ref_event_id")).map(_.asInstanceOf[Long])).toMap
      assert(rows(2L) == Some(1L))  // in-TTL match
      assert(rows(4L) == None)      // reference expired before this probe
    } finally q.stop()
  }
}
