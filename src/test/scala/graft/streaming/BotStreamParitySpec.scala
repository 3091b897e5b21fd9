package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.ext.Events

/** The live bot monitor must agree with the batch readout on in-order
  * input, and diverge from it only in the one documented late-event way. */
class BotStreamParitySpec extends SparkSpec {
  implicit lazy val s: SparkSession = spark
  import s.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime

  private def ev(id: Long, u: Long, sec: Long, tpe: String) =
    IdStreamEvent(id, u, new Timestamp(base + sec * 1000), tpe, 0.0)

  // user 1: a bot — 35 events 10 s apart, one type.
  // user 2: a human — 6 events 2 h apart, two types.
  private lazy val events =
    (0 until 35).map(i => ev(i.toLong, 1L, 10L * i, "x")) ++
      (0 until 6).map(i => ev(100L + i, 2L, 7200L * i, if (i % 2 == 0) "x" else "y"))

  test("botDeltas: last update per user equals batch botScores") {
    val batch = Events.botScores(events.map(e =>
        (e.event_id, e.ts.getTime * 1000000L, e.user_id, e.event_type))
        .toDF("event_id", "ts", "user_id", "event_type"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getLong(6))).toMap

    val in = MemoryStream[IdStreamEvent]
    val q = EventsStream.botDeltas(in.toDS())
      .writeStream.format("memory").queryName("bot_parity")
      .outputMode(OutputMode.Update).start()
    try {
      val (a, b) = events.splitAt(20) // split mid-user-1 history
      in.addData(a); q.processAllAvailable()
      in.addData(b); q.processAllAvailable()
    } finally q.stop()

    val last = spark.table("bot_parity").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getLong(6)))
      .groupBy(_._1).map { case (u, rows) => u -> rows.maxBy(_._2) } // n grows
    assert(last.keySet == Set(1L, 2L))
    for ((u, (_, n, t, f, span, h, bot)) <- last) {
      val (bn, bt, bf, bspan, bh, bbot) = batch(u)
      assert((n, t, f, span, bot) == (bn, bt, bf, bspan, bbot), s"user $u")
      assertApprox(h, bh, 1e-12)
    }
    assert(batch(1L)._6 == 1L && batch(2L)._6 == 0L) // the flag separates
  }

  test("botDeltas: cross-batch late event counts its distance to the frontier") {
    val in = MemoryStream[IdStreamEvent]
    val q = EventsStream.botDeltas(in.toDS())
      .writeStream.format("memory").queryName("bot_late")
      .outputMode(OutputMode.Update).start()
    try {
      // frontier lands at t=7200 s; the late event (t=7170 s) is 30 s
      // from the frontier — a fast gap under the documented semantics,
      // where batch would have split the 0→7200 gap into two slow ones
      in.addData(Seq(ev(0, 9L, 0L, "x"), ev(1, 9L, 7200L, "x")))
      q.processAllAvailable()
      in.addData(Seq(ev(2, 9L, 7170L, "x")))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("bot_late").collect()
      .map(r => (r.getLong(1), r.getLong(3), r.getLong(4))).toSet
    assert(rows.contains((2L, 0L, 7200L))) // after batch 1: no fast gap
    assert(rows.contains((3L, 1L, 7200L))) // late event: fast vs frontier
  }

  test("seasonalScores: static cell stats score the live hourly stream exactly as batch") {
    val week = 7L * 24 * 3600 * 1000
    def sev(id: Long, ms: Long, tpe: String) =
      StreamEvent(id, new Timestamp(base + ms), tpe, 0.0)
    // the same (x, Fri 00) cell two weeks running (3 then 5 events) plus
    // a singleton cell — base is 2024-03-01 00:00 UTC, a Friday
    val evs =
      (0 until 3).map(i => sev(i.toLong, i * 1000L, "x")) ++
        (0 until 5).map(i => sev(10L + i, week + i * 1000L, "x")) ++
        Seq(sev(20L, 3600L * 1000, "x"))
    val batchDF = evs.zipWithIndex.map { case (e, i) =>
      (i.toLong, e.ts.getTime * 1000000L, e.user_id, e.event_type, e.value)
    }.toSeq.toDF("event_id", "ts", "user_id", "event_type", "value")
    val stats = Events.seasonalCellStats(batchDF)
    val batch = Events.seasonalAnomaly(batchDF).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(5), r.getDouble(6)))
      .toMap

    val in = MemoryStream[StreamEvent]
    val q = EventsStream.seasonalScores(in.toDF(), stats)
      .writeStream.format("memory").queryName("seasonal_live")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(evs: _*)
      q.processAllAvailable()
      in.addData(sev(99L, week * 3, "zz")) // advance the watermark
      q.processAllAvailable()
    } finally q.stop()
    val live = spark.table("seasonal_live").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(5), r.getDouble(6)))
      .toMap
    assert(live == batch) // zz has no cell in the stats → dropped
    // and the planted cell really separates: 3-vs-5 gives z = ±1
    val t0 = Timestamp.valueOf("2024-03-01 00:00:00").getTime / 1000
    assert(batch((t0, "x"))._3 == -1.0 && batch((t0 + week / 1000, "x"))._3 == 1.0)
  }

  test("botDeltas resumes from checkpoint: frontier and counters survive the restart") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bot_ckpt").toFile
    val got = scala.collection.mutable.ArrayBuffer.empty[BotUpdate]
    val in = MemoryStream[IdStreamEvent]
    def start() = EventsStream.botDeltas(in.toDS())
      .writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode(OutputMode.Update)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[BotUpdate], _: Long) =>
        got.synchronized { got ++= df.collect() }; ()
      }
      .start()

    val (a, b) = events.splitAt(20) // restart lands mid-user-1 history
    val q1 = start()
    try { in.addData(a); q1.processAllAvailable() } finally q1.stop()
    val q2 = start()
    try { in.addData(b); q2.processAllAvailable() } finally q2.stop()

    val batch = Events.botScores(events.map(e =>
        (e.event_id, e.ts.getTime * 1000000L, e.user_id, e.event_type))
        .toDF("event_id", "ts", "user_id", "event_type"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(6))).toMap
    val last = got.synchronized { got.toSeq }
      .groupBy(_.user_id).map { case (u, rs) => u -> rs.maxBy(_.n_events) }
    assert(last.keySet == Set(1L, 2L))
    for ((u, r) <- last)
      assert((r.n_events, r.n_types, r.n_fast, r.span_sec, r.is_bot) == batch(u),
        s"user $u diverged across the restart")
  }
}
