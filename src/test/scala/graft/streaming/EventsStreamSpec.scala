package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, count, floor, lit, unix_timestamp}
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

  test("hourlyValueHistogram: finalized counts match batch; quantiles agree") {
    val in = MemoryStream[StreamEvent]
    val q = EventsStream.hourlyValueHistogram(in.toDF(), width = 5L)
      .writeStream.format("memory").queryName("vhist_out")
      .outputMode(OutputMode.Append).start()
    val batch1 = Seq(
      StreamEvent(1, ts(0, 5), "click", 1.0),
      StreamEvent(2, ts(0, 15), "click", 4.9),   // same bucket 0 as 1.0
      StreamEvent(3, ts(0, 25), "click", 12.0),  // bucket 2
      StreamEvent(4, ts(0, 35), "buy", -3.0),    // bucket -1 (floor, not trunc)
      StreamEvent(5, ts(0, 45), "buy", 2.0))     // bucket 0
    val batch2 = Seq( // out-of-order but inside the 2h watermark
      StreamEvent(6, ts(0, 55), "click", 13.0),  // bucket 2 again
      StreamEvent(7, ts(1, 5), "click", 7.0))
    try {
      in.addData(batch1: _*)
      q.processAllAvailable()
      in.addData(batch2: _*)
      q.processAllAvailable()
      in.addData(StreamEvent(9, ts(6), "click", 0.0)) // advance watermark
      q.processAllAvailable()
      val streamed = spark.table("vhist_out")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
      // batch twin over the same finalized hours (0 and 1)
      val all = (batch1 ++ batch2).toDF()
      val want = all
        .groupBy(
          (unix_timestamp(col("ts")) - unix_timestamp(col("ts")) % 3600).as("h"),
          col("event_type"),
          floor(col("value") / 5.0).cast("long").as("bucket"))
        .count()
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(streamed == want, s"streamed $streamed\nwant $want")
      // the floor contract: -3.0 landed in bucket -1, not bucket 0
      assert(streamed.exists { case (_, t, b, _) => t == "buy" && b == -1L })
      // and a snapshot of the sink answers quantiles identically to the
      // batch sketch over the same rows
      val sk = graft.ext.TextAnalysis.quantilesFromHistogram(
        spark.table("vhist_out").withColumnRenamed("hour_start_sec", "h"),
        Seq("h", "event_type"), Seq(0.5, 0.9), 5L, "value_q")
        .collect().map(r =>
          (r.getLong(0), r.getString(1), r.getDouble(2)) -> r.getLong(3)).toMap
      val skBatch = graft.ext.TextAnalysis.quantilesFromHistogram(
        all.groupBy(
          (unix_timestamp(col("ts")) - unix_timestamp(col("ts")) % 3600).as("h"),
          col("event_type"),
          floor(col("value") / 5.0).cast("long").as("bucket"))
          .agg(count(lit(1)).as("c")),
        Seq("h", "event_type"), Seq(0.5, 0.9), 5L, "value_q")
        .collect().map(r =>
          (r.getLong(0), r.getString(1), r.getDouble(2)) -> r.getLong(3)).toMap
      assert(sk == skBatch && sk.nonEmpty)
    } finally q.stop()
  }

  test("decayedEngagement: incremental decay matches batch after re-aging") {
    val in = MemoryStream[StreamEvent]
    val q = EventsStream.decayedEngagement(in.toDF().as[StreamEvent])
      .writeStream.format("memory").queryName("decay_out")
      .outputMode(OutputMode.Update).start()
    val all = Seq(
      StreamEvent(1, ts(0), "click", 2.0),
      StreamEvent(1, ts(5), "click", 4.0),
      StreamEvent(2, ts(3), "click", 1.0),
      StreamEvent(1, ts(2), "click", 8.0),  // late for user 1 (batch 2)
      StreamEvent(2, ts(9), "click", 1.0))
    try {
      in.addData(all.take(3): _*)
      q.processAllAvailable()
      in.addData(all.drop(3): _*)
      q.processAllAvailable()
      // n_events is monotone per user → max-n row is the final state
      val fin = spark.table("decay_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4)))
        .groupBy(_._1).map { case (u, rows) => u -> rows.maxBy(_._3) }
      // batch twin over the same events (ts in epoch-ns), aged to tmax
      val batchDf = all.map(e => (e.user_id, e.ts.getTime * 1000000L, e.value))
        .toDF("user_id", "ts", "value")
      val want = graft.ext.Events.decayedEngagement(batchDf)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
          r.getDouble(3)))).toMap
      val tmaxMs = all.map(_.ts.getTime).max
      val lambdaMs = math.log(2.0) / (7.0 * 24 * 3600 * 1000)
      def snap(x: Double) = math.floor(x * 1e6 + 0.50001) / 1e6
      fin.foreach { case (u, (_, asOf, n, de, dv)) =>
        val f = math.exp(-lambdaMs * (tmaxMs - asOf))
        val (wn, wde, wdv) = want(u)
        assert(n == wn)
        assert(math.abs(snap(de * f) - wde) <= 2e-6, s"user $u events")
        assert(math.abs(snap(dv * f) - wdv) <= 2e-6, s"user $u value")
      }
      assert(fin.keySet == Set(1L, 2L))
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

  test("rollingReach: one hit per (user, window); sums match the batch curve") {
    val in = MemoryStream[StreamEvent]
    // "days" are hours here to keep the fixture compact
    val dayMs = 3600000L
    val q = EventsStream.rollingReach(in.toDS(), windowDays = 2,
      dayMs = dayMs, watermark = "10 minutes")
      .writeStream.format("memory").queryName("reach_out")
      .outputMode(OutputMode.Append).start()
    val evs = Seq(
      StreamEvent(1, ts(0, 0), "click", 1.0),
      StreamEvent(1, ts(1, 5), "click", 1.0),  // windows {1,2}; {0,1} overlap dedups
      StreamEvent(2, ts(1, 10), "click", 1.0),
      StreamEvent(1, ts(0, 30), "click", 1.0)) // out-of-order, same day → no new hit
    try {
      in.addData(evs.take(3): _*)
      q.processAllAvailable()
      in.addData(evs.drop(3): _*)
      q.processAllAvailable()
      val hits = spark.table("reach_out").collect()
        .map(r => (r.getAs[Long]("day_index"), r.getAs[Long]("user_id")))
      assert(hits.length == hits.distinct.length, hits.mkString(", "))
      val got = hits.groupBy(_._1).view.mapValues(_.length.toLong).toMap
      val batchDF = evs.map(e => (e.user_id, e.ts.getTime))
        .toDF("user_id", "ts")
      val want = graft.ext.Events.rollingReach(batchDF, windowDays = 2,
        dayTicks = dayMs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === want, s"got=$got want=$want")
      // hand-check relative to the fixture's base day (epoch-hour index)
      val d0 = got.keys.min
      assert(got === Map(d0 -> 1L, (d0 + 1) -> 2L, (d0 + 2) -> 2L))
    } finally q.stop()
  }

  test("clickAttribution: stream-stream interval join matches batch pairs") {
    val in = MemoryStream[IdStreamEvent]
    val q = EventsStream.clickAttribution(in.toDS(), "purchase", "click",
      horizonSec = 3600, watermark = "30 minutes")
      .writeStream.format("memory").queryName("attr_out")
      .outputMode(OutputMode.Append).start()
    val evs = Seq(
      IdStreamEvent(1, 7, ts(0, 0), "click", 1.0),
      IdStreamEvent(2, 7, ts(0, 30), "click", 1.0),
      IdStreamEvent(3, 7, ts(0, 45), "purchase", 9.0), // matches 1, 2
      IdStreamEvent(4, 8, ts(0, 50), "purchase", 5.0), // user 8: no clicks
      IdStreamEvent(5, 7, ts(2, 0), "purchase", 2.0),  // clicks too old
      // out-of-order click inside the watermark, arriving AFTER its
      // purchase — the join must still find the already-buffered probe
      IdStreamEvent(6, 7, ts(0, 40), "click", 1.0))
    try {
      in.addData(evs.take(5): _*)
      q.processAllAvailable()
      in.addData(evs.drop(5): _*)
      q.processAllAvailable()
      val rows = spark.table("attr_out").collect()
        .map(r => (r.getAs[Long]("purchase_id"), r.getAs[Long]("click_id")))
        .toSet
      assert(rows == Set((3L, 1L), (3L, 2L), (3L, 6L)))
      // batch parity on the identical event set (ns horizon = 3600s)
      val batch = graft.ext.Events.clickAttribution(
        graft.ext.Events.normalizeTs(evs.toDF()), "purchase", "click",
        horizon = 3600L * 1000000000L)
        .collect()
        .map(r => (r.getAs[Long]("purchase_id"), r.getAs[Long]("click_id")))
        .toSet
      assert(batch == rows)
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

  /** Run lastPriorEvent over explicit micro-batches; returns user 7's
    * probes as event_id → (ref_event_id, lag_ms). */
  private def runAsofBatches(name: String, batches: Seq[Seq[IdStreamEvent]],
      refTtlMs: Long): Map[Long, (Option[Long], Option[Long])] = {
    val in = MemoryStream[IdStreamEvent]
    val q = EventsStream.lastPriorEvent(in.toDS(), "purchase", "click",
      watermark = "10 minutes", refTtlMs = refTtlMs)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      // two trailing no-op-ish batches flush timeout-driven finalization
      in.addData(IdStreamEvent(900, 99, ts(12, 0), "click", 0.0))
      q.processAllAvailable()
      in.addData(IdStreamEvent(901, 99, ts(23, 0), "click", 0.0))
      q.processAllAvailable()
      spark.table(name).where($"user_id" === 7).collect().map { r =>
        r.getAs[Long]("event_id") -> (
          (Option(r.getAs[Any]("ref_event_id")).map(_.asInstanceOf[Long]),
            Option(r.getAs[Any]("lag_ms")).map(_.asInstanceOf[Long])))
      }.toMap
    } finally q.stop()
  }

  test("as-of TTL is match-time exact: beyond-TTL probe unmatched even inside the watermark") {
    // TTL 30 min. click at 0:00; purchase at 0:30 sits exactly AT the TTL
    // (lag == TTL → matched); purchase at 0:45 is beyond it. The 0:45
    // probe finalizes in the very trigger where the watermark first
    // passes it — the reference is still in (or just leaving) state, so
    // only the MATCH-TIME rule can unmatch it; watermark-time cleanup
    // alone would have let it match.
    val ttl = 30L * 60000
    val events = Seq(
      IdStreamEvent(1, 7, ts(0, 0), "click", 1.0),
      IdStreamEvent(2, 7, ts(0, 30), "purchase", 2.0),
      IdStreamEvent(3, 7, ts(0, 45), "purchase", 3.0))
    val coarse = runAsofBatches("asof_coarse",
      Seq(events, Seq(IdStreamEvent(800, 99, ts(2, 0), "click", 0.0))), ttl)
    assert(coarse(2L) == ((Some(1L), Some(ttl))))  // lag == TTL: matched
    assert(coarse(3L) == ((None, None)))           // lag > TTL: unmatched
  }

  test("as-of output is invariant to micro-batch slicing of the same input") {
    val ttl = 30L * 60000
    val u7 = Seq(
      IdStreamEvent(1, 7, ts(0, 0), "click", 1.0),
      IdStreamEvent(2, 7, ts(0, 30), "purchase", 2.0),
      IdStreamEvent(3, 7, ts(0, 45), "purchase", 3.0))
    // coarse: everything in one batch, then one big watermark jump
    val coarse = runAsofBatches("asof_slice_a",
      Seq(u7, Seq(IdStreamEvent(800, 99, ts(2, 0), "click", 0.0))), ttl)
    // fine: one event per batch with filler nudging the watermark between
    // them — including a batch where the watermark has already passed
    // refTs + TTL (state cleanup fired) BEFORE the 0:45 probe arrives
    val fine = runAsofBatches("asof_slice_b", Seq(
      Seq(u7(0)),
      Seq(IdStreamEvent(801, 99, ts(0, 20), "click", 0.0)),
      Seq(u7(1)),
      Seq(IdStreamEvent(802, 99, ts(0, 50), "click", 0.0)),
      Seq(u7(2)),
      Seq(IdStreamEvent(803, 99, ts(2, 0), "click", 0.0))), ttl)
    assert(coarse == fine, s"coarse=$coarse fine=$fine")
    assert(fine(2L) == ((Some(1L), Some(ttl))))
    assert(fine(3L) == ((None, None)))
  }
}
