package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.ext.Events

/**
 * The streaming operators must agree with their batch twins on the same
 * events — the seam between `ext.Events` (int64-ns batch) and
 * `streaming.EventsStream` (timestamped unbounded) is where session/window
 * semantics could silently drift.
 */
class BatchStreamParitySpec extends SparkSpec {
  implicit lazy val s: SparkSession = spark
  import s.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  // A small deterministic event log: 3 users, gaps straddling 30 min.
  private lazy val events: Seq[StreamEvent] = {
    val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime
    def ev(u: Long, minutes: Long, tpe: String, v: Double) =
      StreamEvent(u, new Timestamp(base + minutes * 60000), tpe, v)
    Seq(
      ev(1, 0, "click", 1.0), ev(1, 10, "click", 2.0), ev(1, 70, "buy", 5.0),
      ev(2, 5, "click", 3.0), ev(2, 90, "click", 4.0), ev(2, 95, "buy", 6.0),
      ev(3, 50, "click", 7.0))
  }

  /** Batch frame in the ns-long shape ext.Events expects. */
  private lazy val batchDF = events.zipWithIndex.map { case (e, i) =>
    (i.toLong, e.ts.getTime * 1000000L, e.user_id, e.event_type, e.value)
  }.toDF("event_id", "ts", "user_id", "event_type", "value")

  test("sessionize: streaming sessions equal batch sessions") {
    val batch = Events.sessionize(batchDF).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_sec"),
        r.getAs[Long]("end_sec"), r.getAs[Long]("n_events"), r.getAs[Double]("sum_value")))
      .toSet

    val in = MemoryStream[StreamEvent]
    val q = EventsStream.sessionize(in.toDS(), gapSec = 1800)
      .writeStream.format("memory").queryName("parity_sess")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(events: _*)
      q.processAllAvailable()
      // push the watermark past everything so open sessions flush
      in.addData(StreamEvent(99, Timestamp.valueOf("2024-03-02 12:00:00"), "x", 0.0))
      q.processAllAvailable()
      in.addData(StreamEvent(99, Timestamp.valueOf("2024-03-03 12:00:00"), "x", 0.0))
      q.processAllAvailable()
      val stream = spark.table("parity_sess").where($"user_id" < 99)
        .collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_sec"),
          r.getAs[Long]("end_sec"), r.getAs[Long]("n_events"), r.getAs[Double]("sum_value")))
        .toSet
      // batch numbers sessions; compare the session CONTENT sets
      assert(stream == batch.map { case (u, st, en, n, sv) => (u, st, en, n, sv) })
    } finally q.stop()
  }

  test("sessionize: out-of-order events within the watermark match batch") {
    val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime
    def ev(u: Long, minutes: Long, v: Double) =
      StreamEvent(u, new Timestamp(base + minutes * 60000), "click", v)
    // u=5: event at minute 10, then a LATE event at minute 5 (within the
    //      30-min gap) — the open session's start must extend backwards.
    // u=6: event at minute 50, then a straggler at minute 10 (> gap before
    //      the open session's start) — a separate singleton session.
    val batch1 = Seq(ev(5, 10, 1.0), ev(6, 50, 2.0))
    val batch2 = Seq(ev(5, 5, 3.0), ev(6, 10, 4.0))
    val oooBatchDF = (batch1 ++ batch2).zipWithIndex.map { case (e, i) =>
      (i.toLong, e.ts.getTime * 1000000L, e.user_id, e.event_type, e.value)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val batch = Events.sessionize(oooBatchDF).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_sec"),
        r.getAs[Long]("end_sec"), r.getAs[Long]("n_events"), r.getAs[Double]("sum_value")))
      .toSet

    val in = MemoryStream[StreamEvent]
    val q = EventsStream.sessionize(in.toDS(), gapSec = 1800)
      .writeStream.format("memory").queryName("parity_ooo")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(batch1: _*)
      q.processAllAvailable()   // watermark now minute 50 - 1h (< 0): batch2 is admitted
      in.addData(batch2: _*)
      q.processAllAvailable()
      in.addData(StreamEvent(99, Timestamp.valueOf("2024-03-02 12:00:00"), "x", 0.0))
      q.processAllAvailable()
      in.addData(StreamEvent(99, Timestamp.valueOf("2024-03-03 12:00:00"), "x", 0.0))
      q.processAllAvailable()
      val stream = spark.table("parity_ooo").where($"user_id" < 99)
        .collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_sec"),
          r.getAs[Long]("end_sec"), r.getAs[Long]("n_events"), r.getAs[Double]("sum_value")))
        .toSet
      assert(stream == batch)
    } finally q.stop()
  }

  test("sessionize: two chained stragglers merge exactly like batch") {
    // r3's divergence, now closed: events more than a gap BEFORE the open
    // session used to be emitted as singletons immediately, so two such
    // stragglers within a gap of EACH OTHER couldn't merge. Sessions now
    // wait in state until the watermark passes end + gap, so the chain
    // merges exactly as the batch twin's global sort does.
    val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime
    def ev(minutes: Long, v: Double) =
      StreamEvent(7, new Timestamp(base + minutes * 60000), "click", v)
    // stragglers must sit INSIDE the watermark (≥ minute 100 − 60 = 40,
    // else the stateful operator drops them as late) while still > gap
    // before the open session's start (< minute 100 − 30 = 70)
    val open = Seq(ev(100, 1.0))               // open session at minute 100
    val stragglers = Seq(ev(45, 2.0), ev(60, 3.0)) // chained: 15 min apart
    def sessions(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getAs[Long]("start_sec"), r.getAs[Long]("end_sec"),
        r.getAs[Long]("n_events"))).toSet

    val oooDF = (open ++ stragglers).zipWithIndex.map { case (e, i) =>
      (i.toLong, e.ts.getTime * 1000000L, e.user_id, e.event_type, e.value)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val batch = sessions(Events.sessionize(oooDF).collect())
    // batch (global sort): stragglers merge into ONE session [45, 60]
    val min = 60L
    assert(batch == Set((base / 1000 + 45 * min, base / 1000 + 60 * min, 2L),
      (base / 1000 + 100 * min, base / 1000 + 100 * min, 1L)))

    val in = MemoryStream[StreamEvent]
    val q = EventsStream.sessionize(in.toDS(), gapSec = 1800)
      .writeStream.format("memory").queryName("parity_chained")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(open: _*)
      q.processAllAvailable()
      in.addData(stragglers: _*)
      q.processAllAvailable()
      in.addData(StreamEvent(99, Timestamp.valueOf("2024-03-02 12:00:00"), "x", 0.0))
      q.processAllAvailable()
      in.addData(StreamEvent(99, Timestamp.valueOf("2024-03-03 12:00:00"), "x", 0.0))
      q.processAllAvailable()
      val stream = sessions(
        spark.table("parity_chained").where($"user_id" < 99).collect())
      // streaming now merges the straggler chain exactly like batch
      assert(stream == batch)
    } finally q.stop()
  }

  test("retention: summed streaming hits equal batch cells, across slicings") {
    val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime
    val bucketMs = 3600000L // hourly cohorts keep the fixture small
    def ev(u: Long, minutes: Long) =
      StreamEvent(u, new Timestamp(base + minutes * 60000), "x", 0.0)
    // u1: hours 0/0/2 (the repeated hour-0 event must dedup); u2: hour 2
    // only; u3: hours 0 and 1, with the hour-0 event arriving one
    // micro-batch AFTER the hour-1 event in slicing B — an in-watermark
    // straggler that must still LOWER u3's cohort before finalization
    val all = Seq(
      ev(1, 10), ev(1, 20), ev(1, 130),
      ev(2, 125),
      ev(3, 100), ev(3, 45))
    val batchDf = all.zipWithIndex.map { case (e, i) =>
      (i.toLong, e.ts.getTime * 1000000L, e.user_id, e.event_type, e.value)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val batch = Events.retention(batchDf, bucketNs = bucketMs * 1000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

    // slicing B watermark walk (1 h delay): after slice 1 wm≈0, after
    // slice 2 (max minute 100) wm = minute 40 — so the minute-45
    // straggler in slice 3 is admissible and re-opens u3's minimum,
    // while u1's cohort finalizes by TIMEOUT + same-batch data merge
    val slicings = Seq(
      Seq(all),
      Seq(Seq(all(0), all(1)), Seq(all(4)), Seq(all(5), all(2), all(3))))
    for ((slices, si) <- slicings.zipWithIndex) {
      val in = MemoryStream[StreamEvent]
      val q = EventsStream.retention(in.toDS(), bucketMs)
        .writeStream.format("memory").queryName(s"parity_retention_$si")
        .outputMode(OutputMode.Append).start()
      try {
        slices.foreach { sl => in.addData(sl: _*); q.processAllAvailable() }
        // advance the watermark far past every fixture bucket start so
        // all cohorts finalize and flush
        in.addData(ev(99, 24 * 60)); q.processAllAvailable()
        in.addData(ev(99, 48 * 60)); q.processAllAvailable()
        val rows = spark.table(s"parity_retention_$si")
          .where($"user_id" < 99).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        assert(rows.distinct.length == rows.length,
          s"slicing $si emitted a duplicate (user, bucket) hit: ${rows.toSeq}")
        val cells = rows.groupBy(t => (t._1, t._2))
          .map { case (k, v) => k -> v.length.toLong }
        // batch cohorts are absolute buckets of epoch time; the stream's
        // are too (same division), so cells compare directly
        assert(cells == batch, s"slicing $si: $cells vs $batch")
      } finally q.stop()
    }
  }

  test("funnel: last streaming update per user equals batch, across slicings") {
    val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime
    def ev(u: Long, minutes: Long, tpe: String) =
      StreamEvent(u, new Timestamp(base + minutes * 60000), tpe, 0.0)
    // user 1 completes in order; user 2's purchase precedes its matched
    // click (depth stalls at 2); user 3 has a click but never a view
    // (depth 0); the step events arrive OUT OF ORDER but in-watermark
    val all = Seq(
      ev(1, 10, "view"), ev(1, 20, "click"), ev(1, 30, "purchase"),
      ev(2, 15, "view"), ev(2, 25, "purchase"), ev(2, 40, "click"),
      ev(3, 35, "click"))
    val batchDf = all.zipWithIndex.map { case (e, i) =>
      (i.toLong, e.ts.getTime, e.user_id, e.event_type, e.value)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val steps = Seq("view", "click", "purchase")
    val batch = Events.funnel(batchDf, steps).collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getLong(4))))
      .toMap

    // slicing A: everything in one micro-batch; slicing B: out-of-order
    // across micro-batches (click@40 for user 2 arrives first)
    val slicings = Seq(
      Seq(all),
      Seq(Seq(all(5), all(6)), Seq(all(0), all(3), all(4)),
        Seq(all(1), all(2))))
    for ((slices, si) <- slicings.zipWithIndex) {
      val in = MemoryStream[StreamEvent]
      val q = EventsStream.funnel(in.toDS(), steps)
        .writeStream.format("memory").queryName(s"parity_funnel_$si")
        .outputMode(OutputMode.Append).start()
      try {
        slices.foreach { sl => in.addData(sl: _*); q.processAllAvailable() }
        in.addData(ev(99, 24 * 60, "view"))
        q.processAllAvailable()
        in.addData(ev(99, 48 * 60, "view"))
        q.processAllAvailable()
        // keep each user's LAST update (largest depth — the prefix only
        // ever extends)
        val rows = spark.table(s"parity_funnel_$si")
          .where($"user_id" < 99).collect()
          .map(r => (r.getAs[Long]("user_id"),
            r.getAs[scala.collection.Seq[Long]]("step_ms").toSeq,
            r.getAs[Long]("depth")))
        val last = rows.groupBy(_._1).map { case (u, rs) =>
          val best = rs.maxBy(_._3)
          u -> ((best._2.lift(0), best._2.lift(1), best._2.lift(2),
            best._3))
        }
        val expect = batch.map { case (u, (t1, t2, t3, d)) =>
          u -> ((t1.map(_.asInstanceOf[Long]), t2.map(_.asInstanceOf[Long]),
            t3.map(_.asInstanceOf[Long]), d))
        }
        assert(last == expect, s"slicing $si: $last vs $expect")
      } finally q.stop()
    }
  }

  test("as-of join: streaming enrichment equals batch, late refs included") {
    val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime
    def ev(id: Long, u: Long, minutes: Long, tpe: String, v: Double) =
      IdStreamEvent(id, u, new Timestamp(base + minutes * 60000), tpe, v)
    // u=1: click@0 then purchase@10; a LATE click@5 arrives in the next
    //      micro-batch (inside the watermark) — the probe must wait for
    //      finalization and match the late click, exactly like batch
    // u=2: purchase@3 with no prior click → None refs
    val b1 = Seq(ev(1, 1, 0, "click", 1.0), ev(2, 1, 10, "purchase", 2.0),
      ev(3, 2, 3, "purchase", 3.0))
    val b2 = Seq(ev(4, 1, 5, "click", 4.0))
    val asofBatchDF = (b1 ++ b2)
      .map(e => (e.event_id, e.ts.getTime * 1000000L, e.user_id, e.event_type, e.value))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    // normalize lag to minutes so the ns (batch) and ms (stream) grains compare
    val batch = Events.lastPriorEvent(asofBatchDF, "purchase", "click").collect()
      .map(r => (r.getAs[Long]("event_id"),
        Option(r.getAs[Any]("ref_event_id")).map(_.asInstanceOf[Long]),
        Option(r.getAs[Any]("lag_ns")).map(_.asInstanceOf[Long] / 60000000000L)))
      .toSet
    assert(batch == Set((2L, Some(4L), Some(5L)), (3L, None, None)))

    val in = MemoryStream[IdStreamEvent]
    val q = EventsStream.lastPriorEvent(in.toDS(), "purchase", "click")
      .writeStream.format("memory").queryName("parity_asof")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(b1: _*)
      q.processAllAvailable()
      in.addData(b2: _*)
      q.processAllAvailable()
      in.addData(ev(99, 99, 36 * 60, "click", 0.0)) // advance the watermark
      q.processAllAvailable()
      in.addData(ev(98, 99, 72 * 60, "click", 0.0))
      q.processAllAvailable()
      val stream = spark.table("parity_asof").where($"user_id" < 99)
        .collect()
        .map(r => (r.getAs[Long]("event_id"),
          Option(r.getAs[Any]("ref_event_id")).map(_.asInstanceOf[Long]),
          Option(r.getAs[Any]("lag_ms")).map(_.asInstanceOf[Long] / 60000L)))
        .toSet
      assert(stream == batch)
    } finally q.stop()
  }

  test("hourly: streaming windows equal batch windows") {
    val batch = Events.hourly(batchDF).collect()
      .map(r => (r.getAs[Long]("hour_start_sec"), r.getAs[String]("event_type"),
        r.getAs[Long]("n_events"), r.getAs[Double]("sum_value")))
      .toSet

    val in = MemoryStream[StreamEvent]
    val q = EventsStream.hourly(in.toDF())
      .writeStream.format("memory").queryName("parity_hourly")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(events: _*)
      q.processAllAvailable()
      in.addData(StreamEvent(99, Timestamp.valueOf("2024-03-02 12:00:00"), "zz", 0.0))
      q.processAllAvailable()
      val stream = spark.table("parity_hourly").where($"event_type" =!= "zz")
        .collect()
        .map(r => (r.getAs[Long]("hour_start_sec"), r.getAs[String]("event_type"),
          r.getAs[Long]("n_events"), r.getAs[Double]("sum_value")))
        .toSet
      assert(stream == batch)
    } finally q.stop()
  }

  test("rolling: streaming trailing-window stats equal batch, across slicings") {
    val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime
    def ev(id: Long, u: Long, minutes: Long, v: Double) =
      IdStreamEvent(id, u, new Timestamp(base + minutes * 60000), "click", v)
    // values exactly representable in binary so sum order can't matter;
    // u=1 has a 3-deep frame, an equal-ts pair, and an aged-out event;
    // u=2 arrives OUT OF ORDER in the second slice (inside the watermark)
    val slice1 = Seq(
      ev(1, 1, 0, 1.0), ev(2, 1, 10, 2.0), ev(3, 1, 20, 4.0),
      ev(4, 1, 20, 8.0),                    // equal-ts peer of id 3
      ev(6, 2, 50, 16.0))
    val slice2 = Seq(
      ev(5, 1, 95, 32.0),                   // frame excludes minutes ≤ 35
      ev(7, 2, 40, 64.0))                   // late but in-watermark
    val all = slice1 ++ slice2
    val spanMs = 60L * 60000                // 1 hour

    val batchDF = all.map(e =>
      (e.event_id, e.ts.getTime * 1000000L, e.user_id, e.event_type, e.value))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("event_id"), r.getAs[Long]("n_window"), r.getAs[Double]("sum_window"))
    val batch = Events.rolling(batchDF, span = spanMs * 1000000L)
      .collect().map(key).toSet

    def run(slices: Seq[Seq[IdStreamEvent]], name: String): Set[(Long, Long, Double)] = {
      val in = MemoryStream[IdStreamEvent]
      val q = EventsStream.rolling(in.toDS(), spanMs = spanMs)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      try {
        slices.foreach { sl => in.addData(sl: _*); q.processAllAvailable() }
        // flush: push the watermark far past every real event
        in.addData(ev(98, 99, 24 * 60, 0.0)); q.processAllAvailable()
        in.addData(ev(99, 99, 48 * 60, 0.0)); q.processAllAvailable()
        spark.table(name).where($"user_id" < 99).collect().map(key).toSet
      } finally q.stop()
    }

    val sliced = run(Seq(slice1, slice2), "parity_roll")
    assert(sliced == batch, s"stream $sliced != batch $batch")
    // identical input in ONE slice must give identical output
    assert(run(Seq(all), "parity_roll_one") == batch)
  }

  test("hourlyAnomaly: final moments equal batch; re-scored cells match") {
    val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime
    def ev(minutes: Long, tpe: String) =
      StreamEvent(1L, new Timestamp(base + minutes * 60000), tpe, 0.0)
    // click: hour counts 2, 1, 3 (variance > 0); buy: 1, 1 (variance 0 —
    // batch drops the type, the stream emits its cells with z = 0)
    val all = Seq(
      ev(5, "click"), ev(10, "click"), ev(70, "click"),
      ev(125, "click"), ev(130, "click"), ev(135, "click"),
      ev(20, "buy"), ev(80, "buy"))

    val in = MemoryStream[StreamEvent]
    val q = EventsStream.hourlyAnomaly(in.toDS())
      .writeStream.format("memory").queryName("parity_anom")
      .outputMode(OutputMode.Append).start()
    val updates =
      try {
        in.addData(all: _*); q.processAllAvailable()
        in.addData(ev(24 * 60, "x")); q.processAllAvailable()
        in.addData(ev(48 * 60, "x")); q.processAllAvailable()
        spark.table("parity_anom").where($"event_type" =!= "x").collect()
          .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("hour_start_sec"),
            r.getAs[Long]("n_events"), r.getAs[Long]("n_cells"),
            r.getAs[Double]("mean_n"), r.getAs[Double]("std_n"), r.getAs[Double]("z")))
      } finally q.stop()

    val batchDF = all.zipWithIndex.map { case (e, i) =>
      (i.toLong, e.ts.getTime * 1000000L, e.user_id, e.event_type, e.value)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")

    // every batch hourly cell emitted exactly once
    val batchCells = Events.hourly(batchDF)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2))).toSet
    assert(updates.map(u => (u._1, u._2, u._3)).toSet == batchCells)
    assert(updates.length == updates.map(u => (u._1, u._2)).distinct.length)

    // each type's LAST update carries the batch twin's full distribution;
    // re-scoring every emitted cell against it reproduces the batch rows
    val lastByType = updates.groupBy(_._1).view.mapValues(_.maxBy(_._4)).toMap
    val batchRows = Events.hourlyAnomaly(batchDF).collect()
      .map(r => (r.getString(1), r.getLong(0)) -> r.getDouble(3)).toMap
    assert(batchRows.nonEmpty)
    batchRows.foreach { case ((tpe, hour), zWant) =>
      val (_, _, _, _, mean, std, _) = lastByType(tpe)
      val n = updates.find(u => u._1 == tpe && u._2 == hour).get._3
      assertApprox((n - mean) / std, zWant, 1e-9)
    }
    // the zero-variance type is absent from batch but streams with z = 0
    assert(batchRows.keySet.forall(_._1 == "click"))
    assert(updates.filter(_._1 == "buy").forall(_._7 == 0.0))
  }

  test("hourlyAnomaly: z scores against the distribution so far, in hour order") {
    val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime
    def ev(minutes: Long, tpe: String) =
      StreamEvent(1L, new Timestamp(base + minutes * 60000), tpe, 0.0)
    // counts 1, 1, 4: cell 1 → mean 1, std 0 → z 0; cell 2 → still 0;
    // cell 3 → mean 2, std √2 → z = 2/√2 = √2
    val all = Seq(ev(5, "t"), ev(65, "t"),
      ev(125, "t"), ev(130, "t"), ev(135, "t"), ev(140, "t"))
    val in = MemoryStream[StreamEvent]
    val q = EventsStream.hourlyAnomaly(in.toDS())
      .writeStream.format("memory").queryName("sofar_anom")
      .outputMode(OutputMode.Append).start()
    val got =
      try {
        in.addData(all: _*); q.processAllAvailable()
        in.addData(ev(24 * 60, "x")); q.processAllAvailable()
        in.addData(ev(48 * 60, "x")); q.processAllAvailable()
        spark.table("sofar_anom").where($"event_type" === "t")
          .orderBy($"n_cells").collect()
          .map(r => (r.getAs[Long]("n_cells"), r.getAs[Long]("n_events"),
            r.getAs[Double]("z")))
      } finally q.stop()
    assert(got.map(g => (g._1, g._2)).toSeq == Seq((1L, 1L), (2L, 1L), (3L, 4L)))
    assertApprox(got(0)._3, 0.0)
    assertApprox(got(1)._3, 0.0)
    assertApprox(got(2)._3, math.sqrt(2.0), 1e-9)
  }

  test("transitions: streamed pair counts equal batch minus (end); anchors are the (end) mass") {
    val idEvents = events.zipWithIndex.map { case (e, i) =>
      IdStreamEvent(i.toLong, e.user_id, e.ts, e.event_type, e.value)
    }
    val batch = Events.transitionMatrix(batchDF).collect()
      .map(r => (r.getAs[String]("prev_type"), r.getAs[String]("next_type")) ->
        r.getAs[Long]("n_transitions")).toMap
    val in = MemoryStream[IdStreamEvent]
    val q = EventsStream.transitions(in.toDS())
      .writeStream.format("memory").queryName("parity_trans")
      .outputMode(OutputMode.Append).start()
    val streamed =
      try {
        // two slices, second out-of-order-but-in-watermark vs the first
        val (a, b) = idEvents.splitAt(4)
        in.addData(a: _*); q.processAllAvailable()
        in.addData(b: _*); q.processAllAvailable()
        def flush(day: Int) = IdStreamEvent(90L + day, 99L,
          Timestamp.valueOf(s"2024-03-0$day 12:00:00"), "x", 0.0)
        in.addData(flush(2)); q.processAllAvailable()
        in.addData(flush(3)); q.processAllAvailable()
        spark.table("parity_trans").where($"user_id" < 99)
          .groupBy("prev_type", "next_type").count().collect()
          .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      } finally q.stop()
    // every non-terminal batch row is reproduced exactly
    assert(streamed === batch.filter(_._1._2 != "(end)"))
    // and the terminal mass equals one open anchor per user
    val endTotal = batch.collect { case ((_, "(end)"), n) => n }.sum
    assert(endTotal === events.map(_.user_id).distinct.size.toLong)
  }

  test("hourlyUniquesHll: finalized registers equal batch; estimate tracks exact uniques") {
    import graft.ext.TextAnalysis.{hllH2Sql, hllRhoSql, HllM}
    val in = MemoryStream[StreamEvent]
    val q = EventsStream.hourlyUniquesHll(in.toDF())
      .writeStream.format("memory").queryName("parity_hll")
      .outputMode(OutputMode.Append).start()
    // hour 0: click by users 1,2,3 (user 1 twice — dup must not count),
    // buy by 1; hour 1: click by 2
    val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime
    def ev(u: Long, minutes: Long, tpe: String) =
      StreamEvent(u, new Timestamp(base + minutes * 60000), tpe, 0.0)
    val data = Seq(ev(1, 0, "click"), ev(2, 10, "click"), ev(3, 20, "click"),
      ev(1, 30, "click"), ev(1, 40, "buy"), ev(2, 70, "click"))
    val streamed =
      try {
        in.addData(data: _*); q.processAllAvailable()
        in.addData(ev(9, 24 * 60, "x")); q.processAllAvailable()
        spark.table("parity_hll").where($"event_type" =!= "x").collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
          .toSet
      } finally q.stop()
    // independent batch spelling of the same register table
    val want = data.toDF()
      .select((unix_timestamp($"ts") - unix_timestamp($"ts") % 3600)
          .as("hour_start_sec"),
        $"event_type", expr(hllH2Sql("user_id")).as("h2"))
      .select($"hour_start_sec", $"event_type",
        expr(s"CAST(h2 % $HllM AS BIGINT)").as("j"),
        expr(hllRhoSql(s"CAST((h2 - h2 % $HllM) / $HllM AS BIGINT)")).as("rho"))
      .groupBy("hour_start_sec", "event_type", "j")
      .agg(max($"rho").cast("long").as("mj"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(streamed === want)
    // the sink snapshot reads out to near-exact uniques at this range
    // (tiny cardinalities sit in the linear-counting branch)
    val est = graft.ext.TextAnalysis.hllEstimateFromRegisters(
        spark.table("parity_hll").where($"event_type" =!= "x"),
        Seq("hour_start_sec", "event_type"))
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        r.getAs[Double]("hll_est")).toMap
    val exact = data.groupBy(e =>
        ((e.ts.getTime / 1000 / 3600) * 3600, e.event_type))
      .view.mapValues(_.map(_.user_id).distinct.size).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(est(k) - n) <= 1.0 + 0.2 * n, s"$k est=${est(k)} exact=$n")
    }
  }

  test("reachOverlap estimates read out of the streaming register sink unchanged") {
    // register maxes are associative: the all-hours max-merge of the
    // streaming sink per (type, j) IS the batch register table, so the
    // pair-overlap estimates must be bit-identical to batch reachOverlap
    val in = MemoryStream[StreamEvent]
    val q = EventsStream.hourlyUniquesHll(in.toDF())
      .writeStream.format("memory").queryName("overlap_hll")
      .outputMode(OutputMode.Append).start()
    val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime
    def ev(u: Long, minutes: Long, tpe: String) =
      StreamEvent(u, new Timestamp(base + minutes * 60000), tpe, 0.0)
    // A spans three hour windows (users 1..6), B sits in hour 3 with a
    // 3-user overlap (4..9), C is a disjoint singleton
    val data = (1L to 6L).map(u => ev(u, u * 25, "A")) ++
      (4L to 9L).map(u => ev(u, 200 + u, "B")) :+ ev(50L, 90, "C")
    try {
      in.addData(data: _*); q.processAllAvailable()
      in.addData(ev(99, 48 * 60, "zz")); q.processAllAvailable()
    } finally q.stop()
    val merged = spark.table("overlap_hll").where($"event_type" =!= "zz")
      .groupBy($"event_type".as("t"), $"j").agg(max($"mj").as("mj"))
    val streamEst = Events.reachOverlapEstimates(merged)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    val batchEst = Events.reachOverlap(
        data.toDF().select($"event_type", $"user_id"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    assert(streamEst == batchEst, s"stream $streamEst vs batch $batchEst")
    assert(streamEst.keySet == Set(("A", "B"), ("A", "C"), ("B", "C")))
  }

  test("streaming IVF search over the persisted index matches batch bit-for-bit") {
    import graft.ext.Embeddings
    val vecs = Map(
      0L -> Seq(0.0f, 0.1f), 1L -> Seq(10.0f, 10.0f), 2L -> Seq(0.5f, 0.1f),
      3L -> Seq(9.5f, 10.0f), 4L -> Seq(0.1f, 0.5f), 5L -> Seq(0.3f, 0.2f),
      6L -> Seq(10.2f, 9.8f))
    val blobs = vecs.toSeq.toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("ivfstream").toString
    Embeddings.saveIvfIndex(blobs, "vec_id", "embedding",
      kClusters = 2, iters = 2, dir = dir)
    val in = MemoryStream[(Long, Timestamp, Seq[Float])]
    val base = Timestamp.valueOf("2024-03-01 00:00:00")
    val q = EmbeddingsStream.ivfIndexTopK(spark, dir,
        in.toDF().toDF("query_id", "ts", "embedding"), k = 3, nprobe = 1)
      .writeStream.format("memory").queryName("ann_stream")
      .outputMode(OutputMode.Append).start()
    val queryIds = Seq(0L, 1L, 5L)
    val streamed = try {
      in.addData(queryIds.map(i => (i, base, vecs(i))): _*)
      q.processAllAvailable()
      // a far-future dummy advances the watermark and finalizes the rest
      in.addData((999L, new Timestamp(base.getTime + 3600L * 1000), vecs(0L)))
      q.processAllAvailable()
      spark.table("ann_stream").where($"query_id" =!= 999L)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2)).toSeq
    } finally q.stop()
    val batch = Embeddings.ivfIndexTopK(spark, dir,
        blobs.where($"vec_id".isin(queryIds: _*)),
        "vec_id", "embedding", k = 3, nprobe = 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(streamed == batch, s"stream $streamed vs batch $batch")
    assert(streamed.nonEmpty)
  }

  test("pathHits: streamed path counts equal batch topPaths, out-of-order in-horizon") {
    val idEvents = events.zipWithIndex.map { case (e, i) =>
      IdStreamEvent(i.toLong, e.user_id, e.ts, e.event_type, e.value)
    }
    // k above the path-type count → the full pre-cut table
    val batch = Events.topPaths(batchDF, len = 3, k = 1000).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val in = MemoryStream[IdStreamEvent]
    val q = EventsStream.pathHits(in.toDS(), len = 3)
      .writeStream.format("memory").queryName("parity_paths")
      .outputMode(OutputMode.Append).start()
    val streamed =
      try {
        // second slice is out-of-order vs the first but inside the horizon
        val (a, b) = idEvents.splitAt(4)
        in.addData(a: _*); q.processAllAvailable()
        in.addData(b: _*); q.processAllAvailable()
        def flush(day: Int) = IdStreamEvent(90L + day, 99L,
          Timestamp.valueOf(s"2024-03-0$day 12:00:00"), "x", 0.0)
        in.addData(flush(2)); q.processAllAvailable()
        in.addData(flush(3)); q.processAllAvailable()
        spark.table("parity_paths").where($"user_id" < 99)
          .groupBy("path").count().collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
      } finally q.stop()
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("cupedDeltas: summed moments equal the batch CUPED inputs, across slicings") {
    // batch cut = midpoint of the fixture's ns range; the stream twin
    // takes the same instant as its design constant (ms grid here)
    val tsNs = events.map(_.ts.getTime * 1000000L)
    val cutNs = tsNs.min + (tsNs.max - tsNs.min) / 2
    assert(cutNs % 1000000L == 0L, "fixture must sit on the ms grid")
    val cutMs = cutNs / 1000000L
    // independent recomputation of the per-user (x, y) the batch folds
    val xs = events.groupBy(_.user_id).map { case (u, es) =>
      u -> es.count(_.ts.getTime <= cutMs).toLong
    }
    val ys = events.groupBy(_.user_id).map { case (u, es) =>
      u -> es.count(e => e.ts.getTime > cutMs && e.event_type == "buy").toLong
    }
    val users = events.map(_.user_id).distinct
    val slicings = Seq(Seq(events), events.map(Seq(_)),
      Seq(events.take(3), events.drop(3)))
    for ((slices, si) <- slicings.zipWithIndex) {
      val in = MemoryStream[StreamEvent]
      val q = EventsStream.cupedDeltas(in.toDS(), "buy", cutMs)
        .writeStream.format("memory").queryName(s"parity_cuped_$si")
        .outputMode(OutputMode.Append).start()
      try {
        slices.foreach { sl => in.addData(sl: _*); q.processAllAvailable() }
        val sums = spark.table(s"parity_cuped_$si")
          .agg(sum("d_n"), sum("d_x"), sum("d_y"),
            sum("d_xx"), sum("d_yy"), sum("d_xy"))
          .collect().head
        assert(sums.getLong(0) === users.size.toLong, s"slicing $si n")
        assert(sums.getLong(1) === xs.values.sum, s"slicing $si sx")
        assert(sums.getLong(2) === ys.values.sum, s"slicing $si sy")
        assert(sums.getLong(3) === xs.values.map(x => x * x).sum, s"slicing $si sxx")
        assert(sums.getLong(4) === ys.values.map(y => y * y).sum, s"slicing $si syy")
        assert(sums.getLong(5) === users.map(u => xs(u) * ys(u)).sum, s"slicing $si sxy")
      } finally q.stop()
    }
    // transitivity: the batch one-row readout is pure arithmetic over
    // exactly these moments — EventsSpec pins that arithmetic against
    // the same independent recomputation
    val b = Events.abTestCuped(batchDF, "buy").collect().head
    val n0 = users.count(u => graft.ext.Export.mixBucketLong(u, 2, 0L) == 0L)
    assert(b.getAs[Long]("n0") === n0.toLong)
  }

  test("abDeltas: summed deltas equal batch arm counts, across slicings") {
    val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime
    def ev(u: Long, minutes: Long, tpe: String) =
      StreamEvent(u, new Timestamp(base + minutes * 60000), tpe, 1.0)
    // u1 converts after two sightings; u2 converts in their FIRST batch
    // (slicing B merges sight+conversion into one (1,1) delta); u3 never
    // converts; u4 converts twice (second purchase must not re-count)
    val all = Seq(
      ev(1, 0, "view"), ev(1, 30, "purchase"),
      ev(2, 5, "purchase"),
      ev(3, 10, "view"), ev(3, 40, "view"),
      ev(4, 15, "purchase"), ev(4, 50, "purchase"))
    val batchDf = all.zipWithIndex.map { case (e, i) =>
      (i.toLong, e.ts.getTime * 1000000L, e.user_id, e.event_type, e.value)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val b = Events.abTest(batchDf, "purchase").collect().head
    val batchArms = Map(
      0L -> ((b.getAs[Long]("n0"), b.getAs[Long]("c0"))),
      1L -> ((b.getAs[Long]("n1"), b.getAs[Long]("c1"))))

    val slicings = Seq(
      Seq(all),                                     // everything at once
      all.map(Seq(_)),                              // one event per batch
      Seq(all.take(3), all.slice(3, 5), all.drop(5)))
    for ((slices, si) <- slicings.zipWithIndex) {
      val in = MemoryStream[StreamEvent]
      val q = EventsStream.abDeltas(in.toDS(), "purchase")
        .writeStream.format("memory").queryName(s"parity_ab_$si")
        .outputMode(OutputMode.Append).start()
      try {
        slices.foreach { sl => in.addData(sl: _*); q.processAllAvailable() }
        val rows = spark.table(s"parity_ab_$si").collect()
          .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("variant"),
            r.getAs[Long]("d_users"), r.getAs[Long]("d_conv")))
        // each user contributes at most one d_users and one d_conv ever
        rows.groupBy(_._1).foreach { case (u, rs) =>
          assert(rs.map(_._3).sum <= 1L && rs.map(_._4).sum <= 1L,
            s"slicing $si user $u over-counted: ${rs.toSeq}")
        }
        // every user's variant matches the batch mix chain
        rows.foreach { case (u, v, _, _) =>
          assert(v === graft.ext.Export.mixBucketLong(u, 2, 0L))
        }
        val arms = rows.groupBy(_._2).map { case (v, rs) =>
          v -> ((rs.map(_._3).sum, rs.map(_._4).sum))
        }
        assert(arms === batchArms.filter { case (_, (n, _)) => n > 0L },
          s"slicing $si: $arms vs $batchArms")
      } finally q.stop()
    }
  }
}
