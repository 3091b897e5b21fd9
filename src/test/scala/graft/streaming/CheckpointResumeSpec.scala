package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.ext.Events

/**
 * The production recovery path: a sessionize query writing to a parquet
 * sink with a checkpoint, stopped mid-stream and restarted. The restarted
 * query must resume from the checkpointed offsets + state store — no lost
 * sessions, no duplicates — and the final sink content must equal the
 * batch twin over ALL events, including a session whose events straddle
 * the restart.
 */
class CheckpointResumeSpec extends SparkSpec {
  implicit lazy val s: SparkSession = spark
  import s.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("sessionize resumes from checkpoint across a stop/restart") {
    val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime
    def ev(u: Long, minutes: Long, v: Double) =
      StreamEvent(u, new Timestamp(base + minutes * 60000), "click", v)

    // before the restart: u1 session A open [0, 10]; u2 session [5]
    val before = Seq(ev(1, 0, 1.0), ev(1, 10, 2.0), ev(2, 5, 3.0))
    // after the restart: u1 extends session A (20 is within the 30-min
    // gap of 10 — the state-store recovery must merge it), then opens a
    // second session at 120
    val after = Seq(ev(1, 20, 4.0), ev(1, 120, 5.0))
    val flush1 = Seq(ev(99, 60 * 36, 0.0))
    val flush2 = Seq(ev(99, 60 * 72, 0.0))

    val dir = Files.createTempDirectory("graft_ckpt").toFile
    val outPath = s"$dir/out"
    val ckptPath = s"$dir/ckpt"
    val in = MemoryStream[StreamEvent]
    def start() = EventsStream.sessionize(in.toDS(), gapSec = 1800)
      .writeStream.format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", ckptPath)
      .outputMode(OutputMode.Append)
      .start()

    val q1 = start()
    try {
      in.addData(before: _*)
      q1.processAllAvailable()
    } finally q1.stop()

    val q2 = start()
    try {
      in.addData(after: _*)
      q2.processAllAvailable()
      in.addData(flush1: _*)
      q2.processAllAvailable()
      in.addData(flush2: _*)
      q2.processAllAvailable()
    } finally q2.stop()

    val got = spark.read.parquet(outPath).where($"user_id" < 99).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_sec"),
        r.getAs[Long]("end_sec"), r.getAs[Long]("n_events"),
        r.getAs[Double]("sum_value")))

    // no duplicate sessions from offset replay
    assert(got.length == got.distinct.length, got.mkString(", "))

    val batchDF = (before ++ after).zipWithIndex.map { case (e, i) =>
      (i.toLong, e.ts.getTime * 1000000L, e.user_id, e.event_type, e.value)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val want = Events.sessionize(batchDF).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_sec"),
        r.getAs[Long]("end_sec"), r.getAs[Long]("n_events"),
        r.getAs[Double]("sum_value")))
    assert(got.toSet == want.toSet, s"got=${got.toSet} want=${want.toSet}")
  }

  test("bm25Scores resumes from checkpoint: queries straddling the restart all score") {
    val docs = Seq(
      (0L, "spark shuffles data across the cluster"),
      (1L, "broadcast joins avoid the shuffle"),
      (2L, "watermarks bound streaming state")).toDF("doc_id", "text")
    val postings = graft.ext.Retrieval.bm25Index(docs, "doc_id", "text")
      .localCheckpoint()
    val stats = graft.ext.Retrieval.bm25CorpusStats(docs, "doc_id", "text")
    val t0 = 1700000000000L
    val before = Seq((100L, new Timestamp(t0), Seq("spark", "shuffle")))
    val after = Seq((101L, new Timestamp(t0 + 1000), Seq("data", "state")))
    val flush = Seq((999L, new Timestamp(t0 + 3600000L), Seq("flush")))

    val dir = Files.createTempDirectory("graft_ckpt_bm25").toFile
    val in = MemoryStream[(Long, Timestamp, Seq[String])]
    def start() = RetrievalStream.bm25Scores(
      in.toDF().toDF("query_id", "ts", "terms"), postings, stats,
      watermark = "5 seconds")
      .writeStream.format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode(OutputMode.Append)
      .start()

    val q1 = start()
    try { in.addData(before: _*); q1.processAllAvailable() } finally q1.stop()
    val q2 = start()
    try {
      in.addData(after: _*); q2.processAllAvailable()
      in.addData(flush: _*); q2.processAllAvailable()
    } finally q2.stop()

    val got = spark.read.parquet(s"$dir/out").where($"query_id" < 999).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id")) ->
        r.getAs[Double]("score")).toMap
    val want = graft.ext.Retrieval.bm25ScoreQueries(
      (before ++ after).map(q => (q._1, q._3)).toDF("query_id", "terms"),
      postings, stats).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.keySet == want.keySet, s"got=${got.keySet} want=${want.keySet}")
    want.foreach { case (k, v) => assertApprox(got(k), v, 1e-9) }
  }

  test("funnel resumes from checkpoint: the matched prefix survives the restart") {
    val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime
    def ev(u: Long, minutes: Long, tpe: String) =
      StreamEvent(u, new Timestamp(base + minutes * 60000), tpe, 0.0)
    val steps = Seq("view", "click", "purchase")

    // before the restart: u1 reaches depth 1 — flush0 at minute 75 moves
    // the watermark to minute 15: past view@10 (finalizes it) but NOT
    // past the post-restart click@20/purchase@30 (still admissible)
    val before = Seq(ev(1, 10, "view"))
    val flush0 = Seq(ev(99, 75, "view"))
    // after the restart: the recovered prefix must chain — click@20 and
    // purchase@30 only count because the checkpointed state remembers
    // view@10
    val after = Seq(ev(1, 20, "click"), ev(1, 30, "purchase"))
    val flush1 = Seq(ev(99, 60 * 48, "view"))

    val dir = Files.createTempDirectory("graft_funnel_ckpt").toFile
    val outPath = s"$dir/out"
    val ckptPath = s"$dir/ckpt"
    val in = MemoryStream[StreamEvent]
    def start() = EventsStream.funnel(in.toDS(), steps)
      .writeStream.format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", ckptPath)
      .outputMode(OutputMode.Append)
      .start()

    val q1 = start()
    try {
      in.addData(before: _*)
      q1.processAllAvailable()
      in.addData(flush0: _*)
      q1.processAllAvailable()
    } finally q1.stop()

    val q2 = start()
    try {
      in.addData(after: _*)
      q2.processAllAvailable()
      in.addData(flush1: _*)
      q2.processAllAvailable()
    } finally q2.stop()

    val rows = spark.read.parquet(outPath).where($"user_id" === 1).collect()
      .map(r => (r.getAs[scala.collection.Seq[Long]]("step_ms").toSeq,
        r.getAs[Long]("depth")))
    val best = rows.maxBy(_._2)
    assert(best == ((Seq(base + 10 * 60000, base + 20 * 60000,
      base + 30 * 60000), 3L)), rows.mkString(", "))
    // monotone updates only — no duplicate depth from offset replay
    assert(rows.map(_._2).distinct.length == rows.length, rows.mkString(", "))
  }

  test("as-of resumes from checkpoint: the carried reference survives the restart") {
    val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime
    def ev(id: Long, u: Long, minutes: Long, tpe: String, v: Double) =
      IdStreamEvent(id, u, new Timestamp(base + minutes * 60000), tpe, v)

    // before the restart: u1's click@0 plus enough watermark movement to
    // FINALIZE it into the one-row carried-reference state (flushA pushes
    // the watermark past minute 0); the probe arrives only after restart
    val before = Seq(ev(1, 1, 0, "click", 1.0))
    val flushA = Seq(ev(90, 99, 90, "click", 0.0))
    // after the restart: u1's purchase@100 must match the click recovered
    // from the state store, not come up empty
    val after = Seq(ev(2, 1, 100, "purchase", 2.0))
    val flushB = Seq(ev(91, 99, 60 * 36, "click", 0.0))
    val flushC = Seq(ev(92, 99, 60 * 72, "click", 0.0))

    val dir = Files.createTempDirectory("graft_ckpt_asof").toFile
    val outPath = s"$dir/out"
    val ckptPath = s"$dir/ckpt"
    val in = MemoryStream[IdStreamEvent]
    def start() = EventsStream.lastPriorEvent(in.toDS(), "purchase", "click")
      .writeStream.format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", ckptPath)
      .outputMode(OutputMode.Append)
      .start()

    val q1 = start()
    try {
      in.addData(before: _*)
      q1.processAllAvailable()
      in.addData(flushA: _*)
      q1.processAllAvailable()
    } finally q1.stop()

    val q2 = start()
    try {
      in.addData(after: _*)
      q2.processAllAvailable()
      in.addData(flushB: _*)
      q2.processAllAvailable()
      in.addData(flushC: _*)
      q2.processAllAvailable()
    } finally q2.stop()

    val got = spark.read.parquet(outPath).where($"user_id" === 1).collect()
      .map(r => (r.getAs[Long]("event_id"),
        Option(r.getAs[Any]("ref_event_id")).map(_.asInstanceOf[Long]),
        Option(r.getAs[Any]("lag_ms")).map(_.asInstanceOf[Long])))
    assert(got.toSeq == Seq((2L, Some(1L), Some(100L * 60000))), got.mkString(", "))
  }

  test("hourly resumes from checkpoint: a window spanning the restart is exact") {
    val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime
    def ev(minutes: Long, tpe: String, v: Double) =
      StreamEvent(1L, new Timestamp(base + minutes * 60000), tpe, v)

    // hour-0 window gets events on BOTH sides of the restart; the state
    // store must carry the partial aggregate across
    val before = Seq(ev(10, "click", 1.0), ev(40, "click", 2.0))
    val after = Seq(ev(50, "click", 4.0), ev(70, "buy", 8.0))
    val flush = Seq(StreamEvent(99, Timestamp.valueOf("2024-03-01 12:00:00"), "zz", 0.0))

    val dir = Files.createTempDirectory("graft_ckpt_h").toFile
    val outPath = s"$dir/out"
    val ckptPath = s"$dir/ckpt"
    val in = MemoryStream[StreamEvent]
    def start() = EventsStream.hourly(in.toDF())
      .writeStream.format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", ckptPath)
      .outputMode(OutputMode.Append)
      .start()

    val q1 = start()
    try {
      in.addData(before: _*)
      q1.processAllAvailable()
    } finally q1.stop()

    val q2 = start()
    try {
      in.addData(after: _*)
      q2.processAllAvailable()
      in.addData(flush: _*)
      q2.processAllAvailable()
    } finally q2.stop()

    val got = spark.read.parquet(outPath).where($"event_type" =!= "zz").collect()
      .map(r => (r.getAs[Long]("hour_start_sec"), r.getAs[String]("event_type"),
        r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toSet
    val hour0 = base / 1000
    assert(got == Set(
      (hour0, "click", 3L, 7.0),          // 2 events pre-restart + 1 post
      (hour0 + 3600, "buy", 1L, 8.0)))
  }

  test("hourlyAnomaly resumes from checkpoint: moments survive the restart") {
    val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime
    def ev(minutes: Long, tpe: String) =
      StreamEvent(1L, new Timestamp(base + minutes * 60000), tpe, 0.0)
    // pre-restart: hour-0 (2 events) and hour-1 (1 event) cells exist;
    // hour-0 is already finalized by the mid-stream flush, so its moment
    // contribution lives ONLY in the state store across the restart
    val before = Seq(ev(5, "t"), ev(10, "t"), ev(70, "t"), ev(200, "flushA"))
    // post-restart: hour-2 gets 4 events; the final distribution over
    // counts (2, 1, 4) must include the pre-restart cells
    val after = Seq(ev(125, "t"), ev(130, "t"), ev(135, "t"), ev(140, "t"))
    val flush1 = Seq(ev(24 * 60, "x"))
    val flush2 = Seq(ev(48 * 60, "x"))

    val dir = Files.createTempDirectory("graft_ckpt_anom").toFile
    val in = MemoryStream[StreamEvent]
    def start() = EventsStream.hourlyAnomaly(in.toDS())
      .writeStream.format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode(OutputMode.Append)
      .start()

    val q1 = start()
    try { in.addData(before: _*); q1.processAllAvailable() } finally q1.stop()
    val q2 = start()
    try {
      in.addData(after: _*); q2.processAllAvailable()
      in.addData(flush1: _*); q2.processAllAvailable()
      in.addData(flush2: _*); q2.processAllAvailable()
    } finally q2.stop()

    val got = spark.read.parquet(s"$dir/out").where($"event_type" === "t")
      .orderBy($"n_cells").collect()
      .map(r => (r.getAs[Long]("n_cells"), r.getAs[Long]("n_events"),
        r.getAs[Double]("mean_n"), r.getAs[Double]("std_n"))).toSeq
    // no duplicate cells from offset replay, counts in fold order
    assert(got.map(g => (g._1, g._2)) == Seq((1L, 2L), (2L, 1L), (3L, 4L)), got)
    // final moments span the restart: mean 7/3, pop-std of (2,1,4)
    val (_, _, mean, std) = got.last
    assert(math.abs(mean - 7.0 / 3.0) < 1e-9)
    assert(math.abs(std - math.sqrt((4.0 + 1.0 + 16.0) / 3.0 - 49.0 / 9.0)) < 1e-9)
  }

  test("transitions resumes from checkpoint: the anchor survives the restart") {
    val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime
    def ev(id: Long, u: Long, minutes: Long, tpe: String) =
      IdStreamEvent(id, u, new Timestamp(base + minutes * 60000), tpe, 0.0)
    // pre-restart: u1 view→click finalized by the mid-stream flush, so
    // across the restart u1's anchor (click) lives ONLY in the state store
    val before = Seq(ev(1, 1, 0, "view"), ev(2, 1, 10, "click"),
      ev(3, 99, 180, "flushA"))
    // post-restart: the next u1 event must pair with the RECOVERED anchor
    val after = Seq(ev(4, 1, 200, "purchase"))
    val flush1 = Seq(ev(90, 99, 24 * 60, "x"))
    val flush2 = Seq(ev(91, 99, 48 * 60, "x"))

    val dir = Files.createTempDirectory("graft_ckpt_trans").toFile
    val in = MemoryStream[IdStreamEvent]
    def start() = EventsStream.transitions(in.toDS())
      .writeStream.format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode(OutputMode.Append)
      .start()

    val q1 = start()
    try { in.addData(before: _*); q1.processAllAvailable() } finally q1.stop()
    val q2 = start()
    try {
      in.addData(after: _*); q2.processAllAvailable()
      in.addData(flush1: _*); q2.processAllAvailable()
      in.addData(flush2: _*); q2.processAllAvailable()
    } finally q2.stop()

    val got = spark.read.parquet(s"$dir/out").where($"user_id" === 1L)
      .orderBy($"ts_ms").collect()
      .map(r => (r.getAs[String]("prev_type"), r.getAs[String]("next_type")))
      .toSeq
    // no duplicates from offset replay; the cross-restart pair exists
    assert(got === Seq(("view", "click"), ("click", "purchase")), got)
  }

  test("abDeltas resumes from checkpoint: counted users never re-count") {
    val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime
    def ev(u: Long, minutes: Long, tpe: String) =
      StreamEvent(u, new Timestamp(base + minutes * 60000), tpe, 1.0)

    // before the restart: u1 sighted (no conversion), u2 sighted+converted
    val before = Seq(ev(1, 0, "view"), ev(2, 5, "purchase"))
    // after: u1 converts (only a d_conv delta may appear — the recovered
    // state must remember u1 was already counted), u2 converts AGAIN
    // (nothing may appear), u3 is new
    val after = Seq(ev(1, 30, "purchase"), ev(2, 35, "purchase"),
      ev(3, 40, "view"))

    val dir = Files.createTempDirectory("graft_ab_ckpt").toFile
    val outPath = s"$dir/out"
    val ckptPath = s"$dir/ckpt"
    val in = MemoryStream[StreamEvent]
    def start() = EventsStream.abDeltas(in.toDS(), "purchase")
      .writeStream.format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", ckptPath)
      .outputMode(OutputMode.Append)
      .start()

    val q1 = start()
    try {
      in.addData(before: _*)
      q1.processAllAvailable()
    } finally q1.stop()

    val q2 = start()
    try {
      in.addData(after: _*)
      q2.processAllAvailable()
    } finally q2.stop()

    val rows = spark.read.parquet(outPath).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("variant"),
        r.getAs[Long]("d_users"), r.getAs[Long]("d_conv")))
    // per-user lifetime sums: exactly one d_users each; d_conv only for
    // converters, exactly once — across the restart
    val perUser = rows.groupBy(_._1).map { case (u, rs) =>
      u -> ((rs.map(_._3).sum, rs.map(_._4).sum))
    }
    assert(perUser === Map(
      1L -> ((1L, 1L)), 2L -> ((1L, 1L)), 3L -> ((1L, 0L))), perUser)
    // the recovered state kept u1's arm stable across the restart
    val armsOfU1 = rows.filter(_._1 == 1L).map(_._2).distinct
    assert(armsOfU1.length === 1 &&
      armsOfU1.head === graft.ext.Export.mixBucketLong(1L, 2, 0L))
  }

  test("cupedDeltas resumes from checkpoint: quadratic moments telescope across restarts") {
    val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime
    def ev(u: Long, minutes: Long, tpe: String) =
      StreamEvent(u, new Timestamp(base + minutes * 60000), tpe, 1.0)
    val cutMs = base + 60 * 60000 // minute 60 splits pre/post

    // before restart: u1 has 2 pre events; after: 1 more pre + 1 post conv.
    // Recovered state must telescope x² through 2²−0² then 3²−2², never
    // restart the square from zero.
    val before = Seq(ev(1, 0, "view"), ev(1, 10, "view"))
    val after = Seq(ev(1, 20, "view"), ev(1, 90, "purchase"))

    val dir = Files.createTempDirectory("graft_cuped_ckpt").toFile
    val outPath = s"$dir/out"
    val ckptPath = s"$dir/ckpt"
    val in = MemoryStream[StreamEvent]
    def start() = EventsStream.cupedDeltas(in.toDS(), "purchase", cutMs)
      .writeStream.format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", ckptPath)
      .outputMode(OutputMode.Append)
      .start()

    val q1 = start()
    try { in.addData(before: _*); q1.processAllAvailable() } finally q1.stop()
    val q2 = start()
    try { in.addData(after: _*); q2.processAllAvailable() } finally q2.stop()

    import org.apache.spark.sql.functions.{sum => sqlSum}
    val sums = spark.read.parquet(outPath)
      .agg(sqlSum("d_n"), sqlSum("d_x"), sqlSum("d_y"), sqlSum("d_xx"),
        sqlSum("d_yy"), sqlSum("d_xy"))
      .collect().head
    assert((sums.getLong(0), sums.getLong(1), sums.getLong(2)) === ((1L, 3L, 1L)))
    // x = 3, y = 1 → Σx² = 9, Σy² = 1, Σxy = 3 — only if the squares
    // telescoped over the RECOVERED totals
    assert((sums.getLong(3), sums.getLong(4), sums.getLong(5)) === ((9L, 1L, 3L)))
  }

  test("sessionize survives a restart on the RocksDB state store backend") {
    // the production state backend for large state (spillable, compacted,
    // incremental checkpoints): same recovery contract as the default
    // HDFS-backed store — rocksdbjni ships with the Spark jars, so this
    // runs the REAL provider, not a stub
    val provider = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    val prevProvider = spark.conf.get("spark.sql.streaming.stateStore.providerClass", "")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
    try {
      val base = Timestamp.valueOf("2024-05-01 00:00:00").getTime
      def ev(u: Long, minutes: Long, v: Double) =
        StreamEvent(u, new Timestamp(base + minutes * 60000), "click", v)
      // u1's session straddles the restart; u2 closes before it
      val before = Seq(ev(1, 0, 1.0), ev(1, 10, 2.0), ev(2, 5, 3.0))
      val after = Seq(ev(1, 20, 4.0), ev(1, 120, 5.0))
      val dir = Files.createTempDirectory("graft_ckpt_rdb").toFile
      val in = MemoryStream[StreamEvent]
      def start() = EventsStream.sessionize(in.toDS(), gapSec = 1800)
        .writeStream.format("parquet")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ckpt")
        .outputMode(OutputMode.Append)
        .start()
      val q1 = start()
      try { in.addData(before: _*); q1.processAllAvailable() } finally q1.stop()
      val q2 = start()
      try {
        in.addData(after: _*)
        q2.processAllAvailable()
        in.addData(ev(99, 60 * 36, 0.0))
        q2.processAllAvailable()
        in.addData(ev(99, 60 * 72, 0.0))
        q2.processAllAvailable()
      } finally q2.stop()
      val got = spark.read.parquet(s"$dir/out").where($"user_id" < 99)
        .collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_sec"),
          r.getAs[Long]("end_sec"), r.getAs[Long]("n_events"),
          r.getAs[Double]("sum_value")))
      assert(got.length == got.distinct.length, got.mkString(", "))
      val batchDF = (before ++ after).zipWithIndex.map { case (e, i) =>
        (i.toLong, e.ts.getTime * 1000000L, e.user_id, e.event_type, e.value)
      }.toDF("event_id", "ts", "user_id", "event_type", "value")
      val want = Events.sessionize(batchDF).collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_sec"),
          r.getAs[Long]("end_sec"), r.getAs[Long]("n_events"),
          r.getAs[Double]("sum_value")))
      assert(got.toSet == want.toSet, s"got=${got.toSet} want=${want.toSet}")
    } finally {
      if (prevProvider.isEmpty)
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      else spark.conf.set("spark.sql.streaming.stateStore.providerClass", prevProvider)
    }
  }
}
