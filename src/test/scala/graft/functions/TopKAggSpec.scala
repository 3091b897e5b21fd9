package graft.functions

import org.apache.spark.sql.SparkSession

import graft.SparkSpec
import graft.ext.Events

/** The bounded-heap top-k Aggregator: window-identical results with a
  * hash-aggregate plan (no sort of group contents, no Window). */
class TopKAggSpec extends SparkSpec {
  implicit lazy val s: SparkSession = spark
  import s.implicits._

  private lazy val ev = Seq(
    // type x: user 1 × 4 events, user 2 × 4 (tie → user 1 first),
    // user 3 × 2, user 4 × 1
    (1L, "x"), (1L, "x"), (1L, "x"), (1L, "x"),
    (2L, "x"), (2L, "x"), (2L, "x"), (2L, "x"),
    (3L, "x"), (3L, "x"), (4L, "x"),
    // type y: a single user
    (9L, "y"))
    .zipWithIndex.map { case ((u, t), i) => (i.toLong, i.toLong * 1000L, u, t) }
    .toDF("event_id", "ts", "user_id", "event_type")

  test("topUsersPerType: window-identical ranking with ties broken by id") {
    val got = Events.topUsersPerType(ev, k = 2).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == Map(
      ("x", 1L) -> ((1L, 4L)), ("x", 2L) -> ((2L, 4L)),
      ("y", 1L) -> ((9L, 1L))))
  }

  test("topUsersPerType: k beyond group size emits every member once") {
    val got = Events.topUsersPerType(ev, k = 10)
      .where($"event_type" === "x").collect()
    assert(got.length == 4)
    assert(got.map(_.getLong(2)).toSet == Set(1L, 2L, 3L, 4L))
  }

  test("topUsersPerType plan: hash aggregate, no Sort of group contents, no Window") {
    val plan = Events.topUsersPerType(ev, k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(500))
    assert(!plan.contains("Window"), "window crept back in")
    // two exchanges: the (type, user) count's, then the type-keyed final —
    // but the PARTIAL top-k runs before the second, so that exchange
    // carries ≤ k-bounded buffers per partition, never group contents
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 2, plan)
    assert(plan.contains("partial_topkagg"), "map-side partial top-k missing")
    assert(!plan.contains("Sort ["), "group contents are being sorted")
  }

  test("topUsersDeltas: at capacity ≥ users the sketch is exact and matches batch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val batch = Events.topUsersPerType(ev, k = 2).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[graft.streaming.StreamEvent]
    val q = graft.streaming.EventsStream.topUsersDeltas(in.toDS(), capacity = 16, k = 2)
      .writeStream.format("memory").queryName("ss_topk")
      .outputMode("update").start()
    try {
      val evs = ev.collect().map(r => graft.streaming.StreamEvent(
        r.getLong(2), new java.sql.Timestamp(r.getLong(1) / 1000000L), r.getString(3), 0.0))
      val (a, b) = evs.splitAt(6)
      in.addData(a); q.processAllAvailable()
      in.addData(b); q.processAllAvailable()
    } finally q.stop()
    // last update per (type, rank): exact parity, err = 0 throughout
    val rows = spark.table("ss_topk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.forall(_._5 == 0L))
    val last = rows.zipWithIndex
      .groupBy(t => (t._1._1, t._1._2))
      .map { case (key, ts) => key -> ts.maxBy(_._2)._1 }
    for (((tpe, rank), (u, n)) <- batch)
      assert(last((tpe, rank)) == ((tpe, rank, u, n, 0L)), s"($tpe, $rank)")
  }

  test("topUsersDeltas: past capacity the heavy hitter survives with a bounded error") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // 1 heavy user (10 hits) + 6 one-hit users through capacity 3
    val evs = (0 until 10).map(i => graft.streaming.StreamEvent(
        1L, new java.sql.Timestamp(i * 1000L), "x", 0.0)) ++
      (0 until 6).map(i => graft.streaming.StreamEvent(
        100L + i, new java.sql.Timestamp(20000L + i * 1000L), "x", 0.0))
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[graft.streaming.StreamEvent]
    val q = graft.streaming.EventsStream.topUsersDeltas(in.toDS(), capacity = 3, k = 1)
      .writeStream.format("memory").queryName("ss_overflow")
      .outputMode("update").start()
    try { in.addData(evs); q.processAllAvailable() } finally q.stop()
    val top = spark.table("ss_overflow").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).last
    assert(top._2 == 1L)                        // the heavy hitter is rank 1
    assert(top._3 >= 10L && top._3 <= 10L + top._4) // true ≤ est ≤ true + err
  }

  test("topUsersDeltas resumes from checkpoint: counters survive the restart") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_ss_ckpt").toFile
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[graft.streaming.StreamEvent]
    def ev(u: Long, sec: Long) = graft.streaming.StreamEvent(
      u, new java.sql.Timestamp(sec * 1000L), "x", 0.0)
    def start() = graft.streaming.EventsStream.topUsersDeltas(in.toDS(), 8, 1)
      .writeStream.option("checkpointLocation", s"$dir/ckpt")
      .outputMode("update")
      .foreachBatch {
        (df: org.apache.spark.sql.Dataset[graft.streaming.TopUserUpdate], _: Long) =>
          got.synchronized {
            got ++= df.collect().map(t => (t.rank, t.user_id, t.n_est))
          }; ()
      }.start()

    val q1 = start()
    try { in.addData((0 until 4).map(i => ev(1L, i))); q1.processAllAvailable() }
    finally q1.stop()
    val q2 = start()
    try { in.addData((0 until 3).map(i => ev(1L, 10L + i))); q2.processAllAvailable() }
    finally q2.stop()
    // the recovered counter kept the pre-restart 4: final estimate is 7
    assert(got.synchronized(got.last) == ((1L, 1L, 7L)), got)
  }

  test("TopKAgg: merge trims to k and reduce skips losers without growing") {
    val a = new TopKAgg(2)
    val b = Seq(TopKEntry(9, 1), TopKEntry(7, 2))
    assert(a.reduce(b, TopKEntry(1, 3)) == b)              // loser skipped
    assert(a.reduce(b, TopKEntry(8, 3)) ==
      Seq(TopKEntry(9, 1), TopKEntry(8, 3)))                // mid insert
    assert(a.merge(b, Seq(TopKEntry(9, 0), TopKEntry(2, 4))) ==
      Seq(TopKEntry(9, 0), TopKEntry(9, 1)))                // tie → min id
    assert(a.finish(b) == Seq(Seq(9L, 1L), Seq(7L, 2L)))
  }
}
