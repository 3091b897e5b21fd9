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
