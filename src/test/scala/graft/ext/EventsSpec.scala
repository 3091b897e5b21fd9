package graft.ext

import org.apache.spark.sql.SparkSession

import graft.SparkSpec

class EventsSpec extends SparkSpec {
  implicit lazy val s: SparkSession = spark
  import s.implicits._

  // (event_id, ts, user_id, event_type, value) — ts as epoch-ns Long,
  // matching the nanosAsLong reading of the events table
  private lazy val events = Seq(
    // user 1: click @100, click @150, purchase @150 (equal-ts ref visible),
    //         purchase @200 (matches the LATEST prior click, @150)
    (1L, 100L, 1L, "click", 1.0),
    (3L, 150L, 1L, "click", 3.0),
    (2L, 150L, 1L, "purchase", 2.0),
    (4L, 200L, 1L, "purchase", 4.0),
    // user 2: purchase @50 with no prior click → NULL ref columns
    (5L, 50L, 2L, "purchase", 5.0),
    (6L, 80L, 2L, "click", 6.0),
    // equal-ts reference tie for user 3: larger event_id (8) wins
    (7L, 10L, 3L, "click", 7.0),
    (8L, 10L, 3L, "click", 8.0),
    (9L, 20L, 3L, "purchase", 9.0),
    // other event types are ignored entirely
    (10L, 10L, 1L, "view", 10.0)
  ).toDF("event_id", "ts", "user_id", "event_type", "value")

  test("lastPriorEvent matches each probe to the latest at-or-before ref") {
    val m = Events.lastPriorEvent(events, "purchase", "click").collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(4)).map(_.asInstanceOf[Long]),
          Option(r.get(5)).map(_.asInstanceOf[Long])))).toMap
    assert(m(2L) == ((Some(3L), Some(0L))))   // equal-ts click visible
    assert(m(4L) == ((Some(3L), Some(50L))))  // latest prior, not first
    assert(m(5L) == ((None, None)))           // no prior ref → NULLs
    assert(m(9L) == ((Some(8L), Some(10L))))  // equal-ts ref tie → max id
    assert(!m.contains(10L))                  // non-probe types excluded
  }

  test("lastPriorEvent plans one window exchange, no nested loop") {
    val plan = Events.lastPriorEvent(events, "purchase", "click")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
    // all three ref columns ride ONE WindowExec (CollapseWindow fused them)
    assert(plan.split("\n").count(_.contains("Window [")) == 1, plan)
  }
}
