package graft.ext

import org.apache.spark.sql.SparkSession

import graft.SparkSpec

/** [[Boilerplate.scrub]]: segment-df boilerplate removal — the cap rule,
  * order-preserving reassembly, the all-boilerplate edge, and the bounded
  * broadcast shape. */
class BoilerplateSpec extends SparkSpec {
  implicit lazy val s: SparkSession = spark
  import s.implicits._

  // 6 docs; 'subscribe now' in 4 of them (df 4), 'promo x' in 2 (df 2),
  // heads unique. delim '|', cap 3 → only 'subscribe now' is boilerplate.
  private lazy val docs = Seq(
    (1L, "head one | subscribe now | promo x"),
    (2L, "head two | subscribe now"),
    (3L, "subscribe now | head three"),
    (4L, "head four|subscribe now|promo x"), // no spaces: trim normalizes
    (5L, "head five"),
    (6L, "subscribe now") // every segment boilerplate → empty clean_text
  ).toDF("doc_id", "text")

  private def run(maxDf: Long) =
    Boilerplate.scrub(docs, "doc_id", "text", "\\|", " | ", maxDf)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap

  test("segments over the cap are dropped; order and delimiters rebuilt") {
    val got = run(3L)
    assert(got(1L) === ((3L, 1L, "head one | promo x")))
    assert(got(2L) === ((2L, 1L, "head two")))
    // boilerplate at the FRONT: surviving order preserved
    assert(got(3L) === ((2L, 1L, "head three")))
    // whitespace-free delimiters trim to the same segments
    assert(got(4L) === ((3L, 1L, "head four | promo x")))
    assert(got(5L) === ((1L, 0L, "head five")))
  }

  test("a fully-boilerplate document stays a row with empty clean_text") {
    val got = run(3L)
    assert(got(6L) === ((1L, 1L, "")))
    assert(got.size === 6)
  }

  test("the cap boundary: df == maxDf is kept, df == maxDf+1 dropped") {
    // 'subscribe now' df=5 (docs 1,2,3,4,6): kept at cap 5, dropped at 4
    assert(run(5L)(2L) === ((2L, 0L, "head two | subscribe now")))
    assert(run(4L)(2L) === ((2L, 1L, "head two")))
  }

  test("boilerplateSegments reports the over-cap vocabulary with df") {
    val segs = Boilerplate.segments(docs, "doc_id", "text", "\\|")
    val b = Boilerplate.boilerplateSegments(segs, "doc_id", 3L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(b === Map("subscribe now" -> 5L))
  }

  test("plan: boilerplate side broadcasts; no cartesian anywhere") {
    val plan = Boilerplate.scrub(docs, "doc_id", "text", "\\|", " | ", 3L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
