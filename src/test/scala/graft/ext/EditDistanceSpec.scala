package graft.ext

import org.apache.spark.sql.SparkSession

import graft.SparkSpec

/** [[Dedup.editDistanceDups]]: prefix-blocked Levenshtein near-dup pairs —
  * verify distances, the normalization, the documented blocking miss, and
  * the hot-block guard. */
class EditDistanceSpec extends SparkSpec {
  implicit lazy val s: SparkSession = spark
  import s.implicits._

  private def run(rows: Seq[(Long, String)], maxDist: Int = 3,
      prefixLen: Int = 8, maxBlock: Option[Long] = None) =
    Dedup.editDistanceDups(rows.toDF("doc_id", "text"), "doc_id", "text",
        maxDist, prefixLen, maxBlock)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("finds tail-edit twins with the exact unit-cost distance") {
    val got = run(Seq(
      (1L, "shared prefix alpha beta"),
      (2L, "shared prefix alpha bexa"),   // 1 substitution
      (3L, "shared prefix alpha beta xy"), // 3 insertions (' xy')
      (4L, "totally different text here")))
    assert(got((1L, 2L)) === 1L)
    assert(got((1L, 3L)) === 3L)
    // bexa → beta xy costs 1 sub + 3 ins = 4 > maxDist → absent
    assert(!got.contains((2L, 3L)))
  }

  test("pairs beyond maxDist and cross-block pairs are absent") {
    val got = run(Seq(
      (1L, "shared prefix alpha beta"),
      (2L, "shared prefix alpha bexa"),
      (3L, "shared prefix gamma delta epsilon zeta"), // same block, far
      (4L, "SHARED-different start entirely")))       // other block
    assert(got.keySet === Set((1L, 2L)))
  }

  test("normalization: case and punctuation differences cost zero") {
    val got = run(Seq(
      (1L, "Hello, World! Alpha"),
      (2L, "hello world alpha")))
    assert(got((1L, 2L)) === 0L)
  }

  test("documented blocking miss: an edit inside the prefix splits the block") {
    val got = run(Seq(
      (1L, "abcdefgh tail tail"),
      (2L, "aXcdefgh tail tail"))) // 1 edit, but at position 2 < prefixLen
    assert(got.isEmpty)
  }

  test("maxBlock drops an oversized template block whole") {
    val hot = (1L to 10L).map(i => (i, s"template chrome $i"))
    val cold = Seq((100L, "cold pair item one"), (101L, "cold pair item onX"))
    val unguarded = run(hot ++ cold)
    assert(unguarded.keys.exists(_._1 <= 10L)) // template pairs flood in
    val guarded = run(hot ++ cold, maxBlock = Some(5L))
    assert(guarded.keySet === Set((100L, 101L)))
  }
}
