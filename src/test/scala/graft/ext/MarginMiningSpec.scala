package graft.ext

import org.apache.spark.sql.SparkSession

import graft.SparkSpec

/**
 * Margin-based pair mining (Embeddings.marginMine): the ratio margin
 * normalizes each best-pair cosine by its endpoints' local densities, so
 * a standout pair mines while a uniformly-dense neighborhood does not.
 */
class MarginMiningSpec extends SparkSpec {
  implicit lazy val s: SparkSession = spark
  import s.implicits._

  test("standout pair mines: margin, mined and mutual are hand-exact") {
    // query 100 along x; candidates: 1 identical (cos 1.0), 2 orthogonal
    // (cos 0.0), 3 at cos 0.6. k=2 → favg = (1.0+0.6)/2 = 0.8; c1's only
    // query is 100 → bavg = 1.0; margin = 2·1/(0.8+1.0) = 1.111111 (r6).
    val cand = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f)),
      (3L, Seq(0.6f, 0.8f))
    ).toDF("vec_id", "embedding")
    val q = Seq((100L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val rows = Embeddings.marginMine(cand, q, "vec_id", "embedding",
      k = 2, threshold = 1.05).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("query_id") == 100L)
    assert(r.getAs[Long]("cand_id") == 1L)
    assertApprox(r.getAs[Double]("cosine"), 1.0, 1e-6)
    assertApprox(r.getAs[Double]("margin"), 1.111111, 1e-6)
    assert(r.getAs[Boolean]("mined"))
    assert(r.getAs[Boolean]("mutual"))
  }

  test("uniform neighborhood does not mine: margin snaps to exactly 1") {
    // Two queries, two candidates, ALL pairwise cosines equal (0.6):
    // favg = bavg = cosine → margin = 1.0 < 1.05 → nothing mined.
    val cand = Seq(
      (1L, Seq(0.6f, 0.8f, 0.0f)),
      (2L, Seq(0.6f, 0.0f, 0.8f))
    ).toDF("vec_id", "embedding")
    val q = Seq(
      (100L, Seq(1.0f, 0.0f, 0.0f)),
      (101L, Seq(1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val rows = Embeddings.marginMine(cand, q, "vec_id", "embedding",
      k = 2, threshold = 1.05).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assertApprox(r.getAs[Double]("margin"), 1.0, 1e-6)
      assert(!r.getAs[Boolean]("mined"))
    }
  }

  test("mutual flag is false when the candidate prefers another query") {
    // c1 is best-for-both queries but strictly prefers q101 (cos 1.0 vs
    // 0.8) — q100's best pair exists yet fails the mutual check.
    val cand = Seq((1L, Seq(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val q = Seq(
      (100L, Seq(0.6f, 0.8f)),
      (101L, Seq(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val byQ = Embeddings.marginMine(cand, q, "vec_id", "embedding",
      k = 1, threshold = 1.05).collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Boolean]("mutual")).toMap
    assert(byQ(100L) === false)
    assert(byQ(101L) === true)
  }
}
