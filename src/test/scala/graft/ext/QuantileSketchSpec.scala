package graft.ext

import org.apache.spark.sql.SparkSession

import graft.SparkSpec

/**
 * Histogram quantile sketch ([[TextAnalysis.quantileSketchHist]]): the
 * error contract (approx sits in [exact − width + 1, exact]) and the
 * width→1 degeneration to the exact type-1 quantile.
 */
class QuantileSketchSpec extends SparkSpec {
  implicit lazy val s: SparkSession = spark
  import s.implicits._

  private val Qs = Seq(0.0, 0.1, 0.5, 0.9, 0.99, 1.0)

  private lazy val data = {
    val rnd = new scala.util.Random(7L)
    (0 until 2000).map { i =>
      val grp = s"g${i % 3}"
      // mixed-shape values: heavy tail in g0, uniform elsewhere
      val v = if (i % 3 == 0) (math.pow(rnd.nextDouble(), 3) * 5000).toLong
      else rnd.nextInt(1000).toLong
      (grp, v)
    }.toDF("grp", "v")
  }

  private def toMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(2)).toMap

  test("width=1 degenerates to the exact type-1 quantile") {
    val exact = toMap(TextAnalysis.quantiles(data, "grp", "v", Qs))
    val sk = toMap(TextAnalysis.quantileSketchHist(data, "grp", "v", Qs, 1L))
    assert(sk == exact)
  }

  test("error stays inside [0, width) below the exact quantile") {
    for (width <- Seq(7L, 50L, 400L)) {
      val exact = toMap(TextAnalysis.quantiles(data, "grp", "v", Qs))
      val sk = toMap(TextAnalysis.quantileSketchHist(data, "grp", "v", Qs, width))
      assert(sk.keySet == exact.keySet)
      sk.foreach { case (k, approx) =>
        val err = exact(k) - approx
        assert(err >= 0 && err < width,
          s"$k: exact=${exact(k)} approx=$approx width=$width")
      }
    }
  }

  test("robustZ: hand-computed median/MAD, outlier immunity, zero-MAD guard") {
    val df = Seq(
      ("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 3L), ("a", 4L, 4L), ("a", 5L, 100L),
      ("b", 6L, 5L), ("b", 7L, 5L), ("b", 8L, 5L), ("b", 9L, 9L)
    ).toDF("grp", "id", "v")
    val got = TextAnalysis.robustZ(df, "id", "grp", "v")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    def snap(x: Double) = math.floor(x * 1e6 + 0.50001) / 1e6
    // group a: median 3 (rank 3 of 5), devs {2,1,0,1,97} → MAD 1; the
    // outlier does NOT drag the center (mean/std would give z ≈ 1.8)
    assert(got(5L) == ((100L, 3L, 1L, snap(97.0 / 1.4826))))
    assert(got(4L) == ((4L, 3L, 1L, snap(1.0 / 1.4826))))
    assert(got(3L)._4 == 0.0)
    // group b: median 5, >half the group at the median → MAD 0 → z = 0
    assert(got(9L) == ((9L, 5L, 0L, 0.0)))
    assert(got(6L)._4 == 0.0)
  }

  test("weightedSample: deterministic, weight-biased, k per group") {
    // 50 heavy (w=500) + 50 light (w=5) docs per group: Exp(w) keys make
    // a heavy doc ~100x more likely to rank early
    val d = (0L until 200L).map { id =>
      (id, if (id < 100) "g0" else "g1", if (id % 2 == 0) 500L else 5L)
    }.toDF("doc_id", "grp", "w")
    val s1 = TextAnalysis.weightedSample(d, "doc_id", "grp", "w", 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(4))).toSet
    val s2 = TextAnalysis.weightedSample(d, "doc_id", "grp", "w", 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(4))).toSet
    assert(s1 == s2, "rerun must reproduce the sample exactly")
    assert(s1.count(_._2 == "g0") == 10 && s1.count(_._2 == "g1") == 10)
    val heavy = s1.count(t => t._1 % 2 == 0)
    assert(heavy >= 16, s"heavy-weight docs should dominate: $heavy/20")
    // a different salt reshuffles the draw
    val s3 = TextAnalysis.weightedSample(d, "doc_id", "grp", "w", 10, salt = 99L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(4))).toSet
    assert(s3.map(_._1) != s1.map(_._1))
  }

  test("sketch state is histogram-sized: one row per occupied bucket") {
    // 2000 rows, width 400 → at most ceil(5000/400)+1 buckets per group;
    // the aggregate the sketch answers from is that small, which is the
    // whole point vs ranking all n rows
    val hist = data
      .selectExpr("grp", "CAST(v AS BIGINT) DIV 400 AS bucket")
      .distinct().count()
    assert(hist <= 3 * 14, s"unexpected bucket blow-up: $hist")
  }
}
