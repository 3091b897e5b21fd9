package graft.ext

import org.apache.spark.sql.SparkSession

import graft.SparkSpec

/**
 * Exact water-fill epoch allocation (TextAnalysis.epochsPlan): the
 * budget splits by n^τ weight, each source caps at maxEpochs, and the
 * freed budget redistributes — Σ alloc = min(budget, Σ cap) EXACTLY.
 */
class EpochsPlanSpec extends SparkSpec {
  implicit lazy val s: SparkSession = spark
  import s.implicits._

  // one tiny source (4 tokens), one large (16 tokens); τ=0.5 → weights
  // 2 and 4 (ratio 1:2), caps 8 and 32 tokens at maxEpochs=2
  private lazy val docs = Seq(
    ("small", "a b c d"),
    ("large", "e f g h i j k l m n o p q r s t")
  ).toDF("source", "text")

  test("below every cap: pure temperature split, nothing saturated") {
    // B=18: λ = 18/(2+4) = 3 → small 6 tokens (1.5 ep), large 12 (0.75 ep)
    val rows = TextAnalysis.epochsPlan(docs, "source", "text",
      tau = 0.5, budgetTokens = 18L, maxEpochs = 2.0)
      .collect().map(r => r.getAs[String]("grp") -> r).toMap
    assert(!rows("small").getAs[Boolean]("saturated"))
    assert(!rows("large").getAs[Boolean]("saturated"))
    assertApprox(rows("small").getAs[Double]("alloc_tokens"), 6.0, 1e-6)
    assertApprox(rows("large").getAs[Double]("alloc_tokens"), 12.0, 1e-6)
    assertApprox(rows("small").getAs[Double]("epochs"), 1.5, 1e-6)
  }

  test("mid-fill: the small source caps and its freed budget moves to the large") {
    // B=28: uncapped λ = 28/6 ≈ 4.67 → small wants 9.33 > cap 8, so it
    // saturates; λ* = (28−8)/4 = 5 → large gets 20 (1.25 ep ≤ 2) and the
    // total allocation is the full budget exactly
    val rows = TextAnalysis.epochsPlan(docs, "source", "text",
      tau = 0.5, budgetTokens = 28L, maxEpochs = 2.0)
      .collect().map(r => r.getAs[String]("grp") -> r).toMap
    assert(rows("small").getAs[Boolean]("saturated"))
    assert(!rows("large").getAs[Boolean]("saturated"))
    assertApprox(rows("small").getAs[Double]("alloc_tokens"), 8.0, 1e-6)
    assertApprox(rows("small").getAs[Double]("epochs"), 2.0, 1e-6)
    assertApprox(rows("large").getAs[Double]("alloc_tokens"), 20.0, 1e-6)
    assertApprox(rows("large").getAs[Double]("epochs"), 1.25, 1e-6)
  }

  test("budget beyond all caps: everything saturates at maxEpochs") {
    // Σcap = 40 < B=100 → both capped, total allocation = Σcap not B
    val rows = TextAnalysis.epochsPlan(docs, "source", "text",
      tau = 0.5, budgetTokens = 100L, maxEpochs = 2.0).collect()
    assert(rows.forall(_.getAs[Boolean]("saturated")))
    rows.foreach(r => assertApprox(r.getAs[Double]("epochs"), 2.0, 1e-6))
    assertApprox(rows.map(_.getAs[Double]("alloc_tokens")).sum, 40.0, 1e-6)
  }
}
