package graft.core

import graft.SparkSpec

/** The implemented normalizedType parameter (declared-but-dead in the
  * reference, MatrixCosineAnalyse.scala:15). */
class NormalizationSpec extends SparkSpec {

  private lazy val fixture = {
    val s = spark
    import s.implicits._
    Seq(
      MatrixElement("A", "t1", 2), MatrixElement("A", "t2", 4),
      MatrixElement("B", "t1", 1), MatrixElement("B", "t3", 3),
      MatrixElement("C", "t2", 2)).toDS()
  }

  private def sims(mode: String) =
    new CosineAnalysis(spark, "y", normalizedType = mode)
      .fit(fixture, isSparse = false).allSimilarityValue
      .collect().map(r => (r.vector0, r.vector1) -> r.similarity_value).toMap

  test("l2 mode produces unit vectors") {
    val a = new CosineAnalysis(spark, "y", normalizedType = "l2")
    val mods = a.vectorMods(a.normalize(fixture)).collect()
    mods.foreach(m => assertApprox(m.mod, 1.0))
  }

  test("none mode passes raw values through") {
    val a = new CosineAnalysis(spark, "y", normalizedType = "none")
    val n = a.normalize(fixture).collect().map(e => (e.y, e.x) -> e.normalized_value).toMap
    assert(n(("A", "t2")) == 4.0)
  }

  test("cosine similarity is invariant across normalization schemes") {
    val base = sims("max")
    Seq("l2", "none").foreach { mode =>
      val other = sims(mode)
      assert(other.keySet == base.keySet)
      base.foreach { case (k, v) => assertApprox(other(k), v, 1e-9) }
    }
  }

  test("unknown scheme is rejected") {
    intercept[IllegalArgumentException](new CosineAnalysis(spark, "y", normalizedType = "zscore"))
  }
}
