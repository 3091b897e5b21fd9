package graft.core

import graft.SparkSpec

class CosineAnalysisSpec extends SparkSpec {

  // Hand-computed fixture:
  //   A: {t1: 2, t2: 4}   B: {t1: 1, t3: 3}   C: {t2: 2}
  // maxes: A=4, B=3, C=2
  // normalized: A(t1)=0.5 A(t2)=1.0  B(t1)=1/3 B(t3)=1.0  C(t2)=1.0
  lazy val fixture = {
    val s = spark
    import s.implicits._
    Seq(
      MatrixElement("A", "t1", 2), MatrixElement("A", "t2", 4),
      MatrixElement("B", "t1", 1), MatrixElement("B", "t3", 3),
      MatrixElement("C", "t2", 2)).toDS()
  }

  def analysis = new CosineAnalysis(spark, axis = "y")

  def simMap(m: MatrixModel): Map[(String, String), Double] =
    m.allSimilarityValue.collect().map(s => (s.vector0, s.vector1) -> s.similarity_value).toMap

  test("maxValues: per-vector max") {
    val mv = analysis.maxValues(fixture).collect().map(m => m.axis -> m.max_value).toMap
    assert(mv === Map("A" -> 4.0, "B" -> 3.0, "C" -> 2.0))
  }

  test("normalize: divide by own vector's max") {
    val n = analysis.normalize(fixture).collect()
      .map(e => (e.y, e.x) -> e.normalized_value).toMap
    assertApprox(n(("A", "t1")), 0.5)
    assertApprox(n(("A", "t2")), 1.0)
    assertApprox(n(("B", "t1")), 1.0 / 3.0)
    assertApprox(n(("B", "t3")), 1.0)
    assertApprox(n(("C", "t2")), 1.0)
  }

  test("omitRatio filter is applied (reference bug fixed on purpose)") {
    val n = new CosineAnalysis(spark, "y", omitRatio = 0.4).normalize(fixture).collect()
    // B(t1)=0.333 dropped; everything else > 0.4 kept
    assert(n.length === 4)
    assert(!n.exists(e => e.y == "B" && e.x == "t1"))
  }

  test("alignedPairs: canonical order, one row per shared coordinate") {
    val p = analysis.alignedPairs(analysis.normalize(fixture)).collect()
    assert(p.length === 2)
    assert(p.forall(r => r.vector0 > r.vector1))
    val ba = p.find(r => r.vector0 == "B" && r.vector1 == "A").get
    assert(ba.prediction_axis === "t1")
    assertApprox(ba.value1, 1.0 / 3.0)
    assertApprox(ba.value2, 0.5)
  }

  test("sparse mode: intersection-restricted cosine; disjoint pair absent") {
    val sims = simMap(analysis.fit(fixture, isSparse = true))
    // On shared support both pairs are proportional => sim 1.0
    assert(sims.keySet === Set(("B", "A"), ("C", "A")))
    assertApprox(sims(("B", "A")), 1.0)
    assertApprox(sims(("C", "A")), 1.0)
  }

  test("dense mode: standard cosine; disjoint pair present with 0.0") {
    val sims = simMap(analysis.fit(fixture, isSparse = false))
    assert(sims.keySet === Set(("B", "A"), ("C", "A"), ("C", "B")))
    // dot(B,A)=1/6; |B|=sqrt(10)/3, |A|=sqrt(1.25)
    assertApprox(sims(("B", "A")), (1.0 / 6.0) / (math.sqrt(10.0 / 9.0) * math.sqrt(1.25)))
    assertApprox(sims(("C", "A")), 1.0 / math.sqrt(1.25))
    assertApprox(sims(("C", "B")), 0.0)
  }

  test("dense mode row count is C(V,2)") {
    assert(analysis.fit(fixture, isSparse = false).allSimilarityValue.count() === 3)
  }

  test("subset similarity filters both endpoints") {
    val m = analysis.fit(fixture, isSparse = false)
    val sub = m.similarity(Seq("A", "C")).collect()
    assert(sub.map(s => (s.vector0, s.vector1)).toSet === Set(("C", "A")))
  }

  test("scale invariance: scaling one vector leaves similarities unchanged") {
    val s = spark
    import s.implicits._
    val scaled = fixture.map(e => if (e.y == "A") e.copy(value = e.value * 7) else e)
    val base = simMap(analysis.fit(fixture, isSparse = false))
    val after = simMap(analysis.fit(scaled, isSparse = false))
    base.foreach { case (k, v) => assertApprox(after(k), v, 1e-9) }
  }

  test("axis=x transposes the matrix") {
    val s = spark
    import s.implicits._
    // transpose fixture: swap x/y, use axis=x => same similarities
    val t = fixture.map(e => MatrixElement(e.x, e.y, e.value))
    val sims = new CosineAnalysis(spark, axis = "x").fit(t, isSparse = true)
    assert(simMap(sims).keySet === Set(("B", "A"), ("C", "A")))
  }

  test("self-similarity of duplicated vector is 1.0 (dense)") {
    val s = spark
    import s.implicits._
    val dup = fixture.union(Seq(
      MatrixElement("D", "t1", 4), MatrixElement("D", "t2", 8)).toDS()) // D = 2*A
    val sims = simMap(analysis.fit(dup, isSparse = false))
    assertApprox(sims(("D", "A")), 1.0)
  }
}
