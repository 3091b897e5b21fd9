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

  test("autoRouteAligned: the kernel choice flips across planted regimes (r13 router)") {
    val s = spark
    import s.implicits._
    // benign: 12 vectors, each on its own 2 coordinates plus one shared
    // pair per consecutive vectors — small flat surface, under budget.
    val benign = for { v <- 0 until 12; c <- Seq(s"b$v", s"b${v + 1}") }
      yield ("benign", s"v$v", c)
    // skewed: 12 vectors, one private coordinate each (df = 1, zero
    // pairs) + one hot coordinate on 5 of them — the WHOLE surface is
    // C(5,2) = 10 pairs, affordable but 100 % concentrated.
    val skewed = (0 until 12).map(v => ("skewed", s"v$v", s"p$v")) ++
      (0 until 5).map(v => ("skewed", s"v$v", "hot"))
    // headed: 12 vectors all sharing 3 boilerplate coordinates (df = 12
    // each: 3·C(12,2) = 198 pairs > the 12·8 budget) + a private one.
    val headed = (0 until 12).flatMap(v =>
      ("headed", s"v$v", s"q$v") +: (0 until 3).map(c => ("headed", s"v$v", s"bp$c")))
    val cells = (benign ++ skewed ++ headed).toDF("regime", "y", "x")
    val got = CosineAnalysis.autoRouteAligned(cells, "y", "x", "regime",
        maxDf = 4L, budgetPairsPerVec = 8L)
      .collect().map(r => r.getString(0) -> r.getString(9)).toMap
    assert(got == Map("benign" -> "exact", "skewed" -> "salted",
      "headed" -> "dfcap"), got.toString)
  }

  test("autoAlignedPairs dispatches to the chosen kernel's exact rows") {
    val s = spark
    import s.implicits._
    def rows(ds: org.apache.spark.sql.Dataset[FactorNormalizedValue]) =
      ds.collect().map(p => (p.vector0, p.vector1, p.prediction_axis)).sorted.toSeq
    // the tiny fixture routes to `exact`: identical rows to the direct kernel
    val a = analysis
    assert(rows(a.autoAlignedPairs(fixture)) ==
      rows(a.alignedPairs(a.normalize(fixture))))
    // a >2/3-concentrated affordable matrix routes to `salted` — same
    // exact rows, different physical plan
    val hot = (for { v <- 0 until 8 } yield MatrixElement(s"v$v", "hot", 1.0 + v))
      .++(for { v <- 0 until 8 } yield MatrixElement(s"v$v", s"p$v", 2.0))
      .toDS()
    assert(rows(a.autoAlignedPairs(hot, budgetPairsPerVec = 8L)) ==
      rows(a.alignedPairs(a.normalize(hot))))
    assert(rows(a.autoAlignedPairs(hot, budgetPairsPerVec = 8L)).nonEmpty)
    // an over-budget head routes to `dfcap`: rows equal the capped
    // kernel's — the 3 df=10 boilerplate coordinates are excised, the
    // df=2 chain coordinates survive (so the capped output is non-empty)
    val headed = ((for { v <- 0 until 10; c <- 0 until 3 }
      yield MatrixElement(s"v$v", s"bp$c", 1.0 + c)) ++
      (for { v <- 0 until 10; c <- Seq(s"c$v", s"c${v + 1}") }
        yield MatrixElement(s"v$v", c, 3.0))).toDS()
    val capped = rows(a.autoAlignedPairs(headed, maxDf = 4L, budgetPairsPerVec = 2L))
    assert(capped == rows(a.alignedPairs(a.dfCap(a.normalize(headed), 4L))))
    assert(capped.nonEmpty)
  }
}
