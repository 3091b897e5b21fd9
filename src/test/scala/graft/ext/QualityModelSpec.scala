package graft.ext

import org.apache.spark.sql.SparkSession

import graft.SparkSpec

class QualityModelSpec extends SparkSpec {
  implicit lazy val s: SparkSession = spark
  import s.implicits._

  // passers: long-ish, varied, low-stopword text; failers: stopword soup
  // and a two-token stub — the gate separates them on stopword_ratio /
  // n_tokens, so a working GD must push those feature weights apart
  private lazy val docs = Seq(
    (0L, "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"),
    (1L, "mike november oscar papa quebec romeo sierra tango uniform victor whiskey xray"),
    (2L, "the the the the the a a a a of of of and and to to the a of and"),
    (3L, "zulu yankee")
  ).toDF("doc_id", "text")

  test("trainingFrame labels with the gate and emits exact features") {
    val f = QualityModel.trainingFrame(docs, "doc_id", "text",
        minTokens = 10, maxStopwordRatio = 0.10, minTtr = 0.35)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("y")).toMap
    assert(f === Map(0L -> 1.0, 1L -> 1.0, 2L -> 0.0, 3L -> 0.0))
  }

  test("fitLogistic: loss beats the w=0 baseline and the fit is deterministic") {
    def fit() = QualityModel.fitLogistic(docs, "doc_id", "text",
      iters = 5, lr = 0.5, minTokens = 10, maxStopwordRatio = 0.10,
      minTtr = 0.35)
    val r1 = fit().collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    val r2 = fit().collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r1 === r2)
    assert(r1.keySet === (QualityModel.Features :+ "z_log_loss").toSet)
    // at w = 0 every p = 0.5 → mean log-loss is ln 2; training must beat it
    assert(r1("z_log_loss") < math.log(2.0), r1)
    assert(r1.values.forall(v => !v.isNaN && !v.isInfinite))
  }

  test("score: fitted model ranks gate-passers above gate-failers") {
    val w = QualityModel.fitLogistic(docs, "doc_id", "text",
        iters = 20, lr = 1.0, minTokens = 10, maxStopwordRatio = 0.10,
        minTtr = 0.35)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    val sc = QualityModel.score(docs, "doc_id", "text", w)
      .collect().map(r => (r.getAs[Double]("gate_pass"), r.getAs[Double]("p_quality")))
    val pass = sc.filter(_._1 == 1.0).map(_._2)
    val fail = sc.filter(_._1 == 0.0).map(_._2)
    assert(pass.min > fail.max,
      s"pass=${pass.toSeq} fail=${fail.toSeq}")
  }

  test("auc: hand-computed Mann–Whitney with ties, degenerate convention") {
    import spark.implicits._
    // scores: pos {0.9, 0.5}, neg {0.5, 0.1} →
    // pairs: (0.9 beats both) = 2, (0.5 vs 0.1) = 1, (0.5 ties 0.5) = ½
    // U = 3.5, AUC = 3.5/4 = 0.875, 2U = 7
    val d = Seq((1.0, 0.9), (1.0, 0.5), (0.0, 0.5), (0.0, 0.1))
      .toDF("y", "p")
    val r = QualityModel.auc(d, "y", "p").collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L && r.getLong(2) == 7L)
    assertApprox(r.getDouble(3), 0.875, 1e-12)
    // perfect separation → 1.0
    val sep = Seq((1.0, 0.9), (1.0, 0.8), (0.0, 0.2)).toDF("y", "p")
    assertApprox(QualityModel.auc(sep, "y", "p").collect().head.getDouble(3),
      1.0, 1e-12)
    // single-class input → 0.5 by convention, no division by zero
    val one = Seq((1.0, 0.9), (1.0, 0.1)).toDF("y", "p")
    assertApprox(QualityModel.auc(one, "y", "p").collect().head.getDouble(3),
      0.5, 1e-12)
  }

  test("psiDrift: hand-computed smoothed PSI over observed bins") {
    import spark.implicits._
    // width 200 → bins: g1 {0,0,1}, g0 {0,2,2}; 3 observed bins
    val d = Seq((1L, 10L), (1L, 10L), (1L, 250L),
        (0L, 30L), (0L, 450L), (0L, 450L))
      .toDF("g", "v")
    val r = QualityModel.psiDrift(d, "g", "v", binWidth = 200L).collect().head
    assert(r.getAs[Long]("n1") == 3L && r.getAs[Long]("n0") == 3L)
    assert(r.getAs[Long]("n_bins") == 3L)
    def sm(c: Double) = (c + 0.5) / (3.0 + 3.0 * 0.5)
    val expected = Seq((2.0, 1.0), (1.0, 0.0), (0.0, 2.0)).map { case (c1, c0) =>
      (sm(c1) - sm(c0)) * math.log(sm(c1) / sm(c0))
    }.sum
    assertApprox(r.getAs[Double]("psi"), expected, 1e-12)
    // identical distributions → PSI exactly 0 (every term ln 1 = 0)
    val same = Seq((1L, 10L), (0L, 10L), (1L, 300L), (0L, 300L)).toDF("g", "v")
    assert(QualityModel.psiDrift(same, "g", "v", 200L)
      .collect().head.getAs[Double]("psi") == 0.0)
    // single-group degenerate → 0, no ln(0)
    val one = Seq((1L, 10L), (1L, 20L)).toDF("g", "v")
    assert(QualityModel.psiDrift(one, "g", "v", 200L)
      .collect().head.getAs[Double]("psi") == 0.0)
  }

  test("calibration: hand-binned reliability rows, boundaries, zero bins") {
    import spark.implicits._
    val d = Seq((1.0, 0.95), (0.0, 0.91), (1.0, 0.55), (0.0, 0.12),
        (1.0, 1.0), (0.0, 0.5))
      .toDF("y", "p")
    val got = QualityModel.calibration(d, "y", "p", bins = 10).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getAs[Double]("mean_score"),
          r.getAs[Double]("frac_pos"), r.getAs[Double]("gap"))))
      .toMap
    assert(got.size == 10)
    // score 1.0 clamps into the top bin; 0.5 sits exactly ON the 5 edge
    val b9 = got(9L)
    assert(b9._1 == 3L && b9._2 == 2L)
    assertApprox(b9._3, (0.95 + 0.91 + 1.0) / 3, 1e-9)
    assertApprox(b9._4, 2.0 / 3.0, 1e-9)
    assertApprox(b9._5, b9._4 - b9._3, 1e-12)
    val b5 = got(5L)
    assert(b5._1 == 2L && b5._2 == 1L)
    assertApprox(b5._3, (0.55 + 0.5) / 2, 1e-9)
    // untouched bins keep explicit zero rows
    assert(got(7L) == ((0L, 0L, 0.0, 0.0, 0.0)))
  }

  test("ksTest: hand-computed D, arg-cut, and clamped p-value") {
    import spark.implicits._
    // fully separated: group1 = {1,2}, group0 = {3,4} → D = 1 at v = 2
    val sep = Seq((1L, 1L), (1L, 2L), (0L, 3L), (0L, 4L)).toDF("g", "v")
    val r = QualityModel.ksTest(sep, "g", "v").collect().head
    assert(r.getAs[Long]("n1") == 2L && r.getAs[Long]("n0") == 2L)
    assert(r.getAs[Long]("d_num") == 4L && r.getAs[Long]("d_at") == 2L)
    assertApprox(r.getAs[Double]("d"), 1.0, 1e-12)
    assertApprox(r.getAs[Double]("p_value"), 2.0 * math.exp(-2.0), 1e-12)
    // interleaved: {1,3} vs {2,4} → max gap 2 first attained at v = 1,
    // and the tiny D clamps the asymptotic p at 1
    val mix = Seq((1L, 1L), (0L, 2L), (1L, 3L), (0L, 4L)).toDF("g", "v")
    val m = QualityModel.ksTest(mix, "g", "v").collect().head
    assert(m.getAs[Long]("d_num") == 2L && m.getAs[Long]("d_at") == 1L)
    assertApprox(m.getAs[Double]("d"), 0.5, 1e-12)
    assertApprox(m.getAs[Double]("p_value"), 1.0, 1e-12)
    // single-group degenerate: D = 0, p = 1, no division by zero
    val one = Seq((1L, 5L), (1L, 6L)).toDF("g", "v")
    val o = QualityModel.ksTest(one, "g", "v").collect().head
    assert(o.getAs[Double]("d") == 0.0 && o.getAs[Double]("p_value") == 1.0)
  }

  test("confusionSweep: hand-computed confusion matrix per cut") {
    import spark.implicits._
    // pos scores {0.9, 0.5}, neg scores {0.5, 0.1}
    val d = Seq((1.0, 0.9), (1.0, 0.5), (0.0, 0.5), (0.0, 0.1))
      .toDF("y", "p")
    val got = QualityModel.confusionSweep(d, "y", "p", Seq(0.3, 0.5, 0.95))
      .collect()
      .map(r => r.getDouble(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getAs[Double]("prec"), r.getAs[Double]("recall"),
          r.getAs[Double]("f1"))))
      .toMap
    // t=0.3: tp=2 fp=1 fn=0 tn=1; prec=2/3 rec=1 f1=0.8
    val a = got(0.3)
    assert((a._1, a._2, a._3, a._4) === ((2L, 1L, 0L, 1L)))
    assertApprox(a._5, 2.0 / 3.0, 1e-12)
    assertApprox(a._6, 1.0, 1e-12)
    assertApprox(a._7, 0.8, 1e-12)
    // t=0.5: the tied 0.5 scores are >= the cut on both labels
    assert((got(0.5)._1, got(0.5)._2, got(0.5)._3, got(0.5)._4) ===
      ((2L, 1L, 0L, 1L)))
    // t=0.95: nothing retrieved — zero row kept, ratios 0 not NULL
    val z = got(0.95)
    assert((z._1, z._2, z._3, z._4) === ((0L, 0L, 2L, 2L)))
    assert(z._5 == 0.0 && z._6 == 0.0 && z._7 == 0.0)
  }
}
