package graft.ext

import org.apache.spark.sql.SparkSession

import graft.SparkSpec

/** HyperLogLog distinct-counting audit ([[TextAnalysis.hllVocabAudit]]) —
  * the cardinality sibling of the CMS frequency sketch. */
class HllAuditSpec extends SparkSpec {
  implicit lazy val s: SparkSession = spark
  import s.implicits._

  // ~600 distinct synthetic tokens across 3 groups. tokenValue probes
  // (length, first, middle, last): uniqueness rides on per-token length
  // (w repeats of the interior char) and the first/last group letters.
  private def corpus(tokensPerGroup: Int) =
    Seq("a", "b", "c").zipWithIndex.flatMap { case (g, gi) =>
      (0 until tokensPerGroup).map { w =>
        (s"src$g", s"${('a' + gi).toChar}${"k" * (w + 1)}${('d' + gi).toChar}")
      }
    }.groupBy(_._1).toSeq.map { case (src, rows) =>
      (src, rows.map(_._2).mkString(" "))
    }.toDF("source", "text")

  test("estimate lands within the m=64 error envelope; exact side exact") {
    val r = TextAnalysis.hllVocabAudit(corpus(200), "source", "text")
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getDouble(3), x.getDouble(4)))).toMap
    assert(r.keySet == Set("srca", "srcb", "srcc"))
    r.values.foreach { case (nExact, nonzero, est, relErr) =>
      assert(nExact == 200L)
      assert(nonzero > 0L && nonzero <= 64L)
      // 1.04/sqrt(64) = 13% typical; 5 sigma is a deterministic-fixture
      // sanity bound, not a statistical test
      assert(math.abs(relErr) < 0.65, s"rel_err $relErr (est $est)")
      assertApprox(relErr, (est - nExact) / nExact, 1e-9)
    }
  }

  test("duplicates never move a register: multiset and set sketch identically") {
    val once = corpus(150)
    val thrice = once.selectExpr("source",
      "concat(text, ' ', text, ' ', text) AS text")
    val a = TextAnalysis.hllSketch(once, "source", "text").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    val b = TextAnalysis.hllSketch(thrice, "source", "text").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(a.nonEmpty && a == b)
  }

  test("small-range branch: tiny vocabularies use linear counting") {
    val tiny = Seq(("s1", "aka bkb ckc dkd eke")).toDF("source", "text")
    val r = TextAnalysis.hllVocabAudit(tiny, "source", "text").collect().head
    val nonzero = r.getLong(2)
    assert(nonzero <= 5L)
    // E = m * ln(m / V) with V = 64 - nonzero — the exact branch value
    val want = 64.0 * math.log(64.0 / (64 - nonzero))
    assertApprox(r.getDouble(3), want, 1e-9)
  }

  test("sketch is one aggregate: no joins, register count bounded") {
    val df = TextAnalysis.hllSketch(corpus(100), "source", "text")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(df.groupBy("grp").count().collect().forall(_.getLong(1) <= 64L))
  }
}
