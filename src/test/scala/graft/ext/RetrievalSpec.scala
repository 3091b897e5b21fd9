package graft.ext

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  // 4 docs, hand-countable tf/dl; "rare" appears in doc 1 only
  private def corpus = Seq(
    (1L, "rare cat cat dog"),          // dl=4, tf(cat)=2, tf(rare)=1
    (2L, "cat dog dog dog dog dog"),   // dl=6, tf(cat)=1
    (3L, "bird bird bird bird"),       // dl=4, no query terms
    (4L, "cat")                        // dl=1, tf(cat)=1
  ).toDF("doc_id", "text")

  private def bm25(tf: Double, df: Double, dl: Double,
      n: Double, avgdl: Double, k1: Double = 1.2, b: Double = 0.75): Double =
    math.log(1.0 + (n - df + 0.5) / (df + 0.5)) *
      (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))

  test("bm25TopK matches the closed-form score, ranks and cuts correctly") {
    val rows = Retrieval.bm25TopK(corpus, "doc_id", "text",
      Seq("rare", "cat"), k = 10).collect()
    // doc 3 matches nothing — dropped
    assert(rows.map(_.getLong(0)).toSet == Set(1L, 2L, 4L))
    val n = 4.0; val avgdl = 15.0 / 4.0
    val expect = Map(
      1L -> (bm25(1, 1, 4, n, avgdl) + bm25(2, 3, 4, n, avgdl)),
      2L -> bm25(1, 3, 6, n, avgdl),
      4L -> bm25(1, 3, 1, n, avgdl))
    rows.foreach { r =>
      assertApprox(r.getDouble(2), expect(r.getLong(0)), 1e-12)
    }
    // rank: doc 1 (rare term + 2×cat) first; short doc 4 beats long doc 2
    assert(rows.map(_.getLong(0)).toSeq ==
      expect.toSeq.sortBy { case (id, s) => (-s, id) }.map(_._1))
  }

  test("k cuts the tail; ties at the cut break by doc_id") {
    // two docs with IDENTICAL (dl, tf) → identical scores; k=1 keeps the
    // smaller doc_id deterministically
    val dup = Seq((7L, "cat dog"), (5L, "cat dog")).toDF("doc_id", "text")
    val top = Retrieval.bm25TopK(dup, "doc_id", "text", Seq("cat"), k = 1).collect()
    assert(top.map(_.getLong(0)).toSeq == Seq(5L))
  }

  test("plan: the only join is the sanctioned 1-row scalar broadcast") {
    val plan = Retrieval.bm25TopK(corpus, "doc_id", "text", Seq("cat"), k = 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    // the BNLJ's build side must be the single-row global aggregate — a
    // scalar broadcast (tfidf's sanctioned shape), not a pair surface
    assert(plan.split("BroadcastNestedLoopJoin").length - 1 == 1, plan)
    assert(plan.contains("HashAggregate(keys=[]"), plan)
  }
}
