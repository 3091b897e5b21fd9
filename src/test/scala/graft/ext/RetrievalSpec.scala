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

  test("rrfFuse: hand-scored fusion, one-list candidates, tie-break") {
    // query 0: cand 10 is rank 1 in both lists; cand 11 only in a (rank 2);
    // cand 12 only in b (rank 2) — 11 and 12 TIE at 1/62, cand id breaks it
    val a = Seq((0L, 10L, 1L), (0L, 11L, 2L), (1L, 20L, 1L))
      .toDF("query_id", "vec_id", "rank")
    val b = Seq((0L, 10L, 1L), (0L, 12L, 2L), (1L, 21L, 1L))
      .toDF("query_id", "vec_id", "rank")
    val got = Retrieval.rrfFuse(a, b, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    def snap(x: Double) = math.floor(x * 1e6 + 0.50001) / 1e6
    assert(got((0L, 1L)) == ((10L, snap(2.0 / 61.0))))
    assert(got((0L, 2L)) == ((11L, snap(1.0 / 62.0)))) // tie → lower cand id
    assert(got((0L, 3L)) == ((12L, snap(1.0 / 62.0))))
    // query 1: two single-list candidates, equal score, id order
    assert(got((1L, 1L))._1 == 20L && got((1L, 2L))._1 == 21L)
    assertApprox(got((1L, 1L))._2, snap(1.0 / 61.0))
  }

  test("rankEval: hand-computed MRR and nDCG, absent-query zeroes") {
    val truth = Seq(
      (0L, 10L, 1L), (0L, 11L, 2L), (0L, 12L, 3L), // rel {10,11,12}
      (1L, 20L, 1L),                               // rel {20}
      (2L, 30L, 1L), (2L, 31L, 2L),                // rel {30,31}
      (3L, 40L, 1L)                                // query absent from ranked
    ).toDF("query_id", "vec_id", "rank")
    val ranked = Seq(
      (0L, 10L, 1L), (0L, 99L, 2L), (0L, 11L, 3L),
      (1L, 99L, 1L), (1L, 98L, 2L),
      (2L, 31L, 1L), (2L, 30L, 2L)
    ).toDF("query_id", "vec_id", "rank")
    val got = Retrieval.rankEval(truth, ranked, k = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    val g = Retrieval.dcgGains(3)            // 1, 1/log2(3), 0.5
    def snap(x: Double) = math.floor(x * 1e6 + 0.50001) / 1e6
    // q0: hits at ranks 1 and 3; idcg over min(3, 3) gains
    assert(got(0L) == ((3L, 1L, 1.0,
      snap((g(0) + g(2)) / (g(0) + g(1) + g(2))))))
    // q1: nothing relevant retrieved
    assert(got(1L) == ((1L, 0L, 0.0, 0.0)))
    // q2: perfect set in some order, n_rel = 2 → ndcg exactly 1.0
    assert(got(2L) == ((2L, 1L, 1.0, 1.0)))
    // q3: query missing from the ranked list entirely
    assert(got(3L) == ((1L, 0L, 0.0, 0.0)))
  }

  test("rrfFuse promotes cross-list consensus over either single list") {
    // cand 5 is mid-rank in BOTH lists; cand 6 tops list a only. RRF must
    // rank 5 over 6: 1/61+1/63 > 1/61 — the ensemble property
    val a = Seq((0L, 6L, 1L), (0L, 5L, 3L)).toDF("query_id", "vec_id", "rank")
    val b = Seq((0L, 7L, 1L), (0L, 5L, 3L)).toDF("query_id", "vec_id", "rank")
    val top = Retrieval.rrfFuse(a, b, k = 1).collect().head
    assert(top.getLong(2) == 5L, top.toString)
  }

  test("qlmTopK: closed-form Dirichlet scores, non-matchers dropped") {
    val docs = Seq(
      (0L, "apple banana apple"), // dl=3, tf=2
      (1L, "banana cherry"),      // no query term — dropped
      (2L, "apple")               // dl=1, tf=1
    ).toDF("doc_id", "text")
    val rows = Retrieval.qlmTopK(docs, "doc_id", "text",
        Seq("apple"), k = 5, mu = 2.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(rows.keySet == Set(0L, 2L))
    // |C| = 6, cf = 3 → p(apple|C) = 0.5
    val s0 = math.log((2.0 + 2.0 * 0.5) / (3.0 + 2.0))
    val s2 = math.log((1.0 + 2.0 * 0.5) / (1.0 + 2.0))
    assertApprox(rows(0L), math.floor(s0 * 1e6 + 0.50001) / 1e6, 1e-12)
    assertApprox(rows(2L), math.floor(s2 * 1e6 + 0.50001) / 1e6, 1e-12)
    // the short exact match outranks the longer double match — the
    // length normalization BM25 gets from b, QLM gets from dl + μ
    assert(s2 > s0)
    // a mixed query with an out-of-corpus term fails loudly — the absent
    // term would poison every SURVIVOR's score with ln 0 smoothing mass
    val e = intercept[Exception](
      Retrieval.qlmTopK(docs, "doc_id", "text", Seq("apple", "zzz"), k = 5)
        .collect())
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("absent from corpus")), e.toString)
    // an ALL-absent query has no survivors — the empty result is the
    // right answer and the guard need not fire
    assert(Retrieval.qlmTopK(docs, "doc_id", "text", Seq("zzz"), k = 5).isEmpty)
  }
}
