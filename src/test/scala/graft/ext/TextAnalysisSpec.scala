package graft.ext

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  implicit lazy val s: SparkSession = spark
  import s.implicits._

  private lazy val docs = Seq(
    (0L, "the cat sat on the mat"),
    (1L, "der hund und die katze und der vogel"),
    (2L, "short")
  ).toDF("doc_id", "text")

  test("tokensWithPosition keeps original slot positions") {
    // "\s+" consumes runs of whitespace as ONE separator, so a double space
    // yields no empty token; only a LEADING separator does, and that empty
    // token is dropped while later tokens keep their slot numbers.
    val t = TextAnalysis.tokensWithPosition(
      Seq((9L, " a  b")).toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("pos").collect()
    assert(t.map(r => (r.getInt(1), r.getString(2))).toSeq == Seq((1, "a"), (2, "b")))
  }

  test("stats computes counts, ttr, stopword ratio") {
    val r = TextAnalysis.stats(docs, "doc_id", "text")
      .where($"doc_id" === 0L).head()
    assert(r.getAs[Long]("n_tokens") == 6L)
    assert(r.getAs[Long]("n_distinct") == 5L) // "the" twice
    assertApprox(r.getAs[Double]("stopword_ratio"), 2.0 / 6.0)
    assertApprox(r.getAs[Double]("ttr"), 5.0 / 6.0)
  }

  test("langId picks the language with the most marker hits") {
    val preds = TextAnalysis.langId(docs, "doc_id", "text")
      .select("doc_id", "pred_lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(preds(0L) == "en")
    assert(preds(1L) == "de") // der×2 + und×2 + die
    assert(preds(2L) == "en") // all-zero scores → tie broken in marker order
  }

  test("tokenCounts whitespace + ceil(len/4) subword estimate") {
    val r = TextAnalysis.tokenCounts(docs, "doc_id", "text")
      .where($"doc_id" === 2L).head()
    assert(r.getAs[Long]("ws_tokens") == 1L)
    assert(r.getAs[Long]("subword_est") == 2L) // ceil(5/4)
  }

  test("repetition: bigram counts, top share, dup fraction; <2 tokens drop") {
    val d = Seq(
      (0L, "a b a b a b c"), // bigrams: ab, ba, ab, ba, ab, bc
      (1L, "x y"),
      (2L, "short")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetition(d, "doc_id", "text").collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(!r.contains(2L)) // one token → no bigrams → no row
    val r0 = r(0L)
    assert(r0.getAs[Long]("n_bigrams") == 6L)
    assert(r0.getAs[Long]("n_distinct_bigrams") == 3L)
    assert(r0.getAs[Long]("top_bigram_count") == 3L) // "a b" ×3
    assertApprox(r0.getAs[Double]("top_bigram_frac"), 0.5)
    assertApprox(r0.getAs[Double]("dup_bigram_frac"), 0.5)
    val r1 = r(1L)
    assert(r1.getAs[Long]("n_bigrams") == 1L)
    assertApprox(r1.getAs[Double]("top_bigram_frac"), 1.0)
    assertApprox(r1.getAs[Double]("dup_bigram_frac"), 0.0)
  }

  test("quantiles: exact type-1 discrete values per group") {
    val d = Seq(("a", 10L), ("a", 20L), ("a", 30L), ("a", 40L), ("b", 7L))
      .toDF("lang", "n_chars")
    val r = TextAnalysis.quantiles(d, "lang", "n_chars", Seq(0.0, 0.5, 0.99, 1.0))
      .collect().map(x => (x.getString(0), x.getDouble(1)) -> x.getLong(2)).toMap
    assert(r(("a", 0.0)) == 10L)  // rank 1
    assert(r(("a", 0.5)) == 20L)  // rank 1 + floor(1.5) = 2
    assert(r(("a", 0.99)) == 30L) // rank 1 + floor(2.97) = 3
    assert(r(("a", 1.0)) == 40L)  // rank 4
    assert(r(("b", 0.5)) == 7L)   // singleton group
  }

  test("quantileNormalize: min-rank percentile per group, ties share, singleton is 0") {
    // group a: 10, 20, 20, 40 → pctl 0, 1/3, 1/3, 1; group b: one doc → 0
    val d = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "a", 20L),
      (4L, "a", 40L), (5L, "b", 7L)).toDF("doc_id", "grp", "v")
    val p = TextAnalysis.quantileNormalize(d, "doc_id", "grp", "v")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assertApprox(p(1L), 0.0, 1e-9)
    assertApprox(p(2L), 1.0 / 3, 1e-6)
    assertApprox(p(3L), 1.0 / 3, 1e-6)
    assertApprox(p(4L), 1.0, 1e-9)
    assertApprox(p(5L), 0.0, 1e-9)
    // the plan's only sort is over the histogram, not the documents:
    // no window exchange keyed on anything doc-unique
    val plan = TextAnalysis.quantileNormalize(d, "doc_id", "grp", "v")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("row_number"), plan)
  }

  test("curriculum: percentile phases with top clamp, deterministic order key") {
    val d = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "a", 20L),
      (4L, "a", 40L), (5L, "b", 7L)).toDF("doc_id", "grp", "v")
    val c = TextAnalysis.curriculum(d, "doc_id", "grp", "v", phases = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(4), r.getLong(5))).toMap
    // pctl 0 -> phase 0; 1/3 -> floor(4/3) = 1; 1.0 -> clamped to 3
    assert(c(1L)._1 == 0L && c(2L)._1 == 1L && c(3L)._1 == 1L)
    assert(c(4L)._1 == 3L && c(5L)._1 == 0L, c)
    // order key is the documented mix chain, rerun-stable
    assert(c(1L)._2 == Export.mixBucketLong(1L, Int.MaxValue, 7L))
    val again = TextAnalysis.curriculum(d, "doc_id", "grp", "v", phases = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(4), r.getLong(5))).toMap
    assert(again == c)
  }

  test("qualityBuckets: quantile-threshold buckets per group, no global sort") {
    // group a: values 10..80 → quartile thresholds at ranks 1+floor(q*7):
    // q=.25→r2(20), q=.5→r4(40), q=.75→r6(60)
    val d = (1L to 8L).map(i => (i, "a", i * 10L)) :+ ((9L, "b", 5L))
    val df = d.toDF("doc_id", "lang", "n_chars")
    val r = TextAnalysis.qualityBuckets(df, "doc_id", "lang", "n_chars", 4)
      .collect().map(x => x.getLong(0) -> x.getLong(3)).toMap
    assert(r(1L) == 0L && r(2L) == 0L)            // ≤ 20: no threshold below
    assert(r(3L) == 1L && r(4L) == 1L)            // 30,40: only 20 below
    assert(r(5L) == 2L && r(6L) == 2L)            // 50,60: 20,40 below
    assert(r(7L) == 3L && r(8L) == 3L)            // 70,80: all three below
    assert(r(9L) == 0L)                           // singleton group
    // scale pin: the assignment join must be broadcast, never a sort of
    // the full input by value
    val plan = TextAnalysis.qualityBuckets(df, "doc_id", "lang", "n_chars", 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("chunks: fixed token windows, chunk-local fingerprints") {
    val d = Seq((0L, "a b c d e"), (1L, "a b c d e")).toDF("doc_id", "text")
    val c = TextAnalysis.chunks(d, "doc_id", "text", chunkSize = 2).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id")) ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("first_pos"),
          r.getAs[Long]("last_pos"), r.getAs[Long]("chunk_fp"))).toMap
    assert(c.keySet == Set((0L, 0L), (0L, 1L), (0L, 2L), (1L, 0L), (1L, 1L), (1L, 2L)))
    assert(c((0L, 0L))._1 == 2L && c((0L, 0L))._2 == 0L && c((0L, 0L))._3 == 1L)
    assert(c((0L, 2L))._1 == 1L) // short tail chunk
    // identical content → identical chunk fingerprints across docs
    assert((0L to 2L).forall(k => c((0L, k))._4 == c((1L, k))._4))
  }

  test("chunksSliding: 50% overlap, every window covered, content-stable fp") {
    // 6 tokens, chunkSize 4, stride 2 → chunks 0:[0,3] 1:[2,5] 2:[4,5]
    val d = Seq((0L, "a b c d e f"), (1L, "x x a b c d")).toDF("doc_id", "text")
    val c = TextAnalysis.chunksSliding(d, "doc_id", "text", 4, 2).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id")) ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("first_pos"),
          r.getAs[Long]("last_pos"), r.getAs[Long]("chunk_fp")))).toMap
    assert(c.keySet.filter(_._1 == 0L).map(_._2) == Set(0L, 1L, 2L))
    assert(c((0L, 0L))._1 == 4L && c((0L, 0L))._2 == 0L && c((0L, 0L))._3 == 3L)
    assert(c((0L, 1L))._2 == 2L && c((0L, 1L))._3 == 5L) // overlaps chunk 0 by 2
    assert(c((0L, 2L))._1 == 2L) // short tail
    // chunk-local fp: doc 1's chunk 1 is "a b c d" = doc 0's chunk 0
    assert(c((1L, 1L))._4 == c((0L, 0L))._4,
      "identical 4-token content must fingerprint identically across docs/offsets")
    // every consecutive-token window of length ≤ chunkSize−stride+1 sits
    // wholly inside SOME chunk (the retrieval-recall property, spot-checked:
    // tokens 2..4 span chunks 1 only → contiguous inside it)
    assert(c((0L, 1L))._2 <= 2L && c((0L, 1L))._3 >= 4L)
  }

  test("hashSample keeps by content hash with per-stratum rates") {
    val d = (0L until 40L).map(i => (i, s"word$i content number $i", if (i % 2 == 0) "en" else "zh"))
      .toDF("doc_id", "text", "lang")
    val all = TextAnalysis.hashSample(d, "doc_id", "text", "lang",
      Map("en" -> 1.0), defaultRate = 0.0).collect()
    // rate 1.0 keeps every en doc; rate 0.0 keeps no zh doc
    assert(all.map(_.getLong(0)).toSet == (0L until 40L by 2).toSet)
    // deterministic: same input → same sample, and content decides, not id
    val relabeled = d.withColumn("doc_id", col("doc_id") + 1000)
    val s1 = TextAnalysis.hashSample(d, "doc_id", "text", "lang",
      Map("en" -> 0.5, "zh" -> 0.5), 0.25).collect().map(r => (r.getLong(0) % 1000, r.getLong(2))).toSet
    val s2 = TextAnalysis.hashSample(relabeled, "doc_id", "text", "lang",
      Map("en" -> 0.5, "zh" -> 0.5), 0.25).collect().map(r => (r.getLong(0) % 1000, r.getLong(2))).toSet
    assert(s1 == s2)
  }

  test("vocabTopK ranks by document frequency with deterministic tie-break") {
    val d = Seq((0L, "a b c"), (1L, "a b b"), (2L, "a d")).toDF("doc_id", "text")
    // df: a=3, b=2, c=1, d=1 — the c/d tie at the k=3 cutoff breaks on
    // token order, so the cutoff set is deterministic
    val v = TextAnalysis.vocabTopK(d, "doc_id", "text", 3).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(v == Seq(("a", 3L), ("b", 2L), ("c", 1L)))
  }

  test("vocabTopK plans a TakeOrdered top-k, not a global sort") {
    val plan = TextAnalysis.vocabTopK(docs, "doc_id", "text", 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("vocabCoverage: per-doc OOV occurrence share against the top-k vocab") {
    // df: a=2 docs, b=2 docs, c=1 — the a/b tie at k=1 breaks to "a"
    val d = Seq((0L, "a a b"), (1L, "a c"), (2L, "b b b")).toDF("doc_id", "text")
    val r = TextAnalysis.vocabCoverage(d, "doc_id", "text", 1).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_tokens"), x.getAs[Long]("n_oov"),
          x.getAs[Double]("oov_share")))).toMap
    assert(r(0L)._1 == 3L && r(0L)._2 == 1L)
    assertApprox(r(0L)._3, 1.0 / 3)
    assert(r(1L)._2 == 1L)
    assertApprox(r(1L)._3, 0.5)
    assert(r(2L) == ((3L, 3L, 1.0))) // fully out-of-vocab document
  }

  test("cmsVocabAudit: exact when wide, pure collision mass when width=1") {
    // occurrences: a=3, b=3, c=2, d=1 — total 9
    val d = Seq((0L, "a a a b b c"), (1L, "b c d")).toDF("doc_id", "text")
    def run(depth: Int, width: Int, k: Int) =
      TextAnalysis.cmsVocabAudit(d, "doc_id", "text", depth, width, k)
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
    // wide sketch: 4 tokens in 4×4096 counters — collision-free, so the
    // estimate IS the exact count and overcount is 0 everywhere
    val wide = run(4, 4096, 10)
    assert(wide == Map(
      "a" -> ((3L, 3L, 0L)), "b" -> ((3L, 3L, 0L)),
      "c" -> ((2L, 2L, 0L)), "d" -> ((1L, 1L, 0L))))
    // width 1: every occurrence lands in the single counter of each row,
    // so every estimate is the corpus total and overcount = total - n
    val narrow = run(2, 1, 10)
    assert(narrow == Map(
      "a" -> ((3L, 9L, 6L)), "b" -> ((3L, 9L, 6L)),
      "c" -> ((2L, 9L, 7L)), "d" -> ((1L, 9L, 8L))))
    // estimate >= exact is the CMS invariant at ANY width
    Seq(2, 3, 5, 64).foreach { w =>
      assert(run(3, w, 10).values.forall { case (n, est, over) =>
        est >= n && over == est - n
      }, s"width $w")
    }
    // the top-k cut follows (count DESC, token ASC): a ties b at 3
    assert(run(4, 4096, 2).keySet == Set("a", "b"))
    assert(run(4, 4096, 10) == wide, "deterministic across runs")
  }

  test("pairBudgetSketch: exact postings math, upper bound, width-1 worst case") {
    // distinct (doc, token) postings: d0{a,b}, d1{a}, d2{a,b} →
    // n = 5, df(a) = 3, df(b) = 2, Σdf² = 13, pairs = (13 − 5)/2 = 4
    val d = Seq((0L, "a a b"), (1L, "a"), (2L, "b a b")).toDF("doc_id", "text")
    def run(depth: Int, width: Int) =
      TextAnalysis.pairBudgetSketch(d, "doc_id", "text", depth, width)
        .collect().head
    val wide = run(4, 4096)
    assert(wide.getLong(0) == 5L, "n_postings")
    assert(wide.getLong(1) == 13L, "exact_sq")
    assert(wide.getLong(3) == 4L, "exact_pairs")
    // 2 tokens across 4×4096 counters: collision-free, estimate exact
    assert(wide.getLong(2) == 13L && wide.getLong(5) == 0L)
    // width 1: every posting shares the single counter → est_sq = n²,
    // est_pairs = C(n, 2) — the all-pairs worst case, still an upper bound
    val narrow = run(2, 1)
    assert(narrow.getLong(2) == 25L && narrow.getLong(4) == 10L)
    // estimate ≥ exact at ANY width, and the derived columns stay coherent
    Seq(2, 3, 5, 64).foreach { w =>
      val r = run(3, w)
      assert(r.getLong(2) >= r.getLong(1), s"width $w upper bound")
      assert(r.getLong(4) == (r.getLong(2) - r.getLong(0)) / 2, s"width $w pairs")
      assert(r.getLong(5) == r.getLong(2) - r.getLong(1), s"width $w overcount")
    }
  }

  test("langConsistency: mixed doc flagged, ties break to the smaller lang") {
    // doc 0: chunk 0 pure-en markers, chunk 1 pure-de markers → 2 langs,
    // 1–1 chunk tie → majority = 'de' (count desc, lang asc), share 0.5
    // doc 1: one all-en chunk → monolingual, share 1.0
    val d = Seq(
      (0L, "the the the the der der der der"),
      (1L, "the a of and")).toDF("doc_id", "text")
    val got = TextAnalysis.langConsistency(d, "doc_id", "text", 4)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4))))
      .toMap
    assert(got(0L) == ((2L, 2L, "de", 0.5)))
    assert(got(1L) == ((1L, 1L, "en", 1.0)))
  }

  test("kmvVocabAudit: exact when the domain fits in k, estimator above it") {
    val d = Seq((0L, "a b c a"), (1L, "c d")).toDF("doc_id", "text")
    // 4 distinct tokens, k = 8 ≥ domain → the sketch holds everything
    // and the estimate is the exact count by construction
    val fit = TextAnalysis.kmvVocabAudit(d, "doc_id", "text", 8).collect().head
    assert(fit.getLong(0) == 4L && fit.getLong(3) == 4L)
    assertApprox(fit.getDouble(2), 4.0, 1e-9)
    // k = 2 < domain → the (k−1)/U_(k) estimator: positive, finite, and
    // a pure function of the 2nd-smallest hash (deterministic re-runs)
    val est = TextAnalysis.kmvVocabAudit(d, "doc_id", "text", 2).collect().head
    assert(est.getLong(0) == 2L && est.getLong(1) > 0L)
    assert(est.getDouble(2) > 0.0 && !est.getDouble(2).isInfinite)
    val again = TextAnalysis.kmvVocabAudit(d, "doc_id", "text", 2).collect().head
    assert(est.getDouble(2) == again.getDouble(2) &&
      est.getLong(1) == again.getLong(1))
  }

  test("textRank: filtered-sequence adjacency, mass 1, hub token dominates") {
    // content adjacency skips stopwords and short tokens: "alpha the xy
    // beta" still links alpha–beta; "core" co-occurs with everything,
    // "edge"/"leaf"/"rare" only with core → core must rank highest
    val d = Seq(
      (0L, "core edge the core leaf"),
      (1L, "alpha the xy beta"),
      (2L, "core rare a core edge"),
      (3L, "core beta")).toDF("doc_id", "text")
    val got = TextAnalysis.textRank(d, "doc_id", "text", iters = 5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // "the"/"a" (stopwords) and "xy" (short) are not nodes
    assert(!got.contains("the") && !got.contains("a") && !got.contains("xy"))
    assert(got.keySet == Set("core", "edge", "leaf", "alpha", "beta", "rare"))
    // symmetrized co-occurrence graph has no sinks → rank mass stays 1
    assertApprox(got.values.sum, 1.0, 1e-9)
    assert(got("core") > got("edge") && got("core") > got("beta"))
    // doc 1's bridge: alpha–beta adjacency crossed the filtered gap
    assert(got("alpha") > 0.0 && got("beta") > got("alpha"))
  }

  test("qualityFilter keeps only documents inside every signal bound") {
    val d = Seq(
      (0L, "alpha beta gamma delta epsilon"),        // passes
      (1L, "tiny doc"),                              // fails minTokens
      (2L, "the the the the of of and and to to"),   // fails stopword ratio
      (3L, "rep rep rep rep rep rep rep rep rep rep") // fails ttr
    ).toDF("doc_id", "text")
    val kept = TextAnalysis.qualityFilter(d, "doc_id", "text",
      minTokens = 3, maxTokens = 100, minAvgTokenLen = 1.0, maxAvgTokenLen = 12.0,
      maxStopwordRatio = 0.5, minTtr = 0.3).collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L))
  }

  test("corpusMix aggregates docs/chars/tokens per dimension combination") {
    val d = Seq(("s1", "en", "a b c"), ("s1", "en", "d e"), ("s1", "de", "x"))
      .toDF("source", "lang", "text")
    val m = TextAnalysis.corpusMix(d, "text", Seq("source", "lang")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(m(("s1", "en")) == ((2L, 8L, 5L, 2.5)))
    assert(m(("s1", "de")) == ((1L, 1L, 1L, 1.0)))
  }

  test("packSequences: bucketed running offsets, documents straddle bins") {
    val d = Seq((0L, "a b c"), (2L, "d e f g"), (4L, "h"), (1L, "x y"))
      .toDF("doc_id", "text")
    // buckets=2 → stream 0 packs ids 0,2,4 in order; stream 1 packs id 1.
    // budget=4: doc 2 starts at offset 3 and spans tokens 3..6 → bins 0..1
    val p = TextAnalysis.packSequences(d, "doc_id", "text",
      budgetTokens = 4, buckets = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(p(0L) == ((0L, 3L, 0L, 0L, 0L)))
    assert(p(2L) == ((0L, 4L, 3L, 0L, 1L)))
    assert(p(4L) == ((0L, 1L, 7L, 1L, 1L)))
    assert(p(1L) == ((1L, 2L, 0L, 0L, 0L)))
  }

  test("fingerprint is order-sensitive and deterministic") {
    val fp = (t: String) => TextAnalysis.fingerprint(
      Seq((0L, t)).toDF("doc_id", "text"), "doc_id", "text")
      .head().getAs[Long]("fingerprint")
    assert(fp("a b c") == fp("a b c"))
    assert(fp("a b c") != fp("c b a"))
    assert(fp("a b c") >= 0L && fp("a b c") < TextHash.M)
  }

  test("per-doc signal ops are pure map stages — no exchange, no window") {
    val fns: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "stats" -> TextAnalysis.stats(docs, "doc_id", "text"),
      "qualityFilter" -> TextAnalysis.qualityFilter(docs, "doc_id", "text"),
      "langId" -> TextAnalysis.langId(docs, "doc_id", "text"),
      "tokenCounts" -> TextAnalysis.tokenCounts(docs, "doc_id", "text"),
      "fingerprint" -> TextAnalysis.fingerprint(docs, "doc_id", "text"),
      "repetition" -> TextAnalysis.repetition(docs, "doc_id", "text"),
      "piiScrub" -> TextAnalysis.piiScrub(docs, "doc_id", "text"))
    for ((name, df) <- fns) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange") && !plan.contains("Window"),
        s"$name is not a pure map stage:\n$plan")
    }
  }

  test("piiScrub counts and redacts emails, IPs, and phones by category") {
    val d = Seq(
      (0L, "contact alice.smith+x@example.org or bob@test.co for details"),
      (1L, "server at 192.168.0.1 answered; call +1 (555) 123-4567 now"),
      (2L, "no sensitive content in this row at all")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.piiScrub(d, "doc_id", "text").collect()
      .map(x => x.getLong(0) ->
        ((x.getInt(1), x.getInt(2), x.getInt(3), x.getString(4)))).toMap
    assert(r(0L)._1 == 2 && r(0L)._2 == 0 && r(0L)._3 == 0)
    assert(r(0L)._4 == "contact <EMAIL> or <EMAIL> for details")
    assert(r(1L)._1 == 0 && r(1L)._2 == 1 && r(1L)._3 == 1)
    assert(r(1L)._4 == "server at <IP> answered; call <PHONE> now")
    assert(r(2L) == ((0, 0, 0, "no sensitive content in this row at all")))
  }

  test("piiScrub stages categories: an IP is never double-counted as a phone") {
    val d = Seq((0L, "ping 10.0.0.255 then dial 5551234567")).toDF("doc_id", "text")
    val r = TextAnalysis.piiScrub(d, "doc_id", "text").head()
    assert(r.getInt(2) == 1 && r.getInt(3) == 1) // one IP, one phone
    assert(r.getString(4) == "ping <IP> then dial <PHONE>")
  }

  test("unigramLogProb: hand-computed corpus unigram scores") {
    val d = Seq((0L, "a a b"), (1L, "b c")).toDF("doc_id", "text")
    // corpus counts: a=2, b=2, c=1, total=5 → lp(a)=lp(b)=ln(.4), lp(c)=ln(.2)
    val r = TextAnalysis.unigramLogProb(d, "doc_id", "text").collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getDouble(2), x.getDouble(3))))
      .toMap
    assert(r(0L)._1 == 3L)
    assertApprox(r(0L)._2, math.log(0.4), 1e-9)       // all three tokens at .4
    assertApprox(r(0L)._3, math.log(0.4), 1e-9)
    assert(r(1L)._1 == 2L)
    assertApprox(r(1L)._2, (math.log(0.4) + math.log(0.2)) / 2, 1e-9)
    assertApprox(r(1L)._3, math.log(0.2), 1e-9)       // rarest token: c
  }

  test("heldoutPerplexity matches a hand-rolled JM model; train docs absent") {
    // deterministic texts over a tiny vocab; the id-hash split is the
    // SAME mixBucketLong the operator uses, so the reference model below
    // fits on exactly the operator's train slice
    val texts = Seq("a b a c", "b b a", "c a b", "a a", "b c a b", "a c c",
      "c b", "b a a c", "a b b", "c c a", "b a", "a b c a", "c a", "a b",
      "b c", "a c b a", "b b", "c b a", "a a b", "c a a")
    val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val d = rows.toDF("doc_id", "text")
    val isTrain = (id: Long) => Export.mixBucketLong(id, 1000, 0L) < 800
    val train = rows.filter(r => isTrain(r._1))
    val held = rows.filterNot(r => isTrain(r._1))
    assert(train.nonEmpty && held.nonEmpty, "split must cut both ways")

    // reference JM model, plain Scala
    def toks(t: String) = t.split("\\s+").filter(_.nonEmpty).toSeq
    val cu = train.flatMap(r => toks(r._2)).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val (tt, vv) = (cu.values.sum, cu.size.toLong)
    val tbg = train.flatMap(r => { val w = toks(r._2); w.zip(w.drop(1)) })
    val cb = tbg.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cp = tbg.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    def pu(w: String) = (cu.getOrElse(w, 0L) + 1).toDouble / (tt + vv + 1).toDouble
    def p(w1: String, w2: String) = cp.get(w1) match {
      case None => pu(w2)
      case Some(c) => 0.75 * (cb.getOrElse((w1, w2), 0L).toDouble / c) + 0.25 * pu(w2)
    }
    val expected = held.flatMap { case (id, t) =>
      val w = toks(t)
      if (w.size < 2) None
      else {
        val lps = w.zip(w.drop(1)).map { case (a, b) => math.log(p(a, b)) }
        Some(id -> ((lps.size.toLong, lps.sum / lps.size)))
      }
    }.toMap

    val r = TextAnalysis.heldoutPerplexity(d, "doc_id", "text").collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getDouble(3), x.getDouble(4))))
      .toMap
    assert(r.keySet == expected.keySet) // no train doc leaks into the readout
    expected.foreach { case (id, (n, avg)) =>
      assert(r(id)._1 == n)
      assertApprox(r(id)._2, avg, 1e-9)
      assertApprox(r(id)._3, math.exp(-avg), 1e-9)
    }
  }

  test("heldoutPerplexity: all-OOV held-out doc scores exactly exp(ln(tt+vv+1))") {
    // find a held-out id under the operator's own split
    val heldId = (0L to 100L).find(Export.mixBucketLong(_, 1000, 0L) >= 800).get
    val trainIds = (0L to 100L).filter(Export.mixBucketLong(_, 1000, 0L) < 800).take(3)
    val d = (trainIds.map(i => (i, "a b c")) :+ ((heldId, "zz qq zz")))
      .toDF("doc_id", "text")
    // train: tt = 9 tokens, vv = 3 types → OOV unigram mass 1/(9+3+1)
    val r = TextAnalysis.heldoutPerplexity(d, "doc_id", "text").collect()
    assert(r.length == 1 && r(0).getLong(0) == heldId)
    assert(r(0).getLong(1) == 2L && r(0).getLong(2) == 2L) // 2 bigrams, both OOV
    assertApprox(r(0).getDouble(4), 13.0, 1e-9)            // perplexity = tt+vv+1
  }

  test("perplexityAgainst: the held-out variant IS this core driven by the hash split") {
    val rows = (0L to 30L).map(i => (i, s"tok${i % 4} tok${(i + 1) % 4} tok${(i + 2) % 5}"))
    val d = rows.toDF("doc_id", "text")
    val isTrain = (id: Long) => Export.mixBucketLong(id, 1000, 0L) < 800
    val viaSplit = TextAnalysis.heldoutPerplexity(d, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet
    val viaCorpora = TextAnalysis.perplexityAgainst(
        d.where(col("doc_id").isin(rows.map(_._1).filter(isTrain): _*)),
        d.where(!col("doc_id").isin(rows.map(_._1).filter(isTrain): _*)),
        "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet
    assert(viaSplit == viaCorpora && viaSplit.nonEmpty)
  }

  test("zipfHistogram: decade buckets by digit count, exact integers") {
    // counts: x=12 (two digits), y=2, z=1 (one digit)
    val d = Seq((0L, ("x " * 12).trim), (1L, "y y z")).toDF("doc_id", "text")
    val h = TextAnalysis.zipfHistogram(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(h == Map(1L -> ((2L, 3L, 2L)), 2L -> ((1L, 12L, 12L))))
  }

  test("budgetSample: per-group hash-order prefix; straddling doc excluded") {
    def mix(id: Long): Long = {
      val h1 = (id % (Export.MixMod - 1)) * Export.MixA1 % Export.MixMod
      (h1 * Export.MixA2 + Export.MixC2) % Export.MixMod % Int.MaxValue
    }
    // ten-token docs in two groups; budget 25 keeps the first TWO docs in
    // hash order per group (cum 10, 20) and EXCLUDES the third (cum 30)
    // even though 5 tokens of budget remain — no partial documents.
    val text = Seq.fill(10)("tok").mkString(" ")
    val d = ((0L until 5L).map((_, "g0")) ++ (100L until 105L).map((_, "g1")))
      .map { case (id, g) => (id, g, text) }.toDF("doc_id", "grp", "text")
    val r = TextAnalysis.budgetSample(d, "doc_id", "text", "grp", 25L)
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(3)))
    val expect = Seq((0L until 5L) -> "g0", (100L until 105L) -> "g1").flatMap {
      case (ids, g) =>
        ids.sortBy(id => (mix(id), id)).take(2).zipWithIndex
          .map { case (id, k) => (id, g, 10L * (k + 1)) }
    }
    assert(r.sortBy(_._1).toSeq == expect.sortBy(_._1))
  }

  test("signalCorrelation: constant signals absent; linear pair at r = -1") {
    // ttr = 1.25 - 0.125 * n_tokens across the fixture -> r exactly -1;
    // avg_token_len (all 1.0) and stopword_ratio (all 0.5) are constant,
    // so every pair touching them is absent instead of divide-by-zero
    val d = Seq((0L, "a b"), (1L, "a a b c"), (2L, "a a a b b c"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.signalCorrelation(d, "doc_id", "text").collect()
      .map(x => (x.getString(0), x.getString(1)) -> x.getDouble(2)).toMap
    assert(r.keySet == Set(("n_tokens", "ttr")))
    assertApprox(r(("n_tokens", "ttr")), -1.0)
  }

  test("bigramLogProb: MLE conditional scores, short docs absent") {
    // corpus bigrams: (a,b)x3 [doc 0 once, doc 2 twice], (a,c)x1, (b,a)x1
    // prefix totals: a->4, b->1
    // lp(a,b)=ln(3/4), lp(a,c)=ln(1/4), lp(b,a)=ln(1/1)=0
    val d = Seq(
      (0L, "a b"), (1L, "a c"), (2L, "a b a b"), (3L, "solo")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.bigramLogProb(d, "doc_id", "text")
      .collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getDouble(2), x.getDouble(3))))
      .toMap
    assert(r.keySet == Set(0L, 1L, 2L), "one-token doc has no bigrams")
    val ln34 = math.log(3.0 / 4.0)
    assert(r(0L)._1 == 1L); assertApprox(r(0L)._2, ln34)
    assert(r(1L)._1 == 1L); assertApprox(r(1L)._2, math.log(0.25))
    assert(r(2L)._1 == 3L)
    assertApprox(r(2L)._2, (2 * ln34 + 0.0) / 3.0)
    assertApprox(r(2L)._3, ln34) // min over {ln34, 0, ln34}
  }

  test("corpusDivergence: zero for corpus-identical slices, hand value else") {
    // both groups carry the global distribution -> p = q -> js = 0
    val same = Seq((0L, "s0", "a a b"), (1L, "s1", "a a b"))
      .toDF("doc_id", "source", "text")
    val r0 = TextAnalysis.corpusDivergence(same, "text", "source")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assertApprox(r0("s0")._2, 0.0); assertApprox(r0("s1")._2, 0.0)
    assert(r0("s0")._1 == 2L)
    // disjoint vocab: slice {x}, global {x: 1/2, y: 1/2}
    // js = 0.5*ln(4/3) + 0.25*ln(2/3) + 0.25*ln 2 = 0.75*ln(4/3)
    val disj = Seq((0L, "s0", "x x"), (1L, "s1", "y y"))
      .toDF("doc_id", "source", "text")
    val r1 = TextAnalysis.corpusDivergence(disj, "text", "source")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assertApprox(r1("s0"), 0.75 * math.log(4.0 / 3.0))
    assertApprox(r1("s1"), 0.75 * math.log(4.0 / 3.0))
  }

  test("vocabTopKByGroup: per-group ranks, doc-frequency not occurrences") {
    val d = Seq(
      (0L, "en", "cat cat dog"),   // cat df only counts once per doc
      (1L, "en", "cat fish"),
      (2L, "de", "hund")
    ).toDF("doc_id", "lang", "text")
    val got = TextAnalysis.vocabTopKByGroup(d, "doc_id", "text", "lang", k = 2)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getString(2), r.getLong(3))))
      .toMap
    assert(got(("en", 1L)) == (("cat", 2L)))   // df 2 despite 3 occurrences
    assert(got(("en", 2L)) == (("dog", 1L)))   // df tie dog/fish -> token asc
    assert(got(("de", 1L)) == (("hund", 1L)))
    assert(got.size == 3)                      // k=2 cuts en's third token
  }

  test("corpusStats: per-group docs/tokens/types/chars; empty docs count") {
    val d = Seq(
      (0L, "en", "a", "the cat the dog"),   // 4 tokens, 3 types, 15 chars
      (1L, "en", "a", "the cat"),           // 2 tokens, 2 types (shared!)
      (2L, "en", "b", ""),                  // zero tokens, still a doc
      (3L, "de", "a", "der hund")
    ).toDF("doc_id", "lang", "source", "text")
    val got = TextAnalysis.corpusStats(d, "text", Seq("lang", "source"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // types are distinct ACROSS the group: {the, cat, dog} = 3
    assert(got(("en", "a")) == ((2L, 6L, 3L, 11.0)))
    assert(got(("en", "b")) == ((1L, 0L, 0L, 0.0)))   // empty doc counted
    assert(got(("de", "a")) == ((1L, 2L, 2L, 8.0)))
    assert(got.size == 3)
  }
  test("temperatureMix: n^tau weights, allocation sums to budget, epochs") {
    val s2 = spark
    import s2.implicits._
    // groups of 100 and 25 tokens; tau = 0.5 -> weights 10/15 and 5/15
    val docs = Seq(
      ("big", (1 to 100).map(i => s"w$i").mkString(" ")),
      ("small", (1 to 25).map(i => s"v$i").mkString(" "))
    ).toDF("source", "text")
    val r = graft.ext.TextAnalysis
      .temperatureMix(docs, "source", "text", tau = 0.5, budgetTokens = 3000)
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getDouble(2), x.getDouble(3), x.getDouble(4)))).toMap
    val (nb, wb, ab, eb) = r("big")
    val (ns, ws, as_, es) = r("small")
    assert(nb == 100L && ns == 25L)
    assertApprox(wb, 10.0 / 15.0, 1e-12)
    assertApprox(ws, 5.0 / 15.0, 1e-12)
    assertApprox(wb + ws, 1.0, 1e-12)
    assertApprox(ab + as_, 3000.0, 1e-9)
    // temperature up-samples the small source: more epochs than natural
    assertApprox(eb, ab / 100.0, 1e-9)
    assertApprox(es, as_ / 25.0, 1e-9)
    assert(es > eb)
  }

  test("tokenEntropy: uniform → ln n with norm 1, constant → 0, mixed exact") {
    val s2 = spark
    import s2.implicits._
    val docs = Seq(
      (1L, "a b c d"),       // uniform over 4 distinct
      (2L, "a a a a"),       // single distinct token
      (3L, "a a b"),         // H = ln3 − (2 ln2)/3
      (4L, "solo")           // one token: H = 0, norm 0
    ).toDF("doc_id", "text")
    val r = TextAnalysis.tokenEntropy(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getDouble(3), x.getDouble(4)))).toMap
    assert(r(1L)._1 === 4L && r(1L)._2 === 4L)
    assertApprox(r(1L)._3, math.log(4.0), 1e-12)
    assertApprox(r(1L)._4, 1.0, 1e-12)
    assert(r(2L)._2 === 1L)
    assertApprox(r(2L)._3, 0.0, 1e-12)
    assertApprox(r(2L)._4, 0.0, 1e-12)
    assertApprox(r(3L)._3, math.log(3.0) - 2.0 * math.log(2.0) / 3.0, 1e-12)
    assertApprox(r(4L)._3, 0.0, 1e-12)
    assertApprox(r(4L)._4, 0.0, 1e-12)
  }

  test("tokenEntropy plans zero exchanges — a pure map stage") {
    val s2 = spark
    import s2.implicits._
    val docs = Seq((1L, "a b a")).toDF("doc_id", "text")
    val plan = TextAnalysis.tokenEntropy(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("pmiBigrams: planted collocation outranks independent pairs") {
    val s2 = spark
    import s2.implicits._
    // 'new york' always adjacent (perfect collocation), separated so the
    // reverse bigram (york, new) never forms; filler tokens mix freely so
    // their pairwise PMI sits near 0
    val phrase = (1 to 20).map(i => s"new york s${i % 7}").mkString(" ")
    val filler = (1 to 200).map(i => s"f${i % 4}").mkString(" ")
    val docs = Seq((1L, phrase), (2L, filler)).toDF("doc_id", "text")
    val top = TextAnalysis.pmiBigrams(docs, "doc_id", "text",
        minCount = 5L, k = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(5)))
    assert(top.head._1 === "new" && top.head._2 === "york")
    assert(top.head._4 > 0.5) // strongly associated, well above the filler
    // counts: 20 adjacent occurrences of the planted phrase
    assert(top.head._3 === 20L)
  }

  test("pmiBigrams: minCount suppresses hapax pairs; ties break on (t1,t2)") {
    val s2 = spark
    import s2.implicits._
    val docs = Seq((1L, "x y " + Seq.fill(10)("a b").mkString(" ")))
      .toDF("doc_id", "text")
    val r = TextAnalysis.pmiBigrams(docs, "doc_id", "text",
        minCount = 2L, k = 10)
      .collect().map(x => ((x.getString(0), x.getString(1)), x.getLong(2)))
    // 'x y' and 'y a' occur once each → filtered by minCount
    assert(!r.map(_._1).contains(("x", "y")))
    assert(r.forall(_._2 >= 2L))
    assert(r.map(_._1).contains(("a", "b")))
  }

  test("winsorize: clamps at exact type-1 band edges, flags the clipped") {
    val s2 = spark
    import s2.implicits._
    // group g: values 1..10 → q.2 rank = 1+floor(.2*9) = 2 → lo = 2;
    // q.8 rank = 1+floor(.8*9) = 8 → hi = 8
    val df = (1L to 10L).map(i => (i, "g", i)).toDF("doc_id", "lang", "v")
    val r = TextAnalysis.winsorize(df, "doc_id", "lang", "v", 0.2, 0.8)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5), x.getLong(6))))
      .toMap
    assert(r(1L) === ((1L, 2L, 8L, 2L, 1L)))   // below lo → clamped up
    assert(r(2L) === ((2L, 2L, 8L, 2L, 0L)))   // at lo → untouched
    assert(r(5L) === ((5L, 2L, 8L, 5L, 0L)))   // inside → untouched
    assert(r(9L) === ((9L, 2L, 8L, 8L, 1L)))   // above hi → clamped down
    assert(r.values.count(_._5 == 1L) === 3)   // 1, 9, 10 clipped
  }

  test("winsorize: thresholds are per group and broadcast back") {
    val s2 = spark
    import s2.implicits._
    val df = ((1L to 4L).map(i => (i, "a", i * 10)) ++
      (11L to 14L).map(i => (i, "b", i))).toDF("doc_id", "lang", "v")
    val q = TextAnalysis.winsorize(df, "doc_id", "lang", "v", 0.0, 1.0)
    val r = q.collect().map(x => x.getLong(0) -> (x.getLong(3), x.getLong(4))).toMap
    assert(r(1L) === ((10L, 40L)))   // group a band
    assert(r(11L) === ((11L, 14L)))  // group b band
    // q ∈ {0,1} → nothing clipped, clamp is identity
    assert(q.collect().forall(x => x.getLong(5) === x.getLong(2)))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("clusterTerms: c-TF-IDF weights, hand-computed, cluster-distinctive") {
    // cluster A: tokens {x:2, y:1}; cluster B: {y:1, z:1} →
    // total 5, clusters 2, A = 2.5; f_x=2, f_y=2, f_z=1
    val d = Seq(
      (0L, "x x y", "A"), (1L, "y z", "B")
    ).toDF("doc_id", "text", "src")
    val r = TextAnalysis.clusterTerms(d, "doc_id", "text", "src", 2)
      .collect()
      .map(x => (x.getAs[String]("cluster"), x.getAs[Long]("rank")) ->
        ((x.getAs[String]("token"), x.getAs[Long]("tf"),
          x.getAs[Long]("f_t"), x.getAs[Double]("score"))))
      .toMap
    // A's top term is its repeated x; B's is its EXCLUSIVE z (higher idf
    // than the shared y despite equal tf) — the c-TF-IDF point
    assert(r(("A", 1L))._1 === "x")
    assert(r(("B", 1L))._1 === "z")
    assert(r(("A", 2L))._1 === "y")
    assert(r(("B", 2L))._1 === "y")
    assertApprox(r(("A", 1L))._4, 2.0 * math.log(1.0 + 2.5 / 2.0), 1e-5)
    assertApprox(r(("B", 1L))._4, math.log(1.0 + 2.5 / 1.0), 1e-5)
    assert(r(("A", 1L))._2 === 2L && r(("A", 1L))._3 === 2L)
  }

  test("clusterTerms top-k selection happens on the SNAPPED score") {
    // equal snapped scores → lexicographic token tie-break inside a rank
    val d = Seq((0L, "b a", "A")).toDF("doc_id", "text", "src")
    val r = TextAnalysis.clusterTerms(d, "doc_id", "text", "src", 2)
      .orderBy("rank").collect().map(_.getAs[String]("token")).toSeq
    assert(r === Seq("a", "b"))
  }

  test("bpeMerges: greedy rules, overlap handling, lexicographic ties") {
    // words: aaa (×1), ab (×1). Round 1: pair (a,a) count 2 beats (a,b)
    // count 1 → merge a+a; the OVERLAPPING aaa rewrites greedily to
    // [aa, a] (first pair merged, consumed symbol skipped). Round 2:
    // pairs (aa,a) and (a,b) both count 1 → lexicographic tie-break on
    // sym_a picks (a,b)
    val d = Seq((0L, "aaa ab")).toDF("doc_id", "text")
    val r = TextAnalysis.bpeMerges(d, "doc_id", "text", 2)
      .orderBy("round").collect()
      .map(x => (x.getAs[Long]("round"), x.getAs[String]("sym_a"),
        x.getAs[String]("sym_b"), x.getAs[Long]("pair_count"),
        x.getAs[String]("merged")))
    assert(r.toSeq === Seq(
      (1L, "a", "a", 2L, "aa"),
      (2L, "a", "b", 1L, "ab")))
  }

  test("bpeMerges: frequency weighting drives the argmax; learned rules chain") {
    // "the" appears 3× so (t,h) and (h,e) lead with weight 3; tie on
    // count → lexicographic picks (h,e) first, and round 2 then merges
    // t+he — rules compose across rounds
    val d = Seq((0L, "the the"), (1L, "the tx")).toDF("doc_id", "text")
    val r = TextAnalysis.bpeMerges(d, "doc_id", "text", 2)
      .orderBy("round").collect()
      .map(x => (x.getAs[String]("sym_a"), x.getAs[String]("sym_b"),
        x.getAs[Long]("pair_count")))
    assert(r.toSeq === Seq(("h", "e", 3L), ("t", "he", 3L)))
  }

  test("bpeEncodeStats: rules applied through the LAST round, exact counts") {
    // rules learned on "aaa ab": (a,a) then (a,b). Applying both:
    // aaa → [aa, a], ab → [ab]. Vocabulary {aa, a, ab}; 3 symbols over
    // 2 tokens of 5 chars total
    val d = Seq((0L, "aaa ab")).toDF("doc_id", "text")
    val r = TextAnalysis.bpeEncodeStats(d, "doc_id", "text", 2).collect().head
    assert(r.getAs[Long]("n_types") === 2L)
    assert(r.getAs[Long]("n_tokens") === 2L)
    assert(r.getAs[Long]("vocab_size") === 3L)
    assert(r.getAs[Long]("total_syms") === 3L)
    assert(r.getAs[Long]("total_chars") === 5L)
    assertApprox(r.getAs[Double]("syms_per_token"), 1.5)
    assertApprox(r.getAs[Double]("chars_per_sym"), 5.0 / 3.0)
  }

  test("bpeMerges stops early when no pairs remain") {
    val d = Seq((0L, "a b c")).toDF("doc_id", "text")
    // every word is one symbol — zero rules at any round budget
    assert(TextAnalysis.bpeMerges(d, "doc_id", "text", 5).count() === 0L)
  }

  test("charFold reads every character: injective on integer-id bands, reference-exact") {
    // tokenValue's probe classes collapsed 100k sequential ids into ~9k
    // groups (the r11 IVF hot-spot) — the full fold must (a) match the
    // Scala Horner reference bit for bit (the DuckDB list_reduce
    // spelling is pinned by the contract compare) and (b) separate ids
    // that share (length, first, middle, last)
    val ids = Seq("0", "1", "12345", "12845", "12945", "99999", "abcdef")
    val got = ids.toDF("v")
      .selectExpr(s"v", TextHash.charFold("v") + " AS h")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val M = TextHash.M
    def ref(sx: String): Long = sx.foldLeft(7L)((a, c) => (a * 31 + c.toLong) % M)
    ids.foreach(i => assert(got(i) == ref(i), i))
    // 12345 / 12845 / 12945 share every tokenValue probe; the fold splits them
    assert(Set(got("12345"), got("12845"), got("12945")).size == 3)
  }

  test("charFold('') is the seed 7 in BOTH spellings (the r11 descending-sequence pin)") {
    // Spark's sequence(1, length('')) = sequence(1, 0) is DESCENDING
    // ([1, 0]), so an unguarded fold runs two steps over ascii('') = 0
    // and returns 6727 while DuckDB's range(1, 1) is empty and returns
    // the seed — the CASE guard pins both engines to 7 (ADVICE r11)
    val got = Seq("").toDF("v")
      .selectExpr(TextHash.charFold("v") + " AS h")
      .collect()(0).getLong(0)
    assert(got == 7L)
  }
}
