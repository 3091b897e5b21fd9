package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-8 continuation operators: DSIR importance weights, the
  * k-anonymity ROLLUP audit, and per-user bot signals. */
class DsirKanonBotsSpec extends SparkSpec {

  import spark.implicits._

  // ---- dsirWeights -------------------------------------------------------

  private lazy val dsirDocs = Seq(
    // target slice: three docs of pure "aa"
    (1L, "aa aa aa", "tgt"), (2L, "aa aa aa", "tgt"), (3L, "aa aa aa", "tgt"),
    // raw slice: one target-like doc, one disjoint doc, one filler
    (4L, "aa aa aa", "raw"), (5L, "bb bb bb", "raw"), (6L, "cc cc", "raw"))
    .toDF("doc_id", "text", "source")

  private lazy val dsir = TextAnalysis
    .dsirWeights(dsirDocs, "doc_id", "text", "source", "tgt")
    .collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap

  test("dsirWeights: slice labels and token counts") {
    assert(dsir.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(dsir(1L)._1 == 1L && dsir(4L)._1 == 0L)
    assert(dsir(1L)._2 == 3L && dsir(6L)._2 == 2L)
  }

  test("dsirWeights: exact add-1 log ratios (and no bucket collision)") {
    // distinct buckets for aa/bb/cc (verified below by pairwise-distinct
    // weights): tt = 9 target tokens, tr = 8 raw tokens, dim = 128
    val d = TextAnalysis.DsirDim // 128
    def lw(ct: Long, cr: Long) =
      math.log((ct + 1.0) / (9 + d)) - math.log((cr + 1.0) / (8 + d))
    assertApprox(dsir(4L)._3, 3 * lw(9, 3), 1e-9)  // target-like raw doc
    assertApprox(dsir(5L)._3, 3 * lw(0, 3), 1e-9)  // disjoint raw doc
    assertApprox(dsir(6L)._3, 2 * lw(0, 2), 1e-9)
    // identical text ⇒ identical weight regardless of slice
    assertApprox(dsir(1L)._3, dsir(4L)._3, 1e-12)
    // target-like raw content ranks strictly above the disjoint doc —
    // the resampling order DSIR exists to produce
    assert(dsir(4L)._3 > dsir(5L)._3)
  }

  test("dsirFit/dsirScore: literal-table scoring matches the join path; unseen buckets smooth") {
    val lw = TextAnalysis.dsirFit(dsirDocs, "doc_id", "text", "source", "tgt")
    val d = TextAnalysis.DsirDim
    // at most 3 buckets are occupied (aa, bb, cc); every other entry is
    // the add-1 default ln((tr+dim)/(tt+dim)) = ln(136/137) — the value a
    // never-seen token scores on a live stream
    val default = math.log((8.0 + d) / (9.0 + d))
    assert(lw.count(v => math.abs(v - default) > 1e-12) <= 3)
    assert(lw.count(v => math.abs(v - default) <= 1e-12) >= d - 3)

    val scored = TextAnalysis.dsirScore(dsirDocs, "doc_id", "text", lw)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    for ((id, (_, nTok, w)) <- dsir) { // join path vs row-local fold
      assert(scored(id)._1 == nTok)
      assertApprox(scored(id)._2, w, 1e-9)
    }
  }

  test("dsirScore: the same plan runs unchanged on an unbounded stream") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val lw = TextAnalysis.dsirFit(dsirDocs, "doc_id", "text", "source", "tgt")
    val batch = TextAnalysis.dsirScore(dsirDocs, "doc_id", "text", lw)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = TextAnalysis.dsirScore(
        in.toDS().toDF("doc_id", "text"), "doc_id", "text", lw)
      .writeStream.format("memory").queryName("dsir_stream")
      .outputMode("append").start()
    try {
      in.addData(dsirDocs.collect().map(r => (r.getLong(0), r.getString(1))).toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("dsir_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch) // bit-identical: same row-local fold
  }

  // ---- kAnonymity --------------------------------------------------------

  test("kAnonymity: 3-level rollup risk table") {
    val rows =
      Seq.fill(4)(("en", "a", 5L)) ++ Seq.fill(2)(("en", "a", 15L)) ++
        Seq(("en", "b", 3L)) ++ Seq.fill(3)(("de", "a", 7L))
    val out = TextAnalysis
      .kAnonymity(rows.toDF("lang", "source", "n_chars"),
        "lang", "source", "n_chars", width = 10L, k = 3L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap
    // level 0: (en,a,0)=4, (en,a,1)=2, (en,b,0)=1, (de,a,0)=3
    assert(out(0L) == (4L, 2L, 3L, 1L, 0.3))
    // level 1: (en,a)=6, (en,b)=1, (de,a)=3
    assert(out(1L) == (3L, 1L, 1L, 1L, 0.1))
    // level 2: en=7, de=3 — fully safe
    assert(out(2L) == (2L, 0L, 0L, 3L, 0.0))
  }

  test("kAnonymize: each row releases at the cheapest level that clears k") {
    val rows =
      Seq.tabulate(4)(i => (10L + i, "en", "a", 5L)) ++
        Seq.tabulate(2)(i => (20L + i, "en", "a", 15L)) ++
        Seq((30L, "en", "b", 3L)) ++
        Seq.tabulate(3)(i => (40L + i, "de", "a", 7L)) ++
        Seq((50L, "zz", "q", 1L))
    val out = TextAnalysis.kAnonymize(
        rows.toDF("doc_id", "lang", "source", "n_chars"),
        "doc_id", "lang", "source", "n_chars", width = 10L, k = 3L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2), r.getString(3), r.getLong(4)))).toMap
    assert(out(10L) == ((0L, "en", "a", 0L)))   // class of 4: full release
    assert(out(20L) == ((1L, "en", "a", -1L)))  // bucket generalized
    assert(out(30L) == ((2L, "en", "*", -1L)))  // only lang class clears
    assert(out(40L) == ((0L, "de", "a", 0L)))
    assert(out(50L) == ((3L, "*", "*", -1L)))   // fully suppressed
  }

  // ---- seasonality -------------------------------------------------------

  test("seasonality: epoch arithmetic lands on the right calendar cells") {
    val sec = Events.NsPerSec
    // epoch day 0 (1970-01-01) was a THURSDAY (dow 3 with 0 = Monday);
    // epoch day 4 (1970-01-05) a Monday
    val ev = Seq(
      (1L, 0L * sec, 1L, "x"),                                  // Thu 00
      (2L, 3600L * sec, 1L, "x"),                               // Thu 01
      (3L, 3600L * sec + 1L, 2L, "x"),                          // Thu 01
      (4L, 4L * 86400L * sec + 5L * 3600L * sec, 2L, "x"))      // Mon 05
      .toDF("event_id", "ts", "user_id", "event_type")
    val cells = Events.seasonality(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(cells((3L, 0L)) == ((1L, 1L, 0.25)))
    assert(cells((3L, 1L)) == ((2L, 2L, 0.5)))
    assert(cells((0L, 5L)) == ((1L, 1L, 0.25)))
    assertApprox(cells.values.map(_._3).sum, 1.0, 1e-12)
  }

  test("seasonalAnomaly: exact z against the cell's own weekly samples") {
    val h = Events.NsPerHour
    val week = 7L * 24L * h
    // the same (type, Thu, 00) cell two weeks running: n = 10 then 14
    // → k=2, s1=24, s2=296, var-term=16 → z = ±1 exactly;
    // a once-seen cell (Thu 01) has zero variance → z = 0
    val ev =
      (0 until 10).map(i => (i.toLong, i.toLong, 1L, "x", 0.0)) ++
        (0 until 14).map(i => (100L + i, week + i, 1L, "x", 0.0)) ++
        (0 until 3).map(i => (200L + i, h + i, 1L, "x", 0.0))
    val out = Events.seasonalAnomaly(
        ev.toDF("event_id", "ts", "user_id", "event_type", "value"))
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(5), r.getDouble(6)))
      .toMap
    assert(out(0L) == ((10L, 2L, -1.0)))
    assert(out(week / Events.NsPerSec * 1L) == ((14L, 2L, 1.0)))
    assert(out(3600L) == ((3L, 1L, 0.0)))
  }

  // ---- bpeFertilityByLang ------------------------------------------------

  test("bpeFertilityByLang: per-lang totals tie out to the corpus encode stats") {
    val docs = Seq(
      (1L, "low lower lowest", "en"), (2L, "low low newer", "en"),
      (3L, "neu neuer neuestes", "de"))
      .toDF("doc_id", "text", "lang")
    val byLang = TextAnalysis.bpeFertilityByLang(docs, "doc_id", "text", "lang", 3)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    val corpus = TextAnalysis.bpeEncodeStats(docs, "doc_id", "text", 3)
      .collect().head
    // Σ per-lang tokens / emitted symbols / chars == the corpus totals
    assert(byLang.values.map(_._1).sum == corpus.getLong(1))
    assert(byLang.values.map(_._2).sum == corpus.getLong(3))
    assert(byLang.values.map(_._3).sum == corpus.getLong(4))
    // fertility is symbols-per-word: at least 1, at most the word length
    for ((_, (_, _, _, f)) <- byLang) assert(f >= 1.0 && f <= 8.0)
  }

  test("semanticThresholdSweep: identical pair survives every threshold at recall 1") {
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)), (3L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = Dedup.semanticThresholdSweep(emb, "vec_id", "embedding",
        Seq(0.5, 0.99), dim = 2)
      .collect().map(r => r.getDouble(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // only the identical pair clears 0.5; identical vectors share every
    // LSH bucket, so the candidate route finds it: recall exactly 1
    assert(out(0.5) == ((1L, 2L, 1L, 1.0)))
    assert(out(0.99) == ((1L, 2L, 1L, 1.0)))
  }

  // ---- botScores ---------------------------------------------------------

  test("botScores: planted bot fires, diverse slow user does not") {
    val sec = Events.NsPerSec
    val bot = (0 until 40).map(i =>
      (i.toLong, 10L * i * sec, 1L, "x"))            // 10 s gaps, one type
    val human = (0 until 10).map(i =>
      (100L + i, 2L * Events.NsPerHour * i, 2L, if (i % 2 == 0) "x" else "y"))
    val ev = (bot ++ human).toDF("event_id", "ts", "user_id", "event_type")
    val out = Events.botScores(ev).collect().map(r =>
      r.getLong(0) -> r).toMap

    val b = out(1L)
    assert(b.getLong(1) == 40L && b.getLong(2) == 1L)   // n_events, n_types
    assert(b.getLong(3) == 39L)                          // n_fast
    assert(b.getLong(4) == 390L)                         // span_sec
    assertApprox(b.getDouble(5), 0.0, 1e-12)             // entropy of 1 type
    assert(b.getLong(6) == 1L)                           // is_bot

    val h = out(2L)
    assert(h.getLong(1) == 10L && h.getLong(2) == 2L && h.getLong(3) == 0L)
    assertApprox(h.getDouble(5), math.log(2.0), 1e-12)   // 5/5 split
    assert(h.getLong(6) == 0L)
  }
}
