package graft.ext

import org.apache.spark.sql.SparkSession

import graft.SparkSpec

/**
 * The containment-sketch operator ([[Dedup.containmentSketchDups]]) and the
 * shingle df-cap ([[Dedup.dfCapShingles]]) — the two r7 scale guards for
 * the exact pair kernels.
 *
 * The planted fixture is the case the operator exists for and the case
 * banded MinHash provably cannot serve: a short document quoted wholesale
 * inside a much longer one. Containment is exactly 1.0 there while Jaccard
 * is |A|/|B| ≈ 0.14 — far below the banding's reliable zone.
 *
 * Fixture-token construction note: [[TextHash.tokenValue]] probes only
 * (length, first, middle, last) characters, so synthetic tokens must carry
 * their distinguishing bits IN those probes — the doc/pair index is encoded
 * in the first+last letters, the word index in the LENGTH, and the token
 * kind in the repeated interior character the middle probe lands on. That
 * makes tokenValue injective across each fixture by arithmetic (length
 * steps of 1000003 dominate; within a length class 1009·Δfirst can't be
 * cancelled by 31·Δlast + Δmiddle).
 */
class ContainmentSketchSpec extends SparkSpec {
  implicit lazy val s: SparkSession = spark
  import s.implicits._

  private val NPairs = 30

  private def word(t1: Char, t2: Char, w: Int, kind: Char) =
    s"$t1${kind.toString * (w + 1)}$t2"

  /** Planted corpus: doc 2i (30 words, all unique to the pair) is quoted
    * wholesale as the prefix of doc 2i+1 (the same 30 words + 170 unique
    * filler words → pair Jaccard ≈ 28/198 ≈ 0.14). */
  private lazy val planted = {
    def t1(i: Int) = ('a' + i / 6).toChar
    def t2(i: Int) = ('a' + i % 6).toChar
    def short(i: Int) = (0 until 30).map(word(t1(i), t2(i), _, 's')).mkString(" ")
    def filler(i: Int) = (0 until 170).map(word(t1(i), t2(i), _, 'f')).mkString(" ")
    (0 until NPairs).flatMap { i =>
      Seq((2L * i, short(i)), (2L * i + 1, short(i) + " " + filler(i)))
    }.toDF("doc_id", "text")
  }

  private lazy val plantedWant =
    (0 until NPairs).map(i => (2L * i, 2L * i + 1)).toSet

  test("sketch candidates recover every planted containment pair (recall 1.0)") {
    val got = Dedup.containmentSketchDups(planted, "doc_id", "text",
      minContainment = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.keySet == plantedWant,
      s"missing: ${plantedWant -- got.keySet}; extra: ${got.keySet -- plantedWant}")
    // sk(short) ⊆ sk(long) — MOD_m selection is a function of the shingle
    // alone — so the estimate is EXACTLY 1.0, not approximately
    got.values.foreach(c => assertApprox(c, 1.0))
  }

  test("banded MinHash candidates miss planted containment pairs (recall < 1)") {
    // at jaccard ≈ 0.14, P(band collision) = 1-(1-j²)⁸ ≈ 0.15 per pair —
    // over 30 pairs banding deterministically (fixed texts, fixed hash
    // constants) drops most of them — the structural reason the r6
    // scaladoc's "route containment through MinHash candidates" escape
    // hatch could not work
    val cand = Dedup.minHashCandidates(
      Dedup.minHashSignatures(Dedup.shingles(planted, "doc_id", "text")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = plantedWant.intersect(cand)
    assert(found.size < NPairs,
      s"banding unexpectedly recovered all $NPairs planted pairs")
    // and the sketch's advantage is real: strictly more planted pairs
    val sketchFound = Dedup.containmentSketchDups(planted, "doc_id", "text",
      minContainment = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      .intersect(plantedWant)
    assert(sketchFound.size > found.size)
  }

  test("sketch is the MOD_m sample: same-shingle selection in every doc") {
    val sh = Dedup.shingles(planted, "doc_id", "text")
    val sk = Dedup.shingleSketch(sh)
    // selection keyed on the shingle: the kept DISTINCT shingle set of the
    // short doc is a subset of the long doc's for every planted pair
    val bySk = sk.collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    (0 until NPairs).foreach { i =>
      val a = bySk.getOrElse(2L * i, Set.empty[Long])
      val b = bySk.getOrElse(2L * i + 1, Set.empty[Long])
      assert(a.nonEmpty, s"short doc ${2 * i} sketched to empty")
      assert(a.subsetOf(b))
    }
    // sampling rate lands near 1/mod on this ~7k-shingle corpus
    val rate = sk.count().toDouble / sh.count()
    assert(rate > 0.15 && rate < 0.35, s"sample rate $rate far from 1/4")
  }

  test("df-cap drops the boilerplate shingle and bounds the pair surface") {
    // 40 docs of per-doc-unique text; the even 20 share one boilerplate
    // phrase (two shingles of df 20); docs 100/101 are exact duplicates
    // whose shingles all sit below the cap
    def t1(i: Int) = ('a' + i / 7).toChar
    def t2(i: Int) = ('a' + i % 7).toChar
    val docs = ((0 until 40).map { i =>
      val base = (0 until 4).map(word(t1(i), t2(i), _, 'u')).mkString(" ")
      (i.toLong, if (i % 2 == 0) base + " common boiler plate text" else base)
    } ++ Seq((100L, "z1 z2 z3 z4 z5"), (101L, "z1 z2 z3 z4 z5")))
      .toDF("doc_id", "text")
    val uncapped = Dedup.jaccardPairs(Dedup.shingles(docs, "doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val capped = Dedup.jaccardPairs(Dedup.shingles(docs, "doc_id", "text"),
      maxDf = Some(10L))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // uncapped: every even-doc pair collides through the boilerplate —
    // C(20,2) pairs of junk plus the one real duplicate
    assert(uncapped.size == 190 + 1, s"got ${uncapped.size}")
    // capped: the boilerplate shingles (df 20 > 10) are gone, so the junk
    // surface vanishes; the real pair survives with its value UNCHANGED
    // (all its shingles are below the cap)
    assert(capped.keySet == Set((100L, 101L)))
    assertApprox(capped((100L, 101L)), uncapped((100L, 101L)))
    assertApprox(capped((100L, 101L)), 1.0)
  }

  test("df-cap composes with the sketch (cap applies to the sketched table)") {
    // boilerplate present in EVERY doc: its shingles have df = 60 and
    // dominate the sketch kernel; the cap removes them there too
    def t1(i: Int) = ('a' + i / 8).toChar
    def t2(i: Int) = ('a' + i % 8).toChar
    val boiler = "shared footer line repeated on every single page"
    val docs = (0 until 60).map { i =>
      val body = (0 until 10).map(word(t1(i), t2(i), _, 'd')).mkString(" ")
      (i.toLong, s"$body $boiler")
    }.toDF("doc_id", "text")
    val uncapped = Dedup.containmentSketchDups(docs, "doc_id", "text",
      minContainment = 0.05)
    assert(uncapped.count() > 0L,
      "fixture should collide through the boilerplate without the cap")
    val capped = Dedup.containmentSketchDups(docs, "doc_id", "text",
      minContainment = 0.05, maxDf = Some(10L))
    // no two docs share any below-cap shingle → empty, and the plan never
    // built the C(60,2) boilerplate expansion
    assert(capped.count() == 0L)
  }

  test("containmentDups maxDf leaves below-cap results unchanged") {
    val d = Seq(
      (10L, "alpha beta gamma delta epsilon one two three four five " +
        "six seven eight nine ten eleven twelve thirteen fourteen fifteen"),
      (11L, "alpha beta gamma delta epsilon"),
      (12L, "unrelated words entirely distinct tokens")
    ).toDF("doc_id", "text")
    val plain = Dedup.containmentDups(d, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val withCap = Dedup.containmentDups(d, "doc_id", "text", maxDf = Some(5L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(plain == withCap && plain.nonEmpty)
  }

  test("sketch kernel plans equi-joins only — no nested loop, no cartesian") {
    val plan = Dedup.containmentSketchDups(planted, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }
}
