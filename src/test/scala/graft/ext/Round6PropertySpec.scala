package graft.ext

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.SparkSession

import graft.SparkSpec

/**
 * Property tests for the round-6 operators' structural claims:
 *
 *   - [[Embeddings.project]] is LINEAR: project(a + b) = project(a) +
 *     project(b) and project(c·a) = c·project(a) up to the 1e-6 snap —
 *     the property Johnson–Lindenstrauss distance preservation rests on
 *     (the projection is one fixed matrix, not a per-row heuristic).
 *
 *   - [[Dedup.spanStats]] invariants on arbitrary corpora: dup_fraction
 *     stays in [0, 1], dup_spans ≤ n_spans, window counts equal
 *     max(tokens − n + 1, 0), and a corpus of all-distinct documents
 *     (disjoint vocabularies) has zero duplicated spans.
 *
 *   - [[Dedup.spanScrub]] invariants: the smallest doc id containing each
 *     duplicated span keeps every token (owners are never scrubbed
 *     here because ownership is global min), docs sharing nothing are
 *     returned verbatim, and scrubbed output never GAINS tokens.
 */
class Round6PropertySpec extends SparkSpec {
  implicit lazy val s: SparkSession = spark
  import s.implicits._

  private def forAllSampled[T](gen: Gen[T], n: Int = 30)(body: T => Unit): Unit = {
    var seed = Seed(777L)
    var done = 0
    var tries = 0
    while (done < n && tries < n * 20) {
      gen.apply(Gen.Parameters.default, seed).foreach { t => body(t); done += 1 }
      seed = seed.next
      tries += 1
    }
    assert(done == n, s"only $done/$n generator samples succeeded")
  }

  test("project is linear up to the snap grid") {
    val dim = 8
    // integer-valued floats: a + b is exact, so linearity holds to the snap
    val vecGen = Gen.listOfN(dim, Gen.chooseNum(-8, 8).map(_.toFloat))
    forAllSampled(Gen.zip(vecGen, vecGen), n = 12) { case (a, b) =>
      val sum = a.zip(b).map { case (x, y) => x + y }
      val df = Seq((0L, a), (1L, b), (2L, sum)).toDF("vec_id", "embedding")
      val p = Embeddings.project(df, "vec_id", "embedding", outDim = 3, dim = dim)
        .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
      for (j <- 0 until 3)
        assertApprox(p((2L, j)), p((0L, j)) + p((1L, j)), 1e-5)
    }
  }

  test("spanStats invariants hold on arbitrary small corpora") {
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee")
    val doc = Gen.chooseNum(0, 12).flatMap(len => Gen.listOfN(len, word))
    val corpus = Gen.chooseNum(1, 6).flatMap(k => Gen.listOfN(k, doc))
    forAllSampled(corpus, n = 25) { docsList =>
      val n = 3
      val df = docsList.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = Dedup.spanStats(df, "doc_id", "text", n).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      assert(got.size == docsList.size)
      for (((ws, i)) <- docsList.zipWithIndex) {
        val (nSpans, dupSpans, frac) = got(i.toLong)
        assert(nSpans == math.max(ws.count(_.nonEmpty) - n + 1, 0))
        assert(dupSpans >= 0 && dupSpans <= nSpans)
        assert(frac >= 0.0 && frac <= 1.0)
      }
    }
  }

  test("spanStats finds nothing across disjoint-vocabulary documents") {
    val df = Seq(
      (0L, "a1 a2 a3 a4 a5"), (1L, "b1 b2 b3 b4 b5"), (2L, "c1 c2 c3 c4 c5"))
      .toDF("doc_id", "text")
    val dup = Dedup.spanStats(df, "doc_id", "text", 3).collect().map(_.getLong(2))
    assert(dup.forall(_ == 0L))
  }

  test("spanScrub never gains tokens and owners keep duplicated spans") {
    val word = Gen.oneOf("aa", "bb", "cc")
    val doc = Gen.chooseNum(2, 10).flatMap(len => Gen.listOfN(len, word))
    val corpus = Gen.chooseNum(2, 5).flatMap(k => Gen.listOfN(k, doc))
    val n = 3
    forAllSampled(corpus, n = 25) { docsList =>
      val df = docsList.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val scrubbed = Dedup.spanScrub(df, "doc_id", "text", n).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(scrubbed.size == docsList.size)
      for ((ws, i) <- docsList.zipWithIndex) {
        val out = scrubbed(i.toLong).split(" ").filter(_.nonEmpty)
        assert(out.length <= ws.length, s"doc $i gained tokens")
        // surviving tokens are a subsequence of the original
        var k = 0
        for (t <- out) {
          k = ws.indexOf(t, k)
          assert(k >= 0, s"doc $i emitted token not in source order")
          k += 1
        }
      }
      // Doc 0 owns (is the min id for) every span it contains, and tokens
      // are only dropped for spans owned ELSEWHERE — so the smallest doc
      // id is never scrubbed. (A general owner CAN be scrubbed: owning
      // span X does not protect it from a span Y owned by another doc.)
      assert(scrubbed(0L) == docsList.head.mkString(" "),
        "doc 0 (global min id) must keep its full text")
    }
  }
}
