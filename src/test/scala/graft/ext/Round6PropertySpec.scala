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

  test("funnel matches an in-memory reference fold on random event sets") {
    val steps = Seq("s1", "s2", "s3")
    val ev = for {
      user <- Gen.chooseNum(1L, 3L)
      ts <- Gen.chooseNum(0L, 20L)
      tpe <- Gen.oneOf("s1", "s2", "s3", "other")
    } yield (user, ts, tpe)
    val gen = Gen.chooseNum(1, 18).flatMap(n => Gen.listOfN(n, ev))
    forAllSampled(gen, n = 25) { events =>
      val df = events.zipWithIndex
        .map { case ((u, ts, tp), i) => (i.toLong, ts, u, tp, 0.0) }
        .toDF("event_id", "ts", "user_id", "event_type", "value")
      val got = Events.funnel(df, steps).collect()
        .map(r => r.getLong(0) ->
          ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getLong(4))))
        .toMap
      // reference: sequential conditional minima over the raw tuples
      val byUser = events.filter(e => steps.contains(e._3)).groupBy(_._1)
      for ((u, evs) <- byUser) {
        def minAtOrAfter(tpe: String, lo: Option[Long]): Option[Long] =
          lo.flatMap(b => evs.filter(e => e._3 == tpe && e._2 >= b)
            .map(_._2).minOption)
        val t1 = evs.filter(_._3 == "s1").map(_._2).minOption
        val t2 = minAtOrAfter("s2", t1)
        val t3 = minAtOrAfter("s3", t2)
        val depth = Seq(t1, t2, t3).count(_.isDefined).toLong
        assert(got(u) == ((t1.map(x => x: Any), t2.map(x => x: Any),
          t3.map(x => x: Any), depth)), s"user $u: ${got(u)}")
      }
      assert(got.keySet == byUser.keySet)
    }
  }

  test("containment dominates jaccard and stays in (0, 1] on random corpora") {
    val word = Gen.oneOf("aa", "bb", "cc", "dd")
    val doc = Gen.chooseNum(3, 10).flatMap(len => Gen.listOfN(len, word))
    val corpus = Gen.chooseNum(2, 5).flatMap(k => Gen.listOfN(k, doc))
    forAllSampled(corpus, n = 20) { docsList =>
      val df = docsList.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val jac = Dedup.jaccardPairs(Dedup.shingles(df, "doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val con = Dedup.containmentDups(df, "doc_id", "text", minContainment = 0.0)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(con.keySet == jac.keySet,
        "same bounded pair generator must yield the same pair set")
      for ((k, c) <- con) {
        assert(c > 0.0 && c <= 1.0 + 1e-12)
        assert(c >= jac(k) - 1e-12,
          s"containment $c below jaccard ${jac(k)} for $k")
      }
    }
  }

  test("corpusDivergence: zero for a lone slice, bounded by ln 2 always") {
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee")
    val doc = Gen.chooseNum(1, 8).flatMap(len => Gen.listOfN(len, word))
    val grouped = Gen.chooseNum(1, 6).flatMap(k => Gen.listOfN(k,
      Gen.zip(Gen.oneOf("s0", "s1", "s2"), doc)))
    forAllSampled(grouped, n = 20) { docsList =>
      val df = docsList.zipWithIndex
        .map { case ((src, ws), i) => (i.toLong, src, ws.mkString(" ")) }
        .toDF("doc_id", "source", "text")
      val r = TextAnalysis.corpusDivergence(df, "text", "source")
        .collect().map(x => x.getString(0) -> x.getDouble(2)).toMap
      val ln2 = math.log(2.0)
      for ((_, js) <- r) assert(js >= -1e-9 && js <= ln2 + 1e-9, s"js $js")
      if (r.size == 1)
        // a single slice IS the global distribution
        assertApprox(r.values.head, 0.0)
    }
  }

  test("bigramLogProb: non-positive scores, n_bigrams = tokens - 1") {
    val word = Gen.oneOf("aa", "bb", "cc")
    val doc = Gen.chooseNum(0, 8).flatMap(len => Gen.listOfN(len, word))
    val corpus = Gen.chooseNum(1, 5).flatMap(k => Gen.listOfN(k, doc))
    forAllSampled(corpus, n = 20) { docsList =>
      val df = docsList.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val r = TextAnalysis.bigramLogProb(df, "doc_id", "text").collect()
        .map(x => x.getLong(0) -> ((x.getLong(1), x.getDouble(2), x.getDouble(3))))
        .toMap
      for ((ws, i) <- docsList.zipWithIndex) {
        if (ws.length >= 2) {
          val (nb, avgLp, minLp) = r(i.toLong)
          assert(nb == ws.length - 1)
          assert(avgLp <= 1e-12 && minLp <= 1e-12, "MLE log-probs are <= 0")
          assert(minLp <= avgLp + 1e-12)
        } else assert(!r.contains(i.toLong), "short docs absent")
      }
    }
  }

  test("retention matches an in-memory reference fold on random event sets") {
    val ev = Gen.zip(Gen.chooseNum(1L, 4L), Gen.chooseNum(0L, 49L))
    val gen = Gen.chooseNum(1, 20).flatMap(n => Gen.listOfN(n, ev))
    val bucket = 10L
    forAllSampled(gen, n = 25) { events =>
      val df = events.zipWithIndex
        .map { case ((u, ts), i) => (i.toLong, ts, u, "x", 0.0) }
        .toDF("event_id", "ts", "user_id", "event_type", "value")
      val got = Events.retention(df, bucketNs = bucket).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val byUser = events.groupBy(_._1).view.mapValues(_.map(_._2 / bucket))
      val expect = byUser.toSeq
        .flatMap { case (u, bs) => bs.distinct.map(b => (bs.min, b - bs.min, u)) }
        .groupBy(t => (t._1, t._2)).view
        .mapValues(_.map(_._3).distinct.size.toLong).toMap
      assert(got == expect, s"$got vs $expect")
      // every cohort's offset-0 cell counts exactly its members
      for (((c, off), n) <- got if off == 0L)
        assert(n == byUser.count { case (_, bs) => bs.min == c })
    }
  }

  test("corpusDiff matches a reference classification on random snapshots") {
    val doc = Gen.zip(Gen.chooseNum(0L, 9L), Gen.oneOf("x", "y", "z"))
    val snap = Gen.chooseNum(0, 8).flatMap(n => Gen.listOfN(n, doc))
      .map(_.toMap) // last write per id wins, like a keyed snapshot
    forAllSampled(Gen.zip(snap, snap), n = 25) { case (o, n) =>
      val oldDf = o.toSeq.toDF("doc_id", "text")
      val newDf = n.toSeq.toDF("doc_id", "text")
      val got = Audit.corpusDiff(oldDf, newDf, "doc_id", "text").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val expect = (o.keySet ++ n.keySet).map { id =>
        id -> ((o.get(id), n.get(id)) match {
          case (None, _) => "added"
          case (_, None) => "removed"
          case (Some(a), Some(b)) => if (a == b) "unchanged" else "changed"
        })
      }.toMap
      assert(got == expect)
    }
  }
}
