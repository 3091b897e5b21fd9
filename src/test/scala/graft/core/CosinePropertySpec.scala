package graft.core

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/**
 * Property-based invariants of the cosine core (SURVEY.md §5.2(3)) over
 * random sparse matrices.
 */
class CosinePropertySpec extends SparkSpec {

  /** Deterministic forAll: sample the generator over fixed seeds
    * (scalatestplus bridge is not on the offline classpath). */
  private def forAllSampled[T](gen: Gen[T], n: Int = 12)(body: T => Unit): Unit = {
    var seed = Seed(42L)
    var done = 0
    var tries = 0
    while (done < n && tries < n * 20) {
      gen.apply(Gen.Parameters.default, seed).foreach { t => body(t); done += 1 }
      seed = seed.next
      tries += 1
    }
    assert(done == n, s"only $done/$n generator samples succeeded")
  }

  private def analysis = new CosineAnalysis(spark, axis = "y")

  /** Random sparse COO matrix: ≤6 vectors × ≤8 coords, positive values. */
  private val matrixGen: Gen[Seq[MatrixElement]] = for {
    nv <- Gen.choose(2, 6)
    nc <- Gen.choose(2, 8)
    cells <- Gen.someOf(for { v <- 0 until nv; c <- 0 until nc } yield (v, c))
    if cells.nonEmpty
    values <- Gen.listOfN(cells.size, Gen.choose(1, 50))
  } yield cells.toSeq.zip(values).map { case ((v, c), x) =>
    MatrixElement(s"v$v", s"c$c", x.toDouble)
  }

  test("dense mode: one canonical row per unordered pair, C(V,2) total, |sim| <= 1") {
    forAllSampled(matrixGen) { cells =>
      val s = spark
      import s.implicits._
      val ds = cells.toDS()
      val nVec = cells.map(_.y).distinct.size
      val sims = analysis.fit(ds, isSparse = false).allSimilarityValue.collect()
      assert(sims.length == nVec * (nVec - 1) / 2)
      assert(sims.forall(r => r.vector0 > r.vector1))
      assert(sims.map(r => (r.vector0, r.vector1)).distinct.length == sims.length)
      assert(sims.forall(r => r.similarity_value >= -1e-9 && r.similarity_value <= 1 + 1e-9))
    }
  }

  test("sparse mode: rows only for co-occurring pairs, sim in [0, 1]") {
    forAllSampled(matrixGen) { cells =>
      val s = spark
      import s.implicits._
      val ds = cells.toDS()
      val support = cells.groupBy(_.y).view.mapValues(_.map(_.x).toSet).toMap
      val coOccurring = (for {
        a <- support.keys; b <- support.keys
        if a > b && (support(a) & support(b)).nonEmpty
      } yield (a, b)).toSet
      val sims = analysis.fit(ds, isSparse = true).allSimilarityValue.collect()
      assert(sims.map(r => (r.vector0, r.vector1)).toSet == coOccurring)
      assert(sims.forall(r => r.similarity_value >= -1e-9 && r.similarity_value <= 1 + 1e-9))
    }
  }

  test("scale invariance: scaling any one vector preserves all similarities") {
    forAllSampled(matrixGen.flatMap(c => Gen.choose(2, 9).map((c, _)))) { case (cells, k) =>
      val s = spark
      import s.implicits._
      val target = cells.head.y
      val scaled = cells.map(e => if (e.y == target) e.copy(value = e.value * k) else e)
      val base = analysis.fit(cells.toDS(), isSparse = false).allSimilarityValue
        .collect().map(r => (r.vector0, r.vector1) -> r.similarity_value).toMap
      val after = analysis.fit(scaled.toDS(), isSparse = false).allSimilarityValue
        .collect().map(r => (r.vector0, r.vector1) -> r.similarity_value).toMap
      base.foreach { case (kk, v) => assertApprox(after(kk), v, 1e-9) }
    }
  }

  test("duplicated vector has dense self-similarity 1.0") {
    forAllSampled(matrixGen) { cells =>
      val s = spark
      import s.implicits._
      val dup = cells ++ cells.filter(_.y == cells.head.y).map(e => e.copy(y = "zdup"))
      val sims = analysis.fit(dup.toDS(), isSparse = false).allSimilarityValue
        .collect().map(r => (r.vector0, r.vector1) -> r.similarity_value).toMap
      assertApprox(sims(("zdup", cells.head.y)), 1.0, 1e-9)
    }
  }
}
