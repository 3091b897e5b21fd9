package graft.ext

import org.apache.spark.sql.SparkSession

import graft.SparkSpec

/**
 * Covariance + PCA ([[Embeddings.covariance]], [[Embeddings.pcaComponents]],
 * [[Embeddings.pcaProject]]): planted-anisotropy recovery, eigenvalue
 * ordering, the distributed projection vs a hand projection, and
 * determinism (the eager fit collects only the d×d matrix, so reruns
 * must agree exactly).
 */
class PcaSpec extends SparkSpec {
  implicit lazy val s: SparkSession = spark
  import s.implicits._

  private val D = 8

  /** Planted covariance structure: x = a·u + b·w + small per-coordinate
    * jitter, with var(a) ≈ 9 ≫ var(b) ≈ 1; u, w orthogonal unit
    * directions. Deterministic via a seeded generator. */
  private lazy val planted = {
    val rnd = new scala.util.Random(20260814L)
    val u = Array.tabulate(D)(i => if (i < 4) 0.5 else 0.0)           // unit
    val w = Array.tabulate(D)(i => if (i >= 4) 0.5 else 0.0)          // unit, ⟂u
    (0L until 400L).map { id =>
      val a = rnd.nextGaussian() * 3.0
      val b = rnd.nextGaussian() * 1.0
      val v = Array.tabulate(D)(i =>
        (a * u(i) + b * w(i) + 0.01 * rnd.nextGaussian()).toFloat)
      (id, v.toSeq)
    }.toDF("vec_id", "embedding")
  }

  private def dot(a: Array[Double], b: Array[Double]) =
    a.zip(b).map { case (x, y) => x * y }.sum

  test("covariance is symmetric-consistent and diagonal-dominant on u") {
    val cov = Embeddings.covariance(planted, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // upper triangle only, all d(d+1)/2 entries present
    assert(cov.keySet.forall { case (i, j) => i <= j })
    assert(cov.size == D * (D + 1) / 2)
    // planted structure: within-u-block covariance ≈ 9·0.25, cross-block ≈ 0
    assert(math.abs(cov((0L, 1L)) - 9.0 * 0.25) < 0.5, cov((0L, 1L)))
    assert(math.abs(cov((0L, 5L))) < 0.3, cov((0L, 5L)))
  }

  test("top component recovers the planted direction; eigenvalues ordered") {
    val comps = Embeddings.pcaComponents(planted, "vec_id", "embedding", 3)
    val u = Array.tabulate(D)(i => if (i < 4) 0.5 else 0.0)
    val w = Array.tabulate(D)(i => if (i >= 4) 0.5 else 0.0)
    val (_, l0, v0) = comps(0)
    val (_, l1, v1) = comps(1)
    val (_, l2, v2) = comps(2)
    assert(math.abs(dot(v0, u)) > 0.999, s"top comp not aligned with u: ${v0.toSeq}")
    assert(math.abs(dot(v1, w)) > 0.999, s"second comp not aligned with w: ${v1.toSeq}")
    assert(l0 > l1 && l1 > l2, s"eigenvalues not ordered: $l0 $l1 $l2")
    assert(math.abs(l0 - 9.0) < 1.0 && math.abs(l1 - 1.0) < 0.3)
    // components are unit-norm and orthogonal
    assertApprox(dot(v0, v0), 1.0, 1e-9)
    assert(math.abs(dot(v0, v1)) < 1e-6)
  }

  test("distributed projection equals the hand projection, deterministic") {
    val comps = Embeddings.pcaComponents(planted, "vec_id", "embedding", 2)
    val rows = planted.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray.map(_.toDouble)).toMap
    val mean = Array.tabulate(D)(i => rows.values.map(_(i)).sum / rows.size)
    val got = Embeddings.pcaProject(planted, "vec_id", "embedding", 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(got.size == rows.size * 2)
    rows.foreach { case (id, v) =>
      comps.foreach { case (c, _, comp) =>
        val want = dot(Array.tabulate(D)(i => v(i) - mean(i)), comp)
        assert(math.abs(got((id, c)) - want) < 1e-5,
          s"vec $id pc $c: ${got((id, c))} vs $want")
      }
    }
    // eager fit is deterministic: a second full run agrees exactly
    val again = Embeddings.pcaProject(planted, "vec_id", "embedding", 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(again == got)
  }

  test("rank-deficient input: extra components come back with eigenvalue ~0") {
    // vectors on a single line → rank-1 covariance; asking for 3 comps
    // must not throw and must report (near-)zero trailing eigenvalues
    val line = (0L until 50L).map { id =>
      val a = (id % 7).toDouble - 3.0
      (id, Array.tabulate(D)(i => (a * (if (i == 2) 1.0f else 0.0f))).toSeq)
    }.toDF("vec_id", "embedding")
    val comps = Embeddings.pcaComponents(line, "vec_id", "embedding", 3)
    assert(comps(0)._2 > 1.0)
    assert(comps(1)._2 < 1e-6 && comps(2)._2 < 1e-6)
  }
}
