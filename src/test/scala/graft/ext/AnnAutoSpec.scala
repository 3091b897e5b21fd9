package graft.ext

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** The ANN kernel router (r13): the decision ladder flips across the
  * contract's planted regimes, and [[Embeddings.annAutoPairs]]'s
  * dispatch is pinned against independently-spelled kernels. */
class AnnAutoSpec extends SparkSpec {
  implicit lazy val s: SparkSession = spark
  import s.implicits._

  test("contract fixture: the choice flips brute/ivf/lsh_banded across regimes") {
    val rows = graft.SparkEntry.queries("ann_auto")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) ->
        (r.getAs[String]("kernel"), r.getAs[Double]("evr"))).toMap
    assert(rows.keySet == Set("pilot", "clustered", "blob"))
    assert(rows("pilot")._1 == "brute", rows.toString)
    assert(rows("clustered")._1 == "ivf", rows.toString)
    assert(rows("blob")._1 == "lsh_banded", rows.toString)
    // the EVR rung is cleared with a wide margin on both sides
    assert(rows("clustered")._2 > 0.9, rows.toString)
    assert(rows("blob")._2 < 0.2, rows.toString)
  }

  // 24 vectors on 4 far-separated 8-dim modes (id-ordered seeds 0..3
  // land one per mode), jitter ~0.01 ≪ mode gap 10; bases start at 10
  // so every mode's vectors are base-dominated (within-mode cosine ≈ 1).
  private lazy val modes = (0L until 24L).map { id =>
    val m = (id % 4).toInt
    (id, (0 until 8).map(d => 10f * (m + 1) + 0.01f * ((id * 7 + d) % 5)).toSeq)
  }.toDF("vec_id", "embedding")

  test("ivf dispatch: within-list pairs of the measured fit, nothing cross-mode") {
    val route = Embeddings.annRoute(modes, "vec_id", "embedding",
      k = 4, iters = 2, budgetPerVec = 1L).collect().head
    assert(route.getAs[String]("kernel") == "ivf", route.toString)
    val got = Embeddings.annAutoPairs(modes, "vec_id", "embedding",
        simThreshold = 0.9, dim = 8, k = 4, iters = 2, budgetPerVec = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // independent spelling: same-mode pairs (the fit recovers the modes
    // exactly at this separation), all with cosine ≈ 1
    val want = (for {
      a <- 0L until 24L; b <- (a + 1) until 24L if a % 4 == b % 4
    } yield (a, b)).toSet
    assert(got == want, s"got ${got.size}, want ${want.size}")
  }

  test("brute dispatch: equals allPairsCosine at the threshold") {
    val tiny = modes.where(col("vec_id") < 10)
    val route = Embeddings.annRoute(tiny, "vec_id", "embedding",
      k = 4, iters = 2, budgetPerVec = 128L).collect().head
    assert(route.getAs[String]("kernel") == "brute", route.toString)
    val got = Embeddings.annAutoPairs(tiny, "vec_id", "embedding",
        simThreshold = 0.9, dim = 8, k = 4, iters = 2, budgetPerVec = 128L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = Embeddings.allPairsCosine(tiny, "vec_id", "embedding")
      .where(col("cosine") >= 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want && got.nonEmpty)
  }

  // an 80-vector 32-dim pseudo-random blob: 8 Voronoi cells explain
  // ~k^(2/32) of an isotropic spread — EVR far under the 0.5 rung.
  // sine-hash values, NOT a modular lattice: (id·a + d·b) % m points
  // lie on a few lines in 32-d, which k-means happily explains
  // (measured EVR 0.77 — the fixture routed ivf until this changed)
  private lazy val blob = (0L until 80L).map { id =>
    (id, (0 until 32).map { d =>
      val x = math.sin(id * 12.9898 + d * 78.233) * 43758.5453
      ((x - math.floor(x)) - 0.5).toFloat
    }.toSeq)
  }.toDF("vec_id", "embedding")

  test("lsh dispatch on the blob: equals lshNearPairsCosine at the threshold") {
    val route = Embeddings.annRoute(blob, "vec_id", "embedding",
      k = 8, iters = 2, budgetPerVec = 1L).collect().head
    assert(route.getAs[String]("kernel") == "lsh_banded",
      route.toString)
    assert(route.getAs[Double]("evr") < 0.5)
    val got = Embeddings.annAutoPairs(blob, "vec_id", "embedding",
        simThreshold = 0.5, dim = 32, k = 8, iters = 2, budgetPerVec = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = Embeddings.lshNearPairsCosine(blob, "vec_id", "embedding",
        dim = 32)
      .where(col("cosine") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want)
  }

  test("decision surfaces are integral and budget-linear") {
    val r = Embeddings.annRoute(blob, "vec_id", "embedding",
      k = 8, iters = 2, budgetPerVec = 7L).collect().head
    assert(r.getAs[Long]("n_vectors") == 80L)
    assert(r.getAs[Long]("dim") == 32L)
    assert(r.getAs[Long]("uncapped_pairs") == 80L * 79L / 2)
    assert(r.getAs[Long]("budget_pairs") == 560L)
  }
}
