package graft.ext

import org.apache.spark.sql.SparkSession

import graft.SparkSpec
import graft.core.{CosineAnalysis, MatrixElement}

class SparseAnnSpec extends SparkSpec {
  implicit lazy val s: SparkSession = spark
  import s.implicits._

  private def analysis = new CosineAnalysis(spark, axis = "y")

  // 20 vectors over 6 coordinates, varied support
  private lazy val matrix = {
    val sess = spark
    import sess.implicits._
    (for { v <- 0 until 20; c <- 0 until 6 if (v + c) % 4 != 0 }
      yield MatrixElement(f"v$v%02d", s"c$c", ((v * c) % 7 + 1).toDouble)).toDS()
  }

  test("topSimilarAnn ranks candidates by exact dense cosine, equi-join plan") {
    val ann = SparseAnn.topSimilarAnn(analysis, matrix, k = 3)
    val plan = ann.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
    val rows = ann.collect()
    assert(rows.nonEmpty)
    // per-vector: ranks are 1..n without gaps, similarities non-increasing
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length).toSeq)
      assert(sorted.length <= 3)
      val sims = sorted.map(_.getDouble(3))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
    // every reported similarity equals the exact dense-cosine value for
    // that pair (snapped) — ANN changes the candidate set, never the value
    val exact = analysis.fit(matrix, isSparse = false).allSimilarityValue
      .collect().flatMap { sv =>
        val snapped = math.floor(sv.similarity_value * 1e6 + 0.50001) / 1e6
        Seq((sv.vector0, sv.vector1) -> snapped, (sv.vector1, sv.vector0) -> snapped)
      }.toMap
    rows.foreach { r =>
      val key = (r.getString(0), r.getString(2))
      assertApprox(r.getDouble(3), exact(key), 1e-9)
    }
  }

  test("predictMissingAnn fills only missing cells, equi-join plan") {
    val p = SparseAnn.predictMissingAnn(analysis, matrix, neighbors = 3)
    val plan = p.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
    val preds = p.collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
    assert(preds.nonEmpty)
    val existing = matrix.collect().map(m => (m.y, m.x)).toSet
    assert(preds.forall { case (k, _) => !existing.contains(k) })
    // weights are positive-similarity weighted means of normalized values
    // in [0, 1], so predictions stay in (0, 1]
    assert(preds.forall { case (_, v) => v > 0.0 && v <= 1.0 + 1e-9 })
  }

  test("buckets: sign pattern is deterministic and bounded to Planes bits") {
    val n = analysis.normalize(matrix).toDF()
      .select($"y".as("vector"), $"x".as("coord"), $"normalized_value".as("nv"))
    val b1 = SparseAnn.buckets(n, "vector", "coord", "nv").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val b2 = SparseAnn.buckets(n, "vector", "coord", "nv").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(b1 == b2)
    assert(b1.values.forall(b => b >= 0 && b < (1L << SparseAnn.Planes)))
  }

  private def normOf(m: org.apache.spark.sql.Dataset[MatrixElement]) =
    analysis.normalize(m).toDF()
      .select($"y".as("vector"), $"x".as("coord"), $"normalized_value".as("nv"))

  test("more planes: candidates are a SUBSET (Hamming-1 rule), parallel pairs survive") {
    val n = normOf(matrix)
    def candsAt(planes: Int): Set[(String, String)] =
      Embeddings.lshNearPairs(
        SparseAnn.buckets(n, "vector", "coord", "nv", planes), planes)
        .collect().map(r => r.getString(0) -> r.getString(1)).toSet
    val c6 = candsAt(6)
    val c12 = candsAt(12)
    // hamming_12 >= hamming_6 on the shared prefix bits, so <=1 at 12
    // planes implies <=1 at 6 — the wider bucket id only ever PRUNES
    assert(c12.subsetOf(c6), s"12-plane candidates not a subset: ${c12 -- c6}")
    // and it prunes something on this fixture (the point of scaling planes)
    assert(c12.size < c6.size, s"c6=${c6.size} c12=${c12.size}")
    // identical vectors agree on EVERY sign bit at any width, so a
    // planted twin pair is still a candidate at the max plane count
    val sess = spark
    import sess.implicits._
    val twin = normOf(Seq(
      MatrixElement("a", "c1", 3.0), MatrixElement("a", "c2", 5.0),
      MatrixElement("b", "c1", 3.0), MatrixElement("b", "c2", 5.0)).toDS())
    val twins = Embeddings.lshNearPairs(
      SparseAnn.buckets(twin, "vector", "coord", "nv", SparseAnn.MaxPlanes),
      SparseAnn.MaxPlanes).collect().map(r => (r.getString(0), r.getString(1)))
    assert(twins.toSeq == Seq(("a", "b")))
  }

  test("centered buckets spread an all-positive corpus; parallel twins stay together") {
    val n = normOf(matrix)
    def occupancy(center: Boolean): Map[Long, Int] =
      SparseAnn.buckets(n, "vector", "coord", "nv", planes = 6, center = center)
        .collect().groupBy(_.getLong(1)).map { case (b, rs) => b -> rs.length }
    val raw = occupancy(center = false)
    val centered = occupancy(center = true)
    // all-positive vectors are near-parallel to the mean: raw signs
    // concentrate the corpus; centering must strictly spread it
    assert(centered.size > raw.size,
      s"raw=${raw.size} buckets, centered=${centered.size}")
    assert(centered.values.max < raw.values.max,
      s"rawMax=${raw.values.max} centeredMax=${centered.values.max}")
    // equal raw projections ⇒ equal centered projections: twins collide
    val sess = spark
    import sess.implicits._
    val twin = normOf(Seq(
      MatrixElement("a", "c1", 3.0), MatrixElement("a", "c2", 5.0),
      MatrixElement("b", "c1", 3.0), MatrixElement("b", "c2", 5.0)).toDS())
    val tb = SparseAnn.buckets(twin, "vector", "coord", "nv",
      planes = SparseAnn.MaxPlanes, center = true)
      .collect().map(_.getLong(1)).toSet
    assert(tb.size == 1)
  }

  test("centered candidateSims still reports exact cosine for surviving pairs") {
    val ann = SparseAnn.topSimilarAnn(analysis, matrix, k = 3,
      planes = 8, center = true)
    val rows = ann.collect()
    val exact = analysis.fit(matrix, isSparse = false).allSimilarityValue
      .collect().flatMap { sv =>
        val snapped = math.floor(sv.similarity_value * 1e6 + 0.50001) / 1e6
        Seq((sv.vector0, sv.vector1) -> snapped, (sv.vector1, sv.vector0) -> snapped)
      }.toMap
    rows.foreach { r =>
      assertApprox(r.getDouble(3), exact((r.getString(0), r.getString(2))), 1e-9)
    }
  }

  test("topSimilarAnn at scaled planes still reports exact cosine values") {
    val ann = SparseAnn.topSimilarAnn(analysis, matrix, k = 3, planes = 10)
    val rows = ann.collect()
    val exact = analysis.fit(matrix, isSparse = false).allSimilarityValue
      .collect().flatMap { sv =>
        val snapped = math.floor(sv.similarity_value * 1e6 + 0.50001) / 1e6
        Seq((sv.vector0, sv.vector1) -> snapped, (sv.vector1, sv.vector0) -> snapped)
      }.toMap
    rows.foreach { r =>
      assertApprox(r.getDouble(3), exact((r.getString(0), r.getString(2))), 1e-9)
    }
  }

  test("derivePlanes: +1 plane per vector doubling, 4x bucket headroom, clamped") {
    import SparseAnn.derivePlanes
    // 4n <= 64 stays at the 6-plane floor
    assert(derivePlanes(1L) === 6)
    assert(derivePlanes(16L) === 6)
    // first doubling past the floor
    assert(derivePlanes(17L) === 7)
    // the measured sfx1 rescue band: 10k vectors -> every term fires
    assert(derivePlanes(1000L) === 12)
    assert(derivePlanes(10000L) === 16)
    // clamp at MaxPlanes regardless of corpus size
    assert(derivePlanes(Long.MaxValue / 8) === SparseAnn.MaxPlanes)
    // monotone non-decreasing across the whole range we exercise
    val samples = Seq(1L, 10L, 100L, 1000L, 10000L, 100000L, 1000000L)
    assert(samples.map(derivePlanes) === samples.map(derivePlanes).sorted)
  }

  test("deriveLists: doubles per vector doubling past the 256 floor, occupancy <= 32") {
    import SparseAnn.{deriveLists, IvfLists, ListOccupancy, MaxListDoublings}
    // up to lists*occupancy vectors stay at the 8-list floor
    assert(deriveLists(1L) === IvfLists)
    assert(deriveLists(256L) === IvfLists)
    // first doubling past the floor
    assert(deriveLists(257L) === 16)
    // the sf0.1 / sfx1 bands: ~1k vectors -> 32 lists, ~10k -> 512
    assert(deriveLists(1000L) === 32)
    assert(deriveLists(10000L) === 512)
    // derived occupancy stays at or under the target through the ladder
    (1 to MaxListDoublings).foreach { t =>
      val n = (IvfLists.toLong * ListOccupancy) << (t - 1)
      assert(deriveLists(n).toLong * ListOccupancy >= n)
    }
    // clamp at the 1024-list ladder top regardless of corpus size: the
    // assignment distance table is V×L rows, so a V-proportional L turns
    // Lloyd quadratic (deriveLists(100k)=4096 filled local disk at
    // sfx10); past the cap the occupancy SUB-SPLIT carries the bound
    assert(MaxListDoublings === 7)
    assert(deriveLists(100000L) === 1024)
    assert(deriveLists(Long.MaxValue / 8) === (IvfLists << MaxListDoublings))
    // monotone non-decreasing
    val samples = Seq(1L, 10L, 300L, 1000L, 10000L, 100000L, 10000000L)
    assert(samples.map(deriveLists) === samples.map(deriveLists).sorted)
  }

  test("listOccupancyIvf: counts cover the corpus; n_sub enforces the cap") {
    // under the default cap every list is inert (n_sub = 1)
    val audit = SparseAnn.listOccupancyIvf(analysis, matrix, lists = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(audit.map(_._2).sum === 20L)
    assert(audit.forall(_._3 == 1L))
    // a tiny forced cap sub-splits exactly at ceil(occ/maxOcc)
    val capped = SparseAnn.listOccupancyIvf(analysis, matrix, lists = 4, maxOcc = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    capped.foreach { case (occ, nSub) => assert(nSub === (occ - 1) / 2 + 1) }
    // and the capped candidate rule still reports exact cosines (the cap
    // changes the candidate SET, never the value)
    val ann = SparseAnn.topSimilarIvf(analysis, matrix, k = 3, lists = 4, maxOcc = 2)
      .collect()
    val exact = analysis.fit(matrix, isSparse = false).allSimilarityValue
      .collect().flatMap { sv =>
        val snapped = math.floor(sv.similarity_value * 1e6 + 0.50001) / 1e6
        Seq((sv.vector0, sv.vector1) -> snapped, (sv.vector1, sv.vector0) -> snapped)
      }.toMap
    ann.foreach { r =>
      assertApprox(r.getDouble(3), exact((r.getString(0), r.getString(2))), 1e-9)
    }
  }

  test("topSimilarIvf: exact cosine values, equi-join plan, full-probe = exact top-k") {
    val ivf = SparseAnn.topSimilarIvf(analysis, matrix, k = 3, lists = 4)
    val plan = ivf.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
    val rows = ivf.collect()
    assert(rows.nonEmpty)
    // every reported similarity equals the exact snapped dense cosine
    val exactSims = analysis.fit(matrix, isSparse = false).allSimilarityValue
      .collect().flatMap { sv =>
        val snapped = math.floor(sv.similarity_value * 1e6 + 0.50001) / 1e6
        Seq((sv.vector0, sv.vector1) -> snapped, (sv.vector1, sv.vector0) -> snapped)
      }.toMap
    rows.foreach { r =>
      val key = (r.getString(0), r.getString(2))
      assert(math.abs(r.getDouble(3) - exactSims(key)) < 1e-9,
        s"$key: ${r.getDouble(3)} vs ${exactSims(key)}")
    }
    // probing EVERY list makes the candidate set exhaustive: the route
    // must then reproduce the exact dense top-k bit for bit
    val full = SparseAnn.topSimilarIvf(analysis, matrix, k = 3, lists = 4,
        nprobe = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    val exact = analysis.fit(matrix, isSparse = false).topSimilar(3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    assert(full.toSeq === exact.toSeq)
  }

  test("group-local IVF scoring equals the pair-join reference row for row") {
    // the r10 physical rewrite (exactSimsLocal: arrays ship once per
    // probed list, pairs materialize inside the occupancy-bounded group)
    // must leave the logical result — candidate set AND snapped values —
    // bit-identical to the original pair-keyed coordinate join, at sane
    // AND at stressed occupancy (maxOcc=2 forces sub-splits everywhere)
    for (occ <- Seq(32, 2)) {
      val local = SparseAnn.candidateSimsIvf(analysis, matrix,
          lists = 4, maxOcc = occ)
        .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
        .sortBy(t => (t._1, t._2))
      val ref = SparseAnn.candidateSimsIvfReference(analysis, matrix,
          lists = 4, maxOcc = occ)
        .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
        .sortBy(t => (t._1, t._2))
      assert(local.toSeq === ref.toSeq, s"maxOcc=$occ")
      assert(local.nonEmpty)
    }
  }

  test("prober chunking (cap=2) leaves the result identical — replication is physical only") {
    // stress the mega-prober guard on a hand-built membership: one small
    // assigned list probed by MANY vectors. cap=2 splits the probers
    // into many chunks with the assigned set replicated into each; the
    // scored pairs must be byte-identical to the unchunked run.
    val sess = spark
    import sess.implicits._
    val nt = (for { v <- 0 until 20; c <- 0 until 6 if (v + c) % 4 != 0 }
      yield (f"v$v%02d", s"c$c", ((v * c) % 7 + 2).toDouble))
      .toDF("vector", "coord", "nv")
    // vectors v00/v01 assigned to (cid 0, sub 0); everyone probes it
    val memb = ((0 until 20).map(v => (f"v$v%02d", 0L, 0L, v < 2))).toSeq
      .toDF("vector", "cid", "sub", "is_assigned")
    def run(cap: Int) = SparseAnn.exactSimsLocal(memb, nt, cap)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2))
    val wide = run(SparseAnn.PairGroupCap)
    val tiny = run(2)
    assert(wide.toSeq == tiny.toSeq)
    // every non-assigned prober pairs with both assigned vectors
    assert(wide.count(t => t._2 == "v00" || t._2 == "v01") >= 18 * 2)
  }

  test("group-local scoring emits each unordered pair exactly once per direction") {
    val sims = SparseAnn.candidateSimsIvf(analysis, matrix, lists = 4)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(sims.length == sims.distinct.length,
      "duplicate (vector, neighbor) rows — canonical-orientation dot failed to dedupe")
  }
}
