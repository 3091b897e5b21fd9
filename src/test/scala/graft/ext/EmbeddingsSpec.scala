package graft.ext

import org.apache.spark.sql.SparkSession

import graft.SparkSpec

class EmbeddingsSpec extends SparkSpec {
  implicit lazy val s: SparkSession = spark
  import s.implicits._

  // Unit vectors along axes + one diagonal: hand-computable cosines.
  private lazy val emb = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f)),
    (1L, Seq(0.0f, 1.0f, 0.0f)),
    (2L, Seq(1.0f, 1.0f, 0.0f)),
    (3L, Seq(0.9f, 0.1f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("allPairsCosine: canonical order, hand-checked values") {
    val c = Embeddings.allPairsCosine(emb, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(c.size == 6)
    assertApprox(c((0L, 1L)), 0.0, 1e-6)
    assertApprox(c((0L, 2L)), 1.0 / math.sqrt(2), 1e-6)
    assert(c((0L, 3L)) > c((1L, 3L))) // 3 points mostly along x
  }

  test("topK ranks by cosine desc with vec_id tiebreak, excludes self") {
    val top = Embeddings.topK(emb, emb.where($"vec_id" === 0L), "vec_id", "embedding", 2)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(top.toSeq == Seq((1L, 3L), (2L, 2L))) // rank1: v3 (cos .994), rank2: v2 (.707)
  }

  test("mmrTopK demotes the redundant near-duplicate hit") {
    // query 100 along x; a and its near-dup b are both highly relevant,
    // c is less relevant and less redundant. Pure relevance ranks
    // (a, b); at lambda=0.3 the redundancy term dominates — b's ~1.0
    // similarity to the already-selected a (penalty 0.7·1.0) outweighs
    // its relevance edge over c (penalty 0.7·0.62), so c is second.
    val docs = Seq(
      (0L, Seq(1.0f, 0.02f)),   // a: rel ~ 1
      (1L, Seq(0.99f, 0.03f)),  // b: near-dup of a, rel ~ 1
      (2L, Seq(0.6f, 0.8f)),    // c: rel 0.6, diverse
      (100L, Seq(1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val q = docs.where($"vec_id" === 100L)
    val cands = docs.where($"vec_id" < 100L)
    val mmr = Embeddings.mmrTopK(cands, q, "vec_id", "embedding",
        k = 2, poolSize = 3, lambda = 0.3)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(mmr.toSeq == Seq((1L, 0L), (2L, 2L)), mmr.mkString(", "))
    val rel = Embeddings.topK(cands, q, "vec_id", "embedding", 2)
      .orderBy("rank").collect().map(_.getLong(2))
    assert(rel.toSeq == Seq(0L, 1L)) // the list MMR re-ordered
  }

  test("mmrTopK at lambda=1 reduces to pure relevance order") {
    val q = emb.where($"vec_id" === 0L)
    val cands = emb.where($"vec_id" > 0L)
    val mmr = Embeddings.mmrTopK(cands, q, "vec_id", "embedding",
        k = 3, poolSize = 3, lambda = 1.0)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getLong(2)))
    val rel = Embeddings.topK(cands, q, "vec_id", "embedding", 3)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(mmr.toSeq == rel.toSeq)
  }

  test("hardNegatives: nearest DIFFERENT-label only; same-label near miss excluded") {
    // anchor 0 (label A): its nearest neighbor 1 shares the label and
    // must be excluded; the hardest negative is 2 (label B, closer than 3)
    val le = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f), "A"),
      (1L, Seq(0.99f, 0.01f, 0.0f), "A"),   // same-label near miss
      (2L, Seq(0.8f, 0.6f, 0.0f), "B"),     // hard negative
      (3L, Seq(0.0f, 1.0f, 0.0f), "B"),     // easy negative
      (4L, Seq(0.0f, 0.0f, 1.0f), "C")
    ).toDF("vec_id", "embedding", "label")
    val got = Embeddings.hardNegatives(le, le.where($"vec_id" === 0L),
      "vec_id", "embedding", "label", 3)
      .collect().map(r => r.getLong(1) -> r.getLong(2))
    assert(got.toSeq == Seq(1L -> 2L, 2L -> 3L, 3L -> 4L),
      s"expected hard-negative order 2,3,4 (label A excluded): ${got.toSeq}")
  }

  test("centroidDrift: identity → cosine 1 / l2 0; shift moves both; missing labels absent") {
    val a = Seq(
      (0L, Seq(1.0f, 0.0f), 0), (1L, Seq(1.0f, 0.2f), 0),
      (2L, Seq(0.0f, 1.0f), 1),
      (4L, Seq(0.5f, 0.5f), 2)                       // label 2 only in A
    ).toDF("vec_id", "embedding", "label")
    val same = Embeddings.centroidDrift(a, a, "vec_id", "embedding", "label")
      .collect().map(r => r.getInt(0) -> ((r.getDouble(3), r.getDouble(4)))).toMap
    same.values.foreach { case (cos, l2) =>
      assertApprox(cos, 1.0, 1e-6); assertApprox(l2, 0.0, 1e-9) }
    // shift label 0's direction 90° in snapshot B; drop label 2
    val b = Seq(
      (0L, Seq(0.0f, 1.0f), 0), (1L, Seq(0.2f, 1.0f), 0),
      (2L, Seq(0.0f, 1.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val drift = Embeddings.centroidDrift(a, b, "vec_id", "embedding", "label")
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(drift.keySet == Set(0, 1), "label 2 has no B snapshot → absent")
    val (na, nb, cos0, l20) = drift(0)
    assert(na == 2L && nb == 2L)
    assert(cos0 < 0.4 && l20 > 0.5, s"rotated centroid must drift: $cos0 $l20")
    assertApprox(drift(1)._3, 1.0, 1e-6) // label 1 unchanged
  }

  test("lshTopK buckets by hyperplane signs; identical vectors collide") {
    val dup = Seq(
      (10L, Seq.fill(4)(0.5f)),
      (11L, Seq.fill(4)(0.5f)),   // identical direction → same bucket
      (12L, Seq.fill(4)(-0.5f)))  // opposite → all signs flip
    .toDF("vec_id", "embedding")
    val b = Embeddings.lshBuckets(dup, "vec_id", "embedding", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b(10L) == b(11L))
    assert(b(10L) != b(12L))
    val top = Embeddings.lshTopK(dup, dup.where($"vec_id" === 10L),
      "vec_id", "embedding", 3, dim = 4)
      .collect().map(_.getLong(2)).toSet
    assert(top == Set(11L)) // only the same-bucket twin is searchable
  }

  test("lshBuckets at scaled plane counts: wider ids, twins still collide") {
    val dup = Seq(
      (10L, Seq.fill(4)(0.5f)),
      (11L, Seq.fill(4)(0.5f)),
      (12L, Seq.tabulate(4)(i => if (i % 2 == 0) 0.5f else -0.5f)))
      .toDF("vec_id", "embedding")
    Seq(6, 12, 20).foreach { planes =>
      val b = Embeddings.lshBuckets(dup, "vec_id", "embedding", 4, planes)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(b(10L) == b(11L), s"planes=$planes")
      assert(b.values.forall(v => v >= 0 && v < (1L << planes)), s"planes=$planes")
    }
    // more planes can only split buckets, never merge them
    def bucketsAt(p: Int) = Embeddings.lshBuckets(dup, "vec_id", "embedding", 4, p)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b6 = bucketsAt(6); val b20 = bucketsAt(20)
    val pairs = Seq((10L, 11L), (10L, 12L), (11L, 12L))
    pairs.foreach { case (a, c) =>
      if (b20(a) == b20(c)) assert(b6(a) == b6(c),
        "20-plane collision without a 6-plane collision: prefix bits changed")
    }
  }

  test("lshTopKMultiProbe reaches hamming-1 buckets single-probe misses") {
    // 4-dim fixture: near-duplicates of v10 land in its own bucket; a
    // vector one sign-flip away is reachable ONLY by multi-probe.
    val vecs = Seq(
      (10L, Seq(0.5f, 0.5f, 0.5f, 0.5f)),
      (11L, Seq(0.5f, 0.5f, 0.5f, 0.5f)),
      (12L, Seq(-0.5f, -0.5f, -0.5f, -0.5f)))
      .toDF("vec_id", "embedding")
    val b = Embeddings.lshBuckets(vecs, "vec_id", "embedding", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val single = Embeddings.lshTopK(vecs, vecs.where($"vec_id" === 10L),
      "vec_id", "embedding", 3, dim = 4).collect().map(_.getLong(2)).toSet
    val multi = Embeddings.lshTopKMultiProbe(vecs, vecs.where($"vec_id" === 10L),
      "vec_id", "embedding", 3, dim = 4).collect().map(_.getLong(2)).toSet
    assert(single.subsetOf(multi)) // probing more buckets never loses candidates
    // v12's bucket is the full complement of v10's: reachable by neither
    assert(!multi.contains(12L) ||
      java.lang.Long.bitCount(b(10L) ^ b(12L)) <= 1)
    // no duplicate (query, candidate) rows from the probe expansion
    val rows = Embeddings.lshTopKMultiProbe(vecs, vecs.where($"vec_id" === 10L),
      "vec_id", "embedding", 10, dim = 4).collect()
    assert(rows.map(_.getLong(2)).distinct.length == rows.length)
  }

  test("kMeansAssign separates two obvious blobs; equi-join plan") {
    // seeds are the 2 smallest ids: v0 (left blob) and v1 (right blob)
    val blobs = Seq(
      (0L, Seq(0.0f, 0.0f)),
      (1L, Seq(10.0f, 10.0f)),
      (2L, Seq(0.5f, 0.0f)),
      (3L, Seq(9.5f, 10.0f)),
      (4L, Seq(0.0f, 0.5f))
    ).toDF("vec_id", "embedding")
    val a = Embeddings.kMeansAssign(blobs, "vec_id", "embedding", k = 2, iters = 2)
    val plan = a.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
    val rows = a.collect().map(r =>
      r.getAs[Long]("vec_id") -> (r.getAs[Long]("cluster"), r.getAs[Double]("dist2"))).toMap
    assert(rows.size == 5)
    assert(rows(2L)._1 == rows(0L)._1 && rows(4L)._1 == rows(0L)._1)
    assert(rows(3L)._1 == rows(1L)._1)
    assert(rows(0L)._1 != rows(1L)._1)
    assert(rows.values.forall(_._2 >= 0.0))
    // after the centroid update, v0's distance is to the blob mean, not 0
    assert(rows(0L)._2 > 0.0)
  }

  test("sphericalKMeansAssign clusters by direction, blind to magnitude") {
    // seeds: v0 → (1,0), v1 → (0,1); v2 is HUGE but points along x,
    // v3 is tiny but points mostly along y — Euclidean Lloyd would see
    // magnitudes, spherical sees only direction
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(0.0f, 1.0f)),
      (2L, Seq(50.0f, 1.0f)),
      (3L, Seq(0.01f, 0.02f))
    ).toDF("vec_id", "embedding")
    val a = Embeddings.sphericalKMeansAssign(vecs, "vec_id", "embedding",
        k = 2, iters = 2)
      .collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("cluster"), r.getAs[Double]("cosine"))))
      .toMap
    assert(a.size == 4)
    assert(a(2L)._1 == a(0L)._1, a.toString)
    assert(a(3L)._1 == a(1L)._1, a.toString)
    assert(a(0L)._1 != a(1L)._1)
    // cosines are dots of unit vectors: all in (0, 1]
    assert(a.values.forall(v => v._2 > 0.0 && v._2 <= 1.0 + 1e-9))
    // zero-norm vectors have no direction — dropped, not crashed
    val withZero = vecs.union(Seq((9L, Seq(0.0f, 0.0f))).toDF("vec_id", "embedding"))
    val z = Embeddings.sphericalKMeansAssign(withZero, "vec_id", "embedding",
      k = 2, iters = 1).collect().map(_.getAs[Long]("vec_id")).toSet
    assert(!z.contains(9L) && z.size == 4)
  }

  test("ivfParetoSweep: recall climbs to 1 at full probes, candidates monotone") {
    val blobs = Seq(
      (0L, Seq(0.0f, 0.1f)),
      (1L, Seq(10.0f, 10.0f)),
      (2L, Seq(0.5f, 0.1f)),
      (3L, Seq(9.5f, 10.0f)),
      (4L, Seq(0.1f, 0.5f)),
      (5L, Seq(10.2f, 9.8f))
    ).toDF("vec_id", "embedding")
    val got = Embeddings.ivfParetoSweep(blobs, blobs.where($"vec_id" < 2),
        "vec_id", "embedding", k = 3, kClusters = 2, iters = 2, maxNprobe = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getAs[Double]("avg_candidates"), r.getAs[Double]("avg_recall"))))
      .toMap
    assert(got.keySet == Set(1L, 2L))
    // both budgets answer for the same 2 queries
    assert(got.values.forall(_._1 == 2L))
    // probing BOTH lists scans every non-self candidate and recalls the
    // brute truth exactly
    assert(got(2L)._2 == 10L && got(2L)._5 == 1.0, got.toString)
    assertApprox(got(2L)._4, 5.0, 1e-12)
    // fewer probes never scan more or recall more
    assert(got(1L)._2 <= got(2L)._2 && got(1L)._5 <= got(2L)._5)
    // each blob holds only 2 other members, so rank 3 must come from the
    // far list (and cosine even ranks cross-blob vecs above q0's noisy
    // own-blob neighbor): hits = 1 (q0) + 2 (q1) of 6 → recall ½
    assertApprox(got(1L)._5, 0.5, 1e-9)
  }

  test("silhouette: tight separated blobs score near 1, counts match the fit") {
    val blobs = Seq(
      (0L, Seq(0.0f, 0.0f)),
      (1L, Seq(10.0f, 10.0f)),
      (2L, Seq(0.5f, 0.0f)),
      (3L, Seq(9.5f, 10.0f)),
      (4L, Seq(0.0f, 0.5f))
    ).toDF("vec_id", "embedding")
    val s = Embeddings.silhouette(blobs, "vec_id", "embedding", k = 2, iters = 2)
      .collect()
      .map(r => r.getAs[Long]("cluster") ->
        ((r.getAs[Long]("n_points"), r.getAs[Double]("mean_silhouette"))))
      .toMap
    // same membership as the kMeansAssign fit: blob sizes 3 and 2
    assert(s.values.map(_._1).toSeq.sorted == Seq(2L, 3L))
    // inter-blob distance ~14 dwarfs intra-blob ~0.5 → s near 1
    assert(s.values.forall(_._2 > 0.9), s.toString)
    // hand-check the 2-member cluster: own centroid (9.75, 10), other
    // centroid (1/6, 1/6); a = 0.25 for both, b differs per member
    val a = 0.25
    def bOf(x: Double, y: Double) =
      math.sqrt(math.pow(x - 1.0 / 6, 2) + math.pow(y - 1.0 / 6, 2))
    val expected = ((bOf(10, 10) - a) / bOf(10, 10) +
      (bOf(9.5, 10) - a) / bOf(9.5, 10)) / 2.0
    val c1 = s.values.find(_._1 == 2L).get._2
    assertApprox(c1, expected, 1e-4)
    // k = 1 is meaningless for a silhouette — rejected loudly
    intercept[IllegalArgumentException](
      Embeddings.silhouette(blobs, "vec_id", "embedding", k = 1, iters = 1))
  }

  test("ivfKMeansTopK searches only the probed trained lists") {
    val blobs = Seq(
      (0L, Seq(0.0f, 0.1f)),
      (1L, Seq(10.0f, 10.0f)),
      (2L, Seq(0.5f, 0.1f)),
      (3L, Seq(9.5f, 10.0f)),
      (4L, Seq(0.1f, 0.5f))
    ).toDF("vec_id", "embedding")
    val top = Embeddings.ivfKMeansTopK(blobs, blobs.where($"vec_id" === 0L),
      "vec_id", "embedding", k = 5, kClusters = 2, iters = 2, nprobe = 1)
    val plan = top.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
    val rows = top.collect().map(_.getLong(2))
    // nprobe=1: only v0's own (left-blob) inverted list is scanned
    assert(rows.toSet == Set(2L, 4L))
    assert(rows.distinct.length == rows.length)
  }

  test("persisted IVF index reproduces the in-plan trained search exactly") {
    val blobs = Seq(
      (0L, Seq(0.0f, 0.1f)),
      (1L, Seq(10.0f, 10.0f)),
      (2L, Seq(0.5f, 0.1f)),
      (3L, Seq(9.5f, 10.0f)),
      (4L, Seq(0.1f, 0.5f))
    ).toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("ivfidx").toString
    Embeddings.saveIvfIndex(blobs, "vec_id", "embedding",
      kClusters = 2, iters = 2, dir = dir)
    val queries = blobs.where($"vec_id" < 2L)
    val persisted = Embeddings.ivfIndexTopK(spark, dir, queries,
      "vec_id", "embedding", k = 5, nprobe = 1)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val inPlan = Embeddings.ivfKMeansTopK(blobs, queries,
      "vec_id", "embedding", k = 5, kClusters = 2, iters = 2, nprobe = 1)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(persisted.toSeq == inPlan.toSeq)
    // the lists really are laid out one directory per inverted list
    val listDirs = new java.io.File(s"$dir/lists").listFiles()
      .filter(_.getName.startsWith("cid=")).map(_.getName).sorted
    assert(listDirs.length == 2, listDirs.mkString(", "))
  }

  test("ivfTopK searches only the query's argmax bucket") {
    // buckets: v0→1, v1→2, v2→1 (first max wins), v3→1
    val top = Embeddings.ivfTopK(emb, emb.where($"vec_id" === 0L), "vec_id", "embedding", 5)
      .collect().map(_.getLong(2)).toSet
    assert(top == Set(2L, 3L)) // v1 is in bucket 2, not searched
  }

  // Four well-separated planted clusters at SMALL scale (within-cluster
  // d² ~1e-6) — the regime where the old pow(u, 1/d²) A-Res key
  // underflowed to 0.0 (ADVICE r5). Ids are assigned so the "id" seeding
  // plants ALL its seeds inside cluster 0 — the local optimum k-means++
  // seeding exists to avoid.
  private lazy val planted = {
    val centers = Seq((0.0, 0.0), (0.1, 0.0), (0.0, 0.1), (0.1, 0.1))
    val pts = for {
      (c, ci) <- centers.zipWithIndex
      j <- 0 until 5
    } yield (ci * 5L + j, Seq((c._1 + 0.001 * j).toFloat, (c._2 + 0.0005 * j).toFloat))
    pts.toDF("vec_id", "embedding")
  }

  test("kMeansPlusPlusSeeds spreads seeds across planted clusters, deterministically") {
    val seeds = Embeddings.kMeansPlusPlusSeeds(planted, "vec_id", "embedding", k = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(seeds.size == 4)
    assert(seeds.values.toSet == Set(0L, 1L, 2L, 3L)) // cids 0..k-1
    // one seed per planted cluster: vec_id / 5 identifies the cluster
    assert(seeds.keys.map(_ / 5).toSet.size == 4, seeds.toSeq.sorted.mkString(", "))
    // pure function of the data: a second run draws identical seeds
    val again = Embeddings.kMeansPlusPlusSeeds(planted, "vec_id", "embedding", k = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == seeds)
  }

  test("kmeans++ seeding beats id seeding on the planted fixture") {
    def totalDist2(seeding: String) =
      Embeddings.kMeansAssign(planted, "vec_id", "embedding", k = 4, iters = 3,
        seeding = seeding)
        .agg(org.apache.spark.sql.functions.sum($"dist2")).head().getDouble(0)
    val plus = totalDist2("kmeans++")
    val byId = totalDist2("id")
    // id seeding plants all 4 seeds in cluster 0 (ids 0–3) and Lloyd gets
    // stuck splitting it while merging remote clusters; kmeans++ lands one
    // seed per cluster, so its distortion is strictly (and vastly) lower
    assert(plus < byId, s"kmeans++ $plus !< id $byId")
    assert(plus < byId * 0.5, s"kmeans++ $plus not clearly below id $byId")
  }

  test("kMeansPlusPlusSeeds degrades to fewer seeds when k exceeds the corpus") {
    val tiny = Seq((0L, Seq(0.0f, 0.0f)), (1L, Seq(1.0f, 1.0f))).toDF("vec_id", "embedding")
    val seeds = Embeddings.kMeansPlusPlusSeeds(tiny, "vec_id", "embedding", k = 5).collect()
    assert(seeds.length == 2)
    assert(seeds.map(_.getLong(0)).toSet == Set(0L, 1L))
  }

  test("kmeans|| seeding matches kmeans++ quality on the planted fixture") {
    val seeds = Embeddings.kMeansParallelSeeds(planted, "vec_id", "embedding", k = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(seeds.size == 4)
    assert(seeds.keys.map(_ / 5).toSet.size == 4) // one seed per cluster
    def totalDist2(seeding: String) =
      Embeddings.kMeansAssign(planted, "vec_id", "embedding", k = 4, iters = 3,
        seeding = seeding)
        .agg(org.apache.spark.sql.functions.sum($"dist2")).head().getDouble(0)
    val par = totalDist2("kmeans||")
    val plus = totalDist2("kmeans++")
    assert(par <= plus + 1e-9, s"kmeans|| $par !<= kmeans++ $plus")
  }

  test("kmeans|| covers 64 planted clusters in 5 rounds, deterministically") {
    // 64 tight clusters of 4 points on an 8x8 grid — the large-k regime
    // where kmeans++'s k-1 sequential scans are the wrong shape
    val big = (for {
      c <- 0 until 64
      j <- 0 until 4
    } yield (c * 4L + j,
      Seq((c % 8 + 0.001f * j), (c / 8 + 0.0005f * j)))).toDF("vec_id", "embedding")
    val seeds = Embeddings.kMeansParallelSeeds(big, "vec_id", "embedding",
      k = 64, rounds = 5).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(seeds.size == 64)
    // every planted cluster holds exactly one seed (vec_id / 4 = cluster)
    assert(seeds.keys.map(_ / 4).toSet.size == 64)
    val again = Embeddings.kMeansParallelSeeds(big, "vec_id", "embedding",
      k = 64, rounds = 5).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == seeds)
  }

  test("kmeans|| degrades to fewer seeds when k exceeds the corpus") {
    val tiny = Seq((0L, Seq(0.0f, 0.0f)), (1L, Seq(1.0f, 1.0f))).toDF("vec_id", "embedding")
    val seeds = Embeddings.kMeansParallelSeeds(tiny, "vec_id", "embedding", k = 5)
      .collect().map(_.getLong(0)).toSet
    assert(seeds == Set(0L, 1L))
  }

  test("recallAtK scores hit fraction per query; missed queries score 0") {
    val truth = Seq((0L, 1L, 10L), (0L, 2L, 20L), (1L, 1L, 10L), (1L, 2L, 30L))
      .toDF("query_id", "rank", "vec_id")
    val approx = Seq((0L, 1L, 10L), (0L, 2L, 99L)) // q0: 1 of 2; q1: absent
      .toDF("query_id", "rank", "vec_id")
    val got = Embeddings.recallAtK(truth, approx).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(0L) == ((2L, 1L, 0.5)))
    assert(got(1L) == ((2L, 0L, 0.0)))
    assert(got.size == 2)
  }

  test("recallAtK is 1.0 when the approx search is the exact one") {
    val t = Embeddings.topK(emb, emb.where($"vec_id" < 2L), "vec_id", "embedding", 2)
    val r = Embeddings.recallAtK(t, t).collect()
    assert(r.length == 2 && r.forall(_.getDouble(3) == 1.0))
  }

  test("knnClassify: majority vote wins; ties break on the smaller label") {
    // synthetic top-k table: q0 gets labels {7,7,9} → 7 by majority;
    // q1 gets {7,9} (1 vote each) → 7 by the smaller-label tie-break,
    // overruling q1's own label 5 (agree=0, the label-error signal)
    val topk = Seq(
      (0L, 1L, 10L), (0L, 2L, 11L), (0L, 3L, 12L),
      (1L, 1L, 11L), (1L, 2L, 13L))
      .toDF("query_id", "rank", "vec_id")
    val labels = Seq((0L, 7), (1L, 5), (10L, 7), (11L, 7), (12L, 9), (13L, 9))
      .toDF("vec_id", "label")
    val got = Embeddings.knnClassify(topk, labels, "vec_id", "label").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(0L) == ((7L, 7L, 2L, 1L)))  // own 7, predicted 7, 2 votes, agree
    assert(got(1L) == ((5L, 7L, 1L, 0L)))  // tie 7 vs 9 → smaller label 7
    assert(got.size == 2)
  }

  test("knnClassify over the brute top-k recovers planted blob labels") {
    val blobs = ((0 until 6).map(i => (i.toLong, Seq(1.0f, 0.0f), 1)) ++
      (6 until 12).map(i => (i.toLong, Seq(0.0f, 1.0f), 2)))
      .toDF("vec_id", "embedding", "label")
    val topk = Embeddings.topK(blobs, blobs, "vec_id", "embedding", 3)
    val got = Embeddings.knnClassify(topk, blobs, "vec_id", "label").collect()
    assert(got.length == 12)
    assert(got.forall(_.getLong(4) == 1L))  // every query's vote agrees
  }

  test("project computes the deterministic SRP sum, long-form output") {
    val one = Seq((7L, Seq(1.0f, 2.0f, -1.0f))).toDF("vec_id", "embedding")
    val got = Embeddings.project(one, "vec_id", "embedding", outDim = 2, dim = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val planes = Embeddings.projPlaneRows(2, 3)
    val x = Seq(1.0, 2.0, -1.0)
    for (j <- 0 until 2) {
      val want = (0 until 3).map(i =>
        planes.find(p => p._1 == j && p._2 == i).get._3 * x(i)).sum / math.sqrt(3)
      assertApprox(got((7L, j)), want, 1e-5)
    }
    assert(got.size == 2)
  }

  test("pqAssign clusters each subspace independently") {
    // two code groups per half: vectors agreeing in one half but not the
    // other must share that half's code only
    val pts = Seq(
      (0L, Seq(0.0f, 0.0f, 9.0f, 9.0f)),
      (1L, Seq(0.1f, 0.1f, 9.1f, 9.1f)),  // near 0 in both halves
      (2L, Seq(0.0f, 0.1f, 5.0f, 5.0f)),  // first half like 0, second far
      (3L, Seq(7.0f, 7.0f, 9.0f, 9.1f))   // first half far, second like 0
    ).toDF("vec_id", "embedding")
    val got = Embeddings.pqAssign(pts, "vec_id", "embedding",
      k = 2, iters = 3, subDim = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.size == 8) // 4 vectors x 2 subspaces
    assert(got((0L, 0L)) == got((1L, 0L)) && got((0L, 0L)) == got((2L, 0L)))
    assert(got((0L, 0L)) != got((3L, 0L)))
    assert(got((0L, 1L)) == got((1L, 1L)) && got((0L, 1L)) == got((3L, 1L)))
    assert(got((0L, 1L)) != got((2L, 1L)))
  }

  test("pqTopK ranks same-cluster candidates first by code distance") {
    // two tight clusters; cluster members share codes, so ADC ties within
    // a cluster resolve by vec_id and cross-cluster distances dominate
    val pts = (for { c <- 0 until 2; j <- 0 until 4 } yield
      (c * 4L + j, Seq.fill(4)(c * 10.0f + 0.1f * j))).toDF("vec_id", "embedding")
    val got = Embeddings.pqTopK(pts, pts.where($"vec_id".isin(0L, 4L)),
      "vec_id", "embedding", knn = 3, k = 2, iters = 2, subDim = 2).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq }
    assert(got(0L) == Seq(1L, 2L, 3L))
    assert(got(4L) == Seq(5L, 6L, 7L))
  }

  test("quantize maps each dimension onto [-128,127]; constant dim to 0") {
    val pts = Seq(
      (0L, Seq(0.0f, 5.0f, 2.0f)),
      (1L, Seq(1.0f, 5.0f, 2.0f)),
      (2L, Seq(0.5f, 5.0f, 2.0f))).toDF("vec_id", "embedding")
    val q = Embeddings.quantize(pts, "vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(q((0L, 0)) == -128L) // min of dim 0
    assert(q((1L, 0)) == 127L)  // max of dim 0
    assert(q((2L, 0)) == 0L)    // floor(0.5*255+0.5)=128 → 0
    assert(Seq(0L, 1L, 2L).forall(v => q((v, 1)) == 0L)) // constant dims
    assert(Seq(0L, 1L, 2L).forall(v => q((v, 2)) == 0L))
  }

  test("project preserves relative distances enough to separate clusters") {
    // two tight planted clusters stay separated after 8->2 projection
    val pts = (for {
      c <- 0 until 2; jj <- 0 until 5
    } yield (c * 5L + jj,
      (0 until 8).map(d => (if (d % 2 == c) 1.0f else 0.0f) + 0.01f * jj).toSeq))
      .toDF("vec_id", "embedding")
    val proj = Embeddings.project(pts, "vec_id", "embedding", outDim = 2, dim = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    def vec(id: Long) = (0 until 2).map(j => proj((id, j)))
    def d2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (p, q) => (p - q) * (p - q) }.sum
    val intra = d2(vec(0L), vec(1L))
    val inter = d2(vec(0L), vec(5L))
    assert(inter > intra * 10, s"inter $inter vs intra $intra")
  }

  test("classCentroids: per-group component means in long form") {
    val pts = Seq(
      (0L, Seq(1.0f, 0.0f), 0),
      (1L, Seq(3.0f, 2.0f), 0),
      (2L, Seq(0.0f, 4.0f), 1)).toDF("vec_id", "embedding", "label")
    val c = Embeddings.classCentroids(pts, "vec_id", "embedding", "label")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(c == Map(
      (0, 0) -> ((2L, 2.0)), (0, 1) -> ((2L, 1.0)),
      (1, 0) -> ((1L, 0.0)), (1, 1) -> ((1L, 4.0))))
  }

  test("prototypeAssign: planted outlier flips to the nearer class mean") {
    // class 0 lives on the x axis, class 1 on the y axis; vec 4 carries
    // label 0 but sits on the y axis — its prediction must flip to 1
    // even though it drags class 0's own centroid toward y.
    val pts = Seq(
      (0L, Seq(10.0f, 0.0f), 0),
      (1L, Seq(12.0f, 0.0f), 0),
      (2L, Seq(0.0f, 10.0f), 1),
      (3L, Seq(0.0f, 11.0f), 1),
      (4L, Seq(0.0f, 10.5f), 0)).toDF("vec_id", "embedding", "label")
    val r = Embeddings.prototypeAssign(pts, "vec_id", "embedding", "label")
      .collect().map(x => x.getLong(0) -> ((x.getInt(1), x.getInt(2)))).toMap
    assert(r(0L) == ((0, 0)) && r(1L) == ((0, 0)), "inliers keep their label")
    assert(r(2L) == ((1, 1)) && r(3L) == ((1, 1)))
    assert(r(4L) == ((0, 1)), "outlier predicted into the other class")
  }

  test("labelCoherence: hand-computed cohesion and nearest-other separation") {
    // label 0: (0,0),(2,0) -> centroid (1,0), each member d2 = 1
    // label 1: (10,0),(12,0) -> centroid (11,0), each member d2 = 1
    // label 2: (30,0) -> centroid on itself, d2 = 0
    // separations: 0<->1 = 100, 1<->2 = 361, 0<->2 = 841
    val pts = Seq(
      (0L, Seq(0.0f, 0.0f), 0), (1L, Seq(2.0f, 0.0f), 0),
      (2L, Seq(10.0f, 0.0f), 1), (3L, Seq(12.0f, 0.0f), 1),
      (4L, Seq(30.0f, 0.0f), 2)).toDF("vec_id", "embedding", "label")
    val r = Embeddings.labelCoherence(pts, "vec_id", "embedding", "label")
      .collect()
      .map(x => x.getInt(0) -> ((x.getLong(1), x.getDouble(2), x.getDouble(3))))
      .toMap
    assert(r.keySet == Set(0, 1, 2))
    assert(r(0)._1 == 2L && r(1)._1 == 2L && r(2)._1 == 1L)
    assertApprox(r(0)._2, 1.0); assertApprox(r(0)._3, 100.0)
    assertApprox(r(1)._2, 1.0); assertApprox(r(1)._3, 100.0)
    assertApprox(r(2)._2, 0.0); assertApprox(r(2)._3, 361.0)
  }

  test("labelOutliers: planted outlier carries the extreme z; degenerate labels z=0") {
    // label 0 on the x axis: x = 0,0,0,4 -> centroid x=1, d2 = 1,1,1,9,
    //   mean 3, var 12 -> z = -2/sqrt(12) (x3) and 6/sqrt(12) = sqrt(3)
    // label 1: singleton -> d2 = 0, var 0 -> z = 0
    // label 2: two identical members -> both d2 = 0, var 0 -> z = 0
    val pts = Seq(
      (0L, Seq(0.0f, 0.0f), 0), (1L, Seq(0.0f, 0.0f), 0),
      (2L, Seq(0.0f, 0.0f), 0), (3L, Seq(4.0f, 0.0f), 0),
      (4L, Seq(30.0f, 0.0f), 1),
      (5L, Seq(0.0f, 50.0f), 2), (6L, Seq(0.0f, 50.0f), 2))
      .toDF("vec_id", "embedding", "label")
    def run() = Embeddings.labelOutliers(pts, "vec_id", "embedding", "label")
      .collect()
      .map(x => x.getLong(0) -> ((x.getInt(1), x.getDouble(2), x.getDouble(3))))
      .toMap
    val r = run()
    assert(r.keySet == (0L to 6L).toSet, "every vector gets a row")
    Seq(0L, 1L, 2L).foreach { id =>
      assertApprox(r(id)._2, 1.0, 1e-6)
      assertApprox(r(id)._3, -2.0 / math.sqrt(12.0), 1e-6)
    }
    assertApprox(r(3L)._2, 9.0, 1e-6)
    assertApprox(r(3L)._3, math.sqrt(3.0), 1e-6)
    assert(r(3L)._3 == r.values.map(_._3).max, "planted outlier has the max z")
    Seq(4L, 5L, 6L).foreach { id =>
      assertApprox(r(id)._2, 0.0, 1e-6)
      assert(r(id)._3 == 0.0, "zero-variance label scores z = 0")
    }
    assert(run() == r, "deterministic across runs")
  }

  test("semanticDedup: larger id of an eps-close SAME-cluster pair drops; " +
      "identical cross-cluster pair survives the blocking") {
    val pts = Seq(
      (0L, Seq(1.0f, 0.0f), 0),
      (1L, Seq(1.0f, 0.01f), 0),  // cosine ≈ 0.99995 with vec 0 → dropped
      (2L, Seq(0.0f, 1.0f), 0),   // orthogonal → kept
      (3L, Seq(1.0f, 0.0f), 1)    // identical to vec 0, other cluster → kept
    ).toDF("vec_id", "embedding", "label")
    val r = Embeddings.semanticDedup(pts, "vec_id", "embedding", "label", 0.9)
      .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(r == Map(0L -> 1L, 1L -> 0L, 2L -> 1L, 3L -> 1L))
  }

  test("kCenterSample: greedy farthest-point picks, hand-traced") {
    // 1-D line: 0, 1, 10, 11, 100. Seed = min id (point at 0); the
    // farthest is 100 (d2 10000); next is 11 (min d2 to {0,100} = 121,
    // beating 10's min of 100); after {0, 100, 11} both remaining points
    // sit at min d2 = 1 → tie on the snapped distance, smaller id wins
    // → point id 1
    val pts = Seq(
      (0L, Seq(0.0f)), (1L, Seq(1.0f)), (2L, Seq(10.0f)),
      (3L, Seq(11.0f)), (4L, Seq(100.0f))
    ).toDF("vec_id", "embedding")
    val r = Embeddings.kCenterSample(pts, "vec_id", "embedding", 4)
      .orderBy("rank").collect()
      .map(x => (x.getAs[Long]("rank"), x.getAs[Long]("vec_id"),
        x.getAs[Double]("d2")))
    assert(r.map(_._2).toSeq === Seq(0L, 4L, 3L, 1L), r.toSeq)
    assert(r(0)._3 === 0.0)
    assertApprox(r(1)._3, 10000.0)
    assertApprox(r(2)._3, 121.0)
    assertApprox(r(3)._3, 1.0)
  }

  test("kCenterSample: k beyond the point count returns every point once") {
    val pts = Seq((7L, Seq(0.0f)), (8L, Seq(5.0f))).toDF("vec_id", "embedding")
    val r = Embeddings.kCenterSample(pts, "vec_id", "embedding", 10).collect()
    assert(r.map(_.getAs[Long]("vec_id")).sorted.toSeq === Seq(7L, 8L))
    assert(r.map(_.getAs[Long]("rank")).sorted.toSeq === Seq(0L, 1L))
  }

  test("truncationAudit: hand-computed deltas, zero-prefix convention") {
    // query (1,0,0,0), prefix = first 2 dims:
    //  id 1 identical            → cf = 1,    ch = 1    → d = 0
    //  id 2 orthogonal in prefix → cf = 0,    ch = 0    → d = 0
    //  id 3 ZERO prefix          → cf = 0,    ch = 0 (convention) → d = 0
    //  id 4 (1,0,1,0)            → cf = 1/√2, ch = 1    → d ≈ 0.292893
    val pts = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(1f, 0f, 0f, 0f)),
      (2L, Seq(0f, 1f, 0f, 0f)), (3L, Seq(0f, 0f, 1f, 0f)),
      (4L, Seq(1f, 0f, 1f, 0f))).toDF("vec_id", "embedding")
    val r = Embeddings.truncationAudit(pts, "vec_id", "embedding",
        prefixDim = 2, queryMod = 10).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(0) == 0L && row.getLong(1) == 4L)
    assertApprox(row.getDouble(3), 1.0 - 0.707107, 1e-6)   // max |Δ|
    assertApprox(row.getDouble(2), (1.0 - 0.707107) / 4, 1e-6)
    assert(row.getLong(4) == 1L)                           // only id 4 moved
  }

  test("lshProbeMasks: exactly the 6-bit masks with ≤ h bits, unique, zero included") {
    for (h <- 0 to 3) {
      val ms = Embeddings.lshProbeMasks(6, h)
      assert(ms.distinct.size == ms.size)
      assert(ms.contains(0L))
      assert(ms.toSet ==
        (0L until 64L).filter(m => java.lang.Long.bitCount(m) <= h).toSet, s"h=$h")
    }
  }

  test("ivfListBalance: planted 2-vs-4 split, hand-computed load factors") {
    // two tight groups; id-seeding puts both seeds in group A, but one
    // Lloyd update pulls the centroids apart and round 2 assigns 2 vs 4
    val skewed = Seq(
      (1L, Seq(0.0f, 0.0f)), (2L, Seq(1.0f, 1.0f)),
      (3L, Seq(10.0f, 10.0f)), (4L, Seq(10.0f, 11.0f)),
      (5L, Seq(11.0f, 10.0f)), (6L, Seq(11.0f, 11.0f))
    ).toDF("vec_id", "embedding")
    val out = Embeddings.ivfListBalance(skewed, "vec_id", "embedding",
        k = 2, iters = 2)
      .collect().map(r => r.getLong(1) -> (r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(2L, 4L))
    assertApprox(out(0)._2._1, 2.0 / 6, 1e-12)   // share
    assertApprox(out(1)._2._1, 4.0 / 6, 1e-12)
    assertApprox(out(0)._2._2, 4.0 / 6, 1e-12)   // load = n·k/N
    assertApprox(out(1)._2._2, 8.0 / 6, 1e-12)
  }
}
