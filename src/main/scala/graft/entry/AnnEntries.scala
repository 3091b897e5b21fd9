package graft.entry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, lit, pmod}

import graft.ext.Embeddings
import EntryUtil._

/**
 * Driver-contract queries for similarity search over the embeddings table.
 * The query set (vec_id < 50) and k values are part of the contract.
 */
object AnnEntries {

  private val QueryCount = 50

  /** k-center contract: picks (seed + 4 greedy rounds). */
  private val KCenterK = 5

  /** MMR contract: 5 picks from each query's relevance top-20 at the
    * conventional lambda = 0.7 relevance/diversity trade. */
  private val MmrK = 5
  private val MmrPool = 20
  private val MmrLambda = 0.7

  /** Truncation-audit contract: keep the first 32 of 64 dims, sample
    * queries at ids ≡ 0 mod 50, count moves above the 1e-3 grid. */
  private val TruncDim = 32
  private val TruncQueryMod = 50
  private val TruncEps = 0.001

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // greedy farthest-point diversity sample (Gonzalez k-center):
    // snapped-distance argmax per round, id tie-break
    "sample_kcenter" -> ((s, dir) =>
      gate(Embeddings.kCenterSample(embeddings(s, dir),
        "vec_id", "embedding", KCenterK), "rank")),
    // Matryoshka truncation audit: per query the |Δcosine| distribution
    // between full-dim and prefix-dim similarity — both snapped before
    // differencing, so the deltas are bit-identical in any engine
    "embed_truncation_audit" -> ((s, dir) =>
      gate(Embeddings.truncationAudit(embeddings(s, dir), "vec_id",
        "embedding", TruncDim, TruncQueryMod, TruncEps), "query_id")),
    // brute-force cosine top-10 for the 50 query vectors
    "ann_topk_brute" -> ((s, dir) => {
      val e = embeddings(s, dir)
      gate(Embeddings.topK(e, e.where(col("vec_id") < QueryCount),
        "vec_id", "embedding", 10), "query_id", "rank")
    }),
    // IVF-bucketed top-5 (argmax-dimension coarse quantizer)
    "ann_ivf_topk" -> ((s, dir) => {
      val e = embeddings(s, dir)
      gate(Embeddings.ivfTopK(e, e.where(col("vec_id") < QueryCount),
        "vec_id", "embedding", 5), "query_id", "rank")
    }),
    // random-hyperplane LSH-bucketed top-5
    "ann_lsh_topk" -> ((s, dir) => {
      val e = embeddings(s, dir)
      gate(Embeddings.lshTopK(e, e.where(col("vec_id") < QueryCount),
        "vec_id", "embedding", 5, dim = 64), "query_id", "rank")
    }),
    // multi-probe LSH top-5 (own bucket + all hamming-1 buckets)
    "ann_lsh_multiprobe" -> ((s, dir) => {
      val e = embeddings(s, dir)
      gate(Embeddings.lshTopKMultiProbe(e, e.where(col("vec_id") < QueryCount),
        "vec_id", "embedding", 5, dim = 64), "query_id", "rank")
    }),
    // fixed-iteration distributed k-means (IVF training / clustering)
    "embed_kmeans" -> ((s, dir) =>
      gate(Embeddings.kMeansAssign(embeddings(s, dir), "vec_id", "embedding",
        k = KMeansK, iters = KMeansIters), "vec_id")),
    // ext: spherical k-means — Lloyd on the unit sphere (argmax cosine,
    // re-normalized mean-direction updates); the clustering semantic
    // similarity actually wants, magnitude-free
    "embed_kmeans_spherical" -> ((s, dir) =>
      gate(Embeddings.sphericalKMeansAssign(embeddings(s, dir), "vec_id",
        "embedding", k = KMeansK, iters = KMeansIters), "vec_id")),
    // ext: per-cluster simplified (centroid) silhouette of the SAME fit —
    // a and b are the argmin and runner-up of the distance table the
    // assignment round already ranks, so the readout costs one extra
    // pivot + a k-row aggregate beyond the fit
    "embed_silhouette" -> ((s, dir) =>
      gate(Embeddings.silhouette(embeddings(s, dir), "vec_id", "embedding",
        k = KMeansK, iters = KMeansIters), "cluster")),
    // ext: IVF inverted-list occupancy — per-list share + load factor
    // off the same Lloyd assignment; the skew table that prices probe
    // cost before a corpus commits to an IVF layout
    "ann_ivf_balance" -> ((s, dir) =>
      gate(Embeddings.ivfListBalance(embeddings(s, dir), "vec_id",
        "embedding", k = KMeansK, iters = KMeansIters), "cluster")),
    // THE ANN KERNEL ROUTER (r13): "which near-duplicate blocking do I
    // run on this embedding corpus at 100 TB" answered from measured
    // surfaces — the dedup_auto / cosine_auto pattern applied to the
    // third family. One decision row per planted regime, the CHOICE
    // flipping across them: a constant-size pilot slice whose C(n,2)
    // fits the vector-linear budget (→ brute — and, uniquely in this
    // family, a rung that CORRECTLY flips to a bucketed kernel when the
    // slice outgrows the budget: all-pairs surfaces have no df profile
    // to stay flat); the same corpus with 8 planted well-separated
    // modes, where the Lloyd fit's explained-variance ratio certifies
    // that inverted lists bound candidates (→ ivf); and the organic
    // isotropic blob (measured label-EVR 3e-4) where Voronoi cells
    // carry no similarity signal and only sign-LSH banding bounds
    // candidates (→ lsh_banded). Snapped-double EVR + integer pair
    // arithmetic; the oracle replays the ladder verbatim.
    "ann_auto" -> ((s, dir) =>
      gate(Seq("blob", "clustered", "pilot").map { r =>
        Embeddings.annRoute(annAutoRegime(s, dir, r), "vec_id",
          "embedding", KMeansK, KMeansIters, AnnAutoBudgetPerVec)
          .select(lit(r).as("regime"), col("*"))
      }.reduce(_ unionByName _), "regime")),
    // ext: the nprobe recall/cost pareto curve — exact recall@5 vs
    // candidate volume per probe budget, ONE scored table fanned out
    // over nprobe (a candidate lives in exactly one list, so each pair
    // carries its list's probe rank)
    "ann_pareto" -> ((s, dir) => {
      val e = embeddings(s, dir)
      gate(Embeddings.ivfParetoSweep(e, e.where(col("vec_id") < QueryCount),
        "vec_id", "embedding", k = 5, KMeansK, KMeansIters, MaxNprobe),
        "nprobe")
    }),
    // trained-IVF top-5: k-means codebook, nprobe=2 nearest lists searched
    "ann_ivf_kmeans" -> ((s, dir) => {
      val e = embeddings(s, dir)
      gate(Embeddings.ivfKMeansTopK(e, e.where(col("vec_id") < QueryCount),
        "vec_id", "embedding", 5, KMeansK, KMeansIters, nprobe = Nprobe),
        "query_id", "rank")
    }),
    // the PERSISTED index lifecycle: train + write the codebook and
    // cid-partitioned inverted lists once per (JVM, dir), then search
    // through the reloaded parquet — must be bit-identical to the
    // in-plan ivfKMeansTopK (same oracle string proves it)
    "ann_ivf_persist" -> ((s, dir) => {
      val e = embeddings(s, dir)
      val idx = Embeddings.ivfIndexLocation(s, dir)
      if (!new java.io.File(s"$idx/centroids").exists())
        Embeddings.saveIvfIndex(e, "vec_id", "embedding",
          KMeansK, KMeansIters, idx)
      gate(Embeddings.ivfIndexTopK(s, idx,
        e.where(col("vec_id") < QueryCount),
        "vec_id", "embedding", 5, nprobe = Nprobe), "query_id", "rank")
    }),
    // recall@5 of multi-probe LSH against the exact top-5 — the ANN
    // self-audit every index deployment needs
    "ann_recall" -> ((s, dir) => {
      val e = embeddings(s, dir)
      val q = e.where(col("vec_id") < QueryCount)
      gate(Embeddings.recallAtK(
        Embeddings.topK(e, q, "vec_id", "embedding", 5),
        Embeddings.lshTopKMultiProbe(e, q, "vec_id", "embedding", 5, dim = EmbDim)),
        "query_id")
    }),
    // Johnson–Lindenstrauss signed-random-projection 64 → 16 dims
    "embed_project" -> ((s, dir) =>
      gate(Embeddings.project(embeddings(s, dir), "vec_id", "embedding",
        outDim = ProjDim, dim = EmbDim), "vec_id", "j")),
    // population covariance of the embedding column (upper triangle) —
    // PCA's input and the embedding-collapse anisotropy audit; the only
    // shuffle is d²-sized regardless of N
    "embed_covariance" -> ((s, dir) =>
      gate(Embeddings.covariance(embeddings(s, dir), "vec_id", "embedding"),
        "i", "j")),
    // per-dimension int8 scalar quantization (SQ8)
    "embed_quantize" -> ((s, dir) =>
      gate(Embeddings.quantize(embeddings(s, dir), "vec_id", "embedding"),
        "vec_id", "i")),
    // product quantization: 8 subspaces x 16 codes, 2 Lloyd rounds
    "embed_pq" -> ((s, dir) =>
      gate(Embeddings.pqAssign(embeddings(s, dir), "vec_id", "embedding",
        k = PqK, iters = KMeansIters, subDim = PqSubDim), "vec_id", "s")),
    // PQ asymmetric-distance top-5: codes-only candidate scan
    "ann_pq_adc" -> ((s, dir) => {
      val e = embeddings(s, dir)
      gate(Embeddings.pqTopK(e, e.where(col("vec_id") < QueryCount),
        "vec_id", "embedding", knn = 5, k = PqK, iters = KMeansIters,
        subDim = PqSubDim), "query_id", "rank")
    }),
    // maximal-marginal-relevance diversified top-5 from each query's
    // relevance top-20 pool: k−1 result-sized greedy rounds after the
    // one corpus-sized pool scan (Embeddings.mmrTopK)
    "retrieval_mmr" -> ((s, dir) => {
      val e = embeddings(s, dir)
      gate(Embeddings.mmrTopK(e, e.where(col("vec_id") < QueryCount),
        "vec_id", "embedding", k = MmrK, poolSize = MmrPool,
        lambda = MmrLambda), "query_id", "rank")
    }),
    // hard-negative mining for contrastive training: highest-cosine
    // DIFFERENT-label candidates per anchor (label = relevance proxy)
    "hard_negatives" -> ((s, dir) => {
      val e = embeddings(s, dir)
      gate(Embeddings.hardNegatives(e, e.where(col("vec_id") < QueryCount),
        "vec_id", "embedding", "label", 5), "query_id", "rank")
    }),
    // Reciprocal Rank Fusion of two retrievers over the same queries —
    // the score-free hybrid-search ensemble (exact dense top-10 fused
    // with the sign-LSH top-5); result-sized join + one rank window
    "hybrid_rrf" -> ((s, dir) => {
      val e = embeddings(s, dir)
      val q = e.where(col("vec_id") < QueryCount)
      gate(graft.ext.Retrieval.rrfFuse(
        Embeddings.topK(e, q, "vec_id", "embedding", 10),
        Embeddings.lshTopK(e, q, "vec_id", "embedding", 5, dim = EmbDim),
        k = 5), "query_id", "rank")
    }),
    // order-sensitive retrieval metrics: MRR + nDCG@5 of the LSH list
    // against the exact top-10 relevance set (ann_recall's companion —
    // recall can't see right-set-wrong-order); gain constants are JVM
    // literals shared with the oracle, so no engine runs a log
    "retrieval_ndcg" -> ((s, dir) => {
      val e = embeddings(s, dir)
      val q = e.where(col("vec_id") < QueryCount)
      gate(graft.ext.Retrieval.rankEval(
        Embeddings.topK(e, q, "vec_id", "embedding", 10),
        Embeddings.lshTopK(e, q, "vec_id", "embedding", 5, dim = EmbDim),
        k = 5), "query_id")
    }),
    // kNN label vote over the brute top-10 (label-error audit /
    // auto-labeling); the classifier itself is index-agnostic
    "knn_classify" -> ((s, dir) => {
      val e = embeddings(s, dir)
      gate(Embeddings.knnClassify(
        Embeddings.topK(e, e.where(col("vec_id") < QueryCount),
          "vec_id", "embedding", KnnVoteK),
        e, "vec_id", "label"), "query_id")
    }),
    // per-label mean-pooled centroid (class prototypes, long form)
    "embed_centroids" -> ((s, dir) =>
      gate(Embeddings.classCentroids(embeddings(s, dir), "vec_id", "embedding",
        "label"), "grp", "i")),
    // nearest-class-mean assignment (label audit / outlier candidates)
    "embed_prototype" -> ((s, dir) =>
      gate(Embeddings.prototypeAssign(embeddings(s, dir), "vec_id", "embedding",
        "label"), "vec_id")),
    // per-label centroid drift between two snapshots (vec_id parity as
    // the deterministic snapshot split — the drift-monitor fixture)
    "embedding_drift" -> ((s, dir) => {
      val e = embeddings(s, dir)
      gate(Embeddings.centroidDrift(
        e.where(pmod(col("vec_id"), lit(2)) === 0),
        e.where(pmod(col("vec_id"), lit(2)) === 1),
        "vec_id", "embedding", "label"), "grp")
    }),
    // per-label cohesion vs nearest-other-centroid separation summary
    "embed_label_coherence" -> ((s, dir) =>
      gate(Embeddings.labelCoherence(embeddings(s, dir), "vec_id", "embedding",
        "label"), "grp")),
    // per-vector within-label outlier z-score (mislabel drill-down)
    "embed_outliers" -> ((s, dir) =>
      gate(Embeddings.labelOutliers(embeddings(s, dir), "vec_id", "embedding",
        "label"), "vec_id")),
    // margin-based pair mining (Artetxe & Schwenk 2019): per query its
    // best candidate scored by the local-density-normalized ratio margin
    // (fwd/bwd top-MarginK means off one score matrix), with the mined
    // cut and the mutual-best flag — the alignment-mining step that
    // turns two embedded corpora into paired training data
    "embed_margin_mining" -> ((s, dir) => {
      val e = embeddings(s, dir)
      gate(Embeddings.marginMine(e, e.where(col("vec_id") < QueryCount),
        "vec_id", "embedding", k = MarginK, threshold = MarginTau),
        "query_id")
    })
  )

  /** Input embedding width and the projection contract's output width. */
  private val EmbDim = 64
  private val ProjDim = 16

  /** Codebook size / subspace width for the product-quantization contract
    * (64 dims → 8 subspaces of 8; 16 codes each → 4 bits per subspace). */
  private val PqK = 16
  private val PqSubDim = 8

  /** Cluster count / Lloyd rounds / probe width for the k-means contract. */
  private val KMeansK = 8
  private val KMeansIters = 2
  private val Nprobe = 2

  /** ann_auto contract: the pilot slice is CONSTANT-size (ids < 200 —
    * the same 200 vectors at every sf, so its brute choice is trivially
    * scale-stable), the budget is 128 candidate pairs per vector
    * (C(200,2) = 19,900 ≤ 25,600 at the pilot; C(500,2) = 124,750 >
    * 64,000 already at the smallest full corpus), and the clustered
    * plant shifts every dimension by 4·(vec_id mod 8) — 32× the
    * organic per-dim spread (std 0.125), so the 8 modes are
    * unambiguous, the id-ordered seeds 0..7 land one per mode, and the
    * fit's EVR clears the 0.5 rung by construction (~0.98 vs the
    * blob's ~0.03). */
  private val AnnAutoPilot = 200L
  private val AnnAutoBudgetPerVec = 128L
  private val AnnAutoOffset = "4.0"

  /** ann_auto's planted three-regime corpora, derived from the one
    * embeddings table: `pilot` = the constant-size slice; `clustered` =
    * every vector shifted (in double precision, so the DuckDB twin is
    * IEEE-identical) onto one of 8 well-separated diagonal modes;
    * `blob` = the organic corpus as-is. */
  private def annAutoRegime(s: SparkSession, dir: String,
      regime: String): DataFrame = {
    val e = embeddings(s, dir)
    regime match {
      case "pilot" => e.where(col("vec_id") < AnnAutoPilot)
      case "clustered" => e.select(col("vec_id"),
        expr(s"transform(embedding, x -> CAST(x AS DOUBLE) + " +
          s"CAST($AnnAutoOffset AS DOUBLE) * CAST(vec_id % $KMeansK AS DOUBLE))")
          .as("embedding"))
      case _ => e
    }
  }

  /** Probe budgets swept by the pareto contract (half the codebook). */
  private val MaxNprobe = 4

  /** Neighbors voting in the kNN-classification contract. */
  private val KnnVoteK = 10

  /** Neighborhood width / mined-pair ratio cut for the margin-mining
    * contract (τ chosen to split this corpus's best-pair margins). */
  private val MarginK = 4
  private val MarginTau = 1.25

  /** Hyperplane/probe-mask VALUES tables shared with [[DedupEntries]]. */
  private val planesSql = lshPlanesSql(64)

  /** Norms + query-restricted dots, shared by both oracles. */
  private def cosSql(queryPred: String): String =
    s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
      |u AS (SELECT vec_id, i, embedding[i+1] AS vf, embedding[i+1]::DOUBLE AS v
      |      FROM e, UNNEST(range(len(embedding))) AS r(i)),
      |n AS (SELECT vec_id, sqrt(SUM(v*v)) AS nrm FROM u GROUP BY 1),
      |d AS (SELECT a.vec_id AS query_id, b.vec_id AS cand_id, SUM(a.v * b.v) AS dot
      |      FROM u a JOIN u b ON a.i = b.i AND $queryPred AND a.vec_id <> b.vec_id
      |      GROUP BY 1, 2),
      |cosr AS (SELECT query_id, cand_id,
      |                ${r6sql("dot / (nq.nrm * nc.nrm)")} AS cosine
      |         FROM d JOIN n nq ON nq.vec_id = query_id
      |                JOIN n nc ON nc.vec_id = cand_id)""".stripMargin

  /** The MMR greedy selection as `k` unrolled argmax rounds. Relevance
    * pool and candidate-candidate similarities snap to the 1e-6 grid
    * exactly as Embeddings.mmrTopK does, so every argmax agrees; the
    * lambda weights interpolate from the SAME JVM doubles the Spark side
    * multiplies by. sel/s CTEs are MATERIALIZED: each is referenced by
    * every later round, and DuckDB 1.0 inlines plain CTEs per reference
    * (the O(r^rounds) blowup the verify notes document). */
  private def mmrOracle(k: Int, pool: Int, lambda: Double): String = {
    val lam = s"CAST($lambda AS DOUBLE)"
    val mu = s"CAST(${1.0 - lambda} AS DOUBLE)"
    val head = cosSql(s"a.vec_id < $QueryCount") + s""",
      |pool AS MATERIALIZED (
      |  SELECT query_id, cand_id, cosine AS rel FROM
      |    (SELECT query_id, cand_id, cosine,
      |            row_number() OVER (PARTITION BY query_id
      |                               ORDER BY cosine DESC, cand_id) AS rn
      |     FROM cosr) WHERE rn <= $pool),
      |cp AS (SELECT DISTINCT p1.cand_id AS x, p2.cand_id AS y
      |       FROM pool p1 JOIN pool p2 ON p1.query_id = p2.query_id
      |        AND p1.cand_id <> p2.cand_id),
      |ccd AS (SELECT cp.x, cp.y, SUM(a.v * b.v) AS dot
      |        FROM cp JOIN u a ON a.vec_id = cp.x
      |                JOIN u b ON b.vec_id = cp.y AND b.i = a.i
      |        GROUP BY 1, 2),
      |cc AS MATERIALIZED (
      |  SELECT x, y, ${r6sql("dot / (nx.nrm * ny.nrm)")} AS sim
      |  FROM ccd JOIN n nx ON nx.vec_id = x JOIN n ny ON ny.vec_id = y),
      |s1 AS MATERIALIZED (
      |  SELECT query_id, cand_id, rel, mmr, CAST(1 AS BIGINT) AS rank FROM
      |    (SELECT query_id, cand_id, rel, mmr,
      |            row_number() OVER (PARTITION BY query_id
      |                               ORDER BY mmr DESC, cand_id) AS rn
      |     FROM (SELECT query_id, cand_id, rel,
      |                  ${r6sql(s"$lam * rel")} AS mmr
      |           FROM pool)) WHERE rn = 1),
      |sel1 AS MATERIALIZED (SELECT query_id, cand_id FROM s1)"""
    val rounds = (2 to k).map { r =>
      val p = r - 1
      s""",
      |m$r AS (SELECT p.query_id, p.cand_id, p.rel, MAX(cc.sim) AS ms
      |        FROM pool p JOIN sel$p s ON s.query_id = p.query_id
      |        JOIN cc ON cc.x = p.cand_id AND cc.y = s.cand_id
      |        WHERE NOT EXISTS (SELECT 1 FROM sel$p z
      |                          WHERE z.query_id = p.query_id
      |                            AND z.cand_id = p.cand_id)
      |        GROUP BY 1, 2, 3),
      |s$r AS MATERIALIZED (
      |  SELECT query_id, cand_id, rel, mmr, CAST($r AS BIGINT) AS rank FROM
      |    (SELECT query_id, cand_id, rel, mmr,
      |            row_number() OVER (PARTITION BY query_id
      |                               ORDER BY mmr DESC, cand_id) AS rn
      |     FROM (SELECT query_id, cand_id, rel,
      |                  ${r6sql(s"$lam * rel - $mu * ms")} AS mmr
      |           FROM m$r)) WHERE rn = 1),
      |sel$r AS MATERIALIZED (SELECT query_id, cand_id FROM sel$p
      |        UNION ALL SELECT query_id, cand_id FROM s$r)"""
    }.mkString
    val tail = s"""
      |SELECT query_id, rank, cand_id AS vec_id, rel, mmr
      |FROM (${(1 to k).map(r => s"SELECT * FROM s$r").mkString(" UNION ALL ")})
      |ORDER BY query_id, rank"""
    (head + rounds + tail).stripMargin
  }

  /** Trained-IVF search mirroring Embeddings.ivfKMeansTopK: the
    * embed_kmeans chain + final centroid update (c2), nearest-centroid
    * inverted lists (cb), nprobe-nearest query probes (qp), cosine rank
    * within probed lists. Shared by ann_ivf_kmeans AND ann_ivf_persist:
    * the persisted index must reproduce the in-plan search exactly. */
  /** The 2 unrolled Lloyd rounds up to the UNFILTERED final argmin table
    * `a2` (vec_id, cid, d2, rn) — shared by embed_kmeans (rn = 1 rows)
    * and ann_ivf_balance (per-list occupancy of the rn = 1 assignment). */
  private lazy val kmeansAssignChainSql: String =
    s"""WITH u AS (SELECT vec_id, i, CAST(embedding[i+1] AS DOUBLE) AS x
      |           FROM embeddings, UNNEST(range(len(embedding))) AS r(i)),
      |seed AS (SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid
      |         FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT $KMeansK)),
      |c0 AS (SELECT s.cid, u.i, u.x AS c FROM u JOIN seed s ON u.vec_id = s.vec_id),
      |d1 AS (SELECT u.vec_id, c.cid,
      |              ${r6sql("SUM((u.x - c.c) * (u.x - c.c))")} AS d2
      |       FROM u JOIN c0 c ON u.i = c.i GROUP BY 1, 2),
      |a1 AS (SELECT vec_id, cid FROM
      |         (SELECT vec_id, cid,
      |                 row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
      |          FROM d1) WHERE rn = 1),
      |c1 AS (SELECT a.cid, u.i, ${r6sql("AVG(u.x)")} AS c
      |       FROM u JOIN a1 a ON u.vec_id = a.vec_id GROUP BY 1, 2),
      |d2t AS (SELECT u.vec_id, c.cid,
      |               ${r6sql("SUM((u.x - c.c) * (u.x - c.c))")} AS d2
      |        FROM u JOIN c1 c ON u.i = c.i GROUP BY 1, 2),
      |a2 AS (SELECT vec_id, cid, d2,
      |              row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
      |       FROM d2t)""".stripMargin

  private lazy val ivfKMeansOracle: String =
    s"""WITH u AS (SELECT vec_id, i, CAST(embedding[i+1] AS DOUBLE) AS x
        |           FROM embeddings, UNNEST(range(len(embedding))) AS r(i)),
        |n AS (SELECT vec_id, sqrt(SUM(x*x)) AS nrm FROM u GROUP BY 1),
        |seed AS (SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid
        |         FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT $KMeansK)),
        |c0 AS (SELECT s.cid, u.i, u.x AS c FROM u JOIN seed s ON u.vec_id = s.vec_id),
        |d1 AS (SELECT u.vec_id, c.cid,
        |              ${r6sql("SUM((u.x - c.c) * (u.x - c.c))")} AS d2
        |       FROM u JOIN c0 c ON u.i = c.i GROUP BY 1, 2),
        |a1 AS (SELECT vec_id, cid FROM
        |         (SELECT vec_id, cid,
        |                 row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        |          FROM d1) WHERE rn = 1),
        |c1 AS (SELECT a.cid, u.i, ${r6sql("AVG(u.x)")} AS c
        |       FROM u JOIN a1 a ON u.vec_id = a.vec_id GROUP BY 1, 2),
        |d2t AS (SELECT u.vec_id, c.cid,
        |               ${r6sql("SUM((u.x - c.c) * (u.x - c.c))")} AS d2
        |        FROM u JOIN c1 c ON u.i = c.i GROUP BY 1, 2),
        |a2 AS (SELECT vec_id, cid FROM
        |         (SELECT vec_id, cid,
        |                 row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        |          FROM d2t) WHERE rn = 1),
        |c2 AS (SELECT a.cid, u.i, ${r6sql("AVG(u.x)")} AS c
        |       FROM u JOIN a2 a ON u.vec_id = a.vec_id GROUP BY 1, 2),
        |dc AS (SELECT u.vec_id, c.cid,
        |              ${r6sql("SUM((u.x - c.c) * (u.x - c.c))")} AS d2
        |       FROM u JOIN c2 c ON u.i = c.i GROUP BY 1, 2),
        |cb AS (SELECT vec_id, cid FROM
        |         (SELECT vec_id, cid,
        |                 row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        |          FROM dc) WHERE rn = 1),
        |qp AS (SELECT vec_id AS query_id, cid FROM
        |         (SELECT vec_id, cid,
        |                 row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        |          FROM dc WHERE vec_id < $QueryCount) WHERE rn <= $Nprobe),
        |d AS (SELECT a.vec_id AS query_id, b.vec_id AS cand_id, SUM(a.x * b.x) AS dot
        |      FROM u a JOIN u b ON a.i = b.i AND a.vec_id < $QueryCount
        |                       AND a.vec_id <> b.vec_id
        |      GROUP BY 1, 2),
        |cosr AS (SELECT query_id, cand_id,
        |                ${r6sql("dot / (nq.nrm * nc.nrm)")} AS cosine
        |         FROM d JOIN n nq ON nq.vec_id = query_id
        |                JOIN n nc ON nc.vec_id = cand_id),
        |probed AS (SELECT c.query_id, c.cand_id, c.cosine
        |           FROM cosr c
        |           JOIN qp ON qp.query_id = c.query_id
        |           JOIN cb ON cb.vec_id = c.cand_id AND cb.cid = qp.cid),
        |rk AS (SELECT query_id, cand_id, cosine,
        |              row_number() OVER (PARTITION BY query_id
        |                                 ORDER BY cosine DESC, cand_id) AS rn
        |       FROM probed)
        |SELECT query_id, CAST(rn AS BIGINT) AS rank, cand_id AS vec_id, cosine
        |FROM rk WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin

  /** One ann_auto regime's decision chain: the kmeansAssignChainSql
    * Lloyd rounds over a regime-transformed cell table, folded to the
    * router's decision row — within/total per-cell variance, snapped
    * EVR, integer pair surfaces, and the CASE ladder replayed verbatim
    * (brute iff C(n,2) fits the linear budget; ivf iff EVR ≥ 0.5; else
    * lsh_banded). */
  private def annAutoChainSql(tag: String, regime: String, xExpr: String,
      where: String): String =
    s"""u$tag AS MATERIALIZED (
      |  SELECT vec_id, i, $xExpr AS x
      |  FROM embeddings, UNNEST(range(len(embedding))) AS r(i) $where),
      |seed$tag AS (SELECT vec_id,
      |    CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid
      |  FROM (SELECT DISTINCT vec_id FROM u$tag ORDER BY vec_id LIMIT $KMeansK)),
      |c0$tag AS (SELECT s.cid, u.i, u.x AS c
      |  FROM u$tag u JOIN seed$tag s ON u.vec_id = s.vec_id),
      |d1$tag AS (SELECT u.vec_id, c.cid,
      |    ${r6sql("SUM((u.x - c.c) * (u.x - c.c))")} AS d2
      |  FROM u$tag u JOIN c0$tag c ON u.i = c.i GROUP BY 1, 2),
      |a1$tag AS (SELECT vec_id, cid FROM
      |  (SELECT vec_id, cid,
      |     row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
      |   FROM d1$tag) WHERE rn = 1),
      |c1$tag AS (SELECT a.cid, u.i, ${r6sql("AVG(u.x)")} AS c
      |  FROM u$tag u JOIN a1$tag a ON u.vec_id = a.vec_id GROUP BY 1, 2),
      |d2$tag AS (SELECT u.vec_id, c.cid,
      |    ${r6sql("SUM((u.x - c.c) * (u.x - c.c))")} AS d2
      |  FROM u$tag u JOIN c1$tag c ON u.i = c.i GROUP BY 1, 2),
      |w$tag AS (SELECT SUM(d2) AS w FROM
      |  (SELECT vec_id, d2,
      |     row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
      |   FROM d2$tag) WHERE rn = 1),
      |mu$tag AS (SELECT i, ${r6sql("AVG(x)")} AS m FROM u$tag GROUP BY 1),
      |t$tag AS (SELECT SUM((u.x - m.m) * (u.x - m.m)) AS t
      |  FROM u$tag u JOIN mu$tag m ON u.i = m.i),
      |n$tag AS (SELECT CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n,
      |  CAST(MAX(i) + 1 AS BIGINT) AS dim FROM u$tag),
      |dec$tag AS (SELECT '$regime' AS regime, n.n AS n_vectors,
      |  n.dim AS dim,
      |  CAST(n.n * (n.n - 1) / 2 AS BIGINT) AS uncapped_pairs,
      |  n.n * $AnnAutoBudgetPerVec AS budget_pairs,
      |  ${r6sql("w.w / CAST(n.n * n.dim AS DOUBLE)")} AS within_var,
      |  ${r6sql("t.t / CAST(n.n * n.dim AS DOUBLE)")} AS total_var,
      |  CASE WHEN t.t > 0 THEN ${r6sql("1.0 - w.w / t.t")}
      |       ELSE 0.0 END AS evr,
      |  CASE WHEN CAST(n.n * (n.n - 1) / 2 AS BIGINT)
      |            <= n.n * $AnnAutoBudgetPerVec THEN 'brute'
      |       WHEN (CASE WHEN t.t > 0 THEN ${r6sql("1.0 - w.w / t.t")}
      |             ELSE 0.0 END) >= 0.5 THEN 'ivf'
      |       ELSE 'lsh_banded' END AS kernel
      |  FROM n$tag n, w$tag w, t$tag t)""".stripMargin

  private lazy val annAutoOracle: String = {
    val blob = annAutoChainSql("B", "blob",
      "CAST(embedding[i+1] AS DOUBLE)", "")
    val clustered = annAutoChainSql("C", "clustered",
      s"CAST(embedding[i+1] AS DOUBLE) + CAST($AnnAutoOffset AS DOUBLE)" +
        s" * CAST(vec_id % $KMeansK AS DOUBLE)", "")
    val pilot = annAutoChainSql("P", "pilot",
      "CAST(embedding[i+1] AS DOUBLE)", s"WHERE vec_id < $AnnAutoPilot")
    s"""WITH $blob,
      |$clustered,
      |$pilot
      |SELECT regime, n_vectors, dim, uncapped_pairs, budget_pairs,
      |       within_var, total_var, evr, kernel
      |FROM (SELECT * FROM decB UNION ALL SELECT * FROM decC
      |      UNION ALL SELECT * FROM decP)
      |ORDER BY regime""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "ann_auto" -> annAutoOracle,
    // full- and prefix-dim cosines from the same exploded elements (the
    // prefix is i < TruncDim), each r6-snapped BEFORE the abs diff —
    // identical doubles in both engines, so every comparison agrees
    "embed_truncation_audit" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
        |u AS MATERIALIZED (SELECT vec_id, i, embedding[i+1]::DOUBLE AS v
        |      FROM e, UNNEST(range(len(embedding))) AS r(i)),
        |nf AS (SELECT vec_id, sqrt(SUM(v*v)) AS nrm FROM u GROUP BY 1),
        |nh AS (SELECT vec_id, sqrt(SUM(v*v)) AS nrm FROM u
        |       WHERE i < $TruncDim GROUP BY 1),
        |df AS (SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
        |              SUM(a.v * b.v) AS dot
        |       FROM u a JOIN u b ON a.i = b.i
        |         AND a.vec_id % $TruncQueryMod = 0 AND a.vec_id <> b.vec_id
        |       GROUP BY 1, 2),
        |dh AS (SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
        |              SUM(a.v * b.v) AS dot
        |       FROM u a JOIN u b ON a.i = b.i AND a.i < $TruncDim
        |         AND a.vec_id % $TruncQueryMod = 0 AND a.vec_id <> b.vec_id
        |       GROUP BY 1, 2),
        |dd AS (SELECT df.query_id,
        |          abs(${r6sql("df.dot / (nqf.nrm * ncf.nrm)")}
        |            - ${r6sql("CASE WHEN nqh.nrm = 0 OR nch.nrm = 0 THEN 0.0" +
                  " ELSE dh.dot / (nqh.nrm * nch.nrm) END")}) AS d
        |       FROM df JOIN dh ON dh.query_id = df.query_id
        |                      AND dh.cand_id = df.cand_id
        |       JOIN nf nqf ON nqf.vec_id = df.query_id
        |       JOIN nf ncf ON ncf.vec_id = df.cand_id
        |       JOIN nh nqh ON nqh.vec_id = df.query_id
        |       JOIN nh nch ON nch.vec_id = df.cand_id)
        |SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_cands,
        |  ${r6sql("AVG(d)")} AS mean_abs_delta,
        |  ${r6sql("MAX(d)")} AS max_abs_delta,
        |  CAST(SUM(CASE WHEN d > CAST($TruncEps AS DOUBLE) THEN 1 ELSE 0 END)
        |       AS BIGINT) AS n_moved
        |FROM dd GROUP BY 1 ORDER BY 1""".stripMargin,
    // the same greedy chain unrolled: round j's pick maximizes the
    // 1e-6-snapped min-squared-distance to picks 0..j-1 (LEAST-folded
    // exactly like the Spark side's running min), smaller id on ties
    "sample_kcenter" -> {
      val rounds = (2 until KCenterK).map { j =>
        val prior = (0 until j).map(i => s"SELECT id FROM p$i")
          .mkString(" UNION ALL ")
        s"""d$j AS (SELECT a.vec_id, SUM((a.v - b.v)*(a.v - b.v)) AS d2
           |      FROM u a JOIN u b ON a.i = b.i
           |      JOIN p${j - 1} p ON b.vec_id = p.id GROUP BY 1),
           |m$j AS (SELECT m.vec_id, LEAST(m.d2, d.d2) AS d2
           |      FROM m${j - 1} m JOIN d$j d USING (vec_id)),
           |p$j AS (SELECT vec_id AS id, ${r6sql("d2")} AS d2s FROM m$j
           |      WHERE vec_id NOT IN ($prior)
           |      ORDER BY d2s DESC, id ASC LIMIT 1)""".stripMargin
      }.mkString(",\n")
      val picks = (1 until KCenterK).map(j =>
        s"SELECT id AS vec_id, CAST($j AS BIGINT) AS rank, d2s AS d2 FROM p$j")
        .mkString("\nUNION ALL ")
      s"""WITH u AS (SELECT vec_id, i, embedding[i+1]::DOUBLE AS v
        |      FROM embeddings, UNNEST(range(len(embedding))) AS r(i)),
        |p0 AS (SELECT MIN(vec_id) AS id FROM embeddings),
        |m1 AS (SELECT a.vec_id, SUM((a.v - b.v)*(a.v - b.v)) AS d2
        |      FROM u a JOIN u b ON a.i = b.i
        |      JOIN p0 p ON b.vec_id = p.id GROUP BY 1),
        |p1 AS (SELECT vec_id AS id, ${r6sql("d2")} AS d2s FROM m1
        |      WHERE vec_id NOT IN (SELECT id FROM p0)
        |      ORDER BY d2s DESC, id ASC LIMIT 1),
        |$rounds
        |SELECT id AS vec_id, CAST(0 AS BIGINT) AS rank, 0.0 AS d2 FROM p0
        |UNION ALL $picks
        |ORDER BY rank""".stripMargin
    },
    "knn_classify" ->
      (cosSql(s"a.vec_id < $QueryCount") + s""",
        |rk AS (SELECT query_id, cand_id,
        |              row_number() OVER (PARTITION BY query_id
        |                                 ORDER BY cosine DESC, cand_id) AS rn
        |       FROM cosr),
        |votes AS (SELECT rk.query_id, CAST(l.label AS BIGINT) AS nbr_label,
        |                 CAST(COUNT(*) AS BIGINT) AS n_votes
        |          FROM rk JOIN embeddings l ON l.vec_id = rk.cand_id
        |          WHERE rn <= $KnnVoteK GROUP BY 1, 2),
        |win AS (SELECT query_id, nbr_label, n_votes,
        |               row_number() OVER (PARTITION BY query_id
        |                                  ORDER BY n_votes DESC, nbr_label) AS vr
        |        FROM votes)
        |SELECT w.query_id, CAST(q.label AS BIGINT) AS label,
        |       w.nbr_label AS predicted, w.n_votes,
        |       CAST(CASE WHEN q.label = w.nbr_label THEN 1 ELSE 0 END AS BIGINT) AS agree
        |FROM win w JOIN embeddings q ON q.vec_id = w.query_id
        |WHERE w.vr = 1 ORDER BY w.query_id""".stripMargin),
    "ann_topk_brute" ->
      (cosSql(s"a.vec_id < $QueryCount") + """,
        |rk AS (SELECT query_id, cand_id, cosine,
        |              row_number() OVER (PARTITION BY query_id
        |                                 ORDER BY cosine DESC, cand_id) AS rn
        |       FROM cosr)
        |SELECT query_id, CAST(rn AS BIGINT) AS rank, cand_id AS vec_id, cosine
        |FROM rk WHERE rn <= 10 ORDER BY query_id, rank""".stripMargin),
    "ann_ivf_topk" ->
      (cosSql(s"a.vec_id < $QueryCount") + """,
        |mx AS (SELECT vec_id, MAX(vf) AS mvf FROM u GROUP BY 1),
        |bkt AS (SELECT u.vec_id, MIN(u.i) + 1 AS bucket
        |        FROM u JOIN mx ON u.vec_id = mx.vec_id AND u.vf = mx.mvf
        |        GROUP BY u.vec_id),
        |samebkt AS (SELECT c.query_id, c.cand_id, c.cosine
        |            FROM cosr c
        |            JOIN bkt bq ON bq.vec_id = c.query_id
        |            JOIN bkt bc ON bc.vec_id = c.cand_id AND bc.bucket = bq.bucket),
        |rk AS (SELECT query_id, cand_id, cosine,
        |              row_number() OVER (PARTITION BY query_id
        |                                 ORDER BY cosine DESC, cand_id) AS rn
        |       FROM samebkt)
        |SELECT query_id, CAST(rn AS BIGINT) AS rank, cand_id AS vec_id, cosine
        |FROM rk WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin),
    "ann_lsh_topk" ->
      (cosSql(s"a.vec_id < $QueryCount") + s""",
        |hp AS (SELECT * FROM $planesSql),
        |proj AS (SELECT u.vec_id, hp.k, SUM(hp.h * u.v) AS s
        |         FROM u JOIN hp ON hp.i = u.i GROUP BY 1, 2),
        |bkt AS (SELECT vec_id,
        |               CAST(SUM(CASE WHEN s > 0 THEN 1 << k ELSE 0 END) AS BIGINT) AS bucket
        |        FROM proj GROUP BY vec_id),
        |samebkt AS (SELECT c.query_id, c.cand_id, c.cosine
        |            FROM cosr c
        |            JOIN bkt bq ON bq.vec_id = c.query_id
        |            JOIN bkt bc ON bc.vec_id = c.cand_id AND bc.bucket = bq.bucket),
        |rk AS (SELECT query_id, cand_id, cosine,
        |              row_number() OVER (PARTITION BY query_id
        |                                 ORDER BY cosine DESC, cand_id) AS rn
        |       FROM samebkt)
        |SELECT query_id, CAST(rn AS BIGINT) AS rank, cand_id AS vec_id, cosine
        |FROM rk WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin),
    // the pool is ann_topk_brute's chain cut at MmrPool; candidate-
    // candidate similarities only for same-pool co-members; then MmrK
    // unrolled greedy rounds, each a MATERIALIZED argmax (the per-round
    // CTEs are re-referenced — see the DuckDB CTE-inlining gotcha)
    "retrieval_mmr" -> mmrOracle(MmrK, MmrPool, MmrLambda),
    // ann_topk_brute's chain with the label inequality in the pair CTE
    "hard_negatives" ->
      (cosSql(s"a.vec_id < $QueryCount") + s""",
        |lb AS (SELECT vec_id, label FROM embeddings),
        |neg AS (SELECT c.query_id, c.cand_id, c.cosine
        |        FROM cosr c
        |        JOIN lb q ON q.vec_id = c.query_id
        |        JOIN lb t ON t.vec_id = c.cand_id AND t.label <> q.label),
        |rk AS (SELECT query_id, cand_id, cosine,
        |              row_number() OVER (PARTITION BY query_id
        |                                 ORDER BY cosine DESC, cand_id) AS rn
        |       FROM neg)
        |SELECT query_id, CAST(rn AS BIGINT) AS rank, cand_id AS vec_id, cosine
        |FROM rk WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin),
    // ann_topk_brute's chain + fwd/bwd rank windows; the ratio margin is
    // r6-snapped identically on both sides so the mined cut agrees
    "embed_margin_mining" ->
      (cosSql(s"a.vec_id < $QueryCount") + s""",
        |rk AS (SELECT query_id, cand_id, cosine,
        |              row_number() OVER (PARTITION BY query_id
        |                                 ORDER BY cosine DESC, cand_id) AS rf,
        |              row_number() OVER (PARTITION BY cand_id
        |                                 ORDER BY cosine DESC, query_id) AS rb
        |       FROM cosr),
        |fa AS (SELECT query_id, AVG(cosine) AS favg FROM rk
        |       WHERE rf <= $MarginK GROUP BY 1),
        |ba AS (SELECT cand_id, AVG(cosine) AS bavg FROM rk
        |       WHERE rb <= $MarginK GROUP BY 1)
        |SELECT r.query_id, r.cand_id, r.cosine,
        |  ${r6sql("r.cosine * 2.0 / (fa.favg + ba.bavg)")} AS margin,
        |  (${r6sql("r.cosine * 2.0 / (fa.favg + ba.bavg)")}
        |     >= CAST($MarginTau AS DOUBLE)) AS mined,
        |  (r.rb = 1) AS mutual
        |FROM rk r JOIN fa USING (query_id) JOIN ba USING (cand_id)
        |WHERE r.rf = 1 ORDER BY r.query_id""".stripMargin),
    // the same two chains; metrics mirror Retrieval.rankEval with the
    // SAME JVM-computed gain literals (no engine-side log anywhere)
    "retrieval_ndcg" -> {
      val gains = graft.ext.Retrieval.dcgGains(5).zipWithIndex
        .map { case (g, i) => s"(${i + 1}, $g)" }.mkString(", ")
      val idcg = graft.ext.Retrieval.idcgPrefix(5).zipWithIndex
        .map { case (s0, i) => s"(${i + 1}, $s0)" }.mkString(", ")
      cosSql(s"a.vec_id < $QueryCount") + s""",
        |rkb AS (SELECT query_id, cand_id,
        |               row_number() OVER (PARTITION BY query_id
        |                                  ORDER BY cosine DESC, cand_id) AS rn
        |        FROM cosr),
        |la AS (SELECT query_id, cand_id, rn FROM rkb WHERE rn <= 10),
        |hp AS (SELECT * FROM $planesSql),
        |proj AS (SELECT u.vec_id, hp.k, SUM(hp.h * u.v) AS s
        |         FROM u JOIN hp ON hp.i = u.i GROUP BY 1, 2),
        |bkt AS (SELECT vec_id,
        |               CAST(SUM(CASE WHEN s > 0 THEN 1 << k ELSE 0 END) AS BIGINT) AS bucket
        |        FROM proj GROUP BY vec_id),
        |samebkt AS (SELECT c.query_id, c.cand_id, c.cosine
        |            FROM cosr c
        |            JOIN bkt bq ON bq.vec_id = c.query_id
        |            JOIN bkt bc ON bc.vec_id = c.cand_id AND bc.bucket = bq.bucket),
        |rkl AS (SELECT query_id, cand_id,
        |               row_number() OVER (PARTITION BY query_id
        |                                  ORDER BY cosine DESC, cand_id) AS rn
        |        FROM samebkt),
        |lb AS (SELECT query_id, cand_id, rn FROM rkl WHERE rn <= 5),
        |g AS (SELECT * FROM (VALUES $gains) g(rnk, gain)),
        |idt AS (SELECT * FROM (VALUES $idcg) i(m, idcg)),
        |hits AS (SELECT l.query_id, l.rn,
        |                CASE WHEN t.cand_id IS NOT NULL THEN 1 ELSE 0 END AS relv,
        |                g.gain
        |         FROM lb l LEFT JOIN la t USING (query_id, cand_id)
        |         JOIN g ON g.rnk = l.rn),
        |ag AS (SELECT query_id,
        |              MIN(CASE WHEN relv = 1 THEN rn END) AS fr,
        |              SUM(CASE WHEN relv = 1 THEN gain ELSE 0.0 END) AS dcg
        |       FROM hits GROUP BY 1),
        |nr AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_rel FROM la GROUP BY 1)
        |SELECT nr.query_id, nr.n_rel,
        |       CAST(COALESCE(ag.fr, 0) AS BIGINT) AS first_rel_rank,
        |       ${r6sql("CASE WHEN ag.fr IS NULL THEN 0.0 ELSE 1.0 / ag.fr END")} AS mrr,
        |       ${r6sql("COALESCE(ag.dcg, 0.0) / idt.idcg")} AS ndcg
        |FROM nr LEFT JOIN ag USING (query_id)
        |JOIN idt ON idt.m = least(5, nr.n_rel)
        |ORDER BY query_id""".stripMargin
    },
    // both retriever chains share the cosr prefix; fusion mirrors
    // Retrieval.rrfFuse: 1/(60+rank) per list, snap, rank by (rrf, cand)
    "hybrid_rrf" ->
      (cosSql(s"a.vec_id < $QueryCount") + s""",
        |rkb AS (SELECT query_id, cand_id,
        |               row_number() OVER (PARTITION BY query_id
        |                                  ORDER BY cosine DESC, cand_id) AS rn
        |        FROM cosr),
        |la AS (SELECT query_id, cand_id, rn FROM rkb WHERE rn <= 10),
        |hp AS (SELECT * FROM $planesSql),
        |proj AS (SELECT u.vec_id, hp.k, SUM(hp.h * u.v) AS s
        |         FROM u JOIN hp ON hp.i = u.i GROUP BY 1, 2),
        |bkt AS (SELECT vec_id,
        |               CAST(SUM(CASE WHEN s > 0 THEN 1 << k ELSE 0 END) AS BIGINT) AS bucket
        |        FROM proj GROUP BY vec_id),
        |samebkt AS (SELECT c.query_id, c.cand_id, c.cosine
        |            FROM cosr c
        |            JOIN bkt bq ON bq.vec_id = c.query_id
        |            JOIN bkt bc ON bc.vec_id = c.cand_id AND bc.bucket = bq.bucket),
        |rkl AS (SELECT query_id, cand_id,
        |               row_number() OVER (PARTITION BY query_id
        |                                  ORDER BY cosine DESC, cand_id) AS rn
        |        FROM samebkt),
        |lb AS (SELECT query_id, cand_id, rn FROM rkl WHERE rn <= 5),
        |f AS (SELECT COALESCE(la.query_id, lb.query_id) AS query_id,
        |             COALESCE(la.cand_id, lb.cand_id) AS cand_id,
        |             floor((COALESCE(1.0/(60 + la.rn), 0.0)
        |                    + COALESCE(1.0/(60 + lb.rn), 0.0))*1e6 + 0.50001)/1e6 AS rrf
        |      FROM la FULL OUTER JOIN lb
        |        ON la.query_id = lb.query_id AND la.cand_id = lb.cand_id),
        |fr AS (SELECT query_id, cand_id, rrf,
        |              row_number() OVER (PARTITION BY query_id
        |                                 ORDER BY rrf DESC, cand_id) AS rn
        |       FROM f)
        |SELECT query_id, CAST(rn AS BIGINT) AS rank, cand_id, rrf
        |FROM fr WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin),
    "ann_lsh_multiprobe" ->
      (cosSql(s"a.vec_id < $QueryCount") + s""",
        |hp AS (SELECT * FROM $planesSql),
        |proj AS (SELECT u.vec_id, hp.k, SUM(hp.h * u.v) AS s
        |         FROM u JOIN hp ON hp.i = u.i GROUP BY 1, 2),
        |bkt AS (SELECT vec_id,
        |               CAST(SUM(CASE WHEN s > 0 THEN 1 << k ELSE 0 END) AS BIGINT) AS bucket
        |        FROM proj GROUP BY vec_id),
        |mk AS (SELECT * FROM $lshProbeMasksSql),
        |probed AS (SELECT c.query_id, c.cand_id, c.cosine
        |           FROM cosr c
        |           JOIN bkt bq ON bq.vec_id = c.query_id
        |           JOIN bkt bc ON bc.vec_id = c.cand_id
        |           JOIN mk ON bc.bucket = xor(bq.bucket, CAST(mk.mask AS BIGINT))),
        |rk AS (SELECT query_id, cand_id, cosine,
        |              row_number() OVER (PARTITION BY query_id
        |                                 ORDER BY cosine DESC, cand_id) AS rn
        |       FROM probed)
        |SELECT query_id, CAST(rn AS BIGINT) AS rank, cand_id AS vec_id, cosine
        |FROM rk WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin),
    // 2 unrolled Lloyd rounds mirroring Embeddings.kMeansAssign: snapped
    // squared distances + snapped centroid means, argmin tiebreak by cid
    "embed_kmeans" ->
      s"""$kmeansAssignChainSql
        |SELECT vec_id, CAST(cid AS BIGINT) AS cluster, d2 AS dist2
        |FROM a2 WHERE rn = 1 ORDER BY vec_id""".stripMargin,
    // same assignment chain folded to per-list occupancy; the totals
    // cross back from the 1-row frame
    "ann_ivf_balance" ->
      s"""$kmeansAssignChainSql,
        |cnt AS (SELECT CAST(cid AS BIGINT) AS cluster, CAST(COUNT(*) AS BIGINT) AS n
        |        FROM a2 WHERE rn = 1 GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t, CAST(COUNT(*) AS BIGINT) AS kk
        |        FROM cnt)
        |SELECT cluster, n,
        |       ${r6sql("n / CAST(t AS DOUBLE)")} AS share,
        |       ${r6sql("CAST(n * kk AS BIGINT) / CAST(t AS DOUBLE)")} AS load_factor
        |FROM cnt, tot ORDER BY cluster""".stripMargin,
    // the same 2 unrolled rounds on the unit sphere: exact-division unit
    // components, snapped dots with (d DESC, cid) argmax, re-normalized
    // snapped mean-direction updates
    "embed_kmeans_spherical" ->
      s"""WITH u0 AS (SELECT vec_id, i, CAST(embedding[i+1] AS DOUBLE) AS x
        |           FROM embeddings, UNNEST(range(len(embedding))) AS r(i)),
        |n AS (SELECT vec_id, sqrt(SUM(x*x)) AS nrm FROM u0 GROUP BY 1
        |      HAVING sqrt(SUM(x*x)) > 0),
        |u AS MATERIALIZED (SELECT u0.vec_id, u0.i, u0.x / n.nrm AS x
        |      FROM u0 JOIN n USING (vec_id)),
        |seed AS (SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid
        |         FROM (SELECT vec_id FROM n ORDER BY vec_id LIMIT $KMeansK)),
        |c0 AS (SELECT s.cid, u.i, u.x AS c FROM u JOIN seed s ON u.vec_id = s.vec_id),
        |d1 AS (SELECT u.vec_id, c.cid, ${r6sql("SUM(u.x * c.c)")} AS d
        |       FROM u JOIN c0 c ON u.i = c.i GROUP BY 1, 2),
        |a1 AS (SELECT vec_id, cid FROM
        |         (SELECT vec_id, cid,
        |                 row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid) AS rn
        |          FROM d1) WHERE rn = 1),
        |m1 AS (SELECT a.cid, u.i, AVG(u.x) AS m
        |       FROM u JOIN a1 a ON u.vec_id = a.vec_id GROUP BY 1, 2),
        |cn1 AS (SELECT cid, sqrt(SUM(m*m)) AS cn FROM m1 GROUP BY 1
        |        HAVING sqrt(SUM(m*m)) > 0),
        |c1 AS (SELECT m1.cid, m1.i, ${r6sql("m1.m / cn1.cn")} AS c
        |       FROM m1 JOIN cn1 USING (cid)),
        |d2 AS (SELECT u.vec_id, c.cid, ${r6sql("SUM(u.x * c.c)")} AS d
        |       FROM u JOIN c1 c ON u.i = c.i GROUP BY 1, 2),
        |a2 AS (SELECT vec_id, cid, d,
        |              row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid) AS rn
        |       FROM d2)
        |SELECT vec_id, CAST(cid AS BIGINT) AS cluster, d AS cosine
        |FROM a2 WHERE rn = 1 ORDER BY vec_id""".stripMargin,
    // the same 2-round chain's FINAL distance table, pivoted to the
    // argmin (a) and runner-up (b) rows, the identical s spelling, and
    // the per-cluster mean — Embeddings.silhouette
    "embed_silhouette" ->
      s"""WITH u AS (SELECT vec_id, i, CAST(embedding[i+1] AS DOUBLE) AS x
        |           FROM embeddings, UNNEST(range(len(embedding))) AS r(i)),
        |seed AS (SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid
        |         FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT $KMeansK)),
        |c0 AS (SELECT s.cid, u.i, u.x AS c FROM u JOIN seed s ON u.vec_id = s.vec_id),
        |d1 AS (SELECT u.vec_id, c.cid,
        |              ${r6sql("SUM((u.x - c.c) * (u.x - c.c))")} AS d2
        |       FROM u JOIN c0 c ON u.i = c.i GROUP BY 1, 2),
        |a1 AS (SELECT vec_id, cid FROM
        |         (SELECT vec_id, cid,
        |                 row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        |          FROM d1) WHERE rn = 1),
        |c1 AS (SELECT a.cid, u.i, ${r6sql("AVG(u.x)")} AS c
        |       FROM u JOIN a1 a ON u.vec_id = a.vec_id GROUP BY 1, 2),
        |d2t AS (SELECT u.vec_id, c.cid,
        |               ${r6sql("SUM((u.x - c.c) * (u.x - c.c))")} AS d2
        |        FROM u JOIN c1 c ON u.i = c.i GROUP BY 1, 2),
        |rk AS (SELECT vec_id, cid, d2,
        |              row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        |       FROM d2t),
        |ab AS (SELECT vec_id,
        |         MIN(CASE WHEN rn = 1 THEN cid END) AS cluster,
        |         MIN(CASE WHEN rn = 1 THEN d2 END) AS a2,
        |         MIN(CASE WHEN rn = 2 THEN d2 END) AS b2
        |       FROM rk WHERE rn <= 2 GROUP BY vec_id),
        |sv AS (SELECT cluster,
        |         CASE WHEN b2 IS NULL THEN 0.0
        |              WHEN greatest(sqrt(a2), sqrt(b2)) > 0
        |              THEN (sqrt(b2) - sqrt(a2)) / greatest(sqrt(a2), sqrt(b2))
        |              ELSE 0.0 END AS s
        |       FROM ab)
        |SELECT CAST(cluster AS BIGINT) AS cluster,
        |  CAST(COUNT(*) AS BIGINT) AS n_points,
        |  ${r6sql("AVG(s)")} AS mean_silhouette
        |FROM sv GROUP BY 1 ORDER BY 1""".stripMargin,
    // trained-IVF search mirroring Embeddings.ivfKMeansTopK: the embed_kmeans
    // chain + final centroid update (c2), nearest-centroid inverted lists
    // (cb), nprobe-nearest query probes (qp), cosine rank within probed lists
    "ann_ivf_kmeans" -> ivfKMeansOracle,
    // the same trained-IVF chain, qp keeping the probe RANK, fanned out
    // over the nprobe grid; truth = the brute cosr ranking; exact counts
    "ann_pareto" ->
      s"""WITH u AS (SELECT vec_id, i, CAST(embedding[i+1] AS DOUBLE) AS x
        |           FROM embeddings, UNNEST(range(len(embedding))) AS r(i)),
        |n AS (SELECT vec_id, sqrt(SUM(x*x)) AS nrm FROM u GROUP BY 1),
        |seed AS (SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid
        |         FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT $KMeansK)),
        |c0 AS (SELECT s.cid, u.i, u.x AS c FROM u JOIN seed s ON u.vec_id = s.vec_id),
        |d1 AS (SELECT u.vec_id, c.cid,
        |              ${r6sql("SUM((u.x - c.c) * (u.x - c.c))")} AS d2
        |       FROM u JOIN c0 c ON u.i = c.i GROUP BY 1, 2),
        |a1 AS (SELECT vec_id, cid FROM
        |         (SELECT vec_id, cid,
        |                 row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        |          FROM d1) WHERE rn = 1),
        |c1 AS (SELECT a.cid, u.i, ${r6sql("AVG(u.x)")} AS c
        |       FROM u JOIN a1 a ON u.vec_id = a.vec_id GROUP BY 1, 2),
        |d2t AS (SELECT u.vec_id, c.cid,
        |               ${r6sql("SUM((u.x - c.c) * (u.x - c.c))")} AS d2
        |        FROM u JOIN c1 c ON u.i = c.i GROUP BY 1, 2),
        |a2 AS (SELECT vec_id, cid FROM
        |         (SELECT vec_id, cid,
        |                 row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        |          FROM d2t) WHERE rn = 1),
        |c2 AS (SELECT a.cid, u.i, ${r6sql("AVG(u.x)")} AS c
        |       FROM u JOIN a2 a ON u.vec_id = a.vec_id GROUP BY 1, 2),
        |dc AS MATERIALIZED (SELECT u.vec_id, c.cid,
        |              ${r6sql("SUM((u.x - c.c) * (u.x - c.c))")} AS d2
        |       FROM u JOIN c2 c ON u.i = c.i GROUP BY 1, 2),
        |cb AS (SELECT vec_id, cid FROM
        |         (SELECT vec_id, cid,
        |                 row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        |          FROM dc) WHERE rn = 1),
        |qp AS (SELECT vec_id AS query_id, cid, CAST(rn AS BIGINT) AS pr FROM
        |         (SELECT vec_id, cid,
        |                 row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        |          FROM dc WHERE vec_id < $QueryCount) WHERE rn <= $MaxNprobe),
        |d AS (SELECT a.vec_id AS query_id, b.vec_id AS cand_id, SUM(a.x * b.x) AS dot
        |      FROM u a JOIN u b ON a.i = b.i AND a.vec_id < $QueryCount
        |                       AND a.vec_id <> b.vec_id
        |      GROUP BY 1, 2),
        |cosr AS MATERIALIZED (SELECT query_id, cand_id,
        |                ${r6sql("dot / (nq.nrm * nc.nrm)")} AS cosine
        |         FROM d JOIN n nq ON nq.vec_id = query_id
        |                JOIN n nc ON nc.vec_id = cand_id),
        |probed AS (SELECT c.query_id, c.cand_id, c.cosine, qp.pr
        |           FROM cosr c
        |           JOIN qp ON qp.query_id = c.query_id
        |           JOIN cb ON cb.vec_id = c.cand_id AND cb.cid = qp.cid),
        |npt AS (SELECT CAST(i + 1 AS BIGINT) AS np
        |        FROM (SELECT UNNEST(range($MaxNprobe)) AS i)),
        |ex AS MATERIALIZED (SELECT npt.np, p.query_id, p.cand_id, p.cosine
        |      FROM probed p JOIN npt ON p.pr <= npt.np),
        |rk AS (SELECT np, query_id, cand_id,
        |              row_number() OVER (PARTITION BY np, query_id
        |                                 ORDER BY cosine DESC, cand_id) AS rn
        |       FROM ex),
        |tru AS (SELECT query_id, cand_id FROM
        |          (SELECT query_id, cand_id,
        |                  row_number() OVER (PARTITION BY query_id
        |                                     ORDER BY cosine DESC, cand_id) AS rn
        |           FROM cosr) WHERE rn <= 5),
        |hits AS (SELECT np, CAST(COUNT(*) AS BIGINT) AS n_hits
        |         FROM (SELECT np, query_id, cand_id FROM rk WHERE rn <= 5) a
        |         JOIN tru USING (query_id, cand_id) GROUP BY 1),
        |cnds AS (SELECT np, CAST(COUNT(*) AS BIGINT) AS n_candidates
        |         FROM ex GROUP BY 1),
        |qs AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_queries
        |       FROM embeddings WHERE vec_id < $QueryCount)
        |SELECT npt.np AS nprobe, qs.n_queries,
        |  CAST(COALESCE(cnds.n_candidates, 0) AS BIGINT) AS n_candidates,
        |  CAST(COALESCE(hits.n_hits, 0) AS BIGINT) AS n_hits,
        |  ${r6sql("CASE WHEN qs.n_queries > 0 THEN " +
           "CAST(COALESCE(cnds.n_candidates, 0) AS DOUBLE) / CAST(qs.n_queries AS DOUBLE) " +
           "ELSE 0.0 END")} AS avg_candidates,
        |  ${r6sql("CASE WHEN qs.n_queries > 0 THEN " +
           "CAST(COALESCE(hits.n_hits, 0) AS DOUBLE) / CAST(5 * qs.n_queries AS DOUBLE) " +
           "ELSE 0.0 END")} AS avg_recall
        |FROM npt LEFT JOIN cnds USING (np) LEFT JOIN hits USING (np) CROSS JOIN qs
        |ORDER BY nprobe""".stripMargin,
    // identical by construction: the persisted index must return exactly
    // what the in-plan trained-IVF search returns
    "ann_ivf_persist" -> ivfKMeansOracle,
    // recall@5: truth = brute top-5 from cosr; approx = the multiprobe
    // chain verbatim; score = per-query hit fraction over the truth set
    "ann_recall" ->
      (cosSql(s"a.vec_id < $QueryCount") + s""",
        |truth AS (SELECT query_id, cand_id FROM (
        |    SELECT query_id, cand_id,
        |           row_number() OVER (PARTITION BY query_id
        |                              ORDER BY cosine DESC, cand_id) AS rn
        |    FROM cosr) WHERE rn <= 5),
        |hp AS (SELECT * FROM $planesSql),
        |proj AS (SELECT u.vec_id, hp.k, SUM(hp.h * u.v) AS s
        |         FROM u JOIN hp ON hp.i = u.i GROUP BY 1, 2),
        |bkt AS (SELECT vec_id,
        |               CAST(SUM(CASE WHEN s > 0 THEN 1 << k ELSE 0 END) AS BIGINT) AS bucket
        |        FROM proj GROUP BY vec_id),
        |mk AS (SELECT * FROM $lshProbeMasksSql),
        |probed AS (SELECT c.query_id, c.cand_id, c.cosine
        |           FROM cosr c
        |           JOIN bkt bq ON bq.vec_id = c.query_id
        |           JOIN bkt bc ON bc.vec_id = c.cand_id
        |           JOIN mk ON bc.bucket = xor(bq.bucket, CAST(mk.mask AS BIGINT))),
        |approx AS (SELECT query_id, cand_id FROM (
        |    SELECT query_id, cand_id,
        |           row_number() OVER (PARTITION BY query_id
        |                              ORDER BY cosine DESC, cand_id) AS rn
        |    FROM probed) WHERE rn <= 5)
        |SELECT t.query_id, COUNT(*) AS k, COUNT(a.cand_id) AS hits,
        |       ${r6sql("COUNT(a.cand_id) / CAST(COUNT(*) AS DOUBLE)")} AS recall
        |FROM truth t LEFT JOIN approx a
        |  ON a.query_id = t.query_id AND a.cand_id = t.cand_id
        |GROUP BY t.query_id ORDER BY t.query_id""".stripMargin),
    // 64→16 signed random projection: identical integer plane table,
    // /sqrt(64) = *0.125 is exact in both engines
    "embed_project" ->
      s"""WITH u AS (SELECT vec_id, i, CAST(embedding[i+1] AS DOUBLE) AS x
        |           FROM embeddings, UNNEST(range(len(embedding))) AS r(i)),
        |hp AS (SELECT * FROM ${projPlanesSql(ProjDim, EmbDim)})
        |SELECT u.vec_id, CAST(hp.j AS INTEGER) AS j,
        |       ${r6sql("SUM(hp.h * u.x) / sqrt(64.0)")} AS value
        |FROM u JOIN hp ON hp.i = u.i
        |GROUP BY u.vec_id, hp.j ORDER BY u.vec_id, j""".stripMargin,
    // covariance mirror: unnest self-join on vec_id over the upper
    // triangle, population normalization, same snap
    "embed_covariance" ->
      s"""WITH u AS (SELECT vec_id, i, CAST(embedding[i+1] AS DOUBLE) AS x
        |           FROM embeddings, UNNEST(range(len(embedding))) AS r(i)),
        |m AS (SELECT i, AVG(x) AS m, CAST(COUNT(*) AS BIGINT) AS n FROM u GROUP BY i),
        |p AS (SELECT a.i AS i, b.i AS j, SUM(a.x * b.x) AS sp
        |      FROM u a JOIN u b ON a.vec_id = b.vec_id AND b.i >= a.i
        |      GROUP BY 1, 2)
        |SELECT CAST(p.i AS BIGINT) AS i, CAST(p.j AS BIGINT) AS j,
        |       ${r6sql("sp / mi.n - mi.m * mj.m")} AS cov
        |FROM p JOIN m mi ON mi.i = p.i JOIN m mj ON mj.i = p.j
        |ORDER BY i, j""".stripMargin,
    // SQ8: comparison-only min/max, then one fixed sequence of
    // exactly-rounded IEEE ops — bit-identical in any engine
    "embed_quantize" ->
      """WITH u AS (SELECT vec_id, i, CAST(embedding[i+1] AS DOUBLE) AS x
        |           FROM embeddings, UNNEST(range(len(embedding))) AS r(i)),
        |rg AS (SELECT i, MIN(x) AS lo, MAX(x) AS hi FROM u GROUP BY i)
        |SELECT u.vec_id, CAST(u.i AS INTEGER) AS i,
        |       CASE WHEN rg.hi = rg.lo THEN CAST(0 AS BIGINT)
        |            ELSE CAST(floor((u.x - rg.lo) / (rg.hi - rg.lo) * 255.0 + 0.5) AS BIGINT)
        |                 - 128 END AS q,
        |       floor((rg.lo)*1e6 + 0.50001)/1e6 AS lo,
        |       floor((rg.hi)*1e6 + 0.50001)/1e6 AS hi
        |FROM u JOIN rg USING (i)
        |ORDER BY vec_id, i""".stripMargin,
    // product quantization: the embed_kmeans 2-round unrolled chain with
    // the subspace id (i // subDim) riding through every key — the
    // dimension index scopes each centroid component to its subspace
    "embed_pq" ->
      s"""WITH u AS (SELECT vec_id, i, (i // $PqSubDim) AS s,
        |                  CAST(embedding[i+1] AS DOUBLE) AS x
        |           FROM embeddings, UNNEST(range(len(embedding))) AS r(i)),
        |seed AS (SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid
        |         FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT $PqK)),
        |c0 AS (SELECT sd.cid, u.i, u.x AS c FROM u JOIN seed sd ON u.vec_id = sd.vec_id),
        |d1 AS (SELECT u.vec_id, u.s, c.cid,
        |              ${r6sql("SUM((u.x - c.c) * (u.x - c.c))")} AS d2
        |       FROM u JOIN c0 c ON u.i = c.i GROUP BY 1, 2, 3),
        |a1 AS (SELECT vec_id, s, cid FROM
        |         (SELECT vec_id, s, cid,
        |                 row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, cid) AS rn
        |          FROM d1) WHERE rn = 1),
        |c1 AS (SELECT a.cid, u.i, ${r6sql("AVG(u.x)")} AS c
        |       FROM u JOIN a1 a ON u.vec_id = a.vec_id AND u.s = a.s GROUP BY 1, 2),
        |d2t AS (SELECT u.vec_id, u.s, c.cid,
        |               ${r6sql("SUM((u.x - c.c) * (u.x - c.c))")} AS d2
        |        FROM u JOIN c1 c ON u.i = c.i GROUP BY 1, 2, 3),
        |a2 AS (SELECT vec_id, s, cid, d2,
        |              row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, cid) AS rn
        |       FROM d2t)
        |SELECT vec_id, s, CAST(cid AS BIGINT) AS code, d2 AS dist2
        |FROM a2 WHERE rn = 1 ORDER BY vec_id, s""".stripMargin,
    // ADC search: the embed_pq chain, then each query's distance table
    // against the final codebook (c1) and a codes-only candidate scan
    "ann_pq_adc" ->
      s"""WITH u AS (SELECT vec_id, i, (i // $PqSubDim) AS s,
        |                  CAST(embedding[i+1] AS DOUBLE) AS x
        |           FROM embeddings, UNNEST(range(len(embedding))) AS r(i)),
        |seed AS (SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid
        |         FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT $PqK)),
        |c0 AS (SELECT sd.cid, u.i, u.x AS c FROM u JOIN seed sd ON u.vec_id = sd.vec_id),
        |d1 AS (SELECT u.vec_id, u.s, c.cid,
        |              ${r6sql("SUM((u.x - c.c) * (u.x - c.c))")} AS d2
        |       FROM u JOIN c0 c ON u.i = c.i GROUP BY 1, 2, 3),
        |a1 AS (SELECT vec_id, s, cid FROM
        |         (SELECT vec_id, s, cid,
        |                 row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, cid) AS rn
        |          FROM d1) WHERE rn = 1),
        |c1 AS (SELECT a.cid, u.i, ${r6sql("AVG(u.x)")} AS c
        |       FROM u JOIN a1 a ON u.vec_id = a.vec_id AND u.s = a.s GROUP BY 1, 2),
        |d2t AS (SELECT u.vec_id, u.s, c.cid,
        |               ${r6sql("SUM((u.x - c.c) * (u.x - c.c))")} AS d2
        |        FROM u JOIN c1 c ON u.i = c.i GROUP BY 1, 2, 3),
        |codes AS (SELECT vec_id, s, cid FROM
        |            (SELECT vec_id, s, cid,
        |                    row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, cid) AS rn
        |             FROM d2t) WHERE rn = 1),
        |qd AS (SELECT vec_id AS query_id, s, cid, d2 AS qd2
        |       FROM d2t WHERE vec_id < $QueryCount),
        |sc AS (SELECT qd.query_id, codes.vec_id, ${r6sql("SUM(qd.qd2)")} AS adist
        |       FROM codes JOIN qd ON qd.s = codes.s AND qd.cid = codes.cid
        |       WHERE qd.query_id <> codes.vec_id
        |       GROUP BY 1, 2),
        |rk AS (SELECT query_id, vec_id, adist,
        |              row_number() OVER (PARTITION BY query_id
        |                                 ORDER BY adist, vec_id) AS rn
        |       FROM sc)
        |SELECT query_id, CAST(rn AS BIGINT) AS rank, vec_id, adist
        |FROM rk WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin,
    // per-label mean centroid: same unnest chain, AVG snapped like the
    // Spark side's snapCol(avg) — range() yields BIGINT so i is cast back
    "embed_centroids" ->
      s"""WITH u AS (SELECT vec_id, label, i, CAST(embedding[i+1] AS DOUBLE) AS x
        |           FROM embeddings, UNNEST(range(len(embedding))) AS r(i))
        |SELECT label AS grp, CAST(i AS INTEGER) AS i,
        |       CAST(COUNT(*) AS BIGINT) AS n_vecs,
        |       ${r6sql("AVG(x)")} AS c
        |FROM u GROUP BY label, i ORDER BY grp, i""".stripMargin,
    // drift mirror: two parity-filtered snapped-centroid CTEs, (grp, i)
    // join, per-label cosine/L2 on the snapped values
    "embedding_drift" ->
      s"""WITH u AS (SELECT vec_id, label, i, CAST(embedding[i+1] AS DOUBLE) AS x
        |           FROM embeddings, UNNEST(range(len(embedding))) AS r(i)),
        |ca AS (SELECT label AS grp, i, CAST(COUNT(*) AS BIGINT) AS n_a,
        |              ${r6sql("AVG(x)")} AS va
        |       FROM u WHERE vec_id % 2 = 0 GROUP BY 1, 2),
        |cb AS (SELECT label AS grp, i, CAST(COUNT(*) AS BIGINT) AS n_b,
        |              ${r6sql("AVG(x)")} AS vb
        |       FROM u WHERE vec_id % 2 = 1 GROUP BY 1, 2),
        |j AS (SELECT ca.grp, ca.n_a, cb.n_b, ca.va, cb.vb
        |      FROM ca JOIN cb ON cb.grp = ca.grp AND cb.i = ca.i)
        |SELECT grp, MAX(n_a) AS n_a, MAX(n_b) AS n_b,
        |       ${r6sql("CASE WHEN SUM(va*va) = 0 OR SUM(vb*vb) = 0 THEN 0.0 " +
          "ELSE SUM(va*vb) / (sqrt(SUM(va*va)) * sqrt(SUM(vb*vb))) END")} AS cosine,
        |       ${r6sql("SUM((va - vb) * (va - vb))")} AS l2sq
        |FROM j GROUP BY grp ORDER BY grp""".stripMargin,
    // nearest-class-mean: snapped centroids -> snapped d2 -> argmin with
    // (d2, grp) tie-break, mirroring prototypeAssign's window
    "embed_prototype" ->
      s"""WITH u AS (SELECT vec_id, label, i, CAST(embedding[i+1] AS DOUBLE) AS x
        |           FROM embeddings, UNNEST(range(len(embedding))) AS r(i)),
        |c AS (SELECT label AS cgrp, i, ${r6sql("AVG(x)")} AS c
        |      FROM u GROUP BY 1, 2),
        |d AS (SELECT u.vec_id, c.cgrp,
        |             ${r6sql("SUM((u.x - c.c) * (u.x - c.c))")} AS d2
        |      FROM u JOIN c ON u.i = c.i GROUP BY 1, 2),
        |b AS (SELECT vec_id, cgrp, d2,
        |             row_number() OVER (PARTITION BY vec_id ORDER BY d2, cgrp) AS rn
        |      FROM d)
        |SELECT e.vec_id, e.label AS grp, b.cgrp AS pred, b.d2
        |FROM embeddings e JOIN b ON b.vec_id = e.vec_id AND b.rn = 1
        |ORDER BY e.vec_id""".stripMargin,
    // cohesion = mean snapped own-centroid d2; separation = min snapped
    // inter-centroid d2 — same snap points as the Spark side
    "embed_label_coherence" ->
      s"""WITH u AS (SELECT vec_id, label, i, CAST(embedding[i+1] AS DOUBLE) AS x
        |           FROM embeddings, UNNEST(range(len(embedding))) AS r(i)),
        |c AS (SELECT label AS grp, i, ${r6sql("AVG(x)")} AS c
        |      FROM u GROUP BY 1, 2),
        |d AS (SELECT u.vec_id, u.label AS grp,
        |             ${r6sql("SUM((u.x - c.c) * (u.x - c.c))")} AS d2
        |      FROM u JOIN c ON u.i = c.i AND u.label = c.grp GROUP BY 1, 2),
        |coh AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_vecs,
        |               AVG(d2) AS mean_d2 FROM d GROUP BY 1),
        |cd AS (SELECT a.grp AS grp, b.grp AS ogrp,
        |              ${r6sql("SUM((a.c - b.c) * (a.c - b.c))")} AS cd2
        |       FROM c a JOIN c b ON a.i = b.i AND a.grp <> b.grp GROUP BY 1, 2),
        |sep AS (SELECT grp, MIN(cd2) AS min_other_d2 FROM cd GROUP BY 1)
        |SELECT grp, n_vecs, ${r6sql("mean_d2")} AS mean_d2, min_other_d2
        |FROM coh JOIN sep USING (grp) ORDER BY grp""".stripMargin,
    // z over SNAPPED d2, with mean and variance snapped at the same
    // points as the Spark side (explicit two-pass variance, no stddev)
    "embed_outliers" ->
      s"""WITH u AS (SELECT vec_id, label, i, CAST(embedding[i+1] AS DOUBLE) AS x
        |           FROM embeddings, UNNEST(range(len(embedding))) AS r(i)),
        |c AS (SELECT label AS grp, i, ${r6sql("AVG(x)")} AS c
        |      FROM u GROUP BY 1, 2),
        |d AS (SELECT u.vec_id, u.label AS grp,
        |             ${r6sql("SUM((u.x - c.c) * (u.x - c.c))")} AS d2
        |      FROM u JOIN c ON u.i = c.i AND u.label = c.grp GROUP BY 1, 2),
        |m AS (SELECT grp, ${r6sql("AVG(d2)")} AS mean_d2 FROM d GROUP BY 1),
        |v AS (SELECT d.grp,
        |             ${r6sql("AVG((d.d2 - m.mean_d2) * (d.d2 - m.mean_d2))")} AS var_d2
        |      FROM d JOIN m USING (grp) GROUP BY 1)
        |SELECT d.vec_id, d.grp, d.d2,
        |       CASE WHEN v.var_d2 > 0
        |            THEN ${r6sql("(d.d2 - m.mean_d2) / sqrt(v.var_d2)")}
        |            ELSE 0.0 END AS z
        |FROM d JOIN m USING (grp) JOIN v ON v.grp = d.grp
        |ORDER BY d.vec_id""".stripMargin
  )
}
