package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Document deduplication for training-data pipelines: exact duplicates,
 * n-gram (shingle) Jaccard, MinHash-LSH candidate generation, and SimHash.
 *
 * Scale design (the whole point of these operators at 100 TB):
 *   - Nothing here ever materializes all C(N,2) document pairs. Pair
 *     generation always goes through an equi-join on a bounded key — a
 *     shared shingle hash ([[jaccardPairs]]), a shared (band, minhash)
 *     bucket ([[minHashCandidates]]) — so the shuffle key distributes and
 *     AQE can split residual skew.
 *   - Shingle/minhash/simhash arithmetic is exact int64 SQL built from
 *     [[TextHash]] primitives: portable across engines (DuckDB oracle
 *     checks it exactly) and whole-stage-codegen'd in Spark (no UDFs).
 *   - Per-document state (signatures, sketches) is one aggregate over the
 *     shingle table: map-side partial aggregation applies throughout.
 */
object Dedup {

  import TextHash.M

  /**
   * Exact-duplicate grouping: every doc mapped to the smallest doc id with
   * byte-identical text. Singletons map to themselves. (At scale, group on
   * sha2(text) first so the shuffle key is fixed-width; the final compare
   * stays on the full text to be collision-proof.)
   */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      min(col(idCol)).over(Window.partitionBy(col(textCol))).as("rep_id"))

  /**
   * Distinct word-trigram shingles per document, as int64 hashes. Built
   * with window `lead` over token positions so adjacency follows the
   * cleaned token sequence; the per-document window is cheap because a
   * document's tokens always fit one partition.
   */
  def shingles(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = TextAnalysis.tokensWithPosition(docs, idCol, textCol)
      .withColumn("tv", expr(TextHash.tokenValue("token")))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    tok
      .withColumn("tv2", lead("tv", 1).over(w))
      .withColumn("tv3", lead("tv", 2).over(w))
      .where(col("tv3").isNotNull)
      .select(col("doc_id"), expr(TextHash.shingleHash("tv", "tv2", "tv3")).as("sh"))
      .distinct()
  }

  /**
   * Exact pairwise shingle-Jaccard for every pair sharing at least one
   * shingle — the verification kernel for every near-dup method here.
   * The self-equi-join on `sh` is the scale-safe pair generator: output
   * is bounded by Σ_shingle C(docs_with_shingle, 2), not C(N,2).
   */
  def jaccardPairs(sh: DataFrame): DataFrame = {
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val a = sh.as("a")
    val b = sh.as("b")
    val inter = a
      .join(b, col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc0"), col("b.doc_id").as("doc1"))
      .agg(count(lit(1)).as("i"))
    inter
      .join(counts.withColumnRenamed("doc_id", "doc0").withColumnRenamed("n", "n0"), "doc0")
      .join(counts.withColumnRenamed("doc_id", "doc1").withColumnRenamed("n", "n1"), "doc1")
      .withColumn("jaccard", col("i").cast("double") / (col("n0") + col("n1") - col("i")))
      .select("doc0", "doc1", "jaccard")
  }

  /** Near-duplicate pairs by exact n-gram Jaccard at `minJaccard`. */
  def ngramJaccardDups(docs: DataFrame, idCol: String, textCol: String,
      minJaccard: Double = 0.2): DataFrame =
    jaccardPairs(shingles(docs, idCol, textCol)).where(col("jaccard") >= minJaccard)

  /**
   * Fixed MinHash parameters: 16 universal-hash functions (a·x + b) mod M.
   * Constants are part of the operator contract (the oracle mirrors them).
   */
  val HashParams: Seq[(Long, Long)] = Seq(
    (1000003L, 12345L), (1000033L, 54321L), (1000037L, 98765L), (1000039L, 13579L),
    (1000081L, 24680L), (1000099L, 11111L), (1000117L, 22222L), (1000121L, 33333L),
    (1000133L, 44444L), (1000151L, 55555L), (1000159L, 66666L), (1000171L, 77777L),
    (1000183L, 88888L), (1000187L, 99999L), (1000193L, 10101L), (1000199L, 20202L))

  /** Per-document MinHash signature: one column sig_j per hash function. */
  def minHashSignatures(sh: DataFrame): DataFrame = {
    val aggs = HashParams.zipWithIndex.map { case ((a, b), j) =>
      min(expr(s"($a * sh + $b) % $M")).as(s"sig_$j")
    }
    sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** Rows per LSH band: 16 minhashes → 8 bands × 2 rows. */
  val BandRows = 2

  /** SQL text combining band `b`'s minhashes into one int64 key
    * (shared verbatim with the DuckDB oracle). */
  def bandKeyExpr(b: Int): String =
    (0 until BandRows)
      .map(r => s"sig_${b * BandRows + r}")
      .reduce((acc, s) => s"(($acc * 31 + $s) % $M)")

  /**
   * LSH candidate pairs: docs agreeing on ALL minhash values of some
   * band (8 bands × 2 rows). The join key is (band, combined band hash),
   * so candidate generation is an equi-join, never an all-pairs scan.
   *
   * Band width matters at scale: 1-row bands collide whenever ONE minhash
   * agrees, and the minhash of a corpus-common shingle agrees across
   * thousands of documents — C(n,2) pairs from a single bucket (measured:
   * 5× the whole pipeline's cost at sf0.1). 2-row bands need two
   * simultaneous agreements, so buckets stay near-singleton for unrelated
   * docs (P = j² per band) while near-dups collide with
   * P = 1-(1-j²)⁸ (≈ 0.83 at j = 0.45, ≈ 1 at j ≥ 0.8).
   * Mass-duplicate corpora should run [[exact]] first — identical docs
   * always share every bucket.
   */
  def minHashCandidates(sigs: DataFrame): DataFrame = {
    val nBands = HashParams.size / BandRows
    val bandKeys = (0 until nBands).map(b => expr(bandKeyExpr(b)).as(s"band_$b"))
    val bands = sigs.select(col("doc_id") +: bandKeys: _*)
      .select(col("doc_id"),
        posexplode(array((0 until nBands).map(b => col(s"band_$b")): _*))
          .as(Seq("band", "bkey")))
    val a = bands.as("a")
    val b = bands.as("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc0"), col("b.doc_id").as("doc1"))
      .distinct()
  }

  /**
   * MinHash-LSH near-dup detection end to end: LSH candidates, verified by
   * exact shingle Jaccard ≥ `minJaccard`. Only candidate pairs are ever
   * verified — the all-pairs surface is never touched.
   */
  def minHashDups(docs: DataFrame, idCol: String, textCol: String,
      minJaccard: Double = 0.2): DataFrame = {
    val sh = shingles(docs, idCol, textCol).persist()
    val cands = minHashCandidates(minHashSignatures(sh))
    cands
      .join(jaccardPairs(sh), Seq("doc0", "doc1"))
      .where(col("jaccard") >= minJaccard)
      .select("doc0", "doc1", "jaccard")
  }

  /** Number of SimHash bits (shingle hashes carry ~30 usable bits). */
  val SimHashBits = 24

  /**
   * Per-document SimHash over the distinct shingle set: bit i is the sign
   * of Σ_shingles (±1) where the shingle votes +1 iff its hash has bit i
   * set. One aggregate, 24 counter columns — no row explosion.
   */
  def simHash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sh = shingles(docs, idCol, textCol)
    val sums = (0 until SimHashBits).map { i =>
      sum(when(expr(s"shiftright(sh, $i) & 1") === 1, 1L).otherwise(-1L)).as(s"s_$i")
    }
    val hash = (0 until SimHashBits)
      .map(i => when(col(s"s_$i") > 0, lit(1L << i)).otherwise(lit(0L)): Column)
      .reduce(_ + _)
    sh.groupBy("doc_id").agg(sums.head, sums.tail: _*)
      .select(col("doc_id"), hash.as("simhash"))
  }

  /**
   * Near-dup pairs by SimHash hamming distance ≤ `maxHamming`.
   *
   * The pair scan compares only the 64-bit sketches (not documents), so the
   * self-join input is one small row per doc; at billions of docs, band the
   * sketch (split into 4×6-bit chunks, equi-join on any equal chunk) the
   * same way [[minHashCandidates]] does rather than this direct compare.
   */
  def simHashDups(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val h = simHash(docs, idCol, textCol)
    val a = h.as("a")
    val b = h.as("b")
    a.join(b, col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc0"),
        col("b.doc_id").as("doc1"),
        expr("CAST(bit_count(a.simhash ^ b.simhash) AS BIGINT)").as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  /**
   * Embedding-cosine near-duplicates: pairs with cosine ≥ `minCosine`
   * (rounded to the 1e-6 grid first so thresholding is reproducible).
   * Delegates the vector math to [[Embeddings]]; at scale route through
   * [[Embeddings.ivfTopK]]-style bucketing instead of the all-pairs join.
   */
  def embeddingDups(emb: DataFrame, idCol: String, vecCol: String,
      minCosine: Double = 0.4): DataFrame =
    Embeddings.allPairsCosine(emb, idCol, vecCol).where(col("cosine") >= minCosine)
}
