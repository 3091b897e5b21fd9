package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic split and shard assignment — the export tail of a
 * training-data pipeline. After dedup/quality/decontamination, a corpus
 * ships as (a) a train/val/test partition that must be STABLE across
 * re-runs and incremental refreshes (a document's split may never flip
 * when unrelated documents arrive), and (b) a fixed number of shard
 * files in a deterministic pseudo-random order (so a training job's
 * data order is reproducible without a global shuffle of 100 TB).
 *
 * Both derive from one integer hash chain ([[mixBucket]]) built from
 * multiply-add-mod steps whose intermediates provably fit in an int64 —
 * the SAME arithmetic runs exactly in Spark, DuckDB, or any engine with
 * 64-bit integers, which is what makes the assignment auditable: the
 * oracle recomputes it independently, and a training job years later can
 * re-derive which split any document was in from its id alone.
 *
 * Scale shape: [[splitAssign]] is a pure map stage (zero exchanges, runs
 * unchanged on streams); [[shardAssign]] is one hash-partition exchange
 * on the shard id plus a per-shard sort — the minimal physical plan any
 * deterministic sharded export can have (each output shard is written
 * independently; no global ordering exists to sort).
 */
object Export {

  /** 31-bit modulus of the mixing chain (2^31): products of any chain
    * state with either multiplier stay below 2^63. */
  val MixMod: Long = 2147483648L
  /** Knuth's multiplicative constant (round 1). */
  val MixA1: Long = 2654435761L
  /** glibc LCG multiplier/increment (round 2) — a second independent
    * round so consecutive ids don't land in correlated buckets. */
  val MixA2: Long = 1103515245L
  val MixC2: Long = 12345L

  /**
   * The deterministic bucket chain: two multiply-add-mod rounds over the
   * non-negative id, reduced to a bucket in [0, buckets).
   *
   * Bound proof (why no step can overflow int64): `id % (MixMod-1)` <
   * 2^31; `· MixA1` < 2^31·2^32 < 2^63; after `% MixMod` the state is
   * < 2^31 again, and `· MixA2` < 2^31·2^31 < 2^63. Salt is folded in
   * round 1 and must be in [0, 2^31).
   */
  def mixBucket(id: Column, buckets: Int, salt: Long): Column = {
    require(salt >= 0 && salt < MixMod, s"salt must be in [0, ${MixMod})")
    require(buckets > 0, "buckets must be positive")
    val h0 = id.cast("long") % lit(MixMod - 1)
    val h1 = (h0 * lit(MixA1) + lit(salt)) % lit(MixMod)
    val h2 = (h1 * lit(MixA2) + lit(MixC2)) % lit(MixMod)
    h2 % lit(buckets.toLong)
  }

  /** [[mixBucket]] spelled as engine-neutral SQL over column `c` — the
    * oracle's side of the same arithmetic (kept adjacent so the two
    * spellings cannot drift apart). */
  def mixBucketSql(c: String, buckets: Int, salt: Long): String =
    s"((((($c % ${MixMod - 1}) * $MixA1 + $salt) % $MixMod) * $MixA2 + $MixC2) % $MixMod) % $buckets"

  /** [[mixBucket]] as plain JVM long arithmetic — the spelling stateful
    * streaming operators use inside their per-key functions (a Column
    * cannot run there). Same ops, same bounds proof; kept adjacent to the
    * other two spellings so the three cannot drift apart (equality is
    * property-tested in ExportSpec). */
  def mixBucketLong(id: Long, buckets: Int, salt: Long): Long = {
    require(salt >= 0 && salt < MixMod, s"salt must be in [0, ${MixMod})")
    require(buckets > 0, "buckets must be positive")
    val h0 = id % (MixMod - 1)
    val h1 = (h0 * MixA1 + salt) % MixMod
    val h2 = (h1 * MixA2 + MixC2) % MixMod
    h2 % buckets.toLong
  }

  /**
   * Stable train/val/test assignment by id hash: bucket ∈ [0, 1000),
   * `train` below `trainPermille`, `val` in the next `valPermille`,
   * `test` above. Expected fractions hold in distribution; every
   * document's split is a pure function of (id, salt) — adding or
   * removing other documents never moves it. Ids must be non-negative
   * (parquet surrogate ids are).
   */
  def splitAssign(docs: DataFrame, idCol: String,
      trainPermille: Int = 800, valPermille: Int = 100,
      salt: Long = 0L): DataFrame = {
    require(trainPermille >= 0 && valPermille >= 0 &&
      trainPermille + valPermille <= 1000, "permille bounds must fit in 1000")
    val bucket = mixBucket(col(idCol), 1000, salt)
    docs.select(
      col(idCol).as("doc_id"),
      bucket.as("bucket"),
      when(bucket < trainPermille, lit("train"))
        .when(bucket < trainPermille + valPermille, lit("val"))
        .otherwise(lit("test")).as("split"))
  }

  /**
   * GROUP-ATOMIC train/val/test assignment — the leakage-free variant of
   * [[splitAssign]]: hash the dup-group REPRESENTATIVE instead of the
   * document id, so every member of a near-dup group lands in the same
   * split. [[splitAssign]] alone is exactly how eval contamination
   * happens (near-identical texts hash to different splits — the
   * off-diagonal rows the dedup_split_leakage matrix measures); routing
   * the hash through `groups` (doc_id, group_rep — [[Dedup.dupGroups]]'
   * output) closes that channel by construction: the split is a pure
   * function of (group_rep, salt), and singletons (their own rep)
   * degrade to id-hash behavior.
   *
   * Scale shape: one equi-join docs↔groups on doc_id (both sides already
   * keyed there) + the same row-local mix chain; no new exchange beyond
   * the join.
   */
  def splitAssignByGroup(docs: DataFrame, idCol: String, groups: DataFrame,
      trainPermille: Int = 800, valPermille: Int = 100,
      salt: Long = 0L): DataFrame = {
    require(trainPermille >= 0 && valPermille >= 0 &&
      trainPermille + valPermille <= 1000, "permille bounds must fit in 1000")
    val bucket = mixBucket(col("group_rep"), 1000, salt)
    docs.select(col(idCol).as("doc_id"))
      .join(groups.select(col("doc_id"), col("group_rep")), "doc_id")
      .select(
        col("doc_id"),
        col("group_rep"),
        when(bucket < trainPermille, lit("train"))
          .when(bucket < trainPermille + valPermille, lit("val"))
          .otherwise(lit("test")).as("split"))
  }

  /**
   * Deterministic shard + position assignment: shard = id-hash mod
   * `nShards`; `pos` numbers the shard's documents 0..n-1 in hash order
   * (ties on the raw 31-bit hash break by id). The (shard, pos) order is
   * the reproducible "global shuffle" a training run reads — re-running
   * the export on the same corpus yields byte-identical shards.
   */
  def shardAssign(docs: DataFrame, idCol: String, nShards: Int,
      salt: Long = 0L): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    // full 31-bit hash for the within-shard order; shard is its residue
    val h = mixBucket(col(idCol), Int.MaxValue, salt)
    val assigned = docs.select(
      col(idCol).as("doc_id"),
      (h % nShards).as("shard"),
      h.as("h"))
    val w = Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
    assigned
      .select(col("doc_id"), col("shard"),
        (row_number().over(w) - 1).cast("long").as("pos"))
  }

  /**
   * Per-shard export manifest — the integrity record written NEXT TO the
   * shard files so any later consumer (or the same pipeline re-run) can
   * verify a shard without re-reading the corpus: document count, total
   * characters, and an order-independent content checksum (the sum of
   * each member's [[TextAnalysis.fingerprint]] rolling hash — int64-safe:
   * each term is < 1e9+7, so even 2³³ docs per shard cannot overflow).
   * A re-run that silently drops, duplicates, or mutates one document
   * changes its shard's row; byte-for-byte identical re-runs reproduce
   * the manifest exactly, in any engine (the hash chain is pure
   * multiply-add-mod int64 arithmetic — the auditability contract of
   * [[shardAssign]] extended to content).
   *
   * Token-less documents carry checksum term 0 (they have no fingerprint)
   * but still count toward n_docs/n_chars — absence still changes the row.
   *
   * Scale shape: the shard hash is row-local, the fingerprint is a
   * row-local fold, and the manifest is ONE nShards-row aggregate with
   * map-side partials; the join is id-keyed. Nothing holds more than
   * nShards rows past the scan.
   */
  def shardManifest(docs: DataFrame, idCol: String, textCol: String,
      nShards: Int, salt: Long = 0L): DataFrame = {
    val assigned = shardAssign(docs, idCol, nShards, salt)
      .select(col("doc_id"), col("shard"))
    val fp = TextAnalysis.fingerprint(docs, idCol, textCol)
    val chars = docs.select(col(idCol).as("doc_id"),
      length(col(textCol)).cast("long").as("nc"))
    assigned
      .join(fp, Seq("doc_id"), "left")
      .join(chars, "doc_id")
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nc")).as("n_chars"),
        sum(coalesce(col("fingerprint"), lit(0L))).as("checksum"))
  }

  /**
   * Deterministic RANGE-sharded export: shard `s` holds keys globally ≤
   * shard `s+1`'s — the layout a sorted-output consumer needs (merge-join
   * ingestion, bisectable archives, time- or length-sliced training
   * curricula), where [[shardAssign]]'s hash shards deliberately destroy
   * key locality. `repartitionByRange` would plan exactly this but its
   * reservoir-SAMPLED boundaries differ run to run; here the boundaries
   * are the histogram-sketch quantiles
   * ([[TextAnalysis.quantileSketchHist]] — deterministic, bounded state,
   * boundary error inside one `width` bucket, so shard SIZES are
   * balanced to the same envelope).
   *
   * The `nShards − 1` boundary values are a model-sized EAGER FIT
   * (collected to the driver and compiled into a pure map-stage
   * expression — the PQ-codebook pattern): assignment touches the corpus
   * once more with zero joins. Duplicate boundaries collapse (a value
   * heavier than a whole shard never splits), so fewer than `nShards`
   * shards can come back — the contract is monotonicity, not exact
   * count. `pos` orders each shard by (key, id); (shard, pos) is a
   * total order over the corpus.
   */
  /**
   * EXACT global top-`m` by (long key asc, id asc) WITHOUT a driver-sized
   * sink — the training-set-sized cut `orderBy().limit(m)` cannot plan
   * (Spark's GlobalLimit/TakeOrdered funnels all m rows through one
   * task; fine for a readout, driver-bound when m is 10% of a 100 TB
   * corpus). Returns the input columns plus a 1-based `rank`, rows with
   * `rank <= m` only.
   *
   * Plan: deterministic range BUCKETS from the histogram-sketch
   * quantiles of the key ([[rangeShards]]' boundary machinery — never
   * `repartitionByRange`, whose reservoir-sampled boundaries can differ
   * between the count pass and the rank pass and silently corrupt the
   * offsets), then ONE `parts`-row count aggregate collected to the
   * driver (the pageRank-convention model-sized action) turns bucket
   * counts into cumulative offsets, and `rank = bucket offset +
   * row_number within bucket`. Buckets whose offset is already >= m are
   * dropped BEFORE the window, so the sort only touches ~m rows spread
   * across the head buckets.
   *
   * Exactness: the bucket rule assigns every row with the same key to
   * the same bucket (boundaries compare the key itself), so within-bucket
   * row_number over (key, id) + the offset IS the global rank — no tie
   * can straddle a boundary. Balance (not correctness) degrades with the
   * histogram's one-`width`-bucket boundary error and with any single
   * key heavier than m rows (that bucket's sort runs in one task — the
   * same envelope [[rangeShards]] documents).
   *
   * `pin` is the caller's caching hook for the bucketed table (it feeds
   * the count pass and the rank pass; an unpinned expensive upstream
   * recomputes twice).
   */
  def globalTopM(df: DataFrame, keyCol: String, idCol: String, m: Long,
      parts: Int = 64, width: Long = 1024,
      pin: DataFrame => DataFrame = identity): DataFrame = {
    require(m > 0 && parts >= 1 && width >= 1)
    val spark = df.sparkSession
    import spark.implicits._
    val qs = (1 until parts).map(i => i.toDouble / parts)
    val bounds: Seq[Long] =
      if (qs.isEmpty) Seq.empty
      else TextAnalysis.quantileSketchHist(
          df.select(lit(0L).as("grp"), col(keyCol).as("v")),
          "grp", "v", qs, width)
        .collect().map(_.getAs[Long]("v_q")).toSeq.distinct.sorted
    val bucketExpr = bounds.foldLeft(lit(0L).cast("long")) { (acc, b) =>
      acc + when(col(keyCol) >= lit(b), lit(1L)).otherwise(lit(0L))
    }
    val bucketed = pin(df.withColumn("_bkt", bucketExpr))
    val counts = bucketed.groupBy("_bkt").agg(count(lit(1)).as("_n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts
      .scanLeft((-1L, 0L, 0L)) { case ((_, off, n), (b, c)) => (b, off + n, c) }
      .drop(1)
      .collect { case (b, off, _) if off < m => (b, off) }
    val offDf = broadcast(offsets.toSeq.toDF("_bkt", "_off"))
    val w = Window.partitionBy(col("_bkt"))
      .orderBy(col(keyCol).asc, col(idCol).asc)
    bucketed.join(offDf, "_bkt")
      .withColumn("rank", (col("_off") + row_number().over(w)).cast("long"))
      .where(col("rank") <= m)
      .drop("_bkt", "_off")
  }

  def rangeShards(df: DataFrame, idCol: String, keyCol: String,
      nShards: Int, width: Long): DataFrame = {
    require(nShards >= 1 && width >= 1)
    val keyed = df.select(col(idCol).as("doc_id"),
      col(keyCol).cast("long").as("key"))
    val qs = (1 until nShards).map(i => i.toDouble / nShards)
    val bounds: Seq[Long] =
      if (qs.isEmpty) Seq.empty
      else TextAnalysis.quantileSketchHist(
          keyed.select(lit(0L).as("grp"), col("key").as("v")),
          "grp", "v", qs, width)
        .collect().map(_.getAs[Long]("v_q")).toSeq.distinct.sorted
    val shardExpr = bounds.foldLeft(lit(0L).cast("long")) { (acc, b) =>
      acc + when(col("key") >= lit(b), lit(1L)).otherwise(lit(0L))
    }
    val w = Window.partitionBy(col("shard")).orderBy(col("key"), col("doc_id"))
    keyed
      .withColumn("shard", shardExpr)
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
  }
}
