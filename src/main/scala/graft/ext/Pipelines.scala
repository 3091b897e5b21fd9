package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Composed end-to-end corpus pipelines: each stage is one of the
 * already-tested primitives, glued in the order a production
 * training-data sweep runs them. The value of the composition is that
 * every intermediate stays a lazy DataFrame — Catalyst sees the WHOLE
 * pipeline as one plan, so column pruning and predicate pushdown cross
 * stage boundaries (e.g. the quality gate's doc_id semi-join prunes the
 * contamination scan's inputs).
 */
object Pipelines {

  /**
   * The standard cleaning sweep over a raw document corpus, in one call:
   *
   *   1. NEAR-DUP DEDUP over the full corpus — MinHash/LSH pairs
   *      ([[Dedup.minHashDups]]), min-label grouping
   *      ([[Dedup.dupGroups]]), then keep the highest-token-count member
   *      of each duplicate cluster ([[Dedup.keepBest]], ties → min id).
   *      Dedup runs FIRST (on everything) so a near-dup cluster
   *      straddling the quality threshold still elects its best member,
   *      not an arbitrary survivor of a pre-filter.
   *   2. QUALITY GATE — [[TextAnalysis.qualityFilter]] bounds on token
   *      count, mean token length, stopword ratio, and type-token ratio.
   *   3. DECONTAMINATION — drop any document sharing a word trigram with
   *      the held-out eval slice ([[Dedup.contamination]] with
   *      hit_shingles > 0), and the eval slice itself.
   *
   * Returns the clean corpus as (doc_id, group_rep, n_tokens) — the
   * surviving representative documents with their duplicate-cluster ids
   * and sizes in tokens, ready to join back to the full rows for export.
   *
   * `pin` is the caller-owned caching hook (same convention as
   * [[Dedup.dupGroups]]'s contract): the near-dup pair list is consumed
   * once per grouping round, so callers should pass
   * `_.localCheckpoint()` or `_.persist()` for real corpora.
   *
   * Scale shape: nothing beyond the primitives' own shapes — banded
   * equi-join candidates, label propagation, broadcast eval-shingle
   * probe; the glue is two semi/anti joins and one inner join, all on
   * the fixed-width doc_id key.
   */
  /** The four stage tables [[cleanCorpus]] composes, exposed so
    * [[cleanFunnel]] can count survivors at each gate without
    * re-deriving the chain. */
  private final case class CleanStages(elected: DataFrame, quality: DataFrame,
      trainIds: DataFrame, contaminated: DataFrame)

  private def cleanStages(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, evalSource: String,
      minTokens: Long, maxTokens: Long,
      minAvgTokenLen: Double, maxAvgTokenLen: Double,
      maxStopwordRatio: Double, minTtr: Double,
      pin: DataFrame => DataFrame): CleanStages = {
    val pairs = pin(Dedup.minHashDups(docs, idCol, textCol)
      .select("doc0", "doc1"))
    val groups = Dedup.dupGroups(docs, pairs, idCol)
    val scores = TextAnalysis.tokenCounts(docs, idCol, textCol)
    val elected = Dedup.keepBest(groups, scores, "doc_id", "ws_tokens")
      .where(col("kept") === 1L)
      .select(col("doc_id"), col("group_rep"))
    val quality = TextAnalysis.qualityFilter(docs, idCol, textCol,
        minTokens, maxTokens, minAvgTokenLen, maxAvgTokenLen,
        maxStopwordRatio, minTtr)
      .select(col("doc_id"), col("n_tokens"))
    val train = docs.where(col(sourceCol) =!= evalSource)
    val evalDocs = docs.where(col(sourceCol) === evalSource)
    val contaminated = Dedup.contamination(train, evalDocs, idCol, textCol)
      .where(col("hit_shingles") > 0)
      .select(col("doc_id"))
    CleanStages(elected, quality,
      train.select(col(idCol).as("doc_id")), contaminated)
  }

  def cleanCorpus(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, evalSource: String,
      minTokens: Long = 10, maxTokens: Long = 100000,
      minAvgTokenLen: Double = 2.0, maxAvgTokenLen: Double = 12.0,
      maxStopwordRatio: Double = 0.6, minTtr: Double = 0.2,
      pin: DataFrame => DataFrame = identity): DataFrame = {
    val st = cleanStages(docs, idCol, textCol, sourceCol, evalSource,
      minTokens, maxTokens, minAvgTokenLen, maxAvgTokenLen,
      maxStopwordRatio, minTtr, pin)
    st.quality
      .join(st.elected, "doc_id")
      .join(st.trainIds, Seq("doc_id"), "left_semi")
      .join(st.contaminated, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("group_rep"), col("n_tokens"))
  }

  /**
   * Data-loss accounting for [[cleanCorpus]] — one row per pipeline
   * stage with the surviving document count, the first artifact an
   * operator reads after ANY sweep: a quality gate that silently drops
   * 60% of a source, or a decontamination probe that suddenly matches
   * half the corpus, is visible here before the training run is. Stages
   * nest cumulatively (each count applies all previous gates), so
   * adjacent differences are the per-gate cost:
   *
   *   `0_raw` → `1_elected` (dup-cluster election) → `2_quality`
   *   (signal bounds) → `3_train` (eval slice removed) → `4_final`
   *   (decontamination).
   *
   * Scale shape: the stage tables are built once ([[cleanStages]]) and
   * each count is a 1-row aggregate over doc_id-keyed semi/anti joins —
   * the same joins [[cleanCorpus]] plans, minus the payload columns.
   */
  def cleanFunnel(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, evalSource: String,
      minTokens: Long = 10, maxTokens: Long = 100000,
      minAvgTokenLen: Double = 2.0, maxAvgTokenLen: Double = 12.0,
      maxStopwordRatio: Double = 0.6, minTtr: Double = 0.2,
      pin: DataFrame => DataFrame = identity): DataFrame = {
    val st = cleanStages(docs, idCol, textCol, sourceCol, evalSource,
      minTokens, maxTokens, minAvgTokenLen, maxAvgTokenLen,
      maxStopwordRatio, minTtr, pin)
    val s1 = st.elected.select("doc_id")
    val s2 = s1.join(st.quality.select("doc_id"), "doc_id")
    val s3 = s2.join(st.trainIds, Seq("doc_id"), "left_semi")
    val s4 = s3.join(st.contaminated, Seq("doc_id"), "left_anti")
    def cnt(stage: String, df: DataFrame) =
      df.agg(count(lit(1)).as("n_docs")).select(lit(stage).as("stage"), col("n_docs"))
    cnt("0_raw", docs)
      .unionByName(cnt("1_elected", s1))
      .unionByName(cnt("2_quality", s2))
      .unionByName(cnt("3_train", s3))
      .unionByName(cnt("4_final", s4))
  }

  /**
   * [[cleanCorpus]] ending in a GROUP-ATOMIC train/val/test assignment —
   * the full sweep a training run actually consumes: clean, then split
   * leakage-free by hashing each survivor's dup-group REPRESENTATIVE
   * ([[Export.splitAssignByGroup]]'s rule). Survivors are their groups'
   * elected representatives, so hashing `group_rep` keeps any future
   * re-admission of a group member (threshold changes, delta re-runs) in
   * the same split its representative landed in — the split is a pure
   * function of (group identity, salt), not of election outcomes.
   */
  def cleanAndSplit(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, evalSource: String,
      minTokens: Long = 10, maxTokens: Long = 100000,
      minAvgTokenLen: Double = 2.0, maxAvgTokenLen: Double = 12.0,
      maxStopwordRatio: Double = 0.6, minTtr: Double = 0.2,
      trainPermille: Int = 800, valPermille: Int = 100, salt: Long = 0L,
      pin: DataFrame => DataFrame = identity): DataFrame = {
    val bucket = Export.mixBucket(col("group_rep"), 1000, salt)
    cleanCorpus(docs, idCol, textCol, sourceCol, evalSource,
      minTokens, maxTokens, minAvgTokenLen, maxAvgTokenLen,
      maxStopwordRatio, minTtr, pin)
      .select(col("doc_id"), col("group_rep"), col("n_tokens"),
        when(bucket < trainPermille, lit("train"))
          .when(bucket < trainPermille + valPermille, lit("val"))
          .otherwise(lit("test")).as("split"))
  }

  /**
   * The full DATA-SELECTION sweep: [[cleanCorpus]]'s gates (dup-cluster
   * election, quality bounds, eval-slice removal, decontamination)
   * followed by DSIR importance ranking toward a target domain
   * ([[TextAnalysis.dsirWeights]]) and the top-`m` cut — the end-to-end
   * "which m documents do we actually train on" answer, composed from
   * the same tested primitives in the order a production sweep runs
   * them. The DSIR model fits on the FULL corpus (target slice vs raw
   * rest — the fit wants all the evidence); the ranking applies to the
   * CLEAN raw survivors only, so a document can never buy its way past
   * a quality or contamination gate with a good importance score.
   * Ranking reads the 1e-6-snapped weight (the [[TextAnalysis
   * .dsirSample]] determinism argument), doc_id tie-break.
   *
   * Scale shape: the clean chain's and the DSIR chain's own shapes plus
   * one doc_id equi-join and a TakeOrdered top-m — nothing new shuffles.
   */
  def selectCorpus(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, evalSource: String, targetSource: String, m: Int,
      minTokens: Long = 10, maxTokens: Long = 100000,
      minAvgTokenLen: Double = 2.0, maxAvgTokenLen: Double = 12.0,
      maxStopwordRatio: Double = 0.6, minTtr: Double = 0.2,
      pin: DataFrame => DataFrame = identity): DataFrame = {
    require(m > 0)
    val clean = cleanCorpus(docs, idCol, textCol, sourceCol, evalSource,
      minTokens, maxTokens, minAvgTokenLen, maxAvgTokenLen,
      maxStopwordRatio, minTtr, pin)
    val weights = TextAnalysis.dsirWeights(docs, idCol, textCol,
        sourceCol, targetSource, pin = pin)
      .where(col("is_target") === 0L)
      .select(col("doc_id"),
        TextAnalysis.snapCol(col("log_weight")).as("log_weight"))
    val order = Seq(col("log_weight").desc, col("doc_id").asc)
    clean.join(weights, "doc_id")
      .orderBy(order: _*).limit(m)
      .withColumn("rank", org.apache.spark.sql.functions.row_number()
        .over(org.apache.spark.sql.expressions.Window.orderBy(order: _*))
        .cast("long"))
  }

  /**
   * [[selectCorpus]] at TRAINING-SET size: the identical selection
   * contract (same gates, same DSIR ranking, same (log_weight desc,
   * doc_id) order, same top-`m` rows and ranks) but the cut runs through
   * [[Export.globalTopM]] instead of `orderBy().limit(m)` — no
   * GlobalLimit/TakeOrdered single-task sink, so `m` can be a double-digit
   * percentage of a 100 TB corpus. Each selected row also carries its
   * export `shard` = ⌊(rank−1)·nShards/m⌋, so rank order is recoverable
   * from (shard, rank) and the result writes directly via
   * `partitionBy("shard")` without any further global sort.
   *
   * The ranking key is the SNAPPED weight scaled onto its own 1e-6 grid
   * and negated (`-round(log_weight·1e6)` — exact integer on the snap
   * grid, strictly monotone, so ascending key order IS descending weight
   * order and ties break by doc_id exactly as [[selectCorpus]] breaks
   * them). Scale shape: the clean and DSIR chains unchanged, plus
   * globalTopM's histogram pass, one parts-row driver aggregate, and a
   * bucket-partitioned window over ~m head rows.
   */
  def selectCorpusShards(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, evalSource: String, targetSource: String, m: Int,
      nShards: Int = 8, parts: Int = 64, width: Long = 1000000L,
      minTokens: Long = 10, maxTokens: Long = 100000,
      minAvgTokenLen: Double = 2.0, maxAvgTokenLen: Double = 12.0,
      maxStopwordRatio: Double = 0.6, minTtr: Double = 0.2,
      pin: DataFrame => DataFrame = identity): DataFrame = {
    require(m > 0 && nShards > 0)
    val clean = cleanCorpus(docs, idCol, textCol, sourceCol, evalSource,
      minTokens, maxTokens, minAvgTokenLen, maxAvgTokenLen,
      maxStopwordRatio, minTtr, pin)
    val weights = TextAnalysis.dsirWeights(docs, idCol, textCol,
        sourceCol, targetSource, pin = pin)
      .where(col("is_target") === 0L)
      .select(col("doc_id"),
        TextAnalysis.snapCol(col("log_weight")).as("log_weight"))
    val keyed = clean.join(weights, "doc_id")
      .withColumn("_key", -round(col("log_weight") * lit(1e6)).cast("long"))
    Export.globalTopM(keyed, "_key", "doc_id", m, parts, width, pin)
      .withColumn("shard",
        floor(((col("rank") - lit(1L)) * lit(nShards.toLong)) / lit(m.toLong))
          .cast("long"))
      .drop("_key")
  }

  /**
   * INCREMENTAL cleaning sweep (VERDICT r6 ask #7) — the same contract as
   * [[cleanCorpus]] over the NEW corpus snapshot, but the expensive work
   * (shingling, MinHash banding, candidate verification) runs only on the
   * docs the delta actually touched. Re-running [[cleanCorpus]] from
   * scratch on a 100 TB corpus for a 0.1% daily delta re-shingles and
   * re-verifies everything; this path:
   *
   *   1. [[graft.ext.Audit.corpusDiff]] classifies the delta — only
   *      `added`/`changed` docs (content-hash compare) need re-indexing.
   *   2. [[graft.streaming.DedupStream.nearDupBatch]] folds EXACTLY those
   *      docs into the persistent banded index as one batch: candidates
   *      are delta-vs-index + delta-vs-delta band collisions, verified
   *      against current-version shingles — never a corpus re-scan.
   *   3. The pair list and shingle table are then READ BACK from the
   *      index at current versions ([[graft.streaming.DedupStream
   *      .currentPairs]] drops pairs staled by re-ingest; edges touching
   *      removed docs die in [[Dedup.dupGroups]]'s foreign-edge filter),
   *      and the cheap corpus-wide tail — grouping over the result-sized
   *      pair list, row-local quality scoring, the index-probed
   *      decontamination ([[Dedup.contaminationFromShingles]]) — runs as
   *      in [[cleanCorpus]].
   *
   * Result rows are IDENTICAL to `cleanCorpus(newDocs, ...)` (pinned by
   * IncrementalCleanSpec) provided the index previously ingested every
   * old doc (backfill `oldDocs` as one batch when bootstrapping).
   *
   * What stays corpus-linear on purpose: quality scoring and token
   * counts are single-pass row-local map stages over the snapshot — no
   * pair surface, no index; caching THOSE per-doc scalars is a storage
   * trade the caller can make separately. The quadratic-risk stages are
   * the ones the index bounds to delta size.
   *
   * `batchId` must be fresh per delta (monotone increasing); replaying a
   * delta with its old id idempotently overwrites that batch's partition
   * (the [[graft.streaming.DedupStream.nearDupBatch]] contract).
   */
  def incrementalClean(oldDocs: DataFrame, newDocs: DataFrame,
      idCol: String, textCol: String,
      sourceCol: String, evalSource: String,
      indexDir: String, batchId: Long,
      minTokens: Long = 10, maxTokens: Long = 100000,
      minAvgTokenLen: Double = 2.0, maxAvgTokenLen: Double = 12.0,
      maxStopwordRatio: Double = 0.6, minTtr: Double = 0.2,
      minJaccard: Double = 0.2,
      pin: DataFrame => DataFrame = identity): DataFrame = {
    val spark = newDocs.sparkSession
    val deltaIds = Audit.corpusDiff(oldDocs, newDocs, idCol, textCol)
      .where(col("status").isin("added", "changed"))
      .select(col("doc_id"))
    val deltaDocs = newDocs
      .join(deltaIds, newDocs(idCol) === deltaIds("doc_id"), "left_semi")
    graft.streaming.DedupStream.nearDupBatch(
      deltaDocs, idCol, textCol, indexDir, minJaccard, batchId)
    // the version map is computed ONCE and pinned — each current-view
    // reader would otherwise re-run the roster aggregate (and a recovery
    // probe) against the full index per consumer
    val latest = pin(graft.streaming.DedupStream.latestVersions(spark, indexDir))
    val pairs = pin(graft.streaming.DedupStream
      .currentPairs(spark, indexDir, Some(latest)).select("doc0", "doc1"))
    val idxSh = graft.streaming.DedupStream
      .currentShingles(spark, indexDir, Some(latest))
    val groups = Dedup.dupGroups(newDocs, pairs, idCol)
    val scores = TextAnalysis.tokenCounts(newDocs, idCol, textCol)
    val elected = Dedup.keepBest(groups, scores, "doc_id", "ws_tokens")
      .where(col("kept") === 1L)
      .select(col("doc_id"), col("group_rep"))
    val quality = TextAnalysis.qualityFilter(newDocs, idCol, textCol,
        minTokens, maxTokens, minAvgTokenLen, maxAvgTokenLen,
        maxStopwordRatio, minTtr)
      .select(col("doc_id"), col("n_tokens"))
    val trainIds = newDocs.where(col(sourceCol) =!= evalSource)
      .select(col(idCol).as("doc_id"))
    val evalIds = newDocs.where(col(sourceCol) === evalSource)
      .select(col(idCol).as("doc_id"))
    val contaminated = Dedup.contaminationFromShingles(
        idxSh.join(trainIds, Seq("doc_id"), "left_semi"),
        idxSh.join(evalIds, Seq("doc_id"), "left_semi"))
      .where(col("hit_shingles") > 0)
      .select(col("doc_id"))
    quality
      .join(elected, "doc_id")
      .join(trainIds, Seq("doc_id"), "left_semi")
      .join(contaminated, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("group_rep"), col("n_tokens"))
  }
}
