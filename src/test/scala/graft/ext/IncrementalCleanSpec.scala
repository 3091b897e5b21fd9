package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.SparkSpec
import graft.streaming.DedupStream

/**
 * The incremental cleaning composition (VERDICT r6 ask #7): corpusDiff →
 * delta-only re-indexing → index-read dedup/decontamination → the same
 * keep/drop decisions as a full [[Pipelines.cleanCorpus]] recompute.
 *
 * The fixture exercises every delta class: a CHANGED doc whose old text
 * was a near-dup (its stale pair must die) and whose new text forms a NEW
 * pair, an ADDED near-dup, a REMOVED doc (its index rows must not leak
 * into grouping), plus untouched duplicate clusters and a contaminated
 * train doc — over a ~5% delta of a 60-doc corpus.
 */
class IncrementalCleanSpec extends SparkSpec {
  implicit lazy val s: SparkSession = spark
  import s.implicits._

  private val TA = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
  private val TB = "ocean river mountain valley forest desert prairie canyon glacier tundra"
  private val TC = "violin cello trumpet clarinet oboe bassoon piccolo timpani harp marimba"
  private val TD = "copper silver bronze platinum titanium cobalt nickel tungsten chromium zinc"
  private val TEval = "benchmark evaluation suite question answer pairs remain hidden forever always"

  /** Per-doc-unique filler prose. tokenValue probes only (length, first,
    * middle, last), so the doc index is encoded in the first+last letters
    * and the word index in the LENGTH (cf. ContainmentSketchSpec's
    * fixture-token note) — fillers share no token values, hence no
    * shingles, with each other or the real-word docs (no real word has a
    * 'q' at its middle probe). */
  private def filler(i: Int) = {
    val a = ('a' + i / 8).toChar
    val b = ('a' + i % 8).toChar
    (0 until 10).map(w => s"$a${"q" * (w + 1)}$b").mkString(" ")
  }

  /** v1: 60 docs. 1/2 duplicate cluster (2 longer → elected); 4 near-dups
    * 7 (changed in v2); 5 paired by the v2 ADD; 3 shares a trigram with
    * the eval doc 100; 6 is removed in v2; the rest are unique filler. */
  private lazy val v1: DataFrame = {
    val rows = Seq(
      1L -> TA, 2L -> (TA + " kilo"),
      3L -> ("my notes say " + TEval + " which is quite the problem"),
      4L -> TB, 7L -> (TB + " lagoon"),
      5L -> TD, 6L -> "this document disappears in the next snapshot entirely gone soon",
      8L -> TC) ++ (9 to 59).map(i => i.toLong -> filler(i)) :+ (100L -> TEval)
    rows.map { case (id, t) =>
      (id, t, if (id == 100L) "eval" else "train")
    }.toDF("doc_id", "text", "source")
  }

  /** v2 delta (~5% of 60): doc 4 CHANGED (now near-dups 8, no longer 7),
    * doc 200 ADDED as a near-dup of 5, doc 6 REMOVED. */
  private lazy val v2: DataFrame = {
    val changed = Map(4L -> (TC + " glockenspiel"))
    v1.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .filter(_._1 != 6L)
      .map { case (id, t, src) => (id, changed.getOrElse(id, t), src) }
      .toSeq.appended((200L, TD + " iron", "train"))
      .toDF("doc_id", "text", "source")
  }

  // permissive quality knobs: every fixture doc passes, so the spec
  // isolates the dedup/decontamination decisions
  private def clean(docs: DataFrame): DataFrame =
    Pipelines.cleanCorpus(docs, "doc_id", "text", "source", "eval",
      minTokens = 3, maxTokens = 1000, minAvgTokenLen = 1.0,
      maxAvgTokenLen = 30.0, maxStopwordRatio = 1.0, minTtr = 0.0,
      pin = _.localCheckpoint())

  private def asSet(df: DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("incremental clean equals the full recompute after a 5% delta") {
    val dir = java.nio.file.Files.createTempDirectory("graft-incr").toString
    // bootstrap: backfill the v1 corpus as batch 0
    DedupStream.nearDupBatch(v1, "doc_id", "text", dir, 0.2, batchId = 0L)
    val incr = Pipelines.incrementalClean(v1, v2, "doc_id", "text",
      "source", "eval", dir, batchId = 1L,
      minTokens = 3, maxTokens = 1000, minAvgTokenLen = 1.0,
      maxAvgTokenLen = 30.0, maxStopwordRatio = 1.0, minTtr = 0.0,
      pin = _.localCheckpoint())
    val got = asSet(incr)
    val want = asSet(clean(v2))
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    // the decisions the delta was built to flip are all present:
    want.find(_._1 == 7L).foreach { case (_, rep, _) =>
      assert(rep == 7L, "doc 7 must be its own rep once doc 4 changed away")
    }
    assert(want.exists(r => r._1 == 200L && r._2 == 5L),
      "added doc 200 must win its cluster with rep 5")
    assert(!want.exists(_._1 == 3L), "contaminated doc 3 must be dropped")
    assert(!want.exists(_._1 == 6L), "removed doc 6 must not resurface")
  }

  test("the delta batch indexes ONLY added/changed docs (delta-sized write)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-incr2").toString
    DedupStream.nearDupBatch(v1, "doc_id", "text", dir, 0.2, batchId = 0L)
    Pipelines.incrementalClean(v1, v2, "doc_id", "text",
      "source", "eval", dir, batchId = 1L,
      minTokens = 3, maxTokens = 1000, minAvgTokenLen = 1.0,
      maxAvgTokenLen = 30.0, maxStopwordRatio = 1.0, minTtr = 0.0)
    // the only docs whose text was (re-)processed by the index update:
    val batch1Docs = spark.read.parquet(s"$dir/shingles")
      .where($"batch_id" === 1L)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(batch1Docs == Set(4L, 200L), batch1Docs)
    // and the index's current view serves the fresh pair set: the stale
    // (4,7) pair is invisible, the new (4,8) and (5,21) pairs are there
    val pairs = DedupStream.currentPairs(spark, dir)
      .select("doc0", "doc1").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((4L, 8L)) && pairs.contains((5L, 200L)), pairs)
    assert(!pairs.contains((4L, 7L)), pairs)
  }

  test("a delta that BRIDGES two groups re-elects exactly one representative") {
    // doc 300's text is half TA, half TC: it near-dups BOTH the {1, 2}
    // cluster and the {8, 4'} cluster (4 changed to TC-like in v2), so
    // the delta MERGES two previously-independent groups. The merged
    // component must elect exactly one representative, and the
    // incremental path must be row-identical to the full recompute —
    // the group-atomicity the splitAssignByGroup convention demands.
    val bridge = TA + " " + TC
    val v2m = v2.unionByName(Seq((300L, bridge, "train")).toDF("doc_id", "text", "source"))
    val dir = java.nio.file.Files.createTempDirectory("graft-incr4").toString
    DedupStream.nearDupBatch(v1, "doc_id", "text", dir, 0.2, batchId = 0L)
    val incr = Pipelines.incrementalClean(v1, v2m, "doc_id", "text",
      "source", "eval", dir, batchId = 1L,
      minTokens = 3, maxTokens = 1000, minAvgTokenLen = 1.0,
      maxAvgTokenLen = 30.0, maxStopwordRatio = 1.0, minTtr = 0.0,
      pin = _.localCheckpoint())
    val got = asSet(incr)
    val want = asSet(clean(v2m))
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    // the merge actually happened: 1, 2, 4, 8 and 300 share ONE group
    // representative in the survivor set — exactly one of them survives
    val merged = got.filter(r => Set(1L, 2L, 4L, 8L, 300L).contains(r._1))
    assert(merged.size == 1, s"one survivor from the merged group: $merged")
    assert(merged.head._2 == merged.head._1 || Set(1L, 2L, 4L, 8L, 300L)
      .contains(merged.head._2), merged.toString)
  }

  test("re-ingest verification uses current versions only (no shingle merge)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-incr3").toString
    DedupStream.nearDupBatch(
      Seq((1L, TA), (2L, TB)).toDF("doc_id", "text"),
      "doc_id", "text", dir, 0.2, batchId = 0L)
    // doc 1 re-ingested with TB-like text: its pair with 2 must be scored
    // against the NEW text alone — the old union-read would have diluted
    // the jaccard with TA's shingles
    DedupStream.nearDupBatch(
      Seq((1L, TB + " extra")).toDF("doc_id", "text"),
      "doc_id", "text", dir, 0.2, batchId = 1L)
    val pairs = DedupStream.currentPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val wantJ = Dedup.ngramJaccardDups(
      Seq((1L, TB + " extra"), (2L, TB)).toDF("doc_id", "text"),
      "doc_id", "text", minJaccard = 0.2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs == wantJ, s"index $pairs vs batch-exact $wantJ")
  }
}
