package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

class DedupStreamSpec extends SparkSpec {
  implicit lazy val s: SparkSession = spark
  import s.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(m: Int) = new Timestamp(Timestamp.valueOf("2024-05-01 00:00:00").getTime + m * 60000L)

  test("exactDedup drops repeated texts within the watermark horizon") {
    val in = MemoryStream[(Long, Timestamp, String)]
    val docs = in.toDF().toDF("doc_id", "ts", "text")
    val q = DedupStream.exactDedup(docs, "text", "ts")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((0L, ts(0), "alpha beta"), (1L, ts(1), "alpha beta"), (2L, ts(2), "gamma"))
      q.processAllAvailable()
      in.addData((3L, ts(3), "alpha beta"), (4L, ts(4), "delta"))
      q.processAllAvailable()
      val texts = spark.table("dedup_out").select("text").collect().map(_.getString(0))
      // "alpha beta" arrives three times within the watermark horizon:
      // exactly one copy survives; distinct texts all pass
      assert(texts.count(_ == "alpha beta") == 1)
      assert(texts.count(_ == "gamma") == 1 && texts.count(_ == "delta") == 1)
    } finally q.stop()
  }

  test("contaminationFlag: stream docs sharing an eval trigram are flagged once") {
    import graft.ext.Dedup
    // static eval corpus: one doc; its trigram set is the probe index
    val evalSh = Dedup.shingles(
      Seq((100L, "the quick brown fox jumps")).toDF("doc_id", "text"),
      "doc_id", "text")
    val in = MemoryStream[(Long, Timestamp, String)]
    val docs = in.toDF().toDF("doc_id", "ts", "text")
    val q = DedupStream.contaminationFlag(docs, "doc_id", "text", "ts", evalSh)
      .writeStream.format("memory").queryName("contam_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        (0L, ts(0), "here the quick brown fox appears again"), // shares trigrams
        (1L, ts(1), "completely unrelated text about engines today ok"),
        (2L, ts(2), "too short"))
      q.processAllAvailable()
      in.addData((0L, ts(3), "the quick brown fox jumps")) // same id again
      q.processAllAvailable()
      val flagged = spark.table("contam_out").collect().map(_.getLong(0))
      // doc 0 flagged exactly once (watermark-deduped); 1 and 2 clean
      assert(flagged.toSeq == Seq(0L), flagged.mkString(", "))
    } finally q.stop()
  }

  test("substringContaminationFlag: planted mid-doc quote flagged, parity with batch probe") {
    import graft.ext.Dedup
    // a >= 50-char verbatim eval passage; the stream doc pastes it
    // mid-document where token-trigram and fuzzy probes can miss it
    val quote = "the seventeen amber foxes vaulted nimbly across the frozen aqueduct at dawn"
    assert(quote.length >= Dedup.SubstrLen)
    val evalDocs = Seq((100L, s"benchmark preamble text. $quote. closing remarks.."))
      .toDF("doc_id", "text")
    val evalGrams = Dedup.substringGrams(evalDocs, "doc_id", "text", Dedup.SubstrLen)
    val streamed = Seq(
      (0L, ts(0), s"unrelated lead-in words here and then suddenly $quote and the document keeps going afterwards"),
      (1L, ts(1), "completely unrelated text about engines and query planners, long enough to clear the fifty character window threshold easily"),
      (2L, ts(2), "too short"))
    val in = MemoryStream[(Long, Timestamp, String)]
    val docs = in.toDF().toDF("doc_id", "ts", "text")
    val df = DedupStream.substringContaminationFlag(docs, "doc_id", "text", "ts", evalGrams)
    val q = df.writeStream.format("memory").queryName("substr_contam_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(streamed: _*)
      q.processAllAvailable()
      in.addData((0L, ts(3), s"$quote again")) // same id re-arrives
      q.processAllAvailable()
      val flagged = spark.table("substr_contam_out").collect().map(_.getLong(0))
      assert(flagged.toSeq == Seq(0L), flagged.mkString(", "))
      // BATCH PARITY: the stream's flag set equals the batch exact-substring
      // probe's hit_grams > 0 rows over the same (first-arrival) corpus
      val batchDocs = streamed.map { case (id, _, t) => (id, t) }.toDF("doc_id", "text")
      val batchFlags = Dedup.substringContamination(batchDocs, evalDocs, "doc_id", "text")
        .where(col("hit_grams") > 0).select("doc_id")
        .collect().map(_.getLong(0)).toSeq.sorted
      assert(batchFlags == flagged.toSeq.sorted)
      // row-local probe: the only stateful operator is the per-doc dedup
      val logical = df.queryExecution.logical.toString
      assert(logical.contains("DeduplicateWithinWatermark"), logical)
    } finally q.stop()
  }

  test("bloomContaminationFlag: superset of exact flags, no aggregation state") {
    import graft.ext.Dedup
    val evalSh = Dedup.shingles(
      Seq((100L, "the quick brown fox jumps")).toDF("doc_id", "text"),
      "doc_id", "text")
    val bits = Dedup.bloomBits(evalSh.select("sh"))
    val in = MemoryStream[(Long, Timestamp, String)]
    val docs = in.toDF().toDF("doc_id", "ts", "text")
    val df = DedupStream.bloomContaminationFlag(docs, "doc_id", "text", "ts", bits)
    val q = df.writeStream.format("memory").queryName("bloom_contam_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        (0L, ts(0), "here the quick brown fox appears again"), // true hit
        (1L, ts(1), "completely unrelated text about engines today ok"),
        (2L, ts(2), "too short"))
      q.processAllAvailable()
      in.addData((0L, ts(3), "the quick brown fox jumps")) // same id again
      q.processAllAvailable()
      val flagged = spark.table("bloom_contam_out").collect().map(_.getLong(0))
      // the exact-probe hit is flagged (no false negatives) exactly once;
      // this fixture's clean docs carry no false positives
      assert(flagged.toSeq == Seq(0L), flagged.mkString(", "))
      // the conjunction is k semi-joins, not a stateful aggregate: the
      // only stateful operator in the logical plan is the per-doc flag
      // dedup (no Aggregate node anywhere)
      val logical = df.queryExecution.logical.toString
      assert(!logical.contains("Aggregate"), logical)
      assert(logical.contains("DeduplicateWithinWatermark"), logical)
    } finally q.stop()
  }

  test("nearDupDetect end-to-end matches batch minHashDups across micro-batches") {
    val dir = java.nio.file.Files.createTempDirectory("graft-neardup").toString
    val corpus = Seq(
      0L -> "the quick brown fox jumps over the lazy dog today",
      1L -> "the quick brown fox jumps over the lazy dog today",
      2L -> "the quick brown fox jumps over the sleepy dog today",
      3L -> "completely different words about spark query engines here now")
    val in = MemoryStream[(Long, String)]
    val docs = in.toDF().toDF("doc_id", "text")
    val q = DedupStream.nearDupDetect(docs, "doc_id", "text", dir, minJaccard = 0.2)
      .outputMode(OutputMode.Append).start()
    try {
      // split so every dup pair crosses the batch boundary at least once:
      // (0,1) and (1,2) are cross-batch, (0,2) is in-batch
      in.addData(corpus(0), corpus(2))
      q.processAllAvailable()
      in.addData(corpus(1), corpus(3))
      q.processAllAvailable()
      val streamed = spark.read.parquet(s"$dir/dups")
        .select("doc0", "doc1", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val batch = graft.ext.Dedup.minHashDups(
          corpus.toDF("doc_id", "text"), "doc_id", "text", minJaccard = 0.2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty) // the planted dups actually surfaced
    } finally q.stop()
  }

  test("nearDupBatch replay with the same batchId is idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("graft-replay").toString
    val corpus = Seq(
      0L -> "the quick brown fox jumps over the lazy dog today",
      1L -> "the quick brown fox jumps over the lazy dog today",
      2L -> "the quick brown fox jumps over the sleepy dog today",
      3L -> "completely different words about spark query engines here now")
    val b1 = Seq(corpus(0), corpus(2)).toDF("doc_id", "text")
    val b2 = Seq(corpus(1), corpus(3)).toDF("doc_id", "text")
    DedupStream.nearDupBatch(b1, "doc_id", "text", dir, 0.2, batchId = 0L)
    DedupStream.nearDupBatch(b2, "doc_id", "text", dir, 0.2, batchId = 1L)
    // crash-replay of batch 1: same batchId overwrites its own partition
    DedupStream.nearDupBatch(b2, "doc_id", "text", dir, 0.2, batchId = 1L)
    val sh = spark.read.parquet(s"$dir/shingles")
    assert(sh.count() == sh.dropDuplicates("doc_id", "sh").count())
    val streamed = spark.read.parquet(s"$dir/dups")
      .select("doc0", "doc1", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = graft.ext.Dedup.minHashDups(
        corpus.toDF("doc_id", "text"), "doc_id", "text", minJaccard = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch)
  }

  test("minHashSignatures emits one signature row per doc per batch") {
    val in = MemoryStream[(Long, String)]
    val docs = in.toDF().toDF("doc_id", "text")
    var seen = Map.empty[Long, Long] // batchId -> row count
    val q = DedupStream.minHashSignatures(docs, "doc_id", "text") { (sigs, id) =>
      seen += id -> sigs.count()
    }.outputMode(OutputMode.Append).start()
    try {
      in.addData((0L, "the quick brown fox jumps"), (1L, "lazy dogs sleep all day long"))
      q.processAllAvailable()
      assert(seen.values.sum == 2)
      val cols = {
        val probe = graft.ext.Dedup.minHashSignatures(
          graft.ext.Dedup.shingles(Seq((9L, "a b c d")).toDF("doc_id", "text"), "doc_id", "text"))
        probe.columns.toSet
      }
      assert(cols.contains("sig_0") && cols.contains("sig_15"))
    } finally q.stop()
  }

  test("shingle-less re-ingest supersedes the old version everywhere") {
    import graft.ext.Dedup
    val dir = java.nio.file.Files.createTempDirectory("graft-shingleless").toString
    val longText = "the quick brown fox jumps over the lazy dog today"
    // batch 0: docs 1 and 2 are near-dups
    DedupStream.nearDupBatch(
      Seq(1L -> longText, 2L -> longText).toDF("doc_id", "text"),
      "doc_id", "text", dir, 0.2, batchId = 0L)
    // batch 1: doc 1 re-ingested with a 2-token text — NO shingle rows
    // are written, so only the seen/ roster records the new version
    DedupStream.nearDupBatch(
      Seq(1L -> "too short").toDF("doc_id", "text"),
      "doc_id", "text", dir, 0.2, batchId = 1L)
    // the dead version's shingles are invisible ...
    val curSh = DedupStream.currentShingles(spark, dir)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(curSh == Set(2L), s"doc 1's superseded shingles leaked: $curSh")
    // ... its stale pair is invalidated ...
    assert(DedupStream.currentPairs(spark, dir).count() == 0L)
    // ... a later batch never sees the dead version as history ...
    DedupStream.nearDupBatch(
      Seq(3L -> longText).toDF("doc_id", "text"),
      "doc_id", "text", dir, 0.2, batchId = 2L)
    val pairs = DedupStream.currentPairs(spark, dir)
      .select("doc0", "doc1").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((2L, 3L)), s"dead version resurfaced in pairing: $pairs")
    // ... and compaction reclaims it from disk entirely
    DedupStream.compactIndex(spark, dir, minJaccard = 0.2)
    val onDisk = spark.read.parquet(s"$dir/shingles")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(onDisk == Set(2L, 3L), onDisk)
  }

  test("cleanStream: dedup + quality + bloom gates compose on one stream") {
    import graft.ext.Dedup
    // the eval corpus whose trigrams must never reach training
    val evalDocs = Seq((100L, "the quick brown fox jumps over walls"))
      .toDF("doc_id", "text")
    val bits = Dedup.bloomBits(Dedup.shingles(evalDocs, "doc_id", "text"))
      .collect().map(_.getLong(0)).toSeq
    val in = MemoryStream[(Long, Timestamp, String)]
    val docs = in.toDF().toDF("doc_id", "ts", "text")
    val q = DedupStream.cleanStream(docs, "doc_id", "text", "ts", bits,
      minTokens = 4, maxTokens = 100, minAvgTokenLen = 1.0,
      maxAvgTokenLen = 20.0, maxStopwordRatio = 1.0, minTtr = 0.01)
      .writeStream.format("memory").queryName("clean_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        (0L, ts(0), "perfectly ordinary training document here"), // keeps
        (1L, ts(1), "perfectly ordinary training document here"), // exact dup
        (2L, ts(2), "too short"),                                 // quality gate
        (3L, ts(3), "we saw the quick brown fox jumps today"))    // contaminated
      q.processAllAvailable()
      in.addData((4L, ts(4), "another clean and unique document arrives"))
      q.processAllAvailable()
      val kept = spark.table("clean_out").collect()
        .map(r => r.getAs[Long]("doc_id")).sorted.toSeq
      assert(kept == Seq(0L, 4L), kept.mkString(", "))
      // cross-check gate 3 against the batch Bloom decontaminator: the
      // doc the stream dropped is exactly the one batch flags
      val streamed = Seq(
        (0L, "perfectly ordinary training document here"),
        (2L, "too short"),
        (3L, "we saw the quick brown fox jumps today"),
        (4L, "another clean and unique document arrives"))
        .toDF("doc_id", "text")
      val batchFlagged = Dedup.bloomContamination(streamed, evalDocs,
        "doc_id", "text").where($"flagged_shingles" > 0)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(batchFlagged == Set(3L), batchFlagged.mkString(", "))
    } finally q.stop()
  }

  test("compactIndex drops superseded versions and their stale pairs") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val oldText = "the quick brown fox jumps over the lazy dog today"
    val newText = "totally rewritten content about streaming index compaction logic"
    // batch 0: docs 0 and 1 are near-dups
    DedupStream.nearDupBatch(
      Seq(0L -> oldText, 1L -> oldText).toDF("doc_id", "text"),
      "doc_id", "text", dir, 0.2, batchId = 0L)
    // batch 1: doc 0 re-ingested with UNRELATED text; doc 2 dups doc 1
    DedupStream.nearDupBatch(
      Seq(0L -> newText, 2L -> oldText).toDF("doc_id", "text"),
      "doc_id", "text", dir, 0.2, batchId = 1L)
    // pre-compaction the index is corrupted exactly as documented: doc 0
    // holds BOTH versions' shingles and the stale (0,1) pair is on record
    val preSh = spark.read.parquet(s"$dir/shingles")
    val newShOnly = graft.ext.Dedup.shingles(
        Seq(0L -> newText).toDF("doc_id", "text"), "doc_id", "text")
      .select("sh").collect().map(_.getLong(0)).toSet
    assert(preSh.where($"doc_id" === 0L).count() > newShOnly.size)
    DedupStream.compactIndex(spark, dir, minJaccard = 0.2)
    // index holds ONLY the latest version of doc 0
    val postSh = spark.read.parquet(s"$dir/shingles")
    assert(postSh.where($"doc_id" === 0L)
      .select("sh").collect().map(_.getLong(0)).toSet == newShOnly)
    // stale pair (0,1) gone; fresh pairs among current versions intact
    val pairs = spark.read.parquet(s"$dir/dups")
      .select("doc0", "doc1").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!pairs.contains((0L, 1L)), pairs.mkString(", "))
    assert(pairs == Set((1L, 2L)))
    // no leftover swap artifacts
    for (n <- Seq("shingles", "bands", "dups")) {
      assert(!new java.io.File(s"$dir/$n.compact").exists())
      assert(!new java.io.File(s"$dir/$n.old").exists())
    }
    // checkpoint-replay round-trip over the COMPACTED index (the ADVICE
    // interaction case): re-running batch 1 with the same batchId must
    // overwrite its own partition with identical content — same shingle
    // rows, same verified pairs, no stale-version resurrection
    val shBefore = postSh.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    DedupStream.nearDupBatch(
      Seq(0L -> newText, 2L -> oldText).toDF("doc_id", "text"),
      "doc_id", "text", dir, 0.2, batchId = 1L)
    val shAfter = spark.read.parquet(s"$dir/shingles")
      .select("doc_id", "sh").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(shAfter == shBefore)
    val pairsAfter = spark.read.parquet(s"$dir/dups")
      .select("doc0", "doc1").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairsAfter == Set((1L, 2L)), pairsAfter.mkString(", "))
  }

  test("compactIndex on a fresh or missing index is a no-op") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact-fresh").toString
    DedupStream.compactIndex(spark, dir)              // empty dir
    DedupStream.compactIndex(spark, s"$dir/absent")   // nonexistent dir
    assert(!new java.io.File(s"$dir/shingles").exists())
  }

  test("recoverIndex heals every crash window of the swap") {
    import org.apache.hadoop.fs.Path
    val fs = new Path("/").getFileSystem(spark.sessionState.newHadoopConf())
    val text = "the quick brown fox jumps over the lazy dog today"
    def freshIndex(): String = {
      val dir = java.nio.file.Files.createTempDirectory("graft-recover").toString
      DedupStream.nearDupBatch(Seq(0L -> text, 1L -> text).toDF("doc_id", "text"),
        "doc_id", "text", dir, 0.2, batchId = 0L)
      dir
    }
    def shingleCount(dir: String) = spark.read.parquet(s"$dir/shingles").count()
    // crash window 1: live renamed to .old, fully-written .compact not yet
    // swapped in — recovery must ROLL FORWARD to the compacted table
    val d1 = freshIndex()
    val n1 = shingleCount(d1)
    fs.rename(new Path(s"$d1/shingles"), new Path(s"$d1/shingles.compact"))
    fs.mkdirs(new Path(s"$d1/shingles.old")) // remnant of the displaced live dir
    DedupStream.recoverIndex(spark, d1)
    assert(shingleCount(d1) == n1)
    assert(!new java.io.File(s"$d1/shingles.compact").exists())
    assert(!new java.io.File(s"$d1/shingles.old").exists())
    // crash window 2: live renamed to .old and .compact LOST (crashed
    // before its write completed was impossible — but roll BACK anyway)
    val d2 = freshIndex()
    val n2 = shingleCount(d2)
    fs.rename(new Path(s"$d2/shingles"), new Path(s"$d2/shingles.old"))
    DedupStream.recoverIndex(spark, d2)
    assert(shingleCount(d2) == n2)
    // crash window 3: swap finished but .old not deleted — recovery drops it
    val d3 = freshIndex()
    fs.mkdirs(new Path(s"$d3/shingles.old"))
    DedupStream.recoverIndex(spark, d3)
    assert(!new java.io.File(s"$d3/shingles.old").exists())
    // and nearDupBatch self-heals: a mid-swap index still reads as history
    val d4 = freshIndex()
    fs.rename(new Path(s"$d4/shingles"), new Path(s"$d4/shingles.compact"))
    DedupStream.nearDupBatch(Seq(2L -> text).toDF("doc_id", "text"),
      "doc_id", "text", d4, 0.2, batchId = 1L)
    val pairs = spark.read.parquet(s"$d4/dups")
      .select("doc0", "doc1").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // doc 2 still pairs with the RECOVERED history, not an empty index
    assert(pairs.contains((0L, 2L)) && pairs.contains((1L, 2L)), pairs.mkString(", "))
  }
}
