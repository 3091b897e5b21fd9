package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.ext.{Dedup, TextAnalysis}

/**
 * Pins the row-local design claim end-to-end: every per-document text
 * operator that is a pure map stage (array HOFs, no explode + groupBy,
 * no window) runs UNCHANGED on an unbounded stream — the same function
 * applied to a streaming DataFrame in append mode, batch-parity checked
 * through a memory sink. This is what the HOF spelling buys beyond the
 * removed shuffle: per-doc quality/PII/language/fingerprint gating can
 * run at INGEST time with zero state. Corpus-level operators
 * (vocabTopK, quantiles, spanStats, ...) are deliberately absent — their
 * streaming stories need watermarked state (DedupStream / EventsStream).
 */
class TextOpsStreamSpec extends SparkSpec {
  implicit lazy val s: SparkSession = spark
  import s.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val rows = Seq(
    (0L, "the quick brown fox jumps over the lazy dog with me a b c"),
    (1L, "reach me at bob@example.com or 10.0.0.1 soon please now ok"),
    (2L, "le chat et le chien sont dans la maison avec nous aussi"),
    (3L, "short text"))

  private def streamed(fn: DataFrame => DataFrame, name: String): Seq[String] = {
    val in = MemoryStream[(Long, String)]
    val q = fn(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(rows.take(2): _*)
      q.processAllAvailable()
      in.addData(rows.drop(2): _*)
      q.processAllAvailable()
      spark.table(name).collect().map(_.toString).sorted.toSeq
    } finally q.stop()
  }

  private def batch(fn: DataFrame => DataFrame): Seq[String] =
    fn(rows.toDF("doc_id", "text")).collect().map(_.toString).sorted.toSeq

  test("per-doc text ops are stream-native map stages with batch parity") {
    val ops: Seq[(String, DataFrame => DataFrame)] = Seq(
      ("t_stats", TextAnalysis.stats(_, "doc_id", "text")),
      ("t_qf", TextAnalysis.qualityFilter(_, "doc_id", "text")),
      ("t_langid", TextAnalysis.langId(_, "doc_id", "text")),
      ("t_tok", TextAnalysis.tokenCounts(_, "doc_id", "text")),
      ("t_fp", TextAnalysis.fingerprint(_, "doc_id", "text")),
      ("t_rep", TextAnalysis.repetition(_, "doc_id", "text")),
      ("t_pii", TextAnalysis.piiScrub(_, "doc_id", "text")),
      ("t_cjk", graft.text.Tokenizer.tokensCjk(_, "doc_id", "text")),
      ("t_sh", Dedup.shinglesLocal(_, "doc_id", "text")),
      // split assignment at INGEST time: a doc's split is a pure function
      // of (id, salt), so the stream form trivially matches batch
      ("t_split", graft.ext.Export.splitAssign(_, "doc_id")),
      // entropy's sorted-run fold is row-local like repetition's
      ("t_ent", TextAnalysis.tokenEntropy(_, "doc_id", "text")),
      // scoring under FIXED fitted weights is a pure map stage — the
      // ingest-time form of the distilled quality gate
      ("t_lr", graft.ext.QualityModel.score(_, "doc_id", "text",
        graft.ext.QualityModel.Features.zipWithIndex
          .map { case (f, i) => f -> (0.1 * (i + 1)) }.toMap)))
    for ((name, fn) <- ops) {
      val got = streamed(fn, name)
      val want = batch(fn)
      assert(got.nonEmpty && got == want, s"$name stream/batch divergence")
    }
  }

  test("hllSketch streams in complete mode: batch parity, m-bounded state") {
    // register maxes commute, so complete-mode aggregation maintains the
    // identical sketch with state bounded at groups × 64 rows
    val in = MemoryStream[(Long, String)]
    val q = graft.ext.TextAnalysis
      .hllSketch(in.toDF().toDF("doc_id", "text"), "doc_id", "text")
      .writeStream.format("memory").queryName("t_hll")
      .outputMode(OutputMode.Complete).start()
    try {
      in.addData(rows.take(2): _*)
      q.processAllAvailable()
      in.addData(rows.drop(2): _*)
      q.processAllAvailable()
      val got = spark.table("t_hll").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
      val want = graft.ext.TextAnalysis
        .hllSketch(rows.toDF("doc_id", "text"), "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
      assert(want.nonEmpty && got == want, "stream/batch HLL divergence")
      assert(got.groupBy(_._1._1).forall(_._2.size <= 64),
        "state exceeds the m-register bound")
    } finally q.stop()
  }

  test("cmsSketch streams in complete mode: batch parity, d*w-bounded state") {
    // the one corpus-level aggregate here whose streaming state is
    // bounded BY CONSTRUCTION (d*w counters), so it needs no watermark
    val (depth, width) = (3, 8)
    val in = MemoryStream[(Long, String)]
    val q = TextAnalysis
      .cmsSketch(in.toDF().toDF("doc_id", "text"), "doc_id", "text", depth, width)
      .writeStream.format("memory").queryName("t_cms")
      .outputMode(OutputMode.Complete).start()
    try {
      in.addData(rows.take(2): _*)
      q.processAllAvailable()
      in.addData(rows.drop(2): _*)
      q.processAllAvailable()
      val got = spark.table("t_cms").collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      val want = TextAnalysis
        .cmsSketch(rows.toDF("doc_id", "text"), "doc_id", "text", depth, width)
        .collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(want.nonEmpty && got == want, "stream/batch sketch divergence")
      assert(got.size <= depth * width, "state exceeds the d*w counter bound")
      assert(got.values.sum == rows.map(_._2.split("\\s+").count(_.nonEmpty)).sum.toLong * depth,
        "every token occurrence increments exactly one counter per row")
    } finally q.stop()
  }
}
