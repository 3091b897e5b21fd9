package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.ext.Retrieval

/**
 * Stream-static BM25 twin ([[RetrievalStream.bm25Scores]]): static
 * inverted index, streaming queries, watermark-finalized (query, doc)
 * scores — batch-parity-checked against [[Retrieval.bm25ScoreQueries]]
 * and against the original literal-terms [[Retrieval.bm25TopK]].
 */
class RetrievalStreamSpec extends SparkSpec {
  implicit lazy val s: SparkSession = spark
  import s.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private lazy val docs = Seq(
    (0L, "spark shuffles data across the cluster for wide operators"),
    (1L, "broadcast joins avoid the shuffle for small dimension tables"),
    (2L, "the optimizer prunes columns and pushes filters to the scan"),
    (3L, "watermarks bound streaming state for late data"),
    (4L, "spark spark spark repeated term density test data")
  ).toDF("doc_id", "text")

  private lazy val postings = Retrieval.bm25Index(docs, "doc_id", "text")
  private lazy val stats = Retrieval.bm25CorpusStats(docs, "doc_id", "text")

  private val queries = Seq(
    (100L, Seq("spark", "shuffle")),
    (101L, Seq("data", "streaming", "state")),
    (102L, Seq("spark", "spark")), // duplicate terms count per occurrence
    (103L, Seq("nosuchterm")))     // matches nothing → no rows

  test("bm25Index: postings carry exact tf/dl/df") {
    val p = postings.collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // "spark" appears 1x in doc 0, 3x in doc 4 → df = 2
    assert(p(("spark", 0L)) == ((1L, 9L, 2L)))
    assert(p(("spark", 4L)) == ((3L, 8L, 2L)))
    // "the" in docs 0, 1, 2 → df = 3
    assert(p(("the", 2L))._3 == 3L)
    assert(stats.nDocs == 5L)
  }

  test("streaming scores match the batch index scorer exactly per term-sum") {
    val in = MemoryStream[(Long, Timestamp, Seq[String])]
    val q = RetrievalStream.bm25Scores(
      in.toDF().toDF("query_id", "ts", "terms"), postings, stats,
      watermark = "5 seconds")
      .writeStream.format("memory").queryName("bm25_stream")
      .outputMode(OutputMode.Append).start()
    try {
      val t0 = 1700000000000L
      in.addData(queries.take(2).map { case (id, t) => (id, new Timestamp(t0), t) }: _*)
      q.processAllAvailable()
      in.addData(queries.drop(2).map { case (id, t) => (id, new Timestamp(t0 + 1000), t) }: _*)
      q.processAllAvailable()
      // watermark flush: a far-future row finalizes every earlier group
      in.addData((999L, new Timestamp(t0 + 3600000L), Seq("flush")))
      q.processAllAvailable()
      val got = spark.table("bm25_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val want = Retrieval.bm25ScoreQueries(
        queries.toDF("query_id", "terms"), postings, stats).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(want.nonEmpty && got.keySet == want.keySet)
      got.foreach { case (k, v) => assertApprox(v, want(k), 1e-9) }
      // the no-match query emits nothing on either side
      assert(!got.keys.exists(_._1 == 103L))
      // duplicate query terms count per occurrence: doc 0 matches q100
      // only via "spark" (it has "shuffles", not "shuffle"), so q102's
      // ("spark","spark") score is exactly twice q100's there
      assertApprox(got((102L, 0L)), 2.0 * got((100L, 0L)), 1e-9)
    } finally q.stop()
  }

  test("index scorer agrees with the literal-terms bm25TopK ranking") {
    val terms = Seq("spark", "shuffle", "data")
    val topk = Retrieval.bm25TopK(docs, "doc_id", "text", terms, k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val viaIndex = Retrieval.bm25ScoreQueries(
      Seq((1L, terms)).toDF("query_id", "terms"), postings, stats).collect()
      .map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(topk.keySet == viaIndex.keySet)
    topk.foreach { case (d, v) => assertApprox(viaIndex(d), v, 1e-9) }
  }
}
