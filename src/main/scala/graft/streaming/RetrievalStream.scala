package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.Retrieval
import graft.ext.Retrieval.Bm25Stats

/**
 * Streaming retrieval: a STATIC inverted index ([[Retrieval.bm25Index]],
 * built once from the corpus), QUERIES streaming — the live-search shape
 * (the index changes on corpus rebuilds; queries arrive forever). The
 * stream-static equi-join is Spark's natural spelling for it: no state is
 * kept for the static side, and the only streaming state is the
 * watermark-bounded (query, doc) aggregation of per-term contributions.
 *
 * Scale shape: per micro-batch, exploded query terms equi-join the
 * term-partitioned postings (each query touches only its terms' posting
 * lists — the inverted-index contract), then ONE (query, doc) aggregate
 * with map-side partials. State is bounded by in-flight queries × their
 * candidate docs inside the watermark horizon, independent of corpus
 * size or stream history.
 */
object RetrievalStream {

  /**
   * BM25 scores for streaming queries against a static index. `queries`
   * is a streaming DataFrame (query_id, ts, terms: array<string>); each
   * query row is self-contained, watermark-finalized in append mode, and
   * scored with the same [[Retrieval.bm25Contrib]] arithmetic as the
   * batch twin [[Retrieval.bm25ScoreQueries]] (per-term values are
   * bit-identical; only the Σ-over-terms order is engine-scheduled).
   * Emits (query_id, doc_id, score) for every document matching ≥ 1
   * query term — ranking/top-k is the consumer's cut, exactly as
   * [[Retrieval.bm25TopK]] layers it over raw scores.
   */
  def bm25Scores(queries: DataFrame, postings: DataFrame, stats: Bm25Stats,
      k1: Double = 1.2, b: Double = 0.75,
      watermark: String = "10 seconds"): DataFrame =
    queries
      .withWatermark("ts", watermark)
      .select(col("query_id"), col("ts"), explode(col("terms")).as("term"))
      .join(postings, Seq("term"))
      .groupBy(col("query_id"), col("ts"), col("doc_id"))
      .agg(sum(Retrieval.bm25Contrib(stats, k1, b)).as("score"))
      .select("query_id", "doc_id", "score")
}
