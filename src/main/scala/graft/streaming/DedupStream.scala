package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

import graft.ext.Dedup

/**
 * Streaming deduplication for document ingest pipelines.
 *
 * Two shapes, matching what Structured Streaming can express:
 *
 *   - Exact dedup is STREAMING-NATIVE: `dropDuplicates` keyed on the text
 *     (or a content hash) is Spark's stateful dedup operator; the
 *     event-time watermark bounds the dedup state, which is the only way
 *     unbounded-stream dedup can run forever (state for documents older
 *     than the watermark is dropped — a document repeated after the
 *     horizon re-emits, the standard streaming trade-off).
 *
 *   - Near-dup (MinHash) needs per-document shingling with window
 *     functions, which streaming cannot run directly; the idiomatic
 *     pattern is `foreachBatch`: each micro-batch is a normal DataFrame,
 *     so the batch operators ([[graft.ext.Dedup.minHashSignatures]]) run
 *     unchanged and the signatures land in an LSH bucket index that an
 *     external join/compaction job (or the batch pipeline) consumes.
 */
object DedupStream {

  /**
   * Exact-duplicate removal on an unbounded document stream: first
   * occurrence of each text within the watermark horizon passes through.
   * `docs` must carry an event-time column named by `tsCol`.
   */
  def exactDedup(docs: DataFrame, textCol: String, tsCol: String,
      watermark: String = "1 hour"): DataFrame =
    docs
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(textCol)

  /**
   * Per-micro-batch MinHash signature extraction: runs the batch
   * signature pipeline on every arriving batch and hands the result to
   * `sink` (write to the signature index, run LSH bucket joins, etc.).
   */
  def minHashSignatures(docs: DataFrame, idCol: String, textCol: String)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      sink(Dedup.minHashSignatures(Dedup.shingles(batch, idCol, textCol)), batchId)
    }
}
