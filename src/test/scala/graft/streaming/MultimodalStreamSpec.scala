package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.ext.Multimodal

/** The codec seam is a stateless partition-batched map — it must run
  * unchanged on an unbounded stream of payloads (the ingest shape of a
  * multimodal crawl: decode-and-featurize as blobs arrive, no batch
  * boundary). Parity: streamed decode stats equal batch decode stats
  * row-for-row on the same planted PNG payloads. */
class MultimodalStreamSpec extends SparkSpec {
  implicit lazy val s: SparkSession = spark
  import s.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("imageStats: the real ImageIO decode runs on an unbounded stream") {
    val ids = (1L to 12L).toSeq
    val batch = Multimodal.imageStats(
        ids.map(id => (id, Multimodal.plantedPng(id))).toDF("doc_id", "payload"),
        "doc_id", "payload")
      .collect().map(r => (r.doc_id, r.width, r.height, r.r_sum, r.g_sum, r.b_sum))
      .toSet

    val in = MemoryStream[(Long, Array[Byte])]
    val q = Multimodal.imageStats(
        in.toDS().toDF("doc_id", "payload"), "doc_id", "payload")
      .writeStream.format("memory").queryName("mm_stream")
      .outputMode("append").start()
    try {
      // one corrupt blob rides along — dropped on the stream exactly as
      // in batch (the seam's documented tolerance), never a crash
      in.addData(ids.take(6).map(id => (id, Multimodal.plantedPng(id))) :+
        (99L, Array[Byte](1, 2, 3)))
      q.processAllAvailable()
      in.addData(ids.drop(6).map(id => (id, Multimodal.plantedPng(id))))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("mm_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(4), r.getLong(5), r.getLong(6)))
      .toSet
    assert(streamed == batch)
  }
}
