package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed metadata for one media payload. */
final case class MediaFeatures(doc_id: Long, n_bytes: Long, feature: Array[Float])

/**
 * Multimodal column plumbing: media (image/audio/video) travel through the
 * pipeline as opaque `binary` columns with typed metadata; decode and
 * feature extraction run batched per partition.
 *
 * The real decode step needs codec libraries this environment does not
 * ship, so [[StubDecoder]] is a clearly-marked deterministic fake — the
 * Spark-side plumbing (binary column, partition batching, schema of the
 * decoded output) is real and tested, and a production codec drops in by
 * implementing [[MediaDecoder]].
 */
object Multimodal {

  /** Pack a text column into a binary payload column (UTF-8). */
  def withPayload(docs: DataFrame, textCol: String,
      payloadCol: String = "payload"): DataFrame =
    docs.withColumn(payloadCol, encode(col(textCol), "UTF-8"))

  /**
   * Pure-SQL payload metadata: byte length plus a position-weighted
   * checksum of the first 16 header bytes (the shape of magic-number /
   * container-header sniffing, kept in exact integer math).
   */
  def metadata(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    withPayload(docs, textCol)
      .select(
        col(idCol).as("doc_id"),
        length(col("payload")).cast("long").as("n_bytes"),
        expr(
          s"aggregate(transform(sequence(1, least(16, length($textCol))), " +
            s"i -> CAST(ascii(substr($textCol, i, 1)) * i AS BIGINT)), " +
            "CAST(0 AS BIGINT), (a, x) -> a + x)").as("header_sum"))

  /**
   * Frame-sample a payload WITHOUT decoding it: the payload is framed as
   * fixed `frameChars`-character windows (the shape of fixed-length
   * record containers) and every `stride`-th frame becomes its own
   * binary record. Pure SQL — the sample prunes frames BEFORE any
   * decoder touches them, which is the point at scale: a 1-in-30 frame
   * sample of a video corpus does 1/30th of the decode work, and the
   * emitted rows feed [[decodeFeatures]] unchanged. Trailing partial
   * frames are dropped (container semantics); payloads shorter than one
   * frame emit nothing. Framing is character-based so the DuckDB oracle
   * can mirror it exactly (its BLOBs have no substring).
   */
  def sampleFrames(docs: DataFrame, idCol: String, textCol: String,
      frameChars: Int = 16, stride: Int = 4): DataFrame = {
    require(frameChars > 0 && stride > 0)
    docs
      .select(col(idCol).as("doc_id"), col(textCol).as("t"))
      .withColumn("nf", (length(col("t")) / frameChars).cast("int"))
      .where(col("nf") >= 1)
      .select(col("doc_id"),
        explode(expr(
          s"transform(filter(sequence(0, nf - 1), f -> f % $stride = 0), " +
            s"f -> struct(CAST(f AS BIGINT) AS frame_no, " +
            s"encode(substring(t, f * $frameChars + 1, $frameChars), 'UTF-8') AS frame))"))
          .as("fr"))
      .select(col("doc_id"), col("fr.frame_no").as("frame_no"), col("fr.frame").as("frame"))
  }

  /** Batched payload → fixed-width feature decoder. */
  trait MediaDecoder extends Serializable {
    def dim: Int
    def decode(payload: Array[Byte]): Array[Float]
  }

  /**
   * STUB — deterministic fake standing in for a real image/audio codec
   * (not available offline). Produces a `dim`-width feature from byte
   * statistics so downstream plumbing is exercised with stable values.
   */
  final class StubDecoder(val dim: Int = 8) extends MediaDecoder {
    def decode(payload: Array[Byte]): Array[Float] = {
      val out = new Array[Float](dim)
      var i = 0
      while (i < payload.length) {
        out(i % dim) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      out
    }
  }

  /**
   * Decode payloads to feature vectors, batched per partition (the Scala
   * analogue of a pandas-batched UDF: one decoder instance per partition,
   * rows streamed through it, no per-row driver round-trips).
   */
  def decodeFeatures(df: DataFrame, idCol: String, payloadCol: String,
      decoder: MediaDecoder = new StubDecoder())(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          MediaFeatures(id, payload.length.toLong, decoder.decode(payload))
        }
      }
  }
}
