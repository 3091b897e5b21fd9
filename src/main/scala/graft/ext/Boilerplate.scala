package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Segment-level boilerplate removal — the CCNet/Dolma-style cleaning pass
 * that strips repeated navigation chrome, cookie banners, and template
 * footers from crawled text BEFORE document-level dedup sees it (a shared
 * footer inflates document similarity and drags distinct pages into one
 * near-dup cluster; scrubbing it first is what makes MinHash thresholds
 * meaningful on web corpora).
 *
 * The rule is document frequency at SEGMENT granularity: split each
 * document into segments (lines / paragraphs / `delimRegex` units), count
 * how many distinct documents each normalized segment occurs in, and drop
 * every segment whose df exceeds `maxDf` — the segment-level twin of the
 * shingle df-cap on the dedup kernels ([[Dedup]] `maxDf`) and `dfCap` on
 * the cosine path ([[graft.core.CosineAnalysis]]).
 *
 * Scale shape: the df table is ONE (segment-keyed) count-distinct
 * aggregate; the boilerplate SLICE of it is bounded by construction —
 * each boilerplate segment occurs in > `maxDf` docs, so there are fewer
 * than totalSegments / maxDf of them (with maxDf a fraction of the corpus
 * that is model-sized at any scale) — and broadcasts into a left join
 * against the segment stream. Reassembly is one groupBy(doc) with an
 * in-row `array_sort` — per-doc fan-in is the doc's own segment count.
 * No driver-side actions anywhere; the whole pass is one lazy plan.
 */
object Boilerplate {

  /**
   * Explode documents into trimmed, non-empty segments with their
   * original position: (idCol, pos, seg). Position survives so
   * reassembly preserves document order.
   */
  def segments(docs: DataFrame, idCol: String, textCol: String,
      delimRegex: String): DataFrame =
    docs
      .select(col(idCol),
        posexplode(split(col(textCol), delimRegex)).as(Seq("pos", "seg")))
      .withColumn("seg", trim(col("seg")))
      .where(length(col("seg")) > 0)
      .withColumn("pos", col("pos").cast("long"))

  /**
   * The boilerplate vocabulary: segments occurring in more than `maxDf`
   * distinct documents, with their df. Bounded: < totalSegments / maxDf
   * rows (each costs > maxDf occurrences).
   */
  def boilerplateSegments(segs: DataFrame, idCol: String,
      maxDf: Long): DataFrame = {
    require(maxDf >= 1, s"maxDf must be >= 1, got $maxDf")
    segs.groupBy("seg")
      .agg(countDistinct(col(idCol)).as("df"))
      .where(col("df") > maxDf)
  }

  /**
   * Scrub boilerplate segments out of each document: one row per input
   * document with the segment count, how many were dropped, and the
   * document reassembled (in original segment order, joined with
   * `delimOut`) from the surviving segments. A document whose every
   * segment is boilerplate comes back with an empty `clean_text`, never
   * a missing row.
   */
  def scrub(docs: DataFrame, idCol: String, textCol: String,
      delimRegex: String, delimOut: String, maxDf: Long): DataFrame = {
    val segs = segments(docs, idCol, textCol, delimRegex)
    val boiler = boilerplateSegments(segs, idCol, maxDf)
      .select(col("seg"), lit(true).as("is_boiler"))
    val flagged = segs
      .join(broadcast(boiler), Seq("seg"), "left")
      .withColumn("drp", coalesce(col("is_boiler"), lit(false)))
    val rebuilt = flagged
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_segments"),
        sum(when(col("drp"), lit(1L)).otherwise(lit(0L))).as("n_dropped"),
        concat_ws(delimOut,
          transform(
            array_sort(collect_list(
              when(!col("drp"), struct(col("pos"), col("seg"))))),
            x => x.getField("seg"))).as("clean_text"))
    docs.select(col(idCol))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_segments"), lit(0L)).as("n_segments"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }
}
