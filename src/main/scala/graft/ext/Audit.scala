package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Pipeline-health diagnostics: operators that inspect the DATA for the
 * properties the engine's physical plans depend on.
 */
object Audit {

  /**
   * Key-skew audit — the diagnostic behind every salting/AQE decision in
   * this library ([[graft.core.CosineAnalysis]]'s `alignedPairsSalted`,
   * AQE skew-join): for a prospective shuffle key, the `topN` heaviest
   * key values with their row counts, their fraction of the table, and a
   * dense total order (`rank`). A top key holding ≥ a few percent of a
   * 100 TB table is the straggler partition that decides whether the
   * plain equi-join shape is safe or the salted variant is needed — this
   * query answers that BEFORE the expensive job runs, on the same
   * engine, for the cost of one aggregate.
   *
   * Scale shape: one hash aggregate keyed by the audited column
   * (map-side partials make the heavy keys cheap to count — each
   * partition contributes one partial row per key), a TakeOrdered top-N
   * cut (per-partition top-N, no global sort), and the 1-row grand
   * total broadcast over the `topN`-row slice — the same sanctioned
   * scalar-broadcast BNLJ shape as the corpus-size scalar in tf-idf
   * (1 × topN rows; nothing corpus-sized crosses it). The final rank
   * window runs on `topN` rows.
   */
  def skewAudit(df: DataFrame, keyCol: String, topN: Int = 20): DataFrame = {
    require(topN >= 1)
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n"))
    val top = counts
      .orderBy(col("n").desc, col("key").asc)
      .limit(topN)
    val total = counts.agg(sum(col("n")).as("total"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("key").asc)
    top.crossJoin(broadcast(total))
      .select(col("key"), col("n"),
        (col("n").cast("double") / col("total")).as("fraction"))
      .withColumn("rank", row_number().over(w).cast("long"))
  }

  /**
   * Corpus snapshot diff — the audit run between two versions of a
   * corpus (before/after a recrawl, a scrub, a dedup sweep): every
   * doc_id present in either snapshot, classified `added` (new only),
   * `removed` (old only), `changed` (both, different text), or
   * `unchanged`. The table incremental pipelines reconcile against —
   * "the scrub claims it only removed documents; did anything CHANGE?"
   * — and the input to incremental re-indexing (only `added`/`changed`
   * docs need re-shingling).
   *
   * Scale shape: texts collapse to fixed-width sha256 map-side, so the
   * full-outer join shuffles (id, 64-char hash) rows only — never the
   * documents themselves. One exchange per side, keyed by doc_id;
   * output is union-of-ids-sized. Comparing by content hash makes the
   * diff order-insensitive and collision-safe at 2⁻¹²⁸.
   */
  def corpusDiff(oldDocs: DataFrame, newDocs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    def hashed(df: DataFrame, as: String) =
      df.select(col(idCol).as("doc_id"),
        sha2(col(textCol).cast("binary"), 256).as(as))
    hashed(oldDocs, "h_old")
      .join(hashed(newDocs, "h_new"), Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("h_old").isNull, "added")
          .when(col("h_new").isNull, "removed")
          .when(col("h_old") === col("h_new"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /**
   * Versioned-snapshot MERGE resolution — the `MERGE INTO` / CDC-upsert
   * semantics of table formats (Delta, Iceberg) expressed engine-side
   * over a plain append-only commit log: `commits` holds one row per
   * (key, version) with an op column (`'D'` = tombstone, anything else
   * = upsert) and arbitrary payload columns; the current snapshot is,
   * per key, the highest-version row — dropped entirely when that
   * winning row is a tombstone. [[corpusDiff]] answers "what changed
   * between two snapshots"; this materializes the snapshot itself from
   * the change history. Versions must be unique per key (the commit-log
   * invariant every table format already enforces); ties would make the
   * winner nondeterministic.
   *
   * Scale shape: ONE key-shuffled arg-max aggregate (`max_by` over the
   * payload struct) with map-side partials — each mapper pre-reduces
   * its slice to one candidate per key before the exchange, so the
   * shuffle carries ≤ one row per (mapper, key), not the commit log.
   * No window sort over the log (the row_number spelling re-sorts every
   * partition; the aggregate never does), and the tombstone filter is a
   * result-sized map stage.
   */
  def mergeSnapshots(commits: DataFrame, keyCol: String,
      versionCol: String, opCol: String): DataFrame = {
    val payload = commits.columns.filter(_ != keyCol)
    commits.groupBy(col(keyCol))
      .agg(max_by(struct(payload.map(col).toSeq: _*),
        col(versionCol)).as("w"))
      .select(col(keyCol) +: payload.map(c => col(s"w.$c").as(c)): _*)
      .where(col(opCol) =!= "D")
  }
}
