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
}
