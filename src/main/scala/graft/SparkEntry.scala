package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.CosineAnalysis
import graft.text.Tokenizer
import graft.entry._

/**
 * Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
 *
 * `queries` holds one entry per implemented operator (SURVEY.md §2 rows plus
 * the LLM-pipeline extensions); `oracleSql` holds the DuckDB-equivalent SQL
 * for each, over the same parquet tables. Every query rounds double columns
 * to 7 decimals and totally orders its rows ([[graft.entry.EntryUtil.gate]])
 * so the driver's hash compare is deterministic across engines.
 */
object SparkEntry {

  /**
   * Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
   * The reference's end-to-end demo shape (KeyWordsDemo.scala:16–106):
   * documents → tokenize → TF matrix → dense cosine fit → all similarities.
   */
  def entry(spark: SparkSession): DataFrame = {
    implicit val s: SparkSession = spark
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val tf = Tokenizer.termFrequencyOf(docs, "doc_id", "text")
    new CosineAnalysis(spark, axis = "y")
      .fit(tf, isSparse = false)
      .allSimilarityValue
      .orderBy("vector0", "vector1")
      .toDF()
  }

  /** One entry per implemented operator from SURVEY.md §2 + extensions. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreEntries.queries ++ TextEntries.queries ++
      DedupEntries.queries ++ AnnEntries.queries ++ EventsEntries.queries ++
      RelationalEntries.queries

  /** DuckDB-equivalent SQL per query key (same column names, same order). */
  def oracleSql: Map[String, String] =
    CoreEntries.oracles ++ TextEntries.oracles ++
      DedupEntries.oracles ++ AnnEntries.oracles ++ EventsEntries.oracles ++
      RelationalEntries.oracles
}
