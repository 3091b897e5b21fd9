package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Keyword retrieval over the documents table — the lookup half of a
 * training-data pipeline (find the documents about X before inspecting,
 * scrubbing, or decontaminating them). The reference engine's own demo is
 * document similarity over a doc×term matrix (reference
 * KeyWordsDemo.scala:15–106); BM25 is the standard relevance weighting of
 * exactly that matrix, so it slots in as a first-class query rather than
 * an external search system.
 *
 * Scale shape: the per-document half (term frequencies, document length)
 * is row-local — a pure codegen'd map stage over any corpus size. The
 * corpus half (N, avgdl, per-term document frequencies) aggregates to ONE
 * row, re-attached with the same sanctioned 1-row scalar broadcast
 * [[graft.text.Tokenizer.tfIdf]] uses (a BroadcastNestedLoopJoin whose
 * build side is a single row is a scalar broadcast, not a pair surface).
 * The query-term set is a compile-time literal list (a user types a
 * handful of terms), so nothing about the query grows with the corpus:
 * one aggregate + one broadcast + one TakeOrdered.
 */
object Retrieval {

  /**
   * BM25 top-k document retrieval for a literal bag of query terms.
   *
   * Per document `d` with length `dl` (whitespace tokens) and per query
   * term `t` with document frequency `df`:
   *
   *   idf(t)     = ln(1 + (N - df + 0.5) / (df + 0.5))       (Robertson/Lucene)
   *   score(d)   = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))
   *
   * Documents matching no term (score 0) are dropped; ties at the cut
   * break on `doc_id` ascending. Every score is the same fixed-order
   * sequence of IEEE ops on exactly-aggregated integers in any engine,
   * so the ranking (and the oracle hash) is reproducible bit-for-bit.
   */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    // row-local: dl + one tf column per query term (map stage, no explode)
    val tfCols = queryTerms.zipWithIndex.map { case (t, i) =>
      val lit = sqlLit(t)
      expr(s"size(filter(t, x -> x = $lit))").cast("long").as(s"tf_$i")
    }
    val perDoc = TextAnalysis.tokenArray(docs, idCol, textCol)
      .select(col("doc_id") +: size(col("t")).cast("long").as("dl") +: tfCols: _*)
    // corpus stats collapse to ONE row: N, Σdl, df per term
    val dfAggs = queryTerms.indices.map(i =>
      sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i"))
    val aggCols = count(lit(1)).as("n_docs") +: sum(col("dl")).as("sum_dl") +: dfAggs
    val stats = perDoc.agg(aggCols.head, aggCols.tail: _*)
    // sanctioned 1-row scalar broadcast (cf. Tokenizer.tfIdf)
    val joined = perDoc.crossJoin(broadcast(stats))
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val score = queryTerms.indices.map { i =>
      val tf = col(s"tf_$i").cast("double")
      val df = col(s"df_$i").cast("double")
      val idf = log(lit(1.0) +
        (col("n_docs").cast("double") - df + lit(0.5)) / (df + lit(0.5)))
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / avgdl))
    }.reduce[Column](_ + _)
    joined
      .select(col("doc_id"), col("dl"), score.as("score"))
      .where(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Single-quoted SQL string literal (term lists are caller-supplied). */
  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"
}
