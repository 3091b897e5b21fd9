package graft.text

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.MatrixElement

/**
 * Tokenization + term-frequency matrix building (reference:
 * src/test/scala/com/saltfish/run/KeyWordsDemo.scala:19–101 — rows B,C,D,E of
 * SURVEY.md §2).
 *
 * The reference tokenizes with the ansj Chinese segmenter (an external dep,
 * pom.xml:14) inside a typed `flatMap`, with stop words collected to the
 * driver. We rebuild it declaratively: `explode(split(...))` keeps the
 * pipeline inside Catalyst (codegen'd, prunable), and stop-word removal is a
 * broadcast left-anti join — no driver-side collect, no per-row JVM object
 * churn. The tokenizer pattern is pluggable (whitespace default) since ansj
 * is both unavailable offline and irrelevant to the engine's semantics.
 */
object Tokenizer {

  /** Split a text column into one token per row; drops empty tokens. */
  def tokens(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      pattern: String = "\\s+",
      lowercase: Boolean = false): DataFrame = {
    val txt = if (lowercase) lower(col(textCol)) else col(textCol)
    docs
      .select(col(idCol).as("doc"), explode(split(txt, pattern)).as("token"))
      .where(col("token") =!= "")
  }

  /**
   * Remove stop words with a broadcast left-anti join (reference collects the
   * stop list to the driver and filters inside the tokenizer,
   * KeyWordsDemo.scala:31–43 — a pattern that breaks for large stop lists).
   */
  def removeStopWords(tokens: DataFrame, stopWords: DataFrame, wordCol: String = "token"): DataFrame =
    tokens.join(
      broadcast(stopWords.select(col(stopWords.columns.head).as(wordCol))),
      Seq(wordCol),
      "left_anti")

  /**
   * Term-frequency COO matrix: one MatrixElement(doc, term, count) per
   * distinct (doc, term) — the reference's `groupBy(x, y).agg(sum(value))`
   * (KeyWordsDemo.scala:59–63). Partial (map-side) aggregation is automatic.
   * Vectors live on the `y` axis (doc ids), coordinates on `x` (terms),
   * matching the demo's `axis = "y"` convention (KeyWordsDemo.scala:102).
   */
  def termFrequency(tokens: DataFrame)(implicit spark: SparkSession): Dataset[MatrixElement] = {
    import spark.implicits._
    tokens
      .groupBy(col("doc").cast("string").as("y"), col("token").as("x"))
      .agg(count(lit(1)).cast("double").as("value"))
      .as[MatrixElement]
  }

  /**
   * TF-IDF COO matrix from a TF matrix: value = tf · ln(N / df), where N is
   * the corpus document count and df the term's document frequency — the
   * classic weighting a text pipeline applies before cosine similarity, so
   * the Zipf-head terms that dominate raw TF (and blow up the pairwise
   * alignment — see [[graft.core.CosineAnalysis.dfCap]]) carry ~zero
   * weight. Terms present in every document get exactly 0.
   *
   * Scale: one extra aggregation over the TF matrix keyed by term (map-side
   * partial count), broadcast-or-shuffle joined back by Catalyst/AQE — the
   * df table has one row per distinct term. N is a 1-row aggregate
   * broadcast-joined into the plan, so building the query runs NO job and
   * the whole computation stays lazy (plan construction used to fire an
   * eager `count()` over the TF matrix). N and df are exact integers;
   * ln differs across engines by ≤1 ulp, absorbed by the 1e-6 result grid.
   */
  def tfIdf(tf: Dataset[MatrixElement])(implicit spark: SparkSession): Dataset[MatrixElement] = {
    import spark.implicits._
    val n = tf.agg(countDistinct($"y").cast("double").as("n_docs"))
    val df = tf.groupBy($"x").agg(count(lit(1)).cast("double").as("df"))
    tf.join(df, "x")
      .crossJoin(broadcast(n))
      .select($"y", $"x", ($"value" * log($"n_docs" / $"df")).as("value"))
      .as[MatrixElement]
  }

  /** docs → tokenize → (optional stop-word removal) → TF matrix, end to end. */
  def termFrequencyOf(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      stopWords: Option[DataFrame] = None)(implicit spark: SparkSession): Dataset[MatrixElement] = {
    val t = tokens(docs, idCol, textCol)
    termFrequency(stopWords.fold(t)(removeStopWords(t, _)))
  }
}
