package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.MatrixElement

/**
 * Source and sink helpers for the engine's two canonical inputs — raw text
 * documents (the reference's input: plain article files read with
 * `spark.read.textFile`, KeyWordsDemo.scala:19–27) and COO triple tables —
 * plus the parquet sink used for golden outputs.
 *
 * All readers return plain DataFrames/Datasets so every downstream
 * operator (tokenizer, cosine core, dedup) composes without caring where
 * rows came from; Catalyst pushes projections/filters into the scans.
 */
object Sources {

  /**
   * One document per text FILE (the reference's shape: each article is a
   * file): (doc_id = file path, text = whole file).
   */
  def readTextDocs(spark: SparkSession, paths: Seq[String]): DataFrame = {
    import spark.implicits._
    spark.read.textFile(paths: _*)
      .withColumn("doc_id", input_file_name())
      .groupBy("doc_id")
      .agg(concat_ws(" ", collect_list($"value")).as("text"))
  }

  /**
   * One document per LINE, doc_id = 0-based line number in (file path,
   * line-in-file) order — STABLE across runs and partitioning, so
   * downstream joins keyed on doc_id are reproducible (ADVICE r2: the
   * previous `monotonically_increasing_id` encoded partition ids, which
   * change with parallelism). The text source exposes no line offsets, so
   * this reads whole files and splits; the total order costs a
   * single-partition window. Both make this a demo/small-corpus helper —
   * at scale, ingest documents with [[readTextDocs]] or parquet, where
   * ids come from the data, not from physical order.
   */
  def readTextLines(spark: SparkSession, paths: Seq[String]): DataFrame = {
    import spark.implicits._
    val byFile = spark.sparkContext.wholeTextFiles(paths.mkString(",")).toDF("file", "content")
    byFile
      .select($"file",
        // \z (not $): $ also matches BEFORE a final line terminator, which
        // would strip two trailing newlines and drop a blank last line
        posexplode(split(regexp_replace($"content", "\r?\n\\z", ""), "\r?\n"))
          .as(Seq("line_no", "text")))
      .withColumn("doc_id",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy($"file", $"line_no")).cast("long") - 1)
      .select($"doc_id", $"text")
  }

  /** COO triples from parquet with arbitrary column names / numeric types. */
  def readTriplesParquet(spark: SparkSession, path: String,
      yCol: String = "y", xCol: String = "x", valueCol: String = "value"): Dataset[MatrixElement] =
    MatrixElement.from(spark.read.parquet(path), yCol, xCol, valueCol)

  /** COO triples from headered CSV (values parsed as double). */
  def readTriplesCsv(spark: SparkSession, path: String,
      yCol: String = "y", xCol: String = "x", valueCol: String = "value"): Dataset[MatrixElement] =
    MatrixElement.from(
      spark.read.option("header", "true").csv(path), yCol, xCol, valueCol)

  /** COO triples from JSON-lines. */
  def readTriplesJson(spark: SparkSession, path: String,
      yCol: String = "y", xCol: String = "x", valueCol: String = "value"): Dataset[MatrixElement] =
    MatrixElement.from(spark.read.json(path), yCol, xCol, valueCol)

  /**
   * COO triples from ORC — the other columnar lake format Spark ships a
   * native vectorized reader for. Same pushdown properties as parquet:
   * column pruning and predicate pushdown reach the stripe level, so a
   * 2-column projection never reads the full row.
   */
  def readTriplesOrc(spark: SparkSession, path: String,
      yCol: String = "y", xCol: String = "x", valueCol: String = "value"): Dataset[MatrixElement] =
    MatrixElement.from(spark.read.orc(path), yCol, xCol, valueCol)

  /** Parquet sink (golden files / handoff); overwrite by default. */
  def writeParquet(df: DataFrame, path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).parquet(path)

  /** ORC sink — for handoff into ORC-native warehouses (Hive-lineage
    * lakes); overwrite by default. */
  def writeOrc(df: DataFrame, path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).orc(path)
}
