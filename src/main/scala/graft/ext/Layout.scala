package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Physical-layout levers beyond bucketing ([[Relational
 * .bucketedOrderRevenue]]): directory PARTITIONING, the data-skipping
 * primitive every 100 TB lakehouse leans on. A corpus written
 * `partitionBy(col)` turns every `col = x` predicate into a
 * PartitionFilter — directory pruning at PLANNING time, so a one-language
 * slice of a 100 TB multilingual corpus reads only that language's files
 * and scans ZERO rows it will filter. The layout is written once at
 * ingest (here: once per (JVM, source dir), cached in the process-scoped
 * warehouse) and every downstream language-sliced query — per-language
 * quality calibration, language-specific dedup, mixture sampling — rides
 * it for free.
 *
 * The trade (documented because it bites at scale): partition columns
 * must be LOW-cardinality (languages, sources, dates — not doc ids), or
 * the layout shatters into millions of small files; and rows inside a
 * partition lose their original file-order. Spec-pinned: the sliced
 * scan's plan carries the predicate as `PartitionFilters` with no
 * post-scan filter, and reads only the slice's files.
 */
object Layout {

  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)

  /**
   * The documents table re-laid-out partitioned by `lang`, written once
   * per (JVM, dir) into the process-scoped warehouse (same ownership
   * story as the bucketed tables — no cross-JVM races by construction).
   * Returns the partitioned-layout path.
   */
  def docsByLangPath(spark: SparkSession, dir: String): String = {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val base = new java.io.File(
      new org.apache.hadoop.fs.Path(wh).toUri.getPath)
    val path = new java.io.File(base, s"graft_part_docs_${md5(dir)}")
    if (!new java.io.File(path, "_SUCCESS").exists()) {
      spark.read.parquet(s"$dir/documents.parquet")
        .write.mode("overwrite").partitionBy("lang")
        .parquet(path.getAbsolutePath)
    }
    path.getAbsolutePath
  }

  /**
   * One language's documents read THROUGH the partitioned layout: the
   * equality predicate resolves to a PartitionFilter (directory
   * pruning) — no row of any other language is ever deserialized. The
   * partition column comes back as the directory value; everything else
   * is byte-identical to the source table's rows for that language.
   */
  def langSlice(spark: SparkSession, dir: String, lang: String): DataFrame =
    spark.read.parquet(docsByLangPath(spark, dir))
      .where(col("lang") === lang)
}
