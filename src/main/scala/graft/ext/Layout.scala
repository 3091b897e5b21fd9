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

  /**
   * Morton Z-value of two non-negative integer columns: the low `bits`
   * bits of `a` and `b` interleaved (a on even positions, b on odd) —
   * the space-filling-curve sort key behind Z-ORDER clustering
   * (Delta/Iceberg OPTIMIZE ZORDER BY). Values must already sit in
   * `[0, 2^bits)` (clamp/quantile-rank wider domains first); `bits` ≤ 31
   * keeps the result in exact int64 range. Evaluates through the
   * codegen'd [[graft.functions.ZInterleave]] expression (the clustering
   * write computes it once per row of the whole table, right before its
   * range exchange — exactly the hot map stage codegen exists for); the
   * declarative fold twin is bit-identical and spec-pinned, and the
   * DuckDB oracle replays the same integer bit arithmetic exactly.
   */
  def zValue(spark: SparkSession, a: String, b: String,
      bits: Int): org.apache.spark.sql.Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    graft.functions.GraftFunctions.register(spark)
    expr(s"z_interleave(CAST($a AS BIGINT), CAST($b AS BIGINT), $bits)")
  }

  /**
   * Write `df` Z-ORDER-clustered on two integer columns: rows sorted by
   * their interleaved [[zValue]], range-partitioned into `nFiles` files.
   * Because the Z-curve keeps 2-D-close points file-local, EVERY file
   * covers a narrow range of BOTH columns — so parquet's per-file/
   * row-group min-max stats prune a 2-D box predicate on either (or
   * both) columns, which neither a single-column sort (perfect on one
   * axis, useless on the other) nor `partitionBy` (needs low
   * cardinality) gives. This is the third data-skipping lever next to
   * [[docsByLangPath]] (directory pruning) and
   * [[Relational.bucketedOrderRevenue]] (shuffle-free joins).
   *
   * Scale shape: one range exchange on the z key (sampled boundaries) +
   * a within-partition sort — the standard one-shot OPTIMIZE cost,
   * amortized over every box-sliced read after it.
   */
  def zOrderWrite(df: DataFrame, a: String, b: String, bits: Int,
      nFiles: Int, outPath: String): Unit = {
    require(nFiles >= 1)
    df.withColumn("__z", zValue(df.sparkSession, a, b, bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(outPath)
  }
}
