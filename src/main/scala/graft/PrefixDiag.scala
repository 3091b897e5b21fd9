package graft

import org.apache.spark.sql.functions._

import graft.ext.Dedup

/**
 * Scale diagnostic for the prefix-filter similarity join: prints the
 * prefix-block pair surface Σ_sh C(df_prefix, 2) (the candidate join's
 * true size), its head, and the shingle-df head at a given data dir —
 * the readout that explains a candidate blow-up one scale decade up
 * (the r10 sfx10 disk-fill) without running the join itself.
 *
 * Usage: runMain graft.PrefixDiag <dataDir> [minJaccard]
 */
object PrefixDiag {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val t = if (args.length > 1) args(1).toDouble else 0.3
    val spark = SparkSessions.local("graft-prefix-diag",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    val docs = entry.EntryUtil.docs(spark, dir)
    val sh = Dedup.shingles(docs, "doc_id", "text").localCheckpoint()
    // the SAME prefix-selection code path prefixCandidates joins over
    // (Dedup.prefixTable) — extracted so this diagnostic can never
    // desynchronize from the join it exists to explain
    val prefix = Dedup.prefixTable(sh, t).localCheckpoint()
    val pdf = prefix.groupBy("sh").agg(count(lit(1)).as("pdf"))
    val surface = pdf.agg(
      sum((col("pdf") * (col("pdf") - 1) / 2).cast("long")).as("pairs"),
      max("pdf").as("max_pdf"), count(lit(1)).as("distinct_sh")).collect()(0)
    println(s"[prefix-diag] dir=$dir t=$t shingleRows=${sh.count()} " +
      s"prefixRows=${prefix.count()} distinctPrefixSh=${surface.getLong(2)} " +
      s"pairSurface=${surface.getLong(0)} maxPrefixDf=${surface.getLong(1)}")
    println("[prefix-diag] top prefix-df shingles:")
    pdf.orderBy(col("pdf").desc).limit(10).collect()
      .foreach(r => println(s"  sh=${r.get(0)} pdf=${r.getLong(1)}"))
    spark.stop()
  }
}
