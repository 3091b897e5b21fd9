package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSessions
import graft.core.CosineAnalysis

/**
 * Scale diagnostic for the sparse-IVF candidate/re-scoring stage — the
 * [[graft.PrefixDiag]] pattern for [[SparseAnn.exactSimsLocal]]: prints
 * the stage's THREE logical surfaces at a data dir without running the
 * scoring join itself, so a wall-time step between two scale decades can
 * be attributed (VERDICT r10 ask #2) to either a growing logical surface
 * (pairs / replicated rows — a plan defect) or to physical effects at a
 * constant surface (wide-row exchange bytes, spill — a sizing defect).
 *
 *   - membership rows and their (cid, sub) group-size distribution
 *     (probers vs assigned; max/mean grp_n drives the prober-chunk
 *     count npb = ⌈grp_n/cap⌉),
 *   - pair surface Σ_g probers_g · assigned_g (rows entering
 *     sparse_dot),
 *   - assigned-replication surface Σ_g assigned_g · npb_g (the rows the
 *     chunk explode materializes) and the coordinate-map bytes both
 *     sides ship (entries × ~per-entry bytes).
 *
 * Usage: runMain graft.ext.IvfDiag <dataDir> [clustered]
 */
object IvfDiag {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val clustered = args.length > 1 && args(1) == "clustered"
    val spark = SparkSessions.local("graft-ivf-diag",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val analysis = new CosineAnalysis(spark, axis = "y")
    val matrix =
      if (clustered) graft.entry.EntryUtil.clusteredSupplierMatrix(spark, dir)
      else graft.entry.EntryUtil.supplierPartMatrix(spark, dir)
    val pin = (df: org.apache.spark.sql.DataFrame) => df.localCheckpoint()
    val n = pin(SparseAnn.normTable(analysis, matrix))
    val ranked = SparseAnn.ivfRanked(n, pin, SparseAnn.AutoLists,
      SparseAnn.IvfIters, SparseAnn.IvfNprobe, SparseAnn.IvfDim)
    val memb = pin(SparseAnn.ivfMembershipTail(ranked, SparseAnn.IvfNprobe,
      SparseAnn.ListOccupancy))
    val cap = SparseAnn.PairGroupCap
    val g = memb.groupBy("cid", "sub").agg(
        count(lit(1)).as("grp_n"),
        sum(when(col("is_assigned"), 1L).otherwise(0L)).as("asg"))
      .withColumn("prb", col("grp_n"))
      .withColumn("npb", expr(s"CAST((grp_n - 1) DIV $cap AS BIGINT) + 1"))
      .localCheckpoint()
    val s = g.agg(
      count(lit(1)).as("groups"),
      sum("grp_n").as("memb_rows"),
      max("grp_n").as("max_grp"),
      sum(col("prb") * col("asg")).as("pair_surface"),
      sum(col("asg") * col("npb")).as("asg_replicated"),
      max("npb").as("max_npb"),
      sum("npb").as("sum_npb")).collect()(0)
    val nnz = n.count()
    val nv = n.select("vector").distinct().count()
    println(s"[ivf-diag] dir=$dir clustered=$clustered vectors=$nv " +
      s"coordRows=$nnz (~${nnz / math.max(nv, 1)} nnz/vector)")
    println(s"[ivf-diag] groups=${s.getLong(0)} membRows=${s.getLong(1)} " +
      s"maxGrp=${s.getLong(2)} maxNpb=${s.getLong(5)} sumNpb=${s.getLong(6)}")
    println(s"[ivf-diag] pairSurface=${s.getLong(3)} " +
      s"asgReplicatedRows=${s.getLong(4)} " +
      s"proberMapBytes~=${s.getLong(1) * (nnz / math.max(nv, 1)) * 30} " +
      s"asgMapBytes~=${s.getLong(4) * (nnz / math.max(nv, 1)) * 30}")
    println("[ivf-diag] top groups by grp_n:")
    g.orderBy(col("grp_n").desc).limit(8).collect().foreach(r =>
      println(s"  cid=${r.getLong(0)} sub=${r.getLong(1)} grp_n=${r.getLong(2)} " +
        s"asg=${r.getLong(3)} npb=${r.getLong(5)}"))
    spark.stop()
  }
}
