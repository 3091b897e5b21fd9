package graft

// Scratch diagnostic (NOT committed): apportion the r12
// dedup_jaccard_prefix_head regression between the auto-gate pieces.
object ScratchDiag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSessions.local("graft-scratch", "32")
    import org.apache.spark.sql.functions._
    val docs = {
      // replicate DedupEntries.boilerplateDocs
      val bp = " all rights reserved terms of service apply contact support online now"
      val base = entry.EntryUtil.docs(spark, dir)
        .select(col("doc_id"), concat(col("text"), lit(bp)).as("text"))
      base.unionByName(base.select((col("doc_id") + lit(400000L)).as("doc_id"),
        concat(lit("zz qq"), lit(" "), col("text")).as("text")))
    }
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2fs n=$n")
    }
    val sh = ext.Dedup.shingles(docs, "doc_id", "text").localCheckpoint()
    time("shingles (pinned)") { sh.count() }
    val cands = ext.Dedup.prefixCandidates(sh, 0.3)
    time("prefixCandidates count") { cands.count() }
    val cp = cands.localCheckpoint()
    time("candidates localCheckpoint") { cp.count() }
    time("candDocs distinct count") {
      cp.select(col("doc0").as("doc_id"))
        .union(cp.select(col("doc1").as("doc_id"))).distinct().count()
    }
    time("sh doc distinct count") { sh.select("doc_id").distinct().count() }
    println("== noPrune plan ==")
    ext.Dedup.jaccardForBySh(cands, sh, Some(false))
      .where(col("jaccard") >= 0.3).explain()
    println("== prune plan ==")
    ext.Dedup.jaccardForBySh(cands, sh, Some(true))
      .where(col("jaccard") >= 0.3).explain()
    spark.stop()
  }
}
