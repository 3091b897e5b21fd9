package graft

import org.apache.spark.sql.functions._

/**
 * BENCH-ONLY data scaler (VERDICT r7 ask #8): replicates a test-data dir
 * `copies`× with disjoint key spaces so the heaviest queries can be
 * spot-benched one scale factor up (sf0.1 → ~sf1) without touching the
 * read-only driver fixtures. NOT a correctness input — the contract
 * oracles stay on the driver-generated dirs.
 *
 * Replication rules keep each query's workload SHAPE scale-linear:
 *   - every key domain (order/cust/supp/part/doc/event/user/vec) offsets
 *     by copy × 10M, so foreign keys stay consistent within a copy and
 *     copies never join each other;
 *   - document TEXT is Caesar-shifted per copy (a letter bijection):
 *     token equality WITHIN a copy is preserved exactly (same near-dup /
 *     shingle / quality structure), while tokens across copies never
 *     collide — so dedup pair surfaces grow 10×, not C(10,2)×-per-doc as
 *     verbatim cloning would plant;
 *   - dimension tables (region, nation) are shared, like any scale
 *     factor's.
 */
object ScaleUp {
  private val OFF = 10000000L
  private val Lower = "abcdefghijklmnopqrstuvwxyz"
  private val Upper = Lower.toUpperCase

  def main(args: Array[String]): Unit = {
    val Array(inDir, outDir, copiesStr) = args
    val copies = copiesStr.toInt
    require(copies >= 1)
    val spark = SparkSessions.local("graft-scaleup",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))

    def rep(table: String, keyCols: Seq[String], textCols: Seq[String] = Nil): Unit = {
      val base = spark.read.parquet(s"$inDir/$table.parquet")
      (0 until copies).map { i =>
        val keyed = keyCols.foldLeft(base)((d, c) =>
          d.withColumn(c, col(c) + lit(i * OFF)))
        val s = i % 26
        textCols.foldLeft(keyed)((d, c) =>
          if (s == 0) d
          else d.withColumn(c, translate(col(c), Lower + Upper,
            Lower.drop(s) + Lower.take(s) + Upper.drop(s) + Upper.take(s))))
      }.reduce(_.unionByName(_))
        .write.mode("overwrite").parquet(s"$outDir/$table.parquet")
    }

    rep("orders", Seq("o_orderkey", "o_custkey"))
    rep("lineitem", Seq("l_orderkey", "l_suppkey", "l_partkey"))
    rep("customer", Seq("c_custkey"))
    rep("supplier", Seq("s_suppkey"))
    rep("part", Seq("p_partkey"))
    rep("documents", Seq("doc_id"), Seq("text"))
    rep("events", Seq("event_id", "user_id"))
    rep("embeddings", Seq("vec_id"))
    Seq("region", "nation").foreach { t =>
      spark.read.parquet(s"$inDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    }
    println(s"[scaleup] wrote $copies copies of $inDir to $outDir")
    spark.stop()
  }
}
