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
 *   - document TEXT is remapped per copy by an AFFINE letter bijection
 *     c → a·c + b (mod 26), a coprime to 26: token equality WITHIN a copy
 *     is preserved exactly (same near-dup / shingle / quality structure),
 *     while tokens across copies essentially never collide — two distinct
 *     affine maps agree on at most two letters (gcd(Δa,26) = 2; all
 *     coprime slopes are odd), so only a token written entirely in those
 *     ≤2 fixed letters can cross-collide, and a whole document never can.
 *     312 distinct maps
 *     (12 slopes × 26 offsets) cover copies ≤ 312; the earlier Caesar
 *     version recycled at copy 26 (i % 26), which at copies=100 would
 *     have planted verbatim cross-copy duplicates in 4-copy groups and
 *     superlinearized every dedup surface;
 *   - dimension tables (region, nation) are shared, like any scale
 *     factor's.
 */
object ScaleUp {
  private val OFF = 10000000L
  private val Lower = "abcdefghijklmnopqrstuvwxyz"
  private val Upper = Lower.toUpperCase
  // slopes coprime to 26 — each (slope, offset) pair is a distinct letter
  // bijection; slope 1 / offset 0 (copy 0) is the identity
  private val Slopes = Array(1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)

  /** The copy-i affine image of the lower-case alphabet. */
  private[graft] def mappedAlphabet(i: Int): String = {
    require(i < Slopes.length * 26, s"copy $i exceeds ${Slopes.length * 26} distinct affine maps")
    val a = Slopes((i / 26) % Slopes.length)
    val b = i % 26
    (0 until 26).map(c => Lower((a * c + b) % 26)).mkString
  }

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
        val mapped = mappedAlphabet(i)
        textCols.foldLeft(keyed)((d, c) =>
          if (i == 0) d
          else d.withColumn(c, translate(col(c), Lower + Upper,
            mapped + mapped.toUpperCase)))
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
