package graft.core

import org.apache.spark.sql.functions.{col, spark_partition_id}

import graft.SparkSpec

/**
 * The planted-skew regime the salted aligner exists for (VERDICT r6 ask
 * #4): one hot coordinate shared by a large fraction of vectors. The
 * plain coordinate self-equi-join must hand the hot coordinate's whole
 * C(n,2) expansion to the single task owning its hash; the triangle-bucket
 * salted plan must split the same expansion across many tasks. Measured
 * here by per-output-partition row counts with AQE's small-partition
 * coalescing off (it would re-merge the tiny test partitions and hide the
 * physical placement this spec exists to observe).
 */
class SkewSaltingSpec extends SparkSpec {

  private val HotVectors = 24

  // 64 vectors; the first 24 share coordinate "hot"; every vector also
  // carries 3 coordinates unique to it (they can produce no pairs), so
  // every aligned pair comes from the hot coordinate: C(24,2) = 276.
  private lazy val fixture = {
    val s = spark
    import s.implicits._
    (0 until 64).flatMap { v =>
      val id = f"v$v%02d"
      Seq.tabulate(3)(c => MatrixElement(id, s"u${v}_$c", 1.0 + c)) ++
        (if (v < HotVectors) Seq(MatrixElement(id, "hot", 2.0)) else Nil)
    }.toDS()
  }

  private def analysis = new CosineAnalysis(spark, axis = "y")

  /** Pin the scale-regime plan on the toy fixture: no broadcast (at 100 TB
    * both join sides are huge — the shuffle join IS the plan under test),
    * and no AQE re-merging of the tiny test partitions. */
  private def withNoCoalesce[A](body: => A): A = {
    val keys = Seq(
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { keys.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def partitionCounts(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.withColumn("pid", spark_partition_id())
      .groupBy("pid").count().collect().map(_.getLong(1)).toSeq

  test("plain alignment concentrates the hot coordinate in ONE task") {
    withNoCoalesce {
      val counts = partitionCounts(
        analysis.alignedPairs(analysis.normalize(fixture)).toDF())
      assert(counts.sum == 276L, s"pair count ${counts.sum}")
      // every hot pair lands in the partition owning hash("hot")
      assert(counts.max == 276L,
        s"expected full concentration, got partitions $counts")
    }
  }

  test("salted alignment splits the same expansion across tasks") {
    withNoCoalesce {
      val counts = partitionCounts(
        analysis.alignedPairsSalted(analysis.normalize(fixture), salts = 4).toDF())
      assert(counts.sum == 276L, s"pair count ${counts.sum}")
      // S=4 → 10 triangle tasks; over the suite's 4 shuffle partitions the
      // expansion spreads instead of stacking in one
      assert(counts.length >= 2, s"expansion not split: $counts")
      assert(counts.max < 276L * 7 / 10,
        s"max task still holds most of the expansion: $counts")
    }
  }

  test("salted derives exactly the plain pair set on the skewed fixture") {
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getString(0), r.getString(1), r.getString(2), r.getDouble(3), r.getDouble(4))
    val plain = analysis.alignedPairs(analysis.normalize(fixture))
      .toDF().collect().map(key).toSet
    val salted = analysis.alignedPairsSalted(analysis.normalize(fixture), salts = 4)
      .toDF().collect().map(key).toSet
    assert(plain == salted && plain.size == 276)
  }
}
