package graft.ext

import org.apache.spark.sql.SparkSession

import graft.SparkSpec

/** The Bloom-probed decontamination path ([[Dedup.bloomContamination]]):
  * fixed-size probe structure, no false negatives by construction. */
class BloomContaminationSpec extends SparkSpec {
  implicit lazy val s: SparkSession = spark
  import s.implicits._

  private val leak = "benchmark evaluation suite question answer pairs stay hidden"
  private lazy val evalDocs = Seq((100L, leak)).toDF("doc_id", "text")
  private lazy val train = Seq(
    (1L, s"my training doc quotes the $leak verbatim sadly"),
    (2L, "clean prose about mountains rivers forests deserts and oceans today"),
    (3L, leak) // full copy
  ).toDF("doc_id", "text")

  test("bloom flags are a superset of exact hits, per document") {
    val exact = Dedup.contamination(train, evalDocs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val bloom = Dedup.bloomContamination(train, evalDocs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(exact.keySet == bloom.keySet)
    exact.foreach { case (doc, (nExact, hits)) =>
      val (nBloom, flagged) = bloom(doc)
      assert(nBloom == nExact)
      assert(flagged >= hits, s"doc $doc: bloom $flagged < exact $hits")
    }
    // the planted leaks are fully flagged; the clean doc's flags (if any)
    // are false positives only
    assert(bloom(3L)._2 == bloom(3L)._1, "full copy must flag every shingle")
    assert(exact(2L)._2 == 0L)
  }

  test("the filter stays bounded regardless of eval size") {
    // 2000 distinct eval shingles still compress to <= BloomBits rows
    val bigEval = (0 until 100).map { i =>
      val a = ('a' + i / 10).toChar; val b = ('a' + i % 10).toChar
      (1000L + i, (0 until 25).map(w => s"$a${"e" * (w + 1)}$b").mkString(" "))
    }.toDF("doc_id", "text")
    val bits = Dedup.bloomBits(
      Dedup.shingles(bigEval, "doc_id", "text").select("sh"))
    val n = bits.count()
    assert(n <= Dedup.BloomBits, s"$n positions exceed the bit-space bound")
    assert(n > 1000L, "fixture should set a nontrivial number of bits")
  }

  test("probe plans one broadcast equi-join; nothing eval-sized shuffles") {
    val plan = Dedup.bloomContamination(train, evalDocs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
