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

  test("false-positive rate tracks the (1-e^{-kn/m})^k envelope") {
    // eval: ~1.2k distinct shingles; train: ~4.6k shingles sharing NONE
    // of them (disjoint letter tags), so every flag is a false positive
    def corpus(tag: Char, docs: Int, words: Int) =
      (0 until docs).map { i =>
        val a = ('a' + i / 10).toChar
        (i.toLong, (0 until words).map(w => s"$a${tag.toString * (w + 1)}$i").mkString(" "))
      }.toDF("doc_id", "text")
    val evalDocs = corpus('x', 50, 26)
    val trainDocs = corpus('y', 100, 50)
    val evalSh = Dedup.shingles(evalDocs, "doc_id", "text")
    val n = Dedup.bloomBits(evalSh.select("sh")).count().toDouble
    val r = Dedup.bloomContamination(trainDocs, evalDocs, "doc_id", "text")
      .agg(org.apache.spark.sql.functions.sum("n_shingles"),
        org.apache.spark.sql.functions.sum("flagged_shingles"))
      .collect().head
    val (total, fp) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    // load factor from the ACTUAL set-bit count (collisions included)
    val pBit = n / Dedup.BloomBits
    val expected = math.pow(pBit, Dedup.BloomHashes)
    val measured = fp / total
    // a deterministic fixture, so this is a sanity envelope (within 4x
    // both ways), not a statistical test; it catches a broken hash
    // family (measured ≈ 1) or a broken conjunction (measured ≈ 0 while
    // expected is well above 1/total)
    assert(measured < expected * 4 + 1e-9,
      s"FP rate $measured far above envelope $expected")
    assert(expected < 0.2, s"fixture overloads the filter: p=$pBit")
  }

  test("probe plans one broadcast equi-join; nothing eval-sized shuffles") {
    val plan = Dedup.bloomContamination(train, evalDocs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
