package graft.ext

import org.apache.spark.sql.SparkSession

import graft.SparkSpec

/**
 * [[Dedup.substringContamination]]: the Lee et al. exact-substring
 * guarantee — a verbatim quote pasted mid-document at arbitrary
 * character alignment is caught with certainty, on a fixture where the
 * document-level MinHash probe ([[Dedup.fuzzyContamination]]) provably
 * misses it (VERDICT r8 ask #7's planted case).
 */
class SubstringDecontaminationSpec extends SparkSpec {
  implicit lazy val s: SparkSession = spark
  import s.implicits._

  // a 59-char quote (spaces included) that will sit VERBATIM in both an
  // eval document and, mid-text at an odd character offset, in a train
  // document — long enough for exactly quote.length - 49 shared windows
  private val quote =
    "the quick brown fox jumps over the lazy dog once more today"

  private def words(tag: String, n: Int): String =
    (0 until n).map(i => s"$tag$i unique$tag$i").mkString(" ")

  private lazy val evalDocs = Seq(
    (100L, s"${words("ev", 20)} $quote ${words("evtail", 20)}"))
    .toDF("doc_id", "text")

  private lazy val trainDocs = Seq(
    // the quote buried in 2x its length of novel text, at an alignment
    // no tokenizer boundary or shingle band is guaranteed to hit
    (1L, s"${words("tr", 40)}xx$quote${words("trtail", 40)}"),
    // fully novel control
    (2L, words("clean", 60)))
    .toDF("doc_id", "text")

  test("a mid-document verbatim quote is caught exactly, control is clean") {
    assert(quote.length === 59)
    val r = Dedup.substringContamination(trainDocs, evalDocs, "doc_id", "text")
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    // every 50-char window fully inside the quote occurs in the eval doc
    // too: quote.length - 50 + 1 = 11 hits, no more (the surrounding
    // context differs on both sides), no fewer (exactness)
    val (n1, hit1, c1) = r(1L)
    assert(hit1 === (quote.length - Dedup.SubstrLen + 1).toLong)
    assert(c1 > 0.0 && n1 > hit1)
    val (_, hit2, c2) = r(2L)
    assert(hit2 === 0L && c2 === 0.0)
  }

  test("the planted quote dilutes below fuzzyContamination's reach") {
    // document-level MinHash Jaccard: the quote is ~1/5 of the train
    // doc's shingles and ~1/3 of the eval doc's — far below the 0.2
    // near-dup threshold once unioned, so the fuzzy probe reports
    // NOTHING on the exact fixture the substring probe nails
    val fuzzy = Dedup.fuzzyContamination(trainDocs, evalDocs, "doc_id", "text")
    assert(fuzzy.count() === 0L)
  }

  test("documents shorter than the window emit no row") {
    val shorties = Seq((9L, "tiny text")).toDF("doc_id", "text")
    assert(Dedup.substringContamination(shorties, evalDocs, "doc_id", "text")
      .count() === 0L)
    // and an eval shorter than the window contaminates nothing
    assert(Dedup.substringContamination(trainDocs, shorties, "doc_id", "text")
      .where($"hit_grams" > 0).count() === 0L)
  }
}
