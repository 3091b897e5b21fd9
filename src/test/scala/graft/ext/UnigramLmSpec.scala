package graft.ext

import org.apache.spark.sql.SparkSession

import graft.SparkSpec

/**
 * Unigram-LM tokenizer training ([[TextAnalysis.unigramVocab]] /
 * [[TextAnalysis.unigramEncodeStats]]): the expected values below were
 * computed by an independent Python reference implementation of the
 * same hard-EM contract (seed = chars + top-512 substrings; 2 Viterbi
 * rounds; snapped log-probs; longer-piece tie-break) and cross-checked
 * against the DuckDB recursive-CTE oracle chain — three independent
 * spellings of one algorithm agreeing on every count.
 */
class UnigramLmSpec extends SparkSpec {
  implicit lazy val s: SparkSession = spark
  import s.implicits._

  private lazy val docs = Seq(
    (0L, "the cat sat on the mat"),
    (1L, "the cats sat"),
    (2L, "a mat on a cat"),
    (3L, "thematic the them them"),
    (4L, "sat sat on on the cat")).toDF("doc_id", "text")

  test("unigramVocab learns whole-word pieces on the toy corpus (reference values)") {
    val got = TextAnalysis.unigramVocab(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // the Python reference's full final model, rank order (cnt DESC, piece)
    val want = Seq(
      (1L, "the", 5L), (2L, "on", 4L), (3L, "sat", 4L), (4L, "cat", 3L),
      (5L, "them", 3L), (6L, "a", 2L), (7L, "mat", 2L), (8L, "atic", 1L),
      (9L, "cats", 1L))
    assert(got.toSeq == want, got.mkString(", "))
  }

  test("unigramVocab log-probs are the snapped ln(cnt/total)") {
    val m = TextAnalysis.unigramVocab(docs, "doc_id", "text")
      .collect().map(r => r.getString(1) -> (r.getLong(2), r.getDouble(3))).toMap
    val total = m.values.map(_._1).sum.toDouble
    m.foreach { case (_, (cnt, logp)) =>
      val want = math.floor(math.log(cnt / total) * 1e6 + 0.50001) / 1e6
      assert(logp == want)
    }
  }

  test("unigramEncodeStats: the fertility readout matches the reference segmentation") {
    val r = TextAnalysis.unigramEncodeStats(docs, "doc_id", "text").collect().head
    // 9 word types, 24 tokens, 9 surviving pieces, 25 emitted pieces over
    // 72 chars: fertility 25/24, compression 72/25 (Python reference)
    assert(r.getLong(0) == 9L && r.getLong(1) == 24L && r.getLong(2) == 9L)
    assert(r.getLong(3) == 25L && r.getLong(4) == 72L)
    assertApprox(r.getDouble(5), 25.0 / 24.0, 1e-9)
    assertApprox(r.getDouble(6), 72.0 / 25.0, 1e-9)
  }

  test("every word re-segments exactly under the final vocabulary (coverage invariant)") {
    // total_pieces * every piece in vocab: reconstructing each word from
    // its pieces must give the word back — checked via the encode stats'
    // char conservation (total_chars = sum n * len(word) exactly)
    val enc = TextAnalysis.unigramEncodeStats(docs, "doc_id", "text").collect().head
    val charSum = docs.select(org.apache.spark.sql.functions.expr(
      "sum(aggregate(filter(split(text, '\\\\s+'), x -> x <> ''), 0L, (a, w) -> a + length(w)))"))
      .collect().head.getLong(0)
    assert(enc.getLong(4) == charSum)
  }
}
