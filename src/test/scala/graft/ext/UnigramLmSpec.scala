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

  test("charCoverage retains zero-usage characters; OFF drops them") {
    // every 'ab' occurrence segments as the whole-word piece 'ab' after
    // round 1 (ln(1/3) beats 2·ln(1/3)), so the singles a/b get zero
    // Viterbi usage: without coverage they DROP from the vocabulary;
    // with it they survive at the floor count 1 (add-one convention)
    val ab = Seq((0L, "ab ab ab ab"), (1L, "ab ab")).toDF("doc_id", "text")
    val plain = TextAnalysis.unigramVocab(ab, "doc_id", "text", k = 10)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(plain.keySet == Set("ab"), plain.toString)
    val cov = TextAnalysis.unigramVocab(ab, "doc_id", "text", k = 10,
      charCoverage = true)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(cov.keySet == Set("ab", "a", "b"), cov.toString)
    assert(cov("ab") == 6L && cov("a") == 1L && cov("b") == 1L)
  }

  test("a planted CJK/emoji doc encodes losslessly under charCoverage") {
    val multi = docs.unionByName(Seq(
      (900001L, "你好 世界 😀😀 你好世界 café café")).toDF("doc_id", "text"))
    val (_, vocab, seg) = TextAnalysis.unigramFit(multi, "text",
      TextAnalysis.UniIters, charCoverage = true)
    // the backtrace emits pieces back-to-front: reversed concatenation
    // must reproduce every word type exactly (losslessness), CJK and
    // emoji included
    seg.collect().foreach { r =>
      val word = r.getString(0)
      val pieces = r.getSeq[String](2)
      assert(pieces.reverse.mkString == word, s"$word from $pieces")
    }
    // the coverage guarantee proper: every character of the corpus is a
    // piece of the FINAL vocabulary (cnt >= 1), so any new string over
    // this character set remains encodable — scripts included
    val vs = vocab.collect().map(_.getString(0)).toSet
    val chars = multi.select(org.apache.spark.sql.functions.expr(
        "explode(flatten(transform(filter(split(text, '\\\\s+'), x -> x <> ''), " +
        "w -> transform(sequence(1, length(w)), i -> substring(w, i, 1)))))"))
      .collect().map(_.getString(0)).toSet
    assert(chars.subsetOf(vs), (chars -- vs).toString)
    assert(Seq("你", "好", "世", "界", "😀", "é").forall(vs.contains))
  }
}
