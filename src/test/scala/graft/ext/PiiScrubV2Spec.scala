package graft.ext

import org.apache.spark.sql.{Row, SparkSession}

import graft.SparkSpec

class PiiScrubV2Spec extends SparkSpec {
  implicit lazy val s: SparkSession = spark
  import s.implicits._

  private def scrub(rows: (Long, String)*): Map[Long, Row] =
    TextAnalysis.piiScrubV2(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap

  private def counts(r: Row): (Long, Long, Long, Long, Long, Long, Long) =
    (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
      r.getLong(6), r.getLong(7))

  test("luhn fold separates valid from invalid card numbers") {
    val m = scrub(
      (1L, "pay 4532015112830366 now"),        // valid
      (2L, "pay 4532015112830367 now"),        // same digits, bad check
      (3L, "pay 4111-1111-1111-1111 now"),     // valid, dashed
      (4L, "pay 4111 1111 1111 1112 now"))     // invalid, spaced
    // all four card-SHAPED runs are redacted (conservative scrub) ...
    (1L to 4L).foreach { id =>
      assert(m(id).getString(8).contains("<CARD>"), m(id).getString(8))
      assert(counts(m(id))._3 == 1L) // n_cardlike
    }
    // ... but only the Luhn-valid ones count as cards
    assert(counts(m(1L))._4 == 1L && counts(m(3L))._4 == 1L)
    assert(counts(m(2L))._4 == 0L && counts(m(4L))._4 == 0L)
  }

  test("IBAN is scrubbed before its digit tail can feed the card pattern") {
    // DE44500105175407324931 carries 18 straight digits after DE44 — an
    // unstaged card pass would claim 16 of them
    val m = scrub((1L, "wire to DE44500105175407324931 today"))
    val r = m(1L)
    assert(r.getString(8) == "wire to <IBAN> today", r.getString(8))
    val (_, ibans, cardlike, luhn, _, _, _) = counts(r)
    assert(ibans == 1L && cardlike == 0L && luhn == 0L)
  }

  test("dashed SSN attributes as SSN, not as a phone-shaped digit run") {
    val m = scrub((1L, "ssn 123-45-6789 on file"))
    val r = m(1L)
    assert(r.getString(8) == "ssn <SSN> on file", r.getString(8))
    val (_, _, _, _, ssns, _, phones) = counts(r)
    assert(ssns == 1L && phones == 0L)
  }

  test("all six classes attribute exactly once in one document") {
    val m = scrub((1L,
      "from a@b.org acct GB12GRAFT0000000042 card 4111 1111 1111 1111 " +
        "ssn 078-05-1120 host 10.1.0.3 tel +1 555-0142 end"))
    val r = m(1L)
    assert(counts(r) == ((1L, 1L, 1L, 1L, 1L, 1L, 1L)))
    assert(r.getString(8) ==
      "from <EMAIL> acct <IBAN> card <CARD> ssn <SSN> host <IP> tel <PHONE> end")
  }

  test("clean text is PII-free and v2 stays a zero-exchange map stage") {
    val df = TextAnalysis.piiScrubV2(
      Seq((1L, "a@b.co at 10.0.0.1 card 4532015112830366 GB12GRAFT0000000042 " +
        "078-05-1120 +1 555-0100")).toDF("doc_id", "text"), "doc_id", "text")
    val clean = df.collect().head.getString(8)
    Seq(TextAnalysis.EmailPattern, TextAnalysis.Ipv4Pattern,
      TextAnalysis.CardPattern, TextAnalysis.IbanPattern,
      TextAnalysis.SsnPattern, TextAnalysis.PhonePattern).foreach { p =>
      assert(!p.r.unanchored.matches(clean), s"$p still matches: $clean")
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
