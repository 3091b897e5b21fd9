package graft.ext

import org.apache.spark.sql.SparkSession

import graft.SparkSpec

/**
 * Property check for the distributed BPE fit: on seeded pseudo-random
 * corpora over a tiny alphabet (maximizing repeated pairs, overlaps, and
 * count ties), the learned rule sequence must equal an independent
 * plain-Scala reference implementation of greedy BPE — same
 * most-frequent-pair selection, same (count DESC, pair ASC) tie-break,
 * same greedy left-to-right overlap semantics.
 */
class BpePropertySpec extends SparkSpec {
  implicit lazy val s: SparkSession = spark
  import s.implicits._

  /** Reference BPE over a word-frequency map: straight-line Scala. */
  private def referenceBpe(words: Map[String, Long],
      rounds: Int): Seq[(String, String, Long)] = {
    var syms: Map[Vector[String], Long] = words.toSeq
      .map { case (w, n) => w.toVector.map(_.toString) -> n }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val out = Seq.newBuilder[(String, String, Long)]
    var done = false
    for (_ <- 1 to rounds if !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((sy, n) <- syms; i <- 0 until sy.length - 1)
        counts((sy(i), sy(i + 1))) = counts.getOrElse((sy(i), sy(i + 1)), 0L) + n
      if (counts.isEmpty) done = true
      else {
        val ((a, b), cnt) = counts.toSeq
          .minBy { case ((x, y), c) => (-c, x, y) }
        out += ((a, b, cnt))
        syms = syms.toSeq.map { case (sy, n) =>
          val buf = Vector.newBuilder[String]
          var i = 0
          while (i < sy.length) {
            if (i + 1 < sy.length && sy(i) == a && sy(i + 1) == b) {
              buf += a + b; i += 2
            } else { buf += sy(i); i += 1 }
          }
          buf.result() -> n
        }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      }
    }
    out.result()
  }

  test("learned rules equal the reference on seeded random corpora") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      // 2-letter alphabet, word lengths 1..6: dense in overlapping runs
      // (aaa/abab) and in exact count ties
      val words = Seq.fill(40)(
        Seq.fill(1 + rnd.nextInt(6))("ab" (rnd.nextInt(2))).mkString)
      val text = words.mkString(" ")
      val want = referenceBpe(
        words.groupBy(identity).view.mapValues(_.size.toLong).toMap, 4)
      val got = TextAnalysis
        .bpeMerges(Seq((0L, text)).toDF("doc_id", "text"), "doc_id", "text", 4)
        .orderBy("round").collect()
        .map(r => (r.getAs[String]("sym_a"), r.getAs[String]("sym_b"),
          r.getAs[Long]("pair_count")))
        .toSeq
      assert(got === want, s"trial $trial corpus: $text")
    }
  }
}
