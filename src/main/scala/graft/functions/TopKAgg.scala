package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * Bounded-heap per-group top-k — the typed [[Aggregator]] (UDAF tier)
 * that replaces the window-sort idiom for "top k rows per group".
 *
 * The standard spelling,
 * `row_number() OVER (PARTITION BY g ORDER BY v DESC)  <= k`, SORTS every
 * group's full row set inside the exchange — at a billion rows per group
 * that is the whole group spilled and sorted to keep 3 rows of it. This
 * aggregator keeps a k-bounded buffer instead: `reduce` inserts only when
 * the candidate beats the current k-th (or the buffer is short), `merge`
 * concatenates two ≤k buffers and re-trims — associative, commutative,
 * and O(k) state — so Catalyst plans a plain hash aggregate with map-side
 * partials and NO sort of group contents ever happens (plan-pinned in
 * TopKAggSpec).
 *
 * Ordering is total and engine-reproducible: value DESC, then id ASC as
 * the tie-break — the same (snapped-value, id) determinism convention as
 * every ranked contract query. Both value and id are int64; callers with
 * double scores snap-scale them to int64 first (the gate grid makes that
 * exact), keeping comparisons ulp-proof.
 *
 * `finish` emits the ranked entries as `[value, id]` pairs in rank
 * order; explode + posexplode turns them into (rank, id, value) rows.
 */
final case class TopKEntry(value: Long, id: Long)

class TopKAgg(k: Int)
    extends Aggregator[TopKEntry, Seq[TopKEntry], Seq[Seq[Long]]] {
  require(k >= 1, "k must be at least 1")

  private def ord: Ordering[TopKEntry] =
    Ordering.by(e => (-e.value, e.id))

  override def zero: Seq[TopKEntry] = Seq.empty

  override def reduce(b: Seq[TopKEntry], a: TopKEntry): Seq[TopKEntry] = {
    // the buffer is kept sorted by construction (zero is empty, merge
    // re-sorts), so an accepted row binary-inserts in O(log k) compares +
    // one O(k) splice instead of re-sorting the whole buffer per row
    // (ADVICE r8: O(k log k) per input on the hot aggregation path)
    val full = b.lengthCompare(k) >= 0
    if (full && ord.lteq(b.last, a)) b
    else {
      var lo = 0
      var hi = b.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (ord.lt(b(mid), a)) lo = mid + 1 else hi = mid
      }
      val (pre, post) = b.splitAt(lo)
      (pre :+ a) ++ (if (full) post.dropRight(1) else post)
    }
  }

  override def merge(b1: Seq[TopKEntry], b2: Seq[TopKEntry]): Seq[TopKEntry] =
    (b1 ++ b2).sorted(ord).take(k)

  override def finish(r: Seq[TopKEntry]): Seq[Seq[Long]] =
    r.sorted(ord).map(e => Seq(e.value, e.id))

  override def bufferEncoder: Encoder[Seq[TopKEntry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[TopKEntry]]()

  override def outputEncoder: Encoder[Seq[Seq[Long]]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Seq[Long]]]()
}
