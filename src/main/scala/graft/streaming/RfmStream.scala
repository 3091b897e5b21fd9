package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.Relational

/**
 * Streaming RFM register maintenance — the live twin of
 * [[graft.ext.Relational.rfmSegments]] (VERDICT r8 ask #8).
 *
 * The batch operator splits into two halves, and only one of them is a
 * stream: the per-customer rollup (`last_day` = max, `n_orders` =
 * count, `spend_e4` = sum) is three associative + commutative folds,
 * so a built-in streaming aggregation in Update mode maintains the
 * EXACT batch frame under any micro-batch slicing or arrival order —
 * no custom state function, no watermark (a register never finalizes;
 * every order moves its customer monotonically). The tercile scoring
 * half is snapshot-time by nature — recency needs the corpus-max
 * anchor and the tercile thresholds rank customers against each other,
 * and neither is additive as orders arrive (a new corpus-max day
 * re-buckets every customer's `days_since`) — so it runs as the same
 * histogram-sketch batch query ([[Relational.rfmSegmentsFromRollup]])
 * over any snapshot of the register sink, sharing the scoring code
 * verbatim with batch. Parity is spec-pinned: registers streamed in
 * shuffled micro-batches, then scored, equal batch `rfmSegments` row
 * for row.
 *
 * State: one 4-int64 register row per customer — the CRM register
 * table itself, the same per-key-register shape as
 * [[SnapshotStream.mergeDeltas]] and the decayed-engagement state.
 * Update mode emits a customer's row only in micro-batches that
 * touched it, so the sink is an idempotent changelog whose
 * latest-row-per-key view IS the current register table.
 */
object RfmStream {

  /** The streaming face: [[Relational.rfmRollup]] applied to an
    * unbounded `orders` frame (o_custkey, o_orderdate, o_totalprice).
    * Run in Update output mode; state is one register row/customer. */
  def customerRegisters(orders: DataFrame): DataFrame =
    Relational.rfmRollup(orders)

  /** Latest register per customer from an Update-mode changelog sink.
    * `n_orders` strictly increases across a customer's emissions (a row
    * is emitted only when new orders arrived for that key), so the
    * max-count row per key is the current register — the same
    * last-writer-wins snapshot read as the CDC merge sink. */
  def registerSnapshot(changelog: DataFrame): DataFrame = {
    val latest = changelog.groupBy("o_custkey")
      .agg(max(struct(col("n_orders"), col("last_day"), col("spend_e4")))
        .as("r"))
    latest.select(col("o_custkey"), col("r.last_day").as("last_day"),
      col("r.n_orders").as("n_orders"), col("r.spend_e4").as("spend_e4"))
  }
}
