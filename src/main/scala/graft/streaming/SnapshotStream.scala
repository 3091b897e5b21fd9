package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One commit-log row: an upsert (`op` anything but "D") or tombstone
  * ("D") for `doc_id` at `version`. Versions are unique per key — the
  * commit-log invariant table formats enforce at write time. */
final case class Commit(doc_id: Long, version: Long, op: String, text: String)

/**
 * Streaming CDC view maintenance — the live twin of
 * [[graft.ext.Audit.mergeSnapshots]]: commits arrive as an unbounded
 * stream and the operator maintains, per key, the highest-version row;
 * a sink's last-row-per-key view filtered to `op <> 'D'` IS the current
 * merged snapshot at every instant.
 *
 * Latest-version-wins is an associative, commutative max, so the result
 * is EXACT under any micro-batch slicing, replay, and out-of-order
 * arrival — no watermark, nothing to finalize (parity with the batch
 * twin is spec-pinned under a shuffled 3-way split). State is ONE
 * winner row per key, O(1) per key by construction. Update mode: a key
 * re-emits only when its winner actually changes, so replayed or stale
 * commits (version ≤ current winner) produce no output at all —
 * downstream sinks see an idempotent changelog.
 */
object SnapshotStream {

  def mergeDeltas(commits: Dataset[Commit]): Dataset[Commit] = {
    import commits.sparkSession.implicits._
    commits.groupByKey(_.doc_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (_: Long, batch: Iterator[Commit], state: GroupState[Commit]) =>
          val prior = state.getOption
          // maxBy keeps the FIRST max, and the prior winner iterates
          // first — a replayed equal-version commit can never usurp it
          val best = (prior.iterator ++ batch).maxBy(_.version)
          state.update(best)
          if (prior.contains(best)) Iterator.empty else Iterator.single(best)
      }
  }
}
