package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.ext.Audit

/**
 * [[SnapshotStream.mergeDeltas]] must agree with the batch
 * [[Audit.mergeSnapshots]] on the same commit log regardless of how the
 * log is sliced into micro-batches or reordered — latest-version-wins
 * is max, and max is associative/commutative, so parity is exact.
 */
class SnapshotStreamSpec extends SparkSpec {
  implicit lazy val s: SparkSession = spark
  import s.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  // upsert chain, delete, delete-then-resurrect, tombstone-only — the
  // same shapes the batch spec pins — deliberately NOT in version order
  private lazy val commits = Seq(
    Commit(1L, 2L, "U", "one v2"), Commit(1L, 1L, "U", "one"),
    Commit(2L, 1L, "U", "two"), Commit(2L, 2L, "D", "two"),
    Commit(3L, 3L, "U", "three v3"), Commit(3L, 1L, "U", "three"),
    Commit(3L, 2L, "D", "three"),
    Commit(4L, 1L, "D", "four"))

  private def snapshotOf(rows: Array[Commit]): Set[(Long, Long, String)] =
    rows.groupBy(_.doc_id).values
      .map(_.maxBy(_.version))
      .filter(_.op != "D")
      .map(c => (c.doc_id, c.version, c.text)).toSet

  test("streamed snapshot equals batch mergeSnapshots under sliced, shuffled input") {
    val batch = Audit.mergeSnapshots(
        commits.toDF("doc_id", "version", "op", "text"),
        "doc_id", "version", "op")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3))).toSet

    val in = MemoryStream[Commit]
    val q = SnapshotStream.mergeDeltas(in.toDS())
      .writeStream.format("memory").queryName("snap_merge")
      .outputMode(OutputMode.Update).start()
    try {
      // three uneven micro-batches, each internally out of order
      in.addData(commits.slice(0, 3): _*); q.processAllAvailable()
      in.addData(commits.slice(3, 4): _*); q.processAllAvailable()
      in.addData(commits.slice(4, 8): _*); q.processAllAvailable()
      val emitted = spark.table("snap_merge").as[Commit].collect()
      assert(snapshotOf(emitted) == batch)
      // per key the emitted changelog is strictly version-increasing
      // (stale arrivals are swallowed), so it is itself a clean CDC feed
      emitted.groupBy(_.doc_id).values.foreach { rs =>
        val vs = rs.map(_.version).toSeq
        assert(vs == vs.sorted && vs.distinct == vs, rs.mkString(","))
      }
      // replaying the entire log emits nothing: every version is stale
      val before = spark.table("snap_merge").count()
      in.addData(commits: _*); q.processAllAvailable()
      assert(spark.table("snap_merge").count() == before)
    } finally q.stop()
  }
}
