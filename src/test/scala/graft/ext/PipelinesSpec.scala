package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * The training-set-sized selection cut: [[Export.globalTopM]] must
 * reproduce `orderBy().limit(m)`'s rows and ranks exactly — including
 * ties resolved by the id column across bucket boundaries — while
 * planning NO GlobalLimit/TakeOrdered single-task sink, and
 * [[Pipelines.selectCorpusShards]] must agree with [[Pipelines
 * .selectCorpus]] row for row and rank for rank.
 */
class PipelinesSpec extends SparkSpec {
  implicit lazy val s: SparkSession = spark
  import s.implicits._

  test("globalTopM: exact global ranks, ties unsplit, no single-task limit sink") {
    // 500 rows over only 7 distinct keys — every bucket boundary falls on
    // a tie run, the case that breaks any boundary-straddling rank scheme
    val df = (0 until 500).map(i => ((i * 13 % 500).toLong, (i % 7).toLong))
      .toDF("id", "key")
    val m = 123L
    val got = Export.globalTopM(df, "key", "id", m, parts = 8, width = 1)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("TakeOrderedAndProject") && !plan.contains("GlobalLimit"),
      plan)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan)
    val rows = got.select("rank", "id", "key").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val expected = df.orderBy(col("key").asc, col("id").asc).limit(m.toInt)
      .select("id", "key").collect().map(r => (r.getLong(0), r.getLong(1)))
      .zipWithIndex.map { case ((id, key), i) => (i + 1L, id, key) }
    assert(rows.toSeq === expected.toSeq)
  }

  test("globalTopM: m larger than the corpus ranks every row") {
    val df = (0 until 40).map(i => (i.toLong, (40 - i).toLong)).toDF("id", "key")
    val rows = Export.globalTopM(df, "key", "id", m = 1000, parts = 4, width = 4)
      .select("rank", "id").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    assert(rows.length === 40)
    // key = 40 - id, so ascending key order is descending id order
    assert(rows.toSeq === (1 to 40).map(r => (r.toLong, (40 - r).toLong)))
  }

  private val W = Seq("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
    "golf", "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango")

  /** 30 raw docs with varied vocab, 6 target-domain docs, 3 eval docs —
    * enough survivors past the quality/dedup gates for a top-10 cut. */
  private lazy val docs: DataFrame = {
    val rows =
      (1 to 30).map { i =>
        val ws = (0 until 12).map(j => W((i * 3 + j * 5 + j * j) % W.size))
        (i.toLong, ws.mkString(" "), "raw")
      } ++ (31 to 36).map { i =>
        (i.toLong, (0 until 12).map(j => W((i + j) % 6)).mkString(" "), "tgt")
      } ++ (37 to 39).map { i =>
        (i.toLong, (0 until 12).map(j => W((i * 2 + j) % W.size)).mkString(" "), "ev")
      }
    rows.toDF("doc_id", "text", "source")
  }

  test("selectCorpusShards: same rows and ranks as selectCorpus, rank-derived shards") {
    val m = 10
    val base = Pipelines.selectCorpus(docs, "doc_id", "text", "source",
        "ev", "tgt", m)
      .select("doc_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._2)
    assert(base.length >= 5)
    val sharded = Pipelines.selectCorpusShards(docs, "doc_id", "text", "source",
      "ev", "tgt", m, nShards = 4, parts = 4, width = 100000L)
    val plan = sharded.queryExecution.executedPlan.toString
    assert(!plan.contains("TakeOrderedAndProject") && !plan.contains("GlobalLimit"),
      plan)
    val rows = sharded.select("doc_id", "rank", "shard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._2)
    assert(rows.map(t => (t._1, t._2)).toSeq === base.toSeq)
    rows.foreach { case (_, rank, shard) =>
      assert(shard === (rank - 1) * 4 / m)
    }
  }
}
