package graft.ext

import graft.SparkSpec

class ExportSpec extends SparkSpec {
  import spark.implicits._

  private def ids(n: Int) = (0L until n.toLong).toDF("doc_id")

  test("splitAssign covers every doc exactly once with plausible fractions") {
    val n = 5000
    val out = Export.splitAssign(ids(n), "doc_id").collect()
    assert(out.length == n)
    val byS = out.groupBy(_.getString(2)).map { case (k, v) => k -> v.length }
    // expected 80/10/10; the 2-round mix should land within ±3% absolute
    assert(math.abs(byS("train") - 0.8 * n) < 0.03 * n, byS)
    assert(math.abs(byS("val") - 0.1 * n) < 0.03 * n, byS)
    assert(math.abs(byS("test") - 0.1 * n) < 0.03 * n, byS)
    // split is consistent with the emitted bucket
    out.foreach { r =>
      val (b, s) = (r.getLong(1), r.getString(2))
      assert(s == (if (b < 800) "train" else if (b < 900) "val" else "test"))
    }
  }

  test("splitAssign is stable: a doc's split never depends on the rest") {
    val all = Export.splitAssign(ids(1000), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val subset = Export.splitAssign(
      ids(1000).where($"doc_id" % 7 === 0), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    subset.foreach { case (id, s) => assert(all(id) == s, s"doc $id flipped") }
  }

  test("splitAssign salt reshuffles assignments") {
    val a = Export.splitAssign(ids(1000), "doc_id", salt = 0L)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val b = Export.splitAssign(ids(1000), "doc_id", salt = 12345L)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(a.count { case (id, s) => b(id) != s } > 100,
      "different salts should move a sizable fraction of docs")
  }

  test("shardAssign: positions are a 0..n-1 permutation per shard, deterministic") {
    val out = Export.shardAssign(ids(2000), "doc_id", nShards = 8).collect()
    assert(out.length == 2000)
    out.groupBy(_.getLong(1)).foreach { case (shard, rows) =>
      val ps = rows.map(_.getLong(2)).sorted
      assert(ps.toSeq == (0L until rows.length.toLong).toSeq,
        s"shard $shard positions not contiguous")
    }
    // re-run is byte-identical
    val again = Export.shardAssign(ids(2000), "doc_id", nShards = 8).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq ==
      again.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq)
  }

  test("shardManifest: totals cover the corpus; any mutation changes its shard row") {
    val docs = (0L until 200L).map(i => (i, s"tok$i word$i end$i"))
      .toDF("doc_id", "text")
    val m = Export.shardManifest(docs, "doc_id", "text", nShards = 4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(m.keySet == Set(0L, 1L, 2L, 3L))
    assert(m.values.map(_._1).sum == 200L, "every doc in exactly one shard")
    assert(m.values.map(_._2).sum ==
      docs.collect().map(_.getString(1).length.toLong).sum)
    // mutating one document changes exactly that document's shard row
    val mutated = docs.withColumn("text",
      org.apache.spark.sql.functions.when($"doc_id" === 7L,
        org.apache.spark.sql.functions.lit("something else entirely"))
        .otherwise($"text"))
    val m2 = Export.shardManifest(mutated, "doc_id", "text", nShards = 4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val changed = m.keySet.filter(k => m(k) != m2(k))
    assert(changed.size == 1, s"exactly one shard row changes, got $changed")
    assert(m.values.map(_._1).sum == m2.values.map(_._1).sum)
    // re-run on identical input is byte-identical
    val again = Export.shardManifest(docs, "doc_id", "text", nShards = 4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(again == m)
  }

  test("shardAssign order within a shard is not id order (it is a shuffle)") {
    val out = Export.shardAssign(ids(2000), "doc_id", nShards = 2).collect()
    val shard0 = out.filter(_.getLong(1) == 0L).sortBy(_.getLong(2)).map(_.getLong(0))
    assert(shard0.toSeq != shard0.sorted.toSeq,
      "within-shard order should be hash order, not ingestion order")
  }

  test("plan: shardAssign is one exchange; splitAssign is exchange-free") {
    val splitPlan = Export.splitAssign(ids(100), "doc_id")
      .queryExecution.executedPlan.toString
    assert(!splitPlan.contains("Exchange"), splitPlan)
    val shardPlan = Export.shardAssign(ids(100), "doc_id", 4)
      .queryExecution.executedPlan.toString
    assert(shardPlan.split("Exchange").length - 1 == 1, shardPlan)
  }

  test("splitAssignByGroup: groups move atomically, id-hash split leaks") {
    val n = 2000
    // synthetic grouping: docs pair up (2k, 2k+1) under rep 2k — the
    // near-dup-group shape dupGroups emits
    val groups = ids(n)
      .selectExpr("doc_id", "doc_id - (doc_id % 2) AS group_rep")
    val byGroup = Export.splitAssignByGroup(ids(n), "doc_id", groups)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(byGroup.length == n)
    // atomic: every group's members share one split
    byGroup.groupBy(_._2).foreach { case (rep, ms) =>
      assert(ms.map(_._3).distinct.length == 1, s"group $rep split apart") }
    // fractions still hold (group reps hash uniformly)
    val byS = byGroup.groupBy(_._3).map { case (k, v) => k -> v.length }
    assert(math.abs(byS("train") - 0.8 * n) < 0.04 * n, byS)
    // and the plain id-hash split DOES separate many of these pairs —
    // the leakage this operator exists to close
    val plain = Export.splitAssign(ids(n), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val leaked = (0 until n / 2).count(k => plain(2L * k) != plain(2L * k + 1))
    assert(leaked > n / 10, s"expected id-hash leakage, got $leaked")
  }

  test("splitAssignByGroup singletons match splitAssign exactly") {
    // identity grouping (every doc its own rep) must reproduce the
    // id-hash split bit for bit — the degradation contract
    val groups = ids(500).selectExpr("doc_id", "doc_id AS group_rep")
    val a = Export.splitAssignByGroup(ids(500), "doc_id", groups)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val b = Export.splitAssign(ids(500), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(a == b)
  }

  test("rangeShards: shards are key-monotone, (shard, pos) totally orders") {
    val s2 = spark
    import s2.implicits._
    // keys 0..399 (uniform); 4 shards, width 10 → boundaries near 100/200/300
    val df = (0L until 400L).map(i => (i, (i * 7) % 400)).toDF("doc_id", "k")
    val r = Export.rangeShards(df, "doc_id", "k", nShards = 4, width = 10L)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.length === 400)
    // range property: every key in shard s ≤ every key in shard s+1
    val byShard = r.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    val shards = byShard.keys.toSeq.sorted
    assert(shards === Seq(0L, 1L, 2L, 3L))
    shards.sliding(2).foreach {
      case Seq(a, b) => assert(byShard(a).max <= byShard(b).min)
      case _ =>
    }
    // balanced to the bucket envelope (width 10 on 100-per-shard targets)
    byShard.values.foreach(v => assert(math.abs(v.size - 100) <= 10, v.size))
    // pos is a dense 0..n-1 order by (key, id) within each shard
    r.groupBy(_._3).values.foreach { rows =>
      val sorted = rows.sortBy(x => (x._2, x._1))
      assert(sorted.map(_._4).toSeq === rows.indices.map(_.toLong))
    }
  }

  test("rangeShards: a value heavier than a shard never splits") {
    val s2 = spark
    import s2.implicits._
    // 80% of rows share key 5 → several quantile boundaries collapse on
    // it; the heavy key must land in ONE shard (duplicate-bound dedup)
    val df = ((0L until 80L).map(i => (i, 5L)) ++
      (80L until 100L).map(i => (i, 100L + i))).toDF("doc_id", "k")
    val r = Export.rangeShards(df, "doc_id", "k", nShards = 4, width = 1L)
      .collect().map(x => (x.getLong(1), x.getLong(2)))
    assert(r.filter(_._1 == 5L).map(_._2).distinct.length === 1)
  }

  test("mixBucketLong equals the Column spelling over ids and salts") {
    val s2 = spark
    import s2.implicits._
    for (salt <- Seq(0L, 7L, 123456L); buckets <- Seq(2, 10, 1000)) {
      import org.apache.spark.sql.functions.col
      val viaCol = (0L until 500L).toDF("id")
        .select(col("id"), Export.mixBucket(col("id"), buckets, salt).as("b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      (0L until 500L).foreach { id =>
        assert(Export.mixBucketLong(id, buckets, salt) === viaCol(id),
          s"id=$id salt=$salt buckets=$buckets")
      }
    }
  }

  test("rangeShards plans a map stage + one shard-keyed window, no join") {
    val s2 = spark
    import s2.implicits._
    val df = (0L until 100L).map(i => (i, i)).toDF("doc_id", "k")
    val plan = Export.rangeShards(df, "doc_id", "k", nShards = 4, width = 10L)
      .queryExecution.executedPlan.toString
    // boundaries were eagerly fit and compiled into literals — the
    // assignment plan itself has no join of any kind
    assert(!plan.contains("Join"), plan)
    assert(plan.split("\n").count(_.contains("Window [")) === 1, plan)
  }
}
