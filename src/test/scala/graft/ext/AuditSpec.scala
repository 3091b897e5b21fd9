package graft.ext

import org.apache.spark.sql.SparkSession

import graft.SparkSpec

class AuditSpec extends SparkSpec {
  implicit lazy val s: SparkSession = spark
  import s.implicits._

  test("skewAudit: heavy keys first, exact fractions, topN cut") {
    // key 7 ×4, key 3 ×2, keys 1/2 ×1 each → 8 rows total
    val df = (Seq.fill(4)(7L) ++ Seq.fill(2)(3L) ++ Seq(1L, 2L)).toDF("k")
    val got = Audit.skewAudit(df, "k", topN = 3).collect()
      .map(r => (r.getLong(3), r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(got.length == 3) // topN cuts the 4 distinct keys to 3
    assert(got(0) == ((1L, 7L, 4L, 0.5)))
    assert(got(1) == ((2L, 3L, 2L, 0.25)))
    // count tie between keys 1 and 2 → smaller key ranks first
    assert(got(2) == ((3L, 1L, 1L, 0.125)))
  }

  test("skewAudit: scalar-broadcast plan only; fraction total is corpus-wide") {
    val df = (Seq.fill(9)(1L) ++ Seq(2L)).toDF("k")
    val audited = Audit.skewAudit(df, "k", topN = 1)
    val plan = audited.queryExecution.executedPlan.toString
    // the only join is the sanctioned 1-row total broadcast (no cartesian,
    // and the topN cut is a TakeOrdered, not a global sort)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
    val top = audited.collect()
    // fraction is n / TOTAL rows (10), not n / top-slice rows
    assert(top.length == 1 && top(0).getDouble(2) == 0.9)
  }

  test("corpusDiff classifies added/removed/changed/unchanged by content") {
    val oldSnap = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
      .toDF("doc_id", "text")
    val newSnap = Seq((1L, "alpha"), (2L, "beta v2"), (4L, "delta"))
      .toDF("doc_id", "text")
    val got = Audit.corpusDiff(oldSnap, newSnap, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  test("corpusDiff shuffles hashes, not texts") {
    val d = Seq((1L, "x")).toDF("doc_id", "text")
    val plan = Audit.corpusDiff(d, d, "doc_id", "text")
      .queryExecution.executedPlan.toString
    // the text column is hashed BELOW the join: only (doc_id, h_*)
    // columns reach the exchange, never the raw text
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("h_old") && plan.contains("h_new") &&
      !plan.contains("text#"), plan)
  }

  test("mergeSnapshots: latest version wins, tombstones drop, re-adds resurrect") {
    // key 1: plain upsert chain (v1 -> v2) — v2 payload wins
    // key 2: deleted at v2 — absent from the snapshot
    // key 3: deleted at v2, re-added at v3 — present with the v3 payload
    // key 4: only a tombstone — never present
    val commits = Seq(
      (1L, 1L, "U", "one"), (1L, 2L, "U", "one v2"),
      (2L, 1L, "U", "two"), (2L, 2L, "D", "two"),
      (3L, 1L, "U", "three"), (3L, 2L, "D", "three"), (3L, 3L, "U", "three v3"),
      (4L, 1L, "D", "four")
    ).toDF("doc_id", "version", "op", "text")
    val got = Audit.mergeSnapshots(commits, "doc_id", "version", "op")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
      .sortBy(_._1)
    assert(got.toSeq == Seq((1L, 2L, "one v2"), (3L, 3L, "three v3")))
  }

  test("mergeSnapshots resolves through one aggregate, no window sort") {
    val commits = Seq((1L, 1L, "U", "x")).toDF("doc_id", "version", "op", "text")
    val plan = Audit.mergeSnapshots(commits, "doc_id", "version", "op")
      .queryExecution.executedPlan.toString
    // arg-max aggregate with map-side partials; the row_number spelling
    // would show a Window + Sort pair here
    assert(plan.contains("max_by") && !plan.contains("Window"), plan)
  }

  test("contingencyStats: hand-computed chi2, Cramér's V, MI on a 2×2") {
    // 30/10/10/30 — a strongly associated square table
    def rows(a: String, b: String, n: Int) = Seq.fill(n)((a, b))
    val d = (rows("x", "u", 30) ++ rows("x", "v", 10) ++
      rows("y", "u", 10) ++ rows("y", "v", 30)).toDF("lang", "source")
    val r = Audit.contingencyStats(d, "lang", "source").collect().head
    assert(r.getAs[Long]("n") == 80L && r.getAs[Long]("dof") == 1L)
    // e = 20 per cell → chi2 = 4·(10²/20) = 20; V = sqrt(20/80) = 0.5
    assertApprox(r.getAs[Double]("chi2"), 20.0, 1e-9)
    assertApprox(r.getAs[Double]("cramers_v"), 0.5, 1e-9)
    val mi = 2 * (30.0 / 80) * math.log(1.5) + 2 * (10.0 / 80) * math.log(0.5)
    assertApprox(r.getAs[Double]("mi"), mi, 1e-9)
  }

  test("contingencyStats: independent table scores 0; single-level facet degrades") {
    def rows(a: String, b: String, n: Int) = Seq.fill(n)((a, b))
    val ind = (rows("x", "u", 10) ++ rows("x", "v", 10) ++
      rows("y", "u", 10) ++ rows("y", "v", 10)).toDF("lang", "source")
    val r = Audit.contingencyStats(ind, "lang", "source").collect().head
    assert(r.getAs[Double]("chi2") == 0.0 && r.getAs[Double]("cramers_v") == 0.0)
    assert(r.getAs[Double]("mi") == 0.0)
    // one source level only → dof 0, all stats 0, no division blow-up
    val flat = (rows("x", "u", 5) ++ rows("y", "u", 7)).toDF("lang", "source")
    val f = Audit.contingencyStats(flat, "lang", "source").collect().head
    assert(f.getAs[Long]("dof") == 0L && f.getAs[Double]("chi2") == 0.0)
    assert(f.getAs[Double]("cramers_v") == 0.0 && f.getAs[Double]("mi") == 0.0)
  }
}
