package graft.ext

import org.apache.spark.sql.SparkSession

import graft.SparkSpec

/** [[Graph.pageRank]]: hand-computed ranks on a tiny graph, mass
  * conservation, hub dominance, and the per-iteration plan shape. */
class GraphSpec extends SparkSpec {
  implicit lazy val s: SparkSession = spark
  import s.implicits._

  // undirected (symmetrized) star: hub h ↔ a, b, c — plus a 2-cycle x ↔ y
  private lazy val star = Seq(
    ("h", "a", 1L), ("a", "h", 1L),
    ("h", "b", 1L), ("b", "h", 1L),
    ("h", "c", 1L), ("c", "h", 1L),
    ("x", "y", 1L), ("y", "x", 1L)
  ).toDF("src", "dst", "weight")

  private def ranksOf(iters: Int): Map[String, Double] =
    Graph.pageRank(star, iters).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("one iteration matches the hand-computed update") {
    val r = ranksOf(1)
    val n = 6.0
    val base = (1.0 - 0.85) / n
    // leaves a,b,c: only in-edge is h, whose out-mass splits 3 ways
    assertApprox(r("a"), base + 0.85 * (1.0 / n) / 3.0, 1e-12)
    // hub: receives all of a, b, c
    assertApprox(r("h"), base + 0.85 * 3.0 * (1.0 / n), 1e-12)
    // cycle nodes swap their full mass
    assertApprox(r("x"), base + 0.85 * (1.0 / n), 1e-12)
  }

  test("rank mass is conserved and the hub dominates its leaves") {
    val r = ranksOf(5)
    // no dangling nodes after symmetrization → total mass stays 1
    assertApprox(r.values.sum, 1.0, 1e-9)
    assert(r("h") > r("a") && r("a") > 0.0)
    // symmetric leaves tie exactly
    assertApprox(r("a"), r("b"), 0.0)
    assertApprox(r("a"), r("c"), 0.0)
    // the 2-cycle keeps its initial mass split evenly
    assertApprox(r("x"), r("y"), 0.0)
  }

  test("zero iterations return the uniform prior") {
    val r = ranksOf(0)
    r.values.foreach(v => assertApprox(v, 1.0 / 6.0, 1e-12))
  }

  test("weighted edges bias the walk proportionally") {
    val g = Seq(
      ("u", "a", 3L), ("u", "b", 1L),
      ("a", "u", 1L), ("b", "u", 1L)
    ).toDF("src", "dst", "weight")
    val r = Graph.pageRank(g, 1).collect()
      .map(x => x.getString(0) -> x.getDouble(1)).toMap
    // u routes 3/4 of its mass to a, 1/4 to b
    assert(r("a") > r("b"))
    assertApprox(r("a") - r("b"),
      0.85 * (1.0 / 3.0) * (3.0 / 4.0 - 1.0 / 4.0), 1e-12)
  }

  test("each iteration plans an edge join + dst aggregate, no cartesian") {
    val q = Graph.pageRank(star, 2)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
