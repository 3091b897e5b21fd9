package graft.ext

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** The triangle kernel router (r13): the decision ladder flips across
  * the contract's regimes, [[Graph.autoTriangleTotal]]'s dispatch is
  * pinned against independently-spelled kernels, and the colorful
  * estimator's identities (n=1 ⇒ exact; est = n²·Σ_c C(k_c, 3) on a
  * clique, colors re-derived in plain Scala) hold exactly. */
class GraphAutoSpec extends SparkSpec {
  implicit lazy val s: SparkSession = spark
  import s.implicits._

  test("contract fixture: the choice flips exact/colorful across regimes") {
    val rows = graft.SparkEntry.queries("graph_triangles_auto")(
        spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) ->
        (r.getAs[String]("kernel"), r.getAs[Long]("n_colors"))).toMap
    assert(rows.keySet == Set("organic", "headed", "tight"))
    assert(rows("organic") == ("exact", 1L), rows.toString)
    assert(rows("headed")._1 == "colorful" && rows("headed")._2 >= 2L,
      rows.toString)
    assert(rows("tight")._1 == "colorful" && rows("tight")._2 >= 2L,
      rows.toString)
  }

  // A 24-node clique: C(24,3) = 2024 triangles, C(24,2) = 276 edges,
  // wedge surface (degree orientation) = exactly the triangle count.
  private lazy val clique = (for {
    i <- 0 until 24; j <- (i + 1) until 24
  } yield (i.toLong, j.toLong)).toDF("src", "dst")

  test("route surfaces are exact integers on the clique") {
    val r = Graph.triangleRoute(clique, budgetPerEdge = 1L).collect().head
    assert(r.getAs[Long]("n_nodes") == 24L)
    assert(r.getAs[Long]("n_edges") == 276L)
    assert(r.getAs[Long]("wedges") == 2024L)
    assert(r.getAs[Long]("budget_wedges") == 276L)
    // ⌈√(2024/276)⌉ = ⌈2.708⌉ = 3
    assert(r.getAs[Long]("n_colors") == 3L)
    assert(r.getAs[String]("kernel") == "colorful")
  }

  test("one color is the exact count; exact dispatch matches triangleCounts") {
    val one = Graph.colorfulTriangleTotal(clique, nColors = 1)
      .collect().head
    assert(one.getAs[Long]("triangles_est") == 2024L)
    assert(one.getAs[Long]("n_edges_sampled") == 276L)
    val auto = Graph.autoTriangleTotal(clique, budgetPerEdge = 8L)
      .collect().head // 2024 ≤ 8·276 → exact
    assert(auto.getAs[String]("kernel") == "exact")
    assert(auto.getAs[Long]("triangles") == 2024L)
    val perNode = Graph.triangleCounts(clique)
      .agg(org.apache.spark.sql.functions.sum("n_triangles"))
      .collect().head.getLong(0)
    assert(perNode == 3L * 2024L) // each triangle at its three corners
  }

  test("colorful estimate equals n²·Σ_c C(k_c,3), colors re-derived in Scala") {
    val n = 3
    // independent spelling of the color hash (plain Scala int64 math)
    def color(id: Long): Long = id * 2654435761L % 2147483647L % n
    val sizes = (0L until 24L).groupBy(color).values.map(_.size.toLong)
    val want = sizes.map(k => k * (k - 1) * (k - 2) / 6).sum * n * n
    val got = Graph.colorfulTriangleTotal(clique, nColors = n)
      .collect().head
    assert(got.getAs[Long]("triangles_est") == want,
      s"est ${got.getAs[Long]("triangles_est")} want $want sizes $sizes")
    // a near-balanced deterministic split keeps the clique estimate
    // inside ±35% of the true 2024 (8/8/8 would give 1512)
    assert(math.abs(want - 2024L) <= 708L, s"want $want")
    // and the routed dispatch executes exactly this kernel
    val auto = Graph.autoTriangleTotal(clique, budgetPerEdge = 1L)
      .collect().head
    assert(auto.getAs[String]("kernel") == "colorful")
    assert(auto.getAs[Long]("n_colors") == n.toLong)
    assert(auto.getAs[Long]("triangles") == want)
  }

  test("mixed graph: planted clique flips the route, then an edge-linear budget re-flips it") {
    // organic-ish sparse path 100..139 (no triangles) + the 24-clique
    val path = (100L until 139L).map(i => (i, i + 1)).toDF("src", "dst")
    val g = clique.unionByName(path)
    val tight = Graph.triangleRoute(g, budgetPerEdge = 1L).collect().head
    assert(tight.getAs[String]("kernel") == "colorful")
    // budget 7·315 = 2205 ≥ 2024 wedges → affordable → exact again
    val wide = Graph.triangleRoute(g, budgetPerEdge = 7L).collect().head
    assert(wide.getAs[String]("kernel") == "exact")
    // the path contributes 0 wedges under the degree orientation
    // (every out-degree ≤ 1), so the surface is the clique's alone
    assert(wide.getAs[Long]("wedges") == 2024L)
  }
}
