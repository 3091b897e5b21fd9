package graft.core

import org.apache.spark.sql.types.{DecimalType, StructField, StructType, StringType}
import org.apache.spark.sql.Row

import graft.SparkSpec

/** Specs for the scale-shape fixes: bucketed dense pairs, subset semi-join
  * path, ungated broadcast removal, and the Decimal ingest boundary. */
class ScaleShapeSpec extends SparkSpec {

  private def analysis = new CosineAnalysis(spark, axis = "y")

  private lazy val matrix = {
    val s = spark
    import s.implicits._
    // 40 vectors over a few shared coordinates
    (for { v <- 0 until 40; c <- 0 until 5 if (v + c) % 3 != 0 }
      yield MatrixElement(f"v$v%02d", s"c$c", (v % 7 + 1).toDouble)).toDS()
  }

  test("pairModsDense (bucketed) emits exactly the canonical C(V,2) pairs") {
    val mods = analysis.vectorMods(analysis.normalize(matrix))
    val got = analysis.pairModsDense(mods, buckets = 4).collect()
    assert(got.length == 40 * 39 / 2)
    assert(got.forall(p => p.vector0 > p.vector1))
    // values must agree with the per-vector norm table
    val nm = mods.collect().map(m => m.vector -> m.mod).toMap
    got.take(50).foreach { p =>
      assertApprox(p.mod1, nm(p.vector0)); assertApprox(p.mod2, nm(p.vector1))
    }
    // and be independent of the bucket count
    val one = analysis.pairModsDense(mods, buckets = 1).collect()
      .map(p => (p.vector0, p.vector1)).toSet
    assert(one == got.map(p => (p.vector0, p.vector1)).toSet)
  }

  test("pairModsDense plans an equi-join, not a nested loop") {
    val mods = analysis.vectorMods(analysis.normalize(matrix))
    val plan = analysis.pairModsDense(mods).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
  }

  test("similarity: large subsets route through semi-joins, same result") {
    val m = analysis.fit(matrix, isSparse = false)
    val small = Seq("v00", "v01", "v02")
    val viaIsin = m.similarity(small).collect()
      .map(s => (s.vector0, s.vector1) -> s.similarity_value).toMap
    // force the semi-join path by exceeding IsinMaxSize with padding ids
    val padded = small ++ (0 until 120).map(i => s"zz$i")
    val viaSemi = m.similarity(padded).collect()
      .map(s => (s.vector0, s.vector1) -> s.similarity_value).toMap
    assert(viaIsin.keySet == viaSemi.keySet)
    viaIsin.foreach { case (k, v) => assertApprox(viaSemi(k), v) }
    intercept[IllegalArgumentException](m.similarity(Nil))
  }

  test("Decimal ingest: DecimalType(38,0) values accepted at the boundary") {
    val rows = java.util.Arrays.asList(
      Row("A", "t1", BigDecimal(2).bigDecimal),
      Row("A", "t2", BigDecimal(4).bigDecimal),
      Row("B", "t1", BigDecimal(1).bigDecimal))
    val schema = StructType(Seq(
      StructField("y", StringType), StructField("x", StringType),
      StructField("value", DecimalType(38, 0))))
    val ds = MatrixElement.from(spark.createDataFrame(rows, schema))
    val mv = analysis.maxValues(ds).collect().map(m => m.axis -> m.max_value).toMap
    assert(mv == Map("A" -> 4.0, "B" -> 1.0))
  }
}
