package graft.ext

import org.apache.spark.sql.SparkSession

import graft.SparkSpec
import graft.core.{CosineAnalysis, MatrixElement}

class SparseAnnSpec extends SparkSpec {
  implicit lazy val s: SparkSession = spark
  import s.implicits._

  private def analysis = new CosineAnalysis(spark, axis = "y")

  // 20 vectors over 6 coordinates, varied support
  private lazy val matrix = {
    val sess = spark
    import sess.implicits._
    (for { v <- 0 until 20; c <- 0 until 6 if (v + c) % 4 != 0 }
      yield MatrixElement(f"v$v%02d", s"c$c", ((v * c) % 7 + 1).toDouble)).toDS()
  }

  test("topSimilarAnn ranks candidates by exact dense cosine, equi-join plan") {
    val ann = SparseAnn.topSimilarAnn(analysis, matrix, k = 3)
    val plan = ann.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
    val rows = ann.collect()
    assert(rows.nonEmpty)
    // per-vector: ranks are 1..n without gaps, similarities non-increasing
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length).toSeq)
      assert(sorted.length <= 3)
      val sims = sorted.map(_.getDouble(3))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
    // every reported similarity equals the exact dense-cosine value for
    // that pair (snapped) — ANN changes the candidate set, never the value
    val exact = analysis.fit(matrix, isSparse = false).allSimilarityValue
      .collect().flatMap { sv =>
        val snapped = math.floor(sv.similarity_value * 1e6 + 0.50001) / 1e6
        Seq((sv.vector0, sv.vector1) -> snapped, (sv.vector1, sv.vector0) -> snapped)
      }.toMap
    rows.foreach { r =>
      val key = (r.getString(0), r.getString(2))
      assertApprox(r.getDouble(3), exact(key), 1e-9)
    }
  }

  test("predictMissingAnn fills only missing cells, equi-join plan") {
    val p = SparseAnn.predictMissingAnn(analysis, matrix, neighbors = 3)
    val plan = p.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
    val preds = p.collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
    assert(preds.nonEmpty)
    val existing = matrix.collect().map(m => (m.y, m.x)).toSet
    assert(preds.forall { case (k, _) => !existing.contains(k) })
    // weights are positive-similarity weighted means of normalized values
    // in [0, 1], so predictions stay in (0, 1]
    assert(preds.forall { case (_, v) => v > 0.0 && v <= 1.0 + 1e-9 })
  }

  test("buckets: sign pattern is deterministic and bounded to Planes bits") {
    val n = analysis.normalize(matrix).toDF()
      .select($"y".as("vector"), $"x".as("coord"), $"normalized_value".as("nv"))
    val b1 = SparseAnn.buckets(n, "vector", "coord", "nv").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val b2 = SparseAnn.buckets(n, "vector", "coord", "nv").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(b1 == b2)
    assert(b1.values.forall(b => b >= 0 && b < (1L << SparseAnn.Planes)))
  }
}
