package graft.ext

import org.apache.spark.sql.SparkSession

import graft.SparkSpec
import graft.core.CosineAnalysis

/** The hashing-trick bridge ([[TextAnalysis.featureHash]]): text in,
  * fixed-dimension COO vectors out, straight into the cosine core. */
class FeatureHashSpec extends SparkSpec {
  implicit lazy val s: SparkSession = spark
  import s.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog today"),
    (2L, "the quick brown fox jumps over the lazy dog today"),
    (3L, "the quick brown fox jumps over the sleepy dog today"),
    (4L, "completely different words about spark query engines here now")
  ).toDF("doc_id", "text")

  test("buckets bounded by dim; counts sum to token counts; dups identical") {
    val fh = TextAnalysis.featureHash(docs, "doc_id", "text")
    val rows = fh.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.forall { case (_, j, _) => j >= 0 && j < TextAnalysis.FeatureHashDim })
    val perDoc = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(perDoc == Map(1L -> 10.0, 2L -> 10.0, 3L -> 10.0, 4L -> 9.0))
    val v1 = rows.filter(_._1 == 1L).map(r => (r._2, r._3)).toSet
    val v2 = rows.filter(_._1 == 2L).map(r => (r._2, r._3)).toSet
    assert(v1 == v2 && v1.nonEmpty)
  }

  test("hashed vectors drive the cosine core: dups at 1, unrelated low") {
    val analysis = new CosineAnalysis(spark, axis = "y")
    val model = analysis.fit(
      TextAnalysis.featureHashMatrix(docs, "doc_id", "text"), isSparse = false)
    val sims = model.allSimilarityValue.collect()
      .map(x => (x.vector0, x.vector1) -> x.similarity_value).toMap
    assertApprox(sims(("2", "1")), 1.0)
    assert(sims(("3", "1")) > 0.6, "near-dup text must stay close under hashing")
    assert(sims(("4", "1")) < sims(("3", "1")),
      "unrelated text must score below the near-dup")
  }

  test("one exchange: the (doc, bucket) aggregate is the only shuffle") {
    val plan = TextAnalysis.featureHash(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1, plan)
  }
}
