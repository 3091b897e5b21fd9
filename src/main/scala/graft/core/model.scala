package graft.core

/**
 * Row types of the sparse-matrix cosine engine.
 *
 * The reference (SaltFishYe/Casf) models a sparse matrix as a COO triple
 * table — one row per non-zero cell — and derives all pairwise-similarity
 * structures from it relationally (reference: the seven case classes under
 * src/main/scala/com/saltfish/entity/). We keep the same public row
 * vocabulary but use `Double` for cell values internally: the reference's
 * `BigInt` (→ DecimalType(38,0)) is only exercised with small term counts,
 * and every downstream stage divides into `Double` anyway
 * (reference: analyse/MatrixCosineAnalyse.scala:96–99).
 */

/** One non-zero cell of the sparse matrix (reference: entity/MatrixElement.scala:3). */
final case class MatrixElement(y: String, x: String, value: Double)

object MatrixElement {

  /**
   * Ingest boundary: accept a COO frame whose `value` is any numeric type —
   * in particular the reference's BigInt, which arrives from parquet/JVM as
   * DecimalType(38,0) (SURVEY §7.3(5)) — and whose ids are any castable
   * type. Values are cast to Double once here; everything downstream
   * divides into Double anyway (reference MatrixCosineAnalyse.scala:96–99).
   */
  def from(
      df: org.apache.spark.sql.DataFrame,
      yCol: String = "y",
      xCol: String = "x",
      valueCol: String = "value"): org.apache.spark.sql.Dataset[MatrixElement] = {
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    df.select(
      col(yCol).cast("string").as("y"),
      col(xCol).cast("string").as("x"),
      col(valueCol).cast("double").as("value")).as[MatrixElement]
  }
}

/** Per-vector max — the normalization denominator (reference: entity/MaxValue.scala:3). */
final case class MaxValue(axis: String, max_value: Double)

/** Cell after division by its vector's max (reference: entity/NormalizedElement.scala:3). */
final case class NormalizedElement(y: String, x: String, normalized_value: Double)

/** Full L2 norm of one vector (reference: entity/VectorMod.scala:3). */
final case class VectorMod(vector: String, mod: Double)

/**
 * Pairwise norms for a vector pair, canonical order `vector0 > vector1`
 * (reference: entity/FactorMod.scala:3). In sparse mode the norms are
 * restricted to the pair's co-occurring coordinates; in dense mode they are
 * the full vector norms (see [[CosineAnalysis]]).
 */
final case class FactorMod(vector0: String, vector1: String, mod1: Double, mod2: Double)

/**
 * The two vectors' normalized values at one shared coordinate
 * (reference: entity/FactorNormalizedValue.scala:3).
 */
final case class FactorNormalizedValue(
    vector0: String,
    vector1: String,
    prediction_axis: String,
    value1: Double,
    value2: Double)

/** Final cosine similarity of one vector pair (reference: entity/SimilarityValue.scala:3). */
final case class SimilarityValue(vector0: String, vector1: String, similarity_value: Double)
