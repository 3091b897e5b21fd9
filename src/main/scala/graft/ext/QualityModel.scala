package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * In-engine quality-classifier training: batch-gradient-descent logistic
 * regression over the cheap per-document quality signals, labeled by the
 * rule-based gate ([[TextAnalysis.qualityFilter]]'s bounds). This is the
 * standard curation move — distill a hand-tuned hard gate into a SOFT
 * scorer whose probability survives threshold changes without a re-sweep
 * (and whose weights say which signal actually carries the gate).
 *
 * Scale shape: the feature frame is one row-local map stage over the
 * token arrays (zero exchanges — the [[TextAnalysis.stats]] idiom),
 * checkpointed once; each GD iteration is ONE distributed scan folding
 * into a (d+1)-double gradient row with map-side partials, collected to
 * the driver (a model-sized eager fit, the k-means/codebook sanction);
 * the weight vector re-enters the next scan as literals. That is the
 * textbook distributed-GD layout — iterations × one pass, nothing ever
 * shuffles wider than d+1 doubles.
 *
 * Determinism: features are exact-integer divisions (plus one ln); the
 * gradient/loss means carry cross-engine sum-order noise of ~1e-12 and
 * the sigmoid's exp an ulp — both absorbed by the harness's 1e-6 snap on
 * the EMITTED weights/loss. The z spelling is the same left-associative
 * `x0·w0 + x1·w1 + …` in both engines, and no hard threshold (count of
 * p ≥ 0.5) is ever emitted — only continuous quantities, so boundary
 * rows cannot flip a value past the snap.
 */
object QualityModel {

  /** Feature names in training order (x0 is the bias). The output rows
    * carry these with ordering prefixes so the gate key sorts them. */
  val Features: Seq[String] =
    Seq("b0_bias", "b1_log_tokens", "b2_avg_token_len",
      "b3_stopword_ratio", "b4_ttr")

  /**
   * Labeled feature frame: (doc_id, y, x0..x4) with y = 1.0 iff the
   * rule gate passes the document. Same bounds semantics as
   * [[TextAnalysis.qualityFilter]].
   */
  def trainingFrame(docs: DataFrame, idCol: String, textCol: String,
      minTokens: Long = 10, maxTokens: Long = 100000,
      minAvgTokenLen: Double = 2.0, maxAvgTokenLen: Double = 12.0,
      maxStopwordRatio: Double = 0.6, minTtr: Double = 0.2): DataFrame = {
    val pass = TextAnalysis.qualityPass(minTokens, maxTokens,
      minAvgTokenLen, maxAvgTokenLen, maxStopwordRatio, minTtr)
    // features scaled into ~[0, 1] by FIXED literals (ln(1+10^5) bounds
    // the token feature; 12 the mean-length bound) — full-batch GD at a
    // fixed rate needs comparable feature scales or it overshoots; the
    // constants are part of the model definition, shared with the oracle
    TextAnalysis.stats(docs, idCol, textCol).select(
      col("doc_id"),
      when(pass, lit(1.0)).otherwise(lit(0.0)).as("y"),
      lit(1.0).as("x0"),
      (log(lit(1.0) + col("n_tokens").cast("double")) / lit(12.0)).as("x1"),
      (col("avg_token_len") / lit(12.0)).as("x2"),
      col("stopword_ratio").as("x3"),
      col("ttr").as("x4"))
  }

  /**
   * Fit by `iters` full-batch GD steps at learning rate `lr` from w = 0,
   * then emit one row per weight plus the final mean log-loss
   * (`z_log_loss`) — (feature, weight) rows, d+2 total.
   */
  def fitLogistic(docs: DataFrame, idCol: String, textCol: String,
      iters: Int = 5, lr: Double = 0.5,
      minTokens: Long = 10, maxTokens: Long = 100000,
      minAvgTokenLen: Double = 2.0, maxAvgTokenLen: Double = 12.0,
      maxStopwordRatio: Double = 0.6, minTtr: Double = 0.2): DataFrame = {
    require(iters >= 1 && lr > 0.0)
    val spark = docs.sparkSession
    import spark.implicits._
    val d = Features.length
    val f = trainingFrame(docs, idCol, textCol, minTokens, maxTokens,
      minAvgTokenLen, maxAvgTokenLen, maxStopwordRatio, minTtr)
      .localCheckpoint()
    def zOf(w: Array[Double]) =
      (0 until d).map(i => col(s"x$i") * lit(w(i)))
        .reduce(_ + _) // left-associative — the oracle spells the same
    def pOf(w: Array[Double]) = lit(1.0) / (lit(1.0) + exp(-zOf(w)))
    var w = Array.fill(d)(0.0)
    for (_ <- 1 to iters) {
      val p = pOf(w)
      val grads = (0 until d).map(i => avg((p - col("y")) * col(s"x$i")))
      val row = f.agg(grads.head, grads.drop(1): _*).collect().head
      w = Array.tabulate(d)(i => w(i) - lr * row.getDouble(i))
    }
    val p = pOf(w)
    val loss = f.agg(avg(-(col("y") * log(p) +
        (lit(1.0) - col("y")) * log(lit(1.0) - p))))
      .collect().head.getDouble(0)
    (Features.zip(w.toSeq) :+ ("z_log_loss" -> loss))
      .toDF("feature", "weight")
  }

  /** Per-document soft quality score under a fitted weight row set —
    * a pure map stage (score any corpus, stream-native). The gate
    * bounds only decorate the emitted `gate_pass` reference label; pass
    * the same bounds the fit used. */
  def score(docs: DataFrame, idCol: String, textCol: String,
      weights: Map[String, Double],
      minTokens: Long = 10, maxTokens: Long = 100000,
      minAvgTokenLen: Double = 2.0, maxAvgTokenLen: Double = 12.0,
      maxStopwordRatio: Double = 0.6, minTtr: Double = 0.2): DataFrame = {
    val w = Features.map(weights)
    val f = trainingFrame(docs, idCol, textCol, minTokens, maxTokens,
      minAvgTokenLen, maxAvgTokenLen, maxStopwordRatio, minTtr)
    val z = Features.indices.map(i => col(s"x$i") * lit(w(i))).reduce(_ + _)
    f.select(col("doc_id"), col("y").as("gate_pass"),
      (lit(1.0) / (lit(1.0) + exp(-z))).as("p_quality"))
  }

  /**
   * Exact AUC of any scored table against a binary label — the
   * evaluation leg of the train ([[fitLogistic]]) / apply ([[score]])
   * pair: AUC = P(score(pos) > score(neg)) + ½·P(tie), computed from
   * the Mann–Whitney U statistic without ever ranking rows. Scores are
   * snapped to the 1e-6 grid BEFORE grouping, so tie groups — and
   * therefore the statistic — are identical in any engine, and 2U is
   * kept as an exact int64 (`u2 = Σ_g np_g·(2·cumneg_below + nn_g)`):
   * the one division happens at the very end. Degenerate single-class
   * inputs score 0.5 by convention instead of dividing by zero.
   *
   * Scale shape: one score-group hash aggregate (map-side partials)
   * collapses the corpus to the SCORE HISTOGRAM, then one running-sum
   * window over that histogram — partitions bounded by distinct score
   * count, the [[TextAnalysis.quantileNormalize]] argument, never by
   * corpus size — and a 1-row fold. Nothing row-ranked, nothing
   * driver-side.
   */
  def auc(scored: DataFrame, labelCol: String, scoreCol: String): DataFrame = {
    val g = scored
      .select(col(labelCol).as("y"),
        (floor(col(scoreCol) * lit(1e6) + lit(0.50001)) / lit(1e6)).as("s"))
      .groupBy("s")
      .agg(sum(when(col("y") === 1.0, 1L).otherwise(0L)).as("np"),
        sum(when(col("y") === 1.0, 0L).otherwise(1L)).as("nn"))
    val w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("cumnn", coalesce(sum(col("nn")).over(w), lit(0L)))
      .agg(sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"),
        sum(col("np") * (lit(2L) * col("cumnn") + col("nn"))).as("u2"))
      .select(col("n_pos"), col("n_neg"), col("u2"),
        when(col("n_pos") === 0L || col("n_neg") === 0L, lit(0.5))
          .otherwise(col("u2").cast("double")
            / (lit(2.0) * col("n_pos") * col("n_neg"))).as("auc"))
  }
}
