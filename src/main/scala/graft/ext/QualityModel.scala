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

  /**
   * Population Stability Index — the binned drift score ML monitoring
   * dashboards actually alarm on (PSI < 0.1 stable / 0.1–0.25 moderate /
   * > 0.25 shifted), next to [[ksTest]]'s exact-CDF statistic: the
   * signal bins at fixed width, both groups' bin distributions are
   * Laplace-smoothed (`alpha` per OBSERVED bin — a bin one side never
   * hit would otherwise put ln 0 in the sum), and
   * PSI = Σ_bins (p − q)·ln(p/q). KS sees the single worst CDF gap; PSI
   * integrates mismatch over the whole distribution — monitoring wants
   * both, which is why both ship.
   *
   * Determinism: bin ids and counts are exact int64; smoothed
   * probabilities are exact-rational divisions; each bin's term is a
   * fixed IEEE op sequence and the bin-sum's order noise sits far under
   * the gate snap. Degenerate single-group inputs score 0.
   *
   * Scale shape: ONE bin-keyed hash aggregate (map-side partials
   * collapse the corpus to observed bins), a 1-row total broadcast, one
   * bins-sized fold. The histogram, not the corpus, is the state —
   * the [[ksTest]]/quantile argument.
   */
  def psiDrift(data: DataFrame, groupCol: String, valueCol: String,
      binWidth: Long, alpha: Double = 0.5): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(alpha > 0, "alpha must be positive (smoothing guards ln 0)")
    val g = data
      .select(col(groupCol).cast("long").as("y"),
        expr(s"CAST($valueCol AS BIGINT) div $binWidth").as("b"))
      .groupBy("b")
      .agg(sum(col("y")).as("c1"), sum(lit(1L) - col("y")).as("c0"))
    val tot = g.agg(coalesce(sum(col("c1")), lit(0L)).as("n1"),
      coalesce(sum(col("c0")), lit(0L)).as("n0"),
      count(lit(1)).as("n_bins"))
    val p = (col("c1").cast("double") + lit(alpha)) /
      (col("n1").cast("double") + col("n_bins").cast("double") * lit(alpha))
    val q = (col("c0").cast("double") + lit(alpha)) /
      (col("n0").cast("double") + col("n_bins").cast("double") * lit(alpha))
    g.crossJoin(broadcast(tot))
      .groupBy("n1", "n0", "n_bins")
      .agg(sum((p - q) * log(p / q)).as("psi_raw"))
      .select(col("n1"), col("n0"), col("n_bins"),
        when(col("n1") > 0 && col("n0") > 0, col("psi_raw"))
          .otherwise(lit(0.0)).as("psi"))
  }

  /**
   * Operating-point sweep — the ROC/PR table that turns [[auc]]'s single
   * ranking number into the table an operator actually thresholds on:
   * for each candidate cut `t`, the exact confusion matrix (tp/fp/fn/tn
   * as int64) of `score >= t` against the binary label, plus
   * precision/recall/F1. The complement counts come from ONE total row
   * (fn = n_pos − tp), so the sweep never rescans below-threshold rows.
   *
   * Determinism: scores snap to the 1e-6 grid BEFORE the threshold
   * compare (the [[auc]] convention — group identity, and therefore
   * every `s >= t` cut, is engine-exact); counts are exact int64;
   * the emitted ratios are exact-rational divisions under the gate snap,
   * with empty denominators reported as 0 rather than NULL/NaN.
   *
   * Scale shape: the same score-histogram collapse as [[auc]] (ONE
   * hash aggregate with map-side partials), then a constant ×|thresholds|
   * fan-out of the HISTOGRAM (never the corpus), one threshold-keyed
   * aggregate, and a 1-row scalar broadcast of the totals.
   */
  /**
   * Exact two-sample Kolmogorov–Smirnov statistic between the integer
   * signal distributions of two document groups — the distribution-drift
   * test a curation pipeline runs before pooling sources ("is this
   * crawl's length profile the same population as last month's?"). For
   * binary group `g` and int64 value `v`:
   *
   *   D = max_v |F₁(v) − F₀(v)|
   *
   * computed EXACTLY as `d_num = max_v |cum₁(v)·n₀ − cum₀(v)·n₁|` over
   * int64 (one division at the very end — so the max, and the argmax cut
   * `d_at`, are engine-exact with no floating-point CDF ties to break),
   * plus the asymptotic two-sided p-value
   * `min(1, 2·exp(−2·D²·n₁n₀/(n₁+n₀)))` (Smirnov's limit law; one exp,
   * inside the gate snap). Degenerate single-group inputs report D = 0,
   * p = 1.
   *
   * Int64 headroom: cum·n ≤ n₁·n₀ < n²/4 — exact up to ~6·10⁹ rows, far
   * past any per-group document count this signal family sees.
   *
   * Scale shape: ONE value-histogram hash aggregate with map-side
   * partials (the corpus collapses to the distinct-value histogram — the
   * [[auc]] argument), one running-sum window bounded by distinct values,
   * one 1-row fold. Nothing row-sorted, nothing driver-side.
   */
  def ksTest(data: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val g = data
      .select(col(groupCol).cast("long").as("y"), col(valueCol).cast("long").as("v"))
      .groupBy("v")
      .agg(sum(col("y")).as("c1"), sum(lit(1L) - col("y")).as("c0"))
    val w = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = g.select(col("v"),
      sum(col("c1")).over(w).as("cum1"), sum(col("c0")).over(w).as("cum0"))
    val tot = g.agg(coalesce(sum(col("c1")), lit(0L)).as("n1"),
      coalesce(sum(col("c0")), lit(0L)).as("n0"))
    // arg-cut: among the max-gap values take the SMALLEST v — one struct
    // max (lexicographic on (gap, −v)), no second pass, engine-exact ints
    val folded = cum.crossJoin(broadcast(tot))
      .select(col("n1"), col("n0"), col("v"),
        abs(col("cum1") * col("n0") - col("cum0") * col("n1")).as("gap"))
      .groupBy("n1", "n0")
      .agg(max(col("gap")).as("d_num"),
        max(struct(col("gap"), (-col("v")).as("nv"))).as("m"))
      .withColumn("d_at", -col("m.nv"))
      .drop("m")
    val d = when(col("n1") > 0 && col("n0") > 0,
      col("d_num").cast("double") / (col("n1") * col("n0")).cast("double"))
      .otherwise(lit(0.0))
    val ne = (col("n1") * col("n0")).cast("double") /
      (col("n1") + col("n0")).cast("double")
    folded.select(col("n1"), col("n0"), col("d_num"), col("d_at"),
      d.as("d"),
      when(col("n1") > 0 && col("n0") > 0,
        least(lit(1.0), lit(2.0) * exp(lit(-2.0) * d * d * ne)))
        .otherwise(lit(1.0)).as("p_value"))
  }

  /**
   * Reliability diagram — the calibration readout that completes the
   * [[auc]] (ranking) / [[confusionSweep]] (operating point) evaluation
   * suite: scores bin into `bins` equal-width cells and each bin reports
   * its member count, mean predicted probability, and empirical positive
   * rate. A calibrated scorer has `frac_pos ≈ mean_score` per bin; the
   * signed `gap` column is the per-bin calibration error (its
   * count-weighted |·| average is the standard ECE, computable from
   * these rows).
   *
   * Determinism: scores snap to the 1e-6 grid BEFORE binning (bin
   * identity is then one exactly-rounded multiply + floor — engine-exact
   * even for scores ON a bin boundary), counts are exact int64,
   * `frac_pos` is one exact-rational division, and `mean_score`'s
   * sum-order noise sits ~1e-10 under the gate snap. Empty bins keep a
   * zero row (the sweep convention), so the output is always `bins` rows.
   *
   * Scale shape: one row-local bin map + ONE bins-keyed hash aggregate
   * with map-side partials; the bins-row assembly join is constant-sized.
   */
  def calibration(scored: DataFrame, labelCol: String, scoreCol: String,
      bins: Int): DataFrame = {
    require(bins >= 2, "bins must be at least 2")
    val spark = scored.sparkSession
    import spark.implicits._
    val s = floor(col(scoreCol) * lit(1e6) + lit(0.50001)) / lit(1e6)
    val b = least(lit(bins - 1L), floor(s * lit(bins.toDouble)).cast("long"))
    val g = scored
      .select(b.as("bin"), s.as("s"), col(labelCol).as("y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(col("s")).as("sum_s"),
        sum(when(col("y") === 1.0, 1L).otherwise(0L)).as("n_pos"))
    val mean = when(col("n") > 0, col("sum_s") / col("n").cast("double"))
      .otherwise(lit(0.0))
    val frac = when(col("n") > 0, col("n_pos").cast("double") / col("n").cast("double"))
      .otherwise(lit(0.0))
    (0L until bins.toLong).toDF("bin")
      .join(g, Seq("bin"), "left")
      .na.fill(0L, Seq("n", "n_pos")).na.fill(0.0, Seq("sum_s"))
      .select(col("bin"), col("n"), col("n_pos"),
        mean.as("mean_score"), frac.as("frac_pos"),
        (frac - mean).as("gap"))
  }

  def confusionSweep(scored: DataFrame, labelCol: String, scoreCol: String,
      thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty, "thresholds must be non-empty")
    val g = scored
      .select(col(labelCol).as("y"),
        (floor(col(scoreCol) * lit(1e6) + lit(0.50001)) / lit(1e6)).as("s"))
      .groupBy("s")
      .agg(sum(when(col("y") === 1.0, 1L).otherwise(0L)).as("np"),
        sum(when(col("y") === 1.0, 0L).otherwise(1L)).as("nn"))
    val tot = g.agg(
      coalesce(sum(col("np")), lit(0L)).as("n_pos"),
      coalesce(sum(col("nn")), lit(0L)).as("n_neg"))
    val sw = g
      .select(explode(array(thresholds.map(lit): _*)).as("t"),
        col("s"), col("np"), col("nn"))
      .groupBy("t")
      .agg(sum(when(col("s") >= col("t"), col("np")).otherwise(0L)).as("tp"),
        sum(when(col("s") >= col("t"), col("nn")).otherwise(0L)).as("fp"))
    val spark = scored.sparkSession
    import spark.implicits._
    val prec = col("tp").cast("double") / (col("tp") + col("fp")).cast("double")
    val rec = col("tp").cast("double") / col("n_pos").cast("double")
    thresholds.toDF("t")
      .join(sw, Seq("t"), "left")
      .na.fill(0L, Seq("tp", "fp"))
      .crossJoin(broadcast(tot))
      .select(col("t"), col("tp"), col("fp"),
        (col("n_pos") - col("tp")).as("fn"),
        (col("n_neg") - col("fp")).as("tn"),
        when(col("tp") + col("fp") > 0, prec).otherwise(lit(0.0)).as("prec"),
        when(col("n_pos") > 0, rec).otherwise(lit(0.0)).as("recall"),
        when(col("tp") > 0,
          lit(2.0) * prec * rec / (prec + rec)).otherwise(lit(0.0)).as("f1"))
  }
}
