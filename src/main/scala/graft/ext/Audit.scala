package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Pipeline-health diagnostics: operators that inspect the DATA for the
 * properties the engine's physical plans depend on.
 */
object Audit {

  /**
   * Key-skew audit — the diagnostic behind every salting/AQE decision in
   * this library ([[graft.core.CosineAnalysis]]'s `alignedPairsSalted`,
   * AQE skew-join): for a prospective shuffle key, the `topN` heaviest
   * key values with their row counts, their fraction of the table, and a
   * dense total order (`rank`). A top key holding ≥ a few percent of a
   * 100 TB table is the straggler partition that decides whether the
   * plain equi-join shape is safe or the salted variant is needed — this
   * query answers that BEFORE the expensive job runs, on the same
   * engine, for the cost of one aggregate.
   *
   * Scale shape: one hash aggregate keyed by the audited column
   * (map-side partials make the heavy keys cheap to count — each
   * partition contributes one partial row per key), a TakeOrdered top-N
   * cut (per-partition top-N, no global sort), and the 1-row grand
   * total broadcast over the `topN`-row slice — the same sanctioned
   * scalar-broadcast BNLJ shape as the corpus-size scalar in tf-idf
   * (1 × topN rows; nothing corpus-sized crosses it). The final rank
   * window runs on `topN` rows.
   */
  def skewAudit(df: DataFrame, keyCol: String, topN: Int = 20): DataFrame = {
    require(topN >= 1)
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n"))
    val top = counts
      .orderBy(col("n").desc, col("key").asc)
      .limit(topN)
    val total = counts.agg(sum(col("n")).as("total"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("key").asc)
    top.crossJoin(broadcast(total))
      .select(col("key"), col("n"),
        (col("n").cast("double") / col("total")).as("fraction"))
      .withColumn("rank", row_number().over(w).cast("long"))
  }

  /**
   * Corpus snapshot diff — the audit run between two versions of a
   * corpus (before/after a recrawl, a scrub, a dedup sweep): every
   * doc_id present in either snapshot, classified `added` (new only),
   * `removed` (old only), `changed` (both, different text), or
   * `unchanged`. The table incremental pipelines reconcile against —
   * "the scrub claims it only removed documents; did anything CHANGE?"
   * — and the input to incremental re-indexing (only `added`/`changed`
   * docs need re-shingling).
   *
   * Scale shape: texts collapse to fixed-width sha256 map-side, so the
   * full-outer join shuffles (id, 64-char hash) rows only — never the
   * documents themselves. One exchange per side, keyed by doc_id;
   * output is union-of-ids-sized. Comparing by content hash makes the
   * diff order-insensitive and collision-safe at 2⁻¹²⁸.
   */
  /**
   * Contingency-table independence audit between two categorical corpus
   * columns (lang × source here): Pearson's chi-square, its degrees of
   * freedom, Cramér's V effect size, and the mutual information in nats
   * — one row. This is the "are my slices confounded" check a mixture
   * design runs before trusting per-source or per-language statistics:
   * high V means the two facets are entangled and any per-facet quota
   * silently reweights the other.
   *
   * The zero-cell algebra: Σ_all (o−e)²/e = Σ_obs o²/e − n (since
   * Σ_all o = Σ_all e = n), so only OBSERVED cells are ever enumerated —
   * the table never densifies. MI's o·ln(o…) terms vanish at o = 0, so
   * the observed-cell sum is already exact.
   *
   * Determinism: counts and marginals are exact int64; each cell term is
   * the same fixed IEEE op sequence; the cell sums carry engine
   * sum-order noise ~1e-13 relative — inside the gate snap. chi2 is
   * clamped at 0 before the Cramér sqrt (fp noise on an independent
   * table can leave Σ − n at −1e-12). Degenerate single-level facets
   * (dof = 0) report chi2/V/MI = 0.
   *
   * Scale shape: ONE (a, b)-keyed hash aggregate collapses the corpus to
   * the observed contingency cells (map-side partials); marginals are
   * cell-sized re-aggregates joined back on their own keys; the 1-row
   * grand total rides the sanctioned scalar broadcast. Everything
   * downstream is cells-sized.
   */
  def contingencyStats(data: DataFrame, aCol: String, bCol: String): DataFrame = {
    val o = data.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("o"))
    val ra = o.groupBy("a").agg(sum(col("o")).as("ra"))
    val cb = o.groupBy("b").agg(sum(col("o")).as("cb"))
    val tot = o.agg(coalesce(sum(col("o")), lit(0L)).as("n"),
      countDistinct(col("a")).as("n_a"), countDistinct(col("b")).as("n_b"))
    val cells = o.join(ra, "a").join(cb, "b").crossJoin(broadcast(tot))
    val oD = col("o").cast("double")
    val nD = col("n").cast("double")
    val rcD = (col("ra") * col("cb")).cast("double")
    val chiTerm = oD * oD * nD / rcD
    val miTerm = (oD / nD) * log(oD * nD / rcD)
    val folded = cells.groupBy("n", "n_a", "n_b")
      .agg(sum(chiTerm).as("sum_chi"), sum(miTerm).as("mi_raw"))
    val chi2 = greatest(lit(0.0), col("sum_chi") - col("n").cast("double"))
    val minDim = least(col("n_a"), col("n_b"))
    folded.select(col("n"), col("n_a"), col("n_b"),
      ((col("n_a") - 1L) * (col("n_b") - 1L)).as("dof"),
      when(minDim > 1L, chi2).otherwise(lit(0.0)).as("chi2"),
      when(minDim > 1L && col("n") > 0L,
        sqrt(chi2 / (col("n").cast("double") * (minDim - 1L).cast("double"))))
        .otherwise(lit(0.0)).as("cramers_v"),
      when(minDim > 1L, col("mi_raw")).otherwise(lit(0.0)).as("mi"))
  }

  def corpusDiff(oldDocs: DataFrame, newDocs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    def hashed(df: DataFrame, as: String) =
      df.select(col(idCol).as("doc_id"),
        sha2(col(textCol).cast("binary"), 256).as(as))
    hashed(oldDocs, "h_old")
      .join(hashed(newDocs, "h_new"), Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("h_old").isNull, "added")
          .when(col("h_new").isNull, "removed")
          .when(col("h_old") === col("h_new"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /**
   * Versioned-snapshot MERGE resolution — the `MERGE INTO` / CDC-upsert
   * semantics of table formats (Delta, Iceberg) expressed engine-side
   * over a plain append-only commit log: `commits` holds one row per
   * (key, version) with an op column (`'D'` = tombstone, anything else
   * = upsert) and arbitrary payload columns; the current snapshot is,
   * per key, the highest-version row — dropped entirely when that
   * winning row is a tombstone. [[corpusDiff]] answers "what changed
   * between two snapshots"; this materializes the snapshot itself from
   * the change history. Versions must be unique per key (the commit-log
   * invariant every table format already enforces); ties would make the
   * winner nondeterministic.
   *
   * Scale shape: ONE key-shuffled arg-max aggregate (`max_by` over the
   * payload struct) with map-side partials — each mapper pre-reduces
   * its slice to one candidate per key before the exchange, so the
   * shuffle carries ≤ one row per (mapper, key), not the commit log.
   * No window sort over the log (the row_number spelling re-sorts every
   * partition; the aggregate never does), and the tombstone filter is a
   * result-sized map stage.
   */
  def mergeSnapshots(commits: DataFrame, keyCol: String,
      versionCol: String, opCol: String): DataFrame = {
    val payload = commits.columns.filter(_ != keyCol)
    commits.groupBy(col(keyCol))
      .agg(max_by(struct(payload.map(col).toSeq: _*),
        col(versionCol)).as("w"))
      .select(col(keyCol) +: payload.map(c => col(s"w.$c").as(c)): _*)
      .where(col(opCol) =!= "D")
  }
}
