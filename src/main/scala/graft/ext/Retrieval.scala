package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Keyword retrieval over the documents table — the lookup half of a
 * training-data pipeline (find the documents about X before inspecting,
 * scrubbing, or decontaminating them). The reference engine's own demo is
 * document similarity over a doc×term matrix (reference
 * KeyWordsDemo.scala:15–106); BM25 is the standard relevance weighting of
 * exactly that matrix, so it slots in as a first-class query rather than
 * an external search system.
 *
 * Scale shape: the per-document half (term frequencies, document length)
 * is row-local — a pure codegen'd map stage over any corpus size. The
 * corpus half (N, avgdl, per-term document frequencies) aggregates to ONE
 * row, re-attached with the same sanctioned 1-row scalar broadcast
 * [[graft.text.Tokenizer.tfIdf]] uses (a BroadcastNestedLoopJoin whose
 * build side is a single row is a scalar broadcast, not a pair surface).
 * The query-term set is a compile-time literal list (a user types a
 * handful of terms), so nothing about the query grows with the corpus:
 * one aggregate + one broadcast + one TakeOrdered.
 */
object Retrieval {

  /**
   * BM25 top-k document retrieval for a literal bag of query terms.
   *
   * Per document `d` with length `dl` (whitespace tokens) and per query
   * term `t` with document frequency `df`:
   *
   *   idf(t)     = ln(1 + (N - df + 0.5) / (df + 0.5))       (Robertson/Lucene)
   *   score(d)   = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))
   *
   * Documents matching no term (score 0) are dropped; ties at the cut
   * break on `doc_id` ascending. Every score is the same fixed-order
   * sequence of IEEE ops on exactly-aggregated integers in any engine,
   * so the ranking (and the oracle hash) is reproducible bit-for-bit.
   */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    // row-local: dl + one tf column per query term (map stage, no explode)
    val tfCols = queryTerms.zipWithIndex.map { case (t, i) =>
      val lit = sqlLit(t)
      expr(s"size(filter(t, x -> x = $lit))").cast("long").as(s"tf_$i")
    }
    val perDoc = TextAnalysis.tokenArray(docs, idCol, textCol)
      .select(col("doc_id") +: size(col("t")).cast("long").as("dl") +: tfCols: _*)
    // corpus stats collapse to ONE row: N, Σdl, df per term
    val dfAggs = queryTerms.indices.map(i =>
      sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i"))
    val aggCols = count(lit(1)).as("n_docs") +: sum(col("dl")).as("sum_dl") +: dfAggs
    val stats = perDoc.agg(aggCols.head, aggCols.tail: _*)
    // sanctioned 1-row scalar broadcast (cf. Tokenizer.tfIdf)
    val joined = perDoc.crossJoin(broadcast(stats))
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val score = queryTerms.indices.map { i =>
      val tf = col(s"tf_$i").cast("double")
      val df = col(s"df_$i").cast("double")
      val idf = log(lit(1.0) +
        (col("n_docs").cast("double") - df + lit(0.5)) / (df + lit(0.5)))
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / avgdl))
    }.reduce[Column](_ + _)
    joined
      .select(col("doc_id"), col("dl"), score.as("score"))
      .where(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /**
   * Dirichlet-smoothed query-likelihood top-k (Zhai & Lafferty SIGIR'01)
   * — the language-modeling scoring family next to [[bm25TopK]]'s
   * probabilistic-relevance one (the two classic lexical rankers weight
   * the same tf/dl/corpus statistics differently, and a retrieval layer
   * should offer both):
   *
   *   score(d) = Σ_t ln( (tf_{t,d} + μ·cf_t/|C|) / (dl_d + μ) )
   *
   * with cf the collection frequency and |C| total corpus tokens.
   * Documents matching no query term are dropped (their score is pure
   * smoothing mass — rank noise); ties break on `doc_id` after the score
   * snaps to the 1e-6 grid, so the cut is engine-exact. Every query term
   * must occur somewhere in the corpus (cf ≥ 1 — otherwise the zero-tf
   * smoothing term is ln 0): ENFORCED in-plan on the 1-row stats whenever
   * any document survives the match filter (an all-absent query folds to
   * the empty plan before the guard — and empty IS that query's answer).
   *
   * Scale shape: identical to [[bm25TopK]] — a row-local tf/dl map
   * stage, ONE 1-row corpus aggregate re-attached by the sanctioned
   * scalar broadcast, one TakeOrdered. Nothing grows with the query.
   */
  def qlmTopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int, mu: Double = 300.0): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(mu > 0, "mu must be positive")
    val tfCols = queryTerms.zipWithIndex.map { case (t, i) =>
      val lit = sqlLit(t)
      expr(s"size(filter(t, x -> x = $lit))").cast("long").as(s"tf_$i")
    }
    val perDoc = TextAnalysis.tokenArray(docs, idCol, textCol)
      .select(col("doc_id") +: size(col("t")).cast("long").as("dl") +: tfCols: _*)
    val cfAggs = queryTerms.indices.map(i => sum(col(s"tf_$i")).as(s"cf_$i"))
    val stats0 = perDoc.agg(sum(col("dl")).as("c_total"), cfAggs: _*)
    // fail loudly on an out-of-corpus term (cf = 0) — same row, in-plan
    val stats = queryTerms.indices.foldLeft(stats0) { (s, i) =>
      s.withColumn(s"cf_$i",
        when(assert_true(col(s"cf_$i") > 0,
          lit(s"qlmTopK: query term '${queryTerms(i)}' absent from corpus"))
          .isNull, col(s"cf_$i")))
    }
    val joined = perDoc.crossJoin(broadcast(stats))
    val score = queryTerms.indices.map { i =>
      val tf = col(s"tf_$i").cast("double")
      val cf = col(s"cf_$i").cast("double")
      log((tf + lit(mu) * (cf / col("c_total").cast("double")))
        / (col("dl").cast("double") + lit(mu)))
    }.reduce[Column](_ + _)
    val matched = queryTerms.indices.map(i => col(s"tf_$i") > 0L)
      .reduce[Column](_ || _)
    joined
      .where(matched)
      .select(col("doc_id"), col("dl"),
        (floor(score * lit(1e6) + lit(0.50001)) / lit(1e6)).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Single-quoted SQL string literal (term lists are caller-supplied). */
  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** Corpus-level BM25 constants: document count and average document
    * length. Two scalars — the sanctioned model-sized eager fit. */
  final case class Bm25Stats(nDocs: Long, avgdl: Double)

  /**
   * Term-keyed inverted index: one row per (term, document) posting with
   * the term frequency, the document length, and the term's document
   * frequency — everything a scorer needs for ARBITRARY query terms,
   * unlike [[bm25TopK]]'s compile-time literal list. This is the static
   * side of the stream-static twin
   * ([[graft.streaming.RetrievalStream.bm25Scores]]): build (and
   * typically persist/write) once, join queries against it forever.
   *
   * Scale shape: explode + one (term, doc) aggregate + one term-keyed
   * df aggregate joined back on term — the posting-list layout, sized by
   * total corpus tokens and naturally partitioned by term, which is also
   * the join key every query probe uses (co-located, no re-shuffle).
   */
  def bm25Index(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = TextAnalysis.tokenArray(docs, idCol, textCol)
      .select(col("doc_id"), size(col("t")).cast("long").as("dl"),
        explode(col("t")).as("term"))
    // dl is functionally dependent on doc_id — grouping by it is free
    val tf = tok.groupBy("term", "doc_id", "dl").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(dfreq, "term")
      .select("term", "doc_id", "tf", "dl", "df")
  }

  /** The two corpus scalars for [[bm25Index]]-based scoring — ONE 1-row
    * aggregate action. Computed over the same tokenization as the index
    * (docs with zero tokens are excluded from both). */
  def bm25CorpusStats(docs: DataFrame, idCol: String, textCol: String): Bm25Stats = {
    val r = TextAnalysis.tokenArray(docs, idCol, textCol)
      .agg(count(lit(1)).as("n"), sum(size(col("t")).cast("long")).as("sdl"))
      .head()
    val n = r.getLong(0)
    require(n > 0, "corpus has no non-empty documents")
    Bm25Stats(n, r.getLong(1).toDouble / n)
  }

  /** BM25 per-term contribution from posting columns (tf, dl, df) —
    * shared, term-order-free arithmetic used by the index-based scorers
    * (each term's value is a fixed IEEE op sequence; only the final sum
    * order can differ between engines). */
  def bm25Contrib(stats: Bm25Stats, k1: Double, b: Double): Column = {
    val tf = col("tf").cast("double")
    val dfreq = col("df").cast("double")
    val idf = log(lit(1.0) +
      (lit(stats.nDocs.toDouble) - dfreq + lit(0.5)) / (dfreq + lit(0.5)))
    idf * (tf * lit(k1 + 1.0)) /
      (tf + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / lit(stats.avgdl)))
  }

  /**
   * Batch scorer over the prebuilt index — the exact batch twin of the
   * streaming path: same postings join, same [[bm25Contrib]] arithmetic,
   * same (query, doc) aggregate. `queries` is (query_id, terms) with
   * terms an array column (duplicate terms contribute once per
   * occurrence, like [[bm25TopK]]'s literal list).
   */
  def bm25ScoreQueries(queries: DataFrame, postings: DataFrame,
      stats: Bm25Stats, k1: Double = 1.2, b: Double = 0.75): DataFrame =
    queries
      .select(col("query_id"), explode(col("terms")).as("term"))
      .join(postings, Seq("term"))
      .groupBy("query_id", "doc_id")
      .agg(sum(bm25Contrib(stats, k1, b)).as("score"))

  /**
   * Reciprocal Rank Fusion (Cormack, Clarke & Büttcher SIGIR'09) — the
   * standard score-free ensemble of two retrieval systems: each
   * (query, candidate) scores `Σ_lists 1/(kRrf + rank)`, so a candidate
   * highly ranked by either list surfaces without ever comparing the
   * lists' incomparable raw scores (BM25 log-weights vs cosine values —
   * RRF is how lexical+semantic hybrid search is usually glued).
   * Candidates missing from a list contribute 0 for it. Both inputs are
   * (queryCol, candCol, rankCol ≥ 1) tables — the top-k family's shape
   * ([[Embeddings.topK]], [[bm25TopK]] after a rank window).
   *
   * Determinism: each term is the same two IEEE ops (`1.0/(kRrf+rank)`)
   * in a fixed order, the sum is snapped to the 1e-6 comparison grid
   * BEFORE ranking, and ties break by candidate id — identical selection
   * in any engine, the gate's usual contract.
   *
   * Scale shape: one full-outer equi-join on (query, candidate) between
   * two RESULT-sized tables (Q·k rows each, never corpus-sized) and one
   * rank window keyed by query. At 100 TB the retrieval lists are the
   * expensive part; fusing them is a metrics-sized afterthought — which
   * is the operational argument for RRF over trained fusion.
   */
  /** Positional DCG gains 1/log2(r+1) for r = 1..k, computed ONCE here
    * and interpolated as plain literals into both the Spark plan and the
    * DuckDB oracle — no engine ever evaluates a transcendental, so the
    * two sides cannot drift by a libm ulp. */
  def dcgGains(k: Int): Seq[Double] =
    (1 to k).map(r => 1.0 / (math.log(r + 1.0) / math.log(2.0)))

  /** Ideal-DCG prefix sums: idcg(m) = Σ_{r ≤ m} gain(r), m = 1..k. */
  def idcgPrefix(k: Int): Seq[Double] =
    dcgGains(k).scanLeft(0.0)(_ + _).tail

  /**
   * Ranked-retrieval evaluation: MRR and nDCG@k of a ranked list against
   * a binary relevance set (typically the exact top-k — the same
   * truth-vs-approx convention as [[Embeddings.recallAtK]], which this
   * completes with ORDER-sensitive metrics: recall can't see that an
   * index returns the right set in the wrong order). Per query:
   * `first_rel_rank` (0 = no relevant item retrieved), `mrr` =
   * 1/first_rel_rank, `dcg` = Σ_{relevant r ≤ k} gain(r), `ndcg` =
   * dcg / idcg(min(k, n_rel)).
   *
   * Scale shape: result-sized equi-joins (Q·k rows) + one aggregate
   * keyed by query + broadcast literal gain tables of k rows. The gain
   * constants come from [[dcgGains]]/[[idcgPrefix]] so the oracle
   * interpolates the same decimal literals.
   */
  def rankEval(truth: DataFrame, ranked: DataFrame, k: Int,
      queryCol: String = "query_id", candCol: String = "vec_id",
      rankCol: String = "rank"): DataFrame = {
    require(k >= 1)
    val spark = truth.sparkSession
    import spark.implicits._
    val rel = truth.select(col(queryCol).as("query_id"), col(candCol).as("cand_id"))
    val nRel = rel.groupBy("query_id").agg(count(lit(1)).as("n_rel"))
    val gains = dcgGains(k).zipWithIndex
      .map { case (g, i) => (i + 1L, g) }.toDF("rnk", "gain")
    val idcg = idcgPrefix(k).zipWithIndex
      .map { case (s, i) => (i + 1L, s) }.toDF("m", "idcg")
    val hits = ranked
      .select(col(queryCol).as("query_id"), col(candCol).as("cand_id"),
        col(rankCol).cast("long").as("rnk"))
      .where(col("rnk") <= k)
      .join(rel.withColumn("relv", lit(1L)), Seq("query_id", "cand_id"), "left")
      .join(broadcast(gains), Seq("rnk"))
      .groupBy("query_id")
      .agg(
        min(when(col("relv").isNotNull, col("rnk"))).as("fr"),
        sum(when(col("relv").isNotNull, col("gain")).otherwise(lit(0.0))).as("dcg"))
    val snap = (c: Column) => floor(c * lit(1e6) + lit(0.50001)) / lit(1e6)
    nRel.join(hits, Seq("query_id"), "left")
      .join(broadcast(idcg), least(lit(k.toLong), col("n_rel")) === col("m"))
      .select(
        col("query_id"), col("n_rel"),
        coalesce(col("fr"), lit(0L)).as("first_rel_rank"),
        snap(when(col("fr").isNull, lit(0.0))
          .otherwise(lit(1.0) / col("fr"))).as("mrr"),
        snap(coalesce(col("dcg"), lit(0.0)) / col("idcg")).as("ndcg"))
  }

  def rrfFuse(a: DataFrame, b: DataFrame, k: Int, kRrf: Int = 60,
      queryCol: String = "query_id", candCol: String = "vec_id",
      rankCol: String = "rank"): DataFrame = {
    require(k >= 1 && kRrf >= 0)
    def side(df: DataFrame, suffix: String) = df.select(
      col(queryCol).as("query_id"), col(candCol).as("cand_id"),
      col(rankCol).cast("long").as(s"rank_$suffix"))
    def term(c: Column) = coalesce(lit(1.0) / (lit(kRrf.toLong) + c), lit(0.0))
    val fused = side(a, "a")
      .join(side(b, "b"), Seq("query_id", "cand_id"), "full_outer")
      .select(col("query_id"), col("cand_id"),
        (floor((term(col("rank_a")) + term(col("rank_b"))) * lit(1e6)
          + lit(0.50001)) / lit(1e6)).as("rrf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("rrf").desc, col("cand_id").asc)
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("query_id", "rank", "cand_id", "rrf")
  }
}
