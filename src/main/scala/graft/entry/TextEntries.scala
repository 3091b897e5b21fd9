package graft.entry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.Tokenizer
import graft.ext.{Audit, Boilerplate, Export, Retrieval, TextAnalysis, TextHash}
import EntryUtil._

/**
 * Driver-contract queries for the tokenizer pipeline (SURVEY.md §2 rows B–E)
 * and the text-analysis extension operators, over the documents table.
 */
object TextEntries {

  private def tfDF(s: SparkSession, docs: DataFrame): DataFrame = {
    implicit val sp: SparkSession = s
    Tokenizer.termFrequency(Tokenizer.tokens(docs, "doc_id", "text")).toDF()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2-B tokenizer as a declarative explode (with stable positions)
    "tokenize" -> ((s, dir) =>
      gate(TextAnalysis.tokensWithPosition(docs(s, dir), "doc_id", "text")
        .withColumn("pos", col("pos").cast("long")), "doc_id", "pos")),
    // §2-D TF hash aggregate over §2-B's tokens
    "tf_matrix" -> ((s, dir) => gate(tfDF(s, docs(s, dir)), "y", "x")),
    // §2-C stop-word removal via broadcast left-anti join
    "tf_stopwords" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      val stops = s.createDataFrame(
        TextAnalysis.Stopwords.map(Tuple1(_))).toDF("token")
      gate(Tokenizer.termFrequency(
        Tokenizer.removeStopWords(
          Tokenizer.tokens(docs(s, dir), "doc_id", "text"), stops)).toDF(), "y", "x")
    }),
    // §2-E union of two disjoint TF halves
    "tf_union" -> ((s, dir) => {
      val d = docs(s, dir)
      val even = tfDF(s, d.where(col("doc_id") % 2 === 0))
      val odd = tfDF(s, d.where(col("doc_id") % 2 === 1))
      gate(even.union(odd), "y", "x")
    }),
    // TF-IDF weighting over §2-D's TF matrix
    "tfidf_matrix" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      gate(Tokenizer.tfIdf(
        Tokenizer.termFrequency(
          Tokenizer.tokens(docs(s, dir), "doc_id", "text"))).toDF(), "y", "x")
    }),
    // ext: quality statistics
    "text_stats" -> ((s, dir) =>
      gate(TextAnalysis.stats(docs(s, dir), "doc_id", "text"), "doc_id")),
    // ext: marker-based language identification
    "lang_id" -> ((s, dir) =>
      gate(TextAnalysis.langId(docs(s, dir), "doc_id", "text"), "doc_id")),
    // ext: per-chunk language consistency (code-switching detector) —
    // chunk-lang argmax re-aggregated per doc; the window partitions
    // are language-count bounded, never corpus bounded
    "lang_consistency" -> ((s, dir) =>
      gate(TextAnalysis.langConsistency(docs(s, dir), "doc_id", "text",
        LcChunkTokens), "doc_id")),
    // ext: whitespace + BPE-ish subword token counting
    "token_counts" -> ((s, dir) =>
      gate(TextAnalysis.tokenCounts(docs(s, dir), "doc_id", "text"), "doc_id")),
    // ext: order-sensitive rolling-hash fingerprint
    "doc_fingerprint" -> ((s, dir) =>
      gate(TextAnalysis.fingerprint(docs(s, dir), "doc_id", "text"), "doc_id")),
    // ext: Gopher-style bigram repetition quality signals
    "quality_repetition" -> ((s, dir) =>
      gate(TextAnalysis.repetition(docs(s, dir), "doc_id", "text"), "doc_id")),
    // ext: deterministic content-hash stratified sampling
    "sample_stratified" -> ((s, dir) =>
      gate(TextAnalysis.hashSample(docs(s, dir), "doc_id", "text", "lang",
        SampleRates, SampleDefault), "doc_id")),
    // ext: fixed-size token chunking with chunk-local fingerprints
    // sliding chunks with 50% overlap — the retrieval-indexing form
    "doc_chunks_sliding" -> ((s, dir) =>
      gate(TextAnalysis.chunksSliding(docs(s, dir), "doc_id", "text",
        ChunkSize, ChunkSize / 2), "doc_id", "chunk_id")),
    "doc_chunks" -> ((s, dir) =>
      gate(TextAnalysis.chunks(docs(s, dir), "doc_id", "text", ChunkSize),
        "doc_id", "chunk_id")),
    // ext: exact per-language length quantiles (threshold calibration)
    "quality_percentiles" -> ((s, dir) =>
      gate(TextAnalysis.quantiles(docs(s, dir), "lang", "n_chars", QuantileQs),
        "lang", "q")),
    // ext: histogram quantile SKETCH over the same signal — the
    // bounded-state mergeable path, deterministic unlike approx_percentile
    "quality_quantiles_sketch" -> ((s, dir) =>
      gate(TextAnalysis.quantileSketchHist(docs(s, dir), "lang", "n_chars",
        QuantileQs, HistWidth), "lang", "q")),
    // ext: weighted sampling without replacement (Efraimidis–Spirakis
    // Exp(w) keys from the deterministic avalanche uniform)
    "sample_weighted" -> ((s, dir) =>
      gate(TextAnalysis.weightedSample(docs(s, dir), "doc_id", "lang",
        "n_chars", WSampleK), "grp", "rank")),
    // ext: per-doc robust z (median/MAD) — outlier-resistant gate signal;
    // integer value column keeps median/dev/MAD exact int64 both engines
    "quality_robust_z" -> ((s, dir) =>
      gate(TextAnalysis.robustZ(docs(s, dir), "doc_id", "lang", "n_chars"),
        "doc_id")),
    // ext: vocabulary heavy hitters by document frequency
    "vocab_topk" -> ((s, dir) =>
      gate(TextAnalysis.vocabTopK(docs(s, dir), "doc_id", "text", VocabK), "token")),
    // ext: per-doc OOV share against the top-k vocab (tokenizer-coverage
    // health check; the vocab join is a k-row broadcast by construction)
    "vocab_coverage" -> ((s, dir) =>
      gate(TextAnalysis.vocabCoverage(docs(s, dir), "doc_id", "text", VocabK),
        "doc_id")),
    // ext: count-min sketch calibration vs the exact top-k occurrences
    "vocab_cms_audit" -> ((s, dir) =>
      gate(TextAnalysis.cmsVocabAudit(docs(s, dir), "doc_id", "text",
        CmsDepth, CmsWidth, CmsK), "token")),
    // ext: TextRank keyword scores — PageRank over the corpus-wide
    // content-token co-occurrence graph (adjacency over the filtered
    // sequence via ONE lead window, never a pos+1 self-join); full
    // (token, rank) distribution, no top-k tie policy needed
    "keywords_textrank" -> ((s, dir) =>
      gate(TextAnalysis.textRank(docs(s, dir), "doc_id", "text",
        TrIters, TrDamping, TrMinLen), "token")),
    // ext: CMS inner-product join-size estimate of the token-bucket
    // doc-pair candidate join ((Σ df² − N)/2), audited against the
    // exact postings aggregate — the plan-before-you-run number every
    // quadratic dedup kernel budgets against; integer end to end
    "pair_budget_sketch" -> ((s, dir) =>
      gate(TextAnalysis.pairBudgetSketch(docs(s, dir), "doc_id", "text",
        CmsDepth, CmsWidth), "n_postings")),
    // ext: HyperLogLog distinct-token audit per source (the cardinality
    // sketch pairing vocab_cms_audit's frequency sketch)
    "vocab_hll_audit" -> ((s, dir) =>
      gate(TextAnalysis.hllVocabAudit(docs(s, dir), "source", "text")
        .withColumnRenamed("grp", "source"), "source")),
    // ext: KMV bottom-k cardinality sketch vs the exact distinct count —
    // hash-independent second estimator next to HLL, whose k retained
    // rows double as a mergeable uniform sample of the distinct domain
    "vocab_kmv_audit" -> ((s, dir) =>
      gate(TextAnalysis.kmvVocabAudit(docs(s, dir), "doc_id", "text", KmvK),
        "k_eff")),
    // ext: per-(source, lang) corpus mixture statistics
    "corpus_mix" -> ((s, dir) =>
      gate(TextAnalysis.corpusMix(docs(s, dir), "text", Seq("source", "lang")),
        "source", "lang")),
    // ext: temperature-sampled mixture weights (n^tau rule) per source
    "corpus_temperature" -> ((s, dir) =>
      gate(TextAnalysis.temperatureMix(docs(s, dir), "source", "text",
        MixTau, MixBudget).withColumnRenamed("grp", "source"), "source")),
    // ext: data-constrained epoch allocation — the EXACT water-fill that
    // caps each source at maxEpochs and redistributes the freed budget
    "corpus_epochs" -> ((s, dir) =>
      gate(TextAnalysis.epochsPlan(docs(s, dir), "source", "text",
        EpochsTau, EpochsBudget, EpochsMax).withColumnRenamed("grp", "source"),
        "source")),
    // ext: blocklist density gate (C4 bad-words rule) — zero-exchange
    // higher-order-function projection (no explode, no aggregate; the
    // stream-safety spec depends on this shape), density snapped
    // before the cut
    "quality_blocklist" -> ((s, dir) =>
      gate(TextAnalysis.blocklistGate(docs(s, dir), "doc_id", "text",
        BlockPatterns, BlockMaxDensity), "doc_id")),
    // ext: hashing-trick doc vectors (fixed-dim bridge into the
    // cosine/ANN/k-means families), sparse long form
    "feature_hash" -> ((s, dir) =>
      gate(TextAnalysis.featureHash(docs(s, dir), "doc_id", "text"),
        "doc_id", "j")),
    // ext: concatenative sequence packing into 512-token bins, 8 streams
    "doc_packing" -> ((s, dir) =>
      gate(TextAnalysis.packSequences(docs(s, dir), "doc_id", "text",
        PackBudget, PackBuckets), "doc_id")),
    // ext: composite quality gate (thresholds split this corpus: ~10% on
    // tokens, ~10% on stopwords, ~25% on type-token ratio)
    "quality_filter" -> ((s, dir) =>
      gate(TextAnalysis.qualityFilter(docs(s, dir), "doc_id", "text",
        QfMinTokens, QfMaxTokens, QfMinAvgLen, QfMaxAvgLen, QfMaxStop, QfMinTtr),
        "doc_id")),
    // ext: BM25 keyword retrieval (rare + common terms, top-k cut)
    "bm25_search" -> ((s, dir) =>
      gate(Retrieval.bm25TopK(docs(s, dir), "doc_id", "text",
        Bm25Terms, Bm25K), "doc_id")),
    // ext: Dirichlet query-likelihood retrieval — the LM scoring family
    // next to BM25 over the same tf/dl/corpus stats; score snapped
    // BEFORE the rank cut so the top-k set is engine-exact
    "retrieval_qlm" -> ((s, dir) =>
      gate(Retrieval.qlmTopK(docs(s, dir), "doc_id", "text",
        Bm25Terms, Bm25K, QlmMu), "doc_id")),
    // ext: the term-keyed inverted index (tf/dl/df postings) — the
    // static side of the stream-static retrieval twin
    "bm25_index" -> ((s, dir) =>
      gate(Retrieval.bm25Index(docs(s, dir), "doc_id", "text"),
        "term", "doc_id")),
    // ext: directory-partitioned layout + partition pruning — the slice
    // reads ONLY the language's files (PartitionFilters, spec-pinned);
    // the oracle replays the same rollup over the unpartitioned table
    "docs_lang_pruned" -> ((s, dir) =>
      gate(graft.ext.Layout.langSlice(s, dir, PrunedLang)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("sum_chars"),
          min("doc_id").as("min_doc"),
          max("doc_id").as("max_doc")), "source")),
    // ext: Morton z-value (the Z-ORDER clustering sort key) over the
    // part table's (p_size, p_partkey mod 64) — row-local exact integer
    // bit interleave, replayed bit-for-bit by the oracle
    "layout_zvalue" -> ((s, dir) => {
      val p = s.read.parquet(s"$dir/part.parquet")
        .withColumn("pk6", pmod(col("p_partkey"), lit(64)))
      gate(p.select(col("p_partkey"),
        graft.ext.Layout.zValue(s, "p_size", "pk6", 6).as("z")), "p_partkey")
    }),
    // ext: per-language quartile bucketing by document length
    "quality_buckets" -> ((s, dir) =>
      gate(TextAnalysis.qualityBuckets(docs(s, dir), "doc_id", "lang",
        "n_chars", BucketK), "doc_id")),
    // ext: cross-source percentile calibration of the token-count
    // signal — histogram cumsum over distinct values + doc-sized join
    // back, never a per-source document sort
    "quality_quantile_norm" -> ((s, dir) => {
      val d = docs(s, dir)
      val sig = TextAnalysis.stats(d, "doc_id", "text")
        .select(col("doc_id"), col("n_tokens"))
        .join(d.select(col("doc_id"), col("source")), "doc_id")
      gate(TextAnalysis.quantileNormalize(sig, "doc_id", "source",
        "n_tokens"), "doc_id")
    }),
    // ext: curriculum training order — phase = percentile band of the
    // token-count signal per source, order_key = deterministic mix hash
    "corpus_curriculum" -> ((s, dir) => {
      val d = docs(s, dir)
      val sig = TextAnalysis.stats(d, "doc_id", "text")
        .select(col("doc_id"), col("n_tokens"))
        .join(d.select(col("doc_id"), col("source")), "doc_id")
      gate(TextAnalysis.curriculum(sig, "doc_id", "source", "n_tokens",
        phases = CurriculumPhases, salt = CurriculumSalt), "doc_id")
    }),
    // ext: stable train/val/test assignment by id-hash
    "split_assign" -> ((s, dir) =>
      gate(Export.splitAssign(docs(s, dir), "doc_id"), "doc_id")),
    // ext: deterministic shard + within-shard position export order
    "export_shards" -> ((s, dir) =>
      gate(Export.shardAssign(docs(s, dir), "doc_id", ExportShards), "doc_id")),
    // ext: per-shard integrity manifest (counts + portable checksum)
    "export_manifest" -> ((s, dir) =>
      gate(Export.shardManifest(docs(s, dir), "doc_id", "text", ExportShards),
        "shard")),
    // ext: corpus-unigram log-prob quality score (perplexity proxy)
    "quality_unigram" -> ((s, dir) =>
      gate(TextAnalysis.unigramLogProb(docs(s, dir), "doc_id", "text"), "doc_id")),
    // ext: bigram conditional log-prob (context-aware perplexity proxy)
    "quality_bigram" -> ((s, dir) =>
      gate(TextAnalysis.bigramLogProb(docs(s, dir), "doc_id", "text"), "doc_id")),
    // ext: held-out interpolated-bigram perplexity — fit on the id-hash
    // train split, score only documents the model never saw (the honest
    // CCNet-style perplexity gate; the two proxies above self-score)
    "quality_lm_heldout" -> ((s, dir) =>
      gate(TextAnalysis.heldoutPerplexity(docs(s, dir), "doc_id", "text",
        LmTrainPermille), "doc_id")),
    // ext: the cross-corpus deployment of the same gate — fit the LM on
    // the curated reference slice (every source but src0), score the
    // target slice against it (the decontaminate family's split)
    "quality_lm_cross" -> ((s, dir) => {
      val d = docs(s, dir)
      gate(TextAnalysis.perplexityAgainst(
        d.where(col("source") =!= LmTargetSource),
        d.where(col("source") === LmTargetSource), "doc_id", "text"), "doc_id")
    }),
    // ext: per-source token-budget sampling in deterministic hash order
    "corpus_budget" -> ((s, dir) =>
      gate(TextAnalysis.budgetSample(docs(s, dir), "doc_id", "text", "source",
        BudgetTokens), "doc_id")),
    // ext: vocabulary frequency-decade histogram (Zipf audit)
    "vocab_zipf" -> ((s, dir) =>
      gate(TextAnalysis.zipfHistogram(docs(s, dir), "doc_id", "text"),
        "n_digits")),
    // ext: per-(lang, source) corpus coverage/diversity audit
    "corpus_stats" -> ((s, dir) =>
      gate(TextAnalysis.corpusStats(docs(s, dir), "text",
        Seq("lang", "source")), "lang", "source")),
    // ext: per-language vocabulary heavy hitters (grouped top-k)
    "vocab_topk_by_lang" -> ((s, dir) =>
      gate(TextAnalysis.vocabTopKByGroup(docs(s, dir), "doc_id", "text",
        "lang", VocabLangK), "grp", "rank")),
    // ext: quality-signal correlation matrix (gate calibration)
    "quality_corr" -> ((s, dir) =>
      gate(TextAnalysis.signalCorrelation(docs(s, dir), "doc_id", "text"),
        "sig_x", "sig_y")),
    // ext: per-source JS divergence vs the global unigram distribution
    "corpus_divergence" -> ((s, dir) =>
      gate(TextAnalysis.corpusDivergence(docs(s, dir), "text", "source"),
        "grp")),
    // ext: snapshot diff vs a deterministically-derived second snapshot
    // (drop id%7, revise id%5, re-add id%11 under id+100000). The Spark
    // side diffs by sha256; the oracle compares texts directly — an
    // independent derivation of the same classification.
    "corpus_diff" -> ((s, dir) => {
      val d = docs(s, dir)
      val revised = d.where(pmod(col("doc_id"), lit(7)) =!= 0)
        .withColumn("text",
          when(pmod(col("doc_id"), lit(5)) === 0,
            concat(col("text"), lit(" rev2"))).otherwise(col("text")))
      val added = d.where(pmod(col("doc_id"), lit(11)) === 0)
        .withColumn("doc_id", col("doc_id") + lit(100000L))
      gate(Audit.corpusDiff(d, revised.unionByName(added), "doc_id", "text"),
        "doc_id")
    }),
    // ext: MERGE-INTO snapshot resolution over a two-commit log derived
    // deterministically from the corpus (v2 revises id%5, tombstones
    // id%7 — %35 overlaps resolve D-first like a real CDC feed). The
    // Spark side resolves via ONE max_by arg-max aggregate; the oracle
    // independently re-derives the winner with a version-desc window.
    "corpus_upsert" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      val v1 = d.select(col("doc_id"), lit(1L).as("version"),
        lit("U").as("op"), col("text"))
      val v2 = d.where(pmod(col("doc_id"), lit(5)) === 0 ||
          pmod(col("doc_id"), lit(7)) === 0)
        .select(col("doc_id"), lit(2L).as("version"),
          when(pmod(col("doc_id"), lit(7)) === 0, "D").otherwise("U").as("op"),
          concat(col("text"), lit(" v2")).as("text"))
      val snap = Audit.mergeSnapshots(v1.unionByName(v2),
        "doc_id", "version", "op")
      gate(snap.select(col("doc_id"), col("version"),
        length(col("text")).cast("long").as("n_chars")), "doc_id")
    }),
    // ext: PII detection + redaction. The synthetic corpus carries no PII,
    // so the contract plants one deterministic email/IPv4/phone per doc
    // (pure functions of doc_id, built identically on both engines) —
    // every regex and the staged-category attribution are exercised on
    // all 500 rows, not vacuously green on zero matches.
    "pii_scrub" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), concat(col("text"),
        lit(" mail u"), col("doc_id"), lit("@ex"), pmod(col("doc_id"), lit(7)),
        lit(".org host 10."), pmod(col("doc_id"), lit(256)),
        lit(".0."), pmod(col("doc_id") * 3, lit(256)),
        lit(" tel +1 555-01"),
        lpad(pmod(col("doc_id"), lit(100)).cast("string"), 2, "0")).as("text"))
      gate(TextAnalysis.piiScrub(d, "doc_id", "text")
        .withColumn("n_emails", col("n_emails").cast("long"))
        .withColumn("n_ips", col("n_ips").cast("long"))
        .withColumn("n_phones", col("n_phones").cast("long")), "doc_id")
    }),
    // ext: PII scrub v2 (VERDICT r6 ask #6) — six entity classes over a
    // richer planted corpus: per doc one email, one IBAN whose digit tail
    // would feed the card pattern if unstaged, one fixed Luhn-VALID card,
    // one id-derived card whose Luhn validity varies with doc_id (both
    // engines run the same checksum), one dashed SSN (a phone-shaped
    // digit run the staging must attribute to SSN), one IPv4, one phone
    "pii_scrub_v2" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), concat(col("text"),
        lit(" mail u"), col("doc_id"), lit("@ex"), pmod(col("doc_id"), lit(7)),
        lit(".org acct GB"),
        lpad(pmod(col("doc_id"), lit(100)).cast("string"), 2, "0"),
        lit("GRAFT"),
        lpad(pmod(col("doc_id"), lit(1000)).cast("string"), 10, "0"),
        lit(" card 4111 1111 1111 1111 alt 1234 5678 9012 "),
        lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
        lit(" ssn "),
        lpad(pmod(col("doc_id"), lit(1000)).cast("string"), 3, "0"), lit("-"),
        lpad(pmod(col("doc_id"), lit(100)).cast("string"), 2, "0"), lit("-"),
        lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
        lit(" host 10."), pmod(col("doc_id"), lit(256)),
        lit(".0."), pmod(col("doc_id") * 3, lit(256)),
        lit(" tel +1 555-01"),
        lpad(pmod(col("doc_id"), lit(100)).cast("string"), 2, "0")).as("text"))
      gate(TextAnalysis.piiScrubV2(d, "doc_id", "text"), "doc_id")
    }),
    // ext: segment-df boilerplate scrub (CCNet/Dolma cleaning pass). The
    // single-line corpus has no natural segments, so the contract plants
    // them: per doc a unique head (df 1, kept), a 3-way shared footer
    // (df ≈ N/3 ≫ cap, dropped), a 50-way promo line (df ≈ N/50 < cap,
    // kept — exercises the near side of the cap), and the doc's own
    // 40-char prefix — built identically on both engines.
    "boilerplate_scrub" -> ((s, dir) => {
      val planted = docs(s, dir).select(col("doc_id"),
        concat(lit("u"), col("doc_id"), lit(" unique head | footer f"),
          pmod(col("doc_id"), lit(3)), lit(" subscribe now | promo p"),
          pmod(col("doc_id"), lit(50)), lit(" sale | "),
          substring(col("text"), 1, 40)).as("text"))
      gate(Boilerplate.scrub(planted, "doc_id", "text",
        "\\|", " | ", BoilerMaxDf), "doc_id")
    }),
    // ext: per-doc unigram entropy (zero-exchange sorted-run fold)
    "quality_entropy" -> ((s, dir) =>
      gate(TextAnalysis.tokenEntropy(docs(s, dir), "doc_id", "text"),
        "doc_id")),
    // ext: PMI-ranked adjacent-bigram collocations; selection on the
    // 1e-6-snapped score so both engines pick the identical top-k set
    "vocab_pmi" -> ((s, dir) =>
      gate(TextAnalysis.pmiBigrams(docs(s, dir), "doc_id", "text",
        PmiMinCount, PmiK), "t1", "t2")),
    // ext: deterministic range-sharded export keyed by n_chars — the
    // sorted-output layout; boundaries from the histogram sketch
    "export_range_shards" -> ((s, dir) =>
      gate(Export.rangeShards(docs(s, dir), "doc_id", "n_chars",
        RangeShardK, HistWidth), "doc_id")),
    // ext: c-TF-IDF cluster labeling (BERTopic construction) over the
    // source clusters; top-k on the snapped weight, token tie-break
    "cluster_terms" -> ((s, dir) =>
      gate(TextAnalysis.clusterTerms(docs(s, dir), "doc_id", "text",
        "source", ClusterTermsK), "cluster", "rank")),
    // ext: BPE merge induction (tokenizer training) — greedy most-
    // frequent-pair rules over the word-frequency table, exact counts
    "vocab_bpe" -> ((s, dir) =>
      gate(TextAnalysis.bpeMerges(docs(s, dir), "doc_id", "text",
        BpeRounds), "round")),
    // ext: the encoding readout after applying those rules — vocab
    // size, symbols per token, chars per symbol
    "vocab_bpe_encode" -> ((s, dir) =>
      gate(TextAnalysis.bpeEncodeStats(docs(s, dir), "doc_id", "text",
        BpeRounds), "n_types")),
    // ext: per-language fertility under the trained BPE — the
    // cross-language tokenizer-fairness readout; one (lang, word)
    // aggregate + a vocab-sized join onto |symbols| per word
    "vocab_fertility" -> ((s, dir) =>
      gate(TextAnalysis.bpeFertilityByLang(docs(s, dir), "doc_id", "text",
        "lang", BpeRounds), "lang")),
    // ext: unigram-LM (SentencePiece-style) tokenizer training (r9 ask
    // #6) — the probabilistic half of the tokenizer story: hard EM over
    // word types with a row-local Viterbi DP fold; the oracle replays
    // both EM rounds with a recursive-CTE DP (the vocab_bpe pattern)
    "vocab_unigram_lm" -> ((s, dir) =>
      gate(TextAnalysis.unigramVocab(docs(s, dir), "doc_id", "text",
        TextAnalysis.UniIters, UniTopK), "rank")),
    // ext: the fertility readout of the final unigram segmentation —
    // same columns as vocab_bpe_encode, so pieces_per_token vs
    // syms_per_token compares the two tokenizers on the same corpus
    "vocab_unigram_encode" -> ((s, dir) =>
      gate(TextAnalysis.unigramEncodeStats(docs(s, dir), "doc_id", "text",
        TextAnalysis.UniIters), "n_types")),
    // ext: the character-coverage twin (r10 ask #7 — SentencePiece's
    // coverage guarantee): trained over the corpus plus a planted
    // CJK/emoji/accent doc with charCoverage on, so every corpus
    // character survives each M-step at a floor count of 1 and any
    // string over the corpus character set stays losslessly encodable
    "vocab_unigram_coverage" -> ((s, dir) =>
      gate(TextAnalysis.unigramVocab(coverageDocs(s, dir), "doc_id", "text",
        TextAnalysis.UniIters, UniTopK, charCoverage = true), "rank")),
    // ext: distilled quality classifier — 5 full-batch GD steps of
    // logistic regression labeled by the rule gate; emitted weights +
    // log-loss are continuous (no threshold counts), snap-safe
    "quality_lr" -> ((s, dir) =>
      gate(graft.ext.QualityModel.fitLogistic(docs(s, dir), "doc_id", "text",
        LrIters, LrRate, QfMinTokens, QfMaxTokens, QfMinAvgLen, QfMaxAvgLen,
        QfMaxStop, QfMinTtr), "feature")),
    // ext: the per-doc soft score under the SAME fit — the column a
    // cleaning pipeline thresholds; weights stay full-precision into
    // the sigmoid, only the emitted probability snaps
    "quality_lr_scores" -> ((s, dir) => {
      val w = graft.ext.QualityModel.fitLogistic(docs(s, dir), "doc_id",
          "text", LrIters, LrRate, QfMinTokens, QfMaxTokens, QfMinAvgLen,
          QfMaxAvgLen, QfMaxStop, QfMinTtr)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      gate(graft.ext.QualityModel.score(docs(s, dir), "doc_id", "text", w,
        QfMinTokens, QfMaxTokens, QfMinAvgLen, QfMaxAvgLen, QfMaxStop,
        QfMinTtr), "doc_id")
    }),
    // ext: exact Mann–Whitney AUC of the distilled classifier against
    // its rule-gate labels — the evaluate leg of train/score/evaluate;
    // 2U stays int64, one score-histogram window, division at the end
    "quality_lr_auc" -> ((s, dir) => {
      val w = graft.ext.QualityModel.fitLogistic(docs(s, dir), "doc_id",
          "text", LrIters, LrRate, QfMinTokens, QfMaxTokens, QfMinAvgLen,
          QfMaxAvgLen, QfMaxStop, QfMinTtr)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      gate(graft.ext.QualityModel.auc(
        graft.ext.QualityModel.score(docs(s, dir), "doc_id", "text", w,
          QfMinTokens, QfMaxTokens, QfMinAvgLen, QfMaxAvgLen, QfMaxStop,
          QfMinTtr), "gate_pass", "p_quality"), "n_pos")
    }),
    // ext: the ROC/PR operating-point table for the same fit — exact
    // int64 confusion matrix per candidate threshold from the snapped
    // score histogram (never a rescan per cut)
    "quality_lr_roc" -> ((s, dir) => {
      val w = graft.ext.QualityModel.fitLogistic(docs(s, dir), "doc_id",
          "text", LrIters, LrRate, QfMinTokens, QfMaxTokens, QfMinAvgLen,
          QfMaxAvgLen, QfMaxStop, QfMinTtr)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      gate(graft.ext.QualityModel.confusionSweep(
        graft.ext.QualityModel.score(docs(s, dir), "doc_id", "text", w,
          QfMinTokens, QfMaxTokens, QfMinAvgLen, QfMaxAvgLen, QfMaxStop,
          QfMinTtr), "gate_pass", "p_quality", RocThresholds), "t")
    }),
    // ext: reliability diagram for the same fit — per equal-width score
    // bin the count, mean predicted p, empirical positive rate, and the
    // signed calibration gap; bins from the SNAPPED score, zero rows kept
    "quality_lr_calibration" -> ((s, dir) => {
      val w = graft.ext.QualityModel.fitLogistic(docs(s, dir), "doc_id",
          "text", LrIters, LrRate, QfMinTokens, QfMaxTokens, QfMinAvgLen,
          QfMaxAvgLen, QfMaxStop, QfMinTtr)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      gate(graft.ext.QualityModel.calibration(
        graft.ext.QualityModel.score(docs(s, dir), "doc_id", "text", w,
          QfMinTokens, QfMaxTokens, QfMinAvgLen, QfMaxAvgLen, QfMaxStop,
          QfMinTtr), "gate_pass", "p_quality", CalibBins), "bin")
    }),
    // ext: exact two-sample KS drift test — is the en-slice's length
    // distribution the same population as the rest? D and its arg-cut
    // stay int64 (max of |cum1·n0 − cum0·n1|), one division + one exp
    "quality_ks" -> ((s, dir) => {
      val d = docs(s, dir).select(
        when(col("lang") === KsLang, lit(1L)).otherwise(lit(0L)).as("grp"),
        col("n_chars"))
      gate(graft.ext.QualityModel.ksTest(d, "grp", "n_chars"), "n1")
    }),
    // ext: lang × source contingency audit — chi-square independence,
    // Cramér's V, mutual information; observed-cells-only algebra
    // (Σ(o−e)²/e = Σo²/e − n), exact int64 marginals
    "corpus_chi2" -> ((s, dir) =>
      gate(graft.ext.Audit.contingencyStats(docs(s, dir), "lang", "source"),
        "n")),
    // ext: binned Population Stability Index over the same split — the
    // whole-distribution drift score next to KS's worst-gap statistic;
    // Laplace-smoothed observed bins, exact-rational probabilities
    "quality_psi" -> ((s, dir) => {
      val d = docs(s, dir).select(
        when(col("lang") === KsLang, lit(1L)).otherwise(lit(0L)).as("grp"),
        col("n_chars"))
      gate(graft.ext.QualityModel.psiDrift(d, "grp", "n_chars", PsiBinWidth),
        "n1")
    }),
    // ext: per-(lang) winsorization of n_chars at the 5/95 band; exact
    // int64 thresholds and clamp on both engines
    "quality_winsorize" -> ((s, dir) =>
      gate(TextAnalysis.winsorize(docs(s, dir), "doc_id", "lang",
        "n_chars", WinsLo, WinsHi), "doc_id")),
    // ext: DSIR importance weights (Xie et al. 2023) — per-doc hashed-
    // unigram target/raw log ratio; dim-row LM aggregates, broadcast
    // scoring join, integer token counts
    "corpus_dsir" -> ((s, dir) =>
      gate(TextAnalysis.dsirWeights(docs(s, dir), "doc_id", "text",
        "source", DsirTarget, pin = _.localCheckpoint()), "doc_id")),
    // ext: the DSIR selection step — snapped-weight TakeOrdered top-m,
    // doc_id tie-break; the resampled raw slice itself
    "corpus_dsir_sample" -> ((s, dir) =>
      gate(TextAnalysis.dsirSample(docs(s, dir), "doc_id", "text",
        "source", DsirTarget, DsirSampleM, pin = _.localCheckpoint()), "rank")),
    // ext: k-anonymity release audit over the (lang, source, len-bucket)
    // quasi-identifiers — one ROLLUP pass over a 3-level generalization
    // lattice, int64 risk counts, one share division
    "pii_kanon" -> ((s, dir) =>
      gate(TextAnalysis.kAnonymity(docs(s, dir), "lang", "source",
        "n_chars", KanonWidth, KanonK), "level")),
    // ext: the enforcement step — per row, the cheapest generalization
    // level that clears k; '*' / -1 suppression sentinels, never NULL
    "pii_kanon_scrub" -> ((s, dir) =>
      gate(TextAnalysis.kAnonymize(docs(s, dir), "doc_id", "lang", "source",
        "n_chars", KanonWidth, KanonK), "doc_id"))
  )

  /** Range-shard contract: 8 shards over the HistWidth-bucket sketch. */
  private val RangeShardK = 8

  /** Winsorize contract band. */
  private val WinsLo = 0.05
  private val WinsHi = 0.95

  /** Boilerplate contract: df cap (5% of the sf0.01 corpus). */
  private val BoilerMaxDf = 25L

  /** PMI contract: low-frequency guard and collocations kept. */
  private val PmiMinCount = 10L
  private val PmiK = 50

  /** c-TF-IDF contract: top terms kept per source cluster. */
  private val ClusterTermsK = 5

  /** BPE contract: merge rules learned (each round is a full pair-count
    * pass — real tokenizers run this same loop ~30k times). */
  private val BpeRounds = 6

  /** Logistic-gate distillation contract: GD steps and learning rate. */
  private val LrIters = 5
  private val LrRate = 0.5

  /** Candidate score cuts for the ROC/PR operating-point sweep —
    * interpolated as the SAME decimal literals into both plans. */
  private val RocThresholds = Seq(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)

  /** KS drift contract: the en slice vs the rest of the corpus. */
  private val KsLang = "en"

  /** Reliability-diagram contract: equal-width score bins. */
  private val CalibBins = 10

  /** PSI contract: n_chars bin width (dozens of observed bins at sf0.01). */
  private val PsiBinWidth = 200L

  /** The unrolled BPE round chain (word table → s0 chars → per-round
    * pair-count, argmax, window-parity greedy rewrite), shared by the
    * rule-learning and encoding oracles. Every per-round CTE is
    * MATERIALIZED — DuckDB inlines CTEs and this chain references the
    * previous round five times, which un-materialized is O(5^rounds).
    * `rewriteLast` adds round `BpeRounds`'s rewrite (encoding needs the
    * final symbol table; rule learning does not). The rewrite joins its
    * rule row with LEFT JOIN ON true, so a round whose pair table dried
    * up (m empty) passes symbols through UNCHANGED — matching the Spark
    * fit loop's early stop instead of collapsing the table to empty. */
  private def bpeChainSql(rewriteLast: Boolean): String = {
    val rounds = (1 to BpeRounds).map { j =>
      val prev = s"s${j - 1}"
      val tail =
        if (j == BpeRounds && !rewriteLast) ""
        else s""",
          |mt$j AS MATERIALIZED (SELECT s.word, s.pos FROM $prev s
          |        JOIN $prev t ON t.word = s.word AND t.pos = s.pos + 1
          |        JOIN m$j m ON s.sym = m.a AND t.sym = m.b),
          |vt$j AS MATERIALIZED (SELECT word, pos FROM (
          |          SELECT word, pos,
          |            row_number() OVER (PARTITION BY word, pos - rn
          |                               ORDER BY pos) AS k
          |          FROM (SELECT word, pos,
          |                  row_number() OVER (PARTITION BY word
          |                                     ORDER BY pos) AS rn
          |                FROM mt$j))
          |        WHERE k % 2 = 1),
          |s$j AS MATERIALIZED (SELECT s.word, s.n,
          |          CAST(row_number() OVER (PARTITION BY s.word
          |                                  ORDER BY s.pos) - 1 AS BIGINT) AS pos,
          |          CASE WHEN v.word IS NOT NULL THEN m.a || m.b
          |               ELSE s.sym END AS sym
          |        FROM $prev s
          |        LEFT JOIN m$j m ON true
          |        LEFT JOIN vt$j v ON v.word = s.word AND v.pos = s.pos
          |        WHERE NOT EXISTS (SELECT 1 FROM vt$j c
          |                          WHERE c.word = s.word
          |                            AND c.pos = s.pos - 1))""".stripMargin
      s"""pc$j AS MATERIALIZED (SELECT s.sym AS a, t.sym AS b,
         |        CAST(SUM(s.n) AS BIGINT) AS cnt
         |        FROM $prev s JOIN $prev t
         |          ON t.word = s.word AND t.pos = s.pos + 1
         |        GROUP BY 1, 2),
         |m$j AS MATERIALIZED (SELECT a, b, cnt FROM pc$j
         |       ORDER BY cnt DESC, a ASC, b ASC LIMIT 1)$tail""".stripMargin
    }.mkString(",\n")
    tokSql + s""",
      |w AS MATERIALIZED (SELECT token AS word, CAST(COUNT(*) AS BIGINT) AS n
      |      FROM tok GROUP BY 1),
      |s0 AS MATERIALIZED (SELECT word, n, CAST(i AS BIGINT) AS pos,
      |              substr(word, CAST(i + 1 AS INTEGER), 1) AS sym
      |       FROM w, UNNEST(range(length(word))) AS r(i)),
      |$rounds""".stripMargin
  }

  /** Pieces emitted by the vocab_unigram_lm contract. */
  private val UniTopK = 40

  /** The planted multi-script doc of the coverage contract: CJK words,
    * an emoji run, and an accented Latin word — scripts the corpus does
    * not carry, exercising exactly the characters the coverage floor
    * exists to retain. No apostrophes (the text is spliced into a SQL
    * literal on the oracle side). */
  private val CoveragePlant =
    "你好 世界 😀😀 你好世界 café café"

  /** Documents plus the planted multi-script doc (id 900001, above every
    * real id band). */
  private def coverageDocs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir).select(col("doc_id"), col("text"))
      .unionByName(Seq((900001L, CoveragePlant)).toDF("doc_id", "text"))
  }

  /**
   * The unigram-LM chain mirroring [[TextAnalysis.unigramVocab]] stage
   * by stage: word-frequency table → (end, k) candidate grid → seed
   * vocabulary (chars + top-[[TextAnalysis.UniSeedMulti]] substrings,
   * snapped ln(cnt/Σ)) → per EM round a dense log-prob list per word
   * (`list(lp ORDER BY idx)`), the Viterbi DP as a RECURSIVE CTE
   * carrying the (score, backpointer) struct list (one row per word
   * per position — DuckDB's spelling of the Spark side's row-local
   * fold), a recursive backtrace, and the piece-count M-step. Struct
   * 'max' is lexicographic in both engines, so the longer-piece
   * tie-break agrees; DP scores are sums of identical snapped doubles.
   * Every non-recursive stage CTE is MATERIALIZED (the CTE-inlining
   * gotcha); the chain opens tokSql with WITH RECURSIVE.
   */
  private lazy val unigramChainSql: String = unigramChain(false, "documents")

  /** [[unigramChainSql]] parameterized: `coverage` mirrors the Scala
    * side's `charCoverage` floor (every corpus character re-enters each
    * M-step at cnt ≥ 1 via the `chset` universe), `docsSrc` lets the
    * coverage contract replay the chain over the CJK/emoji-planted
    * fixture instead of the bare documents table. */
  private def unigramChain(coverage: Boolean, docsSrc: String): String = {
    import TextAnalysis.{UniMaxPiece, UniNegInf, UniSeedMulti, UniIters}
    def roundSql(r: Int): String = s"""
      |l$r AS MATERIALIZED (
      |  SELECT g.word, g.n, g.e, g.k, COALESCE(v.logp, $UniNegInf) AS lp
      |  FROM ugrid g LEFT JOIN v${r - 1} v ON v.piece = g.piece),
      |a$r AS MATERIALIZED (
      |  SELECT word, n, list(lp ORDER BY (e - 1) * $UniMaxPiece + k) AS lps,
      |         CAST(MAX(e) AS BIGINT) AS L
      |  FROM l$r GROUP BY word, n),
      |d$r AS (
      |  SELECT word, n, lps, L, CAST(0 AS BIGINT) AS pos,
      |         [{'sc': CAST(0.0 AS DOUBLE), 'bk': CAST(0 AS BIGINT)}] AS dp
      |  FROM a$r
      |  UNION ALL
      |  SELECT word, n, lps, L, pos + 1,
      |         list_append(dp, list_aggregate(
      |           list_transform(range(1, least($UniMaxPiece, pos + 1) + 1),
      |             k -> {'sc': dp[CAST(pos + 2 - k AS INTEGER)]['sc']
      |                         + lps[CAST(pos * $UniMaxPiece + k AS INTEGER)],
      |                   'bk': k}),
      |           'max'))
      |  FROM d$r WHERE pos < L),
      |f$r AS MATERIALIZED (SELECT word, n, L, dp FROM d$r WHERE pos = L),
      |b$r AS (
      |  SELECT word, n, dp, L AS pos, CAST([] AS VARCHAR[]) AS pieces FROM f$r
      |  UNION ALL
      |  SELECT word, n, dp, pos - dp[CAST(pos + 1 AS INTEGER)]['bk'],
      |         list_append(pieces, substr(word,
      |           CAST(pos - dp[CAST(pos + 1 AS INTEGER)]['bk'] + 1 AS INTEGER),
      |           CAST(dp[CAST(pos + 1 AS INTEGER)]['bk'] AS INTEGER)))
      |  FROM b$r WHERE pos > 0),
      |sg$r AS MATERIALIZED (SELECT word, n, pieces FROM b$r WHERE pos = 0),
      |cu$r AS MATERIALIZED (SELECT u.piece, CAST(SUM(s.n) AS BIGINT) AS cnt
      |  FROM sg$r s, UNNEST(s.pieces) AS u(piece) GROUP BY 1),
      |c$r AS MATERIALIZED (${if (coverage) s"""
      |  SELECT piece, cnt FROM cu$r
      |  UNION ALL
      |  SELECT ch.piece, CAST(1 AS BIGINT) AS cnt FROM chset ch
      |  WHERE NOT EXISTS (SELECT 1 FROM cu$r u WHERE u.piece = ch.piece)"""
        else s"""
      |  SELECT piece, cnt FROM cu$r"""}),
      |v$r AS MATERIALIZED (SELECT piece, cnt,
      |    ${r6sql("ln(CAST(cnt AS DOUBLE) / t.tot)")} AS logp
      |  FROM c$r, (SELECT CAST(SUM(cnt) AS DOUBLE) AS tot FROM c$r) t)""".stripMargin
    tokSql.replaceFirst("WITH ", "WITH RECURSIVE ")
      .replaceFirst("FROM documents", s"FROM $docsSrc") + s""",
      |w AS MATERIALIZED (SELECT token AS word, CAST(COUNT(*) AS BIGINT) AS n
      |      FROM tok GROUP BY 1),
      |ugrid AS MATERIALIZED (
      |  SELECT w.word, w.n, e.e AS e, k.k AS k,
      |         CASE WHEN k.k <= e.e THEN substr(w.word,
      |           CAST(e.e - k.k + 1 AS INTEGER), CAST(k.k AS INTEGER)) END AS piece
      |  FROM w, UNNEST(range(1, length(w.word) + 1)) AS e(e),
      |       UNNEST(range(1, ${UniMaxPiece + 1})) AS k(k)),
      |occ AS MATERIALIZED (
      |  SELECT piece, CAST(SUM(n) AS BIGINT) AS cnt FROM ugrid
      |  WHERE piece IS NOT NULL GROUP BY 1),
      |v0c AS MATERIALIZED (
      |  SELECT piece, cnt FROM occ WHERE length(piece) = 1
      |  UNION ALL
      |  SELECT piece, cnt FROM (SELECT piece, cnt FROM occ WHERE length(piece) > 1
      |                          ORDER BY cnt DESC, piece ASC LIMIT $UniSeedMulti)),
      |v0 AS MATERIALIZED (SELECT piece, cnt,
      |    ${r6sql("ln(CAST(cnt AS DOUBLE) / t.tot)")} AS logp
      |  FROM v0c, (SELECT CAST(SUM(cnt) AS DOUBLE) AS tot FROM v0c) t),${if (coverage) """
      |chset AS MATERIALIZED (SELECT piece FROM occ WHERE length(piece) = 1),""" else ""}
      |${(1 to UniIters).map(roundSql).mkString(",\n")}""".stripMargin
  }

  /** Token allowance per source for the budget-sampling contract (each
    * sf0.01 source holds ~1350 tokens, so the cut is non-trivial). */
  private val BudgetTokens = 600L

  /** Temperature + epoch budget of the corpus_temperature contract: the
    * standard up-sample-small-sources range, a budget near corpus size. */
  private val MixTau = 0.7
  private val MixBudget = 20000L

  /** Water-fill contract: τ=0.5 up-samples small sources, the 4-epoch
    * repetition cap is the data-constrained-scaling sweet spot, and the
    * budget (~4× this corpus's tokens) lands the saturation frontier
    * MID-corpus so both branches of the fill are exercised. */
  private val EpochsTau = 0.5
  private val EpochsBudget = 100000L
  private val EpochsMax = 4.0

  /** Blocklist contract: three corpus-common terms (~10% combined mean
    * density) and a cut just above it, so the flag splits the corpus on
    * per-document concentration rather than mere presence. */
  private val BlockPatterns = Seq("slow", "merge", "scan")
  private val BlockMaxDensity = 0.105

  /** BM25 contract: one rare term (df≈5% of docs) + two common ones. */
  private val Bm25Terms = Seq("dup", "window", "spark")
  private val Bm25K = 50

  /** Dirichlet smoothing mass for the query-likelihood contract (near
    * the corpus's ~40-token average document length × a few). */
  private val QlmMu = 300.0

  /** Partition-pruning contract: the biggest language slice (218 of 500
    * docs at sf0.01) read through the lang-partitioned layout. */
  private val PrunedLang = "en"
  private val Bm25K1 = 1.2
  private val Bm25B = 0.75

  /** Shard count for the export contract. */
  private val ExportShards = 16

  /** Bucket count for the quantile-bucket contract (quartiles). */
  private val BucketK = 4

  /** Curriculum contract: 4 quality-percentile phases, fixed salt. */
  private val CurriculumPhases = 4
  private val CurriculumSalt = 7L

  /** Context budget (tokens) and packing-stream count for the contract. */
  private val PackBudget = 512
  private val PackBuckets = 8

  /** Quality-filter contract bounds (calibrated against the sf0.01
    * distributions so every bound actually drops documents). */
  private[entry] val QfMinTokens = 20L
  private[entry] val QfMaxTokens = 100000L
  private[entry] val QfMinAvgLen = 2.0
  private[entry] val QfMaxAvgLen = 12.0
  private[entry] val QfMaxStop = 0.10
  private[entry] val QfMinTtr = 0.35

  /** Heavy-hitter count for the vocabulary contract. */
  private val VocabK = 100

  /** TextRank contract: 5 power-iteration rounds at the standard 0.85
    * damping (the graph_pagerank convention), content tokens ≥ 3 chars. */
  private val TrIters = 5
  private val TrDamping = 0.85
  private val TrMinLen = 3

  /** KMV contract: bottom-16 hashes — small enough that the estimator
    * (not the ≤k exact path) is exercised on the sf corpora's vocab. */
  private val KmvK = 16

  /** Language-consistency chunk width: 16 tokens gives the 10–99-token
    * corpus docs 1–7 chunks each, so multi-chunk voting is exercised. */
  private val LcChunkTokens = 16

  /** Per-language heavy hitters kept by the grouped-vocab contract. */
  private val VocabLangK = 15

  /** Count-min sketch contract: 4 rows × 512 counters, probed with the
    * exact top-20 — narrow enough that sf0.01's vocab visibly collides
    * (nonzero overcounts prove the audit measures something). */
  private val CmsDepth = 4
  private val CmsWidth = 512
  private val CmsK = 20

  /** Quantile points for the calibration contract. */
  private val QuantileQs = Seq(0.1, 0.5, 0.9, 0.99)

  /** Per-language draw of the weighted-sample contract. */
  private val WSampleK = 20

  /** Bucket width of the histogram quantile sketch contract: n_chars at
    * sf0.01 spans ~[40, 4000], so 50 gives ~80 occupied buckets per
    * group — sketch-sized state with a ≤49-char error envelope. */
  private val HistWidth = 50L

  /** Chunk width (tokens) for the chunking contract. */
  private val ChunkSize = 64

  /** Per-language keep rates for the sampling contract (en-heavy corpus
    * downsampled toward balance; others at the default floor). */
  private val SampleRates = Map("en" -> 0.5, "de" -> 0.8)
  private val SampleDefault = 0.25

  /** The oracle's rate CASE, derived from the SAME constants as the Spark
    * side (one source of truth — editing a rate cannot desync the gate). */
  private def sampleRateCase: String =
    SampleRates.map { case (stratum, r) =>
      s"WHEN d.lang = '$stratum' THEN ${math.floor(r * 1000).toLong}"
    }.mkString(" ") + s" ELSE ${math.floor(SampleDefault * 1000).toLong}"

  /** Target slice of the DSIR contract (5% of docs at every sf — the
    * small high-quality domain the raw crawl is steered toward). */
  private[entry] val DsirTarget = "src0"
  /** Kept raw docs of the DSIR selection contract (~10% at sf0.01). */
  private val DsirSampleM = 50

  /** The DSIR CTEs after `tok` (names ds-prefixed — the clean chain this
    * composes with in DedupEntries owns `cnt`/`tot`-style names): buckets
    * → per-(doc, slice, bucket) tf → the two add-1 smoothed LMs →
    * per-bucket log ratio. `dstf` is MATERIALIZED — the finals reference
    * it twice and DuckDB 1.0 inlines CTEs at every reference. Exposed
    * separately so a chain already carrying `tok` can append it. */
  private[entry] lazy val dsirCtesSql: String = {
    import TextAnalysis.{DsirDim, DsirSalt}
    s""",
      |dslab AS (SELECT doc_id,
      |               CAST(CASE WHEN source = '$DsirTarget' THEN 1 ELSE 0 END AS BIGINT) AS is_target
      |        FROM documents),
      |dsbk AS (SELECT tok.doc_id, dslab.is_target,
      |              CAST((${TextHash.avalancheSql(TextHash.tokenValue("token"), DsirSalt)}) % $DsirDim AS BIGINT) AS j
      |       FROM tok JOIN dslab USING (doc_id)),
      |dstf AS MATERIALIZED (SELECT doc_id, is_target, j, CAST(COUNT(*) AS BIGINT) AS tf
      |        FROM dsbk GROUP BY 1, 2, 3),
      |dscnt AS (SELECT j,
      |               CAST(SUM(CASE WHEN is_target = 1 THEN tf ELSE 0 END) AS BIGINT) AS ct,
      |               CAST(SUM(CASE WHEN is_target = 0 THEN tf ELSE 0 END) AS BIGINT) AS cr
      |        FROM dstf GROUP BY 1),
      |dstot AS (SELECT CAST(SUM(ct) AS BIGINT) AS tt, CAST(SUM(cr) AS BIGINT) AS tr FROM dscnt),
      |dslw AS (SELECT j, ln((ct + 1) / CAST(tt + $DsirDim AS DOUBLE))
      |               - ln((cr + 1) / CAST(tr + $DsirDim AS DOUBLE)) AS lw
      |       FROM dscnt, dstot)""".stripMargin
  }

  /** [[dsirCtesSql]] with its own tokenizer prefix (the standalone
    * DSIR oracles' chain). */
  private lazy val dsirChainSql: String = tokSql + dsirCtesSql


  /** Length-bucket width and k threshold of the k-anonymity contract:
    * n_chars spans ~[40, 4000], so 500 gives ~8 buckets — QI classes of
    * a few docs each at sf0.01, mixed risky/safe at every level. */
  private val KanonWidth = 500L
  private val KanonK = 5L

  /** Train-split share of the held-out perplexity contract: 800‰ fits
    * the LM, the remaining 200‰ is scored — enough held-out docs at
    * every gate sf (sf0.001: ~10, sf0.01: ~100) for a stable readout. */
  private val LmTrainPermille = 800

  /** Target slice of the cross-corpus perplexity contract — the same
    * source the decontamination family treats as the eval corpus, so the
    * reference LM fits on every OTHER source (19/20 of the corpus). */
  private val LmTargetSource = "src0"

  /** Tokens-with-position CTE mirroring [[TextAnalysis.tokensWithPosition]]. */
  val tokSql: String =
    """WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents),
      |tok AS MATERIALIZED (SELECT doc_id, CAST(i AS BIGINT) AS pos, toks[i+1] AS token
      |        FROM t, UNNEST(range(len(toks))) AS r(i)
      |        WHERE toks[i+1] <> '')""".stripMargin

  private val tfSql =
    tokSql + """,
      |tf AS (SELECT CAST(doc_id AS VARCHAR) AS y, token AS x,
      |              CAST(COUNT(*) AS DOUBLE) AS value
      |       FROM tok GROUP BY 1, 2)""".stripMargin

  private[entry] def inList(xs: Seq[String]) = xs.map(x => s"'$x'").mkString("(", ", ", ")")

  private val langScores = TextAnalysis.LangMarkers.map { case (lang, markers) =>
    s"CAST(SUM(CASE WHEN token IN ${inList(markers)} THEN 1 ELSE 0 END) AS BIGINT) AS score_$lang"
  }.mkString(", ")

  /** The HLL audit oracle chain, grouped by a documents column. */
  private def hllAuditSql(groupCol: String): String = {
    import TextAnalysis.{HllAlpha, HllM}
    tokSql + s""",
      |tv AS (SELECT d.$groupCol AS grp, ${TextHash.tokenValue("token")} AS v
      |       FROM tok JOIN documents d USING (doc_id)),
      |hh AS (SELECT grp, ${TextAnalysis.hllH2Sql("v")} AS h2 FROM tv),
      |hw AS (SELECT grp, CAST(h2 % $HllM AS BIGINT) AS j,
      |              CAST((h2 - h2 % $HllM) / $HllM AS BIGINT) AS w FROM hh),
      |reg AS (SELECT grp, j, MAX(${TextAnalysis.hllRhoSql("w")}) AS mj
      |        FROM hw GROUP BY 1, 2),
      |zs AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_nonzero,
      |              SUM(${TextAnalysis.hllInvPowSql("mj")}) AS z_live
      |       FROM reg GROUP BY 1),
      |ez AS (SELECT grp, n_nonzero,
      |              ${HllAlpha * HllM * HllM} /
      |                (z_live + CAST($HllM - n_nonzero AS DOUBLE)) AS e_raw
      |       FROM zs),
      |est AS (SELECT grp, n_nonzero,
      |               CASE WHEN e_raw <= ${2.5 * HllM} AND n_nonzero < $HllM
      |                    THEN ${HllM.toDouble} *
      |                         ln(${HllM.toDouble} / CAST($HllM - n_nonzero AS DOUBLE))
      |                    ELSE e_raw END AS hll_est
      |        FROM ez),
      |ex AS (SELECT grp, CAST(COUNT(DISTINCT v) AS BIGINT) AS n_exact
      |       FROM tv GROUP BY 1)
      |SELECT ex.grp AS $groupCol, ex.n_exact, est.n_nonzero,
      |       ${r6sql("est.hll_est")} AS hll_est,
      |       ${r6sql("(est.hll_est - ex.n_exact) / ex.n_exact")} AS rel_err
      |FROM ex JOIN est USING (grp) ORDER BY $groupCol""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // the same staged scrub (emails → IPv4 → phones) over the same planted
    // text; both regex dialects (Java / RE2) are leftmost with no
    // lookaround, so counts and replacements agree exactly
    "pii_scrub" ->
      s"""WITH d AS (SELECT doc_id,
        |  text || ' mail u' || doc_id || '@ex' || (doc_id % 7) ||
        |  '.org host 10.' || (doc_id % 256) || '.0.' || ((doc_id * 3) % 256) ||
        |  ' tel +1 555-01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') AS text
        |  FROM documents),
        |s1 AS (SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '${TextAnalysis.EmailPattern}')) AS BIGINT) AS n_emails,
        |  regexp_replace(text, '${TextAnalysis.EmailPattern}', '<EMAIL>', 'g') AS t1 FROM d),
        |s2 AS (SELECT doc_id, n_emails,
        |  CAST(len(regexp_extract_all(t1, '${TextAnalysis.Ipv4Pattern}')) AS BIGINT) AS n_ips,
        |  regexp_replace(t1, '${TextAnalysis.Ipv4Pattern}', '<IP>', 'g') AS t2 FROM s1)
        |SELECT doc_id, n_emails, n_ips,
        |  CAST(len(regexp_extract_all(t2, '${TextAnalysis.PhonePattern}')) AS BIGINT) AS n_phones,
        |  regexp_replace(t2, '${TextAnalysis.PhonePattern}', '<PHONE>', 'g') AS clean_text
        |FROM s2 ORDER BY doc_id""".stripMargin,
    // v2: same staging order as TextAnalysis.piiScrubV2 (emails → IBANs →
    // cards → SSNs → IPv4 → phones) and the IDENTICAL Luhn fold spelled
    // with DuckDB's list lambdas
    "pii_scrub_v2" -> {
      def luhnDuck(s: String) = {
        def digit(i: String) = s"CAST(substr($s, length($s) - $i, 1) AS INT)"
        s"""list_aggregate(list_transform(range(0, length($s)),
           |  i -> CASE WHEN i % 2 = 1
           |       THEN CASE WHEN ${digit("i")} * 2 > 9
           |            THEN ${digit("i")} * 2 - 9 ELSE ${digit("i")} * 2 END
           |       ELSE ${digit("i")} END),
           |  'sum') % 10 = 0""".stripMargin
      }
      s"""WITH d AS (SELECT doc_id,
        |  text || ' mail u' || doc_id || '@ex' || (doc_id % 7) ||
        |  '.org acct GB' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') ||
        |  'GRAFT' || lpad(CAST(doc_id % 1000 AS VARCHAR), 10, '0') ||
        |  ' card 4111 1111 1111 1111 alt 1234 5678 9012 ' ||
        |  lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
        |  ' ssn ' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' ||
        |  lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || '-' ||
        |  lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
        |  ' host 10.' || (doc_id % 256) || '.0.' || ((doc_id * 3) % 256) ||
        |  ' tel +1 555-01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') AS text
        |  FROM documents),
        |s1 AS (SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '${TextAnalysis.EmailPattern}')) AS BIGINT) AS n_emails,
        |  regexp_replace(text, '${TextAnalysis.EmailPattern}', '<EMAIL>', 'g') AS t1 FROM d),
        |s2 AS (SELECT doc_id, n_emails,
        |  CAST(len(regexp_extract_all(t1, '${TextAnalysis.IbanPattern}')) AS BIGINT) AS n_ibans,
        |  regexp_replace(t1, '${TextAnalysis.IbanPattern}', '<IBAN>', 'g') AS t2 FROM s1),
        |s3 AS (SELECT doc_id, n_emails, n_ibans,
        |  CAST(len(regexp_extract_all(t2, '${TextAnalysis.CardPattern}')) AS BIGINT) AS n_cardlike,
        |  CAST(len(list_filter(
        |    list_transform(regexp_extract_all(t2, '${TextAnalysis.CardPattern}'),
        |      c -> replace(replace(c, '-', ''), ' ', '')),
        |    s -> ${luhnDuck("s")})) AS BIGINT) AS n_cards_luhn,
        |  regexp_replace(t2, '${TextAnalysis.CardPattern}', '<CARD>', 'g') AS t3 FROM s2),
        |s4 AS (SELECT doc_id, n_emails, n_ibans, n_cardlike, n_cards_luhn,
        |  CAST(len(regexp_extract_all(t3, '${TextAnalysis.SsnPattern}')) AS BIGINT) AS n_ssns,
        |  regexp_replace(t3, '${TextAnalysis.SsnPattern}', '<SSN>', 'g') AS t4 FROM s3),
        |s5 AS (SELECT doc_id, n_emails, n_ibans, n_cardlike, n_cards_luhn, n_ssns,
        |  CAST(len(regexp_extract_all(t4, '${TextAnalysis.Ipv4Pattern}')) AS BIGINT) AS n_ips,
        |  regexp_replace(t4, '${TextAnalysis.Ipv4Pattern}', '<IP>', 'g') AS t5 FROM s4)
        |SELECT doc_id, n_emails, n_ibans, n_cardlike, n_cards_luhn, n_ssns, n_ips,
        |  CAST(len(regexp_extract_all(t5, '${TextAnalysis.PhonePattern}')) AS BIGINT) AS n_phones,
        |  regexp_replace(t5, '${TextAnalysis.PhonePattern}', '<PHONE>', 'g') AS clean_text
        |FROM s5 ORDER BY doc_id""".stripMargin
    },
    "tokenize" ->
      (tokSql + "\nSELECT doc_id, pos, token FROM tok ORDER BY doc_id, pos"),
    "tf_matrix" ->
      (tfSql + "\nSELECT y, x, value FROM tf ORDER BY y, x"),
    "tfidf_matrix" ->
      (tfSql + s""",
        |nd AS (SELECT CAST(COUNT(DISTINCT y) AS DOUBLE) AS n FROM tf),
        |df AS (SELECT x, CAST(COUNT(*) AS DOUBLE) AS dfx FROM tf GROUP BY x)
        |SELECT tf.y, tf.x, ${r6sql("tf.value * ln(nd.n / df.dfx)")} AS value
        |FROM tf JOIN df USING (x) CROSS JOIN nd ORDER BY y, x""".stripMargin),
    "tf_stopwords" ->
      (tokSql + s"""
        |SELECT CAST(doc_id AS VARCHAR) AS y, token AS x, CAST(COUNT(*) AS DOUBLE) AS value
        |FROM tok WHERE token NOT IN ${inList(TextAnalysis.Stopwords)}
        |GROUP BY 1, 2 ORDER BY y, x""".stripMargin),
    "tf_union" ->
      (tokSql + """,
        |h0 AS (SELECT CAST(doc_id AS VARCHAR) AS y, token AS x, CAST(COUNT(*) AS DOUBLE) AS value
        |       FROM tok WHERE doc_id % 2 = 0 GROUP BY 1, 2),
        |h1 AS (SELECT CAST(doc_id AS VARCHAR) AS y, token AS x, CAST(COUNT(*) AS DOUBLE) AS value
        |       FROM tok WHERE doc_id % 2 = 1 GROUP BY 1, 2)
        |SELECT * FROM (SELECT * FROM h0 UNION ALL SELECT * FROM h1) u ORDER BY y, x""".stripMargin),
    "text_stats" ->
      (tokSql + s"""
        |SELECT doc_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |       CAST(COUNT(DISTINCT token) AS BIGINT) AS n_distinct,
        |       ${r6sql("CAST(SUM(length(token)) AS DOUBLE) / COUNT(*)")} AS avg_token_len,
        |       ${r6sql(s"CAST(SUM(CASE WHEN token IN ${inList(TextAnalysis.Stopwords)} THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)")} AS stopword_ratio,
        |       ${r6sql("CAST(COUNT(DISTINCT token) AS DOUBLE) / COUNT(*)")} AS ttr
        |FROM tok GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    "lang_id" ->
      (tokSql + s""",
        |scored AS (SELECT doc_id, $langScores FROM tok GROUP BY doc_id)
        |SELECT doc_id, score_en, score_de, score_fr, score_es,
        |       CASE WHEN score_en >= score_de AND score_en >= score_fr AND score_en >= score_es THEN 'en'
        |            WHEN score_de >= score_fr AND score_de >= score_es THEN 'de'
        |            WHEN score_fr >= score_es THEN 'fr'
        |            ELSE 'es' END AS pred_lang
        |FROM scored ORDER BY doc_id""".stripMargin),
    // same chunk split (pos // width), same marker scores and argmax
    // cascade per chunk, winner via (count desc, lang) row_number
    "lang_consistency" ->
      (tokSql + s""",
        |ck AS (SELECT doc_id, pos // $LcChunkTokens AS chunk_id, token FROM tok),
        |scored AS (SELECT doc_id, chunk_id, $langScores
        |           FROM ck GROUP BY doc_id, chunk_id),
        |cl AS (SELECT doc_id, chunk_id,
        |       CASE WHEN score_en >= score_de AND score_en >= score_fr AND score_en >= score_es THEN 'en'
        |            WHEN score_de >= score_fr AND score_de >= score_es THEN 'de'
        |            WHEN score_fr >= score_es THEN 'fr'
        |            ELSE 'es' END AS pred_lang FROM scored),
        |pl AS (SELECT doc_id, pred_lang, CAST(COUNT(*) AS BIGINT) AS c
        |       FROM cl GROUP BY 1, 2),
        |rk AS (SELECT doc_id, pred_lang, c,
        |       row_number() OVER (PARTITION BY doc_id
        |                          ORDER BY c DESC, pred_lang) AS rn FROM pl)
        |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_chunks,
        |  CAST(COUNT(*) AS BIGINT) AS n_langs,
        |  MAX(CASE WHEN rn = 1 THEN pred_lang END) AS majority_lang,
        |  ${r6sql("CAST(MAX(CASE WHEN rn = 1 THEN c END) AS DOUBLE)" +
            " / CAST(SUM(c) AS DOUBLE)")} AS majority_share
        |FROM rk GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    "token_counts" ->
      (tokSql + """
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS ws_tokens,
        |       CAST(SUM(CAST(ceil(length(token)/4.0) AS BIGINT)) AS BIGINT) AS subword_est
        |FROM tok GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    "doc_fingerprint" ->
      (tokSql + s""",
        |terms AS (SELECT doc_id, ${TextHash.fingerprintTerm("pos", "token")} AS term FROM tok)
        |SELECT doc_id, CAST(SUM(term) % ${TextHash.M} AS BIGINT) AS fingerprint
        |FROM terms GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    "quality_percentiles" -> {
      val qvals = QuantileQs.map(q => s"($q)").mkString(", ")
      s"""WITH ranked AS (SELECT lang AS grp, n_chars AS v,
        |                row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rn
        |                FROM documents),
        |cnt AS (SELECT grp, MAX(rn) AS n FROM ranked GROUP BY grp),
        |qs AS (SELECT * FROM (VALUES $qvals) q(q)),
        |tgt AS (SELECT grp, q, CAST(1 + floor(q * (n - 1)) AS BIGINT) AS rn
        |        FROM cnt CROSS JOIN qs)
        |SELECT t.grp AS lang, ${r6sql("t.q")} AS q, CAST(r.v AS BIGINT) AS n_chars_q
        |FROM tgt t JOIN ranked r USING (grp, rn) ORDER BY lang, q""".stripMargin
    },
    // histogram-sketch mirror: same integer bucketing, same cumulative
    // crossing rule, same type-1 rank targets
    "quality_quantiles_sketch" -> {
      val qvals = QuantileQs.map(q => s"($q)").mkString(", ")
      s"""WITH hist AS (SELECT lang AS grp, n_chars // $HistWidth AS bucket,
        |                     CAST(COUNT(*) AS BIGINT) AS c
        |              FROM documents GROUP BY 1, 2),
        |cum AS (SELECT grp, bucket,
        |               SUM(c) OVER (PARTITION BY grp ORDER BY bucket) AS cum
        |        FROM hist),
        |cnt AS (SELECT grp, CAST(SUM(c) AS BIGINT) AS n FROM hist GROUP BY grp),
        |qs AS (SELECT * FROM (VALUES $qvals) q(q)),
        |tgt AS (SELECT grp, q, CAST(1 + floor(q * (n - 1)) AS BIGINT) AS rn
        |        FROM cnt CROSS JOIN qs)
        |SELECT t.grp AS lang, ${r6sql("t.q")} AS q,
        |       CAST(MIN(c.bucket) * $HistWidth AS BIGINT) AS n_chars_q
        |FROM tgt t JOIN cum c ON c.grp = t.grp AND c.cum >= t.rn
        |GROUP BY t.grp, t.q ORDER BY lang, q""".stripMargin
    },
    // same avalanche uniform, same snapped Exp(w) key, same rank rule
    "sample_weighted" -> {
      val u = s"(CAST(${TextHash.avalancheSql("doc_id", 0L)} + 1 AS DOUBLE) / ${TextHash.P31 + 1}.0)"
      s"""WITH b AS (SELECT doc_id, lang AS grp, CAST(n_chars AS BIGINT) AS weight
        |           FROM documents),
        |keyed AS (SELECT doc_id, grp, weight,
        |                 ${r6sql(s"-ln($u) / CAST(weight AS DOUBLE)")} AS key
        |          FROM b),
        |rk AS (SELECT doc_id, grp, weight, key,
        |              row_number() OVER (PARTITION BY grp
        |                                 ORDER BY key, doc_id) AS rank
        |       FROM keyed)
        |SELECT doc_id, grp, weight, key, CAST(rank AS BIGINT) AS rank
        |FROM rk WHERE rank <= $WSampleK ORDER BY grp, rank""".stripMargin
    },
    // robust-z mirror: type-1 medians via rank windows (value AT a rank
    // is tie-order-independent), exact int64 deviations, one snapped div
    "quality_robust_z" ->
      s"""WITH b AS (SELECT doc_id, lang AS grp, n_chars AS v FROM documents),
        |r1 AS (SELECT grp, v, row_number() OVER (PARTITION BY grp ORDER BY v) AS rn
        |       FROM b),
        |c1 AS (SELECT grp, MAX(rn) AS n FROM r1 GROUP BY grp),
        |md AS (SELECT r1.grp, CAST(r1.v AS BIGINT) AS med
        |       FROM r1 JOIN c1 USING (grp)
        |       WHERE r1.rn = 1 + CAST(floor(0.5 * (c1.n - 1)) AS BIGINT)),
        |d AS (SELECT b.doc_id, b.grp, b.v, md.med, abs(b.v - md.med) AS dev
        |      FROM b JOIN md USING (grp)),
        |r2 AS (SELECT grp, dev, row_number() OVER (PARTITION BY grp ORDER BY dev) AS rn
        |       FROM d),
        |c2 AS (SELECT grp, MAX(rn) AS n FROM r2 GROUP BY grp),
        |md2 AS (SELECT r2.grp, CAST(r2.dev AS BIGINT) AS mad
        |        FROM r2 JOIN c2 USING (grp)
        |        WHERE r2.rn = 1 + CAST(floor(0.5 * (c2.n - 1)) AS BIGINT))
        |SELECT d.doc_id, d.grp AS lang, CAST(d.v AS BIGINT) AS n_chars,
        |       d.med, md2.mad,
        |       ${r6sql("CASE WHEN md2.mad = 0 THEN 0.0 ELSE (d.v - d.med) / (1.4826 * md2.mad) END")} AS robust_z
        |FROM d JOIN md2 USING (grp) ORDER BY doc_id""".stripMargin,
    "doc_chunks" ->
      (tokSql + s""",
        |terms AS (SELECT doc_id, pos // $ChunkSize AS chunk_id, pos,
        |                 ${TextHash.fingerprintTerm(s"pos % $ChunkSize", "token")} AS term
        |          FROM tok)
        |SELECT doc_id, chunk_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |       CAST(MIN(pos) AS BIGINT) AS first_pos,
        |       CAST(MAX(pos) AS BIGINT) AS last_pos,
        |       CAST(SUM(term) % ${TextHash.M} AS BIGINT) AS chunk_fp
        |FROM terms GROUP BY doc_id, chunk_id ORDER BY doc_id, chunk_id""".stripMargin),
    // sliding mirror: per-token membership range via the same clamped
    // integer division, chunk-local fingerprint positions
    "doc_chunks_sliding" -> {
      val stride = ChunkSize / 2
      tokSql + s""",
        |mem AS (SELECT doc_id, pos, token, k AS chunk_id
        |        FROM tok, UNNEST(range(
        |          greatest(CAST(0 AS BIGINT), (pos - $ChunkSize + $stride) // $stride),
        |          pos // $stride + 1)) AS r(k)),
        |terms AS (SELECT doc_id, chunk_id, pos,
        |                 ${TextHash.fingerprintTerm(s"pos - chunk_id * $stride", "token")} AS term
        |          FROM mem)
        |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |       CAST(MIN(pos) AS BIGINT) AS first_pos,
        |       CAST(MAX(pos) AS BIGINT) AS last_pos,
        |       CAST(SUM(term) % ${TextHash.M} AS BIGINT) AS chunk_fp
        |FROM terms GROUP BY doc_id, chunk_id ORDER BY doc_id, chunk_id""".stripMargin
    },
    "sample_stratified" ->
      (tokSql + s""",
        |terms AS (SELECT doc_id, ${TextHash.fingerprintTerm("pos", "token")} AS term FROM tok),
        |fp AS (SELECT doc_id, CAST(SUM(term) % ${TextHash.M} AS BIGINT) AS fingerprint
        |       FROM terms GROUP BY doc_id)
        |SELECT d.doc_id, d.lang, f.fingerprint
        |FROM documents d JOIN fp f USING (doc_id)
        |WHERE f.fingerprint % 1000 < CASE $sampleRateCase END
        |ORDER BY doc_id""".stripMargin),
    "doc_packing" ->
      s"""WITH d AS (SELECT doc_id,
        |            CAST(len(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS BIGINT) AS nt,
        |            doc_id % $PackBuckets AS bucket
        |            FROM documents),
        |o AS (SELECT doc_id, CAST(bucket AS BIGINT) AS bucket, nt,
        |             CAST(COALESCE(SUM(nt) OVER (PARTITION BY bucket ORDER BY doc_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS so
        |      FROM d WHERE nt > 0)
        |SELECT doc_id, bucket, nt, so AS start_offset,
        |       so // $PackBudget AS first_bin,
        |       (so + nt - 1) // $PackBudget AS last_bin
        |FROM o ORDER BY doc_id""".stripMargin,
    // bounds compare RAW signal values exactly as the Spark side's where
    // does (each is one IEEE division of identical integers — bit-equal
    // across engines); rounding happens only on the projected output
    "quality_filter" ->
      (tokSql + s""",
        |st AS (SELECT doc_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |       CAST(COUNT(DISTINCT token) AS BIGINT) AS n_distinct,
        |       CAST(SUM(length(token)) AS DOUBLE) / COUNT(*) AS avg_token_len,
        |       CAST(SUM(CASE WHEN token IN ${inList(TextAnalysis.Stopwords)} THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS stopword_ratio,
        |       CAST(COUNT(DISTINCT token) AS DOUBLE) / COUNT(*) AS ttr
        |       FROM tok GROUP BY doc_id)
        |SELECT doc_id, n_tokens, n_distinct,
        |       ${r6sql("avg_token_len")} AS avg_token_len,
        |       ${r6sql("stopword_ratio")} AS stopword_ratio,
        |       ${r6sql("ttr")} AS ttr
        |FROM st
        |WHERE n_tokens >= $QfMinTokens AND n_tokens <= $QfMaxTokens
        |  AND avg_token_len >= $QfMinAvgLen AND avg_token_len <= $QfMaxAvgLen
        |  AND stopword_ratio <= $QfMaxStop AND ttr >= $QfMinTtr
        |ORDER BY doc_id""".stripMargin),
    "corpus_mix" ->
      s"""WITH d AS (SELECT source, lang, length(text) AS nc,
        |            len(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS nt
        |            FROM documents)
        |SELECT source, lang,
        |       CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(nc) AS BIGINT) AS n_chars,
        |       CAST(SUM(nt) AS BIGINT) AS n_tokens,
        |       ${r6sql("CAST(SUM(nt) AS DOUBLE) / COUNT(*)")} AS avg_tokens
        |FROM d GROUP BY source, lang ORDER BY source, lang""".stripMargin,
    // top-k is cut on the total order (doc_freq DESC, token) — ties at the
    // boundary resolve identically in both engines — then re-sorted by the
    // gate's unique key
    "vocab_topk" ->
      (tokSql + s""",
        |dt AS (SELECT DISTINCT doc_id, token FROM tok),
        |df AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS doc_freq FROM dt GROUP BY token)
        |SELECT token, doc_freq FROM
        |  (SELECT token, doc_freq FROM df ORDER BY doc_freq DESC, token LIMIT $VocabK) t
        |ORDER BY token""".stripMargin),
    // the same deterministic (df desc, token) vocab selection, then a
    // per-occurrence LEFT probe — share is one exact-int division
    "vocab_coverage" ->
      (tokSql + s""",
        |dt AS (SELECT DISTINCT doc_id, token FROM tok),
        |dfq AS (SELECT token, COUNT(*) AS doc_freq FROM dt GROUP BY token),
        |v AS (SELECT token FROM dfq ORDER BY doc_freq DESC, token LIMIT $VocabK)
        |SELECT tok.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |  ${r6sql("CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)")} AS oov_share
        |FROM tok LEFT JOIN v ON v.token = tok.token
        |GROUP BY 1 ORDER BY 1""".stripMargin),
    // the sketch rebuilt from the same portable hash chain (tokenValue →
    // mix with the row index as salt), one UNION ALL branch per row so
    // Export.mixBucketSql is reused verbatim with a literal salt
    "vocab_cms_audit" -> {
      def mix(r: Int) = Export.mixBucketSql("v", CmsWidth, r)
      val cellRows = (0 until CmsDepth)
        .map(r => s"SELECT $r AS r, ${mix(r)} AS b FROM tv")
        .mkString("\n        UNION ALL ")
      val probeRows = (0 until CmsDepth)
        .map(r => s"SELECT token, n_exact, $r AS r, ${mix(r)} AS b FROM exact")
        .mkString("\n        UNION ALL ")
      tokSql + s""",
        |tv AS (SELECT token, ${TextHash.tokenValue("token")} AS v FROM tok),
        |cells AS ($cellRows),
        |sketch AS (SELECT r, b, CAST(COUNT(*) AS BIGINT) AS cnt
        |           FROM cells GROUP BY 1, 2),
        |exact AS (SELECT token, v, CAST(COUNT(*) AS BIGINT) AS n_exact
        |          FROM tv GROUP BY 1, 2
        |          ORDER BY n_exact DESC, token LIMIT $CmsK),
        |pr AS ($probeRows)
        |SELECT pr.token, pr.n_exact, MIN(s.cnt) AS cms_est,
        |       MIN(s.cnt) - pr.n_exact AS overcount
        |FROM pr JOIN sketch s USING (r, b)
        |GROUP BY pr.token, pr.n_exact ORDER BY pr.token""".stripMargin
    },
    // the identical avalanche chain over the distinct vocabulary; the
    // k-th min is integer and the one estimator division is IEEE
    "vocab_kmv_audit" ->
      (tokSql + s""",
        |tv AS MATERIALIZED (SELECT DISTINCT token FROM tok),
        |hv AS (SELECT DISTINCT ${TextHash.avalancheSql(
          TextHash.tokenValue("token"), TextAnalysis.KmvSalt)} AS h FROM tv),
        |bot AS (SELECT h FROM hv ORDER BY h LIMIT $KmvK),
        |kk AS (SELECT CAST(COUNT(*) AS BIGINT) AS k_eff,
        |              CAST(MAX(h) AS BIGINT) AS kth_h FROM bot),
        |ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_exact FROM tv)
        |SELECT kk.k_eff, kk.kth_h,
        |  ${r6sql(s"CASE WHEN kk.k_eff < $KmvK THEN CAST(kk.k_eff AS DOUBLE)" +
            s" ELSE CAST(kk.k_eff - 1 AS DOUBLE) * ${TextHash.P31}" +
            " / CAST(kk.kth_h AS DOUBLE) END")} AS est_distinct,
        |  ex.n_exact
        |FROM kk CROSS JOIN ex""".stripMargin),
    // the same unrolled power iteration as graph_pagerank, over the
    // lead-window co-occurrence graph; identical per-round arithmetic,
    // rank snapped only in the outer SELECT
    "keywords_textrank" -> {
      val iters = (1 to TrIters).map { i =>
        s"""c$i AS (SELECT p.dst, SUM(p.prob * r.rank) AS c
           |      FROM p JOIN r${i - 1} r ON r.node = p.src GROUP BY 1),
           |r$i AS (SELECT nd.node,
           |        (1.0 - $TrDamping) / nn.n + $TrDamping * COALESCE(c$i.c, 0.0) AS rank
           |      FROM nd CROSS JOIN nn LEFT JOIN c$i ON c$i.dst = nd.node)""".stripMargin
      }.mkString(",\n")
      tokSql + s""",
        |kept AS MATERIALIZED (SELECT doc_id, pos, token FROM tok
        |  WHERE length(token) >= $TrMinLen
        |    AND token NOT IN ${inList(TextAnalysis.Stopwords)}),
        |adj AS (SELECT token AS src,
        |               lead(token, 1) OVER (PARTITION BY doc_id
        |                                    ORDER BY pos) AS dst
        |        FROM kept),
        |e0 AS (SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS w FROM adj
        |       WHERE dst IS NOT NULL AND dst <> src GROUP BY 1, 2),
        |e AS MATERIALIZED (
        |  SELECT src, dst, CAST(SUM(w) AS BIGINT) AS w FROM
        |    (SELECT src, dst, w FROM e0
        |     UNION ALL SELECT dst AS src, src AS dst, w FROM e0)
        |  GROUP BY 1, 2),
        |ow AS (SELECT src, CAST(SUM(w) AS BIGINT) AS wout FROM e GROUP BY 1),
        |p AS MATERIALIZED (
        |  SELECT e.src, e.dst, CAST(e.w AS DOUBLE) / CAST(ow.wout AS DOUBLE) AS prob
        |  FROM e JOIN ow USING (src)),
        |nd AS MATERIALIZED (SELECT DISTINCT src AS node FROM e),
        |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nd),
        |r0 AS MATERIALIZED (SELECT node, 1.0 / nn.n AS rank FROM nd CROSS JOIN nn),
        |$iters
        |SELECT node AS token, ${r6sql("rank")} AS rank FROM r$TrIters
        |ORDER BY token""".stripMargin
    },
    // the same sketch rebuilt over DISTINCT (doc, token) postings, then
    // the AMS inner product Σ cnt² per row and its min — integer all
    // the way, so the audit row is exact in both engines
    "pair_budget_sketch" -> {
      def mix(r: Int) = Export.mixBucketSql("v", CmsWidth, r)
      val cellRows = (0 until CmsDepth)
        .map(r => s"SELECT $r AS r, ${mix(r)} AS b FROM tv")
        .mkString("\n        UNION ALL ")
      tokSql + s""",
        |dt AS (SELECT DISTINCT doc_id, token FROM tok),
        |tv AS MATERIALIZED (SELECT ${TextHash.tokenValue("token")} AS v FROM dt),
        |cells AS ($cellRows),
        |sketch AS (SELECT r, b, CAST(COUNT(*) AS BIGINT) AS cnt
        |           FROM cells GROUP BY 1, 2),
        |est AS (SELECT MIN(s2) AS est_sq FROM
        |        (SELECT r, CAST(SUM(cnt * cnt) AS BIGINT) AS s2
        |         FROM sketch GROUP BY 1)),
        |f AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS f FROM tv GROUP BY 1),
        |ex AS (SELECT CAST(SUM(f) AS BIGINT) AS n_postings,
        |              CAST(SUM(f * f) AS BIGINT) AS exact_sq FROM f)
        |SELECT n_postings, exact_sq, est_sq,
        |  (exact_sq - n_postings) // 2 AS exact_pairs,
        |  (est_sq - n_postings) // 2 AS est_pairs,
        |  est_sq - exact_sq AS overcount
        |FROM ex CROSS JOIN est""".stripMargin
    },
    // same avalanche-hash bucket chain mod the fixed dim
    "feature_hash" ->
      (tokSql + s""",
        |fb AS (SELECT doc_id,
        |  CAST((${TextHash.avalancheSql(TextHash.tokenValue("token"),
          TextAnalysis.FeatureHashSalt)}) % ${TextAnalysis.FeatureHashDim} AS BIGINT) AS j
        |  FROM tok)
        |SELECT doc_id, j, CAST(COUNT(*) AS DOUBLE) AS tf
        |FROM fb GROUP BY 1, 2 ORDER BY doc_id, j""".stripMargin),
    // same n^tau arithmetic: per-source token totals, one scalar Z, the
    // weight/allocation/epoch columns all r6-rounded (pow's last-ulp
    // engine differences sit far below the grid)
    "corpus_temperature" ->
      (tokSql + s""",
        |sz AS (SELECT d.source AS grp, CAST(COUNT(*) AS BIGINT) AS n_tokens
        |       FROM tok JOIN documents d USING (doc_id) GROUP BY 1),
        |zt AS (SELECT SUM(pow(CAST(n_tokens AS DOUBLE), $MixTau)) AS z FROM sz)
        |SELECT grp AS source, n_tokens,
        |  ${r6sql(s"pow(CAST(n_tokens AS DOUBLE), $MixTau) / z")} AS weight,
        |  ${r6sql(s"$MixBudget.0 * pow(CAST(n_tokens AS DOUBLE), $MixTau) / z")} AS alloc_tokens,
        |  ${r6sql(s"$MixBudget.0 * pow(CAST(n_tokens AS DOUBLE), $MixTau) / z / CAST(n_tokens AS DOUBLE)")} AS epochs
        |FROM sz CROSS JOIN zt ORDER BY source""".stripMargin),
    // the same per-source totals; the water-fill replays as ONE window
    // pass over the sources-sized frame — cumulative cap/weight sums in
    // the shared (r, grp) total order, the saturation test against the
    // r6-snapped level (snap-before-the-cut on BOTH engines), then the
    // final level recomputed from the flagged set
    "corpus_epochs" ->
      (tokSql + s""",
        |sz AS (SELECT d.source AS grp, CAST(COUNT(*) AS BIGINT) AS n_tokens
        |       FROM tok JOIN documents d USING (doc_id) GROUP BY 1),
        |base AS (SELECT grp, n_tokens,
        |         pow(CAST(n_tokens AS DOUBLE), $EpochsTau) AS w,
        |         CAST(n_tokens AS DOUBLE) * $EpochsMax AS cap_tokens FROM sz),
        |wb AS (SELECT *, ${r6sql("cap_tokens / w")} AS r FROM base),
        |cum AS (SELECT *, SUM(cap_tokens) OVER (ORDER BY r, grp) AS cum_cap,
        |               SUM(w) OVER (ORDER BY r, grp) AS cum_w,
        |               SUM(w) OVER () AS w_total,
        |               SUM(cap_tokens) OVER () AS cap_total FROM wb),
        |fl AS MATERIALIZED (SELECT *, CASE WHEN w_total - cum_w > 0
        |       THEN r <= ${r6sql(s"($EpochsBudget.0 - cum_cap) / (w_total - cum_w)")}
        |       ELSE cap_total <= $EpochsBudget.0 END AS saturated FROM cum),
        |lv AS (SELECT $EpochsBudget.0 - SUM(CASE WHEN saturated THEN cap_tokens ELSE 0.0 END) AS b_rem,
        |              SUM(CASE WHEN saturated THEN 0.0 ELSE w END) AS w_rem FROM fl),
        |al AS (SELECT fl.*, CASE WHEN saturated THEN cap_tokens
        |         ELSE (CASE WHEN w_rem > 0 THEN b_rem / w_rem ELSE 0.0 END) * w
        |       END AS alloc FROM fl CROSS JOIN lv)
        |SELECT grp AS source, n_tokens,
        |  ${r6sql("w / w_total")} AS weight,
        |  ${r6sql("cap_tokens")} AS cap_tokens, saturated,
        |  ${r6sql("alloc")} AS alloc_tokens,
        |  ${r6sql("alloc / CAST(n_tokens AS DOUBLE)")} AS epochs
        |FROM al ORDER BY source""".stripMargin),
    // same shared tokenization; the membership test folds into the
    // aggregate, density r6-snapped before the cut on both engines
    "quality_blocklist" ->
      (tokSql + s""",
        |agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  CAST(SUM(CASE WHEN token IN (${BlockPatterns.map(p => s"'$p'").mkString(", ")})
        |       THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
        |  FROM tok GROUP BY 1)
        |SELECT doc_id, n_tokens, n_hits,
        |  ${r6sql("CAST(n_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE)")} AS density,
        |  (${r6sql("CAST(n_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE)")}
        |     > CAST($BlockMaxDensity AS DOUBLE)) AS blocked
        |FROM agg ORDER BY doc_id""".stripMargin),
    // the identical HLL chain: full 31-bit mix state, register = h2 % 64,
    // geometric evidence from the remaining 25 bits via the same integer
    // CASE chain, exact dyadic register sums, one ln at the very end
    "vocab_hll_audit" -> hllAuditSql("source"),
    // exact integer postings over the shared tokenization; tf referenced
    // twice (df + final) → MATERIALIZED per the DuckDB 1.0 inline rule
    "bm25_index" ->
      (tokSql + """,
        |idl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY 1),
        |itf AS MATERIALIZED (SELECT token AS term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
        |       FROM tok GROUP BY 1, 2),
        |idf AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM itf GROUP BY 1)
        |SELECT itf.term, itf.doc_id, itf.tf, idl.dl, idf.df
        |FROM itf JOIN idl USING (doc_id) JOIN idf USING (term)
        |ORDER BY term, doc_id""".stripMargin),
    // same rollup over the UNPARTITIONED table — the layouts must agree
    // row-for-row (partitioning moves bytes, never values)
    "docs_lang_pruned" ->
      s"""SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(MIN(doc_id) AS BIGINT) AS min_doc,
        |  CAST(MAX(doc_id) AS BIGINT) AS max_doc
        |FROM documents WHERE lang = '$PrunedLang'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // the identical interleave as a SUM over the bit positions — DuckDB
    // runs the same <<//>>/& integer ops, so agreement is bit-exact
    "layout_zvalue" ->
      """WITH b AS (SELECT p_partkey, p_size, p_partkey % 64 AS pk6 FROM part)
        |SELECT p_partkey,
        |  CAST(SUM((((p_size >> i) & 1) << (2 * i))
        |         + (((pk6 >> i) & 1) << (2 * i + 1))) AS BIGINT) AS z
        |FROM b, UNNEST(range(6)) AS r(i)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "bm25_search" -> {
      val tfCols = Bm25Terms.indices.map(i =>
        s"CAST(len(list_filter(t, x -> x = '${Bm25Terms(i)}')) AS BIGINT) AS tf_$i")
        .mkString(",\n             ")
      val dfCols = Bm25Terms.indices.map(i =>
        s"CAST(SUM(CASE WHEN tf_$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_$i")
        .mkString(",\n             ")
      // each term mirrors the Spark side's exact op order:
      //   ln(1 + (N - df + .5)/(df + .5)) * (tf*(k1+1)) / (tf + k1*(1 - b + b*dl/avgdl))
      val terms = Bm25Terms.indices.map { i =>
        s"ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df_$i AS DOUBLE) + 0.5) / " +
          s"(CAST(df_$i AS DOUBLE) + 0.5)) * (CAST(tf_$i AS DOUBLE) * ($Bm25K1 + 1.0)) / " +
          s"(CAST(tf_$i AS DOUBLE) + $Bm25K1 * (1.0 - $Bm25B + $Bm25B * dl / " +
          s"(CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))"
      }.mkString(" + ")
      s"""WITH d AS (SELECT doc_id,
        |            list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS t
        |            FROM documents),
        |p AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl,
        |             $tfCols
        |      FROM d WHERE len(t) > 0),
        |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl,
        |             $dfCols
        |      FROM p),
        |sc AS (SELECT doc_id, dl, $terms AS score FROM p CROSS JOIN s)
        |SELECT doc_id, dl, ${r6sql("score")} AS score
        |FROM (SELECT * FROM sc WHERE score > 0 ORDER BY score DESC, doc_id LIMIT $Bm25K) x
        |ORDER BY doc_id""".stripMargin
    },
    // the same LM arithmetic: per term ln((tf + μ·cf/|C|)/(dl + μ)) over
    // exact integers, the identical snapped-then-ranked cut
    "retrieval_qlm" -> {
      val tfCols = Bm25Terms.indices.map(i =>
        s"CAST(len(list_filter(t, x -> x = '${Bm25Terms(i)}')) AS BIGINT) AS tf_$i")
        .mkString(",\n             ")
      val cfCols = Bm25Terms.indices.map(i =>
        s"CAST(SUM(tf_$i) AS BIGINT) AS cf_$i").mkString(",\n             ")
      val terms = Bm25Terms.indices.map { i =>
        s"ln((CAST(tf_$i AS DOUBLE) + $QlmMu * (CAST(cf_$i AS DOUBLE) / " +
          s"CAST(c_total AS DOUBLE))) / (CAST(dl AS DOUBLE) + $QlmMu))"
      }.mkString(" + ")
      val matched = Bm25Terms.indices.map(i => s"tf_$i > 0").mkString(" OR ")
      s"""WITH d AS (SELECT doc_id,
        |            list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS t
        |            FROM documents),
        |p AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl,
        |             $tfCols
        |      FROM d WHERE len(t) > 0),
        |s AS (SELECT CAST(SUM(dl) AS BIGINT) AS c_total,
        |             $cfCols
        |      FROM p),
        |sc AS (SELECT doc_id, dl, ${r6sql(terms)} AS score
        |       FROM p CROSS JOIN s WHERE $matched)
        |SELECT doc_id, dl, score
        |FROM (SELECT * FROM sc ORDER BY score DESC, doc_id LIMIT $Bm25K) x
        |ORDER BY doc_id""".stripMargin
    },
    "quality_buckets" -> {
      val qvals = (1 until BucketK).map(i => s"(${i.toDouble / BucketK})").mkString(", ")
      s"""WITH ranked AS (SELECT lang AS grp, n_chars AS v,
        |                row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rn
        |                FROM documents),
        |cnt AS (SELECT grp, MAX(rn) AS n FROM ranked GROUP BY grp),
        |qs AS (SELECT * FROM (VALUES $qvals) q(q)),
        |tgt AS (SELECT grp, q, CAST(1 + floor(q * (n - 1)) AS BIGINT) AS rn
        |        FROM cnt CROSS JOIN qs),
        |th AS (SELECT t.grp, r.v AS t FROM tgt t JOIN ranked r USING (grp, rn))
        |SELECT d.doc_id, d.lang, d.n_chars,
        |       CAST((SELECT COUNT(*) FROM th
        |             WHERE th.grp = d.lang AND th.t < d.n_chars) AS BIGINT) AS bucket
        |FROM documents d ORDER BY doc_id""".stripMargin
    },
    // the same min-rank percentile from a (source, n_tokens) histogram
    // cumsum — ties share |{v' < v}| / (n − 1), single-doc sources map
    // to 0, token-less documents are absent (mirrors stats)
    "quality_quantile_norm" ->
      (tokSql + s""",
        |sig AS (SELECT t.doc_id, d.source, CAST(COUNT(*) AS BIGINT) AS n_tokens
        |        FROM tok t JOIN documents d ON d.doc_id = t.doc_id
        |        GROUP BY 1, 2),
        |h AS (SELECT source, n_tokens, COUNT(*) AS c FROM sig GROUP BY 1, 2),
        |cs AS (SELECT source, n_tokens,
        |              SUM(c) OVER (PARTITION BY source ORDER BY n_tokens) - c AS less,
        |              SUM(c) OVER (PARTITION BY source) AS n
        |       FROM h)
        |SELECT sig.doc_id, sig.source, sig.n_tokens,
        |       ${r6sql("CASE WHEN n > 1 THEN less / CAST(n - 1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END")} AS pctl
        |FROM sig JOIN cs USING (source, n_tokens) ORDER BY doc_id""".stripMargin),
    // the quantile-norm chain + the phase band + the same mix hash
    "corpus_curriculum" -> {
      val mix = Export.mixBucketSql("doc_id", Int.MaxValue, CurriculumSalt)
      tokSql + s""",
        |sig AS (SELECT t.doc_id, d.source, CAST(COUNT(*) AS BIGINT) AS n_tokens
        |        FROM tok t JOIN documents d ON d.doc_id = t.doc_id
        |        GROUP BY 1, 2),
        |h AS (SELECT source, n_tokens, COUNT(*) AS c FROM sig GROUP BY 1, 2),
        |cs AS (SELECT source, n_tokens,
        |              SUM(c) OVER (PARTITION BY source ORDER BY n_tokens) - c AS less,
        |              SUM(c) OVER (PARTITION BY source) AS n
        |       FROM h),
        |p AS (SELECT sig.doc_id, sig.source, sig.n_tokens,
        |             ${r6sql("CASE WHEN n > 1 THEN less / CAST(n - 1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END")} AS pctl
        |      FROM sig JOIN cs USING (source, n_tokens))
        |SELECT doc_id, source, n_tokens, pctl,
        |       CAST(LEAST(floor(pctl * $CurriculumPhases), ${CurriculumPhases - 1}) AS BIGINT) AS phase,
        |       CAST($mix AS BIGINT) AS order_key
        |FROM p ORDER BY doc_id""".stripMargin
    },
    "split_assign" -> {
      val mix = Export.mixBucketSql("doc_id", 1000, 0L)
      s"""SELECT doc_id, CAST($mix AS BIGINT) AS bucket,
        |       CASE WHEN $mix < 800 THEN 'train'
        |            WHEN $mix < 900 THEN 'val'
        |            ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin
    },
    "export_shards" -> {
      val mix = Export.mixBucketSql("doc_id", Int.MaxValue, 0L)
      s"""WITH h AS (SELECT doc_id, $mix AS h FROM documents),
        |a AS (SELECT doc_id, h % $ExportShards AS shard, h FROM h)
        |SELECT doc_id, CAST(shard AS BIGINT) AS shard,
        |       CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) - 1 AS BIGINT) AS pos
        |FROM a ORDER BY doc_id""".stripMargin
    },
    // shard hash + rolling-hash fingerprints, folded to one row per
    // shard; token-less docs contribute checksum 0 via the LEFT JOIN
    "export_manifest" -> {
      val mix = Export.mixBucketSql("doc_id", Int.MaxValue, 0L)
      tokSql + s""",
        |terms AS (SELECT doc_id, ${TextHash.fingerprintTerm("pos", "token")} AS term FROM tok),
        |fp AS (SELECT doc_id, CAST(SUM(term) % ${TextHash.M} AS BIGINT) AS fingerprint
        |       FROM terms GROUP BY doc_id),
        |a AS (SELECT doc_id, ($mix) % $ExportShards AS shard, length(text) AS nc
        |      FROM documents)
        |SELECT CAST(a.shard AS BIGINT) AS shard,
        |       CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(a.nc) AS BIGINT) AS n_chars,
        |       CAST(SUM(COALESCE(fp.fingerprint, 0)) AS BIGINT) AS checksum
        |FROM a LEFT JOIN fp USING (doc_id)
        |GROUP BY a.shard ORDER BY shard""".stripMargin
    },
    // freq/total/lp mirror unigramLogProb's exact op order; ln-ulp and
    // sum-order noise sit far below the r6 rounding grid
    "quality_unigram" ->
      (tokSql + s""",
        |f AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY token),
        |tt AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM f),
        |lp AS (SELECT token, ln(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE)) AS lp
        |       FROM f CROSS JOIN tt)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |       ${r6sql("AVG(lp)")} AS avg_logprob,
        |       ${r6sql("MIN(lp)")} AS min_logprob
        |FROM tok JOIN lp USING (token)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    // bigram adjacency: lead() over pos order AFTER the empty-token
    // filter matches the Spark side's filtered-array adjacency exactly
    "quality_bigram" ->
      (tokSql + s""",
        |t2 AS (SELECT doc_id, token AS w1,
        |              lead(token) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        |       FROM tok),
        |bg AS (SELECT doc_id, w1, w2 FROM t2 WHERE w2 IS NOT NULL),
        |bc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cb FROM bg GROUP BY 1, 2),
        |pc AS (SELECT w1, CAST(SUM(cb) AS BIGINT) AS cp FROM bc GROUP BY 1),
        |lp AS (SELECT w1, w2, ln(CAST(cb AS DOUBLE) / CAST(cp AS DOUBLE)) AS lp
        |       FROM bc JOIN pc USING (w1))
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |       ${r6sql("AVG(lp)")} AS avg_logprob,
        |       ${r6sql("MIN(lp)")} AS min_logprob
        |FROM bg JOIN lp USING (w1, w2)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    // held-out LM: the split CASE, the +1-before-cast unigram, and the
    // λ·ratio + (1−λ)·pu interpolation mirror heldoutPerplexity's op
    // order token-for-token; ln/exp ulp and AVG sum-order noise sit far
    // below the r6 grid
    "quality_lm_heldout" -> {
      val mix = Export.mixBucketSql("doc_id", 1000, 0L)
      val pu = "(CAST(COALESCE(cu, 0) + 1 AS DOUBLE) / CAST(tt + vv + 1 AS DOUBLE))"
      tokSql + s""",
        |sp AS (SELECT doc_id, CASE WHEN $mix < $LmTrainPermille THEN 1 ELSE 0 END AS is_train
        |       FROM documents),
        |ad AS (SELECT tok.doc_id, is_train, token AS w1,
        |              lead(token) OVER (PARTITION BY tok.doc_id ORDER BY pos) AS w2
        |       FROM tok JOIN sp ON sp.doc_id = tok.doc_id),
        |tbg AS (SELECT w1, w2 FROM ad WHERE is_train = 1 AND w2 IS NOT NULL),
        |hbg AS (SELECT doc_id, w1, w2 FROM ad WHERE is_train = 0 AND w2 IS NOT NULL),
        |cu AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cu
        |       FROM tok JOIN sp ON sp.doc_id = tok.doc_id WHERE is_train = 1 GROUP BY token),
        |tot AS (SELECT CAST(SUM(cu) AS BIGINT) AS tt, CAST(COUNT(*) AS BIGINT) AS vv FROM cu),
        |cb AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cb FROM tbg GROUP BY 1, 2),
        |cp AS (SELECT w1, CAST(SUM(cb) AS BIGINT) AS cp FROM cb GROUP BY 1),
        |sc AS (SELECT hbg.doc_id,
        |              CASE WHEN u.cu IS NULL THEN 1 ELSE 0 END AS oov,
        |              ln(CASE WHEN cp.cp IS NULL THEN $pu
        |                 ELSE 0.75 * (CAST(COALESCE(cb.cb, 0) AS DOUBLE) / CAST(cp.cp AS DOUBLE))
        |                      + 0.25 * $pu END) AS lp
        |       FROM hbg
        |       LEFT JOIN cb ON cb.w1 = hbg.w1 AND cb.w2 = hbg.w2
        |       LEFT JOIN cp ON cp.w1 = hbg.w1
        |       LEFT JOIN cu u ON u.token = hbg.w2
        |       CROSS JOIN tot)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |       CAST(SUM(oov) AS BIGINT) AS n_oov,
        |       ${r6sql("AVG(lp)")} AS avg_logprob,
        |       ${r6sql("exp(-AVG(lp))")} AS perplexity
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },
    // cross-corpus twin: identical model/score chain with the split CASE
    // replaced by the source test (reference = every source but src0)
    "quality_lm_cross" -> {
      val pu = "(CAST(COALESCE(cu, 0) + 1 AS DOUBLE) / CAST(tt + vv + 1 AS DOUBLE))"
      tokSql + s""",
        |sp AS (SELECT doc_id, CASE WHEN source <> '$LmTargetSource' THEN 1 ELSE 0 END AS is_train
        |       FROM documents),
        |ad AS (SELECT tok.doc_id, is_train, token AS w1,
        |              lead(token) OVER (PARTITION BY tok.doc_id ORDER BY pos) AS w2
        |       FROM tok JOIN sp ON sp.doc_id = tok.doc_id),
        |tbg AS (SELECT w1, w2 FROM ad WHERE is_train = 1 AND w2 IS NOT NULL),
        |hbg AS (SELECT doc_id, w1, w2 FROM ad WHERE is_train = 0 AND w2 IS NOT NULL),
        |cu AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cu
        |       FROM tok JOIN sp ON sp.doc_id = tok.doc_id WHERE is_train = 1 GROUP BY token),
        |tot AS (SELECT CAST(SUM(cu) AS BIGINT) AS tt, CAST(COUNT(*) AS BIGINT) AS vv FROM cu),
        |cb AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cb FROM tbg GROUP BY 1, 2),
        |cp AS (SELECT w1, CAST(SUM(cb) AS BIGINT) AS cp FROM cb GROUP BY 1),
        |sc AS (SELECT hbg.doc_id,
        |              CASE WHEN u.cu IS NULL THEN 1 ELSE 0 END AS oov,
        |              ln(CASE WHEN cp.cp IS NULL THEN $pu
        |                 ELSE 0.75 * (CAST(COALESCE(cb.cb, 0) AS DOUBLE) / CAST(cp.cp AS DOUBLE))
        |                      + 0.25 * $pu END) AS lp
        |       FROM hbg
        |       LEFT JOIN cb ON cb.w1 = hbg.w1 AND cb.w2 = hbg.w2
        |       LEFT JOIN cp ON cp.w1 = hbg.w1
        |       LEFT JOIN cu u ON u.token = hbg.w2
        |       CROSS JOIN tot)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |       CAST(SUM(oov) AS BIGINT) AS n_oov,
        |       ${r6sql("AVG(lp)")} AS avg_logprob,
        |       ${r6sql("exp(-AVG(lp))")} AS perplexity
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },
    // digit-count bucketing is exact integer/string arithmetic — no
    // float log10 anywhere, so the decades cannot misbucket
    "vocab_zipf" ->
      (tokSql + """,
        |f AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY token)
        |SELECT CAST(length(CAST(cnt AS VARCHAR)) AS BIGINT) AS n_digits,
        |       CAST(COUNT(*) AS BIGINT) AS n_types,
        |       CAST(SUM(cnt) AS BIGINT) AS n_occurrences,
        |       CAST(MAX(cnt) AS BIGINT) AS max_freq
        |FROM f GROUP BY 1 ORDER BY n_digits""".stripMargin),
    "corpus_budget" -> {
      val mix = Export.mixBucketSql("doc_id", Int.MaxValue, 0L)
      s"""WITH d AS (SELECT doc_id, source AS grp,
        |            CAST(len(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS BIGINT) AS nt
        |            FROM documents),
        |h AS (SELECT doc_id, grp, nt, $mix AS h FROM d WHERE nt > 0),
        |c AS (SELECT doc_id, grp, nt,
        |             SUM(nt) OVER (PARTITION BY grp ORDER BY h, doc_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |      FROM h)
        |SELECT doc_id, grp, nt, CAST(cum AS BIGINT) AS cum
        |FROM c WHERE cum <= $BudgetTokens ORDER BY doc_id""".stripMargin
    },
    "quality_repetition" ->
      s"""WITH wf AS (SELECT doc_id,
        |              list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS w
        |            FROM documents),
        |big AS (SELECT doc_id, w[i+1] || ' ' || w[i+2] AS bigram
        |        FROM wf, UNNEST(range(len(w) - 1)) AS r(i)
        |        WHERE len(w) >= 2),
        |bc AS (SELECT doc_id, bigram, COUNT(*) AS cnt FROM big GROUP BY 1, 2)
        |SELECT doc_id,
        |       CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
        |       CAST(COUNT(*) AS BIGINT) AS n_distinct_bigrams,
        |       CAST(MAX(cnt) AS BIGINT) AS top_bigram_count,
        |       ${r6sql("CAST(MAX(cnt) AS DOUBLE) / SUM(cnt)")} AS top_bigram_frac,
        |       ${r6sql("CAST(SUM(cnt) - COUNT(*) AS DOUBLE) / SUM(cnt)")} AS dup_bigram_frac
        |FROM bc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "corpus_stats" ->
      s"""WITH b AS (SELECT lang, source,
        |             list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks,
        |             CAST(length(text) AS BIGINT) AS nc
        |           FROM documents),
        |tot AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |               CAST(SUM(len(toks)) AS BIGINT) AS n_tokens,
        |               AVG(nc) AS avg_chars
        |        FROM b GROUP BY 1, 2),
        |ty AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_types
        |       FROM (SELECT DISTINCT lang, source, tok
        |             FROM b, UNNEST(toks) AS u(tok)) GROUP BY 1, 2)
        |SELECT tot.lang, tot.source, n_docs, n_tokens,
        |       COALESCE(n_types, 0) AS n_types, ${r6sql("avg_chars")} AS avg_chars
        |FROM tot LEFT JOIN ty USING (lang, source)
        |ORDER BY lang, source""".stripMargin,
    // same explicit-sums formula as the Spark side (n·Σxy − Σx·Σy over
    // sqrt of the variance product) — identical IEEE op sequence; the
    // 1e-6 snap absorbs partial-aggregation ulps in the sums
    "quality_corr" -> {
      val corrSigs = Seq("n_tokens", "avg_token_len", "stopword_ratio", "ttr")
      val corrPairs = for {
        i <- corrSigs.indices; j <- (i + 1) until corrSigs.size
      } yield (corrSigs(i), corrSigs(j))
      def pairRow(x: String, y: String) = {
        val cov = s"(n * sp_${x}__$y - s_$x * s_$y)"
        val vx = s"(n * ss_$x - s_$x * s_$x)"
        val vy = s"(n * ss_$y - s_$y * s_$y)"
        s"""SELECT '$x' AS sig_x, '$y' AS sig_y,
          |       CASE WHEN $vx > 0.0 AND $vy > 0.0
          |            THEN ${r6sql(s"$cov / sqrt($vx * $vy)")} END AS r
          |FROM agg""".stripMargin
      }
      tokSql + s""",
        |st AS (SELECT doc_id,
        |       CAST(COUNT(*) AS DOUBLE) AS n_tokens,
        |       CAST(SUM(length(token)) AS DOUBLE) / COUNT(*) AS avg_token_len,
        |       CAST(SUM(CASE WHEN token IN ${inList(TextAnalysis.Stopwords)} THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS stopword_ratio,
        |       CAST(COUNT(DISTINCT token) AS DOUBLE) / COUNT(*) AS ttr
        |       FROM tok GROUP BY doc_id),
        |agg AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
        |${corrSigs.map(s => s"        SUM($s) AS s_$s, SUM($s * $s) AS ss_$s").mkString(",\n")},
        |${corrPairs.map { case (x, y) => s"        SUM($x * $y) AS sp_${x}__$y" }.mkString(",\n")}
        |        FROM st)
        |SELECT sig_x, sig_y, r FROM (
        |${corrPairs.map { case (x, y) => pairRow(x, y) }.mkString("\nUNION ALL\n")}
        |) WHERE r IS NOT NULL ORDER BY sig_x, sig_y""".stripMargin
    },
    // same formula as the Spark side: present-support JS terms plus the
    // absent-token tail folded into 0.5*ln(2)*(1 - covered q mass)
    "corpus_divergence" ->
      s"""WITH t AS (SELECT source AS grp, tok AS token
        |           FROM documents, UNNEST(string_split_regex(text, '\\s+')) AS u(tok)
        |           WHERE tok <> ''),
        |sl AS (SELECT grp, token, CAST(COUNT(*) AS BIGINT) AS c FROM t GROUP BY 1, 2),
        |st AS (SELECT grp, CAST(SUM(c) AS BIGINT) AS tg FROM sl GROUP BY 1),
        |g AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cg FROM t GROUP BY 1),
        |gt AS (SELECT CAST(SUM(cg) AS BIGINT) AS tt FROM g),
        |pq AS (SELECT grp, CAST(c AS DOUBLE) / tg AS p, CAST(cg AS DOUBLE) / tt AS q
        |       FROM sl JOIN st USING (grp) JOIN g USING (token) CROSS JOIN gt)
        |SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_types,
        |       ${r6sql("SUM(0.5*p*ln(2.0*p/(p+q)) + 0.5*q*ln(2.0*q/(p+q)))" +
          " + 0.5*ln(2.0)*(1.0 - SUM(q))")} AS js
        |FROM pq GROUP BY grp ORDER BY grp""".stripMargin,
    "vocab_topk_by_lang" ->
      s"""WITH t AS (SELECT lang AS grp, doc_id,
        |             string_split_regex(text, '\\s+') AS toks FROM documents),
        |dt AS (SELECT DISTINCT grp, doc_id, tok AS token
        |       FROM t, UNNEST(toks) AS u(tok) WHERE tok <> ''),
        |df AS (SELECT grp, token, CAST(COUNT(*) AS BIGINT) AS doc_freq
        |       FROM dt GROUP BY 1, 2),
        |rk AS (SELECT grp, token, doc_freq,
        |              row_number() OVER (PARTITION BY grp
        |                                 ORDER BY doc_freq DESC, token) AS rn
        |       FROM df)
        |SELECT grp, CAST(rn AS BIGINT) AS rank, token, doc_freq
        |FROM rk WHERE rn <= $VocabLangK ORDER BY grp, rank""".stripMargin,
    // independent derivation: the oracle classifies by direct text
    // equality where the Spark side compares sha256 content hashes
    "corpus_diff" ->
      """WITH oldd AS (SELECT doc_id, text FROM documents),
        |newd AS (SELECT doc_id,
        |                CASE WHEN doc_id % 5 = 0 THEN text || ' rev2'
        |                     ELSE text END AS text
        |         FROM documents WHERE doc_id % 7 <> 0
        |         UNION ALL
        |         SELECT doc_id + 100000 AS doc_id, text FROM documents
        |         WHERE doc_id % 11 = 0)
        |SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
        |       CASE WHEN o.doc_id IS NULL THEN 'added'
        |            WHEN n.doc_id IS NULL THEN 'removed'
        |            WHEN o.text = n.text THEN 'unchanged'
        |            ELSE 'changed' END AS status
        |FROM oldd o FULL OUTER JOIN newd n ON o.doc_id = n.doc_id
        |ORDER BY doc_id""".stripMargin,
    // independent winner derivation: version-desc row_number window vs
    // the Spark side's max_by arg-max aggregate
    "corpus_upsert" ->
      """WITH c AS (
        |  SELECT doc_id, 1 AS version, 'U' AS op, text FROM documents
        |  UNION ALL
        |  SELECT doc_id, 2 AS version,
        |         CASE WHEN doc_id % 7 = 0 THEN 'D' ELSE 'U' END AS op,
        |         text || ' v2' AS text
        |  FROM documents WHERE doc_id % 5 = 0 OR doc_id % 7 = 0),
        |w AS (SELECT doc_id, version, op, text,
        |        row_number() OVER (PARTITION BY doc_id
        |                           ORDER BY version DESC) AS rn
        |      FROM c)
        |SELECT doc_id, CAST(version AS BIGINT) AS version,
        |       CAST(length(text) AS BIGINT) AS n_chars
        |FROM w WHERE rn = 1 AND op <> 'D' ORDER BY doc_id""".stripMargin,
    // same planted segments, same trim/df/cap rule; reassembly via
    // ORDER BY pos string_agg mirrors the Spark side's array_sort
    "boilerplate_scrub" ->
      s"""WITH src AS (SELECT doc_id,
        |  'u' || doc_id || ' unique head | footer f' || (doc_id % 3) ||
        |  ' subscribe now | promo p' || (doc_id % 50) || ' sale | ' ||
        |  substr(text, 1, 40) AS btext FROM documents),
        |sp AS (SELECT doc_id, string_split(btext, '|') AS parts FROM src),
        |segs AS (SELECT doc_id, CAST(i AS BIGINT) AS pos, trim(parts[i+1]) AS seg
        |         FROM sp, UNNEST(range(len(parts))) AS r(i)
        |         WHERE trim(parts[i+1]) <> ''),
        |b AS (SELECT seg FROM segs GROUP BY seg
        |      HAVING COUNT(DISTINCT doc_id) > $BoilerMaxDf),
        |fl AS (SELECT s.doc_id, s.pos, s.seg, (b.seg IS NOT NULL) AS drp
        |       FROM segs s LEFT JOIN b ON b.seg = s.seg),
        |agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_segments,
        |               CAST(SUM(CASE WHEN drp THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
        |               coalesce(string_agg(CASE WHEN NOT drp THEN seg END, ' | '
        |                                   ORDER BY pos), '') AS clean_text
        |        FROM fl GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(a.n_segments, 0) AS n_segments,
        |       coalesce(a.n_dropped, 0) AS n_dropped,
        |       coalesce(a.clean_text, '') AS clean_text
        |FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    // plain explode/group spelling of the same H = ln(n) − Σc·ln c / n;
    // the cross-engine sum-order difference is ~1e-13, far inside r6
    "quality_entropy" ->
      (tokSql + s""",
        |tc AS (SELECT doc_id, token, CAST(COUNT(*) AS DOUBLE) AS c
        |       FROM tok GROUP BY 1, 2)
        |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |       CAST(COUNT(*) AS BIGINT) AS n_distinct,
        |       ${r6sql("ln(SUM(c)) - SUM(c * ln(c)) / SUM(c)")} AS entropy,
        |       ${r6sql("CASE WHEN COUNT(*) > 1 THEN " +
               "(ln(SUM(c)) - SUM(c * ln(c)) / SUM(c)) / ln(CAST(COUNT(*) AS DOUBLE)) " +
               "ELSE 0.0 END")} AS entropy_norm
        |FROM tc GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    // bigram-table-marginal PMI; the top-k set is selected on the SAME
    // snapped score both engines compute, then re-sorted to the gate key
    "vocab_pmi" ->
      s"""WITH t AS (SELECT list_filter(string_split_regex(text, '\\s+'),
        |                               x -> x <> '') AS w FROM documents),
        |bg AS (SELECT w[i+1] AS t1, w[i+2] AS t2
        |       FROM t, UNNEST(range(len(w) - 1)) AS r(i) WHERE len(w) >= 2),
        |c AS (SELECT t1, t2, CAST(COUNT(*) AS BIGINT) AS c12 FROM bg GROUP BY 1, 2),
        |l AS (SELECT t1, CAST(SUM(c12) AS BIGINT) AS c1 FROM c GROUP BY 1),
        |r AS (SELECT t2, CAST(SUM(c12) AS BIGINT) AS c2 FROM c GROUP BY 1),
        |n AS (SELECT CAST(SUM(c12) AS BIGINT) AS n_total FROM c)
        |SELECT t1, t2, c12, c1, c2, pmi FROM (
        |  SELECT c.t1 AS t1, c.t2 AS t2, c.c12, l.c1, r.c2,
        |    floor(ln(CAST(c.c12 AS DOUBLE) * CAST(n.n_total AS DOUBLE) /
        |      (CAST(l.c1 AS DOUBLE) * CAST(r.c2 AS DOUBLE))) * 1e6 + 0.50001) / 1e6 AS pmi
        |  FROM c JOIN l USING (t1) JOIN r ON r.t2 = c.t2 CROSS JOIN n
        |  WHERE c.c12 >= $PmiMinCount
        |  ORDER BY pmi DESC, c.t1, c.t2 LIMIT $PmiK
        |) ORDER BY t1, t2""".stripMargin,
    // same exact counts, same (total/clusters)/f_t division order, same
    // ln — weight snapped to 1e-6 BEFORE the per-cluster rank
    "cluster_terms" ->
      s"""WITH t AS (SELECT source AS cluster,
        |            string_split_regex(text, '\\s+') AS toks FROM documents),
        |tok AS (SELECT cluster, toks[i+1] AS token
        |        FROM t, UNNEST(range(len(toks))) AS r(i)
        |        WHERE toks[i+1] <> ''),
        |tf AS (SELECT cluster, token, CAST(COUNT(*) AS BIGINT) AS tf
        |       FROM tok GROUP BY 1, 2),
        |ft AS (SELECT token, CAST(SUM(tf) AS BIGINT) AS f_t FROM tf GROUP BY 1),
        |sc AS (SELECT CAST(SUM(tf) AS DOUBLE) AS total_tokens,
        |              CAST(COUNT(DISTINCT cluster) AS DOUBLE) AS n_clusters
        |       FROM tf),
        |w AS (SELECT tf.cluster, tf.token, tf.tf, ft.f_t,
        |        floor(CAST(tf.tf AS DOUBLE) *
        |          ln(1.0 + sc.total_tokens / sc.n_clusters / CAST(ft.f_t AS DOUBLE)) *
        |          1e6 + 0.50001) / 1e6 AS score
        |      FROM tf JOIN ft USING (token) CROSS JOIN sc),
        |rk AS (SELECT cluster, token, tf, f_t, score,
        |         row_number() OVER (PARTITION BY cluster
        |           ORDER BY score DESC, token ASC) AS rn
        |       FROM w)
        |SELECT cluster, CAST(rn AS BIGINT) AS rank, token, tf, f_t, score
        |FROM rk WHERE rn <= $ClusterTermsK ORDER BY cluster, rank""".stripMargin,
    // the same 5 GD steps replayed: identical left-associative z, the
    // same sigmoid/mean spellings, weights threaded through CTE columns
    "quality_lr" -> qualityLrSql("weights"),
    // the same chain, read out per document: the soft score under the
    // full-precision fitted weights (snapped only at emission)
    "quality_lr_scores" -> qualityLrSql("scores"),
    // the same replayed fit + scores, folded to the Mann–Whitney AUC
    "quality_lr_auc" -> qualityLrSql("auc"),
    "quality_lr_roc" -> qualityLrSql("roc"),
    "quality_lr_calibration" -> qualityLrSql("calibration"),
    // the same observed-cells-only contingency algebra: exact marginals,
    // identical per-cell IEEE term order, the same 0-clamp before sqrt
    "corpus_chi2" -> {
      val chi = "greatest(0.0, sum_chi - CAST(n AS DOUBLE))"
      s"""WITH o AS (SELECT lang AS a, source AS b, CAST(COUNT(*) AS BIGINT) AS o
        |           FROM documents GROUP BY 1, 2),
        |ra AS (SELECT a, CAST(SUM(o) AS BIGINT) AS ra FROM o GROUP BY 1),
        |cb AS (SELECT b, CAST(SUM(o) AS BIGINT) AS cb FROM o GROUP BY 1),
        |t AS (SELECT CAST(COALESCE(SUM(o), 0) AS BIGINT) AS n,
        |             CAST(COUNT(DISTINCT a) AS BIGINT) AS n_a,
        |             CAST(COUNT(DISTINCT b) AS BIGINT) AS n_b FROM o),
        |cells AS (SELECT o.o, ra.ra, cb.cb, t.n, t.n_a, t.n_b
        |          FROM o JOIN ra USING (a) JOIN cb USING (b) CROSS JOIN t),
        |f AS (SELECT n, n_a, n_b,
        |       SUM(CAST(o AS DOUBLE) * CAST(o AS DOUBLE) * CAST(n AS DOUBLE)
        |           / CAST(ra * cb AS DOUBLE)) AS sum_chi,
        |       SUM((CAST(o AS DOUBLE) / CAST(n AS DOUBLE))
        |           * ln(CAST(o AS DOUBLE) * CAST(n AS DOUBLE) / CAST(ra * cb AS DOUBLE))) AS mi_raw
        |      FROM cells GROUP BY 1, 2, 3)
        |SELECT n, n_a, n_b, CAST((n_a - 1) * (n_b - 1) AS BIGINT) AS dof,
        |  ${r6sql(s"CASE WHEN LEAST(n_a, n_b) > 1 THEN $chi ELSE 0.0 END")} AS chi2,
        |  ${r6sql(s"CASE WHEN LEAST(n_a, n_b) > 1 AND n > 0 THEN " +
           s"sqrt(($chi) / (CAST(n AS DOUBLE) * CAST(LEAST(n_a, n_b) - 1 AS DOUBLE))) " +
           "ELSE 0.0 END")} AS cramers_v,
        |  ${r6sql("CASE WHEN LEAST(n_a, n_b) > 1 THEN mi_raw ELSE 0.0 END")} AS mi
        |FROM f""".stripMargin
    },
    // the same observed-bin histogram, the same Laplace-smoothed
    // exact-rational probabilities, the identical per-bin term order
    "quality_psi" -> {
      val p = "(CAST(c1 AS DOUBLE) + 0.5) / " +
        "(CAST(n1 AS DOUBLE) + CAST(nb AS DOUBLE) * 0.5)"
      val q = "(CAST(c0 AS DOUBLE) + 0.5) / " +
        "(CAST(n0 AS DOUBLE) + CAST(nb AS DOUBLE) * 0.5)"
      s"""WITH b AS (SELECT CASE WHEN lang = '$KsLang' THEN 1 ELSE 0 END AS y,
        |            CAST(n_chars AS BIGINT) // $PsiBinWidth AS b FROM documents),
        |h AS (SELECT b, SUM(y) AS c1, SUM(1 - y) AS c0 FROM b GROUP BY 1),
        |t AS (SELECT CAST(COALESCE(SUM(c1), 0) AS BIGINT) AS n1,
        |             CAST(COALESCE(SUM(c0), 0) AS BIGINT) AS n0,
        |             CAST(COUNT(*) AS BIGINT) AS nb FROM h),
        |f AS (SELECT n1, n0, nb,
        |        SUM((($p) - ($q)) * ln(($p) / ($q))) AS psi_raw
        |      FROM h CROSS JOIN t GROUP BY 1, 2, 3)
        |SELECT n1, n0, nb AS n_bins,
        |  ${r6sql("CASE WHEN n1 > 0 AND n0 > 0 THEN psi_raw ELSE 0.0 END")} AS psi
        |FROM f""".stripMargin
    },
    // the same int64 CDF-gap max (exact numerator, division at the end),
    // the same min-v arg-cut among tied maxima, one exp under the snap
    "quality_ks" -> {
      val dEx = "CASE WHEN n1 > 0 AND n0 > 0 THEN " +
        "CAST(d_num AS DOUBLE) / CAST(n1 * n0 AS DOUBLE) ELSE 0.0 END"
      val neEx = "CAST(n1 * n0 AS DOUBLE) / CAST(n1 + n0 AS DOUBLE)"
      s"""WITH b AS (SELECT CASE WHEN lang = '$KsLang' THEN 1 ELSE 0 END AS y,
        |            CAST(n_chars AS BIGINT) AS v FROM documents),
        |h AS (SELECT v, SUM(y) AS c1, SUM(1 - y) AS c0 FROM b GROUP BY v),
        |c AS (SELECT v, SUM(c1) OVER (ORDER BY v) AS cum1,
        |             SUM(c0) OVER (ORDER BY v) AS cum0 FROM h),
        |t AS (SELECT CAST(COALESCE(SUM(c1), 0) AS BIGINT) AS n1,
        |             CAST(COALESCE(SUM(c0), 0) AS BIGINT) AS n0 FROM h),
        |gp AS MATERIALIZED (SELECT t.n1, t.n0, c.v,
        |             abs(c.cum1 * t.n0 - c.cum0 * t.n1) AS gap
        |      FROM c CROSS JOIN t),
        |mx AS (SELECT CAST(MAX(gap) AS BIGINT) AS d_num FROM gp)
        |SELECT n1, n0, d_num,
        |  (SELECT CAST(MIN(v) AS BIGINT) FROM gp WHERE gp.gap = mx.d_num) AS d_at,
        |  ${r6sql(dEx)} AS d,
        |  ${r6sql(s"CASE WHEN n1 > 0 AND n0 > 0 THEN least(1.0, " +
           s"2.0 * exp(-2.0 * ($dEx) * ($dEx) * $neEx)) ELSE 1.0 END")} AS p_value
        |FROM (SELECT DISTINCT n1, n0 FROM gp) CROSS JOIN mx""".stripMargin
    },

    // the same greedy rounds replayed in SQL: pair counts weighted by
    // word frequency, argmax on (count DESC, pair ASC), and the greedy
    // left-to-right rewrite spelled as its window-parity equivalent —
    // within a run of consecutive overlapping matches, exactly the
    // 1st/3rd/5th… merge (what the Spark side's left fold does)
    "vocab_bpe" ->
      (bpeChainSql(rewriteLast = false) + s"""
        |${(1 to BpeRounds).map(j =>
             s"""SELECT CAST($j AS BIGINT) AS round, a AS sym_a, b AS sym_b,
                |cnt AS pair_count, a || b AS merged FROM m$j""".stripMargin)
             .mkString("\nUNION ALL ")}
        |ORDER BY round""".stripMargin),
    // the chain INCLUDING the final rewrite, folded to the one-row
    // encoding readout — exact counts, two single divisions
    "vocab_bpe_encode" ->
      (bpeChainSql(rewriteLast = true) + s""",
        |ws AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_types,
        |              CAST(SUM(n) AS BIGINT) AS n_tokens,
        |              CAST(SUM(n * length(word)) AS BIGINT) AS total_chars
        |       FROM w),
        |ss AS (SELECT CAST(COUNT(DISTINCT sym) AS BIGINT) AS vocab_size,
        |              CAST(SUM(n) AS BIGINT) AS total_syms
        |       FROM s$BpeRounds)
        |SELECT n_types, n_tokens, vocab_size, total_syms, total_chars,
        |  ${r6sql("CAST(total_syms AS DOUBLE) / CAST(n_tokens AS DOUBLE)")} AS syms_per_token,
        |  ${r6sql("CAST(total_chars AS DOUBLE) / CAST(total_syms AS DOUBLE)")} AS chars_per_sym
        |FROM ws CROSS JOIN ss""".stripMargin),
    // same symbol table; the per-lang word counts come from the SAME tok
    // CTE the word-type table w is built from
    "vocab_fertility" ->
      (bpeChainSql(rewriteLast = true) + s""",
        |ns AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS n_syms
        |       FROM s$BpeRounds GROUP BY 1),
        |lw AS (SELECT d.lang, tok.token AS word, CAST(COUNT(*) AS BIGINT) AS c
        |       FROM tok JOIN documents d USING (doc_id) GROUP BY 1, 2)
        |SELECT lang,
        |  CAST(SUM(c) AS BIGINT) AS n_tokens,
        |  CAST(COUNT(*) AS BIGINT) AS n_types,
        |  CAST(SUM(c * n_syms) AS BIGINT) AS n_syms_total,
        |  CAST(SUM(c * length(word)) AS BIGINT) AS n_chars,
        |  ${r6sql("CAST(SUM(c * n_syms) AS BIGINT) / CAST(SUM(c) AS DOUBLE)")} AS fertility,
        |  ${r6sql("CAST(SUM(c * length(word)) AS BIGINT) / CAST(SUM(c * n_syms) AS DOUBLE)")} AS chars_per_sym
        |FROM lw JOIN ns USING (word)
        |GROUP BY 1 ORDER BY lang""".stripMargin),
    // both hard-EM rounds replayed: recursive-CTE Viterbi DP per round,
    // recursive backtrace, piece-count M-step — the final model ranked
    // by (cnt DESC, piece), top UniTopK
    "vocab_unigram_lm" ->
      (unigramChainSql + s"""
        |SELECT CAST(row_number() OVER (ORDER BY cnt DESC, piece ASC) AS BIGINT) AS rank,
        |       piece, cnt, logp
        |FROM v${TextAnalysis.UniIters} ORDER BY rank LIMIT $UniTopK""".stripMargin),
    // the final segmentation folded to the one-row fertility readout
    // (vocab_bpe_encode's columns, so the two tokenizers compare 1:1)
    "vocab_unigram_encode" ->
      (unigramChainSql + s""",
        |uws AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_types,
        |               CAST(SUM(n) AS BIGINT) AS n_tokens,
        |               CAST(SUM(n * len(pieces)) AS BIGINT) AS total_pieces,
        |               CAST(SUM(n * length(word)) AS BIGINT) AS total_chars
        |        FROM sg${TextAnalysis.UniIters}),
        |uvs AS (SELECT CAST(COUNT(*) AS BIGINT) AS vocab_size
        |        FROM v${TextAnalysis.UniIters})
        |SELECT n_types, n_tokens, vocab_size, total_pieces, total_chars,
        |  ${r6sql("CAST(total_pieces AS DOUBLE) / CAST(n_tokens AS DOUBLE)")} AS pieces_per_token,
        |  ${r6sql("CAST(total_chars AS DOUBLE) / CAST(total_pieces AS DOUBLE)")} AS chars_per_piece
        |FROM uws CROSS JOIN uvs""".stripMargin),
    // the coverage twin: the same chain with the floor M-step over the
    // planted fixture (documents UNION the multi-script doc)
    "vocab_unigram_coverage" ->
      (unigramChain(true,
        s"(SELECT doc_id, text FROM documents UNION ALL " +
        s"SELECT 900001 AS doc_id, '$CoveragePlant' AS text) cd") + s"""
        |SELECT CAST(row_number() OVER (ORDER BY cnt DESC, piece ASC) AS BIGINT) AS rank,
        |       piece, cnt, logp
        |FROM v${TextAnalysis.UniIters} ORDER BY rank LIMIT $UniTopK""".stripMargin),
    // same histogram → cumulative-crossing boundaries → count-of-
    // boundaries-at-or-below shard rule; duplicate boundaries collapse
    // on both sides (DISTINCT here, .distinct in the Scala fit)
    "export_range_shards" -> {
      val qvals = (1 until RangeShardK).map(i => s"(${i.toDouble / RangeShardK})")
        .mkString(", ")
      s"""WITH b AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS key FROM documents),
        |hist AS (SELECT key // $HistWidth AS bucket, CAST(COUNT(*) AS BIGINT) AS c
        |         FROM b GROUP BY 1),
        |cum AS (SELECT bucket, SUM(c) OVER (ORDER BY bucket) AS cum FROM hist),
        |cnt AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM hist),
        |qs AS (SELECT * FROM (VALUES $qvals) q(q)),
        |tgt AS (SELECT q, CAST(1 + floor(q * (n - 1)) AS BIGINT) AS rn
        |        FROM cnt CROSS JOIN qs),
        |bd AS (SELECT DISTINCT bv FROM (
        |         SELECT t.q, CAST(MIN(c.bucket) * $HistWidth AS BIGINT) AS bv
        |         FROM tgt t JOIN cum c ON c.cum >= t.rn GROUP BY t.q)),
        |sh AS (SELECT doc_id, key,
        |              (SELECT CAST(COUNT(*) AS BIGINT) FROM bd
        |               WHERE bv <= b.key) AS shard
        |       FROM b)
        |SELECT doc_id, key, shard,
        |       CAST(row_number() OVER (PARTITION BY shard
        |                               ORDER BY key, doc_id) - 1 AS BIGINT) AS pos
        |FROM sh ORDER BY doc_id""".stripMargin
    },
    // same type-1 rank thresholds, same integer clamp
    "quality_winsorize" ->
      s"""WITH b AS (SELECT doc_id, lang AS grp, CAST(n_chars AS BIGINT) AS v
        |           FROM documents),
        |r1 AS (SELECT grp, v, row_number() OVER (PARTITION BY grp ORDER BY v) AS rn
        |       FROM b),
        |c1 AS (SELECT grp, MAX(rn) AS n FROM r1 GROUP BY grp),
        |tlo AS (SELECT grp, CAST(1 + floor($WinsLo * (n - 1)) AS BIGINT) AS rn FROM c1),
        |thi AS (SELECT grp, CAST(1 + floor($WinsHi * (n - 1)) AS BIGINT) AS rn FROM c1),
        |lo AS (SELECT t.grp, CAST(r.v AS BIGINT) AS lo
        |       FROM tlo t JOIN r1 r ON r.grp = t.grp AND r.rn = t.rn),
        |hi AS (SELECT t.grp, CAST(r.v AS BIGINT) AS hi
        |       FROM thi t JOIN r1 r ON r.grp = t.grp AND r.rn = t.rn)
        |SELECT b.doc_id, b.grp AS lang, b.v AS n_chars, lo.lo, hi.hi,
        |       greatest(lo.lo, least(hi.hi, b.v)) AS v_clipped,
        |       CAST(CASE WHEN b.v < lo.lo OR b.v > hi.hi THEN 1 ELSE 0 END AS BIGINT) AS clipped
        |FROM b JOIN lo USING (grp) JOIN hi USING (grp)
        |ORDER BY doc_id""".stripMargin,
    // same hashed buckets, same add-1 smoothing, ln on identical exact
    // rationals; the per-doc sum snaps at 1e-6
    "corpus_dsir" ->
      s"""$dsirChainSql
        |SELECT d.doc_id, d.is_target, CAST(SUM(tf) AS BIGINT) AS n_tokens,
        |       ${r6sql("SUM(tf * lw)")} AS log_weight
        |FROM dstf d JOIN dslw USING (j)
        |GROUP BY 1, 2 ORDER BY doc_id""".stripMargin,
    // the selection step: rank the SNAPPED weights (identical on both
    // engines by the r6 argument), doc_id tie-break, keep top m
    "corpus_dsir_sample" ->
      s"""$dsirChainSql,
        |w AS (SELECT d.doc_id, ${r6sql("SUM(tf * lw)")} AS log_weight
        |      FROM dstf d JOIN dslw USING (j)
        |      WHERE d.is_target = 0 GROUP BY 1),
        |rk AS (SELECT doc_id, log_weight,
        |              CAST(row_number() OVER (ORDER BY log_weight DESC, doc_id) AS BIGINT) AS rank
        |       FROM w)
        |SELECT doc_id, log_weight, rank FROM rk
        |WHERE rank <= $DsirSampleM ORDER BY rank""".stripMargin,
    // same ROLLUP lattice, same int64 counts; only the share divides
    "pii_kanon" ->
      s"""WITH base AS (SELECT lang AS qi1, source AS qi2,
        |                      CAST(n_chars AS BIGINT) // $KanonWidth AS qi3
        |               FROM documents),
        |cells AS (SELECT qi1, qi2, qi3, CAST(COUNT(*) AS BIGINT) AS n,
        |                 CAST(GROUPING(qi1) + GROUPING(qi2) + GROUPING(qi3) AS BIGINT) AS level
        |          FROM base GROUP BY ROLLUP (qi1, qi2, qi3))
        |SELECT level,
        |       CAST(COUNT(*) AS BIGINT) AS n_groups,
        |       CAST(SUM(CASE WHEN n < $KanonK THEN 1 ELSE 0 END) AS BIGINT) AS risky_groups,
        |       CAST(SUM(CASE WHEN n < $KanonK THEN n ELSE 0 END) AS BIGINT) AS rows_at_risk,
        |       CAST(MIN(n) AS BIGINT) AS min_group,
        |       ${r6sql(s"SUM(CASE WHEN n < $KanonK THEN n ELSE 0 END) / CAST(SUM(n) AS DOUBLE)")} AS risk_share
        |FROM cells WHERE level < 3
        |GROUP BY 1 ORDER BY level""".stripMargin,
    // same three class counts, same monotone level pick, same sentinels
    "pii_kanon_scrub" ->
      s"""WITH base AS (SELECT doc_id, lang AS qi1, source AS qi2,
        |                      CAST(n_chars AS BIGINT) // $KanonWidth AS qi3
        |               FROM documents),
        |c0 AS (SELECT qi1, qi2, qi3, CAST(COUNT(*) AS BIGINT) AS n0
        |       FROM base GROUP BY 1, 2, 3),
        |c1 AS (SELECT qi1, qi2, CAST(COUNT(*) AS BIGINT) AS n1
        |       FROM base GROUP BY 1, 2),
        |c2 AS (SELECT qi1, CAST(COUNT(*) AS BIGINT) AS n2
        |       FROM base GROUP BY 1),
        |lv AS (SELECT b.doc_id, b.qi1, b.qi2, b.qi3,
        |              CAST(CASE WHEN n0 >= $KanonK THEN 0
        |                        WHEN n1 >= $KanonK THEN 1
        |                        WHEN n2 >= $KanonK THEN 2
        |                        ELSE 3 END AS BIGINT) AS level
        |       FROM base b
        |       JOIN c0 USING (qi1, qi2, qi3)
        |       JOIN c1 USING (qi1, qi2)
        |       JOIN c2 USING (qi1))
        |SELECT doc_id, level,
        |       CASE WHEN level <= 2 THEN qi1 ELSE '*' END AS rel_lang,
        |       CASE WHEN level <= 1 THEN qi2 ELSE '*' END AS rel_source,
        |       CASE WHEN level = 0 THEN qi3 ELSE -1 END AS rel_bucket
        |FROM lv ORDER BY doc_id""".stripMargin
  )

  /** The GD-distillation oracle: the shared weight-threading chain with
    * either the weight/loss readout (`scores = false`) or the per-doc
    * soft-score readout under the full-precision fitted weights. */
  private def qualityLrSql(mode: String): String = {
      val z = "(x0*w.w0 + x1*w.w1 + x2*w.w2 + x3*w.w3 + x4*w.w4)"
      val p = s"(1.0 / (1.0 + exp(-$z)))"
      val iters = (1 to LrIters).map { t =>
        val grads = (0 until 5).map(i =>
          s"AVG(($p - y) * x$i) AS g$i").mkString(",\n        |       ")
        val upds = (0 until 5).map(i =>
          s"w.w$i - $LrRate * g.g$i AS w$i").mkString(", ")
        s"""g$t AS (SELECT $grads
           |       FROM f CROSS JOIN w${t - 1} w),
           |w$t AS (SELECT $upds FROM w${t - 1} w CROSS JOIN g$t g)""".stripMargin
      }.mkString(",\n")
      val outs = graft.ext.QualityModel.Features.zipWithIndex.map { case (nm, i) =>
        s"SELECT '$nm' AS feature, ${r6sql(s"w$i")} AS weight FROM w$LrIters"
      }.mkString("\nUNION ALL ")
      tokSql + s""",
        |qs AS MATERIALIZED (SELECT doc_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |       CAST(SUM(length(token)) AS DOUBLE) / COUNT(*) AS avg_token_len,
        |       CAST(SUM(CASE WHEN token IN ${inList(graft.ext.TextAnalysis.Stopwords)} THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS stopword_ratio,
        |       CAST(COUNT(DISTINCT token) AS DOUBLE) / COUNT(*) AS ttr
        |       FROM tok GROUP BY doc_id),
        |f AS MATERIALIZED (SELECT doc_id,
        |       CASE WHEN n_tokens >= $QfMinTokens AND n_tokens <= $QfMaxTokens
        |             AND avg_token_len >= $QfMinAvgLen AND avg_token_len <= $QfMaxAvgLen
        |             AND stopword_ratio <= $QfMaxStop AND ttr >= $QfMinTtr
        |            THEN 1.0 ELSE 0.0 END AS y,
        |       1.0 AS x0,
        |       ln(1.0 + CAST(n_tokens AS DOUBLE)) / 12.0 AS x1,
        |       avg_token_len / 12.0 AS x2, stopword_ratio AS x3, ttr AS x4
        |       FROM qs),
        |w0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3, 0.0 AS w4),
        |$iters,
        |pz AS (SELECT y, $p AS p FROM f CROSS JOIN w$LrIters w),
        |ls AS (SELECT AVG(-(y * ln(p) + (1.0 - y) * ln(1.0 - p))) AS loss FROM pz)
        |${
          mode match {
            case "scores" =>
              s"""SELECT doc_id, CAST(y AS DOUBLE) AS gate_pass, ${r6sql("p")} AS p_quality
                 |FROM (SELECT doc_id, y, $p AS p FROM f CROSS JOIN w$LrIters w)
                 |ORDER BY doc_id""".stripMargin
            case "auc" =>
              // snapped-score histogram → running neg count below each
              // group → exact int64 2U; the Spark side's identical
              // Mann–Whitney spelling (QualityModel.auc)
              s""", sc AS (SELECT y, ${r6sql("p")} AS s
                 |       FROM (SELECT y, $p AS p FROM f CROSS JOIN w$LrIters w)),
                 |gg AS (SELECT s,
                 |        CAST(SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS np,
                 |        CAST(SUM(CASE WHEN y = 1.0 THEN 0 ELSE 1 END) AS BIGINT) AS nn
                 |       FROM sc GROUP BY s),
                 |cc AS (SELECT s, np, nn,
                 |        CAST(COALESCE(SUM(nn) OVER (ORDER BY s
                 |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 |          AS BIGINT) AS cumnn
                 |       FROM gg)
                 |SELECT CAST(SUM(np) AS BIGINT) AS n_pos,
                 |  CAST(SUM(nn) AS BIGINT) AS n_neg,
                 |  CAST(SUM(np * (2 * cumnn + nn)) AS BIGINT) AS u2,
                 |  ${r6sql("CASE WHEN SUM(np) = 0 OR SUM(nn) = 0 THEN 0.5" +
                    " ELSE CAST(SUM(np * (2 * cumnn + nn)) AS DOUBLE)" +
                    " / (2.0 * SUM(np) * SUM(nn)) END")} AS auc
                 |FROM cc""".stripMargin
            case "calibration" =>
              // snapped scores → equal-width bins → per-bin count, mean
              // predicted p, empirical rate (QualityModel.calibration);
              // empty bins keep their zero row
              s""", sc AS (SELECT y, ${r6sql("p")} AS s
                 |       FROM (SELECT y, $p AS p FROM f CROSS JOIN w$LrIters w)),
                 |ag AS (SELECT LEAST(CAST(${CalibBins - 1} AS BIGINT),
                 |               CAST(floor(s * $CalibBins.0) AS BIGINT)) AS bin,
                 |        CAST(COUNT(*) AS BIGINT) AS n,
                 |        SUM(s) AS sum_s,
                 |        CAST(SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
                 |       FROM sc GROUP BY 1),
                 |bn AS (SELECT CAST(i AS BIGINT) AS bin
                 |       FROM (SELECT UNNEST(range($CalibBins)) AS i))
                 |SELECT bn.bin, CAST(COALESCE(ag.n, 0) AS BIGINT) AS n,
                 |  CAST(COALESCE(ag.n_pos, 0) AS BIGINT) AS n_pos,
                 |  ${r6sql("CASE WHEN COALESCE(ag.n, 0) > 0 THEN ag.sum_s / CAST(ag.n AS DOUBLE) ELSE 0.0 END")} AS mean_score,
                 |  ${r6sql("CASE WHEN COALESCE(ag.n, 0) > 0 THEN CAST(ag.n_pos AS DOUBLE) / CAST(ag.n AS DOUBLE) ELSE 0.0 END")} AS frac_pos,
                 |  ${r6sql("(CASE WHEN COALESCE(ag.n, 0) > 0 THEN CAST(ag.n_pos AS DOUBLE) / CAST(ag.n AS DOUBLE) ELSE 0.0 END) - (CASE WHEN COALESCE(ag.n, 0) > 0 THEN ag.sum_s / CAST(ag.n AS DOUBLE) ELSE 0.0 END)")} AS gap
                 |FROM bn LEFT JOIN ag USING (bin) ORDER BY bin""".stripMargin
            case "roc" =>
              // snapped-score histogram fanned out over the threshold
              // grid: exact int64 confusion counts per cut, complement
              // counts from the one total row (QualityModel.confusionSweep)
              val tvals = RocThresholds.map(t => s"($t)").mkString(", ")
              s""", sc AS (SELECT y, ${r6sql("p")} AS s
                 |       FROM (SELECT y, $p AS p FROM f CROSS JOIN w$LrIters w)),
                 |gg AS MATERIALIZED (SELECT s,
                 |        CAST(SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS np,
                 |        CAST(SUM(CASE WHEN y = 1.0 THEN 0 ELSE 1 END) AS BIGINT) AS nn
                 |       FROM sc GROUP BY s),
                 |tt AS (SELECT COALESCE(SUM(np), 0) AS n_pos,
                 |              COALESCE(SUM(nn), 0) AS n_neg FROM gg),
                 |th AS (SELECT CAST(t AS DOUBLE) AS t FROM (VALUES $tvals) v(t)),
                 |sw AS (SELECT th.t,
                 |        CAST(COALESCE(SUM(CASE WHEN gg.s >= th.t THEN gg.np END), 0) AS BIGINT) AS tp,
                 |        CAST(COALESCE(SUM(CASE WHEN gg.s >= th.t THEN gg.nn END), 0) AS BIGINT) AS fp
                 |       FROM th LEFT JOIN gg ON true GROUP BY th.t)
                 |SELECT t, tp, fp,
                 |  CAST(n_pos - tp AS BIGINT) AS fn,
                 |  CAST(n_neg - fp AS BIGINT) AS tn,
                 |  ${r6sql("CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) ELSE 0.0 END")} AS prec,
                 |  ${r6sql("CASE WHEN n_pos > 0 THEN CAST(tp AS DOUBLE) / CAST(n_pos AS DOUBLE) ELSE 0.0 END")} AS recall,
                 |  ${r6sql("CASE WHEN tp > 0 THEN 2.0 * (CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE)) * (CAST(tp AS DOUBLE) / CAST(n_pos AS DOUBLE)) / ((CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE)) + (CAST(tp AS DOUBLE) / CAST(n_pos AS DOUBLE))) ELSE 0.0 END")} AS f1
                 |FROM sw CROSS JOIN tt ORDER BY t""".stripMargin
            case _ =>
              s"""$outs
                 |UNION ALL SELECT 'z_log_loss', ${r6sql("loss")} FROM ls
                 |ORDER BY feature""".stripMargin
          }
        }""".stripMargin
  }
}
