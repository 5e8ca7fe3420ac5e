package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.Multimodal
import graft.text.TextAnalysis

/** Text-analysis + multimodal queries (q97–q100) + DuckDB oracles. */
object TextQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // BM25 retrieval (full DuckDB oracle — micro-grid exact): three
    // 4-term probe queries cut from the corpus' own frequency bands
    // (ranks 11-14 / 21-24 / 31-34), scored over the whole corpus,
    // top-10 per query. Corpus-linear scan, query-bounded shuffle:
    // tokens filter to the query vocabulary BEFORE the explode, df
    // and corpus stats ride broadcasts, top-k is a rank-limited
    // window (WindowGroupLimit).
    "q156_bm25" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      graft.text.Retrieval.bm25TopK(docs, "doc_id", "text",
        graft.text.Retrieval.frequencyProbeQueries(docs, "text"), topK = 10)
    }),

    // CCNet-faithful per-language percentile buckets (full DuckDB
    // oracle): the q129 scoring fixture (model from even ids, score
    // odd ids) re-bucketed the way Wenzek et al. 2020 actually did it
    // — thirds of each LANGUAGE's avg-NLL distribution via one
    // percent_rank window per language. The exact/audit path;
    // production freezes bounds once (calibrateBuckets) and buckets
    // with a narrow comparison.
    "q165_ccnet_buckets" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val model = TextAnalysis.unigramLm(docs.filter(col("doc_id") % 2 === 0), "text")
      val scored = TextAnalysis.lmScore(
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", model)
        .select(col("id").as("doc_id"), col("n_tokens"),
          col("sum_nll_micro"), col("avg_nll_micro"))
      TextAnalysis.bucketByPercentile(
        scored.join(docs.select(col("doc_id"), col("lang")), "doc_id"),
        "avg_nll_micro", Seq("lang"))
    }),

    // Mergeable quantile census under the FULL hash gate (the q169/
    // q186 daily-crawl pattern for CCNet bucket calibration): the
    // q129 scoring fixture, with two-thirds of the scored docs playing
    // the signed history (their census materialized once as the
    // store) and the rest the incoming batch; the merged census,
    // its running cumulative, and the frozen-bounds head/middle/tail
    // labels must land digit-for-digit where a census of the UNION
    // lands — merge == build-of-union as an artifact fact, on the
    // micro-nat grid so every column is exact integers or single IEEE
    // ops on them.
    "q199_quantile_census" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val model = TextAnalysis.unigramLm(docs.filter(col("doc_id") % 2 === 0), "text")
      val scored = TextAnalysis.lmScore(
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", model)
      val store = TextAnalysis.quantileCensus(scored.filter(col("id") % 3 =!= 0))
        .localCheckpoint(true) // the signed history census, materialized once
      val merged = TextAnalysis.mergeQuantileCensus(
        store, TextAnalysis.quantileCensus(scored.filter(col("id") % 3 === 0)))
      TextAnalysis.censusLabeled(merged)
    }),

    // Impact-ordered capped inverted index (full DuckDB oracle):
    // champion lists over the corpus — per term df/cf and the top-5
    // postings by (tf desc, doc asc), long-format so the artifact is
    // a joinable table. One (term, doc) groupBy; df/cf/rank share one
    // term partitioning (WindowGroupLimit caps the posting heap).
    "q166_inverted_index" -> ((s, d) =>
      graft.text.Retrieval.invertedIndex(
        Tables.documents(s, d), "doc_id", "text", maxPostings = 5)),

    // BM25 served entirely from the MERGED postings store (full hash
    // gate — q156's oracle VERBATIM): the retrieval freshness story.
    // History docs exist only as their postings store; today's batch
    // folds in via mergePostingsStore; probe queries AND ranking both
    // derive from the store with zero document-text reads — and must
    // land digit-for-digit where q156's full text scan lands.
    "q188_bm25_store" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val store = graft.text.Retrieval.postingsStore(
        docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text")
        .localCheckpoint(true)
      val merged = graft.text.Retrieval.mergePostingsStore(
        store, docs.filter(col("doc_id") % 10 === 0), "doc_id", "text")
        .localCheckpoint(true) // feeds probe derivation, dl, tf
      graft.text.Retrieval.bm25TopKFromPostings(
        merged, graft.text.Retrieval.frequencyProbeQueriesFromPostings(merged),
        topK = 10)
    }),

    // Mergeable inverted-index store under the FULL hash gate (the
    // q169 daily-crawl pattern for retrieval): every 10th doc plays
    // the incoming batch, the rest the signed corpus — only its
    // (term, doc, tf) POSTINGS STORE exists (materialized once, the
    // q123 fixture discipline; no history text is re-scanned). The
    // merged store derives champion lists identical to a full rebuild,
    // so the oracle is q166's SQL over all documents VERBATIM —
    // merge == build-of-union as an artifact fact.
    "q186_index_incremental" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val store = graft.text.Retrieval.postingsStore(
        docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text")
        .localCheckpoint(true)
      graft.text.Retrieval.indexFromPostings(
        graft.text.Retrieval.mergePostingsStore(
          store, docs.filter(col("doc_id") % 10 === 0), "doc_id", "text"),
        maxPostings = 5)
    }),

    // Pairwise corpus-overlap estimation (full DuckDB oracle): KMV
    // sketches over content hashes — how much do two sources share
    // without joining them. A planted "mix" source (every 3rd doc's
    // text) overlaps each real source; the 10 natural sources share
    // nothing. All hash/integer arithmetic → the estimate replays
    // bit-for-bit, unlike an HLL's.
    "q168_corpus_overlap" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val frame = docs.select(col("source"), col("text"))
        .unionByName(docs.filter(col("doc_id") % 3 === 0)
          .select(lit("mix").as("source"), col("text")))
      TextAnalysis.corpusOverlap(frame, "source", "text", k = 64)
    }),

    "q97_lang_id" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"), col("lang"),
        TextAnalysis.languageId(col("text")).as("pred_lang"))),

    "q98_text_quality" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), TextAnalysis.qualityMetrics(col("text")).as("_m"))
        .select(col("doc_id"), col("_m.*"))),

    "q99_fingerprint" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fp"),
        TextAnalysis.normalizedFingerprint(col("text")).as("norm_fp"))),

    "q100_multimodal" -> ((s, d) => {
      val chunked = Multimodal.chunk(
        Multimodal.withBinaryPayload(Tables.documents(s, d), "text"), 64)
      chunked.groupBy("doc_id").agg(
        first(col("meta.n_bytes")).as("n_bytes"),
        first(col("meta.content_hash")).as("content_hash"),
        count(lit(1)).as("n_chunks"),
        count(when(col("chunk_idx") % 4 === 0, 1)).as("n_sampled"))
    }),

    // End-to-end HTML extraction gate: wrap each document in noisy HTML
    // (title, style subtree, comment), run the full binary → extract
    // pipeline, and hash-compare against a first-principles oracle —
    // valid because the corpus text contains no <>& and is already
    // whitespace-normalized (checked; the EXTRACTOR still has to strip
    // the style/comment/tag noise correctly to match).
    "q101_doc_extract" -> ((s, d) => {
      val html = concat(
        lit("<html><head><title>Doc "), col("doc_id"),
        lit("</title><style>p { color: red; }</style></head>\n<body><p>"),
        col("text"), lit("</p><!-- generated --></body></html>"))
      val binary = Tables.documents(s, d).select(
        col("doc_id"),
        concat(lit("mem/doc"), col("doc_id"), lit(".html")).as("path"),
        encode(html, "UTF-8").cast("binary").as("payload"))
      graft.multimodal.DocumentExtract.extractDocuments(binary, "path", "payload")
        .select(col("doc_id"), col("doc_format"), col("title"), col("text"), col("line_count"))
    }),

    // Repetition metrics (Gopher filter family): the corpus text is
    // single-line, so the query manufactures line/paragraph structure
    // deterministically — sentence breaks become newlines and the text
    // is doubled with a blank-line separator (⇒ every paragraph is a
    // duplicate: dup_para_frac = 0.5 exactly; line/bigram fractions
    // vary per document). Oracle replays the same construction.
    "q117_repetition" -> ((s, d) => {
      val multi = concat(
        regexp_replace(col("text"), "\\. ", ".\n"), lit("\n\n"),
        regexp_replace(col("text"), "\\. ", ".\n"))
      // Two deliberate projection boundaries: the doubled text is
      // materialized once (the metrics tree references its input ~10
      // times — lines/paras/token splits), then the metrics struct is
      // projected ONCE and `passes` + the flattened fields derive from
      // the projected attribute. Both aliases are expensive and
      // multiply-referenced, so CollapseProject keeps the boundaries
      // and each tree evaluates once per row (previously
      // passesRepetitionFilter on the raw text + _m.* expansion
      // inlined ~6 copies of an O(n²) bigram build → 212 s).
      Tables.documents(s, d)
        .select(col("doc_id"), multi.as("_mt"))
        .select(col("doc_id"), col("_mt"), TextAnalysis.tokens(col("_mt")).as("_tk"))
        .select(col("doc_id"),
          TextAnalysis.repetitionMetrics(col("_mt"), col("_tk")).as("_m"))
        .select(col("doc_id"), col("_m"), TextAnalysis.repetitionPasses(col("_m")).as("passes"))
        .select(col("doc_id"), col("_m.*"), col("passes"))
    }),

    // C4 line-level filter family (Raffel et al. 2020): the corpus is
    // punctuation-free word soup, so sentence/line structure is
    // manufactured deterministically — a period+newline after every 8
    // words (the remainder words form a terminal-punctuation-less last
    // line that rule 1 drops), plus planted trigger lines per doc-id
    // residue exercising the javascript, brace, and lorem-ipsum rules.
    // Oracle replays the identical construction. Same struct-projection
    // discipline as q117: _c is its own boundary, fields read the
    // attribute.
    "q118_c4_filter" -> ((s, d) => {
      val sent = regexp_replace(col("text"), "((\\S+\\s+){7}\\S+)\\s+", "$1.\n")
      val withJs = when(col("doc_id") % 7 === 0,
        concat(sent, lit("\njavascript is required to view this page."))).otherwise(sent)
      val withBrace = when(col("doc_id") % 11 === 0,
        concat(withJs, lit("\nsee the { config } block for details."))).otherwise(withJs)
      val mt = when(col("doc_id") % 13 === 0,
        concat(withBrace, lit("\nlorem ipsum dolor sit amet filler text."))).otherwise(withBrace)
      Tables.documents(s, d)
        .select(col("doc_id"), mt.as("_mt"))
        .select(col("doc_id"), TextAnalysis.c4Metrics(col("_mt")).as("_c"))
        .select(col("doc_id"), col("_c.*"))
    }),

    // Reference-corpus coverage scoring: even doc_ids train the char
    // 3-gram model, odd doc_ids are scored against it. minCount = 64
    // (the model's median count) keeps only well-attested trigrams,
    // so coverage genuinely varies per doc (~0.87-0.96 at sf0.01)
    // instead of saturating on the shared vocabulary — and both
    // ratios are single exact-integer IEEE divisions, replayed
    // bit-identically by the oracle.
    "q122_coverage" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val model = TextAnalysis.charNgramModel(
        docs.filter(col("doc_id") % 2 === 0), "text", n = 3)
      TextAnalysis.coverageScore(
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", model,
        n = 3, minCount = 64L)
        .select(col("id").as("doc_id"), col("n_grams"), col("n_known"),
          col("coverage"), col("avg_ref_cnt"))
    }),

    // End-to-end PDF extraction gate: build a real two-page PDF per
    // document (catalog → page tree → per-page content streams, parens/
    // backslashes escaped per the literal-string grammar), run the full
    // binary → Pdf parser, and hash-compare the round trip. Streams are
    // uncompressed here (deflate is not a column expression); the
    // FlateDecode path is proven against Deflater-built fixtures in
    // PdfSpec. The parser still has to walk Kids order, slice streams
    // by /Length, unescape, and apply the Td newline rule to match.
    "q103_pdf_extract" -> ((s, d) => {
      val esc = regexp_replace(col("text"), "([\\\\()])", "\\\\$1")
      val c1 = concat(
        lit("BT /F1 12 Tf 72 720 Td (Doc "), col("doc_id"),
        lit(") Tj 0 -14 Td ("), esc, lit(") Tj ET"))
      val c2 = concat(lit("BT /F1 12 Tf 72 720 Td (End of doc "), col("doc_id"), lit(") Tj ET"))
      val pdf = concat(
        lit("%PDF-1.4\n1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
          "2 0 obj\n<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>\nendobj\n" +
          "3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n" +
          "4 0 obj\n<< /Length "), call_function("octet_length", c1), lit(" >>\nstream\n"), c1,
        lit("\nendstream\nendobj\n" +
          "5 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>\nendobj\n" +
          "6 0 obj\n<< /Length "), call_function("octet_length", c2), lit(" >>\nstream\n"), c2,
        lit("\nendstream\nendobj\ntrailer\n<< /Root 1 0 R >>\n%%EOF\n"))
      val binary = Tables.documents(s, d).select(
        concat(lit("mem/doc"), col("doc_id"), lit(".pdf")).as("path"),
        encode(pdf, "UTF-8").cast("binary").as("content"))
      graft.multimodal.Pdf.fromBinary(binary)
        .select(
          regexp_extract(col("path"), "doc(\\d+)\\.pdf", 1).cast("long").as("doc_id"),
          col("doc_format"), col("n_pages"), col("text"))
    }),

    // Unigram-LM perplexity filtering (the CCNet/KenLM shape): even
    // doc_ids train the model, odd doc_ids are scored held-out. All
    // log arithmetic runs on the micro-nat integer grid (see
    // TextAnalysis.qlog — probed bit-identical JVM vs DuckDB), so
    // every oracle column is exact integers or a single IEEE division
    // of them; buckets compare that division to fixed literals. The
    // float `ppl` column is API-only, projected out here.
    "q129_lm_perplexity" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val model = TextAnalysis.unigramLm(docs.filter(col("doc_id") % 2 === 0), "text")
      TextAnalysis.lmScore(docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", model,
          bucketBounds = (3.401e6, 3.404e6))
        .select(col("id").as("doc_id"), col("n_tokens"), col("n_oov"), col("oov_frac"),
          col("sum_nll_micro"), col("avg_nll_micro"), col("ppl_bucket"))
    }),

    // DSIR importance resampling (Xie et al. 2023): target LM = the
    // English slice, raw LM = the whole corpus; weight = log-ratio in
    // exact micro-nats; keep the top 25% by (weight, doc_id) — the
    // deterministic core of the paper's selection step.
    "q130_dsir_select" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val target = TextAnalysis.unigramLm(docs.filter(col("lang") === "en"), "text")
      val raw = TextAnalysis.unigramLm(docs, "text")
      val scored = TextAnalysis.dsirWeights(docs, "doc_id", "text", target, raw)
      TextAnalysis.dsirSelect(scored, 0.25)
        .select(col("id").as("doc_id"), col("n_tokens"), col("weight_micro"))
    }),

    // Per-document top-3 tf·idf keywords, integer-exact scores, one
    // row per (doc, rank) — deterministic (score desc, token asc).
    "q131_tfidf_keywords" -> ((s, d) =>
      TextAnalysis.tfidfKeywords(Tables.documents(s, d), "doc_id", "text", k = 3)
        .select(col("id").as("doc_id"), col("rank"), col("token"), col("tf"),
          col("idf_micro"), col("score"))),

    // Interpolated bigram perplexity (KenLM-style backoff step past
    // q129): λ=½ between bigram MLE and add-one unigram, expressed as
    // one integer fraction per token so the NLL stays on the exact
    // micro-nat grid (products ≤ ~1e15, probed range). Same held-out
    // split as q129; `ppl` is API-only.
    "q133_bigram_perplexity" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val train = docs.filter(col("doc_id") % 2 === 0)
      TextAnalysis.lmScoreBigram(
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text",
        TextAnalysis.bigramLm(train, "text"),
        TextAnalysis.unigramLm(train, "text"))
        .select(col("id").as("doc_id"), col("n_tokens"), col("n_ctx_hits"),
          col("sum_nll_micro"), col("avg_nll_micro"))
    }),

    // Per-source corpus report: docs/tokens/chars/vocabulary/TTR —
    // the exact (Expand-free two-leg) path under the oracle gate.
    "q132_corpus_stats" -> ((s, d) =>
      TextAnalysis.corpusStats(Tables.documents(s, d), "source", "text")
        .select(col("group").as("source"), col("n_docs"), col("total_tokens"),
          col("total_chars"), col("vocab"), col("avg_doc_tokens"),
          col("type_token_ratio"))),

    // Deflate-compression ratio (rows-only ⊘ — zlib is not DuckDB-
    // replayable): the information-theoretic repetition/entropy
    // signal via the native codegen'd DeflateRatio expression. A
    // narrow shuffle-free projection; CompressSpec pins the semantic
    // contract (repetition compresses, prose doesn't) and codegen.
    "q154_compress_ratio" -> ((s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        graft.functions.DeflateRatio.deflateRatio(col("text")).as("deflate_ratio"))),

    // The 100 TB production twin: HLL++ vocabulary, one shuffle fewer
    // (rows-only in the artifacts, like the q40a family).
    "q132a_corpus_stats_approx" -> ((s, d) =>
      TextAnalysis.corpusStats(Tables.documents(s, d), "source", "text", exact = false)
        .select(col("group").as("source"), col("n_docs"), col("total_tokens"),
          col("total_chars"), col("vocab"), col("avg_doc_tokens"),
          col("type_token_ratio"))),

    // Learned quality filter (FineWeb-Edu shape) — rows-only ⊘: the
    // L-BFGS fit is not replayable in SQL, so correctness is TextSpec's
    // AUC gate on planted labels + the no-shuffle golden scoring plan.
    // The fixture manufactures a separable labeling deterministically:
    // every third doc gets keep-vocabulary appended, the rest get
    // junk-vocabulary — the classifier must LEARN the split from
    // hashed token counts (train on even ids, score all, so scored
    // rows include docs the fit never saw). Fit cost is part of the
    // measured operator, the q96a index-build stance.
    "q135_quality_classifier" -> ((s, d) => {
      val labeled = Tables.documents(s, d).select(
        col("doc_id"),
        when(col("doc_id") % 3 === 0,
          concat(col("text"), lit(" excellent thorough educational well researched reference")))
          .otherwise(concat(col("text"), lit(" click buy cheap winner prize offer")))
          .as("text"),
        (col("doc_id") % 3 === 0).cast("double").as("label"))
      val model = graft.text.QualityFilter.train(
        labeled.filter(col("doc_id") % 2 === 0), "text", "label", dim = 256)
      graft.text.QualityFilter.score(labeled, "doc_id", "text", model)
        .select(col("id").as("doc_id"), col("n_tokens"), col("quality_score"), col("keep"))
    }),

    // Learned language ID (fastText/CCNet shape — Joulin et al. 2016,
    // Wenzek et al. 2019) — rows-only ⊘: MLlib's L-BFGS multinomial
    // fit is iterative, not replayable in SQL. LangIdSpec holds the
    // real gates: ≥0.95 held-out accuracy on the planted multilingual
    // corpus vs the stopword heuristic's measured deficit, bit-exact
    // refits, Exchange-free scoring. The fixture trains on the planted
    // corpus (the bounded offline step), then scores the documents
    // table — the corpus-sized path this row times.
    "q172_langid_learned" -> ((s, d) => {
      val model = graft.text.LangId.train(
        graft.text.LangId.plantedCorpus(s, 360, seed = 42L), "text", "lang",
        dim = 1024)
      graft.text.LangId.score(Tables.documents(s, d), "doc_id", "text", model)
        .select(col("id").as("doc_id"), col("lang"), col("confidence"))
    }),

    // BPE tokenizer training (Sennrich et al. 2016) — rows-only ⊘:
    // the merge loop is iterative (each rank's counts depend on the
    // previous rank's rewrite), not replayable in SQL. BpeSpec pins
    // both production paths — driver-incremental and distributed
    // fold-merge — to an independent from-scratch reference; the
    // first-iteration kernel carries the full hash oracle as q140a.
    "q140_bpe_train" -> ((s, d) =>
      graft.text.Bpe.mergesDf(s,
        graft.text.Bpe.train(Tables.documents(s, d), "text", nMerges = 60, minFreq = 2L))),

    // The q140 training kernel under a FULL oracle: first-iteration
    // character-pair counts weighted by word frequency (overlapping
    // occurrences included, Sennrich's get_stats) — the aggregation
    // every merge iteration repeats on the evolving symbol table.
    "q140a_bpe_pair_counts" -> ((s, d) =>
      graft.text.Bpe.charPairCounts(Tables.documents(s, d), "text")),

    // BPE encoding — rows-only ⊘: per-doc token accounting under the
    // corpus-trained merge table (training is part of the measured
    // operator, the q96a index-build stance; the scoring join runs
    // once per distinct word). BpeSpec pins encode == training-final
    // symbols and the per-doc arithmetic against a by-hand fixture.
    "q141_bpe_encode" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val merges = graft.text.Bpe.train(docs, "text", nMerges = 40, minFreq = 2L)
      graft.text.Bpe.tokenCounts(docs, "doc_id", "text", merges)
    }),

    // WordPiece tokenizer training (Schuster & Nakajima 2012; BERT) —
    // rows-only ⊘: iterative like q140 (each rank's likelihood scores
    // depend on the previous rewrite). Completes the subword-family
    // trio: BPE (q140), unigram (q177), WordPiece. WordpieceSpec pins
    // the driver and distributed paths bit-identical and the score /
    // tie semantics on hand-traced fixtures.
    "q189_wordpiece_train" -> ((s, d) =>
      graft.text.Wordpiece.mergesDf(s,
        graft.text.Wordpiece.train(Tables.documents(s, d), "text",
          nMerges = 60, minFreq = 2L))),

    // WordPiece encoding — rows-only ⊘: greedy longest-match-first
    // over the corpus-trained vocabulary (training is part of the
    // measured operator, the q141 stance); the encoder runs once per
    // DISTINCT word, per-occurrence work is the word-keyed join + agg.
    "q190_wordpiece_encode" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val merges = graft.text.Wordpiece.train(docs, "text", nMerges = 40, minFreq = 2L)
      graft.text.Wordpiece.tokenCounts(docs, "doc_id", "text",
        graft.text.Wordpiece.vocabularyFromCorpus(docs, "text", merges))
    }),

    // Unigram (SentencePiece-style) tokenizer training (Kudo 2018) —
    // rows-only ⊘: the EM + prune loop is iterative like q140's merge
    // loop, not replayable in SQL. UnigramSpec pins the E-step kernel
    // against brute-force posterior enumeration and one full sweep
    // against an independently-coded reference; the corpus-scaled
    // pass is the SAME single wordCounts shuffle q140 times.
    "q177_unigram_train" -> ((s, d) =>
      graft.text.Unigram.piecesDf(s,
        graft.text.Unigram.train(Tables.documents(s, d), "text",
          targetVocab = 60, seedSize = 400, minFreq = 2L))),

    // Unigram encoding — rows-only ⊘: per-doc Viterbi token
    // accounting under the corpus-trained model (training included in
    // the measured operator, the q141 stance; the DP runs once per
    // DISTINCT word, occurrences join word-keyed).
    "q178_unigram_encode" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val model = graft.text.Unigram.train(docs, "text",
        targetVocab = 60, seedSize = 400, minFreq = 2L)
      graft.text.Unigram.tokenCounts(docs, "doc_id", "text", model)
    }),

    // Same gate for the markdown extractor: heading/emphasis/link/list
    // markers wrap the document and must strip back to plain text.
    "q102_md_extract" -> ((s, d) => {
      val md = concat(
        lit("# Doc "), col("doc_id"), lit("\n\n> quoted intro\n\n**"),
        col("text"), lit("**\n\n- see [docs](http://example.com/spark) here\n"))
      val binary = Tables.documents(s, d).select(
        col("doc_id"),
        concat(lit("mem/doc"), col("doc_id"), lit(".md")).as("path"),
        encode(md, "UTF-8").cast("binary").as("payload"))
      graft.multimodal.DocumentExtract.extractDocuments(binary, "path", "payload")
        .select(col("doc_id"), col("doc_format"), col("text"), col("line_count"))
    }))

  private val toksSql =
    """toks AS (
         SELECT doc_id, lang,
                list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '') AS tk,
                text
         FROM documents)"""

  private def swList(lang: String): String =
    TextAnalysis.Stopwords.toMap.apply(lang).map(w => s"'$w'").mkString("[", ", ", "]")

  private val q97Sql = {
    val langs = TextAnalysis.Stopwords.map(_._1)
    val scores = langs.map(l =>
      s"len(list_filter(tk, t -> list_contains(${swList(l)}, t))) AS s_$l").mkString(", ")
    val cases = langs.zipWithIndex.map { case (l, i) =>
      val geRest = (s"s_$l > 0" +: langs.drop(i + 1).map(l2 => s"s_$l >= s_$l2")).mkString(" AND ")
      s"WHEN $geRest THEN '$l'"
    }.mkString(" ")
    s"""WITH $toksSql,
        scored AS (SELECT doc_id, lang, $scores FROM toks)
        SELECT doc_id, lang, CASE $cases ELSE 'unknown' END AS pred_lang FROM scored"""
  }

  private val q98Sql = {
    val en = swList("en")
    s"""WITH $toksSql
        SELECT doc_id,
          CAST(length(text) AS BIGINT) AS n_chars,
          CAST(len(tk) AS BIGINT) AS n_tokens,
          CAST(len(regexp_extract_all(text,
            '${graft.text.TextAnalysis.BpeishPattern.replace("'", "''")}')) AS BIGINT)
            AS n_bpeish_tokens,
          list_sum(list_transform(tk, t -> length(t))) * 1.0 / len(tk) AS avg_token_len,
          len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) * 1.0 / length(text) AS punct_ratio,
          len(regexp_extract_all(text, '[A-Z]')) * 1.0 / length(text) AS upper_ratio,
          len(list_filter(tk, t -> list_contains($en, t))) * 1.0 / len(tk) AS stopword_ratio,
          least(len(tk) / 100.0, 1.0) * 0.4
            + (1.0 - len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) * 1.0 / length(text)) * 0.3
            + least(len(list_filter(tk, t -> list_contains($en, t))) * 1.0 / len(tk) * 5.0, 1.0) * 0.3
            AS quality_score
        FROM toks"""
  }

  private val q99Sql =
    s"""WITH $toksSql,
        idd AS (SELECT doc_id, tk,
                  list_transform(tk, t -> CAST(concat('0x', substr(md5(t), 1, 8)) AS BIGINT)) AS ids
                FROM toks)
        SELECT doc_id,
          CASE WHEN len(ids) >= 1
               THEN list_reduce(ids, (acc, x) -> (acc * 31 + x) % ${TextAnalysis.FingerprintPrime})
               ELSE CAST(NULL AS BIGINT) END AS fp,
          md5(array_to_string(tk, ' ')) AS norm_fp
        FROM idd"""

  private val q100Sql =
    """SELECT doc_id,
         CAST(strlen(text) AS BIGINT) AS n_bytes,
         md5(text) AS content_hash,
         (strlen(text) + 63) // 64 AS n_chunks,
         ((strlen(text) + 63) // 64 + 3) // 4 AS n_sampled
       FROM documents"""

  private val q101Sql =
    """SELECT doc_id, 'html' AS doc_format,
         'Doc ' || doc_id AS title,
         'Doc ' || doc_id || ' ' || text AS text,
         CAST(1 AS BIGINT) AS line_count
       FROM documents"""

  private val q102Sql =
    """SELECT doc_id, 'markdown' AS doc_format,
         'Doc ' || doc_id || ' quoted intro ' || text || ' see docs here' AS text,
         CAST(1 AS BIGINT) AS line_count
       FROM documents"""

  // q117: same doubled multi-line construction, same integer-count
  // arithmetic — the single count/count division runs on identical
  // operands in both engines
  private val q117Sql =
    """WITH m AS (
         SELECT doc_id,
           regexp_replace(text, '\. ', '.' || chr(10), 'g') || chr(10) || chr(10) ||
             regexp_replace(text, '\. ', '.' || chr(10), 'g') AS mt
         FROM documents),
       parts AS (
         SELECT doc_id, mt,
           list_filter(list_transform(string_split_regex(mt, '\r?\n'), x -> trim(x)), x -> x <> '') AS lines,
           list_filter(list_transform(string_split_regex(mt, '\n\s*\n'), x -> trim(x)), x -> x <> '') AS paras,
           list_filter(string_split_regex(lower(mt), '[^a-z0-9]+'), t -> t <> '') AS tk
         FROM m),
       bg AS (
         SELECT doc_id, lines, paras,
           CASE WHEN len(tk) >= 2
                THEN list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])
                ELSE [] END AS bigrams
         FROM parts),
       fr AS (
         SELECT doc_id,
           CASE WHEN len(lines) > 0 THEN 1.0 - len(list_distinct(lines)) * 1.0 / len(lines) ELSE 0.0 END AS dup_line_frac,
           CASE WHEN len(paras) > 0 THEN 1.0 - len(list_distinct(paras)) * 1.0 / len(paras) ELSE 0.0 END AS dup_para_frac,
           CASE WHEN len(bigrams) > 0
                THEN list_max(list_transform(list_distinct(bigrams),
                       b -> len(list_filter(bigrams, x -> x = b)))) * 1.0 / len(bigrams)
                ELSE 0.0 END AS top_bigram_frac
         FROM bg)
       SELECT doc_id, dup_line_frac, dup_para_frac, top_bigram_frac,
              dup_line_frac <= 0.30 AND dup_para_frac <= 0.30 AND top_bigram_frac <= 0.20 AS passes
       FROM fr"""

  // q118: identical line manufacture, line retention, and page gates —
  // every count is integer arithmetic on identical operands, and the
  // cleaned text itself hash-compares
  private val q118Sql =
    """WITH s0 AS (
         SELECT doc_id,
           regexp_replace(text, '((\S+\s+){7}\S+)\s+', '\1.' || chr(10), 'g') AS sent
         FROM documents),
       m AS (
         SELECT doc_id,
           CASE WHEN doc_id % 13 = 0 THEN m2 || chr(10) || 'lorem ipsum dolor sit amet filler text.' ELSE m2 END AS mt
         FROM (
           SELECT doc_id,
             CASE WHEN doc_id % 11 = 0 THEN m1 || chr(10) || 'see the { config } block for details.' ELSE m1 END AS m2
           FROM (
             SELECT doc_id,
               CASE WHEN doc_id % 7 = 0 THEN sent || chr(10) || 'javascript is required to view this page.' ELSE sent END AS m1
             FROM s0))),
       l AS (
         SELECT doc_id, mt,
           list_filter(list_transform(string_split_regex(mt, '\r?\n'), x -> trim(x)), x -> x <> '') AS lines
         FROM m),
       k AS (
         SELECT doc_id, mt, lines,
           list_filter(lines, x -> regexp_matches(x, '[.!?"]$')
             AND len(string_split_regex(x, ' +')) >= 5
             AND NOT contains(lower(x), 'javascript')) AS kept
         FROM l),
       c AS (
         SELECT doc_id, mt, lines, kept,
           coalesce(array_to_string(kept, chr(10)), '') AS clean_text
         FROM k),
       f AS (
         SELECT doc_id, mt, lines, kept, clean_text,
           len(regexp_extract_all(clean_text, '[.!?]')) AS n_sentences
         FROM c)
       SELECT doc_id, clean_text,
         CAST(len(lines) AS BIGINT) AS n_lines,
         CAST(len(kept) AS BIGINT) AS n_kept_lines,
         CAST(n_sentences AS BIGINT) AS n_sentences,
         CAST(length(clean_text) AS BIGINT) AS clean_chars,
         n_sentences >= 3 AND NOT contains(lower(mt), 'lorem ipsum')
           AND NOT contains(mt, '{') AS passes
       FROM f"""

  // q122: identical 3-gram extraction on both sides; counts are
  // integers, the ratios single IEEE divisions of exact integers
  private val q122Sql =
    """WITH g AS (
         SELECT doc_id,
           list_transform(range(1, greatest(length(lower(text)) - 2, 0) + 1),
             i -> substr(lower(text), i, 3)) AS gs
         FROM documents),
       model AS (
         SELECT gram, count(*) AS cnt FROM (
           SELECT unnest(gs) AS gram FROM g WHERE doc_id % 2 = 0)
         GROUP BY gram HAVING count(*) >= 64),
       scored AS (
         SELECT doc_id, gram FROM (
           SELECT doc_id, unnest(gs) AS gram FROM g WHERE doc_id % 2 = 1))
       SELECT doc_id,
         count(*) AS n_grams,
         count(cnt) AS n_known,
         count(cnt) * 1.0 / count(*) AS coverage,
         coalesce(sum(cnt), 0) * 1.0 / count(*) AS avg_ref_cnt
       FROM scored LEFT JOIN model USING (gram)
       GROUP BY doc_id"""

  // The micro-nat grid `floor(ln(n)*1e6 + 0.5)` as a bigint — the SQL
  // twin of TextAnalysis.qlog (probed bit-identical to JVM Math.log
  // for every integer n in 1..2e7 on this host's libm).
  private def qlogSql(expr: String): String =
    s"CAST(floor(ln(CAST(($expr) AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)"

  // q129: identical model build, identical grid arithmetic — sums of
  // exact bigints, divisions of exact integers, bucket bounds as the
  // same literals
  private val q129Sql =
    s"""WITH $toksSql,
        model AS (
          SELECT token, count(*) AS cnt
          FROM (SELECT unnest(tk) AS token FROM toks WHERE doc_id % 2 = 0)
          GROUP BY token),
        dval AS (SELECT coalesce(sum(cnt), 0) + count(*) + 1 AS d FROM model),
        tok AS (SELECT doc_id, unnest(tk) AS token FROM toks WHERE doc_id % 2 = 1),
        j AS (
          SELECT doc_id, cnt IS NULL AS oov,
            ${qlogSql("SELECT d FROM dval")} - ${qlogSql("coalesce(cnt, 0) + 1")} AS nll
          FROM tok LEFT JOIN model USING (token)),
        a AS (
          SELECT doc_id, count(*) AS n_tokens,
            sum(CASE WHEN oov THEN 1 ELSE 0 END) AS n_oov,
            sum(nll) AS sum_nll_micro
          FROM j GROUP BY doc_id)
        SELECT doc_id, n_tokens, CAST(n_oov AS BIGINT) AS n_oov,
          n_oov * 1.0 / n_tokens AS oov_frac,
          CAST(sum_nll_micro AS BIGINT) AS sum_nll_micro,
          sum_nll_micro * 1.0 / n_tokens AS avg_nll_micro,
          CASE WHEN sum_nll_micro * 1.0 / n_tokens < 3401000.0 THEN 'head'
               WHEN sum_nll_micro * 1.0 / n_tokens < 3404000.0 THEN 'middle'
               ELSE 'tail' END AS ppl_bucket
        FROM a"""

  // q165: the q129 scoring CTEs + the lang attach + one percent_rank
  // window per language; the bucket fracs render Scala's exact IEEE
  // doubles (1.0/3 → 17 significant digits, round-trip-exact)
  private val q165Sql = {
    val head = (1.0 / 3).toString; val middle = (2.0 / 3).toString
    s"""WITH $toksSql,
        model AS (
          SELECT token, count(*) AS cnt
          FROM (SELECT unnest(tk) AS token FROM toks WHERE doc_id % 2 = 0)
          GROUP BY token),
        dval AS (SELECT coalesce(sum(cnt), 0) + count(*) + 1 AS d FROM model),
        tok AS (SELECT doc_id, unnest(tk) AS token FROM toks WHERE doc_id % 2 = 1),
        j AS (
          SELECT doc_id,
            ${qlogSql("SELECT d FROM dval")} - ${qlogSql("coalesce(cnt, 0) + 1")} AS nll
          FROM tok LEFT JOIN model USING (token)),
        a AS (
          SELECT doc_id, count(*) AS n_tokens,
            CAST(sum(nll) AS BIGINT) AS sum_nll_micro
          FROM j GROUP BY doc_id),
        l AS (
          SELECT a.doc_id, a.n_tokens, a.sum_nll_micro,
            a.sum_nll_micro * 1.0 / a.n_tokens AS avg_nll_micro, d.lang
          FROM a JOIN documents d USING (doc_id)),
        p AS (
          SELECT *, percent_rank() OVER (PARTITION BY lang
            ORDER BY avg_nll_micro) AS pct
          FROM l)
        SELECT doc_id, n_tokens, sum_nll_micro, avg_nll_micro, lang, pct,
          CASE WHEN pct < $head THEN 'head'
               WHEN pct < $middle THEN 'middle'
               ELSE 'tail' END AS pct_bucket
        FROM p"""
  }

  // q199: the q129 scoring CTEs + the census of ALL scored docs (the
  // merge==build-of-union invariant IS the oracle), one cumulative
  // window in bucket order, frozen thirds via ceil(frac*total); fracs
  // render Scala's exact IEEE doubles like q165's
  private val q199Sql = {
    val head = (1.0 / 3).toString; val middle = (2.0 / 3).toString
    s"""WITH $toksSql,
        model AS (
          SELECT token, count(*) AS cnt
          FROM (SELECT unnest(tk) AS token FROM toks WHERE doc_id % 2 = 0)
          GROUP BY token),
        dval AS (SELECT coalesce(sum(cnt), 0) + count(*) + 1 AS d FROM model),
        tok AS (SELECT doc_id, unnest(tk) AS token FROM toks WHERE doc_id % 2 = 1),
        j AS (
          SELECT doc_id,
            ${qlogSql("SELECT d FROM dval")} - ${qlogSql("coalesce(cnt, 0) + 1")} AS nll
          FROM tok LEFT JOIN model USING (token)),
        a AS (
          SELECT doc_id, count(*) AS n_tokens,
            CAST(sum(nll) AS BIGINT) AS sum_nll_micro
          FROM j GROUP BY doc_id),
        c AS (
          SELECT CAST(floor((sum_nll_micro * 1.0 / n_tokens) / 1000.0) AS BIGINT) AS bucket
          FROM a),
        h AS (SELECT bucket, CAST(count(*) AS BIGINT) AS cnt FROM c GROUP BY bucket),
        p AS (
          SELECT bucket, cnt,
            CAST(sum(cnt) OVER (ORDER BY bucket) AS BIGINT) AS cum_cnt,
            CAST(sum(cnt) OVER () AS BIGINT) AS total
          FROM h),
        b AS (
          SELECT
            min(CASE WHEN cum_cnt >= ceil($head * total) THEN bucket END) AS head_b,
            min(CASE WHEN cum_cnt >= ceil($middle * total) THEN bucket END) AS middle_b
          FROM p)
        SELECT bucket, cnt, cum_cnt, total,
          CASE WHEN bucket <= head_b THEN 'head'
               WHEN bucket <= middle_b THEN 'middle'
               ELSE 'tail' END AS pct_bucket
        FROM p CROSS JOIN b"""
  }

  // q166: the champion-list replay — same (term, doc) groupBy, same
  // three windows over the term partition
  private val q166Sql =
    s"""WITH $toksSql,
        tok AS (SELECT doc_id, unnest(tk) AS term FROM toks),
        g AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
              FROM tok GROUP BY term, doc_id),
        w AS (
          SELECT term, doc_id, tf,
            CAST(count(*) OVER (PARTITION BY term) AS BIGINT) AS df,
            CAST(sum(tf) OVER (PARTITION BY term) AS BIGINT) AS cf,
            CAST(row_number() OVER (PARTITION BY term
              ORDER BY tf DESC, doc_id ASC) AS BIGINT) AS rnk
          FROM g)
        SELECT term, df, cf, rnk, doc_id, tf FROM w WHERE rnk <= 5"""

  // q168: identical 60-bit md5 hashes, per-group k-min windows, pair
  // membership flags and union k-min — the whole estimator replays
  private val q168Sql =
    """WITH f AS (
         SELECT source AS g, text FROM documents
         UNION ALL
         SELECT 'mix', text FROM documents WHERE doc_id % 3 = 0),
       d AS (
         SELECT DISTINCT g,
           CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) AS h
         FROM f),
       sk AS (
         SELECT g, h FROM (
           SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
           FROM d) WHERE rn <= 64),
       gs AS (SELECT DISTINCT g FROM sk),
       p AS (SELECT a.g AS g1, b.g AS g2 FROM gs a JOIN gs b ON a.g < b.g),
       m AS (
         SELECT p.g1, p.g2, s.h,
           max(CASE WHEN s.g = p.g1 THEN 1 ELSE 0 END) AS a,
           max(CASE WHEN s.g = p.g2 THEN 1 ELSE 0 END) AS b
         FROM p JOIN sk s ON s.g = p.g1 OR s.g = p.g2
         GROUP BY p.g1, p.g2, s.h),
       r AS (
         SELECT *, row_number() OVER (PARTITION BY g1, g2 ORDER BY h) AS rn
         FROM m)
       SELECT g1, g2, CAST(count(*) AS BIGINT) AS k_used,
         CAST(sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
         CAST(sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS jaccard_est
       FROM r WHERE rn <= 64 GROUP BY g1, g2"""

  // q130: two models, merged per token; the per-token D-shift and the
  // top-25% cutoff replay the Scala constants exactly
  private val q130Sql =
    s"""WITH $toksSql,
        tgt AS (
          SELECT token, count(*) AS cnt
          FROM (SELECT unnest(tk) AS token FROM toks WHERE lang = 'en') GROUP BY token),
        raw AS (
          SELECT token, count(*) AS cnt
          FROM (SELECT unnest(tk) AS token FROM toks) GROUP BY token),
        dt AS (SELECT coalesce(sum(cnt), 0) + count(*) + 1 AS d FROM tgt),
        dr AS (SELECT coalesce(sum(cnt), 0) + count(*) + 1 AS d FROM raw),
        tok AS (SELECT doc_id, unnest(tk) AS token FROM toks),
        j AS (
          SELECT doc_id,
            ${qlogSql("coalesce(t.cnt, 0) + 1")} - ${qlogSql("coalesce(r.cnt, 0) + 1")}
              + ${qlogSql("SELECT d FROM dr")} - ${qlogSql("SELECT d FROM dt")} AS w
          FROM tok LEFT JOIN tgt t USING (token) LEFT JOIN raw r USING (token)),
        a AS (
          SELECT doc_id, count(*) AS n_tokens, CAST(sum(w) AS BIGINT) AS weight_micro
          FROM j GROUP BY doc_id)
        SELECT doc_id, n_tokens, weight_micro
        FROM a
        QUALIFY row_number() OVER (ORDER BY weight_micro DESC, doc_id)
          <= CAST(ceil(0.25 * (SELECT count(*) FROM a)) AS BIGINT)"""

  // q131: integer-exact tf·idf, rank deterministic on (score, token)
  private val q131Sql =
    s"""WITH $toksSql,
        n AS (SELECT count(*) AS c FROM documents),
        dfm AS (
          SELECT token, count(*) AS df FROM (
            SELECT DISTINCT doc_id, token
            FROM (SELECT doc_id, unnest(tk) AS token FROM toks))
          GROUP BY token),
        idf AS (
          SELECT token,
            ${qlogSql("(SELECT c FROM n) + 1")} - ${qlogSql("df + 1")} AS idf_micro
          FROM dfm),
        tf AS (
          SELECT doc_id, token, count(*) AS tf
          FROM (SELECT doc_id, unnest(tk) AS token FROM toks)
          GROUP BY doc_id, token),
        s AS (
          SELECT doc_id, token, tf, idf_micro, tf * idf_micro AS score
          FROM tf JOIN idf USING (token))
        SELECT doc_id,
          CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, token) AS INT) AS rank,
          token, tf, idf_micro, score
        FROM s
        QUALIFY rank <= 3"""

  // q133: identical bigram/context/unigram model builds; each token's
  // interpolated probability is ONE integer fraction, so the NLL is a
  // difference of two grid logs on identical integer operands
  private val q133Sql =
    s"""WITH $toksSql,
        uni AS (
          SELECT token, count(*) AS cnt
          FROM (SELECT unnest(tk) AS token FROM toks WHERE doc_id % 2 = 0)
          GROUP BY token),
        dval AS (SELECT coalesce(sum(cnt), 0) + count(*) + 1 AS d FROM uni),
        bgp AS (
          SELECT doc_id,
            unnest(list_transform(range(1, len(tk)), i -> {'w1': tk[i], 'w2': tk[i+1]})) AS p
          FROM toks WHERE doc_id % 2 = 0),
        bg AS (SELECT p.w1 AS w1, p.w2 AS w2, count(*) AS cnt FROM bgp GROUP BY 1, 2),
        ctx AS (SELECT w1, CAST(sum(cnt) AS BIGINT) AS ctx_cnt FROM bg GROUP BY w1),
        sp AS (
          SELECT doc_id,
            unnest(list_transform(tk, (t, i) ->
              {'w_prev': CASE WHEN i >= 2 THEN tk[i-1] END, 'w': t})) AS p
          FROM toks WHERE doc_id % 2 = 1),
        pr AS (SELECT doc_id, p.w_prev AS w_prev, p.w AS w FROM sp),
        j AS (
          SELECT doc_id,
            w_prev IS NOT NULL AND c.ctx_cnt IS NOT NULL AS ctx_hit,
            CASE WHEN w_prev IS NULL OR c.ctx_cnt IS NULL
              THEN ${qlogSql("SELECT d FROM dval")} - ${qlogSql("coalesce(u.cnt, 0) + 1")}
              ELSE ${qlogSql("2 * c.ctx_cnt * (SELECT d FROM dval)")}
                 - ${qlogSql(
                      "coalesce(b.cnt, 0) * (SELECT d FROM dval) + (coalesce(u.cnt, 0) + 1) * c.ctx_cnt")}
            END AS nll
          FROM pr
          LEFT JOIN bg b ON b.w1 = pr.w_prev AND b.w2 = pr.w
          LEFT JOIN ctx c ON c.w1 = pr.w_prev
          LEFT JOIN uni u ON u.token = pr.w)
        SELECT doc_id, count(*) AS n_tokens,
          CAST(sum(CASE WHEN ctx_hit THEN 1 ELSE 0 END) AS BIGINT) AS n_ctx_hits,
          CAST(sum(nll) AS BIGINT) AS sum_nll_micro,
          sum(nll) * 1.0 / count(*) AS avg_nll_micro
        FROM j GROUP BY doc_id"""

  // q132: same two-leg shape — doc-level integer aggregates + an
  // exact distinct-token count per source; ratios are single IEEE
  // divisions of exact integers
  private val q132Sql =
    """WITH t AS (
         SELECT source,
           list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS tk,
           text
         FROM documents),
       d AS (
         SELECT source, count(*) AS n_docs,
           CAST(sum(len(tk)) AS BIGINT) AS total_tokens,
           CAST(sum(length(text)) AS BIGINT) AS total_chars
         FROM t GROUP BY source),
       v AS (
         SELECT source, count(*) AS vocab FROM (
           SELECT DISTINCT source, token
           FROM (SELECT source, unnest(tk) AS token FROM t))
         GROUP BY source)
       SELECT source, n_docs, total_tokens, total_chars,
         coalesce(vocab, 0) AS vocab,
         total_tokens * 1.0 / n_docs AS avg_doc_tokens,
         coalesce(vocab, 0) * 1.0 / total_tokens AS type_token_ratio
       FROM d LEFT JOIN v USING (source)"""

  // escape → build PDF → parse → unescape must round-trip exactly, so
  // the oracle is the identity reconstruction (Td breaks lines, pages
  // join with a newline)
  private val q103Sql =
    """SELECT doc_id, 'pdf' AS doc_format, CAST(2 AS BIGINT) AS n_pages,
         'Doc ' || doc_id || chr(10) || text || chr(10) || 'End of doc ' || doc_id AS text
       FROM documents"""

  // q140a: the identical tokenize (the toksSql regex), word counts,
  // per-position char pairs via a list-valued generate_series unnest
  // (single-char words yield the empty list and vanish, matching the
  // empty pair array), weighted sum per (l, r).
  private val q140aSql =
    """WITH toks AS (
         SELECT list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '') AS tk
         FROM documents),
       words AS (SELECT unnest(tk) AS w FROM toks),
       wc AS (SELECT w, count(*) AS c FROM words GROUP BY w),
       pos AS (SELECT w, c, unnest(generate_series(1, length(w) - 1)) AS i FROM wc),
       pairs AS (SELECT substr(w, i, 1) AS l, substr(w, i + 1, 1) AS r, c FROM pos)
       SELECT l, r, CAST(sum(c) AS BIGINT) AS freq FROM pairs GROUP BY l, r"""

  /** The q156 oracle replays the whole retrieval: same probe-query
    * derivation (frequency bands over the same tokenizer), same
    * micro-grid scoring formula TEXT-FOR-TEXT (both engines fold the
    * constants in IEEE doubles, `ln` is the same correctly-rounded
    * primitive — the qlog precedent), same (score desc, doc_id) tie
    * order. */
  private val q156Sql =
    """WITH tk AS (
         SELECT doc_id,
           list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '') AS tks
         FROM documents),
       wc AS (
         SELECT tok, count(*) AS c
         FROM (SELECT unnest(tks) AS tok FROM tk) GROUP BY tok),
       ranked AS (
         SELECT tok, row_number() OVER (ORDER BY c DESC, tok) AS rk FROM wc),
       qt AS (
         SELECT CAST(rk // 10 AS BIGINT) AS qid, tok AS term
         FROM ranked
         WHERE rk >= 11 AND rk <= 34 AND rk % 10 >= 1 AND rk % 10 <= 4),
       base AS (SELECT doc_id, CAST(len(tks) AS BIGINT) AS dl, tks FROM tk),
       tfx AS (
         SELECT doc_id, dl, tok, CAST(count(*) AS BIGINT) AS tf
         FROM (SELECT doc_id, dl, unnest(tks) AS tok FROM base)
         WHERE tok IN (SELECT term FROM qt)
         GROUP BY doc_id, dl, tok),
       dfreq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tfx GROUP BY tok),
       st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl FROM base),
       sc AS (
         SELECT qt.qid, tfx.doc_id,
           CAST(floor(
             ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
             * (CAST(tf AS DOUBLE) * (1.2 + 1.0)
                / (CAST(tf AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE)
                   / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))
             * 1000000.0 + 0.5) AS BIGINT) AS term_micro
         FROM tfx JOIN dfreq USING (tok) JOIN qt ON qt.term = tfx.tok CROSS JOIN st),
       agg AS (
         SELECT qid, doc_id, CAST(count(*) AS BIGINT) AS n_terms,
           CAST(sum(term_micro) AS BIGINT) AS score_micro
         FROM sc GROUP BY qid, doc_id),
       rk2 AS (
         SELECT qid,
           CAST(row_number() OVER (PARTITION BY qid ORDER BY score_micro DESC, doc_id) AS BIGINT) AS rnk,
           doc_id, n_terms, score_micro
         FROM agg)
       SELECT qid, rnk, doc_id, n_terms, score_micro,
         CAST(score_micro AS DOUBLE) / 1000000.0 AS score
       FROM rk2 WHERE rnk <= 10"""

  val oracles: Map[String, String] = Map(
    "q156_bm25" -> q156Sql,
    "q140a_bpe_pair_counts" -> q140aSql,
    "q97_lang_id" -> q97Sql,
    "q98_text_quality" -> q98Sql,
    "q99_fingerprint" -> q99Sql,
    "q100_multimodal" -> q100Sql,
    "q101_doc_extract" -> q101Sql,
    "q102_md_extract" -> q102Sql,
    "q103_pdf_extract" -> q103Sql,
    "q117_repetition" -> q117Sql,
    "q118_c4_filter" -> q118Sql,
    "q122_coverage" -> q122Sql,
    "q129_lm_perplexity" -> q129Sql,
    "q165_ccnet_buckets" -> q165Sql,
    "q199_quantile_census" -> q199Sql,
    "q166_inverted_index" -> q166Sql,
    // q186: the incremental path must land EXACTLY where the full
    // rebuild lands — the oracle is the q166 replay verbatim
    "q186_index_incremental" -> q166Sql,
    // q188: store-served BM25 == the full text-scan retrieval
    "q188_bm25_store" -> q156Sql,
    "q168_corpus_overlap" -> q168Sql,
    "q130_dsir_select" -> q130Sql,
    "q131_tfidf_keywords" -> q131Sql,
    "q132_corpus_stats" -> q132Sql,
    "q133_bigram_perplexity" -> q133Sql)
}
