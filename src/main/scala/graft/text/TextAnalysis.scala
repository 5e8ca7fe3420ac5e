package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: language ID, quality
  * scoring, token counting, document fingerprinting.
  *
  * Everything is a pure column expression over the tokenized text —
  * narrow, shuffle-free, whole-stage-codegen-friendly (the higher-order
  * functions evaluate natively per row). Token ids for fingerprints are
  * md5-derived 32-bit integers (engine-portable, like the dedup
  * family's shingle ids).
  */
object TextAnalysis {

  val FingerprintPrime = 2147483647L

  /** Lowercased alphanumeric tokens as an array column. */
  def tokens(text: Column): Column =
    // fused tokenizer kernel (r20, guide §4): one lowercase + one byte
    // scan, no regex, no interpreted filter lambda — token-for-token
    // identical to filter(split(lower(text), "[^a-z0-9]+"), _ =!= "")
    // (the WordNgrams spec twin pins it)
    graft.functions.WordNgrams.ngrams(text, 1)

  /** Small stopword profiles for the n-gram language-ID heuristic.
    * Deliberately tiny: the heuristic scores membership counts, so a
    * handful of high-frequency function words per language suffices. */
  val Stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "an", "and", "of", "to", "in", "is", "that", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "ein", "eine", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "de", "un", "une", "dans", "que"),
    "es" -> Seq("el", "los", "las", "y", "es", "de", "un", "una", "en", "que"))

  /** Occurrences of any word from `set` in the token array (repeats
    * count — frequency matters for language evidence). */
  def stopwordCount(toks: Column, set: Seq[String]): Column =
    size(filter(toks, t => t.isin(set.map(lit): _*)))

  /** Stopword-profile language ID (first maximum wins, in [[Stopwords]]
    * order; no evidence → "unknown"). */
  def languageId(text: Column): Column = {
    val toks = tokens(text)
    val scores = Stopwords.map { case (lang, sw) =>
      lang -> size(filter(toks, t => t.isin(sw.map(lit): _*)))
    }
    val cases = scores.zipWithIndex.foldLeft(when(lit(false), "")) {
      case (acc, ((lang, score), i)) =>
        val geRest = scores.drop(i + 1).map(_._2).foldLeft(score > 0)((c, s2) => c && score >= s2)
        acc.when(geRest, lang)
    }
    cases.otherwise("unknown")
  }

  /** GPT-2-style pre-tokenizer pattern, lookahead-free: contraction
    * suffixes, space-prefixed letter runs, digit runs, symbol runs,
    * residual whitespace. RE2-compatible (no `(?!…)`), so the SAME
    * pattern replays in the DuckDB oracle — the full GPT-2 pattern's
    * trailing-space lookahead only changes how inter-token whitespace
    * groups, not the count's scaling behavior. */
  val BpeishPattern: String = "'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^\\sa-zA-Z0-9]+|\\s+"

  /** Sub-word-ish token count: matches of [[BpeishPattern]]. Tracks a
    * real BPE tokenizer's pre-tokenization count (each match splits
    * into ≥1 merges), which is the budgeting signal a training-data
    * pipeline needs — sequence-length estimation, cost accounting —
    * without shipping a merges table. Pure codegen'd expression. */
  def bpeishTokenCount(text: Column): Column =
    coalesce(regexp_count(text, lit(BpeishPattern)), lit(0)).cast("long")

  /** Quality metrics struct: n_chars, n_tokens, n_bpeish_tokens,
    * avg_token_len, punct_ratio, upper_ratio, stopword_ratio,
    * quality_score — the length/punctuation/stopword heuristics a
    * pretraining filter applies per document. */
  def qualityMetrics(text: Column): Column = {
    val toks = tokens(text)
    val nChars = length(text)
    val nToks = size(toks)
    val sumLen = aggregate(transform(toks, t => length(t)), lit(0), (a, b) => a + b)
    val punct = coalesce(regexp_count(text, lit("[^a-zA-Z0-9 ]")), lit(0))
    val upper = coalesce(regexp_count(text, lit("[A-Z]")), lit(0))
    val enSw = Stopwords.head._2
    val sw = size(filter(toks, t => t.isin(enSw.map(lit): _*)))
    val punctRatio = punct * 1.0 / nChars
    val swRatio = sw * 1.0 / nToks
    val score =
      least(nToks / 100.0, lit(1.0)) * 0.4 +
        (lit(1.0) - punctRatio) * 0.3 +
        least(swRatio * 5.0, lit(1.0)) * 0.3
    struct(
      nChars.cast("long").as("n_chars"),
      nToks.cast("long").as("n_tokens"),
      bpeishTokenCount(text).as("n_bpeish_tokens"),
      (sumLen * 1.0 / nToks).as("avg_token_len"),
      punctRatio.as("punct_ratio"),
      (upper * 1.0 / nChars).as("upper_ratio"),
      swRatio.as("stopword_ratio"),
      score.as("quality_score"))
  }

  /** Portable 32-bit token id (first 8 md5 hex chars). */
  def tokenId(t: Column): Column = conv(substring(md5(t), 1, 8), 16, 10).cast("long")

  /** Order-sensitive polynomial rolling hash over the token sequence:
    * fold acc → (acc·31 + id) mod p seeded with the first token id
    * (the exact fold `list_reduce` computes, so it is oracle-checkable).
    * Null for token-less documents. */
  def fingerprint(text: Column): Column = {
    val ids = transform(tokens(text), tokenId(_))
    when(size(ids) >= 1,
      aggregate(
        slice(ids, lit(2), greatest(size(ids) - 1, lit(0))),
        element_at(ids, 1),
        (acc, x) => (acc * 31 + x) % FingerprintPrime))
      .otherwise(lit(null).cast("long"))
  }

  /** Content fingerprint invariant to whitespace/punctuation layout:
    * md5 of the space-joined token sequence. */
  def normalizedFingerprint(text: Column): Column = md5(concat_ws(" ", tokens(text)))

  /** Repetition metrics — the published pretraining repetition filters
    * (Gopher/MassiveText rules, Rae et al. 2021 §A1.1): documents
    * dominated by repeated lines/paragraphs or by one n-gram are
    * boilerplate/spam and poison language-model training. All pure
    * column expressions over per-row arrays (no shuffle, no UDF):
    *   - dup_line_frac / dup_para_frac: 1 − distinct/total over
    *     trimmed non-empty lines (paragraphs = blank-line splits);
    *   - top_bigram_frac: occurrences of the most frequent word bigram
    *     over total bigrams — computed as the longest equal run of the
    *     SORTED bigram array (one array_sort + one linear fold per row,
    *     O(n log n); the naive distinct×total membership scan measured
    *     ~100x slower on real documents).
    *
    * Bigrams come from `zip_with` over two `slice`s of the token array
    * (the dedup family's shingle pattern, TextDedup.shingleSets): each
    * slice evaluates the tokenize pipeline ONCE. The previous
    * `transform(sequence(1, n-1), i => element_at(toks, i)…)` shape
    * re-ran the whole regex tokenize per element — O(n) splits per
    * element, O(n²) per row, ~300 s/MB; this shape is O(n log n) like
    * q98's metrics. The bigram count folds into the same `aggregate`
    * as the max-run scan so the bigram array is built once per row.
    * → struct(dup_line_frac, dup_para_frac, top_bigram_frac) */
  def repetitionMetrics(text: Column): Column = repetitionMetrics(text, tokens(text))

  /** [[repetitionMetrics]] with a caller-supplied token array — project
    * `tokens(text)` behind its own boundary first and the bigram build
    * reads an attribute instead of re-splitting the text four times
    * (the q117 pattern, TextQueries). */
  def repetitionMetrics(text: Column, toks: Column): Column = {
    // distinct/total in ONE fold over the sorted array (distinct count
    // = boundary count between equal runs) — the parts tree evaluates
    // once, vs three times for size/array_distinct/size. Parts are
    // trimmed non-empty, so the "" seed never matches a real element.
    def dupFrac(parts: Column): Column = aggregate(
      array_sort(parts),
      struct(lit("").as("prev"), lit(0).as("dist"), lit(0).as("cnt")),
      (acc, x) => struct(
        x.as("prev"),
        (acc.getField("dist") +
          when(x === acc.getField("prev"), 0).otherwise(1)).as("dist"),
        (acc.getField("cnt") + 1).as("cnt")),
      acc => when(acc.getField("cnt") > 0,
        lit(1.0) - acc.getField("dist") * 1.0 / acc.getField("cnt")).otherwise(lit(0.0)))
    val lines = filter(transform(split(text, "\r?\n"), l => trim(l)), l => l =!= "")
    val paras = filter(transform(split(text, "\n\\s*\n"), p => trim(p)), p => p =!= "")
    // slice length clamps to 0 for 0/1-token docs → empty bigram array
    // (slice rejects negative lengths; greatest avoids the degenerate
    // range the old sequence(1, 0) guard worked around)
    val n1 = greatest(size(toks) - 1, lit(0))
    val bigrams = zip_with(
      slice(toks, lit(1), n1), slice(toks, lit(2), n1),
      (a, b) => concat_ws(" ", a, b))
    // one pass over the sorted array: longest equal run (= max bigram
    // multiplicity) and total count in the same fold
    val topBigram = aggregate(
      array_sort(bigrams),
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best"), lit(0).as("cnt")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1).otherwise(lit(1))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"),
          (acc.getField("cnt") + 1).as("cnt"))
      },
      acc => when(acc.getField("cnt") > 0,
        acc.getField("best") * 1.0 / acc.getField("cnt")).otherwise(lit(0.0)))
    struct(
      dupFrac(lines).as("dup_line_frac"),
      dupFrac(paras).as("dup_para_frac"),
      topBigram.as("top_bigram_frac"))
  }

  /** The Gopher repetition REJECTION rule applied to an ALREADY
    * COMPUTED [[repetitionMetrics]] struct column (published thresholds:
    * dup lines > 0.30, dup paragraphs > 0.30, top 2-gram > 0.20);
    * true = document survives. Take the struct from a prior projection
    * boundary so the metrics tree is evaluated once per row — Catalyst's
    * SimplifyExtractValueOps inlines a full copy of the tree per
    * `getField` when the struct literal sits in the same Project. */
  def repetitionPasses(
      metrics: Column,
      maxDupLineFrac: Double = 0.30,
      maxDupParaFrac: Double = 0.30,
      maxTopBigramFrac: Double = 0.20): Column =
    metrics.getField("dup_line_frac") <= maxDupLineFrac &&
      metrics.getField("dup_para_frac") <= maxDupParaFrac &&
      metrics.getField("top_bigram_frac") <= maxTopBigramFrac

  /** Convenience single-expression form of the Gopher filter. PERF:
    * this inlines three copies of the metrics tree (see
    * [[repetitionPasses]]) — in a query that also projects the metrics,
    * project the struct first and derive `passes` with
    * [[repetitionPasses]] instead (the q117 pattern, TextQueries). */
  def passesRepetitionFilter(
      text: Column,
      maxDupLineFrac: Double = 0.30,
      maxDupParaFrac: Double = 0.30,
      maxTopBigramFrac: Double = 0.20): Column =
    repetitionPasses(repetitionMetrics(text), maxDupLineFrac, maxDupParaFrac, maxTopBigramFrac)

  /** C4-style line-level cleaning (Raffel et al. 2020 §2.2, the
    * published heuristics behind the C4 corpus) — the OTHER half of
    * the pretraining filter family next to the Gopher repetition
    * rules: line retention (ends in terminal punctuation, ≥ `minWords`
    * words, no "javascript" mention) plus the page-level gates (≥ 3
    * sentences after cleaning, no "lorem ipsum", no '{'). All pure
    * per-row column expressions — narrow, shuffle-free, and
    * oracle-replayable; the bad-words page gate stays a caller-supplied
    * predicate (wordlists are policy, not engine).
    *
    * Returns struct(clean_text, n_lines, n_kept_lines, n_sentences,
    * clean_chars, passes). Project the struct ONCE and read fields
    * from the projected attribute (the q117/[[repetitionPasses]]
    * lesson — SimplifyExtractValueOps inlines a tree copy per field
    * otherwise). */
  def c4Metrics(text: Column, minWords: Int = 5): Column = {
    // Interpreted HOF lambdas re-evaluate every named subtree per
    // reference (no CSE): the flat form ran the line split ~5× and the
    // clean-text join 3× per row. Each stage is bound ONCE through the
    // transform(array(x), v => …) nesting (the LangId/blockStats trick,
    // r19) — later references are cheap reads of the bound value. Same
    // algebra, same values.
    element_at(transform(array(
      filter(transform(split(text, "\r?\n"), l => trim(l)), l => l =!= "")), lines =>
      element_at(transform(array(
        filter(lines, l =>
          regexp_like(l, lit("[.!?\"]$")) &&
            size(split(l, " +")) >= minWords &&
            !lower(l).contains("javascript"))), kept =>
        element_at(transform(array(array_join(kept, "\n")), clean =>
          element_at(transform(array(
            size(regexp_extract_all(clean, lit("[.!?]"), lit(0)))), nSent =>
            struct(
              clean.as("clean_text"),
              size(lines).cast("long").as("n_lines"),
              size(kept).cast("long").as("n_kept_lines"),
              nSent.cast("long").as("n_sentences"),
              length(clean).cast("long").as("clean_chars"),
              (nSent >= 3 &&
                !lower(text).contains("lorem ipsum") &&
                !text.contains("{")).as("passes"))), 1)), 1)), 1)), 1)
  }

  /** Character n-gram counts over a REFERENCE corpus — the model half
    * of count-based quality scoring (the CCNet idea: score documents
    * by how familiar their character statistics are to a trusted
    * corpus; here the count table itself IS the model, so scoring
    * stays integer-exact and oracle-checkable instead of riding
    * engine-specific log/float behavior). One explode + one hash
    * groupBy with map-side partials. → (gram, cnt) */
  def charNgramModel(refDocs: DataFrame, textCol: String, n: Int = 3): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    // grams come from the fused CharNgrams kernel (r20, guide §4): the
    // transform-lambda form it replaces (even with r19's lower()
    // hoist) paid an interpreted dispatch per gram plus an O(i)
    // substr scan — O(len²) character work per document. Same gram
    // strings (TextSpec pins the twin); sub-n-length text explodes to
    // nothing either way.
    refDocs
      .select(explode(
        graft.functions.CharNgrams.ngrams(lower(col(textCol)), n)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("cnt"))
  }

  /** Score documents against a [[charNgramModel]]: per document, total
    * n-grams, how many are KNOWN to the reference (model count ≥
    * `minCount`), the coverage fraction, and the mean reference count
    * — high coverage + high mean = text that looks like the trusted
    * corpus; gibberish and alien scripts score near zero. The model
    * BROADCASTS (a char-trigram table is bounded by |alphabet|³, tiny
    * next to any corpus), so scoring is one broadcast join + one
    * groupBy on the document id. All-integer aggregates; the two
    * ratios are single IEEE divisions of exact integers — identical
    * in any engine, no float-accumulation drift.
    * → (id, n_grams, n_known, coverage, avg_ref_cnt) */
  def coverageScore(
      docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame, n: Int = 3, minCount: Long = 1L): DataFrame = {
    // the charNgramModel kernel (r20) — documents shorter than n have
    // no grams and drop out at the explode
    val grams = docs
      .select(col(idCol).as("id"),
        explode(
          graft.functions.CharNgrams.ngrams(lower(col(textCol)), n)).as("gram"))
    grams
      .join(broadcast(model.filter(col("cnt") >= minCount)), Seq("gram"), "left")
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_grams"),
        count(col("cnt")).as("n_known"),
        coalesce(sum(col("cnt")), lit(0L)).as("_sum_cnt"))
      .select(col("id"), col("n_grams"), col("n_known"),
        (col("n_known") * 1.0 / col("n_grams")).as("coverage"),
        (col("_sum_cnt") * 1.0 / col("n_grams")).as("avg_ref_cnt"))
  }

  /** URL canonicalization (the RefinedWeb/CCNet url-dedup
    * normalization: crawls see the same page under case-varied hosts,
    * www prefixes, default ports, tracking parameters, reordered query
    * strings, fragments and trailing slashes — keep-one-per-URL only
    * works after collapsing those). Deterministic column-expression
    * chain, replayable in the DuckDB oracle (q124):
    *
    *   1. drop the fragment;
    *   2. lowercase scheme://host (ONLY — path and query stay
    *      case-sensitive), strip the scheme's OWN default port (:80
    *      after http://, :443 after https:// — a non-default port like
    *      http://h:443 is a different origin and is preserved) and a
    *      leading www.;
    *   3. strip trailing slashes off the path;
    *   4. drop tracking parameters (utm_*, fbclid, gclid, msclkid) and
    *      SORT the surviving query parameters (ASCII lexicographic —
    *      identical in both engines for the URL-safe charset).
    *
    * Canonicalization is deliberately conservative: scheme differences
    * (http vs https) and percent-encoding are preserved — conflating
    * those changes identity, not spelling. */
  def normalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val schemeHost = regexp_extract(noFrag, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*", 0)
    val rest = substring_index(noFrag, "?", 1).substr(
      length(schemeHost) + 1, length(noFrag)) // path only (pre-?)
    val path = regexp_replace(rest, "/+$", "")
    val query = regexp_extract(noFrag, "\\?([^#]*)$", 1)
    val shNorm = regexp_replace(
      regexp_replace(
        regexp_replace(lower(schemeHost), "^(http://.*):80$", "$1"),
        "^(https://.*):443$", "$1"),
      "^(https?://)www\\.", "$1")
    val params = filter(split(query, "&"), p =>
      p =!= "" && !p.rlike("^(utm_[a-zA-Z0-9_]*|fbclid|gclid|msclkid)="))
    val sortedQ = array_join(array_sort(params), "&")
    concat(shNorm, path, when(sortedQ =!= "", concat(lit("?"), sortedQ)).otherwise(lit("")))
  }

  /** Key-value extraction from structured-ish text (ref
    * llm/entity_extractor.py:189 `extract_key_values` — there an LLM
    * prompt; here the deterministic core it falls back to in spirit:
    * `Key: Value` / `Key = Value` lines, the shape of headers, config
    * blocks, form exports and log preambles). Keys normalize to
    * snake_case; the FIRST occurrence of a duplicate key wins (document
    * order, reproducible). Pure column expressions → map<string,string>.
    * Free-prose extraction stays the LLM's job — the seam, as
    * everywhere, is the schema this returns. */
  def keyValues(text: Column): Column = {
    val rx = "^\\s*([^:=\\n]{1,64}?)\\s*[:=]\\s*(.+?)\\s*$"
    val entries = filter(
      transform(split(text, "\r?\n"), l => {
        val k = regexp_extract(l, rx, 1)
        val v = regexp_extract(l, rx, 2)
        when(k =!= "" && v =!= "",
          struct(
            lower(regexp_replace(trim(k), "[^A-Za-z0-9]+", "_")).as("key"),
            v.as("value")))
      }),
      e => e.isNotNull)
    // first-wins dedup: keep entry i only if no earlier entry has its key
    val deduped = filter(entries, (e, i) =>
      !exists(slice(entries, lit(1), i), p => p.getField("key") === e.getField("key")))
    map_from_entries(deduped)
  }

  /** entity_extractor.py:193 `expected_keys` contract: one column per
    * expected key (normalized), null when absent. */
  def extractKeys(text: Column, expectedKeys: Seq[String]): Column = {
    require(expectedKeys.nonEmpty, "extractKeys needs at least one key")
    val kv = keyValues(text)
    struct(expectedKeys.map { k =>
      val norm = k.trim.toLowerCase.replaceAll("[^a-z0-9]+", "_")
      element_at(kv, norm).as(norm)
    }: _*)
  }

  // ——— Unigram LM scoring (CCNet/KenLM-style perplexity filtering) ———

  /** Fixed-point micro-nat logarithm: `floor(ln(c)·10⁶ + 0.5)` as a
    * bigint. The whole LM family computes in this grid so that log
    * arithmetic stays EXACT integer arithmetic — summation order,
    * float accumulation, and libm last-ulp differences cannot touch
    * the oracle gate. Portability was measured, not assumed: JVM
    * `Math.log` and DuckDB `ln` produce bit-identical grid values for
    * every integer argument in 1..2×10⁷ (probed exhaustively on this
    * host; corpus counts stay far below that). `floor(x+0.5)` rather
    * than `round` because the two engines' round() tie rules differ
    * in spelling — floor-of-shifted is the same primitive in both. */
  def qlog(c: Column): Column = floor(log(c) * 1e6 + 0.5).cast("long")

  /** Driver-side twin of [[qlog]] for single model constants. */
  def qlogConst(n: Long): Long = math.floor(math.log(n.toDouble) * 1e6 + 0.5).toLong

  /** Unigram language model: token → count over a reference corpus.
    * One explode + one hash groupBy with map-side partials; the output
    * is vocabulary-bounded (Heaps' law: sublinear in corpus size), so
    * downstream scoring can BROADCAST it even when the corpus itself
    * is 100 TB. → (token, cnt) */
  def unigramLm(refDocs: DataFrame, textCol: String): DataFrame =
    refDocs.select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))

  /** Laplace denominator for a [[unigramLm]] model: total tokens +
    * vocabulary + 1 (the +V+1 gives every seen type and the one
    * unseen-type bucket an add-one share). Single-row driver read. */
  def lmDenominator(model: DataFrame): Long = {
    val r = model.agg(
      coalesce(sum(col("cnt")), lit(0L)).as("t"),
      count(lit(1)).as("v")).head()
    r.getLong(0) + r.getLong(1) + 1L
  }

  /** Score documents against a [[unigramLm]]: per-token add-one
    * negative log-likelihood `qlog(D) − qlog(cnt+1)` in micro-nats
    * (D = [[lmDenominator]]), summed per document — the CCNet/KenLM
    * perplexity filter, integer-exact. Buckets follow CCNet's
    * head/middle/tail split but on FIXED avg-NLL bounds (micro-nats)
    * instead of corpus percentiles: the comparison is a single IEEE
    * division of exact integers against a literal, identical in any
    * engine, and fixed bounds make the bucket a property of the
    * document rather than of the batch it arrived in.
    *
    * Plan shape: explode → broadcast left-join (model is vocab-
    * bounded) → one groupBy on the document id with map-side partials
    * (token rows of a document are co-located with it, so partials
    * collapse to ~1 row per doc before the shuffle). `ppl` =
    * exp(avg/10⁶) is the human-readable perplexity — derived, float,
    * for API consumers; oracle-gated queries project the exact
    * columns. → (id, n_tokens, n_oov, oov_frac, sum_nll_micro,
    * avg_nll_micro, ppl, ppl_bucket) */
  def lmScore(
      docs: DataFrame, idCol: String, textCol: String, model: DataFrame,
      bucketBounds: (Double, Double) = (3.401e6, 3.404e6)): DataFrame = {
    val (headLt, middleLt) = bucketBounds
    require(headLt <= middleLt, s"bucket bounds out of order: $bucketBounds")
    val qlogD = qlogConst(lmDenominator(model))
    val toks = docs.select(col(idCol).as("id"), explode(tokens(col(textCol))).as("token"))
    toks
      .join(broadcast(model), Seq("token"), "left")
      .select(col("id"), col("cnt").isNull.as("oov"),
        (lit(qlogD) - qlog(coalesce(col("cnt"), lit(0L)) + 1L)).as("nll"))
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("oov"), 1L).otherwise(0L)).as("n_oov"),
        sum(col("nll")).as("sum_nll_micro"))
      .select(col("id"), col("n_tokens"), col("n_oov"),
        (col("n_oov") * 1.0 / col("n_tokens")).as("oov_frac"),
        col("sum_nll_micro"),
        (col("sum_nll_micro") * 1.0 / col("n_tokens")).as("avg_nll_micro"),
        exp(col("sum_nll_micro") * 1.0 / col("n_tokens") / 1e6).as("ppl"),
        when(col("sum_nll_micro") * 1.0 / col("n_tokens") < headLt, "head")
          .when(col("sum_nll_micro") * 1.0 / col("n_tokens") < middleLt, "middle")
          .otherwise("tail").as("ppl_bucket"))
  }

  /** Token-bigram counts over a reference corpus → (w1, w2, cnt).
    * UNLIKE the unigram model this is not vocabulary-bounded (unique
    * bigrams grow with the corpus, sublinearly but unboundedly), so
    * scoring joins against it are SHUFFLE joins by design — AQE may
    * still pick broadcast when the observed model is small, but the
    * plan must not require it. One explode + one hash groupBy. */
  def bigramLm(refDocs: DataFrame, textCol: String): DataFrame = {
    val tk = tokens(col(textCol))
    refDocs
      .select(tk.as("_tk"))
      .select(explode(when(size(col("_tk")) >= 2, zip_with(
        slice(col("_tk"), lit(1), size(col("_tk")) - 1),
        slice(col("_tk"), lit(2), size(col("_tk")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2"))))).as("bg"))
      .select(col("bg.w1"), col("bg.w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))
  }

  /** Interpolated bigram perplexity (the KenLM-style step past
    * [[lmScore]]'s unigram): per token, λ=½ between the bigram MLE and
    * the add-one unigram —
    *
    *   p(w | w₁) = ½·c(w₁w)/c(w₁·) + ½·(cu(w)+1)/D
    *
    * which as one fraction is `(a·D + (cu+1)·b) / (2·b·D)` with
    * a = c(w₁w), b = c(w₁·) (context total from the bigram table),
    * cu = unigram count, D = [[lmDenominator]] — integers, so the NLL
    * is `qlog(2·b·D) − qlog(a·D + (cu+1)·b)`: still EXACT micro-nat
    * arithmetic. The grid at these product magnitudes (≤ ~10¹⁵) was
    * probed on 10⁷ log-uniform random points, zero JVM/DuckDB
    * mismatches (1..2×10⁷ is exhaustive). A document's first token and
    * tokens with unseen context back off to the pure unigram term.
    *
    * Plan shape: one positional pair-explode of the scored docs; LEFT
    * joins to the bigram and context tables (shuffle-join-capable —
    * the models are NOT broadcastable at corpus scale) and a broadcast
    * left-join to the bounded unigram model; one groupBy on the doc
    * id. → (id, n_tokens, n_ctx_hits, sum_nll_micro, avg_nll_micro,
    * ppl) */
  def lmScoreBigram(
      docs: DataFrame, idCol: String, textCol: String,
      bigramModel: DataFrame, unigramModel: DataFrame): DataFrame = {
    val d = lmDenominator(unigramModel)
    val qD = qlogConst(d)
    val context = bigramModel.groupBy("w1").agg(sum(col("cnt")).as("ctx_cnt"))
    val tk = tokens(col(textCol))
    val pairs = docs
      .select(col(idCol).as("id"), tk.as("_tk"))
      .select(col("id"), explode(transform(col("_tk"), (t, i) =>
        struct(when(i > 0, element_at(col("_tk"), i)).as("w_prev"), t.as("w")))).as("p"))
      .select(col("id"), col("p.w_prev").as("w_prev"), col("p.w").as("w"))
    val uniNll = lit(qD) - qlog(coalesce(col("ucnt"), lit(0L)) + 1L)
    val a0 = coalesce(col("cnt"), lit(0L))
    val cu1 = coalesce(col("ucnt"), lit(0L)) + 1L
    val biNll = qlog(lit(2L) * col("ctx_cnt") * lit(d)) -
      qlog(a0 * lit(d) + cu1 * col("ctx_cnt"))
    pairs
      .join(bigramModel.withColumnRenamed("w1", "w_prev").withColumnRenamed("w2", "w"),
        Seq("w_prev", "w"), "left")
      .join(context.withColumnRenamed("w1", "w_prev"), Seq("w_prev"), "left")
      .join(broadcast(unigramModel.select(col("token").as("w"), col("cnt").as("ucnt"))),
        Seq("w"), "left")
      .select(col("id"),
        (col("w_prev").isNotNull && col("ctx_cnt").isNotNull).as("ctx_hit"),
        when(col("w_prev").isNull || col("ctx_cnt").isNull, uniNll)
          .otherwise(biNll).as("nll"))
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("ctx_hit"), 1L).otherwise(0L)).as("n_ctx_hits"),
        sum(col("nll")).as("sum_nll_micro"))
      .select(col("id"), col("n_tokens"), col("n_ctx_hits"), col("sum_nll_micro"),
        (col("sum_nll_micro") * 1.0 / col("n_tokens")).as("avg_nll_micro"),
        exp(col("sum_nll_micro") * 1.0 / col("n_tokens") / 1e6).as("ppl"))
  }

  /** Merge a delta corpus's counts into an existing [[unigramLm]] —
    * the daily-crawl shape for LM maintenance: count tables are
    * ADDITIVE, so the update is union + one groupBy sum (map-side
    * partials) that never rescans the old corpus; persist the model
    * (e.g. VersionedTable) and fold each batch in. Scoring stays
    * exact after any merge because [[lmDenominator]] recomputes from
    * the merged table. `unigramLm(A ∪ B) == merge(unigramLm(A),
    * unigramLm(B))` exactly — asserted in TextSpec. */
  def mergeUnigramLms(model: DataFrame, delta: DataFrame): DataFrame =
    model.unionByName(delta).groupBy("token").agg(sum(col("cnt")).as("cnt"))

  /** [[mergeUnigramLms]] for [[bigramLm]] tables (same additivity). */
  def mergeBigramLms(model: DataFrame, delta: DataFrame): DataFrame =
    model.unionByName(delta).groupBy("w1", "w2").agg(sum(col("cnt")).as("cnt"))

  /** Collect a [[unigramLm]] model into a driver map. Bounded driver
    * read by the same argument that lets [[lmScore]] broadcast: the
    * model is vocabulary-bounded (Heaps' law), not corpus-sized. */
  def lmToMap(model: DataFrame): Map[String, Long] =
    model.collect().map(r => r.getAs[String]("token") -> r.getAs[Long]("cnt")).toMap

  /** Stateless twin of [[lmScore]]: the model rides along as a map
    * LITERAL and the per-document NLL is a fold over the row's own
    * token array — no explode, no groupBy, no state. That makes it a
    * pure per-row projection that composes directly onto a streaming
    * DataFrame in append mode (the scoring-at-ingest shape: docs
    * stream in, each is scored against a frozen reference model —
    * exactly how CCNet deploys its LM filter over a crawl). Same
    * micro-nat arithmetic, bit-identical outputs to [[lmScore]] for
    * every document with ≥1 token; token-less documents are dropped
    * by both paths (explode there, an explicit filter here).
    *
    * Tradeoff vs the broadcast join: the map literal serializes into
    * the plan/task binary (fine for vocab-bounded models — a few MB;
    * use [[lmScore]] when the model is huge or reused across many
    * queries). */
  def lmScoreStateless(
      docs: DataFrame, idCol: String, textCol: String,
      modelCounts: Map[String, Long],
      bucketBounds: (Double, Double) = (3.401e6, 3.404e6)): DataFrame = {
    val (headLt, middleLt) = bucketBounds
    require(headLt <= middleLt, s"bucket bounds out of order: $bucketBounds")
    val d = modelCounts.values.sum + modelCounts.size + 1L
    val qD = qlogConst(d)
    val m = typedLit(modelCounts)
    val toks = tokens(col(textCol))
    val nll = aggregate(toks, lit(0L), (acc, t) =>
      acc + (lit(qD) - qlog(coalesce(element_at(m, t), lit(0L)) + 1L)))
    val oov = size(filter(toks, t => element_at(m, t).isNull))
    docs
      .filter(size(tokens(col(textCol))) > 0)
      .select(col(idCol).as("id"),
        size(toks).cast("long").as("n_tokens"),
        oov.cast("long").as("n_oov"),
        nll.as("sum_nll_micro"))
      .select(col("id"), col("n_tokens"), col("n_oov"),
        (col("n_oov") * 1.0 / col("n_tokens")).as("oov_frac"),
        col("sum_nll_micro"),
        (col("sum_nll_micro") * 1.0 / col("n_tokens")).as("avg_nll_micro"),
        exp(col("sum_nll_micro") * 1.0 / col("n_tokens") / 1e6).as("ppl"),
        when(col("sum_nll_micro") * 1.0 / col("n_tokens") < headLt, "head")
          .when(col("sum_nll_micro") * 1.0 / col("n_tokens") < middleLt, "middle")
          .otherwise("tail").as("ppl_bucket"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): weight each raw
    * document by `log p_target(x) − log p_raw(x)` under two unigram
    * LMs — positive means the document looks more like the target
    * distribution than the raw crawl. Same micro-nat grid as
    * [[lmScore]], so the weight is an exact bigint:
    * `Σ_t [qlog(c_tgt+1) − qlog(c_raw+1)] + n·[qlog(D_raw) − qlog(D_tgt)]`.
    *
    * The two models full-outer-join FIRST (both vocab-bounded, so the
    * merged table is too) and the merge broadcasts once — one
    * broadcast join on the token stream instead of two. One groupBy
    * on the document id ends the plan. → (id, n_tokens, weight_micro) */
  def dsirWeights(
      docs: DataFrame, idCol: String, textCol: String,
      targetModel: DataFrame, rawModel: DataFrame): DataFrame = {
    val perTokenShift = qlogConst(lmDenominator(rawModel)) - qlogConst(lmDenominator(targetModel))
    val merged = targetModel.select(col("token"), col("cnt").as("ct"))
      .join(rawModel.select(col("token"), col("cnt").as("cr")), Seq("token"), "full_outer")
    docs.select(col(idCol).as("id"), explode(tokens(col(textCol))).as("token"))
      .join(broadcast(merged), Seq("token"), "left")
      .select(col("id"),
        (qlog(coalesce(col("ct"), lit(0L)) + 1L)
          - qlog(coalesce(col("cr"), lit(0L)) + 1L)
          + lit(perTokenShift)).as("w"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("w")).as("weight_micro"))
  }

  /** CCNet proper buckets documents by corpus PERCENTILES of the LM
    * score; [[lmScore]] takes fixed bounds so the bucket is a
    * document property. This bridges the two: one approxQuantile pass
    * over a scored (sample) frame yields the percentile bounds to
    * pass as `bucketBounds` — calibrate once on a reference batch,
    * then score every later batch (or stream) against frozen bounds.
    * Bounded driver read (two doubles). */
  def calibrateBuckets(
      scored: DataFrame, headFrac: Double = 1.0 / 3, middleFrac: Double = 2.0 / 3,
      relErr: Double = 0.001): (Double, Double) = {
    require(headFrac < middleFrac, s"fracs out of order: $headFrac, $middleFrac")
    val qs = scored.stat.approxQuantile("avg_nll_micro", Array(headFrac, middleFrac), relErr)
    // approxQuantile returns an EMPTY array (not nulls) on an empty frame
    require(qs.length == 2,
      "calibrateBuckets needs a non-empty scored frame (approxQuantile saw no rows)")
    (qs(0), qs(1))
  }

  /** CCNet-faithful percentile bucketing (Wenzek et al. 2020 §4.3
    * split Common Crawl into head/middle/tail thirds of the
    * per-LANGUAGE perplexity distribution): one percent_rank window
    * per group over a scored frame — the EXACT, oracle-replayable
    * assignment. percent_rank = (rank−1)/(n−1) is a single IEEE
    * division, and ties share a rank, so the bucket is deterministic
    * across engines and shuffle orders.
    *
    * Scale: the window range-sorts each group partition — one
    * exchange + sort over (group, value), rows are the scored frame's
    * slim columns. That is the audit/oracle path; at corpus scale
    * freeze bounds once via [[calibrateBuckets]] (approxQuantile) and
    * bucket every later batch or stream with a narrow comparison —
    * the q40/q40a exact-vs-production stance.
    * → scored + (pct, pct_bucket) */
  def bucketByPercentile(
      scored: DataFrame, valueCol: String, groupCols: Seq[String],
      headFrac: Double = 1.0 / 3, middleFrac: Double = 2.0 / 3): DataFrame = {
    require(headFrac < middleFrac, s"fracs out of order: $headFrac, $middleFrac")
    val w =
      (if (groupCols.isEmpty) org.apache.spark.sql.expressions.Window.partitionBy()
       else org.apache.spark.sql.expressions.Window.partitionBy(groupCols.map(col): _*))
        .orderBy(col(valueCol))
    scored
      .withColumn("pct", percent_rank().over(w))
      .withColumn("pct_bucket",
        when(col("pct") < headFrac, "head")
          .when(col("pct") < middleFrac, "middle")
          .otherwise("tail"))
  }

  // ——— Mergeable quantile census (the daily-crawl twin of calibrateBuckets) ———

  /** Additive quantile census: histogram scores onto fixed-width
    * buckets of the micro-nat grid — `bucket = floor(value / width)`,
    * one count per occupied bucket. This is the MERGEABLE store behind
    * [[calibrateBuckets]]: where approxQuantile freezes bounds from
    * one pass over one reference batch, a census is additive under
    * union ([[mergeQuantileCensus]]) — each day's crawl folds its own
    * histogram into the store and the percentile bounds
    * ([[censusBounds]]) re-derive from the running total, the same
    * daily-crawl contract as the domain/postings/adjacency/gram
    * stores.
    *
    * Scale: one narrow projection + one groupBy whose output is
    * RANGE-bounded — (score span / width) buckets regardless of corpus
    * size (avg-NLL lives in a few-thousand-micro-nat band, so the
    * default 1 milli-nat width yields tens-to-hundreds of rows) — so
    * the store never grows with the corpus and the merge shuffles a
    * constant-size frame. All arithmetic is the micro-nat grid's: the
    * value is an exact-integer-valued IEEE division, `/ width` and
    * `floor` are single IEEE ops, so the census replays bit-for-bit in
    * DuckDB (the q129 stance). → (bucket, cnt) */
  def quantileCensus(
      scored: DataFrame, valueCol: String = "avg_nll_micro",
      bucketWidthMicro: Long = 1000L): DataFrame = {
    require(bucketWidthMicro > 0, s"bucket width must be positive: $bucketWidthMicro")
    scored.select(floor(col(valueCol) / bucketWidthMicro.toDouble).cast("long").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Fold a delta census into a store census: union + one groupBy sum
    * over the range-bounded bucket key. merge(census(A), census(B)) ==
    * census(A ∪ B) exactly — counts are integers and the bucket
    * function is deterministic — which is the oracle invariant the
    * q199 gate replays (the q169/q186 pattern). */
  def mergeQuantileCensus(store: DataFrame, delta: DataFrame): DataFrame =
    store.unionByName(delta).groupBy("bucket").agg(sum(col("cnt")).as("cnt"))

  /** Cumulative view of a census: running count in bucket order plus
    * the grand total. Both windows are unpartitioned BY DESIGN — the
    * census is range-bounded (corpus-independent row count), so the
    * single-partition sort is a bounded constant, not the funnel the
    * WindowExec warning exists for. → census + (cum_cnt, total) */
  def censusPercentiles(census: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    census
      .withColumn("cum_cnt", sum(col("cnt")).over(Window.orderBy(col("bucket"))))
      .withColumn("total", sum(col("cnt")).over(Window.partitionBy()))
  }

  /** Percentile bounds from a census: for each frac, the smallest
    * bucket whose cumulative count reaches `ceil(frac·total)`; the
    * bound is that bucket's EXCLUSIVE upper edge `(bucket+1)·width`,
    * so `value < bound` admits at least `ceil(frac·total)` of the
    * censused mass and overshoots by at most the boundary bucket's
    * population — bucket-width granularity, the declared precision of
    * the census. The inequality join is a broadcast nested loop of a
    * |fracs|-row frame against the bounded census — constant work.
    * → (frac, bound_bucket, bound_micro, total) */
  def censusBounds(
      census: DataFrame, fracs: Seq[Double] = Seq(1.0 / 3, 2.0 / 3),
      bucketWidthMicro: Long = 1000L): DataFrame = {
    require(fracs.nonEmpty && fracs.forall(f => f > 0 && f < 1),
      s"fracs must be in (0,1): $fracs")
    val spark = census.sparkSession
    import spark.implicits._
    censusPercentiles(census)
      .join(broadcast(fracs.toDF("frac")),
        col("cum_cnt") >= ceil(col("frac") * col("total")))
      .groupBy("frac")
      .agg(min(col("bucket")).as("bound_bucket"), max(col("total")).as("total"))
      .select(col("frac"), col("bound_bucket"),
        ((col("bound_bucket") + 1L) * bucketWidthMicro).cast("double").as("bound_micro"),
        col("total"))
  }

  /** Drop-in for [[calibrateBuckets]] that reads a (merged) census
    * instead of re-scanning scores: the frozen (head, middle) bounds
    * for [[lmScore]]'s `bucketBounds`, at bucket-width granularity.
    * Bounded driver read (two rows). */
  def calibrateBucketsFromCensus(
      census: DataFrame, headFrac: Double = 1.0 / 3, middleFrac: Double = 2.0 / 3,
      bucketWidthMicro: Long = 1000L): (Double, Double) = {
    require(headFrac < middleFrac, s"fracs out of order: $headFrac, $middleFrac")
    val m = censusBounds(census, Seq(headFrac, middleFrac), bucketWidthMicro)
      .collect().map(r => r.getDouble(0) -> r.getDouble(2)).toMap
    (m(headFrac), m(middleFrac))
  }

  /** The census with each bucket labeled by the frozen-bounds
    * assignment: head iff bucket ≤ head bound bucket, middle iff ≤
    * middle bound bucket — exactly how a score classified against
    * [[censusBounds]]' exclusive upper edges lands. This is the q199
    * gate's output surface: per-bucket counts, the running cumulative,
    * and the label all replay exactly in SQL. → (bucket, cnt, cum_cnt,
    * total, pct_bucket) */
  def censusLabeled(
      census: DataFrame, headFrac: Double = 1.0 / 3, middleFrac: Double = 2.0 / 3,
      bucketWidthMicro: Long = 1000L): DataFrame = {
    require(headFrac < middleFrac, s"fracs out of order: $headFrac, $middleFrac")
    val b = censusBounds(census, Seq(headFrac, middleFrac), bucketWidthMicro)
      .groupBy()
      .agg(
        min(when(col("frac") === headFrac, col("bound_bucket"))).as("head_b"),
        min(when(col("frac") === middleFrac, col("bound_bucket"))).as("middle_b"))
    censusPercentiles(census)
      .crossJoin(broadcast(b))
      .select(col("bucket"), col("cnt"), col("cum_cnt"), col("total"),
        when(col("bucket") <= col("head_b"), "head")
          .when(col("bucket") <= col("middle_b"), "middle")
          .otherwise("tail").as("pct_bucket"))
  }

  /** Single-pass alternative to [[dsirSelect]]: keep documents whose
    * importance weight clears a FIXED threshold. No count, no
    * ordering — a narrow filter that composes onto a stream and
    * avoids top-k's extra scoring pass; obtain the threshold from a
    * calibration batch (e.g. approxQuantile over weight_micro), the
    * same freeze-then-apply pattern as [[calibrateBuckets]]. */
  def dsirSelectByThreshold(scored: DataFrame, minWeightMicro: Long): DataFrame =
    scored.filter(col("weight_micro") >= minWeightMicro)

  /** Keep the `frac` best-weighted documents from [[dsirWeights]]
    * output (deterministic DSIR: top-k by weight, document id breaking
    * ties — the paper's Gumbel noise is sampling flavor, the selection
    * mechanics are identical). For k under Spark's
    * topKSortFallbackThreshold the plan is TakeOrdered (per-partition
    * local top-k, only k rows move); for larger k Spark falls back to
    * a distributed range-partitioned sort + limit — correct but a
    * full sort of the scored frame. At corpus scale prefer
    * [[dsirSelectByThreshold]] with a calibrated cutoff: one narrow
    * filter, no ordering at all. The doc count is a single-row driver
    * read; k is capped at Int.MaxValue. */
  def dsirSelect(scored: DataFrame, frac: Double, idCol: String = "id"): DataFrame = {
    require(frac > 0 && frac <= 1, s"frac must be in (0,1], got $frac")
    val n = scored.count()
    val k = math.ceil(n * frac).min(Int.MaxValue.toDouble).toInt
    scored.orderBy(col("weight_micro").desc, col(idCol)).limit(k)
  }

  /** Per-group corpus statistics — the reporting surface of a corpus
    * pipeline (docs, tokens, vocabulary, type-token ratio, mean doc
    * length per source/shard/snapshot). Two aggregation legs joined
    * on the (bounded-cardinality) group key:
    *
    *   - doc leg: narrow per-row token counts → one groupBy with
    *     map-side partials (n_docs, total_tokens, total_chars);
    *   - vocab leg: per-doc DISTINCT tokens explode → (group, token)
    *     distinct → count. Expand-free exact distinct (the q40-family
    *     lesson: `countDistinct` alongside other aggs plans an Expand
    *     that multiplies the input; two cheap hash shuffles beat one
    *     row-multiplying plan at corpus scale).
    *
    * `exact = false` swaps the vocab leg for approx_count_distinct
    * (HLL++, one pass, no second shuffle) — the 100 TB default, where
    * a ±2% vocabulary estimate is indistinguishable for reporting.
    * Ratios are single IEEE divisions of exact integers (oracle-safe
    * in the exact path). → (group, n_docs, total_tokens, total_chars,
    * vocab, avg_doc_tokens, type_token_ratio) */
  def corpusStats(
      docs: DataFrame, groupCol: String, textCol: String,
      exact: Boolean = true): DataFrame = {
    val toks = tokens(col(textCol))
    val docLeg = docs
      .select(col(groupCol).as("group"), size(toks).cast("long").as("n_toks"),
        length(col(textCol)).cast("long").as("n_chars"))
      .groupBy("group")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("total_tokens"),
        sum(col("n_chars")).as("total_chars"))
    val vocabLeg =
      if (exact)
        docs.select(col(groupCol).as("group"),
            explode(array_distinct(toks)).as("token"))
          .distinct()
          .groupBy("group").agg(count(lit(1)).as("vocab"))
      else
        docs.select(col(groupCol).as("group"), explode(array_distinct(toks)).as("token"))
          .groupBy("group").agg(approx_count_distinct(col("token")).as("vocab"))
    docLeg.join(vocabLeg, Seq("group"), "left")
      .select(col("group"), col("n_docs"), col("total_tokens"), col("total_chars"),
        coalesce(col("vocab"), lit(0L)).as("vocab"),
        (col("total_tokens") * 1.0 / col("n_docs")).as("avg_doc_tokens"),
        (coalesce(col("vocab"), lit(0L)) * 1.0 / col("total_tokens")).as("type_token_ratio"))
  }

  /** Pairwise corpus-overlap estimation via KMV sketches (Beyer et
    * al. 2007 "On synopses for distinct-value estimation under
    * multiset operations"; Bar-Yossef et al. 2002 for the k-minimum-
    * values idea): how much do two crawls/dumps/sources share WITHOUT
    * joining them — per group keep the k smallest 60-bit md5 content
    * hashes of its distinct texts; for a pair, the Jaccard estimate
    * is the both-members share among the k smallest hashes of the
    * sketch UNION. Every step is integer/hash arithmetic on the SAME
    * deterministic hash ([[graft.dedup.TextDedup.gramId]]'s md5
    * construction), so the estimate — unlike an HLL's — replays
    * bit-for-bit in an external oracle, and sketches are mergeable
    * artifacts a daily pipeline can persist per dump.
    *
    * Scale shape: one distinct (group, hash) projection + one
    * per-group ascending-hash top-k window (WindowGroupLimit heaps —
    * a billion-doc source reduces to k rows before any exchange);
    * the pair stage touches only #groups² · k sketch rows, with
    * #groups the bounded source/dump count. The corpus text never
    * shuffles — hashes do. → (g1, g2, k_used, n_both, jaccard_est)
    */
  def corpusOverlap(
      df: DataFrame, groupCol: String, textCol: String, k: Int = 64): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = org.apache.spark.sql.expressions.Window
    val sk = df
      .select(col(groupCol).as("g"),
        conv(substring(md5(col(textCol)), 1, 15), 16, 10).cast("long").as("h"))
      .distinct()
      .withColumn("_rn", row_number().over(w.partitionBy(col("g")).orderBy(col("h"))))
      .filter(col("_rn") <= k).drop("_rn")
      .localCheckpoint(true) // feeds the group list and both pair legs
    val gs = sk.select(col("g")).distinct()
    val pairs = gs.select(col("g").as("g1"))
      .join(gs.select(col("g").as("g2")), col("g1") < col("g2"))
    val memA = pairs.join(sk.select(col("g").as("g1"), col("h")), Seq("g1"))
      .select(col("g1"), col("g2"), col("h"), lit(1L).as("_a"), lit(0L).as("_b"))
    val memB = pairs.join(sk.select(col("g").as("g2"), col("h")), Seq("g2"))
      .select(col("g1"), col("g2"), col("h"), lit(0L).as("_a"), lit(1L).as("_b"))
    memA.unionByName(memB)
      .groupBy(col("g1"), col("g2"), col("h"))
      .agg(max(col("_a")).as("_a"), max(col("_b")).as("_b"))
      .withColumn("_rn", row_number().over(
        w.partitionBy(col("g1"), col("g2")).orderBy(col("h"))))
      .filter(col("_rn") <= k)
      .groupBy(col("g1"), col("g2"))
      .agg(count(lit(1)).as("k_used"),
        sum(when(col("_a") === 1L && col("_b") === 1L, 1L).otherwise(0L)).as("n_both"))
      .withColumn("jaccard_est", col("n_both").cast("double") / col("k_used"))
  }

  /** Per-document top-k keywords by tf·idf, integer-exact: idf_micro =
    * qlog(N+1) − qlog(df+1) (micro-nats, N = corpus size, df =
    * document frequency), score = tf · idf_micro (bigint). Emits one
    * row per (document, rank) — rank by (score desc, token asc), fully
    * deterministic, no array-ordering ambiguity. The df model comes
    * from one distinct-explode groupBy (vocab-bounded → broadcast);
    * tf is one (id, token) groupBy with map-side partials; the final
    * rank is a window partitioned by document id — hash-partitioned,
    * no global ordering. → (id, rank, token, tf, idf_micro, score) */
  def tfidfKeywords(
      docs: DataFrame, idCol: String, textCol: String, k: Int = 3,
      nDocsHint: Option[Long] = None): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // nDocsHint skips the counting pass when the caller already knows
    // the corpus size (a catalog statistic, a prior stage's count) —
    // at 100 TB the count is a full scan worth avoiding
    val nDocs = nDocsHint.getOrElse(docs.count())
    val qlogN1 = qlogConst(nDocs + 1L)
    val df = docs
      .select(col(idCol).as("id"), explode(array_distinct(tokens(col(textCol)))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("df"))
      .select(col("token"), (lit(qlogN1) - qlog(col("df") + 1L)).as("idf_micro"))
    val tf = docs
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("token"))
      .groupBy("id", "token").agg(count(lit(1)).as("tf"))
    val rankW = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("score").desc, col("token"))
    tf.join(broadcast(df), Seq("token"))
      .select(col("id"), col("token"), col("tf"), col("idf_micro"),
        (col("tf") * col("idf_micro")).as("score"))
      .withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= k)
      .select(col("id"), col("rank"), col("token"), col("tf"), col("idf_micro"), col("score"))
  }
}
