package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text deduplication: exact, set-Jaccard, MinHash+LSH, SimHash.
  *
  * Scale design (SURVEY §4): the brute-force Jaccard join
  * ([[jaccardPairs]]) is the semantics baseline — it explodes on hub
  * items and exists to oracle-check the approximate paths. The scale
  * path is [[minhashLshPairs]]: signatures shrink each document to k
  * integers (one shuffle with map-side partial min), LSH banding
  * shuffles signatures — not documents — on (band, signature), and
  * verification touches candidate pairs only ([[verifyJaccard]] is
  * candidate-bounded: it never joins set×set on items).
  *
  * All hash arithmetic is pure 64-bit integer math over md5-derived
  * 32-bit item ids — reproducible in any engine, no engine-native hash
  * in any cross-checked path.
  */
object TextDedup {

  val MinhashPrime = 2147483647L // 2^31 − 1, Mersenne

  /** Default ABSOLUTE document-frequency universe cut shared by every
    * banded signing/probe path ([[minhashLshPairs]],
    * [[containmentPairsBanded]], [[removeContained]]) AND their DuckDB
    * oracles — DedupQueries interpolates THIS constant into the replay
    * SQL, so the Spark default and the oracle literal cannot desync
    * (r16 ADVICE). Items seen in more than this many documents are
    * excluded from signatures and probes (they carry no identifying
    * signal and their df ∝ N fan-out is the measured quadratic term —
    * see the r16 scaladoc on each consumer); exact verification still
    * counts every item. MIGRATION NOTE (r16 behavior change): before
    * r16 the containment probe was hash-random with hotItemMaxDf =
    * 100000 and minhash signed the full universe — callers relying on
    * recall for sets whose overlap lives ONLY in items with df > this
    * cut must pass an explicit higher cut (and accept the measured
    * super-linear growth) or pre-filter; [[hotOnlyProbeSets]] makes
    * zero-candidate outcomes diagnosable. */
  val DefaultMaxItemDf = 1000L

  /** Diagnosability hook for the [[DefaultMaxItemDf]] universe cut: the
    * ids in `sets` with NO item at df ≤ `maxItemDf` — sets that
    * generate zero banded candidates BY CONSTRUCTION (every shingle is
    * boilerplate-hot), so a silent empty result is distinguishable
    * from a genuine no-duplicates answer. Run it beside a banded path
    * when auditing recall; same two groupBys the cut itself costs.
    * → (id, n_items) for the hot-only sets. */
  def hotOnlyProbeSets(sets: DataFrame, maxItemDf: Long = DefaultMaxItemDf): DataFrame = {
    val freq = sets.groupBy("item").agg(count(lit(1)).as("_df"))
    sets.join(freq, "item")
      .groupBy("id")
      .agg(count(lit(1)).as("n_items"), min(col("_df")).as("_minDf"))
      .filter(col("_minDf") > maxItemDf)
      .select(col("id"), col("n_items"))
  }

  /** Lowercased alphanumeric tokens, one row per DISTINCT (id, token).
    * Tokenization runs in the fused [[graft.functions.WordNgrams]]
    * kernel (r20, guide §4): one lowercase + one byte scan per row,
    * no regex, no interpreted filter lambda. Null text explodes to
    * nothing, as before. */
  def tokenSets(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        explode(graft.functions.WordNgrams.ngrams(col(textCol), 1)).as("item"))
      .distinct()

  /** Word n-gram shingles, one row per DISTINCT (id, shingle) — the
    * fused [[graft.functions.WordNgrams]] kernel (r20, guide §4): the
    * column-algebra form it replaces (retained as [[shingleItemsHof]],
    * the spec twin DedupSpec pins bit-for-bit) paid a regex split, a
    * token-array allocation, and one interpreted higher-order lambda
    * dispatch per shingle. Rows with fewer than n tokens explode to
    * nothing, exactly like the old size(ws) >= n pre-filter. */
  def shingleSets(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("id"),
        explode(graft.functions.WordNgrams.ngrams(col(textCol), n)).as("item"))
      .distinct()

  /** The column-algebra twin of the [[graft.functions.WordNgrams]]
    * kernel — the spec pin's reference formulation (and the shape for
    * engines without expression extension points): n-grams of the
    * regex-split lowercased tokens, empty array below n tokens. */
  private[graft] def shingleItemsHof(text: Column, n: Int): Column = {
    val ws = filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")
    if (n == 1) ws
    else
      when(size(ws) >= n,
        transform(sequence(lit(1), size(ws) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(j => element_at(ws, i + j)): _*)))
        .otherwise(array().cast("array<string>"))
  }

  /** Corpus-level boilerplate-line analysis (the RefinedWeb/CCNet
    * line-dedup family: a line recurring across many documents —
    * navigation, footers, cookie banners — is boilerplate, and a
    * document dominated by such lines is template spam). Per document:
    * total lines, lines appearing in ≥ `minDocs` DISTINCT documents,
    * the boilerplate fraction, and the `passes` verdict
    * (fraction ≤ `maxBoilerplateFrac`).
    *
    * Genuinely distributed, unlike the per-row q97/q98/q117/q118
    * filters: docs explode to DISTINCT (id, line) pairs, line
    * df-counts come from ONE hash groupBy on the line (map-side
    * partial count — duplicate lines collapse before the shuffle,
    * which is exactly what makes this survive a 100 TB corpus where
    * the hot boilerplate lines appear in billions of documents), and
    * the per-doc rollup is a second groupBy on id. The line-frequency
    * table scales with the corpus, so it is never broadcast wholesale.
    *
    * The count REJOIN on `line` is the one skewed-key join in the
    * pipeline: a universal footer lands its entire (id, line) group on
    * one reducer. AQE's skew split CANNOT save this join — the
    * aggregated side reuses its groupBy exchange, so the merge join's
    * right child is agg-over-stage, not a bare shuffle stage, and
    * `OptimizeSkewedJoin`'s pattern never matches (verified: the same
    * data splits a plain join but never this shape). The fix is
    * structural hot/cold routing: lines in ≥ `hotLineMinDocs` docs are
    * a BOUNDED set (≤ |corpus lines| / hotLineMinDocs, by counting) —
    * broadcast them, route their rows through a narrow broadcast join,
    * anti-join them off the sort-merge path. The residual join's
    * groups are < hotLineMinDocs rows each: skew-free by construction. */
  def boilerplateLines(
      df: DataFrame, idCol: String, textCol: String,
      minDocs: Int = 2, maxBoilerplateFrac: Double = 0.3,
      hotLineMinDocs: Int = 100000): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    require(hotLineMinDocs >= 2, s"hotLineMinDocs must be >= 2, got $hotLineMinDocs")
    val docLines = df.select(col(idCol).as("id"),
        explode(filter(transform(split(col(textCol), "\r?\n"), l => trim(l)), l => l =!= ""))
          .as("line"))
      .distinct() // a line repeated WITHIN a doc counts one doc
    val lineDocs = docLines.groupBy("line")
      .agg(count(lit(1)).as("_n_docs")) // distinct by construction
    val rollup = graft.ops.Skew.hotColdJoin(docLines, lineDocs, "line", "_n_docs", hotLineMinDocs)
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_lines"),
        count(when(col("_n_docs") >= minDocs, 1)).as("n_boilerplate_lines"))
    // A document whose text has no non-empty lines vanishes at the
    // explode; rejoin the universe so it appears with 0 lines and
    // passes=true — the same never-silently-dropped discipline as
    // [[contamination]].
    df.select(col(idCol).as("id"))
      .join(rollup, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("n_boilerplate_lines"), lit(0L)).as("n_boilerplate_lines"),
        coalesce(col("n_boilerplate_lines") * 1.0 / col("n_lines"), lit(0.0)).as("boilerplate_frac"),
        coalesce(col("n_boilerplate_lines") * 1.0 / col("n_lines") <= maxBoilerplateFrac,
          lit(true)).as("passes"))
  }

  /** Benchmark decontamination (the published pretraining hygiene
    * check: a training document sharing any long word n-gram with an
    * evaluation benchmark is contaminated — GPT-3 App. C / PaLM use
    * 13-gram collision). Per training document: shared-n-gram count
    * and the contaminated verdict (`n_shared ≥ minCollisions`); clean
    * documents appear with 0, never silently dropped.
    *
    * Scale shape: the benchmark side is SMALL by nature (eval suites
    * are thousands of documents, not billions), so its distinct
    * n-gram set BROADCASTS and the whole check is one broadcast
    * semi-join + one groupBy on the training side — no shuffle of the
    * corpus's n-grams, no join skew (hot n-grams hit a hash map, not
    * a reducer). */
  def contamination(
      docs: DataFrame, evalDocs: DataFrame,
      idCol: String, textCol: String,
      n: Int = 13, minCollisions: Int = 1): DataFrame = {
    require(minCollisions >= 1, s"minCollisions must be >= 1, got $minCollisions")
    val train = shingleSets(docs, idCol, textCol, n)
    val evalGrams = shingleSets(evalDocs, idCol, textCol, n)
      .select("item").distinct()
    val overlaps = train.join(broadcast(evalGrams), "item")
      .groupBy("id").agg(count(lit(1)).as("_n"))
    docs.select(col(idCol).as("id"))
      .join(overlaps, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("_n"), lit(0L)).as("n_shared_ngrams"),
        (coalesce(col("_n"), lit(0L)) >= minCollisions).as("contaminated"))
  }

  /** 60-bit md5-derived gram id: 15 hex chars < 2^63, portable to any
    * engine. Collision odds stay negligible past billions of distinct
    * grams (birthday bound √2^60 ≈ 10^9); a trillion-gram corpus
    * should widen to two longs. */
  def gramId(g: Column): Column =
    conv(substring(md5(g), 1, 15), 16, 10).cast("long")

  /** Cross-document repeated-substring span analysis — the
    * substring-level dedup family (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better": any ≥k-token
    * substring occurring more than once in the corpus is memorizable
    * boilerplate). The suffix-array construction is a single-machine
    * design; the shuffle-native equivalent is positional rolling
    * k-grams: a token position is *duplicated* iff some k-gram
    * covering it occurs ≥ `minCount` times corpus-wide — exactly the
    * positions a suffix-array pass over ≥k-length repeats would mark.
    * Per document: token count, duplicated-token count, number of
    * maximal duplicated spans, duplicated fraction, and the `passes`
    * verdict (fraction ≤ `maxDupFrac`). Docs with < k tokens (or no
    * tokens) appear with 0 — never silently dropped.
    *
    * Scale shape: grams explode once (narrow), corpus-wide counts come
    * from ONE hash groupBy on the 60-bit gram id (map-side partials
    * collapse hot boilerplate pre-shuffle), and the count rejoin rides
    * [[graft.ops.Skew.hotColdJoin]] — the same attach-aggregate shape
    * as [[boilerplateLines]], where AQE's skew split provably never
    * fires; grams in ≥ `hotGramMinCount` occurrences are a bounded,
    * broadcastable set. The span merge is a per-doc sorted fold over
    * duplicated starts (bounded by document length, like q117's
    * repetition fold). Reference has no counterpart (training-pipeline
    * extension). */
  /** Tokenized docs with position-stamped k-gram ids, materialized
    * once (the gram lineage feeds five consumers — the counts
    * aggregate and hotColdJoin's three probe legs — with
    * non-identical subtrees ReusedExchange cannot collapse: the
    * jaccardPairsItemJoin/simhash checkpoint discipline). `portable`
    * picks md5-derived 60-bit ids (cross-engine replayable, the
    * oracle path) vs codegen'd xxhash64 straight over the k token
    * columns — no gram string is ever built (the production default;
    * measured 1.4× end-to-end on the 50k-doc Zipf corpus, and the
    * saving grows with k since the portable path's concat+md5 cost is
    * linear in gram bytes). */
  private def gramRows(
      docs: DataFrame, k: Int, portable: Boolean,
      checkpoint: Boolean = true): DataFrame = {
    val rows = docs.filter(col("n_tokens") >= k)
      .select(col("id"), explode(transform(
        sequence(lit(1), col("n_tokens") - (k - 1)),
        i => {
          val toks = (0 until k).map(j => element_at(col("_ws"), i + j))
          val gid = if (portable) gramId(concat_ws(" ", toks: _*)) else xxhash64(toks: _*)
          struct(i.as("s"), gid.as("g"))
        })).as("_sg"))
      .select(col("id"), col("_sg.s").as("s"), col("_sg.g").as("g"))
    if (checkpoint) rows.localCheckpoint(true) else rows
  }

  /** Shared stats kernel: merge each doc's duplicated-start intervals
    * [s, s+k−1] into coverage islands with a sorted fold. Sorted
    * starts are strictly increasing, so each start either opens a new
    * span (a coverage GAP: s > end + 1 — merely non-overlapping
    * intervals that abut at s = end + 1 still produce contiguous
    * covered tokens) or extends the current one by exactly
    * s + k − 1 − end tokens.
    * → (id, n_tokens, n_dup_tokens, n_spans, dup_frac, passes) */
  private def spanStats(
      docs: DataFrame, dupStarts: DataFrame, k: Int, maxDupFrac: Double): DataFrame = {
    val perDoc = dupStarts.groupBy("id")
      .agg(array_sort(collect_list(col("s"))).as("_ss"))
      .select(col("id"), aggregate(col("_ss"),
        struct(lit(0L).as("cov"), lit(0L).as("spans"), lit(-2L).as("end")),
        (acc, s0) => {
          val s = s0.cast("long")
          val isNew = s > acc.getField("end") + 1
          struct(
            (acc.getField("cov") +
              when(isNew, lit(k.toLong)).otherwise(s + (k - 1) - acc.getField("end"))).as("cov"),
            (acc.getField("spans") + when(isNew, lit(1L)).otherwise(lit(0L))).as("spans"),
            (s + (k - 1)).as("end"))
        }).as("_m"))
      .select(col("id"), col("_m.cov").as("n_dup_tokens"), col("_m.spans").as("n_spans"))
    val frac = coalesce(col("n_dup_tokens"), lit(0L)).cast("double") / col("n_tokens")
    docs.select(col("id"), col("n_tokens").cast("long").as("n_tokens"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id"), col("n_tokens"),
        coalesce(col("n_dup_tokens"), lit(0L)).as("n_dup_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        when(col("n_tokens") === 0, lit(0.0)).otherwise(frac).as("dup_frac"),
        (when(col("n_tokens") === 0, lit(0.0)).otherwise(frac) <= maxDupFrac).as("passes"))
  }

  /** Shared trim kernel: cut every token covered by an interval
    * [s, s+k−1] from `starts` (id, s); uncovered tokens survive in
    * document order. → (id, text, n_tokens, n_kept_tokens) */
  private def trimByStarts(docs: DataFrame, starts: DataFrame, k: Int): DataFrame = {
    val perDoc = starts.groupBy("id").agg(array_sort(collect_list(col("s"))).as("_ss"))
    docs.join(perDoc, Seq("id"), "left")
      .select(col("id"), col("_ws"), col("n_tokens"),
        coalesce(col("_ss"), array().cast("array<int>")).as("_ss"))
      .select(col("id"), col("n_tokens"),
        filter(transform(col("_ws"), (t, i) => struct((i + 1).as("p"), t.as("t"))),
          pt => !exists(col("_ss"),
            s => s <= pt.getField("p") && pt.getField("p") <= s + (k - 1)))
          .as("_kept"))
      .select(col("id"),
        concat_ws(" ", transform(col("_kept"), pt => pt.getField("t"))).as("text"),
        col("n_tokens").cast("long").as("n_tokens"),
        size(col("_kept")).cast("long").as("n_kept_tokens"))
  }

  def repeatedSpans(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, minCount: Long = 2, maxDupFrac: Double = 0.5,
      hotGramMinCount: Long = 100000, portable: Boolean = false): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    require(minCount >= 2, s"minCount must be >= 2, got $minCount")
    val ws = filter(split(lower(col(textCol)), "[^a-z0-9]+"), t => t =!= "")
    val docs = df.select(col(idCol).as("id"), ws.as("_ws"))
      .select(col("id"), col("_ws"), size(col("_ws")).as("n_tokens"))
    val grams = gramRows(docs, k, portable)
    val counts = grams.groupBy("g")
      .agg(count(lit(1)).as("_gcnt"))
      .filter(col("_gcnt") >= minCount)
    val dupStarts =
      graft.ops.Skew.hotColdJoin(grams, counts, "g", "_gcnt", hotGramMinCount)
        .select("id", "s")
    spanStats(docs, dupStarts, k, maxDupFrac)
  }

  /** Companion to [[repeatedSpans]]: rebuilds each document's text
    * with every duplicated span removed (the Lee et al. remediation —
    * cut the repeated substring, keep the document). A token survives
    * iff no duplicated k-gram covers it; `(id, text, n_tokens,
    * n_kept_tokens)`, text lowercased/token-joined like the analysis.
    * The per-token membership test walks the doc's own duplicated
    * starts (bounded by doc length — same per-row discipline as the
    * span fold; `exists` over a sorted array the optimizer keeps
    * inside codegen). */
  def trimRepeatedSpans(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, minCount: Long = 2,
      hotGramMinCount: Long = 100000, portable: Boolean = false): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    require(minCount >= 2, s"minCount must be >= 2, got $minCount")
    val ws = filter(split(lower(col(textCol)), "[^a-z0-9]+"), t => t =!= "")
    val docs = df.select(col(idCol).as("id"), ws.as("_ws"))
      .select(col("id"), col("_ws"), size(col("_ws")).as("n_tokens"))
    val grams = gramRows(docs, k, portable)
    val counts = grams.groupBy("g")
      .agg(count(lit(1)).as("_gcnt"))
      .filter(col("_gcnt") >= minCount)
    val dupStarts =
      graft.ops.Skew.hotColdJoin(grams, counts, "g", "_gcnt", hotGramMinCount)
        .select("id", "s")
    trimByStarts(docs, dupStarts, k)
  }

  /** Gram-count store builder for [[incrementalRepeatedSpans]] — the
    * persistable corpus state of substring-level dedup. Counts
    * SATURATE at `cap` (= the minCount the queries will ask): the
    * store only ever answers "has this gram been seen ≥ minCount
    * times", so a universal footer gram stores `cap`, not billions —
    * the store is bounded by DISTINCT grams, and every row is two
    * longs. Persist bucketed by `g` ([[graft.sources.Sinks]]) so the
    * per-batch probe join never reshuffles the store.
    * → (g, cnt) */
  def gramCountStore(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, cap: Long = 2, portable: Boolean = false): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    require(cap >= 1, s"cap must be positive, got $cap")
    val ws = filter(split(lower(col(textCol)), "[^a-z0-9]+"), t => t =!= "")
    val docs = df.select(col(idCol).as("id"), ws.as("_ws"))
      .select(col("id"), col("_ws"), size(col("_ws")).as("n_tokens"))
    gramRows(docs, k, portable, checkpoint = false)
      .groupBy("g").agg(least(count(lit(1)), lit(cap)).as("cnt"))
  }

  /** Merge a batch's gram counts into the store (same saturation).
    * Idempotent in the ≥cap region — re-merging a hot gram changes
    * nothing. */
  def mergeGramCountStores(a: DataFrame, b: DataFrame, cap: Long = 2): DataFrame = {
    require(cap >= 1, s"cap must be positive, got $cap")
    a.unionByName(b).groupBy("g").agg(least(sum(col("cnt")), lit(cap)).as("cnt"))
  }

  /** The daily-crawl form of [[repeatedSpans]] (the q123 asymmetry
    * applied to substring dedup): a NEW batch is analyzed against
    * everything signed so far — a position is duplicated iff some
    * covering k-gram's batch count plus its saturated store count
    * reaches `minCount` — and old documents are never revisited
    * (their verdicts shipped with their own batches; the incremental
    * contract). Work scales with |batch|: the batch's grams shuffle
    * once for counting, the store is probed with one join on `g`
    * (co-located when the store is bucketed by `g` — the store side
    * never reshuffles), and the span fold runs over batch docs only.
    * Output = [[repeatedSpans]]'s per-doc schema for the batch.
    * First batch: pass `gramCountStore(df.limit(0), …)`.
    *
    * Exactness requires the store's `cap ≥ minCount − 1`: the largest
    * store count a verdict ever needs to distinguish is minCount − 1
    * (one more batch occurrence tips it), and any store count ≥
    * minCount flags even a single batch occurrence regardless of
    * saturation. The defaults (cap = 2, minCount = 2) satisfy this. */
  def incrementalRepeatedSpans(
      newDocs: DataFrame, idCol: String, textCol: String,
      oldStore: DataFrame,
      k: Int = 8, minCount: Long = 2, maxDupFrac: Double = 0.5,
      hotGramMinCount: Long = 100000, portable: Boolean = false): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    require(minCount >= 2, s"minCount must be >= 2, got $minCount")
    val ws = filter(split(lower(col(textCol)), "[^a-z0-9]+"), t => t =!= "")
    val docs = newDocs.select(col(idCol).as("id"), ws.as("_ws"))
      .select(col("id"), col("_ws"), size(col("_ws")).as("n_tokens"))
    val grams = gramRows(docs, k, portable)
    val totals = grams.groupBy("g").agg(count(lit(1)).as("_bcnt"))
      .join(oldStore.select(col("g"), col("cnt").as("_scnt")), Seq("g"), "left")
      .select(col("g"), (col("_bcnt") + coalesce(col("_scnt"), lit(0L))).as("_gcnt"))
      .filter(col("_gcnt") >= minCount)
    val dupStarts =
      graft.ops.Skew.hotColdJoin(grams, totals, "g", "_gcnt", hotGramMinCount)
        .select("id", "s")
    spanStats(docs, dupStarts, k, maxDupFrac)
  }

  /** Surgical decontamination — the remediation twin of
    * [[contamination]]: instead of DROPPING a training document that
    * shares a k-gram with the evaluation suite, cut exactly the
    * covered tokens and keep the rest (the document is otherwise
    * valuable; the leaked span is not). A token survives iff no
    * eval-colliding k-gram covers it; clean documents pass through
    * token-identical — text is rebuilt as the normalized lowercase
    * token join, the corpus-standard form — and unshuffled (their
    * gram rows never match the broadcast probe).
    *
    * Scale shape is q121's, not q126's: the eval suite is SMALL by
    * nature, so its distinct gram ids BROADCAST and the whole
    * detection is one broadcast semi-join over the corpus's gram rows
    * — no corpus-gram shuffle, no join skew, no checkpoint (the gram
    * lineage feeds exactly one consumer here). The trim kernel is
    * shared with [[trimRepeatedSpans]].
    * → (id, text, n_tokens, n_kept_tokens) */
  def trimContaminatedSpans(
      docs: DataFrame, evalDocs: DataFrame,
      idCol: String, textCol: String,
      k: Int = 13, portable: Boolean = false): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val ws = filter(split(lower(col(textCol)), "[^a-z0-9]+"), t => t =!= "")
    def tokenized(df: DataFrame) = df.select(col(idCol).as("id"), ws.as("_ws"))
      .select(col("id"), col("_ws"), size(col("_ws")).as("n_tokens"))
    val docsT = tokenized(docs)
    val evalIds = gramRows(tokenized(evalDocs), k, portable, checkpoint = false)
      .select("g").distinct()
    val hitStarts = gramRows(docsT, k, portable, checkpoint = false)
      .join(broadcast(evalIds), "g")
      .select("id", "s")
    trimByStarts(docsT, hitStarts, k)
  }

  /** Exact dedup by content hash (hash group-by; one shuffle on the
    * md5, partial agg collapses copies map-side): keeps the min-id row
    * per distinct content → (id, n_copies). */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("_content_hash"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .drop("_content_hash")

  /** Paragraph-level exact dedup — C4 §3.1's duplicate-span rule at
    * Dolma's paragraph granularity (Raffel et al. 2020; Soldaini et
    * al. 2024): of every paragraph occurring anywhere in the corpus,
    * keep only the FIRST occurrence (corpus order = (id, position)),
    * drop the rest, and reassemble each document from its surviving
    * paragraphs in position order. The sub-document sibling of
    * [[exactDedup]]: whole-document hashing cannot see the shared
    * footer glued to otherwise-unique pages; this drops exactly the
    * shared spans and keeps the unique prose. A document whose every
    * paragraph is claimed elsewhere disappears — fully-boilerplate
    * documents ARE duplicates (documented contract).
    *
    * Scale shape — two paragraph-linear shuffles, both structurally
    * skew-proof at the 100 TB hot-footer extreme:
    *   1. `posexplode` is a narrow Generate;
    *   2. the keeper table is `groupBy(para).agg(min(struct(id,pos)))`
    *      — a hash aggregate whose MAP-SIDE PARTIALS collapse a
    *      paragraph that appears in every document before anything
    *      crosses the exchange (the q90 groupBy argument);
    *   3. kept rows come from an equi-join on (para, id, pos) — the
    *      key contains the row-unique (id, pos), so a hot paragraph's
    *      occurrences hash-spread uniformly across reducers
    *      (hotColdJoin's promise, obtained structurally from the key
    *      shape instead of a two-plan union);
    *   4. reassembly is one `groupBy(id)` with an in-row
    *      `array_sort` — no window, no global sort.
    * → (idCol, clean_text, n_paragraphs, n_kept). */
  def dedupParagraphs(
      df: DataFrame, idCol: String, textCol: String,
      sep: String = "\\n+"): DataFrame = {
    val paras = filter(split(col(textCol), sep), p => p =!= "")
    val exploded = df
      .select(col(idCol).as("id"), size(paras).as("_n_par"),
        posexplode(paras).as(Seq("pos", "para")))
    val keepers = exploded
      .groupBy(col("para"))
      .agg(min(struct(col("id"), col("pos"))).as("_k"))
      .select(col("para").as("_kpara"), col("_k.id").as("_kid"), col("_k.pos").as("_kpos"))
    exploded
      .join(keepers,
        exploded("para") === col("_kpara") &&
          exploded("id") === col("_kid") && exploded("pos") === col("_kpos"))
      .groupBy(col("id"))
      .agg(
        concat_ws("\n",
          transform(array_sort(collect_list(struct(col("pos"), col("para")))),
            s => s.getField("para"))).as("clean_text"),
        max(col("_n_par")).cast("long").as("n_paragraphs"),
        count(lit(1)).as("n_kept"))
      .withColumnRenamed("id", idCol)
  }

  /** The persisted paragraph store for [[dedupParagraphsIncremental]]:
    * one row per distinct paragraph ever kept, as a portable 60-bit
    * [[gramId]] hash — 8 bytes/row, so a trillion-paragraph corpus
    * store is ~8 TB of bucketable longs, never the text itself. */
  def paragraphStore(
      df: DataFrame, idCol: String, textCol: String,
      sep: String = "\\n+"): DataFrame =
    df.select(explode(filter(split(col(textCol), sep), p => p =!= "")).as("_p"))
      .select(gramId(col("_p")).as("para_hash"))
      .distinct()

  /** [[dedupParagraphs]] under the daily-crawl contract (the q123/q146
    * incremental discipline): a NEW batch deduplicates against the
    * persisted corpus paragraph store ([[paragraphStore]] — hashes
    * only, history's text is never re-read) and against itself
    * (first (id, position) occurrence within the batch wins), then
    * each batch document is reassembled from its surviving paragraphs
    * in position order. Documents whose every paragraph is already
    * claimed vanish, exactly as in the full-corpus pass. Membership
    * is by 60-bit hash (collision odds negligible past 10^9 distinct
    * paragraphs — [[gramId]]); append the kept hashes to the store
    * after the batch commits.
    *
    * Scale shape — work ∝ batch, never ∝ corpus:
    *   1. batch explode is a narrow Generate;
    *   2. the within-batch keeper `groupBy(hash)` collapses a hot
    *      paragraph in its MAP-SIDE PARTIALS (one row per distinct
    *      batch paragraph survives);
    *   3. the store anti-join runs on that collapsed leg — one probe
    *      row per DISTINCT batch paragraph, so a footer occurring in
    *      every batch document costs one store lookup, and a
    *      hash-bucketed store makes its side of the exchange free;
    *   4. kept rows rejoin the explode on (hash, id, pos) — the
    *      row-unique suffix hash-spreads hot paragraphs across
    *      reducers (q149's argument);
    *   5. reassembly is one `groupBy(id)` with an in-row `array_sort`.
    * → (idCol, clean_text, n_paragraphs, n_kept). */
  def dedupParagraphsIncremental(
      batch: DataFrame, store: DataFrame, idCol: String, textCol: String,
      sep: String = "\\n+"): DataFrame = {
    val paras = filter(split(col(textCol), sep), p => p =!= "")
    val exploded = batch
      .select(col(idCol).as("id"), size(paras).as("_n_par"),
        posexplode(paras).as(Seq("pos", "para")))
      .withColumn("_h", gramId(col("para")))
    val keepers = exploded
      .groupBy(col("_h"))
      .agg(min(struct(col("id"), col("pos"))).as("_k"))
      .select(col("_h").as("_kh"), col("_k.id").as("_kid"), col("_k.pos").as("_kpos"))
    val freshKeepers = keepers.join(
      store.select(col("para_hash")), col("_kh") === col("para_hash"), "left_anti")
    exploded
      .join(freshKeepers,
        exploded("_h") === col("_kh") &&
          exploded("id") === col("_kid") && exploded("pos") === col("_kpos"))
      .groupBy(col("id"))
      .agg(
        concat_ws("\n",
          transform(array_sort(collect_list(struct(col("pos"), col("para")))),
            s => s.getField("para"))).as("clean_text"),
        max(col("_n_par")).cast("long").as("n_paragraphs"),
        count(lit(1)).as("n_kept"))
      .withColumnRenamed("id", idCol)
  }

  /** Exact set-Jaccard pairs ≥ threshold, threshold ∈ (0, 1]. Adaptive:
    * a cheap probe counts the distinct-item vocabulary, and when it fits
    * in 64 bits every set collapses to ONE long bitmask
    * ([[jaccardPairsBitmask]]: popcount arithmetic over distinct masks —
    * no item join at all). Larger vocabularies — or tiny vocabularies
    * whose distinct-mask count exceeds `maxMasks` — pick between the
    * PPJoin-style prefix filter ([[jaccardPairsPrefix]]) at high
    * thresholds and the banded item join ([[jaccardPairsItemJoin]]) at
    * low ones. All paths are exact over the supported threshold domain;
    * the choice is a physical-strategy decision, like AQE picking a
    * join algorithm. (threshold ≤ 0 is rejected: the bitmask path would
    * emit fully-disjoint pairs the item join cannot see, so the
    * strategies would stop being row-identical.)
    *
    * `prefixMinThreshold` is measured, not guessed (BENCHMARKS.md
    * "Zipfian corpus", 5000-doc/23k-type Zipf(1.07) corpus at sf0.1
    * scale): prefix filtering wins 3.3–7.6× at t ≥ 0.7 on token sets
    * (where the stopword head melts the item join) and is a wash on
    * near-unique shingle sets, but LOSES 2.5× on token sets at t = 0.5,
    * where half of every set — including the head — enters the prefix
    * and the candidate join explodes. */
  def jaccardPairs(
      sets: DataFrame, threshold: Double, maxMasks: Int = 50000,
      prefixMinThreshold: Double = 0.7): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"jaccardPairs threshold must be in (0, 1], got $threshold")
    // Bounded driver read: at most 65 rows decide the strategy.
    val vocab = sets.select("item").distinct().limit(65)
      .collect().map(_.getString(0))
    require(!vocab.contains(null),
      "jaccardPairs: sets contains a null item — tokenSets/shingleSets never emit " +
        "one; a hand-built sets input must filter nulls first")
    if (vocab.length <= 64) jaccardPairsBitmask(sets, threshold, vocab.sorted.toIndexedSeq, maxMasks)
    else if (threshold >= prefixMinThreshold) jaccardPairsPrefix(sets, threshold)
    else jaccardPairsItemJoin(sets, threshold)
  }

  /** Tiny-vocabulary fast path: with ≤64 distinct items, a document's
    * token set IS a 64-bit mask, so |A∩B| = popcount(A&B) and
    * |A∪B| = popcount(A|B). Docs first collapse to DISTINCT masks
    * (exact duplicates — common in near-dup corpora — are compared
    * once, not |group|² times); distinct masks compare all-pairs with
    * three codegen'd bit ops per pair, then mask pairs expand back to
    * doc pairs through two equi-joins. A tiny-vocab corpus is exactly
    * the case where the item join degenerates (every item is a hub
    * shared by ~all documents), and exactly the case where this path
    * is linear-ish: #distinct masks ≤ min(2^vocab, #docs). */
  private def jaccardPairsBitmask(
      sets: DataFrame, threshold: Double, vocab: IndexedSeq[String],
      maxMasks: Int): DataFrame = {
    val bitOf = map(vocab.zipWithIndex.flatMap {
      case (it, i) => Seq(lit(it), lit(i))
    }: _*)
    // One shuffle on id with map-side partial bit_or. The result feeds
    // five downstream uses (reps + two joins each in intra/inter), so it
    // is materialized ONCE via an eager localCheckpoint: downstream
    // reads hit executor-local blocks instead of re-running the
    // tokenSets/shingleSets lineage, and — unlike cache() — nothing is
    // left registered in the cache manager after the query returns
    // (blocks free with the DataFrame, no caller-release contract).
    val masks = sets
      .select(col("id"),
        call_function("shiftleft", lit(1L), element_at(bitOf, col("item"))).as("_bit"))
      .groupBy("id").agg(bit_or(col("_bit")).as("mask"))
      .localCheckpoint(true)
    val reps = masks.select("mask").distinct()
    // A ≤64-item vocabulary bounds distinct masks only by
    // min(2^vocab, #docs) — on a huge corpus that can still be millions,
    // and the all-pairs compare below is O(m²). Probe the actual count
    // (bounded scan: limit maxMasks+1) and fall back to the item join
    // when the quadratic side would dominate.
    if (reps.limit(maxMasks + 1).count() > maxMasks)
      return jaccardPairsItemJoin(sets, threshold)
    // distinct-mask all-pairs: broadcast nested-loop with pure bit math
    val repPairs = reps.select(col("mask").as("m1"))
      .crossJoin(reps.select(col("mask").as("m2")))
      .filter(col("m1") < col("m2"))
      .select(col("m1"), col("m2"),
        (bit_count(col("m1").bitwiseAND(col("m2"))) /
          bit_count(col("m1").bitwiseOR(col("m2")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
    // expand: equal-mask doc pairs are exact duplicates (J = 1) …
    val intra = masks.toDF("id_1", "mask")
      .join(masks.toDF("id_2", "mask"), "mask")
      .filter(col("id_1") < col("id_2"))
      .select(col("id_1"), col("id_2"), lit(1.0).as("jaccard"))
      .filter(col("jaccard") >= threshold)
    // … and qualifying mask pairs fan out to their doc groups
    val inter = repPairs
      .join(masks.select(col("mask").as("m1"), col("id").as("_ida")), "m1")
      .join(masks.select(col("mask").as("m2"), col("id").as("_idb")), "m2")
      .select(least(col("_ida"), col("_idb")).as("id_1"),
        greatest(col("_ida"), col("_idb")).as("id_2"), col("jaccard"))
    intra.unionByName(inter)
  }

  /** General item-join path for [[jaccardPairs]]. Shuffles on item —
    * hub items fan out quadratically; baseline/oracle use only (the
    * scale path is [[minhashLshPairs]]).
    *
    * One EXACT pruning applies: J(A,B) ≥ t forces |A∩B| ≥ t·(|A|+|B|)/(1+t)
    * and |A∩B| ≤ min(|A|,|B|), hence min/max set-size ratio ≥ t — so a
    * size-compatibility predicate inside the item join discards
    * incompatible pairs BEFORE the pair aggregation, shrinking its
    * input by ~an order of magnitude at high thresholds without
    * changing a single output row. */
  def jaccardPairsItemJoin(sets0: DataFrame, threshold: Double): DataFrame = {
    // The sets lineage (tokenize/shingle Generate + DISTINCT shuffle)
    // feeds four consumers below (sizes, probe, build — and the probe's
    // band explode makes the subtrees non-identical, so ReusedExchange
    // cannot collapse them). Materialize ONCE into executor-local
    // checkpoint blocks — same eager-localCheckpoint discipline as the
    // bitmask path's masks: nothing stays registered in the cache
    // manager, blocks free with the DataFrame. Measured at sf0.1 this
    // removes 3 of 4 shingle-set evaluations from q94's plan.
    val sets = sets0.localCheckpoint(true)
    val sizes = sets.groupBy("id").agg(count(lit(1)).as("sz"))
    val withSz = sets.join(sizes, "id") // sizes side is tiny → auto-broadcast
    // Size-ratio-compatible pairs sit in the same or adjacent log-band
    // (band = ⌊ln sz / ln(1/t)⌋), so folding the band into the join key
    // partitions each hub item's matches across bands: the probe side
    // explodes 3 candidate bands and only (item, band)-equal rows meet,
    // cutting hub fan-out by ~#bands/3 while staying exact (the precise
    // ratio predicate still applies below).
    val (probe, key) =
      if (threshold > 0 && threshold < 1) {
        val w = math.log(1.0 / threshold)
        val band = floor(log(col("sz").cast("double")) / w)
        (withSz.withColumn("_band", explode(array(band - 1, band, band + 1))),
          withSz.withColumn("_band", band))
      } else (withSz.withColumn("_band", lit(0)), withSz.withColumn("_band", lit(0)))
    val a = probe.toDF("id_1", "item", "sz1", "_band")
    val b = key.toDF("id_2", "item", "sz2", "_band")
    val inter = a
      .join(b, Seq("item", "_band"))
      .filter(col("id_1") < col("id_2") &&
        col("sz1") >= lit(threshold) * col("sz2") && col("sz2") >= lit(threshold) * col("sz1"))
      .groupBy("id_1", "id_2", "sz1", "sz2").agg(count(lit(1)).as("i"))
    inter
      .withColumn("jaccard", col("i") / (col("sz1") + col("sz2") - col("i")))
      .filter(col("jaccard") >= threshold)
      .select("id_1", "id_2", "jaccard")
  }

  /** PPJoin-style prefix-filtered exact-Jaccard pairs (Xiao et al.,
    * "Efficient Similarity Joins for Near Duplicate Detection", WWW'08
    * — the prefix-filter principle, not the code). EXACT: emits the
    * same rows as [[jaccardPairsItemJoin]].
    *
    * Principle: under any TOTAL order on items, two sets with
    * J(A,B) ≥ t must share an item inside each other's first
    * |s| − ⌈t·|s|⌉ + 1 items (else the overlap can't reach the required
    * ⌈t/(1+t)·(|A|+|B|)⌉). Ordering by ASCENDING document frequency
    * makes those prefixes the RAREST items, which is what makes this
    * the Zipfian-corpus weapon: the stopword head — whose quadratic
    * fan-out is exactly what melts the plain item join on real text —
    * never enters a prefix unless the threshold is so low the join is
    * quadratic by nature. At t = 0.95 a 64-token document contributes
    * a 4-item prefix of its rarest tokens.
    *
    * Shuffle shape: one groupBy(item) for the frequency table, one
    * item-keyed 1:1 attach join (linear in the corpus — hot items fan
    * out to their own row count, never quadratically — and hot/cold
    * routed through [[graft.ops.Skew.hotColdJoin]]: a stopword in 10%
    * of a 100 TB corpus would otherwise land its whole group on one
    * reducer of an AQE-unsplittable join), one groupBy(id) with a
    * bounded per-set sort, a prefix-item self-join (rare keys → tiny
    * groups), and the candidate-bounded [[verifyJaccard]]. The exact
    * size-ratio prune (|A|·t ≤ |B| ≤ |A|/t) rides the candidate
    * join. */
  def jaccardPairsPrefix(
      sets0: DataFrame, threshold: Double, hotItemMinDf: Long = 100000L): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"jaccardPairsPrefix threshold must be in (0, 1], got $threshold")
    // The sets lineage feeds three consumers (freq, attach, verify) with
    // non-identical subtrees — same eager-checkpoint discipline as
    // jaccardPairsItemJoin.
    val sets = sets0.localCheckpoint(true)
    val freq = sets.groupBy("item").agg(count(lit(1)).as("_df"))
    // (df, item) is the total order; window-rank prefix selection, the
    // containmentPairsOn shape (r19) — no per-document array build
    val wOrd = Window.partitionBy("id").orderBy(col("_df"), col("item"))
    val wAll = Window.partitionBy("id")
    val prefixes = graft.ops.Skew.hotColdJoin(sets, freq, "item", "_df", hotItemMinDf)
      .select(col("id"), col("item"),
        row_number().over(wOrd).as("_rn"),
        count(lit(1)).over(wAll).as("sz"))
      .filter(col("_rn") <= (col("sz") - ceil(lit(threshold) * col("sz")) + 1).cast("int"))
      .select(col("id"), col("sz"), col("item"))
    val cand = prefixes.toDF("id_1", "sz1", "item")
      .join(prefixes.toDF("id_2", "sz2", "item"), "item")
      .filter(col("id_1") < col("id_2") &&
        col("sz1") >= lit(threshold) * col("sz2") && col("sz2") >= lit(threshold) * col("sz1"))
      .select("id_1", "id_2")
      .distinct()
    verifyJaccard(cand, sets, threshold)
  }

  /** Asymmetric containment pairs: ordered (id_a, id_b) with
    * C(A→B) = |A∩B| / |A| ≥ `threshold` — "A is t-contained in B",
    * Broder 1997's second resemblance measure and the right detector
    * when one document EMBEDS another (quote farms, syndicated
    * excerpts, boilerplate-wrapped reposts): symmetric Jaccard dives
    * toward 0 as the container grows, containment stays 1. Exact —
    * every qualifying ordered pair is emitted, both directions when
    * both hold.
    *
    * Prefix filter, containment form: under the ascending-df total
    * order, |A∩B| ≥ ⌈t·|A|⌉ forces A's first |A| − ⌈t·|A|⌉ + 1 rarest
    * items to intersect B (else the overlap is ≤ ⌈t·|A|⌉ − 1) — so
    * candidates are A-PREFIX × FULL-INDEX joins, the asymmetric twin
    * of [[jaccardPairsPrefix]]'s prefix×prefix. The index side keeps
    * every item, so the fan-out bound leans entirely on prefixes
    * holding the RAREST items: the stopword head never probes. The
    * one exact size prune is |B| ≥ t·|A| (no upper bound exists — a
    * tweet can be contained in an encyclopedia; that asymmetry is the
    * point). Shuffle shape: one groupBy(item) for df, the hot/cold
    * attach ([[graft.ops.Skew.hotColdJoin]]), one groupBy(id) with a
    * bounded per-set sort, the prefix×index join, then candidate-
    * bounded verification that tracks side membership in the item
    * groupBy (max-of-flag), so |A| needs no extra sizes join.
    * → (id_a, id_b, containment)
    */
  def containmentPairs(
      sets0: DataFrame, threshold: Double, hotItemMinDf: Long = 100000L): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"containmentPairs threshold must be in (0, 1], got $threshold")
    // sets feeds freq, prefix-attach, index and verify — the
    // jaccardPairsItemJoin checkpoint discipline.
    containmentPairsOn(sets0.localCheckpoint(true), threshold, hotItemMinDf)
  }

  /** [[containmentPairs]] body over an ALREADY-MATERIALIZED sets frame
    * — callers that hold their own checkpoint (removeContained) enter
    * here so the sets blocks are never copied into a second checkpoint
    * (r19: q191 paid a full extra materialization pass for it). */
  private[graft] def containmentPairsOn(
      sets: DataFrame, threshold: Double, hotItemMinDf: Long = 100000L): DataFrame = {
    val freq = sets.groupBy("item").agg(count(lit(1)).as("_df"))
    // Prefix selection as a WINDOW rank over the (df, item) total order
    // (r19): one shuffle + one streaming sort per set, where the old
    // sort_array(collect_list(...)) shape materialized the ENTIRE
    // (df, item) struct array per document before slicing off ~10% —
    // a per-group memory spike a pathological document turns into an
    // executor OOM; the window form spills gracefully. Same order,
    // same first-(sz − ⌈t·sz⌉ + 1) rows, row-identical output.
    val wOrd = Window.partitionBy("id").orderBy(col("_df"), col("item"))
    val wAll = Window.partitionBy("id")
    val prefixes = graft.ops.Skew.hotColdJoin(sets, freq, "item", "_df", hotItemMinDf)
      .select(col("id"), col("item"),
        row_number().over(wOrd).as("_rn"),
        count(lit(1)).over(wAll).as("sz"))
      .filter(col("_rn") <= (col("sz") - ceil(lit(threshold) * col("sz")) + 1).cast("int"))
      .select(col("id"), col("sz"), col("item"))
    val sizes = sets.groupBy("id").agg(count(lit(1)).as("_szb"))
    val index = sets.join(sizes, "id") // sizes per id → auto-broadcast-able
    val cand = prefixes.toDF("id_a", "sza", "item")
      .join(index.toDF("id_b", "item", "szb"), "item")
      .filter(col("id_a") =!= col("id_b") &&
        col("szb") >= lit(threshold) * col("sza"))
      .select("id_a", "id_b")
      .distinct()
    verifyContainment(cand, sets, threshold)
  }

  /** Candidate-bounded exact containment verification — the asymmetric
    * twin of [[verifyJaccard]]: A-side items attach to each ordered
    * candidate by one id-keyed join, |A∩B| is a LEFT SEMI join of those
    * rows against the (id, item)-keyed sets (B's items never fan out —
    * r19: the old member-explode shape shuffled |A|+|B| rows per pair
    * through an item-string groupBy, 5× slower measured and ∝ the
    * CONTAINER's size per pair, the wrong scaling for the one family
    * whose B side is unbounded), and |A| comes from the per-id sizes
    * aggregate. Zero-intersection pairs drop at the semi join — below
    * any positive threshold by definition. Exact: same rows, same
    * single IEEE division of exact longs. → (id_a, id_b, containment ≥ t) */
  def verifyContainment(candidates: DataFrame, sets: DataFrame, threshold: Double): DataFrame = {
    require(threshold > 0,
      s"verifyContainment threshold must be > 0, got $threshold")
    val sizes = sets.groupBy("id").agg(count(lit(1)).as("_sza"))
    candidates.join(sets.toDF("id_a", "item"), "id_a")
      .join(sets.toDF("id_b", "item"), Seq("id_b", "item"), "left_semi")
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("_i"))
      .join(sizes.toDF("id_a", "_sza"), "id_a")
      .withColumn("containment", col("_i").cast("double") / col("_sza"))
      .filter(col("containment") >= threshold)
      .select("id_a", "id_b", "containment")
  }

  /** Banded PRODUCTION path for asymmetric containment — the
    * [[containmentPairs]] exact prefix×index join replaced by a
    * RAREST-s probe (the PPJoin/SSJoin rare-prefix principle applied
    * as a fixed-size sketch): per probe set A keep the `sketchSize`
    * cold items with the LOWEST document frequency (ties broken by
    * the portable item hash, then the item — fully deterministic);
    * for any B, |probe(A) ∩ B| / |probe(A)| estimates C(A→B) over the
    * probed sub-universe, so candidates are pairs whose count clears
    * `threshold − slack` and the exact [[verifyContainment]] pass
    * (over the FULL item sets — estimates never reach the output)
    * restores exact precision.
    *
    * WHY RARITY AND NOT A HASH-RANDOM BOTTOM-k (r16 — caught by the
    * three-tier growth gate): the probe join's pre-aggregation volume
    * is Σ_{i∈probes} df(i). A hash-random sketch (Cohen bottom-k) has
    * no rarity bias, so that sum is ≈ s/|A|·Σ df² — and under a
    * Zipfian shingle distribution df_max grows ∝ N, making the join
    * and its (id_a, id_b) aggregate SUPER-LINEAR in corpus size
    * (measured on the 500k-doc tier: 1.18 G probe rows, 241 M
    * candidate groups, 46× wall growth for 10× docs). Probing each
    * set's RAREST items bounds the fan-out by the df of the corpus'
    * rare tail (≈ 1–2 regardless of N — the heavy tail is where Zipf
    * types live), and the binding `hotItemMaxDf` universe cut caps
    * the worst set (measured: 69 M probe rows, 17× less). Recall for
    * TRUE containment is free: C(A→B) = 1 means every item of A —
    * any chosen subset — is in B, so full-containment pairs hit on
    * every probe; pairs at t ≤ C < 1 rest on the exchangeability of
    * misses across A's df-ranks, absorbed by `slack` (the
    * hypergeometric tail σ ≈ √(c(1−c)/s) ≈ 0.06 at s = 32 under
    * uniform misses); when |cold(A)| ≤ sketchSize the probe IS A's
    * cold set and candidate generation is exact over it.
    *
    * Items with df > `hotItemMaxDf` are excluded from probe AND index
    * (they carry no identifying signal — a boilerplate shingle would
    * fan df ≈ N index rows); the default 1000 BINDS at scale by
    * design: an absolute cut is the only shape that keeps Σ_cold df²
    * near-linear in N (a fractional cut df ≤ εN re-admits the
    * quadratic term). A set with no cold items generates no
    * candidates — at that point every one of its shingles appears in
    * >1000 documents and containment has no signal to find; the
    * exact verify still counts EVERY item, hot included. Audit such
    * sets with [[hotOnlyProbeSets]] (zero-candidate outcomes should
    * be diagnosable, not silent — see [[DefaultMaxItemDf]]'s
    * migration note for the r16 default change).
    * → (id_a, id_b, containment) — containment exact. */
  def containmentPairsBanded(
      sets0: DataFrame, threshold: Double,
      sketchSize: Int = 32, slack: Double = 0.2,
      hotItemMaxDf: Long = DefaultMaxItemDf): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"containmentPairsBanded threshold must be in (0, 1], got $threshold")
    require(sketchSize >= 1, s"sketchSize must be >= 1, got $sketchSize")
    require(slack >= 0 && slack < threshold,
      s"slack must be in [0, threshold), got $slack")
    containmentPairsBandedOn(sets0.localCheckpoint(true), threshold, sketchSize,
      slack, hotItemMaxDf)
  }

  /** [[containmentPairsBanded]] body over an ALREADY-MATERIALIZED sets
    * frame — the containmentPairsOn stance for the banded path. */
  private[graft] def containmentPairsBandedOn(
      sets: DataFrame, threshold: Double,
      sketchSize: Int, slack: Double, hotItemMaxDf: Long): DataFrame = {
    val freq = sets.groupBy("item").agg(count(lit(1)).as("_df"))
    // inner join with the cold slice of the df table implements the
    // universe cut AND attaches the df the rarity sort needs — one
    // item-keyed shuffle, same key as the probe join that follows
    val cold = sets.join(freq.filter(col("_df") <= hotItemMaxDf), "item")
      .select(col("id"), col("item"), col("_df"))
      .localCheckpoint(true) // feeds probe selection AND probe index
    // window-rank sketch selection over the (df, hash, item) total
    // order — the containmentPairsOn shape (r19): same first-s rows as
    // the old sort_array slice, no per-document array build
    val wOrd = Window.partitionBy("id")
      .orderBy(col("_df"), itemId(col("item")), col("item"))
    val wAll = Window.partitionBy("id")
    val sketch = cold
      .select(col("id").as("id_a"), col("item"),
        row_number().over(wOrd).as("_rn"),
        least(count(lit(1)).over(wAll), lit(sketchSize)).cast("long").as("_m"))
      .filter(col("_rn") <= sketchSize)
      .select(col("id_a"), col("_m"), col("item"))
    val cand = sketch
      .join(cold.select(col("id").as("id_b"), col("item")), "item")
      .filter(col("id_a") =!= col("id_b"))
      .groupBy("id_a", "id_b", "_m")
      .agg(count(lit(1)).as("_k"))
      .filter(col("_k") >= (lit(threshold) - lit(slack)) * col("_m"))
      .select("id_a", "id_b")
    verifyContainment(cand, sets, threshold)
  }

  /** The APPLY half of the containment family: drop every set that is
    * `threshold`-contained in a KEEPER-ORDER-greater set — the
    * curation move for excerpt/quote farms (the container document
    * retains the content; the excerpt adds nothing). Keeper order is
    * (size desc, id asc): a contained set is dropped when its
    * container is strictly larger, or equal-sized with a smaller id
    * (equal-sized mutual t-containment — exactly one survives;
    * the two are identical sets when t = 1, merely ≥t-overlapping
    * below it). Chains (a ⊂ b ⊂ c) resolve transitively: a and b both
    * drop, c retains the content — the standard dedup stance.
    *
    * `banded = true` routes candidate generation through
    * [[containmentPairsBanded]] (the production path — recall-gated,
    * emitted containments still exact); false replays the exact
    * prefix×index join, which is what the q191 oracle hashes.
    * → (id, n_items) — the surviving sets. */
  def removeContained(
      sets0: DataFrame, threshold: Double, banded: Boolean = false,
      sketchSize: Int = 32, slack: Double = 0.2,
      hotItemMaxDf: Long = DefaultMaxItemDf): DataFrame = {
    val sets = sets0.localCheckpoint(true) // feeds pairs AND sizes AND survivors
    // *On entry points: sets is already materialized — a second
    // checkpoint inside the pairs call would copy every block (r19)
    val pairs =
      if (banded) containmentPairsBandedOn(sets, threshold, sketchSize, slack, hotItemMaxDf)
      else containmentPairsOn(sets, threshold, hotItemMaxDf)
    val sizes = sets.groupBy("id").agg(count(lit(1)).as("n_items"))
    val dropped = pairs
      .join(sizes.select(col("id").as("id_a"), col("n_items").as("_sza")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("n_items").as("_szb")), "id_b")
      .filter(col("_szb") > col("_sza") ||
        (col("_szb") === col("_sza") && col("id_b") < col("id_a")))
      .select(col("id_a").as("id"))
      .distinct()
    sizes.join(dropped, Seq("id"), "left_anti")
      .select(col("id"), col("n_items"))
  }

  /** Portable 32-bit item id: first 8 hex chars of md5. */
  def itemId(item: Column): Column = conv(substring(md5(item), 1, 8), 16, 10).cast("long")

  /** MinHash signatures: k permutation-mins via hᵢ(x) = (aᵢ·x + bᵢ) mod p
    * with aᵢ = 1+4i, bᵢ = 7+11i (odd, fixed — reproducible anywhere).
    * One groupBy(id) with k min-aggregates: a single shuffle, partial
    * aggregation collapses the item lists map-side. → (id, mh_0..mh_{k−1}) */
  def minhashSignatures(sets: DataFrame, k: Int): DataFrame = {
    // Hoist the md5-derived item id into ONE projection below the
    // aggregate (r20, guide §2.3 project-early): as an agg-expression
    // subtree it rode all k min-aggregates, leaving the per-row
    // md5+conv work to the aggregate operator's codegen CSE — an
    // explicit projection guarantees one evaluation per row and
    // narrows the aggregate input to (id, long). Same arithmetic,
    // bit-identical signatures.
    val aggs = (0 until k).map { i =>
      min((col("_sid") * (1 + 4 * i) + (7 + 11 * i)) % MinhashPrime).as(s"mh_$i")
    }
    sets.select(col("id"), itemId(col("item")).as("_sid"))
      .groupBy("id").agg(aggs.head, aggs.tail: _*)
  }

  /** (id, band, sig) rows from a signature frame — the LSH banding
    * shared by the batch and incremental paths. */
  def bandSigs(sigs: DataFrame, k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, s"bands ($bands) must divide k ($k)")
    val r = k / bands
    val bandStructs = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        concat_ws("_", (0 until r).map(j => col(s"mh_${b * r + j}")): _*).as("sig"))
    }
    sigs
      .select(col("id"), explode(array(bandStructs: _*)).as("_b"))
      .select(col("id"), col("_b.band").as("band"), col("_b.sig").as("sig"))
  }

  /** LSH banding self-join: docs sharing any band signature become
    * candidates. Shuffles (id, band, sig) tuples — signature-sized,
    * not document-sized. → distinct (id_1, id_2). */
  def lshCandidates(sigs: DataFrame, k: Int, bands: Int): DataFrame = {
    val banded = bandSigs(sigs, k, bands)
    banded.toDF("id_1", "band", "sig")
      .join(banded.toDF("id_2", "band", "sig"), Seq("band", "sig"))
      .filter(col("id_1") < col("id_2"))
      .select("id_1", "id_2")
      .distinct()
  }

  /** Incremental near-dup detection: dedup a NEW batch against an
    * EXISTING signed corpus — the daily-crawl shape, where re-signing
    * 100 TB of history per batch is the thing to avoid. `oldSigs` is a
    * prior [[minhashSignatures]] output (persist it — a
    * [[graft.sources.VersionedTable]] with one appended version per
    * batch is the natural store); only the new batch's text is
    * touched.
    *
    * The band join is ASYMMETRIC: the new batch's band rows probe the
    * full corpus's, so old×old pairs are never even generated — work
    * scales with |new| · collision rate, not |corpus|². Jaccard is
    * the SIGNATURE ESTIMATE (matching-component fraction, the
    * standard MinHash property E[match] = J): the old documents'
    * shingle sets need not exist anymore, which is precisely the
    * incremental trade. → (id_1, id_2, est_jaccard), every pair
    * involving ≥ 1 new document. */
  def incrementalNearDups(
      newDocs: DataFrame, idCol: String, textCol: String,
      oldSigs: DataFrame,
      n: Int = 3, k: Int = 16, bands: Int = 8, threshold: Double = 0.5): DataFrame = {
    val mhCols = (0 until k).map(i => s"mh_$i")
    require(mhCols.forall(oldSigs.columns.contains),
      s"oldSigs must carry id, ${mhCols.mkString(", ")} — a minhashSignatures(k=$k) output")
    // The new batch's signature pipeline (shingle Generate + DISTINCT +
    // k-min aggregate) feeds FOUR consumers below (the anti-join probe,
    // its own band rows, and the union that backs both sides of the
    // estimate join) — without a cut it re-evaluates per consumer (the
    // q123 plan showed 20 scans of the batch). The batch is SMALL by
    // the incremental contract, so materialize it once; oldSigs stays
    // lazy — by the same contract it is a persisted table whose
    // re-scan is cheap and prunable.
    val newSigs = minhashSignatures(shingleSets(newDocs, idCol, textCol, n), k)
      .localCheckpoint(true)
    // A re-crawled id (present in BOTH oldSigs and the new batch) must
    // contribute exactly one signature row — the NEW one — or the band
    // joins emit duplicate candidates estimated against the stale
    // signature. The anti-join's build side is the new batch's ids
    // (small by the incremental contract) → broadcast hash anti-join,
    // no corpus shuffle.
    val oldOnly = oldSigs.select(col("id") +: mhCols.map(col): _*)
      .join(broadcast(newSigs.select("id")), Seq("id"), "left_anti")
    val all = oldOnly.unionByName(newSigs)
    val cand = bandSigs(newSigs, k, bands).toDF("_ida", "band", "sig")
      .join(bandSigs(all, k, bands).toDF("_idb", "band", "sig"), Seq("band", "sig"))
      .filter(col("_ida") =!= col("_idb"))
      .select(least(col("_ida"), col("_idb")).as("id_1"),
        greatest(col("_ida"), col("_idb")).as("id_2"))
      .distinct()
    val left = all.select(col("id").as("id_1") +: (0 until k).map(i => col(s"mh_$i").as(s"_l_$i")): _*)
    val right = all.select(col("id").as("id_2") +: (0 until k).map(i => col(s"mh_$i").as(s"_r_$i")): _*)
    val matching = (0 until k)
      .map(i => when(col(s"_l_$i") === col(s"_r_$i"), 1).otherwise(0))
      .reduce(_ + _)
    cand.join(left, "id_1").join(right, "id_2")
      .select(col("id_1"), col("id_2"), (matching / k.toDouble).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** Candidate-bounded exact-Jaccard verification, the
    * [[verifyContainment]] shape (r19): id_1's items attach by one
    * id-keyed join, |A∩B| is a LEFT SEMI join against the (id, item)-
    * keyed sets, both sizes come from the per-id sizes aggregate, and
    * jaccard = i / (sz1 + sz2 − i) — algebraically and IEEE-identical
    * to the old (tot − u)/u (u = sz1 + sz2 − i; both are one division
    * of exact longs). The old member-explode shape shuffled |A|+|B|
    * rows per pair through an item-string groupBy; this shape never
    * fans the second set out per pair. Zero-intersection pairs drop at
    * the semi join — below any positive threshold by definition.
    * Never an item-keyed set×set join. → (id_1, id_2, jaccard ≥ t) */
  def verifyJaccard(candidates: DataFrame, sets: DataFrame, threshold: Double): DataFrame = {
    require(threshold > 0,
      s"verifyJaccard threshold must be > 0, got $threshold")
    val sizes = sets.groupBy("id").agg(count(lit(1)).as("_sz"))
    candidates.join(sets.toDF("id_1", "item"), "id_1")
      .join(sets.toDF("id_2", "item"), Seq("id_2", "item"), "left_semi")
      .groupBy("id_1", "id_2").agg(count(lit(1)).as("_i"))
      .join(sizes.toDF("id_1", "_sz1"), "id_1")
      .join(sizes.toDF("id_2", "_sz2"), "id_2")
      .withColumn("jaccard",
        col("_i") / (col("_sz1") + col("_sz2") - col("_i")))
      .filter(col("jaccard") >= threshold)
      .select("id_1", "id_2", "jaccard")
  }

  /** The full MinHash+LSH near-dup pipeline over word n-gram shingles —
    * banded near-dup pairs: signatures over the COLD shingle universe
    * (df ≤ `maxShingleDf`), candidates from the band join, then exact
    * Jaccard verification over the FULL sets — emitted values are
    * unaffected by the cut.
    *
    * WHY THE UNIVERSE CUT (r16 — the q185 lesson in MinHash form,
    * caught by the three-tier growth gate): a minhash has no rarity
    * bias, so on a Zipfian corpus the per-band minima concentrate on
    * the carriers of globally-small-hash COMMON shingles — every doc
    * containing such a shingle shares that band component, so bucket
    * sizes grow ∝ df of the captured shingle ∝ N and collision pairs
    * go quadratic (measured on the 500k-doc tier: 939k candidate
    * pairs, 61× for 10× docs, biggest bucket 853; verify-join rows
    * grew 31×). Signing only df ≤ 1000 shingles caps every bucket
    * (collision pairs ≤ bands·N·cap by Σc ≤ bands·N with c ≤ cap —
    * linear in N; measured 328k pairs, biggest bucket 179) and costs
    * nothing on recall at any practical tier: near-dup identity lives
    * in the rare shingles (the PPJoin argument), J over the cold
    * universe tracks J for real documents, and a doc whose EVERY
    * shingle appears in >1000 documents has no distinctive content to
    * near-dup-match (exact duplicates of it still collapse via
    * [[exactDedup]]). The cut is ABSOLUTE by design — a fractional
    * df ≤ εN cut re-admits the quadratic term.
    *
    * Checkpoint note (r16): the pre-cut pipeline's two shingle
    * subtrees were IDENTICAL, ReusedExchange collapsed them, and an
    * explicit checkpoint measured SLOWER (q92 2.1 → 3.6 s — pure
    * added materialization). The cut changed that: `sets` now feeds
    * THREE structurally different consumers (the df census, the cold
    * slice, the full-set verify), which ReusedExchange cannot
    * collapse, so the checkpoint below is load-bearing — without it
    * the shingle Generate re-runs per consumer. */
  def minhashLshPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 16, bands: Int = 8, threshold: Double = 0.5,
      maxShingleDf: Long = DefaultMaxItemDf): DataFrame = {
    val sets = shingleSets(df, idCol, textCol, n).localCheckpoint(true)
    val freq = sets.groupBy("item").agg(count(lit(1)).as("_df"))
    val cold = sets.join(freq.filter(col("_df") <= maxShingleDf), "item")
      .select(col("id"), col("item"))
    verifyJaccard(lshCandidates(minhashSignatures(cold, k), k, bands), sets, threshold)
  }

  /** Train/eval leakage audit: near-duplicate pairs that STRADDLE
    * split boundaries — the train-test overlap Lee et al. 2022
    * ("Deduplicating Training Data Makes Language Models Better",
    * §train-test leakage) report for standard corpora: a random split
    * of a near-dup-bearing corpus puts one copy in train and one in
    * eval, inflating eval scores. Same banded machinery as
    * [[minhashLshPairs]] (candidate-bounded, no all-pairs), then one
    * id-keyed join per side attaches split labels and only cross-split
    * pairs survive — at scale the label joins are id-keyed hash joins
    * on the tiny pair set, not corpus-wide work. Run BEFORE near-dup
    * removal to quantify what a naive split would leak; after
    * [[removeNearDuplicatesBy]] + a fresh split it must return empty —
    * the cleanliness proof (DedupSpec pins both directions).
    * `splits`: one (splitIdCol, splitCol) row per document.
    * → (id_1, id_2, split_1, split_2, jaccard). */
  def splitLeakage(
      df: DataFrame, idCol: String, textCol: String,
      splits: DataFrame, splitIdCol: String, splitCol: String,
      n: Int = 3, k: Int = 16, bands: Int = 8, threshold: Double = 0.5): DataFrame = {
    val pairs = minhashLshPairs(df, idCol, textCol, n, k, bands, threshold)
    pairs
      .join(splits.select(col(splitIdCol).as("id_1"), col(splitCol).as("split_1")), "id_1")
      .join(splits.select(col(splitIdCol).as("id_2"), col(splitCol).as("split_2")), "id_2")
      .filter(col("split_1") =!= col("split_2"))
      .select("id_1", "id_2", "split_1", "split_2", "jaccard")
  }

  /** The constructive counterpart of [[splitLeakage]]: train/eval
    * split assignment where the NEAR-DUP CLUSTER, not the document, is
    * the unit of assignment — every doc splits by a hash of its
    * cluster id, so a near-dup pair straddling a split boundary is
    * impossible by construction (both ends share a cluster, a cluster
    * hashes to one split). This keeps every duplicate (unlike
    * dedup-then-split) while still guaranteeing zero leakage — the
    * choice when duplicates are weighted rather than dropped. Scale
    * shape: [[minhashLshPairs]] + [[dedupClusters]] (both gated) plus
    * one narrow hash projection; ratios hold in expectation over
    * CLUSTERS (singletons dominate any real corpus, so doc ratios
    * track closely). → (id, cluster_id, split).
    * (DedupSpec pins cluster co-assignment and the zero-leakage
    * composition with [[splitLeakage]].) */
  def leakageSafeSplits(
      df: DataFrame, idCol: String, textCol: String,
      ratios: Seq[(String, Double)], seed: Long = 42L, portable: Boolean = false,
      n: Int = 3, k: Int = 16, bands: Int = 8, threshold: Double = 0.5): DataFrame = {
    val pairs = minhashLshPairs(df, idCol, textCol, n, k, bands, threshold)
    val clusters = dedupClusters(pairs, df.select(col(idCol).as("id")))
    graft.services.Curator.assignSplits(
      clusters, col("cluster_id"), ratios, seed, portable)
  }

  /** Connected components over a near-dup pair graph: every node gets
    * the MINIMUM id reachable through pairs as its cluster id
    * (singletons cluster with themselves). Adaptive, like
    * [[jaccardPairs]]: the edge set is proportional to NEAR-DUP PAIRS —
    * tiny relative to the corpus even at 100 TB — so when it fits under
    * `maxDriverEdges` a driver-side union-find resolves components in
    * one collect + one broadcast join (micro-seconds of CPU vs 3–4
    * distributed rounds of fixed job overhead). Beyond the threshold,
    * iterative min-label propagation takes over — each round one join +
    * aggregate over the edge set, rounds = graph diameter (2–4 for
    * near-dup clusters), one did-anything-change scalar read per round.
    *
    * `allIds` supplies the node universe (docs with no pairs still get
    * a cluster row). → (id, cluster_id) */
  def dedupClusters(
      pairs: DataFrame, allIds: DataFrame, maxIter: Int = 10,
      maxDriverEdges: Long = 4000000): DataFrame = {
    // Materialize the edge set once — every propagation round joins it.
    // Each pair explodes into its two directed edges in ONE pass over
    // the pair pipeline; the union-of-two-selects formulation would
    // evaluate the entire upstream lineage (e.g. the full LSH pipeline)
    // twice. localCheckpoint, NOT cache(): Spark plans a cached
    // sub-tree without adaptive execution, so the skewed LSH band join
    // upstream loses AQE's coalesce/skew handling — measured 97 s for
    // the cache fill vs 44 s for the same pipeline under AQE at the
    // 500k-doc tier (r16 growth gate catch, q114 at 16.6× vs its 10.5
    // second-decade budget). The checkpoint executes the plan through
    // the normal AQE path and leaves a flat RDD-backed relation.
    val edges = pairs.select(explode(array(
        struct(col("id_1").as("a"), col("id_2").as("b")),
        struct(col("id_2").as("a"), col("id_1").as("b")))).as("_e"))
      .select(col("_e.a").as("a"), col("_e.b").as("b"))
      .localCheckpoint(true)
    // Fast path: bounded collect over the materialized edges.
    val edgeCount = edges.count()
    if (edgeCount <= maxDriverEdges) {
      val spark = pairs.sparkSession
      import spark.implicits._
      // Tuple2 is @specialized on Long, so this lands as flat 16-byte
      // pairs (~64 MB at the 4M-edge default), not boxed Rows.
      val collected = edges.filter(col("a") < col("b"))
        .select(col("a"), col("b")).as[(Long, Long)].collect()
      // (checkpointed edges free via the ContextCleaner once unreferenced)
      // Driver-heap math at maxDriverEdges = 4M: ≤8M distinct nodes →
      // the open-addressing table pre-sizes to the next power of two at
      // ≤50% load = 2^24 slots → keys 128 MB + parents 128 MB + 16 MB
      // occupancy = ~270 MB of flat arrays, no per-entry boxing, no GC
      // churn (the boxed mutable.Map this replaces cost ~1 GB in
      // Long-box + entry objects at the same size).
      val uf = new LongUnionFind(expectedNodes = 2 * collected.length)
      var i = 0
      while (i < collected.length) { uf.union(collected(i)._1, collected(i)._2); i += 1 }
      // labels ≤ edge-incident nodes ≤ 2·maxDriverEdges rows → broadcast
      return allIds
        .join(broadcast(uf.entries.toDF("id", "cluster_id")), Seq("id"), "left")
        .select(col("id"), coalesce(col("cluster_id"), col("id")).as("cluster_id"))
    }
    // Propagate over edge-incident nodes ONLY — in a near-dup corpus
    // almost every document is a singleton, and singletons can never
    // change label; they rejoin once, lazily, after the fixpoint. At
    // 100 TB this iterates over the pair graph (small), not the corpus.
    // Pregel-style rounds TRUNCATE lineage every iteration with an
    // eager localCheckpoint, not cache(): a cached round still NESTS
    // the whole previous round in its logical plan, so planning work
    // (and any cache rebuild after the per-round unpersist) grows
    // geometrically with the round count — the old cache+unpersist
    // loop burned driver-CPU-minutes by round ~10 (round-9 boundary
    // test caught it). A checkpointed round starts the next plan from
    // a flat LogicalRDD: constant planning cost per round, and no
    // cache-dependency chain to rebuild. Superseded rounds' blocks are
    // freed by the ContextCleaner when their RDDs are GC'd.
    var labels = edges.select(col("a").as("id")).distinct()
      .select(col("id"), col("id").as("cluster_id")).localCheckpoint(true)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val viaNeighbor = edges
        .join(labels.select(col("id").as("b"), col("cluster_id").as("_nl")), Seq("b"))
        .groupBy(col("a").as("id")).agg(min(col("_nl")).as("_minNeighbor"))
      // the did-anything-change flag rides along in the same select, so
      // the checkpoint materialization is the round's only full pass
      // and the convergence probe is a cheap scan of its blocks.
      val next = labels.join(viaNeighbor, Seq("id"), "left")
        .select(col("id"),
          least(col("cluster_id"), coalesce(col("_minNeighbor"), col("cluster_id"))).as("cluster_id"),
          (col("_minNeighbor") < col("cluster_id")).as("_changed"))
        .localCheckpoint(true)
      val changed = next.filter(col("_changed")).count() > 0
      labels = next
      converged = !changed
      iter += 1
    }
    val finalLabels = labels.select("id", "cluster_id")
    // (checkpointed edges free via the ContextCleaner once unreferenced)
    allIds.join(finalLabels, Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster_id"), col("id")).as("cluster_id"))
  }

  /** End-to-end near-dup REMOVAL: MinHash+LSH pairs → components →
    * keep the minimum-id document per cluster. */
  def removeNearDuplicates(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 16, bands: Int = 8, threshold: Double = 0.5): DataFrame = {
    val pairs = minhashLshPairs(df, idCol, textCol, n, k, bands, threshold)
    val clusters = dedupClusters(pairs, df.select(col(idCol).as("id")))
    df.join(clusters.filter(col("id") === col("cluster_id")).select(col("id").as(idCol)), Seq(idCol))
  }

  /** Near-dup removal keeping the BEST document per cluster instead of
    * the min-id one — the curation-aware policy (RefinedWeb-style: of
    * a duplicate group, keep the copy the quality filters score
    * highest; min-id is an accident of crawl order). `quality` is any
    * column expression over `df`'s row (e.g.
    * [[graft.text.TextAnalysis]] quality metrics); ties break to the
    * smaller id, so selection is deterministic. One extra shuffle over
    * [[removeNearDuplicates]]: the per-cluster max_by aggregate. */
  def removeNearDuplicatesBy(
      df: DataFrame, idCol: String, textCol: String, quality: Column,
      n: Int = 3, k: Int = 16, bands: Int = 8, threshold: Double = 0.5): DataFrame = {
    val pairs = minhashLshPairs(df, idCol, textCol, n, k, bands, threshold)
    val clusters = dedupClusters(pairs, df.select(col(idCol).as("id")))
    val keep = df.select(col(idCol).as("id"), quality.as("_q"))
      .join(clusters, "id")
      .groupBy("cluster_id")
      // max_by on (quality asc, id desc) struct: highest quality wins,
      // ties to the SMALLER id (negated id orders descending)
      .agg(max_by(col("id"), struct(col("_q"), -col("id"))).as("id"))
      .select(col("id").as(idCol))
    df.join(keep, Seq(idCol))
  }

  /** Primitive-long union-find over an open-addressing hash table
    * (linear probing, power-of-two capacity pre-sized to ≤50% load —
    * never grows, so every insert is O(probe chain) with no rehash).
    * Union always attaches the LARGER root under the smaller, so after
    * path compression `find(x)` is the minimum id reachable from x —
    * the cluster-id convention [[dedupClusters]] needs. Both endpoints
    * of every union are inserted as keys, so [[entries]] enumerates
    * exactly the edge-incident nodes. */
  private final class LongUnionFind(expectedNodes: Int) {
    private val cap: Int = {
      var c = 64
      while (c < expectedNodes * 2 && c < (1 << 30)) c <<= 1
      c
    }
    private val mask = cap - 1
    private val keys = new Array[Long](cap)
    private val parents = new Array[Long](cap)
    private val used = new Array[Boolean](cap)
    private var count = 0

    /** Slot of key k (its own slot if absent). Fibonacci-mix then mask —
      * sequential ids would otherwise chain badly under linear probing. */
    private def slot(k: Long): Int = {
      var h = k * -7046029254386353131L // golden-ratio odd constant
      h ^= (h >>> 32)
      var i = h.toInt & mask
      while (used(i) && keys(i) != k) i = (i + 1) & mask
      i
    }

    /** Current parent (k itself when never linked). */
    private def parentOf(k: Long): Long = {
      val i = slot(k); if (used(i)) parents(i) else k
    }

    private def setParent(k: Long, p: Long): Unit = {
      val i = slot(k)
      if (!used(i)) {
        require(count < cap - 1, "LongUnionFind over capacity — expectedNodes was wrong")
        used(i) = true; keys(i) = k; count += 1
      }
      parents(i) = p
    }

    def find(x: Long): Long = {
      var r = x
      var p = parentOf(r)
      while (p != r) { r = p; p = parentOf(r) }
      var c = x // path compression
      while (c != r) { val n = parentOf(c); setParent(c, r); c = n }
      r
    }

    def union(x: Long, y: Long): Unit = {
      val rx = find(x); val ry = find(y)
      if (rx != ry) { if (rx < ry) setParent(ry, rx) else setParent(rx, ry) }
      // ensure both endpoints are enumerable via `entries` (a root that
      // is never linked under anything would otherwise have no slot)
      if (slotAbsent(x)) setParent(x, find(x))
      if (slotAbsent(y)) setParent(y, find(y))
    }

    private def slotAbsent(k: Long): Boolean = !used(slot(k))

    /** (node, min-reachable-id) for every node seen by [[union]].
      * Labels resolve into a primitive array first; the returned
      * IndexedSeq builds each tuple on demand as the Dataset encoder
      * iterates — no second driver-side materialization of boxed
      * tuples. */
    def entries: IndexedSeq[(Long, Long)] = {
      val occupied = Array.range(0, cap).filter(used)
      val labels = new Array[Long](occupied.length)
      var j = 0
      while (j < occupied.length) { labels(j) = find(keys(occupied(j))); j += 1 }
      new scala.collection.immutable.IndexedSeq[(Long, Long)] {
        def length: Int = occupied.length
        def apply(idx: Int): (Long, Long) = (keys(occupied(idx)), labels(idx))
      }
    }
  }

  // ---- SimHash ----

  /** 64-bit SimHash over a document's distinct tokens: bit i of the
    * fingerprint is the sign of Σ_tokens (bitᵢ(h(token)) ? +1 : −1).
    * One groupBy(id) with 64 small sum-aggregates. → (id, simhash)
    *
    * The per-token hash is PORTABLE by construction — the first two
    * 32-bit words of md5(token), the same scheme the MinHash shingle
    * ids use — so an external engine (the DuckDB oracle, q93) can
    * replay the fingerprint bit-for-bit: bits 0..31 come from word 1,
    * bits 32..63 from word 2. Two 32-bit words, not one 64-bit value,
    * because a 16-hex-digit md5 prefix ≥ 2^63 has no lossless path
    * through `conv`/CAST in either engine. */
  def simhash64(sets: DataFrame): DataFrame = {
    // md5+conv hoisted into one projection below the aggregate — the
    // minhashSignatures stance (r20, guide §2.3): the two 32-bit
    // halves are computed once per row instead of riding 64 sum-agg
    // expression trees, and the aggregate input narrows to
    // (id, long, long). Same arithmetic, bit-identical fingerprints.
    val hex = md5(col("item"))
    val hashed = sets.select(col("id"),
      conv(substring(hex, 1, 8), 16, 10).cast("long").as("_hlo"),
      conv(substring(hex, 9, 8), 16, 10).cast("long").as("_hhi"))
    val bitAggs = (0 until 64).map { i =>
      val h = if (i < 32) col("_hlo") else col("_hhi")
      sum(when(shiftright(h, i % 32).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"_b_$i")
    }
    val agg = hashed.groupBy("id").agg(bitAggs.head, bitAggs.tail: _*)
    val fp = (0 until 64)
      .map(i => when(col(s"_b_$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
      .reduce(_ bitwiseOR _)
    agg.select(col("id"), fp.as("simhash"))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Near-pairs within `maxDist` bits. Pigeonhole banding: two
    * fingerprints within d bits must share at least one of d+1 equal
    * bands, so candidates come from shuffling on (64/bands)-bit band
    * values (`bands` bands ⇒ exact for d ≤ bands−1), then verifying
    * bit_count — never an all-pairs comparison. The default 4×16-bit
    * split is the text-simhash shape (q93, d ≤ 3); perceptual-hash
    * callers with a wider radius (image pHash, d ≤ 7) pass bands = 8
    * — narrower 8-bit bands collide more often, the price of exact
    * recall at the larger distance. */
  def simhashNearPairs(sigs0: DataFrame, maxDist: Int = 3, bands: Int = 4): DataFrame = {
    require(bands > 0 && 64 % bands == 0, s"bands must divide 64, got $bands")
    val bandBits = 64 / bands
    val bandMask = if (bandBits == 64) -1L else (1L << bandBits) - 1L
    // The fingerprint lineage (tokenize Generate + DISTINCT shuffle +
    // 64-sum aggregate) feeds BOTH sides of the band self-join, and the
    // planner broadcasts one side — a BroadcastExchange and a shuffle
    // Exchange never canonicalize equal, so ReusedExchange CANNOT
    // collapse the duplication (unlike minhashLshPairs, where both
    // sides shuffle identically and checkpointing measurably hurt).
    // Materialize once into executor-local blocks; measured q93 bench
    // min 1.60 → 1.27 s at sf0.1 (checkpoint cost included), warm
    // re-execution 1.70 → 0.57 s.
    val sigs = sigs0.localCheckpoint(true)
    val banded = sigs.select(col("id"), col("simhash"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), b * bandBits).bitwiseAND(bandMask).as("sig"))): _*)).as("_b"))
      .select(col("id"), col("simhash"), col("_b.band").as("band"), col("_b.sig").as("sig"))
    banded.toDF("id_1", "sh_1", "band", "sig")
      .join(banded.toDF("id_2", "sh_2", "band", "sig"), Seq("band", "sig"))
      .filter(col("id_1") < col("id_2"))
      .select("id_1", "id_2", "sh_1", "sh_2")
      .distinct()
      .withColumn("distance", hammingDistance(col("sh_1"), col("sh_2")))
      .filter(col("distance") <= maxDist)
      .select("id_1", "id_2", "distance")
  }

  /** Incremental Hamming near-dup: probe a NEW batch of 64-bit
    * fingerprints against an EXISTING signed corpus — the
    * [[incrementalNearDups]] daily-crawl contract carried to the
    * whole fingerprint family, text simhash (q93) and the perceptual
    * hashes alike (image pHash q134, acoustic q144, video frames
    * q145 all emit (id, simhash)-shaped rows): re-fingerprinting
    * 100 TB of history per batch is the thing to avoid, and a
    * fingerprint store — 16 bytes/row, a
    * [[graft.sources.VersionedTable]] with one appended version per
    * batch — is all the history the probe needs.
    *
    * The band join is ASYMMETRIC: only the batch's band rows probe
    * the corpus's, so old×old pairs are never generated and work
    * scales with |batch| · collision rate, not |corpus|². A
    * re-crawled id (present in both frames) contributes its NEW
    * fingerprint only — the stale store row is anti-joined out
    * against the broadcast batch ids before the union, the
    * [[incrementalNearDups]] staleness rule. Hamming verifies before
    * the pair-distinct (the q145 lesson: band-duplicate candidates
    * die in the codegen'd filter, not in a shuffle). Exactness is the
    * pigeonhole bound: d ≤ `bands` − 1 for every pair involving ≥ 1
    * batch document. → (id_1, id_2, distance), id_1 < id_2. */
  def simhashNearPairsIncremental(
      newSigs0: DataFrame, oldSigs: DataFrame,
      maxDist: Int = 3, bands: Int = 4): DataFrame = {
    require(bands > 0 && 64 % bands == 0, s"bands must divide 64, got $bands")
    require(maxDist >= 0 && maxDist <= bands - 1,
      s"maxDist must be in [0, ${bands - 1}] ($bands-band pigeonhole exactness bound), got $maxDist")
    val bandBits = 64 / bands
    val bandMask = if (bandBits == 64) -1L else (1L << bandBits) - 1L
    // The batch is SMALL by the incremental contract and feeds three
    // consumers (the anti-join build side, its own band rows, the
    // union) — materialize once; oldSigs stays lazy, by the same
    // contract a persisted prunable table.
    val newSigs = newSigs0.select(col("id"), col("simhash")).localCheckpoint(true)
    val oldOnly = oldSigs.select(col("id"), col("simhash"))
      .join(broadcast(newSigs.select("id")), Seq("id"), "left_anti")
    val all = oldOnly.unionByName(newSigs)
    def banded(df: DataFrame, idAs: String, shAs: String): DataFrame =
      df.select(col("id").as(idAs), col("simhash").as(shAs),
        explode(array((0 until bands).map(b =>
          struct(lit(b).as("band"),
            shiftright(col("simhash"), b * bandBits).bitwiseAND(bandMask).as("sig"))): _*)).as("_b"))
        .select(col(idAs), col(shAs), col("_b.band").as("band"), col("_b.sig").as("sig"))
    banded(newSigs, "_ida", "_sha")
      .join(banded(all, "_idb", "_shb"), Seq("band", "sig"))
      .filter(col("_ida") =!= col("_idb"))
      .withColumn("distance", hammingDistance(col("_sha"), col("_shb")))
      .filter(col("distance") <= maxDist)
      .select(least(col("_ida"), col("_idb")).as("id_1"),
        greatest(col("_ida"), col("_idb")).as("id_2"), col("distance"))
      .distinct()
  }
}
