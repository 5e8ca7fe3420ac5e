package graft.text

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Byte-pair-encoding tokenizer TRAINING and APPLICATION at corpus
  * scale — the tokenizer-construction step of an LLM data pipeline
  * (Sennrich et al. 2016, "Neural Machine Translation of Rare Words
  * with Subword Units"; the same word-frequency formulation GPT-2 and
  * SentencePiece BPE use). Completes the token family: q98 counts
  * pre-tokenizer matches ([[TextAnalysis.bpeishTokenCount]]); this
  * LEARNS the merge table those counts approximate, and encodes with
  * it.
  *
  * Spark-first split, mirroring the adaptive q114 union-find and the
  * "centroids are legitimately driver-held" IVF precedent:
  *
  *  - The corpus-scaled step is ONE pass: [[wordCounts]] — explode to
  *    words, hash groupBy. At 100 TB this dominates and it is
  *    scan-linear with a map-side-combined shuffle keyed by word.
  *    Everything after runs on the WORD-FREQUENCY table, whose size is
  *    Heaps-law-sublinear in the corpus.
  *  - The merge LOOP is adaptive like q114's union-find: a pruned
  *    vocabulary ≤ `maxDriverVocab` words runs the textbook
  *    incremental algorithm on the driver (heap math at the call
  *    site of the bound: 2M words × ~24 symbol-array slots × ~48 B
  *    ≈ 2.3 GB, inside the 48 g driver heap with 20× headroom); a
  *    larger one falls back to [[trainDistributed]] — per merge, one
  *    vocabulary-bounded pair-count shuffle plus a narrow fold-merge
  *    map, lineage truncated by localCheckpoint so `nMerges`
  *    iterations cannot stack plans (the dedupClusters lesson).
  *    Neither path ever re-touches the corpus.
  *  - ENCODING ([[tokenCounts]]) applies merges once per DISTINCT
  *    word — the vocabulary-bounded frame — then joins occurrences to
  *    that table and aggregates per document, so the per-occurrence
  *    path is UDF-free and the imperative greedy-merge loop runs
  *    O(vocab), not O(corpus). The join is keyed by word and
  *    broadcast-eligible when the vocabulary is small (AQE decides).
  *
  * Both training paths implement the SAME semantics, pinned against
  * each other and an independent reference implementation in BpeSpec:
  * pair counts include overlapping occurrences (Sennrich's
  * `get_stats`), a merge rewrites all occurrences left-to-right
  * non-overlapping, ties break on (freq desc, left asc, right asc),
  * training stops when the best pair's frequency drops below
  * `minFreq`.
  */
object Bpe {

  /** One learned merge: at `rank`, adjacent symbols (`left`, `right`)
    * fuse into `left + right`; `freq` is the weighted pair count that
    * won the rank. */
  final case class Merge(rank: Int, left: String, right: String, freq: Long)

  /** The one corpus-scaled pass: (word, freq) via the shared
    * [[TextAnalysis.tokens]] pre-tokenization (lowercased alnum runs),
    * so BPE and the rule-based text family agree on what a word is. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** First-iteration training kernel, exposed for the hash-oracle:
    * character-pair counts weighted by word frequency (overlapping
    * occurrences included). Bounded output — at most |alphabet|²
    * rows. */
  def charPairCounts(docs: DataFrame, textCol: String): DataFrame =
    wordCounts(docs, textCol)
      .select(explode(adjacentPairs(charSplit(col("word")))).as("pair"), col("freq"))
      .select(col("pair.l").as("l"), col("pair.r").as("r"), col("freq"))
      .groupBy("l", "r").agg(sum("freq").as("freq"))

  /** Learn `nMerges` merges from the corpus. Adaptive: collects the
    * `minFreq`-pruned vocabulary when it fits `maxDriverVocab` (the
    * default bound's heap math is in the scaladoc above), else runs
    * the distributed per-merge loop. Results are identical by
    * construction (BpeSpec pins both paths to a shared reference). */
  def train(
      docs: DataFrame, textCol: String, nMerges: Int,
      minFreq: Long = 2L, maxDriverVocab: Long = 2000000L): Seq[Merge] = {
    require(nMerges >= 0, s"nMerges must be non-negative, got $nMerges")
    require(minFreq >= 1, s"minFreq must be at least 1, got $minFreq")
    // NOTE the table is NOT pruned by minFreq: a rare word's pairs
    // still add to GLOBAL pair counts (three singletons containing
    // "th" make freq 3), so pruning would change the learned merges.
    // minFreq only stops training when the best pair falls below it.
    val wc = wordCounts(docs, textCol).persist()
    try {
      val vocab = wc.count()
      if (vocab <= maxDriverVocab) {
        val rows = wc.collect().map(r => (r.getString(0), r.getLong(1)))
        trainDriver(rows, nMerges, minFreq)
      } else trainDistributed(wc, nMerges, minFreq)
    } finally { wc.unpersist(); () }
  }

  /** The learned merge table as a frame: (rank, left, right, merged,
    * freq) — the persistable artifact a tokenizer ships as. */
  def mergesDf(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.map(m => (m.rank, m.left, m.right, m.left + m.right, m.freq))
      .toDF("rank", "left", "right", "merged", "freq")
  }

  /** Textbook incremental BPE on the collected (word, freq) table:
    * pair counts plus a pair→word inverted index, so each merge
    * re-counts only the words that contain the winning pair. The
    * per-merge argmax scan is O(distinct pairs); a lazy heap is the
    * known optimization for production vocab sizes and does not change
    * semantics. */
  private[text] def trainDriver(
      wc: Seq[(String, Long)], nMerges: Int, minFreq: Long): Seq[Merge] = {
    val words: Array[Array[String]] = wc.iterator
      .map(_._1.iterator.map(_.toString).toArray).toArray
    val freqs: Array[Long] = wc.iterator.map(_._2).toArray
    val counts = mutable.HashMap.empty[(String, String), Long]
    val where = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    def index(i: Int, sign: Long): Unit = {
      val s = words(i); var j = 0
      while (j < s.length - 1) {
        val p = (s(j), s(j + 1))
        val c = counts.getOrElse(p, 0L) + sign * freqs(i)
        if (c == 0L) counts.remove(p) else counts(p) = c
        if (sign > 0L) where.getOrElseUpdate(p, mutable.Set.empty) += i
        j += 1
      }
    }
    var i = 0
    while (i < words.length) { index(i, 1L); i += 1 }
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var exhausted = false
    while (rank < nMerges && !exhausted) {
      // deterministic argmax: freq desc, then (left, right) asc —
      // HashMap iteration order must not leak into the result
      var best: (String, String) = null
      var bestF = 0L
      counts.foreach { case (p, f) =>
        if (f > bestF || (f == bestF && best != null &&
            (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))) {
          best = p; bestF = f
        }
      }
      if (best == null || bestF < minFreq) exhausted = true
      else {
        merges += Merge(rank, best._1, best._2, bestF)
        // `where` sets go stale as words mutate (a superset, never
        // pruned) — the contains re-check below keeps updates exact
        val affected = where.getOrElse(best, mutable.Set.empty).toArray
        var k = 0
        while (k < affected.length) {
          val w = affected(k)
          if (containsPair(words(w), best._1, best._2)) {
            index(w, -1L)
            words(w) = mergePair(words(w), best._1, best._2)
            index(w, 1L)
          }
          k += 1
        }
        rank += 1
      }
    }
    merges.result()
  }

  /** Distributed fallback for vocabularies past the driver bound: the
    * symbol table stays a DataFrame; each merge is (a) one
    * vocabulary-bounded pair-count aggregation with a single-row
    * collect of the argmax, and (b) a narrow higher-order fold that
    * rewrites the symbol arrays. localCheckpoint after every merge
    * truncates lineage so the loop's plan depth stays O(1). */
  private[graft] def trainDistributed(
      wc: DataFrame, nMerges: Int, minFreq: Long): Seq[Merge] = {
    var words = wc.select(charSplit(col("word")).as("symbols"), col("freq"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var exhausted = false
    while (rank < nMerges && !exhausted) {
      val top = words
        .select(explode(adjacentPairs(col("symbols"))).as("pair"), col("freq"))
        .groupBy(col("pair.l").as("l"), col("pair.r").as("r"))
        .agg(sum("freq").as("freq"))
        .orderBy(col("freq").desc, col("l").asc, col("r").asc)
        .limit(1).collect() // bounded: one row
      if (top.isEmpty || top(0).getLong(2) < minFreq) exhausted = true
      else {
        val (l, r, f) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(rank, l, r, f)
        val next = words
          .withColumn("symbols", foldMerge(col("symbols"), l, r))
          .localCheckpoint(true)
        words.unpersist()
        words = next
        rank += 1
      }
    }
    words.unpersist()
    merges.result()
  }

  /** Greedy BPE encoding of one word: repeatedly merge the
    * lowest-rank adjacent pair present (all its occurrences at once,
    * left-to-right), until no learned pair remains — the standard
    * GPT-2-style apply algorithm. Equal to training's one-pass-per-rank
    * replay except in one corner: when distinct decompositions create
    * the same token string (e.g. merges (a,bc) and (ab,c) both
    * yielding "abc"), a higher-rank merge can recreate an occurrence
    * of a lower-rank pair, which greedy re-merges while replay does
    * not. Such duplicate-token merge tables are possible and accepted
    * — greedy apply is the deployed convention. */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Seq[String] = {
    var syms: Array[String] = word.iterator.map(_.toString).toArray
    var done = syms.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bl: String = null; var br: String = null
      var j = 0
      while (j < syms.length - 1) {
        val rk = ranks.getOrElse((syms(j), syms(j + 1)), Int.MaxValue)
        if (rk < bestRank) { bestRank = rk; bl = syms(j); br = syms(j + 1) }
        j += 1
      }
      if (bl == null) done = true
      else {
        syms = mergePair(syms, bl, br)
        done = syms.length < 2
      }
    }
    syms.toSeq
  }

  /** Per-document BPE token accounting: (idCol, n_words,
    * n_bpe_tokens). The merge table travels as a broadcast rank map;
    * the greedy encoder runs once per DISTINCT word (the sanctioned
    * vocabulary-bounded imperative site — everything per-occurrence
    * is explode/join/agg). */
  def tokenCounts(
      docs: DataFrame, idCol: String, textCol: String, merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    val ranks = spark.sparkContext.broadcast(
      merges.map(m => (m.left, m.right) -> m.rank).toMap)
    val enc = udf((w: String) => encodeWord(w, ranks.value).length)
    val words = docs.select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("word"))
    val vocab = words.select("word").distinct()
      .withColumn("n_word_tokens", enc(col("word")))
    words.join(vocab, "word")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"),
        sum("n_word_tokens").cast("long").as("n_bpe_tokens"))
  }

  /** Word → character symbols (split on the empty pattern keeps
    * per-codepoint granularity; the filter guards the trailing empty
    * string Java's split(-1) emits). */
  private def charSplit(word: Column): Column =
    filter(split(word, ""), s => s =!= "")

  /** Adjacent (l, r) symbol pairs, overlapping occurrences included —
    * Sennrich's get_stats — as an array of structs; empty for
    * single-symbol words. */
  private def adjacentPairs(symbols: Column): Column =
    zip_with(
      slice(symbols, lit(1), greatest(size(symbols) - 1, lit(0))),
      slice(symbols, lit(2), greatest(size(symbols) - 1, lit(0))),
      (l, r) => struct(l.as("l"), r.as("r")))

  /** Left-to-right non-overlapping rewrite of (left, right) → merged
    * as a codegen-friendly fold: the accumulator's last element is
    * the scan head, and a just-merged token can never re-match `left`
    * (merged = left + right with right nonempty). Semantically equal
    * to [[mergePair]] — BpeSpec pins the equivalence. */
  private def foldMerge(symbols: Column, left: String, right: String): Column = {
    val merged = left + right
    aggregate(
      symbols,
      array().cast(ArrayType(StringType)),
      (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(left) && x === lit(right),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(merged))))
          .otherwise(concat(acc, array(x))))
  }

  /** Driver/executor-side twin of [[foldMerge]]. */
  private def mergePair(syms: Array[String], left: String, right: String): Array[String] = {
    val out = Array.newBuilder[String]
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == left && syms(j + 1) == right) {
        out += (left + right); j += 2
      } else { out += syms(j); j += 1 }
    }
    out.result()
  }

  private def containsPair(syms: Array[String], left: String, right: String): Boolean = {
    var j = 0
    while (j < syms.length - 1) {
      if (syms(j) == left && syms(j + 1) == right) return true
      j += 1
    }
    false
  }
}
