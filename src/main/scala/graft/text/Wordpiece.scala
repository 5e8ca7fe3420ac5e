package graft.text

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** WordPiece tokenizer TRAINING and APPLICATION — the third published
  * subword family beside [[Bpe]] and [[Unigram]] (Schuster & Nakajima
  * 2012; BERT's tokenizer; the score and loop mirror the published
  * HuggingFace `tokenizers` WordPiece trainer, itself the public
  * reference for the algorithm).
  *
  * Differences from BPE, exactly two:
  *   1. SYMBOLS carry position: a word's non-initial characters get
  *      the `##` continuation prefix ("hello" → h ##e ##l ##l ##o),
  *      and a merge of (l, r) produces l + r-without-## ("h" + "##e"
  *      → "he", "##l" + "##l" → "##ll").
  *   2. The merge SCORE is the likelihood ratio count(l,r) /
  *      (count(l)·count(r)) — pairs whose parts rarely occur apart
  *      win over merely frequent pairs — with ties on (score desc,
  *      left asc, right asc) and the stopping floor on the raw pair
  *      COUNT (`minFreq`), as in the reference trainer.
  *
  * The Spark split is [[Bpe]]'s verbatim: ONE corpus pass
  * ([[Bpe.wordCounts]]), then an adaptive driver / distributed merge
  * loop over the Heaps-bounded word-frequency table — the distributed
  * twin runs one vocabulary-bounded pair-count aggregation, one
  * symbol-count aggregation and a single-row argmax per merge, with
  * lineage checkpointed. Both paths compute the score with the SAME
  * IEEE double expression, so they are bit-identical by construction
  * (WordpieceSpec pins them on a vocabulary straddling the bound).
  *
  * ENCODING is greedy longest-match-first over the final vocabulary
  * (BERT's WordPieceTokenizer): longest vocab prefix, then the
  * `##`-prefixed remainder, `[UNK]` when stuck — run once per
  * DISTINCT word, per-occurrence work is explode/join/agg (the q141
  * shape).
  */
object Wordpiece {

  /** One learned merge: at `rank`, (`left`, `right`) fuse into
    * `merged` (= left + right minus its `##`); `freq` is the pair
    * count, `score` the winning likelihood ratio. */
  final case class Merge(rank: Int, left: String, right: String,
      merged: String, freq: Long, score: Double)

  val Unk = "[UNK]"
  private val Cont = "##"

  private def join(l: String, r: String): String = l + r.stripPrefix(Cont)

  /** Learn `nMerges` merges. Adaptive driver/distributed exactly like
    * [[Bpe.train]]; see the object doc for the score/stop contract. */
  def train(
      docs: DataFrame, textCol: String, nMerges: Int,
      minFreq: Long = 2L, maxDriverVocab: Long = 2000000L): Seq[Merge] = {
    require(nMerges >= 0, s"nMerges must be non-negative, got $nMerges")
    require(minFreq >= 1, s"minFreq must be at least 1, got $minFreq")
    val wc = Bpe.wordCounts(docs, textCol).persist()
    try {
      val vocabN = wc.count()
      if (vocabN <= maxDriverVocab) {
        val rows = wc.collect().map(r => (r.getString(0), r.getLong(1)))
        trainDriver(rows, nMerges, minFreq)
      } else trainDistributed(wc, nMerges, minFreq)
    } finally { wc.unpersist(); () }
  }

  /** The learned merge table as the persistable artifact. */
  def mergesDf(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.map(m => (m.rank, m.left, m.right, m.merged, m.freq, m.score))
      .toDF("rank", "left", "right", "merged", "freq", "score")
  }

  /** The encoder's vocabulary: every initial symbol (chars and
    * ##chars of the training corpus) plus every merged token. */
  def vocabulary(wc: Seq[(String, Long)], merges: Seq[Merge]): Set[String] = {
    val init = wc.iterator.flatMap { case (w, _) => wpSplit(w) }.toSet
    init ++ merges.iterator.map(_.merged)
  }

  /** [[vocabulary]] from the corpus directly — the collect is
    * ALPHABET-bounded (distinct initial symbols ≤ 2·|charset|), never
    * the word table. */
  def vocabularyFromCorpus(
      docs: DataFrame, textCol: String, merges: Seq[Merge]): Set[String] = {
    val init = Bpe.wordCounts(docs, textCol)
      .select(explode(wpSplitCol(col("word"))).as("s")).distinct()
      .collect().map(_.getString(0)).toSet
    init ++ merges.iterator.map(_.merged)
  }

  private[text] def trainDriver(
      wc: Seq[(String, Long)], nMerges: Int, minFreq: Long): Seq[Merge] = {
    val words: Array[Array[String]] = wc.iterator
      .map { case (w, _) => wpSplit(w) }.toArray
    val freqs: Array[Long] = wc.iterator.map(_._2).toArray
    val pairCounts = mutable.HashMap.empty[(String, String), Long]
    val symCounts = mutable.HashMap.empty[String, Long]
    val where = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    def index(i: Int, sign: Long): Unit = {
      val s = words(i); var j = 0
      while (j < s.length) {
        val cs = symCounts.getOrElse(s(j), 0L) + sign * freqs(i)
        if (cs == 0L) symCounts.remove(s(j)) else symCounts(s(j)) = cs
        if (j < s.length - 1) {
          val p = (s(j), s(j + 1))
          val c = pairCounts.getOrElse(p, 0L) + sign * freqs(i)
          if (c == 0L) pairCounts.remove(p) else pairCounts(p) = c
          if (sign > 0L) where.getOrElseUpdate(p, mutable.Set.empty) += i
        }
        j += 1
      }
    }
    var i = 0
    while (i < words.length) { index(i, 1L); i += 1 }
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var exhausted = false
    while (rank < nMerges && !exhausted) {
      // deterministic argmax on the double score (the SAME IEEE
      // expression the distributed twin evaluates), ties (l, r) asc
      var best: (String, String) = null
      var bestScore = 0.0
      var bestF = 0L
      pairCounts.foreach { case (p, f) =>
        if (f >= minFreq) {
          val sc = f.toDouble / (symCounts(p._1).toDouble * symCounts(p._2).toDouble)
          if (sc > bestScore || (sc == bestScore && best != null &&
              (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))) {
            best = p; bestScore = sc; bestF = f
          }
        }
      }
      if (best == null) exhausted = true
      else {
        merges += Merge(rank, best._1, best._2, join(best._1, best._2), bestF, bestScore)
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

  /** Distributed twin past the driver bound: per merge one pair-count
    * aggregation, one symbol-count aggregation (both vocabulary-
    * bounded), a single-row argmax collect, and a narrow fold rewrite
    * with checkpointed lineage. Scores are the same IEEE doubles the
    * driver computes, so the two paths are bit-identical. */
  private[graft] def trainDistributed(
      wc: DataFrame, nMerges: Int, minFreq: Long): Seq[Merge] = {
    var words = wc.select(wpSplitCol(col("word")).as("symbols"), col("freq"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var exhausted = false
    while (rank < nMerges && !exhausted) {
      val pairs = words
        .select(explode(adjacentPairs(col("symbols"))).as("pair"), col("freq"))
        .groupBy(col("pair.l").as("l"), col("pair.r").as("r"))
        .agg(sum("freq").as("pf"))
      val syms = words
        .select(explode(col("symbols")).as("s"), col("freq"))
        .groupBy("s").agg(sum("freq").as("sf"))
      val top = pairs
        .filter(col("pf") >= minFreq)
        .join(syms.select(col("s").as("l"), col("sf").as("lf")), "l")
        .join(syms.select(col("s").as("r"), col("sf").as("rf")), "r")
        .select(col("l"), col("r"), col("pf"),
          (col("pf").cast("double") /
            (col("lf").cast("double") * col("rf").cast("double"))).as("score"))
        .orderBy(col("score").desc, col("l").asc, col("r").asc)
        .limit(1).collect() // bounded: one row
      if (top.isEmpty) exhausted = true
      else {
        val (l, r) = (top(0).getString(0), top(0).getString(1))
        merges += Merge(rank, l, r, join(l, r), top(0).getLong(2), top(0).getDouble(3))
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

  /** Greedy longest-match-first WordPiece encoding of one word
    * (BERT's apply algorithm): take the longest vocabulary prefix,
    * continue with the ##-prefixed remainder; an unmatchable word
    * encodes as ONE `[UNK]`. */
  def encodeWord(word: String, vocab: Set[String],
      maxInputChars: Int = 100): Seq[String] = {
    if (word.isEmpty) return Seq.empty
    // the reference tokenizer's guard: pathological words are one UNK,
    // never a quadratic prefix scan
    if (word.length > maxInputChars) return Seq(Unk)
    val out = Seq.newBuilder[String]
    var start = 0
    while (start < word.length) {
      var end = word.length
      var found: String = null
      while (end > start && found == null) {
        val piece0 = word.substring(start, end)
        val piece = if (start > 0) Cont + piece0 else piece0
        if (vocab(piece)) found = piece else end -= 1
      }
      if (found == null) return Seq(Unk)
      out += found
      start = end
    }
    out.result()
  }

  /** Per-document WordPiece token accounting: (idCol, n_words,
    * n_wp_tokens, n_unk_words). The vocabulary travels broadcast; the
    * greedy encoder runs once per DISTINCT word (the q141 shape —
    * per-occurrence work is explode/join/agg, UDF-free). */
  def tokenCounts(
      docs: DataFrame, idCol: String, textCol: String,
      vocab: Set[String]): DataFrame = {
    val spark = docs.sparkSession
    val vb = spark.sparkContext.broadcast(vocab)
    val enc = udf((w: String) => {
      val toks = encodeWord(w, vb.value)
      (toks.length, if (toks == Seq(Unk)) 1 else 0)
    })
    val words = docs.select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("word"))
    val dict = words.select("word").distinct()
      .withColumn("_e", enc(col("word")))
    words.join(dict, "word")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"),
        sum(col("_e._1")).cast("long").as("n_wp_tokens"),
        sum(col("_e._2")).cast("long").as("n_unk_words"))
  }

  // ---- symbol helpers (the ## twins of Bpe's) ----------------------

  /** "hello" → [h, ##e, ##l, ##l, ##o]; empty word → empty array. */
  private[text] def wpSplit(word: String): Array[String] = {
    val cs = word.iterator.map(_.toString).toArray
    var j = 1
    while (j < cs.length) { cs(j) = Cont + cs(j); j += 1 }
    cs
  }

  private def wpSplitCol(word: Column): Column = {
    val chars = filter(split(word, ""), s => s =!= "")
    transform(chars, (c, i) => when(i === 0, c).otherwise(concat(lit(Cont), c)))
  }

  private def adjacentPairs(symbols: Column): Column =
    zip_with(
      slice(symbols, lit(1), greatest(size(symbols) - 1, lit(0))),
      slice(symbols, lit(2), greatest(size(symbols) - 1, lit(0))),
      (l, r) => struct(l.as("l"), r.as("r")))

  /** Left-to-right non-overlapping rewrite; a just-merged token can
    * never re-match `left` (merged = left + a nonempty tail). */
  private def foldMerge(symbols: Column, left: String, right: String): Column = {
    val merged = join(left, right)
    aggregate(
      symbols,
      array().cast(ArrayType(StringType)),
      (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(left) && x === lit(right),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(merged))))
          .otherwise(concat(acc, array(x))))
  }

  private def mergePair(syms: Array[String], left: String, right: String): Array[String] = {
    val out = Array.newBuilder[String]
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == left && syms(j + 1) == right) {
        out += join(left, right); j += 2
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
