package graft.text

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer TRAINING and APPLICATION — the OTHER published
  * subword family beside [[Bpe]] (Kudo 2018, "Subword Regularization:
  * Improving Neural Network Translation Models with Multiple Subword
  * Candidates"; SentencePiece's default model). Where BPE grows a
  * vocabulary bottom-up by merging, unigram starts from a large seed
  * candidate set and SHRINKS it: EM estimates each piece's
  * probability under the one-gram segmentation model, pruning rounds
  * drop the weakest pieces until the target size, and encoding is the
  * Viterbi segmentation under the final probabilities.
  *
  * Spark-first split — deliberately the [[Bpe.train]] shape:
  *
  *  - The corpus-scaled step is the SAME one pass: [[Bpe.wordCounts]]
  *    (explode → map-side-combined word groupBy). Everything after
  *    runs on the word-frequency table, Heaps-law-sublinear in the
  *    corpus; the corpus is never re-touched.
  *  - The EM + prune LOOP is adaptive like [[Bpe.train]]: a
  *    vocabulary ≤ `maxDriverVocab` words runs on the driver (the
  *    Bpe.trainDriver precedent and heap math: candidate count ≤
  *    vocab × maxPieceLen × avg word length, a few hundred MB at the
  *    2M-word driver bound; each E-step is forward-backward DP over
  *    distinct words — O(Σ|word|·maxPieceLen) per iteration); a
  *    larger one runs [[trainDistributed]] — per E-step one
  *    per-distinct-word DP under a broadcast vocabulary plus one
  *    vocabulary-bounded sum groupBy, the model table itself staying
  *    vocabulary-sized. Expected counts QUANTIZE to BIGINT micro-units
  *    per (word, piece) BEFORE summation (the q129 grid), so the sums
  *    are associative-exact and the two paths — and any partitioning —
  *    produce bit-identical models (UnigramSpec pins the equality).
  *  - ENCODING ([[tokenCounts]]) applies Viterbi once per DISTINCT
  *    word, then joins occurrences — the [[Bpe.tokenCounts]] shape:
  *    per-occurrence work is UDF-free, the imperative DP runs
  *    O(vocab), not O(corpus).
  *
  * Faithfulness notes (UnigramSpec pins both against an independent
  * from-scratch reference): E-step posteriors are exact
  * forward-backward expected counts; the M-step is plain maximum
  * likelihood (SentencePiece's Bayesianized digamma smoothing is an
  * implementation refinement, not a semantics change); pruning drops
  * the lowest-probability multi-character pieces (the common
  * simplification of the paper's per-piece likelihood-loss ranking),
  * single characters are never pruned so every word stays
  * segmentable.
  */
object Unigram {

  /** One vocabulary entry of the fitted model. */
  final case class Piece(piece: String, logProb: Double)

  /** Learn a `targetVocab`-piece unigram model from the corpus.
    * `seedSize` bounds the multi-character candidate pool (top by
    * weighted substring frequency, ties lexicographic); `pruneKeep`
    * is the per-round survival fraction (Kudo's shrink schedule);
    * `emIters` EM sweeps run between prunes. */
  def train(
      docs: DataFrame, textCol: String,
      targetVocab: Int = 200, maxPieceLen: Int = 8, seedSize: Int = 2000,
      emIters: Int = 2, pruneKeep: Double = 0.75, minFreq: Long = 1L,
      maxDriverVocab: Long = 2000000L): Seq[Piece] = {
    val wc = Bpe.wordCounts(docs, textCol).filter(col("freq") >= minFreq)
      .persist()
    try {
      if (wc.count() <= maxDriverVocab)
        trainDriver(wc.collect().map(r => (r.getString(0), r.getLong(1))).toSeq,
          targetVocab, maxPieceLen, seedSize, emIters, pruneKeep)
      else trainDistributed(wc, targetVocab, maxPieceLen, seedSize, emIters, pruneKeep)
    } finally { wc.unpersist(); () }
  }

  /** The per-(word, piece) expected-count contribution on the
    * micro-grid: BIGINT units of 1e-6, associative-exact under any
    * summation order (exact while f·10^6 stays inside the double
    * mantissa, i.e. word frequencies < ~8·10^9 — past that coarsen
    * the grid). This is what makes the driver and distributed paths
    * bit-identical. */
  private def microContribs(
      w: String, f: Long, logP: collection.Map[String, Double],
      maxPieceLen: Int): Iterator[(String, Long)] =
    expectedCounts(w, logP, maxPieceLen).iterator.map { case (s, c) =>
      s -> math.floor(f * c * 1e6 + 0.5).toLong
    }

  /** The shared EM + prune loop, parameterized by the E-step engine
    * (`countsOf`: current model → micro expected counts). BOTH paths
    * run exactly this code over exactly these integer sums, so their
    * models cannot diverge. */
  private def trainLoop(
      chars: Vector[String], multi: Vector[String], seedFreq: Map[String, Long],
      countsOf: collection.Map[String, Double] => collection.Map[String, Long],
      targetVocab: Int, emIters: Int, pruneKeep: Double): Seq[Piece] = {
    var vocab: Vector[String] = chars ++ multi
    // init probabilities ∝ weighted frequency (the SentencePiece seed)
    val totalF = vocab.iterator.map(seedFreq).sum.toDouble
    var logP = mutable.HashMap.from(vocab.iterator.map(s =>
      s -> math.log(seedFreq(s) / totalF)))

    def emRound(): Unit = {
      var it = 0
      while (it < emIters) {
        val counts = countsOf(logP)
        val tot = counts.valuesIterator.sum
        // ML M-step; pieces with zero expected count keep a floor so
        // log stays finite (they are first out at the next prune)
        logP = mutable.HashMap.from(vocab.iterator.map { s =>
          val c = counts.getOrElse(s, 0L)
          s -> (if (c > 0L && tot > 0L) math.log(c.toDouble / tot.toDouble) else -1e9)
        })
        it += 1
      }
    }

    emRound()
    while (vocab.length > targetVocab) {
      val multiNow = vocab.filter(_.length > 1)
      val keepMulti = math.max(targetVocab - chars.length,
        math.min(multiNow.length - 1, (multiNow.length * pruneKeep).toInt))
      val kept = multiNow.sortBy(s => (-logP(s), s)).take(math.max(keepMulti, 0))
      val next = (chars ++ kept.sorted).toVector
      if (next.length == vocab.length) return result(vocab, logP) // cannot shrink further
      vocab = next
      logP = logP.filter { case (s, _) => s.length == 1 || kept.contains(s) }
      emRound()
    }
    result(vocab, logP)
  }

  private def checkParams(
      targetVocab: Int, maxPieceLen: Int, seedSize: Int,
      emIters: Int, pruneKeep: Double): Unit = {
    require(targetVocab >= 1, s"targetVocab must be >= 1, got $targetVocab")
    require(maxPieceLen >= 1 && seedSize >= 0 && emIters >= 1)
    require(pruneKeep > 0.0 && pruneKeep < 1.0, s"pruneKeep in (0,1), got $pruneKeep")
  }

  /** Driver kernel on the collected (word, freq) table. */
  private[graft] def trainDriver(
      wc: Seq[(String, Long)], targetVocab: Int, maxPieceLen: Int,
      seedSize: Int, emIters: Int, pruneKeep: Double): Seq[Piece] = {
    checkParams(targetVocab, maxPieceLen, seedSize, emIters, pruneKeep)
    val words = wc.sortBy(_._1)
    if (words.isEmpty) return Seq.empty
    // seed: every substring up to maxPieceLen, weighted by word freq
    // (overlapping occurrences count — the suffix-array candidate
    // extraction's counting semantics)
    val subFreq = mutable.HashMap.empty[String, Long]
    words.foreach { case (w, f) =>
      var i = 0
      while (i < w.length) {
        var j = i + 1
        while (j <= math.min(w.length, i + maxPieceLen)) {
          val s = w.substring(i, j)
          subFreq(s) = subFreq.getOrElse(s, 0L) + f
          j += 1
        }
        i += 1
      }
    }
    val chars = subFreq.keysIterator.filter(_.length == 1).toVector.sorted
    val multi = subFreq.iterator.filter(_._1.length > 1).toVector
      .sortBy { case (s, f) => (-f, s) }.take(seedSize).map(_._1).sorted
    def countsOf(logP: collection.Map[String, Double]): collection.Map[String, Long] = {
      val counts = mutable.HashMap.empty[String, Long]
      words.foreach { case (w, f) =>
        microContribs(w, f, logP, maxPieceLen).foreach { case (s, c) =>
          counts(s) = counts.getOrElse(s, 0L) + c
        }
      }
      counts
    }
    trainLoop(chars, multi, subFreq.toMap, countsOf,
      targetVocab, emIters, pruneKeep)
  }

  /** Distributed twin for vocabularies past the driver bound: the
    * seed is one substring explode + sum groupBy (collected only at
    * the alphabet + `seedSize` bound), and each E-step is one
    * per-distinct-word DP pass under the broadcast current model
    * plus one map-side-partial sum groupBy whose output is
    * vocabulary-bounded. Same [[trainLoop]], same integer sums —
    * bit-identical to [[trainDriver]] (UnigramSpec pins it). */
  private[graft] def trainDistributed(
      wc: DataFrame, targetVocab: Int, maxPieceLen: Int,
      seedSize: Int, emIters: Int, pruneKeep: Double): Seq[Piece] = {
    checkParams(targetVocab, maxPieceLen, seedSize, emIters, pruneKeep)
    val spark = wc.sparkSession
    import spark.implicits._
    val words = wc.select(col("word").cast("string"), col("freq").cast("long"))
      .as[(String, Long)].persist()
    try {
      if (words.isEmpty) return Seq.empty
      val subs = words.flatMap { case (w, f) =>
        for {
          i <- 0 until w.length
          j <- (i + 1) to math.min(w.length, i + maxPieceLen)
        } yield (w.substring(i, j), f)
      }.toDF("piece", "f").groupBy("piece").agg(sum(col("f")).as("freq"))
        .persist()
      val chars = subs.filter(length(col("piece")) === 1)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      val multi = subs.filter(length(col("piece")) > 1)
        .orderBy(col("freq").desc, col("piece").asc).limit(seedSize)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      subs.unpersist()
      val seedFreq = (chars ++ multi).toMap
      def countsOf(logP: collection.Map[String, Double]): collection.Map[String, Long] = {
        val b = spark.sparkContext.broadcast(logP.toMap)
        val out = words.flatMap { case (w, f) =>
          microContribs(w, f, b.value, maxPieceLen)
        }.toDF("piece", "c").groupBy("piece").agg(sum(col("c")).as("c"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        b.destroy()
        out
      }
      trainLoop(chars.map(_._1).sorted.toVector, multi.map(_._1).sorted.toVector,
        seedFreq, countsOf, targetVocab, emIters, pruneKeep)
    } finally { words.unpersist(); () }
  }

  private def result(vocab: Vector[String], logP: mutable.HashMap[String, Double]): Seq[Piece] =
    vocab.sorted.map(s => Piece(s, logP(s)))

  /** Exact forward-backward posterior expected counts of each piece
    * in one word under the current model — the E-step kernel, and the
    * quantity UnigramSpec pins against brute-force enumeration. */
  private[graft] def expectedCounts(
      w: String, logP: collection.Map[String, Double],
      maxPieceLen: Int): Map[String, Double] = {
    val n = w.length
    val NegInf = Double.NegativeInfinity
    def lse(a: Double, b: Double): Double =
      if (a == NegInf) b else if (b == NegInf) a
      else { val m = math.max(a, b); m + math.log(math.exp(a - m) + math.exp(b - m)) }
    val alpha = Array.fill(n + 1)(NegInf); alpha(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        logP.get(w.substring(j, i)).foreach { lp =>
          alpha(i) = lse(alpha(i), alpha(j) + lp)
        }
        j += 1
      }
      i += 1
    }
    if (alpha(n) == NegInf) return Map.empty // unsegmentable under this vocab
    val beta = Array.fill(n + 1)(NegInf); beta(n) = 0.0
    i = n - 1
    while (i >= 0) {
      var k = i + 1
      while (k <= math.min(n, i + maxPieceLen)) {
        logP.get(w.substring(i, k)).foreach { lp =>
          beta(i) = lse(beta(i), lp + beta(k))
        }
        k += 1
      }
      i -= 1
    }
    val out = mutable.HashMap.empty[String, Double]
    i = 0
    while (i < n) {
      var k = i + 1
      while (k <= math.min(n, i + maxPieceLen)) {
        val s = w.substring(i, k)
        logP.get(s).foreach { lp =>
          val post = math.exp(alpha(i) + lp + beta(k) - alpha(n))
          if (post > 0.0) out(s) = out.getOrElse(s, 0.0) + post
        }
        k += 1
      }
      i += 1
    }
    out.toMap
  }

  /** Viterbi segmentation of one word under the model: the
    * max-probability piece sequence; on an exact score tie the LONGER
    * final piece wins (smaller split point — deterministic). A word
    * containing a character outside the vocabulary falls back to
    * per-character pieces with the unknown characters passed through
    * (the SentencePiece unk contract, without a reserved id). */
  def encodeWord(w: String, logP: collection.Map[String, Double], maxPieceLen: Int = 8): Seq[String] = {
    val n = w.length
    if (n == 0) return Seq.empty
    val NegInf = Double.NegativeInfinity
    val best = Array.fill(n + 1)(NegInf); best(0) = 0.0
    val back = Array.fill(n + 1)(-1)
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        logP.get(w.substring(j, i)).foreach { lp =>
          val s = best(j) + lp
          if (s > best(i) || (s == best(i) && j < back(i))) { best(i) = s; back(i) = j }
        }
        j += 1
      }
      i += 1
    }
    if (best(n) == NegInf) return w.map(_.toString) // unk passthrough
    val out = mutable.ListBuffer.empty[String]
    var k = n
    while (k > 0) { out.prepend(w.substring(back(k), k)); k = back(k) }
    out.toSeq
  }

  /** The fitted model as a frame: (piece, log_prob) — the persistable
    * tokenizer artifact. */
  def piecesDf(spark: SparkSession, pieces: Seq[Piece]): DataFrame = {
    import spark.implicits._
    pieces.map(p => (p.piece, p.logProb)).toDF("piece", "log_prob")
  }

  /** Per-document unigram token accounting — the [[Bpe.tokenCounts]]
    * shape: Viterbi once per DISTINCT word (vocabulary-bounded), one
    * word-keyed occurrence join (broadcast-eligible), one per-doc
    * aggregation. → (idCol, n_words, n_unigram_tokens) */
  def tokenCounts(
      docs: DataFrame, idCol: String, textCol: String,
      pieces: Seq[Piece], maxPieceLen: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val logP = pieces.map(p => p.piece -> p.logProb).toMap
    val b = spark.sparkContext.broadcast(logP)
    val occ = docs.select(col(idCol).as("id"),
      explode(TextAnalysis.tokens(col(textCol))).as("word"))
    val perWord = occ.select(col("word")).distinct().as[String]
      .map(w => (w, encodeWord(w, b.value, maxPieceLen).length.toLong))
      .toDF("word", "n_pieces")
    occ.join(perWord, "word")
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("n_pieces")).as("n_unigram_tokens"))
  }
}
