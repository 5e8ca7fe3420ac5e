package graft

import org.apache.spark.sql.functions._

import graft.text.Bpe

/** BPE tokenizer training + encoding semantics.
  *
  * The anchor is [[BpeSpec.refTrain]]: an INDEPENDENT straight-line
  * re-implementation of Sennrich-style BPE (recount every pair from
  * scratch each iteration, no inverted index, no incremental updates)
  * against which both production paths — the driver incremental
  * algorithm and the distributed fold-merge loop — must agree merge
  * for merge. Disagreement localizes the bug: ref vs driver is the
  * index bookkeeping, driver vs distributed is the fold.
  */
class BpeSpec extends SparkSpec {

  import BpeSpec._

  private def corpusDf(docs: Seq[String]) = {
    import spark.implicits._
    docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("train matches the Sennrich reference on the classic low/lower/newest/widest corpus") {
    // Sennrich et al. 2016 §3.2 word frequencies, as a corpus
    val docs = Seq.fill(5)("low").mkString(" ") ::
      Seq.fill(2)("lower").mkString(" ") ::
      Seq.fill(6)("newest").mkString(" ") ::
      Seq.fill(3)("widest").mkString(" ") :: Nil
    val expected = refTrain(
      Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L), 8, 2L)
    val got = Bpe.train(corpusDf(docs), "text", nMerges = 8, minFreq = 2L)
    assert(got.map(m => (m.rank, m.left, m.right, m.freq)) ==
      expected.map(m => (m.rank, m.left, m.right, m.freq)))
    // the classic first merges: (e,s) freq 9 then (es,t) freq 9
    assert(got.take(2).map(m => (m.left, m.right)) == Seq(("e", "s"), ("es", "t")))
  }

  test("distributed fallback produces the identical merge sequence") {
    val docs = Seq("the theme thesis then", "the theme anthem", "aaaa aaaa aa banana bananas")
    val df = corpusDf(docs)
    val wc = Bpe.wordCounts(df, "text")
    val viaDriver = Bpe.train(df, "text", nMerges = 10, minFreq = 2L)
    val viaDistributed = Bpe.trainDistributed(wc, nMerges = 10, minFreq = 2L)
    assert(viaDriver == viaDistributed)
    // and both match the from-scratch reference
    val freqs = wc.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaDriver == refTrain(freqs, 10, 2L))
  }

  test("overlapping runs: pair counts include overlaps, merges rewrite left-to-right non-overlapping") {
    // "aaaa" x3: pair (a,a) counts 3 per word = 9; merging gives [aa,aa]
    val df = corpusDf(Seq("aaaa aaaa aaaa"))
    val merges = Bpe.train(df, "text", nMerges = 2, minFreq = 2L)
    assert(merges.head == Bpe.Merge(0, "a", "a", 9L))
    // after (a,a)->aa each word is [aa,aa]: next pair (aa,aa) freq 3
    assert(merges(1) == Bpe.Merge(1, "aa", "aa", 3L))
    assert(merges == refTrain(Map("aaaa" -> 3L), 2, 2L))
  }

  test("minFreq stops training; rare words still feed global pair counts") {
    // "th" appears once in each of three distinct singleton words:
    // global freq 3 even though every word has freq 1
    val df = corpusDf(Seq("this", "that", "thus"))
    val merges = Bpe.train(df, "text", nMerges = 50, minFreq = 3L)
    assert(merges.nonEmpty)
    assert(merges.head.left == "t" && merges.head.right == "h" && merges.head.freq == 3L)
    // nothing else reaches freq 3 except (th, something)? th+i/a/u are 1 each — stop
    assert(merges.map(m => (m.left, m.right)).forall { case (l, r) => (l + r).startsWith("th") })
    assert(merges == refTrain(Map("this" -> 1L, "that" -> 1L, "thus" -> 1L), 50, 3L))
  }

  test("deterministic tie-break: equal-frequency pairs resolve (left, right) ascending") {
    // "ab" and "cd" both freq 5 — (a,b) must win over (c,d)
    val df = corpusDf(Seq(Seq.fill(5)("ab").mkString(" "), Seq.fill(5)("cd").mkString(" ")))
    val merges = Bpe.train(df, "text", nMerges = 2, minFreq = 2L)
    assert(merges.map(m => (m.left, m.right)) == Seq(("a", "b"), ("c", "d")))
  }

  test("encodeWord reproduces training-final symbols for every training word") {
    val docs = Seq("lowest lower lowly slower", "newest newer news sewn", "widest wide widen")
    val df = corpusDf(docs)
    val merges = Bpe.train(df, "text", nMerges = 12, minFreq = 2L)
    val ranks = merges.map(m => (m.left, m.right) -> m.rank).toMap
    // independent final-symbol computation: replay merges in rank order
    // over the reference representation
    val words = docs.flatMap(_.split(" ")).distinct
    for (w <- words) {
      val viaTraining = refApplyAll(w, merges)
      assert(Bpe.encodeWord(w, ranks) == viaTraining, s"word $w")
    }
    // unseen word: learned subwords still apply
    assert(Bpe.encodeWord("lowers", ranks).mkString("|").replace("|", "") == "lowers")
  }

  test("encodeWord with no merges splits to characters; empty word is empty") {
    assert(Bpe.encodeWord("abc", Map.empty) == Seq("a", "b", "c"))
    assert(Bpe.encodeWord("", Map.empty).isEmpty)
    assert(Bpe.encodeWord("x", Map.empty) == Seq("x"))
  }

  test("tokenCounts: per-doc words and BPE tokens, vocabulary-bounded encode") {
    val docs = Seq("low low lower", "newest widest", "")
    val df = corpusDf(docs)
    val merges = Bpe.train(df, "text", nMerges = 6, minFreq = 2L)
    val ranks = merges.map(m => (m.left, m.right) -> m.rank).toMap
    val got = Bpe.tokenCounts(df, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val expected = docs.zipWithIndex.flatMap { case (t, i) =>
      val ws = t.split(" ").filter(_.nonEmpty)
      if (ws.isEmpty) None
      else Some(i.toLong -> (ws.length.toLong, ws.map(w => Bpe.encodeWord(w, ranks).length.toLong).sum))
    }.toMap
    assert(got == expected) // doc 2 has no words -> no row, like the word explode implies
  }

  test("charPairCounts matches a by-hand count (the q140a oracle kernel)") {
    val df = corpusDf(Seq("aba aba cab"))
    val got = Bpe.charPairCounts(df, "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // aba x2: (a,b)+(b,a) each twice; cab: (c,a),(a,b)
    assert(got == Map(("a", "b") -> 3L, ("b", "a") -> 2L, ("c", "a") -> 1L))
  }

  test("empty corpus and merge-free corpus degrade to zero merges") {
    val empty = corpusDf(Nil)
    assert(Bpe.train(empty, "text", nMerges = 5, minFreq = 2L).isEmpty)
    // all words single-char: no pairs at all
    val singles = corpusDf(Seq("a b c a b"))
    assert(Bpe.train(singles, "text", nMerges = 5, minFreq = 2L).isEmpty)
  }

  test("merge table round-trips through a versioned table and encodes identically") {
    // the artifact a tokenizer SHIPS as: mergesDf committed to a
    // versioned table, reloaded in a later session, rank map rebuilt
    val docs = corpusDf(Seq("lowest lower lowly slower", "newest newer news sewn"))
    val merges = Bpe.train(docs, "text", nMerges = 8, minFreq = 2L)
    assert(merges.nonEmpty)
    val dir = java.nio.file.Files.createTempDirectory("bpe_vt").toString
    graft.sources.VersionedTable.commit(spark, dir, Bpe.mergesDf(spark, merges))
    val reloaded = graft.sources.VersionedTable.read(spark, dir)
      .orderBy("rank").collect()
      .map(r => Bpe.Merge(r.getInt(0), r.getString(1), r.getString(2), r.getLong(4)))
      .toSeq
    assert(reloaded == merges)
    val ranks = reloaded.map(m => (m.left, m.right) -> m.rank).toMap
    val orig = merges.map(m => (m.left, m.right) -> m.rank).toMap
    for (w <- Seq("lowest", "newest", "lowers", "unseen"))
      assert(Bpe.encodeWord(w, ranks) == Bpe.encodeWord(w, orig), s"word $w")
  }

  test("sf0.001 documents: trained merges are nonempty and encode path covers every doc") {
    val docs = Tables.documents(spark, sfDir)
    val merges = Bpe.train(docs, "text", nMerges = 20, minFreq = 2L)
    assert(merges.size == 20) // real text has at least 20 frequent pairs
    assert(merges.map(m => (m.left, m.right)).distinct.size == 20)
    val counts = Bpe.tokenCounts(docs, "doc_id", "text", merges)
    val n = counts.count()
    assert(n == docs.filter(
      size(graft.text.TextAnalysis.tokens(col("text"))) > 0).count())
    // BPE tokens per doc are strictly fewer than chars, at least n_words
    val bad = counts.join(docs, "doc_id")
      .filter(col("n_bpe_tokens") < col("n_words"))
    assert(bad.count() == 0)
  }
}

object BpeSpec {

  /** From-scratch reference BPE (Sennrich et al. 2016 Algorithm 1
    * shape): every iteration recounts ALL pairs from the current
    * symbol table — no incremental state to get wrong. */
  def refTrain(wordFreqs: Map[String, Long], nMerges: Int, minFreq: Long): Seq[Bpe.Merge] = {
    var table: Map[List[String], Long] =
      wordFreqs.map { case (w, f) => w.map(_.toString).toList -> f }
    val out = Seq.newBuilder[Bpe.Merge]
    var rank = 0
    var stop = false
    while (rank < nMerges && !stop) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- table; p <- syms.zip(syms.tail))
        counts(p) = counts.getOrElse(p, 0L) + f
      if (counts.isEmpty) stop = true
      else {
        val (best, f) = counts.toSeq.sortBy { case ((l, r), c) => (-c, l, r) }.head
        if (f < minFreq) stop = true
        else {
          out += Bpe.Merge(rank, best._1, best._2, f)
          table = table.toSeq.map { case (syms, fr) =>
            refMerge(syms, best._1, best._2) -> fr
          }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
          rank += 1
        }
      }
    }
    out.result()
  }

  private def refMerge(syms: List[String], l: String, r: String): List[String] = syms match {
    case a :: b :: rest if a == l && b == r => (l + r) :: refMerge(rest, l, r)
    case a :: rest => a :: refMerge(rest, l, r)
    case Nil => Nil
  }

  /** Training-replay encoding: apply every merge in rank order. */
  def refApplyAll(word: String, merges: Seq[Bpe.Merge]): Seq[String] = {
    var syms = word.map(_.toString).toList
    for (m <- merges) syms = refMerge(syms, m.left, m.right)
    syms
  }
}
