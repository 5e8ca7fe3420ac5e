package graft

import org.apache.spark.sql.DataFrame

import graft.text.{Bpe, Wordpiece}

/** WordPiece tokenizer (text/Wordpiece.scala; Schuster & Nakajima
  * 2012, the HuggingFace trainer as the public reference): likelihood
  * scoring vs BPE frequency, ## continuation symbols, driver ==
  * distributed, greedy longest-match encoding. */
class WordpieceSpec extends SparkSpec {

  private def corpusDf(lines: Seq[String]): DataFrame = {
    import spark.implicits._
    lines.toDF("text")
  }

  test("likelihood score beats raw frequency: rare-but-exclusive pair wins the first merge") {
    // pairs: (a,##b) freq 10 but c(a)=30 (ab×10 + ax×20) → score
    // 10/(30·10) = 1/30; (a,##x) freq 20 → 20/(30·20) = 1/30;
    // (c,##d) freq 2, c(c)=c(##d)=2 → 2/4 = 0.5 — WordPiece picks the
    // exclusive pair BPE would rank last
    val docs = corpusDf(Seq(
      Seq.fill(10)("ab").mkString(" "),
      Seq.fill(20)("ax").mkString(" "),
      Seq.fill(2)("cd").mkString(" ")))
    val merges = Wordpiece.train(docs, "text", nMerges = 1, minFreq = 2L)
    assert(merges.map(m => (m.left, m.right, m.merged, m.freq)) ==
      Seq(("c", "##d", "cd", 2L)))
    assert(merges.head.score == 0.5)
  }

  test("continuation symbols: non-initial merges keep the ## prefix") {
    // "lll" ×4 → symbols [l, ##l, ##l]; pair (##l,##l) freq 4,
    // c(##l) = 8 → score 4/64; pair (l,##l) freq 4, c(l)=4 →
    // 4/(4·8) = 1/8 wins → merged "ll"; then (ll,##l) freq 4,
    // c(ll)=4, c(##l)=4 → 4/16 → merged "lll"
    val merges = Wordpiece.train(corpusDf(Seq(Seq.fill(4)("lll").mkString(" "))),
      "text", nMerges = 2, minFreq = 2L)
    assert(merges.map(m => (m.left, m.right, m.merged)) ==
      Seq(("l", "##l", "ll"), ("ll", "##l", "lll")))
    // a non-initial pair merge keeps ##: "all"×4 + "az"×36 — c(a)=40
    // dilutes every a-initial pair ((a,##l) 4/320, (a,##z) 36/1440 =
    // 1/40) under (##l,##l) = 4/64 → the continuation pair wins
    val m2 = Wordpiece.train(corpusDf(Seq(
      (Seq.fill(4)("all") ++ Seq.fill(36)("az")).mkString(" "))),
      "text", nMerges = 1, minFreq = 2L)
    assert(m2.map(m => (m.left, m.right, m.merged)) == Seq(("##l", "##l", "##ll")),
      s"non-initial merge must keep the continuation prefix: $m2")
  }

  test("ties break lexicographically; minFreq floors on the raw pair count") {
    // (a,##b) and (a,##c) both freq 3 with identical symbol counts →
    // identical scores → (a,##b) wins the tie
    val docs = corpusDf(Seq(
      Seq.fill(3)("ab").mkString(" "), Seq.fill(3)("ac").mkString(" ")))
    val merges = Wordpiece.train(docs, "text", nMerges = 1, minFreq = 2L)
    assert(merges.map(m => (m.left, m.right)) == Seq(("a", "##b")))
    // a singleton pair has PERFECT score 1/(1·1) but sits under
    // minFreq — the floor is the count, not the score
    val rare = corpusDf(Seq("qz " + Seq.fill(5)("ab").mkString(" ")))
    val m = Wordpiece.train(rare, "text", nMerges = 1, minFreq = 2L)
    assert(m.map(x => (x.left, x.right)) == Seq(("a", "##b")))
  }

  test("distributed twin produces the bit-identical merge sequence") {
    val docs = corpusDf(Seq(
      "the theme thesis then", "the theme anthem",
      "unaffable unable unanimous", "running runner ran"))
    val viaDriver = Wordpiece.train(docs, "text", nMerges = 12, minFreq = 2L)
    val viaDistributed = Wordpiece.trainDistributed(
      Bpe.wordCounts(docs, "text"), nMerges = 12, minFreq = 2L)
    assert(viaDriver == viaDistributed)
    assert(viaDriver.nonEmpty)
    // refits are bit-identical (no RNG anywhere)
    assert(Wordpiece.train(docs, "text", nMerges = 12, minFreq = 2L) == viaDriver)
  }

  test("encodeWord: greedy longest-match-first, UNK on stuck or oversized words") {
    val vocab = Set("un", "##able", "u", "n", "a", "b", "l", "e",
      "##n", "##a", "##b", "##l", "##e", "##unable")
    assert(Wordpiece.encodeWord("unable", vocab) == Seq("un", "##able"))
    // longest match at position 0 is "un", not "u"
    assert(Wordpiece.encodeWord("une", vocab) == Seq("un", "##e"))
    // a character outside the vocabulary → ONE [UNK] for the word
    assert(Wordpiece.encodeWord("unz", vocab) == Seq(Wordpiece.Unk))
    assert(Wordpiece.encodeWord("", vocab).isEmpty)
    assert(Wordpiece.encodeWord("a" * 101, Set("a", "##a")) == Seq(Wordpiece.Unk))
    assert(Wordpiece.encodeWord("a" * 100, Set("a", "##a")).length == 100)
  }

  test("tokenCounts: per-doc accounting over the corpus-trained vocabulary") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val docs = Seq(
      (1L, "lll lll xy"), (2L, "lll qqq")).toDF("doc_id", "text")
    val merges = Wordpiece.train(docs, "text", nMerges = 2, minFreq = 2L)
    val vocab = Wordpiece.vocabularyFromCorpus(docs, "text", merges)
    // the alphabet is always encodable: no UNKs on the training corpus
    val got = Wordpiece.tokenCounts(docs, "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L)._1 == 3L && got(2L)._1 == 2L) // word counts
    assert(got.values.forall(_._3 == 0L), s"training corpus has no UNKs: $got")
    // "lll" merged to one token by training → fewer wp tokens than chars
    assert(got(1L)._2 < 3 + 3 + 2, got.toString)
    // an out-of-alphabet word at encode time IS an UNK
    val fresh = Seq((3L, "lll zzz9")).toDF("doc_id", "text")
    val g2 = Wordpiece.tokenCounts(fresh, "doc_id", "text",
      Wordpiece.vocabulary(Seq("lll" -> 1L), merges))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(g2(3L) == 1L)
  }
}
