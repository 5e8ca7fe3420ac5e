package graft

import org.apache.spark.sql.functions._

import graft.text.Unigram

class UnigramSpec extends SparkSpec {

  // ---- independent from-scratch reference (the BpeSpec discipline):
  // expected counts by BRUTE-FORCE enumeration of every segmentation,
  // posterior-weighted — no shared code with the forward-backward DP

  private def allSegs(s: String, vocab: Set[String]): Seq[Seq[String]] =
    if (s.isEmpty) Seq(Seq.empty)
    else (1 to s.length).flatMap { k =>
      val h = s.take(k)
      if (vocab.contains(h)) allSegs(s.drop(k), vocab).map(h +: _) else Seq.empty
    }

  private def enumCounts(w: String, logP: Map[String, Double]): Map[String, Double] = {
    val segs = allSegs(w, logP.keySet)
    if (segs.isEmpty) return Map.empty
    val probs = segs.map(seg => seg -> math.exp(seg.map(logP).sum))
    val z = probs.map(_._2).sum
    probs.flatMap { case (seg, p) => seg.map(_ -> p / z) }
      .groupMapReduce(_._1)(_._2)(_ + _)
  }

  test("expectedCounts equals brute-force posterior enumeration on ambiguous words") {
    val logP = Map(
      "a" -> math.log(0.3), "b" -> math.log(0.2), "ab" -> math.log(0.25),
      "ba" -> math.log(0.15), "aba" -> math.log(0.1))
    Seq("ab", "aba", "abab", "aabba", "ababab").foreach { w =>
      val fb = Unigram.expectedCounts(w, logP, maxPieceLen = 3)
      val ref = enumCounts(w, logP)
      assert(fb.keySet == ref.keySet, s"$w: ${fb.keySet} vs ${ref.keySet}")
      fb.foreach { case (s, c) =>
        assert(math.abs(c - ref(s)) < 1e-9, s"$w/$s: $c vs ${ref(s)}")
      }
    }
    // unsegmentable word (vocab lacks 'c') → empty, not a crash
    assert(Unigram.expectedCounts("abc", logP, 3).isEmpty)
  }

  test("one EM sweep equals the enumeration-based M-step on a tiny corpus") {
    // reference EM implemented independently: enumCounts E-step + ML
    // M-step, against trainDriver with emIters = 1 and no pruning
    // (targetVocab = full seed size)
    val wc = Seq(("abab", 3L), ("ab", 2L), ("ba", 1L))
    val maxLen = 3
    // replicate ONLY the seed definition (it is part of the contract):
    // substrings up to maxLen weighted by word freq, all kept here
    val seed = wc.flatMap { case (w, f) =>
      for (i <- 0 until w.length; j <- (i + 1) to math.min(w.length, i + maxLen))
        yield (w.substring(i, j), f)
    }.groupMapReduce(_._1)(_._2.toLong)(_ + _)
    val tot0 = seed.values.sum.toDouble
    val logP0 = seed.map { case (s, f) => s -> math.log(f / tot0) }
    // the trainer quantizes each (word, piece) contribution to BIGINT
    // micro-units before summing (the cross-path determinism grid) —
    // the reference replays the same rounding
    val counts = wc.flatMap { case (w, f) =>
      enumCounts(w, logP0).map { case (s, c) =>
        s -> math.floor(f * c * 1e6 + 0.5).toLong
      }
    }.groupMapReduce(_._1)(_._2)(_ + _)
    val z = counts.values.sum
    val expected = seed.keySet.map { s =>
      s -> counts.get(s).filter(_ > 0)
        .map(c => math.log(c.toDouble / z.toDouble)).getOrElse(-1e9)
    }.toMap
    val got = Unigram.trainDriver(wc, targetVocab = seed.size, maxPieceLen = maxLen,
      seedSize = seed.size, emIters = 1, pruneKeep = 0.75)
    assert(got.map(_.piece).toSet == seed.keySet)
    got.foreach { p =>
      assert(math.abs(p.logProb - expected(p.piece)) < 1e-6,
        s"${p.piece}: ${p.logProb} vs ${expected(p.piece)}")
    }
  }

  test("trainDistributed is bit-identical to trainDriver (the micro-grid cross-path contract)") {
    import spark.implicits._
    val docs = (1L to 40L).map(i =>
      (i, Seq.fill(5)(Seq("sparking", "sparked", "parkland", "landmark", "marked")(i.toInt % 5)).mkString(" ")))
      .toDF("doc_id", "text")
    val wcDf = graft.text.Bpe.wordCounts(docs, "text")
    val wc = wcDf.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val a = Unigram.trainDriver(wc, targetVocab = 20, maxPieceLen = 5,
      seedSize = 100, emIters = 2, pruneKeep = 0.75)
    val b = Unigram.trainDistributed(wcDf, targetVocab = 20, maxPieceLen = 5,
      seedSize = 100, emIters = 2, pruneKeep = 0.75)
    assert(a == b, s"paths diverged:\n$a\n$b")
    // and through the adaptive front door: forcing the distributed
    // path (driver bound 0) equals the default driver path
    val viaDriver = Unigram.train(docs, "text", targetVocab = 20,
      maxPieceLen = 5, seedSize = 100)
    val viaDistributed = Unigram.train(docs, "text", targetVocab = 20,
      maxPieceLen = 5, seedSize = 100, maxDriverVocab = 0L)
    assert(viaDriver == viaDistributed)
  }

  test("pruning shrinks to the target, never drops single characters, and refits bit-identically") {
    import spark.implicits._
    val docs = (1L to 40L).map(i =>
      (i, Seq.fill(6)(Seq("sparking", "sparked", "parkland", "landmark")(i.toInt % 4)).mkString(" ")))
      .toDF("doc_id", "text")
    val m1 = Unigram.train(docs, "text", targetVocab = 24, seedSize = 200)
    val m2 = Unigram.train(docs, "text", targetVocab = 24, seedSize = 200)
    assert(m1 == m2, "refit must reproduce bit-identically")
    assert(m1.length <= 24 && m1.length >= 12)
    val chars = "sparkingedlandm".toSet.map((c: Char) => c.toString)
    assert(chars.subsetOf(m1.map(_.piece).toSet), "single chars never pruned")
    assert(m1.exists(_.piece.length > 1), "some multi-char pieces must survive")
    // the surviving multi-char pieces are corpus substrings
    assert(m1.forall(p => Seq("sparking", "sparked", "parkland", "landmark")
      .exists(_.contains(p.piece))))
  }

  test("encodeWord: Viterbi equals enumeration argmax; concatenation restores the word; unk passthrough") {
    val logP = Map(
      "a" -> math.log(0.3), "b" -> math.log(0.2), "ab" -> math.log(0.25),
      "ba" -> math.log(0.15), "aba" -> math.log(0.1))
    Seq("ab", "aba", "abab", "aabba", "bbb").foreach { w =>
      val got = Unigram.encodeWord(w, logP, 3)
      assert(got.mkString == w, s"$w reassembles")
      val best = allSegs(w, logP.keySet).map(seg => seg -> seg.map(logP).sum)
      if (best.nonEmpty) {
        val maxScore = best.map(_._2).max
        assert(math.abs(got.map(logP).sum - maxScore) < 1e-9,
          s"$w: Viterbi ${got.mkString("+")} not max-prob")
      }
    }
    // unknown character → per-character passthrough
    assert(Unigram.encodeWord("axb", logP, 3) == Seq("a", "x", "b"))
    assert(Unigram.encodeWord("", logP, 3).isEmpty)
  }

  test("tokenCounts on the real corpus: per-doc accounting between word and char counts; join is word-keyed") {
    val docs = Tables.documents(spark, sfDir).limit(200)
    val model = Unigram.train(docs, "text", targetVocab = 80, seedSize = 400)
    val got = Unigram.tokenCounts(docs, "doc_id", "text", model)
    val rows = got.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 200)
    rows.foreach { case (_, words, toks) =>
      assert(toks >= words, "a word is at least one piece")
    }
    // compression: learned multi-char pieces must beat per-char splits
    val chars = docs.select(sum(length(regexp_replace(col("text"), "[^a-z0-9]", ""))))
      .collect().head.getLong(0)
    assert(rows.map(_._3).sum < chars, "pieces must compress below characters")
  }
}
