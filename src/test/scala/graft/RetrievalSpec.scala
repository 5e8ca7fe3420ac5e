package graft

import graft.text.Retrieval

/** Pins BM25 retrieval (text/Retrieval.scala): ranking semantics
  * (tf monotonicity, length normalization, idf rarity weighting),
  * the micro-grid score against a Scala-side replay of the formula,
  * deterministic tie order, the top-k cap, and the frequency-band
  * probe-query derivation. */
class RetrievalSpec extends SparkSpec {

  private def topk(docs: Seq[(Long, String)], terms: Seq[(Long, String)],
      k: Int = 10): Seq[(Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    Retrieval.bm25TopK(docs.toDF("doc_id", "text"), "doc_id", "text",
      terms.toDF("qid", "term"), topK = k)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq.sortBy(t => (t._1, t._2))
  }

  test("bm25TopK: higher tf ranks first; non-matching docs never appear") {
    val docs = Seq(
      1L -> "apple apple apple banana",
      2L -> "apple banana cherry date",
      3L -> "banana cherry date fig")
    val got = topk(docs, Seq(1L -> "apple"))
    assert(got.map(t => (t._2, t._3)) == Seq((1L, 1L), (2L, 2L)), got.toString)
  }

  test("bm25TopK: length normalization — same tf, shorter doc wins") {
    val docs = Seq(
      1L -> "apple x0 x1 x2 x3 x4 x5 x6 x7 x8",
      2L -> "apple y0")
    val got = topk(docs, Seq(1L -> "apple"))
    assert(got.map(t => (t._2, t._3)) == Seq((1L, 2L), (2L, 1L)), got.toString)
  }

  test("bm25TopK: rarer term outweighs common term at equal tf and dl") {
    val docs = Seq(
      1L -> "common rare pad0 pad1", // matches both
      2L -> "common filler pad0 pad1", // matches the everywhere-term only
      3L -> "rare filler pad0 pad1", // matches the rare term only
      4L -> "common filler pad2 pad3")
    val got = topk(docs, Seq(1L -> "common", 1L -> "rare"))
    // doc 1 (both terms) first; doc 3 (rare only) above doc 2 (common only)
    assert(got.head._3 == 1L && got.head._4 == 2L, got.toString)
    val byDoc = got.map(t => t._3 -> t._2).toMap
    assert(byDoc(3L) < byDoc(2L), got.toString)
  }

  test("bm25TopK: micro score equals a Scala replay of the formula; ties break by doc_id") {
    val docs = Seq(
      1L -> "apple banana",
      2L -> "apple banana", // identical → identical score, id order
      3L -> "cherry fig")
    val got = topk(docs, Seq(7L -> "apple"))
    val (nDocs, sumDl, df, tf, dl) = (3.0, 6.0, 2.0, 1.0, 2.0)
    val expected = math.floor(
      math.log(1.0 + (nDocs - df + 0.5) / (df + 0.5)) *
        (tf * (1.2 + 1.0) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / (sumDl / nDocs)))) *
        1000000.0 + 0.5).toLong
    assert(got == Seq((7L, 1L, 1L, 1L, expected), (7L, 2L, 2L, 1L, expected)), got.toString)
  }

  test("bm25TopK: top-k caps each query independently") {
    val docs = (1L to 9L).map(i => i -> s"apple pad$i")
    val got = topk(docs, Seq(1L -> "apple", 2L -> "pad3"), k = 3)
    assert(got.count(_._1 == 1L) == 3)
    assert(got.count(_._1 == 2L) == 1)
  }

  test("frequencyProbeQueries: cuts the 11-14/21-24/31-34 frequency bands") {
    import spark.implicits._
    // token w01 appears 40 times, w02 39, ... w40 once — rank r = token wr
    val text = (1 to 40).map(r => (f"w$r%02d " * (41 - r)).trim).mkString(" ")
    val got = Retrieval.frequencyProbeQueries(
      Seq((1L, text)).toDF("doc_id", "text"), "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSeq
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(got == Map(
      1L -> Seq("w11", "w12", "w13", "w14"),
      2L -> Seq("w21", "w22", "w23", "w24"),
      3L -> Seq("w31", "w32", "w33", "w34")), got.toString)
  }

  test("invertedIndex: df/cf totals, impact order, posting cap, tie by doc id") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x x x y"), (2L, "x x y"), (3L, "x y"), (4L, "x"), (5L, "z z"))
      .toDF("doc_id", "text")
    val got = graft.text.Retrieval.invertedIndex(docs, "doc_id", "text", maxPostings = 2)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == Set(
      // x: df 4, cf 7; champions = (doc 1, tf 3), (doc 2, tf 2)
      ("x", 4L, 7L, 1L, 1L, 3L), ("x", 4L, 7L, 2L, 2L, 2L),
      // y: df 3, cf 3; all tf 1 → tie breaks by doc id, cap at 2
      ("y", 3L, 3L, 1L, 1L, 1L), ("y", 3L, 3L, 2L, 2L, 1L),
      // z: df 1, cf 2
      ("z", 1L, 2L, 1L, 5L, 2L)))
    intercept[IllegalArgumentException] {
      graft.text.Retrieval.invertedIndex(docs, "doc_id", "text", maxPostings = 0)
    }
  }

  private def storeSet(df: org.apache.spark.sql.DataFrame) =
    df.select("term", "doc_id", "tf").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  test("postings store: merge of a disjoint batch == build-of-union, store-level and index-level") {
    import spark.implicits._
    import graft.text.Retrieval._
    val history = Seq((1L, "x x y"), (2L, "x z"), (3L, "y y w")).toDF("doc_id", "text")
    val batch = Seq((4L, "x y q"), (5L, "z z")).toDF("doc_id", "text")
    val all = history.unionByName(batch)
    val merged = mergePostingsStore(postingsStore(history, "doc_id", "text"),
      batch, "doc_id", "text")
    assert(storeSet(merged) == storeSet(postingsStore(all, "doc_id", "text")))
    // the derived artifact lands identically too — df/cf/rank included
    val viaMerge = indexFromPostings(merged, 2).collect().map(_.toSeq).toSet
    val viaFull = invertedIndex(all, "doc_id", "text", 2).collect().map(_.toSeq).toSet
    assert(viaMerge == viaFull)
  }

  test("bm25TopKFromPostings: store-served retrieval == the text-scan path, probes included") {
    import spark.implicits._
    import graft.text.Retrieval._
    val docs = Seq(
      (1L, "x x x y spark spark catalyst plan"), (2L, "x x y tungsten codegen"),
      (3L, "x y plan plan plan"), (4L, "x spark"), (5L, "z z y catalyst")).toDF("doc_id", "text")
    val store = postingsStore(docs, "doc_id", "text")
    val qts = Seq((1L, "spark"), (1L, "plan"), (2L, "catalyst"), (2L, "x"))
      .toDF("qid", "term")
    val viaStore = bm25TopKFromPostings(store, qts, topK = 3)
      .collect().map(_.toSeq).toSet
    val viaText = bm25TopK(docs, "doc_id", "text", qts, topK = 3)
      .collect().map(_.toSeq).toSet
    assert(viaStore == viaText && viaStore.nonEmpty)
    // probe DERIVATION equality needs ≥ 34 ranked terms: doc i holds
    // terms t1..ti, so term tj's count is 41−j — a strict total order
    val wide = (1L to 40L).map(i => (i, (1L to i).map(j => s"t$j").mkString(" ")))
      .toDF("doc_id", "text")
    val probesStore = frequencyProbeQueriesFromPostings(
      postingsStore(wide, "doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val probesText = frequencyProbeQueries(wide, "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(probesStore == probesText && probesStore.size == 12)
    // and through a re-crawl merge: results match a rebuild on the
    // superseding corpus
    val recrawl = Seq((3L, "y catalyst catalyst"), (6L, "x z plan")).toDF("doc_id", "text")
    val after = docs.filter(org.apache.spark.sql.functions.col("doc_id") =!= 3L)
      .unionByName(recrawl)
    val mergedRes = bm25TopKFromPostings(
      mergePostingsStore(store, recrawl, "doc_id", "text"), qts, topK = 3)
      .collect().map(_.toSeq).toSet
    val rebuilt = bm25TopK(after, "doc_id", "text", qts, topK = 3)
      .collect().map(_.toSeq).toSet
    assert(mergedRes == rebuilt && mergedRes.nonEmpty)
  }

  test("postings store: a re-crawled doc's postings REPLACE its old ones, never double-count") {
    import spark.implicits._
    import graft.text.Retrieval._
    val history = Seq((1L, "x x y"), (2L, "x z")).toDF("doc_id", "text")
    val recrawl = Seq((2L, "w w"), (6L, "y")).toDF("doc_id", "text")
    val merged = mergePostingsStore(postingsStore(history, "doc_id", "text"),
      recrawl, "doc_id", "text")
    // doc 2's old (x, z) postings are gone; its new text stands alone
    assert(storeSet(merged) == Set(
      ("x", 1L, 2L), ("y", 1L, 1L), ("w", 2L, 2L), ("y", 6L, 1L)))
  }
}
