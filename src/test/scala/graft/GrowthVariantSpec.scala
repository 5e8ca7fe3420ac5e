package graft

import org.apache.spark.sql.SaveMode

/** The GrowthBench documents-table variants must time queries that
  * mean something — a gate row whose query returns garbage would still
  * produce a plausible growth curve. Pins g116's/g136's planted-pair
  * recovery and g135's full-corpus scoring on a generated Zipf corpus
  * (the same corpus family the gate runs on, small enough for a unit
  * test). */
class GrowthVariantSpec extends SparkSpec {

  private lazy val corpusDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_zipf").toString
    ZipfCorpus.generate(spark, nDocs = 1000L, vocabSize = 2000)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    dir
  }

  // every 50th doc's embedding is a planted near-dup of its
  // predecessor: docs 49, 99, ... 999 → 20 pairs; 4×16-bit banding
  // keeps a 0.9997-cosine pair with p ≈ 0.9998, so ALL planted pairs
  // must survive at this size — and nothing else: random dim-16 hash
  // embeddings need cosine ≥ 0.98, which unplanted pairs cannot hit
  private val planted = (49L until 1000L by 50L).map(i => (i - 1, i)).toSet

  test("g116 growth variant recovers its planted embedding near-dups") {
    val pairs = GrowthBench.variants("g116_embed_neardup_docs")(spark, corpusDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == planted,
      s"expected exactly the ${planted.size} planted pairs, got ${pairs.size}: " +
        s"missing=${(planted -- pairs).take(3)} extra=${(pairs -- planted).take(3)}")
  }

  test("g136 growth variant recovers its planted pairs within cells") {
    // cluster = (doc_id/50) % 64: each planted pair sits inside one
    // block of 50, so every pair is same-cell by construction and must
    // be recovered EXACTLY like g116 — while the candidate join keys
    // on (cluster, band, sig), the shape the gate times
    val pairs = GrowthBench.variants("g136_semantic_neardup_docs")(spark, corpusDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == planted,
      s"expected exactly the ${planted.size} planted pairs, got ${pairs.size}: " +
        s"missing=${(planted -- pairs).take(3)} extra=${(pairs -- planted).take(3)}")
  }

  test("g197 growth variant recovers every planted pair through the incremental probe") {
    // batch = the planted carriers (doc_id % 50 == 49), history =
    // % 10 != 0; every carrier probes its predecessor (always % 50 ==
    // 48, % 10 == 8 → in history) AND is itself a re-crawl (49 % 10 =
    // 9), so the new-wins path is exercised on every batch row
    val pairs = GrowthBench.variants("g197_ann_incremental_docs")(spark, corpusDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == planted,
      s"expected exactly the ${planted.size} planted pairs, got ${pairs.size}: " +
        s"missing=${(planted -- pairs).take(3)} extra=${(pairs -- planted).take(3)}")
  }

  test("g153 growth variant equals the exact anti-join (bloom guard is exact)") {
    // store = doc_id % 10 != 0, batch = % 5 == 0 → new = ids ≡ 0 (mod 10)
    val got = GrowthBench.variants("g153_bloom_guard_docs")(spark, corpusDir)
      .collect().map(_.getString(0)).toSet
    val expected = (0L until 1000L by 10L)
      .map(i => s"https://example.com/page/$i").toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
  }

  test("g135 growth variant scores every document with varying scores") {
    val rows = GrowthBench.variants("g135_quality_score_docs")(spark, corpusDir)
      .select("id", "quality_score").collect()
    assert(rows.length == 1000, s"expected one score per doc, got ${rows.length}")
    val scores = rows.map(_.getDouble(1))
    assert(scores.forall(s => s > 0.0 && s < 1.0), "scores must be strict probabilities")
    // the fixed model is non-degenerate: Zipf docs differ in token
    // mix, so a scorer that ignored the text would be caught here
    assert(scores.distinct.length > 100, s"expected varying scores, got ${scores.distinct.length} distinct")
  }

  test("g172 growth variant labels every document with varying languages and confidences") {
    val rows = GrowthBench.variants("g172_langid_score_docs")(spark, corpusDir)
      .select("id", "lang", "confidence").collect()
    assert(rows.length == 1000, s"expected one label per doc, got ${rows.length}")
    assert(rows.forall { r =>
      val c = r.getDouble(2); c > 0.0 && c <= 1.0 + 1e-12
    })
    // the fixed model is non-degenerate over Zipf text: labels and
    // confidences must both vary with the input
    assert(rows.map(_.getString(1)).distinct.length >= 2, "labels must vary")
    assert(rows.map(_.getDouble(2)).distinct.length > 100, "confidences must vary")
  }
}
