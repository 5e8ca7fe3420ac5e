package graft

import org.apache.spark.sql.SaveMode

/** The GrowthBench documents-table variants must time queries that
  * mean something — a gate row whose query returns garbage would still
  * produce a plausible growth curve. Pins g116's planted-pair recovery
  * on a generated Zipf corpus (the same corpus family the gate runs
  * on, small enough for a unit test). */
class GrowthVariantSpec extends SparkSpec {

  test("g116 growth variant recovers its planted embedding near-dups") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zipf").toString
    ZipfCorpus.generate(spark, nDocs = 1000L, vocabSize = 2000)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    val pairs = GrowthBench.variants("g116_embed_neardup_docs")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every 50th doc's embedding is a planted near-dup of its
    // predecessor: docs 49, 99, ... 999 → 20 pairs; 4×16-bit banding
    // keeps a 0.9997-cosine pair with p ≈ 0.9998, so ALL planted pairs
    // must survive at this size — and nothing else: random dim-16 hash
    // embeddings need cosine ≥ 0.98, which unplanted pairs cannot hit
    val planted = (49L until 1000L by 50L).map(i => (i - 1, i)).toSet
    assert(pairs == planted,
      s"expected exactly the ${planted.size} planted pairs, got ${pairs.size}: " +
        s"missing=${(planted -- pairs).take(3)} extra=${(pairs -- planted).take(3)}")
  }
}
