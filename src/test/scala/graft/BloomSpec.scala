package graft

import org.apache.spark.sql.functions._

import graft.dedup.BloomStore

/** The Bloom seen-URL store's contract: NO false negatives ever, the
  * guarded-new composition exactly equals the plain anti-join (false
  * positives are confirmed away, negatives are definitive), and
  * stores merge associatively by bit_or. */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private val P = (16, 4, 5) // (nBuckets, wordsPerBucket, numHashes) — small, ~fixture load

  private def urlsDf(ids: Seq[Int]) =
    ids.map(i => s"https://example.com/page/$i").toDF("url")

  test("probe never false-negatives: every stored URL reads possibly_seen") {
    val stored = urlsDf(0 until 300)
    val store = BloomStore.build(stored, "url", P._1, P._2, P._3)
    val seen = BloomStore.probe(store, stored, "url", P._1, P._2, P._3)
    assert(seen.count() == 300)
    assert(seen.filter(!col("possibly_seen")).count() == 0,
      "a Bloom filter must never miss a stored element")
  }

  test("a loaded filter false-positives occasionally, and only positively") {
    val store = BloomStore.build(urlsDf(0 until 300), "url", P._1, P._2, P._3)
    val novel = BloomStore.probe(store, urlsDf(1000 until 1300), "url", P._1, P._2, P._3)
    val fp = novel.filter(col("possibly_seen")).count()
    // ~42% load, 5 hashes → FP ≈ 1-2%; the exact count is a fixed
    // function of the md5 arithmetic, the bound just keeps it honest
    assert(fp < 60, s"FP rate degenerate: $fp of 300 novel URLs flagged")
  }

  test("bloomGuardedNew equals the exact anti-join on a mixed batch") {
    val storeUrls = urlsDf(0 until 300)
    val store = BloomStore.build(storeUrls, "url", P._1, P._2, P._3)
    // batch: 100 re-crawls + 100 genuinely new
    val batch = urlsDf((100 until 200) ++ (5000 until 5100))
    val got = BloomStore.bloomGuardedNew(store, storeUrls, batch, "url",
      P._1, P._2, P._3).as[String].collect().toSet
    val expected = (5000 until 5100).map(i => s"https://example.com/page/$i").toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
  }

  test("merge(build(A), build(B)) row-equals build(A union B)") {
    val a = urlsDf(0 until 150); val b = urlsDf(100 until 250)
    val merged = BloomStore.merge(
      BloomStore.build(a, "url", P._1, P._2, P._3),
      BloomStore.build(b, "url", P._1, P._2, P._3))
    val whole = BloomStore.build(a.unionByName(b), "url", P._1, P._2, P._3)
    assert(merged.exceptAll(whole).count() == 0 && whole.exceptAll(merged).count() == 0)
  }

  test("masks stay in positive int64 territory (the DuckDB shift contract)") {
    val store = BloomStore.build(urlsDf(0 until 300), "url", P._1, P._2, P._3)
    assert(store.filter(col("mask") <= 0L).count() == 0,
      "a 62-bit word must never set the sign bit")
    assert(BloomStore.BitsPerWord == 62)
  }

  test("numHashes above 8 is rejected (position hash would overflow)") {
    intercept[IllegalArgumentException] {
      BloomStore.build(urlsDf(0 until 3), "url", 16, 4, 9).collect()
    }
  }
}
