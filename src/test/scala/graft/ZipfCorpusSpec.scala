package graft

import org.apache.spark.sql.functions._

/** The realistic-corpus generator: determinism, schema parity with the
  * driver's documents table, the Zipf head, and the planted dups. */
class ZipfCorpusSpec extends SparkSpec {

  test("generation is deterministic and schema-identical to the driver table") {
    val a = ZipfCorpus.generate(spark, 200)
    val b = ZipfCorpus.generate(spark, 200)
    // name/type parity (nullability flips on the parquet round-trip)
    val driver = spark.read.parquet(s"$sfDir/documents.parquet").schema
    assert(a.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      driver.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(a.collect().toSeq == b.collect().toSeq)
    // pure per-row function: parallelism does not change content
    val c = ZipfCorpus.generate(spark, 200).repartition(7)
    assert(c.orderBy("doc_id").collect().toSeq == a.orderBy("doc_id").collect().toSeq)
  }

  test("vocabulary is heavy-tailed: the top type dominates, the tail is wide") {
    val docs = ZipfCorpus.generate(spark, 500)
    val freq = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count().orderBy(desc("count"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val total = freq.map(_._2).sum.toDouble
    assert(freq.head._2 / total > 0.05, "Zipf head should blanket the corpus")
    assert(freq.length > 2000, s"tail should be wide, got ${freq.length} types")
    // monotone-ish head: rank 1 well above rank 10
    assert(freq.head._2 > 3 * freq(9)._2)
  }

  test("s = 1.0 is rejected with a message, not silently garbage") {
    // the inverse-CDF divides by 1-s; s = 1 (the classic exponent a
    // user plausibly passes) would yield pow(x, Inf), not an error
    val e = intercept[IllegalArgumentException](
      ZipfCorpus.docText(0L, 1000, s = 1.0, seed = 1L))
    assert(e.getMessage.contains("1.0001"))
    // the suggested workaround works
    assert(ZipfCorpus.docText(0L, 1000, s = 1.0001, seed = 1L).nonEmpty)
  }

  test("planted dups: every 200th doc exact, every 50th a near-dup of its predecessor") {
    val m = ZipfCorpus.generate(spark, 400).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(199L) == m(198L) && m(399L) == m(398L))
    def toks(s: String) = s.split(" ")
    val (base, dup) = (toks(m(48L)), toks(m(49L)))
    assert(base.length == dup.length)
    val changed = base.zip(dup).count { case (x, y) => x != y }
    assert(changed > 0 && changed < base.length / 4,
      s"near-dup should resample ~5% of tokens, changed $changed of ${base.length}")
  }
}
