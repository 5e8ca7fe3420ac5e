package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Deterministic Zipfian-vocabulary corpus generator — the realistic
  * counterpart to the driver's word-soup `documents` table
  * (TESTDATA.md: 31 distinct words, every token a hub item shared by
  * ~all documents, i.e. the worst case for item-keyed similarity joins
  * and the best case for the ≤64-vocab bitmask path).
  *
  * Real web/pretraining text is the opposite shape: a heavy-tailed
  * vocabulary (Zipf, s ≈ 1.07) where a few stopwords blanket the
  * corpus and most types are rare. Dedup-family numbers measured only
  * on word soup do not transfer — this generator exists so the dedup
  * benchmarks (BENCHMARKS.md "Zipfian corpus" section) are measured on
  * both shapes, and so the PPJoin prefix-filter go/no-go (SURVEY §7
  * candidate #1) is settled with data instead of a hunch.
  *
  * Everything is a pure function of (docId, params) — generation is a
  * narrow distributed map over `spark.range`, no driver materialization,
  * no shared RNG state — so any scale factor reproduces bit-identically
  * at any parallelism:
  *
  *   - word(r): rank-keyed synthetic word, consonant-vowel syllables;
  *     short codes for common ranks, longer for the tail (like real
  *     lexicons);
  *   - rank sampling: inverse-CDF of the generalized Zipf distribution
  *     with exponent `s` over `vocabSize` ranks;
  *   - doc length: log-normal (median ~55 tokens, clamped [10, 400]) —
  *     the word-soup table's scale with a realistic tail;
  *   - planted structure mirroring the driver table's: every 50th doc
  *     is a NEAR-dup of its predecessor (each token independently
  *     resampled with p = 0.05 → 3-gram-shingle Jaccard ≈ 0.6–0.8),
  *     every 200th an EXACT dup (token-Jaccard 1.0, for the q91-at-0.95
  *     and exact-dedup shapes).
  *
  * Schema matches the driver's `documents.parquet` tables exactly
  * (doc_id, text, lang, source, n_chars), so every `Tables.documents`
  * query runs on it unmodified: point `SPARK_GRAFT_SF_DIR` at the
  * output directory.
  */
object ZipfCorpus {

  /** Consonant-vowel syllable code for a vocabulary rank: rank 0 →
    * "ba", base-40 digits beyond that — common ranks get short words,
    * tail ranks long ones, echoing real lexicon length statistics. */
  def word(rank: Int): String = {
    val cons = "bcdfghjklmnpqrstvwz" // 19
    val vows = "aeiou" // 5 → 95 syllables, 40 used for stable digits
    val sb = new StringBuilder
    var r = rank
    do {
      val d = r % 40
      sb.append(cons(d % 19)).append(vows(d / 19 % 5))
      r = r / 40
    } while (r > 0)
    sb.toString
  }

  /** Inverse-CDF sample of a generalized Zipf(s) rank in [0, v). */
  private def zipfRank(u: Double, v: Int, s: Double): Int = {
    // CDF(r) ≈ (r^(1-s) − 1) / (v^(1-s) − 1) for s ≠ 1
    require(s != 1.0,
      "zipf exponent s = 1.0 hits the removable singularity of the power-law " +
        "CDF inversion (1/(1-s)); pass s = 1.0001 for the classic harmonic law")
    val p = 1.0 - s
    val r = math.pow(u * (math.pow(v.toDouble, p) - 1.0) + 1.0, 1.0 / p)
    math.min(v - 1, math.max(0, r.toInt - 1))
  }

  /** The base (pre-dup) token stream of a document — pure in docId. */
  private def baseTokens(docId: Long, vocabSize: Int, s: Double, seed: Long): Array[String] = {
    val rng = new java.util.Random(docId * 0x9E3779B97F4A7C15L + seed)
    val len = math.min(400, math.max(10,
      math.exp(math.log(55.0) + 0.6 * rng.nextGaussian()).toInt))
    Array.fill(len)(word(zipfRank(rng.nextDouble(), vocabSize, s)))
  }

  /** Final text of a document: exact/near-dup docs derive from their
    * predecessor's base stream (pure, so no cross-row dependency). */
  def docText(docId: Long, vocabSize: Int, s: Double, seed: Long): String = {
    val toks =
      if (docId % 200 == 199) baseTokens(docId - 1, vocabSize, s, seed) // exact dup
      else if (docId % 50 == 49) { // near dup: 5% token resample
        val base = baseTokens(docId - 1, vocabSize, s, seed)
        val rng = new java.util.Random(docId * 0xC2B2AE3D27D4EB4FL + seed)
        base.map(t =>
          if (rng.nextDouble() < 0.05) word(zipfRank(rng.nextDouble(), vocabSize, s)) else t)
      } else baseTokens(docId, vocabSize, s, seed)
    toks.mkString(" ")
  }

  /** The corpus as a DataFrame, schema-identical to the driver's
    * documents table. Distributed: one narrow map over spark.range. */
  def generate(
      spark: SparkSession, nDocs: Long,
      vocabSize: Int = 30000, s: Double = 1.07, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val langs = Array("en", "de", "fr", "es", "zh")
    spark.range(nDocs).map { docId =>
      val text = docText(docId, vocabSize, s, seed)
      val rng = new java.util.Random(docId * 0x2545F4914F6CDD1DL + seed)
      (docId, text, langs(rng.nextInt(langs.length)), s"src${docId % 10}", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  /** Usage: ZipfCorpus <outDir> [nDocs] [vocabSize] — writes
    * <outDir>/documents.parquet. */
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/zipfdata")
    val nDocs = if (args.length > 1) args(1).toLong else 5000L
    val vocab = if (args.length > 2) args(2).toInt else 30000
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-zipf-corpus")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, nDocs, vocab)
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/documents.parquet")
    println(s"wrote $nDocs docs (vocab $vocab) to $outDir/documents.parquet")
    spark.stop()
  }
}
