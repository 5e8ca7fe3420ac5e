package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter "seen-URL" store — the crawler's membership state.
  *
  * A continuous crawl must answer "have I seen this URL before?" for
  * every URL in every batch, against a store of every URL ever seen.
  * The classical answer (Mercator's URL-seen test, Heydon & Najork
  * 1999; Dolma's dedupe tool, Soldaini et al. 2024, does exactly this
  * with Bloom filters at corpus scale) is a Bloom filter: ~10 bits
  * per stored URL at 1% false positives, ZERO false negatives — a
  * 10^11-URL store is ~125 GB of bits instead of tens of TB of
  * strings, and the probe never joins against the raw URL table.
  *
  * Representation: (bucket, word, mask) rows — `nBuckets` independent
  * filters (URLs land in one bucket by hash), each `wordsPerBucket`
  * 62-bit words. Rows pack 62 bits in 12 bytes, stay co-partitioned
  * by bucket, and MERGE by `bit_or` (a day's filter unions into the
  * store associatively — the sketch-state contract of the q146
  * incremental family). 62 bits per word, not 64: DuckDB's `<<`
  * throws on a 63-bit shift, and the whole structure is replayed in
  * the oracle, so every mask stays in positive int64 territory in
  * both engines.
  *
  * Hashing is the repo's portable 60-bit md5 grid (the q93 scheme)
  * with Kirsch-Mitzenmacher double hashing (2006): position_i =
  * (h1 + i·h2) mod m — two md5 evaluations give all `numHashes`
  * probes, bit-identical in Spark and DuckDB.
  *
  * Scale shape: `build` is one explode (numHashes rows per URL) and
  * one (bucket, word) groupBy whose map-side `bit_or` partials
  * collapse to at most nBuckets·wordsPerBucket rows per task —
  * output is O(bits), independent of URL count. `probe` shuffles
  * only the BATCH's probe rows against the store's bit rows (store
  * bucketed by `bucket` in production → exchange-free on the store
  * side); work is batch-linear, the q123/q146 incremental contract.
  * False positives are confirmed exactly by [[bloomGuardedNew]]'s
  * anti-join over SURVIVORS only — at a 1% FP rate the expensive
  * exact join sees 1% of the batch.
  */
object BloomStore {

  /** Usable bits per mask word (DuckDB `<<` overflows at shift 63;
    * shifts here stay ≤ 61). */
  val BitsPerWord = 62

  private def h60(c: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), c)), 1, 15), 16, 10).cast("long")

  /** The (bucket, word, bit-mask) probe rows for each URL — shared by
    * [[build]] and [[probe]] so both sides of the membership test
    * derive positions identically. numHashes ≤ 8 keeps
    * h1 + i·h2 < 2^63 (h1, h2 < 2^60). */
  private def positions(urls: DataFrame, urlCol: String,
      nBuckets: Int, wordsPerBucket: Int, numHashes: Int): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be positive, got $nBuckets")
    require(wordsPerBucket >= 1, s"wordsPerBucket must be positive, got $wordsPerBucket")
    require(numHashes >= 1 && numHashes <= 8,
      s"numHashes in [1,8] (position hash h1 + i*h2 must stay below 2^63), got $numHashes")
    val m = wordsPerBucket.toLong * BitsPerWord
    urls
      .select(col(urlCol).as("_url"),
        h60(col(urlCol), "bloomA").as("_h1"), h60(col(urlCol), "bloomB").as("_h2"))
      .select(col("_url"), col("_h1"), col("_h2"),
        explode(sequence(lit(0L), lit(numHashes - 1L))).as("_i"))
      .select(col("_url"),
        pmod(col("_h1"), lit(nBuckets.toLong)).cast("int").as("bucket"),
        pmod(col("_h1") + col("_i") * col("_h2"), lit(m)).as("_p"))
      .select(col("_url"), col("bucket"),
        expr(s"cast(_p div $BitsPerWord as int)").as("word"),
        expr(s"shiftleft(1L, cast(pmod(_p, $BitsPerWord) as int))").as("_m"))
  }

  /** Build a Bloom store from a URL frame → (bucket, word, mask).
    * `bit_or` is idempotent, so duplicate URLs need no pre-distinct.
    * Write the result bucketed by `bucket` and every later probe and
    * merge is exchange-free on the store side. */
  def build(urls: DataFrame, urlCol: String, nBuckets: Int = 4096,
      wordsPerBucket: Int = 1024, numHashes: Int = 7): DataFrame =
    positions(urls, urlCol, nBuckets, wordsPerBucket, numHashes)
      .groupBy(col("bucket"), col("word"))
      .agg(expr("bit_or(_m)").as("mask"))

  /** Union two stores built with the SAME parameters (associative,
    * commutative — the daily merge). */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("bucket"), col("word"))
      .agg(expr("bit_or(mask)").as("mask"))

  /** Probe a batch against a store → one row per distinct batch URL:
    * (urlCol, bucket, possibly_seen). `possibly_seen = false` is
    * DEFINITIVE (no false negatives); `true` is probabilistic at the
    * filter's FP rate. Parameters must match the build's. */
  def probe(store: DataFrame, batch: DataFrame, urlCol: String,
      nBuckets: Int = 4096, wordsPerBucket: Int = 1024,
      numHashes: Int = 7): DataFrame =
    positions(batch, urlCol, nBuckets, wordsPerBucket, numHashes)
      .join(store.select(col("bucket").as("_sb"), col("word").as("_sw"),
          col("mask")),
        col("bucket") === col("_sb") && col("word") === col("_sw"), "left")
      .select(col("_url"), col("bucket"),
        (col("mask").isNotNull &&
          col("mask").bitwiseAND(col("_m")) === col("_m")).as("_hit"))
      .groupBy(col("_url"), col("bucket"))
      .agg(expr("bool_and(_hit)").as("possibly_seen"))
      .select(col("_url").as(urlCol), col("bucket"), col("possibly_seen"))

  /** Bloom-guarded exact "new URLs": everything the filter clears
    * passes straight through; only the `possibly_seen` SURVIVORS (true
    * re-crawls + the ~1% false positives) reach the exact anti-join
    * against the stored URL strings — joined on (bucket, url) so a
    * `storeUrls` table bucketed like the filter confirms without
    * shuffling itself. → distinct new URLs, one column `urlCol`. */
  def bloomGuardedNew(store: DataFrame, storeUrls: DataFrame,
      batch: DataFrame, urlCol: String, nBuckets: Int = 4096,
      wordsPerBucket: Int = 1024, numHashes: Int = 7): DataFrame = {
    val p = probe(store, batch, urlCol, nBuckets, wordsPerBucket, numHashes)
    val fresh = p.filter(!col("possibly_seen")).select(col(urlCol))
    val confirmed = p.filter(col("possibly_seen"))
      .select(col(urlCol), col("bucket"))
      .join(storeUrls
          .select(col(urlCol),
            pmod(h60(col(urlCol), "bloomA"), lit(nBuckets.toLong))
              .cast("int").as("bucket")),
        Seq(urlCol, "bucket"), "left_anti")
      .select(col(urlCol))
    fresh.unionByName(confirmed)
  }
}
