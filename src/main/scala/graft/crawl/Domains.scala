package graft.crawl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Domain-level crawl hygiene — the rollup between the per-URL
  * frontier filter (q157) and corpus curation: RefinedWeb (Penedo et
  * al. 2023) and FineWeb apply their blocklists, dedup pressure and
  * document caps at the REGISTERED-DOMAIN grain, because quality is a
  * property of sites before it is a property of pages (a content farm
  * is recognizable from its aggregate even when single pages pass
  * per-doc filters).
  */
object Domains {

  /** Registered domain from a hostname: the last two labels
    * (`blog.site7.example.net` → `example.net`). Public-suffix-list
    * awareness (co.uk and friends) is a data dependency, not an
    * algorithm — inject a suffix table and extend the regex chain in
    * production; the two-label core is what the q157 frontier uses. */
  def registeredDomain(host: Column): Column =
    regexp_extract(host, "([^.]+\\.[^.]+)$", 1)

  /** Mergeable per-domain inventory for the daily-crawl contract (the
    * q123/q146/q150 incremental discipline): one row per (domain,
    * host, content-hash) with its duplicate count, byte mass and
    * blocked tally — exact-duplicate pages collapse here, so the
    * store is bounded by DISTINCT content, not crawl volume (the
    * paragraphStore argument), while still carrying everything
    * [[domainStatsFromStore]] needs to reproduce [[domainStats]]
    * EXACTLY. One hash groupBy with map-side partials; md5 proxies
    * shuffle, never text. → (domain, host, tk, n_docs, chars,
    * n_blocked) */
  def domainStore(
      docs: DataFrame, hostCol: String, textCol: String,
      blockedExpr: Column): DataFrame =
    docs
      .select(registeredDomain(col(hostCol)).as("domain"), col(hostCol).as("host"),
        md5(col(textCol)).as("tk"), length(col(textCol)).cast("long").as("_len"),
        blockedExpr.cast("boolean").as("_blocked"))
      .groupBy(col("domain"), col("host"), col("tk"))
      .agg(count(lit(1)).as("n_docs"), sum(col("_len")).as("chars"),
        sum(when(col("_blocked"), 1L).otherwise(0L)).as("n_blocked"))

  /** Merge two [[domainStore]] inventories (yesterday's store + a new
    * batch): counts are additive at the (domain, host, tk) grain, so
    * the merge is one groupBy — associative, idempotent-keyed,
    * replayable on any schedule. */
  def mergeDomainStores(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("domain"), col("host"), col("tk"))
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("chars")).as("chars"),
        sum(col("n_blocked")).as("n_blocked"))

  /** [[domainStats]] re-derived from a [[domainStore]] inventory —
    * bit-identical to running [[domainStats]] over the concatenated
    * crawls, which is the invariant DomainsSpec pins and the q169
    * oracle replays. Same exact-COUNT(DISTINCT) caveat as the direct
    * path (the q40/q40a stance); distinct hosts/hashes here count
    * STORE rows, already collapsed. */
  def domainStatsFromStore(store: DataFrame, maxDupShare: Double = 0.5): DataFrame =
    store
      .groupBy(col("domain"))
      .agg(sum(col("n_docs")).as("n_docs"),
        countDistinct(col("host")).as("n_hosts"),
        countDistinct(col("tk")).as("n_unique_texts"),
        sum(col("chars")).as("total_chars"),
        sum(col("n_blocked")).as("n_blocked"))
      .select(col("domain"), col("n_docs"), col("n_hosts"),
        col("n_unique_texts"), col("total_chars"), col("n_blocked"),
        ((col("n_docs") - col("n_unique_texts")).cast("double") / col("n_docs"))
          .as("dup_share"),
        (col("n_blocked").cast("double") / col("n_docs")).as("blocked_share"),
        (col("n_blocked") === 0L &&
          (col("n_docs") - col("n_unique_texts")).cast("double") / col("n_docs")
            <= maxDupShare).as("kept"))

  /** Per-registered-domain reputation rollup over a crawl frame that
    * carries (host, text) per document: document and host counts,
    * byte mass, exact duplicate pressure (1 − distinct texts / docs —
    * content farms and mirror rings print near-1 here), the
    * blocklisted-host share (the q157 word blocklist), and a keep
    * verdict — no blocked hosts and duplicate share ≤ `maxDupShare`.
    *
    * Exactness/scale split (the q40/q40a stance): `approx = false` is
    * the oracle path — two exact COUNT(DISTINCT) columns plan an
    * Expand (×3 input rows). `approx = true` swaps both for
    * HyperLogLog++ sketches: one pass, map-side partial sketches, no
    * Expand — the 100 TB path, since a domain rollup feeds a
    * threshold verdict, not an audit ledger. Either way the heavy
    * `text` column reaches the exchange only as its groupBy-key hash
    * input — project `md5(text)` upstream when reusing the frame, as
    * the q160 query does.
    *
    * → (domain, n_docs, n_hosts, n_unique_texts, total_chars,
    *    n_blocked, dup_share, blocked_share, kept)
    */
  def domainStats(
      docs: DataFrame, hostCol: String, textCol: String,
      blockedExpr: Column, maxDupShare: Double = 0.5,
      approx: Boolean = false): DataFrame = {
    val textKey = md5(col(textCol)) // 32-byte proxy shuffles, not the payload
    docs
      .select(registeredDomain(col(hostCol)).as("domain"), col(hostCol),
        textKey.as("_tk"), length(col(textCol)).cast("long").as("_len"),
        blockedExpr.cast("boolean").as("_blocked"))
      .groupBy(col("domain"))
      .agg(
        count(lit(1)).as("n_docs"),
        (if (approx) approx_count_distinct(col(hostCol)).cast("long")
         else countDistinct(col(hostCol))).as("n_hosts"),
        (if (approx) approx_count_distinct(col("_tk")).cast("long")
         else countDistinct(col("_tk"))).as("n_unique_texts"),
        sum(col("_len")).as("total_chars"),
        sum(when(col("_blocked"), 1L).otherwise(0L)).as("n_blocked"))
      .select(col("domain"), col("n_docs"), col("n_hosts"),
        col("n_unique_texts"), col("total_chars"), col("n_blocked"),
        ((col("n_docs") - col("n_unique_texts")).cast("double") / col("n_docs"))
          .as("dup_share"),
        (col("n_blocked").cast("double") / col("n_docs")).as("blocked_share"),
        (col("n_blocked") === 0L &&
          (col("n_docs") - col("n_unique_texts")).cast("double") / col("n_docs")
            <= maxDupShare).as("kept"))
  }
}
