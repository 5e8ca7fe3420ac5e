package graft.crawl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Crawl-frontier scheduling — the Mercator shape (Heydon & Najork
  * 1999, "Mercator: A scalable, extensible Web crawler"; the same
  * front/back-queue split every published crawler — Heritrix, Nutch,
  * Common Crawl's — still runs): the frontier is PRIORITIZED by rank
  * (domain/page rank, the [[graft.graph.LinkGraph.pageRank]] /
  * [[Domains.domainStats]] signals), gated upstream by robots
  * admission ([[Robots.decide]]) and URL hygiene (q157), and
  * POLITENESS caps what one host receives per round: no host is
  * fetched more often than once per `minDelayMs`, however much rank
  * its URLs carry.
  *
  * [[schedule]] emits one round's deterministic fetch list. Politeness
  * is token arithmetic over fetch timestamps: a host whose last fetch
  * was `last` owns `floor((roundEnd − max(roundStart, last +
  * minDelayMs)) / minDelayMs) + 1` slots this round (its next legal
  * fetch instant, then one per delay until the round closes), capped
  * by `maxPerHost`; each admitted URL gets its concrete `fetch_ts` on
  * that grid. Priority conflicts resolve deterministically:
  * (priority desc, url asc) within a host, the same order across
  * hosts for the global budget cut.
  *
  * Scale shape: one host-keyed left join against the last-fetch store
  * (host-bounded, broadcast-eligible), ONE row_number window per host
  * partition (WindowGroupLimit keeps ≤ maxPerHost rows per host before
  * anything else moves), then the global budget cut is
  * `orderBy(...).limit(budget)` — TakeOrdered per-partition heaps,
  * only `budget` rows reach one machine, never a global sort of the
  * frontier (the frequencyProbeQueries stance). A trillion-URL
  * frontier enters as (url, host, priority) metadata; page bodies
  * never ride the scheduler.
  */
object Frontier {

  /** One round's fetch list. `lastFetch` is the per-host
    * (hostCol, tsCol) store of most recent fetch instants (absent
    * host = never fetched). Returns (url, host, priority, host_seq,
    * fetch_ts, fetch_order): `host_seq` the URL's politeness slot on
    * its host (1-based), `fetch_ts` its scheduled instant, and
    * `fetch_order` the global (priority desc, url asc) rank within
    * the budget. */
  def schedule(
      frontier: DataFrame, urlCol: String, hostCol: String, priorityCol: String,
      lastFetch: DataFrame, lastHostCol: String, lastTsCol: String,
      roundStart: Long, roundEnd: Long, minDelayMs: Long,
      maxPerHost: Int, budget: Int): DataFrame = {
    require(roundEnd > roundStart, s"empty round [$roundStart, $roundEnd)")
    require(minDelayMs >= 1, s"minDelayMs must be >= 1, got $minDelayMs")
    require(maxPerHost >= 1 && budget >= 1, s"maxPerHost/budget must be >= 1")
    val last = lastFetch
      .groupBy(col(lastHostCol).as("_h"))
      .agg(max(col(lastTsCol)).as("_last")) // defensive: one row per host
    val byHost = Window.partitionBy(col("host"))
      .orderBy(col("priority").desc, col("url").asc)
    frontier
      .select(col(urlCol).as("url"), col(hostCol).as("host"),
        col(priorityCol).as("priority"))
      .join(last, col("host") === col("_h"), "left")
      // first legal fetch instant for the host this round
      .withColumn("_open",
        greatest(lit(roundStart), coalesce(col("_last") + minDelayMs, lit(roundStart))))
      // token count: slots the politeness grid leaves before roundEnd
      .withColumn("_slots",
        when(col("_open") >= roundEnd, lit(0L))
          .otherwise(least(
            expr(s"(${roundEnd}L - _open) div ${minDelayMs}L") + 1L,
            lit(maxPerHost.toLong))))
      .withColumn("host_seq", row_number().over(byHost).cast("long"))
      .filter(col("host_seq") <= col("_slots"))
      .withColumn("fetch_ts", col("_open") + (col("host_seq") - 1L) * minDelayMs)
      .select(col("url"), col("host"), col("priority"), col("host_seq"),
        col("fetch_ts"))
      .orderBy(col("priority").desc, col("url").asc)
      .limit(budget)
      // global single-partition window — BOUNDED BY CONSTRUCTION: it
      // runs AFTER limit(budget), so at most `budget` rows (the round's
      // fetch quota, thousands) ever enter it. Do not "fix" this into a
      // distributed two-pass rank; the input can never be corpus-sized.
      .withColumn("fetch_order",
        row_number().over(Window.orderBy(col("priority").desc, col("url").asc))
          .cast("long"))
  }
}
