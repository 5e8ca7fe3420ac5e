package graft

import org.apache.spark.sql.functions._

import graft.crawl.{Domains, Links, Robots}
import graft.graph.LinkGraph
import graft.text.Boilerplate

/** The crawl FRONT end-to-end, every stage the production operator:
  * page fetch → main-content extraction → link extraction + URL
  * resolution → robots admission of the discovered frontier →
  * domain-reputation verdicts → webgraph rank + anchor rollup. The
  * fixture plants one defect per stage — a chrome-only page, a
  * robots-disallowed target, a mirror-farm domain, a blocklisted
  * host — so each stage's effect is individually observable, the
  * CorpusPipelineSpec discipline applied to the half of the pipeline
  * that runs BEFORE text ever reaches the pretraining stages. */
class CrawlPipelineSpec extends SparkSpec {

  import spark.implicits._

  private val prose =
    "the quick brown fox jumps over the lazy dog and it was one of the better pages about web crawling"
  private val mirrorProse =
    "this page is a mirror of the original content with the same filler words around it every time"

  private def page(title: String, content: String, links: Seq[(String, String)]): String = {
    val nav = links.map { case (h, a) => s"""<a href="$h">$a</a>""" }.mkString(" ")
    s"""<html><head><title>$title</title></head><body><nav>$nav</nav>""" +
      (if (content.nonEmpty) s"<p>$content</p>" else "") +
      """<footer>Copyright 2024 - <a href="/tos">Terms</a></footer></body></html>"""
  }

  private lazy val pages = Seq(
    ("https://a.example/hub", page("Hub", prose, Seq("/p1" -> "page one"))),
    ("https://a.example/p1", page("P1", prose + " part one",
      Seq("/hub" -> "the hub page", "/private/secret" -> "secret", "rel/r1" -> "rel"))),
    ("https://a.example/p2", page("P2", prose + " part two",
      Seq("/hub" -> "the hub page", "/private/secret" -> "secret"))),
    ("https://a.example/p3", page("P3", prose + " part three",
      Seq("/hub" -> "THE  HUB <b>page</b>"))),
    // chrome-only page: nav + footer, no content block — extraction kills it
    ("https://a.example/nav", page("Nav", "", Seq("/hub" -> "the hub page"))),
    ("https://mirror.example/m1", page("M1", mirrorProse, Seq("/m2" -> "next"))),
    ("https://mirror.example/m2", page("M2", mirrorProse, Seq("/m3" -> "next"))),
    ("https://mirror.example/m3", page("M3", mirrorProse, Seq("/m1" -> "next"))),
    ("https://casino-fun.example/c1", page("C1", prose + " with bonus spins", Seq("/c2" -> "more"))))
    .toDF("url", "html")

  test("crawl front end-to-end: each planted defect dies at its stage") {
    // 1. main-content extraction: the chrome-only page yields no text
    val extracted = pages
      .withColumn("main_text", Boilerplate.mainText(col("html")))
      .withColumn("host", regexp_extract(col("url"), "^https://([^/]+)", 1))
    val kept = extracted.filter(length(col("main_text")) >= 40)
    val keptUrls = kept.select("url").as[String].collect().toSet
    assert(!keptUrls.contains("https://a.example/nav"))
    assert(keptUrls.size == 8)

    // 2. link extraction + resolution over the kept pages
    val edges = Links.extractEdges(kept, "url", "html")
    val relResolved = edges.filter(col("href") === "rel/r1")
      .select("dst_url").as[String].head()
    assert(relResolved == "https://a.example/rel/r1")

    // 3. robots admission of the DISCOVERED frontier (a.example
    // disallows /private; hosts without robots rules default-allow)
    val rules = Robots.parseRules(
      Seq(("a.example", "User-agent: *\nDisallow: /private\n"))
        .toDF("host", "content"), "host", "content")
    val frontier = edges.select(col("dst_url")).distinct()
      .withColumn("fhost", regexp_extract(col("dst_url"), "^https://([^/]+)", 1))
      .withColumn("fpath", regexp_extract(col("dst_url"), "^https://[^/]+(/.*)$", 1))
    val admitted = Robots.decide(frontier, "dst_url", "fhost", "fpath", rules, "graftbot")
      .filter(col("allowed"))
      .select(col("dst_url").as[String]).collect().toSet
    assert(!admitted.contains("https://a.example/private/secret"))
    assert(admitted.contains("https://a.example/hub"))
    assert(admitted.contains("https://mirror.example/m2")) // no rules → allowed

    // 4. domain verdicts over the kept pages: the mirror farm dies on
    // duplicate pressure, the casino host on the word blocklist
    val verdicts = Domains.domainStats(kept, "host", "main_text",
      blockedExpr = col("host").rlike("(casino|adult|porn|xxx|gambl)"))
      .collect().map(r => r.getString(0) -> r.getBoolean(8)).toMap
    assert(verdicts("a.example"))
    assert(!verdicts("mirror.example"))
    assert(!verdicts("casino-fun.example"))

    // 5. webgraph rank + anchor rollup over the admitted, kept edges:
    // the hub out-ranks its spokes and carries the normalized anchor
    val goodEdges = edges
      .join(kept.select(col("url")), col("src_url") === col("url"))
      .filter(col("dst_url").isin(admitted.toSeq: _*))
      .select(col("src_url").as("src"), col("dst_url").as("dst"), col("anchor"))
    val nodes = kept.select(col("url").as("v"))
    val ranks = LinkGraph.pageRank(nodes, "v", goodEdges, "src", "dst", iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val hubRank = ranks("https://a.example/hub")
    assert(Seq("p1", "p2", "p3").forall(p => ranks(s"https://a.example/$p") < hubRank))
    val topAnchor = LinkGraph.anchorText(goodEdges, "src", "dst", "anchor", topK = 1)
      .filter(col("dst") === "https://a.example/hub")
      .select("anchor", "cnt").collect().head
    assert(topAnchor.getString(0) == "the hub page") // p3's markup normalized into the same anchor
    assert(topAnchor.getLong(1) == 3L)

    // 6. frontier SCHEDULING (the Mercator stage): priority = the
    // target's PageRank, candidates = the robots-admitted frontier on
    // non-blocked domains, politeness = a.example was just fetched
    // (this crawl!) so its reopening is delayed; the scheduler must
    // fetch the high-rank hub AFTER the round opens a.example's
    // politeness window, while unfetched-host URLs start immediately.
    val goodHosts = verdicts.filter(_._2).keySet
    val candidates = admitted.toSeq.toDF("url")
      .withColumn("host", regexp_extract(col("url"), "^https://([^/]+)", 1))
      .filter(col("host").isin(goodHosts.toSeq: _*))
      .join(ranks.toSeq.toDF("rurl", "priority"), col("url") === col("rurl"), "left")
      .select(col("url"), col("host"),
        coalesce(col("priority"), lit(0L)).as("priority"))
    val lastFetch = Seq(("a.example", 950L)).toDF("host", "ts")
    val fetchList = graft.crawl.Frontier.schedule(
      candidates, "url", "host", "priority", lastFetch, "host", "ts",
      roundStart = 1000L, roundEnd = 2000L, minDelayMs = 300L,
      maxPerHost = 3, budget = 4).collect()
      .map(r => r.getString(0) -> ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // every surviving candidate lives on a.example (the mirror farm
    // and casino host died at stage 4), which was JUST fetched: it
    // reopens at 950 + 300 = 1250 and maxPerHost = 3 caps the round
    // at 3 of its 4 candidates even though the budget allows 4 — the
    // politeness conflict a rank-only scheduler gets wrong. Rank
    // orders within the host: hub (top rank) → p1 → rel/r1 (unranked
    // discoveries tie at 0, url asc keeps rel/r1 over /tos).
    assert(fetchList.size == 3)
    assert(fetchList.keySet == Set("https://a.example/hub",
      "https://a.example/p1", "https://a.example/rel/r1"))
    val (hubSeq, hubTs, hubOrder) = fetchList("https://a.example/hub")
    assert(hubSeq == 1L && hubTs == 1250L && hubOrder == 1L)
    assert(fetchList("https://a.example/p1")._2 == 1550L)
    assert(fetchList("https://a.example/rel/r1")._2 == 1850L)
    // every scheduled instant respects the per-host politeness grid
    fetchList.groupBy(_._1.split("/")(2)).foreach { case (_, urls) =>
      val ts = urls.values.map(_._2).toSeq.sorted
      ts.sliding(2).foreach {
        case Seq(a, b) => assert(b - a >= 300L, s"politeness gap violated: $ts")
        case _ =>
      }
    }
  }
}
