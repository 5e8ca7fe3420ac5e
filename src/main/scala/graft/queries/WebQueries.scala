package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.crawl.{Cdx, Domains, Links, Robots}
import graft.graph.LinkGraph
import graft.multimodal.DocumentExtract
import graft.sources.Warc
import graft.text.Boilerplate

/** The crawl front-door queries: WARC ingestion (q147, rows-only ⊘ —
  * a byte-level container parse, the Excel/Audio/Video stance) and
  * block-level boilerplate removal (q148, full DuckDB oracle — the
  * extraction rule is pure column algebra, so the oracle re-derives
  * it expression-for-expression).
  *
  * The corpus carries no crawl dump, so the queries manufacture one
  * deterministically (the q134/q144/q145 fixture discipline): q148
  * wraps every document in a page skeleton whose chrome — nav, a
  * sponsored-links row, a tag cloud, a footer — is exactly the
  * boilerplate the block classifier exists to drop, built from
  * `concat` so DuckDB replays the construction too; q147 packs 20
  * such pages per WARC file (response records behind real HTTP
  * messages, warcinfo/request records to skip, gzipped files on odd
  * file ids exercising the Common Crawl member layout, a trailing
  * garbage member on every 5th file exercising the error contract).
  */
object WebQueries {

  type Q = (SparkSession, String) => DataFrame

  /** The q147 page body: a compact version of the q148 skeleton. */
  private def pageHtml(id: Long, text: String): String =
    s"""<html><head><title>Doc $id</title></head><body><nav><a href="/">Home</a> <a href="/about">About</a></nav><p>$text</p><footer>(c) 2024 Example Corp - <a href="/tos">Terms</a></footer></body></html>"""

  private val Crlf = "\r\n"

  private def warcRecord(tpe: String, extra: Seq[(String, String)], block: Array[Byte]): Array[Byte] = {
    val hdr = (Seq("WARC-Type" -> tpe) ++ extra ++
      Seq("Content-Length" -> block.length.toString))
      .map { case (k, v) => s"$k: $v" }.mkString(Crlf)
    (s"WARC/1.1$Crlf$hdr$Crlf$Crlf").getBytes("UTF-8") ++ block ++
      (Crlf + Crlf).getBytes("UTF-8")
  }

  private def httpBlock(status: String, contentType: String, body: Array[Byte]): Array[Byte] =
    (s"HTTP/1.1 $status${Crlf}Content-Type: $contentType${Crlf}Content-Length: ${body.length}$Crlf$Crlf")
      .getBytes("UTF-8") ++ body

  /** One WARC file over `docs` (already sorted by id): a warcinfo
    * record, one response per doc (404s and a plain-text page planted
    * on id residues), then — on every 5th file — a garbage tail that
    * must surface as exactly one error row. Odd file ids gzip each
    * record as its own member (the Common Crawl layout). */
  private[graft] def buildWarcFile(fileId: Long, docs: Seq[(Long, String)]): Array[Byte] = {
    val info = warcRecord("warcinfo",
      Seq("WARC-Record-ID" -> s"<urn:uuid:info$fileId>",
        "WARC-Date" -> "2024-01-01T00:00:00Z"),
      s"software: graft-fixture$Crlf".getBytes("UTF-8"))
    val responses = docs.map { case (id, text) =>
      val (status, ctype, body) =
        if (id % 13 == 0) ("404 Not Found", "text/html", "<html><body><p>gone</p></body></html>".getBytes("UTF-8"))
        else if (id % 11 == 0) ("200 OK", "text/plain; charset=utf-8", text.getBytes("UTF-8"))
        else ("200 OK", "text/html; charset=utf-8", pageHtml(id, text).getBytes("UTF-8"))
      warcRecord("response",
        Seq("WARC-Record-ID" -> s"<urn:uuid:doc$id>",
          "WARC-Date" -> "2024-01-01T00:00:00Z",
          "WARC-Target-URI" -> s"https://example.com/doc$id",
          "Content-Type" -> "application/http; msgtype=response"),
        httpBlock(status, ctype, body))
    }
    val request = warcRecord("request",
      Seq("WARC-Record-ID" -> s"<urn:uuid:req$fileId>",
        "WARC-Date" -> "2024-01-01T00:00:00Z"),
      s"GET / HTTP/1.1$Crlf$Crlf".getBytes("UTF-8"))
    val all = Seq(info) ++ responses ++ Seq(request)
    val gz = fileId % 2 == 1
    val tail: Array[Byte] =
      if (fileId % 5 != 0) Array.emptyByteArray
      else if (gz) Warc.gzipMember("GARBAGE-NOT-A-RECORD".getBytes("UTF-8"))
      else "GARBAGE-NOT-A-RECORD".getBytes("UTF-8")
    val recs = if (gz) all.map(Warc.gzipMember) else all
    recs.foldLeft(Array.emptyByteArray)(_ ++ _) ++ tail
  }

  /** q174: the q147 file rebuilt with per-record offsets — returns
    * the file bytes plus one index entry per RESPONSE record (and,
    * on every 5th file, for the planted garbage member: the index
    * claims a record the file cannot deliver, which must surface as
    * exactly one isolated error row — the malformed-record contract
    * the whole-file walk cannot give). Entry = (offset, length, url,
    * status). Offsets are member offsets, the Common Crawl CDXJ
    * meaning: each record its own gzip member on odd file ids. */
  private[graft] def buildWarcFileIndexed(
      fileId: Long, docs: Seq[(Long, String)]): (Array[Byte], Seq[(Long, Long, String, String)]) = {
    val gz = fileId % 2 == 1
    def member(b: Array[Byte]) = if (gz) Warc.gzipMember(b) else b
    val out = new java.io.ByteArrayOutputStream()
    val entries = Seq.newBuilder[(Long, Long, String, String)]
    def add(raw: Array[Byte], indexAs: Option[(String, String)]): Unit = {
      val m = member(raw)
      indexAs.foreach { case (url, status) =>
        entries += ((out.size.toLong, m.length.toLong, url, status))
      }
      out.write(m)
    }
    add(warcRecord("warcinfo",
      Seq("WARC-Record-ID" -> s"<urn:uuid:info$fileId>",
        "WARC-Date" -> "2024-01-01T00:00:00Z"),
      s"software: graft-fixture$Crlf".getBytes("UTF-8")), None)
    docs.foreach { case (id, text) =>
      val (status, ctype, body) =
        if (id % 13 == 0) ("404 Not Found", "text/html", "<html><body><p>gone</p></body></html>".getBytes("UTF-8"))
        else if (id % 11 == 0) ("200 OK", "text/plain; charset=utf-8", text.getBytes("UTF-8"))
        else ("200 OK", "text/html; charset=utf-8", pageHtml(id, text).getBytes("UTF-8"))
      add(warcRecord("response",
        Seq("WARC-Record-ID" -> s"<urn:uuid:doc$id>",
          "WARC-Date" -> "2024-01-01T00:00:00Z",
          "WARC-Target-URI" -> s"https://example.com/doc$id",
          "Content-Type" -> "application/http; msgtype=response"),
        httpBlock(status, ctype, body)),
        Some((s"https://example.com/doc$id", status.split(" ")(0))))
      ()
    }
    add(warcRecord("request",
      Seq("WARC-Record-ID" -> s"<urn:uuid:req$fileId>",
        "WARC-Date" -> "2024-01-01T00:00:00Z"),
      s"GET / HTTP/1.1$Crlf$Crlf".getBytes("UTF-8")), None)
    if (fileId % 5 == 0)
      add("GARBAGE-NOT-A-RECORD".getBytes("UTF-8"),
        Some((s"https://example.com/badrecord$fileId", "200")))
    (out.toByteArray, entries.result())
  }

  /** Ensure the indexed WARC fleet for corpus dir `d` exists on local
    * disk (fixture RENDER, done once per corpus and marker-guarded —
    * bench trials time the indexed READ, not the write): one file per
    * 20 docs written from its build task via the Hadoop FS API, plus
    * `cdx.parquet` of CDXJ lines whose offsets were measured during
    * the build. Returns the fleet directory. */
  private[graft] def ensureIndexedWarcFleet(s: SparkSession, d: String): String = {
    import s.implicits._
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(s"warcidx-v2:$d".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    val dir = s"/tmp/graft_warc_idx/$key"
    val done = new java.io.File(s"$dir/_DONE")
    if (!done.exists()) this.synchronized {
      if (!done.exists()) {
        new java.io.File(dir).mkdirs()
        val lines = Tables.documents(s, d)
          .select(expr("doc_id div 20").as("file_id"), col("doc_id"), col("text"))
          .as[(Long, Long, String)]
          .groupByKey(_._1)
          .flatMapGroups { (fid, it) =>
            val docs = it.map { case (_, id, text) => (id, text) }.toSeq.sortBy(_._1)
            val name = f"crawl$fid%05d.warc" + (if (fid % 2 == 1) ".gz" else "")
            val (bytes, entries) = buildWarcFileIndexed(fid, docs)
            val path = s"$dir/$name"
            val hp = new org.apache.hadoop.fs.Path(path)
            val fs = hp.getFileSystem(new org.apache.hadoop.conf.Configuration())
            val os = fs.create(hp, true)
            os.write(bytes); os.close()
            entries.iterator.map { case (off, len, url, status) =>
              val surt = "com,example)/" + url.split("/").last
              s"""$surt 20240101000000 {"url": "$url", "mime": "text/html", "status": "$status", "digest": "sha1:$off", "length": "$len", "offset": "$off", "filename": "$path"}"""
            }
          }
          .toDF("line")
        // natural partitioning, NOT coalesce(1): a single-file index
        // would serialize the downstream CDX parse through one scan
        // task (measured 6x the indexed read's wall) — and the real
        // cc-index ships sharded anyway
        lines.write.mode("overwrite").parquet(s"$dir/cdx.parquet")
        done.createNewFile()
        ()
      }
    }
    dir
  }

  val queries: Map[String, Q] = Map(
    // Crawl ingestion end-to-end (rows-only ⊘): render a WARC fleet
    // from the corpus, parse every record, keep responses, and run
    // main-content extraction over the html bodies — the full
    // dump → clean-text front door. Per-file flatMap tasks; bodies
    // never shuffle (the groupByKey below is the fixture RENDER, not
    // the operator). WarcSpec pins the parse grammar; expected rows =
    // one per doc plus one error row per 5th file.
    "q147_warc_extract" -> ((s, d) => {
      import s.implicits._
      val files = Tables.documents(s, d)
        .select(expr("doc_id div 20").as("file_id"), col("doc_id"), col("text"))
        .as[(Long, Long, String)]
        .groupByKey(_._1)
        .mapGroups { (fid, it) =>
          val docs = it.map { case (_, id, text) => (id, text) }.toSeq.sortBy(_._1)
          val name = f"crawl$fid%05d.warc" + (if (fid % 2 == 1) ".gz" else "")
          (name, buildWarcFile(fid, docs))
        }
        .toDF("path", "content")
      Warc.responses(files)
        .select(col("path"), col("record_id"), col("target_uri"), col("status"),
          col("content_type"), col("body_len"),
          when(col("content_type").startsWith("text/html"),
            length(Boilerplate.mainText(col("body"))).cast("long"))
            .otherwise(lit(null).cast("long")).as("main_len"),
          col("error"))
    }),

    // Block-level boilerplate removal (full DuckDB oracle): every doc
    // becomes a page whose chrome is boilerplate by construction —
    // nav and sponsored rows are link-dense, the tag cloud is short,
    // the footer is link-dense AND stopword-free — while the document
    // text and a quote paragraph are the content blocks. One narrow
    // projection, no shuffle (golden-plan-pinned).
    "q148_main_content" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), fixturePage.as("_html"))
        .select(col("doc_id"),
          DocumentExtract.htmlTitle(col("_html")).as("title"),
          Boilerplate.blockStats(col("_html")).as("_st"))
        .select(col("doc_id"), col("title"),
          array_join(
            transform(filter(col("_st"), s => s.getField("content")),
              s => s.getField("text")), " ").as("main_text"),
          size(col("_st")).cast("long").as("n_blocks"),
          size(filter(col("_st"), s => s.getField("content"))).cast("long").as("n_content"),
          aggregate(filter(col("_st"), s => s.getField("content")), lit(0L),
            (a, s) => a + s.getField("len")).as("main_len"),
          aggregate(filter(col("_st"), s => !s.getField("content")), lit(0L),
            (a, s) => a + s.getField("len")).as("boiler_len"))
    }),

    // Link-graph PageRank (full DuckDB oracle — exact on the integer
    // grid): the crawl-prioritization step between ingestion and
    // curation. The corpus carries no hyperlinks, so the query builds
    // a deterministic webgraph over the documents: page i links to
    // pages (31·i + 7j) mod N for j = 1..(i mod 3)+1 — out-degrees 1-3,
    // in-degree skew by construction. 3 damped iterations; the oracle
    // unrolls them CTE-for-CTE.
    "q151_pagerank" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.count() // bounded scalar read (fixture needs the modulus)
      LinkGraph.pageRank(docs, "doc_id", webgraph(docs, n), "src", "dst",
        iters = 3)
    }),

    // Exact bounded-radius harmonic centrality (full DuckDB oracle —
    // integer grid): PageRank's published sibling in the Common Crawl
    // webgraph releases, over the same fixture graph. Radius 3; the
    // oracle unrolls the frontier expansion CTE-for-CTE.
    "q152_harmonic" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.count()
      LinkGraph.harmonicCentrality(docs, "doc_id", webgraph(docs, n),
        "src", "dst", radius = 3)
    }),

    // URL frontier filtering (full DuckDB oracle): the RefinedWeb/
    // FineWeb pre-crawl hygiene pass — exact-domain blocklist, host
    // word blocklist (the UT1-style adult/gambling lists), and a
    // per-registered-domain document cap so no single site dominates
    // the corpus (RefinedWeb keeps top-N per domain by quality).
    // The corpus carries no URLs, so the query manufactures a crawl
    // frontier deterministically (23 hosts, two planted-bad, the odd
    // residues sharing one registered domain so the PLD grouping and
    // the cap both bite). One narrow projection + ONE window per
    // registered domain: blocked rows sort after eligible ones so
    // their ranks never consume keep-slots, and the audit output
    // carries every row with its verdict (the q31 stance — survivors
    // AND evidence). At production scale the survivors-only variant
    // filters `kept` and rides the WindowGroupLimit top-k pushdown;
    // domain skew is bounded because rank slots beyond the cap are
    // only ordered, never re-shuffled wide.
    "q157_url_frontier_filter" -> ((s, d) => {
      val idx = col("doc_id") % 23
      val host = when(idx === 3, lit("best-casino-bonus.bet"))
        .when(idx === 17, lit("adult-videos-hub.com"))
        .when(idx % 2 === 0, concat(lit("site"), idx, lit(".com")))
        .otherwise(concat(lit("blog"), idx, lit(".example.net")))
      Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars"), host.as("host"))
        .select(col("doc_id"), col("n_chars"), col("host"),
          concat(lit("https://"), col("host"), lit("/p/"), col("doc_id")).as("url"),
          regexp_extract(col("host"), "([^.]+\\.[^.]+)$", 1).as("domain"))
        .withColumn("block_reason",
          when(col("domain").isin("best-casino-bonus.bet"), lit("domain_blocklist"))
            .when(col("host").rlike("(casino|adult|porn|xxx|gambl)"), lit("word_blocklist"))
            .otherwise(lit(null).cast("string")))
        .withColumn("_bl", when(col("block_reason").isNull, 0).otherwise(1))
        .withColumn("domain_rank",
          row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("domain"))
              .orderBy(col("_bl").asc, col("n_chars").desc, col("doc_id").asc))
            .cast("long"))
        .select(col("doc_id"), col("url"), col("host"), col("domain"),
          col("block_reason"), col("domain_rank"),
          (col("block_reason").isNull && col("domain_rank") <= 100).as("kept"))
    }),

    // Per-node triangle counts + local clustering coefficient (full
    // DuckDB oracle): the webgraph STRUCTURE signal beside q151/q152's
    // rank — link farms read as near-clique clustering, topical hubs
    // as low-clustering stars. Degree-oriented wedge join (O(m^1.5)
    // bound); the triangle set is orientation-independent, so the
    // oracle replays it with the simple id-ordered triple join.
    "q158_triangles" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.count()
      LinkGraph.triangleCounts(docs, "doc_id", webgraph(docs, n), "src", "dst")
    }),

    // Anchor-text aggregation (full DuckDB oracle): per target page,
    // the top in-link anchors by frequency — the relevance signal a
    // page cannot write for itself (MS MARCO/ORCAS, Common Crawl host
    // anchors). The corpus carries no hyperlinks, so the fixture
    // attaches an anchor to every webgraph edge: token (src mod 5)+1
    // of the SOURCE document's text (a src-keyed broadcast-joinable
    // lookup). try_element_at because Spark 4 runs ANSI mode by
    // default, where plain element_at THROWS on an out-of-range
    // index; try_element_at yields NULL, matching DuckDB's list
    // indexing, so short documents drop instead of failing the run.
    // One (dst, anchor) groupBy, then total + rank over the same dst
    // partitioning.
    "q159_anchor_text" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val n = docs.count()
      val edges = webgraph(docs.select(col("doc_id")), n)
        .join(docs.withColumnRenamed("doc_id", "_sd"), col("src") === col("_sd"))
        .select(col("src"), col("dst"),
          try_element_at(split(col("text"), " "), (col("src") % 5 + 1).cast("int"))
            .as("anchor"))
      LinkGraph.anchorText(edges, "src", "dst", "anchor", topK = 3)
        .withColumnRenamed("dst", "doc_id")
    }),

    // Domain reputation rollup (full DuckDB oracle): the RefinedWeb/
    // FineWeb domain-grain hygiene pass over the q157 host fixture,
    // extended with a planted mirror farm (residue 9 hosts one
    // constant text) so the duplicate-pressure verdict bites, beside
    // the blocklisted casino domain. Exact COUNT(DISTINCT) columns on
    // the oracle path; `approx = true` is the Expand-free 100 TB twin
    // (the q40/q40a stance).
    "q160_domain_stats" -> ((s, d) => {
      val idx = col("doc_id") % 23
      val host = when(idx === 3, lit("best-casino-bonus.bet"))
        .when(idx === 17, lit("adult-videos-hub.com"))
        .when(idx === 9, lit("www.mirrorfarm.net"))
        .when(idx % 2 === 0, concat(lit("site"), idx, lit(".com")))
        .otherwise(concat(lit("blog"), idx, lit(".example.net")))
      val framed = Tables.documents(s, d)
        .select(col("doc_id"), host.as("host"),
          when(idx === 9, lit("this page is a mirror of the original content"))
            .otherwise(col("text")).as("text"))
      Domains.domainStats(framed, "host", "text",
        blockedExpr = col("host").rlike("(casino|adult|porn|xxx|gambl)"))
    }),

    // Label-propagation communities (full DuckDB oracle): synchronous
    // deterministic LPA (Raghavan et al. 2007 — min-label tie-break,
    // neighbors-only vote), 3 sweeps over the fixture webgraph; the
    // oracle unrolls every sweep CTE-for-CTE (count groupBy + argmax
    // window, exactly the Spark plan's shape).
    "q161_lpa_communities" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.count()
      LinkGraph.labelPropagation(docs, "doc_id", webgraph(docs, n),
        "src", "dst", iters = 3)
    }),

    // robots.txt URL admission (full DuckDB oracle): RFC 9309 crawl
    // politeness — parse manufactured robots bodies (three shapes:
    // agent-specific group override, multi-agent group with
    // longest-match rules, tie-goes-to-allow + idiomatic empty
    // Disallow), then admit a frontier of one URL per document as
    // agent "graftbot". The oracle replays the line parse (comment
    // strip, running-sum group ids), group selection and the
    // longest/allow-first argmax window CTE-for-CTE; fixture patterns
    // are literal prefixes, so prefix match replays as starts_with.
    "q164_robots" -> ((s, d) => {
      val idx = col("doc_id") % 23
      val host = concat(lit("site"), idx, lit(".example"))
      val robots = Tables.documents(s, d).select(idx.as("_i")).distinct()
        .select(concat(lit("site"), col("_i"), lit(".example")).as("host"),
          when(col("_i") % 3 === 0, lit(
            "User-agent: *\nDisallow: /private\nAllow: /private/ok\n# graftbot gets its own group\n\nUser-agent: graftbot\nDisallow: /tmp\n"))
            .when(col("_i") % 3 === 1, lit(
              "User-agent: graftbot\nUser-agent: otherbot\nDisallow: /secret\nAllow: /secret/x\nDisallow: /tmp\n"))
            .otherwise(lit(
              "User-agent: *\n# be nice\nAllow: /tmp/f\nDisallow: /tmp/f\nDisallow:\n")).as("content"))
      val urls = Tables.documents(s, d).select(col("doc_id"), host.as("host"),
        concat(
          when(col("doc_id") % 5 === 0, lit("/private/doc"))
            .when(col("doc_id") % 5 === 1, lit("/private/ok/doc"))
            .when(col("doc_id") % 5 === 2, lit("/secret/x"))
            .when(col("doc_id") % 5 === 3, lit("/tmp/f"))
            .otherwise(lit("/public/doc")),
          col("doc_id")).as("path"))
      Robots.decide(urls, "doc_id", "host", "path",
        Robots.parseRules(robots, "host", "content"), "graftbot")
    }),

    // Incremental domain reputation (full DuckDB oracle — q160's
    // oracle verbatim): the q160 fixture split into two "crawl days"
    // (even/odd ids), each inventoried into a mergeable domainStore,
    // merged, and re-derived — bit-identical to the one-shot rollup
    // over the union, which is exactly what the oracle computes. The
    // store collapses exact-duplicate pages, so it scales with
    // distinct content, not crawl volume (the paragraphStore
    // argument).
    "q169_domain_stats_incremental" -> ((s, d) => {
      val idx = col("doc_id") % 23
      val host = when(idx === 3, lit("best-casino-bonus.bet"))
        .when(idx === 17, lit("adult-videos-hub.com"))
        .when(idx === 9, lit("www.mirrorfarm.net"))
        .when(idx % 2 === 0, concat(lit("site"), idx, lit(".com")))
        .otherwise(concat(lit("blog"), idx, lit(".example.net")))
      val framed = Tables.documents(s, d)
        .select(col("doc_id"), host.as("host"),
          when(idx === 9, lit("this page is a mirror of the original content"))
            .otherwise(col("text")).as("text"))
      val blocked = col("host").rlike("(casino|adult|porn|xxx|gambl)")
      val dayA = Domains.domainStore(
        framed.filter(col("doc_id") % 2 === 0), "host", "text", blocked)
      val dayB = Domains.domainStore(
        framed.filter(col("doc_id") % 2 === 1), "host", "text", blocked)
      Domains.domainStatsFromStore(Domains.mergeDomainStores(dayA, dayB))
    }),

    // HTML link extraction + URL resolution (full DuckDB oracle): the
    // edge-construction step between the crawl front door and the
    // webgraph family — every page yields its <a href> edges with
    // tag-stripped anchors, each target resolved against the page URL
    // (absolute / protocol-relative / root-relative / query / fragment
    // / dot-segment relative, all exercised by the fixture). One
    // narrow explode; page bodies never shuffle.
    "q170_html_links" -> ((s, d) => {
      val pages = Tables.documents(s, d).select(
        concat(lit("https://site"), col("doc_id") % 23,
          lit(".example/a/b/page"), col("doc_id"), lit(".html")).as("url"),
        concat(
          lit("<html><body><nav><a href=\"/\">Home</a> <a href=\"/c"),
          col("doc_id") % 7, lit("\">Cat "), col("doc_id") % 7, lit("</a></nav>"),
          lit("<p>body <a href=\"rel/r"), col("doc_id"),
          lit("\">see  <b>also</b></a> and <a href=\"../up"), col("doc_id"),
          lit("\">up</a></p>"),
          lit("<a href=\"//cdn.example/lib.js\">cdn</a>"),
          lit("<a href=\"https://ext.example/x"), col("doc_id"), lit("\">ext</a>"),
          lit("<a href=\"?page=2\">next</a>"),
          lit("<a href=\"#top\">top</a>"),
          lit("<a name=\"anchorless\">no href</a>"),
          lit("</body></html>")).as("html"))
      Links.extractEdges(pages, "url", "html")
    }),

    // URL resolution branch matrix (full DuckDB oracle): resolveUrl
    // over a base/ref fixture hitting every reference class incl. the
    // bounded ../-collapse; the oracle replays the CASE chain and the
    // regex passes verbatim.
    "q171_resolve_urls" -> ((s, d) => {
      val r = col("doc_id") % 8
      val base = concat(lit("https://h"), col("doc_id") % 5,
        lit(".example/a/b/c/page"), col("doc_id"), lit(".html?x=1#sec"))
      val ref = when(r === 0, concat(lit("https://abs.example/p"), col("doc_id")))
        .when(r === 1, lit("//cdn.example/lib.js"))
        .when(r === 2, concat(lit("/root"), col("doc_id")))
        .when(r === 3, concat(lit("rel/r"), col("doc_id")))
        .when(r === 4, concat(lit("../../up"), col("doc_id")))
        .when(r === 5, lit("#frag"))
        .when(r === 6, lit("?page=2"))
        .otherwise(lit(""))
      Tables.documents(s, d)
        .select(col("doc_id"), base.as("base"), ref.as("ref"))
        .withColumn("resolved", Links.resolveUrl(col("base"), col("ref")))
    }),

    // CDX(J) index parsing (full DuckDB oracle): the Common Crawl
    // cc-index line grammar — SURT + timestamp + JSON — built from
    // the corpus via concat so the oracle replays construction,
    // the first-two-spaces regex split, json_extract and the numeric
    // casts verbatim. Narrow projection, no shuffle.
    "q173_cdx_parse" -> ((s, d) => {
      val id = col("doc_id")
      val host = concat(lit("site"), id % 23)
      val line = concat(
        lit("com,"), host, lit(")/doc"), id,
        lit(" 2024010100"), lpad((id % 60).cast("string"), 4, "0"),
        lit(" {\"url\": \"https://"), host, lit(".com/doc"), id,
        lit("\", \"mime\": \""),
        when(id % 11 === 0, lit("text/plain")).otherwise(lit("text/html")),
        lit("\", \"status\": \""),
        when(id % 13 === 0, lit("404")).otherwise(lit("200")),
        lit("\", \"digest\": \"sha1:"), upper(substring(md5(id.cast("string")), 1, 32)),
        lit("\", \"length\": \""), col("n_chars") + 512,
        lit("\", \"offset\": \""), id * 2048,
        lit("\", \"filename\": \"crawl-data/CC-MAIN/warc/crawl"), id % 20,
        lit(".warc.gz\"}"))
      Cdx.parse(Tables.documents(s, d).select(line.as("line")), "line")
        .withColumn("doc_id", regexp_extract(col("url"), "doc([0-9]+)$", 1).cast("long"))
    }),

    // CDX-offset WARC reads (rows-only ⊘ — byte-level decode): the
    // q147 fleet rebuilt as REAL on-disk files with a measured-offset
    // CDXJ index (fixture render, once per corpus), then read the
    // Common Crawl way: Cdx.parse → one positioned read per record.
    // Parallelism is per RECORD (index rows repartition before any
    // byte moves), and the planted garbage members — which HALT the
    // q147 whole-file walk at their file — surface here as exactly
    // one isolated error row each while every neighbor parses.
    // WarcSpec pins the grammar, isolation and offset arithmetic.
    "q174_warc_indexed" -> ((s, d) => {
      val dir = ensureIndexedWarcFleet(s, d)
      val idx = Cdx.parse(s.read.parquet(s"$dir/cdx.parquet"), "line")
      Warc.responsesIndexed(idx)
        .select(col("offset"), col("record_id"), col("target_uri"), col("status"),
          col("content_type"), col("body_len"),
          when(col("content_type").startsWith("text/html"),
            length(Boilerplate.mainText(col("body"))).cast("long"))
            .otherwise(lit(null).cast("long")).as("main_len"),
          col("error"))
    }),

    // Mercator frontier scheduling (full DuckDB oracle): one round's
    // fetch list over the q157 host grain — priority desc within a
    // host, politeness token arithmetic over planted last-fetch
    // timestamps (idx%4==0 hosts throttled to ZERO slots this round,
    // idx%4==1 hosts to a delayed opening, the rest fully open),
    // per-host WindowGroupLimit, TakeOrdered global budget cut. The
    // oracle replays join, slot arithmetic, both windows and the
    // limit verbatim.
    "q179_frontier_schedule" -> ((s, d) => {
      val idx = col("doc_id") % 23
      val host = when(idx % 2 === 0, concat(lit("site"), idx, lit(".com")))
        .otherwise(concat(lit("blog"), idx, lit(".example.net")))
      val docs = Tables.documents(s, d)
      val frontier = docs.select(
        concat(lit("https://"), host, lit("/p/"), col("doc_id")).as("url"),
        host.as("host"), col("n_chars").as("priority"))
      val lastFetch = docs.select(host.as("host"),
          when(idx % 4 === 0, lit(1009000L))
            .when(idx % 4 === 1, lit(998000L)).as("ts"))
        .filter(col("ts").isNotNull)
      graft.crawl.Frontier.schedule(frontier, "url", "host", "priority",
        lastFetch, "host", "ts",
        roundStart = 1000000L, roundEnd = 1012000L, minDelayMs = 5000L,
        maxPerHost = 2, budget = 150)
    }),

    // Host-graph contraction (full DuckDB oracle): the cc-webgraph
    // HOST rollup — page edges contract to host pairs with weight =
    // page-link count, self-loops (intra-host links) dropped. Hosts
    // derive from the q160 grain (doc_id % 23). One narrow projection
    // + one map-side-partial groupBy; every graph analytic above runs
    // unchanged on the result.
    "q175_host_graph" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.count()
      LinkGraph.contractTo(webgraph(docs, n), "src", "dst",
        c => concat(lit("site"), c % 23))
    }),

    // HITS hub/authority (full DuckDB oracle): Kleinberg's mutually-
    // recursive pair beside q151's PageRank, 2 rounds on the fixture
    // webgraph, L1-normalized on the micro grid so the oracle unrolls
    // every half-step CTE-for-CTE (the q151 trick: BIGINT sums +
    // integral div).
    "q176_hits" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.count()
      LinkGraph.hits(docs, "doc_id", webgraph(docs, n), "src", "dst",
        iters = 2)
    }),

    // Incremental webgraph + warm-start PageRank (full DuckDB oracle):
    // the daily-crawl contract for the graph family — edges with
    // src % 10 != 0 are the signed history (present as its mergeable
    // adjacency STORE), the rest arrive as today's batch; ranks seed
    // from the previous round's published output (3 fixture rounds on
    // the old graph) and run 2 reconvergence rounds on the merged
    // store. The oracle unrolls all 5 half-steps on the q151 integer
    // grid — the warm phase must land digit-for-digit where the
    // arithmetic says, so "incremental" can never drift from "batch".
    "q187_pagerank_warm" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.count()
      val all = webgraph(docs, n)
      val old = all.filter(col("src") % 10 =!= 0)
      // cold phase reads the CHECKPOINTED history store instead of
      // re-deriving the raw edge list per round — pageRankFromStore is
      // spec-pinned bit-identical to the raw-edge loop, so the seed
      // (and the oracle hash) is unchanged (r20, guide §2.4)
      val oldStore = LinkGraph.adjacencyStore(old, "src", "dst").localCheckpoint(true)
      val store = LinkGraph.mergeAdjacency(
        oldStore, all.filter(col("src") % 10 === 0), "src", "dst")
      val seed = LinkGraph.pageRankFromStore(docs, "doc_id", oldStore, iters = 3)
        .localCheckpoint(true) // the previous round's published ranks
      LinkGraph.pageRankFromStore(docs, "doc_id", store, iters = 2,
        seed = Some(seed))
    }),

    // Incremental webgraph + warm-start HITS (full DuckDB oracle, the
    // q187 discipline applied to the hub/authority pair — r15 verdict
    // #4): 2 cold rounds on the signed history graph (src % 10 ≠ 0)
    // publish hub scores; the batch folds into the mergeable adjacency
    // store and 2 warm rounds run seeded from the published hubs (the
    // hub vector is the complete state — each round's first half-step
    // derives auth from hub). The oracle unrolls all 8 half-steps on
    // the micro grid, cold phase on the old edges, warm on the full
    // graph — digit-for-digit, so incremental can never drift.
    "q192_hits_warm" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.count()
      val all = webgraph(docs, n)
      val old = all.filter(col("src") % 10 =!= 0)
      // the q187 stance (r20): cold HITS off the checkpointed history
      // store — hitsFromStore is spec-pinned bit-identical to the
      // raw-edge loop, so the published seed hashes unchanged
      val oldStore = LinkGraph.adjacencyStore(old, "src", "dst").localCheckpoint(true)
      val store = LinkGraph.mergeAdjacency(
        oldStore, all.filter(col("src") % 10 === 0), "src", "dst")
      val seed = LinkGraph.hitsFromStore(docs, "doc_id", oldStore, iters = 2)
        .localCheckpoint(true) // the previous round's published scores
      LinkGraph.hitsFromStore(docs, "doc_id", store, iters = 2,
        seed = Some(seed))
    }),

    // Incremental webgraph + warm-start LPA (full DuckDB oracle, the
    // q187 discipline on the community signal): 3 cold sweeps on the
    // history graph publish labels; the batch folds into the store and
    // 2 warm sweeps run seeded from them (LPA's absorbing state is a
    // sweep fixed point — unchanged neighborhoods are no-ops). The
    // oracle unrolls all 5 sweeps, cold on the old undirected simple
    // graph, warm on the merged one.
    "q193_lpa_warm" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.count()
      val all = webgraph(docs, n)
      val old = all.filter(col("src") % 10 =!= 0)
      // the q187 stance (r20): cold sweeps off the checkpointed history
      // store — labelPropagationFromStore is spec-pinned row-identical
      // to the raw-edge path (multiplicity collapses in the distinct)
      val oldStore = LinkGraph.adjacencyStore(old, "src", "dst").localCheckpoint(true)
      val store = LinkGraph.mergeAdjacency(
        oldStore, all.filter(col("src") % 10 === 0), "src", "dst")
      val seed = LinkGraph.labelPropagationFromStore(docs, "doc_id", oldStore,
        iters = 3).localCheckpoint(true)
      LinkGraph.labelPropagationFromStore(docs, "doc_id", store, iters = 2,
        seed = Some(seed))
    }),

    // Store-fed triangle counting (full DuckDB oracle — q158's SQL
    // VERBATIM on the incrementally merged store, the q186 pattern):
    // the STRUCTURE signal joins the daily-crawl contract — history is
    // present only as its adjacency store, the batch folds in with one
    // groupBy-sum, and triangle counts read the store directly.
    // Triangles live on the undirected simple graph, so direction and
    // n_links multiplicity collapse exactly as raw parallel edges do —
    // the merged-store answer must hash-equal the full raw-edge q158.
    "q194_triangles_store" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.count()
      val all = webgraph(docs, n)
      val old = all.filter(col("src") % 10 =!= 0)
      val store = LinkGraph.mergeAdjacency(
        LinkGraph.adjacencyStore(old, "src", "dst").localCheckpoint(true),
        all.filter(col("src") % 10 === 0), "src", "dst")
      LinkGraph.triangleCountsFromStore(docs, "doc_id", store)
    }),

    // Store-fed harmonic centrality (full DuckDB oracle — q152's SQL
    // VERBATIM on the incrementally merged store, the q194 pattern):
    // the LAST graph member joins the daily-crawl contract — history
    // present only as its adjacency store, the batch folds in with one
    // groupBy-sum, and bounded-radius harmonic reads the store
    // directly. Distance lives on the simple graph, so direction
    // multiplicity and n_links collapse exactly as raw parallel edges
    // do — the merged-store answer must hash-equal the raw-edge q152.
    "q196_harmonic_store" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.count()
      val all = webgraph(docs, n)
      val old = all.filter(col("src") % 10 =!= 0)
      val store = LinkGraph.mergeAdjacency(
        LinkGraph.adjacencyStore(old, "src", "dst").localCheckpoint(true),
        all.filter(col("src") % 10 === 0), "src", "dst")
      LinkGraph.harmonicFromStore(docs, "doc_id", store, radius = 3)
    }),

    // HyperBall harmonic (rows-only ⊘ — DataSketches HLL is not
    // DuckDB-replayable): the webgraph-scale path, one mergeable
    // sketch per node instead of the exact pair set. LinkGraphSpec
    // pins its sparse-regime estimates exactly equal to q152's exact
    // values on this very fixture shape.
    "q152a_harmonic_hyperball" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.count()
      LinkGraph.harmonicApprox(docs, "doc_id", webgraph(docs, n),
        "src", "dst", radius = 3)
    }),

    // Warm-start HyperBall (rows-only ⊘, the q191a stance: the warm
    // path RUNS as a per-round bench artifact; LinkGraphSpec pins its
    // values equal to the cold radius-3 run through a parquet
    // round-trip). The radius-2 ball state is the previous round's
    // published checkpoint stand-in (materialized — its build is part
    // of the measured fixture, the q96a index-build stance); the timed
    // operator is the store read + ONE radius step growing persisted
    // mergeable sketches — the 100 TB contract where re-running radii
    // 1..R-1 over the corpus is the thing to avoid.
    "q198_hyperball_warm" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.count()
      val store = LinkGraph.adjacencyStore(webgraph(docs, n), "src", "dst")
        .localCheckpoint(true) // feeds the published phase AND the warm step
      val published = LinkGraph.hyperBallGrow(
        LinkGraph.hyperBallInit(docs, "doc_id"), "doc_id", store, 1, 2)
      LinkGraph.hyperBallGrow(published, "doc_id", store, 3, 3)
        .select(col("doc_id"), col("harmonic"), col("ball_size"))
    }))

  /** The deterministic fixture webgraph q151/q152 rank (the corpus
    * carries no hyperlinks): page i → (31·i + 7·j) mod N for
    * j = 1..(i mod 3)+1 — out-degrees 1-3, skewed in-degrees. */
  /** The fixture page every doc renders to (q148's construction,
    * shared with the q180 pipeline composition): chrome is boilerplate
    * by construction, the doc text and a quote paragraph are content. */
  private[queries] def fixturePage: org.apache.spark.sql.Column = concat(
    lit("<html><head><title>Doc "), col("doc_id"), lit("</title></head><body>"),
    lit("<nav><a href=\"/\">Home</a> <a href=\"/c"), col("doc_id") % 7,
    lit("\">Cat "), col("doc_id") % 7, lit("</a> <a href=\"/about\">About</a></nav>"),
    lit("<div>Sponsored: <a href=\"/buy\">Buy now</a> <a href=\"/deal\">Hot deal</a> <a href=\"/win\">Win big</a></div>"),
    lit("<p>"), col("text"), lit("</p>"),
    lit("<blockquote>Readers said that it was one of the better pages about topic "),
    col("doc_id") % 7, lit(" and that the site is worth a second look.</blockquote>"),
    lit("<div>tag"), col("doc_id") % 5, lit(" tag"), col("doc_id") % 11, lit("</div>"),
    lit("<footer>Copyright 2024 Example Corp - <a href=\"/tos\">Terms of use</a> <a href=\"/privacy\">Privacy</a></footer>"),
    lit("</body></html>"))

  /** The q148 block-algebra oracle CTEs, parameterized on nothing —
    * shared verbatim with the q180 composition oracle. Ends with the
    * `s2` CTE carrying (doc_id, html, st). */
  private[queries] val fixtureExtractSql: String =
    """h AS (
         SELECT doc_id,
           '<html><head><title>Doc ' || doc_id || '</title></head><body>'
           || '<nav><a href="/">Home</a> <a href="/c' || (doc_id % 7) || '">Cat ' || (doc_id % 7) || '</a> <a href="/about">About</a></nav>'
           || '<div>Sponsored: <a href="/buy">Buy now</a> <a href="/deal">Hot deal</a> <a href="/win">Win big</a></div>'
           || '<p>' || text || '</p>'
           || '<blockquote>Readers said that it was one of the better pages about topic ' || (doc_id % 7) || ' and that the site is worth a second look.</blockquote>'
           || '<div>tag' || (doc_id % 5) || ' tag' || (doc_id % 11) || '</div>'
           || '<footer>Copyright 2024 Example Corp - <a href="/tos">Terms of use</a> <a href="/privacy">Privacy</a></footer>'
           || '</body></html>' AS html
         FROM documents),
       s0 AS (
         SELECT doc_id, html,
           list_transform(
             string_split_regex(html, '(?i)</?(?:p|div|h[1-6]|li|ul|ol|dl|dt|dd|table|thead|tbody|tr|td|th|blockquote|pre|section|article|header|footer|nav|aside|main|form|figure|figcaption|br)(?:\s[^>]*)?/?>'),
             b -> struct_pack(
               txt := trim(regexp_replace(regexp_replace(b, '<[^>]+>', ' ', 'g'), '\s+', ' ', 'g')),
               link := CAST(coalesce(list_sum(list_transform(
                 regexp_extract_all(b, '(?is)<a\b[^>]*>(.*?)</a>', 1),
                 a -> length(trim(regexp_replace(regexp_replace(a, '<[^>]+>', ' ', 'g'), '\s+', ' ', 'g'))))), 0) AS BIGINT))) AS s0
         FROM h),
       s1 AS (
         SELECT doc_id, html,
           list_filter(
             list_transform(s0, s -> struct_pack(
               txt := s.txt,
               len := CAST(length(s.txt) AS BIGINT),
               link := s.link,
               nstop := CAST(len(list_filter(
                 list_filter(string_split_regex(lower(s.txt), '[^a-z0-9]+'), t -> t <> ''),
                 t -> list_contains(['the','a','an','and','of','to','in','is','that','it'], t))) AS BIGINT),
               ntok := CAST(len(list_filter(string_split_regex(lower(s.txt), '[^a-z0-9]+'), t -> t <> '')) AS BIGINT))),
             s -> s.len > 0) AS st
         FROM s0),
       s2 AS (
         SELECT doc_id, html,
           list_transform(st, s -> struct_pack(
             txt := s.txt, len := s.len,
             content := s.len >= 40
               AND (CASE WHEN s.len > 0 THEN CAST(s.link AS DOUBLE) / CAST(s.len AS DOUBLE) ELSE 1.0 END) <= 0.25
               AND (CASE WHEN s.ntok > 0 THEN CAST(s.nstop AS DOUBLE) / CAST(s.ntok AS DOUBLE) ELSE 0.0 END) >= 0.05)) AS st
         FROM s1)"""

  private def webgraph(docs: DataFrame, n: Long): DataFrame = docs
    .select(col("doc_id").as("src"),
      explode(sequence(lit(1L), col("doc_id") % 3 + 1)).as("j"))
    .select(col("src"), ((col("src") * 31 + col("j") * 7) % n).as("dst"))

  /** The q148 oracle re-derives the page construction AND the block
    * algebra: same split pattern, same strip/collapse chain, same
    * density arithmetic (single IEEE divisions), same fold sums. */
  // plain concatenation, NOT s-interpolation: the SQL bodies carry
  // regex escapes (\s, \1) that the s-interpolator would reject
  private val q148Sql =
    "WITH " + fixtureExtractSql + "\n" +
    """SELECT doc_id,
         trim(regexp_replace(regexp_extract(html, '(?is)<title[^>]*>(.*?)</title>', 1), '\s+', ' ', 'g')) AS title,
         array_to_string(list_transform(list_filter(st, s -> s.content), s -> s.txt), ' ') AS main_text,
         CAST(len(st) AS BIGINT) AS n_blocks,
         CAST(len(list_filter(st, s -> s.content)) AS BIGINT) AS n_content,
         CAST(coalesce(list_sum(list_transform(list_filter(st, s -> s.content), s -> s.len)), 0) AS BIGINT) AS main_len,
         CAST(coalesce(list_sum(list_transform(list_filter(st, s -> NOT s.content), s -> s.len)), 0) AS BIGINT) AS boiler_len
       FROM s2"""

  /** The q151 oracle: same fixture graph, same integer grid, the 3
    * iterations unrolled — every division integral (`//` floors,
    * Spark `div` truncates; all operands non-negative so they agree),
    * every sum BIGINT (associative-exact, so shuffle order cannot
    * change a digit). */
  private val q151Sql =
    """WITH nn AS (SELECT count(*) AS n FROM documents),
       nodes AS (SELECT doc_id AS v FROM documents),
       e AS (
         SELECT doc_id AS src,
           (doc_id * 31 + 7 * j) % (SELECT n FROM nn) AS dst
         FROM documents, unnest(range(1, doc_id % 3 + 2)) AS t(j)),
       deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
       ed AS (SELECT e.src, e.dst, deg.d FROM e JOIN deg USING (src)),
       r0 AS (SELECT v, (SELECT 1000000000000 // n FROM nn) AS r FROM nodes),
       c1 AS (SELECT ed.dst AS v, CAST(sum(r0.r // ed.d) AS BIGINT) AS i
              FROM ed JOIN r0 ON r0.v = ed.src GROUP BY ed.dst),
       r1 AS (SELECT n.v,
                (SELECT ((100 - 85) * (1000000000000 // n)) // 100 FROM nn)
                  + (85 * coalesce(c1.i, 0)) // 100 AS r
              FROM nodes n LEFT JOIN c1 ON c1.v = n.v),
       c2 AS (SELECT ed.dst AS v, CAST(sum(r1.r // ed.d) AS BIGINT) AS i
              FROM ed JOIN r1 ON r1.v = ed.src GROUP BY ed.dst),
       r2 AS (SELECT n.v,
                (SELECT ((100 - 85) * (1000000000000 // n)) // 100 FROM nn)
                  + (85 * coalesce(c2.i, 0)) // 100 AS r
              FROM nodes n LEFT JOIN c2 ON c2.v = n.v),
       c3 AS (SELECT ed.dst AS v, CAST(sum(r2.r // ed.d) AS BIGINT) AS i
              FROM ed JOIN r2 ON r2.v = ed.src GROUP BY ed.dst),
       r3 AS (SELECT n.v,
                (SELECT ((100 - 85) * (1000000000000 // n)) // 100 FROM nn)
                  + (85 * coalesce(c3.i, 0)) // 100 AS r
              FROM nodes n LEFT JOIN c3 ON c3.v = n.v)
       SELECT v AS doc_id, CAST(r AS BIGINT) AS rank_micro FROM r3"""

  /** The q187 oracle: q151's integer grid over BOTH phases — 3
    * cold rounds on the old graph (src % 10 ≠ 0) from uniform, then 2
    * warm rounds on the FULL graph seeded by round 3. Degrees per
    * phase come from that phase's edge set, exactly as the adjacency
    * store replays raw-edge counts. */
  private val q187Sql =
    """WITH nn AS (SELECT count(*) AS n FROM documents),
       nodes AS (SELECT doc_id AS v FROM documents),
       e AS (
         SELECT doc_id AS src,
           (doc_id * 31 + 7 * j) % (SELECT n FROM nn) AS dst
         FROM documents, unnest(range(1, doc_id % 3 + 2)) AS t(j)),
       eo AS (SELECT * FROM e WHERE src % 10 <> 0),
       dego AS (SELECT src, count(*) AS d FROM eo GROUP BY src),
       edo AS (SELECT eo.src, eo.dst, dego.d FROM eo JOIN dego USING (src)),
       r0 AS (SELECT v, (SELECT 1000000000000 // n FROM nn) AS r FROM nodes),
       c1 AS (SELECT edo.dst AS v, CAST(sum(r0.r // edo.d) AS BIGINT) AS i
              FROM edo JOIN r0 ON r0.v = edo.src GROUP BY edo.dst),
       r1 AS (SELECT n.v,
                (SELECT ((100 - 85) * (1000000000000 // n)) // 100 FROM nn)
                  + (85 * coalesce(c1.i, 0)) // 100 AS r
              FROM nodes n LEFT JOIN c1 ON c1.v = n.v),
       c2 AS (SELECT edo.dst AS v, CAST(sum(r1.r // edo.d) AS BIGINT) AS i
              FROM edo JOIN r1 ON r1.v = edo.src GROUP BY edo.dst),
       r2 AS (SELECT n.v,
                (SELECT ((100 - 85) * (1000000000000 // n)) // 100 FROM nn)
                  + (85 * coalesce(c2.i, 0)) // 100 AS r
              FROM nodes n LEFT JOIN c2 ON c2.v = n.v),
       c3 AS (SELECT edo.dst AS v, CAST(sum(r2.r // edo.d) AS BIGINT) AS i
              FROM edo JOIN r2 ON r2.v = edo.src GROUP BY edo.dst),
       r3 AS (SELECT n.v,
                (SELECT ((100 - 85) * (1000000000000 // n)) // 100 FROM nn)
                  + (85 * coalesce(c3.i, 0)) // 100 AS r
              FROM nodes n LEFT JOIN c3 ON c3.v = n.v),
       dega AS (SELECT src, count(*) AS d FROM e GROUP BY src),
       eda AS (SELECT e.src, e.dst, dega.d FROM e JOIN dega USING (src)),
       w1 AS (SELECT eda.dst AS v, CAST(sum(r3.r // eda.d) AS BIGINT) AS i
              FROM eda JOIN r3 ON r3.v = eda.src GROUP BY eda.dst),
       r4 AS (SELECT n.v,
                (SELECT ((100 - 85) * (1000000000000 // n)) // 100 FROM nn)
                  + (85 * coalesce(w1.i, 0)) // 100 AS r
              FROM nodes n LEFT JOIN w1 ON w1.v = n.v),
       w2 AS (SELECT eda.dst AS v, CAST(sum(r4.r // eda.d) AS BIGINT) AS i
              FROM eda JOIN r4 ON r4.v = eda.src GROUP BY eda.dst),
       r5 AS (SELECT n.v,
                (SELECT ((100 - 85) * (1000000000000 // n)) // 100 FROM nn)
                  + (85 * coalesce(w2.i, 0)) // 100 AS r
              FROM nodes n LEFT JOIN w2 ON w2.v = n.v)
       SELECT v AS doc_id, CAST(r AS BIGINT) AS rank_micro FROM r5"""

  /** The q152 oracle: same fixture graph, self-loops dropped, the
    * radius-3 frontier expansion unrolled — f_r holds the (u, v)
    * pairs FIRST reached at distance r (DISTINCT per step, anti-joined
    * against every earlier step), and every 1/d term is the integral
    * `scale // d`, so BIGINT sums match Spark digit-for-digit. */
  private val q152Sql =
    """WITH nn AS (SELECT count(*) AS n FROM documents),
       e0 AS (
         SELECT doc_id AS src,
           (doc_id * 31 + 7 * j) % (SELECT n FROM nn) AS dst
         FROM documents, unnest(range(1, doc_id % 3 + 2)) AS t(j)),
       e AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
       f1 AS (SELECT src AS u, dst AS v, 1 AS d FROM e),
       f2 AS (
         SELECT DISTINCT a.u, e.dst AS v, 2 AS d
         FROM f1 a JOIN e ON e.src = a.v
         WHERE a.u <> e.dst
           AND NOT EXISTS (SELECT 1 FROM f1 p WHERE p.u = a.u AND p.v = e.dst)),
       f3 AS (
         SELECT DISTINCT a.u, e.dst AS v, 3 AS d
         FROM f2 a JOIN e ON e.src = a.v
         WHERE a.u <> e.dst
           AND NOT EXISTS (SELECT 1 FROM f1 p WHERE p.u = a.u AND p.v = e.dst)
           AND NOT EXISTS (SELECT 1 FROM f2 p WHERE p.u = a.u AND p.v = e.dst)),
       allr AS (
         SELECT * FROM f1 UNION ALL SELECT * FROM f2 UNION ALL SELECT * FROM f3),
       h AS (SELECT v, CAST(sum(1000000 // d) AS BIGINT) AS hm
             FROM allr GROUP BY v)
       SELECT doc_id, CAST(coalesce(hm, 0) AS BIGINT) AS harmonic_micro
       FROM documents LEFT JOIN h ON h.v = doc_id"""

  /** The q157 oracle replays the frontier construction and the filter
    * verdict column-for-column; the one window uses the same explicit
    * blocked-last sort key, so ranks agree row-for-row. */
  private val q157Sql =
    """WITH f AS (
         SELECT doc_id, n_chars,
           CASE WHEN doc_id % 23 = 3 THEN 'best-casino-bonus.bet'
                WHEN doc_id % 23 = 17 THEN 'adult-videos-hub.com'
                WHEN (doc_id % 23) % 2 = 0 THEN 'site' || (doc_id % 23) || '.com'
                ELSE 'blog' || (doc_id % 23) || '.example.net' END AS host
         FROM documents),
       g AS (
         SELECT doc_id, n_chars, host,
           'https://' || host || '/p/' || doc_id AS url,
           regexp_extract(host, '([^.]+\.[^.]+)$', 1) AS domain
         FROM f),
       h AS (
         SELECT *,
           CASE WHEN domain IN ('best-casino-bonus.bet') THEN 'domain_blocklist'
                WHEN regexp_matches(host, '(casino|adult|porn|xxx|gambl)') THEN 'word_blocklist'
                ELSE NULL END AS block_reason
         FROM g),
       i AS (
         SELECT *,
           CAST(row_number() OVER (PARTITION BY domain
             ORDER BY CASE WHEN block_reason IS NULL THEN 0 ELSE 1 END,
                      n_chars DESC, doc_id) AS BIGINT) AS domain_rank
         FROM h)
       SELECT doc_id, url, host, domain, block_reason, domain_rank,
         (block_reason IS NULL AND domain_rank <= 100) AS kept
       FROM i"""

  /** The q158 oracle: same fixture graph canonicalized the same way,
    * triangles enumerated by the simple id-ordered triple join (the
    * triangle SET is orientation-independent, so Spark's degree-
    * oriented wedge plan lands on identical rows); the clustering
    * coefficient is one IEEE division of exact BIGINTs. */
  private val q158Sql =
    """WITH nn AS (SELECT count(*) AS n FROM documents),
       e0 AS (
         SELECT doc_id AS src, (doc_id * 31 + 7 * j) % (SELECT n FROM nn) AS dst
         FROM documents, unnest(range(1, doc_id % 3 + 2)) AS t(j)),
       und AS (
         SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         FROM e0 WHERE src <> dst),
       tri AS (
         SELECT e1.a AS u, e1.b AS v, e2.b AS w
         FROM und e1
         JOIN und e2 ON e2.a = e1.a AND e2.b > e1.b
         JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b),
       tpn AS (
         SELECT v, CAST(count(*) AS BIGINT) AS t
         FROM (SELECT u AS v FROM tri UNION ALL SELECT v FROM tri
               UNION ALL SELECT w AS v FROM tri)
         GROUP BY v),
       deg AS (
         SELECT v, CAST(count(*) AS BIGINT) AS d
         FROM (SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und)
         GROUP BY v)
       SELECT doc_id,
         CAST(coalesce(d, 0) AS BIGINT) AS degree,
         CAST(coalesce(t, 0) AS BIGINT) AS triangles,
         CASE WHEN coalesce(d, 0) >= 2
           THEN CAST(2 * coalesce(t, 0) AS DOUBLE) / CAST(d * (d - 1) AS DOUBLE)
           ELSE 0.0 END AS clustering
       FROM documents
       LEFT JOIN deg ON deg.v = doc_id
       LEFT JOIN tpn ON tpn.v = doc_id"""

  /** The q159 oracle replays the edge-anchor fixture (token (src%5)+1
    * of the source text — both engines return NULL past the array
    * end), the normalization chain, and the count/total/rank windows
    * over the same dst partitioning. */
  private val q159Sql =
    """WITH nn AS (SELECT count(*) AS n FROM documents),
       e AS (
         SELECT doc_id AS src, (doc_id * 31 + 7 * j) % (SELECT n FROM nn) AS dst
         FROM documents, unnest(range(1, doc_id % 3 + 2)) AS t(j)),
       a AS (
         SELECT e.dst,
           lower(trim(regexp_replace(
             string_split(d.text, ' ')[e.src % 5 + 1], '\s+', ' ', 'g'))) AS anchor
         FROM e JOIN documents d ON d.doc_id = e.src),
       g AS (
         SELECT dst, anchor, CAST(count(*) AS BIGINT) AS cnt
         FROM a WHERE anchor IS NOT NULL AND anchor <> ''
         GROUP BY dst, anchor),
       w AS (
         SELECT dst, anchor, cnt,
           CAST(sum(cnt) OVER (PARTITION BY dst) AS BIGINT) AS in_links,
           CAST(row_number() OVER (PARTITION BY dst
             ORDER BY cnt DESC, anchor ASC) AS BIGINT) AS rnk
         FROM g)
       SELECT dst AS doc_id, anchor, cnt, rnk, in_links,
         CAST(cnt AS DOUBLE) / in_links AS share
       FROM w WHERE rnk <= 3"""

  /** The q160 oracle replays the host/mirror fixture and the rollup —
    * exact COUNT(DISTINCT) on md5(text) (the 32-byte proxy both
    * engines print identically), single IEEE divisions for the
    * shares. */
  private val q160Sql =
    """WITH f AS (
         SELECT doc_id,
           CASE WHEN doc_id % 23 = 3 THEN 'best-casino-bonus.bet'
                WHEN doc_id % 23 = 17 THEN 'adult-videos-hub.com'
                WHEN doc_id % 23 = 9 THEN 'www.mirrorfarm.net'
                WHEN (doc_id % 23) % 2 = 0 THEN 'site' || (doc_id % 23) || '.com'
                ELSE 'blog' || (doc_id % 23) || '.example.net' END AS host,
           CASE WHEN doc_id % 23 = 9
                THEN 'this page is a mirror of the original content'
                ELSE text END AS text
         FROM documents),
       g AS (
         SELECT regexp_extract(host, '([^.]+\.[^.]+)$', 1) AS domain, host,
           md5(text) AS tk, CAST(length(text) AS BIGINT) AS len,
           regexp_matches(host, '(casino|adult|porn|xxx|gambl)') AS blocked
         FROM f),
       agg AS (
         SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
           CAST(count(DISTINCT tk) AS BIGINT) AS n_unique_texts,
           CAST(sum(len) AS BIGINT) AS total_chars,
           CAST(sum(CASE WHEN blocked THEN 1 ELSE 0 END) AS BIGINT) AS n_blocked
         FROM g GROUP BY domain)
       SELECT domain, n_docs, n_hosts, n_unique_texts, total_chars, n_blocked,
         CAST(n_docs - n_unique_texts AS DOUBLE) / n_docs AS dup_share,
         CAST(n_blocked AS DOUBLE) / n_docs AS blocked_share,
         (n_blocked = 0 AND
          CAST(n_docs - n_unique_texts AS DOUBLE) / n_docs <= 0.5) AS kept
       FROM agg"""

  /** The q161 oracle unrolls the 3 LPA sweeps CTE-for-CTE: per sweep
    * one neighbor-label count groupBy and one (cnt desc, label asc)
    * argmax window — exactly the Spark plan's shape, so labels agree
    * row-for-row. */
  private val q161Sql = {
    val base =
      """WITH nn AS (SELECT count(*) AS n FROM documents),
         e0 AS (
           SELECT doc_id AS src, (doc_id * 31 + 7 * j) % (SELECT n FROM nn) AS dst
           FROM documents, unnest(range(1, doc_id % 3 + 2)) AS t(j)),
         und AS MATERIALIZED (
           SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
           FROM e0 WHERE src <> dst),
         nbr AS MATERIALIZED (SELECT a AS u, b AS w FROM und
                 UNION ALL SELECT b AS u, a AS w FROM und),
         l0 AS MATERIALIZED (SELECT doc_id AS v, doc_id AS l FROM documents)"""
    val sweeps = (1 to 3).map { i =>
      s"""c$i AS (
           SELECT n.u AS v, l.l AS lbl, count(*) AS c
           FROM nbr n JOIN l${i - 1} l ON l.v = n.w GROUP BY n.u, l.l),
         p$i AS (
           SELECT v, lbl FROM (
             SELECT v, lbl, row_number() OVER (PARTITION BY v
               ORDER BY c DESC, lbl ASC) AS rn FROM c$i) WHERE rn = 1),
         l$i AS (
           SELECT a.v, coalesce(p$i.lbl, a.l) AS l
           FROM l${i - 1} a LEFT JOIN p$i ON p$i.v = a.v)"""
    }.mkString(",\n")
    s"$base,\n$sweeps\nSELECT v AS doc_id, CAST(l AS BIGINT) AS label FROM l3"
  }

  /** The q164 oracle replays the robots PARSE (comment strip, key/
    * value split, running-sum group ids over line position), the
    * agent-group selection, and the longest/allow-first admission
    * window. Fixture patterns are literal prefixes, so the Spark
    * side's regex translation reduces to starts_with here. */
  private val q164Sql =
    """WITH hosts AS (SELECT DISTINCT doc_id % 23 AS i FROM documents),
       r AS (
         SELECT 'site' || i || '.example' AS host,
           CASE WHEN i % 3 = 0 THEN 'User-agent: *' || chr(10) || 'Disallow: /private' || chr(10) || 'Allow: /private/ok' || chr(10) || '# graftbot gets its own group' || chr(10) || chr(10) || 'User-agent: graftbot' || chr(10) || 'Disallow: /tmp' || chr(10)
                WHEN i % 3 = 1 THEN 'User-agent: graftbot' || chr(10) || 'User-agent: otherbot' || chr(10) || 'Disallow: /secret' || chr(10) || 'Allow: /secret/x' || chr(10) || 'Disallow: /tmp' || chr(10)
                ELSE 'User-agent: *' || chr(10) || '# be nice' || chr(10) || 'Allow: /tmp/f' || chr(10) || 'Disallow: /tmp/f' || chr(10) || 'Disallow:' || chr(10) END AS content
         FROM hosts),
       ls AS (SELECT host, string_split_regex(content, '\r?\n') AS l FROM r),
       lines AS (
         SELECT host, i AS pos,
           trim(regexp_replace(l[i], '#.*$', '')) AS line
         FROM ls, unnest(range(1, len(l) + 1)) AS t(i)),
       parsed AS (
         SELECT host, pos,
           lower(trim(regexp_extract(line, '^([^:]+):(.*)$', 1))) AS key,
           trim(regexp_extract(line, '^([^:]+):(.*)$', 2)) AS value
         FROM lines WHERE line <> ''),
       filt AS (
         SELECT *, CASE WHEN key = 'user-agent' THEN 1 ELSE 0 END AS isua
         FROM parsed WHERE key IN ('user-agent', 'allow', 'disallow')),
       mk AS (
         SELECT *, CASE WHEN isua = 1 AND
             coalesce(lag(isua) OVER (PARTITION BY host ORDER BY pos), 0) = 0
           THEN 1 ELSE 0 END AS newg
         FROM filt),
       mk2 AS (SELECT *, sum(newg) OVER (PARTITION BY host ORDER BY pos) AS grp FROM mk),
       agents AS (SELECT DISTINCT host, grp, lower(value) AS agent FROM mk2 WHERE isua = 1),
       rules AS (SELECT host, grp, key AS rule, value AS path FROM mk2 WHERE isua = 0),
       joined AS (SELECT a.host, a.agent, ru.rule, ru.path
                  FROM agents a JOIN rules ru USING (host, grp)),
       hasagent AS (SELECT DISTINCT host, 1 AS ha FROM joined WHERE agent = 'graftbot'),
       chosen AS (
         SELECT j.host, j.rule, j.path AS pattern
         FROM joined j LEFT JOIN hasagent h USING (host)
         WHERE (CASE WHEN h.ha = 1 THEN j.agent = 'graftbot' ELSE j.agent = '*' END)
           AND j.path <> ''),
       urls AS (
         SELECT doc_id, 'site' || (doc_id % 23) || '.example' AS host,
           (CASE WHEN doc_id % 5 = 0 THEN '/private/doc'
                 WHEN doc_id % 5 = 1 THEN '/private/ok/doc'
                 WHEN doc_id % 5 = 2 THEN '/secret/x'
                 WHEN doc_id % 5 = 3 THEN '/tmp/f'
                 ELSE '/public/doc' END) || doc_id AS path
         FROM documents),
       m AS (
         SELECT u.doc_id, c.rule, c.pattern,
           row_number() OVER (PARTITION BY u.doc_id
             ORDER BY length(c.pattern) DESC, c.rule ASC, c.pattern ASC) AS rn
         FROM urls u JOIN chosen c
           ON c.host = u.host AND starts_with(u.path, c.pattern)),
       top AS (SELECT doc_id, rule, pattern FROM m WHERE rn = 1)
       SELECT u.doc_id, u.host, u.path,
         coalesce(t.rule = 'allow', TRUE) AS allowed,
         t.rule AS rule, t.pattern AS matched
       FROM urls u LEFT JOIN top t USING (doc_id)"""

  /** SQL replay of [[graft.crawl.Links.resolveUrl]]: the same CASE
    * chain, the same regex passes (two `/./` collapses — global
    * replacement is non-overlapping, so adjacent dot segments need a
    * second pass — then four bounded `../` passes), over the given
    * base/ref SQL expressions. */
  private def resolveSql(base: String, ref: String): String = {
    val noFrag = s"regexp_replace($base, '#.*$$', '')"
    val noQuery = s"regexp_replace($noFrag, '\\?.*$$', '')"
    val dir = s"""CASE WHEN regexp_matches(
         regexp_replace($noQuery, '^[a-zA-Z][a-zA-Z0-9+.-]*://', ''), '/')
       THEN regexp_replace($noQuery, '/[^/]*$$', '/')
       ELSE $noQuery || '/' END"""
    val origin = s"regexp_extract($base, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)', 1)"
    val joined = s"($dir || $ref)"
    // path-only collapse, mirroring the Scala side: the host never
    // enters the dot-segment regex
    val pathJoined = s"substr($joined, length($origin) + 1)"
    val dotPass =
      s"regexp_replace(regexp_replace($pathJoined, '/\\./', '/', 'g'), '/\\./', '/', 'g')"
    val collapsed0 = (1 to 4).foldLeft(dotPass) { (c, _) =>
      s"regexp_replace($c, '/[^/.][^/]*/\\.\\./|/\\.[^/.][^/]*/\\.\\./|/\\.\\.[^/]+/\\.\\./', '/', 'g')"
    }
    val collapsed = s"($origin || $collapsed0)"
    s"""CASE WHEN $base IS NULL OR $ref IS NULL THEN NULL
        WHEN $ref = '' THEN $noFrag
        WHEN regexp_matches($ref, '^[a-zA-Z][a-zA-Z0-9+.-]*:') THEN $ref
        WHEN starts_with($ref, '//') THEN
          regexp_extract($base, '^([a-zA-Z][a-zA-Z0-9+.-]*):', 1) || ':' || $ref
        WHEN starts_with($ref, '/') THEN
          regexp_extract($base, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)', 1) || $ref
        WHEN starts_with($ref, '#') THEN $noFrag || $ref
        WHEN starts_with($ref, '?') THEN $noQuery || $ref
        ELSE $collapsed END"""
  }

  /** q170: rebuild the page fixture, extract anchor tags, replay the
    * href/anchor regexes and the resolution chain per link. */
  private val q170Sql =
    s"""WITH p AS (
         SELECT doc_id,
           'https://site' || (doc_id % 23) || '.example/a/b/page' || doc_id || '.html' AS url,
           '<html><body><nav><a href="/">Home</a> <a href="/c' || (doc_id % 7) || '">Cat ' || (doc_id % 7) || '</a></nav>'
           || '<p>body <a href="rel/r' || doc_id || '">see  <b>also</b></a> and <a href="../up' || doc_id || '">up</a></p>'
           || '<a href="//cdn.example/lib.js">cdn</a>'
           || '<a href="https://ext.example/x' || doc_id || '">ext</a>'
           || '<a href="?page=2">next</a>'
           || '<a href="#top">top</a>'
           || '<a name="anchorless">no href</a>'
           || '</body></html>' AS html
         FROM documents),
       l AS (SELECT doc_id, url,
               regexp_extract_all(html, '(?is)<a\\b[^>]*>.*?</a>') AS ls
             FROM p),
       e AS (SELECT url, CAST(i - 1 AS BIGINT) AS pos, ls[i] AS t
             FROM l, unnest(range(1, len(ls) + 1)) AS u(i)),
       f AS (SELECT url AS src_url, pos,
               regexp_extract(t, '(?is)href\\s*=\\s*["'']([^"'']*)["'']', 1) AS href,
               trim(regexp_replace(regexp_replace(
                 regexp_extract(t, '(?is)>(.*)</a>', 1),
                 '<[^>]+>', ' ', 'g'), '\\s+', ' ', 'g')) AS anchor
             FROM e)
       SELECT src_url, pos, href, anchor,
         ${resolveSql("src_url", "href")} AS dst_url
       FROM f"""

  /** q171: the base/ref fixture + the resolution chain. */
  private val q171Sql =
    s"""WITH f AS (
         SELECT doc_id,
           'https://h' || (doc_id % 5) || '.example/a/b/c/page' || doc_id || '.html?x=1#sec' AS base,
           CASE doc_id % 8
             WHEN 0 THEN 'https://abs.example/p' || doc_id
             WHEN 1 THEN '//cdn.example/lib.js'
             WHEN 2 THEN '/root' || doc_id
             WHEN 3 THEN 'rel/r' || doc_id
             WHEN 4 THEN '../../up' || doc_id
             WHEN 5 THEN '#frag'
             WHEN 6 THEN '?page=2'
             ELSE '' END AS ref
         FROM documents)
       SELECT doc_id, base, ref, ${resolveSql("base", "ref")} AS resolved
       FROM f"""

  /** q173 oracle: replay the CDXJ line construction, the
    * first-two-spaces regex split and the JSON field extraction —
    * DuckDB's json_extract_string mirrors get_json_object, its
    * regexp_extract the same anchored grammar. */
  private val q173Sql =
    """WITH l AS (
         SELECT doc_id, n_chars,
           'com,site' || (doc_id % 23) || ')/doc' || doc_id ||
           ' 2024010100' || lpad(CAST(doc_id % 60 AS VARCHAR), 4, '0') ||
           ' {"url": "https://site' || (doc_id % 23) || '.com/doc' || doc_id ||
           '", "mime": "' ||
           CASE WHEN doc_id % 11 = 0 THEN 'text/plain' ELSE 'text/html' END ||
           '", "status": "' ||
           CASE WHEN doc_id % 13 = 0 THEN '404' ELSE '200' END ||
           '", "digest": "sha1:' ||
           upper(substr(md5(CAST(doc_id AS VARCHAR)), 1, 32)) ||
           '", "length": "' || (n_chars + 512) ||
           '", "offset": "' || (doc_id * 2048) ||
           '", "filename": "crawl-data/CC-MAIN/warc/crawl' || (doc_id % 20) ||
           '.warc.gz"}' AS line
         FROM documents),
       x AS (
         SELECT
           nullif(regexp_extract(trim(line), '^(\S+) (\S+) (.*)$', 1), '') AS surt,
           nullif(regexp_extract(trim(line), '^(\S+) (\S+) (.*)$', 2), '') AS ts,
           nullif(regexp_extract(trim(line), '^(\S+) (\S+) (.*)$', 3), '') AS j
         FROM l)
       SELECT surt, ts,
         json_extract_string(j, '$.url') AS url,
         CAST(json_extract_string(j, '$.status') AS INTEGER) AS status,
         json_extract_string(j, '$.mime') AS mime,
         json_extract_string(j, '$.digest') AS digest,
         json_extract_string(j, '$.filename') AS warc_path,
         CAST(json_extract_string(j, '$.offset') AS BIGINT) AS "offset",
         CAST(json_extract_string(j, '$.length') AS BIGINT) AS length,
         CAST(regexp_extract(json_extract_string(j, '$.url'), 'doc([0-9]+)$', 1) AS BIGINT) AS doc_id
       FROM x"""

  /** q175 oracle: same fixture edges, same host derivation, same
    * loop-dropping weighted rollup. */
  private val q175Sql =
    """WITH nn AS (SELECT count(*) AS n FROM documents),
       e AS (
         SELECT doc_id AS src,
           (doc_id * 31 + 7 * j) % (SELECT n FROM nn) AS dst
         FROM documents, unnest(range(1, doc_id % 3 + 2)) AS t(j)),
       h AS (SELECT 'site' || (src % 23) AS src, 'site' || (dst % 23) AS dst FROM e)
       SELECT src, dst, count(*) AS weight FROM h
       WHERE src <> dst GROUP BY src, dst"""

  /** q176 oracle: the two HITS rounds unrolled — each half-step is
    * one edge join + sum + the L1 renormalizing `* scale // total`,
    * exactly the Spark plan's integer arithmetic. */
  private val q176Sql =
    """WITH nn AS (SELECT count(*) AS n FROM documents),
       nodes AS (SELECT doc_id AS v FROM documents),
       e AS (
         SELECT doc_id AS src,
           (doc_id * 31 + 7 * j) % (SELECT n FROM nn) AS dst
         FROM documents, unnest(range(1, doc_id % 3 + 2)) AS t(j)),
       h0 AS (SELECT v, (SELECT greatest(1000000 // n, 1) FROM nn) AS h FROM nodes),
       a1u AS (SELECT e.dst AS v, CAST(sum(h0.h) AS BIGINT) AS au
               FROM e JOIN h0 ON h0.v = e.src GROUP BY e.dst),
       a1t AS (SELECT CAST(coalesce(sum(au), 0) AS BIGINT) AS tot FROM a1u),
       a1 AS (SELECT n.v,
                CASE WHEN (SELECT tot FROM a1t) > 0
                  THEN CAST((coalesce(a1u.au, 0) * 1000000) // (SELECT tot FROM a1t) AS BIGINT)
                  ELSE 0 END AS a
              FROM nodes n LEFT JOIN a1u ON a1u.v = n.v),
       h1u AS (SELECT e.src AS v, CAST(sum(a1.a) AS BIGINT) AS hu
               FROM e JOIN a1 ON a1.v = e.dst GROUP BY e.src),
       h1t AS (SELECT CAST(coalesce(sum(hu), 0) AS BIGINT) AS tot FROM h1u),
       h1 AS (SELECT n.v,
                CASE WHEN (SELECT tot FROM h1t) > 0
                  THEN CAST((coalesce(h1u.hu, 0) * 1000000) // (SELECT tot FROM h1t) AS BIGINT)
                  ELSE 0 END AS h
              FROM nodes n LEFT JOIN h1u ON h1u.v = n.v),
       a2u AS (SELECT e.dst AS v, CAST(sum(h1.h) AS BIGINT) AS au
               FROM e JOIN h1 ON h1.v = e.src GROUP BY e.dst),
       a2t AS (SELECT CAST(coalesce(sum(au), 0) AS BIGINT) AS tot FROM a2u),
       a2 AS (SELECT n.v,
                CASE WHEN (SELECT tot FROM a2t) > 0
                  THEN CAST((coalesce(a2u.au, 0) * 1000000) // (SELECT tot FROM a2t) AS BIGINT)
                  ELSE 0 END AS a
              FROM nodes n LEFT JOIN a2u ON a2u.v = n.v),
       h2u AS (SELECT e.src AS v, CAST(sum(a2.a) AS BIGINT) AS hu
               FROM e JOIN a2 ON a2.v = e.dst GROUP BY e.src),
       h2t AS (SELECT CAST(coalesce(sum(hu), 0) AS BIGINT) AS tot FROM h2u),
       h2 AS (SELECT n.v,
                CASE WHEN (SELECT tot FROM h2t) > 0
                  THEN CAST((coalesce(h2u.hu, 0) * 1000000) // (SELECT tot FROM h2t) AS BIGINT)
                  ELSE 0 END AS h
              FROM nodes n LEFT JOIN h2u ON h2u.v = n.v)
       SELECT h2.v AS doc_id, h2.h AS hub_micro, a2.a AS auth_micro
       FROM h2 JOIN a2 ON a2.v = h2.v"""

  /** One HITS round as oracle CTEs: auth half-step (sum hub over
    * `edge` src→dst, renormalize `* scale // total`) then hub
    * half-step — q176Sql's arithmetic parameterized on the edge CTE
    * and the previous hub CTE so the q192 warm unroll can switch edge
    * sets mid-chain. Emits CTEs a{tag}u/a{tag}t/a{tag}/h{tag}u/
    * h{tag}t/h{tag}. */
  private def hitsRoundSql(tag: String, edge: String, prevHub: String): String =
    s"""a${tag}u AS MATERIALIZED (SELECT $edge.dst AS v, CAST(sum(p.h) AS BIGINT) AS au
               FROM $edge JOIN $prevHub p ON p.v = $edge.src GROUP BY $edge.dst),
       a${tag}t AS MATERIALIZED (SELECT CAST(coalesce(sum(au), 0) AS BIGINT) AS tot FROM a${tag}u),
       a$tag AS MATERIALIZED (SELECT n.v,
                CASE WHEN (SELECT tot FROM a${tag}t) > 0
                  THEN CAST((coalesce(a${tag}u.au, 0) * 1000000) // (SELECT tot FROM a${tag}t) AS BIGINT)
                  ELSE 0 END AS a
              FROM nodes n LEFT JOIN a${tag}u ON a${tag}u.v = n.v),
       h${tag}u AS MATERIALIZED (SELECT $edge.src AS v, CAST(sum(a$tag.a) AS BIGINT) AS hu
               FROM $edge JOIN a$tag ON a$tag.v = $edge.dst GROUP BY $edge.src),
       h${tag}t AS MATERIALIZED (SELECT CAST(coalesce(sum(hu), 0) AS BIGINT) AS tot FROM h${tag}u),
       h$tag AS MATERIALIZED (SELECT n.v,
                CASE WHEN (SELECT tot FROM h${tag}t) > 0
                  THEN CAST((coalesce(h${tag}u.hu, 0) * 1000000) // (SELECT tot FROM h${tag}t) AS BIGINT)
                  ELSE 0 END AS h
              FROM nodes n LEFT JOIN h${tag}u ON h${tag}u.v = n.v)"""

  /** q192 oracle: q176's integer grid over BOTH phases — 2 cold HITS
    * rounds on the old graph (src % 10 ≠ 0) from the uniform floor,
    * then 2 warm rounds on the FULL graph seeded by the cold hubs
    * (auth restarts at 0 each round's first half-step, exactly the
    * Spark loop). All 8 half-steps unrolled. */
  private val q192Sql = {
    val base =
      """WITH nn AS (SELECT count(*) AS n FROM documents),
         nodes AS (SELECT doc_id AS v FROM documents),
         e AS MATERIALIZED (
           SELECT doc_id AS src,
             (doc_id * 31 + 7 * j) % (SELECT n FROM nn) AS dst
           FROM documents, unnest(range(1, doc_id % 3 + 2)) AS t(j)),
         eo AS MATERIALIZED (SELECT * FROM e WHERE src % 10 <> 0),
         hz AS MATERIALIZED (SELECT v, (SELECT greatest(1000000 // n, 1) FROM nn) AS h FROM nodes)"""
    val rounds = Seq(
      hitsRoundSql("c1", "eo", "hz"),
      hitsRoundSql("c2", "eo", "hc1"),
      hitsRoundSql("w1", "e", "hc2"),
      hitsRoundSql("w2", "e", "hw1")).mkString(",\n")
    s"""$base,
       $rounds
       SELECT hw2.v AS doc_id, hw2.h AS hub_micro, aw2.a AS auth_micro
       FROM hw2 JOIN aw2 ON aw2.v = hw2.v"""
  }

  /** One LPA sweep as oracle CTEs (q161Sql's shape parameterized on
    * the neighbor CTE): neighbor-label count groupBy + (cnt desc,
    * label asc) argmax window + keep-own-label fallback. */
  private def lpaSweepSql(i: Int, nbr: String): String =
    s"""c$i AS MATERIALIZED (
         SELECT n.u AS v, l.l AS lbl, count(*) AS c
         FROM $nbr n JOIN l${i - 1} l ON l.v = n.w GROUP BY n.u, l.l),
       p$i AS MATERIALIZED (
         SELECT v, lbl FROM (
           SELECT v, lbl, row_number() OVER (PARTITION BY v
             ORDER BY c DESC, lbl ASC) AS rn FROM c$i) WHERE rn = 1),
       l$i AS MATERIALIZED (
         SELECT a.v, coalesce(p$i.lbl, a.l) AS l
         FROM l${i - 1} a LEFT JOIN p$i ON p$i.v = a.v)"""

  /** q193 oracle: 3 cold LPA sweeps on the old undirected simple graph
    * from own-id labels, then 2 warm sweeps on the FULL graph from the
    * cold labels — all 5 sweeps unrolled CTE-for-CTE. */
  private val q193Sql = {
    val base =
      """WITH nn AS (SELECT count(*) AS n FROM documents),
         e0 AS (
           SELECT doc_id AS src, (doc_id * 31 + 7 * j) % (SELECT n FROM nn) AS dst
           FROM documents, unnest(range(1, doc_id % 3 + 2)) AS t(j)),
         undo AS MATERIALIZED (
           SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
           FROM e0 WHERE src <> dst AND src % 10 <> 0),
         nbro AS MATERIALIZED (SELECT a AS u, b AS w FROM undo
                  UNION ALL SELECT b AS u, a AS w FROM undo),
         und AS (
           SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
           FROM e0 WHERE src <> dst),
         nbr AS (SELECT a AS u, b AS w FROM und
                 UNION ALL SELECT b AS u, a AS w FROM und),
         l0 AS (SELECT doc_id AS v, doc_id AS l FROM documents)"""
    val sweeps = (
      (1 to 3).map(i => lpaSweepSql(i, "nbro")) ++
      (4 to 5).map(i => lpaSweepSql(i, "nbr"))).mkString(",\n")
    s"$base,\n$sweeps\nSELECT v AS doc_id, CAST(l AS BIGINT) AS label FROM l5"
  }

  /** q179 oracle: identical host/priority/last-fetch construction,
    * identical slot arithmetic (integral `//`), the same two windows
    * and the same budget cut. */
  private val q179Sql =
    """WITH f AS (
         SELECT doc_id, n_chars, doc_id % 23 AS idx,
           CASE WHEN (doc_id % 23) % 2 = 0
             THEN 'site' || (doc_id % 23) || '.com'
             ELSE 'blog' || (doc_id % 23) || '.example.net' END AS host
         FROM documents),
       fr AS (SELECT 'https://' || host || '/p/' || doc_id AS url,
                host, n_chars AS priority FROM f),
       lf AS (SELECT host, max(ts) AS last FROM (
                SELECT host,
                  CASE WHEN idx % 4 = 0 THEN 1009000
                       WHEN idx % 4 = 1 THEN 998000 END AS ts
                FROM f) WHERE ts IS NOT NULL GROUP BY host),
       j AS (SELECT fr.url, fr.host, fr.priority,
               greatest(1000000, coalesce(lf.last + 5000, 1000000)) AS open
             FROM fr LEFT JOIN lf USING (host)),
       sl AS (SELECT *,
                CASE WHEN open >= 1012000 THEN 0
                     ELSE least((1012000 - open) // 5000 + 1, 2) END AS slots,
                row_number() OVER (PARTITION BY host
                  ORDER BY priority DESC, url) AS host_seq
              FROM j),
       adm AS (SELECT url, host, priority,
                 CAST(host_seq AS BIGINT) AS host_seq,
                 CAST(open + (host_seq - 1) * 5000 AS BIGINT) AS fetch_ts
               FROM sl WHERE host_seq <= slots),
       cut AS (SELECT * FROM adm ORDER BY priority DESC, url LIMIT 150)
       SELECT url, host, priority, host_seq, fetch_ts,
         CAST(row_number() OVER (ORDER BY priority DESC, url) AS BIGINT) AS fetch_order
       FROM cut"""

  val oracles: Map[String, String] = Map(
    "q173_cdx_parse" -> q173Sql,
    "q175_host_graph" -> q175Sql,
    "q176_hits" -> q176Sql,
    "q192_hits_warm" -> q192Sql,
    "q193_lpa_warm" -> q193Sql,
    // q158's SQL verbatim: the merged store replays the full raw-edge
    // graph, so the store-fed counts must hash-equal the batch answer
    "q194_triangles_store" -> q158Sql,
    // q196: the store path must land where the raw-edge exact harmonic
    // lands — q152's SQL verbatim (the q194 verbatim-oracle pattern)
    "q196_harmonic_store" -> q152Sql,
    "q179_frontier_schedule" -> q179Sql,
    "q148_main_content" -> q148Sql,
    "q151_pagerank" -> q151Sql,
    "q187_pagerank_warm" -> q187Sql,
    "q152_harmonic" -> q152Sql,
    "q157_url_frontier_filter" -> q157Sql,
    "q158_triangles" -> q158Sql,
    "q159_anchor_text" -> q159Sql,
    "q160_domain_stats" -> q160Sql,
    "q161_lpa_communities" -> q161Sql,
    "q164_robots" -> q164Sql,
    // q169 must equal the ONE-SHOT rollup over the whole fixture —
    // the merge invariant IS the oracle, so it reuses q160's SQL.
    "q169_domain_stats_incremental" -> q160Sql,
    "q170_html_links" -> q170Sql,
    "q171_resolve_urls" -> q171Sql)
}
