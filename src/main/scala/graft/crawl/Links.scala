package graft.crawl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.multimodal.DocumentExtract

/** Webgraph construction from crawled pages — the step every
  * published webgraph (Common Crawl's cc-webgraph, the WebGraph
  * datasets) runs between HTML extraction and PageRank: pull the
  * `<a href>` edges out of each page ([[DocumentExtract.htmlLinks]])
  * and resolve every reference against its page URL so edges join on
  * canonical absolute targets. All pure column algebra.
  */
object Links {

  /** Resolve an href `ref` against an absolute page URL `base` —
    * the RFC 3986 §5 merge restricted to the reference classes a
    * crawler actually meets, each a deterministic string branch:
    * absolute URLs pass through; `//host/...` adopts the base
    * scheme; `/path` joins the base origin; `?query` and `#fragment`
    * replace the base's own; everything else joins the base
    * DIRECTORY, then `./` and up to four levels of `../` collapse
    * via a bounded regex chain (fixed-depth normalization — the
    * fixpoint loop of the RFC, unrolled so an external oracle can
    * replay it; deeper `../` towers are crawler-trap territory and
    * keep their residue rather than resolving past the root).
    * Empty refs return the base without its fragment (RFC 3986
    * §4.4). NULL-safe: a null base or ref yields null. */
  def resolveUrl(base: Column, ref: Column): Column = {
    val scheme = regexp_extract(base, "^([a-zA-Z][a-zA-Z0-9+.-]*):", 1)
    val origin = regexp_extract(base, "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    val noFrag = regexp_replace(base, "#.*$", "")
    val noQuery = regexp_replace(noFrag, "\\?.*$", "")
    // the base directory: origin + path up to (and incl.) the last /
    val dir = when(
      regexp_like(regexp_replace(noQuery, "^[a-zA-Z][a-zA-Z0-9+.-]*://", ""), lit("/")),
      regexp_replace(noQuery, "/[^/]*$", "/")).otherwise(concat(noQuery, lit("/")))
    val joined = concat(dir, ref)
    // collapse dot-segments in the PATH only — a regex over the whole
    // URL would happily treat the host as a path segment and let
    // /../ at the path root eat it ("https://h/../x" → "https://x").
    // The `/./` pass runs TWICE: global regex replacement is
    // non-overlapping, so one pass over "/a/././b" leaves "/a/./b"
    // (adjacent dot segments share a slash); a second pass collapses
    // the odd-position residue.
    val pathJoined = joined.substr(length(origin) + 1, length(joined))
    val collapsedPath = (1 to 4).foldLeft(
      regexp_replace(regexp_replace(pathJoined, "/\\./", "/"), "/\\./", "/")) { (c, _) =>
      regexp_replace(c, "/[^/.][^/]*/\\.\\./|/\\.[^/.][^/]*/\\.\\./|/\\.\\.[^/]+/\\.\\./", "/")
    }
    val collapsed = concat(origin, collapsedPath)
    when(base.isNull || ref.isNull, lit(null).cast("string"))
      .when(ref === "", noFrag)
      .when(regexp_like(ref, lit("^[a-zA-Z][a-zA-Z0-9+.-]*:")), ref)
      .when(ref.startsWith("//"), concat(scheme, lit(":"), ref))
      .when(ref.startsWith("/"), concat(origin, ref))
      .when(ref.startsWith("#"), concat(noFrag, ref))
      .when(ref.startsWith("?"), concat(noQuery, ref))
      .otherwise(collapsed)
  }

  /** Page frame (urlCol, htmlCol) → one edge row per hyperlink:
    * (src_url, pos, href, anchor, dst_url) with dst resolved against
    * src. A narrow explode — page bodies never shuffle; feed the
    * (src, dst) pairs to [[graft.graph.LinkGraph]] and the (dst,
    * anchor) pairs to [[graft.graph.LinkGraph.anchorText]]. */
  def extractEdges(pages: DataFrame, urlCol: String, htmlCol: String): DataFrame =
    pages
      .select(col(urlCol).as("src_url"),
        posexplode(DocumentExtract.htmlLinks(col(htmlCol))).as(Seq("pos", "_l")))
      .select(col("src_url"), col("pos").cast("long").as("pos"),
        col("_l.href").as("href"), col("_l.anchor").as("anchor"),
        resolveUrl(col("src_url"), col("_l.href")).as("dst_url"))
}
