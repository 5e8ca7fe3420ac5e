package graft

import org.apache.spark.sql.functions._

import graft.crawl.Links
import graft.multimodal.DocumentExtract

/** Pins the webgraph-construction surface: htmlLinks' extraction
  * grammar (multimodal/DocumentExtract.scala) and resolveUrl's RFC
  * 3986 §5 reference classes incl. the bounded dot-segment collapse
  * (crawl/Links.scala). */
class LinksSpec extends SparkSpec {

  private def links(html: String): Seq[(String, String)] = {
    import spark.implicits._
    Seq(html).toDF("h")
      .select(explode(DocumentExtract.htmlLinks(col("h"))).as("l"))
      .select(col("l.href"), col("l.anchor"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
  }

  test("htmlLinks: quote styles, nested markup stripped, anchorless and hrefless links") {
    assert(links(
      """<p><a href="/a">One</a><A HREF='/b'><b>Two</b>  words</A><a href="/c"></a><a name="x">no href</a></p>""") ==
      Seq(("/a", "One"), ("/b", "Two words"), ("/c", ""), ("", "no href")))
    assert(links("<p>no links at all</p>").isEmpty)
  }

  private def resolve(base: String, ref: String): String = {
    import spark.implicits._
    Seq((base, ref)).toDF("b", "r")
      .select(Links.resolveUrl(col("b"), col("r"))).head().getString(0)
  }

  test("resolveUrl: every RFC 3986 reference class") {
    val base = "https://h.example/a/b/page.html?x=1#sec"
    assert(resolve(base, "https://other.example/p") == "https://other.example/p")
    assert(resolve(base, "//cdn.example/l.js") == "https://cdn.example/l.js")
    assert(resolve(base, "/root") == "https://h.example/root")
    assert(resolve(base, "rel/r") == "https://h.example/a/b/rel/r")
    assert(resolve(base, "./same") == "https://h.example/a/b/same")
    assert(resolve(base, "../up") == "https://h.example/a/up")
    assert(resolve(base, "../../top") == "https://h.example/top")
    assert(resolve(base, "#frag") == "https://h.example/a/b/page.html?x=1#frag")
    assert(resolve(base, "?page=2") == "https://h.example/a/b/page.html?page=2")
    assert(resolve(base, "") == "https://h.example/a/b/page.html?x=1")
  }

  test("resolveUrl: pathless base, root-escape residue, null safety") {
    // base with no path: the directory is the origin root
    assert(resolve("https://h.example", "r") == "https://h.example/r")
    // ../ past the root keeps its residue rather than resolving above it
    assert(resolve("https://h.example/a/p.html", "../../x")
      .startsWith("https://h.example/"))
    import spark.implicits._
    val got = Seq((null.asInstanceOf[String], "r"), ("https://h/x", null.asInstanceOf[String]))
      .toDF("b", "r").select(Links.resolveUrl(col("b"), col("r"))).collect()
    assert(got.forall(_.isNullAt(0)))
  }

  test("extractEdges: one row per link, positions ordered, dst resolved against src") {
    import spark.implicits._
    val pages = Seq(("https://s.example/d/p.html",
      """<a href="x">first</a><a href="/y">second</a>""")).toDF("url", "html")
    val got = Links.extractEdges(pages, "url", "html")
      .collect().map(r => (r.getLong(1), r.getString(2), r.getString(4))).toSeq
    assert(got == Seq(
      (0L, "x", "https://s.example/d/x"),
      (1L, "/y", "https://s.example/y")))
  }
}
