package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.text.Boilerplate

/** Block-level boilerplate classifier (q148's machinery): each feature
  * of the content rule — length, link density, stopword density — has
  * a planted block that fails it alone, and the kept text preserves
  * page order. */
class BoilerplateSpec extends SparkSpec {

  private val article =
    "The quick study of the corpus shows that it is a matter of scale and that the " +
      "details of the pipeline are what make it work in practice."
  private val numberSpam = // long and link-free, but no function words at all
    (1 to 30).map(i => s"x$i").mkString(" ")
  private val linkFarm =
    """<a href="/1">Cheap flights to anywhere</a> <a href="/2">Best hotel deals today</a> <a href="/3">Car hire discount codes</a>"""

  private def page(body: String) = s"<html><head><title>T</title></head><body>$body</body></html>"

  private def main(html: String): String = {
    import spark.implicits._
    Seq(html).toDF("h").select(Boilerplate.mainText(col("h")).as("m"))
      .collect().head.getString(0)
  }

  test("content survives; nav, tag cloud, link farm, and number spam do not") {
    val html = page(
      s"""<nav><a href="/">Home</a> <a href="/x">X</a></nav>""" +
        s"<p>$article</p>" +
        s"<div>tag1 tag2</div>" + // short → fails minLen
        s"<div>$linkFarm</div>" + // link-dense → fails maxLinkDensity
        s"<p>$numberSpam</p>") // stopword-free → fails minStopRatio
    assert(main(html) == article)
  }

  test("multiple content blocks keep page order") {
    val second = "It is also the case that a second paragraph of the page survives in order."
    assert(main(page(s"<p>$article</p><div>$linkFarm</div><p>$second</p>")) ==
      s"$article $second")
  }

  test("a long block whose chars are mostly anchor text is boilerplate even with stopwords") {
    val linky = """Related: <a href="/a">the first of the long stories</a> <a href="/b">the second of the long stories</a> <a href="/c">the third of the long stories</a>"""
    assert(main(page(s"<div>$linky</div><p>$article</p>")) == article)
  }

  test("anchors in a content block count their text once — modest linking does not disqualify") {
    val modest = article.replace("the corpus", """the <a href="/c">corpus</a>""")
    assert(main(page(s"<p>$modest</p>")) == article)
  }

  test("blockStats: len / link_len / stop_ratio arithmetic and the len>0 filter") {
    import spark.implicits._
    val html = page("""<p>to be <a href="/x">linked up</a> now</p><div></div>""")
    val stats = Seq(html).toDF("h")
      .select(explode(Boilerplate.blockStats(col("h"))).as("s"))
      .select(col("s.text"), col("s.len"), col("s.link_len"), col("s.stop_ratio"), col("s.content"))
      .collect()
    // head block "T" (title text) + the paragraph; the empty div is filtered
    assert(stats.length == 2)
    val Row(text: String, len: Long, link: Long, stop: Double, content: Boolean) =
      stats.find(_.getString(0).startsWith("to be")).get
    assert(text == "to be linked up now")
    assert(len == text.length.toLong)
    assert(link == "linked up".length.toLong)
    assert(stop == 1.0 / 5.0) // "to" of 5 tokens
    assert(!content) // fails minLen
  }

  test("empty and tag-only pages yield empty main text") {
    assert(main("") == "")
    assert(main("<html><body><div></div><nav></nav></body></html>") == "")
  }

  test("q148 defaults match the documented rule on a boundary block") {
    // exactly minLen chars, zero links, stopword-rich → content
    val boundary = ("the is of and a " * 3).trim.padTo(40, 'x').mkString
    val kept = main(page(s"<p>$boundary</p>"))
    assert(kept == boundary)
  }
}
