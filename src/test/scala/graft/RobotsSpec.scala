package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.crawl.Robots

/** Pins the RFC 9309 robots engine (crawl/Robots.scala): the line
  * parse (comments, blank lines, case, CRLF, multi-agent groups), the
  * wildcard/anchor path grammar, group selection, and the
  * longest-match/allow-wins/no-match-allows admission rules — the
  * wildcard vectors follow RFC 9309 §2.2.3 and its examples. */
class RobotsSpec extends SparkSpec {

  private def rules(content: String): DataFrame = {
    import spark.implicits._
    Robots.parseRules(Seq(("h", content)).toDF("host", "content"), "host", "content")
  }

  private def decide(content: String, paths: Seq[String], agent: String = "bot")
      : Map[String, Boolean] = {
    import spark.implicits._
    val urls = paths.zipWithIndex.map { case (p, i) => (i.toLong, "h", p) }
      .toDF("id", "host", "path")
    Robots.decide(urls, "id", "host", "path", rules(content), agent)
      .collect().map(r => r.getString(2) -> r.getBoolean(3)).toMap
  }

  test("parseRules: comments, blank lines, CRLF, case, multi-agent groups") {
    val got = rules(
      "# a comment\r\nUSER-AGENT: Bot\nUser-agent: other\nDisallow: /a # trailing\n\nAllow: /a/b\nUser-agent: *\nDisallow: /c\nunknown: x\n")
      .collect().map(r => (r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(got == Set(
      ("bot", "disallow", "/a"), ("bot", "allow", "/a/b"),
      ("other", "disallow", "/a"), ("other", "allow", "/a/b"),
      ("*", "disallow", "/c")))
  }

  test("decide: longest match wins, ties go to allow, no match allows") {
    val c = "User-agent: *\nDisallow: /p\nAllow: /p/ok\nAllow: /x\nDisallow: /x\n"
    val got = decide(c, Seq("/p/doc", "/p/ok/doc", "/x/doc", "/free"))
    assert(got == Map("/p/doc" -> false, "/p/ok/doc" -> true,
      "/x/doc" -> true, "/free" -> true))
  }

  test("decide: exact agent group replaces the * group entirely") {
    val c = "User-agent: *\nDisallow: /\nUser-agent: bot\nDisallow: /only\n"
    val got = decide(c, Seq("/anything", "/only/x"))
    assert(got == Map("/anything" -> true, "/only/x" -> false))
    val fallback = decide(c, Seq("/anything"), agent = "stranger")
    assert(fallback == Map("/anything" -> false))
  }

  test("decide: * wildcard and $ anchor; regex metacharacters stay literal") {
    val c = "User-agent: *\nDisallow: /*.pdf$\nDisallow: /a.b\n"
    val got = decide(c, Seq("/x/report.pdf", "/x/report.pdf?view", "/a.b/c", "/aXb/c"))
    assert(got == Map("/x/report.pdf" -> false, "/x/report.pdf?view" -> true,
      "/a.b/c" -> false, "/aXb/c" -> true))
  }

  test("decide: empty Disallow matches nothing (allow-all idiom)") {
    val got = decide("User-agent: *\nDisallow:\n", Seq("/any"))
    assert(got == Map("/any" -> true))
  }
}
