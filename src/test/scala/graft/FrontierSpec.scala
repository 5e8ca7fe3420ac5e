package graft

import org.apache.spark.sql.functions._

import graft.crawl.Frontier

class FrontierSpec extends SparkSpec {

  import spark.implicits._

  // round [1000, 2000), delay 200 → a never-fetched host opens at
  // 1000 and owns slots at 1000/1200/1400/1600/1800 (5, before caps)
  private val Start = 1000L
  private val End = 2000L
  private val Delay = 200L

  private def run(
      frontier: Seq[(String, String, Long)],
      last: Seq[(String, Long)],
      maxPerHost: Int = 3, budget: Int = 100) =
    Frontier.schedule(
      frontier.toDF("url", "host", "priority"), "url", "host", "priority",
      last.toDF("host", "ts"), "host", "ts",
      Start, End, Delay, maxPerHost, budget)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))

  test("politeness beats rank: a throttled host's top-priority URLs lose to open hosts") {
    // h1 carries the HIGHEST priorities but its last fetch at 1900 +
    // delay = 2100 ≥ roundEnd → zero slots; h2's lower-priority URLs
    // are what actually get fetched. The planted rank/politeness
    // conflict: a scheduler that sorted by priority alone fails here.
    val frontier = Seq(
      ("https://h1/a", "h1", 1000L), ("https://h1/b", "h1", 999L),
      ("https://h2/a", "h2", 10L), ("https://h2/b", "h2", 9L))
    val got = run(frontier, Seq("h1" -> 1900L))
    assert(got.map(_._1).toSet == Set("https://h2/a", "https://h2/b"))
    // fetch instants ride the politeness grid from the round start
    val byUrl = got.map(g => g._1 -> g._5).toMap
    assert(byUrl("https://h2/a") == 1000L && byUrl("https://h2/b") == 1200L)
  }

  test("slot token arithmetic: a recent fetch delays the opening and shrinks the slot count") {
    // h3 last fetched at 1500 → opens at 1700 → slots at 1700/1900 = 2
    // of its 3 candidates; within the host, priority picks which two
    val frontier = Seq(
      ("https://h3/low", "h3", 1L), ("https://h3/mid", "h3", 5L),
      ("https://h3/top", "h3", 9L))
    val got = run(frontier, Seq("h3" -> 1500L))
    assert(got.map(_._1).toSet == Set("https://h3/top", "https://h3/mid"))
    val seq = got.sortBy(_._4).map(g => (g._1, g._4, g._5))
    assert(seq.toSeq == Seq(("https://h3/top", 1L, 1700L), ("https://h3/mid", 2L, 1900L)))
  }

  test("maxPerHost caps an open host; the global budget cuts across hosts by (priority, url)") {
    val frontier = (1 to 6).map(i => (s"https://open/$i", "open", (10 - i).toLong)) ++
      Seq(("https://other/x", "other", 100L))
    val got = run(frontier, Seq.empty, maxPerHost = 2, budget = 2)
    // open host admits its top 2 (of 5 politeness slots); budget keeps
    // the global top 2: other/x (100) then open/1 (9)
    assert(got.sortBy(_._6).map(_._1).toSeq ==
      Seq("https://other/x", "https://open/1"))
    assert(got.map(_._6).sorted.toSeq == Seq(1L, 2L))
  }

  test("duplicate last-fetch rows collapse to the max; never-fetched hosts open at round start") {
    val frontier = Seq(("https://h/u", "h", 1L), ("https://g/u", "g", 1L))
    // two stale rows for h — the defensive max must pick 1900 (0 slots)
    val got = run(frontier, Seq("h" -> 100L, "h" -> 1900L))
    assert(got.map(_._1).toSeq == Seq("https://g/u"))
    assert(got.head._5 == Start)
  }

  test("degenerate rounds and parameters reject loudly") {
    val f = Seq(("u", "h", 1L)).toDF("url", "host", "priority")
    val l = Seq.empty[(String, Long)].toDF("host", "ts")
    intercept[IllegalArgumentException](
      Frontier.schedule(f, "url", "host", "priority", l, "host", "ts",
        10L, 10L, 1L, 1, 1))
    intercept[IllegalArgumentException](
      Frontier.schedule(f, "url", "host", "priority", l, "host", "ts",
        0L, 10L, 1L, 0, 1))
  }
}
