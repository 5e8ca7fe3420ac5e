package graft

import org.apache.spark.sql.functions._

import graft.crawl.Domains

/** Pins the domain-reputation rollup (crawl/Domains.scala): registered-
  * domain extraction, exact counts/shares, the blocklist and duplicate
  * verdicts, and exact≡approx agreement in the sketch-exact regime. */
class DomainsSpec extends SparkSpec {

  test("registeredDomain takes the last two labels") {
    import spark.implicits._
    val got = Seq("www.mirrorfarm.net", "blog9.example.net", "site2.com", "localhost")
      .toDF("h").select(Domains.registeredDomain(col("h"))).collect().map(_.getString(0))
    assert(got.toSeq == Seq("mirrorfarm.net", "example.net", "site2.com", ""))
  }

  private def frame = {
    import spark.implicits._
    Seq(
      ("a.good.com", "text one"), ("b.good.com", "text two"),
      ("a.good.com", "text three"), ("www.farm.net", "same"),
      ("www.farm.net", "same"), ("www.farm.net", "same"),
      ("casino.bad.org", "text x"), ("ok.bad.org", "text y"))
      .toDF("host", "text")
  }

  test("domainStats: counts, duplicate pressure, blocklist share, verdicts") {
    val got = Domains.domainStats(frame, "host", "text",
      blockedExpr = col("host").rlike("casino"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getDouble(6), r.getDouble(7), r.getBoolean(8)))).toMap
    // good.com: 3 docs, 2 hosts, 3 unique texts, 0 blocked → kept
    assert(got("good.com")._1 == 3L && got("good.com")._2 == 2L)
    assert(got("good.com")._6 == 0.0 && got("good.com")._8)
    // farm.net: 3 docs, 1 unique text → dup_share 2/3 > 0.5 → dropped
    assert(got("farm.net")._3 == 1L && got("farm.net")._6 == 2.0 / 3.0)
    assert(!got("farm.net")._8)
    // bad.org: one of two hosts blocklisted → dropped
    assert(got("bad.org")._5 == 1L && !got("bad.org")._8)
  }

  test("incremental store: merge of two crawl days equals the one-shot rollup; dups collapse") {
    import spark.implicits._
    val dayA = frame.limit(4)
    val dayB = frame.exceptAll(dayA)
    val blocked = col("host").rlike("casino")
    val merged = Domains.mergeDomainStores(
      Domains.domainStore(dayA, "host", "text", blocked),
      Domains.domainStore(dayB, "host", "text", blocked))
    val viaStore = Domains.domainStatsFromStore(merged)
      .collect().map(_.toSeq).toSet
    val direct = Domains.domainStats(frame, "host", "text", blocked)
      .collect().map(_.toSeq).toSet
    assert(viaStore == direct)
    // the farm's three identical pages collapse to ONE store row
    assert(merged.filter(col("domain") === "farm.net").count() == 1)
    assert(merged.filter(col("domain") === "farm.net").head().getAs[Long]("n_docs") == 3L)
  }

  test("domainStats: approx path agrees exactly in the sketch-exact regime and plans no Expand") {
    val exact = Domains.domainStats(frame, "host", "text", blockedExpr = lit(false))
    val approx = Domains.domainStats(frame, "host", "text",
      blockedExpr = lit(false), approx = true)
    assert(approx.collect().map(_.toSeq).toSet == exact.collect().map(_.toSeq).toSet)
    assert(exact.queryExecution.executedPlan.toString.contains("Expand"))
    assert(!approx.queryExecution.executedPlan.toString.contains("Expand"))
  }
}
