package graft

import org.apache.spark.sql.functions._

import graft.sources.Warc

/** WARC reader grammar + DataFrame contract (q147's machinery). */
class WarcSpec extends SparkSpec {

  private val Crlf = "\r\n"

  private def record(
      tpe: String, fields: Seq[(String, String)], block: Array[Byte]): Array[Byte] = {
    val hdr = (Seq("WARC-Type" -> tpe) ++ fields ++
      Seq("Content-Length" -> block.length.toString))
      .map { case (k, v) => s"$k: $v" }.mkString(Crlf)
    s"WARC/1.1$Crlf$hdr$Crlf$Crlf".getBytes("UTF-8") ++ block ++ (Crlf + Crlf).getBytes("UTF-8")
  }

  private def http(status: String, ctype: String, body: Array[Byte]): Array[Byte] =
    (s"HTTP/1.1 $status${Crlf}Content-Type: $ctype${Crlf}Content-Length: ${body.length}$Crlf$Crlf")
      .getBytes("UTF-8") ++ body

  test("records: multi-record file parses fields, types, and exact block bytes") {
    val b1 = http("200 OK", "text/html; charset=utf-8", "<p>hello</p>".getBytes("UTF-8"))
    val bytes =
      record("warcinfo", Seq("WARC-Record-ID" -> "<urn:uuid:i>"), "software: x\r\n".getBytes("UTF-8")) ++
        record("response", Seq(
          "WARC-Record-ID" -> "<urn:uuid:r1>",
          "WARC-Target-URI" -> "https://e.com/1",
          "WARC-Date" -> "2024-01-01T00:00:00Z"), b1)
    val recs = Warc.records(bytes)
    assert(recs.length == 2 && recs.forall(_.isRight))
    val r = recs(1).toOption.get
    assert(r.version == "WARC/1.1")
    assert(r.warcType == "response")
    assert(r.targetUri.contains("https://e.com/1"))
    assert(r.recordId.contains("<urn:uuid:r1>"))
    assert(r.block.sameElements(b1))
  }

  test("records: block bytes are length-delimited — CRLFs and WARC/ inside a block do not split it") {
    val tricky = s"line1$Crlf${Crlf}WARC/1.1 looks like a header$Crlf$Crlf".getBytes("UTF-8")
    val recs = Warc.records(record("metadata", Seq(), tricky) ++
      record("metadata", Seq("K" -> "v"), "tail".getBytes("UTF-8")))
    assert(recs.length == 2 && recs.forall(_.isRight))
    assert(recs.head.toOption.get.block.sameElements(tricky))
    assert(recs(1).toOption.get.block.sameElements("tail".getBytes("UTF-8")))
  }

  test("records: header continuation lines fold (RFC 5322) and lookups are case-insensitive") {
    val raw = (s"WARC/1.0${Crlf}WARC-Type: response${Crlf}X-Long: part one$Crlf  part two$Crlf" +
      s"content-length: 2$Crlf$Crlf").getBytes("UTF-8") ++ "ab".getBytes("UTF-8")
    val recs = Warc.records(raw)
    assert(recs.length == 1)
    val r = recs.head.toOption.get
    assert(r.field("x-long").contains("part one part two"))
    assert(r.field("CONTENT-LENGTH").contains("2"))
    assert(new String(r.block, "UTF-8") == "ab")
  }

  test("records: gzip per-record members (the Common Crawl layout) parse identically to plain") {
    val plain = record("response", Seq("A" -> "1"), http("200 OK", "text/plain", "x".getBytes)) ++
      record("response", Seq("A" -> "2"), http("200 OK", "text/plain", "y".getBytes))
    val members = Seq(
      record("response", Seq("A" -> "1"), http("200 OK", "text/plain", "x".getBytes)),
      record("response", Seq("A" -> "2"), http("200 OK", "text/plain", "y".getBytes)))
      .map(Warc.gzipMember).foldLeft(Array.emptyByteArray)(_ ++ _)
    val a = Warc.records(plain).map(_.toOption.get.fields)
    val b = Warc.records(members).map(_.toOption.get.fields)
    assert(a == b)
  }

  test("records: malformed input error-tags and halts — truncated block, missing length, bad version") {
    val truncated = s"WARC/1.1${Crlf}WARC-Type: metadata${Crlf}Content-Length: 100$Crlf$Crlf".getBytes("UTF-8") ++
      "short".getBytes("UTF-8")
    assert(Warc.records(truncated) == Seq(Left("truncated block (need 100 bytes)")))
    val noLen = s"WARC/1.1${Crlf}WARC-Type: metadata$Crlf${Crlf}x".getBytes("UTF-8")
    assert(Warc.records(noLen) == Seq(Left("missing Content-Length")))
    val good = record("metadata", Seq(), "ok".getBytes("UTF-8"))
    val badTail = Warc.records(good ++ "NOT-WARC".getBytes("UTF-8"))
    assert(badTail.length == 2 && badTail.head.isRight && badTail(1).isLeft)
  }

  test("parseHttp: status, headers, body; bad status line rejects") {
    val resp = Warc.parseHttp(http("301 Moved Permanently", "text/html", "moved".getBytes("UTF-8")))
    assert(resp.isRight)
    val r = resp.toOption.get
    assert(r.status == 301)
    assert(r.contentType.contains("text/html"))
    assert(new String(r.body, "UTF-8") == "moved")
    assert(Warc.parseHttp("garbage with no terminator".getBytes("UTF-8")).isLeft)
    assert(Warc.parseHttp(s"NOT-HTTP 200$Crlf$Crlf".getBytes("UTF-8")).isLeft)
  }

  test("charsetOf: parameter extraction, quotes, absence, case") {
    assert(Warc.charsetOf(Some("text/html; charset=ISO-8859-1")) == "iso-8859-1")
    assert(Warc.charsetOf(Some("text/html; CHARSET=\"Windows-1252\"")) == "windows-1252")
    assert(Warc.charsetOf(Some("text/html")) == "utf-8")
    assert(Warc.charsetOf(None) == "utf-8")
  }

  test("responses: end-to-end frame — responses kept, bookkeeping skipped, errors tagged, charset honored") {
    import spark.implicits._
    val latin = "café".getBytes("ISO-8859-1")
    val fileA = record("warcinfo", Seq(), "software: t\r\n".getBytes("UTF-8")) ++
      record("response", Seq("WARC-Target-URI" -> "https://e.com/a"),
        http("200 OK", "text/html; charset=iso-8859-1", latin)) ++
      record("request", Seq(), s"GET / HTTP/1.1$Crlf$Crlf".getBytes("UTF-8")) ++
      record("response", Seq("WARC-Target-URI" -> "https://e.com/b"),
        http("404 Not Found", "text/html", "gone".getBytes("UTF-8")))
    val fileB = "JUNK".getBytes("UTF-8")
    val df = Warc.responses(
      Seq(("a.warc", fileA), ("b.warc", fileB)).toDF("path", "content"))
    val rows = df.collect().map(r => (r.getString(0), Option(r.getAs[String]("target_uri")),
      Option(r.getAs[String]("body")), Option(r.getAs[String]("error")))).toSeq
    assert(rows.length == 3)
    val byUri = df.filter(col("error").isNull).collect()
      .map(r => r.getAs[String]("target_uri") -> r).toMap
    assert(byUri("https://e.com/a").getAs[String]("body") == "café")
    assert(byUri("https://e.com/a").getAs[Int]("status") == 200)
    assert(byUri("https://e.com/b").getAs[Int]("status") == 404)
    assert(df.filter(col("error").isNotNull).count() == 1)
    assert(df.filter(col("path") === "b.warc" && col("error").isNotNull).count() == 1)
  }

  test("q147 fixture: buildWarcFile round-trips through the parser with planted 404/plain/garbage") {
    val docs = (0L to 19L).map(i => (i, s"doc body $i with the a of and text"))
    val plain = graft.queries.WebQueries.buildWarcFile(0L, docs) // fid 0: plain + garbage tail
    val gz = graft.queries.WebQueries.buildWarcFile(5L, docs) // fid 5: gzip + garbage tail
    Seq(plain, gz).foreach { bytes =>
      val recs = Warc.records(bytes)
      // warcinfo + 20 responses + request parse; the garbage tail halts as one Left
      assert(recs.count(_.isRight) == 22)
      assert(recs.count(_.isLeft) == 1)
      val types = recs.collect { case Right(r) => r.warcType }
      assert(types.count(_ == "response") == 20)
    }
  }
}
