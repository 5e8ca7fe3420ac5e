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

  test("recordAt: every indexed offset yields exactly its record; range errors are Lefts, not exceptions") {
    val docs = (0L to 19L).map(i => (i, s"doc body $i with the a of and text"))
    Seq(0L, 5L).foreach { fid => // plain and gzip layouts, both with garbage
      val (bytes, entries) = graft.queries.WebQueries.buildWarcFileIndexed(fid, docs)
      entries.foreach { case (off, len, url, status) =>
        Warc.recordAt(bytes, off, len) match {
          case Right(rec) =>
            assert(rec.warcType == "response" && rec.targetUri.contains(url))
            val http = Warc.parseHttp(rec.block)
            assert(http.exists(_.status.toString == status))
          case Left(e) =>
            // the planted garbage member: indexed, undeliverable
            assert(url.contains("badrecord"), s"unexpected Left($e) for $url")
        }
      }
      assert(Warc.recordAt(bytes, -1, 10).isLeft)
      assert(Warc.recordAt(bytes, 0, bytes.length + 1L).isLeft)
      assert(Warc.recordAt(bytes, bytes.length - 2L, 2).isLeft)
    }
  }

  test("responsesIndexed: CDX-offset reads over real files — per-record rows, corrupt record isolated, neighbors parse") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_warcspec").toString
    val docs = (0L to 19L).map(i => (i, s"doc body $i with the a of and text"))
    // two files: plain with garbage (fid 0), gzip members with garbage (fid 5)
    val index = Seq(0L, 5L).flatMap { fid =>
      val (bytes, entries) = graft.queries.WebQueries.buildWarcFileIndexed(fid, docs)
      val path = s"$dir/crawl$fid.warc" + (if (fid % 2 == 1) ".gz" else "")
      java.nio.file.Files.write(java.nio.file.Paths.get(path), bytes)
      entries.map { case (off, len, url, _) => (path, off, len, url) }
    }
    val idx = index.toDF("warc_path", "offset", "length", "url")
      // shuffle the index away from file order: offsets, not layout,
      // must locate records
      .orderBy(col("offset").desc)
    val got = Warc.responsesIndexed(idx)
    val rows = got.collect()
    assert(rows.length == index.length, "one row per index entry")
    // the two planted garbage members are the ONLY errors — corrupt
    // records cost their own row, never their file (q147's whole-file
    // walk halts at them; that asymmetry is the point of the index)
    val errs = got.filter(col("error").isNotNull).collect()
    assert(errs.length == 2, s"expected 2 isolated errors, got ${errs.toSeq}")
    val ok = got.filter(col("error").isNull)
    assert(ok.count() == 40)
    assert(ok.filter(col("status") === 404).count() == 4) // ids 0 and 13, both files
    // body fidelity through the positioned read
    val b7 = ok.filter(col("target_uri") === "https://example.com/doc7")
      .select("body").collect().map(_.getString(0))
    assert(b7.length == 2 && b7.forall(_.contains("doc body 7")))
    // a range beyond EOF (index/file disagreement) is an error row too
    val bad = Warc.responsesIndexed(
      Seq((s"$dir/crawl0.warc", 1L << 40, 100L)).toDF("warc_path", "offset", "length"))
      .collect()
    assert(bad.length == 1 && bad.head.getAs[String]("error").contains("outside file"))
    // a length over Int.MaxValue against a big-enough (sparse) file is
    // an error ROW too — the index is untrusted, so it must not become
    // a NegativeArraySizeException that fails the whole task
    val sparse = s"$dir/sparse.warc"
    val raf = new java.io.RandomAccessFile(sparse, "rw")
    try raf.setLength((1L << 31) + 4096L) finally raf.close()
    val huge = Warc.responsesIndexed(
      Seq((sparse, 0L, (1L << 31) + 10L)).toDF("warc_path", "offset", "length"))
      .collect()
    assert(huge.length == 1 && huge.head.getAs[String]("error") != null)
  }

  test("Cdx.parse: CDXJ grammar — SURT/ts split, JSON fields, casts; malformed lines null out behind the schema") {
    import spark.implicits._
    val good =
      """com,example)/doc7 20240101000000 {"url": "https://example.com/doc7", "mime": "text/html", "status": "200", "digest": "sha1:AB", "length": "1234", "offset": "5678", "filename": "/data/crawl0.warc.gz"}"""
    val noJson = "com,example)/x 20240101000000"
    val rows = graft.crawl.Cdx.parse(
      Seq(good, noJson, "").toDF("line"), "line").collect()
    val g = rows.find(r => r.getAs[String]("surt") == "com,example)/doc7").get
    assert(g.getAs[String]("ts") == "20240101000000")
    assert(g.getAs[String]("url") == "https://example.com/doc7")
    assert(g.getAs[Int]("status") == 200)
    assert(g.getAs[String]("mime") == "text/html")
    assert(g.getAs[String]("warc_path") == "/data/crawl0.warc.gz")
    assert(g.getAs[Long]("offset") == 5678L && g.getAs[Long]("length") == 1234L)
    assert(rows.count(r => r.getAs[String]("url") == null) == 2)
  }

  test("Cdx.parse -> responsesIndexed composes: the fleet read end-to-end from its own index") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_warccdx").toString
    val docs = (0L to 19L).map(i => (i, s"doc body $i"))
    val (bytes, entries) = graft.queries.WebQueries.buildWarcFileIndexed(1L, docs)
    val path = s"$dir/crawl1.warc.gz"
    java.nio.file.Files.write(java.nio.file.Paths.get(path), bytes)
    val lines = entries.map { case (off, len, url, status) =>
      s"""com,example)/${url.split("/").last} 20240101000000 {"url": "$url", "mime": "text/html", "status": "$status", "digest": "sha1:$off", "length": "$len", "offset": "$off", "filename": "$path"}"""
    }
    val got = Warc.responsesIndexed(graft.crawl.Cdx.parse(lines.toDF("line"), "line"))
    assert(got.count() == 20)
    assert(got.filter(col("error").isNotNull).count() == 0) // fid 1: no garbage planted
    assert(got.filter(col("status") === 200).count() == 18)
  }
}
