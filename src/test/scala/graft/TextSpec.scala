package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.text.TextAnalysis

/** Text analysis + multimodal plumbing semantics. */
class TextSpec extends SparkSpec {

  test("languageId picks the strongest stopword profile, unknown on no evidence") {
    import spark.implicits._
    val df = Seq(
      ("the cat and the dog is in a house", "en"),
      ("der hund und die katze ist von mir", "de"),
      ("le chat et la maison est dans les arbres", "fr"),
      ("el perro y los gatos es de una casa", "es"),
      ("xyzzy plugh 12345", "unknown")
    ).toDF("text", "expected")
    df.select(TextAnalysis.languageId(col("text")).as("p"), col("expected"))
      .collect().foreach(r => assert(r.getString(0) == r.getString(1), r.toString))
  }

  test("bpeishTokenCount: contractions split, runs group, whitespace-type boundaries") {
    import spark.implicits._
    import graft.text.TextAnalysis
    val cases = Seq(
      "don't stop",  // don + 't + " stop" = 3
      "hello world", // two space-prefixed letter runs = 2
      "abc123",      // letter run + digit run = 2
      "a,b",         // a + , + b = 3
      "")            // 0
    val got = cases.toDF("t")
      .select(TextAnalysis.bpeishTokenCount(org.apache.spark.sql.functions.col("t")))
      .collect().map(_.getLong(0)).toSeq
    // verify against the JVM regex directly — the column must agree
    val p = java.util.regex.Pattern.compile(TextAnalysis.BpeishPattern)
    val expected = cases.map { s =>
      val m = p.matcher(s); var n = 0L; while (m.find()) n += 1; n
    }
    assert(got == expected)
    assert(expected(1) == 2L && expected(2) == 2L && expected(3) == 3L && expected(4) == 0L)
    // "don't" splits the contraction: don + 't (+ " stop")
    assert(expected(0) == 3L)
  }

  test("repetitionMetrics: constructed spam is flagged, clean prose passes") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.text.TextAnalysis
    val spamLines = (Seq.fill(8)("buy cheap stuff now") :+ "one unique line").mkString("\n")
    val spamBigram = Seq.fill(30)("win big").mkString(" ") + " other words entirely"
    val clean = "The quick brown fox jumps over a lazy dog.\nA second, different sentence.\n\nNew paragraph with fresh words."
    val rows = Seq(spamLines, spamBigram, clean, "", "single").toDF("t")
      .select(TextAnalysis.repetitionMetrics(col("t")).as("m"),
        TextAnalysis.passesRepetitionFilter(col("t")).as("p"))
      .select("m.*", "p").collect()
    // 9 lines, 2 distinct → dup_line_frac = 7/9
    assert(math.abs(rows(0).getAs[Double]("dup_line_frac") - 7.0 / 9) < 1e-9)
    assert(!rows(0).getAs[Boolean]("p"))
    // "win big"/"big win" dominate the bigram stream
    assert(rows(1).getAs[Double]("top_bigram_frac") > 0.4 && !rows(1).getAs[Boolean]("p"))
    assert(rows(2).getAs[Double]("dup_line_frac") == 0.0 && rows(2).getAs[Boolean]("p"))
    assert(rows(3).getAs[Double]("top_bigram_frac") == 0.0 && rows(3).getAs[Boolean]("p")) // empty
    assert(rows(4).getAs[Double]("top_bigram_frac") == 0.0) // single token: no bigrams
  }

  test("keyValues parses colon/equals lines, snake_cases keys, first duplicate wins") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.text.TextAnalysis
    val doc =
      """Invoice Number: INV-2024-001
        |Customer Name = Acme Corp
        |  Total Amount:  1,234.56
        |free prose line without a separator
        |Invoice Number: DUPLICATE-SHOULD-LOSE
        |: no key
        |Empty Value:
        |""".stripMargin
    val kv = Seq(doc).toDF("t")
      .select(TextAnalysis.keyValues(col("t")).as("kv"))
      .collect().head.getMap[String, String](0)
    assert(kv("invoice_number") == "INV-2024-001") // first wins
    assert(kv("customer_name") == "Acme Corp")
    assert(kv("total_amount") == "1,234.56")
    assert(kv.size == 3) // prose, keyless and valueless lines dropped
    val typed = Seq(doc).toDF("t")
      .select(TextAnalysis.extractKeys(col("t"),
        Seq("Invoice Number", "Customer Name", "Missing Key")).as("e"))
      .select("e.*").collect().head
    assert(typed.getAs[String]("invoice_number") == "INV-2024-001")
    assert(typed.getAs[String]("missing_key") == null)
  }

  test("fingerprint is order-sensitive; normalizedFingerprint is layout-invariant") {
    import spark.implicits._
    val df = Seq(
      ("alpha beta gamma", "permuted"),
      ("gamma beta alpha", "permuted"),
      ("alpha   BETA, gamma!", "normalized-same")
    ).toDF("text", "kind")
    val rows = df.select(col("kind"), TextAnalysis.fingerprint(col("text")).as("fp"),
      TextAnalysis.normalizedFingerprint(col("text")).as("nfp")).collect()
    val byKind = rows.groupBy(_.getString(0))
    val Array(p1, p2) = byKind("permuted").map(_.getLong(1))
    assert(p1 != p2, "token order must change the rolling hash")
    // punctuation/case/extra-space variant normalizes to the same tokens
    val n1 = byKind("permuted").find(_ => true).get
    val norm = byKind("normalized-same").head
    assert(norm.getString(2) == rows.find(r => r.getString(0) == "permuted" &&
      r.getLong(1) == p1).get.getString(2) ||
      norm.getString(2) == rows.find(r => r.getString(0) == "permuted" &&
        r.getLong(1) == p2).get.getString(2))
  }

  test("normalizeUrl collapses crawl spellings; identity-changing parts survive") {
    import spark.implicits._
    import graft.text.TextAnalysis
    val cases = Seq(
      // the five q124 spellings → one canonical form
      "https://www.EXAMPLE7.com/item/3?b=2&a=1#frag" -> "https://example7.com/item/3?a=1&b=2",
      "https://example7.com/item/3?a=1&b=2" -> "https://example7.com/item/3?a=1&b=2",
      "https://Example7.COM/item/3/?utm_source=x&a=1&b=2" -> "https://example7.com/item/3?a=1&b=2",
      "https://example7.com:443/item/3?a=1&b=2&gclid=zz" -> "https://example7.com/item/3?a=1&b=2",
      "https://example7.com/item/3?b=2&utm_medium=m&a=1" -> "https://example7.com/item/3?a=1&b=2",
      // conservative: scheme and path case are identity, not spelling
      "http://example.com/A/B" -> "http://example.com/A/B",
      "https://example.com/A/B" -> "https://example.com/A/B",
      // all params tracking → query drops entirely
      "https://a.com/x?utm_source=s&utm_campaign=c" -> "https://a.com/x",
      // bare host, no path/query
      "https://WWW.A.COM:443#top" -> "https://a.com",
      // non-default port survives
      "https://a.com:8080/x" -> "https://a.com:8080/x",
      // default-port strip is scheme-aware: :443 is NOT http's default
      // (different origin), :80 is not https's
      "http://a.com:443/x" -> "http://a.com:443/x",
      "https://a.com:80/x" -> "https://a.com:80/x",
      "http://a.com:80/x" -> "http://a.com/x")
      .toDF("url", "expected")
    val bad = cases
      .select(TextAnalysis.normalizeUrl(col("url")).as("got"), col("expected"))
      .filter(col("got") =!= col("expected")).collect()
    assert(bad.isEmpty, bad.map(r => s"${r.getString(0)} != ${r.getString(1)}").mkString("; "))
  }

  test("chunk reassembles to the original payload; sampling keeps every Nth") {
    import spark.implicits._
    val df = Seq((1L, "a" * 100 + "b" * 57)).toDF("doc_id", "text") // 157 bytes -> 3 chunks of 64
    val chunked = Multimodal.chunk(Multimodal.withBinaryPayload(df, "text"), 64)
    val chunks = chunked.orderBy("chunk_idx").select("chunk").collect()
      .map(_.getAs[Array[Byte]](0))
    assert(chunks.length == 3)
    assert(chunks.map(_.length).toSeq == Seq(64, 64, 29))
    assert(new String(chunks.flatten, "UTF-8") == "a" * 100 + "b" * 57)
    assert(Multimodal.sampleChunks(chunked, 2).count() == 2) // idx 0 and 2
  }

  test("chunk yields zero rows for an empty payload instead of crashing") {
    import spark.implicits._
    val df = Seq((1L, "")).toDF("doc_id", "text")
    assert(Multimodal.chunk(Multimodal.withBinaryPayload(df, "text"), 64).count() == 0)
  }

  test("decodeImageStub is deterministic with plausible dimensions") {
    import spark.implicits._
    val df = Seq((1L, "some media bytes")).toDF("doc_id", "text")
    val out = Multimodal.withBinaryPayload(df, "text")
      .select(Multimodal.decodeImageStub(col("payload")).as("d"))
      .select(col("d.width"), col("d.height"), col("d.format")).collect().head
    assert(out.getLong(0) >= 1 && out.getLong(0) <= 1920)
    assert(out.getLong(1) >= 1 && out.getLong(1) <= 1080)
    assert(out.getString(2) == "stub")
  }

  test("qlog column agrees with the driver-side qlogConst across the grid") {
    import spark.implicits._
    val ns = Seq(1L, 2L, 3L, 7L, 64L, 1000L, 123456L, 9999991L, 19999999L)
    val got = ns.toDF("n").select(TextAnalysis.qlog(col("n")).as("q"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == ns.map(TextAnalysis.qlogConst))
    assert(TextAnalysis.qlogConst(1L) == 0L)
  }

  test("lmScore: hand-computed micro-nat NLL, OOV counting, ppl consistency") {
    import spark.implicits._
    val model = TextAnalysis.unigramLm(Seq((1L, "a a b")).toDF("doc_id", "text"), "text")
    // counts: a=2, b=1 → total=3, V=2, D=6
    assert(TextAnalysis.lmDenominator(model) == 6L)
    val qD = TextAnalysis.qlogConst(6L)
    val out = TextAnalysis.lmScore(
      Seq((10L, "a b c")).toDF("doc_id", "text"), "doc_id", "text", model)
      .collect().head
    assert(out.getAs[Long]("n_tokens") == 3L)
    assert(out.getAs[Long]("n_oov") == 1L) // c unseen
    val expectedSum = 3 * qD - TextAnalysis.qlogConst(3L) - TextAnalysis.qlogConst(2L)
    assert(out.getAs[Long]("sum_nll_micro") == expectedSum)
    val avg = out.getAs[Double]("avg_nll_micro")
    assert(avg == expectedSum * 1.0 / 3)
    assert(math.abs(out.getAs[Double]("ppl") - math.exp(avg / 1e6)) < 1e-9)
  }

  test("lmScoreBigram: hand-computed interpolated NLL, first-token and unseen-context backoff") {
    import spark.implicits._
    val train = Seq((1L, "a b a c")).toDF("doc_id", "text")
    // unigrams: a=2,b=1,c=1 → total=4, V=3, D=8
    // bigrams: (a,b)=1,(b,a)=1,(a,c)=1 → ctx: a=2, b=1
    val uni = TextAnalysis.unigramLm(train, "text")
    val bg = TextAnalysis.bigramLm(train, "text")
    assert(bg.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet ==
      Set(("a", "b", 1L), ("b", "a", 1L), ("a", "c", 1L)))
    val out = TextAnalysis.lmScoreBigram(
      Seq((10L, "a b c d")).toDF("doc_id", "text"), "doc_id", "text", bg, uni)
      .collect().head
    def q(n: Long) = TextAnalysis.qlogConst(n)
    // t1 'a' first-token → unigram: q(8)−q(3); t2 'b'|a (ctx 2):
    // q(2·2·8)−q(1·8+2·2); t3 'c'|b (ctx 1): q(2·1·8)−q(0+2·1);
    // t4 'd'|c unseen context → unigram: q(8)−q(1)
    val expected = (q(8) - q(3)) + (q(32) - q(12)) + (q(16) - q(2)) + (q(8) - q(1))
    assert(out.getAs[Long]("n_tokens") == 4L)
    assert(out.getAs[Long]("n_ctx_hits") == 2L)
    assert(out.getAs[Long]("sum_nll_micro") == expected)
  }

  test("LM merge: batch-of-batches equals whole-corpus model, scoring unchanged") {
    val docs = Tables.documents(spark, sfDir)
    val (a, b) = (docs.filter(col("doc_id") % 4 === 0), docs.filter(col("doc_id") % 4 === 2))
    val whole = docs.filter(col("doc_id") % 2 === 0)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet
    val merged = TextAnalysis.mergeUnigramLms(
      TextAnalysis.unigramLm(a, "text"), TextAnalysis.unigramLm(b, "text"))
    assert(rows(merged) == rows(TextAnalysis.unigramLm(whole, "text")))
    val mergedBg = TextAnalysis.mergeBigramLms(
      TextAnalysis.bigramLm(a, "text"), TextAnalysis.bigramLm(b, "text"))
    assert(rows(mergedBg) == rows(TextAnalysis.bigramLm(whole, "text")))
    // scoring through the merged model is identical to the whole-corpus model
    val scored = docs.filter(col("doc_id") % 2 === 1).limit(50)
    assert(rows(TextAnalysis.lmScore(scored, "doc_id", "text", merged)) ==
      rows(TextAnalysis.lmScore(scored, "doc_id", "text", TextAnalysis.unigramLm(whole, "text"))))
  }

  test("lmScoreStateless is row-identical to lmScore on the real corpus") {
    val docs = Tables.documents(spark, sfDir)
    val model = TextAnalysis.unigramLm(docs.filter(col("doc_id") % 2 === 0), "text")
    val joined = TextAnalysis.lmScore(
      docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", model)
    val stateless = TextAnalysis.lmScoreStateless(
      docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", TextAnalysis.lmToMap(model))
    val a = joined.collect().map(_.toSeq).toSet
    val b = stateless.collect().map(_.toSeq).toSet
    assert(a.nonEmpty && a == b)
  }

  test("dsirWeights ranks target-like docs higher; dsirSelect keeps ceil(frac·n) deterministically") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark spark shuffle join"),   // target-like
      (2L, "cat dog cat dog"),            // raw-like
      (3L, "spark dog shuffle cat"),      // mixed
      (4L, "join shuffle spark spark")    // target-like
    ).toDF("doc_id", "text")
    val target = TextAnalysis.unigramLm(docs.filter(col("doc_id").isin(1L, 4L)), "text")
    val raw = TextAnalysis.unigramLm(docs, "text")
    val scored = TextAnalysis.dsirWeights(docs, "doc_id", "text", target, raw)
    val w = scored.collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("weight_micro")).toMap
    assert(w(1L) > w(3L) && w(4L) > w(3L) && w(3L) > w(2L))
    val kept = TextAnalysis.dsirSelect(scored, 0.5).collect().map(_.getAs[Long]("id")).toSet
    assert(kept.size == 2 && kept.subsetOf(Set(1L, 4L))) // ceil(0.5*4)=2, the two target-like docs
  }

  test("corpusStats: both paths Expand-free, approx saves a shuffle and tracks exact vocab") {
    val docs = Tables.documents(spark, sfDir)
    val exact = TextAnalysis.corpusStats(docs, "source", "text")
    val approx = TextAnalysis.corpusStats(docs, "source", "text", exact = false)
    def nodes(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.optimizedPlan.collect { case n => n.nodeName }
    // the q40-family guarantee: exact distinct WITHOUT the row-multiplying Expand
    assert(!nodes(exact).contains("Expand") && !nodes(approx).contains("Expand"))
    // approx folds the vocab leg into one Aggregate (no distinct pre-pass)
    assert(nodes(approx).count(_ == "Aggregate") < nodes(exact).count(_ == "Aggregate"))
    val e = exact.collect().map(r => r.getAs[String]("group") -> r).toMap
    val a = approx.collect().map(r => r.getAs[String]("group") -> r).toMap
    assert(e.keySet == a.keySet && e.nonEmpty)
    e.foreach { case (src, er) =>
      val ar = a(src)
      assert(er.getAs[Long]("n_docs") == ar.getAs[Long]("n_docs"))
      assert(er.getAs[Long]("total_tokens") == ar.getAs[Long]("total_tokens"))
      val (ev, av) = (er.getAs[Long]("vocab").toDouble, ar.getAs[Long]("vocab").toDouble)
      assert(math.abs(ev - av) / ev <= 0.1, s"$src vocab: exact $ev approx $av") // HLL ±2-5%
    }
  }

  test("LM score as the near-dup quality signal: the lower-perplexity twin wins") {
    import spark.implicits._
    import graft.dedup.TextDedup
    val trusted = (1 to 20).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      10L -> trusted,                                                   // clean copy
      11L -> ((1 to 18).map(i => s"w$i").mkString(" ") + " zzq1 zzq2"), // near-dup with gibberish tail
      30L -> (1 to 20).map(i => s"other$i").mkString(" ")               // unrelated
    ).toDF("doc_id", "text")
    val model = TextAnalysis.unigramLm(Seq(0L -> trusted).toDF("doc_id", "text"), "text")
    val scored = docs.join(
      TextAnalysis.lmScore(docs, "doc_id", "text", model)
        .select(col("id").as("doc_id"), col("avg_nll_micro")), Seq("doc_id"))
    // quality = negated avg NLL: the doc the reference model finds more
    // familiar survives its cluster — id 10 beats 11 despite 11 ≠ min id ordering accidents
    val kept = TextDedup.removeNearDuplicatesBy(
      scored, "doc_id", "text", quality = -col("avg_nll_micro"))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept == Set(10L, 30L), s"kept: $kept")
  }

  test("bucketByPercentile: exact thirds per group, ties share a rank, single row is head") {
    import spark.implicits._
    // group a: values 1..6 → pct 0, .2, .4, .6, .8, 1 → buckets h,h,m,m,t,t
    // group b: one row → percent_rank 0 → head
    // group c: 1,1,3 → ties share pct 0 (head, head), 3 → pct 1 (tail)
    val scored = (Seq(("a", 1), ("a", 2), ("a", 3), ("a", 4), ("a", 5), ("a", 6),
      ("b", 9), ("c", 1), ("c", 1), ("c", 3)).zipWithIndex)
      .map { case ((g, v), i) => (i.toLong, g, v.toDouble) }.toDF("id", "g", "v")
    val got = TextAnalysis.bucketByPercentile(scored, "v", Seq("g"))
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert((0 to 5).map(got(_)) == Seq("head", "head", "middle", "middle", "tail", "tail"))
    assert(got(6L) == "head")
    assert(got(7L) == "head" && got(8L) == "head" && got(9L) == "tail")
    intercept[IllegalArgumentException] {
      TextAnalysis.bucketByPercentile(scored, "v", Seq("g"), 0.5, 0.4)
    }
  }

  test("corpusOverlap: KMV estimate is exact when k covers the union; disjoint pairs read 0") {
    import spark.implicits._
    val frame = (
      Seq("t1", "t2", "t3", "t3").map(("a", _)) ++ // in-group dup collapses
        Seq("t2", "t3", "t4").map(("b", _)) ++
        Seq("x1", "x2").map(("c", _))).toDF("g", "text")
    val got = TextAnalysis.corpusOverlap(frame, "g", "text", k = 16)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // k ≥ |union| → the sketch IS the set: J(a,b) = |{t2,t3}| / |{t1..t4}|
    assert(got(("a", "b")) == ((4L, 2L, 0.5)))
    assert(got(("a", "c")) == ((5L, 0L, 0.0)))
    assert(got(("b", "c")) == ((5L, 0L, 0.0)))
  }

  test("corpusOverlap: k caps the union sketch; k_used never exceeds k") {
    import spark.implicits._
    val frame = (1 to 30).map(i => ("a", s"t$i")).toDF("g", "text")
      .unionByName((11 to 40).map(i => ("b", s"t$i")).toDF("g", "text"))
    val row = TextAnalysis.corpusOverlap(frame, "g", "text", k = 8).collect().head
    assert(row.getLong(2) == 8L)
    assert(row.getLong(3) <= 8L)
    intercept[IllegalArgumentException](TextAnalysis.corpusOverlap(frame, "g", "text", 0))
  }

  test("quantileCensus: merge == build-of-union exactly, on real scored docs") {
    val docs = Tables.documents(spark, sfDir)
    val model = TextAnalysis.unigramLm(docs.filter(col("doc_id") % 2 === 0), "text")
    val scored = TextAnalysis.lmScore(docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", model)
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val whole = m(TextAnalysis.quantileCensus(scored))
    val merged = m(TextAnalysis.mergeQuantileCensus(
      TextAnalysis.quantileCensus(scored.filter(col("id") % 3 =!= 0)),
      TextAnalysis.quantileCensus(scored.filter(col("id") % 3 === 0))))
    assert(merged == whole && whole.nonEmpty)
    // the census is range-bounded: far fewer rows than docs
    assert(whole.size.toLong < scored.count())
    intercept[IllegalArgumentException](TextAnalysis.quantileCensus(scored, bucketWidthMicro = 0))
  }

  test("censusBounds: frozen bounds land on bucket edges and classify within bucket granularity of exact thirds") {
    import spark.implicits._
    // values 1..300, width 10: bucket k holds 10k..10k+9 (b0 has 9, b30 has 1).
    // head target ceil(300/3)=100 → cum crosses at b10 (cum 109) → bound 110;
    // middle target 200 → b20 (cum 209) → bound 210.
    val scored = (1 to 300).map(v => (v.toLong, v.toDouble)).toDF("id", "avg_nll_micro")
    val census = TextAnalysis.quantileCensus(scored, bucketWidthMicro = 10L)
    val (h, mid) = TextAnalysis.calibrateBucketsFromCensus(census, bucketWidthMicro = 10L)
    assert((h, mid) == ((110.0, 210.0)))
    // frozen-bounds classification vs exact percent_rank thirds: every
    // disagreement sits in a bound's boundary bucket (the declared
    // census granularity), never beyond it
    val exact = TextAnalysis.bucketByPercentile(scored, "avg_nll_micro", Seq.empty)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("pct_bucket")).toMap
    val frozen = scored.collect().map { r =>
      val v = r.getDouble(1)
      r.getLong(0) -> (if (v < h) "head" else if (v < mid) "middle" else "tail")
    }.toMap
    val boundary = Set(10L, 20L) // the two bound buckets
    frozen.foreach { case (id, lbl) =>
      if (exact(id) != lbl)
        assert(boundary.contains(math.floor(id.toDouble / 10).toLong), s"doc $id: $lbl vs ${exact(id)}")
    }
    // censusLabeled: labels by bound bucket, cumulative and total exact
    val lab = TextAnalysis.censusLabeled(census, bucketWidthMicro = 10L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(lab(0L) == ((9L, 9L, 300L, "head")))
    assert(lab(10L)._4 == "head" && lab(11L)._4 == "middle")
    assert(lab(20L)._4 == "middle" && lab(21L)._4 == "tail")
    assert(lab(30L) == ((1L, 300L, 300L, "tail")))
    intercept[IllegalArgumentException](
      TextAnalysis.censusBounds(census, Seq(1.5), 10L))
  }

  test("calibrateBuckets + threshold DSIR: freeze-then-apply variants agree with the exact paths") {
    val docs = Tables.documents(spark, sfDir)
    val model = TextAnalysis.unigramLm(docs.filter(col("doc_id") % 2 === 0), "text")
    val scored = TextAnalysis.lmScore(docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", model)
    val (b1, b2) = TextAnalysis.calibrateBuckets(scored)
    assert(b1 < b2)
    // rescoring with the calibrated bounds splits into three non-empty buckets
    val buckets = TextAnalysis.lmScore(
      docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", model, bucketBounds = (b1, b2))
      .groupBy("ppl_bucket").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(buckets.keySet == Set("head", "middle", "tail"), s"buckets: $buckets")
    // threshold select at an exact top-k cut keeps exactly the top-k set
    val w = TextAnalysis.dsirWeights(docs, "doc_id", "text",
      TextAnalysis.unigramLm(docs.filter(col("lang") === "en"), "text"),
      TextAnalysis.unigramLm(docs, "text"))
    val topK = TextAnalysis.dsirSelect(w, 0.25).collect().map(_.getAs[Long]("id")).toSet
    val cut = w.filter(col("id").isInCollection(topK))
      .agg(org.apache.spark.sql.functions.min("weight_micro")).head.getLong(0)
    val byThreshold = TextAnalysis.dsirSelectByThreshold(w, cut)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(topK.subsetOf(byThreshold)) // equal unless weights tie at the cut
    assert((byThreshold -- topK).forall(id =>
      w.filter(col("id") === id).head.getAs[Long]("weight_micro") == cut))
    // nDocsHint path is identical to the counting path
    val a = TextAnalysis.tfidfKeywords(docs, "doc_id", "text", k = 2).collect().map(_.toSeq).toSet
    val b = TextAnalysis.tfidfKeywords(docs, "doc_id", "text", k = 2,
      nDocsHint = Some(docs.count())).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("tfidfKeywords: ubiquitous tokens score zero, rare tokens rank first, k bounds rows") {
    import spark.implicits._
    val docs = Seq(
      (1L, "common rare common unique"),
      (2L, "common rare common"),
      (3L, "common common common")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfKeywords(docs, "doc_id", "text", k = 2).collect()
    // ≤ k rows per doc, ranks start at 1 and are dense
    val byDoc = out.groupBy(_.getAs[Long]("id"))
    assert(byDoc.values.forall(_.length <= 2))
    assert(byDoc.values.forall(rs =>
      rs.map(_.getAs[Int]("rank")).sorted.sameElements(1 to rs.length)))
    // 'common' appears in every doc → idf_micro = qlog(4) - qlog(4) = 0 → score 0
    val common = out.filter(_.getAs[String]("token") == "common")
    assert(common.nonEmpty && common.forall(_.getAs[Long]("score") == 0L))
    // doc 1's top keyword is 'unique' (df=1, highest idf)
    val top1 = out.filter(r => r.getAs[Long]("id") == 1L && r.getAs[Int]("rank") == 1)
    assert(top1.head.getAs[String]("token") == "unique")
  }

  test("QualityFilter learns planted labels (held-out AUC) and scores shuffle-free") {
    import graft.text.QualityFilter
    // real corpus text + planted separable vocabulary, the q135 fixture:
    // every third doc gets keep-words, the rest junk-words; train on
    // even ids only so scoring covers docs the fit never saw
    val labeled = Tables.documents(spark, sfDir).select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0,
        concat(col("text"), lit(" excellent thorough educational well researched reference")))
        .otherwise(concat(col("text"), lit(" click buy cheap winner prize offer")))
        .as("text"),
      (col("doc_id") % 3 === 0).cast("double").as("label"))
    val model = QualityFilter.train(
      labeled.filter(col("doc_id") % 2 === 0), "text", "label", dim = 256)
    val heldOut = labeled.filter(col("doc_id") % 2 === 1)
    val scored = QualityFilter.score(heldOut, "doc_id", "text", model)
      .join(heldOut.select(col("doc_id").as("id"), col("label")), Seq("id"))
      .select("quality_score", "label").collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    // held-out AUC: planted vocabulary is separable, so near-perfect
    val pos = scored.filter(_._2 == 1.0).map(_._1)
    val neg = scored.filter(_._2 == 0.0).map(_._1)
    assert(pos.nonEmpty && neg.nonEmpty)
    val wins = pos.iterator.map(p => neg.count(n => n < p) + 0.5 * neg.count(n => n == p)).sum
    val auc = wins / (pos.length.toDouble * neg.length)
    assert(auc >= 0.95, s"held-out AUC $auc")
    // the 100 TB contract: scoring is one narrow projection — no
    // Exchange anywhere in the physical plan
    val plan = QualityFilter.score(heldOut, "doc_id", "text", model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring must be shuffle-free:\n$plan")
    // refit on the same frame reproduces bit-identically (no RNG)
    val refit = QualityFilter.train(
      labeled.filter(col("doc_id") % 2 === 0), "text", "label", dim = 256)
    assert(refit.intercept == model.intercept &&
      refit.weights.sameElements(model.weights))
    // token-less rows score the model prior, sigmoid(intercept)
    import spark.implicits._
    val empty = QualityFilter.score(
      Seq((9L, "")).toDF("doc_id", "text"), "doc_id", "text", model).collect().head
    assert(empty.getAs[Long]("n_tokens") == 0L)
    assert(math.abs(empty.getAs[Double]("quality_score") -
      1.0 / (1.0 + math.exp(-model.intercept))) < 1e-12)
    // empty labeled frame → the uninformative prior model, not an
    // MLlib summarizer crash (first batch of a new pipeline is empty)
    val prior = QualityFilter.train(
      labeled.filter(lit(false)), "text", "label", dim = 256)
    assert(prior.intercept == 0.0 && prior.weights.forall(_ == 0.0))
    val priorScore = QualityFilter.score(
      Seq((1L, "any text at all")).toDF("doc_id", "text"), "doc_id", "text", prior)
      .collect().head.getAs[Double]("quality_score")
    assert(priorScore == 0.5)
  }

  test("CharNgrams kernel equals the transform-lambda twin gram-for-gram (unicode included)") {
    import spark.implicits._
    val frame = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
      .unionByName(Seq(
        (9001L, null.asInstanceOf[String]), (9002L, ""), (9003L, "ab"),
        (9004L, "caf\u00e9 stra\u00dfe 北京x"), (9005L, "abc")
      ).toDF("doc_id", "text"))
    val t = lower(col("text"))
    val n = 3
    val twin = frame.select(col("doc_id"),
      when(length(t) >= n, transform(
        sequence(lit(1), length(t) - (n - 1)),
        i => t.substr(i, lit(n)))).as("g"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) Nil else r.getSeq[String](1))).toMap
    val kernel = frame.select(col("doc_id"),
      graft.functions.CharNgrams.ngrams(lower(col("text")), n).as("g"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) Nil else r.getSeq[String](1))).toMap
    assert(kernel.keySet == twin.keySet)
    kernel.foreach { case (id, ks) =>
      // null/short text: twin is null, kernel null-or-empty - both
      // explode to zero rows; everything else gram-for-gram equal
      val ts = twin(id)
      assert((ks.isEmpty && ts.isEmpty) || ks == ts, s"id=$id: $ks vs $ts")
    }
  }
}
