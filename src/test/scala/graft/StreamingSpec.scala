package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.medallion.Gold
import graft.streaming.Streaming
import graft.streaming.Streaming.SessionEvent

/** Structured Streaming specs over MemoryStream: windowed agg +
  * watermark (late drop), dedup within watermark, sessionization.
  */
class StreamingSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private def drain(q: StreamingQuery): Unit = q.processAllAvailable()

  test("windowed agg emits closed windows and drops late data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val out = Streaming.windowedAgg(
      in.toDF().toDF("ts", "event_type", "value"),
      tsCol = "ts", watermarkDelay = "5 minutes", windowDuration = "10 minutes",
      dimensions = Seq("event_type"),
      aggs = Seq(Gold.CountAll("n"), Gold.Sum("value", "total")))
    val q = out.writeStream.format("memory").queryName("win_agg").outputMode("append").start()
    try {
      in.addData((ts(1), "click", 1.0), (ts(4), "click", 2.0), (ts(8), "view", 5.0))
      drain(q)
      // advance watermark past the 10:00-10:10 window (needs ts >= 10:25
      // so watermark 5min behind passes 10:10), then a late straggler
      in.addData((ts(26), "click", 7.0))
      drain(q)
      in.addData((ts(2), "click", 100.0)) // late: before watermark -> dropped
      drain(q)
      val rows = spark.table("win_agg")
        .select(col("event_type"), col("n"), col("total")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows == Set(("click", 2L, 3.0), ("view", 1L, 5.0)))
    } finally q.stop()
  }

  test("dedup within watermark keeps first occurrence per key") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Double)]
    val out = Streaming.dedupWithinWatermark(
      in.toDF().toDF("event_id", "ts", "value"),
      tsCol = "ts", watermarkDelay = "10 minutes", keys = Seq("event_id"))
    val q = out.writeStream.format("memory").queryName("dedup_wm").outputMode("append").start()
    try {
      in.addData((1L, ts(1), 1.0), (1L, ts(2), 2.0), (2L, ts(3), 3.0))
      drain(q)
      in.addData((1L, ts(4), 4.0), (3L, ts(5), 5.0)) // 1 is still a dup
      drain(q)
      val ids = spark.table("dedup_wm").select("event_id").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("sessionization closes sessions on gap timeout and explicit gap break") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SessionEvent]
    val out = Streaming.sessionize(in.toDS(), gapMs = 5 * 60 * 1000, watermarkDelay = "1 minute")
    val q = out.writeStream.format("memory").queryName("sessions").outputMode("append").start()
    try {
      // user 1: events at 10:01, 10:03 (one session); then 10:20 (new session)
      in.addData(SessionEvent(1L, ts(1)), SessionEvent(1L, ts(3)))
      drain(q)
      in.addData(SessionEvent(1L, ts(20))) // gap > 5min -> closes first session
      drain(q)
      // advance watermark far past 10:25 so the timeout fires for session 2
      in.addData(SessionEvent(2L, ts(40)))
      drain(q)
      in.addData(SessionEvent(2L, ts(41))) // extra batch to evaluate timeouts
      drain(q)
      val sessions = spark.table("sessions")
        .filter(col("user_id") === 1L)
        .select("session_start", "session_end", "n_events").collect()
        .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getInt(2))).toSet
      assert(sessions.contains((ts(1), ts(3), 2)), sessions.toString)
      assert(sessions.contains((ts(20), ts(20), 1)), sessions.toString)
    } finally q.stop()
  }

  test("sessionization: in-watermark late event widens session_start") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SessionEvent]
    val out = Streaming.sessionize(in.toDS(), gapMs = 5 * 60 * 1000, watermarkDelay = "10 minutes")
    val q = out.writeStream.format("memory").queryName("sessions_late").outputMode("append").start()
    try {
      in.addData(SessionEvent(1L, ts(5)))
      drain(q)
      // late but within the 10-minute watermark, BEFORE the session's
      // start: must merge and lower session_start (batch equivalence)
      in.addData(SessionEvent(1L, ts(3)))
      drain(q)
      in.addData(SessionEvent(1L, ts(20))) // gap break closes the session
      drain(q)
      val sessions = spark.table("sessions_late")
        .select("session_start", "session_end", "n_events").collect()
        .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getInt(2))).toSet
      assert(sessions.contains((ts(3), ts(5), 2)), sessions.toString)
    } finally q.stop()
  }

  test("sessionization: in-watermark event before start minus gap SPLITS, not merges") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SessionEvent]
    val out = Streaming.sessionize(in.toDS(), gapMs = 5 * 60 * 1000, watermarkDelay = "30 minutes")
    val q = out.writeStream.format("memory").queryName("sessions_split").outputMode("append").start()
    try {
      in.addData(SessionEvent(1L, ts(30)))
      drain(q)
      // two late events, in-watermark (wm = 10:00), both earlier than
      // 10:30 − 5min: batch (global sort) groups them as their OWN
      // session {10:03..10:05} — the vacuous `t − last ≤ gap` merge
      // would instead have widened the open session to 10:03..10:30
      in.addData(SessionEvent(1L, ts(3)), SessionEvent(1L, ts(5)))
      drain(q)
      in.addData(SessionEvent(1L, ts(50))) // gap break closes {10:30}
      drain(q)
      val sessions = spark.table("sessions_split")
        .select("session_start", "session_end", "n_events").collect()
        .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getInt(2))).toSet
      assert(sessions.contains((ts(3), ts(5), 2)), sessions.toString)
      assert(sessions.contains((ts(30), ts(30), 1)), sessions.toString)
      assert(!sessions.exists(s => s._1 == ts(3) && s._2 == ts(30)),
        s"disjoint late events must not widen the open session: $sessions")
    } finally q.stop()
  }

  test("streaming incremental dedup: each micro-batch probes the accumulated signature store") {
    import spark.implicits._
    import graft.dedup.TextDedup
    import graft.sources.VersionedTable
    implicit val sqlCtx = spark.sqlContext
    val sigTable = java.nio.file.Files.createTempDirectory("graft_stream_dedup").toString + "/sigs"
    val found = scala.collection.mutable.Set.empty[(Long, Long)]
    val in = MemoryStream[(Long, String)]
    // the crawl loop: detect near-dups against everything signed so
    // far, then append THIS batch's signatures exactly-once — only
    // composition, no new machinery
    val q = in.toDF().toDF("doc_id", "text").writeStream.queryName("crawl")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val s = batch.sparkSession
        val docs = batch.toDF()
        val newSigs = TextDedup.minhashSignatures(
          TextDedup.shingleSets(docs, "doc_id", "text", 3), 16)
        val oldSigs =
          if (VersionedTable.currentVersion(s, sigTable).isDefined)
            VersionedTable.read(s, sigTable)
          else newSigs.limit(0)
        found ++= TextDedup.incrementalNearDups(docs, "doc_id", "text", oldSigs)
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        VersionedTable.appendIdempotent(s, sigTable, newSigs, s"crawl-$batchId")
        ()
      }.start()
    try {
      in.addData(
        (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (2L, "totally unrelated payload about catalyst plans and shuffle partitioning"))
      drain(q)
      assert(found.isEmpty, s"first batch has nothing to collide with: $found")
      in.addData(
        (10L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // ~doc 1
        (11L, "in batch twin content repeated verbatim for the pairing assertion"),
        (12L, "in batch twin content repeated verbatim for the pairing assertion"))
      drain(q)
      assert(found.contains((1L, 10L)), s"cross-batch near-dup missed: $found")
      assert(found.contains((11L, 12L)), s"in-batch twins missed: $found")
      assert(!found.exists { case (a, b) => a <= 2 && b <= 2 },
        s"old×old pair must never re-report: $found")
      // one signature version per micro-batch, all docs signed
      assert(VersionedTable.versions(spark, sigTable).size == 2)
      assert(VersionedTable.read(spark, sigTable).count() == 5)
    } finally q.stop()
  }

  test("streaming webgraph maintenance: edge micro-batches append adjacency deltas exactly-once; warm PageRank off the merged store is bit-identical") {
    import spark.implicits._
    import graft.graph.LinkGraph
    import graft.sources.VersionedTable
    implicit val sqlCtx = spark.sqlContext
    val storeTable = java.nio.file.Files.createTempDirectory("graft_stream_adj").toString + "/adjacency"
    val in = MemoryStream[(Long, Long)]
    // the crawl loop for the WEBGRAPH (r16 verdict #5): each
    // micro-batch of raw links folds to its adjacency delta and
    // appends exactly-once; readers compact the appended rows
    // merge-on-read. foreachBatchVersioned + adjacencyStore is the
    // whole production composition — no new machinery.
    val q = graft.streaming.Streaming.foreachBatchVersioned(
      in.toDF().toDF("src", "dst"), storeTable, "crawl_adj",
      batch => LinkGraph.adjacencyStore(batch, "src", "dst")).start()
    // batch 1 = the "history" crawl (with a parallel edge), batch 2 =
    // today's delta re-crawling one edge (counts must ADD) + new nodes
    val b1 = Seq(0L -> 1L, 0L -> 2L, 1L -> 2L, 2L -> 0L, 0L -> 1L)
    val b2 = Seq(0L -> 1L, 2L -> 3L, 3L -> 0L)
    try {
      in.addData(b1: _*)
      drain(q)
      in.addData(b2: _*)
      drain(q)
      assert(VersionedTable.versions(spark, storeTable).size == 2)
      // merge-on-read == the whole-graph store, row-for-row (n_links included)
      val compacted = LinkGraph.compactAdjacency(VersionedTable.read(spark, storeTable))
      val whole = LinkGraph.adjacencyStore((b1 ++ b2).toDF("src", "dst"), "src", "dst")
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows(compacted) == rows(whole))
      assert(rows(compacted).contains((0L, 1L, 3L)), "re-crawled edge counts must add")
      // warm PageRank off the streamed store lands bit-identically on
      // the whole-graph store's answer (the q187 contract, stream-fed)
      val nodes = (0L to 3L).toDF("id")
      val seed = LinkGraph.pageRank(nodes, "id", b1.toDF("src", "dst"), "src", "dst",
        iters = 3).localCheckpoint(true)
      def ranks(store: org.apache.spark.sql.DataFrame) =
        LinkGraph.pageRankFromStore(nodes, "id", store, iters = 2, seed = Some(seed))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(ranks(compacted) == ranks(whole))
      // replay no-op: re-appending batch 1's delta under its original
      // token (what foreachBatch does on recovery) commits nothing
      VersionedTable.appendIdempotent(spark, storeTable,
        LinkGraph.adjacencyStore(b1.toDF("src", "dst"), "src", "dst"), "crawl_adj-0")
      assert(VersionedTable.versions(spark, storeTable).size == 2)
      assert(rows(LinkGraph.compactAdjacency(VersionedTable.read(spark, storeTable)))
        == rows(whole))
    } finally q.stop()
  }

  test("streaming crawl substring-dedup: micro-batches probe and extend the gram-count store") {
    import spark.implicits._
    import graft.dedup.TextDedup
    import graft.sources.VersionedTable
    implicit val sqlCtx = spark.sqlContext
    val storeTable = java.nio.file.Files.createTempDirectory("graft_stream_grams").toString + "/grams"
    val dupTokens = scala.collection.mutable.Map.empty[Long, Long]
    val in = MemoryStream[(Long, String)]
    // the crawl loop for SUBSTRING dedup: score this batch against the
    // saturated gram counts accumulated so far, then append this
    // batch's (already saturated) count delta exactly-once — reads
    // re-saturate across deltas via the same merge, so the store stays
    // a pile of append-only rows with merge-on-read semantics
    val q = in.toDF().toDF("doc_id", "text").writeStream.queryName("crawl_grams")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val s = batch.sparkSession
        val docs = batch.toDF()
        val delta = TextDedup.gramCountStore(docs, "doc_id", "text", k = 3)
        val oldStore =
          if (VersionedTable.currentVersion(s, storeTable).isDefined) {
            val raw = VersionedTable.read(s, storeTable)
            TextDedup.mergeGramCountStores(raw, raw.limit(0))
          } else delta.limit(0)
        dupTokens ++= TextDedup.incrementalRepeatedSpans(docs, "doc_id", "text", oldStore, k = 3)
          .collect().map(r => r.getLong(0) -> r.getLong(2))
        VersionedTable.appendIdempotent(s, storeTable, delta, s"crawl-grams-$batchId")
        ()
      }.start()
    try {
      in.addData(
        (1L, "alpha beta gamma delta one"),
        (2L, "unrelated words entirely here"))
      drain(q)
      assert(dupTokens == Map(1L -> 0L, 2L -> 0L), s"first batch is clean: $dupTokens")
      in.addData(
        (10L, "alpha beta gamma delta two"), // shares a 4-token span with batch-1 doc 1
        (11L, "twin payload repeated verbatim"),
        (12L, "twin payload repeated verbatim"))
      drain(q)
      assert(dupTokens(10L) == 4L, s"cross-batch span must come from the store: $dupTokens")
      assert(dupTokens(11L) == 4L && dupTokens(12L) == 4L, s"in-batch twins: $dupTokens")
      assert(VersionedTable.versions(spark, storeTable).size == 2)
    } finally q.stop()
  }

  test("streaming index maintenance: micro-batches append the postings store; derived index == full rebuild") {
    import spark.implicits._
    import graft.text.Retrieval
    import graft.sources.VersionedTable
    implicit val sqlCtx = spark.sqlContext
    val storeTable = java.nio.file.Files.createTempDirectory("graft_stream_idx").toString + "/postings"
    val in = MemoryStream[(Long, String)]
    // the daily-crawl loop for RETRIEVAL: each micro-batch's postings
    // fold into the persisted store exactly-once; champion lists
    // derive from the store alone — history text is never re-read
    val q = in.toDF().toDF("doc_id", "text").writeStream.queryName("crawl_idx")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val s = batch.sparkSession
        val delta = Retrieval.postingsStore(batch.toDF(), "doc_id", "text")
        VersionedTable.appendIdempotent(s, storeTable, delta, s"crawl-idx-$batchId")
        ()
      }.start()
    val all = Seq(
      (1L, "x x y spark catalyst"), (2L, "x z tungsten"),
      (10L, "x y q catalyst catalyst"), (11L, "z z spark"))
    try {
      in.addData(all(0), all(1))
      drain(q)
      in.addData(all(2), all(3))
      drain(q)
      assert(VersionedTable.versions(spark, storeTable).size == 2)
      val viaStream = Retrieval.indexFromPostings(
        VersionedTable.read(spark, storeTable), maxPostings = 2)
        .collect().map(_.toSeq).toSet
      val viaBatch = Retrieval.invertedIndex(
        all.toDF("doc_id", "text"), "doc_id", "text", maxPostings = 2)
        .collect().map(_.toSeq).toSet
      assert(viaStream == viaBatch,
        "the streamed store's derived index must equal the full rebuild")
    } finally q.stop()
  }

  test("streaming chunking: the stateless window transform runs directly on a stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the RAG-ingest shape: stream of documents → chunk → index sink.
    // chunkDocs is a narrow per-row transform, so it composes onto a
    // streaming DataFrame with no foreachBatch, no state, no watermark
    val in = MemoryStream[(Long, String)]
    val chunked = graft.services.Curator.chunkDocs(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text", maxTokens = 4, overlap = 1)
    val q = chunked.writeStream.format("memory")
      .queryName("chunks_out").outputMode("append").start()
    try {
      in.addData((1L, (1 to 10).map(i => s"t$i").mkString(" ")), (2L, "a b"))
      drain(q)
      val rows = spark.table("chunks_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(rows == Set(
        (1L, 0L, "t1 t2 t3 t4"), (1L, 1L, "t4 t5 t6 t7"), (1L, 2L, "t7 t8 t9 t10"),
        (2L, 0L, "a b")))
    } finally q.stop()
  }

  test("streaming PII scrub: stateless masking at ingest, bit-identical to batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // scrub-at-ingest: documents stream in and are masked before they
    // ever land. scrubTexts is a narrow per-row projection — no state,
    // no watermark — and must agree with the batch pass row-for-row.
    val rows = Seq(
      (1L, "mail a@b.com call 555-123-4567"),
      (2L, "from 10.0.0.1"),
      (3L, "clean"))
    val in = MemoryStream[(Long, String)]
    val scrubbed = graft.services.Redaction.scrubTexts(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val q = scrubbed.writeStream.format("memory")
      .queryName("scrub_out").outputMode("append").start()
    try {
      in.addData(rows: _*)
      drain(q)
      val got = spark.table("scrub_out").collect().map(_.toSeq).toSet
      val batch = graft.services.Redaction.scrubTexts(
        rows.toDF("doc_id", "text"), "doc_id", "text")
        .collect().map(_.toSeq).toSet
      assert(got == batch)
      assert(got.size == 3)
    } finally q.stop()
  }

  test("streaming LM maintenance: per-batch count deltas merge to the whole-corpus model") {
    import spark.implicits._
    import graft.sources.VersionedTable
    import graft.text.TextAnalysis
    implicit val sqlCtx = spark.sqlContext
    val storeTable = java.nio.file.Files.createTempDirectory("graft_stream_lm").toString + "/lm"
    val in = MemoryStream[(Long, String)]
    // the crawl loop for LM maintenance: each micro-batch appends its
    // OWN count table exactly-once; reads merge-on-read the deltas
    // (counts are additive, so merge order is irrelevant) — the model
    // is always the whole-corpus model without ever rescanning it
    val q = in.toDF().toDF("doc_id", "text").writeStream.queryName("crawl_lm")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val delta = TextAnalysis.unigramLm(batch.toDF(), "text")
        VersionedTable.appendIdempotent(batch.sparkSession, storeTable, delta, s"lm-$batchId")
        ()
      }.start()
    val b1 = Seq((1L, "a a b spark"), (2L, "b spark join"))
    val b2 = Seq((3L, "spark spark shuffle"), (4L, "a join shuffle"))
    try {
      in.addData(b1: _*); drain(q)
      in.addData(b2: _*); drain(q)
      val merged = TextAnalysis.mergeUnigramLms(
        VersionedTable.read(spark, storeTable), // raw append-only deltas
        TextAnalysis.unigramLm((b1 ++ b2).toDF("doc_id", "text").limit(0), "text"))
      val whole = TextAnalysis.unigramLm((b1 ++ b2).toDF("doc_id", "text"), "text")
      assert(merged.collect().map(_.toSeq).toSet == whole.collect().map(_.toSeq).toSet)
      assert(TextAnalysis.lmDenominator(merged) == TextAnalysis.lmDenominator(whole))
      assert(VersionedTable.versions(spark, storeTable).size == 2)
    } finally q.stop()
  }

  test("streaming LM scoring: stateless per-row NLL against a frozen model, append mode") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // scoring-at-ingest: documents stream in and are scored against a
    // static reference model. lmScoreStateless folds the NLL inside
    // each row (model as map literal), so it needs no state, no
    // watermark, no foreachBatch — and must agree bit-for-bit with
    // the batch explode+groupBy path on the same rows.
    val refDocs = Seq((100L, "a a b spark"), (101L, "b spark spark")).toDF("doc_id", "text")
    val model = graft.text.TextAnalysis.unigramLm(refDocs, "text")
    val modelMap = graft.text.TextAnalysis.lmToMap(model)
    val in = MemoryStream[(Long, String)]
    val scored = graft.text.TextAnalysis.lmScoreStateless(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text", modelMap)
    val q = scored.writeStream.format("memory")
      .queryName("lm_out").outputMode("append").start()
    try {
      in.addData((1L, "a b spark"), (2L, "unseen words only"), (3L, "   "))
      drain(q)
      val got = spark.table("lm_out").collect().map(_.toSeq).toSet
      val batch = graft.text.TextAnalysis.lmScore(
        Seq((1L, "a b spark"), (2L, "unseen words only")).toDF("doc_id", "text"),
        "doc_id", "text", model).collect().map(_.toSeq).toSet
      assert(got == batch) // token-less doc 3 dropped by both paths
      assert(got.size == 2)
    } finally q.stop()
  }

  test("streaming learned-quality scoring: fixed model, append mode, agrees with batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the QualityFilter scaladoc claims scoring is streaming-composable
    // (one narrow projection, weights as a literal, no state); this is
    // that claim as behavior, not a plan assertion. Train offline on a
    // static labeled frame, score the stream, and require bit-identical
    // agreement with the batch path on the same rows.
    val labeled = Seq(
      ("excellent thorough educational reference material", 1.0),
      ("well researched detailed clear explanation text", 1.0),
      ("click buy cheap winner prize offer now", 0.0),
      ("cheap promo deal click offer buy fast", 0.0)).toDF("text", "label")
    val model = graft.text.QualityFilter.train(labeled, "text", "label", dim = 256)
    val in = MemoryStream[(Long, String)]
    val scored = graft.text.QualityFilter.score(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text", model)
    val q = scored.writeStream.format("memory")
      .queryName("qf_out").outputMode("append").start()
    try {
      val rows = Seq((1L, "thorough educational explanation"), (2L, "click buy cheap now"), (3L, ""))
      in.addData(rows: _*)
      drain(q)
      val got = spark.table("qf_out").collect().map(_.toSeq).toSet
      val batch = graft.text.QualityFilter.score(
        rows.toDF("doc_id", "text"), "doc_id", "text", model)
        .collect().map(_.toSeq).toSet
      assert(got == batch, "stream and batch scoring must agree bit-for-bit")
      assert(got.size == 3) // token-less doc 3 scores the model prior, not dropped
    } finally q.stop()
  }

  test("streaming learned language ID: fixed model, append mode, agrees with batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // LangId.score's scaladoc claims the kernel projection composes
    // onto a streaming frame (one narrow Exchange-free projection, the
    // model rides as expression state) — this is that claim as
    // behavior: train offline on the planted corpus, score the stream,
    // require bit-identical agreement with the batch path.
    val model = graft.text.LangId.train(
      graft.text.LangId.plantedCorpus(spark, 120, seed = 5L), "text", "lang",
      dim = 256, maxIter = 30)
    val in = MemoryStream[(Long, String)]
    val scored = graft.text.LangId.score(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text", model)
    val q = scored.writeStream.format("memory")
      .queryName("langid_out").outputMode("append").start()
    try {
      val rows = Seq(
        (1L, "the quick brown fox and the lazy dog of the town"),
        (2L, "el perro es de la casa y no se ve por que"),
        (3L, "")) // gram-less: scores the intercept prior, not dropped
      in.addData(rows: _*)
      drain(q)
      val got = spark.table("langid_out").collect().map(_.toSeq).toSet
      val batch = graft.text.LangId.score(
        rows.toDF("doc_id", "text"), "doc_id", "text", model)
        .collect().map(_.toSeq).toSet
      assert(got == batch, "stream and batch language ID must agree bit-for-bit")
      assert(got.size == 3)
    } finally q.stop()
  }

  test("streaming epoch-mix materialization: precomputed plan, append mode, agrees with batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // applyEpochPlan's scaladoc claims the materialization half is
    // streaming-composable (plan literals, per-row explode + hash
    // filter, no state) — the daily-crawl shape: plan from yesterday's
    // token census, replay applied to today's stream.
    val plan = Seq(
      graft.services.Curator.EpochPlan("web", 2, 0.5),
      graft.services.Curator.EpochPlan("wiki", 3, 0.0))
    val in = MemoryStream[(Long, String)]
    val mixed = graft.services.Curator.applyEpochPlan(
      in.toDF().toDF("doc_id", "source"), col("doc_id"), "source", plan,
      seed = 42L, portable = true)
    val q = mixed.writeStream.format("memory")
      .queryName("mix_out").outputMode("append").start()
    try {
      val rows = (1L to 10L).map(i => (i, if (i % 2 == 0) "web" else "wiki")) :+
        ((99L, "books")) // untargeted stratum: dropped, not an error
      in.addData(rows: _*)
      drain(q)
      val got = spark.table("mix_out").collect().map(_.toSeq).toSet
      val batch = graft.services.Curator.applyEpochPlan(
        rows.toDF("doc_id", "source"), col("doc_id"), "source", plan,
        seed = 42L, portable = true).collect().map(_.toSeq).toSet
      assert(got == batch, "stream and batch epoch mix must agree bit-for-bit")
      assert(!got.exists(_.contains("books")))
      // wiki rows appear exactly 3 times (no partial), web 2 or 3
      val wiki = got.toSeq.filter(_.contains("wiki"))
      assert(wiki.size == 5 * 3)
    } finally q.stop()
  }

  test("foreachBatchScd2: CDC micro-batches fold to the sequential batch merges bit-identically; replay no-op") {
    import spark.implicits._
    import graft.medallion.Scd2
    import graft.sources.VersionedTable
    implicit val sqlCtx = spark.sqlContext
    val table = java.nio.file.Files.createTempDirectory("graft_scd2_vt").toString + "/dim"
    val keys = Seq("id"); val tracked = Seq("seg", "bal")
    val b1 = Seq((1L, "A", 10.0, false, "2024-01-01 00:00:00"),
      (2L, "B", 20.0, false, "2024-01-01 00:00:00"),
      (3L, "C", 30.0, false, "2024-01-01 00:00:00"))
    val b2 = Seq((2L, "BX", 25.0, false, "2024-02-01 00:00:00"), // update
      (3L, "C", 30.0, true, "2024-02-01 00:00:00"),              // soft delete
      (4L, "D", 40.0, false, "2024-02-01 00:00:00"))             // brand new
    val in = MemoryStream[(Long, String, Double, Boolean, String)]
    val q = Streaming.foreachBatchScd2(
      in.toDF().toDF("id", "seg", "bal", "_deleted", "eff"), table, "dim_sink",
      keys, tracked, "eff", deleteIndicator = Some("_deleted")).start()
    try {
      in.addData(b1: _*); drain(q)
      in.addData(b2: _*); drain(q)
    } finally q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) = df.select(
      col("id"), col("seg"), col("bal"), col("_scd_effective_from"),
      col("_scd_effective_to"), col("_scd_is_current"), col("_scd_version"))
      .collect().map(_.toSeq).toSet
    // the equivalent batch path: the same two merges run as batch jobs
    // (the first against the empty dimension — merge reduces to the
    // initial load there by construction)
    def batchMerge(existing: org.apache.spark.sql.DataFrame, rows: Seq[(Long, String, Double, Boolean, String)]) =
      Scd2.merge(existing, rows.toDF("id", "seg", "bal", "_deleted", "eff").drop("eff"),
        keys, tracked, lit(rows.head._5), deleteIndicator = Some("_deleted"))
    val empty = Scd2.initialLoad(
      b1.toDF("id", "seg", "bal", "_deleted", "eff").drop("_deleted", "eff").limit(0),
      keys, tracked, lit(b1.head._5))
    val expected = batchMerge(batchMerge(empty, b1).localCheckpoint(true), b2)
    assert(rows(VersionedTable.read(spark, table)) == rows(expected),
      "stream-folded dimension must equal the sequential batch merges bit-for-bit")
    // sanity on the end-state semantics: 3 current rows (1 unchanged,
    // 2's v2, 4's v1), 2 closed (2's v1, deleted 3's v1)
    val cur = VersionedTable.read(spark, table).filter(col("_scd_is_current"))
    assert(cur.count() == 3 && VersionedTable.read(spark, table).count() == 5)
    // exactly-once: replaying batch 0's token is a no-op returning the
    // original version — the dimension state does not move
    val vBefore = VersionedTable.currentVersion(spark, table).get
    val vReplay = Scd2.mergeIntoVersionedIdempotent(spark, table,
      b1.toDF("id", "seg", "bal", "_deleted", "eff").drop("eff"),
      keys, tracked, lit(b1.head._5), token = "dim_sink-0",
      deleteIndicator = Some("_deleted"))
    assert(vReplay == 1, s"replayed batch 0 must return its original version, got $vReplay")
    assert(VersionedTable.currentVersion(spark, table).contains(vBefore))
    assert(rows(VersionedTable.read(spark, table)) == rows(expected), "replay must not move the dimension")
    // the audit guards every commit: a second current row for a key is refused
    val bad = Seq((4L, "DX", 41.0, false, "2024-03-01 00:00:00"))
    intercept[IllegalArgumentException] {
      VersionedTable.replaceIdempotent(spark, table,
        VersionedTable.read(spark, table).unionByName(
          Scd2.initialLoad(bad.toDF("id", "seg", "bal", "_deleted", "eff").drop("_deleted", "eff"),
            keys, tracked, lit(bad.head._5))),
        token = "dim_sink-bad", audit = Scd2.scd2Audit(keys))
    }
    assert(VersionedTable.currentVersion(spark, table).contains(vBefore),
      "a failed audit must leave the previous version current")
  }

  test("foreachBatchVersioned: one committed version per micro-batch, replay is a no-op") {
    import spark.implicits._
    import graft.sources.VersionedTable
    implicit val sqlCtx = spark.sqlContext
    val table = java.nio.file.Files.createTempDirectory("graft_stream_vt").toString + "/tbl"
    val in = MemoryStream[(Long, String)]
    val q = Streaming.foreachBatchVersioned(
      in.toDF().toDF("id", "v"), table, queryName = "evt_sink",
      transform = _.withColumn("tag", lit("s")))
      .start()
    try {
      in.addData((1L, "a")); drain(q)
      in.addData((2L, "b"), (3L, "c")); drain(q)
      assert(VersionedTable.read(spark, table).count() == 3)
      assert(VersionedTable.versions(spark, table).size == 2)
      assert(VersionedTable.read(spark, table).columns.contains("tag"))
    } finally q.stop()
    // recovery semantics: foreachBatch replays a batch id — simulate the
    // retry directly; the txn token collapses it to the committed version
    val replayRows = Seq((1L, "a")).toDF("id", "v").withColumn("tag", lit("s"))
    val vBefore = VersionedTable.currentVersion(spark, table).get
    val vReplay = VersionedTable.appendIdempotent(spark, table, replayRows, "evt_sink-0")
    assert(vReplay == 1, "replayed batch 0 must return its original version")
    assert(VersionedTable.currentVersion(spark, table).contains(vBefore))
    assert(VersionedTable.read(spark, table).count() == 3, "no double-append on replay")
    // a NEW token still appends
    val v3 = VersionedTable.appendIdempotent(spark, table, replayRows, "evt_sink-99")
    assert(v3 == vBefore + 1 && VersionedTable.read(spark, table).count() == 4)
  }

  test("streaming embedding-ANN maintenance: micro-batches probe the signed corpus, append signatures exactly-once; union ≡ one batch run") {
    import spark.implicits._
    import graft.similarity.Ann
    import graft.sources.VersionedTable
    implicit val sqlCtx = spark.sqlContext
    val dim = 16
    val rnd = new scala.util.Random(23)
    def vec(): Array[Float] = Array.fill(dim)(rnd.nextGaussian().toFloat)
    def jitter(v: Array[Float]): Array[Float] = v.map(x => x + 0.02f * rnd.nextGaussian().toFloat)
    val root = java.nio.file.Files.createTempDirectory("graft_stream_ann").toString
    val sigTable = root + "/sigs"
    val vecTable = root + "/vecs"
    val found = scala.collection.mutable.Set.empty[(Long, Long)]
    val in = MemoryStream[(Long, Array[Float])]
    // the crawl loop for the EMBEDDING family (r17 verdict #3 — the
    // text-dedup loop's missing twin): each micro-batch probes the
    // accumulated signature store asymmetrically (old×old never
    // generated), then appends ITS signatures and vectors exactly-once
    // tagged with the batch ordinal; readers resolve re-crawled ids
    // new-wins via compactNewWins — merge-on-read, appends immutable
    val q = in.toDF().toDF("vec_id", "embedding").writeStream.queryName("crawl_ann")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val s = batch.sparkSession
        val docs = batch.toDF()
        val oldSigs =
          if (VersionedTable.currentVersion(s, sigTable).isDefined)
            Ann.compactNewWins(VersionedTable.read(s, sigTable), "id", "batch_id")
          else Ann.signatureStore(docs, "vec_id", "embedding", dim).limit(0)
        val corpus =
          if (VersionedTable.currentVersion(s, vecTable).isDefined)
            Ann.compactNewWins(VersionedTable.read(s, vecTable), "vec_id", "batch_id")
          else docs.limit(0)
        found ++= Ann.incrementalCosineNearDups(docs, "vec_id", "embedding",
            oldSigs, corpus, threshold = 0.9, dim = dim)
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        VersionedTable.appendIdempotent(s, sigTable,
          Ann.signatureStore(docs, "vec_id", "embedding", dim)
            .withColumn("batch_id", lit(batchId)), s"crawl_ann-$batchId")
        VersionedTable.appendIdempotent(s, vecTable,
          docs.withColumn("batch_id", lit(batchId)), s"crawl_ann_vecs-$batchId")
        ()
      }.start()
    val base = (0L until 30L).map(i => i -> vec()).toMap
    val new7 = jitter(base(10L)) // id 7 re-crawls in batch 2 near id 10
    val b1 = (0L until 30L).map(i => i -> base(i))
    val b2 = (0L until 5L).map(i => (100L + i) -> jitter(base(i))) ++
      Seq(7L -> new7) ++ { val twin = vec(); Seq(110L -> twin, 111L -> jitter(twin)) }
    val b3 = Seq(200L -> jitter(new7))
    try {
      in.addData(b1: _*)
      drain(q)
      assert(found.isEmpty, s"batch 1 is all-random — nothing to collide: $found")
      in.addData(b2: _*)
      drain(q)
      assert((0L until 5L).forall(i => found.contains((i, 100L + i))),
        s"cross-batch near-dups missed: $found")
      assert(found.contains((110L, 111L)), s"in-batch twins missed: $found")
      assert(found.contains((7L, 10L)),
        s"re-crawled id must probe with its NEW vector: $found")
      // the compacted store carries exactly ONE signature set per id,
      // and id 7's rows are the NEW vector's (stale rows resolved away)
      val compacted = Ann.compactNewWins(
        VersionedTable.read(spark, sigTable), "id", "batch_id")
      assert(compacted.groupBy("id", "band").count().filter(col("count") > 1).isEmpty,
        "new-wins compaction must leave one signature per (id, band)")
      def sigSet(df: org.apache.spark.sql.DataFrame) =
        df.select("id", "band", "sig").collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
      assert(sigSet(compacted.filter(col("id") === 7L)) ==
        sigSet(Ann.signatureStore(Seq(7L -> new7).toDF("vec_id", "embedding"),
          "vec_id", "embedding", dim)))
      in.addData(b3: _*)
      drain(q)
      assert(found.contains((7L, 200L)),
        s"batch 3 must collide with the re-crawled signature: $found")
      // N micro-batches ≡ ONE batch run: the union of per-batch
      // detections equals the full LSH run over the final new-wins
      // corpus (every pair here touches some batch at its crawl time,
      // and id 7's retired vector never paired with anything)
      val finalCorpus = Ann.compactNewWins(
        VersionedTable.read(spark, vecTable), "vec_id", "batch_id")
      val full = Ann.cosineNearDupLsh(finalCorpus, "vec_id", "embedding",
          threshold = 0.9, dim = dim)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(found.toSet == full, s"stream union ${found.toSet} != batch run $full")
      // replay no-op: re-appending batch 0's signatures under the
      // original token (foreachBatch recovery) commits nothing
      val vBefore = VersionedTable.versions(spark, sigTable).size
      VersionedTable.appendIdempotent(spark, sigTable,
        Ann.signatureStore(b1.toDF("vec_id", "embedding"), "vec_id", "embedding", dim)
          .withColumn("batch_id", lit(0L)), "crawl_ann-0")
      assert(VersionedTable.versions(spark, sigTable).size == vBefore)
      assert(sigSet(Ann.compactNewWins(VersionedTable.read(spark, sigTable),
        "id", "batch_id")) == sigSet(compacted.unionByName(
        Ann.signatureStore(b3.toDF("vec_id", "embedding"), "vec_id", "embedding", dim))))
    } finally q.stop()
  }
}
