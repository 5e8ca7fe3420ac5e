package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.lineage.Lineage
import graft.lineage.Lineage._
import graft.llm.{RuleBasedNl2Sql, SchemaInference}
import graft.sources.Connectors

/** Lineage graph, file connectors + bronze metadata, schema inference,
  * NL→SQL stub.
  */
class ComponentSpec extends SparkSpec {

  test("lineage: traversal, path, impact analysis, mermaid") {
    val t = new Lineage.Tracker
    t.recordTransform(Seq("raw.events"), "silver.events", "clean")
    t.recordJoin("silver.events", "silver.users", "gold.sessions")
    t.recordAggregate("gold.sessions", "gold.daily_kpis")

    val g = t.graph
    assert(g.upstream("gold.daily_kpis").toSet ==
      Set("gold.sessions", "silver.events", "silver.users", "raw.events"))
    assert(g.downstream("raw.events") == Seq("silver.events", "gold.sessions", "gold.daily_kpis"))
    assert(g.upstream("gold.daily_kpis", depth = 1) == Seq("gold.sessions"))
    assert(g.path("raw.events", "gold.daily_kpis").get.head == "raw.events")
    assert(g.path("gold.daily_kpis", "raw.events").isEmpty)
    val impact = g.impactAnalysis("silver.events")
    assert(impact.totalImpact.toSet == Set("gold.sessions", "gold.daily_kpis"))
    assert(impact.severity == "low")
    assert(g.roots.toSet == Set("raw.events", "silver.users"))
    assert(g.leaves == Seq("gold.daily_kpis"))
    assert(g.toMermaid.contains("raw_events -->|clean| silver_events"))
  }

  test("csv connector round-trips with schema; bronze metadata stamps rows") {
    val dir = java.nio.file.Files.createTempDirectory("csv").toString
    java.nio.file.Files.writeString(java.nio.file.Path.of(dir, "data.csv"),
      "id;name\n1;alpha\n2;\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val df = Connectors.readCsv(spark, dir, Some(schema),
      Connectors.CsvOptions(delimiter = ";"))
    assert(df.count() == 2)
    assert(df.filter(col("name").isNull).count() == 1) // nullValue ""

    val stamped = Connectors.withIngestMetadata(df, "crm", "batch-7",
      ingestionTimeMs = 1704067200000L, sourceFile = Some("data.csv"))
    val row = stamped.filter(col("id") === 1).head()
    assert(row.getAs[String]("_source") == "crm")
    assert(row.getAs[String]("_batch_id") == "batch-7")
    assert(row.getAs[java.sql.Date]("_ingestion_date").toString == "2024-01-01")
    intercept[IllegalArgumentException] {
      Connectors.readCsv(spark, dir, None) // schema-less without opt-in must fail
    }
  }

  test("binaryFile ingest feeds the multimodal pipeline end-to-end") {
    import graft.multimodal.Multimodal
    val dir = java.nio.file.Files.createTempDirectory("bin").toString
    java.nio.file.Files.write(java.nio.file.Path.of(dir, "a.bin"), ("x" * 150).getBytes)
    java.nio.file.Files.write(java.nio.file.Path.of(dir, "skip.txt"), "nope".getBytes)
    val df = Connectors.readBinaryFiles(spark, dir, globFilter = Some("*.bin"))
    assert(df.count() == 1)
    val row = df.select("length", "content").head()
    assert(row.getLong(0) == 150)
    // chunk the ingested payload through the multimodal path
    val chunked = Multimodal.chunk(
      df.withColumnRenamed("content", "payload"), chunkSize = 64)
    assert(chunked.count() == 3) // 150 bytes -> 64 + 64 + 22
  }

  test("schema inference detects types from string data in one pass") {
    import spark.implicits._
    val df = Seq(
      ("1", "1.5", "true", "2024-01-02", "abc"),
      ("22", "2", "FALSE", "2024-02-03", "4"),
      (null, "-3.25", "true", null, "x")
    ).toDF("i", "d", "b", "dt", "s")
    val out = SchemaInference.inferTypes(df, Seq("i", "d", "b", "dt", "s"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("i" -> "BIGINT", "d" -> "DOUBLE", "b" -> "BOOLEAN",
      "dt" -> "DATE", "s" -> "STRING"))
  }

  test("suggestPartitionStrategy: time + categorical partition, high-card keys sort/z-order") {
    import spark.implicits._
    import java.sql.Timestamp
    // events-like: 20k rows over ~14 days, 4-value category, high-card ids
    val df = (1 to 20000).map { i =>
      (i.toLong, new Timestamp(1700000000000L + i.toLong * 60000), s"type${i % 4}",
        (i * 37 % 9999).toLong, i * 1.5)
    }.toDF("event_id", "ts", "event_type", "user_id", "value")
    // low target so the 20k-row fixture behaves like a big table
    val s = SchemaInference.suggestPartitionStrategy(df,
      predicateColumns = Seq("ts", "user_id"),
      targetRowsPerPartition = 2000, maxPartitions = 100)
    assert(s.partitionColumns.head == "ts")
    assert(s.partitionTransforms("ts") == "day") // 14 days ~ 10-partition target
    assert(s.partitionColumns.contains("event_type"),
      s"4-value categorical should co-partition: $s")
    assert(s.partitionTransforms("event_type") == "identity")
    assert(s.estimatedPartitionCount > 10 && s.estimatedPartitionCount <= 100)
    // the predicate-derived high-card key leads the sort, z-order kicks in
    assert(s.sortColumns.head == "user_id")
    assert(s.zOrderColumns.size == 2 && s.zOrderColumns.contains("user_id"))
    assert(s.reasoning.nonEmpty)

    // lookup use case: no time partitioning, key-led sort
    val lk = SchemaInference.suggestPartitionStrategy(df, useCase = "lookup",
      targetRowsPerPartition = 2000, maxPartitions = 100)
    assert(!lk.partitionColumns.contains("ts"))
    assert(lk.sortColumns.nonEmpty)

    // small dimension: nothing partitions safely
    val dim = (1 to 50).map(i => (i.toLong, s"name$i")).toDF("id", "name")
    val d = SchemaInference.suggestPartitionStrategy(dim)
    assert(d.partitionColumns.isEmpty && d.estimatedPartitionCount == 1)
    assert(d.reasoning.contains("unpartitioned"))
  }

  test("suggestPartitionStrategy composes with suggestIndexes predicates") {
    val ev = Tables.events(spark, sfDir)
    val qb = new graft.llm.QueryBuilder()
    qb.registerDataFrame("events", ev)
    val idx = qb.suggestIndexes(
      "SELECT * FROM events WHERE ts > '2026-01-01' AND user_id = 7", "events")
    val s = SchemaInference.suggestPartitionStrategy(ev,
      predicateColumns = idx.sortColumns, targetRowsPerPartition = 500)
    // the range-filtered time column partitions; the equality key is
    // used — as the co-partition column at sf0.001's ~100-user
    // cardinality, or as a sort key on a bigger id domain
    assert(s.partitionColumns.contains("ts"))
    assert(s.partitionColumns.contains("user_id") || s.sortColumns.contains("user_id"))
  }

  test("ddl rendering and rename suggestions") {
    val ddl = SchemaInference.renderDdl("gold.kpis",
      Seq("day" -> "DATE", "n" -> "BIGINT"), partitionBy = Seq("day"))
    assert(ddl.contains("CREATE TABLE gold.kpis") && ddl.contains("PARTITIONED BY (day)"))
    assert(SchemaInference.suggestRenames(Seq("OrderKey", "total-price", "ok")) ==
      Map("OrderKey" -> "order_key", "total-price" -> "total_price"))
  }

  test("document extraction: html/markdown/text decode, office formats error-tag") {
    import spark.implicits._
    import graft.multimodal.DocumentExtract
    val html =
      """<html><head><title> The  Title </title><style>p{color:red}</style>
        |<script>var x = "<b>not text</b>";</script></head>
        |<body><p>Hello &amp; welcome to the &lt;real&gt; world.</p></body></html>""".stripMargin
    val md = "# Heading\n\nSome *emphasis* and a [link](http://x.y) plus `code`.\n- item one\n> quoted"
    val docs = Seq(
      ("a/page.html", html),
      ("b/readme.md", md),
      ("c/notes.txt", "plain line one\nline two"),
      ("d/deck.pptx", "binary-ish"),
      ("e/file.xyz", "???")
    ).toDF("path", "content")
      .withColumn("payload", encode(col("content"), "UTF-8").cast("binary"))
    val out = DocumentExtract.extractDocuments(docs, "path", "payload")
      .select("path", "doc_format", "title", "text", "line_count", "error")
      .collect().map(r => r.getString(0) -> r).toMap

    assert(out("a/page.html").getString(1) == "html")
    assert(out("a/page.html").getString(2) == "The Title")
    // title text stays part of the body text — same as the reference's
    // soup.get_text(), which only decomposes script/style
    assert(out("a/page.html").getString(3) == "The Title Hello & welcome to the <real> world.",
      out("a/page.html").getString(3))
    assert(out("b/readme.md").getString(3) ==
      "Heading Some emphasis and a link plus code. item one quoted")
    assert(out("c/notes.txt").getLong(4) == 2)
    assert(out("d/deck.pptx").getString(5).contains("route through graft.multimodal.Office"))
    assert(out("d/deck.pptx").isNullAt(3))
    assert(out("e/file.xyz").getString(5) == "unsupported extension")
  }

  test("extracted document text feeds q97-q99 text analysis unchanged") {
    import spark.implicits._
    import graft.multimodal.DocumentExtract
    import graft.text.TextAnalysis
    val docs = Seq(
      ("en/page.html", "<html><body>The quick brown fox jumps over the lazy dog and the rest of the words follow in plain English prose.</body></html>"),
      ("misc/readme.md", "# Title\nthe and of to in is that it was for on are as with his they at"))
      .toDF("path", "content")
      .withColumn("payload", encode(col("content"), "UTF-8").cast("binary"))
    val analyzed = DocumentExtract.extractDocuments(docs, "path", "payload")
      .filter(col("text").isNotNull)
      .select(col("path"),
        TextAnalysis.languageId(col("text")).as("lang"),
        TextAnalysis.qualityMetrics(col("text")).as("q"),
        TextAnalysis.fingerprint(col("text")).as("fp"))
    val rows = analyzed.collect().map(r => r.getString(0) -> r).toMap
    assert(rows.size == 2)
    assert(rows("en/page.html").getString(1) == "en")
    rows.values.foreach { r =>
      assert(!r.isNullAt(2) && !r.isNullAt(3), "quality metrics + fingerprint must compute")
    }
  }

  test("batch extraction: N tables -> bronze, per-table report, one failure isolated") {
    import graft.extraction.BatchExtract
    import graft.medallion.Lakehouse
    val src = java.nio.file.Files.createTempDirectory("batchsrc").toString
    spark.range(100).selectExpr("id", "id * 2 AS v").write.parquet(s"$src/alpha")
    spark.range(40).selectExpr("id", "CAST(id AS STRING) AS s").write.parquet(s"$src/beta")
    // "gamma" is never written — its read must fail WITHOUT poisoning
    // alpha/beta (batch.py:220 extract_tables failure isolation)
    val tables = Seq("alpha", "beta", "gamma")
    val opts = tables.map(t => t -> s"$src/$t").toMap

    val loaded = BatchExtract.extractTables(spark, "parquet",
      tables.map(opts), tableKey = "path", maxParallel = 3)
    assert(loaded(opts("alpha")).toOption.get.count() == 100)
    assert(loaded(opts("beta")).toOption.get.columns.toSeq == Seq("id", "s"))
    assert(loaded(opts("gamma")).isLeft, "missing table must be a Left, not a crash")

    val root = java.nio.file.Files.createTempDirectory("batchlake").toString
    val lake = new Lakehouse(spark, root)
    // table names carry through to bronze, so pass names and rewrite
    // the path per table via a registered connector
    graft.sources.Registry.register("batchsrc_test",
      (s, o) => s.read.parquet(s"$src/${o("table")}"))
    val log = new graft.ops.Log.Emitter(clock = () => 0L)
    val report = BatchExtract.extractToLakehouse(spark, lake, "batchsrc_test",
      tables, source = "unit", batchId = "b1", ingestionTimeMs = 1700000000000L,
      maxParallel = 3, log = Some(log))
    assert(report.map(_.table) == tables, "report preserves input order")
    val byTable = report.map(r => r.table -> r).toMap
    assert(byTable("alpha").ok && byTable("alpha").rows == 100 &&
      byTable("alpha").version.contains(1))
    assert(byTable("beta").ok && byTable("beta").rows == 40)
    assert(byTable("alpha").durationMs > 0 && byTable("alpha").rowsPerSecond > 0)
    // pipeline.py:44 rows+bytes+files shape: parquet source → real
    // input bytes; committed bronze snapshot → real output bytes/files
    assert(byTable("alpha").bytesRead > 0, "parquet source must report input bytes")
    assert(byTable("alpha").bytesWritten > 0 && byTable("alpha").filesWritten > 0)
    assert(byTable("beta").bytesWritten > 0)
    assert(!byTable("gamma").ok && byTable("gamma").version.isEmpty &&
      byTable("gamma").rows == 0 && byTable("gamma").bytesWritten == 0)
    // structured extraction report events, in input order despite the
    // concurrent fan-out (utils/logging.py vocabulary)
    assert(log.history.map(e => (e.event, e.fields("table"))) == Seq(
      ("table_extracted", "alpha"), ("table_extracted", "beta"),
      ("table_failed", "gamma")))
    assert(log.history.head.fields("rows") == "100" &&
      log.history.head.fields("bytes_written").toLong > 0)
    // the two good tables really landed, stamped, one version each
    assert(lake.table("bronze", "alpha").count() == 100)
    assert(lake.table("bronze", "beta").columns.contains("_source"))
    assert(lake.listTables(Some("bronze"))("bronze").toSet == Set("alpha", "beta"))
    // lineage recorded under the concurrent fan-out (thread-safe tracker)
    assert(lake.tracker.graph.downstream("source:unit").toSet ==
      Set("bronze.alpha", "bronze.beta"))
    // duplicate table names would double-ingest silently: rejected
    intercept[IllegalArgumentException](BatchExtract.extractTables(
      spark, "parquet", Seq("x", "x"), tableKey = "path"))
  }

  test("rule-based NL->SQL fallback") {
    val cols = Seq("region", "revenue")
    assert(RuleBasedNl2Sql.toSql("how many orders by region", "orders", cols) ==
      "SELECT region, COUNT(*) AS n FROM orders GROUP BY region")
    assert(RuleBasedNl2Sql.toSql("average revenue by region", "orders", cols) ==
      "SELECT region, AVG(revenue) AS avg_revenue FROM orders GROUP BY region")
    assert(RuleBasedNl2Sql.toSql("show everything", "orders", cols) ==
      "SELECT * FROM orders")
  }
}
