package graft

import org.apache.spark.sql.functions._

import graft.medallion.{Gold, Lakehouse, Silver}

/** The medallion facade end-to-end: ingest → silver → gold over
  * versioned layer storage, with lineage and SQL access. */
class LakehouseSpec extends SparkSpec {

  private def newHouse(): Lakehouse = new Lakehouse(
    spark, java.nio.file.Files.createTempDirectory("graft_lh").toString)

  test("full pipeline lands one committed version per layer; metadata stamped") {
    import spark.implicits._
    val lh = newHouse()
    val rows = Seq((1L, "a", 10.0), (2L, "b", 20.0), (2L, "b", 25.0), (3L, null, 30.0))
      .toDF("id", "cat", "amount")
    val (b, s, g) = lh.fullPipeline(
      table = "sales", data = rows, source = "unit", batchId = "batch-1",
      silverConfig = Silver.ProcessConfig(
        requiredColumns = Seq("cat"),
        dedupKeys = Seq("id"), dedupOrderKey = Some(col("amount"))),
      goldTable = "sales_by_cat", groupBy = Seq("cat"),
      aggs = Seq(Gold.Sum("amount", "total"), Gold.Count("id", "n")),
      nowMs = 1700000000000L)
    assert((b, s, g) == (1, 1, 1))
    val bronze = lh.table("bronze", "sales")
    assert(bronze.count() == 4 && bronze.columns.contains("_ingestion_time"))
    assert(bronze.select("_batch_id").distinct().collect().map(_.getString(0)).toSeq == Seq("batch-1"))
    // silver: null-cat row filtered, id=2 deduped keep-max-amount
    val silver = lh.table("silver", "sales")
    assert(silver.count() == 2)
    assert(silver.filter(col("id") === 2).select("amount").collect().head.getDouble(0) == 25.0)
    val gold = lh.table("gold", "sales_by_cat").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(gold == Map("a" -> 10.0, "b" -> 25.0))
  }

  test("layer commits emit data-modification audit events (logging.py log_data_event)") {
    import spark.implicits._
    val log = new graft.ops.Log.Emitter(clock = () => 42L)
    val lh = new Lakehouse(
      spark, java.nio.file.Files.createTempDirectory("graft_lh").toString, log = Some(log))
    lh.fullPipeline(
      table = "sales", data = Seq((1L, "a", 10.0)).toDF("id", "cat", "amount"),
      source = "unit", batchId = "b1",
      silverConfig = Silver.ProcessConfig(requiredColumns = Seq("cat")),
      goldTable = "by_cat", groupBy = Seq("cat"),
      aggs = Seq(Gold.Sum("amount", "total")), nowMs = 1700000000000L)
    assert(log.history.map(e => (e.event, e.fields("table"))) == Seq(
      ("data.ingest", "bronze.sales"),
      ("data.process_to_silver", "silver.sales"),
      ("data.aggregate_to_gold", "gold.by_cat")))
    assert(log.history.forall(_.fields("event_type") == "data_modification"))
    assert(log.history.head.fields("batch_id") == "b1" &&
      log.history.head.fields("version") == "1")
  }

  test("incremental batches version bronze; time travel reads each batch state") {
    import spark.implicits._
    val lh = newHouse()
    lh.ingest("events", Seq((1L, "x")).toDF("id", "v"), "s", "b1", 1000L)
    lh.ingest("events", Seq((2L, "y")).toDF("id", "v"), "s", "b2", 2000L)
    assert(lh.table("bronze", "events").count() == 2)
    assert(lh.table("bronze", "events", asOf = Some(1)).count() == 1)
    val info = lh.tableInfo("bronze", "events")
    assert(info.versions == Seq(1, 2) && info.currentVersion == 2)
    assert(info.columns.contains("_source_file"))
  }

  test("semi-structured ingest flattens nested structs at the bronze door") {
    import spark.implicits._
    val lh = newHouse()
    val nested = Seq((1L, ("alice", 30))).toDF("id", "user")
      .select(col("id"), col("user").cast("struct<name:string,age:int>"))
    lh.ingest("profiles", nested, "api", "b1", 1000L, flattenStructs = true)
    val cols = lh.table("bronze", "profiles").columns.toSeq
    assert(cols.contains("user_name") && cols.contains("user_age") && !cols.contains("user"))
  }

  test("sql spans layers; listTables reports committed tables only; lineage records hops") {
    import spark.implicits._
    val lh = newHouse()
    lh.fullPipeline("t", Seq((1L, "a", 5.0)).toDF("id", "cat", "amount"), "src", "b1",
      Silver.ProcessConfig(), "t_agg", Seq("cat"),
      Seq(Gold.Sum("amount", "total")), nowMs = 1000L)
    val joined = lh.sql(
      "SELECT s.cat, g.total FROM silver_t s JOIN gold_t_agg g ON s.cat = g.cat")
    assert(joined.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq == Seq(("a", 5.0)))
    assert(lh.listTables()("bronze") == Seq("t"))
    assert(lh.listTables(Some("gold")) == Map("gold" -> Seq("t_agg")))
    // blast radius of the bronze table covers both downstream layers
    assert(lh.tracker.graph.impactAnalysis("bronze.t").totalImpact.toSet ==
      Set("silver.t", "gold.t_agg"))
  }

  test("validation: bad layer, bad table name, absent table") {
    import spark.implicits._
    val lh = newHouse()
    intercept[IllegalArgumentException](lh.table("platinum", "t"))
    intercept[IllegalArgumentException](
      lh.ingest("../escape", Seq(1).toDF("a"), "s", "b", 0L))
    intercept[IllegalArgumentException](lh.table("bronze", "missing"))
  }
}
