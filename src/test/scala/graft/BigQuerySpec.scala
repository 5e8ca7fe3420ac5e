package graft

import graft.sources.BigQuery
import graft.sources.BigQuery._

/** BigQuery dialect fixtures: option-map assembly, table-ref
  * rendering, and exact Standard-SQL DDL for the surfaces the
  * reference drives through the Python client object model (ref
  * connectors/databases/bigquery.py). */
class BigQuerySpec extends SparkSpec {

  private val src = BigQuerySource(
    project = "my-gcp-project",
    credentialsFile = Some("/secrets/sa.json"),
    location = "EU",
    dataset = Some("analytics"),
    materializationDataset = Some("tmp_mat"),
    viewsEnabled = true)

  test("options: credentialsFile flavor renders the connector surface") {
    assert(src.options === Map(
      "parentProject" -> "my-gcp-project",
      "credentialsFile" -> "/secrets/sa.json",
      "dataset" -> "analytics",
      "materializationDataset" -> "tmp_mat",
      "viewsEnabled" -> "true"))
  }

  test("options: base64 credentials are exclusive with the file path") {
    val b64 = BigQuerySource("p", credentialsBase64 = Some("eyJ0eXBlIjo…"))
    assert(b64.options("credentials") === "eyJ0eXBlIjo…")
    assert(!b64.options.contains("credentialsFile"))
    intercept[IllegalArgumentException](
      BigQuerySource("p", credentialsFile = Some("f"), credentialsBase64 = Some("b")))
  }

  test("tableRef: default dataset, explicit override, and validation") {
    assert(tableRef(src, "orders") === "my-gcp-project.analytics.orders")
    assert(tableRef(src, "orders", Some("staging")) === "my-gcp-project.staging.orders")
    intercept[IllegalArgumentException](tableRef(src.copy(dataset = None), "orders"))
    intercept[IllegalArgumentException](tableRef(src, "orders; DROP x"))
  }

  test("createTableSql: partitioned + clustered DDL with modes and descriptions") {
    val sql = createTableSql(
      "my-gcp-project.analytics.events",
      schema = Seq(
        Field("event_id", "STRING", mode = "REQUIRED"),
        Field("ts", "TIMESTAMP", mode = "REQUIRED"),
        Field("tags", "STRING", mode = "REPEATED"),
        Field("payload", "JSON", description = Some("raw event"))),
      partitionField = Some("ts"),
      partitionType = "DAY",
      clusteringFields = Seq("event_id"),
      description = Some("event stream"))
    assert(sql.startsWith("CREATE TABLE IF NOT EXISTS `my-gcp-project.analytics.events`"))
    assert(sql.contains("event_id STRING NOT NULL"))
    assert(sql.contains("tags ARRAY<STRING>"))
    assert(sql.contains("payload JSON OPTIONS(description='raw event')"))
    assert(sql.contains("PARTITION BY TIMESTAMP_TRUNC(ts, DAY)"))
    assert(sql.contains("CLUSTER BY event_id"))
    assert(sql.endsWith("OPTIONS(description='event stream')"))
  }

  test("createTableSql: DATE partition column uses the bare/DATE_TRUNC form") {
    val schema = Seq(Field("d", "DATE"), Field("v", "INT64"))
    assert(createTableSql("p.ds.t", schema, Some("d"), "DAY").contains("\nPARTITION BY d"))
    assert(createTableSql("p.ds.t", schema, Some("d"), "MONTH")
      .contains("PARTITION BY DATE_TRUNC(d, MONTH)"))
    intercept[IllegalArgumentException](createTableSql("p.ds.t", schema, Some("d"), "HOUR"))
    intercept[IllegalArgumentException](createTableSql("p.ds.t", schema, Some("d"), "WEEK"))
  }

  test("materialized view + plain view DDL") {
    val mv = createMaterializedViewSql("p.ds.daily_mv", "SELECT 1 AS x",
      enableRefresh = true, refreshIntervalMinutes = 30)
    assert(mv.contains("CREATE MATERIALIZED VIEW `p.ds.daily_mv`"))
    assert(mv.contains("enable_refresh = true"))
    assert(mv.contains("refresh_interval_minutes = 30"))
    assert(mv.endsWith("AS SELECT 1 AS x"))
    val v = createViewSql("p.ds.v1", "SELECT 2", description = Some("it's a view"))
    assert(v.contains("CREATE VIEW IF NOT EXISTS `p.ds.v1`"))
    assert(v.contains("description='it''s a view'"))
  }

  test("mlPredictSql wraps the input query in ML.PREDICT") {
    assert(mlPredictSql("p.ds.churn_model", "SELECT * FROM p.ds.features") ===
      "SELECT * FROM ML.PREDICT(MODEL `p.ds.churn_model`, (SELECT * FROM p.ds.features))")
  }

  test("insertIntoSql renders each write disposition distinctly") {
    assert(insertIntoSql("p.ds.out", "SELECT 1", "WRITE_TRUNCATE") ===
      "CREATE OR REPLACE TABLE `p.ds.out` AS SELECT 1")
    assert(insertIntoSql("p.ds.out", "SELECT 1", "WRITE_APPEND") ===
      "INSERT INTO `p.ds.out` SELECT 1")
    assert(insertIntoSql("p.ds.out", "SELECT 1", "WRITE_EMPTY").contains("SIGN"))
    intercept[IllegalArgumentException](insertIntoSql("p.ds.out", "SELECT 1", "OVERWRITE"))
  }

  test("jobHistorySql targets regional INFORMATION_SCHEMA with state filter") {
    val sql = jobHistorySql("my-gcp-project", region = "eu", maxResults = 50,
      state = Some("running"))
    assert(sql.contains("FROM `my-gcp-project`.`region-eu`.INFORMATION_SCHEMA.JOBS"))
    assert(sql.contains("WHERE state = 'RUNNING'"))
    assert(sql.endsWith("LIMIT 50"))
  }

  test("estimateCostUsd applies on-demand $5/TB with 4-digit rounding") {
    assert(estimateCostUsd(0L) === BigDecimal("0.0000"))
    assert(estimateCostUsd(1024L * 1024 * 1024 * 1024) === BigDecimal("5.0000"))
    assert(estimateCostUsd(512L * 1024 * 1024 * 1024) === BigDecimal("2.5000"))
  }

  test("readQuery demands materialization knobs before touching the connector") {
    intercept[IllegalArgumentException](
      BigQuery.readQuery(spark, src.copy(viewsEnabled = false), "SELECT 1"))
    // with knobs set, the failure is unknown-source resolution (no jar
    // here) — option assembly is the only code between caller and read
    val e = intercept[Exception](BigQuery.readQuery(spark, src, "SELECT 1"))
    assert(e.getMessage.toLowerCase.contains("bigquery"))
  }
}
