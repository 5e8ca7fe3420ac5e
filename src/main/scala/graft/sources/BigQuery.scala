package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** BigQuery connector surface (ref connectors/databases/bigquery.py —
  * client/auth plumbing :30-87, dataset/table DDL :189-258, GCS
  * load/export jobs :331-412, query jobs :414-455, views :457-499,
  * BigQuery ML :501-526, dry-run costing :553-572).
  *
  * The spark-bigquery connector jar is absent here, so — the
  * [[Snowflake]]/[[Mongo]] stance — this object owns everything
  * decidable without GCP: the typed option map the `bigquery` source
  * takes, table-reference rendering, and deterministic Standard-SQL
  * DDL renderers for what the reference drives through the Python
  * client object model (partitioned/clustered CREATE TABLE,
  * materialized views, ML.PREDICT, INFORMATION_SCHEMA job history,
  * dry-run cost arithmetic). All pure and unit-tested (BigQuerySpec);
  * only [[read]]/[[readQuery]] touch the connector.
  *
  * Scale notes: the Spark connector reads via the Storage Read API
  * with predicate/projection pushdown (bigquery.py pulls full query
  * results through one cursor); `viewsEnabled` + a materialization
  * dataset let view reads spill through a temp table, exactly the
  * knobs surfaced here. GCS load/export become plain
  * `spark.read/write.parquet("gs://…")` on a cluster with the GCS
  * filesystem — see [[CloudStorage]] — so the job-config renderers
  * here cover only the BigQuery-side SQL half.
  */
object BigQuery {

  private val Ident = "^[A-Za-z_][A-Za-z0-9_$-]*$".r
  private def requireIdent(s: String, what: String): String = {
    require(Ident.matches(s), s"$what must be a BigQuery identifier, got '$s'")
    s
  }
  private def sqlString(s: String): String = "'" + s.replace("'", "''") + "'"

  final case class BigQuerySource(
      project: String,
      credentialsFile: Option[String] = None,
      /** Base64-encoded service-account JSON (the connector's
        * `credentials` option) — bigquery.py:66's in-memory dict path. */
      credentialsBase64: Option[String] = None,
      location: String = "US",
      dataset: Option[String] = None,
      /** Dataset for temp materialization of view/query reads. */
      materializationDataset: Option[String] = None,
      viewsEnabled: Boolean = false,
      extraOptions: Map[String, String] = Map.empty) {
    require(credentialsFile.isEmpty || credentialsBase64.isEmpty,
      "pass credentialsFile OR credentialsBase64, not both (bigquery.py:60-71)")

    /** Options for `spark.read.format("bigquery")` — pure, unit-tested. */
    def options: Map[String, String] =
      Map("parentProject" -> project) ++
        credentialsFile.map("credentialsFile" -> _) ++
        credentialsBase64.map("credentials" -> _) ++
        dataset.map("dataset" -> _) ++
        materializationDataset.map("materializationDataset" -> _) ++
        (if (viewsEnabled) Map("viewsEnabled" -> "true") else Map.empty) ++
        extraOptions
  }

  /** `project.dataset.table` (bigquery.py:176 table_ref), validated
    * per segment; `dataset` falls back to the source default. */
  def tableRef(src: BigQuerySource, table: String, dataset: Option[String] = None): String = {
    val ds = dataset.orElse(src.dataset).getOrElse(
      throw new IllegalArgumentException("no dataset: set BigQuerySource.dataset or pass one"))
    s"${requireIdent(src.project, "project")}.${requireIdent(ds, "dataset")}.${requireIdent(table, "table")}"
  }

  /** The live read; Storage-API pushdown carries `.select`/`.filter`
    * into the scan. */
  def read(spark: SparkSession, src: BigQuerySource, table: String,
      dataset: Option[String] = None): DataFrame =
    spark.read.format("bigquery").options(src.options)
      .option("table", tableRef(src, table, dataset)).load()

  /** BigQuery-side SQL (requires viewsEnabled + materialization
    * dataset on the real connector — enforced here so the failure is
    * local and immediate, not a remote job error). */
  def readQuery(spark: SparkSession, src: BigQuerySource, query: String): DataFrame = {
    require(src.viewsEnabled && src.materializationDataset.nonEmpty,
      "readQuery needs viewsEnabled=true and a materializationDataset")
    spark.read.format("bigquery").options(src.options).option("query", query).load()
  }

  // ---- DDL rendering (bigquery.py:207-258 create_table) ----

  final case class Field(name: String, fieldType: String, mode: String = "NULLABLE",
      description: Option[String] = None) {
    require(Set("NULLABLE", "REQUIRED", "REPEATED")(mode), s"bad mode $mode")
  }

  val PartitionTypes: Set[String] = Set("HOUR", "DAY", "MONTH", "YEAR") // bigquery.py:225

  /** bigquery.py:207 `create_table` rendered as Standard-SQL DDL (the
    * reference builds a client-object Table; the SQL form is what a
    * query-only surface can ship): column list with REPEATED→ARRAY and
    * REQUIRED→NOT NULL, `PARTITION BY` TIMESTAMP_TRUNC (or bare DATE
    * column), `CLUSTER BY`, OPTIONS(description). */
  def createTableSql(ref: String, schema: Seq[Field],
      partitionField: Option[String] = None, partitionType: String = "DAY",
      clusteringFields: Seq[String] = Nil, description: Option[String] = None): String = {
    require(schema.nonEmpty, "createTableSql needs at least one field")
    require(PartitionTypes(partitionType), s"partition type must be one of $PartitionTypes")
    val cols = schema.map { f =>
      requireIdent(f.name, "field")
      val typ = if (f.mode == "REPEATED") s"ARRAY<${f.fieldType}>" else f.fieldType
      val notNull = if (f.mode == "REQUIRED") " NOT NULL" else ""
      val opts = f.description.map(d => s" OPTIONS(description=${sqlString(d)})").getOrElse("")
      s"  ${f.name} $typ$notNull$opts"
    }.mkString(",\n")
    val partition = partitionField.map { f =>
      requireIdent(f, "partitionField")
      val fieldType = schema.find(_.name == f).map(_.fieldType).getOrElse("TIMESTAMP")
      if (fieldType == "DATE" && partitionType == "DAY") s"\nPARTITION BY $f"
      else if (fieldType == "DATE") s"\nPARTITION BY ${partitionType.toLowerCase match {
        case "month" => s"DATE_TRUNC($f, MONTH)"
        case "year"  => s"DATE_TRUNC($f, YEAR)"
        case other   => throw new IllegalArgumentException(s"DATE columns cannot partition by $other")
      }}"
      else s"\nPARTITION BY TIMESTAMP_TRUNC($f, $partitionType)"
    }.getOrElse("")
    val cluster =
      if (clusteringFields.isEmpty) ""
      else s"\nCLUSTER BY ${clusteringFields.map(requireIdent(_, "clusteringField")).mkString(", ")}"
    val opts = description.map(d => s"\nOPTIONS(description=${sqlString(d)})").getOrElse("")
    s"CREATE TABLE IF NOT EXISTS `$ref` (\n$cols\n)$partition$cluster$opts"
  }

  /** bigquery.py:478 `create_materialized_view`, rendered verbatim. */
  def createMaterializedViewSql(ref: String, query: String,
      enableRefresh: Boolean = true, refreshIntervalMinutes: Int = 60): String = {
    require(refreshIntervalMinutes > 0, "refresh interval must be positive minutes")
    s"""CREATE MATERIALIZED VIEW `$ref`
       |OPTIONS (
       |  enable_refresh = $enableRefresh,
       |  refresh_interval_minutes = $refreshIntervalMinutes
       |)
       |AS ${query.trim}""".stripMargin
  }

  /** bigquery.py:457 `create_view`. */
  def createViewSql(ref: String, query: String, description: Option[String] = None): String = {
    val opts = description.map(d => s"\nOPTIONS(description=${sqlString(d)})").getOrElse("")
    s"CREATE VIEW IF NOT EXISTS `$ref`$opts\nAS ${query.trim}"
  }

  // ---- BigQuery ML (bigquery.py:501-526) ----

  /** bigquery.py:521 `run_ml_model`'s predict SQL. */
  def mlPredictSql(modelRef: String, inputQuery: String): String =
    s"SELECT * FROM ML.PREDICT(MODEL `$modelRef`, (${inputQuery.trim}))"

  // ---- jobs & costing (bigquery.py:414-455, 528-572) ----

  val WriteDispositions: Set[String] = Set("WRITE_TRUNCATE", "WRITE_APPEND", "WRITE_EMPTY")

  /** bigquery.py:414 `run_query_job` options, as the SQL-job labels a
    * query-only surface can set: destination + disposition validated
    * here, rendered as the EXPORT/INSERT wrapper. */
  def insertIntoSql(destinationRef: String, query: String,
      writeDisposition: String = "WRITE_TRUNCATE"): String = {
    require(WriteDispositions(writeDisposition), s"bad write disposition $writeDisposition")
    writeDisposition match {
      case "WRITE_TRUNCATE" => s"CREATE OR REPLACE TABLE `$destinationRef` AS ${query.trim}"
      case "WRITE_APPEND"   => s"INSERT INTO `$destinationRef` ${query.trim}"
      case "WRITE_EMPTY" =>
        // fail-if-exists has no single-statement SQL form; the rendered
        // guard errors via zero-division iff the destination has rows
        s"INSERT INTO `$destinationRef` SELECT * FROM (${query.trim}) " +
          s"WHERE (SELECT 1/(1 - SIGN((SELECT COUNT(*) FROM `$destinationRef`)))) IS NOT NULL"
    }
  }

  /** bigquery.py:528 `get_job_history`, as the INFORMATION_SCHEMA.JOBS
    * query a SQL surface uses instead of client.list_jobs. */
  def jobHistorySql(projectId: String, region: String = "us",
      maxResults: Int = 100, state: Option[String] = None): String = {
    requireIdent(projectId, "projectId"); requireIdent(region, "region")
    require(maxResults > 0, "maxResults must be positive")
    val stateFilter = state.map(s => s"\nWHERE state = ${sqlString(s.toUpperCase)}").getOrElse("")
    s"""SELECT job_id, job_type, state, creation_time AS created, start_time AS started,
       |  end_time AS ended, user_email, total_bytes_processed AS bytes_processed
       |FROM `$projectId`.`region-$region`.INFORMATION_SCHEMA.JOBS$stateFilter
       |ORDER BY creation_time DESC
       |LIMIT $maxResults""".stripMargin
  }

  /** bigquery.py:553 `dry_run_query`'s cost arithmetic (on-demand
    * $5/TB, the reference's published constant), deterministic given
    * the byte estimate a dry-run job returns. */
  def estimateCostUsd(bytesProcessed: Long): BigDecimal = {
    require(bytesProcessed >= 0, "bytesProcessed must be non-negative")
    (BigDecimal(bytesProcessed) / BigDecimal(1024L * 1024 * 1024 * 1024) * 5)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP)
  }
}
