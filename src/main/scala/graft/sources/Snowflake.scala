package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snowflake warehouse connector surface (ref
  * connectors/databases/snowflake.py — auth/warehouse/role option
  * plumbing :29-111, time travel :223-253, streams+MERGE :255-326,
  * COPY INTO / unload :328-394, tasks :396-425, query history
  * :427-460, zero-copy clone :462-482).
  *
  * The spark-snowflake connector jar is absent here, so — the
  * [[Mongo]]/[[ApiConnectors]] stance — this object owns everything
  * decidable without a server: the typed option map the
  * `net.snowflake.spark.snowflake` source takes (auth is a sealed
  * trait, not a pile of nullable strings), and deterministic SQL
  * renderers for the warehouse-side DDL the reference drives through
  * its cursor (streams, MERGE, COPY INTO, tasks, clones, time
  * travel). Rendering is pure and unit-tested (SnowflakeSpec); only
  * [[read]]/[[readQuery]] touch the connector.
  *
  * Where the reference pulls full cursors and filters in Polars, the
  * Spark connector pushes projection and filters into the warehouse —
  * `.select`/`.filter` on the returned frame reach the Snowflake query
  * (and [[readQuery]] ships arbitrary SQL for warehouse-side joins),
  * so a 100 TB table never leaves the warehouse un-pruned.
  */
object Snowflake {

  /** Unquoted Snowflake identifier (letters, digits, _, $; qualified
    * with dots). Everything interpolated into rendered SQL must pass,
    * so a rendered statement can't smuggle clauses. */
  private val Ident = "^[A-Za-z_][A-Za-z0-9_$]*(\\.[A-Za-z_][A-Za-z0-9_$]*)*$".r

  private def requireIdent(s: String, what: String): String = {
    require(Ident.matches(s), s"$what must be a Snowflake identifier, got '$s'")
    s
  }

  /** Escape a SQL string literal (single quotes doubled). */
  private def sqlString(s: String): String = "'" + s.replace("'", "''") + "'"

  // ---- auth (snowflake.py:29-67: password / key pair / authenticator) ----

  sealed trait Auth { def user: String }
  /** snowflake.py:83-84. */
  final case class Password(user: String, password: String) extends Auth
  /** snowflake.py:85-88 — the PEM content, not a path: executors have
    * no shared filesystem, option values travel with the job. */
  final case class KeyPair(user: String, privateKeyPem: String, passphrase: Option[String] = None)
      extends Auth
  /** snowflake.py:90-91 — 'externalbrowser', 'oauth', 'snowflake'. */
  final case class Authenticator(user: String, method: String, token: Option[String] = None)
      extends Auth

  final case class SnowflakeSource(
      account: String,
      auth: Auth,
      database: Option[String] = None,
      schema: Option[String] = None,
      warehouse: Option[String] = None,
      role: Option[String] = None,
      extraOptions: Map[String, String] = Map.empty) {

    /** Options for `spark.read.format("snowflake")` (spark-snowflake's
      * documented sf* surface), assembled exactly as
      * snowflake.py:74-104 builds connect_params — pure, unit-tested. */
    def options: Map[String, String] = {
      val authOpts: Map[String, String] = auth match {
        case Password(u, p) => Map("sfUser" -> u, "sfPassword" -> p)
        case KeyPair(u, pem, pass) =>
          Map("sfUser" -> u, "pem_private_key" -> pem) ++
            pass.map("private_key_file_pwd" -> _)
        case Authenticator(u, m, tok) =>
          Map("sfUser" -> u, "sfAuthenticator" -> m) ++ tok.map("sfToken" -> _)
      }
      Map("sfUrl" -> s"$account.snowflakecomputing.com") ++
        authOpts ++
        database.map("sfDatabase" -> _) ++
        schema.map("sfSchema" -> _) ++
        warehouse.map("sfWarehouse" -> _) ++
        role.map("sfRole" -> _) ++
        extraOptions
    }
  }

  /** The live read: the only lines that need the connector jar.
    * Column pruning and filter pushdown reach the warehouse query. */
  def read(spark: SparkSession, src: SnowflakeSource, table: String): DataFrame =
    spark.read.format("snowflake").options(src.options).option("dbtable", table).load()

  /** Warehouse-side SQL (joins/aggregates run IN Snowflake; only the
    * result crosses the wire — the scale answer for wide pre-joins). */
  def readQuery(spark: SparkSession, src: SnowflakeSource, query: String): DataFrame =
    spark.read.format("snowflake").options(src.options).option("query", query).load()

  // ---- time travel (snowflake.py:223-253) ----

  sealed trait TimeTravel
  /** 'YYYY-MM-DD HH:MM:SS' (snowflake.py:242-245). */
  final case class AtTimestamp(ts: String) extends TimeTravel
  final case class AtOffset(secondsAgo: Long) extends TimeTravel {
    require(secondsAgo > 0, s"offset must be positive seconds in the past, got $secondsAgo")
  }
  final case class AtStatement(queryId: String) extends TimeTravel

  /** snowflake.py:223 `query_with_time_travel` rendered: SELECT with
    * the AT(...) clause. Feed to [[readQuery]]. */
  def timeTravelSql(table: String, at: Option[TimeTravel]): String = {
    requireIdent(table, "table")
    val clause = at match {
      case Some(AtTimestamp(ts)) => s" AT(TIMESTAMP => ${sqlString(ts)}::TIMESTAMP)"
      case Some(AtOffset(s))     => s" AT(OFFSET => -$s)"
      case Some(AtStatement(id)) => s" AT(STATEMENT => ${sqlString(id)})"
      case None                  => ""
    }
    s"SELECT * FROM $table$clause"
  }

  // ---- streams + CDC merge (snowflake.py:255-326) ----

  /** snowflake.py:255 `create_stream`. */
  def createStreamSql(streamName: String, sourceTable: String, appendOnly: Boolean = false): String = {
    requireIdent(streamName, "streamName"); requireIdent(sourceTable, "sourceTable")
    val mode = if (appendOnly) " APPEND_ONLY = TRUE" else ""
    s"CREATE OR REPLACE STREAM $streamName ON TABLE $sourceTable$mode"
  }

  /** snowflake.py:285 `consume_stream` rendered: MERGE matching on
    * `mergeKeys`, driven by the stream's METADATA$ACTION /
    * METADATA$ISUPDATE columns. `columns` is the full data column list
    * (metadata columns excluded, snowflake.py:308). The relational
    * equivalent on this engine is [[graft.queries]] q71_cdc_apply;
    * this renderer is for pushing the merge INTO Snowflake. */
  def mergeStreamSql(targetTable: String, streamName: String,
      mergeKeys: Seq[String], columns: Seq[String]): String = {
    requireIdent(targetTable, "targetTable"); requireIdent(streamName, "streamName")
    require(mergeKeys.nonEmpty, "mergeStreamSql needs at least one merge key")
    (mergeKeys ++ columns).foreach(requireIdent(_, "column"))
    require(mergeKeys.forall(columns.contains), "mergeKeys must be a subset of columns")
    val keyCond = mergeKeys.map(k => s"t.$k = s.$k").mkString(" AND ")
    val updateCols = columns.filterNot(mergeKeys.contains)
    val setList = updateCols.map(c => s"t.$c = s.$c").mkString(", ")
    s"""MERGE INTO $targetTable t
       |USING $streamName s
       |ON $keyCond
       |WHEN MATCHED AND s.METADATA$$ACTION = 'DELETE' THEN DELETE
       |WHEN MATCHED AND s.METADATA$$ACTION = 'INSERT' THEN UPDATE SET $setList
       |WHEN NOT MATCHED AND s.METADATA$$ACTION = 'INSERT' THEN INSERT
       |  (${columns.mkString(", ")})
       |  VALUES (${columns.map(c => s"s.$c").mkString(", ")})""".stripMargin
  }

  // ---- bulk load / unload (snowflake.py:328-394) ----

  /** snowflake.py:328 `copy_into_table`. `stage` keeps its leading
    * `@`; `options` render as KEY=VALUE pairs in sorted-key order so
    * the output is deterministic for a given map. */
  def copyIntoSql(table: String, stage: String, fileFormat: Option[String] = None,
      pattern: Option[String] = None, options: Map[String, String] = Map.empty): String = {
    requireIdent(table, "table")
    require(stage.startsWith("@"), s"stage must start with '@', got '$stage'")
    val parts = Seq(s"COPY INTO $table FROM $stage") ++
      fileFormat.map(f => s"FILE_FORMAT = ($f)") ++
      pattern.map(p => s"PATTERN = ${sqlString(p)}") ++
      options.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }
    parts.mkString(" ")
  }

  /** snowflake.py:363 `unload_to_stage`: COPY INTO @stage FROM (query). */
  def unloadSql(query: String, stage: String, fileFormat: Option[String] = None,
      single: Boolean = false, overwrite: Boolean = true): String = {
    require(stage.startsWith("@"), s"stage must start with '@', got '$stage'")
    val parts = Seq(s"COPY INTO $stage FROM ($query)") ++
      fileFormat.map(f => s"FILE_FORMAT = ($f)") ++
      (if (single) Seq("SINGLE = TRUE") else Nil) ++
      (if (overwrite) Seq("OVERWRITE = TRUE") else Nil)
    parts.mkString(" ")
  }

  // ---- scheduled tasks (snowflake.py:396-425) ----

  /** snowflake.py:396 `create_task` (+ the RESUME the reference issues
    * when enabled). Pair with [[graft.orchestration.Schedule]] when the
    * schedule should run on THIS engine instead of in the warehouse. */
  def createTaskSql(taskName: String, warehouse: String, schedule: String, sql: String): Seq[String] = {
    requireIdent(taskName, "taskName"); requireIdent(warehouse, "warehouse")
    Seq(
      s"""CREATE OR REPLACE TASK $taskName
         |WAREHOUSE = $warehouse
         |SCHEDULE = ${sqlString(schedule)}
         |AS
         |$sql""".stripMargin,
      s"ALTER TASK $taskName RESUME")
  }

  // ---- zero-copy clone (snowflake.py:462-482) ----

  def cloneTableSql(sourceTable: String, targetTable: String,
      atTimestamp: Option[String] = None): String = {
    requireIdent(sourceTable, "sourceTable"); requireIdent(targetTable, "targetTable")
    val at = atTimestamp.map(ts => s" AT(TIMESTAMP => ${sqlString(ts)}::TIMESTAMP)").getOrElse("")
    s"CREATE OR REPLACE TABLE $targetTable CLONE $sourceTable$at"
  }

  // ---- observability (snowflake.py:427-460) ----

  /** snowflake.py:427 `get_query_history`: INFORMATION_SCHEMA query,
    * filters AND-composed in the reference's order. Feed to
    * [[readQuery]] and the result lands as a DataFrame for the
    * profiling/validation machinery. */
  def queryHistorySql(user: Option[String] = None, warehouse: Option[String] = None,
      hours: Int = 24): String = {
    require(hours > 0, s"hours must be positive, got $hours")
    val filters = Seq(s"START_TIME >= DATEADD(hour, -$hours, CURRENT_TIMESTAMP())") ++
      user.map(u => s"USER_NAME = ${sqlString(u)}") ++
      warehouse.map(w => s"WAREHOUSE_NAME = ${sqlString(w)}")
    s"""SELECT QUERY_ID, QUERY_TEXT, USER_NAME, WAREHOUSE_NAME, DATABASE_NAME,
       |  SCHEMA_NAME, QUERY_TYPE, EXECUTION_STATUS, START_TIME, END_TIME,
       |  TOTAL_ELAPSED_TIME, BYTES_SCANNED, ROWS_PRODUCED
       |FROM TABLE(INFORMATION_SCHEMA.QUERY_HISTORY())
       |WHERE ${filters.mkString(" AND ")}
       |ORDER BY START_TIME DESC""".stripMargin
  }
}
