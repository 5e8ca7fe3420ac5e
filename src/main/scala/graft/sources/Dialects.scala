package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** PostgreSQL / MySQL dialect surfaces (ref
  * connectors/databases/postgresql.py, mysql.py), in the
  * [[Snowflake]]/[[BigQuery]] stance: typed configs that compile to the
  * option maps the generic [[Jdbc]] reader takes (connection-string
  * assembly mirrors `_get_connection_string` — postgresql.py:48,
  * mysql.py:47 — including the SSL/charset query parameters), plus
  * deterministic SQL renderers for the statements the reference drives
  * through its SQLAlchemy cursor. Rendering is pure and unit-tested
  * (DialectsSpec); only the read/write paths touch a server.
  *
  * The dialect-specific piece the generic JDBC surface cannot express
  * is UPSERT: PostgreSQL renders `ON CONFLICT (keys) DO UPDATE SET c =
  * EXCLUDED.c`, MySQL `ON DUPLICATE KEY UPDATE c = VALUES(c)`. Both
  * renderers emit placeholders ONLY for the insert tuple — the update
  * clauses reference the rejected row (EXCLUDED / VALUES()) — so one
  * rendered statement binds one row of `columns` in order, which is
  * exactly what [[Jdbc.executeBatch]] streams per partition.
  */
object Dialects {

  /** Unquoted SQL identifier (optionally dot-qualified). Everything
    * interpolated into rendered SQL must pass — same anti-smuggling
    * guard as [[Snowflake]]. */
  private val Ident = "^[A-Za-z_][A-Za-z0-9_$]*(\\.[A-Za-z_][A-Za-z0-9_$]*)*$".r

  private def requireIdent(s: String, what: String): String = {
    require(Ident.matches(s), s"$what must be a SQL identifier, got '$s'")
    s
  }

  private def sqlString(s: String): String = "'" + s.replace("'", "''") + "'"

  /** Shared upsert scaffolding: `INSERT INTO t (cols) VALUES (?…)` +
    * a dialect conflict clause. */
  private def insertSql(table: String, columns: Seq[String]): String = {
    requireIdent(table, "table")
    require(columns.nonEmpty, "upsert needs at least one column")
    columns.foreach(requireIdent(_, "column"))
    s"INSERT INTO $table (${columns.mkString(", ")}) " +
      s"VALUES (${columns.map(_ => "?").mkString(", ")})"
  }

  // ---- PostgreSQL (ref connectors/databases/postgresql.py) ----

  object PostgreSql {

    /** libpq sslmode domain (postgresql.py:32 `ssl_mode`). */
    val SslModes: Set[String] =
      Set("disable", "allow", "prefer", "require", "verify-ca", "verify-full")

    /** postgresql.py:23 PostgreSQLConfig. The schema rides the JDBC
      * url as currentSchema, so unqualified table names resolve the
      * way the reference's `schema_prefix` makes them. */
    final case class Source(
        host: String,
        database: String,
        user: String,
        password: String,
        port: Int = 5432,
        schema: String = "public",
        sslMode: String = "prefer",
        extraOptions: Map[String, String] = Map.empty) {
      require(SslModes.contains(sslMode),
        s"sslMode must be one of ${SslModes.toSeq.sorted.mkString(", ")}, got '$sslMode'")

      /** postgresql.py:48 `_get_connection_string`, JDBC form. */
      def url: String =
        s"jdbc:postgresql://$host:$port/$database?sslmode=$sslMode&currentSchema=$schema"

      def jdbcSource: Jdbc.JdbcSource = Jdbc.JdbcSource(
        url = url,
        driver = Some("org.postgresql.Driver"),
        user = Some(user),
        password = Some(password),
        extraOptions = extraOptions)
    }

    def read(
        spark: SparkSession, src: Source, table: String,
        partitioning: Option[Jdbc.JdbcPartitioning] = None): DataFrame =
      Jdbc.read(spark, src.jdbcSource, table, partitioning)

    /** postgresql.py: upsert via `ON CONFLICT (keys) DO UPDATE SET c =
      * EXCLUDED.c` over the non-key columns (`DO NOTHING` when nothing
      * remains to update or `doNothing` is set). */
    def upsertSql(
        table: String, columns: Seq[String], keyColumns: Seq[String],
        doNothing: Boolean = false): String = {
      require(keyColumns.nonEmpty, "upsert needs at least one key column")
      require(keyColumns.forall(columns.contains),
        s"key columns ${keyColumns.filterNot(columns.contains).mkString(", ")} not in columns")
      keyColumns.foreach(requireIdent(_, "key column"))
      val updates = columns.filterNot(keyColumns.contains)
      val action =
        if (doNothing || updates.isEmpty) "DO NOTHING"
        else "DO UPDATE SET " + updates.map(c => s"$c = EXCLUDED.$c").mkString(", ")
      s"${insertSql(table, columns)} ON CONFLICT (${keyColumns.mkString(", ")}) $action"
    }

    /** postgresql.py:153 `extract_incremental`'s rendered query:
      * watermark predicate + ORDER BY. Feed to [[Jdbc.read]] as a
      * subquery, or prefer [[Jdbc.readIncremental]] which pushes the
      * same predicate without the ORDER BY (a server-side sort of a
      * 100 TB table buys nothing Spark needs). */
    def incrementalSql(
        table: String, watermarkColumn: String,
        lastWatermark: Option[String]): String = {
      requireIdent(table, "table")
      requireIdent(watermarkColumn, "watermark column")
      val where = lastWatermark.map(w => s" WHERE $watermarkColumn > ${sqlString(w)}").getOrElse("")
      s"SELECT * FROM $table$where ORDER BY $watermarkColumn"
    }
  }

  // ---- MySQL (ref connectors/databases/mysql.py) ----

  object MySql {

    /** Connector/J sslMode domain (the JDBC spelling of the SSL
      * surface the reference leaves to PyMySQL defaults). */
    val SslModes: Set[String] =
      Set("DISABLED", "PREFERRED", "REQUIRED", "VERIFY_CA", "VERIFY_IDENTITY")

    /** mysql.py:23 MySQLConfig (charset rides the url, as in
      * `_get_connection_string`). */
    final case class Source(
        host: String,
        database: String,
        user: String,
        password: String,
        port: Int = 3306,
        charset: String = "utf8mb4",
        sslMode: String = "PREFERRED",
        extraOptions: Map[String, String] = Map.empty) {
      require(SslModes.contains(sslMode),
        s"sslMode must be one of ${SslModes.toSeq.sorted.mkString(", ")}, got '$sslMode'")

      /** mysql.py:47 `_get_connection_string`, JDBC form. */
      def url: String =
        s"jdbc:mysql://$host:$port/$database?characterEncoding=$charset&sslMode=$sslMode"

      def jdbcSource: Jdbc.JdbcSource = Jdbc.JdbcSource(
        url = url,
        driver = Some("com.mysql.cj.jdbc.Driver"),
        user = Some(user),
        password = Some(password),
        extraOptions = extraOptions)
    }

    def read(
        spark: SparkSession, src: Source, table: String,
        partitioning: Option[Jdbc.JdbcPartitioning] = None): DataFrame =
      Jdbc.read(spark, src.jdbcSource, table, partitioning)

    /** MySQL upsert: `ON DUPLICATE KEY UPDATE c = VALUES(c)` over the
      * non-key columns. The key is whatever UNIQUE/PRIMARY index the
      * table declares — MySQL has no column list in the clause, so
      * `keyColumns` only picks which columns NOT to update. */
    def upsertSql(table: String, columns: Seq[String], keyColumns: Seq[String]): String = {
      require(keyColumns.nonEmpty, "upsert needs at least one key column")
      require(keyColumns.forall(columns.contains),
        s"key columns ${keyColumns.filterNot(columns.contains).mkString(", ")} not in columns")
      val updates = columns.filterNot(keyColumns.contains)
      require(updates.nonEmpty,
        "all columns are key columns — use INSERT IGNORE semantics explicitly instead")
      s"${insertSql(table, columns)} ON DUPLICATE KEY UPDATE " +
        updates.map(c => s"$c = VALUES($c)").mkString(", ")
    }

    /** mysql.py:149 `extract_incremental`'s rendered query. */
    def incrementalSql(
        table: String, watermarkColumn: String,
        lastWatermark: Option[String]): String =
      PostgreSql.incrementalSql(table, watermarkColumn, lastWatermark)
  }
}
