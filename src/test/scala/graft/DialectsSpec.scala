package graft

import java.sql.DriverManager

import org.apache.spark.sql.functions._

import graft.sources.{Dialects, Jdbc, Registry}
import graft.sources.Dialects.{MySql, PostgreSql}
import graft.sources.Jdbc.JdbcSource

/** PostgreSQL/MySQL dialect surfaces: connection-string assembly with
  * the SSL/charset parameters, upsert rendering (ON CONFLICT / ON
  * DUPLICATE KEY), registry wiring — and the distributed
  * Jdbc.executeBatch the upsert SQL feeds, run for real against
  * embedded Derby (via Derby's MERGE, the same bind-per-row shape). */
class DialectsSpec extends SparkSpec {

  import spark.implicits._

  test("postgres source: url carries sslmode + schema; bad sslMode rejected") {
    val src = PostgreSql.Source("db.host", "etl", "u", "pw", sslMode = "verify-full")
    assert(src.url == "jdbc:postgresql://db.host:5432/etl?sslmode=verify-full&currentSchema=public")
    assert(src.jdbcSource == JdbcSource(src.url, Some("org.postgresql.Driver"),
      Some("u"), Some("pw")))
    intercept[IllegalArgumentException](PostgreSql.Source("h", "d", "u", "p", sslMode = "yes"))
  }

  test("mysql source: url carries charset + sslMode; bad sslMode rejected") {
    val src = MySql.Source("db.host", "etl", "u", "pw", charset = "latin1", sslMode = "REQUIRED")
    assert(src.url == "jdbc:mysql://db.host:3306/etl?characterEncoding=latin1&sslMode=REQUIRED")
    assert(src.jdbcSource.driver.contains("com.mysql.cj.jdbc.Driver"))
    intercept[IllegalArgumentException](MySql.Source("h", "d", "u", "p", sslMode = "prefer"))
  }

  test("postgres upsert rendering: EXCLUDED updates, DO NOTHING, identifier guard") {
    assert(PostgreSql.upsertSql("t", Seq("id", "a", "b"), Seq("id")) ==
      "INSERT INTO t (id, a, b) VALUES (?, ?, ?) " +
        "ON CONFLICT (id) DO UPDATE SET a = EXCLUDED.a, b = EXCLUDED.b")
    assert(PostgreSql.upsertSql("s.t", Seq("id", "a"), Seq("id"), doNothing = true) ==
      "INSERT INTO s.t (id, a) VALUES (?, ?) ON CONFLICT (id) DO NOTHING")
    // every column a key → nothing to update → DO NOTHING
    assert(PostgreSql.upsertSql("t", Seq("id"), Seq("id")).endsWith("DO NOTHING"))
    intercept[IllegalArgumentException](
      PostgreSql.upsertSql("t; DROP TABLE x", Seq("id"), Seq("id")))
    intercept[IllegalArgumentException](
      PostgreSql.upsertSql("t", Seq("id", "a=1--"), Seq("id")))
    intercept[IllegalArgumentException](PostgreSql.upsertSql("t", Seq("a"), Seq("id")))
  }

  test("mysql upsert rendering: VALUES() updates; all-key rejected") {
    assert(MySql.upsertSql("t", Seq("id", "a", "b"), Seq("id")) ==
      "INSERT INTO t (id, a, b) VALUES (?, ?, ?) " +
        "ON DUPLICATE KEY UPDATE a = VALUES(a), b = VALUES(b)")
    intercept[IllegalArgumentException](MySql.upsertSql("t", Seq("id"), Seq("id")))
  }

  test("incremental extraction sql mirrors the reference's rendered query") {
    assert(PostgreSql.incrementalSql("public.ev", "updated_at", Some("2026-01-01")) ==
      "SELECT * FROM public.ev WHERE updated_at > '2026-01-01' ORDER BY updated_at")
    assert(MySql.incrementalSql("ev", "id", None) == "SELECT * FROM ev ORDER BY id")
    // literal quoting cannot smuggle a second clause
    assert(PostgreSql.incrementalSql("ev", "ts", Some("x' OR '1'='1"))
      .contains("'x'' OR ''1''=''1'"))
  }

  test("registry: dialect names take typed configs, raw url falls back to generic jdbc") {
    assert(Seq("postgresql", "postgres", "mysql").forall(Registry.listConnectors.contains))
    // typed path validates before any connection attempt
    intercept[IllegalArgumentException](Registry.load("postgres", spark,
      Map("host" -> "h", "database" -> "d", "user" -> "u", "password" -> "p",
        "table" -> "t", "sslMode" -> "bogus")))
    // url fallback reaches the generic surface (live against Derby)
    val url = "jdbc:derby:memory:graftdialects;create=true"
    val conn = DriverManager.getConnection(url)
    try {
      conn.createStatement().executeUpdate(
        "CREATE TABLE reg_t (id BIGINT NOT NULL PRIMARY KEY, v VARCHAR(8))")
      val ps = conn.prepareStatement("INSERT INTO reg_t VALUES (?, ?)")
      ps.setLong(1, 1L); ps.setString(2, "a"); ps.executeUpdate()
    } finally conn.close()
    val df = Registry.load("mysql", spark, Map("url" -> url, "table" -> "reg_t"))
    assert(df.count() == 1)
  }

  test("executeBatch: distributed rendered-DML upsert against Derby (MERGE)") {
    val url = "jdbc:derby:memory:graftupsert;create=true"
    val src = JdbcSource(url)
    val conn = DriverManager.getConnection(url)
    try {
      conn.createStatement().executeUpdate(
        "CREATE TABLE kv (id BIGINT NOT NULL PRIMARY KEY, v VARCHAR(16))")
      val ps = conn.prepareStatement("INSERT INTO kv VALUES (?, ?)")
      Seq(1L -> "old1", 2L -> "old2").foreach { case (i, v) =>
        ps.setLong(1, i); ps.setString(2, v); ps.addBatch()
      }
      ps.executeBatch()
    } finally conn.close()
    // updates ids 1-2, inserts 3-4 — Derby's MERGE has the same
    // bind-one-row-per-statement shape as the pg/mysql upserts
    val upsert =
      """MERGE INTO kv USING SYSIBM.SYSDUMMY1 ON kv.id = ?
         WHEN MATCHED THEN UPDATE SET v = ?
         WHEN NOT MATCHED THEN INSERT (id, v) VALUES (?, ?)"""
    val batch = Seq((1L, "new1"), (3L, "new3"), (4L, "new4")).toDF("id", "v")
      .select(col("id"), col("v"), col("id").as("id2"), col("v").as("v2"))
      .repartition(2) // prove the per-partition fan-out
    Jdbc.executeBatch(batch, src, upsert, Seq("id", "v", "id2", "v2"), batchSize = 2)
    val after = Jdbc.read(spark, src, "kv").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(after == Map(1L -> "new1", 2L -> "old2", 3L -> "new3", 4L -> "new4"))
  }

  test("executeBatch: a partition failing mid-stream rolls back its earlier chunks") {
    val url = "jdbc:derby:memory:graftrollback;create=true"
    val src = JdbcSource(url)
    val conn = DriverManager.getConnection(url)
    try conn.createStatement().executeUpdate(
      "CREATE TABLE tx (id BIGINT NOT NULL PRIMARY KEY, v VARCHAR(8))")
    finally conn.close()
    // plain (non-idempotent) INSERT, batchSize = 1 so each row is its
    // own chunk: the duplicate key fails AFTER earlier chunks executed.
    // Partition-level transaction must leave the table EMPTY — under
    // autocommit the pre-failure rows would persist and a task retry
    // would duplicate them.
    val batch = Seq((10L, "a"), (11L, "b"), (11L, "dup")).toDF("id", "v").coalesce(1)
    intercept[org.apache.spark.SparkException](
      Jdbc.executeBatch(batch, src, "INSERT INTO tx VALUES (?, ?)", Seq("id", "v"), batchSize = 1))
    assert(Jdbc.read(spark, src, "tx").count() == 0,
      "failed partition must roll back every chunk it executed")
  }
}
