package graft

import java.sql.DriverManager

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.sources.Jdbc
import graft.sources.Jdbc.{JdbcPartitioning, JdbcSource}

/** JDBC connector against an embedded Derby database (the one JDBC
  * engine shipped with Spark's jars): partitioned reads, filter/column
  * pushdown into the database, incremental extraction, write round-trip.
  */
class JdbcSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftjdbc;create=true"
  private val driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
  private lazy val src = JdbcSource(url, driver = Some(driver))

  private lazy val seeded: Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate("CREATE TABLE events (id BIGINT NOT NULL, kind VARCHAR(16), val DOUBLE)")
      val ps = conn.prepareStatement("INSERT INTO events VALUES (?, ?, ?)")
      (1 to 100).foreach { i =>
        ps.setLong(1, i.toLong); ps.setString(2, if (i % 2 == 0) "click" else "view")
        ps.setDouble(3, i * 1.5); ps.addBatch()
      }
      ps.executeBatch()
    } finally conn.close()
  }

  test("partitioned read fans out to numPartitions range queries") {
    seeded
    val df = Jdbc.read(spark, src, "events",
      Some(JdbcPartitioning("id", lowerBound = 1, upperBound = 101, numPartitions = 4)))
    assert(df.rdd.getNumPartitions == 4, "stride partitioning must produce 4 parallel reads")
    assert(df.count() == 100)
    // bounds steer splits only — out-of-range rows still arrive
    val all = Jdbc.read(spark, src, "events",
      Some(JdbcPartitioning("id", lowerBound = 40, upperBound = 60, numPartitions = 3)))
    assert(all.count() == 100, "rows outside [lower, upper) must not be dropped")
  }

  test("filters and column pruning push down into the database scan") {
    seeded
    val df = Jdbc.read(spark, src, "events")
      .filter(col("id") > 50 && col("kind") === "click")
      .select("id", "val")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan"),
      s"filter must reach the JDBC scan:\n$plan")
    assert(df.columns.toSeq == Seq("id", "val"))
    assert(df.count() == 25)
  }

  test("readPredicated makes one partition per predicate") {
    seeded
    val df = Jdbc.readPredicated(spark, src, "events",
      Seq("kind = 'click'", "kind = 'view'", "kind IS NULL"))
    assert(df.rdd.getNumPartitions == 3)
    assert(df.count() == 100)
  }

  test("readIncremental pushes the watermark filter into the database") {
    seeded
    val inc = Jdbc.readIncremental(spark, src, "events", "id", lastWatermark = Some(90L))
    assert(inc.count() == 10)
    val plan = inc.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan"),
      s"incremental bound must be pushed down:\n$plan")
    assert(Jdbc.readIncremental(spark, src, "events", "id", None).count() == 100)
  }

  test("write round-trip: append then overwrite") {
    seeded
    val out = spark.range(1, 11).select(col("id"), (col("id") * 2.0).as("doubled"))
    Jdbc.write(out, src, "copied", SaveMode.ErrorIfExists)
    assert(Jdbc.read(spark, src, "copied").count() == 10)
    Jdbc.write(out.filter(col("id") <= 3), src, "copied", SaveMode.Overwrite)
    assert(Jdbc.read(spark, src, "copied").count() == 3)
  }
}
