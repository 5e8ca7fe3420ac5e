package graft

import java.nio.file.Files

import graft.medallion.{Lakehouse, Silver}
import graft.sources.Catalog

/** Iceberg-style catalog facade over VersionedTable roots
  * (ref storage/iceberg/catalog.py). */
class CatalogSpec extends SparkSpec {

  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft-catalog").toString

  private def df = Seq((1L, "a"), (2L, "b")).toDF("id", "name")

  test("namespace create/exists/list/properties/drop, nested and dotted") {
    val c = new Catalog(spark, freshRoot())
    assert(!c.namespaceExists("analytics"))
    c.createNamespace("analytics", Map("owner" -> "data-eng", "retention" -> "90d"))
    c.createNamespace("analytics.daily")
    c.createNamespace("raw")
    assert(c.namespaceExists("analytics") && c.namespaceExists("analytics.daily"))
    assert(c.listNamespaces() == Seq("analytics", "analytics.daily", "raw"))
    assert(c.listNamespaces(Some("analytics")) == Seq("analytics.daily"))
    assert(c.namespaceProperties("analytics") ==
      Map("owner" -> "data-eng", "retention" -> "90d"))
    assert(c.namespaceProperties("raw").isEmpty)

    // non-empty refuses; empty child drops; missing is a no-op
    intercept[IllegalArgumentException](c.dropNamespace("analytics"))
    c.dropNamespace("analytics.daily")
    c.dropNamespace("analytics")
    c.dropNamespace("never_existed")
    assert(c.listNamespaces() == Seq("raw"))
  }

  test("table create/exists/load/list with snapshot isolation and time travel") {
    val c = new Catalog(spark, freshRoot())
    val v1 = c.createTable("analytics", "events", df)
    assert(v1 == 1 && c.tableExists("analytics", "events"))
    assert(!c.tableExists("analytics", "nope"))
    intercept[IllegalArgumentException](c.createTable("analytics", "events", df))

    // a second committed version; time travel reads the first
    graft.sources.VersionedTable.append(
      spark, c.tableInfo("analytics", "events").location, Seq((3L, "c")).toDF("id", "name"))
    assert(c.loadTable("analytics", "events").count() == 3)
    assert(c.loadTable("analytics", "events", asOf = Some(1)).count() == 2)

    val info = c.tableInfo("analytics", "events")
    assert(info.versions == Seq(1, 2) && info.currentVersion == 2)
    assert(info.columns == Seq("id" -> "bigint", "name" -> "string"))
    assert(c.listTables("analytics") == Seq("events"))
    assert(c.listTables("no_such_ns").isEmpty) // NoSuchNamespace → []
    // table dirs are not namespaces, version dirs are not tables
    assert(c.listNamespaces() == Seq("analytics"))
  }

  test("drop without purge archives data; purge deletes; rename moves across namespaces") {
    val c = new Catalog(spark, freshRoot())
    c.createTable("ns", "t", df)
    assert(c.dropTable("ns", "t")) // soft: archived
    assert(!c.tableExists("ns", "t") && c.listTables("ns").isEmpty)
    assert(!c.dropTable("ns", "t")) // missing → false, no throw

    c.createTable("ns", "t2", df)
    assert(c.dropTable("ns", "t2", purge = true))
    assert(!c.tableExists("ns", "t2"))

    c.createTable("ns", "src", df)
    c.renameTable("ns", "src", "other", "dst")
    assert(!c.tableExists("ns", "src") && c.tableExists("other", "dst"))
    assert(c.loadTable("other", "dst").count() == 2)
    intercept[IllegalArgumentException](c.renameTable("ns", "src", "other", "dst"))
  }

  test("a Lakehouse root is a catalog whose layers are namespaces (listTables parity)") {
    val root = freshRoot()
    val lh = new Lakehouse(spark, root)
    lh.ingest("orders", df, source = "unit", batchId = "b1", ingestionTimeMs = 0L)
    lh.processToSilver("orders", Silver.ProcessConfig(), processingTimeMs = 0L)

    val c = new Catalog(spark, root)
    assert(c.listTables("bronze") == lh.listTables(Some("bronze"))("bronze"))
    assert(c.listTables("silver") == lh.listTables(Some("silver"))("silver"))
    assert(c.tableExists("bronze", "orders"))
    assert(c.loadTable("silver", "orders").count() == lh.table("silver", "orders").count())
    // layers surface as namespaces without any explicit createNamespace
    assert(c.listNamespaces().toSet == Set("bronze", "silver"))
  }

  test("identifier validation rejects path-unsafe names") {
    val c = new Catalog(spark, freshRoot())
    intercept[IllegalArgumentException](c.createNamespace("bad-ns"))
    intercept[IllegalArgumentException](c.createNamespace("a..b"))
    intercept[IllegalArgumentException](c.createTable("ns", "../escape", df))
  }
}
