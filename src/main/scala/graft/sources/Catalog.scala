package graft.sources

import scala.util.Using

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Iceberg-style catalog facade over [[VersionedTable]] roots
  * (ref storage/iceberg/catalog.py:23 `IcebergCatalog`).
  *
  * The reference wraps pyiceberg's catalog: namespaces,
  * list/exists/drop, load_table, rename, snapshots. Here the SAME
  * surface closes over the library's own table format — a namespace is
  * a directory level (dot-separated name → nested directories), a
  * table is a VersionedTable directory (write-audit-publish commits,
  * snapshot isolation, time travel), so every catalog operation is a
  * filesystem-metadata operation against the Hadoop FS abstraction
  * (local, HDFS, or object store — same code path at 100 TB; nothing
  * here scans data).
  *
  * A [[graft.medallion.Lakehouse]] root IS a valid catalog root whose
  * layers are namespaces: `Catalog(root).listTables("silver")` agrees
  * with `Lakehouse.listTables(Some("silver"))` (asserted in
  * CatalogSpec) — the catalog is the generalization from three fixed
  * layers to arbitrary namespaces.
  */
final class Catalog(spark: SparkSession, root: String) {

  import Catalog._

  private def fs: FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def nsPath(ns: String): Path = {
    requireNamespace(ns)
    new Path((root +: ns.split('.').toSeq).mkString("/"))
  }

  private def tablePath(ns: String, table: String): String = {
    requireIdent(table, "table")
    new Path(nsPath(ns), table).toString
  }

  // ---- namespaces (catalog.py:109-160) ----

  /** catalog.py:109 `create_namespace` — idempotent, like the
    * reference's NamespaceAlreadyExists catch. Properties persist in
    * the namespace marker file. */
  def createNamespace(ns: String, properties: Map[String, String] = Map.empty): Unit = {
    val dir = nsPath(ns)
    fs.mkdirs(dir)
    val body = properties.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString("\n")
    Using.resource(fs.create(new Path(dir, NamespaceMarker), true))(
      _.write(body.getBytes("UTF-8")))
  }

  /** catalog.py:127 `namespace_exists`. A directory created by a bare
    * table write (no explicit createNamespace — the Lakehouse pattern)
    * still counts: existence is the directory, the marker only adds
    * properties. */
  def namespaceExists(ns: String): Boolean = fs.exists(nsPath(ns))

  /** catalog.py:246 `ensure_namespace`. */
  def ensureNamespace(ns: String): Unit =
    if (!fs.exists(new Path(nsPath(ns), NamespaceMarker))) createNamespace(ns)

  /** Properties stored at createNamespace time (pyiceberg
    * `load_namespace_properties`). */
  def namespaceProperties(ns: String): Map[String, String] = {
    val marker = new Path(nsPath(ns), NamespaceMarker)
    if (!fs.exists(marker)) Map.empty
    else Using.resource(fs.open(marker)) { in =>
      scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.contains('=')).map { l =>
          val i = l.indexOf('='); l.substring(0, i) -> l.substring(i + 1)
        }.toMap
    }
  }

  /** catalog.py:133 `list_namespaces` — every namespace under `parent`
    * (or the root), dotted, sorted. A directory is a namespace unless
    * it is a table (has version directories) or infrastructure
    * (`v=*` / `_*`). */
  def listNamespaces(parent: Option[String] = None): Seq[String] = {
    val base = parent.map(nsPath).getOrElse(new Path(root))
    if (!fs.exists(base)) return Seq.empty
    def walk(dir: Path, prefix: String): Seq[String] =
      fs.listStatus(dir).toSeq
        .filter(s => s.isDirectory && isPlainDir(s.getPath.getName) && !isTableDir(s.getPath))
        .flatMap { s =>
          val name = if (prefix.isEmpty) s.getPath.getName else s"$prefix.${s.getPath.getName}"
          name +: walk(s.getPath, name)
        }
    walk(base, parent.getOrElse("")).sorted
  }

  /** catalog.py:145 `drop_namespace` — missing is a no-op; a namespace
    * still holding tables or child namespaces refuses (pyiceberg
    * NamespaceNotEmpty), so a typo can't cascade-delete data. */
  def dropNamespace(ns: String): Unit = {
    val dir = nsPath(ns)
    if (!fs.exists(dir)) return
    require(listTables(ns).isEmpty && listNamespaces(Some(ns)).isEmpty,
      s"namespace $ns is not empty")
    fs.delete(dir, true)
  }

  // ---- tables (catalog.py:165-262) ----

  /** Create = commit version 1 through the write-audit-publish path
    * (iceberg tables.py create_table + append, collapsed — a table
    * with no committed version does not exist here). */
  def createTable(ns: String, table: String, df: DataFrame): Int = {
    require(!tableExists(ns, table), s"table $ns.$table already exists")
    ensureNamespace(ns)
    VersionedTable.commit(spark, tablePath(ns, table), df)
  }

  /** catalog.py:165 `table_exists` — existence = at least one
    * COMMITTED version (an in-flight staged write is not a table). */
  def tableExists(ns: String, table: String): Boolean =
    VersionedTable.currentVersion(spark, tablePath(ns, table)).isDefined

  /** catalog.py:172 `load_table`, with time travel (`asOf`) riding the
    * VersionedTable snapshot read. */
  def loadTable(ns: String, table: String, asOf: Option[Int] = None): DataFrame = {
    require(tableExists(ns, table), s"Table not found: $ns.$table")
    VersionedTable.read(spark, tablePath(ns, table), asOf)
  }

  /** catalog.py:190 `list_tables` — committed tables only, sorted;
    * unknown namespace returns empty (the reference's
    * NoSuchNamespace → [] branch). */
  def listTables(ns: String): Seq[String] = {
    val dir = nsPath(ns)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .filter(s => s.isDirectory && isPlainDir(s.getPath.getName) && isTableDir(s.getPath))
      .map(_.getPath.getName).sorted
  }

  /** catalog.py:203 `drop_table` — missing is a no-op (returns false).
    * `purge = true` deletes data; otherwise the directory is renamed to
    * a `_dropped-<version>` sibling: unlisted and unloadable, but the
    * files survive (Iceberg's drop-without-purge keeps data files). */
  def dropTable(ns: String, table: String, purge: Boolean = false): Boolean = {
    val path = new Path(tablePath(ns, table))
    if (!fs.exists(path)) return false
    if (purge) fs.delete(path, true)
    else {
      var i = 0
      var target = new Path(nsPath(ns), s"${DroppedPrefix}$table-$i")
      while (fs.exists(target)) { i += 1; target = new Path(nsPath(ns), s"${DroppedPrefix}$table-$i") }
      require(fs.rename(path, target), s"failed to archive $ns.$table")
    }
    true
  }

  /** catalog.py:218 `rename_table` (within a namespace or across two —
    * one metadata move, no data rewrite). */
  def renameTable(ns: String, table: String, newNs: String, newTable: String): Unit = {
    require(tableExists(ns, table), s"Table not found: $ns.$table")
    require(!tableExists(newNs, newTable), s"table $newNs.$newTable already exists")
    ensureNamespace(newNs)
    require(fs.rename(new Path(tablePath(ns, table)), new Path(tablePath(newNs, newTable))),
      s"failed to rename $ns.$table to $newNs.$newTable")
  }

  def renameTable(ns: String, table: String, newTable: String): Unit =
    renameTable(ns, table, ns, newTable)

  /** catalog.py:251-262 `get_table_location` / `get_table_schema` /
    * `get_table_snapshots`, one struct. Schema comes off the newest
    * snapshot's parquet footer — a plan, not a scan. */
  def tableInfo(ns: String, table: String): TableInfo = {
    require(tableExists(ns, table), s"Table not found: $ns.$table")
    val location = tablePath(ns, table)
    val versions = VersionedTable.versions(spark, location)
    TableInfo(ns, table, location, versions, versions.last,
      loadTable(ns, table).schema.fields.toSeq.map(f => f.name -> f.dataType.simpleString))
  }

  /** A table directory = at least one version directory under it
    * (committed or staged — a staged-only dir is still not a
    * NAMESPACE, it is an in-flight table). */
  private def isTableDir(p: Path): Boolean =
    fs.exists(p) && fs.listStatus(p).exists(s =>
      s.isDirectory && s.getPath.getName.startsWith("v="))
}

object Catalog {

  private val NamespaceMarker = "_NAMESPACE"
  private val DroppedPrefix = "_dropped-"

  final case class TableInfo(
      namespace: String, table: String, location: String,
      versions: Seq[Int], currentVersion: Int, columns: Seq[(String, String)])

  /** Neither infrastructure (`v=…` version dirs, `_…` markers/archives)
    * nor hidden. */
  private def isPlainDir(name: String): Boolean =
    !name.startsWith("v=") && !name.startsWith("_") && !name.startsWith(".")

  private def requireIdent(s: String, what: String): Unit =
    require(s.matches("[A-Za-z][A-Za-z0-9_]*"),
      s"$what name must be [A-Za-z][A-Za-z0-9_]*, got '$s'")

  private def requireNamespace(ns: String): Unit = {
    require(ns.nonEmpty, "namespace must be non-empty")
    ns.split('.').foreach(requireIdent(_, "namespace segment"))
  }
}
