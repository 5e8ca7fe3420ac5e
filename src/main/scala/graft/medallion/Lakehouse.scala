package graft.medallion

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.lineage.Lineage
import graft.sources.{Connectors, VersionedTable}

/** The medallion lakehouse facade (ref medallion/lakehouse.py:25-400):
  * one object tying ingest → silver → gold over versioned storage,
  * with lineage recorded at every hop — the single entry point a user
  * of the reference drives.
  *
  * Spark-first composition, not new machinery: every table is a
  * [[graft.sources.VersionedTable]] directory under
  * `root/<layer>/<table>` (write-audit-publish commits, snapshot
  * isolation, time travel — lakehouse.py gets this from its storage
  * backends; here it is the same two-primitive format everywhere), the
  * bronze→silver transform is [[Silver.process]]'s single fused plan,
  * gold is [[Gold.aggregate]], and [[Lineage]] edges accrue
  * automatically so `impactAnalysis("silver.orders")` answers the
  * blast-radius question the reference's tracker exists for.
  *
  * The layer writes are the pipeline's ONLY materialization barriers —
  * exactly where the medallion pattern wants durability anyway; inside
  * a layer transform everything stays one Catalyst plan.
  */
final class Lakehouse(
    spark: SparkSession,
    root: String,
    val tracker: Lineage.Tracker = new Lineage.Tracker,
    log: Option[graft.ops.Log.Emitter] = None) {

  import Lakehouse._

  // logging.py:326 AuditLogger.log_data_event: every layer commit is a
  // data-modification audit event (data.ingest / data.process_to_silver
  // / data.aggregate_to_gold with the committed version)
  private val audit = log.map(new graft.ops.Log.Audit(_))

  private def tablePath(layer: String, table: String): String = {
    requireLayer(layer)
    requireTableName(table)
    s"$root/$layer/$table"
  }

  /** lakehouse.py:46 `ingest` (structured flavor): land rows in bronze
    * with the full ingest-metadata stamp, as one committed version.
    * Semi-structured payloads flatten first when `flattenStructs`
    * (lakehouse.py's `ingest_semi_structured` path →
    * `Silver.flattenStructs`). Returns the committed bronze version. */
  def ingest(
      table: String,
      data: DataFrame,
      source: String,
      batchId: String,
      ingestionTimeMs: Long,
      flattenStructs: Boolean = false): Int = {
    val shaped = if (flattenStructs) Silver.flattenStructs(data) else data
    val stamped = Connectors.withIngestMetadata(shaped, source, batchId, ingestionTimeMs)
    val v = VersionedTable.append(spark, tablePath("bronze", table), stamped)
    tracker.recordTransform(Seq(s"source:$source"), s"bronze.$table", "ingest")
    audit.foreach(_.dataEvent("ingest", s"bronze.$table", None,
      "version" -> v, "source" -> source, "batch_id" -> batchId))
    v
  }

  /** A committed layer-table version's snapshot (bytes, parquet data
    * files) — the bytes/files half of the reference's pipeline metrics
    * (core/pipeline.py:44 `PipelineMetrics.bytes_written` /
    * `files_processed`); one metadata-only directory listing. */
  def tableStats(layer: String, table: String, version: Int): (Long, Long) =
    VersionedTable.snapshotStats(spark, tablePath(layer, table), version)

  /** lakehouse.py:135 `process_to_silver`: bronze snapshot →
    * [[Silver.process]] (one fused plan) → committed silver version. */
  def processToSilver(
      table: String,
      config: Silver.ProcessConfig,
      processingTimeMs: Long,
      audit: DataFrame => Unit = _ => ()): Int = {
    val bronze = this.table("bronze", table)
    val silver = Silver.process(bronze, config, s"bronze.$table", processingTimeMs)
    val v = VersionedTable.commit(spark, tablePath("silver", table), silver, audit)
    tracker.recordTransform(Seq(s"bronze.$table"), s"silver.$table", "process_to_silver")
    this.audit.foreach(_.dataEvent("process_to_silver", s"silver.$table", None,
      "version" -> v))
    v
  }

  /** lakehouse.py:172 `aggregate_to_gold`: [[Gold.aggregate]] over a
    * silver snapshot → committed gold version. */
  def aggregateToGold(
      silverTable: String,
      goldTable: String,
      groupBy: Seq[String],
      aggs: Seq[Gold.AggSpec],
      filter: Option[Column] = None,
      having: Option[Column] = None): Int = {
    val gold = Gold.aggregate(table("silver", silverTable), groupBy, aggs, filter, having)
    val v = VersionedTable.commit(spark, tablePath("gold", goldTable), gold)
    tracker.recordTransform(Seq(s"silver.$silverTable"), s"gold.$goldTable", "aggregate_to_gold")
    audit.foreach(_.dataEvent("aggregate_to_gold", s"gold.$goldTable", None,
      "version" -> v))
    v
  }

  /** lakehouse.py:207 `full_pipeline`: ingest → silver → gold in one
    * call; each layer is its own committed version (a failure leaves
    * earlier layers durable and readable — the restart points). */
  def fullPipeline(
      table: String,
      data: DataFrame,
      source: String,
      batchId: String,
      silverConfig: Silver.ProcessConfig,
      goldTable: String,
      groupBy: Seq[String],
      aggs: Seq[Gold.AggSpec],
      nowMs: Long): (Int, Int, Int) = {
    val b = ingest(table, data, source, batchId, nowMs)
    val s = processToSilver(table, silverConfig, nowMs)
    val g = aggregateToGold(table, goldTable, groupBy, aggs)
    (b, s, g)
  }

  /** lakehouse.py:259 `query`: a layer table's snapshot (newest
    * committed, or `asOf` for time travel). */
  def table(layer: String, name: String, asOf: Option[Int] = None): DataFrame =
    VersionedTable.read(spark, tablePath(layer, name), asOf)

  /** lakehouse.py:296 `sql`: every committed table registered as a
    * `<layer>_<name>` temp view, then free-form Spark SQL. */
  def sql(query: String): DataFrame = {
    for ((layer, tables) <- listTables(); t <- tables)
      table(layer, t).createOrReplaceTempView(s"${layer}_$t")
    spark.sql(query)
  }

  /** lakehouse.py:332 `list_tables`: committed tables per layer (a
    * directory with no committed version is a failed/in-flight write,
    * not a table). */
  def listTables(layer: Option[String] = None): Map[String, Seq[String]] = {
    val layers = layer.map { l => requireLayer(l); Seq(l) }.getOrElse(Layers)
    layers.map { l =>
      val dir = new Path(s"$root/$l")
      val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val tables =
        if (!fs.exists(dir)) Seq.empty[String]
        else fs.listStatus(dir).toSeq.filter(_.isDirectory).map(_.getPath.getName)
          .filter(t => VersionedTable.currentVersion(spark, s"$root/$l/$t").isDefined)
          .sorted
      l -> tables
    }.toMap
  }

  /** lakehouse.py:358 `get_table_info`. */
  def tableInfo(layer: String, name: String): TableInfo = {
    val versions = VersionedTable.versions(spark, tablePath(layer, name))
    val snapshot = table(layer, name)
    TableInfo(layer, name, versions, versions.last, snapshot.columns.toSeq)
  }
}

object Lakehouse {

  val Layers: Seq[String] = Seq("bronze", "silver", "gold")

  final case class TableInfo(
      layer: String, table: String, versions: Seq[Int],
      currentVersion: Int, columns: Seq[String])

  private def requireLayer(layer: String): Unit =
    require(Layers.contains(layer), s"layer must be one of $Layers, got $layer")

  /** core/validation.py `validate_table_name`: path-safe identifiers
    * only — a table name is a directory name here. */
  private def requireTableName(name: String): Unit =
    require(name.matches("[A-Za-z][A-Za-z0-9_]*"),
      s"table name must be [A-Za-z][A-Za-z0-9_]*, got '$name'")
}
