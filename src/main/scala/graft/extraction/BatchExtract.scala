package graft.extraction

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

import graft.medallion.Lakehouse
import graft.sources.Registry

/** Batch multi-table extraction (ref extraction/batch.py:44
  * `BatchExtractor`, :220 `extract_tables`, :265
  * `extract_to_lakehouse`): one call mapping N source tables → N
  * DataFrames or → bronze, with per-table failure isolation and a
  * per-table result report.
  *
  * The reference's machinery is mostly a single-process workaround:
  * its `extract`/`extract_parallel` chunk a table into row batches and
  * fan threads over them because one Polars read is single-streamed.
  * A Spark read IS the batch plan — a stride-partitioned JDBC read
  * (Jdbc.JdbcPartitioning) executes one range query per partition
  * across the cluster, which is `extract(batch_size=…)` with the
  * scheduler doing the chunking — so the per-batch loop, per-batch
  * `transform` and `on_batch` hooks all collapse into the DataFrame
  * plan itself. What genuinely remains is the MULTI-TABLE layer:
  * resolving N tables through one connector, isolating each table's
  * failure, reporting per-table rows/duration, and landing each in
  * bronze. That is this object.
  *
  * Cross-table concurrency (`extract_tables(parallel=True)`) maps to
  * concurrent Spark JOBS, not threads inside a read: each table's
  * action is submitted from a bounded driver-side pool (the
  * SparkSession is thread-safe and the scheduler interleaves jobs), so
  * a cluster drains N tables' partitions together rather than
  * serializing on the driver loop. Row counts ride an [[Observation]]
  * on the ingest write — counted DURING the write, no second scan.
  */
object BatchExtract {

  /** batch.py:21 `BatchResult`, per-table flavor: the report row the
    * reference builds from rows/duration/errors, carrying the full
    * rows+bytes+files shape of `PipelineMetrics` (ref
    * core/pipeline.py:44). `version` is the committed bronze version
    * for lakehouse extraction (None for a failed table or a plain
    * extract). `bytesRead` sums the source plan's file-listing sizes
    * (the already-resolved `FileIndex.sizeInBytes` of every file
    * relation in the optimized plan, v1 `HadoopFsRelation` and DSv2
    * `FileTable` alike — 0 for non-file sources like JDBC, where the
    * database doesn't expose a byte count);
    * `bytesWritten`/`filesWritten` are the committed snapshot's
    * parquet data files ([[graft.sources.VersionedTable.snapshotStats]],
    * one directory listing, no scan). */
  final case class TableResult(
      table: String,
      rows: Long,
      durationMs: Long,
      version: Option[Int],
      error: Option[String],
      bytesRead: Long = 0L,
      bytesWritten: Long = 0L,
      filesWritten: Long = 0L) {
    def ok: Boolean = error.isEmpty
    def rowsPerSecond: Double = if (durationMs > 0) rows * 1000.0 / durationMs else 0.0
  }

  private def runIsolated[A](
      tables: Seq[String], maxParallel: Int)(one: String => A): Seq[(String, Try[A])] = {
    require(tables.nonEmpty, "extract needs at least one table")
    require(maxParallel >= 1, s"maxParallel must be positive, got $maxParallel")
    val dupes = tables.diff(tables.distinct).distinct
    require(dupes.isEmpty, s"duplicate tables in one batch: ${dupes.mkString(", ")}")
    if (maxParallel == 1) tables.map(t => t -> Try(one(t)))
    else {
      val pool = Executors.newFixedThreadPool(maxParallel)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      try {
        val futures = tables.map(t => Future(t -> Try(one(t))))
        // each Try already absorbs its table's failure, so the Await
        // only ever times out, never rethrows a table error
        Await.result(Future.sequence(futures), Duration.Inf)
      } finally pool.shutdown()
    }
  }

  /** batch.py:220 `extract_tables`: resolve every table through ONE
    * registered connector ([[Registry]] by name), yielding each
    * table's DataFrame — or its failure, isolated (one bad table never
    * poisons the rest; the reference logs and drops it, here the error
    * is IN the report so callers can retry selectively). `tableKey` is
    * the connector option carrying the table name (`"table"` for
    * jdbc-family connectors, `"path"` for file-shaped ones).
    *
    * Plan-construction errors are real errors for every source this
    * library registers (a JDBC read resolves its schema against the
    * database eagerly; a file read resolves its footer), so a `Right`
    * here means the table exists and is readable, not merely that a
    * lazy plan was assembled. */
  def extractTables(
      spark: SparkSession,
      connector: String,
      tables: Seq[String],
      baseOptions: Map[String, String] = Map.empty,
      tableKey: String = "table",
      maxParallel: Int = 4): Map[String, Either[String, DataFrame]] =
    runIsolated(tables, maxParallel) { t =>
      Registry.load(connector, spark, baseOptions + (tableKey -> t))
    }.map {
      case (t, Success(df)) => t -> Right(df)
      case (t, Failure(e))  => t -> Left(Option(e.getMessage).getOrElse(e.getClass.getName))
    }.toMap

  /** batch.py:265 `extract_to_lakehouse`, multi-table: land every
    * table in the bronze layer via [[Lakehouse.ingest]] (ingest
    * metadata stamp + one committed version per table) and report
    * per-table rows, duration, committed version and failure — in the
    * input's table order, one row per table, failures isolated. The
    * row count is observed on the ingest write itself. */
  def extractToLakehouse(
      spark: SparkSession,
      lakehouse: Lakehouse,
      connector: String,
      tables: Seq[String],
      source: String,
      batchId: String,
      ingestionTimeMs: Long,
      baseOptions: Map[String, String] = Map.empty,
      tableKey: String = "table",
      maxParallel: Int = 4,
      log: Option[graft.ops.Log.Emitter] = None): Seq[TableResult] = {
    val results = runIsolated(tables, maxParallel) { t =>
      val t0 = System.nanoTime()
      val df = Registry.load(connector, spark, baseOptions + (tableKey -> t))
      // bytes_read (pipeline.py:48): metadata-only — summed from the
      // plan's already-resolved FileIndex listings (each file's length
      // was cached when the read resolved; re-fetching per file would
      // be one serial getFileStatus RPC per input file on the driver,
      // thousands of HEAD requests on object stores). Both file-source
      // plan shapes are covered: v1 LogicalRelation→HadoopFsRelation
      // (the default for parquet/csv/json/orc) and DSv2
      // DataSourceV2Relation/ScanRelation→FileTable (when a format is
      // removed from spark.sql.sources.useV1SourceList). Non-file
      // sources (JDBC) have no file relation → 0, honestly.
      val bytesRead = Try {
        import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
        import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation, FileTable}
        def fileBytes(table: org.apache.spark.sql.connector.catalog.Table): Long =
          table match {
            case ft: FileTable => ft.fileIndex.sizeInBytes
            case _ => 0L
          }
        df.queryExecution.optimizedPlan.collect {
          case l: LogicalRelation => l.relation match {
            case h: HadoopFsRelation => h.location.sizeInBytes
            case _ => 0L
          }
          case r: DataSourceV2Relation => fileBytes(r.table)
          case s: DataSourceV2ScanRelation => fileBytes(s.relation.table)
        }.sum
      }.getOrElse(0L)
      val obs = Observation()
      val v = lakehouse.ingest(t, df.observe(obs, count(lit(1)).as("rows")),
        source, s"$batchId/$t", ingestionTimeMs)
      val rows = obs.get("rows").asInstanceOf[Long]
      val (bytesOut, filesOut) = lakehouse.tableStats("bronze", t, v)
      (rows, (System.nanoTime() - t0) / 1000000L, v, bytesRead, bytesOut, filesOut)
    }
    val report = results.map {
      case (t, Success((rows, ms, v, bIn, bOut, fOut))) =>
        TableResult(t, rows, ms, Some(v), None, bIn, bOut, fOut)
      case (t, Failure(e)) =>
        TableResult(t, 0L, 0L, None,
          Some(Option(e.getMessage).getOrElse(e.getClass.getName)))
    }
    // one structured event per table (ref utils/logging.py vocabulary;
    // emitted in input order AFTER the concurrent fan-out so the
    // stream is deterministic regardless of pool interleaving)
    log.foreach { l =>
      report.foreach {
        case r if r.ok => l.info("table_extracted",
          "batch_id" -> batchId, "table" -> r.table, "rows" -> r.rows,
          "bytes_read" -> r.bytesRead, "bytes_written" -> r.bytesWritten,
          "files_written" -> r.filesWritten, "version" -> r.version.get,
          "duration_ms" -> r.durationMs)
        case r => l.error("table_failed",
          "batch_id" -> batchId, "table" -> r.table, "error" -> r.error.get)
      }
    }
    report
  }
}
