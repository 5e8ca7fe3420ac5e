package graft.extraction

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.medallion.Silver

/** Incremental extraction + CDC (ref extraction/incremental.py:58-383).
  *
  * All operators are plain Column predicates and key-partitioned joins:
  * the watermark filter is a scan-pushable comparison (verify
  * `PushedFilters` in explain — rows older than the watermark are
  * skipped at the parquet reader, which is the entire point at 100 TB).
  */
object Incremental {

  /** incremental.py:58 / bronze.py:258 `read_new_since`: rows strictly
    * newer than the watermark. `None` = initial load (full scan). */
  def readNewSince(df: DataFrame, watermarkColumn: String, since: Option[Column]): DataFrame =
    since.map(v => df.filter(col(watermarkColumn) > v)).getOrElse(df)

  /** incremental.py:315 `extract_changes`: tag rows with _change_type
    * (DELETE when the deleted marker is set, else INSERT on initial
    * load / UPSERT after). */
  def withChangeType(
      df: DataFrame,
      deletedColumn: Option[String] = None,
      isInitialLoad: Boolean = false): DataFrame = {
    val upsertTag = if (isInitialLoad) "INSERT" else "UPSERT"
    deletedColumn match {
      case Some(dc) =>
        df.withColumn("_change_type",
          when(col(dc).isNotNull, "DELETE").otherwise(upsertTag))
      case None => df.withColumn("_change_type", lit(upsertTag))
    }
  }

  /** One incremental batch: a bounded slice plus the watermark value it
    * would advance to. The caller loads `slice`, then calls [[commit]]
    * only after the load succeeds — on failure the watermark is
    * untouched and the batch replays on retry (at-least-once, never
    * silently skipped). */
  final case class ExtractBatch(
      slice: DataFrame,
      candidateWatermark: Option[String],
      manager: WatermarkManager,
      sourceName: String,
      watermarkColumn: String) {
    /** Advance the stored watermark to this batch's upper bound. */
    def commit(): Unit =
      candidateWatermark.foreach(v => manager.set(sourceName, watermarkColumn, v))
  }

  /** incremental.py:58 `IncrementalExtractor`, orchestrated: read rows
    * past the stored watermark, up to a pinned upper bound (initial
    * load when no watermark exists).
    *
    * The upper bound is computed eagerly ONCE and baked into the
    * slice's filter as a VALUE range — so no row is ever delivered
    * twice or lost across batches (delivery-once is range-based:
    * (watermark, bound] now, (bound, next] later). Note the pin is by
    * value, not arrival: on a live source, a straggler row whose value
    * falls inside the pinned range and that lands before the lazy
    * slice is evaluated IS included, and two evaluations of the same
    * slice can differ — intra-batch determinism holds for static
    * sources (or a single evaluation, e.g. an immediate write). The
    * watermark store is NOT touched here; the caller commits via
    * [[ExtractBatch.commit]] after a successful load. */
  def extract(
      df: DataFrame,
      manager: WatermarkManager,
      sourceName: String,
      watermarkColumn: String): ExtractBatch = {
    val dt = df.schema(watermarkColumn).dataType
    val since = manager.getValue(sourceName).map(v => lit(v).cast(dt))
    // Single scalar aggregate over the not-yet-seen rows — the scan is
    // watermark-pruned, so this is cheap even on a huge source.
    val hi = Option(
      readNewSince(df, watermarkColumn, since)
        .agg(max(col(watermarkColumn)).cast("string")).head().getString(0))
    val slice = hi match {
      case Some(h) => readNewSince(df, watermarkColumn, since)
        .filter(col(watermarkColumn) <= lit(h).cast(dt))
      case None    => df.limit(0)
    }
    ExtractBatch(slice, hi, manager, sourceName, watermarkColumn)
  }

  /** incremental.py:337 `apply_changes`: latest-wins upsert + delete.
    *
    * The reference assumes one change-row per key; distributed change
    * feeds don't guarantee that, so when `latestBy` is given the change
    * set first collapses to the newest row per key via the agg-based
    * dedup (map-side combine, one shuffle). A key whose LATEST change
    * is DELETE is removed; otherwise its newest upsert replaces the
    * target row. Anti-joins + union shuffle on the primary key only.
    */
  def applyChanges(
      target: DataFrame,
      changes: DataFrame,
      primaryKeys: Seq[String],
      latestBy: Option[Column] = None): DataFrame = {
    require(primaryKeys.nonEmpty, "applyChanges needs at least one primary key")
    val tagged =
      if (changes.columns.contains("_change_type")) changes
      else changes.withColumn("_change_type", lit("UPSERT"))
    val latest = latestBy match {
      case Some(ord) => Silver.dedup(tagged, primaryKeys, ord)
      case None      => tagged
    }
    val changedKeys = latest.select(primaryKeys.map(col): _*)
    val upserts = latest.filter(col("_change_type") =!= "DELETE").drop("_change_type")
    target.join(changedKeys, primaryKeys, "left_anti")
      .unionByName(upserts.select(target.columns.map(col).toIndexedSeq: _*))
  }
}
