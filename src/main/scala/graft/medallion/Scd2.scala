package graft.medallion

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly Changing Dimension Type 2.
  *
  * Re-expresses the reference's SCD2 manager
  * (automic_etl/medallion/scd.py:53-491) as declarative DataFrame
  * transforms. The reference identifies inserts/updates/unchanged with
  * three driver-orchestrated joins and rebuilds the table; here the
  * whole merge is a union of three branches that each shuffle once on
  * the business key — linear in data size, no driver iteration, and
  * AQE-friendly at 100 TB:
  *
  *   1. history rows (not current) pass through untouched;
  *   2. current rows are closed (effective_to, is_current=false) when
  *      the source carries a different change-hash or a delete marker,
  *      else kept;
  *   3. source rows become new versions when they are brand new
  *      (version 1) or differ from the current row (version + 1).
  *
  * The change hash (scd.py:130 `_add_hash_column`) is md5 over the
  * tracked columns cast to string with nulls mapped to "" and a "|"
  * separator. Hashes are computed and compared entirely inside one
  * Spark job, so cross-engine hash portability is not required.
  */
object Scd2 {

  val ScdColumns: Seq[String] =
    Seq("_scd_effective_from", "_scd_effective_to", "_scd_is_current", "_scd_version", "_scd_hash")

  /** scd.py:130: change-detection hash over tracked columns. */
  def changeHash(trackedCols: Seq[String]): Column =
    md5(concat_ws("|", trackedCols.map(c => coalesce(col(c).cast("string"), lit(""))): _*))

  /** Tracked columns default: everything except keys and SCD metadata
    * (scd.py:79). */
  def defaultTracked(df: DataFrame, businessKeys: Seq[String]): Seq[String] =
    df.columns.toSeq.filterNot(c => businessKeys.contains(c) || ScdColumns.contains(c))

  /** scd.py:148 `_initial_load`: every row becomes version 1, current. */
  def initialLoad(
      source: DataFrame,
      businessKeys: Seq[String],
      trackedCols: Seq[String],
      effectiveFrom: Column): DataFrame =
    source
      .withColumn("_scd_hash", changeHash(trackedCols))
      .withColumn("_scd_effective_from", effectiveFrom.cast("timestamp"))
      .withColumn("_scd_effective_to", lit(null).cast("timestamp"))
      .withColumn("_scd_is_current", lit(true))
      .withColumn("_scd_version", lit(1))

  /** scd.py:53 `apply_scd2` + scd.py:397 `merge_scd2`: merge a source
    * snapshot into an existing SCD2 table.
    *
    * PRECONDITION (same as the reference): `source` holds at most ONE
    * row per business key — it is a snapshot, not a change feed. A
    * multi-row-per-key feed must first collapse via
    * `Silver.dedup(source, businessKeys, orderKey)`; merging it raw
    * would mint multiple "current" versions for the same key.
    *
    * @param existing        SCD2 table (carries the `_scd_*` columns)
    * @param source          new snapshot: business keys + tracked columns
    *                        (+ optional delete-indicator column)
    * @param deleteIndicator boolean column in `source` marking soft
    *                        deletes (scd.py:424): matching current rows
    *                        are closed with no replacement version
    */
  def merge(
      existing: DataFrame,
      source: DataFrame,
      businessKeys: Seq[String],
      trackedCols: Seq[String],
      effectiveDate: Column,
      deleteIndicator: Option[String] = None): DataFrame = {
    require(businessKeys.nonEmpty, "merge needs at least one business key")
    val eff = effectiveDate.cast("timestamp")

    val deletes = deleteIndicator match {
      case Some(ind) => source.filter(col(ind) === true).select(businessKeys.map(col): _*).distinct()
      case None      => source.limit(0).select(businessKeys.map(col): _*)
    }
    val upserts0 = deleteIndicator match {
      case Some(ind) => source.filter(not(coalesce(col(ind), lit(false)))).drop(ind)
      case None      => source
    }
    val upserts = upserts0.withColumn("_scd_hash", changeHash(trackedCols))

    val current = existing.filter(col("_scd_is_current"))
    val history = existing.filter(not(col("_scd_is_current")))

    // Branch 2: close or keep current rows. One shuffle on the business
    // key; the source side is projected to (keys, hash) / (keys) before
    // the join so only key+hash bytes move for it.
    val srcKeyHash = upserts
      .select((businessKeys.map(col) :+ col("_scd_hash").as("_src_hash")): _*)
    val delKeys = deletes.withColumn("_is_delete", lit(true))
    val closedOrKept = current
      .join(srcKeyHash, businessKeys, "left")
      .join(delKeys, businessKeys, "left")
      .withColumn("_close",
        coalesce(col("_is_delete"), lit(false)) ||
          (col("_src_hash").isNotNull && col("_src_hash") =!= col("_scd_hash")))
      .withColumn("_scd_effective_to", when(col("_close"), eff).otherwise(col("_scd_effective_to")))
      .withColumn("_scd_is_current", when(col("_close"), lit(false)).otherwise(col("_scd_is_current")))
      .drop("_src_hash", "_is_delete", "_close")

    // Branch 3: new versions from the source. Brand-new keys start at
    // version 1; changed keys continue at version + 1; hash-equal keys
    // produce no row (scd.py:214 "unchanged"). The next version derives
    // from max(_scd_version) over ALL rows for the key — not just the
    // current row — so a soft-deleted key that is later re-inserted
    // continues its version sequence instead of minting a duplicate
    // (key, version=1). One aggregate pass over `existing` yields both
    // that max and the current row's hash (no second shuffle).
    val curKeyInfo = existing
      .groupBy(businessKeys.map(col): _*)
      .agg(
        max(when(col("_scd_is_current"), col("_scd_hash"))).as("_cur_hash"),
        max(col("_scd_version")).as("_max_version"))
    val newVersions = upserts
      .join(curKeyInfo, businessKeys, "left")
      .filter(col("_cur_hash").isNull || col("_cur_hash") =!= col("_scd_hash"))
      .withColumn("_scd_effective_from", eff)
      .withColumn("_scd_effective_to", lit(null).cast("timestamp"))
      .withColumn("_scd_is_current", lit(true))
      .withColumn("_scd_version", coalesce(col("_max_version"), lit(0)) + 1)
      .drop("_cur_hash", "_max_version")

    val cols = existing.columns.toIndexedSeq
    history.select(cols.map(col): _*)
      .unionByName(closedOrKept.select(cols.map(col): _*))
      .unionByName(newVersions.select(cols.map(col): _*))
  }

  /** Transactional SCD2 merge into a [[graft.sources.VersionedTable]]:
    * read the current snapshot, [[merge]], commit the result as the
    * next version behind an audit gate — so a failed merge (or a
    * violated audit invariant) leaves the previous dimension state
    * readable, concurrent readers keep their snapshot for the whole
    * query, and every historical dimension version stays time-travel
    * able (ref storage/delta.py:146 `merge` + scd.py's apply loop,
    * fused). The default audit enforces the SCD2 invariant the merge
    * must preserve: at most one current row per business key.
    * Returns the committed version. */
  def mergeIntoVersioned(
      spark: org.apache.spark.sql.SparkSession,
      table: String,
      source: DataFrame,
      businessKeys: Seq[String],
      trackedCols: Seq[String],
      effectiveDate: Column,
      deleteIndicator: Option[String] = None): Int = {
    import graft.sources.VersionedTable
    val existing = VersionedTable.read(spark, table)
    val merged = merge(existing, source, businessKeys, trackedCols, effectiveDate, deleteIndicator)
    VersionedTable.commit(spark, table, merged, audit = scd2Audit(businessKeys))
  }

  /** The one-current-row-per-key audit [[mergeIntoVersioned]] and the
    * streaming loop share — the SCD2 invariant every commit must hold. */
  def scd2Audit(businessKeys: Seq[String]): DataFrame => Unit = staged => {
    val dupCurrent = staged.filter(col("_scd_is_current"))
      .groupBy(businessKeys.map(col): _*).count()
      .filter(col("count") > 1).limit(1).count()
    require(dupCurrent == 0,
      "SCD2 audit failed: a business key has more than one current row")
  }

  /** One IDEMPOTENT merge step into a versioned SCD2 dimension — the
    * exactly-once streaming contract ([[graft.streaming.Streaming
    * .foreachBatchVersioned]]'s token discipline applied to REPLACE
    * semantics): read the current dimension (an empty SCD2 frame when
    * the table doesn't exist yet, so the first batch IS the initial
    * load — [[merge]] against an empty `existing` reduces to
    * [[initialLoad]] row-for-row), merge the batch snapshot, commit
    * the merged dimension as the next version behind the audit —
    * keyed by `token`, so a replayed micro-batch (foreachBatch's
    * at-least-once delivery) collapses to a no-op returning the
    * original version. N tokens of CDC snapshots fold to exactly the
    * sequential batch merges, bit-identical (spec-pinned).
    * Returns the committed (or replayed) version. */
  def mergeIntoVersionedIdempotent(
      spark: org.apache.spark.sql.SparkSession,
      table: String,
      source: DataFrame,
      businessKeys: Seq[String],
      trackedCols: Seq[String],
      effectiveDate: Column,
      token: String,
      deleteIndicator: Option[String] = None): Int = {
    import graft.sources.VersionedTable
    val existing = VersionedTable.currentVersion(spark, table)
      .map(_ => VersionedTable.read(spark, table))
      .getOrElse {
        val noInd = deleteIndicator.map(source.drop(_)).getOrElse(source)
        initialLoad(noInd.limit(0), businessKeys, trackedCols, effectiveDate)
      }
    val merged = merge(existing, source, businessKeys, trackedCols,
      effectiveDate, deleteIndicator)
    VersionedTable.replaceIdempotent(spark, table, merged, token,
      audit = scd2Audit(businessKeys))
  }

  /** scd.py:321 `get_current_records`. */
  def currentRecords(scdTable: DataFrame): DataFrame =
    scdTable.filter(col("_scd_is_current"))

  /** scd.py:335 `get_record_at_time`: the version effective at `asOf`.
    * A partition-pruning-friendly range predicate — no join, no window.
    */
  def recordsAt(scdTable: DataFrame, asOf: Column): DataFrame =
    scdTable.filter(
      col("_scd_effective_from") <= asOf.cast("timestamp") &&
        (col("_scd_effective_to").isNull || col("_scd_effective_to") > asOf.cast("timestamp")))

  /** scd.py:366 `get_history`: all versions for a key, version-ordered. */
  def history(scdTable: DataFrame, keyFilter: Column): DataFrame =
    scdTable.filter(keyFilter).orderBy(col("_scd_version"))
}
